package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf100 ledger for MULTI-DIM join-driven file pruning over a
  * Z-ORDERED fact (round 13): lineitem z-ordered on
  * (l_suppkey, l_partkey) gives every file a LOCALIZED value set in
  * BOTH key dimensions, so two independent dims — supplier filtered
  * on non-key columns joined on l_suppkey, part filtered on non-key
  * columns (brand + size + price band, the TPC-H q17 shape) joined on
  * l_partkey — each refute fact files through their own dictionary,
  * and the star's cuts INTERSECT: the outer join's dim reaches the
  * fact THROUGH the inner join (plans/JoinFilePruning.relationFor)
  * and prunes the already-pruned relation further. This is the layout
  * answer single-key clustering cannot give: bucket by suppkey and
  * the part dim cuts nothing; z-order and BOTH cut.
  *
  * Measures each single-dim join and the star, scan vs DPP. The index
  * is IN-MEMORY only — a saved `_graft_dict` would be re-DISCOVERED
  * by the scan arm after unregisterDict and the pair would measure
  * DPP vs DPP (the JoinDppScale lesson); the keptFiles==blocks
  * require on the scan arm makes that impossible to miss. Calm-window
  * gated; prints one JSON line.
  *
  * Usage: runMain graft.JoinDppStarScale <sfDir> [blocks] [reps]
  */
object JoinDppStarScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JoinDppStarScale <sfDir> [blocks] [reps]")
    val sfDir = args(0)
    val blocks = if (args.length > 1) args(1).toInt else 64
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    BenchWindow.satProbe(spark) // codegen warm

    val sfName = new java.io.File(sfDir).getName
    val out = s"target/scratch/joindppstar/$sfName/lineitem"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS"))) {
      graft.sources.MicroBlockWriter.writeZOrdered(
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_suppkey", "l_partkey", "l_orderkey", "l_quantity"),
        out, Seq("l_suppkey", "l_partkey"), blocks)
    }
    // scrub any sidecar a previous run left (discovery poisons the A/B)
    graft.sources.DictionaryIndex.deleteSidecar(
      out, spark.sparkContext.hadoopConfiguration)
    val idx = graft.sources.DictionaryIndex.build(spark, out, "li",
      Seq("l_suppkey", "l_partkey")).toDF().persist()
    idx.count()

    def dimS = spark.read.parquet(s"$sfDir/supplier.parquet")
      .filter(col("s_nationkey") === 6 &&
        col("s_acctbal").between(1000, 2000))
      .select(col("s_suppkey").as("k_s"))
    def dimP = spark.read.parquet(s"$sfDir/part.parquet")
      .filter(col("p_brand") === "Brand#7" && col("p_size") === 20 &&
        col("p_retailprice").between(920, 960))
      .select(col("p_partkey").as("k_p"))
    val nKeysS = dimS.count()
    val nKeysP = dimP.count()

    def fact = spark.read.parquet(out)
    def j1 = fact.join(dimS, col("l_suppkey") === col("k_s"))
    def j2 = fact.join(dimP, col("l_partkey") === col("k_p"))
    def star = fact.join(dimS, col("l_suppkey") === col("k_s"))
      .join(dimP, col("l_partkey") === col("k_p"))
    def fp(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("l_orderkey"))).first
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def keptFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation
            if r.relation.isInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
              r.relation.asInstanceOf[
                org.apache.spark.sql.execution.datasources.HadoopFsRelation]
                .location.inputFiles.exists(_.contains("joindppstar")) =>
          r.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.inputFiles.length
      }.head
    def med(run: => (Long, Long)): (Double, (Long, Long)) = {
      var r: (Long, Long) = null
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime(); r = run; (System.nanoTime() - t0) / 1e9
      }.sorted
      (ts(ts.size / 2), r)
    }

    val arms = Seq("j1" -> (() => j1), "j2" -> (() => j2),
      "star" -> (() => star))
    val MaxAttempts = 3
    var attempt = 0
    var calm = false
    var calmRef = -1.0
    var satStart = -1.0
    var satEnd = -1.0
    val scanSec = scala.collection.mutable.Map.empty[String, Double]
    val dppSec = scala.collection.mutable.Map.empty[String, Double]
    val keptN = scala.collection.mutable.Map.empty[String, Int]
    while (attempt < MaxAttempts && !calm) {
      attempt += 1
      satStart = BenchWindow.satProbe(spark)
      graft.plans.ZoneMapPruneRule.unregisterDict(out)
      arms.foreach { case (name, mk) =>
        require(keptFiles(mk()) == blocks,
          s"$name scan arm is pruned — a discovered sidecar poisons the A/B")
        val (t, v) = med(fp(mk()))
        scanSec(name) = t
        graft.plans.ZoneMapPruneRule.registerDict(out, idx)
        keptN(name) = keptFiles(mk())
        val (t2, v2) = med(fp(mk()))
        dppSec(name) = t2
        require(v == v2, s"$name rows diverged: $v vs $v2")
        graft.plans.ZoneMapPruneRule.unregisterDict(out)
      }
      satEnd = BenchWindow.satProbe(spark)
      calmRef = BenchWindow.calmRef(spark, math.min(satStart, satEnd))
      calm = BenchWindow.isCalm(calmRef, Seq(satStart, satEnd))
      if (!calm && attempt < MaxAttempts) {
        System.err.println(s"joindppstar window NOISY (attempt $attempt) — retrying")
        Thread.sleep(30000)
      }
    }
    require(keptN("star") <= math.min(keptN("j1"), keptN("j2")),
      s"star cut must intersect: $keptN")
    def secs(m: scala.collection.Map[String, Double]): String =
      arms.map { case (n, _) => s""""$n":${m(n)}""" }.mkString(",")
    println(s"""{"bench":"join_dpp_star","sf":"$sfDir","reps":$reps,"blocks":$blocks,"dim_keys_supplier":$nKeysS,"dim_keys_part":$nKeysP,"files_total":$blocks,"files_kept":{"j1":${keptN("j1")},"j2":${keptN("j2")},"star":${keptN("star")}},"scan_sec":{${secs(scanSec)}},"dpp_sec":{${secs(dppSec)}},"sat_probe_start_sec":$satStart,"sat_probe_end_sec":$satEnd,"sat_calm_ref_sec":$calmRef,"window_noisy":${!calm},"window_attempts":$attempt,"loadavg":${BenchWindow.loadavg()}}""")
    spark.stop()
  }
}
