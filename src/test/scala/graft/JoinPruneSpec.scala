package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}
import graft.plans.ZoneMapPruneRule
import graft.sources.{DictionaryIndex, MicroBlockIndex}

/** Join-driven file pruning (plans/JoinFilePruning): a selective dim
  * filter's surviving join keys refute dictionary-indexed fact files
  * at PLAN time — dynamic partition pruning at the file level, on the
  * key-clustered layouts real fact tables have. Contract under test:
  *
  *   - FIRE: inner / left-semi equi-join, dict-indexed fact root,
  *     filtered broadcast-class dim → the fact relation's file list
  *     shrinks to exactly the dictionary-positive files, rows
  *     identical to the unpruned join;
  *   - kept-file AUDIT: kept = all files minus skippedFilesEq's cut
  *     for the dim's surviving key set (losslessness by construction);
  *   - REFUSE: unfiltered dims, key sets past
  *     spark.graft.joinPrune.maxKeys, outer joins, null-safe
  *     equality (<=> matches NULL=NULL — value sets hold no nulls),
  *     unregistered roots.
  */
class JoinPruneSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-joinprune")
  private val dir = "/root/testdata/sf0.01"

  private def scratch(tag: String) = s"target/scratch/test/joinprune/$tag"

  /** 16-file hash-bucketed lineitem (each file holds ~1/16 of the 100
    * suppkeys — min/max spans everything, only value sets refute) with
    * a registered dictionary index. */
  private lazy val fixture: (String, DataFrame) = {
    val out = scratch("li16")
    Tables.load(spark, dir, "lineitem")
      .repartition(16, col("l_suppkey"))
      .write.mode("overwrite").parquet(out)
    val idx = DictionaryIndex.build(spark, out, "li", Seq("l_suppkey")).toDF()
      .persist()
    ZoneMapPruneRule.registerDict(out, idx)
    (out, idx)
  }

  private def factKeptFiles(df: DataFrame, needle: String): Seq[Int] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation
          if r.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
            r.relation.asInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.inputFiles.exists(_.contains(needle)) =>
        r.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.length
    }

  test("a selective dim filter prunes the fact's files; rows identical to the unpruned join") {
    // the dim filter is on a NON-KEY column (s_nationkey): Catalyst's
    // constraint inference cannot propagate it to the fact side, so
    // only the join arm's plan-time dim evaluation can know the
    // surviving key set — DPP's actual domain (a literal IN on the
    // join key itself is already handled by inferred constraints +
    // the single-table dictionary arm)
    val (path, idx) = fixture
    val fact = spark.read.parquet(path)
    val dim = spark.read.parquet(s"$dir/supplier.parquet")
      .filter(col("s_nationkey") === 6)
    val joined = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_suppkey"), col("s_name"))
    val kept = factKeptFiles(joined, "joinprune/li16")
    assert(kept.nonEmpty && kept.head < 16,
      s"the join must shrink the fact file list, saw $kept of 16")

    // kept-file audit: exactly the dictionary-positive files for the
    // dim's SURVIVING key set
    val survivingKeys = spark.read.parquet(s"$dir/supplier.parquet")
      .filter(col("s_nationkey") === 6).select("s_suppkey")
      .collect().map(r => graft.plans.PredValue(r.getLong(0))).toSeq
    assert(survivingKeys.size >= 2, "fixture: nation 6 must keep several suppliers")
    val skipped = DictionaryIndex.skippedFilesEq(
      idx, "l_suppkey", survivingKeys).size
    assert(kept.head == 16 - skipped,
      s"kept ${kept.head} != 16 - dict cut $skipped")

    // losslessness: same rows as the join with pruning unregistered
    val pruned = joined.collect().map(_.toString).sorted.toSeq
    ZoneMapPruneRule.unregisterDict(path)
    try {
      val truthDf = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("l_suppkey"), col("s_name"))
      assert(factKeptFiles(truthDf, "joinprune/li16") == Seq(16))
      assert(pruned == truthDf.collect().map(_.toString).sorted.toSeq)
    } finally ZoneMapPruneRule.registerDict(path, idx)
  }

  test("left-semi prunes the left side; rows identical") {
    val (path, _) = fixture
    val fact = spark.read.parquet(path)
    val dim = spark.read.parquet(s"$dir/supplier.parquet")
      .filter(col("s_nationkey") === 11)
    val semi = fact.join(dim, col("l_suppkey") === col("s_suppkey"), "left_semi")
    val kept = factKeptFiles(semi, "joinprune/li16")
    assert(kept.nonEmpty && kept.head < 16, s"semi-join must prune, saw $kept")
    val keys = spark.read.parquet(s"$dir/supplier.parquet")
      .filter(col("s_nationkey") === 11).select("s_suppkey")
      .collect().map(_.getLong(0))
    assert(semi.count() ==
      fact.filter(col("l_suppkey").isin(keys: _*)).count())
  }

  test("refusals: unfiltered dim, key bound, outer join, null-safe equality") {
    val (path, _) = fixture
    val fact = spark.read.parquet(path)
    val dimAll = spark.read.parquet(s"$dir/supplier.parquet")
    // unfiltered dim: unselective, must refuse
    assert(factKeptFiles(
      fact.join(dimAll, col("l_suppkey") === col("s_suppkey")),
      "joinprune/li16") == Seq(16))
    // key bound: nation 9 keeps 10 suppliers > maxKeys=1 refuses (the
    // non-key filter keeps inferred constraints out of the picture)
    spark.conf.set("spark.graft.joinPrune.maxKeys", "1")
    try {
      val dim2 = dimAll.filter(col("s_nationkey") === 9)
      assert(factKeptFiles(
        fact.join(dim2, col("l_suppkey") === col("s_suppkey")),
        "joinprune/li16") == Seq(16),
        "a key set past the bound must refuse")
    } finally spark.conf.unset("spark.graft.joinPrune.maxKeys")
    // outer join: pruning the preserved side would drop rows
    val dimF = dimAll.filter(col("s_nationkey") === 7)
    assert(factKeptFiles(
      fact.join(dimF, col("l_suppkey") === col("s_suppkey"), "left_outer"),
      "joinprune/li16") == Seq(16))
    // null-safe equality matches NULL = NULL; value sets hold no nulls
    assert(factKeptFiles(
      fact.join(dimF, col("l_suppkey") <=> col("s_suppkey")),
      "joinprune/li16") == Seq(16))
    // unregistered root: no decision job, no prune
    val bare = scratch("bare")
    Tables.load(spark, dir, "lineitem").limit(2000)
      .repartition(4, col("l_suppkey")).write.mode("overwrite").parquet(bare)
    assert(factKeptFiles(
      spark.read.parquet(bare)
        .join(dimF, col("l_suppkey") === col("s_suppkey")),
      "joinprune/bare") == Seq(4))
  }

  test("string join keys prune through the string value sets") {
    val (outDir, dimDf) = {
      val out = scratch("byflag")
      Tables.load(spark, dir, "lineitem")
        .repartition(3, col("l_returnflag"))
        .write.mode("overwrite").parquet(out)
      import spark.implicits._
      (out, Seq("R").toDF("flag").filter(col("flag") === "R"))
    }
    val idx = DictionaryIndex.build(spark, outDir, "li", Seq("l_returnflag")).toDF()
    ZoneMapPruneRule.registerDict(outDir, idx)
    try {
      val fact = spark.read.parquet(outDir)
      val joined = fact.join(dimDf, col("l_returnflag") === col("flag"))
      val kept = factKeptFiles(joined, "joinprune/byflag")
      val total = MicroBlockIndex.listParquetFiles(outDir).size
      assert(kept.nonEmpty && kept.head < total,
        s"string-key join must prune, saw $kept of $total")
      assert(joined.count() == fact.filter(col("l_returnflag") === "R").count())
    } finally ZoneMapPruneRule.unregisterDict(outDir)
  }

  test("hive-partitioned facts prune with partition columns intact (filter and join arms)") {
    // pre-fix, pruning replaced the FileIndex with one built from bare
    // leaf files: empty inferred partition spec + the relation's kept
    // partitionSchema = FAILED_READ_FILE at scan time (reproduced).
    // prunedRelation now rebuilds with basePath and refuses on any
    // partition-schema mismatch. The clustered column is a derived
    // low-cardinality bucket — high-card keys (o_orderkey) fall back
    // to PLAIN pages and carry no dictionaries to cut by.
    val out = scratch("partitioned")
    val orders = Tables.load(spark, dir, "orders").limit(6000)
      .withColumn("bucket", pmod(xxhash64(col("o_orderkey")), lit(8)))
    // explicit partition count: AQE would coalesce this tiny shuffle
    // into ONE task, collapsing the bucket clustering the cut needs
    orders.repartition(8, col("bucket"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    val idx = DictionaryIndex.build(spark, out, "ord", Seq("bucket")).toDF()
      .persist()
    assert(idx.filter(col("covered")).count() > 0, "bucket must be covered")
    ZoneMapPruneRule.registerDict(out, idx)
    try {
      val total = graft.sources.MicroBlockIndex.listParquetFiles(out).size

      // the dbg3 crash shape, direct: hand-prune the partitioned
      // relation through prunedRelation and SCAN the partition column
      val rel0 = spark.read.parquet(out).queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }.head
      val hfs0 = rel0.relation.asInstanceOf[
        org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      val pruned0 = ZoneMapPruneRule.prunedRelation(spark, rel0, hfs0,
        hfs0.location.inputFiles.take(3).toSeq).get
      val handRows = org.apache.spark.sql.graftbridge.PlanBridge
        .ofRows(spark, pruned0)
        .select("o_orderkey", "o_orderstatus").collect()
      assert(handRows.nonEmpty && handRows.forall(r =>
        r.getString(1) != null && r.getString(1).nonEmpty),
        "a hand-pruned partitioned relation must scan with partition values")

      // FILTER arm end-to-end
      val filtered = spark.read.parquet(out)
        .filter(col("bucket") === 3)
        .select("bucket", "o_orderstatus", "o_orderkey")
      val keptF = factKeptFiles(filtered, "joinprune/partitioned")
      assert(keptF.nonEmpty && keptF.head < total,
        s"filter arm must prune the partitioned layout, saw $keptF of $total")
      val rows = filtered.collect()
      assert(rows.nonEmpty && rows.forall(r =>
        r.getString(1) != null && r.getString(1).nonEmpty),
        "partition-column values must survive the pruned scan")
      ZoneMapPruneRule.unregisterDict(out)
      val truth = spark.read.parquet(out).filter(col("bucket") === 3)
        .select("bucket", "o_orderstatus", "o_orderkey")
        .collect().map(_.toString).sorted.toSeq
      ZoneMapPruneRule.registerDict(out, idx)
      assert(rows.map(_.toString).sorted.toSeq == truth)
    } finally ZoneMapPruneRule.unregisterDict(out)
  }

  test("a fact file rewritten in place under its name is never pruned on the stale value set") {
    val out = scratch("rewritten")
    Tables.load(spark, dir, "lineitem").limit(6000)
      .repartition(4, col("l_suppkey"))
      .write.mode("overwrite").parquet(out)
    val idx = DictionaryIndex.build(spark, out, "li", Seq("l_suppkey")).toDF()
      .persist()
    idx.count()
    ZoneMapPruneRule.registerDict(out, idx)
    try {
      // rewrite one file in place: give it rows for a suppkey whose
      // dictionary entry says "absent" — the stale cut would drop them
      val dim = spark.read.parquet(s"$dir/supplier.parquet")
        .filter(col("s_nationkey") === 14)
      val dimKeys = spark.read.parquet(s"$dir/supplier.parquet")
        .filter(col("s_nationkey") === 14).select("s_suppkey")
        .collect().map(_.getLong(0)).toSet
      val victim = graft.plans.ZoneMapPruneRule.normFile(
        graft.sources.MicroBlockIndex.listParquetFiles(out)
          .find { f =>
            // a file whose dictionary holds NONE of the dim keys —
            // exactly the one the cut would skip
            val rows = idx.filter(col("file").contains(
                new java.io.File(graft.plans.ZoneMapPruneRule.normFile(f))
                  .getName))
              .select("valuesLong").collect()
            rows.nonEmpty && rows.head.getSeq[Long](0).forall(!dimKeys(_))
          }.get)
      val tmp = scratch("rewritten-tmp")
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_suppkey").isin(dimKeys.toSeq: _*)).limit(100)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val tmpFile = graft.plans.ZoneMapPruneRule.normFile(
        graft.sources.MicroBlockIndex.listParquetFiles(tmp).head)
      java.nio.file.Files.copy(java.nio.file.Paths.get(tmpFile),
        java.nio.file.Paths.get(victim),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(victim)
        .getParent.resolve("." + java.nio.file.Paths.get(victim)
          .getFileName.toString + ".crc"))
      // deliberately NO cache clear: the decision memo holds the raw
      // cut from before the rewrite — the per-QUERY freshness gate
      // must keep the rewritten file anyway

      val joined = spark.read.parquet(out)
        .join(dim, col("l_suppkey") === col("s_suppkey"))
      val truth = spark.read.parquet(out)
        .filter(col("l_suppkey").isin(dimKeys.toSeq: _*)).count()
      assert(truth >= 100L, "the rewritten file's rows must be part of the truth")
      assert(joined.count() == truth,
        "the (mtime,size) gate must keep the rewritten file - rows were dropped")
    } finally ZoneMapPruneRule.unregisterDict(out)
  }

  test("multi-dim star join: each dim's cut lands through the intermediate join; cuts intersect") {
    // round-13 carried item: fact ⋈ dim1 ⋈ dim2 — dim2's equality
    // reaches the fact only THROUGH Join(fact, dim1), so the walk
    // must descend intermediate joins. Overlapping nation filters
    // keep the final result non-empty (nation 11 survives both).
    val (path, idx) = fixture
    val fact = spark.read.parquet(path)
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
    val dim1 = supp.filter(col("s_nationkey").isin(6, 11))
      .select(col("s_suppkey").as("d1_key"), col("s_name").as("d1_name"))
    val dim2 = supp.filter(col("s_nationkey").isin(11, 3))
      .select(col("s_suppkey").as("d2_key"), col("s_name").as("d2_name"))
    val joined = fact
      .join(dim1, col("l_suppkey") === col("d1_key"))
      .join(dim2, col("l_suppkey") === col("d2_key"))
      .select(col("l_orderkey"), col("l_suppkey"), col("d1_name"), col("d2_name"))
    val kept = factKeptFiles(joined, "joinprune/li16")

    def keysOf(nations: Seq[Int]): Seq[graft.plans.PredValue] =
      supp.filter(col("s_nationkey").isin(nations.map(Integer.valueOf): _*))
        .select("s_suppkey").collect()
        .map(r => graft.plans.PredValue(r.getLong(0))).toSeq
    val skip1 = DictionaryIndex.skippedFilesEq(
      idx, "l_suppkey", keysOf(Seq(6, 11))).toSet
    val skip2 = DictionaryIndex.skippedFilesEq(
      idx, "l_suppkey", keysOf(Seq(11, 3))).toSet
    assert((skip1 ++ skip2).size > skip1.size &&
      (skip1 ++ skip2).size > skip2.size,
      "fixture: each dim must contribute files the other cannot cut")
    assert(kept == Seq(16 - (skip1 ++ skip2).size),
      s"kept $kept != 16 - |union of both dims' cuts| ${(skip1 ++ skip2).size}")

    // losslessness vs the unpruned star join
    val pruned = joined.collect().map(_.toString).sorted.toSeq
    assert(pruned.nonEmpty, "fixture: nation 11 must produce join rows")
    ZoneMapPruneRule.unregisterDict(path)
    try {
      val truthDf = fact
        .join(dim1, col("l_suppkey") === col("d1_key"))
        .join(dim2, col("l_suppkey") === col("d2_key"))
        .select(col("l_orderkey"), col("l_suppkey"), col("d1_name"), col("d2_name"))
      assert(factKeptFiles(truthDf, "joinprune/li16") == Seq(16))
      assert(pruned == truthDf.collect().map(_.toString).sorted.toSeq)
    } finally ZoneMapPruneRule.registerDict(path, idx)
  }

  test("composite-key join: every equality conjunct's cut unions") {
    import spark.implicits._
    val out = scratch("composite")
    // 8 files, file i holds exactly (k1 = i, k2 = i) — two join keys,
    // both clustered, written deterministically one file per key
    val df = Seq.tabulate(800)(i => (i % 8L, i % 8L, i.toLong))
      .toDF("k1", "k2", "payload")
    for (i <- 0 until 8)
      df.filter(col("k1") === i).coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(out)
    val idx = DictionaryIndex.build(spark, out, "t", Seq("k1", "k2")).toDF()
      .persist()
    idx.count()
    ZoneMapPruneRule.registerDict(out, idx)
    try {
      val fact = spark.read.parquet(out)
      val dim = Seq((1L, 1L), (5L, 6L)).toDF("d1", "d2")
      val joined = fact.join(dim,
        col("k1") === col("d1") && col("k2") === col("d2"))
      val kept = factKeptFiles(joined, "joinprune/composite")
      // k1's cut alone keeps {F1, F5}; k2's alone keeps {F1, F6};
      // the round-12 first-pair walk kept 2 files — the union keeps 1
      assert(kept == Seq(1),
        s"both conjuncts' cuts must union: expected 1 kept file, saw $kept")
      assert(joined.count() == 100L, "only (1,1) rows can match")
      ZoneMapPruneRule.unregisterDict(out)
      val truth = fact.join(dim,
        col("k1") === col("d1") && col("k2") === col("d2"))
        .collect().map(_.toString).sorted.toSeq
      ZoneMapPruneRule.registerDict(out, idx)
      assert(joined.collect().map(_.toString).sorted.toSeq == truth)
    } finally ZoneMapPruneRule.unregisterDict(out)
  }

  test("cost bound: once one cut collapses the kept set, later conjuncts run no decision jobs") {
    import spark.implicits._
    val out = scratch("costbound")
    // 8 files, file i constant in all four keys — the first conjunct's
    // cut alone keeps exactly one file
    (0 until 8).foreach { i =>
      Seq.tabulate(50)(r => (i.toLong, i.toLong, i.toLong, i.toLong, r.toLong))
        .toDF("k1", "k2", "k3", "k4", "v").coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(out)
    }
    val idx = DictionaryIndex.build(spark, out, "cb",
      Seq("k1", "k2", "k3", "k4")).toDF().persist()
    ZoneMapPruneRule.registerDict(out, idx)
    try {
      graft.plans.JoinFilePruning.clearCache()
      val before = graft.plans.JoinFilePruning.decisionJobs.get()
      val fact = spark.read.parquet(out)
      val dim = Seq((3L, 3L, 3L, 3L, "d")).toDF("d1", "d2", "d3", "d4", "n")
      val joined = fact.join(dim,
        col("k1") === col("d1") && col("k2") === col("d2") &&
          col("k3") === col("d3") && col("k4") === col("d4"))
      assert(factKeptFiles(joined, "joinprune/costbound") == Seq(1))
      val jobs = graft.plans.JoinFilePruning.decisionJobs.get() - before
      assert(jobs <= 1,
        s"the collapsed kept set must short-circuit the other 3 conjuncts, ran $jobs")
      // and the short-circuited prune is still lossless
      val pruned = joined.select("k1", "v").collect().map(_.toString).sorted
      ZoneMapPruneRule.unregisterDict(out)
      val truth = spark.read.parquet(out).join(dim,
        col("k1") === col("d1") && col("k2") === col("d2") &&
          col("k3") === col("d3") && col("k4") === col("d4"))
        .select("k1", "v").collect().map(_.toString).sorted
      assert(pruned.sameElements(truth))
    } finally ZoneMapPruneRule.unregisterDict(out)
  }

  test("benefit gate: a calibrated root where the decision can't repay refuses the cut entirely") {
    import spark.implicits._
    val out = scratch("benefit")
    (0 until 8).foreach { i =>
      Seq.tabulate(50)(r => (i.toLong, (i * 50 + r).toLong))
        .toDF("k", "v").coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(out)
    }
    val idx = DictionaryIndex.build(spark, out, "bg", Seq("k")).toDF().persist()
    val root = new java.io.File(out).getAbsolutePath
    ZoneMapPruneRule.registerDict(out, idx)
    try {
      def joined = spark.read.parquet(out).join(
        Seq((3L, "d")).toDF("d", "n"), col("k") === col("d"))
      // constants that price the decision ABOVE any possible saving
      // (dec 10 s, marginal bw ~1 GB/s over a KB-scale table): the
      // rule must not pay a single decision job — the r14 sf0.1
      // inversion (join_dpp_ab 0.35 s DPP vs 0.27 s scan)
      graft.sources.CostRouter.seed(root, decSec = 10.0,
        calSec = 11.0, calBytes = 1L << 30)
      graft.plans.JoinFilePruning.clearCache()
      val before = graft.plans.JoinFilePruning.decisionJobs.get()
      assert(factKeptFiles(joined, "joinprune/benefit") == Seq(8),
        "the gated plan must stay unpruned")
      assert(graft.plans.JoinFilePruning.decisionJobs.get() == before,
        "a refused cut must cost ZERO decision jobs")
      // flip the constants: decision is nearly free, scan is slow —
      // the same query now cuts (uncalibrated default behavior too)
      graft.sources.CostRouter.seed(root, decSec = 1e-4,
        calSec = 11.0, calBytes = 1024L)
      graft.plans.JoinFilePruning.clearCache()
      assert(factKeptFiles(joined, "joinprune/benefit") == Seq(1),
        "a worthwhile decision must cut as before")
    } finally {
      ZoneMapPruneRule.unregisterDict(out)
      graft.sources.CostRouter.reset()
    }
  }

  test("cost bound: fruitless cuts dry out after two strikes instead of one job per conjunct") {
    import spark.implicits._
    val out = scratch("drystreak")
    // every file holds EVERY key value: no cut can ever refute a file
    (0 until 4).foreach { i =>
      Seq.tabulate(64)(r => (r.toLong % 8, r.toLong % 8, r.toLong % 8,
        r.toLong % 8, (i * 100 + r).toLong))
        .toDF("k1", "k2", "k3", "k4", "v").coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(out)
    }
    val idx = DictionaryIndex.build(spark, out, "ds",
      Seq("k1", "k2", "k3", "k4")).toDF().persist()
    ZoneMapPruneRule.registerDict(out, idx)
    try {
      graft.plans.JoinFilePruning.clearCache()
      val before = graft.plans.JoinFilePruning.decisionJobs.get()
      val fact = spark.read.parquet(out)
      val dim = Seq((3L, 3L, 3L, 3L, "d")).toDF("d1", "d2", "d3", "d4", "n")
      val joined = fact.join(dim,
        col("k1") === col("d1") && col("k2") === col("d2") &&
          col("k3") === col("d3") && col("k4") === col("d4"))
      joined.queryExecution.optimizedPlan // drive the rule
      val jobs = graft.plans.JoinFilePruning.decisionJobs.get() - before
      assert(jobs <= 2,
        s"an unprunable fact must dry out after two empty cuts, ran $jobs")
    } finally ZoneMapPruneRule.unregisterDict(out)
  }

  test("a nondeterministic dim refuses (plan-time keys could differ from runtime)") {
    val (path, _) = fixture
    val fact = spark.read.parquet(path)
    val randDim = spark.read.parquet(s"$dir/supplier.parquet")
      .filter(rand(42) < 0.05)
    assert(factKeptFiles(
      fact.join(randDim, col("l_suppkey") === col("s_suppkey")),
      "joinprune/li16") == Seq(16),
      "a rand() dim filter must refuse")
    val limitDim = spark.read.parquet(s"$dir/supplier.parquet")
      .filter(col("s_nationkey") === 6).limit(2)
    assert(factKeptFiles(
      fact.join(limitDim, col("l_suppkey") === col("s_suppkey")),
      "joinprune/li16") == Seq(16),
      "a LIMIT dim (order-unstable row cut) must refuse")
  }
}
