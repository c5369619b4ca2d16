package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.plans.PredValue
import graft.sources.{BloomPruning, MicroBlockIndex}

/** Parquet-native bloom-filter pruning (sources/BloomPruning). The
  * contract: NO FALSE NEGATIVES — a present key is never refuted from
  * any file that holds it (checked over every key of a planted
  * corpus) — while absent keys refute most files; files without blooms
  * are never refuted; cross-type probes stay conservative except the
  * structurally-impossible ones.
  */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-bloom-test")
  private val dir = "/root/testdata/sf0.01"

  private def scratch(tag: String) = s"target/scratch/test/bloom/$tag"

  private lazy val li = graft.engine.Tables.load(spark, dir, "lineitem")

  /** 8-file hash-bucketed copy, dictionary OFF + bloom ON for the key. */
  private lazy val bloomPath: String = {
    val out = scratch("buckets")
    li.repartition(8, col("l_orderkey"))
      .write.mode("overwrite")
      .option("parquet.enable.dictionary#l_orderkey", "false")
      .option("parquet.bloom.filter.enabled#l_orderkey", "true")
      .option("parquet.bloom.filter.expected.ndv#l_orderkey", "4096")
      .parquet(out)
    out
  }

  test("blooms were actually written for the plain-encoded key column") {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val f = MicroBlockIndex.listParquetFiles(bloomPath).head
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(f), new Configuration()))
    try {
      val cc = r.getFooter.getBlocks.asScala.head.getColumns.asScala
        .find(_.getPath.toDotString == "l_orderkey").get
      assert(cc.getEncodingStats.hasNonDictionaryEncodedPages,
        "dictionary was not disabled for the key column")
      assert(r.readBloomFilter(cc) != null, "no bloom filter written")
    } finally r.close()
  }

  test("no false negatives: every present key keeps its files and loses no rows") {
    val keys = li.select("l_orderkey").distinct()
      .orderBy("l_orderkey").limit(200).collect().map(_.getLong(0))
    assert(keys.length == 200)
    // one decision per key would be 200 metadata jobs; probe all keys
    // through ONE IN-list decision first (sanity: kept ⊇ every key's
    // files), then spot-check per-key row fidelity on a sample
    keys.grouped(50).foreach { batch =>
      val served = BloomPruning.prunedReadEq(spark, bloomPath, "l_orderkey",
        batch.map(k => PredValue(k)).toSeq)
      val expect = spark.read.parquet(bloomPath)
        .filter(col("l_orderkey").isin(batch: _*))
      assert(served.count() == expect.count(), s"batch starting ${batch.head}")
    }
    Seq(keys.head, keys(100), keys.last).foreach { k =>
      val served = BloomPruning.prunedReadEq(
        spark, bloomPath, "l_orderkey", Seq(PredValue(k)))
      val expect = li.filter(col("l_orderkey") === k)
      assert(served.count() == expect.count() && served.count() > 0, s"key $k")
      assert(served.select(sum(col("l_linenumber"))).first.getLong(0) ==
        expect.select(sum(col("l_linenumber"))).first.getLong(0), s"key $k")
    }
  }

  test("present key prunes to its bucket; absent keys refute nearly everything") {
    val total = MicroBlockIndex.listParquetFiles(bloomPath).size
    val k = li.select(min("l_orderkey")).first.getLong(0)
    val skippedPresent =
      BloomPruning.skippedFilesEq(spark, bloomPath, "l_orderkey", Seq(PredValue(k)))
    // hash bucketing puts one key in one file; blooms may keep a few
    // extra by false positives but must refute most
    assert(skippedPresent.size >= total - 3 && skippedPresent.size < total,
      s"present-key skip ${skippedPresent.size}/$total")
    val absent = (1 to 20).map(i => PredValue(1000000L + i))
    absent.foreach { v =>
      val skipped =
        BloomPruning.skippedFilesEq(spark, bloomPath, "l_orderkey", Seq(v))
      assert(skipped.size >= total - 2, s"absent ${v.num.get}: ${skipped.size}/$total")
    }
    // structurally-impossible probe: fractional value on a long column
    val servedFrac = BloomPruning.prunedReadEq(
      spark, bloomPath, "l_orderkey", Seq(PredValue(7.5)))
    assert(servedFrac.count() == 0L)
  }

  test("files without blooms are never refuted") {
    val out = scratch("nobloom")
    li.limit(5000).repartition(4, col("l_orderkey"))
      .write.mode("overwrite").parquet(out)
    val skipped = BloomPruning.skippedFilesEq(
      spark, out, "l_orderkey", Seq(PredValue(999999999L)))
    // fully-dictionary-encoded chunks carry no blooms (parquet-mr
    // omits them as redundant) — BloomPruning alone must keep all;
    // the DICTIONARY index is the cut for this regime
    assert(skipped.isEmpty, s"refuted without blooms: $skipped")
    // unknown column: no refutes either
    assert(BloomPruning.skippedFilesEq(
      spark, out, "no_such_col", Seq(PredValue(1L))).isEmpty)
  }

  test("string-typed blooms prune string probes") {
    import spark.implicits._
    val out = scratch("strings")
    (0 until 4000).map(i => (i.toLong, s"user-${i % 1000}-${i}"))
      .toDF("id", "tag")
      .repartition(4, col("tag"))
      .write.mode("overwrite")
      .option("parquet.enable.dictionary#tag", "false")
      .option("parquet.bloom.filter.enabled#tag", "true")
      .option("parquet.bloom.filter.expected.ndv#tag", "2048")
      .parquet(out)
    val present = "user-123-123"
    val served = BloomPruning.prunedReadEq(
      spark, out, "tag", Seq(PredValue(present)))
    assert(served.count() == 1L)
    val skippedAbsent = BloomPruning.skippedFilesEq(
      spark, out, "tag", Seq(PredValue("no-such-tag-xyz")))
    assert(skippedAbsent.size >= 3, s"absent string skips ${skippedAbsent.size}/4")
    // numeric probe on a string column keeps conservatively
    assert(BloomPruning.skippedFilesEq(
      spark, out, "tag", Seq(PredValue(5L))).isEmpty)
  }

  test("a TIMESTAMP_MILLIS bloom never refutes a Catalyst-micros probe") {
    // Spark writes INT64 timestamps PLAIN (no dictionary), so blooms
    // CAN exist on a timestamp key; a MILLIS file's bloom hashed raw
    // millis while Catalyst probes are micros — the unit gate must
    // keep such files conservatively, never falsely refute
    import spark.implicits._
    val out = scratch("ts-millis")
    val df = Seq("2024-01-01 10:00:00", "2024-06-15 12:30:00")
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#ts", "true")
        .option("parquet.bloom.filter.expected.ndv#ts", "64")
        .parquet(out)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    val presentMicros = spark.read.parquet(out)
      .select(unix_micros(col("ts"))).first.getLong(0)
    assert(BloomPruning.skippedFilesEq(
      spark, out, "ts", Seq(PredValue(presentMicros))).isEmpty,
      "MILLIS-unit files must be kept, not refuted by a micros probe")
    // absent probe on the same file: STILL kept — the wrong-unit gate
    // refuses the domain entirely rather than trusting any verdict
    assert(BloomPruning.skippedFilesEq(
      spark, out, "ts", Seq(PredValue(123456789L))).isEmpty)
  }
}
