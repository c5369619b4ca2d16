package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.plans.{Cmp, In, IndexPruning, PredValue}
import graft.sources.{DictionaryIndex, MicroBlockIndex}

/** Dictionary-page index (sources/DictionaryIndex): exact value sets
  * from metadata-scale reads. The contract under test:
  *
  *   - distinct counts served from dictionaries are EXACT against a
  *     full scan, for every physical view (int64, double, string),
  *     including files whose chunks fell back to PLAIN pages (scan
  *     fallback) and mixed dict/plain tables;
  *   - equality pruning on a hash-bucketed layout keeps only the
  *     files whose dictionaries hold the probe — the layout class
  *     where zone maps provably keep everything;
  *   - conservative edges never lose rows: absent values, uncovered
  *     files, unindexed columns, all-null chunks.
  */
class DictionarySpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-dict-test")
  private val dir = "/root/testdata/sf0.01"

  private def scratch(tag: String) = s"target/scratch/test/dict/$tag"

  private lazy val li = graft.engine.Tables.load(spark, dir, "lineitem")

  /** A 4-file dictionary-encoded copy (Spark writer defaults). */
  private lazy val dictPath: String = {
    val out = scratch("dict4")
    li.repartition(4, col("l_suppkey")).write.mode("overwrite").parquet(out)
    out
  }

  /** The same rows with dictionary encoding DISABLED — every chunk is
    * PLAIN, so nothing is covered and the scan fallback carries it. */
  private lazy val plainPath: String = {
    val out = scratch("plain")
    li.coalesce(2).write.mode("overwrite")
      .option("parquet.enable.dictionary", "false").parquet(out)
    out
  }

  private val cols = Seq("l_suppkey", "l_quantity", "l_returnflag")

  private def truth(path: String, c: String): Long =
    spark.read.parquet(path).select(c).filter(col(c).isNotNull).distinct().count()

  test("dictionary-served distinct counts are exact for int64/double/string views") {
    val idx = DictionaryIndex.build(spark, dictPath, "li", cols).cache()
    val covered = idx.filter(col("covered")).count()
    assert(covered == cols.size * 4L,
      s"expected every (file, column) covered on the dict-encoded copy, got $covered")
    cols.foreach { c =>
      val (n, cov, total) = DictionaryIndex.countDistinct(spark, idx, dictPath, c)
      assert(total == 4L && cov == 4L)
      assert(n == truth(dictPath, c), s"column $c")
    }
  }

  test("plain-encoded files are never covered and degrade to an exact scan") {
    val idx = DictionaryIndex.build(spark, plainPath, "li", cols).cache()
    assert(idx.filter(col("covered")).count() == 0L)
    cols.foreach { c =>
      val (n, cov, _) = DictionaryIndex.countDistinct(spark, idx, plainPath, c)
      assert(cov == 0L)
      assert(n == truth(plainPath, c), s"column $c (scan fallback)")
    }
  }

  test("a mixed dict/plain table unions both paths exactly") {
    val out = scratch("mixed")
    val half = li.filter(col("l_orderkey") % 2 === 0)
    half.coalesce(1).write.mode("overwrite").parquet(out)
    li.filter(col("l_orderkey") % 2 === 1).coalesce(1)
      .write.mode("append").option("parquet.enable.dictionary", "false").parquet(out)
    val idx = DictionaryIndex.build(spark, out, "li", cols).cache()
    val byCov = idx.groupBy(col("covered")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byCov.getOrElse(true, 0L) == cols.size.toLong, s"one covered file expected: $byCov")
    assert(byCov.getOrElse(false, 0L) == cols.size.toLong, s"one plain file expected: $byCov")
    cols.foreach { c =>
      val (n, _, _) = DictionaryIndex.countDistinct(spark, idx, out, c)
      assert(n == truth(out, c), s"column $c (hybrid)")
    }
  }

  test("countDistinctMany matches the per-column path, covered and mixed alike") {
    // fully covered: the one-job batched path serves every column
    val idx = DictionaryIndex.build(spark, dictPath, "li", cols).cache()
    val many = DictionaryIndex.countDistinctMany(spark, idx, dictPath, cols)
    cols.foreach { c =>
      assert(many(c) == DictionaryIndex.countDistinct(spark, idx, dictPath, c), s"column $c")
    }
    // mixed coverage: covered columns batch, the uncovered file forces
    // the fallback partition — both still exact vs the scan truth
    val out = scratch("mixed-many")
    li.filter(col("l_orderkey") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(out)
    li.filter(col("l_orderkey") % 2 === 1).coalesce(1)
      .write.mode("append").option("parquet.enable.dictionary", "false").parquet(out)
    val idx2 = DictionaryIndex.build(spark, out, "li", cols).cache()
    val many2 = DictionaryIndex.countDistinctMany(spark, idx2, out, cols)
    cols.foreach(c => assert(many2(c)._1 == truth(out, c), s"column $c (mixed)"))
  }

  test("equality pruning keeps only dictionary-positive files where zone maps keep all") {
    val out = scratch("buckets")
    li.repartition(8, col("l_suppkey")).write.mode("overwrite").parquet(out)
    val idx = DictionaryIndex.build(spark, out, "li", Seq("l_suppkey")).cache()
    val total = MicroBlockIndex.listParquetFiles(out).size
    assert(total == 8)

    // zone maps on a hash layout prune only by luck: each file's
    // [min, max] spans a random ~1/8 subset of 100 keys, so some files
    // happen to exclude 3 at this tiny cardinality — at realistic
    // cardinality every file spans the whole range and min/max refutes
    // nothing. The structural guarantee under test: the dictionary cut
    // is EXACT (keeps precisely the one file holding the key) and
    // strictly dominates the min/max cut on the same layout.
    val zoneIdx = MicroBlockIndex.build(spark, out, "li").toDF
    val zoneSkipped =
      IndexPruning.skippedFiles(zoneIdx, Cmp("=", "l_suppkey", PredValue(3L)))
    val skipped = DictionaryIndex.skippedFilesEq(idx, "l_suppkey", Seq(PredValue(3L)))
    assert(skipped.size == total - 1,
      s"hash bucketing puts suppkey 3 in exactly one file; skipped ${skipped.size}/$total")
    assert(skipped.size > zoneSkipped.size,
      s"dictionary cut (${skipped.size}) must dominate zone maps (${zoneSkipped.size})")
    assert(zoneSkipped.toSet.subsetOf(skipped.toSet),
      "every min/max-refuted file is dictionary-refuted too")

    val served = DictionaryIndex.prunedReadEq(
      spark, idx, out, "l_suppkey", Seq(PredValue(3L)))
    val expect = spark.read.parquet(out).filter(col("l_suppkey") === 3)
    assert(served.count() == expect.count() && served.count() > 0)
    assert(served.select(sum(col("l_orderkey"))).first.getLong(0) ==
      expect.select(sum(col("l_orderkey"))).first.getLong(0))

    // IN over two keys in different buckets keeps exactly their files
    val skippedIn = DictionaryIndex.skippedFilesEq(idx, "l_suppkey",
      Seq(PredValue(3L), PredValue(4L)))
    val keptIn = total - skippedIn.size
    assert(keptIn >= 1 && keptIn <= 2)
    val servedIn = DictionaryIndex.prunedReadEq(spark, idx, out, "l_suppkey",
      Seq(PredValue(3L), PredValue(4L)))
    assert(servedIn.count() ==
      spark.read.parquet(out).filter(col("l_suppkey").isin(3, 4)).count())
  }

  test("incremental refresh indexes only appended files and matches a full rebuild") {
    val out = scratch("refresh")
    val even = li.filter(col("l_orderkey") % 2 === 0)
    val odd = li.filter(col("l_orderkey") % 2 === 1)
    even.repartition(2, col("l_suppkey")).write.mode("overwrite").parquet(out)
    val base = DictionaryIndex.build(spark, out, "li", Seq("l_suppkey")).cache()
    val baseFiles = MicroBlockIndex.listParquetFiles(out).toSet
    // no new files: refresh is the identity, no job run
    assert(DictionaryIndex.refresh(spark, out, "li", base) eq base)
    // append-only ingest: two more files land
    odd.repartition(2, col("l_suppkey")).write.mode("append").parquet(out)
    assert(MicroBlockIndex.listParquetFiles(out).size == baseFiles.size + 2)
    val refreshed = DictionaryIndex.refresh(spark, out, "li", base).cache()
    // the original files' entries are carried, not re-read: identical rows
    def snapshot(ds: org.apache.spark.sql.Dataset[graft.sources.FileDict]) =
      ds.collect().map(d => (d.file, d.column) ->
        ((d.covered, d.rowGroups, d.valuesLong.toSet, d.valuesDouble.toSet,
          d.valuesStr.toSet))).toMap
    val rebuilt = snapshot(DictionaryIndex.build(spark, out, "li", Seq("l_suppkey")))
    val incr = snapshot(refreshed)
    assert(incr.keySet == rebuilt.keySet,
      "refresh must cover exactly the files a full rebuild covers")
    incr.foreach { case (k, v) =>
      assert(v == rebuilt(k), s"refreshed entry differs from rebuild at $k") }
    // and the refreshed index SERVES correctly over the appended table
    val (n, covered, total) =
      DictionaryIndex.countDistinct(spark, refreshed, out, "l_suppkey")
    assert(n == li.select(count_distinct(col("l_suppkey"))).first.getLong(0))
    assert(covered == total && total == baseFiles.size + 2)
    val served = DictionaryIndex.prunedReadEq(
      spark, refreshed, out, "l_suppkey", Seq(PredValue(3L)))
    assert(served.count() ==
      spark.read.parquet(out).filter(col("l_suppkey") === 3).count())
  }

  test("refresh detects an in-place rewrite and re-reads its dictionary pages") {
    val out = scratch("refresh-rewrite")
    def writeAs(name: String, distinct: Seq[Long]): Unit = {
      import spark.implicits._
      val stage = s"$out-stage"
      // repeat each value: parquet-mr only keeps the dictionary when it
      // compresses (3 unique rows fall back to PLAIN → covered=false)
      val keys = (0 until 900).map(i => distinct(i % distinct.size))
      keys.toDF("k").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(out).mkdirs()
      val dst = new java.io.File(s"$out/$name")
      java.nio.file.Files.copy(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(System.currentTimeMillis() + 4000)
    }
    Option(new java.io.File(out).listFiles()).foreach(_.foreach(_.delete()))
    writeAs("a.parquet", Seq(1L, 2L, 3L))
    writeAs("b.parquet", Seq(10L, 11L))
    val v1 = DictionaryIndex.build(spark, out, "t", Seq("k"))
    // b.parquet rewritten in place (a compaction under the same name):
    // its recorded value set {10, 11} is DEAD
    writeAs("b.parquet", Seq(100L, 101L, 102L))
    val v2 = DictionaryIndex.refresh(spark, out, "t", v1)
    val byFile = v2.collect().groupBy(_.file.split('/').last)
    assert(byFile("a.parquet").head.valuesLong.toSet == Set(1L, 2L, 3L))
    assert(byFile("b.parquet").head.valuesLong.toSet == Set(100L, 101L, 102L),
      "the rewritten file's entry must carry the NEW value set")
    // serving works again without a full rebuild (the r14 doc said
    // 'a compaction that rewrites in place needs a rebuild' — no more)
    val (n, covered, total) = DictionaryIndex.countDistinct(spark, v2, out, "k")
    assert(n == 6L && covered == 2L && total == 2L)
    // idempotent after the re-read
    assert(DictionaryIndex.refresh(spark, out, "t", v2) eq v2)
  }

  test("per-root router: two roots of different file sizes route independently") {
    import spark.implicits._
    val smallRoot = scratch("route-small")
    val bigRoot = scratch("route-big")
    (0L until 100L).toDF("k").coalesce(1)
      .write.mode("overwrite").parquet(smallRoot)
    (0L until 400000L).map(i => (i, s"pad-$i-${"x" * 40}")).toDF("k", "s")
      .repartition(2).write.mode("overwrite").parquet(bigRoot)
    DictionaryIndex.resetRouterStats()
    try {
      val smallIdx = DictionaryIndex.build(spark, smallRoot, "s", Seq("k"))
      val bigIdx = DictionaryIndex.build(spark, bigRoot, "b", Seq("k"))
      // seed each root: calibration is PER ROOT, so the big root's
      // (slower, bigger) median file never poisons the small root's
      // pricing and vice versa — the r14 session-global carried limit.
      // Round 16: first lookups route on file metadata and calibrate in
      // the BACKGROUND, so the spec awaits both roots' calibrations.
      DictionaryIndex.prunedReadEqMeasured(
        spark, smallIdx, smallRoot, "k", Seq(PredValue(7L))).collect()
      DictionaryIndex.prunedReadEqMeasured(
        spark, bigIdx, bigRoot, "k", Seq(PredValue(7L))).collect()
      assert(graft.sources.CostRouter.awaitCalibration(smallRoot))
      assert(graft.sources.CostRouter.awaitCalibration(bigRoot))
      val (decS, bwS) = DictionaryIndex.routerStats(smallRoot)
      val (decB, bwB) = DictionaryIndex.routerStats(bigRoot)
      assert(decS.exists(_ > 0) && bwS.exists(_ > 0))
      assert(decB.exists(_ > 0) && bwB.exists(_ > 0))
      // the calibration observations differ per root (different median
      // files), so the marginal rates are independently derived
      assert(bwS.get != bwB.get,
        "per-root calibrations must be independent observations")
      // each root's route follows ITS OWN constants
      for ((root, dec, bw) <- Seq((smallRoot, decS, bwS), (bigRoot, decB, bwB))) {
        val est = DictionaryIndex.tableBytes(root) / bw.get
        assert(DictionaryIndex.pointLookupRouteMeasured(root) ==
          (if (dec.get < est) "dict" else "scan"), s"root $root")
      }
    } finally DictionaryIndex.resetRouterStats()
  }

  test("absent probe refutes every file and still returns a typed empty result") {
    val idx = DictionaryIndex.build(spark, dictPath, "li", Seq("l_suppkey")).cache()
    val skipped = DictionaryIndex.skippedFilesEq(idx, "l_suppkey", Seq(PredValue(1000000L)))
    assert(skipped.size == 4)
    val served = DictionaryIndex.prunedReadEq(
      spark, idx, dictPath, "l_suppkey", Seq(PredValue(1000000L)))
    assert(served.count() == 0L)
    assert(served.columns.contains("l_orderkey")) // schema survives
    // a non-integral numeric probe on an integer column can never match
    val servedFrac = DictionaryIndex.prunedReadEq(
      spark, idx, dictPath, "l_suppkey", Seq(PredValue(3.5)))
    assert(servedFrac.count() == 0L)
  }

  test("unindexed column and all-null column stay exact") {
    import spark.implicits._
    // column the index has no rows for: falls back to a full scan
    val idx = DictionaryIndex.build(spark, dictPath, "li", Seq("l_suppkey")).cache()
    val n = DictionaryIndex.distinctValues(spark, idx, dictPath, "l_returnflag").count()
    assert(n == truth(dictPath, "l_returnflag"))
    assert(DictionaryIndex.skippedFilesEq(idx, "l_returnflag", Seq(PredValue("A"))).isEmpty)

    // all-null string column: zero distinct, no crash on missing pages
    val out = scratch("allnull")
    Seq.tabulate(100)(i => (i.toLong, Option.empty[String]))
      .toDF("id", "s").coalesce(1).write.mode("overwrite").parquet(out)
    val idx2 = DictionaryIndex.build(spark, out, "t", Seq("id", "s")).cache()
    assert(DictionaryIndex.distinctValues(spark, idx2, out, "s").count() == 0L)
    assert(DictionaryIndex.distinctValues(spark, idx2, out, "id").count() == 100L)
  }

  test("sidecar save/load roundtrip preserves decisions and stays invisible to scans") {
    val rowsBefore = spark.read.parquet(dictPath).count()
    val idx = DictionaryIndex.build(spark, dictPath, "li", Seq("l_suppkey"))
    DictionaryIndex.saveSidecar(idx, dictPath)
    val loaded = DictionaryIndex.load(spark, DictionaryIndex.sidecarPath(dictPath))
    val a = DictionaryIndex.skippedFilesEq(idx, "l_suppkey", Seq(PredValue(7L))).sorted
    val b = DictionaryIndex.skippedFilesEq(loaded, "l_suppkey", Seq(PredValue(7L))).sorted
    assert(a == b)
    // the _graft_dict dir must not leak into the table's own scans
    assert(spark.read.parquet(dictPath).count() == rowsBefore)
  }

  test("point-lookup cost router: scan below the byte threshold, dict above, rows identical") {
    val idx = DictionaryIndex.build(spark, dictPath, "li", Seq("l_suppkey"))
    // sf0.01 is far below the default 256 MB crossover — the router
    // must take the straight scan (round 10's forced dict path LOST
    // here: the skip-list job costs more than the scan it saves)
    assert(DictionaryIndex.pointLookupRoute(dictPath) == "scan")
    // forced-low threshold: the dictionary cut engages
    assert(DictionaryIndex.pointLookupRoute(dictPath, minBytes = 1L) == "dict")
    val probe = Seq(PredValue(7L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val viaScan = DictionaryIndex.prunedReadEqAuto(
      spark, idx, dictPath, "l_suppkey", probe)
    val viaDict = DictionaryIndex.prunedReadEqAuto(
      spark, idx, dictPath, "l_suppkey", probe, minBytes = 1L)
    val truth = spark.read.parquet(dictPath).filter(col("l_suppkey") === 7)
    assert(rows(viaScan) == rows(truth))
    assert(rows(viaDict) == rows(truth))
  }

  test("measured router: first lookup routes on metadata and calibrates in background, later routes follow the learned constants, rows identical") {
    val idx = DictionaryIndex.build(spark, dictPath, "li", Seq("l_suppkey"))
    DictionaryIndex.resetRouterStats()
    assert(DictionaryIndex.pointLookupRouteMeasured(dictPath) == "calibrate")
    val probe = Seq(PredValue(7L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val truth = spark.read.parquet(dictPath).filter(col("l_suppkey") === 7)
    // first call: routes on already-listed file metadata (the
    // fixed-threshold model — no extra Spark job in the query path,
    // the round-16 first-query fix) and fires the BACKGROUND
    // calibration that prices later lookups
    val first = DictionaryIndex.prunedReadEqMeasured(
      spark, idx, dictPath, "l_suppkey", probe)
    assert(rows(first) == rows(truth))
    assert(graft.sources.CostRouter.awaitCalibration(dictPath),
      "background calibration must land")
    val (dec, bps) = DictionaryIndex.routerStats(dictPath)
    assert(dec.exists(_ > 0) && bps.exists(_ > 0),
      "both constants must be measured after the seeding lookup")
    // routed call: whatever side of the crossover this box measures,
    // the route is the one the constants price cheaper — and the rows
    // are identical either way
    val route = DictionaryIndex.pointLookupRouteMeasured(dictPath)
    val estScanSec = DictionaryIndex.tableBytes(dictPath) / bps.get
    assert(route == (if (dec.get < estScanSec) "dict" else "scan"))
    // the marginal-bandwidth correction: bps is the decision-overhead-
    // subtracted per-byte rate, so a metadata-sized table must route
    // to the straight scan (the pre-fix raw quotient mis-routed it)
    val second = DictionaryIndex.prunedReadEqMeasured(
      spark, idx, dictPath, "l_suppkey", probe)
    assert(rows(second) == rows(truth))
    DictionaryIndex.resetRouterStats()
  }

  test("Pred.toColumn pushes integral literals down to parquet; rows identical to the double rendering") {
    import graft.plans.Between
    // the round-17 fix: PredValue stores numbers as Double, and the
    // old `lit(3.0)` rendering put a cast ON THE COLUMN — PushedFilters
    // carried only IsNotNull, so every serve path re-read pages its
    // predicate should have skipped
    def pushed(p: graft.plans.Pred): String =
      spark.read.parquet(dictPath).filter(p.toColumn)
        .queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("PushedFilters"))
        .mkString
    assert(pushed(Cmp("=", "l_suppkey", PredValue(3L)))
      .contains("EqualTo(l_suppkey,3)"))
    assert(pushed(In("l_suppkey", Seq(PredValue(3L), PredValue(5L))))
      .contains("In(l_suppkey"))
    assert(pushed(Between("l_suppkey", PredValue(2L), PredValue(4L)))
      .contains("GreaterThanOrEqual(l_suppkey,2)"))
    // row identity vs the double-literal filter, integral and fractional
    def cnt(c: org.apache.spark.sql.Column) =
      spark.read.parquet(dictPath).filter(c).count()
    assert(cnt(Cmp("<=", "l_suppkey", PredValue(4L)).toColumn) ==
      cnt(col("l_suppkey") <= lit(4.0)))
    assert(cnt(Cmp("<", "l_quantity", PredValue(25.5)).toColumn) ==
      cnt(col("l_quantity") < lit(25.5)))
    // a fractional literal must stay a double (truncation would move
    // the cut line)
    assert(PredValue(25.5).litValue == 25.5)
    assert(PredValue(4L).litValue == 4L)
    // timestamp literals keep their string rendering
    assert(PredValue.ts("1995-01-01").litValue == "1995-01-01 00:00:00")
  }

  test("tableBytes memoizes per root and invalidates with the sidecar manifest") {
    import spark.implicits._
    val out = scratch("bytes-memo")
    Seq.tabulate(100)(i => (i.toLong, s"x$i")).toDF("id", "s")
      .write.mode("overwrite").parquet(out)
    graft.sources.SidecarManifest.invalidate(out)
    val b1 = DictionaryIndex.tableBytes(out)
    assert(b1 > 0L)
    // grow the table; the memo serves the stale total (cost-only
    // signal) until a writer invalidates the root
    Seq.tabulate(100)(i => (i.toLong, s"y$i" * 50)).toDF("id", "s")
      .write.mode("append").parquet(out)
    assert(DictionaryIndex.tableBytes(out) == b1, "memo must hit")
    graft.sources.SidecarManifest.invalidate(out)
    assert(DictionaryIndex.tableBytes(out) > b1, "invalidate must drop the memo")
  }

  test("cost router sees nested bytes on a hive-partitioned layout") {
    import spark.implicits._
    val out = scratch("route-part")
    Seq.tabulate(200)(i => (i.toLong, i % 4, s"pad-$i"))
      .toDF("id", "p", "s")
      .write.mode("overwrite").partitionBy("p").parquet(out)
    // through round 13 the router summed TOP-LEVEL files only: a
    // partitioned table reported 0 bytes and always routed "scan" —
    // correct but never the dict cut on the layout big tables use
    assert(DictionaryIndex.tableBytes(out) > 0L)
    assert(DictionaryIndex.pointLookupRoute(out, minBytes = 1L) == "dict")
    // and the recursive total agrees with what Spark's listing scans
    val sparkBytes = graft.sources.MicroBlockIndex
      .listParquetFilesWithStatus(out).map(_._3).sum
    assert(DictionaryIndex.tableBytes(out) == sparkBytes)
  }

  test("timestamp columns qualify only at MICROS unit (probe domain safety)") {
    import spark.implicits._
    val df = Seq("2024-01-01 10:00:00", "2024-06-15 12:30:00", "2025-03-03 01:02:03")
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    val outMicros = scratch("ts-micros")
    val outMillis = scratch("ts-millis")
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      df.coalesce(1).write.mode("overwrite").parquet(outMicros)
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
      df.coalesce(1).write.mode("overwrite").parquet(outMillis)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)

    // NOTE: Spark's own parquet writer emits INT64 timestamps PLAIN
    // (no dictionary pages — verified empirically on both units), so a
    // Spark-written micros file is uncovered by the encoding gate
    // alone and serves through the exact scan path; the MICROS
    // acceptance in the logical-type gate exists for foreign writers
    // (arrow-cpp dictionary-encodes timestamps). The load-bearing
    // assertion is the MILLIS side: even if such a file WERE
    // dictionary-covered, its raw values are the wrong scale for
    // Catalyst-micros probes, so coverage must refuse and probes must
    // never falsely refute.
    val idxMillis = DictionaryIndex.build(spark, outMillis, "ts", Seq("ts"))
    assert(idxMillis.collect().forall(!_.covered),
      "millis files store a different scale — must NOT be covered")
    // a Catalyst-micros probe of a present value: the millis index
    // must keep every file (conservative), never falsely refute
    val presentMicros = spark.read.parquet(outMillis)
      .select(unix_micros(col("ts"))).first.getLong(0)
    assert(DictionaryIndex.skippedFilesEq(
      idxMillis, "ts", Seq(PredValue(presentMicros))).isEmpty)
    // and the micros table stays EXACT through whatever path serves it
    val idxMicros = DictionaryIndex.build(spark, outMicros, "ts", Seq("ts"))
    assert(DictionaryIndex.distinctValues(spark, idxMicros, outMicros, "ts")
      .count() == 3L)
  }

  test("a schema-evolved long/double column serves the exact union, never a per-type drop") {
    import spark.implicits._
    val out = scratch("mixed")
    // two covered files with OVERLAPPING value sets in different
    // physical types: per-type counting would double-count 1 and 2
    val d1 = scratch("mixed-tmp1"); val d2 = scratch("mixed-tmp2")
    Seq(1L, 2L, 3L, 1L).toDF("id").coalesce(1).write.mode("overwrite").parquet(d1)
    Seq(1.0, 2.0, 4.0, 4.0).toDF("id").coalesce(1).write.mode("overwrite").parquet(d2)
    val outP = java.nio.file.Paths.get(out)
    org.apache.commons.io.FileUtils.deleteDirectory(outP.toFile)
    java.nio.file.Files.createDirectories(outP)
    Seq(d1 -> "a.parquet", d2 -> "b.parquet").foreach { case (src, name) =>
      val f = graft.sources.MicroBlockIndex.listParquetFiles(src).head
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(graft.plans.ZoneMapPruneRule.normFile(f)),
        outP.resolve(name))
    }
    val idx = DictionaryIndex.build(spark, out, "mixed", Seq("id"))
    val byType = idx.collect()
    assert(byType.exists(_.valuesLong.nonEmpty) && byType.exists(_.valuesDouble.nonEmpty),
      "fixture must actually mix physical types")
    // distinct union in the double domain: {1, 2, 3, 4} — round 10
    // summed per-type counts (3 + 3 = 6) and dropped one array's
    // values from the value serve
    assert(DictionaryIndex.distinctValues(spark, idx, out, "id").count() == 4L)
    val counts = DictionaryIndex.countDistinctMany(spark, idx, out, Seq("id"))
    assert(counts("id")._1 == 4L, s"got ${counts("id")._1}, want 4")
  }

  /** A dictionary-ENCODED MICROS-timestamp parquet file, which Spark's
    * own writer never emits (it writes INT64 timestamps PLAIN) —
    * written directly with parquet-mr, the way a foreign writer
    * (arrow-cpp) produces covered timestamp chunks. */
  private def writeCoveredMicrosFile(path: String, micros: Seq[Long]): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    val schema = Types.buildMessage()
      .optional(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true,
        LogicalTypeAnnotation.TimeUnit.MICROS))
      .named("ts")
      .named("spark_schema")
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(path))
      .withConf(new org.apache.hadoop.conf.Configuration())
      .withType(schema)
      .withDictionaryEncoding(true)
      .build()
    try {
      val f = new SimpleGroupFactory(schema)
      // repeat each value: parquet-mr only emits a dictionary page
      // once the column holds enough values to bother
      (1 to 40).foreach(_ =>
        micros.foreach(m => writer.write(f.newGroup().append("ts", m))))
    } finally writer.close()
  }

  test("partially-covered timestamp column counts exactly (micros domain alignment)") {
    // the round-12 HIGH finding: the dictionary side holds raw MICROS
    // longs while cast(timestamp AS long) on the uncovered-scan side
    // yields epoch SECONDS — the mismatched union double-counted
    // shared values and collapsed sub-second-distinct timestamps.
    val out = scratch("ts-partial")
    val outP = java.nio.file.Paths.get(out)
    org.apache.commons.io.FileUtils.deleteDirectory(outP.toFile)
    java.nio.file.Files.createDirectories(outP)
    val base = 1704103200000000L // 2024-01-01 10:00:00 UTC in micros
    val hour = 3600L * 1000000L
    // Covered file: a sub-second-distinct pair + TWO values shared
    // with the uncovered file. Uncovered scan file: the two shared
    // values + its own sub-second pair. Under the old seconds/micros
    // union the two overlaps double-count (+2) and the scan pair
    // collapses (-1): 7 ≠ 6 — overlap ≠ collapse by construction so
    // the errors cannot cancel.
    writeCoveredMicrosFile(s"$out/covered.parquet",
      Seq(base, base + 1L, base + hour, base + 2 * hour))
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      spark.range(1).select(
          explode(array(
            lit(base + hour), lit(base + 2 * hour),
            lit(base + 3 * hour), lit(base + 3 * hour + 1L))).as("us"))
        .select(timestamp_micros(col("us")).as("ts"))
        .coalesce(1).write.mode("append").parquet(out)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)

    val idx = DictionaryIndex.build(spark, out, "ts", Seq("ts")).cache()
    val covs = idx.collect()
    assert(covs.exists(_.covered) && covs.exists(!_.covered),
      s"fixture must mix covered and uncovered timestamp files: ${covs.mkString(", ")}")
    // truth: 6 distinct instants (base, base+1us, +1h, +2h, +3h, +3h+1us)
    assert(truth(out, "ts") == 6L)
    val (n, cov, total) = DictionaryIndex.countDistinct(spark, idx, out, "ts")
    assert(cov == 1L && total == 2L)
    assert(n == 6L, s"micros/seconds domain mismatch: got $n, want 6")
    assert(DictionaryIndex.countDistinctMany(
      spark, idx, out, Seq("ts"))("ts")._1 == 6L)
    // the value serve stays in ONE domain (raw micros longs)
    val vals = DictionaryIndex.distinctValues(spark, idx, out, "ts")
    assert(vals.count() == 6L)
  }

  test("partially-covered date column counts exactly (days domain alignment)") {
    // same domain-alignment contract for dates: the dictionary holds
    // raw day numbers; the scan side must align via unix_date (a plain
    // cast(date AS long) is not even legal Catalyst)
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    val out = scratch("date-partial")
    val outP = java.nio.file.Paths.get(out)
    org.apache.commons.io.FileUtils.deleteDirectory(outP.toFile)
    java.nio.file.Files.createDirectories(outP)
    val schema = Types.buildMessage()
      .optional(PrimitiveTypeName.INT32)
      .as(LogicalTypeAnnotation.dateType())
      .named("d")
      .named("spark_schema")
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$out/covered.parquet"))
      .withConf(new org.apache.hadoop.conf.Configuration())
      .withType(schema)
      .withDictionaryEncoding(true)
      .build()
    try {
      val f = new SimpleGroupFactory(schema)
      (1 to 40).foreach(_ =>
        Seq(19723, 19724, 19725).foreach(d => // 2024-01-01..03 in days
          writer.write(f.newGroup().append("d", d))))
    } finally writer.close()
    spark.range(1).select(
        explode(array(lit(19725), lit(19726))).as("days"))
      .select(date_from_unix_date(col("days")).as("d"))
      .coalesce(1).write.mode("append")
      .option("parquet.enable.dictionary", "false").parquet(out)
    val idx = DictionaryIndex.build(spark, out, "d", Seq("d")).cache()
    val covs = idx.collect()
    assert(covs.exists(_.covered) && covs.exists(!_.covered),
      s"fixture must mix covered and uncovered date files: ${covs.mkString(", ")}")
    assert(truth(out, "d") == 4L)
    val (n, cov, total) = DictionaryIndex.countDistinct(spark, idx, out, "d")
    assert(cov == 1L && total == 2L)
    assert(n == 4L, s"days domain mismatch: got $n, want 4")
  }
}
