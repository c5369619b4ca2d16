package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parameter-sensitivity sweep for the two capped/width-parameterized
  * dedup operators (the round-4 verdict's remaining "nice-to-have"):
  *
  * - `dd_span`'s boilerplate cap `maxDocsPerSpan` bounds how many
  *   docs may share a k-gram before it is dropped as boilerplate —
  *   the knob that keeps pair generation off O(hot²). The sweep shows
  *   what the cap buys (wall time, candidate-pair mass) and what it
  *   costs (pairs whose only shared grams are corpus-hot).
  * - `dd_para`'s chunk width `w` trades granularity for dup recall:
  *   narrow chunks catch short boilerplate but fragment text; wide
  *   chunks only catch long verbatim repeats.
  *
  * Usage: runMain graft.ParamSweep [srcDir] [reps]. Writes one JSON
  * line + target/param_sweep.json. Probe discipline as Bench/LlmScale.
  */
object ParamSweep {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$src/documents.parquet")

    def probe(): Double = {
      val t0 = System.nanoTime()
      spark.range(1000000).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // median wall time + the result row the sweep cares about
    def timed(body: () => (Long, Long)): (Double, Long, Long) = {
      var stats = (0L, 0L)
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        stats = body()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (times(reps / 2), stats._1, stats._2)
    }

    val probeStart = probe()
    val spanRows = Seq(10, 25, 50, 100, 200).map { cap =>
      val (sec, pairs, grams) = timed { () =>
        val out = graft.operators.DedupOps.spanPairs(docs, k = 8, maxDocsPerSpan = cap)
          .agg(count(lit(1)), coalesce(sum("n_matched_grams"), lit(0L)))
          .head()
        (out.getLong(0), out.getLong(1))
      }
      println(f"[sweep] dd_span cap=$cap%-4d $sec%6.2fs pairs=$pairs matched_grams=$grams")
      s"""{"cap":$cap,"sec":$sec,"pairs":$pairs,"matched_grams":$grams}"""
    }
    val paraRows = Seq(5, 10, 20, 40).map { w =>
      val (sec, dupDocs, dupChunks) = timed { () =>
        val out = graft.operators.DedupOps.chunkDedup(docs, w = w)
          .agg(sum(when(col("n_dup_chunks") > 0, 1L).otherwise(0L)),
            coalesce(sum("n_dup_chunks"), lit(0L)))
          .head()
        (out.getLong(0), out.getLong(1))
      }
      println(f"[sweep] dd_para w=$w%-3d $sec%6.2fs docs_with_dups=$dupDocs dup_chunks=$dupChunks")
      s"""{"w":$w,"sec":$sec,"docs_with_dups":$dupDocs,"dup_chunks":$dupChunks}"""
    }
    val probeEnd = probe()

    val line =
      s"""{"src":"$src","reps":$reps,"stat":"median","probe_start_sec":$probeStart,"probe_end_sec":$probeEnd,""" +
        s""""dd_span_cap":[${spanRows.mkString(",")}],""" +
        s""""dd_para_w":[${paraRows.mkString(",")}]}"""
    println(line)
    val out = java.nio.file.Paths.get("target/param_sweep.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
