package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Next-block access predictor.
  *
  * The reference trains an LSTM over sliding windows of the access log
  * and asks it for the top-K most likely next blocks
  * (model.py, training_set_generator.py:1-89, prefetch_scheduler.py).
  * graft keeps the same contract — train on history, `suggest` top-K —
  * with a back-off Markov model: transition counts for every context
  * length 1..order. Training is expressed as shuffle-partitioned
  * equi-joins on the sequence number (seq ↔ seq+i) + groupBy counts —
  * no global window, so it runs partitioned over arbitrarily long
  * logs. The fitted table is tiny (≤ contexts × blocks rows) and is
  * collected for O(1) driver-side serving, exactly like the
  * reference's in-process model inference.
  */
final class MarkovPrefetcher(order: Int = 1) extends Prefetcher {
  require(order >= 1 && order <= 3, "supported context lengths: 1..3")

  /** ctxLen -> (context most-recent-last, comma-joined) -> ranked next */
  @volatile private var transitions: Map[Int, Map[String, Seq[(Int, Long)]]] = Map.empty

  /** Train from a sequence table: (seq Long ordering, block Int).
    * `seq` only needs to ORDER the events — it is densified here via a
    * distributed range-sort + zipWithIndex, so gaps or non-contiguous
    * values (timestamps, sparse ids) are fine. */
  def fit(spark: SparkSession, events: DataFrame): MarkovPrefetcher = {
    import spark.implicits._
    val base = events
      .select(col("seq").cast("long").as("seq"), col("block").cast("int").as("block"))
      .sort("seq") // range-partitioned distributed sort
      .select("block").as[Int]
      .rdd.zipWithIndex // partition-ordered: indices follow the sort
      .map { case (b, i) => (i, b) }
      .toDF("seq", "block")
    // prev_i via equi-join on shifted seq: partitioned by seq, no
    // single-partition window
    val withCtx = (1 to order).foldLeft(base) { (df, i) =>
      df.join(
        base.select((col("seq") + i).as("seq"), col("block").as(s"prev_$i")),
        Seq("seq"), "left")
    }
    val fitted = (1 to order).map { len =>
      val ctxCol = concat_ws(",", (len to 1 by -1).map(i => col(s"prev_$i")): _*)
      val counts = withCtx
        .filter((1 to len).map(i => col(s"prev_$i").isNotNull).reduce(_ && _))
        .groupBy(ctxCol.as("ctx"), col("block"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      len -> counts.groupBy(_._1).map { case (ctx, rows) =>
        ctx -> rows.map(r => (r._2, r._3)).sortBy(r => (-r._2, r._1)).toSeq
      }
    }.toMap
    transitions = fitted
    this
  }

  /** Convenience: fit from an in-memory access history. */
  def fitSeq(spark: SparkSession, blocks: Seq[Int]): MarkovPrefetcher = {
    import spark.implicits._
    fit(spark, blocks.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("seq", "block"))
  }

  /** Top-k predicted next blocks given recent history (most recent
    * last); longest-context matches first, backing off to shorter
    * contexts (stupid backoff). */
  override def suggest(recent: Seq[Int], k: Int): Seq[Int] = {
    if (recent.isEmpty) return Seq.empty
    val out = mutable.LinkedHashSet.empty[Int]
    var ctxLen = math.min(order, recent.size)
    while (out.size < k && ctxLen >= 1) {
      val ctx = recent.takeRight(ctxLen).mkString(",")
      transitions.getOrElse(ctxLen, Map.empty).getOrElse(ctx, Seq.empty)
        .foreach { case (b, _) => if (out.size < k) out += b }
      ctxLen -= 1
    }
    out.toSeq
  }

  /** Confidence = the block's transition frequency at the LONGEST
    * context that names it, discounted 0.4 per backoff level (stupid
    * backoff — a shorter-context guess is a weaker guess). Same
    * candidate order as [[suggest]]. */
  override def suggestScored(recent: Seq[Int], k: Int): Seq[(Int, Double)] = {
    if (recent.isEmpty) return Seq.empty
    val out = mutable.LinkedHashMap.empty[Int, Double]
    var ctxLen = math.min(order, recent.size)
    var discount = 1.0
    while (out.size < k && ctxLen >= 1) {
      val ctx = recent.takeRight(ctxLen).mkString(",")
      val nexts = transitions.getOrElse(ctxLen, Map.empty)
        .getOrElse(ctx, Seq.empty)
      val total = nexts.map(_._2).sum.toDouble
      nexts.foreach { case (b, cnt) =>
        if (out.size < k && !out.contains(b))
          out += b -> (discount * cnt / math.max(1.0, total))
      }
      ctxLen -= 1
      discount *= 0.4
    }
    out.toSeq
  }

  def fitted: Boolean = transitions.values.exists(_.nonEmpty)

  /** The fitted max-order transitions as rows (ctx, block, cnt). */
  def modelRows: Seq[(String, Int, Long)] =
    transitions.getOrElse(order, Map.empty).toSeq.flatMap { case (ctx, nexts) =>
      nexts.map { case (b, c) => (ctx, b, c) }
    }

  /** Persist the fitted model: all context lengths' transition counts
    * as one parquet table + a meta sidecar. The reference's serving
    * loop reloads its trained model from disk at startup
    * (run_with_prefetch_loop.py:17-22) — without this, a fitted
    * prefetcher dies with the JVM and every engine restart starts
    * cache-cold AND model-cold. */
  def save(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val rows = transitions.toSeq.flatMap { case (len, byCtx) =>
      byCtx.toSeq.flatMap { case (ctx, nexts) =>
        nexts.map { case (b, c) => (len, ctx, b, c) }
      }
    }
    spark.createDataset(rows).toDF("ctxLen", "ctx", "block", "cnt")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/transitions.parquet")
    ModelIO.writeMeta(spark, dir, s"""{"model":"markov","order":$order}""")
  }

  /** Restore a model written by [[save]] into THIS instance (the
    * engine holds its prefetcher as a val, so in-place restore is the
    * serving-path-friendly form). Counts round-trip as exact longs and
    * the ranking re-applies the same (-cnt, block) order, so
    * post-restore `suggest` is bit-identical to pre-save. */
  def restore(spark: SparkSession, dir: String): MarkovPrefetcher = {
    val meta = ModelIO.readMeta(spark, dir)
    val storedOrder = ModelIO.intField(meta, "order")
    require(storedOrder == order,
      s"stored model order $storedOrder != this prefetcher's order $order")
    val rows = spark.read.parquet(s"$dir/transitions.parquet")
      .select("ctxLen", "ctx", "block", "cnt")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getLong(3)))
    transitions = rows.groupBy(_._1).map { case (len, rs) =>
      len -> rs.groupBy(_._2).map { case (ctx, xs) =>
        ctx -> xs.map(x => (x._3, x._4)).sortBy(t => (-t._2, t._1)).toSeq
      }
    }
    this
  }
}

object MarkovPrefetcher {
  /** Load a model from disk, order taken from the sidecar. */
  def load(spark: SparkSession, dir: String): MarkovPrefetcher = {
    val order = ModelIO.intField(ModelIO.readMeta(spark, dir), "order")
    new MarkovPrefetcher(order).restore(spark, dir)
  }
}
