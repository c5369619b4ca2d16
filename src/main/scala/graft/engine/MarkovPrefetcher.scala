package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Next-block access predictor.
  *
  * The reference trains an LSTM over sliding windows of the access log
  * and asks it for the top-K most likely next blocks
  * (model.py, training_set_generator.py:1-89, prefetch_scheduler.py).
  * graft keeps the same contract — train on history, `suggest` top-K —
  * with a k-order Markov transition model: counts of (context → next)
  * over the access sequence. Training is a pure Spark aggregation
  * (window lag + groupBy count), so it scales to arbitrarily long logs;
  * the fitted table is tiny (≤ blocks² rows) and broadcasts to the
  * driver for O(1) serving, exactly like the reference's in-process
  * model inference.
  */
final class MarkovPrefetcher(order: Int = 1) {
  require(order >= 1 && order <= 3, "supported context lengths: 1..3")

  /** context (most-recent-last, comma-joined) -> ranked next blocks */
  @volatile private var transitions: Map[String, Seq[(Int, Long)]] = Map.empty

  /** Train from a sequence table: (seq Long ordering, block Int). */
  def fit(spark: SparkSession, events: DataFrame): MarkovPrefetcher = {
    val w = Window.orderBy("seq")
    val withCtx = (1 to order).foldLeft(events) { (df, i) =>
      df.withColumn(s"prev_$i", lag(col("block"), i).over(w))
    }
    val ctxCol = concat_ws(",", (order to 1 by -1).map(i => col(s"prev_$i")): _*)
    val counts = withCtx
      .filter((1 to order).map(i => col(s"prev_$i").isNotNull).reduce(_ && _))
      .groupBy(ctxCol.as("ctx"), col("block"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    transitions = counts.groupBy(_._1).map { case (ctx, rows) =>
      ctx -> rows.map(r => (r._2, r._3)).sortBy(r => (-r._2, r._1)).toSeq
    }
    this
  }

  /** Convenience: fit from an in-memory access history. */
  def fitSeq(spark: SparkSession, blocks: Seq[Int]): MarkovPrefetcher = {
    import spark.implicits._
    fit(spark, blocks.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("seq", "block"))
  }

  /** Top-k predicted next blocks given recent history (most recent
    * last). Falls back to shorter contexts when the full context was
    * never seen (stupid-backoff). */
  def suggest(recent: Seq[Int], k: Int): Seq[Int] = {
    if (recent.isEmpty) return Seq.empty
    val out = mutable.LinkedHashSet.empty[Int]
    var ctxLen = math.min(order, recent.size)
    while (out.size < k && ctxLen >= 1) {
      val ctx = recent.takeRight(ctxLen).mkString(",")
      transitions.getOrElse(ctx, Seq.empty).foreach { case (b, _) =>
        if (out.size < k) out += b
      }
      ctxLen -= 1
    }
    out.toSeq
  }

  def fitted: Boolean = transitions.nonEmpty

  /** The fitted model as rows (ctx, block, cnt) for inspection/eval. */
  def modelRows: Seq[(String, Int, Long)] =
    transitions.toSeq.flatMap { case (ctx, nexts) =>
      nexts.map { case (b, c) => (ctx, b, c) }
    }
}
