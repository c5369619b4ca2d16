package graft.engine

import org.apache.spark.sql.SparkSession

/** Common serving contract for next-block predictors (the reference's
  * model interface: train on history, suggest top-K next blocks). */
trait Prefetcher {
  def suggest(recent: Seq[Int], k: Int): Seq[Int]
}

/** LEARNED-WEIGHTS sequence predictor — graft's stand-in for the
  * reference's LSTM (model.py:1-342; no torch exists in this sandbox,
  * so the model class is a log-linear sequence model in plain JVM
  * code rather than a recurrent net, trained the same way the rest of
  * graft computes: as Spark aggregations).
  *
  * Model: factorized softmax over the next block,
  *   logit(c | p₁..pₘ) = b(c) + Σ_pos W(pos, p_pos, c)
  * — each context position contributes an additive weight row (a
  * log-bilinear model, Mnih & Hinton '07 shape). Unlike the Markov
  * table it GENERALIZES: an unseen (p₁,p₂) combination still predicts
  * from each position's marginal weights instead of backing off.
  *
  * Training: full-batch gradient descent on cross-entropy. Each epoch
  * is ONE distributed aggregation — examples live in an RDD, every
  * partition accumulates its local gradient into a flat array, and
  * partial gradients are summed as 2⁻²⁴-scaled LONGS, so the result is
  * exact integer addition: deterministic under any partitioning or
  * combine order (same discipline as the IVF k-means means — see
  * ROUND_NOTES). The weight vector ((order·B + 1)·B doubles for B
  * distinct blocks) stays driver-side like the reference's in-process
  * model; at millions of blocks per table you'd hash block ids into a
  * bounded feature space first (documented limit, not hit by per-table
  * block counts).
  */
final class LogisticPrefetcher(
    order: Int = 2, epochs: Int = 60, lr: Double = 0.5) extends Prefetcher {
  require(order >= 1, "context length must be >= 1")

  private val Scale = (1L << 24).toDouble

  private var blocks: Array[Int] = Array.empty          // dense idx -> block id
  private var indexOf: Map[Int, Int] = Map.empty        // block id -> dense idx
  private var weights: Array[Double] = Array.empty      // (order*B + 1) x B

  private def nB: Int = blocks.length
  // weight layout: pos p, context block i, class c -> ((p*nB + i) * nB) + c;
  // bias row at offset order*nB*nB
  private def wIdx(pos: Int, ctx: Int, c: Int): Int = (pos * nB + ctx) * nB + c
  private def bIdx(c: Int): Int = order * nB * nB + c

  /** Fit from an access sequence (block ids in visit order). */
  def fit(spark: SparkSession, sequence: Seq[Int]): LogisticPrefetcher = {
    blocks = sequence.distinct.sorted.toArray
    indexOf = blocks.zipWithIndex.toMap
    val dense = sequence.map(indexOf).toArray
    // examples: (context most-recent-FIRST, label); short heads keep
    // their truncated context (position beyond history contributes 0)
    val examples = (1 until dense.length).map { t =>
      val ctx = (1 to math.min(order, t)).map(j => dense(t - j)).toArray
      (ctx, dense(t))
    }
    val nW = order * nB * nB + nB
    val n = examples.size
    weights = new Array[Double](nW)
    if (n == 0) return this
    val rdd = spark.sparkContext
      .parallelize(examples, math.max(1, math.min(examples.size, 64)))
      .cache()
    val B = nB
    val ord = order
    val scale = Scale
    (1 to epochs).foreach { _ =>
      val wB = spark.sparkContext.broadcast(weights)
      val grad = rdd.mapPartitions { it =>
        val w = wB.value
        val g = new Array[Double](nW)
        val logits = new Array[Double](B)
        it.foreach { case (ctx, y) =>
          var c = 0
          while (c < B) {
            var z = w(ord * B * B + c) // bias
            var p = 0
            while (p < ctx.length) { z += w((p * B + ctx(p)) * B + c); p += 1 }
            logits(c) = z
            c += 1
          }
          // softmax (max-shifted for stability)
          var mx = logits(0); c = 1
          while (c < B) { if (logits(c) > mx) mx = logits(c); c += 1 }
          var sum = 0.0; c = 0
          while (c < B) { logits(c) = math.exp(logits(c) - mx); sum += logits(c); c += 1 }
          c = 0
          while (c < B) {
            val d = logits(c) / sum - (if (c == y) 1.0 else 0.0)
            g(ord * B * B + c) += d
            var p = 0
            while (p < ctx.length) { g((p * B + ctx(p)) * B + c) += d; p += 1 }
            c += 1
          }
        }
        // integer-scaled partial gradient: exact, order-independent sums
        Iterator.single(g.map(v => math.rint(v * scale).toLong))
      }.reduce { (a, b) =>
        val out = new Array[Long](a.length)
        var i = 0
        while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
        out
      }
      wB.destroy()
      val step = lr / n
      var i = 0
      while (i < nW) { weights(i) -= step * (grad(i) / scale); i += 1 }
    }
    rdd.unpersist(blocking = false)
    this
  }

  override def suggest(recent: Seq[Int], k: Int): Seq[Int] = {
    if (recent.isEmpty || nB == 0) return Seq.empty
    // context most-recent-first, unknown blocks skipped (no feature)
    val ctx = recent.reverse.take(order).flatMap(indexOf.get).toArray
    val scored = (0 until nB).map { c =>
      var z = weights(bIdx(c))
      var p = 0
      while (p < ctx.length) { z += weights(wIdx(p, ctx(p), c)); p += 1 }
      (blocks(c), z)
    }
    scored.sortBy { case (b, z) => (-z, b) }.take(k).map(_._1)
  }
}
