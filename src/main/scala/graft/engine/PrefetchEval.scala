package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Prediction-quality evaluation: replay an access sequence, ask the
  * model for top-K at each step, score against the block actually
  * accessed next — precision@k / recall@k / hit-rate, the metrics of
  * the reference's validate_predictions.py / evaluate_model.py.
  */
object PrefetchEval {

  final case class StepEval(step: Int, actual: Int, predicted: Seq[Int], hit: Boolean)

  def replay(model: Prefetcher, sequence: Seq[Int], k: Int,
      historyLen: Int = 8): Seq[StepEval] = {
    (1 until sequence.size).map { i =>
      val history = sequence.slice(math.max(0, i - historyLen), i)
      val predicted = model.suggest(history, k)
      StepEval(i, sequence(i), predicted, predicted.contains(sequence(i)))
    }
  }

  /** Mean reciprocal rank over the replay: 1/rank of the actually
    * accessed block within the (ranked) prediction list, 0 when absent
    * — the reference's second quality metric alongside top-k hit rate
    * (evaluate_model.py:36-55). */
  def mrr(evals: Seq[StepEval]): Double =
    if (evals.isEmpty) 0.0
    else evals.map { e =>
      val idx = e.predicted.indexOf(e.actual)
      if (idx < 0) 0.0 else 1.0 / (idx + 1)
    }.sum / evals.size

  /** Summary metrics as a 1-row DataFrame (hit_rate = recall@k when
    * each step has exactly one relevant block). */
  def summarize(spark: SparkSession, evals: Seq[StepEval], k: Int): DataFrame = {
    import spark.implicits._
    val n = evals.size.toLong
    val hits = evals.count(_.hit).toLong
    val predMade = evals.count(_.predicted.nonEmpty).toLong
    Seq((k, n, hits, predMade,
      if (n == 0) 0.0 else hits.toDouble / n,
      if (predMade == 0) 0.0 else hits.toDouble / predMade,
      mrr(evals)))
      .toDF("k", "steps", "hits", "steps_with_prediction", "hit_rate",
        "precision_when_predicted", "mrr")
  }
}
