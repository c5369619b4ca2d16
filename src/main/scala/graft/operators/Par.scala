package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-ADAPTIVE repartition width for CPU-heavy per-row stages
  * (optimization guide §2: "make partitioning scale-adaptive — derive
  * from input size — rather than a constant tuned for either local
  * mode or the cluster").
  *
  * The operator layer used a fixed `repartition(defaultParallelism)`
  * before every shingling / embedding / decode stage so per-row CPU
  * work spreads over every core regardless of scan file count. Right
  * at scale; at bench scale it pinned EVERY downstream stage of the
  * persisted frame to 32 near-empty partitions (a cached plan's
  * partitioning is frozen — AQE does not re-coalesce it), and the ANN
  * family spent its wall-clock on ~1000 sub-100-row tasks per query
  * (measured: ann_recall 39 jobs / 975 tasks / 80+ CPU-seconds of
  * per-task overhead for 2 000 input rows).
  *
  * `adaptive` sizes the width from the plan's size estimate (driver
  * stats only — no job): one partition per `targetBytes` of input,
  * clamped to [1, defaultParallelism]. At cluster scale the byte count
  * dwarfs the core count and the clamp reproduces the old behavior
  * exactly; below it the task count tracks the data. Operators whose
  * per-row cost is far above scan cost (media decode) pass a smaller
  * `targetBytes` so enough partitions survive to keep cores busy. */
object Par {

  /** Default bytes of input per partition for per-row-cheap stages
    * (shingling, hashing, vector math: µs/row). */
  val DefaultTargetBytes: Long = 1L << 20

  def adaptive(df: DataFrame, targetBytes: Long = DefaultTargetBytes): Int = {
    // Audit hook: plan-shape specs pin the AT-SCALE shapes (exchange
    // counts, single-partition bans) that a toy-scale adaptive width of
    // 1 would legitimately collapse; they force the pre-adaptive width
    // here instead of weakening their assertions.
    val forced = df.sparkSession.conf.getOption("spark.graft.par.fixedWidth")
    if (forced.exists(_.nonEmpty)) return forced.get.toInt
    val p = df.sparkSession.sparkContext.defaultParallelism
    val bytes =
      try df.queryExecution.analyzed.stats.sizeInBytes
      catch { case scala.util.control.NonFatal(_) => BigInt(Long.MaxValue) }
    val want = (bytes + targetBytes - 1) / targetBytes
    want.min(p).max(1).toInt
  }

  /** df.repartition sized by [[adaptive]]. */
  def repart(df: DataFrame, targetBytes: Long = DefaultTargetBytes): DataFrame =
    df.repartition(adaptive(df, targetBytes))
}
