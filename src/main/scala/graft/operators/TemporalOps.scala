package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, composed from shuffle +
  * per-key ordered windows — never a range cross-product.
  *
  * As-of join (every left row picks the LATEST right row with
  * right.time <= left.time per key — market-data/telemetry enrichment;
  * DuckDB ships it natively as ASOF JOIN, which is the oracle):
  * implemented by tagging both inputs, unioning, and taking a running
  * `last(right_payload, ignoreNulls)` over (key, time, side) order.
  * ONE shuffle on the key, sort within partitions, payloads carried as
  * structs — at 100 TB this is the canonical distributed as-of shape
  * (co-partition by key, merge by time); a per-key loop or an
  * inequality join (O(n·m) per key) would not survive.
  */
object TemporalOps {

  /** Left as-of join: all of `left`'s rows, plus `right`'s columns
    * (prefixed `asof_`) from the latest right row with
    * `right.time <= left.time` for the same `key`; nulls when no such
    * row. Right rows at exactly left.time match (ASOF `>=` semantics).
    * Ties on right time break toward the largest `tieBreak` column
    * when given (the data's ingest id), else arbitrary-but-stable. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      tieBreak: Option[String] = None): DataFrame = {
    val rCols = right.columns.toSeq
    val lStruct = struct(left.columns.map(left.col).toIndexedSeq: _*)
    val rStruct = struct(rCols.map(right.col).toIndexedSeq: _*)
    val lPart = left.select(
      col(key).as("_k"), col(time).as("_t"), lit(1).as("_side"),
      lit(null).cast("long").as("_ord"),
      lStruct.as("_lrow"),
      lit(null).cast(right.select(rStruct).schema.head.dataType).as("_rrow"))
    val rPart = right.select(
      col(key).as("_k"), col(time).as("_t"), lit(0).as("_side"),
      tieBreak.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("_ord"),
      lit(null).cast(left.select(lStruct).schema.head.dataType).as("_lrow"),
      rStruct.as("_rrow"))
    // right rows sort BEFORE left rows at equal time -> included in
    // the running last(); among equal-time right rows the largest
    // tieBreak sorts last and wins
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"), col("_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lPart.unionAll(rPart)
      .withColumn("_match", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val leftOut = left.columns.toSeq.map(c => col("_lrow").getField(c).as(c))
    val rightOut = rCols.map(c => col("_match").getField(c).as(s"asof_$c"))
    matched.select(leftOut ++ rightOut: _*)
  }

  /** Sliding-lookback range join, self-join flavor: for each left
    * event, aggregate right events of the same key with time in
    * `[left.time - lookback, left.time)` — "errors in the last N
    * minutes before each click" analytics. Implemented per key with
    * ONE ordered window (range frame on the numeric time), not an
    * inequality join: Spark turns `r.t BETWEEN l.t - x AND l.t` into
    * a per-key O(n·m) broadcast-nested-loop, which dies at scale; the
    * range-frame window is a single shuffle + sort. `agg` receives the
    * right value column name; returns left rows + `lookback_count` +
    * `lookback_sum`. */
  def lookbackStats(events: DataFrame, key: String, timeUs: Column,
      isLeft: Column, isRight: Column, valueCol: Column,
      lookbackUs: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(timeUs.cast("long"))
      .rangeBetween(-lookbackUs, -1) // strictly-before window
    // _re marks right EVENTS (value-independent) so a right row with a
    // NULL value column still counts toward lookback_count — the oracle
    // counts matching right rows (COUNT(c.t)), not non-null values.
    events
      .withColumn("_re", when(isRight, lit(1)))
      .withColumn("_rv", when(isRight, valueCol))
      .withColumn("lookback_count", count(col("_re")).over(w))
      .withColumn("lookback_sum", sum(col("_rv")).over(w))
      .filter(isLeft)
      .drop("_re", "_rv")
  }

  /** Key-LESS interval join via bin decomposition (SURVEY.md §2 q42):
    * per left row, count/sum right rows with
    * `r.t ∈ [l.t - windowUs, l.t)` when the sides share NO equi key —
    * [[lookbackStats]]'s keyed window does not apply, and Spark plans
    * a raw inequality-only join as BroadcastNestedLoopJoin: O(n·m),
    * dead at scale. Both sides instead quantize time into bins of
    * exactly `windowUs`: a right row lives in bin `t DIV w`; a left
    * row's window spans exactly the two bins {t DIV w − 1, t DIV w},
    * so exploding the LEFT side ×2 and equi-joining on the bin turns
    * the interval predicate into an ordinary hash join plus a residual
    * range filter — the standard range-join decomposition (Databricks
    * ships it as a hint; open-source Spark has no native form). Each
    * right row's bin matches at most one of a left row's two distinct
    * exploded bins, so no post-join dedup is needed. The shuffle is
    * keyed by time bin: time-clustered corpora skew hot bins, which
    * AQE skew-join splitting (on in [[graft.engine.GraftSession]])
    * re-partitions at runtime. Integer `DIV` keeps binning exact —
    * double division rounds near bin edges at epoch-µs magnitudes. */
  def intervalBinStats(left: DataFrame, idCols: Seq[String],
      leftTimeUs: Column, right: DataFrame, rightTimeUs: Column,
      valueCol: Column, windowUs: Long): DataFrame = {
    require(windowUs > 0)
    // internal working columns would silently shadow same-named caller
    // columns via withColumn (the right side is insulated by its
    // select; the left is not)
    val reserved = Set("_t", "_bin", "_rt", "_rv")
    require(!left.columns.exists(reserved), s"left input may not use " +
      s"reserved columns ${reserved.mkString(", ")}")
    val lb = left.withColumn("_t", leftTimeUs.cast("long"))
      .withColumn("_bin",
        explode(array(expr(s"_t DIV $windowUs - 1"), expr(s"_t DIV $windowUs"))))
    val rb = right.select(rightTimeUs.cast("long").as("_rt"), valueCol.as("_rv"))
      .withColumn("_bin", expr(s"_rt DIV $windowUs"))
    lb.join(rb,
        lb("_bin") === rb("_bin") &&
          col("_rt") >= col("_t") - windowUs && col("_rt") < col("_t"),
        "left")
      .groupBy(idCols.map(col): _*)
      .agg(count(col("_rt")).as("range_count"), sum(col("_rv")).as("range_sum"))
  }
}
