package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

/** The predicate algebra the reference's pruner understands
  * (reference: query_enginev5.py:107-233): AND, OR, BETWEEN, IN and the
  * six comparisons, with column-vs-constant operands. Values are either
  * numeric (ints/doubles/timestamp epochs) or strings.
  */
sealed trait Pred {
  /** Render as a Spark Column for actual row-level filtering.
    *
    * Literal typing (round 17): `PredValue.num` is stored as Double,
    * but `intcol = lit(3.0)` analyzes to `cast(intcol as double) =
    * 3.0` — the cast sits ON THE COLUMN, so the parquet scan gets
    * `PushedFilters: [IsNotNull]` only and row-group/page skipping is
    * lost (measured: the dict_ab auto arm re-read every kept page per
    * rep). An exactly-integral double renders as a LONG literal
    * instead: Spark compares `intcol = 3L` by widening the LITERAL
    * (UnwrapCastInBinaryComparison), the predicate pushes down, and
    * the comparison result is identical for every op — an integral
    * double and its long compare equal against any numeric column. */
  def toColumn: Column = this match {
    case And(l, r)          => l.toColumn && r.toColumn
    case Or(l, r)           => l.toColumn || r.toColumn
    case Between(c, lo, hi) => col(c).between(lit(lo.litValue), lit(hi.litValue))
    case In(c, vs)          => col(c).isin(vs.map(_.litValue): _*)
    case Cmp("=", c, v)     => col(c) === lit(v.litValue)
    case Cmp("!=", c, v)    => col(c) =!= lit(v.litValue)
    case Cmp("<", c, v)     => col(c) < lit(v.litValue)
    case Cmp("<=", c, v)    => col(c) <= lit(v.litValue)
    case Cmp(">", c, v)     => col(c) > lit(v.litValue)
    case Cmp(">=", c, v)    => col(c) >= lit(v.litValue)
    case Cmp(op, _, _)      => throw new IllegalArgumentException(s"op $op")
    case NullCheck(c, false) => col(c).isNull
    case NullCheck(c, true)  => col(c).isNotNull
  }
}
final case class And(l: Pred, r: Pred) extends Pred
final case class Or(l: Pred, r: Pred) extends Pred
final case class Between(column: String, lo: PredValue, hi: PredValue) extends Pred
final case class In(column: String, values: Seq[PredValue]) extends Pred
/** op ∈ {=, !=, <, <=, >, >=} */
final case class Cmp(op: String, column: String, v: PredValue) extends Pred
/** IS NULL (negated=false) / IS NOT NULL (negated=true) — pruned from
  * the footer NULL COUNTS, which min/max alone can't see: a block with
  * nullCount=0 refutes IS NULL; one with nullCount=rows refutes
  * IS NOT NULL (round 7; beyond the reference's min/max-only algebra). */
final case class NullCheck(column: String, negated: Boolean) extends Pred

/** A literal in a predicate.
  *
  * `num`/`str` are the views the zone-map pruner compares against
  * footer min/max. Timestamp literals carry both: `num` = epoch
  * *microseconds* (the physical INT64 in Spark-written parquet footers)
  * for stats pruning, and `tsStr` ("yyyy-MM-dd HH:mm:ss") which
  * `toColumn` renders so the row-level filter type-checks against
  * TIMESTAMP/TIMESTAMP_NTZ columns.
  */
final case class PredValue(num: Option[Double], str: Option[String],
    tsStr: Option[String] = None) {
  def value: Any = tsStr.orElse(num).orElse(str).orNull
  /** [[value]] with exactly-integral doubles narrowed to Long so the
    * rendered literal pushes down to parquet (see [[Pred.toColumn]]).
    * 2^53 bounds the doubles whose long conversion is exact. */
  def litValue: Any = value match {
    case d: Double if tsStr.isEmpty && d == math.rint(d) &&
        math.abs(d) <= 9007199254740992.0 => d.toLong
    case other => other
  }
}
object PredValue {
  def apply(d: Double): PredValue = PredValue(Some(d), None)
  def apply(l: Long): PredValue = PredValue(Some(l.toDouble), None)
  def apply(s: String): PredValue = PredValue(None, Some(s))
  /** Timestamp literal from "yyyy-MM-dd[ HH:mm:ss]" (UTC). */
  def ts(s: String): PredValue = {
    val full = if (s.length == 10) s + " 00:00:00" else s
    val micros = java.time.LocalDateTime
      .parse(full.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    PredValue(Some(micros.toDouble), None, Some(full))
  }
}
