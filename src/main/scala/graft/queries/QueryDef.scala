package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One verifiable capability: a Spark query plus (optionally) the ANSI
  * SQL a DuckDB oracle runs on the same parquet tables. Column names of
  * the Spark result and the oracle result must match exactly — the
  * driver hash-compares values after sorting columns by name.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}

/** Determinism helpers shared by queries and their oracle SQL.
  *
  * Floating-point SUMs are order-dependent, and Spark and DuckDB reduce
  * in different orders — so any double SUM that feeds a hash-compare is
  * routed through exact DECIMAL arithmetic: cast each addend to a fixed
  * scale (deterministic: rounding boundaries of binary doubles never
  * land exactly on odd multiples of 10^-s), sum exactly, then cast the
  * exact total back to double. AVG = exact decimal SUM / COUNT in
  * double. MIN/MAX/COUNT are order-independent and stay native.
  */
object Det {
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact sum of a 2-decimal quantity, returned as double. */
  def dsum2(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact sum of a 4-decimal expression (e.g. price*(1-disc)). */
  def dsum4(c: Column): Column = sum(dec4(c)).cast(DoubleType)

  /** Deterministic mean: exact decimal sum over non-null count. */
  def davg2(c: Column): Column = sum(dec2(c)).cast(DoubleType) / count(c)

  // SQL spellings of the same (for oracle strings).
  def sqlSum2(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlSum4(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlAvg2(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE) / COUNT($e)"

  // ---- LONG-BUFFER exact-decimal sums -------------------------------
  // The decimal sums above are exact but carry a DECIMAL(28,s) agg
  // buffer — precision > 18, so every buffer update serializes a
  // BigInteger into the UnsafeRow instead of doing a primitive add.
  // These variants quantize each row to the SAME DECIMAL(18,s) value
  // (bit-identical HALF_UP rounding — the per-row cast is unchanged),
  // then aggregate the decimal's UNSCALED long in TWO primitive long
  // sums, split at 10^6 so neither can overflow at petabyte row
  // counts:
  //   lo-sum bound: rows x 10^6      < 2^63  -> safe below ~9.2e12 rows
  //                                            (100 TB lineitem ~ 6e11)
  //   hi-sum bound: |sum(c)| x 10^s/10^6 < 2^63 -> |sum| < 9.2e20 (s=4)
  // The exact total is reassembled in decimal on the FINAL (group-count
  // sized) aggregate and cast to double — the same correctly-rounded
  // value the decimal path produces, so oracle hash-compares are
  // unaffected (proven query-for-query by the sf0.01/sf0.1 gates).
  private val SPLIT = 1000000L

  private def unscaled(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.UnscaledValue(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  private def dsumL(c: Column, scale: Int): Column = {
    val u = unscaled(c.cast(DecimalType(18, scale)))
    val hi = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(u),
        org.apache.spark.sql.catalyst.expressions.Literal(SPLIT)))
    val lo = u % lit(SPLIT)
    // Java division semantics: hi*SPLIT + lo == u for either sign
    ((sum(hi).cast(DecimalType(38, 0)) * lit(SPLIT) +
      sum(lo).cast(DecimalType(38, 0))) /
      lit(math.pow(10, scale).toLong)).cast(DoubleType)
  }

  /** [[dsum2]] on long buffers — identical values, primitive agg. */
  def dsum2L(c: Column): Column = dsumL(c, 2)

  /** [[dsum4]] on long buffers — identical values, primitive agg. */
  def dsum4L(c: Column): Column = dsumL(c, 4)

  /** [[davg2]] on long buffers — identical values, primitive agg. */
  def davg2L(c: Column): Column = dsumL(c, 2) / count(c)
}
