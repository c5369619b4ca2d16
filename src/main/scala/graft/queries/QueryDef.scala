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
}
