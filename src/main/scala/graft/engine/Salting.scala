package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join/aggregation keys.
  *
  * A single pathological key (one customer with 10⁹ rows, one dedup
  * bucket holding half the corpus) serializes its whole partition onto
  * one task. Salting splits each hot key into `factor` sub-keys on the
  * big side and replicates the small side across the sub-keys, so the
  * skewed work spreads over `factor` tasks. AQE's skew-join handles
  * sort-merge cases adaptively; explicit salting remains the tool for
  * aggregations and for joins AQE can't split (e.g. bucketed inputs).
  */
object Salting {

  /** Add a deterministic salt column in [0, factor) derived from a
    * uniqueness column (NOT rand() — retries/speculative tasks must
    * salt identically). */
  def salt(df: DataFrame, uniqueCol: String, factor: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(uniqueCol)), lit(factor)).cast("int"))

  /** Replicate the small side once per salt value (explode) so a join
    * on (key, _salt) sees every (key, salt) combination. */
  def replicate(small: DataFrame, factor: Int): DataFrame =
    small.withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("_salt", col("_salt").cast("int"))

  /** Skew-safe inner equi-join: salt the big side, replicate the small
    * side, join on (key, _salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      uniqueCol: String, factor: Int): DataFrame =
    salt(big, uniqueCol, factor)
      .join(replicate(small, factor), Seq(key, "_salt"))
      .drop("_salt")

  /** Skew-safe candidate-pair generation for a bucketed SELF-join
    * (`id_a < id_b` within each key's bucket): the left occurrence of
    * each row is salted by its id, the right occurrence replicated
    * across all `factor` salts, and the join runs on (key, salt) — so
    * pair (a, b) meets exactly once (at a's salt) and a bucket of size
    * H spreads over `factor` tasks at O(H²/factor) work each, instead
    * of one task paying the whole O(H²). */
  def saltedSelfPairs(exploded: DataFrame, idCol: String, keyCol: String,
      factor: Int): DataFrame = {
    val l = salt(exploded, idCol, factor).as("l")
    val r = replicate(exploded, factor).as("r")
    l.join(r,
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          col("l._salt") === col("r._salt") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as(s"${idCol}_a"), col(s"r.$idCol").as(s"${idCol}_b"))
  }

  /** Skew-safe aggregation: two-phase — aggregate per (key, salt),
    * then merge per key. `partials` maps each aggregation to its
    * partial and final forms, e.g. count → (count, sum). */
  def twoPhaseCount(df: DataFrame, key: String, uniqueCol: String,
      factor: Int): DataFrame =
    salt(df, uniqueCol, factor)
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").cast("long").as("n"))
}
