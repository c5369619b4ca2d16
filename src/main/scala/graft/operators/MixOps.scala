package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted-mixture training-order construction
  * (SURVEY.md §2c pipe_mix) — stride scheduling: source `s` with
  * weight `w_s` occupies virtual times (2r−1)·(P/w_s) for its r-th
  * document (P = lcm of the weights, so every key is an exact
  * integer), and the global training order is the ascending key
  * order. A prefix of the order then carries each source in
  * proportion to its weight — the standard curriculum/mixture
  * scheduler, made exactly reproducible.
  *
  * The scale trick: the global POSITION of each document is computed
  * in CLOSED FORM, not by sorting. For a document with key K, its
  * position is its own source rank plus, per other source s′ (with
  * stride Q′ = P/w_s′ and n_s′ docs), the count of that source's keys
  * strictly below K — `clamp(⌈(K+Q′)/2Q′⌉−1, 0, n_s′)` — plus a tie
  * correction for sources ordering before it by name. Everything
  * after the per-source rank is scan-local integer arithmetic against
  * per-source totals (bounded by #sources, shipped as literals):
  * NO global sort, NO single-partition window — the two things a
  * 100 TB training-order emitter cannot afford. The DuckDB oracle
  * computes the position the opposite way (row_number over an actual
  * global sort), so the hash match cross-validates the closed form
  * against a real sort on every run.
  *
  * Per-source ranks use the two-level distributed-ranking pattern:
  * FNV-shuffled docs land in `shards` hash shards, rank within
  * (source, shard) is an ordinary parallel window, and shard base
  * offsets (a #sources×shards count table — metadata-sized) ship back
  * as a literal map, making the per-source rank exact without a
  * per-source global window (single reducer per source otherwise).
  */
object MixOps {

  /** `docs(doc_id, source, …)` → (doc_id, source, src_rank,
    * global_pos): the deterministic interleaved training order.
    * `weightOf` maps a source name to its mixture weight (≥1);
    * `seed` re-deals the within-source shuffle order. */
  def strideMix(docs: DataFrame, weightOf: String => Int,
      shards: Int = 64, seed: String = "mix42"): DataFrame = {
    val spark = docs.sparkSession

    val keyed = graft.operators.Par.repart(docs)
      .select(col("doc_id"), col("source"),
        graft.functions.TextExpressions.fnv64(
          concat(lit(s"$seed:"), col("doc_id").cast("string"))).as("k"))
      .withColumn("shard", pmod(col("k"), lit(shards)).cast("int"))

    // per-(source, shard) counts: one tiny aggregation, collected at
    // #sources × shards rows (metadata-bounded, like ta_domain_mix's
    // per-source stats)
    val counts = keyed.groupBy("source", "shard").count()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val sources = counts.map(_._1).distinct.sorted
    val nOf: Map[String, Long] =
      counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val offsetOf: Map[String, Map[Int, Long]] = counts.groupBy(_._1).map {
      case (s, rows) =>
        val byShard = rows.sortBy(_._2)
        val offs = byShard.scanLeft(0L)(_ + _._3).dropRight(1)
        s -> byShard.map(_._2).zip(offs).toMap
    }
    val wOf: Map[String, Int] = sources.map(s => s -> weightOf(s)).toMap
    require(wOf.values.forall(_ >= 1), "weights must be >= 1")
    val bigP = wOf.values.toSeq.distinct
      .foldLeft(BigInt(1))((a, w) => a * w / a.gcd(BigInt(w)))
    require(bigP.isValidLong && bigP.toLong <= (1L << 20),
      s"weight lcm too large: $bigP")
    val p = bigP.toLong

    // rank within source = shard base offset (literal map) + position
    // within the (source, shard) window — exact, and every window
    // partition is one hash shard of one source, never a whole source
    val offLit = typedLit(offsetOf.flatMap { case (s, m) =>
      m.map { case (sh, off) => s"$s:$sh" -> off }
    })
    val ranked = keyed
      .withColumn("pos_in_shard", row_number()
        .over(Window.partitionBy("source", "shard").orderBy("k", "doc_id"))
        .cast("long"))
      .withColumn("src_rank",
        element_at(offLit, concat_ws(":", col("source"), col("shard")))
          + col("pos_in_shard"))
      .withColumn("q", element_at(
        typedLit(wOf.map { case (s, w) => s -> p / w }), col("source")))
      .withColumn("kk", (col("src_rank") * 2 - 1) * col("q"))

    // closed-form global position: src_rank + per-other-source counts
    // below kk (+ name-order tie correction) — pure integer arithmetic
    val terms: Seq[Column] = sources.map { s2 =>
      val q2 = p / wOf(s2)
      val n2 = nOf(s2)
      val below = expr(
        s"greatest(0L, least(${n2}L, (kk + ${3 * q2 - 1}) DIV ${2 * q2} - 1))")
      // the source NAME only ever rides as a Column literal — never
      // spliced into SQL text (names are data; quotes must be inert)
      val tie = when(lit(s2) < col("source") &&
          expr(s"kk % $q2 = 0 AND (kk DIV $q2) % 2 = 1" +
            s" AND (kk DIV $q2 + 1) DIV 2 <= ${n2}L"),
        lit(1L)).otherwise(lit(0L))
      when(col("source") === lit(s2), lit(0L)).otherwise(below + tie)
    }
    ranked
      .withColumn("global_pos", terms.foldLeft(col("src_rank"))(_ + _))
      .select(col("doc_id"), col("source"), col("src_rank"), col("global_pos"))
  }
}
