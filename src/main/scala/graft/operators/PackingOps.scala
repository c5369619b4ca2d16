package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Sequence packing — the pipeline step between a filtered corpus and
  * an LLM training run: concatenate documents into fixed-budget
  * context windows ("bins") so no training step pays padding for short
  * docs (Raffel et al. '20 pack-and-trim; Krell et al. '21 studies the
  * bin-packing variants).
  *
  * Algorithm: deterministic NEXT-FIT within hash shards. Docs are
  * assigned to `shards` deterministic shards (doc_id mod shards), and
  * within a shard are packed in doc_id order: a doc joins the current
  * bin when it fits the token budget, else opens the next bin (an
  * over-budget doc overflows a bin of its own — truncation is the
  * trainer's call, not the packer's).
  *
  * Scale shape: packing is intrinsically sequential WITHIN a window
  * stream, so the parallel unit must be the shard — one shuffle on the
  * shard key, a per-partition ordered scan, no driver state, no
  * global sort. At 100 TB you size `shards` to the cluster (thousands),
  * keeping each shard's sequential scan bounded; determinism holds
  * under any partitioning because shard assignment and in-shard order
  * are data-derived (doc_id), never partition-derived. mapPartitions
  * is the honest primitive here: the running (bin, fill) state is a
  * fold no Catalyst window frame expresses (the reset is
  * value-dependent), matching the brief's "genuine per-partition
  * imperative logic" carve-out.
  */
object PackingOps {

  /** Pack `docs` (doc_id + text) into token-budgeted bins. Token count
    * = whitespace tokens (swap in any per-doc count upstream). Returns
    * (doc_id, shard, bin_id, n_tokens); bin ids start at 1 per shard. */
  def packSequences(docs: DataFrame, budget: Int, shards: Int): DataFrame = {
    require(budget >= 1 && shards >= 1, "budget and shards must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      // all rows of a shard land in one partition, in doc_id order;
      // a partition may hold several shards — the scan resets per shard
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (id, sh, t) =>
          if (sh != curShard) { curShard = sh; bin = 1L; fill = t }
          else if (fill + t <= budget) { fill += t }
          else { bin += 1L; fill = t }
          (id, sh, bin, t)
        }
      }
      .toDF("doc_id", "shard", "bin_id", "n_tokens")
  }
}
