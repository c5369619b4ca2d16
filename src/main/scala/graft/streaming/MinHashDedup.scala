package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions._

/** STREAMING near-duplicate detection — the streaming twin of
  * [[graft.operators.DedupOps.incrementalPairs]] (SURVEY.md §2c
  * dd_incremental), closing the one LLM-pipeline family that had no
  * streaming counterpart (st_dedup is exact-key only).
  *
  * Same architecture as the incremental batch path, with the persisted
  * signature store living as GROUPED STATE instead of a parquet table:
  * each arriving document MinHash-signs scan-locally (one row per LSH
  * band key, the signature riding the band row — no doc_id join back
  * anywhere), and `flatMapGroupsWithState` keyed by BAND KEY compares
  * the batch's rows against the band's accumulated signatures,
  * emitting every pair whose signature estimate (agreeing components /
  * numPerms — the dd_minhash_est-measured verification contract)
  * clears `tau`. State per band key = the signatures of the docs that
  * hashed into it — summed over keys this IS dd_incremental's
  * signature store (numPerms longs per doc per band), sharded by the
  * same key the batch path's broadcast join probes.
  *
  * Determinism: within a micro-batch a band's rows fold in doc_id
  * order, so pairs are independent of arrival interleaving; a pair
  * colliding in several bands is emitted once per colliding band —
  * consumers take DISTINCT (doc_a, doc_b), exactly like the batch
  * path's post-join distinct (kept out of this operator so the output
  * stays Append-mode composable).
  *
  * Scale: state grows O(corpus signatures) — the same asymptote as the
  * batch store (that store IS the state; a corpus that can persist one
  * can hold the other). A retention policy (drop signatures older than
  * the dedup horizon) maps to a state TTL: pass `horizon` to
  * [[pairsStream]] and each band keeps only signatures whose event
  * time is within `horizon` of the newest event the band has seen
  * (per-entry EVENT-time retention — replay-deterministic, see
  * [[pairsStream]]'s doc for why wall-clock timeouts were rejected);
  * a band whose window empties drops its state entirely. The default
  * (`horizon = None`) keeps everything — the reference store's
  * keep-everything contract, byte-identical to the pre-TTL behavior.
  */
object MinHashDedup {

  /** `ts` is the document's event time (epoch millis); only consulted
    * when a retention `horizon` is set — the keep-everything default
    * never reads it, so batch-built band rows leave it 0. */
  final case class BandRow(bkey: String, doc_id: Long, sig: Seq[Long], ts: Long = 0L)
  final case class DocSig(doc_id: Long, sig: Seq[Long], ts: Long = 0L)
  final case class BandState(entries: List[DocSig])
  final case class NearDupPair(doc_a: Long, doc_b: Long, est_jaccard: Double)

  /** Scan-local banding of a (batch or streaming) documents frame:
    * one row per (band key, doc), the signature riding along. Built
    * on [[graft.operators.DedupOps.signatureTable]] — the ONE
    * signature pipeline both twins share, so the streaming-converges-
    * to-batch guarantee can never be broken by the two paths drifting
    * (a second copy of the shingle/perm/band fold would have to be
    * kept bit-identical by hand).
    *
    * `tsCol`: name of an event-time column (epoch millis) to carry
    * into `ts` for retention-horizon streams; None leaves ts = 0 (the
    * keep-everything default never reads it). */
  def bandRows(docs: DataFrame, numPerms: Int = 64,
      rowsPerBand: Int = 4, tsCol: Option[String] = None): Dataset[BandRow] = {
    implicit val enc = Encoders.product[BandRow]
    val sigs = graft.operators.DedupOps
      .signatureTable(docs, numPerms, rowsPerBand, carry = tsCol.toSeq)
    val ts = tsCol.map(c => col(c).cast("long")).getOrElse(lit(0L))
    sigs
      .select(explode(col("bands")).as("bkey"), col("doc_id"), col("sig"),
        ts.as("ts"))
      .as[BandRow]
  }

  /** Signature estimate — the exact double n/numPerms both engines and
    * the batch twin compute. */
  private def est(a: Seq[Long], b: Seq[Long]): Double =
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / a.length

  /** The stateful core, callable synchronously in tests: fold one
    * band's micro-batch into its state, returning (emitted pairs, new
    * state). New docs compare against the accumulated store AND the
    * earlier docs of their own batch (the batch path's inc×base ∪
    * inc×inc decomposition, in one fold).
    *
    * `horizon` (event-time millis): entries older than the band's max
    * seen event time minus the horizon are dropped BEFORE the batch
    * folds in — an expired signature neither pairs nor lingers in
    * state, so state size is bounded by the docs arriving within one
    * horizon window per band. None (default) = keep everything. */
  def advance(state: BandState, batch: Seq[BandRow], tau: Double,
      horizon: Option[Long] = None): (Seq[NearDupPair], BandState) = {
    val out = Seq.newBuilder[NearDupPair]
    // membership Set alongside the entries list: the idempotence probe
    // is O(1) per doc even on a hot band (the list itself stays — the
    // pair comparisons walk it anyway)
    var acc = state.entries
    horizon.foreach { h =>
      val maxTs = (state.entries.map(_.ts) ++ batch.map(_.ts))
        .foldLeft(Long.MinValue)(math.max)
      if (maxTs != Long.MinValue) acc = acc.filter(_.ts >= maxTs - h)
    }
    var seen = acc.iterator.map(_.doc_id).toSet
    batch.sortBy(_.doc_id).foreach { r =>
      if (!seen.contains(r.doc_id)) { // replay-idempotent
        acc.foreach { e =>
          val j = est(e.sig, r.sig)
          if (j >= tau)
            out += NearDupPair(math.min(e.doc_id, r.doc_id),
              math.max(e.doc_id, r.doc_id), j)
        }
        acc = DocSig(r.doc_id, r.sig, r.ts) :: acc
        seen += r.doc_id
      }
    }
    (out.result(), BandState(acc))
  }

  /** Streaming near-dup pair stream (Append mode): every arriving doc
    * is checked against everything that ever hashed into any of its
    * band buckets — or, with a retention `horizon` (event-time
    * millis), against everything within the dedup horizon: entries
    * older than `horizon` before the band's max seen event time are
    * dropped from state before each fold ([[advance]]), and a band
    * whose entries all expire removes its state outright.
    *
    * The TTL is EVENT-time deliberately, not a processing-time group
    * timeout: wall-clock timeouts fire by elapsed real time, so a
    * replay/backfill of historical data would mass-expire state that
    * is still within the data's own horizon — event-time retention is
    * replay-deterministic (same input stream → same pairs, regardless
    * of processing speed). The bound it gives: every band holds at
    * most one horizon-window of signatures — the dedup store becomes
    * a sliding window over event time instead of the keep-everything
    * default (`horizon = None`, byte-identical pre-TTL behavior). A
    * band that stops receiving data retains its final window until
    * next contact — the same per-band asymptote, cleared lazily. */
  def pairsStream(bands: Dataset[BandRow], tau: Double,
      horizon: Option[Long] = None): Dataset[NearDupPair] = {
    implicit val stateEnc = Encoders.product[BandState]
    implicit val outEnc = Encoders.product[NearDupPair]
    implicit val keyEnc = Encoders.STRING
    bands
      .groupByKey(_.bkey)
      .flatMapGroupsWithState[BandState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bkey: String, rows: Iterator[BandRow], state: GroupState[BandState]) =>
          val (pairs, next) = advance(
            state.getOption.getOrElse(BandState(Nil)), rows.toSeq, tau, horizon)
          if (next.entries.isEmpty) state.remove()
          else state.update(next)
          pairs.iterator
      }
  }

  /** Batch twin: estimate-verified near-dup pairs over a whole corpus
    * — [[graft.operators.DedupOps.minhashEstPairs]] without the
    * exact-Jaccard column (the at-scale form: only signatures reach
    * pairs, never shingle sets), thresholded at `tau`. The streaming
    * fold over any batch split of the corpus converges to exactly this
    * set (per-doc signature independence — the dd_incremental
    * property), pinned in StreamingSpec. */
  def pairsBatch(docs: DataFrame, numPerms: Int = 64, rowsPerBand: Int = 4,
      tau: Double = 0.5): DataFrame = {
    val prepped = graft.operators.DedupOps
      .signatureTable(docs, numPerms, rowsPerBand).persist()
    val matches = aggregate(
      zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    graft.operators.DedupOps.bucketPairs(prepped, "bands")
      .join(prepped.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(prepped.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (matches.cast("double") / numPerms).as("est_jaccard"))
      .filter(col("est_jaccard") >= tau)
  }
}
