package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Salting
import graft.functions.TextExpressions.{bloom_positions, simhash64}
import graft.functions.TextFunctions._

/** DataFrame-level deduplication operators (SURVEY.md §2c) — the
  * library surface behind the dd32-dd36 queries. Inputs are plain
  * DataFrames with a `doc_id`/`text` (or `vec_id`/`embedding`)
  * contract; outputs are pair or group tables the caller orders and
  * thresholds.
  *
  * All pair operators share the scale shape: per-row signature
  * (narrow, codegen) → candidate generation via bucket join (shuffle
  * on a sparse key — never an O(n²) cross join) → exact verification
  * only within candidate pairs.
  */
object DedupOps {

  /** doc_id + distinct hashed word-3-shingle set. CPU-heavy per-row
    * stage — repartitioned so small inputs still use every core (at
    * corpus scale the scan already has enough splits and AQE coalesces
    * the no-op exchange). */
  def docShingles(docs: DataFrame, carry: Seq[String] = Nil): DataFrame =
    Par.repart(docs)
      .select(col("doc_id") +: carry.map(col) :+
        array_distinct(shingleHashes(tokens(col("text")), 3)).as("sh"): _*)

  /** Candidate pairs via any shared key in `keysCol` (exploded bucket
    * join). `a < b` canonicalization + distinct dedups multi-bucket
    * collisions.
    *
    * Skew-safe: a pathological band (boilerplate docs, near-dup-heavy
    * shards) can put a large fraction of the corpus behind ONE bucket
    * key, concentrating O(hot²) pair generation on one task. Buckets
    * larger than `hotCap` are split off (their keys are few by
    * construction, so the hot-key set broadcasts) and pair-generated
    * through a salted self-join ([[graft.engine.Salting.saltedSelfPairs]])
    * that spreads each hot bucket over `saltFactor` tasks; everything
    * else joins plainly — the ×saltFactor replication is only ever paid
    * for hot rows, and only on (id, key) pairs, never payloads. The
    * result set is identical either way (each pair still meets exactly
    * once per shared key before the distinct). */
  def bucketPairs(docs: DataFrame, keysCol: String,
      hotCap: Int = 4096, saltFactor: Int = 16): DataFrame = {
    val exploded = docs.select(col("doc_id"), explode(col(keysCol)).as("bkey"))
    // Eager hot-key probe: ONE count aggregation, collecting only keys
    // above the cap (bounded by corpus/hotCap — a handful by
    // construction). The common no-skew case then short-circuits to
    // the plain self-join with zero extra plan weight; tag-join-based
    // splitting (anti+semi against the aggregate) re-derived the
    // exploded frame three times and measurably doubled the dedup
    // queries' wall-time.
    val hotKeys = exploded.groupBy("bkey").agg(count(lit(1)).as("_n"))
      .filter(col("_n") > hotCap).select("bkey")
      .collect().map(_.get(0)).toSeq
    val selfPairs = (part: DataFrame) => {
      val l = part.as("l")
      val r = part.as("r")
      l.join(r, col("l.bkey") === col("r.bkey") && col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
    }
    if (hotKeys.isEmpty) selfPairs(exploded).distinct()
    else {
      val cold = exploded.filter(!col("bkey").isin(hotKeys: _*))
      val hot = exploded.filter(col("bkey").isin(hotKeys: _*))
      selfPairs(cold)
        .unionAll(Salting.saltedSelfPairs(hot, "doc_id", "bkey", saltFactor))
        .distinct()
    }
  }

  /** Benchmark decontamination (the n-gram-overlap rule every serious
    * training corpus applies — GPT-3 appendix C / PaLM §7 shape): flag
    * every training document sharing at least one word k-shingle with
    * the evaluation set. `isEval` marks the eval rows inside `docs`.
    *
    * Scale shape: the eval set is tiny by construction (benchmarks are
    * MBs against a 100 TB corpus), so its distinct shingle hashes
    * BROADCAST — the train side is scanned once, shingled, and
    * hash-joined with no shuffle; only the per-doc aggregation keyed
    * by contaminated doc_id (bounded by the contamination, not the
    * corpus) shuffles. 64-bit FNV shingle hashes stand in for the
    * shingles themselves (collision odds ~n²/2⁶⁵ — the dd35 contract).
    *
    * Returns (doc_id, n_shared_shingles, n_eval_docs) for contaminated
    * TRAIN docs only. */
  /** URL canonicalization for URL-keyed dedup — the normalization
    * every web-corpus pipeline applies before grouping by URL (crawls
    * see the same page as http/https, with/without www, with tracking
    * params, trailing slashes, fragments). Pure column expressions
    * (codegen, scan-local — the only shuffle is the caller's groupBy):
    * scheme stripped, www. stripped, HOST lowercased (path case is
    * significant and preserved), default :80/:443 port dropped,
    * #fragment and trailing ?utm_* tracking params cut, trailing slash
    * trimmed. Patterns are anchored so Java regex and RE2 replace
    * identically. */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val s = regexp_replace(regexp_replace(url, "^https?://", ""), "^www\\.", "")
    val p = instr(s, "/")
    val host = when(p > 0, s.substr(lit(1), p - 1)).otherwise(s)
    val path = when(p > 0, s.substr(p, length(s))).otherwise(lit(""))
    concat(
      regexp_replace(lower(host), ":(80|443)$", ""),
      regexp_replace(
        regexp_replace(regexp_replace(path, "#.*$", ""), "\\?utm[^#]*$", ""),
        "/$", ""))
  }

  def decontaminate(docs: DataFrame,
      isEval: org.apache.spark.sql.Column, k: Int = 5): DataFrame = {
    // shingling is the CPU stage — spread it over every core even when
    // the input is a few fat parquet partitions (same rationale as
    // docShingles; at corpus scale the scan already has enough splits)
    val sh = Par.repart(docs)
      .select(col("doc_id"), isEval.as("is_eval"),
        array_distinct(shingleHashes(tokens(col("text")), k)).as("sh"))
    val evalSh = sh.filter(col("is_eval"))
      .select(explode(col("sh")).as("shingle"), col("doc_id").as("eval_doc"))
    val trainSh = sh.filter(!col("is_eval"))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    trainSh.join(broadcast(evalSh), "shingle")
      .groupBy("doc_id")
      .agg(countDistinct("shingle").as("n_shared_shingles"),
        countDistinct("eval_doc").as("n_eval_docs"))
  }

  /** Bloom-filter decontamination pre-filter (SURVEY.md §2c dd97) —
    * the at-scale front half of [[decontaminate]]: instead of
    * broadcasting EVERY eval-set shingle hash to every task (an eval
    * suite can carry millions of shingles), the eval side folds into a
    * fixed `mBits`-bit Bloom bitmap (ONE distributed bit_or
    * aggregation, collected at mBits/64 longs — 16 KB at the default
    * 2^17), and the 100 TB train side probes it as a pure scan-local
    * codegen'd expression: no join, no shuffle, no broadcast table.
    * Bloom-positive shingles (true hits + false positives at rate
    * ≈ (1-e^{-kn/m})^k) then pass to the exact verification join
    * against the true eval hash set, which now sees only the surviving
    * sliver. Returns per-train-doc (n_candidate_shingles,
    * n_true_shingles); candidate − true quantifies the FP traffic the
    * exact stage absorbed. Positions use Kirsch–Mitzenmacher double
    * hashing from the shingle's FNV-64
    * ([[graft.functions.BloomPositions]]), so the oracle replays the
    * whole bitmap bit-for-bit in HUGEINT arithmetic. */
  def bloomDecontaminate(docs: DataFrame,
      isEval: org.apache.spark.sql.Column, k: Int = 4,
      mBits: Int = 1 << 17, nHash: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    def shingled(side: DataFrame): DataFrame =
      side.select(col("doc_id"),
        explode(array_distinct(shingleHashes(tokens(col("text")), k))).as("h"))

    // 1) eval-side bitmap: distinct shingle hashes → bit positions →
    //    ONE bit_or aggregation over at most mBits/64 words. Eval is
    //    small by contract (benchmarks vs a 100 TB corpus), so the job
    //    and the collect are metadata-sized. Persisted: the same
    //    distinct-hash set feeds the verify broadcast in step 3, and
    //    without the cache the eval scan+shingle pipeline would run
    //    twice (once per job).
    val evalSh = shingled(docs.filter(isEval)).select("h").distinct().persist()
    val words = new Array[Long](mBits / 64)
    evalSh
      .select(explode(bloom_positions(col("h"), mBits, nHash)).as("pos"))
      .groupBy(shiftright(col("pos"), 6).as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        pmod(col("pos"), lit(64)))).as("word"))
      .collect().foreach(r => words(r.getInt(0)) = r.getLong(1))

    // 2) train-side probe: positions + bitmask test entirely inside the
    //    scan (whole-stage codegen; the bitmap rides as a literal)
    val wordsLit = typedLit(words.toSeq)
    val member = forall(bloom_positions(col("h"), mBits, nHash), p =>
      element_at(wordsLit, shiftright(p, 6) + lit(1))
        .bitwiseAND(call_function("shiftleft", lit(1L), pmod(p, lit(64))))
        =!= lit(0L))
    val cand = shingled(Par.repart(docs.filter(!isEval)))
      .filter(member)

    // 3) exact verification — broadcast only the true hash set, against
    //    only the bloom-positive sliver
    cand.join(broadcast(evalSh.withColumn("is_true", lit(true))), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(countDistinct("h").as("n_candidate_shingles"),
        countDistinct(when(col("is_true"), col("h"))).as("n_true_shingles"))
  }

  /** Exact shared-SUBSTRING pairs (the ExactSubstr half of Lee et al.
    * '22 "Deduplicating Training Data Makes Language Models Better"):
    * for every doc pair sharing at least one exact k-token span,
    * report the length in tokens of their longest shared span and the
    * total count of matched k-gram positions. Shuffle keys are FNV-64
    * positional k-gram hashes (8 bytes, never gram strings); the
    * oracle joins the literal grams — identical barring ~2⁻⁶⁴
    * collisions (the dd35 stand-in contract).
    *
    * Matched positions (pa, pb) lie on diagonals d = pa − pb, and the
    * longest shared substring is the longest CONSECUTIVE run of
    * matches on one diagonal. Runs are found with the gaps-and-islands
    * trick — grp = pa − row_number() over the (pair, d) window is
    * constant exactly along a consecutive run — so the whole operator
    * is candidate join + two keyed aggregations; no per-pair
    * sequential scan, no global sort, and window state is bounded by
    * one (pair, diagonal) match list. K-grams held by more than
    * `maxDocsPerSpan` distinct docs (corpus boilerplate: license
    * headers, navigation chrome) are dropped BEFORE pair generation —
    * the standard ExactSubstr cap that keeps a 100 TB run from
    * generating O(hot²) pairs off one common sentence. */
  def spanPairs(docs: DataFrame, k: Int = 8,
      maxDocsPerSpan: Int = 50): DataFrame = {
    val toks = tokens(col("text"))
    // positional (NOT distinct) hashed k-grams: pos is the gram's
    // 0-based token offset. Shingling is the CPU stage — spread it
    // (docShingles rationale).
    val grams = Par.repart(docs)
      .filter(size(toks) >= k)
      .select(col("doc_id"),
        posexplode(shingleHashes(toks, k)).as(Seq("p", "key")))
    // boilerplate cap, then keep only grams ≥2 docs can pair on: the
    // aggregate is distinct-gram-sized (corpus-proportional, so NOT
    // broadcast-hinted — AQE picks broadcast while it fits and
    // degrades to shuffle beyond, same reasoning as ngramJaccardJoin's
    // df join).
    val keep = grams.groupBy("key")
      .agg(countDistinct("doc_id").as("ndocs"))
      .filter(col("ndocs").between(2, maxDocsPerSpan))
      .select("key")
    val g = grams.join(keep, "key").persist()
    val l = g.as("l")
    val r = g.as("r")
    val matches = l.join(r,
        col("l.key") === col("r.key") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.p").as("pa"), (col("l.p") - col("r.p")).as("d"))
    // pa is unique within (pair, d) — for a fixed diagonal, pa
    // determines pb — so row_number is deterministic and consecutive
    // pa values collapse to one island.
    val w = Window.partitionBy("doc_a", "doc_b", "d").orderBy("pa")
    val runs = matches
      .withColumn("grp", col("pa") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "d", "grp")
      .agg(count(lit(1)).as("run"))
    val out = runs.groupBy("doc_a", "doc_b")
      .agg((max(col("run")) + (k - 1)).as("longest_span_tokens"),
        sum(col("run")).cast("long").as("n_matched_grams"))
    out
  }

  /** Paragraph-level (chunk-level) dedup — the CCNet/RefinedWeb stage
    * that removes SEGMENTS duplicated across the corpus (boilerplate,
    * navigation chrome, repeated disclaimers) while keeping the rest
    * of each document. Documents are segmented into fixed `w`-token
    * chunks (segmentation is a parameter — real pipelines pass
    * line/paragraph boundaries; the fixed-width form is the same
    * plumbing and deterministic on any corpus); a chunk is "duplicated"
    * when more than one distinct doc contains it.
    *
    * Returns per doc: n_chunks, n_dup_chunks, and `kept_md5` — the md5
    * of the surviving text (non-duplicated chunks joined in original
    * order; NULL when nothing survives), so the oracle verifies the
    * REMOVAL itself, not just counts (ta_pii discipline).
    *
    * Scale shape: the corpus-wide duplicate count shuffles on the
    * chunk's FNV-64 (8-byte keys, map-side combined, one row per
    * distinct chunk); the per-doc rebuild shuffles doc-sized rows
    * keyed by doc_id. Nothing is ever O(pairs): unlike the pair
    * operators, chunk dedup needs only the per-chunk doc count. */
  def chunkDedup(docs: DataFrame, w: Int = 10): DataFrame = {
    val toks = tokens(col("text"))
    // tokenizer bound once per row (TextFunctions.bindOnce): the slice
    // lambda would otherwise re-run the regex per chunk — O(len²/w)
    val chunkArr = graft.functions.TextFunctions.bindOnce(toks) { tw =>
      transform(sequence(lit(0), floor((size(tw) - 1) / w).cast("int")),
        i => concat_ws(" ", slice(tw, i * w + 1, lit(w))))
    }
    val chunks = Par.repart(docs)
      .where(size(toks) >= 1)
      .select(col("doc_id"),
        posexplode(chunkArr).as(Seq("pos", "chunk")))
      .withColumn("chunk_hash",
        graft.functions.TextExpressions.fnv64(col("chunk")))
    val docCounts = chunks.groupBy("chunk_hash")
      .agg(countDistinct("doc_id").as("nd"))
    val kept = filter(array_sort(collect_list(struct(col("pos"), col("chunk"), col("nd")))),
      s => s.getField("nd") === 1)
    chunks.join(docCounts, "chunk_hash")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        when(size(kept) === 0, lit(null))
          .otherwise(md5(encode(
            array_join(transform(kept, s => s.getField("chunk")), " "), "UTF-8")))
          .as("kept_md5"))
  }

  /** Exact-dedup groups: normalized-text md5 → (hash, copies, keeper).
    * At scale: hash-shuffle on a 32-char key, map-side pre-aggregated. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(normText(col("text"))).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_doc_id"))

  /** Per-doc MinHash signature artifacts — (doc_id, sh, sig, bands):
    * the hashed shingle set, the numPerms-component signature, and the
    * LSH band keys. Signatures are per-doc (no cross-row dependency),
    * so a table computed over any PARTITION of a corpus is identical
    * to the corresponding rows of the full-corpus table — the property
    * [[incrementalPairs]] relies on when it signs only the new batch.
    * Persisted as parquet this IS the signature store a daily dedup
    * pipeline maintains (~0.5 KB/doc at 64 perms vs the raw text). */
  def signatureTable(docs: DataFrame, numPerms: Int = 64,
      rowsPerBand: Int = 4, carry: Seq[String] = Nil): DataFrame =
    docShingles(docs, carry)
      .withColumn("sig", minhashSignature(col("sh"), numPerms))
      .withColumn("bands", minhashBands(col("sig"), rowsPerBand))

  /** MinHash+LSH candidate pairs with exact Jaccard over the hashed
    * shingle sets (numPerms permutations, numPerms/rowsPerBand bands). */
  def minhashPairs(docs: DataFrame, numPerms: Int = 64, rowsPerBand: Int = 4): DataFrame = {
    val prepped = signatureTable(docs, numPerms, rowsPerBand).persist()
    bucketPairs(prepped, "bands")
      .join(prepped.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(prepped.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  /** MinHash ESTIMATION ACCURACY on the LSH candidate pairs: exact
    * shingle-set Jaccard next to the signature estimate (fraction of
    * agreeing components — the E[est]=J MinHash property). This is the
    * eval that justifies replacing the exact verify with the estimate
    * at 100 TB: the estimate costs O(numPerms) per pair on the already
    * tiny signatures, where exact needs both shingle SETS shipped to
    * the pair — and n/numPerms is exact in doubles, so the result is
    * hash-comparable cross-engine. */
  def minhashEstPairs(docs: DataFrame, numPerms: Int = 64,
      rowsPerBand: Int = 4): DataFrame = {
    val prepped = signatureTable(docs, numPerms, rowsPerBand).persist()
    // fused native agreement count (round 17) — was an interpreted
    // per-element aggregate(zip_with(...)) per candidate pair
    val matches =
      graft.functions.VecExprs.sig_match_count(col("sig_a"), col("sig_b"))
    bucketPairs(prepped, "bands")
      .join(prepped.select(col("doc_id").as("doc_a"),
        col("sh").as("sh_a"), col("sig").as("sig_a")), "doc_a")
      .join(prepped.select(col("doc_id").as("doc_b"),
        col("sh").as("sh_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sh_a"), col("sh_b")).as("exact_jaccard"),
        (matches.cast("double") / numPerms).as("est_jaccard"))
  }

  /** INCREMENTAL MinHash dedup — the realistic daily operation at
    * 100 TB: a new batch of documents dedups against a PERSISTED
    * signature store ([[signatureTable]] rows for the already-ingested
    * corpus) instead of re-pairing the whole corpus. `store` and
    * `newDocs` must have disjoint doc_ids (the store is the
    * already-committed corpus; the batch is what arrived since).
    *
    * Scale shape — the properties that make this the amortized path:
    *   - the base corpus is never re-shingled: only `newDocs` pays the
    *     CPU-heavy shingle+signature stage;
    *   - the store NEVER SHUFFLES: its band index streams once through
    *     a hash-probe against a BROADCAST of the new batch's band keys
    *     (a daily batch's exploded band keys are MBs against a corpus
    *     of TBs), and signatures ride along with the band rows so no
    *     doc_id join back into the store exists anywhere in the plan;
    *   - base×base pairs are structurally impossible: candidates are
    *     inc×base (store-stream ⨝ broadcast-inc) ∪ inc×inc
    *     ([[bucketPairs]] over the batch alone, skew-salted);
    *   - verification is by SIGNATURE ESTIMATE (agreeing components /
    *     numPerms — the dd_minhash_est-measured contract, mean abs err
    *     ~0.011 at 64 perms), so fixed 8·numPerms bytes per endpoint
    *     reach a pair, never the shingle sets.
    *
    * Union semantics: the result equals minhashEstPairs(base ∪ batch)
    * restricted to pairs with ≥1 batch endpoint (minus the exact-
    * Jaccard column, which would need the stored shingle sets) —
    * IncrementalDedupSpec pins the equivalence, and the two-wave
    * advance (store := store ∪ batch signatures, next batch dedups
    * against both) composes by the per-doc independence of
    * [[signatureTable]]. Returns (doc_a, doc_b, est_jaccard, vs_base)
    * with doc_a < doc_b; vs_base = the pair crosses batch↔store. */
  def incrementalPairs(store: DataFrame, newDocs: DataFrame,
      numPerms: Int = 64, rowsPerBand: Int = 4): DataFrame = {
    val inc = signatureTable(newDocs, numPerms, rowsPerBand).persist()
    // inc × inc — the new batch may carry internal near-dups
    val incInc = bucketPairs(inc, "bands").withColumn("vs_base", lit(false))
    // inc × base — store band index streamed, batch band keys broadcast
    val incBands = inc.select(col("doc_id").as("inc_id"),
      col("sig").as("inc_sig"), explode(col("bands")).as("bkey"))
    val storeBands = store.select(col("doc_id").as("base_id"),
      col("sig").as("base_sig"), explode(col("bands")).as("bkey"))
    // fused native agreement count (round 17, same as minhashEstPairs)
    val estExpr =
      (graft.functions.VecExprs.sig_match_count(col("sig_a"), col("sig_b"))
        .cast("double") / numPerms).as("est_jaccard")
    // estimate computed BEFORE the multi-band dedup: the exchange that
    // dedups candidate pairs then carries (long, long, double) rows —
    // pair-sized AND narrow — instead of two 8·numPerms-byte signatures
    val cross = storeBands.join(broadcast(incBands), "bkey")
      .select(
        least(col("base_id"), col("inc_id")).as("doc_a"),
        greatest(col("base_id"), col("inc_id")).as("doc_b"),
        when(col("base_id") < col("inc_id"), col("base_sig"))
          .otherwise(col("inc_sig")).as("sig_a"),
        when(col("base_id") < col("inc_id"), col("inc_sig"))
          .otherwise(col("base_sig")).as("sig_b"))
      .select(col("doc_a"), col("doc_b"), estExpr, lit(true).as("vs_base"))
      .distinct()
    // inc×inc signatures come from the (small, broadcast) batch table
    val incSig = inc.select(col("doc_id"), col("sig"))
    val incIncEst = incInc
      .join(broadcast(incSig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))), "doc_a")
      .join(broadcast(incSig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))), "doc_b")
      .select(col("doc_a"), col("doc_b"), estExpr, col("vs_base"))
    cross.unionAll(incIncEst)
  }

  /** SimHash near-dup pairs: 64-bit signature, `bands`×(64/bands)-bit
    * band bucketing, Hamming distance on candidates. */
  def simhashPairs(docs: DataFrame, bands: Int = 4): DataFrame = {
    val bits = 64 / bands
    val prepped = Par.repart(docs)
      .select(col("doc_id"), simhash64(tokens(col("text"))).as("sig"))
      .withColumn("bands", array((0 until bands).map(b =>
        concat(lit(b + ":"), (shiftright(col("sig"), b * bits) bitwiseAND lit((1L << bits) - 1)).cast("string"))): _*))
      .persist()
    bucketPairs(prepped, "bands")
      .join(prepped.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(prepped.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a") bitwiseXOR col("sig_b")).as("hamming"))
  }

  /** EXACT n-gram Jaccard similarity join at threshold `tau` via
    * prefix filtering (All-Pairs/PPJoin, Bayardo et al. '07): rank
    * each doc's shingles by a global (df asc, shingle) order and key
    * on the first |sh| - ⌈τ·|sh|⌉ + 1 of them; any pair with J ≥ τ
    * must share a prefix key, so candidates are complete and the
    * verified result equals the all-pairs join. Size and positional
    * filters (epsilon-guarded so fp rounding can only under-prune)
    * cut candidates ~3x before the per-candidate array verify. */
  def ngramJaccardJoin(docs: DataFrame, tau: Double = 0.5): DataFrame = {
    val eps = 1e-9
    val prepped = docShingles(docs).withColumn("n", size(col("sh"))).persist()
    val exploded = prepped.select(col("doc_id"), col("n"), explode(col("sh")).as("shingle"))
    val df = exploded.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    // df is one row per DISTINCT shingle — corpus-proportional, so a
    // broadcast HINT would be a 100 TB lie (8 GB broadcast cap); left
    // unhinted, AQE picks broadcast at small scale and degrades to a
    // shuffle join gracefully beyond it. persist the ranked prefix or
    // BOTH sides of the self-join re-run the whole pipeline.
    val prefixKeys = exploded.join(df, "shingle")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n") - ceil(col("n") * tau) + 1)
      .select(col("doc_id"), col("n"), col("rn"), col("shingle").as("bkey"))
      .persist()
    val l = prefixKeys.as("l")
    val r = prefixKeys.as("r")
    // size filter: J >= tau forces |a| >= tau|b| and |b| >= tau|a|.
    // positional filter (PPJoin): common elements sit at or after the
    // FIRST shared prefix key, so overlap <= 1 + min(remaining), and
    // J >= tau needs overlap >= tau/(1+tau)*(|a|+|b|).
    val alpha = (col("l.n") + col("r.n")) * (tau / (1 + tau))
    val pairs = l.join(r,
        col("l.bkey") === col("r.bkey") && col("l.doc_id") < col("r.doc_id")
          && col("l.n") >= col("r.n") * tau - eps
          && col("r.n") >= col("l.n") * tau - eps
          && (lit(1) + least(col("l.n") - col("l.rn"), col("r.n") - col("r.rn"))) >= alpha - eps)
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    pairs
      .join(prepped.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a")), "doc_a")
      .join(prepped.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b")), "doc_b")
      .withColumn("inter", inter)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** Duplicate-CLUSTER formation: connected components over verified
    * near-dup pairs — the step a dedup pipeline runs after pair
    * generation, so "A≈B, B≈C" collapses to one keeper even when A and
    * C never pair directly. Runs alternating two-phase star
    * contraction (large-star / small-star, Kiveris et al. '14
    * "Connected Components in MapReduce and Beyond" — public
    * knowledge), which converges in O(log² n) rounds worst-case and
    * ~log n in practice, INDEPENDENT of component diameter — a 100 TB
    * corpus with a long chain of pairwise near-dups (template drift)
    * pays log-many shuffles, not diameter-many. Each round is two
    * map-side-combinable min-aggregations plus two joins, all
    * distributed; the driver only orchestrates rounds and reads edge
    * counts. Returns (doc_id, cluster_id = component-min id,
    * cluster_size), nodes = every doc appearing in a pair. Output is
    * identical to diameter-bounded min-label propagation
    * ([[duplicateClustersLabelProp]]); StarContractionSpec pins the
    * equivalence and the round bound on a pathological chain. */
  def duplicateClusters(pairs: DataFrame, checkpointEvery: Int = 5): DataFrame = {
    // checkpointEvery is retained for source compatibility with the
    // label-prop signature; star contraction checkpoints every round
    // (rounds are O(log n), so lineage is already bounded).
    val _ = checkpointEvery
    val (labels, _) = starContract(pairs)
    val out = labels
      .join(labels.groupBy(col("label"))
        .agg(count(lit(1)).as("cluster_size")), "label")
      .select(col("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
    out
  }

  /** Alternating large-star/small-star contraction to a star forest
    * rooted at each component's minimum id. Returns the node→root
    * label table and the number of (large+small) rounds taken — the
    * spec's handle for asserting rounds ≪ diameter.
    *
    * Edge orientation invariant: every emitted edge points
    * large-id → small-id, so `min` aggregations are map-side partial
    * and no collect_list of neighborhoods ever materializes (hot
    * nodes cost a skewed shuffle key, never driver or single-task
    * neighborhood blowup). Convergence = edge-set fixpoint, which for
    * this operator pair is exactly the star forest. */
  private[graft] def starContract(pairs: DataFrame): (DataFrame, Int) = {
    // For each node u (over the SYMMETRIZED neighborhood), m(u) =
    // min(Γ(u) ∪ {u}); large-star rewires every strictly-larger
    // neighbor v > u to m(u).
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      val m = sym.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      sym.filter(col("dst") > col("src"))
        .join(m, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    // Small-star: orient each edge large→small, group by the large
    // endpoint u; m = min smaller-neighbor; rewire u and every
    // smaller neighbor to m.
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst"))
      val m = or.groupBy("src").agg(min("dst").as("mn"))
      or.join(m, "src")
        .select(col("dst").as("node"), col("mn"))
        .unionAll(m.select(col("src").as("node"), col("mn")))
        .filter(col("node") =!= col("mn"))
        .select(col("node").as("src"), col("mn").as("dst"))
        .distinct()
    }
    // (count, order-independent content checksum) in ONE tiny job over a
    // checkpointed edge set — the per-round progress probe. The checksum
    // (decimal sum of xxhash64(src,dst): no ANSI overflow, commutative)
    // lets the loop SKIP the per-round `except` job: only when
    // (count, checksum) repeat does the exact set-equality check run —
    // a hash collision merely costs one extra round, never a wrong
    // early stop (round 16; before this, pair-heavy graphs kept a
    // constant edge count and paid the except job EVERY round).
    def sig(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("src"), col("dst"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).first
      (r.getLong(0), if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }
    // value equality for the probe: BigDecimal.equals is SCALE-sensitive
    // (0 != 0.0) — both sides are decimal(38,0) sums today, but the
    // probe must not silently break if the cast type ever changes
    // (ADVICE r16)
    def sigEq(a: (Long, java.math.BigDecimal), b: (Long, java.math.BigDecimal)): Boolean =
      a._1 == b._1 && a._2.compareTo(b._2) == 0
    // Initial orientation: large-id → small-id, the canonical form both
    // steps emit (the invariant above). bucketPairs hands pairs in
    // (doc_a < doc_b) order, which is the MIRROR of the fixpoint form —
    // left as-is, every already-star-shaped component (the common
    // near-dup case: isolated pairs) needed one extra full round just
    // to flip its edges (round 16).
    var edges = pairs.select(
        greatest(col("doc_a"), col("doc_b")).as("src"),
        least(col("doc_a"), col("doc_b")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    var edgeSig = sig(edges)
    // COST-GATED DRIVER PATH (round 16): below
    // spark.graft.cluster.driverEdgeMax edges (default 64Ki ≈ a low
    // single-digit-MB collect — the same order as a broadcast hash
    // relation, and far under the 10 MB auto-broadcast default), solve
    // the components with a driver union-find instead of paying
    // O(log n) rounds × 6 shuffles of near-empty tasks. Identical
    // output by construction: the root is the component minimum under
    // CATALYST's own interpreted ordering for the id type (UTF8String
    // byte order for strings — NOT java.lang.String order), the exact
    // ordering the distributed min() aggregations use. Above the gate
    // — any real corpus — the star-contraction loop below runs
    // unchanged, so the 100 TB shape is untouched; the spec forces the
    // gate to 0 to pin the distributed round bound, and pins
    // driver == distributed equality on a mixed random graph.
    val driverMax = edges.sparkSession.conf
      .get("spark.graft.cluster.driverEdgeMax", "65536").toLong
    if (edgeSig._1 > 0 && edgeSig._1 <= driverMax) {
      // dt from the POST-COERCION edge schema (what collect() actually
      // returns), not the input column: greatest(doc_a, doc_b) may have
      // widened coercible-but-different input types (ADVICE r16)
      val dt = edges.schema("src").dataType
      val ord = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(dt)
      val toInternal =
        org.apache.spark.sql.catalyst.CatalystTypeConverters.createToCatalystConverter(dt)
      val toExternal =
        org.apache.spark.sql.catalyst.CatalystTypeConverters.createToScalaConverter(dt)
      val parent = new scala.collection.mutable.HashMap[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.collect().foreach { row =>
        val a = toInternal(row.get(0)); val b = toInternal(row.get(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          // attach the larger root under the smaller: roots stay minima
          if (ord.compare(ra, rb) < 0) parent(rb) = ra else parent(ra) = rb
        }
      }
      // snapshot keys before mapping: find() path-compresses (mutates
      // map VALUES) mid-iteration — safe for HashMap today since the
      // key set never changes, but don't lean on that (ADVICE r16)
      val ks = parent.keys.toArray
      val out = ks.map { n =>
        org.apache.spark.sql.Row(toExternal(n), toExternal(find(n)))
      }.toSeq
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", dt),
        org.apache.spark.sql.types.StructField("label", dt)))
      val labels = edges.sparkSession.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava, schema)
      return (labels, 0)
    }
    var rounds = 0
    var converged = edgeSig._1 == 0
    while (!converged) {
      rounds += 1
      val next0 = smallStar(largeStar(edges))
      // localCheckpoint every round: each round's plan chains two
      // groupBy+join stages over the last, so lineage truncation keeps
      // per-round planning O(1) in the round count (rounds are only
      // O(log n), but plan depth would still be 4× that in joins).
      val next = next0.localCheckpoint()
      val nextSig = sig(next)
      // Star-forest fixpoint check: both steps are deterministic set
      // maps, so set equality ⇔ count equal AND no new edges; the
      // (count, checksum) probe gates the exact check (see sig above).
      converged = sigEq(nextSig, edgeSig) && next.except(edges).isEmpty
      edges = next
      edgeSig = nextSig
    }
    // At the fixpoint every edge is (member, component-min); roots
    // appear only on the dst side.
    val labels = edges.select(col("src").as("doc_id"), col("dst").as("label"))
      .unionAll(edges.select(col("dst").as("doc_id"), col("dst").as("label")))
      .distinct().localCheckpoint()
    (labels, rounds)
  }

  /** Diameter-bounded min-label propagation — the pre-round-8
    * cluster path, kept as the independently-derived reference
    * implementation that StarContractionSpec checks
    * [[duplicateClusters]] against. Converges in O(component
    * diameter) rounds; fine for dense near-dup clusters, pathological
    * on long chains — which is why the default path is star
    * contraction. */
  private[graft] def duplicateClustersLabelProp(pairs: DataFrame, checkpointEvery: Int = 5): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().persist()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id")).persist()
    var changed = 1L
    var round = 0
    while (changed > 0) {
      round += 1
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min("label").as("nlabel"))
      // prev label rides along so convergence detection is a filter
      // over this round's result, not another join against the old
      // labels (one join + one shuffle saved per round)
      val chained = labels.withColumnRenamed("label", "prev")
        .join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("prev"),
          least(col("prev"), coalesce(col("nlabel"), col("prev"))).as("label"))
      // persist bounds RECOMPUTE but not PLAN DEPTH: each round chains
      // joins over the previous frame, so on a high-diameter graph
      // (long chains of near-dups) analysis time and stack grow per
      // round. An eager localCheckpoint every few rounds truncates the
      // lineage, keeping per-round planning O(1) in the round count.
      val updated =
        if (round % checkpointEvery == 0) chained.localCheckpoint()
        else chained.persist()
      changed = updated.filter(col("label") =!= col("prev")).count()
      labels.unpersist(blocking = false)
      labels = updated.select("doc_id", "label")
    }
    // Checkpoint the fixpoint so the RETURNED plan no longer references
    // the loop's caches — then edges and the last round's frame can be
    // released immediately without the caller's later materialization
    // recomputing the whole edge derivation.
    val fixed = labels.select("doc_id", "label").localCheckpoint()
    labels.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    fixed
      .join(fixed.groupBy(col("label"))
        .agg(count(lit(1)).as("cluster_size")), "label")
      .select(col("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
  }

  /** SEMANTIC dedup pairs (SemDeDup, Abbas et al. '23): cluster the
    * embedding space with spherical k-means, then compute exact
    * cosine only WITHIN clusters — semantically-redundant documents
    * land in the same cluster, so the candidate set is cluster-local
    * instead of O(n²). The same shape as [[embeddingPairs]] with
    * learned (data-adaptive) buckets instead of random hyperplanes:
    * LSH buckets split near-dups that straddle a hyperplane, k-means
    * buckets follow the density. At 100 TB: centroids are k×dim
    * driver-side constants shipped in the plan, assignment is a
    * scan-local projection, and the only data shuffle is the
    * cluster-keyed self-join. */
  def semanticPairs(vecs: DataFrame, ivfK: Int = 32, iters: Int = 2,
      scale: Double = (1L << 24).toDouble): DataFrame = {
    val assigned = graft.operators.AnnOps
      .kmeansAssign(graft.operators.AnnOps.prep(vecs), ivfK, iters, scale)
      .persist()
    val l = assigned.as("l")
    val r = assigned.as("r")
    l.join(r, col("l.cluster") === col("r.cluster") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"),
        cosineFromDot(dot(col("l.embedding"), col("r.embedding")),
          col("l.nrm"), col("r.nrm")).as("cosine"))
  }

  /** Embedding-cosine near-dup pairs: `bits`-bit random-hyperplane LSH
    * buckets, exact cosine only within buckets. */
  def embeddingPairs(vecs: DataFrame, bits: Int = 12): DataFrame = {
    val prepped = Par.repart(vecs)
      .select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"),
        hyperplaneBucket(col("embedding"), bits).as("bucket"))
      .persist()
    val l = prepped.as("l")
    val r = prepped.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"),
        cosineFromDot(dot(col("l.embedding"), col("r.embedding")),
          col("l.nrm"), col("r.nrm")).as("cosine"))
  }
}
