package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks for the LLM-data-pipeline operators
  * (SURVEY.md §2c). Everything here composes `org.apache.spark.sql.
  * functions._` (codegen'd / JVM-native higher-order functions) — no
  * Scala UDFs — so the operators scale as ordinary Catalyst plans.
  */
object TextFunctions {

  /** Whitespace tokens of a (already normalized) text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Evaluate `c` ONCE per row and hand it to `f` as a bound lambda
    * variable. Higher-order-function lambdas re-evaluate any captured
    * outer EXPRESSION once per element (HOFs run interpreted — no
    * common-subexpression elimination), so an expensive expression
    * like the `tokens` regex referenced inside a `transform` lambda
    * turns O(len) work into O(len²) per document — measured 20×+ on
    * ta_repetition/dd_* before this binding (round 8). Wrapping the
    * value in a 1-element array and transforming it binds the value
    * to a NamedLambdaVariable, which element accesses read for free. */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Normalize for exact dedup: lowercase, trim, collapse whitespace. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Word k-shingles: overlapping k-grams joined by single spaces.
    * k=3 word shingles are the standard near-dup unit (Broder '97). */
  def shingles(toks: Column, k: Int): Column =
    // for i in 0..(n-k): concat_ws(' ', slice(w, i+1, k)) — with the
    // token expression BOUND once per row ([[bindOnce]]): callers pass
    // `tokens(col("text"))` directly, and an unbound `toks` would
    // re-run the tokenizer regex for every shingle (O(len²) per doc —
    // the difference between a scan and a stall on megabyte docs)
    bindOnce(toks) { w =>
      val n = size(w)
      when(n >= k,
        transform(sequence(lit(0), n - k),
          i => concat_ws(" ", slice(w, i + 1, lit(k)))))
        .otherwise(array(concat_ws(" ", w)))
    }

  /** Hashed word k-shingles: FNV-1a 64 of each k-gram joined by single
    * spaces. For set-similarity purposes a 64-bit hash is a faithful
    * stand-in for the shingle itself (collision odds ~n²/2⁶⁵), and
    * hashing longs downstream (MinHash's 64 seeded re-hashes) is far
    * cheaper than re-hashing strings. FNV rather than xxhash64 so the
    * DuckDB oracle can replay the hash byte-for-byte (OracleSql). */
  def shingleHashes(toks: Column, k: Int): Column =
    transform(shingles(toks, k), s => graft.functions.TextExpressions.fnv64(s))

  /** Full MinHash signature over a HASHED shingle array (array<long>,
    * from [[shingleHashes]]) — single-pass native expression; see
    * [[graft.functions.MinHashSig]] for why not numPerms×transform. */
  def minhashSignature(shingleHashSet: Column, numPerms: Int): Column =
    graft.functions.TextExpressions.minhash_sig(shingleHashSet, numPerms)

  /** LSH band keys: combine r consecutive signature components per
    * band → array of (numPerms / r) band keys. Docs sharing ANY band
    * key are near-dup candidates (banding theorem: catches high-
    * Jaccard pairs with high probability while keeping the join
    * sparse). Wrapping polynomial combine via the native BandKeys
    * expression (oracle-replayable; Column long arithmetic would
    * error on overflow under ANSI mode). */
  def minhashBands(sig: Column, rowsPerBand: Int): Column =
    graft.functions.TextExpressions.band_keys(sig, rowsPerBand)

  /** Exact Jaccard similarity of two array-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  // ---- embeddings ----------------------------------------------------

  /** Dot product of two float-array columns (native single-loop
    * expression — round 17 replaced the interpreted
    * `aggregate(zip_with(...))` higher-order tree, which cost a
    * Catalyst lambda eval per ELEMENT per candidate pair). Each
    * element is widened to double BEFORE the multiply: float×float
    * rounds to float precision, and the oracle (DuckDB over double
    * lists) multiplies in double — per-element widening + left-fold
    * double accumulation is bit-identical across engines
    * (float→double is exact; IEEE ops are correctly rounded). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecExprs.dot_d(a, b)

  /** L2 norm of a float-array column (double-widened, see [[dot]]). */
  def l2norm(a: Column): Column =
    graft.functions.VecExprs.l2norm_d(a)

  /** Cosine similarity given precomputed norms (compute norms once per
    * side before a pairwise join — never inside it). */
  def cosineFromDot(dotCol: Column, normA: Column, normB: Column): Column =
    when(normA === 0 || normB === 0, 0.0).otherwise(dotCol / (normA * normB))

  /** Deterministic random-hyperplane LSH bit: sign of ⟨v, h_i⟩ where
    * hyperplane component h_i[j] is a pseudo-random ±[0,1) value derived
    * from xxhash64(i, j) — no RNG state, identical on every executor. */
  def hyperplaneBit(vec: Column, plane: Int): Column = {
    // component j of plane i: (hash(i, j) % 10000) / 10000 - 0.5
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (v, j) => v * ((pmod(xxhash64(lit(plane), j), lit(10000)).cast("double") / 10000.0) - 0.5)),
      lit(0.0d), (acc, x) => acc + x)
    when(proj >= 0, 1).otherwise(0)
  }

  /** LSH bucket id from `bits` hyperplane signs (bits ≤ 30). Native
    * single-pass evaluation; equals the composed [[hyperplaneBit]]
    * sum (asserted by ScaleToolsSpec). */
  def hyperplaneBucket(vec: Column, bits: Int): Column =
    element_at(graft.functions.TextExpressions.hyperplane_keys(vec, bits, 1), 1)

  /** Multi-table LSH keys: `tables` independent `bits`-bit buckets
    * (disjoint hyperplane sets), each offset into its own key space.
    * Candidates = vectors sharing ANY table's bucket — the standard
    * recall amplifier (miss probability decays exponentially in the
    * number of tables) at the cost of `tables`× bucket joins.
    * Evaluated by the native [[graft.functions.HyperplaneKeys]]
    * expression: one pass, plane matrix computed once per executor. */
  def hyperplaneBucketKeys(vec: Column, bits: Int, tables: Int): Column =
    graft.functions.TextExpressions.hyperplane_keys(vec, bits, tables)

  // ---- language ID ---------------------------------------------------

  /** Stopword lists for the n-gram/stopword language heuristic. Small
    * curated high-frequency function words per language. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "du", "pour"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "de", "del", "para"),
    "zh" -> Seq("的", "是", "不", "了", "在", "有", "我", "他", "这", "个"))

  /** Fraction of tokens that are stopwords of `lang`. */
  def stopwordRatio(toks: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
  }

  /** Predicted language = argmax over stopword scores (ties → first in
    * the fixed lang order, deterministic). */
  def langPredict(toks: Column): Column = {
    val langs = Seq("en", "de", "fr", "es", "zh")
    val scored = array(langs.map(l =>
      struct(stopwordRatio(toks, l).as("score"), lit(l).as("lang"))): _*)
    // array_max on struct compares score first, then lang — break ties
    // deterministically by preferring the lexically-largest lang name
    // only when scores are equal; acceptable for a heuristic.
    array_max(scored).getField("lang")
  }
}
