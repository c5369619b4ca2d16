package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TextExpressions.simhash64
import graft.functions.TextFunctions._

/** SURVEY.md §2c — near-duplicate detection over `documents` and
  * `embeddings`.
  *
  * All four operators follow the same scale shape: per-row signature
  * (narrow, codegen) → candidate generation via bucket join (shuffle on
  * a sparse key — never an O(n²) cross join) → exact verification only
  * within candidate pairs. The verify dump reports the top-K most
  * similar pairs (deterministically ordered) so results are non-empty
  * even on a corpus with no true near-dups.
  */
object DedupQueries {

  private val TopK = 50

  /** doc_id, toks, shingle set (distinct word 3-grams).
    *
    * The source table arrives as few splits (small files), but
    * shingling/hashing is the CPU-heavy stage — repartition first so
    * the per-row work uses every core. (At 100 TB the scan already has
    * thousands of splits and this repartition is a no-op cost-wise;
    * with AQE it coalesces back after.) */
  private def docShingles(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        array_distinct(shingleHashes(tokens(col("text")), 3)).as("sh"))

  /** Candidate pairs via any shared key in `keysCol` (exploded bucket
    * join). `a < b` canonicalization + distinct dedups multi-bucket
    * collisions. */
  private def bucketPairs(docs: DataFrame, keysCol: String): DataFrame = {
    val exploded = docs.select(col("doc_id"), explode(col(keysCol)).as("bkey"))
    val l = exploded.as("l")
    val r = exploded.as("r")
    l.join(r, col("l.bkey") === col("r.bkey") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  val all: Seq[QueryDef] = Seq(

    // dd33: MinHash + LSH banding (64 perms, 16 bands × 4 rows) →
    // bucket join → exact Jaccard verify on candidates only. 16 bands
    // of 4 catch Jaccard≥0.8 pairs with p≥0.996 at half the signature
    // cost of 128 perms (the hash fan-out dominates this operator).
    // Oracle-checked end-to-end: shingle FNV, the 64 splitmix64
    // permutation mins, band fold, candidate join and Jaccard ranks
    // are replayed exactly in DuckDB (wrapping arithmetic in HUGEINT,
    // permutation seeds embedded as literals — see OracleSql).
    QueryDef.sql(
      "dd_minhash_lsh", {
        import OracleSql._
        s"""WITH toks AS (
           |  SELECT doc_id, ${tokens("text")} AS t FROM documents
           |), sh AS (
           |  SELECT doc_id, ${shingles3("t")} AS sh FROM toks
           |), ${minhashBandCtes("sh", 64, 4)}, pairs AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bk a JOIN bk b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
           |)
           |SELECT p.doc_a, p.doc_b,
           |  CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
           |    / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jaccard
           |FROM pairs p
           |JOIN sh x ON x.doc_id = p.doc_a
           |JOIN sh y ON y.doc_id = p.doc_b
           |ORDER BY jaccard DESC, doc_a, doc_b LIMIT $TopK""".stripMargin
      }) { (s, dir) =>
      val docs = docShingles(s, dir)
        .withColumn("sig", minhashSignature(col("sh"), 64))
        .withColumn("bands", minhashBands(col("sig"), 4))
        .persist()
      val pairs = bucketPairs(docs, "bands")
      val withJac = pairs
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      withJac.orderBy(col("jaccard").desc, col("doc_a"), col("doc_b")).limit(TopK)
    },

    // dd34: SimHash (native Catalyst expression) + Hamming distance via
    // 4×16-bit band bucketing; near-dup = small bit_count(xor).
    // Oracle-checked end-to-end: the FNV-1a token hash, bit votes,
    // band keys and hamming cut are all replayed exactly in DuckDB
    // (wrapping 64-bit arithmetic via HUGEINT — see OracleSql).
    QueryDef.sql(
      "dd_simhash",
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${OracleSql.tokens("text")}) AS t FROM documents
         |), th AS (
         |  SELECT doc_id, ${OracleSql.toSigned("hu")} AS h
         |  FROM (SELECT doc_id, ${OracleSql.fnv1a64Unsigned("t")} AS hu FROM tok)
         |), sig AS (
         |  ${OracleSql.simhashFromHashes}
         |), keyed AS (
         |  SELECT doc_id, sig,
         |    concat(b, ':', CAST((sig >> (b*16)) & 65535 AS VARCHAR)) AS bkey
         |  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS b)
         |), pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.sig AS sig_a, b.sig AS sig_b
         |  FROM keyed a JOIN keyed b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
         |)
         |SELECT doc_a, doc_b, bit_count(xor(sig_a, sig_b)) AS hamming
         |FROM pairs ORDER BY hamming, doc_a, doc_b LIMIT $TopK""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), simhash64(tokens(col("text"))).as("sig"))
        // 4 bands of 16 bits: docs within Hamming distance 3 share ≥1 band
        .withColumn("bands", array((0 until 4).map(b =>
          concat(lit(b + ":"), (shiftright(col("sig"), b * 16) bitwiseAND lit(0xffffL)).cast("string"))): _*))
        .persist()
      val pairs = bucketPairs(docs, "bands")
      pairs
        .join(docs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sig_a") bitwiseXOR col("sig_b")).as("hamming"))
        .orderBy(col("hamming"), col("doc_a"), col("doc_b")).limit(TopK)
    },

    // dd35: n-gram Jaccard similarity join — EXACT at threshold τ via
    // prefix filtering (All-Pairs/PPJoin, Bayardo et al. '07): rank
    // each doc's shingles by a global (df asc, shingle) order and key
    // on the first |sh| - ⌈τ·|sh|⌉ + 1 of them; any pair with
    // J ≥ τ must share a prefix key, so candidates are complete and
    // the verified result equals the all-pairs join. Rarest-first
    // keying keeps buckets small (a corpus-common shingle lands in a
    // prefix only when a doc has almost nothing rarer). Size and
    // positional filters then cut candidates ~3x, so verification
    // attaches the two shingle arrays per SURVIVING candidate only —
    // candidate volume, not the corpus, sizes that join.
    QueryDef.sql(
      "dd_ngram_jaccard", {
        val sh = OracleSql.shingles3("t")
        s"""WITH toks AS (
           |  SELECT doc_id, ${OracleSql.tokens("text")} AS t FROM documents
           |), sh AS (
           |  SELECT doc_id, $sh AS sh FROM toks
           |)
           |SELECT * FROM (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
           |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
           |) WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin
      }) { (s, dir) =>
      val tau = 0.5
      // candidate-shrinking filters below are complete but only if they
      // never round AGAINST a qualifying pair — subtract an epsilon so
      // fp error in tau-products can only under-prune, never over-prune
      val eps = 1e-9
      val docs = docShingles(s, dir).withColumn("n", size(col("sh"))).persist()
      val exploded = docs.select(col("doc_id"), col("n"), explode(col("sh")).as("shingle"))
      val df = exploded.groupBy("shingle").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
      // df is one row per DISTINCT shingle — corpus-proportional, so a
      // broadcast HINT would be a 100 TB lie (8 GB broadcast cap);
      // left unhinted, AQE turns the join into a broadcast at small
      // scale and degrades to a shuffle join gracefully beyond it.
      // persist the ranked prefix or BOTH sides of the self-join
      // re-run the scan+aggregate+window pipeline.
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
      // verify: attach the two shingle arrays per surviving candidate.
      // Spark broadcasts the (small) docs side when stats allow; at
      // corpus scale this degrades gracefully to a shuffle join keyed
      // by doc id — candidates, not the corpus, dominate the traffic.
      val inter = size(array_intersect(col("sh_a"), col("sh_b")))
      pairs
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b")), "doc_b")
        .withColumn("inter", inter)
        .select(col("doc_a"), col("doc_b"),
          (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= tau)
        .orderBy("doc_a", "doc_b")
    },

    // dd36: embedding-cosine near-dup — 12-bit random-hyperplane LSH
    // buckets, exact cosine only within buckets. Oracle-checked with
    // the plane coefficients embedded as literals (see OracleSql).
    QueryDef.sql(
      "dd_embedding",
      s"""WITH ${OracleSql.annBaseCtes},
         |${OracleSql.hyperplaneKeysCtes("hpk", 12, 1, 96)},
         |nb AS (
         |  SELECT n.vec_id, n.e, n.nrm, hpk.keys[1] AS bucket
         |  FROM n JOIN hpk USING (vec_id)
         |)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${OracleSql.cosine("a.e", "b.e", "a.nrm", "b.nrm")} AS cosine
         |FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |ORDER BY cosine DESC, vec_a, vec_b LIMIT $TopK""".stripMargin) { (s, dir) =>
      val vecs = Tables.load(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id"), col("embedding"),
          l2norm(col("embedding")).as("nrm"),
          hyperplaneBucket(col("embedding"), 12).as("bucket"))
        .persist()
      val l = vecs.as("l")
      val r = vecs.as("r")
      l.join(r, col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
        .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"),
          cosineFromDot(dot(col("l.embedding"), col("r.embedding")),
            col("l.nrm"), col("r.nrm")).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_a"), col("vec_b")).limit(TopK)
    }
  )
}
