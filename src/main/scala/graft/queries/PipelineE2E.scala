package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TextExpressions.rolling_hash
import graft.functions.TextFunctions._

/** SURVEY.md §2c capstone (pipe47): the §2c operators composed the way
  * a real training-data prep job runs them — one declarative plan, so
  * Catalyst fuses the per-document scoring into a single scan pass and
  * the only shuffles are the dedup bucket join and final ordering:
  *
  *   1. quality gate (length + lexical diversity)
  *   2. language ID annotation
  *   3. near-dup removal via MinHash/LSH (keep lowest doc_id per
  *      detected duplicate pair)
  *   4. per-survivor token accounting + fingerprint
  */
object PipelineE2E {

  /** The whole composed pipeline replayed in DuckDB: every stage
    * (quality divisions, stopword argmax, FNV/MinHash/band keys,
    * Jaccard≥0.8 verify, anti-join, rolling-hash fingerprint) uses the
    * exact-semantics building blocks of [[OracleSql]], so even this
    * capstone is hash-compared, not rows-only. */
  private def oracle: String = {
    import OracleSql._
    val sw = graft.functions.TextFunctions.stopwords
    val scoreCols = sw.keys.toSeq.sorted.map(l =>
      s"${stopwordScore("t", sw(l))} AS s_$l").mkString(",\n    ")
    val unions = sw.keys.toSeq.sorted.map(l =>
      s"SELECT doc_id, '$l' AS cand, s_$l AS score FROM sc").mkString("\n  UNION ALL ")
    s"""WITH t0 AS (
       |  SELECT doc_id, lang, text, ${tokens("text")} AS t FROM documents
       |), q0 AS (
       |  SELECT *, len(t) AS n_words,
       |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS diversity
       |  FROM t0
       |), qf AS (
       |  SELECT doc_id, lang, text, t, n_words FROM q0
       |  WHERE n_words >= 20 AND diversity > 0.2
       |), sc AS (
       |  SELECT doc_id,
       |    $scoreCols
       |  FROM qf
       |), lc AS (
       |  $unions
       |), lp AS (
       |  SELECT doc_id, cand AS lang_pred FROM lc
       |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand DESC) = 1
       |), sh AS (
       |  SELECT doc_id, ${shingles3("t")} AS sh FROM qf
       |), ${minhashBandCtes("sh", 64, 4)}, cand_pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bk a JOIN bk b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
       |), losers AS (
       |  SELECT DISTINCT p.doc_b AS doc_id
       |  FROM cand_pairs p
       |  JOIN sh x ON x.doc_id = p.doc_a
       |  JOIN sh y ON y.doc_id = p.doc_b
       |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
       |    / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.8
       |), fp AS (
       |  SELECT doc_id, hex(encode(nt)) AS thx, octet_length(encode(nt)) AS tbl
       |  FROM (SELECT doc_id,
       |          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt FROM qf)
       |)
       |SELECT q.doc_id, q.lang, lp.lang_pred, q.n_words,
       |  CAST(CEIL(LENGTH(q.text) / 4.0) AS BIGINT) AS bpe_est,
       |  ${rollingHash(signedBytes("fp.thx", "fp.tbl"))} AS fingerprint
       |FROM qf q
       |JOIN lp USING (doc_id)
       |JOIN fp ON fp.doc_id = q.doc_id
       |LEFT JOIN losers lo ON lo.doc_id = q.doc_id
       |WHERE lo.doc_id IS NULL
       |ORDER BY q.doc_id""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef.sql("pipe_e2e", oracle) { (s, dir) =>
      val toks = tokens(col("text"))
      val docs = graft.operators.Par.repart(Tables.load(s, dir, "documents"))
        .withColumn("n_words", size(toks))
        .withColumn("diversity", size(array_distinct(toks)).cast("double") / size(toks))
        .filter(col("n_words") >= 20 && col("diversity") > 0.2) // quality gate
        .withColumn("lang_pred", langPredict(toks))
        .withColumn("sh", array_distinct(shingleHashes(toks, 3)))
        .withColumn("sig", minhashSignature(col("sh"), 64))
        .withColumn("bands", minhashBands(col("sig"), 4))
        .persist()

      // near-dup pairs via band buckets (skew-safe hot/cold split in
      // bucketPairs), verified at Jaccard >= 0.8
      val pairs = graft.operators.DedupOps.bucketPairs(docs, "bands")
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .filter(jaccard(col("sh_a"), col("sh_b")) >= 0.8)

      // drop the higher doc_id of each verified duplicate pair
      val losers = pairs.select(col("doc_b").as("doc_id")).distinct()
      docs.join(losers, Seq("doc_id"), "left_anti")
        .select(
          col("doc_id"), col("lang"), col("lang_pred"), col("n_words"),
          ceil(length(col("text")) / 4.0).cast("bigint").as("bpe_est"),
          rolling_hash(normText(col("text"))).as("fingerprint"))
        .orderBy("doc_id")
    },

    // pipe68 (round 4): sequence packing — docs concatenated into
    // 512-token training windows by deterministic next-fit within
    // hash shards (graft.operators.PackingOps: one shuffle on the
    // shard key, per-partition ordered scan, no driver state; the
    // sequential unit is the shard, which is what you scale). The
    // oracle replays the same next-fit fold as a DuckDB recursive CTE
    // stepping through each shard's docs in order.
    QueryDef.sql(
      "pipe_pack",
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, doc_id % 8 AS shard,
         |    CAST(len(${OracleSql.tokens("text")}) AS BIGINT) AS t,
         |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
         |  FROM documents
         |), p AS (
         |  SELECT shard, rn, doc_id, t, CAST(1 AS BIGINT) AS bin_id, t AS fill
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.shard, d.rn, d.doc_id, d.t,
         |    CASE WHEN p.fill + d.t <= 512 THEN p.bin_id ELSE p.bin_id + 1 END,
         |    CASE WHEN p.fill + d.t <= 512 THEN p.fill + d.t ELSE d.t END
         |  FROM p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
         |)
         |SELECT doc_id, shard, bin_id, t AS n_tokens
         |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.PackingOps
        .packSequences(Tables.load(s, dir, "documents"), budget = 512, shards = 8)
        .orderBy("doc_id")
    },

    // pipe96 (round 5): deterministic training-order shuffle — the
    // "shuffle the corpus before each epoch" step, WITHOUT rand()
    // (nondeterministic functions break task retries: a re-executed
    // partition would deal different rows — the Salting.scala rule).
    // Order = FNV-64 of a seeded key string; shard + position within
    // shard are fully partitioned (64 independent per-shard windows —
    // a GLOBAL row_number would serialize the corpus through one
    // task; training readers consume shards in order, which is the
    // scalable contract). Changing the seed literal re-deals the
    // whole permutation.
    QueryDef.sql(
      "pipe_shuffle", {
        import OracleSql._
        val key = toSigned(fnv1a64Unsigned("'epoch42:' || CAST(doc_id AS VARCHAR)"))
        s"""WITH k AS (
           |  SELECT doc_id, $key AS k FROM documents
           |)
           |SELECT doc_id, CAST(${toUnsigned("k")} % 64 AS BIGINT) AS shard,
           |  CAST(row_number() OVER (
           |    PARTITION BY ${toUnsigned("k")} % 64
           |    ORDER BY k, doc_id) AS BIGINT) AS pos_in_shard
           |FROM k ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val key = graft.functions.TextExpressions.fnv64(
        concat(lit("epoch42:"), col("doc_id").cast("string")))
      val shard = pmod(col("k"), lit(64))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), key.as("k"))
        .select(col("doc_id"), col("k"), shard.as("shard"))
        .withColumn("pos_in_shard",
          row_number().over(Window.partitionBy("shard").orderBy("k", "doc_id")).cast("long"))
        .select(col("doc_id"), col("shard").cast("long").as("shard"), col("pos_in_shard"))
        .orderBy("doc_id")
    },

    // pipe100 (round 5): deterministic weighted-mixture interleave
    // (stride scheduling) — the curriculum/mixture scheduler: source
    // srcN gets weight (N mod 4)+1, and any prefix of the emitted
    // order carries sources in proportion to their weights. The
    // headline scale property: graft computes each doc's GLOBAL
    // position in closed form (integer arithmetic against per-source
    // totals — no global sort, no single-partition window; audited),
    // while the oracle computes it the opposite way, row_number over
    // an ACTUAL global sort of the stride keys — the hash match
    // cross-validates the closed form against a real sort every run.
    QueryDef.sql(
      "pipe_mix", {
        import OracleSql._
        val key = toSigned(fnv1a64Unsigned("'mix42:' || CAST(doc_id AS VARCHAR)"))
        s"""WITH base AS (
           |  SELECT doc_id, source, $key AS k FROM documents
           |), sh AS (
           |  SELECT doc_id, source, k,
           |    CAST(${toUnsigned("k")} % 64 AS INT) AS shard
           |  FROM base
           |), r AS (
           |  SELECT doc_id, source,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY shard, k, doc_id) AS r
           |  FROM sh
           |), kk AS (
           |  SELECT doc_id, source, r,
           |    (2*r - 1) * (12 // ((CAST(regexp_extract(source, '([0-9]+)', 1)
           |      AS INT) % 4) + 1)) AS kkey
           |  FROM r
           |)
           |SELECT doc_id, source, CAST(r AS BIGINT) AS src_rank,
           |  CAST(row_number() OVER (ORDER BY kkey, source) AS BIGINT)
           |    AS global_pos
           |FROM kk ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      graft.operators.MixOps.strideMix(
          Tables.load(s, dir, "documents"),
          weightOf = src => src.replaceAll("\\D", "").toInt % 4 + 1)
        .orderBy("doc_id")
    },

    // pipe_split (round 8): LEAKAGE-SAFE train/val/test split — the
    // step every LLM data pipeline runs after dedup, done wrong by
    // per-doc hashing: two near-duplicate documents split by doc hash
    // can land one in train and one in test, and the "held-out" eval
    // is contaminated. The safe unit is the near-dup CLUSTER: docs are
    // grouped by MinHash-verified (J≥0.8) connected components
    // (star-contracted — O(log n) rounds), unpaired docs are their own
    // group, and the split is FNV-64 of the GROUP key mod 64
    // (<52 train, <58 val, else test ≈ 81/9/9). Same group ⇒ same hash
    // ⇒ same split, so no near-dup pair can ever straddle a split —
    // structural, not probabilistic. Deterministic (no rand(): task
    // retries re-deal nothing), re-runnable, and the assignment of any
    // doc depends only on its group key — a grown corpus re-splits
    // without moving old groups. Scale: cluster formation is the
    // star-contraction path; the only other shuffles are the label
    // join (keyed by doc_id, labels bounded by PAIRED docs, not the
    // corpus) — the split hash itself is scan-local. Oracle: DuckDB
    // recursive-CTE closure + byte-exact FNV replay.
    QueryDef.sql(
      "pipe_split", {
        import OracleSql._
        val u = fnv1a64Unsigned("'split42:' || CAST(group_key AS VARCHAR)")
        s"""WITH RECURSIVE toks AS (
           |  SELECT doc_id, ${tokens("text")} AS t FROM documents
           |), sh AS (
           |  SELECT doc_id, ${shingles3("t")} AS sh FROM toks
           |), ${minhashBandCtes("sh", 64, 4)}, cand AS (
           |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
           |  FROM bk a JOIN bk b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
           |), edges AS (
           |  SELECT c.a, c.b FROM cand c
           |  JOIN sh x ON x.doc_id = c.a
           |  JOIN sh y ON y.doc_id = c.b
           |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
           |    / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.8
           |), bidir AS (
           |  SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges
           |), reach AS (
           |  SELECT DISTINCT a AS doc_id, a AS root FROM bidir
           |  UNION
           |  SELECT e.b AS doc_id, r.root FROM reach r JOIN bidir e ON e.a = r.doc_id
           |), cc AS (
           |  SELECT doc_id, MIN(root) AS cluster_id FROM reach GROUP BY doc_id
           |), g AS (
           |  SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS group_key
           |  FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
           |), kb AS (
           |  SELECT doc_id, group_key, CAST($u % 64 AS BIGINT) AS b FROM g
           |)
           |SELECT doc_id, group_key,
           |  CASE WHEN b <= 51 THEN 'train' WHEN b <= 57 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM kb ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      import graft.operators.DedupOps
      val docs = Tables.load(s, dir, "documents")
      val pairs = DedupOps.minhashPairs(docs, 64, 4).filter(col("jaccard") >= 0.8)
      val clusters = DedupOps.duplicateClusters(pairs)
        .select(col("doc_id"), col("cluster_id"))
      val keyed = docs.select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("group_key"))
      val b = pmod(graft.functions.TextExpressions.fnv64(
        concat(lit("split42:"), col("group_key").cast("string"))), lit(64))
      keyed.withColumn("b", b)
        .select(col("doc_id"), col("group_key"),
          when(col("b") <= 51, "train").when(col("b") <= 57, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },

    // pipe_curriculum (round 8): CURRICULUM ordering — easy→hard
    // training order (Bengio et al. '09, public), the scheduling step
    // between scoring and packing. Difficulty = lexical diversity
    // (distinct/total words — the ta_quality-verified exact stat),
    // quantized into 4 fixed buckets (fixed thresholds, not
    // quantiles: quantile cuts are engine- and sample-dependent;
    // fixed cuts are bit-portable and stable as the corpus grows).
    // Order within each of 8 hash shards = (bucket asc, FNV-64 of a
    // seeded doc key, doc_id) — every shard is its own easy→hard
    // curriculum, so distributed readers consume shards in parallel
    // with NO global sort (the pipe_shuffle rule: a global
    // row_number serializes the corpus through one task). Intra-
    // bucket order is a seeded deterministic shuffle — no rand(),
    // task retries re-deal nothing, changing the seed re-deals every
    // bucket. Oracle: same stats, same FNV, same per-shard window.
    QueryDef.sql(
      "pipe_curriculum", {
        import OracleSql._
        val k = toSigned(fnv1a64Unsigned("'cur42:' || CAST(doc_id AS VARCHAR)"))
        s"""WITH d AS (
           |  SELECT doc_id, doc_id % 8 AS shard,
           |    CAST(LEAST(3, FLOOR(CAST(LEN(list_distinct(${tokens("text")})) AS DOUBLE)
           |      / LEN(${tokens("text")}) * 4)) AS INT) AS bucket,
           |    $k AS k
           |  FROM documents
           |)
           |SELECT doc_id, shard, bucket,
           |  CAST(row_number() OVER (PARTITION BY shard
           |    ORDER BY bucket, k, doc_id) AS BIGINT) AS pos_in_shard
           |FROM d ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      // same regex whitespace tokenizer as pipe_full / ta_quality — the
      // lexical-diversity bucket must be the one stat, not two variants
      val toks = tokens(col("text"))
      val ld = size(array_distinct(toks)).cast("double") / size(toks)
      val k = graft.functions.TextExpressions.fnv64(
        concat(lit("cur42:"), col("doc_id").cast("string")))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
          least(lit(3L), floor(ld * 4)).cast("int").as("bucket"), k.as("k"))
        .withColumn("pos_in_shard", row_number()
          .over(Window.partitionBy("shard").orderBy("bucket", "k", "doc_id"))
          .cast("long"))
        .select(col("doc_id"), col("shard"), col("bucket"), col("pos_in_shard"))
        .orderBy("doc_id")
    },

    // pipe_full (round 8): the COMPOSED modern pipeline — every stage
    // verified alone elsewhere, threaded end-to-end here exactly as a
    // production corpus build runs them: Gopher FORMAT rules (the
    // word-count/word-length/symbol/alpha subset — the stopword rule
    // is an English-corpus gate and the synthetic corpus is word
    // salad, so applying it would truthfully empty the pipeline;
    // ta_gopher reports all rules) → exact dedup (min-doc keeper per
    // normalized hash) → MinHash J≥0.8 near-dedup with star-contracted
    // clusters (keeper = component min) → FNV split → per-(split,
    // shard) easy→hard curriculum positions. Scale shape: each stage
    // keeps its own audited plan (scan-local filter, hash-agg dedup,
    // banded LSH, O(log n) contraction, window per shard) — composing
    // them adds joins on doc_id keys only, never a new O(pairs)
    // stage. The oracle replays all five stages in ONE DuckDB
    // statement (recursive closure + FNV + window), so the composed
    // keep/split/order decisions hash-match end-to-end.
    QueryDef.sql(
      "pipe_full", {
        import OracleSql._
        val splitKey = fnv1a64Unsigned("'full42:' || CAST(doc_id AS VARCHAR)")
        val curKey = toSigned(fnv1a64Unsigned("'cur42full:' || CAST(doc_id AS VARCHAR)"))
        s"""WITH RECURSIVE fdoc AS (
           |  SELECT doc_id, text FROM (
           |    SELECT doc_id, text, ${tokens("text")} AS toks FROM documents)
           |  WHERE LEN(toks) BETWEEN 50 AND 100000
           |    AND CAST(list_sum(list_transform(toks, t -> LENGTH(t))) AS DOUBLE)
           |      / LEN(toks) BETWEEN 3.0 AND 10.0
           |    AND CAST(LEN(regexp_extract_all(text, '#'))
           |      + LEN(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE) / LEN(toks) < 0.1
           |    AND CAST(LEN(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
           |      / LEN(toks) > 0.8
           |), ex AS (
           |  SELECT MIN(doc_id) AS doc_id FROM (
           |    SELECT doc_id, MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS h
           |    FROM fdoc)
           |  GROUP BY h
           |), uq AS (
           |  SELECT f.doc_id, f.text FROM fdoc f JOIN ex USING (doc_id)
           |), ftoks AS (
           |  SELECT doc_id, ${tokens("text")} AS t FROM uq
           |), shf AS (
           |  SELECT doc_id, ${shingles3("t")} AS sh FROM ftoks
           |), ${minhashBandCtes("shf", 64, 4)}, cand AS (
           |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
           |  FROM bk a JOIN bk b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
           |), edges AS (
           |  SELECT c.a, c.b FROM cand c
           |  JOIN shf x ON x.doc_id = c.a
           |  JOIN shf y ON y.doc_id = c.b
           |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
           |    / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.8
           |), bidir AS (
           |  SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges
           |), reach AS (
           |  SELECT DISTINCT a AS doc_id, a AS root FROM bidir
           |  UNION
           |  SELECT e.b AS doc_id, r.root FROM reach r JOIN bidir e ON e.a = r.doc_id
           |), cc AS (
           |  SELECT doc_id, MIN(root) AS cluster_id FROM reach GROUP BY doc_id
           |), surv AS (
           |  SELECT u.doc_id, u.text FROM uq u LEFT JOIN cc ON cc.doc_id = u.doc_id
           |  WHERE cc.cluster_id IS NULL OR cc.cluster_id = u.doc_id
           |), cur AS (
           |  SELECT doc_id,
           |    CASE WHEN CAST($splitKey % 64 AS BIGINT) <= 51 THEN 'train'
           |         WHEN CAST($splitKey % 64 AS BIGINT) <= 57 THEN 'val'
           |         ELSE 'test' END AS split,
           |    doc_id % 8 AS shard,
           |    CAST(LEAST(3, FLOOR(CAST(LEN(list_distinct(${tokens("text")})) AS DOUBLE)
           |      / LEN(${tokens("text")}) * 4)) AS INT) AS bucket,
           |    $curKey AS k
           |  FROM surv
           |)
           |SELECT doc_id, split, shard, bucket,
           |  CAST(row_number() OVER (PARTITION BY split, shard
           |    ORDER BY bucket, k, doc_id) AS BIGINT) AS pos_in_shard
           |FROM cur ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      import graft.operators.{DedupOps, TextOps}
      val docs = Tables.load(s, dir, "documents")
      val format = TextOps.gopherQuality(docs)
        .filter(col("r_words") === 1 && col("r_wordlen") === 1 &&
          col("r_symbol") === 1 && col("r_alpha") === 1)
        .select("doc_id")
      val clean = docs.join(format, "doc_id")
      val keepers = DedupOps.exactGroups(clean)
        .select(col("keeper_doc_id").as("doc_id"))
      val uniq = clean.join(keepers, "doc_id")
      val pairs = DedupOps.minhashPairs(uniq, 64, 4).filter(col("jaccard") >= 0.8)
      val clusters = DedupOps.duplicateClusters(pairs)
        .select(col("doc_id"), col("cluster_id"))
      val surv = uniq.join(clusters, Seq("doc_id"), "left")
        .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      val b = pmod(graft.functions.TextExpressions.fnv64(
        concat(lit("full42:"), col("doc_id").cast("string"))), lit(64))
      val toks = tokens(col("text"))
      val ld = size(array_distinct(toks)).cast("double") / size(toks)
      val curK = graft.functions.TextExpressions.fnv64(
        concat(lit("cur42full:"), col("doc_id").cast("string")))
      surv
        .withColumn("b", b)
        .select(col("doc_id"),
          when(col("b") <= 51, "train").when(col("b") <= 57, "val")
            .otherwise("test").as("split"),
          (col("doc_id") % 8).as("shard"),
          least(lit(3L), floor(ld * 4)).cast("int").as("bucket"),
          curK.as("k"))
        .withColumn("pos_in_shard", row_number()
          .over(Window.partitionBy("split", "shard").orderBy("bucket", "k", "doc_id"))
          .cast("long"))
        .select(col("doc_id"), col("split"), col("shard"), col("bucket"),
          col("pos_in_shard"))
        .orderBy("doc_id")
    }
  )
}
