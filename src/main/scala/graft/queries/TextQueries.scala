package graft.queries

import graft.engine.Tables
import graft.functions.TextFunctions.stopwords
import graft.operators.TextOps

/** SURVEY.md §2c — text analysis + exact dedup over `documents`.
  * These are the per-document scoring passes of a training-data
  * pipeline: embarrassingly parallel scans, no shuffle except final
  * ordering (which exists only for the determinism of the verify dump).
  */
object TextQueries {

  val all: Seq[QueryDef] = Seq(

    // ta59: deterministic stratified sampling — the pipeline op behind
    // "downsample the dominant language to a quota". Hash-threshold
    // sampling (FNV-1a of the doc id, unsigned mod 1000 vs a per-lang
    // quota) is reproducible across runs/engines — unlike rand()-based
    // sampleBy — so the exact kept set is hash-checked against the
    // oracle's HUGEINT replay. Scan-only, embarrassingly parallel.
    QueryDef.sql(
      "ta_sample",
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |    CAST(${OracleSql.fnv1a64Unsigned("CAST(doc_id AS VARCHAR)")} % 1000 AS BIGINT) AS bucket
         |  FROM documents
         |)
         |SELECT doc_id, lang, bucket FROM h
         |WHERE bucket < CASE WHEN lang = 'en' THEN 300 ELSE 800 END
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      // signed fnv64 -> unsigned mod: u = s + 2^64 when s < 0, and
      // 2^64 mod 1000 = 616, so u%1000 = pmod(pmod(s,1000) + 616·[s<0], 1000)
      val h = graft.functions.TextExpressions.fnv64(col("doc_id").cast("string"))
      val bucket = pmod(pmod(h, lit(1000)) + when(h < 0, 616).otherwise(0), lit(1000))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), bucket.as("bucket"))
        .filter(col("bucket") < when(col("lang") === "en", 300).otherwise(800))
        .orderBy("doc_id")
    },

    // ta74 (round 4): domain mixing — resample the corpus to a TARGET
    // source mixture (the "data mixing" step before training). Unlike
    // ta_sample's fixed quotas, the per-source keep-thresholds are
    // DERIVED from corpus statistics: scale = min_s(count_s/share_s)
    // is the largest total the targets allow without oversampling any
    // source; keep_frac_s = share_s*scale/count_s. Fully declarative —
    // the per-source count table (bounded by #sources) broadcasts back
    // onto the scan; the driver never sees data. Same FNV-threshold
    // determinism as ta_sample. The double arithmetic is spelled with
    // the SAME parse tree in both engines (IEEE ops are deterministic
    // given identical structure).
    QueryDef.sql(
      "ta_domain_mix",
      s"""WITH h AS (
         |  SELECT doc_id, source,
         |    CAST(${OracleSql.fnv1a64Unsigned("CAST(doc_id AS VARCHAR)")} % 1000 AS BIGINT) AS bucket
         |  FROM documents
         |), counts AS (
         |  SELECT source, COUNT(*) AS n,
         |    CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 1
         |      THEN 3.0 ELSE 1.0 END AS wt
         |  FROM documents GROUP BY source
         |), tot AS (SELECT SUM(wt) AS wsum FROM counts),
         |sc AS (SELECT MIN(n / (wt / wsum)) AS scale FROM counts, tot),
         |th AS (
         |  SELECT source,
         |    CAST(FLOOR(((1000.0 * (wt / wsum)) * scale) / n) AS BIGINT) AS thresh
         |  FROM counts, tot, sc
         |)
         |SELECT h.doc_id, h.source, h.bucket, th.thresh
         |FROM h JOIN th USING (source)
         |WHERE h.bucket < th.thresh
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val docs = Tables.load(s, dir, "documents")
      val hh = graft.functions.TextExpressions.fnv64(col("doc_id").cast("string"))
      val bucket = pmod(pmod(hh, lit(1000)) + when(hh < 0, 616).otherwise(0), lit(1000))
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
        .withColumn("wt",
          when(substring(col("source"), 4, 10).cast("int") % 2 === 1, 3.0).otherwise(1.0))
      val tot = counts.agg(sum("wt").as("wsum"))
      val sc = counts.crossJoin(tot)
        .agg(min(col("n") / (col("wt") / col("wsum"))).as("scale"))
      val th = counts.crossJoin(tot).crossJoin(sc)
        .select(col("source"),
          floor(lit(1000.0) * (col("wt") / col("wsum")) * col("scale") / col("n"))
            .cast("long").as("thresh"))
      docs.select(col("doc_id"), col("source"), bucket.as("bucket"))
        .join(broadcast(th), "source")
        .filter(col("bucket") < col("thresh"))
        .select("doc_id", "source", "bucket", "thresh")
        .orderBy("doc_id")
    },

    // dd32: exact dedup via normalize→hash→group. MD5 is identical in
    // Spark and DuckDB, so the full pipeline is SQL-oracle-checkable.
    // At scale: hash-shuffle on a 32-char key, map-side pre-aggregated.
    QueryDef.sql(
      "dd_exact",
      """SELECT MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS text_hash,
        |  COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
        |FROM documents
        |GROUP BY 1 ORDER BY text_hash""".stripMargin) { (s, dir) =>
      graft.operators.DedupOps.exactGroups(Tables.load(s, dir, "documents"))
        .orderBy("text_hash")
    },

    // ta40: quality scoring — length/word/char-class stats + ratios.
    QueryDef.sql(
      "ta_quality",
      """SELECT doc_id, n_chars,
        |  LEN(string_split(text, ' ')) AS n_words,
        |  CAST(n_chars AS DOUBLE) / LEN(string_split(text, ' ')) AS chars_per_word,
        |  LEN(list_distinct(string_split(text, ' '))) AS n_unique_words,
        |  CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / LEN(string_split(text, ' ')) AS lexical_diversity
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextOps.quality(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // ta_gopher (round 8): the Gopher quality-filter rules (Rae et
    // al. '21 appendix A1.1 — published public constants): word-count
    // and mean-word-length bounds, symbol-to-word ratio, bullet /
    // ellipsis line fractions, alphabetic-word fraction, and the
    // required-stopword count, plus the conjunctive keep/drop flag.
    // The first pass of every large-corpus pipeline: one scan, zero
    // shuffles/explodes (audited in PlanAuditSpec), all stats exact
    // integer folds + single double divisions so the oracle replays
    // them bit-for-bit.
    QueryDef.sql(
      "ta_gopher", {
        val stopCases = Seq("the", "be", "to", "of", "and", "that", "have", "with")
          .map(w => s"(CASE WHEN list_contains(toks, '$w') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH g AS (
           |  SELECT doc_id, text,
           |    ${OracleSql.tokens("text")} AS toks,
           |    string_split(text, chr(10)) AS lines
           |  FROM documents
           |), st AS (
           |  SELECT doc_id,
           |    CAST(LEN(toks) AS INT) AS n_words,
           |    CAST(list_sum(list_transform(toks, t -> LENGTH(t))) AS DOUBLE)
           |      / LEN(toks) AS mean_word_len,
           |    CAST(LEN(regexp_extract_all(text, '#'))
           |      + LEN(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
           |      / LEN(toks) AS symbol_ratio,
           |    CAST(LEN(list_filter(lines, l -> substr(l, 1, 1) IN ('-', '*', '•'))) AS DOUBLE)
           |      / LEN(lines) AS bullet_frac,
           |    CAST(LEN(list_filter(lines, l -> ends_with(l, '...') OR ends_with(l, '…'))) AS DOUBLE)
           |      / LEN(lines) AS ellipsis_frac,
           |    CAST(LEN(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
           |      / LEN(toks) AS alpha_frac,
           |    CAST($stopCases AS INT) AS stop_hits
           |  FROM g
           |)
           |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
           |  ellipsis_frac, alpha_frac, stop_hits,
           |  CAST(n_words BETWEEN 50 AND 100000 AS INT) AS r_words,
           |  CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS INT) AS r_wordlen,
           |  CAST(symbol_ratio < 0.1 AS INT) AS r_symbol,
           |  CAST(bullet_frac < 0.9 AS INT) AS r_bullet,
           |  CAST(ellipsis_frac < 0.3 AS INT) AS r_ellipsis,
           |  CAST(alpha_frac > 0.8 AS INT) AS r_alpha,
           |  CAST(stop_hits >= 2 AS INT) AS r_stop,
           |  CAST(n_words BETWEEN 50 AND 100000 AS INT)
           |    * CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS INT)
           |    * CAST(symbol_ratio < 0.1 AS INT)
           |    * CAST(bullet_frac < 0.9 AS INT)
           |    * CAST(ellipsis_frac < 0.3 AS INT)
           |    * CAST(alpha_frac > 0.8 AS INT)
           |    * CAST(stop_hits >= 2 AS INT) AS passes
           |FROM st ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      TextOps.gopherQuality(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // ta41: token counting — whitespace tokens, regex word tokens, and
    // the chars/4 BPE-count heuristic.
    QueryDef.sql(
      "ta_tokens",
      """SELECT doc_id,
        |  LEN(string_split(text, ' ')) AS ws_tokens,
        |  LEN(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens,
        |  CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS bpe_est
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextOps.tokenCounts(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // ta80 (round 5): unigram-LM surprisal scoring — the "score every
    // document under a corpus language model" quality pass (the CCNet
    // recipe filters on LM perplexity), trained on the corpus itself in
    // the same plan. Scored in the INTEGER log2 domain: ln() is not
    // IEEE-correctly-rounded (JVM and DuckDB can disagree in the last
    // ulp, which a hash compare would catch), but a count's MSB
    // position — floor(log2 c) = length(bin(c)) - 1 — is exact
    // everywhere, so per-token surprisal (floor(log2 N) −
    // floor(log2 C(w))) bits sums as a BIGINT. The 100 TB shape:
    // vocab counts and per-doc word multisets are map-side-combined
    // aggregations; the score join is keyed by word on the
    // doc-DISTINCT multiset (never per-token occurrences), and the
    // vocab — data-derived, unbounded — is JOINED, never broadcast.
    // Only the 1-row corpus total broadcasts.
    QueryDef.sql(
      "ta_lm",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${OracleSql.tokens("text")}) AS w FROM documents
         |),
         |dw AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS k FROM toks GROUP BY doc_id, w),
         |cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks)
         |SELECT dw.doc_id,
         |  CAST(SUM(k) AS BIGINT) AS n_tokens,
         |  CAST(SUM(k * (LENGTH(bin(n)) - LENGTH(bin(c)))) AS BIGINT) AS surprisal_bits,
         |  CAST(MIN(c) AS BIGINT) AS min_count,
         |  CAST(SUM(CASE WHEN c <= 2 THEN k ELSE 0 END) AS BIGINT) AS rare_tokens
         |FROM dw JOIN cnt USING (w), tot
         |GROUP BY dw.doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextOps.lmScore(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // ta104 (round 5): conditional bigram-LM surprisal — ta_lm's
    // unigram model upgraded to the conditional form CCNet-class
    // filters actually use (KenLM n-grams): Σ −log₂ c(prev,w)/c(prev)
    // per doc, in the same cross-engine-exact integer floor-log2
    // domain. Count tables joined (unbounded, never broadcast);
    // bigrams built by a per-doc lag window, no positional self-join.
    QueryDef.sql(
      "ta_bigram_lm",
      s"""WITH toks AS (
         |  SELECT doc_id, ${OracleSql.tokens("text")} AS ws FROM documents
         |),
         |pos AS (
         |  SELECT doc_id, unnest(ws) AS w,
         |    unnest(range(1, len(ws) + 1)) AS p
         |  FROM toks WHERE len(ws) >= 2
         |),
         |bif AS (
         |  SELECT doc_id, prev, w FROM (
         |    SELECT doc_id, w, p,
         |      lag(w) OVER (PARTITION BY doc_id ORDER BY p) AS prev
         |    FROM pos) WHERE prev IS NOT NULL
         |),
         |db AS (SELECT doc_id, prev, w, CAST(COUNT(*) AS BIGINT) AS k
         |       FROM bif GROUP BY doc_id, prev, w),
         |cb AS (SELECT prev, w, CAST(COUNT(*) AS BIGINT) AS cbi
         |       FROM bif GROUP BY prev, w),
         |cc AS (SELECT prev, CAST(COUNT(*) AS BIGINT) AS cctx
         |       FROM bif GROUP BY prev)
         |SELECT db.doc_id,
         |  CAST(SUM(k) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(k * (LENGTH(bin(cctx)) - LENGTH(bin(cbi)))) AS BIGINT)
         |    AS surprisal_bits,
         |  CAST(MIN(cbi) AS BIGINT) AS min_bigram_count,
         |  CAST(SUM(CASE WHEN cbi <= 2 THEN k ELSE 0 END) AS BIGINT)
         |    AS rare_bigrams
         |FROM db JOIN cb USING (prev, w) JOIN cc USING (prev)
         |GROUP BY db.doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextOps.bigramLmScore(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // ta82 (round 5): TF-IDF keyword extraction — top-3 terms per doc,
    // IDF in the integer log2 domain (floor-log2 via MSB position, same
    // cross-engine-exact trick as ta_lm), ties broken term-ascending so
    // the per-doc argmax hash-matches. The df table is data-derived and
    // unbounded → JOINED by term, never broadcast; the top-k window
    // partitions by doc_id (no global sort).
    QueryDef.sql(
      "ta_tfidf",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${OracleSql.tokens("text")}) AS term FROM documents
         |),
         |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, term),
         |dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
         |SELECT doc_id, rank, term, tf, df, score FROM (
         |  SELECT tf.doc_id, tf.term, tf.tf, dft.df,
         |    CAST(tf.tf * (LENGTH(bin(n_docs)) - LENGTH(bin(df))) AS BIGINT) AS score,
         |    CAST(row_number() OVER (PARTITION BY tf.doc_id
         |      ORDER BY tf.tf * (LENGTH(bin(n_docs)) - LENGTH(bin(df))) DESC, tf.term) AS INT) AS rank
         |  FROM tf JOIN dft USING (term), nd)
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin) { (s, dir) =>
      TextOps.tfidf(Tables.load(s, dir, "documents")).orderBy("doc_id", "rank")
    },

    // ta92 (round 5): winnowing fingerprints (MOSS): k-gram FNV
    // hashes → w-window minima → per-doc fingerprint-set stats. The
    // guarantee (shared substring ≥ w+k−1 tokens ⇒ shared
    // fingerprint) at ~2/(w+1) the index size is the classic overlap-
    // detection primitive. The oracle replays graft's FNV-1a 64
    // byte-for-byte in HUGEINT arithmetic and the same ROWS window.
    QueryDef.sql(
      "ta_winnow", {
        import OracleSql._
        val k = 3; val w = 4
        val gram = (0 until k).map(j => s"w[i+$j]").mkString(" || ' ' || ")
        s"""WITH t AS (
           |  SELECT doc_id, ${tokens("text")} AS w FROM documents
           |), sh AS (
           |  SELECT doc_id,
           |    list_transform(range(1, len(w) - ${k - 2}), i -> $gram) AS s
           |  FROM t WHERE len(w) >= $k
           |), g0 AS (
           |  SELECT doc_id, unnest(range(0, len(s))) AS p, unnest(s) AS gram
           |  FROM sh
           |), g AS (
           |  SELECT doc_id, p, ${toSigned(fnv1a64Unsigned("gram"))} AS h FROM g0
           |), wm AS (
           |  SELECT doc_id, p,
           |    count(*) OVER (PARTITION BY doc_id) AS n_grams,
           |    min(h) OVER (PARTITION BY doc_id ORDER BY p
           |                 ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS wmin
           |  FROM g
           |)
           |SELECT doc_id, CAST(max(n_grams) AS BIGINT) AS n_grams,
           |  CAST(count(*) AS BIGINT) AS n_windows,
           |  CAST(count(DISTINCT wmin) AS BIGINT) AS n_fingerprints,
           |  CAST(min(wmin) AS BIGINT) AS min_fp,
           |  CAST(max(wmin) AS BIGINT) AS max_fp
           |FROM wm WHERE p <= n_grams - $w
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      TextOps.winnow(Tables.load(s, dir, "documents"), k = 3, w = 4)
        .orderBy("doc_id")
    },

    // ta89 (round 5): one BPE merge round — the core tokenizer-
    // training step: corpus-weighted adjacent character-pair counts,
    // the most frequent pair being what a BPE trainer merges next.
    // The corpus collapses to (word, count) before pair explosion, so
    // the heavy stage runs over the DISTINCT vocab (work scales with
    // vocab, not corpus); top-k is (count desc, pair asc) — a total
    // order, deterministic LIMIT in both engines.
    QueryDef.sql(
      "ta_bpe",
      s"""WITH w AS (
         |  SELECT unnest(${OracleSql.tokens("text")}) AS word FROM documents
         |), wc AS (
         |  SELECT word, count(*) AS wc FROM w GROUP BY word
         |), p AS (
         |  SELECT wc, unnest(list_transform(range(1, length(word)),
         |    i -> word[i:i+1])) AS pair
         |  FROM wc WHERE length(word) >= 2
         |)
         |SELECT pair, CAST(sum(wc) AS BIGINT) AS n_occurrences
         |FROM p GROUP BY pair
         |ORDER BY n_occurrences DESC, pair LIMIT 20""".stripMargin) { (s, dir) =>
      TextOps.bpePairs(Tables.load(s, dir, "documents"), topK = 20)
    },

    // ta39: language ID via the stopword heuristic. Each per-lang score
    // is one exact-int division, so the argmax (score desc, then
    // lexically-largest lang — Spark's struct array_max order) is
    // reproducible in the oracle as a UNION ALL + QUALIFY row_number.
    QueryDef.sql(
      "ta_langid", {
        val scoreCols = stopwords.keys.toSeq.sorted.map(l =>
          s"${OracleSql.stopwordScore("toks", stopwords(l))} AS s_$l").mkString(",\n    ")
        val unions = stopwords.keys.toSeq.sorted.map(l =>
          s"SELECT doc_id, lang, s_en, '$l' AS cand, s_$l AS score FROM sc").mkString("\n  UNION ALL ")
        s"""WITH t AS (
           |  SELECT doc_id, lang, ${OracleSql.tokens("text")} AS toks FROM documents
           |), sc AS (
           |  SELECT doc_id, lang,
           |    $scoreCols
           |  FROM t
           |), c AS (
           |  $unions
           |)
           |SELECT doc_id, lang, cand AS lang_pred, s_en AS en_score,
           |  CAST(lang = cand AS INT) AS agree
           |FROM c
           |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand DESC) = 1
           |ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      TextOps.langid(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // ta65 (round 4): repetition-based quality scoring (Gopher rules):
    // duplicate-bigram fraction + top-word fraction per document. The
    // top-word count is explode -> two map-side-combined aggregations
    // (shuffle keys bounded by doc count, robust to megabyte docs);
    // bigram stats stay scan-only. Divisions are int/int in double —
    // bit-exact across engines.
    QueryDef.sql(
      "ta_repetition",
      s"""WITH t AS (
         |  SELECT doc_id, ${OracleSql.tokens("text")} AS w FROM documents
         |), bs AS (
         |  SELECT doc_id,
         |    CASE WHEN len(w) >= 2
         |      THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
         |      ELSE CAST([] AS VARCHAR[]) END AS b
         |  FROM t
         |), bi AS (
         |  SELECT doc_id, CAST(len(b) AS BIGINT) AS n_bigrams,
         |    CAST(len(list_distinct(b)) AS BIGINT) AS n_dist
         |  FROM bs
         |), wc AS (
         |  SELECT doc_id, unnest(w) AS word FROM t
         |), c AS (
         |  SELECT doc_id, word, count(*) AS c FROM wc GROUP BY 1, 2
         |), tp AS (
         |  SELECT doc_id, max(c) AS max_c, CAST(sum(c) AS BIGINT) AS n_words
         |  FROM c GROUP BY 1
         |)
         |SELECT tp.doc_id, tp.n_words,
         |  CAST(tp.max_c AS DOUBLE) / tp.n_words AS top_word_frac,
         |  bi.n_bigrams,
         |  CASE WHEN bi.n_bigrams = 0 THEN 0.0
         |    ELSE CAST(bi.n_bigrams - bi.n_dist AS DOUBLE) / bi.n_bigrams
         |  END AS dup_bigram_frac
         |FROM tp JOIN bi USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextOps.repetition(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // ta66 (round 4): PII detection + redaction. The synthetic corpus
    // carries no PII, so the fixture plants emails/phones closed-form
    // in doc_id (every third doc) — the same encode-then-parse
    // roundtrip discipline as mm_decode — and the md5 of the REDACTED
    // text is hash-compared, so the replacement itself is verified,
    // not just the match counts. Patterns are spelled to mean the same
    // thing in Java regex and RE2 (char classes only).
    QueryDef.sql(
      "ta_pii", {
        val aug = "CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || " +
          "CAST(doc_id AS VARCHAR) || '@example.com call 555-' || " +
          "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE text END"
        s"""WITH a AS (
           |  SELECT doc_id, $aug AS aug FROM documents
           |)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(aug, '${TextOps.emailRe}')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(aug, '${TextOps.phoneRe}')) AS BIGINT) AS n_phones,
           |  md5(regexp_replace(regexp_replace(aug, '${TextOps.emailRe}', '<EMAIL>', 'g'),
           |    '${TextOps.phoneRe}', '<PHONE>', 'g')) AS redacted_md5
           |FROM a ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val aug = when(pmod(col("doc_id"), lit(3)) === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com call 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
        .otherwise(col("text"))
      TextOps.piiScan(Tables.load(s, dir, "documents"), aug).orderBy("doc_id")
    },

    // ta42: document fingerprint via the native RollingHash Catalyst
    // expression (codegen'd). The oracle replays the wrapping 64-bit
    // byte fold in HUGEINT (see OracleSql.rollingHash) — exact.
    QueryDef.sql(
      "ta_fingerprint",
      s"""WITH d AS (
         |  SELECT doc_id,
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt,
         |    source
         |  FROM documents
         |), h AS (
         |  SELECT doc_id,
         |    hex(encode(nt)) AS thx, octet_length(encode(nt)) AS tbl,
         |    hex(encode(source)) AS shx, octet_length(encode(source)) AS sbl
         |  FROM d
         |)
         |SELECT doc_id,
         |  ${OracleSql.rollingHash(OracleSql.signedBytes("thx", "tbl"))} AS fingerprint,
         |  ${OracleSql.rollingHash(OracleSql.signedBytes("shx", "sbl"))} AS source_fp
         |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextOps.fingerprint(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // ta_entropy (round 7): character-distribution entropy — the
    // "text vs line noise" quality signal (random/compressed blobs max
    // it out, boilerplate repetition minimizes it). All statistics in
    // the exact integer floor-log2 domain (ta_lm's trick): ⌊log2 c⌋ =
    // MSB position = LENGTH(bin(c))-1, entropy numerator
    // n·⌊log2 n⌋ − Σ cᵢ·⌊log2 cᵢ⌋ summed as BIGINT. graft computes the
    // whole per-doc histogram in ONE codegen'd scan pass (native
    // CharEntropyStats expression — no explode, no shuffle); the
    // oracle must explode to char rows and aggregate, which is exactly
    // the fact-×-chars shape the expression avoids at 100 TB.
    QueryDef.sql(
      "ta_entropy",
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents WHERE length(text) > 0
        |),
        |cc AS (
        |  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM chars GROUP BY doc_id, ch
        |)
        |SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS n_chars,
        |  CAST(COUNT(*) AS BIGINT) AS distinct_chars,
        |  CAST(SUM(c * (LENGTH(bin(c)) - 1)) AS BIGINT) AS sum_c_log2c,
        |  CAST(SUM(c) * (LENGTH(bin(CAST(SUM(c) AS BIGINT))) - 1)
        |       - SUM(c * (LENGTH(bin(c)) - 1)) AS BIGINT) AS entropy_bits_floor
        |FROM cc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      Tables.load(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          graft.functions.TextExpressions.char_entropy(col("text")).as("e"))
        .select(col("doc_id"), col("e.n_chars"), col("e.distinct_chars"),
          col("e.sum_c_log2c"), col("e.entropy_bits_floor"))
        .orderBy("doc_id")
    },

    // ta_cms_topk (round 7): COUNT-MIN SKETCH heavy hitters —
    // completes the sketch family (q30 HLL cardinality, dd_bloom
    // membership, now CMS frequency). The sketch is d=4 × w=512
    // counters built by ONE map-side-combined aggregation over the
    // token stream (the 100 TB shape: counter cells, not terms, bound
    // the state); estimates come from joining the DISTINCT terms back
    // to the tiny sketch (broadcast) and taking min over the d rows —
    // the classic CMS upper bound, so est >= exact always. Hash rows
    // use graft's FNV-1a with row-seed prefixes; the oracle replays
    // the byte fold in HUGEINT and the whole sketch in SQL. Output:
    // top-20 terms by exact count with their CMS estimates (exact
    // ties broken by term).
    QueryDef.sql(
      "ta_cms_topk", {
        val d = 4; val w = 512
        val tok = OracleSql.tokens("text")
        def bucket(row: Int) =
          s"CAST(${OracleSql.fnv1a64Unsigned(s"concat('cms$row:', w)")} % $w AS BIGINT)"
        val bucketRows = (0 until d)
          .map(r => s"SELECT $r AS hrow, w, ${bucket(r)} AS bucket FROM terms")
          .mkString(" UNION ALL ")
        s"""WITH toks AS (
           |  SELECT unnest($tok) AS w FROM documents
           |),
           |terms AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS exact_n FROM toks GROUP BY w),
           |tb AS MATERIALIZED ($bucketRows),
           |sketch AS MATERIALIZED (
           |  SELECT hrow, bucket, CAST(SUM(exact_n) AS BIGINT) AS cnt
           |  FROM tb JOIN terms USING (w) GROUP BY hrow, bucket
           |),
           |est AS (
           |  SELECT tb.w, CAST(MIN(s.cnt) AS BIGINT) AS cms_est
           |  FROM tb JOIN sketch s ON s.hrow = tb.hrow AND s.bucket = tb.bucket
           |  GROUP BY tb.w
           |)
           |SELECT t.w AS term, t.exact_n, e.cms_est
           |FROM terms t JOIN est e ON e.w = t.w
           |ORDER BY t.exact_n DESC, t.w LIMIT 20""".stripMargin
      }) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val d = 4; val w = 512
      val toks = Tables.load(s, dir, "documents")
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      // exact per-term counts (one map-side-combined aggregation);
      // reused by the sketch build so the token stream scans ONCE
      val terms = toks.groupBy("w").agg(count(lit(1)).as("exact_n")).persist()
      def bucketCol(row: Int) =
        pmod(graft.functions.TextExpressions.fnv64(
          concat(lit(s"cms$row:"), col("w"))), lit(w.toLong))
      // every term contributes its count to one cell per hash row
      val tb = terms.select(col("w"), col("exact_n"),
          explode(array((0 until d).map(r =>
            struct(lit(r).as("hrow"), bucketCol(r).as("bucket"))): _*)).as("hb"))
        .select(col("w"), col("exact_n"), col("hb.hrow"), col("hb.bucket"))
      val sketch = tb.groupBy("hrow", "bucket")
        .agg(sum("exact_n").as("cnt"))           // d×w cells, tiny
      val est = tb.join(broadcast(sketch), Seq("hrow", "bucket"))
        .groupBy("w").agg(min("cnt").as("cms_est"))
      terms.join(est, "w")
        .select(col("w").as("term"), col("exact_n"), col("cms_est"))
        .orderBy(col("exact_n").desc, col("term"))
        .limit(20)
    }
  )
}
