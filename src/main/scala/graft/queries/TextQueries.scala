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
    }
  )
}
