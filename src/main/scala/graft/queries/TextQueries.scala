package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TextExpressions.rolling_hash
import graft.functions.TextFunctions._

/** SURVEY.md §2c — text analysis + exact dedup over `documents`.
  * These are the per-document scoring passes of a training-data
  * pipeline: embarrassingly parallel scans, no shuffle except final
  * ordering (which exists only for the determinism of the verify dump).
  */
object TextQueries {

  val all: Seq[QueryDef] = Seq(

    // dd32: exact dedup via normalize→hash→group. MD5 is identical in
    // Spark and DuckDB, so the full pipeline is SQL-oracle-checkable.
    // At scale: hash-shuffle on a 32-char key, map-side pre-aggregated.
    QueryDef.sql(
      "dd_exact",
      """SELECT MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS text_hash,
        |  COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
        |FROM documents
        |GROUP BY 1 ORDER BY text_hash""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(md5(normText(col("text"))).as("text_hash"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_doc_id"))
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
      val toks = split(col("text"), " ")
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"), col("n_chars"),
          size(toks).as("n_words"),
          (col("n_chars").cast("double") / size(toks)).as("chars_per_word"),
          size(array_distinct(toks)).as("n_unique_words"),
          (size(array_distinct(toks)).cast("double") / size(toks)).as("lexical_diversity"))
        .orderBy("doc_id")
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
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).as("ws_tokens"),
          regexp_count(col("text"), lit("[a-z0-9]+")).as("re_tokens"),
          ceil(length(col("text")) / 4.0).cast("bigint").as("bpe_est"))
        .orderBy("doc_id")
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
      val toks = tokens(col("text"))
      Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("lang"),
          langPredict(toks).as("lang_pred"),
          stopwordRatio(toks, "en").as("en_score"))
        .withColumn("agree", (col("lang") === col("lang_pred")).cast("int"))
        .orderBy("doc_id")
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
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          rolling_hash(normText(col("text"))).as("fingerprint"),
          rolling_hash(col("source")).as("source_fp"))
        .orderBy("doc_id")
    }
  )
}
