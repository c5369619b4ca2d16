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

    // ta39: language ID via the stopword heuristic (rows-only: the
    // argmax is graft-specific). Reports prediction vs label.
    QueryDef.rowsOnly("ta_langid") { (s, dir) =>
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
    // expression (codegen'd). Groups by fingerprint to show the dedup
    // use; fingerprints are graft-defined → rows-only.
    QueryDef.rowsOnly("ta_fingerprint") { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          rolling_hash(normText(col("text"))).as("fingerprint"),
          rolling_hash(col("source")).as("source_fp"))
        .orderBy("doc_id")
    }
  )
}
