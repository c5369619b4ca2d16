package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextExpressions.rolling_hash
import graft.functions.TextFunctions._

/** DataFrame-level text-analysis operators (SURVEY.md §2c ta39-ta42)
  * — per-document scoring passes of a training-data pipeline:
  * embarrassingly parallel scans, no shuffle. Input contract:
  * `doc_id` + `text` (plus `lang`/`n_chars` where noted). */
object TextOps {

  /** Quality stats: length/word/char-class counts + ratios (requires
    * `n_chars`). */
  def quality(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs.select(
      col("doc_id"), col("n_chars"),
      size(toks).as("n_words"),
      (col("n_chars").cast("double") / size(toks)).as("chars_per_word"),
      size(array_distinct(toks)).as("n_unique_words"),
      (size(array_distinct(toks)).cast("double") / size(toks)).as("lexical_diversity"))
  }

  /** Token counting: whitespace tokens, regex word tokens, chars/4
    * BPE-count heuristic. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z0-9]+")).as("re_tokens"),
      ceil(length(col("text")) / 4.0).cast("bigint").as("bpe_est"))

  /** Language ID via the stopword heuristic; reports prediction vs the
    * `lang` label plus the English score. */
  def langid(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("lang"),
        langPredict(toks).as("lang_pred"),
        stopwordRatio(toks, "en").as("en_score"))
      .withColumn("agree", (col("lang") === col("lang_pred")).cast("int"))
  }

  /** Rolling-hash document fingerprints (normalized text + source). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      rolling_hash(normText(col("text"))).as("fingerprint"),
      rolling_hash(col("source")).as("source_fp"))
}
