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

  val all: Seq[QueryDef] = Seq(
    QueryDef.rowsOnly("pipe_e2e") { (s, dir) =>
      val toks = tokens(col("text"))
      val docs = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("n_words", size(toks))
        .withColumn("diversity", size(array_distinct(toks)).cast("double") / size(toks))
        .filter(col("n_words") >= 20 && col("diversity") > 0.2) // quality gate
        .withColumn("lang_pred", langPredict(toks))
        .withColumn("sh", array_distinct(shingleHashes(toks, 3)))
        .withColumn("sig", minhashSignature(col("sh"), 64))
        .withColumn("bands", minhashBands(col("sig"), 64, 4))
        .persist()

      // near-dup pairs via band buckets, verified at Jaccard >= 0.8
      val exploded = docs.select(col("doc_id"), explode(col("bands")).as("bkey"))
      val pairs = exploded.as("l")
        .join(exploded.as("r"),
          col("l.bkey") === col("r.bkey") && col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .distinct()
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
    }
  )
}
