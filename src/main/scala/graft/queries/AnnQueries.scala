package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TextFunctions._

/** SURVEY.md §2c — similarity search over the `embeddings` table
  * (vec_id, embedding array<float>, label).
  *
  * Query set: the 8 lowest vec_ids (a deterministic stand-in for user
  * query vectors). Both operators return (query_id, neighbor_id,
  * cosine, rank) for top-10 neighbors.
  */
object AnnQueries {

  private val NumQueries = 8
  private val K = 10

  val all: Seq[QueryDef] = Seq(

    // ann37: brute-force cosine top-k — the exact baseline. The query
    // side is tiny and broadcast; the corpus side streams through one
    // narrow scan, so the cost is one pass over the data per batch of
    // queries (the right plan at any scale when queries ≪ corpus).
    QueryDef.rowsOnly("ann_bruteforce") { (s, dir) =>
      val vecs = Tables.load(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
      val queries = vecs.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val scored = vecs.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosineFromDot(dot(col("embedding"), col("q_emb")), col("nrm"), col("q_nrm")).as("cosine"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .orderBy("query_id", "rank")
    },

    // ann38: LSH-bucketed ANN — the scale path. 8-bit hyperplane
    // buckets shrink each query's candidate set ~256×; exact cosine
    // only on candidates. Recall < 1 by construction; at 100 TB this
    // (or IVF centroids) is the difference between one pass over
    // everything per query and a bucket lookup.
    QueryDef.rowsOnly("ann_lsh") { (s, dir) =>
      val vecs = Tables.load(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id"), col("embedding"),
          l2norm(col("embedding")).as("nrm"),
          hyperplaneBucket(col("embedding"), 8).as("bucket"))
        .persist()
      val queries = vecs.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"), col("bucket").as("q_bucket"))
      val scored = vecs.join(broadcast(queries),
          col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosineFromDot(dot(col("embedding"), col("q_emb")), col("nrm"), col("q_nrm")).as("cosine"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .orderBy("query_id", "rank")
    }
  )
}
