package graft.queries

import org.apache.spark.sql.SparkSession
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

  private val LshBits = 6
  private val LshTables = 8

  private def topK(s: SparkSession, dir: String, useLsh: Boolean) = {
    val base = Tables.load(s, dir, "embeddings")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
    // persisted: bkeys feed both the corpus and query sides of one
    // action. Not unpersisted (lazy result) - callers that loop should
    // clearCache between runs, as Bench/Verify do.
    val vecs = if (useLsh)
      base.withColumn("bkeys",
        hyperplaneBucketKeys(col("embedding"), LshBits, LshTables)).persist()
    else base
    val joined = if (useLsh) {
      // candidates: share ANY of the multi-table bucket keys. The
      // multi-bucket dedup runs on bare (query_id, vec_id) id pairs —
      // embeddings and norms are re-attached AFTER the distinct, so
      // the shuffle moves two longs per candidate, not two vectors.
      val corpusKeys = vecs.select(col("vec_id"), explode(col("bkeys")).as("bkey"))
      val queryKeys = vecs.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), explode(col("bkeys")).as("q_bkey"))
      val candIds = corpusKeys.join(broadcast(queryKeys),
          col("bkey") === col("q_bkey") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"))
        .distinct() // a pair sharing several tables counts once
      val queries = vecs.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"))
      candIds
        .join(vecs.select(col("vec_id"), col("embedding"), col("nrm")), "vec_id")
        .join(broadcast(queries), "query_id")
    } else {
      val queries = vecs.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"))
      vecs.crossJoin(broadcast(queries)).filter(col("vec_id") =!= col("query_id"))
    }
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    joined
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineFromDot(dot(col("embedding"), col("q_emb")), col("nrm"), col("q_nrm")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
  }

  val all: Seq[QueryDef] = Seq(

    // ann37: brute-force cosine top-k — the exact baseline. The query
    // side is tiny and broadcast; the corpus side streams through one
    // narrow scan, so the cost is one pass over the data per batch of
    // queries (the right plan at any scale when queries ≪ corpus).
    // Oracle-checkable: dot/norm are left-fold double accumulations in
    // array order on both engines (see TextFunctions.dot), so cosines
    // are bit-identical and the top-k cut agrees exactly.
    QueryDef.sql(
      "ann_bruteforce",
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings
         |), n AS (
         |  SELECT vec_id, e,
         |    sqrt(list_reduce(list_transform(e, x -> x*x), (a,b) -> a+b)) AS nrm
         |  FROM v
         |), p AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CASE WHEN c.nrm = 0 OR q.nrm = 0 THEN 0.0
         |         ELSE list_reduce(list_transform(range(1, len(c.e)+1), i -> c.e[i] * q.e[i]),
         |                (a,b) -> a+b) / (c.nrm * q.nrm) END AS cosine
         |  FROM n c, n q
         |  WHERE q.vec_id < $NumQueries AND c.vec_id <> q.vec_id
         |)
         |SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS "rank"
         |FROM (SELECT *, row_number() OVER
         |        (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
         |      FROM p)
         |WHERE rk <= $K ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      topK(s, dir, useLsh = false).orderBy("query_id", "rank")
    },

    // ann38: multi-table LSH ANN — the scale path. 8 independent
    // 6-bit hyperplane tables: each query probes 8 buckets (~12% of
    // the corpus here), exact cosine only on candidates; misses decay
    // exponentially in the table count. ann_recall quantifies the
    // trade (≈0.31 recall@10 on these unstructured random embeddings
    // vs 0.06 single-table — real embedding clusters fare far better).
    // At 100 TB this (or IVF centroids) is the difference between one
    // full pass per query batch and a few bucket lookups.
    QueryDef.rowsOnly("ann_lsh") { (s, dir) =>
      topK(s, dir, useLsh = true).orderBy("query_id", "rank")
    },

    // ann52: recall@K of the LSH path against the exact baseline —
    // the number that justifies (or vetoes) the approximate index at
    // scale. |LSH-top-K ∩ exact-top-K| / K per query + macro average.
    QueryDef.rowsOnly("ann_recall") { (s, dir) =>
      val exact = topK(s, dir, useLsh = false)
        .select(col("query_id"), col("neighbor_id"))
      val approx = topK(s, dir, useLsh = true)
        .select(col("query_id").as("a_query"), col("neighbor_id").as("a_neighbor"))
      // persisted: hits feeds both union branches, and its lineage
      // holds the expensive exact+LSH pipelines
      val hits = exact.join(approx,
          col("query_id") === col("a_query") && col("neighbor_id") === col("a_neighbor"),
          "left")
        .groupBy("query_id")
        .agg((count(col("a_neighbor")).cast("double") / K).as("recall_at_k"))
        .persist()
      hits.select(col("query_id"), col("recall_at_k"))
        .unionAll(hits.agg(lit(-1L).as("query_id"),
          (sum(Det.dec4(col("recall_at_k"))).cast("double") / count(lit(1))).as("recall_at_k")))
        .orderBy("query_id")
    }
  )
}
