package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** DataFrame-level similarity-search operators (SURVEY.md §2c
  * ann37/38/52/53) — the library surface behind the ANN queries.
  *
  * Input contract: a corpus DataFrame with `vec_id` (long) and
  * `embedding` (array<float|double>); queries are the `numQueries`
  * lowest vec_ids. All top-k outputs share the shape
  * (query_id, neighbor_id, cosine, rank).
  */
object AnnOps {

  /** (vec_id, embedding, nrm), repartitioned for CPU-heavy per-row
    * stages and persisted — callers running several methods (recall
    * eval) thread ONE base through all of them instead of re-scanning.
    * Not unpersisted (lazy results) — loops should clearCache between
    * runs, as Bench/Verify do. */
  def prep(vecs: DataFrame): DataFrame =
    vecs.repartition(vecs.sparkSession.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
      .persist()

  private def rankTopK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    pairs
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineFromDot(dot(col("embedding"), col("q_emb")), col("nrm"), col("q_nrm")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  private def queriesOf(base: DataFrame, numQueries: Int): DataFrame =
    base.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))

  /** Brute-force cosine top-k — the exact baseline. The query side is
    * tiny and broadcast; the corpus streams through one narrow scan,
    * so the cost is one pass over the data per query batch (the right
    * plan at any scale when queries ≪ corpus). `base` from [[prep]]. */
  def bruteforceTopK(base: DataFrame, numQueries: Int, k: Int): DataFrame = {
    val queries = queriesOf(base, numQueries)
    rankTopK(
      base.crossJoin(broadcast(queries)).filter(col("vec_id") =!= col("query_id")), k)
  }

  /** Multi-table random-hyperplane LSH top-k — candidates share ANY of
    * the `tables` bucket keys; exact cosine only on candidates. Only
    * the NARROW (vec_id, bucket-keys) projection is persisted — base
    * already caches the vectors. The multi-bucket dedup runs on bare
    * (query_id, vec_id) id pairs; embeddings and norms re-attach from
    * base AFTER the distinct, so the shuffle moves two longs per
    * candidate, not two vectors. */
  def lshTopK(base: DataFrame, bits: Int, tables: Int,
      numQueries: Int, k: Int): DataFrame = {
    val keys = base.select(col("vec_id"),
      hyperplaneBucketKeys(col("embedding"), bits, tables).as("bkeys")).persist()
    val corpusKeys = keys.select(col("vec_id"), explode(col("bkeys")).as("bkey"))
    val queryKeys = keys.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), explode(col("bkeys")).as("q_bkey"))
    val candIds = corpusKeys.join(broadcast(queryKeys),
        col("bkey") === col("q_bkey") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct() // a pair sharing several tables counts once
    rankTopK(
      candIds
        .join(base.select(col("vec_id"), col("embedding"), col("nrm")), "vec_id")
        .join(broadcast(queriesOf(base, numQueries)), "query_id"), k)
  }

  /** IVF (inverted-file) top-k: spherical k-means centroids, then each
    * query searches only its `nprobe` nearest clusters.
    *
    * Deterministic by construction: init = the first `ivfK` vectors by
    * vec_id; per-dimension means go through exact floor-scaled integer
    * sums (order-independent), so centroids are identical run-to-run
    * regardless of shuffle order. The Lloyd loop is driver-side but
    * each step is one distributed aggregation pass — assignment is the
    * per-row native [[graft.functions.NearestCentroid]] projection
    * over the plan-shipped k×dim centroid matrix, so nothing corpus-
    * sized ever reaches the driver. */
  def ivfTopK(rawBase: DataFrame, ivfK: Int, iters: Int, nprobe: Int,
      scale: Double, numQueries: Int, k: Int): DataFrame = {
    // The Lloyd loop below runs `iters` sequential distributed
    // aggregations over the corpus: if the caller handed us an
    // unpersisted frame, every iteration would re-scan the source.
    // [[prep]] already persists; this guard makes the operator
    // self-sufficient for direct library callers too. The init
    // collect() right after is the materializing action, so iterations
    // 1..iters aggregate in-memory columnar batches.
    val base =
      if (rawBase.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        rawBase.persist()
      else rawBase
    val s = base.sparkSession
    import s.implicits._

    def centroidDf(cents: Seq[(Int, Seq[Double])]) =
      cents.toDF("cluster", "c_emb")
        .select(col("cluster"), col("c_emb"), l2norm(col("c_emb")).as("c_nrm"))

    def nearest(cents: Seq[(Int, Seq[Double])]) =
      graft.functions.TextExpressions.nearest_centroid(
        col("embedding"), cents.map(_._1), cents.map(_._2))

    var cents: Seq[(Int, Seq[Double])] = base.filter(col("vec_id") < ivfK)
      .orderBy("vec_id")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble)))
      .toSeq
    val dim = cents.head._2.length
    for (_ <- 1 to iters) {
      // deterministic means via exact integer sums: each element is
      // floor-scaled to a long (2^24 keeps float precision), summed
      // order-independently, divided once in double — reproducible in
      // the DuckDB oracle with no decimal rounding-mode edge cases.
      val sums = (0 until dim).map(i =>
        sum(floor(element_at(col("embedding"), i + 1).cast("double") * scale)).as(s"s$i"))
      cents = base
        .groupBy(nearest(cents).as("cluster"))
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .collect()
        .map { r =>
          val n = r.getAs[Long]("cnt")
          (r.getAs[Int]("cluster"),
            (0 until dim).map(i => r.getLong(i + 2) / (n * scale)).toSeq)
        }
        .toSeq.sortBy(_._1)
    }

    val assigned = base.withColumn("cluster", nearest(cents)).persist()
    // probe list: each query's nprobe nearest centroids
    val wq = Window.partitionBy("query_id").orderBy(col("ccos").desc, col("cluster"))
    val probes = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      .crossJoin(broadcast(centroidDf(cents)))
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cluster"),
        cosineFromDot(dot(col("q_emb"), col("c_emb")), col("q_nrm"), col("c_nrm")).as("ccos"))
      .withColumn("prn", row_number().over(wq))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cluster"))
    // exact cosine only within probed clusters
    rankTopK(
      assigned.join(broadcast(probes), Seq("cluster"))
        .filter(col("vec_id") =!= col("query_id")), k)
  }

  /** recall@K of an approximate method against the exact baseline:
    * per-query rows plus a macro-average row (query_id = -1). */
  def recallAtK(method: String, exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val hits = exact.join(
        approx.select(col("query_id").as("a_query"), col("neighbor_id").as("a_neighbor")),
        col("query_id") === col("a_query") && col("neighbor_id") === col("a_neighbor"),
        "left")
      .groupBy("query_id")
      .agg((count(col("a_neighbor")).cast("double") / k).as("recall_at_k"))
      .persist()
    // exact DECIMAL(18,4) sum -> deterministic macro average across
    // shuffle orders (the operators package must not reach back into
    // the query harness, so the cast is spelled here directly)
    hits.select(lit(method).as("method"), col("query_id"), col("recall_at_k"))
      .unionAll(hits.agg(lit(method).as("method"), lit(-1L).as("query_id"),
        (sum(col("recall_at_k").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double") / count(lit(1))).as("recall_at_k")))
  }
}
