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

  /** (vec_id, embedding, nrm), repartitioned for CPU-heavy per-row
    * stages and persisted — ann_recall threads ONE base through the
    * exact, LSH and IVF pipelines instead of re-scanning per method.
    * Not unpersisted (lazy results) — callers that loop should
    * clearCache between runs, as Bench/Verify do. */
  private def prepBase(s: SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
      .persist()

  private def topK(base: org.apache.spark.sql.DataFrame, useLsh: Boolean) = {
    val queries = base.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val joined = if (useLsh) {
      // candidates: share ANY of the multi-table bucket keys. Only the
      // NARROW (vec_id, bkeys) projection is persisted — base already
      // caches the vectors, a second vector copy would double the
      // executor storage. The multi-bucket dedup runs on bare
      // (query_id, vec_id) id pairs; embeddings and norms are
      // re-attached from base AFTER the distinct, so the shuffle moves
      // two longs per candidate, not two vectors.
      val keys = base.select(col("vec_id"),
        hyperplaneBucketKeys(col("embedding"), LshBits, LshTables).as("bkeys")).persist()
      val corpusKeys = keys.select(col("vec_id"), explode(col("bkeys")).as("bkey"))
      val queryKeys = keys.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), explode(col("bkeys")).as("q_bkey"))
      val candIds = corpusKeys.join(broadcast(queryKeys),
          col("bkey") === col("q_bkey") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"))
        .distinct() // a pair sharing several tables counts once
      candIds
        .join(base.select(col("vec_id"), col("embedding"), col("nrm")), "vec_id")
        .join(broadcast(queries), "query_id")
    } else {
      base.crossJoin(broadcast(queries)).filter(col("vec_id") =!= col("query_id"))
    }
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    joined
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineFromDot(dot(col("embedding"), col("q_emb")), col("nrm"), col("q_nrm")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
  }

  private val IvfK = 32      // centroids
  private val IvfIters = 3   // Lloyd iterations
  private val IvfProbe = 4   // clusters searched per query
  private val IvfScale = 16777216.0 // 2^24: float-exact mean scaling

  /** IVF (inverted-file) ANN: spherical k-means centroids, then each
    * query searches only its `IvfProbe` nearest clusters.
    *
    * Deterministic by construction: init = the first `IvfK` vectors by
    * vec_id; per-dimension means go through exact floor-scaled integer
    * sums (order-independent), so centroids are identical run-to-run
    * regardless of shuffle order. The Lloyd loop is driver-side but each step is a
    * distributed assign (broadcast k×dim centroids, one corpus pass) +
    * aggregate — at 100 TB this is the textbook layout: only the k×dim
    * centroid table ever leaves the executors.
    */
  private def ivfTopK(s: SparkSession, base: org.apache.spark.sql.DataFrame) = {
    import s.implicits._

    def centroidDf(cents: Seq[(Int, Seq[Double])]) =
      cents.toDF("cluster", "c_emb")
        .select(col("cluster"), col("c_emb"), l2norm(col("c_emb")).as("c_nrm"))

    // assignment: nearest (max-cosine) centroid, ties to the larger
    // cluster id — a per-row native projection (NearestCentroid), so
    // each Lloyd iteration is ONE aggregation over the persisted base:
    // no crossJoin blow-up, no per-vector argmax shuffle.
    def nearest(cents: Seq[(Int, Seq[Double])]) =
      graft.functions.TextExpressions.nearest_centroid(
        col("embedding"), cents.map(_._1), cents.map(_._2))

    var cents: Seq[(Int, Seq[Double])] = base.filter(col("vec_id") < IvfK)
      .orderBy("vec_id")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble)))
      .toSeq
    val dim = cents.head._2.length // one job saved: init collect has it
    for (_ <- 1 to IvfIters) {
      // deterministic means via exact integer sums: each element is
      // floor-scaled to a long (2^24 keeps float precision), summed
      // order-independently, divided once in double. One groupBy with
      // `dim` sum columns (no positional explode shuffle), and every
      // step is reproducible in the DuckDB oracle (floor/sum/divide of
      // identical exact values — no decimal rounding-mode edge cases).
      val sums = (0 until dim).map(i =>
        sum(floor(element_at(col("embedding"), i + 1).cast("double")
          * IvfScale)).as(s"s$i"))
      cents = base
        .groupBy(nearest(cents).as("cluster"))
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .collect()
        .map { r =>
          val n = r.getAs[Long]("cnt")
          (r.getAs[Int]("cluster"),
            (0 until dim).map(i => r.getLong(i + 2) / (n * IvfScale)).toSeq)
        }
        .toSeq.sortBy(_._1)
    }

    val assigned = base.withColumn("cluster", nearest(cents)).persist()
    // probe list: each query's IvfProbe nearest centroids
    val wq = Window.partitionBy("query_id").orderBy(col("ccos").desc, col("cluster"))
    val probes = assigned.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      .crossJoin(broadcast(centroidDf(cents)))
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cluster"),
        cosineFromDot(dot(col("q_emb"), col("c_emb")), col("q_nrm"), col("c_nrm")).as("ccos"))
      .withColumn("prn", row_number().over(wq))
      .filter(col("prn") <= IvfProbe)
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cluster"))
    // exact cosine only within probed clusters
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineFromDot(dot(col("embedding"), col("q_emb")), col("nrm"), col("q_nrm")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
  }

  /** recall@K of an approximate method against the exact baseline. */
  private def recallOf(method: String, exact: org.apache.spark.sql.DataFrame,
      approx: org.apache.spark.sql.DataFrame) = {
    val hits = exact.join(
        approx.select(col("query_id").as("a_query"), col("neighbor_id").as("a_neighbor")),
        col("query_id") === col("a_query") && col("neighbor_id") === col("a_neighbor"),
        "left")
      .groupBy("query_id")
      .agg((count(col("a_neighbor")).cast("double") / K).as("recall_at_k"))
      .persist()
    hits.select(lit(method).as("method"), col("query_id"), col("recall_at_k"))
      .unionAll(hits.agg(lit(method).as("method"), lit(-1L).as("query_id"),
        (sum(Det.dec4(col("recall_at_k"))).cast("double") / count(lit(1))).as("recall_at_k")))
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
      s"""WITH ${OracleSql.annBaseCtes},
         |${OracleSql.annBruteforceCtes("bf", NumQueries, K)}
         |SELECT * FROM bf ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      topK(prepBase(s, dir), useLsh = false).orderBy("query_id", "rank")
    },

    // ann38: multi-table LSH ANN — the scale path. 8 independent
    // 6-bit hyperplane tables: each query probes 8 buckets (~12% of
    // the corpus here), exact cosine only on candidates; misses decay
    // exponentially in the table count. ann_recall quantifies the
    // trade (≈0.31 recall@10 on these unstructured random embeddings
    // vs 0.06 single-table — real embedding clusters fare far better).
    // At 100 TB this (or IVF centroids) is the difference between one
    // full pass per query batch and a few bucket lookups.
    // Oracle-checked: the plane matrix is deterministic, so the oracle
    // embeds the same coefficients as literals and replays bucketing,
    // candidate generation, and the exact-cosine top-k bit-for-bit.
    QueryDef.sql(
      "ann_lsh",
      s"""WITH ${OracleSql.annBaseCtes},
         |${OracleSql.annLshCtes("lshq", LshBits, LshTables, NumQueries, K)}
         |SELECT * FROM lshq ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      topK(prepBase(s, dir), useLsh = true).orderBy("query_id", "rank")
    },

    // ann53: IVF (k-means inverted file) ANN — the scale path for
    // CLUSTERED embedding spaces: nprobe/k of the corpus searched per
    // query instead of LSH's union-of-buckets. Oracle-checked: the
    // deterministic k-means loop is UNROLLED in the oracle SQL
    // (first-k init, max-(cos, cluster) assignment, floor-scaled
    // integer mean sums), so even the learned index is hash-compared.
    QueryDef.sql(
      "ann_ivf",
      s"""WITH ${OracleSql.annBaseCtes},
         |${OracleSql.annIvfCtes("ivfk", IvfK, IvfIters, IvfProbe, NumQueries, K, IvfScale.toLong)}
         |SELECT * FROM ivfk ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      ivfTopK(s, prepBase(s, dir)).orderBy("query_id", "rank")
    },

    // ann52: recall@K of each approximate path (LSH, IVF) against the
    // exact baseline — the number that justifies (or vetoes) an
    // approximate index at scale. |approx-top-K ∩ exact-top-K| / K per
    // query + per-method macro average (query_id = -1). Oracle-checked
    // by composing the three verified pipelines in one SQL statement.
    QueryDef.sql(
      "ann_recall", {
        def recallSql(method: String, rel: String) =
          s"""r_$method AS MATERIALIZED (
             |  SELECT e.query_id, CAST(COUNT(a.neighbor_id) AS DOUBLE) / $K AS recall_at_k
             |  FROM bf e LEFT JOIN $rel a
             |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
             |  GROUP BY e.query_id
             |)""".stripMargin
        def rows(method: String) =
          s"""SELECT '$method' AS method, query_id, recall_at_k FROM r_$method
             |UNION ALL
             |SELECT '$method', CAST(-1 AS BIGINT),
             |  CAST(SUM(CAST(recall_at_k AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
             |FROM r_$method""".stripMargin
        s"""WITH ${OracleSql.annBaseCtes},
           |${OracleSql.annBruteforceCtes("bf", NumQueries, K)},
           |${OracleSql.annLshCtes("lshq", LshBits, LshTables, NumQueries, K)},
           |${OracleSql.annIvfCtes("ivfk", IvfK, IvfIters, IvfProbe, NumQueries, K, IvfScale.toLong)},
           |${recallSql("lsh", "lshq")},
           |${recallSql("ivf", "ivfk")}
           |${rows("lsh")}
           |UNION ALL
           |${rows("ivf")}
           |ORDER BY method, query_id""".stripMargin
      }) { (s, dir) =>
      // one shared scan+norm base across all three pipelines;
      // persisted exact feeds both per-method joins, and its lineage
      // holds the expensive brute-force pipeline
      val base = prepBase(s, dir)
      val exact = topK(base, useLsh = false)
        .select(col("query_id"), col("neighbor_id")).persist()
      recallOf("lsh", exact, topK(base, useLsh = true))
        .unionAll(recallOf("ivf", exact, ivfTopK(s, base)))
        .orderBy("method", "query_id")
    }
  )
}
