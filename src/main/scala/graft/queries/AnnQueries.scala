package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.AnnOps

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

  private val IvfK = 32      // centroids
  private val IvfIters = 3   // Lloyd iterations
  private val IvfProbe = 4   // clusters searched per query
  private val IvfScale = 16777216.0 // 2^24: float-exact mean scaling

  private val SqLevels = 256 // int8 scalar-quantization grid

  private val PqM = 4        // subspaces
  private val PqKsub = 16    // centroids per subspace codebook
  private val PqIters = 2    // Lloyd iterations per subspace
  private val RefineShortlist = 30 // ADC shortlist size for ann_refine

  // Thin wrappers over the DataFrame-level library operators
  // (graft.operators.AnnOps) with this module's fixed parameters.
  private def prepBase(s: SparkSession, dir: String) =
    AnnOps.prep(Tables.load(s, dir, "embeddings"))
  private def topK(base: org.apache.spark.sql.DataFrame, useLsh: Boolean) =
    if (useLsh) AnnOps.lshTopK(base, LshBits, LshTables, NumQueries, K)
    else AnnOps.bruteforceTopK(base, NumQueries, K)
  private def ivfTopK(base: org.apache.spark.sql.DataFrame) =
    AnnOps.ivfTopK(base, IvfK, IvfIters, IvfProbe, IvfScale, NumQueries, K)
  private def recallOf(method: String, exact: org.apache.spark.sql.DataFrame,
      approx: org.apache.spark.sql.DataFrame) =
    // every approx frame here is a per-query top-K cut: ≤ NumQueries·K
    // rows — the statically-known bound the broadcast gate prices
    AnnOps.recallAtK(method, exact, approx, K,
      approxRowsHint = NumQueries.toLong * K)

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
      ivfTopK(prepBase(s, dir)).orderBy("query_id", "rank")
    },

    // ann79 (round 5): product quantization — the memory-bound ANN
    // path. The corpus compresses to 4 codebook indices per vector
    // (4 bytes vs 256 for the raw floats); queries score via
    // asymmetric distance (exact query subvector vs assigned centroid
    // per subspace, summed in fixed order). Codebooks are
    // driver-side constants shipped in the plan, encoding and ADC are
    // scan-local projections — at 100 TB the vectors themselves never
    // shuffle, only the per-query top-k cut does. Oracle-checked
    // END-TO-END: all 4 per-subspace k-means (first-ksub init, L2
    // lowest-tie assignment, floor-scaled integer means) are unrolled
    // in DuckDB, so even the learned codebooks hash-match.
    QueryDef.sql(
      "ann_pq",
      s"""WITH ${OracleSql.annBaseCtes},
         |${OracleSql.annPqCtes("pqk", PqM, PqKsub, PqIters, NumQueries, K, IvfScale.toLong)}
         |SELECT * FROM pqk ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      AnnOps.pqTopK(prepBase(s, dir), PqM, PqKsub, PqIters, IvfScale, NumQueries, K)
        .orderBy("query_id", "rank")
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
        .unionAll(recallOf("ivf", exact, ivfTopK(base)))
        .orderBy("method", "query_id")
    },

    // ann98 (round 5): recall@K of the PQ path against the exact
    // baseline — completes the eval family (ann_recall covers
    // LSH/IVF). PQ trades recall for 64× memory compression; this is
    // the number that says whether the trade held. Same per-query +
    // macro-average (query_id = -1) shape, same composed-oracle
    // discipline: bf and the full unrolled PQ pipeline run in one
    // DuckDB statement.
    QueryDef.sql(
      "ann_pq_recall", {
        s"""WITH ${OracleSql.annBaseCtes},
           |${OracleSql.annBruteforceCtes("bf", NumQueries, K)},
           |${OracleSql.annPqCtes("pqk", PqM, PqKsub, PqIters, NumQueries, K, IvfScale.toLong)},
           |r_pq AS MATERIALIZED (
           |  SELECT e.query_id, CAST(COUNT(a.neighbor_id) AS DOUBLE) / $K AS recall_at_k
           |  FROM bf e LEFT JOIN pqk a
           |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
           |  GROUP BY e.query_id
           |)
           |SELECT 'pq' AS method, query_id, recall_at_k FROM r_pq
           |UNION ALL
           |SELECT 'pq', CAST(-1 AS BIGINT),
           |  CAST(SUM(CAST(recall_at_k AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
           |FROM r_pq
           |ORDER BY method, query_id""".stripMargin
      }) { (s, dir) =>
      val base = prepBase(s, dir)
      val exact = topK(base, useLsh = false)
        .select(col("query_id"), col("neighbor_id"))
      recallOf("pq", exact,
          AnnOps.pqTopK(base, PqM, PqKsub, PqIters, IvfScale, NumQueries, K))
        .orderBy("method", "query_id")
    },

    // ann_refine (round 7): two-stage serving — PQ ADC shortlist
    // (Shortlist=30, compressed domain, raw vectors never shuffle)
    // then EXACT cosine re-rank of only the shortlist pairs. The
    // production ANN architecture: memory-bound index does the cut,
    // exact math runs on O(S·Q) pairs independent of corpus size.
    // Oracle composes the full unrolled PQ pipeline with a cosine
    // re-rank join in one DuckDB statement.
    QueryDef.sql(
      "ann_refine",
      s"""WITH ${OracleSql.annBaseCtes},
         |${OracleSql.annPqCtes("pqs", PqM, PqKsub, PqIters, NumQueries, RefineShortlist, IvfScale.toLong)},
         |rrp AS (
         |  SELECT s.query_id, s.neighbor_id,
         |    ${OracleSql.cosine("c.e", "q.e", "c.nrm", "q.nrm")} AS cosine
         |  FROM pqs s
         |  JOIN n c ON c.vec_id = s.neighbor_id
         |  JOIN n q ON q.vec_id = s.query_id
         |), ${OracleSql.topkCte("rrp", "rfk", K)}
         |SELECT * FROM rfk ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      AnnOps.pqRefineTopK(prepBase(s, dir), PqM, PqKsub, PqIters, IvfScale,
          NumQueries, RefineShortlist, K)
        .orderBy("query_id", "rank")
    },

    // ann_sq (round 8): SCALAR quantization — the other standard
    // compressed-domain ANN path, completing the quantization family
    // (PQ = 96× compression via codebooks, SQ8 = 4× via a
    // per-dimension uniform grid). The grid trains in ONE
    // order-independent MIN/MAX pass (2·dim doubles to the driver);
    // encoding and asymmetric midpoint-dequantization scoring are
    // scan-local projections against plan-shipped grid literals, so at
    // 100 TB the corpus is scanned once for training and once per
    // query batch, and only the per-query top-k cut shuffles.
    // Oracle-checked end-to-end: MIN/MAX, clamped floor codes, and the
    // left-fold squared-L2 replay exactly in DuckDB.
    QueryDef.sql(
      "ann_sq",
      s"""WITH ${OracleSql.annBaseCtes},
         |${OracleSql.annSqCtes("sqk", SqLevels, NumQueries, K)}
         |SELECT * FROM sqk ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      AnnOps.sqTopK(prepBase(s, dir), SqLevels, NumQueries, K)
        .orderBy("query_id", "rank")
    },

    // ann_sq_recall (round 8): recall@K of the SQ8 path against the
    // exact baseline — the number that justifies the 4× memory cut.
    // Expected near-exact (each dimension keeps 256 levels of its own
    // range), vs PQ's lossier 96× trade measured by ann_pq_recall:
    // together they map the compression/recall frontier. Same
    // composed-oracle discipline as the other recall evals.
    QueryDef.sql(
      "ann_sq_recall", {
        s"""WITH ${OracleSql.annBaseCtes},
           |${OracleSql.annBruteforceCtes("bf", NumQueries, K)},
           |${OracleSql.annSqCtes("sqk", SqLevels, NumQueries, K)},
           |r_sq AS MATERIALIZED (
           |  SELECT e.query_id, CAST(COUNT(a.neighbor_id) AS DOUBLE) / $K AS recall_at_k
           |  FROM bf e LEFT JOIN sqk a
           |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
           |  GROUP BY e.query_id
           |)
           |SELECT 'sq' AS method, query_id, recall_at_k FROM r_sq
           |UNION ALL
           |SELECT 'sq', CAST(-1 AS BIGINT),
           |  CAST(SUM(CAST(recall_at_k AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
           |FROM r_sq
           |ORDER BY method, query_id""".stripMargin
      }) { (s, dir) =>
      val base = prepBase(s, dir)
      val exact = topK(base, useLsh = false)
        .select(col("query_id"), col("neighbor_id"))
      recallOf("sq", exact, AnnOps.sqTopK(base, SqLevels, NumQueries, K))
        .orderBy("method", "query_id")
    },

    // ann_ivfpq (round 8): IVF+PQ — the COMPOSED production ANN
    // architecture (IVFADC, Jegou '11; the standard big-corpus
    // design): the k-means coarse quantizer cuts the search to
    // nprobe/ivfK of the corpus, and inside the probed lists
    // candidates score by PQ asymmetric distance in the compressed
    // domain. Memory = m codes + a cluster id per vector; raw vectors
    // appear nowhere after indexing — at 100 TB this is the only ANN
    // shape here whose per-query cost AND memory both shrink with the
    // index. The coarse loop is ann_ivf's and the codebooks are
    // ann_pq's (both already hash-verified); the oracle composes the
    // two unrolled pipelines and the probe cut in one statement, so
    // even the composed learned index is hash-compared end-to-end.
    QueryDef.sql(
      "ann_ivfpq",
      s"""WITH ${OracleSql.annBaseCtes},
         |${OracleSql.annIvfPqCtes("ipqk", IvfK, IvfIters, IvfProbe,
             PqM, PqKsub, PqIters, NumQueries, K, IvfScale.toLong)}
         |SELECT * FROM ipqk ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      AnnOps.ivfPqTopK(prepBase(s, dir), IvfK, IvfIters, IvfProbe,
          PqM, PqKsub, PqIters, IvfScale, NumQueries, K)
        .orderBy("query_id", "rank")
    },

    // ann_ivfpq_recall (round 8): recall@K of the composed IVF+PQ path
    // — completes the eval family (lsh/ivf in ann_recall, pq, sq, and
    // now the composed index). The delta vs ann_pq_recall isolates
    // what the IVF CUT loses on top of code quantization — the number
    // that prices nprobe at 100 TB. Same composed-oracle discipline:
    // bf + both unrolled learned stages + the probe cut in one DuckDB
    // statement.
    QueryDef.sql(
      "ann_ivfpq_recall", {
        s"""WITH ${OracleSql.annBaseCtes},
           |${OracleSql.annBruteforceCtes("bf", NumQueries, K)},
           |${OracleSql.annIvfPqCtes("ipqk", IvfK, IvfIters, IvfProbe,
               PqM, PqKsub, PqIters, NumQueries, K, IvfScale.toLong)},
           |r_ivfpq AS MATERIALIZED (
           |  SELECT e.query_id, CAST(COUNT(a.neighbor_id) AS DOUBLE) / $K AS recall_at_k
           |  FROM bf e LEFT JOIN ipqk a
           |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
           |  GROUP BY e.query_id
           |)
           |SELECT 'ivfpq' AS method, query_id, recall_at_k FROM r_ivfpq
           |UNION ALL
           |SELECT 'ivfpq', CAST(-1 AS BIGINT),
           |  CAST(SUM(CAST(recall_at_k AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
           |FROM r_ivfpq
           |ORDER BY method, query_id""".stripMargin
      }) { (s, dir) =>
      val base = prepBase(s, dir)
      val exact = topK(base, useLsh = false)
        .select(col("query_id"), col("neighbor_id"))
      recallOf("ivfpq", exact,
          AnnOps.ivfPqTopK(base, IvfK, IvfIters, IvfProbe,
            PqM, PqKsub, PqIters, IvfScale, NumQueries, K))
        .orderBy("method", "query_id")
    }
  )
}
