package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}
import graft.functions.TextExpressions._
import graft.functions.TextFunctions._

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-pipe-test")
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("rolling_hash matches reference implementation and is stable") {
    val got = Seq("hello", "", "a b c").toDF("t")
      .select(rolling_hash(col("t"))).as[Long].collect()
    val want = Seq("hello", "", "a b c").map(s =>
      graft.functions.RollingHash.hashBytes(s.getBytes("UTF-8")))
    assert(got.toSeq == want)
    // codegen and interpreted paths agree
    val doc = Tables.load(spark, dir, "documents").limit(50)
    val viaExpr = doc.select(col("doc_id"), rolling_hash(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaScala = doc.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> graft.functions.RollingHash.hashBytes(r.getString(1).getBytes("UTF-8"))).toMap
    assert(viaExpr == viaScala)
  }

  test("simhash: identical token arrays → identical sig; similar → close") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("b", "the quick brown fox jumps over the lazy dog"),
      ("c", "the quick brown fox leaps over the lazy dog"),
      ("d", "completely different words here entirely unrelated stuff")
    ).toDF("id", "t").select(col("id"), simhash64(split(col("t"), " ")).as("sig"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m("a"), m("c")) < ham(m("a"), m("d")),
      s"similar docs should be closer: ${ham(m("a"), m("c"))} vs ${ham(m("a"), m("d"))}")
  }

  test("minhash approximates jaccard") {
    val df = Seq(
      ("x", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      ("y", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 zz")
    ).toDF("id", "t")
      .select(col("id"), array_distinct(shingleHashes(tokens(col("t")), 3)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), 128))
    val rows = df.collect().map(r => r.getString(0) ->
      (r.getSeq[Long](1).toSet, r.getSeq[Long](2))).toMap
    val (shX, sigX) = rows("x"); val (shY, sigY) = rows("y")
    val trueJ = shX.intersect(shY).size.toDouble / shX.union(shY).size
    val estJ = sigX.zip(sigY).count { case (a, b) => a == b }.toDouble / 128
    assert(math.abs(trueJ - estJ) < 0.15, s"true=$trueJ est=$estJ")
  }

  test("dedup operators find the planted near-duplicates at sf0.001") {
    // the corpus contains high-jaccard pairs (verified at sf0.01);
    // here just assert structure + determinism of the top-pairs output
    val r1 = SparkEntry.queries("dd_minhash_lsh")(spark, dir).collect()
    val r2 = SparkEntry.queries("dd_minhash_lsh")(spark, dir).collect()
    assert(r1.nonEmpty)
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq, "must be deterministic")
    r1.foreach(r => assert(r.getLong(0) < r.getLong(1), "pairs canonicalized a<b"))
  }

  test("cosine helpers: dot/norm against hand computation") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 0.0f))).toDF("a", "b")
    val r = df.select(
      dot(col("a"), col("b")).as("d"),
      l2norm(col("a")).as("na"),
      l2norm(col("b")).as("nb")).collect().head
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 3.0 && r.getDouble(2) == 2.0)
  }

  test("ann_bruteforce returns k ranked neighbors per query") {
    val res = SparkEntry.queries("ann_bruteforce")(spark, dir)
      .groupBy("query_id").agg(count(lit(1)).as("n"), max("rank").as("maxr"))
      .collect()
    assert(res.length == 8)
    res.foreach(r => assert(r.getAs[Long]("n") == 10 && r.getAs[Int]("maxr") == 10))
    // ranks ordered by cosine desc within each query
    val one = SparkEntry.queries("ann_bruteforce")(spark, dir)
      .filter(col("query_id") === 0).orderBy("rank").select("cosine").as[Double].collect()
    assert(one.toSeq == one.sortBy(-_).toSeq)
  }

  test("nearest_centroid_l2: argmin by squared L2, ties to lowest id, float+double input") {
    // centroid 5 and centroid 1 are identical → tie at d=0.02 → id 1 wins
    val ids = Seq(5, 2, 1)
    val cents = Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(0.0, 0.0))
    val dbl = Seq(Seq(0.1, 0.1)).toDF("v")
      .select(nearest_centroid_l2(col("v"), ids, cents)).as[Int].collect()
    assert(dbl.toSeq == Seq(1))
    val flt = Seq(Array(0.9f, 0.9f)).toDF("v")
      .select(nearest_centroid_l2(col("v"), ids, cents)).as[Int].collect()
    assert(flt.toSeq == Seq(2), "closest to (1,1) → id 2")
  }

  test("ann_pq: k ranked neighbors per query, adist ascending, deterministic") {
    val df = SparkEntry.queries("ann_pq")(spark, dir)
    val rows = df.collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 8) // sf0.001 has 8 query vectors (same batch as bruteforce)
    byQ.values.foreach { qr =>
      assert(qr.length == 10)
      val ordered = qr.sortBy(_.getAs[Int]("rank"))
      val ad = ordered.map(_.getAs[Double]("adist"))
      assert(ad.forall(_ >= 0.0), "squared-L2 ADC distance is non-negative")
      assert(ad.toSeq == ad.sorted.toSeq, "rank follows ascending adist")
    }
    val again = SparkEntry.queries("ann_pq")(spark, dir).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq,
      "codebook training + encoding must be run-to-run deterministic")
  }

  test("ann_ivfpq: ranked ADC neighbors from probed clusters only, deterministic") {
    val rows = SparkEntry.queries("ann_ivfpq")(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 8)
    byQ.values.foreach { qr =>
      assert(qr.length == 10) // nprobe=4 of 32 lists holds far more than k candidates
      val ad = qr.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("adist"))
      assert(ad.forall(_ >= 0.0))
      assert(ad.toSeq == ad.sorted.toSeq, "rank follows ascending adist")
    }
    // neighbors must come from the query's probed clusters — the IVF
    // cut is real, not decorative: every returned neighbor's ADC pair
    // also exists in the flat-PQ candidate space with the SAME adist
    // (same codebooks), so ivfpq ⊆ pq-scored pairs by construction
    val pqAll = SparkEntry.queries("ann_pq")(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("adist")).toMap
    rows.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      pqAll.get(key).foreach(d => assert(d == r.getAs[Double]("adist"),
        s"ADC distance must agree with flat PQ for $key"))
    }
    val again = SparkEntry.queries("ann_ivfpq")(spark, dir).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq,
      "coarse+fine training must be run-to-run deterministic")
  }

  test("ann_sq: ranked int8-grid neighbors, deterministic, near-exact recall") {
    val rows = SparkEntry.queries("ann_sq")(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 8)
    byQ.values.foreach { qr =>
      assert(qr.length == 10)
      val ad = qr.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("adist"))
      assert(ad.forall(_ >= 0.0))
      assert(ad.toSeq == ad.sorted.toSeq, "rank follows ascending adist")
    }
    val again = SparkEntry.queries("ann_sq")(spark, dir).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq,
      "grid training + encoding must be run-to-run deterministic")
    // SQ8 keeps 256 levels per dimension — recall should be far above
    // PQ's lossy trade; the macro-average row carries query_id = -1
    val recall = SparkEntry.queries("ann_sq_recall")(spark, dir).collect()
      .find(_.getAs[Long]("query_id") == -1L).get.getAs[Double]("recall_at_k")
    assert(recall >= 0.8, s"SQ8 macro recall@10 unexpectedly low: $recall")
  }

  test("ta_gopher: published rule set, hand-computed on crafted docs") {
    import graft.operators.TextOps
    val passing = (Seq.fill(50)("word") ++ Seq("the", "with")).mkString(" ")
    val docs = Seq(
      (0L, passing),                                      // every rule holds
      (1L, "the cat"),                                    // too few words
      (2L, "- item one\n- item two...\n* item three"),    // bullet/ellipsis lines
      (3L, Seq.fill(60)("###").mkString(" "))             // symbols, no alpha
    ).toDF("doc_id", "text")
    val out = TextOps.gopherQuality(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Int]("passes") == 1)
    assert(out(0L).getAs[Int]("n_words") == 52)
    assert(out(0L).getAs[Int]("stop_hits") == 2)
    assert(math.abs(out(0L).getAs[Double]("mean_word_len") - 207.0 / 52) < 1e-12)
    assert(out(1L).getAs[Int]("passes") == 0) // word count below 50
    assert(out(2L).getAs[Double]("bullet_frac") == 1.0)
    assert(math.abs(out(2L).getAs[Double]("ellipsis_frac") - 1.0 / 3) < 1e-12)
    assert(out(2L).getAs[Int]("passes") == 0)
    assert(out(3L).getAs[Double]("symbol_ratio") == 3.0) // every '#' counts
    assert(out(3L).getAs[Double]("alpha_frac") == 0.0)
    assert(out(3L).getAs[Int]("passes") == 0)
  }

  test("pipe_curriculum: per-shard easy→hard order, dense positions, deterministic") {
    val rows = SparkEntry.queries("pipe_curriculum")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    byShard.values.foreach { sr =>
      val ordered = sr.sortBy(_.getAs[Long]("pos_in_shard"))
      // positions are dense 1..n within the shard
      assert(ordered.map(_.getAs[Long]("pos_in_shard")).toSeq ==
        (1L to sr.length).toSeq)
      // the defining curriculum property: difficulty bucket never
      // decreases as the reader advances through the shard
      val buckets = ordered.map(_.getAs[Int]("bucket"))
      assert(buckets.zip(buckets.tail).forall { case (a, b) => a <= b },
        s"bucket order regressed in shard: ${buckets.take(20).mkString(",")}")
    }
    // more than one difficulty bucket is actually populated
    assert(rows.map(_.getAs[Int]("bucket")).distinct.length > 1)
    val again = SparkEntry.queries("pipe_curriculum")(spark, dir).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("pipe_full: composed stages hold their invariants end-to-end") {
    import graft.operators.DedupOps
    val rows = SparkEntry.queries("pipe_full")(spark, dir).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.size == rows.length, "one output row per surviving doc")
    // near-dedup really happened: no surviving pair is J>=0.8 similar
    // (exactly one doc per near-dup component may survive)
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
    val survPairs = DedupOps.minhashPairs(docs, 64, 4)
      .filter(col("jaccard") >= 0.8).count()
    assert(survPairs == 0, s"$survPairs near-dup pairs survived the pipeline")
    // per-(split, shard) curriculum: dense 1..n positions, buckets
    // never regress as the reader advances
    rows.groupBy(r => (r.getAs[String]("split"), r.getAs[Long]("shard")))
      .values.foreach { grp =>
        val ordered = grp.sortBy(_.getAs[Long]("pos_in_shard"))
        assert(ordered.map(_.getAs[Long]("pos_in_shard")).toSeq ==
          (1L to grp.length).toSeq)
        val buckets = ordered.map(_.getAs[Int]("bucket"))
        assert(buckets.zip(buckets.tail).forall { case (a, b) => a <= b })
      }
    val again = SparkEntry.queries("pipe_full")(spark, dir).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("ann_lsh neighbors are a subset of bruteforce candidates' space") {
    val lsh = SparkEntry.queries("ann_lsh")(spark, dir).collect()
    assert(lsh.nonEmpty)
    lsh.foreach(r => assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
  }

  test("mm_metadata: stub decode plumbing has stable schema + checksums") {
    val df = SparkEntry.queries("mm_metadata")(spark, dir)
    assert(df.columns.toSeq ==
      Seq("doc_id", "modality", "byte_len", "checksum") ++ (0 until 8).map(i => s"f$i"))
    val r = df.collect()
    assert(r.length == 500)
    r.take(20).foreach { row =>
      val feats = (0 until 8).map(i => row.getAs[Double](s"f$i"))
      assert(math.abs(feats.sum - 1.0) < 1e-9, "histogram normalized")
      assert(row.getAs[Long]("byte_len") > 0)
      assert(row.getAs[String]("checksum").matches("[0-9a-f]{32}"))
    }
  }

  test("langid predicts only known languages") {
    val langs = SparkEntry.queries("ta_langid")(spark, dir)
      .select("lang_pred").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "zh")))
  }

  test("strideMix: closed-form positions = sort ranks; prefix carries the weight mixture") {
    // sources A..D, weights 1..4, 20 docs each
    val docs = (0 until 80).map { i =>
      (i.toLong, "ABCD" (i % 4).toString, s"text $i")
    }.toDF("doc_id", "source", "text")
    val weights = Map("A" -> 1, "B" -> 2, "C" -> 3, "D" -> 4)
    val got = graft.operators.MixOps.strideMix(docs, weights(_))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    // global_pos is a permutation of 1..n
    assert(got.map(_._4).sorted.toSeq == (1L to 80L).toSeq)
    // closed form == rank from an actual sort of the stride keys
    val p = 12L
    def key(src: String, r: Long) = (2 * r - 1) * (p / weights(src))
    val sorted = got.sortBy(t => (key(t._2, t._3), t._2))
    sorted.zipWithIndex.foreach { case (t, i) =>
      assert(t._4 == i + 1, s"doc ${t._1}: closed form ${t._4} != sort rank ${i + 1}")
    }
    // a full stride period (sum of weights = 10) carries the exact mixture
    val first10 = sorted.take(10).groupBy(_._2).view.mapValues(_.length).toMap
    assert(first10 == Map("A" -> 1, "B" -> 2, "C" -> 3, "D" -> 4))
    // deterministic under repartitioning
    val again = graft.operators.MixOps.strideMix(docs.repartition(13), weights(_))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }
}
