package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.functions.VecExprs

/** Pins the round-17 fused vector expressions BIT-IDENTICAL to the
  * interpreted higher-order trees they replaced (the determinism
  * contract: every ANN/dedup oracle hash flows through these folds, so
  * "equivalent" is not enough — java.lang.Double.doubleToRawLongBits
  * equality on every row, including the degenerate inputs zip_with /
  * transform handle specially: zero norms, length mismatches, null
  * elements, out-of-codebook codes). */
class VecExpressionsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 4, appName = "graft-vec-test")
  import spark.implicits._

  // deterministic pseudo-random vectors incl. exact-tie and zero rows
  private def fvec(seed: Int, dim: Int): Seq[Float] =
    (0 until dim).map(i => (((seed * 1103515245 + i * 12345) % 1000) / 250.0f))
  private val dim = 16

  private lazy val pairs: DataFrame = {
    val rows = (0 until 40).map { i =>
      (i.toLong, fvec(i, dim), fvec(i * 7 + 3, dim))
    } ++ Seq(
      (100L, Seq.fill(dim)(0.0f), fvec(5, dim)),        // zero vector
      (101L, fvec(2, dim), Seq.fill(dim)(0.0f)),
      (102L, fvec(3, dim), fvec(3, dim)))               // identical
    rows.toDF("id", "a", "b")
  }

  private def bitsEqual(df: DataFrame, cols: (String, String)): Unit = {
    val bad = df.select(col(cols._1), col(cols._2))
      .collect().zipWithIndex.filter { case (r, _) =>
        val x = if (r.isNullAt(0)) null else java.lang.Long.valueOf(
          java.lang.Double.doubleToRawLongBits(r.getDouble(0)))
        val y = if (r.isNullAt(1)) null else java.lang.Long.valueOf(
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
        x != y
      }
    assert(bad.isEmpty, s"bit-mismatched rows: ${bad.take(3).mkString(", ")}")
  }

  test("dot_d == aggregate(zip_with) fold, bit for bit") {
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)
    bitsEqual(pairs.select(hof.as("h"), VecExprs.dot_d(col("a"), col("b")).as("n")),
      ("h", "n"))
  }

  test("dot_d null/missing-element semantics match zip_with padding") {
    val df = Seq(
      (Seq[java.lang.Float](1.0f, null, 3.0f), Seq[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (Seq[java.lang.Float](1.0f, 2.0f, 3.0f), Seq[java.lang.Float](1.0f, 2.0f))
    ).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)
    val rows = df.select(hof.as("h"), VecExprs.dot_d(col("a"), col("b")).as("n")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1), s"expected null==null, got $r")
    }
  }

  test("l2norm_d == sqrt(aggregate) fold, bit for bit") {
    val hof = sqrt(aggregate(col("a"), lit(0.0d),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    bitsEqual(pairs.select(hof.as("h"), VecExprs.l2norm_d(col("a")).as("n")),
      ("h", "n"))
  }

  test("sig_match_count == aggregate(zip_with) count on long signatures") {
    val sigs = (0 until 30).map { i =>
      ((0 until 8).map(j => ((i * 31 + j) % 5).toLong),
        (0 until 8).map(j => ((i * 17 + j) % 5).toLong))
    }.toDF("sig_a", "sig_b")
    val hof = aggregate(zip_with(col("sig_a"), col("sig_b"),
      (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    val bad = sigs.select(hof.as("h"),
        VecExprs.sig_match_count(col("sig_a"), col("sig_b")).as("n"))
      .collect().filter(r => r.getInt(0) != r.getInt(1))
    assert(bad.isEmpty, s"mismatch: ${bad.take(3).mkString(", ")}")
  }

  test("sq encode + adc == transform/zip_with trees, bit for bit") {
    val levels = 256
    val u = pairs.select(col("id"),
      transform(col("a"), x => x.cast("double")).as("u"))
    val mins = (0 until dim).map(i => -4.0 + i * 0.01)
    val maxs = (0 until dim).map(i => 4.0 - i * 0.01)
    val minsL = typedLit(mins)
    val maxsL = typedLit(maxs)
    def mn(i: org.apache.spark.sql.Column) = element_at(minsL, (i + 1).cast("int"))
    def mx(i: org.apache.spark.sql.Column) = element_at(maxsL, (i + 1).cast("int"))
    val codeHof = transform(col("u"), (x, i) =>
      when(mx(i) === mn(i), lit(0L))
        .otherwise(least(lit(levels - 1L), greatest(lit(0L),
          floor((x - mn(i)) / (mx(i) - mn(i)) * lit(levels.toDouble))))))
    val codeNat = VecExprs.sq_encode(col("u"), mins, maxs, levels)
    // codes identical (exact long equality)
    val codeRows = u.select(codeHof.as("h"), codeNat.as("n")).collect()
    codeRows.foreach(r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"codes diverged: $r"))
    // adc distance identical, scored against an independent query vec
    val coded = u.select(col("id"), col("u"), codeNat.as("codes"))
      .withColumn("q_u", transform(col("u"), x => x * 0.9 + 0.05))
    val deq = transform(col("codes"), (c, i) =>
      when(mx(i) === mn(i), mn(i))
        .otherwise(mn(i) +
          (c.cast("double") + lit(0.5)) * (mx(i) - mn(i)) / lit(levels.toDouble)))
    val adcHof = aggregate(zip_with(col("q_u"), deq, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)
    bitsEqual(coded.select(adcHof.as("h"),
      VecExprs.sq_adc_dist(col("q_u"), col("codes"), mins, maxs, levels).as("n")),
      ("h", "n"))
  }

  test("pq_adc_dist == per-subspace aggregate(zip_with) reduceLeft, bit for bit") {
    val m = 4
    val dsub = dim / m
    // sparse ids on one subspace to exercise the id->slot lookup
    val ids = Seq(Seq(0, 1, 2), Seq(1, 3, 5), Seq(0, 2, 4), Seq(2, 3, 7))
    val cents = ids.map(_.map(id =>
      (0 until dsub).map(j => (id * 0.37 + j * 0.11) - 0.8)))
    val codebooks: Map[Int, Seq[(Int, Seq[Double])]] =
      (0 until m).map(mi => mi -> ids(mi).zip(cents(mi))).toMap
    val rows = (0 until 25).map { i =>
      ((0 until dim).map(j => ((i * 13 + j * 7) % 100) / 50.0 - 1.0),
        ids(0)(i % 3), ids(1)(i % 3), ids(2)(i % 3), ids(3)(i % 3))
    }.toDF("q_u", "code_0", "code_1", "code_2", "code_3")
    def d2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
    val centMap = (0 until m).map { mi =>
      typedLit(codebooks(mi).map { case (id, c) => id -> c }.toMap)
    }
    val hof = (0 until m).map { mi =>
      d2(slice(col("q_u"), mi * dsub + 1, dsub),
        element_at(centMap(mi), col(s"code_$mi")))
    }.reduceLeft(_ + _)
    val nat = VecExprs.pq_adc_dist(col("q_u"),
      (0 until m).map(mi => col(s"code_$mi")), ids, cents)
    bitsEqual(rows.select(hof.as("h"), nat.as("n")), ("h", "n"))
    // out-of-codebook code -> null (element_at map-miss semantics)
    val missRow = rows.limit(1).withColumn("code_1", lit(99))
    val r = missRow.select(nat.as("n")).collect().head
    assert(r.isNullAt(0), "missing codebook id must score null")
  }

  test("unit_vec == transform(when(nrm===0,0).otherwise(x/nrm)), bit for bit") {
    val withN = pairs.select(col("id"), col("a"),
      VecExprs.l2norm_d(col("a")).as("nrm"))
    val hof = transform(col("a"),
      x => when(col("nrm") === 0, lit(0.0)).otherwise(x.cast("double") / col("nrm")))
    val rows = withN.select(hof.as("h"),
      VecExprs.unit_vec(col("a"), col("nrm")).as("n")).collect()
    rows.foreach { r =>
      val h = r.getSeq[Double](0).map(java.lang.Double.doubleToRawLongBits)
      val n = r.getSeq[Double](1).map(java.lang.Double.doubleToRawLongBits)
      assert(h == n, s"unit vec diverged: $r")
    }
  }
}
