package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.queries.Det

/** The long-buffer exact-decimal sums (Det.dsum2L/4L/davg2L) must be
  * VALUE-IDENTICAL to the decimal-buffer path on every input the
  * decimal path accepts — they are a performance lever, and a single
  * differing bit would silently break the oracle hash gate wherever
  * they are adopted. Pinned here on adversarial inputs (negatives,
  * nulls, half-up rounding boundaries, magnitudes that exercise the
  * hi/lo split), not just the benchmark's TPC-H data.
  */
class DetSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 4, appName = "graft-det-test")

  private def compare(values: Seq[java.lang.Double], groups: Int = 3): Unit = {
    import spark.implicits._
    val df = values.zipWithIndex
      .map { case (v, i) => (i % groups, Option(v).map(_.doubleValue)) }
      .toDF("g", "v")
      .repartition(7) // partial aggregation across several partitions
    val dec = df.groupBy("g").agg(
      Det.dsum2(col("v")).as("s2"), Det.dsum4(col("v")).as("s4"),
      Det.davg2(col("v")).as("a2")).orderBy("g").collect()
    val lng = df.groupBy("g").agg(
      Det.dsum2L(col("v")).as("s2"), Det.dsum4L(col("v")).as("s4"),
      Det.davg2L(col("v")).as("a2")).orderBy("g").collect()
    assert(dec.sameElements(lng),
      s"long-buffer sums diverged:\n${dec.mkString("\n")}\nvs\n${lng.mkString("\n")}")
  }

  test("dsum2L/dsum4L/davg2L are bit-identical to the decimal path") {
    // half-up rounding boundaries (x.xx5), negatives, zeros, nulls
    compare(Seq[java.lang.Double](
      1.005, -1.005, 2.675, -2.675, 0.0, -0.0, null, 0.004999, -0.004999,
      123.455, -123.455, 99999.995, -99999.995))
    // magnitudes that cross the 10^6 hi/lo split in both directions
    compare(Seq[java.lang.Double](
      12345678.91, -12345678.91, 9999999.99, -9999999.99, 0.01, -0.01,
      null, 5000000.005, -5000000.005, 1e9, -1e9, 1e9 + 0.125))
    // an all-null group and a single-value group
    compare(Seq[java.lang.Double](null, null, null, 42.42), groups = 4)
    // pseudo-random mix, fixed seed, both signs, wide magnitude range
    val rnd = new scala.util.Random(7)
    compare(Seq.fill(500)(java.lang.Double.valueOf(
      (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(8)))) ++
      Seq[java.lang.Double](null, null))
  }

  test("empty input: both paths return null sums") {
    import spark.implicits._
    val df = Seq.empty[(Int, Double)].toDF("g", "v")
    val dec = df.agg(Det.dsum2(col("v")), Det.dsum4(col("v"))).collect().head
    val lng = df.agg(Det.dsum2L(col("v")), Det.dsum4L(col("v"))).collect().head
    assert(dec.isNullAt(0) && dec.isNullAt(1))
    assert(lng.isNullAt(0) && lng.isNullAt(1))
  }
}
