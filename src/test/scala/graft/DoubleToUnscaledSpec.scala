package graft

import org.scalatest.funsuite.AnyFunSuite

/** The guarded fast-path double→unscaled conversion
  * (functions/DoubleToUnscaledLong) must be BIT-IDENTICAL to Spark's
  * Cast-to-decimal on every input — the fast path only fires when the
  * tie-distance guard proves equality, everything else falls back to
  * Spark's own code. Property-checked against millions of random
  * doubles across magnitudes plus adversarial exact ties. */
class DoubleToUnscaledSpec extends AnyFunSuite {

  /** Spark's conversion, the ground truth. */
  private def truth(d: Double, p: Int, s: Int): Option[Long] = {
    if (d.isNaN || d.isInfinite) return None
    val dec = org.apache.spark.sql.types.Decimal(d)
    if (dec.changePrecision(p, s)) Some(dec.toUnscaledLong) else None
  }

  private def fast(d: Double, p: Int, s: Int): Option[Long] = {
    val u = graft.functions.DoubleToUnscaledLong.convert(d, p, s, ansi = false)
    if (u == Long.MinValue) None else Some(u)
  }

  private def checkAll(ds: Iterator[Double], p: Int, s: Int): Unit =
    ds.foreach { d =>
      assert(fast(d, p, s) == truth(d, p, s),
        f"divergence at d=$d%.17g (bits=${java.lang.Double.doubleToLongBits(d)}) p=$p s=$s")
    }

  test("random doubles across magnitudes match Spark's cast (18,4)") {
    val rnd = new scala.util.Random(41)
    // money-like, unit-scale, large, tiny, mixed-sign
    checkAll(Iterator.fill(2000000)(
      (rnd.nextDouble() - 0.5) * 200000.0), 18, 4)
    checkAll(Iterator.fill(1000000)(
      (rnd.nextDouble() - 0.5) * 2.0), 18, 4)
    checkAll(Iterator.fill(500000)(
      (rnd.nextDouble() - 0.5) * 2e12), 18, 4)
    checkAll(Iterator.fill(500000)(
      (rnd.nextDouble() - 0.5) * 2e-6), 18, 4)
    // raw bit patterns: subnormals, extremes, everything
    checkAll(Iterator.fill(1000000)(
      java.lang.Double.longBitsToDouble(rnd.nextLong())), 18, 4)
  }

  test("adversarial ties and boundaries match (several scales/precisions)") {
    val crafted = Seq(
      0.12345, -0.12345, 0.123450000000001, 0.12344999999999999,
      2.5e-4, -2.5e-4, 0.00005, -0.00005, 0.99995, -0.99995,
      1.00005, 123456789.12345, 56294995342.1315, // near 2^49/1e4
      56294995342131.2, 99999999999999.9999, -99999999999999.9999,
      1e14, 1.0000000000000002e14, 5.6e10, 0.0, -0.0,
      Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MaxValue, -Double.MaxValue)
    for ((p, s) <- Seq((18, 4), (12, 2), (18, 0), (10, 6), (18, 18))) {
      checkAll(crafted.iterator, p, s)
      // dense sweep around .5 boundaries at this scale
      val rnd = new scala.util.Random(s + p)
      checkAll(Iterator.tabulate(200000) { i =>
        (i / 2 + 0.5 + (rnd.nextGaussian() * 1e-13)) / math.pow(10, s)
      }, p, s)
    }
  }

  test("ANSI mode throws exactly where legacy nulls") {
    for (d <- Seq(Double.NaN, Double.PositiveInfinity, 1e30)) {
      assert(fast(d, 18, 4).isEmpty)
      intercept[ArithmeticException] {
        graft.functions.DoubleToUnscaledLong.convert(d, 18, 4, ansi = true)
      }
    }
    // a clean value neither nulls nor throws in either mode
    assert(graft.functions.DoubleToUnscaledLong
      .convert(2.5, 18, 4, ansi = true) == 25000L)
  }
}
