package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `UnscaledValue(CAST(double AS DECIMAL(p, s)))` as ONE expression
  * with a GUARDED FAST PATH — the hot conversion of every money
  * aggregate (`SUM(CAST(price * (1 - disc) AS DECIMAL(18,4)))`),
  * measured at ~450 ns/row through Spark's cast (Double.toString →
  * BigDecimal parse → setScale → Decimal) = ~8.5 s of a 600M-row scan
  * at sf100 (BENCH_Q12_r15).
  *
  * SEMANTICS CONTRACT: bit-identical to Spark's
  * `Cast(d, DecimalType(p, s))` followed by `UnscaledValue` — LEGACY
  * overflow/NaN/Inf ⇒ NULL, ANSI ⇒ throw. The fast path computes
  * `round_half_up(|d| · 10^s)` in double arithmetic and is taken ONLY
  * when provably equal to the exact path:
  *
  *   - Spark rounds the SHORTEST DECIMAL REPRESENTATION r of d
  *     (BigDecimal.valueOf), with |r − d| ≤ ulp(d)/2 ≤ |d|·2⁻⁵²;
  *   - t = fl(|d| · 10^s) carries one more rounding: total distance
  *     |t − |r|·10^s| ≤ t·2⁻⁵⁰ (normals; subnormal r·10^s < 0.5
  *     rounds to 0 on both paths);
  *   - restricted to t < 2⁴⁹, `t + 0.5` and `floor` are exact in
  *     double, so `floor(t + 0.5)` is HALF_UP of t exactly;
  *   - therefore if no half-integer lies within t·2⁻⁴⁶ + 2⁻⁴⁶ of t (a
  *     16× safety margin over the error bound), HALF_UP(t) =
  *     HALF_UP(|r|·10^s) — the guard `|frac(t) − 0.5| > margin`.
  *
  * Ties, near-ties, big magnitudes, NaN/Inf and precision overflow
  * all take the slow path, which IS Spark's own conversion
  * (`Decimal(d).changePrecision`) — never a reimplementation.
  * DoubleToUnscaledSpec property-checks the equality on millions of
  * random + adversarial doubles. HALF_UP rounds ties away from zero,
  * matching the sign handling (`sign · floor(|t| + 0.5)`).
  *
  * NULL sentinel: a legal unscaled value satisfies |u| < 10^18 <
  * 2^63, so Long.MinValue can never be produced — the static helper
  * returns it to mean NULL without boxing in generated code. */
case class DoubleToUnscaledLong(
    child: Expression,
    precision: Int,
    scale: Int,
    ansi: Boolean) extends UnaryExpression {

  require(precision <= 18, "unscaled long view needs precision <= 18")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "double_to_unscaled"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val u = DoubleToUnscaledLong.convert(
        v.asInstanceOf[Double], precision, scale, ansi)
      if (u == Long.MinValue) null else u
    }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val helper = DoubleToUnscaledLong.getClass.getName.stripSuffix("$")
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = $helper.convert(${c.value}, $precision, $scale, $ansi);
          if (${ev.value} == Long.MIN_VALUE) ${ev.isNull} = true;
        }
      """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): DoubleToUnscaledLong = copy(child = newChild)
}

object DoubleToUnscaledLong {

  private val pow10: Array[Double] = Array.tabulate(19)(i => math.pow(10, i))
  private val pow10L: Array[Long] = Array.tabulate(19)(i =>
    math.pow(10, i).round)

  /** Fast-path bound: below 2^49 both `t + 0.5` and `floor` are exact
    * and the result fits comfortably inside every precision we serve. */
  private val FastBound = 562949953421312.0 // 2^49

  /** The unscaled long of CAST(d AS DECIMAL(precision, scale)), or
    * Long.MinValue for NULL (legacy overflow / NaN / Inf). ANSI mode
    * throws where Spark's ANSI cast would. Called from generated code. */
  def convert(d: Double, precision: Int, scale: Int, ansi: Boolean): Long = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) {
      if (ansi) throw new ArithmeticException(
        s"[CAST_OVERFLOW] cannot cast $d to DECIMAL($precision,$scale)")
      return Long.MinValue
    }
    val t = math.abs(d) * pow10(scale)
    if (t < FastBound) {
      val f = t - math.floor(t)
      val margin = t * 1.43e-14 + 1.43e-14 // 2^-46, rounded up
      if (math.abs(f - 0.5) > margin) {
        val n = math.floor(t + 0.5).toLong
        if (n < pow10L(precision)) return if (d < 0) -n else n
        // precision overflow: fall through to the exact path, which
        // applies Spark's own overflow contract
      }
    }
    slow(d, precision, scale, ansi)
  }

  /** Spark's own conversion, verbatim semantics. */
  private def slow(d: Double, precision: Int, scale: Int,
      ansi: Boolean): Long = {
    val dec = org.apache.spark.sql.types.Decimal(d)
    if (dec.changePrecision(precision, scale)) dec.toUnscaledLong
    else if (ansi) throw new ArithmeticException(
      s"[CAST_OVERFLOW] cannot cast $d to DECIMAL($precision,$scale)")
    else Long.MinValue
  }
}
