package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Add, And => CAnd, AttributeReference, BitwiseAnd, BitwiseNot, BitwiseOr,
  EvalMode, Expression, If, IsNull, Literal, Not, Or => COr,
  ShiftRight, ShiftRightUnsigned}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{
  BooleanType, DataType, DecimalType, LongType}
import org.apache.spark.sql.types.Decimal

/** Exact decimal SUM over the UNSCALED-LONG view, accumulated in
  * branch-free two's-complement INT128 — the whole-stage-codegen fast
  * path for the aggregate every analytics query runs hottest
  * (`SUM(CAST(price * (1 - discount) AS DECIMAL(18,4)))`).
  *
  * Why: Spark's decimal Sum keeps a DecimalType(p+10, s) buffer.
  * Past 18 digits that buffer is not long-backed, so EVERY row update
  * deserializes/reserializes a java BigDecimal through the UnsafeRow
  * — measured at sf100 as ~12 s of a 31 s pre-aggregate over 600M
  * rows, where the identical double sum runs in ~2 s
  * (BENCH_Q12_r15). A decimal(p ≤ 18) VALUE, however, is exactly its
  * unscaled long (`UnscaledValue`), and the sum of unscaled longs is
  * the unscaled value of the sum — all integer math.
  *
  * The accumulator is a signed INT128 in two LONG buffer slots
  * (hi, lo) plus a `seen` flag (SUM of no rows is NULL):
  *
  *   update:  lo' = lo +ₗ x;   hi' = hi +ₗ (x >> 63) +ₗ carry(lo, x, lo')
  *   merge:   lo' = lo₁ +ₗ lo₂; hi' = hi₁ +ₗ hi₂ +ₗ carry(lo₁, lo₂, lo')
  *
  * where +ₗ is the wrapping (LEGACY) long add and
  * `carry(a, b, r) = ((a & b) | ((a | b) & ~r)) >>> 63` is the
  * unsigned carry out of the low word — the standard two's-complement
  * add-with-carry identities, branch-free, fully codegen-compatible.
  * `x >> 63` sign-extends the signed input into the high word.
  *
  * EXACTNESS. Int128 addition is associative and exact: |each x| <
  * 10^18 < 2^60, so overflowing 2^127 would take > 10^20 rows — no
  * dataset reaches it (Spark's own decimal sum is equally
  * final-checked: it accumulates in unbounded BigDecimal and checks
  * precision once at the end, `CheckOverflowInSum`). The single
  * conversion back to Decimal happens once per GROUP
  * ([[Int128ToDecimal]]): value fits `resultType` (the same
  * DecimalType(min(38, p+10), s) Spark's Sum produces) → exact
  * decimal; else LEGACY yields NULL and ANSI throws — Sum's own
  * overflow contract.
  *
  * NULL semantics match Sum: null inputs leave the buffer untouched;
  * a group with no non-null input evaluates to NULL (`seen`). */
case class SumUnscaled128(
    child: Expression,
    resultType: DecimalType,
    ansi: Boolean) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = resultType
  override def prettyName: String = "sum_unscaled128"

  private lazy val hi = AttributeReference("hi128", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo128", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen128", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  // wrapping long add — the accumulator is two's complement by design,
  // so the adds must never ANSI-throw
  private def addL(l: Expression, r: Expression): Expression =
    Add(l, r, EvalMode.LEGACY)

  /** Unsigned carry out of `a + b = r` on the low word. */
  private def carry(a: Expression, b: Expression, r: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(r))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    // branch-free NULL handling: a null input adds ZERO (lo+0 carries
    // nothing, 0>>63 = 0), so no If is needed around the buffer
    // update — conditional branches would also defeat common-
    // subexpression elimination over `child`. The rewrite rule
    // additionally projects the unscaled value BELOW the aggregate,
    // so `child` here is a bare attribute — evaluated once per row by
    // construction.
    val x = org.apache.spark.sql.catalyst.expressions.Coalesce(
      Seq(child, Literal(0L)))
    val newLo = addL(lo, x)
    val newHi = addL(addL(hi, ShiftRight(x, Literal(63))), carry(lo, x, newLo))
    Seq(newHi, newLo, COr(seen, Not(IsNull(child))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val newLo = addL(lo.left, lo.right)
    val newHi = addL(addL(hi.left, hi.right), carry(lo.left, lo.right, newLo))
    Seq(newHi, newLo, COr(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    If(Not(seen), Literal(null, resultType),
      Int128ToDecimal(hi, lo, resultType, ansi))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SumUnscaled128 =
    copy(child = newChildren.head)
}

/** (hi, lo) int128 → Decimal(resultType) with Sum's overflow contract
  * (LEGACY null / ANSI throw). Evaluates ONCE PER GROUP via the
  * static [[Int128ToDecimal.convert]] helper (real doGenCode — a
  * CodegenFallback here would NPE: the hash aggregate's result
  * projection runs with a null INPUT_ROW under whole-stage codegen);
  * the per-row work is all in the long-typed buffer updates. */
case class Int128ToDecimal(
    hiExpr: Expression,
    loExpr: Expression,
    resultType: DecimalType,
    ansi: Boolean) extends Expression {

  override def children: Seq[Expression] = Seq(hiExpr, loExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = resultType
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val hi = hiExpr.eval(input).asInstanceOf[Long]
    val lo = loExpr.eval(input).asInstanceOf[Long]
    Int128ToDecimal.convert(hi, lo,
      resultType.precision, resultType.scale, ansi)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val hiC = hiExpr.genCode(ctx)
    val loC = loExpr.genCode(ctx)
    val helper = Int128ToDecimal.getClass.getName.stripSuffix("$")
    ev.copy(code =
      code"""
        ${hiC.code}
        ${loC.code}
        org.apache.spark.sql.types.Decimal ${ev.value} =
          $helper.convert(${hiC.value}, ${loC.value},
            ${resultType.precision}, ${resultType.scale}, $ansi);
        boolean ${ev.isNull} = ${ev.value} == null;
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Int128ToDecimal =
    copy(hiExpr = newChildren(0), loExpr = newChildren(1))
}

object Int128ToDecimal {
  private val twoTo64 = java.math.BigInteger.ONE.shiftLeft(64)

  /** Static conversion — called from generated code AND eval. Returns
    * null on LEGACY overflow; throws on ANSI overflow. */
  def convert(hi: Long, lo: Long, precision: Int, scale: Int,
      ansi: Boolean): Decimal = {
    val loU =
      if (lo >= 0) java.math.BigInteger.valueOf(lo)
      else java.math.BigInteger.valueOf(lo).add(twoTo64)
    val total = java.math.BigInteger.valueOf(hi).shiftLeft(64).add(loU)
    val dec = Decimal(BigDecimal(new java.math.BigDecimal(total, scale)))
    if (dec.changePrecision(precision, scale)) dec
    else if (!ansi) null
    else throw new ArithmeticException(
      "[ARITHMETIC_OVERFLOW] Overflow in sum of decimals " +
        s"(sum_unscaled128 result exceeds DECIMAL($precision,$scale)).")
  }
}
