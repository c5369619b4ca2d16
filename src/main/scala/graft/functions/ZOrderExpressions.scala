package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array, filter, lit, size}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Morton (Z-order) interleave of N per-dimension bucket ids into one
  * sort key — the multi-dimensional clustering primitive
  * (Delta/Iceberg OPTIMIZE ZORDER BY; Morton 1966). Bit j of dimension
  * i lands at position j·n + i, so sorting by the z-value keeps rows
  * close in EVERY dimension: a range-clustered layout on the z-value
  * gives each micro-block a tight min/max box on ALL z columns at
  * once, where single-key clustering gives zone maps selectivity on
  * one column and noise on the rest.
  *
  * Codegen'd (static call, no boxing); null bucket entries count as
  * bucket 0 (nulls cluster together at the z-origin).
  */
case class ZValue(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    GraftTypeChecks.expect(child, "graft_zvalue", {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }, "ARRAY<INT>")

  override def nullSafeEval(input: Any): Any =
    ZValue.interleave(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ZValue.interleave($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): ZValue =
    copy(child = newChild)
}

object ZValue {
  def interleave(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    require(n * bits <= 63, s"zvalue: $n dims x $bits bits exceeds 63")
    var z = 0L
    var i = 0
    while (i < n) {
      val b = if (arr.isNullAt(i)) 0 else arr.getInt(i)
      var j = 0
      while (j < bits) {
        if (((b >> j) & 1) == 1) z |= 1L << (j * n + i)
        j += 1
      }
      i += 1
    }
    z
  }
}

/** Column-level Z-order helpers. */
object ZOrder {

  /** Quantile-bucket id of `v` against sorted `bounds`: the number of
    * boundaries ≤ v, computed scan-locally against the literal
    * boundary array (codegen'd higher-order filter — no lookup join).
    * NULL maps to bucket 0. */
  def bucket(v: Column, bounds: Seq[Double]): Column =
    size(filter(array(bounds.map(lit): _*), b => v >= b))

  /** Morton code of per-dimension bucket columns (each in
    * [0, 2^bits)). */
  def zvalue(buckets: Seq[Column], bits: Int): Column =
    ColumnBridge.column(ZValue(
      ColumnBridge.expression(array(buckets: _*)), bits))
}
