package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Fused vector-math expressions for the ANN / dedup hot paths
  * (round 17, optimization guide "expressions and codegen": eliminate
  * non-codegen interpreted expressions in the hot path).
  *
  * The scoring stages of every ANN operator evaluated
  * `aggregate(zip_with(...))` higher-order trees — interpreted
  * per ELEMENT (a Catalyst lambda eval per array slot), paid once per
  * CANDIDATE PAIR (corpus × queries), which round 16 measured as the
  * ann_sq/ann_ivfpq per-task hotspot (anti-scaling: 8 cores beat 32,
  * ratios 0.74–0.87 — the per-row cost was interpretation, not data).
  * Each expression here is one tight JVM loop per call, the
  * [[NearestCentroid]] pattern.
  *
  * DETERMINISM CONTRACT: every expression replicates its higher-order
  * predecessor's IEEE arithmetic bit-for-bit — same element order,
  * same left-fold accumulation from 0.0, same widening casts, same
  * null/missing-element propagation (zip_with pads the shorter array
  * with null; aggregate's `acc + null` poisons the whole fold to
  * null) — so every oracle hash is unchanged. VecExpressionsSpec pins
  * expression == higher-order tree on random vectors including the
  * degenerate cases (zero norm, length mismatch, null elements).
  */
object VecExprs {

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** elem i of a float/double ArrayData, widened to double. */
  @inline private def elemD(a: ArrayData, i: Int, float: Boolean): Double =
    if (float) a.getFloat(i).toDouble else a.getDouble(i)

  private def expectVec(e: Expression, fn: String) =
    GraftTypeChecks.expect(e, fn, {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }, "ARRAY<FLOAT|DOUBLE>")

  /** Left-fold dot product with per-element double widening —
    * replicates `aggregate(zip_with(a, b, (x, y) => x.cast(double) *
    * y.cast(double)), 0.0, (acc, v) => acc + v)` exactly: missing
    * (length mismatch) or null elements poison the result to null,
    * accumulation is `((0.0 + x0*y0) + x1*y1) + …` in array order. */
  case class DotProductD(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes() = {
      val l = expectVec(left, "graft_dot")
      if (l.isFailure) l else expectVec(right, "graft_dot")
    }
    @transient private lazy val lFloat = isFloat(left.dataType)
    @transient private lazy val rFloat = isFloat(right.dataType)

    override def nullSafeEval(lv: Any, rv: Any): Any = {
      val a = lv.asInstanceOf[ArrayData]
      val b = rv.asInstanceOf[ArrayData]
      val la = a.numElements()
      val lb = b.numElements()
      val n = math.max(la, lb)
      var s = 0.0
      var i = 0
      while (i < n) {
        // zip_with pads the shorter side with null; x*null = null;
        // acc + null poisons the remaining fold — so the whole result
        // is null the moment either side runs out or holds a null
        if (i >= la || i >= lb || a.isNullAt(i) || b.isNullAt(i)) return null
        s += elemD(a, i, lFloat) * elemD(b, i, rFloat)
        i += 1
      }
      s
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProductD =
      copy(left = newLeft, right = newRight)
  }

  /** Left-fold L2 norm — replicates `sqrt(aggregate(a, 0.0,
    * (acc, v) => acc + v.cast(double) * v.cast(double)))` exactly. */
  case class L2NormD(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes() = expectVec(child, "graft_l2norm")
    @transient private lazy val float = isFloat(child.dataType)

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null // acc + null poisons the fold
        val x = elemD(a, i, float)
        s += x * x
        i += 1
      }
      math.sqrt(s)
    }
    override protected def withNewChildInternal(newChild: Expression): L2NormD =
      copy(child = newChild)
  }

  /** MinHash signature agreement count — replicates
    * `aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
    * 0, (acc, v) => acc + v)` exactly: a null/missing element compares
    * to null, `when` falls to 0, the count never goes null (only a
    * null ARRAY does, via the binary null-propagation). */
  case class SigMatchCount(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    private def expectLongArr(e: Expression) =
      GraftTypeChecks.expect(e, "graft_sig_match", {
        case ArrayType(LongType, _) => true
        case _ => false
      }, "ARRAY<BIGINT>")
    override def checkInputDataTypes() = {
      val l = expectLongArr(left)
      if (l.isFailure) l else expectLongArr(right)
    }

    override def nullSafeEval(lv: Any, rv: Any): Any = {
      val a = lv.asInstanceOf[ArrayData]
      val b = rv.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var c = 0
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
          c += 1
        i += 1
      }
      c
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SigMatchCount =
      copy(left = newLeft, right = newRight)
  }

  /** PQ asymmetric-distance score: for subspace mi, squared L2 between
    * the query's unit subvector u[mi·dsub … mi·dsub+dsub) and the
    * neighbor's assigned centroid `cents(mi)(code_mi)`, the m partials
    * added in fixed subspace order. Replicates the per-subspace
    * `aggregate(zip_with(q_sub_mi, element_at(centMap_mi, code_mi),
    * (x, y) => (x-y)*(x-y)), 0.0, +)` trees `reduceLeft(_ + _)`:
    * per-subspace left fold from 0.0, then partials summed left to
    * right (each partial is ≥ 0, so `0.0 + d0 = d0` — a running total
    * from 0.0 is bit-identical). A code with no codebook entry
    * replicates `element_at(map, code)` = null → null distance; a
    * query vector shorter than (mi+1)·dsub replicates slice()'s short
    * array → zip_with null pad → null.
    *
    * children = query unit vector (array<double>) +: m code columns
    * (int). Codebook ids may be sparse; lookup is by id. */
  case class PqAdcDist(children: Seq[Expression], ids: Seq[Seq[Int]],
      cents: Seq[Seq[Seq[Double]]]) extends Expression with CodegenFallback {
    private val m = ids.length
    require(children.length == m + 1 && cents.length == m)

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes() = {
      val u = GraftTypeChecks.expect(children.head, "graft_pq_adc", {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }, "ARRAY<DOUBLE>")
      if (u.isFailure) u
      else children.tail.map(c =>
        GraftTypeChecks.expect(c, "graft_pq_adc",
          _ == IntegerType, "INT")).find(_.isFailure)
        .getOrElse(org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckSuccess)
    }

    // id -> centroid lookup per subspace, dense array indexed by id
    @transient private lazy val lookup: Array[Array[Array[Double]]] =
      (0 until m).map { mi =>
        val maxId = ids(mi).max
        val tab = new Array[Array[Double]](maxId + 1)
        ids(mi).zip(cents(mi)).foreach { case (id, c) => tab(id) = c.toArray }
        tab
      }.toArray

    override def eval(input: InternalRow): Any = {
      val uv = children.head.eval(input)
      if (uv == null) return null
      val u = uv.asInstanceOf[ArrayData]
      val uLen = u.numElements()
      var total = 0.0
      var mi = 0
      while (mi < m) {
        val cv = children(mi + 1).eval(input)
        if (cv == null) return null
        val code = cv.asInstanceOf[Int]
        val tab = lookup(mi)
        if (code < 0 || code >= tab.length || tab(code) == null) return null
        val c = tab(code)
        val off = mi * c.length
        var d = 0.0
        var i = 0
        while (i < c.length) {
          val j = off + i
          if (j >= uLen || u.isNullAt(j)) return null // slice/zip_with null pad
          val t = u.getDouble(j) - c(i)
          d += t * t
          i += 1
        }
        total += d
        mi += 1
      }
      total
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): PqAdcDist =
      copy(children = newChildren)
  }

  /** SQ8 asymmetric-distance score: squared L2 between the exact query
    * unit vector and the midpoint dequantization of the neighbor's
    * codes on the per-dimension [min,max] grid. Replicates
    * `aggregate(zip_with(q_u, transform(codes, (c, i) =>
    * when(mx==mn, mn).otherwise(mn + (c+0.5)*(mx-mn)/L)), (a, b) =>
    * (a-b)*(a-b)), 0.0, +)` exactly — same per-element op order
    * (`mn + (((c+0.5)*(mx-mn))/L)`), same left fold, null/missing
    * elements (incl. a code index beyond the grid arrays) → null. */
  case class SqAdcDist(left: Expression, right: Expression,
      mins: Seq[Double], maxs: Seq[Double], levels: Int)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes() = {
      val l = GraftTypeChecks.expect(left, "graft_sq_adc", {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }, "ARRAY<DOUBLE>")
      if (l.isFailure) l
      else GraftTypeChecks.expect(right, "graft_sq_adc", {
        case ArrayType(LongType, _) => true
        case _ => false
      }, "ARRAY<BIGINT>")
    }
    @transient private lazy val mnArr = mins.toArray
    @transient private lazy val mxArr = maxs.toArray
    @transient private lazy val lD = levels.toDouble

    override def nullSafeEval(lv: Any, rv: Any): Any = {
      val q = lv.asInstanceOf[ArrayData]
      val c = rv.asInstanceOf[ArrayData]
      val la = q.numElements()
      val lb = c.numElements()
      val n = math.max(la, lb)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (i >= la || i >= lb || i >= mnArr.length ||
          q.isNullAt(i) || c.isNullAt(i)) return null
        val mn = mnArr(i)
        val mx = mxArr(i)
        val deq =
          if (mx == mn) mn
          else mn + ((c.getLong(i).toDouble + 0.5) * (mx - mn)) / lD
        val t = q.getDouble(i) - deq
        s += t * t
        i += 1
      }
      s
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SqAdcDist =
      copy(left = newLeft, right = newRight)
  }

  /** SQ8 encoder: `code_i = when(mx==mn, 0L).otherwise(least(L-1,
    * greatest(0, floor(((x-mn)/(mx-mn))·L))))` per element, as one
    * loop — replicates the `transform(u, (x, i) => …)` tree exactly
    * (null element → null element out; grid lookup past the arrays →
    * null element, matching element_at's null). */
  case class SqEncode(child: Expression,
      mins: Seq[Double], maxs: Seq[Double], levels: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def nullable: Boolean = true
    override def checkInputDataTypes() =
      GraftTypeChecks.expect(child, "graft_sq_encode", {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }, "ARRAY<DOUBLE>")
    @transient private lazy val mnArr = mins.toArray
    @transient private lazy val mxArr = maxs.toArray
    @transient private lazy val lD = levels.toDouble
    @transient private lazy val lMax = levels - 1L

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i) && i < mnArr.length) {
          val mn = mnArr(i)
          val mx = mxArr(i)
          out(i) =
            if (mx == mn) 0L
            else {
              val f = math.floor(((a.getDouble(i) - mn) / (mx - mn)) * lD).toLong
              math.min(lMax, math.max(0L, f))
            }
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): SqEncode =
      copy(child = newChild)
  }

  /** Unit-normalized view of a float/double vector — replicates
    * `transform(v, x => when(nrm === 0, 0.0).otherwise(x.cast(double)
    * / nrm))` with `nrm` a sibling column: zero norm → all-0.0 vector
    * (cosine's 0 convention), null element → null element, null norm →
    * per-element null (when's otherwise arm divides by null). */
  case class UnitVec(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
    override def nullable: Boolean = true
    override def checkInputDataTypes() = {
      val l = expectVec(left, "graft_unit_vec")
      if (l.isFailure) l
      else GraftTypeChecks.expect(right, "graft_unit_vec",
        _ == DoubleType, "DOUBLE")
    }
    @transient private lazy val float = isFloat(left.dataType)

    // transform() evaluates per element even when nrm is null, so this
    // overrides the default binary null propagation for the RIGHT side
    // only: a null vector → null, a null nrm → array of nulls.
    override def eval(input: InternalRow): Any = {
      val lv = left.eval(input)
      if (lv == null) return null
      val rv = right.eval(input)
      val a = lv.asInstanceOf[ArrayData]
      val n = a.numElements()
      val out = new Array[Any](n)
      if (rv != null) {
        val nrm = rv.asInstanceOf[Double]
        var i = 0
        while (i < n) {
          if (!a.isNullAt(i))
            out(i) = if (nrm == 0) 0.0 else elemD(a, i, float) / nrm
          i += 1
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): UnitVec =
      copy(left = newLeft, right = newRight)
  }

  // ---- Column entry points -------------------------------------------

  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  def dot_d(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductD(expr(a), expr(b)))
  def l2norm_d(a: Column): Column =
    ColumnBridge.column(L2NormD(expr(a)))
  def sig_match_count(a: Column, b: Column): Column =
    ColumnBridge.column(SigMatchCount(expr(a), expr(b)))
  def pq_adc_dist(u: Column, codes: Seq[Column], ids: Seq[Seq[Int]],
      cents: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqAdcDist(expr(u) +: codes.map(expr), ids, cents))
  def sq_adc_dist(u: Column, codes: Column, mins: Seq[Double],
      maxs: Seq[Double], levels: Int): Column =
    ColumnBridge.column(SqAdcDist(expr(u), expr(codes), mins, maxs, levels))
  def sq_encode(u: Column, mins: Seq[Double], maxs: Seq[Double],
      levels: Int): Column =
    ColumnBridge.column(SqEncode(expr(u), mins, maxs, levels))
  def unit_vec(v: Column, nrm: Column): Column =
    ColumnBridge.column(UnitVec(expr(v), expr(nrm)))
}
