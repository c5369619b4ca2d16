package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Wrapping 64-bit polynomial rolling hash over a string's UTF-8 bytes
  * — graft's document fingerprint primitive (SURVEY.md §2c
  * ta_fingerprint). Implemented as a native Catalyst expression *with
  * codegen* so fingerprinting a 100 TB corpus stays inside
  * whole-stage-generated loops (no UDF serialization, no boxing).
  *
  * h₀ = 1125899906842597; hᵢ = hᵢ₋₁ * 31 + byteᵢ (wrapping).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    GraftTypeChecks.expect(child, "graft_rolling_hash",
      _ == org.apache.spark.sql.types.StringType, "STRING")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 1125899906842597L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + (long) $bytes[$i];
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = h * 31L + bytes(i); i += 1 }
    h
  }
}

/** FNV-1a 64 of a string's UTF-8 bytes (codegen'd) — graft's shingle
  * hash. Chosen over xxhash64 because its byte fold is replayable in
  * the DuckDB oracle with HUGEINT mod-2^64 arithmetic (see
  * OracleSql.fnv1a64Unsigned), which makes the whole MinHash+LSH
  * pipeline hash-comparable cross-engine. */
case class Fnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    GraftTypeChecks.expect(child, "graft_fnv64",
      _ == org.apache.spark.sql.types.StringType, "STRING")

  override def nullSafeEval(input: Any): Any =
    SimHash64.fnv1a64(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h ^= ($bytes[$i] & 0xffL);
         |  $h *= 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

/** The `nHash` Bloom-filter bit positions of a 64-bit hash under
  * Kirsch–Mitzenmacher double hashing: posᵢ = (h + i·g) mod mBits with
  * g = splitmix64(h), i ∈ [0, nHash). Native because the wrapping
  * multiply/add runs in Java long semantics (Column arithmetic errors
  * on overflow under Spark 4's default ANSI mode), and `mBits` is
  * restricted to powers of two so the mod is an unsigned bit-mask —
  * exactly replayable in the oracle's HUGEINT mod-2^64 arithmetic
  * (2^k divides 2^64, so the signed wrap never changes the residue). */
case class BloomPositions(child: Expression, mBits: Int, nHash: Int)
    extends UnaryExpression {
  require(mBits >= 128 && Integer.bitCount(mBits) == 1,
    s"mBits must be a power of two >= 128, got $mBits")
  require(nHash >= 1 && nHash <= 16, s"nHash must be in [1,16], got $nHash")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes() =
    GraftTypeChecks.expect(child, "graft_bloom_positions",
      _ == LongType, "BIGINT")

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[Long]
    val g = MinHashSig.splitmix64(h)
    val mask = (mBits - 1).toLong
    val out = new Array[Int](nHash)
    var i = 0
    while (i < nHash) { out(i) = ((h + i * g) & mask).toInt; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val g = ctx.freshName("g")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |long $z = $c + 0x9e3779b97f4a7c15L;
         |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |long $g = $z ^ ($z >>> 31);
         |int[] $out = new int[$nHash];
         |for (int $i = 0; $i < $nHash; $i++) {
         |  $out[$i] = (int) (($c + $i * $g) & ${mBits - 1}L);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BloomPositions =
    copy(child = newChild)
}

/** LSH band keys from a MinHash signature: key of band b is the
  * wrapping polynomial fold h=b; h = h*31 + component over the band's
  * `rowsPerBand` consecutive signature components. Native because
  * Column-level long arithmetic errors on overflow under Spark 4's
  * default ANSI mode, while banding WANTS wrapping Java semantics
  * (also replayable in the oracle — see OracleSql). */
case class BandKeys(child: Expression, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {
  require(rowsPerBand > 0)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    GraftTypeChecks.expect(child, "graft_band_keys", {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }, "ARRAY<BIGINT>")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val numBands = arr.numElements() / rowsPerBand
    val keys = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = b.toLong
      var r = 0
      while (r < rowsPerBand) { h = h * 31L + arr.getLong(b * rowsPerBand + r); r += 1 }
      keys(b) = h
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}

/** 64-bit SimHash over an array of tokens (SURVEY.md §2c dd_simhash).
  *
  * Classic Charikar construction: each token hashes to 64 bits
  * (FNV-1a); each bit position accumulates +1/-1; the signature's bit
  * is 1 where the accumulator is positive. Near-duplicate docs differ
  * in few bits, so Hamming-band bucketing finds candidates without
  * O(n²) comparisons. Imperative eval (CodegenFallback) — the per-row
  * work is a token loop, which dominates any codegen saving.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    GraftTypeChecks.expect(child, "graft_simhash64", {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }, "ARRAY<STRING>")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = SimHash64.fnv1a64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

/** Full MinHash signature in ONE pass over the hashed-shingle array.
  *
  * Composing this from built-ins (numPerms × `transform`+`array_min`)
  * allocates numPerms intermediate arrays per row — measured as the
  * dominant GC load of the dedup operators. Here each signature
  * component i is min over shingles x of splitmix64(x ⊕ seed_i)
  * (splitmix64 is the standard public-domain 64-bit finalizer; XOR
  * with a per-permutation seed gives an independent-enough hash
  * family for MinHash), computed in a tight two-level loop with a
  * single output allocation.
  */
case class MinHashSig(child: Expression, numPerms: Int)
    extends UnaryExpression with CodegenFallback {
  require(numPerms > 0 && numPerms <= 512)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  // array<long> ONLY (hashed shingles) — a string-shingle array would
  // pass analysis and read garbage at runtime otherwise
  override def checkInputDataTypes() =
    GraftTypeChecks.expect(child, "minhash_sig", {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }, "ARRAY<BIGINT>")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getLong(i)
        var p = 0
        while (p < numPerms) {
          val h = MinHashSig.splitmix64(x ^ MinHashSig.seed(p))
          if (h < sig(p)) sig(p) = h
          p += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def splitmix64(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private val seeds = (0 until 512).map(i => splitmix64(i.toLong * 0xdeadbeefL + 1)).toArray
  def seed(i: Int): Long = seeds(i)
}

/** All `tables`×`bits` random-hyperplane LSH keys of a float/double
  * vector in ONE pass (SURVEY.md §2c ann38 / dd36).
  *
  * Semantically identical to composing
  * [[TextFunctions.hyperplaneBit]] per plane (asserted by a spec):
  * plane component c(p, j) = pmod(xxhash64(p, j), 10000)/10000 - 0.5
  * with Spark's seed-42 xxhash64 chain, projection = left-fold double
  * sum of v(j)·c(p, j), bit = projection ≥ 0, table key t =
  * Σᵢ bit(t·bits+i)·2ⁱ + t·2^bits.
  *
  * Why native: the composed form evaluates `tables×bits` separate
  * `aggregate(zip_with(...))` trees, each allocating a `sequence`
  * index array and re-hashing (plane, j) per element per ROW —
  * measured as the dominant cost of ann_lsh/dd_embedding. The plane
  * matrix depends only on (plane, j), so it is computed once per
  * executor (lazily, grown to the observed dimension) and each row
  * costs just planes×dim fused multiply-adds. */
case class HyperplaneKeys(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression with CodegenFallback {
  require(bits > 0 && bits <= 30, s"bits=$bits out of range")
  // the whole key range must fit in Int or table key spaces collide
  require(tables > 0 && tables.toLong * (1L << bits) <= Int.MaxValue,
    s"bits=$bits x tables=$tables overflows the Int key space")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes() =
    GraftTypeChecks.expect(child, "graft_hyperplane_keys", {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    }, "ARRAY<FLOAT|DOUBLE>")

  @transient private var comps: Array[Array[Double]] = _

  /** comps(plane)(j), grown on demand to the observed dimension.
    * Benign under concurrent eval: rebuilds are identical. */
  private def planeComps(dim: Int): Array[Array[Double]] = {
    var c = comps
    if (c == null || c(0).length < dim) {
      c = Array.tabulate(bits * tables, dim) { (p, j) =>
        val pm = {
          val m = XXH64.hashInt(j, XXH64.hashInt(p, 42L)) % 10000L
          if (m < 0) m + 10000L else m
        }
        pm.toDouble / 10000.0 - 0.5
      }
      comps = c
    }
    c
  }

  private lazy val isFloat = child.dataType
    .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    .elementType == org.apache.spark.sql.types.FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var j = 0
    while (j < n) {
      // embeddings carry no null elements; a null contributes 0
      if (!arr.isNullAt(j))
        v(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    val c = planeComps(n)
    val keys = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var key = t * (1 << bits)
      var i = 0
      while (i < bits) {
        val cp = c(t * bits + i)
        var proj = 0.0
        var k = 0
        while (k < n) { proj += v(k) * cp(k); k += 1 }
        if (proj >= 0) key |= (1 << i)
        i += 1
      }
      keys(t) = key
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneKeys =
    copy(child = newChild)
}

/** Nearest-centroid assignment for IVF/k-means (SURVEY.md §2c ann53):
  * cluster id of the max-cosine centroid, ties to the LARGER id —
  * identical to `max(struct(cosine, cluster))` over a broadcast
  * centroid table, but evaluated as a per-row projection: no
  * crossJoin row blow-up and no per-vector argmax shuffle. The
  * centroid matrix rides into the plan as literal state (k×dim
  * doubles), exactly what a broadcast would ship. */
case class NearestCentroid(child: Expression, ids: Seq[Int], cents: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {
  require(ids.nonEmpty && ids.length == cents.length)

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes() =
    GraftTypeChecks.expect(child, "graft_nearest_centroid", {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    }, "ARRAY<FLOAT|DOUBLE>")

  @transient private lazy val cArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  @transient private lazy val cNrm: Array[Double] = cArr.map { a =>
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    math.sqrt(s)
  }
  @transient private lazy val isFloat = child.dataType
    .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    .elementType == org.apache.spark.sql.types.FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j))
        v(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    var s = 0.0
    j = 0
    while (j < n) { s += v(j) * v(j); j += 1 }
    val vNrm = math.sqrt(s)
    var bestCos = Double.NegativeInfinity
    var bestId = ids(0)
    var k = 0
    while (k < cArr.length) {
      val c = cArr(k)
      val m = math.min(n, c.length)
      var d = 0.0
      var i = 0
      while (i < m) { d += v(i) * c(i); i += 1 }
      val cos = if (vNrm == 0 || cNrm(k) == 0) 0.0 else d / (vNrm * cNrm(k))
      // >= : ties resolve to the LARGEST cluster id seen (ids ascending
      // callers) — matches max(struct(cos, cluster)) semantics
      if (cos > bestCos || (cos == bestCos && ids(k) > bestId)) {
        bestCos = cos; bestId = ids(k)
      }
      k += 1
    }
    bestId
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Argmin-by-squared-L2 over a plan-shipped centroid matrix — the
  * product-quantization counterpart of [[NearestCentroid]] (PQ trains
  * and encodes in L2 space, Jegou et al. '11). Distances accumulate
  * left-to-right in doubles (the same fold order the DuckDB oracle's
  * list_reduce replays); ties resolve to the LOWEST centroid id, the
  * first-index-wins convention of every PQ codebook. One virtual-call-
  * free loop per row: O(k·dsub) with k·dsub constants — at 100 TB this
  * runs as a scan-local projection, never a join. */
case class NearestCentroidL2(child: Expression, ids: Seq[Int], cents: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {
  require(ids.nonEmpty && ids.length == cents.length)

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes() =
    GraftTypeChecks.expect(child, "graft_nearest_centroid_l2", {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    }, "ARRAY<FLOAT|DOUBLE>")

  @transient private lazy val cArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  @transient private lazy val isFloat = child.dataType
    .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    .elementType == org.apache.spark.sql.types.FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j))
        v(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    var bestD = Double.PositiveInfinity
    var bestId = Int.MaxValue
    var k = 0
    while (k < cArr.length) {
      val c = cArr(k)
      val m = math.min(n, c.length)
      var d = 0.0
      var i = 0
      while (i < m) { val t = v(i) - c(i); d += t * t; i += 1 }
      if (d < bestD || (d == bestD && ids(k) < bestId)) { bestD = d; bestId = ids(k) }
      k += 1
    }
    bestId
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidL2 =
    copy(child = newChild)
}

/** Per-document character-distribution entropy statistics in ONE
  * scan-local pass (SURVEY.md §2c ta_entropy) — the "is this text or
  * line noise" quality signal (compressed/random blobs max out
  * entropy; repeated boilerplate minimizes it).
  *
  * Everything is exact-integer so the result hash-matches DuckDB:
  * floor(log2 c) is the MSB position (= LENGTH(bin(c)) - 1 in the
  * oracle), and the entropy numerator n·⌊log2 n⌋ − Σ cᵢ·⌊log2 cᵢ⌋ is
  * an exact BIGINT ("floor-log2 bits", the same cross-engine domain
  * as ta_lm). Counts are per Unicode CODE POINT, matching DuckDB's
  * `string_split(text, '')`.
  *
  * 100 TB shape: the whole histogram lives inside one generated-code
  * call per row — no explode to char rows, no shuffle at all for the
  * per-doc output (the oracle's unnest-to-chars plan is the shape this
  * expression exists to avoid). Codegen emits a static call, keeping
  * the projection inside whole-stage codegen.
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{StructType, StructField}
  override def dataType: DataType = CharEntropyStats.schema
  override def checkInputDataTypes() =
    GraftTypeChecks.expect(child, "graft_char_entropy",
      _ == org.apache.spark.sql.types.StringType, "STRING")

  override def nullSafeEval(input: Any): Any =
    CharEntropyStats.rowOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyStats.rowOf($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

object CharEntropyStats {
  import org.apache.spark.sql.types.{StructType, StructField}
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("sum_c_log2c", LongType, nullable = false),
    StructField("entropy_bits_floor", LongType, nullable = false)))

  def floorLog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)

  def rowOf(s: UTF8String): InternalRow = {
    val str = s.toString
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Array[Long]] = null
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Long]]()
        val cell = other.get(cp)
        if (cell == null) other.put(cp, Array(1L)) else cell(0) += 1
      }
    }
    var distinct = 0L
    var sum = 0L
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0) { distinct += 1; sum += c * floorLog2(c) }
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        distinct += 1
        sum += c * floorLog2(c)
      }
    }
    val ent = if (n == 0) 0L else n * floorLog2(n) - sum
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, distinct, sum, ent))
  }
}

/** Shared analysis-time input-type validation (AbstractDataType /
  * ExpectsInputTypes are private[sql] in Spark 4, so the check is
  * spelled directly). */
object GraftTypeChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  def expect(child: Expression, fn: String,
      ok: DataType => Boolean, expected: String): TypeCheckResult =
    if (ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn expects $expected, got ${child.dataType.catalogString}")
}

/** Column-level entry points. */
object TextExpressions {
  private def expr(c: Column): Expression = ColumnBridge.expression(c)
  def rolling_hash(c: Column): Column = ColumnBridge.column(RollingHash(expr(c)))
  def simhash64(c: Column): Column = ColumnBridge.column(SimHash64(expr(c)))
  def minhash_sig(c: Column, numPerms: Int): Column =
    ColumnBridge.column(MinHashSig(expr(c), numPerms))
  def hyperplane_keys(c: Column, bits: Int, tables: Int): Column =
    ColumnBridge.column(HyperplaneKeys(expr(c), bits, tables))
  def nearest_centroid(c: Column, ids: Seq[Int], cents: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCentroid(expr(c), ids, cents))
  def nearest_centroid_l2(c: Column, ids: Seq[Int], cents: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCentroidL2(expr(c), ids, cents))
  def fnv64(c: Column): Column = ColumnBridge.column(Fnv64(expr(c)))
  def band_keys(c: Column, rowsPerBand: Int): Column =
    ColumnBridge.column(BandKeys(expr(c), rowsPerBand))
  def bloom_positions(c: Column, mBits: Int, nHash: Int): Column =
    ColumnBridge.column(BloomPositions(expr(c), mBits, nHash))
  def char_entropy(c: Column): Column =
    ColumnBridge.column(CharEntropyStats(expr(c)))
}
