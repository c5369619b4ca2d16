package graft.queries

/** DuckDB SQL fragments that replicate graft's byte-level primitives
  * EXACTLY, so operators built on them stay hash-comparable.
  *
  * DuckDB has no byte indexing on BLOBs, so bytes are read as hex
  * pairs: `hex(encode(s))` then `substr(hx, 2*i-1, 2)` parsed with a
  * `'0x..'` cast. Wrapping 64-bit arithmetic (Java long semantics) is
  * emulated in HUGEINT (int128) with mod-2^64 reduction, mapped back
  * to the signed range at the end. Validated byte-for-byte against
  * [[graft.functions.RollingHash.hashBytes]] on the test corpus.
  */
object OracleSql {

  private val M64 = "CAST('18446744073709551616' AS HUGEINT)" // 2^64
  private val SMAX = "CAST('9223372036854775808' AS HUGEINT)" // 2^63

  /** 2^64 as a HUGEINT SQL literal, for callers composing folds. */
  def m64: String = M64

  /** Unsigned bytes (0..255) of the UTF-8 encoding of `hxCol`, where
    * `hxCol` must be `hex(encode(<string>))` and `lenCol` its
    * `octet_length(encode(<string>))`. */
  def unsignedBytes(hxCol: String, lenCol: String): String =
    s"list_transform(range(1, $lenCol + 1), " +
      s"i -> CAST(concat('0x', substr($hxCol, 2*i - 1, 2)) AS INT))"

  /** Java-signed bytes (-128..127): ((b + 128) % 256) - 128. */
  def signedBytes(hxCol: String, lenCol: String): String =
    s"list_transform(range(1, $lenCol + 1), " +
      s"i -> CAST(((CAST(concat('0x', substr($hxCol, 2*i - 1, 2)) AS INT) + 128) % 256) - 128 AS HUGEINT))"

  /** graft_rolling_hash over a signed-byte HUGEINT list expression:
    * h0 = 1125899906842597; h = h*31 + byte, wrapping 64-bit, returned
    * as signed BIGINT (see [[graft.functions.RollingHash]]). */
  def rollingHash(signedBytesExpr: String): String = {
    val fold =
      s"list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), $signedBytesExpr), " +
        s"(a, b) -> (a * 31 + b) % $M64)"
    val norm = s"((($fold) % $M64) + $M64) % $M64"
    s"CAST(CASE WHEN ($norm) >= $SMAX THEN ($norm) - $M64 ELSE ($norm) END AS BIGINT)"
  }

  /** FNV-1a 64 of a token expression's UTF-8 bytes, as unsigned
    * HUGEINT in [0, 2^64): xor runs in the signed BIGINT domain (safe:
    * the byte only touches the low 8 bits), the wrapping multiply in
    * HUGEINT mod 2^64 — see [[graft.functions.SimHash64.fnv1a64]]. */
  def fnv1a64Unsigned(tokExpr: String): String = {
    val bytes =
      s"list_transform(range(1, octet_length(encode($tokExpr)) + 1), " +
        s"i -> CAST(CAST(concat('0x', substr(hex(encode($tokExpr)), 2*i - 1, 2)) AS INT) AS HUGEINT))"
    s"list_reduce(list_prepend(CAST('14695981039346656037' AS HUGEINT), $bytes), " +
      s"(h, b) -> (CAST(xor(CAST(CASE WHEN h >= $SMAX THEN h - $M64 ELSE h END AS BIGINT), " +
      s"CAST(b AS BIGINT)) AS HUGEINT) % $M64 + $M64) % $M64 " +
      s"* CAST(1099511628211 AS HUGEINT) % $M64)"
  }

  /** Signed-BIGINT view of an unsigned HUGEINT in [0, 2^64). */
  def toSigned(uExpr: String): String =
    s"CAST(CASE WHEN ($uExpr) >= $SMAX THEN ($uExpr) - $M64 ELSE ($uExpr) END AS BIGINT)"

  /** Unsigned HUGEINT view in [0, 2^64) of a signed BIGINT. */
  def toUnsigned(sExpr: String): String =
    s"((CAST($sExpr AS HUGEINT) % $M64 + $M64) % $M64)"

  /** Bitwise xor of two unsigned HUGEINTs via the signed domain
    * (DuckDB xor is BIGINT-only; the bit pattern is width-preserved). */
  def xorU(ua: String, ub: String): String =
    toUnsigned(s"xor(${toSigned(ua)}, ${toSigned(ub)})")

  /** (u * c) mod 2^64 with c a 64-bit constant — c is split into
    * 32-bit halves so every intermediate stays under 2^97 (a full
    * 64x64 product overflows INT128). */
  def mulModConst(uExpr: String, c: BigInt): String = {
    val bh = c >> 32
    val bl = c & 0xFFFFFFFFL
    s"(((($uExpr) * $bl) + (((($uExpr) * $bh) % 4294967296) * 4294967296)) % $M64)"
  }

  /** splitmix64 (the MinHash permutation hash — see
    * [[graft.functions.MinHashSig.splitmix64]]) as a chain of
    * MATERIALIZED CTEs: `fromRel(carryCols..., inCol)` →
    * `<prefix>5(carryCols..., z5)` with z5 the result as UBIGINT.
    *
    * Every step must be MATERIALIZED: DuckDB inlines plain CTEs and
    * lateral aliases, and the xor steps reference their input twice —
    * textual inlining grows the expression tree exponentially (~2⁶×),
    * measured as a >280s timeout vs seconds materialized. Xors and
    * logical shifts run natively on UBIGINT; only the wrapping
    * multiplies (and the seed add) detour through HUGEINT mod 2^64. */
  def splitmixCtes(fromRel: String, inCol: String, carry: Seq[String],
      prefix: String): (String, String) = {
    val cols = carry.mkString(", ")
    def step(i: Int, expr: String, from: String) =
      s"$prefix$i AS MATERIALIZED (SELECT $cols, $expr AS z$i FROM $from)"
    def toU(h: String) = s"CAST($h AS UBIGINT)"
    val steps = Seq(
      step(0, toU(s"((($inCol) + CAST('11400714819323198485' AS HUGEINT)) % $M64)"), fromRel),
      step(1, "xor(z0, z0 >> 30)", s"${prefix}0"),
      step(2, toU(mulModConst("CAST(z1 AS HUGEINT)", BigInt("13787848793156543929"))), s"${prefix}1"),
      step(3, "xor(z2, z2 >> 27)", s"${prefix}2"),
      step(4, toU(mulModConst("CAST(z3 AS HUGEINT)", BigInt("10723151780598845931"))), s"${prefix}3"),
      step(5, "xor(z4, z4 >> 31)", s"${prefix}4"))
    (steps.mkString(",\n"), s"${prefix}5")
  }

  /** SimHash bit-vote: given a per-(doc, token-hash) relation aliased
    * `th(doc_id, h)`, emits the 64-bit signature as signed BIGINT.
    * Bit b is set when more token hashes have bit b set than clear. */
  def simhashFromHashes: String = {
    val su = (0 until 64).map { b =>
      s"CASE WHEN SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 " +
        s"THEN CAST('${java.math.BigInteger.ONE.shiftLeft(b)}' AS HUGEINT) ELSE CAST(0 AS HUGEINT) END"
    }.mkString(" + ")
    s"SELECT doc_id, ${toSigned("su")} AS sig " +
      s"FROM (SELECT doc_id, $su AS su FROM th GROUP BY doc_id)"
  }

  /** Plane `plane`'s coefficient vector as a SQL list literal,
    * replayed with the SAME values as
    * [[graft.functions.HyperplaneKeys]]: component j is
    * pmod(xxhash64(plane, j), 10000)/10000 - 0.5, precomputed here on
    * the driver and embedded as `m/10000.0 - 0.5` expressions so
    * DuckDB's correctly-rounded double division reproduces the value
    * bit-for-bit (a decimal rendering would not round-trip). */
  private def planeCoefs(plane: Int, dim: Int): String = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    (0 until dim).map { j =>
      val m = {
        val x = XXH64.hashInt(j, XXH64.hashInt(plane, 42L)) % 10000L
        if (x < 0) x + 10000L else x
      }
      s"$m/10000.0 - 0.5"
    }.mkString("[", ", ", "]")
  }

  /** Multi-table hyperplane bucket keys as CTEs: `n` →
    * `outRel(vec_id, keys)` mirroring [[graft.functions
    * .HyperplaneKeys]]: table t's key is Σᵢ (proj(t·bits+i) ≥ 0)·2ⁱ +
    * t·2^bits. The coefficient matrix is a VALUES relation built once
    * — inlining the list literal into a per-row lambda makes DuckDB
    * rebuild it per row (measured 18s → ~1s for ann_lsh). `dim` must
    * cover the embedding length (extra coefficients are never
    * indexed). */
  def hyperplaneKeysCtes(outRel: String, bits: Int, tables: Int, dim: Int): String = {
    val rows = (0 until bits * tables)
      .map(p => s"($p, ${planeCoefs(p, dim)})").mkString(",\n    ")
    s"""hplanes AS (
       |  SELECT * FROM (VALUES
       |    $rows) AS t(plane, coefs)
       |), hproj AS MATERIALIZED (
       |  SELECT n.vec_id, p.plane,
       |    list_reduce(list_transform(range(1, len(n.e) + 1), j -> n.e[j] * p.coefs[j]),
       |      (a, b) -> a + b) AS pr
       |  FROM n, hplanes p
       |), $outRel AS MATERIALIZED (
       |  SELECT vec_id, list(key ORDER BY t) AS keys FROM (
       |    SELECT vec_id, plane // $bits AS t,
       |      CAST(SUM(CASE WHEN pr >= 0 THEN (1 << (plane % $bits)) ELSE 0 END)
       |        + (plane // $bits) * ${1 << bits} AS INT) AS key
       |    FROM hproj GROUP BY vec_id, plane // $bits)
       |  GROUP BY vec_id
       |)""".stripMargin
  }

  /** Spark-equivalent whitespace tokens of trimmed text. */
  def tokens(textExpr: String): String =
    s"string_split_regex(trim($textExpr), '\\s+')"

  /** Distinct word 3-shingles of a token-list expression (strings,
    * joined by single spaces) — the oracle-side stand-in for graft's
    * hashed shingles (counts agree barring ~2^-64 hash collisions). */
  def shingles3(toksExpr: String): String = shinglesK(toksExpr, 3)

  /** Distinct word k-shingles (generalizes [[shingles3]]; mirrors
    * TextFunctions.shingles including the short-doc whole-text
    * fallback). */
  def shinglesK(toksExpr: String, k: Int): String = {
    val gram = (0 until k).map(j => s"($toksExpr)[i+$j]").mkString(" || ' ' || ")
    s"list_distinct(CASE WHEN len($toksExpr) >= $k " +
      s"THEN list_transform(range(1, len($toksExpr) - ${k - 2}), i -> $gram) " +
      s"ELSE [list_aggregate($toksExpr, 'string_agg', ' ')] END)"
  }

  // ---- ANN oracles (embeddings) --------------------------------------

  /** Base CTEs `v`/`n` over embeddings: double-cast vectors + left-fold
    * norms (bit-identical to TextFunctions.l2norm). */
  def annBaseCtes: String =
    """v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings
      |), n AS MATERIALIZED (
      |  SELECT vec_id, e,
      |    sqrt(list_reduce(list_transform(e, x -> x*x), (a,b) -> a+b)) AS nrm
      |  FROM v
      |)""".stripMargin

  /** Cosine of two double-list expressions with precomputed norms —
    * the left-fold double dot of TextFunctions.dot/cosineFromDot. */
  def cosine(aE: String, bE: String, aN: String, bN: String): String =
    s"CASE WHEN $aN = 0 OR $bN = 0 THEN 0.0 " +
      s"ELSE list_reduce(list_transform(range(1, len($aE)+1), i -> ($aE)[i] * ($bE)[i]), " +
      s"(a,b) -> a+b) / ($aN * $bN) END"

  /** Per-query top-k cut over a relation `fromRel(query_id,
    * neighbor_id, cosine)` → `outRel(query_id, neighbor_id, cosine,
    * "rank")`, ties by neighbor_id as in the Spark window. */
  def topkCte(fromRel: String, outRel: String, k: Int): String =
    s"""$outRel AS MATERIALIZED (
       |  SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS "rank"
       |  FROM (SELECT *, row_number() OVER
       |          (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
       |        FROM $fromRel)
       |  WHERE rk <= $k
       |)""".stripMargin

  /** Brute-force cosine top-k: `n` → `outRel`. */
  def annBruteforceCtes(outRel: String, numQueries: Int, k: Int): String =
    s"""bfp AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${cosine("c.e", "q.e", "c.nrm", "q.nrm")} AS cosine
       |  FROM n c, n q
       |  WHERE q.vec_id < $numQueries AND c.vec_id <> q.vec_id
       |), ${topkCte("bfp", outRel, k)}""".stripMargin

  /** Multi-table hyperplane LSH top-k: `n` → `outRel`. */
  def annLshCtes(outRel: String, bits: Int, tables: Int,
      numQueries: Int, k: Int): String =
    s"""${hyperplaneKeysCtes("lk", bits, tables, 96)}, lck AS (
       |  SELECT vec_id, unnest(keys) AS bkey FROM lk
       |), lqk AS (
       |  SELECT vec_id AS query_id, unnest(keys) AS q_bkey FROM lk
       |  WHERE vec_id < $numQueries
       |), lcand AS MATERIALIZED (
       |  SELECT DISTINCT c.vec_id, q.query_id
       |  FROM lck c JOIN lqk q ON c.bkey = q.q_bkey AND c.vec_id <> q.query_id
       |), lp AS (
       |  SELECT lcand.query_id, c.vec_id AS neighbor_id,
       |    ${cosine("c.e", "q.e", "c.nrm", "q.nrm")} AS cosine
       |  FROM lcand
       |  JOIN n c ON c.vec_id = lcand.vec_id
       |  JOIN n q ON q.vec_id = lcand.query_id
       |), ${topkCte("lp", outRel, k)}""".stripMargin

  /** The unrolled spherical k-means SHARED by [[annIvfCtes]] and the
    * semantic-dedup oracle: `n` → CTEs ending in `af` (vec_id →
    * cluster, the final assignment). Replays graft's deterministic
    * k-means exactly — first-k init, nearest assignment with (cos,
    * cluster) max ties, floor-scaled integer mean sums (see
    * AnnOps.kmeansCentroids) — so even the learned index is
    * hash-comparable. */
  def annKmeansCtes(ivfK: Int, iters: Int, scale: Long): String = {
    def cnrmWrap(inner: String) =
      s"""SELECT cluster, c,
         |    sqrt(list_reduce(list_transform(c, x -> x*x), (a,b) -> a+b)) AS cnrm
         |  FROM ($inner)""".stripMargin
    val c0 = s"""c0 AS MATERIALIZED (
       |  ${cnrmWrap(s"SELECT CAST(vec_id AS INT) AS cluster, e AS c FROM n WHERE vec_id < $ivfK")}
       |)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      val prev = s"c${i - 1}"
      val mean = s"CAST(CAST(SUM(CAST(FLOOR(n.e[p.pos] * $scale.0) AS BIGINT)) AS BIGINT) AS DOUBLE)" +
        s" / (COUNT(*) * $scale.0)"
      s"""a$i AS MATERIALIZED (
         |  SELECT vec_id, cluster FROM (
         |    SELECT n.vec_id, cp.cluster,
         |      ${cosine("n.e", "cp.c", "n.nrm", "cp.cnrm")} AS cos
         |    FROM n, $prev cp)
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster DESC) = 1
         |), c$i AS MATERIALIZED (
         |  ${cnrmWrap(
              s"""SELECT cluster, list(m ORDER BY pos) AS c FROM (
                 |    SELECT a$i.cluster, p.pos, $mean AS m
                 |    FROM a$i JOIN n USING (vec_id),
                 |      (SELECT unnest(range(1, (SELECT len(e) FROM n LIMIT 1) + 1)) AS pos) p
                 |    GROUP BY a$i.cluster, p.pos)
                 |  GROUP BY cluster""".stripMargin)}
         |)""".stripMargin
    }
    val last = s"c$iters"
    val af = s"""af AS MATERIALIZED (
       |  SELECT vec_id, cluster FROM (
       |    SELECT n.vec_id, cp.cluster,
       |      ${cosine("n.e", "cp.c", "n.nrm", "cp.cnrm")} AS cos
       |    FROM n, $last cp)
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster DESC) = 1
       |)""".stripMargin
    (Seq(c0) ++ iterCtes ++ Seq(af)).mkString(", ")
  }

  /** IVF top-k with the k-means loop UNROLLED: `n` → `outRel` (serving
    * CTEs appended to [[annKmeansCtes]]). */
  def annIvfCtes(outRel: String, ivfK: Int, iters: Int, nprobe: Int,
      numQueries: Int, k: Int, scale: Long): String = {
    val last = s"c$iters"
    val fin = s"""probes AS MATERIALIZED (
       |  SELECT query_id, qe, qnrm, cluster FROM (
       |    SELECT af.vec_id AS query_id, n.e AS qe, n.nrm AS qnrm, cp.cluster,
       |      ${cosine("n.e", "cp.c", "n.nrm", "cp.cnrm")} AS ccos
       |    FROM af JOIN n USING (vec_id), $last cp
       |    WHERE af.vec_id < $numQueries)
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, cluster) <= $nprobe
       |), ip AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    ${cosine("n.e", "p.qe", "n.nrm", "p.qnrm")} AS cosine
       |  FROM af a
       |  JOIN probes p ON a.cluster = p.cluster
       |  JOIN n ON n.vec_id = a.vec_id
       |  WHERE a.vec_id <> p.query_id
       |), ${topkCte("ip", outRel, k)}""".stripMargin
    Seq(annKmeansCtes(ivfK, iters, scale), fin).mkString(", ")
  }

  /** Product-quantization top-k with every per-subspace k-means UNROLLED:
    * `n` → `outRel`. Replays graft's deterministic PQ exactly — unit
    * normalization, m contiguous subspaces (dsub derived from len(u)
    * so the same SQL serves any dim), first-ksub init, L2 assignment
    * with lowest-cluster ties, floor-scaled integer mean sums, and ADC
    * scoring whose m partial distances add in fixed subspace order —
    * so even the compressed-code index is hash-comparable. */
  /** Left-fold squared-L2 of two equal-length list expressions (the
    * same fold order as Spark's aggregate(zip_with(...), 0.0, +)). */
  private def d2Sql(a: String, b: String) =
    s"list_reduce(list_transform(range(1, len($a)+1), " +
      s"i -> (($a)[i] - ($b)[i]) * (($a)[i] - ($b)[i])), (x,y) -> x+y)"

  /** The PQ ENCODING pipeline as CTEs: `n` → `pcodes` (vec_id →
    * per-subspace codebook indices), with the trained final codebooks
    * in `pc<mi>_<iters>` and query subvectors available from
    * `psub<mi>`. Shared by [[annPqCtes]] and [[annIvfPqCtes]] — the
    * codebooks are corpus-global (no residuals), so one encoding
    * serves both the flat and the IVF-probed serving paths. */
  def annPqCodeCtes(m: Int, ksub: Int, iters: Int, scale: Long): String = {
    def d2(a: String, b: String) = d2Sql(a, b)
    val pu =
      """pu AS MATERIALIZED (
        |  SELECT vec_id,
        |    list_transform(e, x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS u
        |  FROM n
        |)""".stripMargin
    val subs = (0 until m).map { mi =>
      s"""psub$mi AS MATERIALIZED (
         |  SELECT vec_id, list_transform(range(1, len(u)//$m + 1),
         |    i -> u[$mi*(len(u)//$m) + i]) AS sv
         |  FROM pu
         |)""".stripMargin
    }
    def assignCte(name: String, mi: Int, centRel: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT vec_id, cluster FROM (
         |    SELECT s.vec_id, cp.cluster, ${d2("s.sv", "cp.c")} AS d
         |    FROM psub$mi s, $centRel cp)
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cluster ASC) = 1
         |)""".stripMargin
    val perSub = (0 until m).flatMap { mi =>
      val c0 =
        s"""pc${mi}_0 AS MATERIALIZED (
           |  SELECT CAST(vec_id AS INT) AS cluster, sv AS c
           |  FROM psub$mi WHERE vec_id < $ksub
           |)""".stripMargin
      val itCtes = (1 to iters).flatMap { it =>
        val mean = s"CAST(CAST(SUM(CAST(FLOOR(s.sv[p.pos] * $scale.0) AS BIGINT)) AS BIGINT) AS DOUBLE)" +
          s" / (COUNT(*) * $scale.0)"
        Seq(
          assignCte(s"pa${mi}_$it", mi, s"pc${mi}_${it - 1}"),
          s"""pc${mi}_$it AS MATERIALIZED (
             |  SELECT cluster, list(mn ORDER BY pos) AS c FROM (
             |    SELECT a.cluster, p.pos, $mean AS mn
             |    FROM pa${mi}_$it a JOIN psub$mi s USING (vec_id),
             |      (SELECT unnest(range(1, (SELECT len(sv) FROM psub$mi LIMIT 1) + 1)) AS pos) p
             |    GROUP BY a.cluster, p.pos)
             |  GROUP BY cluster
             |)""".stripMargin)
      }
      Seq(c0) ++ itCtes ++ Seq(assignCte(s"pcode$mi", mi, s"pc${mi}_$iters"))
    }
    val codeJoin = (1 until m).map(mi => s"JOIN pcode$mi c$mi USING (vec_id)").mkString(" ")
    val codes =
      s"""pcodes AS MATERIALIZED (
         |  SELECT c0.vec_id, ${(0 until m).map(mi => s"c$mi.cluster AS k$mi").mkString(", ")}
         |  FROM pcode0 c0 $codeJoin
         |)""".stripMargin
    (Seq(pu) ++ subs ++ perSub ++ Seq(codes)).mkString(", ")
  }

  /** ADC select fragments over `pcodes` + `psub*`: (centroid joins,
    * query-subvector joins, the fixed-order summed distance). */
  private def pqAdcParts(m: Int, iters: Int): (String, String, String) = (
    (0 until m)
      .map(mi => s"JOIN pc${mi}_$iters cc$mi ON cc$mi.cluster = c.k$mi").mkString("\n  "),
    (1 until m)
      .map(mi => s"JOIN psub$mi qs$mi ON qs$mi.vec_id = qs0.vec_id").mkString(" "),
    (0 until m).map(mi => d2Sql(s"qs$mi.sv", s"cc$mi.c")).mkString(" + "))

  def annPqCtes(outRel: String, m: Int, ksub: Int, iters: Int,
      numQueries: Int, k: Int, scale: Long): String = {
    val (centJoins, qJoins, adist) = pqAdcParts(m, iters)
    val fin =
      s"""pqd AS (
         |  SELECT qs0.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    $adist AS adist
         |  FROM pcodes c
         |  $centJoins
         |  , psub0 qs0 $qJoins
         |  WHERE qs0.vec_id < $numQueries AND c.vec_id <> qs0.vec_id
         |), $outRel AS MATERIALIZED (
         |  SELECT query_id, neighbor_id, adist, CAST(rk AS INT) AS "rank"
         |  FROM (SELECT *, row_number() OVER
         |          (PARTITION BY query_id ORDER BY adist ASC, neighbor_id) AS rk
         |        FROM pqd)
         |  WHERE rk <= $k
         |)""".stripMargin
    Seq(annPqCodeCtes(m, ksub, iters, scale), fin).mkString(", ")
  }

  /** IVF+PQ (IVFADC, Jegou '11) with BOTH learned stages unrolled:
    * `n` → `outRel`. Composes [[annKmeansCtes]] (the coarse quantizer,
    * identical to ann_ivf's) with [[annPqCodeCtes]] (the codebooks,
    * identical to ann_pq's): each query's nprobe nearest clusters by
    * final-centroid cosine, ADC scoring only inside the probed
    * lists. */
  def annIvfPqCtes(outRel: String, ivfK: Int, ivfIters: Int, nprobe: Int,
      m: Int, ksub: Int, pqIters: Int, numQueries: Int, k: Int,
      scale: Long): String = {
    val (centJoins, qJoins, adist) = pqAdcParts(m, pqIters)
    val fin =
      s"""ipqpr AS MATERIALIZED (
         |  SELECT query_id, cluster FROM (
         |    SELECT af.vec_id AS query_id, cp.cluster,
         |      ${cosine("n.e", "cp.c", "n.nrm", "cp.cnrm")} AS ccos
         |    FROM af JOIN n USING (vec_id), c$ivfIters cp
         |    WHERE af.vec_id < $numQueries)
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, cluster) <= $nprobe
         |), ipqd AS (
         |  SELECT qs0.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    $adist AS adist
         |  FROM pcodes c
         |  $centJoins
         |  JOIN af ca ON ca.vec_id = c.vec_id
         |  JOIN ipqpr pr ON pr.cluster = ca.cluster
         |  , psub0 qs0 $qJoins
         |  WHERE qs0.vec_id < $numQueries AND c.vec_id <> qs0.vec_id
         |    AND pr.query_id = qs0.vec_id
         |), $outRel AS MATERIALIZED (
         |  SELECT query_id, neighbor_id, adist, CAST(rk AS INT) AS "rank"
         |  FROM (SELECT *, row_number() OVER
         |          (PARTITION BY query_id ORDER BY adist ASC, neighbor_id) AS rk
         |        FROM ipqd)
         |  WHERE rk <= $k
         |)""".stripMargin
    Seq(annKmeansCtes(ivfK, ivfIters, scale),
      annPqCodeCtes(m, ksub, pqIters, scale), fin).mkString(", ")
  }

  /** Scalar-quantization (SQ8) top-k: `n` → `outRel`. Replays
    * [[graft.operators.AnnOps.sqTopK]] exactly — unit vectors, the
    * per-dimension MIN/MAX grid (order-independent, so cross-engine
    * exact without integer scaling), clamped floor codes, midpoint
    * dequantization, and the left-fold asymmetric squared-L2. */
  def annSqCtes(outRel: String, levels: Int, numQueries: Int, k: Int): String = {
    val l = s"$levels.0"
    s"""squ AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(e, x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS u
       |  FROM n
       |), sqstat AS MATERIALIZED (
       |  SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs FROM (
       |    SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM (
       |      SELECT unnest(range(1, len(u)+1)) AS pos, unnest(u) AS x FROM squ)
       |    GROUP BY pos)
       |), sqdeq AS MATERIALIZED (
       |  SELECT vec_id, u, list_transform(range(1, len(u)+1), i ->
       |    CASE WHEN s.maxs[i] = s.mins[i] THEN s.mins[i]
       |         ELSE s.mins[i] +
       |           (LEAST(${levels - 1}, GREATEST(0, CAST(FLOOR((u[i] - s.mins[i]) / (s.maxs[i] - s.mins[i]) * $l) AS BIGINT)))
       |              + 0.5) * (s.maxs[i] - s.mins[i]) / $l END) AS deq
       |  FROM squ, sqstat s
       |), sqp AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_reduce(list_transform(range(1, len(q.u)+1),
       |      i -> (q.u[i] - c.deq[i]) * (q.u[i] - c.deq[i])), (x,y) -> x+y) AS adist
       |  FROM sqdeq c, sqdeq q
       |  WHERE q.vec_id < $numQueries AND c.vec_id <> q.vec_id
       |), $outRel AS MATERIALIZED (
       |  SELECT query_id, neighbor_id, adist, CAST(rk AS INT) AS "rank"
       |  FROM (SELECT *, row_number() OVER
       |          (PARTITION BY query_id ORDER BY adist ASC, neighbor_id) AS rk
       |        FROM sqp)
       |  WHERE rk <= $k
       |)""".stripMargin
  }

  /** The MinHash+LSH band-key pipeline as a CTE block: from a relation
    * `shRel(doc_id, sh)` of string shingle sets to `bk(doc_id, bkey)`
    * of signed band keys — FNV shingle hashes, `numPerms` splitmix64
    * permutation minima (seeds embedded from
    * [[graft.functions.MinHashSig.seed]]), and the wrapping
    * polynomial band fold of [[graft.functions.BandKeys]]. */
  def minhashBandCtes(shRel: String, numPerms: Int, rowsPerBand: Int): String = {
    val seeds = (0 until numPerms)
      .map(graft.functions.MinHashSig.seed).mkString("[", ", ", "]")
    val (smCtes, smLast) = splitmixCtes("sx", "u0", Seq("h", "p"), "sm")
    // splitmix chains run once per DISTINCT shingle hash (shingles
    // repeat across near-dup docs), then join back per (doc, hash)
    s"""hh AS MATERIALIZED (
       |  SELECT doc_id, ${toSigned(fnv1a64Unsigned("s"))} AS h
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM $shRel)
       |), hd AS (
       |  SELECT DISTINCT h FROM hh
       |), sx AS MATERIALIZED (
       |  SELECT h, p, ${toUnsigned(s"xor(h, ($seeds)[p + 1])")} AS u0
       |  FROM hd, (SELECT unnest(range($numPerms)) AS p)
       |),
       |$smCtes,
       |hp AS MATERIALIZED (
       |  SELECT h, p, ${toSigned("CAST(z5 AS HUGEINT)")} AS v FROM $smLast
       |), sig AS (
       |  SELECT hh.doc_id, hp.p AS p, MIN(hp.v) AS c
       |  FROM hh JOIN hp USING (h) GROUP BY hh.doc_id, hp.p
       |), band AS (
       |  SELECT doc_id, p // $rowsPerBand AS b, list(c ORDER BY p) AS comps
       |  FROM sig GROUP BY doc_id, p // $rowsPerBand
       |), bk AS (
       |  SELECT doc_id, ${toSigned(
            s"list_reduce(list_prepend(CAST(b AS HUGEINT), " +
            s"list_transform(comps, cc -> ${toUnsigned("cc")})), " +
            s"(acc, cu) -> (acc * 31 + cu) % $M64)")} AS bkey
       |  FROM band
       |)""".stripMargin
  }

  /** Stopword-hit ratio of a token list against an inline list. */
  def stopwordScore(toksCol: String, words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"CASE WHEN len($toksCol) = 0 THEN 0.0 ELSE " +
      s"CAST(len(list_filter($toksCol, x -> list_contains($lst, x))) AS DOUBLE) / len($toksCol) END"
  }
}
