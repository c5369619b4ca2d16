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
    * 32-bit halves so every intermediate stays under 2^96 (a full
    * 64x64 product overflows INT128). */
  def mulModConst(uExpr: String, c: BigInt): String = {
    val bh = c >> 32
    val bl = c & 0xFFFFFFFFL
    s"(((($uExpr) * $bl) % $M64 + (((($uExpr) * $bh) % 4294967296) * 4294967296) % $M64) % $M64)"
  }

  /** splitmix64 (the MinHash permutation hash — see
    * [[graft.functions.MinHashSig.splitmix64]]) as a chain of
    * MATERIALIZED CTEs: `fromRel(carryCols..., inCol)` →
    * `<prefix>5(carryCols..., z5)` with z5 the unsigned result.
    *
    * Every step must be MATERIALIZED: DuckDB inlines plain CTEs and
    * lateral aliases, and the xor steps reference their input twice —
    * textual inlining grows the expression tree exponentially (~2⁶×),
    * measured as a >280s timeout vs ~3s materialized. */
  def splitmixCtes(fromRel: String, inCol: String, carry: Seq[String],
      prefix: String): (String, String) = {
    val cols = carry.mkString(", ")
    def step(i: Int, expr: String, from: String) =
      s"$prefix$i AS MATERIALIZED (SELECT $cols, $expr AS z$i FROM $from)"
    val steps = Seq(
      step(0, s"(($inCol) + CAST('11400714819323198485' AS HUGEINT)) % $M64", fromRel),
      step(1, xorU("z0", s"(z0) // 1073741824"), s"${prefix}0"),
      step(2, mulModConst("z1", BigInt("13787848793156543929")), s"${prefix}1"),
      step(3, xorU("z2", s"(z2) // 134217728"), s"${prefix}2"),
      step(4, mulModConst("z3", BigInt("10723151780598845931")), s"${prefix}3"),
      step(5, xorU("z4", s"(z4) // 2147483648"), s"${prefix}4"))
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

  /** Random-hyperplane projection of a double-list expression against
    * plane `plane`, replayed with the SAME coefficients as
    * [[graft.functions.HyperplaneKeys]]: component j is
    * pmod(xxhash64(plane, j), 10000)/10000 - 0.5, precomputed here on
    * the driver and embedded as `m/10000.0 - 0.5` literals so DuckDB's
    * correctly-rounded double division reproduces the value bit-for-bit
    * (a decimal rendering of the double would not round-trip). */
  def hyperplaneProj(vecExpr: String, plane: Int, dim: Int): String = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val coefs = (0 until dim).map { j =>
      val m = {
        val x = XXH64.hashInt(j, XXH64.hashInt(plane, 42L)) % 10000L
        if (x < 0) x + 10000L else x
      }
      s"$m/10000.0 - 0.5"
    }.mkString("[", ", ", "]")
    s"list_reduce(list_transform(range(1, len($vecExpr) + 1), " +
      s"j -> ($vecExpr)[j] * ($coefs)[j]), (a, b) -> a + b)"
  }

  /** Multi-table hyperplane bucket keys as a SQL list — mirrors
    * [[graft.functions.HyperplaneKeys]]: table t's key is
    * Σᵢ (proj(t·bits+i) ≥ 0)·2ⁱ + t·2^bits. `dim` must cover the
    * embedding length (extra coefficients are never indexed). */
  def hyperplaneKeysList(vecExpr: String, bits: Int, tables: Int, dim: Int): String =
    (0 until tables).map { t =>
      val bitSum = (0 until bits).map { i =>
        s"CASE WHEN ${hyperplaneProj(vecExpr, t * bits + i, dim)} >= 0 THEN ${1 << i} ELSE 0 END"
      }.mkString(" + ")
      s"($bitSum + ${t * (1 << bits)})"
    }.mkString("[", ", ", "]")

  /** Spark-equivalent whitespace tokens of trimmed text. */
  def tokens(textExpr: String): String =
    s"string_split_regex(trim($textExpr), '\\s+')"

  /** Distinct word 3-shingles of a token-list expression (strings,
    * joined by single spaces) — the oracle-side stand-in for graft's
    * hashed shingles (counts agree barring ~2^-64 hash collisions). */
  def shingles3(toksExpr: String): String =
    s"list_distinct(CASE WHEN len($toksExpr) >= 3 " +
      s"THEN list_transform(range(1, len($toksExpr) - 1), " +
      s"i -> ($toksExpr)[i] || ' ' || ($toksExpr)[i+1] || ' ' || ($toksExpr)[i+2]) " +
      s"ELSE [list_aggregate($toksExpr, 'string_agg', ' ')] END)"

  /** The MinHash+LSH band-key pipeline as a CTE block: from a relation
    * `shRel(doc_id, sh)` of string shingle sets to `bk(doc_id, bkey)`
    * of signed band keys — FNV shingle hashes, `numPerms` splitmix64
    * permutation minima (seeds embedded from
    * [[graft.functions.MinHashSig.seed]]), and the wrapping
    * polynomial band fold of [[graft.functions.BandKeys]]. */
  def minhashBandCtes(shRel: String, numPerms: Int, rowsPerBand: Int): String = {
    val seeds = (0 until numPerms)
      .map(graft.functions.MinHashSig.seed).mkString("[", ", ", "]")
    val (smCtes, smLast) = splitmixCtes("sx", "u0", Seq("doc_id", "p"), "sm")
    s"""hh AS (
       |  SELECT doc_id, ${toSigned(fnv1a64Unsigned("s"))} AS h
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM $shRel)
       |), sx AS MATERIALIZED (
       |  SELECT doc_id, p, ${toUnsigned(s"xor(h, ($seeds)[p + 1])")} AS u0
       |  FROM hh, (SELECT unnest(range($numPerms)) AS p)
       |),
       |$smCtes,
       |sig AS (
       |  SELECT doc_id, p, MIN(${toSigned("z5")}) AS c FROM $smLast GROUP BY doc_id, p
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
