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

  /** Stopword-hit ratio of a token list against an inline list. */
  def stopwordScore(toksCol: String, words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"CASE WHEN len($toksCol) = 0 THEN 0.0 ELSE " +
      s"CAST(len(list_filter($toksCol, x -> list_contains($lst, x))) AS DOUBLE) / len($toksCol) END"
  }
}
