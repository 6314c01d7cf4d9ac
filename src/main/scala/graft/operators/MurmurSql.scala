package graft.operators

/** DuckDB-SQL generator for Spark's feature-hashing function — the
  * piece that lets the c33/c43 trained-classifier SCORING surface join
  * the hash gate: the oracle re-derives each token's feature index
  * from the raw text instead of trusting a pinned token→index map.
  *
  * `org.apache.spark.ml.feature.HashingTF.indexOf(term)` is
  * murmur3_x86_32 over the term's UTF-8 bytes with seed 42
  * (Murmur3_x86_32.hashUnsafeBytes2 — the standard little-endian
  * 4-byte-block algorithm with the XOR-folded unsigned tail), followed
  * by nonNegativeMod(hash, numFeatures). Both feature spaces here are
  * powers of two, so nonNegativeMod of the SIGNED 32-bit hash equals
  * the unsigned value mod numFeatures — the SQL keeps every lane
  * unsigned in [0, 2^32) on BIGINT (HUGEINT for the multiplies) and
  * never needs a sign step.
  *
  * The generated fragment is a recursive CTE processing one 4-byte
  * block per recursion round over the DISTINCT token set (tokens are
  * words / character n-grams — a few bytes each, a few dozen to a few
  * hundred distinct values at test scale; the corpus itself never
  * enters the recursion). Validated value-for-value against
  * `HashingTF.indexOf` by OracleHashSpec.
  */
object MurmurSql {
  private val Hex = "0123456789abcdef"

  /** Byte `j` (0-based expression) of the token, read from the hex
    * dump column `hx`. */
  private def byteAt(j: String): String =
    s"((strpos('$Hex', substr(hx, 2*($j)+1, 1))-1)*16" +
      s" + (strpos('$Hex', substr(hx, 2*($j)+2, 1))-1))"

  /** (x * c) mod 2^32 — the multiply runs on HUGEINT (the product of
    * two 32-bit lanes overflows BIGINT), then returns to BIGINT. */
  private def mul32(x: String, c: Long): String =
    s"((($x)::HUGEINT * ${c}) % 4294967296)::BIGINT"

  /** rotl32(x, r) for an unsigned 32-bit lane held in BIGINT:
    * ((x mod 2^(32-r)) << r) + (x >> (32-r)) — no masks needed. */
  private def rotl(x: String, r: Int): String = {
    val lo = 1L << (32 - r)
    s"((($x) % $lo) * ${1L << r} + ($x) // $lo)"
  }

  private def mixK1(k1: String): String =
    mul32(rotl(mul32(k1, 0xcc9e2d51L), 15), 0x1b873593L)

  private def mixH1(h1: String, k1: String): String =
    s"(((${rotl(s"xor($h1, $k1)", 13)})::HUGEINT * 5 + ${0xe6546b64L})" +
      " % 4294967296)::BIGINT"

  /** murmur3 finalization (avalanche) of lane `h` with byte length
    * `len`. `// 65536` and `// 8192` are the unsigned `>>> 16` /
    * `>>> 13` of a lane already in [0, 2^32). */
  private def fmix(h: String, len: String): String = {
    var s = s"xor($h, $len)"
    s = s"xor($s, ($s) // 65536)"
    s = mul32(s, 0x85ebca6bL)
    s = s"xor($s, ($s) // 8192)"
    s = mul32(s, 0xc2b2ae35L)
    s"xor($s, ($s) // 65536)"
  }

  /** CTE chain `(token) -> mm_idx(token, idx)` computing
    * `HashingTF.indexOf(token)` for every row of `toksCte` (a CTE with
    * one VARCHAR column `token`). Must be spliced into a
    * `WITH RECURSIVE` list. `numFeatures` MUST be a power of two
    * (both call sites are: 2^10 and 2^12). */
  def cte(toksCte: String, numFeatures: Int, seed: Int = 42): String = {
    require(numFeatures > 0 && (numFeatures & (numFeatures - 1)) == 0,
      s"nonNegativeMod == unsigned mod requires a power of two, got $numFeatures")
    // one aligned 4-byte little-endian block at byte offset i
    val chunkK1 = s"(${byteAt("i")} + ${byteAt("i+1")}*256" +
      s" + ${byteAt("i+2")}*65536 + ${byteAt("i+3")}*16777216)"
    // the 0-3 unaligned tail bytes, XOR-folded at shifts 0/8/16
    // (k1 = 0 for an empty tail; mixK1(0) = 0, so the fold is a no-op
    // exactly as in hashUnsafeBytes2)
    val tailK1 =
      s"(CASE WHEN len > i   THEN ${byteAt("i")}          ELSE 0 END" +
        s" + CASE WHEN len > i+1 THEN ${byteAt("i+1")}*256   ELSE 0 END" +
        s" + CASE WHEN len > i+2 THEN ${byteAt("i+2")}*65536 ELSE 0 END)"
    s"""mm_b AS (SELECT token, lower(hex(encode(token))) AS hx,
       |                CAST(octet_length(encode(token)) AS BIGINT) AS len
       |         FROM $toksCte),
       |mm_r AS (
       |  SELECT token, hx, len, CAST(0 AS BIGINT) AS i,
       |         CAST($seed AS BIGINT) AS h1
       |  FROM mm_b
       |  UNION ALL
       |  SELECT token, hx, len, i + 4, ${mixH1("h1", mixK1(chunkK1))}
       |  FROM mm_r WHERE i + 4 <= len),
       |mm_t AS (SELECT token, len, xor(h1, ${mixK1(tailK1)}) AS h1t
       |         FROM mm_r WHERE i = 4 * (len // 4)),
       |mm_idx AS (SELECT token,
       |                  CAST((${fmix("h1t", "len")}) % $numFeatures AS BIGINT) AS idx
       |           FROM mm_t)""".stripMargin
  }
}
