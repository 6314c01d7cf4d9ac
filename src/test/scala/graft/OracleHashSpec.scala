package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the algorithm assumption behind [[graft.operators.MurmurSql]]:
  * `ml.feature.HashingTF.indexOf` must equal standard murmur3_x86_32
  * (little-endian 4-byte blocks, XOR-folded unsigned tail — Spark's
  * `Murmur3_x86_32.hashUnsafeBytes2`) over the term's UTF-8 bytes with
  * seed 42, reduced by unsigned mod for the power-of-two feature
  * spaces. The reference below mirrors the GENERATED SQL lane for lane
  * (unsigned 32-bit values on wider integers, `// 2^k` shifts), so a
  * divergence in either the Spark hash or the SQL's arithmetic model
  * shows up here before the driver's DuckDB gate. The SQL text itself
  * is certified end-to-end by that gate (c33/c43 hash rows).
  *
  * NOTE: mllib's deprecated HashingTF uses hashUnsafeBytes (per-byte
  * SIGN-EXTENDED tail) and produces DIFFERENT indices — the last test
  * documents the trap so nobody "simplifies" QualityModel onto it.
  */
class OracleHashSpec extends AnyFunSuite {
  private val Mask = 0xffffffffL

  private def rotl(x: Long, r: Int): Long = {
    val lo = 1L << (32 - r)
    (x % lo) * (1L << r) + x / lo
  }
  private def mul32(x: Long, c: Long): Long =
    (BigInt(x) * c % 4294967296L).toLong
  private def mixK1(k1: Long): Long =
    mul32(rotl(mul32(k1, 0xcc9e2d51L), 15), 0x1b873593L)
  private def mixH1(h1: Long, k1: Long): Long =
    (BigInt(rotl(h1 ^ k1, 13)) * 5 + 0xe6546b64L).toLong % 4294967296L
  private def fmix(h: Long, len: Long): Long = {
    var s = h ^ len
    s = s ^ (s / 65536)
    s = mul32(s, 0x85ebca6bL)
    s = s ^ (s / 8192)
    s = mul32(s, 0xc2b2ae35L)
    s ^ (s / 65536)
  }

  /** The SQL's computation, lane for lane (all values stay in
    * [0, 2^32) on a wider integer — never a signed 32-bit step). */
  private def murmurRef(term: String, numFeatures: Int, seed: Int = 42): Long = {
    val b = term.getBytes("UTF-8")
    val aligned = b.length - b.length % 4
    var h1 = seed.toLong & Mask
    var i = 0
    while (i < aligned) {
      val k1 = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      h1 = mixH1(h1, mixK1(k1))
      i += 4
    }
    var k1 = 0L
    var shift = 0
    while (i < b.length) { k1 |= (b(i) & 0xffL) << shift; shift += 8; i += 1 }
    fmix(h1 ^ mixK1(k1), b.length.toLong) % numFeatures
  }

  private val fixture = Seq(
    "", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg", "abcdefgh",
    "hello", "the", "quick", "MiXeD123", " ", "  ", "a b",
    "héllo", "ünïcode", "中文字符", "emoji-free but multi-byte ça",
    "exactly4", "exactly8", "a-rather-long-token-notforty-bytes") ++
    (0 until 64).map(i => s"tok$i")

  test("ml HashingTF.indexOf == standard murmur3 (the SQL's model), nf=1024") {
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setNumFeatures(graft.ops.QualityModel.NumFeatures)
    fixture.foreach { t =>
      assert(tf.indexOf(t).toLong ===
        murmurRef(t, graft.ops.QualityModel.NumFeatures), s"term '$t'")
    }
  }

  test("ml HashingTF.indexOf == standard murmur3, nf=4096 (c43 space)") {
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setNumFeatures(graft.ops.QualityModel.LangNumFeatures)
    fixture.foreach { t =>
      assert(tf.indexOf(t).toLong ===
        murmurRef(t, graft.ops.QualityModel.LangNumFeatures), s"term '$t'")
    }
  }

  test("feature spaces stay powers of two (the unsigned-mod shortcut)") {
    def pow2(n: Int) = n > 0 && (n & (n - 1)) == 0
    assert(pow2(graft.ops.QualityModel.NumFeatures))
    assert(pow2(graft.ops.QualityModel.LangNumFeatures))
    // MurmurSql refuses non-power-of-two spaces loudly
    intercept[IllegalArgumentException] {
      graft.operators.MurmurSql.cte("v", 1000)
    }
  }

  test("the c33/c43 oracle SQL embeds the murmur CTE and the sidecars") {
    val c33 = SparkEntry.oracleSql("c33_quality_classifier")
    val c43 = SparkEntry.oracleSql("c43_lang_classifier")
    assert(c33.contains("mm_idx") && c33.contains("c33_weights"))
    assert(c43.contains("mm_idx") && c43.contains("c43_weights"))
    assert(c33.contains(s"% ${graft.ops.QualityModel.NumFeatures}"))
    assert(c43.contains(s"% ${graft.ops.QualityModel.LangNumFeatures}"))
  }

  test("documented trap: the deprecated mllib HashingTF hashes DIFFERENTLY") {
    val mllib = new org.apache.spark.mllib.feature.HashingTF(1024)
    // sign-extended per-byte tail → different value for any term whose
    // byte length is not a multiple of 4
    assert(mllib.indexOf("hello") !== murmurRef("hello", 1024).toInt)
  }
}
