package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke net for the relational/pipeline queries beyond the DuckDB
  * oracle: every SparkEntry query runs at sf0.001 and returns rows
  * (streaming queries included). */
class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("every SparkEntry query returns rows at sf0.001") {
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf).count()
    }
    val empty = counts.filter(_._2 == 0L).map(_._1)
    assert(empty.isEmpty, s"queries with no rows: $empty")
  }

  test("every query key has either an oracle or a documented rows-only check") {
    val keys = SparkEntry.queries.keySet
    val oracleKeys = SparkEntry.oracleSql.keySet
    assert(oracleKeys.subsetOf(keys), s"orphan oracles: ${oracleKeys -- keys}")
    // rows-only queries are exactly the non-SQL-expressible ones
    val rowsOnly = keys -- oracleKeys
    val expectedRowsOnly = Set("a6_vec_rotate", "b2_ivf_train", "b3_ivf_assign",
      "b4_rabitq_code", "b5_exrabitq_code", "b5b_exrabitq_b8", "b6_rabitq_estimate",
      "b7_ivf_search", "b7b_ivf_search_b8", "b8_ann_recall", "b9_index_build",
      "b10_ann_ratio", "b11_nprobe_sweep", "b12_search_highacc",
      "b13_stream_index", "b14_search_filtered", "b15_index_lifecycle",
      "b16_search_quantized",
      "c2_dedup_minhash", "c3_dedup_simhash", "c9_doc_fingerprint",
      "c11_media_embed", "c23_semdedup", "c33_quality_classifier",
      "c34_bpe_train", "d6_stream_dedup")
    assert(rowsOnly.subsetOf(expectedRowsOnly), s"unexpected rows-only: ${rowsOnly -- expectedRowsOnly}")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
