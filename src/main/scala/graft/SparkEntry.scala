package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnnQueries, PipelineQueries, Relational, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Exact vector top-k — the engine's headline capability,
    * fast and deterministic (no k-means training in the smoke path). */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.gtTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  // lazy val, not def: callers (Bench validation, Verify, GoldenGen's
  // per-key loop) read this ~100-entry Map repeatedly — rebuilding it
  // per access is pure allocation with no laziness benefit
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_vec_l2"      -> (VectorQueries.vecL2(_, _)),
    "a2_vec_dot"     -> (VectorQueries.vecDot(_, _)),
    "a3_vec_cosine"  -> (VectorQueries.vecCosine(_, _)),
    "a4_vec_norm"    -> (VectorQueries.vecNorm(_, _)),
    "a5_vec_pad"     -> (VectorQueries.vecPad(_, _)),
    "a6_vec_rotate"  -> (VectorQueries.vecRotate(_, _)),
    "b1_gt_topk"     -> (VectorQueries.gtTopK(_, _)),
    "b2_ivf_train"   -> (AnnQueries.ivfTrain(_, _)),
    "b3_ivf_assign"  -> (AnnQueries.ivfAssign(_, _)),
    "b4_rabitq_code" -> (AnnQueries.rabitqCode(_, _)),
    "b5_exrabitq_code" -> (AnnQueries.exrabitqCode(_, _)),
    "b5b_exrabitq_b8" -> (AnnQueries.exrabitqCodeB8(_, _)),
    "b6_rabitq_estimate" -> (AnnQueries.rabitqEstimate(_, _)),
    "b6b_estimate_lut" -> (AnnQueries.rabitqEstimateLut(_, _)),
    "b7_ivf_search"  -> (AnnQueries.ivfSearch(_, _)),
    "b7b_ivf_search_b8" -> (AnnQueries.ivfSearchB8(_, _)),
    "b8_ann_recall"  -> (AnnQueries.annRecall(_, _)),
    "b9_index_build" -> (AnnQueries.indexBuild(_, _)),
    "b10_ann_ratio"  -> (AnnQueries.annRatio(_, _)),
    "b11_nprobe_sweep" -> (AnnQueries.nprobeSweep(_, _)),
    "b12_search_highacc" -> (AnnQueries.searchHighAcc(_, _)),
    "b13_stream_index" -> (AnnQueries.streamIndexIngest(_, _)),
    "b14_search_filtered" -> (AnnQueries.searchFiltered(_, _)),
    "b15_index_lifecycle" -> (AnnQueries.indexLifecycle(_, _)),
    "b16_search_quantized" -> (AnnQueries.ivfSearchQuantized(_, _)),
    "c1_dedup_exact" -> (PipelineQueries.dedupExact(_, _)),
    "c2_dedup_minhash" -> (PipelineQueries.dedupMinhash(_, _)),
    "c3_dedup_simhash" -> (PipelineQueries.dedupSimhash(_, _)),
    "c4_ngram_jaccard" -> (PipelineQueries.ngramJaccard(_, _)),
    "c5_dedup_embed" -> (PipelineQueries.dedupEmbed(_, _)),
    "c6_lang_id"     -> (PipelineQueries.langId(_, _)),
    "c7_text_quality" -> (PipelineQueries.textQuality(_, _)),
    "c8_token_count" -> (PipelineQueries.tokenCount(_, _)),
    "c9_doc_fingerprint" -> (PipelineQueries.docFingerprint(_, _)),
    "c10_multimodal_meta" -> (PipelineQueries.multimodalMeta(_, _)),
    "c11_media_embed" -> (PipelineQueries.mediaEmbedSearch(_, _)),
    "c12_pii_scrub"  -> (PipelineQueries.piiScrub(_, _)),
    "c13_train_split" -> (PipelineQueries.trainSplit(_, _)),
    "c14_stratified_sample" -> (PipelineQueries.stratifiedSample(_, _)),
    "c15_pack_chunks" -> (PipelineQueries.packChunks(_, _)),
    "c16_corpus_filter" -> (PipelineQueries.corpusFilter(_, _)),
    "c17_contamination" -> (PipelineQueries.contamination(_, _)),
    "c18_corpus_stats" -> (PipelineQueries.corpusStats(_, _)),
    "c19_verified_neardup" -> (PipelineQueries.verifiedNearDup(_, _)),
    "c20_dedup_canonical" -> (PipelineQueries.dedupCanonical(_, _)),
    "c21_doc_repetition" -> (PipelineQueries.docRepetition(_, _)),
    "c22_domain_mix" -> (PipelineQueries.domainMix(_, _)),
    "c23_semdedup"   -> (PipelineQueries.semDedup(_, _)),
    "c24_substring_dedup" -> (PipelineQueries.substringDedup(_, _)),
    "c25_bm25_search" -> (PipelineQueries.bm25Search(_, _)),
    "c26_hybrid_search" -> (PipelineQueries.hybridSearch(_, _)),
    "c27_lm_perplexity" -> (PipelineQueries.ngramLm(_, _)),
    "c28_dsir_weight" -> (PipelineQueries.dsirWeight(_, _)),
    "c29_embed_contam" -> (PipelineQueries.embedContamination(_, _)),
    "c30_shuffle_shard" -> (PipelineQueries.shuffleShard(_, _)),
    "c31_boilerplate" -> (PipelineQueries.boilerplate(_, _)),
    "c32_budget_select" -> (PipelineQueries.budgetSelect(_, _)),
    "c33_quality_classifier" -> (PipelineQueries.qualityClassifier(_, _)),
    "c34_bpe_train" -> (PipelineQueries.bpeTrain(_, _)),
    "c35_bpe_encode" -> (PipelineQueries.bpeEncode(_, _)),
    "c36_frame_sample" -> (PipelineQueries.frameSample(_, _)),
    "c37_kmv_distinct" -> (PipelineQueries.kmvDistinct(_, _)),
    "c38_pipeline_profile" -> (PipelineQueries.pipelineProfile(_, _)),
    "c39_bloom_contain" -> (PipelineQueries.bloomContain(_, _)),
    "c40_weighted_sample" -> (PipelineQueries.weightedSample(_, _)),
    "c41_heavy_hitters" -> (PipelineQueries.heavyHitters(_, _)),
    "c42_trigram_lm" -> (PipelineQueries.trigramBackoff(_, _)),
    "c43_lang_classifier" -> (PipelineQueries.langClassifier(_, _)),
    "c44_url_gate" -> (PipelineQueries.urlGate(_, _)),
    "c45_ppl_bucket" -> (PipelineQueries.pplBucket(_, _)),
    "c46_pipeline_e2e" -> (PipelineQueries.pipelineE2e(_, _)),
    "c47_frame_dedup" -> (PipelineQueries.frameDedup(_, _)),
    "d1_sessionize"  -> (PipelineQueries.sessionize(_, _)),
    "d2_window_agg"  -> (PipelineQueries.windowAgg(_, _)),
    "d3_stream_agg"  -> (PipelineQueries.streamingAgg(_, _)),
    "d4_stream_user_stats" -> (PipelineQueries.streamingUserStats(_, _)),
    "d5_session_window" -> (PipelineQueries.sessionWindow(_, _)),
    "d6_stream_dedup" -> (PipelineQueries.streamingNearDup(_, _)),
    "d7_stream_gate" -> (PipelineQueries.streamingCorpusGate(_, _)),
    "d8_stream_spans" -> (PipelineQueries.streamingSpanDedup(_, _)),
    "d8b_stream_spans_mb" -> (PipelineQueries.streamingSpanDedupMb(_, _)),
    "d9_stream_contam" -> (PipelineQueries.streamingEmbedContam(_, _)),
    "d10_stream_asof" -> (PipelineQueries.streamingAsof(_, _)),
    "d11_stream_kmv" -> (PipelineQueries.streamingKmv(_, _)),
    "d14_stream_bloom" -> (PipelineQueries.streamingBloom(_, _)),
    "d15_stream_cms" -> (PipelineQueries.streamingCms(_, _)),
    "d16_stream_sample" -> (PipelineQueries.streamingSample(_, _)),
    "d12_stream_join" -> (PipelineQueries.streamingIntervalJoin(_, _)),
    "d13_stream_dropdup" -> (PipelineQueries.streamingDropDup(_, _)),
    "e1_q1_agg"      -> (Relational.q1Agg(_, _)),
    "e2_q3_join"     -> (Relational.q3Join(_, _)),
    "e3_q5_multijoin" -> (Relational.q5MultiJoin(_, _)),
    "e4_topk_window" -> (Relational.topkWindow(_, _)),
    "e5_events_rollup" -> (Relational.eventsRollup(_, _)),
    "e6_json_extract" -> (Relational.jsonExtract(_, _)),
    "e7_rollup"      -> (Relational.rollupAgg(_, _)),
    "e8_source_roundtrip" -> (Relational.sourceRoundtrip(_, _)),
    "e9_asof_join"   -> (Relational.asofJoin(_, _)),
    "e10_pivot"      -> (Relational.pivotAgg(_, _)),
    "e11_semi_join"  -> (Relational.semiJoin(_, _)),
    "e12_anti_join"  -> (Relational.antiJoin(_, _)),
    "e13_cube"       -> (Relational.cubeAgg(_, _)),
    "e14_moving_agg" -> (Relational.movingAgg(_, _)),
    "e15_setops"     -> (Relational.setOps(_, _)),
    "e16_unpivot"    -> (Relational.unpivotAgg(_, _)),
    "e17_grouping_sets" -> (Relational.groupingSetsAgg(_, _)),
    "e18_range_join" -> (Relational.rangeJoin(_, _)),
    "e19_outer_join" -> (Relational.fullOuterJoin(_, _)),
  )

  // Deterministic as-of formulation: DuckDB's native ASOF JOIN leaves
  // the choice among equal-ts clicks unspecified, while the Spark side
  // totally orders on (ts, tag, event_id). This window form mirrors
  // that exact total order, so tied data can never flake the hash.
  private val AsofSql =
    """WITH tagged AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN event_type='click' THEN 0 ELSE 1 END AS tag
      |  FROM events WHERE event_type IN ('click','purchase')
      |), enriched AS (
      |  SELECT *,
      |    LAST_VALUE(CASE WHEN tag=0 THEN event_id END IGNORE NULLS)
      |      OVER w AS click_event_id,
      |    LAST_VALUE(CASE WHEN tag=0 THEN epoch_us(ts) END IGNORE NULLS)
      |      OVER w AS click_us,
      |    LAST_VALUE(CASE WHEN tag=0 THEN value END IGNORE NULLS)
      |      OVER w AS click_value
      |  FROM tagged
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)
      |SELECT event_id, user_id, epoch_us(ts) AS purchase_us,
      | click_event_id, click_us,
      | epoch_us(ts) - click_us AS gap_us, click_value
      |FROM enriched WHERE tag=1 ORDER BY event_id""".stripMargin

  // inner equi+range join: a pure function of the input set, so the
  // stream-stream form hash-matches under any trigger schedule
  private val StreamJoinSql =
    s"""SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_us,
      | c.event_id AS click_event_id, epoch_us(c.ts) AS click_us,
      | epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type='purchase') p
      |JOIN (SELECT * FROM events WHERE event_type='click') c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts
      | AND c.ts >= p.ts - INTERVAL ${graft.streaming.StreamJoin.WindowHours} HOUR
      |ORDER BY p.event_id, c.event_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * lazy val — see [[queries]]. */
  lazy val oracleSql: Map[String, String] =
    VectorQueries.oracles ++ AnnQueries.oracles ++ PipelineQueries.oracles ++ Map(
    "e1_q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | SUM(CAST(floor(l_quantity*1e6+0.5) AS BIGINT))/1e6 AS sum_qty,
        | SUM(CAST(floor(l_extendedprice*1e6+0.5) AS BIGINT))/1e6 AS sum_base_price,
        | SUM(CAST(floor(l_extendedprice*(1-l_discount)*1e6+0.5) AS BIGINT))/1e6 AS sum_disc_price,
        | SUM(CAST(floor(l_extendedprice*(1-l_discount)*(1+l_tax)*1e6+0.5) AS BIGINT))/1e6 AS sum_charge,
        | CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "e2_q3_join" ->
      """SELECT o_orderkey,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-30'
        |  AND l_shipdate  > TIMESTAMP '1997-06-30'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "e3_q5_multijoin" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "e4_topk_window" ->
      """SELECT p_brand, p_partkey, p_retailprice, CAST(rk AS INT) AS rk FROM (
        | SELECT p_brand, p_partkey, p_retailprice,
        |  ROW_NUMBER() OVER (PARTITION BY p_brand
        |    ORDER BY p_retailprice DESC, p_partkey) AS rk
        | FROM part) t
        |WHERE rk <= 3
        |ORDER BY p_brand, rk""".stripMargin,
    "e5_events_rollup" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "e6_json_extract" ->
      """SELECT event_type,
        | CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS n_distinct_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e7_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | SUM(CAST(floor(l_quantity*1e6+0.5) AS BIGINT))/1e6 AS sum_qty,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    // runs on the ORIGINAL parquet: a match proves each Spark-side
    // round-trip (csv and json separately) reproduced EVERY column of
    // every row bit-exactly. Injective construction: md5 per column
    // (fixed-width blocks) under the outer md5, so values cannot
    // migrate across column boundaries unnoticed; total under NULLs
    // (per-column COALESCE to a non-hex sentinel, mirroring the Spark
    // side — a propagated NULL row hash would mask corruption in the
    // row's other columns).
    "e8_source_roundtrip" ->
      """SELECT doc_id,
        | md5(COALESCE(md5(CAST(doc_id AS VARCHAR)), '0000000000000000000000000000NULL')
        |   || COALESCE(md5(text), '0000000000000000000000000000NULL')
        |   || COALESCE(md5(lang), '0000000000000000000000000000NULL')
        |   || COALESCE(md5(source), '0000000000000000000000000000NULL')
        |   || COALESCE(md5(CAST(n_chars AS VARCHAR)), '0000000000000000000000000000NULL')) AS csv_md5,
        | md5(COALESCE(md5(CAST(doc_id AS VARCHAR)), '0000000000000000000000000000NULL')
        |   || COALESCE(md5(text), '0000000000000000000000000000NULL')
        |   || COALESCE(md5(lang), '0000000000000000000000000000NULL')
        |   || COALESCE(md5(source), '0000000000000000000000000000NULL')
        |   || COALESCE(md5(CAST(n_chars AS VARCHAR)), '0000000000000000000000000000NULL')) AS json_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // DuckDB's native ASOF JOIN certifies the union-tag + running-last
    // window formulation IS the as-of join (inclusive on ties); d10
    // shares it verbatim, so the hash check certifies batch/stream
    // equivalence of the as-of operator under the single-batch drain
    "e9_asof_join" -> AsofSql,
    "d10_stream_asof" -> AsofSql,
    "d12_stream_join" -> StreamJoinSql,
    // e18 is d12's batch twin: same semantics, same oracle — the hash
    // check certifies the batch equi+residual plan and the streaming
    // symmetric hash join against the same formulation
    "e18_range_join" -> StreamJoinSql,
    "e19_outer_join" ->
      """WITH a AS (
        |  SELECT l_partkey,
        |    SUM(CAST(floor(l_quantity*1e6+0.5) AS BIGINT))/1e6 AS qty95,
        |    CAST(COUNT(*) AS BIGINT) AS n95
        |  FROM lineitem WHERE year(l_shipdate)=1995 GROUP BY l_partkey
        |), b AS (
        |  SELECT l_partkey,
        |    SUM(CAST(floor(l_quantity*1e6+0.5) AS BIGINT))/1e6 AS qty96,
        |    CAST(COUNT(*) AS BIGINT) AS n96
        |  FROM lineitem WHERE year(l_shipdate)=1996 GROUP BY l_partkey
        |)
        |SELECT COALESCE(a.l_partkey, b.l_partkey) AS partkey,
        | a.qty95, a.n95, b.qty96, b.n96
        |FROM a FULL OUTER JOIN b ON a.l_partkey = b.l_partkey
        |ORDER BY partkey""".stripMargin,
    // dedup over a key set is a pure function of which keys exist, so
    // the native streaming dedup matches batch DISTINCT under any
    // trigger slicing
    "d13_stream_dropdup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "e14_moving_agg" ->
      """SELECT event_id, user_id,
        | CAST(SUM(CAST(floor(value*1e6+0.5) AS BIGINT)) OVER w AS BIGINT) AS sum_micro,
        | CAST(COUNT(*) OVER w AS INT) AS n_frame,
        | CAST(SUM(CAST(floor(value*1e6+0.5) AS BIGINT)) OVER w AS DOUBLE)
        |   / (1e6 * (COUNT(*) OVER w)) AS avg_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "e15_setops" ->
      """SELECT 'both' AS op, user_id
        |FROM (SELECT user_id FROM events WHERE event_type='click'
        |      INTERSECT
        |      SELECT user_id FROM events WHERE event_type='purchase')
        |UNION ALL
        |SELECT 'click_only' AS op, user_id
        |FROM (SELECT user_id FROM events WHERE event_type='click'
        |      EXCEPT
        |      SELECT user_id FROM events WHERE event_type='purchase')
        |ORDER BY op, user_id""".stripMargin,
    "e11_semi_join" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "e12_anti_join" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_totalprice > 400000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "e16_unpivot" ->
      """WITH a AS (SELECT l_returnflag, l_linestatus,
        |  SUM(CAST(floor(l_quantity*1e6+0.5) AS BIGINT))/1e6 AS sum_qty,
        |  SUM(CAST(floor(l_extendedprice*1e6+0.5) AS BIGINT))/1e6 AS sum_price,
        |  SUM(CAST(floor(l_discount*1e6+0.5) AS BIGINT))/1e6 AS sum_disc,
        |  SUM(CAST(floor(l_tax*1e6+0.5) AS BIGINT))/1e6 AS sum_tax
        | FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, 'sum_qty' AS measure, sum_qty AS value FROM a
        |UNION ALL SELECT l_returnflag, l_linestatus, 'sum_price', sum_price FROM a
        |UNION ALL SELECT l_returnflag, l_linestatus, 'sum_disc', sum_disc FROM a
        |UNION ALL SELECT l_returnflag, l_linestatus, 'sum_tax', sum_tax FROM a
        |ORDER BY l_returnflag, l_linestatus, measure""".stripMargin,
    "e17_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | SUM(CAST(floor(l_quantity*1e6+0.5) AS BIGINT))/1e6 AS sum_qty,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "e13_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | SUM(CAST(floor(l_quantity*1e6+0.5) AS BIGINT))/1e6 AS sum_qty,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "e10_pivot" ->
      """SELECT source,
        | CAST(COUNT(*) FILTER (WHERE lang='en') AS BIGINT) AS en_docs,
        | CAST(COALESCE(SUM(n_chars) FILTER (WHERE lang='en'), 0) AS BIGINT) AS en_chars,
        | CAST(COUNT(*) FILTER (WHERE lang='de') AS BIGINT) AS de_docs,
        | CAST(COALESCE(SUM(n_chars) FILTER (WHERE lang='de'), 0) AS BIGINT) AS de_chars,
        | CAST(COUNT(*) FILTER (WHERE lang='fr') AS BIGINT) AS fr_docs,
        | CAST(COALESCE(SUM(n_chars) FILTER (WHERE lang='fr'), 0) AS BIGINT) AS fr_chars,
        | CAST(COUNT(*) FILTER (WHERE lang='es') AS BIGINT) AS es_docs,
        | CAST(COALESCE(SUM(n_chars) FILTER (WHERE lang='es'), 0) AS BIGINT) AS es_chars,
        | CAST(COUNT(*) FILTER (WHERE lang='zh') AS BIGINT) AS zh_docs,
        | CAST(COALESCE(SUM(n_chars) FILTER (WHERE lang='zh'), 0) AS BIGINT) AS zh_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
  )
}
