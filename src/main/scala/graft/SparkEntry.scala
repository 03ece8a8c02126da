package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Checks, Curation, Dedup, Multimodal, Pca, Pinned, Sampling, Similarity, TemporalJoins, TextOps, Warehouse}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching ANSI-SQL oracle in
  * [[oracleSql]] (DuckDB dialect-compatible) unless the operator is not
  * SQL-expressible, in which case the driver records a rows-only check.
  * Column aliases are kept identical on both sides — the driver compare
  * sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's normalize stage (normalization.py:81-107) as one
    * declarative Spark plan: JSON parse → project → tumbling window agg. */
  def entry(spark: SparkSession): DataFrame =
    Warehouse.q14NormalizeEvents(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> Warehouse.q01PricingSummary,
    "q02_filter_project"  -> Warehouse.q02FilterProject,
    "q03_ship_priority"   -> Warehouse.q03ShippingPriority,
    "q04_order_priority"  -> Warehouse.q04OrderPriority,
    "q05_region_revenue"  -> Warehouse.q05RegionRevenue,
    "q06_forecast"        -> Warehouse.q06ForecastRevenue,
    "q07_top_orders"      -> Warehouse.q07TopOrders,
    "q08_window_rank"     -> Warehouse.q08WindowRank,
    "q09_rollup"          -> Warehouse.q09Rollup,
    "q10_set_ops"         -> Warehouse.q10SetOps,
    "q11_anti_join"       -> Warehouse.q11AntiJoin,
    "q12_distinct_agg"    -> Warehouse.q12DistinctAgg,
    "q13_events_tumbling" -> Warehouse.q13EventsTumbling,
    "q14_normalize_events" -> Warehouse.q14NormalizeEvents,
    "q15_having"          -> Warehouse.q15Having,
    "q16_percentiles"     -> Warehouse.q16Percentiles,
    "q17_cube"            -> Warehouse.q17Cube,
    "q18_above_cust_avg"  -> Warehouse.q18AboveCustomerAvg,
    "q19_sessions"        -> Warehouse.q19Sessions,
    "q20_approx_distinct" -> Warehouse.q20ApproxDistinct,
    "q21_market_share"    -> Warehouse.q21MarketShare,
    "q22_string_match"    -> Warehouse.q22StringMatch,
    "q23_monthly_trend"   -> Warehouse.q23MonthlyTrend,
    "q24_dormant_rich"    -> Warehouse.q24DormantRich,
    "q25_pivot"           -> Warehouse.q25Pivot,
    "q26_multiset_ops"    -> Warehouse.q26MultisetOps,
    "q27_running_window"  -> Warehouse.q27RunningWindow,
    "q28_stateful_batch"  -> Warehouse.q28StatefulBatch,
    "q29_sliding"         -> Warehouse.q29Sliding,
    "q30_grouping_sets"   -> Warehouse.q30GroupingSets,
    "q31_topk_per_group"  -> Warehouse.q31TopKPerGroup,
    "q32_approx_percentiles" -> Warehouse.q32ApproxPercentiles,
    "q33_scd2_intervals"  -> Warehouse.q33Scd2Intervals,
    "q34_latest_snapshot" -> Warehouse.q34LatestSnapshot,
    "q35_funnel"          -> Warehouse.q35Funnel,
    "q36_cohort_retention" -> Warehouse.q36CohortRetention,
    // temporal joins (as-of / range)
    "j01_asof_join"       -> TemporalJoins.clickLastPurchase,
    "j02_range_join"      -> TemporalJoins.purchasesBeforeClick,
    // multimodal columns
    "m01_media_stats"     -> Multimodal.mediaStats,
    "m02_frame_sample"    -> Multimodal.frames,
    "m03_media_features"  -> Multimodal.featuresByKind,
    "m04_byte_histogram"  -> Multimodal.byteHistogram,
    "m05_resize_meta"     -> Multimodal.resizedDims,
    "m06_media_dedup"     -> Multimodal.mediaDedup,
    "m07_media_similar"   -> ((s, dir) => Multimodal.mediaSimilar(s, dir)),
    "m08_media_dup_clusters" -> Multimodal.mediaDupClusters,
    "m09_cdc_chunks"      -> Multimodal.mediaCdcChunks,
    "j03_asof_forward"    -> TemporalJoins.clickNextPurchase,
    "j04_nearest_event"   -> TemporalJoins.clickNearestPurchase,
    "j05_asof_tolerance"  -> TemporalJoins.clickLastPurchaseWithin,
    // text analysis (training-data pipeline ops)
    "t01_token_counts"    -> TextOps.tokenCounts,
    "t02_quality_score"   -> TextOps.qualityScore,
    "t03_lang_id"         -> TextOps.langId,
    "t04_fingerprint"     -> TextOps.fingerprint,
    "t05_top_bigrams"     -> ((s, dir) => TextOps.topBigrams(s, dir)),
    "t06_repetition"      -> TextOps.repetition,
    "t07_pii_scrub"       -> ((s, dir) => TextOps.scrub(s, dir)),
    "t08_gopher_rules"    -> ((s, dir) => TextOps.gopherRules(s, dir)),
    "t09_chunk_windows"   -> ((s, dir) => TextOps.chunkWindows(s, dir)),
    "t10_bm25"            -> ((s, dir) => TextOps.bm25TopK(s, dir)),
    "t11_heavy_hitters"   -> ((s, dir) => TextOps.heavyHitters(s, dir)),
    "t12_perplexity"      -> TextOps.perplexity,
    "t13_bpe_merges"      -> ((s, dir) => TextOps.bpeMerges(s, dir)),
    "t14_bpe_encode"      -> ((s, dir) => TextOps.bpeEncodePinned(s, dir)),
    "t15_chunk_dedup"     -> ((s, dir) => TextOps.chunkDedup(s, dir)),
    "t16_inverted_index"  -> ((s, dir) => TextOps.invertedIndex(s, dir)),
    "t17_phrase_search"   -> ((s, dir) => TextOps.phraseSearch(s, dir)),
    "t18_collocations"    -> ((s, dir) => TextOps.collocations(s, dir)),
    "t19_tfidf"           -> ((s, dir) => TextOps.tfidfTopTerms(s, dir)),
    "t20_rrf_fusion"      -> ((s, dir) => Similarity.rrfFusion(s, dir)),
    "t21_lm_continuations" -> ((s, dir) => TextOps.lmContinuations(s, dir)),
    "t22_blocklist_filter" -> ((s, dir) => TextOps.blocklistFilter(s, dir)),
    "t23_boilerplate_scrub" -> ((s, dir) => TextOps.boilerplateScrub(s, dir)),
    "t24_incremental_boilerplate" -> ((s, dir) => TextOps.incrementalBoilerplate(s, dir)),
    "t25_cms_counts"      -> ((s, dir) => TextOps.cmsFrequencies(s, dir)),
    "t26_span_coverage"   -> ((s, dir) => TextOps.spanCoverage(s, dir)),
    "t27_unigram_lm"      -> ((s, dir) => TextOps.unigramTrain(s, dir)),
    "t28_zipf_profile"    -> ((s, dir) => TextOps.zipfProfile(s, dir)),
    "t29_unigram_encode"  -> ((s, dir) => TextOps.unigramEncodePinned(s, dir)),
    "t30_kneser_ney"      -> ((s, dir) => TextOps.knBigrams(s, dir)),
    "d13_fuzzy_pairs"     -> Dedup.fuzzyPairs,
    "d14_dup_spans"       -> ((s, dir) => TextOps.dupSpans(s, dir)),
    "d15_incremental_fuzzy" -> ((s, dir) => Dedup.incrementalFuzzy(s, dir)),
    "d17_incremental_simhash" -> ((s, dir) => Dedup.incrementalSimhash(s, dir)),
    "d18_threshold_curve" -> ((s, dir) => Dedup.thresholdCurve(s, dir)),
    // deterministic sampling / splitting
    "x01_split_counts"    -> Sampling.splitCounts,
    "x02_stratified_sample" -> Sampling.stratifiedSampleDocs,
    "x03_token_shards"    -> ((s, dir) => Sampling.tokenShards(s, dir)),
    "x04_curation_funnel" -> ((s, dir) => Curation.curationFunnel(s, dir)),
    "x05_decontaminate"   -> Dedup.decontaminate,
    "x16_fuzzy_decontaminate" -> ((s, dir) => Dedup.fuzzyDecontaminate(s, dir)),
    "x17_soft_dedup_weights" -> ((s, dir) => Sampling.softDedupWeights(s, dir)),
    "x18_bloom_decontaminate" -> ((s, dir) => Dedup.bloomDecontaminate(s, dir)),
    "x19_epoch_shuffle"   -> ((s, dir) => Sampling.epochShuffle(s, dir)),
    "x06_range_shards"    -> ((s, dir) => Sampling.rangeShardManifest(s, dir)),
    "x07_proportional_sample" -> ((s, dir) => Sampling.proportionalCounts(s, dir)),
    "x08_temperature_mix" -> ((s, dir) => Sampling.temperatureMix(s, dir)),
    "x09_domain_caps"     -> ((s, dir) => Sampling.domainCaps(s, dir)),
    "x10_pack_sequences"  -> ((s, dir) => Sampling.packSequences(s, dir)),
    "x11_dsir_weights"    -> ((s, dir) => Curation.dsirWeights(s, dir)),
    "x12_curriculum_bins" -> ((s, dir) => Curation.curriculumBins(s, dir)),
    "x13_weighted_sample" -> ((s, dir) => Sampling.weightedSample(s, dir)),
    "x14_cluster_sample"  -> ((s, dir) => Sampling.clusterSample(s, dir)),
    "x15_quality_classifier" -> ((s, dir) => Curation.qualityClassifier(s, dir)),
    "v01_quality_checks"  -> Checks.ordersContract,
    "v02_referential_integrity" -> Checks.referentialIntegrity,
    "v03_profile"         -> Checks.ordersProfile,
    "v04_drift_psi"       -> Checks.driftPsi,
    "x20_mixture_waterfill" -> ((s, dir) => Sampling.mixtureWaterfill(s, dir)),
    "j06_window_features" -> TemporalJoins.purchaseClickFeatures,
    "j07_attribution"     -> ((s, dir) => TemporalJoins.purchaseAttribution(s, dir)),
    "t32_bpe_fertility"   -> ((s, dir) => TextOps.bpeFertility(s, dir)),
    "t33_ngram_novelty"   -> ((s, dir) => TextOps.ngramNovelty(s, dir)),
    "t34_incremental_novelty" -> ((s, dir) => TextOps.incrementalNovelty(s, dir)),
    "v07_corpus_datasheet" -> ((s, dir) => Checks.corpusDatasheet(s, dir)),
    "v08_split_leakage"   -> ((s, dir) => Checks.splitLeakage(s, dir)),
    "m10_aspect_buckets"  -> Multimodal.aspectBuckets,
    "m11_batch_manifest"  -> ((s, dir) => Multimodal.batchManifest(s, dir)),
    "m12_incremental_media" -> ((s, dir) => Multimodal.incrementalMediaDedup(s, dir)),
    "x21_family_split"    -> Sampling.familySplit,
    "x22_pack_efficiency" -> ((s, dir) => Sampling.packEfficiency(s, dir)),
    "v05_vocab_divergence" -> ((s, dir) => Checks.vocabDivergence(s, dir)),
    "t31_memorization"    -> ((s, dir) => TextOps.memorization(s, dir)),
    "d16_lsh_scurve"      -> ((s, dir) => Dedup.lshScurve(s, dir)),
    // deduplication
    "d01_exact_dedup"     -> Dedup.exactDedup,
    "d02_minhash_lsh"     -> ((s, dir) => Dedup.minhashLsh(s, dir)),
    "d03_ngram_jaccard"   -> ((s, dir) => Dedup.ngramJaccard(s, dir)),
    "d04_simhash"         -> ((s, dir) => Dedup.simhash(s, dir)),
    "d05_dup_clusters"    -> ((s, dir) => Dedup.dupClusters(s, dir)),
    "d06_capped_jaccard"  -> ((s, dir) => Dedup.cappedNgramJaccard(s, dir)),
    "d07_embedding_clusters" -> ((s, dir) => Similarity.embeddingClusters(s, dir)),
    "d08_keep_best"       -> ((s, dir) => Dedup.keepBest(s, dir)),
    "d09_embedding_clusters_lsh" -> ((s, dir) => Similarity.embeddingClustersLsh(s, dir)),
    "d10_keep_best_lsh"   -> ((s, dir) => Dedup.keepBestLsh(s, dir)),
    "d11_incremental_dedup" -> ((s, dir) => Dedup.incrementalDedup(s, dir)),
    "d12_incremental_neardup" -> ((s, dir) => Dedup.incrementalNearDup(s, dir)),
    // similarity search
    "s01_ann_bruteforce"  -> ((s, dir) => Similarity.annBruteForce(s, dir)),
    "s02_cosine_pairs"    -> ((s, dir) => Similarity.cosinePairs(s, dir)),
    "s03_lsh_pairs"       -> ((s, dir) => Similarity.lshPairs(s, dir)),
    // s03c: the anchor-star CAPPED regime, driver-verified — nPlanes=4
    // makes sf0.01 buckets hold 32-42 vectors, so bucketCap=8 ENGAGES
    // the cap in every bucket (the registered s03/d09/s14 caps are
    // no-ops at gate scale). The oracle replays the pinned anchor set
    // (Pinned.s03cAnchors — Spark's xxhash64 is not DuckDB-replayable);
    // PinnedModelsSpec proves runtime anchors == fixture.
    "s03c_lsh_pairs_capped" -> ((s, dir) => Similarity.lshPairs(s, dir,
      threshold = 0.3, nPlanes = 4, bucketCap = 8)),
    "s04_ann_ivf"         -> ((s, dir) => Similarity.annIvf(s, dir)),
    // The Pinned.* serve paths below (s05/s09/s10/s11/s13, also
    // s12/s14) run models FIT ON sf0.01 regardless of the SF they are
    // served at: correctness vs the oracle is SF-independent (both
    // sides replay the same fixture), but RECALL at SF≠0.01 reflects a
    // foreign-fit model — a production deployment re-fits per corpus
    // (model = None) and persists via the s11 fit-once/serve-many
    // lifecycle. Bench carries the fit-inclusive twins (fit_queries)
    // so serve-vs-fit timing deltas stay attributable.
    "s05_ann_kmeans_ivf"  -> ((s, dir) => Similarity.annKmeansIvf(s, dir,
      model = Some(Pinned.ivfCentroids))),
    "s06_label_norms"     -> Similarity.labelNorms,
    "s07_label_centroid"  -> Similarity.labelCentroids,
    "s08_ann_quantized"   -> ((s, dir) => Similarity.annQuantized(s, dir)),
    "s09_ann_pq"          -> ((s, dir) => Similarity.annPq(s, dir,
      model = Some(Pinned.pq))),
    "s10_ann_ivfpq"       -> ((s, dir) => Similarity.annIvfPq(s, dir,
      model = Some(Pinned.ivfPq))),
    "s11_ann_pq_fitserve" -> ((s, dir) => Similarity.annPqFitServe(s, dir,
      s"${System.getProperty("java.io.tmpdir")}/graft_pq_model_${Integer.toHexString(dir.hashCode)}",
      model = Some(Pinned.pq))),
    "s12_pca_project"     -> ((s, dir) => Pca.projectPinned(s, dir)),
    "s13_ann_opq"         -> ((s, dir) => Similarity.annPqRotated(s, dir,
      rotation = Some(Pinned.opqRotation), model = Some(Pinned.opqBooks))),
    "s14_semdedup"        -> ((s, dir) => Similarity.semDedupClusters(s, dir,
      cells = Some(Pinned.semCells))),
    "s15_hard_negatives"  -> ((s, dir) => Similarity.hardNegatives(s, dir)),
    "s16_ann_graph"       -> ((s, dir) => Similarity.annGraph(s, dir)),
    "s17_ann_graph_lsh"   -> ((s, dir) => Similarity.annGraphLsh(s, dir)),
    "s18_ann_graph_insert" -> ((s, dir) => Similarity.annGraphInsert(s, dir)),
    "s19_ann_graph_refined" -> ((s, dir) => Similarity.annGraphLshRefined(s, dir)),
    "s20_ann_graph_insert_recip" -> ((s, dir) => Similarity.annGraphInsertRecip(s, dir)),
    "s21_ann_recall"      -> ((s, dir) => Similarity.annRecallEval(s, dir)),
    "s25_ann_rank_eval"   -> ((s, dir) => Similarity.annRankEval(s, dir)),
    "s22_bitext_mine"     -> ((s, dir) => Similarity.bitextMine(s, dir)),
    "s23_bitext_mine_lsh" -> ((s, dir) => Similarity.bitextMineLsh(s, dir)),
    "s24_mmr_rerank"      -> ((s, dir) => Similarity.mmrRerank(s, dir)),
    "s26_ann_binary"      -> ((s, dir) => Similarity.annBinarySign(s, dir)),
    "s27_matryoshka_eval" -> ((s, dir) => Similarity.matryoshkaEval(s, dir)),
    "s28_ann_tombstones"  -> ((s, dir) => Similarity.annIvfTombstoned(s, dir)),
    "s29_ann_index_stats" -> ((s, dir) => Similarity.annIndexStats(s, dir)),
    "s30_rerank_depth"    -> ((s, dir) => Similarity.annRerankDepthEval(s, dir)),
    "s31_two_tower_rerank" -> ((s, dir) => Similarity.twoTowerRerankEval(s, dir)),
    "s32_embedding_drift" -> ((s, dir) => Similarity.embeddingDrift(s, dir)),
    "s33_ann_filtered"    -> ((s, dir) => Similarity.annFiltered(s, dir)),
    "s34_semantic_admission" -> ((s, dir) =>
      Similarity.incrementalSemanticAdmission(s, dir)),
    "v06_dedup_impact"    -> ((s, dir) => Curation.dedupImpact(s, dir)),
  )

  /** DuckDB-runnable oracle SQL, one per SQL-expressible query. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),4) AS sum_qty,
         round(sum(l_extendedprice),4) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty,
         round(avg(l_extendedprice),4) AS avg_price,
         round(avg(l_discount),4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY 1,2 ORDER BY 1,2""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         round(l_extendedprice*(1-l_discount),4) AS net_price
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate <  TIMESTAMP '1997-02-01'
           AND l_discount >= 0.08
         ORDER BY l_orderkey, l_linenumber""",
    "q03_ship_priority" ->
      """SELECT l_orderkey, o_orderdate,
         round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate  > TIMESTAMP '1998-01-01'
         GROUP BY 1,2 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",
    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1996-07-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY 1 ORDER BY 1""",
    "q05_region_revenue" ->
      """SELECT n_name,
         round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name IN ('ASIA','AMERICA')
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY revenue DESC, n_name ASC""",
    "q06_forecast" ->
      """SELECT round(sum(l_extendedprice*l_discount),4) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate <  TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q07_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
         FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q08_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, price, prev_price FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER w AS rn,
             round(o_totalprice,4) AS price,
             round(coalesce(lag(o_totalprice,1) OVER w, 0.0),4) AS prev_price
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC)
         ) WHERE rn <= 2 AND o_custkey < 100
         ORDER BY o_custkey, rn""",
    "q09_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS returnflag,
         coalesce(l_linestatus,'ALL') AS linestatus,
         count(*) AS n, round(sum(l_quantity),4) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",
    "q10_set_ops" ->
      """WITH big AS (SELECT DISTINCT o_custkey FROM orders
                      WHERE o_totalprice > 400000),
         early AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderdate < TIMESTAMP '1996-01-01')
         SELECT 'both' AS tag, o_custkey AS custkey
           FROM (SELECT * FROM big INTERSECT SELECT * FROM early)
         UNION ALL
         SELECT 'big_only' AS tag, o_custkey AS custkey
           FROM (SELECT * FROM big EXCEPT SELECT * FROM early)
         ORDER BY tag, custkey""",
    "q11_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey
             AND o_orderdate >= TIMESTAMP '1995-01-01'
             AND o_orderdate <  TIMESTAMP '1996-01-01')
         ORDER BY c_custkey""",
    "q12_distinct_agg" ->
      """SELECT l_returnflag,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT l_partkey) AS n_part,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q13_events_tumbling" ->
      """SELECT strftime(make_timestamp(CAST(floor(epoch(ts)/1200)*1200*1000000 AS BIGINT)),
                         '%Y-%m-%d %H:%M:%S') AS w_start,
         event_type, count(*) AS n, round(sum(value),4) AS sum_value
         FROM events GROUP BY 1,2 ORDER BY 1,2""",
    "q14_normalize_events" ->
      """SELECT strftime(make_timestamp(CAST(floor(epoch(ts)/1200)*1200*1000000 AS BIGINT)),
                         '%Y-%m-%d %H:%M:%S') AS w_start,
         event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k
         FROM events
         WHERE json_extract_string(props,'$.k') IS NOT NULL
         GROUP BY 1,2 ORDER BY 1,2""",
    "q15_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
         round(sum(o_totalprice),4) AS total
         FROM orders GROUP BY 1 HAVING count(*) >= 15
         ORDER BY n_orders DESC, o_custkey ASC""",
    "q16_percentiles" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
         round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q17_cube" ->
      """SELECT coalesce(year(o_orderdate), 0) AS yr,
         coalesce(o_orderpriority, 'ALL') AS priority,
         count(*) AS n, round(sum(o_totalprice), 4) AS total
         FROM orders GROUP BY CUBE(year(o_orderdate), o_orderpriority)
         ORDER BY yr, priority""",
    "q18_above_cust_avg" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price,
         floor((avg_cents / 100) * 1e4 + 0.5) / 1e4 AS cust_avg FROM (
           SELECT o_orderkey, o_custkey, o_totalprice,
             floor(o_totalprice * 100 + 0.5) AS cents,
             avg(floor(o_totalprice * 100 + 0.5))
               OVER (PARTITION BY o_custkey) AS avg_cents
           FROM orders)
         WHERE cents > avg_cents * 1.5 ORDER BY o_orderkey""",
    "q19_sessions" ->
      """WITH x AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         y AS (
           SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS grp
           FROM x)
         SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS w_start,
           strftime(max(ts) + INTERVAL 10 MINUTE,
                    '%Y-%m-%d %H:%M:%S.%f') AS w_end,
           count(*) AS n
         FROM y GROUP BY user_id, grp ORDER BY user_id, w_start""",
    // q20: exact distinct counts reproduced; the ε-band verdicts on the
    // HLL estimates (ε = 0.15 = 3× the default 5% rsd) are asserted
    // literally TRUE — a drifting sketch hash-fails the compare
    "q20_approx_distinct" ->
      """SELECT l_returnflag,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
         TRUE AS supp_ok,
         TRUE AS part_ok,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q21_market_share" ->
      """WITH asia_supp AS (
           SELECT s_suppkey FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA')
         SELECT o_year, asia_rev, total_rev, n_items,
           floor(asia_rev / total_rev * 1e4 + 0.5) / 1e4 AS share
         FROM (
           SELECT year(o_orderdate) AS o_year,
             round(sum(CASE WHEN s_suppkey IS NOT NULL
               THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 4) AS asia_rev,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev,
             count(*) AS n_items
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           LEFT JOIN asia_supp ON l_suppkey = s_suppkey
           GROUP BY 1)
         ORDER BY o_year""",
    "q22_string_match" ->
      """SELECT p_brand, count(*) AS n,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS rev
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_type LIKE '%PROMO%'
         GROUP BY 1 ORDER BY 1""",
    "q23_monthly_trend" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         count(*) AS n_orders, round(sum(o_totalprice), 4) AS total
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q24_dormant_rich" ->
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 4) AS acctbal
         FROM customer
         WHERE floor(c_acctbal * 100 + 0.5) >
           (SELECT avg(floor(c_acctbal * 100 + 0.5)) FROM customer
            WHERE c_acctbal > 0.0)
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '1997-06-01')
         ORDER BY c_custkey""",
    "q25_pivot" ->
      """SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month,
         CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
         CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
         CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
         CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
         CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
         FROM events GROUP BY 1 ORDER BY 1""",
    "q26_multiset_ops" ->
      """WITH cheap AS (SELECT l_partkey FROM lineitem WHERE l_quantity < 10),
         ret AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
         tagged AS (
           SELECT 'cheap_minus_returned' AS tag, l_partkey
           FROM (SELECT * FROM cheap EXCEPT ALL SELECT * FROM ret)
           UNION ALL
           SELECT 'both' AS tag, l_partkey
           FROM (SELECT * FROM cheap INTERSECT ALL SELECT * FROM ret))
         SELECT tag, l_partkey, count(*) AS n FROM tagged
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q27_running_window" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
           AS running_total,
         round(percent_rank() OVER w, 6) AS pr,
         CAST(ntile(4) OVER w AS INT) AS quartile
         FROM orders WHERE o_custkey < 50
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_custkey, o_orderkey""",
    "q28_stateful_batch" ->
      """SELECT user_id, count(*) AS n_events,
         round(CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) / 100.0, 4)
           AS total_value,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts
         FROM events GROUP BY 1 ORDER BY 1""",
    "q29_sliding" ->
      """SELECT strftime(make_timestamp(
           CAST((floor(epoch(ts) / 300) - k) * 300 * 1000000 AS BIGINT)),
           '%Y-%m-%d %H:%M:%S') AS w_start,
         event_type, count(*) AS n
         FROM events, unnest(range(0, 4)) AS t(k)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q30_grouping_sets" ->
      """SELECT coalesce(o_year, 0) AS yr,
         coalesce(o_orderpriority, 'ALL') AS priority,
         CAST(GROUPING(o_year, o_orderpriority) AS BIGINT) AS gid,
         count(*) AS n, round(sum(o_totalprice), 4) AS total
         FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                      o_orderpriority, o_totalprice FROM orders)
         GROUP BY GROUPING SETS ((o_year, o_orderpriority), (o_year),
                                 (o_orderpriority))
         ORDER BY gid, yr, priority""",
    "q31_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders)
         WHERE rk <= 3 ORDER BY o_orderpriority, o_orderkey""",
    // q32: exact percentiles reproduced; the rank-band verdicts on the
    // GK-sketch estimates (δ = 0.02 vs the theoretical 1/accuracy =
    // 1e-4 rank error) are asserted literally TRUE
    "q32_approx_percentiles" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
         round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
         TRUE AS median_ok,
         TRUE AS p90_ok,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q33_scd2_intervals" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus,
           round(o_totalprice, 4) AS price,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(o_orderdate, 1) OVER w, '%Y-%m-%d %H:%M:%S')
             AS valid_to,
           lead(o_orderdate, 1) OVER w IS NULL AS is_current
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_custkey, valid_from, o_orderkey""",
    "q34_latest_snapshot" ->
      """SELECT user_id, event_id, event_type, value, ts FROM (
           SELECT user_id, event_id, event_type,
             round(value, 4) AS value,
             strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
             row_number() OVER (PARTITION BY user_id
               ORDER BY strftime(ts, '%Y-%m-%d %H:%M:%S.%f') DESC,
                        event_id DESC) AS rk
           FROM events)
         WHERE rk = 1 ORDER BY user_id""",
    // q35: dialect-portable — runs VERBATIM in Spark (SqlParitySpec's
    // `portable` list); output carries no timestamps, so the events.ts
    // physical-encoding hazard never reaches the compare.
    "q35_funnel" ->
      """WITH v AS (
           SELECT user_id, min(ts) AS tv FROM events
           WHERE event_type = 'view' GROUP BY user_id
         ), c AS (
           SELECT e.user_id, min(e.ts) AS tc FROM events e
           JOIN v ON v.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.ts > v.tv
           GROUP BY e.user_id
         ), p AS (
           SELECT e.user_id, min(e.ts) AS tp FROM events e
           JOIN c ON c.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts > c.tc
           GROUP BY e.user_id
         ), s AS (
           SELECT 1 AS stage, 'view' AS step, count(*) AS n_users FROM v
           UNION ALL SELECT 2, 'click', count(*) FROM c
           UNION ALL SELECT 3, 'purchase', count(*) FROM p
         )
         SELECT stage, step, n_users,
           floor((CAST(n_users AS DOUBLE)
                  / CAST(max(n_users) OVER () AS DOUBLE))*1e4 + 0.5)/1e4
             AS conv_frac
         FROM s ORDER BY stage""",
    // q36: integer day arithmetic + one r4 division; only the
    // datediff spelling differs between dialects (DuckDB 3-arg)
    "q36_cohort_retention" ->
      """WITH ev AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
         ), cohorts AS (
           SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
         ), sizes AS (
           SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_n
           FROM cohorts GROUP BY cohort_day
         ), act AS (
           SELECT c.cohort_day,
             CAST(datediff('day', c.cohort_day, e.day) AS INT) AS day_offset,
             CAST(count(*) AS BIGINT) AS n_active
           FROM ev e JOIN cohorts c USING (user_id)
           GROUP BY 1, 2
         )
         SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
           day_offset, n_active, cohort_n,
           floor((CAST(n_active AS DOUBLE) / CAST(cohort_n AS DOUBLE))*1e4
             + 0.5)/1e4 AS retention
         FROM act a JOIN sizes s ON s.cohort_day = a.cohort_day
         ORDER BY 1, 2""",
    "j04_nearest_event" ->
      """WITH p AS (SELECT user_id, ts, max(value) AS p_value FROM events
                    WHERE event_type = 'purchase' GROUP BY 1, 2),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click')
         SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           strftime(pp.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           round(pp.p_value, 4) AS purchase_value
         FROM c LEFT JOIN LATERAL (
           SELECT ts, p_value FROM p
           WHERE p.user_id = c.user_id
           ORDER BY abs(epoch_us(CAST(p.ts AS TIMESTAMP))
                      - epoch_us(CAST(c.ts AS TIMESTAMP))) ASC, ts ASC
           LIMIT 1) pp ON true
         ORDER BY event_id""",
    "j01_asof_join" ->
      """WITH p AS (SELECT user_id, ts, max(value) AS p_value FROM events
                    WHERE event_type = 'purchase' GROUP BY 1, 2),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click')
         SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           strftime(pp.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           round(pp.p_value, 4) AS purchase_value
         FROM c LEFT JOIN LATERAL (
           SELECT ts, p_value FROM p
           WHERE p.user_id = c.user_id AND p.ts <= c.ts
           ORDER BY ts DESC LIMIT 1) pp ON true
         ORDER BY event_id""",
    // j05: tolerance inside the lateral ≡ the engine's match-then-void
    // (the latest at-or-before IS the latest inside any backward
    // window that contains it; if IT is stale, every earlier match is
    // staler)
    "j05_asof_tolerance" ->
      """WITH p AS (SELECT user_id, ts, max(value) AS p_value FROM events
                    WHERE event_type = 'purchase' GROUP BY 1, 2),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click')
         SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           strftime(pp.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           round(pp.p_value, 4) AS purchase_value
         FROM c LEFT JOIN LATERAL (
           SELECT ts, p_value FROM p
           WHERE p.user_id = c.user_id AND p.ts <= c.ts
             AND p.ts >= c.ts - INTERVAL 30 MINUTE
           ORDER BY ts DESC LIMIT 1) pp ON true
         ORDER BY event_id""",
    "j02_range_join" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id,
           CAST(count(p.ts) AS BIGINT) AS n_purchases
         FROM c LEFT JOIN p ON p.user_id = c.user_id
           AND p.ts >= c.ts - INTERVAL 10 MINUTE AND p.ts < c.ts
         GROUP BY 1, 2 ORDER BY 1""",
    "m01_media_stats" ->
      """SELECT doc_id AS media_id,
         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
         octet_length(encode(text)) AS n_bytes,
         CAST(64 + n_chars % 64 AS INT) AS width,
         CAST(64 + n_chars % 48 AS INT) AS height,
         CAST(n_chars * 10 AS INT) AS duration_ms
         FROM documents ORDER BY media_id""",
    "m06_media_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keeper,
           count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keeper""",
    // m12: the d11 cross-split replay over payload fingerprints
    // (md5(text) ≡ md5 of the UTF-8 payload bytes — the m06
    // equivalence); split from Dedup.D12SplitAt.
    "m12_incremental_media" ->
      s"""WITH f AS (
           SELECT doc_id, md5(text) AS fp FROM documents
         ), store AS (SELECT DISTINCT fp FROM f
                      WHERE doc_id < ${graft.operators.Dedup.D12SplitAt}),
         batch AS (SELECT * FROM f
                   WHERE doc_id >= ${graft.operators.Dedup.D12SplitAt})
         SELECT b.fp, min(b.doc_id) AS keeper, count(*) AS n_copies
         FROM batch b LEFT JOIN store s ON b.fp = s.fp
         WHERE s.fp IS NULL
         GROUP BY b.fp ORDER BY keeper""",
    // m07: the m04 hex-nibble trick vectorized — odd hex chars of the
    // payload are the high nibbles; 16 replace-and-count bins form the
    // feature vector, then the s01 cosine/top-k replay.
    "m07_media_similar" ->
      """WITH hx AS (
           SELECT doc_id AS media_id,
             regexp_replace(hex(encode(text)), '(.).', '\1', 'g') AS hn
           FROM documents
         ), h AS (
           SELECT media_id,
             [CAST(length(hn) - length(replace(hn, c, '')) AS DOUBLE)
              for c in ['0','1','2','3','4','5','6','7',
                        '8','9','A','B','C','D','E','F']] AS v
           FROM hx
         ), scored AS (
           SELECT q.media_id AS q_id, a.media_id AS n_id,
             round(list_cosine_similarity(q.v, a.v), 6) AS cos
           FROM h q JOIN h a ON a.media_id <> q.media_id
           WHERE q.media_id < 3)
         SELECT q_id, rk, n_id, cos FROM (
           SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, n_id ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY q_id, rk""",
    "m02_frame_sample" ->
      """SELECT doc_id AS media_id,
         CAST(f / 500 AS BIGINT) AS frame_idx,
         CAST(f AS BIGINT) AS frame_off_ms,
         CAST(n_chars * 10 AS BIGINT) AS duration_ms
         FROM (SELECT doc_id, n_chars,
                 unnest(range(0, CAST(n_chars * 10 AS BIGINT), 500)) AS f
               FROM documents WHERE doc_id % 3 = 2)
         ORDER BY media_id, frame_idx""",
    "m08_media_dup_clusters" -> m08OracleSql,
    "m09_cdc_chunks" -> m09OracleSql,
    "m04_byte_histogram" ->
      // UTF-8 BYTE semantics, not characters: hex(encode(text)) renders
      // each payload byte as 2 hex digits, so the high nibble of byte i
      // is hex char 2i-1 — matches the Spark side's (b & 0xF0) >>> 4
      // for any input, ASCII or not.
      """SELECT (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
         count(*) AS n_docs,
         CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         CAST(sum(len(list_filter(
           range(1, octet_length(encode(text)) + 1),
           i -> substring(hex(encode(text)), CAST(2*i-1 AS INT), 1) = '2')))
           AS BIGINT) AS bin2_bytes,
         CAST(sum(len(list_filter(
           range(1, octet_length(encode(text)) + 1),
           i -> substring(hex(encode(text)), CAST(2*i-1 AS INT), 1) = '6')))
           AS BIGINT) AS bin6_bytes
         FROM documents GROUP BY 1 ORDER BY 1""",
    "m03_media_features" ->
      // the decode stub's feature 5 (index 4) is bin4/len — integer
      // nibble count (the m04 hex trick: high nibble of byte i = hex
      // char 2i−1) divided in DOUBLE and rounded once to REAL, exactly
      // what FakeDecoder.decode computes
      """SELECT (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
         count(*) AS n,
         round(avg(CAST(
           CAST(len(list_filter(
             range(1, octet_length(encode(text)) + 1),
             i -> substring(hex(encode(text)), CAST(2*i-1 AS INT), 1) = '4'))
             AS DOUBLE)
           / greatest(octet_length(encode(text)), 1) AS REAL)), 4) AS avg_f4,
         round(CAST(sum(octet_length(encode(text))) AS DOUBLE), 4) AS total_bytes
         FROM documents GROUP BY 1 ORDER BY 1""",
    "m05_resize_meta" ->
      // replicate resizeMeta's double arithmetic exactly: scale =
      // least(1.0, 96 / double(max(w,h))), then floor(dim * scale)
      """WITH m AS (
           SELECT doc_id AS media_id,
             (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
             CAST(64 + n_chars % 64 AS INT) AS w,
             CAST(64 + n_chars % 48 AS INT) AS h
           FROM documents),
         sc AS (SELECT *,
             least(1.0, 96 / CAST(greatest(w, h) AS DOUBLE)) AS scale FROM m)
         SELECT media_id, kind,
           CAST(floor(w * scale) AS INT) AS r_width,
           CAST(floor(h * scale) AS INT) AS r_height
         FROM sc ORDER BY media_id""",
    "j03_asof_forward" ->
      """WITH p AS (SELECT user_id, ts, max(value) AS p_value FROM events
                    WHERE event_type = 'purchase' GROUP BY 1, 2),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click')
         SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           strftime(pp.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           round(pp.p_value, 4) AS purchase_value
         FROM c LEFT JOIN LATERAL (
           SELECT ts, p_value FROM p
           WHERE p.user_id = c.user_id AND p.ts >= c.ts
           ORDER BY ts ASC LIMIT 1) pp ON true
         ORDER BY event_id""",
    "t01_token_counts" ->
      """SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_subwords,
         length(text) AS n_text_chars
         FROM documents ORDER BY doc_id""",
    "t02_quality_score" ->
      """WITH f AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS n_tok,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS n_stop,
             CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS n_nonspace,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
             CAST(length(text) AS DOUBLE) AS n_chars
           FROM documents)
         SELECT doc_id,
           floor((n_stop / n_tok)*1e4 + 0.5)/1e4 AS stop_ratio,
           floor((n_nonspace / n_tok)*1e4 + 0.5)/1e4 AS mean_tok_len,
           floor((n_alpha / n_chars)*1e4 + 0.5)/1e4 AS alpha_ratio,
           floor((least(1.0, n_tok/20.0)*0.4
                 + least(1.0, (n_stop/n_tok)*5.0)*0.3
                 + (CASE WHEN n_nonspace/n_tok BETWEEN 3.0 AND 10.0
                         THEN 1.0 ELSE 0.0 END)*0.3)*1e4 + 0.5)/1e4 AS quality
         FROM f ORDER BY doc_id""",
    "t03_lang_id" ->
      """WITH f AS (
           SELECT lang,
             CASE WHEN CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                    x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                  / len(regexp_split_to_array(trim(text), '\s+')) >= 0.05
                  THEN 'en' ELSE 'unk' END AS lang_pred
           FROM documents)
         SELECT lang, lang_pred, count(*) AS n FROM f
         GROUP BY 1,2 ORDER BY 1,2""",
    "t04_fingerprint" ->
      """SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
         FROM documents ORDER BY doc_id""",
    "t05_top_bigrams" ->
      """WITH toks AS (
           SELECT lang, regexp_split_to_array(trim(text), '\s+') AS tk
           FROM documents
         ), bg AS (
           SELECT lang, unnest([array_to_string(tk[i:i+1], ' ')
             for i in range(1, len(tk))]) AS bigram
           FROM toks WHERE len(tk) >= 2
         ), counts AS (
           SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2)
         SELECT lang, rk, bigram, n FROM (
           SELECT lang, bigram, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, bigram ASC) AS rk
           FROM counts)
         WHERE rk <= 5 ORDER BY lang, rk""",
    "t06_repetition" ->
      """WITH ex AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           FROM documents
         ), cnt AS (
           SELECT doc_id, tok, count(*) AS n FROM ex GROUP BY 1, 2)
         SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           floor((1.0 - count(*) / CAST(sum(n) AS DOUBLE))*1e4 + 0.5)/1e4
             AS dup_ratio,
           floor((max(n) / CAST(sum(n) AS DOUBLE))*1e4 + 0.5)/1e4
             AS top_tok_frac
         FROM cnt GROUP BY doc_id ORDER BY doc_id""",
    "t07_pii_scrub" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|[0-9]{7,}|\b(?i:customer|supplier)\b'))
           AS INT) AS n_redacted,
         length(text) AS n_chars_before,
         length(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|[0-9]{7,}|\b(?i:customer|supplier)\b',
           '[REDACTED]', 'g')) AS n_chars_after
         FROM documents ORDER BY doc_id""",
    "t08_gopher_rules" ->
      """WITH f AS (
           SELECT lang,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS n_tok,
             CAST(len(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS n_nospace,
             CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
             CAST(len(text) AS DOUBLE) AS n_chars,
             len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               w -> w IN ('the','a','of','and','to','in','is'))) AS n_stop
           FROM documents
         ), g AS (
           SELECT lang,
             NOT (n_tok BETWEEN 30.0 AND 50000.0) AS fail_len,
             NOT (n_nospace / n_tok BETWEEN 2.0 AND 10.0) AS fail_tok,
             n_stop < 2 AS fail_stop,
             n_alpha / n_chars < 0.6 AS fail_alpha
           FROM f)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN fail_len THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_len,
           CAST(sum(CASE WHEN fail_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_tok,
           CAST(sum(CASE WHEN fail_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stop,
           CAST(sum(CASE WHEN fail_alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_alpha,
           CAST(sum(CASE WHEN NOT fail_len AND NOT fail_tok AND NOT fail_stop
                         AND NOT fail_alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
         FROM g GROUP BY lang ORDER BY lang""",
    "t09_chunk_windows" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
           FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(len(tk) - 32, 0) + 23) / 24.0) AS BIGINT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, unnest(range(0, nc)) AS i FROM meta)
         SELECT doc_id, i AS chunk_id,
           CAST(len(tk[CAST(i*24+1 AS INT) : CAST(i*24+32 AS INT)]) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(tk[CAST(i*24+1 AS INT) : CAST(i*24+32 AS INT)], ' ')
             AS chunk_text
         FROM ex ORDER BY doc_id, chunk_id""",
    "t10_bm25" -> t10OracleSql,
    "t20_rrf_fusion" -> t20OracleSql,
    "t21_lm_continuations" ->
      """WITH toks AS (
           SELECT regexp_split_to_array(trim(text), '\s+') AS tk FROM documents
         ), bg AS (
           SELECT tk[i] AS context, tk[i + 1] AS next_tok
           FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                 FROM toks WHERE len(tk) >= 2)
         ), pc AS (
           SELECT context, next_tok, count(*) AS n_pair FROM bg GROUP BY 1, 2
         ), ctx AS (
           SELECT context, CAST(sum(n_pair) AS BIGINT) AS ctx_total
           FROM pc GROUP BY 1
         ), top_ctx AS (
           SELECT context, ctx_total FROM (
             SELECT context, ctx_total,
               row_number() OVER (ORDER BY ctx_total DESC, context ASC) AS cr
             FROM ctx) WHERE cr <= 20)
         SELECT context, CAST(rk AS BIGINT) AS rk, next_tok, n_pair,
           floor((CAST(n_pair AS DOUBLE) / CAST(ctx_total AS DOUBLE))*1e4
             + 0.5)/1e4 AS prob
         FROM (
           SELECT p.context, p.next_tok, p.n_pair, t.ctx_total,
             row_number() OVER (PARTITION BY p.context
               ORDER BY p.n_pair DESC, p.next_tok ASC) AS rk
           FROM pc p JOIN top_ctx t USING (context))
         WHERE rk <= 3 ORDER BY context, rk""",
    "t25_cms_counts" -> t25OracleSql,
    "t26_span_coverage" -> t26OracleSql,
    "t27_unigram_lm" -> t27OracleSql,
    "t28_zipf_profile" -> t28OracleSql,
    "t29_unigram_encode" -> t29OracleSql,
    "t11_heavy_hitters" ->
      """WITH w AS (
           SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
           FROM documents
         ), c AS (SELECT w, count(*) AS n FROM w GROUP BY 1)
         SELECT rk, w, n FROM (
           SELECT w, CAST(n AS BIGINT) AS n,
             row_number() OVER (ORDER BY n DESC, w) AS rk
           FROM c)
         WHERE rk <= 10 ORDER BY rk""",
    "t12_perplexity" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
           FROM documents
         ), bg AS (
           SELECT doc_id, i - 1 AS pos, tk[CAST(i AS INT)] AS v,
             tk[CAST(i + 1 AS INT)] AS w
           FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
                 FROM toks WHERE len(tk) >= 2)
         ), cvw AS (SELECT v, w, count(*) AS cvw FROM bg GROUP BY 1, 2
         ), cv AS (SELECT v, count(*) AS cv FROM bg GROUP BY 1
         ), vocab AS (
           SELECT count(DISTINCT tk2) AS vsz
           FROM (SELECT unnest(tk) AS tk2 FROM toks)
         ), scored AS (
           SELECT bg.doc_id, bg.pos,
             ln((CAST(cvw AS DOUBLE) + 1.0)
                / (CAST(cv AS DOUBLE) + CAST(vsz AS DOUBLE))) AS lnp
           FROM bg JOIN cvw USING (v, w) JOIN cv USING (v) CROSS JOIN vocab)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           floor(((-sum(lnp ORDER BY pos)) / CAST(count(*) AS DOUBLE))*1e4
             + 0.5)/1e4 AS cross_entropy,
           floor(exp((-sum(lnp ORDER BY pos)) / CAST(count(*) AS DOUBLE))*1e4
             + 0.5)/1e4 AS ppl
         FROM scored GROUP BY doc_id ORDER BY doc_id""",
    // t14: the pinned-merge BPE encode replayed exactly — symbols as a
    // space-separated sentinel string, one recursive step = replace the
    // LEFTMOST occurrence of merge k's pair (equivalent to the
    // non-overlapping left-to-right scan: a merge never creates a new
    // occurrence of its own pair to its left), k advances when merge k
    // no longer applies. n_sub = symbol count of the fixpoint string.
    "t14_bpe_encode" ->
      """WITH RECURSIVE
         words AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
           FROM documents
         ), vocab AS (SELECT DISTINCT word FROM words
         ), merges(k, pat, rep) AS (
           SELECT * FROM (VALUES
             (1, ' e r ',     ' er '),
             (2, ' e </w> ',  ' e</w> '),
             (3, ' n </w> ',  ' n</w> '),
             (4, ' er </w> ', ' er</w> '),
             (5, ' o w ',     ' ow '),
             (6, ' ow </w> ', ' ow</w> '),
             (7, ' o r ',     ' or '),
             (8, ' s t ',     ' st '))
         ), enc AS (
           SELECT word,
             ' ' || array_to_string(string_split(word, ''), ' ') || ' </w> ' AS s,
             1 AS k
           FROM vocab
           UNION ALL
           SELECT e.word,
             CASE WHEN strpos(e.s, m.pat) > 0
               THEN substr(e.s, 1, strpos(e.s, m.pat) - 1) || m.rep ||
                    substr(e.s, strpos(e.s, m.pat) + length(m.pat))
               ELSE e.s END,
             CASE WHEN strpos(e.s, m.pat) > 0 THEN e.k ELSE e.k + 1 END
           FROM enc e JOIN merges m ON m.k = e.k
         ), encoded AS (
           SELECT word,
             length(trim(s)) - length(replace(trim(s), ' ', '')) + 1 AS n_sub
           FROM enc WHERE k = 9
         )
         SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(e.n_sub) AS BIGINT) AS n_bpe_tokens
         FROM words w JOIN encoded e USING (word)
         GROUP BY w.doc_id
         ORDER BY doc_id""",
    "v02_referential_integrity" -> v02OracleSql,
    "v03_profile" -> v03OracleSql,
    "v04_drift_psi" -> v04OracleSql,
    "x20_mixture_waterfill" -> x20OracleSql,
    "j06_window_features" -> j06OracleSql,
    "j07_attribution" -> j07OracleSql,
    "t32_bpe_fertility" -> t32OracleSql,
    "t33_ngram_novelty" -> t33OracleSql,
    "t34_incremental_novelty" -> t34OracleSql,
    "v07_corpus_datasheet" -> v07OracleSql,
    "v08_split_leakage" -> v08OracleSql,
    "m10_aspect_buckets" -> m10OracleSql,
    "m11_batch_manifest" -> m11OracleSql,
    "x21_family_split" -> x21OracleSql,
    "x22_pack_efficiency" -> x22OracleSql,
    "v05_vocab_divergence" -> v05OracleSql,
    "t31_memorization" -> t31OracleSql,
    "d16_lsh_scurve" -> d16OracleSql,
    "d17_incremental_simhash" -> d17OracleSql,
    "d18_threshold_curve" -> d18OracleSql,
    "t30_kneser_ney" -> t30OracleSql,
    "d13_fuzzy_pairs" -> d13OracleSql,
    "d14_dup_spans" -> d14OracleSql,
    "d15_incremental_fuzzy" -> d15OracleSql,
    "v01_quality_checks" ->
      """WITH m AS (SELECT
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             AS nn,
           CAST(count(*) - count(DISTINCT o_orderkey) AS DOUBLE) AS uq,
           CAST(min(o_totalprice) AS DOUBLE) AS mn,
           CAST(max(o_totalprice) AS DOUBLE) AS mx,
           CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END)
             AS DOUBLE) AS st
         FROM orders)
         SELECT * FROM (
           SELECT 'not_null(o_custkey)' AS chk, nn AS metric, nn = 0 AS passed
             FROM m
           UNION ALL SELECT 'unique(o_orderkey)', uq, uq = 0 FROM m
           UNION ALL SELECT 'min_bound(o_totalprice)', mn, mn >= 0 FROM m
           UNION ALL SELECT 'max_bound(o_totalprice)', mx, mx <= 100000 FROM m
           UNION ALL SELECT 'in_set(o_orderstatus)', st, st = 0 FROM m)
         ORDER BY chk""",
    "x01_split_counts" ->
      """SELECT lang,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'test'
              WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'val'
              ELSE 'train' END AS split,
         count(*) AS n
         FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    "x02_stratified_sample" ->
      """SELECT lang, doc_id, n_chars FROM (
           SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
           FROM documents)
         WHERE rk <= 3 ORDER BY lang, doc_id""",
    "x03_token_shards" ->
      """WITH d AS (
           SELECT lang, doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS hk
           FROM documents
         ), c AS (
           SELECT lang, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY hk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM d)
         SELECT lang, CAST((cum - n_tokens) // 2000 AS BIGINT) AS shard,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         FROM c GROUP BY 1, 2 ORDER BY 1, 2""",
    "x04_curation_funnel" ->
      """WITH f AS (
           SELECT doc_id, text,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS n_tok,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS n_stop,
             CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS n_nonspace
           FROM documents),
         q AS (
           SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
             floor((least(1.0, n_tok/20.0)*0.4
                   + least(1.0, (n_stop/n_tok)*5.0)*0.3
                   + (CASE WHEN n_nonspace/n_tok BETWEEN 3.0 AND 10.0
                           THEN 1.0 ELSE 0.0 END)*0.3)*1e4 + 0.5)/1e4 AS quality
           FROM f),
         passing AS (SELECT * FROM q WHERE quality >= 0.5),
         keepers AS (SELECT fp, min(doc_id) AS doc_id FROM passing GROUP BY 1),
         sp AS (
           SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'test'
                       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'val'
                       ELSE 'train' END AS split
           FROM keepers)
         SELECT stage, n FROM (
           SELECT '1_raw' AS stage, count(*) AS n FROM q
           UNION ALL SELECT '2_quality_pass', count(*) FROM passing
           UNION ALL SELECT '3_dedup_keepers', count(*) FROM keepers
           UNION ALL SELECT concat('4_', split), count(*) FROM sp GROUP BY split)
         ORDER BY stage""",
    "x07_proportional_sample" ->
      """WITH r AS (
           SELECT lang, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk,
             count(*) OVER (PARTITION BY source) AS n_stratum
           FROM documents)
         SELECT lang, source, count(*) AS n FROM r
         WHERE rk <= ceil(n_stratum * 0.2)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "x08_temperature_mix" ->
      """WITH r AS (
           SELECT source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk,
             count(*) OVER (PARTITION BY source) AS n
           FROM documents
         ), samp AS (
           SELECT source, count(*) AS n_sampled FROM r
           WHERE rk <= least(n, CAST(ceil(4.0 * sqrt(n)) AS BIGINT))
           GROUP BY source
         ), tot AS (
           SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
         SELECT source, n_docs, n_sampled
         FROM tot JOIN samp USING (source) ORDER BY source""",
    "x09_domain_caps" ->
      """SELECT source, doc_id FROM (
           SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
           FROM documents)
         WHERE rk <= 20 ORDER BY source, doc_id""",
    // x10: the oracle's single-window ordered prefix sum IS the spec;
    // the engine computes the same numbering with the two-phase
    // bucket-splice (no single-task window) — integer-exact, so the
    // hashes agree on any partitioning.
    "x10_pack_sequences" ->
      raw"""WITH n AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
           FROM documents
         ), c AS (
           SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS BIGINT) AS start_tok
           FROM n)
         SELECT doc_id, n_tokens, start_tok,
           start_tok // ${Sampling.X22Budget} AS seq_first,
           ((start_tok + n_tokens - 1) // ${Sampling.X22Budget})
             - (start_tok // ${Sampling.X22Budget}) + 1 AS n_seqs,
           start_tok % ${Sampling.X22Budget} AS pos_in_seq
         FROM c ORDER BY doc_id""",
    "x11_dsir_weights" ->
      """WITH w AS (
           SELECT doc_id, lang,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS wd
           FROM documents
         ), fb AS (
           SELECT doc_id, (lang = 'en') AS is_target,
             substring(md5(wd), 1, 2) AS f
           FROM w
         ), buckets AS (
           SELECT f, count(*) AS n_raw,
             sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS n_tgt
           FROM fb GROUP BY 1
         ), tot AS (
           SELECT CAST(sum(n_raw) AS DOUBLE) AS r_total,
             CAST(sum(n_tgt) AS DOUBLE) AS t_total
           FROM buckets
         ), lam AS (
           SELECT f,
             CAST(floor(ln(((CAST(n_tgt AS DOUBLE) + 0.5) / (t_total + 128.0))
               / ((CAST(n_raw AS DOUBLE) + 0.5) / (r_total + 128.0)))*1e6 + 0.5)
               AS BIGINT) AS lam_micro
           FROM buckets, tot
         ), dc AS (
           SELECT doc_id, f, count(*) AS c FROM fb GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(sum(c * lam_micro) AS BIGINT) AS weight_micro
         FROM dc JOIN lam USING (f)
         GROUP BY doc_id ORDER BY doc_id""",
    "x12_curriculum_bins" ->
      """WITH f AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
               AS n_tok,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
               AS n_stop,
             CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
               AS n_nonspace
           FROM documents
         ), q AS (
           SELECT doc_id,
             floor((least(1.0, n_tok/20.0)*0.4
                   + least(1.0, (n_stop/n_tok)*5.0)*0.3
                   + (CASE WHEN n_nonspace/n_tok BETWEEN 3.0 AND 10.0
                           THEN 1.0 ELSE 0.0 END)*0.3)*1e4 + 0.5)/1e4
               AS quality
           FROM f
         ), r AS (
           SELECT doc_id, quality,
             CAST(row_number() OVER (ORDER BY quality, doc_id) AS BIGINT)
               AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n
           FROM q)
         SELECT doc_id, quality, rk, ((rk - 1) * 4) // n AS bin
         FROM r ORDER BY doc_id""",
    // x13: 52 md5 bits → u ∈ (0,1], key = ln(u)/w floored to 1e-9
    // before ranking — the Efraimidis–Spirakis draw, engine-exact.
    "x13_weighted_sample" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w,
             (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                AS BIGINT) + 1) / 4503599627370496.0 AS u
           FROM documents
         ), k AS (
           SELECT doc_id, w,
             floor((ln(u) / w)*1e9 + 0.5)/1e9 AS sk
           FROM d WHERE w > 0)
         SELECT rk, doc_id, w, sk FROM (
           SELECT doc_id, w, sk,
             CAST(row_number() OVER (ORDER BY sk DESC, doc_id ASC) AS BIGINT)
               AS rk
           FROM k)
         WHERE rk <= 50 ORDER BY rk""",
    // x14: the s05 pinned-centroid argmax assignment + the x13-style
    // deterministic md5 pick, ranked per cell.
    "x14_cluster_sample" -> x14OracleSql,
    // x15: pinned linear quality model — weights interpolated from the
    // SAME fixture the engine serves; pure int64 micro arithmetic up
    // to the one r4-floored reporting division.
    "x15_quality_classifier" -> x15OracleSql,
    // t22: flagged fraction over the pinned blocklist; keep compares
    // the r4-floored fraction so the boundary is engine-exact. Terms
    // and threshold are single-sourced from TextOps (the s18/capGuard
    // discipline).
    "t22_blocklist_filter" ->
      s"""WITH f AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 x -> x IN ($t22TermsSql))) AS BIGINT) AS n_flagged
           FROM documents)
         SELECT doc_id, n_tokens, n_flagged,
           floor((n_flagged / CAST(n_tokens AS DOUBLE))*1e4 + 0.5)/1e4
             AS flagged_frac,
           (floor((n_flagged / CAST(n_tokens AS DOUBLE))*1e4 + 0.5)/1e4
             < ${TextOps.BlocklistMaxFrac})
             AS keep
         FROM f ORDER BY doc_id""",
    // t23: corpus-frequency boilerplate scrub — chunks occurring >= 2
    // times anywhere lose ALL copies; clean_text re-joins survivors in
    // chunk order (empty docs coalesce to '').
    "t23_boilerplate_scrub" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
           FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(len(tk) - 32, 0) + 31) / 32.0) AS BIGINT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, unnest(range(0, nc)) AS i FROM meta
         ), ck AS (
           SELECT doc_id, i AS chunk_id,
             array_to_string(tk[CAST(i*32+1 AS INT) : CAST(i*32+32 AS INT)], ' ')
               AS chunk_text
           FROM ex
         ), boiler AS (
           SELECT chunk_text FROM ck GROUP BY chunk_text HAVING count(*) >= 2
         ), v AS (
           SELECT c.doc_id, c.chunk_id, c.chunk_text,
             (b.chunk_text IS NULL) AS keep
           FROM ck c LEFT JOIN boiler b ON c.chunk_text = b.chunk_text)
         SELECT doc_id, count(*) AS n_chunks,
           count(CASE WHEN keep THEN 1 END) AS n_kept,
           coalesce(array_to_string(
             list(chunk_text ORDER BY chunk_id ASC) FILTER (WHERE keep), ' '),
             '') AS clean_text
         FROM v GROUP BY doc_id ORDER BY doc_id""",
    // t24: combined store+batch counts == whole-corpus counts, so the
    // oracle is t23's replay with verdicts restricted to the batch
    // (doc_id >= T24SplitAt) — the union-equivalence law in SQL form.
    "t24_incremental_boilerplate" ->
      s"""WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
           FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(len(tk) - 32, 0) + 31) / 32.0) AS BIGINT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, unnest(range(0, nc)) AS i FROM meta
         ), ck AS (
           SELECT doc_id, i AS chunk_id,
             array_to_string(tk[CAST(i*32+1 AS INT) : CAST(i*32+32 AS INT)], ' ')
               AS chunk_text
           FROM ex
         ), boiler AS (
           SELECT chunk_text FROM ck GROUP BY chunk_text HAVING count(*) >= 2
         ), v AS (
           SELECT c.doc_id, c.chunk_id, c.chunk_text,
             (b.chunk_text IS NULL) AS keep
           FROM ck c LEFT JOIN boiler b ON c.chunk_text = b.chunk_text
           WHERE c.doc_id >= ${graft.operators.TextOps.T24SplitAt})
         SELECT doc_id, count(*) AS n_chunks,
           count(CASE WHEN keep THEN 1 END) AS n_kept,
           coalesce(array_to_string(
             list(chunk_text ORDER BY chunk_id ASC) FILTER (WHERE keep), ' '),
             '') AS clean_text
         FROM v GROUP BY doc_id ORDER BY doc_id""",
    "t15_chunk_dedup" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
           FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(len(tk) - 32, 0) + 31) / 32.0) AS BIGINT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, unnest(range(0, nc)) AS i FROM meta
         ), ck AS (
           SELECT doc_id, i AS chunk_id,
             array_to_string(tk[CAST(i*32+1 AS INT) : CAST(i*32+32 AS INT)], ' ')
               AS chunk_text
           FROM ex
         ), rk AS (
           SELECT doc_id, chunk_id,
             row_number() OVER (PARTITION BY chunk_text
               ORDER BY doc_id ASC, chunk_id ASC) AS rn
           FROM ck)
         SELECT doc_id, count(*) AS n_chunks,
           count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
           floor((count(CASE WHEN rn = 1 THEN 1 END)
             / CAST(count(*) AS DOUBLE))*1e4 + 0.5)/1e4 AS kept_frac
         FROM rk GROUP BY doc_id ORDER BY doc_id""",
    "t16_inverted_index" ->
      """WITH ex AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents
         ), tf AS (
           SELECT term, doc_id, count(*) AS tf FROM ex GROUP BY 1, 2)
         SELECT term, CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS cf,
           array_to_string(
             (list(doc_id || ':' || tf ORDER BY doc_id))[1:10], ',')
             AS postings
         FROM tf GROUP BY term ORDER BY term""",
    "t17_phrase_search" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
           FROM documents
         ), tok AS (
           SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[i] AS term
           FROM toks, LATERAL (SELECT unnest(range(1, len(tk)+1)) AS i)
         ), bg AS (
           SELECT t1.term || ' ' || t2.term AS phrase, count(*) AS n
           FROM tok t1 JOIN tok t2
             ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
           GROUP BY 1
         ), ph AS (
           SELECT phrase, string_split(phrase, ' ')[1] AS w1,
             string_split(phrase, ' ')[2] AS w2
           FROM (SELECT phrase FROM bg ORDER BY n DESC, phrase ASC LIMIT 3)
         ), p1 AS (
           SELECT ph.phrase, t.doc_id, t.pos FROM tok t JOIN ph ON t.term = ph.w1
         ), p2 AS (
           SELECT ph.phrase, t.doc_id, t.pos FROM tok t JOIN ph ON t.term = ph.w2)
         SELECT p1.phrase, p1.doc_id, count(*) AS n_hits,
           min(p1.pos) AS first_pos
         FROM p1 JOIN p2 ON p1.phrase = p2.phrase
           AND p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "t18_collocations" ->
      """WITH toks AS (
           SELECT regexp_split_to_array(trim(text), '\s+') AS tk FROM documents
         ), bg AS (
           SELECT tk[i] || ' ' || tk[i + 1] AS bigram
           FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                 FROM toks WHERE len(tk) >= 2)
         ), bgc AS (SELECT bigram, count(*) AS n_pair FROM bg GROUP BY 1
         ), uni AS (
           SELECT w, count(*) AS n_w
           FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY 1
         ), tot AS (
           SELECT (SELECT CAST(sum(n_pair) AS DOUBLE) FROM bgc) AS b_total,
             (SELECT CAST(sum(n_w) AS DOUBLE) FROM uni) AS t_total
         ), scored AS (
           SELECT b.bigram, b.n_pair,
             floor(ln((CAST(b.n_pair AS DOUBLE) / t.b_total)
               / ((CAST(u1.n_w AS DOUBLE) / t.t_total)
                  * (CAST(u2.n_w AS DOUBLE) / t.t_total)))*1e4 + 0.5)/1e4
               AS pmi
           FROM bgc b
           JOIN uni u1 ON u1.w = string_split(b.bigram, ' ')[1]
           JOIN uni u2 ON u2.w = string_split(b.bigram, ' ')[2]
           CROSS JOIN tot t
           WHERE b.n_pair >= 5)
         SELECT CAST(row_number() OVER (ORDER BY pmi DESC, bigram ASC) AS INT)
             AS rk, bigram, n_pair, pmi
         FROM scored ORDER BY pmi DESC, bigram ASC LIMIT 20""",
    "t19_tfidf" ->
      """WITH tfc AS (
           SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS term
                 FROM documents)
           GROUP BY 1, 2
         ), dfc AS (
           SELECT term, count(*) AS df FROM tfc GROUP BY 1
         ), nd AS (SELECT count(*) AS n_docs FROM documents
         ), scored AS (
           SELECT doc_id, tfc.term AS term,
             floor((CAST(tf AS DOUBLE)
               * (ln((CAST(n_docs AS DOUBLE) + 1.0)
                      / (CAST(df AS DOUBLE) + 1.0)) + 1.0))*1e4 + 0.5)/1e4
               AS tfidf
           FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN nd)
         SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tfidf FROM (
           SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, term ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY doc_id, rk""",
    "x05_decontaminate" ->
      """WITH toks AS (
           SELECT doc_id,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
             regexp_split_to_array(trim(text), '\s+') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id, bucket,
             list_distinct([array_to_string(tk[i:i+2], ' ')
               for i in range(1, len(tk)-1)]) AS shingles
           FROM toks WHERE len(tk) >= 3
         ), test_sh AS (
           SELECT DISTINCT unnest(shingles) AS shingle
           FROM sh WHERE bucket < '0d'
         ), train AS (
           SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_shingles,
             unnest(shingles) AS shingle
           FROM sh WHERE bucket >= '1a')
         SELECT t.doc_id,
           count(*) AS n_contaminated,
           n_shingles,
           floor((count(*) / CAST(n_shingles AS DOUBLE))*1e4 + 0.5)/1e4
             AS contamination
         FROM train t JOIN test_sh USING (shingle)
         GROUP BY t.doc_id, n_shingles ORDER BY t.doc_id""",
    // x16: exact cross-split Jaccard verdicts (string shingles replay
    // the engine's hashed sets — sizes/intersections identical modulo
    // 64-bit collisions, the documented docShingles equivalence);
    // threshold interpolated from Dedup.X16Threshold.
    "x16_fuzzy_decontaminate" ->
      s"""WITH toks AS (
           SELECT doc_id,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
             regexp_split_to_array(trim(text), '\\s+') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id, bucket,
             list_distinct([array_to_string(tk[i:i+2], ' ')
               for i in range(1, len(tk)-1)]) AS shingles
           FROM toks WHERE len(tk) >= 3
         ), m AS (
           SELECT t.doc_id AS doc_id, b.doc_id AS bench_id,
             round(len(list_intersect(t.shingles, b.shingles)) * 1.0
               / (len(t.shingles) + len(b.shingles)
                  - len(list_intersect(t.shingles, b.shingles))), 4) AS jaccard
           FROM sh t JOIN sh b ON t.bucket >= '1a' AND b.bucket < '0d'
           WHERE round(len(list_intersect(t.shingles, b.shingles)) * 1.0
               / (len(t.shingles) + len(b.shingles)
                  - len(list_intersect(t.shingles, b.shingles))), 4)
             >= ${graft.operators.Dedup.X16Threshold})
         SELECT doc_id, bench_id, jaccard, n_matches FROM (
           SELECT doc_id, bench_id, jaccard,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY jaccard DESC, bench_id ASC) AS rk,
             CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_matches
           FROM m)
         WHERE rk = 1 ORDER BY doc_id""",
    "x06_range_shards" ->
      """WITH o AS (
           SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders
         ), b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM o)
         SELECT (cents - mn) * 8 // (mx - mn + 1) AS shard,
           count(*) AS n_orders,
           min(cents) AS min_cents, max(cents) AS max_cents
         FROM o, b GROUP BY 1 ORDER BY 1""",
    "d01_exact_dedup" ->
      """SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
         min(doc_id) AS keeper, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keeper""",
    "x17_soft_dedup_weights" ->
      """WITH f AS (
           SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
           FROM documents
         ), fam AS (
           SELECT fp, CAST(count(*) AS BIGINT) AS n_copies FROM f GROUP BY fp)
         SELECT doc_id, n_copies,
           floor((1.0 / CAST(n_copies AS DOUBLE))*1e4 + 0.5)/1e4 AS weight
         FROM f JOIN fam USING (fp) ORDER BY doc_id""",
    "x18_bloom_decontaminate" -> x18OracleSql,
    "x19_epoch_shuffle" -> x19OracleSql,
    "d11_incremental_dedup" ->
      """WITH f AS (
           SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
           FROM documents
         ), store AS (SELECT DISTINCT fp FROM f WHERE doc_id < 250),
         batch AS (SELECT * FROM f WHERE doc_id >= 250)
         SELECT b.fp, min(b.doc_id) AS keeper, count(*) AS n_copies
         FROM batch b LEFT JOIN store s ON b.fp = s.fp
         WHERE s.fp IS NULL
         GROUP BY b.fp ORDER BY keeper""",
    "d02_minhash_lsh" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents
         ), sh AS (
           SELECT doc_id, list_distinct([array_to_string(tk[i:i+2], ' ')
             for i in range(1, len(tk)-1)]) AS shingles
           FROM toks WHERE len(tk) >= 3
         ), pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.shingles, b.shingles)) AS inter,
             len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles)) AS uni
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, round(inter * 1.0 / uni, 4) AS jaccard
         FROM pairs WHERE round(inter * 1.0 / uni, 4) >= 0.7
         ORDER BY doc_a, doc_b""",
    "d03_ngram_jaccard" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents
         ), sh AS (
           SELECT doc_id, list_distinct([array_to_string(tk[i:i+2], ' ')
             for i in range(1, len(tk)-1)]) AS shingles
           FROM toks WHERE len(tk) >= 3
         ), pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.shingles, b.shingles)) AS inter,
             len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles)) AS uni
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, round(inter * 1.0 / uni, 4) AS jaccard
         FROM pairs WHERE round(inter * 1.0 / uni, 4) >= 0.7
         ORDER BY doc_a, doc_b""",
    // d12: the EXACT batch×store Jaccard replay (the engine's banded
    // probe carries it at band-recall 1.0 — the pinned d02 ≡ d03
    // regime restricted to cross-split pairs).
    "d12_incremental_neardup" ->
      s"""WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
         ), sh AS (
           SELECT doc_id, list_distinct([array_to_string(tk[i:i+2], ' ')
             for i in range(1, len(tk)-1)]) AS shingles
           FROM toks WHERE len(tk) >= 3
         ), m AS (
           SELECT b.doc_id AS doc_id, a.doc_id AS store_id,
             round(len(list_intersect(a.shingles, b.shingles)) * 1.0
               / (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))), 4) AS jaccard
           FROM sh a JOIN sh b
             ON a.doc_id < ${graft.operators.Dedup.D12SplitAt}
             AND b.doc_id >= ${graft.operators.Dedup.D12SplitAt}
           WHERE round(len(list_intersect(a.shingles, b.shingles)) * 1.0
               / (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))), 4) >= 0.7)
         SELECT doc_id, store_id AS best_match, jaccard, n_matches FROM (
           SELECT doc_id, store_id, jaccard,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY jaccard DESC, store_id ASC) AS rk,
             CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_matches
           FROM m)
         WHERE rk = 1 ORDER BY doc_id""",
    // d04: the 64-bit simhash replayed exactly in integer SQL — FNV-1a
    // token hashes, SplitMix64-mixed 3-gram shingles, per-bit majority.
    // All math is HUGEINT mod 2^64; the two ~2^63.5 SplitMix64 constants
    // would overflow INT128 under direct multiply, so those use the
    // split form (a_lo·c + ((a_hi·c mod 2^32) << 32)) mod 2^64. The
    // oracle skips the engine's 16-bit-chunk pigeonhole bucketing and
    // brute-forces all pairs: the bucketing guarantees recall for
    // hamming ≤ 3 and the exact hamming filter makes both forms equal.
    // ASCII/BMP-only equivalence assumption: ord(c) over string_split
    // yields Unicode CODE POINTS while the engine's fnv64 iterates
    // UTF-16 code units — identical for every BMP character, divergent
    // only for surrogate pairs (non-BMP, absent from the synthetic
    // corpus).
    "d04_simhash" -> d04OracleSql,
    "d05_dup_clusters" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents
         ), sh AS (
           SELECT doc_id, list_distinct([array_to_string(tk[i:i+2], ' ')
             for i in range(1, len(tk)-1)]) AS shingles
           FROM toks WHERE len(tk) >= 3
         ), pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sh a
           JOIN sh b ON a.doc_id < b.doc_id
           WHERE round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
             (len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles))), 4) >= 0.7
         ), edges AS (
           SELECT doc_a AS a, doc_b AS b FROM pairs
           UNION ALL SELECT doc_b, doc_a FROM pairs
         ), nodes AS (SELECT DISTINCT a AS n FROM edges),
         reach(n, m) AS (
           SELECT n, n FROM nodes
           UNION
           SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
         )
         SELECT n AS doc_id, min(m) AS cluster FROM reach
         GROUP BY n ORDER BY doc_id""",
    "d06_capped_jaccard" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents
         ), sh AS (
           SELECT doc_id, unnest(list_distinct([array_to_string(tk[i:i+2], ' ')
             for i in range(1, len(tk)-1)])) AS shingle
           FROM toks WHERE len(tk) >= 3
         ), rare AS (
           SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 50
         ), kept AS (
           SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)
         ), sized AS (
           SELECT doc_id, count(*) AS n FROM kept GROUP BY 1
         ), inter AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             sa.n AS n_a, sb.n AS n_b, count(*) AS i
           FROM kept a JOIN kept b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           JOIN sized sa ON sa.doc_id = a.doc_id
           JOIN sized sb ON sb.doc_id = b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT doc_a, doc_b, round(i * 1.0 / (n_a + n_b - i), 4) AS jaccard
         FROM inter WHERE round(i * 1.0 / (n_a + n_b - i), 4) >= 0.7
         ORDER BY doc_a, doc_b""",
    "d08_keep_best" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents
         ), sh AS (
           SELECT doc_id, list_distinct([array_to_string(tk[i:i+2], ' ')
             for i in range(1, len(tk)-1)]) AS shingles
           FROM toks WHERE len(tk) >= 3
         ), pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sh a
           JOIN sh b ON a.doc_id < b.doc_id
           WHERE round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
             (len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles))), 4) >= 0.7
         ), edges AS (
           SELECT doc_a AS a, doc_b AS b FROM pairs
           UNION ALL SELECT doc_b, doc_a FROM pairs
         ), nodes AS (SELECT DISTINCT a AS n FROM edges),
         reach(n, m) AS (
           SELECT n, n FROM nodes
           UNION
           SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
         ), clusters AS (
           SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n
         ), sel AS (
           SELECT c.cluster, d.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.cluster
               ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk,
             count(*) OVER (PARTITION BY c.cluster) AS n_members
           FROM clusters c JOIN documents d USING (doc_id))
         SELECT cluster, doc_id AS kept_doc_id, n_chars AS kept_chars, n_members
         FROM sel WHERE rk = 1 ORDER BY cluster""",
    // d10 = the minhash-banded composition; it carries d08's EXACT
    // oracle because the band recall is 1.0 on this corpus at the 0.7
    // threshold (d02 ≡ d03; DedupSpec pins pair-set equality at the
    // correctness SFs), so LSH-sourced clusters == exact clusters.
    "d10_keep_best_lsh" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents
         ), sh AS (
           SELECT doc_id, list_distinct([array_to_string(tk[i:i+2], ' ')
             for i in range(1, len(tk)-1)]) AS shingles
           FROM toks WHERE len(tk) >= 3
         ), pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sh a
           JOIN sh b ON a.doc_id < b.doc_id
           WHERE round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
             (len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles))), 4) >= 0.7
         ), edges AS (
           SELECT doc_a AS a, doc_b AS b FROM pairs
           UNION ALL SELECT doc_b, doc_a FROM pairs
         ), nodes AS (SELECT DISTINCT a AS n FROM edges),
         reach(n, m) AS (
           SELECT n, n FROM nodes
           UNION
           SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
         ), clusters AS (
           SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n
         ), sel AS (
           SELECT c.cluster, d.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.cluster
               ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk,
             count(*) OVER (PARTITION BY c.cluster) AS n_members
           FROM clusters c JOIN documents d USING (doc_id))
         SELECT cluster, doc_id AS kept_doc_id, n_chars AS kept_chars, n_members
         FROM sel WHERE rk = 1 ORDER BY cluster""",
    "d07_embedding_clusters" ->
      """WITH RECURSIVE e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         ), pairs AS (
           SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
           FROM e a JOIN e b ON a.vec_id < b.vec_id
           WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
         ), edges AS (
           SELECT doc_a AS a, doc_b AS b FROM pairs
           UNION ALL SELECT doc_b, doc_a FROM pairs
         ), nodes AS (SELECT DISTINCT a AS n FROM edges),
         reach(n, m) AS (
           SELECT n, n FROM nodes
           UNION
           SELECT r.n, e2.b FROM reach r JOIN edges e2 ON r.m = e2.a
         )
         SELECT n AS vec_id, min(m) AS cluster FROM reach
         GROUP BY n ORDER BY vec_id""",
    "s06_label_norms" ->
      """WITH e AS (SELECT label,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
         FROM embeddings)
         SELECT label, count(*) AS n,
           round(avg(nrm), 4) AS avg_norm,
           round(min(nrm), 4) AS min_norm,
           round(max(nrm), 4) AS max_norm
         FROM e GROUP BY 1 ORDER BY 1""",
    "s07_label_centroid" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         ex AS (SELECT label, unnest(v) AS x,
                       unnest(range(0, len(v))) AS pos FROM e)
         SELECT label, CAST(pos AS INT) AS pos, round(avg(x), 4) AS c
         FROM ex GROUP BY 1, 2 ORDER BY 1, 2""",
    "s08_ann_quantized" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         q AS (SELECT vec_id,
                 list_transform(v, x -> floor(x * 127.0 /
                   list_max(list_transform(v, y -> abs(y))) + 0.5)) AS qv
               FROM e),
         n AS (SELECT vec_id, qv,
                 sqrt(list_dot_product(qv, qv)) AS nrm FROM q),
         scored AS (
           SELECT qq.vec_id AS q_id, a.vec_id AS n_id,
             round(list_dot_product(qq.qv, a.qv) / (qq.nrm * a.nrm), 6) AS qcos
           FROM n qq JOIN n a ON a.vec_id <> qq.vec_id
           WHERE qq.vec_id < 5)
         SELECT q_id, rk, n_id, qcos FROM (
           SELECT q_id, n_id, qcos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY qcos DESC, n_id ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY q_id, rk""",
    "s15_hard_negatives" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
                    FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id, a.label AS n_label,
             round(list_cosine_similarity(q.v, a.v), 6) AS cos
           FROM e q JOIN e a
             ON a.vec_id <> q.vec_id AND a.label <> q.label
           WHERE q.vec_id < 5)
         SELECT q_id, rk, n_id, n_label, cos FROM (
           SELECT q_id, n_id, n_label, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY q_id, rk""",
    "s01_ann_bruteforce" -> s01OracleSql,
    "s26_ann_binary" -> s26OracleSql,
    "s21_ann_recall" -> s21OracleSql,
    "s22_bitext_mine" -> s22OracleSql,
    "s23_bitext_mine_lsh" -> s23OracleSql,
    "s24_mmr_rerank" -> s24OracleSql,
    "s25_ann_rank_eval" -> s25OracleSql,
    "s02_cosine_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
         ORDER BY id_a, id_b""",
    // The sign-LSH queries (s03/s04/d09) use the integer-grid bucket
    // key (Similarity.lshBucketInt): quantized components
    // ⌊v·10⁶ + 0.5⌋ against integer plane literals — every product
    // and sum is exact integer arithmetic, so the bucket assignment
    // (and with it the probe/pair/cluster output) is engine-portable.
    // The plane components are embedded in the SQL as literals of the
    // same SplitMix64 family the engine evaluates. The anchor-star
    // hot-bucket cap is a NO-OP below 1000 rows per bucket, far above
    // any bucket at the sf0.01 gate (500 vectors) — the capped regime
    // is spec-pinned instead (LshClusterSpec hot-bucket tests).
    "s03_lsh_pairs" -> s03OracleSql,
    "s16_ann_graph" -> s16OracleSql,
    "s17_ann_graph_lsh" -> s17OracleSql,
    "s18_ann_graph_insert" -> s18OracleSql,
    "s19_ann_graph_refined" -> s19OracleSql,
    "s20_ann_graph_insert_recip" -> s20OracleSql,
    "s03c_lsh_pairs_capped" -> s03cOracleSql,
    "s04_ann_ivf" -> s04OracleSql,
    "s27_matryoshka_eval" -> s27OracleSql,
    "s28_ann_tombstones" -> s28OracleSql,
    "s29_ann_index_stats" -> s29OracleSql,
    "s30_rerank_depth" -> s30OracleSql,
    "s31_two_tower_rerank" -> s31OracleSql,
    "s32_embedding_drift" -> s32OracleSql,
    "s33_ann_filtered" -> s33OracleSql,
    "s34_semantic_admission" -> s34OracleSql,
    "v06_dedup_impact" -> v06OracleSql,
    "d09_embedding_clusters_lsh" -> d09OracleSql,
    // s05/s09 serve PINNED model fixtures (Pinned.ivfCentroids /
    // Pinned.pq), so cell assignment, PQ codes, ADC scores and the
    // exact re-rank are pure functions the SQL replays with unrolled
    // LEFT-ASSOCIATIVE sums — the same sequential float-op order as
    // the codegen'd loops, so even the argmax comparisons see
    // bit-identical doubles.
    "s05_ann_kmeans_ivf" -> s05OracleSql,
    "s09_ann_pq" -> s09OracleSql,
    // s11 persists Pinned.pq and serves the LOADED copy; parquet
    // round-trips doubles exactly, so its output is s09's and the
    // oracle is shared.
    "s11_ann_pq_fitserve" -> s09OracleSql,
    "s10_ann_ivfpq" -> s10OracleSql,
    "s13_ann_opq" -> s13OracleSql,
    // s14 serves Pinned.semCells; at gate scale every cell is far
    // below cellCap, so the LSH refinement and anchor cap are no-ops
    // (spec-pinned separately) and the pair source is exactly
    // "collide in any of the top-2 probe cells".
    "s14_semdedup" -> s14OracleSql,
    // t13 BPE TRAINING, fully self-derived in SQL: 8 unrolled rounds,
    // each picking the weighted argmax adjacent pair (ties
    // lexicographic, binary collation both engines) and re-encoding
    // the vocabulary with t14's recursive replace-first CTE (proven
    // equivalent to the engine's left-to-right non-overlapping merge).
    // No fixture — the oracle re-derives the whole trajectory.
    "t13_bpe_merges" -> t13OracleSql,
    // s12 projects with the PINNED rotation fixture (Pca.pinnedModel,
    // signs canonicalized), so each pc is a pure centered dot the SQL
    // replays as an unrolled LEFT-ASSOCIATIVE sum — the same sequential
    // float-op order as the codegen'd loop, hence bit-identical before
    // the 4-decimal rounding.
    "s12_pca_project" -> s12OracleSql,
  )

  /** The s12 oracle, generated so the 4×64(+64) fixture components
    * stay single-sourced in [[graft.operators.Pca.pinnedModel]]. */
  private lazy val s12OracleSql: String = {
    val m = Pca.pinnedModel
    def pcExpr(w: Array[Double]): String =
      (0 until 64).map(d => s"(v[${d + 1}] - (${m.mean(d)}))*(${w(d)})")
        .mkString(" + ")
    val cols = m.components.zipWithIndex.map { case (w, i) =>
      s"round(${pcExpr(w)}, 4) AS pc${i + 1}"
    }.mkString(",\n           ")
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings)
         SELECT vec_id, label,
           $cols
         FROM e ORDER BY vec_id"""
  }

  /** Shared CTE prefix for the integer-grid sign-LSH oracles: one
    * bucket key per (vector, table), generated so the plane components
    * stay single-sourced in [[graft.operators.Similarity.intPlane]].
    * Table `tb`'s planes are intPlane(tb·nPlanes + i) — the same
    * disjoint-offset family the engine's lshBucketInt uses. */
  private def lshBucketsCte(nTables: Int, nPlanes: Int): String = {
    val planeRows = (for { tb <- 0 until nTables; i <- 0 until nPlanes } yield
      s"($tb, $i, ${Similarity.intPlane(tb * nPlanes + i, 64).mkString("[", ", ", "]")})")
      .mkString(",\n           ")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         pl(tb, i, p) AS (VALUES
           $planeRows),
         comp AS (
           SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS k FROM e),
         sums AS (
           SELECT c.vec_id, pl.tb, pl.i,
             SUM(CAST(floor(c.x * 1000000 + 0.5) AS BIGINT) * pl.p[CAST(c.k AS INT)]) AS s
           FROM comp c CROSS JOIN pl GROUP BY c.vec_id, pl.tb, pl.i),
         buckets AS (
           SELECT vec_id, tb,
             string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS bucket
           FROM sums GROUP BY vec_id, tb)"""
  }

  /** Loud-failure guard for the capped pair generators (s03/d09/s14):
    * their oracles replay the UNCAPPED pair source, valid only while
    * every bucket/cell stays at or below the engine's cap (1000). If a
    * larger or skewed dataset ever crosses it, the engine engages
    * refinement/anchor capping and the oracle would silently
    * hash-mismatch as a phantom engine bug — so the SQL asserts the
    * precondition itself and raises a self-describing error instead.
    * `sizeSql` must select one `cnt` per bucket. */
  private def capGuardCte(name: String, sizeSql: String): String = {
    val cap = Similarity.DefaultBucketCap // single-sourced with the engine cap
    s"""guard AS (
           SELECT CASE WHEN max(cnt) > $cap THEN error(
             '$name oracle precondition violated: a bucket/cell exceeds the engine cap ($cap); the engine output is anchor-capped there and this uncapped SQL replay no longer applies')
             ELSE 1 END AS ok
           FROM ($sizeSql))"""
  }

  /** The graph-beam-search tail shared by the s16/s17/s18 replays (and
    * both dialects of each): expects a prior CTE `sc(src, dst, cos)` —
    * the candidate edge stream — plus a corpus CTE `eTab(vec_id, v
    * [, nrm])`; emits the top-m graph, the pinned-entry seed, `hops`
    * frontier/expand/score/union blocks, and the final top-k select.
    * `cos(a, b)` renders the dialect's rounded-cosine expression.
    * The t13 unrolling discipline: the engine's FIXED-hop beam search
    * is re-derived as chained CTEs (one block per hop), so the oracle
    * runs the identical computation, not a re-derivation; parameters
    * must mirror [[graft.operators.Similarity.annGraph]]'s defaults. */
  /** `finalCteHeader`: empty (default) ends the statement with the
    * ranked SELECT + ORDER BY; a header like `"res AS"` (or
    * `"res AS MATERIALIZED"` for the DuckDB dialect) instead wraps the
    * ranked select as one more CTE so a caller can keep composing —
    * the s20 insert-update replay consumes the insert edges this
    * way. */
  private[graft] def graphBeamTail(cos: (String, String) => String,
      eTab: String, qCols: String, m: Int = 12, beam: Int = 8,
      hops: Int = 4, k: Int = 3, nq: Int = 5, ne: Int = 4,
      qPred: String = "", entriesIn: String = "",
      finalCteHeader: String = ""): String = {
    val qWhere = if (qPred.nonEmpty) qPred else s"vec_id < $nq"
    val entries =
      if (entriesIn.nonEmpty) entriesIn else (nq until nq + ne).mkString(", ")
    val sb = new StringBuilder
    sb ++= s"""g AS (
           SELECT src, dst FROM (
             SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rk
             FROM sc) WHERE rk <= $m),
         q AS (SELECT $qCols FROM $eTab WHERE $qWhere),
         v0 AS (
           SELECT q.q_id, n.vec_id AS n_id, ${cos("q", "n")} AS cos
           FROM q JOIN $eTab n ON n.vec_id IN ($entries) AND n.vec_id <> q.q_id)"""
    for (h <- 1 to hops) {
      val prev = s"v${h - 1}"
      sb ++= s""",
         f$h AS (
           SELECT q_id, n_id FROM (
             SELECT q_id, n_id,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
             FROM $prev) WHERE rk <= $beam),
         x$h AS (
           SELECT DISTINCT f.q_id, g.dst AS n_id
           FROM f$h f JOIN g ON g.src = f.n_id WHERE g.dst <> f.q_id),
         n$h AS (
           SELECT x.q_id, x.n_id, ${cos("q", "n")} AS cos
           FROM x$h x JOIN q ON q.q_id = x.q_id JOIN $eTab n ON n.vec_id = x.n_id
           WHERE NOT EXISTS (
             SELECT 1 FROM $prev p WHERE p.q_id = x.q_id AND p.n_id = x.n_id)),
         v$h AS (SELECT * FROM $prev UNION ALL SELECT * FROM n$h)"""
    }
    val ranked = s"""SELECT q_id, rk, n_id, cos FROM (
           SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
           FROM v$hops) WHERE rk <= $k"""
    sb ++= (if (finalCteHeader.isEmpty) s"""
         $ranked ORDER BY q_id, rk"""
    else s""",
         $finalCteHeader ($ranked)""")
    sb.toString
  }

  private[graft] def duckCos(a: String, b: String): String =
    s"round(list_cosine_similarity($a.v, $b.v), 6)"
  private[graft] def sparkCos(a: String, b: String): String =
    s"round(graft_dot($a.v, $b.v) / ($a.nrm * $b.nrm), 6)"

  /** NN-descent refinement CTEs shared by the s19 replays (both
    * dialects): expects `cs0(id_a, id_b, cos)` — the canonical
    * undirected scored candidate set (id_a < id_b) — plus the corpus
    * CTE `eTab`; emits per round r the directed top-m graph `gr{r}`,
    * the neighbor-of-neighbor proposals `nn{r}` (dst pairs sharing a
    * graph src), the never-seen filter `fr{r}`, the scored fresh
    * pairs `fs{r}`, and the union `cs{r}`. Mirrors
    * [[graft.operators.Similarity.annGraphLshRefined]] block for
    * block — the t13 unrolling discipline, fixed `rounds`. The caller
    * continues from `cs{rounds}`.
    *
    * `materialized` (DuckDB dialect only — Spark SQL has no such
    * keyword and Catalyst handles the reuse itself): gr/cs are each
    * referenced 2–3 times downstream, and DuckDB 1.0 INLINES
    * multi-referenced CTEs — without AS MATERIALIZED the expansion
    * tree re-runs the bucket self-join per reference and the sf0.01
    * replay goes from 1.2 s to >300 s (measured r10). The caller
    * should mark its `cs0` the same way. */
  private[graft] def nnDescentCtes(cos: (String, String) => String,
      eTab: String, rounds: Int, m: Int = operators.Similarity.GraphM,
      materialized: Boolean = false): String =
    (1 to rounds).map { r =>
      val prev = s"cs${r - 1}"
      val mat = if (materialized) "MATERIALIZED " else ""
      s"""gr$r AS $mat(
           SELECT src, dst FROM (
             SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rk
             FROM (SELECT id_a AS src, id_b AS dst, cos FROM $prev
                   UNION ALL SELECT id_b, id_a, cos FROM $prev))
           WHERE rk <= $m),
         nn$r AS (
           SELECT DISTINCT g1.dst AS id_a, g2.dst AS id_b
           FROM gr$r g1 JOIN gr$r g2
             ON g1.src = g2.src AND g1.dst < g2.dst),
         fr$r AS (
           SELECT n.id_a, n.id_b FROM nn$r n
           WHERE NOT EXISTS (
             SELECT 1 FROM $prev c
             WHERE c.id_a = n.id_a AND c.id_b = n.id_b)),
         fs$r AS (
           SELECT f.id_a, f.id_b, ${cos("ea", "eb")} AS cos
           FROM fr$r f JOIN $eTab ea ON ea.vec_id = f.id_a
           JOIN $eTab eb ON eb.vec_id = f.id_b),
         cs$r AS $mat(SELECT * FROM $prev UNION ALL SELECT * FROM fs$r)"""
    }.mkString(",\n         ")

  private def s16Sql(duck: Boolean): String = {
    val base =
      if (duck) "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
      else
        """e0 AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         e AS (SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM e0)"""
    val cos: (String, String) => String = if (duck) duckCos else sparkCos
    val qCols = if (duck) "vec_id AS q_id, v" else "vec_id AS q_id, v, nrm"
    s"""WITH $base,
         sc AS (
           SELECT a.vec_id AS src, b.vec_id AS dst, ${cos("a", "b")} AS cos
           FROM e a JOIN e b ON a.vec_id <> b.vec_id),
         ${graphBeamTail(cos, "e", qCols)}"""
  }
  private lazy val s16OracleSql: String = s16Sql(duck = true)
  private lazy val s16SparkSql: String = s16Sql(duck = false)

  /** s17: the LSH-built graph — candidate edges from the SAME
    * integer-grid multi-table buckets the s03 family replays
    * ([[lshBucketsCte]], nTables=6 × nPlanes=6), then the identical
    * beam tail as s16. The guard asserts the uncapped-replay
    * precondition exactly like s03's. */
  private lazy val s17OracleSql: String =
    s"""WITH ${lshBucketsCte(nTables = 6, nPlanes = 6)},
         ${capGuardCte("s17",
           "SELECT count(*) AS cnt FROM buckets GROUP BY tb, bucket")},
         cp AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM buckets a JOIN buckets b
             ON a.tb = b.tb AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           CROSS JOIN guard),
         cs AS (
           SELECT id_a, id_b, ${duckCos("ea", "eb")} AS cos
           FROM cp JOIN e ea ON ea.vec_id = cp.id_a
           JOIN e eb ON eb.vec_id = cp.id_b),
         sc AS (
           SELECT id_a AS src, id_b AS dst, cos FROM cs
           UNION ALL SELECT id_b, id_a, cos FROM cs),
         ${graphBeamTail(duckCos, "e", "vec_id AS q_id, v")}"""

  /** s19: the refined-graph replay — s17's bucket candidates as
    * `cs0`, then the unrolled NN-descent rounds ([[nnDescentCtes]],
    * S19Rounds fixed), then the identical beam tail over the refined
    * graph. */
  private lazy val s19OracleSql: String =
    s"""WITH ${lshBucketsCte(nTables = 6, nPlanes = 6)},
         ${capGuardCte("s19",
           "SELECT count(*) AS cnt FROM buckets GROUP BY tb, bucket")},
         cp AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM buckets a JOIN buckets b
             ON a.tb = b.tb AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           CROSS JOIN guard),
         cs0 AS MATERIALIZED (
           SELECT id_a, id_b, ${duckCos("ea", "eb")} AS cos
           FROM cp JOIN e ea ON ea.vec_id = cp.id_a
           JOIN e eb ON eb.vec_id = cp.id_b),
         ${nnDescentCtes(duckCos, "e", operators.Similarity.S19Rounds,
           materialized = true)},
         sc AS (
           SELECT id_a AS src, id_b AS dst, cos
           FROM cs${operators.Similarity.S19Rounds}
           UNION ALL SELECT id_b, id_a, cos
           FROM cs${operators.Similarity.S19Rounds}),
         ${graphBeamTail(duckCos, "e", "vec_id AS q_id, v")}"""

  /** s18: the incremental-insert replay — the s17 bucket CTEs
    * restricted to the ingested corpus (vec_id ≥ splitId), the batch
    * (vec_id < splitId) as the query set, entries = the smallest
    * ingested ids, k = m (the edge selection). Every split/entry/k
    * literal derives from the Similarity.S18* / GraphM constants —
    * the engine's own defaults — so a default change cannot desync
    * the replay (the DefaultBucketCap discipline). */
  /** The s18 candidate chain (buckets → guard → pairs → scores →
    * directed edges over the INGESTED corpus), shared by the s18 and
    * s20 replays — `guardName` is the only per-query difference. The
    * multi-referenced cs/sc are MATERIALIZED (the DuckDB inlining
    * lesson from the s19 replay: s20 reads `sc` twice). */
  private def s18DuckChain(guardName: String): String = {
    val split = operators.Similarity.S18SplitId
    s"""${lshBucketsCte(nTables = 6, nPlanes = 6)},
         ${capGuardCte(guardName,
           s"SELECT count(*) AS cnt FROM buckets WHERE vec_id >= $split GROUP BY tb, bucket")},
         cp AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM buckets a JOIN buckets b
             ON a.tb = b.tb AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           CROSS JOIN guard
           WHERE a.vec_id >= $split AND b.vec_id >= $split),
         cs AS MATERIALIZED (
           SELECT id_a, id_b, ${duckCos("ea", "eb")} AS cos
           FROM cp JOIN e ea ON ea.vec_id = cp.id_a
           JOIN e eb ON eb.vec_id = cp.id_b),
         sc AS MATERIALIZED (
           SELECT id_a AS src, id_b AS dst, cos FROM cs
           UNION ALL SELECT id_b, id_a, cos FROM cs)"""
  }

  private lazy val s18OracleSql: String = {
    val split = operators.Similarity.S18SplitId
    val entries = (split until split + operators.Similarity.S18NEntries)
      .mkString(", ")
    s"""WITH ${s18DuckChain("s18")},
         ${graphBeamTail(duckCos, "e", "vec_id AS q_id, v",
           k = operators.Similarity.GraphM,
           qPred = s"vec_id < $split", entriesIn = entries)}"""
  }

  /** s20: the reciprocal-update replay — the s18 chain, the insert
    * edges wrapped as a CTE (`res`), then each affected old node's
    * re-ranked top-m over (its degree-capped old edges ∪ incoming
    * new edges). Mirrors
    * [[graft.operators.Similarity.annGraphInsertRecip]]. */
  private lazy val s20OracleSql: String = {
    val split = operators.Similarity.S18SplitId
    val entries = (split until split + operators.Similarity.S18NEntries)
      .mkString(", ")
    val m = operators.Similarity.GraphM
    s"""WITH ${s18DuckChain("s20")},
         ${graphBeamTail(duckCos, "e", "vec_id AS q_id, v",
           k = m, qPred = s"vec_id < $split", entriesIn = entries,
           finalCteHeader = "res AS MATERIALIZED")},
         inc AS MATERIALIZED (
           SELECT n_id AS src, q_id AS dst, cos FROM res),
         oldg AS (
           SELECT src, dst, cos FROM (
             SELECT src, dst, cos,
               row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rk
             FROM sc) WHERE rk <= $m),
         uni AS (
           SELECT * FROM oldg UNION ALL SELECT * FROM inc),
         aff AS (SELECT DISTINCT src FROM inc)
         SELECT n_id, rk, dst, cos FROM (
           SELECT u.src AS n_id, u.dst AS dst, u.cos AS cos,
             row_number() OVER (PARTITION BY u.src ORDER BY u.cos DESC, u.dst ASC) AS rk
           FROM uni u JOIN aff a ON a.src = u.src) WHERE rk <= $m
         ORDER BY n_id, rk"""
  }

  private lazy val s03OracleSql: String =
    s"""WITH ${lshBucketsCte(nTables = 1, nPlanes = 6)},
         ${capGuardCte("s03",
           "SELECT count(*) AS cnt FROM buckets GROUP BY tb, bucket")}
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(ea.v, eb.v), 6) AS cos
         FROM buckets a JOIN buckets b
           ON a.tb = b.tb AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         JOIN e ea ON ea.vec_id = a.vec_id
         JOIN e eb ON eb.vec_id = b.vec_id
         CROSS JOIN guard
         WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.3
         ORDER BY id_a, id_b"""

  /** s03c: the anchor-star CAPPED pair set as a pure function the
    * oracle replays — buckets from the integer-grid planes (nPlanes=4),
    * anchors from the PINNED fixture (Pinned.s03cAnchors: the engine's
    * xxhash64-sampled anchor ids at sf0.01 plus every bucket min,
    * proven == runtime selection by PinnedModelsSpec), pairs = anchor ×
    * bucket, dedup'd on (id_a, id_b). The guard is the INVERSE of
    * [[capGuardCte]]: it errors if NO bucket exceeds the cap (8), i.e.
    * if the capped regime this query exists to verify is not engaged. */
  private lazy val s03cOracleSql: String = {
    val anchors = Pinned.s03cAnchors.mkString(", ")
    s"""WITH ${lshBucketsCte(nTables = 1, nPlanes = 4)},
         guard AS (
           SELECT CASE WHEN max(cnt) <= 8 THEN error(
             's03c precondition violated: every bucket is at or below the cap (8) - the anchor-star capped regime is not engaged and this query no longer verifies it')
             ELSE 1 END AS ok
           FROM (SELECT count(*) AS cnt FROM buckets GROUP BY tb, bucket)),
         pairs AS (
           SELECT DISTINCT least(a.vec_id, b.vec_id) AS id_a,
             greatest(a.vec_id, b.vec_id) AS id_b,
             round(list_cosine_similarity(ea.v, eb.v), 6) AS cos
           FROM buckets a JOIN buckets b
             ON a.tb = b.tb AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
           JOIN e ea ON ea.vec_id = a.vec_id
           JOIN e eb ON eb.vec_id = b.vec_id
           CROSS JOIN guard
           WHERE a.vec_id IN ($anchors))
         SELECT id_a, id_b, cos FROM pairs
         WHERE cos >= 0.3 ORDER BY id_a, id_b"""
  }

  /** Dialect-portable margin tail shared by the s22/s23 oracles AND
    * their Spark-dialect forms (row_number / CAST / floor only): from
    * a `pairs(src_id, tgt_id, c)` CTE with `c` the micro-scaled 6-dp
    * cosine, per-node top-k integer sums → the Artetxe–Schwenk ratio
    * margin r4-floored before ranking → best target per source. */
  private[graft] def bitextTailSql(k: Int): String =
    s"""nnx AS (
           SELECT src_id, CAST(sum(c) AS BIGINT) AS sx,
             CAST(count(*) AS BIGINT) AS nx
           FROM (SELECT src_id, c, row_number() OVER (PARTITION BY src_id
               ORDER BY c DESC, tgt_id ASC) AS r FROM pairs) rx
           WHERE r <= $k GROUP BY src_id),
         nny AS (
           SELECT tgt_id, CAST(sum(c) AS BIGINT) AS sy,
             CAST(count(*) AS BIGINT) AS ny
           FROM (SELECT tgt_id, c, row_number() OVER (PARTITION BY tgt_id
               ORDER BY c DESC, src_id ASC) AS r FROM pairs) ry
           WHERE r <= $k GROUP BY tgt_id),
         m AS (
           SELECT p.src_id, p.tgt_id, p.c,
             floor((CAST(2 * p.c AS DOUBLE) / (CAST(sx AS DOUBLE) / nx
               + CAST(sy AS DOUBLE) / ny))*1e4 + 0.5)/1e4 AS margin
           FROM pairs p JOIN nnx ON nnx.src_id = p.src_id
             JOIN nny ON nny.tgt_id = p.tgt_id)
         SELECT src_id, tgt_id, CAST(c AS DOUBLE) / 1e6 AS cos, margin FROM (
           SELECT src_id, tgt_id, c, margin,
             row_number() OVER (PARTITION BY src_id
               ORDER BY margin DESC, tgt_id ASC) AS rk
           FROM m) f
         WHERE rk = 1 ORDER BY src_id"""

  /** t22's IN-list, generated from the engine's own term list. */
  private lazy val t22TermsSql: String =
    TextOps.blocklist.map(t => s"'$t'").mkString(", ")

  /** x15: the pinned weight vector as a DuckDB list literal, indexed
    * by the md5-hex-prefix bucket. */
  private lazy val x15OracleSql: String = {
    val ws = graft.operators.Curation.qualityModelMicro.mkString("[", ", ", "]")
    s"""WITH fb AS (
           SELECT doc_id,
             CAST(('0x' || substring(md5(w), 1, 2)) AS BIGINT) AS f
           FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
                 FROM documents)
         ), pd AS (
           SELECT doc_id, f, CAST(count(*) AS BIGINT) AS c
           FROM fb GROUP BY doc_id, f
         ), sc AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(sum(c * ($ws[CAST(f + 1 AS INT)])) AS BIGINT)
               AS score_micro
           FROM pd GROUP BY doc_id)
         SELECT doc_id, n_tokens, score_micro,
           floor((score_micro / 1e6 / n_tokens)*1e4 + 0.5)/1e4 AS score,
           (score_micro > 0) AS keep
         FROM sc ORDER BY doc_id"""
  }

  /** Dialect-portable MMR selection tail shared by the s24 oracle and
    * its Spark-dialect form: from `cand(q_id, n_id, c)` and pair sims
    * `pc(q_id, a, b, pcos)`, k−1 unrolled greedy rounds (the t13/s16
    * fixed-iteration discipline). The λ and 1−λ literals are the
    * ENGINE'S doubles interpolated verbatim (1−0.7 prints as
    * 0.30000000000000004 — both engines then multiply the identical
    * binary value). */
  private[graft] def mmrTailSql(k: Int, lambda: Double): String = {
    val lam = s"CAST($lambda AS DOUBLE)"
    val om = s"CAST(${1.0 - lambda} AS DOUBLE)"
    val steps = (2 to k).map { t =>
      s"""rem$t AS (
           SELECT cd.q_id, cd.n_id, cd.c FROM cand cd
           LEFT JOIN selu${t - 1} s
             ON s.q_id = cd.q_id AND s.n_id = cd.n_id
           WHERE s.n_id IS NULL),
         div$t AS (
           SELECT r.q_id, r.n_id, r.c, max(p.pcos) AS d
           FROM rem$t r JOIN selu${t - 1} s ON s.q_id = r.q_id
           JOIN pc p ON p.q_id = r.q_id AND p.a = r.n_id AND p.b = s.n_id
           GROUP BY r.q_id, r.n_id, r.c),
         pick$t AS (
           SELECT q_id, n_id, mmr, $t AS step FROM (
             SELECT q_id, n_id,
               floor(($lam*c - $om*d)*1e4 + 0.5)/1e4 AS mmr,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY floor(($lam*c - $om*d)*1e4 + 0.5)/1e4 DESC,
                   n_id ASC) AS rk
             FROM div$t) z WHERE rk = 1),
         selu$t AS (SELECT * FROM selu${t - 1}
           UNION ALL SELECT * FROM pick$t)"""
    }.mkString(",\n         ")
    s"""r0 AS (
           SELECT q_id, n_id, c, row_number() OVER (PARTITION BY q_id
             ORDER BY c DESC, n_id ASC) AS rk FROM cand),
         selu1 AS (
           SELECT q_id, n_id, floor(($lam*c)*1e4 + 0.5)/1e4 AS mmr,
             1 AS step
           FROM r0 WHERE rk = 1),
         $steps
         SELECT q_id, CAST(step AS BIGINT) AS rk, n_id, mmr
         FROM selu$k ORDER BY q_id, rk"""
  }

  /** s24: MMR re-ranking over the s01-shape top-10 candidates. */
  private lazy val s24OracleSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         sc AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             round(list_cosine_similarity(q.v, a.v), 6) AS c
           FROM e q JOIN e a ON a.vec_id <> q.vec_id
           WHERE q.vec_id < 5),
         cand AS (
           SELECT q_id, n_id, c FROM (
             SELECT q_id, n_id, c, row_number() OVER (PARTITION BY q_id
               ORDER BY c DESC, n_id ASC) AS crk FROM sc) z
           WHERE crk <= ${Similarity.MmrCand}),
         pc AS (
           SELECT x.q_id, x.n_id AS a, y.n_id AS b,
             round(list_cosine_similarity(ex.v, ey.v), 6) AS pcos
           FROM cand x JOIN cand y
             ON y.q_id = x.q_id AND y.n_id <> x.n_id
           JOIN e ex ON ex.vec_id = x.n_id
           JOIN e ey ON ey.vec_id = y.n_id),
         ${mmrTailSql(k = Similarity.MmrK, lambda = Similarity.MmrLambda)}"""

  /** s22: exact all-pairs bitext margins — cross-side cosines lifted
    * to integer micros, the shared [[bitextTailSql]] margin tail. */
  private lazy val s22OracleSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         lab AS (SELECT vec_id, label % 2 AS par FROM embeddings),
         pairs AS (
           SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
             CAST(floor(round(list_cosine_similarity(es.v, et.v), 6)*1e6 + 0.5)
               AS BIGINT) AS c
           FROM lab s, lab t, e es, e et
           WHERE s.par = 0 AND t.par = 1
             AND es.vec_id = s.vec_id AND et.vec_id = t.vec_id),
         ${bitextTailSql(k = Similarity.BitextK)}"""

  /** s23: the LSH twin — candidates from the d09-regime bucket replay
    * (12 tables × 8 integer-grid planes, no threshold), cross-side
    * re-orientation by label parity, same margin tail. */
  private lazy val s23OracleSql: String =
    s"""WITH ${lshBucketsCte(nTables = 12, nPlanes = 8)},
         ${capGuardCte("s23",
           "SELECT count(*) AS cnt FROM buckets GROUP BY tb, bucket")},
         cand AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(floor(round(list_cosine_similarity(ea.v, eb.v), 6)*1e6 + 0.5)
               AS BIGINT) AS c
           FROM buckets a JOIN buckets b
             ON a.tb = b.tb AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           JOIN e ea ON ea.vec_id = a.vec_id
           JOIN e eb ON eb.vec_id = b.vec_id
           CROSS JOIN guard),
         lab AS (SELECT vec_id, label % 2 AS par FROM embeddings),
         pairs AS (
           SELECT CASE WHEN la.par = 0 THEN id_a ELSE id_b END AS src_id,
                  CASE WHEN la.par = 0 THEN id_b ELSE id_a END AS tgt_id, c
           FROM cand JOIN lab la ON la.vec_id = cand.id_a
             JOIN lab lb ON lb.vec_id = cand.id_b
           WHERE la.par <> lb.par),
         ${bitextTailSql(k = Similarity.BitextK)}"""

  private lazy val s04OracleSql: String =
    s"""WITH ${lshBucketsCte(nTables = 1, nPlanes = 4)},
         scored AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             round(list_cosine_similarity(qe.v, ae.v), 6) AS cos
           FROM buckets q
           JOIN buckets a
             ON a.tb = q.tb AND a.bucket = q.bucket AND a.vec_id <> q.vec_id
           JOIN e qe ON qe.vec_id = q.vec_id
           JOIN e ae ON ae.vec_id = a.vec_id
           WHERE q.vec_id < 5)
         SELECT q_id, rk, n_id, cos FROM (
           SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY q_id, rk"""

  /** s33 replay — [[s04OracleSql]] with the label equality folded
    * into the candidate join (the pre-filter rides the index key). */
  private lazy val s33OracleSql: String =
    s"""WITH ${lshBucketsCte(nTables = 1, nPlanes = 4)},
         lab AS (SELECT vec_id, label FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, ql.label, a.vec_id AS n_id,
             round(list_cosine_similarity(qe.v, ae.v), 6) AS cos
           FROM buckets q
           JOIN lab ql ON ql.vec_id = q.vec_id
           JOIN buckets a
             ON a.tb = q.tb AND a.bucket = q.bucket AND a.vec_id <> q.vec_id
           JOIN lab al ON al.vec_id = a.vec_id AND al.label = ql.label
           JOIN e qe ON qe.vec_id = q.vec_id
           JOIN e ae ON ae.vec_id = a.vec_id
           WHERE q.vec_id < 5)
         SELECT q_id, label, rk, n_id, cos FROM (
           SELECT q_id, label, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY q_id, rk"""

  /** s34 replay — the s05 pinned-cell assignment on BOTH splits (s32's
    * floor(max·frac) cut replayed as a scalar CTE), batch probes only
    * its own cell's stored rows, cosine is the s05 normalized-sum
    * discipline at 6 dp, verdict = LEFT join of batch ids onto the
    * rk=1 blocking match (admitted rows coalesce to -1/-1.0/0). */
  private lazy val s34OracleSql: String = {
    val dts = centroidDotsList(Pinned.ivfCentroids)
    val frac = graft.operators.Similarity.S34SplitFrac
    val thr = graft.operators.Similarity.S34Threshold
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         n0 AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt($unrolledNorm)) AS sv FROM e),
         cutv AS (SELECT CAST(floor(max(vec_id) * $frac) AS BIGINT) AS c
                  FROM embeddings),
         asg AS (SELECT vec_id, sv,
                 CAST(list_position(dts, list_max(dts)) - 1 AS INT) AS cell
               FROM (SELECT vec_id, sv, $dts AS dts FROM n0)),
         b AS (SELECT a.* FROM asg a, cutv WHERE a.vec_id >= cutv.c),
         st AS (SELECT a.* FROM asg a, cutv WHERE a.vec_id < cutv.c),
         matched AS (
           SELECT * FROM (
             SELECT b.vec_id AS vec_id, st.vec_id AS store_id,
               round(${(1 to 64).map(d => s"b.sv[$d]*st.sv[$d]").mkString(" + ")}, 6) AS cos
             FROM b JOIN st ON b.cell = st.cell)
           WHERE cos >= $thr),
         best AS (
           SELECT vec_id, store_id, cos, n_near FROM (
             SELECT vec_id, store_id, cos,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, store_id ASC) AS rk,
               CAST(count(*) OVER (PARTITION BY vec_id) AS BIGINT) AS n_near
             FROM matched) WHERE rk = 1)
       SELECT b.vec_id,
         best.vec_id IS NULL AS admit,
         coalesce(best.store_id, -1) AS best_match,
         coalesce(best.cos, -1.0) AS cos,
         coalesce(best.n_near, 0) AS n_near
       FROM b LEFT JOIN best ON b.vec_id = best.vec_id
       ORDER BY b.vec_id"""
  }

  /** s28 replay — [[s04OracleSql]] with the serve-time tombstone
    * predicate on the CANDIDATE side of the bucket join (queries stay
    * external); modulus/residue interpolate from
    * [[graft.operators.Similarity.S28TombMod]]. */
  private lazy val s28OracleSql: String = {
    val m = graft.operators.Similarity.S28TombMod
    val r = graft.operators.Similarity.S28TombResidue
    s"""WITH ${lshBucketsCte(nTables = 1, nPlanes = 4)},
         scored AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             round(list_cosine_similarity(qe.v, ae.v), 6) AS cos
           FROM buckets q
           JOIN buckets a
             ON a.tb = q.tb AND a.bucket = q.bucket AND a.vec_id <> q.vec_id
             AND a.vec_id % $m <> $r
           JOIN e qe ON qe.vec_id = q.vec_id
           JOIN e ae ON ae.vec_id = a.vec_id
           WHERE q.vec_id < 5)
         SELECT q_id, rk, n_id, cos FROM (
           SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY q_id, rk"""
  }

  /** The d04 HUGEINT simhash replay CTEs (FNV-1a token hashes,
    * SplitMix64-mixed 3-gram shingles, per-bit majority → lo/hi sig
    * halves) — shared by the d04 all-pairs oracle and the d17
    * cross-split admission oracle. */
  private lazy val d04SigCtes: String =
    """WITH
         toks AS (
           SELECT doc_id, list_transform(regexp_split_to_array(trim(text), '\s+'),
             tk -> list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(string_split(tk, ''), c -> ord(c)::HUGEINT)),
               (h, c) -> (xor(h, c) * 1099511628211::HUGEINT)
                         % 18446744073709551616::HUGEINT)) AS th
           FROM documents
         ),
         sh_pos AS (
           SELECT doc_id, th, unnest(range(1, len(th) - 1)) AS i
           FROM toks WHERE len(th) >= 3
         ),
         sh AS (
           SELECT DISTINCT doc_id, a3 AS shingle FROM (
             SELECT doc_id,
               xor(11400714819323198485::HUGEINT, th[CAST(i AS INT)]) AS x1,
               (x1 + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS p1,
               xor(p1, p1 // 1073741824) AS t1,
               ((t1 % 4294967296) * 13787848793156543929::HUGEINT + (((t1 // 4294967296) * 13787848793156543929::HUGEINT) % 4294967296) * 4294967296) % 18446744073709551616::HUGEINT AS q1,
               xor(q1, q1 // 134217728) AS u1,
               ((u1 % 4294967296) * 10723151780598845931::HUGEINT + (((u1 // 4294967296) * 10723151780598845931::HUGEINT) % 4294967296) * 4294967296) % 18446744073709551616::HUGEINT AS r1,
               xor(r1, r1 // 2147483648) AS a1,
               xor(a1, th[CAST(i + 1 AS INT)]) AS x2,
               (x2 + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS p2,
               xor(p2, p2 // 1073741824) AS t2,
               ((t2 % 4294967296) * 13787848793156543929::HUGEINT + (((t2 // 4294967296) * 13787848793156543929::HUGEINT) % 4294967296) * 4294967296) % 18446744073709551616::HUGEINT AS q2,
               xor(q2, q2 // 134217728) AS u2,
               ((u2 % 4294967296) * 10723151780598845931::HUGEINT + (((u2 // 4294967296) * 10723151780598845931::HUGEINT) % 4294967296) * 4294967296) % 18446744073709551616::HUGEINT AS r2,
               xor(r2, r2 // 2147483648) AS a2,
               xor(a2, th[CAST(i + 2 AS INT)]) AS x3,
               (x3 + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS p3,
               xor(p3, p3 // 1073741824) AS t3,
               ((t3 % 4294967296) * 13787848793156543929::HUGEINT + (((t3 // 4294967296) * 13787848793156543929::HUGEINT) % 4294967296) * 4294967296) % 18446744073709551616::HUGEINT AS q3,
               xor(q3, q3 // 134217728) AS u3,
               ((u3 % 4294967296) * 10723151780598845931::HUGEINT + (((u3 // 4294967296) * 10723151780598845931::HUGEINT) % 4294967296) * 4294967296) % 18446744073709551616::HUGEINT AS r3,
               xor(r3, r3 // 2147483648) AS a3
             FROM sh_pos)
         ),
         bits AS (
           SELECT doc_id, b.i,
             sum(CASE WHEN (shingle // (1::HUGEINT << CAST(b.i AS INT))) % 2 = 1
                      THEN 1 ELSE -1 END) AS cnt
           FROM sh CROSS JOIN (SELECT unnest(range(0, 64)) AS i) b
           GROUP BY doc_id, b.i
         ),
         sig AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN cnt >= 0 AND i < 32 THEN 1::BIGINT << CAST(i AS INT)
                           ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN cnt >= 0 AND i >= 32 THEN 1::BIGINT << CAST(i - 32 AS INT)
                           ELSE 0 END) AS BIGINT) AS hi
           FROM bits GROUP BY doc_id
         )"""

  private lazy val d04OracleSql: String =
    s"""$d04SigCtes
         SELECT doc_a, doc_b, hamming FROM (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT)
               AS hamming
           FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
         WHERE hamming <= 3
         ORDER BY doc_a, doc_b"""

  /** d17 replay — [[d04SigCtes]] with the d12 cross-split tail: exact
    * hamming over batch×store (the pigeonhole buckets carry it at
    * recall 1.0 for hamming ≤ 3, so the brute force is equal), best
    * match per batch doc. Split constant single-sourced from
    * [[graft.operators.Dedup.D12SplitAt]]. */
  private lazy val d17OracleSql: String = {
    val split = graft.operators.Dedup.D12SplitAt
    s"""$d04SigCtes, m AS (
           SELECT b.doc_id AS doc_id, a.doc_id AS store_id,
             CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
               AS INT) AS hamming
           FROM sig a JOIN sig b
             ON a.doc_id < $split AND b.doc_id >= $split
           WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3)
         SELECT doc_id, best_match, hamming, n_matches FROM (
           SELECT doc_id, store_id AS best_match, hamming,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY hamming ASC, store_id ASC) AS rk,
             CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_matches
           FROM m)
         WHERE rk = 1 ORDER BY doc_id"""
  }

  /** s29 replay — the s04 bucket assignment ([[lshBucketsCte]],
    * nTables=1) reduced to cell occupancies; all-integer metrics plus
    * one milli-floored float (the imbalance factor, identical op
    * order); the log₂ bin is `length(bin(c)) − 1` on both engines
    * (exact integer — floor(log2) would misbin at powers of two). */
  private lazy val s29OracleSql: String =
    s"""WITH ${lshBucketsCte(nTables = 1, nPlanes = 4)},
         cells AS (
           SELECT bucket, CAST(count(*) AS BIGINT) AS c
           FROM buckets GROUP BY bucket
         ), summ AS (
           SELECT CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum(c) AS BIGINT) AS n_vectors,
             CAST(max(c) AS BIGINT) AS max_cell,
             CAST(min(c) AS BIGINT) AS min_cell,
             CAST(sum(c * c) AS BIGINT) AS ss
           FROM cells
         ), hist AS (
           SELECT 'cells_log2_' || lpad(CAST(length(bin(c)) - 1 AS VARCHAR),
               2, '0') AS metric,
             CAST(count(*) AS BIGINT) AS value
           FROM cells GROUP BY 1
         ), mets AS (
           SELECT 'n_cells' AS metric, n_cells AS value FROM summ
           UNION ALL SELECT 'n_vectors', n_vectors FROM summ
           UNION ALL SELECT 'max_cell', max_cell FROM summ
           UNION ALL SELECT 'min_cell', min_cell FROM summ
           UNION ALL SELECT 'imbalance_milli',
             CAST(floor(CAST(n_cells AS DOUBLE) * CAST(ss AS DOUBLE)
               / (CAST(n_vectors AS DOUBLE) * CAST(n_vectors AS DOUBLE))
               * 1000.0 + 0.5) AS BIGINT)
           FROM summ)
         SELECT metric, value FROM
           (SELECT * FROM mets UNION ALL SELECT * FROM hist)
         ORDER BY metric"""

  /** v06 replay — the three dedup lenses composed from their own
    * oracle machinery: d01's fingerprint rule, d05's recursive-CTE CC
    * + d08's keep-best window (string shingles, the documented hash
    * equivalence), and t26's window-fingerprint coverage
    * ([[t26MarkedCtes]], spliced to `WITH RECURSIVE` for the CC arm;
    * its MATERIALIZED BMP guard is re-referenced in the final WHERE).
    * Every stage is a scalar aggregate, so empty stages still emit
    * their 0 row (the q35 lesson). */
  private lazy val v06OracleSql: String = {
    val prefix = t26MarkedCtes.replaceFirst("WITH ", "WITH RECURSIVE ")
    s"""$prefix, vbase AS (
           SELECT doc_id, n_chars,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
           FROM documents
         ), exact AS (
           SELECT 'exact_dedup' AS stage,
             CAST(coalesce(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS docs_affected,
             CAST(coalesce(sum(CASE WHEN rk > 1 THEN n_tokens ELSE 0 END), 0)
               AS BIGINT) AS tokens_removed
           FROM (SELECT n_tokens, row_number() OVER (PARTITION BY fp
                   ORDER BY doc_id) AS rk FROM vbase)
         ), vtoks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
           FROM documents
         ), vsh AS (
           SELECT doc_id, list_distinct([array_to_string(tk[i:i+2], ' ')
             for i in range(1, len(tk)-1)]) AS shingles
           FROM vtoks WHERE len(tk) >= 3
         ), vpairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM vsh a
           JOIN vsh b ON a.doc_id < b.doc_id
           WHERE round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
             (len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles))), 4) >= 0.7
         ), vedges AS (
           SELECT doc_a AS a, doc_b AS b FROM vpairs
           UNION ALL SELECT doc_b, doc_a FROM vpairs
         ), vnodes AS (SELECT DISTINCT a AS n FROM vedges),
         reach(n, m) AS (
           SELECT n, n FROM vnodes
           UNION
           SELECT r.n, e.b FROM reach r JOIN vedges e ON r.m = e.a
         ), vclusters AS (
           SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n
         ), vkeep AS (
           SELECT cluster, doc_id AS kept FROM (
             SELECT c.cluster, d.doc_id,
               row_number() OVER (PARTITION BY c.cluster
                 ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
             FROM vclusters c JOIN documents d ON c.doc_id = d.doc_id)
           WHERE rk = 1
         ), near AS (
           SELECT 'near_dedup' AS stage,
             CAST(coalesce(sum(CASE WHEN c.doc_id <> k.kept
               THEN 1 ELSE 0 END), 0) AS BIGINT) AS docs_affected,
             CAST(coalesce(sum(CASE WHEN c.doc_id <> k.kept
               THEN b.n_tokens ELSE 0 END), 0) AS BIGINT) AS tokens_removed
           FROM vclusters c JOIN vkeep k USING (cluster)
           JOIN vbase b ON b.doc_id = c.doc_id
         ), visl AS (
           SELECT doc_id,
             greatest(0, e - greatest(i - 1,
               coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)))
               AS contrib
           FROM marked
         ), vcov AS (
           SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS covered
           FROM visl GROUP BY doc_id
         ), vspan AS (
           SELECT 'span_dedup' AS stage,
             CAST(coalesce(sum(CASE WHEN covered > 0 THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS docs_affected,
             CAST(coalesce(sum(covered), 0) AS BIGINT) AS tokens_removed
           FROM vcov)
         SELECT stage, docs_affected, tokens_removed FROM (
           SELECT * FROM exact UNION ALL
           SELECT * FROM near UNION ALL
           SELECT * FROM vspan)
         WHERE (SELECT ok FROM guard) = 1
         ORDER BY stage"""
  }

  /** s27 replay — one s01-shaped brute-force CTE per truncation (the
    * DuckDB list slice `v[1:d]` mirrors the engine's `slice(v,1,d)`),
    * LEFT-joined to the full-dimension truth set; dims interpolate
    * from [[graft.operators.Similarity.S27Dims]]. */
  private lazy val s27OracleSql: String = {
    val dims = graft.operators.Similarity.S27Dims
    def topCte(name: String, vq: String, va: String): String =
      s"""$name AS (
           SELECT q_id, n_id FROM (
             SELECT q.vec_id AS q_id, a.vec_id AS n_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity($vq, $va), 6) DESC,
                          a.vec_id ASC) AS rk
             FROM e q JOIN e a ON a.vec_id <> q.vec_id
             WHERE q.vec_id < 5)
           WHERE rk <= 3)"""
    val ctes = (topCte("fullr", "q.v", "a.v") +: dims.map(d =>
      topCte(s"t$d", s"q.v[1:$d]", s"a.v[1:$d]"))).mkString(",\n         ")
    val arms = dims.map { d =>
      s"""SELECT $d AS trunc_dim, f.q_id,
           CAST(count(t.n_id) AS BIGINT) AS hits,
           floor(CAST(count(t.n_id) AS DOUBLE) / 3 * 1e4 + 0.5)/1e4 AS recall
         FROM fullr f LEFT JOIN t$d t ON t.q_id = f.q_id AND t.n_id = f.n_id
         GROUP BY f.q_id"""
    }.mkString("\n         UNION ALL\n         ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
         $ctes
         SELECT * FROM (
         $arms)
         ORDER BY trunc_dim, q_id"""
  }

  /** t10 DuckDB replay — extracted to a val so [[t20OracleSql]] can
    * compose it as the keyword side of the RRF fusion. */
  private lazy val t10OracleSql: String =
    """WITH tf AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS dl,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x = 'customer')) AS BIGINT) AS tf0,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x = 'window')) AS BIGINT) AS tf1,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x = 'query')) AS BIGINT) AS tf2
           FROM documents
         ), stats AS (
           SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS sum_dl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
           FROM tf
         ), scored AS (
           SELECT doc_id,
             floor((
               ln((CAST(n_docs AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
                  / (CAST(df0 AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf0 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
                 / (CAST(tf0 AS DOUBLE) + 1.2 * (1.0 - 0.75
                    + 0.75 * (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             + ln((CAST(n_docs AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
                  / (CAST(df1 AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf1 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
                 / (CAST(tf1 AS DOUBLE) + 1.2 * (1.0 - 0.75
                    + 0.75 * (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             + ln((CAST(n_docs AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
                  / (CAST(df2 AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf2 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
                 / (CAST(tf2 AS DOUBLE) + 1.2 * (1.0 - 0.75
                    + 0.75 * (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             )*1e4 + 0.5)/1e4 AS score
           FROM tf, stats)
         SELECT rk, doc_id, score FROM (
           SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rk
           FROM scored WHERE score > 0)
         WHERE rk <= 10 ORDER BY rk"""

  /** t10 Spark-dialect replay — extracted for the same composition on
    * the spark.sql side (t20 entry in [[sparkSql]]). */
  private lazy val t10SparkSql: String =
    """WITH tf AS (
           SELECT doc_id,
             CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS dl,
             CAST(size(filter(split(trim(text), '\\s+'),
               x -> x = 'customer')) AS BIGINT) AS tf0,
             CAST(size(filter(split(trim(text), '\\s+'),
               x -> x = 'window')) AS BIGINT) AS tf1,
             CAST(size(filter(split(trim(text), '\\s+'),
               x -> x = 'query')) AS BIGINT) AS tf2
           FROM documents
         ), stats AS (
           SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS sum_dl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
           FROM tf
         ), scored AS (
           SELECT doc_id,
             floor((
               log((CAST(n_docs AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
                  / (CAST(df0 AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf0 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
                 / (CAST(tf0 AS DOUBLE) + 1.2 * (1.0 - 0.75
                    + 0.75 * (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             + log((CAST(n_docs AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
                  / (CAST(df1 AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf1 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
                 / (CAST(tf1 AS DOUBLE) + 1.2 * (1.0 - 0.75
                    + 0.75 * (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             + log((CAST(n_docs AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
                  / (CAST(df2 AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf2 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
                 / (CAST(tf2 AS DOUBLE) + 1.2 * (1.0 - 0.75
                    + 0.75 * (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             )*1e4 + 0.5)/1e4 AS score
           FROM tf CROSS JOIN stats)
         SELECT rk, doc_id, score FROM (
           SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rk
           FROM scored WHERE score > 0)
         WHERE rk <= 10 ORDER BY rk"""

  /** t20 DuckDB replay: the keyword side is [[t10OracleSql]] verbatim
    * as a derived table; the vector side re-derives the s01-style
    * cosine ranking against the pinned query vector (vec_id 0); RRF
    * (c = 60) fuses the two top-10 lists through a full outer join.
    * Mirrors [[graft.operators.Similarity.rrfFusion]] constant-for-
    * constant. */
  private lazy val t20OracleSql: String =
    s"""WITH kw AS (
           SELECT doc_id, CAST(rk AS BIGINT) AS rk_kw FROM ($t10OracleSql)
         ), vq AS (
           SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
           WHERE vec_id = 0
         ), vscored AS (
           SELECT e.vec_id AS doc_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
               AS cos
           FROM embeddings e, vq q WHERE e.vec_id <> 0
         ), vrank AS (
           SELECT doc_id, rk_vec FROM (
             SELECT doc_id,
               CAST(row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS BIGINT)
                 AS rk_vec
             FROM vscored)
           WHERE rk_vec <= 10
         ), fused AS (
           SELECT coalesce(kw.doc_id, vrank.doc_id) AS doc_id,
             floor((coalesce(1.0/(60.0 + CAST(rk_kw AS DOUBLE)), 0.0)
                  + coalesce(1.0/(60.0 + CAST(rk_vec AS DOUBLE)), 0.0))*1e6
                  + 0.5)/1e6 AS rrf
           FROM kw FULL OUTER JOIN vrank ON kw.doc_id = vrank.doc_id)
         SELECT rk, doc_id, rrf FROM (
           SELECT doc_id, rrf,
             CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT)
               AS rk
           FROM fused)
         WHERE rk <= 10 ORDER BY rk"""

  /** t20 Spark-dialect replay — same composition over [[t10SparkSql]]
    * and the graft_dot cosine (identical op order to the engine's
    * `dot(qv, v) / (q_nrm · nrm)`). */
  private lazy val t20SparkSql: String =
    s"""WITH kw AS (
           SELECT doc_id, CAST(rk AS BIGINT) AS rk_kw FROM ($t10SparkSql)
         ), ve AS (
           SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings
         ), vn AS (
           SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM ve
         ), vq AS (
           SELECT v AS qv, nrm AS q_nrm FROM vn WHERE vec_id = 0
         ), vscored AS (
           SELECT a.vec_id AS doc_id,
             round(graft_dot(q.qv, a.v) / (q.q_nrm * a.nrm), 6) AS cos
           FROM vn a CROSS JOIN vq q WHERE a.vec_id <> 0
         ), vrank AS (
           SELECT doc_id, rk_vec FROM (
             SELECT doc_id,
               CAST(row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS BIGINT)
                 AS rk_vec
             FROM vscored)
           WHERE rk_vec <= 10
         ), fused AS (
           SELECT coalesce(kw.doc_id, vrank.doc_id) AS doc_id,
             floor((coalesce(1.0/(60.0 + CAST(rk_kw AS DOUBLE)), 0.0)
                  + coalesce(1.0/(60.0 + CAST(rk_vec AS DOUBLE)), 0.0))*1e6
                  + 0.5)/1e6 AS rrf
           FROM kw FULL OUTER JOIN vrank ON kw.doc_id = vrank.doc_id)
         SELECT rk, doc_id, rrf FROM (
           SELECT doc_id, rrf,
             CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT)
               AS rk
           FROM fused)
         WHERE rk <= 10 ORDER BY rk"""

  /** s01 Spark-dialect replay — `private[graft]` so
    * [[SparkDialectTail]] can compose it as the ground-truth side of
    * the s21 recall evaluation (its s04 twin lives over there). */
  private[graft] lazy val s01SparkSql: String =
    """WITH e AS (
           SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings
         ), n AS (
           SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM e
         ), scored AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             round(graft_dot(q.v, a.v) / (q.nrm * a.nrm), 6) AS cos
           FROM n q JOIN n a ON a.vec_id <> q.vec_id
           WHERE q.vec_id < 5)
         SELECT q_id, rk, n_id, cos FROM (
           SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY q_id, rk"""

  /** One splitmix64 round in DuckDB HUGEINT mod-2⁶⁴ SQL (the d04
    * form: add, xor-shift via `//`, split-form 128-bit-safe multiply),
    * aliased x/p/t/q/u/r/a with suffix `j`; `prev` is the accumulator
    * expression entering the round. */
  private def splitmixRoundSql(j: Int, prev: String, operand: String): String =
    splitmixChainSql(j.toString, prev, operand)

  /** The generalized form (string alias suffix) — the d16 minhash
    * replay runs 64 of these chains in PARALLEL inside one layer, so
    * suffixes like `p7` / `b3r1` must coexist in one SELECT. */
  private def splitmixChainSql(j: String, prev: String, operand: String): String = {
    def mulSplit(x: String, c: String) =
      s"(($x % 4294967296) * $c + ((($x // 4294967296) * $c) % 4294967296) * 4294967296) % 18446744073709551616::HUGEINT"
    s"""xor($prev, $operand) AS x$j,
             (x$j + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS p$j,
             xor(p$j, p$j // 1073741824) AS t$j,
             ${mulSplit(s"t$j", "13787848793156543929::HUGEINT")} AS q$j,
             xor(q$j, q$j // 134217728) AS u$j,
             ${mulSplit(s"u$j", "10723151780598845931::HUGEINT")} AS r$j,
             xor(r$j, r$j // 2147483648) AS a$j"""
  }

  /** t27's unrolled per-word Viterbi + backtrack as a nested-subquery
    * chain (one LAYER per step — the t26 lateral-substitution lesson),
    * parameterized on the round's piece-score CTE name. Layer grammar,
    * innermost to outermost: a pivoted SEED (w, n, len, dp_0, and one
    * s{start}_{len} score column per in-bounds substring slot, built
    * by ONE hash join against the score table — a correlated
    * subquery per slot made DuckDB's planner replay the whole chain
    * per lookup and never finish) → per position i: a CANDIDATE layer
    * (c{l}_{i} = dp_{i−l} + s{i−l+1}_{l}, NULL when the piece is out
    * of vocab or l > i) then a PICK layer (dp_i = greatest of the
    * coalesced candidates; ch_i = the smallest l attaining it — the
    * kernel's ascending-l strict-> rule) → backtrack layers walking
    * q_k = q_{k−1} − ch[q_{k−1}] → a UNION over segment slots emits
    * (piece, n); `bt` is MATERIALIZED so the 8 arms share one pass. */
  private def t27SegSql(sc: String): String =
    viterbiSegSql(sc, unkLit = None)

  /** The generator proper — `unkLit`, when set, is the serve path's
    * out-of-vocab single-character fallback (t29): the l=1 candidate
    * coalesces the missing score to it instead of going NULL. */
  private def viterbiSegSql(sc: String, unkLit: Option[String]): String = {
    val W = 8 // unroll bound; the oracle guard errors if exceeded
    val P = graft.operators.TextOps.T27MaxPieceLen
    val slots = for { st <- 1 to W; l <- 1 to P; if st + l - 1 <= W }
      yield (st, l)
    val pivots = slots.map { case (st, l) =>
      s"max(CASE WHEN p.i = $st AND p.l = $l THEN sc.s END) AS s${st}_$l"
    }.mkString(",\n               ")
    val seed =
      s"""SELECT w.w, any_value(w.n) AS n,
               any_value(length(w.w)) AS len,
               CAST(0.0 AS DOUBLE) AS dp_0,
               $pivots
             FROM words w
             JOIN (SELECT i.i, l.l
                   FROM (SELECT unnest(range(1, ${W + 1})) AS i) i
                   CROSS JOIN (SELECT unnest(range(1, ${P + 1})) AS l) l) p
               ON p.i + p.l - 1 <= length(w.w)
             LEFT JOIN $sc sc
               ON sc.piece = substr(w.w, CAST(p.i AS INT), CAST(p.l AS INT))
             GROUP BY w.w"""
    val dpChain = (1 to W).foldLeft(seed) { (inner, i) =>
      val cands = (1 to math.min(P, i)).map { l =>
        val sCol = (l, unkLit) match {
          case (1, Some(u)) => s"coalesce(s${i}_1, $u)"
          case _ => s"s${i - l + 1}_$l"
        }
        s"""CASE WHEN $i <= len THEN dp_${i - l} +
               $sCol END AS c${l}_$i"""
      }.mkString(",\n             ")
      val candLayer = s"""SELECT *,
             $cands
             FROM ($inner)"""
      val co = (1 to P).map { l =>
        if (l <= i) s"coalesce(c${l}_$i, -1e18)" else "-1e18"
      }
      val pick =
        s"""CASE WHEN $i > len THEN NULL
               WHEN ${co(0)} >= ${co(1)} AND ${co(0)} >= ${co(2)}
                 AND ${co(0)} >= ${co(3)} THEN 1
               WHEN ${co(1)} >= ${co(2)} AND ${co(1)} >= ${co(3)} THEN 2
               WHEN ${co(2)} >= ${co(3)} THEN 3
               ELSE 4 END AS ch_$i"""
      s"""SELECT *,
             CASE WHEN $i <= len THEN
               greatest(${co.mkString(", ")}) END AS dp_$i,
             $pick
             FROM ($candLayer)"""
    }
    val btSeed = s"""SELECT *, len AS q_0 FROM ($dpChain)"""
    val btChain = (1 to W).foldLeft(btSeed) { (inner, k) =>
      val chAt = (1 to W).map(j => s"WHEN ${j} THEN ch_$j").mkString(" ")
      s"""SELECT *,
             CASE WHEN q_${k - 1} > 0
               THEN CASE q_${k - 1} $chAt END END AS pick_$k,
             CASE WHEN q_${k - 1} > 0
               THEN q_${k - 1} - (CASE q_${k - 1} $chAt END)
               ELSE 0 END AS q_$k
             FROM ($inner)"""
    }
    if (unkLit.isEmpty) {
      val arms = (1 to W).map { k =>
        s"""SELECT substr(w, q_$k + 1, pick_$k) AS piece, n
             FROM bt WHERE pick_$k IS NOT NULL"""
      }.mkString("\n           UNION ALL\n           ")
      s"""SELECT piece, n FROM (
           WITH bt AS MATERIALIZED ($btChain)
           $arms)"""
    } else {
      // serve emitter (t29): per-word PIECE COUNT — one CASE sum over
      // the backtrack picks, no UNION arms
      val cnt = (1 to W)
        .map(k => s"(CASE WHEN pick_$k IS NOT NULL THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""SELECT w, CAST($cnt AS BIGINT) AS n_sub
           FROM ($btChain)"""
    }
  }

  /** v02 replay — dialect-PORTABLE (runs verbatim in DuckDB AND via
    * spark.sql): one slim-key LEFT JOIN per FK edge, arms generated
    * from the SAME [[graft.operators.Checks.warehouseEdges]] list the
    * engine audits. */
  private lazy val v02OracleSql: String = {
    val arms = graft.operators.Checks.warehouseEdges.map { e =>
      s"""SELECT '${e.id}' AS edge,
             CAST(count(*) AS BIGINT) AS n_child,
             CAST(coalesce(
               sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_orphans
           FROM (SELECT ${e.childCol} AS k FROM ${e.child}
                 WHERE ${e.childCol} IS NOT NULL) c
           LEFT JOIN (SELECT DISTINCT ${e.parentCol} AS k
                      FROM ${e.parent}) p ON c.k = p.k"""
    }.mkString("\n           UNION ALL\n           ")
    s"""SELECT edge, n_child, n_orphans, n_orphans = 0 AS ok FROM (
           $arms)
         ORDER BY edge"""
  }

  /** v03 replay — dialect-PORTABLE (runs verbatim in DuckDB AND via
    * spark.sql): one scalar-aggregate arm per profiled column,
    * generated from the SAME
    * [[graft.operators.Checks.V03NumCols]]/[[graft.operators.Checks.V03StrCols]]
    * lists the engine profiles — the oracle can never profile a
    * column set the engine doesn't. */
  private lazy val v03OracleSql: String = {
    val C = graft.operators.Checks
    def arm(c: String, isNum: Boolean): String = {
      val (minNum, maxNum, minStr, maxStr) =
        if (isNum) (s"floor(CAST(min($c) AS DOUBLE)*1e4 + 0.5)/1e4",
                    s"floor(CAST(max($c) AS DOUBLE)*1e4 + 0.5)/1e4",
                    "CAST(NULL AS STRING)", "CAST(NULL AS STRING)")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
              s"CAST(min($c) AS STRING)", s"CAST(max($c) AS STRING)")
      s"""SELECT '$c' AS col_name,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(coalesce(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_null,
             CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             $minNum AS min_num, $maxNum AS max_num,
             $minStr AS min_str, $maxStr AS max_str
           FROM orders"""
    }
    val arms = (C.V03NumCols.map(arm(_, isNum = true)) ++
      C.V03StrCols.map(arm(_, isNum = false)))
      .mkString("\n         UNION ALL\n         ")
    s"""SELECT * FROM (
         $arms)
       ORDER BY col_name"""
  }

  /** v04 replay — dialect-portable (runs verbatim in Spark too): the
    * bin frame is a literal VALUES list, counts are exact integers,
    * and the one float expression (add-half smoothing + ln, 6-dp
    * floored) mirrors [[graft.operators.Checks.driftPsi]] op for op.
    * Bin geometry and the split date interpolate from the same
    * constants the engine reads. */
  private lazy val v04OracleSql: String = {
    val C = graft.operators.Checks
    val n = C.V04NBins
    val binVals = (0 until n).map(i => s"($i)").mkString(",")
    val half = n / 2.0
    s"""WITH b AS (
           SELECT CAST(least(floor(o_totalprice / ${C.V04BinWidth}), ${n - 1})
               AS INT) AS bin,
             CASE WHEN o_orderdate < TIMESTAMP '${C.V04SplitDate}'
               THEN 1 ELSE 0 END AS is_ref
           FROM orders
         ), c AS (
           SELECT bin, CAST(sum(is_ref) AS BIGINT) AS n_ref,
             CAST(sum(1 - is_ref) AS BIGINT) AS n_cur
           FROM b GROUP BY bin
         ), t AS (
           SELECT CAST(sum(is_ref) AS BIGINT) AS t_ref,
             CAST(sum(1 - is_ref) AS BIGINT) AS t_cur
           FROM b
         ), bins AS (SELECT * FROM (VALUES $binVals) AS v(bin)
         ), f AS (
           SELECT bins.bin,
             coalesce(c.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur,
             (coalesce(c.n_ref, 0) + 0.5) / (t.t_ref + $half) AS p,
             (coalesce(c.n_cur, 0) + 0.5) / (t.t_cur + $half) AS q
           FROM bins LEFT JOIN c ON bins.bin = c.bin CROSS JOIN t)
         SELECT bin, n_ref, n_cur,
           floor((p - q) * ln(p / q) * 1e6 + 0.5) / 1e6 AS psi_term,
           floor((p - q) * ln(p / q) * 1e6 + 0.5) / 1e6 < 0.01 AS stable
         FROM f ORDER BY bin"""
  }

  /** x20 replay — dialect-portable: the closed-form water-filling
    * level (λ* = max over saturation prefixes of g, see
    * [[graft.operators.Sampling.mixtureWaterfill]]) is two window
    * cumsums and one scalar max; every count is an exact integer and
    * every divide is the same IEEE double op the engine runs. */
  private lazy val x20OracleSql: String = {
    val frac = graft.operators.Sampling.X20BudgetFrac
    s"""WITH a AS (
           SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail
           FROM documents GROUP BY source
         ), w AS (
           SELECT source, avail,
             CAST(count(*) OVER () + 1 - row_number() OVER (ORDER BY source)
               AS BIGINT) AS weight
           FROM a
         ), t AS (
           SELECT CAST(sum(weight) AS BIGINT) AS tot_w,
             CAST(floor(sum(avail) * $frac) AS BIGINT) AS budget
           FROM w
         ), c AS (
           SELECT w.source, w.avail, w.weight, t.tot_w, t.budget,
             sum(w.avail) OVER (ORDER BY w.avail * 1.0 / w.weight, w.source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_avail,
             t.tot_w - sum(w.weight) OVER (ORDER BY w.avail * 1.0 / w.weight,
               w.source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS w_rem
           FROM w CROSS JOIN t
         ), l AS (
           SELECT max(CASE WHEN w_rem > 0
             THEN (budget - cum_avail) * 1.0 / w_rem END) AS g_max
           FROM c
         ), f AS (
           SELECT c.source, c.avail, c.weight,
             greatest(l.g_max, c.budget * 1.0 / c.tot_w) AS lam
           FROM c CROSS JOIN l)
         SELECT source, avail, weight,
           least(avail, CAST(floor(lam * weight) AS BIGINT)) AS alloc,
           least(avail, CAST(floor(lam * weight) AS BIGINT)) = avail
             AS saturated
         FROM f ORDER BY source"""
  }

  /** j06 replay — dialect-portable: the bucketed range-aggregate join
    * collapses to one LEFT JOIN + GROUP BY at oracle scale; the
    * 30-minute window interpolates from
    * [[graft.operators.TemporalJoins.J06WidthUs]]. */
  private lazy val j06OracleSql: String = {
    val mins = graft.operators.TemporalJoins.J06WidthUs / 60000000L
    s"""WITH p AS (
           SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'
         ), c AS (
           SELECT user_id, ts, value FROM events WHERE event_type = 'click')
         SELECT p.event_id, p.user_id,
           CAST(count(c.value) AS BIGINT) AS n_clicks,
           round(sum(c.value), 4) AS sum_click_value,
           round(max(c.value), 4) AS max_click_value
         FROM p LEFT JOIN c ON p.user_id = c.user_id
           AND c.ts >= p.ts - INTERVAL $mins MINUTE AND c.ts < p.ts
         GROUP BY p.event_id, p.user_id
         ORDER BY p.event_id"""
  }

  /** j07 replay — dialect-PORTABLE (runs verbatim in DuckDB and via
    * spark.sql): the brute-force interval join the engine's bucketed
    * equi-join is exactly equal to; last-touch rule ts DESC,
    * click_id DESC (the engine's max-struct tiebreak); window minutes
    * from [[graft.operators.TemporalJoins.J06WidthUs]]. */
  private lazy val j07OracleSql: String = {
    val mins = graft.operators.TemporalJoins.J06WidthUs / 60000000L
    s"""WITH p AS (
           SELECT event_id AS purchase_id, user_id, ts, value FROM events
           WHERE event_type = 'purchase'
         ), c AS (
           SELECT user_id, event_id AS click_id, ts FROM events
           WHERE event_type = 'click'
         ), m AS (
           SELECT p.purchase_id, p.value, c.click_id,
             row_number() OVER (PARTITION BY p.purchase_id
               ORDER BY c.ts DESC, c.click_id DESC) AS rk,
             CAST(count(*) OVER (PARTITION BY p.purchase_id) AS BIGINT)
               AS n_touches
           FROM p JOIN c ON p.user_id = c.user_id
             AND c.ts >= p.ts - INTERVAL $mins MINUTE AND c.ts < p.ts)
         SELECT purchase_id, n_touches, click_id AS last_click_id,
           CAST(floor(value * 100.0 / n_touches + 0.5) AS BIGINT)
             AS credit_cents
         FROM m WHERE rk = 1 ORDER BY purchase_id"""
  }

  /** t32 replay — the t14 recursive-CTE BPE encode (merge table
    * generated from the SAME [[graft.operators.TextOps.pinnedMerges]]
    * fixture) with the per-language fertility tail. */
  /** t33 replay — DISTINCT per-doc trigram md5s (1-based list_slice,
    * space-joined — byte-identical to the engine's concat_ws), min
    * doc_id first-occurrence, LEFT join back so trigram-less docs
    * report the 1000 convention. All-integer. */
  private lazy val t33OracleSql: String =
    raw"""WITH tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
           FROM documents
         ), tri AS (
           SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(t, i, i + 2), ' ')) AS fp
           FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
                 FROM tk WHERE len(t) >= 3)
         ), fo AS (
           SELECT fp, min(doc_id) AS first_doc FROM tri GROUP BY fp
         ), pd AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
             CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_novel
           FROM tri JOIN fo USING (fp) GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(coalesce(n_ngrams, 0) AS BIGINT) AS n_ngrams,
           CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN coalesce(n_ngrams, 0) = 0 THEN CAST(1000 AS BIGINT)
                ELSE CAST(floor(n_novel * 1000.0 / n_ngrams + 0.5) AS BIGINT)
           END AS novelty_milli
         FROM documents d LEFT JOIN pd USING (doc_id)
         ORDER BY doc_id"""

  /** t34 replay — the d15 fixture split (floor on both sides), store
    * = distinct trigram fps below the cut, batch docs LEFT-join the
    * store per distinct trigram. All-integer. */
  private lazy val t34OracleSql: String = {
    val frac = graft.operators.TextOps.T34SplitFrac
    raw"""WITH cut AS (
           SELECT CAST(floor(max(doc_id) * $frac) AS BIGINT) AS c
           FROM documents
         ), tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
           FROM documents
         ), tri AS (
           SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(t, i, i + 2), ' ')) AS fp
           FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
                 FROM tk WHERE len(t) >= 3)
         ), store AS (
           SELECT DISTINCT fp FROM tri, cut WHERE doc_id < c
         ), batch AS (
           SELECT doc_id FROM documents, cut WHERE doc_id >= c
         ), pd AS (
           SELECT tri.doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
             CAST(sum(CASE WHEN s.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
           FROM tri JOIN cut ON tri.doc_id >= cut.c
           LEFT JOIN store s ON s.fp = tri.fp
           GROUP BY tri.doc_id)
         SELECT b.doc_id,
           CAST(coalesce(n_ngrams, 0) AS BIGINT) AS n_ngrams,
           CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN coalesce(n_ngrams, 0) = 0 THEN CAST(1000 AS BIGINT)
                ELSE CAST(floor(n_novel * 1000.0 / n_ngrams + 0.5) AS BIGINT)
           END AS novelty_milli
         FROM batch b LEFT JOIN pd USING (doc_id)
         ORDER BY doc_id"""
  }

  /** v08 replay — the x21 assignment CTE + t33's trigram CTE keyed by
    * split; val/test totalized via a VALUES frame so an empty split
    * still reports (the engine's ungrouped aggregate is total). */
  private lazy val v08OracleSql: String =
    raw"""WITH f AS (
           SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
           FROM documents
         ), asg AS (
           SELECT doc_id, fp,
             CASE WHEN substring(md5(fp), 1, 2) < '0d' THEN 'test'
                  WHEN substring(md5(fp), 1, 2) < '1a' THEN 'val'
                  ELSE 'train' END AS split
           FROM f
         ), multi AS (
           SELECT CAST(count(*) AS BIGINT) AS v FROM (
             SELECT fp FROM (SELECT DISTINCT fp, split FROM asg)
             GROUP BY fp HAVING count(*) > 1)
         ), tk AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
           FROM documents
         ), tri AS (
           SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(t, i, i + 2), ' ')) AS fp3
           FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
                 FROM tk WHERE len(t) >= 3)
         ), sfp AS (
           SELECT DISTINCT asg.split, tri.fp3
           FROM tri JOIN asg ON tri.doc_id = asg.doc_id
         ), tr AS (SELECT fp3 FROM sfp WHERE split = 'train'
         ), lk AS (
           SELECT split, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN t.fp3 IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS h
           FROM sfp LEFT JOIN tr t USING (fp3)
           WHERE split IN ('val', 'test') GROUP BY split
         ), lk2 AS (
           SELECT s.split, CAST(coalesce(n, 0) AS BIGINT) AS n,
             CAST(coalesce(h, 0) AS BIGINT) AS h
           FROM (VALUES ('val'), ('test')) AS s(split)
           LEFT JOIN lk ON lk.split = s.split)
         SELECT metric, value FROM (
           SELECT 'content_fps_multi_split' AS metric, v AS value FROM multi
           UNION ALL SELECT split || '_ngrams', n FROM lk2
           UNION ALL SELECT split || '_ngrams_in_train', h FROM lk2
           UNION ALL SELECT split || '_leak_milli',
             CASE WHEN n = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor(h * 1000.0 / n + 0.5) AS BIGINT) END
           FROM lk2)
         ORDER BY metric"""

  /** v07 replay — the 1-row exact aggregate (three COUNT DISTINCTs —
    * a datasheet can't ship approximations) unpivoted to (stat,
    * value) rows. All-integer/milli. */
  private lazy val v07OracleSql: String =
    raw"""WITH d AS (
           SELECT
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens,
             CAST(n_chars AS BIGINT) AS n_chars, lang, source,
             md5(lower(regexp_replace(trim(text), '\s+', ' '))) AS fp
           FROM documents
         ), a AS (
           SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             CAST(sum(n_chars) AS BIGINT) AS n_chars,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_content,
             CAST(min(n_tokens) AS BIGINT) AS tokens_min,
             CAST(max(n_tokens) AS BIGINT) AS tokens_max
           FROM d)
         SELECT stat, value FROM (
           SELECT 'n_docs' AS stat, n_docs AS value FROM a
           UNION ALL SELECT 'n_tokens', n_tokens FROM a
           UNION ALL SELECT 'n_chars', n_chars FROM a
           UNION ALL SELECT 'n_langs', n_langs FROM a
           UNION ALL SELECT 'n_sources', n_sources FROM a
           UNION ALL SELECT 'n_distinct_content', n_distinct_content FROM a
           UNION ALL SELECT 'tokens_min', tokens_min FROM a
           UNION ALL SELECT 'tokens_max', tokens_max FROM a
           UNION ALL SELECT 'dup_docs', n_docs - n_distinct_content FROM a
           UNION ALL SELECT 'dup_milli',
             CAST(floor((n_docs - n_distinct_content) * 1000.0 / n_docs + 0.5)
               AS BIGINT) FROM a
           UNION ALL SELECT 'tokens_avg_milli',
             CAST(floor(n_tokens * 1000.0 / n_docs + 0.5) AS BIGINT) FROM a)
         ORDER BY stat"""

  private lazy val t32OracleSql: String = {
    val merges = graft.operators.TextOps.pinnedMerges
    val rows = merges.zipWithIndex.map { case ((a, b), i) =>
      s"(${i + 1}, ' $a $b ', ' $a$b ')"
    }.mkString(",\n             ")
    val k = merges.length + 1
    s"""WITH RECURSIVE
         words AS (
           SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
           FROM documents
         ), vocab AS (SELECT DISTINCT word FROM words
         ), merges(k, pat, rep) AS (
           SELECT * FROM (VALUES
             $rows)
         ), enc AS (
           SELECT word,
             ' ' || array_to_string(string_split(word, ''), ' ') || ' </w> ' AS s,
             1 AS k
           FROM vocab
           UNION ALL
           SELECT e.word,
             CASE WHEN strpos(e.s, m.pat) > 0
               THEN substr(e.s, 1, strpos(e.s, m.pat) - 1) || m.rep ||
                    substr(e.s, strpos(e.s, m.pat) + length(m.pat))
               ELSE e.s END,
             CASE WHEN strpos(e.s, m.pat) > 0 THEN e.k ELSE e.k + 1 END
           FROM enc e JOIN merges m ON m.k = e.k
         ), encoded AS (
           SELECT word,
             length(trim(s)) - length(replace(trim(s), ' ', '')) + 1 AS n_sub
           FROM enc WHERE k = $k
         ), agg AS (
           SELECT w.lang,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(e.n_sub) AS BIGINT) AS n_bpe_tokens
           FROM words w JOIN encoded e USING (word)
           GROUP BY w.lang)
         SELECT lang, n_words, n_bpe_tokens,
           CAST(floor(CAST(n_bpe_tokens AS DOUBLE) * 1000.0
             / CAST(n_words AS DOUBLE) + 0.5) AS BIGINT) AS fertility_milli
         FROM agg ORDER BY lang"""
  }

  /** m10 replay — dialect-portable: media dims re-derive from
    * `documents` exactly as the m05 oracle does; the bucket table is
    * the interpolated [[graft.operators.Multimodal.M10Buckets]]
    * VALUES list; distance and resize math mirror the engine
    * (integer products, one ln floored at 6 dp, integer division via
    * floor). */
  /** The m10 CTE chain + select body, shared with the m11 wrapper. */
  private lazy val m10Ctes: String = {
    val bucketVals = graft.operators.Multimodal.M10Buckets
      .map { case (i, w, h) => s"($i, $w, $h)" }.mkString(",")
    s"""m AS (
           SELECT doc_id AS media_id,
             CAST(64 + n_chars % 64 AS BIGINT) AS w,
             CAST(64 + n_chars % 48 AS BIGINT) AS h
           FROM documents
         ), b AS (SELECT * FROM (VALUES $bucketVals) AS v(bucket_id, bw, bh)
         ), scored AS (
           SELECT m.media_id, m.w, m.h, b.bucket_id, b.bw, b.bh,
             floor(abs(ln(CAST(m.w * b.bh AS DOUBLE)
               / CAST(m.h * b.bw AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS dist
           FROM m CROSS JOIN b
         ), best AS (
           SELECT *, row_number() OVER (PARTITION BY media_id
             ORDER BY dist, bucket_id) AS rk
           FROM scored)"""
  }

  private lazy val m10SelectBody: String =
    """SELECT media_id, bucket_id,
           CAST(bw AS INT) AS bucket_w, CAST(bh AS INT) AS bucket_h,
           CAST(CASE WHEN w * bh >= h * bw
             THEN floor(w * bh / h) ELSE bw END AS INT) AS resize_w,
           CAST(CASE WHEN w * bh >= h * bw
             THEN bh ELSE floor(h * bw / w) END AS INT) AS resize_h,
           CAST(CASE WHEN w * bh >= h * bw
             THEN floor(w * bh / h) - bw ELSE 0 END AS INT) AS crop_x,
           CAST(CASE WHEN w * bh >= h * bw
             THEN 0 ELSE floor(h * bw / w) - bh END AS INT) AS crop_y
         FROM best WHERE rk = 1"""

  private lazy val m10OracleSql: String =
    s"""WITH $m10Ctes
         $m10SelectBody ORDER BY media_id"""

  /** m11 replay — the m10 chain verbatim plus the batch-chunk window;
    * batch size interpolates from
    * [[graft.operators.Multimodal.M11BatchSize]]. Integer division is
    * spelled floor() (a bare CAST would round-half-even in DuckDB but
    * truncate in Spark). Dialect-portable like m10. */
  private lazy val m11OracleSql: String = {
    val b = graft.operators.Multimodal.M11BatchSize
    s"""WITH $m10Ctes, picked AS (
           $m10SelectBody
         ), ranked AS (
           SELECT media_id, bucket_id,
             row_number() OVER (PARTITION BY bucket_id ORDER BY media_id)
               AS rn
           FROM picked
         ), chunked AS (
           SELECT bucket_id,
             CAST(floor((rn - 1) / $b.0) AS INT) AS batch_idx,
             CAST((rn - 1) % $b AS INT) AS slot, media_id
           FROM ranked)
         SELECT bucket_id, batch_idx, slot, media_id,
           count(*) OVER (PARTITION BY bucket_id, batch_idx) = $b AS full
         FROM chunked ORDER BY bucket_id, batch_idx, slot"""
  }

  /** x21 replay — the x17 content-fingerprint spelling pushed through
    * the x01 hash-prefix split, keyed on the FAMILY fingerprint. */
  private lazy val x21OracleSql: String =
    """WITH f AS (
           SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
           FROM documents
         ), sp AS (
           SELECT fp,
             CASE WHEN substring(md5(fp), 1, 2) < '0d' THEN 'test'
                  WHEN substring(md5(fp), 1, 2) < '1a' THEN 'val'
                  ELSE 'train' END AS split
           FROM f)
         SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_families
         FROM sp GROUP BY split ORDER BY split"""

  /** x22 replay — x10's offsets chain, each doc exploded to its
    * occupied sequences via range() (DuckDB range is half-open; the
    * engine's `sequence` is inclusive, hence the +n_seqs bound), then
    * one (seq_id) aggregate. All-integer math. */
  private lazy val x22OracleSql: String = {
    val B = Sampling.X22Budget
    // raw interpolator: the s-interpolator would escape-process the
    // regex backslash
    raw"""WITH n AS (
           SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
           FROM documents
         ), c AS (
           SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS BIGINT) AS start_tok
           FROM n
         ), m AS (
           SELECT n_tokens, start_tok,
             ((start_tok + n_tokens - 1) // $B) - (start_tok // $B) + 1
               AS n_seqs
           FROM c WHERE n_tokens >= 1
         ), ex AS (
           SELECT n_tokens, start_tok, n_seqs,
             unnest(range(start_tok // $B, start_tok // $B + n_seqs))
               AS seq_id
           FROM m)
         SELECT seq_id, n_tokens_filled, n_docs, n_fragments,
           n_tokens_filled = $B AS full
         FROM (
           SELECT seq_id,
             CAST(sum(least(start_tok + n_tokens, (seq_id + 1) * $B)
               - greatest(start_tok, seq_id * $B)) AS BIGINT)
               AS n_tokens_filled,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fragments
           FROM ex GROUP BY seq_id)
         ORDER BY seq_id"""
  }

  /** v05 replay — the floor-then-sum KL terms re-derived per
    * (source, word): nano-floored doubles summed as BIGINTs (the x11
    * lam_micro discipline), absent-word mass in closed form
    * (Σ_{w∉s} q·ln2 = ln2·(1 − Σ_{w∈s} q)), final jsd floored at
    * 6 dp. Engine and oracle share every scalar op and its order. */
  private lazy val v05OracleSql: String =
    """WITH tok AS (
           SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
           FROM documents
         ), st AS (
           SELECT source, w, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2
         ), g AS (
           SELECT w, CAST(sum(c) AS BIGINT) AS cg FROM st GROUP BY 1
         ), ts AS (
           SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM st GROUP BY 1
         ), nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM st),
         pq AS (
           SELECT source, cg, ns, n,
             CAST(c AS DOUBLE) / CAST(ns AS DOUBLE) AS p,
             CAST(cg AS DOUBLE) / CAST(n AS DOUBLE) AS q
           FROM st JOIN g USING (w) JOIN ts USING (source) CROSS JOIN nn
         ), terms AS (
           SELECT source, cg, ns, n,
             CAST(floor(p * ln(p / ((p + q) / 2.0)) * 1e9 + 0.5) AS BIGINT)
               AS kp_nano,
             CAST(floor(q * ln(q / ((p + q) / 2.0)) * 1e9 + 0.5) AS BIGINT)
               AS kq_nano
           FROM pq)
         SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           floor(((CAST(sum(kp_nano) AS BIGINT) / 1e9) * 0.5
             + ((CAST(sum(kq_nano) AS BIGINT) / 1e9)
                + (1.0 - CAST(sum(cg) AS BIGINT) / CAST(max(n) AS DOUBLE))
                  * ln(2.0)) * 0.5) * 1e6 + 0.5) / 1e6 AS jsd
         FROM terms GROUP BY source ORDER BY source"""

  /** m09 replays — the window-md5 boundary rule re-derived from the
    * text: position e (1-based) ends a chunk when the big-endian
    * unsigned first-4-bytes of md5(window) ≡ 0 mod
    * [[graft.operators.Multimodal.M09Divisor]]; chunks are the
    * lag-islands between boundaries, chunk fps are md5 of the char
    * slice. Payload bytes ARE the text's UTF-8 bytes, so char slices
    * equal byte slices only on ASCII — the DuckDB side enforces that
    * precondition with a guard CTE (the t25/t26 discipline, tightened
    * to 7 bits). Only the hex→int spelling, the unnest/explode
    * spelling, and the guard differ per dialect. */
  private def m09Sql(hexToInt: String => String, posGen: Int => String,
                     guardCte: String, guardPred: String): String = {
    val w = graft.operators.Multimodal.M09Window
    val d = graft.operators.Multimodal.M09Divisor
    s"""WITH base AS (
           SELECT doc_id AS media_id, text, length(text) AS n FROM documents
         ), $guardCte pos AS (
           SELECT media_id, text, n, ${posGen(w)} AS e
           FROM base WHERE n >= $w
         ), bounds AS (
           SELECT media_id, CAST(e AS INT) AS e FROM pos
           WHERE ${hexToInt(s"substring(md5(substring(text, CAST(e AS INT) - ${w - 1}, $w)), 1, 8)")} % $d = 0
           UNION
           SELECT media_id, CAST(n AS INT) FROM base
         ), chunks AS (
           SELECT media_id,
             coalesce(lag(e) OVER (PARTITION BY media_id ORDER BY e), 0) + 1
               AS start,
             e - coalesce(lag(e) OVER (PARTITION BY media_id ORDER BY e), 0)
               AS len
           FROM bounds
         ), fps AS (
           SELECT c.media_id, c.len,
             md5(substring(d.text, c.start, c.len)) AS fp
           FROM chunks c JOIN documents d ON d.doc_id = c.media_id
         ), cnt AS (
           SELECT fp, CAST(count(*) AS BIGINT) AS n_copies
           FROM fps GROUP BY fp
         )
         SELECT f.media_id, CAST(b.n AS BIGINT) AS n_bytes,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks,
           CAST(sum(CASE WHEN n_copies > 1 THEN f.len ELSE 0 END) AS BIGINT)
             AS shared_bytes,
           floor((CAST(sum(CASE WHEN n_copies > 1 THEN f.len ELSE 0 END)
                    AS DOUBLE) / b.n)*1e4 + 0.5)/1e4 AS dup_frac
         FROM fps f JOIN cnt USING (fp) JOIN base b USING (media_id)
         $guardPred
         GROUP BY f.media_id, b.n
         ORDER BY f.media_id"""
  }

  private lazy val m09OracleSql: String = m09Sql(
    h => s"CAST(('0x' || $h) AS BIGINT)",
    w => s"unnest(range($w, n + 1))",
    """guard AS MATERIALIZED (
           SELECT CASE WHEN max(ord(c)) > 127
             THEN CAST(error('m09 ASCII bound: a non-ASCII byte desyncs char offsets from the byte offsets the engine chunks by') AS INT)
             ELSE 1 END AS ok
           FROM (SELECT unnest(string_split(text, '')) AS c FROM documents)
         ),""",
    "WHERE (SELECT ok FROM guard) = 1")
  private[graft] lazy val m09SparkSqlText: String = m09Sql(
    h => s"CAST(conv($h, 16, 10) AS BIGINT)",
    w => s"explode(sequence($w, n))",
    "", "")

  /** x18 replays — shared shape for both dialects: the Bloom
    * membership test WITHOUT bit arithmetic. A bit at position p is
    * set iff ANY benchmark doc maps one of its slices there, so
    * `bloom_hit` = all [[graft.operators.Dedup.X18K]] positions ∈ the
    * distinct benchmark-position set — provably ≡ the engine's
    * word/mask test (same positions, same membership). Positions are
    * the same disjoint 40-bit md5-hex slices mod
    * [[graft.operators.Dedup.X18Bits]]; only the hex→int spelling
    * differs per dialect (DuckDB `'0x' ||` cast, Spark `conv`). */
  private def x18Sql(hexToInt: String => String, gFlag: String,
                     ws: String): String = {
    val m = graft.operators.Dedup.X18Bits
    val k = graft.operators.Dedup.X18K
    require(k == 3, "the x18 replay joins exactly 3 probe slices")
    def posSql(j: Int) =
      s"${hexToInt(s"substring(fp, ${1 + 10 * (j - 1)}, 10)")} % $m AS p$j"
    val benchArms = (1 to k)
      .map(j => s"SELECT p$j AS pos FROM pos WHERE split = 'test'")
      .mkString("\n             UNION ALL ")
    val allHit = (1 to k).map(j => s"s$j.pos IS NOT NULL").mkString(" AND ")
    val setJoins = (1 to k)
      .map(j => s"LEFT JOIN setbits s$j ON s$j.pos = c.p$j")
      .mkString("\n         ")
    s"""WITH base AS (
           SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '$ws', ' '$gFlag))) AS fp,
             CASE WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < '0d'
                    THEN 'test'
                  WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < '1a'
                    THEN 'val'
                  ELSE 'train' END AS split
           FROM documents
         ), pos AS (
           SELECT doc_id, fp, split,
             ${(1 to k).map(posSql).mkString(",\n             ")}
           FROM base
         ), setbits AS (
           SELECT DISTINCT pos FROM (
             $benchArms)
         ), bfp AS (
           SELECT fp, CAST(count(*) AS BIGINT) AS n_bench
           FROM base WHERE split = 'test' GROUP BY fp
         )
         SELECT c.doc_id,
           ($allHit) AS bloom_hit,
           b.fp IS NOT NULL AS exact_hit,
           ($allHit AND b.fp IS NULL) AS is_fp,
           CAST(coalesce(b.n_bench, 0) AS BIGINT) AS n_bench_matches
         FROM pos c
         $setJoins
         LEFT JOIN bfp b ON b.fp = c.fp
         ORDER BY c.doc_id"""
  }

  private lazy val x18OracleSql: String =
    x18Sql(h => s"CAST(('0x' || $h) AS BIGINT)", ", 'g'", "\\s+")
  private[graft] lazy val x18SparkSqlText: String =
    x18Sql(h => s"CAST(conv($h, 16, 10) AS BIGINT)", "", "\\\\s+")

  /** x19 replay — dialect-PORTABLE (runs verbatim in DuckDB AND via
    * spark.sql): per-epoch md5-salted sort keys ranked by one window;
    * the engine's bucket-splice produces the same total order. Epochs
    * and shard count interpolate from
    * [[graft.operators.Sampling.X19Epochs]]/[[graft.operators.Sampling.X19Shards]]. */
  private lazy val x19OracleSql: String = {
    val e = graft.operators.Sampling.X19Epochs
    val sh = graft.operators.Sampling.X19Shards
    val values = (0 until e).map(i => s"($i)").mkString(", ")
    s"""WITH k AS (
           SELECT e.epoch, d.doc_id,
             md5(CAST(e.epoch AS STRING) || ':' || CAST(d.doc_id AS STRING))
               AS key
           FROM documents d CROSS JOIN (VALUES $values) AS e(epoch)
         )
         SELECT epoch, doc_id, pos, CAST((pos - 1) % $sh AS INT) AS shard
         FROM (
           SELECT epoch, doc_id,
             CAST(row_number() OVER (PARTITION BY epoch
               ORDER BY key ASC, doc_id ASC) AS BIGINT) AS pos
           FROM k)
         ORDER BY epoch, pos"""
  }

  /** m08 DuckDB replay — the m04 hex-nibble trick per payload (high
    * nibble of byte i = hex char 2i−1), 16 quantized levels
    * (`8·count // n`, exact integer division both engines) joined to
    * a signature, then a plain group. */
  private lazy val m08OracleSql: String = {
    val digits = "0123456789ABCDEF"
    val levels = (0 until 16).map { i =>
      s"""CAST((8 * len(list_filter(range(1, L + 1),
             i -> substring(hx, CAST(2*i - 1 AS INT), 1) = '${digits(i)}')))
             // L AS VARCHAR)"""
    }.mkString(",\n             ")
    s"""WITH m AS (
           SELECT doc_id AS media_id,
             octet_length(encode(text)) AS L,
             hex(encode(text)) AS hx
           FROM documents
         ), sigs AS (
           SELECT media_id, concat_ws('-', $levels) AS sig FROM m)
         SELECT sig, min(media_id) AS keeper,
           CAST(count(*) AS BIGINT) AS n_members
         FROM sigs GROUP BY sig ORDER BY keeper"""
  }

  /** m08 Spark-dialect replay — same statement with Spark's
    * hex/filter spellings; `div` is Spark's integer division. */
  private lazy val m08SparkSql: String = {
    val digits = "0123456789ABCDEF"
    val levels = (0 until 16).map { i =>
      s"""CAST((8 * size(filter(sequence(1, L),
             i -> substring(hx, CAST(2*i - 1 AS INT), 1) = '${digits(i)}')))
             div L AS STRING)"""
    }.mkString(",\n             ")
    s"""WITH m AS (
           SELECT doc_id AS media_id,
             octet_length(CAST(text AS BINARY)) AS L,
             hex(CAST(text AS BINARY)) AS hx
           FROM documents
         ), sigs AS (
           SELECT media_id, concat_ws('-', $levels) AS sig FROM m)
         SELECT sig, min(media_id) AS keeper, count(1) AS n_members
         FROM sigs GROUP BY sig ORDER BY keeper"""
  }

  /** t29 DuckDB replay — the pinned unigram model as a VALUES
    * literal (integer counts; scores re-derived with the engine's
    * exact ln((c+1)/denom) op order), [[viterbiSegSql]] in serve mode
    * (UNK coalesce on the single-char candidates, per-word piece
    * COUNTS out), joined back to the corpus token stream for per-doc
    * totals. Knobs single-sourced from [[graft.operators.TextOps]]. */
  private lazy val t29OracleSql: String = {
    val T = graft.operators.TextOps
    val unk = s"CAST(${T.T29UnkScore} AS DOUBLE)"
    val vals = T.pinnedUnigram
      .map { case (p, c) => s"('$p', $c)" }.mkString(", ")
    s"""WITH tok AS MATERIALIZED (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
           FROM documents
         ), words AS MATERIALIZED (
           SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY w
         ), guard AS MATERIALIZED (
           SELECT CASE WHEN max(length(w)) > 8
             THEN CAST(error('t29 unroll bound: word longer than 8') AS INT)
             ELSE 1 END AS ok FROM words
         ), scp AS MATERIALIZED (
           SELECT piece,
             ln(CAST(c + 1 AS DOUBLE) /
                CAST(${T.pinnedUnigramDenom} AS DOUBLE)) AS s
           FROM (VALUES $vals) AS t(piece, c)
         ), seg AS MATERIALIZED (
           ${viterbiSegSql("scp", Some(unk))}
         )
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_sub) AS BIGINT) AS n_pieces
         FROM tok JOIN seg USING (w)
         WHERE (SELECT ok FROM guard) = 1
         GROUP BY doc_id
         ORDER BY doc_id"""
  }

  /** t29 Spark-dialect replay — the same pinned model as array
    * literals through the registered serve kernel
    * (`graft_unigram_segment_unk`); distinct-word kernel + join-back,
    * the engine's own shape. */
  private lazy val t29SparkSql: String = {
    val T = graft.operators.TextOps
    val pcs = T.pinnedUnigramPieces
      .map(p => s"'$p'").mkString("array(", ", ", ")")
    val cts = T.pinnedUnigram
      .map(_._2.toString + "L").mkString("array(", ", ", ")")
    s"""WITH w AS (
           SELECT doc_id, explode(split(trim(text), '\\\\s+')) AS word
           FROM documents
         ), v AS (
           SELECT word,
             CAST(size(graft_unigram_segment_unk(word, $pcs,
               transform($cts, c -> ln(CAST(c + 1 AS DOUBLE) /
                 CAST(${T.pinnedUnigramDenom}L AS DOUBLE))),
               CAST(${T.T29UnkScore} AS DOUBLE))) AS BIGINT) AS n_sub
           FROM (SELECT DISTINCT word FROM w)
         )
         SELECT w.doc_id, count(1) AS n_words, sum(v.n_sub) AS n_pieces
         FROM w JOIN v USING (word)
         GROUP BY w.doc_id ORDER BY doc_id"""
  }

  /** t28 Spark-dialect replay — same statement shape as the DuckDB
    * form; the rank-ordered float sums go through the engine's own
    * array-fold spelling (array_sort + aggregate, the t12 pattern). */
  private lazy val t28SparkSql: String = {
    val K = graft.operators.TextOps.T28K
    val kf = "CAST(kf AS DOUBLE)"
    val num = s"($kf*sxy - sx*sy)"
    val den = s"($kf*sxx - sx*sx)"
    val deny = s"($kf*syy - sy*sy)"
    def sumOf(body: String) =
      s"""aggregate(transform(arr, e -> $body),
               CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""
    s"""WITH w AS (
           SELECT explode(split(trim(text), '\\\\s+')) AS w FROM documents
         ), cnt AS (
           SELECT w, count(1) AS n FROM w GROUP BY w
         ), tot AS (
           SELECT count(1) AS nv, sum(n) AS nt FROM cnt
         ), top AS (
           SELECT rk, ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
           FROM (SELECT n,
                   row_number() OVER (ORDER BY n DESC, w ASC) AS rk
                 FROM cnt)
           WHERE rk <= $K
         ), packed AS (
           SELECT count(1) AS kf,
             array_sort(collect_list(struct(rk, x, y))) AS arr
           FROM top
         ), s AS (
           SELECT kf,
             ${sumOf("e.x")} AS sx, ${sumOf("e.y")} AS sy,
             ${sumOf("e.x * e.y")} AS sxy, ${sumOf("e.x * e.x")} AS sxx,
             ${sumOf("e.y * e.y")} AS syy
           FROM packed)
         SELECT nv AS n_vocab, nt AS n_tokens, kf AS k_fit,
           floor(($num/$den)*1e4 + 0.5)/1e4 AS slope,
           floor(((sy - ($num/$den)*sx)/$kf)*1e4 + 0.5)/1e4 AS intercept,
           floor((($num*$num)/($den*$deny))*1e4 + 0.5)/1e4 AS r2
         FROM tot CROSS JOIN s"""
  }

  /** t28 DuckDB replay — token counts, a (n DESC, w ASC) rank, and
    * the least-squares fit over the top-[[graft.operators.TextOps.T28K]]
    * ranks with every float sum rank-ORDERED (DuckDB's ordered
    * aggregate folds sequentially — the t12 discipline — so the sums
    * reproduce the engine's array-fold bit-for-bit). */
  private lazy val t28OracleSql: String = {
    val K = graft.operators.TextOps.T28K
    val kf = "CAST(kf AS DOUBLE)"
    val num = s"($kf*sxy - sx*sy)"
    val den = s"($kf*sxx - sx*sx)"
    val deny = s"($kf*syy - sy*sy)"
    s"""WITH w AS (
           SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
           FROM documents
         ), cnt AS (
           SELECT w, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY w
         ), tot AS (
           SELECT CAST(count(*) AS BIGINT) AS nv,
                  CAST(sum(n) AS BIGINT) AS nt FROM cnt
         ), top AS (
           SELECT rk, ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
           FROM (SELECT n,
                   row_number() OVER (ORDER BY n DESC, w ASC) AS rk
                 FROM cnt)
           WHERE rk <= $K
         ), s AS (
           SELECT CAST(count(*) AS BIGINT) AS kf,
             sum(x ORDER BY rk) AS sx, sum(y ORDER BY rk) AS sy,
             sum(x*y ORDER BY rk) AS sxy, sum(x*x ORDER BY rk) AS sxx,
             sum(y*y ORDER BY rk) AS syy
           FROM top)
         SELECT nv AS n_vocab, nt AS n_tokens, kf AS k_fit,
           floor(($num/$den)*1e4 + 0.5)/1e4 AS slope,
           floor(((sy - ($num/$den)*sx)/$kf)*1e4 + 0.5)/1e4 AS intercept,
           floor((($num*$num)/($den*$deny))*1e4 + 0.5)/1e4 AS r2
         FROM tot CROSS JOIN s"""
  }

  /** t27 DuckDB replay — the full 2-round hard-EM trajectory
    * re-derived from the raw corpus: weighted-substring seed vocab,
    * seed scores, [[t27SegSql]]'s unrolled Viterbi per round, add-1
    * re-scoring between rounds (the engine's exact double op order:
    * ln of a division of two exact integers), final top-K by
    * (uses DESC, piece ASC). Knobs interpolated from
    * [[graft.operators.TextOps]]; a guard CTE errors if any corpus
    * word exceeds the W=8 unroll bound instead of silently truncating
    * (the capGuard discipline). */
  private lazy val t27OracleSql: String = {
    val T = graft.operators.TextOps
    val P = T.T27MaxPieceLen
    val S = T.T27SeedMulti
    val K = T.T27K
    require(T.T27Rounds == 2, "t27 oracle unrolls exactly 2 rounds")
    require(P == 4, "the pick CASE is written for maxPieceLen 4")
    s"""WITH words AS MATERIALIZED (
           SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
             SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
             FROM documents)
           GROUP BY w
         ), guard AS MATERIALIZED (
           SELECT CASE WHEN max(length(w)) > 8
             THEN CAST(error('t27 unroll bound: word longer than 8') AS INT)
             ELSE 1 END AS ok FROM words
         ), occ AS (
           SELECT substr(w.w, CAST(i.i AS INT), CAST(l.l AS INT)) AS piece, w.n
           FROM words w
           CROSS JOIN (SELECT unnest(range(1, 9)) AS i) i
           CROSS JOIN (SELECT unnest(range(1, ${P + 1})) AS l) l
           WHERE i.i + l.l - 1 <= length(w.w)
         ), f0 AS MATERIALIZED (
           SELECT piece, CAST(sum(n) AS BIGINT) AS f FROM occ GROUP BY piece
         ), vocab0 AS MATERIALIZED (
           SELECT piece, f FROM f0 WHERE length(piece) = 1
           UNION ALL
           SELECT piece, f FROM (
             SELECT piece, f,
               row_number() OVER (ORDER BY f DESC, piece ASC) AS rk
             FROM f0 WHERE length(piece) > 1) WHERE rk <= $S
         ), tot0 AS MATERIALIZED (
           SELECT CAST(sum(f) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
           FROM vocab0
         ), sc0 AS MATERIALIZED (
           SELECT piece,
             ln(CAST(f AS DOUBLE) / CAST((SELECT t FROM tot0) AS DOUBLE)) AS s
           FROM vocab0
         ), seg1 AS MATERIALIZED (
           ${t27SegSql("sc0")}
         ), c1 AS MATERIALIZED (
           SELECT piece, CAST(sum(n) AS BIGINT) AS c FROM seg1 GROUP BY piece
         ), totc1 AS MATERIALIZED (SELECT CAST(sum(c) AS BIGINT) AS t FROM c1
         ), sc1 AS MATERIALIZED (
           SELECT v.piece,
             ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE) /
                CAST((SELECT t FROM totc1) + (SELECT v FROM tot0) AS DOUBLE))
               AS s
           FROM vocab0 v LEFT JOIN c1 c USING (piece)
         ), seg2 AS MATERIALIZED (
           ${t27SegSql("sc1")}
         ), c2 AS MATERIALIZED (
           SELECT piece, CAST(sum(n) AS BIGINT) AS c FROM seg2 GROUP BY piece
         ), totc2 AS MATERIALIZED (SELECT CAST(sum(c) AS BIGINT) AS t FROM c2)
         SELECT rk, piece, n_uses, logp FROM (
           SELECT piece, c AS n_uses,
             floor(ln(CAST(c + 1 AS DOUBLE) /
               CAST((SELECT t FROM totc2) + (SELECT v FROM tot0) AS DOUBLE))
               *1e4 + 0.5)/1e4 AS logp,
             row_number() OVER (ORDER BY c DESC, piece ASC) AS rk
           FROM c2)
         WHERE rk <= $K AND (SELECT ok FROM guard) = 1
         ORDER BY rk"""
  }

  /** t26 DuckDB replay — the engine's window fingerprint
    * (FNV-1a token hashes chained through w splitmix64 rounds,
    * [[graft.operators.TextOps.spanCoverage]]'s kernel) re-derived
    * exactly: the d04 toks CTE provides the HUGEINT token hashes and
    * the chain is UNROLLED w rounds by [[splitmixRoundSql]] — one
    * NESTED SUBQUERY LAYER per round, because DuckDB expands
    * same-SELECT lateral aliases by substitution and a 16-round chain
    * in one SELECT would blow up ~32^16 expressions (the d04 3-round
    * chain is the safe ceiling for the single-SELECT form); each
    * layer materializes its accumulator once. Duplication is
    * fingerprint-count ≥ 2 corpus-wide, coverage via the q19/q33
    * gaps-and-islands running max. Width from
    * [[graft.operators.TextOps.T26Width]]. */
  /** The shared t26/d14 window-fingerprint CTE prefix (toks → guard →
    * base → wins → dup → marked): both oracles re-derive the stride-1
    * duplicated windows identically; only the reporting tail differs
    * (coverage fraction vs maximal spans). */
  private lazy val t26MarkedCtes: String = {
    val w = graft.operators.TextOps.T26Width
    val innermost =
      s"""SELECT doc_id, th, unnest(range(1, n_tokens - $w + 2)) AS i
                   FROM base WHERE n_tokens >= $w"""
    val chained = (1 to w).foldLeft(innermost) { (inner, j) =>
      val prev = if (j == 1) "11400714819323198485::HUGEINT" else s"a${j - 1}"
      s"""SELECT doc_id, th, i,
             ${splitmixRoundSql(j, prev, s"th[CAST(i + ${j - 1} AS INT)]")}
             FROM ($inner)"""
    }
    s"""WITH toks AS (
           SELECT doc_id, list_transform(regexp_split_to_array(trim(text), '\\s+'),
             tk -> list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(string_split(tk, ''), c -> ord(c)::HUGEINT)),
               (h, c) -> (xor(h, c) * 1099511628211::HUGEINT)
                         % 18446744073709551616::HUGEINT)) AS th
           FROM documents
         ), guard AS MATERIALIZED (
           SELECT CASE WHEN max(ord(c)) > 65535
             THEN CAST(error('t26 BMP bound: non-BMP code point desyncs the fnv64 replay (UTF-16 units vs code points)') AS INT)
             ELSE 1 END AS ok
           FROM (SELECT unnest(string_split(text, '')) AS c FROM documents)
         ), base AS (
           SELECT doc_id, th, len(th) AS n_tokens FROM toks
         ), wins AS (
           SELECT doc_id, CAST(i AS INT) - 1 AS i, a$w AS fp
           FROM ($chained)
         ), dup AS (
           SELECT fp FROM wins GROUP BY fp HAVING count(*) >= 2
         ), marked AS (
           SELECT wi.doc_id, wi.i, wi.i + $w - 1 AS e
           FROM wins wi JOIN dup USING (fp)
         )"""
  }

  private lazy val t26OracleSql: String = {
    val w = graft.operators.TextOps.T26Width
    s"""$t26MarkedCtes, isl AS (
           SELECT doc_id,
             greatest(0, e - greatest(i - 1,
               coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)))
               AS contrib
           FROM marked
         ), agg AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows,
             CAST(sum(contrib) AS BIGINT) AS covered_tokens
           FROM isl GROUP BY doc_id
         )
         SELECT b.doc_id, CAST(b.n_tokens AS INT) AS n_tokens,
           CAST(greatest(b.n_tokens - ${w - 1}, 0) AS INT) AS n_windows,
           coalesce(a.n_dup_windows, 0) AS n_dup_windows,
           coalesce(a.covered_tokens, 0) AS covered_tokens,
           floor((CAST(coalesce(a.covered_tokens, 0) AS DOUBLE)
                  / CAST(b.n_tokens AS DOUBLE))*1e4 + 0.5)/1e4 AS dup_frac
         FROM base b LEFT JOIN agg a USING (doc_id)
         WHERE (SELECT ok FROM guard) = 1
         ORDER BY b.doc_id"""
  }

  /** d14 replay — the t26 fingerprint CTEs verbatim, with the span
    * tail: a window opens a new island iff a token gap precedes it
    * (start > running max end + 1, so touching windows merge), then
    * each island reports its extent. */
  private lazy val d14OracleSql: String =
    s"""$t26MarkedCtes, isl AS (
           SELECT doc_id, i, e,
             CASE WHEN i > coalesce(max(e) OVER (PARTITION BY doc_id
                 ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
               THEN 1 ELSE 0 END AS opens
           FROM marked
         ), isl2 AS (
           SELECT doc_id, i, e,
             sum(opens) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM isl)
         SELECT doc_id, CAST(island AS INT) AS span_id,
           CAST(min(i) AS INT) AS span_start,
           CAST(max(e) AS INT) AS span_end,
           CAST(max(e) - min(i) + 1 AS INT) AS span_tokens,
           CAST(count(*) AS BIGINT) AS n_windows
         FROM isl2
         WHERE (SELECT ok FROM guard) = 1
         GROUP BY doc_id, island
         ORDER BY doc_id, span_id"""

  /** t30 replay — the t18 bigram-extraction dialect with the three
    * KN count frames; the discount interpolates from
    * [[graft.operators.TextOps.T30Discount]] so engine and oracle can
    * never discount at different rates. */
  private lazy val t30OracleSql: String = {
    val d = graft.operators.TextOps.T30Discount
    s"""WITH toks AS (
           SELECT regexp_split_to_array(trim(text), '\\s+') AS tk
           FROM documents
         ), bg AS (
           SELECT tk[i] AS w1, tk[i + 1] AS w2
           FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                 FROM toks WHERE len(tk) >= 2)
         ), bgc AS (
           SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12
           FROM bg GROUP BY 1, 2
         ), ctx AS (
           SELECT w1, CAST(sum(n12) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS fwd
           FROM bgc GROUP BY 1
         ), cont AS (
           SELECT w2, CAST(count(*) AS BIGINT) AS back FROM bgc GROUP BY 1
         ), tot AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bgc
         ), scored AS (
           SELECT b.w1, b.w2, b.n12,
             floor((greatest(CAST(b.n12 AS DOUBLE) - $d, 0.0)
                 / CAST(c.c1 AS DOUBLE)
               + (($d * CAST(c.fwd AS DOUBLE)) / CAST(c.c1 AS DOUBLE))
                 * (CAST(n.back AS DOUBLE) / CAST(t.nb AS DOUBLE)))
               * 1e6 + 0.5) / 1e6 AS p_kn
           FROM bgc b JOIN ctx c USING (w1) JOIN cont n USING (w2)
           CROSS JOIN tot t)
         SELECT CAST(row_number() OVER (ORDER BY n12 DESC, w1, w2) AS INT)
             AS rk, w1, w2, n12, p_kn
         FROM scored ORDER BY n12 DESC, w1, w2 LIMIT 20"""
  }

  /** d13 replay — the deliberate ALL-PAIRS levenshtein baseline (the
    * d03 quadratic-oracle contract): the engine's delete-neighborhood
    * candidate join must reproduce the brute-force pair set exactly.
    * Dialect-portable (Spark and DuckDB both ship `levenshtein`). */
  private lazy val d13OracleSql: String = {
    val k = graft.operators.Dedup.D13MaxDist
    s"""WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer)
         SELECT a.id AS a_id, b.id AS b_id,
           a.name AS a_name, b.name AS b_name,
           CAST(levenshtein(a.name, b.name) AS INT) AS dist
         FROM c a JOIN c b ON a.id < b.id
         WHERE levenshtein(a.name, b.name) <= $k
         ORDER BY a_id, b_id"""
  }

  /** d15 replay — the incremental-admission verdicts as a brute-force
    * batch×store levenshtein (the d13 quadratic-oracle contract); the
    * split scalar replays the engine's floor(max·frac). Dialect-
    * portable. */
  private lazy val d15OracleSql: String = {
    val k = graft.operators.Dedup.D13MaxDist
    val frac = graft.operators.Dedup.D15SplitFrac
    s"""WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer),
         cut AS (SELECT CAST(floor(max(id) * $frac) AS BIGINT) AS v FROM c),
         b AS (SELECT id, name FROM c CROSS JOIN cut WHERE id >= cut.v),
         st AS (SELECT id, name FROM c CROSS JOIN cut WHERE id < cut.v),
         m AS (
           SELECT b.id, st.id AS store_id,
             CAST(levenshtein(b.name, st.name) AS INT) AS dist
           FROM b JOIN st ON levenshtein(b.name, st.name) <= $k)
         SELECT id, best_match, dist, n_matches FROM (
           SELECT id, store_id AS best_match, dist,
             row_number() OVER (PARTITION BY id ORDER BY dist, store_id)
               AS rk,
             CAST(count(*) OVER (PARTITION BY id) AS BIGINT) AS n_matches
           FROM m)
         WHERE rk = 1 ORDER BY id"""
  }

  /** t31 replay — the t26 window-fingerprint CTEs (wins = exact
    * engine fingerprints, BMP guard included) split by the x01 hash
    * rule on the doc id; train fingerprints DISTINCT, eval windows
    * LEFT-JOIN them, milli ratio on exact integer counts. */
  private lazy val t31OracleSql: String =
    s"""$t26MarkedCtes, spl AS (
           SELECT doc_id,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
                  THEN 'test'
                  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
                  THEN 'val' ELSE 'train' END AS split
           FROM documents
         ), trainfp AS (
           SELECT DISTINCT fp FROM wins JOIN spl USING (doc_id)
           WHERE split = 'train'
         ), ev AS (
           SELECT we.doc_id, we.fp FROM wins we JOIN spl USING (doc_id)
           WHERE split = 'test'
         ), rep AS (
           SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN tf.fp IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_memorized
           FROM ev e LEFT JOIN trainfp tf ON e.fp = tf.fp
           GROUP BY e.doc_id)
         SELECT doc_id, n_windows, n_memorized,
           CAST(floor(CAST(n_memorized AS DOUBLE) * 1000.0
             / CAST(n_windows AS DOUBLE) + 0.5) AS BIGINT)
             AS memorized_milli
         FROM rep
         WHERE (SELECT ok FROM guard) = 1
         ORDER BY doc_id"""

  /** d16 replay — the ONLY oracle that replays the full
    * 64-permutation minhash in SQL (d02 sidesteps it by running in
    * the band-recall-1.0 regime; d16's whole point is measuring the
    * band recall where it is NOT 1). Layout follows the t26
    * layer-per-splitmix-round lesson:
    *
    *  - `shr`: the d04 HUGEINT hashed-shingle rows (FNV-1a tokens,
    *    3-round splitmix 3-grams) — the same values the engine's
    *    [[graft.functions.Hashing.shingleHashes]] kernel emits;
    *  - `perm`: ONE layer with 64 PARALLEL one-splitmix chains
    *    (independent chains don't compound the lateral-substitution
    *    blow-up the way d04's 3 chained rounds do);
    *  - `mins`: per-doc minima taken over the SIGNED reinterpretation
    *    (the engine's `Long` compare), mapped back to unsigned bits;
    *  - `bnd0..3`: four layers of 16 parallel chains folding the band
    *    minima into the 8-byte band keys, inits/seeds single-sourced
    *    from [[graft.functions.Hashing.permSeed]]/`bandInit`;
    *  - candidates from the (band, key) self-join; ground truth from
    *    the d03 string-shingle brute force at
    *    [[graft.operators.Dedup.D16MinJaccard]]; binned recall tail.
    */
  private lazy val d16OracleSql: String = {
    val hash = graft.functions.Hashing
    val nPerm = hash.NumPerm
    val bands = hash.Bands
    val rpb = hash.RowsPerBand
    val minJ = graft.operators.Dedup.D16MinJaccard
    def u(v: Long) = java.lang.Long.toUnsignedString(v) + "::HUGEINT"
    val permChains = (0 until nPerm).map { i =>
      splitmixChainSql(i.toString, "shingle", u(hash.permSeed(i)))
    }.mkString(",\n             ")
    val minCols = (0 until nPerm).map { i =>
      s"""min(CASE WHEN a$i >= 9223372036854775808::HUGEINT
             THEN a$i - 18446744073709551616::HUGEINT ELSE a$i END) AS sm$i"""
    }.mkString(",\n             ")
    val unsignedCols = (0 until nPerm).map { i =>
      s"""CASE WHEN sm$i < 0 THEN sm$i + 18446744073709551616::HUGEINT
             ELSE sm$i END AS m$i"""
    }.mkString(",\n             ")
    val mAll = (0 until nPerm).map(i => s"m$i").mkString(", ")
    def bandLayer(r: Int): String = {
      val chains = (0 until bands).map { b =>
        val prev = if (r == 0) u(hash.bandInit(b)) else s"ab${b}r${r - 1}"
        splitmixChainSql(s"b${b}r$r", prev, s"m${b * rpb + r}")
      }.mkString(",\n             ")
      s"""SELECT doc_id, $mAll,
             $chains
           FROM ${if (r == 0) "minsu" else s"bnd${r - 1}"}"""
    }
    val keyList = (0 until bands).map(b => s"ab${b}r${rpb - 1}")
      .mkString("[", ", ", "]")
    s"""WITH toks AS (
           SELECT doc_id, list_transform(regexp_split_to_array(trim(text), '\\s+'),
             tk -> list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(string_split(tk, ''), c -> ord(c)::HUGEINT)),
               (h, c) -> (xor(h, c) * 1099511628211::HUGEINT)
                         % 18446744073709551616::HUGEINT)) AS th
           FROM documents
         ), sh_pos AS (
           SELECT doc_id, th, unnest(range(1, len(th) - 1)) AS i
           FROM toks WHERE len(th) >= 3
         ), shr AS (
           SELECT DISTINCT doc_id, a3 AS shingle FROM (
             SELECT doc_id,
               ${splitmixChainSql("1",
                   "11400714819323198485::HUGEINT", "th[CAST(i AS INT)]")},
               ${splitmixChainSql("2", "a1", "th[CAST(i + 1 AS INT)]")},
               ${splitmixChainSql("3", "a2", "th[CAST(i + 2 AS INT)]")}
             FROM sh_pos)
         ), perm AS (
           SELECT doc_id,
             $permChains
           FROM shr
         ), mins AS (
           SELECT doc_id,
             $minCols
           FROM perm GROUP BY doc_id
         ), minsu AS (
           SELECT doc_id,
             $unsignedCols
           FROM mins
         ), bnd0 AS (${bandLayer(0)}
         ), bnd1 AS (${bandLayer(1)}
         ), bnd2 AS (${bandLayer(2)}
         ), bnd3 AS (${bandLayer(3)}
         ), keys AS (
           SELECT doc_id, CAST(bb.b AS INT) AS band,
             ($keyList)[CAST(bb.b AS INT) + 1] AS key
           FROM bnd3 CROSS JOIN (SELECT unnest(range(0, $bands)) AS b) bb
         ), cand AS (
           SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           FROM keys x JOIN keys y
             ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
         ), stoks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
           FROM documents
         ), ssh AS (
           SELECT doc_id, list_distinct([array_to_string(tk[i:i+2], ' ')
             for i in range(1, len(tk)-1)]) AS shingles
           FROM stoks WHERE len(tk) >= 3
         ), truth AS (
           SELECT doc_a, doc_b, round(inter * 1.0 / uni, 4) AS jaccard FROM (
             SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.shingles, b.shingles)) AS inter,
               len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles)) AS uni
             FROM ssh a JOIN ssh b ON a.doc_id < b.doc_id)
           WHERE round(inter * 1.0 / uni, 4) >= $minJ)
         SELECT bin, n_pairs, n_caught,
           CAST(floor(CAST(n_caught AS DOUBLE) * 1000.0
             / CAST(n_pairs AS DOUBLE) + 0.5) AS BIGINT) AS recall_milli
         FROM (
           SELECT CAST(least(floor(t.jaccard * 10), 9) AS INT) AS bin,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_caught
           FROM truth t LEFT JOIN cand c
             ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
           GROUP BY 1)
         ORDER BY bin"""
  }

  /** d18 replay — ONE shared string-shingle Jaccard pair CTE at
    * min(τ), then one recursive-CC arm per swept threshold from
    * [[graft.operators.Dedup.D18Taus]] (the d05 reach CTE, suffixed
    * per arm); counts per arm. */
  private lazy val d18OracleSql: String = {
    val taus = graft.operators.Dedup.D18Taus
    def deci(t: Double) = math.floor(t * 10 + 0.5).toInt
    val parts = taus.map { tau =>
      val d = deci(tau)
      s"""e$d AS (
           SELECT doc_a AS a, doc_b AS b FROM jp WHERE j >= $tau
           UNION ALL SELECT doc_b, doc_a FROM jp WHERE j >= $tau
         ), nd$d AS (SELECT DISTINCT a AS n FROM e$d),
         r$d(n, m) AS (
           SELECT n, n FROM nd$d
           UNION
           SELECT r.n, e.b FROM r$d r JOIN e$d e ON r.m = e.a
         ), cl$d AS (SELECT n, min(m) AS cluster FROM r$d GROUP BY n)"""
    }.mkString(",\n         ")
    val arms = taus.map { tau =>
      val d = deci(tau)
      s"""SELECT $d AS tau_deci,
             (SELECT CAST(count(*) AS BIGINT) FROM jp WHERE j >= $tau)
               AS n_pairs,
             CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
             CAST(count(*) - count(DISTINCT cluster) AS BIGINT) AS n_removed
           FROM cl$d"""
    }.mkString("\n           UNION ALL\n           ")
    s"""WITH RECURSIVE vtoks AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
           FROM documents
         ), vsh AS (
           SELECT doc_id, list_distinct([array_to_string(tk[i:i+2], ' ')
             for i in range(1, len(tk)-1)]) AS shingles
           FROM vtoks WHERE len(tk) >= 3
         ), jp AS (
           SELECT doc_a, doc_b, j FROM (
             SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
                 (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))), 4) AS j
             FROM vsh a JOIN vsh b ON a.doc_id < b.doc_id)
           WHERE j >= ${taus.min}
         ), $parts
         SELECT tau_deci, n_pairs, n_clusters, n_removed FROM (
           $arms)
         ORDER BY tau_deci"""
  }

  /** t25 DuckDB replay — the CMS cell counts ARE per-(row, cell)
    * token-instance counts (the sketch is linear), so the oracle
    * recomputes them as a plain GROUP BY over the FNV token hashes
    * (d04's HUGEINT mod-2⁶⁴ replay) pushed through the multiply-shift
    * cell map (split-form 128-bit-safe multiply, then the unsigned
    * `// 2^(64-logW)` that mirrors the JVM's `>>>`). Depth, width and
    * the row multipliers are interpolated from
    * [[graft.functions.Hashing]] — the engine can never sketch at a
    * geometry the oracle doesn't recount. */
  private lazy val t25OracleSql: String = {
    val H = graft.functions.Hashing
    val shiftDiv = java.math.BigInteger.ONE.shiftLeft(64 - H.CmsLogW)
    val multRows = H.CmsMultipliers.zipWithIndex
      .map { case (a, r) => s"($r, ${java.lang.Long.toUnsignedString(a)}::HUGEINT)" }
      .mkString(", ")
    s"""WITH words AS (
           SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
           FROM documents
         ), guard AS MATERIALIZED (
           SELECT CASE WHEN max(ord(c)) > 65535
             THEN CAST(error('t25 BMP bound: non-BMP code point desyncs the fnv64 replay (UTF-16 units vs code points)') AS INT)
             ELSE 1 END AS ok
           FROM (SELECT unnest(string_split(w, '')) AS c FROM words)
         ), counts AS (SELECT w, count(*) AS n FROM words GROUP BY 1
         ), th AS (
           SELECT w, CAST(n AS BIGINT) AS n, list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(string_split(w, ''), c -> ord(c)::HUGEINT)),
               (h, c) -> (xor(h, c) * 1099511628211::HUGEINT)
                         % 18446744073709551616::HUGEINT) AS h
           FROM counts
         ), m(r, a) AS (VALUES $multRows
         ), cells AS (
           SELECT th.w, th.n, m.r,
             CAST((((th.h % 4294967296) * m.a
                 + (((th.h // 4294967296) * m.a) % 4294967296) * 4294967296)
                % 18446744073709551616::HUGEINT) // $shiftDiv AS INT) AS cell
           FROM th CROSS JOIN m
         ), cellcounts AS (
           SELECT r, cell, CAST(sum(n) AS BIGINT) AS cn
           FROM cells GROUP BY 1, 2
         ), topk AS (
           SELECT w, n, rk FROM (
             SELECT w, n, row_number() OVER (ORDER BY n DESC, w ASC) AS rk
             FROM th) WHERE rk <= 10
         )
         SELECT rk, w, n_exact, n_cms FROM (
           SELECT t.rk, t.w, t.n AS n_exact, min(cc.cn) AS n_cms
           FROM topk t
           JOIN cells c ON c.w = t.w
           JOIN cellcounts cc ON cc.r = c.r AND cc.cell = c.cell
           GROUP BY t.rk, t.w, t.n)
         WHERE (SELECT ok FROM guard) = 1
         ORDER BY rk"""
  }

  /** s26 DuckDB replay — sign-bit halves as exact integer sums of
    * powers of two (bit i set iff v[i] > 0, the engine's strict rule),
    * the d04 lo/hi xor+bit_count Hamming, row_number-over-(hamming,id)
    * shortlist (≡ the TopKPerGroup selection — the order is total),
    * then the s01 cosine re-rank restricted to the shortlist. nCand is
    * interpolated from [[graft.operators.Similarity.S26NCand]] so the
    * replay can never desync from the engine's shortlist width. */
  private lazy val s26OracleSql: String = {
    val nc = graft.operators.Similarity.S26NCand
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         sg AS (SELECT vec_id,
             CAST(list_sum(list_transform(range(1, 33),
               i -> CASE WHEN v[i] > 0 THEN CAST(2 ** (i - 1) AS BIGINT)
                    ELSE 0 END)) AS BIGINT) AS lo,
             CAST(list_sum(list_transform(range(33, 65),
               i -> CASE WHEN v[i] > 0 THEN CAST(2 ** (i - 33) AS BIGINT)
                    ELSE 0 END)) AS BIGINT) AS hi
           FROM e),
         ham AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             CAST(bit_count(xor(a.lo, q.lo)) + bit_count(xor(a.hi, q.hi)) AS INT)
               AS hamming
           FROM sg q JOIN sg a ON a.vec_id <> q.vec_id
           WHERE q.vec_id < 5),
         cand AS (
           SELECT q_id, n_id, hamming FROM (
             SELECT q_id, n_id, hamming,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY hamming ASC, n_id ASC) AS crk
             FROM ham)
           WHERE crk <= $nc),
         rr AS (
           SELECT c.q_id, c.n_id, c.hamming,
             round(list_cosine_similarity(qe.v, ae.v), 6) AS cos
           FROM cand c
           JOIN e qe ON qe.vec_id = c.q_id
           JOIN e ae ON ae.vec_id = c.n_id)
         SELECT q_id, rk, n_id, hamming, cos FROM (
           SELECT q_id, n_id, hamming, cos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, n_id ASC) AS rk
           FROM rr)
         WHERE rk <= 3 ORDER BY q_id, rk"""
  }

  /** s30 replay — the s26 Hamming-shortlist chain ranked ONCE (crk),
    * one re-rank arm per swept depth from
    * [[graft.operators.Similarity.S30Depths]], each intersected with
    * the exact top-3 truth; milli recall on integer hit counts. */
  private lazy val s30OracleSql: String = {
    val depths = graft.operators.Similarity.S30Depths
    val nPossible = 5 * 3
    val arms = depths.map { d =>
      s"""SELECT $d AS depth, CAST(count(*) AS BIGINT) AS n_hits
           FROM (
             SELECT q_id, n_id FROM (
               SELECT rr.q_id, rr.n_id,
                 row_number() OVER (PARTITION BY rr.q_id
                   ORDER BY rr.cos DESC, rr.n_id ASC) AS rk
               FROM (
                 SELECT c.q_id, c.n_id,
                   round(list_cosine_similarity(qe.v, ae.v), 6) AS cos
                 FROM (SELECT q_id, n_id FROM hamrk WHERE crk <= $d) c
                 JOIN e qe ON qe.vec_id = c.q_id
                 JOIN e ae ON ae.vec_id = c.n_id) rr)
             WHERE rk <= 3) got
           JOIN truth t ON got.q_id = t.q_id AND got.n_id = t.n_id"""
    }.mkString("\n           UNION ALL\n           ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         sg AS (SELECT vec_id,
             CAST(list_sum(list_transform(range(1, 33),
               i -> CASE WHEN v[i] > 0 THEN CAST(2 ** (i - 1) AS BIGINT)
                    ELSE 0 END)) AS BIGINT) AS lo,
             CAST(list_sum(list_transform(range(33, 65),
               i -> CASE WHEN v[i] > 0 THEN CAST(2 ** (i - 33) AS BIGINT)
                    ELSE 0 END)) AS BIGINT) AS hi
           FROM e),
         ham AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             CAST(bit_count(xor(a.lo, q.lo)) + bit_count(xor(a.hi, q.hi)) AS INT)
               AS hamming
           FROM sg q JOIN sg a ON a.vec_id <> q.vec_id
           WHERE q.vec_id < 5),
         hamrk AS (
           SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id
               ORDER BY hamming ASC, n_id ASC) AS crk
           FROM ham),
         truth AS (
           SELECT q_id, n_id FROM (
             SELECT q.vec_id AS q_id, a.vec_id AS n_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.v, a.v), 6) DESC,
                          a.vec_id ASC) AS rk
             FROM e q JOIN e a ON a.vec_id <> q.vec_id
             WHERE q.vec_id < 5)
           WHERE rk <= 3)
         SELECT depth, n_hits, CAST($nPossible AS BIGINT) AS n_possible,
           CAST(floor(CAST(n_hits AS DOUBLE) * 1000.0 / $nPossible.0 + 0.5)
             AS BIGINT) AS recall_milli
         FROM (
           $arms)
         ORDER BY depth"""
  }

  /** s31 replay — the s26 Hamming-shortlist chain ranked once (crk),
    * each shortlist candidate scored ONCE by the pinned diagonal
    * reranker w_i = 1 + (i mod 5)/10 (0-based; range(1,65) is
    * 1-based, hence (i-1)), arms filter the scored frame; truth is
    * the scorer-exact top-3. Multiplication grouping (q·w)·d and
    * sequential list_sum order match the engine's pre-weighted
    * query-tower dot; 6-dp rounding absorbs the tail. */
  private lazy val s31OracleSql: String = {
    val depths = graft.operators.Similarity.S30Depths
    val dMax = depths.max
    val nPossible = 5 * 3
    val wPeriod = graft.operators.Similarity.S31WeightPeriod
    val wDiv = graft.operators.Similarity.S31WeightDivisor
    val score = (q: String, a: String) =>
      s"""round(list_sum(list_transform(range(1, 65),
             i -> ($q.v[i] * (1.0 + CAST((i - 1) % $wPeriod AS DOUBLE) / $wDiv))
                  * $a.v[i])), 6)"""
    val arms = depths.map { d =>
      s"""SELECT $d AS depth, CAST(count(*) AS BIGINT) AS n_hits
           FROM (
             SELECT q_id, n_id FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY score DESC, n_id ASC) AS rk
               FROM sc WHERE crk <= $d)
             WHERE rk <= 3) got
           JOIN truth t ON got.q_id = t.q_id AND got.n_id = t.n_id"""
    }.mkString("\n           UNION ALL\n           ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         sg AS (SELECT vec_id,
             CAST(list_sum(list_transform(range(1, 33),
               i -> CASE WHEN v[i] > 0 THEN CAST(2 ** (i - 1) AS BIGINT)
                    ELSE 0 END)) AS BIGINT) AS lo,
             CAST(list_sum(list_transform(range(33, 65),
               i -> CASE WHEN v[i] > 0 THEN CAST(2 ** (i - 33) AS BIGINT)
                    ELSE 0 END)) AS BIGINT) AS hi
           FROM e),
         ham AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             CAST(bit_count(xor(a.lo, q.lo)) + bit_count(xor(a.hi, q.hi)) AS INT)
               AS hamming
           FROM sg q JOIN sg a ON a.vec_id <> q.vec_id
           WHERE q.vec_id < 5),
         hamrk AS (
           SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id
               ORDER BY hamming ASC, n_id ASC) AS crk
           FROM ham),
         sc AS (
           SELECT c.q_id, c.n_id, c.crk,
             ${score("qe", "ae")} AS score
           FROM (SELECT q_id, n_id, crk FROM hamrk WHERE crk <= $dMax) c
           JOIN e qe ON qe.vec_id = c.q_id
           JOIN e ae ON ae.vec_id = c.n_id),
         truth AS (
           SELECT q_id, n_id FROM (
             SELECT q.vec_id AS q_id, a.vec_id AS n_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY ${score("q", "a")} DESC,
                          a.vec_id ASC) AS rk
             FROM e q JOIN e a ON a.vec_id <> q.vec_id
             WHERE q.vec_id < 5)
           WHERE rk <= 3)
         SELECT depth, n_hits, CAST($nPossible AS BIGINT) AS n_possible,
           CAST(floor(CAST(n_hits AS DOUBLE) * 1000.0 / $nPossible.0 + 0.5)
             AS BIGINT) AS recall_milli
         FROM (
           $arms)
         ORDER BY depth"""
  }

  /** s32 replay — the s05 pinned-centroid assignment CTE feeding
    * v04's PSI tail with nBins = the quantizer's cell count; the cut
    * is floor(max(vec_id)·frac) on both sides. */
  private lazy val s32OracleSql: String = {
    val cents = graft.operators.Pinned.ivfCentroids
    val dts = centroidDotsList(cents)
    val n = cents.length
    val frac = graft.operators.Similarity.S32SplitFrac
    val binVals = (0 until n).map(i => s"($i)").mkString(",")
    val half = n / 2.0
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         n0 AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt($unrolledNorm)) AS sv FROM e),
         cutv AS (SELECT CAST(floor(max(vec_id) * $frac) AS BIGINT) AS c
                  FROM embeddings),
         b AS (SELECT CAST(list_position(dts, list_max(dts)) - 1 AS INT)
                 AS bin,
                 CASE WHEN vec_id < cutv.c THEN 1 ELSE 0 END AS is_ref
               FROM (SELECT vec_id, sv, $dts AS dts FROM n0), cutv
         ), c AS (
           SELECT bin, CAST(sum(is_ref) AS BIGINT) AS n_ref,
             CAST(sum(1 - is_ref) AS BIGINT) AS n_cur
           FROM b GROUP BY bin
         ), t AS (
           SELECT CAST(sum(is_ref) AS BIGINT) AS t_ref,
             CAST(sum(1 - is_ref) AS BIGINT) AS t_cur
           FROM b
         ), bins AS (SELECT * FROM (VALUES $binVals) AS v(bin)
         ), f AS (
           SELECT bins.bin,
             coalesce(c.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur,
             (coalesce(c.n_ref, 0) + 0.5) / (t.t_ref + $half) AS p,
             (coalesce(c.n_cur, 0) + 0.5) / (t.t_cur + $half) AS q
           FROM bins LEFT JOIN c ON bins.bin = c.bin CROSS JOIN t)
         SELECT bin, n_ref, n_cur,
           floor((p - q) * ln(p / q) * 1e6 + 0.5) / 1e6 AS psi_term,
           floor((p - q) * ln(p / q) * 1e6 + 0.5) / 1e6 < 0.01 AS stable
         FROM f ORDER BY bin"""
  }

  /** s01 DuckDB replay — extracted to a val so [[s21OracleSql]] can
    * compose it as the ground-truth side of the recall evaluation. */
  private lazy val s01OracleSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             round(list_cosine_similarity(q.v, a.v), 6) AS cos
           FROM e q JOIN e a ON a.vec_id <> q.vec_id
           WHERE q.vec_id < 5)
         SELECT q_id, rk, n_id, cos FROM (
           SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY q_id, rk"""

  /** s21: the recall replay IS the two member replays — the exact
    * [[s01OracleSql]] and approximate [[s04OracleSql]] statements as
    * derived tables (each carries its own WITH; k = 3 mirrors both) —
    * joined on (query, neighbor) and reduced to hits per query. */
  private lazy val s21OracleSql: String =
    s"""WITH hits AS (
           SELECT bf.q_id, count(*) AS n_hits
           FROM ($s01OracleSql) bf
           JOIN ($s04OracleSql) iv
             ON iv.q_id = bf.q_id AND iv.n_id = bf.n_id
           GROUP BY bf.q_id
         ), qs AS (SELECT DISTINCT q_id FROM ($s01OracleSql))
         SELECT q_id,
           CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
           floor((CAST(coalesce(n_hits, 0) AS DOUBLE) / 3.0)*1e4 + 0.5)/1e4
             AS recall
         FROM qs LEFT JOIN hits USING (q_id) ORDER BY q_id"""

  /** s25 tail shared by both dialects: graded gains from the exact
    * ranking, MRR + nDCG with the ENGINE'S discount/ideal doubles
    * interpolated verbatim (Similarity.ndcgDiscount/ndcgIdeal). */
  private[graft] def rankEvalTailSql(bfSql: String, ivSql: String): String = {
    val k = 3
    val gains = (1 to k).map(i =>
      s"max(CASE WHEN ap_rk = $i THEN gain END) AS g$i").mkString(",\n             ")
    val dcg = (1 to k).map(i =>
      s"CAST(coalesce(g$i, 0) AS DOUBLE)*${Similarity.ndcgDiscount(i)}")
      .mkString(" + ")
    s"""WITH j AS (
           SELECT iv.q_id, iv.rk AS ap_rk,
             coalesce(${k + 1} - bf.rk, 0) AS gain,
             CASE WHEN bf.rk = 1 THEN iv.rk END AS t1
           FROM ($ivSql) iv LEFT JOIN ($bfSql) bf
             ON bf.q_id = iv.q_id AND bf.n_id = iv.n_id
         ), per AS (
           SELECT q_id,
             $gains,
             min(t1) AS t1pos
           FROM j GROUP BY q_id)
         SELECT q_id,
           floor(coalesce(CAST(1 AS DOUBLE) / t1pos, 0.0)*1e4 + 0.5)/1e4
             AS mrr,
           floor((($dcg) / ${Similarity.ndcgIdeal(k)})*1e4 + 0.5)/1e4
             AS ndcg
         FROM per ORDER BY q_id"""
  }

  /** s25: MRR/nDCG replay over the s01 (exact) and s04 (IVF) member
    * replays as derived tables — the s21 composition. */
  private lazy val s25OracleSql: String =
    rankEvalTailSql(s01OracleSql, s04OracleSql)

  /** `Σ v[d]²` unrolled — the L2 norm both ANN oracles divide by,
    * in the codegen'd dot's sequential order. */
  private lazy val unrolledNorm: String =
    (1 to 64).map(d => s"v[$d]*v[$d]").mkString(" + ")

  /** Unrolled per-centroid dot list over the normalized vector `sv` —
    * the shared assignment/probe arithmetic of s05/s10/s14 (one term
    * order for all three, the codegen'd dot's sequential order). */
  private def centroidDotsList(cents: Array[Array[Double]]): String =
    cents.map { c =>
      s"(${c.indices.map(d => s"sv[${d + 1}]*(${c(d)})").mkString(" + ")})"
    }.mkString("[", ",\n             ", "]")

  /** The d05-class connected-components tail shared by d09/s14: edges
    * from a `pairs(id_a, id_b)` CTE, reach/min recursive closure,
    * (vec_id, cluster) out. Callers must open WITH RECURSIVE. */
  private val ccTailSql: String =
    s"""edges AS (
           SELECT id_a AS a, id_b AS b FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         nodes AS (SELECT DISTINCT a AS n FROM edges),
         reach(n, m) AS (
           SELECT n, n FROM nodes
           UNION
           SELECT r.n, e2.b FROM reach r JOIN edges e2 ON r.m = e2.a)
         SELECT n AS vec_id, min(m) AS cluster FROM reach
         GROUP BY n ORDER BY vec_id"""

  /** s05: pinned-centroid k-means IVF — cell = first-max argmax over
    * 8 unrolled centroid dots (ties to the lower index, same as
    * array_position), probe the query's own cell (nprobe=1), exact
    * re-rank. */
  private lazy val s05OracleSql: String = {
    val dts = centroidDotsList(Pinned.ivfCentroids)
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt($unrolledNorm)) AS sv FROM e),
         asg AS (SELECT vec_id, sv, list_position(dts, list_max(dts)) - 1 AS c
                 FROM (SELECT vec_id, sv, $dts AS dts FROM n)),
         scored AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id,
             round(${(1 to 64).map(d => s"q.sv[$d]*a.sv[$d]").mkString(" + ")}, 6) AS cos
           FROM asg a JOIN asg q ON a.c = q.c AND a.vec_id <> q.vec_id
           WHERE q.vec_id < 5)
         SELECT q_id, rk, n_id, cos FROM (
           SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY q_id, rk"""
  }

  /** x14: nearest pinned cell (the s05 argmax arithmetic, ties to the
    * lower index) + the x13-style deterministic md5 pick, ranked per
    * cell — cluster-balanced sampling. */
  private lazy val x14OracleSql: String = {
    val dts = centroidDotsList(Pinned.ivfCentroids)
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt($unrolledNorm)) AS sv FROM e),
         asg AS (SELECT vec_id,
                 CAST(list_position(dts, list_max(dts)) - 1 AS INT) AS cell,
                 md5(CAST(vec_id AS VARCHAR)) AS pick
               FROM (SELECT vec_id, sv, $dts AS dts FROM n))
         SELECT cell, rk, vec_id FROM (
           SELECT cell, vec_id,
             CAST(row_number() OVER (PARTITION BY cell
               ORDER BY pick ASC, vec_id ASC) AS BIGINT) AS rk
           FROM asg)
         WHERE rk <= ${Sampling.X14PerCell} ORDER BY cell, rk"""
  }

  // --- shared builders for the PQ-family oracles (s09/s10/s11/s13) ---

  /** Per-subspace encode scores over vector column `vc` (optionally
    * with per-element expressions via `elem`): 2⟨x_j, B_jc⟩ − ‖B_jc‖²,
    * the ‖·‖² constants baked with the same sequential sum the engine
    * uses. */
  private def pqScoreCols(books: Array[Array[Array[Double]]], sub: Int,
                          elem: (Int) => String): String = {
    def scores(j: Int): String = books(j).map { c =>
      val n2 = c.map(x => x * x).sum
      val d = c.indices.map(i => s"${elem(j * sub + i + 1)}*(${c(i)})").mkString(" + ")
      s"2.0*($d) - ($n2)"
    }.mkString("[", ",\n             ", "]")
    books.indices.map(j => s"${scores(j)} AS s$j").mkString(",\n           ")
  }

  private def pqCodesList(m: Int): String =
    (0 until m).map(j => s"list_position(s$j, list_max(s$j)) - 1")
      .mkString("[", ", ", "]")

  /** Query-side ADC lookup table: lut[j][c] = ⟨q_sub_j, B_jc⟩ with the
    * engine's centroid-first product order. */
  private def pqLutList(books: Array[Array[Array[Double]]], sub: Int,
                        vc: String): String = {
    def lutJ(j: Int): String = books(j).map { c =>
      s"(${c.indices.map(i => s"(${c(i)})*$vc[${j * sub + i + 1}]").mkString(" + ")})"
    }.mkString("[", ",\n             ", "]")
    books.indices.map(lutJ).mkString("[", ",\n           ", "]")
  }

  /** ADC sum: m LUT picks folded in subspace order (the fold starts at
    * 0.0, so the plain left-associative chain matches it exactly). */
  private def pqApprox(m: Int): String =
    (1 to m).map(j => s"q.lut[$j][c.codes[$j]+1]").mkString(" + ")

  /** Shared tail: top-`rerank` ADC candidates per query, exact-dot
    * re-rank over vector column `vc` of CTE `n`, top-3. */
  private def pqRerankTail(rerank: Int, vc: String): String =
    s"""cand AS (SELECT q_id, n_id FROM (
           SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id ORDER BY approx DESC, n_id ASC) AS crk
           FROM scored) WHERE crk <= $rerank),
         ex AS (
           SELECT cand.q_id, cand.n_id,
             round(${(1 to 64).map(d => s"qn.$vc[$d]*an.$vc[$d]").mkString(" + ")}, 6) AS cos
           FROM cand
           JOIN n an ON an.vec_id = cand.n_id
           JOIN n qn ON qn.vec_id = cand.q_id)
         SELECT q_id, rk, n_id, cos FROM (
           SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
           FROM ex)
         WHERE rk <= 3 ORDER BY q_id, rk"""

  /** s09: pinned-codebook PQ-ADC — encode = per-subspace first-max
    * argmax of the score list, ADC = 8 LUT picks summed in subspace
    * order, top-100 re-rank by the exact dot. */
  private lazy val s09OracleSql: String = {
    val books = Pinned.pq.books
    val sub = Pinned.pq.sub
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt($unrolledNorm)) AS sv FROM e),
         enc AS (SELECT vec_id,
           ${pqScoreCols(books, sub, i => s"sv[$i]")}
           FROM n),
         codes AS (SELECT vec_id, ${pqCodesList(books.length)} AS codes FROM enc),
         q AS (SELECT vec_id AS q_id,
           ${pqLutList(books, sub, "sv")} AS lut
           FROM n WHERE vec_id < 5),
         scored AS (
           SELECT q.q_id, c.vec_id AS n_id, ${pqApprox(books.length)} AS approx
           FROM codes c CROSS JOIN q WHERE c.vec_id <> q.q_id),
         ${pqRerankTail(rerank = 100, vc = "sv")}"""
  }

  /** s10: pinned IVFADC — coarse cell by first-max argmax over plain
    * centroid dots, PQ codes over the RESIDUAL (sv − centroid, inlined
    * per term), queries probe their top-3 cells (dot desc, index asc),
    * approx = ⟨q, centroid⟩ + ADC (parenthesized so the fold order
    * matches the engine's q_dot_cent + Σ), top-50 exact re-rank. */
  private lazy val s10OracleSql: String = {
    val mdl = Pinned.ivfPq
    val cents = mdl.coarse.get
    val books = mdl.books
    val sub = mdl.sub
    val centsLit = cents.map(c => s"[${c.mkString(", ")}]").mkString("[", ",\n             ", "]")
    val dts = centroidDotsList(cents)
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt($unrolledNorm)) AS sv FROM e),
         cl AS (SELECT $centsLit AS cl),
         asg AS (SELECT vec_id, sv, list_position(dts, list_max(dts)) - 1 AS c
                 FROM (SELECT vec_id, sv, $dts AS dts FROM n)),
         enc AS (SELECT a.vec_id, a.c,
           ${pqScoreCols(books, sub, i => s"(a.sv[$i] - cl.cl[a.c+1][$i])")}
           FROM asg a CROSS JOIN cl),
         codes AS (SELECT vec_id, c, ${pqCodesList(books.length)} AS codes FROM enc),
         qd AS (SELECT vec_id AS q_id, $dts AS qdts,
           ${pqLutList(books, sub, "sv")} AS lut
           FROM n WHERE vec_id < 5),
         probes AS (SELECT q_id, c, q_dot_cent, lut FROM (
           SELECT q_id, lut,
             generate_subscripts(qdts, 1) - 1 AS c,
             unnest(qdts) AS q_dot_cent FROM qd) p
           QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY q_dot_cent DESC, c ASC) <= 3),
         scored AS (
           SELECT q.q_id, c.vec_id AS n_id,
             q.q_dot_cent + (${pqApprox(books.length)}) AS approx
           FROM codes c JOIN probes q ON c.c = q.c AND c.vec_id <> q.q_id),
         ${pqRerankTail(rerank = 50, vc = "sv")}"""
  }

  /** s13: pinned OPQ — project onto the pinned 64-dim rotation, deal
    * the rotated dimensions round-robin into subspaces (rv[p] is
    * rotated dim d = (p−1 mod 8)·8 + (p−1) div 8 — the dealing
    * permutation is an involution), then the s09 machinery over the
    * rotated frame, exact re-rank in rotated coordinates (inner
    * products are rotation-invariant mathematically; float-wise the
    * engine re-ranks in rotated coords, so the oracle does too). */
  private lazy val s13OracleSql: String = {
    val rot = Pinned.opqRotation
    val books = Pinned.opqBooks.books
    val sub = Pinned.opqBooks.sub
    val m = books.length
    val rv = (1 to 64).map { p =>
      val d = ((p - 1) % m) * sub + (p - 1) / m
      s"(${(1 to 64).map(k => s"sv[$k]*(${rot(d)(k - 1)})").mkString(" + ")})"
    }.mkString("[", ",\n             ", "]")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         n0 AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt($unrolledNorm)) AS sv FROM e),
         n AS (SELECT vec_id, $rv AS rv FROM n0),
         enc AS (SELECT vec_id,
           ${pqScoreCols(books, sub, i => s"rv[$i]")}
           FROM n),
         codes AS (SELECT vec_id, ${pqCodesList(m)} AS codes FROM enc),
         q AS (SELECT vec_id AS q_id,
           ${pqLutList(books, sub, "rv")} AS lut
           FROM n WHERE vec_id < 5),
         scored AS (
           SELECT q.q_id, c.vec_id AS n_id, ${pqApprox(m)} AS approx
           FROM codes c CROSS JOIN q WHERE c.vec_id <> q.q_id),
         ${pqRerankTail(rerank = 100, vc = "rv")}"""
  }

  /** t13: the 8-round BPE training loop unrolled — round r counts
    * weighted adjacent symbol pairs over the vocabulary AS ENCODED BY
    * merges 1..r−1 (each applied by a recursive replace-first CTE, the
    * t14 equivalence), takes the (count DESC, a, b) argmax as merge r,
    * and feeds the re-encoded vocabulary forward. The merge scalars
    * flow between rounds as 1-row CTE cross joins, so the oracle
    * re-derives the training trajectory from the raw corpus — the one
    * iterative-stateful query in the suite, expressed as SQL by
    * unrolling its fixed iteration count. */
  private lazy val t13OracleSql: String = {
    val rounds = (1 to 8).map { r =>
      val prev = s"enc${r - 1}"
      s"""cnt$r AS (
           SELECT sy[i] AS a, sy[i+1] AS b, CAST(sum(freq) AS BIGINT) AS n FROM (
             SELECT freq, sy, unnest(range(1, len(sy))) AS i FROM (
               SELECT freq, string_split(trim(s), ' ') AS sy FROM $prev))
           GROUP BY 1, 2),
         m$r AS (SELECT a, b, n FROM cnt$r ORDER BY n DESC, a ASC, b ASC LIMIT 1),
         enc${r}r(word, freq, s) AS (
           SELECT word, freq, s FROM $prev
           UNION ALL
           SELECT e.word, e.freq,
             substr(e.s, 1, strpos(e.s, ' '||m.a||' '||m.b||' ') - 1) ||
             ' '||m.a||m.b||' ' ||
             substr(e.s, strpos(e.s, ' '||m.a||' '||m.b||' ') + length(' '||m.a||' '||m.b||' '))
           FROM enc${r}r e, m$r m
           WHERE strpos(e.s, ' '||m.a||' '||m.b||' ') > 0),
         enc$r AS (SELECT e.word, e.freq, e.s FROM enc${r}r e, m$r m
           WHERE strpos(e.s, ' '||m.a||' '||m.b||' ') = 0)"""
    }.mkString(",\n         ")
    val out = (1 to 8).map(r =>
      s"""SELECT CAST($r AS BIGINT) AS rank, a AS "left", b AS "right",
              a || b AS merged, n FROM m$r""")
      .mkString("\n         UNION ALL ")
    s"""WITH RECURSIVE
         words AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
                   FROM documents),
         vocab AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM words GROUP BY word),
         enc0 AS (SELECT word, freq,
           ' ' || array_to_string(string_split(word, ''), ' ') || ' </w> ' AS s
           FROM vocab),
         $rounds
         SELECT * FROM ($out) ORDER BY rank"""
  }

  /** s14: pinned-cell SemDeDup — every vector probes its top-2 cells
    * by centroid dot (ties to the lower index, matching the engine's
    * struct(-dot, i) sort), vectors sharing a probed cell pair up,
    * exact-cosine filter at 0.4, then the d05-class recursive-CTE CC.
    * Valid while every cell stays below cellCap — asserted in-query by
    * the cap guard (the capped regime is spec-pinned, not oracled). */
  private lazy val s14OracleSql: String = {
    val dts = centroidDotsList(Pinned.semCells)
    s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt($unrolledNorm)) AS sv FROM e),
         dd AS (SELECT vec_id, $dts AS dts FROM n),
         probes AS (SELECT vec_id, c FROM (
           SELECT vec_id,
             generate_subscripts(dts, 1) - 1 AS c,
             unnest(dts) AS d FROM dd) p
           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, c ASC) <= 2),
         ${capGuardCte("s14",
           "SELECT count(*) AS cnt FROM probes GROUP BY c")},
         pairs AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM probes a JOIN probes b
             ON a.c = b.c AND a.vec_id < b.vec_id
           JOIN e ea ON ea.vec_id = a.vec_id
           JOIN e eb ON eb.vec_id = b.vec_id
           CROSS JOIN guard
           WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.4),
         $ccTailSql"""
  }

  /** d09 = multi-table LSH pairs + connected components: the pair CTE
    * is the 12-table OR-construction, the CC tail is the d05 oracle's
    * reach/min recursive CTE over the pair edges; per-(table, bucket)
    * sizes asserted under the engine cap by the guard. */
  private lazy val d09OracleSql: String =
    s"""WITH RECURSIVE ${lshBucketsCte(nTables = 12, nPlanes = 8)},
         ${capGuardCte("d09",
           "SELECT count(*) AS cnt FROM buckets GROUP BY tb, bucket")},
         pairs AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM buckets a JOIN buckets b
             ON a.tb = b.tb AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           JOIN e ea ON ea.vec_id = a.vec_id
           JOIN e eb ON eb.vec_id = b.vec_id
           CROSS JOIN guard
           WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.4),
         $ccTailSql"""

  /** SPARK-dialect SQL text for operators whose DuckDB oracle uses
    * dialect-specific constructs (regexp_split_to_array, list
    * comprehensions, quantile_cont, strftime, `//`, the 'g' regexp
    * flag, …) and therefore can't run verbatim through `spark.sql`.
    *
    * This is the "delegated SQL" surface the reference hands to
    * BigQuery (README.md:2), re-expressed in Spark SQL: SqlParitySpec
    * proves every entry yields a frame IDENTICAL to the DataFrame-API
    * form on the same session (same views, same custom functions —
    * `graft_dot` via GraftExtensions, `window()` as a SQL grouping
    * function). Together with the 23 dialect-portable oracles that run
    * verbatim, this puts the whole t/x/d/s text surface plus the
    * windowed-event and percentile/pivot/grouping-set warehouse
    * queries behind plain SQL text. */
  def sparkSql: Map[String, String] = Map(
    "t01_token_counts" ->
      """SELECT doc_id,
           size(split(trim(text), '\\s+')) AS n_tokens,
           size(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0)) AS n_subwords,
           length(text) AS n_text_chars
         FROM documents ORDER BY doc_id""",
    "t02_quality_score" ->
      """WITH f AS (
           SELECT doc_id,
             CAST(size(split(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
             CAST(size(filter(split(trim(text), '\\s+'),
               x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS n_stop,
             CAST(length(regexp_replace(text, '\\s+', '')) AS DOUBLE) AS n_nonspace,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS DOUBLE) AS n_alpha,
             CAST(length(text) AS DOUBLE) AS n_chars
           FROM documents)
         SELECT doc_id,
           floor((n_stop / n_tok)*1e4 + 0.5)/1e4 AS stop_ratio,
           floor((n_nonspace / n_tok)*1e4 + 0.5)/1e4 AS mean_tok_len,
           floor((n_alpha / n_chars)*1e4 + 0.5)/1e4 AS alpha_ratio,
           floor((least(1.0, n_tok/20.0)*0.4
                 + least(1.0, (n_stop/n_tok)*5.0)*0.3
                 + (CASE WHEN n_nonspace/n_tok BETWEEN 3.0 AND 10.0
                         THEN 1.0 ELSE 0.0 END)*0.3)*1e4 + 0.5)/1e4 AS quality
         FROM f ORDER BY doc_id""",
    "t03_lang_id" ->
      """WITH f AS (
           SELECT lang,
             CASE WHEN CAST(size(filter(split(trim(text), '\\s+'),
                    x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                  / size(split(trim(text), '\\s+')) >= 0.05
                  THEN 'en' ELSE 'unk' END AS lang_pred
           FROM documents)
         SELECT lang, lang_pred, count(*) AS n FROM f
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "t04_fingerprint" ->
      """SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' '))) AS fp
         FROM documents ORDER BY doc_id""",
    "t05_top_bigrams" ->
      """WITH toks AS (
           SELECT lang, split(trim(text), '\\s+') AS tk FROM documents
         ), bg AS (
           SELECT lang, explode(transform(sequence(1, size(tk) - 1),
             i -> array_join(slice(tk, i, 2), ' '))) AS bigram
           FROM toks WHERE size(tk) >= 2
         ), counts AS (
           SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2)
         SELECT lang, rk, bigram, n FROM (
           SELECT lang, bigram, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, bigram ASC) AS rk
           FROM counts)
         WHERE rk <= 5 ORDER BY lang, rk""",
    "t06_repetition" ->
      """WITH ex AS (
           SELECT doc_id, explode(split(trim(text), '\\s+')) AS tok
           FROM documents
         ), cnt AS (
           SELECT doc_id, tok, count(*) AS n FROM ex GROUP BY 1, 2)
         SELECT doc_id,
           sum(n) AS n_tokens,
           count(*) AS n_distinct,
           floor((1.0 - count(*) / CAST(sum(n) AS DOUBLE))*1e4 + 0.5)/1e4
             AS dup_ratio,
           floor((max(n) / CAST(sum(n) AS DOUBLE))*1e4 + 0.5)/1e4
             AS top_tok_frac
         FROM cnt GROUP BY doc_id ORDER BY doc_id""",
    "t07_pii_scrub" ->
      """SELECT doc_id,
           size(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|[0-9]{7,}|\\b(?i:customer|supplier)\\b',
             0)) AS n_redacted,
           length(text) AS n_chars_before,
           length(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|[0-9]{7,}|\\b(?i:customer|supplier)\\b',
             '[REDACTED]')) AS n_chars_after
         FROM documents ORDER BY doc_id""",
    "t08_gopher_rules" ->
      """WITH f AS (
           SELECT lang,
             CAST(size(split(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
             CAST(length(regexp_replace(text, '\\s+', '')) AS DOUBLE) AS n_nospace,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS DOUBLE) AS n_alpha,
             CAST(length(text) AS DOUBLE) AS n_chars,
             size(filter(split(trim(text), '\\s+'),
               w -> w IN ('the','a','of','and','to','in','is'))) AS n_stop
           FROM documents
         ), g AS (
           SELECT lang,
             NOT (n_tok BETWEEN 30.0 AND 50000.0) AS fail_len,
             NOT (n_nospace / n_tok BETWEEN 2.0 AND 10.0) AS fail_tok,
             n_stop < 2 AS fail_stop,
             n_alpha / n_chars < 0.6 AS fail_alpha
           FROM f)
         SELECT lang, count(*) AS n_docs,
           sum(CASE WHEN fail_len THEN 1 ELSE 0 END) AS n_fail_len,
           sum(CASE WHEN fail_tok THEN 1 ELSE 0 END) AS n_fail_tok,
           sum(CASE WHEN fail_stop THEN 1 ELSE 0 END) AS n_fail_stop,
           sum(CASE WHEN fail_alpha THEN 1 ELSE 0 END) AS n_fail_alpha,
           sum(CASE WHEN NOT fail_len AND NOT fail_tok AND NOT fail_stop
                    AND NOT fail_alpha THEN 1 ELSE 0 END) AS n_pass
         FROM g GROUP BY lang ORDER BY lang""",
    "t09_chunk_windows" ->
      """WITH toks AS (
           SELECT doc_id, split(trim(text), '\\s+') AS tk FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(size(tk) - 32, 0) + 23) / 24.0) AS INT) AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, explode(sequence(0, nc - 1)) AS i FROM meta)
         SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           CAST(size(slice(tk, i*24 + 1, 32)) AS BIGINT) AS n_chunk_tokens,
           array_join(slice(tk, i*24 + 1, 32), ' ') AS chunk_text
         FROM ex ORDER BY doc_id, chunk_id""",
    "x01_split_counts" ->
      """SELECT lang,
           CASE WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < '0d' THEN 'test'
                WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < '1a' THEN 'val'
                ELSE 'train' END AS split,
           count(*) AS n
         FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    "x02_stratified_sample" ->
      """SELECT lang, doc_id, n_chars FROM (
           SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS STRING)) ASC, doc_id ASC) AS rk
           FROM documents)
         WHERE rk <= 3 ORDER BY lang, doc_id""",
    "x03_token_shards" ->
      """WITH d AS (
           SELECT lang, doc_id,
             CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS STRING)) AS hk
           FROM documents
         ), c AS (
           SELECT lang, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY hk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM d)
         SELECT lang, (cum - n_tokens) div 2000 AS shard,
           count(*) AS n_docs, sum(n_tokens) AS shard_tokens
         FROM c GROUP BY 1, 2 ORDER BY 1, 2""",
    "x05_decontaminate" ->
      """WITH toks AS (
           SELECT doc_id,
             substring(md5(CAST(doc_id AS STRING)), 1, 2) AS bucket,
             split(trim(text), '\\s+') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id, bucket,
             array_distinct(transform(sequence(1, size(tk) - 2),
               i -> array_join(slice(tk, i, 3), ' '))) AS shingles
           FROM toks WHERE size(tk) >= 3
         ), test_sh AS (
           SELECT DISTINCT explode(shingles) AS shingle
           FROM sh WHERE bucket < '0d'
         ), train AS (
           SELECT doc_id, CAST(size(shingles) AS BIGINT) AS n_shingles,
             explode(shingles) AS shingle
           FROM sh WHERE bucket >= '1a')
         SELECT t.doc_id,
           count(*) AS n_contaminated,
           n_shingles,
           floor((count(*) / CAST(n_shingles AS DOUBLE))*1e4 + 0.5)/1e4
             AS contamination
         FROM train t JOIN test_sh USING (shingle)
         GROUP BY t.doc_id, n_shingles ORDER BY t.doc_id""",
    "x16_fuzzy_decontaminate" ->
      s"""WITH toks AS (
           SELECT doc_id,
             substring(md5(CAST(doc_id AS STRING)), 1, 2) AS bucket,
             split(trim(text), '\\\\s+') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id, bucket,
             array_distinct(transform(sequence(1, size(tk) - 2),
               i -> array_join(slice(tk, i, 3), ' '))) AS shingles
           FROM toks WHERE size(tk) >= 3
         ), m AS (
           SELECT t.doc_id AS doc_id, b.doc_id AS bench_id,
             round(size(array_intersect(t.shingles, b.shingles)) * 1.0
               / (size(t.shingles) + size(b.shingles)
                  - size(array_intersect(t.shingles, b.shingles))), 4)
               AS jaccard
           FROM sh t JOIN sh b ON t.bucket >= '1a' AND b.bucket < '0d'
         ), f AS (
           SELECT * FROM m
           WHERE jaccard >= ${graft.operators.Dedup.X16Threshold}
         )
         SELECT doc_id, bench_id, jaccard, n_matches FROM (
           SELECT doc_id, bench_id, jaccard,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY jaccard DESC, bench_id ASC) AS rk,
             count(*) OVER (PARTITION BY doc_id) AS n_matches
           FROM f)
         WHERE rk = 1 ORDER BY doc_id""",
    "x06_range_shards" ->
      """WITH o AS (
           SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders
         ), b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM o)
         SELECT (cents - mn) * 8 div (mx - mn + 1) AS shard,
           count(*) AS n_orders,
           min(cents) AS min_cents, max(cents) AS max_cents
         FROM o CROSS JOIN b GROUP BY 1 ORDER BY 1""",
    "x07_proportional_sample" ->
      """WITH r AS (
           SELECT lang, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS STRING)) ASC, doc_id ASC) AS rk,
             count(*) OVER (PARTITION BY source) AS n_stratum
           FROM documents)
         SELECT lang, source, count(*) AS n FROM r
         WHERE rk <= ceil(n_stratum * 0.2)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "x08_temperature_mix" ->
      """WITH r AS (
           SELECT source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS STRING)) ASC, doc_id ASC) AS rk,
             count(*) OVER (PARTITION BY source) AS n
           FROM documents
         ), samp AS (
           SELECT source, count(*) AS n_sampled FROM r
           WHERE rk <= least(n, CAST(ceil(4.0 * sqrt(n)) AS BIGINT))
           GROUP BY source
         ), tot AS (
           SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
         SELECT source, n_docs, n_sampled
         FROM tot JOIN samp USING (source) ORDER BY source""",
    "x09_domain_caps" ->
      """SELECT source, doc_id FROM (
           SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS STRING)) ASC, doc_id ASC) AS rk
           FROM documents)
         WHERE rk <= 20 ORDER BY source, doc_id""",
    "x10_pack_sequences" ->
      raw"""WITH n AS (
           SELECT doc_id,
             CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS n_tokens
           FROM documents
         ), c AS (
           SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS start_tok
           FROM n)
         SELECT doc_id, n_tokens, start_tok,
           start_tok div ${Sampling.X22Budget} AS seq_first,
           ((start_tok + n_tokens - 1) div ${Sampling.X22Budget})
             - (start_tok div ${Sampling.X22Budget})
             + CAST(1 AS BIGINT) AS n_seqs,
           start_tok % ${Sampling.X22Budget} AS pos_in_seq
         FROM c ORDER BY doc_id""",
    "x11_dsir_weights" ->
      """WITH w AS (
           SELECT doc_id, lang, explode(split(trim(text), '\\s+')) AS wd
           FROM documents
         ), fb AS (
           SELECT doc_id, (lang = 'en') AS is_target,
             substring(md5(wd), 1, 2) AS f
           FROM w
         ), buckets AS (
           SELECT f, count(*) AS n_raw,
             sum(CASE WHEN is_target THEN CAST(1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END) AS n_tgt
           FROM fb GROUP BY 1
         ), tot AS (
           SELECT CAST(sum(n_raw) AS DOUBLE) AS r_total,
             CAST(sum(n_tgt) AS DOUBLE) AS t_total
           FROM buckets
         ), lam AS (
           SELECT f,
             CAST(floor(ln(((CAST(n_tgt AS DOUBLE) + 0.5) / (t_total + 128.0))
               / ((CAST(n_raw AS DOUBLE) + 0.5) / (r_total + 128.0)))*1e6 + 0.5)
               AS BIGINT) AS lam_micro
           FROM buckets CROSS JOIN tot
         ), dc AS (
           SELECT doc_id, f, count(*) AS c FROM fb GROUP BY 1, 2)
         SELECT doc_id, sum(c) AS n_tokens,
           sum(c * lam_micro) AS weight_micro
         FROM dc JOIN lam USING (f)
         GROUP BY doc_id ORDER BY doc_id""",
    "x12_curriculum_bins" ->
      """WITH f AS (
           SELECT doc_id,
             CAST(size(split(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
             CAST(size(filter(split(trim(text), '\\s+'),
               x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
               AS n_stop,
             CAST(length(regexp_replace(text, '\\s+', '')) AS DOUBLE)
               AS n_nonspace
           FROM documents
         ), q AS (
           SELECT doc_id,
             floor((least(1.0, n_tok/20.0)*0.4
                   + least(1.0, (n_stop/n_tok)*5.0)*0.3
                   + (CASE WHEN n_nonspace/n_tok BETWEEN 3.0 AND 10.0
                           THEN 1.0 ELSE 0.0 END)*0.3)*1e4 + 0.5)/1e4
               AS quality
           FROM f
         ), r AS (
           SELECT doc_id, quality,
             CAST(row_number() OVER (ORDER BY quality, doc_id) AS BIGINT)
               AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n
           FROM q)
         SELECT doc_id, quality, rk, ((rk - 1) * 4) div n AS bin
         FROM r ORDER BY doc_id""",
    "x13_weighted_sample" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(size(split(trim(text), '\\s+')) AS BIGINT) AS w,
             (CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 13), 16, 10)
                AS BIGINT) + 1) / 4503599627370496.0 AS u
           FROM documents
         ), k AS (
           SELECT doc_id, w,
             floor((ln(u) / w)*1e9 + 0.5)/1e9 AS sk
           FROM d WHERE w > 0)
         SELECT rk, doc_id, w, sk FROM (
           SELECT doc_id, w, sk,
             CAST(row_number() OVER (ORDER BY sk DESC, doc_id ASC) AS BIGINT)
               AS rk
           FROM k)
         WHERE rk <= 50 ORDER BY rk""",
    "t22_blocklist_filter" ->
      s"""WITH f AS (
           SELECT doc_id,
             CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS n_tokens,
             CAST(size(filter(split(trim(text), '\\\\s+'),
                 x -> x IN ($t22TermsSql))) AS BIGINT) AS n_flagged
           FROM documents)
         SELECT doc_id, n_tokens, n_flagged,
           floor((n_flagged / CAST(n_tokens AS DOUBLE))*1e4 + 0.5)/1e4
             AS flagged_frac,
           (floor((n_flagged / CAST(n_tokens AS DOUBLE))*1e4 + 0.5)/1e4
             < ${TextOps.BlocklistMaxFrac})
             AS keep
         FROM f ORDER BY doc_id""",
    "t24_incremental_boilerplate" ->
      s"""WITH toks AS (
           SELECT doc_id, split(trim(text), '\\\\s+') AS tk FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(size(tk) - 32, 0) + 31) / 32.0) AS INT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, explode(sequence(0, nc - 1)) AS i FROM meta
         ), ck AS (
           SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
             array_join(slice(tk, i*32 + 1, 32), ' ') AS chunk_text
           FROM ex
         ), boiler AS (
           SELECT chunk_text FROM ck GROUP BY chunk_text HAVING count(*) >= 2
         ), v AS (
           SELECT c.doc_id, c.chunk_id, c.chunk_text,
             (b.chunk_text IS NULL) AS keep
           FROM ck c LEFT JOIN boiler b ON c.chunk_text = b.chunk_text
           WHERE c.doc_id >= ${graft.operators.TextOps.T24SplitAt})
         SELECT doc_id, count(*) AS n_chunks,
           count(CASE WHEN keep THEN 1 END) AS n_kept,
           array_join(
             transform(
               array_sort(collect_list(
                 CASE WHEN keep THEN struct(chunk_id, chunk_text) END)),
               c -> c.chunk_text),
             ' ') AS clean_text
         FROM v GROUP BY doc_id ORDER BY doc_id""",
    "t23_boilerplate_scrub" ->
      """WITH toks AS (
           SELECT doc_id, split(trim(text), '\\s+') AS tk FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(size(tk) - 32, 0) + 31) / 32.0) AS INT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, explode(sequence(0, nc - 1)) AS i FROM meta
         ), ck AS (
           SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
             array_join(slice(tk, i*32 + 1, 32), ' ') AS chunk_text
           FROM ex
         ), boiler AS (
           SELECT chunk_text FROM ck GROUP BY chunk_text HAVING count(*) >= 2
         ), v AS (
           SELECT c.doc_id, c.chunk_id, c.chunk_text,
             (b.chunk_text IS NULL) AS keep
           FROM ck c LEFT JOIN boiler b ON c.chunk_text = b.chunk_text)
         SELECT doc_id, count(*) AS n_chunks,
           count(CASE WHEN keep THEN 1 END) AS n_kept,
           array_join(
             transform(
               array_sort(collect_list(
                 CASE WHEN keep THEN struct(chunk_id, chunk_text) END)),
               c -> c.chunk_text),
             ' ') AS clean_text
         FROM v GROUP BY doc_id ORDER BY doc_id""",
    "t15_chunk_dedup" ->
      """WITH toks AS (
           SELECT doc_id, split(trim(text), '\\s+') AS tk FROM documents
         ), meta AS (
           SELECT doc_id, tk,
             1 + CAST(floor((greatest(size(tk) - 32, 0) + 31) / 32.0) AS INT)
               AS nc
           FROM toks
         ), ex AS (
           SELECT doc_id, tk, explode(sequence(0, nc - 1)) AS i FROM meta
         ), ck AS (
           SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
             array_join(slice(tk, i*32 + 1, 32), ' ') AS chunk_text
           FROM ex
         ), rk AS (
           SELECT doc_id, chunk_id,
             row_number() OVER (PARTITION BY chunk_text
               ORDER BY doc_id ASC, chunk_id ASC) AS rn
           FROM ck)
         SELECT doc_id, count(*) AS n_chunks,
           count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
           floor((count(CASE WHEN rn = 1 THEN 1 END)
             / CAST(count(*) AS DOUBLE))*1e4 + 0.5)/1e4 AS kept_frac
         FROM rk GROUP BY doc_id ORDER BY doc_id""",
    "t16_inverted_index" ->
      """WITH ex AS (
           SELECT doc_id, explode(split(trim(text), '\\s+')) AS term
           FROM documents
         ), tf AS (
           SELECT term, doc_id, count(*) AS tf FROM ex GROUP BY 1, 2)
         SELECT term, count(*) AS df, sum(tf) AS cf,
           array_join(
             transform(
               slice(array_sort(collect_list(struct(doc_id, tf))), 1, 10),
               e -> concat_ws(':', e.doc_id, e.tf)),
             ',') AS postings
         FROM tf GROUP BY term ORDER BY term""",
    "t17_phrase_search" ->
      """WITH toks AS (
           SELECT doc_id, split(trim(text), '\\s+') AS tk FROM documents
         ), tok AS (
           SELECT doc_id, CAST(pos0 + 1 AS BIGINT) AS pos, term
           FROM toks LATERAL VIEW posexplode(tk) x AS pos0, term
         ), bg AS (
           SELECT explode(transform(sequence(1, size(tk) - 1),
             i -> array_join(slice(tk, i, 2), ' '))) AS phrase
           FROM toks WHERE size(tk) >= 2
         ), cnt AS (SELECT phrase, count(*) AS n FROM bg GROUP BY phrase),
         ph AS (
           SELECT phrase, split(phrase, ' ')[0] AS w1, split(phrase, ' ')[1] AS w2
           FROM (SELECT phrase FROM cnt ORDER BY n DESC, phrase ASC LIMIT 3)
         ), p1 AS (
           SELECT ph.phrase, t.doc_id, t.pos FROM tok t JOIN ph ON t.term = ph.w1
         ), p2 AS (
           SELECT ph.phrase, t.doc_id, t.pos FROM tok t JOIN ph ON t.term = ph.w2)
         SELECT p1.phrase, p1.doc_id, count(*) AS n_hits,
           min(p1.pos) AS first_pos
         FROM p1 JOIN p2 ON p1.phrase = p2.phrase
           AND p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "t18_collocations" ->
      """WITH toks AS (
           SELECT split(trim(text), '\\s+') AS tk FROM documents
         ), bg AS (
           SELECT explode(transform(sequence(1, size(tk) - 1),
             i -> array_join(slice(tk, i, 2), ' '))) AS bigram
           FROM toks WHERE size(tk) >= 2
         ), bgc AS (SELECT bigram, count(*) AS n_pair FROM bg GROUP BY 1
         ), uni AS (
           SELECT w, count(*) AS n_w
           FROM (SELECT explode(tk) AS w FROM toks) GROUP BY 1
         ), tot AS (
           SELECT (SELECT CAST(sum(n_pair) AS DOUBLE) FROM bgc) AS b_total,
             (SELECT CAST(sum(n_w) AS DOUBLE) FROM uni) AS t_total
         ), scored AS (
           SELECT b.bigram, b.n_pair,
             floor(ln((CAST(b.n_pair AS DOUBLE) / t.b_total)
               / ((CAST(u1.n_w AS DOUBLE) / t.t_total)
                  * (CAST(u2.n_w AS DOUBLE) / t.t_total)))*1e4 + 0.5)/1e4
               AS pmi
           FROM bgc b
           JOIN uni u1 ON u1.w = split(b.bigram, ' ')[0]
           JOIN uni u2 ON u2.w = split(b.bigram, ' ')[1]
           CROSS JOIN tot t
           WHERE b.n_pair >= 5)
         SELECT rk, bigram, n_pair, pmi FROM (
           SELECT bigram, n_pair, pmi,
             row_number() OVER (ORDER BY pmi DESC, bigram ASC) AS rk
           FROM scored)
         WHERE rk <= 20 ORDER BY rk""",
    "t19_tfidf" ->
      """WITH tfc AS (
           SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, explode(split(trim(text), '\\s+')) AS term
                 FROM documents)
           GROUP BY 1, 2
         ), dfc AS (
           SELECT term, count(*) AS df FROM tfc GROUP BY 1
         ), nd AS (SELECT count(*) AS n_docs FROM documents
         ), scored AS (
           SELECT doc_id, tfc.term AS term,
             floor((CAST(tf AS DOUBLE)
               * (ln((CAST(n_docs AS DOUBLE) + 1.0)
                      / (CAST(df AS DOUBLE) + 1.0)) + 1.0))*1e4 + 0.5)/1e4
               AS tfidf
           FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN nd)
         SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tfidf FROM (
           SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, term ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY doc_id, rk""",
    "d01_exact_dedup" ->
      """SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' '))) AS fp,
           min(doc_id) AS keeper, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keeper""",
    "x17_soft_dedup_weights" ->
      """WITH f AS (
           SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\\s+', ' '))) AS fp
           FROM documents
         ), fam AS (
           SELECT fp, count(*) AS n_copies FROM f GROUP BY fp)
         SELECT doc_id, n_copies,
           floor((1.0 / CAST(n_copies AS DOUBLE))*1e4 + 0.5)/1e4 AS weight
         FROM f JOIN fam USING (fp) ORDER BY doc_id""",
    "x18_bloom_decontaminate" -> x18SparkSqlText,
    "x21_family_split" ->
      """WITH f AS (
           SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\\s+', ' '))) AS fp
           FROM documents
         ), sp AS (
           SELECT fp,
             CASE WHEN substring(md5(fp), 1, 2) < '0d' THEN 'test'
                  WHEN substring(md5(fp), 1, 2) < '1a' THEN 'val'
                  ELSE 'train' END AS split
           FROM f)
         SELECT split, count(*) AS n_docs,
           count(DISTINCT fp) AS n_families
         FROM sp GROUP BY split ORDER BY split""",
    "m09_cdc_chunks" -> m09SparkSqlText,
    "d11_incremental_dedup" ->
      """WITH f AS (
           SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\\s+', ' '))) AS fp
           FROM documents
         ), store AS (SELECT DISTINCT fp FROM f WHERE doc_id < 250),
         batch AS (SELECT * FROM f WHERE doc_id >= 250)
         SELECT b.fp, min(b.doc_id) AS keeper, count(*) AS n_copies
         FROM batch b LEFT ANTI JOIN store s ON b.fp = s.fp
         GROUP BY b.fp ORDER BY keeper""",
    "s02_cosine_pairs" ->
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings
         ), n AS (
           SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM e)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(graft_dot(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
         FROM n a JOIN n b ON a.vec_id < b.vec_id
         WHERE round(graft_dot(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
         ORDER BY id_a, id_b""",
    "s01_ann_bruteforce" -> s01SparkSql,
    "s16_ann_graph" -> s16SparkSql,
    "s15_hard_negatives" ->
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v, label
           FROM embeddings
         ), n AS (
           SELECT vec_id, v, label, sqrt(graft_dot(v, v)) AS nrm FROM e
         ), scored AS (
           SELECT q.vec_id AS q_id, a.vec_id AS n_id, a.label AS n_label,
             round(graft_dot(q.v, a.v) / (q.nrm * a.nrm), 6) AS cos
           FROM n q JOIN n a
             ON a.vec_id <> q.vec_id AND a.label <> q.label
           WHERE q.vec_id < 5)
         SELECT q_id, rk, n_id, n_label, cos FROM (
           SELECT q_id, n_id, n_label, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY q_id, rk""",
    "q33_scd2_intervals" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus,
           round(o_totalprice, 4) AS price,
           date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS valid_from,
           date_format(lead(o_orderdate, 1) OVER w, 'yyyy-MM-dd HH:mm:ss')
             AS valid_to,
           lead(o_orderdate, 1) OVER w IS NULL AS is_current
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_custkey, valid_from, o_orderkey""",
    "q34_latest_snapshot" ->
      """SELECT user_id, event_id, event_type, value, ts FROM (
           SELECT user_id, event_id, event_type,
             round(value, 4) AS value,
             date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts,
             row_number() OVER (PARTITION BY user_id
               ORDER BY date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') DESC,
                        event_id DESC) AS rk
           FROM events)
         WHERE rk = 1 ORDER BY user_id""",
    "s08_ann_quantized" ->
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings
         ), q AS (
           SELECT vec_id,
             transform(v, x -> floor(x * 127.0D /
               array_max(transform(v, y -> abs(y))) + 0.5D)) AS qv
           FROM e
         ), n AS (
           SELECT vec_id, qv, sqrt(graft_dot(qv, qv)) AS nrm FROM q
         ), scored AS (
           SELECT qq.vec_id AS q_id, a.vec_id AS n_id,
             round(graft_dot(qq.qv, a.qv) / (qq.nrm * a.nrm), 6) AS qcos
           FROM n qq JOIN n a ON a.vec_id <> qq.vec_id
           WHERE qq.vec_id < 5)
         SELECT q_id, rk, n_id, qcos FROM (
           SELECT q_id, n_id, qcos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY qcos DESC, n_id ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY q_id, rk""",
    "s07_label_centroid" ->
      """WITH e AS (SELECT label, CAST(embedding AS ARRAY<DOUBLE>) AS v
                    FROM embeddings),
         ex AS (SELECT label, posexplode(v) AS (pos, x) FROM e)
         SELECT label, CAST(pos AS INT) AS pos, round(avg(x), 4) AS c
         FROM ex GROUP BY 1, 2 ORDER BY 1, 2""",
    "s06_label_norms" ->
      """WITH e AS (SELECT label,
           sqrt(graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
                          CAST(embedding AS ARRAY<DOUBLE>))) AS nrm
         FROM embeddings)
         SELECT label, count(*) AS n,
           round(avg(nrm), 4) AS avg_norm,
           round(min(nrm), 4) AS min_norm,
           round(max(nrm), 4) AS max_norm
         FROM e GROUP BY 1 ORDER BY 1""",
    "q13_events_tumbling" ->
      """SELECT date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS w_start,
           event_type, count(*) AS n, round(sum(value), 4) AS sum_value
         FROM events GROUP BY window(ts, '20 minutes'), event_type
         ORDER BY w_start, event_type""",
    "q14_normalize_events" ->
      """WITH p AS (
           SELECT ts, event_type, from_json(props, 'k BIGINT').k AS k FROM events)
         SELECT date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS w_start,
           event_type, count(*) AS n, sum(k) AS sum_k
         FROM p WHERE k IS NOT NULL
         GROUP BY window(ts, '20 minutes'), event_type
         ORDER BY w_start, event_type""",
    "q16_percentiles" ->
      """SELECT l_returnflag,
           round(percentile(l_quantity, 0.5), 4) AS median_qty,
           round(percentile(l_extendedprice, 0.9), 4) AS p90_price,
           count(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q23_monthly_trend" ->
      """SELECT date_format(date_trunc('month', o_orderdate), 'yyyy-MM') AS month,
           count(*) AS n_orders, round(sum(o_totalprice), 4) AS total
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q25_pivot" ->
      """SELECT date_format(date_trunc('month', ts), 'yyyy-MM') AS month,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY 1 ORDER BY 1""",
    "q29_sliding" ->
      """SELECT date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS w_start,
           event_type, count(*) AS n
         FROM events GROUP BY window(ts, '20 minutes', '5 minutes'), event_type
         ORDER BY w_start, event_type""",
    "q30_grouping_sets" ->
      """SELECT coalesce(o_year, 0) AS yr,
           coalesce(o_orderpriority, 'ALL') AS priority,
           grouping_id() AS gid,
           count(*) AS n, round(sum(o_totalprice), 4) AS total
         FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                      o_orderpriority, o_totalprice FROM orders)
         GROUP BY GROUPING SETS ((o_year, o_orderpriority), (o_year),
                                 (o_orderpriority))
         ORDER BY gid, yr, priority""",
    "q19_sessions" ->
      """WITH x AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         y AS (
           SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS grp
           FROM x)
         SELECT user_id,
           date_format(min(ts), 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS w_start,
           date_format(max(ts) + INTERVAL 10 MINUTE,
                       'yyyy-MM-dd HH:mm:ss.SSSSSS') AS w_end,
           count(*) AS n
         FROM y GROUP BY user_id, grp ORDER BY user_id, w_start""",
    "j01_asof_join" ->
      """WITH p AS (SELECT user_id, ts, max(value) AS p_value FROM events
                    WHERE event_type = 'purchase' GROUP BY 1, 2),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click')
         SELECT c.event_id, c.user_id,
           date_format(c.ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts_s,
           date_format(pp.ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS purchase_ts,
           round(pp.p_value, 4) AS purchase_value
         FROM c LEFT JOIN LATERAL (
           SELECT ts, p_value FROM p
           WHERE p.user_id = c.user_id AND p.ts <= c.ts
           ORDER BY ts DESC LIMIT 1) pp ON true
         ORDER BY event_id""",
    "m01_media_stats" ->
      """SELECT doc_id AS media_id,
           element_at(array('image','audio','video'), CAST(doc_id % 3 AS INT) + 1) AS kind,
           octet_length(text) AS n_bytes,
           CAST(64 + n_chars % 64 AS INT) AS width,
           CAST(64 + n_chars % 48 AS INT) AS height,
           CAST(n_chars * 10 AS INT) AS duration_ms
         FROM documents ORDER BY media_id""",
    "m02_frame_sample" ->
      """SELECT doc_id AS media_id,
           CAST(f / 500 AS BIGINT) AS frame_idx,
           CAST(f AS BIGINT) AS frame_off_ms,
           CAST(n_chars * 10 AS BIGINT) AS duration_ms
         FROM (SELECT doc_id, n_chars,
                 explode(sequence(CAST(0 AS BIGINT),
                   CAST(n_chars * 10 AS BIGINT) - 1, CAST(500 AS BIGINT))) AS f
               FROM documents WHERE doc_id % 3 = 2)
         ORDER BY media_id, frame_idx""",
    "m08_media_dup_clusters" -> m08SparkSql,
    "m04_byte_histogram" ->
      """SELECT element_at(array('image','audio','video'), CAST(doc_id % 3 AS INT) + 1) AS kind,
           count(*) AS n_docs,
           sum(CAST(octet_length(text) AS BIGINT)) AS total_bytes,
           sum(CAST(size(filter(sequence(1, octet_length(text)),
             i -> substring(hex(encode(text, 'UTF-8')), CAST(2*i-1 AS INT), 1) = '2'))
             AS BIGINT)) AS bin2_bytes,
           sum(CAST(size(filter(sequence(1, octet_length(text)),
             i -> substring(hex(encode(text, 'UTF-8')), CAST(2*i-1 AS INT), 1) = '6'))
             AS BIGINT)) AS bin6_bytes
         FROM documents GROUP BY 1 ORDER BY 1""",
    "m05_resize_meta" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
             element_at(array('image','audio','video'), CAST(doc_id % 3 AS INT) + 1) AS kind,
             CAST(64 + n_chars % 64 AS INT) AS w,
             CAST(64 + n_chars % 48 AS INT) AS h
           FROM documents),
         sc AS (SELECT *,
             least(1.0, 96 / CAST(greatest(w, h) AS DOUBLE)) AS scale FROM m)
         SELECT media_id, kind,
           CAST(floor(w * scale) AS INT) AS r_width,
           CAST(floor(h * scale) AS INT) AS r_height
         FROM sc ORDER BY media_id""",
    "m06_media_dedup" ->
      """SELECT md5(CAST(text AS BINARY)) AS fp, min(doc_id) AS keeper,
           count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keeper""",
    "m12_incremental_media" ->
      s"""WITH f AS (
           SELECT doc_id, md5(CAST(text AS BINARY)) AS fp FROM documents
         ), store AS (SELECT DISTINCT fp FROM f
                      WHERE doc_id < ${graft.operators.Dedup.D12SplitAt}),
         batch AS (SELECT * FROM f
                   WHERE doc_id >= ${graft.operators.Dedup.D12SplitAt})
         SELECT b.fp, min(b.doc_id) AS keeper, count(*) AS n_copies
         FROM batch b LEFT JOIN store s ON b.fp = s.fp
         WHERE s.fp IS NULL
         GROUP BY b.fp ORDER BY keeper""",
    "m07_media_similar" ->
      """WITH h AS (
           SELECT doc_id AS media_id,
             transform(graft_nibble_hist(CAST(text AS BINARY)),
               x -> CAST(x AS DOUBLE)) AS v
           FROM documents
         ), n AS (
           SELECT media_id, v, sqrt(graft_dot(v, v)) AS nrm FROM h
         ), scored AS (
           SELECT q.media_id AS q_id, a.media_id AS n_id,
             round(graft_dot(q.v, a.v) / (q.nrm * a.nrm), 6) AS cos
           FROM n q JOIN n a ON a.media_id <> q.media_id
           WHERE q.media_id < 3)
         SELECT q_id, rk, n_id, cos FROM (
           SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, n_id ASC) AS rk
           FROM scored)
         WHERE rk <= 3 ORDER BY q_id, rk""",
    "j03_asof_forward" ->
      """WITH p AS (SELECT user_id, ts, max(value) AS p_value FROM events
                    WHERE event_type = 'purchase' GROUP BY 1, 2),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click')
         SELECT c.event_id, c.user_id,
           date_format(c.ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts_s,
           date_format(pp.ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS purchase_ts,
           round(pp.p_value, 4) AS purchase_value
         FROM c LEFT JOIN LATERAL (
           SELECT ts, p_value FROM p
           WHERE p.user_id = c.user_id AND p.ts >= c.ts
           ORDER BY ts ASC LIMIT 1) pp ON true
         ORDER BY event_id""",
    // j05's Spark form: the j04 ranked-join workaround (Spark rejects
    // correlated references in a LATERAL ORDER BY) with the tolerance
    // riding in the join predicate
    "j05_asof_tolerance" ->
      """WITH p AS (SELECT user_id, ts, max(value) AS p_value FROM events
                    WHERE event_type = 'purchase' GROUP BY 1, 2),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
         j AS (
           SELECT c.event_id, c.user_id, c.ts, p.ts AS pts, p.p_value,
             row_number() OVER (PARTITION BY c.event_id
               ORDER BY p.ts DESC) AS rk
           FROM c LEFT JOIN p ON p.user_id = c.user_id
             AND p.ts <= c.ts AND p.ts >= c.ts - INTERVAL 30 MINUTE)
         SELECT event_id, user_id,
           date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts_s,
           date_format(pts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS purchase_ts,
           round(p_value, 4) AS purchase_value
         FROM j WHERE rk = 1 ORDER BY event_id""",
    "q36_cohort_retention" ->
      """WITH ev AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
         ), cohorts AS (
           SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
         ), sizes AS (
           SELECT cohort_day, count(*) AS cohort_n
           FROM cohorts GROUP BY cohort_day
         ), act AS (
           SELECT c.cohort_day,
             datediff(e.day, c.cohort_day) AS day_offset,
             count(*) AS n_active
           FROM ev e JOIN cohorts c USING (user_id)
           GROUP BY 1, 2
         )
         SELECT date_format(a.cohort_day, 'yyyy-MM-dd') AS cohort_day,
           day_offset, n_active, cohort_n,
           floor((CAST(n_active AS DOUBLE) / CAST(cohort_n AS DOUBLE))*1e4
             + 0.5)/1e4 AS retention
         FROM act a JOIN sizes s ON s.cohort_day = a.cohort_day
         ORDER BY 1, 2""",
    // Spark rejects correlated references in a LATERAL subquery's ORDER
    // BY, so the nearest-event pick is a ranked join instead (same
    // tie-break: abs distance, then earlier purchase ts)
    "j04_nearest_event" ->
      """WITH p AS (SELECT user_id, ts, max(value) AS p_value FROM events
                    WHERE event_type = 'purchase' GROUP BY 1, 2),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
         j AS (
           SELECT c.event_id, c.user_id, c.ts, p.ts AS pts, p.p_value,
             row_number() OVER (PARTITION BY c.event_id
               ORDER BY abs(unix_micros(p.ts) - unix_micros(c.ts)) ASC,
                        p.ts ASC) AS rk
           FROM c LEFT JOIN p ON p.user_id = c.user_id)
         SELECT event_id, user_id,
           date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts_s,
           date_format(pts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS purchase_ts,
           round(p_value, 4) AS purchase_value
         FROM j WHERE rk = 1 ORDER BY event_id""",
    "q28_stateful_batch" ->
      """SELECT user_id, count(*) AS n_events,
           round(CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) / CAST(100.0 AS DOUBLE), 4)
             AS total_value,
           date_format(max(ts), 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS last_ts
         FROM events GROUP BY 1 ORDER BY 1""",
    "t10_bm25" -> t10SparkSql,
    "t20_rrf_fusion" -> t20SparkSql,
    "t21_lm_continuations" ->
      """WITH toks AS (
           SELECT split(trim(text), '\\s+') AS tk FROM documents
         ), bg AS (
           SELECT tk[i - 1] AS context, tk[i] AS next_tok
           FROM (SELECT tk, explode(sequence(1, size(tk) - 1)) AS i
                 FROM toks WHERE size(tk) >= 2)
         ), pc AS (
           SELECT context, next_tok, count(*) AS n_pair FROM bg GROUP BY 1, 2
         ), ctx AS (
           SELECT context, sum(n_pair) AS ctx_total FROM pc GROUP BY 1
         ), top_ctx AS (
           SELECT context, ctx_total FROM (
             SELECT context, ctx_total,
               row_number() OVER (ORDER BY ctx_total DESC, context ASC) AS cr
             FROM ctx) WHERE cr <= 20)
         SELECT context, CAST(rk AS BIGINT) AS rk, next_tok, n_pair,
           floor((CAST(n_pair AS DOUBLE) / CAST(ctx_total AS DOUBLE))*1e4
             + 0.5)/1e4 AS prob
         FROM (
           SELECT p.context, p.next_tok, p.n_pair, t.ctx_total,
             row_number() OVER (PARTITION BY p.context
               ORDER BY p.n_pair DESC, p.next_tok ASC) AS rk
           FROM pc p JOIN top_ctx t USING (context))
         WHERE rk <= 3 ORDER BY context, rk""",
    "t11_heavy_hitters" ->
      """WITH w AS (
           SELECT explode(split(trim(text), '\\s+')) AS w FROM documents
         ), c AS (SELECT w, count(*) AS n FROM w GROUP BY 1)
         SELECT rk, w, n FROM (
           SELECT w, n, row_number() OVER (ORDER BY n DESC, w) AS rk
           FROM c)
         WHERE rk <= 10 ORDER BY rk""",
    "t12_perplexity" ->
      """WITH toks AS (
           SELECT doc_id, split(trim(text), '\\s+') AS tk FROM documents
         ), bg AS (
           SELECT doc_id, i - 1 AS pos, element_at(tk, CAST(i AS INT)) AS v,
             element_at(tk, CAST(i + 1 AS INT)) AS w
           FROM (SELECT doc_id, tk, explode(sequence(1, size(tk) - 1)) AS i
                 FROM toks WHERE size(tk) >= 2)
         ), cvw AS (SELECT v, w, count(*) AS cvw FROM bg GROUP BY 1, 2
         ), cv AS (SELECT v, count(*) AS cv FROM bg GROUP BY 1
         ), vocab AS (
           SELECT count(DISTINCT tk2) AS vsz
           FROM (SELECT explode(tk) AS tk2 FROM toks)
         ), scored AS (
           SELECT bg.doc_id, bg.pos,
             log((CAST(cvw AS DOUBLE) + 1.0)
                / (CAST(cv AS DOUBLE) + CAST(vsz AS DOUBLE))) AS lnp
           FROM bg JOIN cvw USING (v, w) JOIN cv USING (v) CROSS JOIN vocab
         ), folded AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             aggregate(transform(array_sort(collect_list(struct(pos, lnp))),
                 s -> s.lnp),
               CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS lnp_sum
           FROM scored GROUP BY doc_id)
         SELECT doc_id, n_bigrams,
           floor(((-lnp_sum) / CAST(n_bigrams AS DOUBLE))*1e4 + 0.5)/1e4
             AS cross_entropy,
           floor(exp((-lnp_sum) / CAST(n_bigrams AS DOUBLE))*1e4 + 0.5)/1e4
             AS ppl
         FROM folded ORDER BY doc_id""",
    "t28_zipf_profile" -> t28SparkSql,
    "t29_unigram_encode" -> t29SparkSql,
    "x04_curation_funnel" ->
      """WITH f AS (
           SELECT doc_id, text,
             CAST(size(split(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
             CAST(size(filter(split(trim(text), '\\s+'),
               x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS n_stop,
             CAST(length(regexp_replace(text, '\\s+', '')) AS DOUBLE) AS n_nonspace
           FROM documents),
         q AS (
           SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\\s+', ' '))) AS fp,
             floor((least(1.0, n_tok/20.0)*0.4
                   + least(1.0, (n_stop/n_tok)*5.0)*0.3
                   + (CASE WHEN n_nonspace/n_tok BETWEEN 3.0 AND 10.0
                           THEN 1.0 ELSE 0.0 END)*0.3)*1e4 + 0.5)/1e4 AS quality
           FROM f),
         passing AS (SELECT * FROM q WHERE quality >= 0.5),
         keepers AS (SELECT fp, min(doc_id) AS doc_id FROM passing GROUP BY 1),
         sp AS (
           SELECT CASE WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < '0d' THEN 'test'
                       WHEN substring(md5(CAST(doc_id AS STRING)), 1, 2) < '1a' THEN 'val'
                       ELSE 'train' END AS split
           FROM keepers)
         SELECT stage, n FROM (
           SELECT '1_raw' AS stage, count(*) AS n FROM q
           UNION ALL SELECT '2_quality_pass', count(*) FROM passing
           UNION ALL SELECT '3_dedup_keepers', count(*) FROM keepers
           UNION ALL SELECT concat('4_', split), count(*) FROM sp GROUP BY split)
         ORDER BY stage""",
  ) ++ SparkDialectTail.forms
}
