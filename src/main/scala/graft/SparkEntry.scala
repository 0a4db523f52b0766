package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Bucketing, Clustering, Dedup, Graph, Multimodal, Mutations, OtelQueries, QuerySurface, Sampling, Similarity, Sketches, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7.
  *
  * Every entry in [[queries]] is an operator from the SURVEY §2 inventory or
  * the training-data-pipeline extension set, and every entry carries a DuckDB
  * `oracleSql` twin hash-compared at sf0.01 (driver round-2 artifact: 45/46
  * green; the one miss was an oracle-SQL HUGEINT dtype bug, fixed in round
  * 3) — including the hash-based operators
  * (MinHash/SimHash/LSH/fingerprint): their hash primitives are MD5-derived
  * ([[graft.operators.Tables]] rules + [[graft.functions.PortableHash]]) and
  * their PRNG constants (permutation coefficients, hyperplanes) are inlined
  * into the generated oracle SQL as literals, so DuckDB recomputes the exact
  * pipeline.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The full star
    * join + aggregate exercises scan, broadcast join, shuffle agg, sort. */
  def entry(spark: SparkSession): DataFrame =
    QuerySurface.q5RegionRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- query surface (SURVEY §2.4) --
    "q_scan_project" -> (QuerySurface.scanProject _),
    "q_filter_time" -> (QuerySurface.filterTime _),
    "q_filter_in" -> (QuerySurface.filterIn _),
    "q_topk" -> (QuerySurface.topK _),
    "q_groupby_count" -> (QuerySurface.groupByCount _),
    "q_time_bucket_agg" -> (QuerySurface.timeBucketAgg _),
    "q_scalar_arith" -> (QuerySurface.scalarArith _),
    "q_join_equi" -> (QuerySurface.joinEqui _),
    "q_hist_buckets" -> (QuerySurface.histBuckets _),
    "q_partition_prune" -> (QuerySurface.partitionPrune _),
    "q_json_extract" -> (QuerySurface.jsonExtract _),
    "q_sessionize" -> (QuerySurface.sessionize _),
    "q_agg_distinct" -> (QuerySurface.aggDistinct _),
    "q_window_rank" -> ((s: SparkSession, d: String) => QuerySurface.windowRank(s, d)),
    "q_set_ops" -> (QuerySurface.setOps _),
    "q_rollup" -> (QuerySurface.rollupCounts _),
    "q_pivot" -> (QuerySurface.pivotReturns _),
    "q_unpivot" -> (QuerySurface.unpivotMeasures _),
    "q_cube" -> (QuerySurface.cubeCounts _),
    "q_running_total" -> (QuerySurface.runningTotal _),
    "q_event_rate" -> (QuerySurface.eventRate _),
    "q_outer_join" -> (QuerySurface.outerJoinDaily _),
    "q_anti_join" -> (QuerySurface.antiJoin _),
    "q_corr_subquery" -> (QuerySurface.corrSubquery _),
    "q_gap_fill" -> (QuerySurface.gapFill _),
    "q_moving_avg" -> (QuerySurface.movingAvg _),
    "q_semi_join" -> (QuerySurface.semiJoin _),
    "q_grouping_sets" -> (QuerySurface.groupingSets _),
    "q_session_window" -> (QuerySurface.sessionWindow _),
    "q_asof_join" -> (QuerySurface.asofJoin _),
    "q_range_join" -> ((s: SparkSession, d: String) => QuerySurface.rangeJoin(s, d)),
    // -- analytic headliners (bench workhorses) --
    "q1_pricing" -> (QuerySurface.q1Pricing _),
    "q3_top_orders" -> (QuerySurface.q3TopOrders _),
    "q5_region_revenue" -> (QuerySurface.q5RegionRevenue _),
    // -- dedup --
    "dedup_exact" -> (Dedup.exact _),
    // uncapped = true: the gate intentionally verifies the exact all-pairs
    // ground truth; the library DEFAULT is the doc-frequency-capped form
    "dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d, uncapped = true)),
    "dedup_jaccard_capped" -> ((s: SparkSession, d: String) => Dedup.ngramJaccardCapped(s, d)),
    "dedup_minhash_lsh" -> ((s: SparkSession, d: String) => Dedup.minhashLsh(s, d)),
    "dedup_incremental" -> ((s: SparkSession, d: String) => Dedup.dedupIncremental(s, d)),
    "dedup_incremental_tbl" -> ((s: SparkSession, d: String) => Dedup.dedupIncrementalFromIndex(s, d)),
    "dedup_substring" -> ((s: SparkSession, d: String) => Dedup.dedupSubstring(s, d)),
    "dedup_simhash" -> ((s: SparkSession, d: String) => Dedup.simhashPairs(s, d)),
    "dedup_groups" -> ((s: SparkSession, d: String) => Dedup.nearDupGroups(s, d)),
    "dedup_survivors" -> ((s: SparkSession, d: String) => Dedup.dedupSurvivors(s, d)),
    "dedup_cross" -> ((s: SparkSession, d: String) => Dedup.crossDedup(s, d)),
    // -- similarity search --
    "sim_cosine_pairs" -> ((s: SparkSession, d: String) => Similarity.cosinePairs(s, d)),
    "dedup_embedding_lsh" -> ((s: SparkSession, d: String) => Similarity.cosinePairsLsh(s, d)),
    "sim_topk" -> ((s: SparkSession, d: String) => Similarity.topK(s, d)),
    "sim_ann_lsh" -> ((s: SparkSession, d: String) => Similarity.annLsh(s, d)),
    "sim_ann_ivf" -> ((s: SparkSession, d: String) => Similarity.annIvf(s, d)),
    "sim_ann_ivf_kmeans" -> ((s: SparkSession, d: String) => Similarity.annIvfKmeans(s, d)),
    "sim_quantize" -> (Similarity.quantize _),
    "sim_rp_project" -> ((s: SparkSession, d: String) => Similarity.randomProjection(s, d)),
    // -- text analysis --
    "text_tokens" -> (TextAnalysis.tokens _),
    "text_top_terms" -> ((s: SparkSession, d: String) => TextAnalysis.topTerms(s, d)),
    "text_rarity" -> ((s: SparkSession, d: String) => TextAnalysis.rarity(s, d)),
    "text_quality" -> (TextAnalysis.quality _),
    "text_quality_ntile" -> (TextAnalysis.qualityNtile _),
    "text_langid" -> (TextAnalysis.langId _),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
    // -- multimodal columns --
    "mm_features" -> (Multimodal.features _),
    "mm_binary_meta" -> (Multimodal.binaryMeta _),
    "mm_frame_stats" -> ((s: SparkSession, d: String) => Multimodal.frameStats(s, d)),
    // -- dataset assembly --
    "sample_split" -> (Sampling.sampleSplit _),
    "sample_stratified" -> ((s: SparkSession, d: String) => Sampling.sampleStratified(s, d)),
    "sample_dsir" -> ((s: SparkSession, d: String) => Sampling.sampleDsir(s, d)),
    "sample_weighted" -> ((s: SparkSession, d: String) => Sampling.sampleWeighted(s, d)),
    "pack_sequences" -> ((s: SparkSession, d: String) => Sampling.packSequences(s, d)),
    "cluster_kmeans" -> ((s: SparkSession, d: String) => Clustering.kmeans(s, d)),
    "cluster_prune_prototypes" -> ((s: SparkSession, d: String) => Clustering.prunePrototypes(s, d)),
    "dedup_decontaminate" -> ((s: SparkSession, d: String) => Sampling.decontaminate(s, d)),
    "mix_source_stats" -> (Sampling.sourceMixStats _),
    "text_repetition" -> (TextAnalysis.repetition _),
    // -- documented telemetry query surface over the reference's goldens --
    "otel_sev_counts" -> (OtelQueries.goldenSevCounts _),
    "otel_slow_spans" -> ((s: SparkSession, d: String) => OtelQueries.goldenSlowSpans(s, d)),
    "otel_trace_log_join" -> (OtelQueries.goldenTraceLogJoin _),
    "otel_hist_p95" -> (OtelQueries.goldenHistP95 _),
    "otel_hist_p95_scale" -> ((s: SparkSession, d: String) => OtelQueries.histP95AtScale(s, d)),
    "otel_exp_hist_p95_scale" -> ((s: SparkSession, d: String) => OtelQueries.expHistP95AtScale(s, d)),
    "otel_exp_hist_p95" -> (OtelQueries.goldenExpHistP95 _),
    "otel_gauge_hourly" -> (OtelQueries.goldenGaugeHourly _),
    "otel_sum_totals" -> (OtelQueries.goldenSumTotals _),
    "otel_trace_depth" -> (OtelQueries.goldenTraceDepth _),
    // -- event-time streaming operators over a replayed bounded stream --
    "stream_window_counts" -> ((s: SparkSession, d: String) => graft.streaming.StreamGate.windowCounts(s, d)),
    "stream_sessionize" -> (graft.streaming.StreamGate.sessionize _),
    "stream_dedup" -> ((s, d) => graft.streaming.StreamGate.dedupKeys(s, d)),
    "stream_dedup_lsh" -> ((s, d) => graft.streaming.StreamGate.dedupLshIndex(s, d)),
    "stream_dedup_lsh_pruned" -> ((s, d) =>
      graft.streaming.StreamGate.dedupLshPrunedStream(s, d)),
    "stream_dedup_lsh_multi" -> ((s, d) =>
      graft.streaming.StreamGate.dedupLshIncrementalStream(s, d)),
    "stream_enrich_join" -> ((s: SparkSession, d: String) =>
      graft.streaming.StreamGate.enrichJoin(s, d)),
    "stream_stream_join" -> ((s, d) => graft.streaming.StreamGate.streamStreamJoin(s, d)),
    "stream_upsert" -> (graft.streaming.StreamGate.upsertSnapshot _),
    "stream_anomaly" -> (graft.streaming.StreamGate.anomalies _),
    "stream_cms" -> ((s, d) => graft.streaming.StreamGate.cmsWindows(s, d)),
    "stream_qsketch" -> ((s, d) => graft.streaming.StreamGate.qsketchWindows(s, d)),

    // -- sketches / scale statistics (round 4) --
    "q_approx_distinct" -> (Sketches.approxDistinctKmv _),
    "q_approx_distinct_est" -> (Sketches.approxDistinctKmvEstimate _),
    "q_heavy_hitters" -> (Sketches.heavyHitters _),
    "q_median_disc" -> (Sketches.medianDisc _),
    "q_approx_percentile" -> (Sketches.approxPercentile _),
    "q_percentile_cont" -> (Sketches.percentileCont _),
    "q_corr" -> (Sketches.corrStats _),
    "q_bloom_join" -> (Sketches.bloomJoin _),
    "dedup_passage" -> (Dedup.passageDedup _),
    "text_inverted_index" -> (TextAnalysis.invertedIndex _),

    // -- round 5 additions: skew pattern, profiling, PII, CDC, layout --
    "q_salted_agg" -> (Sketches.saltedAgg _),
    "q_profile" -> (Sketches.groupProfile _),
    "text_pii_scrub" -> (TextAnalysis.piiScrub _),
    "q_cdc_apply" -> (Mutations.cdcApply _),
    "q_zorder" -> (Bucketing.zOrderKeys _),
    "q_pagerank" -> ((s: SparkSession, d: String) => Graph.pageRank(s, d)),
    "q_skyline" -> (QuerySurface.skyline _),
    "q_kmv_overlap" -> (Sketches.kmvOverlap _),
    "text_lm_score" -> ((s: SparkSession, d: String) => TextAnalysis.lmScore(s, d)),
    "q_funnel" -> (QuerySurface.funnel _),
    "q_retention" -> (QuerySurface.retention _),
    "mm_near_dup" -> ((s: SparkSession, d: String) => Multimodal.nearDupMedia(s, d)),
    "q_join_card" -> (Sketches.joinCardProbe _),
    "q_equi_depth" -> (Sketches.equiDepth _),
    "q_zorder_ranked" -> ((s: SparkSession, d: String) => Bucketing.zOrderKeysRanked(s, d)),
    "q_multi_distinct" -> (QuerySurface.multiDistinct _),
    "q_window_stats" -> (QuerySurface.windowStats _),
    "q_outliers" -> (Sketches.outlierFences _),
    "q_scd2" -> (QuerySurface.scd2 _),
    // both orientations stay gated: q_triangles is the id-ordered CONTROL
    // (explicit — the library default is now degree-ordered, the round-7
    // measured winner at every scale), q_triangles_degree the default path
    "q_triangles" -> ((s: SparkSession, d: String) =>
      Graph.triangles(s, d, degreeOrdered = false)),
    "q_triangles_degree" -> ((s: SparkSession, d: String) =>
      Graph.triangles(s, d, degreeOrdered = true)),

    // -- round 7 additions: retrieval, linkage, semantic dedup, BFS, MMR --
    "q_decay_agg" -> (QuerySurface.decayAgg _),
    "q_fuzzy_join" -> ((s: SparkSession, d: String) => QuerySurface.fuzzyJoin(s, d)),
    "text_bm25" -> ((s: SparkSession, d: String) => TextAnalysis.bm25(s, d)),
    "q_bfs" -> ((s: SparkSession, d: String) => Graph.bfsHops(s, d)),
    "dedup_semantic" -> ((s: SparkSession, d: String) => Similarity.semanticDedup(s, d)),
    "sim_mmr" -> ((s: SparkSession, d: String) => Similarity.mmr(s, d)),
    "text_collocations" -> ((s: SparkSession, d: String) => TextAnalysis.collocations(s, d)),
    "q_table_diff" -> (Mutations.tableDiff _),
    "sim_knn_graph" -> ((s: SparkSession, d: String) => Similarity.knnGraph(s, d)),
    "sim_knn_descent" -> ((s: SparkSession, d: String) => Similarity.knnDescent(s, d)),
    "sample_coreset" -> ((s: SparkSession, d: String) => Similarity.coresetKCenter(s, d)),
    "sample_token_budget" -> ((s: SparkSession, d: String) => Sampling.sampleTokenBudget(s, d)),
    "mix_token_budget" -> ((s: SparkSession, d: String) => Sampling.mixTokenBudget(s, d)),
    "q_hits" -> ((s: SparkSession, d: String) => Graph.hits(s, d)),

    // -- round 7 cont.: k-core, anomaly, paths, span dedup, reservoir --
    "q_kcore" -> ((s: SparkSession, d: String) => Graph.kcore(s, d)),
    "q_anomaly" -> ((s: SparkSession, d: String) => QuerySurface.anomalyZscore(s, d)),
    "q_event_paths" -> ((s: SparkSession, d: String) => QuerySurface.eventPaths(s, d)),
    "dedup_span_coverage" -> (Dedup.spanCoverage _),
    "sample_reservoir" -> ((s: SparkSession, d: String) => Sampling.sampleReservoir(s, d)),
    "sim_ann_pq" -> ((s: SparkSession, d: String) => Similarity.annPq(s, d)),
    "q_delta_agg" -> (Mutations.deltaAgg _),
    "text_keywords" -> ((s: SparkSession, d: String) => TextAnalysis.keywords(s, d)),
    "q_hilbert" -> (Bucketing.hilbertKeys _),
    "q_sssp" -> ((s: SparkSession, d: String) => Graph.sssp(s, d)),
    "q_er_clusters" -> (QuerySurface.erClusters _),
    "text_tfidf_pairs" -> ((s: SparkSession, d: String) => TextAnalysis.tfidfPairs(s, d)),
    "q_basket_pairs" -> ((s: SparkSession, d: String) => QuerySurface.basketPairs(s, d)),
    "q_trend" -> (QuerySurface.trendFit _),
    "q_ab_test" -> (QuerySurface.abTest _),
    "q_dq_checks" -> (QuerySurface.dqChecks _),
    "q_tvd_drift" -> (QuerySurface.tvdDrift _),
    "q_k_anonymity" -> ((s: SparkSession, d: String) => QuerySurface.kAnonymity(s, d)),
    "pack_chunks_overlap" -> ((s: SparkSession, d: String) => Sampling.chunkOverlap(s, d)),
    "q_assortativity" -> ((s: SparkSession, d: String) => Graph.assortativity(s, d)),
    "sim_rrf" -> ((s: SparkSession, d: String) => Similarity.rrfFusion(s, d)),
    "otel_critical_path" -> ((s: SparkSession, d: String) => OtelQueries.criticalPath(s, d)),
    "otel_log_templates" -> (OtelQueries.goldenLogTemplates _),
    "q_cms_topk" -> ((s: SparkSession, d: String) => Sketches.cmsTopk(s, d)),
    "q_markov" -> ((s: SparkSession, d: String) => QuerySurface.markovTransitions(s, d)),
    "q_chi2" -> ((s: SparkSession, d: String) => QuerySurface.chiSquared(s, d)),
    "q_label_prop" -> ((s: SparkSession, d: String) => Graph.labelProp(s, d)),
    "q_zone_map" -> ((s: SparkSession, d: String) => Bucketing.zoneMapAudit(s, d)),
    "q_weighted_quantile" -> ((s: SparkSession, d: String) => QuerySurface.weightedQuantile(s, d)),
    "q_lorenz" -> ((s: SparkSession, d: String) => QuerySurface.lorenzDeciles(s, d)),
    "q_ppr" -> ((s: SparkSession, d: String) => Graph.personalizedPageRank(s, d)),
    "mix_temperature" -> (Sampling.mixTemperature _),
    "q_funnel_windowed" -> ((s: SparkSession, d: String) => QuerySurface.funnelWindowed(s, d)),
    "otel_error_slo" -> (OtelQueries.goldenErrorRateSlo _),
    "sim_threshold_curve" -> (Similarity.thresholdCurve _),
    "sample_balanced" -> (Sampling.sampleBalanced _),
    "q_percentile_ts" -> ((s: SparkSession, d: String) => QuerySurface.percentileTs(s, d)),
    "otel_span_pct" -> ((s: SparkSession, d: String) => OtelQueries.spanDurationPct(s, d)),
    "pack_shards" -> (Sampling.packShards _),
    "mm_exact_dup" -> (Multimodal.exactDupGroups _),
    "text_boilerplate" -> (TextAnalysis.boilerplate _),
    "text_vocab_growth" -> (TextAnalysis.vocabGrowth _),

    // -- round 8: the graph family fed from the MATERIALIZED backbone table
    // (Graph.backboneTable — derive once, read per analytic, the production
    // shape). Self-contained twins stay gated as the oracle-anchored
    // control; these six prove table-fed results are hash-identical and
    // measure what re-deriving the backbone per gate was costing.
    "q_triangles_tbl" -> ((s: SparkSession, d: String) => Graph.trianglesFromTable(s, d)),
    "q_bfs_tbl" -> ((s: SparkSession, d: String) => Graph.bfsHopsFromTable(s, d)),
    "q_sssp_tbl" -> ((s: SparkSession, d: String) => Graph.ssspFromTable(s, d)),
    "q_kcore_tbl" -> ((s: SparkSession, d: String) => Graph.kcoreFromTable(s, d)),
    "q_label_prop_tbl" -> ((s: SparkSession, d: String) => Graph.labelPropFromTable(s, d)),
    "q_assortativity_tbl" -> ((s: SparkSession, d: String) => Graph.assortativityFromTable(s, d)),

    // -- round 8 cont.: service-graph / tail-sampling / RED observability
    // analytics over the span forest, the hashed-linear keep/drop
    // classifier, and ANN recall as a first-class audit query.
    "otel_service_graph" -> ((s: SparkSession, d: String) => OtelQueries.serviceGraph(s, d)),
    "otel_tail_sampling" -> ((s: SparkSession, d: String) => OtelQueries.tailSampling(s, d)),
    "otel_red_metrics" -> ((s: SparkSession, d: String) => OtelQueries.redMetrics(s, d)),
    "text_quality_classifier" -> (TextAnalysis.qualityClassifier _),
    "sim_ann_recall" -> ((s: SparkSession, d: String) => Similarity.annRecall(s, d)),
    "pipe_curation" -> (TextAnalysis.curationPipeline _),
    "dedup_survivors_quality" -> ((s: SparkSession, d: String) => Dedup.dedupSurvivorsQuality(s, d)),
    "stream_red" -> ((s: SparkSession, d: String) => graft.streaming.StreamGate.redWindows(s, d)),
    "otel_hist_merge" -> ((s: SparkSession, d: String) => OtelQueries.histMerge(s, d)),
    "sample_kfold" -> ((s: SparkSession, d: String) => Sampling.sampleKfold(s, d)),
    "mix_epoch_order" -> ((s: SparkSession, d: String) => Sampling.epochOrder(s, d)),
    "q_kmv_rollup" -> ((s: SparkSession, d: String) => Sketches.kmvRollup(s, d)),
    "q_qsketch_rollup" -> ((s: SparkSession, d: String) => Sketches.qsketchRollup(s, d)),
    "q_attribution" -> (QuerySurface.attribution _),
    "q_cusum" -> (QuerySurface.cusumChangepoint _),
    "q_seasonality" -> (QuerySurface.dowSeasonality _),
    "otel_hist_rebucket" -> ((s: SparkSession, d: String) => OtelQueries.histRebucket(s, d)),
    "dedup_lsh_eval" -> ((s: SparkSession, d: String) => Dedup.lshEval(s, d)),
    "stream_hist" -> ((s: SparkSession, d: String) => graft.streaming.StreamGate.histWindows(s, d)),

    // -- round 9: the walk family fed from the MATERIALIZED bipartite edge
    // table (Graph.bipartiteTable — the backbone-table pattern extended to
    // PageRank/PPR, whose per-gate edge-list re-derivation was the worst
    // non-instrument sweep ratio left on the surface).
    "q_pagerank_tbl" -> ((s: SparkSession, d: String) => Graph.pageRankFromTable(s, d)),
    "q_ppr_tbl" -> ((s: SparkSession, d: String) => Graph.personalizedPageRankFromTable(s, d)),
    "dedup_lsh_eval_sampled" -> ((s: SparkSession, d: String) => Dedup.lshEvalSampled(s, d)),
    "mm_png_near_dup" -> ((s: SparkSession, d: String) => Multimodal.pngNearDup(s, d)),
    "mm_crossmodal_consensus" -> ((s: SparkSession, d: String) =>
      Multimodal.crossModalConsensus(s, d)),
    "otel_burn_rate" -> ((s: SparkSession, d: String) => OtelQueries.burnRate(s, d)),
    "text_chunking" -> ((s: SparkSession, d: String) => TextAnalysis.chunking(s, d)),
    "stream_burn" -> ((s: SparkSession, d: String) => graft.streaming.StreamGate.burnWindows(s, d)),
    "sim_centroid_drift" -> ((s: SparkSession, d: String) => Similarity.centroidDrift(s, d)),
    "sim_hard_negatives" -> ((s: SparkSession, d: String) => Similarity.hardNegatives(s, d)),
    "sim_ann_ivfpq" -> ((s: SparkSession, d: String) => Similarity.annIvfPq(s, d)),
    "sim_ann_ivfpq_tbl" -> ((s: SparkSession, d: String) =>
      Similarity.annIvfPqFromTable(s, d)),
    "sim_ann_ivfpq_upsert" -> ((s: SparkSession, d: String) =>
      Similarity.annIvfPqUpsert(s, d)),
    "stream_ann_ivfpq" -> ((s: SparkSession, d: String) =>
      graft.streaming.StreamGate.annIvfPqIncrementalStream(s, d)),
    "sim_knn_descent_conv" -> ((s: SparkSession, d: String) =>
      Similarity.knnDescentConvergence(s, d)),
    "text_chunk_delta" -> ((s: SparkSession, d: String) => TextAnalysis.chunkDelta(s, d)),
    "q_mannwhitney" -> (QuerySurface.mannWhitney _),
    "q_ks_test" -> (QuerySurface.ksTest _),
    "q_benford" -> (QuerySurface.benford _),
    "otel_apdex" -> ((s: SparkSession, d: String) => OtelQueries.apdex(s, d)),
    "text_bpe_merges" -> ((s: SparkSession, d: String) => TextAnalysis.bpeMerges(s, d)),
    "text_bpe_encode" -> ((s: SparkSession, d: String) => TextAnalysis.bpeEncode(s, d)),
    "text_cdc_chunks" -> ((s: SparkSession, d: String) => TextAnalysis.cdcChunks(s, d)),
    "q_acf" -> (QuerySurface.acf _),
    "q_ols" -> (QuerySurface.ols _),
    "q_mad_outliers" -> (QuerySurface.madOutliers _),
    "otel_root_cause" -> ((s: SparkSession, d: String) => OtelQueries.errorRootCause(s, d)),
    "dedup_containment" -> ((s: SparkSession, d: String) => Dedup.shingleContainment(s, d)),
    "otel_self_time" -> ((s: SparkSession, d: String) => OtelQueries.selfTime(s, d)),
    "pair_preference" -> (Sampling.preferencePairs _),
    "q_winsorize" -> (QuerySurface.winsorize _),
    "text_novelty" -> ((s: SparkSession, d: String) => TextAnalysis.novelty(s, d)),
    "q_snaive" -> (QuerySurface.seasonalNaive _),
    "mix_simpson" -> (Sampling.mixSimpson _),
    "q_fano" -> (QuerySurface.fano _),
    "otel_exemplars" -> ((s: SparkSession, d: String) => OtelQueries.exemplars(s, d)),
    "q_sax" -> (QuerySurface.sax _),
    "q_topn_share" -> ((s: SparkSession, d: String) => QuerySurface.topNShare(s, d)),
    "text_readability" -> (TextAnalysis.readability _),
    "text_line_dedup" -> ((s: SparkSession, d: String) => TextAnalysis.lineDedup(s, d)),
    "q_theilsen" -> (QuerySurface.theilSen _),
    "q_kendall" -> (QuerySurface.kendall _),
    "q_spearman" -> (QuerySurface.spearman _),
    "q_bootstrap_ci" -> ((s: SparkSession, d: String) =>
      QuerySurface.bootstrapCi(s, d)),
    "cluster_eval" -> ((s: SparkSession, d: String) =>
      Clustering.clusterEval(s, d)),
    "text_zipf" -> (TextAnalysis.zipf _),
    "sim_ann_mrr" -> ((s: SparkSession, d: String) => Similarity.annMrr(s, d)),
    "stream_boot" -> ((s: SparkSession, d: String) =>
      graft.streaming.StreamGate.bootWindows(s, d)),
    "q_gini" -> (QuerySurface.gini _),
    "sim_ann_ivf_tbl" -> ((s: SparkSession, d: String) =>
      Similarity.annIvfFromTable(s, d)),
    "dedup_split_leakage" -> ((s: SparkSession, d: String) =>
      Dedup.splitLeakage(s, d)),
  )

  /** DuckDB oracles. Writing rules (see graft.operators.Tables):
    * decimal-cast SUM/AVG, epoch-µs timestamps, deterministic total ORDER BY,
    * BIGINT counts, identical expression association as the Spark side. */
  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT event_id, event_type, value FROM events ORDER BY event_id LIMIT 100""",

    "q_filter_time" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |ORDER BY event_id""".stripMargin,

    "q_filter_in" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE event_type IN ('error', 'purchase') AND value > 150.0
        |ORDER BY event_id""".stripMargin,

    "q_topk" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY value DESC, event_id LIMIT 25""".stripMargin,

    "q_groupby_count" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type""".stripMargin,

    "q_time_bucket_agg" ->
      s"""SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type,
        |  count(*) AS n,
        |  ${operators.Tables.portableRound6Sql("CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value)")} AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY day_us, event_type""".stripMargin,

    "q_scalar_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
        |  l_extendedprice * l_discount AS discount_amt
        |FROM lineitem WHERE l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_join_equi" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,4))), 2) AS DOUBLE) AS total_revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_hist_buckets" ->
      """WITH b AS (
        |  SELECT event_type, CAST(least(floor(value / 50.0), 9.0) AS BIGINT) AS bucket,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), c AS (
        |  SELECT event_type, bucket,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS total
        |  FROM b
        |)
        |SELECT event_type, min(bucket) AS p95_bucket, min(bucket) * 50.0 AS p95_lower_bound
        |FROM c WHERE cum >= 0.95 * total GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_partition_prune" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(28,4))), 2) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) = 15
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
        |ORDER BY event_id""".stripMargin,

    "q_agg_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_window_rank" ->
      """WITH c AS (
        |  SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT event_type, user_id, n,
        |    CAST(rank() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS BIGINT) AS rnk
        |  FROM c
        |)
        |SELECT event_type, rnk, user_id, n FROM r WHERE rnk <= 3
        |ORDER BY event_type, rnk, user_id""".stripMargin,

    "q_set_ops" ->
      """SELECT user_id FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 200.0
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 200.0
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'signup' AND value > 300.0
        |) ORDER BY user_id""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |  coalesce(epoch_us(date_trunc('day', ts)), -1) AS day_us,
        |  count(*) AS n
        |FROM events
        |GROUP BY ROLLUP (event_type, date_trunc('day', ts))
        |ORDER BY event_type, day_us""".stripMargin,

    "q_pivot" -> QuerySurface.pivotReturnsOracleSql,
    "q_unpivot" -> QuerySurface.unpivotMeasuresOracleSql,
    "q_cube" -> QuerySurface.cubeCountsOracleSql,
    "q_running_total" -> QuerySurface.runningTotalOracleSql,
    "q_event_rate" -> QuerySurface.eventRateOracleSql,
    "q_outer_join" -> QuerySurface.outerJoinDailyOracleSql,
    "q_anti_join" -> QuerySurface.antiJoinOracleSql,
    "q_corr_subquery" -> QuerySurface.corrSubqueryOracleSql,
    "q_gap_fill" -> QuerySurface.gapFillOracleSql,
    "q_moving_avg" -> QuerySurface.movingAvgOracleSql,
    "q_semi_join" -> QuerySurface.semiJoinOracleSql,
    "q_grouping_sets" -> QuerySurface.groupingSetsOracleSql,
    "q_session_window" -> QuerySurface.sessionWindowOracleSql,

    "text_top_terms" -> TextAnalysis.topTermsOracleSql(),

    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |), s AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > 1800000000
        |         OR lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |), sid AS (
        |  SELECT user_id, ts_us,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM s
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
        |FROM sid GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,

    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,4))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,4))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_charge,
        |  ${operators.Tables.portableRound6Sql("CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity)")} AS avg_qty,
        |  ${operators.Tables.portableRound6Sql("CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_extendedprice)")} AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_top_orders" ->
      """SELECT l_orderkey, epoch_us(o_orderdate) AS orderdate_us,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY r_name, n_name""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id,
        |  doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical,
        |  count(*) OVER (PARTITION BY md5(text)) AS dup_group_size
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM toks, unnest(range(1, len(w) - 1)) AS t(i)
        |), hs AS (
        |  SELECT DISTINCT doc_id,
        |    CAST(md5_number_lower(shingle) & 9223372036854775807 AS BIGINT) AS h
        |  FROM sh
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
        |  FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id1, id2, c / (sa.n + sb.n - c) AS jaccard
        |FROM inter JOIN sizes sa ON id1 = sa.doc_id JOIN sizes sb ON id2 = sb.doc_id
        |WHERE c / (sa.n + sb.n - c) >= 0.3
        |ORDER BY id1, id2""".stripMargin,

    "sim_cosine_pairs" ->
      s"""WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        |  WHERE list_dot_product(v, v) > 0 AND NOT isnan(list_dot_product(v, v))
        |)
        |SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  ${operators.Tables.portableRound6Sql("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")} AS cos
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE ${operators.Tables.portableRound6Sql("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")} >= 0.4
        |ORDER BY id1, id2""".stripMargin,

    "sim_topk" ->
      s"""WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        |  WHERE list_dot_product(v, v) > 0 AND NOT isnan(list_dot_product(v, v))
        |), s AS (
        |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
        |    ${operators.Tables.portableRound6Sql("list_dot_product(q.v, x.v) / (q.nrm * x.nrm)")} AS cos
        |  FROM n q JOIN n x ON q.vec_id < 8 AND q.vec_id <> x.vec_id
        |), r AS (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM s
        |)
        |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, cos
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(length(text) AS BIGINT) / CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""WITH b AS (
        |  ${operators.TextAnalysis.qualityCountsSqlCte}
        |)
        |SELECT doc_id, n_tokens, n_distinct, n_stop,
        |  n_stop / n_tokens AS stopword_ratio,
        |  n_distinct / n_tokens AS diversity,
        |  ${operators.TextAnalysis.qualityScoreSqlExpr("n_distinct", "n_stop", "n_tokens")} AS quality_score
        |FROM b ORDER BY doc_id""".stripMargin,

    "text_quality_ntile" -> operators.TextAnalysis.qualityNtileOracleSql,

    "q_decay_agg" -> operators.QuerySurface.decayAggOracleSql,
    "q_fuzzy_join" -> operators.QuerySurface.fuzzyJoinOracleSql(),
    "text_bm25" -> operators.TextAnalysis.bm25OracleSql(),
    "q_bfs" -> operators.Graph.bfsHopsOracleSql(),
    "dedup_semantic" -> operators.Similarity.semanticDedupOracleSql(),
    "sim_mmr" -> operators.Similarity.mmrOracleSql(),
    "text_collocations" -> operators.TextAnalysis.collocationsOracleSql(),
    "q_table_diff" -> operators.Mutations.tableDiffOracleSql,
    "sim_knn_graph" -> operators.Similarity.knnGraphOracleSql(),
    "sim_knn_descent" -> operators.Similarity.knnDescentOracleSql(),
    "sample_coreset" -> operators.Similarity.coresetKCenterOracleSql(),
    "sample_token_budget" -> operators.Sampling.sampleTokenBudgetOracleSql,
    "mix_token_budget" -> operators.Sampling.mixTokenBudgetOracleSql,
    "q_hits" -> operators.Graph.hitsOracleSql(),

    "q_kcore" -> operators.Graph.kcoreOracleSql(),
    "q_anomaly" -> operators.QuerySurface.anomalyZscoreOracleSql(),
    "q_event_paths" -> operators.QuerySurface.eventPathsOracleSql(),
    "dedup_span_coverage" -> operators.Dedup.spanCoverageOracleSql,
    "sample_reservoir" -> operators.Sampling.sampleReservoirOracleSql(),
    "sim_ann_pq" -> operators.Similarity.annPqOracleSql(),
    "q_delta_agg" -> operators.Mutations.deltaAggOracleSql,
    "text_keywords" -> operators.TextAnalysis.keywordsOracleSql(),
    "q_hilbert" -> operators.Bucketing.hilbertKeysOracleSql,
    "q_sssp" -> operators.Graph.ssspOracleSql(),
    "q_er_clusters" -> operators.QuerySurface.erClustersOracleSql(),
    "text_tfidf_pairs" -> operators.TextAnalysis.tfidfPairsOracleSql(),
    "q_basket_pairs" -> operators.QuerySurface.basketPairsOracleSql(),
    "q_trend" -> operators.QuerySurface.trendFitOracleSql,
    "q_ab_test" -> operators.QuerySurface.abTestOracleSql,
    "q_dq_checks" -> operators.QuerySurface.dqChecksOracleSql,
    "q_tvd_drift" -> operators.QuerySurface.tvdDriftOracleSql,
    "q_k_anonymity" -> operators.QuerySurface.kAnonymityOracleSql(),
    "pack_chunks_overlap" -> operators.Sampling.chunkOverlapOracleSql(),
    "q_assortativity" -> operators.Graph.assortativityOracleSql,
    "sim_rrf" -> operators.Similarity.rrfFusionOracleSql(),
    "otel_critical_path" -> OtelQueries.criticalPathOracleSql(),
    "otel_log_templates" -> OtelQueries.goldenLogTemplatesOracleSql,
    "q_cms_topk" -> operators.Sketches.cmsTopkOracleSql,
    "q_markov" -> operators.QuerySurface.markovTransitionsOracleSql,
    "q_chi2" -> operators.QuerySurface.chiSquaredOracleSql,
    "q_label_prop" -> operators.Graph.labelPropOracleSql(),
    "q_zone_map" -> operators.Bucketing.zoneMapAuditOracleSql,
    "q_weighted_quantile" -> operators.QuerySurface.weightedQuantileOracleSql,
    "q_lorenz" -> operators.QuerySurface.lorenzDecilesOracleSql,
    "q_ppr" -> operators.Graph.personalizedPageRankOracleSql(),
    "mix_temperature" -> operators.Sampling.mixTemperatureOracleSql,
    "q_funnel_windowed" -> operators.QuerySurface.funnelWindowedOracleSql(),
    "otel_error_slo" -> OtelQueries.goldenErrorRateSloOracleSql,
    "sim_threshold_curve" -> operators.Similarity.thresholdCurveOracleSql,
    "sample_balanced" -> operators.Sampling.sampleBalancedOracleSql,
    "q_percentile_ts" -> operators.QuerySurface.percentileTsOracleSql,
    "otel_span_pct" -> OtelQueries.spanDurationPctOracleSql(),
    "pack_shards" -> operators.Sampling.packShardsOracleSql,
    "mm_exact_dup" -> operators.Multimodal.exactDupGroupsOracleSql,
    "text_boilerplate" -> operators.TextAnalysis.boilerplateOracleSql,
    "text_vocab_growth" -> operators.TextAnalysis.vocabGrowthOracleSql,
    "otel_service_graph" -> OtelQueries.serviceGraphOracleSql(),
    "otel_tail_sampling" -> OtelQueries.tailSamplingOracleSql(),
    "otel_red_metrics" -> OtelQueries.redMetricsOracleSql(),
    "text_quality_classifier" -> operators.TextAnalysis.qualityClassifierOracleSql,
    "sim_ann_recall" -> operators.Similarity.annRecallOracleSql(),
    "pipe_curation" -> operators.TextAnalysis.curationPipelineOracleSql,
    "dedup_survivors_quality" -> operators.Dedup.dedupSurvivorsQualityOracleSql(),
    "stream_red" -> graft.streaming.StreamGate.redWindowsOracleSql,
    "otel_hist_merge" -> OtelQueries.histMergeOracleSql(),
    "sample_kfold" -> operators.Sampling.sampleKfoldOracleSql(),
    "mix_epoch_order" -> operators.Sampling.epochOrderOracleSql(),
    "q_kmv_rollup" -> operators.Sketches.kmvRollupOracleSql(),
    "q_qsketch_rollup" -> operators.Sketches.qsketchRollupOracleSql(),
    "q_attribution" -> operators.QuerySurface.attributionOracleSql,
    "q_cusum" -> operators.QuerySurface.cusumChangepointOracleSql,
    "q_seasonality" -> operators.QuerySurface.dowSeasonalityOracleSql,
    "otel_hist_rebucket" -> OtelQueries.histRebucketOracleSql(),
    "dedup_lsh_eval" -> operators.Dedup.lshEvalOracleSql(),
    "stream_hist" -> graft.streaming.StreamGate.histWindowsOracleSql,

    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        |), c AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(w, x -> list_contains(['der','die','das','und','ist'], x))) AS BIGINT) AS c_de,
        |    CAST(len(list_filter(w, x -> list_contains(['the','a','of','and','is'], x))) AS BIGINT) AS c_en,
        |    CAST(len(list_filter(w, x -> list_contains(['el','la','los','las','es'], x))) AS BIGINT) AS c_es,
        |    CAST(len(list_filter(w, x -> list_contains(['le','les','des','et','est'], x))) AS BIGINT) AS c_fr,
        |    CAST(len(list_filter(w, x -> list_contains(['的','了','是','在','和'], x))) AS BIGINT) AS c_zh
        |  FROM t
        |), m AS (
        |  SELECT *, greatest(c_de, c_en, c_es, c_fr, c_zh) AS mx FROM c
        |)
        |SELECT doc_id, lang, c_de, c_en, c_es, c_fr, c_zh,
        |  CASE WHEN c_de = mx AND mx > 0 THEN 'de'
        |       WHEN c_en = mx AND mx > 0 THEN 'en'
        |       WHEN c_es = mx AND mx > 0 THEN 'es'
        |       WHEN c_fr = mx AND mx > 0 THEN 'fr'
        |       WHEN c_zh = mx AND mx > 0 THEN 'zh'
        |       ELSE 'und' END AS pred_lang,
        |  (CASE WHEN c_de = mx AND mx > 0 THEN 'de'
        |        WHEN c_en = mx AND mx > 0 THEN 'en'
        |        WHEN c_es = mx AND mx > 0 THEN 'es'
        |        WHEN c_fr = mx AND mx > 0 THEN 'fr'
        |        WHEN c_zh = mx AND mx > 0 THEN 'zh'
        |        ELSE 'und' END) = lang AS is_correct
        |FROM m ORDER BY doc_id""".stripMargin,

    "mm_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(len(list_filter(string_split(text, ''),
        |    ch -> CAST(least(floor(unicode(ch) / 32), 3) AS BIGINT) = 0)) AS BIGINT) AS f0,
        |  CAST(len(list_filter(string_split(text, ''),
        |    ch -> CAST(least(floor(unicode(ch) / 32), 3) AS BIGINT) = 1)) AS BIGINT) AS f1,
        |  CAST(len(list_filter(string_split(text, ''),
        |    ch -> CAST(least(floor(unicode(ch) / 32), 3) AS BIGINT) = 2)) AS BIGINT) AS f2,
        |  CAST(len(list_filter(string_split(text, ''),
        |    ch -> CAST(least(floor(unicode(ch) / 32), 3) AS BIGINT) = 3)) AS BIGINT) AS f3
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha256, md5(text) AS md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // -- generated oracles: hash constants/PRNG coefficients inlined --
    "dedup_jaccard_capped" -> operators.Dedup.ngramJaccardCappedOracleSql(),
    "dedup_groups" -> operators.Dedup.nearDupGroupsOracleSql(),
    "dedup_survivors" -> operators.Dedup.dedupSurvivorsOracleSql(),
    "dedup_minhash_lsh" -> operators.Dedup.minhashOracleSql(),
    "dedup_incremental" -> operators.Dedup.dedupIncrementalOracleSql(),
    // the maintained-index form is hash-identical to the self-contained
    // probe by construction (the index equals a one-shot corpus banding),
    // so it shares the oracle
    "dedup_incremental_tbl" -> operators.Dedup.dedupIncrementalOracleSql(),
    "dedup_substring" -> operators.Dedup.dedupSubstringOracleSql(),
    "dedup_simhash" -> operators.Dedup.simhashOracleSql(),
    "dedup_embedding_lsh" -> operators.Similarity.cosinePairsLshOracleSql(),
    "sim_ann_lsh" -> operators.Similarity.annLshOracleSql(),
    "sim_ann_ivf" -> operators.Similarity.annIvfOracleSql(),
    "text_fingerprint" -> operators.TextAnalysis.fingerprintOracleSql,
    "sample_split" -> Sampling.sampleSplitOracleSql,
    "pack_sequences" -> Sampling.packSequencesOracleSql(),
    "cluster_kmeans" -> Clustering.kmeansOracleSql(),
    "cluster_prune_prototypes" -> Clustering.prunePrototypesOracleSql(),
    "dedup_decontaminate" -> Sampling.decontaminateOracleSql(),
    "mix_source_stats" -> Sampling.sourceMixStatsOracleSql,
    "text_repetition" -> TextAnalysis.repetitionOracleSql,
    "mm_frame_stats" -> Multimodal.frameStatsOracleSql(),
    "otel_sev_counts" -> OtelQueries.goldenSevCountsOracleSql,
    "otel_slow_spans" -> OtelQueries.goldenSlowSpansOracleSql,
    "otel_trace_log_join" -> OtelQueries.goldenTraceLogJoinOracleSql,
    "otel_hist_p95" -> OtelQueries.goldenHistP95OracleSql,
    "otel_hist_p95_scale" -> OtelQueries.histP95AtScaleOracleSql(),
    "otel_exp_hist_p95_scale" -> OtelQueries.expHistP95AtScaleOracleSql(),
    "otel_exp_hist_p95" -> OtelQueries.goldenExpHistP95OracleSql,
    "otel_gauge_hourly" -> OtelQueries.goldenGaugeHourlyOracleSql,
    "otel_sum_totals" -> OtelQueries.goldenSumTotalsOracleSql,
    "otel_trace_depth" -> OtelQueries.goldenTraceDepthOracleSql,

    "sim_ann_ivf_kmeans" -> Similarity.annIvfKmeansOracleSql(),

    "sim_quantize" -> Similarity.quantizeOracleSql,
    "sim_rp_project" -> Similarity.randomProjectionOracleSql,

    "dedup_cross" -> Dedup.crossDedupOracleSql(),

    "sample_stratified" -> Sampling.sampleStratifiedOracleSql(),
    "sample_dsir" -> Sampling.sampleDsirOracleSql,
    "sample_weighted" -> Sampling.sampleWeightedOracleSql(),

    "q_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
        |), p AS (
        |  SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'
        |)
        |SELECT p.event_id, p.user_id, p.ts_us,
        |  c.event_id AS click_event_id, c.ts_us AS click_ts_us,
        |  p.ts_us - c.ts_us AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
        |ORDER BY p.event_id""".stripMargin,

    "q_range_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
        |), err AS (
        |  SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'error'
        |), clk AS (
        |  SELECT user_id, ts_us AS click_ts FROM e WHERE event_type = 'click'
        |), m AS (
        |  SELECT err.event_id, count(*) AS n_near_clicks,
        |    min(abs(err.ts_us - clk.click_ts)) AS min_abs_gap_us
        |  FROM err JOIN clk ON err.user_id = clk.user_id
        |    AND abs(err.ts_us - clk.click_ts) <= 300000000
        |  GROUP BY 1
        |)
        |SELECT err.event_id, err.user_id, err.ts_us,
        |  coalesce(m.n_near_clicks, 0) AS n_near_clicks, m.min_abs_gap_us
        |FROM err LEFT JOIN m USING (event_id)
        |ORDER BY err.event_id""".stripMargin,

    "stream_window_counts" -> graft.streaming.StreamGate.windowCountsOracleSql,
    "stream_sessionize" -> graft.streaming.StreamGate.sessionizeOracleSql,
    "stream_dedup" -> graft.streaming.StreamGate.dedupKeysOracleSql,
    // the streaming index probe is hash-identical to the batch incremental
    // dedup by construction (same candidates, verify, ranking)
    "stream_dedup_lsh" -> operators.Dedup.dedupIncrementalOracleSql(),
    "stream_dedup_lsh_multi" -> operators.Dedup.dedupIncrementalMultiOracleSql(),
    "stream_dedup_lsh_pruned" -> operators.Dedup.dedupLshPrunedStreamOracleSql(),
    "stream_enrich_join" -> graft.streaming.StreamGate.enrichJoinOracleSql,
    "stream_stream_join" -> graft.streaming.StreamGate.streamStreamJoinOracleSql,
    "stream_upsert" -> graft.streaming.StreamGate.upsertSnapshotOracleSql,
    // batch/stream parity: the custom-state streaming anomaly gate reuses
    // the batch operator's oracle VERBATIM (single-batch replay ⇒ identical
    // flags — the parity is the checked property)
    "stream_anomaly" -> operators.QuerySurface.anomalyZscoreOracleSql(),
    "stream_cms" -> graft.streaming.StreamGate.cmsWindowsOracleSql,
    "stream_qsketch" -> graft.streaming.StreamGate.qsketchWindowsOracleSql,

    "q_approx_distinct" -> Sketches.approxDistinctKmvOracleSql,
    "q_approx_distinct_est" -> Sketches.approxDistinctKmvEstimateOracleSql,
    "q_heavy_hitters" -> Sketches.heavyHittersOracleSql,
    "q_median_disc" -> Sketches.medianDiscOracleSql,
    "q_approx_percentile" -> Sketches.approxPercentileOracleSql,
    "q_percentile_cont" -> Sketches.percentileContOracleSql,
    "q_corr" -> Sketches.corrStatsOracleSql,
    "q_bloom_join" -> Sketches.bloomJoinOracleSql,
    "dedup_passage" -> Dedup.passageDedupOracleSql,
    "text_inverted_index" -> TextAnalysis.invertedIndexOracleSql,
    "text_rarity" -> TextAnalysis.rarityOracleSql,

    "q_salted_agg" -> Sketches.saltedAggOracleSql,
    "q_profile" -> Sketches.groupProfileOracleSql,
    "text_pii_scrub" -> TextAnalysis.piiScrubOracleSql,
    "q_cdc_apply" -> Mutations.cdcApplyOracleSql,
    "q_zorder" -> Bucketing.zOrderKeysOracleSql,
    "q_pagerank" -> Graph.pageRankOracleSql(),
    "q_skyline" -> QuerySurface.skylineOracleSql,
    "q_kmv_overlap" -> Sketches.kmvOverlapOracleSql,
    "text_lm_score" -> TextAnalysis.lmScoreOracleSql,
    "q_funnel" -> QuerySurface.funnelOracleSql,
    "q_retention" -> QuerySurface.retentionOracleSql,
    "mm_near_dup" -> Multimodal.nearDupMediaOracleSql(),
    "q_join_card" -> Sketches.joinCardProbeOracleSql,
    "q_equi_depth" -> Sketches.equiDepthOracleSql,
    "q_zorder_ranked" -> Bucketing.zOrderKeysRankedOracleSql,
    "q_multi_distinct" -> QuerySurface.multiDistinctOracleSql,
    "q_window_stats" -> QuerySurface.windowStatsOracleSql,
    "q_outliers" -> Sketches.outlierFencesOracleSql,
    "q_scd2" -> QuerySurface.scd2OracleSql,
    "q_triangles" -> Graph.trianglesOracleSql(degreeOrdered = false),
    "q_triangles_degree" -> Graph.trianglesOracleSql(degreeOrdered = true),

    // table-fed graph gates: the oracle derives the backbone from the base
    // tables (DuckDB sees only those) — passing hashes PROVE the
    // materialized table round-trips bit-identically
    "q_triangles_tbl" -> Graph.trianglesOracleSql(degreeOrdered = true),
    "q_bfs_tbl" -> Graph.bfsHopsOracleSql(),
    "q_sssp_tbl" -> Graph.ssspOracleSql(),
    "q_kcore_tbl" -> Graph.kcoreOracleSql(),
    "q_label_prop_tbl" -> Graph.labelPropOracleSql(),
    "q_assortativity_tbl" -> Graph.assortativityOracleSql,
    "q_pagerank_tbl" -> Graph.pageRankOracleSql(),
    "q_ppr_tbl" -> Graph.personalizedPageRankOracleSql(),
    "dedup_lsh_eval_sampled" -> Dedup.lshEvalSampledOracleSql(),
    "mm_png_near_dup" -> Multimodal.pngNearDupOracleSql(),
    "mm_crossmodal_consensus" -> Multimodal.crossModalConsensusOracleSql(),
    "otel_burn_rate" -> OtelQueries.burnRateOracleSql,
    "text_chunking" -> TextAnalysis.chunkingOracleSql,
    "stream_burn" -> graft.streaming.StreamGate.burnWindowsOracleSql,
    "sim_centroid_drift" -> Similarity.centroidDriftOracleSql,
    "sim_hard_negatives" -> Similarity.hardNegativesOracleSql(),
    "sim_ann_ivfpq" -> Similarity.annIvfPqOracleSql(),
    // bit-identical to the in-plan form by construction (shared ivfPqQuery,
    // exact parquet round-trip) — same oracle, the sim_ann_ivf_tbl precedent
    "sim_ann_ivfpq_tbl" -> Similarity.annIvfPqOracleSql(),
    // base-fit codebooks + full-corpus encode = the maintained index state
    // after the late-arrival upsert (build on base, add with existing books)
    "sim_ann_ivfpq_upsert" -> Similarity.annIvfPqOracleSql(fitWhere =
      Some(s"vec_id % ${Similarity.IvfPqUpsertMod} <> 1")),
    // the streaming maintenance loop lands the EXACT index state of the
    // one-shot upsert (fixed codebooks, disjoint batch ids — see the gate
    // scaladoc), so it shares the upsert's twin
    "stream_ann_ivfpq" -> Similarity.annIvfPqOracleSql(fitWhere =
      Some(s"vec_id % ${Similarity.IvfPqUpsertMod} <> 1")),
    "sim_knn_descent_conv" -> Similarity.knnDescentConvergenceOracleSql(),
    "text_chunk_delta" -> TextAnalysis.chunkDeltaOracleSql,
    "q_mannwhitney" -> operators.QuerySurface.mannWhitneyOracleSql,
    "q_ks_test" -> operators.QuerySurface.ksTestOracleSql,
    "q_benford" -> operators.QuerySurface.benfordOracleSql,
    "otel_apdex" -> OtelQueries.apdexOracleSql(),
    "text_bpe_merges" -> TextAnalysis.bpeMergesOracleSql,
    "text_bpe_encode" -> TextAnalysis.bpeEncodeOracleSql,
    "text_cdc_chunks" -> TextAnalysis.cdcChunksOracleSql,
    "q_acf" -> operators.QuerySurface.acfOracleSql,
    "q_ols" -> operators.QuerySurface.olsOracleSql,
    "q_mad_outliers" -> operators.QuerySurface.madOutliersOracleSql,
    "otel_root_cause" -> OtelQueries.errorRootCauseOracleSql(),
    "dedup_containment" -> operators.Dedup.shingleContainmentOracleSql(),
    "otel_self_time" -> OtelQueries.selfTimeOracleSql(),
    "pair_preference" -> operators.Sampling.preferencePairsOracleSql,
    "q_winsorize" -> operators.QuerySurface.winsorizeOracleSql,
    "text_novelty" -> TextAnalysis.noveltyOracleSql,
    "q_snaive" -> operators.QuerySurface.seasonalNaiveOracleSql,
    "mix_simpson" -> operators.Sampling.mixSimpsonOracleSql,
    "q_fano" -> operators.QuerySurface.fanoOracleSql,
    "otel_exemplars" -> OtelQueries.exemplarsOracleSql(),
    "q_sax" -> operators.QuerySurface.saxOracleSql,
    "q_topn_share" -> operators.QuerySurface.topNShareOracleSql(),
    "text_readability" -> TextAnalysis.readabilityOracleSql,
    "text_line_dedup" -> TextAnalysis.lineDedupOracleSql,
    "q_theilsen" -> operators.QuerySurface.theilSenOracleSql,
    "q_kendall" -> operators.QuerySurface.kendallOracleSql,
    "q_spearman" -> operators.QuerySurface.spearmanOracleSql,
    "q_bootstrap_ci" -> operators.QuerySurface.bootstrapCiOracleSql(),
    "cluster_eval" -> operators.Clustering.clusterEvalOracleSql(),
    "text_zipf" -> TextAnalysis.zipfOracleSql,
    "sim_ann_mrr" -> operators.Similarity.annMrrOracleSql(),
    "stream_boot" -> graft.streaming.StreamGate.bootWindowsOracleSql(),
    "q_gini" -> operators.QuerySurface.giniOracleSql,
    // the _tbl twin shares the in-plan gate's oracle: results must be
    // bit-identical (the materialized index round-trips doubles exactly)
    "sim_ann_ivf_tbl" -> operators.Similarity.annIvfOracleSql(),
    "dedup_split_leakage" -> operators.Dedup.splitLeakageOracleSql(),
  )
}
