package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.RelationalOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB-equivalent in `oracleSql` (same
  * column names, same value normalization — timestamps exposed as epoch
  * millis bigints because the testdata `events.ts` is nanosecond-precision,
  * which Spark reads as long and DuckDB as TIMESTAMP_NS).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the SURVEY §7.3 end-to-end slice: changelog replay → incremental
    * 3-way join → keyed MOR upsert sink → snapshot read. */
  def entry(spark: SparkSession): DataFrame =
    graft.streaming.PipelineQueries.ticketView(spark, "/root/testdata/sf0.001")

  /** Gate entries. Every entry has a DuckDB oracle in [[oracleSql]] EXCEPT
    * three that are rows-only BY DESIGN — their production hash family
    * (xxhash64 / Spark murmur3) has no DuckDB equivalent, so each is
    * instead pinned by an ORACLE-GREEN portable twin (same algorithm over
    * md5, which both engines share) and/or an exact-ground-truth recall
    * spec. Do not re-litigate these; the mapping (also in COVERAGE.md):
    *   d4_embed_neardup   → exact d7_embed_neardup_exact (recall ≥0.8 spec)
    *   s11_ann_ivf        → twin s18_ann_ivf_portable (recall ≥0.6 spec)
    *   t3_text_enrich     → twin t25_enrich_portable (composed output:
    *                        lang_pred + quality + md5-family fingerprint)
    * s10_ann_lsh left this set in r14: the entry is now the fixed-plane
    * MULTI-PROBE pipeline (md5 planes + 1-bit-flip probes — pure integer
    * XOR an independent engine replays), oracle-checked bit-for-bit; the
    * xxhash plane family (Similarity.lshTopK) stays the documented
    * production source, recall-pinned in SimilaritySpec.
    * The dedup family (d2/d3/d5) oracle-checks DIRECTLY since round 11:
    * the portable md5 hash family is the gate-scale default (xxhash sits
    * behind the `family = "xx"` flag for raw throughput at 100 TB — same
    * plan shape, different digests); d8/d9/d11 remain as independent pins
    * of the sketch machinery at other parameters.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r1_full_scan"       -> ((s, d) => RelationalOps.fullScan(s, d)),
    "r4_filter_eq"       -> ((s, d) => RelationalOps.filterEq(s, d)),
    "r6_project_alias"   -> ((s, d) => RelationalOps.projectAlias(s, d)),
    "r7_cast"            -> ((s, d) => RelationalOps.castCols(s, d)),
    "r8_triple_join"     -> ((s, d) => RelationalOps.tripleJoin(s, d)),
    "r9_agg_count"       -> ((s, d) => RelationalOps.aggCount(s, d)),
    "r10_having_subquery" -> ((s, d) => RelationalOps.havingSubquery(s, d)),
    "r11_topk"           -> ((s, d) => RelationalOps.topK(s, d)),
    "r12_dedup_lww"      -> ((s, d) => RelationalOps.dedupLastWriteWins(s, d)),
    "r13_json_extract"   -> ((s, d) => RelationalOps.jsonExtract(s, d)),
    "r14_tumble_agg"     -> ((s, d) => RelationalOps.tumbleAgg(s, d)),
    "r15_sessionize"     -> ((s, d) => RelationalOps.sessionize(s, d)),
    "r2_changelog_materialize" -> ((s, d) => graft.sources.ChangelogQueries.materializeEvents(s, d)),
    "s7_mor_upsert_replay" -> ((s, d) => graft.lake.LakeQueries.upsertReplay(s, d)),
    "s47_savepoint_restore" -> ((s, d) => graft.lake.LakeQueries.rollbackRestore(s, d)),
    "s67_read_optimized"  -> ((s, d) => graft.lake.LakeQueries.readOptimizedView(s, d)),
    "s71_bootstrap"       -> ((s, d) => graft.lake.LakeQueries.bootstrapOnboard(s, d)),
    "s72_clone"           -> ((s, d) => graft.lake.LakeQueries.shallowClone(s, d)),
    "s74_part_clone"      -> ((s, d) => graft.lake.LakeQueries.partShallowClone(s, d)),
    "s75_part_bootstrap"  -> ((s, d) => graft.lake.LakeQueries.partBootstrapOnboard(s, d)),
    "s76_clone_of_bootstrap" -> ((s, d) => graft.lake.LakeQueries.cloneOfBootstrap(s, d)),
    "s77_metadata_count"  -> ((s, d) => graft.lake.LakeQueries.metadataCount(s, d)),
    "s78_part_range_read" -> ((s, d) => graft.lake.LakeQueries.partRangeRead(s, d)),
    "s79_record_index"    -> ((s, d) => graft.lake.LakeQueries.recordIndexRead(s, d)),
    "s80_part_record_index" -> ((s, d) => graft.lake.LakeQueries.partRecordIndexRead(s, d)),
    "s81_mv_rewrite"      -> ((s, d) => graft.lake.LakeQueries.viewRewriteRead(s, d)),
    "s82_part_secondary_index" -> ((s, d) => graft.lake.LakeQueries.partSecondaryIndexRead(s, d)),
    "s83_stream_mv"       -> ((s, d) => graft.lake.LakeQueries.streamMvRead(s, d)),
    "s85_matview_ddl"     -> ((s, d) => graft.lake.LakeQueries.matViewDdl(s, d)),
    "s86_matview_rollup"  -> ((s, d) => graft.lake.LakeQueries.matViewRollup(s, d)),
    "s87_part_matview"    -> ((s, d) => graft.lake.LakeQueries.partMatViewRead(s, d)),
    "s88_composite_key_index" -> ((s, d) =>
      graft.lake.LakeQueries.compositeKeyIndexRead(s, d)),
    "s89_filtered_matview" -> ((s, d) =>
      graft.lake.LakeQueries.filteredMatViewRead(s, d)),
    "s84_access_policy"   -> ((s, d) => graft.lake.LakeQueries.accessPolicyRead(s, d)),
    "s73_incr_sketch_index" -> ((s, d) =>
      graft.lake.LakeQueries.incrementalSketchIndex(s, d)),
    "d31_incr_dedup"      -> ((s, d) =>
      graft.lake.LakeQueries.incrementalDedup(s, d)),
    "s53_sql_procedures"  -> ((s, d) => graft.lake.LakeQueries.sqlProcedures(s, d)),
    "s54_write_index_tagging" -> ((s, d) => graft.lake.LakeQueries.writeIndexTagging(s, d)),
    "s55_partial_update"  -> ((s, d) => graft.lake.LakeQueries.partialUpdate(s, d)),
    "s56_cdc_wire_loop"   -> ((s, d) => graft.lake.LakeQueries.cdcWireLoop(s, d)),
    "s57_part_savepoint"  -> ((s, d) => graft.lake.LakeQueries.partRollbackRestore(s, d)),
    "s65_part_time_travel" -> ((s, d) => graft.lake.LakeQueries.partTimeTravel(s, d)),
    "s66_write_expectations" -> ((s, d) => graft.lake.LakeQueries.writeExpectations(s, d)),
    "s68_quarantine"      -> ((s, d) => graft.lake.LakeQueries.quarantineExpectations(s, d)),
    "s58_part_write_tagging" -> ((s, d) => graft.lake.LakeQueries.partWriteIndexTagging(s, d)),
    "s59_lake_funnel"     -> ((s, d) => graft.lake.LakeQueries.lakeFunnel(s, d)),
    "s48_partition_ttl"   -> ((s, d) => graft.lake.LakeQueries.partitionTtl(s, d)),
    "s69_show_partitions" -> ((s, d) => graft.lake.LakeQueries.showPartitions(s, d)),
    "s70_incr_quality_index" -> ((s, d) => graft.lake.LakeQueries.incrementalQualityIndex(s, d)),
    "s13_mor_partitioned" -> ((s, d) => graft.lake.LakeQueries.partitionedReplay(s, d)),
    "s28_manifest_read"   -> ((s, d) => graft.lake.LakeQueries.manifestRead(s, d)),
    "s31_part_manifest_read" -> ((s, d) => graft.lake.LakeQueries.partManifestRead(s, d)),
    "s34_schema_evolution" -> ((s, d) => graft.lake.LakeQueries.schemaEvolution(s, d)),
    "s35_sketch_lake"     -> ((s, d) => graft.lake.LakeQueries.sketchLake(s, d)),
    "s29_point_read"      -> ((s, d) => graft.lake.LakeQueries.pointRead(s, d)),
    "s64_point_read_join" -> ((s, d) => graft.lake.LakeQueries.pointReadJoin(s, d)),
    "s49_bloom_point_read" -> ((s, d) => graft.lake.LakeQueries.bloomPointRead(s, d)),
    "s50_part_point_read" -> ((s, d) => graft.lake.LakeQueries.partPointRead(s, d)),
    "s51_secondary_index" -> ((s, d) => graft.lake.LakeQueries.secondaryIndexRead(s, d)),
    "s52_random_projection" -> ((s, d) => graft.functions.Similarity.randomProject(
      graft.Tables.embeddings(s, d))),
    "s30_stream_partitioned" -> ((s, d) => graft.streaming.StreamingQueries.streamPartitioned(s, d)),
    "s8_cdc_ticket_view"  -> ((s, d) => graft.streaming.PipelineQueries.ticketView(s, d)),
    "d1_exact_dedup"     -> ((s, d) => graft.functions.LlmQueries.exactDedup(s, d)),
    "d2_minhash_pairs"   -> ((s, d) => graft.functions.LlmQueries.minhashPairs(s, d)),
    "d3_simhash_pairs"   -> ((s, d) => graft.functions.LlmQueries.simhashPairs(s, d)),
    "d4_embed_neardup"   -> ((s, d) => graft.functions.LlmQueries.embedNearDup(s, d)),
    "t2_text_stats"      -> ((s, d) => graft.functions.LlmQueries.textStats(s, d)),
    "t3_text_enrich"     -> ((s, d) => graft.functions.LlmQueries.textEnrich(s, d)),
    "s9_ann_brute"       -> ((s, d) => graft.functions.LlmQueries.annBrute(s, d)),
    "s12_ann_brute_native" -> ((s, d) => graft.functions.LlmQueries.annBruteNative(s, d)),
    "s38_contrastive_mine" -> ((s, d) => graft.functions.LlmQueries.contrastiveMine(s, d)),
    "s10_ann_lsh"        -> ((s, d) => graft.functions.LlmQueries.annLsh(s, d)),
    "s11_ann_ivf"        -> ((s, d) => graft.functions.LlmQueries.annIvf(s, d)),
    "m1_multimodal_features" -> ((s, d) => graft.functions.LlmQueries.multimodalFeatures(s, d)),
    "m3_binary_neardup"   -> ((s, d) => graft.functions.LlmQueries.binaryNearDup(s, d)),
    "m2_frame_sample"     -> ((s, d) => graft.functions.Multimodal.frameSample(
      graft.functions.Multimodal.attachBinary(graft.Tables.documents(s, d)))),
    "m0_multimodal_meta"  -> ((s, d) => graft.functions.LlmQueries.multimodalMeta(s, d)),
    "d5_minhash_groups"   -> ((s, d) => graft.functions.LlmQueries.minhashGroups(s, d)),
    "d6_ngram_jaccard"    -> ((s, d) => graft.functions.LlmQueries.ngramJaccardPairs(s, d)),
    "d8_minhash_portable" -> ((s, d) => graft.functions.LlmQueries.minhashPortable(s, d)),
    "d32_edit_verify"     -> ((s, d) => graft.functions.LlmQueries.editVerifiedPairs(s, d)),
    "d27_fuzzy_join"      -> ((s, d) => graft.functions.LlmQueries.fuzzyJoinDocs(s, d)),
    "t29_boilerplate"     -> ((s, d) => graft.functions.Dedup.boilerplateShingles(
      graft.Tables.documents(s, d))),
    "d9_simhash_portable" -> ((s, d) => graft.functions.LlmQueries.simhashPortable(s, d)),
    "d7_embed_neardup_exact" -> ((s, d) => graft.functions.LlmQueries.embedNearDupExact(s, d)),
    "t4_text_quality"     -> ((s, d) => graft.functions.LlmQueries.textQuality(s, d)),
    "r16_asof_join"       -> ((s, d) => RelationalOps.asofPurchaseClick(s, d)),
    "r17_window_analytics" -> ((s, d) => RelationalOps.windowAnalytics(s, d)),
    "r18_rollup_agg"      -> ((s, d) => RelationalOps.rollupAgg(s, d)),
    "r19_salted_join"     -> ((s, d) => RelationalOps.saltedJoinOrders(s, d)),
    "t5_hash_sample"      -> ((s, d) => graft.functions.LlmQueries.hashSample(s, d)),
    "t6_quota_sample"     -> ((s, d) => graft.functions.LlmQueries.quotaSample(s, d)),
    "r25_percentiles"     -> ((s, d) => RelationalOps.percentiles(s, d)),
    "r26_stream_tumble"   -> ((s, d) => graft.streaming.StreamingQueries.streamTumble(s, d)),
    "r27_scalar_subquery" -> ((s, d) => RelationalOps.scalarSubquery(s, d)),
    "r28_range_join"      -> ((s, d) => RelationalOps.rangeJoinErrClicks(s, d)),
    "r29_cube_agg"        -> ((s, d) => RelationalOps.cubeAgg(s, d)),
    "s15_mor_time_travel" -> ((s, d) => graft.lake.LakeQueries.timeTravel(s, d)),
    "s62_sql_time_travel" -> ((s, d) => graft.lake.LakeQueries.sqlTimeTravel(s, d)),
    "s14_mor_incremental" -> ((s, d) => graft.lake.LakeQueries.incrementalPull(s, d)),
    "s16_mor_datasource"  -> ((s, d) => graft.lake.LakeQueries.datasourceReplay(s, d)),
    "s63_stream_sink"     -> ((s, d) => graft.lake.LakeQueries.streamSinkReplay(s, d)),
    "s17_mor_part_incremental" -> ((s, d) => graft.lake.LakeQueries.partitionedIncremental(s, d)),
    "s21_mor_cdc_read"    -> ((s, d) => graft.lake.LakeQueries.cdcRead(s, d)),
    "s25_part_cdc_read"   -> ((s, d) => graft.lake.LakeQueries.partitionedCdcRead(s, d)),
    "s27_row_level_ops"   -> ((s, d) => graft.lake.LakeQueries.rowLevelOps(s, d)),
    "s60_sql_row_dml"     -> ((s, d) => graft.lake.LakeQueries.sqlRowLevelOps(s, d)),
    "s61_sql_merge_into"  -> ((s, d) => graft.lake.LakeQueries.sqlMergeQuery(s, d)),
    "s22_incremental_view" -> ((s, d) => graft.lake.LakeQueries.incrementalView(s, d)),
    "s36_incr_join_view"  -> ((s, d) => graft.lake.LakeQueries.incrementalJoinView(s, d)),
    "s37_range_read"      -> ((s, d) => graft.lake.LakeQueries.rangeRead(s, d)),
    "s39_merge_into"      -> ((s, d) => graft.lake.LakeQueries.mergeQuery(s, d)),
    "s40_zorder_read"     -> ((s, d) => graft.lake.LakeQueries.zorderRead(s, d)),
    "s41_minor_compact"   -> ((s, d) => graft.lake.LakeQueries.minorCompactRead(s, d)),
    "s42_incr_text_index" -> ((s, d) => graft.lake.LakeQueries.incrementalTextIndex(s, d)),
    "s43_incr_ann_index"  -> ((s, d) => graft.lake.LakeQueries.incrementalAnnIndex(s, d)),
    "s44_temporal_join"   -> ((s, d) => graft.lake.LakeQueries.temporalJoin(s, d)),
    "s45_lake_stream_read" -> ((s, d) => graft.lake.LakeQueries.lakeStreamRead(s, d)),
    "s46_lake_replication" -> ((s, d) => graft.lake.LakeQueries.lakeReplication(s, d)),
    "s18_ann_ivf_portable" -> ((s, d) => graft.functions.LlmQueries.annIvfPortable(s, d)),
    "s20_ann_lsh_portable" -> ((s, d) => graft.functions.LlmQueries.annLshPortable(s, d)),
    "s19_sql_insert"      -> ((s, d) => graft.lake.LakeQueries.sqlInsert(s, d)),
    "d11_minhash_union"   -> ((s, d) => graft.functions.LlmQueries.minhashGroupsPortable(s, d)),
    "d12_dedup_clusters"  -> ((s, d) => graft.functions.LlmQueries.dedupClusters(s, d)),
    "d13_embed_neardup_portable" -> ((s, d) => graft.functions.LlmQueries.embedNearDupPortable(s, d)),
    "d28_embed_neardup_lsh" -> ((s, d) => graft.functions.LlmQueries.embedNearDupLshPortable(s, d)),
    "t8_curation_pipeline" -> ((s, d) => graft.functions.LlmQueries.curationPipeline(s, d)),
    "t9_sequence_pack"    -> ((s, d) => graft.functions.LlmQueries.sequencePack(s, d)),
    "t32_corpus_shards"   -> ((s, d) => graft.functions.LlmQueries.corpusShards(s, d)),
    "t33_token_budget"    -> ((s, d) => graft.functions.LlmQueries.tokenBudget(s, d)),
    "t34_epoch_shuffle"   -> ((s, d) => graft.functions.LlmQueries.epochShuffles(s, d)),
    "s23_embed_quant"     -> ((s, d) => graft.functions.LlmQueries.embedQuantize(s, d)),
    "s24_ann_quantized"   -> ((s, d) => graft.functions.LlmQueries.annQuantized(s, d)),
    "s32_pq_encode"       -> ((s, d) => graft.functions.LlmQueries.pqEncode(s, d)),
    "s33_pq_adc_ann"      -> ((s, d) => graft.functions.LlmQueries.pqAdcAnn(s, d)),
    "s26_label_centroids" -> ((s, d) => graft.functions.LlmQueries.labelCentroids(s, d)),
    "d29_kmeans"          -> ((s, d) => graft.functions.LlmQueries.kmeansClusters(s, d)),
    "t40_cluster_balance" -> ((s, d) => graft.functions.LlmQueries.clusterBalance(s, d)),
    "t10_repetition"      -> ((s, d) => graft.functions.LlmQueries.repetitionRatio(s, d)),
    "t11_decontaminate"   -> ((s, d) => graft.functions.LlmQueries.decontaminate(s, d)),
    "d26_bloom_decontaminate" -> ((s, d) => graft.functions.LlmQueries.bloomDecontaminate(s, d)),
    "t12_pii_redact"      -> ((s, d) => graft.functions.LlmQueries.piiRedact(s, d)),
    "t13_unigram_logprob" -> ((s, d) => graft.functions.LlmQueries.unigramLogProb(s, d)),
    "t14_perplexity_buckets" -> ((s, d) => graft.functions.LlmQueries.perplexityBuckets(s, d)),
    "t15_mixture_sample"  -> ((s, d) => graft.functions.LlmQueries.mixtureSample(s, d)),
    "t31_temperature_mix" -> ((s, d) => graft.operators.Sampling.temperatureSample(
      graft.Tables.documents(s, d), "lang", "doc_id", alpha = 0.5)),
    "t16_bm25"            -> ((s, d) => graft.functions.LlmQueries.bm25TopK(s, d)),
    "t43_hybrid_rrf"      -> ((s, d) => graft.functions.LlmQueries.hybridRrf(s, d)),
    "t44_mmr_rerank"      -> ((s, d) => graft.functions.LlmQueries.mmrRerank(s, d)),
    "t17_mixture_epochs"  -> ((s, d) => graft.functions.LlmQueries.mixtureEpochs(s, d)),
    "d15_hll_registers"   -> ((s, d) => graft.functions.LlmQueries.hllRegisters(s, d)),
    "d16_hll_estimate"    -> ((s, d) => graft.functions.LlmQueries.hllEstimate(s, d)),
    "d17_cms_registers"   -> ((s, d) => graft.functions.LlmQueries.cmsRegisters(s, d)),
    "d18_cms_estimate"    -> ((s, d) => graft.functions.LlmQueries.cmsEstimate(s, d)),
    "d19_pagerank"        -> ((s, d) => graft.functions.LlmQueries.pageRankNearDup(s, d)),
    "d30_triangles"       -> ((s, d) => graft.functions.LlmQueries.triangleNearDup(s, d)),
    "d23_hist_registers"  -> ((s, d) => graft.functions.LlmQueries.histRegisters(s, d)),
    "d24_hist_quantiles"  -> ((s, d) => graft.functions.LlmQueries.histQuantiles(s, d)),
    "d25_hist_drift"      -> ((s, d) => graft.functions.LlmQueries.histDrift(s, d)),
    "d20_heavy_hitters"   -> ((s, d) => graft.functions.LlmQueries.heavyHitters(s, d)),
    "d21_approx_distinct" -> ((s, d) => graft.functions.LlmQueries.approxDistinct(s, d)),
    "d22_substring_dedup" -> ((s, d) => graft.functions.LlmQueries.substringDedup(s, d)),
    "t20_vocab_oov"       -> ((s, d) => graft.functions.TextAnalysis.vocabOov(
      graft.Tables.documents(s, d))),
    "t26_bpe_merges"      -> ((s, d) => graft.functions.TextAnalysis.bpeMerges(
      s, graft.Tables.documents(s, d), rounds = 4)),
    "t28_bpe_encode"      -> ((s, d) => graft.functions.TextAnalysis.bpeEncode(
      s, graft.Tables.documents(s, d), rounds = 4)),
    "t27_quality_classifier" -> ((s, d) => graft.functions.TextAnalysis.linearQualityScore(
      graft.Tables.documents(s, d))),
    "t21_bigram_logprob"  -> ((s, d) => graft.functions.TextAnalysis.bigramLogProb(
      graft.Tables.documents(s, d))),
    "t22_dsir_weights"    -> ((s, d) => graft.functions.TextAnalysis.dsirWeights(
      graft.Tables.documents(s, d),
      org.apache.spark.sql.functions.col("lang") === "en")),
    "t23_pmi_pairs"       -> ((s, d) => graft.functions.TextAnalysis.pmiPairs(
      graft.Tables.documents(s, d))),
    "r47_grouping_sets"   -> ((s, d) => RelationalOps.groupingSetsAgg(s, d)),
    "r48_unpivot"         -> ((s, d) => RelationalOps.unpivotMeasures(s, d)),
    "r49_stream_outer_join" -> ((s, d) =>
      graft.streaming.StreamingQueries.streamOuterJoin(s, d)),
    "r55_stream_full_outer" -> ((s, d) =>
      graft.streaming.StreamingQueries.streamFullOuterJoin(s, d)),
    "r50_window_dist"     -> ((s, d) => RelationalOps.windowDistribution(s, d)),
    "r54_session_window"  -> ((s, d) =>
      graft.streaming.StreamingQueries.streamSessionWindow(s, d)),
    "r51_tpch_q1"         -> ((s, d) => RelationalOps.tpchQ1(s, d)),
    "r56_bucketed_join"   -> ((s, d) => RelationalOps.bucketedJoin(s, d)),
    "r52_tpch_q3"         -> ((s, d) => RelationalOps.tpchQ3(s, d)),
    "r53_tpch_q6"         -> ((s, d) => RelationalOps.tpchQ6(s, d)),
    "r32_pivot"           -> ((s, d) => RelationalOps.pivotEventCounts(s, d)),
    "r33_gapfill"         -> ((s, d) => RelationalOps.gapFillHourly(s, d)),
    "r34_sliding_agg"     -> ((s, d) => RelationalOps.slidingAgg(s, d)),
    "r35_rolling_sum"     -> ((s, d) => RelationalOps.rollingCounts(s, d)),
    "r36_topk_rewrite"    -> ((s, d) => RelationalOps.topkRewritten(s, d)),
    "r37_dpp_join"        -> ((s, d) => RelationalOps.dppJoin(s, d)),
    "r38_decayed_score"   -> ((s, d) => RelationalOps.decayedScore(s, d)),
    "r40_funnel"          -> ((s, d) => RelationalOps.funnel(s, d)),
    "r42_streaks"         -> ((s, d) => RelationalOps.activityStreaks(s, d)),
    "r43_retention"       -> ((s, d) => RelationalOps.retentionCohorts(s, d)),
    "r44_transitions"     -> ((s, d) => RelationalOps.eventTransitions(s, d)),
    "r45_journeys"        -> ((s, d) => RelationalOps.topJourneys(s, d)),
    "r46_stickiness"      -> ((s, d) => RelationalOps.stickiness(s, d)),
    "t24_data_checks"     -> ((s, d) => RelationalOps.dataChecks(s, d)),
    "t18_split_assign"    -> ((s, d) => graft.operators.Sampling.assignSplits(
      graft.Tables.documents(s, d).select(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("lang")), "doc_id")),
    "t19_chunking"        -> ((s, d) => graft.functions.TextAnalysis.chunkDocs(
      graft.Tables.documents(s, d))),
    "t30_paragraph_dedup" -> ((s, d) => graft.functions.TextAnalysis.paragraphDedup(
      graft.Tables.documents(s, d))),
    "d14_semantic_dedup"  -> ((s, d) => graft.functions.LlmQueries.semanticDedup(s, d)),
    "r30_stream_join"     -> ((s, d) => graft.streaming.StreamingQueries.streamJoin(s, d)),
    "r31_stream_sessions" -> ((s, d) => graft.streaming.StreamingQueries.streamSessions(s, d)),
    "r39_stream_static_join" -> ((s, d) => graft.streaming.StreamingQueries.streamStaticJoin(s, d)),
    "r41_stream_funnel"   -> ((s, d) => graft.streaming.StreamingQueries.streamFunnel(s, d)),
    "d10_stream_dedup"    -> ((s, d) => graft.streaming.StreamingQueries.streamDedup(s, d)),
    "r57_stream_dedup_native" -> ((s, d) => graft.streaming.StreamingQueries.streamDedupNative(s, d)),
    "r58_asof_forward"    -> ((s, d) => RelationalOps.asofForwardClick(s, d)),
    "r20_semi_join"       -> ((s, d) => RelationalOps.semiJoin(s, d)),
    "r21_anti_join"       -> ((s, d) => RelationalOps.antiJoin(s, d)),
    "r22_outer_join_agg"  -> ((s, d) => RelationalOps.outerJoinAgg(s, d)),
    "r23_intersect"       -> ((s, d) => RelationalOps.intersectKeys(s, d)),
    "r24_except"          -> ((s, d) => RelationalOps.exceptKeys(s, d)),
    "t25_enrich_portable" -> ((s, d) => graft.functions.LlmQueries.textEnrichPortable(s, d)),
    "t35_gopher_rules"    -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, lit, replace}
      // the synthetic docs are single-line word soup: synthesize line and
      // paragraph structure deterministically (literal replaces the DuckDB
      // oracle mirrors 1:1) so the line-level Gopher rules exercise real
      // multi-line input
      val docs = graft.Tables.documents(s, d).select(col("doc_id"),
        replace(replace(col("text"), lit(" table "), lit("\n\n")),
          lit(" the "), lit("\n")).as("text"))
      // production path: the native one-pass kernel (zero shuffles);
      // the declarative reference is pinned equal in TextAnalysisSpec
      graft.functions.TextAnalysis.gopherRulesNative(docs)
    }),
    "t37_gopher_ngrams"   -> ((s, d) => graft.functions.TextAnalysis
      .gopherNgramsNative(graft.Tables.documents(s, d))),
    "t38_lang_quality"    -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      graft.Tables.documents(s, d).select(col("doc_id"), col("lang"),
        graft.functions.TextAnalysis
          .qualityScoreByLang(col("text"), col("lang")).as("quality"))
    }),
    "t36_line_dedup"      -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, lit, replace}
      // same deterministic line synthesis as t35 (oracle mirrors it)
      val docs = graft.Tables.documents(s, d).select(col("doc_id"),
        replace(replace(col("text"), lit(" table "), lit("\n\n")),
          lit(" the "), lit("\n")).as("text"))
      graft.functions.TextAnalysis.dedupLinesNative(docs)
    }),
    "t42_concat_pack"     -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      graft.operators.Sampling.concatPack(
        graft.Tables.documents(s, d).select("doc_id", "text"),
        "doc_id", graft.functions.TextAnalysis.tokenCount(col("text")),
        seqLen = 2048L)
    }),
    "t41_unicode_clean"   -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, lit, replace}
      // plant the hygiene hazards the synthetic ASCII corpus lacks:
      // a decomposed accent (NFC composition), a BEL control, CRLF and a
      // lone CR — literal replaces mirrored 1:1 by the DuckDB oracle
      val docs = graft.Tables.documents(s, d).select(col("doc_id"),
        replace(replace(replace(replace(col("text"),
          lit(" data "), lit(" café ")),
          lit(" scan "), lit(" xy ")),
          lit(" sort "), lit(" a\r\nb ")),
          lit(" fast "), lit(" c\rd ")).as("text"))
      graft.functions.TextAnalysis.unicodeClean(docs)
    }),
    "t39_c4_rules"        -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, lit, replace}
      // the synthetic docs are single-line word soup: synthesize line
      // structure WITH terminal punctuation, plus planted rule triggers
      // (javascript lines, a lorem-ipsum marker, curly braces) — every
      // replace literal, mirrored 1:1 by the DuckDB oracle
      val docs = graft.Tables.documents(s, d).select(col("doc_id"),
        replace(replace(replace(replace(replace(col("text"),
          lit(" table "), lit(".\n")),
          lit(" row "), lit("?\n")),
          lit(" spark "), lit(" javascript ")),
          lit(" vector "), lit(" lorem ipsum. ")),
          lit(" merge "), lit(" { ")).as("text"))
      // production path: the native one-pass kernel (map-only, zero
      // shuffles); declarative reference pinned equal in TextAnalysisSpec
      graft.functions.TextAnalysis.c4RulesNative(docs)
    }),
    "t7_fingerprint"      -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      graft.Tables.documents(s, d).select(col("doc_id"),
        graft.functions.TextAnalysis.fingerprintPortable(col("text")).as("fp"))
    }),
  )

  /** t11 and d26 share one oracle by design: the Bloom prefilter has no
    * false negatives, so the guided pipeline must reproduce the exact
    * decontamination output bit-for-bit. */
  private val DecontaminateOracle: String =
    """WITH w AS (
      |  SELECT doc_id,
      |         list_filter(regexp_split_to_array(lower(text), '\s+'),
      |                     x -> x <> '') AS words
      |  FROM documents
      |), t AS (
      |  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(words) - 1),
      |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
      |    ELSE [array_to_string(words, ' ')] END AS sh
      |  FROM w
      |), e AS (SELECT doc_id, unnest(sh) AS s FROM t
      |), b AS (SELECT DISTINCT s FROM e WHERE doc_id % 17 = 0
      |), c AS (SELECT doc_id, s FROM e WHERE doc_id % 17 <> 0)
      |SELECT c.doc_id, count(*)::BIGINT AS shared_shingles
      |FROM c JOIN b ON c.s = b.s
      |GROUP BY 1 HAVING count(*) >= 3""".stripMargin

  /** r40 (batch window-chain) and r41 (streaming flatMapGroupsWithState)
    * share one oracle by design: the funnel is defined on `ts_ms` values,
    * not scan order, so both executions must match it bit-for-bit. */
  private val FunnelOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
      |), a AS (
      |  SELECT user_id, event_type, ms,
      |    max(CASE WHEN event_type = 'view' THEN ms END) OVER
      |      (PARTITION BY user_id ORDER BY ms
      |       RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_a
      |  FROM e
      |), b AS (
      |  SELECT user_id, event_type, ms,
      |    CASE WHEN event_type = 'click' AND max_a >= ms - 86400000
      |         THEN ms END AS q_b
      |  FROM a
      |), c AS (
      |  SELECT user_id, event_type, ms, q_b,
      |    max(q_b) OVER (PARTITION BY user_id ORDER BY ms
      |       RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_b
      |  FROM b
      |), d AS (
      |  SELECT user_id, event_type, ms, q_b,
      |    CASE WHEN event_type = 'purchase' AND max_b >= ms - 86400000
      |         THEN ms END AS q_c
      |  FROM c
      |)
      |SELECT user_id,
      |  count(CASE WHEN event_type = 'view' THEN 1 END)::BIGINT AS n_step1,
      |  count(q_b)::BIGINT AS n_step2,
      |  count(q_c)::BIGINT AS n_step3,
      |  coalesce(min(q_c), -1)::BIGINT AS first_conv_ms
      |FROM d GROUP BY user_id""".stripMargin

  /** Shared by s47 (Scala-handle savepoint/restore) and s53 (the same
    * lifecycle through SQL CALL procedures): the two-thirds LWW state. */
  /** The d29 k-means recurrence (fixed 8-lowest-id seeds, TWO Lloyd
    * rounds: cosine argmax with the sim-DESC/cell-ASC tie rule,
    * per-cell means over micro-quantized components — long sums, so
    * order-invariant — empty cells keeping their centroid) as a CTE
    * prefix ending in `a3(vec_id, cluster)`. Shared by `d29_kmeans`
    * (the labels) and `t40_cluster_balance` (the per-cluster quota cut
    * built on them) — one definition, two gate entries. */
  private val KmeansCte: String =
    """WITH c0 AS (
      |  SELECT vec_id AS cell_id, embedding::DOUBLE[] AS cv
      |  FROM embeddings WHERE vec_id < 8
      |), a1 AS (
      |  SELECT e.vec_id, e.embedding, c.cell_id
      |  FROM embeddings e CROSS JOIN c0 c
      |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
      |    ORDER BY list_cosine_similarity(c.cv, e.embedding::DOUBLE[]) DESC,
      |             c.cell_id ASC) = 1
      |), m1 AS (
      |  SELECT cell_id, i,
      |         round(sum(round(e.embedding[i]::DOUBLE * 1000000)::BIGINT)::DOUBLE
      |               / (count(*) * 1000000.0), 6) AS m
      |  FROM a1 e, unnest(range(1, len(e.embedding) + 1)) AS t(i)
      |  GROUP BY cell_id, i
      |), c1 AS (
      |  SELECT c0.cell_id, coalesce(l.cv, c0.cv) AS cv
      |  FROM c0 LEFT JOIN (
      |    SELECT cell_id, list(m ORDER BY i) AS cv FROM m1 GROUP BY cell_id
      |  ) l USING (cell_id)
      |), a2 AS (
      |  SELECT e.vec_id, e.embedding, c.cell_id
      |  FROM embeddings e CROSS JOIN c1 c
      |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
      |    ORDER BY list_cosine_similarity(c.cv, e.embedding::DOUBLE[]) DESC,
      |             c.cell_id ASC) = 1
      |), m2 AS (
      |  SELECT cell_id, i,
      |         round(sum(round(e.embedding[i]::DOUBLE * 1000000)::BIGINT)::DOUBLE
      |               / (count(*) * 1000000.0), 6) AS m
      |  FROM a2 e, unnest(range(1, len(e.embedding) + 1)) AS t(i)
      |  GROUP BY cell_id, i
      |), c2 AS (
      |  SELECT c1.cell_id, coalesce(l.cv, c1.cv) AS cv
      |  FROM c1 LEFT JOIN (
      |    SELECT cell_id, list(m ORDER BY i) AS cv FROM m2 GROUP BY cell_id
      |  ) l USING (cell_id)
      |), a3 AS (
      |  SELECT e.vec_id, c.cell_id::BIGINT AS cluster
      |  FROM embeddings e CROSS JOIN c2 c
      |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
      |    ORDER BY list_cosine_similarity(c.cv, e.embedding::DOUBLE[]) DESC,
      |             c.cell_id ASC) = 1
      |)""".stripMargin

  /** The d6 near-dup pair mining (3-gram Jaccard ≥ 0.3) as a CTE prefix
    * ending in `pairs(id_a, id_b)` — shared by `d19_pagerank` and
    * `d30_triangles`, which replay different graph algorithms over the
    * SAME edge definition. */
  private val JaccardPairsCte: String =
    """WITH w AS (
      |  SELECT doc_id,
      |         list_filter(regexp_split_to_array(lower(text), '\s+'),
      |                     x -> x <> '') AS words
      |  FROM documents
      |), t AS (
      |  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(words) - 1),
      |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
      |    ELSE [array_to_string(words, ' ')] END AS sh
      |  FROM w
      |), n AS (SELECT doc_id, len(sh)::BIGINT AS ns FROM t
      |), e AS (SELECT doc_id, unnest(sh) AS s FROM t
      |), p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS inter
      |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT id_a, id_b
      |  FROM p JOIN n na ON na.doc_id = p.id_a JOIN n nb ON nb.doc_id = p.id_b
      |  WHERE inter * 10 >= (na.ns + nb.ns - inter) * 3
      |)""".stripMargin

  /** The bootstrap-onboarding touch-up state — shared by s71
    * (unpartitioned METADATA_ONLY bootstrap) and s75 (the partitioned
    * Hive-layout form): one onboarding story, two table layouts, the
    * SAME final state by contract. */
  private val BootstrapOracle: String =
    """SELECT c_custkey, c_name, c_nationkey,
      |       CASE WHEN c_custkey % 10 = 0 THEN 0.0 ELSE c_acctbal END
      |         AS c_acctbal,
      |       c_mktsegment
      |FROM customer
      |WHERE c_custkey % 17 <> 3""".stripMargin

  private val SavepointOracle: String =
    """WITH b AS (
      |  SELECT min(epoch_ns(ts)) + 2 * ((max(epoch_ns(ts)) - min(epoch_ns(ts))) // 3) AS hi
      |  FROM events
      |)
      |SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
      |FROM events, b
      |WHERE epoch_ns(ts) <= b.hi
      |QUALIFY row_number() OVER
      |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  /** The two-thirds pinned state, PARTITIONED (per-(partition, key) LWW) —
    * shared by s57 (destructive restore to the pin) and s65 (time travel
    * to the same pin via SQL `VERSION AS OF`): two verbs, one state. */
  private val PartPinnedOracle: String =
    """WITH b AS (
      |  SELECT min(epoch_ns(ts)) + 2 * ((max(epoch_ns(ts)) - min(epoch_ns(ts))) // 3) AS hi
      |  FROM events
      |)
      |SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
      |FROM events, b
      |WHERE epoch_ns(ts) <= b.hi
      |QUALIFY row_number() OVER
      |  (PARTITION BY event_type, user_id
      |   ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  /** All-events LWW per user — shared by s16 (datasource write) and s54
    * (write-path index tagging), whose mixed flagged/unflagged commits
    * must land on the identical final state. */
  /** The Gopher rule-set oracle (t35/s70): every metric of
    * `TextAnalysis.gopherRules` in DuckDB over `fromSql` rows
    * (doc_id, text) with the t35 line synthesis applied. One definition,
    * two sources — the from-scratch corpus pass and the incrementally
    * maintained final state must be the SAME function. */
  private def gopherOracle(fromSql: String): String =
    s"""WITH src AS (
       |  SELECT doc_id,
       |         replace(replace(text, ' table ', chr(10) || chr(10)),
       |                 ' the ', chr(10)) AS t
       |  FROM $fromSql
       |), base AS (
       |  SELECT doc_id, t,
       |    list_filter(regexp_split_to_array(lower(t), '\\s+'), x -> x <> '') AS toks,
       |    list_filter(string_split(t, chr(10)), x -> x <> '') AS lines,
       |    list_filter(string_split(t, chr(10) || chr(10)), x -> x <> '') AS paras,
       |    length(regexp_replace(t, '\\s+', '', 'g')) AS chars
       |  FROM src
       |), m AS (
       |  SELECT doc_id, toks, chars,
       |    len(toks)::BIGINT AS n_words,
       |    round(1.0 - len(list_distinct(lines))::DOUBLE
       |          / greatest(len(lines), 1), 6) AS dup_line_frac,
       |    round(1.0 - len(list_distinct(paras))::DOUBLE
       |          / greatest(len(paras), 1), 6) AS dup_para_frac,
       |    round(len(regexp_extract_all(t, '#|\\.\\.\\.'))::DOUBLE
       |          / greatest(len(toks), 1), 6) AS symbol_word_ratio,
       |    round(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
       |          / greatest(len(toks), 1), 6) AS alpha_word_frac,
       |    round(chars::DOUBLE / greatest(len(toks), 1), 6) AS mean_word_len,
       |    round(len(list_filter(lines, x -> regexp_matches(x, '^\\s*[-*]')))::DOUBLE
       |          / greatest(len(lines), 1), 6) AS bullet_line_frac,
       |    round(len(list_filter(lines, x -> regexp_matches(x, '\\.\\.\\.$$')))::DOUBLE
       |          / greatest(len(lines), 1), 6) AS ellipsis_line_frac
       |  FROM base
       |), bi AS (
       |  SELECT doc_id, chars, toks[i] AS w1, toks[i + 1] AS w2
       |  FROM m, unnest(range(1, len(toks))) AS ti(i)
       |), bc AS (
       |  SELECT doc_id, chars, w1, w2, count(*) AS c
       |  FROM bi GROUP BY doc_id, chars, w1, w2
       |), tp AS (
       |  SELECT doc_id,
       |    round(c::DOUBLE * (length(w1) + length(w2))
       |          / greatest(chars, 1), 6) AS top_bigram_char_frac
       |  FROM (SELECT doc_id, chars, w1, w2, c, row_number() OVER (
       |          PARTITION BY doc_id ORDER BY c DESC, w1 DESC, w2 DESC) AS rn
       |        FROM bc) WHERE rn = 1
       |)
       |SELECT m.doc_id, m.n_words, m.dup_line_frac, m.dup_para_frac,
       |  m.symbol_word_ratio, m.alpha_word_frac, m.mean_word_len,
       |  m.bullet_line_frac, m.ellipsis_line_frac,
       |  coalesce(tp.top_bigram_char_frac, 0.0) AS top_bigram_char_frac,
       |  (m.n_words BETWEEN 50 AND 100000
       |   AND m.mean_word_len BETWEEN 3.0 AND 10.0
       |   AND m.symbol_word_ratio <= 0.1 AND m.alpha_word_frac >= 0.8
       |   AND m.bullet_line_frac <= 0.9 AND m.ellipsis_line_frac <= 0.3
       |   AND m.dup_line_frac <= 0.3 AND m.dup_para_frac <= 0.3
       |   AND coalesce(tp.top_bigram_char_frac, 0.0) <= 0.2) AS gopher_pass
       |FROM m LEFT JOIN tp USING (doc_id)""".stripMargin

  private val LwwAllEventsOracle: String =
    """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
      |FROM events
      |QUALIFY row_number() OVER
      |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  private val PointReadOracle: String =
    """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
      |FROM events
      |WHERE user_id % 7 = 0
      |QUALIFY row_number() OVER
      |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  private val TimeTravelOracle: String =
    """WITH b AS (
      |  SELECT min(epoch_ns(ts)) + (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2 AS mid
      |  FROM events
      |)
      |SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
      |FROM events, b WHERE epoch_ns(ts) <= b.mid
      |QUALIFY row_number() OVER
      |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  private val MergeIntoOracle: String =
    """WITH src AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |         c_acctbal + 100.0 AS c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey + 100000, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey <= 100
      |)
      |SELECT t.c_custkey, t.c_name || '#merged' AS c_name, t.c_nationkey,
      |       s.c_acctbal, t.c_mktsegment
      |FROM customer t JOIN src s USING (c_custkey)
      |WHERE t.c_mktsegment <> 'BUILDING'
      |UNION ALL
      |SELECT t.* FROM customer t
      |WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.c_custkey = t.c_custkey)
      |UNION ALL
      |SELECT s.* FROM src s
      |WHERE NOT EXISTS (SELECT 1 FROM customer t WHERE t.c_custkey = s.c_custkey)
      |  AND s.c_nationkey <> 13""".stripMargin

  private val RowLevelOpsOracle: String =
    """WITH lww AS (
      |  SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
      |  FROM events
      |  QUALIFY row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) = 1
      |)
      |SELECT user_id, event_id, event_type,
      |       CASE WHEN event_type = 'error' THEN value + 1000.0
      |            ELSE value END AS value,
      |       ts_ms
      |FROM lww WHERE event_type <> 'click'""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "d26_bloom_decontaminate" -> DecontaminateOracle,
    "r41_stream_funnel" -> FunnelOracle,
    // third execution of the same funnel definition: maintained from the
    // MOR commit stream instead of a file stream or a batch window chain
    "s59_lake_funnel" -> FunnelOracle,
    // k-means, 2 Lloyd rounds replayed exactly: assignment = cosine argmax
    // (sim DESC, cell ASC — the nearest_cells tie rule), update = per-cell
    // means over MICRO-quantized components (long sums are order-invariant,
    // so the recurrence is bit-reproducible cross-engine), empty cells keep
    // their previous centroid
    "d29_kmeans" -> (KmeansCte + "\nSELECT vec_id, cluster FROM a3"),
    // cluster-balanced corpus cut: the d29 labels joined back to the docs,
    // then the t6 md5-order quota rule capped per CLUSTER — no semantic
    // mode dominates the mix
    "t40_cluster_balance" -> (KmeansCte +
      """
        |SELECT d.doc_id, d.lang, a.cluster
        |FROM documents d JOIN a3 a ON d.doc_id = a.vec_id
        |QUALIFY row_number() OVER (PARTITION BY a.cluster
        |  ORDER BY ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT,
        |           d.doc_id) <= 40""".stripMargin),
    "s18_ann_ivf_portable" ->
      """WITH c AS (
        |  SELECT vec_id AS cell_id, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id < 8
        |), a AS (
        |  SELECT e.vec_id, e.embedding, c.cell_id
        |  FROM embeddings e CROSS JOIN c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_cosine_similarity(c.cv, e.embedding::DOUBLE[]) DESC,
        |             c.cell_id ASC) = 1
        |), q AS (
        |  SELECT e.vec_id AS query_id, e.embedding AS qv, c.cell_id
        |  FROM embeddings e CROSS JOIN c
        |  WHERE e.vec_id < 5
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_cosine_similarity(c.cv, e.embedding::DOUBLE[]) DESC,
        |             c.cell_id ASC) <= 4
        |)
        |SELECT q.query_id, a.vec_id AS neighbor_id,
        |       round(list_cosine_similarity(q.qv::DOUBLE[],
        |                                    a.embedding::DOUBLE[]), 6) AS cos_sim
        |FROM q JOIN a USING (cell_id)
        |WHERE a.vec_id <> q.query_id
        |QUALIFY row_number() OVER (PARTITION BY q.query_id
        |  ORDER BY cos_sim DESC, neighbor_id ASC) <= 10""".stripMargin,
    "s19_sql_insert" -> "SELECT * FROM customer",
    "s22_incremental_view" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value, epoch_ns(ts) AS ts_ns
        |  FROM events
        |), lww AS (
        |  SELECT e.* FROM e
        |  QUALIFY row_number() OVER
        |    (PARTITION BY user_id ORDER BY ts_ns DESC, event_id DESC) = 1
        |), final AS (
        |  SELECT * FROM lww WHERE user_id % 7 <> 0
        |)
        |SELECT event_type, count(*)::BIGINT AS n_users,
        |       sum(round(value * 1000000)::BIGINT)::BIGINT AS sum_micros
        |FROM final GROUP BY event_type""".stripMargin,
    // final-state view computed directly; the engine must reach the same
    // numbers by incremental maintenance from two changelogs
    "s36_incr_join_view" ->
      """WITH cust AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_custkey % 7 = 0
        |              THEN ((c_nationkey + 1) % 25)::INTEGER
        |              ELSE c_nationkey END AS c_nationkey
        |  FROM customer
        |), ord AS (
        |  SELECT o_orderkey, o_custkey,
        |         CASE WHEN o_orderkey % 10 = 1 THEN o_totalprice + 100
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 <> 2
        |)
        |SELECT c.c_nationkey, count(*)::BIGINT AS n_orders,
        |       sum(round(o.o_totalprice * 1000000)::BIGINT)::BIGINT AS sum_micros
        |FROM ord o JOIN cust c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_nationkey""".stripMargin,
    "s28_manifest_read" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "s30_stream_partitioned" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |QUALIFY row_number() OVER
        |  (PARTITION BY event_type, user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    // range semantics are STRING order over the record key
    "s37_range_read" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |WHERE CAST(user_id AS VARCHAR) >= '3' AND CAST(user_id AS VARCHAR) < '6'
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "s29_point_read" -> PointReadOracle,
    "s64_point_read_join" -> PointReadOracle,
    "s49_bloom_point_read" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |WHERE user_id % 11 = 3
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    // JL random projection: ±1 signs from md5 of the (out,in) index pair,
    // one fold per output dim — same arithmetic order as the Spark fold,
    // rounded 6 dp (the s9 float rule)
    "s52_random_projection" -> {
      val exprs = (0 until 8).map { k =>
        s"round(list_sum(list_transform(range(1, len(embedding)+1), " +
          s"j -> embedding[j] * (CASE WHEN ('0x' || substr(md5('rp#$k#' || " +
          s"(j-1)::VARCHAR), 1, 8))::BIGINT % 2 = 0 " +
          s"THEN 1.0 ELSE -1.0 END))), 6) AS p$k"
      }.mkString(",\n       ")
      s"SELECT vec_id,\n       $exprs\nFROM (SELECT vec_id, " +
        "embedding::DOUBLE[] AS embedding FROM embeddings)"
    },
    // secondary index: predicate applies to the FINAL per-user image
    "s51_secondary_index" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |  AND event_id % 17 = 5""".stripMargin,
    // reader access policy: the LWW state through the declared column
    // mask + row filter — policy changes WHAT a reader sees, never the
    // underlying LWW resolution
    "s84_access_policy" ->
      """WITH lww AS (
        |  SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1
        |)
        |SELECT user_id, event_id, md5(event_type) AS event_type, value, ts_ms
        |FROM lww
        |WHERE user_id % 2 = 0""".stripMargin,
    // stream-maintained MV: the view is built commit-by-commit by the
    // lake-stream-driven maintenance (never a full build) and serves the
    // GROUP BY fresh (asserted in-plan) — answer = direct LWW recompute
    "s83_stream_mv" ->
      """WITH lww AS (
        |  SELECT user_id, event_type,
        |         CAST(round(value * 1000000) AS BIGINT) AS value_micros
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1
        |)
        |SELECT event_type, count(*)::BIGINT AS n,
        |       sum(value_micros)::BIGINT AS sv
        |FROM lww
        |WHERE user_id % 7 <> 2
        |GROUP BY event_type""".stripMargin,
    // the s51 secondary-index pruning over the PARTITIONED layout:
    // per-(partition, key) LWW winners whose indexed column matches
    "s82_part_secondary_index" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |QUALIFY row_number() OVER
        |  (PARTITION BY event_type, user_id ORDER BY ts DESC, event_id DESC) = 1
        |  AND event_id % 17 = 9""".stripMargin,
    // partitioned tables dedup per (partition, key) — a user appears once
    // per event_type it ever emitted
    "s50_part_point_read" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |WHERE user_id % 13 = 1
        |QUALIFY row_number() OVER
        |  (PARTITION BY event_type, user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    // materialized-view auto-substitution: the analyst's GROUP BY over
    // the BASE table, served from the maintained view (rewrite/fail-
    // closed/re-serve all asserted in-plan in-entry) — the answer is the
    // LWW state's per-type count + exact micro sum after the delete
    "s89_filtered_matview" ->
      """WITH lww AS (
        |  SELECT user_id, event_type,
        |         CAST(round(value * 1000000) AS BIGINT) AS value_micros
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1
        |)
        |SELECT event_type, count(*)::BIGINT AS n,
        |       sum(value_micros)::BIGINT AS sv
        |FROM lww
        |WHERE user_id % 10 <> 3 AND user_id % 3 = 1
        |GROUP BY event_type""".stripMargin,
    "s88_composite_key_index" ->
      """WITH lww AS (
        |  SELECT user_id, event_type, event_id, value, epoch_ms(ts) AS ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts DESC, event_id DESC) = 1
        |)
        |SELECT user_id, event_type, event_id,
        |       CASE WHEN user_id BETWEEN 10 AND 14 THEN value + 1000.0
        |            ELSE value END AS value,
        |       ts_ms
        |FROM lww
        |WHERE user_id IN (4,12,40,41,42,43,44,45,46,47,48,49)
        |  AND event_type = 'click'
        |  AND user_id % 10 <> 4""".stripMargin,
    "s87_part_matview" ->
      """WITH lww AS (
        |  SELECT user_id, event_type,
        |         CAST(round(value * 1000000) AS BIGINT) AS value_micros
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY event_type, user_id
        |    ORDER BY ts DESC, event_id DESC) = 1
        |)
        |SELECT event_type, count(*)::BIGINT AS n,
        |       sum(value_micros)::BIGINT AS sv
        |FROM lww
        |GROUP BY event_type""".stripMargin,
    "s85_matview_ddl" ->
      """WITH lww AS (
        |  SELECT user_id, event_type,
        |         CAST(round(value * 1000000) AS BIGINT) AS value_micros
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1
        |)
        |SELECT event_type, count(*)::BIGINT AS n,
        |       sum(value_micros)::BIGINT AS sv,
        |       avg(value_micros) AS av,
        |       min(value_micros)::BIGINT AS mnv,
        |       max(value_micros)::BIGINT AS mxv
        |FROM lww
        |WHERE user_id % 10 <> 3
        |GROUP BY event_type""".stripMargin,
    "s86_matview_rollup" ->
      """WITH lww AS (
        |  SELECT user_id, event_type,
        |         CAST(round(value * 1000000) AS BIGINT) AS value_micros
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1
        |)
        |SELECT event_type, count(*)::BIGINT AS n,
        |       sum(value_micros)::BIGINT AS sv,
        |       avg(value_micros) AS av,
        |       min(value_micros)::BIGINT AS mnv
        |FROM lww
        |GROUP BY event_type""".stripMargin,
    "s81_mv_rewrite" ->
      """WITH lww AS (
        |  SELECT user_id, event_type,
        |         CAST(round(value * 1000000) AS BIGINT) AS value_micros
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1
        |)
        |SELECT event_type, count(*)::BIGINT AS n,
        |       sum(value_micros)::BIGINT AS sv
        |FROM lww
        |WHERE user_id % 10 <> 3
        |GROUP BY event_type""".stripMargin,
    // the s50 shape through the partitioned record-level index: one
    // cross-child postings lookup pins the base files (asserted
    // in-entry), the answer is the same per-(partition, key) LWW
    "s80_part_record_index" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |WHERE user_id IN (4,12,40,41,42,43,44,45,46,47,48,49)
        |QUALIFY row_number() OVER
        |  (PARTITION BY event_type, user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "s45_lake_stream_read" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "s46_lake_replication" ->
      """WITH lww AS (
        |  SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1
        |)
        |SELECT * FROM lww
        |WHERE user_id % 10 <> 0
        |  AND event_type IN ('click', 'purchase')""".stripMargin,
    "s44_temporal_join" ->
      """SELECT o.o_orderkey,
        |       CASE WHEN o.o_orderkey % 2 = 1 AND c.c_custkey % 7 = 0
        |            THEN (c.c_nationkey + 1) % 25
        |            ELSE c.c_nationkey END AS nation_at_order
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,
    "s43_incr_ann_index" ->
      """WITH c AS (
        |  SELECT vec_id AS cell_id, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id < 8
        |), fin AS (
        |  SELECT vec_id,
        |         CASE WHEN vec_id % 7 = 3
        |              THEN list_transform(embedding, x -> -x)
        |              ELSE embedding END AS embedding
        |  FROM embeddings WHERE vec_id % 10 <> 0
        |)
        |SELECT f.vec_id, c.cell_id
        |FROM fin f CROSS JOIN c
        |QUALIFY row_number() OVER (PARTITION BY f.vec_id
        |  ORDER BY list_cosine_similarity(c.cv, f.embedding::DOUBLE[]) DESC,
        |           c.cell_id ASC) = 1""".stripMargin,
    "s42_incr_text_index" ->
      """WITH final AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 1 THEN text || ' refreshed content'
        |              ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 <> 0
        |), tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                            x -> x <> '')) AS token
        |  FROM final
        |)
        |SELECT token, doc_id, count(*) AS tf
        |FROM tok GROUP BY token, doc_id""".stripMargin,
    "s41_minor_compact" ->
      """WITH lww AS (
        |  SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1
        |)
        |SELECT user_id, event_id,
        |       CASE WHEN user_id < 30 THEN 'minor' ELSE event_type END AS event_type,
        |       CASE WHEN user_id < 30 THEN value + 1000.0 ELSE value END AS value,
        |       ts_ms
        |FROM lww WHERE user_id % 50 <> 0""".stripMargin,
    "s40_zorder_read" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |  AND user_id >= 30 AND user_id < 90
        |  AND value >= 0.0 AND value < 250.0""".stripMargin,
    // the same 2-D box over the PARTITIONED layout: per-(partition, key)
    // LWW, then the box — per-child colstats skipping changes only the plan
    "s78_part_range_read" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |QUALIFY row_number() OVER
        |  (PARTITION BY event_type, user_id ORDER BY ts DESC, event_id DESC) = 1
        |  AND user_id >= 30 AND user_id < 90
        |  AND value >= 0.0 AND value < 250.0""".stripMargin,
    // record-level-index point read: LWW winners with the updateWhere
    // patch applied, restricted to the undeleted probe keys (user_id % 10
    // = 4 was tombstoned after the index refresh) — the index changes
    // WHICH base files are scanned (asserted in-entry), never the answer
    "s79_record_index" ->
      """WITH lww AS (
        |  SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) = 1
        |)
        |SELECT user_id, event_id,
        |       CASE WHEN user_id BETWEEN 10 AND 14 THEN 'rli'
        |            ELSE event_type END AS event_type,
        |       CASE WHEN user_id BETWEEN 10 AND 14 THEN value + 1000.0
        |            ELSE value END AS value,
        |       ts_ms
        |FROM lww
        |WHERE user_id IN (4,12,40,41,42,43,44,45,46,47,48,49)
        |  AND user_id % 10 <> 4""".stripMargin,
    // ONE oracle for the programmatic verb AND its SQL-text twin (s39/s61,
    // s27/s60): the statement surface changed, the answer must not
    "s39_merge_into" -> MergeIntoOracle,
    "s61_sql_merge_into" -> MergeIntoOracle,
    "s27_row_level_ops" -> RowLevelOpsOracle,
    "s60_sql_row_dml" -> RowLevelOpsOracle,
    "s25_part_cdc_read" ->
      """WITH b AS (
        |  SELECT min(epoch_ns(ts)) + (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2 AS mid
        |  FROM events
        |), e AS (
        |  SELECT user_id, event_id, event_type, value,
        |         epoch_ms(ts) AS ts_ms, epoch_ns(ts) AS ts_ns
        |  FROM events
        |), lww1 AS (
        |  SELECT e.* FROM e, b WHERE ts_ns <= mid
        |  QUALIFY row_number() OVER (PARTITION BY event_type, user_id
        |    ORDER BY ts_ns DESC, event_id DESC) = 1
        |), lww2 AS (
        |  SELECT e.* FROM e, b WHERE ts_ns > mid
        |  QUALIFY row_number() OVER (PARTITION BY event_type, user_id
        |    ORDER BY ts_ns DESC, event_id DESC) = 1
        |), del AS (
        |  SELECT DISTINCT user_id, event_type FROM e WHERE user_id % 7 = 0
        |), aft AS (
        |  SELECT l.* FROM lww2 l
        |  WHERE NOT EXISTS (SELECT 1 FROM del d
        |    WHERE d.user_id = l.user_id AND d.event_type = l.event_type)
        |)
        |SELECT 'U' AS op, a.user_id, a.event_type, a.event_id, a.value, a.ts_ms,
        |       l.event_id AS before_event_id, l.value AS before_value,
        |       l.ts_ms AS before_ts_ms
        |FROM aft a JOIN lww1 l USING (event_type, user_id)
        |UNION ALL
        |SELECT 'I', a.user_id, a.event_type, a.event_id, a.value, a.ts_ms,
        |       -1::BIGINT, -1.0, -1::BIGINT
        |FROM aft a WHERE NOT EXISTS (SELECT 1 FROM lww1 l
        |  WHERE l.user_id = a.user_id AND l.event_type = a.event_type)
        |UNION ALL
        |SELECT 'D', l.user_id, l.event_type, -1::BIGINT, -1.0, -1::BIGINT,
        |       l.event_id, l.value, l.ts_ms
        |FROM lww1 l WHERE EXISTS (SELECT 1 FROM del d
        |  WHERE d.user_id = l.user_id AND d.event_type = l.event_type)""".stripMargin,
    "s21_mor_cdc_read" ->
      """WITH b AS (
        |  SELECT min(epoch_ns(ts)) + (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2 AS mid
        |  FROM events
        |), e AS (
        |  SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms, epoch_ns(ts) AS ts_ns
        |  FROM events
        |), lww1 AS (
        |  SELECT e.* FROM e, b WHERE ts_ns <= mid
        |  QUALIFY row_number() OVER
        |    (PARTITION BY user_id ORDER BY ts_ns DESC, event_id DESC) = 1
        |), lww2 AS (
        |  SELECT e.* FROM e, b WHERE ts_ns > mid
        |  QUALIFY row_number() OVER
        |    (PARTITION BY user_id ORDER BY ts_ns DESC, event_id DESC) = 1
        |), del AS (
        |  SELECT DISTINCT user_id FROM e WHERE user_id % 7 = 0
        |), aft AS (
        |  SELECT * FROM lww2 WHERE user_id NOT IN (SELECT user_id FROM del)
        |)
        |SELECT 'U' AS op, a.user_id, a.event_id, a.value, a.ts_ms,
        |       l.event_id AS before_event_id, l.value AS before_value,
        |       l.ts_ms AS before_ts_ms
        |FROM aft a JOIN lww1 l USING (user_id)
        |UNION ALL
        |SELECT 'I', a.user_id, a.event_id, a.value, a.ts_ms,
        |       -1::BIGINT, -1.0, -1::BIGINT
        |FROM aft a WHERE a.user_id NOT IN (SELECT user_id FROM lww1)
        |UNION ALL
        |SELECT 'D', l.user_id, -1::BIGINT, -1.0, -1::BIGINT,
        |       l.event_id, l.value, l.ts_ms
        |FROM lww1 l WHERE l.user_id IN (SELECT user_id FROM del)""".stripMargin,
    // s10 = s20's pipeline + MULTI-PROBE: each query probes its bucket
    // and every 1-bit-flip neighbor (xor with 1<<j) in each table —
    // integer arithmetic both engines share
    "s10_ann_lsh" ->
      """WITH p AS (
        |  SELECT t.t, j.j,
        |         list_transform(range(0, 64), i ->
        |           ((('0x' || substr(md5('p#' || t.t || '#' || j.j || '#' || i), 1, 8))::BIGINT
        |             % 2000000) - 1000000) / 1000000.0) AS pl
        |  FROM range(0, 4) t(t), range(0, 8) j(j)
        |), b AS (
        |  SELECT e.vec_id, p.t,
        |         sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.pl) > 0
        |             THEN (1 << p.j) ELSE 0 END)::BIGINT AS bucket
        |  FROM embeddings e CROSS JOIN p
        |  GROUP BY e.vec_id, p.t
        |), probes AS (
        |  SELECT q.vec_id AS query_id, q.t,
        |         unnest(list_prepend(q.bucket,
        |           list_transform(range(0, 8),
        |             j -> xor(q.bucket, (1::BIGINT << j))))) AS bucket
        |  FROM b q WHERE q.vec_id < 5
        |), cand AS (
        |  SELECT DISTINCT pr.query_id, c.vec_id AS neighbor_id
        |  FROM probes pr JOIN b c ON pr.t = c.t AND pr.bucket = c.bucket
        |  WHERE c.vec_id <> pr.query_id
        |)
        |SELECT cand.query_id, cand.neighbor_id,
        |       round(list_cosine_similarity(qe.embedding::DOUBLE[],
        |                                    ce.embedding::DOUBLE[]), 6) AS cos_sim
        |FROM cand
        |JOIN embeddings qe ON qe.vec_id = cand.query_id
        |JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
        |QUALIFY row_number() OVER (PARTITION BY cand.query_id
        |  ORDER BY cos_sim DESC, cand.neighbor_id ASC) <= 10""".stripMargin,
    "s20_ann_lsh_portable" ->
      """WITH p AS (
        |  SELECT t.t, j.j,
        |         list_transform(range(0, 64), i ->
        |           ((('0x' || substr(md5('p#' || t.t || '#' || j.j || '#' || i), 1, 8))::BIGINT
        |             % 2000000) - 1000000) / 1000000.0) AS pl
        |  FROM range(0, 4) t(t), range(0, 8) j(j)
        |), b AS (
        |  SELECT e.vec_id, p.t,
        |         sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.pl) > 0
        |             THEN (1 << p.j) ELSE 0 END)::BIGINT AS bucket
        |  FROM embeddings e CROSS JOIN p
        |  GROUP BY e.vec_id, p.t
        |), cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM b q JOIN b c ON q.t = c.t AND q.bucket = c.bucket
        |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
        |)
        |SELECT cand.query_id, cand.neighbor_id,
        |       round(list_cosine_similarity(qe.embedding::DOUBLE[],
        |                                    ce.embedding::DOUBLE[]), 6) AS cos_sim
        |FROM cand
        |JOIN embeddings qe ON qe.vec_id = cand.query_id
        |JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
        |QUALIFY row_number() OVER (PARTITION BY cand.query_id
        |  ORDER BY cos_sim DESC, cand.neighbor_id ASC) <= 10""".stripMargin,
    "d11_minhash_union" ->
      """WITH w AS (
        |  SELECT source,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM documents
        |), t AS (
        |  SELECT source, CASE WHEN len(words) >= 3 THEN
        |      list_transform(range(1, len(words) - 1),
        |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |    ELSE [array_to_string(words, ' ')] END AS sh
        |  FROM w
        |), e AS (SELECT source, unnest(sh) AS s FROM t)
        |SELECT e.source, r.i AS slot,
        |       min(('0x' || substr(md5(e.s || '#' || r.i::VARCHAR), 1, 8))::BIGINT) AS h
        |FROM e CROSS JOIN range(0, 16) r(i)
        |GROUP BY e.source, r.i""".stripMargin,
    "t10_repetition" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
        |      list_transform(range(1, len(words) - 1),
        |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |    ELSE [array_to_string(words, ' ')] END AS sh
        |  FROM w
        |)
        |SELECT doc_id,
        |       round(1.0 - len(list_distinct(sh))::DOUBLE
        |             / greatest(len(sh), 1), 6) AS rep_ratio
        |FROM t""".stripMargin,
    "t13_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                            x -> x <> '')) AS w
        |  FROM documents
        |), f AS (
        |  SELECT w, count(*)::DOUBLE AS c FROM tok GROUP BY w
        |), tot AS (SELECT count(*)::DOUBLE AS n FROM tok)
        |SELECT t.doc_id, round(avg(-ln(f.c / tot.n)), 6) AS avg_logprob
        |FROM tok t JOIN f USING (w) CROSS JOIN tot
        |GROUP BY t.doc_id""".stripMargin,
    "t21_bigram_logprob" ->
      """WITH arr AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS a
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(a) AS w FROM arr
        |), u AS (
        |  SELECT w, count(*)::DOUBLE AS cu FROM tok GROUP BY w
        |), v AS (SELECT count(*)::DOUBLE AS nv FROM u),
        |bi AS (
        |  SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
        |  FROM arr, unnest(range(1, len(a))) AS t(i)
        |), b AS (
        |  SELECT w1, w2, count(*)::DOUBLE AS cb FROM bi GROUP BY w1, w2
        |)
        |SELECT bi.doc_id,
        |       round(avg(-ln((b.cb + 1.0) / (u.cu + 1.0 * v.nv))), 6)
        |         AS avg_bigram_logprob
        |FROM bi JOIN b USING (w1, w2) JOIN u ON u.w = bi.w1 CROSS JOIN v
        |GROUP BY bi.doc_id""".stripMargin,
    "t35_gopher_rules" -> gopherOracle("documents"),
    // incrementally-maintained metrics == from-scratch pass over the
    // FINAL doc state (%5==1 refreshed, %10==0 dropped)
    "s70_incr_quality_index" -> gopherOracle(
      """(SELECT doc_id,
        |   CASE WHEN doc_id % 5 = 1 THEN text || ' refreshed content'
        |        ELSE text END AS text
        | FROM documents WHERE doc_id % 10 <> 0)""".stripMargin),
    "t38_lang_quality" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                x -> x <> '') AS lt,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |                    x -> x <> '')) AS n_tok,
        |    round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
        |          / greatest(length(text), 1)::DOUBLE, 6) AS punct_r,
        |    length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, lang, n_tok, punct_r, n_nonspace,
        |    CASE lang
        |      WHEN 'en' THEN round(len(list_filter(lt, t -> list_contains(
        |        ['the','a','an','and','or','of','to','in','is','it','that','for',
        |         'on','with','as','was','at','by'], t)))::DOUBLE
        |        / greatest(n_tok, 1), 6)
        |      WHEN 'es' THEN round(len(list_filter(lt, t -> list_contains(
        |        ['el','la','los','las','un','una','y','o','de','en','es','que',
        |         'por','con','para','del','se','no'], t)))::DOUBLE
        |        / greatest(n_tok, 1), 6)
        |      WHEN 'de' THEN round(len(list_filter(lt, t -> list_contains(
        |        ['der','die','das','ein','eine','und','oder','von','zu','im',
        |         'ist','dass','für','auf','mit','als','den'], t)))::DOUBLE
        |        / greatest(n_tok, 1), 6)
        |      WHEN 'fr' THEN round(len(list_filter(lt, t -> list_contains(
        |        ['le','la','les','un','une','et','ou','de','en','est','que',
        |         'pour','sur','avec','du','au','des','ne'], t)))::DOUBLE
        |        / greatest(n_tok, 1), 6)
        |      ELSE NULL END AS sw_r
        |  FROM f
        |)
        |SELECT doc_id, lang,
        |  round(((CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
        |   + (CASE WHEN punct_r < 0.1 THEN 1.0 ELSE 0.0 END)
        |   + (CASE WHEN sw_r IS NULL THEN 1.0
        |           WHEN sw_r BETWEEN 0.05 AND 0.7 THEN 1.0 ELSE 0.0 END)
        |   + (CASE WHEN n_nonspace::DOUBLE / greatest(n_tok, 1)
        |                BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 4.0, 4)
        |  AS quality
        |FROM r""".stripMargin,
    // concat-and-chunk: global token offsets are ONE cumulative sum over
    // the md5 total order; windows are integer division by the seq length
    "t42_concat_pack" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |                    x -> x <> ''))::BIGINT AS n_tokens,
        |    md5(doc_id::VARCHAR) AS h
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |      AS start_offset
        |  FROM d
        |)
        |SELECT doc_id, n_tokens, start_offset,
        |       (start_offset // 2048)::BIGINT AS first_window,
        |       (greatest(start_offset, start_offset + n_tokens - 1) // 2048)::BIGINT
        |         AS last_window
        |FROM o""".stripMargin,
    // unicode hygiene: CR/CRLF → LF, C0/DEL strip, then NFC — same order
    // as the kernel; length() counts code points on both engines
    "t41_unicode_clean" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    replace(replace(replace(replace(text,
        |      ' data ', ' cafe' || chr(769) || ' '),
        |      ' scan ', ' x' || chr(7) || 'y '),
        |      ' sort ', ' a' || chr(13) || chr(10) || 'b '),
        |      ' fast ', ' c' || chr(13) || 'd ') AS text
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, text,
        |    nfc_normalize(regexp_replace(
        |      replace(replace(text, chr(13) || chr(10), chr(10)),
        |              chr(13), chr(10)),
        |      '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')) AS cleaned
        |  FROM base
        |)
        |SELECT doc_id, md5(cleaned) AS clean_md5,
        |       length(text)::BIGINT AS n_before,
        |       length(cleaned)::BIGINT AS n_after,
        |       (cleaned <> text) AS changed
        |FROM c""".stripMargin,
    // C4 cleaning rule set over the t39 line synthesis: line keeps =
    // terminal punct + >=3 words + no "javascript"; doc pass = >=5
    // sentences post-clean, no "lorem ipsum", no '{'. RE2 '$' == end of
    // text == the Spark side's \z anchor; md5 of the rejoined kept lines
    // makes the whole rewrite byte-comparable.
    "t39_c4_rules" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    replace(replace(replace(replace(replace(text,
        |      ' table ', '.' || chr(10)),
        |      ' row ', '?' || chr(10)),
        |      ' spark ', ' javascript '),
        |      ' vector ', ' lorem ipsum. '),
        |      ' merge ', ' { ') AS text
        |  FROM documents
        |), split AS (
        |  SELECT doc_id, text, string_split(text, chr(10)) AS lines
        |  FROM base
        |), k AS (
        |  SELECT doc_id, text, lines,
        |    list_filter(lines, l -> regexp_matches(l, '[.!?"]$')
        |      AND len(regexp_extract_all(l, '\S+')) >= 3
        |      AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM split
        |), c AS (
        |  SELECT doc_id, text, len(lines) AS total_lines,
        |         len(kept) AS kept_lines,
        |         -- array_to_string of an EMPTY list is NULL in DuckDB
        |         coalesce(array_to_string(kept, chr(10)), '') AS cleaned
        |  FROM k
        |)
        |SELECT doc_id,
        |  total_lines::BIGINT AS total_lines,
        |  kept_lines::BIGINT AS kept_lines,
        |  len(regexp_extract_all(cleaned, '[.!?]'))::BIGINT AS n_sentences,
        |  (len(regexp_extract_all(cleaned, '[.!?]')) >= 5
        |    AND NOT contains(lower(text), 'lorem ipsum')
        |    AND NOT contains(text, '{')) AS c4_pass,
        |  md5(cleaned) AS clean_md5
        |FROM c""".stripMargin,
    "t37_gopher_ngrams" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks,
        |    length(regexp_replace(text, '\s+', '', 'g')) AS chars
        |  FROM documents
        |), occ AS (
        |  SELECT doc_id, chars, n, i,
        |         array_to_string(toks[i:i+n-1], ' ') AS g
        |  FROM base, unnest([3, 4, 5, 6, 7, 8, 9, 10]) AS tn(n),
        |       unnest(range(1, len(toks) - n + 2)) AS ti(i)
        |), cnt AS (
        |  SELECT doc_id, chars, n, g, count(*) AS c
        |  FROM occ GROUP BY doc_id, chars, n, g
        |), tops AS (
        |  SELECT doc_id, n,
        |    round(c::DOUBLE * (length(g) - (n - 1))
        |          / greatest(chars, 1), 6) AS frac
        |  FROM (SELECT doc_id, chars, n, g, c, row_number() OVER (
        |          PARTITION BY doc_id, n ORDER BY c DESC, g DESC) AS rn
        |        FROM cnt WHERE n <= 4) WHERE rn = 1
        |), dupcov AS (
        |  SELECT DISTINCT o.doc_id, o.n, tj.j
        |  FROM occ o
        |  JOIN cnt USING (doc_id, n, g), unnest(range(o.i, o.i + o.n)) AS tj(j)
        |  WHERE o.n >= 5 AND cnt.c >= 2
        |), dups AS (
        |  SELECT d.doc_id, d.n,
        |    round(sum(length(b.toks[d.j]))::DOUBLE
        |          / greatest(any_value(b.chars), 1), 6) AS frac
        |  FROM dupcov d JOIN base b USING (doc_id)
        |  GROUP BY d.doc_id, d.n
        |), wide AS (
        |  SELECT b.doc_id,
        |    coalesce(max(CASE WHEN t.n = 3 THEN t.frac END), 0.0) AS top_3gram_char_frac,
        |    coalesce(max(CASE WHEN t.n = 4 THEN t.frac END), 0.0) AS top_4gram_char_frac,
        |    coalesce(max(CASE WHEN t.n = 5 THEN t.frac END), 0.0) AS dup_5gram_char_frac,
        |    coalesce(max(CASE WHEN t.n = 6 THEN t.frac END), 0.0) AS dup_6gram_char_frac,
        |    coalesce(max(CASE WHEN t.n = 7 THEN t.frac END), 0.0) AS dup_7gram_char_frac,
        |    coalesce(max(CASE WHEN t.n = 8 THEN t.frac END), 0.0) AS dup_8gram_char_frac,
        |    coalesce(max(CASE WHEN t.n = 9 THEN t.frac END), 0.0) AS dup_9gram_char_frac,
        |    coalesce(max(CASE WHEN t.n = 10 THEN t.frac END), 0.0) AS dup_10gram_char_frac
        |  FROM base b
        |  LEFT JOIN (SELECT * FROM tops UNION ALL SELECT * FROM dups) t
        |    USING (doc_id)
        |  GROUP BY b.doc_id
        |)
        |SELECT *,
        |  (top_3gram_char_frac <= 0.18 AND top_4gram_char_frac <= 0.16
        |   AND dup_5gram_char_frac <= 0.15 AND dup_6gram_char_frac <= 0.14
        |   AND dup_7gram_char_frac <= 0.13 AND dup_8gram_char_frac <= 0.12
        |   AND dup_9gram_char_frac <= 0.11 AND dup_10gram_char_frac <= 0.10)
        |  AS repetition_pass
        |FROM wide""".stripMargin,
    "t36_line_dedup" ->
      """WITH src AS (
        |  SELECT doc_id,
        |         replace(replace(text, ' table ', chr(10) || chr(10)),
        |                 ' the ', chr(10)) AS t
        |  FROM documents
        |), lx AS (
        |  SELECT doc_id, a[i] AS l, i
        |  FROM (SELECT doc_id, string_split(t, chr(10)) AS a FROM src),
        |       unnest(range(1, len(a) + 1)) AS ti(i)
        |  WHERE a[i] <> ''
        |), agg AS (
        |  SELECT doc_id, count(*) AS n_lines FROM lx GROUP BY doc_id
        |), firsts AS (
        |  SELECT doc_id, l, min(i) AS fi FROM lx GROUP BY doc_id, l
        |), clean AS (
        |  SELECT doc_id, md5(string_agg(l, chr(10) ORDER BY fi)) AS clean_md5,
        |         count(*) AS n_kept
        |  FROM firsts GROUP BY doc_id
        |)
        |SELECT s.doc_id,
        |  coalesce(clean.clean_md5, md5('')) AS clean_md5,
        |  coalesce(agg.n_lines, 0)::BIGINT AS n_lines,
        |  coalesce(clean.n_kept, 0)::BIGINT AS n_kept
        |FROM src s LEFT JOIN agg USING (doc_id)
        |LEFT JOIN clean USING (doc_id)""".stripMargin,
    "t23_pmi_pairs" ->
      """WITH arr AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS a
        |  FROM documents
        |), tok AS (
        |  SELECT unnest(a) AS w FROM arr
        |), u AS (
        |  SELECT w, count(*) AS cu FROM tok GROUP BY w
        |), nt AS (SELECT count(*)::DOUBLE AS t FROM tok),
        |bi AS (
        |  SELECT a[i] AS w1, a[i + 1] AS w2
        |  FROM arr, unnest(range(1, len(a))) AS ti(i)
        |), nb AS (SELECT count(*)::DOUBLE AS t FROM bi),
        |b AS (
        |  SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2
        |  HAVING count(*) >= 5
        |)
        |SELECT b.w1, b.w2, b.c12,
        |       round(ln(b.c12::DOUBLE * nt.t * nt.t /
        |                (nb.t * u1.cu::DOUBLE * u2.cu::DOUBLE)), 6) AS pmi
        |FROM b
        |JOIN u u1 ON u1.w = b.w1
        |JOIN u u2 ON u2.w = b.w2
        |CROSS JOIN nt CROSS JOIN nb""".stripMargin,
    "t22_dsir_weights" ->
      """WITH tok AS (
        |  SELECT doc_id, (lang = 'en') AS t,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                            x -> x <> '')) AS w
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, t,
        |         ('0x' || substr(md5(w), 1, 8))::BIGINT % 1024 AS f
        |  FROM tok
        |), s AS (
        |  SELECT f, count(*)::DOUBLE AS qc,
        |         sum(CASE WHEN t THEN 1 ELSE 0 END)::DOUBLE AS pc
        |  FROM f GROUP BY f
        |), tot AS (
        |  SELECT count(*)::DOUBLE AS qt,
        |         sum(CASE WHEN t THEN 1 ELSE 0 END)::DOUBLE AS pt
        |  FROM f
        |)
        |SELECT f.doc_id,
        |       round(sum(ln((s.pc + 1.0) / (tot.pt + 1024)) -
        |                 ln((s.qc + 1.0) / (tot.qt + 1024))), 6) AS dsir_logweight
        |FROM f JOIN s USING (f) CROSS JOIN tot
        |GROUP BY f.doc_id""".stripMargin,
    "t15_mixture_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT <
        |  CASE lang WHEN 'en' THEN 2147483648
        |            WHEN 'es' THEN 1073741824
        |            WHEN 'de' THEN 536870912
        |            WHEN 'fr' THEN 268435456
        |            ELSE 429496729 END""".stripMargin,
    "t16_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                            x -> x <> '')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2
        |), dl AS (
        |  SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1
        |), st AS (
        |  SELECT count(*)::BIGINT AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl
        |), df AS (
        |  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
        |), q AS (
        |  SELECT doc_id AS query_id,
        |         unnest(list_distinct(list_filter(
        |           regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))) AS term
        |  FROM documents WHERE doc_id < 3
        |), sc AS (
        |  SELECT q.query_id, tf.doc_id,
        |         sum(CAST(round(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) *
        |               (tf.tf * 2.2 /
        |                (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) *
        |               1000000.0) AS BIGINT))::BIGINT AS score_u
        |  FROM q
        |  JOIN tf USING (term)
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  JOIN df ON q.term = df.term
        |  CROSS JOIN st
        |  GROUP BY 1, 2
        |)
        |SELECT query_id, doc_id, score_u,
        |       row_number() OVER (PARTITION BY query_id
        |                          ORDER BY score_u DESC, doc_id)::BIGINT AS rank
        |FROM sc
        |QUALIFY rank <= 10""".stripMargin,
    // hybrid retrieval: the t16 BM25 pipeline (k=20) and the s9 exact
    // cosine ranking (k=20) fused by reciprocal rank — integer `div`
    // units, so the fused scores and the (rrf_u DESC, doc_id) total order
    // are engine-exact
    "t43_hybrid_rrf" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                            x -> x <> '')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2
        |), dl AS (
        |  SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1
        |), st AS (
        |  SELECT count(*)::BIGINT AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl
        |), df AS (
        |  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
        |), q AS (
        |  SELECT doc_id AS query_id,
        |         unnest(list_distinct(list_filter(
        |           regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))) AS term
        |  FROM documents WHERE doc_id < 3
        |), sc AS (
        |  SELECT q.query_id, tf.doc_id,
        |         sum(CAST(round(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) *
        |               (tf.tf * 2.2 /
        |                (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) *
        |               1000000.0) AS BIGINT))::BIGINT AS score_u
        |  FROM q
        |  JOIN tf USING (term)
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  JOIN df ON q.term = df.term
        |  CROSS JOIN st
        |  GROUP BY 1, 2
        |), sparse AS (
        |  SELECT query_id, doc_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY score_u DESC, doc_id) AS s_rank
        |  FROM sc QUALIFY s_rank <= 20
        |), dense AS (
        |  SELECT qv.vec_id AS query_id, c.vec_id AS doc_id,
        |         round(list_cosine_similarity(qv.embedding::DOUBLE[],
        |                                      c.embedding::DOUBLE[]), 6) AS cos_sim
        |  FROM embeddings qv JOIN embeddings c ON qv.vec_id <> c.vec_id
        |  WHERE qv.vec_id < 3
        |  QUALIFY row_number() OVER (PARTITION BY qv.vec_id
        |    ORDER BY cos_sim DESC, c.vec_id ASC) <= 20
        |), dense_r AS (
        |  SELECT query_id, doc_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos_sim DESC, doc_id ASC) AS d_rank
        |  FROM dense
        |), fused AS (
        |  SELECT coalesce(s.query_id, d.query_id) AS query_id,
        |         coalesce(s.doc_id, d.doc_id) AS doc_id,
        |         coalesce(1000000000 // (60 + s.s_rank), 0) +
        |         coalesce(1000000000 // (60 + d.d_rank), 0) AS rrf_u
        |  FROM sparse s
        |  FULL JOIN dense_r d ON s.query_id = d.query_id AND s.doc_id = d.doc_id
        |)
        |SELECT query_id, doc_id, rrf_u::BIGINT AS rrf_u,
        |       row_number() OVER (PARTITION BY query_id
        |                          ORDER BY rrf_u DESC, doc_id)::BIGINT AS fused_rank
        |FROM fused
        |QUALIFY fused_rank <= 10""".stripMargin,
    // MMR re-rank: all five greedy λ=0.7 rounds replayed exactly —
    // candidate cut at 6 dp (the s9 rule), then pure integer score
    // arithmetic (7·rel − 3·max_sim, no division) so every round's argmax
    // and tie-break is engine-exact
    "t44_mmr_rerank" -> {
      val step = (i: Int) => s"""
        |, s$i AS (
        |  SELECT query_id, doc_id, $i::BIGINT AS step, mmr_u FROM (
        |    SELECT c.query_id, c.doc_id, 7*c.rel_u - 3*max(p.sim_u) AS mmr_u
        |    FROM cand c
        |    JOIN pairs p ON p.query_id = c.query_id AND p.a = c.doc_id
        |    JOIN sel${i - 1} s ON s.query_id = p.query_id AND s.doc_id = p.b
        |    WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} x
        |                      WHERE x.query_id = c.query_id AND x.doc_id = c.doc_id)
        |    GROUP BY c.query_id, c.doc_id, c.rel_u
        |  ) QUALIFY row_number() OVER (PARTITION BY query_id
        |      ORDER BY mmr_u DESC, doc_id) = 1
        |), sel$i AS (
        |  SELECT query_id, doc_id FROM sel${i - 1}
        |  UNION ALL SELECT query_id, doc_id FROM s$i
        |)""".stripMargin
      """WITH cand0 AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
        |         round(list_cosine_similarity(q.embedding::DOUBLE[],
        |                                      c.embedding::DOUBLE[]), 6) AS cos
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 3
        |  QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY cos DESC, c.vec_id) <= 20
        |), cand AS (
        |  SELECT query_id, doc_id, CAST(round(cos * 1000000) AS BIGINT) AS rel_u
        |  FROM cand0
        |), pairs AS (
        |  SELECT a.query_id, a.doc_id AS a, b.doc_id AS b,
        |         CAST(round(list_cosine_similarity(ea.embedding::DOUBLE[],
        |                eb.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS sim_u
        |  FROM cand a JOIN cand b
        |    ON a.query_id = b.query_id AND a.doc_id <> b.doc_id
        |  JOIN embeddings ea ON ea.vec_id = a.doc_id
        |  JOIN embeddings eb ON eb.vec_id = b.doc_id
        |), s1 AS (
        |  SELECT query_id, doc_id, 1::BIGINT AS step, 7 * rel_u AS mmr_u FROM cand
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY rel_u DESC, doc_id) = 1
        |), sel1 AS (SELECT query_id, doc_id FROM s1)""".stripMargin +
        (2 to 5).map(step).mkString +
        """
        |SELECT query_id, doc_id, step, mmr_u::BIGINT AS mmr_u FROM s1
        |UNION ALL SELECT query_id, doc_id, step, mmr_u::BIGINT FROM s2
        |UNION ALL SELECT query_id, doc_id, step, mmr_u::BIGINT FROM s3
        |UNION ALL SELECT query_id, doc_id, step, mmr_u::BIGINT FROM s4
        |UNION ALL SELECT query_id, doc_id, step, mmr_u::BIGINT FROM s5""".stripMargin
    },
    "t17_mixture_epochs" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |         CASE lang WHEN 'en' THEN 2 WHEN 'es' THEN 1
        |                   WHEN 'de' THEN 3 ELSE 0 END
        |         + CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT <
        |                     CASE lang WHEN 'en' THEN 2147483648
        |                               WHEN 'es' THEN 1073741824
        |                               WHEN 'de' THEN 0
        |                               ELSE 2147483648 END
        |                THEN 1 ELSE 0 END AS n
        |  FROM documents
        |)
        |SELECT doc_id, lang, unnest(generate_series(1, n))::BIGINT AS epoch
        |FROM base WHERE n > 0""".stripMargin,
    "d15_hll_registers" ->
      """WITH h AS (
        |  SELECT source, ('0x' || substr(md5(text), 1, 8))::BIGINT AS hv
        |  FROM documents
        |), r AS (
        |  SELECT source, hv // 67108864 AS slot,
        |         CASE WHEN hv % 67108864 = 0 THEN 27
        |              ELSE 27 - length(printf('%b', hv % 67108864)) END AS rho
        |  FROM h
        |), slots AS (
        |  SELECT DISTINCT source, gs.g AS slot
        |  FROM documents, generate_series(0, 63) gs(g)
        |)
        |SELECT s.source, s.slot::BIGINT AS slot,
        |       coalesce(max(r.rho), 0)::BIGINT AS rho
        |FROM slots s
        |LEFT JOIN r ON r.source = s.source AND r.slot = s.slot
        |GROUP BY s.source, s.slot""".stripMargin,
    // the lake round trip (store half-1 sketch, merge half-2 slot-max,
    // store) must equal the whole-corpus registers — d15's SQL verbatim
    "s35_sketch_lake" ->
      """WITH h AS (
        |  SELECT source, ('0x' || substr(md5(text), 1, 8))::BIGINT AS hv
        |  FROM documents
        |), r AS (
        |  SELECT source, hv // 67108864 AS slot,
        |         CASE WHEN hv % 67108864 = 0 THEN 27
        |              ELSE 27 - length(printf('%b', hv % 67108864)) END AS rho
        |  FROM h
        |), slots AS (
        |  SELECT DISTINCT source, gs.g AS slot
        |  FROM documents, generate_series(0, 63) gs(g)
        |)
        |SELECT s.source, s.slot::BIGINT AS slot,
        |       coalesce(max(r.rho), 0)::BIGINT AS rho
        |FROM slots s
        |LEFT JOIN r ON r.source = s.source AND r.slot = s.slot
        |GROUP BY s.source, s.slot""".stripMargin,
    "d16_hll_estimate" ->
      """WITH h AS (
        |  SELECT source, ('0x' || substr(md5(text), 1, 8))::BIGINT AS hv
        |  FROM documents
        |), r AS (
        |  SELECT source, hv // 67108864 AS slot,
        |         CASE WHEN hv % 67108864 = 0 THEN 27
        |              ELSE 27 - length(printf('%b', hv % 67108864)) END AS rho
        |  FROM h
        |), slots AS (
        |  SELECT DISTINCT source, gs.g AS slot
        |  FROM documents, generate_series(0, 63) gs(g)
        |), regs AS (
        |  SELECT s.source, s.slot, coalesce(max(r.rho), 0) AS rho
        |  FROM slots s
        |  LEFT JOIN r ON r.source = s.source AND r.slot = s.slot
        |  GROUP BY s.source, s.slot
        |), agg AS (
        |  SELECT source, sum(pow(2.0, -rho)) AS s,
        |         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END)::BIGINT AS v
        |  FROM regs GROUP BY source
        |), est AS (
        |  SELECT source,
        |         round(CASE WHEN 0.709 * 64.0 * 64.0 / s <= 160.0 AND v > 0
        |                    THEN 64.0 * ln(64.0 / v)
        |                    ELSE 0.709 * 64.0 * 64.0 / s END, 2) AS est_distinct
        |  FROM agg
        |)
        |SELECT e.source, e.est_distinct, x.n_exact
        |FROM est e
        |JOIN (SELECT source, count(DISTINCT text)::BIGINT AS n_exact
        |      FROM documents GROUP BY source) x USING (source)""".stripMargin,
    "d25_hist_drift" ->
      """WITH b AS (
        |  SELECT min(epoch_ns(ts)) + (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2 AS mid
        |  FROM events
        |), e AS (
        |  SELECT event_type, value, epoch_ns(ts) AS ts_ns FROM events
        |), s1 AS (
        |  SELECT event_type,
        |         CASE WHEN value < 0.0 THEN 0
        |              WHEN value >= 500.0 THEN 65
        |              ELSE floor((value - 0.0) * 64 / (500.0 - 0.0))::BIGINT + 1
        |         END AS slot
        |  FROM e, b WHERE ts_ns <= mid
        |), s2 AS (
        |  SELECT event_type,
        |         CASE WHEN value < 0.0 THEN 0
        |              WHEN value >= 500.0 THEN 65
        |              ELSE floor((value - 0.0) * 64 / (500.0 - 0.0))::BIGINT + 1
        |         END AS slot
        |  FROM e, b WHERE ts_ns > mid
        |), g AS (SELECT DISTINCT event_type FROM e),
        |r AS (SELECT unnest(range(0, 66)) AS slot),
        |c1 AS (SELECT event_type, slot, count(*) AS c FROM s1 GROUP BY 1, 2),
        |c2 AS (SELECT event_type, slot, count(*) AS c FROM s2 GROUP BY 1, 2),
        |j AS (
        |  SELECT g.event_type, r.slot,
        |         coalesce(c1.c, 0) AS c1, coalesce(c2.c, 0) AS c2
        |  FROM g CROSS JOIN r
        |  LEFT JOIN c1 ON c1.event_type = g.event_type AND c1.slot = r.slot
        |  LEFT JOIN c2 ON c2.event_type = g.event_type AND c2.slot = r.slot
        |), t AS (
        |  SELECT event_type, slot, c1, c2,
        |         sum(c1) OVER (PARTITION BY event_type) AS n1,
        |         sum(c2) OVER (PARTITION BY event_type) AS n2
        |  FROM j
        |)
        |SELECT event_type, max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2,
        |       sum(abs(c1 * n2 - c2 * n1))::BIGINT AS l1_scaled
        |FROM t GROUP BY event_type""".stripMargin,
    "d23_hist_registers" ->
      """WITH b AS (
        |  SELECT event_type,
        |         CASE WHEN value < 0.0 THEN 0
        |              WHEN value >= 500.0 THEN 65
        |              ELSE floor((value - 0.0) * 64 / (500.0 - 0.0))::BIGINT + 1
        |         END AS slot
        |  FROM events
        |), g AS (SELECT DISTINCT event_type FROM events),
        |r AS (SELECT unnest(range(0, 66)) AS slot),
        |c AS (SELECT event_type, slot, count(*) AS cnt FROM b GROUP BY 1, 2)
        |SELECT g.event_type, r.slot, coalesce(c.cnt, 0) AS cnt
        |FROM g CROSS JOIN r
        |LEFT JOIN c ON c.event_type = g.event_type AND c.slot = r.slot""".stripMargin,
    "d24_hist_quantiles" ->
      """WITH b AS (
        |  SELECT event_type,
        |         CASE WHEN value < 0.0 THEN 0
        |              WHEN value >= 500.0 THEN 65
        |              ELSE floor((value - 0.0) * 64 / (500.0 - 0.0))::BIGINT + 1
        |         END AS slot
        |  FROM events
        |), g AS (SELECT DISTINCT event_type FROM events),
        |r AS (SELECT unnest(range(0, 66)) AS slot),
        |c AS (SELECT event_type, slot, count(*) AS cnt FROM b GROUP BY 1, 2),
        |reg AS (
        |  SELECT g.event_type, r.slot, coalesce(c.cnt, 0) AS cnt
        |  FROM g CROSS JOIN r
        |  LEFT JOIN c ON c.event_type = g.event_type AND c.slot = r.slot
        |), cum AS (
        |  SELECT event_type, slot, cnt,
        |         sum(cnt) OVER (PARTITION BY event_type ORDER BY slot) AS cum,
        |         sum(cnt) OVER (PARTITION BY event_type ORDER BY slot) - cnt AS cumb,
        |         sum(cnt) OVER (PARTITION BY event_type) AS tot
        |  FROM reg
        |)
        |SELECT event_type, q,
        |       round(CASE WHEN slot = 0 THEN 0.0
        |                  WHEN slot = 65 THEN 500.0
        |                  ELSE 0.0 + ((slot - 1)::DOUBLE +
        |                    (q * tot::DOUBLE - cumb::DOUBLE) / cnt::DOUBLE) *
        |                    ((500.0 - 0.0) / 64) END, 6) AS est
        |FROM cum CROSS JOIN (SELECT unnest([0.25, 0.5, 0.9]::DOUBLE[]) AS q) qs
        |WHERE cnt > 0 AND cumb::DOUBLE < q * tot::DOUBLE
        |  AND q * tot::DOUBLE <= cum::DOUBLE""".stripMargin,
    "d17_cms_registers" ->
      """WITH tok AS (
        |  SELECT source,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                            x -> x <> '')) AS w
        |  FROM documents
        |), occ AS (
        |  SELECT t.source,
        |         (j.j * 128 +
        |          ('0x' || substr(md5(t.w), 7 * j.j + 1, 7))::BIGINT % 128) AS slot
        |  FROM tok t CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j
        |), nz AS (
        |  SELECT source, slot, count(*)::BIGINT AS c FROM occ GROUP BY 1, 2
        |), grid AS (
        |  SELECT DISTINCT source, gs.g::BIGINT AS slot
        |  FROM documents, generate_series(0, 511) gs(g)
        |)
        |SELECT grid.source, grid.slot, coalesce(nz.c, 0)::BIGINT AS cnt
        |FROM grid LEFT JOIN nz ON nz.source = grid.source AND nz.slot = grid.slot""".stripMargin,
    "d18_cms_estimate" ->
      """WITH tok AS (
        |  SELECT source,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                            x -> x <> '')) AS w
        |  FROM documents
        |), cand AS (
        |  SELECT source, w AS token, count(*)::BIGINT AS n_exact
        |  FROM tok
        |  WHERE ('0x' || substr(md5(w), 1, 8))::BIGINT < 1073741824
        |  GROUP BY 1, 2
        |), occ AS (
        |  SELECT source,
        |         (j.j * 128 +
        |          ('0x' || substr(md5(w), 7 * j.j + 1, 7))::BIGINT % 128) AS slot
        |  FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j
        |), regs AS (
        |  SELECT source, slot, count(*)::BIGINT AS cnt FROM occ GROUP BY 1, 2
        |), est AS (
        |  SELECT c.source, c.token, min(r.cnt)::BIGINT AS est
        |  FROM cand c
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j
        |  JOIN regs r ON r.source = c.source
        |   AND r.slot = (j.j * 128 +
        |                 ('0x' || substr(md5(c.token), 7 * j.j + 1, 7))::BIGINT % 128)
        |  GROUP BY 1, 2
        |)
        |SELECT e.source, e.token, e.est, c.n_exact
        |FROM est e JOIN cand c ON c.source = e.source AND c.token = e.token""".stripMargin,
    "t14_perplexity_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                            x -> x <> '')) AS w
        |  FROM documents
        |), f AS (
        |  SELECT w, count(*)::DOUBLE AS c FROM tok GROUP BY w
        |), tot AS (SELECT count(*)::DOUBLE AS n FROM tok),
        |scored AS (
        |  SELECT t.doc_id, round(avg(-ln(f.c / tot.n)), 6) AS avg_logprob
        |  FROM tok t JOIN f USING (w) CROSS JOIN tot
        |  GROUP BY t.doc_id
        |)
        |SELECT doc_id, avg_logprob,
        |       CASE WHEN avg_logprob < 3.40 THEN 'head'
        |            WHEN avg_logprob < 3.41 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM scored""".stripMargin,
    "d14_semantic_dedup" ->
      """WITH RECURSIVE c AS (
        |  SELECT vec_id AS cell_id, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id < 8
        |), a AS (
        |  SELECT e.vec_id, e.embedding, c.cell_id
        |  FROM embeddings e CROSS JOIN c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_cosine_similarity(c.cv, e.embedding::DOUBLE[]) DESC,
        |             c.cell_id ASC) <= 2
        |), p AS (
        |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        |  FROM a x JOIN a y ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
        |), pairs AS (
        |  SELECT p.id_a, p.id_b
        |  FROM p
        |  JOIN embeddings ea ON ea.vec_id = p.id_a
        |  JOIN embeddings eb ON eb.vec_id = p.id_b
        |  WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[],
        |                                     eb.embedding::DOUBLE[]), 6) >= 0.4
        |), e2 AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs
        |  UNION
        |  SELECT id_b, id_a FROM pairs
        |), cc AS (
        |  SELECT u AS v, u AS lbl FROM e2
        |  UNION
        |  SELECT e2.v, cc.lbl FROM e2 JOIN cc ON e2.u = cc.v
        |), lab AS (
        |  SELECT v AS vec_id, min(lbl) AS cluster_id FROM cc GROUP BY v
        |)
        |SELECT emb.vec_id, emb.label
        |FROM embeddings emb
        |LEFT JOIN lab ON emb.vec_id = lab.vec_id
        |WHERE lab.vec_id IS NULL OR lab.cluster_id = emb.vec_id""".stripMargin,
    "t11_decontaminate" -> DecontaminateOracle,
    "t12_pii_redact" ->
      """WITH inj AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id::VARCHAR
        |         || '@example.com now' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.'
        |         || (doc_id % 256)::VARCHAR || '.1' ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-5309'
        |         ELSE '' END AS t
        |  FROM documents
        |), red AS (
        |  SELECT doc_id, t,
        |    regexp_replace(regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |      '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS clean
        |  FROM inj
        |)
        |SELECT doc_id,
        |  len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
        |  len(regexp_extract_all(t,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ip,
        |  len(regexp_extract_all(t,
        |    '\b\d{3}-\d{3}-\d{4}\b'))::BIGINT AS n_phone,
        |  len(clean)::BIGINT AS clean_len,
        |  md5(clean) AS clean_md5
        |FROM red""".stripMargin,
    "s26_label_centroids" ->
      """SELECT label, r.i,
        |       round(avg(embedding[r.i + 1]::DOUBLE), 6) AS m
        |FROM embeddings CROSS JOIN range(0, 64) r(i)
        |GROUP BY label, r.i""".stripMargin,
    "s24_ann_quantized" ->
      """WITH m AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS mx
        |  FROM embeddings
        |), qz AS (
        |  SELECT vec_id,
        |         CASE WHEN mx > 0
        |              THEN list_transform(v, x -> round(x * 127.0 / mx))
        |              ELSE list_transform(v, x -> 0.0::DOUBLE) END AS qv
        |  FROM m
        |)
        |SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |       round(list_cosine_similarity(a.qv, b.qv), 6) AS qcos
        |FROM qz a JOIN qz b ON b.vec_id <> a.vec_id
        |WHERE a.vec_id < 5
        |QUALIFY row_number() OVER (PARTITION BY a.vec_id
        |  ORDER BY qcos DESC, b.vec_id ASC) <= 10""".stripMargin,
    // s32/s33: PQ in the int8-quantized domain — every distance is an exact
    // integer, so even the APPROXIMATE codes/search are hash-comparable.
    // Codebook = quantized vectors of ids < 64 (the fixed-seed convention
    // of s18); dim 64 split into 4 subspaces of 16.
    "s32_pq_encode" ->
      """WITH m0 AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS mx
        |  FROM embeddings
        |), qz AS (
        |  SELECT vec_id,
        |         list_transform(range(64), i -> CASE WHEN mx > 0
        |           THEN round(embedding[i+1]::DOUBLE * 127.0 / mx)::BIGINT
        |           ELSE 0::BIGINT END) AS q
        |  FROM m0
        |), sub AS (
        |  SELECT vec_id, s.m AS sm, list_slice(q, s.m*16+1, s.m*16+16) AS sv
        |  FROM qz, (SELECT unnest(range(4)) AS m) s
        |), cb AS (
        |  SELECT sm, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < 64
        |), dist AS (
        |  SELECT s.vec_id, s.sm, c.cid,
        |         list_sum(list_transform(range(16),
        |           j -> (s.sv[j+1] - c.cv[j+1]) * (s.sv[j+1] - c.cv[j+1])))::BIGINT AS d
        |  FROM sub s JOIN cb c ON s.sm = c.sm
        |)
        |SELECT vec_id, sm AS m, cid AS code FROM dist
        |QUALIFY row_number() OVER (PARTITION BY vec_id, sm ORDER BY d, cid) = 1""".stripMargin,
    "s33_pq_adc_ann" ->
      """WITH m0 AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS mx
        |  FROM embeddings
        |), qz AS (
        |  SELECT vec_id,
        |         list_transform(range(64), i -> CASE WHEN mx > 0
        |           THEN round(embedding[i+1]::DOUBLE * 127.0 / mx)::BIGINT
        |           ELSE 0::BIGINT END) AS q
        |  FROM m0
        |), sub AS (
        |  SELECT vec_id, s.m AS sm, list_slice(q, s.m*16+1, s.m*16+16) AS sv
        |  FROM qz, (SELECT unnest(range(4)) AS m) s
        |), cb AS (
        |  SELECT sm, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < 64
        |), dist AS (
        |  SELECT s.vec_id, s.sm, c.cid,
        |         list_sum(list_transform(range(16),
        |           j -> (s.sv[j+1] - c.cv[j+1]) * (s.sv[j+1] - c.cv[j+1])))::BIGINT AS d
        |  FROM sub s JOIN cb c ON s.sm = c.sm
        |), codes AS (
        |  SELECT vec_id, sm, cid FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, sm ORDER BY d, cid) = 1
        |), qlut AS (
        |  SELECT vec_id AS query_id, sm, cid, d FROM dist WHERE vec_id < 5
        |), approx AS (
        |  SELECT ql.query_id, c.vec_id AS neighbor_id, sum(ql.d)::BIGINT AS adist
        |  FROM codes c JOIN qlut ql ON ql.sm = c.sm AND ql.cid = c.cid
        |  WHERE c.vec_id <> ql.query_id
        |  GROUP BY 1, 2
        |)
        |SELECT query_id, neighbor_id, adist FROM approx
        |QUALIFY row_number() OVER
        |  (PARTITION BY query_id ORDER BY adist, neighbor_id) <= 10""".stripMargin,
    "s23_embed_quant" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS mx
        |  FROM embeddings
        |)
        |SELECT m.vec_id, r.i,
        |       CASE WHEN m.mx > 0
        |            THEN round(m.embedding[r.i + 1]::DOUBLE * 127.0 / m.mx)::BIGINT
        |            ELSE 0::BIGINT END AS q,
        |       round(m.mx, 6) AS scale
        |FROM m CROSS JOIN range(0, 64) r(i)""".stripMargin,
    "t9_sequence_pack" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |                    x -> x <> ''))::BIGINT AS n_tokens,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS h
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tokens, h % 8 AS bucket,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY h % 8 ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM d
        |)
        |SELECT doc_id, bucket, (cum // 2048)::BIGINT AS bin_id, n_tokens
        |FROM c""".stripMargin,
    "t8_curation_pipeline" ->
      """WITH RECURSIVE f AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                x -> x <> '') AS lt,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |                    x -> x <> '')) AS n_tok,
        |    round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
        |          / greatest(length(text), 1)::DOUBLE, 6) AS punct_r,
        |    length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace
        |  FROM documents
        |), q AS (
        |  SELECT doc_id,
        |    round(((CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
        |       + (CASE WHEN punct_r < 0.1 THEN 1.0 ELSE 0.0 END)
        |       + (CASE WHEN round(len(list_filter(lt, t -> list_contains(
        |            ['the','a','an','and','or','of','to','in','is','it','that','for',
        |             'on','with','as','was','at','by'], t)))
        |            / greatest(n_tok, 1)::DOUBLE, 6) BETWEEN 0.05 AND 0.7
        |          THEN 1.0 ELSE 0.0 END)
        |       + (CASE WHEN n_nonspace / greatest(n_tok, 1)::DOUBLE
        |            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END))
        |       / 4.0, 4) AS quality
        |  FROM f
        |), keep1 AS (
        |  SELECT d.doc_id, d.lang, d.text, q.quality
        |  FROM documents d JOIN q USING (doc_id) WHERE q.quality >= 0.5
        |), keep2 AS (
        |  SELECT * FROM keep1
        |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        |), w2 AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM documents
        |), t2 AS (
        |  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
        |      list_transform(range(1, len(words) - 1),
        |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |    ELSE [array_to_string(words, ' ')] END AS sh
        |  FROM w2
        |), sig AS (
        |  SELECT doc_id, list_transform(range(0, 16), i ->
        |    list_min(list_transform(sh,
        |      s -> ('0x' || substr(md5(s || '#' || i::VARCHAR), 1, 8))::BIGINT))) AS sig
        |  FROM t2
        |), bands AS (
        |  SELECT doc_id, sig, unnest(range(0, 4)) AS band FROM sig
        |), keyed AS (
        |  SELECT doc_id, sig, band, sig[band*4 + 1 : band*4 + 4] AS bk FROM bands
        |), pr AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |         a.sig AS sa, b.sig AS sb
        |  FROM keyed a JOIN keyed b
        |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
        |), pairs AS (
        |  SELECT id_a, id_b FROM pr
        |  WHERE len(list_filter(range(1, 17), i -> sa[i] = sb[i])) >= 4
        |), e AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs
        |  UNION
        |  SELECT id_b, id_a FROM pairs
        |), cc AS (
        |  SELECT u AS v, u AS lbl FROM e
        |  UNION
        |  SELECT e.v, cc.lbl FROM e JOIN cc ON e.u = cc.v
        |), lbl AS (
        |  SELECT v AS doc_id, min(lbl) AS cluster_id FROM cc GROUP BY v
        |), keep3 AS (
        |  SELECT k.doc_id, k.lang, k.quality
        |  FROM keep2 k LEFT JOIN lbl ON k.doc_id = lbl.doc_id
        |  WHERE lbl.cluster_id IS NULL OR lbl.cluster_id = k.doc_id
        |)
        |SELECT doc_id, lang, quality FROM keep3
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT,
        |           doc_id) <= 25""".stripMargin,
    "d28_embed_neardup_lsh" ->
      """WITH p AS (
        |  SELECT t.t, j.j,
        |         list_transform(range(0, 64), i ->
        |           ((('0x' || substr(md5('p#' || t.t || '#' || j.j || '#' || i), 1, 8))::BIGINT
        |             % 2000000) - 1000000) / 1000000.0) AS pl
        |  FROM range(0, 4) t(t), range(0, 8) j(j)
        |), b AS (
        |  SELECT e.vec_id, p.t,
        |         sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.pl) > 0
        |             THEN (1 << p.j) ELSE 0 END)::BIGINT AS bucket
        |  FROM embeddings e CROSS JOIN p
        |  GROUP BY e.vec_id, p.t
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
        |  FROM b a JOIN b c ON a.t = c.t AND a.bucket = c.bucket
        |  WHERE a.vec_id < c.vec_id
        |)
        |SELECT cand.id_a, cand.id_b,
        |       round(list_cosine_similarity(ea.embedding::DOUBLE[],
        |                                    eb.embedding::DOUBLE[]), 6) AS cos_sim
        |FROM cand
        |JOIN embeddings ea ON ea.vec_id = cand.id_a
        |JOIN embeddings eb ON eb.vec_id = cand.id_b
        |WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[],
        |                                   eb.embedding::DOUBLE[]), 6) >= 0.4""".stripMargin,
    "d13_embed_neardup_portable" ->
      """WITH c AS (
        |  SELECT vec_id AS cell_id, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id < 8
        |), a AS (
        |  SELECT e.vec_id, e.embedding, c.cell_id
        |  FROM embeddings e CROSS JOIN c
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_cosine_similarity(c.cv, e.embedding::DOUBLE[]) DESC,
        |             c.cell_id ASC) <= 2
        |), p AS (
        |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        |  FROM a x JOIN a y ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
        |)
        |SELECT p.id_a, p.id_b,
        |       round(list_cosine_similarity(ea.embedding::DOUBLE[],
        |                                    eb.embedding::DOUBLE[]), 6) AS cos_sim
        |FROM p
        |JOIN embeddings ea ON ea.vec_id = p.id_a
        |JOIN embeddings eb ON eb.vec_id = p.id_b
        |WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[],
        |                                   eb.embedding::DOUBLE[]), 6) >= 0.4""".stripMargin,
    "d12_dedup_clusters" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
        |      list_transform(range(1, len(words) - 1),
        |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |    ELSE [array_to_string(words, ' ')] END AS sh
        |  FROM w
        |), sig AS (
        |  SELECT doc_id, list_transform(range(0, 16), i ->
        |    list_min(list_transform(sh,
        |      s -> ('0x' || substr(md5(s || '#' || i::VARCHAR), 1, 8))::BIGINT))) AS sig
        |  FROM t
        |), bands AS (
        |  SELECT doc_id, sig, unnest(range(0, 4)) AS band FROM sig
        |), keyed AS (
        |  SELECT doc_id, sig, band,
        |         sig[band*4 + 1 : band*4 + 4] AS bk
        |  FROM bands
        |), pr AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |         a.sig AS sa, b.sig AS sb
        |  FROM keyed a JOIN keyed b
        |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
        |), pairs AS (
        |  SELECT id_a, id_b FROM pr
        |  WHERE len(list_filter(range(1, 17), i -> sa[i] = sb[i])) >= 4
        |), e AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs
        |  UNION
        |  SELECT id_b, id_a FROM pairs
        |), cc AS (
        |  SELECT u AS v, u AS lbl FROM e
        |  UNION
        |  SELECT e.v, cc.lbl FROM e JOIN cc ON e.u = cc.v
        |)
        |SELECT v AS doc_id, min(lbl) AS cluster_id FROM cc GROUP BY v""".stripMargin,
    "r39_stream_static_join" ->
      """SELECT e.user_id, e.event_id, e.event_type, e.value,
        |       epoch_ms(e.ts) AS ts_ms, n.n_name
        |FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey""".stripMargin,
    "r30_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |       epoch_ms(p.ts) AS purchase_ms, epoch_ms(c.ts) AS click_ms
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND c.ts <= p.ts
        | AND c.ts >= p.ts - INTERVAL 1 HOUR
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'""".stripMargin,
    // stream-stream LEFT OUTER (r49): the µs-window left join, null side
    // included — integer-µs arithmetic so both ts vintages replay exactly;
    // ms outputs are double-floored like the engine's unix_millis(µs ts)
    "r49_stream_outer_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us
        |  FROM events
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, us FROM e
        |  WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT event_id AS click_id, user_id, us FROM e
        |  WHERE event_type = 'click'
        |)
        |SELECT p.purchase_id, c.click_id,
        |       p.us // 1000 AS purchase_ms, c.us // 1000 AS click_ms
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND c.us BETWEEN p.us - 3600000000 AND p.us""".stripMargin,
    // the FULL OUTER completion of r49: same µs window, both null sides
    "r55_stream_full_outer" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us
        |  FROM events
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, us FROM e
        |  WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT event_id AS click_id, user_id, us FROM e
        |  WHERE event_type = 'click'
        |)
        |SELECT p.purchase_id, c.click_id,
        |       p.us // 1000 AS purchase_ms, c.us // 1000 AS click_ms
        |FROM p FULL JOIN c ON p.user_id = c.user_id
        |  AND c.us BETWEEN p.us - 3600000000 AND p.us""".stripMargin,
    "r29_cube_agg" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |       count(*) AS cnt,
        |       sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS sum_cents
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "r28_range_join" ->
      """SELECT e.event_id AS err_id, count(*) AS n_clicks
        |FROM events e JOIN events c
        |  ON abs(epoch_ms(e.ts) - epoch_ms(c.ts)) <= 60000
        |WHERE e.event_type = 'error' AND c.event_type = 'click'
        |GROUP BY 1""".stripMargin,
    "r26_stream_tumble" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
        |       event_type, count(*) AS cnt,
        |       round(sum(value), 3) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "r27_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice >
        |  (SELECT quantile_cont(o_totalprice, 0.5) FROM orders)""".stripMargin,
    "s15_mor_time_travel" -> TimeTravelOracle,
    "s62_sql_time_travel" -> TimeTravelOracle,
    "r25_percentiles" ->
      """SELECT o_orderstatus,
        |       round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
        |       count(*) AS cnt
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "s14_mor_incremental" ->
      """WITH b AS (
        |  SELECT min(epoch_ns(ts)) + (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2 AS mid
        |  FROM events
        |)
        |SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events, b WHERE epoch_ns(ts) > b.mid
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "r20_semi_join" ->
      """SELECT * FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "r21_anti_join" ->
      """SELECT * FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)""".stripMargin,
    "r22_outer_join_agg" ->
      """SELECT c.c_custkey, c.c_name, coalesce(t.cnt, 0)::BIGINT AS order_cnt
        |FROM customer c LEFT JOIN
        |  (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1) t
        |  ON c.c_custkey = t.o_custkey""".stripMargin,
    "r23_intersect" ->
      """SELECT user_id FROM events
        |INTERSECT
        |SELECT c_custkey AS user_id FROM customer""".stripMargin,
    "r24_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT user_id AS c_custkey FROM events""".stripMargin,
    "t7_fingerprint" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, CASE WHEN len(words) >= 5 THEN
        |      list_transform(range(1, len(words) - 3),
        |        i -> array_to_string(words[i:i+4], ' '))
        |    ELSE [array_to_string(words, ' ')] END AS wins
        |  FROM w
        |)
        |SELECT doc_id, list_min(list_transform(wins,
        |  s -> ('0x' || substr(md5(s), 1, 8))::BIGINT)) AS fp
        |FROM t""".stripMargin,
    // the forward direction: first click AT-OR-AFTER each purchase,
    // ties to the min (ts, event_id) — r16's symmetric twin
    "r58_asof_forward" ->
      """SELECT user_id, p_event_id, p_ms, c_event_id, c_ms FROM (
        |  SELECT p.user_id, p.event_id AS p_event_id, epoch_ms(p.ts) AS p_ms,
        |         c.event_id AS c_event_id, epoch_ms(c.ts) AS c_ms,
        |         row_number() OVER (PARTITION BY p.event_id
        |                            ORDER BY c.ts ASC, c.event_id ASC) AS rn
        |  FROM events p JOIN events c
        |    ON c.user_id = p.user_id AND c.ts >= p.ts
        |  WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |) WHERE rn = 1""".stripMargin,
    "r16_asof_join" ->
      """SELECT user_id, p_event_id, p_ms, c_event_id, c_ms FROM (
        |  SELECT p.user_id, p.event_id AS p_event_id, epoch_ms(p.ts) AS p_ms,
        |         c.event_id AS c_event_id, epoch_ms(c.ts) AS c_ms,
        |         row_number() OVER (PARTITION BY p.event_id
        |                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
        |  FROM events p JOIN events c
        |    ON c.user_id = p.user_id AND c.ts <= p.ts
        |  WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |) WHERE rn = 1""".stripMargin,
    "r17_window_analytics" ->
      """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
        |  rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS value_rank,
        |  coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |           -1.0) AS prev_value,
        |  (sum(round(value * 1000000)::BIGINT)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING))::BIGINT AS running_micros
        |FROM events""".stripMargin,
    "r18_rollup_agg" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |       count(*) AS cnt,
        |       sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS sum_cents
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,
    "r47_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |       count(*) AS cnt,
        |       sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS sum_cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority))""".stripMargin,
    // built-in session_window sessions == batch gaps-and-islands at µs
    // precision; session end = max event + gap; an event at EXACTLY
    // prev+gap breaks (half-open windows), hence >= in the break rule
    "r54_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events
        |), o AS (
        |  SELECT user_id, us,
        |    CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |           OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |              >= 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e
        |), s AS (
        |  SELECT user_id, us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT user_id,
        |       (min(us) // 1000)::BIGINT AS session_start_ms,
        |       ((max(us) + 1800000000) // 1000)::BIGINT AS session_end_ms,
        |       count(*)::BIGINT AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // TPC-H shapes, money math in integer micros (per-row product rounded
    // once → long sums, engine/partitioning-exact)
    "r51_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(round(l_quantity * 1000000)::BIGINT)::BIGINT AS sum_qty_micros,
        |  sum(round(l_extendedprice * 1000000)::BIGINT)::BIGINT AS sum_base_micros,
        |  sum(round(l_extendedprice * (1.0 - l_discount) * 1000000)::BIGINT)::BIGINT
        |    AS sum_disc_micros,
        |  sum(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
        |      * 1000000)::BIGINT)::BIGINT AS sum_charge_micros,
        |  count(*)::BIGINT AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "r52_tpch_q3" ->
      """SELECT o.o_orderkey,
        |       epoch_ms(o.o_orderdate) AS o_orderdate_ms,
        |       sum(round(l.l_extendedprice * (1.0 - l.l_discount)
        |           * 1000000)::BIGINT)::BIGINT AS revenue_micros
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY o.o_orderkey, o.o_orderdate
        |ORDER BY revenue_micros DESC, o.o_orderkey
        |LIMIT 10""".stripMargin,
    "r53_tpch_q6" ->
      """SELECT sum(round(l_extendedprice * l_discount * 1000000)::BIGINT)::BIGINT
        |         AS revenue_micros,
        |       count(*)::BIGINT AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    // window distribution family over the (o_totalprice, o_orderkey)
    // TOTAL order — NTILE is position-based, so only a total order makes
    // its buckets engine-deterministic
    "r50_window_dist" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    // unpivot: metric values are the source COLUMN NAMES on both engines
    "r48_unpivot" ->
      """SELECT l_returnflag, l_linestatus, metric,
        |       sum(round(value * 1000000)::BIGINT)::BIGINT AS sum_micros,
        |       count(*)::BIGINT AS n
        |FROM (
        |  SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice,
        |         l_discount
        |  FROM lineitem
        |) UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount))
        |GROUP BY l_returnflag, l_linestatus, metric""".stripMargin,
    "r19_salted_join" ->
      """SELECT o.o_orderkey, c.c_name, o.o_totalprice
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,
    // storage-bucketed co-located join: the bucketing changes WHERE the
    // shuffle happens (write time, asserted in-entry), never the answer
    "r56_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       sum(CAST(round(l_quantity * 1e6) AS BIGINT))::BIGINT
        |         AS sum_qty_micros,
        |       sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 1e6)
        |           AS BIGINT))::BIGINT AS rev_micros
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "t31_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |m AS (SELECT min(n) AS mn FROM c),
        |r AS (SELECT lang,
        |        floor(1e6 * pow(mn::DOUBLE / n, 0.5))::BIGINT AS ppm
        |      FROM c, m)
        |SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
        |FROM documents d JOIN r USING (lang)
        |WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
        |      < (4294967296 * ppm) // 1000000""".stripMargin,
    "t5_hash_sample" ->
      """SELECT * FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT < 858993459""".stripMargin,
    "t6_quota_sample" ->
      """SELECT * FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT,
        |           doc_id) <= 50""".stripMargin,
    "d9_simhash_portable" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS toks
        |  FROM documents
        |), h AS (
        |  SELECT doc_id,
        |         list_transform(toks,
        |           t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT) AS hs,
        |         len(toks) AS n
        |  FROM w
        |)
        |SELECT doc_id,
        |  list_sum(list_transform(range(0, 16), j -> CASE
        |    WHEN 2*len(list_filter(hs, x -> (x >> (0*16+j)) & 1 = 1)) > n
        |    THEN (1<<j)::BIGINT ELSE 0 END))::BIGINT AS c0,
        |  list_sum(list_transform(range(0, 16), j -> CASE
        |    WHEN 2*len(list_filter(hs, x -> (x >> (1*16+j)) & 1 = 1)) > n
        |    THEN (1<<j)::BIGINT ELSE 0 END))::BIGINT AS c1,
        |  list_sum(list_transform(range(0, 16), j -> CASE
        |    WHEN 2*len(list_filter(hs, x -> (x >> (2*16+j)) & 1 = 1)) > n
        |    THEN (1<<j)::BIGINT ELSE 0 END))::BIGINT AS c2,
        |  list_sum(list_transform(range(0, 16), j -> CASE
        |    WHEN 2*len(list_filter(hs, x -> (x >> (3*16+j)) & 1 = 1)) > n
        |    THEN (1<<j)::BIGINT ELSE 0 END))::BIGINT AS c3
        |FROM h""".stripMargin,
    // the PRODUCTION minhash pair entry (md5 family default since r11):
    // 64 components, 16 bands x 4 rows, est_jaccard >= 0.3
    "d2_minhash_pairs" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
        |      list_transform(range(1, len(words) - 1),
        |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |    ELSE [array_to_string(words, ' ')] END AS sh
        |  FROM w
        |), sig AS (
        |  SELECT doc_id, list_transform(range(0, 64), i ->
        |    list_min(list_transform(sh,
        |      s -> ('0x' || substr(md5(s || '#' || i::VARCHAR), 1, 8))::BIGINT))) AS sig
        |  FROM t
        |), bands AS (
        |  SELECT doc_id, sig, unnest(range(0, 16)) AS band FROM sig
        |), keyed AS (
        |  SELECT doc_id, sig, band,
        |         sig[band*4 + 1 : band*4 + 4] AS bk
        |  FROM bands
        |), p AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |         a.sig AS sa, b.sig AS sb
        |  FROM keyed a JOIN keyed b
        |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
        |)
        |SELECT id_a, id_b,
        |       (len(list_filter(range(1, 65), i -> sa[i] = sb[i])) / 64.0)
        |         AS est_jaccard
        |FROM p
        |WHERE len(list_filter(range(1, 65), i -> sa[i] = sb[i])) / 64.0 >= 0.3""".stripMargin,
    // the PRODUCTION simhash pair entry (md5 token family default since
    // r11): chunk-pigeonhole candidates, xor-popcount hamming <= 3
    // byte-level payload near-dup: the d3 SimHash recurrence with hex
    // 4-byte windows as the token stream (kernel lowercases, so the
    // oracle hashes lower(hex)); pairs from chunk equality, hamming <= 3
    "m3_binary_neardup" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_transform(range(0, octet_length(text::BLOB) // 4),
        |           i -> substr(lower(hex(text::BLOB)), (i*8 + 1)::INT, 8)) AS toks
        |  FROM documents
        |), h AS (
        |  SELECT doc_id,
        |         list_transform(toks,
        |           t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT) AS hs,
        |         len(toks) AS n
        |  FROM w
        |), ch AS (
        |  SELECT doc_id, list_transform(range(0, 4), c ->
        |    (list_sum(list_transform(range(0, 16), j -> CASE
        |      WHEN 2*len(list_filter(hs, x -> (x >> (c*16+j)) & 1 = 1)) > n
        |      THEN (1<<j)::BIGINT ELSE 0 END)))::BIGINT) AS cs
        |  FROM h
        |), u AS (
        |  SELECT doc_id, cs, chunk, cs[chunk + 1] AS cv
        |  FROM ch, unnest(range(0, 4)) AS t(chunk)
        |), p AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |         a.cs AS ca, b.cs AS cb
        |  FROM u a JOIN u b
        |    ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id
        |)
        |SELECT id_a, id_b,
        |  (list_sum(list_transform(range(1, 5),
        |     i -> bit_count(xor(ca[i], cb[i])))))::BIGINT AS hamming
        |FROM p
        |WHERE list_sum(list_transform(range(1, 5),
        |        i -> bit_count(xor(ca[i], cb[i])))) <= 3""".stripMargin,
    "d3_simhash_pairs" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS toks
        |  FROM documents
        |), h AS (
        |  SELECT doc_id,
        |         list_transform(toks,
        |           t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT) AS hs,
        |         len(toks) AS n
        |  FROM w
        |), ch AS (
        |  SELECT doc_id, list_transform(range(0, 4), c ->
        |    (list_sum(list_transform(range(0, 16), j -> CASE
        |      WHEN 2*len(list_filter(hs, x -> (x >> (c*16+j)) & 1 = 1)) > n
        |      THEN (1<<j)::BIGINT ELSE 0 END)))::BIGINT) AS cs
        |  FROM h
        |), u AS (
        |  SELECT doc_id, cs, chunk, cs[chunk + 1] AS cv
        |  FROM ch, unnest(range(0, 4)) AS t(chunk)
        |), p AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |         a.cs AS ca, b.cs AS cb
        |  FROM u a JOIN u b
        |    ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id
        |)
        |SELECT id_a, id_b,
        |  (list_sum(list_transform(range(1, 5),
        |     i -> bit_count(xor(ca[i], cb[i])))))::BIGINT AS hamming
        |FROM p
        |WHERE list_sum(list_transform(range(1, 5),
        |        i -> bit_count(xor(ca[i], cb[i])))) <= 3""".stripMargin,
    // the PRODUCTION per-source group-signature entry (md5 family default
    // since r11): group sig = elementwise min over every shingle of every
    // doc in the source (the minhash_agg set-union identity), pairwise
    // estimated jaccard between sources
    "d5_minhash_groups" ->
      """WITH w AS (
        |  SELECT source,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM documents
        |), t AS (
        |  SELECT source, CASE WHEN len(words) >= 3 THEN
        |      list_transform(range(1, len(words) - 1),
        |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |    ELSE [array_to_string(words, ' ')] END AS sh
        |  FROM w
        |), e AS (
        |  SELECT source, unnest(sh) AS s FROM t
        |), comp AS (
        |  SELECT source, i,
        |         min(('0x' || substr(md5(s || '#' || i::VARCHAR), 1, 8))::BIGINT) AS h
        |  FROM e, unnest(range(0, 64)) AS u(i)
        |  GROUP BY source, i
        |), sig AS (
        |  SELECT source, list(h ORDER BY i) AS sig FROM comp GROUP BY source
        |)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  round(len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i])) / 64.0, 6)
        |    AS est_jaccard
        |FROM sig a JOIN sig b ON a.source < b.source""".stripMargin,
    // the d8 candidates re-scored with TRUE Levenshtein, kept at
    // 10*dist <= 3*max_len (pure integer inequality, engine-exact)
    "d32_edit_verify" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
        |      list_transform(range(1, len(words) - 1),
        |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |    ELSE [array_to_string(words, ' ')] END AS sh
        |  FROM w
        |), sig AS (
        |  SELECT doc_id, list_transform(range(0, 16), i ->
        |    list_min(list_transform(sh,
        |      s -> ('0x' || substr(md5(s || '#' || i::VARCHAR), 1, 8))::BIGINT))) AS sig
        |  FROM t
        |), bands AS (
        |  SELECT doc_id, sig, unnest(range(0, 4)) AS band FROM sig
        |), keyed AS (
        |  SELECT doc_id, sig, band,
        |         sig[band*4 + 1 : band*4 + 4] AS bk
        |  FROM bands
        |), p AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |         a.sig AS sa, b.sig AS sb
        |  FROM keyed a JOIN keyed b
        |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
        |), cand AS (
        |  SELECT id_a, id_b FROM p
        |  WHERE len(list_filter(range(1, 17), i -> sa[i] = sb[i])) >= 4
        |), v AS (
        |  SELECT c.id_a, c.id_b,
        |         levenshtein(da.text, db.text)::BIGINT AS dist,
        |         greatest(length(da.text), length(db.text))::BIGINT AS mx
        |  FROM cand c
        |  JOIN documents da ON da.doc_id = c.id_a
        |  JOIN documents db ON db.doc_id = c.id_b
        |)
        |SELECT id_a, id_b, dist FROM v
        |WHERE dist * 10 <= mx * 3""".stripMargin,
    "d8_minhash_portable" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
        |      list_transform(range(1, len(words) - 1),
        |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |    ELSE [array_to_string(words, ' ')] END AS sh
        |  FROM w
        |), sig AS (
        |  SELECT doc_id, list_transform(range(0, 16), i ->
        |    list_min(list_transform(sh,
        |      s -> ('0x' || substr(md5(s || '#' || i::VARCHAR), 1, 8))::BIGINT))) AS sig
        |  FROM t
        |), bands AS (
        |  SELECT doc_id, sig, unnest(range(0, 4)) AS band FROM sig
        |), keyed AS (
        |  SELECT doc_id, sig, band,
        |         sig[band*4 + 1 : band*4 + 4] AS bk
        |  FROM bands
        |), p AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |         a.sig AS sa, b.sig AS sb
        |  FROM keyed a JOIN keyed b
        |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
        |)
        |SELECT id_a, id_b,
        |       len(list_filter(range(1, 17), i -> sa[i] = sb[i]))::BIGINT AS n_match
        |FROM p
        |WHERE len(list_filter(range(1, 17), i -> sa[i] = sb[i])) >= 4""".stripMargin,
    // two-relation form of the d8 pipeline: side b is the re-keyed
    // prefix-perturbed scrape; no symmetry cut, a×b only across sides
    "d27_fuzzy_join" ->
      """WITH u AS (
        |  SELECT 'a' AS side, doc_id, text FROM documents
        |  UNION ALL
        |  SELECT 'b', doc_id + 1000000, 'copy doc ' || text
        |  FROM documents WHERE doc_id % 7 = 0
        |), w AS (
        |  SELECT side, doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM u
        |), t AS (
        |  SELECT side, doc_id, CASE WHEN len(words) >= 3 THEN
        |      list_transform(range(1, len(words) - 1),
        |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |    ELSE [array_to_string(words, ' ')] END AS sh
        |  FROM w
        |), sig AS (
        |  SELECT side, doc_id, list_transform(range(0, 16), i ->
        |    list_min(list_transform(sh,
        |      s -> ('0x' || substr(md5(s || '#' || i::VARCHAR), 1, 8))::BIGINT))) AS sig
        |  FROM t
        |), keyed AS (
        |  SELECT side, doc_id, sig, band,
        |         sig[band*4 + 1 : band*4 + 4] AS bk
        |  FROM (SELECT side, doc_id, sig, unnest(range(0, 4)) AS band FROM sig)
        |), p AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |         a.sig AS sa, b.sig AS sb
        |  FROM keyed a JOIN keyed b
        |    ON a.band = b.band AND a.bk = b.bk
        |   AND a.side = 'a' AND b.side = 'b'
        |)
        |SELECT id_a, id_b,
        |       len(list_filter(range(1, 17), i -> sa[i] = sb[i]))::BIGINT AS n_match
        |FROM p
        |WHERE len(list_filter(range(1, 17), i -> sa[i] = sb[i])) >= 4""".stripMargin,
    // incremental-dedup flags == the corpus-wide pairwise replay: a doc is
    // dup iff some EARLIER doc (batch = doc_id % 3 ordering; same batch →
    // smaller id) shares a band bucket and agrees on >= 4 of 16 slots
    "d31_incr_dedup" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
        |      list_transform(range(1, len(words) - 1),
        |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |    ELSE [array_to_string(words, ' ')] END AS sh
        |  FROM w
        |), sig AS (
        |  SELECT doc_id, list_transform(range(0, 16), i ->
        |    list_min(list_transform(sh,
        |      s -> ('0x' || substr(md5(s || '#' || i::VARCHAR), 1, 8))::BIGINT))) AS sig
        |  FROM t
        |), keyed AS (
        |  SELECT doc_id, sig, band,
        |         sig[band*4 + 1 : band*4 + 4] AS bk
        |  FROM (SELECT doc_id, sig, unnest(range(0, 4)) AS band FROM sig)
        |), p AS (
        |  SELECT DISTINCT a.doc_id AS d, b.doc_id AS partner,
        |         a.sig AS sa, b.sig AS sb
        |  FROM keyed a JOIN keyed b
        |    ON a.band = b.band AND a.bk = b.bk
        |  WHERE (b.doc_id % 3 < a.doc_id % 3)
        |     OR (b.doc_id % 3 = a.doc_id % 3 AND b.doc_id < a.doc_id)
        |), q AS (
        |  SELECT d AS doc_id, min(partner) AS dup_of
        |  FROM p
        |  WHERE len(list_filter(range(1, 17), i -> sa[i] = sb[i])) >= 4
        |  GROUP BY d
        |)
        |SELECT doc.doc_id, (q.dup_of IS NOT NULL) AS is_dup, q.dup_of
        |FROM documents doc LEFT JOIN q USING (doc_id)""".stripMargin,
    "t29_boilerplate" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
        |      list_transform(range(1, len(words) - 1),
        |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |    ELSE [array_to_string(words, ' ')] END AS sh
        |  FROM w
        |), e AS (SELECT doc_id, unnest(sh) AS shingle FROM t
        |), pd AS (
        |  SELECT shingle, doc_id, count(*)::BIGINT AS occ
        |  FROM e GROUP BY 1, 2
        |)
        |SELECT shingle, count(*)::BIGINT AS n_docs,
        |       sum(occ)::BIGINT AS n_occurrences
        |FROM pd GROUP BY shingle HAVING count(*) >= 5""".stripMargin,
    "d6_ngram_jaccard" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
        |      list_distinct(list_transform(range(1, len(words) - 1),
        |        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
        |    ELSE [array_to_string(words, ' ')] END AS sh
        |  FROM w
        |), n AS (SELECT doc_id, len(sh)::BIGINT AS ns FROM t
        |), e AS (SELECT doc_id, unnest(sh) AS s FROM t
        |), p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS inter
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b, inter, na.ns + nb.ns - inter AS uni
        |FROM p JOIN n na ON na.doc_id = p.id_a JOIN n nb ON nb.doc_id = p.id_b
        |WHERE inter * 10 >= (na.ns + nb.ns - inter) * 3""".stripMargin,
    // replays Graph.pageRank's integer micro-unit recurrence over the d6
    // edge set: long sums are order-invariant, so 3 fixpoint rounds are
    // bit-identical across engines
    "d19_pagerank" -> (JaccardPairsCte +
      """, edges AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), deg AS (SELECT u, count(*)::BIGINT AS dg FROM edges GROUP BY u
        |), r0 AS (SELECT u AS node, 1000000::BIGINT AS rank_ppm FROM deg
        |), r1 AS (
        |  SELECT e.v AS node,
        |         (150000 + (850000 * (sum(r.rank_ppm // d.dg))::BIGINT) // 1000000)::BIGINT AS rank_ppm
        |  FROM edges e JOIN deg d ON d.u = e.u JOIN r0 r ON r.node = e.u
        |  GROUP BY e.v
        |), r2 AS (
        |  SELECT e.v AS node,
        |         (150000 + (850000 * (sum(r.rank_ppm // d.dg))::BIGINT) // 1000000)::BIGINT AS rank_ppm
        |  FROM edges e JOIN deg d ON d.u = e.u JOIN r1 r ON r.node = e.u
        |  GROUP BY e.v
        |), r3 AS (
        |  SELECT e.v AS node,
        |         (150000 + (850000 * (sum(r.rank_ppm // d.dg))::BIGINT) // 1000000)::BIGINT AS rank_ppm
        |  FROM edges e JOIN deg d ON d.u = e.u JOIN r2 r ON r.node = e.u
        |  GROUP BY e.v
        |)
        |SELECT node AS doc_id, rank_ppm FROM r3""".stripMargin),
    // per-node triangle counts over the SAME d6/d19 edge set: the triple
    // join enumerates each triangle once under id order a<b<c (pairs are
    // canonical id_a<id_b), then every corner counts it
    "d30_triangles" -> (JaccardPairsCte +
      """, tri AS (
        |  SELECT p1.id_a AS a, p1.id_b AS b, p3.id_b AS c
        |  FROM pairs p1
        |  JOIN pairs p2 ON p2.id_a = p1.id_b
        |  JOIN pairs p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b
        |), corners AS (
        |  SELECT unnest([a, b, c]) AS doc_id FROM tri
        |)
        |SELECT doc_id, count(*)::BIGINT AS n_triangles
        |FROM corners GROUP BY doc_id""".stripMargin),
    // the sketch-guided two-phase plan must reproduce the plain exact HAVING
    "d20_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT source,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                            x -> x <> '')) AS w
        |  FROM documents
        |)
        |SELECT source, w AS token, count(*)::BIGINT AS cnt
        |FROM tok GROUP BY 1, 2 HAVING count(*) >= 40""".stripMargin,
    // reproduces the OPTIMIZER-REWRITTEN plan: registers → harmonic-mean
    // estimate (2dp) → half-up bigint, same arithmetic as d15/d16
    "d21_approx_distinct" ->
      """WITH h AS (
        |  SELECT source, ('0x' || substr(md5(text), 1, 8))::BIGINT AS hv
        |  FROM documents
        |), r AS (
        |  SELECT source, hv // 67108864 AS slot,
        |         CASE WHEN hv % 67108864 = 0 THEN 27
        |              ELSE 27 - length(printf('%b', hv % 67108864)) END AS rho
        |  FROM h
        |), slots AS (
        |  SELECT DISTINCT source, gs.g AS slot
        |  FROM documents, generate_series(0, 63) gs(g)
        |), regs AS (
        |  SELECT s.source, s.slot, coalesce(max(r.rho), 0) AS rho
        |  FROM slots s
        |  LEFT JOIN r ON r.source = s.source AND r.slot = s.slot
        |  GROUP BY s.source, s.slot
        |), agg AS (
        |  SELECT source, sum(pow(2.0, -rho)) AS s,
        |         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END)::BIGINT AS v
        |  FROM regs GROUP BY source
        |)
        |SELECT source,
        |       floor(round(CASE WHEN 0.709 * 64.0 * 64.0 / s <= 160.0 AND v > 0
        |                        THEN 64.0 * ln(64.0 / v)
        |                        ELSE 0.709 * 64.0 * 64.0 / s END, 2)
        |             + 0.5)::BIGINT AS approx_texts
        |FROM agg""".stripMargin,
    // string windows replayed exactly (production joins 64-bit fingerprints;
    // the string-exact recompute must agree on every count)
    "d22_substring_dedup" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS words
        |  FROM documents
        |), t AS (
        |  SELECT doc_id,
        |         list_transform(range(0, len(words) - 15),
        |           i -> {'p': i, 's': array_to_string(words[i+1:i+16], ' ')}) AS sh
        |  FROM w WHERE len(words) >= 16
        |), e AS (SELECT doc_id, unnest(sh) AS u FROM t
        |), f AS (SELECT doc_id, u.p AS pos, u.s AS s FROM e
        |), d AS (SELECT s FROM f GROUP BY s HAVING min(doc_id) <> max(doc_id)
        |), m AS (SELECT f.doc_id, f.pos FROM f JOIN d USING (s)
        |), c AS (
        |  SELECT doc_id, pos,
        |         max(pos + 16) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM m
        |), a AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_dup_windows,
        |         sum(greatest(0, pos + 16 -
        |             greatest(pos, coalesce(prev_end, pos))))::BIGINT AS covered_tokens
        |  FROM c GROUP BY doc_id
        |)
        |SELECT w.doc_id, len(w.words)::BIGINT AS n_tokens,
        |       greatest(len(w.words) - 15, 0)::BIGINT AS n_windows,
        |       coalesce(a.n_dup_windows, 0)::BIGINT AS n_dup_windows,
        |       coalesce(a.covered_tokens, 0)::BIGINT AS covered_tokens
        |FROM w LEFT JOIN a ON w.doc_id = a.doc_id""".stripMargin,
    // the REWRITTEN bounded-aggregate plan must reproduce the window SQL
    // exactly, rank column included (total ordering → deterministic)
    "r36_topk_rewrite" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms,
        |       row_number() OVER (PARTITION BY user_id
        |         ORDER BY epoch_ms(ts) DESC, event_id DESC)::INT AS rn
        |FROM events
        |QUALIFY rn <= 3""".stripMargin,
    // vocab = top-25 by (count DESC, token ASC) — the same deterministic
    // total order the engine's TakeOrdered uses through ties
    "t20_vocab_oov" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                x -> x <> '')) AS token
        |  FROM documents
        |), freq AS (
        |  SELECT token, count(*) AS cnt FROM tok GROUP BY token
        |), vocab AS (
        |  SELECT token FROM freq
        |  QUALIFY row_number() OVER (ORDER BY cnt DESC, token) <= 25
        |)
        |SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
        |       sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
        |FROM tok t LEFT JOIN vocab v ON t.token = v.token
        |GROUP BY t.doc_id""".stripMargin,
    // BPE merge learning: 4 unrolled rounds of (pair-count -> best pair ->
    // greedy merge). The merge fold runs over a chr(1)-delimited string:
    // "last token = lhs" is an ends_with on the delimited form, and the
    // merge itself is appending rhs WITHOUT the separator — exactly the
    // Spark side's aggregate() fold (a merged token never re-merges as
    // left: its string is lhs||rhs, never lhs).
    "t26_bpe_merges" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                x -> x <> '')) AS w
        |  FROM documents
        |), words AS (
        |  SELECT w, count(*)::BIGINT AS cnt FROM tok
        |  WHERE regexp_full_match(w, '[a-z0-9]+') GROUP BY w
        |), s0 AS (
        |  SELECT cnt, list_transform(range(1, length(w)+1), i -> w[i]) AS s
        |  FROM words
        |), p1 AS (
        |  SELECT s[i] AS l, s[i+1] AS r, sum(cnt)::BIGINT AS freq
        |  FROM s0, unnest(range(1, len(s))) AS t(i) GROUP BY 1, 2
        |), b1 AS (SELECT l, r, freq FROM p1 ORDER BY freq DESC, l, r LIMIT 1
        |), s1 AS (
        |  SELECT cnt, string_split(list_reduce(s, (acc, x) -> CASE
        |    WHEN (acc = b1.l OR ends_with(acc, chr(1) || b1.l)) AND x = b1.r
        |    THEN acc || x ELSE acc || chr(1) || x END), chr(1)) AS s
        |  FROM s0, b1
        |), p2 AS (
        |  SELECT s[i] AS l, s[i+1] AS r, sum(cnt)::BIGINT AS freq
        |  FROM s1, unnest(range(1, len(s))) AS t(i) GROUP BY 1, 2
        |), b2 AS (SELECT l, r, freq FROM p2 ORDER BY freq DESC, l, r LIMIT 1
        |), s2 AS (
        |  SELECT cnt, string_split(list_reduce(s, (acc, x) -> CASE
        |    WHEN (acc = b2.l OR ends_with(acc, chr(1) || b2.l)) AND x = b2.r
        |    THEN acc || x ELSE acc || chr(1) || x END), chr(1)) AS s
        |  FROM s1, b2
        |), p3 AS (
        |  SELECT s[i] AS l, s[i+1] AS r, sum(cnt)::BIGINT AS freq
        |  FROM s2, unnest(range(1, len(s))) AS t(i) GROUP BY 1, 2
        |), b3 AS (SELECT l, r, freq FROM p3 ORDER BY freq DESC, l, r LIMIT 1
        |), s3 AS (
        |  SELECT cnt, string_split(list_reduce(s, (acc, x) -> CASE
        |    WHEN (acc = b3.l OR ends_with(acc, chr(1) || b3.l)) AND x = b3.r
        |    THEN acc || x ELSE acc || chr(1) || x END), chr(1)) AS s
        |  FROM s2, b3
        |), p4 AS (
        |  SELECT s[i] AS l, s[i+1] AS r, sum(cnt)::BIGINT AS freq
        |  FROM s3, unnest(range(1, len(s))) AS t(i) GROUP BY 1, 2
        |), b4 AS (SELECT l, r, freq FROM p4 ORDER BY freq DESC, l, r LIMIT 1)
        |SELECT 1::BIGINT AS merge_rank, l AS lhs, r AS rhs, freq FROM b1
        |UNION ALL SELECT 2::BIGINT, l, r, freq FROM b2
        |UNION ALL SELECT 3::BIGINT, l, r, freq FROM b3
        |UNION ALL SELECT 4::BIGINT, l, r, freq FROM b4""".stripMargin,
    // t26's four unrolled training rounds, carrying the word through the
    // folds so the final symbol count joins back per distinct word
    "t28_bpe_encode" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                x -> x <> '')) AS w
        |  FROM documents
        |), ctok AS (
        |  SELECT doc_id, w FROM tok WHERE regexp_full_match(w, '[a-z0-9]+')
        |), words AS (
        |  SELECT w, count(*)::BIGINT AS cnt FROM ctok GROUP BY w
        |), s0 AS (
        |  SELECT w, cnt, list_transform(range(1, length(w)+1), i -> w[i]) AS s
        |  FROM words
        |), p1 AS (
        |  SELECT s[i] AS l, s[i+1] AS r, sum(cnt)::BIGINT AS freq
        |  FROM s0, unnest(range(1, len(s))) AS t(i) GROUP BY 1, 2
        |), b1 AS (SELECT l, r FROM p1 ORDER BY freq DESC, l, r LIMIT 1
        |), s1 AS (
        |  SELECT w, cnt, string_split(list_reduce(s, (acc, x) -> CASE
        |    WHEN (acc = b1.l OR ends_with(acc, chr(1) || b1.l)) AND x = b1.r
        |    THEN acc || x ELSE acc || chr(1) || x END), chr(1)) AS s
        |  FROM s0, b1
        |), p2 AS (
        |  SELECT s[i] AS l, s[i+1] AS r, sum(cnt)::BIGINT AS freq
        |  FROM s1, unnest(range(1, len(s))) AS t(i) GROUP BY 1, 2
        |), b2 AS (SELECT l, r FROM p2 ORDER BY freq DESC, l, r LIMIT 1
        |), s2 AS (
        |  SELECT w, cnt, string_split(list_reduce(s, (acc, x) -> CASE
        |    WHEN (acc = b2.l OR ends_with(acc, chr(1) || b2.l)) AND x = b2.r
        |    THEN acc || x ELSE acc || chr(1) || x END), chr(1)) AS s
        |  FROM s1, b2
        |), p3 AS (
        |  SELECT s[i] AS l, s[i+1] AS r, sum(cnt)::BIGINT AS freq
        |  FROM s2, unnest(range(1, len(s))) AS t(i) GROUP BY 1, 2
        |), b3 AS (SELECT l, r FROM p3 ORDER BY freq DESC, l, r LIMIT 1
        |), s3 AS (
        |  SELECT w, cnt, string_split(list_reduce(s, (acc, x) -> CASE
        |    WHEN (acc = b3.l OR ends_with(acc, chr(1) || b3.l)) AND x = b3.r
        |    THEN acc || x ELSE acc || chr(1) || x END), chr(1)) AS s
        |  FROM s2, b3
        |), p4 AS (
        |  SELECT s[i] AS l, s[i+1] AS r, sum(cnt)::BIGINT AS freq
        |  FROM s3, unnest(range(1, len(s))) AS t(i) GROUP BY 1, 2
        |), b4 AS (SELECT l, r FROM p4 ORDER BY freq DESC, l, r LIMIT 1
        |), s4 AS (
        |  SELECT w, string_split(list_reduce(s, (acc, x) -> CASE
        |    WHEN (acc = b4.l OR ends_with(acc, chr(1) || b4.l)) AND x = b4.r
        |    THEN acc || x ELSE acc || chr(1) || x END), chr(1)) AS s
        |  FROM s3, b4
        |), enc AS (SELECT w, len(s)::BIGINT AS n_sym FROM s4)
        |SELECT c.doc_id, count(*)::BIGINT AS n_words,
        |       sum(e.n_sym)::BIGINT AS n_bpe_tokens
        |FROM ctok c JOIN enc e USING (w)
        |GROUP BY c.doc_id""".stripMargin,
    "t27_quality_classifier" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                x -> x <> '')) AS w
        |  FROM documents
        |), feat AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(w), 1, 8))::BIGINT % 4096 AS f
        |  FROM tok
        |), weighted AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5('w#' || f::VARCHAR), 1, 8))::BIGINT
        |           % 1000001 - 500000 AS wt
        |  FROM feat
        |)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |       sum(wt)::BIGINT AS score_micros,
        |       sum(wt) > 0 AS keep
        |FROM weighted GROUP BY doc_id""".stripMargin,
    "t24_data_checks" ->
      """WITH ca AS (
        |  SELECT count(*) AS n, count(DISTINCT c_custkey) AS dk,
        |         sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS nulls
        |  FROM customer
        |), oa AS (
        |  SELECT count(*) AS n,
        |         sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS neg
        |  FROM orders
        |), orphans AS (
        |  SELECT count(*) AS c FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_orderkey = l.l_orderkey)
        |)
        |SELECT 'customer' AS tbl, 'row_count' AS check, n::BIGINT AS metric,
        |       n > 0 AS passed FROM ca
        |UNION ALL
        |SELECT 'customer', 'key_unique', (n - dk)::BIGINT, n = dk FROM ca
        |UNION ALL
        |SELECT 'customer', 'name_nulls', nulls::BIGINT, nulls = 0 FROM ca
        |UNION ALL
        |SELECT 'orders', 'negative_totalprice', neg::BIGINT, neg = 0 FROM oa
        |UNION ALL
        |SELECT 'lineitem', 'orphan_orderkeys', c::BIGINT, c = 0 FROM orphans""".stripMargin,
    "r38_decayed_score" ->
      """WITH e AS (
        |  SELECT user_id, value, epoch_ms(ts) // 3600000 AS h FROM events
        |), hm AS (
        |  SELECT user_id, max(h) AS hmax FROM e GROUP BY user_id
        |)
        |SELECT e.user_id,
        |       sum(CAST(round(e.value * 100) AS BIGINT) *
        |           CAST(pow(2.0, 30 - (hm.hmax - e.h)) AS BIGINT))::BIGINT
        |         AS score_x2e30,
        |       count(*) AS n_recent
        |FROM e JOIN hm USING (user_id)
        |WHERE hm.hmax - e.h <= 30
        |GROUP BY e.user_id""".stripMargin,
    "r40_funnel" -> FunnelOracle,
    // gaps-and-islands: same island-id arithmetic, same (len DESC,
    // start ASC) deterministic pick
    "r42_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events
        |), i AS (
        |  SELECT user_id, day,
        |         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM d
        |), s AS (
        |  SELECT user_id, count(*)::BIGINT AS len, min(day) AS start_day
        |  FROM i GROUP BY user_id, grp
        |)
        |SELECT user_id, len AS best_len, start_day AS best_start_day,
        |       (count(*) OVER (PARTITION BY user_id))::BIGINT AS n_streaks
        |FROM s
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY len DESC, start_day) = 1""".stripMargin,
    "r43_retention" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS week FROM events
        |), c AS (
        |  SELECT user_id, week,
        |         min(week) OVER (PARTITION BY user_id) AS cohort
        |  FROM d
        |)
        |SELECT cohort, week - cohort AS week_offset,
        |       count(*)::BIGINT AS active_users
        |FROM c GROUP BY 1, 2""".stripMargin,
    "r44_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id,
        |    lead(event_type) OVER
        |      (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS to_type
        |  FROM events
        |), c AS (
        |  SELECT event_type AS from_type, to_type, count(*)::BIGINT AS n
        |  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |       ((n * 1000) // sum(n) OVER (PARTITION BY from_type))::BIGINT AS per_mille
        |FROM c""".stripMargin,
    "r45_journeys" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER
        |      (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS rn
        |  FROM events
        |), j AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS journey
        |  FROM r WHERE rn <= 3 GROUP BY user_id
        |)
        |SELECT journey, count(*)::BIGINT AS n_users
        |FROM j GROUP BY journey""".stripMargin,
    "r46_stickiness" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events
        |), dw AS (SELECT user_id, day, day // 7 AS week FROM d
        |), daily AS (
        |  SELECT week, sum(n)::BIGINT AS sum_daily FROM (
        |    SELECT week, day, count(*)::BIGINT AS n FROM dw GROUP BY 1, 2
        |  ) GROUP BY week
        |), weekly AS (
        |  SELECT week, count(*)::BIGINT AS weekly_active FROM (
        |    SELECT DISTINCT user_id, week FROM dw
        |  ) GROUP BY week
        |)
        |SELECT week, sum_daily, weekly_active,
        |       ((sum_daily * 1000) // (7 * weekly_active))::BIGINT
        |         AS stickiness_per_mille
        |FROM daily JOIN weekly USING (week)""".stripMargin,
    "r37_dpp_join" ->
      """SELECT event_type, count(*) AS n,
        |       round(sum(value), 3) AS sum_value
        |FROM events
        |WHERE event_type IN ('click', 'view', 'signup')
        |GROUP BY event_type""".stripMargin,
    "r32_pivot" ->
      """SELECT user_id,
        |       (count(*) FILTER (event_type = 'click'))::BIGINT AS click,
        |       (count(*) FILTER (event_type = 'error'))::BIGINT AS error,
        |       (count(*) FILTER (event_type = 'purchase'))::BIGINT AS purchase,
        |       (count(*) FILTER (event_type = 'signup'))::BIGINT AS signup,
        |       (count(*) FILTER (event_type = 'view'))::BIGINT AS view
        |FROM events GROUP BY user_id""".stripMargin,
    "r33_gapfill" ->
      """WITH c AS (
        |  SELECT event_type, epoch_ms(ts) // 3600000 AS h, count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2
        |), b AS (
        |  SELECT min(epoch_ms(ts) // 3600000) AS h0,
        |         max(epoch_ms(ts) // 3600000) AS h1
        |  FROM events
        |), g AS (
        |  SELECT t.event_type, unnest(generate_series(b.h0, b.h1)) AS h
        |  FROM (SELECT DISTINCT event_type FROM events) t, b
        |)
        |SELECT g.event_type, g.h * 3600000 AS window_start_ms,
        |       coalesce(c.cnt, 0)::BIGINT AS cnt
        |FROM g LEFT JOIN c ON c.event_type = g.event_type AND c.h = g.h""".stripMargin,
    // every event lands in exactly 4 overlapping 1h/15min windows, all
    // epoch-aligned — same expansion Spark's window() does map-side
    "r34_sliding_agg" ->
      """WITH x AS (
        |  SELECT event_type, value, epoch_ms(ts) AS ms FROM events
        |), w AS (
        |  SELECT event_type, value, ((ms // 900000) - j.j) * 900000 AS ws
        |  FROM x CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j
        |)
        |SELECT ws AS window_start_ms, event_type, count(*)::BIGINT AS cnt,
        |       round(sum(value), 3) AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin,
    "r35_rolling_sum" ->
      """WITH c AS (
        |  SELECT event_type, epoch_ms(ts) // 3600000 AS h, count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2
        |), b AS (
        |  SELECT min(epoch_ms(ts) // 3600000) AS h0,
        |         max(epoch_ms(ts) // 3600000) AS h1
        |  FROM events
        |), g AS (
        |  SELECT t.event_type, unnest(generate_series(b.h0, b.h1)) AS h
        |  FROM (SELECT DISTINCT event_type FROM events) t, b
        |), d AS (
        |  SELECT g.event_type, g.h * 3600000 AS window_start_ms,
        |         coalesce(c.cnt, 0)::BIGINT AS cnt
        |  FROM g LEFT JOIN c ON c.event_type = g.event_type AND c.h = g.h
        |)
        |SELECT event_type, window_start_ms, cnt,
        |       (sum(cnt) OVER (PARTITION BY event_type ORDER BY window_start_ms
        |                       ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))::BIGINT
        |         AS rolling_24h
        |FROM d""".stripMargin,
    // corpus shuffle: shard = md5-bucket mod 8; pos = 1-based rank in the
    // shard under the md5 total order — both pure key functions, so the
    // writer round-trip must land exactly here
    "t32_corpus_shards" ->
      """SELECT doc_id, lang,
        |       (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8)::BIGINT
        |         AS shard_id,
        |       (row_number() OVER (
        |          PARTITION BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8
        |          ORDER BY md5(doc_id::VARCHAR), doc_id))::BIGINT AS pos
        |FROM documents""".stripMargin,
    // greedy md5-order prefix per language under a token budget (the
    // boundary doc overflows; predecessors-strictly-under rule)
    "t33_token_budget" ->
      """WITH w AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |                    x -> x <> ''))::BIGINT AS n_tokens,
        |    md5(doc_id::VARCHAR) AS h
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        |  FROM w
        |)
        |SELECT doc_id, lang, n_tokens FROM c
        |WHERE pre < (CASE WHEN lang = 'en' THEN 5000 ELSE 3000 END)""".stripMargin,
    // two epoch-salted permutations of the t32 rank
    "t34_epoch_shuffle" ->
      """WITH e AS (
        |  SELECT doc_id, lang, 1::BIGINT AS epoch,
        |         md5(doc_id::VARCHAR || '#epoch1') AS h FROM documents
        |  UNION ALL
        |  SELECT doc_id, lang, 2::BIGINT AS epoch,
        |         md5(doc_id::VARCHAR || '#epoch2') AS h FROM documents
        |)
        |SELECT doc_id, lang, epoch,
        |  (('0x' || substr(h, 1, 8))::BIGINT % 4)::BIGINT AS shard_id,
        |  (row_number() OVER (
        |     PARTITION BY epoch, ('0x' || substr(h, 1, 8))::BIGINT % 4
        |     ORDER BY h, doc_id))::BIGINT AS pos
        |FROM e""".stripMargin,
    "t18_split_assign" ->
      """SELECT doc_id, lang,
        |       CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |              < 3435973836 THEN 'train'
        |            WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |              < 3865470566 THEN 'valid'
        |            ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    // chunk k covers tokens [k*40, k*40+50); starts = range(0, n, 40) on
    // both engines; the chunk text is pinned via md5 of the re-joined slice
    "t30_paragraph_dedup" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS t
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, t, unnest(range(0, len(t), 20)) AS st
        |  FROM w WHERE len(t) > 0
        |), c AS (
        |  SELECT doc_id, (st // 20)::BIGINT AS chunk_id,
        |         len(t[st + 1 : st + 20])::BIGINT AS n_tokens,
        |         md5(array_to_string(t[st + 1 : st + 20], ' ')) AS chunk_md5
        |  FROM s
        |), r AS (
        |  SELECT doc_id, n_tokens,
        |         row_number() OVER (PARTITION BY chunk_md5
        |           ORDER BY doc_id, chunk_id) AS rn
        |  FROM c
        |)
        |SELECT doc_id, count(*)::BIGINT AS n_chunks,
        |       count(CASE WHEN rn = 1 THEN 1 END)::BIGINT AS n_kept,
        |       coalesce(sum(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END), 0)::BIGINT AS kept_tokens
        |FROM r GROUP BY doc_id""".stripMargin,
    "t19_chunking" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS t
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, t, unnest(range(0, len(t), 40)) AS st
        |  FROM w WHERE len(t) > 0
        |)
        |SELECT doc_id, (st // 40)::BIGINT AS chunk_id,
        |       len(t[st + 1 : st + 50])::BIGINT AS n_tokens,
        |       md5(array_to_string(t[st + 1 : st + 50], ' ')) AS chunk_md5
        |FROM s""".stripMargin,
    "d7_embed_neardup_exact" ->
      """SELECT * FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         round(list_cosine_similarity(a.embedding::DOUBLE[],
        |                                      b.embedding::DOUBLE[]), 6) AS cos_sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |) WHERE cos_sim >= 0.4""".stripMargin,
    "t4_text_quality" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                x -> x <> '') AS lt,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |                    x -> x <> '')) AS n_tok,
        |    round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
        |          / greatest(length(text), 1)::DOUBLE, 6) AS punct_r,
        |    (length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')))
        |          / greatest(length(text), 1)::DOUBLE AS cjk_r,
        |    length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, n_tok, punct_r, cjk_r,
        |    len(list_filter(lt, t -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','it','that','for',
        |       'on','with','as','was','at','by'], t)))
        |      / greatest(len(lt), 1)::DOUBLE AS en_r,
        |    len(list_filter(lt, t -> list_contains(
        |      ['el','la','los','las','un','una','y','o','de','en','es','que',
        |       'por','con','para','del','se','no'], t)))
        |      / greatest(len(lt), 1)::DOUBLE AS es_r,
        |    len(list_filter(lt, t -> list_contains(
        |      ['der','die','das','ein','eine','und','oder','von','zu','im',
        |       'ist','dass','für','auf','mit','als','den'], t)))
        |      / greatest(len(lt), 1)::DOUBLE AS de_r,
        |    len(list_filter(lt, t -> list_contains(
        |      ['le','la','les','un','une','et','ou','de','en','est','que',
        |       'pour','sur','avec','du','au','des','ne'], t)))
        |      / greatest(len(lt), 1)::DOUBLE AS fr_r,
        |    round(len(list_filter(lt, t -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','it','that','for',
        |       'on','with','as','was','at','by'], t)))
        |      / greatest(n_tok, 1)::DOUBLE, 6) AS sw_r,
        |    n_nonspace / greatest(n_tok, 1)::DOUBLE AS mean_tok_len
        |  FROM f
        |)
        |SELECT doc_id,
        |  CASE WHEN cjk_r > 0.05 THEN 'zh'
        |       WHEN es_r > en_r AND es_r >= de_r AND es_r >= fr_r THEN 'es'
        |       WHEN de_r > en_r AND de_r >= fr_r THEN 'de'
        |       WHEN fr_r > en_r THEN 'fr'
        |       ELSE 'en' END AS lang_pred,
        |  round(((CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
        |       + (CASE WHEN punct_r < 0.1 THEN 1.0 ELSE 0.0 END)
        |       + (CASE WHEN sw_r BETWEEN 0.05 AND 0.7 THEN 1.0 ELSE 0.0 END)
        |       + (CASE WHEN mean_tok_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END))
        |       / 4.0, 4) AS quality
        |FROM r""".stripMargin,
    "t25_enrich_portable" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                x -> x <> '') AS lt,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |                    x -> x <> '')) AS n_tok,
        |    round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
        |          / greatest(length(text), 1)::DOUBLE, 6) AS punct_r,
        |    (length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')))
        |          / greatest(length(text), 1)::DOUBLE AS cjk_r,
        |    length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, n_tok, punct_r, cjk_r,
        |    len(list_filter(lt, t -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','it','that','for',
        |       'on','with','as','was','at','by'], t)))
        |      / greatest(len(lt), 1)::DOUBLE AS en_r,
        |    len(list_filter(lt, t -> list_contains(
        |      ['el','la','los','las','un','una','y','o','de','en','es','que',
        |       'por','con','para','del','se','no'], t)))
        |      / greatest(len(lt), 1)::DOUBLE AS es_r,
        |    len(list_filter(lt, t -> list_contains(
        |      ['der','die','das','ein','eine','und','oder','von','zu','im',
        |       'ist','dass','für','auf','mit','als','den'], t)))
        |      / greatest(len(lt), 1)::DOUBLE AS de_r,
        |    len(list_filter(lt, t -> list_contains(
        |      ['le','la','les','un','une','et','ou','de','en','est','que',
        |       'pour','sur','avec','du','au','des','ne'], t)))
        |      / greatest(len(lt), 1)::DOUBLE AS fr_r,
        |    round(len(list_filter(lt, t -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','it','that','for',
        |       'on','with','as','was','at','by'], t)))
        |      / greatest(n_tok, 1)::DOUBLE, 6) AS sw_r,
        |    n_nonspace / greatest(n_tok, 1)::DOUBLE AS mean_tok_len
        |  FROM f
        |), w AS (
        |  SELECT doc_id, lt AS words FROM f
        |), fp AS (
        |  SELECT doc_id, list_min(list_transform(
        |    CASE WHEN len(words) >= 5 THEN
        |        list_transform(range(1, len(words) - 3),
        |          i -> array_to_string(words[i:i+4], ' '))
        |      ELSE [array_to_string(words, ' ')] END,
        |    s -> ('0x' || substr(md5(s), 1, 8))::BIGINT)) AS fp
        |  FROM w
        |)
        |SELECT r.doc_id,
        |  CASE WHEN cjk_r > 0.05 THEN 'zh'
        |       WHEN es_r > en_r AND es_r >= de_r AND es_r >= fr_r THEN 'es'
        |       WHEN de_r > en_r AND de_r >= fr_r THEN 'de'
        |       WHEN fr_r > en_r THEN 'fr'
        |       ELSE 'en' END AS lang_pred,
        |  round(((CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
        |       + (CASE WHEN punct_r < 0.1 THEN 1.0 ELSE 0.0 END)
        |       + (CASE WHEN sw_r BETWEEN 0.05 AND 0.7 THEN 1.0 ELSE 0.0 END)
        |       + (CASE WHEN mean_tok_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END))
        |       / 4.0, 4) AS quality,
        |  fp.fp
        |FROM r JOIN fp ON r.doc_id = fp.doc_id""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT * FROM documents
        |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1""".stripMargin,
    "m1_multimodal_features" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n,
        |         list_transform(regexp_extract_all(hex(encode(text)), '(.).', 1),
        |           c -> (strpos('0123456789ABCDEF', c) - 1) // 2) AS buckets
        |  FROM documents
        |)
        |SELECT doc_id, n::BIGINT AS byte_len,
        |       len(list_filter(buckets, x -> x = 0)) * 1000000 // n AS f0,
        |       len(list_filter(buckets, x -> x = 1)) * 1000000 // n AS f1,
        |       len(list_filter(buckets, x -> x = 2)) * 1000000 // n AS f2,
        |       len(list_filter(buckets, x -> x = 3)) * 1000000 // n AS f3,
        |       len(list_filter(buckets, x -> x = 4)) * 1000000 // n AS f4,
        |       len(list_filter(buckets, x -> x = 5)) * 1000000 // n AS f5,
        |       len(list_filter(buckets, x -> x = 6)) * 1000000 // n AS f6,
        |       len(list_filter(buckets, x -> x = 7)) * 1000000 // n AS f7
        |FROM b""".stripMargin,
    "m2_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents
        |), f AS (
        |  SELECT doc_id, n, unnest(range(0, (n + 4095) // 4096)) AS idx FROM d
        |)
        |SELECT doc_id, idx AS frame_idx, idx * 4096 AS frame_off,
        |       least(4096, n - idx * 4096) AS frame_len
        |FROM f WHERE idx % 4 = 0""".stripMargin,
    "m0_multimodal_meta" ->
      """SELECT doc_id, strlen(text)::BIGINT AS byte_len,
        |       'image/fake' AS mime
        |FROM documents""".stripMargin,
    "t2_text_stats" ->
      """SELECT doc_id, length(text) AS n_chars,
        |  len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpeish,
        |  round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
        |        / greatest(length(text), 1)::DOUBLE, 6) AS punct_ratio
        |FROM documents""".stripMargin,
    "s12_ann_brute_native" ->
      """SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |       round(list_cosine_similarity(q.embedding::DOUBLE[],
        |                                    c.embedding::DOUBLE[]), 6) AS cos_sim
        |FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |WHERE q.vec_id < 5
        |QUALIFY row_number() OVER
        |  (PARTITION BY q.vec_id ORDER BY cos_sim DESC, c.vec_id ASC) <= 10""".stripMargin,
    "s9_ann_brute" ->
      """SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |       round(list_cosine_similarity(q.embedding::DOUBLE[],
        |                                    c.embedding::DOUBLE[]), 6) AS cos_sim
        |FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |WHERE q.vec_id < 5
        |QUALIFY row_number() OVER
        |  (PARTITION BY q.vec_id ORDER BY cos_sim DESC, c.vec_id ASC) <= 10""".stripMargin,
    // pos = single best >= 0.4; neg = top-5 below 0.4; ties broken on the
    // ROUNDED score by neighbor_id — total order both engines share
    "s38_contrastive_mine" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         round(list_cosine_similarity(q.embedding::DOUBLE[],
        |                                      c.embedding::DOUBLE[]), 6) AS cos_sim
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id % 20 = 0
        |), pos AS (
        |  SELECT query_id, neighbor_id, cos_sim, 'pos' AS role, 1::INT AS rank
        |  FROM scored WHERE cos_sim >= 0.4
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, neighbor_id ASC) = 1
        |), neg AS (
        |  SELECT query_id, neighbor_id, cos_sim, 'neg' AS role,
        |         (row_number() OVER (PARTITION BY query_id
        |            ORDER BY cos_sim DESC, neighbor_id ASC))::INT AS rank
        |  FROM scored WHERE cos_sim < 0.4
        |  QUALIFY rank <= 5
        |)
        |SELECT * FROM pos UNION ALL SELECT * FROM neg""".stripMargin,
    "r1_full_scan" -> "SELECT * FROM customer",
    "r4_filter_eq" -> "SELECT * FROM customer WHERE c_custkey = 42",
    "r6_project_alias" ->
      "SELECT c_name AS full_name, c_acctbal AS balance FROM customer",
    "r7_cast" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |       epoch_ms(o_orderdate) AS od_ms,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str
        |FROM orders""".stripMargin,
    "r8_triple_join" ->
      """SELECT c.c_name AS full_name,
        |       CAST(l.l_orderkey AS VARCHAR) AS id,
        |       l.l_extendedprice AS price,
        |       epoch_ms(l.l_shipdate) AS ts_ms
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey""".stripMargin,
    "r9_agg_count" ->
      "SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey",
    "r10_having_subquery" ->
      """SELECT o_custkey, cnt FROM
        |(SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey) t
        |WHERE cnt > 10""".stripMargin,
    "r11_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "r12_dedup_lww" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "r15_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, epoch_ms(ts) AS ts_ms,
        |         lag(epoch_ms(ts)) OVER w AS prev_ms
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, event_id, ts_ms,
        |         (sum(CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
        |                  THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
        |  FROM g
        |)
        |SELECT user_id, session_id, min(ts_ms) AS session_start_ms,
        |       max(ts_ms) AS session_end_ms, count(*) AS n_events
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    // the streaming form must settle to exactly the batch gap-window result
    "r31_stream_sessions" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, epoch_ms(ts) AS ts_ms,
        |         lag(epoch_ms(ts)) OVER w AS prev_ms
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, event_id, ts_ms,
        |         (sum(CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
        |                  THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
        |  FROM g
        |)
        |SELECT user_id, session_id, min(ts_ms) AS session_start_ms,
        |       max(ts_ms) AS session_end_ms, count(*) AS n_events
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "s7_mor_upsert_replay" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "s47_savepoint_restore" -> SavepointOracle,
    // RO view at the compaction boundary == the same two-thirds LWW state
    // (the post-boundary delta is invisible at RO freshness by contract)
    "s67_read_optimized" -> SavepointOracle,
    // zero-copy bootstrap onboarding: external customer parquet adopted as
    // the base, then a balance-zeroing touch-up delta + a TTL delete layer
    // on top and compact — the lake state == the same CASE/anti-filter
    // applied directly to the raw file
    // partitioned shallow clone diverged: the clone == the two-thirds
    // per-(partition, key) LWW minus the users its own delta deleted
    // (same exclusion argument as s72)
    "s74_part_clone" ->
      """WITH b AS (
        |  SELECT min(epoch_ns(ts)) + 2 * ((max(epoch_ns(ts)) - min(epoch_ns(ts))) // 3) AS hi
        |  FROM events
        |)
        |SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events, b
        |WHERE epoch_ns(ts) <= b.hi AND user_id % 7 <> 0
        |QUALIFY row_number() OVER
        |  (PARTITION BY event_type, user_id
        |   ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    // incrementally-merged HLL registers == the from-scratch d15 shape
    // over all events (slot-max union law on the lake)
    "s73_incr_sketch_index" ->
      """WITH h AS (
        |  SELECT event_type,
        |         ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS hv
        |  FROM events
        |), r AS (
        |  SELECT event_type, hv // 67108864 AS slot,
        |         CASE WHEN hv % 67108864 = 0 THEN 27
        |              ELSE 27 - length(printf('%b', hv % 67108864)) END AS rho
        |  FROM h
        |), slots AS (
        |  SELECT DISTINCT event_type, gs.g AS slot
        |  FROM events, generate_series(0, 63) gs(g)
        |)
        |SELECT s.event_type, s.slot::BIGINT AS slot,
        |       coalesce(max(r.rho), 0)::BIGINT AS rho
        |FROM slots s
        |LEFT JOIN r ON r.event_type = s.event_type AND r.slot = s.slot
        |GROUP BY s.event_type, s.slot""".stripMargin,
    // shallow clone diverged: the clone == the two-thirds LWW at its
    // boundary minus the users its own delta deleted; excluding a user's
    // rows before the LWW equals deleting the key after it (all their
    // rows are excluded together)
    "s72_clone" ->
      """WITH b AS (
        |  SELECT min(epoch_ns(ts)) + 2 * ((max(epoch_ns(ts)) - min(epoch_ns(ts))) // 3) AS hi
        |  FROM events
        |)
        |SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events, b
        |WHERE epoch_ns(ts) <= b.hi AND user_id % 7 <> 0
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "s71_bootstrap" -> BootstrapOracle,
    // the same onboarding story over the partitioned Hive layout — one
    // oracle for both table forms (s71's CASE / anti-filter semantics)
    "s75_part_bootstrap" -> BootstrapOracle,
    // onboard → branch: the CLONE applies the same touch-ups off the
    // forwarded external base; its diverged state == the shared oracle
    "s76_clone_of_bootstrap" -> BootstrapOracle,
    // metadata-only count(*) at two boundaries + the fail-closed scan in
    // between (in-plan asserts prove WHICH path answered each phase)
    "s77_metadata_count" ->
      """SELECT (SELECT count(*) FROM events) AS n_boundary,
        |       (SELECT count(*) FROM events WHERE user_id % 7 <> 0) AS n_scan,
        |       (SELECT count(*) FROM events WHERE user_id % 7 <> 0) AS n_meta""".stripMargin,
    // s53 replays the same savepoint→backfill→restore story with every
    // verb driven through CALL procedures — same final state by contract
    "s53_sql_procedures" -> SavepointOracle,
    // the s47 thirds story, partitioned: per-(partition, key) LWW at the pin
    "s57_part_savepoint" -> PartPinnedOracle,
    // partitioned TIME TRAVEL to the same pin must read the same state —
    // one oracle for the destructive restore and the non-destructive travel
    "s65_part_time_travel" -> PartPinnedOracle,
    // drop-mode ingest gate: the snapshot == LWW of the PRE-filtered stream
    "s66_write_expectations" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |WHERE value >= 1.0
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    // quarantine gate: committed survivors (pre-filtered LWW, tag 'kept')
    // ∪ quarantined violators (verbatim, tagged with the failed rule) —
    // the two sides must account for every input row
    "s68_quarantine" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms,
        |       'kept' AS tag
        |FROM events
        |WHERE value >= 1.0
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |UNION ALL
        |SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms,
        |       'value_floor' AS tag
        |FROM events
        |WHERE value < 1.0""".stripMargin,
    "s48_partition_ttl" ->
      """WITH m AS (SELECT min(event_type) AS v FROM events)
        |SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events, m
        |WHERE event_type <> m.v
        |QUALIFY row_number() OVER
        |  (PARTITION BY event_type, user_id
        |   ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    // ANSI SHOW PARTITIONS == the distinct raw partition renderings
    "s69_show_partitions" ->
      """SELECT DISTINCT 'event_type=' || event_type AS "partition"
        |FROM events""".stripMargin,
    "s16_mor_datasource" -> LwwAllEventsOracle,
    "s63_stream_sink" -> LwwAllEventsOracle,
    // the tagging proof may only change the plan, never the result
    "s54_write_index_tagging" -> LwwAllEventsOracle,
    // lake → Debezium JSON wire → lake must be lossless end to end
    "s56_cdc_wire_loop" -> LwwAllEventsOracle,
    // partitioned tagging: proofs change plans, never the LWW result
    "s58_part_write_tagging" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |QUALIFY row_number() OVER
        |  (PARTITION BY event_type, user_id
        |   ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    // LWW state, then a narrow partial image touches users < 50: the
    // touched columns replace, the absent ones carry over
    "s55_partial_update" ->
      """WITH lww AS (
        |  SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER
        |    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |)
        |SELECT user_id,
        |  CASE WHEN user_id < 50 THEN 999000 + user_id ELSE event_id END AS event_id,
        |  CASE WHEN user_id < 50 THEN 'partial_touch' ELSE event_type END
        |    AS event_type,
        |  value, ts_ms
        |FROM lww""".stripMargin,
    "d10_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    // the BUILT-IN dropDuplicatesWithinWatermark operator settling to the
    // same DISTINCT (the engine-native twin of d10's custom state engine)
    "r57_stream_dedup_native" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "s17_mor_part_incremental" ->
      """WITH b AS (
        |  SELECT min(epoch_ns(ts)) + (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2 AS mid
        |  FROM events
        |)
        |SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events, b WHERE epoch_ns(ts) > b.mid
        |QUALIFY row_number() OVER
        |  (PARTITION BY event_type, user_id
        |   ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "s13_mor_partitioned" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |QUALIFY row_number() OVER
        |  (PARTITION BY event_type, user_id
        |   ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "s34_schema_evolution" ->
      """WITH b AS (
        |  SELECT min(epoch_ns(ts)) + (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2 AS mid
        |  FROM events
        |)
        |SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms,
        |       CASE WHEN epoch_ns(ts) > b.mid
        |            THEN 'v2-' || event_type ELSE NULL END AS tag
        |FROM events, b
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    // same replay as s13, read back through the parent-level manifest (an
    // external engine's view) — identical final state by construction
    "s31_part_manifest_read" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |QUALIFY row_number() OVER
        |  (PARTITION BY event_type, user_id
        |   ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "s8_cdc_ticket_view" ->
      """SELECT c.c_name AS full_name,
        |       CAST(l.l_orderkey AS VARCHAR) AS id,
        |       l.l_extendedprice AS price,
        |       epoch_ms(l.l_shipdate) AS ts_ms
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |QUALIFY row_number() OVER
        |  (PARTITION BY c.c_name
        |   ORDER BY l.l_orderkey DESC, l.l_linenumber DESC,
        |            l.l_extendedprice DESC, l.l_shipdate DESC) = 1""".stripMargin,
    "r2_changelog_materialize" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |QUALIFY row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    "r13_json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_val
        |FROM events""".stripMargin,
    "r14_tumble_agg" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
        |       event_type, count(*) AS cnt,
        |       round(sum(value), 3) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
  )
}
