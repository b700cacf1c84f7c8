package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gold.{Analytics, Extended, Scalars, Tpch, Tpch2, Windowing}
import graft.silver.Ingest
import graft.functions.Text
import graft.operators.{Curation, Dedup, Similarity, Skew}
import graft.plans.AsOf
import graft.multimodal.Multimodal

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 that the reference exercises has a
  * `queries` entry; entries whose semantics are ANSI-SQL-expressible also
  * carry a DuckDB oracle in `oracleSql` (hash-compared by the driver).
  * Hash-based ops (MinHash/SimHash/sign-LSH, sketches) are made
  * oracle-checkable too: their hashes derive from md5 (identical in both
  * engines) so the whole pipeline is mirrored in SQL, and sketch outputs
  * are reported as error-bound verdicts the oracle pins to TRUE.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.monthlyBalance(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // gold parity (SURVEY §2.4-2.6: J1-J5, A1-A12, W1-W2, P4-P6)
    "monthly_balance"     -> ((s, d) => Analytics.monthlyBalance(s, d)),
    "customer_summary"    -> ((s, d) => Analytics.customerSummary(s, d)),
    "daily_metrics"       -> ((s, d) => Analytics.dailyMetrics(s, d)),
    "events_json_stats"   -> ((s, d) => Analytics.eventsJsonStats(s, d)),
    "product_ranking"     -> ((s, d) => Analytics.productRanking(s, d)),
    // scan→agg / join→rank headliners
    "q1_pricing_summary"  -> ((s, d) => Tpch.q1PricingSummary(s, d)),
    "q3_shipping_priority" -> ((s, d) => Tpch.q3ShippingPriority(s, d)),
    "q5_local_supplier"   -> ((s, d) => Tpch.q5LocalSupplierVolume(s, d)),
    "q6_forecast_revenue" -> ((s, d) => Tpch.q6ForecastRevenue(s, d)),
    "q18_large_orders"    -> ((s, d) => Tpch.q18LargeOrders(s, d)),
    "semi_anti_customers" -> ((s, d) => Tpch.semiAntiCustomers(s, d)),
    "q4_late_orders"      -> ((s, d) => Tpch.q4LateOrders(s, d)),
    "q14_economy_share"   -> ((s, d) => Tpch.q14EconomyShare(s, d)),
    "q7_nation_volume"    -> ((s, d) => Tpch.q7NationVolume(s, d)),
    "q10_returned_items"  -> ((s, d) => Tpch.q10ReturnedItems(s, d)),
    "q19_disjunctive"     -> ((s, d) => Tpch.q19Disjunctive(s, d)),
    "q22_wealthy_inactive" -> ((s, d) => Tpch.q22WealthyInactive(s, d)),
    "range_join_promo"    -> ((s, d) => Tpch.rangeJoinPromo(s, d)),
    "cube_volume"         -> ((s, d) => Tpch.cubeVolume(s, d)),
    "string_funcs"        -> ((s, d) => Scalars.stringFuncs(s, d)),
    "date_funcs"          -> ((s, d) => Scalars.dateFuncs(s, d)),
    // typed Dataset[T] surface (groupByKey + typed agg)
    "typed_user_spend"    -> ((s, d) => graft.model.Typed.userSpend(s, d).toDF()),
    // end-to-end corpus cleaning composition
    "corpus_clean"        -> ((s, d) => Text.corpusClean(s, d)),
    "rollup_volume"       -> ((s, d) => Tpch.rollupVolume(s, d)),
    // analytic windows / set ops / pivot / time buckets
    "window_running"      -> ((s, d) => Windowing.windowRunning(s, d)),
    "window_rank_stats"   -> ((s, d) => Windowing.windowRankStats(s, d)),
    "set_ops"             -> ((s, d) => Windowing.setOps(s, d)),
    "pivot_user_type"     -> ((s, d) => Windowing.pivotUserType(s, d)),
    "tumbling_volume"     -> ((s, d) => Windowing.tumblingVolume(s, d)),
    "window_range_frame"  -> ((s, d) => Windowing.windowRangeFrame(s, d)),
    // a REAL Structured Streaming job (AvailableNow → memory sink) whose
    // materialized result is oracle-compared against the batch recompute
    "stream_tumbling_volume" -> ((s, d) =>
      graft.streaming.MicroBatch.streamTumblingVolume(s, d)),
    // silver ops (SURVEY §2.1/2.4: P3, J6, J7, A12)
    // custom Catalyst operator (LogicalPlan + Strategy + SparkPlan)
    "asof_user_profile"   -> ((s, d) => AsOf.asofUserProfile(s, d)),
    // engine-native MERGE INTO SQL over a Versioned (snapshot) table
    "merge_into_sql"      -> ((s, d) => graft.plans.MergeInto.mergeIntoSql(s, d)),
    "silver_upsert"       -> ((s, d) => Ingest.silverUpsert(s, d)),
    "silver_insert_only"  -> ((s, d) => Ingest.silverInsertOnly(s, d)),
    "silver_dedup"        -> ((s, d) => Ingest.silverDedup(s, d)),
    "silver_incremental"  -> ((s, d) => Ingest.silverIncremental(s, d)),
    // change-history DML family: SCD Type-2 build + CDC apply
    "scd2_user_type"      -> ((s, d) => graft.silver.Changelog.scd2UserType(s, d)),
    "cdc_apply"           -> ((s, d) => graft.silver.Changelog.cdcApply(s, d)),
    // text analysis extensions
    "text_stats"          -> ((s, d) => Text.textStats(s, d)),
    "lang_id"             -> ((s, d) => Text.langId(s, d)),
    "text_fingerprint"    -> ((s, d) => Text.textFingerprint(s, d)),
    "token_count"         -> ((s, d) => Text.tokenCount(s, d)),
    "split_assign"        -> ((s, d) => Text.splitAssign(s, d)),
    "repetition_stats"    -> ((s, d) => Text.repetitionStats(s, d)),
    "tfidf_top3"          -> ((s, d) => Text.tfidfTop3(s, d)),
    // custom typed Aggregator (UDAF) surface
    "udaf_spend_stats"    -> ((s, d) => graft.functions.Udafs.udafSpendStats(s, d)),
    // dedup extensions
    "doc_dedup_exact"     -> ((s, d) => Dedup.exactDedup(s, d)),
    "doc_ngram_jaccard"   -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "doc_containment"     -> ((s, d) => Dedup.ngramContainment(s, d)),
    "doc_dedup_minhash"   -> ((s, d) => Dedup.minHashLsh(s, d)),
    "doc_dedup_simhash"   -> ((s, d) => Dedup.simHash(s, d)),
    "dedup_components"    -> ((s, d) => Dedup.dedupComponents(s, d)),
    // skew-guarded variant: flooded LSH buckets dropped before the pair
    // join; the oracle mirrors the cap so its recall effect is pinned
    "dedup_components_capped" -> ((s, d) => Dedup.dedupComponentsCapped(s, d)),
    // similarity search extensions
    "ann_topk"            -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "ann_ivf_topk"        -> ((s, d) => Similarity.ivfTopK(s, d)),
    "ann_ivf_pq_topk"     -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    "kmeans_refine"       -> ((s, d) => Similarity.kmeansRefine(s, d)),
    "emb_near_dup_lsh"    -> ((s, d) => Similarity.nearDupLsh(s, d)),
    "emb_quantize_stats"  -> ((s, d) => Similarity.quantizeStats(s, d)),
    "emb_pq_codes"        -> ((s, d) => Similarity.pqCodeStats(s, d)),
    "emb_outliers"        -> ((s, d) => Similarity.embOutliers(s, d)),
    // frequent-items: Misra-Gries candidates + exact verification
    "heavy_langs"         -> ((s, d) => graft.operators.Frequency.heavyLangs(s, d)),
    // corpus curation extensions
    "fuzzy_edit_pairs"    -> ((s, d) => Curation.fuzzyEditPairs(s, d)),
    "stratified_sample"   -> ((s, d) => Curation.stratifiedSample(s, d)),
    "quality_gate"        -> ((s, d) => Curation.qualityGate(s, d)),
    "zorder_keys"         -> ((s, d) => Curation.zorderKeys(s, d)),
    "decontaminate"       -> ((s, d) => Curation.decontaminate(s, d)),
    "pack_sequences"      -> ((s, d) => Curation.packSequences(s, d)),
    "pii_scrub"           -> ((s, d) => Text.piiScrub(s, d)),
    "lang_rebalance"      -> ((s, d) => Curation.langRebalance(s, d)),
    // bloom-filter semi-join pruning (runtime-filter pattern, explicit)
    "bloom_prune_join"    -> ((s, d) => graft.operators.Bloom.bloomPruneJoin(s, d)),
    // incremental view maintenance: combine materialized partials + delta
    "incremental_agg_refresh" -> ((s, d) => graft.pipeline.Incremental.incrementalAggRefresh(s, d)),
    // data-quality profiling passes
    "table_profile"       -> ((s, d) => graft.operators.Profile.tableProfile(s, d)),
    "approx_table_profile" -> ((s, d) => graft.operators.Profile.approxTableProfile(s, d)),
    "skew_profile"        -> ((s, d) => graft.operators.Profile.skewProfile(s, d)),
    // DataSource V2 catalog surface: planner-integrated versioned tables
    // (CTAS/append through the V2 write path, manifest-level hidden-day
    // pruning pinned by the prune_ok verdict, native SQL time travel, and
    // gold maintenance fed by the snapshot-log CDC)
    // the avro fan-out leg, oracle-gated through a write→read round trip
    "avro_roundtrip_agg"  -> ((s, d) => graft.sources.avro.AvroQueries.avroRoundtripAgg(s, d)),
    // cross-format integrity: order-independent md5 checksum, parquet vs
    // a fresh avro copy, equality verdict oracle-pinned
    "format_integrity"    -> ((s, d) => graft.sources.Formats.formatIntegrityCheck(s, d)),
    "versioned_scan_prune" -> ((s, d) => graft.sources.v2.V2Queries.versionedScanPrune(s, d)),
    "stats_prune_scan" -> ((s, d) => graft.sources.v2.V2Queries.statsPruneScan(s, d)),
    "cbo_broadcast_join" -> ((s, d) => graft.sources.v2.V2Queries.cboBroadcastJoin(s, d)),
    "cbo_histogram_join" -> ((s, d) => graft.sources.v2.V2Queries.cboHistogramJoin(s, d)),
    "sorted_merge_join" -> ((s, d) => graft.sources.v2.V2Queries.sortedMergeJoin(s, d)),
    "months_prune_scan" -> ((s, d) => graft.sources.v2.V2Queries.monthsPruneScan(s, d)),
    "identity_partition_scan" -> ((s, d) => graft.sources.v2.V2Queries.identityPartitionScan(s, d)),
    "mor_delete_scan" -> ((s, d) => graft.sources.v2.V2Queries.morDeleteScan(s, d)),
    // merge-on-read MERGE (write.merge.mode table property): tombstone +
    // append in one commit, zero pre-merge data files rewritten
    "mor_merge_scan" -> ((s, d) => graft.sources.v2.V2Queries.morMergeScan(s, d)),
    // source-key runtime pruning of a MOR MERGE's target read: the
    // executed plan must open under half the live files for a selective
    // staging batch (the 100 TB silver-upsert shape)
    "mor_merge_prune" -> ((s, d) => graft.sources.v2.V2Queries.morMergePrune(s, d)),
    // key-scoped copy-on-write MERGE: untouched identity partitions keep
    // their exact file sets through the merge commit
    "cow_merge_keyscope" -> ((s, d) => graft.sources.v2.V2Queries.cowMergeKeyscope(s, d)),
    "cow_merge_dayscope" -> ((s, d) => graft.sources.v2.V2Queries.cowMergeDayscope(s, d)),
    "cdf_cow_merge" -> ((s, d) => graft.sources.v2.V2Queries.cdfCowMerge(s, d)),
    // equality deletes (CDC-shape key retraction): delete by key with no
    // data read, sequence-scoped so later re-inserts survive
    "eq_delete_scan" -> ((s, d) => graft.sources.v2.V2Queries.eqDeleteScan(s, d)),
    "rewrite_deletes_scan" -> ((s, d) => graft.sources.v2.V2Queries.rewriteDeletesScan(s, d)),
    // metadata-only INT->BIGINT widening: narrow and wide file generations
    // read through one declared schema, vectorized promotion included
    "type_widening_scan" -> ((s, d) => graft.sources.v2.V2Queries.typeWideningScan(s, d)),
    // tier-2 widening: decimal precision growth at fixed scale and
    // int -> decimal(10,0), metadata-only across mixed file generations
    "type_widening_decimal_scan" -> ((s, d) => graft.sources.v2.V2Queries.typeWideningDecimalScan(s, d)),
    "column_defaults_scan" -> ((s, d) => graft.sources.v2.V2Queries.columnDefaultsScan(s, d)),
    "runtime_prune_join" -> ((s, d) => graft.sources.v2.V2Queries.runtimePruneJoin(s, d)),
    "spj_join" -> ((s, d) => graft.sources.v2.V2Queries.spjJoin(s, d)),
    "stream_versioned_read" -> ((s, d) => graft.sources.v2.V2Queries.streamVersionedRead(s, d)),
    "agg_pushdown_scan" -> ((s, d) => graft.sources.v2.V2Queries.aggPushdownScan(s, d)),
    "stream_table_sink" -> ((s, d) => graft.sources.v2.V2Queries.streamTableSink(s, d)),
    // change data feed (tbl.changes): row-level inserts/deletes between
    // versions, batch and as the streaming source for incremental gold
    "table_changes_scan" -> ((s, d) => graft.sources.v2.V2Queries.tableChangesScan(s, d)),
    "rollback_scan" -> ((s, d) => graft.sources.v2.V2Queries.rollbackScan(s, d)),
    "cherrypick_scan" -> ((s, d) => graft.sources.v2.V2Queries.cherrypickScan(s, d)),
    "fsck_scan" -> ((s, d) => graft.sources.v2.V2Queries.fsckScan(s, d)),
    // zero-copy shallow clone: metadata-only CALL clone, divergent
    // append + merge-on-read delete on the clone, source isolated
    "clone_scan" -> ((s, d) => graft.sources.v2.V2Queries.cloneScan(s, d)),
    // writer-side bloom filters: point lookup + footer-pinned verdict
    "bloom_point_scan" -> ((s, d) => graft.sources.v2.V2Queries.bloomPointScan(s, d)),
    "stream_cdf_gold" -> ((s, d) => graft.sources.v2.V2Queries.streamCdfGold(s, d)),
    // a merge-on-read UPDATE surfaces as update_preimage/update_postimage
    // pairs at one version (Delta CDF's four-valued contract)
    "cdf_update_images" -> ((s, d) => graft.sources.v2.V2Queries.cdfUpdateImages(s, d)),
    "stream_scd2_gold" -> ((s, d) => graft.sources.v2.V2Queries.streamScd2Gold(s, d)),
    "agg_pushdown_group_scan" -> ((s, d) => graft.sources.v2.V2Queries.aggPushdownGroupScan(s, d)),
    "agg_pushdown_day_scan" -> ((s, d) => graft.sources.v2.V2Queries.aggPushdownDayScan(s, d)),
    "agg_pushdown_prefix_scan" -> ((s, d) => graft.sources.v2.V2Queries.aggPushdownPrefixScan(s, d)),
    "catalog_view_agg" -> ((s, d) => graft.sources.v2.V2Queries.catalogViewAgg(s, d)),
    // partition spec evolution: days->months with a descriptor write; old
    // files keep their layout, scans prune under every interpretation
    "spec_evolution_scan" -> ((s, d) => graft.sources.v2.V2Queries.specEvolutionScan(s, d)),
    "files_metadata_scan" -> ((s, d) => graft.sources.v2.V2Queries.filesMetadataScan(s, d)),
    "versioned_time_travel" -> ((s, d) => graft.sources.v2.V2Queries.versionedTimeTravel(s, d)),
    // named refs (tags/branches) resolved by NAME through VERSION AS OF,
    // created via the SQL CALL surface; tag also pins against retention GC
    "tag_time_travel" -> ((s, d) => graft.sources.v2.V2Queries.tagTimeTravel(s, d)),
    "incremental_gold_from_cdc" -> ((s, d) => graft.sources.v2.V2Queries.incrementalGoldFromCdc(s, d)),
    // per-table format through the catalog: three CTAS legs (parquet/orc/
    // avro), each read back through its own V2 scan, one order-independent
    // checksum across all three, equality verdict oracle-pinned
    "catalog_format_fanout" -> ((s, d) => graft.sources.v2.V2Queries.catalogFormatFanout(s, d)),
    // metadata-only RENAME COLUMN: old files readable, new appends under
    // the new name, manifest pruning intact — oracle recomputes raw
    "renamed_column_scan" -> ((s, d) => graft.sources.v2.V2Queries.renamedColumnScan(s, d)),
    // MERGE WITH SCHEMA EVOLUTION: the evolving merge's result vs the
    // oracle's explicit join algebra under the pre-evolution names
    "merge_schema_evolution" -> ((s, d) => graft.sources.v2.V2Queries.mergeSchemaEvolution(s, d)),
    // SQL CALL optimize (z-ordered compaction): layout changes, data
    // doesn't — files_packed verdict + full recompute oracle
    "call_optimize_scan" -> ((s, d) => graft.sources.v2.V2Queries.callOptimizeScan(s, d)),
    // identity-layout chunked OPTIMIZE (the gold ano/mes shape): per-key
    // resumable commits, concurrent workers
    "call_optimize_identity_scan" -> ((s, d) => graft.sources.v2.V2Queries.callOptimizeIdentityScan(s, d)),
    // sketch path: HLL distinct + approximate quantiles; output is the
    // error-bound verdicts (oracle emits literal TRUE), so the approximate
    // path is hash-compared without cross-engine sketch bit-parity
    "approx_metrics"      -> ((s, d) => Skew.approxMetrics(s, d)),
    // multimodal plumbing (stubbed decode, real schema/expressions)
    "multimodal_features" -> ((s, d) => Multimodal.featurize(s, d)),
    "multimodal_frames"   -> ((s, d) => Multimodal.sampleFrames(s, d)),
    // second TPC-H wave: correlated-subquery rewrites, distributions
    "q2_min_cost_supplier" -> ((s, d) => Tpch2.q2MinCostSupplier(s, d)),
    "q8_market_share"     -> ((s, d) => Tpch2.q8MarketShare(s, d)),
    "q9_product_profit"   -> ((s, d) => Tpch2.q9ProductProfit(s, d)),
    "q11_important_parts" -> ((s, d) => Tpch2.q11ImportantParts(s, d)),
    "q13_cust_dist"       -> ((s, d) => Tpch2.q13CustDist(s, d)),
    "q15_top_supplier"    -> ((s, d) => Tpch2.q15TopSupplier(s, d)),
    "q16_supplier_count"  -> ((s, d) => Tpch2.q16SupplierCount(s, d)),
    "q17_small_quantity"  -> ((s, d) => Tpch2.q17SmallQuantity(s, d)),
    "q12_ship_status"     -> ((s, d) => Tpch2.q12ShipStatus(s, d)),
    "q20_dominant_supplier" -> ((s, d) => Tpch2.q20DominantSupplier(s, d)),
    "q21_sole_late_shipper" -> ((s, d) => Tpch2.q21SoleLateShipper(s, d)),
    // extended analytics: sessions, sliding windows, order stats, stats fns
    "session_volume"      -> ((s, d) => Extended.sessionVolume(s, d)),
    "sliding_volume"      -> ((s, d) => Extended.slidingVolume(s, d)),
    "exact_median"        -> ((s, d) => Extended.exactMedian(s, d)),
    "value_deciles"       -> ((s, d) => Extended.valueDeciles(s, d)),
    "mode_priority"       -> ((s, d) => Extended.modePriority(s, d)),
    "stats_corr"          -> ((s, d) => Extended.statsCorr(s, d)),
    "grouping_sets_geo"   -> ((s, d) => Extended.groupingSetsGeo(s, d)),
    "top_tokens"          -> ((s, d) => Extended.topTokens(s, d)),
    "emb_norm_stats"      -> ((s, d) => Extended.embNormStats(s, d)),
    "salted_brand_volume" -> ((s, d) => Extended.saltedBrandVolume(s, d)),
    "hourly_resample"     -> ((s, d) => Extended.hourlyResample(s, d)),
    "event_funnel"        -> ((s, d) => Extended.eventFunnel(s, d)),
    "price_histogram"     -> ((s, d) => Extended.priceHistogram(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for engine-hash-specific LSH ops
    * (rows-only check). */
  def oracleSql: Map[String, String] = Map(
    "monthly_balance"     -> Analytics.oracle.monthlyBalance,
    "customer_summary"    -> Analytics.oracle.customerSummary,
    "daily_metrics"       -> Analytics.oracle.dailyMetrics,
    "events_json_stats"   -> Analytics.oracle.eventsJsonStats,
    "product_ranking"     -> Analytics.oracle.productRanking,
    "q1_pricing_summary"  -> Tpch.oracle.q1PricingSummary,
    "q3_shipping_priority" -> Tpch.oracle.q3ShippingPriority,
    "q5_local_supplier"   -> Tpch.oracle.q5LocalSupplierVolume,
    "q6_forecast_revenue" -> Tpch.oracle.q6ForecastRevenue,
    "q18_large_orders"    -> Tpch.oracle.q18LargeOrders,
    "semi_anti_customers" -> Tpch.oracle.semiAntiCustomers,
    "q4_late_orders"      -> Tpch.oracle.q4LateOrders,
    "q14_economy_share"   -> Tpch.oracle.q14EconomyShare,
    "q7_nation_volume"    -> Tpch.oracle.q7NationVolume,
    "q10_returned_items"  -> Tpch.oracle.q10ReturnedItems,
    "q19_disjunctive"     -> Tpch.oracle.q19Disjunctive,
    "q22_wealthy_inactive" -> Tpch.oracle.q22WealthyInactive,
    "range_join_promo"    -> Tpch.oracle.rangeJoinPromo,
    "cube_volume"         -> Tpch.oracle.cubeVolume,
    "string_funcs"        -> Scalars.oracle.stringFuncs,
    "date_funcs"          -> Scalars.oracle.dateFuncs,
    "typed_user_spend"    -> ("""SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
        |  MAX(value) AS biggest
        |FROM events GROUP BY 1""".stripMargin),
    "corpus_clean"        -> Text.oracle.corpusClean,
    "rollup_volume"       -> Tpch.oracle.rollupVolume,
    "window_running"      -> Windowing.oracle.windowRunning,
    "window_rank_stats"   -> Windowing.oracle.windowRankStats,
    "set_ops"             -> Windowing.oracle.setOps,
    "pivot_user_type"     -> Windowing.oracle.pivotUserType,
    "tumbling_volume"     -> Windowing.oracle.tumblingVolume,
    "window_range_frame"  -> Windowing.oracle.windowRangeFrame,
    "stream_tumbling_volume" -> graft.streaming.MicroBatch.oracle.streamTumblingVolume,
    "asof_user_profile"   -> AsOf.asofUserProfileOracle,
    "merge_into_sql"      -> graft.plans.MergeInto.mergeIntoSqlOracle,
    "silver_upsert"       -> Ingest.oracle.silverUpsert,
    "silver_insert_only"  -> Ingest.oracle.silverInsertOnly,
    "silver_dedup"        -> Ingest.oracle.silverDedup,
    "silver_incremental"  -> Ingest.oracle.silverIncremental,
    "scd2_user_type"      -> graft.silver.Changelog.oracle.scd2UserType,
    "cdc_apply"           -> graft.silver.Changelog.oracle.cdcApply,
    "text_stats"          -> Text.oracle.textStats,
    "lang_id"             -> Text.oracle.langId,
    "text_fingerprint"    -> Text.oracle.textFingerprint,
    "token_count"         -> Text.oracle.tokenCount,
    "split_assign"        -> Text.oracle.splitAssign,
    "repetition_stats"    -> Text.oracle.repetitionStats,
    "tfidf_top3"          -> Text.oracle.tfidfTop3,
    "udaf_spend_stats"    -> graft.functions.Udafs.oracle.udafSpendStats,
    "doc_dedup_exact"     -> Dedup.oracle.exactDedup,
    "doc_ngram_jaccard"   -> Dedup.oracle.ngramJaccard,
    "doc_containment"     -> Dedup.oracle.ngramContainment,
    "doc_dedup_minhash"   -> Dedup.oracle.minHashLsh,
    "doc_dedup_simhash"   -> Dedup.oracle.simHash,
    "dedup_components"    -> Dedup.oracle.dedupComponents,
    "dedup_components_capped" -> Dedup.oracle.dedupComponentsCapped,
    "bloom_prune_join"    -> graft.operators.Bloom.oracle.bloomPruneJoin(),
    "incremental_agg_refresh" -> graft.pipeline.Incremental.oracle.incrementalAggRefresh,
    "table_profile"       -> graft.operators.Profile.oracle.tableProfile,
    "approx_table_profile" -> graft.operators.Profile.oracle.approxTableProfile,
    "skew_profile"        -> graft.operators.Profile.oracle.skewProfile,
    "avro_roundtrip_agg"  -> graft.sources.avro.AvroQueries.oracleSql,
    "format_integrity"    -> graft.sources.Formats.formatIntegrityOracle,
    "versioned_scan_prune" -> graft.sources.v2.V2Queries.oracle.versionedScanPrune,
    "stats_prune_scan" -> graft.sources.v2.V2Queries.oracle.statsPruneScan,
    "cbo_broadcast_join" -> graft.sources.v2.V2Queries.oracle.cboBroadcastJoin,
    "cbo_histogram_join" -> graft.sources.v2.V2Queries.oracle.cboHistogramJoin,
    "sorted_merge_join" -> graft.sources.v2.V2Queries.oracle.sortedMergeJoin,
    "months_prune_scan" -> graft.sources.v2.V2Queries.oracle.monthsPruneScan,
    "identity_partition_scan" -> graft.sources.v2.V2Queries.oracle.identityPartitionScan,
    "mor_delete_scan" -> graft.sources.v2.V2Queries.oracle.morDeleteScan,
    "mor_merge_scan" -> graft.sources.v2.V2Queries.oracle.morMergeScan,
    "mor_merge_prune" -> graft.sources.v2.V2Queries.oracle.morMergePrune,
    "cow_merge_keyscope" -> graft.sources.v2.V2Queries.oracle.cowMergeKeyscope,
    "cow_merge_dayscope" -> graft.sources.v2.V2Queries.oracle.cowMergeDayscope,
    "cdf_cow_merge" -> graft.sources.v2.V2Queries.oracle.cdfCowMerge,
    "eq_delete_scan" -> graft.sources.v2.V2Queries.oracle.eqDeleteScan,
    "rewrite_deletes_scan" -> graft.sources.v2.V2Queries.oracle.rewriteDeletesScan,
    "type_widening_scan" -> graft.sources.v2.V2Queries.oracle.typeWideningScan,
    "type_widening_decimal_scan" -> graft.sources.v2.V2Queries.oracle.typeWideningDecimalScan,
    "column_defaults_scan" -> graft.sources.v2.V2Queries.oracle.columnDefaultsScan,
    "runtime_prune_join" -> graft.sources.v2.V2Queries.oracle.runtimePruneJoin,
    "spj_join" -> graft.sources.v2.V2Queries.oracle.spjJoin,
    "stream_versioned_read" -> graft.sources.v2.V2Queries.oracle.streamVersionedRead,
    "agg_pushdown_scan" -> graft.sources.v2.V2Queries.oracle.aggPushdownScan,
    "stream_table_sink" -> graft.sources.v2.V2Queries.oracle.streamTableSink,
    "table_changes_scan" -> graft.sources.v2.V2Queries.oracle.tableChangesScan,
    "rollback_scan" -> graft.sources.v2.V2Queries.oracle.rollbackScan,
    "cherrypick_scan" -> graft.sources.v2.V2Queries.oracle.cherrypickScan,
    "fsck_scan" -> graft.sources.v2.V2Queries.oracle.fsckScan,
    "clone_scan" -> graft.sources.v2.V2Queries.oracle.cloneScan,
    "bloom_point_scan" -> graft.sources.v2.V2Queries.oracle.bloomPointScan,
    "stream_cdf_gold" -> graft.sources.v2.V2Queries.oracle.streamCdfGold,
    "cdf_update_images" -> graft.sources.v2.V2Queries.oracle.cdfUpdateImages,
    "stream_scd2_gold" -> graft.sources.v2.V2Queries.oracle.streamScd2Gold,
    "agg_pushdown_group_scan" -> graft.sources.v2.V2Queries.oracle.aggPushdownGroupScan,
    "agg_pushdown_day_scan" -> graft.sources.v2.V2Queries.oracle.aggPushdownDayScan,
    "agg_pushdown_prefix_scan" -> graft.sources.v2.V2Queries.oracle.aggPushdownPrefixScan,
    "catalog_view_agg" -> graft.sources.v2.V2Queries.oracle.catalogViewAgg,
    "spec_evolution_scan" -> graft.sources.v2.V2Queries.oracle.specEvolutionScan,
    "files_metadata_scan" -> graft.sources.v2.V2Queries.oracle.filesMetadataScan,
    "versioned_time_travel" -> graft.sources.v2.V2Queries.oracle.versionedTimeTravel,
    "tag_time_travel" -> graft.sources.v2.V2Queries.oracle.tagTimeTravel,
    "incremental_gold_from_cdc" -> graft.sources.v2.V2Queries.oracle.incrementalGoldFromCdc,
    "catalog_format_fanout" -> graft.sources.v2.V2Queries.oracle.catalogFormatFanout,
    "renamed_column_scan" -> graft.sources.v2.V2Queries.oracle.renamedColumnScan,
    "merge_schema_evolution" -> graft.sources.v2.V2Queries.oracle.mergeSchemaEvolution,
    "call_optimize_scan" -> graft.sources.v2.V2Queries.oracle.callOptimizeScan,
    "call_optimize_identity_scan" -> graft.sources.v2.V2Queries.oracle.callOptimizeIdentityScan,
    "approx_metrics"      -> Skew.oracle.approxMetrics,
    "ann_topk"            -> Similarity.oracle.bruteForceTopK,
    "ann_ivf_topk"        -> Similarity.oracle.ivfTopK,
    "ann_ivf_pq_topk"     -> Similarity.oracle.ivfPqTopK,
    "kmeans_refine"       -> Similarity.oracle.kmeansRefine,
    "fuzzy_edit_pairs"    -> Curation.oracle.fuzzyEditPairs,
    "stratified_sample"   -> Curation.oracle.stratifiedSample,
    "quality_gate"        -> Curation.oracle.qualityGate,
    "zorder_keys"         -> Curation.oracle.zorderKeys,
    "decontaminate"       -> Curation.oracle.decontaminate,
    "pack_sequences"      -> Curation.oracle.packSequences,
    "pii_scrub"           -> Text.oracle.piiScrub,
    "lang_rebalance"      -> Curation.oracle.langRebalance,
    "emb_near_dup_lsh"    -> Similarity.oracle.nearDupLsh,
    "emb_quantize_stats"  -> Similarity.oracle.quantizeStats,
    "emb_pq_codes"        -> Similarity.oracle.pqCodeStats,
    "emb_outliers"        -> Similarity.oracle.embOutliers,
    "heavy_langs"         -> graft.operators.Frequency.oracle.heavyLangs,
    "multimodal_features" -> Multimodal.oracle.featurize,
    "multimodal_frames"   -> Multimodal.oracle.sampleFrames,
    "q2_min_cost_supplier" -> Tpch2.oracle.q2MinCostSupplier,
    "q8_market_share"     -> Tpch2.oracle.q8MarketShare,
    "q9_product_profit"   -> Tpch2.oracle.q9ProductProfit,
    "q11_important_parts" -> Tpch2.oracle.q11ImportantParts,
    "q13_cust_dist"       -> Tpch2.oracle.q13CustDist,
    "q15_top_supplier"    -> Tpch2.oracle.q15TopSupplier,
    "q16_supplier_count"  -> Tpch2.oracle.q16SupplierCount,
    "q17_small_quantity"  -> Tpch2.oracle.q17SmallQuantity,
    "q12_ship_status"     -> Tpch2.oracle.q12ShipStatus,
    "q20_dominant_supplier" -> Tpch2.oracle.q20DominantSupplier,
    "q21_sole_late_shipper" -> Tpch2.oracle.q21SoleLateShipper,
    "session_volume"      -> Extended.oracle.sessionVolume,
    "sliding_volume"      -> Extended.oracle.slidingVolume,
    "exact_median"        -> Extended.oracle.exactMedian,
    "value_deciles"       -> Extended.oracle.valueDeciles,
    "mode_priority"       -> Extended.oracle.modePriority,
    "stats_corr"          -> Extended.oracle.statsCorr,
    "grouping_sets_geo"   -> Extended.oracle.groupingSetsGeo,
    "top_tokens"          -> Extended.oracle.topTokens,
    "emb_norm_stats"      -> Extended.oracle.embNormStats,
    "salted_brand_volume" -> Extended.oracle.saltedBrandVolume,
    "hourly_resample"     -> Extended.oracle.hourlyResample,
    "event_funnel"        -> Extended.oracle.eventFunnel,
    "price_histogram"     -> Extended.oracle.priceHistogram,
  )
}
