package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, PipelineQueries, RentalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here as a
  * `(SparkSession, sfDir) => DataFrame` with (where SQL-expressible) a DuckDB
  * oracle twin producing identical column names, identical rounding, and an
  * identical total ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.flagshipTopGroupsMedian(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_flagship_top_median" -> (CoreQueries.flagshipTopGroupsMedian _),
    "q_pricing_summary"     -> (CoreQueries.pricingSummary _),
    "q_quantile_trim"       -> (CoreQueries.quantileTrim _),
    "q_value_counts"        -> (CoreQueries.valueCounts _),
    "q_histogram"           -> (CoreQueries.histogram _),
    "q_boxplot_stats"       -> (CoreQueries.boxplotStats _),
    "q_ols_fit"             -> (CoreQueries.olsFit _),
    "q_geo_left_join"       -> (CoreQueries.geoLeftJoin _),
    "q_supplier_stats"      -> (CoreQueries.supplierStats _),
    "q_topk_semi_join"      -> (CoreQueries.topKSemiJoin _),
    "q_distinct_count"      -> (CoreQueries.distinctCount _),
    "q_window_rank"         -> (CoreQueries.windowRank _),
    "q_district_breakdown"  -> (CoreQueries.districtBreakdown _),
    "q_pie_proportions"     -> (CoreQueries.pieProportions _),
    "q_parse_money_stats"   -> (CoreQueries.parseMoneyStats _),
    "q_parse_regex_group"   -> (CoreQueries.parseRegexGroup _),
    "q_hourly_window"       -> (CoreQueries.hourlyWindow _),
    "q_sessionize"          -> (CoreQueries.sessionize _),
    "q_asof_join"           -> (CoreQueries.asofJoin _),
    "q_range_join"          -> (CoreQueries.rangeJoin _),
    "q_grouped_topk"        -> (CoreQueries.groupedTopK _),
    "q_location_parse"      -> (RentalQueries.locationParse _),
    "q_clean_layer"         -> (RentalQueries.cleanLayer _),
    "q_raw_profile"         -> (RentalQueries.rawProfile _),
    "q_multivalue_explode"  -> (RentalQueries.multivalueExplode _),
    "q_city_slice"          -> (RentalQueries.citySlice _),
    "q_geojson_dim"         -> (RentalQueries.geojsonDim _),
    // LLM-data-pipeline operators
    "q_dedup_exact"         -> (PipelineQueries.dedupExact _),
    "q_minhash_lsh_pairs"   -> (PipelineQueries.minhashLshPairs _),
    "q_minhash_near_dups"   -> (PipelineQueries.minhashNearDups _),
    "q_dedup_components"    -> (PipelineQueries.dedupComponents _),
    "q_jaccard_all_pairs"   -> (PipelineQueries.jaccardAllPairs _),
    "q_simhash_stats"       -> (PipelineQueries.simhashStats _),
    "q_simhash_near_dups"   -> (PipelineQueries.simhashNearDups _),
    "q_ann_brute_force"     -> (PipelineQueries.annBruteForce _),
    "q_ann_lsh"             -> (PipelineQueries.annLsh _),
    "q_ann_ivf"             -> (PipelineQueries.annIvf _),
    "q_ann_pq"              -> (PipelineQueries.annPq _),
    "q_embedding_near_dups" -> (PipelineQueries.embeddingNearDups _),
    "q_token_stats"         -> (PipelineQueries.tokenStats _),
    "q_lang_id_counts"      -> (PipelineQueries.langIdCounts _),
    "q_quality_scores"      -> (PipelineQueries.qualityScores _),
    "q_fingerprints"        -> (PipelineQueries.fingerprints _),
    "q_multimodal_meta"     -> (PipelineQueries.multimodalMeta _),
    "q_multimodal_features" -> (PipelineQueries.multimodalFeatures _),
    "q_multimodal_frames"   -> (PipelineQueries.multimodalFrames _),
    "q_image_decode"        -> (PipelineQueries.imageDecode _),
    "q_hash_split"          -> (PipelineQueries.hashSplit _),
    "q_pii_scrub"           -> (PipelineQueries.piiScrub _),
    "q_pack_sequences"      -> (PipelineQueries.packSequences _),
    "q_decontaminate"       -> (PipelineQueries.decontaminate _),
    "q_repetition_filter"   -> (PipelineQueries.repetitionFilter _),
    "q_ngram_docfreq"       -> (PipelineQueries.ngramDocFreq _),
    "q_domain_mix"          -> (PipelineQueries.domainMix _),
    "q_cms_counts"          -> (PipelineQueries.cmsCounts _),
    "q_hll_distinct"        -> (PipelineQueries.hllDistinct _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_flagship_top_median" -> CoreQueries.flagshipTopGroupsMedianSql,
    "q_pricing_summary"     -> CoreQueries.pricingSummarySql,
    "q_quantile_trim"       -> CoreQueries.quantileTrimSql,
    "q_value_counts"        -> CoreQueries.valueCountsSql,
    "q_histogram"           -> CoreQueries.histogramSql,
    "q_boxplot_stats"       -> CoreQueries.boxplotStatsSql,
    "q_ols_fit"             -> CoreQueries.olsFitSql,
    "q_geo_left_join"       -> CoreQueries.geoLeftJoinSql,
    "q_supplier_stats"      -> CoreQueries.supplierStatsSql,
    "q_topk_semi_join"      -> CoreQueries.topKSemiJoinSql,
    "q_distinct_count"      -> CoreQueries.distinctCountSql,
    "q_window_rank"         -> CoreQueries.windowRankSql,
    "q_district_breakdown"  -> CoreQueries.districtBreakdownSql,
    "q_pie_proportions"     -> CoreQueries.pieProportionsSql,
    "q_parse_money_stats"   -> CoreQueries.parseMoneyStatsSql,
    "q_parse_regex_group"   -> CoreQueries.parseRegexGroupSql,
    "q_hourly_window"       -> CoreQueries.hourlyWindowSql,
    "q_sessionize"          -> CoreQueries.sessionizeSql,
    "q_asof_join"           -> CoreQueries.asofJoinSql,
    "q_range_join"          -> CoreQueries.rangeJoinSql,
    "q_grouped_topk"        -> CoreQueries.groupedTopKSql,
    "q_location_parse"      -> RentalQueries.locationParseSql,
    "q_clean_layer"         -> RentalQueries.cleanLayerSql,
    "q_raw_profile"         -> RentalQueries.rawProfileSql,
    "q_multivalue_explode"  -> RentalQueries.multivalueExplodeSql,
    "q_city_slice"          -> RentalQueries.citySliceSql,
    "q_geojson_dim"         -> RentalQueries.geojsonDimSql,
    "q_dedup_exact"         -> PipelineQueries.dedupExactSql,
    "q_ann_lsh"             -> PipelineQueries.annLshSql,
    "q_ann_ivf"             -> PipelineQueries.annIvfSql,
    "q_ann_pq"              -> PipelineQueries.annPqSql,
    "q_minhash_lsh_pairs"   -> PipelineQueries.minhashLshPairsSql,
    "q_minhash_near_dups"   -> PipelineQueries.minhashNearDupsSql,
    "q_dedup_components"    -> PipelineQueries.dedupComponentsSql,
    "q_jaccard_all_pairs"   -> PipelineQueries.jaccardAllPairsSql,
    "q_simhash_stats"       -> PipelineQueries.simhashStatsSql,
    "q_simhash_near_dups"   -> PipelineQueries.simhashNearDupsSql,
    "q_ann_brute_force"     -> PipelineQueries.annBruteForceSql,
    "q_embedding_near_dups" -> PipelineQueries.embeddingNearDupsSql,
    "q_token_stats"         -> PipelineQueries.tokenStatsSql,
    "q_lang_id_counts"      -> PipelineQueries.langIdCountsSql,
    "q_quality_scores"      -> PipelineQueries.qualityScoresSql,
    "q_fingerprints"        -> PipelineQueries.fingerprintsSql,
    "q_multimodal_meta"     -> PipelineQueries.multimodalMetaSql,
    "q_multimodal_features" -> PipelineQueries.multimodalFeaturesSql,
    "q_multimodal_frames"   -> PipelineQueries.multimodalFramesSql,
    "q_image_decode"        -> PipelineQueries.imageDecodeSql,
    "q_hash_split"          -> PipelineQueries.hashSplitSql,
    "q_pii_scrub"           -> PipelineQueries.piiScrubSql,
    "q_pack_sequences"      -> PipelineQueries.packSequencesSql,
    "q_decontaminate"       -> PipelineQueries.decontaminateSql,
    "q_repetition_filter"   -> PipelineQueries.repetitionFilterSql,
    "q_ngram_docfreq"       -> PipelineQueries.ngramDocFreqSql,
    "q_domain_mix"          -> PipelineQueries.domainMixSql,
    "q_cms_counts"          -> PipelineQueries.cmsCountsSql,
    "q_hll_distinct"        -> PipelineQueries.hllDistinctSql,
  )
}
