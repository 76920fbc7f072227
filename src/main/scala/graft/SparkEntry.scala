package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5Multijoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 relational analytics core
    "q1_agg"          -> (Relational.q1Agg _),
    "q3_join"         -> (Relational.q3Join _),
    "q5_multijoin"    -> (Relational.q5Multijoin _),
    "q_topk_per_group"-> (Relational.qTopkPerGroup _),
    "q_rollup"        -> (Relational.qRollup _),
    "q_pivot"         -> (Relational.qPivot _),
    "q_json_extract"  -> (Relational.qJsonExtract _),
    "q_tumbling_agg"  -> (Relational.qTumblingAgg _),
    "q_semi_anti"     -> (Relational.qSemiAnti _),
    "q_distinct"      -> (Relational.qDistinct _),
    "q_percentiles"   -> (Relational.qPercentiles _),
    "q_approx_sketch" -> (Relational.qApproxSketch _),
    "q_sketch_rollup" -> (Relational.qSketchRollup _),
    "q_top_words"     -> (Relational.qTopWords _),
    "q_upsert"        -> (Upsert.qUpsert _),
    "q_range_join"    -> (RangeJoin.qRangeJoin _),
    "q_funnel"        -> (Relational.qFunnel _),
    "q_corr"          -> (Relational.qCorr _),
    "q_salted_agg"    -> (Relational.qSaltedAgg _),
    "q_cube"          -> (Relational.qCube _),
    "q_window_dedup"  -> (Relational.qWindowDedup _),
    // §2.1 time-series core (reference semantics)
    "ts_traj_scale"        -> (TimeSeriesQueries.tsTrajScale _),
    "ts_rul_label"         -> (TimeSeriesQueries.tsRulLabel _),
    "ts_zscore_norm"       -> (TimeSeriesQueries.tsZscoreNorm _),
    "ts_sliding_window"    -> (TimeSeriesQueries.tsSlidingWindow _),
    "ts_lag_features"      -> (TimeSeriesQueries.tsLagFeatures _),
    "ts_rolling_agg"       -> (TimeSeriesQueries.tsRollingAgg _),
    "ts_resample"          -> (TimeSeriesQueries.tsResample _),
    "ts_ffill"             -> (TimeSeriesQueries.tsFfill _),
    "ts_nonoverlap_window" -> (TimeSeriesQueries.tsNonoverlapWindow _),
    "ts_split"             -> (TimeSeriesQueries.tsSplit _),
    "ts_remove_zero"       -> (TimeSeriesQueries.tsRemoveZero _),
    "ts_mse_eval"          -> (TimeSeriesQueries.tsMseEval _),
    "ts_linreg_rul"        -> (TimeSeriesQueries.tsLinregRul _),
    "ts_asof_join"         -> (TimeSeriesQueries.tsAsofJoin _),
    "ts_sessionize"        -> (TimeSeriesQueries.tsSessionize _),
    "ts_ewma"              -> (TimeSeriesQueries.tsEwma _),
    "ts_cusum"             -> (TimeSeriesQueries.tsCusum _),
    "ts_interpolate"       -> (TimeSeriesQueries.tsInterpolate _),
    "ts_outliers"          -> (TimeSeriesQueries.tsOutliers _),
    "ts_diff"              -> (TimeSeriesQueries.tsDiff _),
    "ts_sample"            -> (TimeSeriesQueries.tsSample _),
    "ts_seasonal"          -> (TimeSeriesQueries.tsSeasonal _),
    "ts_autocorr"          -> (TimeSeriesQueries.tsAutocorr _),
    "ts_mad_outliers"      -> (TimeSeriesQueries.tsMadOutliers _),
    "ts_holt"              -> (TimeSeriesQueries.tsHolt _),
    "ts_calendar_features" -> (TimeSeriesQueries.tsCalendarFeatures _),
    // §2.1 tensor/generative forms — driver sees scalar digests of the
    // array columns (tensorize/pad_truncate are oracle-checked; the
    // hash-based generators are rows-only + spec)
    "ts_window_tensorize"   -> (Tensorize.tsWindowTensorize _),
    "ts_pad_truncate"       -> (Tensorize.tsPadTruncate _),
    "ts_adding_problem"     -> ((s, d) => Synthetic.tsAddingProblem(s, d)),
    "ts_autoregressive_gen" -> (AutoReg.tsAutoregressiveGen _),
    // §2.3 dedup + similarity
    "dedup_exact"            -> (Dedup.dedupExact _),
    "dedup_exact_keep_first" -> (Dedup.dedupExactKeepFirst _),
    "dedup_minhash"          -> (Dedup.dedupMinhash _),
    "dedup_simhash"          -> (Dedup.dedupSimhash _),
    "dedup_ngram"            -> (Dedup.dedupNgram _),
    "dedup_embed"            -> (Dedup.dedupEmbed _),
    "dedup_clusters"         -> (Dedup.dedupClustersQuery _),
    "ann_topk"               -> (Similarity.annTopkQuery _),
    "ann_lsh"                -> (Similarity.annLshQuery _),
    "ann_ivf"                -> (Similarity.annIvfQuery _),
    // §2.4 text analysis
    "text_tokens"      -> (TextOps.textTokens _),
    "text_quality"     -> (TextOps.textQuality _),
    "text_langid"      -> (TextOps.textLangid _),
    "text_fingerprint" -> (TextOps.textFingerprint _),
    "text_clean"       -> (TextOps.textCleanQuery _),
    "text_entropy"     -> (TextOps.textEntropy _),
    // §2.5 multimodal plumbing + clustering (streaming lives in specs)
    "mm_binary_features" -> (Multimodal.mmBinaryFeatures _),
    "mm_frame_sample"    -> (Multimodal.mmFrameSample _),
    "ts_kmeans_embed"    -> (graft.ml.KMeans.tsKmeansEmbed _),
    "ts_rul_pipeline"    -> (graft.ml.LinearModel.rulPipeline _),
  )

  /** DuckDB-runnable oracle SQL per query key (same parquet tables).
    * Column aliases MUST match the Spark output exactly (driver sorts columns
    * by name before hashing).
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"           -> Relational.q1AggSql,
    "q3_join"          -> Relational.q3JoinSql,
    "q5_multijoin"     -> Relational.q5MultijoinSql,
    "q_topk_per_group" -> Relational.qTopkPerGroupSql,
    "q_rollup"         -> Relational.qRollupSql,
    "q_pivot"          -> Relational.qPivotSql,
    "q_json_extract"   -> Relational.qJsonExtractSql,
    "q_tumbling_agg"   -> Relational.qTumblingAggSql,
    "ts_traj_scale"        -> TimeSeriesQueries.tsTrajScaleSql,
    "ts_rul_label"         -> TimeSeriesQueries.tsRulLabelSql,
    "ts_zscore_norm"       -> TimeSeriesQueries.tsZscoreNormSql,
    "ts_sliding_window"    -> TimeSeriesQueries.tsSlidingWindowSql,
    "ts_lag_features"      -> TimeSeriesQueries.tsLagFeaturesSql,
    "ts_rolling_agg"       -> TimeSeriesQueries.tsRollingAggSql,
    "ts_resample"          -> TimeSeriesQueries.tsResampleSql,
    "ts_ffill"             -> TimeSeriesQueries.tsFfillSql,
    "ts_nonoverlap_window" -> TimeSeriesQueries.tsNonoverlapWindowSql,
    "ts_split"             -> TimeSeriesQueries.tsSplitSql,
    "ts_remove_zero"       -> TimeSeriesQueries.tsRemoveZeroSql,
    "ts_mse_eval"          -> TimeSeriesQueries.tsMseEvalSql,
    "ts_linreg_rul"        -> TimeSeriesQueries.tsLinregRulSql,
    "ts_asof_join"         -> TimeSeriesQueries.tsAsofJoinSql,
    "ts_sessionize"        -> TimeSeriesQueries.tsSessionizeSql,
    "ts_ewma"              -> TimeSeriesQueries.tsEwmaSql,
    "ts_cusum"             -> TimeSeriesQueries.tsCusumSql,
    "ts_interpolate"       -> TimeSeriesQueries.tsInterpolateSql,
    "ts_outliers"          -> TimeSeriesQueries.tsOutliersSql,
    "ts_diff"              -> TimeSeriesQueries.tsDiffSql,
    "ts_sample"            -> TimeSeriesQueries.tsSampleSql,
    "ts_seasonal"          -> TimeSeriesQueries.tsSeasonalSql,
    "ts_autocorr"          -> TimeSeriesQueries.tsAutocorrSql,
    "ts_window_tensorize"  -> Tensorize.tsWindowTensorizeSql,
    "ts_pad_truncate"      -> Tensorize.tsPadTruncateSql,
    "q_semi_anti"          -> Relational.qSemiAntiSql,
    "q_distinct"           -> Relational.qDistinctSql,
    "q_percentiles"        -> Relational.qPercentilesSql,
    "q_top_words"          -> Relational.qTopWordsSql,
    "q_upsert"             -> Upsert.qUpsertSql,
    "q_range_join"         -> RangeJoin.qRangeJoinSql,
    "q_funnel"             -> Relational.qFunnelSql,
    "q_corr"               -> Relational.qCorrSql,
    "q_salted_agg"         -> Relational.qSaltedAggSql,
    "q_cube"               -> Relational.qCubeSql,
    "q_window_dedup"       -> Relational.qWindowDedupSql,
    "ts_mad_outliers"      -> TimeSeriesQueries.tsMadOutliersSql,
    "ts_holt"              -> TimeSeriesQueries.tsHoltSql,
    "ts_calendar_features" -> TimeSeriesQueries.tsCalendarFeaturesSql,
    "text_entropy"         -> TextOps.textEntropySql,
    "dedup_exact"            -> Dedup.dedupExactSql,
    "dedup_exact_keep_first" -> Dedup.dedupExactKeepFirstSql,
    "dedup_ngram"            -> Dedup.dedupNgramSql,
    "dedup_embed"            -> Dedup.dedupEmbedSql,
    "dedup_clusters"         -> Dedup.dedupClustersSql,
    "ann_topk"               -> Similarity.annTopkSql,
    "text_tokens"            -> TextOps.textTokensSql,
    "text_quality"           -> TextOps.textQualitySql,
    "text_clean"             -> TextOps.textCleanSql,
  )
}
