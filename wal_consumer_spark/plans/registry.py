"""Registry binding each named query to (Spark callable, DuckDB oracle SQL).

Determinism contract (so the driver's order-insensitive value-hash matches):

- Aggregate numeric columns are summed in DECIMAL (exact, associative — immune
  to partition/summation order), then cast to DOUBLE for the final output, so
  both engines emit bit-identical doubles.
- Every computed column is aliased identically in the Spark plan and the SQL.
- Nondeterministic "pick any row" ops (dropDuplicates subset, approx algos)
  either get a deterministic formulation (window rank / min-pick) or declare
  no oracle (driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

#: Names pinned, in order, to the head of the `all_specs()` iteration. The
#: grading driver correctness-checks only the FIRST 50 registry entries,
#: and CORRECTNESS_r{N}.json files ACCUMULATE across rounds — so the
#: window is ROTATED each round to extend cumulative driver coverage
#: (VERDICT.md round 2, "Next round" #1). Rounds 1–2 certified 89 distinct
#: queries (every TPC-H query, the join/set/sort variants, sketches,
#: dedup ×5, similarity ×4, text ×4, multimodal ×2, UDF ×2, CDC core,
#: streaming analogs, curation core, time-series LOCF, cohort/PageRank/
#: feature-scaling, fuzzy join, sparse cosine — see CORRECTNESS_r01/r02).
#: Round 3 swaps ALL 50 slots to the still-uncertified families: semi/anti
#: variants' remaining cousins (null-safe eq, keyless binned range),
#: pivot/unpivot/mode/weighted-avg/corr/bounded-quantiles, the window-
#: function long tail (islands, lag/lead, range frames, ignore-nulls,
#: z-score outliers), scalar math/cond/map/json/cast/explode, the CDC
#: temporal suite (as-of state, net-changes, SCD2, temporal join,
#: incremental join-view, gap audit), IVF top-k + k-means, the text-
#: analysis tail (fingerprint, stopword, unigram-LM, repetition, PII,
#: contamination), multimodal frame sampling, sliding/session stream
#: analogs, the curation tail (length bucketing, packing, passage dedup,
#: global shuffle, domain mixture), SQL-front window/EXISTS, time-series
#: interp/rollup/EWMA, grouped-map/table-fn/cogrouped UDFs, and funnel
#: analytics. Every rotated-out name keeps its green row in a committed
#: CORRECTNESS_r*.json — enforced by
#: tests/test_registry.py::test_rotated_out_names_have_committed_green_rows
#: — and stays oracle-checked in tests/test_parity.py. Any spec without an
#: oracle sorts last so it can never burn a window slot on a rows-only
#: check.
#:
#: Round 4 swaps ALL 50 slots again, to names with no driver-green row in
#: any committed CORRECTNESS file (cumulative certified after r3: 139
#: distinct): the graph tail (all six), the DQ tail (Benford, PSI,
#: freshness, reconcile, SCD2 audit), the ML evals (stump, multi-var OLS,
#: midrank AUC, kNN-LOO, calibration bins), scalar encoding/calendar,
#: arrow map UDF, nearest as-of, watermark lateness audit, and the
#: ts/text/analytics/pipeline/sim/sql tails (round-3 VERDICT "Next
#: round" #1).
#:
#: ROUND-5 ROTATION CANDIDATES — the exact 92 registered names that will
#: still lack a driver-green row once CORRECTNESS_r04 certifies this
#: window (VERDICT r3 #6; keep this list in sync when adding queries —
#: the round-4 session added graph_label_propagation, ts_theil_sen_slope,
#: ml_naive_bayes_binary, dedup_lsh_eval,
#: analytics_session_duration_histogram, graph_kcore_peel,
#: dq_functional_dependency, ml_pca_top_component,
#: ts_bollinger_breakouts, text_oov_rate, scalar_regexp_funcs,
#: ts_pacf_durbin_levinson, analytics_view_abandonment,
#: agg_exact_percentile_selection, asof_join_tolerance_error_click,
#: dq_outlier_iqr, graph_connected_components,
#: pipeline_kfold_assignment, win_longest_streak_per_user,
#: udf_pandas_scalar_iter, analytics_survival_km after the window froze):
#: agg_having, agg_higher_moments, agg_histogram_totalprice,
#: agg_key_skew_profile, agg_log2_histogram, agg_percentile_approx,
#: agg_profile_orders, agg_stratified_sample, analytics_ab_welch_ttest,
#: analytics_attribution_last_touch, analytics_cohort_ltv,
#: analytics_conversion_curve, analytics_market_basket,
#: analytics_pareto_share, analytics_path_transitions,
#: analytics_rfm_segments, analytics_user_activity_entropy,
#: cdc_backlog_metrics, cdc_gdpr_erasure_audit, cdc_op_mix,
#: cdc_replay_idempotency, cdc_tombstone_retention,
#: dedup_containment_pairs, join_bloom_prefilter, join_skew_salted,
#: ml_classification_metrics, multimodal_feature_extract,
#: multimodal_resize_meta, pipeline_boilerplate_strip,
#: pipeline_bpe_first_merges, pipeline_char_budget_truncation,
#: pipeline_cluster_representative, pipeline_epoch_plan,
#: pipeline_mixture_temperature, pipeline_quality_filter,
#: pipeline_sample_k_per_group, pipeline_url_canonical_dedup,
#: scalar_bitwise, scalar_struct_funcs, sim_ann_recall_eval,
#: sim_centroid_distances, sim_label_centroids, sim_label_silhouette,
#: sql_front_lateral_join, sql_front_recursive_cte, text_bigram_df,
#: text_bpe_regex_tokens, text_char_trigram_profile, text_readability,
#: text_rolling_hash, text_sentiment_lexicon, text_shingle_novelty,
#: text_token_entropy, ts_anomaly_mad, ts_anova_weekday_effect,
#: ts_calendar_heatmap, ts_changepoint_cusum, ts_gapfill_zero,
#: ts_longest_rising_streak, ts_max_silence_gap, ts_missing_data_profile,
#: ts_mtd_ytd_running, ts_period_over_period, ts_seasonal_naive_error,
#: udf_row_scalar_dim, win_cume_percent, win_cumulative_distinct,
#: win_moving_median, win_rank_dense_ntile, win_rolling_autocorr,
#: win_running_sum, graph_label_propagation, ts_theil_sen_slope,
#: ml_naive_bayes_binary, dedup_lsh_eval,
#: analytics_session_duration_histogram, graph_kcore_peel,
#: dq_functional_dependency, ml_pca_top_component,
#: ts_bollinger_breakouts, text_oov_rate, scalar_regexp_funcs,
#: ts_pacf_durbin_levinson, analytics_view_abandonment,
#: agg_exact_percentile_selection, asof_join_tolerance_error_click,
#: dq_outlier_iqr, graph_connected_components,
#: pipeline_kfold_assignment, win_longest_streak_per_user,
#: udf_pandas_scalar_iter, analytics_survival_km.
DRIVER_WINDOW: list[str] = [
    # as-of join: nearest variant
    "asof_join_nearest_events_orders",
    # aggregates: boolean rollup + robust median-of-means
    "agg_boolean_conditional",
    "agg_median_of_means",
    # window functions
    "win_trailing_7d_revenue",
    "win_share_of_group",
    # scalar expression families
    "scalar_encoding_funcs",
    "scalar_calendar_funcs",
    # UDF surface
    "udf_map_in_arrow",
    # streaming analog
    "stream_watermark_lateness_audit",
    # CDC
    "cdc_ops_per_entity_histogram",
    # data-quality tail
    "dq_freshness_lag",
    "dq_reconcile_totals",
    "dq_psi_drift",
    "dq_scd2_interval_audit",
    "dq_benford_digit_audit",
    # graph analytics (entire tail)
    "graph_triangle_count",
    "graph_two_hop_reach",
    "graph_jaccard_neighbors",
    "graph_clustering_coefficient",
    "graph_degree_assortativity",
    "graph_copurchase_degree",
    # in-plan ML evals
    "ml_decision_stump",
    "ml_linear_regression_multi",
    "ml_auc_rank_sum",
    "ml_knn_loo_accuracy",
    "ml_calibration_bins",
    # similarity / embedding QC
    "sim_embedding_qc_stats",
    "sim_matryoshka_prefix_recall",
    # multimodal
    "multimodal_frame_dedup",
    # SQL front door
    "sql_front_grouping_sets",
    "sql_front_set_ops",
    # time-series diagnostics
    "ts_cross_correlation",
    "ts_seasonal_decompose",
    "ts_record_highs",
    "ts_winsorize_robust_mean",
    "ts_max_drawdown",
    "ts_acf_daily",
    # text analysis tail
    "text_bigram_logprob",
    "text_keyword_rake",
    "text_zipf_fit",
    "text_source_divergence",
    "text_langid_confusion",
    "text_vocab_growth_heaps",
    # product analytics
    "analytics_time_to_convert",
    "analytics_dau_wau_stickiness",
    "analytics_new_vs_returning",
    "analytics_gini_coefficient",
    # curation pipeline tail
    "pipeline_dataset_card",
    "pipeline_oversample_minority",
    "pipeline_shard_skew_report",
]


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Registry in driver-certification order: DRIVER_WINDOW names first,
    then remaining oracle-backed specs in registration order, then
    oracle-less (rows-only) specs last."""
    pinned = [n for n in DRIVER_WINDOW if n in _REGISTRY]
    seen = set(pinned)
    rest = [n for n in _REGISTRY if n not in seen]
    rest_oracle = [n for n in rest if _REGISTRY[n].oracle is not None]
    rest_none = [n for n in rest if _REGISTRY[n].oracle is None]
    return {n: _REGISTRY[n] for n in (*pinned, *rest_oracle, *rest_none)}


def get_spec(name: str) -> QuerySpec:
    return _REGISTRY[name]
