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
#: ROUND-4 ROTATION CANDIDATES (registered in round 3 AFTER this window
#: was frozen, so none have a driver-green row yet — swap them in next
#: round): ml_decision_stump, ml_linear_regression_multi, ml_auc_rank_sum,
#: ts_cross_correlation, ts_seasonal_decompose, ts_max_silence_gap,
#: ts_record_highs, ts_winsorize_robust_mean, ts_max_drawdown,
#: dq_freshness_lag, dq_reconcile_totals, cdc_ops_per_entity_histogram,
#: text_bigram_logprob, text_keyword_rake, text_zipf_fit,
#: text_source_divergence, text_langid_confusion, pipeline_dataset_card,
#: pipeline_oversample_minority, pipeline_shard_skew_report,
#: pipeline_boilerplate_strip, pipeline_epoch_plan,
#: graph_copurchase_degree, graph_jaccard_neighbors,
#: graph_degree_assortativity, agg_boolean_conditional,
#: agg_median_of_means, udf_map_in_arrow, scalar_encoding_funcs,
#: scalar_calendar_funcs, stream_watermark_lateness_audit,
#: asof_join_nearest_events_orders, win_trailing_7d_revenue,
#: analytics_time_to_convert, analytics_dau_wau_stickiness,
#: sim_embedding_qc_stats, sim_matryoshka_prefix_recall,
#: multimodal_frame_dedup, sql_front_grouping_sets, sql_front_set_ops,
#: text_vocab_growth_heaps, text_char_trigram_profile,
#: analytics_new_vs_returning, analytics_gini_coefficient,
#: analytics_conversion_curve, analytics_cohort_ltv,
#: ml_knn_loo_accuracy, ml_calibration_bins, agg_log2_histogram,
#: ts_calendar_heatmap, ts_acf_daily, ts_missing_data_profile,
#: ts_longest_rising_streak, ts_anova_weekday_effect, dq_psi_drift,
#: dq_scd2_interval_audit, cdc_gdpr_erasure_audit,
#: graph_clustering_coefficient, pipeline_epoch_plan,
#: win_share_of_group, ts_mtd_ytd_running — 66 uncertified total, two
#: window rotations' worth.
DRIVER_WINDOW: list[str] = [
    # joins: remaining uncertified variants
    "join_null_safe_eq",
    "join_range_keyless_binned",
    # aggregates: reshaping + robust stats
    "agg_pivot",
    "agg_unpivot",
    "agg_mode_per_group",
    "agg_weighted_avg",
    "agg_approx_quantiles_bounded",
    "agg_corr_regression",
    # window functions: long tail
    "win_islands",
    "win_lag_lead",
    "win_range_frame",
    "win_first_last_ignore_nulls",
    "win_zscore_outliers",
    # scalar expression families
    "scalar_math_funcs",
    "scalar_conditional",
    "scalar_map_funcs",
    "scalar_json_funcs",
    "scalar_cast_matrix",
    "explode_posexplode",
    # CDC temporal suite + DQ gap audit
    "cdc_state_asof",
    "cdc_net_changes",
    "cdc_scd2_history",
    "cdc_temporal_join",
    "cdc_incremental_join_view",
    "dq_sequence_gap_audit",
    # similarity / ML
    "sim_topk_ivf",
    "ml_kmeans_refine",
    # text analysis tail
    "text_fingerprint",
    "text_stopword_filter",
    "text_unigram_logprob",
    "text_repetition",
    "text_pii_scrub",
    "text_contamination_score",
    # multimodal
    "multimodal_frame_sample",
    # stream-batch analogs
    "stream_window_sliding",
    "stream_session_window",
    # curation pipeline tail
    "pipeline_length_bucketing",
    "pipeline_sequence_packing",
    "pipeline_passage_dedup",
    "pipeline_global_shuffle",
    "pipeline_domain_mixture",
    # SQL front door
    "sql_front_window_rank",
    "sql_front_exists_subquery",
    # time-series
    "ts_resample_interp",
    "ts_hierarchical_rollup",
    "ts_ewma_decay",
    # UDF surface
    "udf_grouped_map_zscore",
    "udf_table_function_sentences",
    "udf_cogrouped_map",
    # product analytics
    "analytics_funnel_conversion",
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
