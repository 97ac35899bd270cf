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
#: queries; rounds 3–5 another 50 each; round 6 another 49 (+1 re-pin) —
#: cumulative 288/372 distinct entering round 7. Every rotated-out name
#: keeps its green row in a committed CORRECTNESS_r*.json — enforced by
#: tests/test_registry.py::test_rotated_out_names_have_committed_green_rows
#: — and stays oracle-checked in tests/test_parity.py. Any spec without an
#: oracle sorts last so it can never burn a window slot on a rows-only
#: check.
#:
#: Round 7 swaps ALL 50 slots a fifth time, per round-6 VERDICT "Next
#: round" #2: the 41 pre-round-6 names that have never held a driver row,
#: plus the 9 round-6 additions staged for this window. Everything that
#: remains after this window goes into NEXT_WINDOW below (the round-8
#: closing set); tests/test_registry.py::test_staging_partitions_registry
#: enforces that cumulative-green ∪ DRIVER_WINDOW ∪ NEXT_WINDOW covers the
#: registry exactly, so staging arithmetic can never silently drift again
#: (VERDICT r6 "What's wrong" #3).
DRIVER_WINDOW: list[str] = [
    # --- aggregate tail (pre-round-6) ---
    "agg_having",
    "agg_higher_moments",
    "agg_histogram_totalprice",
    "agg_key_skew_profile",
    "agg_log2_histogram",
    "agg_percentile_approx",
    "agg_profile_orders",
    "agg_stratified_sample",
    # --- analytics tail (pre-round-6) ---
    "analytics_conversion_curve",
    "analytics_path_transitions",
    "analytics_user_activity_entropy",
    # --- CDC tail (pre-round-6) ---
    "cdc_backlog_metrics",
    "cdc_gdpr_erasure_audit",
    "cdc_op_mix",
    "cdc_tombstone_retention",
    # --- dedup tail (pre-round-6) ---
    "dedup_containment_pairs",
    # --- ML tail (pre-round-6) ---
    "ml_classification_metrics",
    # --- multimodal tail (pre-round-6) ---
    "multimodal_feature_extract",
    "multimodal_resize_meta",
    # --- curation-pipeline tail (pre-round-6) ---
    "pipeline_boilerplate_strip",
    "pipeline_bpe_first_merges",
    "pipeline_char_budget_truncation",
    "pipeline_epoch_plan",
    "pipeline_mixture_temperature",
    "pipeline_quality_filter",
    "pipeline_sample_k_per_group",
    "pipeline_url_canonical_dedup",
    # --- scalar tail (pre-round-6) ---
    "scalar_bitwise",
    "scalar_struct_funcs",
    # --- similarity tail (pre-round-6) ---
    "sim_centroid_distances",
    "sim_label_centroids",
    "sim_label_silhouette",
    # --- text tail (pre-round-6) ---
    "text_bigram_df",
    "text_char_trigram_profile",
    "text_sentiment_lexicon",
    # --- time-series tail (pre-round-6) ---
    "ts_anova_weekday_effect",
    "ts_calendar_heatmap",
    "ts_gapfill_zero",
    "ts_missing_data_profile",
    "ts_seasonal_naive_error",
    # --- UDF surface demo (pre-round-6) ---
    "udf_row_scalar_dim",
    # --- round-6 additions staged for this window ---
    "graph_hits_hubs_authorities",
    "sim_int8_quantized_recall",
    "ml_roc_curve_points",
    "pipeline_dsir_importance_weights",
    "ts_ljung_box_whiteness",
    "ts_seasonal_strength",
    "analytics_sequence_top3_paths",
    "analytics_holm_bonferroni",
    "set_bag_except_intersect_all",
]

#: ROUND-8 CLOSING WINDOW — every registered name that will still lack a
#: driver-green row once CORRECTNESS_r07 certifies DRIVER_WINDOW above:
#: the 26 round-6-staged names, the 8 late round-6 additions the r6
#: VERDICT flagged as unstaged ("What's wrong" #3), plus round-7 session
#: additions appended as they land. Kept as a REAL constant (not a
#: comment) so test_staging_partitions_registry can enforce that
#: cumulative-green ∪ DRIVER_WINDOW ∪ NEXT_WINDOW == all_specs() exactly.
NEXT_WINDOW: list[str] = [
    "agg_heavy_hitters_misra_gries",
    "analytics_cramers_v",
    "analytics_diff_in_differences",
    "analytics_gini_by_nation",
    "analytics_markov_stationary",
    "analytics_order_gap_distribution",
    "analytics_theil_decomposition",
    "analytics_uplift_by_decile",
    "dedup_threshold_sensitivity",
    "dq_referential_integrity_audit",
    "dq_uniqueness_profile",
    "graph_bfs_distance_histogram",
    "graph_community_modularity",
    "graph_degree_powerlaw_fit",
    "graph_edge_support_histogram",
    "ml_brier_decomposition",
    "ml_cohens_kappa",
    "ml_expected_calibration_error",
    "ml_kendall_tau_b",
    "ml_kmeans_inertia_elbow",
    "ml_logistic_irls",
    "ml_mrr_at_k",
    "ml_multiclass_confusion_centroid",
    "ml_mutual_information",
    "ml_ndcg_at_k",
    "ml_pr_curve_average_precision",
    "ml_spearman_rank_corr",
    "pipeline_dedup_impact_report",
    "text_burstiness_dispersion",
    "text_shingle_concentration",
    "text_source_shingle_jaccard",
    "ts_hurst_rescaled_range",
    "ts_rolling_beta",
    "ts_spectral_dft_topk",
    # --- round-7 session additions (this window closes coverage at
    # --- len(all_specs()) when certified in round 8) ---
    "ml_macro_f1_multiclass",
    "ml_threshold_sweep_confusion",
    "ml_ols_durbin_watson",
    "ml_ndcg_macro_summary",
    "graph_ktruss_edges",
    "analytics_interpurchase_halflife",
    "analytics_price_elasticity",
    "ts_ewm_mean_variance",
    "ts_wow_poisson_z",
    "text_hapax_ratio_by_source",
    "dq_string_profile_audit",
    "dq_format_conformance_audit",
    "cdc_entity_update_cadence",
    "sim_lsh_bucket_balance",
    "sim_knn_label_purity",
    "pipeline_contamination_report",
]

#: ROUND-9 WINDOW — second-wave round-7 session additions that overflow
#: NEXT_WINDOW's 50 slots. Same contract as NEXT_WINDOW: a real constant,
#: every name oracle-backed, enforced by
#: tests/test_registry.py::test_staging_partitions_registry so
#: cumulative-green ∪ DRIVER_WINDOW ∪ NEXT_WINDOW ∪ FUTURE_WINDOW covers
#: the registry exactly.
FUTURE_WINDOW: list[str] = [
    "graph_global_transitivity",
    "analytics_revenue_retention_nrr",
    "analytics_rfm_migration_matrix",
    "ts_peak_detection_prominence",
    "ml_conformal_interval_coverage",
    "pipeline_dedup_cluster_sizes",
    "sim_exact_duplicate_vectors",
    "ts_downsample_lttb",
    "graph_rich_club_coefficient",
    "ml_pinball_loss_quantile_eval",
    "analytics_revenue_hhi",
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
