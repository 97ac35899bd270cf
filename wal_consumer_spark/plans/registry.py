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
#: Round 8 rotates ALL 50 slots a sixth time, per round-7 VERDICT "Next
#: round" #1–2: CORRECTNESS_r07 certified the round-7 window 50/50 green
#: (cumulative 338/399), so this window holds the round-7 NEXT_WINDOW
#: verbatim — the 34 round-6-session names plus 16 first-wave round-7
#: additions. NEXT_WINDOW below (the round-9 closing set) holds the
#: second-wave round-7 overflow; FUTURE_WINDOW stages round-8 session
#: additions in the same commit that registers them (VERDICT r7 stretch
#: #6). tests/test_registry.py::test_staging_partitions_registry enforces
#: the exact-cover arithmetic.
DRIVER_WINDOW: list[str] = [
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
    # --- round-7 first-wave additions staged for this window ---
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

#: ROUND-9 CLOSING WINDOW — the second-wave round-7 additions that
#: overflowed round 8's 50 slots. Certifying these (plus FUTURE_WINDOW's
#: round-8 session additions, which roll into the round-9 window at the
#: next rotation) closes driver coverage at len(all_specs()). Kept as a
#: REAL constant (not a comment) so test_staging_partitions_registry can
#: enforce that cumulative-green ∪ DRIVER_WINDOW ∪ NEXT_WINDOW ∪
#: FUTURE_WINDOW == all_specs() exactly.
NEXT_WINDOW: list[str] = [
    # --- round-9 session additions (staged same-commit as registration;
    # most roll into the round-9 DRIVER_WINDOW fills at rotation) ---
    "ts_runs_test_wald_wolfowitz",
    "analytics_nelson_aalen_hazard",
    "ml_wilcoxon_signed_rank",
    "sql_front_correlated_scalar_subquery",
    "cdc_compaction_savings_by_horizon",
    "sim_knn_hubness_histogram",
    "sim_dimension_variance_scree",
    "dedup_lsh_band_sensitivity",
    "text_edit_distance_near_pairs",
    "stream_idle_timeout_sessions",
    "ml_permutation_importance_stump",
    "pipeline_soft_dedup_ess_by_source",
    "graph_landmark_distance_profile",
    "ts_sax_motifs",
    "ml_youden_j_operating_point",
    # --- second-wave round-7 additions (round-9 closing set) ---
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

#: ROUND-8 SESSION ADDITIONS — every operator registered during round 8
#: lands here IN THE SAME COMMIT that registers it (VERDICT r7 stretch
#: #6), so the partition test enforces staging at authoring time. These
#: roll into the round-9 DRIVER_WINDOW together with NEXT_WINDOW above.
#:
#: ROUND-9 ROTATION NOTE: NEXT_WINDOW + FUTURE_WINDOW currently total
#: fewer than 50 names. The round-9 DRIVER_WINDOW must still hold exactly
#: 50 slots (test_driver_window_names_registered), so fill the remainder
#: with (a) round-9 session additions and/or (b) deliberate re-pins of
#: already-certified names added to tests/test_registry.py::
#: _REPIN_ALLOWLIST (prefer re-pinning queries whose implementation
#: changed since certification — e.g. any ADVICE-driven formula fix).
#: Known re-pin candidates entering round 9: tpch_q17 and
#: join_bloom_prefilter (broadcast size-gates added in round 7, AFTER
#: their certification rounds — their driver rows predate the fix).
FUTURE_WINDOW: list[str] = [
    "stream_stateful_sessionize",
    "text_vocab_topk_coverage",
    "pipeline_padding_waste_curve",
    "sim_embedding_norm_audit",
    "ml_psi_population_stability",
    "ts_changepoint_argmax_split",
    "graph_triangle_participation",
    "pipeline_cross_source_dup_matrix",
    "ml_mcnemar_dim_ablation",
    "stream_high_water_alerts",
    "pipeline_tokenizer_fertility_by_lang",
    "win_regime_run_lengths",
    "graph_kcore_bounded_peel",
    "cdc_arrival_inversion_audit",
    "sql_front_named_window",
    "ml_ks_separation",
    "dedup_shingle_df_profile",
    "pipeline_soft_dedup_weights",
    "ts_ohlc_weekly",
    "sim_davies_bouldin_index",
    "sim_isotropy_audit",
    "ml_fleiss_kappa_panel",
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
