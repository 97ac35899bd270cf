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
#: Round 11 rotates ALL 50 slots a ninth time, per round-10 VERDICT
#: "Next round" #1/#2: CORRECTNESS_r10 certified the round-10 window
#: 50/50 green (cumulative 485/485 at rotation time), so this window
#: holds the 20 round-10 staged additions (old NEXT_WINDOW,
#: name-for-name) plus 30 fills chosen by the MECHANIZED
#: stale-certification audit (tools/stale_audit.py, enforced by
#: tests/test_stale_certification.py): every certified name whose
#: implementing function or dependency closure changed after the
#: commit of its latest green driver row is stale — its green row
#: describes dead code. The audit flagged 61 names; the 30 fills are
#: the 23 with genuine post-certification function/helper changes
#: (graph incidence-helper refactors, maybe_broadcast adoption, the
#: round-11 ml_matthews_corrcoef ADVICE fix, ...), plus
#: asof_join_forward_events_orders (the one events-table reader whose
#: r01 row predates load_table's NTZ-timestamp normalization), plus 6
#: headline-bench names from the 38-name load_table-only group; the
#: remaining 31 load_table-only names carry a reason-scoped waiver in
#: tests/test_stale_certification.py and are queued for the round-12
#: window's free slots.
DRIVER_WINDOW: list[str] = [
    # --- round-10 staged additions (old NEXT_WINDOW, 20) ---
    "text_yule_k_by_source",
    "ml_tjur_r2_discrimination",
    "analytics_sample_ratio_mismatch",
    "ts_permutation_entropy",
    "ts_kpss_level_stat",
    "ts_dickey_fuller_lag0",
    "ml_log_loss_forecast",
    "ml_information_gain_ratio",
    "ml_ols_influence_cooks_distance",
    "ts_spectral_entropy",
    "agg_interquartile_mean",
    "graph_degree_gini",
    "analytics_event_burstiness_histogram",
    "analytics_ratio_metric_delta_var",
    "multimodal_payload_byte_entropy",
    "dq_content_checksum_by_day",
    "sql_front_rollup",
    "scalar_try_funcs",
    "pipeline_snapshot_novelty_rate",
    "ts_seasonal_mann_kendall",
    # --- stale-audit re-pins: function/dependency-closure changed after
    # --- the latest green row's commit (23) ---
    "analytics_rfm_segments",
    "dedup_clusters_cc",
    "dedup_containment_pairs",
    "dedup_lsh_eval",
    "dedup_ngram_jaccard",
    "dq_sequence_gap_audit",
    "graph_connected_components",
    "graph_copurchase_degree",
    "graph_degree_assortativity",
    "graph_jaccard_neighbors",
    "graph_kcore_peel",
    "graph_label_propagation",
    "graph_pagerank",
    "ml_feature_scaling",
    "ml_matthews_corrcoef",
    "pipeline_cluster_representative",
    "sim_doc_cosine_sparse",
    "text_bigram_logprob",
    "text_keyword_rake",
    "text_source_divergence",
    "text_tfidf_topk",
    "text_unigram_logprob",
    "win_islands",
    # --- stale-audit re-pins: r01 rows predating load_table's round-2
    # --- UTC-pin + events-NTZ normalization (7 of 38; the events reader
    # --- first, then headline-bench names; the other 31 are waived with
    # --- reason-scoping and queued for round 12) ---
    "asof_join_forward_events_orders",
    "agg_count_distinct",
    "q3_top_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q9_product_profit",
    "tpch_q18_large_volume_customer",
    "tpch_q21_waiting_supplier",
]

#: ROUND-12 STAGING — every operator registered during round 11 AFTER
#: the rotation above froze the 50-slot window lands here IN THE SAME
#: COMMIT that registers it, so the partition test enforces staging at
#: authoring time. Green rows for the window above close the
#: pre-round-11 book at 505/505; names staged here certify in round 12
#: alongside the 31 waived load_table-only re-pins.
NEXT_WINDOW: list[str] = [
    # --- round-11 session additions (certify in round 12) ---
    "agg_hdr_histogram_quantiles",
    "ml_bradley_terry_one_step",
    "analytics_james_stein_shrinkage",
    "analytics_ab_mde_curve",
    "graph_wedge_closure_by_degree",
    "pipeline_preference_pair_margin",
    "multimodal_magic_number_audit",
    "ml_calibration_slope_intercept",
    "analytics_lorenz_deciles",
    "graph_avg_neighbor_degree_curve",
    "cdc_op_transition_matrix",
    "ts_theil_inequality_decomposition",
    "ts_sma_crossover_signals",
    "ml_cost_sensitive_threshold",
    "scalar_null_three_valued_logic",
    "cdc_entity_resurrection_latency",
    "pipeline_length_quality_selection_bias",
    "ml_residual_qq_deciles",
    "win_time_weighted_average",
]
#: NB round-12 window arithmetic: these 19 staged names + the 31
#: reason-scope-waived load_table re-pins (tests/
#: test_stale_certification.py::WAIVED_LOAD_TABLE_ONLY) fill the
#: round-12 DRIVER_WINDOW to exactly 50.

#: Overflow staging for additions beyond a single round-10 window.
FUTURE_WINDOW: list[str] = []

#: Deliberate registered-name != function-name pairs (none today). The
#: import-time guard below exists because of the f1c05c8 class of bug: a
#: helper `def` inserted between `@register(...)` and the query function
#: makes the decorator capture the HELPER, silently registering the wrong
#: frame under the right name — caught in round 9 only because full parity
#: runs everything. With the guard, that mistake fails at import time.
_NAME_GUARD_ALLOWLIST: frozenset[str] = frozenset()


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        if fn.__name__ != name and name not in _NAME_GUARD_ALLOWLIST:
            raise ValueError(
                f"@register({name!r}) captured function {fn.__name__!r} — "
                "a helper def between the decorator and the query function "
                "registers the WRONG frame (the f1c05c8 bug); rename the "
                "function or add a _NAME_GUARD_ALLOWLIST entry"
            )
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
