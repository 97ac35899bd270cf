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
#: Round 12 rotates ALL 50 slots a tenth time, per round-11 VERDICT
#: "Next round" #1: CORRECTNESS_r11 certified the round-11 window
#: 50/50 green (cumulative 505/505 at rotation time — every query
#: registered when the round-11 window froze has a committed green
#: row), so this window holds the 19 round-11 staged additions (old
#: NEXT_WINDOW, name-for-name) plus the 31 load_table-only names whose
#: reason-scoped stale-certification waivers (round-11
#: tests/test_stale_certification.py::WAIVED_LOAD_TABLE_ONLY) promised
#: them these slots: their r01 green rows predate load_table's round-2
#: UTC-pin + events-NTZ normalization. Certifying all 50 closes driver
#: coverage at 524/524 registered names AND empties the waiver list —
#: a permanently clean stale-audit book.
DRIVER_WINDOW: list[str] = [
    # --- round-11 staged additions (old NEXT_WINDOW, 19) ---
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
    # --- stale-audit re-pins: the 31 formerly-waived load_table-only
    # --- names (r01 rows predating the round-2 UTC/NTZ normalization;
    # --- VERDICT r11 "Next round" #1 — re-pinning these empties
    # --- WAIVED_LOAD_TABLE_ONLY) ---
    "agg_collect_sorted",
    "agg_cube",
    "agg_grouping_sets",
    "dedup_keep_first",
    "distinct_projection",
    "join_cross",
    "join_full_outer",
    "join_left_outer",
    "join_left_semi",
    "join_range_band",
    "join_right_outer",
    "join_theta_nonequi",
    "set_intersect",
    "set_union_all",
    "sort_multi_nulls",
    "tpch_q2_min_cost_part",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_cnt",
    "tpch_q19_discounted_revenue",
    # --- round-12 window repair (optimization round 1): 4 of the 31
    # --- waived re-pins (join_left_anti, set_except,
    # --- tpch_q20_part_suppliers, tpch_q22_global_sales_opportunity)
    # --- return ZERO rows at the driver's correctness SF — their r01
    # --- green rows are 0-row matches, so a re-pin would re-certify the
    # --- same vacuous result the non-degenerate gate
    # --- (tests/test_parity.py) exists to refuse. They go back to the
    # --- reason-scoped waiver list (test_stale_certification.py) and
    # --- their 4 slots promote the round-12 staged names the HEADLINE
    # --- bench already represents.
    "graph_eigenvector_centrality",
    "ts_engle_granger_cointegration",
    "dedup_bbit_minhash_error",
    "analytics_logrank_test",
]

#: ROUND-13 STAGING — every operator registered during round 12 AFTER
#: the rotation above froze the 50-slot window lands here IN THE SAME
#: COMMIT that registers it, so the partition test enforces staging at
#: authoring time. Green rows for the window above close the book at
#: 524/524 with an empty waiver list; names staged here certify in
#: round 13. NB the round-12 window has zero slack (19 staged + 31
#: re-pins = 50), so EVERY round-12 session addition stages here.
NEXT_WINDOW: list[str] = [
    # --- round-12 session additions (certify in round 13; four of the
    # --- original sixteen were promoted into DRIVER_WINDOW above when
    # --- the vacuous re-pins were swapped out) ---
    "ts_tracking_signal_bias",
    "ts_squared_return_acf",
    "ml_cochran_armitage_trend",
    "ml_chow_break_test",
    "ml_lins_ccc",
    "analytics_quantile_treatment_effect",
    "multimodal_duplicate_payload_refcount",
    "ml_deming_regression",
    "ml_mantel_haenszel_or",
    "graph_harmonic_centrality",
    "ts_page_hinkley_drift",
    "ml_aic_bic_trend_compare",
]

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
