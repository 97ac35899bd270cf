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
#: Round 10 rotates ALL 50 slots an eighth time, per round-9 VERDICT
#: "Next round" #1/#2: CORRECTNESS_r09 certified the round-9 window
#: 50/50 green (cumulative 436/436 at rotation time — every name that
#: existed then has a committed green row), so this window holds the
#: ROUND-10 CLOSING SET: the 45 round-9 staged additions (old
#: NEXT_WINDOW, name-for-name) plus 5 fills — 1 deliberate re-pin
#: (sim_knn_label_purity: its r8 green row predates the round-9
#: kNN-substrate refactor that briefly mis-registered it, fix f1c05c8;
#: allowlisted in tests/test_registry.py::_REPIN_ALLOWLIST) and 4 new
#: round-10 operators certified same-round (ml_matthews_corrcoef,
#: ml_hosmer_lemeshow_gof, analytics_cohens_d_effect_size,
#: set_symmetric_diff_tagged). Green rows here close driver coverage
#: at 485/485.
DRIVER_WINDOW: list[str] = [
    # --- round-9 staged additions (old NEXT_WINDOW, 45) ---
    "sim_centroid_margin_audit",
    "sim_jl_projection_distortion",
    "pipeline_token_budget_curriculum",
    "stream_replay_dedup_exactly_once",
    "agg_bloom_filter_fpr_audit",
    "analytics_mann_whitney_u",
    "analytics_shapley_attribution",
    "text_kneser_ney_bigram",
    "stream_click_purchase_interval_join",
    "ts_granger_causality_daily",
    "sim_product_quantization_audit",
    "ml_decision_tree_depth2",
    "stream_left_outer_join_watermark_close",
    "graph_louvain_first_sweep",
    "analytics_markov_absorption_time",
    "text_burrows_delta_sources",
    "stream_full_outer_join_watermark_close",
    "ml_cochran_q_test",
    "ml_kruskal_wallis_h",
    "ml_friedman_test",
    "ml_target_encoding_loo",
    "ml_cv_fold_accuracy_variance",
    "agg_kmv_distinct_sketch",
    "ts_variance_ratio",
    "text_simpson_lexical_diversity",
    "sql_front_qualify",
    "analytics_propensity_stratification",
    "dedup_minhash_estimate_error",
    "cdc_op_mix_drift_by_day",
    "analytics_kendall_w_concordance",
    "graph_ego_density_topk",
    "ml_auc_delong_variance",
    "sql_front_pivot",
    "ml_multinomial_nb_lang",
    "analytics_two_proportion_ab",
    "ts_turning_points_test",
    "ml_somers_d_gamma",
    "analytics_markov_entropy_rate",
    "ml_woe_information_value",
    "analytics_mood_median_test",
    "text_script_profile",
    "sql_front_values_spine",
    "sql_front_distinct_on",
    "ml_krippendorff_alpha_binary",
    "ts_value_at_risk_cvar",
    # --- re-pin: r8 row predates the round-9 kNN refactor (f1c05c8) ---
    "sim_knn_label_purity",
    # --- round-10 session additions certified same-round (4) ---
    "ml_matthews_corrcoef",
    "ml_hosmer_lemeshow_gof",
    "analytics_cohens_d_effect_size",
    "set_symmetric_diff_tagged",
]

#: ROUND-11 STAGING — every operator registered during round 10 AFTER
#: the rotation above froze the 50-slot window lands here IN THE SAME
#: COMMIT that registers it, so the partition test enforces staging at
#: authoring time. The 436 previously-certified names plus this
#: window's 50 close at 485/485 when CORRECTNESS_r10 lands; names
#: staged here certify in round 11.
NEXT_WINDOW: list[str] = [
    # --- round-10 session additions (certify in round 11) ---
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
