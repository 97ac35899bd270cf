#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for representative queries.

Evidence artifact for the plan-quality claims in SCALE.md — shows pushed
filters, pruned read schemas, broadcast vs shuffle joins, and whole-stage
codegen spans exactly as Catalyst compiles them at sf0.01.

Usage: python tools/dump_plans.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wal_consumer_spark.plans import all_specs  # noqa: E402
from wal_consumer_spark.session import get_spark  # noqa: E402

SHOWCASE = [
    # scan quality: pushdown + pruning
    "q1_pricing_summary",
    # broadcast dims + one fact-fact shuffle
    "q5_region_revenue",
    # multi-join with semi/anti subqueries
    "tpch_q21_waiting_supplier",
    # window + single shuffle reuse
    "win_sessionize_gap",
    # as-of union+carry (no pair explosion)
    "asof_join_events_orders",
    # curation pipeline: one linear plan
    "pipeline_corpus_curation",
    # LSH near-dup: bucket equi-joins + narrow candidate distinct, no cross join
    "sim_embedding_near_dup",
    # broadcast semi-join decontamination: corpus never shuffles on shingles
    "pipeline_decontaminate",
    # keyless interval join: exploded bin equi-join instead of nested loop
    "join_range_keyless_binned",
    # cohort retention: user_id shuffle reused across dedupe/min/join
    "analytics_cohort_retention",
    # time-series LOCF resample: single-shuffle as-of carry to the grid
    "ts_resample_locf",
    # PageRank: per-iteration join+agg, broadcast degree table
    "graph_pagerank",
    # bloom runtime-filter pattern: broadcast set-bits gate the probe scan
    "join_bloom_prefilter",
    # market basket: bounded-vocabulary pair space, one okey exchange reused
    "analytics_market_basket",
    # ANN recall eval: LSH bucket joins + broadcast ground-truth queries
    "sim_ann_recall_eval",
    # CUSUM: two unbounded frames + argmax on one per-series sort order
    "ts_changepoint_cusum",
    # bigram LM: array-local pair building, broadcast count tables
    "text_bigram_logprob",
    # decision stump: one corpus histogram pass, windows on the bin grid
    "ml_decision_stump",
    # wedge join with hub cap + broadcast degree joins
    "graph_jaccard_neighbors",
    # support-2 gate before quadratic wedge work; one-explode corner credit
    "graph_triangle_participation",
    # map-side hash-cohort bins; global window only on the 10-row bin grid
    "ml_psi_population_stability",
    # pre-aggregate to bounded grid, broadcast lag spine
    "ts_cross_correlation",
    # lossless prefix filtering: rare-shingle equi-join candidates only
    "dedup_prefix_filter_jaccard",
    # sliding COUNT(DISTINCT) as bounded offset-explode + two-phase distinct
    "ts_rolling_distinct_users",
    # weighted sample draw as TakeOrderedAndProject (no global sort)
    "pipeline_weighted_priority_sample",
    # r6: recursive chunked islands — every Window partitioned except the
    # depth-limited recursion leaf (summary-of-summary table)
    "win_islands",
    # r6: SQ8 recall — 64-row broadcast dim profile, integer dot products
    "sim_int8_quantized_recall",
    # r6: DSIR — bounded 256-bucket count, broadcast ratio table map-side
    "pipeline_dsir_importance_weights",
    # r6: HITS — one aggregation + one edge equi-join per power round
    "graph_hits_hubs_authorities",
    # r7: all-corpus kNN — bucket equi-join, id-first collision distinct,
    # vectors re-joined after; Arrow-vectorized cosine
    "sim_knn_label_purity",
    # r7: threshold sweep — descending prefix sums on a 10-row bucket grid
    "ml_threshold_sweep_confusion",
    # r7: k-truss peel — wedge joins over checkpointed shrinking edge frames
    "graph_ktruss_edges",
    # r9: PQ audit — array-local zip_with distance kernel against a
    # broadcast codebook; ONE Generate (centroid means), no dim-granular
    # assignment join
    "sim_product_quantization_audit",
    # r9: exact Shapley — corpus reduced to a 16-mask histogram in one
    # pass; all combinatorics on the broadcast subset lattice
    "analytics_shapley_attribution",
    # r9: depth-2 tree — histogram pass per LEVEL, root threshold fed
    # back as a broadcast 1-row frame (no driver collect)
    "ml_decision_tree_depth2",
    # r10: trimmed mean via contiguous rank-range overlap on the
    # (group, value) domain table — no per-row rank anywhere
    "agg_interquartile_mean",
    # r10: KPSS — n-scaled integer partial sums over the bounded day
    # grid; one window, one 1-row fold, one double division
    "ts_kpss_level_stat",
    # r10: byte-entropy QC — fixed 64-position explode (constant fanout),
    # bounded (kind, byte) aggregate; no Python in the path
    "multimodal_payload_byte_entropy",
    # r11: HDR-histogram quantile sketch — integer log-linear bucketing,
    # bucket-domain windows (~700 rows at any scale), broadcast 3-row
    # quantile spine, bounded two-phase exact side
    "agg_hdr_histogram_quantiles",
    # r11: Bradley-Terry — rank window on the SAME (user, day) partition
    # as the aggregate; all pair/type frames bounded by the type domain
    "ml_bradley_terry_one_step",
    # r11: preference pairs — (source, score-band) windows, no per-source
    # global sort; adjacent pairing keeps pair volume linear
    "pipeline_preference_pair_margin",
    # r12: eigenvector centrality — checkpointed score vectors make the
    # result plan 3 joins over LogicalRDD leaves + one broadcast max
    # (pre-checkpoint shape was 8 joins / 10 aggregates)
    "graph_eigenvector_centrality",
    # r12: Engle-Granger — residual-free: two 1-row moment folds
    # cross-joined (broadcast), all arithmetic in the final project
    "ts_engle_granger_cointegration",
    # r12: QTE — per-segment value-domain rank substrate + broadcast
    # 9-row decile spine; no per-customer global window
    "analytics_quantile_treatment_effect",
]

HEADER = """# PLANS — physical-plan evidence (generated by tools/dump_plans.py)

`explain("formatted")` output at sf0.01 on the engine session (AQE on).
Read together with SCALE.md: look for `PushedFilters`/`ReadSchema` on scans,
`BroadcastHashJoin` on dimension joins, `Exchange` count per query, and
`WholeStageCodegen` spans covering the expression work.
"""


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="plan-dump")
    specs = all_specs()
    out = [HEADER]
    for name in SHOWCASE:
        df = specs[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"\n## {name}\n\n```\n{plan.rstrip()}\n```\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
