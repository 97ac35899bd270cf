#!/usr/bin/env python
"""Dump `.explain("formatted")` for a list of registered queries into
plans/<tag>/<name>_<suffix>.txt — the before/after plan evidence for an
optimization round.

Besides whole queries, a few SUBSTRATE frames are dumped too: the heavy
shared builds (co-purchase edges, distinct-shingle incidence) end in an
eager localCheckpoint, so the final query plan only shows a LogicalRDD
leaf — the interesting exchanges live in the pre-checkpoint build plan,
which this tool captures by calling the builders directly.

Usage: python tools/dump_round_plans.py TAG SUFFIX [NAME...]
  TAG     plans/ subdirectory (e.g. r12)
  SUFFIX  appended to each file (e.g. before / after)
  NAME    registered query names; defaults to the round-12 target list.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

SF_DIR = os.environ.get("WCS_PLAN_SF_DIR", "/root/testdata/sf0.01")

DEFAULT_TARGETS = [
    "graph_connected_components",
    "graph_jaccard_neighbors",
    "graph_ego_density_topk",
    "graph_louvain_first_sweep",
    "graph_label_propagation",
    "graph_wedge_closure_by_degree",
    "graph_ktruss_edges",
    "graph_landmark_distance_profile",
    "graph_triangle_participation",
    "graph_hits_hubs_authorities",
    "graph_eigenvector_centrality",
    "dedup_lsh_band_sensitivity",
    "dedup_minhash_estimate_error",
    "dedup_bbit_minhash_error",
    "dedup_minhash_lsh",
    "pipeline_soft_dedup_weights",
    "pipeline_soft_dedup_ess_by_source",
    "ts_theil_sen_slope",
    "sim_embedding_near_dup",
    "sim_product_quantization_audit",
]


def _explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def substrate_frames(spark, sf_dir):
    """(name, DataFrame) pairs for the shared pre-checkpoint builds."""
    from pyspark.sql import functions as F

    from wal_consumer_spark.operators.dedup import shingle_pairs_jaccard
    from wal_consumer_spark.plans.analytics import pair_counts_from_incidence
    from wal_consumer_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    op_raw = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    docs = load_table(spark, sf_dir, "documents")
    return [
        # the support-2 co-purchase build as the graph substrate runs it
        # (pre-checkpoint): every graph query pays this plan once
        (
            "substrate_support2_edges",
            pair_counts_from_incidence(op_raw)
            .where(F.col("n_o") >= 2)
            .select("p1", "p2"),
        ),
        # the df-capped exact-Jaccard truth build the dedup audits pay
        (
            "substrate_shingle_pairs_jaccard",
            shingle_pairs_jaccard(docs, "doc_id", "text"),
        ),
    ]


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT_TARGETS
    out_dir = os.path.join(_ROOT, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from wal_consumer_spark.plans import all_specs
    from wal_consumer_spark.session import get_spark

    spark = get_spark(app_name=f"wcs-plan-dump-{tag}-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    frames = [(n, specs[n].spark(spark, SF_DIR)) for n in names]
    frames += substrate_frames(spark, SF_DIR)
    for name, df in frames:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(_explain_str(df))
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
