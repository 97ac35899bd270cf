"""Plan-shape regression pins for the most expensive headline queries
(VERDICT r7 stretch #8). PLANS.md documents WHY each shape is right; these
tests make the shape itself a regression surface: the optimized logical
plan's node-type multiset is pinned, so a future edit that silently
reintroduces a per-round shuffle, drops a checkpoint reuse, or doubles an
aggregation fails here instead of showing up as an unexplained bench drift
two rounds later.

The fingerprint is STRUCTURAL (node types and counts only — no literals,
no statistics), so it is invariant to data scale and session config; it
changes exactly when the plan gains or loses operators.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from wal_consumer_spark.plans import all_specs

SF_SMOKE = "/root/testdata/sf0.001"


def _iter_jnodes(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _iter_jnodes(ch.apply(i))


def fingerprint(df) -> dict[str, int]:
    opt = df._jdf.queryExecution().optimizedPlan()
    return dict(Counter(n.nodeName() for n in _iter_jnodes(opt)))


#: Pinned node-type multisets for the 5 most expensive headline queries
#: (BENCH_DETAIL_r07 isolation notes). A deliberate change to one of these
#: plans should update the pin IN THE SAME COMMIT, with the bench_one
#: number that justifies it.
PINNED: dict[str, dict[str, int]] = {
    # alternating-star CC: the returned frame is the post-fixpoint
    # contraction over checkpointed leaves — one Join, one Union, three
    # Aggregates; a per-round shuffle leaking into the RESULT plan would
    # add Joins/Unions here.
    "graph_connected_components": {
        "Aggregate": 3, "Union": 1, "Project": 4, "LogicalRDD": 3, "Join": 1,
    },
    # hub-capped wedge join over the shared co-purchase edge build
    # (checkpointed LogicalRDD leaves) + TakeOrderedAndProject top-50
    # (GlobalLimit/LocalLimit/Sort, no Window).
    "graph_jaccard_neighbors": {
        "GlobalLimit": 1, "LocalLimit": 1, "Project": 20, "Sort": 1,
        "Join": 5, "Aggregate": 5, "Union": 6, "LogicalRDD": 12, "Filter": 2,
    },
    # pairwise slopes on the bounded day grid (cached: InMemoryRelation),
    # two-phase selection median = 3 bounded Windows, never a global
    # row_number over raw rows. Re-pinned r12: n_pairs derives
    # arithmetically from n_days (|pairs| = n*(n-1)/2 by construction of
    # the explode+hash-join enumeration), dropping the third pass over
    # the cached pair frame — one fewer Join/Aggregate/InMemoryRelation
    # reference in the result plan.
    "ts_theil_sen_slope": {
        "Join": 2, "Aggregate": 3, "Project": 6, "LogicalRDD": 1,
        "InMemoryRelation": 2, "Filter": 3, "Window": 3,
    },
    # 3 synchronized Hash-Min rounds, re-pinned r12: labels propagate as
    # alternating same-key window minima carried on the symmetric
    # adjacency stream (l1/l2 in both orientations + l3 per-u = 4 Window
    # stages, one exchange each, zero joins — the aggregate-and-join
    # round form this replaced pinned 7 Joins / 17 Aggregates; bench_one
    # 3.11 -> 2.76 s on a worse probe). A Join appearing here means a
    # round went back to joining the label table onto the adjacency.
    "graph_label_propagation": {
        "Aggregate": 3, "Union": 1, "Project": 7, "Window": 4,
        "LogicalRDD": 2,
    },
    # k-truss: support recount ONLY on checkpointed survivor frames
    # (LogicalRDD leaves); recounting on the un-checkpointed lineage
    # would multiply the Join/Union counts.
    "graph_ktruss_edges": {
        "Union": 5, "Project": 22, "Join": 10, "Aggregate": 8,
        "LogicalRDD": 16, "Filter": 2,
    },
    # round-8 entrants with eager per-round checkpoints: the result plan
    # is pure post-checkpoint rollup — ZERO Joins for the 8-round k-core
    # (each round's stats read a materialized survivor frame; a Join
    # appearing here means a round started recounting on lineage).
    "graph_kcore_bounded_peel": {
        "Union": 9, "Aggregate": 8, "Project": 16, "LogicalRDD": 16,
    },
    # support-2 gate + oriented-frame checkpoint: wedge join + closure
    # + zero-tier left join = exactly 3 Joins, corners credited via ONE
    # Generate (explode) — a second Generate or extra Join is the
    # triple-scan regression.
    "graph_triangle_participation": {
        "Aggregate": 3, "Project": 9, "Join": 3, "Union": 1,
        "LogicalRDD": 5, "Generate": 1,
    },
    # soft-dedup weights: CC output (checkpointed) + one per-component
    # rollup + the singleton left join; extra Aggregates would mean the
    # cluster stats are being recomputed per consumer.
    "pipeline_soft_dedup_weights": {
        "Project": 11, "Join": 4, "LogicalRelation": 1, "Union": 2,
        "LogicalRDD": 6, "Aggregate": 3,
    },
    # round-9 pin, re-pinned r12: the power iterations are now FOUR
    # alternating same-key windows over the single checkpointed edge
    # leaf (h1/a1/h2/a2 attach in place — one exchange per round, zero
    # joins; bench_one 4.31 s -> 2.88 s on a worse probe) + one W(i)-
    # partitioning-reusing rollup + TakeOrderedAndProject. A Join
    # appearing here means a round went back to aggregate-and-join.
    "graph_hits_hubs_authorities": {
        "GlobalLimit": 1, "LocalLimit": 1, "Sort": 1, "Aggregate": 1,
        "Project": 4, "Window": 4, "LogicalRDD": 1,
    },
    # embedding near-dup: LSH bucket equi-join candidates (checkpointed
    # base), exactly 2 Arrow-vectorized cosine evals and 2 Generates
    # (bucket posexplode per side) — a 3rd ArrowEvalPython or a Window
    # appearing here is the re-scored-per-consumer regression; no cross
    # join can hide (Join: 3, all equi).
    "sim_embedding_near_dup": {
        "Project": 11, "ArrowEvalPython": 2, "Filter": 7, "Join": 3,
        "Aggregate": 1, "Generate": 2, "LogicalRDD": 4,
    },
    # round-9 late entrants. Louvain sweep: everything downstream of the
    # 4 eager checkpoints (edges/deg/nk/labels -> LogicalRDD leaves) is
    # bounded rollup — 6 Joins total (2 label tags, kmin re-join, deg
    # join, 2 stat cross-joins); a re-derived edge build would multiply
    # LogicalRDD into Join/Union lineage here. r12: the edge leaf is now
    # the shared in-row pair generator (_copurchase_edges) instead of a
    # private order self-join — one extra Project (the pa/pb alias over
    # the checkpointed leaf), all other counts unchanged.
    "graph_louvain_first_sweep": {
        "Project": 10, "Join": 6, "Aggregate": 6, "LogicalRDD": 7,
    },
    # PQ audit AFTER the array-local rewrite: exactly 3 Joins (two
    # assignment passes + r1/r2 merge), ONE Generate (the centroid-mean
    # posexplode — the only dim-granular stage), one bounded (sub,c)
    # Window. A second Generate or a 4th Join is the
    # explode-join-reaggregate regression (4.45s -> 2.59s lesson).
    "sim_product_quantization_audit": {
        "Project": 6, "Join": 3, "Aggregate": 5, "Window": 1,
        "LogicalRDD": 4, "Generate": 1, "Filter": 2,
    },
    # absorption time: 8 unrolled value-iteration rounds = 2 joins per
    # round against the checkpointed 25-cell transition frame (16 Joins,
    # 17 LogicalRDD leaves); a 9th round or an un-checkpointed t2
    # re-derivation changes these counts.
    "analytics_markov_absorption_time": {
        "Project": 18, "Aggregate": 8, "Join": 16, "LogicalRDD": 17,
        "Filter": 8,
    },
    # ego density (fresh-JVM 2.36s): the checkpointed edge self-join
    # (LogicalRDD leaves) feeds adjacency unions, the degree aggregate,
    # the top-20 TakeOrdered (3 limit/sort stacks incl. the hub frame's
    # two broadcast consumers), and the per-endpoint membership joins —
    # an un-checkpointed edge build re-derives the order self-join per
    # consumer and changes Join/LogicalRDD counts here.
    # re-pinned r13: the 20-row hub frame (degree top-k) is eagerly
    # checkpointed, so the 2|E|-row degree aggregate + TakeOrdered chain
    # runs ONCE instead of once per consumer (it fed the nu join's two
    # broadcast builds AND the final left join — Aggregate 4 -> 1,
    # Sort/Limit 3 -> 0, the hub chain now a LogicalRDD leaf). An
    # Aggregate or Sort count rising here means a consumer started
    # re-deriving the hub frame on lineage again.
    "graph_ego_density_topk": {
        "Project": 11, "Join": 5, "Aggregate": 1, "Union": 2,
        "LogicalRDD": 8,
    },
    # minhash estimator calibration, r12 second pass (fresh-JVM A/B
    # matched probes: 5.03s -> 4.22s): ONE tokenization — the shingle
    # ARRAY frame is checkpointed, signatures derive array-locally from
    # it and are themselves checkpointed ahead of the fused band join, so
    # the result plan holds ZERO parquet scans and zero
    # RepartitionByExpression (the input spread happens before the sets
    # checkpoint); Windows 4 -> 2 (the df-cap window moved pre-checkpoint
    # — band-cap windows remain, one per band side over the sig leaf);
    # Aggregates 5 -> 3 (set sizes are now map-side size(__ss), not a
    # groupBy per consumer). A LogicalRelation reappearing means a
    # consumer started re-tokenizing the corpus; a 6th Join means sig
    # re-joins came back.
    "dedup_minhash_estimate_error": {
        "Aggregate": 3, "Project": 11, "Join": 5, "Filter": 6,
        "Window": 2, "Generate": 2, "LogicalRDD": 6,
    },
    # round-10 pins closing VERDICT r9 "What's wrong" #3 — the last three
    # >=2 s headline plans without a pin or waiver.
    # band sensitivity (r12 second pass; fresh-JVM A/B pairs: after
    # re-pinned late-r12 (fused config sweep, bench_one 4.14 -> 3.72 s on
    # near-matched probes): the three per-config band joins union behind
    # ONE (cfg, band, bucket) exchange — one skew window, one self-join,
    # one pair distinct, one truth left-join + per-cfg aggregate instead
    # of three of each (Window 6 -> 2, Join 9 -> 4, Aggregate 9 -> 3),
    # and the banded exchange stopped carrying the 32-long signature
    # column (pair identity is all this query evaluates). LogicalRDD
    # 12 -> 8 = sigs x2 band sides + truth + n_truth... leaves; Union 3 /
    # Range 3 = the literal 3-row config frame. Re-pinned r13: the three
    # banded union branches fused into ONE explode over a concat of
    # per-config struct arrays, with signatures derived INLINE from the
    # checkpointed shingle frame (Generate 6 -> 2, Union 3 -> 1,
    # LogicalRDD 8 -> 4 — the eager sigs checkpoint job is gone; its one
    # consumer is this explode). An InMemoryRelation reappearing means
    # persist came back; Join > 4 means a config started rebuilding
    # signatures or truth on lineage; Generate > 2 means the banded pass
    # split back into per-config branches.
    "dedup_lsh_band_sensitivity": {
        "Union": 1, "Project": 16, "Join": 4, "Aggregate": 3, "Filter": 3,
        "Window": 2, "Generate": 2, "LogicalRDD": 4, "Range": 3,
    },
    # soft-dedup ESS (fresh-JVM 4.7s): CC labels arrive checkpointed
    # (LogicalRDD leaves — the shared df-capped candidate join is spent
    # before this plan), so the result is the per-cluster rollup, the
    # singleton left-join, the doc-source tag join, and one bounded
    # per-source aggregate = exactly 5 Joins / 4 Aggregates. Extra
    # Aggregates = cluster stats recomputed per consumer (the
    # pipeline_soft_dedup_weights regression class).
    "pipeline_soft_dedup_ess_by_source": {
        "Project": 14, "Aggregate": 4, "Join": 5, "Filter": 2,
        "LogicalRelation": 2, "Union": 2, "LogicalRDD": 6,
    },
    # landmark distances, re-pinned r12 (parity BFS): rounds expand the
    # previous frontier only (no growing anti-join), re-visits stay in,
    # and the min(dist)-per-(lm,p) fold recovers the exact BFS distance
    # — so the RESULT plan is the 5 materialized leaves + TWO aggregates
    # (min-fold + histogram) and still ZERO Joins; a Join appearing here
    # means a BFS round leaked its lineage into the profile rollup.
    "graph_landmark_distance_profile": {
        "Aggregate": 2, "Union": 1, "Project": 4, "LogicalRDD": 5,
    },
    # r11 Bradley-Terry (in-suite 2.3s pre-fix): the duel scan + rank
    # window run ONCE and land in the eagerly checkpointed `wins` frame;
    # every downstream pair/type table re-reads that tiny LogicalRDD (11
    # leaves), so ZERO Window/LogicalRelation nodes may appear in the
    # RESULT plan — a Window here means the events scan re-expanded per
    # consumer (the 48-Aggregate/11-scan shape this pin was added to
    # prevent; bench_one post-fix: 2.66 s raw at probe 0.501 ~= 1.1
    # normalized).
    "ml_bradley_terry_one_step": {
        "Sort": 1, "Project": 17, "Join": 6, "Aggregate": 15,
        "Union": 4, "Filter": 11, "LogicalRDD": 11,
    },
    # r11 wedge closure, re-pinned r12: the oriented frame is now
    # eagerly checkpointed for its three consumers (both wedge sides +
    # the closure edge list — the graph_triangle_participation shape),
    # so the per-consumer degree-attach re-derivation is gone: Join
    # 9 -> 3 (wedge pair + closure + the tri left join), Aggregate
    # 9 -> 3, Union 7 -> 1, LogicalRDD 17 -> 5. One Generate = the
    # 3-vertex credit explode; a Join count above 3 means a consumer
    # went back to re-deriving the orientation on lineage.
    "graph_wedge_closure_by_degree": {
        "Sort": 1, "Aggregate": 3, "Project": 8, "Join": 3,
        "Filter": 1, "Union": 1, "LogicalRDD": 5, "Generate": 1,
    },
    # r12 eigenvector centrality, re-pinned late-r12: the three matvec
    # rounds are alternating same-key windows carried on the symmetric
    # adjacency (4 Window stages per consumption; the per_node rollup
    # feeds mx's broadcast build AND the top-20, hence Window 8 = 4 x 2
    # — measured faster than an eager checkpoint of the rollup, see the
    # plan comment; bench_one 3.84 -> 2.95 s on a worse probe). The one
    # Join is the broadcast mx attach; more Joins mean a matvec went
    # back to aggregate-and-join; a global-sort Window would mean the
    # rank reverted from TakeOrderedAndProject-then-rank.
    "graph_eigenvector_centrality": {
        "Sort": 2, "Project": 13, "Window": 8, "GlobalLimit": 1,
        "LocalLimit": 1, "Join": 1, "Aggregate": 3, "Union": 2,
        "LogicalRDD": 4,
    },
    # r12 harmonic centrality, re-pinned for the parity-BFS rewrite
    # (same move as graph_landmark_distance_profile): the min-dist fold
    # adds one Aggregate; the per-round "dist > 0" residue filters
    # collapse to 2 because re-visit rows no longer carry per-round
    # null-guards. Still zero Joins — a Join appearing here means a
    # frontier started re-deriving on lineage.
    "graph_harmonic_centrality": {
        "Sort": 2, "Project": 5, "Filter": 2, "Window": 1,
        "GlobalLimit": 1, "LocalLimit": 1, "Aggregate": 2, "Union": 1,
        "LogicalRDD": 5,
    },
}


@pytest.mark.parametrize("name", sorted(PINNED))
def test_plan_fingerprint_pinned(spark, name):
    # Fingerprint against a clean CacheManager: an earlier pinned query's
    # .persist() (e.g. dedup_lsh_band_sensitivity's signature frame)
    # otherwise substitutes InMemoryRelation for the identical subtree in a
    # LATER query's optimized plan, so the pin would depend on test order.
    spark.catalog.clearCache()
    df = all_specs()[name].spark(spark, SF_SMOKE)
    assert fingerprint(df) == PINNED[name], (
        f"{name}: optimized-plan shape changed — if intentional, update "
        "the pin in the same commit with a fresh bench_one number"
    )


def test_cc_converges_in_bounded_rounds(spark):
    """Behavioral pin to go with the structural one: the alternating-star
    loop must still reach a CONVERGED fixpoint in a handful of rounds at
    smoke scale (it was 3-4 rounds in every round since r5). A regression
    to O(diameter) propagation would blow this bound long before it
    showed up at sf0.1."""
    from wal_consumer_spark.operators import graph

    all_specs()["graph_connected_components"].spark(spark, SF_SMOKE).collect()
    stats = graph.last_cc_stats
    assert stats["converged"] is True
    assert 1 <= stats["rounds"] <= 6, stats


def test_fingerprint_flags_deliberate_extra_shuffle(spark):
    """Deliberate violation: recomputing an aggregate that the real plan
    derives from ONE aggregation (the frame-reuse anti-pattern from
    rounds 4-5) must change the fingerprint — proving the pin would catch
    exactly the regression class it exists for."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    good = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    )
    # the anti-pattern: two separate aggregations joined back together
    bad = (
        li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
        .join(
            li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")),
            "l_orderkey",
        )
    )
    assert fingerprint(good) != fingerprint(bad)
    assert fingerprint(bad).get("Aggregate", 0) > fingerprint(good).get(
        "Aggregate", 0
    )
