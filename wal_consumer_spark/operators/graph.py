"""Connected components over candidate-pair edges — the clustering step of
large-scale near-dedup (pairs from MinHash/SimHash → duplicate *clusters* →
one canonical doc per cluster).

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14) expressed as DataFrame
joins/aggregations only — each iteration is two bounded shuffles, converges
in O(log^2 n) rounds on any graph, and never materializes a component in one
task's memory (unlike label-propagation-by-collect approaches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Canonical implementation moved to operators/broadcast.py in round 6 so
# the non-graph families (textml/analytics/cdc) share the same gate;
# re-exported here because the graph plans and round-5 tests import it
# from this module. Graph per-node tables (degrees, cap-filtered vertex
# sets) are dimension-sized at test SF but scale with the corpus — on a
# billion-node graph an unconditional F.broadcast would OOM the driver
# (round-4 VERDICT plan audit, graph_jaccard_neighbors note).
from wal_consumer_spark.operators.broadcast import maybe_broadcast  # noqa: F401


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor u > v to v's minimum neighbor (incl. v).

    r12 (guide §2.4 — two operations keyed the same way share one
    exchange): the per-node minimum is a same-key window over the
    neighbor stream instead of a groupBy + join back on `src` — one
    exchange of the doubled edge frame instead of two plus a join build.
    The output is NOT distinct'ed here: _small_star (always applied
    right after) canonicalizes and distincts its own output, and its
    per-node window minimum is duplicate-agnostic, so the intermediate
    dedup shuffle bought nothing (the round's edge set — what the
    convergence checksum compares — is identical)."""
    nbrs = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mn = F.min("dst").over(Window.partitionBy("src"))
    return (
        nbrs.withColumn("mn", mn)
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.least("mn", F.col("src")).alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node, connect all smaller neighbors to the minimum one.

    Same window-for-groupBy-join rewrite as _large_star, and the two
    output branches (smaller-neighbor -> min, node -> min) are emitted
    in one pass as a 2-element in-row explode instead of two joins
    unioned — the (src, mn) branch appears once per adjacency row
    rather than once per node, exactly as the old join form did, and
    the trailing distinct collapses both identically."""
    canon = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mn = F.min("dst").over(Window.partitionBy("src"))
    return (
        canon.withColumn("mn", mn)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.greatest("dst", "mn").alias("s"),
                        F.least("dst", "mn").alias("d"),
                    ),
                    F.struct(
                        F.col("src").alias("s"), F.col("mn").alias("d")
                    ),
                )
            ).alias("e")
        )
        .select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


#: Telemetry from the most recent connected_components call in this
#: process: {"rounds": int, "converged": bool}. Written every call (driver
#: -side bookkeeping only — no extra Spark work); read by bench isolation
#: notes and tests. At sf0.1 the copurchase graph converges in 3 rounds.
last_cc_stats: dict = {}


def connected_components(
    pairs: DataFrame, src: str = "doc1", dst: str = "doc2", max_iter: int = 20
) -> DataFrame:
    """(node, component) for every node in `pairs`; component = min node id
    of its component. Iterates large-star/small-star to fixpoint (checked by
    edge-set stability; each check is one count — cheap relative to the
    joins, and the loop is O(log^2 n) so max_iter=20 covers any realistic
    graph: 2^(sqrt 20) ≈ 10^1.3 ... even a path graph of 10^6 nodes needs
    ~log^2 ≈ 400 star rounds only in the adversarial worst case, while
    real near-dup / co-occurrence graphs converge in <6 (observed: 3 at
    sf0.1; tests assert convergence via `last_cc_stats`).

    NON-CONVERGENCE CONTRACT: if max_iter rounds pass without the edge
    set stabilizing, the function RETURNS THE PARTIAL CONTRACTION rather
    than raising — every returned (node, component) pair is a correct
    "node belongs to the component containing `component`" statement, but
    two nodes of one true component may still map to different
    representatives (over-segmentation, never over-merging). Callers that
    need certainty check `last_cc_stats["converged"]` and re-run with a
    higher max_iter; dedup pipelines prefer this failure mode (a missed
    merge = a duplicate survives) over an exception at hour 6 of a 100 TB
    job."""
    def _checksum(e: DataFrame) -> tuple:
        """(count, sum of edge hashes): set-equality certificate in one
        aggregate instead of two exceptAll joins per convergence check."""
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    # localCheckpoint (not persist): an iterative DataFrame algorithm must
    # TRUNCATE lineage each round or the logical plan nests once per
    # iteration and Catalyst planning goes exponential (measured: 90s/test
    # with persist, <15s with checkpoint). On a cluster with failure
    # tolerance requirements use checkpoint() to a reliable dir instead.
    #
    # The no-op CASE wrapper forces src/dst NULLABLE: with non-nullable
    # inputs (spark.range ids, collect_set elements, group-by keys over
    # non-null columns) the star iteration's self-union + aggregate join
    # trips a Catalyst rewrite bug under localCheckpoint in Spark 4.1
    # ("java.util.NoSuchElementException: key not found: dst#NL" during
    # plan normalization); nullable attributes take the healthy path.
    # Regression-tested with a range-derived chain graph in
    # tests/test_graph.py.
    def _nullable(c):
        return F.when(F.lit(False), F.lit(None)).otherwise(c)

    edges = (
        pairs.select(
            _nullable(F.greatest(F.col(src), F.col(dst))).alias("src"),
            _nullable(F.least(F.col(src), F.col(dst))).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sum = _checksum(edges)
    converged = False
    rounds = 0
    # r13 examined, measured, REJECTED (VERDICT r12 "Next round" #4):
    # two-hop doubling — TWO star rounds chained per localCheckpoint
    # barrier, convergence checked one 2-round stride apart (exact: the
    # star alternation converges from any start, so R²(E)=E implies
    # R(E)=E — a true 2-cycle would never reach the fixpoint Kiveris et
    # al. prove it reaches). Fresh-JVM A/B at sf0.1, near-matched cpu
    # probes: graph_connected_components 3.297 s -> 3.644 s (probes
    # 0.232/0.252), pipeline_soft_dedup_ess_by_source 3.227 s -> 4.334 s
    # with the doubled variant on the BETTER probe (0.221/0.213). Cause:
    # the bench graph fixes in ~3 rounds, so the stride's detection lag
    # runs 6 star rounds (3 barriers) where per-round checking runs 4
    # rounds (4 barriers) — post-r12 a star round is one cheap window
    # pass, so +50% round work swamps the one saved barrier, and the
    # same detection-lag arithmetic (rounds ~= r*+2 vs r*+1) holds at
    # any scale where rounds stay single digits (every observed corpus).
    for _ in range(max_iter):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        nxt_sum = _checksum(nxt)
        edges = nxt
        rounds += 1
        if nxt_sum == prev_sum:
            converged = True
            break
        prev_sum = nxt_sum
    last_cc_stats.clear()
    last_cc_stats.update({"rounds": rounds, "converged": converged})
    # component id = the (unique, by convergence) dst each node points at;
    # root nodes point at themselves
    membership = edges.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = (
        edges.select(F.col("dst").alias("node"))
        .distinct()
        .join(membership.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return membership.unionByName(roots)


def dedup_clusters(pairs: DataFrame, src: str = "doc1", dst: str = "doc2") -> DataFrame:
    """Duplicate clusters from candidate pairs: (component, n_members,
    canonical_id=min member). Docs absent from `pairs` are their own
    cluster and need no shuffle at all — only near-dup candidates enter."""
    cc = connected_components(pairs, src, dst)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("canonical_id"),
    )
