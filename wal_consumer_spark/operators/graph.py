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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor u > v to v's minimum neighbor (incl. v)."""
    nbrs = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = nbrs.groupBy("src").agg(F.min("dst").alias("mn"))
    return (
        nbrs.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.least("mn", F.col("src")).alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node, connect all smaller neighbors to the minimum one."""
    canon = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = canon.groupBy("src").agg(F.min("dst").alias("mn"))
    return (
        canon.join(m, "src")
        .select(
            F.col("dst").alias("a"),
            F.col("mn").alias("b"),
            F.col("src").alias("orig_src"),
        )
        .select(
            F.greatest("a", "b").alias("src"), F.least("a", "b").alias("dst")
        )
        .unionByName(
            canon.join(m, "src").select(
                F.col("src").alias("src"), F.col("mn").alias("dst")
            )
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame, src: str = "doc1", dst: str = "doc2", max_iter: int = 20
) -> DataFrame:
    """(node, component) for every node in `pairs`; component = min node id
    of its component. Iterates large-star/small-star to fixpoint (checked by
    edge-set stability; each check is one count — cheap relative to the
    joins, and the loop is O(log^2 n) so max_iter=20 covers any realistic
    graph)."""
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
    edges = (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).alias("src"),
            F.least(F.col(src), F.col(dst)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sum = _checksum(edges)
    for _ in range(max_iter):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        nxt_sum = _checksum(nxt)
        edges = nxt
        if nxt_sum == prev_sum:
            break
        prev_sum = nxt_sum
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
