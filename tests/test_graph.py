"""Connected-components operator (operators/graph.py): known-graph
correctness for the alternating large-star/small-star iteration."""

from __future__ import annotations

from wal_consumer_spark.operators.graph import connected_components, dedup_clusters


def test_connected_components_known_graph(spark):
    # {1-2-3-4 chain}, {5,6}, {7,8,9 star}, {10..13 via two pairs + bridge}
    edges = [(1, 2), (2, 3), (3, 4), (5, 6), (7, 8), (7, 9), (10, 11), (12, 13), (11, 13)]
    df = spark.createDataFrame(edges, "doc1 LONG, doc2 LONG")
    got = dict((r.node, r.component) for r in connected_components(df).collect())
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7, 8: 7, 9: 7,
                   10: 10, 11: 10, 12: 10, 13: 10}


def test_dedup_clusters_sizes(spark):
    edges = [(1, 2), (2, 3), (5, 6)]
    df = spark.createDataFrame(edges, "doc1 LONG, doc2 LONG")
    got = {
        (r.component, r.n_members, r.canonical_id)
        for r in dedup_clusters(df).collect()
    }
    assert got == {(1, 3, 1), (5, 2, 5)}
