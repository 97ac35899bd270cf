"""Equivalence tests for the chunked gaps-and-islands operator
(operators/sequence.py) against a straight-line Python oracle, at tiny
chunk widths so every merge path actually fires — the sf0.01 parity test
exercises only a handful of 8192-wide chunks, never a long bridge chain.

Cases the chunk logic must get right:
- island strictly inside one chunk (no bridge)
- island crossing exactly one boundary (single bridge, no connector)
- island spanning several FULL chunks (bridge chain through full-chunk
  connector pieces)
- two boundary-touching pieces of one chunk with an interior gap — the
  bridges on either side must NOT chain (the round-5 chain-break rule)
- singleton keys on and next to chunk boundaries
"""

from __future__ import annotations

import random

import pytest

from wal_consumer_spark.operators.sequence import chunked_gaps, chunked_islands


def _islands_oracle(keys: set[int]) -> set[tuple[int, int, int]]:
    out = []
    for k in sorted(keys):
        if out and out[-1][1] == k - 1:
            out[-1][1] = k
        else:
            out.append([k, k])
    return {(s, e, e - s + 1) for s, e in out}


def _gaps_oracle(keys: set[int]) -> set[tuple[int, int, int]]:
    ks = sorted(keys)
    return {
        (a, b, b - a - 1)
        for a, b in zip(ks, ks[1:])
        if b - a > 1
    }


CASES = {
    "inside_one_chunk": [1, 2, 3, 9, 10],
    "one_bridge": [2, 3, 4, 5],  # crosses the 4-boundary at chunk_w=4
    "full_chunk_chain": list(range(2, 19)),  # spans chunks 0..4 at w=4
    "interior_gap_break": [3, 4, 6, 7, 8, 11],  # chunk 1 = {4,6,7} has a
    # gap: bridges 0 and 1 both exist but must NOT chain
    "boundary_singletons": [0, 3, 4, 7, 8, 9, 16],
    "sparse_singletons": [0, 5, 10, 15, 20],
    "everything_present": list(range(0, 24)),
}
_rng = random.Random(20260814)
CASES["random_dense"] = sorted(_rng.sample(range(0, 200), 120))
CASES["random_sparse"] = sorted(_rng.sample(range(0, 500), 60))


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("chunk_w", [4, 7])
def test_chunked_islands_matches_oracle(spark, name, chunk_w):
    keys = CASES[name]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        (r["island_start"], r["island_end"], r["island_len"])
        for r in chunked_islands(df, "k", chunk_w).collect()
    }
    assert got == _islands_oracle(set(keys)), f"{name} w={chunk_w}"


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("chunk_w", [4, 7])
def test_chunked_gaps_matches_oracle(spark, name, chunk_w):
    keys = CASES[name]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        (r["gap_after"], r["next_present"], r["n_missing"])
        for r in chunked_gaps(df, "k", chunk_w).collect()
    }
    assert got == _gaps_oracle(set(keys)), f"{name} w={chunk_w}"
