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


# ---------------------------------------------------------------------------
# Recursive summary levels (round-5 VERDICT "What's wrong" #3): cases where
# the chunk-summary table ITSELF spans multiple buckets, so the second
# summary level actually fires. At chunk_w=4 a 1600-wide key range gives a
# ~400-row summary -> 100 level-2 buckets -> 25 level-1 buckets; the
# 200-long contiguous run drives a 49-bridge chain whose prefix-sum must
# stay one chain across bucket boundaries.
# ---------------------------------------------------------------------------

DEEP_CASES = {
    "long_contiguous_chain": list(range(0, 200)),
    "long_range_sparse": list(range(0, 1600, 3)),
    "long_mixed": sorted(set(range(0, 120)) | set(_rng.sample(range(120, 1600), 300))),
}


@pytest.mark.parametrize("name", sorted(DEEP_CASES))
@pytest.mark.parametrize("levels", [0, 1, 2])
def test_chunked_islands_summary_levels(spark, name, levels):
    keys = DEEP_CASES[name]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        (r["island_start"], r["island_end"], r["island_len"])
        for r in chunked_islands(df, "k", 4, summary_levels=levels).collect()
    }
    assert got == _islands_oracle(set(keys)), f"{name} levels={levels}"


@pytest.mark.parametrize("name", sorted(DEEP_CASES))
@pytest.mark.parametrize("levels", [0, 1, 2])
def test_chunked_gaps_summary_levels(spark, name, levels):
    keys = DEEP_CASES[name]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        (r["gap_after"], r["next_present"], r["n_missing"])
        for r in chunked_gaps(df, "k", 4, summary_levels=levels).collect()
    }
    assert got == _gaps_oracle(set(keys)), f"{name} levels={levels}"


def test_recursive_helpers_match_python_oracle(spark):
    """_lead_val / _prefix_sum at depth 2 on sparse non-contiguous keys."""
    from wal_consumer_spark.operators.sequence import _lead_val, _prefix_sum

    rng = random.Random(7)
    rows = sorted((k, rng.randint(-5, 5)) for k in rng.sample(range(0, 900), 150))
    df = spark.createDataFrame(rows, "k long, v long")
    lead = {
        r["k"]: r["nxt"]
        for r in _lead_val(df, "k", "v", "nxt", 4, 2).collect()
    }
    ps = {
        r["k"]: r["ps"]
        for r in _prefix_sum(df, "k", "v", "ps", 4, 2).collect()
    }
    run = 0
    for i, (k, v) in enumerate(rows):
        run += v
        assert ps[k] == run, f"prefix at {k}"
        expect = rows[i + 1][1] if i + 1 < len(rows) else None
        assert lead[k] == expect, f"lead at {k}"


def test_registered_sequence_plans_single_leaf_global_window(spark):
    """The registered callers (win_islands, dq_sequence_gap_audit) now
    carry exactly ONE unpartitioned Window — the depth-1 recursion leaf,
    whose input is the summary-of-summary table (chunk_w² = 67M× smaller
    than the key set at the callers' chunk_w=8192). Every other Window
    must have a partitionSpec."""
    from wal_consumer_spark.plans import all_specs

    sf = "/root/testdata/sf0.001"
    for name in ("win_islands", "dq_sequence_gap_audit"):
        df = all_specs()[name].spark(spark, sf)
        opt = df._jdf.queryExecution().optimizedPlan()

        def _walk(n):
            yield n
            ch = n.children()
            for i in range(ch.size()):
                yield from _walk(ch.apply(i))

        unpart = [
            n
            for n in _walk(opt)
            if n.nodeName() == "Window" and n.partitionSpec().isEmpty()
        ]
        assert len(unpart) <= 1, (
            f"{name}: {len(unpart)} unpartitioned Windows — the recursion "
            "leaf is the only one allowed"
        )


# ---------------------------------------------------------------------------
# union_coverage_per_day: sweep-line coverage vs a brute-force second-set
# oracle. The sf data's ~1 s sessions never cross midnight, so the
# boundary-stitch (seg2) and multi-day clipping paths only fire here.
# ---------------------------------------------------------------------------

def _coverage_oracle(intervals: list[tuple[int, int]]) -> dict[int, int]:
    covered: set[int] = set()
    for t0, t1 in intervals:
        covered.update(range(t0, t1))
    out: dict[int, int] = {}
    for s in covered:
        out[s // 86400] = out.get(s // 86400, 0) + 1
    return out


def _run_coverage(spark, intervals):
    from wal_consumer_spark.operators.sequence import union_coverage_per_day

    iv = spark.createDataFrame(
        [(int(a), int(b)) for a, b in intervals], "t0 long, t1 long"
    )
    got = {
        r["di"]: r["covered_seconds"]
        for r in union_coverage_per_day(iv).collect()
    }
    assert got == _coverage_oracle(intervals)


def test_coverage_midnight_crossing(spark):
    # one interval straddling the day-0/day-1 boundary, one disjoint
    _run_coverage(spark, [(86400 - 600, 86400 + 600), (90000, 90010)])


def test_coverage_multi_day_span(spark):
    # a single interval covering > 2 full days: the boundary segment must
    # clip into every day it overlaps (day explode path)
    _run_coverage(spark, [(80000, 80000 + 3 * 86400 + 5000)])


def test_coverage_overlapping_and_nested(spark):
    _run_coverage(
        spark,
        [(100, 500), (300, 900), (400, 450), (900, 1000), (2000, 2001)],
    )


def test_coverage_touching_endpoints_do_not_merge_days(spark):
    # interval ending exactly at midnight and another starting there:
    # running count dips to 0 at the shared instant only if they don't
    # overlap — coverage must still be exact on both sides
    _run_coverage(spark, [(86400 - 100, 86400), (86400, 86400 + 100)])


def test_coverage_gap_across_midnight_not_covered(spark):
    # activity ends before midnight, resumes next day: the cross-day
    # boundary segment has conc == 0 and must contribute nothing
    _run_coverage(spark, [(86400 - 500, 86400 - 400), (86400 + 300, 86400 + 350)])


def test_coverage_randomized(spark):
    rng = random.Random(7)
    intervals = []
    for _ in range(40):
        t0 = rng.randrange(0, 4 * 86400)
        intervals.append((t0, t0 + rng.randrange(1, 90000)))
    _run_coverage(spark, intervals)
