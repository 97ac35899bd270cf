"""Property test for the two-phase distributed selection operator: on any
integer multiset (duplicates, negatives, skew) and any bucket width, the
value returned for each rank equals the sorted-list order statistic — the
cumulative-containment argument made executable."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wal_consumer_spark.operators.selection import exact_rank_selection


@settings(max_examples=12, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=200
    ),
    bucket_div=st.sampled_from([1, 7, 100, 5000]),
)
def test_rank_selection_matches_sorted_oracle(spark, vals, bucket_div):
    df = spark.createDataFrame([(v,) for v in vals], "v LONG")
    n = len(vals)
    ranks = {
        "median": lambda nn: F.floor((nn + 1) / 2).cast("long"),
        "p25": lambda nn: F.greatest(
            F.floor(nn * 25 / 100).cast("long"), F.lit(1).cast("long")
        ),
        "max": lambda nn: nn.cast("long"),
        "min": lambda nn: F.lit(1).cast("long"),
    }
    got = {
        r["label"]: r["value"]
        for r in exact_rank_selection(df, "v", ranks, bucket_div).collect()
    }
    s = sorted(vals)
    expected = {
        "median": s[(n + 1) // 2 - 1],
        "p25": s[max(math.floor(n * 25 / 100), 1) - 1],
        "max": s[-1],
        "min": s[0],
    }
    assert got == expected, (vals, bucket_div, got, expected)


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-1_000, max_value=1_000),
        ),
        min_size=1,
        max_size=150,
    ),
    bucket_div=st.sampled_from([1, 7, 100]),
)
def test_value_group_ranks_by_matches_sorted_oracle(spark, rows, bucket_div):
    """Per-segment tie-group ranks: for every (segment, value) group, the
    rank range [start_rank, start_rank + cnt - 1] must equal the span the
    group's rows occupy in the segment's ascending sort, and n must be
    the segment's row count."""
    from collections import Counter, defaultdict

    from wal_consumer_spark.operators.selection import value_group_ranks_by

    df = spark.createDataFrame(rows, "seg STRING, v LONG")
    got = {
        (r["seg"], r["v"]): (r["cnt"], r["start_rank"], r["n"])
        for r in value_group_ranks_by(df, "seg", "v", bucket_div).collect()
    }
    by_seg = defaultdict(list)
    for seg, v in rows:
        by_seg[seg].append(v)
    expected = {}
    for seg, vals in by_seg.items():
        counts = Counter(vals)
        start = 1
        for v in sorted(counts):
            expected[(seg, v)] = (counts[v], start, len(vals))
            start += counts[v]
    assert got == expected, (rows, bucket_div)
