"""Misra-Gries candidate guarantee under forced decrements.

The sf testdata never overflows 1024 counters (bigram domain ~930), so the
decrement path must be exercised synthetically: tiny k, adversarial mix of
one genuinely heavy item and a long tail, multiple partitions.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from wal_consumer_spark.operators.sketch import misra_gries_candidates


def _stream():
    # 300 rows: "hot" appears 90x (30% >= n/k for k=4), tail of 120
    # distinct items ~2x each — forces constant counter eviction at k=4.
    rows = ["hot"] * 90 + [f"tail{i % 120}" for i in range(210)]
    # deterministic interleave so no partition is all-hot
    return [s for _, s in sorted(enumerate(rows), key=lambda p: (p[0] * 7919) % 300)]


def test_candidates_contain_every_threshold_item(spark):
    rows = _stream()
    df = spark.createDataFrame(
        [(r,) for r in rows], "item string"
    ).repartition(5)
    k = 4
    n = len(rows)
    exact = Counter(rows)
    must_survive = {i for i, c in exact.items() if c >= -(-n // k)}
    got = {
        r.item for r in misra_gries_candidates(df, "item", k).collect()
    }
    assert must_survive, "test is vacuous: nothing reaches n/k"
    missing = must_survive - got
    assert not missing, f"MG false negatives above n/k: {missing}"
    # candidate set stays bounded by partitions * k
    assert len(got) <= 5 * k


def test_recount_matches_python_oracle(spark):
    rows = _stream()
    df = spark.createDataFrame(
        [(r,) for r in rows], "item string"
    ).repartition(3)
    k = 8
    n = len(rows)
    thresh = -(-n // k)
    cand = misra_gries_candidates(df, "item", k)
    got = {
        (r.item, r.cnt)
        for r in df.join(F.broadcast(cand), "item", "semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") >= thresh)
        .collect()
    }
    exact = Counter(rows)
    want = {(i, c) for i, c in exact.items() if c >= thresh}
    assert got == want


def test_intra_batch_chunked_trim_bounds_counters(spark):
    """ADVICE r6: one oversized Arrow batch with a huge distinct domain
    must not balloon the counter table to the batch's distinct count —
    the fold trims back to k within the batch (chunk size max(4k, 4096)).
    Guarantee check: the genuinely heavy item still survives, and each
    partition emits at most k survivors even though its single batch
    carries ~7000 distinct values >> k."""
    k = 4
    # 12_000 rows in ONE partition / one Arrow batch: hot 5000x,
    # 7000 distinct singletons — multiple 4096-row chunks, every chunk
    # overflowing k so the intra-batch decrement fires repeatedly.
    rows = ["hot"] * 5000 + [f"u{i}" for i in range(7000)]
    rows = [s for _, s in sorted(enumerate(rows), key=lambda p: (p[0] * 104729) % len(rows))]
    df = spark.createDataFrame([(r,) for r in rows], "item string").coalesce(1)
    got = {r.item for r in misra_gries_candidates(df, "item", k).collect()}
    assert "hot" in got, "heavy item lost by chunked trimming"
    assert len(got) <= k, f"partition emitted {len(got)} > k survivors"
