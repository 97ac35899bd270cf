"""Scale-adaptive input spreading for CPU-dense per-row pipelines.

The engine's expensive per-row work (interpreted higher-order expressions:
shingling, MinHash permutation folds, in-row pair generation) runs at the
parallelism of whatever frame feeds it. At production scale that frame is a
scan with thousands of splits and nothing needs fixing; on a small input —
a single-row-group parquet file (always 1 scan task regardless of cores) or
an AQE-coalesced aggregate output (1-2 partitions when the byte volume is
tiny) — the whole pipeline serializes onto one or two cores of an otherwise
idle cluster.

``spread_small_input`` is the one shared gate for that fix: repartition to
the cluster's default parallelism ONLY when the input's partition count is
below it. The condition makes the operator a no-op in the 100 TB case (no
extra exchange is ever added to a well-partitioned input), so the plan stays
scale-safe while local/bench runs get full-width parallelism. This is the
operator-level analogue of AQE's coalescing, in the opposite direction:
AQE shrinks over-partitioned exchanges by BYTES; this widens
under-partitioned inputs by CPU, which byte-based heuristics cannot see
(guide §2: partitioning should be scale-adaptive, not tuned constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition `df` by `key_cols` (round-robin when no keys) to
    the cluster's default parallelism, iff its current partition count is
    lower. Keyed spreading lets a downstream groupBy/join on the same keys
    reuse the exchange (guide §2.4); keyless spreading is for pipelines
    with no downstream key (pure per-row explode/compute stages).

    Results are unaffected: every consumer in this repo is partitioning-
    independent (exact aggregates / joins), and the same rows flow through
    either way.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Static partition count of the un-executed plan, read via df.rdd —
    # note this forces physical planning of `df` on every call (cheap for
    # the narrow frames below, but not free). Exact for the three shapes
    # this gate is used on (ADVICE r12: keep this contract list in sync
    # with call sites): scans (split count), localCheckpoint'ed frames
    # (materialized partition count), and narrow post-broadcast-join
    # frames (a broadcast join adds no exchange, so the count is inherited
    # from the probe-side scan — the analytics_market_basket shape).
    # Shuffle-derived frames report the configured shuffle partition count
    # and correctly skip the spread.
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
