"""Frequency sketches for heavy-hitter estimation at 100 TB (complements the
built-in HLL `approx_count_distinct` and KLL-style `percentile_approx`
already used in the agg_* queries).

Count-min sketch as pure DataFrame ops: the sketch is a (depth x width)
counts table built with one groupBy — mergeable across partitions/days by
summing cells, O(depth*width) memory regardless of key cardinality. Point
estimates join the sketch back on the hashed cells and take the min across
rows (the classic CM upper-bound estimate: always >= true count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, key: str, depth: int = 3, width: int = 256
) -> DataFrame:
    """Build the sketch: one row per non-empty (row_idx, bucket) cell.

    One wide groupBy on (row, bucket) — at scale this is a single shuffle of
    at most depth*width cells after partial aggregation, independent of the
    number of distinct keys.
    """
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("cms_row")
    return (
        df.select(F.col(key).alias("k"))
        .select("k", rows)
        .withColumn("cms_bucket", F.pmod(F.xxhash64("k", "cms_row"), F.lit(width)))
        .groupBy("cms_row", "cms_bucket")
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key: str, depth: int = 3, width: int = 256
) -> DataFrame:
    """Point-estimate each key in `keys`: min over the key's depth cells.
    Returns (key, est_count); est_count >= true count always, and
    overestimates only on hash collisions (error <= N/width w.h.p.)."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("cms_row")
    probes = (
        keys.select(F.col(key).alias("k"))
        .distinct()
        .select("k", rows)
        .withColumn("cms_bucket", F.pmod(F.xxhash64("k", "cms_row"), F.lit(width)))
    )
    return (
        probes.join(sketch, ["cms_row", "cms_bucket"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce("cell_count", F.lit(0))).alias("est_count"))
        .select(F.col("k").alias(key), "est_count")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width, hash): cell-wise sum.
    CM sketches are a commutative monoid, so per-day / per-partition sketches
    roll up exactly like the incremental-rollup partials
    (streaming/incremental.py) — merged estimates are identical to a sketch
    built over the concatenated input."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("cms_row", "cms_bucket").agg(
        F.sum("cell_count").alias("cell_count")
    )


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Misra-Gries heavy-hitter CANDIDATE set with ``k`` counters per
    partition stream: one column ``item`` holding every value whose true
    global count can reach ``ceil(n/k)``.

    The per-partition pass is the MERGEABLE-summaries formulation
    (Agarwal et al., PODS'12): each Arrow batch is folded in CHUNKS of
    ``max(4k, 4096)`` rows via exact ``value_counts`` (vectorized — no
    per-row Python), and whenever the counter table exceeds ``k`` entries
    the (k+1)-th largest count is subtracted from every counter and
    non-positive ones are dropped — the classic decrement step batched.
    Trimming per CHUNK (not per whole Arrow batch) bounds transient
    memory at O(k + chunk_rows) even when one Arrow batch carries
    millions of distinct values; the guarantee is trim-frequency
    independent — every decrement subtracts its cut from >= k+1 counters
    that each hold >= cut, so the cuts sum to <= n_p/(k+1) no matter how
    often they fire. Each summary therefore under-counts any item by at
    most n_p/(k+1) of the n_p rows it saw; under-counts add across
    partitions, so the UNION of per-partition survivor sets contains
    every item with global count > n/(k+1) — in particular every item
    with count >= ceil(n/k). The union is at most #partitions * k rows
    regardless of domain size: the candidate pruning that lets a 100 TB
    stream find frequent items with ONE narrow recount shuffle instead
    of a full-domain groupBy.

    Callers must verify candidates with an exact recount (semi-join +
    count) — this function guarantees no false NEGATIVES above the
    threshold, not exact counts.
    """
    chunk_rows = max(4 * k, 4096)

    def fold(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for lo in range(0, len(pdf), chunk_rows):
                for item, cnt in (
                    pdf[col].iloc[lo : lo + chunk_rows].value_counts().items()
                ):
                    counters[item] = counters.get(item, 0) + int(cnt)
                if len(counters) > k:
                    # batched decrement: subtract the (k+1)-th largest count
                    cut = sorted(counters.values(), reverse=True)[k]
                    counters = {
                        i: c - cut for i, c in counters.items() if c - cut > 0
                    }
        yield pd.DataFrame({"item": pd.Series(list(counters), dtype="object")})

    field = df.schema[col]
    return (
        df.select(col)
        .mapInPandas(fold, f"item {field.dataType.simpleString()}")
        .distinct()
    )
