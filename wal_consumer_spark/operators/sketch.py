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
