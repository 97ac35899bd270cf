"""Skew-handling join utilities (SCALE.md §2): AQE's skew-join splitting
covers sort-merge joins at runtime, but an *aggregation or join keyed on a
pathologically hot key* (the classic null-key / power-law entity) sometimes
needs explicit salting — these helpers make that a one-liner while keeping
results identical to the unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `key` with the left side's hot keys spread over
    `salt_buckets` partitions: left rows get a random-but-deterministic salt
    (hash of the full row id-ish columns mod buckets), the right side is
    replicated once per bucket, and the join key becomes (key, salt).

    Use when ONE side is large and skewed and the other is small enough to
    replicate `salt_buckets` times but too large to broadcast outright.
    Results are exactly the unsalted join's (each left row joins the single
    replica matching its salt) — for left-preserving joins only: under
    right/full outer, every unmatched RIGHT row would surface once per salt
    replica (salt_buckets null-extended duplicates), so those modes are
    rejected rather than silently wrong.
    """
    safe = {"inner", "left", "leftouter", "left_outer", "left_semi",
            "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join supports left-preserving joins only {sorted(safe)}; "
            f"got {how!r} — unmatched right rows would be duplicated once per "
            f"salt replica. Salt the right side / use AQE skew join instead."
        )
    salt = (F.spark_partition_id() + F.monotonically_increasing_id()) % salt_buckets
    lsalted = left.withColumn("__salt", salt.cast("int"))
    replicas = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    rsalted = right.withColumn("__salt", replicas)
    out = lsalted.join(rsalted, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count_per_key(
    df: DataFrame, key: str, salt_buckets: int = 64
) -> DataFrame:
    """Two-phase count for power-law keys: count per (key, salt) first, then
    sum per key — the first shuffle spreads each hot key over `salt_buckets`
    reducers instead of funnelling it into one. (Spark's partial aggregation
    already does this map-side; the explicit form matters when upstream
    partitioning defeats partial agg, e.g. straight after a repartition on
    another column.)"""
    salt = (F.spark_partition_id() + F.monotonically_increasing_id()) % salt_buckets
    return (
        df.withColumn("__salt", salt.cast("int"))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").cast("long").alias("n"))
    )
