"""Ingest-side writers for the 100 TB pipeline: partitioned layout with
bounded file counts (small-file compaction) and bucketed tables for
shuffle-free joins (see tests/test_scale_plans.py).

The reference's producer writes one WAL row per transaction
(TestWalEntityRepository.java:20-30); at Spark scale the equivalent concern
is file-grain: a stream of tiny commits must compact into scan-friendly
files or the namenode/scan-planner becomes the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def estimate_partitions(df: DataFrame, target_file_mb: int = 256) -> int:
    """Partition count that lands files near `target_file_mb` — estimated
    from the logical plan's size statistics (no extra pass over the data)."""
    stats_bytes = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n = int(stats_bytes) // (target_file_mb * 1024 * 1024) + 1
    return max(1, min(n, 100_000))


def write_compacted(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    target_file_mb: int = 256,
    mode: str = "overwrite",
) -> None:
    """Write parquet with a bounded file count per partition directory.

    - Without partition columns: one repartition to the size-derived count.
    - With partition columns: repartition BY those columns first so each
      output directory is written by few tasks (otherwise every task writes
      a sliver into every partition dir — the classic small-file explosion:
      tasks × partitions files).
    """
    n = estimate_partitions(df, target_file_mb)
    if partition_by:
        out = df.repartition(n, *[F.col(c) for c in partition_by])
        out.write.partitionBy(*partition_by).mode(mode).parquet(path)
    else:
        out = df.repartition(n)
        out.write.mode(mode).parquet(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    target_file_mb: int = 256,
    mode: str = "overwrite",
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-clustered layout: globally range-partition on the cluster keys,
    sort within each output file. Every parquet footer then carries a tight,
    pairwise-disjoint min/max range for the leading cluster key, so any
    point or range predicate on it prunes to the few files whose range
    intersects — the poor-man's Z-order that serves the 90% case (single
    leading key) with zero table-format dependencies. Compare
    `write_compacted(partition_by=...)`: directory partitioning prunes on
    LOW-cardinality keys at planning time; range clustering prunes on
    HIGH-cardinality keys (timestamps, ids) at footer-stats time — a
    100 TB fact table wants both (partition by day, cluster by ts within).

    Returns the repartitioned frame (pre-write) so callers/tests can
    assert the RangePartitioning plan shape."""
    n = num_partitions if num_partitions is not None else estimate_partitions(
        df, target_file_mb
    )
    out = df.repartitionByRange(n, *[F.col(c) for c in cluster_by]).sortWithinPartitions(
        *[F.col(c) for c in cluster_by]
    )
    out.write.mode(mode).parquet(path)
    return out
