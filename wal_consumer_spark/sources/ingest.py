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
