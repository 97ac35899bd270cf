"""SparkSession factory tuned for the engine.

Local testing runs on local[$SPARK_GRAFT_CPUS]; the configs below are chosen
so the same logical plans scale to a multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting) so shuffle partition counts
  self-tune at 100 TB instead of being hand-fixed for the test scale.
- Arrow on for the (few) Pandas-UDF paths.
- Session time zone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-location independent.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_shipped_for: set[int] = set()


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    Any Pandas-UDF / mapInPandas closure that references package symbols is
    unpickled on workers, which import the module by name — the driver's
    sys.path doesn't travel. A zip of the package distributed through
    SparkContext covers arbitrary launch directories (incl. the grading
    driver's). Idempotent per SparkContext."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped_for:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    staging = os.path.join(tempfile.gettempdir(), "wal_consumer_spark_pyfiles")
    os.makedirs(staging, exist_ok=True)
    zip_base = os.path.join(staging, "wal_consumer_spark")
    zip_path = shutil.make_archive(zip_base, "zip", os.path.dirname(pkg_dir), "wal_consumer_spark")
    sc.addPyFile(zip_path)
    _shipped_for.add(key)


def get_spark(
    app_name: str = "wal-consumer-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Parallelism floor for AQE coalescing. The default 1m floor is an
        # IO-oriented heuristic: it assumes a task that reads <1 MB is not
        # worth scheduling. The engine's reduce stages are frequently
        # CPU-dense over FEW bytes (interpreted higher-order expressions:
        # shingling, MinHash permutations, in-row pair generation), where
        # byte-based coalescing squeezes a 32-core host down to 2-4 tasks.
        # 64k keeps those stages at the cluster's parallelism while staying
        # inert at scale (any real-scale partition is far above 1 MB, so
        # the floor never engages there; advisory target size unchanged).
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
