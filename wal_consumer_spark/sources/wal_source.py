"""WAL streaming source (SURVEY.md §1.4): an append-only directory of
parquet files with the fixed envelope schema. The `id` column carries the
producer-assigned total order (≙ WalEntity.id IDENTITY pk); Spark's file
source offsets + checkpoint replace the reference's destructive
delete-on-consume (WalHeadHandle.java:29-42) — "consumed" means the offset
is committed, the data is never mutated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wal_consumer_spark.schema import WAL_SCHEMA


def read_wal_stream(
    spark: SparkSession,
    wal_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(WAL_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # latestFirst stays False: WAL files must be consumed oldest-first so the
    # per-key id order inside each micro-batch is monotone across batches.
    return reader.parquet(wal_dir)


def read_wal_batch(spark: SparkSession, wal_dir: str) -> DataFrame:
    return spark.read.schema(WAL_SCHEMA).parquet(wal_dir)
