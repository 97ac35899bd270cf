"""Batch CDC apply: the reference's consume loop semantics as set operations.

Reference semantics (SURVEY.md §2.A R5-R11): drain WAL records in `id` order,
applying ADD/UPDATE/DELETE per `entity_id` to a keyed target, at-least-once
with idempotent replay. Per SURVEY.md §4.3 the engine guarantees
**per-entity_id order** — ops on different keys commute — so a batch of WAL
records reduces to the last op per key (by `id`) and applies as one MERGE:

- WHEN MATCHED AND op = DELETE  -> delete      (WalConsumerTest.java:114-116)
- WHEN MATCHED AND op != DELETE -> update      (WalConsumerTest.java:121-124)
- WHEN NOT MATCHED AND op != DELETE -> insert  (WalConsumerTest.java:117-120)

Expressed Spark-first as anti-join + union (no row-at-a-time loop); both
sides shuffle once on the key, and the WAL batch side is typically small
enough for a broadcast anti-join at micro-batch cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wal_consumer_spark.schema import Operation

TARGET_COLS = ("entity_id", "entity_bytes", "entity_type")


def last_op_per_key(
    wal_df: DataFrame, key: str = "entity_id", order: str = "id"
) -> DataFrame:
    """Reduce a WAL batch to the latest operation per key (by WAL id).

    This is the per-key equivalent of the reference's sequential head
    processing (WalConsumer.java:157-165): applying ops k1..kn in id order
    leaves the state of key k equal to the effect of k's last op alone.
    """
    w = Window.partitionBy(key).orderBy(F.col(order).desc())
    return (
        wal_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc_batch(
    target: DataFrame, wal_batch: DataFrame, key: str = "entity_id"
) -> DataFrame:
    """Apply a WAL batch to the keyed target; returns the new target state."""
    last = last_op_per_key(wal_batch, key=key)
    untouched = target.join(last.select(key), on=key, how="left_anti")
    upserts = last.filter(F.col("operation") != Operation.DELETE).select(
        key, "entity_bytes", "entity_type"
    )
    return untouched.unionByName(upserts)


def count_already_applied(
    target: DataFrame, wal_batch: DataFrame, key: str = "entity_id"
) -> int:
    """R10 idempotency observability (WalConsumer.java:271-278): how many
    upserts in this batch are no-ops because the target already holds the
    identical payload (i.e. the record was applied before a replay)."""
    last = last_op_per_key(wal_batch, key=key).filter(
        F.col("operation") != Operation.DELETE
    )
    return (
        last.join(
            target.select(key, F.col("entity_bytes").alias("__tgt_bytes")), on=key
        )
        .filter(F.col("entity_bytes") == F.col("__tgt_bytes"))
        .count()
    )
