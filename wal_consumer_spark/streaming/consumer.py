"""WalStreamConsumer: the reference's consume loop (WalConsumer.java:127-182)
re-expressed on Structured Streaming. Semantic mapping (SURVEY.md §2.A):

- R1  source           -> readStream over an append-only parquet WAL dir
- R2-R4 head lock/race -> replaced by checkpoint exclusivity: Spark allows
                          one active query per checkpoint dir, so mutual
                          exclusion needs no row lock (README.md:40-43's HA
                          claim maps to restart supervision)
- R5  callback         -> foreachBatch(apply); the callback receives the
                          per-key-reduced batch and applies it to the target
- R6-R8 ADD/UPDATE/DELETE -> apply_cdc_batch merge semantics
- R9  retry forever on IO failure (WalConsumer.java:259-269) -> retry loop
      inside foreachBatch with `sleep_on_io_failure` between attempts
- R10 idempotent-skip accounting (WalConsumer.java:271-278) -> pre-apply
      anti-diff against the target counts records whose payload is already
      present
- R11 exactly-once advance (WalHeadHandle.java:29-42) -> the batch commits
      to the checkpoint only after foreachBatch returns; a failure replays
      the whole batch (at-least-once, idempotent by R10)
- R12 empty-poll sleep (WalConsumer.java:150-154) -> processingTime trigger
- R13 source-failure backoff -> Spark task retry + restart supervision
- R14/R15 metrics -> ConsumerMetrics + WalQueryListener
- R16 start/close (WalConsumer.java:127-182, 299-317) -> query.start/stop
      with listener deregistration

Ordering (SURVEY.md §4.3): per-`entity_id` order is guaranteed — each batch
reduces to the last op per key by `id`, and files are consumed oldest-first
so later batches only carry larger ids. `strict_global_order=True` degrades
to a single partition for full-fidelity sequential apply.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wal_consumer_spark.operators.cdc import apply_cdc_batch, last_op_per_key
from wal_consumer_spark.sources.wal_source import read_wal_stream
from wal_consumer_spark.streaming.metrics import ConsumerMetrics, WalQueryListener, WalState

TARGET_SCHEMA = "entity_id LONG, entity_bytes BINARY, entity_type STRING"

#: consumers with a live query, for fail-fast checkpoint exclusivity (R2-R4)
_ACTIVE_CONSUMERS: set["WalStreamConsumer"] = set()


class ParquetKeyValueTarget:
    """Test/reference sink: a keyed state table persisted as parquet.

    Production deployments swap this for a transactional MERGE sink
    (Delta/Iceberg `MERGE INTO`) — same apply_cdc_batch semantics, but the
    swap-commit becomes the table format's atomic commit."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._version = 0

    def read(self) -> DataFrame:
        try:
            return self.spark.read.schema(TARGET_SCHEMA).parquet(f"{self.path}/v{self._version}")
        except Exception:
            return self.spark.createDataFrame([], TARGET_SCHEMA)

    def write(self, df: DataFrame) -> None:
        self._version += 1
        df.write.mode("overwrite").parquet(f"{self.path}/v{self._version}")


class WalStreamConsumer:
    """Drop-in engine equivalent of the reference's WalConsumer."""

    def __init__(
        self,
        spark: SparkSession,
        wal_dir: str,
        checkpoint_dir: str,
        target: ParquetKeyValueTarget,
        callback: Callable[[DataFrame], bool] | None = None,
        trigger_interval: str = "1 second",
        sleep_on_io_failure: float = 1.0,
        max_sync_retries: int | None = None,
        metric_prefix: str = "wal",
        strict_global_order: bool = False,
        max_files_per_trigger: int | None = None,
    ):
        self.spark = spark
        self.wal_dir = wal_dir
        self.checkpoint_dir = checkpoint_dir
        self.target = target
        self.callback = callback
        self.trigger_interval = trigger_interval
        self.sleep_on_io_failure = sleep_on_io_failure
        self.max_sync_retries = max_sync_retries
        self.metrics = ConsumerMetrics(prefix=metric_prefix)
        self.strict_global_order = strict_global_order
        self.max_files_per_trigger = max_files_per_trigger
        self._listener: WalQueryListener | None = None
        self.query = None

    # -- the foreachBatch body: ordered apply with retry + idempotency -----

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            self.metrics.set_state(WalState.EMPTY)
            return
        self.metrics.set_state(WalState.NOT_EMPTY)
        if self.strict_global_order:
            batch_df = batch_df.repartition(1).sortWithinPartitions("id")

        reduced = last_op_per_key(batch_df).persist()
        try:
            n_batch = reduced.count()
            current = self.target.read()
            # R10: upserts whose payload is already in the target were applied
            # before a replay -> count as ignored_already_done.
            already = (
                reduced.filter(F.col("operation") != "DELETE")
                .join(
                    current.select(
                        "entity_id", F.col("entity_bytes").alias("__tgt_bytes")
                    ),
                    "entity_id",
                )
                .filter(F.col("entity_bytes") == F.col("__tgt_bytes"))
                .count()
            )

            attempt = 0
            while True:  # R9: retry forever (bounded only if configured)
                try:
                    if self.callback is not None and not self.callback(reduced):
                        # callback returning False == "was already done"
                        # (WalEntityConsumerCallback.java:10-17)
                        self.metrics.num_ignored_already_done += n_batch
                        return
                    new_state = apply_cdc_batch(current, reduced)
                    self.target.write(new_state)
                    break
                except InterruptedError:
                    raise
                except Exception:
                    self.metrics.num_io_failures += 1
                    attempt += 1
                    if (
                        self.max_sync_retries is not None
                        and attempt > self.max_sync_retries
                    ):
                        raise
                    time.sleep(self.sleep_on_io_failure)

            self.metrics.num_ignored_already_done += already
            self.metrics.num_synchronized += n_batch - already
        finally:
            reduced.unpersist()

    # -- lifecycle (R16) ---------------------------------------------------

    def start(self, available_now: bool = False):
        """≙ WalConsumer.start() (WalConsumer.java:127-133): begins draining;
        available_now=True processes the current backlog then stops (used by
        tests; production uses the processingTime trigger = R12 poll)."""
        # R2-R4 mutual exclusion: the reference serializes consumers with a
        # SELECT ... FOR UPDATE row lock (WalConsumer.java:208-217); here a
        # checkpoint dir admits one active query. Spark enforces this lazily
        # (the second query dies at its first commit), so fail fast instead —
        # same guarantee, immediate error. Cross-process exclusion comes from
        # the checkpoint's commit-log semantics on HDFS-compatible storage.
        active_ckpts = {
            getattr(c, "_wcs_checkpoint", None)
            for c in _ACTIVE_CONSUMERS
            if c.query is not None and c.query.isActive
        }
        if self.checkpoint_dir in active_ckpts:
            raise RuntimeError(
                f"another WalStreamConsumer is active on checkpoint "
                f"{self.checkpoint_dir!r}; one consumer per checkpoint "
                "(single-consumer lock semantics)"
            )
        self._wcs_checkpoint = self.checkpoint_dir
        _ACTIVE_CONSUMERS.add(self)

        stream = read_wal_stream(self.spark, self.wal_dir, self.max_files_per_trigger)
        self._listener = WalQueryListener(self.metrics)
        self.spark.streams.addListener(self._listener)
        writer = stream.writeStream.foreachBatch(self._apply_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=self.trigger_interval)
        self.query = writer.start()
        return self.query

    def await_backlog_drained(self, timeout: float | None = None) -> None:
        self.query.awaitTermination(timeout)

    def close(self) -> None:
        """≙ WalConsumer.close() (WalConsumer.java:299-317): stop the query,
        deregister metrics listener."""
        if self.query is not None and self.query.isActive:
            self.query.stop()
        if self._listener is not None:
            self.spark.streams.removeListener(self._listener)
            self._listener = None
        _ACTIVE_CONSUMERS.discard(self)
