"""Seeded fuzz of watermark / late-data semantics (VERDICT r10 "Next
round" #6): random (case_id, key, ts) streams with controlled event-time
disorder, run through a tumbling-window aggregation and a streaming
dropDuplicates under `withWatermark`, checked against a lateness-aware
Python oracle.

The CDC property test randomizes batching; nothing before this randomized
event-time DISORDER — the dimension where Structured Streaming semantics
are subtlest (SURVEY.md §2.B flags watermarks). Design choices that make
a 100-case fuzz both fast and exactly decidable:

- **Composite stream.** All 100 scenarios ride ONE stream as `case_id`
  groups; the watermark is global (max event time across cases), which
  the oracle models globally. Two sources + two queries total, not 200.
- **Restart at every batch boundary.** Within a run, late-row filtering
  is best-effort (see test_streaming_ext.test_watermark_drops_late_data);
  across a restart the watermark comes from the checkpoint and the
  contract is guaranteed. Each batch file is written, then the query runs
  `availableNow` to termination from the same checkpoint — so the oracle
  can assert exact results, not bounds.
- **Strictness-proof timestamps.** All event times land on EVEN seconds;
  the watermark delay is 1801 s (odd); window bounds are multiples of
  900 s. Therefore no event time, window bound, or watermark value ever
  collides, and `<` vs `<=` in Spark's internal predicates cannot change
  any outcome the oracle depends on.
- **Sentinel flush.** Two far-future sentinel batches close every real
  window at the end, so append-mode emission completeness is part of
  what's checked.

Oracle semantics (pinned empirically on Spark 4.1 by
test_probe_late_filter_is_window_end below — a late-but-open-window row
IS merged):

- watermark before batch i: W_i = max(event ts in batches < i) - delay
  (-inf for i = 0);
- windowed aggregation drops an input row iff its WINDOW END <= W_i
  (a row whose ts < W_i but whose window is still open is merged);
- a window is emitted (append mode) by the first run whose watermark
  >= window end, and never re-opens;
- streaming dropDuplicates applies the watermark ONLY when the
  event-time column is part of the dedup key (probed: without ts in
  the key, late rows are neither filtered nor is state ever evicted —
  the watermark is inert). With ts in the key, an input row with
  ts <= W_i is dropped BEFORE the state lookup and state keys evict
  past the watermark. Duplicate arrivals in this fuzz reuse the key's
  canonical ts, so a key emits exactly once iff its EARLIEST-batch
  arrival was non-late: a post-eviction re-arrival carries the evicted
  ts and is therefore itself late (watermark monotonicity), never
  re-emitted;
- session windows (probed by test_probe_session_window_semantics):
  each input row's OWN prospective window [ts, ts+gap) is the late
  unit — the row is dropped iff ts+gap <= W_i, even when an open
  session it would have extended still exists; surviving rows merge
  with open state sessions (incl. across restarts) on interval
  OVERLAP; a session evicted at end <= W never re-opens, so a later
  non-late overlapping row starts a NEW session (the output may hold
  overlapping per-key sessions across emissions — correct, and the
  oracle reproduces it by simulating batch-by-batch). The session arm
  uses its own parity triple (even ts, ODD 601 s gap, even 1800 s
  delay) so session ends collide with neither event times (no
  merge-adjacency ambiguity) nor watermark values.
"""

from __future__ import annotations

import random
from collections import Counter
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

SEED = 20260816
N_CASES = 100
N_BATCHES = 5
DELAY_SEC = 1801  # odd on purpose — see module docstring
WINDOW_SEC = 900
BASE = datetime(2024, 3, 1, 0, 0, 0)
BATCH_SPAN = 5400  # each batch's fresh events sit ~90 min apart
FRESH_JITTER = 7200
LATE_FRACTION = 0.15


def _even(n: int) -> int:
    return n - (n % 2)


def _ts(off_sec: int) -> datetime:
    return BASE + timedelta(seconds=_even(off_sec))


def _fresh_or_late(rng: random.Random, batch: int) -> datetime:
    if batch > 0 and rng.random() < LATE_FRACTION:
        # deliberately back-dated: lands before this batch's fresh span,
        # possibly (not necessarily) behind the global watermark
        return _ts(rng.randrange(0, batch * BATCH_SPAN))
    return _ts(batch * BATCH_SPAN + rng.randrange(0, FRESH_JITTER))


def _gen_window_events(rng: random.Random):
    """[(batch, case_id, ts)] — every event independent."""
    events = []
    for case in range(N_CASES):
        for _ in range(rng.randint(6, 14)):
            b = rng.randrange(N_BATCHES)
            events.append((b, case, _fresh_or_late(rng, b)))
    return events


def _gen_dedup_events(rng: random.Random):
    """[(batch, case_id, key, ts)] — duplicate arrivals of a (case, key)
    reuse its canonical ts (keeps the stored-state ts deterministic)."""
    events = []
    for case in range(N_CASES):
        for key in range(rng.randint(2, 6)):
            batches = sorted(
                rng.randrange(N_BATCHES) for _ in range(rng.randint(1, 4))
            )
            canon = _fresh_or_late(rng, batches[0])
            for b in batches:
                events.append((b, case, key, canon))
    return events


def _watermarks(
    events_ts_by_batch: dict[int, list[datetime]],
    n_runs: int,
    delay_sec: int = DELAY_SEC,
):
    """W_i for each run i (the checkpoint-restored watermark the i-th run
    starts with): max event ts over all prior batches minus the delay."""
    wms = []
    seen_max: datetime | None = None
    for i in range(n_runs):
        wms.append(
            None if seen_max is None
            else seen_max - timedelta(seconds=delay_sec)
        )
        for t in events_ts_by_batch.get(i, []):
            if seen_max is None or t > seen_max:
                seen_max = t
    return wms


def _window_start(ts: datetime) -> datetime:
    off = int((ts - BASE).total_seconds())
    return BASE + timedelta(seconds=(off // WINDOW_SEC) * WINDOW_SEC)


def _run_stream(spark, build, ckpt: str) -> None:
    q = build().trigger(availableNow=True).start()
    q.awaitTermination()


@pytest.mark.parametrize("kind", ["window_agg", "dedup"])
def test_watermark_fuzz_100_cases(spark, tmp_path, kind):
    rng = random.Random(SEED if kind == "window_agg" else SEED + 1)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    if kind == "window_agg":
        events = _gen_window_events(rng)
        by_batch: dict[int, list] = {}
        for b, case, ts in events:
            by_batch.setdefault(b, []).append((case, ts))

        def build():
            stream = (
                spark.readStream.schema("case_id LONG, ts TIMESTAMP")
                .parquet(src)
                .withWatermark("ts", f"{DELAY_SEC} seconds")
                .groupBy("case_id", F.window("ts", f"{WINDOW_SEC} seconds"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select(
                    "case_id", F.col("window.start").alias("ws"), "n"
                )
            )
            return (
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
            )

        def rows_for_batch(i: int):
            return [(c, t) for c, t in by_batch.get(i, [])]

        schema = "case_id LONG, ts TIMESTAMP"
        sentinel = lambda ts: [(-1, ts)]  # noqa: E731
    else:
        events4 = _gen_dedup_events(rng)
        by_batch = {}
        for b, case, key, ts in events4:
            by_batch.setdefault(b, []).append((case, key, ts))

        def build():
            stream = (
                spark.readStream.schema(
                    "case_id LONG, k LONG, ts TIMESTAMP"
                )
                .parquet(src)
                .withWatermark("ts", f"{DELAY_SEC} seconds")
                # ts IS part of the dedup key: only then does the
                # watermark filter late rows and evict state (probed —
                # see module docstring); duplicates still collapse
                # because they reuse the key's canonical ts
                .dropDuplicates(["case_id", "k", "ts"])
                .select("case_id", "k")
            )
            return (
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
            )

        def rows_for_batch(i: int):
            return list(by_batch.get(i, []))

        schema = "case_id LONG, k LONG, ts TIMESTAMP"
        sentinel = lambda ts: [(-1, -1, ts)]  # noqa: E731

    # ---- drive: one file per run, restart from checkpoint every time ----
    flush1 = BASE + timedelta(days=10)
    flush2 = BASE + timedelta(days=20)
    ts_by_batch = {
        i: [r[-1] for r in rows_for_batch(i)] for i in range(N_BATCHES)
    }
    ts_by_batch[N_BATCHES] = [flush1]
    ts_by_batch[N_BATCHES + 1] = [flush2]
    n_runs = N_BATCHES + 2
    wms = _watermarks(ts_by_batch, n_runs)

    for i in range(n_runs):
        if i < N_BATCHES:
            rows = rows_for_batch(i)
        else:
            rows = sentinel(flush1 if i == N_BATCHES else flush2)
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("append").parquet(src)
        _run_stream(spark, build, ckpt)

    got = spark.read.parquet(out).where(F.col("case_id") >= 0)

    # ---- lateness-aware oracle ----
    if kind == "window_agg":
        expected: Counter = Counter()
        for i in range(N_BATCHES):
            w = wms[i]
            for case, ts in by_batch.get(i, []):
                wend = _window_start(ts) + timedelta(seconds=WINDOW_SEC)
                if w is not None and wend <= w:
                    continue  # dropped: window already past the watermark
                expected[(case, _window_start(ts))] += 1
        got_rows = sorted(
            (r.case_id, r.ws.isoformat(), r.n) for r in got.collect()
        )
        exp_rows = sorted(
            (case, ws.isoformat(), n)
            for (case, ws), n in expected.items()
        )
        assert got_rows == exp_rows
        # sanity on coverage: the fuzz must actually exercise lateness
        n_late = sum(
            1
            for i in range(N_BATCHES)
            for _, ts in by_batch.get(i, [])
            if wms[i] is not None
            and _window_start(ts) + timedelta(seconds=WINDOW_SEC) <= wms[i]
        )
        assert n_late >= 20, f"fuzz generated only {n_late} late rows"
    else:
        first_arrival: dict[tuple[int, int], tuple[int, datetime]] = {}
        for i in range(N_BATCHES):
            for case, key, ts in by_batch.get(i, []):
                first_arrival.setdefault((case, key), (i, ts))
        exp_keys = sorted(
            (case, key)
            for (case, key), (i, ts) in first_arrival.items()
            if wms[i] is None or ts >= wms[i]
        )
        got_keys = sorted((r.case_id, r.k) for r in got.collect())
        assert got_keys == exp_keys
        n_late_keys = len(first_arrival) - len(exp_keys)
        assert n_late_keys >= 5, (
            f"fuzz generated only {n_late_keys} late-first-arrival keys"
        )


def test_probe_dedup_watermark_needs_ts_in_key(spark, tmp_path):
    """Pins the oracle's dropDuplicates semantics on this Spark version:

    - WITHOUT the event-time column in the dedup key, the watermark is
      inert — a row far behind the watermark is still emitted (and state
      never evicts);
    - WITH ts in the key, a late input row (ts <= W) is dropped BEFORE
      the state lookup, even when its key was never seen.

    If a Spark upgrade changes either behavior, this fails before the
    fuzz does."""
    for with_ts, expect in [(False, [1, 2, 3]), (True, [1, 2])]:
        base = tmp_path / ("k_ts" if with_ts else "k_only")
        src, out, ckpt = str(base / "s"), str(base / "o"), str(base / "c")
        keys = ["k", "ts"] if with_ts else ["k"]

        def run():
            s = (
                spark.readStream.schema("k LONG, ts TIMESTAMP")
                .parquet(src)
                .withWatermark("ts", "0 seconds")
                .dropDuplicates(keys)
                .select("k")
            )
            q = (
                s.writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append").trigger(availableNow=True).start()
            )
            q.awaitTermination()

        def write(rows):
            df = spark.createDataFrame(rows, "k LONG, ts STRING")
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            df.coalesce(1).write.mode("append").parquet(src)

        write([(1, "2024-01-01 00:00:00"), (2, "2024-01-01 10:00:00")])
        run()
        # restart with W = 10:00: key 3 is NEW but 5 h late
        write([(3, "2024-01-01 05:00:00")])
        run()
        got = sorted(r.k for r in spark.read.parquet(out).collect())
        assert got == expect, (
            f"dropDuplicates(ts_in_key={with_ts}) emitted {got}, "
            f"expected {expect} — the fuzz oracle's dedup semantics no "
            "longer match this Spark version"
        )


def test_probe_late_filter_is_window_end(spark, tmp_path):
    """Pins the oracle's windowed-aggregation late predicate on this Spark
    version: a restart-delivered row with ts BEHIND the watermark but whose
    window is STILL OPEN (window end > watermark) must be MERGED, not
    dropped — i.e. the filter is `window.end <= W`, not `ts < W`. If a
    Spark upgrade ever flips this, this probe fails before the fuzz does."""
    src = str(tmp_path / "probe")
    ckpt = str(tmp_path / "probe_ckpt")
    out = str(tmp_path / "probe_out")

    def run():
        stream = (
            spark.readStream.schema("event_id LONG, ts TIMESTAMP")
            .parquet(src)
            .withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "n")
        )
        q = (
            stream.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    def write(rows):
        df = spark.createDataFrame(rows, "event_id LONG, ts STRING")
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df.coalesce(1).write.mode("append").parquet(src)

    # run 1: watermark advances to 00:30 (delay 0); window [00:00, 01:00)
    # stays OPEN (end 01:00 > 00:30)
    write([(1, "2024-01-01 00:30:00")])
    run()
    # run 2 (restarted, W = 00:30): ts 00:10 is BEHIND the watermark but
    # its window is open -> must merge; also advance W past 01:00
    write([(2, "2024-01-01 00:10:00"), (3, "2024-01-01 01:30:00")])
    run()
    # run 3: close everything
    write([(4, "2024-01-01 03:00:00")])
    run()

    got = {
        r.ws.isoformat(): r.n
        for r in spark.read.parquet(out).collect()
    }
    assert got.get("2024-01-01T00:00:00") == 2, (
        f"late-but-open-window row was not merged: {got} — the oracle's "
        "window.end<=W late predicate no longer matches this Spark version"
    )


# --------------------------------------------------------------------------
# Session windows: the merging-window stateful operator, fuzzed under the
# same composite-stream + restart-per-batch harness. Parity triple: even
# event seconds, ODD 601 s gap (session ends collide with no event time —
# merge adjacency can never be an equality case), even 1800 s delay
# (watermark values collide with no odd session end).

SESSION_GAP_SEC = 601
SESSION_DELAY_SEC = 1800


def test_probe_session_window_semantics(spark, tmp_path):
    """Pins the oracle's session-window semantics on this Spark version:

    - a restart-delivered row whose OWN window [ts, ts+gap) has
      end <= W is dropped, even as a replay of an already-emitted
      session (no re-open, no double count);
    - a row with ts < W but ts+gap > W is KEPT (per-row window-end
      late predicate, like the tumbling probe);
    - an open session extends across a restart (state-restore merge).
    """
    src = str(tmp_path / "s")
    out = str(tmp_path / "o")
    ckpt = str(tmp_path / "c")

    def run():
        s = (
            spark.readStream.schema("k LONG, ts TIMESTAMP")
            .parquet(src)
            .withWatermark("ts", "0 seconds")
            .groupBy(F.session_window("ts", "10 minutes"), "k")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "k",
                F.col("session_window.start").alias("ws"),
                F.col("session_window.end").alias("we"),
                "n",
            )
        )
        q = (
            s.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    def write(rows):
        df = spark.createDataFrame(rows, "k LONG, ts STRING")
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df.coalesce(1).write.mode("append").parquet(src)

    # run 1: key1 session [00:00, 00:10); key5 open session at 00:28;
    # watermark advances to 00:30
    write([
        (1, "2024-01-01 00:00:00"),
        (5, "2024-01-01 00:28:00"),
        (9, "2024-01-01 00:30:00"),
    ])
    run()
    # run 2 (restart, W = 00:30):
    #  - key1 replay at 00:05 -> own window end 00:15 <= W: DROPPED
    #  - key2 new at 00:25 -> end 00:35 > W: KEPT despite ts < W
    #  - key5 at 00:33 -> merges the restored open session [00:28, 00:38)
    write([
        (1, "2024-01-01 00:05:00"),
        (2, "2024-01-01 00:25:00"),
        (5, "2024-01-01 00:33:00"),
    ])
    run()
    # run 3: close everything
    write([(4, "2024-01-01 03:00:00")])
    run()

    got = sorted(
        (r.k, r.ws.isoformat(), r.we.isoformat(), r.n)
        for r in spark.read.parquet(out).collect()
        if r.k != 4
    )
    assert got == [
        (1, "2024-01-01T00:00:00", "2024-01-01T00:10:00", 1),
        (2, "2024-01-01T00:25:00", "2024-01-01T00:35:00", 1),
        (5, "2024-01-01T00:28:00", "2024-01-01T00:43:00", 2),
        (9, "2024-01-01T00:30:00", "2024-01-01T00:40:00", 1),
    ], f"session semantics moved under the oracle: {got}"


def test_session_window_fuzz_100_cases(spark, tmp_path):
    rng = random.Random(SEED + 2)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    gap = timedelta(seconds=SESSION_GAP_SEC)

    events = _gen_window_events(rng)
    by_batch: dict[int, list] = {}
    for b, case, ts in events:
        by_batch.setdefault(b, []).append((case, ts))

    def build():
        stream = (
            spark.readStream.schema("case_id LONG, ts TIMESTAMP")
            .parquet(src)
            .withWatermark("ts", f"{SESSION_DELAY_SEC} seconds")
            .groupBy(
                "case_id",
                F.session_window("ts", f"{SESSION_GAP_SEC} seconds"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "case_id",
                F.col("session_window.start").alias("ws"),
                F.col("session_window.end").alias("we"),
                "n",
            )
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
        )

    flush1 = BASE + timedelta(days=10)
    flush2 = BASE + timedelta(days=20)
    ts_by_batch = {
        i: [ts for _, ts in by_batch.get(i, [])] for i in range(N_BATCHES)
    }
    ts_by_batch[N_BATCHES] = [flush1]
    ts_by_batch[N_BATCHES + 1] = [flush2]
    n_runs = N_BATCHES + 2
    wms = _watermarks(ts_by_batch, n_runs + 1, delay_sec=SESSION_DELAY_SEC)

    for i in range(n_runs):
        if i < N_BATCHES:
            rows = list(by_batch.get(i, []))
        else:
            rows = [(-1, flush1 if i == N_BATCHES else flush2)]
        df = spark.createDataFrame(rows, "case_id LONG, ts TIMESTAMP")
        df.coalesce(1).write.mode("append").parquet(src)
        _run_stream(spark, build, ckpt)

    # ---- batch-by-batch oracle (probed semantics; module docstring) ----
    state: dict[int, list[list]] = {}
    emitted: list[tuple] = []
    n_late = 0
    for i in range(n_runs):
        w = wms[i]
        if i < N_BATCHES:
            rows = list(by_batch.get(i, []))
        else:
            rows = [(-1, flush1 if i == N_BATCHES else flush2)]
        for case, ts in rows:
            if w is not None and ts + gap <= w:
                n_late += 1
                continue
            sessions = state.setdefault(case, [])
            cur = [ts, ts + gap, 1]
            merged = True
            while merged:
                merged = False
                for s in sessions:
                    if s[0] < cur[1] and cur[0] < s[1]:  # overlap
                        cur = [
                            min(s[0], cur[0]),
                            max(s[1], cur[1]),
                            s[2] + cur[2],
                        ]
                        sessions.remove(s)
                        merged = True
                        break
            sessions.append(cur)
        w2 = wms[i + 1]
        for case, sessions in state.items():
            for s in list(sessions):
                if s[1] <= w2:
                    emitted.append((case, s[0], s[1], s[2]))
                    sessions.remove(s)

    exp = sorted(
        (c, ws.isoformat(), we.isoformat(), n)
        for c, ws, we, n in emitted
        if c >= 0
    )
    got = sorted(
        (r.case_id, r.ws.isoformat(), r.we.isoformat(), r.n)
        for r in spark.read.parquet(out).collect()
        if r.case_id >= 0
    )
    assert got == exp
    # coverage: lateness and merging must both actually occur
    assert n_late >= 20, f"fuzz generated only {n_late} late rows"
    assert any(n >= 2 for _, _, _, n in exp), "no session ever merged"
