"""Regression tests for the time-series resample queries' as-of payload
semantics: value and timestamp must travel atomically (one struct), so a
NULL-valued observation can never pair an older value with a newer
timestamp (code-review r2 finding on ts_resample_locf/interp)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from wal_consumer_spark.operators.asof import asof_join


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_asof_struct_payload_carries_atomically(spark):
    """Right rows (t1, v=5.0) then (t2, v=NULL): the as-of match at t3 > t2
    must return the WHOLE newest row (ts=t2, v=NULL) — per-column
    last(ignorenulls) carries would desync to (ts=t2, v=5.0), which is a row
    that never existed."""
    grid = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:03:00"))], "user_id int, grid_ts timestamp"
    )
    obs = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:01:00"), 5.0),
            (1, _ts("2024-01-01T00:02:00"), None),
        ],
        "user_id int, ts timestamp, v double",
    ).withColumn("obs", F.struct(F.col("ts").alias("ts"), F.col("v").alias("v")))

    out = asof_join(
        grid,
        obs.select("user_id", "ts", "obs"),
        left_key="user_id",
        right_key="user_id",
        left_ts="grid_ts",
        right_ts="ts",
        payload_cols=["obs"],
    ).select(F.col("obs.ts").alias("obs_ts"), F.col("obs.v").alias("obs_v"))

    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["obs_ts"] == _ts("2024-01-01T00:02:00")
    assert rows[0]["obs_v"] is None  # newest row's value, even though NULL


def test_isotonic_calibration_properties(spark):
    """The antitonic fit must be (a) non-increasing across bins, (b) a
    weighted-mean-preserving pooling of raw rates: on every maximal run
    of constant fitted value, the weighted average of raw rates equals
    the fitted value (the PAV pooling invariant), and fitted == raw on
    singleton runs."""
    from tests.conftest import SF_ORACLE
    from wal_consumer_spark.plans.analytics import ml_isotonic_calibration

    rows = sorted(
        ml_isotonic_calibration(spark, SF_ORACLE).collect(),
        key=lambda r: r.bin,
    )
    fitted = [r.fitted_rate for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(fitted, fitted[1:])), fitted
    # pooling invariant per constant-run
    i = 0
    while i < len(rows):
        j = i
        while j + 1 < len(rows) and abs(fitted[j + 1] - fitted[i]) < 1e-9:
            j += 1
        n = sum(r.n for r in rows[i : j + 1])
        pos = sum(r.pos for r in rows[i : j + 1])
        assert abs(pos / n - fitted[i]) < 2e-6, (i, j, pos / n, fitted[i])
        i = j + 1
