"""Independent first-principles Python oracles for round-8 operators.

The driver gate (and tests/test_parity.py) compare each Spark query against
its DuckDB oracle — but a bug mirrored into BOTH engines' shared
formulation would pass that gate. These tests recompute each operator's
result from scratch in plain Python over the raw parquet, with no shared
SQL text and no shared helper code.
"""

from __future__ import annotations

import pandas as pd
import pytest

from wal_consumer_spark.plans import all_specs

SF = "/root/testdata/sf0.001"
GAP_US = 30 * 60 * 1_000_000


def _py_sessions(events: pd.DataFrame) -> list[tuple[int, int, int, int]]:
    """Pure-Python sessionizer: per user, sort timestamps, split on
    > 30 min gaps, DROP the final (still-open) session."""
    out: list[tuple[int, int, int, int]] = []
    for uid, grp in events.groupby("user_id"):
        ts = sorted(int(t.value) // 1000 for t in grp["ts"])  # ns -> us
        sessions: list[list[int]] = []
        for t in ts:
            if not sessions or t - sessions[-1][1] > GAP_US:
                sessions.append([t, t, 1])
            else:
                sessions[-1][1] = t
                sessions[-1][2] += 1
        for s in sessions[:-1]:  # final session never emitted
            out.append((int(uid), s[0], s[1], s[2]))
    return sorted(out)


def test_stateful_sessionize_matches_pure_python(spark):
    """The applyInPandasWithState streaming sessionizer must agree with a
    from-scratch Python gaps-and-islands sessionization of the same
    parquet — closed sessions only, exact timestamps and counts."""
    events = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    expected = _py_sessions(events)

    got = all_specs()["stream_stateful_sessionize"].spark(spark, SF).collect()
    actual = sorted(
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in got
    )
    assert len(actual) > 0
    assert actual == expected


def test_stateful_sessionize_crosses_batch_boundaries(spark):
    """The 4-file replay must actually exercise cross-batch state: at
    least one emitted session's start and end fall in DIFFERENT ts-range
    quartiles (i.e. the open session was carried in GroupState across a
    micro-batch boundary and closed later)."""
    events = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    us = events["ts"].astype("int64") // 1000
    lo, hi = int(us.min()), int(us.max())
    step = (hi - lo) // 4 + 1

    def quartile(t: int) -> int:
        return (t - lo) // step

    got = all_specs()["stream_stateful_sessionize"].spark(spark, SF).collect()
    spanning = [
        r for r in got if quartile(r.session_start_us) != quartile(r.session_end_us)
    ]
    assert spanning, (
        "no session spans a micro-batch boundary — the replay would not "
        "be testing cross-batch GroupState at all"
    )
