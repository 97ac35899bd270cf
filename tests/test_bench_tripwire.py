"""bench.py regression tripwire (VERDICT r5 "Next round" #6): a
comparable-41 query whose calibration-normalized median grows >1.5x over
the previous committed round must be flagged in the bench JSON — the
round-4 join_bloom_prefilter scare took a full round of measurement
archaeology; the tripwire makes it an automatic, same-session signal.

Pure-function tests (no Spark): regression_tripwire is fed synthetic
previous/current normalized blocks, including a deliberate regression.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    COMPARABLE_41,
    TRIPWIRE_RATIO,
    latest_committed_normalized,
    regression_tripwire,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_deliberate_regression_is_flagged():
    prev = {n: 1.0 for n in COMPARABLE_41}
    now = dict(prev)
    now["join_bloom_prefilter"] = 1.51  # just over the 1.5x fence
    out = regression_tripwire(now, prev)
    assert list(out["flagged"]) == ["join_bloom_prefilter"]
    row = out["flagged"]["join_bloom_prefilter"]
    assert row["ratio"] == 1.51
    assert out["threshold_ratio"] == TRIPWIRE_RATIO


def test_at_threshold_and_improvements_not_flagged():
    prev = {n: 2.0 for n in COMPARABLE_41}
    now = {n: 2.0 * TRIPWIRE_RATIO for n in COMPARABLE_41}  # exactly at fence
    now[COMPARABLE_41[0]] = 0.5  # a big improvement
    assert regression_tripwire(now, prev)["flagged"] == {}


def test_unknown_and_missing_queries_ignored():
    # new queries (absent from prev) and queries outside the frozen basis
    # never flag — the basis is COMPARABLE_41 only
    prev = {"tpch_q21_waiting_supplier": 1.0}
    now = {
        "tpch_q21_waiting_supplier": 1.2,
        "brand_new_query": 99.0,
        "dedup_exact_hash": 50.0,  # comparable name, but no prev row
    }
    assert regression_tripwire(now, prev)["flagged"] == {}


def test_zero_prev_never_divides():
    prev = {"dedup_exact_hash": 0.0}
    now = {"dedup_exact_hash": 5.0}
    assert regression_tripwire(now, prev)["flagged"] == {}


def test_latest_committed_normalized_reads_r5_record():
    """The committed BENCH_DETAIL_r05.json must be discoverable as the
    baseline, with normalized medians for the comparable basis."""
    f, block = latest_committed_normalized(REPO)
    assert f is not None and f >= "BENCH_DETAIL_r05.json"
    covered = [n for n in COMPARABLE_41 if n in block]
    assert len(covered) == len(COMPARABLE_41)
    # and the real current-vs-r5 wiring runs end-to-end on committed data
    with open(os.path.join(REPO, f)) as fh:
        same = json.load(fh)["normalized"]["queries"]
    assert regression_tripwire(same, block)["flagged"] == {}
