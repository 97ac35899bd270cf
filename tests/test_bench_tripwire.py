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


def test_baseline_never_from_current_round():
    """A round-7 bench run must baseline against a round < 7 detail file —
    NEVER a same-round snapshot (VERDICT r6 "What's wrong" #1: a mid-round
    r6 file on disk served as r6's own 'previous round' and shipped 7
    false-positive flags). Exercised against the real committed files: with
    before_round=7 the baseline is r6; with before_round=6 it must skip the
    committed r6 file and fall back to r5."""
    f7, block7, raw7 = latest_committed_normalized(REPO, before_round=7)
    assert f7 == "BENCH_DETAIL_r06.json"
    f6, block6, raw6 = latest_committed_normalized(REPO, before_round=6)
    assert f6 == "BENCH_DETAIL_r05.json"
    for block in (block7, block6, raw7, raw6):
        covered = [n for n in COMPARABLE_41 if n in block]
        assert len(covered) == len(COMPARABLE_41)
    # self-comparison sanity: a record never flags against itself
    with open(os.path.join(REPO, f7)) as fh:
        same = json.load(fh)["normalized"]["queries"]
    assert regression_tripwire(same, block7)["flagged"] == {}


def test_baseline_skips_same_and_future_rounds(tmp_path):
    """Synthetic directory: files for rounds 5, 6, 7 on disk; benching
    round 7 must pick 6, never 7 (same-round) and never anything >= 7."""
    for rnd, val in [(5, 1.0), (6, 2.0), (7, 99.0)]:
        rec = {
            "queries": {"dedup_exact_hash": val},
            "normalized": {"queries": {"dedup_exact_hash": val}},
        }
        (tmp_path / f"BENCH_DETAIL_r{rnd:02d}.json").write_text(json.dumps(rec))
    f, norm, raw = latest_committed_normalized(str(tmp_path), before_round=7)
    assert f == "BENCH_DETAIL_r06.json"
    assert norm["dedup_exact_hash"] == 2.0 and raw["dedup_exact_hash"] == 2.0
    # no eligible baseline at all -> empty blocks, no crash
    f0, norm0, raw0 = latest_committed_normalized(str(tmp_path), before_round=5)
    assert f0 is None and norm0 == {} and raw0 == {}


def test_r6_false_positives_dissolve_against_true_r5_baseline():
    """Regression lock for the exact r6 incident: the 7 committed
    tripwire_flagged names in BENCH_r06.json must NOT flag when r6's
    normalized medians are compared against the TRUE previous round
    (r5) — proving the flags were a baseline-selection artifact."""
    with open(os.path.join(REPO, "BENCH_DETAIL_r06.json")) as fh:
        r6 = json.load(fh)["normalized"]["queries"]
    _, r5, _ = latest_committed_normalized(REPO, before_round=6)
    flagged = regression_tripwire(r6, r5)["flagged"]
    assert flagged == {}, f"true-baseline tripwire should be clean: {flagged}"
