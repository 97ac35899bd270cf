"""Registry ordering contract: the grading driver correctness-checks only
the first 50 entries of `__spark_entry__.queries()`, and CORRECTNESS_r{N}.json
files accumulate across rounds — so the window ROTATES each round
(VERDICT.md r2, "Next round" #1) and the coverage guarantees are cumulative:

- every operator family must hold a green slot in (current window ∪ some
  committed CORRECTNESS_r*.json);
- every name ever checked by the driver must either be green in a committed
  CORRECTNESS file or sit in the current window to be (re-)checked — a
  rotation can never silently drop certified coverage;
- a window slot is never wasted on an oracle-less spec.
"""

from __future__ import annotations

import json
from pathlib import Path

from wal_consumer_spark.plans import all_specs
from wal_consumer_spark.plans.registry import DRIVER_WINDOW

REPO = Path(__file__).resolve().parent.parent

#: Family marker -> at least one (window ∪ cumulative-green) entry must
#: start with it.
FAMILY_PREFIXES = [
    "q",            # TPC-H flagship (q1/q5 certified r1+r2; bulk tpch_* r1)
    "join_",
    "asof_",
    "topk_",      # covers the sort/limit/top-k SURVEY §2 row (global sort +
                  # limit); the plain sort_ variants stay in the registry
                  # tail and tests/test_parity.py
    "set_",
    "agg_",
    "win_",
    "scalar_",
    "cdc_",
    "dq_",
    "dedup_",
    "sim_",
    "text_",
    "multimodal_",
    "udf_",
    "stream_",
    "pipeline_",
    "sql_front_",
    "ts_",
    "analytics_",
    "graph_",
    "ml_",
]


def _committed_correctness() -> dict[str, dict]:
    """name -> best row across all committed CORRECTNESS_r*.json."""
    rows: dict[str, dict] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(path.read_text()).items():
            prev = rows.get(name)
            if prev is None or not _is_green(prev):
                rows[name] = row
    return rows


def _is_green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def test_driver_window_names_registered():
    specs = all_specs()
    missing = [n for n in DRIVER_WINDOW if n not in specs]
    assert not missing, f"DRIVER_WINDOW names not registered: {missing}"
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW), "duplicate window names"
    assert len(DRIVER_WINDOW) == 50, "window must fill all 50 driver slots"


def test_all_specs_starts_with_driver_window():
    names = list(all_specs())
    assert names[: len(DRIVER_WINDOW)] == DRIVER_WINDOW


def test_window_plus_committed_green_cover_every_family():
    green = {n for n, row in _committed_correctness().items() if _is_green(row)}
    covered = green | set(DRIVER_WINDOW)
    uncovered = [
        p for p in FAMILY_PREFIXES if not any(n.startswith(p) for n in covered)
    ]
    assert not uncovered, f"families with no certified/windowed representative: {uncovered}"


def test_rotated_out_names_have_committed_green_rows():
    """A rotation may only drop a name from the window if a committed
    CORRECTNESS_r*.json already holds a green row for it — cumulative driver
    coverage can never regress. Names whose only committed rows are red must
    stay in the window until they go green."""
    rows = _committed_correctness()
    window = set(DRIVER_WINDOW)
    dropped_red = [
        n for n, row in rows.items() if not _is_green(row) and n not in window
    ]
    assert not dropped_red, (
        f"names with no committed green row rotated out of the window: {dropped_red}"
    )


def test_window_slots_all_certifiable():
    """Every window slot must have a real oracle — a rows-only check can
    never consume one of the 50 driver slots."""
    specs = all_specs()
    no_oracle = [n for n in DRIVER_WINDOW if specs[n].oracle is None]
    assert not no_oracle, f"oracle-less specs in window: {no_oracle}"


def test_oracle_less_specs_sort_last():
    specs = all_specs()
    names = list(specs)
    none_positions = [i for i, n in enumerate(names) if specs[n].oracle is None]
    oracle_positions = [i for i, n in enumerate(names) if specs[n].oracle is not None]
    if none_positions and oracle_positions:
        assert min(none_positions) > max(oracle_positions)


def test_staging_partitions_registry():
    """cumulative-green ∪ DRIVER_WINDOW ∪ NEXT_WINDOW must cover the
    registry EXACTLY: every spec is either already driver-certified or
    staged in a concrete upcoming window, and no staged name is a
    duplicate or already-certified slot-waster. Keeping NEXT_WINDOW as a
    real constant (not a comment) makes the rotation arithmetic
    machine-checked (VERDICT r6 "What's wrong" #3)."""
    from wal_consumer_spark.plans.registry import FUTURE_WINDOW, NEXT_WINDOW

    specs = all_specs()
    green = {n for n, row in _committed_correctness().items() if _is_green(row)}
    window = set(DRIVER_WINDOW)
    staged = set(NEXT_WINDOW)
    future = set(FUTURE_WINDOW)

    assert len(set(NEXT_WINDOW)) == len(NEXT_WINDOW), "duplicate NEXT_WINDOW names"
    assert len(set(FUTURE_WINDOW)) == len(FUTURE_WINDOW), "duplicate FUTURE_WINDOW names"
    overlap = (window & staged) | (window & future) | (staged & future)
    assert not overlap, f"names staged twice: {sorted(overlap)}"
    wasted = sorted((window | staged | future) & green)
    assert not wasted, f"already-certified names burning staged slots: {wasted}"
    missing = sorted(set(specs) - green - window - staged - future)
    assert not missing, f"registered specs in no window and not certified: {missing}"
    unknown = sorted((window | staged | future) - set(specs))
    assert not unknown, f"staged names not registered: {unknown}"
    assert len(staged) <= 50, "NEXT_WINDOW overflows a single 50-slot round"
    assert len(future) <= 50, "FUTURE_WINDOW overflows a single 50-slot round"


def test_next_window_slots_all_certifiable():
    from wal_consumer_spark.plans.registry import FUTURE_WINDOW, NEXT_WINDOW

    specs = all_specs()
    no_oracle = [
        n for n in (*NEXT_WINDOW, *FUTURE_WINDOW) if specs[n].oracle is None
    ]
    assert not no_oracle, f"oracle-less specs staged: {no_oracle}"


def test_survey_count_matches_registry():
    """SURVEY.md §2.C's headline query count must equal len(all_specs())
    so documentation can't drift from the registry (VERDICT r6 "What's
    wrong" #3 flagged exactly this: SURVEY said 364 while the registry
    held 372)."""
    import re

    text = (REPO / "SURVEY.md").read_text()
    m = re.search(r"as of round \d+: \*\*(\d+) named", text)
    assert m, "SURVEY.md §2.C count header not found"
    assert int(m.group(1)) == len(all_specs()), (
        f"SURVEY.md says {m.group(1)} queries; registry has {len(all_specs())}"
    )
