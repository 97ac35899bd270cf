"""Registry ordering contract: the grading driver correctness-checks only
the first 50 entries of `__spark_entry__.queries()`, so `all_specs()` must
put one representative of every operator family inside that window and
never waste a slot on an oracle-less spec (VERDICT.md r1, "Next round" #1/#2).
"""

from __future__ import annotations

from wal_consumer_spark.plans import all_specs
from wal_consumer_spark.plans.registry import DRIVER_WINDOW

#: Family marker -> at least one window entry must start with it.
FAMILY_PREFIXES = [
    "q",            # TPC-H flagship
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
    # round-2 families promoted into the window (r2 registry swap)
    "ts_",
    "analytics_",
    "graph_",
    "ml_",
]


def test_driver_window_names_registered():
    specs = all_specs()
    missing = [n for n in DRIVER_WINDOW if n not in specs]
    assert not missing, f"DRIVER_WINDOW names not registered: {missing}"
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW), "duplicate window names"


def test_all_specs_starts_with_driver_window():
    names = list(all_specs())
    assert names[: len(DRIVER_WINDOW)] == DRIVER_WINDOW


def test_first_50_cover_every_family():
    first_50 = list(all_specs())[:50]
    uncovered = [
        p for p in FAMILY_PREFIXES if not any(n.startswith(p) for n in first_50)
    ]
    assert not uncovered, f"families without a window representative: {uncovered}"


def test_oracle_less_specs_sort_last():
    specs = all_specs()
    names = list(specs)
    none_positions = [i for i, n in enumerate(names) if specs[n].oracle is None]
    oracle_positions = [i for i, n in enumerate(names) if specs[n].oracle is not None]
    if none_positions and oracle_positions:
        assert min(none_positions) > max(oracle_positions)
