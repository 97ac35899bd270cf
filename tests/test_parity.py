"""Every registered query with an oracle hash-matches DuckDB (the driver's
t2 gate, run locally at sf0.01 by default)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duck_connection
from wal_consumer_spark.plans import all_specs

_SPECS = all_specs()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_parity(spark, duck, name):
    spec = _SPECS[name]
    sdf = spec.spark(spark, SF_ORACLE).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only smoke: plan executes
        return
    ddf = duck.execute(spec.oracle).fetchdf()
    compare(sdf, ddf, name)


def test_driver_window_results_non_degenerate(spark):
    """Every driver-window query must return >=1 row at the driver's scale
    factor: an empty result hash-matches an empty oracle no matter how
    broken the query is (the vacuous-verification failure mode found on
    dq_sequence_gap_audit and join_interval_overlap in round 2)."""
    from wal_consumer_spark.plans.registry import DRIVER_WINDOW

    empty = [
        n
        for n in DRIVER_WINDOW
        if len(_SPECS[n].spark(spark, SF_ORACLE).take(1)) == 0
    ]
    assert not empty, f"window queries with empty (vacuous) results: {empty}"
