"""Second-scale-factor parity: the 10 most expensive plans hash-match
DuckDB at sf0.1 — 10x the rows of the certified sf0.01 gate (VERDICT r11
stretch #7).

The degenerate-denominator / overflow class of bug (the r10 and r11
ADVICE items: Matthews 0*0 margins, Gini DECIMAL rank sums, Theil mse=0)
only surfaces when value ranges and group cardinalities grow; a query
certified at sf0.01 can carry a quantization or overflow cliff that
10x the rows walks straight off. Names = the ten largest in-suite
medians in BENCH_DETAIL_r11 that carry an oracle, frozen here so the
test stays meaningful as the bench rotates.

Slower than the sf0.01 gate by design (~1-2 min total); still in-suite —
the whole suite budget is an hour.
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duck_connection
from wal_consumer_spark.plans import all_specs

SF_01 = "/root/testdata/sf0.1"

#: Ten most expensive oracle-backed plans per BENCH_DETAIL_r11 medians.
EXPENSIVE_10 = [
    "graph_connected_components",
    "dedup_lsh_band_sensitivity",
    "dedup_minhash_estimate_error",
    "ts_theil_sen_slope",
    "pipeline_soft_dedup_ess_by_source",
    "dedup_minhash_lsh",
    "graph_wedge_closure_by_degree",
    "sim_product_quantization_audit",
    "cdc_apply_final_state",
    "graph_landmark_distance_profile",
]

_SPECS = all_specs()


@pytest.fixture(scope="module")
def duck01():
    con = duck_connection(SF_01)
    yield con
    con.close()


@pytest.mark.parametrize("name", EXPENSIVE_10)
def test_expensive_plan_parity_at_sf01(spark, duck01, name):
    spec = _SPECS[name]
    assert spec.oracle is not None, f"{name} must carry an oracle"
    sdf = spec.spark(spark, SF_01).toPandas()
    ddf = duck01.execute(spec.oracle).fetchdf()
    assert len(sdf) > 0, f"{name} degenerately empty at sf0.1"
    compare(sdf, ddf, f"{name}@sf0.1")
