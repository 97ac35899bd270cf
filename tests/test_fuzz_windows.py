"""Property-based differential testing of WINDOW functions vs DuckDB.

Random (partition, order, function, frame) specs are built twice — once
through the DataFrame Window API, once as ANSI SQL — and compared through
the driver's canonicalisation. Determinism rules mirror the registry
contract: frame aggregates and positional functions always include the
primary key in ORDER BY (total order); rank/dense_rank order by the value
alone (their outputs are tie-invariant)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_connection
from wal_consumer_spark.sources.tables import load_table

# table -> (partition cols, numeric order col, money col, pk col)
WTABLES = {
    "orders": ("o_orderstatus", "o_custkey", "o_totalprice", "o_orderkey"),
    "customer": ("c_mktsegment", "c_nationkey", "c_acctbal", "c_custkey"),
    "supplier": ("s_nationkey", "s_suppkey", "s_acctbal", "s_suppkey"),
}

FUNCS = [
    "row_number",
    "rank",
    "dense_rank",
    "lag",
    "lead",
    "sum_frame",
    "count_frame",
    "min_frame",
    "max_frame",
]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@st.composite
def window_specs(draw):
    table = draw(st.sampled_from(sorted(WTABLES)))
    fn = draw(st.sampled_from(FUNCS))
    lo = draw(st.integers(0, 5))
    hi = draw(st.integers(0, 5))
    unbounded = draw(st.booleans())
    offset = draw(st.integers(1, 3))
    return (table, fn, lo, hi, unbounded, offset)


def _build(spark, duck, spec):
    table, fn, lo, hi, unbounded, offset = spec
    part, ocol, money, pk = WTABLES[table]
    df = load_table(spark, SF_SMOKE, table)
    cents = F.round(F.col(money) * 100).cast("long")
    cents_sql = f"CAST(round({money} * 100) AS BIGINT)"
    rank_like = fn in ("rank", "dense_rank")
    # pin NULLS FIRST explicitly in BOTH engines: Spark's ASC default is
    # NULLS FIRST but DuckDB's is NULLS LAST — relying on defaults would
    # silently diverge the moment a nullable order column joins WTABLES
    order_sql = (
        f"{ocol} ASC NULLS FIRST"
        if rank_like
        else f"{ocol} ASC NULLS FIRST, {pk} ASC NULLS FIRST"
    )
    w = Window.partitionBy(part)
    w = (
        w.orderBy(F.col(ocol).asc_nulls_first())
        if rank_like
        else w.orderBy(
            F.col(ocol).asc_nulls_first(), F.col(pk).asc_nulls_first()
        )
    )

    if fn in ("row_number", "rank", "dense_rank"):
        col = getattr(F, fn)().over(w)
        sql_expr = f"{fn}() OVER (PARTITION BY {part} ORDER BY {order_sql})"
    elif fn in ("lag", "lead"):
        col = getattr(F, fn)(cents, offset).over(w)
        sql_expr = (
            f"{fn}({cents_sql}, {offset}) OVER "
            f"(PARTITION BY {part} ORDER BY {order_sql})"
        )
    else:
        agg = fn.split("_")[0]
        if unbounded:
            wf = w.rowsBetween(Window.unboundedPreceding, 0)
            frame_sql = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        else:
            wf = w.rowsBetween(-lo, hi)
            frame_sql = f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING"
        target = F.lit(1) if agg == "count" else cents
        target_sql = "1" if agg == "count" else cents_sql
        col = getattr(F, agg)(target).over(wf)
        if agg in ("sum", "count"):
            col = col.cast("long")
            sql_expr = (
                f"CAST({agg}({target_sql}) OVER (PARTITION BY {part} "
                f"ORDER BY {order_sql} {frame_sql}) AS BIGINT)"
            )
        else:
            sql_expr = (
                f"{agg}({target_sql}) OVER (PARTITION BY {part} "
                f"ORDER BY {order_sql} {frame_sql})"
            )

    sdf = df.select(F.col(pk).alias("pk"), col.alias("v"))
    sql = f"SELECT {pk} AS pk, {sql_expr} AS v FROM {table}"
    return sdf, duck.execute(sql).fetchdf()


@given(spec=window_specs())
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_matches_duckdb(spark, duck, spec):
    sdf, ddf = _build(spark, duck, spec)
    compare(sdf.toPandas(), ddf, f"wfuzz:{spec}")
