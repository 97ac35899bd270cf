"""Property-based differential testing of WINDOW functions vs DuckDB
(extends tests/test_fuzz_relational.py's SQLancer-style harness to the
window family): random (partition, order, function, frame) combinations
over the driver tables, always ordered with a unique tiebreak so every
function is deterministic in both engines."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_connection
from wal_consumer_spark.sources.tables import load_table

import pytest

# (table, partition cols, order cols, unique pk, money col)
_TABLES = {
    "orders": (
        ["o_orderstatus", "o_orderpriority"],
        ["o_orderdate", "o_custkey"],
        "o_orderkey",
        "o_totalprice",
    ),
    "customer": (
        ["c_mktsegment", "c_nationkey"],
        ["c_acctbal", "c_name"],
        "c_custkey",
        "c_acctbal",
    ),
}

_FUNCS = ["row_number", "rank", "dense_rank", "lag", "lead", "sum_frame", "cume_dist"]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@st.composite
def window_specs(draw):
    table = draw(st.sampled_from(sorted(_TABLES)))
    parts, orders, pk, money = _TABLES[table]
    part = draw(st.sampled_from(parts))
    order = draw(st.sampled_from(orders))
    desc = draw(st.booleans())
    fn = draw(st.sampled_from(_FUNCS))
    offset = draw(st.integers(1, 3))
    return (table, part, order, desc, fn, offset)


def _build(spark, duck, spec):
    table, part, order, desc, fn, offset = spec
    _, _, pk, money = _TABLES[table]
    df = load_table(spark, SF_SMOKE, table)
    # unique total order inside each partition: order col + pk tiebreak.
    # Null placement is EXPLICIT on both sides: Spark's ASC default is
    # NULLS FIRST while DuckDB's is NULLS LAST, so relying on defaults would
    # silently diverge the moment a nullable order column joins _TABLES.
    ob = [
        F.col(order).desc_nulls_last() if desc else F.col(order).asc_nulls_first(),
        F.col(pk).asc(),
    ]
    dir_sql = "DESC NULLS LAST" if desc else "ASC NULLS FIRST"
    over = (
        f"PARTITION BY {part} ORDER BY {order} {dir_sql}, {pk} ASC"
    )
    w = Window.partitionBy(part).orderBy(*ob)
    if fn == "row_number":
        col, sql_expr = F.row_number().over(w), f"row_number() OVER ({over})"
    elif fn == "rank":
        col, sql_expr = F.rank().over(w), f"rank() OVER ({over})"
    elif fn == "dense_rank":
        col, sql_expr = F.dense_rank().over(w), f"dense_rank() OVER ({over})"
    elif fn == "lag":
        col = F.lag(pk, offset).over(w)
        sql_expr = f"lag({pk}, {offset}) OVER ({over})"
    elif fn == "lead":
        col = F.lead(pk, offset).over(w)
        sql_expr = f"lead({pk}, {offset}) OVER ({over})"
    elif fn == "cume_dist":
        col = F.round(F.cume_dist().over(w), 9)
        sql_expr = f"round(cume_dist() OVER ({over}), 9)"
    else:  # sum_frame: running decimal sum over a rows frame
        wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        col = F.sum(F.col(money).cast("decimal(14,2)")).over(wf).cast("double")
        sql_expr = (
            f"CAST(SUM(CAST({money} AS DECIMAL(14,2))) OVER ({over} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
        )
    sdf = df.select(F.col(pk), col.alias("w_out"))
    ddf = duck.execute(
        f"SELECT {pk}, {sql_expr} AS w_out FROM {table}"
    ).fetchdf()
    return sdf, ddf


@given(spec=window_specs())
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_matches_duckdb(spark, duck, spec):
    sdf, ddf = _build(spark, duck, spec)
    compare(sdf.toPandas(), ddf, f"winfuzz:{spec}")
