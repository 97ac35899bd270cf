"""Property-based differential testing vs DuckDB (SQLancer-style).

Random filter/project/groupBy-agg plans are generated with hypothesis, built
twice — once as a DataFrame expression tree, once as ANSI SQL — and compared
row-for-row through the same canonicalisation the driver's value-hash uses.
This covers the combinatorial space the fixed per-query oracles can't:
predicate nesting, NULL-boundary comparisons, mixed AND/OR, every
categorical/numeric column pairing.

The reference's one test is a scenario vs an in-memory oracle
(WalConsumerTest.java:26,105-133); this is the same oracle idea applied to
the relational extension surface, mechanized.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_connection
from wal_consumer_spark.sources.tables import load_table

# (table, categorical cols, numeric cols (int-valued), money col)
TABLES = {
    "orders": (
        ["o_orderpriority", "o_orderstatus"],
        ["o_custkey"],
        "o_totalprice",
    ),
    "customer": (
        ["c_mktsegment"],
        ["c_nationkey", "c_custkey"],
        "c_acctbal",
    ),
    "lineitem": (
        ["l_returnflag", "l_linestatus"],
        ["l_orderkey", "l_quantity"],
        "l_extendedprice",
    ),
}

_CAT_VALUES: dict[tuple[str, str], list[str]] = {}


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


def _cat_values(spark, table: str, col: str) -> list[str]:
    key = (table, col)
    if key not in _CAT_VALUES:
        rows = (
            load_table(spark, SF_SMOKE, table).select(col).distinct().collect()
        )
        _CAT_VALUES[key] = sorted(r[0] for r in rows)
    return _CAT_VALUES[key]


# fact table -> (dim table, fact key, dim key, dim categorical col)
DIM_JOINS = {
    "orders": ("customer", "o_custkey", "c_custkey", "c_mktsegment"),
    "customer": ("nation", "c_nationkey", "n_nationkey", "n_name"),
    "lineitem": ("part", "l_partkey", "p_partkey", "p_brand"),
}


@st.composite
def plan_specs(draw):
    table = draw(st.sampled_from(sorted(TABLES)))
    cats, nums, money = TABLES[table]
    preds = []
    # up to 4 predicates: >=3 exercises mixed AND/OR precedence, which is
    # safe since the SQL oracle parenthesizes exactly as the DataFrame
    # predicate folds (left-assoc) — raising the cap past 2 was blocked on
    # that fix (r1 ADVICE).
    for _ in range(draw(st.integers(0, 4))):
        kind = draw(st.sampled_from(["cat_eq", "cat_in", "num_cmp", "money_cmp"]))
        preds.append(
            (
                kind,
                draw(st.sampled_from(cats if kind.startswith("cat") else nums)),
                draw(st.integers(0, 10**6)),
                draw(st.sampled_from(["<", "<=", ">", ">=", "=", "<>"])),
                draw(st.sampled_from(["and", "or"])),
            )
        )
    joined = draw(st.booleans())
    group_pool = [None, *cats]
    if joined:
        group_pool.append(DIM_JOINS[table][3])
    group = draw(st.sampled_from(group_pool))
    return (table, preds, group, joined)


def _build(spark, duck, spec):
    table, preds, group, joined = spec
    cats, nums, money = TABLES[table]
    df = load_table(spark, SF_SMOKE, table)
    from_clause = table
    if joined:
        dim, fk, dk, _ = DIM_JOINS[table]
        dim_df = load_table(spark, SF_SMOKE, dim)
        df = df.join(F.broadcast(dim_df), df[fk] == dim_df[dk])
        from_clause = f"{table} JOIN {dim} ON {fk} = {dk}"
    sql_where = ""
    cond = None
    for kind, col, seed, op, conj in preds:
        if kind == "cat_eq":
            vals = _cat_values(spark, table, col)
            v = vals[seed % len(vals)]
            c = F.col(col) == v
            s = f"{col} = '{v}'"
        elif kind == "cat_in":
            vals = _cat_values(spark, table, col)
            pick = [vals[(seed + i) % len(vals)] for i in range(2)]
            c = F.col(col).isin(pick)
            s = "{} IN ({})".format(col, ", ".join(f"'{v}'" for v in pick))
        elif kind == "num_cmp":
            v = seed % 5000
            c = F.expr(f"{col} {'!=' if op == '<>' else op} {v}")
            s = f"{col} {op} {v}"
        else:
            v = (seed % 500000) / 100.0
            c = F.expr(f"{money} {'!=' if op == '<>' else op} {v}")
            s = f"{money} {op} {v}"
        # parenthesize the accumulated clause exactly as the DataFrame
        # predicate is left-folded ((p1 OP p2) OP p3), so SQL's AND-binds-
        # tighter precedence can never diverge at any predicate count.
        if cond is None:
            cond, sql_where = c, s
        elif conj == "and":
            cond, sql_where = cond & c, f"({sql_where}) AND {s}"
        else:
            cond, sql_where = cond | c, f"({sql_where}) OR {s}"
    if cond is not None:
        df = df.filter(cond)
    where = f"WHERE {sql_where}" if sql_where else ""

    if group is None:
        sdf = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(money).cast("double").alias("lo"),
            F.max(money).cast("double").alias("hi"),
            F.sum(F.col(money).cast("decimal(14,2)")).cast("double").alias("total"),
        )
        sql = f"""
            SELECT COUNT(*) AS n,
                   CAST(MIN({money}) AS DOUBLE) AS lo,
                   CAST(MAX({money}) AS DOUBLE) AS hi,
                   CAST(SUM(CAST({money} AS DECIMAL(14,2))) AS DOUBLE) AS total
            FROM {from_clause} {where}
        """
    else:
        sdf = df.groupBy(group).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(money).cast("decimal(14,2)")).cast("double").alias("total"),
        )
        sql = f"""
            SELECT {group}, COUNT(*) AS n,
                   CAST(SUM(CAST({money} AS DECIMAL(14,2))) AS DOUBLE) AS total
            FROM {from_clause} {where} GROUP BY {group}
        """
    return sdf, duck.execute(sql).fetchdf()


@given(spec=plan_specs())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_plan_matches_duckdb(spark, duck, spec):
    sdf, ddf = _build(spark, duck, spec)
    compare(sdf.toPandas(), ddf, f"fuzz:{spec}")
