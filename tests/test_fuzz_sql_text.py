"""Differential fuzz of the SQL FRONT DOOR: randomly generated ANSI SQL
texts executed VERBATIM by both engines (VERDICT r9 stretch #9).

test_fuzz_relational.py fuzzes DataFrame plans against per-case SQL; the 13
hand-written sql_front_* queries prove the textual entry point on fixed
texts. This harness closes the gap between them: 200 seeded random SQL
strings, each run unchanged through `sqlapi.sql` (Spark's parser) AND
DuckDB, compared through the driver's canonicalisation — the class of bug
this catches is a dialect-boundary divergence (precedence, ordinal GROUP
BY, LIKE semantics, CASE typing, BETWEEN bounds, HAVING scoping, set-op
column matching, window frames) that no fixed query would ever hit.

Grammar constraints keep the generated text inside the dialect
intersection AND deterministic:

- aggregates over money sum in DECIMAL then cast to DOUBLE (the repo-wide
  exact-sum convention), so value hashes cannot differ in the last ulp;
- LIMIT only ever follows an ORDER BY on a unique key expression;
- row_number windows partition by a categorical and order by a unique key;
- no date/time functions (dialects differ), no integer `//` (floor vs
  truncation), `%` only over positive keys.
"""

from __future__ import annotations

import random

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_connection
from wal_consumer_spark.sqlapi import sql as front_door

N_CASES = 200

# table -> (categorical cols, positive int cols, money col, unique order key)
TABLES = {
    "orders": (
        ["o_orderpriority", "o_orderstatus"],
        ["o_custkey"],
        "o_totalprice",
        "o_orderkey",
    ),
    "customer": (
        ["c_mktsegment"],
        ["c_nationkey", "c_custkey"],
        "c_acctbal",
        "c_custkey",
    ),
    "lineitem": (
        ["l_returnflag", "l_linestatus"],
        ["l_orderkey", "l_suppkey"],
        "l_extendedprice",
        "l_orderkey * 100 + l_linenumber",
    ),
}

# fact table -> (dim table, fact key, dim key, dim categorical col)
DIM_JOINS = {
    "orders": ("customer", "o_custkey", "c_custkey", "c_mktsegment"),
    "customer": ("nation", "c_nationkey", "n_nationkey", "n_name"),
    "lineitem": ("part", "l_partkey", "p_partkey", "p_brand"),
}

_CAT_VALUES: dict[tuple[str, str], list[str]] = {}


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


def _cat_values(duck, table: str, col: str) -> list[str]:
    key = (table, col)
    if key not in _CAT_VALUES:
        rows = duck.execute(
            f"SELECT DISTINCT {col} FROM {table} ORDER BY 1"
        ).fetchall()
        _CAT_VALUES[key] = [r[0] for r in rows]
    return _CAT_VALUES[key]


def _predicate(rng: random.Random, duck, table: str) -> str:
    cats, nums, money, _ = TABLES[table]
    kind = rng.choice(["cat_eq", "cat_in", "cat_like", "num_cmp", "num_between",
                       "money_cmp"])
    if kind == "cat_eq":
        col = rng.choice(cats)
        v = rng.choice(_cat_values(duck, table, col))
        return f"{col} = '{v}'"
    if kind == "cat_in":
        col = rng.choice(cats)
        vals = _cat_values(duck, table, col)
        pick = rng.sample(vals, min(2, len(vals)))
        return "{} IN ({})".format(col, ", ".join(f"'{v}'" for v in pick))
    if kind == "cat_like":
        col = rng.choice(cats)
        v = rng.choice(_cat_values(duck, table, col))
        return f"{col} LIKE '{v[0]}%'"
    if kind == "num_cmp":
        col = rng.choice(nums)
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{col} {op} {rng.randrange(0, 5000)}"
    if kind == "num_between":
        col = rng.choice(nums)
        a = rng.randrange(0, 4000)
        return f"{col} BETWEEN {a} AND {a + rng.randrange(0, 2000)}"
    op = rng.choice(["<", "<=", ">", ">="])
    money = TABLES[table][2]
    return f"{money} {op} {rng.randrange(0, 500000) / 100.0}"


def _where(rng: random.Random, duck, table: str) -> str:
    n = rng.randrange(0, 4)
    if n == 0:
        return ""
    clause = _predicate(rng, duck, table)
    for _ in range(n - 1):
        conj = rng.choice(["AND", "OR"])
        clause = f"({clause}) {conj} {_predicate(rng, duck, table)}"
    return f"WHERE {clause}"


def _agg_case(rng: random.Random, duck) -> str:
    table = rng.choice(sorted(TABLES))
    cats, nums, money, _ = TABLES[table]
    from_clause = table
    group_pool = list(cats)
    if rng.random() < 0.4:
        dim, fk, dk, dcat = DIM_JOINS[table]
        from_clause = f"{table} JOIN {dim} ON {fk} = {dk}"
        group_pool.append(dcat)
    where = _where(rng, duck, table)
    shape = rng.choice(["global", "group", "case_group", "string_group"])
    measures = (
        "COUNT(*) AS n, "
        f"CAST(SUM(CAST({money} AS DECIMAL(14,2))) AS DOUBLE) AS total, "
        f"CAST(MIN({money}) AS DOUBLE) AS lo, "
        f"CAST(MAX({money}) AS DOUBLE) AS hi"
    )
    if shape == "global":
        return f"SELECT {measures} FROM {from_clause} {where}"
    if shape == "group":
        g = rng.choice(group_pool)
        having = (
            f"HAVING COUNT(*) >= {rng.randrange(1, 20)}"
            if rng.random() < 0.5
            else ""
        )
        return (
            f"SELECT {g}, {measures} FROM {from_clause} {where} "
            f"GROUP BY {g} {having}"
        )
    if shape == "case_group":
        num = rng.choice(nums)
        m = rng.randrange(2, 5)
        return (
            f"SELECT CASE WHEN {num} % {m} = 0 THEN 'zero' "
            f"WHEN {num} % {m} = 1 THEN 'one' ELSE 'rest' END AS bucket, "
            f"{measures} FROM {from_clause} {where} GROUP BY 1"
        )
    cat = rng.choice(cats)
    k = rng.randrange(1, 4)
    return (
        f"SELECT upper(substr({cat}, 1, {k})) AS prefix, "
        f"length({cat}) AS len, COUNT(*) AS n "
        f"FROM {from_clause} {where} GROUP BY 1, 2"
    )


def _window_case(rng: random.Random, duck) -> str:
    table = rng.choice(sorted(TABLES))
    cats, nums, money, ukey = TABLES[table]
    cat = rng.choice(cats)
    where = _where(rng, duck, table)
    k = rng.randrange(1, 5)
    fn = rng.choice(["ROW_NUMBER()", "RANK()"])
    # RANK over a unique key is identical to ROW_NUMBER — both deterministic
    return (
        f"SELECT * FROM ("
        f"SELECT {cat} AS grp, {ukey} AS k, "
        f"CAST({money} AS DOUBLE) AS m, "
        f"{fn} OVER (PARTITION BY {cat} ORDER BY {ukey}) AS rn "
        f"FROM {table} {where}) AS sub WHERE rn <= {k}"
    )


def _limit_case(rng: random.Random, duck) -> str:
    table = rng.choice(sorted(TABLES))
    cats, nums, money, ukey = TABLES[table]
    where = _where(rng, duck, table)
    n = rng.randrange(1, 40)
    direction = rng.choice(["ASC", "DESC"])
    return (
        f"SELECT {ukey} AS k, CAST({money} AS DOUBLE) AS m "
        f"FROM {table} {where} ORDER BY {ukey} {direction} LIMIT {n}"
    )


def _setop_case(rng: random.Random, duck) -> str:
    table = rng.choice(sorted(TABLES))
    cats, _, money, _ = TABLES[table]
    cat = rng.choice(cats)
    w1, w2 = _where(rng, duck, table), _where(rng, duck, table)
    op = rng.choice(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
    return (
        f"SELECT {cat} AS g, COUNT(*) AS n FROM {table} {w1} GROUP BY {cat} "
        f"{op} "
        f"SELECT {cat} AS g, COUNT(*) AS n FROM {table} {w2} GROUP BY {cat}"
    )


def _distinct_case(rng: random.Random, duck) -> str:
    table = rng.choice(sorted(TABLES))
    cats, nums, _, _ = TABLES[table]
    cols = ", ".join(
        rng.sample(cats + nums[:1], rng.randrange(1, min(3, len(cats) + 1) + 1))
    )
    where = _where(rng, duck, table)
    return f"SELECT DISTINCT {cols} FROM {table} {where}"


def gen_sql(seed: int, duck) -> str:
    rng = random.Random(seed)
    case = rng.choice(
        ["agg", "agg", "agg", "window", "limit", "setop", "distinct"]
    )
    return {
        "agg": _agg_case,
        "window": _window_case,
        "limit": _limit_case,
        "setop": _setop_case,
        "distinct": _distinct_case,
    }[case](rng, duck)


def test_sql_text_fuzz_200_cases(spark, duck):
    failures = []
    for seed in range(N_CASES):
        text = gen_sql(seed, duck)
        try:
            a = front_door(spark, SF_SMOKE, text).toPandas()
            b = duck.execute(text).fetchdf()
            compare(a, b, f"sqlfuzz[{seed}]")
        except AssertionError as ex:
            failures.append((seed, text, str(ex)[:200]))
        except Exception as ex:  # parse/execution divergence is also a bug
            failures.append((seed, text, f"{type(ex).__name__}: {str(ex)[:200]}"))
    assert not failures, (
        f"{len(failures)}/{N_CASES} SQL texts diverged; first 3: {failures[:3]}"
    )


# --------------------------------------------------------------------------
# Multi-table grammar (VERDICT r10 "Next round" #5): the single-table fuzz
# above leaves JOIN text and correlated-subquery text each certified by one
# hand-written query — exactly where dialect boundaries are subtlest
# (join-type keyword handling, correlated scoping, EXISTS/IN rewrite
# semantics, the correlated-COUNT "count bug"). 200 more seeded cases over
# 2- and 3-table join chains and EXISTS / NOT EXISTS / IN / NOT IN /
# correlated-scalar subqueries. Determinism rules are inherited: DECIMAL
# sums cast to DOUBLE, IN-lists over non-null keys only (NOT IN over a
# nullable column is a dialect trap we deliberately keep out of grammar —
# the engines AGREE it yields empty, but it tests nothing), grouped
# outputs only (no bare SELECT * row order).

#: 3-table chains: (FROM text with join slots, group col, money measure,
#: fact table for WHERE predicates)
_JOIN3_CHAINS = [
    (
        "customer {j1} nation ON c_nationkey = n_nationkey "
        "{j2} region ON n_regionkey = r_regionkey",
        ["n_name", "r_name"],
        "c_acctbal",
        "customer",
    ),
    (
        "orders {j1} customer ON o_custkey = c_custkey "
        "{j2} nation ON c_nationkey = n_nationkey",
        ["n_name", "c_mktsegment", "o_orderpriority"],
        "o_totalprice",
        "orders",
    ),
    (
        "lineitem {j1} orders ON l_orderkey = o_orderkey "
        "{j2} customer ON o_custkey = c_custkey",
        ["c_mktsegment", "l_returnflag", "o_orderstatus"],
        "l_extendedprice",
        "lineitem",
    ),
]


def _join3_case(rng: random.Random, duck) -> str:
    frm, groups, money, fact = rng.choice(_JOIN3_CHAINS)
    # keys are referentially complete, so INNER and LEFT agree on VALUES —
    # but the parser/planner paths differ, which is what text fuzz probes
    j1 = rng.choice(["JOIN", "INNER JOIN", "LEFT JOIN"])
    j2 = rng.choice(["JOIN", "INNER JOIN", "LEFT JOIN"])
    g = rng.choice(groups)
    where = _where(rng, duck, fact)
    having = (
        f"HAVING COUNT(*) >= {rng.randrange(1, 10)}"
        if rng.random() < 0.4
        else ""
    )
    return (
        f"SELECT {g} AS g, COUNT(*) AS n, "
        f"CAST(SUM(CAST({money} AS DECIMAL(14,2))) AS DOUBLE) AS total "
        f"FROM {frm.format(j1=j1, j2=j2)} {where} GROUP BY {g} {having}"
    )


def _exists_case(rng: random.Random, duck) -> str:
    neg = rng.choice(["", "NOT "])
    inner_pred = _predicate(rng, duck, "orders")
    outer_where = _where(rng, duck, "customer")
    conj = "AND" if outer_where else "WHERE"
    return (
        f"SELECT c_mktsegment AS g, COUNT(*) AS n, "
        f"CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total "
        f"FROM customer {outer_where} {conj} {neg}EXISTS ("
        f"SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        f"AND {inner_pred}) GROUP BY 1"
    )


def _in_subquery_case(rng: random.Random, duck) -> str:
    neg = rng.choice(["", "NOT "])
    inner_pred = _predicate(rng, duck, "customer")
    where = _where(rng, duck, "orders")
    conj = "AND" if where else "WHERE"
    # o_custkey and c_custkey are both non-null: NOT IN stays two-valued
    return (
        f"SELECT o_orderpriority AS g, COUNT(*) AS n, "
        f"CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total "
        f"FROM orders {where} {conj} o_custkey {neg}IN ("
        f"SELECT c_custkey FROM customer WHERE {inner_pred}) GROUP BY 1"
    )


def _correlated_scalar_case(rng: random.Random, duck) -> str:
    # the classic correlated-COUNT shape (the "count bug" rewrite): an
    # empty correlation group must yield 0, not NULL, in BOTH engines
    inner_pred = _predicate(rng, duck, "orders")
    outer_where = _where(rng, duck, "customer")
    return (
        f"SELECT c_custkey AS k, "
        f"(SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey "
        f"AND {inner_pred}) AS n_orders "
        f"FROM customer {outer_where}"
    )


def _semi_agg_case(rng: random.Random, duck) -> str:
    # aggregate over a subquery-derived table with a join inside it
    where = _where(rng, duck, "orders")
    m = rng.randrange(2, 6)
    return (
        f"SELECT g, COUNT(*) AS n, CAST(SUM(cnt) AS BIGINT) AS total_cnt "
        f"FROM (SELECT c_mktsegment AS g, c_custkey % {m} AS b, "
        f"COUNT(o_orderkey) AS cnt "
        f"FROM customer LEFT JOIN orders ON o_custkey = c_custkey "
        f"{where.replace('WHERE', 'AND') if where else ''} "
        f"GROUP BY 1, 2) AS t GROUP BY g"
    )


def gen_join_sql(seed: int, duck) -> str:
    rng = random.Random(seed)
    case = rng.choice(
        ["join3", "join3", "exists", "in_sub", "scalar", "semi_agg"]
    )
    return {
        "join3": _join3_case,
        "exists": _exists_case,
        "in_sub": _in_subquery_case,
        "scalar": _correlated_scalar_case,
        "semi_agg": _semi_agg_case,
    }[case](rng, duck)


def test_sql_text_fuzz_join_grammar_200_cases(spark, duck):
    failures = []
    for seed in range(1000, 1000 + N_CASES):
        text = gen_join_sql(seed, duck)
        try:
            a = front_door(spark, SF_SMOKE, text).toPandas()
            b = duck.execute(text).fetchdf()
            compare(a, b, f"sqljoinfuzz[{seed}]")
        except AssertionError as ex:
            failures.append((seed, text, str(ex)[:200]))
        except Exception as ex:
            failures.append((seed, text, f"{type(ex).__name__}: {str(ex)[:200]}"))
    assert not failures, (
        f"{len(failures)}/{N_CASES} join-grammar SQL texts diverged; "
        f"first 3: {failures[:3]}"
    )


# --------------------------------------------------------------------------
# Window-function grammar (VERDICT r11 "Next round" #4): the 400 cases
# above cover agg/set-op/join/subquery texts; OVER-clause text — frame
# bounds, named WINDOW clauses, ranking ties, lag/lead defaults — was
# certified by exactly one hand-written text per shape. 200 randomized
# window specs close that dialect boundary. QUALIFY itself is excluded:
# OSS Spark's parser has no QUALIFY (sql_front_qualify ships separate
# texts per engine), so the verbatim-text intersection is its subquery
# form, fuzzed in _rank_filter_case. Determinism rules: ROWS frames and
# lag/lead always order by a unique key; RANGE frames order by a
# (possibly tied) int column — value-based frames are order-insensitive;
# money sums go through DECIMAL; ranking outputs are constant under tie
# reordering. NB the synthetic lineitem has DUPLICATE (orderkey,
# linenumber) pairs, so "the unique key" is not unique: every
# position-based ORDER BY below appends the money and categorical
# columns, leaving only ties between rows identical in EVERY referenced
# column — and such rows make any window output multiset
# permutation-invariant.

def _frame_bounds(rng: random.Random) -> str:
    start = rng.choice(
        ["UNBOUNDED PRECEDING", f"{rng.randrange(0, 6)} PRECEDING",
         "CURRENT ROW"]
    )
    if start == "CURRENT ROW":
        end = rng.choice(
            [f"{rng.randrange(0, 6)} FOLLOWING", "UNBOUNDED FOLLOWING",
             "CURRENT ROW"]
        )
    else:
        end = rng.choice(
            ["CURRENT ROW", f"{rng.randrange(0, 6)} FOLLOWING",
             "UNBOUNDED FOLLOWING"]
        )
    return f"BETWEEN {start} AND {end}"


def _rows_frame_case(rng: random.Random, duck) -> str:
    table = rng.choice(sorted(TABLES))
    cats, nums, money, ukey = TABLES[table]
    cat = rng.choice(cats)
    where = _where(rng, duck, table)
    part = rng.choice([f"PARTITION BY {cat} ", ""])
    frame = _frame_bounds(rng)
    agg = rng.choice(["sum", "count", "min", "max"])
    okey = f"{ukey}, {money}, {cat}"
    over = f"OVER ({part}ORDER BY {okey} ROWS {frame})"
    expr = {
        "sum": f"CAST(SUM(CAST({money} AS DECIMAL(18,2))) {over} AS DOUBLE)",
        "count": f"COUNT(*) {over}",
        "min": f"MIN({money}) {over}",
        "max": f"MAX({money}) {over}",
    }[agg]
    return (
        f"SELECT {ukey} AS k, {cat} AS g, {expr} AS w "
        f"FROM {table} {where}"
    )


def _range_frame_case(rng: random.Random, duck) -> str:
    table = rng.choice(sorted(TABLES))
    cats, nums, money, ukey = TABLES[table]
    num = rng.choice(nums)
    cat = rng.choice(cats)
    where = _where(rng, duck, table)
    part = rng.choice([f"PARTITION BY {cat} ", ""])
    lo, hi = rng.randrange(0, 500), rng.randrange(0, 500)
    frame = rng.choice(
        [f"BETWEEN {lo} PRECEDING AND {hi} FOLLOWING",
         f"BETWEEN UNBOUNDED PRECEDING AND {hi} FOLLOWING",
         f"BETWEEN {lo} PRECEDING AND CURRENT ROW"]
    )
    over = f"OVER ({part}ORDER BY {num} RANGE {frame})"
    agg = rng.choice(["sum", "count"])
    expr = (
        f"CAST(SUM(CAST({money} AS DECIMAL(18,2))) {over} AS DOUBLE)"
        if agg == "sum"
        else f"COUNT(*) {over}"
    )
    # value-based frames are tie-insensitive, so non-unique ORDER BY is
    # safe — output keyed by the unique key
    return (
        f"SELECT {ukey} AS k, {num} AS v, {expr} AS w "
        f"FROM {table} {where}"
    )


def _named_window_case(rng: random.Random, duck) -> str:
    table = rng.choice(sorted(TABLES))
    cats, nums, money, ukey = TABLES[table]
    cat = rng.choice(cats)
    where = _where(rng, duck, table)
    # two expressions sharing one named window + one inline window — the
    # shape the single hand-written sql_front_named_window text pinned
    frame = _frame_bounds(rng)
    okey = f"{ukey}, {money}, {cat}"
    return (
        f"SELECT {ukey} AS k, {cat} AS g, "
        f"ROW_NUMBER() OVER w AS rn, "
        f"CAST(SUM(CAST({money} AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s, "
        f"COUNT(*) OVER (PARTITION BY {cat} ORDER BY {okey} "
        f"ROWS {frame}) AS c "
        f"FROM {table} {where} "
        f"WINDOW w AS (PARTITION BY {cat} ORDER BY {okey})"
    )


def _ranking_ties_case(rng: random.Random, duck) -> str:
    table = rng.choice(sorted(TABLES))
    cats, nums, money, ukey = TABLES[table]
    cat = rng.choice(cats)
    num = rng.choice(nums)
    where = _where(rng, duck, table)
    fn = rng.choice(
        ["RANK()", "DENSE_RANK()", "PERCENT_RANK()", "CUME_DIST()",
         f"NTILE({rng.randrange(2, 8)})"]
    )
    # the tied ranking functions are value-based (same input value ->
    # same rank), deterministic under any tie order; NTILE is positional,
    # so its ORDER BY carries every referenced column
    if fn.startswith("NTILE"):
        okey = f"{ukey}, {money}, {cat}"
        return (
            f"SELECT {cat} AS g, {ukey} AS o, {money} AS m, "
            f"{fn} OVER (PARTITION BY {cat} ORDER BY {okey}) AS r "
            f"FROM {table} {where}"
        )
    return (
        f"SELECT {cat} AS g, {num} AS o, "
        f"{fn} OVER (PARTITION BY {cat} ORDER BY {num}) AS r "
        f"FROM {table} {where}"
    )


def _lag_lead_case(rng: random.Random, duck) -> str:
    table = rng.choice(sorted(TABLES))
    cats, nums, money, ukey = TABLES[table]
    cat = rng.choice(cats)
    where = _where(rng, duck, table)
    fn = rng.choice(["LAG", "LEAD"])
    off = rng.randrange(1, 4)
    default = rng.choice(["NULL", "0", "-1"])
    extreme = rng.choice(["FIRST_VALUE", "LAST_VALUE"])
    okey = f"{ukey}, {money}, {cat}"
    return (
        f"SELECT {ukey} AS k, {cat} AS g, "
        f"{fn}({money}, {off}, {default}) "
        f"OVER (PARTITION BY {cat} ORDER BY {okey}) AS l, "
        f"{extreme}({money}) OVER (PARTITION BY {cat} ORDER BY {okey} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS x "
        f"FROM {table} {where}"
    )


def _rank_filter_case(rng: random.Random, duck) -> str:
    """The QUALIFY-equivalent subquery form — rank filter over a window,
    optionally with ties (RANK) and an extra outer predicate."""
    table = rng.choice(sorted(TABLES))
    cats, nums, money, ukey = TABLES[table]
    cat = rng.choice(cats)
    where = _where(rng, duck, table)
    k = rng.randrange(1, 6)
    fn = rng.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
    # RANK/DENSE_RANK filters need a deterministic ROW SET under ties:
    # ordering by the unique key makes all three equivalent and exact
    outer = rng.choice(["", f" AND m > {rng.randrange(0, 3000)}"])
    okey = f"{ukey} DESC, {money} DESC, {cat}"
    return (
        f"SELECT g, k, m FROM ("
        f"SELECT {cat} AS g, {ukey} AS k, "
        f"CAST({money} AS DOUBLE) AS m, "
        f"{fn} OVER (PARTITION BY {cat} ORDER BY {okey}) AS rn "
        f"FROM {table} {where}) AS sub WHERE rn <= {k}{outer}"
    )


def gen_window_sql(seed: int, duck) -> str:
    rng = random.Random(seed)
    case = rng.choice(
        ["rows", "rows", "range", "named", "ties", "lag", "rankfilter"]
    )
    return {
        "rows": _rows_frame_case,
        "range": _range_frame_case,
        "named": _named_window_case,
        "ties": _ranking_ties_case,
        "lag": _lag_lead_case,
        "rankfilter": _rank_filter_case,
    }[case](rng, duck)


def test_sql_text_fuzz_window_grammar_200_cases(spark, duck):
    failures = []
    for seed in range(2000, 2000 + N_CASES):
        text = gen_window_sql(seed, duck)
        try:
            a = front_door(spark, SF_SMOKE, text).toPandas()
            b = duck.execute(text).fetchdf()
            compare(a, b, f"sqlwinfuzz[{seed}]")
        except AssertionError as ex:
            failures.append((seed, text, str(ex)[:200]))
        except Exception as ex:
            failures.append((seed, text, f"{type(ex).__name__}: {str(ex)[:200]}"))
    assert not failures, (
        f"{len(failures)}/{N_CASES} window-grammar SQL texts diverged; "
        f"first 3: {failures[:3]}"
    )
