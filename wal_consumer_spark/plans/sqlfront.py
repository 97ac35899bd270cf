"""SQL-front-door queries: the Spark side is RAW ANSI SQL text through
`sqlapi.sql` (not the DataFrame API), proving the textual entry point end to
end — parse, analyze, optimize, execute — against the same DuckDB oracles as
everything else. Catalyst compiles both entry points to the same plans, so
SCALE.md applies unchanged.

Reference parity note: the reference has no query language at all
(SURVEY.md §3 — five fixed native-SQL strings); this is extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wal_consumer_spark.plans.registry import register
from wal_consumer_spark.sqlapi import sql

#: one SQL text per query, valid verbatim in BOTH Spark SQL and DuckDB —
#: the Spark side runs the identical string the oracle runs.
_SHARED_SQL = {
    "sql_front_agg_join": """
    SELECT n.n_name AS nation,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice * 100 AS DECIMAL(18,0))) AS BIGINT)
               AS revenue_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    "sql_front_window_rank": """
    SELECT c_mktsegment, c_custkey, bal_cents, rnk FROM (
        SELECT c_mktsegment, c_custkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
               row_number() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC, c_custkey
               ) AS rnk
        FROM customer
    ) t WHERE rnk <= 3
    ORDER BY c_mktsegment, rnk
    """,
    "sql_front_exists_subquery": """
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
    )
    ORDER BY s_suppkey
    """,
    # Recursive CTE (Spark 4.x WITH RECURSIVE): a 12-row month spine
    # generated recursively, LEFT JOINed to per-month order aggregates so
    # empty months surface as explicit zero rows — the gap-fill idiom
    # expressed entirely in shared ANSI SQL. The recursion is depth-12 and
    # data-independent; the work is the one orders aggregation.
    "sql_front_recursive_cte": """
    WITH RECURSIVE months(m) AS (
        SELECT 1
        UNION ALL
        SELECT m + 1 FROM months WHERE m < 12
    ),
    per_month AS (
        SELECT CAST(month(o_orderdate) AS INT) AS m,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(18,0))) AS BIGINT)
                   AS revenue_cents
        FROM orders GROUP BY CAST(month(o_orderdate) AS INT)
    )
    SELECT CAST(months.m AS INT) AS month,
           CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(revenue_cents, 0) AS BIGINT) AS revenue_cents
    FROM months LEFT JOIN per_month ON per_month.m = months.m
    ORDER BY months.m
    """,
    # LATERAL correlated subquery (ANSI, Spark 3.2+/DuckDB): a per-outer-row
    # derived table — the SQL spelling of "for each nation, compute its
    # customer aggregate". Catalyst decorrelates this into the same
    # broadcast-join + aggregate plan the DataFrame API produces; nothing
    # is executed per-row.
    "sql_front_lateral_join": """
    SELECT n.n_name AS nation, t.n_cust, t.max_bal_cents
    FROM nation n, LATERAL (
        SELECT COUNT(*) AS n_cust,
               CAST(round(MAX(c.c_acctbal) * 100) AS BIGINT) AS max_bal_cents
        FROM customer c WHERE c.c_nationkey = n.n_nationkey
    ) t
    ORDER BY n.n_name
    """,
    # GROUPING SETS with GROUPING() disambiguation (ANSI): three
    # aggregation granularities in ONE pass — per (status, priority),
    # per status, and grand total — with grouping flags so NULL group keys
    # are distinguishable from NULL data. Catalyst expands this to a
    # single Expand + hash aggregate, not three scans.
    "sql_front_grouping_sets": """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(18,0))) AS BIGINT)
               AS revenue_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
    # ANSI set operations through the textual front door: customers of
    # high-value open orders INTERSECT / EXCEPT urgent-priority customers.
    # Catalyst compiles INTERSECT to a left-semi aggregate and EXCEPT to a
    # left-anti aggregate — same plans the DataFrame set-op queries get.
    "sql_front_set_ops": """
    SELECT c AS custkey, which FROM (
        SELECT o_custkey AS c, 'both' AS which FROM orders
        WHERE o_totalprice > 250000
        INTERSECT
        SELECT o_custkey AS c, 'both' AS which FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ) t
    UNION ALL
    SELECT c AS custkey, 'only_big' AS which FROM (
        SELECT o_custkey AS c FROM orders WHERE o_totalprice > 250000
        EXCEPT
        SELECT o_custkey AS c FROM orders WHERE o_orderpriority = '1-URGENT'
    ) t2
    """,
    # named-window (WINDOW clause) sharing one sort/partition spec across
    # two window functions — both engines plan ONE exchange+sort for w/w2
    "sql_front_named_window": """
    SELECT c_mktsegment, c_custkey, bal_cents, bal_rank, seg_running_cents
    FROM (
        SELECT c_mktsegment, c_custkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
               rank() OVER w AS bal_rank,
               CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) OVER w2
                    AS BIGINT) AS seg_running_cents
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
                              c_custkey),
               w2 AS (PARTITION BY c_mktsegment
                      ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
                               c_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ) t WHERE bal_rank <= 5
    ORDER BY c_mktsegment, bal_rank
    """,
    # correlated scalar subqueries in SELECT and WHERE: Catalyst
    # decorrelates both into aggregated joins (never a per-row re-scan),
    # so the textual form stays scale-safe — the deterministic id-hash
    # gate bounds the output, not the plan
    "sql_front_correlated_scalar_subquery": """
    SELECT o.o_orderkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey) AS n_items,
           (SELECT CAST(COALESCE(SUM(CAST(l.l_quantity AS BIGINT)), 0)
                        AS BIGINT) FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey) AS total_qty
    FROM orders o
    WHERE o.o_orderkey % 97 = 0
      AND CAST(round(o.o_totalprice * 100) AS BIGINT) *
          (SELECT COUNT(*) FROM orders o2
            WHERE o2.o_orderpriority = o.o_orderpriority) >
          (SELECT SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT))
             FROM orders o2 WHERE o2.o_orderpriority = o.o_orderpriority)
    ORDER BY o.o_orderkey
    """,
}


def _make(name: str, text: str):
    def _q(spark: SparkSession, sf_dir: str, _text: str = text) -> DataFrame:
        return sql(spark, sf_dir, _text)

    # rename BEFORE registering so the registry's import-time
    # name==function guard sees the intended identity
    _q.__name__ = name
    return register(
        name,
        oracle=text,
        doc="SQL front door: this exact SQL text is executed by BOTH Spark "
            "(sqlapi.sql over registered views) and the DuckDB oracle — "
            "textual entry point proven end to end.",
    )(_q)


for _name, _text in _SHARED_SQL.items():
    _make(_name, _text)


# --------------------------------------------------------------------------
# Dialect-mapped front-door queries: same semantics, engine-native spelling.
# Unlike _SHARED_SQL above (one text, two engines), these prove the front
# door can target dialect features Spark SQL lacks by mapping them to the
# equivalent ANSI form — the QUALIFY clause is the canonical example.

_QUALIFY_SPARK_SQL = """
SELECT o_orderpriority, o_orderkey, total_cents, rn FROM (
    SELECT o_orderpriority, o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
           row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                        o_orderkey
           ) AS rn
    FROM orders
) WHERE rn <= 3
ORDER BY o_orderpriority, rn
"""

_QUALIFY_DUCK_SQL = """
SELECT o_orderpriority, o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
       row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                    o_orderkey
       ) AS rn
FROM orders
QUALIFY rn <= 3
ORDER BY o_orderpriority, rn
"""


@register(
    "sql_front_qualify",
    oracle=_QUALIFY_DUCK_SQL,
    doc="QUALIFY-clause dialect mapping through the SQL front door: the "
        "oracle runs DuckDB's native QUALIFY (filter on a window result "
        "without a derived table); the Spark side runs the ANSI "
        "subquery-filter desugaring — the exact rewrite engines that "
        "lack QUALIFY apply internally (DuckDB docs describe QUALIFY as "
        "sugar for this form). Proves the front door covers the "
        "dialect-feature gap with identical semantics: both plans are "
        "one exchange + one sort + rank-filter, and Catalyst's "
        "WindowGroupLimit pushes the rn <= 3 limit INTO the sort at "
        "scale, so the top-3-per-group never materializes full "
        "partitions. Reference parity: extension surface (SURVEY.md "
        "§2.B SQL front door rows).",
)
def sql_front_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _QUALIFY_SPARK_SQL)


_PIVOT_SPARK_SQL = """
SELECT o_orderpriority, f_n, o_n, p_n, f_cents, o_cents, p_cents FROM (
    SELECT o_orderpriority, o_orderstatus,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
) PIVOT (
    COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
    FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p)
)
ORDER BY o_orderpriority
"""

_PIVOT_DUCK_SQL = """
SELECT o_orderpriority,
       CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS f_n,
       CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS o_n,
       CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS p_n,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
            AS BIGINT) AS f_cents,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
            AS BIGINT) AS o_cents,
       CAST(SUM(CASE WHEN o_orderstatus = 'P'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
            AS BIGINT) AS p_cents
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "sql_front_pivot",
    oracle=_PIVOT_DUCK_SQL,
    doc="PIVOT-clause dialect mapping through the SQL front door: the "
        "Spark side runs Spark SQL's native PIVOT (two aggregates x "
        "three pivot values -> six generated columns, one Expand-free "
        "hash aggregate under the hood — Catalyst compiles PIVOT to "
        "the same conditional-aggregation plan the DataFrame "
        ".pivot() API gets); the oracle states the identical "
        "semantics as portable ANSI conditional aggregation. Column "
        "names are pinned on both sides (f_n..p_cents) so the "
        "driver's sorted-column hash lines up. Scale: a 5-row x "
        "3-status aggregate — map-side combinable, one shuffle of "
        "15 cells. Reference parity: extension surface (SURVEY.md "
        "§2.B SQL front door rows).",
)
def sql_front_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _PIVOT_SPARK_SQL)


# Shared-text VALUES inline table (ANSI, identical in both engines): a
# literal target spine joined to computed revenue — the "small reference
# data lives in the query text" idiom.
_VALUES_SQL = """
SELECT t.region_name, t.target_cents,
       CAST(COALESCE(rv.revenue_cents, 0) AS BIGINT) AS revenue_cents,
       CAST(CASE WHEN COALESCE(rv.revenue_cents, 0) >= t.target_cents
                 THEN 1 ELSE 0 END AS BIGINT) AS target_met
FROM (VALUES ('AFRICA', 500000000),
             ('AMERICA', 900000000),
             ('ASIA', 700000000),
             ('EUROPE', 800000000),
             ('MIDDLE EAST', 400000000)) AS t(region_name, target_cents)
LEFT JOIN (
    SELECT r.r_name AS region_name,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
    GROUP BY r.r_name
) rv ON rv.region_name = t.region_name
ORDER BY t.region_name
"""


@register(
    "sql_front_values_spine",
    oracle=_VALUES_SQL,
    doc="SQL front door: inline VALUES table as the join spine — the "
        "identical ANSI text runs in BOTH engines (the _SHARED_SQL "
        "contract). Business targets live as literals in the query, "
        "LEFT JOINed to the computed per-region revenue so regions "
        "missing from the data still report target_met = 0 — the "
        "spine-completion idiom (cousin of the recursive-CTE month "
        "spine). Catalyst plans the VALUES side as a LocalRelation "
        "(zero scan) broadcast against the aggregated revenue. "
        "Reference parity: extension surface (SURVEY.md §2.B SQL "
        "front door rows).",
)
def sql_front_values_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _VALUES_SQL)


_DISTINCT_ON_SPARK_SQL = """
SELECT c_nationkey, c_custkey, bal_cents FROM (
    SELECT c_nationkey, c_custkey,
           CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
           row_number() OVER (
               PARTITION BY c_nationkey
               ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
                        c_custkey
           ) AS rn
    FROM customer
) WHERE rn = 1
ORDER BY c_nationkey
"""

_DISTINCT_ON_DUCK_SQL = """
SELECT DISTINCT ON (c_nationkey)
       CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
FROM customer
ORDER BY c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) DESC, c_custkey
"""


@register(
    "sql_front_distinct_on",
    oracle=_DISTINCT_ON_DUCK_SQL,
    doc="DISTINCT ON dialect mapping through the SQL front door "
        "(richest-customer-per-nation): the oracle runs DuckDB's "
        "Postgres-style DISTINCT ON with its ORDER BY tie-break; the "
        "Spark side runs the ANSI desugaring — row_number() over the "
        "same (partition, order) spec filtered to rn = 1, which is "
        "exactly how engines without DISTINCT ON express "
        "first-row-per-group (and Catalyst's WindowGroupLimit turns it "
        "into a per-partition top-1, never a full sort of the group). "
        "Sibling of sql_front_qualify in the dialect-mapped set. "
        "Reference parity: extension surface (SURVEY.md §2.B SQL "
        "front door rows).",
)
def sql_front_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _DISTINCT_ON_SPARK_SQL)


_ROLLUP_SHARED_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS lvl,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


@register(
    "sql_front_rollup",
    oracle=_ROLLUP_SHARED_SQL,
    doc="SQL front door: GROUP BY ROLLUP with GROUPING() markers — this "
        "exact text parses and executes on BOTH engines (status x "
        "priority hierarchy, subtotal and grand-total rows "
        "distinguished by the grouping level, NULL grouping keys "
        "COALESCEd so the three levels stay hash-distinguishable). The "
        "textual sibling of the DataFrame-side agg_rollup/"
        "agg_grouping_sets: proves the front door covers the OLAP "
        "subtotal surface, with the money measure exact-summed in "
        "BIGINT cents. Catalyst expands the rollup to a single Expand "
        "+ one hash aggregate — one shuffle regardless of level count. "
        "Reference parity: extension surface (SURVEY.md §2.B SQL "
        "front door rows).",
)
def sql_front_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _ROLLUP_SHARED_SQL)
