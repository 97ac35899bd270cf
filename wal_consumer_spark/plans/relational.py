"""Core relational surface: scans, projections, filters, every join flavour,
sorts/limits, set ops (SURVEY.md §2.B). Each query is a thin DataFrame plan —
Catalyst supplies pushdown, pruning, join selection; small dims are broadcast
explicitly so the plan stays shuffle-free on the dimension side at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from wal_consumer_spark.operators.asof import asof_join
from wal_consumer_spark.plans._util import davg, dsum, sql_davg, sql_dsum
from wal_consumer_spark.plans.registry import register
from wal_consumer_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Flagship aggregates (TPC-H-style)
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))',
                     'sum_disc_price', 'DECIMAL(25,4)')},
           {sql_dsum('CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))'
                     ' * CAST(1 + l_tax AS DECIMAL(12,2))', 'sum_charge', 'DECIMAL(38,6)')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: scan+filter+groupBy with exact decimal sums.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact integer-cents arithmetic: every input is an exact 2-decimal value,
    # so the per-row products are plain long multiplies inside whole-stage
    # codegen instead of BigDecimal ops (~30% faster at sf0.1), while staying
    # bit-identical to the decimal oracle. Only the SUM accumulates in
    # decimal — per-row charge < 1.3e12, so a 100 TB-scale row count (1e10)
    # still fits decimal(24,0)'s 1e24 headroom; a long accumulator would
    # overflow there, which is why the sum is NOT done in long.
    li = load_table(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    tax_c = F.round(F.col("l_tax") * 100).cast("long")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    disc_price = price_c * (100 - disc_c)  # scale 1e4
    charge = disc_price * (100 + tax_c)  # scale 1e6
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c.cast("decimal(20,0)")) / 100).cast("double").alias("sum_qty"),
            (F.sum(price_c.cast("decimal(20,0)")) / 100).cast("double").alias("sum_base_price"),
            (F.sum(disc_price.cast("decimal(22,0)")) / 10000)
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(charge.cast("decimal(24,0)")) / 1000000).cast("double").alias("sum_charge"),
            (F.sum(qty_c.cast("decimal(20,0)")).cast("double") / 100 / n).alias("avg_qty"),
            (F.sum(price_c.cast("decimal(20,0)")).cast("double") / 100 / n).alias("avg_price"),
            (F.sum(disc_c.cast("decimal(20,0)")).cast("double") / 100 / n).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_top_revenue",
    oracle=f"""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           {sql_dsum('CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(12,2))',
                     'revenue', 'DECIMAL(25,4)')}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q3-style: selective dim filter -> fact join -> agg -> global top-k.",
)
def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)")
    ).cast("decimal(25,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           {sql_dsum('CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(12,2))',
                     'revenue', 'DECIMAL(25,4)')},
           COUNT(*) AS n_lineitems
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="5-way star join rolled up to region/nation; dims broadcast.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)")
    ).cast("decimal(25,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# --------------------------------------------------------------------------
# Join flavours
# --------------------------------------------------------------------------

@register(
    "join_inner_basic",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 400000
    """,
    doc="Inner equi-join with filter pushdown on the fact side.",
)
def join_inner_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = load_table(spark, sf_dir, "customer")
    return o.join(broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    doc="Left outer join preserving customers with no orders.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), F.lit(0))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal < -900
    """,
    doc="Right outer join preserving the (filtered) customer side.",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < -900)
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    doc="Full outer join of per-nation customer and supplier counts.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return cn.join(sn, "nk", "full").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    doc="Left-semi join == EXISTS; no row multiplication.",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join == NOT EXISTS (customers who never ordered).",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_cross",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    """,
    doc="Cross join (tiny dims only; BroadcastNestedLoop).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    return r.select(F.col("r_name").alias("r1")).crossJoin(
        broadcast(r.select(F.col("r_name").alias("r2")))
    )


@register(
    "join_theta_nonequi",
    oracle="""
    SELECT a.n_name AS n1, b.n_name AS n2
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
                                AND a.n_regionkey = b.n_regionkey
    """,
    doc="Non-equi (theta) join: unordered nation pairs within a region.",
)
def join_theta_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k1"), F.col("n_name").alias("n1"),
        F.col("n_regionkey").alias("rk1"),
    )
    b = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k2"), F.col("n_name").alias("n2"),
        F.col("n_regionkey").alias("rk2"),
    )
    return (
        a.join(broadcast(b), (F.col("k1") < F.col("k2")) & (F.col("rk1") == F.col("rk2")))
        .select("n1", "n2")
    )


@register(
    "join_range_band",
    oracle="""
    SELECT p.p_partkey, p.p_size, l.l_orderkey, l.l_linenumber, l.l_quantity
    FROM part p JOIN lineitem l
      ON l.l_partkey = p.p_partkey
     AND l.l_quantity BETWEEN p.p_size - 2 AND p.p_size + 2
    """,
    doc="Equi + band (range) join condition.",
)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_quantity >= p.p_size - 2)
        & (li.l_quantity <= p.p_size + 2)
    )
    return li.join(broadcast(p), cond).select(
        "p_partkey", "p_size", "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "asof_join_events_orders",
    oracle="""
    WITH best AS (
        SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id
                     AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
    )
    SELECT e.event_id, e.user_id, e.event_type,
           b.o_orderkey AS asof_orderkey,
           b.o_totalprice AS asof_totalprice
    FROM events e
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.event_id = e.event_id
    """,
    doc="As-of join: each event -> latest prior order of the same user "
        "(union+window implementation, no pair explosion; operators/asof.py).",
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )
    joined = asof_join(
        e, o,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        payload_cols=["asof_orderkey", "asof_totalprice"],
        tiebreak_cols=["asof_orderkey"],
    )
    return joined.select("event_id", "user_id", "event_type", "asof_orderkey", "asof_totalprice")


@register(
    "asof_join_tolerance_error_click",
    oracle="""
    WITH err AS (
        SELECT event_id, user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events WHERE event_type = 'error'
    ),
    clk AS (
        SELECT event_id AS click_id, user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS cus
        FROM events WHERE event_type = 'click'
    ),
    best AS (
        SELECT e.event_id, c.click_id, c.cus,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY c.cus DESC, c.click_id DESC) AS rn
        FROM err e
        JOIN clk c ON c.user_id = e.user_id AND c.cus <= e.us
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN b.click_id IS NOT NULL
                     AND e.us - b.cus <= 3600000000
                THEN b.click_id END AS last_click_id,
           CASE WHEN b.click_id IS NOT NULL
                     AND e.us - b.cus <= 3600000000
                THEN (e.us - b.cus) // 1000000 END AS secs_since_click,
           CAST(CASE WHEN b.click_id IS NOT NULL
                          AND e.us - b.cus <= 3600000000
                     THEN 1 ELSE 0 END AS BIGINT) AS matched_within_1h
    FROM err e
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        ON b.event_id = e.event_id
    """,
    doc="Tolerance-bounded as-of join (pandas merge_asof's `tolerance`): "
        "each error event takes the same user's most recent click, but "
        "ONLY if it happened within the last hour — matches staler than "
        "the tolerance become NULL (a feature-store staleness cap: a "
        "26-hour-old context row is not a feature, it is leakage of a "
        "dead session). Runs as the engine's standard union+window as-of "
        "(operators/asof.py — one user-keyed shuffle, no event-to-event "
        "range join) followed by a row-local tolerance gate on the "
        "carried match timestamp; exact epoch-microsecond arithmetic. "
        "The oracle replays the naive rank-picked formulation. Reference "
        "parity: extension surface (SURVEY.md §2.B as-of rows).",
)
def asof_join_tolerance_error_click(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    err = e.where(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ets"),
        us.alias("us"),
    )
    clk = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("cts"),
        F.col("event_id").alias("click_id"),
        us.alias("matched_cus"),
    )
    joined = asof_join(
        err,
        clk,
        left_key="user_id",
        right_key="user_id",
        left_ts="ets",
        right_ts="cts",
        payload_cols=["click_id", "matched_cus"],
        tiebreak_cols=["click_id"],
    )
    in_tol = F.col("click_id").isNotNull() & (
        F.col("us") - F.col("matched_cus") <= 3_600_000_000
    )
    return joined.select(
        "event_id",
        "user_id",
        F.when(in_tol, F.col("click_id")).alias("last_click_id"),
        F.when(
            in_tol,
            F.expr("(us - matched_cus) div 1000000"),
        ).alias("secs_since_click"),
        in_tol.cast("long").alias("matched_within_1h"),
    )


# --------------------------------------------------------------------------
# Sort / limit / set ops / distinct
# --------------------------------------------------------------------------

@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    doc="Global top-k: TakeOrderedAndProject, no full sort.",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "sort_multi_nulls",
    oracle="""
    SELECT c_custkey, c_mktsegment, NULLIF(c_acctbal, 0.0) AS bal
    FROM customer
    ORDER BY c_mktsegment ASC, bal DESC NULLS LAST, c_custkey
    LIMIT 200
    """,
    doc="Multi-key sort with explicit null ordering (nulls via NULLIF).",
)
def sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey", "c_mktsegment",
            F.nullif(F.col("c_acctbal"), F.lit(0.0)).alias("bal"),
        )
        .orderBy(F.col("c_mktsegment").asc(), F.col("bal").desc_nulls_last(), F.col("c_custkey"))
        .limit(200)
    )


@register(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
    doc="UNION ALL via unionByName.",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION DISTINCT.",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey AS custkey FROM orders
    """,
    doc="INTERSECT (distinct semantics).",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.intersect(o)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
    doc="EXCEPT (distinct semantics).",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o)


@register(
    "distinct_projection",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="DISTINCT over a projection.",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "dedup_keep_first",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id,
           CAST(ts AS TIMESTAMP) AS first_ts
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="Deterministic dropDuplicates: keep earliest row per key via window "
        "(dropDuplicates picks an arbitrary row; this formulation is stable).",
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH iv AS (
        SELECT user_id, ts AS start_ts, ts + INTERVAL 1 HOUR AS end_ts
        FROM events WHERE event_type = 'signup'
    ),
    p AS (
        SELECT user_id, ts, event_type, value
        FROM events WHERE event_type <> 'signup'
    )
    SELECT p.event_type,
           COUNT(*) AS n_overlaps,
           CAST(SUM(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM p
    JOIN iv ON iv.user_id = p.user_id
           AND p.ts >= iv.start_ts AND p.ts < iv.end_ts
    GROUP BY p.event_type
    """,
    doc="Interval-overlap join: activity events landing inside the 1-hour "
        "window after each signup event of the same user. Equi key "
        "(user_id) + range predicate: Catalyst plans the equi part as a "
        "shuffled hash/sort-merge join and applies the range as a "
        "post-join filter, so there is no pair explosion — the batch "
        "analog of the streaming interval join in "
        "tests/test_streaming_ext.py. Both interval and probe sides come "
        "from the events table, so the result is non-degenerate at every "
        "scale factor (the earlier orders-x-events formulation was "
        "vacuously empty: the two tables' time ranges never intersect in "
        "this testdata).",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    iv = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("iv_user"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
    )
    p = e.filter(F.col("event_type") != "signup").select(
        "user_id", "ts", "event_type", "value"
    )
    cond = (
        (p["user_id"] == iv["iv_user"])
        & (p["ts"] >= iv["start_ts"])
        & (p["ts"] < iv["end_ts"])
    )
    return (
        p.join(iv, cond)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            dsum("value", "sum_value"),
        )
    )


@register(
    "asof_join_forward_events_orders",
    oracle="""
    WITH best AS (
        SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id
                     AND o.o_orderdate >= CAST(e.ts AS TIMESTAMP)
    )
    SELECT e.event_id, e.user_id, e.event_type,
           b.o_orderkey AS next_orderkey,
           b.o_totalprice AS next_totalprice
    FROM events e
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.event_id = e.event_id
    """,
    doc="Forward as-of join: each event -> earliest subsequent order of the "
        "same user (direction='forward' of operators/asof.py — the same "
        "one-shuffle union+carry traversed in reverse time order).",
)
def asof_join_forward_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate",
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_totalprice").alias("next_totalprice"),
    )
    joined = asof_join(
        e, o,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        payload_cols=["next_orderkey", "next_totalprice"],
        tiebreak_cols=["next_orderkey"],
        direction="forward",
    )
    return joined.select("event_id", "user_id", "event_type", "next_orderkey", "next_totalprice")


@register(
    "join_range_keyless_binned",
    oracle="""
    WITH w AS (
        SELECT event_id AS window_id,
               CAST(ts AS TIMESTAMP) AS w_start,
               CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR AS w_end
        FROM events WHERE event_id % 499 = 0
    )
    SELECT w.window_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM w JOIN events e
      ON CAST(e.ts AS TIMESTAMP) >= w.w_start
     AND CAST(e.ts AS TIMESTAMP) <  w.w_end
    GROUP BY w.window_id
    """,
    doc="Keyless interval join, binned formulation. Every 499th event opens a "
        "2-hour 'incident window'; count/sum all events (any user) landing "
        "inside each window. There is NO equi key, so the naive plan is a "
        "BroadcastNestedLoopJoin — O(|e|x|w|) comparisons, the one join shape "
        "that cannot survive 100 TB. Scale path: discretize time into 1-hour "
        "bins, explode each window into the bins it covers (<=3 rows), "
        "equi-join on the bin, keep the range predicate as a residual filter. "
        "An event's bin hits exactly one exploded row per window, so no "
        "dedupe is needed. The bin join is left un-hinted: AQE broadcasts "
        "the window side while it fits and falls back to a shuffled hash "
        "join on the bin when it does not. Plan asserted nested-loop-free "
        "in tests/test_scale_plans.py.",
)
def join_range_keyless_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    w = (
        e.filter(F.col("event_id") % 499 == 0)
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOUR")).alias("w_end"),
        )
        .withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.date_trunc("hour", F.col("w_start")),
                    F.date_trunc("hour", F.col("w_end")),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ),
        )
    )
    eb = e.withColumn("bin", F.date_trunc("hour", F.col("ts")))
    return (
        eb.join(
            w,
            (eb["bin"] == w["bin"])
            & (eb["ts"] >= w["w_start"])
            & (eb["ts"] < w["w_end"]),
        )
        .groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
    )


@register(
    "join_null_safe_eq",
    oracle="""
    WITH c AS (
        SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL
                    ELSE c_nationkey END AS ck
        FROM customer
    ),
    s AS (
        SELECT CASE WHEN s_suppkey % 5 = 0 THEN NULL
                    ELSE s_nationkey END AS sk
        FROM supplier
    )
    SELECT COALESCE(c.ck, -1) AS nation_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM c JOIN s ON c.ck IS NOT DISTINCT FROM s.sk
    GROUP BY COALESCE(c.ck, -1)
    """,
    doc="Null-safe equality join (Spark <=> / SQL IS NOT DISTINCT FROM): "
        "NULL keys match each other instead of vanishing, here on "
        "deterministically nulled nation keys. Spark plans <=> as a real "
        "hash-join key (NULLs hash to one partition) — semantically an "
        "equi join, so no nested loop; note the NULL bucket is the "
        "canonical skew hot spot at scale, the case operators/skew.py's "
        "salted_join exists for.",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("ck")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.when(F.col("s_suppkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("s_nationkey"))
        .alias("sk")
    )
    return (
        c.join(s, c["ck"].eqNullSafe(s["sk"]))
        .groupBy(F.coalesce(c["ck"], F.lit(-1)).alias("nation_bucket"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_skew_salted",
    oracle="""
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
    doc="Skew-salted join certified against the plain-join oracle: the fact "
        "side's rows get a deterministic-per-row salt, the dim side is "
        "replicated once per salt bucket, and the join key becomes "
        "(key, salt) — spreading any hot key over salt_buckets reducers "
        "(operators/skew.py::salted_join; equivalence also property-tested "
        "in tests/test_skew_ingest.py). The aggregate over the salted "
        "join's output is EXACTLY the unsalted join's, which is what the "
        "oracle checks. Use when one side is too big to broadcast and a "
        "key is too hot for AQE's skew split; replication factor = "
        "salt_buckets on the small side only.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"), "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"), F.col("p_brand").alias("brand")
    )
    return (
        salted_join(li, p, key="pk", salt_buckets=8)
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            dsum("l_quantity", "sum_qty"),
        )
        .orderBy("brand")
    )


def _bloom_pos_spark(col: F.Column, lo: int, m: int) -> F.Column:
    """Bloom bit position from md5 hex chars [lo, lo+8) of the key — the
    same md5-slice primitive as the split/shuffle hash gates
    (plans/curation.py::_split_hash_spark)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("string")), lo, 8), 16, 10).cast("long"),
        F.lit(m),
    )


def _bloom_pos_sql(expr: str, lo: int, m: int) -> str:
    return (
        f"('0x' || substring(md5(CAST({expr} AS VARCHAR)), {lo}, 8))::BIGINT % {m}"
    )


_BLOOM_M = 8192  # bits; build side is <= ~3k distinct keys at sf0.01


@register(
    "join_bloom_prefilter",
    oracle=f"""
    WITH build AS (
        SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    bits AS (
        SELECT {_bloom_pos_sql('c_custkey', 1, _BLOOM_M)} AS bit FROM build
        UNION
        SELECT {_bloom_pos_sql('c_custkey', 9, _BLOOM_M)} AS bit FROM build
    ),
    probe AS (
        SELECT o_orderkey, o_custkey,
               {_bloom_pos_sql('o_custkey', 1, _BLOOM_M)} AS h1,
               {_bloom_pos_sql('o_custkey', 9, _BLOOM_M)} AS h2
        FROM orders
    ),
    flagged AS (
        SELECT p.o_orderkey,
               (p.h1 IN (SELECT bit FROM bits)
                AND p.h2 IN (SELECT bit FROM bits)) AS bloom_hit,
               p.o_custkey IN (SELECT c_custkey FROM build) AS exact_hit
        FROM probe p
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
           CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_pass,
           CAST(SUM(CASE WHEN bloom_hit AND NOT exact_hit THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positive,
           bool_and(NOT exact_hit OR bloom_hit) AS no_false_negatives
    FROM flagged
    """,
    doc="Bloom-filter semi-join prefilter, the runtime-filter pattern a "
        "100 TB fact-dim join lives on: hash every build-side key into a "
        f"k=2, m={_BLOOM_M}-bit filter, broadcast the SET BITS (<= 2|build| "
        "rows, bytes not gigabytes), and gate the fact scan on membership "
        "of both probe positions BEFORE any shuffle — false positives "
        "possible (counted), false negatives impossible (asserted in-plan "
        "via no_false_negatives, the same exact+bound certification used "
        "for the CMS/HLL sketches). Spark's own runtime row-level filtering "
        "(spark.sql.optimizer.runtime.bloomFilter.enabled) does this "
        "transparently inside the optimizer; this query expresses the plan "
        "explicitly so the mechanism itself is oracle-certified. Both "
        "engines derive positions from the identical md5-slice hash, so "
        "the false-positive set — not just its count — is bit-identical. "
        "Scale: bits/build-keys broadcast (plan-asserted in "
        "tests/test_scale_plans.py); the probe never shuffles.",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    build = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey").distinct()
    bits = (
        build.select(_bloom_pos_spark(F.col("c_custkey"), 1, _BLOOM_M).alias("bit"))
        .unionByName(
            build.select(_bloom_pos_spark(F.col("c_custkey"), 9, _BLOOM_M).alias("bit"))
        )
        .distinct()
    )
    probe = o.select(
        "o_orderkey",
        "o_custkey",
        _bloom_pos_spark(F.col("o_custkey"), 1, _BLOOM_M).alias("h1"),
        _bloom_pos_spark(F.col("o_custkey"), 9, _BLOOM_M).alias("h2"),
    )
    b1 = bits.select(F.col("bit").alias("h1"), F.lit(1).alias("m1"))
    b2 = bits.select(F.col("bit").alias("h2"), F.lit(1).alias("m2"))
    bk = build.select(F.col("c_custkey").alias("o_custkey"), F.lit(1).alias("mx"))
    # b1/b2 are bit-position tables (bounded by _BLOOM_M — value domain);
    # bk is the EXACT membership list the certification compares against,
    # which is entity-keyed and corpus-scaled, so its hint goes through
    # the size gate (at 100 TB this side becomes a shuffled join / AQE
    # decision — the bloom bits are the part that stays broadcastable).
    from wal_consumer_spark.operators.broadcast import maybe_broadcast

    flagged = (
        probe.join(broadcast(b1), "h1", "left")
        .join(broadcast(b2), "h2", "left")
        .join(maybe_broadcast(bk), "o_custkey", "left")
        .select(
            (F.col("m1").isNotNull() & F.col("m2").isNotNull()).alias("bloom_hit"),
            F.col("mx").isNotNull().alias("exact_hit"),
        )
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).cast("long")
        .alias("n_bloom_pass"),
        F.sum(F.when(F.col("exact_hit"), 1).otherwise(0)).cast("long")
        .alias("n_exact_pass"),
        F.sum(F.when(F.col("bloom_hit") & ~F.col("exact_hit"), 1).otherwise(0))
        .cast("long").alias("n_false_positive"),
        F.bool_and(~F.col("exact_hit") | F.col("bloom_hit")).alias("no_false_negatives"),
    )


@register(
    "asof_join_nearest_events_orders",
    oracle="""
    WITH back AS (
        SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(o.o_orderdate)
                   AS dist_us,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate DESC,
                                           o.o_orderkey DESC) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id
                     AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
    ),
    fwd AS (
        SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               epoch_us(o.o_orderdate) - epoch_us(CAST(e.ts AS TIMESTAMP))
                   AS dist_us,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate ASC,
                                           o.o_orderkey ASC) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id
                     AND o.o_orderdate > CAST(e.ts AS TIMESTAMP)
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN b.event_id IS NOT NULL
                     AND (f.event_id IS NULL OR b.dist_us <= f.dist_us)
                THEN b.o_orderkey ELSE f.o_orderkey END AS nearest_orderkey,
           CASE WHEN b.event_id IS NOT NULL
                     AND (f.event_id IS NULL OR b.dist_us <= f.dist_us)
                THEN b.o_totalprice ELSE f.o_totalprice END
               AS nearest_totalprice,
           CASE WHEN b.event_id IS NULL AND f.event_id IS NULL THEN NULL
                WHEN b.event_id IS NOT NULL
                     AND (f.event_id IS NULL OR b.dist_us <= f.dist_us)
                THEN 'backward' ELSE 'forward' END AS direction
    FROM events e
    LEFT JOIN (SELECT * FROM back WHERE rn = 1) b ON b.event_id = e.event_id
    LEFT JOIN (SELECT * FROM fwd WHERE rn = 1) f ON f.event_id = e.event_id
    """,
    doc="Nearest-in-time as-of join (absolute distance, backward wins "
        "ties): each event matched to the same user's closest order in "
        "EITHER time direction — the pandas merge_asof(direction="
        "'nearest') semantics. Composed from the engine's backward and "
        "forward as-of operators (operators/asof.py union+window plans — "
        "no pair explosion), then one event_id-keyed pick of the nearer "
        "side with exact microsecond distances. Three narrow key shuffles "
        "total at any scale; the oracle replays the same semantics with "
        "windowed candidate joins. Reference parity: extension surface "
        "(SURVEY.md §2.B as-of row).",
)
def asof_join_nearest_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders")

    def side(direction: str, okey: str, oval: str) -> DataFrame:
        ob = o.select(
            "o_custkey",
            "o_orderdate",
            F.col("o_orderkey").alias(okey),
            F.col("o_totalprice").alias(oval),
        )
        j = asof_join(
            e,
            ob,
            left_key="user_id",
            right_key="o_custkey",
            left_ts="ts",
            right_ts="o_orderdate",
            payload_cols=[okey, oval, "o_orderdate"],
            tiebreak_cols=[okey],
            direction=direction,
        )
        dist = F.abs(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        )
        return j.select(
            "event_id",
            "user_id",
            F.col(okey),
            F.col(oval),
            F.when(F.col(okey).isNotNull(), dist).alias(f"dist_{direction}"),
        )

    b = side("backward", "b_key", "b_val")
    f = side("forward", "f_key", "f_val").drop("user_id")
    both = b.join(f, "event_id", "full")
    pick_back = F.col("b_key").isNotNull() & (
        F.col("f_key").isNull()
        | (F.col("dist_backward") <= F.col("dist_forward"))
    )
    return both.select(
        "event_id",
        "user_id",
        F.when(pick_back, F.col("b_key")).otherwise(F.col("f_key")).alias(
            "nearest_orderkey"
        ),
        F.when(pick_back, F.col("b_val")).otherwise(F.col("f_val")).alias(
            "nearest_totalprice"
        ),
        F.when(
            F.col("b_key").isNull() & F.col("f_key").isNull(), F.lit(None)
        )
        .when(pick_back, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


@register(
    "set_bag_except_intersect_all",
    oracle="""
    WITH ea AS (
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        EXCEPT ALL
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    ),
    ia AS (
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        INTERSECT ALL
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    )
    SELECT 'except_all' AS op, CAST(l_partkey AS BIGINT) AS part_key,
           CAST(COUNT(*) AS BIGINT) AS multiplicity
    FROM ea GROUP BY 2
    UNION ALL
    SELECT 'intersect_all' AS op, CAST(l_partkey AS BIGINT) AS part_key,
           CAST(COUNT(*) AS BIGINT) AS multiplicity
    FROM ia GROUP BY 2
    """,
    doc="Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL): the "
        "surviving multiplicity per part key between the returned-'R' and "
        "returned-'A' line-item multisets — max(na - nb, 0) and "
        "min(na, nb) per key, which is what dataframe exceptAll / "
        "intersectAll compute. Complements the round-4 ANSI "
        "INTERSECT/EXCEPT (distinct) rows: bag semantics is the "
        "correct tool for inventory-style reconciliation where COUNT "
        "matters. Spark plans both as a single hash aggregate of "
        "per-side counts (no sort, no join explosion); the grouped "
        "multiplicity output keeps the driver hash deterministic. "
        "Reference parity: extension surface (SURVEY.md §2.B set-ops "
        "row).",
)
def set_bag_except_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "R").select("l_partkey")
    b = li.where(F.col("l_returnflag") == "A").select("l_partkey")
    ea = (
        a.exceptAll(b)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("multiplicity"))
        .select(
            F.lit("except_all").alias("op"),
            F.col("l_partkey").cast("long").alias("part_key"),
            "multiplicity",
        )
    )
    ia = (
        a.intersectAll(b)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("multiplicity"))
        .select(
            F.lit("intersect_all").alias("op"),
            F.col("l_partkey").cast("long").alias("part_key"),
            "multiplicity",
        )
    )
    return ea.unionByName(ia)


@register(
    "set_symmetric_diff_tagged",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders
               WHERE o_orderstatus = 'F'),
    b AS (SELECT DISTINCT o_custkey AS custkey FROM orders
          WHERE o_orderstatus = 'O'),
    l AS (SELECT custkey FROM a EXCEPT SELECT custkey FROM b),
    r AS (SELECT custkey FROM b EXCEPT SELECT custkey FROM a)
    SELECT 'finished_only' AS side, custkey FROM l
    UNION ALL
    SELECT 'open_only' AS side, custkey FROM r
    """,
    doc="Symmetric difference with side tags: customers whose orders are "
        "ALL finished ('F') vs ALL open ('O') — the two one-sided EXCEPTs "
        "of the distinct custkey sets, each labeled with which side it "
        "came from. Completes the set-ops family (union/intersect/"
        "except/bag-all) with the reconciliation shape ops teams "
        "actually run ('what is in A but not B, and vice versa, in one "
        "result'). Spark plans each subtract as a null-safe hash "
        "anti-aggregate over the SAME o_custkey shuffle key, so AQE can "
        "reuse the exchange; no row explosion anywhere. Reference "
        "parity: extension surface (SURVEY.md §2.B set-ops row).",
)
def set_symmetric_diff_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = (
        o.where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    b = (
        o.where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    left_only = a.subtract(b).select(
        F.lit("finished_only").alias("side"), "custkey"
    )
    right_only = b.subtract(a).select(
        F.lit("open_only").alias("side"), "custkey"
    )
    return left_only.unionByName(right_only)
