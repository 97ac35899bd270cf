"""Window-function surface: ranking, lag/lead, running/range frames, ntile,
top-k per group (SURVEY.md §2.B "Window functions").

Every ORDER BY carries a unique tiebreaker so ranks are total and results
hash-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wal_consumer_spark.plans.registry import register
from wal_consumer_spark.sources.tables import load_table


@register(
    "win_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) WHERE rn <= 5
    """,
    doc="Top-k per group: row_number + filter (partial topK pushed down per "
        "partition by Catalyst's WindowGroupLimit at scale).",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
    )


@register(
    "win_topk_with_ties",
    oracle="""
    SELECT p_brand, p_partkey, p_size, rnk FROM (
        SELECT p_brand, p_partkey, p_size,
               rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rnk
        FROM part
    ) WHERE rnk <= 3
    """,
    doc="Ties-INCLUSIVE top-k per group (SQL's WITH TIES semantics): "
        "rank() with NO tie-break column, so every row sharing a "
        "qualifying value survives — the correct semantics when top-k "
        "feeds a business rule ('all parts of the 3 largest sizes') and "
        "dropping an arbitrary tied row would be wrong. Complements "
        "win_topk_per_group's row_number() (exactly-k) variant. The "
        "result is SET-deterministic without any tie-break because ties "
        "are kept, not picked among — order-insensitive hash-safe. Same "
        "scale shape: one partitioned window, WindowGroupLimit pushdown "
        "applies since rank() is monotone per partition. Reference "
        "parity: extension surface (SURVEY.md §2.B window rows).",
)
def win_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return (
        p.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_size", "rnk")
    )


@register(
    "win_rank_dense_ntile",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           rank()       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rnk,
           dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS drnk,
           ntile(4)     OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS quartile
    FROM supplier
    """,
    doc="rank / dense_rank / ntile over one partition spec (single shuffle).",
)
def win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select(
        "s_suppkey", "s_nationkey", "s_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - COALESCE(lag(value) OVER w, 0.0) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    doc="lag/lead with a shared window spec.",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0))).alias("delta"),
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spent,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS first_orderkey,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_orderkey
    FROM orders
    """,
    doc="Running aggregate frame (rowsBetween) + first/last over frame; "
        "decimal running sum keeps it order-exact.",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w)
        .cast("double").alias("running_spent"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(w).alias("last_orderkey"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           COUNT(*) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
                          RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS n_peers
    FROM supplier
    """,
    doc="RANGE frame: peers within +/-500 account balance in the nation.",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal").rangeBetween(-500, 500)
    return s.select(
        "s_suppkey", "s_nationkey", "s_acctbal",
        F.count(F.lit(1)).over(w).alias("n_peers"),
    )


@register(
    "win_cume_percent",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(percent_rank() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal, c_custkey), 9) AS pct_rank,
           round(cume_dist() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal, c_custkey), 9) AS cume
    FROM customer
    """,
    doc="percent_rank / cume_dist (rounded: both engines compute k/n doubles).",
)
def win_cume_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", "c_mktsegment",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


@register(
    "win_sessionize_gap",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN epoch(CAST(ts AS TIMESTAMP))
                         - epoch(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800
                         OR lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    s AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM g
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM s GROUP BY user_id, session_idx
    """,
    doc="Gap-based sessionization (30-min inactivity) via lag + running sum "
        "of session-break flags — the batch formulation of session_window "
        "(cf. stream_session_window), one window shuffle on user_id that the "
        "final per-session rollup reuses.",
)
def win_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 1800)
    ).cast("int")
    s = e.withColumn(
        "session_idx",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


@register(
    "win_first_last_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           first_value(big_val IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS first_big,
           last_value(big_val IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_big
    FROM (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN value >= 50 THEN round(value, 2) END AS big_val
        FROM events
    )
    """,
    doc="first/last with IGNORE NULLS over a running frame — the "
        "carry-forward-last-observation primitive (gap filling in time "
        "series). Nulls are derived deterministically (value < 50 -> NULL) "
        "since the synthetic tables are fully populated.",
)
def win_first_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    big = F.when(F.col("value") >= 50, F.round("value", 2))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select("event_id", "user_id", "ts", big.alias("big_val")).select(
        "event_id",
        "user_id",
        F.first("big_val", ignorenulls=True).over(w).alias("first_big"),
        F.last("big_val", ignorenulls=True).over(w).alias("last_big"),
    )


@register(
    "win_zscore_outliers",
    oracle="""
    WITH s AS (
        SELECT event_id, user_id, value,
               COUNT(*) OVER (PARTITION BY user_id) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2)))
                    OVER (PARTITION BY user_id) AS DOUBLE) AS sx,
               CAST(SUM(CAST(value AS DECIMAL(12,2))
                        * CAST(value AS DECIMAL(12,2)))
                    OVER (PARTITION BY user_id) AS DOUBLE) AS sxx
        FROM events
    )
    SELECT event_id, user_id, round(value, 2) AS obs_value,
           round((value - sx / n)
                 / sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS z
    FROM s
    WHERE n >= 10
      AND (sxx - sx * sx / n) / (n - 1) > 0
      AND abs((value - sx / n)
              / sqrt((sxx - sx * sx / n) / (n - 1))) > 2.5
    """,
    doc="Per-entity anomaly detection: z-score each event against its "
        "user's mean/stddev and keep |z| > 2.5 outliers. The moments come "
        "from exact decimal power sums over an unordered partition window "
        "(order-independent, both engines bit-identical); users with <10 "
        "events or zero variance are excluded. One hash shuffle on user_id; "
        "at 100 TB the same statistics could come from a pre-aggregated "
        "per-user profile broadcast against the stream.",
)
def win_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = F.col("value").cast("decimal(12,2)")
    w = Window.partitionBy("user_id")
    n = F.count(F.lit(1)).over(w)
    sx = F.sum(d).over(w).cast("double")
    sxx = F.sum(d * d).over(w).cast("double")
    mean = sx / n
    var = (sxx - sx * sx / n) / (n - F.lit(1))
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        e.select(
            "event_id",
            "user_id",
            F.round("value", 2).alias("obs_value"),
            F.round(z, 4).alias("z"),
            n.alias("__n"), var.alias("__var"), z.alias("__z"),
        )
        .filter((F.col("__n") >= 10) & (F.col("__var") > 0) & (F.abs("__z") > 2.5))
        .drop("__n", "__var", "__z")
    )


@register(
    "win_moving_median",
    oracle="""
    SELECT event_id, event_type,
           round(median(value) OVER (
               PARTITION BY event_type ORDER BY CAST(ts AS TIMESTAMP), event_id
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
           ), 6) AS moving_median
    FROM events
    """,
    doc="Centered 7-point moving MEDIAN per event_type — the robust "
        "smoother (immune to single-spike outliers) next to the moving "
        "averages the frame family already covers. Spark has no median "
        "window function, so the frame's values are collected+sorted per "
        "row (bounded: 7 elements, constant memory) and the median is the "
        "interpolated middle — exactly DuckDB's windowed median() "
        "semantics, including the (a+b)/2 even-count case at partition "
        "edges. One event_type shuffle; the frame work is O(7 log 7) per "
        "row regardless of corpus size.",
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid_hi = arr[(n / 2).cast("int")]          # 0-based upper middle
    mid_lo = arr[((n - 1) / 2).cast("int")]    # 0-based lower middle
    return e.select(
        "event_id",
        "event_type",
        F.round((mid_lo + mid_hi) / 2, 6).alias("moving_median"),
    )


@register(
    "win_cumulative_distinct",
    oracle="""
    WITH marked AS (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events
    )
    SELECT event_id, user_id,
           CAST(SUM(first_seen) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_distinct_types
    FROM marked
    """,
    doc="Running COUNT(DISTINCT) over an ordered stream — per user, how "
        "many distinct event types have appeared up to and including each "
        "event. SQL engines cannot express COUNT(DISTINCT ...) OVER "
        "directly; the scalable formulation marks each (user, type)'s "
        "first occurrence with one row_number window, then running-sums "
        "the 0/1 markers with a second window on the same user_id "
        "partitioning — two sorts, zero state proportional to the "
        "distinct-value universe (the naive collect_set-over-frame "
        "approach carries a growing set per row and explodes at scale). "
        "Ties are impossible: (ts, event_id) is unique per user. "
        "Reference parity: extension surface (SURVEY.md §2.B windows).",
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return marked.select(
        "event_id",
        "user_id",
        F.sum("first_seen").over(w_run).cast("long").alias("cum_distinct_types"),
    )


@register(
    "win_rolling_autocorr",
    oracle="""
    WITH c AS (
        SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CAST(value * 100 AS DECIMAL(18,0)) AS x
        FROM events
    ),
    lagged AS (
        SELECT event_type, event_id, ts, x,
               lag(x) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS y
        FROM c
    ),
    sums AS (
        SELECT event_type, event_id, ts,
               CAST(COUNT(y) OVER w AS BIGINT) AS n,
               CAST(SUM(x) OVER w AS DOUBLE) AS sx,
               CAST(SUM(y) OVER w AS DOUBLE) AS sy,
               CAST(SUM(x * y) OVER w AS DOUBLE) AS sxy,
               CAST(SUM(x * x) OVER w AS DOUBLE) AS sxx,
               CAST(SUM(y * y) OVER w AS DOUBLE) AS syy
        FROM lagged
        WHERE y IS NOT NULL
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, event_id,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS autocorr_14
    FROM sums
    WHERE n = 14
      AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    """,
    doc="Rolling lag-1 autocorrelation over a 14-observation window per "
        "series — the regime-shift / seasonality-onset detector that "
        "rolling mean and variance miss. Same exactness discipline as "
        "analytics_ab_welch_ttest: every windowed sum (x, y, xy, x^2, "
        "y^2) accumulates exact DECIMAL cents over the frame, and the "
        "Pearson formula touches doubles only on those identical "
        "integers, so the correlation is bit-identical across engines "
        "and partitionings. One window sort per series shared by the lag "
        "and all five frame sums (same partitioning AND ordering — "
        "Catalyst plans one Sort + one Window node); partial frames and "
        "zero-variance frames are excluded exactly (integer compares). "
        "Reference parity: extension surface (SURVEY.md §2.B windows).",
)
def win_rolling_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_type",
        "event_id",
        "ts",
        (F.col("value") * 100).cast("decimal(18,0)").alias("x"),
    )
    w_ord = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = c.withColumn("y", F.lag("x").over(w_ord)).filter(
        F.col("y").isNotNull()
    )
    w = w_ord.rowsBetween(-13, Window.currentRow)
    sums = lagged.select(
        "event_type",
        "event_id",
        F.count("y").over(w).cast("long").alias("n"),
        F.sum("x").over(w).cast("double").alias("sx"),
        F.sum("y").over(w).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("double").alias("syy"),
    )
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        sums.filter((F.col("n") == 14) & (var_x > 0) & (var_y > 0))
        .select(
            "event_type",
            "event_id",
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.sqrt(var_x * var_y),
                6,
            ).alias("autocorr_14"),
        )
    )


@register(
    "win_trailing_7d_revenue",
    oracle="""
    WITH daily AS (
        SELECT l_returnflag,
               CAST(CAST(l_shipdate AS TIMESTAMP) AS DATE) AS d,
               datediff('day', DATE '1995-01-01',
                        CAST(CAST(l_shipdate AS TIMESTAMP) AS DATE)) AS dayidx,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1, 2, 3
    )
    SELECT l_returnflag, CAST(d AS TIMESTAMP) AS day,
           CAST(SUM(cents) OVER (
               PARTITION BY l_returnflag ORDER BY dayidx
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_7d_cents
    FROM daily
    """,
    doc="Time-interval trailing window (7 calendar days, inclusive): daily "
        "revenue per return flag with a RANGE frame over the day INDEX — "
        "a true calendar-range frame, immune to missing days (a ROWS "
        "frame would silently span gaps; win_range_frame covers numeric "
        "ranges, this covers time). The corpus collapses to the bounded "
        "(flag, day) grid in exact cents first; the range window runs "
        "per-flag on ~2.4k rows. Day index is an epoch-anchored datediff "
        "— identical in both engines. Reference parity: extension surface "
        "(SURVEY.md §2.B window rows).",
)
def win_trailing_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_returnflag",
        F.to_date("l_shipdate").alias("d"),
        F.datediff(
            F.to_date("l_shipdate"), F.lit("1995-01-01").cast("date")
        ).alias("dayidx"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("dayidx")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "l_returnflag",
        F.col("d").cast("timestamp").alias("day"),
        F.sum("cents").over(w).cast("long").alias("trailing_7d_cents"),
    )


@register(
    "win_share_of_group",
    oracle="""
    WITH n AS (
        SELECT c_nationkey,
               CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS nation_cents,
               CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM customer WHERE c_acctbal > 0 GROUP BY c_nationkey
    )
    SELECT c_nationkey, nation_cents, n_cust,
           round(CAST(nation_cents AS DOUBLE)
                 / CAST(SUM(CAST(nation_cents AS DECIMAL(38,0))) OVER ()
                        AS DOUBLE), 6) AS share_of_total,
           round(CAST(nation_cents AS DOUBLE)
                 / CAST(MAX(nation_cents) OVER () AS DOUBLE), 6)
               AS vs_largest
    FROM n
    """,
    doc="Contribution analysis (percent-of-total and vs-largest per "
        "group — the 'which segments matter' decomposition on every "
        "revenue report): per-nation positive balances aggregated in "
        "exact cents, then two unpartitioned window ratios over the "
        "BOUNDED nation table (the window is global only because the "
        "grouped table is ~25 rows; contribution WITHIN groups would "
        "partition it). Exact DECIMAL totals; the two divisions are "
        "identical doubles. Reference parity: extension surface "
        "(SURVEY.md §2.B window rows).",
)
def win_share_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    n = c.groupBy("c_nationkey").agg(
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("nation_cents"),
        F.count(F.lit(1)).alias("n_cust"),
    )
    wtot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return n.select(
        "c_nationkey",
        "nation_cents",
        "n_cust",
        F.round(
            F.col("nation_cents").cast("double")
            / F.sum(F.col("nation_cents").cast("decimal(38,0)"))
            .over(wtot)
            .cast("double"),
            6,
        ).alias("share_of_total"),
        F.round(
            F.col("nation_cents").cast("double")
            / F.max("nation_cents").over(wtot).cast("double"),
            6,
        ).alias("vs_largest"),
    )


@register(
    "win_longest_streak_per_user",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
                   AS rn_all,
               row_number() OVER (PARTITION BY user_id, event_type
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
                   AS rn_type
        FROM events
    ),
    streaks AS (
        SELECT user_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS streak_len
        FROM ev GROUP BY user_id, event_type, rn_all - rn_type
    ),
    per_user AS (
        SELECT event_type, user_id, MAX(streak_len) AS best
        FROM streaks GROUP BY event_type, user_id
    )
    SELECT event_type,
           CAST(MAX(best) AS BIGINT) AS max_streak,
           CAST(count_if(best >= 3) AS BIGINT) AS n_users_streak_ge_3
    FROM per_user GROUP BY event_type
    """,
    doc="Longest same-type event run per user (the habit/repetition "
        "signal: how many identical actions in a row), rolled up per "
        "event type — the per-key gaps-and-islands classic: the "
        "difference of two row_numbers (overall vs per-type, both "
        "partitioned by user and sharing ONE user-keyed sort order) is "
        "constant exactly within a run, so streaks fall out of a "
        "three-key groupBy with no iteration. Both windows and both "
        "rollups ride the same user_id shuffle. Epoch-microsecond "
        "ordering with event_id tie-break pins identical run boundaries "
        "in both engines. Reference parity: extension surface "
        "(SURVEY.md §2.B window rows).",
)
def win_longest_streak_per_user(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = e.select("user_id", "event_type", us.alias("us"), "event_id")
    w_all = Window.partitionBy("user_id").orderBy("us", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "us", "event_id"
    )
    ev = base.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
            "grp"
        ),
    )
    streaks = ev.groupBy("user_id", "event_type", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("streak_len")
    )
    per_user = streaks.groupBy("event_type", "user_id").agg(
        F.max("streak_len").alias("best")
    )
    return per_user.groupBy("event_type").agg(
        F.max("best").cast("long").alias("max_streak"),
        F.count_if(F.col("best") >= 3).cast("long").alias(
            "n_users_streak_ge_3"
        ),
    )


@register(
    "win_max_concurrent_sessions",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN epoch(CAST(ts AS TIMESTAMP))
                         - epoch(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800
                         OR lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    s AS (
        SELECT user_id,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_idx,
               ts
        FROM g
    ),
    iv AS (
        SELECT user_id, session_idx, MIN(ts) AS s_start,
               MAX(ts) + INTERVAL 1 SECOND AS s_end_excl
        FROM s GROUP BY 1, 2
    ),
    deltas AS (
        SELECT s_start AS t, 1 AS d FROM iv
        UNION ALL
        SELECT s_end_excl AS t, -1 AS d FROM iv
    ),
    net AS (SELECT t, SUM(d) AS nd FROM deltas GROUP BY t),
    run AS (
        SELECT t, SUM(nd) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS conc
        FROM net
    )
    SELECT CAST(CAST(t AS DATE) AS TIMESTAMP) AS day,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY 1
    """,
    doc="Peak concurrent sessions per day — the classic sweep line, "
        "DISTRIBUTED: sessions (30-min-gap, same derivation as "
        "win_sessionize_gap) become +1/-1 boundary deltas, netted per "
        "distinct instant; the running count then splits two-level — a "
        "per-DAY cumulative window (partitioned, bounded partitions) "
        "plus a day-level exclusive prefix offset computed on the "
        "calendar-sized per-day net table — so no unbounded global "
        "window ever orders the full delta stream. Concurrency is "
        "evaluated AFTER all deltas of an instant (simultaneous "
        "end/start never overlap), making every intermediate value "
        "deterministic. The ORACLE runs the naive single global "
        "running sum, certifying the chunked decomposition. Same "
        "two-level prefix-sum algebra as operators/sequence.py's "
        "chunked islands; at 100 TB both windows are bounded (within "
        "one day / across the calendar).",
)
def win_max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 1800)
    ).cast("int")
    s = e.withColumn(
        "session_idx",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    iv = s.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("s_start"),
        (F.max("ts") + F.expr("INTERVAL 1 SECOND")).alias("s_end_excl"),
    )
    deltas = iv.select(F.col("s_start").alias("t"), F.lit(1).alias("d")).unionAll(
        iv.select(F.col("s_end_excl").alias("t"), F.lit(-1).alias("d"))
    )
    net = deltas.groupBy("t").agg(F.sum("d").alias("nd"))
    # two-level prefix sum: within-day cumulative (partitioned window over
    # bounded day slices) + exclusive day offset over the calendar-sized
    # per-day net table — never one global window over all instants.
    day = F.to_date("t")
    wday = Window.partitionBy(day).orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    within = net.withColumn("cum_in_day", F.sum("nd").over(wday))
    day_net = net.groupBy(day.alias("day")).agg(F.sum("nd").alias("day_nd"))
    wdays = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    day_off = day_net.withColumn(
        "day_offset", F.coalesce(F.sum("day_nd").over(wdays), F.lit(0))
    ).select("day", "day_offset")
    conc = within.join(
        F.broadcast(day_off), F.to_date("t") == F.col("day")
    ).select("t", (F.col("day_offset") + F.col("cum_in_day")).alias("conc"))
    return conc.groupBy(F.to_date("t").cast("timestamp").alias("day")).agg(
        F.max("conc").cast("long").alias("peak_concurrency")
    )


@register(
    "win_covered_seconds_per_day",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS es
        FROM events
    ),
    g AS (
        SELECT user_id, event_id, es,
               CASE WHEN es - lag(es) OVER w > 1800
                         OR lag(es) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
    ),
    s AS (
        SELECT user_id, es,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY es, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM g
    ),
    iv AS (
        SELECT user_id, session_idx, MIN(es) AS t0, MAX(es) + 1 AS t1
        FROM s GROUP BY 1, 2
    ),
    deltas AS (
        SELECT t0 AS t, 1 AS d FROM iv
        UNION ALL
        SELECT t1 AS t, -1 AS d FROM iv
    ),
    net AS (SELECT t, CAST(SUM(d) AS BIGINT) AS nd FROM deltas GROUP BY t),
    run AS (
        SELECT t,
               SUM(nd) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS conc,
               lead(t) OVER (ORDER BY t) AS nt
        FROM net
    ),
    seg AS (SELECT t, nt FROM run WHERE nt IS NOT NULL AND conc > 0),
    clipped AS (
        SELECT di,
               least(nt, (di + 1) * 86400) - greatest(t, di * 86400)
                   AS covered
        FROM (SELECT t, nt,
                     unnest(generate_series(t // 86400, (nt - 1) // 86400))
                         AS di
              FROM seg)
    )
    SELECT CAST(DATE '1970-01-01' + CAST(di AS INTEGER) AS TIMESTAMP) AS day,
           CAST(SUM(covered) AS BIGINT) AS covered_seconds
    FROM clipped GROUP BY 1
    """,
    doc="Interval-union coverage per day (seconds of each UTC day with "
        ">= 1 session active) — the utilization/SLA complement to "
        "win_max_concurrent_sessions on the SAME sweep-line substrate: "
        "session intervals in integer epoch seconds become +1/-1 "
        "deltas netted per instant; the running count again splits "
        "two-level (within-day cumulative over bounded day slices + a "
        "calendar-sized exclusive day offset), within-day lead() gives "
        "intra-day segments and the per-day (max_t -> next day's min_t) "
        "boundary pass stitches cross-midnight segments, each "
        "covered segment day-clipped via a bounded sequence explode. "
        "All arithmetic is integer (unix_micros div — no engine "
        "epoch-rounding divergence); the ORACLE runs the naive single "
        "global running sum + lead. At 100 TB no unbounded global "
        "window ever orders the full boundary stream.",
)
def win_covered_seconds_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts) div 1000000").alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    prev = F.lag("es").over(w)
    new_session = (prev.isNull() | ((F.col("es") - prev) > 1800)).cast("int")
    s = e.withColumn(
        "session_idx",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    iv = s.groupBy("user_id", "session_idx").agg(
        F.min("es").alias("t0"), (F.max("es") + 1).alias("t1")
    )
    from wal_consumer_spark.operators.sequence import union_coverage_per_day

    return union_coverage_per_day(iv).select(
        F.date_add(
            F.lit("1970-01-01").cast("date"), F.col("di").cast("int")
        )
        .cast("timestamp")
        .alias("day"),
        "covered_seconds",
    )


@register(
    "win_pareto_skyline",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS best_cents
        FROM orders GROUP BY 1
    ),
    sky AS (
        SELECT d, best_cents,
               MAX(best_cents) OVER (ORDER BY d DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS later_best
        FROM daily
    )
    SELECT CAST(d AS TIMESTAMP) AS day, best_cents
    FROM sky WHERE later_best IS NULL OR best_cents > later_best
    """,
    doc="2-D Pareto skyline (maximal-vector query, Kung et al. JACM'75; "
        "the SKYLINE operator of Borzsony et al. ICDE'01): the days "
        "whose best order value is not dominated by any LATER day — "
        "i.e. the (recency, value) staircase no other point beats on "
        "both axes, the multi-criteria shortlist primitive. "
        "Dominance reduces to a right-to-left running MAX over the "
        "per-day best (exact integer cents, strict >), so the whole "
        "skyline costs one calendar-bounded window over the "
        "Aggregate-by-date grid — never the O(n²) pairwise dominance "
        "join, and never a per-order sort: the corpus-sized work is "
        "ONE groupBy(day).max() with map-side combine. The naive "
        "formulation is its own oracle.",
)
def win_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.max(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "best_cents"
        )
    )
    later = F.max("best_cents").over(
        Window.orderBy(F.col("d").desc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
    )
    return (
        daily.withColumn("later_best", later)
        .where(
            F.col("later_best").isNull()
            | (F.col("best_cents") > F.col("later_best"))
        )
        .select(F.col("d").cast("timestamp").alias("day"), "best_cents")
    )


@register(
    "win_regime_run_lengths",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    med AS (
        SELECT rev AS median_rev FROM (
            SELECT rev, row_number() OVER (ORDER BY rev, d) AS rn,
                   COUNT(*) OVER () AS n
            FROM daily
        ) WHERE rn = (n + 1) // 2
    ),
    flagged AS (
        SELECT d, rev,
               CAST(rev >= (SELECT median_rev FROM med) AS INT) AS hi
        FROM daily
    ),
    runs AS (
        SELECT d, hi,
               SUM(chg) OVER (ORDER BY d
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS run_id
        FROM (
            SELECT d, hi,
                   CASE WHEN lag(hi) OVER (ORDER BY d) IS NULL
                          OR lag(hi) OVER (ORDER BY d) <> hi
                        THEN 1 ELSE 0 END AS chg
            FROM flagged
        )
    ),
    lens AS (
        SELECT run_id, MIN(hi) AS hi, CAST(COUNT(*) AS BIGINT) AS run_length
        FROM runs GROUP BY run_id
    )
    SELECT CAST(hi AS INT) AS regime_hi, run_length,
           CAST(COUNT(*) AS BIGINT) AS n_runs
    FROM lens GROUP BY 1, 2
    """,
    doc="Run-length distribution of above/below-median revenue regimes: "
        "flag each day of the bounded daily-revenue grid against the "
        "rank-picked lower median (deterministic day tie-break), collapse "
        "consecutive equal flags into runs (gaps-and-islands on the day "
        "grid), and histogram run lengths per regime — the "
        "momentum/mean-reversion diagnostic (long runs = regimes, "
        "all-short runs = noise around the median; the nonparametric "
        "Wald-Wolfowitz runs-test readout). Every window sits on the "
        "value-domain day aggregate; the median is a 1-row broadcast; "
        "output is bounded by the longest run. Integer arithmetic "
        "end-to-end. Reference parity: extension surface (SURVEY.md "
        "§2.B window rows).",
)
def win_regime_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(cents).cast("long").alias("rev")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    med = (
        daily.select(
            "rev",
            F.row_number().over(Window.orderBy("rev", "d")).alias("rn"),
            F.count(F.lit(1)).over(w_all).alias("n"),
        )
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("rev").alias("median_rev"))
    )
    flagged = daily.crossJoin(F.broadcast(med)).select(
        "d", (F.col("rev") >= F.col("median_rev")).cast("int").alias("hi")
    )
    w_ord = Window.orderBy("d")
    chg = F.when(
        F.lag("hi").over(w_ord).isNull()
        | (F.lag("hi").over(w_ord) != F.col("hi")),
        F.lit(1),
    ).otherwise(F.lit(0))
    # two selects: the lag window must materialize before the cumsum
    # window consumes it (no nested window expressions)
    runs = flagged.select("d", "hi", chg.alias("chg")).select(
        "d",
        "hi",
        F.sum("chg")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_id"),
    )
    lens = runs.groupBy("run_id").agg(
        F.min("hi").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("run_length"),
    )
    return lens.groupBy(
        F.col("hi").cast("int").alias("regime_hi"), "run_length"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_runs"))
