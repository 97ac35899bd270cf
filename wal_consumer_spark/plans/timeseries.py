"""Time-series regularization queries: resample an irregular event stream
onto a fixed grid (the alignment primitive for sensor/audio/feature
pipelines — every downstream batch wants rows at regular steps, not raw
event times).

Built on the same union+carry as-of machinery as asof_join (one shuffle,
no per-pair explosion); DuckDB's native ASOF JOIN replays it exactly.

Reference parity note: the reference has no event-time processing at all
(WAL order is arrival order, SURVEY.md §2.A); extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wal_consumer_spark.operators.asof import asof_join
from wal_consumer_spark.plans.registry import register
from wal_consumer_spark.sources.tables import load_table

_GRID_START = "2024-01-01 00:00:00"
_GRID_END = "2024-01-30 00:00:00"


@register(
    "ts_resample_locf",
    oracle=f"""
    WITH grid AS (
        SELECT u.user_id, g.gts
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (
            SELECT unnest(generate_series(
                TIMESTAMP '{_GRID_START}', TIMESTAMP '{_GRID_END}',
                INTERVAL 1 DAY)) AS gts
        ) g
    ),
    ev AS (  -- one observation per (user, instant): ties broken by event_id
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               max_by(round(value, 2), event_id) AS obs_value
        FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)
    )
    SELECT grid.user_id, grid.gts AS grid_ts, ev.obs_value AS locf_value,
           CAST(floor(epoch(grid.gts)) - floor(epoch(ev.ts)) AS BIGINT)
               AS staleness_s
    FROM grid ASOF LEFT JOIN ev
      ON grid.user_id = ev.user_id AND ev.ts <= grid.gts
    """,
    doc="Resample to a fixed daily grid with last-observation-carried-"
        "forward: per (user, grid point), the newest observation at or "
        "before it, plus its staleness in seconds (NULL before the first "
        "observation). The grid is a bounded literal (time range / step — "
        "independent of data size); the as-of carry is the single-shuffle "
        "union+window formulation (operators/asof.py), never a per-pair "
        "range join. DuckDB replays it with its native ASOF LEFT JOIN.",
)
def ts_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    grid = users.crossJoin(
        F.broadcast(
            spark.range(1).select(
                F.explode(
                    F.sequence(
                        F.lit(_GRID_START).cast("timestamp"),
                        F.lit(_GRID_END).cast("timestamp"),
                        F.expr("interval 1 day"),
                    )
                ).alias("grid_ts")
            )
        )
    )
    obs = (
        e.groupBy("user_id", "ts")
        .agg(F.max_by(F.round("value", 2), F.col("event_id")).alias("locf_value"))
        # Atomic payload: value and its timestamp travel as ONE struct so the
        # as-of carry can never pair an older value with a newer timestamp
        # (per-column last(ignorenulls) would desync on NULL-valued
        # observations — DuckDB's ASOF JOIN picks whole rows).
        .withColumn("obs", F.struct(F.col("ts").alias("ts"), F.col("locf_value").alias("v")))
    )
    out = asof_join(
        grid,
        obs,
        left_key="user_id",
        right_key="user_id",
        left_ts="grid_ts",
        right_ts="ts",
        payload_cols=["obs"],
    )
    return out.select(
        "user_id",
        "grid_ts",
        F.col("obs.v").alias("locf_value"),
        (F.unix_timestamp("grid_ts") - F.unix_timestamp("obs.ts"))
        .cast("long")
        .alias("staleness_s"),
    )


@register(
    "ts_resample_interp",
    oracle=f"""
    WITH grid AS (
        SELECT u.user_id, g.gts
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (
            SELECT unnest(generate_series(
                TIMESTAMP '{_GRID_START}', TIMESTAMP '{_GRID_END}',
                INTERVAL 1 DAY)) AS gts
        ) g
    ),
    ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               max_by(round(value, 2), event_id) AS obs_value
        FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ),
    prev AS (
        SELECT grid.user_id, grid.gts, ev.ts AS pts, ev.obs_value AS pv
        FROM grid ASOF LEFT JOIN ev
          ON grid.user_id = ev.user_id AND ev.ts <= grid.gts
    ),
    nxt AS (
        SELECT grid.user_id, grid.gts, ev.ts AS nts, ev.obs_value AS nv
        FROM grid ASOF LEFT JOIN ev
          ON grid.user_id = ev.user_id AND ev.ts >= grid.gts
    )
    SELECT p.user_id, p.gts AS grid_ts,
           round(CASE
               WHEN p.pts IS NOT NULL AND n.nts IS NOT NULL AND n.nts <> p.pts
               THEN p.pv + (n.nv - p.pv)
                    * (CAST(floor(epoch(p.gts)) - floor(epoch(p.pts)) AS DOUBLE)
                       / CAST(floor(epoch(n.nts)) - floor(epoch(p.pts)) AS DOUBLE))
               WHEN p.pts IS NOT NULL THEN p.pv
           END, 4) AS interp_value,
           (p.pts IS NOT NULL AND n.nts IS NOT NULL) AS bracketed
    FROM prev p JOIN nxt n ON p.user_id = n.user_id AND p.gts = n.gts
    """,
    doc="Resample to the daily grid with LINEAR INTERPOLATION between the "
        "bracketing observations: backward as-of picks the newest obs at or "
        "before each grid point, forward as-of the earliest at or after; "
        "value = pv + (nv-pv) * elapsed/gap. Falls back to carry-forward "
        "when only the left neighbour exists, NULL before the first obs; "
        "`bracketed` flags true interpolation. Both as-of passes are the "
        "single-shuffle union+window carry (operators/asof.py) — two narrow "
        "shuffles + one (user,grid_ts) equi-join, no per-pair range "
        "explosion at any scale. DuckDB replays with two native ASOF joins.",
)
def ts_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    grid = users.crossJoin(
        F.broadcast(
            spark.range(1).select(
                F.explode(
                    F.sequence(
                        F.lit(_GRID_START).cast("timestamp"),
                        F.lit(_GRID_END).cast("timestamp"),
                        F.expr("interval 1 day"),
                    )
                ).alias("grid_ts")
            )
        )
    )
    obs = e.groupBy("user_id", "ts").agg(
        F.max_by(F.round("value", 2), F.col("event_id")).alias("obs_value")
    )
    # Atomic (ts, value) struct payloads: per-column carries could pair an
    # older value with a newer timestamp on NULL-valued observations.
    pobs = obs.select(
        "user_id", "ts",
        F.struct(F.col("ts").alias("ts"), F.col("obs_value").alias("v")).alias("pobs"),
    )
    nobs = obs.select(
        "user_id", "ts",
        F.struct(F.col("ts").alias("ts"), F.col("obs_value").alias("v")).alias("nobs"),
    )
    prev = asof_join(
        grid, pobs,
        left_key="user_id", right_key="user_id",
        left_ts="grid_ts", right_ts="ts",
        payload_cols=["pobs"],
    ).select("user_id", "grid_ts", F.col("pobs.v").alias("pv"), F.col("pobs.ts").alias("pts"))
    nxt = asof_join(
        grid, nobs,
        left_key="user_id", right_key="user_id",
        left_ts="grid_ts", right_ts="ts",
        payload_cols=["nobs"],
        direction="forward",
    ).select("user_id", "grid_ts", F.col("nobs.v").alias("nv"), F.col("nobs.ts").alias("nts"))
    j = prev.join(nxt, ["user_id", "grid_ts"])
    gd = (F.unix_timestamp("grid_ts") - F.unix_timestamp("pts")).cast("double")
    nd = (F.unix_timestamp("nts") - F.unix_timestamp("pts")).cast("double")
    interp = F.when(
        F.col("pts").isNotNull() & F.col("nts").isNotNull()
        & (F.col("nts") != F.col("pts")),
        F.col("pv") + (F.col("nv") - F.col("pv")) * (gd / nd),
    ).when(F.col("pts").isNotNull(), F.col("pv"))
    return j.select(
        "user_id",
        "grid_ts",
        F.round(interp, 4).alias("interp_value"),
        (F.col("pts").isNotNull() & F.col("nts").isNotNull()).alias("bracketed"),
    )


@register(
    "ts_hierarchical_rollup",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type, date_trunc('day', CAST(ts AS TIMESTAMP))
    """,
    doc="Hierarchical (hypertable-style) rollup: aggregate events to "
        "(event_type, hour) partials first, then merge the hourly partials "
        "into daily totals — the continuous-aggregate pattern where coarse "
        "resolutions are maintained FROM the fine ones instead of rescanning "
        "raw data. Correctness hinges on mergeable partials: the hourly sum "
        "stays DECIMAL (exact, associative) until the final daily merge, so "
        "the two-level result is bit-identical to the oracle's direct "
        "single-level aggregation. At 100 TB the first level is the only "
        "pass over raw data; the second aggregates ~24x fewer rows, and the "
        "same merge runs incrementally per micro-batch in "
        "streaming/incremental.py.",
)
def ts_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_partial"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("sum_partial"),
        )
    )
    return (
        hourly.groupBy(
            "event_type",
            F.date_trunc("day", F.col("hour")).alias("day"),
        )
        .agg(
            F.sum("n_partial").alias("n_events"),
            F.sum("sum_partial").cast("double").alias("sum_value"),
        )
    )


@register(
    "ts_ewma_decay",
    oracle="""
    SELECT event_id, user_id,
           round(
               (  coalesce(l0, 0) * 1.0
                + coalesce(l1, 0) * 0.5
                + coalesce(l2, 0) * 0.25
                + coalesce(l3, 0) * 0.125
                + coalesce(l4, 0) * 0.0625
                + coalesce(l5, 0) * 0.03125
                + coalesce(l6, 0) * 0.015625
                + coalesce(l7, 0) * 0.0078125)
               / (  (CASE WHEN l0 IS NULL THEN 0 ELSE 1.0 END)
                  + (CASE WHEN l1 IS NULL THEN 0 ELSE 0.5 END)
                  + (CASE WHEN l2 IS NULL THEN 0 ELSE 0.25 END)
                  + (CASE WHEN l3 IS NULL THEN 0 ELSE 0.125 END)
                  + (CASE WHEN l4 IS NULL THEN 0 ELSE 0.0625 END)
                  + (CASE WHEN l5 IS NULL THEN 0 ELSE 0.03125 END)
                  + (CASE WHEN l6 IS NULL THEN 0 ELSE 0.015625 END)
                  + (CASE WHEN l7 IS NULL THEN 0 ELSE 0.0078125 END))
               / 100.0,
           6) AS ewma
    FROM (
        SELECT event_id, user_id,
               lag(cents, 0) OVER w AS l0,
               lag(cents, 1) OVER w AS l1,
               lag(cents, 2) OVER w AS l2,
               lag(cents, 3) OVER w AS l3,
               lag(cents, 4) OVER w AS l4,
               lag(cents, 5) OVER w AS l5,
               lag(cents, 6) OVER w AS l6,
               lag(cents, 7) OVER w AS l7
        FROM (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsv,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        )
        WINDOW w AS (PARTITION BY user_id ORDER BY tsv, event_id)
    )
    """,
    doc="Per-user exponentially-weighted moving average (half-life decay, "
        "8-tap truncated kernel) over the event stream — the feature-"
        "engineering smoother for activity/rate signals. EWMA's recursive "
        "form is inherently sequential; the truncated geometric kernel "
        "re-expresses it as 8 lag() taps inside ONE window pass, which "
        "Spark executes per user partition with no cross-row dependency "
        "chain. Determinism: alpha = 0.5 makes every weight an exact "
        "binary fraction and values are cents-quantized int64s, so each "
        "tap product and the tap sum are EXACT doubles (<= 34 significant "
        "bits) — both engines emit bit-identical results; partial leading "
        "windows renormalize by the present-tap weight sum. Scale: single "
        "hash shuffle on user_id, then one sorted window scan; the kernel "
        "adds zero extra shuffles vs any other per-user window feature.",
)
def ts_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("ts").alias("tsv"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("tsv", "event_id")
    taps = [F.lag("cents", k).over(w).alias(f"l{k}") for k in range(8)]
    lagged = e.select("event_id", "user_id", *taps)
    wsum = None
    wnorm = None
    for k in range(8):
        wt = F.lit(0.5 ** k)
        term = F.coalesce(F.col(f"l{k}"), F.lit(0)) * wt
        pres = F.when(F.col(f"l{k}").isNull(), F.lit(0.0)).otherwise(wt)
        wsum = term if wsum is None else wsum + term
        wnorm = pres if wnorm is None else wnorm + pres
    return lagged.select(
        "event_id",
        "user_id",
        F.round(wsum / wnorm / F.lit(100.0), 6).alias("ewma"),
    )


@register(
    "ts_gapfill_zero",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
               CAST(MAX(o_orderdate) AS DATE) AS hi
        FROM orders
    ),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS TIMESTAMP)
            AS day
        FROM bounds
    ),
    per_day AS (
        SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(18,0))) AS BIGINT)
                   AS revenue_cents
        FROM orders GROUP BY 1
    )
    SELECT spine.day,
           CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(revenue_cents, 0) AS BIGINT) AS revenue_cents
    FROM spine LEFT JOIN per_day ON per_day.day = spine.day
    """,
    doc="Calendar gap-fill with explicit zeros: a generated daily spine "
        "spanning [min, max] order date LEFT JOINs the per-day aggregates, "
        "so inactive days appear as (day, 0, 0) rows — the complement of "
        "ts_resample_locf (which carries values) for rate-style metrics "
        "where a missing day MEANS zero. The spine comes from "
        "sequence(min, max) on a 1-row bounds aggregate — O(days) rows "
        "generated driver-free — and the join is broadcast (spine side is "
        "calendar-sized, thousands of rows for decades). One scan + one "
        "date-keyed aggregation regardless of fact volume.",
)
def ts_gapfill_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    ).select(F.col("d").cast("timestamp").alias("day"))
    per_day = o.groupBy(
        F.to_date("o_orderdate").cast("timestamp").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum((F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("revenue_cents"),
    )
    # broadcast the per-day AGGREGATE (calendar-bounded): a left join cannot
    # build its preserved left side, so the old broadcast(spine) hint was
    # silently dropped (HintErrorLogger) and the join shuffled both sides.
    return spine.join(F.broadcast(per_day), "day", "left").select(
        "day",
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
        F.coalesce("revenue_cents", F.lit(0)).cast("long").alias("revenue_cents"),
    )


@register(
    "ts_seasonal_naive_error",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS TIMESTAMP) AS day,
               CAST(SUM(CAST(value * 100 AS DECIMAL(18,0))) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    p AS (
        SELECT event_type, day, cents,
               lag(cents, 1) OVER (PARTITION BY event_type ORDER BY day) AS naive,
               lag(cents, 7) OVER (PARTITION BY event_type ORDER BY day) AS seasonal
        FROM daily
    )
    SELECT event_type,
           CAST(COUNT(naive) AS BIGINT) AS n_naive,
           CAST(SUM(abs(cents - naive)) AS BIGINT) AS naive_abs_err_cents,
           CAST(COUNT(seasonal) AS BIGINT) AS n_seasonal,
           CAST(SUM(abs(cents - seasonal)) AS BIGINT) AS seasonal_abs_err_cents
    FROM p GROUP BY event_type
    """,
    doc="Seasonal-naive forecast backtest: per event type, the daily value "
        "total is 'predicted' by yesterday (naive, lag 1) and by the same "
        "weekday last week (seasonal, lag 7); total absolute error in "
        "exact cents scores both — the standard sanity baseline every real "
        "forecasting pipeline must beat, and a pure two-window-function "
        "plan: one (type, day) aggregation, one type-partitioned ordered "
        "pass, integer errors immune to summation order. Rows whose lag "
        "falls before the series start are excluded per-baseline via "
        "COUNT/SUM null-skipping.",
)
def ts_seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").cast("timestamp").alias("day")
    ).agg(
        F.sum((F.col("value") * 100).cast("decimal(18,0)")).cast("long").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    p = daily.select(
        "event_type",
        "cents",
        F.lag("cents", 1).over(w).alias("naive"),
        F.lag("cents", 7).over(w).alias("seasonal"),
    )
    return p.groupBy("event_type").agg(
        F.count("naive").cast("long").alias("n_naive"),
        F.sum(F.abs(F.col("cents") - F.col("naive"))).cast("long")
        .alias("naive_abs_err_cents"),
        F.count("seasonal").cast("long").alias("n_seasonal"),
        F.sum(F.abs(F.col("cents") - F.col("seasonal"))).cast("long")
        .alias("seasonal_abs_err_cents"),
    )


@register(
    "ts_anomaly_mad",
    oracle="""
    WITH v AS (
        SELECT event_id, user_id, round(value, 2) AS v
        FROM events
    ),
    med AS (
        SELECT user_id, median(v) AS med FROM v GROUP BY user_id
    ),
    dev AS (
        SELECT v.event_id, v.user_id, v.v, med.med, abs(v.v - med.med) AS d
        FROM v JOIN med USING (user_id)
    ),
    mad AS (
        SELECT user_id, median(d) AS mad FROM dev GROUP BY user_id
    )
    SELECT dev.event_id, dev.user_id, dev.v AS value_r,
           round(dev.med, 6) AS med, round(mad.mad, 6) AS mad,
           round(dev.d / (1.4826 * mad.mad), 4) AS robust_z
    FROM dev JOIN mad USING (user_id)
    WHERE mad.mad > 0 AND dev.d > 3 * 1.4826 * mad.mad
    """,
    doc="Robust per-key anomaly detection: flag events whose absolute "
        "deviation from the per-user median exceeds 3 scaled MADs "
        "(median absolute deviation, consistency constant 1.4826) — the "
        "outlier gate that survives the heavy-tailed value distributions "
        "where mean/stddev z-scores (win_zscore_outliers) break down. "
        "Two grouped exact-median passes over (user_id, value) pairs: "
        "both shuffles are narrow 2-column frames on the same key, so AQE "
        "reuses the exchange; no window function, no sort of the full "
        "event set. Values are rounded to cents first so both engines "
        "interpolate medians over identical doubles, making the >3-MAD "
        "boundary decision bit-identical. Reference parity: extension "
        "surface (SURVEY.md §2.B robust stats).",
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_id", "user_id", F.round("value", 2).alias("v"))
    med = v.groupBy("user_id").agg(F.expr("percentile(v, 0.5)").alias("med"))
    dev = v.join(med, "user_id").withColumn("d", F.abs(F.col("v") - F.col("med")))
    mad = dev.groupBy("user_id").agg(F.expr("percentile(d, 0.5)").alias("mad"))
    return (
        dev.join(mad, "user_id")
        .filter((F.col("mad") > 0) & (F.col("d") > 3 * 1.4826 * F.col("mad")))
        .select(
            "event_id",
            "user_id",
            F.col("v").alias("value_r"),
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.round(F.col("d") / (1.4826 * F.col("mad")), 4).alias("robust_z"),
        )
    )


@register(
    "ts_changepoint_cusum",
    oracle="""
    WITH c AS (
        SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CAST(value * 100 AS DECIMAL(18,0)) AS cents
        FROM events
    ),
    s AS (
        SELECT event_type, event_id, ts,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS DECIMAL(38,0)) AS n,
               CAST(SUM(cents) OVER (PARTITION BY event_type) AS DECIMAL(38,0)) AS tot,
               CAST(SUM(cents) OVER (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DECIMAL(38,0)) AS pre,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
                 AS DECIMAL(38,0)) AS j
        FROM c
    ),
    cusum AS (SELECT event_type, event_id, ts, n, n * pre - j * tot AS cs FROM s),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY abs(cs) DESC, ts, event_id) AS rk
        FROM cusum
    )
    SELECT event_type, ts AS changepoint_ts, event_id AS changepoint_event_id,
           round(CAST(abs(cs) AS DOUBLE) / (CAST(n AS DOUBLE) * 100), 4)
               AS max_cusum_dollars
    FROM ranked WHERE rk = 1
    """,
    doc="CUSUM changepoint detection per series: the instant where the "
        "cumulative sum of deviations from the series mean peaks — the "
        "classic level-shift locator. The exactness trick: instead of "
        "cumsum(x_i - mean) in floats (mean is irrational, every engine "
        "and partition order rounds differently), the scaled statistic "
        "n*prefix_j - j*total is computed entirely in DECIMAL cents — "
        "integer-exact, order-independent, bit-identical across engines — "
        "and only the final reported magnitude is scaled back to dollars. "
        "One window sort per series plus two unbounded frames on the same "
        "partitioning; the argmax is a second pass over the same sort "
        "order (no extra shuffle). Reference parity: extension surface "
        "(SURVEY.md §2.B time-series).",
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_type",
        "event_id",
        "ts",
        (F.col("value") * 100).cast("decimal(18,0)").alias("cents"),
    )
    w_all = Window.partitionBy("event_type")
    w_run = w_all.orderBy("ts", "event_id")
    s = c.select(
        "event_type",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w_all).cast("decimal(38,0)").alias("n"),
        F.sum("cents").over(w_all).cast("decimal(38,0)").alias("tot"),
        F.sum("cents")
        .over(w_run.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("decimal(38,0)")
        .alias("pre"),
        F.row_number().over(w_run).cast("decimal(38,0)").alias("j"),
    )
    cusum = s.withColumn("cs", F.col("n") * F.col("pre") - F.col("j") * F.col("tot"))
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.abs(F.col("cs")).desc(), "ts", "event_id"
        )
    )
    return (
        cusum.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("ts").alias("changepoint_ts"),
            F.col("event_id").alias("changepoint_event_id"),
            F.round(
                F.abs(F.col("cs")).cast("double") / (F.col("n").cast("double") * 100), 4
            ).alias("max_cusum_dollars"),
        )
    )


@register(
    "ts_period_over_period",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(SUM(CAST(value * 100 AS DECIMAL(18,0))) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    )
    SELECT cur.event_type, CAST(cur.day AS TIMESTAMP) AS day,
           cur.cents AS cents, prev.cents AS cents_wk_ago,
           round((cur.cents - prev.cents) / CAST(prev.cents AS DOUBLE), 6)
               AS wow_growth
    FROM daily cur JOIN daily prev
      ON cur.event_type = prev.event_type
     AND prev.day = cur.day - INTERVAL 7 DAY
    WHERE prev.cents <> 0
    """,
    doc="Calendar-correct week-over-week growth per series: today's daily "
        "total joined to the total EXACTLY 7 calendar days earlier — a "
        "date-key equi-join, not lag(7) rows, which silently misaligns "
        "whenever a day is missing from the series "
        "(ts_seasonal_naive_error's row-offset baseline is the contrast). "
        "Daily totals are exact DECIMAL-cents sums so the growth ratio's "
        "operands are bit-identical across engines. Shuffle profile: one "
        "(type, day) aggregation, then a self-join of that already-small "
        "daily frame on its own grouping key — at 100 TB the daily frame "
        "is |series| x |days| rows, O(10^5), broadcastable. Reference "
        "parity: extension surface (SURVEY.md §2.B time-series).",
)
def ts_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum((F.col("value") * 100).cast("decimal(18,0)")).cast("long").alias("cents")
    )
    cur = daily.select(
        "event_type", "day", F.col("cents").alias("cents_cur")
    )
    prev = daily.select(
        F.col("event_type").alias("event_type_p"),
        F.col("day").alias("day_p"),
        F.col("cents").alias("cents_wk_ago"),
    )
    return (
        cur.join(
            prev,
            (F.col("event_type") == F.col("event_type_p"))
            & (F.col("day_p") == F.date_sub(F.col("day"), 7)),
        )
        .filter(F.col("cents_wk_ago") != 0)
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            F.col("cents_cur").alias("cents"),
            "cents_wk_ago",
            F.round(
                (F.col("cents_cur") - F.col("cents_wk_ago"))
                / F.col("cents_wk_ago").cast("double"),
                6,
            ).alias("wow_growth"),
        )
    )


@register(
    "ts_cross_correlation",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS rev_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    ),
    pairs AS (
        SELECT l.lag AS lag, a.rev_cents AS x, b.n_orders AS y
        FROM daily a
        CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS lag) l
        JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)
    ),
    s AS (
        SELECT lag,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                    AS DOUBLE) AS syy,
               CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                    AS DOUBLE) AS sxy
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n_days,
           round((n_days*sxy - sx*sy)
                 / sqrt((n_days*sxx - sx*sx) * (n_days*syy - sy*sy)), 6)
               AS corr_rev_orders
    FROM s
    """,
    doc="Lagged cross-correlation between two daily series (revenue vs "
        "order count, lags 0..7): does today's revenue predict order volume "
        "N days out? The corpus-sized work is ONE aggregation to the "
        "bounded daily grid (~2.4k rows regardless of order count, exact "
        "integer cents so the rollup is order-independent); the lag "
        "expansion and Pearson statistics then run on that tiny table — 8 "
        "lags x days pairs via an equi-join on the shifted date (no "
        "windowed self-scan per lag). Sums use DECIMAL(38) exact "
        "arithmetic; corr is identical IEEE double math (+,-,*,/ and the "
        "correctly-rounded sqrt) on exact sums, so both engines emit "
        "bit-identical correlations. At 100 TB the daily rollup is the "
        "only data pass — the classic pre-aggregate-then-analyze shape. "
        "Reference parity: extension surface (SURVEY.md §2.B time-series).",
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    lags = spark.range(0, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.crossJoin(F.broadcast(lags)).select(
        "lag",
        F.date_add(F.col("d"), F.col("lag")).alias("match_d"),
        F.col("rev_cents").alias("x"),
    )
    b = daily.select(F.col("d").alias("match_d"), F.col("n_orders").alias("y"))
    x = F.col("x").cast("decimal(38,0)")
    y = F.col("y").cast("decimal(38,0)")
    n = F.count(F.lit(1))
    s = (
        # the probe side is the bounded daily grid — broadcast it so the
        # lag expansion never shuffles
        a.join(F.broadcast(b), "match_d")
        .groupBy("lag")
        .agg(
            n.alias("n_days"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(y * y).cast("double").alias("syy"),
            F.sum(x * y).cast("double").alias("sxy"),
        )
    )
    nd = F.col("n_days")
    cov = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        F.col("lag").cast("long").alias("lag"),
        "n_days",
        F.round(cov / F.sqrt(vx * vy), 6).alias("corr_rev_orders"),
    )


@register(
    "ts_seasonal_decompose",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    tr AS (
        SELECT d, cents,
               datediff('day', DATE '1995-01-01', d) % 7 AS dow,
               CASE WHEN COUNT(*) OVER w = 7
                    THEN CAST(SUM(cents) OVER w AS DOUBLE) / 7 END AS trend
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    se AS (
        SELECT d, cents, dow, trend,
               CAST(SUM(CAST(round((cents - trend) * 100) AS BIGINT))
                    FILTER (WHERE trend IS NOT NULL) OVER (PARTITION BY dow)
                    AS DOUBLE)
               / 100
               / COUNT(trend) OVER (PARTITION BY dow) AS seasonal
        FROM tr
    )
    SELECT CAST(d AS TIMESTAMP) AS day, cents,
           round(trend, 4) AS trend,
           round(seasonal, 4) AS seasonal,
           round(cents - trend - seasonal, 4) AS residual
    FROM se WHERE trend IS NOT NULL
    """,
    doc="Classical additive seasonal decomposition of the daily-revenue "
        "series (trend = centered 7-row moving average, complete windows "
        "only; seasonal = per-day-of-week mean detrended value; residual = "
        "remainder). The corpus-sized work is ONE aggregation to the "
        "bounded daily grid in exact integer cents; both windows then run "
        "on ~2.4k rows. Day-of-week comes from an epoch-anchored modulo "
        "(datediff from a pinned date) — NOT the engines' dayofweek(), "
        "whose Sunday=0/1 conventions differ. Per-day detrended values are "
        "quantized to exact 1e-2-unit int64s before the seasonal mean so "
        "the only unquantized float ops (two divisions, the final "
        "subtraction) are identical IEEE arithmetic in both engines. At "
        "100 TB this is the standard pre-aggregate-then-decompose shape; "
        "the grid windows are a single-partition concern only because the "
        "grid is bounded — per-series decomposition would partition by "
        "series key. Reference parity: extension surface (SURVEY.md §2.B "
        "time-series).",
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "cents",
        (F.datediff(F.col("d"), F.lit("1995-01-01").cast("date")) % 7).alias(
            "dow"
        ),
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.sum("cents").over(w).cast("double") / 7,
        ).alias("trend"),
    )
    dw = Window.partitionBy("dow")
    detr_q = F.when(
        F.col("trend").isNotNull(),
        F.round((F.col("cents") - F.col("trend")) * 100).cast("long"),
    )
    se = tr.select(
        "d",
        "cents",
        "trend",
        (
            F.sum(detr_q).over(dw).cast("double")
            / 100
            / F.count("trend").over(dw)
        ).alias("seasonal"),
    )
    return se.where(F.col("trend").isNotNull()).select(
        F.col("d").cast("timestamp").alias("day"),
        "cents",
        F.round("trend", 4).alias("trend"),
        F.round("seasonal", 4).alias("seasonal"),
        F.round(F.col("cents") - F.col("trend") - F.col("seasonal"), 4).alias(
            "residual"
        ),
    )


@register(
    "ts_max_silence_gap",
    oracle="""
    WITH ordered AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
        FROM events
    ),
    gaps AS (
        SELECT user_id, (us - prev_us) // 60000000 AS gap_min
        FROM ordered WHERE prev_us IS NOT NULL
    ),
    per AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(MAX(gap_min) AS BIGINT) AS max_gap_min
        FROM gaps GROUP BY user_id
    )
    SELECT user_id, n_gaps, max_gap_min
    FROM per
    QUALIFY row_number() OVER (ORDER BY max_gap_min DESC, user_id) <= 20
    """,
    doc="Max-silence-gap detection (the liveness complement of "
        "dq_sequence_gap_audit's id-space check: which sensors/users went "
        "quiet longest?): per-key largest inter-event time gap via one "
        "lag window over (ts, event_id) order, top-20 silent keys. Exact "
        "epoch-microsecond arithmetic floored to minutes; the lag window "
        "and the per-key MAX share one user_id shuffle+sort, and the "
        "top-20 collapses via TakeOrdered partials — no global sort of "
        "the per-user table. Reference parity: extension surface "
        "(SURVEY.md §2.B time-series/DQ rows).",
)
def ts_max_silence_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    gaps = (
        e.select("user_id", us.alias("us"), F.lag(us).over(w).alias("prev_us"))
        .where(F.col("prev_us").isNotNull())
        .select(
            "user_id",
            F.floor((F.col("us") - F.col("prev_us")) / 60_000_000).alias(
                "gap_min"
            ),
        )
    )
    per = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.max("gap_min").cast("long").alias("max_gap_min"),
    )
    # Top-20 via orderBy().limit(): TakeOrderedAndProject (distributed
    # partial top-k) instead of an unpartitioned row_number window that
    # would single-partition-sort the whole per-user aggregate.
    return (
        per.orderBy(F.col("max_gap_min").desc(), "user_id")
        .limit(20)
        .select("user_id", "n_gaps", "max_gap_min")
    )


@register(
    "ts_record_highs",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    runs AS (
        SELECT d, cents,
               MAX(cents) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max
        FROM daily
    )
    SELECT CAST(d AS TIMESTAMP) AS day, cents,
           CAST(COALESCE(prev_max, 0) AS BIGINT) AS prev_max_cents
    FROM runs
    WHERE prev_max IS NULL OR cents > prev_max
    """,
    doc="Record-high detection (the 'new all-time high' monitor): days "
        "whose daily revenue exceeds every prior day, via a running MAX "
        "over the 1-PRECEDING frame (so the current day never masks "
        "itself). The corpus collapses to the bounded daily grid in exact "
        "cents first; the running window orders ~2.4k rows. First day "
        "counts as a record (NULL prior max). Per-series variants "
        "partition the window by key. Reference parity: extension surface "
        "(SURVEY.md §2.B time-series rows).",
)
def ts_record_highs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    runs = daily.withColumn("prev_max", F.max("cents").over(w))
    return runs.where(
        F.col("prev_max").isNull() | (F.col("cents") > F.col("prev_max"))
    ).select(
        F.col("d").cast("timestamp").alias("day"),
        "cents",
        F.coalesce(F.col("prev_max"), F.lit(0)).cast("long").alias(
            "prev_max_cents"
        ),
    )


@register(
    "ts_winsorize_robust_mean",
    oracle="""
    WITH v AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               event_id
        FROM events
        WHERE CAST(round(value * 100) AS BIGINT) >= 0
    ),
    ranked AS (
        SELECT user_id, cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY cents, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM v
    ),
    thr AS (
        SELECT user_id,
               MAX(CASE WHEN rn = greatest((n * 1) // 10, 1)
                        THEN cents END) AS lo,
               MAX(CASE WHEN rn = greatest((n * 9) // 10, 1)
                        THEN cents END) AS hi
        FROM ranked GROUP BY user_id
    )
    SELECT v.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(v.cents) AS BIGINT) * 100 // COUNT(*)
                AS BIGINT) AS raw_mean_microcents,
           CAST(CAST(SUM(least(greatest(v.cents, t.lo), t.hi)) AS BIGINT)
                * 100 // COUNT(*)
                AS BIGINT) AS winsorized_mean_microcents,
           CAST(count_if(v.cents < t.lo OR v.cents > t.hi) AS BIGINT)
               AS n_clamped
    FROM v JOIN thr t USING (user_id)
    GROUP BY v.user_id
    """,
    doc="Per-key winsorized mean (robust feature prep: clamp each user's "
        "values to their own rank-picked p10/p90 before averaging, so a "
        "few extreme events cannot dominate the profile): thresholds come "
        "from one per-key rank window (deterministic event_id tie-break, "
        "no interpolation), the clamp+mean is a second pass over the same "
        "user_id partitioning — Catalyst reuses the shuffle. Exact "
        "integer-cents arithmetic throughout; means emerge from integral "
        "division of exact sums (non-negative domain enforced in-plan, "
        "where Spark's truncating div and DuckDB's flooring // agree). "
        "Reports raw vs winsorized mean and the clamp count per user. "
        "Reference parity: extension surface (SURVEY.md §2.B "
        "time-series/ML rows).",
)
def ts_winsorize_robust_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
        # non-negative guard: the integral division below truncates in
        # Spark but floors in DuckDB — identical only for cents >= 0
    ).where(F.col("cents") >= 0)
    w = Window.partitionBy("user_id").orderBy("cents", "event_id")
    ranked = v.select(
        "user_id",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    one = F.lit(1).cast("long")
    thr = ranked.groupBy("user_id").agg(
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.floor(F.col("n") / 10), one),
                F.col("cents"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn")
                == F.greatest(F.floor(F.col("n") * 9 / 10), one),
                F.col("cents"),
            )
        ).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return (
        v.join(thr, "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.sum(clamped).cast("long").alias("sum_wins_cents"),
            F.count_if(
                (F.col("cents") < F.col("lo")) | (F.col("cents") > F.col("hi"))
            ).alias("n_clamped"),
        )
        # Integer-divided micro-cents: double (or decimal) division rounds
        # at the half-boundary and the rounding differs between engines;
        # integer division of exact sums cannot. DOMAIN NOTE: Spark `div`
        # truncates toward zero while DuckDB `//` floors — identical ONLY
        # for non-negative numerators, which the cents >= 0 guard above
        # makes structural rather than a testdata accident.
        .select(
            "user_id",
            "n_events",
            F.expr("(sum_cents * 100) div n_events").alias(
                "raw_mean_microcents"
            ),
            F.expr("(sum_wins_cents * 100) div n_events").alias(
                "winsorized_mean_microcents"
            ),
            "n_clamped",
        )
    )


@register(
    "ts_max_drawdown",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    cum AS (
        SELECT d, cents,
               SUM(cents) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS equity
        FROM daily
    ),
    dd AS (
        SELECT d, equity,
               MAX(equity) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS peak
        FROM cum
    )
    SELECT CAST(d AS TIMESTAMP) AS trough_day,
           CAST(peak - equity AS BIGINT) AS drawdown_cents,
           CAST(peak AS BIGINT) AS peak_cents
    FROM dd
    QUALIFY row_number() OVER (ORDER BY peak - equity DESC, d) = 1
    """,
    doc="Maximum drawdown of the cumulative daily-revenue curve (the "
        "risk metric: largest peak-to-trough fall of the running total): "
        "running equity and running peak share ONE ordered window pass on "
        "the bounded daily grid (exact integer cents — a float cumsum "
        "would drift between engines); the argmax trough is rank-picked "
        "with a date tie-break. Corpus work is the one daily "
        "aggregation. Per-series drawdown partitions the windows by key. "
        "Reference parity: extension surface (SURVEY.md §2.B time-series "
        "rows).",
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.select(
        "d",
        F.sum("cents").over(w).alias("equity"),
    ).select(
        "d",
        "equity",
        F.max("equity").over(w).alias("peak"),
    )
    # Argmax via orderBy().limit(1): TakeOrderedAndProject instead of an
    # unpartitioned row_number window over the day series.
    return (
        dd.select(
            F.col("d").cast("timestamp").alias("trough_day"),
            (F.col("peak") - F.col("equity"))
            .cast("long")
            .alias("drawdown_cents"),
            F.col("peak").cast("long").alias("peak_cents"),
        )
        .orderBy(F.col("drawdown_cents").desc(), "trough_day")
        .limit(1)
    )


@register(
    "ts_pacf_durbin_levinson",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    lagged AS (
        SELECT l.k, a.cents AS x, b.cents AS y
        FROM (SELECT unnest(generate_series(1, 3)) AS k) l
        JOIN daily b ON TRUE
        JOIN daily a ON a.d = b.d + CAST(l.k AS INTEGER)
    ),
    s AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(18,0))
                        * CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(18,0))
                        * CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(x AS DECIMAL(18,0))
                        * CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS sxy
        FROM lagged GROUP BY k
    ),
    acf AS (
        SELECT k,
               (CAST(n AS DOUBLE) * sxy - sx * sy)
               / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                      * (CAST(n AS DOUBLE) * syy - sy * sy)) AS r
        FROM s
    ),
    rp AS (
        SELECT MAX(CASE WHEN k = 1 THEN r END) AS r1,
               MAX(CASE WHEN k = 2 THEN r END) AS r2,
               MAX(CASE WHEN k = 3 THEN r END) AS r3
        FROM acf
    ),
    lvl2 AS (
        SELECT r1, r2, r3,
               (r2 - r1 * r1) / (1 - r1 * r1) AS p22
        FROM rp
    )
    SELECT round(r1, 6) AS acf1, round(r2, 6) AS acf2,
           round(r3, 6) AS acf3,
           round(r1, 6) AS pacf1,
           round(p22, 6) AS pacf2,
           round((r3 - (r1 - p22 * r1) * r2 - p22 * r1)
                 / (1 - (r1 - p22 * r1) * r1 - p22 * r2), 6) AS pacf3
    FROM lvl2
    """,
    doc="Partial autocorrelation (lags 1-3) via the Durbin-Levinson "
        "recursion — the ARIMA order-selection diagnostic that, unlike "
        "plain ACF (ts_acf_daily), removes the shorter-lag carryover. "
        "Lag correlations come from shifted-date equi-joins over the "
        "bounded daily grid with exact DECIMAL power sums (the "
        "ts_cross_correlation recipe: Pearson on identical integers — "
        "one join keyed on the shifted date, all three lags share it via "
        "a 3-row lag spine); the recursion itself is unrolled scalar "
        "double arithmetic on a 1-row frame (+,-,*,/ and sqrt only — "
        "IEEE-pinned, no quantization needed). Corpus-sized work is the "
        "one daily aggregation; everything after is O(lags^2) scalars. "
        "Reference parity: extension surface (SURVEY.md §2.B time-series "
        "rows).",
)
def ts_pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    ).localCheckpoint(eager=True)  # both sides of the lag join
    lags = spark.range(1, 4).select(F.col("id").cast("int").alias("k"))
    b = daily.crossJoin(F.broadcast(lags)).select(
        "k",
        F.date_add(F.col("d"), F.col("k")).alias("d"),
        F.col("cents").alias("y"),
    )
    lagged = daily.select("d", F.col("cents").alias("x")).join(
        b, "d"
    )
    dec = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
    s = lagged.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("x") * dec("x")).cast("double").alias("sxx"),
        F.sum(dec("y") * dec("y")).cast("double").alias("syy"),
        F.sum(dec("x") * dec("y")).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    acf = s.select(
        "k",
        (
            (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (nd * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("r"),
    )
    rp = acf.agg(
        F.max(F.when(F.col("k") == 1, F.col("r"))).alias("r1"),
        F.max(F.when(F.col("k") == 2, F.col("r"))).alias("r2"),
        F.max(F.when(F.col("k") == 3, F.col("r"))).alias("r3"),
    )
    lvl2 = rp.select(
        "r1",
        "r2",
        "r3",
        (
            (F.col("r2") - F.col("r1") * F.col("r1"))
            / (1 - F.col("r1") * F.col("r1"))
        ).alias("p22"),
    )
    p21 = F.col("r1") - F.col("p22") * F.col("r1")
    return lvl2.select(
        F.round("r1", 6).alias("acf1"),
        F.round("r2", 6).alias("acf2"),
        F.round("r3", 6).alias("acf3"),
        F.round("r1", 6).alias("pacf1"),
        F.round("p22", 6).alias("pacf2"),
        F.round(
            (
                F.col("r3")
                - p21 * F.col("r2")
                - F.col("p22") * F.col("r1")
            )
            / (
                1
                - p21 * F.col("r1")
                - F.col("p22") * F.col("r2")
            ),
            6,
        ).alias("pacf3"),
    )


@register(
    "ts_bollinger_breakouts",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    wnd AS (
        SELECT d, cents,
               COUNT(*) OVER w AS cnt,
               CAST(SUM(CAST(cents AS DECIMAL(18,0))) OVER w AS DOUBLE)
                   AS s1,
               CAST(SUM(CAST(cents AS DECIMAL(18,0))
                        * CAST(cents AS DECIMAL(18,0))) OVER w AS DOUBLE)
                   AS s2
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    ev AS (
        SELECT cents,
               CAST(cents AS DOUBLE) - s1 / CAST(cnt AS DOUBLE) AS dev,
               sqrt((CAST(cnt AS DOUBLE) * s2 - s1 * s1)
                    / (CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE))) AS std
        FROM wnd WHERE cnt = 20
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days_evaluated,
           CAST(count_if(dev > 2 * std) AS BIGINT) AS n_upper_breakouts,
           CAST(count_if(dev < -2 * std) AS BIGINT) AS n_lower_breakouts
    FROM ev
    """,
    doc="Bollinger-band breakout detection on the daily-revenue series: "
        "20-day trailing mean and population sigma from exact DECIMAL "
        "power sums sharing ONE ordered window pass over the bounded "
        "daily grid (count/sum/sum-of-squares ride the same frame — the "
        "engine's mergeable-moments recipe applied to a rolling frame), "
        "then a 2-sigma deviation test per full-window day. All float "
        "math is +,-,*,/,sqrt on identical doubles derived from exact "
        "integers — IEEE-pinned, no quantization needed even for the "
        "comparison against 2*std. Days with fewer than 20 trailing "
        "observations are excluded deterministically (cnt = 20). "
        "Per-series variants partition the same window by key. Reference "
        "parity: extension surface (SURVEY.md §2.B time-series rows).",
)
def ts_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("d").rowsBetween(-19, 0)
    dec = F.col("cents").cast("decimal(18,0)")
    wnd = daily.select(
        "cents",
        F.count(F.lit(1)).over(w).alias("cnt"),
        F.sum(dec).over(w).cast("double").alias("s1"),
        F.sum(dec * dec).over(w).cast("double").alias("s2"),
    )
    cntd = F.col("cnt").cast("double")
    ev = wnd.where(F.col("cnt") == 20).select(
        (F.col("cents").cast("double") - F.col("s1") / cntd).alias("dev"),
        F.sqrt(
            (cntd * F.col("s2") - F.col("s1") * F.col("s1"))
            / (cntd * cntd)
        ).alias("std"),
    )
    return ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_days_evaluated"),
        F.count_if(F.col("dev") > 2 * F.col("std"))
        .cast("long")
        .alias("n_upper_breakouts"),
        F.count_if(F.col("dev") < -2 * F.col("std"))
        .cast("long")
        .alias("n_lower_breakouts"),
    )


@register(
    "ts_theil_sen_slope",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    pts AS (
        SELECT datediff('day', DATE '1995-01-01', d) AS di, cents AS yi
        FROM daily
    ),
    pairs AS (
        SELECT CAST(round(CAST(b.yi - a.yi AS DOUBLE) * 1000000
                          / (b.di - a.di)) AS BIGINT) AS slope_micro
        FROM pts a JOIN pts b ON a.di < b.di
    ),
    by_val AS (
        SELECT slope_micro, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pairs GROUP BY slope_micro
    ),
    cum AS (
        SELECT slope_micro, cnt,
               SUM(cnt) OVER (ORDER BY slope_micro
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(cnt) OVER () AS n
        FROM by_val
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           CAST(MAX(n) AS BIGINT) AS n_pairs,
           CAST(MAX(CASE WHEN (n + 1) // 2 > cum - cnt
                          AND (n + 1) // 2 <= cum
                         THEN slope_micro END) AS BIGINT)
               AS slope_micro_per_day
    FROM cum
    """,
    doc="Theil-Sen robust trend estimator over the daily-revenue series: "
        "the median of all pairwise slopes (y_j - y_i) / (d_j - d_i) — "
        "the breakdown-resistant alternative to OLS slope "
        "(agg_corr_regression) that one outlier day cannot move. The "
        "pairwise join runs on the BOUNDED day-aggregated grid (#days^2 "
        "pairs — ~7 years of days, not corpus rows; the corpus-sized "
        "work is the one daily aggregation), slopes are quantized to "
        "exact micro-units (one IEEE-pinned multiply+divide per pair, "
        "then round — identical in both engines), and the median is "
        "picked from cumulative counts over the DISTINCT-slope aggregate "
        "(the engine's value-domain rank-pick recipe — no per-row global "
        "sort). At larger grids the standard refinement is the "
        "randomized O(n log n) Theil-Sen (sample pairs), which keeps the "
        "same plan shape over a hash-sampled pair subset. Reference "
        "parity: extension surface (SURVEY.md §2.B time-series rows).",
)
def ts_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    ).localCheckpoint(eager=True)  # pair join consumes it twice
    pts = daily.select(
        F.datediff(F.col("d"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("di"),
        F.col("cents").alias("yi"),
    )
    b = pts.select(F.col("di").alias("dj"), F.col("yi").alias("yj"))
    slope = F.round(
        (F.col("yj") - F.col("yi")).cast("double")
        * 1_000_000
        / (F.col("dj") - F.col("di"))
    ).cast("long")
    # NO theta-join: a di<dj BroadcastNestedLoopJoin is row-at-a-time
    # outside whole-stage codegen (measured 17 s as a stats-less
    # CartesianProduct, ~7 s even broadcast, at sf0.1). Instead each day
    # EXPLODES its candidate partner range di+1..max(di) map-side (pure
    # codegen) and a broadcast HASH join on dj keeps only observed days —
    # identical pair set, ~1 s. The explode volume is the pair count
    # itself (#days^2/2), which the estimator inherently enumerates.
    dmax = pts.agg(F.max("di").alias("dmax"))
    # The day grid arrives as 1-2 post-aggregation partitions (its byte
    # volume is trivial), but the explode below fans each day out into
    # ~#days rows — #days^2/2 codegen'd slope evaluations total. Spreading
    # the bounded grid round-robin across the cluster first costs a
    # ~#days-row shuffle and parallelizes the pair stage, which otherwise
    # runs on as many cores as the grid has partitions (measured at
    # sf0.1: the whole 2.9M-pair enumeration ran in one task).
    from wal_consumer_spark.operators.partitioning import spread_small_input

    pairs = (
        spread_small_input(pts)
        .crossJoin(F.broadcast(dmax))
        .where(F.col("di") < F.col("dmax"))
        .select(
            "di",
            "yi",
            F.explode(
                F.sequence(F.col("di") + 1, F.col("dmax"))
            ).alias("dj"),
        )
        .join(F.broadcast(b), "dj")
        .select(slope.alias("slope_micro"))
    )
    # Exact median by TWO-PHASE DISTRIBUTED SELECTION: micro-quantized
    # slopes are nearly all distinct, so a groupBy(slope) + global cum
    # window degenerates to a no-reduction 2.9M-group aggregate feeding a
    # 2.9M-row single-partition window (measured 6.8 s at sf0.1). Instead:
    # (1) coarse buckets (slope div 1e9 — truncation is monotonic, which
    # is all selection needs) aggregate with real map-side combining to a
    # bounded table; (2) a cum window over THAT locates the bucket holding
    # global rank (n+1)//2 and the residual rank within it (1 broadcast
    # row); (3) only that bucket's pairs are re-scanned and resolved with
    # a small value-level cum. Same value as the naive global rank-pick —
    # the oracle keeps the one-shot formulation. Measured 6.8 s -> ~2.5 s;
    # at 100 TB this is the textbook exact-quantile-without-global-sort
    # plan (generalizes to any rank).
    from wal_consumer_spark.operators.selection import exact_rank_selection

    pairs = pairs.persist()
    med = exact_rank_selection(
        pairs,
        "slope_micro",
        {"median": lambda n: F.floor((n + 1) / 2).cast("long")},
        bucket_div=1_000_000_000,
    ).select(F.col("value").alias("slope_micro_per_day"))
    # r12 (guide §1.2 — don't compute what you can derive): the explode
    # emits di -> di+1..dmax and the hash join keeps exactly the OBSERVED
    # dj, so `pairs` is precisely every ordered pair of observed days —
    # |pairs| = n_days*(n_days-1)/2 by construction. Deriving it drops a
    # third full pass over the persisted 2.9M-row pair frame (the oracle
    # keeps counting MAX(n) from the materialized pairs; parity pins the
    # equivalence).
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        n_days.crossJoin(F.broadcast(med))
        .select(
            "n_days",
            (F.col("n_days") * (F.col("n_days") - 1) / 2)
            .cast("long")
            .alias("n_pairs"),
            "slope_micro_per_day",
        )
    )


_TS_SAMP_SALT = ":tssamp42"
_TS_SAMP_PCT = 25
_TS_SAMP_GATE_SQL = (
    "('0x' || substring(md5(CAST(a.di AS VARCHAR) || ':' || "
    f"CAST(b.di AS VARCHAR) || '{_TS_SAMP_SALT}'), 1, 8))::BIGINT % 100"
    f" < {_TS_SAMP_PCT}"
)


@register(
    "ts_theil_sen_sampled",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    pts AS (
        SELECT datediff('day', DATE '1995-01-01', d) AS di, cents AS yi
        FROM daily
    ),
    pairs AS (
        SELECT CAST(round(CAST(b.yi - a.yi AS DOUBLE) * 1000000
                          / (b.di - a.di)) AS BIGINT) AS slope_micro
        FROM pts a JOIN pts b ON a.di < b.di
        WHERE {_TS_SAMP_GATE_SQL}
    ),
    by_val AS (
        SELECT slope_micro, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pairs GROUP BY slope_micro
    ),
    cum AS (
        SELECT slope_micro, cnt,
               SUM(cnt) OVER (ORDER BY slope_micro
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(cnt) OVER () AS n
        FROM by_val
    ),
    tot AS (
        SELECT (SELECT COUNT(*) FROM daily) AS n_days,
               (SELECT COUNT(*) * (COUNT(*) - 1) // 2 FROM daily)
                   AS n_pairs_total
    )
    SELECT CAST(n_days AS BIGINT) AS n_days,
           CAST(n_pairs_total AS BIGINT) AS n_pairs_total,
           CAST(MAX(n) AS BIGINT) AS n_sampled,
           CAST(MAX(CASE WHEN (n + 1) // 2 > cum - cnt
                          AND (n + 1) // 2 <= cum
                         THEN slope_micro END) AS BIGINT)
               AS slope_micro_sampled,
           abs(CAST(MAX(n) AS DOUBLE)
               - CAST(n_pairs_total AS DOUBLE) * {_TS_SAMP_PCT} / 100)
               <= 5 * sqrt(CAST(n_pairs_total AS DOUBLE)
                           * {_TS_SAMP_PCT} / 100
                           * (100 - {_TS_SAMP_PCT}) / 100) AS sample_ok
    FROM cum CROSS JOIN tot
    GROUP BY n_days, n_pairs_total
    """,
    doc="Randomized Theil-Sen (round-4 VERDICT stretch #8, the refinement "
        "the exact variant's doc names): the pairwise-slope median over a "
        "DETERMINISTIC ~25% hash-sample of day pairs — md5 gating on "
        "(di, dj), the engine's established cross-engine sampling "
        "primitive, applied MAP-SIDE right after pair generation so "
        "everything downstream (shuffle, two-phase selection) sees only "
        "p*n^2 rows. An in-plan certificate bounds the realized sample "
        "size within 5 sigma of the binomial expectation (exact integer "
        "totals, one sqrt on identical doubles). The exact variant "
        "ts_theil_sen_slope stays registered as the full-pair reference "
        "at this SF; on grids where even days^2 explodes, this is the "
        "plan to run. Reference parity: extension surface (SURVEY.md "
        "§2.C time-series rows).",
)
def ts_theil_sen_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.selection import exact_rank_selection

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    ).localCheckpoint(eager=True)  # pair join consumes it twice
    pts = daily.select(
        F.datediff(F.col("d"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("di"),
        F.col("cents").alias("yi"),
    )
    b = pts.select(F.col("di").alias("dj"), F.col("yi").alias("yj"))
    slope = F.round(
        (F.col("yj") - F.col("yi")).cast("double")
        * 1_000_000
        / (F.col("dj") - F.col("di"))
    ).cast("long")
    gate = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("di").cast("string"),
                            F.lit(":"),
                            F.col("dj").cast("string"),
                            F.lit(_TS_SAMP_SALT),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(100),
        )
        < _TS_SAMP_PCT
    )
    dmax = pts.agg(F.max("di").alias("dmax"))
    # same map-side explode pair generation as the exact variant (no
    # theta-join); the hash gate filters INSIDE the generating projection,
    # before any shuffle. Same round-robin spread of the bounded day grid
    # as the exact variant so the pair enumeration parallelizes.
    from wal_consumer_spark.operators.partitioning import spread_small_input

    sampled = (
        spread_small_input(pts)
        .crossJoin(F.broadcast(dmax))
        .where(F.col("di") < F.col("dmax"))
        .select(
            "di",
            "yi",
            F.explode(F.sequence(F.col("di") + 1, F.col("dmax"))).alias("dj"),
        )
        .join(F.broadcast(b), "dj")
        .where(gate)
        .select(slope.alias("slope_micro"))
        .persist()
    )
    med = exact_rank_selection(
        sampled,
        "slope_micro",
        {"median": lambda n: F.floor((n + 1) / 2).cast("long")},
        bucket_div=1_000_000_000,
    ).select(F.col("value").alias("slope_micro_sampled"))
    n_sampled = sampled.agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
    totals = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (
            F.count(F.lit(1)) * (F.count(F.lit(1)) - 1) / 2
        ).cast("long").alias("n_pairs_total"),
    )
    expected = F.col("n_pairs_total").cast("double") * _TS_SAMP_PCT / 100
    tol = 5 * F.sqrt(
        F.col("n_pairs_total").cast("double")
        * _TS_SAMP_PCT / 100
        * (100 - _TS_SAMP_PCT) / 100
    )
    return (
        totals.crossJoin(F.broadcast(n_sampled))
        .crossJoin(F.broadcast(med))
        .select(
            "n_days",
            "n_pairs_total",
            "n_sampled",
            "slope_micro_sampled",
            (
                F.abs(F.col("n_sampled").cast("double") - expected) <= tol
            ).alias("sample_ok"),
        )
    )


@register(
    "ts_calendar_heatmap",
    oracle="""
    SELECT datediff('day', DATE '1995-01-01',
                    CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS dow,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hod,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM events
    GROUP BY 1, 2
    """,
    doc="Day-of-week x hour-of-day activity heatmap (the load-profile "
        "matrix behind capacity planning and anomaly baselines): "
        "epoch-anchored day-of-week (never the engines' divergent "
        "dayofweek() conventions) crossed with hour-of-day, counting "
        "events and exact cents per cell. Pure map-side bucketing into a "
        "fixed <=168-cell grid — partial aggregation reduces every task "
        "to the grid size before one trivial exchange, one pass at any "
        "scale. Reference parity: extension surface (SURVEY.md §2.B "
        "time-series rows).",
)
def ts_calendar_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dow = (
        F.datediff(F.to_date("ts"), F.lit("1995-01-01").cast("date")) % 7
    ).alias("dow")
    return e.groupBy(
        dow, F.hour(F.col("ts").cast("timestamp")).cast("int").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("value_cents"),
    )


@register(
    "ts_longest_rising_streak",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    flagged AS (
        SELECT d, cents,
               CASE WHEN cents > lag(cents) OVER (ORDER BY d)
                    THEN 0 ELSE 1 END AS brk
        FROM daily
    ),
    grouped AS (
        SELECT d, cents,
               SUM(brk) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS grp
        FROM flagged
    ),
    streaks AS (
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS len,
               CAST(MIN(d) AS TIMESTAMP) AS start_day,
               CAST(MAX(d) AS TIMESTAMP) AS end_day
        FROM grouped GROUP BY grp
    )
    SELECT len AS streak_days, start_day, end_day
    FROM streaks
    QUALIFY row_number() OVER (ORDER BY len DESC, start_day) <= 5
    """,
    doc="Longest strictly-rising revenue streaks (momentum detection): "
        "break flags from a lag comparison, runs recovered with the "
        "running-sum-of-breaks variant of gaps-and-islands (win_islands "
        "uses the id-difference form; this is the order-dependent-"
        "predicate form the id trick cannot express), top-5 streaks by "
        "length with a date tie-break. All on the bounded exact-cents "
        "daily grid after one corpus aggregation; per-series streaks "
        "partition every window by key. Reference parity: extension "
        "surface (SURVEY.md §2.B window/time-series rows).",
)
def ts_longest_rising_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    wo = Window.orderBy("d")
    flagged = daily.select(
        "d",
        "cents",
        F.when(F.col("cents") > F.lag("cents").over(wo), 0)
        .otherwise(1)
        .alias("brk"),
    )
    grouped = flagged.select(
        "d",
        "cents",
        F.sum("brk")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("grp"),
    )
    streaks = grouped.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("streak_days"),
        F.min("d").cast("timestamp").alias("start_day"),
        F.max("d").cast("timestamp").alias("end_day"),
    )
    # Top-5 via orderBy().limit(): TakeOrderedAndProject, not a global
    # row_number window (see round-3 VERDICT "What's wrong" #3 sweep).
    return (
        streaks.orderBy(F.col("streak_days").desc(), "start_day")
        .limit(5)
        .select("streak_days", "start_day", "end_day")
    )


@register(
    "ts_mtd_ytd_running",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS y,
               CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS m,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1, 2, 3
    )
    SELECT CAST(d AS TIMESTAMP) AS day, cents,
           CAST(SUM(cents) OVER (PARTITION BY y, m ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS mtd_cents,
           CAST(SUM(cents) OVER (PARTITION BY y ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS ytd_cents
    FROM daily
    """,
    doc="Month-to-date / year-to-date running totals (the fiscal "
        "reporting primitive): exact-cents daily grid, then two running "
        "windows whose partitions nest (month inside year) — Catalyst "
        "computes both off ONE sort order since (y, d) ordering also "
        "satisfies the (y, m) partitioning, the same shared-sort trick "
        "as win_rolling_autocorr's five frames. Corpus work is the one "
        "daily aggregation; windows run on the bounded calendar. "
        "Reference parity: extension surface (SURVEY.md §2.B "
        "window/time-series rows).",
)
def ts_mtd_ytd_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("d"),
        F.year(F.col("o_orderdate").cast("timestamp")).cast("int").alias("y"),
        F.month(F.col("o_orderdate").cast("timestamp")).cast("int").alias("m"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    wm = (
        Window.partitionBy("y", "m")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wy = (
        Window.partitionBy("y")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        F.col("d").cast("timestamp").alias("day"),
        "cents",
        F.sum("cents").over(wm).cast("long").alias("mtd_cents"),
        F.sum("cents").over(wy).cast("long").alias("ytd_cents"),
    )


@register(
    "ts_acf_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    pairs AS (
        SELECT l.lag AS lag, a.cents AS x, b.cents AS y
        FROM daily a
        CROSS JOIN (SELECT unnest(generate_series(1, 14)) AS lag) l
        JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)
    ),
    s AS (
        SELECT lag,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                    AS DOUBLE) AS syy,
               CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                    AS DOUBLE) AS sxy
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n_days,
           round((n_days*sxy - sx*sy)
                 / sqrt((n_days*sxx - sx*sx) * (n_days*syy - sy*sy)), 6)
               AS acf
    FROM s
    """,
    doc="Autocorrelation function of the daily-revenue series, lags 1..14 "
        "(the full ACF diagnostic behind ARIMA order selection and "
        "seasonality confirmation — win_rolling_autocorr tracks lag-1 "
        "over a moving frame; this is the all-lags global view): the "
        "corpus collapses once to the exact-cents daily grid, the lag "
        "expansion is a shifted-date equi-join on the bounded grid (the "
        "ts_cross_correlation machinery, self-joined), and each lag's "
        "Pearson uses exact DECIMAL(38) sums with the IEEE-pinned "
        "+,-,*,/,sqrt finish. Reference parity: extension surface "
        "(SURVEY.md §2.B time-series rows).",
)
def ts_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    ).localCheckpoint(eager=True)
    lags = spark.range(1, 15).select(F.col("id").cast("int").alias("lag"))
    a = daily.crossJoin(F.broadcast(lags)).select(
        "lag",
        F.date_add(F.col("d"), F.col("lag")).alias("match_d"),
        F.col("cents").alias("x"),
    )
    b = daily.select(F.col("d").alias("match_d"), F.col("cents").alias("y"))
    x = F.col("x").cast("decimal(38,0)")
    y = F.col("y").cast("decimal(38,0)")
    n = F.count(F.lit(1))
    s = (
        a.join(F.broadcast(b), "match_d")
        .groupBy("lag")
        .agg(
            n.alias("n_days"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(y * y).cast("double").alias("syy"),
            F.sum(x * y).cast("double").alias("sxy"),
        )
    )
    nd = F.col("n_days")
    cov = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        F.col("lag").cast("long").alias("lag"),
        "n_days",
        F.round(cov / F.sqrt(vx * vy), 6).alias("acf"),
    )


@register(
    "ts_missing_data_profile",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        FROM events
    ),
    span AS (
        SELECT user_id, MIN(d) AS first_d, MAX(d) AS last_d,
               CAST(COUNT(*) AS BIGINT) AS observed_days
        FROM ud GROUP BY user_id
    )
    SELECT user_id, observed_days,
           CAST(datediff('day', first_d, last_d) + 1 AS BIGINT)
               AS span_days,
           CAST(datediff('day', first_d, last_d) + 1 AS BIGINT)
               - observed_days AS missing_days,
           round(CAST(observed_days AS DOUBLE)
                 / (datediff('day', first_d, last_d) + 1), 6) AS coverage
    FROM span
    QUALIFY row_number() OVER (
        ORDER BY CAST(observed_days AS DOUBLE)
                 / (datediff('day', first_d, last_d) + 1), user_id) <= 25
    """,
    doc="Per-series data-completeness profile (the pre-flight check "
        "before any resample/interpolate run: a series with 40% coverage "
        "needs LOCF policy decisions, not silent interpolation): observed "
        "active days vs the first-to-last calendar span per user, "
        "reporting the 25 sparsest series. One DISTINCT incidence pass + "
        "a per-key MIN/MAX/COUNT — a single user_id shuffle; the "
        "coverage ranking runs on the bounded per-user table via "
        "TakeOrdered partials. Companion to ts_resample_locf (which "
        "fills the gaps this query measures) and ts_max_silence_gap "
        "(intra-day granularity). Reference parity: extension surface "
        "(SURVEY.md §2.B time-series/DQ rows).",
)
def ts_missing_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    span = ud.groupBy("user_id").agg(
        F.min("d").alias("first_d"),
        F.max("d").alias("last_d"),
        F.count(F.lit(1)).alias("observed_days"),
    )
    span_days = (F.datediff(F.col("last_d"), F.col("first_d")) + 1).cast(
        "long"
    )
    coverage = F.col("observed_days").cast("double") / (
        F.datediff(F.col("last_d"), F.col("first_d")) + 1
    )
    # Bottom-25 coverage via orderBy().limit(): TakeOrderedAndProject
    # instead of an unpartitioned row_number window over all users.
    return (
        span.orderBy(coverage, "user_id")
        .limit(25)
        .select(
            "user_id",
            "observed_days",
            span_days.alias("span_days"),
            (span_days - F.col("observed_days")).cast("long").alias(
                "missing_days"
            ),
            F.round(coverage, 6).alias("coverage"),
        )
    )


@register(
    "ts_anova_weekday_effect",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               datediff('day', DATE '1995-01-01',
                        CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE)) % 7
                   AS dow,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1, 2
    ),
    g AS (
        SELECT dow,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s,
               CAST(SUM(CAST(cents AS DECIMAL(38,0))
                        * CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS ss
        FROM daily GROUP BY dow
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt,
               CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE) AS st,
               CAST(SUM(CAST(ss AS DECIMAL(38,6))) AS DOUBLE) AS sst,
               CAST(SUM(CAST(s * s / n AS DECIMAL(38,0))) AS DOUBLE) AS sm,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g
    )
    SELECT t.k AS n_groups, t.nt AS n_days,
           round((t.sm - t.st * t.st / t.nt) / (t.k - 1)
                 / ((t.sst - t.sm) / (t.nt - t.k)), 6) AS f_stat
    FROM tot t
    """,
    doc="One-way ANOVA F-statistic for a day-of-week effect on daily "
        "revenue (is weekday seasonality real or noise? — the hypothesis "
        "test behind ts_seasonal_decompose's seasonal term): "
        "between-group and within-group sums of squares derive entirely "
        "from per-group (n, sum, sum-of-squares) in exact DECIMAL over "
        "the bounded daily grid; F = (SSB/(k-1)) / (SSW/(N-k)) is "
        "identical double arithmetic on 7 group rows. Epoch-anchored "
        "day-of-week as everywhere. Corpus work: the one daily rollup. "
        "Reference parity: extension surface (SURVEY.md §2.B "
        "time-series/stats rows).",
)
def ts_anova_weekday_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("d"),
        (
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
            % 7
        ).alias("dow"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    g = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("double").alias("s"),
        F.sum(
            F.col("cents").cast("decimal(38,0)")
            * F.col("cents").cast("decimal(38,0)")
        )
        .cast("double")
        .alias("ss"),
    )
    agg = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").cast("long").alias("nt"),
        F.sum(F.col("s").cast("decimal(38,6)")).cast("double").alias("st"),
        F.sum(F.col("ss").cast("decimal(38,6)")).cast("double").alias("sst"),
        # each s^2/n term quantized to integer DECIMAL before the sum:
        # summing raw doubles across 7 group rows is partition-order
        # dependent; the exact-decimal sum is not (term magnitude ~1e18,
        # so the <1-unit quantization is immaterial)
        F.sum((F.col("s") * F.col("s") / F.col("n")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sm"),
    )
    ssb = F.col("sm") - F.col("st") * F.col("st") / F.col("nt")
    ssw = F.col("sst") - F.col("sm")
    return agg.select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("nt").alias("n_days"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("nt") - F.col("k"))), 6
        ).alias("f_stat"),
    )


@register(
    "ts_rolling_distinct_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM events
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
            AS day
        FROM bounds
    ),
    rolled AS (
        SELECT s.day, COUNT(DISTINCT u.user_id) AS n
        FROM spine s JOIN ud u ON u.day BETWEEN s.day - 6 AND s.day
        GROUP BY 1
    )
    SELECT CAST(spine.day AS TIMESTAMP) AS day,
           CAST(COALESCE(n, 0) AS BIGINT) AS active_users_7d
    FROM spine LEFT JOIN rolled ON rolled.day = spine.day
    """,
    doc="Exact trailing-7-day distinct active users per calendar day — the "
        "sliding-window COUNT(DISTINCT) Spark windows cannot express "
        "(DISTINCT is unsupported in window frames) and a range join "
        "does in O(days * activity). Instead each distinct (user, day) "
        "row is exploded to the 7 report days it contributes to "
        "(map-side, bounded fan-out = window width), then one "
        "day-keyed exact distinct aggregate runs per report day — "
        "Catalyst expands it to a two-phase (day, user) partial so no "
        "day's full user set ever sits in one task's memory. The "
        "calendar spine LEFT JOIN (broadcast, calendar-sized) restores "
        "quiet days as explicit zeros. The oracle is the naive "
        "range-join formulation, certifying the offset-explode rewrite. "
        "At 100 TB: 2 narrow shuffles ((user,day) distinct, then "
        "(day,user) partial), fan-out fixed at 7, no global window.",
)
def ts_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date(F.col("ts").cast("timestamp")).alias("day")
    ).distinct()
    bounds = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    rolled = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
            "day",
        )
        .select("user_id", F.date_add(F.col("day"), F.col("off")).alias("day"))
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("n"))
    )
    # broadcast the AGGREGATE (calendar-bounded) side: a left join cannot
    # build its preserved left side, so hinting the spine would silently
    # degrade to a shuffle join (HintErrorLogger warning).
    return spine.join(F.broadcast(rolled), "day", "left").select(
        F.col("day").cast("timestamp").alias("day"),
        F.coalesce("n", F.lit(0)).cast("long").alias("active_users_7d"),
    )


@register(
    "ts_rolling_distinct_hll",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM events
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
            AS day
        FROM bounds
    ),
    rolled AS (
        SELECT s.day, COUNT(DISTINCT u.user_id) AS n
        FROM spine s JOIN ud u ON u.day BETWEEN s.day - 6 AND s.day
        GROUP BY 1
    )
    SELECT CAST(spine.day AS TIMESTAMP) AS day,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_exact,
           TRUE AS within_5pct
    FROM spine LEFT JOIN rolled ON rolled.day = spine.day
    """,
    doc="Sliding 7-day distinct actives via MERGEABLE HLL sketches — the "
        "100 TB companion to ts_rolling_distinct_users: one HLL sketch "
        "per day (the only pass over raw events), then the window merge "
        "operates on the PER-DAY SKETCH TABLE (days x 7 rows total, "
        "calendar-bounded) with hll_union_agg — so widening the window "
        "or recomputing a corrected day re-merges kilobyte sketches "
        "instead of rescanning event history, and daily sketches can "
        "be persisted as the incremental state of a metrics pipeline. "
        "Output is the exact count (computed by the certified "
        "offset-explode path) plus an in-plan check that the merged "
        "estimate (lgK 14, rsd ~0.8%) lands within 5%; the oracle "
        "replays the exact counts via the naive range join and asserts "
        "literal TRUE, the same certification pattern as "
        "agg_hll_partial_merge.",
)
def ts_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date(F.col("ts").cast("timestamp")).alias("day")
    ).distinct()
    bounds = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    off = F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
    exact = (
        ud.select("user_id", off, "day")
        .select("user_id", F.date_add(F.col("day"), F.col("off")).alias("day"))
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("n_exact"))
    )
    sk_day = ud.groupBy("day").agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    sk_roll = (
        sk_day.select(off, "day", "sk")
        .select(F.date_add(F.col("day"), F.col("off")).alias("day"), "sk")
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk", True)).alias("est"))
    )
    return (
        spine.join(F.broadcast(exact), "day", "left")
        .join(F.broadcast(sk_roll), "day", "left")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce("n_exact", F.lit(0)).cast("long").alias("n_exact"),
            F.coalesce(
                F.abs(F.col("est") - F.col("n_exact"))
                <= F.lit(0.05) * F.col("n_exact"),
                F.lit(True),
            ).alias("within_5pct"),
        )
    )


@register(
    "ts_holt_linear_smoothing",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               SUM(CAST(round(value * 100) AS BIGINT)) AS c
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
            AS day
        FROM bounds
    ),
    grid AS (
        SELECT et.event_type, s.day
        FROM (SELECT DISTINCT event_type FROM events) et CROSS JOIN spine s
    ),
    series AS (
        SELECT grid.event_type, grid.day,
               CAST(COALESCE(daily.c, 0) AS DOUBLE) AS v
        FROM grid LEFT JOIN daily
          ON daily.event_type = grid.event_type AND daily.day = grid.day
    ),
    idx AS (
        SELECT event_type, v,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
        FROM series
    ),
    n AS (SELECT event_type, MAX(i) AS n_days FROM idx GROUP BY 1)
    , st AS (
        SELECT event_type, i, v AS l, CAST(0.0 AS DOUBLE) AS b
        FROM idx WHERE i = 1
        UNION ALL
        SELECT nxt.event_type, nxt.i,
               0.5 * nxt.v + 0.5 * (st.l + st.b) AS l,
               0.25 * ((0.5 * nxt.v + 0.5 * (st.l + st.b)) - st.l)
                   + 0.75 * st.b AS b
        FROM st JOIN idx nxt
          ON nxt.event_type = st.event_type AND nxt.i = st.i + 1
    )
    SELECT st.event_type, CAST(n.n_days AS BIGINT) AS n_days,
           round(st.l, 6) AS level_cents,
           round(st.b, 6) AS trend_cents,
           round(st.l + 7 * st.b, 6) AS forecast_7d_cents
    FROM st JOIN n ON n.event_type = st.event_type AND st.i = n.n_days
    """,
    doc="Holt's linear (double-exponential) smoothing per event type — a "
        "RECURSIVE model no window frame can express (each state depends "
        "on the previous state, not a fixed frame) — as a higher-order "
        "fold: the gap-filled daily series is collected to a "
        "calendar-bounded array per series and aggregate()-folded with a "
        "struct {level, trend} accumulator, all inside whole-stage "
        "codegen (no UDF, no driver loop, one shuffle per series key). "
        "alpha=0.5 / beta=0.25 are exact binary fractions and both "
        "engines evaluate the textually identical update over the same "
        "ordered series, so every intermediate double is bit-identical. "
        "The oracle replays the recursion as a RECURSIVE CTE rather than "
        "DuckDB's list_reduce: that builtin mutates the accumulator "
        "struct field-by-field (the b update would see the already-"
        "overwritten level), which is not a left fold — discovered and "
        "pinned down while certifying this query. At 100 TB the array is "
        "bounded by the CALENDAR (days), never by event volume — the "
        "per-day pre-aggregation is the only pass over raw data; "
        "state-space models over unbounded keys would instead go "
        "through applyInPandasWithState (streaming/), this is the batch "
        "declarative form.",
)
def ts_holt_linear_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.col("ts").cast("timestamp")).alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"))
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    ets = ev.select("event_type").distinct()
    grid = ets.crossJoin(F.broadcast(spine))
    series = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce(F.col("c"), F.lit(0)).cast("double").alias("v"),
    )
    arr = series.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "v"))).alias("pairs"),
        F.count(F.lit(1)).alias("n_days"),
    )
    vs = F.transform(F.col("pairs"), lambda p: p["v"])
    def step(acc, x):
        newl = 0.5 * x["l"] + 0.5 * (acc["l"] + acc["b"])
        return F.struct(
            newl.alias("l"),
            (0.25 * (newl - acc["l"]) + 0.75 * acc["b"]).alias("b"),
        )
    # Emulate DuckDB's list_reduce (acc = first element) by folding the
    # tail with the head as the init struct.
    sv = F.transform(vs, lambda v: F.struct(v.alias("l"), F.lit(0.0).alias("b")))
    folded = F.aggregate(F.slice(sv, 2, F.size(sv) - 1), F.element_at(sv, 1), step)
    return arr.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.round(folded["l"], 6).alias("level_cents"),
        F.round(folded["b"], 6).alias("trend_cents"),
        F.round(folded["l"] + 7 * folded["b"], 6).alias("forecast_7d_cents"),
    )


@register(
    "ts_mann_kendall_trend",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1
    ),
    pts AS (
        SELECT datediff('day', DATE '1995-01-01', d) AS di, y FROM daily
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                             WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_stat
        FROM pts a JOIN pts b ON b.di > a.di
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM pts),
    ties AS (
        SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
                   AS tsum
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM pts GROUP BY y) g
    ),
    v AS (
        SELECT n.nd,
               (n.nd * (n.nd - 1) * (2 * n.nd + 5) - ties.tsum) AS var18
        FROM n, ties
    )
    SELECT v.nd AS n_days, s.s_stat AS s_stat,
           CAST(v.var18 AS BIGINT) AS var18,
           round(CASE WHEN s.s_stat > 0 THEN
                          (CAST(s.s_stat AS DOUBLE) - 1)
                          / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                      WHEN s.s_stat < 0 THEN
                          (CAST(s.s_stat AS DOUBLE) + 1)
                          / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                      ELSE 0.0 END, 6) AS z_stat,
           CASE WHEN round(CASE WHEN s.s_stat > 0 THEN
                          (CAST(s.s_stat AS DOUBLE) - 1)
                          / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                      WHEN s.s_stat < 0 THEN
                          (CAST(s.s_stat AS DOUBLE) + 1)
                          / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                      ELSE 0.0 END, 6) > 1.96 THEN 'increasing'
                WHEN round(CASE WHEN s.s_stat > 0 THEN
                          (CAST(s.s_stat AS DOUBLE) - 1)
                          / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                      WHEN s.s_stat < 0 THEN
                          (CAST(s.s_stat AS DOUBLE) + 1)
                          / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                      ELSE 0.0 END, 6) < -1.96 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM v, s
    """,
    doc="Mann-Kendall non-parametric trend test on daily revenue — the "
        "distribution-free companion to ts_theil_sen_slope (same pair "
        "space, S = sum of pairwise sign(y_j - y_i)): robust trend "
        "DETECTION where Theil-Sen gives the magnitude. The S statistic "
        "is an exact integer; the tie-corrected variance "
        "[n(n-1)(2n+5) - sum t(t-1)(2t+5)]/18 is exact-integer until one "
        "final sqrt/division (IEEE-pinned, then 1e-6 quantized). Pair "
        "enumeration reuses the Theil-Sen shape: map-side sequence "
        "explode + broadcast HASH join on the observed-day table (pure "
        "codegen, no BroadcastNestedLoop theta join) — the pair volume "
        "is days^2/2 on the CALENDAR-BOUNDED daily grid, independent of "
        "corpus row count. At 100 TB: one daily rollup over orders, then "
        "grid-sized work.",
)
def ts_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
            .cast("long")
            .alias("y")
        )
        .localCheckpoint(eager=True)  # pairs + ties + count all consume it
    )
    pts = daily.select(
        F.datediff(F.col("d"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("di"),
        "y",
    )
    b = pts.select(F.col("di").alias("dj"), F.col("y").alias("yj"))
    dmax = pts.agg(F.max("di").alias("dmax"))
    sgn = (
        F.when(F.col("yj") > F.col("y"), 1)
        .when(F.col("yj") < F.col("y"), -1)
        .otherwise(0)
    )
    s = (
        pts.crossJoin(F.broadcast(dmax))
        .where(F.col("di") < F.col("dmax"))
        .select(
            "y",
            F.explode(F.sequence(F.col("di") + 1, F.col("dmax"))).alias("dj"),
        )
        .join(F.broadcast(b), "dj")
        .agg(F.sum(sgn).cast("long").alias("s_stat"))
    )
    n = pts.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    ties = (
        pts.groupBy("y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias("tsum")
        )
    )
    v = n.crossJoin(F.broadcast(ties)).select(
        "nd",
        (
            F.col("nd") * (F.col("nd") - 1) * (2 * F.col("nd") + 5)
            - F.col("tsum")
        ).alias("var18"),
    )
    joined = v.crossJoin(F.broadcast(s))
    sd = F.col("s_stat").cast("double")
    denom = F.sqrt(F.col("var18").cast("double") / 18.0)
    z = F.round(
        F.when(F.col("s_stat") > 0, (sd - 1) / denom)
        .when(F.col("s_stat") < 0, (sd + 1) / denom)
        .otherwise(F.lit(0.0)),
        6,
    )
    return joined.select(
        F.col("nd").alias("n_days"),
        "s_stat",
        F.col("var18").cast("long").alias("var18"),
        z.alias("z_stat"),
        F.when(z > 1.96, F.lit("increasing"))
        .when(z < -1.96, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


@register(
    "ts_decayed_user_score",
    oracle="""
    WITH t AS (
        SELECT user_id,
               CASE datediff('day',
                             CAST(CAST(ts AS TIMESTAMP) AS DATE),
                             DATE '2024-01-31') // 7
                    WHEN 0 THEN 32 WHEN 1 THEN 16 WHEN 2 THEN 8
                    WHEN 3 THEN 4 WHEN 4 THEN 2 WHEN 5 THEN 1
                    ELSE 0 END
               * CAST(round(value * 100) AS BIGINT) AS w32
        FROM events
    )
    SELECT user_id,
           round(CAST(SUM(w32) AS DOUBLE) / 32, 6) AS decayed_cents
    FROM t GROUP BY user_id
    ORDER BY SUM(w32) DESC, user_id LIMIT 20
    """,
    doc="Recency-weighted user value score with EXACT half-life decay: "
        "weight 2^(-age_weeks) anchored at 2024-01-31 is kept as the "
        "integer 32 >> age (a dyadic rational scaled by 2^5), so every "
        "term is an exact int64 product, the per-user sum is "
        "order-independent and MERGEABLE (partials add across "
        "executors/shards — the incremental-scoring property pow()-"
        "based decay loses), and the one final /32 division is exact "
        "binary. No transcendental anywhere, so both engines agree "
        "bit-for-bit. One map-side expression + one user_id "
        "aggregation + TakeOrdered top-20; the weekly CASE ladder is "
        "the entire 'model'. The standard recency-ranking primitive "
        "for retention targeting / feature stores.",
)
def ts_decayed_user_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    age_w = F.expr(
        "datediff(DATE '2024-01-31', to_date(ts)) div 7"
    )
    w = (
        F.when(age_w == 0, 32)
        .when(age_w == 1, 16)
        .when(age_w == 2, 8)
        .when(age_w == 3, 4)
        .when(age_w == 4, 2)
        .when(age_w == 5, 1)
        .otherwise(0)
    )
    scored = (
        e.select(
            "user_id",
            (w * F.round(F.col("value") * 100).cast("long")).alias("w32"),
        )
        .groupBy("user_id")
        .agg(F.sum("w32").cast("long").alias("s32"))
    )
    return (
        scored.orderBy(F.col("s32").desc(), "user_id")
        .limit(20)
        .select(
            "user_id",
            F.round(F.col("s32").cast("double") / 32, 6).alias(
                "decayed_cents"
            ),
        )
    )


@register(
    "ts_xmr_control_chart",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    mr AS (
        SELECT d, cents,
               abs(cents - lag(cents) OVER (ORDER BY d)) AS mrange
        FROM daily
    ),
    lims AS (
        SELECT CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                   / COUNT(*) AS center,
               CAST(SUM(CAST(mrange AS DECIMAL(38,0))) AS DOUBLE)
                   / count(mrange) AS mrbar
        FROM mr
    )
    SELECT CAST(mr.d AS TIMESTAMP) AS day, mr.cents AS cents,
           round(lims.center, 6) AS center,
           round(lims.center + 2.66 * lims.mrbar, 6) AS ucl,
           round(lims.center - 2.66 * lims.mrbar, 6) AS lcl,
           CAST(mr.cents AS DOUBLE)
               > round(lims.center + 2.66 * lims.mrbar, 6)
           OR CAST(mr.cents AS DOUBLE)
               < round(lims.center - 2.66 * lims.mrbar, 6)
               AS out_of_control
    FROM mr CROSS JOIN lims
    """,
    doc="XmR (individuals & moving-range) control chart over daily "
        "revenue — the Shewhart SPC primitive for pipeline-health "
        "monitoring: process limits center ± 2.66·MRbar derive from "
        "the mean and the mean consecutive-day |delta| (the 2.66 = "
        "3/d2 constant for n=2 subgroups), every day flagged against "
        "the 1e-6-rounded limits so both engines agree at the "
        "boundary. Center and MRbar are exact-DECIMAL sums with one "
        "final division; the lag ride is a single window over the "
        "calendar-bounded daily grid (Aggregate-by-date child — "
        "value-domain, never entity-scaled), and the 1-row limits "
        "frame broadcasts back. Complements ts_anomaly_mad (robust "
        "outliers) with the sequential-process view.",
)
def ts_xmr_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    )
    mr = daily.withColumn(
        "mrange",
        F.abs(F.col("cents") - F.lag("cents").over(Window.orderBy("d"))),
    ).localCheckpoint(eager=True)  # limits + per-day flags both consume it
    lims = mr.agg(
        (
            F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("center"),
        (
            F.sum(F.col("mrange").cast("decimal(38,0)")).cast("double")
            / F.count("mrange")
        ).alias("mrbar"),
    )
    ucl = F.round(F.col("center") + 2.66 * F.col("mrbar"), 6)
    lcl = F.round(F.col("center") - 2.66 * F.col("mrbar"), 6)
    return mr.crossJoin(F.broadcast(lims)).select(
        F.col("d").cast("timestamp").alias("day"),
        "cents",
        F.round(F.col("center"), 6).alias("center"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        (
            (F.col("cents").cast("double") > ucl)
            | (F.col("cents").cast("double") < lcl)
        ).alias("out_of_control"),
    )


# --------------------------------------------------------------------------
# Whiteness / seasonality diagnostics on the daily-revenue series (round 6)
# --------------------------------------------------------------------------

_LB_LAGS = 14
#: chi-square 0.95 critical value at df=14 (fixed literal in both engines)
_LB_CHI2_CRIT = 23.6848


@register(
    "ts_ljung_box_whiteness",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        FROM orders GROUP BY 1
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s
        FROM daily
    ),
    c AS (
        SELECT d, CAST(tot.n AS DECIMAL(38,0)) * x - tot.s AS c, tot.n AS n
        FROM daily, tot
    ),
    den AS (
        SELECT CAST(SUM(c * c) AS DOUBLE) AS den, MAX(n) AS n FROM c
    ),
    num AS (
        SELECT l.lag AS lag, CAST(SUM(a.c * b.c) AS DOUBLE) AS num
        FROM c a
        CROSS JOIN (SELECT unnest(generate_series(1, {_LB_LAGS})) AS lag) l
        JOIN c b ON b.d = a.d + CAST(l.lag AS INTEGER)
        GROUP BY 1
    ),
    terms AS (
        SELECT lag,
               CAST(round((num / den.den) * (num / den.den)
                          / (den.n - lag) * 1e15) AS BIGINT) AS term_f,
               den.n AS n
        FROM num, den
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_lags,
           CAST(SUM(term_f) AS BIGINT) AS sum_term_femto,
           round(MAX(n) * (MAX(n) + 2)
                 * CAST(SUM(term_f) AS DOUBLE) / 1e15, 6) AS q_stat,
           (MAX(n) * (MAX(n) + 2) * CAST(SUM(term_f) AS DOUBLE) / 1e15)
               <= {_LB_CHI2_CRIT} AS white_noise_05
    FROM terms
    """,
    doc="Ljung-Box portmanteau whiteness test on the daily-revenue series "
        "(lags 1..14): Q = n(n+2) * sum_k rho_k^2/(n-k) against the "
        "chi-square(14) 0.95 critical value — the standard residual "
        "diagnostic after any ts fit (complements ts_acf_daily, which "
        "reports the per-lag values; this is the aggregate test). "
        "Determinism: centered products use c_t = n*x_t - S (exact "
        "integers in DECIMAL(38) sums — the n^2 scaling cancels in "
        "rho = num/den), the per-lag Q terms are quantized to 1e-15 "
        "units before the 14-term sum, and the finish is IEEE-pinned "
        "*,/. Scale: one date-grid collapse, a 14-way bounded lag "
        "self-join on the grid, two scalar aggregates — nothing "
        "downstream of the first shuffle scales with the corpus.",
)
def ts_ljung_box_whiteness(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(F.sum(F.round("o_totalprice").cast("long")).cast("long").alias("x"))
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s"),
    )
    c = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        (F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("s")).alias("c"),
        "n",
    )
    den = c.agg(
        F.sum(F.col("c") * F.col("c")).cast("double").alias("den"),
        F.max("n").alias("n"),
    )
    lags = spark.range(1, _LB_LAGS + 1).select(F.col("id").cast("int").alias("lag"))
    a = c.crossJoin(F.broadcast(lags)).select(
        "lag", F.date_add(F.col("d"), F.col("lag")).alias("md"), F.col("c").alias("ca")
    )
    b = c.select(F.col("d").alias("md"), F.col("c").alias("cb"))
    num = (
        a.join(b, "md")
        .groupBy("lag")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("double").alias("num"))
    )
    rho = F.col("num") / F.col("den")
    terms = num.crossJoin(F.broadcast(den)).select(
        "lag",
        F.round(rho * rho / (F.col("n") - F.col("lag")) * F.lit(1e15))
        .cast("long")
        .alias("term_f"),
        "n",
    )
    q = (
        F.max("n") * (F.max("n") + F.lit(2))
        * F.sum("term_f").cast("double") / F.lit(1e15)
    )
    return terms.agg(
        F.max("n").cast("long").alias("n_days"),
        F.count(F.lit(1)).cast("long").alias("n_lags"),
        F.sum("term_f").cast("long").alias("sum_term_femto"),
        F.round(q, 6).alias("q_stat"),
        (q <= F.lit(_LB_CHI2_CRIT)).alias("white_noise_05"),
    )


@register(
    "ts_seasonal_strength",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        FROM orders GROUP BY 1
    ),
    tr AS (
        SELECT d, x,
               CAST(SUM(x) OVER w7 AS BIGINT) AS s7,
               CAST(COUNT(*) OVER w7 AS BIGINT) AS c7,
               CAST((d - DATE '1970-01-01') % 7 AS BIGINT) AS wd
        FROM daily
        WINDOW w7 AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
        SELECT wd, 7 * x - s7 AS d7 FROM tr WHERE c7 = 7
    ),
    wk AS (
        SELECT wd,
               CAST(SUM(CAST(d7 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sw,
               CAST(COUNT(*) AS BIGINT) AS nw,
               CAST(SUM(CAST(d7 AS DECIMAL(38,0)) * CAST(d7 AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS sww
        FROM det GROUP BY wd
    ),
    tot AS (
        SELECT CAST(SUM(sw) AS DOUBLE) AS s,
               CAST(SUM(sww) AS DOUBLE) AS ss,
               CAST(SUM(nw) AS BIGINT) AS n,
               CAST(SUM(CAST(round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / nw)
                             AS BIGINT)) AS BIGINT) AS ssw_unit
        FROM wk
    )
    SELECT n AS n_days,
           round(greatest(0.0,
                 1 - (ss - ssw_unit) / (ss - s * s / n)), 6)
               AS seasonal_strength_w,
           round((ss - s * s / n) / 49.0 / n, 3) AS var_detrended,
           round((ss - ssw_unit) / 49.0 / n, 3) AS var_remainder
    FROM tot
    """,
    doc="Weekly seasonal-strength statistic (Hyndman/Wang feature-based "
        "ts analysis): detrend daily revenue with a centered 7-day "
        "moving average (full frames only), fit a weekday-means seasonal "
        "component, and report 1 - Var(remainder)/Var(detrended) in "
        "[0, 1] — ~0 means the weekday pattern explains nothing, ~1 "
        "means the series is pure weekly seasonality. Determinism: the "
        "detrended series is kept exact-integer via d7 = 7*x - sum7 (the "
        "/7 cancels in the variance RATIO), within/between sums of "
        "squares come from exact DECIMAL(38) aggregates, the one "
        "rational per-weekday term sw^2/nw is quantized to integer units "
        "before its 7-term sum, and weekday uses the epoch-anchored "
        "modulo (no engine dayofweek conventions). Scale: date-grid "
        "collapse -> one bounded calendar window -> 7-group aggregate.",
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(F.sum(F.round("o_totalprice").cast("long")).cast("long").alias("x"))
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "x",
        F.sum("x").over(w7).cast("long").alias("s7"),
        F.count(F.lit(1)).over(w7).cast("long").alias("c7"),
        (F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01"))) % 7)
        .cast("long")
        .alias("wd"),
    )
    det = tr.where(F.col("c7") == 7).select(
        "wd", (F.lit(7) * F.col("x") - F.col("s7")).alias("d7")
    )
    d7d = F.col("d7").cast("decimal(38,0)")
    wk = det.groupBy("wd").agg(
        F.sum(d7d).cast("decimal(38,0)").alias("sw"),
        F.count(F.lit(1)).cast("long").alias("nw"),
        F.sum(d7d * d7d).cast("decimal(38,0)").alias("sww"),
    )
    swd = F.col("sw").cast("double")
    tot = wk.agg(
        F.sum("sw").cast("double").alias("s"),
        F.sum("sww").cast("double").alias("ss"),
        F.sum("nw").cast("long").alias("n"),
        F.sum(F.round(swd * swd / F.col("nw")).cast("long"))
        .cast("long")
        .alias("ssw_unit"),
    )
    ss_det = F.col("ss") - F.col("s") * F.col("s") / F.col("n")
    ss_res = F.col("ss") - F.col("ssw_unit")
    return tot.select(
        F.col("n").alias("n_days"),
        F.round(
            F.greatest(F.lit(0.0), F.lit(1) - ss_res / ss_det), 6
        ).alias("seasonal_strength_w"),
        F.round(ss_det / F.lit(49.0) / F.col("n"), 3).alias("var_detrended"),
        F.round(ss_res / F.lit(49.0) / F.col("n"), 3).alias("var_remainder"),
    )


_PI_LIT = "3.141592653589793"


@register(
    "ts_spectral_dft_topk",
    oracle=f"""
    WITH daily AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM events GROUP BY 1
    ),
    mn AS (SELECT CAST(MIN(d) AS BIGINT) AS d0 FROM daily),
    idx AS (SELECT d - mn.d0 AS t, v FROM daily, mn),
    periods AS (SELECT CAST(unnest(generate_series(2, 15)) AS BIGINT) AS p),
    terms AS (
        SELECT p.p,
               CAST(round(i.v * cos(2 * {_PI_LIT} * (i.t % p.p) / p.p)
                          * 1000) AS BIGINT) AS c_milli,
               CAST(round(i.v * sin(2 * {_PI_LIT} * (i.t % p.p) / p.p)
                          * 1000) AS BIGINT) AS s_milli
        FROM idx i CROSS JOIN periods p
    ),
    spec AS (
        SELECT p,
               CAST(SUM(c_milli) AS BIGINT) AS cs_milli,
               CAST(SUM(s_milli) AS BIGINT) AS ss_milli
        FROM terms GROUP BY p
    )
    SELECT p AS period_days,
           round((CAST(cs_milli AS DOUBLE) / 1000)
                 * (CAST(cs_milli AS DOUBLE) / 1000)
                 + (CAST(ss_milli AS DOUBLE) / 1000)
                   * (CAST(ss_milli AS DOUBLE) / 1000), 6) AS power
    FROM spec
    ORDER BY power DESC, period_days
    LIMIT 5
    """,
    doc="Top-5 spectral peaks of the daily event-count series: single-"
        "frequency DFT power at each candidate period 2-15 days "
        "(bounded grid), cos/sin terms per (day, period) quantized to "
        "1e-3 units before the integer sum so the two engines' libm "
        "last-ulp differences cannot reach the hash (quantization error "
        "~1e-7 of a unit per term at sf0.1 counts — three orders of "
        "magnitude inside the rounding margin, vs ~1e-4 at the 1e-6 "
        "grain the ln convention uses) — the periodicity detector that "
        "finds weekly/biweekly cycles without assuming them, "
        "complementing ts_acf_daily (ACF needs the lag aligned; DFT "
        "power integrates over phase). Plan: one narrow daily rollup "
        "(bounded by the date domain), a broadcast 14-row period Range "
        "crossed against it, one bounded 14-group aggregate, and a "
        "TakeOrderedAndProject over 14 rows. Reference parity: "
        "extension surface (SURVEY.md §2.B time-series rows).",
)
def ts_spectral_dft_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    mn = daily.agg(F.min("d").cast("long").alias("d0"))
    idx = daily.crossJoin(F.broadcast(mn)).select(
        (F.col("d") - F.col("d0")).alias("t"), "v"
    )
    periods = spark.range(2, 16).select(F.col("id").cast("long").alias("p"))
    angle = (
        F.lit(2) * F.lit(3.141592653589793) * (F.col("t") % F.col("p"))
        / F.col("p")
    )
    terms = idx.crossJoin(F.broadcast(periods)).select(
        "p",
        F.round(F.col("v") * F.cos(angle) * F.lit(1000)).cast("long")
        .alias("c_milli"),
        F.round(F.col("v") * F.sin(angle) * F.lit(1000)).cast("long")
        .alias("s_milli"),
    )
    spec = terms.groupBy("p").agg(
        F.sum("c_milli").cast("long").alias("cs_milli"),
        F.sum("s_milli").cast("long").alias("ss_milli"),
    )
    cs = F.col("cs_milli").cast("double") / F.lit(1000)
    ss = F.col("ss_milli").cast("double") / F.lit(1000)
    return (
        spec.select(
            F.col("p").alias("period_days"),
            F.round(cs * cs + ss * ss, 6).alias("power"),
        )
        .orderBy(F.col("power").desc(), F.col("period_days"))
        .limit(5)
    )


@register(
    "ts_rolling_beta",
    oracle="""
    WITH daily AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
               CAST(SUM(CASE WHEN event_type = 'view'
                    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'click'
                    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS y
        FROM events
        WHERE event_type IN ('view', 'click')
        GROUP BY 1
    ),
    roll AS (
        SELECT d,
               CAST(COUNT(*) OVER w AS BIGINT) AS k,
               CAST(SUM(CAST(x AS DECIMAL(38, 0))) OVER w AS DECIMAL(38, 0))
                   AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38, 0))) OVER w AS DECIMAL(38, 0))
                   AS sy,
               CAST(SUM(CAST(x AS DECIMAL(38, 0))
                        * CAST(y AS DECIMAL(38, 0))) OVER w
                    AS DECIMAL(38, 0)) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(38, 0))
                        * CAST(x AS DECIMAL(38, 0))) OVER w
                    AS DECIMAL(38, 0)) AS sxx
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT d AS day,
           round((CAST(k * sxy - sx * sy AS DOUBLE))
                 / (CAST(k * sxx - sx * sx AS DOUBLE)), 9) AS beta
    FROM roll WHERE k = 7
    """,
    doc="Trailing-7-day rolling beta of daily click value-cents against "
        "daily view value-cents: beta = (k*Sxy - Sx*Sy) / (k*Sxx - "
        "Sx^2) from EXACT integer/decimal window sums (cents quantized "
        "per event, cross-products accumulated in DECIMAL(38,0) so "
        "partition order can never perturb a double sum; the only "
        "doubles are the final two casts and one division — IEEE-"
        "pinned) — the co-movement tracker behind anomaly attribution "
        "(did clicks move because views moved?). Emitted only for full "
        "7-day windows. Plan: one narrow daily rollup bounded by the "
        "date domain, then bounded-frame windows over that AGGREGATE "
        "(guard-compliant: the global ordering runs over the day "
        "grid, never corpus rows). Reference parity: extension "
        "surface (SURVEY.md §2.B time-series rows).",
)
def ts_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        ev.where(F.col("event_type").isin("view", "click"))
        .groupBy(
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .alias("d")
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "view", cents).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "click", cents).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    dec = "decimal(38,0)"
    w = Window.orderBy("d").rowsBetween(-6, 0)
    roll = daily.select(
        "d",
        F.count(F.lit(1)).over(w).cast("long").alias("k"),
        F.sum(F.col("x").cast(dec)).over(w).cast(dec).alias("sx"),
        F.sum(F.col("y").cast(dec)).over(w).cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).over(w)
        .cast(dec)
        .alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).over(w)
        .cast(dec)
        .alias("sxx"),
    )
    num = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return roll.where(F.col("k") == 7).select(
        F.col("d").alias("day"), F.round(num / den, 9).alias("beta")
    )


#: Build-time constants for ts_hurst_rescaled_range: block sizes and
#: round(ln(n) * 1e6) — computed once in Python (math.log) and embedded
#: as identical integer literals in the Spark plan and the DuckDB oracle
#: so no cross-engine ln() of the x-axis is ever evaluated at query time.
_HURST_BLOCKS = [(8, 2079442), (16, 2772589), (32, 3465736)]

_HURST_NS_SQL = "(VALUES " + ", ".join(
    f"({n}, {lq})" for n, lq in _HURST_BLOCKS
) + ") AS ns(bn, ln_n_micro)"


@register(
    "ts_hurst_rescaled_range",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(CAST(SUM(CAST(round(o_totalprice * 100) AS
                    DECIMAL(18,0))) AS BIGINT) // 100 AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT y, row_number() OVER (ORDER BY d) - 1 AS t FROM daily
    ),
    blk AS (
        SELECT ns.bn, ns.ln_n_micro, idx.t // ns.bn AS b, idx.t, idx.y
        FROM idx CROSS JOIN {_HURST_NS_SQL}
    ),
    dev AS (
        SELECT bn, ln_n_micro, b,
               bn * SUM(y) OVER (PARTITION BY bn, b ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - (row_number() OVER (PARTITION BY bn, b ORDER BY t))
                     * SUM(y) OVER (PARTITION BY bn, b) AS z,
               y, COUNT(*) OVER (PARTITION BY bn, b) AS blen
        FROM blk
    ),
    rs AS (
        SELECT bn, ln_n_micro,
               CAST(round(CAST(MAX(z) - MIN(z) AS DOUBLE)
                    / sqrt(CAST(bn * SUM(y * y) - SUM(y) * SUM(y)
                                AS DOUBLE)) * 1000000) AS BIGINT) AS rs_micro
        FROM dev WHERE blen = bn
        GROUP BY bn, ln_n_micro, b
        HAVING bn * SUM(y * y) - SUM(y) * SUM(y) > 0
    ),
    pt AS (
        SELECT bn, CAST(MAX(ln_n_micro) AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS n_blocks,
               CAST(round(ln(CAST(SUM(rs_micro) AS DOUBLE)
                             / (COUNT(*) * 1000000)) * 1000000) AS BIGINT)
                   AS yq
        FROM rs GROUP BY bn
    ),
    fit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * yq) AS BIGINT) AS sxy
        FROM pt
    )
    SELECT (SELECT round(CAST(SUM(rs_micro) AS DOUBLE) / COUNT(*) / 1000000, 6)
            FROM rs WHERE bn = 8) AS avg_rs_8,
           (SELECT round(CAST(SUM(rs_micro) AS DOUBLE) / COUNT(*) / 1000000, 6)
            FROM rs WHERE bn = 16) AS avg_rs_16,
           (SELECT round(CAST(SUM(rs_micro) AS DOUBLE) / COUNT(*) / 1000000, 6)
            FROM rs WHERE bn = 32) AS avg_rs_32,
           round(CAST(k * sxy - sx * sy AS DOUBLE)
                 / CAST(k * sxx - sx * sx AS DOUBLE), 6) AS hurst
    FROM fit
    """,
    doc="Hurst exponent of daily revenue by rescaled-range (R/S) "
        "analysis — the long-memory diagnostic (H~0.5 = random walk, "
        ">0.5 trending, <0.5 mean-reverting) behind volatility "
        "persistence checks and seasonality-vs-drift triage. Exactness: "
        "the series is integer daily dollars (floored cents//100); "
        "within each block the cumulative deviation is computed in "
        "CLEARED-DENOMINATOR form z_j = n*cumsum_j - j*total (exact "
        "BIGINT — no fractional mean ever materializes), R/S = "
        "(max z - min z)/sqrt(n*sum(y^2) - sum(y)^2) is one pinned "
        "division+sqrt per block quantized to 1e-6 units, per-size "
        "means are exact integer sums, and the 3-point log-log OLS "
        "slope uses build-time ln(n) literals with one final pinned "
        "division. Sums stay under 2^63 to ~1e8-dollar days; larger "
        "corpora rescale the unit. Plan: one day-grain rollup (value-"
        "domain), a 3x fanout over block sizes, and windows partitioned "
        "by (size, block) — every partition is <= 32 rows by "
        "construction; the only global window is the day row_number "
        "over the bounded aggregated day table. Reference parity: "
        "extension surface (SURVEY.md §2.B time-series rows).",
)
def ts_hurst_rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.expr(
            "cast(cast(sum(cast(round(o_totalprice * 100) as decimal(18,0)))"
            " as bigint) div 100 as bigint)"
        ).alias("y")
    )
    idx = daily.select(
        "y", (F.row_number().over(Window.orderBy("d")) - 1).alias("t")
    )
    ns = spark.createDataFrame(
        [(n, lq) for n, lq in _HURST_BLOCKS], "bn long, ln_n_micro long"
    )
    blk = idx.crossJoin(F.broadcast(ns)).select(
        "bn", "ln_n_micro", F.expr("t div bn").alias("b"), "t", "y"
    )
    wrun = (
        Window.partitionBy("bn", "b")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("bn", "b")
    dev = blk.select(
        "bn",
        "ln_n_micro",
        "b",
        (
            F.col("bn") * F.sum("y").over(wrun)
            - F.row_number().over(Window.partitionBy("bn", "b").orderBy("t"))
            * F.sum("y").over(wall)
        ).alias("z"),
        "y",
        F.count(F.lit(1)).over(wall).alias("blen"),
    )
    rs = (
        dev.where(F.col("blen") == F.col("bn"))
        .groupBy("bn", "ln_n_micro", "b")
        .agg(
            (F.max("z") - F.min("z")).alias("r2"),
            (
                F.first("bn") * F.sum(F.col("y") * F.col("y"))
                - F.sum("y") * F.sum("y")
            ).alias("s2"),
        )
        .where(F.col("s2") > 0)
        .select(
            "bn",
            "ln_n_micro",
            F.round(
                F.col("r2").cast("double") / F.sqrt(F.col("s2").cast("double"))
                * 1000000
            )
            .cast("long")
            .alias("rs_micro"),
        )
        .localCheckpoint(eager=True)  # per-size means + the log-log fit
    )
    pt = rs.groupBy("bn").agg(
        F.max("ln_n_micro").alias("x"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.round(
            F.log(
                F.sum("rs_micro").cast("double")
                / (F.count(F.lit(1)) * 1000000)
            )
            * 1000000
        )
        .cast("long")
        .alias("yq"),
        F.round(
            F.sum("rs_micro").cast("double") / F.count(F.lit(1)) / 1000000, 6
        ).alias("avg_rs"),
    )
    fit = pt.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("yq")).cast("long").alias("sxy"),
    ).select(
        F.round(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            ),
            6,
        ).alias("hurst")
    )
    wide = pt.groupBy().pivot("bn", [8, 16, 32]).agg(F.max("avg_rs"))
    return wide.crossJoin(F.broadcast(fit)).select(
        F.col("8").alias("avg_rs_8"),
        F.col("16").alias("avg_rs_16"),
        F.col("32").alias("avg_rs_32"),
        "hurst",
    )


#: Dyadic EWM weights 2^15 .. 2^0 (alpha = 1/2 over a 16-observation
#: trailing window): integer geometric weights make the exponentially
#: weighted sums EXACT integer arithmetic in both engines — no pow(), no
#: float accumulation order — while keeping the defining EWM property
#: (each older observation counts half as much).
_EWM_W = [2 ** (15 - j) for j in range(16)]
_EWM_WSUM = sum(_EWM_W)  # 65535


def _ewm_sql() -> str:
    lags = ",\n               ".join(
        f"lag(y, {j}) OVER (ORDER BY day) AS y{j}" for j in range(16)
    )
    m1 = " + ".join(f"{w} * CAST(y{j} AS DECIMAL(38,0))" for j, w in enumerate(_EWM_W))
    m2 = " + ".join(
        f"{w} * CAST(y{j} AS DECIMAL(38,0)) * y{j}" for j, w in enumerate(_EWM_W)
    )
    return f"""
    WITH d AS (
        SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS DECIMAL(18,0)))
                    AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    lagd AS (
        SELECT day,
               {lags}
        FROM d
    ),
    m AS (
        SELECT day,
               CAST({m1} AS DECIMAL(38,0)) AS m1,
               CAST({m2} AS DECIMAL(38,0)) AS m2
        FROM lagd WHERE y15 IS NOT NULL
    )
    SELECT day,
           CAST(CAST(m1 AS HUGEINT) // {_EWM_WSUM} AS BIGINT)
               AS ewm_mean_cents,
           CAST(CAST({_EWM_WSUM} * m2 - m1 * m1 AS HUGEINT)
                // {_EWM_WSUM * _EWM_WSUM} AS BIGINT) AS ewm_var_cents2
    FROM m
    """


@register(
    "ts_ewm_mean_variance",
    oracle=_ewm_sql(),
    doc="Exponentially weighted mean AND variance of daily revenue over a "
        "16-observation trailing window with alpha = 1/2 — the adaptive "
        "baseline + volatility pair behind anomaly bands that must react "
        "to regime changes faster than a flat rolling window (RiskMetrics "
        "EWMA volatility). Determinism: the weights are the dyadic "
        "integers 2^15..2^0, so both weighted moments are EXACT "
        "DECIMAL(38,0) integer sums over revenue cents (no pow(), no "
        "float accumulation); both the mean and the variance are kept "
        "FULLY integral to the end — (W*M2 - M1^2) DIV W^2 in cents^2, floor "
        "division of exact decimals, because casting a ~1e20 decimal to "
        "double is not identically rounded across engines. Plan: one date "
        "rollup, then 16 lag columns over ONE ordered window on the "
        "bounded day grid (Aggregate child — the value-domain window "
        "rule); at 100 TB the corpus-scaled work is only the rollup "
        "shuffle. Reference parity: extension surface (SURVEY.md §2.B "
        "time-series rows).",
)
def ts_ewm_mean_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.col("o_orderdate").cast("date").cast("timestamp").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("y")
    )
    w = Window.orderBy("day")
    lagd = d.select(
        "day", *[F.lag("y", j).over(w).alias(f"y{j}") for j in range(16)]
    ).where(F.col("y15").isNotNull())
    dec = "decimal(38,0)"
    m1 = sum(
        (F.lit(wt) * F.col(f"y{j}").cast(dec) for j, wt in enumerate(_EWM_W)),
        F.lit(0).cast(dec),
    ).cast(dec)
    m2 = sum(
        (
            F.lit(wt) * F.col(f"y{j}").cast(dec) * F.col(f"y{j}")
            for j, wt in enumerate(_EWM_W)
        ),
        F.lit(0).cast(dec),
    ).cast(dec)
    numer = (F.lit(_EWM_WSUM).cast(dec) * m2 - m1 * m1).alias("numer")
    return lagd.select("day", m1.alias("m1"), numer).selectExpr(
        "day",
        f"CAST(m1 DIV {_EWM_WSUM} AS BIGINT) AS ewm_mean_cents",
        f"CAST(numer DIV {_EWM_WSUM * _EWM_WSUM} AS BIGINT) AS ewm_var_cents2",
    )


@register(
    "ts_wow_poisson_z",
    oracle="""
    WITH w AS (
        SELECT date_trunc('week', CAST(o_orderdate AS DATE)) AS wk,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    ),
    lagd AS (
        SELECT CAST(wk AS TIMESTAMP) AS week, n,
               lag(n) OVER (ORDER BY wk) AS prev_n
        FROM w
    )
    SELECT week, n AS n_orders, prev_n AS prev_orders,
           round(CAST(n - prev_n AS DOUBLE) / sqrt(CAST(n + prev_n AS DOUBLE)),
                 6) AS z,
           abs(CAST(n - prev_n AS DOUBLE) / sqrt(CAST(n + prev_n AS DOUBLE)))
               > 2.0 AS significant
    FROM lagd WHERE prev_n IS NOT NULL
    """,
    doc="Week-over-week change significance under a Poisson count model: "
        "for independent Poisson counts the difference's null variance is "
        "the sum, so z = (c2 - c1)/sqrt(c1 + c2) is the standard two-rate "
        "test statistic (the quick answer to 'is this week's drop real or "
        "noise?' that raw percent deltas can't give, because the same -10% "
        "means nothing at 100 events and everything at 1M). Exact longs "
        "from one rollup; sqrt and division are IEEE-pinned; lag runs on "
        "the bounded week grid (Aggregate child). Reference parity: "
        "extension surface (SURVEY.md §2.B time-series rows).",
)
def ts_wow_poisson_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = o.groupBy(
        F.date_trunc("week", F.col("o_orderdate").cast("date")).alias("wk")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    lagd = w.select(
        F.col("wk").cast("timestamp").alias("week"),
        "n",
        F.lag("n").over(Window.orderBy("wk")).alias("prev_n"),
    ).where(F.col("prev_n").isNotNull())
    z = (F.col("n") - F.col("prev_n")).cast("double") / F.sqrt(
        (F.col("n") + F.col("prev_n")).cast("double")
    )
    return lagd.select(
        "week",
        F.col("n").alias("n_orders"),
        F.col("prev_n").alias("prev_orders"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 2.0).alias("significant"),
    )


@register(
    "ts_peak_detection_prominence",
    oracle="""
    WITH d AS (
        SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS DECIMAL(18,0)))
                    AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    w AS (
        SELECT day, y,
               lag(y) OVER (ORDER BY day) AS yp,
               lead(y) OVER (ORDER BY day) AS yn,
               CAST(SUM(y) OVER (ORDER BY day
                                 ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING)
                    - y AS BIGINT) AS wsum,
               CAST(COUNT(*) OVER (ORDER BY day
                                   ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING)
                    - 1 AS BIGINT) AS wcnt
        FROM d
    )
    SELECT day, y AS y_cents, wsum AS window_sum_cents,
           wcnt AS window_cnt,
           round(CAST(y AS DOUBLE) * wcnt / wsum, 6) AS prominence_ratio
    FROM w
    WHERE yp IS NOT NULL AND yn IS NOT NULL
      AND y > yp AND y > yn
      AND 10 * y * wcnt >= 12 * wsum
    """,
    doc="Spike detection on the daily-revenue series: a peak is a strict "
        "local maximum whose value clears 1.2x the mean of its 15-day "
        "centered neighborhood (self excluded) — the alert primitive "
        "that rolls up cleanly at any scale because both conditions are "
        "pure integer arithmetic: the neighborhood test cross-multiplies "
        "(10*y*cnt >= 12*sum) instead of dividing, so no float threshold "
        "ever differs between engines; the reported prominence_ratio is "
        "one pinned division. All windows ride ONE ordered pass over the "
        "bounded day-grid aggregate. Complements ts_anomaly_mad (robust "
        "global outliers) and ts_changepoint_cusum (level shifts) with "
        "the local-shape notion of 'spike'. Reference parity: extension "
        "surface (SURVEY.md §2.B time-series rows).",
)
def ts_peak_detection_prominence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.col("o_orderdate").cast("date").cast("timestamp").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("y")
    )
    wo = Window.orderBy("day")
    wf = wo.rowsBetween(-7, 7)
    w = d.select(
        "day",
        "y",
        F.lag("y").over(wo).alias("yp"),
        F.lead("y").over(wo).alias("yn"),
        (F.sum("y").over(wf) - F.col("y")).cast("long").alias("wsum"),
        (F.count(F.lit(1)).over(wf) - 1).cast("long").alias("wcnt"),
    )
    return (
        w.where(
            F.col("yp").isNotNull()
            & F.col("yn").isNotNull()
            & (F.col("y") > F.col("yp"))
            & (F.col("y") > F.col("yn"))
            & (10 * F.col("y") * F.col("wcnt") >= 12 * F.col("wsum"))
        )
        .select(
            "day",
            F.col("y").alias("y_cents"),
            F.col("wsum").alias("window_sum_cents"),
            F.col("wcnt").alias("window_cnt"),
            F.round(
                F.col("y").cast("double") * F.col("wcnt") / F.col("wsum"), 6
            ).alias("prominence_ratio"),
        )
    )


_LTTB_B = 24  # interior buckets


@register(
    "ts_downsample_lttb",
    oracle=f"""
    WITH d AS (
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS x,
               CAST(SUM(CAST(round(o_totalprice * 100) AS DECIMAL(18,0)))
                    AS BIGINT) AS y
        FROM orders GROUP BY o_orderdate
    ),
    ends AS (
        SELECT MIN(x) AS x_lo, arg_min(y, x) AS y_lo,
               MAX(x) AS x_hi, arg_max(y, x) AS y_hi
        FROM d
    ),
    interior AS (
        SELECT d.x, d.y,
               row_number() OVER (ORDER BY d.x) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM d, ends WHERE d.x > ends.x_lo AND d.x < ends.x_hi
    ),
    pts AS (
        SELECT x, y, CAST((rn - 1) * {_LTTB_B} // n AS BIGINT) AS b
        FROM interior
    ),
    bsum AS (
        SELECT b, CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS DECIMAL(38,0))
                   AS sy, CAST(COUNT(*) AS BIGINT) AS c
        FROM pts GROUP BY b
    ),
    anch AS (
        SELECT b,
               COALESCE(lag(sx) OVER (ORDER BY b), (SELECT x_lo FROM ends))
                   AS sxp,
               COALESCE(lag(sy) OVER (ORDER BY b),
                        (SELECT CAST(y_lo AS DECIMAL(38,0)) FROM ends)) AS syp,
               COALESCE(lag(c) OVER (ORDER BY b), 1) AS cp,
               COALESCE(lead(sx) OVER (ORDER BY b), (SELECT x_hi FROM ends))
                   AS sxn,
               COALESCE(lead(sy) OVER (ORDER BY b),
                        (SELECT CAST(y_hi AS DECIMAL(38,0)) FROM ends)) AS syn,
               COALESCE(lead(c) OVER (ORDER BY b), 1) AS cn
        FROM bsum
    ),
    scored AS (
        SELECT p.b, p.x, p.y,
               abs(CAST((a.sxp * a.cn - a.sxn * a.cp) AS DECIMAL(38,0))
                     * (p.y * a.cp - a.syp)
                   - CAST((a.sxp - p.x * a.cp) AS DECIMAL(38,0))
                     * (a.syn * a.cp - a.syp * a.cn)) AS area2
        FROM pts p JOIN anch a USING (b)
    ),
    picked AS (
        SELECT b, x, y FROM (
            SELECT *, row_number() OVER (PARTITION BY b
                                         ORDER BY area2 DESC, x) AS rnk
            FROM scored
        ) WHERE rnk = 1
    )
    SELECT CAST(-1 AS BIGINT) AS bucket, x_lo AS x_day, y_lo AS y_cents
        FROM ends
    UNION ALL
    SELECT b, x, y FROM picked
    UNION ALL
    SELECT CAST({_LTTB_B} AS BIGINT), x_hi, y_hi FROM ends
    """,
    doc="Largest-Triangle-Three-Buckets downsampling of the daily series "
        "to ~26 visually-representative points (Steinarsson 2013, the "
        "standard dashboard decimation): split the interior into 24 "
        "positional buckets and keep, per bucket, the point forming the "
        "largest triangle with the NEIGHBOR BUCKETS' mean points, plus "
        "both endpoints. Uses the independent-anchor LTTB variant (both "
        "anchors are bucket means rather than the previously-selected "
        "point) so every bucket scores in parallel — no sequential "
        "dependence, which is what makes it a two-shuffle distributed "
        "plan instead of a driver loop. Exactness: the triangle area is "
        "cross-multiplied through the anchor counts into one pure-"
        "integer DECIMAL(38,0) expression (no mean is ever materialized "
        "as a float), and the per-bucket argmax tie-breaks on x, so both "
        "engines pick identical points. All windows ride the bounded "
        "day-grid aggregate / 24-row bucket table. Reference parity: "
        "extension surface (SURVEY.md §2.B time-series rows).",
)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy("o_orderdate").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("y"),
    ).select(
        F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1970-01-01")))
        .cast("long")
        .alias("x"),
        "y",
    ).localCheckpoint(eager=True)  # ends scalars + interior both consume it
    ends = d.agg(
        F.min("x").alias("x_lo"),
        F.expr("min_by(y, x)").alias("y_lo"),
        F.max("x").alias("x_hi"),
        F.expr("max_by(y, x)").alias("y_hi"),
    )
    interior = (
        d.crossJoin(F.broadcast(ends))
        .where((F.col("x") > F.col("x_lo")) & (F.col("x") < F.col("x_hi")))
        .select(
            "x",
            "y",
            F.row_number().over(Window.orderBy("x")).alias("rn"),
            F.count(F.lit(1))
            .over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .cast("long")
            .alias("n"),
        )
    )
    pts = interior.selectExpr(
        "x", "y", f"CAST((rn - 1) * {_LTTB_B} div n AS BIGINT) AS b"
    ).localCheckpoint(eager=True)  # bucket sums AND the scoring join
    dec = "decimal(38,0)"
    bsum = pts.groupBy("b").agg(
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast(dec).alias("sy"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    wb = Window.orderBy("b")
    anch = bsum.crossJoin(F.broadcast(ends)).select(
        "b",
        F.coalesce(F.lag("sx").over(wb), F.col("x_lo")).alias("sxp"),
        F.coalesce(F.lag("sy").over(wb), F.col("y_lo").cast(dec)).alias("syp"),
        F.coalesce(F.lag("c").over(wb), F.lit(1)).alias("cp"),
        F.coalesce(F.lead("sx").over(wb), F.col("x_hi")).alias("sxn"),
        F.coalesce(F.lead("sy").over(wb), F.col("y_hi").cast(dec)).alias("syn"),
        F.coalesce(F.lead("c").over(wb), F.lit(1)).alias("cn"),
    )
    scored = pts.join(F.broadcast(anch), "b").select(
        "b",
        "x",
        "y",
        F.abs(
            (F.col("sxp") * F.col("cn") - F.col("sxn") * F.col("cp")).cast(dec)
            * (F.col("y") * F.col("cp") - F.col("syp"))
            - (F.col("sxp") - F.col("x") * F.col("cp")).cast(dec)
            * (F.col("syn") * F.col("cp") - F.col("syp") * F.col("cn"))
        ).alias("area2"),
    )
    wpick = Window.partitionBy("b").orderBy(F.col("area2").desc(), F.col("x"))
    picked = (
        scored.withColumn("rnk", F.row_number().over(wpick))
        .where(F.col("rnk") == 1)
        .select(
            F.col("b").alias("bucket"),
            F.col("x").alias("x_day"),
            F.col("y").alias("y_cents"),
        )
    )
    lo = ends.select(
        F.lit(-1).cast("long").alias("bucket"),
        F.col("x_lo").alias("x_day"),
        F.col("y_lo").alias("y_cents"),
    )
    hi = ends.select(
        F.lit(_LTTB_B).cast("long").alias("bucket"),
        F.col("x_hi").alias("x_day"),
        F.col("y_hi").alias("y_cents"),
    )
    return lo.unionByName(picked).unionByName(hi)


@register(
    "ts_changepoint_argmax_split",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS HUGEINT) AS rev
        FROM orders GROUP BY 1
    ),
    cum AS (
        SELECT d,
               row_number() OVER (ORDER BY d) AS k,
               CAST(SUM(rev) OVER (ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS cum_rev,
               CAST(SUM(rev) OVER () AS DOUBLE) AS tot_rev,
               COUNT(*) OVER () AS n
        FROM daily
    ),
    scored AS (
        SELECT d, k, n,
               (CAST(k AS DOUBLE) * (n - k) / n)
               * (cum_rev / k - (tot_rev - cum_rev) / (n - k))
               * (cum_rev / k - (tot_rev - cum_rev) / (n - k)) AS score,
               cum_rev / k AS mean_before,
               (tot_rev - cum_rev) / (n - k) AS mean_after
        FROM cum WHERE k < n
    )
    SELECT CAST(rnk AS BIGINT) AS rank,
           CAST(d AS TIMESTAMP) AS split_date,
           CAST(k AS BIGINT) AS n_days_before,
           CAST(n - k AS BIGINT) AS n_days_after,
           CAST(floor(mean_before) AS BIGINT) AS mean_before_cents,
           CAST(floor(mean_after) AS BIGINT) AS mean_after_cents,
           CAST(floor(score / 1000000.0) AS BIGINT) AS score_floor_m
    FROM (
        SELECT *, row_number() OVER (ORDER BY score DESC, d) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
    doc="Single-changepoint detection by exhaustive argmax of the "
        "between-segment variance reduction (the first step of binary "
        "segmentation / CUSUM's offline twin, complementing "
        "ts_changepoint_cusum's sequential detector): over the daily "
        "revenue series, score every split k by n_A*n_B/n * "
        "(mean_A - mean_B)^2 and return the top-3 candidate dates. All "
        "prefix sums live on the BOUNDED day grid (one narrow date "
        "aggregate feeds every window — the two global windows sit on "
        "value-domain children, never raw rows); sums are exact "
        "DECIMAL/HUGEINT cast to double once, and every scoring op is "
        "IEEE-pinned (+,-,*,/), so both engines agree bit-for-bit below "
        "2^53 total cents. Outputs are floored integers; ties break on "
        "the earlier date. Reference parity: extension surface "
        "(SURVEY.md §2.C time-series rows).",
)
def ts_changepoint_argmax_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(cents.cast("decimal(38,0)")).alias("rev")
    )
    w_ord = Window.orderBy("d")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = daily.select(
        "d",
        F.row_number().over(w_ord).alias("k"),
        F.sum("rev").over(w_cum).cast("double").alias("cum_rev"),
        F.sum("rev").over(w_all).cast("double").alias("tot_rev"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    mean_before = F.col("cum_rev") / F.col("k")
    mean_after = (F.col("tot_rev") - F.col("cum_rev")) / (F.col("n") - F.col("k"))
    diff = mean_before - mean_after
    score = (
        F.col("k").cast("double") * (F.col("n") - F.col("k")) / F.col("n")
    ) * diff * diff
    scored = cum.where(F.col("k") < F.col("n")).select(
        "d",
        "k",
        "n",
        score.alias("score"),
        mean_before.alias("mean_before"),
        mean_after.alias("mean_after"),
    )
    ranked = scored.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.col("score").desc(), "d"))
    ).where(F.col("rnk") <= 3)
    return ranked.select(
        F.col("rnk").cast("long").alias("rank"),
        F.col("d").cast("timestamp").alias("split_date"),
        F.col("k").cast("long").alias("n_days_before"),
        (F.col("n") - F.col("k")).cast("long").alias("n_days_after"),
        F.floor("mean_before").cast("long").alias("mean_before_cents"),
        F.floor("mean_after").cast("long").alias("mean_after_cents"),
        F.floor(F.col("score") / F.lit(1_000_000.0))
        .cast("long")
        .alias("score_floor_m"),
    )


@register(
    "ts_ohlc_weekly",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    )
    SELECT CAST(date_trunc('week', d) AS TIMESTAMP) AS week,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(arg_min(rev, d) AS BIGINT) AS open_cents,
           CAST(MAX(rev) AS BIGINT) AS high_cents,
           CAST(MIN(rev) AS BIGINT) AS low_cents,
           CAST(arg_max(rev, d) AS BIGINT) AS close_cents,
           CAST(SUM(rev) AS BIGINT) AS volume_cents
    FROM daily GROUP BY 1
    """,
    doc="Weekly OHLC resample of the daily revenue series: open (first "
        "trading day's value), high, low, close (last day's value), and "
        "volume per ISO week — the standard financial downsample that "
        "keeps the intra-period extremes a plain weekly SUM/AVG throws "
        "away (the pre-aggregation you chart candles from, and the "
        "companion to ts_downsample_lttb's shape-preserving variant). "
        "Open/close are min_by/max_by over the unique day key "
        "(deterministic — no ties possible), weeks come from "
        "date_trunc('week') which both engines anchor on Monday. Two "
        "narrow date-keyed aggregates, bounded output at any scale; "
        "exact integer cents throughout. Reference parity: extension "
        "surface (SURVEY.md §2.C time-series rows).",
)
def ts_ohlc_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(cents).cast("long").alias("rev")
    )
    return daily.groupBy(
        F.date_trunc("week", F.col("d")).alias("week")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.min_by("rev", "d").cast("long").alias("open_cents"),
        F.max("rev").cast("long").alias("high_cents"),
        F.min("rev").cast("long").alias("low_cents"),
        F.max_by("rev", "d").cast("long").alias("close_cents"),
        F.sum("rev").cast("long").alias("volume_cents"),
    )


@register(
    "ts_runs_test_wald_wolfowitz",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    seq AS (
        SELECT d, cents - lag(cents) OVER (ORDER BY d) AS diff FROM daily
    ),
    s AS (
        SELECT d, CASE WHEN diff > 0 THEN 1 ELSE 0 END AS sg
        FROM seq WHERE diff IS NOT NULL AND diff <> 0
    ),
    r AS (SELECT sg, lag(sg) OVER (ORDER BY d) AS prev FROM s),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(count_if(sg = 1) AS BIGINT) AS n_plus,
               CAST(count_if(sg = 0) AS BIGINT) AS n_minus,
               CAST(1 + count_if(prev IS NOT NULL AND sg <> prev) AS BIGINT)
                   AS n_runs
        FROM r
    )
    SELECT n, n_plus, n_minus, n_runs,
           CAST(1000000 + CAST(2000000 AS HUGEINT) * n_plus * n_minus // n
                AS BIGINT) AS expected_runs_micro,
           CAST(CAST(2 AS HUGEINT) * n_plus * n_minus
                * (2 * CAST(n_plus AS HUGEINT) * n_minus - n) * 1000000
                // (CAST(n AS HUGEINT) * n * (n - 1))
                AS BIGINT) AS var_runs_micro
    FROM agg
    """,
    doc="Wald-Wolfowitz runs test for randomness of the daily-revenue "
        "direction sequence: sign of day-over-day change (zero diffs "
        "dropped, the standard convention), observed run count vs the "
        "exact null mean 1 + 2*n1*n2/n and variance "
        "2*n1*n2*(2*n1*n2 - n) / (n^2*(n-1)) — too few runs = trend/"
        "autocorrelation, too many = oscillation; the nonparametric "
        "cousin of ts_ljung_box_whiteness that needs no lag grid. All "
        "outputs are exact integers (micro-quantized via DECIMAL->DIV, "
        "matching DuckDB HUGEINT//); the two global windows run over the "
        "date-aggregated daily table (bounded by the day span, the "
        "repo's value-domain window rule). Reference parity: extension "
        "surface (SURVEY.md §2.C time-series rows).",
)
def ts_runs_test_wald_wolfowitz(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    )
    seq = daily.select(
        "d", (F.col("cents") - F.lag("cents").over(Window.orderBy("d"))).alias("diff")
    )
    s = seq.where(F.col("diff").isNotNull() & (F.col("diff") != 0)).select(
        "d", F.when(F.col("diff") > 0, 1).otherwise(0).alias("sg")
    )
    r = s.select("sg", F.lag("sg").over(Window.orderBy("d")).alias("prev"))
    agg = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(F.col("sg") == 1).cast("long").alias("n_plus"),
        F.count_if(F.col("sg") == 0).cast("long").alias("n_minus"),
        (
            F.lit(1)
            + F.count_if(F.col("prev").isNotNull() & (F.col("sg") != F.col("prev")))
        )
        .cast("long")
        .alias("n_runs"),
    )
    return agg.select(
        "n",
        "n_plus",
        "n_minus",
        "n_runs",
        F.expr(
            "CAST(1000000 + CAST(2000000 AS DECIMAL(38,0)) * n_plus * n_minus "
            "DIV n AS BIGINT)"
        ).alias("expected_runs_micro"),
        F.expr(
            "CAST(CAST(2 AS DECIMAL(38,0)) * n_plus * n_minus "
            "* (2 * CAST(n_plus AS DECIMAL(38,0)) * n_minus - n) * 1000000 "
            "DIV (CAST(n AS DECIMAL(38,0)) * n * (n - 1)) AS BIGINT)"
        ).alias("var_runs_micro"),
    )


@register(
    "ts_sax_motifs",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    chunk AS (
        SELECT datediff('day', DATE '1995-01-01', d) // 7 AS ck,
               CAST(SUM(cents) * 1000 // COUNT(*) AS BIGINT) AS paa_milli
        FROM daily GROUP BY 1
    ),
    sym AS (
        SELECT ck,
               ntile(4) OVER (ORDER BY paa_milli, ck) AS q
        FROM chunk
    ),
    word AS (
        SELECT ck,
               CAST(q AS VARCHAR)
               || CAST(lead(q, 1) OVER (ORDER BY ck) AS VARCHAR)
               || CAST(lead(q, 2) OVER (ORDER BY ck) AS VARCHAR) AS motif
        FROM sym
        QUALIFY lead(q, 2) OVER (ORDER BY ck) IS NOT NULL
    )
    SELECT motif,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(ck) AS BIGINT) AS first_chunk,
           CAST(MAX(ck) AS BIGINT) AS last_chunk
    FROM word GROUP BY motif
    """,
    doc="SAX motif mining on the daily-revenue series: PAA-compress to "
        "7-day chunk means (integer milli-cents DIV — exact), quantize "
        "to a 4-symbol alphabet by positional quartile (ntile over the "
        "bounded chunk table, deterministic (value, chunk) total order "
        "so both engines cut identically), slide a 3-symbol window into "
        "SAX words, and count each motif's occurrences with its "
        "first/last position — the classic symbolic motif/novelty "
        "discovery primitive (Lin et al. 2003): recurring words are "
        "regimes, hapax words are anomalies (the symbolic complement of "
        "ts_changepoint_cusum). Every window runs over the "
        "chunk-aggregated table (bounded by the day span / 7), never "
        "raw rows; output is bounded by the 4^3 word domain. Reference "
        "parity: extension surface (SURVEY.md §2.C time-series rows).",
)
def ts_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    )
    chunk = daily.groupBy(
        (
            F.datediff(F.col("d"), F.lit("1995-01-01").cast("date"))
            / F.lit(7)
        )
        .cast("long")
        .alias("ck")
    ).agg(
        F.expr("CAST(SUM(cents) * 1000 DIV COUNT(*) AS BIGINT)").alias(
            "paa_milli"
        )
    )
    sym = chunk.select(
        "ck",
        F.ntile(4).over(Window.orderBy("paa_milli", "ck")).alias("q"),
    )
    wck = Window.orderBy("ck")
    word = (
        sym.select(
            "ck",
            F.concat(
                F.col("q").cast("string"),
                F.lead("q", 1).over(wck).cast("string"),
                F.lead("q", 2).over(wck).cast("string"),
            ).alias("motif"),
            F.lead("q", 2).over(wck).alias("q2"),
        )
        .where(F.col("q2").isNotNull())
        .drop("q2")
    )
    return word.groupBy("motif").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.min("ck").cast("long").alias("first_chunk"),
        F.max("ck").cast("long").alias("last_chunk"),
    )


@register(
    "ts_granger_causality_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS rev_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    ),
    lagged AS (
        SELECT a.rev_cents AS rev, a.n_orders AS nord,
               b.rev_cents AS prev_rev, b.n_orders AS prev_nord
        FROM daily a JOIN daily b ON b.d = a.d - 1
    ),
    obs AS (
        SELECT 'orders_cause_revenue' AS direction,
               rev AS y, prev_rev AS y1, prev_nord AS x1 FROM lagged
        UNION ALL
        SELECT 'revenue_cause_orders' AS direction,
               nord AS y, prev_nord AS y1, prev_rev AS x1 FROM lagged
    ),
    s AS (
        SELECT direction,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(y1 AS DECIMAL(38,0))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS s2,
               CAST(SUM(CAST(y1 AS DECIMAL(38,0)) * CAST(y1 AS DECIMAL(38,0)))
                    AS DOUBLE) AS s11,
               CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * CAST(x1 AS DECIMAL(38,0)))
                    AS DOUBLE) AS s22,
               CAST(SUM(CAST(y1 AS DECIMAL(38,0)) * CAST(x1 AS DECIMAL(38,0)))
                    AS DOUBLE) AS s12,
               CAST(SUM(CAST(y1 AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                    AS DOUBLE) AS s1y,
               CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                    AS DOUBLE) AS s2y,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                    AS DOUBLE) AS syy
        FROM obs GROUP BY direction
    ),
    m AS (
        SELECT direction, n,
               n*s11 - s1*s1 AS c11, n*s22 - s2*s2 AS c22,
               n*s12 - s1*s2 AS c12, n*s1y - s1*sy AS c1y,
               n*s2y - s2*sy AS c2y, n*syy - sy*sy AS cyy
        FROM s
    ),
    b AS (
        SELECT direction, n, c11, c1y, cyy,
               (c22*c1y - c12*c2y) / (c11*c22 - c12*c12) AS b1,
               (c11*c2y - c12*c1y) / (c11*c22 - c12*c12) AS b2,
               c2y
        FROM m
    ),
    rss AS (
        SELECT direction, n, b1, b2,
               cyy - c1y*c1y/c11 AS rss_r,
               cyy - b1*c1y - b2*c2y AS rss_u
        FROM b
    )
    SELECT direction, n AS n_days,
           round(b1, 6) AS beta_lag_self,
           round(b2, 6) AS beta_lag_cross,
           round((rss_r - rss_u) * (n - 3) / rss_u, 4) AS f_stat,
           (rss_r - rss_u) * (n - 3) / rss_u > 3.84 AS granger_05
    FROM rss
    """,
    doc="Granger causality test (lag 1, both directions) between daily "
        "revenue and daily order count: does yesterday's order count "
        "improve today's revenue prediction beyond yesterday's revenue "
        "(and vice versa)? Restricted AR(1) vs unrestricted 2-regressor "
        "OLS, both solved in closed form from ONE exact-DECIMAL moment "
        "pass over the bounded daily grid (the ml_linear_regression_multi "
        "Cramer pattern): F = (RSS_r - RSS_u)*(n-3)/RSS_u with the "
        "centering scale cancelling exactly, so both engines run "
        "identical IEEE double arithmetic on identical exact sums. The "
        "lag alignment is a shifted-date equi-join on the daily table "
        "(the ts_cross_correlation device — no window, no per-lag scan); "
        "the corpus-sized work is one aggregation to ~2.4k daily rows. "
        "Reference parity: extension surface (SURVEY.md §2.B "
        "time-series).",
)
def ts_granger_causality_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    b = daily.select(
        F.date_add(F.col("d"), 1).alias("d"),
        F.col("rev_cents").alias("prev_rev"),
        F.col("n_orders").alias("prev_nord"),
    )
    lagged = daily.join(b, "d").select(
        F.col("rev_cents").alias("rev"),
        F.col("n_orders").alias("nord"),
        "prev_rev",
        "prev_nord",
    )
    obs = lagged.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("orders_cause_revenue").alias("direction"),
                    F.col("rev").alias("y"),
                    F.col("prev_rev").alias("y1"),
                    F.col("prev_nord").alias("x1"),
                ),
                F.struct(
                    F.lit("revenue_cause_orders").alias("direction"),
                    F.col("nord").alias("y"),
                    F.col("prev_nord").alias("y1"),
                    F.col("prev_rev").alias("x1"),
                ),
            )
        ).alias("o")
    ).select("o.*")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = obs.groupBy("direction").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("y1")).cast("double").alias("s1"),
        F.sum(dec("x1")).cast("double").alias("s2"),
        F.sum(dec("y1") * dec("y1")).cast("double").alias("s11"),
        F.sum(dec("x1") * dec("x1")).cast("double").alias("s22"),
        F.sum(dec("y1") * dec("x1")).cast("double").alias("s12"),
        F.sum(dec("y1") * dec("y")).cast("double").alias("s1y"),
        F.sum(dec("x1") * dec("y")).cast("double").alias("s2y"),
        F.sum(dec("y") * dec("y")).cast("double").alias("syy"),
    )
    m = s.select(
        "direction",
        "n",
        (F.col("n") * F.col("s11") - F.col("s1") * F.col("s1")).alias("c11"),
        (F.col("n") * F.col("s22") - F.col("s2") * F.col("s2")).alias("c22"),
        (F.col("n") * F.col("s12") - F.col("s1") * F.col("s2")).alias("c12"),
        (F.col("n") * F.col("s1y") - F.col("s1") * F.col("sy")).alias("c1y"),
        (F.col("n") * F.col("s2y") - F.col("s2") * F.col("sy")).alias("c2y"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("cyy"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    bb = m.select(
        "direction",
        "n",
        "c11",
        "c1y",
        "cyy",
        "c2y",
        ((F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) / det)
        .alias("b1"),
        ((F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y")) / det)
        .alias("b2"),
    )
    rss = bb.select(
        "direction",
        "n",
        "b1",
        "b2",
        (F.col("cyy") - F.col("c1y") * F.col("c1y") / F.col("c11"))
        .alias("rss_r"),
        (F.col("cyy") - F.col("b1") * F.col("c1y") - F.col("b2") * F.col("c2y"))
        .alias("rss_u"),
    )
    f = (F.col("rss_r") - F.col("rss_u")) * (F.col("n") - 3) / F.col("rss_u")
    return rss.select(
        "direction",
        F.col("n").alias("n_days"),
        F.round("b1", 6).alias("beta_lag_self"),
        F.round("b2", 6).alias("beta_lag_cross"),
        F.round(f, 4).alias("f_stat"),
        (f > 3.84).alias("granger_05"),
    )


# --------------------------------------------------------------------------
# Lo-MacKinlay variance-ratio test — round-9 late addition


@register(
    "ts_variance_ratio",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    seq AS (
        SELECT d, cents,
               cents - lag(cents, 1) OVER (ORDER BY d) AS d1,
               cents - lag(cents, 5) OVER (ORDER BY d) AS d5
        FROM daily
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(COUNT(d1) AS BIGINT) AS n1,
               CAST(COUNT(d5) AS BIGINT) AS n5,
               CAST(SUM(CAST(d1 AS HUGEINT) * d1) AS HUGEINT) AS sum_d1sq,
               CAST(SUM(CAST(d5 AS HUGEINT) * d5) AS HUGEINT) AS sum_d5sq
        FROM seq
    )
    SELECT n_days, n1, n5,
           CAST(sum_d1sq // 1000 AS BIGINT) AS sum_d1sq_k,
           CAST(sum_d5sq // 1000 AS BIGINT) AS sum_d5sq_k,
           CAST(sum_d5sq * n1 * 1000000 // (sum_d1sq * n5 * 5) AS BIGINT)
               AS vr_ppm
    FROM s
    """,
    doc="Lo-MacKinlay variance-ratio statistic VR(q=5) on the daily "
        "revenue series: ratio of the variance of 5-day differences to "
        "5x the variance of 1-day differences — the classic "
        "random-walk/mean-reversion diagnostic (VR < 1 means shocks "
        "revert, VR > 1 means they trend; Lo & MacKinlay 1988, public). "
        "Uses the uncentered second moments of lag differences over the "
        "position-ordered day series, all in exact integer cents "
        "(HUGEINT/DECIMAL for the squares; raw second moments emitted "
        "in thousandths to stay within BIGINT), ONE ppm floor division. "
        "Plan: one orders scan to a ~2400-row day aggregate; both lags "
        "ride ONE ordered window over that bounded frame (same device "
        "as ts_acf_daily — the window input is day-grain, never "
        "row-grain, so 100 TB of orders still windows over dates). "
        "Reference parity: extension surface (SURVEY.md §2.B "
        "time-series rows).",
)
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date(F.to_timestamp("o_orderdate")).alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("d")
    seq = daily.select(
        (F.col("cents") - F.lag("cents", 1).over(w)).alias("d1"),
        (F.col("cents") - F.lag("cents", 5).over(w)).alias("d5"),
    )
    s = seq.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.count("d1").cast("long").alias("n1"),
        F.count("d5").cast("long").alias("n5"),
        F.sum(F.col("d1").cast("decimal(38,0)") * F.col("d1")).alias(
            "sum_d1sq_d"
        ),
        F.sum(F.col("d5").cast("decimal(38,0)") * F.col("d5")).alias(
            "sum_d5sq_d"
        ),
    )
    return s.select(
        "n_days",
        "n1",
        "n5",
        F.expr("CAST(sum_d1sq_d DIV 1000 AS BIGINT)").alias("sum_d1sq_k"),
        F.expr("CAST(sum_d5sq_d DIV 1000 AS BIGINT)").alias("sum_d5sq_k"),
        F.expr(
            "CAST(sum_d5sq_d * n1 * 1000000 "
            "DIV (sum_d1sq_d * n5 * 5) AS BIGINT)"
        ).alias("vr_ppm"),
    )


@register(
    "ts_turning_points_test",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    seq AS (
        SELECT cents,
               lag(cents) OVER (ORDER BY d) AS prv,
               lead(cents) OVER (ORDER BY d) AS nxt
        FROM daily
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(count_if(prv IS NOT NULL AND nxt IS NOT NULL
                             AND ((cents > prv AND cents > nxt)
                                  OR (cents < prv AND cents < nxt)))
                    AS BIGINT) AS n_turning
        FROM seq
    )
    SELECT n_days, n_turning,
           CAST(2 * (n_days - 2) AS BIGINT) AS expected_x3,
           CAST(16 * n_days - 29 AS BIGINT) AS variance_x90,
           round((CAST(n_turning AS DOUBLE) - 2.0 * (n_days - 2) / 3)
                 / sqrt((16.0 * n_days - 29) / 90), 9) AS z_score
    FROM s
    """,
    doc="Turning-points test for randomness of the daily revenue series "
        "(Kendall's classic): count interior strict local maxima/minima; "
        "under IID the count is ~N(2(n-2)/3, (16n-29)/90), so too few "
        "turning points means trend/autocorrelation and too many means "
        "alternating noise — the third member of the randomness-check "
        "triple next to ts_runs_test_wald_wolfowitz (signs) and "
        "ts_ljung_box_whiteness (autocorrelations), each sensitive to a "
        "different alternative. The count and the null moments travel "
        "as exact integers (expected TRIPLED, variance x90); the one z "
        "division+sqrt is IEEE-pinned. Plan: one orders scan to the "
        "day-grain aggregate, lag+lead in ONE ordered window over that "
        "bounded frame, a 1-row result. Reference parity: extension "
        "surface (SURVEY.md §2.B time-series rows).",
)
def ts_turning_points_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date(F.to_timestamp("o_orderdate")).alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("d")
    seq = daily.select(
        "cents",
        F.lag("cents").over(w).alias("prv"),
        F.lead("cents").over(w).alias("nxt"),
    )
    turning = (
        F.col("prv").isNotNull()
        & F.col("nxt").isNotNull()
        & (
            ((F.col("cents") > F.col("prv")) & (F.col("cents") > F.col("nxt")))
            | ((F.col("cents") < F.col("prv")) & (F.col("cents") < F.col("nxt")))
        )
    )
    s = seq.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.count_if(turning).cast("long").alias("n_turning"),
    )
    return s.select(
        "n_days",
        "n_turning",
        F.expr("CAST(2 * (n_days - 2) AS BIGINT)").alias("expected_x3"),
        F.expr("CAST(16 * n_days - 29 AS BIGINT)").alias("variance_x90"),
        F.round(
            (
                F.col("n_turning").cast("double")
                - 2.0 * (F.col("n_days") - 2) / 3
            )
            / F.sqrt((16.0 * F.col("n_days") - 29) / 90),
            9,
        ).alias("z_score"),
    )


@register(
    "ts_value_at_risk_cvar",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    diffs AS (
        SELECT d, cents - lag(cents) OVER (ORDER BY d) AS chg
        FROM daily
    ),
    ranked AS (
        SELECT chg, row_number() OVER (ORDER BY chg, d) AS rk,
               COUNT(*) OVER () AS n1
        FROM diffs WHERE chg IS NOT NULL
    ),
    k AS (SELECT CAST(MAX(n1) // 20 AS BIGINT) AS k, MAX(n1) AS n1
          FROM ranked)
    SELECT k.n1 AS n_changes, k.k,
           CAST(MAX(CASE WHEN r.rk = k.k THEN r.chg END) AS BIGINT)
               AS var_cents,
           CAST(SUM(CASE WHEN r.rk <= k.k THEN r.chg ELSE 0 END) * 100
                // k.k AS BIGINT) AS cvar_cents_x100
    FROM ranked r CROSS JOIN k
    GROUP BY k.n1, k.k
    """,
    doc="Historical Value-at-Risk and Conditional VaR (expected "
        "shortfall) of the daily revenue CHANGE series at the 5% tail: "
        "VaR = the k-th worst day-over-day change (k = floor(n/20)), "
        "CVaR = the mean of the k worst — the coherent tail-risk pair "
        "(Artzner et al. 1999, public) that complements ts_max_drawdown "
        "(worst cumulative run) with a per-day tail magnitude. "
        "Deterministic selection: row_number over (chg, d) on the "
        "bounded day-grain diff frame (same contained-window argument "
        "as every ts_ op — the rank runs over ~2400 rows regardless of "
        "corpus size), exact integer cents; CVaR emitted as cents x100 "
        "with one floor division. Negative-sum division truncates "
        "toward zero identically on both engines (the round-8 DIV "
        "lesson). Reference parity: extension surface (SURVEY.md §2.B "
        "time-series rows).",
)
def ts_value_at_risk_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date(F.to_timestamp("o_orderdate")).alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("d")
    diffs = daily.select(
        "d", (F.col("cents") - F.lag("cents").over(w)).alias("chg")
    ).where(F.col("chg").isNotNull())
    wr = Window.orderBy("chg", "d")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = diffs.select(
        "chg",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wall).alias("n1"),
    )
    k = ranked.agg(
        F.expr("CAST(MAX(n1) DIV 20 AS BIGINT)").alias("k"),
        F.max("n1").cast("long").alias("n_changes"),
    )
    return (
        ranked.drop("n1")
        .crossJoin(F.broadcast(k))
        .groupBy("n_changes", "k")
        .agg(
            F.max(F.when(F.col("rk") == F.col("k"), F.col("chg")))
            .cast("long")
            .alias("var_cents"),
            F.expr(
                "CAST(SUM(CASE WHEN rk <= k THEN chg ELSE 0 END) * 100 "
                "DIV k AS BIGINT)"
            ).alias("cvar_cents_x100"),
        )
    )


@register(
    "ts_permutation_entropy",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    win AS (
        SELECT cents AS x1,
               lead(cents, 1) OVER (ORDER BY d) AS x2,
               lead(cents, 2) OVER (ORDER BY d) AS x3
        FROM daily
    ),
    pat AS (
        SELECT (CAST(x2 < x1 AS INT) + CAST(x3 < x1 AS INT)) * 100
               + (CAST(x1 < x2 AS INT) + CAST(x3 < x2 AS INT)
                  + CAST(x1 = x2 AS INT)) * 10
               + (CAST(x1 < x3 AS INT) + CAST(x2 < x3 AS INT)
                  + CAST(x1 = x3 AS INT) + CAST(x2 = x3 AS INT))
                   AS pattern
        FROM win WHERE x3 IS NOT NULL
    ),
    cnt AS (
        SELECT pattern, CAST(COUNT(*) AS BIGINT) AS c FROM pat GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS m FROM cnt),
    terms AS (
        SELECT c, m,
               CAST(round(c * ln(CAST(m AS DOUBLE) / c) * 1000000) AS BIGINT)
                   AS ent_micro
        FROM cnt CROSS JOIN tot
    )
    SELECT CAST(MAX(m) AS BIGINT) AS m_windows,
           CAST(COUNT(*) AS BIGINT) AS n_patterns,
           round(CAST(SUM(ent_micro) AS DOUBLE) / MAX(m) / 1000000, 6)
               AS entropy_nats,
           round(CAST(SUM(ent_micro) AS DOUBLE) / MAX(m) / 1000000
                 / 1.791759469228055, 6) AS normalized_h
    FROM terms
    """,
    doc="Permutation entropy (Bandt-Pompe, order 3) of the daily-revenue "
        "series: each overlapping 3-day window maps to its ordinal "
        "pattern (ranks computed with the stable earlier-index tie rule, "
        "so equal values can never make the engines disagree), and the "
        "Shannon entropy of the 6-pattern distribution — normalized by "
        "ln(6) as a double LITERAL, never a cross-engine ln() call — "
        "measures dynamical complexity: ~1 = white noise, low = "
        "persistent trends/cycles. The complexity-theoretic complement "
        "to ts_runs_test_wald_wolfowitz (direction randomness) and "
        "ts_acf_daily (linear memory); robust to monotone transforms of "
        "the values. Entropy terms c*ln(m/c) follow the repo's "
        "quantize-to-1e-6-per-group-then-sum ln-determinism convention "
        "over a <=6-row group table. Plan: one date aggregate, two lead "
        "windows over the bounded day grid, a 6-row rollup. Reference "
        "parity: extension surface (SURVEY.md §2.C time-series rows).",
)
def ts_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("d")
    win = daily.select(
        F.col("cents").alias("x1"),
        F.lead("cents", 1).over(w).alias("x2"),
        F.lead("cents", 2).over(w).alias("x3"),
    )
    pat = win.where(F.col("x3").isNotNull()).select(
        F.expr(
            "(CAST(x2 < x1 AS INT) + CAST(x3 < x1 AS INT)) * 100"
            " + (CAST(x1 < x2 AS INT) + CAST(x3 < x2 AS INT)"
            "    + CAST(x1 = x2 AS INT)) * 10"
            " + (CAST(x1 < x3 AS INT) + CAST(x2 < x3 AS INT)"
            "    + CAST(x1 = x3 AS INT) + CAST(x2 = x3 AS INT))"
        ).alias("pattern")
    )
    cnt = pat.groupBy("pattern").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cnt.agg(F.sum("c").cast("long").alias("m"))
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        "c",
        "m",
        F.round(
            F.col("c")
            * F.log(F.col("m").cast("double") / F.col("c"))
            * F.lit(1_000_000)
        )
        .cast("long")
        .alias("ent_micro"),
    )
    ent = F.sum("ent_micro").cast("double") / F.max("m") / F.lit(1_000_000)
    return terms.agg(
        F.max("m").cast("long").alias("m_windows"),
        F.count(F.lit(1)).cast("long").alias("n_patterns"),
        F.round(ent, 6).alias("entropy_nats"),
        F.round(ent / F.lit(1.791759469228055), 6).alias("normalized_h"),
    )


@register(
    "ts_kpss_level_stat",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    seq AS (
        SELECT cents,
               row_number() OVER (ORDER BY d) AS t,
               SUM(cents) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS ps,
               COUNT(*) OVER () AS n,
               SUM(cents) OVER () AS tot
        FROM daily
    ),
    scaled AS (
        SELECT n,
               CAST(n AS HUGEINT) * ps - CAST(t AS HUGEINT) * tot AS s_scaled,
               CAST(n AS HUGEINT) * cents - tot AS e_scaled
        FROM seq
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           round(CAST(SUM(s_scaled * s_scaled) AS DOUBLE)
                 / (CAST(MAX(n) AS DOUBLE)
                    * CAST(SUM(e_scaled * e_scaled) AS DOUBLE)), 9)
               AS kpss_stat
    FROM scaled
    """,
    doc="KPSS level-stationarity statistic (lag-0 long-run variance) for "
        "the daily-revenue series: eta = sum(S_t^2) / (n^2 * sigma^2) "
        "with S_t the partial sums of mean-residuals — the NULL here is "
        "stationarity, making it the mirror-image companion to the "
        "Dickey-Fuller test (null = unit root): run both and the four "
        "outcomes separate trend-stationary from difference-stationary "
        "series. EVERYTHING before the final division is exact integer "
        "arithmetic on n-scaled residuals (n*PS_t - t*T and n*x_t - T "
        "clear the 1/n rationals; squares live in HUGEINT/DECIMAL(38,0) "
        "with headroom past 1e30), then eta = sum_S2 / (n * sum_E2) "
        "cancels every scale factor in one double division. The "
        "cumulative windows run over the bounded day grid (the repo's "
        "value-domain window rule). Plan: one date aggregate, one "
        "ordered pass, one 1-row rollup. Reference parity: extension "
        "surface (SURVEY.md §2.C time-series rows).",
)
def ts_kpss_level_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("d")
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    seq = daily.select(
        "cents",
        F.row_number().over(w).alias("t"),
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("ps"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("cents").over(wall).alias("tot"),
    )
    scaled = seq.select(
        "n",
        (
            F.col("n").cast("decimal(38,0)") * F.col("ps")
            - F.col("t").cast("decimal(38,0)") * F.col("tot")
        ).alias("s_scaled"),
        (
            F.col("n").cast("decimal(38,0)") * F.col("cents") - F.col("tot")
        ).alias("e_scaled"),
    )
    return scaled.agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(
            F.sum(F.col("s_scaled") * F.col("s_scaled")).cast("double")
            / (
                F.max("n").cast("double")
                * F.sum(F.col("e_scaled") * F.col("e_scaled")).cast("double")
            ),
            9,
        ).alias("kpss_stat"),
    )


@register(
    "ts_dickey_fuller_lag0",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    pairs AS (
        SELECT lag(cents) OVER (ORDER BY d) AS xl,
               cents - lag(cents) OVER (ORDER BY d) AS dx
        FROM daily
    ),
    s AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS m,
               CAST(SUM(CAST(xl AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(SUM(CAST(dx AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(SUM(CAST(xl AS HUGEINT) * xl) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(xl AS HUGEINT) * dx) AS HUGEINT) AS sxy,
               CAST(SUM(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS syy
        FROM pairs WHERE xl IS NOT NULL
    ),
    c AS (
        SELECT CAST(m AS BIGINT) AS m,
               CAST(m * sxx - sx * sx AS DOUBLE) AS msxx,
               CAST(m * sxy - sx * sy AS DOUBLE) AS msxy,
               CAST(m * syy - sy * sy AS DOUBLE) AS msyy
        FROM s
    )
    SELECT m,
           round(msxy / msxx, 9) AS adf_slope,
           round((msxy / msxx)
                 / sqrt((msyy - (msxy / msxx) * msxy)
                        / ((m - 2) * msxx)), 6) AS adf_t_stat
    FROM c
    """,
    doc="Dickey-Fuller unit-root test (no augmentation lags, with "
        "intercept) on daily revenue: regress the day-over-day change on "
        "the lagged level — slope near 0 means shocks persist (unit "
        "root / random walk), strongly negative means mean reversion; "
        "the t-statistic (vs the Dickey-Fuller, NOT normal, critical "
        "values) is THE stationarity gate before any ARIMA-style "
        "modeling, and the mirror twin of ts_kpss_level_stat whose null "
        "is the opposite. The five regression moments accumulate as "
        "exact HUGEINT/DECIMAL(38,0) sums of integer cents (products to "
        "~1e20 at full scale), the centered m-scaled forms m*Sxx etc. "
        "clear all rationals exactly, and slope/t evaluate in ONE fixed "
        "double expression — bitwise identical across engines. Plan: "
        "one date aggregate, one lag window over the bounded day grid, "
        "one 1-row rollup. Reference parity: extension surface "
        "(SURVEY.md §2.C time-series rows).",
)
def ts_dickey_fuller_lag0(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("d")
    pairs = daily.select(
        F.lag("cents").over(w).alias("xl"),
        (F.col("cents") - F.lag("cents").over(w)).alias("dx"),
    ).where(F.col("xl").isNotNull())
    d38 = "decimal(38,0)"
    s = pairs.agg(
        F.count(F.lit(1)).cast(d38).alias("m"),
        F.sum(F.col("xl").cast(d38)).alias("sx"),
        F.sum(F.col("dx").cast(d38)).alias("sy"),
        F.sum(F.col("xl").cast(d38) * F.col("xl")).alias("sxx"),
        F.sum(F.col("xl").cast(d38) * F.col("dx")).alias("sxy"),
        F.sum(F.col("dx").cast(d38) * F.col("dx")).alias("syy"),
    )
    c = s.select(
        F.col("m").cast("long").alias("m"),
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("msxx"),
        (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        .alias("msxy"),
        (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("msyy"),
    )
    b = F.col("msxy") / F.col("msxx")
    return c.select(
        "m",
        F.round(b, 9).alias("adf_slope"),
        F.round(
            b
            / F.sqrt(
                (F.col("msyy") - b * F.col("msxy"))
                / ((F.col("m") - 2) * F.col("msxx"))
            ),
            6,
        ).alias("adf_t_stat"),
    )


@register(
    "ml_ols_influence_cooks_distance",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    seq AS (
        SELECT day, cents, row_number() OVER (ORDER BY day) AS t FROM daily
    ),
    s AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(CAST(t AS HUGEINT)) AS HUGEINT) AS st,
               CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt,
               CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(SUM(CAST(t AS HUGEINT) * cents) AS HUGEINT) AS sty,
               CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS syy
        FROM seq
    ),
    c AS (
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n * stt - st * st AS DOUBLE) AS mstt,
               CAST(n * sty - st * sy AS DOUBLE) AS msty,
               CAST(n * syy - sy * sy AS DOUBLE) AS msyy
        FROM s
    ),
    b AS (
        SELECT n, mstt, msty / mstt AS slope,
               ((msyy - (msty / mstt) * msty) / n) / (n - 2) AS s2
        FROM c
    ),
    rows_scaled AS (
        SELECT q.day,
               (CAST(b.n AS DOUBLE) * q.cents
                - CAST(s.sy AS DOUBLE)
                - b.slope * (CAST(b.n AS DOUBLE) * q.t
                             - CAST(s.st AS DOUBLE))) / b.n AS e,
               1.0 / b.n
               + (CAST(b.n AS DOUBLE) * q.t - CAST(s.st AS DOUBLE))
                 * (CAST(b.n AS DOUBLE) * q.t - CAST(s.st AS DOUBLE))
                 / (b.n * b.mstt) AS h,
               b.s2 AS s2
        FROM seq q CROSS JOIN b CROSS JOIN s
    )
    SELECT CAST(day AS VARCHAR) AS day,
           round(e, 3) AS resid_cents,
           CAST(round(h * 1000000) AS BIGINT) AS leverage_ppm,
           round(e * e * h / (2 * s2 * (1 - h) * (1 - h)), 9) AS cooks_d
    FROM rows_scaled
    ORDER BY cooks_d DESC, day
    LIMIT 10
    """,
    doc="Cook's distance influence diagnostics for the daily-revenue-"
        "on-time OLS trend: the 10 most influential days, each with its "
        "residual, leverage h_t = 1/n + (t-tbar)^2/Stt, and "
        "D_t = e_t^2 h_t / (p s^2 (1-h_t)^2), p=2 — the regression-"
        "diagnostics answer to 'which days MOVE the fitted trend, not "
        "just sit far from it' that ts_anomaly_mad (pure outlyingness) "
        "cannot give, completing the OLS family (slope: "
        "agg_corr_regression, autocorrelation: ml_ols_durbin_watson). "
        "The five regression moments are exact HUGEINT/DECIMAL(38,0) "
        "sums; per-row residual and leverage evaluate from the n-scaled "
        "integer forms (n*y_t - Sy, n*t - St) in ONE fixed double "
        "expression, so the two engines' doubles are bitwise equal and "
        "the top-10 selection cannot diverge (day is the tiebreak). "
        "Plan: one date aggregate, one bounded-day-grid window, a 1-row "
        "moment rollup broadcast back, TakeOrderedAndProject(10). "
        "Reference parity: extension surface (SURVEY.md §2.B ML rows).",
)
def ml_ols_influence_cooks_distance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    )
    seq = daily.select(
        "day", "cents", F.row_number().over(Window.orderBy("day")).alias("t")
    )
    d38 = "decimal(38,0)"
    s = seq.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("t").cast(d38)).alias("st"),
        F.sum(F.col("t").cast(d38) * F.col("t")).alias("stt"),
        F.sum(F.col("cents").cast(d38)).alias("sy"),
        F.sum(F.col("t").cast(d38) * F.col("cents")).alias("sty"),
        F.sum(F.col("cents").cast(d38) * F.col("cents")).alias("syy"),
    )
    c = s.select(
        F.col("n").cast("long").alias("n"),
        F.col("st").cast("double").alias("st_d"),
        F.col("sy").cast("double").alias("sy_d"),
        (F.col("n") * F.col("stt") - F.col("st") * F.col("st"))
        .cast("double")
        .alias("mstt"),
        (F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
        .cast("double")
        .alias("msty"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("msyy"),
    )
    b = c.select(
        "n",
        "st_d",
        "sy_d",
        "mstt",
        (F.col("msty") / F.col("mstt")).alias("slope"),
        (
            (F.col("msyy") - (F.col("msty") / F.col("mstt")) * F.col("msty"))
            / F.col("n")
            / (F.col("n") - 2)
        ).alias("s2"),
    )
    j = seq.crossJoin(F.broadcast(b))
    ey = F.col("n").cast("double") * F.col("cents") - F.col("sy_d")
    et = F.col("n").cast("double") * F.col("t") - F.col("st_d")
    e = (ey - F.col("slope") * et) / F.col("n")
    h = F.lit(1.0) / F.col("n") + et * et / (F.col("n") * F.col("mstt"))
    return (
        j.select(
            F.col("day").cast("string").alias("day"),
            F.round(e, 3).alias("resid_cents"),
            F.round(h * F.lit(1_000_000)).cast("long").alias("leverage_ppm"),
            F.round(
                e * e * h
                / (F.lit(2) * F.col("s2") * (F.lit(1) - h) * (F.lit(1) - h)),
                9,
            ).alias("cooks_d"),
        )
        .orderBy(F.desc("cooks_d"), "day")
        .limit(10)
    )


@register(
    "ts_spectral_entropy",
    oracle=f"""
    WITH daily AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM events GROUP BY 1
    ),
    mn AS (SELECT CAST(MIN(d) AS BIGINT) AS d0 FROM daily),
    idx AS (SELECT d - mn.d0 AS t, v FROM daily, mn),
    periods AS (SELECT CAST(unnest(generate_series(2, 15)) AS BIGINT) AS p),
    terms AS (
        SELECT p.p,
               CAST(round(i.v * cos(2 * {_PI_LIT} * (i.t % p.p) / p.p)
                          * 1000) AS BIGINT) AS c_milli,
               CAST(round(i.v * sin(2 * {_PI_LIT} * (i.t % p.p) / p.p)
                          * 1000) AS BIGINT) AS s_milli
        FROM idx i CROSS JOIN periods p
    ),
    spec AS (
        SELECT p,
               CAST(SUM(c_milli) AS HUGEINT) * SUM(c_milli)
               + CAST(SUM(s_milli) AS HUGEINT) * SUM(s_milli) AS power_microsq
        FROM terms GROUP BY p
    ),
    tot AS (
        SELECT CAST(SUM(power_microsq) AS HUGEINT) AS ptot, COUNT(*) AS k
        FROM spec
    ),
    ent AS (
        SELECT CAST(SUM(CAST(round(CAST(power_microsq AS DOUBLE) / ptot
                                   * ln(CAST(ptot AS DOUBLE) / power_microsq)
                                   * 1000000000) AS BIGINT)) AS BIGINT)
                   AS ent_nano,
               CAST(MAX(k) AS BIGINT) AS k
        FROM spec CROSS JOIN tot WHERE power_microsq > 0
    )
    SELECT k AS n_periods,
           round(CAST(ent_nano AS DOUBLE) / 1000000000, 6) AS entropy_nats,
           round(CAST(ent_nano AS DOUBLE) / 1000000000
                 / 2.6390573296152584, 6) AS normalized_h
    FROM ent
    """,
    doc="Spectral entropy of the daily event-count series over the "
        "bounded 2-15-day period grid: Shannon entropy of the "
        "normalized single-frequency DFT power distribution — low "
        "entropy = power concentrated in one cycle (strong weekly "
        "rhythm), high = broadband/noisy; the one-number summary of the "
        "spectrum whose peaks ts_spectral_dft_topk lists, normalized by "
        "ln(14) as a double LITERAL. The cos/sin terms reuse the exact "
        "quantize-to-1e-3-then-integer-sum convention of the DFT op "
        "(libm last-ulp differences cannot reach the hash), per-period power stays an EXACT integer (cs_milli^2 + ss_milli^2 "
        "in HUGEINT/DECIMAL(38,0)) through the total — a double sum of "
        "14 powers would be partition-order-dependent — and the <=14 "
        "entropy terms p*ln(1/p) quantize to 1e-9 before summing. "
        "Plan: one narrow daily rollup, a broadcast 14-row period grid "
        "crossed against it, a 14-group aggregate, two 1-row rollups. "
        "Reference parity: extension surface (SURVEY.md §2.C "
        "time-series rows).",
)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("v"))
    mn = daily.agg(F.min("d").cast("long").alias("d0"))
    idx = daily.crossJoin(F.broadcast(mn)).select(
        (F.col("d") - F.col("d0")).alias("t"), "v"
    )
    periods = spark.range(2, 16).select(F.col("id").cast("long").alias("p"))
    pi = float(_PI_LIT)
    ang = F.lit(2.0) * F.lit(pi) * (F.col("t") % F.col("p")) / F.col("p")
    terms = idx.crossJoin(F.broadcast(periods)).select(
        "p",
        F.round(F.col("v") * F.cos(ang) * F.lit(1000))
        .cast("long")
        .alias("c_milli"),
        F.round(F.col("v") * F.sin(ang) * F.lit(1000))
        .cast("long")
        .alias("s_milli"),
    )
    cs = F.sum("c_milli").cast("decimal(38,0)")
    ss = F.sum("s_milli").cast("decimal(38,0)")
    spec = terms.groupBy("p").agg(
        (cs * cs + ss * ss).alias("power_microsq")
    )
    tot = spec.agg(
        F.sum("power_microsq").cast("decimal(38,0)").alias("ptot"),
        F.count(F.lit(1)).alias("k"),
    )
    ent = (
        spec.crossJoin(F.broadcast(tot))
        .where(F.col("power_microsq") > 0)
        .agg(
            F.sum(
                F.round(
                    F.col("power_microsq").cast("double")
                    / F.col("ptot").cast("double")
                    * F.log(
                        F.col("ptot").cast("double")
                        / F.col("power_microsq").cast("double")
                    )
                    * F.lit(1_000_000_000)
                ).cast("long")
            )
            .cast("long")
            .alias("ent_nano"),
            F.max("k").cast("long").alias("k"),
        )
    )
    e = F.col("ent_nano").cast("double") / F.lit(1_000_000_000)
    return ent.select(
        F.col("k").alias("n_periods"),
        F.round(e, 6).alias("entropy_nats"),
        F.round(e / F.lit(2.6390573296152584), 6).alias("normalized_h"),
    )


@register(
    "ts_seasonal_mann_kendall",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1
    ),
    pts AS (
        SELECT datediff('day', DATE '1995-01-01', d) AS di,
               datediff('day', DATE '1995-01-01', d) % 7 AS season, y
        FROM daily
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                             WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_stat
        FROM pts a JOIN pts b ON b.di > a.di AND b.season = a.season
    ),
    nw AS (
        SELECT season, CAST(COUNT(*) AS BIGINT) AS n_w FROM pts GROUP BY 1
    ),
    tw AS (
        SELECT season,
               COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
                   AS tsum_w
        FROM (SELECT season, CAST(COUNT(*) AS BIGINT) AS t
              FROM pts GROUP BY season, y) g
        GROUP BY season
    ),
    v AS (
        SELECT CAST(SUM(nw.n_w) AS BIGINT) AS n_days,
               CAST(COUNT(*) AS BIGINT) AS n_seasons,
               CAST(SUM(nw.n_w * (nw.n_w - 1) * (2 * nw.n_w + 5)
                        - tw.tsum_w) AS BIGINT) AS var18
        FROM nw JOIN tw USING (season)
    )
    SELECT v.n_seasons, v.n_days, s.s_stat, v.var18,
           round(CASE WHEN s.s_stat > 0 THEN
                          (CAST(s.s_stat AS DOUBLE) - 1)
                          / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                      WHEN s.s_stat < 0 THEN
                          (CAST(s.s_stat AS DOUBLE) + 1)
                          / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                      ELSE 0.0 END, 6) AS z_stat
    FROM v, s
    """,
    doc="Seasonal Mann-Kendall trend test (Hirsch-Slack, weekly "
        "seasonality) on daily revenue: pairwise sign comparisons are "
        "restricted to SAME-WEEKDAY pairs (season = day-index mod 7 — "
        "engine-independent integer arithmetic, no dow() dialect trap), "
        "so a strong weekly cycle can neither masquerade as nor mask a "
        "monotone trend — the variant of ts_mann_kendall_trend that is "
        "actually valid on seasonal business series; S = sum of "
        "per-season S_w, Var = sum of per-season tie-corrected "
        "n(n-1)(2n+5)/18 terms, both exact integers until the one final "
        "sqrt. Pair enumeration reuses the MK/Theil-Sen shape with a "
        "stride-7 sequence explode (map-side, broadcast hash join on "
        "the observed-day table — no theta join), and the pair volume "
        "is (days/7)^2 * 7 on the CALENDAR-BOUNDED grid, independent of "
        "corpus rows. Plan: one daily rollup, grid-sized pair work, two "
        "bounded 7-group rollups. Reference parity: extension surface "
        "(SURVEY.md §2.C time-series rows).",
)
def ts_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)"))
            .cast("long")
            .alias("y")
        )
        .localCheckpoint(eager=True)  # pairs + ties + counts all consume it
    )
    pts = daily.select(
        F.datediff(F.col("d"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("di"),
        "y",
    ).withColumn("season", F.col("di") % 7)
    b = pts.select(F.col("di").alias("dj"), F.col("y").alias("yj"))
    dmax = pts.agg(F.max("di").alias("dmax"))
    sgn = (
        F.when(F.col("yj") > F.col("y"), 1)
        .when(F.col("yj") < F.col("y"), -1)
        .otherwise(0)
    )
    s = (
        pts.crossJoin(F.broadcast(dmax))
        .where(F.col("di") + 7 <= F.col("dmax"))
        .select(
            "y",
            F.explode(
                F.sequence(F.col("di") + 7, F.col("dmax"), F.lit(7))
            ).alias("dj"),
        )
        .join(F.broadcast(b), "dj")
        .agg(F.sum(sgn).cast("long").alias("s_stat"))
    )
    nw = pts.groupBy("season").agg(F.count(F.lit(1)).cast("long").alias("n_w"))
    tw = (
        pts.groupBy("season", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("season")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias("tsum_w")
        )
    )
    v = nw.join(tw, "season").agg(
        F.sum("n_w").cast("long").alias("n_days"),
        F.count(F.lit(1)).cast("long").alias("n_seasons"),
        F.sum(
            F.col("n_w") * (F.col("n_w") - 1) * (2 * F.col("n_w") + 5)
            - F.col("tsum_w")
        )
        .cast("long")
        .alias("var18"),
    )
    joined = v.crossJoin(F.broadcast(s))
    sd = F.col("s_stat").cast("double")
    denom = F.sqrt(F.col("var18").cast("double") / 18.0)
    return joined.select(
        "n_seasons",
        "n_days",
        "s_stat",
        "var18",
        F.round(
            F.when(F.col("s_stat") > 0, (sd - 1) / denom)
            .when(F.col("s_stat") < 0, (sd + 1) / denom)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("z_stat"),
    )


@register(
    "ts_theil_inequality_decomposition",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS TIMESTAMP) AS day,
               CAST(SUM(CAST(value * 100 AS DECIMAL(18,0))) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1
    ),
    p AS (
        SELECT cents AS y,
               lag(cents, 7) OVER (ORDER BY day) AS f
        FROM daily
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(f AS HUGEINT)) AS HUGEINT) AS sf,
               CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(SUM(CAST(f AS HUGEINT) * f) AS HUGEINT) AS sff,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
               CAST(SUM(CAST(f AS HUGEINT) * y) AS HUGEINT) AS sfy
        FROM p WHERE f IS NOT NULL
    )
    SELECT n AS n_days,
           round((CAST(sff AS DOUBLE) - 2 * CAST(sfy AS DOUBLE)
                  + CAST(syy AS DOUBLE)) / n, 2) AS mse,
           CASE WHEN (CAST(sff AS DOUBLE) - 2 * CAST(sfy AS DOUBLE)
                      + CAST(syy AS DOUBLE)) / n = 0 THEN NULL ELSE
           CAST(round(1000000.0
                * (CAST(sf AS DOUBLE) / n - CAST(sy AS DOUBLE) / n)
                * (CAST(sf AS DOUBLE) / n - CAST(sy AS DOUBLE) / n)
                / ((CAST(sff AS DOUBLE) - 2 * CAST(sfy AS DOUBLE)
                    + CAST(syy AS DOUBLE)) / n)) AS BIGINT) END AS um_micro,
           CASE WHEN (CAST(sff AS DOUBLE) - 2 * CAST(sfy AS DOUBLE)
                      + CAST(syy AS DOUBLE)) / n = 0 THEN NULL ELSE
           CAST(round(1000000.0
                * (sqrt(CAST(sff AS DOUBLE) / n
                        - (CAST(sf AS DOUBLE) / n) * (CAST(sf AS DOUBLE) / n))
                   - sqrt(CAST(syy AS DOUBLE) / n
                          - (CAST(sy AS DOUBLE) / n)
                            * (CAST(sy AS DOUBLE) / n)))
                * (sqrt(CAST(sff AS DOUBLE) / n
                        - (CAST(sf AS DOUBLE) / n) * (CAST(sf AS DOUBLE) / n))
                   - sqrt(CAST(syy AS DOUBLE) / n
                          - (CAST(sy AS DOUBLE) / n)
                            * (CAST(sy AS DOUBLE) / n)))
                / ((CAST(sff AS DOUBLE) - 2 * CAST(sfy AS DOUBLE)
                    + CAST(syy AS DOUBLE)) / n)) AS BIGINT) END AS us_micro,
           CASE WHEN (CAST(sff AS DOUBLE) - 2 * CAST(sfy AS DOUBLE)
                      + CAST(syy AS DOUBLE)) / n = 0 THEN NULL ELSE
           CAST(round(1000000.0
                * 2.0
                * (sqrt(CAST(sff AS DOUBLE) / n
                        - (CAST(sf AS DOUBLE) / n) * (CAST(sf AS DOUBLE) / n))
                   * sqrt(CAST(syy AS DOUBLE) / n
                          - (CAST(sy AS DOUBLE) / n)
                            * (CAST(sy AS DOUBLE) / n))
                   - (CAST(sfy AS DOUBLE) / n
                      - (CAST(sf AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)))
                / ((CAST(sff AS DOUBLE) - 2 * CAST(sfy AS DOUBLE)
                    + CAST(syy AS DOUBLE)) / n)) AS BIGINT) END AS uc_micro
    FROM mom
    """,
    doc="Theil inequality decomposition of the seasonal-naive forecast "
        "(same-weekday-last-week, the ts_seasonal_naive_error baseline) "
        "on daily revenue: MSE split into bias proportion U_M = "
        "(fbar-ybar)^2/MSE, variance proportion U_S = (sd_f-sd_y)^2/"
        "MSE, and covariance proportion U_C = 2(sd_f*sd_y - cov)/MSE "
        "(U_M+U_S+U_C = 1) — the classic forecast-autopsy: a large U_M "
        "says re-center, large U_S says re-scale, and only the U_C "
        "share is irreducible noise; the decomposition tells you "
        "WHETHER a better model can beat the baseline before you pay "
        "to fit one. All six moments are exact HUGEINT/DECIMAL(38,0) "
        "sums of integer cents over the bounded day grid; every "
        "output is one fixed double expression of them, quantized to "
        "1e-6. Plan: one (day) aggregate, one 7-lag window on the "
        "bounded grid, one 1-row moment fold. Reference parity: "
        "extension surface (SURVEY.md §2.B time-series rows).",
)
def ts_theil_inequality_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").cast("timestamp").alias("day")
    ).agg(
        F.sum((F.col("value") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day")
    p = daily.select(
        F.col("cents").alias("y"), F.lag("cents", 7).over(w).alias("f")
    ).where(F.col("f").isNotNull())
    d38 = "decimal(38,0)"
    mom = p.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("f").cast(d38)).cast(d38).alias("sf"),
        F.sum(F.col("y").cast(d38)).cast(d38).alias("sy"),
        F.sum(F.col("f").cast(d38) * F.col("f")).cast(d38).alias("sff"),
        F.sum(F.col("y").cast(d38) * F.col("y")).cast(d38).alias("syy"),
        F.sum(F.col("f").cast(d38) * F.col("y")).cast(d38).alias("sfy"),
    )
    n = F.col("n")
    fbar = F.col("sf").cast("double") / n
    ybar = F.col("sy").cast("double") / n
    mse = (
        F.col("sff").cast("double")
        - 2 * F.col("sfy").cast("double")
        + F.col("syy").cast("double")
    ) / n
    sdf = F.sqrt(F.col("sff").cast("double") / n - fbar * fbar)
    sdy = F.sqrt(F.col("syy").cast("double") / n - ybar * ybar)
    cov = F.col("sfy").cast("double") / n - fbar * ybar
    # mse = 0 (forecast exactly equals actuals, e.g. a perfectly
    # 7-periodic series) must yield NULL shares, not Inf/NaN — Spark's
    # non-ANSI double→long cast and DuckDB's CAST(round(inf)) diverge
    # on the unguarded form (ADVICE r11, same class as the r10
    # ml_matthews_corrcoef fix)
    def _share(expr):
        return F.when(mse != 0, F.round(expr).cast("long"))

    return mom.select(
        n.alias("n_days"),
        F.round(mse, 2).alias("mse"),
        _share(F.lit(1_000_000.0) * (fbar - ybar) * (fbar - ybar) / mse)
        .alias("um_micro"),
        _share(F.lit(1_000_000.0) * (sdf - sdy) * (sdf - sdy) / mse)
        .alias("us_micro"),
        _share(F.lit(1_000_000.0) * F.lit(2.0) * (sdf * sdy - cov) / mse)
        .alias("uc_micro"),
    )


@register(
    "ts_sma_crossover_signals",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS TIMESTAMP) AS day,
               CAST(SUM(CAST(value * 100 AS DECIMAL(18,0))) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1
    ),
    w AS (
        SELECT day,
               CAST(SUM(cents) OVER (ORDER BY day
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS s3,
               CAST(COUNT(*) OVER (ORDER BY day
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS c3,
               CAST(SUM(cents) OVER (ORDER BY day
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS s10,
               CAST(COUNT(*) OVER (ORDER BY day
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS c10
        FROM daily
    ),
    d AS (
        SELECT day, 10 * s3 - 3 * s10 AS diff,
               lag(10 * s3 - 3 * s10) OVER (ORDER BY day) AS prev_diff
        FROM w WHERE c3 = 3 AND c10 = 10
    )
    SELECT CAST(CAST(day AS DATE) AS VARCHAR) AS day,
           CASE WHEN diff > 0 THEN 'golden' ELSE 'death' END AS direction,
           diff AS diff_scaled
    FROM d
    WHERE prev_diff IS NOT NULL
      AND ((prev_diff < 0 AND diff > 0) OR (prev_diff > 0 AND diff < 0))
    ORDER BY day
    """,
    doc="Moving-average crossover signals on daily revenue: days where "
        "the fast (3-day) SMA crosses the slow (10-day) SMA ('golden' "
        "up-cross / 'death' down-cross) — the canonical trend-turn "
        "detector of technical analysis and ops dashboards, "
        "complementing ts_changepoint_cusum (level shifts) with "
        "direction-of-trend events (window lengths sized to the "
        "30-day testdata span; the algebra is length-generic). "
        "ENTIRELY INTEGER: sign(SMA3 - SMA10) = sign(10*sum3 - "
        "3*sum10) because the window lengths are constants (x30 both "
        "sides clears the denominators), so no floating average is "
        "ever formed and both engines compare the identical BIGINT; "
        "both windows require their FULL history (COUNT = 3/10) so "
        "warm-up days can't emit phantom crossings. Plan: one (day) "
        "aggregate then three frames on the bounded day grid. Reference "
        "parity: extension surface (SURVEY.md §2.B time-series rows).",
)
def ts_sma_crossover_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").cast("timestamp").alias("day")
    ).agg(
        F.sum((F.col("value") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    )
    w3 = Window.orderBy("day").rowsBetween(-2, 0)
    w10 = Window.orderBy("day").rowsBetween(-9, 0)
    w = daily.select(
        "day",
        F.sum("cents").over(w3).cast("long").alias("s3"),
        F.count(F.lit(1)).over(w3).cast("long").alias("c3"),
        F.sum("cents").over(w10).cast("long").alias("s10"),
        F.count(F.lit(1)).over(w10).cast("long").alias("c10"),
    )
    diff = (10 * F.col("s3") - 3 * F.col("s10")).alias("diff")
    d = (
        w.where((F.col("c3") == 3) & (F.col("c10") == 10))
        .select("day", diff)
        .select(
            "day",
            "diff",
            F.lag("diff").over(Window.orderBy("day")).alias("prev_diff"),
        )
    )
    return (
        d.where(
            F.col("prev_diff").isNotNull()
            & (
                ((F.col("prev_diff") < 0) & (F.col("diff") > 0))
                | ((F.col("prev_diff") > 0) & (F.col("diff") < 0))
            )
        )
        .select(
            F.col("day").cast("date").cast("string").alias("day"),
            F.when(F.col("diff") > 0, "golden").otherwise("death").alias(
                "direction"
            ),
            F.col("diff").alias("diff_scaled"),
        )
        .orderBy("day")
    )


@register(
    "ts_tracking_signal_bias",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS TIMESTAMP) AS day,
               CAST(SUM(CAST(value * 100 AS DECIMAL(18,0))) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1
    ),
    e AS (
        SELECT day, cents - lag(cents, 7) OVER (ORDER BY day) AS err
        FROM daily
    ),
    c AS (
        SELECT day, err,
               CAST(SUM(err) OVER w AS BIGINT) AS cum_err,
               CAST(SUM(abs(err)) OVER w AS BIGINT) AS cum_abs,
               CAST(COUNT(*) OVER w AS BIGINT) AS n
        FROM e WHERE err IS NOT NULL
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(CAST(day AS DATE) AS VARCHAR) AS day,
           cum_err AS cum_err_cents,
           cum_abs AS cum_abs_cents,
           n,
           CASE WHEN cum_abs = 0 THEN NULL ELSE
           CAST(round(1000000.0 * cum_err * n / cum_abs) AS BIGINT)
           END AS tracking_signal_micro
    FROM c ORDER BY day
    """,
    doc="Forecast-bias tracking signal on the seasonal-naive baseline "
        "(same-weekday-last-week, the ts_theil_inequality_decomposition "
        "forecast): per day, cumulative signed error / cumulative MAD — "
        "the classic ops-forecasting control metric (|TS| > ~4 means the "
        "forecast is systematically biased and needs re-centering, the "
        "actionable half of what Theil's U_M only scores once). Errors "
        "are INTEGER cents, both cumulative sums are exact integer "
        "window folds, and the signal is one double ratio per day "
        "quantized to 1e-6 with a 0/0 NULL guard on both engines. Plan: "
        "one day aggregate, one 7-lag + two cumulative windows on the "
        "bounded day grid — O(scan) at any scale, day-domain state. "
        "Reference parity: extension surface (SURVEY.md §2.B "
        "time-series rows).",
)
def ts_tracking_signal_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").cast("timestamp").alias("day")
    ).agg(
        F.sum((F.col("value") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    )
    w7 = Window.orderBy("day")
    err = daily.select(
        "day",
        (F.col("cents") - F.lag("cents", 7).over(w7)).alias("err"),
    ).where(F.col("err").isNotNull())
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = err.select(
        "day",
        F.sum("err").over(wc).cast("long").alias("cum_err"),
        F.sum(F.abs(F.col("err"))).over(wc).cast("long").alias("cum_abs"),
        F.count(F.lit(1)).over(wc).cast("long").alias("n"),
    )
    return c.select(
        F.col("day").cast("date").cast("string").alias("day"),
        F.col("cum_err").alias("cum_err_cents"),
        F.col("cum_abs").alias("cum_abs_cents"),
        "n",
        F.when(
            F.col("cum_abs") != 0,
            F.round(
                F.lit(1_000_000.0) * F.col("cum_err") * F.col("n")
                / F.col("cum_abs")
            ).cast("long"),
        ).alias("tracking_signal_micro"),
    ).orderBy("day")


@register(
    "ts_squared_return_acf",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS DATE) AS d,
               CAST(SUM(CAST(value * 100 AS DECIMAL(18,0))) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1
    ),
    sq AS (
        SELECT d,
               (cents - lag(cents) OVER (ORDER BY d))
               * (cents - lag(cents) OVER (ORDER BY d)) AS s
        FROM daily
    ),
    sq2 AS (SELECT d, s FROM sq WHERE s IS NOT NULL),
    pairs AS (
        SELECT l.lag AS lag, a.s AS x, b.s AS y
        FROM sq2 a
        CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS lag) l
        JOIN sq2 b ON b.d = a.d + CAST(l.lag AS INTEGER)
    ),
    m AS (
        SELECT lag,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
           CASE WHEN n_pairs * sxx - sx * sx = 0
                  OR n_pairs * syy - sy * sy = 0 THEN NULL ELSE
           round((CAST(n_pairs * sxy - sx * sy AS DOUBLE))
                 / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                        * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
           END AS acf_sq
    FROM m ORDER BY lag
    """,
    doc="Volatility-clustering audit: autocorrelation of SQUARED daily "
        "revenue returns at lags 1-5 — the standard ARCH-effect "
        "diagnostic (Engle): raw returns may be white (ts_acf_daily, "
        "ts_ljung_box_whiteness) while their squares stay correlated, "
        "meaning variance arrives in bursts and any fixed-width anomaly "
        "band (ts_anomaly_mad, ts_xmr_control_chart) will alternately "
        "over- and under-alarm. Returns are integer cent differences, "
        "squares are exact BIGINT, all five lag-pair moment sets are "
        "exact HUGEINT/DECIMAL(38,0) sums, and each ACF value is one "
        "guarded double expression quantized to 1e-6 (degenerate "
        "variance -> NULL on both engines). Plan: one day aggregate, "
        "one lag window, a 5-lag pair join on the bounded day grid, "
        "one 5-row moment aggregate. Reference parity: extension "
        "surface (SURVEY.md §2.B time-series rows).",
)
def ts_squared_return_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum((F.col("value") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    )
    diff = (F.col("cents") - F.lag("cents").over(Window.orderBy("d")))
    sq = (
        daily.select("d", (diff * diff).alias("s"))
        .where(F.col("s").isNotNull())
    )
    lags = spark.range(1, 6).select(F.col("id").cast("int").alias("lag"))
    b = sq.select(F.col("d").alias("bd"), F.col("s").alias("y"))
    pairs = (
        sq.crossJoin(F.broadcast(lags))
        .join(b, F.expr("bd = date_add(d, lag)"))
        .select("lag", F.col("s").alias("x"), "y")
    )
    d38 = "decimal(38,0)"
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("x").cast(d38)).cast(d38).alias("sx"),
        F.sum(F.col("y").cast(d38)).cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).cast(d38).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).cast(d38).alias("syy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).cast(d38).alias("sxy"),
    )
    vx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        F.col("lag").cast("long").alias("lag"),
        "n_pairs",
        F.when(
            (vx != 0) & (vy != 0),
            F.round(
                cov.cast("double")
                / F.sqrt(vx.cast("double") * vy.cast("double")),
                6,
            ),
        ).alias("acf_sq"),
    ).orderBy("lag")


@register(
    "ts_engle_granger_cointegration",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS DATE) AS d,
               event_type,
               CAST(SUM(CAST(value * 100 AS DECIMAL(18,0))) AS BIGINT)
                   AS cents
        FROM events WHERE event_type IN ('purchase', 'view')
        GROUP BY 1, 2
    ),
    xy AS (
        SELECT p.d, p.cents AS x, v.cents AS y
        FROM (SELECT d, cents FROM daily WHERE event_type = 'purchase') p
        JOIN (SELECT d, cents FROM daily WHERE event_type = 'view') v
          ON v.d = p.d
    ),
    full_m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        FROM xy
    ),
    lagged AS (
        SELECT lag(x) OVER (ORDER BY d) AS x1,
               lag(y) OVER (ORDER BY d) AS y1,
               x AS x0, y AS y0
        FROM xy
    ),
    pair_m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS m,
               CAST(SUM(CAST(x1 AS HUGEINT)) AS HUGEINT) AS px1,
               CAST(SUM(CAST(y1 AS HUGEINT)) AS HUGEINT) AS py1,
               CAST(SUM(CAST(x0 AS HUGEINT)) AS HUGEINT) AS px0,
               CAST(SUM(CAST(y0 AS HUGEINT)) AS HUGEINT) AS py0,
               CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS px1x1,
               CAST(SUM(CAST(y1 AS HUGEINT) * y1) AS HUGEINT) AS py1y1,
               CAST(SUM(CAST(x0 AS HUGEINT) * x0) AS HUGEINT) AS px0x0,
               CAST(SUM(CAST(y0 AS HUGEINT) * y0) AS HUGEINT) AS py0y0,
               CAST(SUM(CAST(x1 AS HUGEINT) * y1) AS HUGEINT) AS px1y1,
               CAST(SUM(CAST(x0 AS HUGEINT) * y0) AS HUGEINT) AS px0y0,
               CAST(SUM(CAST(y1 AS HUGEINT) * y0) AS HUGEINT) AS py1y0,
               CAST(SUM(CAST(x1 AS HUGEINT) * x0) AS HUGEINT) AS px1x0,
               CAST(SUM(CAST(x1 AS HUGEINT) * y0) AS HUGEINT) AS px1y0,
               CAST(SUM(CAST(y1 AS HUGEINT) * x0) AS HUGEINT) AS py1x0
        FROM lagged WHERE x1 IS NOT NULL
    ),
    ols AS (
        SELECT *,
               CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
               (CAST(sy AS DOUBLE)
                - CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a
        FROM full_m CROSS JOIN pair_m
        WHERE n * sxx - sx * sx <> 0
    ),
    res AS (
        SELECT CAST(n AS BIGINT) AS n_days,
               CAST(m AS BIGINT) AS m_pairs,
               b, a, CAST(m AS DOUBLE) AS md,
               (CAST(py1y0 AS DOUBLE) - b * CAST(px1y0 AS DOUBLE)
                - b * CAST(py1x0 AS DOUBLE)
                + b * b * CAST(px1x0 AS DOUBLE))
               - a * (CAST(py1 AS DOUBLE) - b * CAST(px1 AS DOUBLE))
               - a * (CAST(py0 AS DOUBLE) - b * CAST(px0 AS DOUBLE))
               + CAST(m AS DOUBLE) * a * a AS s1,
               (CAST(py1y1 AS DOUBLE) - 2 * b * CAST(px1y1 AS DOUBLE)
                + b * b * CAST(px1x1 AS DOUBLE))
               - 2 * a * (CAST(py1 AS DOUBLE) - b * CAST(px1 AS DOUBLE))
               + CAST(m AS DOUBLE) * a * a AS s2,
               (CAST(py0y0 AS DOUBLE) - 2 * b * CAST(px0y0 AS DOUBLE)
                + b * b * CAST(px0x0 AS DOUBLE))
               - 2 * a * (CAST(py0 AS DOUBLE) - b * CAST(px0 AS DOUBLE))
               + CAST(m AS DOUBLE) * a * a AS s3
        FROM ols
    )
    SELECT n_days, m_pairs,
           CAST(round(1000000.0 * b) AS BIGINT) AS beta_micro,
           CAST(round(1000000.0 * a / 100.0) AS BIGINT) AS alpha_cents_x100,
           CASE WHEN s2 <= 0 THEN NULL ELSE
           round((s1 - s2) / s2, 9) END AS eg_gamma,
           CASE WHEN s2 <= 0
                  OR (s3 - 2 * s1 + s2) - (s1 - s2) * (s1 - s2) / s2 <= 0
                THEN NULL ELSE
           round(((s1 - s2) / s2)
                 / sqrt((((s3 - 2 * s1 + s2)
                          - (s1 - s2) * (s1 - s2) / s2)
                         / (md - 1)) / s2), 6) END AS eg_t_stat
    FROM res
    """,
    doc="Engle-Granger two-step cointegration test between the daily "
        "purchase- and view-revenue series: step 1 fits y ~ a + b x by "
        "OLS; step 2 runs a lag-0 Dickey-Fuller regression on the "
        "residuals (delta e_t = gamma e_{t-1}) — a strongly negative "
        "t-stat means the two series share a long-run equilibrium and "
        "their spread is mean-reverting, the workhorse pre-check for "
        "pairs monitoring/ratio dashboards that complements "
        "ts_cross_correlation (co-movement) and ts_dickey_fuller_lag0 "
        "(single-series stationarity). NUMERICALLY EXACT cross-engine: "
        "residuals are never materialized — every residual sum "
        "(S1 = sum e_{t-1}e_t, S2 = sum e^2_{t-1}, S3 = sum e^2_t) is "
        "expanded algebraically into 14 integer cross-moments of (x, y) "
        "over the lag-pair range (exact HUGEINT/DECIMAL(38,0) sums of "
        "cent values) combined with the OLS (a, b) doubles in an "
        "identical expression tree on both engines, so the value hash "
        "matches bit-for-bit; degenerate variance and non-positive RSS "
        "are NULL-guarded identically. Plan: one filtered day aggregate, "
        "one self-join on the bounded day grid, one lag window, two "
        "1-row moment folds — O(scan) at any scale. Reference parity: "
        "extension surface (SURVEY.md §2.B time-series rows).",
)
def ts_engle_granger_cointegration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.where(F.col("event_type").isin("purchase", "view"))
        .groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(
            F.sum((F.col("value") * 100).cast("decimal(18,0)"))
            .cast("long")
            .alias("cents")
        )
    )
    px = daily.where(F.col("event_type") == "purchase").select(
        "d", F.col("cents").alias("x")
    )
    pv = daily.where(F.col("event_type") == "view").select(
        F.col("d").alias("vd"), F.col("cents").alias("y")
    )
    xy = px.join(pv, F.col("d") == F.col("vd")).select("d", "x", "y")
    d38 = "decimal(38,0)"

    def s(c):
        return F.sum(F.col(c).cast(d38)).cast(d38)

    def sp(c1, c2):
        return F.sum(F.col(c1).cast(d38) * F.col(c2)).cast(d38)

    full_m = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        s("x").alias("sx"),
        s("y").alias("sy"),
        sp("x", "x").alias("sxx"),
        sp("x", "y").alias("sxy"),
    )
    w = Window.orderBy("d")
    lagged = xy.select(
        F.lag("x").over(w).alias("x1"),
        F.lag("y").over(w).alias("y1"),
        F.col("x").alias("x0"),
        F.col("y").alias("y0"),
    ).where(F.col("x1").isNotNull())
    pair_m = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        s("x1").alias("px1"),
        s("y1").alias("py1"),
        s("x0").alias("px0"),
        s("y0").alias("py0"),
        sp("x1", "x1").alias("px1x1"),
        sp("y1", "y1").alias("py1y1"),
        sp("x0", "x0").alias("px0x0"),
        sp("y0", "y0").alias("py0y0"),
        sp("x1", "y1").alias("px1y1"),
        sp("x0", "y0").alias("px0y0"),
        sp("y1", "y0").alias("py1y0"),
        sp("x1", "x0").alias("px1x0"),
        sp("x1", "y0").alias("px1y0"),
        sp("y1", "x0").alias("py1x0"),
    )
    j = full_m.crossJoin(F.broadcast(pair_m)).where(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) != 0
    )

    def dbl(expr):
        return expr.cast("double")

    b = dbl(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / dbl(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    a = (dbl(F.col("sy")) - b * dbl(F.col("sx"))) / dbl(F.col("n"))
    md = dbl(F.col("m"))
    su1 = dbl(F.col("py1")) - b * dbl(F.col("px1"))
    su0 = dbl(F.col("py0")) - b * dbl(F.col("px0"))
    s1 = (
        (dbl(F.col("py1y0")) - b * dbl(F.col("px1y0"))
         - b * dbl(F.col("py1x0")) + b * b * dbl(F.col("px1x0")))
        - a * su1 - a * su0 + md * a * a
    )
    s2 = (
        (dbl(F.col("py1y1")) - 2 * b * dbl(F.col("px1y1"))
         + b * b * dbl(F.col("px1x1")))
        - 2 * a * su1 + md * a * a
    )
    s3 = (
        (dbl(F.col("py0y0")) - 2 * b * dbl(F.col("px0y0"))
         + b * b * dbl(F.col("px0x0")))
        - 2 * a * su0 + md * a * a
    )
    gamma = (s1 - s2) / s2
    rss = (s3 - 2 * s1 + s2) - (s1 - s2) * (s1 - s2) / s2
    return j.select(
        F.col("n").alias("n_days"),
        F.col("m").alias("m_pairs"),
        F.round(F.lit(1_000_000.0) * b).cast("long").alias("beta_micro"),
        F.round(F.lit(1_000_000.0) * a / F.lit(100.0))
        .cast("long")
        .alias("alpha_cents_x100"),
        F.when(s2 > 0, F.round(gamma, 9)).alias("eg_gamma"),
        F.when(
            (s2 > 0) & (rss > 0),
            F.round(gamma / F.sqrt((rss / (md - 1)) / s2), 6),
        ).alias("eg_t_stat"),
    )


@register(
    "ts_page_hinkley_drift",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS TIMESTAMP) AS day,
               CAST(SUM(CAST(value * 100 AS DECIMAL(18,0))) AS BIGINT)
                   AS cents
        FROM daily_src GROUP BY 1
    ),
    seq AS (
        SELECT day, cents,
               CAST(SUM(cents) OVER w AS BIGINT) AS cum,
               CAST(COUNT(*) OVER w AS BIGINT) AS t
        FROM daily
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    dev AS (
        SELECT day, t,
               CAST(round(1000000.0 * (cents - CAST(cum AS DOUBLE) / t))
                    AS BIGINT) AS dev_micro
        FROM seq
    ),
    m AS (
        SELECT day, t,
               CAST(SUM(dev_micro) OVER w AS BIGINT) AS m_t
        FROM dev
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(CAST(day AS DATE) AS VARCHAR) AS day,
           CAST(t AS BIGINT) AS t,
           m_t AS m_t_micro,
           CAST(MIN(m_t) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS m_min_micro,
           m_t - CAST(MIN(m_t) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS ph_stat_micro
    FROM m ORDER BY day
    """.replace("daily_src", "events"),
    doc="Page-Hinkley drift statistic on daily revenue: per day, the "
        "cumulative deviation from the RUNNING mean M_t = sum(x_i - "
        "mean_i), its running minimum, and PH_t = M_t - min M — the "
        "sequential change detector streaming systems run where CUSUM "
        "(ts_changepoint_cusum, which tests against the GLOBAL mean) "
        "can't wait for the series to end; PH_t exceeding a lambda "
        "threshold is the classic upward-drift alarm. Each per-day "
        "deviation (a rational with denominator t) is quantized to "
        "1e-6 BEFORE the cumulative fold, so every window sum is an "
        "exact integer on both engines. Plan: one day aggregate + "
        "three cumulative windows on the bounded day grid — O(scan), "
        "day-domain state, trivially incremental. Reference parity: "
        "extension surface (SURVEY.md §2.B time-series rows).",
)
def ts_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").cast("timestamp").alias("day")
    ).agg(
        F.sum((F.col("value") * 100).cast("decimal(18,0)"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    seq = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w).cast("long").alias("cum"),
        F.count(F.lit(1)).over(w).cast("long").alias("t"),
    )
    dev = seq.select(
        "day",
        "t",
        F.round(
            F.lit(1_000_000.0)
            * (F.col("cents") - F.col("cum").cast("double") / F.col("t"))
        )
        .cast("long")
        .alias("dev_micro"),
    )
    m = dev.select(
        "day", "t", F.sum("dev_micro").over(w).cast("long").alias("m_t")
    )
    return m.select(
        F.col("day").cast("date").cast("string").alias("day"),
        "t",
        F.col("m_t").alias("m_t_micro"),
        F.min("m_t").over(w).cast("long").alias("m_min_micro"),
        (F.col("m_t") - F.min("m_t").over(w).cast("long")).alias(
            "ph_stat_micro"
        ),
    ).orderBy("day")
