"""Event-time window surface (SURVEY.md §2.B "Streaming"): tumbling /
sliding / session windows over `events`. Run here in batch mode — the same
`window()` / `session_window()` expressions power the streaming queries in
wal_consumer_spark.streaming (Structured Streaming reuses the exact plan
with a watermark on ts) — which keeps them DuckDB-oracle-checkable.

Window starts are epoch-aligned, so the oracle reproduces them by flooring
epoch seconds; ts is compared µs-truncated on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wal_consumer_spark.plans._util import dsum
from wal_consumer_spark.plans.registry import register
from wal_consumer_spark.sources.tables import load_table

_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "stream_window_tumbling",
    oracle="""
    SELECT strftime(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) * 21600),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 6h event-time window aggregate (batch-mode window(); the "
        "streaming layer runs the identical expression with a watermark).",
)
def stream_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_window_sliding",
    oracle="""
    WITH expanded AS (
        SELECT e.*,
               to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) * 21600
                            - k.k * 21600) AS win_start
        FROM events e, (SELECT unnest([0, 1]) AS k) k
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM expanded GROUP BY 1
    """,
    doc="Sliding window 12h/6h: each event lands in 2 overlapping windows.",
)
def stream_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "12 hours", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format(F.col("w.start"), _FMT).alias("window_start"),
            "n_events",
            "n_users",
        )
    )


@register(
    "stream_session_window",
    oracle="""
    WITH ordered AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - lag(CAST(ts AS TIMESTAMP))
                           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                         > INTERVAL 30 MINUTE
                    OR lag(CAST(ts AS TIMESTAMP))
                       OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
    doc="Session window (30 min gap) per user; oracle replays it as a "
        "gaps-and-islands window computation.",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _FMT).alias("session_start"),
            F.date_format(F.col("w.end"), _FMT).alias("session_end"),
            "n_events",
        )
    )


@register(
    "stream_incremental_rollup",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total,
           CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) / COUNT(*) AS mean,
           CAST(MIN(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS lo,
           CAST(MAX(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS hi
    FROM events GROUP BY event_type
    """,
    doc="Incremental materialized-view maintenance (streaming/incremental.py):"
        " events are replayed in four id-range micro-batches, each reduced to "
        "mergeable partials (count/decimal-sum/min/max) and merged into the "
        "rollup state — O(|state|+|batch|) per step, history never rescanned. "
        "The oracle is the from-scratch GROUP BY: incremental == batch "
        "bit-for-bit because the decimal algebra is exact and associative.",
)
def stream_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.streaming.incremental import IncrementalRollup

    e = load_table(spark, sf_dir, "events")
    hi = e.agg(F.max("event_id")).collect()[0][0] or 0
    rollup = IncrementalRollup(["event_type"], "value", "decimal(20,2)")
    state = None
    cut = hi // 4 + 1
    for i in range(4):
        batch = e.filter(
            (F.col("event_id") >= i * cut) & (F.col("event_id") < (i + 1) * cut)
        )
        state = rollup.apply_batch(state, batch)
    return rollup.finish(state)
