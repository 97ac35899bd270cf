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

from pyspark.sql import DataFrame, SparkSession
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
        .withColumn("obs_ts", F.col("ts"))
    )
    out = asof_join(
        grid,
        obs,
        left_key="user_id",
        right_key="user_id",
        left_ts="grid_ts",
        right_ts="ts",
        payload_cols=["locf_value", "obs_ts"],
    )
    return out.select(
        "user_id",
        "grid_ts",
        "locf_value",
        (F.unix_timestamp("grid_ts") - F.unix_timestamp("obs_ts"))
        .cast("long")
        .alias("staleness_s"),
    )
