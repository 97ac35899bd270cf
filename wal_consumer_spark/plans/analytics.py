"""Event-sequence analytics: cohort retention and funnel conversion — the
two canonical product-analytics shapes over an event stream (extension
surface; the reference consumes WAL events one at a time and has no
event-time analytics, SURVEY.md §2.A).

Both queries shuffle on ``user_id`` once and reuse that partitioning for
every later step, so cost is one narrow hash shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wal_consumer_spark.plans.registry import register
from wal_consumer_spark.sources.tables import load_table


@register(
    "analytics_cohort_retention",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        FROM events
    ),
    f AS (
        SELECT user_id, MIN(d) AS cohort_day FROM act GROUP BY user_id
    )
    SELECT CAST(f.cohort_day AS TIMESTAMP) AS cohort_day,
           CAST(datediff('day', f.cohort_day, a.d) AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM act a JOIN f ON a.user_id = f.user_id
    GROUP BY f.cohort_day, datediff('day', f.cohort_day, a.d)
    """,
    doc="Cohort retention triangle: each user is cohorted by their first "
        "active day; n_users counts how many of each cohort were active "
        "again N days later. Plan: dedupe (user, day) -> per-user min -> "
        "self-join on user_id -> (cohort, offset) count-distinct. The "
        "dedupe, the min, and the join all share the user_id hash "
        "partitioning, so the whole query is ONE wide shuffle plus a "
        "final small aggregation (output is bounded by days^2/2, "
        "independent of event volume).",
)
def analytics_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    act = e.distinct()
    firsts = act.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        act.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_day").cast("timestamp").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "analytics_funnel_conversion",
    oracle="""
    WITH s AS (
        SELECT user_id,
               string_agg(event_type, ','
                          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS seq
        FROM events GROUP BY user_id
    )
    SELECT CASE
               WHEN regexp_matches(seq, 'view.*click.*purchase') THEN 3
               WHEN regexp_matches(seq, 'view.*click') THEN 2
               WHEN seq LIKE '%view%' THEN 1
               ELSE 0
           END AS funnel_stage,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM s GROUP BY 1
    """,
    doc="Funnel conversion (view -> click -> purchase as an ordered "
        "subsequence of each user's event stream): collect the per-user "
        "type sequence in (ts, event_id) order — deterministic tie-break — "
        "and classify the deepest funnel stage reached with subsequence "
        "regexes (MATCH_RECOGNIZE-lite). One user_id shuffle; the collected "
        "sequence is bounded by per-user activity, the classic hot-user "
        "skew point — a per-user event cap (e.g. first 10k by time) slots "
        "in as a window filter before the collect if the corpus has "
        "pathological users.",
)
def analytics_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s.event_type,
        ),
        ",",
    )
    per_user = e.groupBy("user_id").agg(seq.alias("seq"))
    stage = (
        F.when(F.col("seq").rlike("view.*click.*purchase"), F.lit(3))
        .when(F.col("seq").rlike("view.*click"), F.lit(2))
        .when(F.col("seq").contains("view"), F.lit(1))
        .otherwise(F.lit(0))
    )
    return (
        per_user.select(stage.alias("funnel_stage"))
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
