"""Event-sequence analytics: cohort retention and funnel conversion — the
two canonical product-analytics shapes over an event stream (extension
surface; the reference consumes WAL events one at a time and has no
event-time analytics, SURVEY.md §2.A).

Both queries shuffle on ``user_id`` once and reuse that partitioning for
every later step, so cost is one narrow hash shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
        "again N days later. Plan: ONE corpus scan, ONE wide shuffle — an "
        "explicit repartition(user_id) whose partitioning satisfies the "
        "(user_id, day) dedupe AND the min-over-user window (cohort day "
        "derived in-stream, no self-join / second scan), then a final "
        "aggregation over the bounded (cohort, offset) grid (<= days^2/2 "
        "groups, independent of event volume). Plan shape asserted in "
        "tests/test_scale_plans.py.",
)
def analytics_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    act = e.repartition("user_id").distinct()
    cohort = F.min("d").over(Window.partitionBy("user_id"))
    return (
        act.withColumn("cohort_day", cohort)
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


_PR_ITERS = 3
#: Iteration index after which `pr` is localCheckpointed every round. 0 =
#: from the first round; raised only if the checkpoint overhead ever
#: dominates at tiny iteration counts.
_PR_CHECKPOINT_AFTER = 0
_Q_INIT = 40_000_000_000  # 1/25 * 1e12, exact
_Q_TELEPORT = 6_000_000_000  # 0.15/25 * 1e12, exact


@register(
    "graph_pagerank",
    oracle="""
    WITH edges AS (
        SELECT a.n_nationkey AS u, b.n_nationkey AS v
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey
         AND a.n_nationkey <> b.n_nationkey
    ),
    deg AS (SELECT u, COUNT(*) AS d FROM edges GROUP BY u),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    p0 AS (SELECT node, CAST(40000000000 AS BIGINT) AS q FROM nodes),
    c1 AS (
        SELECT e.v AS node, SUM(p.q // g.d) AS contrib
        FROM edges e JOIN deg g ON g.u = e.u JOIN p0 p ON p.node = e.u
        GROUP BY e.v
    ),
    p1 AS (
        SELECT nodes.node,
               CAST(round(0.85 * CAST(COALESCE(c1.contrib, 0) AS DOUBLE)) AS BIGINT)
                   + 6000000000 AS q
        FROM nodes LEFT JOIN c1 ON c1.node = nodes.node
    ),
    c2 AS (
        SELECT e.v AS node, SUM(p.q // g.d) AS contrib
        FROM edges e JOIN deg g ON g.u = e.u JOIN p1 p ON p.node = e.u
        GROUP BY e.v
    ),
    p2 AS (
        SELECT nodes.node,
               CAST(round(0.85 * CAST(COALESCE(c2.contrib, 0) AS DOUBLE)) AS BIGINT)
                   + 6000000000 AS q
        FROM nodes LEFT JOIN c2 ON c2.node = nodes.node
    ),
    c3 AS (
        SELECT e.v AS node, SUM(p.q // g.d) AS contrib
        FROM edges e JOIN deg g ON g.u = e.u JOIN p2 p ON p.node = e.u
        GROUP BY e.v
    ),
    p3 AS (
        SELECT nodes.node,
               CAST(round(0.85 * CAST(COALESCE(c3.contrib, 0) AS DOUBLE)) AS BIGINT)
                   + 6000000000 AS q
        FROM nodes LEFT JOIN c3 ON c3.node = nodes.node
    )
    SELECT n.n_name, round(CAST(p3.q AS DOUBLE) / 1000000000000, 10) AS pagerank
    FROM p3 JOIN nation n ON n.n_nationkey = p3.node
    """,
    doc="PageRank (3 power iterations, damping 0.85) over the intra-region "
        "nation digraph, as repeated join+aggregate passes. Floating-point "
        "sums would drift with partition order across engines, so every "
        "iteration runs in FIXED-POINT: ranks live as exact 1e-12-unit "
        "BIGINTs, contributions use integer division by the node's COMPUTED "
        "out-degree (edges groupBy — no structural assumptions), and only "
        "the damping multiply touches (deterministic single-op) double "
        "arithmetic before re-quantizing. Nodes with no in-edges are kept "
        "via a left join against the full node set (teleport-only rank), so "
        "no rank row is silently dropped on arbitrary graphs. Same loop "
        "shape as connected components (operators/graph.py): per iteration "
        "one equi-join + one aggregation; the edge+degree frame is "
        "materialized ONCE before the loop (every iteration references it — "
        "without truncation the final plan nests the edge subtree per "
        "round) and `pr` is localCheckpointed each round past the lineage "
        "threshold, so an iterate-to-convergence run re-plans a constant-"
        "depth tree per round instead of a growing one (the Spark "
        "iterative-algorithm trap). The oracle unrolls the identical 3 "
        "iterations as chained CTEs.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    a = n.select(F.col("n_nationkey").alias("u"), F.col("n_regionkey").alias("ru"))
    b = n.select(F.col("n_nationkey").alias("v"), F.col("n_regionkey").alias("rv"))
    edges = a.join(b, (F.col("ru") == F.col("rv")) & (F.col("u") != F.col("v"))).select(
        "u", "v"
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # Loop-invariant join input, referenced by every iteration: materialize
    # once (localCheckpoint, like connected_components) instead of
    # recomputing the nation self-join + degree agg per round.
    ed = edges.join(deg, "u").localCheckpoint(eager=True)
    nodes = n.select(F.col("n_nationkey").alias("node"))
    pr = nodes.withColumn("q", F.lit(_Q_INIT).cast("long"))
    for i in range(_PR_ITERS):
        contrib = (
            ed.join(pr, ed["u"] == pr["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.expr("q div d")).alias("contrib"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.round(
                    0.85 * F.coalesce(F.col("contrib"), F.lit(0)).cast("double")
                ).cast("long")
                + F.lit(_Q_TELEPORT)
            ).alias("q"),
        )
        # Truncate pr's lineage each round past the threshold; the last
        # round is left lazy so the returned DataFrame still ends in a
        # normal plan the caller can compose/explain.
        if i >= _PR_CHECKPOINT_AFTER and i < _PR_ITERS - 1:
            pr = pr.localCheckpoint(eager=True)
    return pr.join(n, pr["node"] == n["n_nationkey"]).select(
        "n_name",
        F.round(F.col("q").cast("double") / 1_000_000_000_000, 10).alias("pagerank"),
    )


@register(
    "ml_feature_scaling",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(value AS DECIMAL(12,2))
                        * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
               MIN(value) AS lo,
               MAX(value) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.lo) / (s.hi - s.lo), 6) AS minmax_scaled,
           round((e.value - s.sx / s.n)
                 / sqrt((s.sxx - s.sx * s.sx / s.n) / (s.n - 1)), 6)
               AS zscore_scaled
    FROM events e JOIN stats s USING (event_type)
    WHERE s.hi > s.lo AND s.n > 1
    """,
    doc="Feature scaling as fit+transform: per-feature-group statistics "
        "(min/max + mean/std from exact decimal power sums) are FIT in one "
        "aggregation pass into a |groups|-row profile, then BROADCAST back "
        "onto the stream so the transform is a map-side scalar projection — "
        "the raw data is never shuffled. This is the scale-path shape "
        "win_zscore_outliers' doc points at: window statistics need the "
        "corpus partitioned per entity; a broadcast profile join does not. "
        "Groups with degenerate spread (hi == lo or n <= 1) are excluded.",
)
def ml_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = F.col("value").cast("decimal(12,2)")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d).cast("double").alias("sx"),
        F.sum(d * d).cast("double").alias("sxx"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    j = e.join(F.broadcast(stats), "event_type").filter(
        (F.col("hi") > F.col("lo")) & (F.col("n") > 1)
    )
    mean = F.col("sx") / F.col("n")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - F.lit(1))
    return j.select(
        "event_id",
        "event_type",
        F.round((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")), 6)
            .alias("minmax_scaled"),
        F.round((F.col("value") - mean) / F.sqrt(var), 6).alias("zscore_scaled"),
    )
