"""Plan-shape evidence for the 100 TB design claims in SCALE.md: bucketed
co-located joins eliminate the shuffle entirely, and aggregations reuse join
partitioning instead of re-shuffling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wal_consumer_spark.sources.tables import load_table


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Writing both join sides bucketed+sorted by the join key lets the join
    run with zero Exchange nodes — the 100 TB recipe for repeated fact-fact
    joins (bucket once at ingest, join shuffle-free forever after)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bjt LOCATION '{tmp_path}/warehouse'")
    try:
        o = load_table(spark, SF_SMOKE, "orders")
        li = load_table(spark, SF_SMOKE, "lineitem")
        (
            o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable("bjt.orders_b")
        )
        (
            li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable("bjt.lineitem_b")
        )
        ob, lb = spark.table("bjt.orders_b"), spark.table("bjt.lineitem_b")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n")
        )
        # tiny test tables would broadcast; disable it to expose the
        # bucket-aligned join path a fact-fact join takes at scale
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # join itself introduces no shuffle (only the final 1-key agg may)
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

        # and the result is right
        expected = (
            li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))
    finally:
        spark.sql("DROP DATABASE IF EXISTS bjt CASCADE")


def test_groupby_reuses_join_partitioning(spark):
    """groupBy on a superset of the join key runs on the join's existing
    hash partitioning — no third shuffle (SCALE.md §3, measured claim)."""
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_suppkey")
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # exactly the two join-input exchanges; none between join and aggregate
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"unexpected extra shuffle:\n{plan}"


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """With AQE runtime filters enabled, a selective dim filter is compiled
    into a bloom filter that prunes the fact side BEFORE its shuffle — at
    100 TB this turns a full-fact shuffle into a ~selectivity-sized one.
    Thresholds are lowered so the tiny test tables qualify; at production
    sizes the defaults (10 MB creation side) trigger on real dims."""
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sel = o.filter(F.col("o_orderpriority") == "1-URGENT")
        joined = li.join(sel, li.l_orderkey == sel.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan or "might_contain" in plan, plan[:2000]
        assert joined.count() >= 1
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_embedding_near_dup_has_no_cross_join(spark):
    """The registered sim_embedding_near_dup runs the LSH-blocked candidate
    path: every join is a bucket equi-join — no CartesianProduct /
    BroadcastNestedLoopJoin anywhere in the physical plan (VERDICT.md r1,
    'What's wrong' #3)."""
    from wal_consumer_spark.plans import all_specs

    df = all_specs()["sim_embedding_near_dup"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_passage_dedup_shuffle_count(spark):
    """pipeline_passage_dedup is exactly two exchanges: the occurrence-rank
    window shuffles on passage text, the reassembly aggregate shuffles back
    on doc_id — no hidden third shuffle from the rebuild (the in-order
    concat is array_sort over collected structs, not a second window)."""
    from wal_consumer_spark.plans import all_specs

    df = all_specs()["pipeline_passage_dedup"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n_exchanges == 2, f"{n_exchanges} exchanges:\n{plan[:2000]}"


def test_contamination_score_single_corpus_pass(spark):
    """text_contamination_score scans `documents` exactly twice — once for
    the tiny eval side, once for the training corpus (n_shingles rides the
    exploded rows; no join-back rescan)."""
    from wal_consumer_spark.plans import all_specs

    df = all_specs()["text_contamination_score"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("documents.parquet")
    assert n_scans == 2, f"{n_scans} document scans:\n{plan[:2000]}"


def test_dq_constraint_checks_one_scan_per_range_table(spark):
    """dq_constraint_checks folds all range checks on a table into one
    aggregate via stack: lineitem appears exactly once in the plan, orders
    twice (the combined aggregate + the FK anti-join side)."""
    from wal_consumer_spark.plans import all_specs

    df = all_specs()["dq_constraint_checks"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 1, plan[:2000]
    assert plan.count("orders.parquet") == 2, plan[:2000]


def test_decontaminate_broadcasts_eval_shingles(spark):
    """pipeline_decontaminate's semi-join against the eval shingle set is a
    BroadcastHashJoin — the training corpus is never shuffled on shingles
    (SCALE.md §12: one corpus pass at any scale)."""
    from wal_consumer_spark.plans import all_specs

    df = all_specs()["pipeline_decontaminate"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # left outer against the broadcast eval set (the hit flag feeds one
    # groupBy; a semi-join couldn't carry the per-doc zero counts)
    assert "BroadcastHashJoin [shingle" in plan and "LeftOuter" in plan, plan[:2000]
    # the corpus side must not sort-merge on shingles; the only shingle
    # exchange allowed is the tiny eval-set dedup inside the broadcast
    # subtree (bounded by the benchmark's size, not the corpus's)
    assert "SortMergeJoin [shingle" not in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning(shingle") <= 1, plan[:2000]


def test_sequence_packing_has_no_global_window(spark):
    """pipeline_sequence_packing's running sum is partitioned by source
    shard — the plan must not contain a single-partition exchange (the
    global-window scale-killer SCALE.md §12 calls out)."""
    from wal_consumer_spark.plans import all_specs

    df = all_specs()["pipeline_sequence_packing"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan[:2000]
    assert "Window" in plan


def test_global_shuffle_uses_range_partitioned_sort(spark):
    """pipeline_global_shuffle's ORDER BY compiles to a range-partitioned
    sort (sampled boundaries, parallel) — not a single-partition sort."""
    from wal_consumer_spark.plans import all_specs

    df = all_specs()["pipeline_global_shuffle"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan[:2000]
    assert "Exchange SinglePartition" not in plan, plan[:2000]


def test_keyless_range_join_is_not_nested_loop(spark):
    """join_range_keyless_binned has no equi key in its *logical* condition,
    which naively plans as BroadcastNestedLoopJoin (O(n*m) comparisons). The
    binned formulation must surface a hash-joinable bin key: the physical
    plan carries a real equi join and no nested-loop/cartesian operator."""
    from wal_consumer_spark.plans import all_specs

    df = all_specs()["join_range_keyless_binned"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan[:2000]


def test_cohort_retention_single_scan_single_wide_shuffle(spark):
    """analytics_cohort_retention derives the cohort day with a window over
    the same user_id partitioning as the dedupe — one events scan, one wide
    exchange, no self-join (code-review r2: the join formulation scanned and
    shuffled the corpus twice while claiming one pass)."""
    from wal_consumer_spark.plans import all_specs

    df = all_specs()["analytics_cohort_retention"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_dynamic_partition_pruning_on_partitioned_ingest(spark, tmp_path):
    """Facts written through sources/ingest.py partitioned on the join key
    get DYNAMIC partition pruning when joined to a filtered dim: Catalyst
    injects a dynamicpruning subquery into the scan's PartitionFilters, so
    at 100 TB only the partitions matching the dim filter are read at all —
    runtime scan skipping, no manual predicate needed."""
    from pyspark.sql import functions as F

    from wal_consumer_spark.sources.ingest import write_compacted
    from wal_consumer_spark.sources.tables import load_table

    path = str(tmp_path / "orders_by_priority")
    orders = load_table(spark, SF_SMOKE, "orders")
    write_compacted(orders, path, partition_by=["o_orderpriority"])

    facts = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("1-URGENT", 1), ("2-HIGH", 2), ("3-MEDIUM", 3),
         ("4-NOT SPECIFIED", 4), ("5-LOW", 5)],
        "prio string, rank int",
    ).filter(F.col("rank") == 1)
    joined = facts.join(
        F.broadcast(dim), facts["o_orderpriority"] == dim["prio"]
    ).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:3000]
    # and the pruned result is correct
    rows = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
    expected = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    )
    assert rows == {"1-URGENT": expected}
