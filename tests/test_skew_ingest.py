"""Salted-join equivalence and compacted-write layout tests (SCALE.md §2/§3
tooling)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wal_consumer_spark.operators.skew import salted_count_per_key, salted_join
from wal_consumer_spark.sources.ingest import write_compacted
from wal_consumer_spark.sources.tables import load_table


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed("l_orderkey", "k")
    o = load_table(spark, SF_SMOKE, "orders").withColumnRenamed("o_orderkey", "k")
    plain = li.join(o, "k").select("k", "l_linenumber", "o_totalprice")
    salted = salted_join(li, o, "k", salt_buckets=8).select(
        "k", "l_linenumber", "o_totalprice"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_count_matches_plain_count(spark):
    e = load_table(spark, SF_SMOKE, "events")
    plain = {
        (r.event_type, r.n)
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {(r.event_type, r.n) for r in salted_count_per_key(e, "event_type").collect()}
    assert salted == plain


def test_write_compacted_bounded_files(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    out = str(tmp_path / "compact")
    write_compacted(li, out, target_file_mb=256)
    files = glob.glob(f"{out}/*.parquet")
    # sub-256MB input compacts to a single file
    assert len(files) == 1
    assert spark.read.parquet(out).count() == li.count()


def test_write_compacted_partitioned_layout(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    out = str(tmp_path / "by_flag")
    write_compacted(li, out, partition_by=["l_returnflag"], target_file_mb=256)
    # one directory per value, few files per directory (no task x partition
    # explosion), and the data survives partition-column round-trip
    dirs = sorted(p.split("=")[-1] for p in glob.glob(f"{out}/l_returnflag=*"))
    assert dirs == ["A", "N", "R"]
    for d in glob.glob(f"{out}/l_returnflag=*"):
        assert len(glob.glob(f"{d}/*.parquet")) <= 2
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    # partition pruning applies on the partition column
    plan = (
        back.filter(F.col("l_returnflag") == "R")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan


def test_salted_join_rejects_right_preserving_modes(spark):
    """right/full outer would duplicate unmatched right rows once per salt
    replica — salted_join refuses instead of silently over-counting."""
    import pytest

    df = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="left-preserving"):
            salted_join(df, df, "k", how=how)
