"""Source formats (SURVEY.md §2.B sources): CSV / JSON scans with explicit
schemas, plus plan-level checks that the parquet scans get predicate pushdown
and column pruning (the 'free Catalyst rewrites' claim of SURVEY.md §4.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wal_consumer_spark.sources.tables import load_table, read_csv, read_json

ORDERS_SCHEMA = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
    "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
)


def _orders_sample(spark):
    return load_table(spark, SF_SMOKE, "orders").orderBy("o_orderkey").limit(200)


def test_csv_roundtrip(spark, tmp_path):
    path = str(tmp_path / "orders_csv")
    orig = _orders_sample(spark)
    orig.write.option("header", True).csv(path)
    back = read_csv(
        spark, path, ORDERS_SCHEMA, timestampFormat="yyyy-MM-dd'T'HH:mm:ss.SSS"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))


def test_json_roundtrip(spark, tmp_path):
    path = str(tmp_path / "orders_json")
    orig = _orders_sample(spark)
    orig.write.json(path)
    back = read_json(spark, path, ORDERS_SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from wal_consumer_spark.sources.tables import read_orc

    path = str(tmp_path / "orders_orc")
    orig = _orders_sample(spark)
    orig.write.orc(path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))
    # same free Catalyst rewrites as parquet: pushdown + pruning on ORC scans
    q = read_orc(spark, path).filter(F.col("o_orderkey") < 50).select("o_orderkey")
    scan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,50)]" in scan, scan[:1500]
    assert "ReadSchema: struct<o_orderkey:bigint>" in scan, scan[:1500]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Files written under an evolving schema read as one table: columns
    absent from older files are null, and the merged schema is the union —
    the add-a-column-without-rewriting-history path for long-lived tables."""
    from wal_consumer_spark.sources.tables import read_parquet_evolving

    v1 = str(tmp_path / "t" / "batch=1")
    v2 = str(tmp_path / "t" / "batch=2")
    spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, name STRING") \
        .write.parquet(v1)
    spark.createDataFrame(
        [(3, "c", 9.5)], "id BIGINT, name STRING, score DOUBLE"
    ).write.parquet(v2)
    back = read_parquet_evolving(spark, v1, v2)
    assert set(back.columns) == {"id", "name", "score"}
    rows = sorted((r.id, r.name, r.score) for r in back.collect())
    assert rows == [(1, "a", None), (2, "b", None), (3, "c", 9.5)]
    # without mergeSchema the planner picks one footer and may drop the
    # new column — the helper exists so callers opt in explicitly
    one = read_parquet_evolving(spark, v1, v2, merge_schema=False)
    assert set(one.columns) <= {"id", "name", "score"}


def test_json_missing_fields_are_null(spark, tmp_path):
    path = str(tmp_path / "sparse_json")
    spark.createDataFrame([("{\"a\": 1}",), ("{\"a\": 2, \"b\": \"x\"}",)], "v STRING") \
        .write.text(path)
    back = read_json(spark, path, "a BIGINT, b STRING, missing DOUBLE")
    rows = sorted((r.a, r.b, r.missing) for r in back.collect())
    assert rows == [(1, None, None), (2, "x", None)]


def test_parquet_filter_pushdown_and_pruning(spark):
    """The scan node must carry PushedFilters and a pruned ReadSchema — a
    2-column projection with a filter may not read all 11 lineitem columns."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    plan = (
        li.filter(F.col("l_quantity") > 40)
        .select("l_orderkey", "l_quantity")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema  # pruned


def test_broadcast_join_in_plan(spark):
    """Dimension joins must be broadcast (no shuffle of the fact side for
    the dim join) — q5's physical plan contains BroadcastHashJoin and no
    SortMergeJoin for the nation/region joins."""
    from wal_consumer_spark.plans import all_specs

    df = all_specs()["q5_region_revenue"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_sql_front_door_matches_dataframe(spark):
    """Raw ANSI SQL over registered views returns the same rows as the
    DataFrame formulation (both compile to the same Catalyst plan)."""
    from tests.conftest import SF_SMOKE as _SF
    from wal_consumer_spark.plans import all_specs
    from wal_consumer_spark.sqlapi import sql

    got = sql(
        spark,
        _SF,
        """
        SELECT c_mktsegment,
               COUNT(DISTINCT c_nationkey) AS n_nations,
               COUNT(*) AS n_customers
        FROM customer GROUP BY c_mktsegment
        """,
    )
    want = all_specs()["agg_count_distinct"].spark(spark, _SF)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_malformed_json_rows_are_null_not_fatal(spark):
    """from_json is PERMISSIVE by default: malformed payloads decode to NULL
    instead of failing the job — at 100 TB a handful of corrupt records must
    never kill a pipeline; they surface as a filterable NULL column."""
    df = spark.createDataFrame(
        [(1, '{"a": 1}'), (2, "not json"), (3, None), (4, '{"a": "x"}')],
        "id LONG, payload STRING",
    )
    parsed = df.select(
        "id", F.from_json("payload", "a INT").alias("p")
    ).select("id", F.col("p.a").alias("a"))
    got = {r.id: r.a for r in parsed.collect()}
    assert got == {1: 1, 2: None, 3: None, 4: None}


def test_read_text_lines_and_whole(spark, tmp_path):
    """read_text: line mode yields one row per line across files; wholetext
    yields one row per file preserving newlines."""
    from wal_consumer_spark.sources.tables import read_text

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("alpha\nbeta\n")
    (d / "b.txt").write_text("gamma\n")

    lines = read_text(spark, str(d))
    assert sorted(r["value"] for r in lines.collect()) == ["alpha", "beta", "gamma"]

    whole = read_text(spark, str(d), whole=True)
    assert sorted(r["value"] for r in whole.collect()) == ["alpha\nbeta\n", "gamma\n"]


def test_read_binary_files_with_glob(spark, tmp_path):
    """read_binary_files: one row per file with exact bytes; pathGlobFilter
    prunes non-matching files at listing time; the content column feeds the
    multimodal byte-feature kernel unchanged."""
    from pyspark.sql import functions as F

    from wal_consumer_spark.sources.tables import read_binary_files

    d = tmp_path / "media"
    d.mkdir()
    payload = bytes(range(256))
    (d / "x.img").write_bytes(payload)
    (d / "y.img").write_bytes(b"\x00\x01")
    (d / "skip.txt").write_bytes(b"nope")

    df = read_binary_files(spark, str(d), glob="*.img")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"x.img", "y.img"}
    assert bytes(rows["x.img"]["content"]) == payload
    assert rows["x.img"]["length"] == 256

    # plumbs into byte-level feature extraction (no decode needed)
    feats = df.select(
        F.col("path"),
        F.length("content").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("digest"),
    ).collect()
    assert {f["n_bytes"] for f in feats} == {256, 2}
