"""SQL front door: run ANSI SQL directly against the engine's tables.

The reference exposes no query language (SURVEY.md §3 — five fixed native-SQL
strings); the extension surface is DataFrame-first, but a user migrating from
any SQL system should be able to point a query at the same tables. This is a
thin veneer: `register_views` binds each parquet table as a temp view and
`sql` hands the text to Spark SQL — Catalyst parses/optimizes identically to
the DataFrame path, so every scale property in SCALE.md (pushdown, pruning,
broadcast, AQE) applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wal_consumer_spark.sources.tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Bind every engine table as a temp view (optionally suffixed, for
    comparing scale factors side by side in one session)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"{name}{suffix}")


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register views for `sf_dir` and run `query`."""
    register_views(spark, sf_dir)
    return spark.sql(query)
