"""UDF surface (SURVEY.md §2.B "UDF surface"): scalar pandas UDF, grouped-map
applyInPandas, pandas grouped aggregate, mapInPandas table function, and a
row-at-a-time Python UDF (kept ONLY on a 5-row dimension — it is the
documented slow path; every hot-path UDF here is Arrow-batched).

Scale notes per query in the docstrings: Arrow batch transfer amortizes the
Python boundary, grouped-map shuffles once on the group key, and nothing
collects to the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

from wal_consumer_spark.plans.registry import register
from wal_consumer_spark.sources.tables import load_table


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT doc_id,
           CAST(length(lower(text)) -
                length(regexp_replace(lower(text), '[aeiou]', '', 'g')) AS BIGINT)
               AS n_vowels,
           round((length(lower(text)) -
                  length(regexp_replace(lower(text), '[aeiou]', '', 'g')))
                 / greatest(length(text), 1), 6) AS vowel_ratio
    FROM documents
    """,
    doc="Vectorized scalar pandas UDF (Arrow-batched): per-doc vowel count "
        "and ratio. One Python round-trip per ~10k-row Arrow batch, not per "
        "row — the 10-100x faster UDF path.",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("long")
    def n_vowels(s: pd.Series) -> pd.Series:
        return s.str.lower().str.count(r"[aeiou]").astype("int64")

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_vowels("text").alias("n_vowels"),
        F.round(
            n_vowels("text") / F.greatest(F.length("text").cast("long"), F.lit(1)), 6
        ).alias("vowel_ratio"),
    )


@register(
    "udf_grouped_map_zscore",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type)) /
                 stddev_samp(value) OVER (PARTITION BY event_type), 4) AS zscore
    FROM events
    """,
    doc="Grouped-map applyInPandas: z-score normalize `value` within each "
        "event_type. One shuffle on the group key; each group is one pandas "
        "frame (bounded by group size, not corpus size). Oracle = the window "
        "formulation of the same statistic.",
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)  # matches stddev_samp
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "zscore": ((pdf["value"] - mu) / sd).round(4),
            }
        )

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        zscore, "event_id long, event_type string, zscore double"
    )


@register(
    "udf_grouped_agg_median",
    oracle="""
    SELECT event_type,
           round(median(value), 6) AS median_value,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="Pandas grouped-aggregate UDF: exact per-group median (pandas "
        "interpolated median == DuckDB median — order-statistic, so no "
        "float-summation nondeterminism). At 100 TB prefer "
        "percentile_approx; this is the exact-UDAF surface demo.",
)
def udf_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf(DoubleType())
    def pd_median(v: pd.Series) -> float:
        return float(v.median())

    @pandas_udf("long")
    def pd_count(v: pd.Series) -> int:
        # Spark disallows mixing pandas and JVM aggregates in one agg, so
        # the row count rides the same Arrow exchange as the median.
        return int(v.size)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(pd_median("value"), 6).alias("median_value"),
        pd_count("value").alias("n"),
    )


@register(
    "udf_table_function_sentences",
    oracle="""
    SELECT doc_id,
           generate_subscripts(sents, 1) - 1 AS sent_idx,
           unnest(sents) AS sentence
    FROM (SELECT doc_id, string_split(text, '. ') AS sents FROM documents)
    """,
    doc="Table-function surface via mapInPandas: split each document into "
        "sentences, emitting a variable number of output rows per input row "
        "(Arrow-batched both directions; no driver involvement).",
)
def udf_table_function_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    def split_sentences(batches):
        for pdf in batches:
            out = pdf[["doc_id", "text"]].copy()
            out["sentence"] = out["text"].str.split(". ", regex=False)
            out = out.explode("sentence", ignore_index=True)
            out["sent_idx"] = out.groupby("doc_id").cumcount()
            yield out[["doc_id", "sent_idx", "sentence"]]

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(split_sentences, "doc_id long, sent_idx long, sentence string")


@register(
    "udf_row_scalar_dim",
    oracle="""
    SELECT r_regionkey, upper(r_name) || '#' || CAST(r_regionkey AS VARCHAR) AS region_tag
    FROM region
    """,
    doc="Row-at-a-time Python UDF — the documented SLOW path, so it is "
        "confined to the 5-row region dim (never a fact table): each row "
        "pays a pickle round-trip. Kept for API parity only.",
)
def udf_row_scalar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(StringType())
    def tag(name: str, key: int) -> str:
        return f"{name.upper()}#{key}"

    r = load_table(spark, sf_dir, "region")
    return r.select("r_regionkey", tag("r_name", "r_regionkey").alias("region_tag"))


@register(
    "udf_cogrouped_map",
    oracle="""
    WITH o AS (
        SELECT o_custkey AS custkey, COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    ),
    l AS (
        SELECT o_custkey AS custkey, COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey
    )
    SELECT COALESCE(o.custkey, l.custkey) AS custkey,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(n_items, 0) AS n_items
    FROM o FULL OUTER JOIN l USING (custkey)
    ORDER BY custkey
    """,
    doc="Cogrouped-map applyInPandas (the remaining UDF-surface API): the "
        "orders and order-joined lineitem sides cogroup on custkey and each "
        "(left_pdf, right_pdf) pair reduces in one pandas call. Both sides "
        "shuffle once on the cogroup key; each group's frames are bounded "
        "by group size, not corpus size. Oracle = the relational "
        "formulation (two aggregates full-outer-joined).",
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    def stats(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        key = left["custkey"].iloc[0] if len(left) else right["custkey"].iloc[0]
        return pd.DataFrame(
            {"custkey": [key], "n_orders": [len(left)], "n_items": [len(right)]}
        )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    items = li.join(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(F.col("o_custkey").alias("custkey"))
    return (
        o.groupBy("custkey")
        .cogroup(items.groupBy("custkey"))
        .applyInPandas(stats, "custkey long, n_orders long, n_items long")
        .orderBy("custkey")
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_micro
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="mapInArrow (the zero-copy tier of the Python UDF surface: raw "
        "pyarrow RecordBatches, no pandas conversion): computes exact "
        "discounted revenue in integer micro-cents per batch with pyarrow "
        "compute kernels, then aggregates JVM-side. Each batch is "
        "processed columnar-in/columnar-out — for numeric kernels this "
        "skips the pandas materialization cost that pandas_udf pays, the "
        "right tier for 100 TB feature extraction. The integer math "
        "(cents x basis points) is exact, so the Python boundary does not "
        "break cross-engine determinism. Reference parity: extension "
        "surface (SURVEY.md §2.B UDF rows).",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def rev_batches(batches):
        for batch in batches:
            price = pc.cast(
                pc.round(pc.multiply(batch.column("l_extendedprice"), 100)),
                pa.int64(),
            )
            disc = pc.cast(
                pc.round(pc.multiply(batch.column("l_discount"), 100)),
                pa.int64(),
            )
            rev = pc.multiply(price, pc.subtract(pa.scalar(100, pa.int64()), disc))
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_returnflag"), rev],
                ["l_returnflag", "revenue_micro"],
            )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    mapped = li.mapInArrow(
        rev_batches, "l_returnflag string, revenue_micro long"
    )
    return mapped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("revenue_micro").cast("long").alias("revenue_micro"),
    )


@register(
    "udf_pandas_scalar_iter",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT) * 3 + 7)
                AS BIGINT) AS score_sum,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    doc="Iterator-of-series pandas UDF (the init-amortized tier of the "
        "Python UDF surface, completing it alongside scalar pandas_udf / "
        "grouped-map / grouped-agg / table-function / cogrouped-map / "
        "mapInArrow / row UDF): the generator form receives ALL of a "
        "worker's Arrow batches through one invocation, so expensive "
        "one-time setup — in production a model or tokenizer load — "
        "happens once per Python worker instead of once per batch; here "
        "the 'model' is a pair of constants so the oracle can replay the "
        "scoring exactly. Value arithmetic is floor(x*100 + 0.5) on the "
        "positive domain — identical doubles and a pinned floor in "
        "pandas, Spark, and DuckDB (pandas' own round() is banker's and "
        "is deliberately NOT used). The rollup shuffles integer scores "
        "only. Reference parity: extension surface (SURVEY.md §2.B UDF "
        "rows).",
)
def udf_pandas_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType

    # functionType given explicitly: under `from __future__ import
    # annotations` the Iterator[pd.Series] hints are strings Spark's
    # signature sniffing cannot resolve in this scope
    @pandas_udf("long", PandasUDFType.SCALAR_ITER)
    def score(batches):
        # one-time per-worker "model load", amortized over every batch
        # this worker processes (the point of the iterator form)
        a, b = 3, 7
        for s in batches:
            cents = np.floor(s.to_numpy() * 100 + 0.5).astype("int64")
            yield pd.Series(cents * a + b)

    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_type", score(F.col("value")).alias("sc"))
        .groupBy("event_type")
        .agg(
            F.sum("sc").cast("long").alias("score_sum"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
