"""Scalar expression surface (SURVEY.md §2.B "Scalar functions"): string,
date/time, math, conditional, array (incl. higher-order), map, JSON, casts,
explode/posexplode. All JVM-side built-ins — no Python UDFs in this module —
so every expression stays inside whole-stage codegen.

Cross-engine determinism notes:
- transcendentals (log/pow/sqrt) are rounded to 9 dp (libm vs java.lang.Math
  may differ in the last ulp);
- date outputs travel as 'yyyy-MM-dd' strings (pandas date-vs-timestamp
  canonicalisation differs between engines);
- double->int casts are avoided (Spark truncates, DuckDB rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from wal_consumer_spark.plans.registry import register
from wal_consumer_spark.sources.tables import load_table


@register(
    "scalar_regexp_funcs",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
               AS n_digit_runs,
           regexp_extract(text, '([0-9]+)', 1) AS first_num,
           CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT)
               AS n_vowel_runs,
           md5(regexp_replace(lower(text), '[aeiou]', '_', 'g'))
               AS devoweled_fp
    FROM documents
    """,
    doc="Regexp scalar family over the common RE2/Java subset: "
        "regexp_count (spelled len(regexp_extract_all(..)) in the "
        "oracle), group extraction, and global regexp_replace (Spark "
        "replaces all matches by default; DuckDB needs the explicit 'g' "
        "flag — the one semantic asymmetry this query certifies). The "
        "replaced text travels as an md5 fingerprint so the value hash "
        "stays engine-neutral. Pure codegen row-local expressions — "
        "regexps compile once per task, no shuffle, scan-resident at any "
        "scale. Reference parity: extension surface (SURVEY.md §2.B "
        "scalar rows).",
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(r"[0-9]+"))
        .cast("long")
        .alias("n_digit_runs"),
        F.regexp_extract(F.col("text"), r"([0-9]+)", 1).alias("first_num"),
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiou]+"))
        .cast("long")
        .alias("n_vowel_runs"),
        F.md5(
            F.regexp_replace(F.lower(F.col("text")), r"[aeiou]", "_")
        ).alias("devoweled_fp"),
    )


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_up,
           lower(p_type) AS type_lo,
           substring(p_name, 1, 8) AS name8,
           concat(p_brand, ':', p_type) AS brand_type,
           length(p_name) AS name_len,
           trim(concat('  ', p_name, ' ')) AS trimmed,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           replace(p_name, ' ', '_') AS name_us,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_type, '[aeiou]', '*') AS type_starred,
           (p_name LIKE '%a%') AS has_a,
           left(p_brand, 3) AS brand3,
           split_part(p_type, ' ', 1) AS type_head,
           reverse(p_brand) AS brand_rev
    FROM part WHERE p_partkey <= 500
    """,
    doc="String family: case, substring, concat, trim, pad, replace, regexp, "
        "like, initcap, split, reverse.",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_type", "[aeiou]", "*").alias("type_starred"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.substring("p_brand", 1, 3).alias("brand3"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.reverse("p_brand").alias("brand_rev"),
    )


@register(
    "scalar_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           CAST(dayofweek(o_orderdate) AS INTEGER) AS dow
    FROM orders WHERE o_orderkey <= 2000
    """,
    doc="Date/time family: extract parts, trunc, date arithmetic, datediff, "
        "epoch, format.",
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).cast("long").alias("days_to_y2k"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        (F.dayofweek("o_orderdate") - F.lit(1)).alias("dow"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS q_ceil,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS q_floor,
           round(power(l_quantity, 2.0), 9) AS q_sq,
           round(ln(l_extendedprice), 9) AS price_ln,
           round(log10(l_extendedprice), 9) AS price_log10,
           round(sqrt(l_quantity), 9) AS q_sqrt,
           CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
           mod(CAST(l_quantity AS BIGINT), 5) AS q_mod5,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem WHERE l_orderkey <= 1000
    """,
    doc="Math family: round, abs, ceil/floor, pow, ln/log10, sqrt, sign, mod, "
        "greatest/least.",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7.0).alias("q_ceil"),
        F.floor(F.col("l_quantity") / 7.0).alias("q_floor"),
        F.round(F.pow("l_quantity", F.lit(2.0)), 9).alias("q_sq"),
        F.round(F.log("l_extendedprice"), 9).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 9).alias("price_log10"),
        F.round(F.sqrt("l_quantity"), 9).alias("q_sqrt"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        (F.col("l_quantity").cast("bigint") % 5).alias("q_mod5"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_band,
           coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
           (c_acctbal BETWEEN 0 AND 1000) AS small_positive,
           (c_nationkey IN (1, 3, 5)) AS odd_nation,
           CASE WHEN c_acctbal IS NULL THEN -1.0 ELSE c_acctbal END AS bal_nn
    FROM customer
    """,
    doc="Conditional family: CASE/when-otherwise, coalesce, nullif, between, in.",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias("seg_masked"),
        F.col("c_acctbal").between(0, 1000).alias("small_positive"),
        F.col("c_nationkey").isin(1, 3, 5).alias("odd_nation"),
        F.when(F.col("c_acctbal").isNull(), -1.0).otherwise(F.col("c_acctbal")).alias("bal_nn"),
    )


@register(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           round(CAST(list_sum(embedding) AS DOUBLE), 6) AS vec_sum,
           round(CAST(list_aggregate(list_transform(embedding, x -> x * x), 'sum') AS DOUBLE), 6) AS sq_norm,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS vec_max,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings WHERE vec_id < 200
    """,
    doc="Array family incl. higher-order transform/filter/aggregate over the "
        "embedding column (the 100 TB path keeps these JVM-side — no UDF).",
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    dbl = lambda c: c.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(dbl(F.col("embedding").getItem(0)), 6).alias("first_elem"),
        F.round(
            F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")), 6
        ).alias("vec_sum"),
        F.round(
            F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")),
            6,
        ).alias("sq_norm"),
        F.round(dbl(F.array_max("embedding")), 6).alias("vec_max"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@register(
    "scalar_map_funcs",
    oracle="""
    SELECT event_id,
           concat('type=', event_type, ';user=', CAST(user_id AS VARCHAR)) AS tags_str,
           2 AS n_tags
    FROM events WHERE event_id < 1000
    """,
    doc="Map family: create_map + map_keys/values, surfaced as a "
        "deterministic string (map iteration order is engine-specific).",
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return e.select(
        "event_id",
        F.concat(
            F.lit("type="), F.element_at(m, "type"),
            F.lit(";user="), F.element_at(m, "user"),
        ).alias("tags_str"),
        F.size(F.map_keys(m)).cast("long").alias("n_tags"),
    )


@register(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           (CAST(json_extract(props, '$.k') AS INTEGER) > 50) AS k_gt50
    FROM events WHERE event_id < 2000
    """,
    doc="JSON family: get_json_object / from_json over events.props.",
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    parsed = F.from_json(F.col("props"), StructType([StructField("k", IntegerType())]))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") > 50).alias("k_gt50"),
    )


@register(
    "scalar_cast_matrix",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice AS VARCHAR) AS price_str,
           CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR) AS price_dec_str,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor_long,
           CAST(o_orderkey AS DOUBLE) AS key_dbl,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS date_str,
           CAST((o_totalprice > 200000) AS VARCHAR) AS flag_str
    FROM orders WHERE o_orderkey <= 1000
    """,
    doc="Cast matrix across long/double/decimal/string/date/bool "
        "(double->int avoided: Spark truncates, DuckDB rounds; floor() first).",
)
def scalar_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("string").alias("price_str"),
        F.col("o_totalprice").cast("decimal(14,2)").cast("string").alias("price_dec_str"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor_long"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("date_str"),
        F.when(F.col("o_totalprice") > 200000, "true").otherwise("false").alias("flag_str"),
    )


@register(
    "explode_posexplode",
    oracle="""
    SELECT p_partkey, s.word AS word, CAST(s.pos AS INTEGER) AS pos FROM (
        SELECT p_partkey,
               unnest(list_transform(string_split(p_type, ' '),
                                     (x, i) -> struct_pack(word := x, pos := i - 1))) AS s
        FROM part WHERE p_partkey <= 300
    )
    """,
    doc="Table-generating functions: posexplode of a split array.",
)
def explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.posexplode(F.split(F.col("p_type"), " ")).alias("pos", "word"),
    ).select("p_partkey", "word", "pos")


@register(
    "scalar_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS and_lo,
           o_orderkey | 4096 AS or_hi,
           xor(o_orderkey, 1023) AS xored,
           bit_count(o_orderkey) AS popcnt,
           o_orderkey << 2 AS shl,
           o_orderkey >> 3 AS shr
    FROM orders WHERE o_orderkey < 2000
    """,
    doc="Bitwise scalar family: and/or/xor, popcount, shifts — the hash/"
        "partition-bucket arithmetic primitives, all inside codegen.",
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and_lo"),
        k.bitwiseOR(F.lit(4096)).alias("or_hi"),
        k.bitwiseXOR(F.lit(1023)).alias("xored"),
        F.bit_count(k).alias("popcnt"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
    )


@register(
    "scalar_struct_funcs",
    oracle="""
    SELECT c_custkey,
           struct_extract({'name': c_name, 'nation': c_nationkey,
                           'bal_cents': CAST(round(c_acctbal * 100) AS BIGINT)},
                          'name') AS s_name,
           struct_extract(struct_extract(
               {'id': c_custkey,
                'geo': {'nation': c_nationkey, 'segment': c_mktsegment}},
               'geo'), 'segment') AS nested_segment,
           struct_extract({'a': c_nationkey, 'b': c_custkey}, 'a')
               + struct_extract({'a': c_nationkey, 'b': c_custkey}, 'b')
               AS sum_fields
    FROM customer WHERE c_custkey <= 200
    """,
    doc="Struct scalar family: named_struct construction, field extraction, "
        "two-level nesting — the building blocks of typed multimodal "
        "metadata columns (SURVEY.md §2.B). Output columns are the "
        "extracted flat fields so both engines compare value-for-value "
        "(struct rendering differs across engines; the ops are what is "
        "under test).",
)
def scalar_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    flat = F.struct(
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    nested = F.struct(
        F.col("c_custkey").alias("id"),
        F.struct(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        ).alias("geo"),
    )
    two = F.struct(F.col("c_nationkey").alias("a"), F.col("c_custkey").alias("b"))
    return c.select(
        "c_custkey",
        flat.getField("name").alias("s_name"),
        nested.getField("geo").getField("segment").alias("nested_segment"),
        (two.getField("a") + two.getField("b")).alias("sum_fields"),
    )


@register(
    "scalar_encoding_funcs",
    oracle="""
    SELECT o_orderkey,
           base64(CAST(o_orderpriority AS BLOB)) AS b64,
           CAST(o_orderstatus AS BLOB) = CAST('F' AS BLOB) AS status_is_f,
           md5(concat(CAST(o_orderkey AS VARCHAR), '|', o_orderpriority))
               AS row_fp,
           lower(hex(CAST(substr(o_orderpriority, 1, 2) AS BLOB))) AS hex2
    FROM orders WHERE o_orderkey % 97 = 0
    """,
    doc="Binary encoding scalar family: base64, string<->binary casts with "
        "binary equality, md5 row fingerprinting, hex encoding — the "
        "building blocks of payload fingerprints (the engine's CDC payload "
        "is BinaryType, WalEntity.java:38-39) and content-addressed dedup "
        "keys. All map-side codegen expressions; the modulo filter is "
        "pushed into the scan.",
)
def scalar_encoding_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    return o.select(
        "o_orderkey",
        F.base64(F.col("o_orderpriority").cast("binary")).alias("b64"),
        (
            F.col("o_orderstatus").cast("binary") == F.lit("F").cast("binary")
        ).alias("status_is_f"),
        F.md5(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit("|"),
                F.col("o_orderpriority"),
            )
        ).alias("row_fp"),
        F.lower(F.hex(F.substring("o_orderpriority", 1, 2).cast("binary"))).alias(
            "hex2"
        ),
    )


@register(
    "scalar_calendar_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(CAST(o_orderdate AS TIMESTAMP)) AS TIMESTAMP)
               AS month_end,
           CAST(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 1 MONTH
                AS TIMESTAMP) AS next_month,
           CAST(quarter(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS qtr,
           CAST(date_trunc('quarter', CAST(o_orderdate AS TIMESTAMP))
                AS TIMESTAMP) AS quarter_start,
           CAST(datediff('day', CAST(o_orderdate AS TIMESTAMP),
                         last_day(CAST(o_orderdate AS TIMESTAMP)))
                AS INT) AS days_to_month_end
    FROM orders WHERE o_orderkey % 101 = 0
    """,
    doc="Calendar-arithmetic scalar family: month-end (leap-aware), "
        "add-a-month with end-of-month clamping (Spark add_months == SQL "
        "+ INTERVAL 1 MONTH — both clamp Jan 31 + 1mo to Feb 29, "
        "verified), quarter extraction/truncation, and days-to-month-end. "
        "All map-side codegen; the modulo filter is scan-resident. These "
        "are the fiscal-boundary building blocks the period-over-period "
        "and gap-fill queries assume. Reference parity: extension surface "
        "(SURVEY.md §2.B scalar date/time rows).",
)
def scalar_calendar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 101 == 0)
    d = F.col("o_orderdate").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.add_months(d, 1).cast("timestamp").alias("next_month"),
        F.quarter(d).cast("int").alias("qtr"),
        F.date_trunc("quarter", d).cast("timestamp").alias("quarter_start"),
        F.datediff(F.last_day(d), F.to_date(d)).cast("int").alias(
            "days_to_month_end"
        ),
    )


_TRY_FUNCS_SHARED_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(TRY_CAST(substring(c_name, 10) AS BIGINT)) AS BIGINT)
           AS n_name_parsed,
       CAST(SUM(TRY_CAST(substring(c_name, 10) AS BIGINT)) AS BIGINT)
           AS parsed_id_sum,
       CAST(COUNT(TRY_CAST(c_mktsegment AS INT)) AS BIGINT)
           AS n_segment_casts,
       CAST(COUNT(*) FILTER (WHERE TRY_CAST(c_mktsegment AS INT) IS NULL)
            AS BIGINT) AS n_segment_cast_nulls,
       CAST(COUNT(CAST(round(c_acctbal * 100) AS BIGINT)
                  / NULLIF(c_nationkey % 5, 0)) AS BIGINT)
           AS n_safe_divides
FROM customer
"""


@register(
    "scalar_try_funcs",
    oracle=_TRY_FUNCS_SHARED_SQL,
    doc="Error-tolerant scalar surface, one shared SQL text on both "
        "engines: TRY_CAST parses the numeric suffix of every c_name "
        "(all succeed — count and exact BIGINT sum prove value "
        "fidelity), TRY_CAST of an alphabetic enum to INT yields NULL "
        "on every row (never an error — the malformed-input contract "
        "ingestion pipelines rely on), and x / NULLIF(y, 0) is the "
        "portable safe-divide (rows where c_nationkey % 5 = 0 produce "
        "NULL, not a division error). This is the dirty-data row of "
        "the scalar-family conformance matrix: the engine must DEGRADE "
        "to NULL, identically to the oracle, rather than fail the job "
        "— at 100 TB a single unparseable cell must never kill a scan. "
        "Plan: ONE map-side conditional aggregate over a 4-column "
        "projection. Reference parity: extension surface (SURVEY.md "
        "§2.B scalar rows).",
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.sqlapi import sql

    return sql(spark, sf_dir, _TRY_FUNCS_SHARED_SQL)


@register(
    "scalar_null_three_valued_logic",
    oracle="""
    WITH vals AS (SELECT unnest([TRUE, FALSE, NULL]) AS v),
    pairs AS (SELECT a.v AS a, b.v AS b FROM vals a CROSS JOIN vals b),
    fmt AS (
        SELECT CASE WHEN a IS NULL THEN 'N' WHEN a THEN 'T' ELSE 'F' END
                   AS a_s,
               CASE WHEN b IS NULL THEN 'N' WHEN b THEN 'T' ELSE 'F' END
                   AS b_s,
               a, b
        FROM pairs
    )
    SELECT a_s, b_s,
           CASE WHEN (a AND b) IS NULL THEN 'N'
                WHEN (a AND b) THEN 'T' ELSE 'F' END AS and_r,
           CASE WHEN (a OR b) IS NULL THEN 'N'
                WHEN (a OR b) THEN 'T' ELSE 'F' END AS or_r,
           CASE WHEN (NOT a) IS NULL THEN 'N'
                WHEN (NOT a) THEN 'T' ELSE 'F' END AS not_a,
           CASE WHEN (a = b) IS NULL THEN 'N'
                WHEN (a = b) THEN 'T' ELSE 'F' END AS eq_r,
           CASE WHEN (a IS NOT DISTINCT FROM b) THEN 'T' ELSE 'F' END
               AS null_safe_eq_r,
           CASE WHEN coalesce(a, b) IS NULL THEN 'N'
                WHEN coalesce(a, b) THEN 'T' ELSE 'F' END AS coalesce_r
    FROM fmt ORDER BY a_s, b_s
    """,
    doc="ANSI three-valued-logic conformance matrix: the full 3x3 "
        "(TRUE/FALSE/NULL) truth table for AND, OR, NOT, null-unsafe "
        "equality, null-safe equality (Spark <=> == SQL IS NOT DISTINCT "
        "FROM), and COALESCE — the dialect surface where engines "
        "historically diverge (NULL AND FALSE = FALSE, NULL OR TRUE = "
        "TRUE are the short-circuit rows naive implementations get "
        "wrong) and where a silent mismatch corrupts every downstream "
        "filter. The scalar_* conformance-row convention "
        "(scalar_try_funcs, scalar_cast_matrix) extended to the logic "
        "kernel itself; results are rendered 'T'/'F'/'N' so NULL "
        "participates in the value hash. Plan: a 9-row literal lattice "
        "— constant at any scale. Reference parity: extension surface "
        "(SURVEY.md §2.B scalar rows).",
)
def scalar_null_three_valued_logic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    vals = spark.range(1).select(
        F.explode(
            F.array(F.lit(True), F.lit(False), F.lit(None).cast("boolean"))
        ).alias("v")
    )
    pairs = vals.select(F.col("v").alias("a")).crossJoin(
        F.broadcast(vals.select(F.col("v").alias("b")))
    )

    def s(col):
        return (
            F.when(col.isNull(), "N").when(col, "T").otherwise("F")
        )

    return pairs.select(
        s(F.col("a")).alias("a_s"),
        s(F.col("b")).alias("b_s"),
        s(F.col("a") & F.col("b")).alias("and_r"),
        s(F.col("a") | F.col("b")).alias("or_r"),
        s(~F.col("a")).alias("not_a"),
        s(F.col("a") == F.col("b")).alias("eq_r"),
        s(F.col("a").eqNullSafe(F.col("b"))).alias("null_safe_eq_r"),
        s(F.coalesce(F.col("a"), F.col("b"))).alias("coalesce_r"),
    ).orderBy("a_s", "b_s")
