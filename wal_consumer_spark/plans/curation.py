"""Training-corpus curation queries beyond the basic text family
(SURVEY.md §2.B "LLM-data-pipeline extensions"): repetition scoring,
PII scrubbing, quantile-gated quality filtering, and sequence packing.

All pure Column expressions — no Python in any hot path — and every query
carries a DuckDB oracle replaying the identical rule, so the driver's
hash-match certifies them end-to-end.

Reference parity note: the reference (sahabpardaz/wal-consumer) has no text
processing at all (SURVEY.md §2.A "explicitly absent"); this module is
declared extension surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wal_consumer_spark.operators.broadcast import maybe_broadcast
from wal_consumer_spark.operators.partitioning import spread_small_input
from wal_consumer_spark.functions.text import lexicon_hits, tokens, word_shingles
from wal_consumer_spark.functions.text import let  # noqa: F401  (re-export convenience)
from wal_consumer_spark.plans.registry import register
from wal_consumer_spark.sources.tables import load_table

#: DuckDB fragment matching functions.text.tokens()
_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
#: DuckDB fragment matching word_shingles(k=2) (distinct per-doc bigrams)
_BIGRAMS = (
    "list_distinct(list_transform(generate_series(0, greatest(len({t}) - 2, 0)), "
    "i -> array_to_string(list_slice({t}, i + 1, i + 2), ' ')))"
).format(t=_TOKS)


# --------------------------------------------------------------------------
# Repetition / diversity signal
# --------------------------------------------------------------------------

@register(
    "text_repetition",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           greatest(len({_TOKS}) - 2, 0) + 1 AS n_bigrams,
           len({_BIGRAMS}) AS n_distinct_bigrams,
           round(len({_BIGRAMS}) / (greatest(len({_TOKS}) - 2, 0) + 1), 6)
               AS bigram_diversity,
           (len({_BIGRAMS}) / (greatest(len({_TOKS}) - 2, 0) + 1)) < 0.6
               AS is_repetitive
    FROM documents
    """,
    doc="Repetition quality signal: distinct-bigram / total-bigram ratio per "
        "document (the standard cheap proxy for boilerplate / degenerate "
        "generation). Entirely map-side — one pass, zero shuffles; at 100 TB "
        "this is a free co-resident stage of any curation scan.",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    n_tok = F.size(tok).cast("long")
    n_bi = (F.greatest(n_tok - 2, F.lit(0)) + 1).cast("long")
    n_dist = F.size(word_shingles(tok, 2)).cast("long")
    diversity = n_dist / n_bi
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_bi.alias("n_bigrams"),
        n_dist.alias("n_distinct_bigrams"),
        F.round(diversity, 6).alias("bigram_diversity"),
        (diversity < 0.6).alias("is_repetitive"),
    )


# --------------------------------------------------------------------------
# PII scrubbing
# --------------------------------------------------------------------------

#: redaction patterns (ASCII, valid in both Java regex and RE2, applied in
#: this exact order in both engines)
_RE_URL = r"https?://[^\s]+"
_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_PHONE = r"\b555-[0-9]{4}\b"


def _pii_sql() -> str:
    # synthetic-but-deterministic PII injected from doc_id: the driver corpus
    # is clean word soup, so the scrubber needs something to find; both
    # engines build the identical string.
    full = (
        "concat(text, ' contact user', CAST(doc_id AS VARCHAR), "
        "'@example.com see https://ex.example/p/', CAST(doc_id AS VARCHAR), "
        "' or call 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))"
    )
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace({full}, "
        f"'{_RE_URL}', '<URL>', 'g'), "
        f"'{_RE_EMAIL}', '<EMAIL>', 'g'), "
        f"'{_RE_PHONE}', '<PHONE>', 'g')"
    )
    return f"""
    SELECT doc_id,
           len(regexp_extract_all({full}, '{_RE_URL}')) AS n_urls,
           len(regexp_extract_all({full}, '{_RE_EMAIL}')) AS n_emails,
           len(regexp_extract_all({full}, '{_RE_PHONE}')) AS n_phones,
           length({scrub}) AS scrubbed_len,
           md5({scrub}) AS scrub_fp
    FROM documents
    """


@register(
    "text_pii_scrub",
    oracle=_pii_sql(),
    doc="PII scrubbing: URL / email / phone redaction with per-doc match "
        "counts and an md5 fingerprint of the scrubbed text (the fingerprint "
        "proves byte-identical redaction across engines). PII is injected "
        "deterministically from doc_id since the synthetic corpus is clean. "
        "Pure regexp expressions — map-side, zero shuffles at any scale.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    full = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com see https://ex.example/p/"),
        F.col("doc_id").cast("string"),
        F.lit(" or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(full, _RE_URL, "<URL>"), _RE_EMAIL, "<EMAIL>"
        ),
        _RE_PHONE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(full, F.lit(_RE_URL), F.lit(0))).cast("long").alias("n_urls"),
        F.size(F.regexp_extract_all(full, F.lit(_RE_EMAIL), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(full, F.lit(_RE_PHONE), F.lit(0))).cast("long").alias("n_phones"),
        F.length(scrub).cast("long").alias("scrubbed_len"),
        F.md5(scrub).alias("scrub_fp"),
    )


# --------------------------------------------------------------------------
# Quantile-gated quality filter
# --------------------------------------------------------------------------

_SCORE = f"(len(list_filter({_TOKS}, t -> list_contains(['the','and','of','to','in','is','a'], t))) / greatest(len({_TOKS}), 1))"


@register(
    "pipeline_quality_filter",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, source, {_SCORE} AS score FROM documents
    ),
    thr AS (
        SELECT lang, round(quantile_cont(score, 0.5), 9) AS med
        FROM scored GROUP BY lang
    )
    SELECT s.lang, s.source,
           COUNT(*) AS n_docs,
           CAST(count_if(round(s.score, 9) >= t.med) AS BIGINT) AS n_kept
    FROM scored s JOIN thr t USING (lang)
    GROUP BY s.lang, s.source
    ORDER BY s.lang, s.source
    """,
    doc="Quantile-gated quality filter: per-language median stopword-density "
        "score, keep docs at or above their language's median, report "
        "kept/total per (lang, source). The threshold side is O(#langs) and "
        "broadcast. Exact interpolated percentile here for oracle parity; at "
        "100 TB swap percentile -> approx_percentile(score, 0.5, 10000) — "
        "the exact aggregate buffers per-group values, the approx sketch is "
        "mergeable and bounded.",
)
def pipeline_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    score = lexicon_hits(tok, "en").cast("long") / F.greatest(
        F.size(tok).cast("long"), F.lit(1)
    )
    scored = d.select("doc_id", "lang", "source", score.alias("score"))
    thr = scored.groupBy("lang").agg(
        F.round(F.expr("percentile(score, 0.5)"), 9).alias("med")
    )
    return (
        scored.join(F.broadcast(thr), "lang")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.round(F.col("score"), 9) >= F.col("med")).alias("n_kept"),
        )
        .orderBy("lang", "source")
    )


# --------------------------------------------------------------------------
# Sequence packing (concat-then-chunk into fixed context windows)
# --------------------------------------------------------------------------

_PACK_CAP = 512


@register(
    "pipeline_length_bucketing",
    oracle=f"""
    SELECT (len({_TOKS}) // 32) * 32 AS bucket_lo,
           COUNT(*) AS n_docs,
           MIN(len({_TOKS})) AS min_tokens,
           MAX(len({_TOKS})) AS max_tokens,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS sum_tokens,
           CAST(SUM((len({_TOKS}) // 32) * 32 + 32 - len({_TOKS})) AS BIGINT)
               AS padding_tokens
    FROM documents
    WHERE text IS NOT NULL
    GROUP BY bucket_lo
    ORDER BY bucket_lo
    """,
    doc="Length bucketing for padded-batch inference: docs grouped into "
        "32-token-wide length buckets, reporting per-bucket doc count, "
        "token range, and the padding waste if each bucket pads to its "
        "ceiling — the standard pre-batching step that minimizes wasted "
        "compute when serving variable-length sequences. One map-side "
        "tokenize + one bounded aggregation (|buckets| = max_len/32 "
        "groups), no shuffle of the documents themselves.",
)
def pipeline_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.functions.text import let

    d = load_table(spark, sf_dir, "documents")
    # NULL text guard: Spark's size() returns -1 for NULL (legacy sizeOfNull)
    # while DuckDB's len(NULL) is NULL — a null-text doc would diverge the
    # engines (bucket 0 / n_tokens=-1 vs a NULL bucket). No generation of the
    # testdata ships null text today, but the filter makes both plans agree
    # if one ever does, and it pushes down to the parquet scan for free.
    return (
        d.where(F.col("text").isNotNull())
        .select(
            let(
                F.size(tokens(F.col("text"))),
                lambda n: F.struct(
                    ((n / 32).cast("long") * 32).alias("bucket_lo"),
                    n.alias("n_tokens"),
                ),
            ).alias("s")
        )
        .select(F.col("s.bucket_lo").alias("bucket_lo"), F.col("s.n_tokens").alias("n_tokens"))
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.sum(F.col("bucket_lo") + 32 - F.col("n_tokens")).cast("long").alias("padding_tokens"),
        )
        .orderBy("bucket_lo")
    )


@register(
    "pipeline_sequence_packing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, len({_TOKS}) AS n_tokens FROM documents
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tokens
        FROM toks
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor((cum_tokens - n_tokens) / {_PACK_CAP}) AS BIGINT) AS start_chunk,
           CAST(floor((cum_tokens - 1) / {_PACK_CAP}) AS BIGINT) AS end_chunk,
           CAST(floor((cum_tokens - 1) / {_PACK_CAP})
                - floor((cum_tokens - n_tokens) / {_PACK_CAP}) + 1 AS BIGINT) AS n_chunks
    FROM cum
    """,
    doc=f"Sequence packing for pretraining batches: concatenate each source "
        f"shard's docs in doc_id order and chunk into {_PACK_CAP}-token "
        f"context windows; per doc, the chunk span it lands in (standard "
        f"concat-then-chunk packing). The running sum is partitioned by "
        f"source — shard-local, so shards pack in parallel and no single "
        f"partition sees the whole corpus; at 100 TB shards are the "
        f"ingest-time file groups. Integer arithmetic only.",
)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens(F.col("text"))).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = d.select("doc_id", "source", n_tok.alias("n_tokens")).withColumn(
        "cum_tokens", F.sum("n_tokens").over(w)
    )
    start = F.floor((F.col("cum_tokens") - F.col("n_tokens")) / _PACK_CAP)
    end = F.floor((F.col("cum_tokens") - 1) / _PACK_CAP)
    return cum.select(
        "doc_id",
        "source",
        "n_tokens",
        start.cast("long").alias("start_chunk"),
        end.cast("long").alias("end_chunk"),
        (end - start + 1).cast("long").alias("n_chunks"),
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split
# --------------------------------------------------------------------------

def _split_hash_spark(key: str, salt: str) -> F.Column:
    """First 8 md5 hex chars of key||salt as a long, mod 100 — the same
    hash-gating primitive as agg_stratified_sample (plans/aggregates.py)."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.col(key).cast("string"), F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("long"),
        F.lit(100),
    )


_SPLIT_SALT = ":split42"
_SPLIT_SQL = (
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '{salt}'), 1, 8))::BIGINT % 100"
).format(salt=_SPLIT_SALT)


@register(
    "pipeline_train_split",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, lang, n_chars,
               CASE WHEN {_SPLIT_SQL} < 90 THEN 'train'
                    WHEN {_SPLIT_SQL} < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM assigned GROUP BY split, lang ORDER BY split, lang
    """,
    doc="Deterministic train/val/test split (90/5/5) by md5 hash-gating on "
        "doc_id: membership is a per-row scan-resident predicate — exactly "
        "reproducible across engines, re-runs, retries, and scale factors, "
        "with no RNG state and no shuffle to assign. The only shuffle is "
        "the audit aggregation.",
)
def pipeline_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = _split_hash_spark("doc_id", _SPLIT_SALT)
    split = (
        F.when(h < 90, "train").when(h < 95, "val").otherwise("test").alias("split")
    )
    return (
        d.select(split, "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split", "lang")
    )


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

_DECON_K = 5
_SHINGLES_K5 = (
    "list_distinct(list_transform(generate_series(0, greatest(len({t}) - {k}, 0)), "
    "i -> array_to_string(list_slice({t}, i + 1, i + {k}), ' ')))"
).format(t=_TOKS, k=_DECON_K)


#: shared SQL CTE prefix for decontamination-family oracles: the eval
#: shingle dictionary (docs 0-19) and the exploded training-corpus
#: shingles. BOTH engines derive their output from the exploded rows, so a
#: null-text doc (no tokens -> no shingle rows) is consistently absent
#: from both results — deriving one side from `documents` directly would
#: silently diverge on null text.
_DECON_CTES = f"""
    WITH ev AS (
        SELECT DISTINCT unnest({_SHINGLES_K5}) AS shingle
        FROM documents WHERE doc_id < 20
    ),
    ex AS (
        SELECT doc_id, unnest({_SHINGLES_K5}) AS shingle
        FROM documents WHERE doc_id >= 20
    )
"""


def _decon_frames(spark: SparkSession, sf_dir: str):
    """Shared Spark-side frames for the decontamination family: broadcast
    eval shingle dictionary (with hit flag) and exploded training-corpus
    shingles — one definition so the eval cutoff and shingle k can never
    desynchronize between the flag and the score query."""
    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(tokens(F.col("text")), _DECON_K)
    ev = (
        d.filter(F.col("doc_id") < 20)
        .select(F.explode(sh).alias("shingle"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    ex = d.filter(F.col("doc_id") >= 20).select(
        "doc_id", F.explode(sh).alias("shingle")
    )
    return ev, ex


@register(
    "pipeline_decontaminate",
    oracle=f"""
    {_DECON_CTES}
    SELECT doc_id,
           COUNT(*) FILTER (WHERE shingle IN (SELECT shingle FROM ev)) > 0
               AS contaminated
    FROM ex GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc=f"Benchmark decontamination: flag training docs sharing any distinct "
        f"{_DECON_K}-gram shingle with the eval set (docs 0-19 stand in for "
        f"a held-out benchmark). The eval shingle set is tiny and BROADCAST "
        f"— the corpus is ONE pass (broadcast left join carrying a hit flag "
        f"into a single per-doc aggregate), never shuffled on shingles. The "
        f"standard n-gram-overlap decontamination rule (GPT-3 appendix C / "
        f"PaLM style).",
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev, ex = _decon_frames(spark, sf_dir)
    return (
        ex.join(F.broadcast(ev), "shingle", "left")
        .groupBy("doc_id")
        .agg((F.count(F.col("__hit")) > 0).alias("contaminated"))
        .orderBy("doc_id")
    )


@register(
    "text_contamination_score",
    oracle=f"""
    {_DECON_CTES}
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           COUNT(*) FILTER (WHERE shingle IN (SELECT shingle FROM ev)) AS n_hits,
           round(COUNT(*) FILTER (WHERE shingle IN (SELECT shingle FROM ev))
                 / CAST(COUNT(*) AS DOUBLE), 6) AS overlap
    FROM ex GROUP BY doc_id
    """,
    doc=f"Graded contamination scoring: for each training doc, the fraction "
        f"of its distinct {_DECON_K}-gram shingles that appear in the eval "
        f"set (docs 0-19) — the quantitative companion to "
        f"pipeline_decontaminate's boolean flag, used to set an overlap "
        f"threshold instead of dropping on any single shared shingle. Same "
        f"scale shape: the eval shingle set is broadcast, both counters come "
        f"out of ONE per-doc aggregate over the exploded corpus (word_"
        f"shingles is distinct, so the exploded row count IS n_shingles), "
        f"and the score is an exact long/long division both engines compute "
        f"bit-identically.",
)
def text_contamination_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev, ex = _decon_frames(spark, sf_dir)
    return (
        ex.join(F.broadcast(ev), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_hits",
            F.round(
                F.col("n_hits") / F.col("n_shingles").cast("double"), 6
            ).alias("overlap"),
        )
    )


#: passage size (tokens) for passage-granular dedup
_PASSAGE_K = 16


@register(
    "pipeline_passage_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    p AS (
        SELECT doc_id, i AS pidx,
               array_to_string(list_slice(tk, i * {_PASSAGE_K} + 1,
                                          i * {_PASSAGE_K} + {_PASSAGE_K}), ' ') AS ptext
        FROM t, unnest(range(0, (len(tk) + {_PASSAGE_K} - 1) // {_PASSAGE_K})) AS u(i)
    ),
    d AS (
        SELECT *, row_number() OVER (PARTITION BY ptext ORDER BY doc_id, pidx) AS rn
        FROM p
    )
    SELECT doc_id,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE rn = 1) AS n_kept,
           COALESCE(string_agg(ptext, ' ' ORDER BY pidx) FILTER (WHERE rn = 1), '')
               AS kept_text
    FROM d GROUP BY doc_id
    """,
    doc=f"Passage-granular dedup (C4-style line dedup generalized to token "
        f"streams): each doc splits into consecutive {_PASSAGE_K}-token "
        f"passages; a passage repeated anywhere in the corpus survives only "
        f"at its first occurrence (ordered by doc_id, then position — a "
        f"deterministic window rank, not an arbitrary drop), and each doc "
        f"is reassembled from its surviving passages in order. Removes "
        f"boilerplate shared across documents without dropping whole docs. "
        f"Scale: one shuffle on passage text for the occurrence rank, one "
        f"shuffle back on doc_id for reassembly; the in-order rebuild is "
        f"array_sort over (position, text) structs — no order-dependent "
        f"collect.",
)
def pipeline_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    k = _PASSAGE_K
    passages = let(
        tokens(F.col("text")),
        lambda t: F.transform(
            F.sequence(
                F.lit(0),
                F.floor((F.size(t) + F.lit(k - 1)) / F.lit(k)).cast("int") - 1,
            ),
            lambda i: F.array_join(F.slice(t, i * k + 1, k), " "),
        ),
    )
    p = d.select("doc_id", F.posexplode(passages).alias("pidx", "ptext"))
    w = Window.partitionBy("ptext").orderBy("doc_id", "pidx")
    ranked = p.withColumn("keep", F.row_number().over(w) == 1)
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pidx", "ptext"))
                    )
                ),
                lambda s: s["ptext"],
            ),
            " ",
        ).alias("kept_text"),
    )


# --------------------------------------------------------------------------
# Global deterministic shuffle (training-order randomization)
# --------------------------------------------------------------------------

_SHUF_SALT = ":shuf42"


@register(
    "pipeline_global_shuffle",
    oracle=f"""
    SELECT doc_id,
           substring(md5(CAST(doc_id AS VARCHAR) || '{_SHUF_SALT}'), 1, 16) AS shuffle_key,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '{_SHUF_SALT}'), 1, 8))::BIGINT % 1024
               AS shard
    FROM documents
    ORDER BY shuffle_key, doc_id
    """,
    doc="Global deterministic training-order shuffle: sort the corpus by "
        "md5(doc_id||salt) — a reproducible pseudo-random permutation with "
        "no RNG state — plus a 1024-way shard assignment from the same "
        "hash. Spark executes the global sort as a range-partitioned sort "
        "(sampled range boundaries, fully parallel), NOT a single-partition "
        "window — the scalable formulation of 'shuffle the dataset' at "
        "100 TB. Re-shuffling per epoch = new salt.",
)
def pipeline_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    key = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SHUF_SALT))), 1, 16
    )
    shard = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SHUF_SALT))), 1, 8
            ),
            16,
            10,
        ).cast("long"),
        F.lit(1024),
    )
    return (
        d.select("doc_id", key.alias("shuffle_key"), shard.alias("shard"))
        .orderBy("shuffle_key", "doc_id")
    )


# --------------------------------------------------------------------------
# Domain-mixture rebalancing
# --------------------------------------------------------------------------

_MIX_SALT = ":mix42"
_MIX_HASH = (
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '{salt}'), 1, 8))::BIGINT % 1000000"
).format(salt=_MIX_SALT)


@register(
    "pipeline_domain_mixture",
    oracle=f"""
    WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT MIN(n) AS mn FROM counts),
    thr AS (
        SELECT lang, n,
               CAST(floor(CAST(mn AS DOUBLE) / n * 1000000) AS BIGINT) AS t
        FROM counts CROSS JOIN m
    )
    SELECT d.lang,
           CAST(MAX(thr.n) AS BIGINT) AS n_before,
           CAST(count_if({_MIX_HASH} < thr.t) AS BIGINT) AS n_kept
    FROM documents d JOIN thr USING (lang)
    GROUP BY d.lang ORDER BY d.lang
    """,
    doc="Domain-mixture rebalancing: per-language keep-fractions derived "
        "FROM the data (downsample every language toward the smallest "
        "one's count), applied as a deterministic md5 hash gate. The "
        "threshold table is O(#languages) and broadcast; membership is "
        "decided per-row at the scan with no RNG state, so the mixture is "
        "reproducible across engines, retries, and scale factors — the "
        "data-mixing primitive of pretraining corpora (weights are a "
        "config knob; equal-share here keeps the oracle self-contained).",
)
def pipeline_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    mn = counts.agg(F.min("n").alias("mn"))
    thr = counts.crossJoin(F.broadcast(mn)).select(
        "lang",
        "n",
        F.floor(F.col("mn").cast("double") / F.col("n") * 1000000)
        .cast("long")
        .alias("t"),
    )
    h = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_MIX_SALT))), 1, 8
            ),
            16,
            10,
        ).cast("long"),
        F.lit(1000000),
    )
    return (
        d.join(F.broadcast(thr), "lang")
        .groupBy("lang")
        .agg(
            F.max("n").alias("n_before"),
            F.count_if(h < F.col("t")).alias("n_kept"),
        )
        .orderBy("lang")
    )


@register(
    "text_token_entropy",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, term, COUNT(*) AS c
        FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
        GROUP BY doc_id, term
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           round(log2(CAST(SUM(c) AS DOUBLE))
                 - CAST(SUM(CAST(round(c * log2(CAST(c AS DOUBLE)) * 1000000)
                                 AS BIGINT)) AS DOUBLE)
                   / 1000000 / SUM(c), 6) AS entropy_bits
    FROM tf GROUP BY doc_id
    """,
    doc="Token-level Shannon entropy per document — the information-density "
        "quality signal (low-entropy docs are boilerplate/repetition; "
        "complements text_repetition's bigram-diversity ratio). Uses the "
        "decomposition H = log2(n) - (1/n)*sum(c*log2 c) so the inner sum "
        "is over per-term counts; each c*log2(c) term is quantized to "
        "exact micro-bit BIGINTs before summing, making the aggregate "
        "order-independent and bit-identical across engines (the repo's "
        "standard decimal-sum discipline applied to a float-valued term). "
        "Plan: one token explode + two hash aggregations on (doc,term) "
        "then doc — linear, no shuffle wider than the token count.",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    s_micro = F.sum(
        F.round(F.col("c") * F.log2(F.col("c").cast("double")) * 1_000_000).cast("long")
    )
    return tf.groupBy("doc_id").agg(
        n.cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.round(
            F.log2(n.cast("double")) - s_micro.cast("double") / 1_000_000 / n, 6
        ).alias("entropy_bits"),
    )


@register(
    "pipeline_sample_k_per_group",
    oracle="""
    SELECT doc_id, source, rn FROM (
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS rn
        FROM documents
    ) WHERE rn <= 5
    """,
    doc="Deterministic k-per-group sampling (k=5 docs per source shard): "
        "rank by the md5 of the stable id and keep the first k — the "
        "reproducible form of reservoir sampling for building eval slices "
        "and debugging subsets (same hash-gating discipline as "
        "pipeline_train_split, but with an exact per-group quota instead "
        "of a global fraction). One hash shuffle on the group key; the "
        "window never sees more than a group's rows, and at 100 TB a "
        "pre-filter on the hash prefix (keep ~2k/|group| of rows) bounds "
        "the sort input before the window runs.",
)
def pipeline_sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
    )


# --------------------------------------------------------------------------
# URL canonicalization dedup
# --------------------------------------------------------------------------

#: synthetic URL built deterministically from doc_id (the corpus has no URL
#: column): host case and tracking params vary per doc, the canonical
#: (host, path) collides every ~250 docs — both engines build the identical
#: string.
_URL_SQL = (
    "concat(CASE WHEN doc_id % 2 = 0 THEN 'https://EX' ELSE 'https://ex' END, "
    "CAST(doc_id % 5 AS VARCHAR), '.Example.COM/doc/', "
    "CAST(doc_id % 50 AS VARCHAR), '?utm_source=s', CAST(doc_id AS VARCHAR), "
    "'&utm_campaign=c', CAST(doc_id % 3 AS VARCHAR), '#sec', "
    "CAST(doc_id AS VARCHAR))"
)
#: canonicalization pipeline (identical regex semantics in Java/RE2):
#: strip fragment -> strip utm_* params -> strip dangling ?/& -> lowercase
#: scheme+host (the part before the first path slash)


def _canon_sql_lower() -> str:
    # lowercase only the scheme+authority via a scalar subquery-free split:
    # lower(first part) || rest
    # NB: DuckDB regexp_replace replaces only the FIRST match unless the
    # 'g' flag is given; Spark's always replaces all — flag every strip.
    stripped = (
        f"regexp_replace(regexp_replace(regexp_replace({_URL_SQL}, "
        "'#.*$', '', 'g'), 'utm_[a-z_]+=[^&#]*&?', '', 'g'), '[?&]$', '', 'g')"
    )
    return (
        f"concat(lower(regexp_extract({stripped}, '^[^/]*//[^/]+', 0)), "
        f"regexp_replace({stripped}, '^[^/]*//[^/]+', ''))"
    )


@register(
    "pipeline_length_percentile_caps",
    oracle="""
    WITH by_val AS (
        SELECT lang, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM documents GROUP BY lang, n_chars
    ),
    cum AS (
        SELECT lang, n_chars, cnt,
               SUM(cnt) OVER (PARTITION BY lang ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(cnt) OVER (PARTITION BY lang) AS n
        FROM by_val
    ),
    p95 AS (
        SELECT lang, MAX(CASE WHEN (95 * n + 99) // 100 > cum - cnt
                               AND (95 * n + 99) // 100 <= cum
                              THEN n_chars END) AS p95_chars
        FROM cum GROUP BY lang
    )
    SELECT cum.lang,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(p95_chars) AS BIGINT) AS p95_chars,
           CAST(COALESCE(SUM(CASE WHEN n_chars > p95_chars THEN cnt END), 0)
                AS BIGINT) AS n_over_cap,
           CAST(COALESCE(SUM(CASE WHEN n_chars > p95_chars
                                  THEN cnt * (n_chars - p95_chars) END), 0)
                AS BIGINT) AS chars_saved
    FROM cum JOIN p95 USING (lang)
    GROUP BY cum.lang
    ORDER BY cum.lang
    """,
    doc="Per-language truncation-cap policy table: the p95 document "
        "length (rank-picked, exact), how many docs exceed it, and the "
        "total characters a cap-at-p95 truncation would save — the "
        "numbers that decide a context-budget policy before running "
        "pipeline_char_budget_truncation. All windows run over the "
        "per-(lang, n_chars) DISTINCT-value aggregate, PARTITIONED by "
        "lang — the value-domain rank-pick recipe, never a per-doc "
        "window; integer rank arithmetic identical in both engines. At "
        "100 TB: one narrow aggregation, a bounded cumulative pass, one "
        "lang-keyed join. Reference parity: extension surface "
        "(SURVEY.md §2.C curation rows).",
)
def pipeline_length_percentile_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    by_val = d.groupBy("lang", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("lang").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = by_val.select(
        "lang",
        "n_chars",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("n"),
    )
    r95 = F.expr("(95 * n + 99) div 100")
    p95 = cum.groupBy("lang").agg(
        F.max(
            F.when(
                (r95 > F.col("cum") - F.col("cnt")) & (r95 <= F.col("cum")),
                F.col("n_chars"),
            )
        ).alias("p95_chars")
    )
    over = F.col("n_chars") > F.col("p95_chars")
    return (
        cum.join(p95, "lang")
        .groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.max("p95_chars").cast("long").alias("p95_chars"),
            F.coalesce(F.sum(F.when(over, F.col("cnt"))), F.lit(0))
            .cast("long")
            .alias("n_over_cap"),
            F.coalesce(
                F.sum(
                    F.when(
                        over, F.col("cnt") * (F.col("n_chars") - F.col("p95_chars"))
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("chars_saved"),
        )
        .orderBy("lang")
    )


@register(
    "pipeline_head_dup_by_source",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, source,
               md5(array_to_string({_TOKS}[1:8], ' ')) AS head_fp
        FROM documents
    ),
    grp AS (
        SELECT head_fp, COUNT(*) AS fp_cnt FROM fp GROUP BY head_fp
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(count_if(fp_cnt > 1) AS BIGINT) AS n_head_dup_docs,
           round(CAST(count_if(fp_cnt > 1) AS DOUBLE) / COUNT(*), 6)
               AS head_dup_rate,
           CAST(COUNT(*) - COUNT(DISTINCT fp.head_fp) AS BIGINT)
               AS n_excess_within
    FROM fp JOIN grp USING (head_fp)
    GROUP BY source
    ORDER BY source
    """,
    doc="Boilerplate-head duplication report per source: fingerprint each "
        "document's first 8 tokens (the shared-intro signal — crawl "
        "sources that template their openings show up here long before "
        "full-text dedup fires), then per source count members of any "
        "corpus-wide collision group, the duplication rate, and the "
        "within-source excess (docs minus distinct heads = removable "
        "now). This is the curation triage query that decides WHERE "
        "dedup budget goes. Plan: map-side fingerprint, one hash "
        "aggregation on the fingerprint, one fingerprint-keyed join back "
        "(narrow — same key), one bounded per-source rollup; at 100 TB "
        "identical shape to exact-hash dedup. Non-vacuous at sf0.01 "
        "(24 colliding docs) and sf0.1 (244). Reference parity: "
        "extension surface (SURVEY.md §2.C curation rows).",
)
def pipeline_head_dup_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    head_fp = F.md5(
        F.array_join(F.slice(tokens(F.col("text")), 1, 8), " ")
    ).alias("head_fp")
    fp = d.select("doc_id", "source", head_fp)
    grp = fp.groupBy("head_fp").agg(F.count(F.lit(1)).alias("fp_cnt"))
    j = fp.join(grp, "head_fp")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_if(F.col("fp_cnt") > 1).cast("long").alias("n_head_dup_docs"),
            F.round(
                F.count_if(F.col("fp_cnt") > 1).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("head_dup_rate"),
            (F.count(F.lit(1)) - F.countDistinct("head_fp"))
            .cast("long")
            .alias("n_excess_within"),
        )
        .orderBy("source")
    )


@register(
    "pipeline_url_canonical_dedup",
    oracle=f"""
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
    FROM (SELECT doc_id, {_canon_sql_lower()} AS canonical_url FROM documents)
    GROUP BY canonical_url
    """,
    doc="URL canonicalization dedup — the web-crawl first pass that runs "
        "BEFORE any content hashing: strip the fragment, drop utm_* "
        "tracking params, trim dangling separators, lowercase scheme+host "
        "(path case preserved), then group by the canonical form keeping "
        "the smallest doc_id as representative. URLs are synthesized "
        "deterministically from doc_id (clean corpus); the rule chain is "
        "four shared-semantics regexes, so the whole canonicalizer is "
        "map-side — the only shuffle is the final hash aggregation on the "
        "canonical key, exactly like exact-hash dedup.",
)
def pipeline_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://EX")).otherwise(
            F.lit("https://ex")
        ),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".Example.COM/doc/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?utm_source=s"),
        F.col("doc_id").cast("string"),
        F.lit("&utm_campaign=c"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("#sec"),
        F.col("doc_id").cast("string"),
    )
    stripped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(url, r"#.*$", ""), r"utm_[a-z_]+=[^&#]*&?", ""
        ),
        r"[?&]$",
        "",
    )
    canonical = F.concat(
        F.lower(F.regexp_extract(stripped, r"^[^/]*//[^/]+", 0)),
        F.regexp_replace(stripped, r"^[^/]*//[^/]+", ""),
    )
    return (
        d.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_variants"),
            F.min("doc_id").cast("long").alias("keep_doc_id"),
        )
    )


@register(
    "pipeline_bpe_first_merges",
    oracle=f"""
    WITH w AS (SELECT unnest({_TOKS}) AS w FROM documents),
    pairs AS (
        SELECT unnest(CASE WHEN length(w) >= 2
                           THEN list_transform(generate_series(1, length(w) - 1),
                                i -> substring(w, i, 1) || substring(w, i + 1, 1))
                           ELSE [] END) AS pair
        FROM w
    ),
    counts AS (
        SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY pair
    )
    SELECT pair, n, CAST(rk AS INTEGER) AS rank FROM (
        SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rk
        FROM counts
    ) WHERE rk <= 20
    """,
    doc="Tokenizer-training primitive — the first BPE merge round: corpus "
        "frequency of every adjacent character pair inside words, top-20 "
        "merge candidates (count desc, pair asc tiebreak). This is the "
        "inner loop of byte-pair-encoding vocabulary induction; one round "
        "is registered because each subsequent round is the identical "
        "count-and-rank plan over a re-paired corpus. Shuffle profile: the "
        "char-pair explode is map-side (flatMap of bounded per-word "
        "arrays), the count lands on a key space bounded by the SQUARE OF "
        "THE ALPHABET (not the corpus), and the top-20 is a single-reducer "
        "sort of those few hundred rows. At 100 TB this is exactly the "
        "Hadoop-era wordcount shape — the cheapest distributed aggregation "
        "there is. Reference parity: extension surface (SURVEY.md §2.B "
        "curation).",
)
def pipeline_bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = d.select(F.explode(tokens(F.col("text"))).alias("w"))
    pair_arr = F.expr(
        "CASE WHEN length(w) >= 2 THEN "
        "transform(sequence(1, length(w) - 1), "
        "i -> concat(substring(w, i, 1), substring(w, i + 1, 1))) "
        "ELSE array() END"
    )
    counts = (
        w.select(F.explode(pair_arr).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # Top-20 via orderBy().limit() (TakeOrderedAndProject over the pair
    # vocabulary), then re-rank the BOUNDED 20-row result with a window —
    # the output keeps the rank column without a global sort of the full
    # vocabulary on one partition.
    top = counts.orderBy(F.desc("n"), F.asc("pair")).limit(20)
    rk = F.row_number().over(Window.orderBy(F.desc("n"), F.asc("pair")))
    return top.withColumn("rank", rk.cast("int")).select("pair", "n", "rank")


@register(
    "pipeline_mixture_temperature",
    oracle="""
    WITH src AS (
        SELECT source,
               CAST(SUM(len(string_split_regex(lower(trim(text)), '\\s+')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS t FROM src),
    p AS (
        SELECT source, n_tokens, n_tokens / t AS p_raw,
               pow(n_tokens / t, 0.3) AS p_temp
        FROM src CROSS JOIN tot
    ),
    z AS (SELECT SUM(p_temp) AS z FROM p)
    SELECT source, n_tokens,
           round(p_raw, 6) AS p_natural,
           round(p_temp / z, 6) AS p_sampled,
           round((p_temp / z) / p_raw, 4) AS upsample_factor
    FROM p CROSS JOIN z
    """,
    doc="Temperature-scaled data-mixture weights (alpha=0.3, the "
        "multilingual-LLM sampling recipe): per-source natural token "
        "share p_i, temperature-flattened share p_i^alpha / sum p^alpha, "
        "and the implied up/down-sampling factor — the numbers a "
        "training-data pipeline feeds its per-source samplers so "
        "low-resource sources are boosted without erasing scale "
        "differences. One partial-agg scan onto the |sources| key space; "
        "the two scalar normalizers broadcast back. The float math "
        "(pow, ratios) runs on per-source token counts that are exact "
        "BIGINTs, so both engines' doubles are identical. Reference "
        "parity: extension surface (SURVEY.md §2.B curation).",
)
def pipeline_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text"))).cast("long")).cast("long")
        .alias("n_tokens")
    )
    tot = src.agg(F.sum("n_tokens").cast("double").alias("t"))
    p = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        (F.col("n_tokens") / F.col("t")).alias("p_raw"),
        F.pow(F.col("n_tokens") / F.col("t"), 0.3).alias("p_temp"),
    )
    z = p.agg(F.sum("p_temp").alias("z"))
    return p.crossJoin(F.broadcast(z)).select(
        "source",
        "n_tokens",
        F.round("p_raw", 6).alias("p_natural"),
        F.round(F.col("p_temp") / F.col("z"), 6).alias("p_sampled"),
        F.round((F.col("p_temp") / F.col("z")) / F.col("p_raw"), 4)
        .alias("upsample_factor"),
    )


@register(
    "pipeline_dataset_card",
    oracle="""
    WITH d AS (
        SELECT doc_id, source, lang, n_chars,
               len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
               string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents WHERE text IS NOT NULL
    ),
    base AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE)
                   / COUNT(*) AS avg_chars_raw
        FROM d GROUP BY source
    ),
    vocab AS (
        SELECT source, CAST(COUNT(DISTINCT t) AS BIGINT) AS vocab_terms
        FROM (SELECT source, unnest(toks) AS t FROM d) GROUP BY source
    ),
    med AS (
        SELECT source, n_tokens AS p50_tokens
        FROM (SELECT source, n_tokens, doc_id,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY n_tokens, doc_id) AS rn,
                     COUNT(*) OVER (PARTITION BY source) AS n
              FROM d)
        WHERE rn = (n + 1) // 2
    ),
    tot AS (SELECT CAST(SUM(total_tokens) AS DOUBLE) AS corpus_tokens FROM base)
    SELECT b.source, b.n_docs, b.n_langs, b.total_tokens, v.vocab_terms,
           round(b.total_tokens / t.corpus_tokens, 6) AS token_share,
           m.p50_tokens,
           round(b.avg_chars_raw, 2) AS avg_chars
    FROM base b JOIN vocab v USING (source) JOIN med m USING (source)
    CROSS JOIN tot t
    """,
    doc="Dataset-card summary (the per-source statistics table published "
        "with every training-corpus release): document/language counts, "
        "exact token totals and corpus share, vocabulary size, lower-median "
        "document length (rank-picked with a doc_id tie-break — exact and "
        "deterministic in both engines, no interpolation semantics to "
        "disagree on) and mean chars. Two corpus passes: one doc-level "
        "aggregation and one token explode for per-source vocabulary; the "
        "share/median arithmetic runs on the bounded per-source table with "
        "the corpus total as a broadcast scalar. At 100 TB each pass is "
        "map-side combinable and the distinct-token count per source can "
        "swap to HLL partials (agg_hll_partial_merge) without changing the "
        "output contract. Reference parity: extension surface "
        "(SURVEY.md §2.B curation rows).",
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            tokens(F.col("text")).alias("toks"),
        )
        .withColumn("n_tokens", F.size("toks"))
    )
    base = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (
            F.sum(F.col("n_chars").cast("decimal(18,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_chars_raw"),
    )
    vocab = (
        d.select("source", F.explode("toks").alias("t"))
        .groupBy("source")
        .agg(F.countDistinct("t").alias("vocab_terms"))
    )
    w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    med = (
        d.select(
            "source",
            "n_tokens",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
        )
        .where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("source", F.col("n_tokens").alias("p50_tokens"))
    )
    tot = base.agg(F.sum("total_tokens").cast("double").alias("corpus_tokens"))
    return (
        base.join(vocab, "source")
        .join(med, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_langs",
            "total_tokens",
            "vocab_terms",
            F.round(F.col("total_tokens") / F.col("corpus_tokens"), 6).alias(
                "token_share"
            ),
            "p50_tokens",
            F.round(F.col("avg_chars_raw"), 2).alias("avg_chars"),
        )
    )


@register(
    "pipeline_oversample_minority",
    oracle="""
    WITH lt AS (
        SELECT lang,
               CAST(SUM(len(string_split_regex(lower(trim(text)), '\\s+')))
                    AS BIGINT) AS lang_tokens
        FROM documents WHERE text IS NOT NULL GROUP BY lang
    ),
    mx AS (SELECT MAX(lang_tokens) AS max_tokens FROM lt),
    fac AS (
        SELECT lang,
               LEAST(CAST(ceil(CAST(m.max_tokens AS DOUBLE) / lang_tokens)
                          AS BIGINT), 4) AS factor
        FROM lt CROSS JOIN mx m
    )
    SELECT d.doc_id, d.lang, f.factor, u.copy_idx
    FROM documents d
    JOIN fac f USING (lang)
    CROSS JOIN UNNEST(generate_series(1, 4)) AS u(copy_idx)
    WHERE d.text IS NOT NULL AND u.copy_idx <= f.factor
    """,
    doc="Deterministic minority-language oversampling (the upsampling half "
        "of domain-mixture rebalancing: low-resource languages are "
        "replicated toward the largest language's token count, capped at "
        "4x — the standard multilingual-pretraining epoch trick): per-lang "
        "token totals are a bounded broadcast table; each doc then emits "
        "factor copies ARRAY-LOCALLY via a bounded sequence explode with a "
        "copy index (so downstream global shuffle separates the copies). "
        "No shuffle touches the corpus: the only wide op is the per-lang "
        "aggregate; replication happens map-side at scan parallelism. At "
        "100 TB the same plan emits (doc, epoch) training instances "
        "without materializing the replicated corpus. Reference parity: "
        "extension surface (SURVEY.md §2.B curation rows).",
)
def pipeline_oversample_minority(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    lt = d.groupBy("lang").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("lang_tokens")
    )
    mx = lt.agg(F.max("lang_tokens").alias("max_tokens"))
    fac = lt.crossJoin(F.broadcast(mx)).select(
        "lang",
        F.least(
            F.ceil(
                F.col("max_tokens").cast("double") / F.col("lang_tokens")
            ).cast("long"),
            F.lit(4).cast("long"),
        ).alias("factor"),
    )
    return (
        d.join(F.broadcast(fac), "lang")
        .select(
            "doc_id",
            "lang",
            "factor",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("factor"))).alias(
                "copy_idx"
            ),
        )
        .select("doc_id", "lang", "factor", "copy_idx")
    )


@register(
    "pipeline_shard_skew_report",
    oracle="""
    WITH sh AS (
        SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                   % 64 AS shard,
               len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
        FROM documents WHERE text IS NOT NULL
    ),
    per AS (
        SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
        FROM sh GROUP BY shard
    ),
    g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
               CAST(MAX(shard_tokens) AS BIGINT) AS max_tokens,
               CAST(MIN(shard_tokens) AS BIGINT) AS min_tokens,
               CAST(SUM(shard_tokens) AS DECIMAL(38,0)) AS total_tokens
        FROM per
    )
    SELECT n_shards, max_tokens, min_tokens,
           round(CAST(max_tokens AS DOUBLE)
                 / (CAST(total_tokens AS DOUBLE) / n_shards), 6)
               AS skew_ratio,
           CAST(total_tokens AS BIGINT) AS total_tokens
    FROM g
    """,
    doc="Shard-skew report for hash-sharded training output (the check run "
        "after pipeline_global_shuffle before handing shards to data "
        "loaders: one hot shard stalls every training step): md5-hash "
        "shard assignment into 64 shards, per-shard token totals, and the "
        "max-shard/mean-shard skew ratio. One corpus pass to a 64-row "
        "table; the report is arithmetic on broadcast scalars. The hash "
        "gate is the same family as pipeline_train_split's (first 4 md5 "
        "hex chars — exact in both engines). At 100 TB a skew ratio near "
        "1.0 certifies the shuffle; >1.2 means re-shard. Reference "
        "parity: extension surface (SURVEY.md §2.B curation rows).",
)
def pipeline_shard_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 64
    )
    per = (
        d.select(shard.alias("shard"), F.size(tokens(F.col("text"))).alias("n_tokens"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("shard_tokens"),
        )
    )
    g = per.agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.max("shard_tokens").cast("long").alias("max_tokens"),
        F.min("shard_tokens").cast("long").alias("min_tokens"),
        F.sum(F.col("shard_tokens").cast("decimal(38,0)")).alias("total_dec"),
    )
    return g.select(
        "n_shards",
        "max_tokens",
        "min_tokens",
        F.round(
            F.col("max_tokens").cast("double")
            / (F.col("total_dec").cast("double") / F.col("n_shards")),
            6,
        ).alias("skew_ratio"),
        F.col("total_dec").cast("long").alias("total_tokens"),
    )


@register(
    "pipeline_boilerplate_strip",
    oracle=f"""
    WITH bg AS (
        SELECT doc_id, unnest({_BIGRAMS}) AS bigram FROM documents
    ),
    top AS (
        SELECT bigram FROM (
            SELECT bigram, COUNT(*) AS df,
                   row_number() OVER (ORDER BY COUNT(*) DESC, bigram) AS rn
            FROM bg GROUP BY bigram
        ) WHERE rn <= 10
    ),
    hits AS (
        SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_boiler
        FROM bg b JOIN top USING (bigram) GROUP BY b.doc_id
    )
    SELECT d.doc_id,
           len({_BIGRAMS}) AS n_distinct_bigrams,
           COALESCE(h.n_boiler, 0) AS n_boilerplate_bigrams,
           round(COALESCE(h.n_boiler, 0)
                 / greatest(len({_BIGRAMS}), 1), 6) AS boilerplate_ratio,
           COALESCE(h.n_boiler, 0) / greatest(len({_BIGRAMS}), 1) > 0.5
               AS is_boilerplate_heavy
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    """,
    doc="Boilerplate detection by corpus-common phrases (the C4/RefinedWeb "
        "stage that strips nav-bars, cookie banners, and license headers: "
        "a phrase appearing in a large share of documents is template, "
        "not content): top-10 bigrams by document frequency form the "
        "boilerplate set, each doc scores the fraction of its distinct "
        "bigrams that are boilerplate, with a 50% flag. The phrase set is "
        "bounded (top-10 via TakeOrdered partials) and joins back "
        "broadcast; corpus work is the one bigram-explode count plus the "
        "per-doc membership rollup. At 100 TB the boilerplate set is a "
        "corpus-snapshot artifact exactly like the LM tables. Reference "
        "parity: extension surface (SURVEY.md §2.B curation rows).",
)
def pipeline_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bg = d.select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), 2)).alias("bigram"),
    )
    # Top-10 boilerplate bigrams via orderBy().limit()
    # (TakeOrderedAndProject), not a single-partition row_number sort of
    # the whole bigram vocabulary.
    top = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "bigram")
        .limit(10)
        .select("bigram")
    )
    hits = (
        bg.join(F.broadcast(top), "bigram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    nb = F.size(word_shingles(tokens(F.col("text")), 2)).cast("long")
    ratio = F.coalesce(F.col("n_boiler"), F.lit(0)) / F.greatest(
        nb, F.lit(1).cast("long")
    )
    return (
        d.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            nb.alias("n_distinct_bigrams"),
            F.coalesce(F.col("n_boiler"), F.lit(0).cast("long")).alias(
                "n_boilerplate_bigrams"
            ),
            F.round(ratio, 6).alias("boilerplate_ratio"),
            (ratio > 0.5).alias("is_boilerplate_heavy"),
        )
    )


@register(
    "pipeline_epoch_plan",
    oracle="""
    WITH lt AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split_regex(lower(trim(text)), '\\s+')))
                    AS BIGINT) AS lang_tokens
        FROM documents WHERE text IS NOT NULL GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(lang_tokens) AS BIGINT) AS corpus_tokens FROM lt),
    w AS (
        SELECT lang, n_docs, lang_tokens,
               CAST(round(pow(CAST(lang_tokens AS DOUBLE)
                              / t.corpus_tokens, 0.5) * 1000000) AS BIGINT)
                   AS w_micro
        FROM lt CROSS JOIN tot t
    ),
    ws AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS w_total FROM w)
    SELECT w.lang, w.n_docs, w.lang_tokens,
           CAST(200000 * w.w_micro // ws.w_total AS BIGINT)
               AS budget_tokens,
           CAST((200000 * w.w_micro // ws.w_total) * 100 // w.lang_tokens
                AS BIGINT) AS epochs_x100
    FROM w CROSS JOIN ws
    """,
    doc="Epoch planning from temperature-scaled mixture weights (the last "
        "step of the mixture pipeline: turn alpha=0.5 sampling weights "
        "and a 200k-token training budget into per-language token budgets "
        "and epoch counts — epochs > 1 means that language repeats, the "
        "signal to raise its cap or lower alpha): per-lang exact token "
        "totals (one corpus pass), then all planning arithmetic on the "
        "bounded language table with broadcast scalars. The only "
        "non-rational op (pow 0.5 = sqrt, IEEE-pinned) is quantized to "
        "1e-6 weights; budgets and epochs use integral division so both "
        "engines emit identical integers. Companion to "
        "pipeline_mixture_temperature (weights) and "
        "pipeline_oversample_minority (replication). Reference parity: "
        "extension surface (SURVEY.md §2.B curation rows).",
)
def pipeline_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    lt = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("lang_tokens"),
    )
    tot = lt.agg(F.sum("lang_tokens").cast("long").alias("corpus_tokens"))
    w = lt.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "lang_tokens",
        F.round(
            F.sqrt(
                F.col("lang_tokens").cast("double") / F.col("corpus_tokens")
            )
            * 1000000
        )
        .cast("long")
        .alias("w_micro"),
    )
    ws = w.agg(F.sum("w_micro").cast("long").alias("w_total"))
    return (
        w.crossJoin(F.broadcast(ws))
        .withColumn(
            "budget_tokens",
            F.expr("(200000 * w_micro) div w_total").cast("long"),
        )
        .select(
            "lang",
            "n_docs",
            "lang_tokens",
            "budget_tokens",
            F.expr("(budget_tokens * 100) div lang_tokens")
            .cast("long")
            .alias("epochs_x100"),
        )
    )


@register(
    "pipeline_char_budget_truncation",
    oracle="""
    WITH d AS (
        SELECT doc_id, trim(text) AS t FROM documents WHERE text IS NOT NULL
    ),
    cut AS (
        SELECT doc_id, t,
               CASE WHEN length(t) <= 200 THEN t
                    WHEN strpos(reverse(substring(t, 1, 200)), ' ') = 0
                        THEN substring(t, 1, 200)
                    ELSE substring(t, 1,
                         200 - strpos(reverse(substring(t, 1, 200)), ' '))
               END AS kept
        FROM d
    )
    SELECT doc_id,
           CAST(length(t) AS BIGINT) AS orig_chars,
           CAST(length(kept) AS BIGINT) AS kept_chars,
           length(t) > 200 AS truncated,
           md5(kept) AS kept_fp
    FROM cut
    """,
    doc="Character-budget truncation at a word boundary (the context-"
        "window guard every embedding/labeling pipeline applies before "
        "calling a model: hard 200-char cap, backed off to the last "
        "space so no word is split; whole prefix kept when it contains "
        "no space). Pure string expressions — the backoff is "
        "reverse+strpos, no UDF, no shuffle; the md5 fingerprint proves "
        "byte-identical truncation across engines. Reference parity: "
        "extension surface (SURVEY.md §2.B curation rows).",
)
def pipeline_char_budget_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    t = F.trim(F.col("text"))
    prefix = F.substring(t, 1, 200)
    back = F.expr("instr(reverse(substring(trim(text), 1, 200)), ' ')")
    kept = (
        F.when(F.length(t) <= 200, t)
        .when(back == 0, prefix)
        .otherwise(F.substring(t, 1, F.lit(200) - back))
    )
    return d.select(
        "doc_id",
        F.length(t).cast("long").alias("orig_chars"),
        F.length(kept).cast("long").alias("kept_chars"),
        (F.length(t) > 200).alias("truncated"),
        F.md5(kept).alias("kept_fp"),
    )


_KFOLD_SALT = ":kfold7"
_KFOLD_SQL = (
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '{salt}'), 1, 8))"
    "::BIGINT % 5"
).format(salt=_KFOLD_SALT)


@register(
    "pipeline_kfold_assignment",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, lang, n_chars, {_KFOLD_SQL} AS fold
        FROM documents
    ),
    per AS (
        SELECT fold,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM assigned GROUP BY fold
    )
    SELECT CAST(fold AS BIGINT) AS fold, n_docs, n_langs, sum_chars,
           CAST(n_docs * 1000000 // SUM(n_docs) OVER () AS BIGINT)
               AS docs_share_ppm
    FROM per
    """,
    doc="Deterministic k-fold (k=5) cross-validation assignment by the "
        "same md5 hash-gate primitive as pipeline_train_split: fold "
        "membership is a scan-resident per-row predicate — reproducible "
        "across engines, retries, and scale factors, disjoint and "
        "complete BY CONSTRUCTION (every doc hashes to exactly one "
        "residue), with no RNG state and no shuffle to assign. The audit "
        "reports per-fold size, language diversity, and share in "
        "integral ppm (share rides a window over the bounded 5-row fold "
        "table). At 100 TB fold i's training pass is a predicate "
        "pushdown (fold != i), not a materialized copy — k-fold costs "
        "k scans, zero storage. Reference parity: extension surface "
        "(SURVEY.md §2.B curation rows).",
)
def pipeline_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fold = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(_KFOLD_SALT)
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(5),
    )
    per = d.groupBy(fold.alias("fold")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    wtot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        F.col("fold").cast("long").alias("fold"),
        "n_docs",
        "n_langs",
        "sum_chars",
        F.expr("n_docs * 1000000").cast("long").alias("__num"),
        F.sum("n_docs").over(wtot).alias("__tot"),
    ).select(
        "fold",
        "n_docs",
        "n_langs",
        "sum_chars",
        F.expr("__num div __tot").cast("long").alias("docs_share_ppm"),
    )


_PRIO_SALT = "ps1"
#: DuckDB fragment: deterministic uniform-in-(0,1) draw per doc, identical
#: to the Spark expression in pipeline_weighted_priority_sample.
_PRIO_U32 = (
    "(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '"
    + _PRIO_SALT
    + "'), 1, 8))::BIGINT)"
)


@register(
    "pipeline_weighted_priority_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               n_chars * 4294967296.0 / ({_PRIO_U32} + 0.5) AS priority
        FROM documents
    )
    SELECT doc_id, n_chars, round(priority, 6) AS priority
    FROM keyed ORDER BY priority DESC, doc_id LIMIT 50
    """,
    doc="Deterministic weighted sampling without replacement via priority "
        "sampling (Duffield-Lund-Thorup, JACM'07): each doc draws "
        "u ~ Uniform(0,1) from a salted md5 of its id (reproducible "
        "across runs AND engines — sampling lineage is an audit "
        "requirement for training corpora), gets priority = weight/u "
        "with weight = n_chars, and the sample is the top-k by "
        "priority — longer docs proportionally likelier, any fixed k, "
        "mergeable across shards by construction (max-k of per-shard "
        "top-ks). Unlike Efraimidis-Spirakis u^(1/w) keys this needs "
        "no transcendentals, so the double arithmetic is bit-identical "
        "in any IEEE engine and the driver hash certifies the full "
        "draw. Top-k plans as TakeOrderedAndProject (per-partition "
        "heaps + driver merge of 50) — no global sort at 100 TB.",
)
def pipeline_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_PRIO_SALT))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        (F.col("n_chars") * F.lit(4294967296.0) / (v + F.lit(0.5))).alias("priority"),
    )
    return (
        keyed.orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(50)
        .select("doc_id", "n_chars", F.round("priority", 6).alias("priority"))
    )


def _morton_sql(x: str, y: str) -> str:
    """DuckDB 16+16-bit Morton interleave, exactly mirroring the Spark
    column expression in pipeline_zorder_layout (integer ops only)."""
    terms = [
        f"(((({x}) >> {i}) & 1) << {2 * i}) + (((({y}) >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    ]
    return "(" + " + ".join(terms) + ")"


def _morton_col(x, y):
    """Spark 16+16-bit Morton interleave as one JVM expression tree."""
    z = F.lit(0).cast("long")
    for i in range(16):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


@register(
    "pipeline_zorder_layout",
    oracle=f"""
    WITH keyed AS (
        SELECT o_orderkey,
               CAST(o_custkey AS BIGINT) & 65535 AS x,
               CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT)
                   & 65535 AS y
        FROM orders
    ),
    z AS (SELECT o_orderkey, x, y, {_morton_sql("x", "y")} AS zkey FROM keyed)
    SELECT zkey >> 18 AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(x) AS BIGINT) AS min_cust, CAST(MAX(x) AS BIGINT) AS max_cust,
           CAST(MIN(y) AS BIGINT) AS min_day, CAST(MAX(y) AS BIGINT) AS max_day
    FROM z GROUP BY 1
    """,
    doc="Z-order (Morton) clustering key over (customer, order day): "
        "interleaving the bits of the two dimensions makes rows that are "
        "close in BOTH dimensions adjacent in one sort key, so writing "
        "files in zkey order lets min/max file statistics prune scans "
        "for predicates on EITHER column — the data-layout technique "
        "behind Delta/Iceberg OPTIMIZE ZORDER, here as a pure column "
        "expression (32 shift/mask terms, whole-stage codegen, no UDF). "
        "The query reports per-zbucket locality rectangles (zkey div 2^18 "
        "tiles with their min/max extent in each dimension — bounded "
        "output certifying that each bucket covers a narrow tile). At "
        "100 TB this is a map-side key computation + repartitionByRange "
        "write; the integer bit arithmetic is engine-exact, so the "
        "driver hash certifies every interleaved bit.",
)
def pipeline_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    keyed = o.select(
        "o_orderkey",
        F.col("o_custkey").cast("long").bitwiseAND(F.lit(65535)).alias("x"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1992-01-01")))
        .cast("long")
        .bitwiseAND(F.lit(65535))
        .alias("y"),
    )
    z = keyed.select("o_orderkey", "x", "y", _morton_col(F.col("x"), F.col("y")).alias("zkey"))
    return z.groupBy(F.shiftright(F.col("zkey"), 18).alias("zbucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.min("x").cast("long").alias("min_cust"),
        F.max("x").cast("long").alias("max_cust"),
        F.min("y").cast("long").alias("min_day"),
        F.max("y").cast("long").alias("max_day"),
    )


@register(
    "pipeline_group_priority_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               n_chars * 4294967296.0 / ({_PRIO_U32} + 0.5) AS priority
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, n_chars, priority,
               row_number() OVER (PARTITION BY source
                                  ORDER BY priority DESC, doc_id) AS rk
        FROM keyed
    )
    SELECT source, doc_id, n_chars, round(priority, 6) AS priority, rk
    FROM ranked WHERE rk <= 3
    """,
    doc="Stratified weighted sampling: the same deterministic priority "
        "draw as pipeline_weighted_priority_sample (weight/u, salted-md5 "
        "uniform, transcendental-free) but top-3 PER SOURCE via a window "
        "partitioned by the source dimension — per-stratum quotas with "
        "one shuffle on the stratum key, the shape of a "
        "mixture-controlled corpus draw (N docs per domain). The window "
        "is value-domain-partitioned (source catalog), never global; "
        "ranks are fully deterministic so both engines select and "
        "number the identical rows.",
)
def pipeline_group_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_PRIO_SALT))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    keyed = docs.select(
        "doc_id",
        "source",
        "n_chars",
        (F.col("n_chars") * F.lit(4294967296.0) / (v + F.lit(0.5))).alias("priority"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("priority"), F.asc("doc_id"))
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "source", "doc_id", "n_chars",
            F.round("priority", 6).alias("priority"), "rk",
        )
    )


@register(
    "pipeline_negative_samples",
    oracle="""
    WITH a AS (SELECT doc_id AS anchor_id, source AS a_source
               FROM documents WHERE doc_id < 20),
    c AS (SELECT doc_id AS neg_id, source AS neg_source FROM documents),
    ranked AS (
        SELECT a.anchor_id, c.neg_id, c.neg_source,
               row_number() OVER (
                   PARTITION BY a.anchor_id
                   ORDER BY md5(CAST(a.anchor_id AS VARCHAR) || ':'
                                || CAST(c.neg_id AS VARCHAR)), c.neg_id
               ) AS rk
        FROM c CROSS JOIN a
        WHERE c.neg_source <> a.a_source
    )
    SELECT anchor_id, rk, neg_id, neg_source
    FROM ranked WHERE rk <= 4
    """,
    doc="Deterministic cross-source negative sampling for contrastive "
        "training (4 negatives per anchor, drawn only from OTHER "
        "sources so trivially-related same-source docs never pollute "
        "the negative set): candidates rank by a salted md5 of the "
        "(anchor, candidate) pair — a per-anchor uniform permutation "
        "that is reproducible across runs AND engines, giving the "
        "sampling-lineage audit trail pipeline_weighted_priority_"
        "sample established, now for pair construction. The bounded "
        "anchor batch broadcasts against the streaming corpus (no "
        "corpus shuffle); per-anchor top-4 is a bounded window. "
        "Complements sim_triplet_margin_audit's HARD negatives with "
        "the uniform in-batch negatives SimCLR/DPR-style training "
        "mixes in.",
)
def pipeline_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    a = d.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("anchor_id"), F.col("source").alias("a_source")
    )
    c = d.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source")
    )
    rk = F.row_number().over(
        Window.partitionBy("anchor_id").orderBy(
            F.md5(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("neg_id").cast("string"),
                )
            ),
            "neg_id",
        )
    )
    return (
        c.crossJoin(F.broadcast(a))
        .where(F.col("neg_source") != F.col("a_source"))
        .withColumn("rk", rk)
        .where(F.col("rk") <= 4)
        .select("anchor_id", "rk", "neg_id", "neg_source")
    )


@register(
    "pipeline_span_corruption_stats",
    oracle=r"""
    WITH d AS (
        SELECT doc_id, source,
               string_split_regex(lower(trim(text)), '\s+') AS t
        FROM documents
    ),
    m AS (
        SELECT doc_id, source, len(t) AS n_tok,
               list_transform(generate_series(0, len(t) - 1),
                   i -> CASE WHEN ('0x' || substring(
                                 md5(CAST(doc_id AS VARCHAR) || ':'
                                     || CAST(i AS VARCHAR)), 1, 8))::BIGINT
                             % 20 < 3
                        THEN 1 ELSE 0 END) AS msk
        FROM d WHERE len(t) >= 1
    ),
    per_doc AS (
        SELECT source, n_tok,
               COALESCE(list_sum(msk), 0) AS n_masked,
               msk[1] + COALESCE(list_sum(list_transform(
                   generate_series(2, n_tok),
                   i -> msk[i] * (1 - msk[i - 1]))), 0) AS n_spans
        FROM m
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_masked) AS BIGINT) AS n_masked,
           CAST(SUM(n_spans) AS BIGINT) AS n_spans,
           CAST(SUM(n_masked) * 1000000 // SUM(n_tok) AS BIGINT)
               AS mask_rate_ppm,
           CAST(SUM(n_masked) * 1000000 // greatest(SUM(n_spans), 1)
                AS BIGINT) AS mean_span_len_ppm
    FROM per_doc GROUP BY source
    """,
    doc="T5-style span-corruption mask planning (Raffel et al. 2020): "
        "each token position masks iff a salted md5 of (doc, position) "
        "falls under the 15% rate, so the corruption pattern is "
        "REPRODUCIBLE across runs, engines and epochs (the property a "
        "pretraining pipeline needs to regenerate identical batches "
        "without storing masks); contiguous masked runs (= sentinel "
        "spans) are counted ROW-LOCALLY with array HOFs — zero "
        "explode, zero shuffle until the per-source rollup of 5 "
        "integer sums. Reports achieved mask rate and mean span "
        "length per source in integral ppm. At 100 TB: pure map-side "
        "expression work, one bounded aggregation.",
)
def pipeline_span_corruption_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens("text").alias("t")
    )
    m = d.where(F.size("t") >= 1).select(
        "source",
        F.size("t").cast("long").alias("n_tok"),
        F.expr(
            "transform(sequence(0, size(t) - 1),"
            " i -> CASE WHEN conv(substring("
            "md5(concat(cast(doc_id as string), ':', cast(i as string)))"
            ", 1, 8), 16, 10) % 20 < 3 THEN 1 ELSE 0 END)"
        ).alias("msk"),
    )
    per_doc = m.select(
        "source",
        "n_tok",
        F.coalesce(
            F.expr("aggregate(msk, 0L, (acc, x) -> acc + x)"), F.lit(0)
        ).alias("n_masked"),
        (
            F.expr("element_at(msk, 1)")
            + F.coalesce(
                # n_tok guard: Spark's sequence(2, 1) is DESCENDING
                # (DuckDB's generate_series(2, 1) is empty), so a
                # 1-token doc must skip the pair scan entirely
                F.expr(
                    "IF(n_tok < 2, 0L,"
                    " aggregate(transform(sequence(2, int(n_tok)),"
                    " i -> element_at(msk, i) * (1 - element_at(msk, i - 1))),"
                    " 0L, (acc, x) -> acc + x))"
                ),
                F.lit(0),
            )
        ).alias("n_spans"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_masked").cast("long").alias("n_masked"),
        F.sum("n_spans").cast("long").alias("n_spans"),
        F.expr("sum(n_masked) * 1000000 div sum(n_tok)")
        .cast("long")
        .alias("mask_rate_ppm"),
        F.expr("sum(n_masked) * 1000000 div greatest(sum(n_spans), 1L)")
        .cast("long")
        .alias("mean_span_len_ppm"),
    )


# --------------------------------------------------------------------------
# DSIR-style importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every raw document by
# how target-like its hashed-unigram distribution is.
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_TARGET_SOURCE = "src0"
#: cross-engine bucket hash: first 4 md5 hex chars of the token -> 16-bit
#: int -> mod 256 (same md5-gating trick as the split/shuffle queries)
_DSIR_BUCKET_SQL = (
    "('0x' || substring(md5(t), 1, 4))::BIGINT % {b}".format(b=_DSIR_BUCKETS)
)


@register(
    "pipeline_dsir_importance_weights",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, unnest({_TOKS}) AS t FROM documents
    ),
    feat AS (
        SELECT doc_id, source, {_DSIR_BUCKET_SQL} AS b FROM tok
    ),
    raw_p AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS c_raw FROM feat GROUP BY b
    ),
    tgt_p AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS c_tgt
        FROM feat WHERE source = '{_DSIR_TARGET_SOURCE}' GROUP BY b
    ),
    tot AS (
        SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
               (SELECT CAST(SUM(c_tgt) AS BIGINT) FROM tgt_p) AS n_tgt
        FROM raw_p
    ),
    ratio AS (  -- add-1 smoothed per-bucket log importance ratio, 1e-6 ints
        SELECT r.b,
               CAST(round((ln((COALESCE(g.c_tgt, 0) + 1)
                              / CAST(tot.n_tgt + {_DSIR_BUCKETS} AS DOUBLE))
                           - ln((r.c_raw + 1)
                                / CAST(tot.n_raw + {_DSIR_BUCKETS} AS DOUBLE)))
                          * 1000000) AS BIGINT) AS logr_micro
        FROM raw_p r LEFT JOIN tgt_p g USING (b), tot
    )
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(ratio.logr_micro) AS BIGINT) AS log_weight_micro
    FROM feat f JOIN ratio USING (b)
    GROUP BY f.doc_id
    """,
    doc="DSIR importance weights (Xie et al. 2023): each document's "
        "log-importance under a hashed-unigram bag-of-words model — the "
        "sum over its tokens of ln p_target(bucket) - ln p_raw(bucket), "
        "with 256 md5 buckets, add-1 smoothing, the target distribution "
        "estimated from the '{tgt}' slice and the raw distribution from "
        "the full corpus. Sampling propto exp(weight) yields the "
        "target-matched training subset; this query materializes the "
        "per-doc weights (quantized per-bucket to exact 1e-6-unit int64 "
        "log terms, so the token-sum is associative and engine-exact). "
        "Scale: one token explode -> a 256-key bucket count (bounded) -> "
        "a broadcast 256-row ratio table joined back map-side; the only "
        "corpus-scaled shuffle is the per-doc rollup — the exact DSIR "
        "production shape at 100 TB. Reference parity: extension "
        "surface (SURVEY.md §2.B curation rows).".format(
            tgt=_DSIR_TARGET_SOURCE
        ),
)
def pipeline_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 (guide §2.4/§5): the tokenize+md5 feature stream was evaluated
    # FIVE times (raw histogram, target histogram, both `tot` aggregates,
    # final attach join) at the one-split scan's parallelism. Now: spread
    # the scan, checkpoint the feature stream once, and fuse the raw and
    # target histograms into ONE aggregation (c_tgt via count_if — a
    # bucket with no target rows yields 0, exactly what the old left
    # join's coalesce(c_tgt, 0) produced, so the smoothed ratio is
    # bit-identical). The tiny bucket histogram is checkpointed for its
    # two consumers (tot + ratio).
    d = load_table(spark, sf_dir, "documents")
    feat = (
        spread_small_input(d, "doc_id")
        .select(
            "doc_id", "source", F.explode(tokens(F.col("text"))).alias("t")
        )
        .select(
            "doc_id",
            "source",
            (
                F.conv(F.substring(F.md5("t"), 1, 4), 16, 10).cast("long")
                % _DSIR_BUCKETS
            ).alias("b"),
        )
        .localCheckpoint(eager=True)
    )
    hist = (
        feat.groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c_raw"),
            F.count_if(F.col("source") == _DSIR_TARGET_SOURCE)
            .cast("long")
            .alias("c_tgt"),
        )
        .localCheckpoint(eager=True)  # <= _DSIR_BUCKETS rows, 2 consumers
    )
    tot = hist.agg(
        F.sum("c_raw").cast("long").alias("n_raw"),
        F.sum("c_tgt").cast("long").alias("n_tgt"),
    )
    ratio = (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.col("c_tgt") + 1)
                        / (F.col("n_tgt") + _DSIR_BUCKETS).cast("double")
                    )
                    - F.log(
                        (F.col("c_raw") + 1)
                        / (F.col("n_raw") + _DSIR_BUCKETS).cast("double")
                    )
                )
                * 1_000_000
            )
            .cast("long")
            .alias("logr_micro"),
        )
    )
    return (
        feat.join(maybe_broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("logr_micro").cast("long").alias("log_weight_micro"),
        )
    )


@register(
    "pipeline_contamination_report",
    oracle=f"""
    WITH ev AS (
        SELECT doc_id AS eval_id, unnest({_SHINGLES_K5}) AS shingle
        FROM documents WHERE doc_id < 20
    ),
    tr AS (
        SELECT doc_id AS train_id, source, unnest({_SHINGLES_K5}) AS shingle
        FROM documents WHERE doc_id >= 20
    ),
    hits AS (
        SELECT ev.eval_id, tr.train_id, tr.source, ev.shingle
        FROM ev JOIN tr USING (shingle)
    ),
    per AS (
        SELECT eval_id,
               CAST(COUNT(DISTINCT train_id) AS BIGINT) AS n_train_docs_hit,
               CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_shingles_hit
        FROM hits GROUP BY eval_id
    ),
    src AS (
        SELECT eval_id, source,
               CAST(COUNT(DISTINCT train_id) AS BIGINT) AS c
        FROM hits GROUP BY eval_id, source
    ),
    topsrc AS (
        SELECT eval_id, source FROM (
            SELECT *, row_number() OVER (PARTITION BY eval_id
                                         ORDER BY c DESC, source) AS rn
            FROM src
        ) WHERE rn = 1
    )
    SELECT e.eval_id AS eval_doc_id,
           COALESCE(p.n_train_docs_hit, 0) AS n_train_docs_hit,
           COALESCE(p.n_shingles_hit, 0) AS n_shingles_hit,
           COALESCE(t.source, '') AS top_source
    FROM (SELECT DISTINCT doc_id AS eval_id FROM documents WHERE doc_id < 20) e
    LEFT JOIN per p ON p.eval_id = e.eval_id
    LEFT JOIN topsrc t ON t.eval_id = e.eval_id
    """,
    doc="Eval-side leakage report — the inverse view of "
        "pipeline_decontaminate: for every held-out benchmark item, how "
        "many TRAINING docs share a 5-gram shingle with it, how many of "
        "its shingles leaked, and which source leaks it hardest "
        "(deterministic top-1: distinct-doc hits, source tie-break). "
        "Decontaminate says which training docs to drop; this says which "
        "EVAL items are already compromised and must be excluded from "
        "reporting (the GPT-3 appendix-C dirty-eval table) plus where to "
        "aim the crawler blocklist. Zero-hit items kept via left join — "
        "an empty report must mean clean, not silent. Plan: eval "
        "shingles are the tiny broadcast side joined into ONE exploded "
        "training scan; every later agg/window is keyed by the bounded "
        "eval grain. Reference parity: extension surface (SURVEY.md §2.C "
        "curation rows).",
)
def pipeline_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(tokens(F.col("text")), 5)
    ev = d.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("eval_id"), F.explode(sh).alias("shingle")
    )
    tr = d.where(F.col("doc_id") >= 20).select(
        F.col("doc_id").alias("train_id"), "source", F.explode(sh).alias("shingle")
    )
    hits = tr.join(F.broadcast(ev), "shingle").localCheckpoint(
        eager=True
    )  # consumed by the per-eval rollup AND the top-source window
    per = hits.groupBy("eval_id").agg(
        F.count_distinct("train_id").cast("long").alias("n_train_docs_hit"),
        F.count_distinct("shingle").cast("long").alias("n_shingles_hit"),
    )
    src = hits.groupBy("eval_id", "source").agg(
        F.count_distinct("train_id").cast("long").alias("c")
    )
    topsrc = (
        src.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("eval_id").orderBy(
                    F.col("c").desc(), F.col("source")
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("eval_id", "source")
    )
    base = d.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("eval_id")
    ).distinct()
    return (
        base.join(per, "eval_id", "left")
        .join(topsrc, "eval_id", "left")
        .select(
            F.col("eval_id").alias("eval_doc_id"),
            F.coalesce("n_train_docs_hit", F.lit(0)).alias("n_train_docs_hit"),
            F.coalesce("n_shingles_hit", F.lit(0)).alias("n_shingles_hit"),
            F.coalesce("source", F.lit("")).alias("top_source"),
        )
    )


@register(
    "pipeline_padding_waste_curve",
    oracle=f"""
    WITH toks AS (
        SELECT len({_TOKS}) AS n FROM documents
    ),
    grid AS (SELECT unnest([64, 128, 256]) AS max_len),
    per AS (
        SELECT g.max_len,
               t.n,
               least(t.n, g.max_len) AS kept,
               g.max_len - least(t.n, g.max_len) AS pad,
               greatest(t.n - g.max_len, 0) AS trunc
        FROM toks t CROSS JOIN grid g
    )
    SELECT CAST(max_len AS BIGINT) AS max_len,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM(kept) AS BIGINT) AS kept_tokens,
           CAST(SUM(pad) AS BIGINT) AS pad_tokens,
           CAST(SUM(trunc) AS BIGINT) AS truncated_tokens,
           CAST(SUM(kept) AS DOUBLE) / (SUM(kept) + SUM(pad))
               AS batch_utilization,
           CAST(SUM(trunc) AS DOUBLE) / SUM(n) AS truncation_loss_share
    FROM per GROUP BY max_len
    """,
    doc="Padding/truncation waste curve for pad-to-max_len batching: for "
        "each candidate context length in {64,128,256}, the tokens kept, "
        "padded, and truncated if every document is padded (or cut) to "
        "max_len — the capacity-planning complement to "
        "pipeline_sequence_packing's concat-then-chunk packing (pick the "
        "context length, or decide packing is worth it, from the "
        "batch_utilization column; at real corpus lengths the 3-point "
        "grid reads straight onto the standard 2k/4k/8k decision). The "
        "3-row grid explodes map-side per doc (fixed 3x fanout, no "
        "shuffle), then one 3-group rollup with exact integer sums; the "
        "two shares are single pinned divisions of exact longs. "
        "Reference parity: extension surface (SURVEY.md §2.B curation "
        "rows).",
)
def pipeline_padding_waste_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n = F.size(tokens(F.col("text"))).cast("long")
    per = d.select(n.alias("n")).select(
        "n", F.explode(F.array(F.lit(64), F.lit(128), F.lit(256))).alias("max_len")
    )
    kept = F.least(F.col("n"), F.col("max_len"))
    return (
        per.select(
            F.col("max_len").cast("long").alias("max_len"),
            "n",
            kept.alias("kept"),
            (F.col("max_len") - kept).alias("pad"),
            F.greatest(F.col("n") - F.col("max_len"), F.lit(0)).alias("trunc"),
        )
        .groupBy("max_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"),
            F.sum("kept").cast("long").alias("kept_tokens"),
            F.sum("pad").cast("long").alias("pad_tokens"),
            F.sum("trunc").cast("long").alias("truncated_tokens"),
            (
                F.sum("kept").cast("double")
                / (F.sum("kept") + F.sum("pad")).cast("double")
            ).alias("batch_utilization"),
            (F.sum("trunc").cast("double") / F.sum("n").cast("double")).alias(
                "truncation_loss_share"
            ),
        )
    )


@register(
    "pipeline_token_budget_curriculum",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, unnest({_TOKS}) AS t FROM documents
    ),
    per_src AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT t) AS BIGINT) AS n_distinct,
               CAST(CAST(COUNT(DISTINCT t) AS HUGEINT) * 1000000
                    // COUNT(*) AS BIGINT) AS diversity_ppm
        FROM tok GROUP BY source
    ),
    ranked AS (
        SELECT *,
               SUM(n_tokens) OVER (ORDER BY diversity_ppm DESC, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tokens,
               SUM(n_tokens) OVER () AS total_tokens,
               CAST(row_number() OVER (ORDER BY diversity_ppm DESC, source)
                    AS BIGINT) AS curriculum_rank
        FROM per_src
    ),
    budgets AS (SELECT unnest([25, 50, 75]) AS pct)
    SELECT CAST(b.pct AS BIGINT) AS budget_pct,
           r.source,
           r.curriculum_rank,
           r.n_tokens,
           r.diversity_ppm,
           CAST(greatest(CAST(0 AS HUGEINT), least(
                CAST(1000000 AS HUGEINT),
                (b.pct * CAST(r.total_tokens AS HUGEINT) // 100
                 - (r.cum_tokens - r.n_tokens)) * 1000000 // r.n_tokens))
                AS BIGINT) AS included_fraction_ppm
    FROM ranked r CROSS JOIN budgets b
    """,
    doc="Token-budget curriculum plan: sources ranked by lexical "
        "diversity (distinct/total token ratio — the cheap quality proxy "
        "that needs no model), then for training budgets of 25/50/75% of "
        "corpus tokens, each source's included fraction under "
        "highest-diversity-first greedy filling (1.0 = fully in, partial "
        "for the straddling source, 0 = cut) — the data-mixing sheet a "
        "budgeted pretraining run reads to decide what gets an epoch and "
        "what gets subsampled, complementing pipeline_epoch_plan (which "
        "weights by target mixture, not budget) and "
        "pipeline_mixture_temperature. One token explode -> bounded "
        "per-source aggregate; the greedy fill is cumulative arithmetic "
        "on the |sources| table (windows over a bounded domain); all "
        "fractions are exact clamped integer DIVs. Reference parity: "
        "extension surface (SURVEY.md §2.B curation rows).",
)
def pipeline_token_budget_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens(F.col("text"))).alias("t"))
    per_src = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.count_distinct("t").cast("long").alias("n_distinct"),
    ).select(
        "source",
        "n_tokens",
        "n_distinct",
        F.expr(
            "CAST(CAST(n_distinct AS DECIMAL(38,0)) * 1000000 "
            "DIV n_tokens AS BIGINT)"
        ).alias("diversity_ppm"),
    )
    word = Window.orderBy(F.col("diversity_ppm").desc(), "source")
    wcum = word.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per_src.select(
        "source",
        "n_tokens",
        "diversity_ppm",
        F.sum("n_tokens").over(wcum).alias("cum_tokens"),
        F.sum("n_tokens").over(wall).alias("total_tokens"),
        F.row_number().over(word).cast("long").alias("curriculum_rank"),
    )
    budgets = spark.range(1).select(
        F.explode(F.array(F.lit(25), F.lit(50), F.lit(75))).alias("pct")
    )
    return ranked.crossJoin(F.broadcast(budgets)).select(
        F.col("pct").cast("long").alias("budget_pct"),
        "source",
        "curriculum_rank",
        "n_tokens",
        "diversity_ppm",
        F.expr(
            "CAST(greatest(CAST(0 AS DECIMAL(38,0)), least("
            "CAST(1000000 AS DECIMAL(38,0)), "
            "(pct * CAST(total_tokens AS DECIMAL(38,0)) DIV 100 "
            "- (cum_tokens - n_tokens)) * 1000000 DIV n_tokens)) AS BIGINT)"
        ).alias("included_fraction_ppm"),
    )


@register(
    "pipeline_preference_pair_margin",
    oracle=rf"""
    WITH sc AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                    AS BIGINT) AS score
        FROM documents
    ),
    b AS (SELECT source, doc_id, score, score // 16 AS band FROM sc),
    p AS (
        SELECT source, score,
               lead(score) OVER (PARTITION BY source, band
                                 ORDER BY score DESC, doc_id) AS nscore
        FROM b
    ),
    m AS (
        SELECT source, score - nscore AS margin
        FROM p WHERE nscore IS NOT NULL
    )
    SELECT source,
           CAST(length(printf('%b', margin + 1)) - 1 AS BIGINT)
               AS margin_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(margin) AS DOUBLE) / COUNT(*), 4) AS avg_margin
    FROM m GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Preference-pair construction for reward-model / DPO data prep: "
        "within each source, documents are ranked by token count and "
        "each doc is paired with the NEXT one down (chosen = higher-"
        "scored, rejected = adjacent lower) — the rank-adjacent pairing "
        "that yields n-1 informative pairs per group in LINEAR volume, "
        "versus the quadratic all-pairs a naive preference join would "
        "produce. The output is the per-source margin distribution "
        "(log2-bucketed score gaps + exact average margin): pairs with "
        "margin 0 carry no preference signal and the histogram is how a "
        "curation run decides its margin floor. SCALE DEVICE: ranking "
        "partitions on (source, score DIV 16) bands, so no per-source "
        "global sort exists — adjacent pairs never cross a band "
        "boundary (<= 1 pair per band forfeited, deterministically), "
        "and every window task is band-bounded. Token counts are the "
        "engine-pinned whitespace tokenizer (functions/text.tokens == "
        "string_split_regex); margins are pure integers. Reference "
        "parity: extension surface (SURVEY.md §2.B pipeline rows).",
)
def pipeline_preference_pair_margin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sc = d.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("score"),
    ).withColumn("band", F.expr("score DIV 16"))
    w = Window.partitionBy("source", "band").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    pairs = sc.select(
        "source", "score", F.lead("score").over(w).alias("nscore")
    ).where(F.col("nscore").isNotNull())
    m = pairs.select("source", (F.col("score") - F.col("nscore")).alias("margin"))
    return (
        m.groupBy(
            "source",
            (F.length(F.bin(F.col("margin") + 1)) - 1)
            .cast("long")
            .alias("margin_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.sum("margin").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_margin"
            ),
        )
        .orderBy("source", "margin_bucket")
    )


@register(
    "pipeline_length_quality_selection_bias",
    oracle="""
    WITH scored AS (
        SELECT source, CAST(n_chars AS BIGINT) AS x,
               CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    mom AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        FROM scored GROUP BY source
    )
    SELECT source, n,
           CAST(round(1000000.0 * CAST(sy AS DOUBLE) / n) AS BIGINT)
               AS pass_rate_micro,
           CASE WHEN sy = 0 OR sy = n THEN NULL
                ELSE CAST(round(1000000.0
                     * CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * sy - sy * sy AS DOUBLE)))
                     AS BIGINT) END AS corr_micro
    FROM mom ORDER BY source
    """,
    doc="Selection-bias audit of a length-thresholded quality gate: per "
        "source, the point-biserial correlation between document length "
        "and passing the n_chars >= 200 filter — the curation "
        "diagnostic that quantifies HOW MUCH a 'quality' filter is "
        "really a length filter (corr near 1 = the gate selects on "
        "length, near 0 = length-neutral), which decides whether "
        "downstream length-bucketing (pipeline_length_bucketing) will "
        "see a skewed survivor population. Point-biserial r is Pearson "
        "r with a 0/1 y, so sum(y^2) = sum(y) and all five moments are "
        "exact HUGEINT/DECIMAL(38,0); the correlation is one fixed "
        "double expression, NULL (identically in both engines) for a "
        "source whose docs all pass or all fail. Plan: one map-side "
        "per-source moment aggregate over a 2-column projection — "
        "O(scan) at any corpus size. Reference parity: extension "
        "surface (SURVEY.md §2.B pipeline rows).",
)
def pipeline_length_quality_selection_bias(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    d38 = "decimal(38,0)"
    scored = d.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.when(F.col("n_chars") >= 200, 1).otherwise(0).alias("y"),
    )
    mom = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(d38)).cast(d38).alias("sx"),
        F.sum(F.col("y").cast(d38)).cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).cast(d38).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y")).cast(d38).alias("sxy"),
    )
    corr = (
        F.lit(1_000_000.0)
        * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
            * (F.col("n") * F.col("sy") - F.col("sy") * F.col("sy")).cast(
                "double"
            )
        )
    )
    return mom.select(
        "source",
        "n",
        F.round(F.lit(1_000_000.0) * F.col("sy").cast("double") / F.col("n"))
        .cast("long")
        .alias("pass_rate_micro"),
        F.when(
            (F.col("sy") == 0) | (F.col("sy") == F.col("n")), F.lit(None)
        )
        .otherwise(F.round(corr).cast("long"))
        .alias("corr_micro"),
    ).orderBy("source")
