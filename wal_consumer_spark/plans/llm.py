"""LLM-data-pipeline query surface (SURVEY.md §2.B extensions): dedup
(exact / n-gram Jaccard / MinHash-LSH / SimHash), similarity search
(brute-force + LSH), text analysis (lang-ID, quality, tokens, fingerprint),
multimodal columns. Exact variants carry DuckDB oracles; sketch/LSH variants
are deterministic but engine-specific (xxhash64), so they run rows-only and
their quality is asserted against the exact variants in tests/test_llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wal_consumer_spark.functions.multimodal import (
    attach_media_columns,
    decode_media,
    resize_media,
    sample_frames,
)
from wal_consumer_spark.functions.text import (
    LANG_LEXICONS,
    lexicon_hits,
    punct_count,
    token_count_regex,
    tokens,
    word_shingles,
)
from wal_consumer_spark.operators.partitioning import spread_small_input
from wal_consumer_spark.operators.dedup import (
    exact_dedup,
    minhash_candidate_agreement,
    minhash_candidates,
    minhash_coeffs,
    minhash_near_pairs,
    minhash_jaccard_estimate,
    minhash_signature,
    minhash_signature_from_shingles,
    prefix_filtered_jaccard,
    shingle_pairs_jaccard,
    simhash64,
    simhash_near_pairs,
)
from wal_consumer_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_near_dup_blocked,
    embedding_near_dup_pairs,
    quant_cosine,
    quant_cosine_sql,
    quantize_vec32,
    rp_lsh_bucket_sql,
    rp_lsh_buckets_np,
)
from wal_consumer_spark.plans.registry import register
from wal_consumer_spark.sources.tables import load_table

#: DuckDB fragment matching functions.text.tokens()
_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
#: DuckDB fragment matching functions.text.word_shingles(k=3)
_SHINGLES = (
    "list_distinct(list_transform(generate_series(0, greatest(len({t}) - 3, 0)), "
    "i -> array_to_string(list_slice({t}, i + 1, i + 3), ' ')))"
).format(t=_TOKS)


# --------------------------------------------------------------------------
# Dedup
# --------------------------------------------------------------------------

@register(
    "dedup_exact_hash",
    oracle="""
    SELECT sha256(text) AS content_sha,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY sha256(text)
    """,
    doc="Exact dedup by content hash; hash group keys keep shuffle narrow.",
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    ),
    shc AS (
        -- mirrors shingle_pairs_jaccard's max_df=1000 stop-shingle cap
        -- (operators/dedup.py:35): intersection counts use only shingles
        -- with document frequency <= 1000; set sizes keep the full sets
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1)
    SELECT doc1, doc2, n_common,
           round(n_common / (s1.n + s2.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE n_common / (s1.n + s2.n - n_common) >= 0.5
    """,
    doc="Exact n-gram Jaccard near-dup pairs (threshold 0.5) via shingle "
        "explode + self-join; the oracle-checkable baseline for MinHash.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = shingle_pairs_jaccard(load_table(spark, sf_dir, "documents"), "doc_id", "text")
    return (
        pairs.filter(F.col("jaccard") >= 0.5)
        .select(
            F.col("doc1"), F.col("doc2"), F.col("n_common"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


@register(
    "dedup_prefix_filter_jaccard",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1)
    SELECT doc1, doc2, n_common,
           s1.n + s2.n - n_common AS n_union,
           round(n_common * 1.0 / (s1.n + s2.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE n_common * 5 >= (s1.n + s2.n - n_common) * 3
    """,
    doc="Exact Jaccard similarity join (threshold 3/5) via PPJoin-style "
        "prefix filtering — the LOSSLESS fast path: shingles are globally "
        "ordered by ascending document frequency, candidate generation "
        "equi-joins only each doc's first n - ceil(t*n) + 1 prefix "
        "shingles (rarest first), and exact verification touches the "
        "survivors only (165 candidates vs 11 533 for the raw "
        "shared-shingle join at sf0.01, same 25 result pairs). The "
        "oracle is the UNFILTERED all-pairs formulation, so the driver "
        "hash certifies the prefix-filter theorem end-to-end "
        "(SSJoin'06/PPJoin'08; threshold arithmetic is integer-exact). "
        "Complements dedup_minhash_lsh: exact where LSH is "
        "probabilistic. tests/test_llm.py asserts losslessness and the "
        "candidate-count reduction.",
)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prefix_filtered_jaccard(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


def _minhash_lsh_sql() -> str:
    """DuckDB replay of the full portable MinHash+LSH pipeline: identical
    md5-prefix shingle hashes, identical (a,b) permutation coefficients
    (operators/dedup.py::minhash_coeffs), identical band slicing — so the
    candidate pairs and signature-agreement estimates hash-match Spark's."""
    coeffs = "[" + ", ".join(f"[{a}, {b}]" for a, b in minhash_coeffs(32, 7)) + "]"
    return f"""
    WITH hs AS (
        SELECT doc_id,
               list_transform({_SHINGLES},
                              s -> ('0x' || substring(md5(s), 1, 8))::BIGINT) AS h
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               list_transform({coeffs}, c ->
                   list_min(list_transform(h, x -> (c[1] * x + c[2]) % 4294967311))) AS sig
        FROM hs
    ),
    banded AS (
        SELECT doc_id, sig, b.b AS band,
               array_to_string(list_slice(sig, b.b * 8 + 1, b.b * 8 + 8), ',') AS bucket
        FROM sig, (SELECT unnest(range(0, 4)) AS b) b
    ),
    pairs AS (
        SELECT a.doc_id AS doc1, c.doc_id AS doc2, a.sig AS sig1, c.sig AS sig2
        FROM banded a JOIN banded c USING (band, bucket)
        WHERE a.doc_id < c.doc_id
    ),
    est AS (
        SELECT doc1, doc2,
               MAX(list_sum(list_transform(range(1, 33),
                       i -> CASE WHEN sig1[i] = sig2[i] THEN 1 ELSE 0 END)) / 32.0)
                   AS est
        FROM pairs GROUP BY doc1, doc2
    )
    SELECT doc1, doc2, round(est, 6) AS est_jaccard
    FROM est WHERE est >= 0.4
    """


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_lsh_sql(),
    doc="MinHash(32 perms)+LSH(4 bands x 8 rows) candidate pairs with "
        "estimated Jaccard — the 100 TB near-dup path (bounded band join, "
        "no shingle-frequency skew). Runs with portable md5-prefix hashes "
        "so the DuckDB oracle replays signatures, banding, and estimates "
        "bit-for-bit (the production default is xxhash64 — same plan, "
        "cheaper hash). Recall vs the exact variant is asserted in "
        "tests/test_llm.py.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition before the CPU-heavy signature map: a small corpus arrives
    # as few parquet splits, which would serialize the hashing on one core
    # (at 100 TB the scan is naturally wide and this shuffle is a no-op cost
    # relative to the signature compute it parallelizes). The partition count
    # is explicit — AQE would otherwise coalesce the few-MB shuffle to one
    # partition, which is the wrong call for compute-bound maps.
    docs = spread_small_input(load_table(spark, sf_dir, "documents"), "doc_id")
    # persist: signatures feed both sides of the band self-join — without it
    # the (expensive) shingle+hash expression runs twice.
    sigs = minhash_signature(docs, "doc_id", "text", portable=True).persist()
    return (
        minhash_near_pairs(sigs, portable=True)
        .filter(F.col("est_jaccard") >= 0.4)
        .select("doc1", "doc2", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


_SIMHASH_SQL = f"""
    WITH th AS (
        SELECT doc_id,
               list_transform({_TOKS},
                              t -> ('0x' || substring(md5(t), 1, 15))::BIGINT) AS th
        FROM documents
    ),
    fp AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(range(0, 60), b ->
                   CASE WHEN list_sum(list_transform(th, h ->
                            CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
                        THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))
               AS BIGINT) AS simhash
        FROM th
    ),
    chunked AS (
        SELECT doc_id, simhash, c.i AS chunk_idx,
               ((simhash >> (c.i * 15)) & 32767) AS chunk_val
        FROM fp, (SELECT unnest(range(0, 4)) AS i) c
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
                        a.simhash AS h1, b.simhash AS h2
        FROM chunked a JOIN chunked b USING (chunk_idx, chunk_val)
        WHERE a.doc_id < b.doc_id
    )
    SELECT doc1, doc2, CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
    FROM pairs WHERE bit_count(xor(h1, h2)) <= 8
    """


@register(
    "dedup_simhash",
    oracle=_SIMHASH_SQL,
    doc="SimHash fingerprints + near-pairs within Hamming distance 8, "
        "blocked on 15-bit chunks (pigeonhole) so no O(n^2) scan. Runs the "
        "portable 60-bit md5-hash variant so the DuckDB oracle replays "
        "fingerprints, chunk blocking, and Hamming filtering bit-for-bit "
        "(production default: 64-bit xxhash64, same plan).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 second look — spread REVERTED on measurement: unlike the
    # minhash pipelines (32 permutations per shingle; spread measured
    # 1.72 vs 2.80 s fresh-JVM), simhash's per-row work is one md5 +
    # bit-score pass, light enough that the added exchange + worker
    # fan-out cost more than the single-task kernel (A/B medians
    # 1.27 s spread vs 1.18 s unspread on a worse probe).
    docs = load_table(spark, sf_dir, "documents")
    fps = simhash64(docs, "doc_id", "text", portable=True)
    return simhash_near_pairs(fps, max_hamming=8, n_chunks=4, chunk_bits=15)


def _dedup_lsh_eval_sql() -> str:
    """Composes the exact-Jaccard truth CTEs (dedup_ngram_jaccard) with the
    portable MinHash+LSH replay CTEs (dedup_minhash_lsh) and compares the
    two pair sets."""
    coeffs = "[" + ", ".join(f"[{a}, {b}]" for a, b in minhash_coeffs(32, 7)) + "]"
    return f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    ),
    shc AS (
        -- mirrors shingle_pairs_jaccard's max_df=1000 stop-shingle cap
        -- (operators/dedup.py:35): intersection counts use only shingles
        -- with document frequency <= 1000; set sizes keep the full sets
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    truth AS (
        SELECT doc1, doc2 FROM inter
        JOIN sizes s1 ON s1.doc_id = doc1
        JOIN sizes s2 ON s2.doc_id = doc2
        WHERE n_common / (s1.n + s2.n - n_common) >= 0.5
    ),
    hs AS (
        SELECT doc_id,
               list_transform({_SHINGLES},
                              s -> ('0x' || substring(md5(s), 1, 8))::BIGINT) AS h
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               list_transform({coeffs}, c ->
                   list_min(list_transform(h, x -> (c[1] * x + c[2]) % 4294967311))) AS sig
        FROM hs
    ),
    banded AS (
        SELECT doc_id, sig, b.b AS band,
               array_to_string(list_slice(sig, b.b * 8 + 1, b.b * 8 + 8), ',') AS bucket
        FROM sig, (SELECT unnest(range(0, 4)) AS b) b
    ),
    cand AS (
        SELECT a.doc_id AS doc1, c.doc_id AS doc2, a.sig AS sig1, c.sig AS sig2
        FROM banded a JOIN banded c USING (band, bucket)
        WHERE a.doc_id < c.doc_id
    ),
    est AS (
        SELECT doc1, doc2,
               MAX(list_sum(list_transform(range(1, 33),
                       i -> CASE WHEN sig1[i] = sig2[i] THEN 1 ELSE 0 END)) / 32.0)
                   AS est
        FROM cand GROUP BY doc1, doc2
    ),
    pred AS (SELECT doc1, doc2 FROM est WHERE est >= 0.4),
    m AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM pred) AS n_pred,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM truth JOIN pred USING (doc1, doc2)) AS tp
    )
    SELECT n_truth, n_pred, tp,
           round(CAST(tp AS DOUBLE) / n_pred, 6) AS lsh_precision,
           round(CAST(tp AS DOUBLE) / n_truth, 6) AS lsh_recall,
           CASE WHEN tp = 0 THEN 0.0
                ELSE round(2 * (CAST(tp AS DOUBLE) / n_pred)
                             * (CAST(tp AS DOUBLE) / n_truth)
                           / ((CAST(tp AS DOUBLE) / n_pred)
                              + (CAST(tp AS DOUBLE) / n_truth)), 6)
           END AS lsh_f1
    FROM m
    """


@register(
    "dedup_lsh_eval",
    oracle=_dedup_lsh_eval_sql(),
    doc="Dedup-pipeline quality certification: precision/recall/F1 of the "
        "MinHash(32)+LSH(4x8) candidate set (est >= 0.4) against the "
        "exact shingle-Jaccard >= 0.5 ground truth — the number you tune "
        "bands/rows/thresholds against before trusting LSH on the full "
        "corpus (the dedup analog of sim_ann_recall_eval). Both pipelines "
        "run in ONE plan with the portable md5 hash tier so the oracle "
        "replays truth, candidates, and estimates bit-for-bit; the three "
        "pair-set cardinalities are in-plan scalar aggregates (no "
        "collect), and P/R/F1 are divisions of those exact integers. At "
        "100 TB the exact truth side is the expensive half — run it on a "
        "hash-sampled doc subset (pipeline_sample_k_per_group's gate) "
        "against the same LSH index; the comparison plan is unchanged. "
        "Reference parity: extension surface (SURVEY.md §2.B dedup rows).",
)
def dedup_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    truth = (
        shingle_pairs_jaccard(docs, "doc_id", "text")
        .filter(F.col("jaccard") >= 0.5)
        .select("doc1", "doc2")
    )
    sigs = minhash_signature(
        spread_small_input(docs, "doc_id"),
        "doc_id",
        "text",
        portable=True,
    ).persist()
    pred = (
        minhash_near_pairs(sigs, portable=True)
        .filter(F.col("est_jaccard") >= 0.4)
        .select("doc1", "doc2")
    )
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    npred = pred.agg(F.count(F.lit(1)).cast("long").alias("n_pred"))
    tp = truth.join(pred, ["doc1", "doc2"]).agg(
        F.count(F.lit(1)).cast("long").alias("tp")
    )
    m = nt.crossJoin(F.broadcast(npred)).crossJoin(F.broadcast(tp))
    p = F.col("tp").cast("double") / F.col("n_pred")
    r = F.col("tp").cast("double") / F.col("n_truth")
    return m.select(
        "n_truth",
        "n_pred",
        "tp",
        F.round(p, 6).alias("lsh_precision"),
        F.round(r, 6).alias("lsh_recall"),
        F.when(F.col("tp") == 0, F.lit(0.0))
        .otherwise(F.round(2 * p * r / (p + r), 6))
        .alias("lsh_f1"),
    )


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

@register(
    "sim_topk_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
               FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, c.vec_id AS cand_id,
               round(list_cosine_similarity(q.qvec, CAST(c.embedding AS DOUBLE[])), 6) AS cosine_sim
        FROM embeddings c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, cand_id, cosine_sim, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_sim DESC, cand_id) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
    doc="Exact brute-force cosine top-10 for 5 query vectors: broadcast "
        "queries, stream the corpus, rank per query (JVM-side zip_with dot).",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 5), k=10)


def _sim_topk_lsh_sql(dim: int = 64, nbits: int = 4, n_tables: int = 8, k: int = 10) -> str:
    """DuckDB replay of the multi-table sign-random-projection top-k: the
    bucket ids are integer-exact (operators/similarity.py::rp_lsh_bucket),
    so candidates, scores, and ranks hash-match Spark's."""
    branches = "\n        UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS tbl, "
        f"{rp_lsh_bucket_sql('v', dim, nbits, seed=42 + t)} AS bucket FROM e"
        for t in range(n_tables)
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cb AS (
        {branches}
    ),
    qb AS (SELECT vec_id AS query_id, v AS qv, tbl, bucket FROM cb WHERE vec_id < 5),
    cand AS (
        SELECT DISTINCT q.query_id, c.vec_id AS cand_id, q.qv, c.v AS cv
        FROM cb c JOIN qb q USING (tbl, bucket)
        WHERE c.vec_id <> q.query_id
    ),
    scored AS (
        SELECT query_id, cand_id,
               round(list_cosine_similarity(qv, cv), 6) AS cosine_sim
        FROM cand
    )
    SELECT query_id, cand_id, cosine_sim, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_sim DESC, cand_id) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


@register(
    "sim_topk_lsh",
    oracle=_sim_topk_lsh_sql(),
    doc="Sign-random-projection LSH bucketed top-k: the scale path (bucket "
        "equi-join replaces the O(N*Q) cross join). Buckets come from "
        "integer dot products over fixed-point-quantized vectors, so the "
        "DuckDB oracle replays the whole approximate search bit-for-bit. "
        "Recall vs brute force asserted in tests/test_llm.py.",
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(emb, emb.filter(F.col("vec_id") < 5), dim=64, k=10, nbits=4)


@register(
    "sim_topk_ivf",
    oracle="""
    SELECT vec_id AS query_id, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
    doc="IVF (inverted-file) top-k: spherical-kmeans lists trained on a "
        "bounded sample, corpus bucketed by nearest centroid, queries probe "
        "their nprobe nearest lists via a cluster equi-join. At 100 TB the "
        "cluster column is computed at ingest and the table partitioned by "
        "it (partition pruning per probe). The trained centroids are "
        "engine-internal, so the driver-checked output is engine-"
        "independent: per query, an in-plan boolean that IVF recall@10 vs "
        "the exact brute-force top-10 (computed in the same plan) is >= "
        "0.5; the oracle asserts the query set and literal TRUE. The "
        "aggregate recall bar (>=0.6) is asserted in tests/test_llm.py.",
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    approx = cosine_topk_ivf(emb, queries, k=10, n_clusters=16, nprobe=6)
    exact = cosine_topk_bruteforce(emb, queries, k=10)
    hits = exact.select("query_id", "cand_id").join(
        approx.select("query_id", "cand_id"), ["query_id", "cand_id"], "left_semi"
    )
    n_exact = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    n_hit = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_exact.join(n_hit, "query_id", "left")
        .select(
            "query_id",
            (
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact") >= 0.5
            ).alias("recall_ok"),
        )
        .orderBy("query_id")
    )


@register(
    "sim_ivf_nprobe_curve",
    oracle="""
    SELECT c AS nprobe, 5 AS n_queries,
           TRUE AS recall_ge_prev, TRUE AS exact_at_full
    FROM (SELECT unnest([1, 2, 4, 16]) AS c)
    ORDER BY nprobe
    """,
    doc="IVF tuning curve certification: recall@10 swept over nprobe in "
        "{1, 2, 4, 16} against the in-plan brute-force truth — the table "
        "an ANN operator reads to pick its latency/recall point. "
        "Centroids train ONCE on the bounded sample and the corpus is "
        "assigned ONCE (at 100 TB the cluster column is an ingest-time "
        "partition key; each sweep point just probes more partitions); "
        "only the query-side probe explode varies per point. Trained "
        "centroids are engine-internal, so the driver-checked output is "
        "the engine-independent CONTRACT of any IVF index: recall is "
        "monotone non-decreasing in nprobe (a larger probe set is a "
        "superset — asserted per point vs the previous), and probing "
        "ALL lists (nprobe = n_clusters = 16) IS exact search "
        "(hits == brute-force top-k, asserted). Actual recall values "
        "are asserted in tests/test_llm.py. Reference parity: extension "
        "surface (SURVEY.md §2.C similarity rows).",
)
def sim_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.similarity import (
        cosine,
        cosine_topk_bruteforce,
        ivf_assign,
        ivf_probes,
        train_ivf_centroids,
    )
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    centroids = train_ivf_centroids(emb)
    corpus = ivf_assign(
        emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cvec")),
        centroids,
        "cvec",
    ).persist()
    exact = cosine_topk_bruteforce(emb, queries, k=10).persist()
    n_exact = exact.count()
    prev_hits = 0
    rows = []
    for nprobe in (1, 2, 4, 16):
        q = ivf_probes(
            queries.select(
                F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
            ),
            centroids,
            "qvec",
            nprobe,
        )
        scored = (
            corpus.join(broadcast(q), "cluster")
            .filter(F.col("cand_id") != F.col("query_id"))
            .select(
                "query_id",
                "cand_id",
                F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias(
                    "cosine_sim"
                ),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine_sim").desc(), F.col("cand_id")
        )
        approx = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("query_id", "cand_id")
        )
        hits = (
            exact.select("query_id", "cand_id")
            .join(approx, ["query_id", "cand_id"], "left_semi")
            .count()
        )
        rows.append(
            (
                nprobe,
                5,
                hits >= prev_hits,
                (nprobe < 16) or (hits == n_exact),
            )
        )
        prev_hits = hits
    corpus.unpersist()
    exact.unpersist()
    return spark.createDataFrame(
        rows, "nprobe int, n_queries int, recall_ge_prev boolean, exact_at_full boolean"
    ).orderBy("nprobe")


def _near_dup_blocked_sql(
    dim: int = 64, nbits: int = 4, n_tables: int = 12, seed: int = 77,
    threshold: float = 0.45, sig_bits: int = 256, sig_seed: int = 9001,
) -> str:
    """DuckDB replay of the LSH-blocked embedding near-dup search: identical
    integer bucket ids, identical sign-signature Hamming prefilter
    (xor + bit_count over the same packed 32-bit words), identical narrow
    candidate join, identical quantized-cosine verify (int64 sums + scalar
    IEEE doubles — see operators/similarity.py::quant_cosine)."""
    from wal_consumer_spark.operators.similarity import (
        default_sig_cut,
        quant_cosine_sql,
        rp_sign_sig_words_sql,
    )

    cut = default_sig_cut(threshold, sig_bits)  # single source of truth
    words = rp_sign_sig_words_sql("v", dim, sig_bits, sig_seed)
    sig_select = ", ".join(f"{w} AS s{i}" for i, w in enumerate(words))
    # DuckDB bit_count returns TINYINT; widen before summing (256 bits max)
    hamming = " + ".join(
        f"CAST(bit_count(xor(sa.s{i}, sb.s{i})) AS INTEGER)"
        for i in range(len(words))
    )
    branches = "\n        UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, "
        f"{rp_lsh_bucket_sql('v', dim, nbits, seed=seed + t)} AS bucket FROM e"
        for t in range(n_tables)
    )
    qvec = (
        f"list_transform(range(1, {dim + 1}), "
        f"i -> CAST(round(v[i] * 1000000.0) AS BIGINT))"
    )
    qcos = quant_cosine_sql("q1", "q2", dim)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cb AS (
        {branches}
    ),
    s AS (SELECT vec_id, {sig_select} FROM e),
    pairs AS (
        SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
        FROM cb a JOIN cb b USING (tbl, bucket)
        JOIN s sa ON sa.vec_id = a.vec_id
        JOIN s sb ON sb.vec_id = b.vec_id
        WHERE a.vec_id < b.vec_id AND {hamming} <= {cut}
    ),
    q AS (SELECT vec_id, {qvec} AS qv FROM e),
    cand AS (
        SELECT id1, id2, qa.qv AS q1, qb.qv AS q2
        FROM pairs
        JOIN q qa ON qa.vec_id = pairs.id1
        JOIN q qb ON qb.vec_id = pairs.id2
    )
    SELECT id1, id2, round({qcos}, 6) AS cosine_sim
    FROM cand
    WHERE round({qcos}, 6) >= {threshold}
    """


@register(
    "sim_embedding_near_dup",
    oracle=_near_dup_blocked_sql(),
    doc="Embedding-cosine near-duplicate pairs at threshold 0.45 via "
        "multi-table LSH blocking + 256-bit sign-signature Hamming "
        "prefilter + exact cosine verification — the 100 TB path: every "
        "join is a bucket equi-join, no cross join in the physical plan "
        "(asserted in tests/test_scale_plans.py), and the codegen'd "
        "xor/bit_count prefilter drops ~99% of random bucket collisions "
        "in the join stage before the distinct or any vector payload. "
        "Buckets, signatures, and the cut are integer-exact, so the DuckDB "
        "oracle replays blocking, prefilter, and verification bit-for-bit; "
        "recall vs the exact all-pairs baseline "
        "(operators/similarity.py::embedding_near_dup_pairs) is asserted "
        "in tests/test_llm.py.",
)
def sim_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_blocked(
        load_table(spark, sf_dir, "embeddings"),
        dim=64,
        threshold=0.45,
        nbits=4,
        n_tables=12,
        seed=77,
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

@register(
    "text_token_stats",
    oracle=rf"""
    SELECT doc_id,
           len({_TOKS}) AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish_tokens,
           length(text) AS n_chars_measured,
           n_chars
    FROM documents
    """,
    doc="Token counting: whitespace tokens + BPE-ish regex tokens.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_ws_tokens"),
        token_count_regex("text").cast("long").alias("n_bpeish_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        "n_chars",
    )


def _langid_sql() -> str:
    scores = ",\n           ".join(
        f"len(list_filter({_TOKS}, t -> list_contains({list(LANG_LEXICONS[lang])!r}, t))) AS s_{lang}"
        for lang in LANG_LEXICONS
    )
    m = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_LEXICONS) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lang} = {m} THEN '{lang}'" for lang in LANG_LEXICONS
    ) + " END"
    return f"""
    WITH scored AS (
        SELECT doc_id, lang,
           {scores}
        FROM documents
    )
    SELECT doc_id, lang AS labeled_lang, {case} AS predicted_lang
    FROM scored
    """


@register(
    "text_langid",
    oracle=_langid_sql(),
    doc="Language-ID heuristic: stopword-lexicon hit counts, argmax with a "
        "fixed tie-break order (first lexicon wins).",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    scored = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[lexicon_hits(tok, lang).alias(f"s_{lang}") for lang in LANG_LEXICONS],
    )
    m = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_LEXICONS])
    expr = None
    for lang in LANG_LEXICONS:
        cond = F.col(f"s_{lang}") == m
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return scored.select("doc_id", "labeled_lang", expr.alias("predicted_lang"))


@register(
    "text_quality",
    oracle=rf"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           round(length(text) / greatest(len({_TOKS}), 1), 6) AS chars_per_token,
           round((length(text) - length(regexp_replace(text, '[.,;:!?''"()]', '', 'g'))) /
                 greatest(length(text), 1), 6) AS punct_ratio,
           round(len(list_filter({_TOKS}, t -> list_contains(['the','and','of','to','in','is','a'], t))) /
                 greatest(len({_TOKS}), 1), 6) AS stopword_ratio,
           (length(text) >= 100 AND len({_TOKS}) >= 20) AS passes_length_gate
    FROM documents
    """,
    doc="Quality scoring: length, chars/token, punctuation ratio, stopword "
        "ratio, and a pass/fail length gate.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    n_tok = F.size(tok).cast("long")
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(F.length("text") / F.greatest(n_tok, F.lit(1)), 6).alias("chars_per_token"),
        F.round(punct_count("text") / F.greatest(F.length("text").cast("long"), F.lit(1)), 6)
        .alias("punct_ratio"),
        F.round(
            lexicon_hits(tok, "en").cast("long") / F.greatest(n_tok, F.lit(1)), 6
        ).alias("stopword_ratio"),
        ((F.length("text") >= 100) & (n_tok >= 20)).alias("passes_length_gate"),
    )


@register(
    "text_fingerprint",
    oracle=rf"""
    SELECT doc_id,
           md5(concat(lower(trim(text)), '')) AS exact_fp,
           md5(array_to_string(list_sort({_TOKS}), ' ')) AS bag_fp
    FROM documents
    """,
    doc="Document fingerprinting: md5 of normalized text (order-sensitive) "
        "and of the sorted token bag (order-insensitive).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("exact_fp"),
        F.md5(F.array_join(F.sort_array(tok), " ")).alias("bag_fp"),
    )


# --------------------------------------------------------------------------
# Multimodal columns
# --------------------------------------------------------------------------

@register(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           octet_length(encode(text)) AS n_bytes,
           CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
           CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                     ELSE 1 + octet_length(encode(text)) % 30 END AS INTEGER) AS n_frames
    FROM documents
    """,
    doc="Multimodal decode plumbing: binary payload + typed metadata through "
        "an Arrow-batched mapInPandas decoder (deterministic fake decode — "
        "real codecs are stubbed; see functions/multimodal.py).",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(d, "doc_id", "text", "source")
    return decode_media(media, fake=True).select(
        "media_id", "kind", "n_bytes", "width", "height", "n_frames"
    )


@register(
    "multimodal_kind_stats",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           COUNT(*) AS n,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MIN(octet_length(encode(text))) AS min_bytes,
           MAX(octet_length(encode(text))) AS max_bytes
    FROM documents GROUP BY 1
    """,
    doc="Typed-metadata aggregation over binary media payloads.",
)
def multimodal_kind_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(d, "doc_id", "text", "source")
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.min(F.octet_length("payload")).cast("int").alias("min_bytes"),
        F.max(F.octet_length("payload")).cast("int").alias("max_bytes"),
    )


_PAIR_SAMP_SALT = ":pairsamp7"
_PAIR_SAMP_PCT = 20


@register(
    "sim_pair_distance_histogram",
    oracle=f"""
    WITH s AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(round(x * 1000) AS BIGINT)) AS q
        FROM embeddings
        WHERE ('0x' || substring(md5(CAST(vec_id AS VARCHAR)
                                     || '{_PAIR_SAMP_SALT}'), 1, 8))::BIGINT
              % 100 < {_PAIR_SAMP_PCT}
    ),
    n AS (
        SELECT vec_id, q,
               CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nn
        FROM s
    ),
    pairs AS (
        SELECT CAST(list_sum(list_transform(range(1, 65),
                                            i -> a.q[i] * b.q[i]))
                    AS DOUBLE)
               / sqrt(CAST(a.nn AS DOUBLE) * CAST(b.nn AS DOUBLE)) AS cos
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE a.nn > 0 AND b.nn > 0
    )
    SELECT CAST(floor(cos * 10) AS INT) AS cos_bin,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(round(cos * 1000000) AS BIGINT)) AS DOUBLE)
                 / 1000000 / COUNT(*), 6) AS avg_cos
    FROM pairs GROUP BY 1 ORDER BY 1
    """,
    doc="Embedding-space geometry histogram: the distribution of pairwise "
        "cosines over a deterministic md5 block-sample of vectors — the "
        "collapse/hubness diagnostic run before trusting any ANN index "
        "(a healthy space is spread; a collapsed encoder piles mass near "
        "cos=1). BLOCK sampling makes all-pairs safe at any scale: "
        "keep-rate p is chosen so E[|S|]^2 stays a constant target "
        "(p ~ target/n), so the self-join over the sampled set is a "
        "bounded enumeration — the same bounded-sample class as IVF "
        "training (operators/similarity.py) — while corpus-sized work is "
        "one scan-resident hash filter. Components quantize to exact "
        "milli-unit longs (integer dot products and norms; one "
        "sqrt+divide on identical doubles), per-pair cosines re-quantize "
        "to micro-units before the avg sum so both engines agree to the "
        "last bit. Reference parity: extension surface (SURVEY.md §2.C "
        "similarity rows).",
)
def sim_pair_distance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    gate = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("vec_id").cast("string"),
                            F.lit(_PAIR_SAMP_SALT),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(100),
        )
        < _PAIR_SAMP_PCT
    )
    q = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
    )
    nn = F.aggregate(
        F.transform("q", lambda a: a * a),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    s = (
        emb.where(gate)
        .select("vec_id", q.alias("q"))
        .withColumn("nn", nn)
        .where(F.col("nn") > 0)
    )
    b = s.select(
        F.col("vec_id").alias("vid_b"),
        F.col("q").alias("qb"),
        F.col("nn").alias("nn_b"),
    )
    dot = F.aggregate(
        F.zip_with("q", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cos = dot.cast("double") / F.sqrt(
        F.col("nn").cast("double") * F.col("nn_b").cast("double")
    )
    pairs = (
        s.join(F.broadcast(b), F.col("vec_id") < F.col("vid_b"))
        .select(cos.alias("cos"))
    )
    return (
        pairs.groupBy(F.floor(F.col("cos") * 10).cast("int").alias("cos_bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(
                F.sum(F.round(F.col("cos") * 1_000_000).cast("long"))
                .cast("double")
                / 1_000_000
                / F.count(F.lit(1)),
                6,
            ).alias("avg_cos"),
        )
        .orderBy("cos_bin")
    )


@register(
    "multimodal_chunk_manifest",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               octet_length(encode(text)) AS n_bytes
        FROM documents
        WHERE octet_length(encode(text)) > 0
    )
    SELECT media_id, kind,
           CAST(c AS INTEGER) AS chunk_idx,
           CAST(c * 512 AS BIGINT) AS byte_start,
           CAST(least(512, n_bytes - c * 512) AS BIGINT) AS byte_len,
           CAST((n_bytes - 1) // 512 + 1 AS INTEGER) AS n_chunks
    FROM m, UNNEST(generate_series(0, (n_bytes - 1) // 512)) AS t(c)
    """,
    doc="Chunk manifest for bounded-memory media processing: each binary "
        "payload split into 512-byte ranges (media_id, chunk_idx, "
        "byte_start, byte_len) — the I/O plan a 100 TB blob pipeline "
        "computes BEFORE any decode so every mapInPandas/mapInArrow task "
        "reads a bounded byte range instead of whole blobs (the Arrow "
        "batch shape stays flat regardless of blob size; a 4 GB video "
        "becomes ~8k manifest rows that partition freely). Boundaries "
        "are pure in-plan arithmetic — explode(sequence(...)) map-side, "
        "no UDF, no shuffle; manifest volume = total_bytes/512 rows, "
        "linear in corpus size. Zero-byte payloads are excluded on both "
        "engines (no empty chunks). Reference parity: extension surface "
        "(SURVEY.md §2.C multimodal rows).",
)
def multimodal_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(d, "doc_id", "text", "source")
    m = media.select(
        "media_id",
        "kind",
        F.octet_length("payload").cast("long").alias("n_bytes"),
    ).where(F.col("n_bytes") > 0)
    last_chunk = F.expr("(n_bytes - 1) div 512")
    return m.select(
        "media_id",
        "kind",
        F.explode(F.sequence(F.lit(0).cast("long"), last_chunk)).alias("ci"),
        "n_bytes",
        (last_chunk + 1).cast("int").alias("n_chunks"),
    ).select(
        "media_id",
        "kind",
        F.col("ci").cast("int").alias("chunk_idx"),
        (F.col("ci") * 512).alias("byte_start"),
        F.least(
            F.lit(512).cast("long"),
            F.col("n_bytes") - F.col("ci") * 512,
        ).alias("byte_len"),
        "n_chunks",
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH v AS (SELECT doc_id, encode(text) AS payload,
                      1 + octet_length(encode(text)) % 30 AS n_frames
               FROM documents WHERE doc_id % 3 = 2),
         e AS (SELECT doc_id, payload, unnest(range(0, n_frames, 4)) AS f FROM v)
    SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
           lower(substring(hex(payload), CAST(f * 16 AS INTEGER) + 1, 16)) AS frame_hex
    FROM e
    """,
    doc="Video frame sampling: decode -> keep every 4th frame, one row per "
        "frame (1-to-N mapInPandas batch shape; extraction stubbed "
        "deterministically, functions/multimodal.py::sample_frames). The "
        "frame payload surfaces as hex so the oracle compare is on strings, "
        "not engine-specific binary wrappers.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(d, "doc_id", "text", "source")
    frames = sample_frames(decode_media(media, fake=True), every_n=4, frame_len=8)
    return frames.select(
        "media_id", "frame_idx", F.lower(F.hex("frame_bytes")).alias("frame_hex")
    )


@register(
    "multimodal_resize_meta",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      CASE WHEN doc_id % 3 = 0 THEN 'image'
                           WHEN doc_id % 3 = 1 THEN 'audio'
                           ELSE 'video' END AS kind,
                      CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
                      CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INTEGER) AS height
               FROM documents)
    SELECT media_id, kind, width, height,
           CAST(floor(width * least(1.0, least(CAST(32 AS DOUBLE) / width,
                                               CAST(32 AS DOUBLE) / height))) AS INTEGER) AS out_width,
           CAST(floor(height * least(1.0, least(CAST(32 AS DOUBLE) / width,
                                                CAST(32 AS DOUBLE) / height))) AS INTEGER) AS out_height
    FROM m
    """,
    doc="Resize planning over decoded media metadata: aspect-preserving "
        "bound to 32x32, pure JVM arithmetic post-decode.",
)
def multimodal_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(d, "doc_id", "text", "source")
    return resize_media(decode_media(media, fake=True), max_w=32, max_h=32).select(
        "media_id", "kind", "width", "height", "out_width", "out_height"
    )


@register(
    "dedup_clusters_cc",
    oracle=f"""
    WITH RECURSIVE
    sh AS (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents),
    shc AS (
        -- mirrors shingle_pairs_jaccard's max_df=1000 stop-shingle cap
        -- (operators/dedup.py:35): intersection counts use only shingles
        -- with document frequency <= 1000; set sizes keep the full sets
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    pairs AS (
        SELECT doc1, doc2 FROM inter
        JOIN sizes s1 ON s1.doc_id = doc1
        JOIN sizes s2 ON s2.doc_id = doc2
        WHERE n_common / (s1.n + s2.n - n_common) >= 0.5
    ),
    sym AS (SELECT doc1 AS a, doc2 AS b FROM pairs
            UNION SELECT doc2, doc1 FROM pairs
            UNION SELECT doc1, doc1 FROM pairs
            UNION SELECT doc2, doc2 FROM pairs),
    reach AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    comp AS (SELECT a AS node, MIN(b) AS component FROM reach GROUP BY a)
    SELECT component, COUNT(*) AS n_members, component AS canonical_id
    FROM comp GROUP BY component
    """,
    doc="Near-dup clustering: exact Jaccard>=0.5 pairs -> connected "
        "components (alternating large-star/small-star, operators/graph.py) "
        "-> (component, size, canonical doc). The oracle replays the "
        "clustering with a recursive transitive closure, feasible at oracle "
        "scale; the Spark path is O(log^2 n) bounded-shuffle rounds at any "
        "scale.",
)
def dedup_clusters_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.graph import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_pairs_jaccard(docs, "doc_id", "text").filter(
        F.col("jaccard") >= 0.5
    )
    return dedup_clusters(pairs.select("doc1", "doc2"))


@register(
    "pipeline_corpus_curation",
    oracle=rf"""
    WITH scored AS (
        SELECT doc_id, source, lang, text,
               len({_TOKS}) AS n_tokens,
               (length(text) - length(regexp_replace(text, '[.,;:!?''"()]', '', 'g')))
                 / greatest(length(text), 1) AS punct_ratio
        FROM documents
    ),
    gated AS (
        SELECT * FROM scored
        WHERE length(text) >= 100 AND n_tokens >= 20
          AND punct_ratio < 0.2 AND lang = 'en'
    ),
    fp AS (SELECT *, md5(lower(trim(text))) AS content_fp FROM gated),
    canon AS (
        SELECT * FROM fp
        QUALIFY row_number() OVER (PARTITION BY content_fp ORDER BY doc_id) = 1
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
    FROM canon GROUP BY source
    """,
    doc="End-to-end training-data curation pipeline: quality gate (length, "
        "token count, punctuation ratio) -> language gate -> exact "
        "content-hash dedup keeping the smallest doc_id -> per-source corpus "
        "stats. One linear plan: the gates are a single scan's filter (all "
        "pushdown-friendly), dedup shuffles narrow (fp, doc_id, n_tokens) "
        "rows once, and the final rollup reuses that shuffle's partitioning. "
        "This is the composition a 100 TB curation job runs nightly; each "
        "stage is individually covered by text_quality / text_langid / "
        "dedup_exact_hash.",
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    n_tok = F.size(tok).cast("long")
    scored = d.select(
        "doc_id",
        "source",
        "lang",
        "text",
        n_tok.alias("n_tokens"),
        (
            punct_count("text")
            / F.greatest(F.length("text").cast("long"), F.lit(1))
        ).alias("punct_ratio"),
    )
    gated = scored.filter(
        (F.length("text") >= 100)
        & (F.col("n_tokens") >= 20)
        & (F.col("punct_ratio") < 0.2)
        & (F.col("lang") == "en")
    )
    fp = gated.select(
        "doc_id", "source", "n_tokens",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_fp"),
    )
    w = Window.partitionBy("content_fp").orderBy("doc_id")
    canon = (
        fp.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    )
    return canon.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
    )


@register(
    "text_rolling_hash",
    oracle=rf"""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform({_TOKS},
                       t -> ('0x' || substring(md5(t), 1, 8))::BIGINT)),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_fp,
           len({_TOKS}) AS n_tokens
    FROM documents
    """,
    doc="Karp-Rabin rolling-hash document fingerprint: each token hashes to "
        "a 32-bit int (md5 prefix — identical in both engines), folded left "
        "with acc*31 + x mod 1e9+7. Order-sensitive (unlike the bag "
        "fingerprint in text_fingerprint) and incrementally extendable: "
        "appending a token is O(1), so shard fingerprints can be chained at "
        "ingest. Pure JVM higher-order aggregate - no UDF.",
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    tok_ints = F.transform(
        tok, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    roll = F.aggregate(
        tok_ints,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(1000000007).cast("long"),
    )
    return d.select(
        "doc_id",
        roll.alias("rolling_fp"),
        F.size(tok).cast("long").alias("n_tokens"),
    )


@register(
    "multimodal_feature_extract",
    oracle="""
    WITH b AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               hex(encode(text)) AS h,
               octet_length(encode(text)) AS n
        FROM documents
    ),
    e AS (
        SELECT media_id, kind, n,
               list_transform(range(0, n),
                              i -> ('0x' || substring(h, CAST(2*i + 1 AS INTEGER), 2))::BIGINT)
                   AS bytes_l
        FROM b
    )
    SELECT media_id, kind,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(list_sum(bytes_l) AS BIGINT) AS sum_bytes,
           CAST(len(list_distinct(bytes_l)) AS INTEGER) AS n_distinct_bytes,
           CAST(list_sum(bytes_l) AS BIGINT) * 100 // n AS mean_byte_x100
    FROM e WHERE n > 0
    """,
    doc="Multimodal feature extraction: per-payload byte statistics (the "
        "deterministic stand-in for an embedding model) via numpy over "
        "Arrow-batched mapInPandas — functions/multimodal.py::"
        "extract_features. The oracle replays the byte arithmetic from the "
        "hex encoding.",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.functions.multimodal import extract_features

    d = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(d, "doc_id", "text", "source")
    return extract_features(media).filter(F.col("n_bytes") > 0)


@register(
    "sim_label_centroids",
    oracle="""
    WITH flat AS (
        SELECT label,
               unnest(range(len(embedding))) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS qval
        FROM embeddings
    )
    SELECT label, dim,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(CAST(SUM(qval) AS DOUBLE) / 1000000 / COUNT(*), 6)
               AS centroid_val
    FROM flat GROUP BY label, dim
    """,
    doc="Per-label embedding centroid (the k-means E-step / IVF coarse-"
        "quantizer training primitive) as a pure relational plan: posexplode "
        "the vector to (label, dim, value) rows, quantize each float to an "
        "exact micro-unit BIGINT (round(x*1e6) — float sums in double are "
        "partition-order dependent, int64 sums are exact and associative), "
        "then one hash aggregation on (label, dim). Scale: the explode is "
        "map-side (no shuffle), the aggregate shuffles label*dim groups — "
        "independent of row count; partial aggregation compresses each map "
        "task to <=|labels|*dim rows before the exchange.",
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label",
        F.posexplode("embedding").alias("dim", "val"),
    ).select(
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("val").cast("double") * 1000000).cast("long").alias("qval"),
    )
    return flat.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.sum("qval").cast("double") / 1000000 / F.count(F.lit(1)), 6)
            .alias("centroid_val"),
    )


@register(
    "sim_centroid_distances",
    oracle="""
    WITH flat AS (
        SELECT label,
               unnest(range(len(embedding))) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS qval
        FROM embeddings
    ),
    cent AS (
        SELECT label, dim,
               round(CAST(SUM(qval) AS DOUBLE) / 1000000 / COUNT(*), 6)
                   AS centroid_val
        FROM flat GROUP BY label, dim
    ),
    cq AS (
        SELECT label, dim,
               CAST(round(centroid_val * 1000000) AS BIGINT) AS q
        FROM cent
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round(sqrt(CAST(SUM((a.q - b.q) * (a.q - b.q)) AS DOUBLE))
                 / 1000000, 6) AS l2_dist
    FROM cq a JOIN cq b ON a.dim = b.dim AND a.label < b.label
    GROUP BY a.label, b.label
    """,
    doc="Pairwise L2 distance between label centroids (cluster-separation "
        "diagnostics; the |C|^2 step of k-means centroid merging). Builds "
        "on sim_label_centroids' exact-quantized centroids, re-quantizes to "
        "1e-6-unit int64s, and sums SQUARED INTEGER diffs per pair — 64 "
        "double additions per pair would be partition-order dependent, "
        "int64 sums are exact — taking one sqrt/round at the end. The "
        "distance matrix input is |labels|*dim rows (data-size "
        "independent), so the self-join is a broadcast at any corpus "
        "scale.",
)
def sim_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cent = sim_label_centroids(spark, sf_dir).select(
        "label", "dim",
        F.round(F.col("centroid_val") * 1000000).cast("long").alias("q"),
    )
    a = cent.select(
        F.col("label").alias("label_a"), F.col("dim").alias("dim_a"),
        F.col("q").alias("qa"),
    )
    b = cent.select(
        F.col("label").alias("label_b"), F.col("dim").alias("dim_b"),
        F.col("q").alias("qb"),
    )
    d = F.col("qa") - F.col("qb")
    return (
        a.join(
            F.broadcast(b),
            (F.col("dim_a") == F.col("dim_b")) & (F.col("label_a") < F.col("label_b")),
        )
        .groupBy("label_a", "label_b")
        .agg(
            F.round(F.sqrt(F.sum(d * d).cast("double")) / 1000000, 6).alias("l2_dist")
        )
    )


@register(
    "ml_kmeans_refine",
    oracle="""
    WITH flat AS (
        SELECT vec_id, label,
               unnest(range(len(embedding))) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS qval
        FROM embeddings
    ),
    cent AS (
        SELECT label AS cluster, dim,
               CAST(round(round(CAST(SUM(qval) AS DOUBLE) / 1000000
                                / COUNT(*), 6) * 1000000) AS BIGINT) AS q
        FROM flat GROUP BY label, dim
    ),
    assign AS (
        SELECT vec_id, cluster FROM (
            SELECT f.vec_id, c.cluster,
                   row_number() OVER (
                       PARTITION BY f.vec_id
                       ORDER BY SUM((f.qval - c.q) * (f.qval - c.q)) ASC,
                                c.cluster ASC
                   ) AS rn
            FROM flat f JOIN cent c ON f.dim = c.dim
            GROUP BY f.vec_id, c.cluster
        ) WHERE rn = 1
    )
    SELECT a.cluster, f.dim,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(CAST(SUM(f.qval) AS DOUBLE) / 1000000 / COUNT(*), 6)
               AS centroid_val
    FROM assign a JOIN flat f ON f.vec_id = a.vec_id
    GROUP BY a.cluster, f.dim
    """,
    doc="One full k-means Lloyd iteration as a relational plan (assignment "
        "E-step + centroid M-step), seeded from the per-label centroids of "
        "sim_label_centroids: each vector joins the broadcast |k|*dim "
        "centroid table on dim, squared-L2 distances accumulate as EXACT "
        "int64 sums of quantized diffs (order-independent, so the argmin is "
        "engine-deterministic; ties break on cluster id), the nearest "
        "cluster is picked by window rank, and new centroids re-aggregate "
        "on (cluster, dim). Iterating = re-running with cent := output "
        "(graph_pagerank shows the loop pattern with localCheckpoint per "
        "round). Scale: centroid table is k*dim rows — broadcast at any "
        "corpus size; the E-step fanout is k rows per (vec,dim) compressed "
        "map-side by partial aggregation before the (vec,cluster) shuffle.",
)
def ml_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("dim", "val"),
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("val").cast("double") * 1000000).cast("long").alias("qval"),
    )
    cent = sim_label_centroids(spark, sf_dir).select(
        F.col("label").alias("cluster"),
        F.col("dim").alias("cdim"),
        F.round(F.col("centroid_val") * 1000000).cast("long").alias("q"),
    )
    d = F.col("qval") - F.col("q")
    scored = (
        flat.join(F.broadcast(cent), F.col("dim") == F.col("cdim"))
        .groupBy("vec_id", "cluster")
        .agg(F.sum(d * d).alias("dist2"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist2").asc(), F.col("cluster").asc()
    )
    assign = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster")
    )
    return (
        assign.join(flat, "vec_id")
        .groupBy("cluster", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.sum("qval").cast("double") / 1000000 / F.count(F.lit(1)), 6)
                .alias("centroid_val"),
        )
    )


@register(
    "dedup_containment_pairs",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    ),
    shc AS (
        -- mirrors shingle_pairs_jaccard's max_df=1000 stop-shingle cap
        -- (operators/dedup.py:35): intersection counts use only shingles
        -- with document frequency <= 1000; set sizes keep the full sets
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1)
    SELECT doc1, doc2, n_common,
           round(n_common / s1.n, 6) AS containment_1_in_2,
           round(n_common / s2.n, 6) AS containment_2_in_1
    FROM inter
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE n_common / s1.n >= 0.5 OR n_common / s2.n >= 0.5
    """,
    doc="Shingle CONTAINMENT pairs (asymmetric Jaccard, |A∩B|/|A|): flags "
        "doc pairs where one side's shingle set is mostly inside the "
        "other's — catches quotes, excerpts, and supersets that symmetric "
        "Jaccard misses (a 100-token doc embedded in a 10k-token doc has "
        "tiny Jaccard but containment ~1). Same df-capped shingle "
        "inverted-index self-join as dedup_ngram_jaccard — one extra "
        "column of arithmetic, no new shuffle; the MinHash analog at scale "
        "swaps the estimator, not the plan.",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = shingle_pairs_jaccard(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    c12 = F.col("n_common") / F.col("n1")
    c21 = F.col("n_common") / F.col("n2")
    return (
        pairs.filter((c12 >= 0.5) | (c21 >= 0.5))
        .select(
            "doc1",
            "doc2",
            "n_common",
            F.round(c12, 6).alias("containment_1_in_2"),
            F.round(c21, 6).alias("containment_2_in_1"),
        )
    )


@register(
    "pipeline_cluster_representative",
    oracle=f"""
    WITH RECURSIVE
    sh AS (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents),
    shc AS (
        -- mirrors shingle_pairs_jaccard's max_df=1000 stop-shingle cap
        -- (operators/dedup.py:35): intersection counts use only shingles
        -- with document frequency <= 1000; set sizes keep the full sets
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    pairs AS (
        SELECT doc1, doc2 FROM inter
        JOIN sizes s1 ON s1.doc_id = doc1
        JOIN sizes s2 ON s2.doc_id = doc2
        WHERE n_common / (s1.n + s2.n - n_common) >= 0.5
    ),
    sym AS (SELECT doc1 AS a, doc2 AS b FROM pairs
            UNION SELECT doc2, doc1 FROM pairs
            UNION SELECT doc1, doc1 FROM pairs
            UNION SELECT doc2, doc2 FROM pairs),
    reach AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    comp AS (SELECT a AS node, MIN(b) AS component FROM reach GROUP BY a),
    ranked AS (
        SELECT comp.component, comp.node, d.n_chars,
               row_number() OVER (PARTITION BY comp.component
                                  ORDER BY d.n_chars DESC, comp.node) AS rk,
               COUNT(*) OVER (PARTITION BY comp.component) AS n_members
        FROM comp JOIN documents d ON d.doc_id = comp.node
    )
    SELECT component, CAST(n_members AS BIGINT) AS n_members,
           node AS rep_doc_id, n_chars AS rep_n_chars
    FROM ranked WHERE rk = 1
    """,
    doc="Duplicate-cluster representative selection — the step that turns "
        "near-dup clustering into an actual training-set decision: within "
        "each connected component of Jaccard>=0.5 pairs, KEEP the longest "
        "document (n_chars, doc_id tiebreak) and drop the rest. "
        "Quality-ranked retention, not min-id retention: dedup_clusters_cc "
        "answers 'what are the clusters', this answers 'which copy "
        "survives' the way production corpus dedup does (keep the most "
        "complete variant, not the first-crawled one). The component "
        "frame is (node, component) pairs only — document text never "
        "enters the clustering shuffles; n_chars joins in at the end on "
        "the narrow membership frame, and the per-component pick is one "
        "window over components (each a handful of rows). Oracle replays "
        "the transitive closure recursively plus the same ranked pick. "
        "Scale: inherits connected_components' O(log^2 n) bounded-shuffle "
        "rounds with lineage truncation (operators/graph.py).",
)
def pipeline_cluster_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from wal_consumer_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_pairs_jaccard(docs, "doc_id", "text").filter(
        F.col("jaccard") >= 0.5
    )
    cc = connected_components(pairs.select("doc1", "doc2"))
    member = cc.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), F.asc("node"))
    ranked = member.select(
        "component",
        "node",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("component")).alias("n_members"),
    )
    return ranked.filter(F.col("rk") == 1).select(
        "component",
        F.col("n_members").cast("long").alias("n_members"),
        F.col("node").alias("rep_doc_id"),
        F.col("n_chars").alias("rep_n_chars"),
    )


def _sim_recall_eval_sql(dim: int = 64, nbits: int = 4, n_tables: int = 8, k: int = 10) -> str:
    branches = "\n        UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS tbl, "
        f"{rp_lsh_bucket_sql('v', dim, nbits, seed=42 + t)} AS bucket FROM e"
        for t in range(n_tables)
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cb AS (
        {branches}
    ),
    qb AS (SELECT vec_id AS query_id, v AS qv, tbl, bucket FROM cb WHERE vec_id < 5),
    cand AS (
        SELECT DISTINCT q.query_id, c.vec_id AS cand_id, q.qv, c.v AS cv
        FROM cb c JOIN qb q USING (tbl, bucket)
        WHERE c.vec_id <> q.query_id
    ),
    lsh AS (
        SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC,
                                cand_id) AS rank
            FROM cand
        ) WHERE rank <= {k}
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    truth AS (
        SELECT query_id, cand_id FROM (
            SELECT q.query_id, c.vec_id AS cand_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY round(list_cosine_similarity(q.qv, c.v), 6) DESC,
                                c.vec_id) AS rank
            FROM e c CROSS JOIN q
            WHERE c.vec_id <> q.query_id
        ) WHERE rank <= {k}
    )
    SELECT t.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_truth,
           CAST(SUM(CASE WHEN l.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hit,
           round(SUM(CASE WHEN l.cand_id IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS recall_at_k
    FROM truth t LEFT JOIN lsh l
      ON l.query_id = t.query_id AND l.cand_id = t.cand_id
    GROUP BY t.query_id
    """


@register(
    "sim_ann_recall_eval",
    oracle=_sim_recall_eval_sql(),
    doc="ANN quality certification as a first-class query: per-query "
        "recall@10 of the LSH approximate top-k against the exact "
        "brute-force ground truth, computed in ONE plan (truth LEFT JOIN "
        "approx on (query, candidate), grouped per query). This is the "
        "eval loop every production vector index ships with — recall is a "
        "measured, driver-hash-checked number, not a test-suite "
        "assumption (tests/test_llm.py asserts a floor; this query "
        "certifies the exact value). Scale: the ground-truth side is the "
        "documented exact baseline (bounded query set, broadcast "
        "queries); the LSH side is the bucket-equi-join scale path — at "
        "100 TB one runs this eval on a sampled query set, exactly this "
        "shape. Both engines replay the identical integer bucket hashes "
        "and 6-dp-rounded cosine ranking, so the recall numbers are "
        "bit-identical.",
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q5 = emb.filter(F.col("vec_id") < 5)
    truth = cosine_topk_bruteforce(emb, q5, k=10).select("query_id", "cand_id")
    approx = cosine_topk_lsh(emb, q5, dim=64, k=10).select(
        "query_id", F.col("cand_id").alias("hit_id")
    )
    joined = truth.join(
        approx,
        (truth.query_id == approx.query_id) & (truth.cand_id == approx.hit_id),
        "left",
    ).select(truth.query_id, "cand_id", "hit_id")
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_truth"),
        F.sum(F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)).cast("long")
        .alias("n_hit"),
        F.round(
            F.sum(F.when(F.col("hit_id").isNotNull(), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("recall_at_k"),
    )


@register(
    "text_shingle_novelty",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    ),
    first_seen AS (
        SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
    FROM sh JOIN first_seen f USING (shingle)
    GROUP BY sh.doc_id
    """,
    doc="Incremental novelty scoring: per document, the fraction of its "
        "3-word shingles that NO earlier document (by doc_id ingest "
        "order) contains — the dataset-curation signal that separates "
        "genuinely new content from recombinations of already-ingested "
        "text, without any pairwise comparison. Plan: one shingle "
        "explode, one MIN(doc_id) aggregation on the shingle key, one "
        "join back on that same key (partitioning reused), one doc_id "
        "rollup — every frame is narrow (shingle hash, doc_id) and the "
        "pairwise-explosion trap of the Jaccard formulation never "
        "appears: cost is linear in total shingle volume at any corpus "
        "size. Reference parity: extension surface (SURVEY.md §2.B text "
        "analysis).",
)
def text_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 rewrite (guide §2.4, §4.1): the agg+join form evaluated the
    # CPU-dense tokenize+shingle explode TWICE (once feeding the
    # first_seen aggregate, once as the join probe side — Catalyst does
    # no cross-join-side CSE) and the scan is a single split at bench
    # scale, serializing both passes onto one core. min(doc_id) OVER
    # (PARTITION BY shingle) attaches first_doc with ONE tokenization
    # pass, one exchange on the same shingle key the join used, and no
    # join; spread_small_input parallelizes the explode when the scan is
    # narrower than the cluster (no-op at scale). Identical rows: the
    # window min equals the joined groupBy-min per shingle occurrence.
    d = load_table(spark, sf_dir, "documents")
    sh = spread_small_input(d, "doc_id").select(
        "doc_id", F.explode(word_shingles(tokens(F.col("text")), 3)).alias("shingle")
    )
    return (
        sh.withColumn(
            "first_doc", F.min("doc_id").over(Window.partitionBy("shingle"))
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
            F.round(
                F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("novelty"),
        )
    )


@register(
    "sim_embedding_qc_stats",
    oracle="""
    WITH per_vec AS (
        SELECT vec_id, label,
               len(embedding) AS n_dims,
               list_sum(list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                   * 1000000) AS BIGINT))) AS norm2_micro,
               len(list_filter(embedding, x -> x = 0)) AS n_zero_dims
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(count_if(n_dims <> 64) AS BIGINT) AS n_dim_violations,
           CAST(count_if(norm2_micro = 0) AS BIGINT) AS n_zero_vectors,
           CAST(MIN(norm2_micro) AS BIGINT) AS min_norm2_micro,
           CAST(MAX(norm2_micro) AS BIGINT) AS max_norm2_micro,
           round(CAST(SUM(CAST(norm2_micro AS DECIMAL(38,0))) AS DOUBLE)
                 / 1000000 / COUNT(*), 6) AS avg_norm2,
           round(CAST(SUM(CAST(n_zero_dims AS DECIMAL(18,0))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_zero_dims
    FROM per_vec GROUP BY label
    """,
    doc="Embedding quality-control profile (the pre-index DQ gate every "
        "vector pipeline needs: a handful of zero or truncated vectors "
        "silently poison ANN recall): per-label vector counts, dimension "
        "violations, zero vectors, and the squared-norm distribution. "
        "Per-component squares are quantized to exact 1e-6-unit int64s "
        "ARRAY-LOCALLY (list_transform/list_sum — no explode shuffle), so "
        "the norm rollup is an order-independent integer aggregate in "
        "both engines. One map-side pass + a label-keyed aggregation to "
        "~#labels rows. At 100 TB this co-resides with embedding "
        "ingestion as a free scan stage. Reference parity: extension "
        "surface (SURVEY.md §2.B similarity/DQ rows).",
)
def sim_embedding_qc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sq_micro = F.aggregate(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * x.cast("double") * 1000000)
            .cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    per_vec = emb.select(
        "label",
        F.size("embedding").alias("n_dims"),
        sq_micro.alias("norm2_micro"),
        F.size(F.filter("embedding", lambda x: x == 0)).alias("n_zero_dims"),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.count_if(F.col("n_dims") != 64).alias("n_dim_violations"),
        F.count_if(F.col("norm2_micro") == 0).alias("n_zero_vectors"),
        F.min("norm2_micro").cast("long").alias("min_norm2_micro"),
        F.max("norm2_micro").cast("long").alias("max_norm2_micro"),
        F.round(
            F.sum(F.col("norm2_micro").cast("decimal(38,0)")).cast("double")
            / 1000000
            / F.count(F.lit(1)),
            6,
        ).alias("avg_norm2"),
        F.round(
            F.sum(F.col("n_zero_dims").cast("decimal(18,0)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_zero_dims"),
    )


@register(
    "sim_matryoshka_prefix_recall",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
    truth AS (
        SELECT query_id, cand_id FROM (
            SELECT q.query_id, c.vec_id AS cand_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round(list_cosine_similarity(q.qv, c.v), 6)
                                DESC, c.vec_id) AS rank
            FROM e c CROSS JOIN q WHERE c.vec_id <> q.query_id
        ) WHERE rank <= 5
    ),
    approx AS (
        SELECT query_id, cand_id FROM (
            SELECT q.query_id, c.vec_id AS cand_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round(list_cosine_similarity(
                                    list_slice(q.qv, 1, 16),
                                    list_slice(c.v, 1, 16)), 6)
                                DESC, c.vec_id) AS rank
            FROM e c CROSS JOIN q WHERE c.vec_id <> q.query_id
        ) WHERE rank <= 5
    )
    SELECT t.query_id,
           CAST(COUNT(a.cand_id) AS BIGINT) AS n_hits,
           round(COUNT(a.cand_id) / 5.0, 6) AS recall_at_5
    FROM truth t
    LEFT JOIN approx a ON a.query_id = t.query_id AND a.cand_id = t.cand_id
    GROUP BY t.query_id
    """,
    doc="Matryoshka / truncated-dimension retrieval evaluation: recall@5 "
        "of top-k search on the FIRST 16 of 64 embedding dimensions "
        "against full-dimension ground truth, per query — the measurement "
        "behind the 'can we store 4x less and re-rank?' decision (MRL, "
        "Kusupati et al. 2022). Both rankings run the engine's broadcast "
        "brute-force pattern (corpus streams once per ranking, prefix "
        "slice is array-local); the recall join is on narrow "
        "(query, cand) keys. In-plan evaluation like sim_ann_recall_eval: "
        "a truncation-quality regression fails correctness, not a test "
        "floor. At 100 TB the same plan runs over a sampled query set "
        "with the ANN index standing in for brute force. Reference "
        "parity: extension surface (SURVEY.md §2.B similarity rows).",
)
def sim_matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.similarity import cosine_topk_bruteforce

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 20)
    truth = cosine_topk_bruteforce(emb, queries, k=5).select(
        "query_id", "cand_id"
    )
    pre = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    pre_q = pre.where(F.col("vec_id") < 20)
    approx = cosine_topk_bruteforce(pre, pre_q, k=5).select(
        F.col("query_id").alias("a_query_id"), F.col("cand_id").alias("a_cand_id")
    )
    return (
        truth.join(
            approx,
            (F.col("query_id") == F.col("a_query_id"))
            & (F.col("cand_id") == F.col("a_cand_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("a_cand_id").cast("long").alias("n_hits"),
            F.round(F.count("a_cand_id") / 5.0, 6).alias("recall_at_5"),
        )
    )


@register(
    "multimodal_frame_dedup",
    oracle="""
    WITH v AS (SELECT doc_id, encode(text) AS payload,
                      1 + octet_length(encode(text)) % 30 AS n_frames
               FROM documents WHERE doc_id % 3 = 2),
         e AS (SELECT doc_id, payload, unnest(range(0, n_frames, 4)) AS f
               FROM v),
         fr AS (SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
                       lower(substring(hex(payload),
                                       CAST(f * 16 AS INTEGER) + 1, 16))
                           AS frame_hex
                FROM e)
    SELECT frame_hex,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(media_id) AS BIGINT) AS keeper_media_id,
           CAST(MIN(frame_idx) FILTER (
               WHERE media_id = (SELECT MIN(media_id) FROM fr f2
                                 WHERE f2.frame_hex = fr.frame_hex))
               AS INTEGER) AS keeper_frame_idx
    FROM fr GROUP BY frame_hex
    HAVING COUNT(*) > 1
    """,
    doc="Cross-media frame-level deduplication (the video counterpart of "
        "passage dedup: identical frames repeated across clips — intro "
        "cards, black frames, looped content — waste multimodal training "
        "tokens): sample frames via the deterministic decode plumbing "
        "(functions/multimodal.py::sample_frames, same 1-to-N batch shape "
        "as multimodal_frame_sample), group by frame payload, keep the "
        "first occurrence (min media, then min frame index) and report "
        "every duplicated frame. The frame table shuffles once on the "
        "frame-hash key; at 100 TB the hash would be a perceptual hash "
        "from the real decoder and the groupBy is unchanged. Reference "
        "parity: extension surface (SURVEY.md §2.B multimodal rows; "
        "payload opacity per WalEntity.java:38-39).",
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(d, "doc_id", "text", "source")
    frames = sample_frames(
        decode_media(media, fake=True), every_n=4, frame_len=8
    ).select(
        "media_id",
        "frame_idx",
        F.lower(F.hex("frame_bytes")).alias("frame_hex"),
    )
    w = Window.partitionBy("frame_hex").orderBy("media_id", "frame_idx")
    ranked = frames.select(
        "frame_hex",
        "media_id",
        "frame_idx",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("frame_hex")).alias("n"),
    )
    return (
        ranked.where((F.col("rn") == 1) & (F.col("n") > 1))
        .select(
            "frame_hex",
            F.col("n").cast("long").alias("n_occurrences"),
            F.col("media_id").cast("long").alias("keeper_media_id"),
            F.col("frame_idx").cast("int").alias("keeper_frame_idx"),
        )
    )


@register(
    "text_langid_confusion",
    oracle=f"""
    WITH pred AS ({_langid_sql()})
    SELECT labeled_lang, predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN labeled_lang = predicted_lang
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
    FROM pred GROUP BY labeled_lang, predicted_lang
    """,
    doc="Language-ID confusion matrix — the in-plan evaluation of the "
        "text_langid heuristic against the labeled lang column (same "
        "hash-certified-eval pattern as sim_ann_recall_eval and "
        "sim_matryoshka_prefix_recall: a classifier regression fails "
        "CORRECTNESS, not a test floor). One map-side scoring pass, then "
        "a <=|langs|^2-group rollup — map-side combinable, bounded "
        "output at any corpus size. The diagonal gives per-language "
        "recall; off-diagonal cells localize which lexicons collide. "
        "Reference parity: extension surface (SURVEY.md §2.B text rows).",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = text_langid(spark, sf_dir)
    return pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(
                F.col("labeled_lang") == F.col("predicted_lang"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_correct"),
    )


@register(
    "ml_knn_loo_accuracy",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 100),
    c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
    nn AS (
        SELECT query_id, cand_label FROM (
            SELECT e.vec_id AS query_id, c.label AS cand_label,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(e.v, c.v), 6)
                                DESC, c.vec_id) AS rank
            FROM c CROSS JOIN e WHERE c.vec_id <> e.vec_id
        ) WHERE rank <= 5
    ),
    votes AS (
        SELECT query_id, cand_label, COUNT(*) AS n_votes
        FROM nn GROUP BY query_id, cand_label
    ),
    pred AS (
        SELECT query_id, cand_label AS pred_label FROM (
            SELECT query_id, cand_label, n_votes,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY n_votes DESC, cand_label)
                       AS rn
            FROM votes
        ) WHERE rn = 1
    )
    SELECT e.label AS true_label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(count_if(p.pred_label = e.label) AS BIGINT) AS n_correct
    FROM e JOIN pred p ON p.query_id = e.vec_id
    GROUP BY e.label
    """,
    doc="Leave-one-out kNN classification accuracy over the embedding "
        "space (k=5 cosine neighbours, majority vote with smallest-label "
        "tie-break; the query excludes itself) — the standard "
        "label-coherence probe of an embedding table, reported per class "
        "as another in-plan hash-certified evaluation. Rankings use the "
        "broadcast brute-force pattern over a 100-query sample (the "
        "documented exact baseline; at scale the ANN index substitutes "
        "for brute force, recall certified by sim_ann_recall_eval). "
        "Voting and accuracy are bounded narrow-key aggregations. "
        "Reference parity: extension surface (SURVEY.md §2.B "
        "similarity/ML rows).",
)
def ml_knn_loo_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.similarity import cosine_topk_bruteforce

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    queries = emb.where(F.col("vec_id") < 100)
    nn = cosine_topk_bruteforce(emb, queries, k=5).select(
        "query_id", "cand_id"
    )
    cand_labels = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("label").alias("cand_label")
    )
    votes = (
        nn.join(F.broadcast(cand_labels), "cand_id")
        .groupBy("query_id", "cand_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    pred = (
        votes.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("n_votes").desc(), "cand_label"
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("query_id", F.col("cand_label").alias("pred_label"))
    )
    truth = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return (
        truth.join(pred, "query_id")
        .groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.count_if(F.col("pred_label") == F.col("true_label")).alias(
                "n_correct"
            ),
        )
    )


@register(
    "sim_label_silhouette",
    oracle="""
    WITH flat AS (
        SELECT vec_id, label,
               unnest(range(len(embedding))) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS qval
        FROM embeddings
    ),
    cent AS (
        SELECT label AS clabel, dim,
               CAST(round(round(CAST(SUM(qval) AS DOUBLE) / 1000000
                                / COUNT(*), 6) * 1000000) AS BIGINT) AS cq
        FROM flat GROUP BY label, dim
    ),
    d2 AS (
        SELECT f.vec_id, f.label, c.clabel,
               SUM(CAST(f.qval - c.cq AS DECIMAL(38,0))
                   * CAST(f.qval - c.cq AS DECIMAL(38,0))) AS dist2
        FROM flat f JOIN cent c USING (dim)
        GROUP BY f.vec_id, f.label, c.clabel
    ),
    ab AS (
        SELECT vec_id, label,
               CAST(MAX(CASE WHEN clabel = label THEN dist2 END) AS DOUBLE)
                   AS a,
               CAST(MIN(CASE WHEN clabel <> label THEN dist2 END) AS DOUBLE)
                   AS b
        FROM d2 GROUP BY vec_id, label
    ),
    s AS (
        SELECT label,
               CAST(round(CASE WHEN greatest(a, b) = 0 THEN 0
                               ELSE (b - a) / greatest(a, b) END
                          * 1000000000) AS BIGINT) AS s_nano
        FROM ab
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           round(CAST(SUM(s_nano) AS DOUBLE) / 1000000000 / COUNT(*), 6)
               AS mean_silhouette
    FROM s GROUP BY label
    """,
    doc="Simplified silhouette per label (cluster-quality score from "
        "centroid distances: s = (b - a) / max(a, b) with a = squared "
        "distance to the own-label centroid and b = to the nearest other "
        "centroid; positive means labels separate in embedding space — "
        "the acceptance metric for sim_label_centroids' clustering): "
        "centroids come from the established exact micro-unit quantized "
        "aggregation, the |labels| x dim centroid table (~640 rows) "
        "broadcasts back onto the exploded vector stream, and squared "
        "distances are exact DECIMAL(38) integer sums. Per-point s is "
        "quantized to 1e-9 int64s before the per-label mean (the division "
        "is identical doubles, but the MEAN would be partition-order "
        "dependent unquantized). One (vec, centroid-label) aggregation is "
        "the only corpus-scaled shuffle. Reference parity: extension "
        "surface (SURVEY.md §2.B similarity/ML rows).",
)
def sim_label_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "val"),
    ).select(
        "vec_id",
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("val").cast("double") * 1000000).cast("long").alias(
            "qval"
        ),
    )
    cent = flat.groupBy(F.col("label").alias("clabel"), "dim").agg(
        F.round(
            F.round(
                F.sum("qval").cast("double") / 1000000 / F.count(F.lit(1)), 6
            )
            * 1000000
        )
        .cast("long")
        .alias("cq")
    )
    diff = (F.col("qval") - F.col("cq")).cast("decimal(38,0)")
    d2 = (
        flat.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum(diff * diff).alias("dist2"))
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), F.col("dist2"))
        )
        .cast("double")
        .alias("a"),
        F.min(
            F.when(F.col("clabel") != F.col("label"), F.col("dist2"))
        )
        .cast("double")
        .alias("b"),
    )
    s_nano = F.round(
        F.when(F.greatest("a", "b") == 0, F.lit(0.0))
        .otherwise((F.col("b") - F.col("a")) / F.greatest("a", "b"))
        * 1_000_000_000
    ).cast("long")
    return (
        ab.select("label", s_nano.alias("s_nano"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                F.sum("s_nano").cast("double") / 1_000_000_000 / F.count(F.lit(1)),
                6,
            ).alias("mean_silhouette"),
        )
    )


@register(
    "sim_mmr_diversified_topk",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT v FROM e WHERE vec_id = 0),
    scored AS (
        SELECT c.vec_id AS cid,
               round(list_cosine_similarity(q.v, c.v), 6) AS rel, c.v
        FROM e c, q WHERE c.vec_id <> 0
    ),
    pool AS (
        SELECT * FROM (
            SELECT cid, rel, v,
                   row_number() OVER (ORDER BY rel DESC, cid) AS rk
            FROM scored
        ) WHERE rk <= 8
    ),
    pairs AS (
        SELECT a.cid AS ca, b.cid AS cb,
               round(list_cosine_similarity(a.v, b.v), 6) AS s
        FROM pool a, pool b WHERE a.cid <> b.cid
    ),
    s1 AS (SELECT cid, rel, round(0.5 * rel, 6) AS mmr FROM pool WHERE rk = 1),
    s2 AS (
        SELECT cid, rel, round(sc, 6) AS mmr FROM (
            SELECT p.cid, p.rel, 0.5 * p.rel - 0.5 * MAX(pr.s) AS sc
            FROM pool p JOIN pairs pr
              ON pr.ca = p.cid AND pr.cb IN (SELECT cid FROM s1)
            WHERE p.cid NOT IN (SELECT cid FROM s1)
            GROUP BY p.cid, p.rel
        ) ORDER BY sc DESC, cid LIMIT 1
    ),
    s3 AS (
        SELECT cid, rel, round(sc, 6) AS mmr FROM (
            SELECT p.cid, p.rel, 0.5 * p.rel - 0.5 * MAX(pr.s) AS sc
            FROM pool p JOIN pairs pr
              ON pr.ca = p.cid
             AND pr.cb IN (SELECT cid FROM s1 UNION SELECT cid FROM s2)
            WHERE p.cid NOT IN (SELECT cid FROM s1 UNION SELECT cid FROM s2)
            GROUP BY p.cid, p.rel
        ) ORDER BY sc DESC, cid LIMIT 1
    ),
    s4 AS (
        SELECT cid, rel, round(sc, 6) AS mmr FROM (
            SELECT p.cid, p.rel, 0.5 * p.rel - 0.5 * MAX(pr.s) AS sc
            FROM pool p JOIN pairs pr
              ON pr.ca = p.cid
             AND pr.cb IN (SELECT cid FROM s1 UNION SELECT cid FROM s2
                           UNION SELECT cid FROM s3)
            WHERE p.cid NOT IN (SELECT cid FROM s1 UNION SELECT cid FROM s2
                                UNION SELECT cid FROM s3)
            GROUP BY p.cid, p.rel
        ) ORDER BY sc DESC, cid LIMIT 1
    )
    SELECT 1 AS sel_order, cid AS cand_id, rel, mmr AS mmr_score FROM s1
    UNION ALL SELECT 2, cid, rel, mmr FROM s2
    UNION ALL SELECT 3, cid, rel, mmr FROM s3
    UNION ALL SELECT 4, cid, rel, mmr FROM s4
    """,
    doc="Maximal Marginal Relevance diversified retrieval (Carbonell & "
        "Goldstein SIGIR'98): top-4 of an 8-candidate pool re-ranked "
        "greedily by 0.5*relevance - 0.5*max-similarity-to-already-"
        "selected — the RAG/retrieval primitive that trades pure "
        "similarity for coverage. The DISTRIBUTED part is pool "
        "selection (exact brute-force cosine top-8, corpus streams "
        "once, broadcast query); the inherently sequential greedy then "
        "runs as 4 unrolled join+argmax steps over the k-BOUNDED pool "
        "(8x8 pairwise frame, broadcast) — never over the corpus. All "
        "similarities are rounded to 6dp before scoring and halving is "
        "an exact double scaling, so both engines pick identical "
        "winners at every step; ties break on candidate id. The oracle "
        "unrolls the identical greedy as chained CTEs.",
)
def sim_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pool = cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") == 0), k=8)
    poolv = (
        pool.select(F.col("cand_id"), F.col("cosine_sim").alias("rel"), "rank")
        .join(
            emb.select(F.col("vec_id").alias("cand_id"), "embedding"), "cand_id"
        )
        .localCheckpoint(eager=True)  # 8 rows; consumed by every greedy step
    )
    from wal_consumer_spark.operators.similarity import cosine

    b = poolv.select(
        F.col("cand_id").alias("cb"), F.col("embedding").alias("emb_b")
    )
    pairs = (
        poolv.select(F.col("cand_id").alias("ca"), F.col("embedding").alias("emb_a"))
        .crossJoin(F.broadcast(b))
        .filter(F.col("ca") != F.col("cb"))
        .select("ca", "cb", F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6).alias("s"))
    )
    sel = poolv.filter(F.col("rank") == 1).select(
        F.lit(1).alias("sel_order"),
        "cand_id",
        "rel",
        F.round(0.5 * F.col("rel"), 6).alias("mmr_score"),
    )
    picks = [sel]
    for step in (2, 3, 4):
        sel_ids = picks[0].select("cand_id")
        for p in picks[1:]:
            sel_ids = sel_ids.unionAll(p.select("cand_id"))
        ms = (
            pairs.join(
                F.broadcast(sel_ids.withColumnRenamed("cand_id", "cb")), "cb"
            )
            .groupBy(F.col("ca").alias("cand_id"))
            .agg(F.max("s").alias("ms"))
        )
        cand = poolv.join(sel_ids, "cand_id", "left_anti").join(ms, "cand_id")
        pick = (
            cand.select(
                "cand_id",
                "rel",
                (0.5 * F.col("rel") - 0.5 * F.col("ms")).alias("sc"),
            )
            .orderBy(F.desc("sc"), F.asc("cand_id"))
            .limit(1)
            .select(
                F.lit(step).alias("sel_order"),
                "cand_id",
                "rel",
                F.round(F.col("sc"), 6).alias("mmr_score"),
            )
        )
        picks.append(pick)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionAll(p)
    return out


@register(
    "sim_triplet_margin_audit",
    oracle="""
    WITH a AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 50),
    c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
    scored AS (
        SELECT a.vec_id AS query_id, a.label AS anchor_label,
               c.vec_id AS cand_id, c.label AS cand_label,
               round(list_cosine_similarity(a.v, c.v), 6) AS sim
        FROM c CROSS JOIN a WHERE c.vec_id <> a.vec_id
    ),
    pos AS (
        SELECT query_id, anchor_label, cand_id AS pos_id, sim AS pos_sim
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, cand_id) AS rn
              FROM scored WHERE cand_label = anchor_label)
        WHERE rn = 1
    ),
    neg AS (
        SELECT query_id, cand_id AS neg_id, sim AS neg_sim
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, cand_id) AS rn
              FROM scored WHERE cand_label <> anchor_label)
        WHERE rn = 1
    )
    SELECT p.query_id, p.anchor_label, p.pos_id, p.pos_sim,
           n.neg_id, n.neg_sim,
           round(p.pos_sim - n.neg_sim, 6) AS margin,
           round(p.pos_sim - n.neg_sim, 6) < 0.2 AS violated
    FROM pos p JOIN neg n USING (query_id)
    """,
    doc="Triplet-margin audit / hard-negative mining over the embedding "
        "table: for each of 50 deterministic anchors, the nearest "
        "SAME-label neighbour (hardest positive), the nearest "
        "OTHER-label neighbour (hardest negative — the pair contrastive "
        "training most wants), and the margin between them with a "
        "0.2-margin violation flag — the metric-learning curriculum "
        "miner and the embedding-health audit in one plan. One "
        "broadcast of the bounded anchor set against the streaming "
        "corpus (cosine_topk_bruteforce's shape — corpus never "
        "shuffles), two bounded per-anchor rankings off the SAME "
        "scored frame. Margins compare 1e-6-rounded sims so both "
        "engines flag identically. At scale the ANN bucketed join "
        "substitutes for the linear scan (recall certified by "
        "sim_ann_recall_eval).",
)
def sim_triplet_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("anchor_label"),
        F.col("v").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        F.col("v").alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "anchor_label",
            "cand_id",
            "cand_label",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
        .localCheckpoint(eager=True)  # pos and neg rankings both consume it
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), "cand_id"
    )
    pos = (
        scored.where(F.col("cand_label") == F.col("anchor_label"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "query_id",
            "anchor_label",
            F.col("cand_id").alias("pos_id"),
            F.col("sim").alias("pos_sim"),
        )
    )
    neg = (
        scored.where(F.col("cand_label") != F.col("anchor_label"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("cand_id").alias("neg_id"),
            F.col("sim").alias("neg_sim"),
        )
    )
    margin = F.round(F.col("pos_sim") - F.col("neg_sim"), 6)
    return pos.join(neg, "query_id").select(
        "query_id",
        "anchor_label",
        "pos_id",
        "pos_sim",
        "neg_id",
        "neg_sim",
        margin.alias("margin"),
        (margin < 0.2).alias("violated"),
    )


# --------------------------------------------------------------------------
# Scalar (int8) quantization recall certification — the SQ8 memory-compression
# path every large vector index offers (FAISS SQ8, Lucene int8 HNSW): 4x
# smaller vectors, integer dot products, measured recall against exact.
# --------------------------------------------------------------------------

@register(
    "sim_int8_quantized_recall",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    flat AS (
        SELECT vec_id, generate_subscripts(v, 1) AS dim, unnest(v) AS x
        FROM e
    ),
    rng AS (
        SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM flat GROUP BY dim
    ),
    qz AS (
        SELECT f.vec_id, f.dim,
               CASE WHEN r.hi > r.lo THEN least(255, CAST(floor(
                    (f.x - r.lo) * 255 / (r.hi - r.lo)) AS BIGINT))
                    ELSE 0 END AS q
        FROM flat f JOIN rng r USING (dim)
    ),
    qq AS (
        SELECT vec_id AS query_id, dim, q AS qq FROM qz WHERE vec_id < 5
    ),
    approx AS (
        SELECT query_id, cand_id FROM (
            SELECT q.query_id, c.vec_id AS cand_id,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY SUM(c.q * q.qq) DESC, c.vec_id) AS rank
            FROM qz c JOIN qq q USING (dim)
            WHERE c.vec_id <> q.query_id
            GROUP BY q.query_id, c.vec_id
        ) WHERE rank <= 10
    ),
    qv AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    truth AS (
        SELECT query_id, cand_id FROM (
            SELECT qv.query_id, c.vec_id AS cand_id,
                   row_number() OVER (PARTITION BY qv.query_id
                       ORDER BY round(list_cosine_similarity(qv.qv, c.v), 6)
                                DESC, c.vec_id) AS rank
            FROM e c CROSS JOIN qv
            WHERE c.vec_id <> qv.query_id
        ) WHERE rank <= 10
    )
    SELECT t.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_truth,
           CAST(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           round(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS recall_at_k
    FROM truth t LEFT JOIN approx a
      ON a.query_id = t.query_id AND a.cand_id = t.cand_id
    GROUP BY t.query_id
    """,
    doc="Recall@10 certification of int8 scalar quantization (SQ8): each "
        "dimension is linearly quantized to [0, 255] against its corpus "
        "min/max (a 64-row broadcast dimension profile), approximate "
        "top-k ranks by the EXACT INTEGER dot product of the quantized "
        "codes, and per-probe recall is measured against the exact "
        "6-dp-rounded cosine ground truth — the memory/recall trade "
        "every production index quantifies before shipping 4x-smaller "
        "vectors. Determinism: the quantizer is floor((x-lo)*255/"
        "(hi-lo)) on IEEE-pinned double ops, so codes (and every "
        "downstream integer sum) are engine-exact. Scale: the dim "
        "profile is one bounded aggregate; the scoring join is "
        "(bounded probe set) x corpus on the dim key — the same "
        "broadcast-probe scan shape as the exact baseline but on int8 "
        "codes, which is the point. Reference parity: extension "
        "surface (SURVEY.md §2.B similarity rows).",
)
def sim_int8_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q5 = emb.filter(F.col("vec_id") < 5)
    truth = cosine_topk_bruteforce(emb, q5, k=10).select("query_id", "cand_id")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "xf")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    rng = flat.groupBy("dim").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    qz = flat.join(F.broadcast(rng), "dim").select(
        "vec_id",
        "dim",
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.lit(255),
                F.floor(
                    (F.col("x") - F.col("lo")) * 255 / (F.col("hi") - F.col("lo"))
                ),
            ),
        )
        .otherwise(0)
        .cast("long")
        .alias("q"),
    )
    qq = qz.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "dim", F.col("q").alias("qq")
    )
    scored = (
        qz.join(F.broadcast(qq), "dim")
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(F.sum(F.col("q") * F.col("qq")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "cand_id")
    approx = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", F.col("cand_id").alias("hit_id"))
    )
    joined = truth.join(
        approx,
        (truth.query_id == approx.query_id) & (truth.cand_id == approx.hit_id),
        "left",
    ).select(truth.query_id, "cand_id", "hit_id")
    hit = F.sum(F.when(F.col("hit_id").isNotNull(), 1).otherwise(0))
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_truth"),
        hit.cast("long").alias("n_hit"),
        F.round(hit / F.count(F.lit(1)).cast("double"), 4).alias("recall_at_k"),
    )


_ELBOW_KS = [2, 4, 8]


@register(
    "ml_kmeans_inertia_elbow",
    oracle=f"""
    WITH flat AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS qval
        FROM embeddings
    ),
    ks AS (SELECT unnest([{", ".join(str(k) for k in _ELBOW_KS)}]) AS k),
    cent AS (  -- deterministic seeds: cluster c of run k = vector c
        SELECT ks.k, f.vec_id AS cluster, f.dim, f.qval AS q
        FROM flat f JOIN ks ON f.vec_id < ks.k
    ),
    dists AS (
        SELECT c.k, f.vec_id, c.cluster,
               SUM((f.qval - c.q) * (f.qval - c.q)) AS dist2
        FROM flat f JOIN cent c ON f.dim = c.dim
        GROUP BY c.k, f.vec_id, c.cluster
    ),
    nearest AS (
        SELECT k, vec_id, MIN(dist2) AS min_dist2
        FROM dists GROUP BY k, vec_id
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CAST(min_dist2 AS DECIMAL(38,0))) AS BIGINT)
               AS inertia_q
    FROM nearest GROUP BY k
    """,
    doc="K-means elbow curve: total inertia (sum over vectors of the "
        "squared L2 distance to the nearest seed centroid) at k = 2, 4, "
        "8 with deterministic seeding (cluster c of run k = vector c) — "
        "the k-selection diagnostic that precedes the Lloyd refinement "
        "of ml_kmeans_refine. Entirely EXACT integer arithmetic on "
        "1e-6-quantized components (distances, argmin, inertia sums), "
        "so the curve is engine-identical with no rounding anywhere. "
        "Scale: the seed table is sum(k)*dim rows — broadcast at any "
        "corpus size; the E-step fanout aggregates map-side per "
        "(k, vec, cluster) before the shuffle, and the two rollups are "
        "on (k, vec) then k. Reference parity: extension surface "
        "(SURVEY.md §2.B ML rows).",
)
def ml_kmeans_inertia_elbow(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "val")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("val").cast("double") * 1_000_000).cast("long").alias("qval"),
    )
    ks = spark.createDataFrame([(k,) for k in _ELBOW_KS], "k INT")
    cent = (
        flat.where(F.col("vec_id") < max(_ELBOW_KS))
        .join(F.broadcast(ks), F.col("vec_id") < F.col("k"))
        .select("k", F.col("vec_id").alias("cluster"),
                F.col("dim").alias("cdim"), F.col("qval").alias("q"))
    )
    d = F.col("qval") - F.col("q")
    dists = (
        flat.join(F.broadcast(cent), F.col("dim") == F.col("cdim"))
        .groupBy("k", "vec_id", "cluster")
        .agg(F.sum(d * d).alias("dist2"))
    )
    nearest = dists.groupBy("k", "vec_id").agg(F.min("dist2").alias("min_dist2"))
    return nearest.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(F.col("min_dist2").cast("decimal(38,0)")).cast("long")
        .alias("inertia_q"),
    ).select(F.col("k").cast("long").alias("k"), "n_vectors", "inertia_q")


@register(
    "ml_multiclass_confusion_centroid",
    oracle="""
    WITH flat AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS qval
        FROM embeddings
    ),
    cent AS (
        SELECT label AS cls, dim,
               CAST(round(round(CAST(SUM(qval) AS DOUBLE) / 1000000
                                / COUNT(*), 6) * 1000000) AS BIGINT) AS q
        FROM flat GROUP BY label, dim
    ),
    pred AS (
        SELECT vec_id, true_label, cls AS pred_label FROM (
            SELECT f.vec_id, f.label AS true_label, c.cls,
                   row_number() OVER (
                       PARTITION BY f.vec_id
                       ORDER BY SUM((f.qval - c.q) * (f.qval - c.q)) ASC,
                                c.cls ASC) AS rn
            FROM flat f JOIN cent c ON f.dim = c.dim
            GROUP BY f.vec_id, f.label, c.cls
        ) WHERE rn = 1
    )
    SELECT CAST(true_label AS BIGINT) AS true_label,
           CAST(pred_label AS BIGINT) AS pred_label,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(COUNT(*) / CAST(SUM(COUNT(*)) OVER (
                 PARTITION BY true_label) AS DOUBLE), 6) AS row_rate
    FROM pred GROUP BY true_label, pred_label
    """,
    doc="Multiclass confusion matrix of the nearest-centroid classifier "
        "(10 label centroids, same quantized-L2 E-step as "
        "ml_kmeans_refine): per (true, predicted) cell count and the "
        "row-normalized rate — the full-matrix companion to the binary "
        "ml_classification_metrics, showing WHICH classes bleed into "
        "which. Distances are exact int64 sums of quantized diffs with "
        "class-id tie-break, so the argmin (and every cell) is "
        "engine-deterministic. Scale: the centroid table is |k|*dim "
        "broadcast rows; the per-vector window partitions on vec_id; "
        "the output is bounded by |labels|^2. Reference parity: "
        "extension surface (SURVEY.md §2.B ML rows).",
)
def ml_multiclass_confusion_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim0", "val")
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("val").cast("double") * 1_000_000).cast("long").alias("qval"),
    )
    cent = flat.groupBy(F.col("label").alias("cls"), F.col("dim").alias("cdim")).agg(
        F.round(
            F.round(F.sum("qval").cast("double") / 1_000_000 / F.count(F.lit(1)), 6)
            * 1_000_000
        )
        .cast("long")
        .alias("q")
    )
    d = F.col("qval") - F.col("q")
    scored = (
        flat.join(F.broadcast(cent), F.col("dim") == F.col("cdim"))
        .groupBy("vec_id", F.col("label").alias("true_label"), "cls")
        .agg(F.sum(d * d).alias("dist2"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("dist2").asc(), F.col("cls").asc())
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("true_label", F.col("cls").alias("pred_label"))
    )
    cells = pred.groupBy("true_label", "pred_label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wrow = Window.partitionBy("true_label")
    return cells.select(
        F.col("true_label").cast("long").alias("true_label"),
        F.col("pred_label").cast("long").alias("pred_label"),
        "n",
        F.round(F.col("n") / F.sum("n").over(wrow).cast("double"), 6)
        .alias("row_rate"),
    )


@register(
    "pipeline_dedup_impact_report",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, source,
               len({_TOKS}) AS n_tokens,
               sha256(text) AS h
        FROM documents
    ),
    keep AS (SELECT h, MIN(doc_id) AS canonical FROM fp GROUP BY h)
    SELECT fp.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(count_if(fp.doc_id <> k.canonical) AS BIGINT) AS n_removed,
           CAST(SUM(fp.n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN fp.doc_id <> k.canonical
                    THEN fp.n_tokens ELSE 0 END) AS BIGINT) AS tokens_removed,
           round(SUM(CASE WHEN fp.doc_id <> k.canonical
                     THEN fp.n_tokens ELSE 0 END)
                 / CAST(SUM(fp.n_tokens) AS DOUBLE), 6) AS token_removal_rate
    FROM fp JOIN keep k USING (h)
    GROUP BY fp.source
    """,
    doc="Dedup impact report: what exact-hash dedup (keep-first by "
        "doc_id, the dedup_exact_hash policy) would remove, broken down "
        "by source — document counts, token counts, and the token "
        "removal rate per source. This is the before/after accounting a "
        "curation run publishes alongside the dedup itself (which "
        "sources are redundant mirrors, how much of the token budget "
        "dedup buys back). Plan: one fingerprint pass, a MIN(doc_id) "
        "aggregate on the hash key, a join back on that key (partition "
        "reuse), one bounded per-source rollup — linear at any corpus "
        "size. Reference parity: extension surface (SURVEY.md §2.B "
        "curation rows).",
)
def pipeline_dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.sha2("text", 256).alias("h"),
    )
    keep = fp.groupBy("h").agg(F.min("doc_id").alias("canonical"))
    removed = F.col("doc_id") != F.col("canonical")
    return (
        fp.join(keep, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_if(removed).cast("long").alias("n_removed"),
            F.sum("n_tokens").cast("long").alias("tokens_total"),
            F.sum(F.when(removed, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("tokens_removed"),
            F.round(
                F.sum(F.when(removed, F.col("n_tokens")).otherwise(0))
                / F.sum("n_tokens").cast("double"),
                6,
            ).alias("token_removal_rate"),
        )
    )


def _dedup_threshold_sweep_sql() -> str:
    coeffs = "[" + ", ".join(f"[{a}, {b}]" for a, b in minhash_coeffs(32, 7)) + "]"
    return f"""
    WITH hs AS (
        SELECT doc_id,
               list_transform({_SHINGLES},
                              s -> ('0x' || substring(md5(s), 1, 8))::BIGINT) AS h
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               list_transform({coeffs}, c ->
                   list_min(list_transform(h, x -> (c[1] * x + c[2]) % 4294967311))) AS sig
        FROM hs
    ),
    banded AS (
        SELECT doc_id, sig, b.b AS band,
               array_to_string(list_slice(sig, b.b * 8 + 1, b.b * 8 + 8), ',') AS bucket
        FROM sig, (SELECT unnest(range(0, 4)) AS b) b
    ),
    pairs AS (
        SELECT a.doc_id AS doc1, c.doc_id AS doc2, a.sig AS sig1, c.sig AS sig2
        FROM banded a JOIN banded c USING (band, bucket)
        WHERE a.doc_id < c.doc_id
    ),
    est AS (
        SELECT doc1, doc2,
               MAX(list_sum(list_transform(range(1, 33),
                       i -> CASE WHEN sig1[i] = sig2[i] THEN 1 ELSE 0 END)) / 32.0)
                   AS est
        FROM pairs GROUP BY doc1, doc2
    ),
    grid AS (SELECT unnest([40, 50, 60, 70, 80, 90]) AS thr_centi)
    SELECT g.thr_centi,
           CAST(count_if(e.est * 100 >= g.thr_centi) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN e.est * 100 >= g.thr_centi
                                    THEN e.doc2 END) AS BIGINT)
               AS n_docs_droppable
    FROM grid g CROSS JOIN est e
    GROUP BY g.thr_centi
    """


@register(
    "dedup_threshold_sensitivity",
    oracle=_dedup_threshold_sweep_sql(),
    doc="Near-dup threshold sensitivity sweep: for Jaccard cutoffs 0.40 "
        "to 0.90, how many candidate pairs the MinHash-LSH estimate "
        "keeps and how many documents keep-first dedup would drop (the "
        "later member doc2 of each surviving pair) — the tuning readout "
        "run before committing a threshold, since the drop count is "
        "what moves the token budget. Pipeline identical to "
        "dedup_minhash_lsh (same portable hashes, so the sweep is "
        "engine-exact); the sweep itself is a broadcast 6-row grid "
        "against the bounded candidate-pair table — free relative to "
        "candidate generation at any scale. Reference parity: "
        "extension surface (SURVEY.md §2.B dedup rows).",
)
def dedup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # portable hashes so the oracle replays signatures bit-identically
    # (same contract as dedup_minhash_lsh)
    sigs = minhash_signature(d, "doc_id", "text", portable=True).persist()
    cand = minhash_candidates(sigs)
    est = minhash_jaccard_estimate(sigs, cand)
    grid = spark.range(4, 10).select((F.col("id") * 10).cast("int").alias("thr_centi"))
    hit = F.col("est_jaccard") * 100 >= F.col("thr_centi")
    return (
        est.crossJoin(F.broadcast(grid))
        .groupBy("thr_centi")
        .agg(
            F.count_if(hit).cast("long").alias("n_pairs"),
            F.count_distinct(F.when(hit, F.col("doc2")))
            .cast("long")
            .alias("n_docs_droppable"),
        )
    )


def _lsh_buckets_cte(nbits: int = 4, n_tables: int = 8) -> str:
    """All (table, bucket) assignments of every embedding — the DuckDB
    replay of rp_lsh_buckets_np over the whole corpus."""
    branches = "\n        UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, "
        f"{rp_lsh_bucket_sql('v', 64, nbits, seed=42 + t)} AS bucket FROM e"
        for t in range(n_tables)
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    cb AS (
        {branches}
    )"""


@register(
    "sim_lsh_bucket_balance",
    oracle=f"""
    {_lsh_buckets_cte()},
    occ AS (
        SELECT tbl, bucket, CAST(COUNT(*) AS BIGINT) AS n
        FROM cb GROUP BY tbl, bucket
    )
    SELECT CAST(tbl AS INT) AS tbl,
           CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
           CAST(SUM(n) AS BIGINT) AS n_vectors,
           CAST(MAX(n) AS BIGINT) AS max_occupancy,
           CAST(MIN(n) AS BIGINT) AS min_occupancy,
           CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS candidate_pairs,
           round(CAST(MAX(n) AS DOUBLE) * COUNT(*) / SUM(n), 6)
               AS imbalance_factor
    FROM occ GROUP BY tbl
    """,
    doc="LSH hash-table balance audit: per sign-random-projection table, "
        "bucket occupancy extremes, the implied candidate-pair volume "
        "sum n_b*(n_b-1)/2 (the EXACT join cost the banded dedup/ANN "
        "path will pay), and the imbalance factor max/mean — the "
        "capacity-planning readout that catches a skewed hash table "
        "BEFORE the bucket equi-join turns into a straggler at 100 TB "
        "(one hot bucket = one hot task; the fix is more bits or bucket "
        "caps, and this table says which). Bucket ids are exact integer "
        "projections over fixed-point-quantized vectors (the "
        "sim_topk_lsh machinery), so the oracle replays every "
        "assignment bit-for-bit. Plan: one Arrow-vectorized bucket "
        "kernel pass, one (table, bucket) count, one 8-row rollup. "
        "Reference parity: extension surface (SURVEY.md §2.C similarity "
        "rows).",
)
def sim_lsh_bucket_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cb = emb.select(
        F.posexplode(
            rp_lsh_buckets_np(
                quantize_vec32(F.col("embedding")), 64, 4, 8, seed0=42
            )
        ).alias("tbl", "bucket")
    )
    occ = cb.groupBy("tbl", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return occ.groupBy(F.col("tbl").cast("int").alias("tbl")).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
        F.sum("n").cast("long").alias("n_vectors"),
        F.max("n").cast("long").alias("max_occupancy"),
        F.min("n").cast("long").alias("min_occupancy"),
        # Integral end-to-end: n*(n-1) is even so DIV 2 is exact per term,
        # and the sum runs in DECIMAL(38,0) — a double-typed sum would lose
        # ulps past 2^53 total pairs, exactly the 100 TB capacity-planning
        # regime this audit exists for (ADVICE r7).
        F.sum(F.expr("CAST(n * (n - 1) DIV 2 AS DECIMAL(38,0))"))
        .cast("long")
        .alias("candidate_pairs"),
        F.round(
            F.max("n").cast("double") * F.count(F.lit(1)) / F.sum("n"), 6
        ).alias("imbalance_factor"),
    )


def _knn_top_cte_sql(
    dim: int = 64, nbits: int = 8, n_tables: int = 6, k: int = 5
) -> str:
    """Shared WITH-clause prefix ending in the `top` CTE (every vector's
    exact-cosine top-k among LSH-bucketed candidates) — composed by the
    kNN purity and hubness oracles so both replay the identical pair
    machinery bit-for-bit."""
    qvec = (
        f"list_transform(range(1, {dim + 1}), "
        f"i -> CAST(round(v[i] * 1000000.0) AS BIGINT))"
    )
    branches = "\n        UNION ALL ".join(
        f"SELECT vec_id, label, qv, {t} AS tbl, "
        f"{rp_lsh_bucket_sql('v', dim, nbits, seed=42 + t)} AS bucket FROM q0"
        for t in range(n_tables)
    )
    qcos = quant_cosine_sql("q1", "q2", dim)
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    q0 AS (SELECT vec_id, label, v, {qvec} AS qv FROM e),
    cb AS (
        {branches}
    ),
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, q.label AS qlabel,
               c.vec_id AS cand_id, c.label AS clabel,
               q.qv AS q1, c.qv AS q2
        FROM cb q JOIN cb c USING (tbl, bucket)
        WHERE c.vec_id <> q.vec_id
    ),
    scored AS (
        SELECT query_id, qlabel, cand_id, clabel,
               round({qcos}, 6) AS cs
        FROM cand
    ),
    top AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cs DESC, cand_id) AS rn
            FROM scored
        ) WHERE rn <= {k}
    )"""


def _knn_purity_sql(dim: int = 64, nbits: int = 8, n_tables: int = 6, k: int = 5) -> str:
    return f"""{_knn_top_cte_sql(dim, nbits, n_tables, k)}
    SELECT CAST(qlabel AS INT) AS label,
           CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           CAST(COUNT(*) FILTER (WHERE clabel = qlabel) AS BIGINT)
               AS n_same_label,
           round(CAST(COUNT(*) FILTER (WHERE clabel = qlabel) AS DOUBLE)
                 / COUNT(*), 6) AS purity
    FROM top GROUP BY qlabel
    """


def _knn_top5_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every vector's exact-cosine top-5 among LSH-bucketed candidates
    (query_id, qlabel, cand_id, clabel, cs) — the shared all-corpus kNN
    substrate behind sim_knn_label_purity and sim_knn_hubness_histogram;
    mirrors `_knn_top_cte_sql` bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    # r12 examined, measured, left alone: checkpointing this frame for
    # its three consumers LOST ~1s fresh-JVM — the expensive Arrow
    # bucket kernel below already runs exactly once (only `cb` consumes
    # it); the other two consumers are cheap columnar scan+quantize, so
    # the eager materialization job cost more than the recomputes it
    # saved (guide §5: cache only when recompute is the dearer side).
    base = emb.select(
        "vec_id",
        "label",
        quantize_vec32(F.col("embedding")).alias("qv"),
    )
    cb = base.select(
        "vec_id",
        F.posexplode(
            rp_lsh_buckets_np(F.col("qv"), 64, 8, 6, seed0=42)
        ).alias("tbl", "bucket"),
    )
    q = cb.select(F.col("vec_id").alias("query_id"), "tbl", "bucket")
    c = cb.select(F.col("vec_id").alias("cand_id"), "tbl", "bucket")
    # distinct on the ID pair FIRST (narrow shuffle), vectors re-joined
    # after: carrying two 64-wide arrays through the multi-table collision
    # distinct tripled this query's runtime at sf0.1
    pairs = (
        q.join(c, ["tbl", "bucket"])
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
        .distinct()  # a pair may collide in several tables
    )
    qside = base.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("qv").alias("q1"),
    )
    cside = base.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("clabel"),
        F.col("qv").alias("q2"),
    )
    scored = (
        pairs.join(qside, "query_id")
        .join(cside, "cand_id")
        .select(
            "query_id",
            "qlabel",
            "cand_id",
            "clabel",
            F.round(quant_cosine(F.col("q1"), F.col("q2")), 6).alias("cs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cs").desc(), F.col("cand_id")
    )
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5)



@register(
    "sim_knn_label_purity",
    oracle=_knn_purity_sql(),
    doc="Embedding-space label purity: every vector queries its 5 nearest "
        "neighbors (exact cosine among LSH-bucketed candidates — the "
        "SCALE path: all-corpus kNN as a bucket equi-join, never an "
        "O(N^2) cross join) and each class reports what fraction of its "
        "members' neighbors share the class label — the standard "
        "embedding-quality probe (high purity = classes separate in the "
        "space; a class whose purity craters is where a classifier or "
        "dedup threshold will fail first). 8-bit buckets x 6 tables size "
        "collision sets for an ALL-corpus query load (the 4-bit tier is "
        "for handfuls of queries); the collision distinct runs on bare "
        "id pairs with vectors re-joined after. Pooled per-class ratio, "
        "not mean-of-means, so the output is an exact-long division. Bucket "
        "ids and cosines replay bit-for-bit in the oracle "
        "(integer projections + quantized-cosine kernel, the "
        "sim_topk_lsh machinery); ranking tie-breaks on cand_id. Plan: "
        "bucket kernel pass -> (table, bucket) self-equi-join -> "
        "distinct pairs -> Arrow-vectorized cosine -> per-query top-5 "
        "window (corpus-keyed partition, map-side group limit) -> "
        "bounded label rollup. Reference parity: extension surface "
        "(SURVEY.md §2.C similarity rows).",
)
def sim_knn_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    top = _knn_top5_frame(spark, sf_dir)
    return top.groupBy(F.col("qlabel").cast("int").alias("label")).agg(
        F.count_distinct(F.col("query_id")).cast("long").alias("n_queries"),
        F.count(F.lit(1)).cast("long").alias("n_neighbors"),
        F.count_if(F.col("clabel") == F.col("qlabel"))
        .cast("long")
        .alias("n_same_label"),
        F.round(
            F.count_if(F.col("clabel") == F.col("qlabel")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("purity"),
    )


@register(
    "pipeline_dedup_cluster_sizes",
    oracle=f"""
    WITH RECURSIVE
    sh AS (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents),
    shc AS (
        -- mirrors shingle_pairs_jaccard's max_df=1000 stop-shingle cap
        -- (operators/dedup.py:35): intersection counts use only shingles
        -- with document frequency <= 1000; set sizes keep the full sets
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    pairs AS (
        SELECT doc1, doc2 FROM inter
        JOIN sizes s1 ON s1.doc_id = doc1
        JOIN sizes s2 ON s2.doc_id = doc2
        WHERE n_common / (s1.n + s2.n - n_common) >= 0.5
    ),
    sym AS (SELECT doc1 AS a, doc2 AS b FROM pairs
            UNION SELECT doc2, doc1 FROM pairs
            UNION SELECT doc1, doc1 FROM pairs
            UNION SELECT doc2, doc2 FROM pairs),
    reach AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    comp AS (SELECT a AS node, MIN(b) AS component FROM reach GROUP BY a),
    csize AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
              FROM comp GROUP BY component),
    hist AS (
        SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(sz * COUNT(*) AS BIGINT) AS n_docs
        FROM csize GROUP BY sz
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM documents),
    indup AS (SELECT CAST(COALESCE(SUM(n_docs), 0) AS BIGINT) AS n FROM hist)
    SELECT h.cluster_size, h.n_clusters, h.n_docs,
           CAST(h.n_docs - h.n_clusters AS BIGINT) AS removable_docs
    FROM hist h
    UNION ALL
    SELECT 1, tot.n_all - indup.n, tot.n_all - indup.n, 0
    FROM tot, indup
    """,
    doc="Near-dup cluster-size distribution: how many duplicate clusters "
        "of each size the Jaccard>=0.5 graph contains, how many documents "
        "they hold, and how many are removable under keep-one-per-cluster "
        "— the dedup capacity forecast read BEFORE running the removal "
        "(a corpus whose mass sits in a few giant clusters needs "
        "representative-selection care; one dominated by pairs doesn't), "
        "completing pipeline_dedup_impact_report's per-source accounting "
        "with the structural view. Singleton documents (no near-dup "
        "edge) appear as the size-1 row, so the histogram totals the "
        "corpus exactly. Spark path: the O(log^2 n) alternating-star CC "
        "shared with dedup_clusters_cc, then two bounded rollups; oracle "
        "replays with a recursive closure. Reference parity: extension "
        "surface (SURVEY.md §2.C dedup rows).",
)
def pipeline_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.graph import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_pairs_jaccard(docs, "doc_id", "text").filter(
        F.col("jaccard") >= 0.5
    )
    comp = dedup_clusters(pairs.select("doc1", "doc2"))
    hist = comp.groupBy(F.col("n_members").cast("long").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("n_members").cast("long").alias("n_docs"),
    ).select(
        "cluster_size",
        "n_clusters",
        "n_docs",
        (F.col("n_docs") - F.col("n_clusters")).cast("long").alias(
            "removable_docs"
        ),
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    indup = hist.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long").alias("n")
    )
    singleton = (
        tot.crossJoin(F.broadcast(indup))
        .select(
            F.lit(1).cast("long").alias("cluster_size"),
            (F.col("n_all") - F.col("n")).cast("long").alias("n_clusters"),
            (F.col("n_all") - F.col("n")).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("removable_docs"),
        )
    )
    return hist.unionByName(singleton)


@register(
    "sim_exact_duplicate_vectors",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               md5(array_to_string(
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(CAST(round(x * 1000000) AS BIGINT)
                                            AS VARCHAR)), ',')) AS sig
        FROM embeddings
    ),
    g AS (SELECT sig, CAST(COUNT(*) AS BIGINT) AS c FROM q GROUP BY sig)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_signatures,
           CAST(SUM(c) AS BIGINT) AS n_vectors,
           CAST(COUNT(*) FILTER (WHERE c > 1) AS BIGINT) AS n_dup_groups,
           CAST(COALESCE(SUM(c - 1) FILTER (WHERE c > 1), 0) AS BIGINT)
               AS n_redundant_vectors,
           round(CAST(COALESCE(SUM(c - 1) FILTER (WHERE c > 1), 0) AS DOUBLE)
                 / SUM(c), 6) AS redundancy_share
    FROM g
    """,
    doc="Exact-duplicate embedding detection: fingerprint each vector as "
        "md5 over its 1e-6 fixed-point quantization and count colliding "
        "signatures — the cheapest, highest-precision dedup tier that "
        "should ALWAYS run before MinHash/SimHash (re-encoded or "
        "re-crawled items produce bit-identical vectors; at training "
        "scale a few percent of exact dups silently reweight the loss). "
        "The quantization is the repo's standard pinned round(x*1e6), so "
        "signatures are engine-identical; counts are exact longs; output "
        "is a 1-row corpus summary (zero dup groups on clean data is "
        "itself the audit result). Plan: one map-side fingerprint pass + "
        "one signature count — the same shape as dedup_exact_hash on "
        "documents, here for the embedding modality. Reference parity: "
        "extension surface (SURVEY.md §2.C similarity rows).",
)
def sim_exact_duplicate_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sig = F.md5(
        F.array_join(
            F.transform(
                F.col("embedding"),
                lambda x: F.round(x.cast("double") * 1000000)
                .cast("long")
                .cast("string"),
            ),
            ",",
        )
    )
    g = emb.select(sig.alias("sig")).groupBy("sig").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_signatures"),
        F.sum("c").cast("long").alias("n_vectors"),
        F.count_if(F.col("c") > 1).cast("long").alias("n_dup_groups"),
        F.coalesce(
            F.sum(F.when(F.col("c") > 1, F.col("c") - 1)), F.lit(0)
        )
        .cast("long")
        .alias("n_redundant_vectors"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c") - 1)), F.lit(0)
            ).cast("double")
            / F.sum("c"),
            6,
        ).alias("redundancy_share"),
    )


@register(
    "sim_embedding_norm_audit",
    oracle="""
    WITH q AS (
        SELECT label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(round(x * 1000000.0) AS BIGINT)) AS qv
        FROM embeddings
    ),
    nm AS (
        SELECT label,
               CAST(floor(sqrt(CAST(list_sum(
                   list_transform(qv, x -> x * x)) AS DOUBLE))) AS BIGINT)
                   AS norm_micro
        FROM q
    ),
    st AS (
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(SUM(norm_micro) AS HUGEINT) AS s,
               CAST(SUM(norm_micro * norm_micro) AS HUGEINT) AS s2,
               CAST(MIN(norm_micro) AS BIGINT) AS min_norm_micro,
               CAST(MAX(norm_micro) AS BIGINT) AS max_norm_micro
        FROM nm GROUP BY label
    )
    SELECT CAST(label AS INT) AS label, n_vectors,
           CAST(s // n_vectors AS BIGINT) AS mean_norm_micro,
           CAST((n_vectors * s2 - s * s) // (n_vectors * n_vectors)
                AS BIGINT) AS var_norm_micro,
           min_norm_micro, max_norm_micro
    FROM st
    """,
    doc="Embedding L2-norm audit per label: count, mean, variance, and "
        "extremes of vector norms — the first sanity gate on an embedding "
        "table before any cosine machinery (un-normalized or degenerate "
        "vectors show up here as cross-label norm spread; a collapsed "
        "encoder shows up as near-zero variance). Norms are computed on "
        "the same 1e-6 fixed-point quantization as every sim_* op "
        "(integer q*q sums; floor(sqrt) of an exact integer — sqrt is "
        "IEEE-pinned so both engines agree bit-for-bit), and the "
        "mean/variance stay INTEGRAL to the end (HUGEINT/DECIMAL floor "
        "division — the ewm_var lesson: giant-decimal->double casts "
        "differ in the last ulp across engines). One narrow label-keyed "
        "shuffle of 4 longs per vector; output bounded by |labels|. "
        "Reference parity: extension surface (SURVEY.md §2.C similarity "
        "rows).",
)
def sim_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(1000000.0)).cast("long"),
    )
    norm2 = F.aggregate(
        qv, F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    nm = emb.select(
        "label",
        F.floor(F.sqrt(norm2.cast("double"))).cast("long").alias("norm_micro"),
    )
    st = nm.groupBy(F.col("label").cast("int").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(F.col("norm_micro").cast("decimal(38,0)")).alias("s"),
        F.sum(
            (F.col("norm_micro") * F.col("norm_micro")).cast("decimal(38,0)")
        ).alias("s2"),
        F.min("norm_micro").cast("long").alias("min_norm_micro"),
        F.max("norm_micro").cast("long").alias("max_norm_micro"),
    )
    return st.select(
        "label",
        "n_vectors",
        F.expr("CAST(s DIV n_vectors AS BIGINT)").alias("mean_norm_micro"),
        F.expr(
            "CAST((n_vectors * s2 - s * s) DIV (n_vectors * n_vectors) "
            "AS BIGINT)"
        ).alias("var_norm_micro"),
        "min_norm_micro",
        "max_norm_micro",
    )


@register(
    "pipeline_cross_source_dup_matrix",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    ),
    shc AS (
        -- mirrors shingle_pairs_jaccard's max_df=1000 stop-shingle cap
        -- (operators/dedup.py:35): intersection counts use only shingles
        -- with document frequency <= 1000; set sizes keep the full sets
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    p AS (
        SELECT doc1, doc2,
               CAST(floor(n_common / (s1.n + s2.n - n_common) * 1000000.0)
                    AS BIGINT) AS j_micro
        FROM inter
        JOIN sizes s1 ON s1.doc_id = doc1
        JOIN sizes s2 ON s2.doc_id = doc2
        WHERE n_common / (s1.n + s2.n - n_common) >= 0.5
    ),
    m AS (
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               j_micro
        FROM p
        JOIN documents da ON da.doc_id = p.doc1
        JOIN documents db ON db.doc_id = p.doc2
    ),
    g AS (
        SELECT source_a, source_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(MIN(j_micro) AS BIGINT) AS min_jaccard_micro,
               CAST(MAX(j_micro) AS BIGINT) AS max_jaccard_micro
        FROM m GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_pairs, min_jaccard_micro,
           max_jaccard_micro,
           CAST(n_pairs AS DOUBLE) / SUM(n_pairs) OVER () AS share_of_pairs
    FROM g
    """,
    doc="Cross-source duplication matrix: near-duplicate pairs (exact "
        "3-shingle Jaccard >= 0.5, the same df-capped pair machinery as "
        "dedup_ngram_jaccard) rolled up by unordered source pair — the "
        "curation readout that tells you WHICH sources mirror which "
        "(licensing syndication, scraped re-posts, cross-domain "
        "boilerplate) before deciding per-source dedup priorities; the "
        "diagonal rows are within-source redundancy. Candidate "
        "generation is the shared shingle equi-join (df-capped, never "
        "all-pairs); the source attach is two narrow id joins on the "
        "already-tiny pair table; output is bounded by |sources|^2 and "
        "the share division is IEEE-pinned over exact counts, with "
        "Jaccard micro-quantized by floor. Reference parity: extension "
        "surface (SURVEY.md §2.C curation rows).",
)
def pipeline_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.dedup import shingle_pairs_jaccard

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_pairs_jaccard(docs, "doc_id", "text").filter(
        F.col("jaccard") >= 0.5
    )
    src = docs.select("doc_id", "source")
    m = (
        pairs.join(
            src.withColumnsRenamed({"doc_id": "doc1", "source": "s1"}), "doc1"
        )
        .join(
            src.withColumnsRenamed({"doc_id": "doc2", "source": "s2"}), "doc2"
        )
        .select(
            F.least("s1", "s2").alias("source_a"),
            F.greatest("s1", "s2").alias("source_b"),
            F.floor(F.col("jaccard") * F.lit(1_000_000.0))
            .cast("long")
            .alias("j_micro"),
        )
    )
    g = m.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("j_micro").cast("long").alias("min_jaccard_micro"),
        F.max("j_micro").cast("long").alias("max_jaccard_micro"),
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return g.select(
        "source_a",
        "source_b",
        "n_pairs",
        "min_jaccard_micro",
        "max_jaccard_micro",
        (F.col("n_pairs").cast("double") / F.sum("n_pairs").over(wt)).alias(
            "share_of_pairs"
        ),
    )


@register(
    "ml_mcnemar_dim_ablation",
    oracle="""
    WITH q AS (
        SELECT vec_id, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(round(x * 1000000.0) AS BIGINT) + 2000000)
                   AS qv
        FROM embeddings
    ),
    dims AS (
        SELECT vec_id, label, generate_subscripts(qv, 1) - 1 AS dim,
               unnest(qv) AS v
        FROM q
    ),
    cent AS (
        SELECT label AS clabel, dim,
               CAST(CAST(SUM(v) AS HUGEINT) // COUNT(*) AS BIGINT) AS c
        FROM dims GROUP BY label, dim
    ),
    dist AS (
        SELECT d.vec_id, d.label, ct.clabel,
               SUM((d.v - ct.c) * (d.v - ct.c)) AS dist_full,
               SUM(CASE WHEN d.dim < 32
                        THEN (d.v - ct.c) * (d.v - ct.c) ELSE 0 END)
                   AS dist_half
        FROM dims d JOIN cent ct ON ct.dim = d.dim
        GROUP BY d.vec_id, d.label, ct.clabel
    ),
    pred AS (
        -- composite scalar argmin key: labels are < 16, so
        -- dist*16 + clabel orders exactly like (dist, clabel)
        SELECT vec_id, label,
               arg_min(clabel, CAST(dist_full AS BIGINT) * 16 + clabel)
                   AS pred_full,
               arg_min(clabel, CAST(dist_half AS BIGINT) * 16 + clabel)
                   AS pred_half
        FROM dist GROUP BY vec_id, label
    ),
    flags AS (
        SELECT CAST(pred_full = label AS INT) AS ok_full,
               CAST(pred_half = label AS INT) AS ok_half
        FROM pred
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(CAST(SUM(ok_full) AS HUGEINT) * 1000000 // COUNT(*)
                AS BIGINT) AS acc_full_ppm,
           CAST(CAST(SUM(ok_half) AS HUGEINT) * 1000000 // COUNT(*)
                AS BIGINT) AS acc_half_ppm,
           CAST(count_if(ok_full = 1 AND ok_half = 0) AS BIGINT)
               AS n_full_only,
           CAST(count_if(ok_full = 0 AND ok_half = 1) AS BIGINT)
               AS n_half_only,
           CASE WHEN count_if(ok_full <> ok_half) > 0 THEN
               CAST(CAST((abs(count_if(ok_full = 1 AND ok_half = 0)
                              - count_if(ok_full = 0 AND ok_half = 1)) - 1)
                         * (abs(count_if(ok_full = 1 AND ok_half = 0)
                                - count_if(ok_full = 0 AND ok_half = 1)) - 1)
                         AS HUGEINT) * 1000000
                    // count_if(ok_full <> ok_half) AS BIGINT)
           END AS mcnemar_chi2_cc_micro
    FROM flags
    """,
    doc="McNemar paired significance test for the Matryoshka dimension "
        "ablation: classify every vector by nearest integer centroid "
        "twice — full 64 dims vs the first 32 — and test whether the "
        "accuracy difference is real via the discordant-pair chi-square "
        "(continuity-corrected, (|b-c|-1)^2/(b+c); compare to 3.84 for "
        "p<0.05). The paired design is the point: 500 shared vectors "
        "give far more power than comparing two independent accuracy "
        "numbers, and b/c are exactly the vectors where truncating the "
        "embedding CHANGES the decision. Everything is integral: vectors "
        "are 1e-6 fixed-point with a +2e6 offset so centroid floor "
        "division agrees across engines on negative coordinates "
        "(translation leaves distances unchanged), distances are exact "
        "integer sums, argmin ties break on label, and accuracies/chi2 "
        "are ppm/micro floor divisions. Plan: one posexplode, one "
        "bounded (label,dim) centroid aggregate joined back on dim (640 "
        "rows, broadcastable), one (vec,label) distance aggregate, two "
        "partitioned argmin windows, a 1-row rollup. At corpus scale "
        "the only wide shuffle is the (vec_id,label) distance aggregate "
        "— linear in vectors x labels. Reference parity: extension "
        "surface (SURVEY.md §2.C ML rows).",
)
def ml_mcnemar_dim_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(1_000_000.0)).cast("long")
        + F.lit(2_000_000).cast("long"),
    )
    dims = emb.select(
        "vec_id", "label", F.posexplode(qv).alias("dim", "v")
    )
    cent = dims.groupBy(F.col("label").alias("clabel"), "dim").agg(
        F.expr("CAST(SUM(v) DIV COUNT(*) AS BIGINT)").alias("c")
    )
    from wal_consumer_spark.operators.broadcast import maybe_broadcast

    d2 = (F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))
    dist = (
        dims.join(maybe_broadcast(cent), "dim")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(d2).alias("dist_full"),
            F.sum(F.when(F.col("dim") < 32, d2).otherwise(F.lit(0))).alias(
                "dist_half"
            ),
        )
    )
    w_full = Window.partitionBy("vec_id").orderBy("dist_full", "clabel")
    w_half = Window.partitionBy("vec_id").orderBy("dist_half", "clabel")
    pred = (
        dist.withColumn("rf", F.row_number().over(w_full))
        .withColumn("rh", F.row_number().over(w_half))
        .groupBy("vec_id", "label")
        .agg(
            F.max(F.when(F.col("rf") == 1, F.col("clabel"))).alias(
                "pred_full"
            ),
            F.max(F.when(F.col("rh") == 1, F.col("clabel"))).alias(
                "pred_half"
            ),
        )
    )
    flags = pred.select(
        (F.col("pred_full") == F.col("label")).cast("int").alias("ok_full"),
        (F.col("pred_half") == F.col("label")).cast("int").alias("ok_half"),
    )
    b = F.count_if((F.col("ok_full") == 1) & (F.col("ok_half") == 0))
    c = F.count_if((F.col("ok_full") == 0) & (F.col("ok_half") == 1))
    disc = F.count_if(F.col("ok_full") != F.col("ok_half"))
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.expr(
            "CAST(CAST(SUM(ok_full) AS DECIMAL(38,0)) * 1000000 "
            "DIV COUNT(*) AS BIGINT)"
        ).alias("acc_full_ppm"),
        F.expr(
            "CAST(CAST(SUM(ok_half) AS DECIMAL(38,0)) * 1000000 "
            "DIV COUNT(*) AS BIGINT)"
        ).alias("acc_half_ppm"),
        b.cast("long").alias("n_full_only"),
        c.cast("long").alias("n_half_only"),
        F.when(
            disc > 0,
            (
                (F.abs(b - c) - 1) * (F.abs(b - c) - 1)
            ).cast("decimal(38,0)")
            * F.lit(1_000_000),
        )
        .cast("decimal(38,0)")
        .alias("_chi2_num"),
        disc.cast("long").alias("_disc"),
    ).select(
        "n_vectors",
        "acc_full_ppm",
        "acc_half_ppm",
        "n_full_only",
        "n_half_only",
        F.expr(
            "CAST(_chi2_num DIV _disc AS BIGINT)"
        ).alias("mcnemar_chi2_cc_micro"),
    )


@register(
    "dedup_shingle_df_profile",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    ),
    df AS (
        SELECT shingle, CAST(COUNT(*) AS BIGINT) AS d
        FROM sh GROUP BY shingle
    )
    SELECT CAST(floor(ln(CAST(d AS DOUBLE)) / ln(2)) AS BIGINT)
               AS df_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(MIN(d) AS BIGINT) AS min_df,
           CAST(MAX(d) AS BIGINT) AS max_df,
           CAST(SUM(CAST(d * (d - 1) AS HUGEINT) // 2) AS BIGINT)
               AS candidate_pairs
    FROM df GROUP BY 1
    """,
    doc="Shingle document-frequency profile: log2-bucket histogram of "
        "how many documents each 3-shingle appears in, with the implied "
        "candidate-pair volume sum d*(d-1)/2 per bucket — the planning "
        "table for the exact-Jaccard pair join's max_df cap (the text-"
        "side twin of sim_lsh_bucket_balance: the top bucket IS the "
        "stop-shingle mass a df cap drops, and its pair column is "
        "exactly the join cost the cap saves; read this BEFORE picking "
        "the cap instead of discovering a hot shingle as a straggler "
        "task at 100 TB). One explode scan, one shingle-keyed count "
        "(the shuffle every shingle op already pays), bounded output; "
        "pair arithmetic integral end-to-end (the ADVICE-r7 lesson), "
        "and the log2 bucket's ln sees an exact integer "
        "(agg_log2_histogram convention). Reference parity: extension "
        "surface (SURVEY.md §2.C dedup rows).",
)
def dedup_shingle_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.functions.text import tokens, word_shingles

    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), 3)).alias("shingle"),
    )
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).cast("long").alias("d"))
    bucket = F.floor(
        F.log(F.col("d").cast("double")) / F.log(F.lit(2.0))
    ).cast("long")
    return df.groupBy(bucket.alias("df_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.min("d").cast("long").alias("min_df"),
        F.max("d").cast("long").alias("max_df"),
        F.sum(F.expr("CAST(d * (d - 1) DIV 2 AS DECIMAL(38,0))"))
        .cast("long")
        .alias("candidate_pairs"),
    )


@register(
    "pipeline_soft_dedup_weights",
    oracle=f"""
    WITH RECURSIVE
    sh AS (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents),
    shc AS (
        -- mirrors shingle_pairs_jaccard's max_df=1000 stop-shingle cap
        -- (operators/dedup.py:35): intersection counts use only shingles
        -- with document frequency <= 1000; set sizes keep the full sets
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    pairs AS (
        SELECT doc1, doc2 FROM inter
        JOIN sizes s1 ON s1.doc_id = doc1
        JOIN sizes s2 ON s2.doc_id = doc2
        WHERE n_common / (s1.n + s2.n - n_common) >= 0.5
    ),
    sym AS (SELECT doc1 AS a, doc2 AS b FROM pairs
            UNION SELECT doc2, doc1 FROM pairs
            UNION SELECT doc1, doc1 FROM pairs
            UNION SELECT doc2, doc2 FROM pairs),
    reach AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    comp AS (SELECT a AS node, MIN(b) AS canonical FROM reach GROUP BY a),
    csize AS (SELECT canonical, CAST(COUNT(*) AS BIGINT) AS sz
              FROM comp GROUP BY canonical),
    member AS (
        SELECT comp.node AS doc_id, comp.canonical, csize.sz
        FROM comp JOIN csize USING (canonical)
    )
    SELECT d.doc_id,
           CAST(COALESCE(m.canonical, d.doc_id) AS BIGINT) AS canonical_id,
           CAST(COALESCE(m.sz, 1) AS BIGINT) AS cluster_size,
           CAST(1000000 // COALESCE(m.sz, 1) AS BIGINT) AS weight_ppm
    FROM documents d LEFT JOIN member m ON m.doc_id = d.doc_id
    """,
    doc="Soft deduplication weights: instead of removing near-duplicates "
        "(keep-one-per-cluster), assign every document the sampling "
        "weight 1/cluster_size over the Jaccard>=0.5 near-dup clusters — "
        "each duplicated passage then contributes ONE document's worth "
        "of expected training mass while retaining all surface variants "
        "(the soft-dedup recipe that avoids the representative-selection "
        "bias hard removal introduces). Per doc: the canonical member "
        "(min id), cluster size, and ppm weight — the weight column a "
        "sampler joins on. Only near-dup candidates enter the CC shuffle "
        "(singletons join back with weight 1.0 via one left join); "
        "clusters come from the shared alternating-star CC. Reference "
        "parity: extension surface (SURVEY.md §2.C dedup/curation rows).",
)
def pipeline_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.dedup import shingle_pairs_jaccard
    from wal_consumer_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_pairs_jaccard(docs, "doc_id", "text").filter(
        F.col("jaccard") >= 0.5
    )
    cc = connected_components(pairs.select("doc1", "doc2"))
    per_comp = cc.groupBy("component").agg(
        F.min("node").alias("canonical"),
        F.count(F.lit(1)).cast("long").alias("sz"),
    )
    member = cc.join(per_comp, "component").select(
        F.col("node").alias("doc_id"), "canonical", "sz"
    )
    return (
        docs.select("doc_id")
        .join(member, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("canonical"), F.col("doc_id"))
            .cast("long")
            .alias("canonical_id"),
            F.coalesce(F.col("sz"), F.lit(1)).cast("long").alias(
                "cluster_size"
            ),
            F.expr(
                "CAST(1000000 DIV COALESCE(sz, 1) AS BIGINT)"
            ).alias("weight_ppm"),
        )
    )


@register(
    "sim_davies_bouldin_index",
    oracle="""
    WITH q AS (
        SELECT vec_id, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(round(x * 1000000.0) AS BIGINT) + 2000000)
                   AS qv
        FROM embeddings
    ),
    dims AS (
        SELECT vec_id, label, generate_subscripts(qv, 1) - 1 AS dim,
               unnest(qv) AS v
        FROM q
    ),
    cent AS (
        SELECT label AS clabel, dim,
               CAST(CAST(SUM(v) AS HUGEINT) // COUNT(*) AS BIGINT) AS c,
               CAST(COUNT(*) AS BIGINT) AS n_dim_rows
        FROM dims GROUP BY label, dim
    ),
    memb AS (
        SELECT d.vec_id, d.label,
               CAST(floor(sqrt(CAST(SUM((d.v - ct.c) * (d.v - ct.c))
                                    AS DOUBLE))) AS BIGINT) AS dist
        FROM dims d JOIN cent ct ON ct.clabel = d.label AND ct.dim = d.dim
        GROUP BY d.vec_id, d.label
    ),
    scatter AS (
        SELECT label,
               CAST(CAST(SUM(dist) AS HUGEINT) // COUNT(*) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n_members
        FROM memb GROUP BY label
    ),
    sep AS (
        SELECT a.clabel AS li, b.clabel AS lj,
               CAST(floor(sqrt(CAST(SUM((a.c - b.c) * (a.c - b.c))
                                    AS DOUBLE))) AS BIGINT) AS d_ij
        FROM cent a JOIN cent b ON a.dim = b.dim AND a.clabel <> b.clabel
        GROUP BY a.clabel, b.clabel
    ),
    ratio AS (
        SELECT sep.li, sep.lj,
               CAST(CAST((si.s + sj.s) AS HUGEINT) * 1000000 // sep.d_ij
                    AS BIGINT) AS r_ppm
        FROM sep
        JOIN scatter si ON si.label = sep.li
        JOIN scatter sj ON sj.label = sep.lj
    ),
    worst AS (
        -- maximize r_ppm, break ties on the LOWER label id: labels are
        -- < 16, so r_ppm*16 + (15 - lj) orders exactly like
        -- (r_ppm DESC, lj ASC)
        SELECT li,
               arg_max(lj, CAST(r_ppm AS BIGINT) * 16 + (15 - lj))
                   AS worst_lj,
               MAX(r_ppm) AS worst_r_ppm
        FROM ratio GROUP BY li
    )
    SELECT CAST(w.li AS INT) AS label,
           sc.n_members,
           sc.s AS scatter_micro,
           CAST(w.worst_lj AS INT) AS worst_other_label,
           w.worst_r_ppm AS db_term_ppm
    FROM worst w JOIN scatter sc ON sc.label = w.li
    """,
    doc="Davies-Bouldin cluster-separation terms per label: within-label "
        "scatter (mean member distance to the integer centroid), and for "
        "each label the WORST (scatter_i + scatter_j) / separation_ij "
        "ratio over all other labels — the classic compactness-vs-"
        "separation index (lower = better separated; the mean of the "
        "per-label terms is the global DB index) complementing "
        "sim_label_silhouette with a centroid-based O(|labels|^2) "
        "formulation instead of silhouette's pairwise one. Fully "
        "integral via the +2e6-offset fixed-point centroid trick "
        "(ml_mcnemar_dim_ablation): floor-div centroids agree across "
        "engines, member/centroid distances are floor(sqrt(exact int)), "
        "ratios are ppm floor divisions; the worst-other argmax breaks "
        "ties on the LOWER label id via a composite scalar key. Plan: "
        "one posexplode, one bounded (label,dim) centroid aggregate, "
        "one member-distance aggregate (the only corpus-wide shuffle), "
        "then 10x10 bounded pair work. Reference parity: extension "
        "surface (SURVEY.md §2.C similarity rows).",
)
def sim_davies_bouldin_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.broadcast import maybe_broadcast

    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(1_000_000.0)).cast("long")
        + F.lit(2_000_000).cast("long"),
    )
    dims = emb.select("vec_id", "label", F.posexplode(qv).alias("dim", "v"))
    cent = dims.groupBy(F.col("label").alias("clabel"), "dim").agg(
        F.expr("CAST(SUM(v) DIV COUNT(*) AS BIGINT)").alias("c")
    )
    memb = (
        dims.join(
            maybe_broadcast(cent),
            (F.col("label") == F.col("clabel")) & (dims.dim == cent.dim),
        )
        .groupBy("vec_id", "label")
        .agg(
            F.floor(
                F.sqrt(
                    F.sum(
                        (F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))
                    ).cast("double")
                )
            )
            .cast("long")
            .alias("dist")
        )
    )
    scatter = memb.groupBy("label").agg(
        F.expr("CAST(SUM(dist) DIV COUNT(*) AS BIGINT)").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    )
    a = cent.select(
        F.col("clabel").alias("li"), F.col("dim").alias("da"), F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("clabel").alias("lj"), F.col("dim").alias("db_"), F.col("c").alias("cb")
    )
    sep = (
        a.join(b, (F.col("da") == F.col("db_")) & (F.col("li") != F.col("lj")))
        .groupBy("li", "lj")
        .agg(
            F.floor(
                F.sqrt(
                    F.sum(
                        (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))
                    ).cast("double")
                )
            )
            .cast("long")
            .alias("d_ij")
        )
    )
    si = scatter.select(F.col("label").alias("li"), F.col("s").alias("s_i"))
    sj = scatter.select(F.col("label").alias("lj"), F.col("s").alias("s_j"))
    ratio = (
        sep.join(si, "li")
        .join(sj, "lj")
        .select(
            "li",
            "lj",
            F.expr(
                "CAST(CAST(s_i + s_j AS DECIMAL(38,0)) * 1000000 "
                "DIV d_ij AS BIGINT)"
            ).alias("r_ppm"),
        )
    )
    w = Window.partitionBy("li").orderBy(F.col("r_ppm").desc(), "lj")
    worst = (
        ratio.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("li", F.col("lj").alias("worst_lj"), F.col("r_ppm"))
    )
    return worst.join(
        scatter.withColumnRenamed("label", "li"), "li"
    ).select(
        F.col("li").cast("int").alias("label"),
        "n_members",
        F.col("s").alias("scatter_micro"),
        F.col("worst_lj").cast("int").alias("worst_other_label"),
        F.col("r_ppm").alias("db_term_ppm"),
    )


@register(
    "sim_isotropy_audit",
    oracle="""
    WITH q AS (
        SELECT label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(round(x * 1000000.0) AS BIGINT))
                   AS qv
        FROM embeddings
    ),
    dims AS (
        SELECT label, generate_subscripts(qv, 1) - 1 AS dim, unnest(qv) AS v
        FROM q
    ),
    sums AS (
        SELECT label, dim, CAST(SUM(v) AS HUGEINT) AS s
        FROM dims GROUP BY label, dim
    ),
    percomp AS (
        SELECT label,
               CAST(SUM(s * s) AS HUGEINT) AS sum_sq
        FROM sums GROUP BY label
    ),
    norms AS (
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(list_sum(list_transform(qv, x -> x * x)))
                    AS HUGEINT) AS sum_norm2
        FROM q GROUP BY label
    )
    SELECT CAST(n.label AS INT) AS label,
           n.n AS n_vectors,
           CAST(p.sum_sq // (n.n * n.n) AS BIGINT) AS mean_vec_norm2_sq,
           CAST(n.sum_norm2 // n.n AS BIGINT) AS mean_norm2,
           CAST(p.sum_sq * 1000000 // (n.n * n.sum_norm2) AS BIGINT)
               AS anisotropy_ppm
    FROM norms n JOIN percomp p ON p.label = n.label
    """,
    doc="Embedding isotropy audit per label: the anisotropy ratio "
        "||mean vector||^2 / mean(||v||^2) — near 0 for an isotropic "
        "cloud (vectors cancel), near 1e6 ppm when every vector points "
        "the same way (the 'anisotropic cone' pathology of contextual "
        "embedding spaces, Ethayarajh 2019; also the denominator "
        "correction every mean-centered cosine needs). Equivalent to the "
        "mean pairwise-cosine-with-self diagnostic but computed WITHOUT "
        "any pair join: one per-(label,dim) SUM builds the mean "
        "direction, one per-vector norm pass builds the denominator — "
        "both single narrow shuffles at any corpus size. Arithmetic is "
        "exact integers end-to-end on the shared 1e-6 fixed-point "
        "quantization (sum-vector components squared in HUGEINT/DECIMAL, "
        "ppm floor division). Reference parity: extension surface "
        "(SURVEY.md §2.C similarity rows).",
)
def sim_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(1_000_000.0)).cast("long"),
    )
    withq = emb.select("label", qv.alias("qv"))
    dims = withq.select("label", F.posexplode("qv").alias("dim", "v"))
    sums = dims.groupBy("label", "dim").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s")
    )
    percomp = sums.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).alias("sum_sq")
    )
    norm2 = F.aggregate(
        F.col("qv"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    norms = withq.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(norm2.cast("decimal(38,0)")).alias("sum_norm2"),
    )
    return norms.join(percomp, "label").select(
        F.col("label").cast("int").alias("label"),
        F.col("n").alias("n_vectors"),
        F.expr("CAST(sum_sq DIV (n * n) AS BIGINT)").alias(
            "mean_vec_norm2_sq"
        ),
        F.expr("CAST(sum_norm2 DIV n AS BIGINT)").alias("mean_norm2"),
        F.expr(
            "CAST(sum_sq * 1000000 DIV (n * sum_norm2) AS BIGINT)"
        ).alias("anisotropy_ppm"),
    )


@register(
    "ml_fleiss_kappa_panel",
    oracle="""
    WITH q AS (
        SELECT vec_id, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(round(x * 1000000.0) AS BIGINT) + 2000000)
                   AS qv
        FROM embeddings
    ),
    dims AS (
        SELECT vec_id, generate_subscripts(qv, 1) - 1 AS dim, unnest(qv) AS v
        FROM q
    ),
    cent AS (
        SELECT e.label AS clabel, d.dim,
               CAST(CAST(SUM(d.v) AS HUGEINT) // COUNT(*) AS BIGINT) AS c
        FROM dims d JOIN q e ON e.vec_id = d.vec_id
        GROUP BY e.label, d.dim
    ),
    dist AS (
        SELECT d.vec_id, ct.clabel,
               SUM(CASE WHEN d.dim < 16
                        THEN (d.v - ct.c) * (d.v - ct.c) ELSE 0 END) AS d16,
               SUM(CASE WHEN d.dim < 32
                        THEN (d.v - ct.c) * (d.v - ct.c) ELSE 0 END) AS d32,
               SUM((d.v - ct.c) * (d.v - ct.c)) AS d64
        FROM dims d JOIN cent ct ON ct.dim = d.dim
        GROUP BY d.vec_id, ct.clabel
    ),
    pred AS (
        SELECT vec_id,
               arg_min(clabel, CAST(d16 AS BIGINT) * 16 + clabel) AS r16,
               arg_min(clabel, CAST(d32 AS BIGINT) * 16 + clabel) AS r32,
               arg_min(clabel, CAST(d64 AS BIGINT) * 16 + clabel) AS r64
        FROM dist GROUP BY vec_id
    ),
    votes AS (
        SELECT vec_id, cat, CAST(COUNT(*) AS BIGINT) AS nij FROM (
            SELECT vec_id, r16 AS cat FROM pred
            UNION ALL SELECT vec_id, r32 FROM pred
            UNION ALL SELECT vec_id, r64 FROM pred
        ) GROUP BY vec_id, cat
    ),
    s1 AS (
        SELECT CAST(SUM(nij * nij) - 3 * COUNT(DISTINCT vec_id) AS HUGEINT)
                   AS s1,
               CAST(COUNT(DISTINCT vec_id) AS HUGEINT) AS n_items
        FROM votes
    ),
    marg AS (
        SELECT CAST(SUM(cj * cj) AS HUGEINT) AS sum_cj_sq
        FROM (SELECT cat, CAST(SUM(nij) AS HUGEINT) AS cj
              FROM votes GROUP BY cat)
    )
    SELECT CAST(s1.n_items AS BIGINT) AS n_items,
           CAST(s1.s1 * 1000000 // (s1.n_items * 6) AS BIGINT) AS p_bar_ppm,
           CAST(m.sum_cj_sq * 1000000 // ((s1.n_items * 3)
                                          * (s1.n_items * 3)) AS BIGINT)
               AS p_e_ppm,
           CAST((s1.s1 * (s1.n_items * 3) * (s1.n_items * 3)
                 - m.sum_cj_sq * s1.n_items * 6) * 1000000
                // ((s1.n_items * 3) * (s1.n_items * 3) * s1.n_items * 6
                    - m.sum_cj_sq * s1.n_items * 6) AS BIGINT)
               AS fleiss_kappa_micro
    FROM s1, marg m
    """,
    doc="Fleiss' kappa over a three-rater panel: the 16-, 32-, and "
        "64-dim nearest-integer-centroid classifiers (the Matryoshka "
        "ladder from ml_mcnemar_dim_ablation) each label every vector, "
        "and the panel's chance-corrected agreement is the multi-rater "
        "generalization of Cohen's kappa — the data-labeling QA number "
        "for annotator panels (here: how consistent the embedding's "
        "decision geometry stays under dimension truncation). EXACT "
        "RATIONAL arithmetic throughout: P_bar = S1/(N*n*(n-1)) with "
        "S1 = sum_i(sum_j n_ij^2) - N*n, P_e = sum_j C_j^2/(N*n)^2, and "
        "kappa's (P_bar-P_e)/(1-P_e) is evaluated by integer cross-"
        "multiplication in HUGEINT/DECIMAL before ONE ppm/micro floor "
        "division each — no intermediate doubles anywhere. Plan: the "
        "shared posexplode + bounded centroid join + one (vec,label) "
        "distance aggregate; panel votes are three argmins over the "
        "same 10-candidate frame. Reference parity: extension surface "
        "(SURVEY.md §2.C ML rows).",
)
def ml_fleiss_kappa_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.broadcast import maybe_broadcast

    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(1_000_000.0)).cast("long")
        + F.lit(2_000_000).cast("long"),
    )
    dims = emb.select("vec_id", "label", F.posexplode(qv).alias("dim", "v"))
    cent = dims.groupBy(F.col("label").alias("clabel"), "dim").agg(
        F.expr("CAST(SUM(v) DIV COUNT(*) AS BIGINT)").alias("c")
    )
    d2 = (F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))
    dist = (
        dims.join(maybe_broadcast(cent), "dim")
        .groupBy("vec_id", "clabel")
        .agg(
            F.sum(F.when(F.col("dim") < 16, d2).otherwise(F.lit(0))).alias(
                "d16"
            ),
            F.sum(F.when(F.col("dim") < 32, d2).otherwise(F.lit(0))).alias(
                "d32"
            ),
            F.sum(d2).alias("d64"),
        )
    )
    pred = dist.groupBy("vec_id").agg(
        F.min_by("clabel", F.col("d16") * 16 + F.col("clabel")).alias("r16"),
        F.min_by("clabel", F.col("d32") * 16 + F.col("clabel")).alias("r32"),
        F.min_by("clabel", F.col("d64") * 16 + F.col("clabel")).alias("r64"),
    )
    votes = (
        pred.select("vec_id", F.col("r16").alias("cat"))
        .unionAll(pred.select("vec_id", F.col("r32").alias("cat")))
        .unionAll(pred.select("vec_id", F.col("r64").alias("cat")))
        .groupBy("vec_id", "cat")
        .agg(F.count(F.lit(1)).cast("long").alias("nij"))
    )
    s1 = votes.agg(
        (
            F.sum(
                (F.col("nij") * F.col("nij")).cast("decimal(38,0)")
            )
            - F.count_distinct("vec_id").cast("decimal(38,0)") * 3
        ).alias("s1"),
        F.count_distinct("vec_id").cast("decimal(38,0)").alias("n_items"),
    )
    marg = (
        votes.groupBy("cat")
        .agg(F.sum("nij").cast("decimal(38,0)").alias("cj"))
        .agg(F.sum(F.col("cj") * F.col("cj")).alias("sum_cj_sq"))
    )
    return s1.crossJoin(F.broadcast(marg)).select(
        F.col("n_items").cast("long").alias("n_items"),
        F.expr(
            "CAST(s1 * 1000000 DIV (n_items * 6) AS BIGINT)"
        ).alias("p_bar_ppm"),
        F.expr(
            "CAST(sum_cj_sq * 1000000 DIV ((n_items * 3) * (n_items * 3)) "
            "AS BIGINT)"
        ).alias("p_e_ppm"),
        F.expr(
            "CAST((s1 * (n_items * 3) * (n_items * 3) "
            "- sum_cj_sq * n_items * 6) * 1000000 "
            "DIV ((n_items * 3) * (n_items * 3) * n_items * 6 "
            "- sum_cj_sq * n_items * 6) AS BIGINT)"
        ).alias("fleiss_kappa_micro"),
    )


@register(
    "sim_knn_hubness_histogram",
    oracle=f"""{_knn_top_cte_sql()},
    occ AS (
        SELECT cand_id, CAST(COUNT(*) AS BIGINT) AS k_occ
        FROM top GROUP BY cand_id
    ),
    kfull AS (
        SELECT e.vec_id, COALESCE(o.k_occ, 0) AS k_occ
        FROM e LEFT JOIN occ o ON o.cand_id = e.vec_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM e)
    SELECT CAST(k.k_occ AS BIGINT) AS n_occurrences,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(CAST(COUNT(*) AS HUGEINT) * 1000000 // t.n_all AS BIGINT)
               AS share_ppm
    FROM kfull k CROSS JOIN tot t
    GROUP BY k.k_occ, t.n_all
    """,
    doc="k-occurrence (hubness) histogram of the embedding space: how "
        "often each vector appears in OTHER vectors' exact-cosine top-5 "
        "lists (the same LSH-bucketed all-corpus kNN substrate as "
        "sim_knn_label_purity, shared via _knn_top5_frame), histogrammed "
        "by occurrence count with never-retrieved vectors at bucket 0 — "
        "the high-dimensional hubness pathology probe (Radovanovic et "
        "al.: skewed k-occurrence means a few 'hub' points dominate "
        "retrieval and ANN recall targets mislead; antihubs at 0 are "
        "unreachable). Plan adds one narrow cand_id count and a left "
        "join to the corpus spine on top of the shared top-5 frame; "
        "output is bounded by the occurrence-count domain. Reference "
        "parity: extension surface (SURVEY.md §2.C similarity rows).",
)
def sim_knn_hubness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    top = _knn_top5_frame(spark, sf_dir)
    occ = top.groupBy("cand_id").agg(
        F.count(F.lit(1)).cast("long").alias("k_occ")
    )
    kfull = (
        emb.select("vec_id")
        .join(occ, F.col("vec_id") == F.col("cand_id"), "left")
        .select(F.coalesce(F.col("k_occ"), F.lit(0)).alias("k_occ"))
    )
    tot = emb.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    return (
        kfull.groupBy("k_occ")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k_occ").cast("long").alias("n_occurrences"),
            "n_vectors",
            F.expr(
                "CAST(CAST(n_vectors AS DECIMAL(38,0)) * 1000000 "
                "DIV n_all AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


@register(
    "sim_dimension_variance_scree",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    q AS (
        SELECT vec_id,
               generate_subscripts(v, 1) - 1 AS dim,
               CAST(round(unnest(v) * 1000000.0) AS BIGINT) AS qx
        FROM e
    ),
    st AS (
        SELECT dim,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qx) AS HUGEINT) AS s,
               CAST(SUM(qx * qx) AS HUGEINT) AS s2
        FROM q GROUP BY dim
    ),
    vr AS (
        SELECT dim, n, CAST(s AS BIGINT) AS sum_q_micro,
               n * s2 - s * s AS var_num
        FROM st
    ),
    tot AS (SELECT SUM(var_num) AS total_var FROM vr)
    SELECT CAST(v.dim AS BIGINT) AS dim,
           v.n AS n_vectors,
           v.sum_q_micro,
           CAST(v.var_num // (v.n * v.n) AS BIGINT) AS var_micro2,
           CAST(v.var_num * 1000000 // t.total_var AS BIGINT)
               AS var_share_ppm,
           CAST(row_number() OVER (ORDER BY v.var_num DESC, v.dim)
                AS BIGINT) AS var_rank,
           CAST(SUM(v.var_num) OVER (ORDER BY v.var_num DESC, v.dim
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                * 1000000 // t.total_var AS BIGINT) AS cum_share_ppm
    FROM vr v CROSS JOIN tot t
    """,
    doc="Per-dimension variance scree of the embedding table: each of "
        "the 64 dimensions' exact variance numerator n*sum(q^2) - "
        "(sum q)^2 on the shared 1e-6 fixed-point quantization, its "
        "share of total variance, variance rank, and the cumulative "
        "scree curve — the PCA-free intrinsic-dimensionality readout "
        "(a cliff in cum_share says how many dims carry the signal; "
        "near-zero-variance dims are dead capacity and prime "
        "Matryoshka-truncation candidates, complementing "
        "sim_isotropy_audit's direction-level view). ONE explode pass "
        "and a 64-group aggregate — no pair join, no covariance matrix; "
        "the ranking windows run over the dimension-domain table "
        "(bounded by the embedding width, never the corpus). All "
        "outputs integral (HUGEINT/DECIMAL floor-div on non-negative "
        "quantities). Reference parity: extension surface (SURVEY.md "
        "§2.C similarity rows).",
)
def sim_dimension_variance_scree(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(1000000.0)).cast("long"),
    )
    q = emb.select(F.posexplode(qv).alias("dim", "qx"))
    st = q.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qx").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("qx") * F.col("qx")).cast("decimal(38,0)").alias("s2"),
    )
    vr = st.select(
        "dim",
        "n",
        F.col("s").cast("long").alias("sum_q_micro"),
        (F.col("n") * F.col("s2") - F.col("s") * F.col("s")).alias("var_num"),
    )
    tot = vr.agg(F.sum("var_num").alias("total_var"))
    w_rank = Window.orderBy(F.col("var_num").desc(), "dim")
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    return vr.crossJoin(F.broadcast(tot)).select(
        F.col("dim").cast("long").alias("dim"),
        F.col("n").alias("n_vectors"),
        "sum_q_micro",
        F.expr("CAST(var_num DIV (n * n) AS BIGINT)").alias("var_micro2"),
        F.expr("CAST(var_num * 1000000 DIV total_var AS BIGINT)").alias(
            "var_share_ppm"
        ),
        F.row_number().over(w_rank).cast("long").alias("var_rank"),
        (F.sum("var_num").over(w_cum) * F.lit(1_000_000))
        .cast("decimal(38,0)")
        .alias("cum_num"),
        "total_var",
    ).select(
        "dim",
        "n_vectors",
        "sum_q_micro",
        "var_micro2",
        "var_share_ppm",
        "var_rank",
        F.expr("CAST(cum_num DIV total_var AS BIGINT)").alias("cum_share_ppm"),
    )


_LSH_BAND_CONFIGS = [(4, 8), (8, 4), (16, 2)]


def _lsh_band_sensitivity_sql() -> str:
    """Per-config DuckDB replay of the portable signature + banding at
    (4x8, 8x4, 16x2), each against the df-capped exact-Jaccard truth."""
    from wal_consumer_spark.operators.dedup import DEFAULT_MAX_BUCKET

    coeffs = "[" + ", ".join(f"[{a}, {b}]" for a, b in minhash_coeffs(32, 7)) + "]"
    return f"""
    WITH hs AS (
        SELECT doc_id,
               list_transform({_SHINGLES},
                              s -> ('0x' || substring(md5(s), 1, 8))::BIGINT) AS h
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               list_transform({coeffs}, c ->
                   list_min(list_transform(h, x -> (c[1] * x + c[2]) % 4294967311))) AS sig
        FROM hs
    ),
    sh AS (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents),
    shc AS (
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    truth AS (
        SELECT doc1, doc2 FROM inter
        JOIN sizes s1 ON s1.doc_id = doc1
        JOIN sizes s2 ON s2.doc_id = doc2
        WHERE n_common / (s1.n + s2.n - n_common) >= 0.5
    ),
    banded0 AS (
        SELECT doc_id, band, bucket FROM (
            SELECT doc_id, band, bucket,
                   COUNT(*) OVER (PARTITION BY band, bucket) AS bn
            FROM (
                SELECT doc_id, bb.b AS band,
                       array_to_string(list_slice(sig, bb.b * 8 + 1,
                                                  bb.b * 8 + 8), ',')
                           AS bucket
                FROM sig, (SELECT unnest(range(0, 4)) AS b) bb
            ) x
        ) y WHERE bn <= {DEFAULT_MAX_BUCKET}
    ),
    cands0 AS (
        SELECT DISTINCT a.doc_id AS doc1, c.doc_id AS doc2
        FROM banded0 a JOIN banded0 c USING (band, bucket)
        WHERE a.doc_id < c.doc_id
    ),
    banded1 AS (
        SELECT doc_id, band, bucket FROM (
            SELECT doc_id, band, bucket,
                   COUNT(*) OVER (PARTITION BY band, bucket) AS bn
            FROM (
                SELECT doc_id, bb.b AS band,
                       array_to_string(list_slice(sig, bb.b * 4 + 1,
                                                  bb.b * 4 + 4), ',')
                           AS bucket
                FROM sig, (SELECT unnest(range(0, 8)) AS b) bb
            ) x
        ) y WHERE bn <= {DEFAULT_MAX_BUCKET}
    ),
    cands1 AS (
        SELECT DISTINCT a.doc_id AS doc1, c.doc_id AS doc2
        FROM banded1 a JOIN banded1 c USING (band, bucket)
        WHERE a.doc_id < c.doc_id
    ),
    banded2 AS (
        SELECT doc_id, band, bucket FROM (
            SELECT doc_id, band, bucket,
                   COUNT(*) OVER (PARTITION BY band, bucket) AS bn
            FROM (
                SELECT doc_id, bb.b AS band,
                       array_to_string(list_slice(sig, bb.b * 2 + 1,
                                                  bb.b * 2 + 2), ',')
                           AS bucket
                FROM sig, (SELECT unnest(range(0, 16)) AS b) bb
            ) x
        ) y WHERE bn <= {DEFAULT_MAX_BUCKET}
    ),
    cands2 AS (
        SELECT DISTINCT a.doc_id AS doc1, c.doc_id AS doc2
        FROM banded2 a JOIN banded2 c USING (band, bucket)
        WHERE a.doc_id < c.doc_id
    ),
    cfg AS (
    SELECT CAST(4 AS BIGINT) AS bands, CAST(8 AS BIGINT) AS rows_per_band,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cands0) AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cands0 c
             JOIN truth t ON t.doc1 = c.doc1 AND t.doc2 = c.doc2)
               AS n_true_positives
    UNION ALL
    SELECT CAST(8 AS BIGINT) AS bands, CAST(4 AS BIGINT) AS rows_per_band,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cands1) AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cands1 c
             JOIN truth t ON t.doc1 = c.doc1 AND t.doc2 = c.doc2)
               AS n_true_positives
    UNION ALL
    SELECT CAST(16 AS BIGINT) AS bands, CAST(2 AS BIGINT) AS rows_per_band,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cands2) AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cands2 c
             JOIN truth t ON t.doc1 = c.doc1 AND t.doc2 = c.doc2)
               AS n_true_positives
    )
    SELECT bands, rows_per_band, n_candidates, n_truth, n_true_positives,
           CASE WHEN n_candidates = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(CAST(n_true_positives AS HUGEINT) * 1000000
                          // n_candidates AS BIGINT) END AS precision_ppm,
           CASE WHEN n_truth = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(CAST(n_true_positives AS HUGEINT) * 1000000
                          // n_truth AS BIGINT) END AS recall_ppm
    FROM cfg
    """


@register(
    "dedup_lsh_band_sensitivity",
    oracle=_lsh_band_sensitivity_sql(),
    doc="LSH band/row trade-off curve on the SAME 32-perm portable "
        "MinHash signatures: candidate counts, true positives, and "
        "precision/recall (ppm) against the df-capped exact-Jaccard>=0.5 "
        "truth for band configs 4x8 / 8x4 / 16x2 — the S-curve knob "
        "(threshold ~ (1/b)^(1/r)) you sweep BEFORE committing a "
        "corpus-wide dedup pass, complementing dedup_threshold_"
        "sensitivity (which sweeps the verify threshold at fixed "
        "banding) and dedup_lsh_eval (one config, full P/R/F1). "
        "Signatures are computed once and persisted across the three "
        "band joins; every config is the same bounded bucket equi-join "
        "with the max_bucket=500 skew guard (window count sharing the "
        "band exchange), so cost scales with sum of band counts, never "
        "pairs. All ratios are exact-integer DIVs. Reference parity: "
        "extension surface (SURVEY.md §2.C dedup rows).",
)
def dedup_lsh_band_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.dedup import (
        shingle_pairs_jaccard_from_sets,
    )

    # r12 (guide §1.2/§5): ONE tokenization feeds both the signature
    # build and the exact-Jaccard truth (was: minhash_signature and
    # shingle_pairs_jaccard each re-tokenized the corpus). Signatures are
    # localCheckpoint'ed instead of persist()ed: same
    # materialize-once-for-6-consumers effect (3 configs x 2 band sides),
    # but the plan reads a LogicalRDD leaf rather than re-deriving the
    # scan+md5 lineage under an InMemoryRelation, and nothing is left
    # registered in the CacheManager to bleed into later queries.
    docs = spread_small_input(load_table(spark, sf_dir, "documents"), "doc_id")
    sets = docs.select(
        F.col("doc_id").alias("doc"),
        word_shingles(tokens(F.col("text")), 3).alias("__ss"),
    ).localCheckpoint(eager=True)
    # r13 (guide §1.2/§5 — don't materialize what has one consumer): the
    # signature frame is consumed ONLY by the banded explode below, and
    # the three config branches now explode from ONE projection (a single
    # concat of per-config struct arrays) instead of three union branches
    # — so the eager sigs localCheckpoint job is dropped and the md5 +
    # 32-permutation signature computes once per doc inside the same
    # single pass. Catalyst keeps the sig projection BELOW the Generate
    # (CollapseProject refuses to inline a non-cheap alias referenced by
    # all 28 band slices), verified in the pinned plan: one md5/percentile
    # chain, Project under Generate.
    sigs = minhash_signature_from_shingles(sets, "doc", "__ss", portable=True)
    truth = (
        shingle_pairs_jaccard_from_sets(sets)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc1", "doc2")
        .localCheckpoint(eager=True)  # three config joins consume it
    )
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    truth_marked = truth.withColumn("__t", F.lit(1))
    # r12 second pass (guide §2.4 one exchange for same-keyed work, §2.3
    # shuffle fewer bytes): the three per-config band joins fuse into ONE
    # — the banded streams carry a config tag, so the bucket-skew
    # window, the self-join and the pair distinct all run once on
    # (cfg, band, bucket)/(cfg, doc1, doc2) keys instead of three times
    # (6 wide exchanges -> 2, one left join + aggregate instead of
    # three). The join also stops carrying the 32-long signature column
    # minhash_near_pairs ships for its estimate (this query discards the
    # estimate — pair IDENTITY is all it evaluates), so the banded
    # exchange is (cfg, band, bucket, doc) narrow. Pair sets per config
    # are identical to minhash_near_pairs' (same lsh_band_key buckets,
    # same per-config <=500 bucket cap via the (cfg, band, bucket)
    # window, doc1 < doc2, distinct == the old groupBy-max identity).
    # The 3-row config frame left-joins the per-config stats so a
    # zero-candidate config still reports its row, exactly like the old
    # per-config global aggregate.
    from wal_consumer_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET,
        lsh_band_key,
    )

    def _cfg_struct_array(ci: int, bands: int, rows_per_band: int):
        # single-arg inner function REQUIRED: F.transform feeds a 2-arg
        # lambda (element, index) — a defaulted second parameter would
        # silently receive the index column and zero out the slice length
        def _mk(b):
            return F.struct(
                F.lit(ci).cast("int").alias("cfg"),
                b.alias("band"),
                lsh_band_key(b, rows_per_band, True).alias("bucket"),
            )

        # band == the sequence element == the old posexplode position
        # (sequence starts at 0), so (cfg, band, bucket) rows are
        # value-identical to the old three-branch union
        return F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), _mk)

    banded = (
        sigs.select(
            "doc",
            F.explode(
                F.concat(
                    *[
                        _cfg_struct_array(ci, bands, rows_per_band)
                        for ci, (bands, rows_per_band) in enumerate(
                            _LSH_BAND_CONFIGS
                        )
                    ]
                )
            ).alias("e"),
        )
        .select(
            F.col("e.cfg").alias("cfg"),
            "doc",
            F.col("e.band").alias("band"),
            F.col("e.bucket").alias("bucket"),
        )
        .withColumn(
            "__n",
            F.count(F.lit(1)).over(Window.partitionBy("cfg", "band", "bucket")),
        )
        .filter(F.col("__n") <= DEFAULT_MAX_BUCKET)
        .drop("__n")
    )
    a = banded.select("cfg", "band", "bucket", F.col("doc").alias("doc1"))
    b = banded.select("cfg", "band", "bucket", F.col("doc").alias("doc2"))
    pairs = (
        a.join(b, ["cfg", "band", "bucket"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("cfg", "doc1", "doc2")
        .distinct()
    )
    stats = (
        pairs.join(truth_marked, ["doc1", "doc2"], "left")
        .groupBy("cfg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.count_if(F.col("__t").isNotNull())
            .cast("long")
            .alias("n_true_positives"),
        )
    )
    cfgs = None
    for ci, (bands, rows_per_band) in enumerate(_LSH_BAND_CONFIGS):
        row = spark.range(1).select(
            F.lit(ci).cast("int").alias("cfg"),
            F.lit(bands).cast("long").alias("bands"),
            F.lit(rows_per_band).cast("long").alias("rows_per_band"),
        )
        cfgs = row if cfgs is None else cfgs.unionByName(row)
    return (
        cfgs.join(F.broadcast(stats), "cfg", "left")
        .crossJoin(F.broadcast(n_truth))
        .select(
            "bands",
            "rows_per_band",
            F.coalesce(F.col("n_candidates"), F.lit(0))
            .cast("long")
            .alias("n_candidates"),
            "n_truth",
            F.coalesce(F.col("n_true_positives"), F.lit(0))
            .cast("long")
            .alias("n_true_positives"),
        )
        .select(
            "bands",
            "rows_per_band",
            "n_candidates",
            "n_truth",
            "n_true_positives",
            F.expr(
                "CASE WHEN n_candidates = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST(CAST(n_true_positives AS DECIMAL(38,0)) "
                "* 1000000 DIV n_candidates AS BIGINT) END"
            ).alias("precision_ppm"),
            F.expr(
                "CASE WHEN n_truth = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST(CAST(n_true_positives AS DECIMAL(38,0)) "
                "* 1000000 DIV n_truth AS BIGINT) END"
            ).alias("recall_ppm"),
        )
    )


@register(
    "pipeline_soft_dedup_ess_by_source",
    oracle=f"""
    WITH RECURSIVE
    sh AS (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents),
    shc AS (
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    pairs AS (
        SELECT doc1, doc2 FROM inter
        JOIN sizes s1 ON s1.doc_id = doc1
        JOIN sizes s2 ON s2.doc_id = doc2
        WHERE n_common / (s1.n + s2.n - n_common) >= 0.5
    ),
    sym AS (SELECT doc1 AS a, doc2 AS b FROM pairs
            UNION SELECT doc2, doc1 FROM pairs
            UNION SELECT doc1, doc1 FROM pairs
            UNION SELECT doc2, doc2 FROM pairs),
    reach AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    comp AS (SELECT a AS node, MIN(b) AS canonical FROM reach GROUP BY a),
    csize AS (SELECT canonical, CAST(COUNT(*) AS BIGINT) AS sz
              FROM comp GROUP BY canonical),
    member AS (
        SELECT comp.node AS doc_id, csize.sz
        FROM comp JOIN csize USING (canonical)
    ),
    w AS (
        SELECT d.source,
               CAST(1000000 // COALESCE(m.sz, 1) AS BIGINT) AS wt
        FROM documents d LEFT JOIN member m ON m.doc_id = d.doc_id
    ),
    st AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(wt) AS HUGEINT) AS sw,
               CAST(SUM(wt * wt) AS HUGEINT) AS sw2
        FROM w GROUP BY source
    )
    SELECT source, n_docs,
           CAST(sw AS BIGINT) AS sum_weight_ppm,
           CAST(sw * sw * 1000 // sw2 AS BIGINT) AS ess_milli,
           CAST(sw * sw * 1000000 // (n_docs * sw2) AS BIGINT)
               AS ess_ratio_ppm
    FROM st
    """,
    doc="Effective sample size of the soft-dedup sampling weights, per "
        "source: ESS = (sum w)^2 / sum w^2 (Kish) over the 1/cluster_size "
        "weights of pipeline_soft_dedup_weights — the number that says "
        "how much INDEPENDENT training mass each source actually "
        "contributes after soft dedup (a source of mirrors with "
        "ess_ratio near 1/cluster_size is syndication; near 1.0 is "
        "genuinely diverse), i.e. the acceptance test for choosing soft "
        "weighting over hard removal. ESS travels as exact integer "
        "rationals (ppm weights -> HUGEINT cross-multiplication, "
        "ess_milli = effective doc count x1000, ess_ratio_ppm = "
        "ESS/n). Plan: the shared df-capped candidate join + "
        "alternating-star CC (singletons re-enter via one left join), "
        "then a bounded per-source rollup. Reference parity: extension "
        "surface (SURVEY.md §2.C dedup/curation rows).",
)
def pipeline_soft_dedup_ess_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    weights = pipeline_soft_dedup_weights(spark, sf_dir).select(
        "doc_id", "weight_ppm"
    )
    w = docs.select("doc_id", "source").join(weights, "doc_id")
    st = w.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("weight_ppm").cast("decimal(38,0)").alias("sw"),
        F.sum(F.col("weight_ppm") * F.col("weight_ppm"))
        .cast("decimal(38,0)")
        .alias("sw2"),
    )
    return st.select(
        "source",
        "n_docs",
        F.col("sw").cast("long").alias("sum_weight_ppm"),
        F.expr("CAST(sw * sw * 1000 DIV sw2 AS BIGINT)").alias("ess_milli"),
        F.expr(
            "CAST(sw * sw * 1000000 DIV (n_docs * sw2) AS BIGINT)"
        ).alias("ess_ratio_ppm"),
    )


@register(
    "sim_centroid_margin_audit",
    oracle="""
    WITH q AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS qv
        FROM embeddings
    ),
    cent AS (
        SELECT label AS clabel, dim,
               CAST(SUM(qv) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM q GROUP BY label, dim
    ),
    d2 AS (
        SELECT q.vec_id, q.label, c.clabel,
               CAST(SUM(CAST(q.qv * c.n - c.s AS HUGEINT)
                        * (q.qv * c.n - c.s)) // (MAX(c.n) * MAX(c.n))
                    AS BIGINT) AS d2_micro2
        FROM q JOIN cent c USING (dim)
        GROUP BY q.vec_id, q.label, c.clabel
    ),
    own AS (
        SELECT vec_id, label, d2_micro2 AS d2_own
        FROM d2 WHERE clabel = label
    ),
    other AS (
        SELECT vec_id, MIN(d2_micro2) AS d2_nearest_other
        FROM d2 WHERE clabel <> label GROUP BY vec_id
    ),
    m AS (
        SELECT o.label, o.d2_own, t.d2_nearest_other,
               t.d2_nearest_other - o.d2_own AS margin
        FROM own o JOIN other t USING (vec_id)
    )
    SELECT CAST(label AS INT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(count_if(margin < 0) AS BIGINT) AS n_negative_margin,
           CAST(MIN(margin) AS BIGINT) AS min_margin_micro2,
           CAST(MAX(margin) AS BIGINT) AS max_margin_micro2,
           CAST(SUM(margin) // COUNT(*) AS BIGINT) AS mean_margin_micro2
    FROM m GROUP BY label
    """,
    doc="Centroid margin audit per label: every vector's squared distance "
        "to its OWN label centroid vs its NEAREST other centroid, and the "
        "margin between them — negative margin = the vector sits closer "
        "to a foreign class center (the nearest-centroid-classifier "
        "error set and the directest 'are these labels separable' "
        "readout, sharpening sim_label_silhouette's aggregate view to a "
        "per-class misassignment count). Exact arithmetic throughout: "
        "distances compare as floor((sum_d (q*n_c - s_cd)^2) / n_c^2) in "
        "integer micro^2 units — the common-denominator trick keeps the "
        "per-centroid rational comparable without doubles, and both "
        "engines floor identically so the argmin/margins match "
        "bit-for-bit. Plan: one explode pass, a bounded |labels|x|dims| "
        "centroid aggregate joined back on dim (broadcastable by "
        "construction), one (vec,label) rollup — no pair join anywhere. "
        "The mean margin divides a possibly-NEGATIVE sum: safe because "
        "Spark DIV and DuckDB // both truncate toward zero on signed "
        "integers (verified in the round-8 ADVICE calibration: "
        "-7 // 2 = -3 in DuckDB). Reference parity: extension "
        "surface (SURVEY.md §2.C similarity rows).",
)
def sim_centroid_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 1_000_000).cast("long"),
            )
        ).alias("dim", "qv"),
    )
    cent = q.groupBy(F.col("label").alias("clabel"), "dim").agg(
        F.sum("qv").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    d2 = (
        q.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.expr(
                "CAST(SUM(CAST(qv * n - s AS DECIMAL(38,0)) * (qv * n - s)) "
                "DIV (MAX(n) * MAX(n)) AS BIGINT)"
            ).alias("d2_micro2")
        )
    )
    own = d2.where(F.col("clabel") == F.col("label")).select(
        "vec_id", "label", F.col("d2_micro2").alias("d2_own")
    )
    other = (
        d2.where(F.col("clabel") != F.col("label"))
        .groupBy("vec_id")
        .agg(F.min("d2_micro2").alias("d2_nearest_other"))
    )
    m = own.join(other, "vec_id").select(
        "label",
        (F.col("d2_nearest_other") - F.col("d2_own")).alias("margin"),
    )
    return m.groupBy(F.col("label").cast("int").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.count_if(F.col("margin") < 0).cast("long").alias("n_negative_margin"),
        F.min("margin").cast("long").alias("min_margin_micro2"),
        F.max("margin").cast("long").alias("max_margin_micro2"),
        F.expr("CAST(SUM(margin) DIV COUNT(*) AS BIGINT)").alias(
            "mean_margin_micro2"
        ),
    )


#: JL projection target dimensionality (64 -> 8) and the md5 salt that
#: derives the deterministic ±1 sign matrix, shared with the oracle text.
_JL_K = 8
_JL_SALT = ":jl9"


def _jl_distortion_sql() -> str:
    """DuckDB replay: identical sign matrix (md5 first hex digit >= '8'
    => +1), identical milli-quantization and block-sampled pair set as
    sim_pair_distance_histogram."""
    sign = (
        f"CASE WHEN substring(md5(CAST(d.d AS VARCHAR) || ':' "
        f"|| CAST(j.j AS VARCHAR) || '{_JL_SALT}'), 1, 1) >= '8' "
        "THEN 1 ELSE -1 END"
    )
    return f"""
    WITH s AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(round(x * 1000) AS BIGINT)) AS q
        FROM embeddings
        WHERE ('0x' || substring(md5(CAST(vec_id AS VARCHAR)
                                     || '{_PAIR_SAMP_SALT}'), 1, 8))::BIGINT
              % 100 < {_PAIR_SAMP_PCT}
    ),
    proj AS (
        SELECT s.vec_id, j.j,
               CAST(SUM(({sign}) * s.q[d.d + 1]) AS BIGINT) AS pv
        FROM s,
             (SELECT unnest(range(0, 64)) AS d) d,
             (SELECT unnest(range(0, {_JL_K})) AS j) j
        GROUP BY s.vec_id, j.j
    ),
    pv AS (
        SELECT vec_id, list(pv ORDER BY j) AS p FROM proj GROUP BY vec_id
    ),
    pairs AS (
        SELECT a.vec_id AS v1, b.vec_id AS v2,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> (a0.q[i] - b0.q[i]) * (a0.q[i] - b0.q[i])))
                    AS BIGINT) AS d2_orig,
               CAST(list_sum(list_transform(range(1, {_JL_K + 1}),
                    i -> (a.p[i] - b.p[i]) * (a.p[i] - b.p[i])))
                    AS BIGINT) AS d2_proj
        FROM pv a JOIN pv b ON a.vec_id < b.vec_id
        JOIN s a0 ON a0.vec_id = a.vec_id
        JOIN s b0 ON b0.vec_id = b.vec_id
    ),
    r AS (
        SELECT CAST(CAST(d2_proj AS HUGEINT) * 1000000
                    // (CAST({_JL_K} AS HUGEINT) * d2_orig) AS BIGINT)
                   AS ratio_ppm
        FROM pairs WHERE d2_orig > 0
    )
    SELECT CAST(ratio_ppm // 200000 AS BIGINT) AS ratio_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(ratio_ppm) AS BIGINT) AS min_ratio_ppm,
           CAST(MAX(ratio_ppm) AS BIGINT) AS max_ratio_ppm
    FROM r GROUP BY 1
    """


@register(
    "sim_jl_projection_distortion",
    oracle=_jl_distortion_sql(),
    doc="Johnson-Lindenstrauss distortion audit: project the 64-dim "
        "embeddings to 8 dims with a deterministic ±1 sign matrix "
        "(md5-derived — the Achlioptas database-friendly JL variant) and "
        "histogram, over the same md5 block-sampled pair set as "
        "sim_pair_distance_histogram, the ratio "
        "||proj(a)-proj(b)||^2 / (k * ||a-b||^2) in exact ppm — the "
        "E[ratio]=1 concentration readout that tells you whether an "
        "8-dim sketch is safe for coarse candidate pruning before the "
        "exact 64-dim verify (the dimension-reduction cousin of the "
        "int8-SQ8 recall audit). Signed ±1 entries make every "
        "projection an exact integer sum of milli-quantized components; "
        "distances and the k-scaled ratio stay integral end-to-end. "
        "Plan: the projection is one map-side explode-aggregate per "
        "vector (bounded k x 64 work, no shuffle growth), pairs are the "
        "bounded block sample. Reference parity: extension surface "
        "(SURVEY.md §2.C similarity rows).",
)
def sim_jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    gate = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("vec_id").cast("string"),
                            F.lit(_PAIR_SAMP_SALT),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(100),
        )
        < _PAIR_SAMP_PCT
    )
    q = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
    )
    s = emb.where(gate).select("vec_id", q.alias("q"))
    # deterministic ±1 sign for (dim d, output j)
    sign = lambda d, j: F.when(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(
                    d.cast("string"), F.lit(":"), j.cast("string"), F.lit(_JL_SALT)
                )
            ),
            1,
            1,
        )
        >= "8",
        F.lit(1),
    ).otherwise(F.lit(-1))
    flat = s.select(
        "vec_id", F.posexplode("q").alias("d", "qd")
    ).crossJoin(
        F.broadcast(
            spark.range(_JL_K).select(F.col("id").cast("int").alias("j"))
        )
    )
    proj = (
        flat.groupBy("vec_id", "j")
        .agg(
            F.sum(sign(F.col("d"), F.col("j")) * F.col("qd"))
            .cast("long")
            .alias("pv")
        )
        .groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("j", "pv"))).alias("jp"))
        .select("vec_id", F.col("jp.pv").alias("p"))
    )
    a = s.select(F.col("vec_id").alias("v1"), F.col("q").alias("q1")).join(
        proj.select(F.col("vec_id").alias("v1"), F.col("p").alias("p1")), "v1"
    )
    b = s.select(F.col("vec_id").alias("v2"), F.col("q").alias("q2")).join(
        proj.select(F.col("vec_id").alias("v2"), F.col("p").alias("p2")), "v2"
    )
    d2 = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda u, v: (u - v) * (u - v)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = (
        a.join(b, F.col("v1") < F.col("v2"))
        .select(
            d2(F.col("q1"), F.col("q2")).alias("d2_orig"),
            d2(F.col("p1"), F.col("p2")).alias("d2_proj"),
        )
        .where(F.col("d2_orig") > 0)
    )
    r = pairs.select(
        F.expr(
            f"CAST(CAST(d2_proj AS DECIMAL(38,0)) * 1000000 "
            f"DIV (CAST({_JL_K} AS DECIMAL(38,0)) * d2_orig) AS BIGINT)"
        ).alias("ratio_ppm")
    )
    return r.groupBy(
        F.expr("CAST(ratio_ppm DIV 200000 AS BIGINT)").alias("ratio_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("ratio_ppm").cast("long").alias("min_ratio_ppm"),
        F.max("ratio_ppm").cast("long").alias("max_ratio_ppm"),
    )


@register(
    "sim_product_quantization_audit",
    oracle="""
    WITH flat AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) + 2000000 AS x,
               (generate_subscripts(embedding, 1) - 1) // 8 AS sub
        FROM embeddings
    ),
    seed AS (
        SELECT sub, dim, vec_id AS c, x AS cx
        FROM flat WHERE vec_id < 16
    ),
    d1 AS (
        SELECT f.vec_id, f.sub, s.c,
               SUM((f.x - s.cx) * (f.x - s.cx)) AS dist
        FROM flat f JOIN seed s ON s.sub = f.sub AND s.dim = f.dim
        GROUP BY f.vec_id, f.sub, s.c
    ),
    a1 AS (
        SELECT vec_id, sub, MIN(dist * 16 + c) AS pick
        FROM d1 GROUP BY vec_id, sub
    ),
    a1d AS (
        SELECT vec_id, sub, pick // 16 AS dist, pick % 16 AS c FROM a1
    ),
    cb2 AS (
        SELECT f.sub, a.c, f.dim,
               CAST(SUM(CAST(f.x AS HUGEINT)) // COUNT(*) AS BIGINT) AS cx
        FROM flat f JOIN a1d a ON a.vec_id = f.vec_id AND a.sub = f.sub
        GROUP BY f.sub, a.c, f.dim
    ),
    d2 AS (
        SELECT f.vec_id, f.sub, s.c,
               SUM((f.x - s.cx) * (f.x - s.cx)) AS dist
        FROM flat f JOIN cb2 s ON s.sub = f.sub AND s.dim = f.dim
        GROUP BY f.vec_id, f.sub, s.c
    ),
    a2 AS (
        SELECT vec_id, sub, MIN(dist * 16 + c) AS pick
        FROM d2 GROUP BY vec_id, sub
    ),
    a2d AS (
        SELECT vec_id, sub, pick // 16 AS dist, pick % 16 AS c FROM a2
    ),
    r2stats AS (
        SELECT sub,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(COUNT(DISTINCT c) AS BIGINT) AS used_codes_r2,
               CAST(SUM(CAST(dist AS HUGEINT))
                    // COUNT(*) AS BIGINT) AS avg_dist_r2,
               CAST(MAX(bucket_n) AS BIGINT) AS max_bucket_r2
        FROM (
            SELECT vec_id, sub, dist, c,
                   COUNT(*) OVER (PARTITION BY sub, c) AS bucket_n
            FROM a2d
        ) GROUP BY sub
    ),
    r1stats AS (
        SELECT sub,
               CAST(SUM(CAST(dist AS HUGEINT))
                    // COUNT(*) AS BIGINT) AS avg_dist_r1
        FROM a1d GROUP BY sub
    )
    SELECT CAST(r2.sub AS BIGINT) AS sub, r2.n_points, r2.used_codes_r2,
           r2.max_bucket_r2, r1.avg_dist_r1, r2.avg_dist_r2,
           r2.avg_dist_r2 <= r1.avg_dist_r1 AS lloyd_improved
    FROM r2stats r2 JOIN r1stats r1 ON r1.sub = r2.sub
    """,
    doc="Product-quantization audit with ONE real Lloyd iteration, all in "
        "exact fixed-point integers: 64-dim embeddings split into 8 "
        "subspaces x 8 dims, seeded with the 16 lowest-vec_id subvectors, "
        "assigned (exact squared L2 in offset 1e-6 fixed-point — the "
        "+2e6-offset trick keeps floor-div == trunc-div cross-engine), "
        "centroids re-estimated as floored integer means, re-assigned, "
        "and per-subspace distortion/codebook-balance reported before vs "
        "after (lloyd_improved is the in-plan monotonicity certificate). "
        "This is the missing ANN-compression audit next to int8-SQ8 / "
        "Matryoshka / JL: PQ is THE billion-scale vector-index codec "
        "(IVF-PQ), and this measures exactly what you tune — per-subspace "
        "distortion and code utilization. Scale: assignments are "
        "equi-joins of the exploded (vec,sub,dim) stream against a "
        "16x64-entry codebook (maybe_broadcast — never corpus-keyed); "
        "argmin is the composite min(dist*16+c) scalar (no window); "
        "distortion sums ride HUGEINT/DECIMAL(38,0). Reference parity: "
        "extension surface (SURVEY.md §2.B similarity rows).",
)
def sim_product_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.broadcast import maybe_broadcast

    e = load_table(spark, sf_dir, "embeddings")
    fixed = lambda arr: F.transform(  # noqa: E731
        arr,
        lambda v: F.round(v.cast("double") * 1000000).cast("long")
        + 2000000,
    )
    # 8 rows per vector, each carrying its 8-dim subvector ARRAY — the
    # distance kernel then runs array-locally (zip_with + aggregate) so
    # the assignment passes never explode to (vec, sub, dim, code)
    # granularity (the first formulation did: 1024 rows/vec and a
    # 5M-row re-aggregation per pass; this one is 128 rows/vec with the
    # per-code distance computed inside the row — bench_one 4.45 s ->
    # 2.59 s at sf0.1).
    flat = e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("long").alias("sub"),
                        fixed(F.slice("embedding", s * 8 + 1, 8)).alias(
                            "xs"
                        ),
                    )
                    for s in range(8)
                ]
            )
        ).alias("fs"),
    ).select("vec_id", "fs.sub", "fs.xs").localCheckpoint(eager=True)
    seed = flat.where(F.col("vec_id") < 16).select(
        "sub", F.col("vec_id").alias("c"), F.col("xs").alias("cs")
    )
    d2expr = F.aggregate(
        F.zip_with(
            F.col("xs"), F.col("cs"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    a1 = (
        flat.join(maybe_broadcast(seed), "sub")
        .select("vec_id", "sub", d2expr.alias("dist"), "c")
        .groupBy("vec_id", "sub")
        .agg(F.min(F.col("dist") * 16 + F.col("c")).alias("pick"))
        .select(
            "vec_id",
            "sub",
            F.expr("pick DIV 16").alias("dist"),
            (F.col("pick") % 16).alias("c"),
        )
        .localCheckpoint(eager=True)  # feeds cb2 AND r1 stats
    )
    # centroid means need per-dimension sums -> one explode pass of the
    # member subvectors (the only dim-granular stage left)
    cb2 = (
        flat.join(a1.select("vec_id", "sub", "c"), ["vec_id", "sub"])
        .select("sub", "c", F.posexplode("xs").alias("pos", "x"))
        .groupBy("sub", "c", "pos")
        .agg(
            F.expr(
                "CAST(SUM(CAST(x AS DECIMAL(38,0))) DIV COUNT(*) AS BIGINT)"
            ).alias("cx")
        )
        .groupBy("sub", "c")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("pos"), F.col("cx")))
                ),
                lambda s: s.getField("cx"),
            ).alias("cs")
        )
    )
    a2 = (
        flat.join(maybe_broadcast(cb2), "sub")
        .select("vec_id", "sub", d2expr.alias("dist"), "c")
        .groupBy("vec_id", "sub")
        .agg(F.min(F.col("dist") * 16 + F.col("c")).alias("pick"))
        .select(
            "sub",
            F.expr("pick DIV 16").alias("dist"),
            (F.col("pick") % 16).alias("c"),
        )
    )
    bucket = Window.partitionBy("sub", "c")
    r2 = (
        a2.withColumn("bucket_n", F.count(F.lit(1)).over(bucket))
        .groupBy("sub")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.countDistinct("c").cast("long").alias("used_codes_r2"),
            F.expr(
                "CAST(SUM(CAST(dist AS DECIMAL(38,0))) DIV COUNT(*) "
                "AS BIGINT)"
            ).alias("avg_dist_r2"),
            F.max("bucket_n").cast("long").alias("max_bucket_r2"),
        )
    )
    r1 = a1.groupBy("sub").agg(
        F.expr(
            "CAST(SUM(CAST(dist AS DECIMAL(38,0))) DIV COUNT(*) AS BIGINT)"
        ).alias("avg_dist_r1")
    )
    return (
        r2.join(r1, "sub")
        .select(
            F.col("sub").cast("long").alias("sub"),
            "n_points",
            "used_codes_r2",
            "max_bucket_r2",
            "avg_dist_r1",
            "avg_dist_r2",
            (F.col("avg_dist_r2") <= F.col("avg_dist_r1")).alias(
                "lloyd_improved"
            ),
        )
    )


# --------------------------------------------------------------------------
# MinHash estimator-error calibration — round-9 late addition


def _minhash_estimate_error_sql() -> str:
    coeffs = "[" + ", ".join(f"[{a}, {b}]" for a, b in minhash_coeffs(32, 7)) + "]"
    return f"""
    WITH hs AS (
        SELECT doc_id,
               list_transform({_SHINGLES},
                              s -> ('0x' || substring(md5(s), 1, 8))::BIGINT) AS h
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               list_transform({coeffs}, c ->
                   list_min(list_transform(h, x -> (c[1] * x + c[2]) % 4294967311))) AS sig
        FROM hs
    ),
    banded AS (
        SELECT doc_id, sig, b.b AS band,
               array_to_string(list_slice(sig, b.b * 8 + 1, b.b * 8 + 8), ',') AS bucket
        FROM sig, (SELECT unnest(range(0, 4)) AS b) b
    ),
    -- mirrors minhash_candidates' max_bucket=500 skew cap
    -- (operators/dedup.py:166): over-full buckets carry no signal
    small AS (
        SELECT band, bucket FROM banded
        GROUP BY band, bucket HAVING COUNT(*) <= 500
    ),
    bandedc AS (
        SELECT b.* FROM banded b JOIN small USING (band, bucket)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc1, c.doc_id AS doc2
        FROM bandedc a JOIN bandedc c USING (band, bucket)
        WHERE a.doc_id < c.doc_id
    ),
    agree AS (
        SELECT cand.doc1, cand.doc2,
               CAST(list_sum(list_transform(range(1, 33),
                   i -> CASE WHEN s1.sig[i] = s2.sig[i] THEN 1 ELSE 0 END))
                   AS BIGINT) AS n_agree
        FROM cand
        JOIN sig s1 ON s1.doc_id = cand.doc1
        JOIN sig s2 ON s2.doc_id = cand.doc2
    ),
    sh AS (
        SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    ),
    shc AS (
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1
    ),
    pairs AS (
        SELECT g.n_agree,
               COALESCE(i.n_common, 0) AS ic,
               s1.n + s2.n - COALESCE(i.n_common, 0) AS un
        FROM agree g
        LEFT JOIN inter i ON i.doc1 = g.doc1 AND i.doc2 = g.doc2
        JOIN sizes s1 ON s1.doc_id = g.doc1
        JOIN sizes s2 ON s2.doc_id = g.doc2
        WHERE s1.n + s2.n - COALESCE(i.n_common, 0) > 0
    )
    SELECT n_agree,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(ic * 1000000 // un) AS BIGINT) AS sum_exact_ppm,
           CAST(SUM(abs(n_agree * un - 32 * ic) * 1000000 // (32 * un))
                AS BIGINT) AS sum_abs_err_ppm,
           CAST(SUM(abs(n_agree * un - 32 * ic) * 1000000 // (32 * un))
                // COUNT(*) AS BIGINT) AS mean_abs_err_ppm
    FROM pairs GROUP BY n_agree
    """


@register(
    "dedup_minhash_estimate_error",
    oracle=_minhash_estimate_error_sql(),
    doc="MinHash estimator-error calibration curve: for every LSH "
        "candidate pair, compare the 32-permutation signature agreement "
        "(the estimate a production dedup THRESHOLDS on) against the "
        "exact shingle Jaccard, grouped by agreement count — the "
        "per-operating-point error readout that tells you what "
        "'est >= 0.4' actually means in exact-Jaccard terms on YOUR "
        "corpus (the estimator's binomial spread is theory; this is the "
        "measured calibration). Per-pair error |agree/32 - inter/union| "
        "is evaluated by integer cross-multiplication "
        "(|agree*union - 32*inter| * 1e6 // (32*union)) — no doubles "
        "anywhere; per-bucket sums of those exact ppm terms are "
        "order-free. Pipeline: the portable MinHash tier (same md5 "
        "hashes, coeffs, and banding as dedup_minhash_lsh, so the "
        "oracle replays bit-for-bit), exact truth via the df-capped "
        "shingle self-join (cap mirrored in the oracle per the round-8 "
        "lesson), candidates LEFT-joined to truth so zero-overlap "
        "false positives are measured too (union from the full set "
        "sizes; empty-shingle pairs excluded by the un > 0 gate on "
        "both engines). All joins are banded/bucketed — no all-pairs "
        "step at any scale. Reference parity: extension surface "
        "(SURVEY.md §2.B dedup rows).",
)
def dedup_minhash_estimate_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # r12 (second pass — same restructure as dedup_bbit_minhash_error,
    # guide §1.2/§5): ONE tokenization for the whole audit. The per-doc
    # shingle array is checkpointed once (docs spread by id first — the
    # md5 permutations and shingling are CPU-dense per-row pipelines that
    # otherwise run at a one-split scan's parallelism); signatures derive
    # array-locally from that leaf and are checkpointed so the fused band
    # join's two sides read 5k rows x 32 longs instead of re-running
    # md5 + 32 permutations per side; the truth side explodes the same
    # leaf, takes set sizes map-side (word_shingles array_distincts per
    # row, so size(__ss) == the occurrence count), and checkpoints the
    # df-capped frame (window once, not per self-join side).
    docs = spread_small_input(load_table(spark, sf_dir, "documents"), "doc_id")
    sets = docs.select(
        F.col("doc_id").alias("doc"),
        word_shingles(tokens(F.col("text")), 3).alias("__ss"),
    ).localCheckpoint(eager=True)
    # r13 examined, measured, kept as-is: dropping this checkpoint (the
    # band-sensitivity win) measured NEUTRAL here across two fresh-JVM
    # A/B pairs (3.70/3.47 with vs 3.12/3.50 without, probes 0.26/0.25
    # vs 0.22/0.25) — unlike band_sensitivity, the agreement join ships
    # the 32-long sig through the banded exchange either way, so the
    # only savable cost was the one materialization job, and runtime
    # exchange reuse is not guaranteed in the un-checkpointed plan
    # (both self-join sides re-derive the window subtree pre-AQE). The
    # checkpointed form keeps the sig compute provably once at any
    # scale.
    sigs = minhash_signature_from_shingles(
        sets, "doc", "__ss", portable=True
    ).localCheckpoint(eager=True)
    agree = minhash_candidate_agreement(
        sigs,
        lambda s1, s2: F.size(
            F.filter(
                F.zip_with(s1, s2, lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        ).cast("long"),
    ).withColumnRenamed("__v", "n_agree")
    sh = sets.select("doc", F.explode("__ss").alias("shingle"))
    sizes = sets.select("doc", F.size("__ss").cast("long").alias("n"))
    capped = (
        sh.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .filter(F.col("__df") <= 1000)
        .drop("__df")
        .localCheckpoint(eager=True)
    )
    sa = capped.select(F.col("doc").alias("doc1"), "shingle")
    sb = capped.select(F.col("doc").alias("doc2"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).cast("long").alias("ic"))
    )
    pairs = (
        agree.join(inter, ["doc1", "doc2"], "left")
        .join(
            sizes.withColumnsRenamed({"doc": "doc1", "n": "n1"}), "doc1"
        )
        .join(
            sizes.withColumnsRenamed({"doc": "doc2", "n": "n2"}), "doc2"
        )
        .select(
            "n_agree",
            F.coalesce(F.col("ic"), F.lit(0)).alias("ic"),
            (
                F.col("n1") + F.col("n2") - F.coalesce(F.col("ic"), F.lit(0))
            ).alias("un"),
        )
        .where(F.col("un") > 0)
    )
    return pairs.groupBy("n_agree").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.expr("ic * 1000000 DIV un")).cast("long").alias(
            "sum_exact_ppm"
        ),
        F.sum(
            F.expr("abs(n_agree * un - 32 * ic) * 1000000 DIV (32 * un)")
        )
        .cast("long")
        .alias("sum_abs_err_ppm"),
        F.expr(
            "CAST(SUM(abs(n_agree * un - 32 * ic) * 1000000 DIV (32 * un)) "
            "DIV COUNT(*) AS BIGINT)"
        ).alias("mean_abs_err_ppm"),
    )


@register(
    "ml_krippendorff_alpha_binary",
    oracle="""
    WITH r AS (
        SELECT vec_id,
               CASE WHEN CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000.0)
                          AS BIGINT) > 0 THEN 1 ELSE 0 END
             + CASE WHEN CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000.0)
                          AS BIGINT) > 0 THEN 1 ELSE 0 END
             + CASE WHEN CAST(round(CAST(embedding[3] AS DOUBLE) * 1000000.0)
                          AS BIGINT) > 0 THEN 1 ELSE 0 END
             + CASE WHEN CAST(round(CAST(embedding[4] AS DOUBLE) * 1000000.0)
                          AS BIGINT) > 0 THEN 1 ELSE 0 END AS c1
        FROM embeddings
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM((4 - c1)) AS BIGINT) AS n0,
               CAST(SUM(c1 * (4 - c1)) AS BIGINT) AS s_pairs
        FROM r
    )
    SELECT n_items, CAST(4 AS BIGINT) AS k_raters, n1, n0, s_pairs,
           CAST(4 * n_items AS BIGINT) AS n_c,
           CAST(1000000
                - CAST(4 * n_items - 1 AS HUGEINT) * s_pairs * 1000000
                  // (3 * CAST(n1 AS HUGEINT) * n0) AS BIGINT)
               AS alpha_ppm
    FROM agg
    """,
    doc="Krippendorff's alpha for the four-rater binary panel (nominal "
        "data, complete ratings): the general-purpose inter-annotator "
        "reliability coefficient (Krippendorff 1970, public) next to "
        "Fleiss' kappa (different chance model: coincidence pairs "
        "WITHIN items vs marginal products) and Cochran's Q (marginal "
        "homogeneity, not reliability). With m=4 raters per item the "
        "observed disagreement collapses to S = sum_i c1_i*(m-c1_i) "
        "and alpha = 1 - (n_c - 1)*S / (3*n1*n0) EXACTLY — one HUGEINT "
        "cross-multiplication, one ppm floor division; no coincidence "
        "matrix materialized. Raters are the same embedding-dim sign "
        "classifiers as ml_cochran_q_test, so the two tests read off "
        "one 1-row aggregate shape: ONE embeddings scan, no joins. "
        "Reference parity: extension surface (SURVEY.md §2.C ML rows).",
)
def ml_krippendorff_alpha_binary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def rater(i: int):
        return (
            F.round(
                F.element_at("embedding", i).cast("double") * 1_000_000.0
            ).cast("long")
            > 0
        ).cast("long")

    c1 = rater(1) + rater(2) + rater(3) + rater(4)
    agg = emb.select(c1.alias("c1")).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum(4 - F.col("c1")).cast("long").alias("n0"),
        F.sum(F.col("c1") * (4 - F.col("c1"))).cast("long").alias("s_pairs"),
    )
    return agg.select(
        "n_items",
        F.lit(4).cast("long").alias("k_raters"),
        "n1",
        "n0",
        "s_pairs",
        F.expr("CAST(4 * n_items AS BIGINT)").alias("n_c"),
        F.expr(
            "CAST(1000000 - CAST(4 * n_items - 1 AS DECIMAL(38,0)) "
            "* s_pairs * 1000000 DIV (3 * CAST(n1 AS DECIMAL(38,0)) * n0) "
            "AS BIGINT)"
        ).alias("alpha_ppm"),
    )


@register(
    "multimodal_payload_byte_entropy",
    oracle="""
    WITH media AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               substring(hex(encode(text)), 1, 128) AS h
        FROM documents
    ),
    bytes_tbl AS (
        SELECT kind, substring(h, 2 * i - 1, 2) AS b
        FROM media
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) pos
        WHERE 2 * i - 1 <= length(h)
    ),
    cnt AS (
        SELECT kind, b, CAST(COUNT(*) AS BIGINT) AS c
        FROM bytes_tbl GROUP BY kind, b
    ),
    tot AS (
        SELECT kind, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(MAX(c) AS BIGINT) AS top_c
        FROM cnt GROUP BY kind
    ),
    ent AS (
        SELECT cnt.kind,
               CAST(SUM(CAST(round(c * ln(CAST(t.n AS DOUBLE) / c)
                                   * 1000000) AS BIGINT)) AS BIGINT) AS s
        FROM cnt JOIN tot t ON t.kind = cnt.kind
        GROUP BY cnt.kind
    )
    SELECT t.kind, t.n AS n_bytes, t.n_distinct AS distinct_bytes,
           round(CAST(t.top_c AS DOUBLE) / t.n, 6) AS top_byte_share,
           round(CAST(e.s AS DOUBLE) / t.n / 1000000, 6) AS byte_entropy_nats
    FROM tot t JOIN ent e ON e.kind = t.kind
    ORDER BY t.kind
    """,
    doc="Byte-level entropy QC of opaque media payloads (first 64 bytes "
        "per item, per kind): Shannon entropy and top-byte share of the "
        "byte-value distribution — the codec-free health check that "
        "separates plausibly-encoded payloads (high entropy for "
        "compressed media, mid for text) from constant/zero-filled/"
        "truncated corruption (entropy ~0, one byte dominating), which "
        "is exactly the triage a 100 TB media lake needs BEFORE paying "
        "for real decode; complements multimodal_kind_stats (sizes) and "
        "the format-magic conformance audit. The byte extraction is a "
        "pure JVM expression (binary substring -> hex -> fixed 64-way "
        "position explode — no Python in the path); byte counts are "
        "exact, entropy terms follow the quantize-c*ln(n/c)-to-1e-6 "
        "convention over <=256 groups per kind. Plan: one bounded "
        "explode scan (64x row fanout of a 2-column projection), one "
        "(kind, byte) aggregate, two bounded rollups. Reference parity: "
        "multimodal extension surface (SURVEY.md §2.B multimodal rows; "
        "payload bytes generalize entity_bytes, WalEntity.java:38-39).",
)
def multimodal_payload_byte_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(d, "doc_id", "text", "source").select(
        "kind",
        F.expr("substring(hex(payload), 1, 128)").alias("h"),
    )
    bytes_tbl = media.select(
        "kind",
        F.explode(F.sequence(F.lit(1), F.lit(64))).alias("i"),
        "h",
    ).where(F.expr("2 * i - 1 <= length(h)")).select(
        "kind", F.expr("substring(h, 2 * i - 1, 2)").alias("b")
    )
    cnt = bytes_tbl.groupBy("kind", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = cnt.groupBy("kind").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("top_c"),
    )
    ent = (
        cnt.join(tot.select("kind", "n"), "kind")
        .groupBy("kind")
        .agg(
            F.sum(
                F.round(
                    F.col("c")
                    * F.log(F.col("n").cast("double") / F.col("c"))
                    * F.lit(1_000_000)
                ).cast("long")
            )
            .cast("long")
            .alias("s")
        )
    )
    return (
        tot.join(ent, "kind")
        .select(
            "kind",
            F.col("n").alias("n_bytes"),
            F.col("n_distinct").alias("distinct_bytes"),
            F.round(F.col("top_c").cast("double") / F.col("n"), 6).alias(
                "top_byte_share"
            ),
            F.round(
                F.col("s").cast("double") / F.col("n") / F.lit(1_000_000), 6
            ).alias("byte_entropy_nats"),
        )
        .orderBy("kind")
    )


@register(
    "pipeline_snapshot_novelty_rate",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    ),
    shc AS (
        -- mirrors shingle_pairs_jaccard's max_df=1000 stop-shingle cap
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    p AS (
        SELECT doc1, doc2 FROM inter
        JOIN sizes s1 ON s1.doc_id = doc1
        JOIN sizes s2 ON s2.doc_id = doc2
        WHERE n_common / (s1.n + s2.n - n_common) >= 0.5
    ),
    matched AS (
        SELECT doc1 AS doc_id FROM p WHERE doc1 % 2 = 1 AND doc2 % 2 = 0
        UNION
        SELECT doc2 AS doc_id FROM p WHERE doc2 % 2 = 1 AND doc1 % 2 = 0
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_incoming,
           CAST(COUNT(m.doc_id) AS BIGINT) AS n_near_dup_of_base,
           round(1.0 - CAST(COUNT(m.doc_id) AS DOUBLE) / COUNT(*), 6)
               AS novelty_rate
    FROM documents d LEFT JOIN matched m ON m.doc_id = d.doc_id
    WHERE d.doc_id % 2 = 1
    GROUP BY d.source
    """,
    doc="Incremental-ingestion novelty audit: treating even doc_ids as "
        "the BASE corpus snapshot and odd doc_ids as the INCOMING batch, "
        "the per-source fraction of incoming documents with NO near-"
        "duplicate (df-capped exact 3-shingle Jaccard >= 0.5 — the same "
        "certified pair machinery as dedup_ngram_jaccard) in the base — "
        "the number a continuously-ingesting corpus pipeline gates on: "
        "a source whose novelty collapses is re-crawling what you "
        "already hold and should be throttled before it wastes dedup "
        "and training budget; the BATCH analog of the streaming MinHash "
        "index's new-vs-known split (streaming/dedup_index.py). "
        "Candidate generation is the shared df-capped shingle equi-join "
        "(never all-pairs); cross-snapshot pairs filter by id parity; "
        "matched incoming ids collapse through a UNION-distinct far "
        "smaller than the corpus; one left join tags the incoming "
        "partition. Reference parity: extension surface (SURVEY.md "
        "§2.C curation rows).",
)
def pipeline_snapshot_novelty_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from wal_consumer_spark.operators.dedup import shingle_pairs_jaccard

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_pairs_jaccard(docs, "doc_id", "text").filter(
        F.col("jaccard") >= 0.5
    )
    matched = (
        pairs.where((F.col("doc1") % 2 == 1) & (F.col("doc2") % 2 == 0))
        .select(F.col("doc1").alias("doc_id"))
        .unionByName(
            pairs.where((F.col("doc2") % 2 == 1) & (F.col("doc1") % 2 == 0))
            .select(F.col("doc2").alias("doc_id"))
        )
        .distinct()
    )
    incoming = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "source")
    return (
        incoming.join(
            matched.withColumn("hit", F.lit(1)), "doc_id", "left"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_incoming"),
            F.count("hit").cast("long").alias("n_near_dup_of_base"),
            F.round(
                F.lit(1.0) - F.count("hit").cast("double") / F.count(F.lit(1)),
                6,
            ).alias("novelty_rate"),
        )
    )


#: Shared detected-format CASE over the payload's leading bytes (first 16
#: hex chars = 8 bytes) — textually identical in both engines so the
#: classification is trivially engine-equal. Uppercase-hex string range
#: compare is order-correct ('0'<'9'<'A'<'F' in ASCII), so the printable-
#: ASCII fallback needs no byte arithmetic.
_MAGIC_CASE = """
CASE WHEN substring(h, 1, 4) = 'FFD8' THEN 'jpeg'
     WHEN substring(h, 1, 4) = '8950' THEN 'png'
     WHEN substring(h, 1, 4) = '4749' THEN 'gif'
     WHEN substring(h, 1, 4) IN ('4949', '4D4D') THEN 'tiff'
     WHEN substring(h, 1, 6) = '494433' THEN 'mp3'
     WHEN substring(h, 1, 8) = '52494646' THEN 'riff'
     WHEN substring(h, 1, 8) = '4F676753' THEN 'ogg'
     WHEN substring(h, 1, 8) = '1A45DFA3' THEN 'matroska'
     WHEN substring(h, 9, 8) = '66747970' THEN 'mp4'
     WHEN substring(h, 1, 2) >= '20' AND substring(h, 1, 2) <= '7E'
          THEN 'ascii-text'
     ELSE 'other' END
"""

_CONFORMANT_CASE = """
CASE WHEN kind = 'image'
          THEN detected IN ('jpeg', 'png', 'gif', 'tiff')
     WHEN kind = 'audio' THEN detected IN ('mp3', 'riff', 'ogg')
     ELSE detected IN ('mp4', 'matroska', 'riff') END
"""


@register(
    "multimodal_magic_number_audit",
    oracle=f"""
    WITH media AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               substring(hex(encode(text)), 1, 16) AS h
        FROM documents
    ),
    det AS (
        SELECT kind, {_MAGIC_CASE} AS detected FROM media
    )
    SELECT kind, detected,
           CAST({_CONFORMANT_CASE} AS BOOLEAN) AS conformant,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM det GROUP BY 1, 2, 3 ORDER BY 1, 2
    """,
    doc="Magic-number conformance audit of opaque media payloads: the "
        "declared kind (metadata) is cross-checked against the container "
        "format DETECTED from the payload's leading bytes (JPEG FFD8, "
        "PNG 8950, GIF 'GI', TIFF II/MM, ID3, RIFF, OggS, Matroska "
        "1A45DFA3, MP4 'ftyp' at offset 4, printable-ASCII fallback) — "
        "the cheapest possible corruption/mislabeling triage on a "
        "100 TB media lake, run BEFORE any decode spend, and the "
        "binary-payload analog of dq_format_conformance_audit. On this "
        "repo's deterministic fake payloads (utf-8 text bytes — "
        "functions/multimodal.py:50-61) every row detects as "
        "ascii-text/other and conformance is honestly zero; the "
        "CLASSIFIER (8-byte prefix extraction + shared CASE text) is "
        "the real, engine-identical artifact. At ingest scale the 8-byte "
        "prefix would be materialized as its own column so the audit "
        "never touches full payload bytes; here substring(hex(payload)) "
        "is a pure JVM expression over the binary column — no Python, "
        "no decode. Plan: one projected scan, one (kind, detected) "
        "aggregate over a <= 3x11 category domain. Reference parity: "
        "multimodal extension surface (SURVEY.md §2.B multimodal rows; "
        "payload bytes generalize entity_bytes, WalEntity.java:38-39).",
)
def multimodal_magic_number_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(d, "doc_id", "text", "source").select(
        "kind", F.expr("substring(hex(payload), 1, 16)").alias("h")
    )
    det = media.select("kind", F.expr(_MAGIC_CASE).alias("detected"))
    return (
        det.groupBy(
            "kind", "detected", F.expr(_CONFORMANT_CASE).alias("conformant")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("kind", "detected")
    )


@register(
    "dedup_bbit_minhash_error",
    oracle=r"""
    WITH hs AS (
        SELECT doc_id,
               list_transform(list_distinct(list_transform(generate_series(0, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0)), i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i + 1, i + 3), ' '))),
                              s -> ('0x' || substring(md5(s), 1, 8))::BIGINT) AS h
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               list_transform([[695425565, 647892279], [847877000, 207388624], [155555738, 404285457], [785310973, 249103477], [1953574603, 922121676], [80521325, 369140570], [931247022, 1796035739], [150013384, 1033639716], [194804717, 1823296038], [126938844, 531725347], [2034632751, 958804057], [1354258845, 265695473], [1239319144, 1703729684], [106492239, 949539216], [100035545, 571981485], [621931212, 1800188482], [309785427, 505913792], [1226027821, 1324919352], [1203143341, 776213899], [221310450, 806899909], [799717634, 418461138], [1176272277, 269676599], [1211971682, 255985076], [1329312985, 884585951], [1066042003, 1836494974], [1669086093, 1349251823], [999872393, 1946412080], [776492205, 1287489453], [533492028, 772092314], [1501079115, 1048386555], [175782304, 1289560149], [1127850897, 2126508550]], c ->
                   list_min(list_transform(h, x -> (c[1] * x + c[2]) % 4294967311))) AS sig
        FROM hs
    ),
    banded AS (
        SELECT doc_id, sig, b.b AS band,
               array_to_string(list_slice(sig, b.b * 8 + 1, b.b * 8 + 8), ',') AS bucket
        FROM sig, (SELECT unnest(range(0, 4)) AS b) b
    ),
    small AS (
        SELECT band, bucket FROM banded
        GROUP BY band, bucket HAVING COUNT(*) <= 500
    ),
    bandedc AS (
        SELECT b.* FROM banded b JOIN small USING (band, bucket)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc1, c.doc_id AS doc2
        FROM bandedc a JOIN bandedc c USING (band, bucket)
        WHERE a.doc_id < c.doc_id
    ),
    agree AS (
        SELECT cand.doc1, cand.doc2,
               CAST(list_sum(list_transform(range(1, 33),
                   i -> CASE WHEN s1.sig[i] % 2 = s2.sig[i] % 2
                        THEN 1 ELSE 0 END)) AS BIGINT) AS nb
        FROM cand
        JOIN sig s1 ON s1.doc_id = cand.doc1
        JOIN sig s2 ON s2.doc_id = cand.doc2
    ),
    sh AS (
        SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(generate_series(0, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0)), i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i + 1, i + 3), ' ')))) AS shingle FROM documents
    ),
    shc AS (
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1
    ),
    pairs AS (
        SELECT g.nb,
               COALESCE(i.n_common, 0) AS ic,
               s1.n + s2.n - COALESCE(i.n_common, 0) AS un
        FROM agree g
        LEFT JOIN inter i ON i.doc1 = g.doc1 AND i.doc2 = g.doc2
        JOIN sizes s1 ON s1.doc_id = g.doc1
        JOIN sizes s2 ON s2.doc_id = g.doc2
        WHERE s1.n + s2.n - COALESCE(i.n_common, 0) > 0
    )
    SELECT nb AS n_match_bits,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST((2 * nb - 32) * 1000000 // 32 AS BIGINT) AS est_ppm,
           CAST(SUM(ic * 1000000 // un) AS BIGINT) AS sum_exact_ppm,
           CAST(SUM(abs((2 * nb - 32) * un - 32 * ic) * 1000000
                    // (32 * un)) AS BIGINT) AS sum_abs_err_ppm,
           CAST(SUM(abs((2 * nb - 32) * un - 32 * ic) * 1000000
                    // (32 * un)) // COUNT(*) AS BIGINT) AS mean_abs_err_ppm
    FROM pairs GROUP BY nb ORDER BY nb
    """,
    doc="b-bit minhash (b=1) estimate-error audit: keep only the LOWEST "
        "BIT of each of the 32 minhash permutations — a 32x signature "
        "compression (Li & Konig 2010) whose matching-bit fraction m "
        "unbiases back to Jaccard via J = 2m - 1 — and measure, per "
        "matching-bit count, the absolute error of that estimator "
        "against EXACT shingle Jaccard on the same LSH candidate pairs "
        "that dedup_minhash_estimate_error audits for the full-width "
        "signature. The two audits side by side price the storage/"
        "accuracy trade of shipping 4-byte instead of 128-byte "
        "signatures at corpus scale. Agreement counts, intersections, "
        "and error numerators are ALL integer ((2nb-32)un - 32ic over "
        "32un, floor-divided at ppm scale), so both engines hash-match "
        "exactly; the same df<=1000 posting cap and 500-doc bucket cap "
        "bound pair volume linearly. Plan: signature build (linear), "
        "banded candidate join (capped), one shingle self-join (df-"
        "capped), one 33-domain aggregate. Reference parity: extension "
        "surface (SURVEY.md §2.B dedup rows).",
)
def dedup_bbit_minhash_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 restructure (guide §1.2, §2.4, §5): ONE tokenization for the
    # whole audit. The per-doc shingle ARRAY is built once (input spread
    # widens the one-split scan) and checkpointed; the signature pipeline
    # derives array-locally from that leaf and is itself checkpointed
    # (5k rows x 32 longs) so the fused band self-join's two sides read
    # a tiny LogicalRDD instead of re-running md5 + 32 permutations per
    # side; the truth side explodes the same leaf (was: a second
    # tokenize+explode), takes set sizes map-side via size(__ss) (was: a
    # full groupBy exchange over the shingle stream), and checkpoints the
    # df-capped frame so the self-join does not re-run the window per
    # side. Same values everywhere: word_shingles is per-row distinct, so
    # occurrence counts == set sizes.
    docs = spread_small_input(load_table(spark, sf_dir, "documents"), "doc_id")
    sets = docs.select(
        F.col("doc_id").alias("doc"),
        word_shingles(tokens(F.col("text")), 3).alias("__ss"),
    ).localCheckpoint(eager=True)
    sigs = minhash_signature_from_shingles(
        sets, "doc", "__ss", portable=True
    ).localCheckpoint(eager=True)
    agree = minhash_candidate_agreement(
        sigs,
        lambda s1, s2: F.size(
            F.filter(
                F.zip_with(s1, s2, lambda x, y: (x % 2 == y % 2).cast("int")),
                lambda v: v == 1,
            )
        ).cast("long"),
    ).withColumnRenamed("__v", "nb")
    sh = sets.select("doc", F.explode("__ss").alias("shingle"))
    sizes = sets.select("doc", F.size("__ss").cast("long").alias("n"))
    capped = (
        sh.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .filter(F.col("__df") <= 1000)
        .drop("__df")
        .localCheckpoint(eager=True)
    )
    sa = capped.select(F.col("doc").alias("doc1"), "shingle")
    sb = capped.select(F.col("doc").alias("doc2"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).cast("long").alias("ic"))
    )
    pairs = (
        agree.join(inter, ["doc1", "doc2"], "left")
        .join(sizes.withColumnsRenamed({"doc": "doc1", "n": "n1"}), "doc1")
        .join(sizes.withColumnsRenamed({"doc": "doc2", "n": "n2"}), "doc2")
        .select(
            "nb",
            F.coalesce(F.col("ic"), F.lit(0)).alias("ic"),
            (
                F.col("n1") + F.col("n2") - F.coalesce(F.col("ic"), F.lit(0))
            ).alias("un"),
        )
        .where(F.col("un") > 0)
    )
    return (
        pairs.groupBy(F.col("nb").alias("n_match_bits"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.first(
                F.expr("(2 * nb - 32) * 1000000 DIV 32")
            )
            .cast("long")
            .alias("est_ppm"),
            F.sum(F.expr("ic * 1000000 DIV un")).cast("long").alias(
                "sum_exact_ppm"
            ),
            F.sum(
                F.expr(
                    "abs((2 * nb - 32) * un - 32 * ic) * 1000000"
                    " DIV (32 * un)"
                )
            )
            .cast("long")
            .alias("sum_abs_err_ppm"),
        )
        .withColumn(
            "mean_abs_err_ppm",
            F.expr("sum_abs_err_ppm DIV n_pairs").cast("long"),
        )
        .orderBy("n_match_bits")
    )


@register(
    "multimodal_duplicate_payload_refcount",
    oracle="""
    SELECT kind,
           CAST(SUM(cnt) AS BIGINT) AS n_payloads,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM((cnt - 1) * nbytes) AS BIGINT) AS dup_bytes_saved,
           CAST(SUM(cnt * nbytes) AS BIGINT) AS total_bytes,
           CAST(1000000 * SUM((cnt - 1) * nbytes) // SUM(cnt * nbytes)
                AS BIGINT) AS savings_ppm
    FROM (
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               -- DuckDB's md5 takes VARCHAR; the payload IS the utf-8
               -- encoding of text, so md5(text) == Spark's md5(payload)
               md5(text) AS digest,
               CAST(octet_length(encode(text)) AS BIGINT) AS nbytes,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM documents
        GROUP BY 1, 2, 3
    ) g
    GROUP BY kind ORDER BY kind
    """,
    doc="Content-addressed payload dedup audit: digest every opaque media "
        "payload (md5 over the raw bytes — the BLOB-store refcount key), "
        "count references per (kind, digest), and price the storage a "
        "dedup layer saves per kind: dup_bytes_saved = sum((refs-1) * "
        "payload_bytes), plus the savings ratio at ppm — the first "
        "number a multimodal ingest pipeline needs before choosing "
        "content-addressed storage, complementing multimodal_frame_dedup "
        "(within-video frames) with corpus-level cross-document payload "
        "identity. The digest group-by is the same map-side hash "
        "aggregate as exact text dedup (dedup_exact_hash) lifted to "
        "binary payloads; byte sizes and refcounts are exact integers "
        "end to end (ppm ratio floor-divided). Plan: one hash "
        "aggregate keyed by (kind, digest) + one kind-domain rollup — "
        "O(scan), shuffle bounded by distinct payloads. Reference "
        "parity: the payload/entity_bytes envelope mirrors the "
        "reference's opaque-entity design (WalEntityConsumerCallback."
        "java:10-17); the audit itself is extension surface (SURVEY.md "
        "§2.B multimodal rows).",
)
def multimodal_duplicate_payload_refcount(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(docs, "doc_id", "text", "source")
    g = media.groupBy(
        "kind",
        F.md5(F.col("payload")).alias("digest"),
        F.length(F.col("payload")).cast("long").alias("nbytes"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return (
        g.groupBy("kind")
        .agg(
            F.sum("cnt").cast("long").alias("n_payloads"),
            F.count(F.lit(1)).cast("long").alias("n_unique"),
            F.sum((F.col("cnt") - 1) * F.col("nbytes"))
            .cast("long")
            .alias("dup_bytes_saved"),
            F.sum(F.col("cnt") * F.col("nbytes"))
            .cast("long")
            .alias("total_bytes"),
        )
        .withColumn(
            "savings_ppm",
            F.expr("1000000 * dup_bytes_saved DIV total_bytes").cast("long"),
        )
        .orderBy("kind")
    )
