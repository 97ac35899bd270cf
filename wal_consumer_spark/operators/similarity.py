"""Similarity search over embedding columns (SURVEY.md §2.B: "top-k
similarity search ⚙"): exact brute-force cosine top-k as the verifiable
baseline, and a random-hyperplane LSH bucketed variant as the 100 TB path.

Dot products stay JVM-side via zip_with/aggregate (no Python UDF); the LSH
variant turns the O(N*Q) cross join into a bucket equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from wal_consumer_spark.functions.text import let


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k: broadcast the query set against the corpus, rank per
    query. The corpus side streams — one pass, no shuffle of the corpus."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine_sim", "rank")
    )


#: fixed-point scale for vector quantization in the LSH bucketing: one
#: multiply + round per element is bit-identical in any engine, and the
#: projections thereafter are pure integer arithmetic (no float-summation
#: order hazards across engines / SIMD widths / executor counts).
_QUANT_SCALE = 1_000_000


def lsh_planes(dim: int, nbits: int, seed: int = 42) -> list[list[int]]:
    """Deterministic pseudo-random INTEGER hyperplanes (splitmix64-style LCG,
    no numpy RNG dependency): coefficients in [-1000, 1000]. Integer planes
    over fixed-point-quantized vectors make the sign-random-projection
    bucket exactly reproducible across engines — a DuckDB oracle replays it
    bit-for-bit (plans/llm.py), and at cluster scale the bucket of a vector
    is independent of partitioning, hardware, and reduction order.
    Overflow-safe: |round(v*1e6)| <= ~1e8 for |v|<=100, times |c|<=1000,
    times dim 64 -> < 2^53 << 2^63."""
    planes = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(nbits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            row.append(int((state >> 11) % 2001) - 1000)
        planes.append(row)
    return planes


def quantize_vec(vec: Column) -> Column:
    """Fixed-point quantization: round(v_i * 1e6) as long, element-wise.
    Exactly one float multiply + half-away-from-zero round per element —
    both bit-identical between Spark and DuckDB."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * F.lit(float(_QUANT_SCALE))).cast("long")
    )


def quantize_vec32(vec: Column) -> Column:
    """quantize_vec with int32 transport: |round(v*1e6)| <= ~1e8 < 2^31 for
    |v| <= 100, so the narrower lanes are lossless — and the Arrow batches
    the numpy kernels consume are half the bytes (the near-dup verification
    moves ~|pairs| * 2 * dim elements through Arrow; lane width is the
    dominant cost). Kernels upcast to int64 before any product."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * F.lit(float(_QUANT_SCALE))).cast("int")
    )


def rp_lsh_bucket(vec: Column, dim: int, nbits: int = 12, seed: int = 42) -> Column:
    """Sign-random-projection LSH bucket id: nbits sign bits packed into a
    long. Projections are integer dot products over the quantized vector
    (see lsh_planes) — engine- and order-independent."""
    w = quantize_vec(vec)
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(lsh_planes(dim, nbits, seed)):
        proj = F.aggregate(
            F.zip_with(w, F.array(*[F.lit(c) for c in plane]), lambda x, c: x * c),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def rp_lsh_buckets(
    vec: Column, dim: int, nbits: int = 4, n_tables: int = 8, seed0: int = 42
) -> Column:
    """All n_tables LSH bucket ids in ONE pass: array<long>, element t =
    rp_lsh_bucket(vec, ..., seed0+t). The quantized vector is let-bound so
    fixed-point quantization runs once per row — not once per (table, bit)
    reference after Catalyst's projection collapse inlines it (the same
    recompute hazard functions.text.let documents). Bit-identical to
    calling rp_lsh_bucket per table."""

    def bucket_for(w: Column, t: int) -> Column:
        b = F.lit(0).cast("long")
        for i, plane in enumerate(lsh_planes(dim, nbits, seed0 + t)):
            proj = F.aggregate(
                F.zip_with(w, F.array(*[F.lit(c) for c in plane]), lambda x, c: x * c),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            b = b.bitwiseOR(
                F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
            )
        return b

    return let(
        quantize_vec(vec),
        lambda w: F.array(*[bucket_for(w, t) for t in range(n_tables)]),
    )


def rp_lsh_buckets_np(
    vec: Column, dim: int, nbits: int = 4, n_tables: int = 8, seed0: int = 42
) -> Column:
    """rp_lsh_buckets as a vectorized Arrow/numpy kernel: one int64 matmul
    (N x dim) @ (dim x n_tables*nbits) replaces n_tables*nbits interpreted
    aggregate() passes per row. Bit-identical to the expression variant —
    quantization stays a JVM expression (quantize_vec), and the projections
    are exact int64 arithmetic in both paths (overflow bound in lsh_planes).
    Input column = the QUANTIZED vector (array<long>)."""
    planes = []
    for t in range(n_tables):
        planes.extend(lsh_planes(dim, nbits, seed0 + t))

    @F.pandas_udf("array<long>")
    def _kernel(q):
        import numpy as np
        import pandas as pd

        if len(q) == 0:  # Arrow may hand the kernel an empty batch
            return pd.Series([], dtype=object)
        P = np.array(planes, dtype=np.int64)  # (n_tables*nbits, dim)
        Q = np.stack(q.to_numpy()).astype(np.int64)  # (N, dim)
        proj = Q @ P.T  # (N, n_tables*nbits) exact int64
        bits = (proj > 0).astype(np.int64)
        weights = np.tile(1 << np.arange(nbits, dtype=np.int64), n_tables)
        packed = bits * weights  # bit value within its table's bucket
        buckets = packed.reshape(len(Q), n_tables, nbits).sum(axis=2)
        return pd.Series(list(buckets))

    return _kernel(vec)


def rp_lsh_buckets_sig_np(
    vec: Column,
    dim: int,
    nbits: int = 4,
    n_tables: int = 8,
    seed0: int = 42,
    sig_bits: int = 256,
    sig_seed: int = 9001,
    word_bits: int = 32,
) -> Column:
    """rp_lsh_buckets_np plus a wide sign signature, in ONE Arrow pass:
    returns struct(buckets array<long>, sig array<long>) where `sig` packs
    sig_bits extra sign-random-projection bits into sig_bits/word_bits
    words of word_bits each (32 by default, so every word fits a BIGINT in
    any engine with headroom — no sign-bit edge case at bit 63).

    The signature powers a Hamming prefilter on bucket-join candidates:
    for a pair with cosine c the expected mismatch fraction is acos(c)/pi,
    so a popcount cut separates near-threshold pairs (mean ~0.35*sig_bits
    at c=0.45) from random collisions (mean 0.5*sig_bits) BEFORE the
    expensive distinct + vector joins + exact verification. All integer
    arithmetic — an external oracle replays it bit-for-bit
    (rp_sign_sig_words_sql). Input column = the QUANTIZED vector."""
    n_words = sig_bits // word_bits
    assert n_words * word_bits == sig_bits
    planes = []
    for t in range(n_tables):
        planes.extend(lsh_planes(dim, nbits, seed0 + t))
    sig_planes = lsh_planes(dim, sig_bits, sig_seed)

    # The kernel ECHOES its quantized input as `qv`: projection collapse
    # would otherwise inline the quantization expression into both the UDF
    # argument and a separate qv output column (subexpression elimination
    # does not span the Python-eval boundary), running it twice per row.
    @F.pandas_udf("qv array<int>, buckets array<long>, sig array<long>")
    def _kernel(q):
        import numpy as np
        import pandas as pd

        if len(q) == 0:  # Arrow may hand the kernel an empty batch
            return pd.DataFrame({"qv": [], "buckets": [], "sig": []})
        P = np.array(planes + sig_planes, dtype=np.int64)  # (nb*nt+sig, dim)
        Q = np.stack(q.to_numpy()).astype(np.int64)  # (N, dim)
        bits = (Q @ P.T > 0).astype(np.int64)  # exact int64 projections
        bbits = bits[:, : n_tables * nbits]
        weights = np.tile(1 << np.arange(nbits, dtype=np.int64), n_tables)
        buckets = (bbits * weights).reshape(len(Q), n_tables, nbits).sum(axis=2)
        sbits = bits[:, n_tables * nbits :]
        wweights = np.tile(1 << np.arange(word_bits, dtype=np.int64), n_words)
        words = (sbits * wweights).reshape(len(Q), n_words, word_bits).sum(axis=2)
        return pd.DataFrame(
            {"qv": list(q.to_numpy()), "buckets": list(buckets), "sig": list(words)}
        )

    return _kernel(vec)


def default_sig_cut(threshold: float, sig_bits: int) -> int:
    """The default Hamming cut for the sign-signature prefilter: expected
    mismatch for a pair AT the cosine threshold (acos(t)/pi * sig_bits)
    plus 2.6 sigma of binomial margin — keeps >99.5% of borderline-true
    pairs, rejects random collisions (mean sig_bits/2) at ~2+ sigma. The
    SINGLE source of truth for both the Spark plan and the SQL oracle
    replay: a margin tweak applied to one side only would silently desync
    the two engines' candidate sets."""
    import math

    p = math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
    return int(sig_bits * p + 2.6 * math.sqrt(sig_bits * p * (1 - p)))


def rp_sign_sig_words_sql(
    vec_sql: str, dim: int, sig_bits: int, seed: int, word_bits: int = 32
) -> list[str]:
    """DuckDB fragments (one per packed word) replaying the signature half
    of rp_lsh_buckets_sig_np bit-for-bit over a DOUBLE[] expression."""
    n_words = sig_bits // word_bits
    sig_planes = lsh_planes(dim, sig_bits, seed)
    words = []
    for w in range(n_words):
        terms = []
        for j in range(word_bits):
            plane = sig_planes[w * word_bits + j]
            lit = "[" + ", ".join(str(c) for c in plane) + "]"
            proj = (
                f"list_sum(list_transform(range(1, {dim + 1}), "
                f"i -> CAST(round(({vec_sql})[i] * {float(_QUANT_SCALE)}) AS BIGINT)"
                f" * ({lit})[i]))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END)")
        words.append("(" + " + ".join(terms) + ")")
    return words


def quant_cosine(q1: Column, q2: Column) -> Column:
    """Exact cosine over fixed-point-quantized int64 vectors, as a
    vectorized Arrow/numpy pandas UDF — the verification kernel for
    LSH-blocked near-dup at scale.

    Engine-exact by construction: dot and squared norms are int64 sums
    (associative, order-independent, overflow-safe — see lsh_planes), and
    the final scalar ops (cast, sqrt, multiply, divide) are each a single
    correctly-rounded IEEE-754 double operation, so numpy, the JVM, and a
    SQL oracle produce the identical bits. numpy crunches the batched
    integer dot ~100x faster than the interpreted higher-order-function
    expression (the round-1 bottleneck on candidate verification)."""

    @F.pandas_udf("double")
    def _kernel(a, b):
        import numpy as np
        import pandas as pd

        if len(a) == 0:  # Arrow may hand the kernel an empty batch
            return pd.Series([], dtype=np.float64)
        A = np.stack(a.to_numpy()).astype(np.int64)
        B = np.stack(b.to_numpy()).astype(np.int64)
        dot = (A * B).sum(axis=1).astype(np.float64)
        na = (A * A).sum(axis=1).astype(np.float64)
        nb = (B * B).sum(axis=1).astype(np.float64)
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    return _kernel(q1, q2)


def quant_cosine_sql(q1_sql: str, q2_sql: str, dim: int) -> str:
    """DuckDB fragment replaying quant_cosine bit-for-bit over two BIGINT[]
    expressions (same int64 sums, same scalar double ops)."""
    dot = f"list_sum(list_transform(range(1, {dim + 1}), i -> ({q1_sql})[i] * ({q2_sql})[i]))"
    n1 = f"list_sum(list_transform(range(1, {dim + 1}), i -> ({q1_sql})[i] * ({q1_sql})[i]))"
    n2 = f"list_sum(list_transform(range(1, {dim + 1}), i -> ({q2_sql})[i] * ({q2_sql})[i]))"
    return (
        f"(CAST({dot} AS DOUBLE) / "
        f"(sqrt(CAST({n1} AS DOUBLE)) * sqrt(CAST({n2} AS DOUBLE))))"
    )


def rp_lsh_bucket_sql(vec_sql: str, dim: int, nbits: int = 12, seed: int = 42) -> str:
    """DuckDB fragment computing the identical bucket id over `vec_sql`
    (a DOUBLE[] expression) — the oracle-side replay of rp_lsh_bucket."""
    terms = []
    for b, plane in enumerate(lsh_planes(dim, nbits, seed)):
        lit = "[" + ", ".join(str(c) for c in plane) + "]"
        proj = (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> CAST(round(({vec_sql})[i] * {float(_QUANT_SCALE)}) AS BIGINT)"
            f" * ({lit})[i]))"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nbits: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate top-k with multi-table random-hyperplane LSH: candidates
    are vectors sharing the query's bucket in ANY of the n_tables independent
    hash tables (union raises recall; each table is an equi-join, never a
    cross join). At 100 TB the (table, bucket) columns are precomputed and
    partitioned-on at write time, so a query touches n_tables/2^nbits of the
    corpus."""

    def with_buckets(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.posexplode(
                rp_lsh_buckets_np(
                    quantize_vec32(F.col(vec_col)), dim, nbits, n_tables, seed0=42
                )
            ).alias("table", "bucket"),
        )

    c = with_buckets(corpus, "cand_id", "cvec")
    q = with_buckets(queries, "query_id", "qvec")
    scored = (
        c.join(broadcast(q), ["table", "bucket"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", "qvec", "cvec")
        .distinct()  # a pair may collide in several tables
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine_sim", "rank")
    )


def train_ivf_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    sample: int = 2048,
    iters: int = 5,
    seed: int = 42,
) -> list[list[float]]:
    """Spherical k-means centroids trained on a deterministic driver-side
    sample (hash-ordered, so the same rows at any scale factor). Training on
    a bounded sample is the standard IVF recipe — FAISS trains on O(100k)
    vectors regardless of corpus size — so the collect here does NOT grow
    with the corpus; assignment and probing stay distributed."""
    import numpy as np

    rows = (
        df.orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[:n_clusters].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_clusters):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
                C[j] /= max(np.linalg.norm(C[j]), 1e-12)
    return C.tolist()


def _centroid_scores(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of dot(vec, centroid_j). Centroids are unit-norm, so argmax of
    the dot product == argmax cosine (|vec| is constant across j)."""
    cent = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in centroids])
    return F.transform(cent, lambda c: _dot(vec, c))


def ivf_assign(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Attach the IVF list id (nearest centroid by cosine) as `cluster`.
    At 100 TB this column is computed once at ingest and the table is
    written partitioned by it — a probe then touches nprobe/n_clusters of
    the data via partition pruning."""
    scores = _centroid_scores(F.col(vec_col), centroids)
    return df.withColumn(
        "cluster", (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    )


def ivf_probes(
    df: DataFrame, centroids: list[list[float]], vec_col: str, nprobe: int
) -> DataFrame:
    """Explode each query row into its `nprobe` nearest IVF lists."""
    scores = _centroid_scores(F.col(vec_col), centroids)
    ranked = F.array_sort(
        F.arrays_zip(scores.alias("s"), F.sequence(F.lit(0), F.lit(len(centroids) - 1)).alias("i")),
        lambda a, b: F.when(a["s"] > b["s"], -1).when(a["s"] < b["s"], 1).otherwise(
            (a["i"] - b["i"]).cast("int")
        ),
    )
    probe_ids = F.transform(F.slice(ranked, 1, nprobe), lambda x: x["i"].cast("int"))
    return df.withColumn("cluster", F.explode(probe_ids))


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: corpus vectors are
    bucketed by nearest centroid; each query scans only its nprobe nearest
    lists. The candidate join is a cluster equi-join (broadcast on the query
    side), never a cross join — the 100 TB scale path alongside
    cosine_topk_lsh."""
    centroids = train_ivf_centroids(
        corpus, id_col=id_col, vec_col=vec_col, n_clusters=n_clusters
    )
    c = ivf_assign(
        corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec")),
        centroids,
        "cvec",
    )
    q = ivf_probes(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        centroids,
        "qvec",
        nprobe,
    )
    scored = (
        c.join(broadcast(q), "cluster")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine_sim", "rank")
    )


def embedding_near_dup_blocked(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    nbits: int = 8,
    n_tables: int = 6,
    seed: int = 42,
    sig_bits: int = 256,
    sig_seed: int = 9001,
    sig_max_hamming: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking — the 100 TB
    path: candidates are pairs sharing a sign-random-projection bucket in
    ANY of n_tables independent tables (each table a self-equi-join on the
    bucket id, never a cross join), then verified with the exact quantized
    cosine (quant_cosine: int64 sums + scalar IEEE doubles — bit-identical
    across engines, so an external oracle replays candidates AND
    verification). Recall vs the exact all-pairs float baseline is asserted
    in tests/test_llm.py.

    Bucket-join output is prefiltered by a sig_bits-wide sign-signature
    Hamming cut (codegen'd xor+bit_count on packed words, in the SAME stage
    as the join — never materialized): at low thresholds the buckets are
    necessarily coarse (few sign bits per table or recall dies), so almost
    all bucket collisions are random pairs whose expected mismatch is
    sig_bits/2, far from a true pair's acos(threshold)/pi * sig_bits; the
    cut (default mean_true + 2.6 sigma) drops ~99% of collisions before
    they reach the distinct or carry any vector payload. Integer-exact, so
    the oracle replays it (rp_sign_sig_words_sql). Disable with
    sig_max_hamming=-1.

    The plan keeps candidate pairs NARROW: the bucket self-join carries
    (id, 8 sig words); the distinct carries only (id1, id2); vectors are
    joined back (quantized, once per row, map-side) only for the surviving
    distinct pairs. At 100 TB bucket+signature columns are computed at
    ingest, the per-table self-join shuffles on the bucket id, and the two
    id-keyed vector joins are plain narrow-key shuffle joins
    (broadcast-able per corpus chunk)."""
    word_bits = 32
    n_words = sig_bits // word_bits
    if sig_max_hamming is None:
        sig_max_hamming = default_sig_cut(threshold, sig_bits)
    # r12 examined, measured, left alone: spreading the one-split bench
    # scan before the index kernel (the dedup_simhash move) measured
    # SLOWER here (construct 0.90 -> 1.14 s fresh-JVM) — this kernel is
    # one N x dim int64 matmul, milliseconds of numpy next to the added
    # exchange + per-task Arrow worker fan-out; the text kernels that
    # benefit from spreading do orders of magnitude more per-row work.
    base = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    # Materialize the per-vector index frame (quantized vector + buckets +
    # signature) ONCE: it feeds three consumers — both sides of the bucket
    # self-join and the verification join-back — and without the cut Spark
    # recomputes the scan + quantization + Arrow kernel per consumer. This
    # is also the 100 TB shape: the index table is computed at ingest and
    # stored next to the corpus.
    bs = base.select(
        "id",
        rp_lsh_buckets_sig_np(
            quantize_vec32(F.col("v")), dim, nbits, n_tables,
            seed0=seed, sig_bits=sig_bits, sig_seed=sig_seed, word_bits=word_bits,
        ).alias("bs"),
    ).localCheckpoint(eager=True)
    # with the prefilter disabled the sig words never ride the self-join
    sig_words = range(n_words) if sig_max_hamming >= 0 else range(0)
    withb = bs.select(
        "id",
        *[F.col("bs.sig")[w].alias(f"s{w}") for w in sig_words],
        F.posexplode(F.col("bs.buckets")).alias("table", "bucket"),
    )
    a = withb.select(
        F.col("id").alias("id1"), "table", "bucket",
        *[F.col(f"s{w}").alias(f"a{w}") for w in sig_words],
    )
    b = withb.select(
        F.col("id").alias("id2"), "table", "bucket",
        *[F.col(f"s{w}").alias(f"b{w}") for w in sig_words],
    )
    joined = a.join(b, ["table", "bucket"]).filter(F.col("id1") < F.col("id2"))
    if sig_max_hamming >= 0:
        hamming = sum(
            F.bit_count(F.col(f"a{w}").bitwiseXOR(F.col(f"b{w}")))
            for w in range(n_words)
        )
        joined = joined.filter(hamming <= F.lit(sig_max_hamming))
    pairs = (
        joined.select("id1", "id2")
        .distinct()  # a pair may collide in several tables
    )
    q = bs.select("id", F.col("bs.qv").alias("qv"))
    return (
        pairs.join(q.select(F.col("id").alias("id1"), F.col("qv").alias("q1")), "id1")
        .join(q.select(F.col("id").alias("id2"), F.col("qv").alias("q2")), "id2")
        .select(
            "id1",
            "id2",
            F.round(quant_cosine(F.col("q1"), F.col("q2")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs baseline for
    oracle cross-checks and recall tests; embedding_near_dup_blocked is the
    registered scale path)."""
    a = corpus.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = corpus.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.round(cosine(F.col("v1"), F.col("v2")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
