"""Deduplication operators for large-scale corpus cleaning (SURVEY.md §2.B
"LLM-data-pipeline extensions"): exact hash dedup, n-gram Jaccard near-dup,
MinHash+LSH banding, SimHash. Everything below is pure Column expressions +
joins — no Python in the hot path — so the same plans run on a 1000-executor
cluster: shingling is map-side, candidate generation shuffles once on the
band/bucket key, and verification touches candidate pairs only.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wal_consumer_spark.functions.text import let, tokens, word_shingles


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content hash: keep min id as canonical.

    sha2 group-keys (not raw text) keep shuffle rows narrow at 100 TB.
    """
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingle_pairs_jaccard(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, max_df: int = 1000
) -> DataFrame:
    """All candidate pairs sharing >=1 k-shingle, with exact Jaccard.

    Exact formulation (oracle-checkable): explode distinct shingles,
    self-join on shingle, |A∩B| = co-count, |A∪B| = |A|+|B|-|A∩B|.
    At scale prefer minhash_candidates() below, which bounds the join by
    LSH bands instead of raw shingle frequency.

    `max_df` is the skew guard analogous to LSH's `max_bucket`: a shingle
    occurring in more than max_df documents (a stop-shingle) would alone
    contribute O(df^2) join pairs, so it is dropped from candidate
    generation/intersection counting (set sizes keep the full shingle
    sets). The default sits far above the corpus's observed max DF (25 at
    sf0.1), so results are exactly the uncapped Jaccard there — the cap
    only engages on degenerate corpora.

    r12 optimization (guide §2.3/§2.4): the per-doc shingle-set frame is
    built ONCE — repartitioned by id first so the CPU-dense interpreted
    shingling runs cluster-wide instead of at the input's scan
    parallelism, then checkpointed. word_shingles already array_distincts
    per row and ids are unique, so the old exploded (doc, shingle)
    DISTINCT was a redundant full exchange and is gone; set sizes are the
    map-side size() of the checkpointed array (was a groupBy exchange).
    Both self-join sides read the df-capped frame from a second
    checkpoint instead of re-deriving scan+shingle+window per side (the
    plan previously scanned the corpus 4x per evaluation).
    """
    from wal_consumer_spark.operators.partitioning import spread_small_input

    sets = (
        spread_small_input(df, id_col)
        .select(
            F.col(id_col).alias("doc"),
            word_shingles(tokens(F.col(text_col)), k).alias("__ss"),
        )
        .localCheckpoint(eager=True)
    )
    return shingle_pairs_jaccard_from_sets(sets, max_df=max_df)


def shingle_pairs_jaccard_from_sets(
    sets: DataFrame, max_df: int = 1000
) -> DataFrame:
    """`shingle_pairs_jaccard` over a pre-materialized (doc, __ss)
    shingle-array frame — factored out (r12) so a caller that already
    pays the tokenize+shingle checkpoint for other consumers (e.g. a
    MinHash signature build in the same audit) shares ONE tokenization
    instead of rebuilding the arrays here. `sets` must be checkpointed/
    cheap-to-rescan: it is consumed by the explode below and the
    map-side size() projection."""
    sh = sets.select("doc", F.explode("__ss").alias("shingle"))
    sizes = sets.select(
        "doc", F.size("__ss").cast("long").alias("n_shingles")
    )
    # window count over the same `shingle` key the self-join shuffles on —
    # the exchange is shared, so the guard costs no extra wide shuffle.
    capped = (
        sh.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .filter(F.col("__df") <= max_df)
        .drop("__df")
        .localCheckpoint(eager=True)
    )
    a = capped.select(F.col("doc").alias("doc1"), "shingle")
    b = capped.select(F.col("doc").alias("doc2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc": "doc1", "n_shingles": "n1"}), "doc1")
        .join(sizes.withColumnsRenamed({"doc": "doc2", "n_shingles": "n2"}), "doc2")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")),
        )
    )


#: prime modulus > 2^32 for the universal-hash permutation family
_MINHASH_P = 4294967311


def minhash_coeffs(num_perm: int = 32, seed: int = 7) -> list[tuple[int, int]]:
    """The (a_i, b_i) universal-hash coefficients for `minhash_signature`,
    exposed so an external oracle (DuckDB SQL) can replay the identical
    permutation family."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 31), rng.randrange(0, 1 << 31))
        for _ in range(num_perm)
    ]


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 32,
    k: int = 3,
    seed: int = 7,
    portable: bool = False,
) -> DataFrame:
    """Deterministic MinHash signatures via universal hashing: each shingle
    is hashed ONCE (xxhash64, truncated to its low 32 bits), then permutation
    i is the cheap integer map ``(a_i * h + b_i) mod P`` — min over shingles.

    Replacing per-permutation string hashes with integer multiply-add-mod
    made signatures ~6x faster (5.2s -> <1s for 5k docs at sf0.1). Overflow
    safety under ANSI mode: h < 2^32 and a_i < 2^31, so a_i*h + b_i < 2^63
    never overflows a signed long.

    The shingle-hash array is let-bound (see functions.text.let) so tokenize
    + shingle + hash run once per row; without the binding Spark's
    interpreted HOF evaluation recomputes them per permutation (measured
    32x slowdown).

    `portable=True` swaps the shingle hash from xxhash64 (JVM-only, fastest)
    to the first 8 hex chars of md5 — bit-identical in any engine with md5,
    so a DuckDB oracle can replay the full signature pipeline. The
    permutation family is already portable integer arithmetic either way.
    """
    return minhash_signature_from_shingles(
        df,
        id_col,
        word_shingles(tokens(F.col(text_col)), k),
        num_perm=num_perm,
        seed=seed,
        portable=portable,
    )


def minhash_signature_from_shingles(
    df: DataFrame,
    id_col: str,
    shingles,
    num_perm: int = 32,
    seed: int = 7,
    portable: bool = False,
) -> DataFrame:
    """`minhash_signature` over a pre-built shingle-array Column — the
    exact same expression tree, with the tokenize+shingle step factored
    out so a caller that needs the shingle arrays for OTHER consumers
    too (e.g. an exact-Jaccard truth build) can compute them once,
    checkpoint, and derive signatures array-locally from the
    materialized frame instead of re-tokenizing the corpus (r12,
    guide §1.2/§4.1: the tokenization is the shared heavy per-row
    stage). `shingles` is a Column (array<string>) or column name."""
    coeffs = minhash_coeffs(num_perm, seed)
    if portable:
        sh_hash = lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")  # noqa: E731
    else:
        sh_hash = lambda x: F.xxhash64(x).bitwiseAND(F.lit(4294967295))  # noqa: E731
    shingles = F.col(shingles) if isinstance(shingles, str) else shingles
    sh_hashes = F.transform(shingles, sh_hash)
    # (a_i, b_i) as one literal array-of-pairs: a single nested transform
    # keeps the expression tree ~num_perm times smaller than unrolling, which
    # cuts Catalyst planning time without changing the per-element work.
    lit_coeffs = F.array(*[F.array(F.lit(a), F.lit(b)) for a, b in coeffs])
    sig = let(
        sh_hashes,
        lambda hs: F.transform(
            lit_coeffs,
            lambda c: F.array_min(
                F.transform(hs, lambda h: (h * c[0] + c[1]) % F.lit(_MINHASH_P))
            ),
        ),
    )
    return df.select(F.col(id_col).alias("doc"), sig.alias("sig"))


#: THE bucket-size skew cap — single source of truth for every LSH
#: banding site that drops over-full buckets (minhash_candidates,
#: minhash_near_pairs, and dedup_lsh_band_sensitivity's fused sweep plus
#: its oracle SQL generator in plans/llm.py). An over-cap bucket carries
#: no discriminating information (its pairs are overwhelmingly false
#: positives); a single shared constant keeps the band-sensitivity
#: query's candidate sets provably identical to minhash_near_pairs'
#: (ADVICE r12: a drifting per-site literal would silently break that
#: documented equivalence).
DEFAULT_MAX_BUCKET: int = 500


def lsh_band_key(b, rows_per_band: int, portable: bool = False):
    """THE band-bucket key expression — single source of truth for every
    LSH banding site (minhash_candidates, minhash_near_pairs, and the
    streaming index's minhash_buckets): bucket = hash of the band's
    signature slice, salted with the band index. All sites must stay
    bit-identical or the streaming index silently diverges from the batch
    dedup it is asserted equivalent to (tests/test_dedup_index.py).
    `b` may be a python int or a Column (transform lambda variable).
    `portable=True` renders the slice as a string instead of hashing —
    engine-independent, replayable by a SQL oracle."""
    slice_ = F.concat_ws(",", F.slice("sig", b * rows_per_band + 1, rows_per_band))
    return slice_ if portable else F.xxhash64(slice_, b)


def minhash_candidates(
    sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 8,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band become candidates.

    Shuffle key = (band, hash(band slice)) — at 100 TB this is the only
    join. Two skew guards keep the pair fan-out bounded on self-similar
    corpora: (1) 8-row bands are strict enough that unrelated docs rarely
    share a bucket; (2) buckets above `max_bucket` docs are dropped — an
    over-full bucket means the band carries no discriminating information
    (its pairs are overwhelmingly false positives), and any true near-dup
    pair still has the other bands to collide in. Without the cap a single
    degenerate bucket of n docs yields n^2 pairs.
    """
    banded = sigs.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: lsh_band_key(b, rows_per_band),
            )
        ).alias("band", "bucket"),
    )
    small = (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_bucket)
        .drop("__n")
    )
    banded = banded.join(small, ["band", "bucket"])
    a = banded.select(F.col("doc").alias("doc1"), "band", "bucket")
    b = banded.select(F.col("doc").alias("doc2"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )


def minhash_jaccard_estimate(sigs: DataFrame, candidates: DataFrame) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing signature positions."""
    s1 = sigs.select(F.col("doc").alias("doc1"), F.col("sig").alias("sig1"))
    s2 = sigs.select(F.col("doc").alias("doc2"), F.col("sig").alias("sig2"))
    return (
        candidates.join(s1, "doc1")
        .join(s2, "doc2")
        .select(
            "doc1",
            "doc2",
            (
                F.size(
                    F.filter(
                        F.zip_with("sig1", "sig2", lambda x, y: (x == y).cast("int")),
                        lambda v: v == 1,
                    )
                )
                / F.size("sig1")
            ).alias("est_jaccard"),
        )
    )


def simhash64(
    df: DataFrame, id_col: str, text_col: str, portable: bool = False
) -> DataFrame:
    """64-bit SimHash over whitespace tokens, as one JVM expression:
    bit b of the fingerprint = sign of sum over tokens of ±1 according to
    bit b of xxhash64(token). Built via SQL expr because the shift amount is
    itself a column (the Python shiftleft/shiftright wrappers take ints).

    `portable=True` swaps the token hash for the first 15 hex chars of md5
    (60 bits — 16 would overflow a signed long) so a DuckDB oracle can
    replay the identical fingerprint; the production default stays xxhash64
    over the full 64 bits."""
    nbits = 60 if portable else 64
    if portable:
        token_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")  # noqa: E731
    else:
        token_hash = lambda t: F.xxhash64(t)  # noqa: E731
    hashed = df.select(
        F.col(id_col).alias("doc"),
        F.transform(tokens(F.col(text_col)), token_hash).alias("th"),
    )
    # Tokenization + token hashing stay JVM expressions (one pass per row —
    # the text semantics the oracle replays); the per-bit +/-1 scoring over
    # the hash array moves to an exact-int64 numpy kernel. The interpreted
    # higher-order-function formulation costs nbits * n_tokens lambda evals
    # per row (measured 10x slower on this query); numpy computes the same
    # bit matrix in one shot, bit-identical (pure integer arithmetic).
    return hashed.select("doc", _simhash_score_np(nbits)(F.col("th")).alias("simhash"))


def _simhash_score_np(nbits: int):
    """Arrow/numpy SimHash bit-scoring kernel: for each row's token-hash
    array, bit b of the fingerprint = 1 iff sum over tokens of
    (+1 if bit b of hash else -1) > 0. Exact integer arithmetic — the
    result is independent of batch/partition layout and identical to the
    expression formulation it replaces."""

    @F.pandas_udf("long")
    def _kernel(th):
        import numpy as np
        import pandas as pd

        shifts = np.arange(nbits, dtype=np.uint64)
        weights = (np.int64(1) << np.arange(nbits, dtype=np.int64))
        out = np.empty(len(th), dtype=np.int64)
        for i, hs in enumerate(th.to_numpy()):
            h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            score = 2 * bits.sum(axis=0) - len(h)
            out[i] = int((weights * (score > 0)).sum())
        return pd.Series(out)

    return _kernel


def simhash_near_pairs(
    fps: DataFrame,
    max_hamming: int = 8,
    n_chunks: int = 4,
    chunk_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on bit chunks:
    a pair within distance d < n_chunks must agree exactly on >=1 chunk
    (pigeonhole — lossless for d <= n_chunks-1; for the default d<=8 the
    blocking is a high-recall heuristic), so the join key is
    (chunk_idx, chunk_value) — no n^2 scan. `chunk_bits=15` matches the
    60-bit portable fingerprint.

    The fingerprint frame is materialized once (localCheckpoint) before the
    self-join: both join sides reference the same subtree, and without the
    cut Spark recomputes the whole fingerprint pipeline (tokenize + per-
    token hash + bit scoring — the dominant cost) once per side. This is
    also the 100 TB shape: fingerprints are computed at ingest and stored;
    pair generation reads the fingerprint table, not the raw text. The
    Hamming cut runs in the join stage, before the distinct, so random
    chunk collisions never reach the shuffle."""
    fps = fps.localCheckpoint(eager=True)
    chunk_mask = (1 << chunk_bits) - 1
    chunked = fps.select(
        "doc",
        "simhash",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_chunks - 1}),"
                f" i -> shiftright(simhash, i * {chunk_bits}) & {chunk_mask})"
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunked.select(F.col("doc").alias("doc1"), F.col("simhash").alias("h1"), "chunk_idx", "chunk_val")
    b = chunked.select(F.col("doc").alias("doc2"), F.col("simhash").alias("h2"), "chunk_idx", "chunk_val")
    pairs = (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("doc1") < F.col("doc2"))
        .withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
        .distinct()
    )
    return pairs


def near_dedup_canonical(pairs: DataFrame, all_ids: DataFrame, id_col: str) -> DataFrame:
    """Pick canonical survivors: a doc is dropped if it pairs with a smaller
    doc id (single-link, one pass — the standard large-corpus approximation)."""
    dropped = pairs.select(F.col("doc2").alias(id_col)).distinct()
    return all_ids.join(dropped, id_col, "left_anti")


def minhash_near_pairs(
    sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 8,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    portable: bool = False,
) -> DataFrame:
    """Fused banding + estimate: same results as minhash_candidates →
    minhash_jaccard_estimate, in 3 shuffles instead of ~7.

    - bucket-size skew guard via a window count over (band, bucket) — no
      count+join round-trip;
    - signatures ride along through the band self-join, so the pairwise
      agreement is computed inline instead of re-joining sigs twice;
    - duplicate pairs (docs colliding in several bands) reduce with a
      groupBy max (every copy carries the same estimate).

    The band self-join reuses the window's (band, bucket) hash partitioning,
    so banding+join is one exchange; at 100 TB the only wide shuffle remains
    the band-key exchange, as before.

    `portable=True` keys buckets on the band slice rendered as a string
    (engine-independent) instead of its xxhash64 — same pairs, replayable by
    a DuckDB oracle; the hashed key stays the production default since it
    shuffles 8 bytes instead of ~80.
    """
    from pyspark.sql import Window

    band_key = lambda b: lsh_band_key(b, rows_per_band, portable)  # noqa: E731
    banded = sigs.select(
        "doc",
        "sig",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), band_key)
        ).alias("band", "bucket"),
    ).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("__n") <= max_bucket).drop("__n")

    a = banded.select(F.col("doc").alias("doc1"), F.col("sig").alias("sig1"), "band", "bucket")
    b = banded.select(F.col("doc").alias("doc2"), F.col("sig").alias("sig2"), "band", "bucket")
    est = (
        F.size(
            F.filter(
                F.zip_with("sig1", "sig2", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        / F.size("sig1")
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", est.alias("est_jaccard"))
        .groupBy("doc1", "doc2")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
    )

def minhash_candidate_agreement(
    sigs: DataFrame,
    agree,
    bands: int = 4,
    rows_per_band: int = 8,
    max_bucket: int = 500,
) -> DataFrame:
    """Fused LSH candidates + per-pair signature agreement: the same
    (doc1, doc2) pairs as ``minhash_candidates`` followed by re-joining
    `sigs` onto both pair sides, without the pair DISTINCT or either
    re-join — signatures ride through the band self-join (the
    minhash_near_pairs discipline) and `agree(sig1, sig2) -> Column`
    computes the per-pair value inline. Pairs colliding in several bands
    reduce with a groupBy max; every copy carries the identical value, so
    the result is bit-equal to the candidates→join formulation (r12
    optimization, guide §2.4: 3 exchanges removed per consumer). The
    bucket key stays the non-portable (hashed) production default,
    exactly as minhash_candidates' sites used."""
    banded = sigs.select(
        "doc",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: lsh_band_key(b, rows_per_band),
            )
        ).alias("band", "bucket"),
    ).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("__n") <= max_bucket).drop("__n")
    a = banded.select(
        F.col("doc").alias("doc1"), F.col("sig").alias("sig1"), "band", "bucket"
    )
    b = banded.select(
        F.col("doc").alias("doc2"), F.col("sig").alias("sig2"), "band", "bucket"
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select(
            "doc1", "doc2", agree(F.col("sig1"), F.col("sig2")).alias("__v")
        )
        .groupBy("doc1", "doc2")
        .agg(F.max("__v").alias("__v"))
    )


def prefix_filtered_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_num: int = 3,
    threshold_den: int = 5,
    k: int = 3,
) -> DataFrame:
    """Exact Jaccard similarity join with PPJoin-style prefix filtering.

    The LOSSLESS counterpart of MinHash-LSH: for sets x, y under one global
    token order, J(x, y) >= t implies the first ``|x| - ceil(t*|x|) + 1``
    tokens of x and the analogous prefix of y share at least one token
    (Chaudhuri et al. SSJoin'06 / Xiao et al. PPJoin WWW'08). Candidate
    generation therefore equi-joins only PREFIX shingles — ordered by
    ascending global document frequency so prefixes hold the *rarest*
    shingles, where the join fans out least — and verification computes
    exact Jaccard on the surviving pairs only. Unlike MinHash this misses
    nothing; unlike the raw all-shared-shingle join
    (shingle_pairs_jaccard) the candidate set shrinks ~70x at sf0.01
    (11 533 -> 165 candidates for the same 25 true pairs).

    Scale shape (100 TB): DF table is one narrow groupBy(shingle); prefix
    ranking is a doc_id-partitioned window (never global); the candidate
    join shuffles only prefix rows on the shingle key, with frequency
    ordering doing the skew-avoidance work a max_df cap does elsewhere;
    verification joins collect_set arrays for candidate docs only.

    The threshold is the rational ``threshold_num/threshold_den`` and the
    prefix length uses pure integer arithmetic (``n - ceil(t*n) + 1`` with
    ceil(a/b) = (a + b - 1) div b) so Spark and any SQL oracle agree
    bit-for-bit with no float boundary cases.
    """
    tn, td = threshold_num, threshold_den
    sh = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(word_shingles(tokens(F.col(text_col)), k)).alias("shingle"),
        )
        .distinct()
        # consumed 3x (df counts, prefix ranking, verification sets):
        # materialize once so tokenize+explode+distinct doesn't run per
        # consumer (the multi-consumer recompute trap; see SCALE.md §19).
        .localCheckpoint(eager=True)
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc").orderBy(F.asc("df"), F.asc("shingle"))
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc")))
    )
    # prefix_len = n - ceil(t*n) + 1, integer-exact: ceil(tn*n/td) = (tn*n + td - 1) div td
    prefix = ranked.filter(
        F.col("rk") <= F.col("n") - F.expr(f"(({tn} * n + {td} - 1) div {td})") + 1
    ).select("doc", "shingle")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "shingle")
        .select(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
        .filter(F.col("doc1") < F.col("doc2"))
        .distinct()
    )
    sets = sh.groupBy("doc").agg(F.sort_array(F.collect_set("shingle")).alias("sset"))
    verified = (
        cand.join(sets.select(F.col("doc").alias("doc1"), F.col("sset").alias("s1")), "doc1")
        .join(sets.select(F.col("doc").alias("doc2"), F.col("sset").alias("s2")), "doc2")
        .withColumn("n_common", F.size(F.array_intersect("s1", "s2")))
        .withColumn("n_union", F.size("s1") + F.size("s2") - F.col("n_common"))
        .filter(F.col("n_common") * td >= F.col("n_union") * tn)
    )
    return verified.select(
        "doc1",
        "doc2",
        "n_common",
        "n_union",
        F.round(F.col("n_common") / F.col("n_union"), 6).alias("jaccard"),
    )
