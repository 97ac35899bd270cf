"""Quality assertions for the approximate (no-oracle) LLM operators:
the sketch paths must agree with their exact oracle-checked baselines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from wal_consumer_spark.functions.multimodal import (
    attach_media_columns,
    decode_media,
    real_decode,
)
from wal_consumer_spark.operators.dedup import (
    minhash_candidates,
    minhash_signature,
    near_dedup_canonical,
    shingle_pairs_jaccard,
)
from wal_consumer_spark.operators.similarity import cosine_topk_bruteforce, cosine_topk_lsh
from wal_consumer_spark.sources.tables import load_table


def test_minhash_lsh_recall_vs_exact(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    exact = {
        (r.doc1, r.doc2)
        for r in shingle_pairs_jaccard(docs, "doc_id", "text")
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    cands = {
        (r.doc1, r.doc2)
        for r in minhash_candidates(minhash_signature(docs, "doc_id", "text")).collect()
    }
    assert exact, "exact near-dup baseline unexpectedly empty"
    recall = len(exact & cands) / len(exact)
    assert recall >= 0.7, f"MinHash-LSH recall too low: {recall:.2f}"


def test_lsh_topk_overlap_vs_bruteforce(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    bf = cosine_topk_bruteforce(emb, queries, k=10).collect()
    lsh = cosine_topk_lsh(emb, queries, dim=64, k=10, nbits=4).collect()
    bf_pairs = {(r.query_id, r.cand_id) for r in bf}
    lsh_pairs = {(r.query_id, r.cand_id) for r in lsh}
    overlap = len(bf_pairs & lsh_pairs) / len(bf_pairs)
    # nbits=4 -> 16 buckets over 500 vectors; same-bucket filtering should
    # still recover a useful fraction of the true top-10.
    assert overlap >= 0.15, f"LSH top-k overlap too low: {overlap:.2f}"


def test_ivf_topk_recall_vs_bruteforce(spark):
    from wal_consumer_spark.operators.similarity import cosine_topk_ivf

    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    bf = cosine_topk_bruteforce(emb, queries, k=10).collect()
    ivf = cosine_topk_ivf(emb, queries, k=10, n_clusters=16, nprobe=6).collect()
    bf_pairs = {(r.query_id, r.cand_id) for r in bf}
    ivf_pairs = {(r.query_id, r.cand_id) for r in ivf}
    recall = len(bf_pairs & ivf_pairs) / len(bf_pairs)
    # probing 6/16 lists should recover most of the true top-10 (near
    # neighbours concentrate in the query's nearest lists)
    assert recall >= 0.6, f"IVF top-k recall too low: {recall:.2f}"


def test_ivf_nprobe_curve_contract_and_values(spark):
    """sim_ivf_nprobe_curve's driver-checked output asserts the monotone/
    exact-at-full CONTRACT; here we pin the actual recall numbers it
    certifies: recall must strictly improve somewhere across the sweep and
    reach exactly 1.0 at nprobe=n_clusters (probing every list IS exact
    search)."""
    from wal_consumer_spark.operators.similarity import (
        cosine_topk_ivf,
        train_ivf_centroids,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    bf_pairs = {
        (r.query_id, r.cand_id)
        for r in cosine_topk_bruteforce(emb, queries, k=10).collect()
    }
    recalls = []
    for nprobe in (1, 4, 16):
        pairs = {
            (r.query_id, r.cand_id)
            for r in cosine_topk_ivf(
                emb, queries, k=10, n_clusters=16, nprobe=nprobe
            ).collect()
        }
        recalls.append(len(bf_pairs & pairs) / len(bf_pairs))
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"
    assert recalls[-1] == 1.0, f"full probe not exact: {recalls}"
    assert recalls[-1] > recalls[0], f"sweep has no signal: {recalls}"
    # centroids train deterministically (fixed hash-ordered sample + seed)
    assert train_ivf_centroids(emb) == train_ivf_centroids(emb)


def test_near_dedup_canonical_partition(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    n_docs = docs.count()
    pairs = shingle_pairs_jaccard(docs, "doc_id", "text").filter(F.col("jaccard") >= 0.5)
    survivors = near_dedup_canonical(
        pairs.select(F.col("doc1"), F.col("doc2")), docs.select("doc_id"), "doc_id"
    )
    dropped = pairs.select(F.col("doc2").alias("doc_id")).distinct()
    assert survivors.count() + dropped.count() == n_docs
    # no survivor is a dropped doc
    assert survivors.join(dropped, "doc_id").count() == 0


def test_multimodal_decode_stub(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    media = attach_media_columns(docs, "doc_id", "text", "source")
    decoded = decode_media(media, fake=True)
    rows = decoded.limit(5).collect()
    assert {r.kind for r in rows} <= {"image", "audio", "video"}
    for r in rows:
        assert r.n_bytes == len(r.payload)
        assert 16 <= r.width < 80 and 16 <= r.height < 80
    with pytest.raises(NotImplementedError):
        real_decode(b"\x00", "image")


def test_count_min_sketch_bounds(spark):
    """CMS estimates are >= exact counts, and exact when width >> #keys."""
    from wal_consumer_spark.operators.sketch import cms_build, cms_estimate

    e = load_table(spark, SF_ORACLE, "events")
    exact = {r.event_type: r.n for r in
             e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    sketch = cms_build(e, "event_type", depth=3, width=256)
    est = {r.event_type: r.est_count for r in
           cms_estimate(sketch, e.select("event_type"), "event_type",
                        depth=3, width=256).collect()}
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n
    # 6 keys in 256 buckets x 3 rows: some row has no collision -> exact
    assert est == exact


def test_hll_partial_merge_accuracy(spark):
    """Region-level HLL estimates from merged per-nation sketches are within
    2% of exact distinct counts (lgConfigK=14 -> ~0.8% relative std error)."""
    from wal_consumer_spark.plans.aggregates import agg_hll_partial_merge

    c = load_table(spark, SF_ORACLE, "customer")
    n = load_table(spark, SF_ORACLE, "nation").select("n_nationkey", "n_regionkey")
    exact = {
        r.regionkey: r.n
        for r in c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_regionkey").alias("regionkey"))
        .agg(F.countDistinct("c_custkey").alias("n"))
        .collect()
    }
    got = {r.regionkey: r for r in agg_hll_partial_merge(spark, SF_ORACLE).collect()}
    assert set(got) == set(exact)
    for k, n_exact in exact.items():
        assert got[k].n_exact == n_exact, (k, got[k].n_exact, n_exact)
        assert got[k].within_5pct, k


def test_count_min_sketch_merge_equals_full_build(spark):
    """cms_merge over chunk sketches == sketch over the whole input: the
    mergeability property that lets 100 TB heavy-hitter sketches be built
    per-partition/per-day and rolled up without rescans."""
    from wal_consumer_spark.operators.sketch import cms_build, cms_estimate, cms_merge

    e = load_table(spark, SF_ORACLE, "events")
    lo, hi = e.agg(F.min("event_id"), F.max("event_id")).collect()[0]
    mid = (lo + hi) // 2
    s1 = cms_build(e.filter(F.col("event_id") <= mid), "event_type")
    s2 = cms_build(e.filter(F.col("event_id") > mid), "event_type")
    merged = cms_merge(s1, s2)
    full = cms_build(e, "event_type")
    est_m = {r.event_type: r.est_count for r in
             cms_estimate(merged, e.select("event_type"), "event_type").collect()}
    est_f = {r.event_type: r.est_count for r in
             cms_estimate(full, e.select("event_type"), "event_type").collect()}
    assert est_m == est_f


def test_embedding_near_dup_blocked_recall(spark):
    """The LSH-blocked near-dup path (registered query) recovers most of the
    exact all-pairs result at the 0.45 threshold, and never reports a pair
    below threshold (precision 1.0 by construction — candidates are verified
    with the exact cosine)."""
    from wal_consumer_spark.operators.similarity import (
        embedding_near_dup_blocked,
        embedding_near_dup_pairs,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings")
    exact = {
        (r.id1, r.id2)
        for r in embedding_near_dup_pairs(emb, threshold=0.45).collect()
    }
    blocked = {
        (r.id1, r.id2)
        for r in embedding_near_dup_blocked(
            emb, dim=64, threshold=0.45, nbits=4, n_tables=12, seed=77
        ).collect()
    }
    assert exact, "exact near-dup baseline unexpectedly empty"
    assert blocked <= exact  # verified candidates only
    recall = len(blocked & exact) / len(exact)
    assert recall >= 0.7, f"blocked near-dup recall too low: {recall:.2f}"


def test_near_dup_signature_prefilter_loss_bound(spark):
    """The 256-bit Hamming prefilter only drops random bucket collisions:
    against the same blocking with the prefilter disabled
    (sig_max_hamming=-1) the result must be a subset with >=95% of pairs
    kept — the 2.6-sigma cut's design loss is <0.5% for borderline-true
    pairs, so a bigger drop means the cut or the signature drifted."""
    from wal_consumer_spark.operators.similarity import embedding_near_dup_blocked

    emb = load_table(spark, SF_ORACLE, "embeddings")
    kw = dict(dim=64, threshold=0.45, nbits=4, n_tables=12, seed=77)
    unfiltered = {
        (r.id1, r.id2)
        for r in embedding_near_dup_blocked(emb, sig_max_hamming=-1, **kw).collect()
    }
    filtered = {
        (r.id1, r.id2)
        for r in embedding_near_dup_blocked(emb, **kw).collect()
    }
    assert unfiltered, "unfiltered blocked result unexpectedly empty"
    assert filtered <= unfiltered
    kept = len(filtered) / len(unfiltered)
    assert kept >= 0.95, f"prefilter dropped too many true pairs: kept {kept:.2%}"


def test_shingle_df_cap_drops_stop_shingles(spark):
    """A shingle shared by more than max_df docs (a stop-shingle) is excluded
    from candidate generation: without the cap a degenerate corpus produces
    O(df^2) pairs from that shingle alone."""
    docs = spark.createDataFrame(
        [
            # all five share the stop-shingle "aa bb cc"; only docs 1/2 also
            # share a discriminating shingle "xx yy zz".
            (1, "aa bb cc xx yy zz"),
            (2, "aa bb cc xx yy zz"),
            (3, "aa bb cc pp qq rr"),
            (4, "aa bb cc ss tt uu"),
            (5, "aa bb cc vv ww kk"),
        ],
        "doc_id LONG, text STRING",
    )
    capped = shingle_pairs_jaccard(docs, "doc_id", "text", max_df=3).collect()
    pairs = {(r.doc1, r.doc2) for r in capped}
    # stop-shingle-only pairs are gone; the discriminating pair survives
    assert (1, 2) in pairs
    assert (3, 4) not in pairs and (3, 5) not in pairs and (4, 5) not in pairs
    uncapped = shingle_pairs_jaccard(docs, "doc_id", "text").collect()
    assert len({(r.doc1, r.doc2) for r in uncapped}) == 10  # all C(5,2) pairs


def test_prefix_filter_jaccard_lossless_and_pruning(spark):
    """The prefix-filter theorem end-to-end: the PPJoin-style candidate set
    (a) loses NO pair of the unfiltered shared-shingle join at the 3/5
    threshold, and (b) is materially smaller than it — the whole point of
    the operator at 100 TB."""
    from wal_consumer_spark.operators.dedup import prefix_filtered_jaccard

    docs = load_table(spark, SF_ORACLE, "documents")
    full = {
        (r.doc1, r.doc2): r.n_common
        for r in shingle_pairs_jaccard(docs, "doc_id", "text")
        .filter(F.col("jaccard") >= 0.6)
        .collect()
    }
    pref = {
        (r.doc1, r.doc2): r.n_common
        for r in prefix_filtered_jaccard(docs, "doc_id", "text").collect()
    }
    assert full, "exact baseline unexpectedly empty"
    assert pref == full  # lossless: identical pairs AND intersection counts

    # pruning: candidate pairs before verification shrink vs the raw join.
    # Recompute both candidate sets structurally (prefix self-join vs any
    # shared shingle) to assert the reduction independent of verification.
    from wal_consumer_spark.functions.text import tokens, word_shingles

    sh = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(word_shingles(tokens(F.col("text")), 3)).alias("shingle"),
    ).distinct()
    raw_cand = (
        sh.alias("a").join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc"), F.col("b.doc")).distinct().count()
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window

    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc").orderBy(F.asc("df"), F.asc("shingle"))
            ),
        )
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc")))
    )
    prefix = ranked.filter(
        F.col("rk") <= F.col("n") - F.expr("((3 * n + 4) div 5)") + 1
    ).select("doc", "shingle")
    pref_cand = (
        prefix.alias("a").join(prefix.alias("b"), "shingle")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc"), F.col("b.doc")).distinct().count()
    )
    assert pref_cand >= len(pref)  # candidates cover every true pair
    assert raw_cand > 10 * pref_cand, (raw_cand, pref_cand)
