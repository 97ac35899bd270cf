"""Incremental MinHash-LSH dedup index (streaming/dedup_index.py): per-batch
outputs union to exactly the one-shot batch computation, replays are
append-free and output-identical, and the real streaming wiring detects
cross-batch duplicates as their later member arrives."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from wal_consumer_spark.operators.dedup import (
    minhash_candidates,
    minhash_jaccard_estimate,
    minhash_signature,
)
from wal_consumer_spark.streaming.dedup_index import StreamingMinHashIndex

_W = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
).split()


def _doc(i: int, tweak: str | None = None) -> str:
    # ~24-token deterministic word soup; near-dups share all but one token
    words = [_W[(i * 7 + j * 3) % len(_W)] for j in range(24)]
    if tweak is not None:
        words[-1] = tweak
    return " ".join(words)


#: three batches; near-dup pairs: (1,7) cross-batch, (5,6) within-batch,
#: (2,11) cross-batch, the rest unrelated
_BATCHES = [
    [(1, _doc(1)), (2, _doc(2)), (3, _doc(3)), (4, _doc(4))],
    [(5, _doc(5)), (6, _doc(5, "zulu")), (7, _doc(1, "yankee")), (8, _doc(8))],
    [(9, _doc(9)), (10, _doc(10)), (11, _doc(2, "xray")), (12, _doc(12))],
]
_EXPECTED = {(1, 7), (5, 6), (2, 11)}


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _batch_mode_pairs(spark):
    """One-shot computation over the full corpus — the equivalence oracle."""
    full = _df(spark, [r for b in _BATCHES for r in b])
    sigs = minhash_signature(full, "doc_id", "text")
    cand = minhash_candidates(sigs)
    est = minhash_jaccard_estimate(sigs, cand).filter(F.col("est_jaccard") >= 0.5)
    return {(r.doc1, r.doc2) for r in est.collect()}


def test_incremental_equals_batch_mode(spark, tmp_path):
    idx = StreamingMinHashIndex(spark, str(tmp_path / "idx"), threshold=0.5)
    got = set()
    for bid, rows in enumerate(_BATCHES):
        got |= {
            (r.doc1, r.doc2)
            for r in idx.process_batch(_df(spark, rows), bid).collect()
        }
    assert got == _batch_mode_pairs(spark)
    assert _EXPECTED <= got


def test_replay_is_append_free_and_output_identical(spark, tmp_path):
    idx = StreamingMinHashIndex(spark, str(tmp_path / "idx"), threshold=0.5)
    outs = []
    for bid, rows in enumerate(_BATCHES[:2]):
        outs.append(
            {(r.doc1, r.doc2) for r in idx.process_batch(_df(spark, rows), bid).collect()}
        )
    size_before = idx.index_size()
    replay = {
        (r.doc1, r.doc2)
        for r in idx.process_batch(_df(spark, _BATCHES[1]), 1).collect()
    }
    assert replay == outs[1]
    assert idx.index_size() == size_before


def test_streaming_wiring_detects_cross_batch_dups(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    for bid, rows in enumerate(_BATCHES):
        _df(spark, rows).coalesce(1).write.mode("append").parquet(docs_dir)
        time.sleep(1.1)  # distinct mod times -> stable oldest-first order

    idx = StreamingMinHashIndex(spark, str(tmp_path / "idx"), threshold=0.5)
    found: set[tuple[int, int]] = set()

    def _apply(batch_df, batch_id):
        found.update(
            (r.doc1, r.doc2)
            for r in idx.process_batch(batch_df, batch_id).collect()
        )

    q = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert found == _batch_mode_pairs(spark)
    assert _EXPECTED <= found


def test_partial_bucket_write_is_retried_not_skipped(spark, tmp_path):
    """Crash window: Spark creates the bucket dir before the write job
    completes, so the replay guard must key on the _SUCCESS marker — a
    bare (partial) dir has to be rewritten, or the batch's band-bucket
    rows stay incomplete forever and its near-dup pairs are never found."""
    import os

    idx = StreamingMinHashIndex(spark, str(tmp_path / "idx"), threshold=0.5)
    idx.process_batch(_df(spark, _BATCHES[0]), 0).collect()

    # simulate a crash mid-write of batch 1's buckets: dir without _SUCCESS
    partial = f"{idx.path}/buckets/b1"
    os.makedirs(partial)
    with open(f"{partial}/part-garbage.parquet", "wb") as f:
        f.write(b"not parquet")

    got = {
        (r.doc1, r.doc2)
        for r in idx.process_batch(_df(spark, _BATCHES[1]), 1).collect()
    }
    assert (1, 7) in got and (5, 6) in got  # batch 1's pairs fully detected
    assert os.path.exists(f"{partial}/_SUCCESS")  # rewrite actually committed
