"""Incrementally-maintained MinHash-LSH dedup index: new documents dedupe
against the ENTIRE accumulated corpus without rescanning it.

The batch dedup operators (operators/dedup.py) recompute signatures and
bucket self-joins over the whole corpus — right for one-shot curation,
wrong for a feed of new documents at 100 TB. This module keeps the LSH
state (signatures + band buckets) as an append-only keyed table; each
micro-batch then costs O(|batch| + |candidate pairs|):

1. signatures + band buckets are computed for the batch only (map-side);
2. the batch's buckets equi-join the persisted bucket table — at scale that
   table is written partitioned/bucketed by the band key, so the join reads
   only the buckets the batch touches (same pruning story as
   BucketedParquetKeyValueTarget);
3. candidates are verified by signature agreement (estimated Jaccard);
4. the batch's rows are appended under a per-batch directory — replays of a
   batch_id are detected and skip the append (same at-least-once discipline
   as the CDC path, R10/R11), and the returned pair set is identical on
   replay (the join is deterministic).

Detection semantics: a near-dup pair is reported by the batch that
completes it (its later member's batch). The union of per-batch outputs
equals the one-shot batch computation over the full corpus (asserted in
tests/test_dedup_index.py). The `max_bucket` skew cap is evaluated at
detection time against the index as of that batch.

Reference parity note: the reference (sahabpardaz/wal-consumer) has no
dedup at all — this is extension surface (SURVEY.md §2.B), built on the
same incremental, checkpoint-replay-safe discipline as its consumer
(WalConsumer.java:127-182).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wal_consumer_spark.operators.dedup import (
    lsh_band_key,
    minhash_jaccard_estimate,
    minhash_signature,
)

_SIG_SCHEMA = "doc LONG, sig ARRAY<LONG>"
_BUCKET_SCHEMA = "doc LONG, band INT, bucket LONG"


def minhash_buckets(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(doc, band, bucket) rows via the shared band-bucket key
    (operators/dedup.py::lsh_band_key — single source of truth, so the
    index stays bit-identical to the batch dedup path)."""
    return sigs.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: lsh_band_key(b, rows_per_band),
            )
        ).alias("band", "bucket"),
    )


class StreamingMinHashIndex:
    """The foreachBatch-side state machine. Wire into a stream with

        index = StreamingMinHashIndex(spark, path)
        stream.writeStream.foreachBatch(
            lambda df, bid: sink(index.process_batch(df, bid))
        )
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        num_perm: int = 32,
        bands: int = 4,
        rows_per_band: int = 8,
        k: int = 3,
        seed: int = 7,
        threshold: float = 0.5,
        max_bucket: int = 500,
    ):
        self.spark = spark
        self.path = path
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.k = k
        self.seed = seed
        self.threshold = threshold
        self.max_bucket = max_bucket

    def _read(self, sub: str, schema: str) -> DataFrame:
        base = f"{self.path}/{sub}"
        try:
            return self.spark.read.schema(schema).option(
                "recursiveFileLookup", "true"
            ).parquet(base)
        except Exception:
            return self.spark.createDataFrame([], schema)

    def index_size(self) -> int:
        """Number of (doc, band) rows currently indexed."""
        return self._read("buckets", _BUCKET_SCHEMA).count()

    def process_batch(
        self,
        batch_df: DataFrame,
        batch_id: int,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Index the batch and return its near-dup pairs (doc1 < doc2,
        est_jaccard >= threshold) against everything indexed so far,
        including within-batch pairs."""
        sig_dir = f"{self.path}/sigs/b{batch_id}"
        bucket_dir = f"{self.path}/buckets/b{batch_id}"
        # Replay guard keyed on the _SUCCESS marker of the LAST write, not
        # the dir's existence: Spark creates the dir before the job
        # finishes, so a crash mid-write would otherwise make the replay
        # skip the append and leave the batch's bucket rows partial forever.
        # Both writes are mode("overwrite"), so re-running after a partial
        # attempt is safe; buckets are derived from the PERSISTED signature
        # parquet so the expensive signature pipeline runs once per batch
        # (not once per output) and the bucket table provably matches the
        # stored signatures.
        if not os.path.exists(os.path.join(bucket_dir, "_SUCCESS")):
            minhash_signature(
                batch_df, id_col, text_col, num_perm=self.num_perm, k=self.k,
                seed=self.seed,
            ).write.mode("overwrite").parquet(sig_dir)
            minhash_buckets(
                self._read(f"sigs/b{batch_id}", _SIG_SCHEMA),
                self.bands,
                self.rows_per_band,
            ).write.mode("overwrite").parquet(bucket_dir)

        hist_b = self._read("buckets", _BUCKET_SCHEMA)
        # skew cap at detection time: over-full buckets carry no signal
        hist_b = (
            hist_b.withColumn(
                "__n", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
            )
            .filter(F.col("__n") <= self.max_bucket)
            .drop("__n")
        )
        batch_b = self._read(f"buckets/b{batch_id}", _BUCKET_SCHEMA)
        cand = (
            batch_b.select(F.col("doc").alias("__new"), "band", "bucket")
            .join(hist_b.select(F.col("doc").alias("__old"), "band", "bucket"),
                  ["band", "bucket"])
            .filter(F.col("__old") != F.col("__new"))
            .select(
                F.least("__old", "__new").alias("doc1"),
                F.greatest("__old", "__new").alias("doc2"),
            )
            .distinct()
        )
        all_sigs = self._read("sigs", _SIG_SCHEMA)
        return minhash_jaccard_estimate(all_sigs, cand).filter(
            F.col("est_jaccard") >= self.threshold
        )
