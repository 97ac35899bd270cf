"""Multimodal column support (SURVEY.md §2.B "multimodal columns"):
image/audio/video as opaque BinaryType payloads plus a typed metadata
struct — generalizing the reference's `entity_bytes` opaque payload
(WalEntity.java:38-39) to media.

The decode step is STUBBED (this container has no PIL/ffmpeg): a
deterministic fake derives pseudo-metadata from the bytes so the Spark-side
plumbing — schema, Arrow batching, mapInPandas partitioning — is real and
testable end-to-end. Swap `_fake_decode` for a real decoder in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media row: opaque payload + typed metadata (mirrors WAL envelope design)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta_source", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    MEDIA_SCHEMA.fields
    + [
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def attach_media_columns(df: DataFrame, id_col: str, text_col: str, source_col: str) -> DataFrame:
    """Build a media table from any table with an id and a payload-ish column
    (tests use documents.text utf-8 bytes as the opaque payload)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.col(source_col).alias("meta_source"),
    )


def _fake_decode(payload: bytes | None, kind: str) -> tuple[int, int, int, int]:
    """Deterministic pseudo-decode: metadata derived arithmetically from the
    byte length, so an SQL oracle can replay it. Real decode would raise
    NotImplementedError (no PIL/librosa/ffmpeg in this environment)."""
    n = len(payload) if payload is not None else 0
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    n_frames = 1 if kind == "image" else 1 + n % 30
    return n, width, height, n_frames


def real_decode(payload: bytes, kind: str):  # pragma: no cover - stub
    """Marked stub: the real decoder (PIL for image, soundfile/librosa for
    audio, ffmpeg frame sampling for video) is unavailable in this container."""
    raise NotImplementedError(
        "media decode requires PIL/librosa/ffmpeg, not present in this environment; "
        "use the deterministic _fake_decode path (decode_media(df, fake=True))"
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 4, frame_len: int = 8) -> DataFrame:
    """Frame sampling for video payloads: one output row per kept frame —
    the 1-to-N mapInPandas batch shape a real ffmpeg sampler would use.
    Frame extraction is stubbed deterministically (frame i = an 8-byte slice
    of the payload at offset i*frame_len) so a SQL oracle can replay it;
    input must be decode_media() output (needs n_frames/kind)."""
    from wal_consumer_spark.session import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, kind, payload, n_frames in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["n_frames"]
            ):
                if kind != "video":
                    continue
                data = bytes(payload) if payload is not None else b""
                for i in range(0, int(n_frames), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(data[i * frame_len:(i + 1) * frame_len])
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_bytes": pd.array(frames, dtype=object),
                }
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


def resize_media(df: DataFrame, max_w: int = 32, max_h: int = 32) -> DataFrame:
    """Resize planning on decoded metadata — pure JVM arithmetic (the actual
    pixel resample is the stubbed codec's job; the engine's work is the
    metadata/plumbing, which composes with decode_media as a column op)."""
    scale = F.least(
        F.lit(1.0),
        F.least(F.lit(max_w) / F.col("width"), F.lit(max_h) / F.col("height")),
    )
    return df.withColumns(
        {
            "out_width": F.floor(F.col("width") * scale).cast("int"),
            "out_height": F.floor(F.col("height") * scale).cast("int"),
        }
    )


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode over mapInPandas: the real-scale shape — batches
    of binary payloads per partition, no per-row Python call overhead."""
    from wal_consumer_spark.session import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                _fake_decode(p, k) if fake else real_decode(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pdf.copy()
            out["n_bytes"] = [d[0] for d in decoded]
            out["width"] = pd.array([d[1] for d in decoded], dtype="int32")
            out["height"] = pd.array([d[2] for d in decoded], dtype="int32")
            out["n_frames"] = pd.array([d[3] for d in decoded], dtype="int32")
            yield out

    return df.mapInPandas(batches, DECODED_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sum_bytes", LongType(), True),
        StructField("n_distinct_bytes", IntegerType(), True),
        StructField("mean_byte_x100", LongType(), True),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads: numpy-vectorized byte stats
    per media row (length, byte sum, distinct bytes, scaled mean) through
    Arrow-batched mapInPandas — the exact shape a real embedding extractor
    takes (payload bytes in, fixed-width feature row out), with the model
    replaced by deterministic byte arithmetic so a SQL oracle can replay it.
    numpy sees each batch as one zero-copy uint8 view per payload; no
    per-row Python loops over bytes."""
    import numpy as np

    from wal_consumer_spark.session import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, kinds, nb, sb, nd, mb = [], [], [], [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                a = np.frombuffer(
                    bytes(payload) if payload is not None else b"", dtype=np.uint8
                )
                n = int(a.size)
                s = int(a.sum()) if n else 0
                ids.append(mid)
                kinds.append(kind)
                nb.append(n)
                sb.append(s)
                nd.append(int(np.unique(a).size) if n else 0)
                mb.append((s * 100) // n if n else 0)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "kind": kinds,
                    "n_bytes": pd.array(nb, dtype="int64"),
                    "sum_bytes": pd.array(sb, dtype="int64"),
                    "n_distinct_bytes": pd.array(nd, dtype="int32"),
                    "mean_byte_x100": pd.array(mb, dtype="int64"),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)
