"""Multimodal column handling: opaque binary payloads + typed metadata.

Design (SURVEY.md §2B "multimodal columns"): media lives in a
``binary`` column beside typed metadata (mime, width, …); decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so each task
processes a bounded batch of blobs without ever collecting to the
driver. The actual codecs (PIL/librosa/av) are NOT in this container
(environment constraint) — the decode step is stubbed behind
``_HAS_CODECS``; everything Spark-side (schema, batching, partition
sizing) is real and tested.

Scale notes: blobs make rows wide — cap
``spark.sql.files.maxPartitionBytes`` / use ``maxRecordsPerBatch`` so
an Arrow batch of blobs fits executor memory; store media in its own
column family (parquet column) so metadata-only queries never read the
bytes (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - codecs absent in this container by design
    import PIL.Image  # noqa: F401

    _HAS_CODECS = True
except Exception:
    _HAS_CODECS = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def read_binary_dir(spark: SparkSession, path: str) -> DataFrame:
    """Ingest a directory of media files as (path, modificationTime,
    length, content) — Spark's built-in binaryFile source."""
    return spark.read.format("binaryFile").load(path)


def synthesize_media(spark: SparkSession, n: int = 64, payload_bytes: int = 1024) -> DataFrame:
    """Deterministic fake media table for plumbing tests (no codecs in
    the container): payload = repeating byte pattern keyed by id."""
    rows = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 2 == 0, "image/png").otherwise("audio/wav").alias("mime"),
        F.encode(
            F.rpad(F.conv(F.col("id").cast("string"), 10, 16), payload_bytes, "ab"),
            "utf-8",
        ).alias("payload"),
        F.create_map(F.lit("src"), F.concat(F.lit("synth://"), F.col("id"))).alias("meta"),
    )
    return rows


FEATURE_SCHEMA = (
    "media_id long, mime string, n_bytes long, byte_entropy double, feature array<float>"
)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    Real decode (image resize / audio frames) requires codec libs →
    stubbed: with codecs absent we emit deterministic byte-level
    features (size, entropy, 8-dim byte histogram) so the full
    mapInPandas pipeline — schema, batching, downstream joins — is
    exercised for real.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            if _HAS_CODECS:  # pragma: no cover
                raise NotImplementedError(
                    "real codec path not available in this container"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: 0 if b is None else len(b))
            ent, feats = [], []
            for b in payloads:
                if not b:
                    ent.append(0.0)
                    feats.append(np.zeros(8, dtype="float32"))
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr >> 5, minlength=8).astype("float64")
                p = hist / hist.sum()
                nz = p[p > 0]
                ent.append(float(-(nz * np.log2(nz)).sum()))
                feats.append((hist / hist.sum()).astype("float32"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n_bytes,
                    "byte_entropy": ent,
                    "feature": feats,
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, n_frame_bytes long, frame_crc long"


def sample_frames(
    df: DataFrame, frame_bytes: int = 256, every_k: int = 4
) -> DataFrame:
    """Frame sampling (one input row -> N output rows): keep every
    k-th fixed-size frame of the payload. Real video demux needs a
    codec lib (absent here — guarded like extract_features); the
    deterministic fallback treats the payload as a sequence of
    ``frame_bytes`` blocks, which keeps the real plumbing — row
    explosion inside bounded Arrow batches, per-frame checksums,
    downstream joinability — fully exercised. At 100 TB sample BEFORE
    any decode so only 1/k of the bytes ever leave the scan."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in it:
            if _HAS_CODECS:  # pragma: no cover
                raise NotImplementedError(
                    "real demux path not available in this container"
                )
            out = {"media_id": [], "frame_idx": [], "n_frame_bytes": [], "frame_crc": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if not b:
                    continue
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_k):
                    fr = b[i * frame_bytes : (i + 1) * frame_bytes]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["n_frame_bytes"].append(len(fr))
                    out["frame_crc"].append(zlib.crc32(fr))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FRAME_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: records the target geometry in metadata and
    (with codecs present) would re-encode the payload. Codec path
    stubbed (``NotImplementedError``); the metadata/schema flow is
    real so downstream stages can be built and tested against it."""
    if _HAS_CODECS:  # pragma: no cover
        raise NotImplementedError(
            "real resize path not available in this container"
        )
    return df.withColumn(
        "meta",
        F.map_concat(
            "meta",
            F.create_map(
                F.lit("target_size"), F.lit(f"{width}x{height}"),
                F.lit("resized"), F.lit("stub"),
            ),
        ),
    )


WINDOW_SCHEMA = (
    "media_id long, win_idx int, n_win_bytes long, mean_level double,"
    " win_crc long"
)


def window_samples(
    df: DataFrame, win_bytes: int = 256, stride: int = 128
) -> DataFrame:
    """Overlapping sample windows over an audio-style payload (the
    binary counterpart of text chunking): windows of ``win_bytes``
    advancing ``stride`` (50% overlap by default), per-window mean
    level + CRC. Real PCM decode needs codec libs (absent — guarded
    like extract_features); treating the payload as raw 8-bit samples
    keeps the actual plumbing — 1->N row fan-out inside bounded Arrow
    batches, per-window features, downstream joins — fully real.
    At 100 TB the windowing runs inside the scan (mapInPandas
    pipelines with it), so bytes never shuffle pre-aggregation."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        import numpy as np

        for pdf in it:
            if _HAS_CODECS:  # pragma: no cover
                raise NotImplementedError(
                    "real audio decode not available in this container"
                )
            out = {
                "media_id": [], "win_idx": [], "n_win_bytes": [],
                "mean_level": [], "win_crc": [],
            }
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if not b:
                    continue
                n = len(b)
                n_wins = 1 if n <= win_bytes else (
                    (n - win_bytes + stride - 1) // stride + 1
                )
                for i in range(n_wins):
                    w = b[i * stride : i * stride + win_bytes]
                    arr = np.frombuffer(w, dtype=np.uint8)
                    out["media_id"].append(mid)
                    out["win_idx"].append(i)
                    out["n_win_bytes"].append(len(w))
                    out["mean_level"].append(float(arr.mean()))
                    out["win_crc"].append(zlib.crc32(w))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, WINDOW_SCHEMA)
