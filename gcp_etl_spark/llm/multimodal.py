"""Multimodal column handling: binary payloads + typed metadata,
with REAL stdlib-only codecs for PNG and WAV.

Design (SURVEY.md §2B "multimodal columns"): media lives in a
``binary`` column beside typed metadata (mime, width, …); decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so each task
processes a bounded batch of blobs without ever collecting to the
driver. The container has no media libraries, but two real formats
are decodable with the standard library alone — PNG (zlib + struct)
and 16-bit PCM WAV (``wave``) — implemented in ``llm.codecs``; every
operator here first tries the real decode and falls back to
byte-level features only for payloads in formats it cannot parse
(the honest behavior for arbitrary crawl data, where a JPEG/MP3
would need an external codec).

Scale notes: blobs make rows wide — cap
``spark.sql.files.maxPartitionBytes`` / ``maxRecordsPerBatch`` so an
Arrow batch of blobs fits executor memory; store media in its own
parquet column so metadata-only queries never read the bytes (column
pruning); decode runs INSIDE the scan (mapInPandas pipelines with
it), so pixels/samples never shuffle — only the extracted features
do.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gcp_etl_spark.llm import codecs

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# deterministic generator constants — mirrored literally in the DuckDB
# oracles of the multimodal_* queries (queries/llm_ops.py), so the
# decoded content is cross-engine hash-verifiable
IMG_W, IMG_H = 24, 24
WAV_N, WAV_RATE = 2048, 8000


def _gen_image(media_id: int) -> bytes:
    """pixel[y, x, c] = (13*id + 7*x + 11*y + 17*c) % 256 — integer
    arithmetic only, so an oracle can recompute every pixel."""
    import numpy as np

    y = np.arange(IMG_H).reshape(-1, 1, 1)
    x = np.arange(IMG_W).reshape(1, -1, 1)
    c = np.arange(3).reshape(1, 1, -1)
    arr = ((13 * media_id + 7 * x + 11 * y + 17 * c) % 256).astype(np.uint8)
    return codecs.png_encode(arr)


def _gen_audio(media_id: int) -> bytes:
    """sample[i] = ((37*id + 13*i) % 4096) - 2048 — int16-safe and
    exactly recomputable in SQL."""
    import numpy as np

    i = np.arange(WAV_N)
    samples = ((37 * media_id + 13 * i) % 4096 - 2048).astype("<i2")
    return codecs.wav_encode(samples, rate=WAV_RATE)


def read_binary_dir(spark: SparkSession, path: str) -> DataFrame:
    """Ingest a directory of media files as (path, modificationTime,
    length, content) — Spark's built-in binaryFile source."""
    return spark.read.format("binaryFile").load(path)


def synthesize_media(spark: SparkSession, n: int = 64, payload_bytes: int = 1024) -> DataFrame:
    """Deterministic OPAQUE media table (repeating byte pattern keyed
    by id) — payloads that parse as neither PNG nor WAV, exercising
    the operators' fallback path and the binary-dedup plan, where
    only digests may reach the shuffle."""
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


def synthesize_codec_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic REAL media table: even ids carry an actual PNG
    (24×24 RGB, integer-formula pixels), odd ids an actual 16-bit PCM
    WAV (2048-sample integer-formula signal). Generated inside
    mapInPandas so encoding distributes with the id range — no
    driver-side blob loop."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "mime": [
                        "image/png" if i % 2 == 0 else "audio/wav" for i in ids
                    ],
                    "payload": [
                        _gen_image(i) if i % 2 == 0 else _gen_audio(i)
                        for i in ids
                    ],
                    "meta": [
                        {"src": f"synth-codec://{i}"} for i in ids
                    ],
                }
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


FEATURE_SCHEMA = (
    "media_id long, mime string, n_bytes long, decoded boolean,"
    " sample_count long, sample_sum long, sample_min long,"
    " sample_max long, byte_entropy double, feature array<float>"
)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    Tries the REAL decode first (PNG pixels / WAV samples via
    ``llm.codecs``); features are then computed over decoded content:
    ``sample_count``/``sample_sum`` are exact integer aggregates of
    the pixel/sample values (oracle-mirrorable), ``byte_entropy`` and
    the 8-bin histogram ``feature`` are computed over the decoded
    value distribution. Payloads that parse as neither format get
    byte-level features with ``decoded = false`` — the fallback for
    formats that would need external codec libs (JPEG/MP3/MP4).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                "decoded": [],
                "sample_count": [],
                "sample_sum": [],
                "sample_min": [],
                "sample_max": [],
                "byte_entropy": [],
                "feature": [],
            }
            for b in pdf["payload"]:
                vals, decoded = _decode_values(b)
                if vals is None or vals.size == 0:
                    out["decoded"].append(bool(decoded))
                    out["sample_count"].append(0)
                    out["sample_sum"].append(0)
                    out["sample_min"].append(0)
                    out["sample_max"].append(0)
                    out["byte_entropy"].append(0.0)
                    out["feature"].append(np.zeros(8, dtype="float32"))
                    continue
                # 8-bin histogram over the decoded value range
                lo, hi = (-2048, 2048) if vals.dtype == np.int16 else (0, 256)
                bins = ((vals.astype(np.int64) - lo) * 8) // (hi - lo)
                hist = np.bincount(bins.clip(0, 7), minlength=8).astype("float64")
                p = hist / hist.sum()
                nz = p[p > 0]
                out["decoded"].append(bool(decoded))
                out["sample_count"].append(int(vals.size))
                out["sample_sum"].append(int(vals.astype(np.int64).sum()))
                out["sample_min"].append(int(vals.min()))
                out["sample_max"].append(int(vals.max()))
                out["byte_entropy"].append(float(-(nz * np.log2(nz)).sum()))
                out["feature"].append(p.astype("float32"))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def _decode_values(b):
    """payload → (flat value array, decoded?) — PNG pixels as uint8,
    WAV samples as int16, else raw bytes as uint8 with decoded=False."""
    import numpy as np

    if not b:
        return None, False
    try:
        return codecs.png_decode(bytes(b)).ravel(), True
    except ValueError:
        pass
    try:
        samples, _rate = codecs.wav_decode(bytes(b))
        return samples.ravel(), True
    except ValueError:
        pass
    return np.frombuffer(bytes(b), dtype=np.uint8), False


FRAME_SCHEMA = "media_id long, frame_idx int, n_frame_bytes long, frame_crc long"


def sample_frames(
    df: DataFrame, frame_bytes: int = 256, every_k: int = 4
) -> DataFrame:
    """Frame sampling (one input row -> N output rows): keep every
    k-th fixed-size frame. For decodable payloads the frames are cut
    from the DECODED buffer (PNG pixel rows / WAV PCM stream); opaque
    payloads fall back to raw byte blocks (a real video demux would
    need an external container parser). The plumbing — row explosion
    inside bounded Arrow batches, per-frame checksums, downstream
    joinability — is identical either way. At 100 TB sample BEFORE
    any transcode so only 1/k of the frames ever leave the scan."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "n_frame_bytes": [], "frame_crc": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                vals, decoded = _decode_values(b)
                buf = vals.tobytes() if decoded and vals is not None else (
                    bytes(b) if b else b""
                )
                if not buf:
                    continue
                n_frames = (len(buf) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_k):
                    fr = buf[i * frame_bytes : (i + 1) * frame_bytes]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["n_frame_bytes"].append(len(fr))
                    out["frame_crc"].append(zlib.crc32(fr))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FRAME_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize: decode PNG payloads, nearest-neighbor
    resample to (width, height), re-encode as PNG, and stamp the new
    geometry into ``meta`` (``resized = real``). Non-PNG payloads pass
    through unchanged with ``resized = skipped`` — resizing audio
    makes no sense and opaque formats would need external codecs.
    Runs as mapInPandas so pixels never leave the task."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for b, m in zip(pdf["payload"], pdf["meta"]):
                meta = dict(m) if m is not None else {}
                try:
                    arr = codecs.png_decode(bytes(b)) if b else None
                except ValueError:
                    arr = None
                if arr is not None and arr.shape[2] == 3:
                    small = codecs.resize_nearest(arr, width, height)
                    payloads.append(codecs.png_encode(small))
                    meta["target_size"] = f"{width}x{height}"
                    meta["resized"] = "real"
                else:
                    payloads.append(b)
                    meta["target_size"] = f"{width}x{height}"
                    meta["resized"] = "skipped"
                metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return df.mapInPandas(batches, MEDIA_SCHEMA)


WINDOW_SCHEMA = (
    "media_id long, win_idx int, n_win_bytes long, mean_level double,"
    " sum_level long, win_crc long"
)


def window_samples(
    df: DataFrame, win_bytes: int = 256, stride: int = 128
) -> DataFrame:
    """Overlapping sample windows over an audio payload (the binary
    counterpart of text chunking): windows of ``win_bytes`` advancing
    ``stride`` (50% overlap by default) over the DECODED buffer — for
    WAV payloads that is the int16 PCM stream (2 bytes/sample), so
    ``mean_level``/``sum_level`` are statistics of real audio
    amplitudes; opaque payloads fall back to raw uint8 bytes.
    ``sum_level`` is an exact integer so window algebra is
    oracle-mirrorable. At 100 TB the windowing runs inside the scan
    (mapInPandas pipelines with it), so samples never shuffle
    pre-aggregation."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        import numpy as np

        for pdf in it:
            out = {
                "media_id": [], "win_idx": [], "n_win_bytes": [],
                "mean_level": [], "sum_level": [], "win_crc": [],
            }
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                vals, decoded = _decode_values(b)
                if vals is None or vals.size == 0:
                    continue
                buf = vals.tobytes()
                n = len(buf)
                n_wins = 1 if n <= win_bytes else (
                    (n - win_bytes + stride - 1) // stride + 1
                )
                for i in range(n_wins):
                    w = buf[i * stride : i * stride + win_bytes]
                    arr = np.frombuffer(w, dtype=vals.dtype)
                    out["media_id"].append(mid)
                    out["win_idx"].append(i)
                    out["n_win_bytes"].append(len(w))
                    out["mean_level"].append(float(arr.mean()))
                    out["sum_level"].append(int(arr.astype(np.int64).sum()))
                    out["win_crc"].append(zlib.crc32(w))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, WINDOW_SCHEMA)


HIST_SCHEMA = "media_id long, bin int, n long"


def pixel_histogram(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Per-image pixel-value HISTOGRAM (uniform bins over [0, 256)):
    decode each PNG inside mapInPandas and emit only ``n_bins`` count
    rows per image — the brightness/exposure profile used for
    corpus-level quality screens (all-black/all-white/low-dynamic-range
    detection) without any pixel ever leaving the task.

    numpy ``bincount`` over ``value >> shift`` per batch; undecodable
    payloads yield no rows (callers LEFT JOIN if they need presence)."""
    import numpy as np
    import pandas as pd

    # (value * n_bins) >> 8 gives UNIFORM bucket widths for ANY n_bins
    # (r5 ADVICE — the previous shift+clamp made the last bin a
    # catch-all for non-power-of-two widths); for power-of-two n_bins
    # it is bit-identical to the old value >> (8 - log2(n_bins))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gcp_etl_spark.llm import codecs

        for pdf in it:
            ids: list[int] = []
            bins: list[int] = []
            cnts: list[int] = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                try:
                    vals = codecs.png_decode(bytes(b)).ravel()
                except Exception:  # noqa: BLE001 - skip undecodable payloads
                    continue
                counts = np.bincount(
                    (vals.astype(np.int32) * n_bins) >> 8, minlength=n_bins
                )
                for bi in range(n_bins):
                    ids.append(int(mid))
                    bins.append(bi)
                    cnts.append(int(counts[bi]))
            yield pd.DataFrame({"media_id": ids, "bin": bins, "n": cnts})

    return df.mapInPandas(batches, HIST_SCHEMA)


def augment_media(
    df: DataFrame,
    crop: int = 16,
    offset: int = 4,
    flip_mod: int = 4,
) -> DataFrame:
    """DETERMINISTIC train-time image augmentation: center-ish crop to
    ``crop``×``crop`` at ``(offset, offset)``, plus a horizontal flip
    for media ids ≡ 0 (mod ``flip_mod``) — the id-keyed determinism
    that makes augmented corpora reproducible across re-runs (the same
    contract as every content-keyed draw in this engine). Decode →
    transform → RE-ENCODE inside mapInPandas; pixels never leave the
    task. Non-PNG payloads pass through with ``augmented = skipped``.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads, metas = [], []
            for mid, b, m in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                meta = dict(m) if m is not None else {}
                try:
                    arr = codecs.png_decode(bytes(b)) if b else None
                except ValueError:
                    arr = None
                if arr is not None and arr.shape[2] == 3:
                    a2 = arr[
                        offset : offset + crop, offset : offset + crop, :
                    ]
                    flipped = int(mid) % flip_mod == 0
                    if flipped:
                        a2 = a2[:, ::-1, :]
                    payloads.append(codecs.png_encode(np.ascontiguousarray(a2)))
                    meta["augmented"] = "flip+crop" if flipped else "crop"
                else:
                    payloads.append(b)
                    meta["augmented"] = "skipped"
                metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return df.mapInPandas(batches, MEDIA_SCHEMA)


def synthesize_neardup_images(spark: SparkSession, n_pairs: int = 24) -> DataFrame:
    """Deterministic NEAR-DUPLICATE image corpus for the perceptual-
    hash dedup family: media ids 2s / 2s+1 share the pixel-formula
    seed s, and the odd id adds +40 (pre-mod) to every channel of the
    sparse pixel lattice (x+y) ≡ 0 (mod 5) — a ~20%-of-pixels
    brightness nudge measured to flip 2-6 of the 64 average-hash bits
    (the near-dup case) while different seeds land hamming ≥ 1 with a
    long tail. pixel = (13·s + 7x + 11y + 17c + nudge) % 256,
    mirrored literally in the multimodal_phash_dedup oracle. Real PNG
    encode inside mapInPandas — the payloads are genuine codec
    round-trips, not arrays."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids = [int(i) for i in pdf["id"]]
            payloads = []
            for i in ids:
                s, noisy = i // 2, i % 2
                y = np.arange(IMG_H).reshape(-1, 1, 1)
                x = np.arange(IMG_W).reshape(1, -1, 1)
                c = np.arange(3).reshape(1, 1, -1)
                nudge = noisy * 40 * (((x + y) % 5) == 0).astype(np.int64)
                arr = (
                    (13 * s + 7 * x + 11 * y + 17 * c + nudge) % 256
                ).astype(np.uint8)
                payloads.append(codecs.png_encode(arr))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "mime": ["image/png"] * len(ids),
                    "payload": payloads,
                    "meta": [{"seed": str(i // 2)} for i in ids],
                }
            )

    return spark.range(2 * n_pairs).mapInPandas(gen, MEDIA_SCHEMA)


AHASH_SCHEMA = "media_id long, hash_lo long, hash_hi long"


def average_hash(df: DataFrame, block: int = 3) -> DataFrame:
    """64-bit AVERAGE HASH (aHash) of each PNG payload, INTEGER-EXACT:
    grayscale = channel SUM (no division), 8×8 grid of ``block``²-pixel
    block sums, bit(by,bx) = [blocksum · 64 > total] — every compare is
    integer, so a SQL oracle can replay the hash from the pixel
    formula bit for bit. Returned as two 32-bit halves in longs
    (hash_lo = bits 0..31, hash_hi = bits 32..63) so downstream xor /
    bit_count / band extraction never touches the int64 sign bit.

    Decode and hashing stay inside mapInPandas — pixels never shuffle;
    only the 3-long hash row leaves the scan task (the multimodal
    family contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out_id, out_lo, out_hi = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                try:
                    arr = codecs.png_decode(bytes(b)) if b else None
                except ValueError:
                    arr = None
                if arr is None:
                    continue
                g = arr.astype(np.int64).sum(axis=2)
                h8, w8 = g.shape[0] // block, g.shape[1] // block
                blocks = g[: h8 * block, : w8 * block].reshape(
                    h8, block, w8, block
                ).sum(axis=(1, 3))
                total = int(blocks.sum())
                bits = (blocks.astype(object) * (h8 * w8) > total)
                lo = hi = 0
                for by in range(h8):
                    for bx in range(w8):
                        if bits[by, bx]:
                            bit = 8 * by + bx
                            if bit < 32:
                                lo |= 1 << bit
                            else:
                                hi |= 1 << (bit - 32)
                out_id.append(int(mid))
                out_lo.append(lo)
                out_hi.append(hi)
            yield pd.DataFrame(
                {
                    "media_id": out_id,
                    "hash_lo": out_lo,
                    "hash_hi": out_hi,
                }
            )

    return df.mapInPandas(batches, AHASH_SCHEMA)
