"""Unit tests for the stdlib-only media codecs (llm/codecs.py) and the
decoded-content paths of llm/multimodal.py (SURVEY §2B multimodal)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from gcp_etl_spark.llm import codecs


def _rand_img(h, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w,seed", [(1, 1, 0), (7, 3, 1), (24, 24, 2), (13, 31, 3)])
def test_png_roundtrip(h, w, seed):
    arr = _rand_img(h, w, seed)
    out = codecs.png_decode(codecs.png_encode(arr))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, arr)


def _png_with_filters(arr, ftypes):
    """Build a PNG applying the spec's FORWARD filters per scanline so
    the decoder's unfilter paths (Sub/Up/Average/Paeth) are exercised
    against independently-constructed input."""
    h, w = arr.shape[:2]
    ch = 3
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int64)
    raw = b""
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        ft = ftypes[y % len(ftypes)]
        filt = np.zeros(stride, dtype=np.int64)
        for i in range(stride):
            a = cur[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                pred = codecs._paeth(int(a), int(b), int(c))
            filt[i] = (cur[i] - pred) % 256
        raw += bytes([ft]) + filt.astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filter_types(ftypes):
    arr = _rand_img(10, 6, seed=42)
    data = _png_with_filters(arr, ftypes)
    assert np.array_equal(codecs.png_decode(data), arr)


def test_png_decode_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.png_decode(b"not a png at all" * 10)
    with pytest.raises(ValueError):
        codecs.png_decode(b"")


def test_wav_roundtrip():
    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32768, size=1234, dtype=np.int16)
    out, rate = codecs.wav_decode(codecs.wav_encode(samples, rate=16000))
    assert rate == 16000
    assert np.array_equal(out, samples)


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.wav_decode(b"RIFFgarbage")


def test_resize_nearest_index_map():
    arr = _rand_img(24, 24, seed=5)
    small = codecs.resize_nearest(arr, 12, 12)
    assert small.shape == (12, 12, 3)
    for y in range(12):
        for x in range(12):
            assert np.array_equal(small[y, x], arr[2 * y, 2 * x])
    # upscale also lands on exact source pixels
    big = codecs.resize_nearest(arr, 48, 48)
    assert np.array_equal(big[::2, ::2], arr)


def test_codec_media_features_decode_real_content(spark):
    """extract_features over synthesize_codec_media must take the REAL
    decode path (decoded=true) and reproduce the generator formulas."""
    from gcp_etl_spark.llm.multimodal import extract_features, synthesize_codec_media

    media = synthesize_codec_media(spark, n=8)
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(rows) == 8
    for mid, r in rows.items():
        assert r["decoded"] is True
        if mid % 2 == 0:  # PNG
            y, x, c = np.mgrid[0:24, 0:24, 0:3]
            px = (13 * mid + 7 * x + 11 * y + 17 * c) % 256
            assert r["sample_count"] == 24 * 24 * 3
            assert r["sample_sum"] == int(px.sum())
        else:  # WAV
            i = np.arange(2048)
            s = (37 * mid + 13 * i) % 4096 - 2048
            assert r["sample_count"] == 2048
            assert r["sample_sum"] == int(s.sum())
            assert r["sample_min"] == int(s.min())
            assert r["sample_max"] == int(s.max())


def test_opaque_media_falls_back_to_bytes(spark):
    """Payloads that parse as neither PNG nor WAV keep byte-level
    features with decoded=false — the no-codec fallback path."""
    from gcp_etl_spark.llm.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, n=4, payload_bytes=128)
    rows = extract_features(media).collect()
    assert len(rows) == 4
    assert all(r["decoded"] is False for r in rows)
    assert all(r["sample_count"] == 128 for r in rows)  # raw bytes


def test_resize_media_real_roundtrip(spark):
    """decode -> nearest resize -> re-encode -> decode must equal the
    direct numpy index map on the generator image."""
    from gcp_etl_spark.llm.multimodal import resize_media, synthesize_codec_media

    media = synthesize_codec_media(spark, n=4).filter("mime = 'image/png'")
    out = {r["media_id"]: r for r in resize_media(media, 12, 12).collect()}
    for mid, r in out.items():
        assert r["meta"]["resized"] == "real"
        got = codecs.png_decode(bytes(r["payload"]))
        y, x, c = np.mgrid[0:24, 0:24, 0:3]
        src = ((13 * mid + 7 * x + 11 * y + 17 * c) % 256).astype(np.uint8)
        assert np.array_equal(got, codecs.resize_nearest(src, 12, 12))


def test_audio_windows_over_decoded_pcm(spark):
    """window_samples on real WAV payloads: 4096-byte decoded stream
    -> 31 full 256 B windows at stride 128, exact integer sums."""
    from gcp_etl_spark.llm.multimodal import synthesize_codec_media, window_samples

    media = synthesize_codec_media(spark, n=4).filter("mime = 'audio/wav'")
    wins = window_samples(media, win_bytes=256, stride=128).collect()
    by_media = {}
    for r in wins:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {1, 3}
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r["win_idx"])
        assert len(rows) == 31
        assert all(r["n_win_bytes"] == 256 for r in rows)
        i = np.arange(2048)
        s = (37 * mid + 13 * i) % 4096 - 2048
        for r in rows:
            lo = 64 * r["win_idx"]
            assert r["sum_level"] == int(s[lo : lo + 128].sum())
