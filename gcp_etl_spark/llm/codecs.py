"""Dependency-free media codecs: PNG (zlib + struct) and WAV PCM (wave).

The container has no media libraries (PIL/librosa/av), but two real
formats are decodable with the standard library alone:

- **PNG**: chunked container (IHDR/IDAT/IEND), zlib-compressed
  scanlines with per-row filter bytes (spec: RFC 2083 / W3C PNG).
  The encoder emits 8-bit RGB (color type 2) with filter 0; the
  decoder handles color types 0/2/6 (gray / RGB / RGBA) at bit depth
  8, non-interlaced, and all five scanline filters (None, Sub, Up,
  Average, Paeth) so externally-produced PNGs decode too.
- **WAV**: RIFF PCM via the stdlib ``wave`` module (16-bit mono here).

These are REAL decodes — bytes in, pixel/sample arrays out — used by
``llm.multimodal`` so the multimodal operators transform decoded
content, not container bytes. Kept separate from the Spark layer so
they are unit-testable without a session.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def png_encode(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a real PNG byte stream
    (8-bit color type 2, filter 0 per scanline, one IDAT chunk)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("png_encode expects (h, w, 3) uint8")
    h, w = arr.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, compress_level))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG (color type 0/2/6) to an
    (h, w, channels) uint8 array. Raises ValueError on anything that
    is not such a PNG — callers use try/except as the format probe."""
    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ValueError("not a PNG signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth} ctype={ctype})")
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("bad scanline payload size")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a left scan
            cur = line
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                if ftype == 1:
                    cur[i] = (int(line[i]) + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (int(line[i]) + (a + b) // 2) & 0xFF
                else:
                    c = int(prev[i - ch]) if i >= ch else 0
                    cur[i] = (int(line[i]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def wav_encode(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode a 1-D int16 array as 16-bit mono PCM WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV bytes → (samples int16 [n] or [n, channels],
    sample_rate). Raises on non-WAV input (wave.Error/EOFError →
    normalized to ValueError for uniform probing)."""
    try:
        with wave.open(io.BytesIO(data), "rb") as wv:
            rate = wv.getframerate()
            nch = wv.getnchannels()
            width = wv.getsampwidth()
            raw = wv.readframes(wv.getnframes())
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"not a PCM WAV: {exc}") from exc
    if width != 2:
        raise ValueError(f"unsupported sample width {width}")
    arr = np.frombuffer(raw, dtype="<i2")
    if nch > 1:
        arr = arr.reshape(-1, nch)
    return arr, rate


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, c) array: destination
    pixel (y, x) samples source (floor(y*h/height), floor(x*w/width))
    — the classic index map, exactly mirrorable in SQL."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]
