"""Pure-numpy/stdlib media codecs: 24-bit BMP and 16-bit PCM WAV.

The container has no image/audio codec libraries (Pillow, opencv, soundfile),
so round 1 stubbed every decode behind NotImplementedError. BMP and WAV,
however, are *container formats with no compression* — header parsing plus a
numpy reshape — so they are implemented for real here and the stubs now cover
only genuinely codec-requiring formats (JPEG/PNG/MP3/...).

These are the engine's reference decode path: the multimodal catalog queries
synthesize valid BMP/WAV payloads from a closed-form pixel/sample pattern,
decode them byte-for-real on the Spark side, and are verified against a
DuckDB oracle that recomputes the same statistics from the closed form alone
— any header/stride/channel-order bug mismatches the oracle.

Scale note: encode/decode run inside Arrow-batched mapInPandas stages
(operators/multimodal.py), one Python worker per partition, zero shuffle;
payload bytes never cross a shuffle boundary.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

__all__ = [
    "encode_bmp",
    "decode_bmp",
    "resize_nearest",
    "encode_wav",
    "decode_wav",
]

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, filesize, res, res, data offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # 40-byte BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as an uncompressed 24-bit BMP.

    Bottom-up row order and BGR byte order per the format; each row padded to
    a 4-byte boundary.
    """
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected HxWx3 RGB array, got shape {pixels.shape}")
    h, w, _ = pixels.shape
    bgr = np.ascontiguousarray(pixels[::-1, :, ::-1], dtype=np.uint8)  # flip rows, RGB->BGR
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    data = rows.tobytes()
    header = _BMP_FILE_HEADER.pack(b"BM", 54 + len(data), 0, 0, 54)
    info = _BMP_INFO_HEADER.pack(40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to an HxWx3 uint8 RGB array."""
    magic, _, _, _, offset = _BMP_FILE_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _, w, h, _, bpp, compression, *_ = _BMP_INFO_HEADER.unpack_from(payload, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp}, comp={compression})")
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=offset)
    bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return (rgb[::-1] if flip else rgb).copy()


def resize_nearest(pixels: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample: output (x, y) reads source
    ((x * W) // new_w, (y * H) // new_h) — integer floor mapping, so an
    oracle can replay the exact index arithmetic."""
    h, w = pixels.shape[:2]
    xi = (np.arange(new_w) * w) // new_w
    yi = (np.arange(new_h) * h) // new_h
    return pixels[yi][:, xi]


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode a 1-D int16 array as mono 16-bit PCM WAV (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode mono 16-bit PCM WAV -> (sample_rate, int16 samples)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise ValueError("only mono 16-bit PCM supported")
        rate = wf.getframerate()
        samples = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    return rate, samples
