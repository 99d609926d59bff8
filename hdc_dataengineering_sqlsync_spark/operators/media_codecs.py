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
import zlib

import numpy as np

__all__ = [
    "encode_bmp",
    "decode_bmp",
    "resize_nearest",
    "encode_wav",
    "decode_wav",
    "encode_png",
    "decode_png",
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


# --------------------------------------------------------------------- PNG
#
# PNG is "compressed" only in the DEFLATE sense — zlib ships with CPython —
# so unlike JPEG/MP3 it needs no external codec library: signature + chunked
# container (IHDR/IDAT/IEND, each length+type+payload+crc32), scanlines
# filtered per-row by one of five predictors, then zlib. Implemented here
# for 8-bit RGB (color type 2): the format real web corpora actually carry
# alongside JPEG. The encoder deliberately CYCLES the filter type per row
# (y % 5) so a round-trip exercises every unfilter branch — None, Sub, Up,
# Average, Paeth — not just the trivial one.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (per PNG spec): nearest of left/up/up-left to the
    initial estimate a+b-c, ties resolved left, then up."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(np.uint8)


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as an 8-bit truecolor PNG.

    Filter type for row y is y % 5, covering all five predictors; filtering
    is pure modular byte arithmetic (uint8 wraparound IS the spec's mod-256).
    """
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected HxWx3 RGB array, got shape {pixels.shape}")
    h, w, _ = pixels.shape
    raw = np.ascontiguousarray(pixels, dtype=np.uint8).reshape(h, w * 3)
    zero = np.zeros(w * 3, dtype=np.uint8)
    out = bytearray()
    for y in range(h):
        cur = raw[y]
        prev = raw[y - 1] if y else zero
        left = np.concatenate([np.zeros(3, np.uint8), cur[:-3]])
        upleft = np.concatenate([np.zeros(3, np.uint8), prev[:-3]])
        ftype = y % 5
        if ftype == 0:
            filt = cur
        elif ftype == 1:  # Sub
            filt = cur - left
        elif ftype == 2:  # Up
            filt = cur - prev
        elif ftype == 3:  # Average
            filt = cur - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(np.uint8)
        else:  # Paeth
            filt = cur - _paeth(left, prev, upleft)
        out.append(ftype)
        out.extend(filt.tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor (color type 2) PNG to an HxWx3 uint8 RGB
    array: chunk walk -> concatenated-IDAT zlib inflate -> per-scanline
    unfilter (all five predictor types)."""
    if bytes(payload[: len(_PNG_SIG)]) != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = len(_PNG_SIG), 0
    h = bitdepth = ctype = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        name = bytes(payload[pos + 4 : pos + 8])
        body = bytes(payload[pos + 8 : pos + 8 + length])
        pos += 12 + length  # length + type + payload + crc
        if name == b"IHDR":
            w, h, bitdepth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
        elif name == b"IDAT":
            idat.extend(body)
        elif name == b"IEND":
            break
    if bitdepth != 8 or ctype != 2 or interlace != 0:
        raise ValueError(
            f"only 8-bit non-interlaced truecolor PNG supported "
            f"(depth={bitdepth}, color={ctype}, interlace={interlace})"
        )
    stride = w * 3
    data = zlib.decompress(bytes(idat))
    if len(data) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype, filt = int(rows[y, 0]), rows[y, 1:]
        prev = out[y - 1] if y else zero
        if ftype == 0:
            out[y] = filt
        elif ftype == 2:  # Up
            out[y] = filt + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = out[y]
            for x in range(0, stride, 3):
                left = cur[x - 3 : x] if x else np.zeros(3, np.uint8)
                upleft = prev[x - 3 : x] if x else np.zeros(3, np.uint8)
                up = prev[x : x + 3]
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = ((left.astype(np.uint16) + up.astype(np.uint16)) // 2).astype(np.uint8)
                else:
                    pred = _paeth(left, up, upleft)
                cur[x : x + 3] = filt[x : x + 3] + pred
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out.reshape(h, w, 3).copy()
