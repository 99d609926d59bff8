"""Pure-numpy/stdlib media codecs: 24-bit BMP and 16-bit PCM WAV.

The container has no image/audio codec libraries (Pillow, opencv, soundfile),
so round 1 stubbed every decode behind NotImplementedError. BMP and WAV,
however, are *container formats with no compression* — header parsing plus a
numpy reshape — so they are implemented for real here; so are PNG (compression = stdlib
zlib DEFLATE, r6) and GIF (compression = LZW, fully specified by the
format and implemented below, r6). The stubs now cover only formats whose
codecs are genuinely library-bound (JPEG/WebP/MP3/...).

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
    "encode_bmp_rle8",
    "decode_bmp",
    "resize_nearest",
    "encode_wav",
    "decode_wav",
    "encode_png",
    "decode_png",
    "encode_png_batch",
    "decode_png_batch",
    "encode_gif",
    "decode_gif",
    "encode_gif_animation",
    "decode_gif_animation",
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


def encode_bmp_rle8(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode an HxW uint8 index array as a REAL RLE8-compressed 8-bit BMP
    (biCompression = BI_RLE8) with a 256-entry BGRA palette.

    The encoder emits maximal (count ≤ 255, index) run pairs, the 0x00 0x00
    end-of-line marker after every row, and the 0x00 0x01 end-of-bitmap
    marker — the actual Windows RLE8 wire format, decodable by any image
    viewer. Rows are written bottom-up per BMP convention."""
    if indices.ndim != 2:
        raise ValueError(f"expected HxW index array, got shape {indices.shape}")
    if palette.shape != (256, 3):
        raise ValueError(f"palette must be 256x3 RGB, got {palette.shape}")
    h, w = indices.shape
    out = bytearray()
    for row in indices[::-1]:  # bottom-up
        i = 0
        while i < w:
            j = i
            while j < w and row[j] == row[i] and j - i < 255:
                j += 1
            out += bytes((j - i, int(row[i])))
            i = j
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    data = bytes(out)
    # palette stored as BGRA quads
    pal = np.zeros((256, 4), dtype=np.uint8)
    pal[:, 0] = palette[:, 2]
    pal[:, 1] = palette[:, 1]
    pal[:, 2] = palette[:, 0]
    offset = 54 + 256 * 4
    header = _BMP_FILE_HEADER.pack(b"BM", offset + len(data), 0, 0, offset)
    info = _BMP_INFO_HEADER.pack(40, w, h, 1, 8, 1, len(data), 2835, 2835, 256, 0)
    return header + info + pal.tobytes() + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a BMP to an HxWx3 uint8 RGB array.

    Handles uncompressed 24-bit (the r4 baseline) and — since r7 — 8-bit
    RLE8-compressed palettized BMPs: run pairs, end-of-line (0,0),
    end-of-bitmap (0,1), absolute mode (0, n≥3, word-aligned literals),
    and the delta escape (0,2) rejected explicitly (encoders in the wild
    virtually never emit it; supporting silent pixel skips would mask
    corruption)."""
    magic, _, _, _, offset = _BMP_FILE_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _, w, h, _, bpp, compression, *_ = _BMP_INFO_HEADER.unpack_from(payload, 14)
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    if bpp == 8 and compression == 1:  # BI_RLE8
        pal = np.frombuffer(payload, dtype=np.uint8, count=256 * 4, offset=54).reshape(256, 4)
        rgb_pal = pal[:, [2, 1, 0]]  # BGRA -> RGB
        idx = np.zeros((h, w), dtype=np.uint8)
        pos, row, col = offset, 0, 0
        while pos + 1 < len(payload):
            n, v = payload[pos], payload[pos + 1]
            pos += 2
            if n > 0:  # run
                if row >= h or col + n > w:
                    raise ValueError("corrupt RLE8 data")
                idx[row, col : col + n] = v
                col += n
            elif v == 0:  # end of line
                row, col = row + 1, 0
                if row > h:
                    raise ValueError("corrupt RLE8 data")
            elif v == 1:  # end of bitmap
                break
            elif v == 2:
                raise ValueError("RLE8 delta escape not supported")
            else:  # absolute mode: v literal indices, word-aligned
                if row >= h or col + v > w or pos + v > len(payload):
                    raise ValueError("corrupt RLE8 data")
                lit = np.frombuffer(payload, dtype=np.uint8, count=v, offset=pos)
                idx[row, col : col + v] = lit
                col += v
                pos += v + (v & 1)
        rgb = rgb_pal[idx]
        return (rgb[::-1] if flip else rgb).copy()
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
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


def encode_wav_stereo(
    left: np.ndarray, right: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """Encode two 1-D int16 arrays as stereo 16-bit PCM WAV (frames are
    L/R interleaved per the RIFF spec — the interleave IS what a stereo
    decoder must undo)."""
    left = np.asarray(left, dtype="<i2")
    right = np.asarray(right, dtype="<i2")
    if left.shape != right.shape or left.ndim != 1:
        raise ValueError("left/right must be equal-length 1-D int16 arrays")
    frames = np.empty(left.size * 2, dtype="<i2")
    frames[0::2] = left
    frames[1::2] = right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(frames.tobytes())
    return buf.getvalue()


def decode_wav_stereo(payload: bytes) -> tuple[int, np.ndarray, np.ndarray]:
    """Decode stereo 16-bit PCM WAV -> (sample_rate, left, right)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 2:
            raise ValueError("only stereo 16-bit PCM supported")
        rate = wf.getframerate()
        frames = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    return rate, frames[0::2].copy(), frames[1::2].copy()


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
    w, h, data = _png_parse(payload)
    stride = w * 3
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


def encode_png_batch(pixel_stack: np.ndarray) -> list[bytes]:
    """Encode n same-size HxWx3 images at once (filter rotation y % 5, as
    ``encode_png``). Filter arithmetic is one numpy pass vectorized across
    the whole stack; only the per-image DEFLATE (C-speed zlib) loops.

    This is the corpus-scale path: per-image cost in ``encode_png`` is h
    numpy row expressions — pure Python-dispatch overhead at thumbnail
    sizes. Bit-identical to the scalar encoder (parity unit-tested)."""
    if pixel_stack.ndim != 4 or pixel_stack.shape[3] != 3:
        raise ValueError(f"expected NxHxWx3 stack, got shape {pixel_stack.shape}")
    n, h, w, _ = pixel_stack.shape
    stride = w * 3
    raw = np.ascontiguousarray(pixel_stack, dtype=np.uint8).reshape(n, h, stride)
    left = np.zeros_like(raw)
    left[:, :, 3:] = raw[:, :, :-3]
    prev = np.zeros_like(raw)
    prev[:, 1:, :] = raw[:, :-1, :]
    upleft = np.zeros_like(raw)
    upleft[:, 1:, 3:] = raw[:, :-1, :-3]
    scan = np.empty((n, h, stride + 1), dtype=np.uint8)
    for y in range(h):
        ftype = y % 5
        scan[:, y, 0] = ftype
        cur = raw[:, y]
        if ftype == 0:
            f = cur
        elif ftype == 1:  # Sub
            f = cur - left[:, y]
        elif ftype == 2:  # Up
            f = cur - prev[:, y]
        elif ftype == 3:  # Average
            f = cur - (
                (left[:, y].astype(np.uint16) + prev[:, y].astype(np.uint16)) // 2
            ).astype(np.uint8)
        else:  # Paeth
            f = cur - _paeth(left[:, y], prev[:, y], upleft[:, y])
        scan[:, y, 1:] = f
    ihdr = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    iend = _png_chunk(b"IEND", b"")
    return [
        _PNG_SIG + ihdr + _png_chunk(b"IDAT", zlib.compress(scan[i].tobytes(), 6)) + iend
        for i in range(n)
    ]


def _png_parse(payload: bytes) -> tuple[int, int, bytes]:
    """Chunk walk shared by the scalar and batch decoders: returns
    (w, h, inflated scanline bytes) after validating the 8-bit truecolor
    non-interlaced contract."""
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
    data = zlib.decompress(bytes(idat))
    if len(data) != h * (w * 3 + 1):
        raise ValueError("IDAT length does not match dimensions")
    return w, h, data


def decode_png_batch(payloads: list[bytes]) -> list[np.ndarray]:
    """Decode many truecolor PNGs, vectorizing the unfilter across every
    group of images that shares (w, h, per-row filter-type vector) — the
    shape a corpus encoded by one producer overwhelmingly has.

    The sequential predictors (Sub/Average/Paeth) still walk x, but each
    step now processes the whole group at once: Python-op count drops from
    O(images × h × w) to O(classes × h × w). Sub additionally collapses to
    one per-lane cumsum (mod-256 prefix sum). Returns arrays in input
    order; bit-identical to ``decode_png`` (parity unit-tested)."""
    parsed = [_png_parse(p) for p in payloads]
    groups: dict[tuple, list[int]] = {}
    scans: list[np.ndarray] = []
    for i, (w, h, data) in enumerate(parsed):
        rows = np.frombuffer(data, dtype=np.uint8).reshape(h, w * 3 + 1)
        scans.append(rows)
        groups.setdefault((w, h, rows[:, 0].tobytes()), []).append(i)

    out: list[np.ndarray | None] = [None] * len(payloads)
    for (w, h, ftypes_b), idxs in groups.items():
        stride = w * 3
        stack = np.stack([scans[i] for i in idxs])  # (m, h, stride+1)
        m = len(idxs)
        dec = np.zeros((m, h, stride), dtype=np.uint8)
        zero_row = np.zeros((m, stride), dtype=np.uint8)
        zero_px = np.zeros((m, 3), dtype=np.uint8)
        for y in range(h):
            ftype = ftypes_b[y]
            filt = stack[:, y, 1:]
            prev = dec[:, y - 1] if y else zero_row
            if ftype == 0:
                dec[:, y] = filt
            elif ftype == 2:  # Up
                dec[:, y] = filt + prev
            elif ftype == 1:  # Sub: per-lane mod-256 prefix sum
                lanes = filt.reshape(m, w, 3).astype(np.int64)
                dec[:, y] = (
                    (lanes.cumsum(axis=1) % 256).astype(np.uint8).reshape(m, stride)
                )
            elif ftype in (3, 4):  # Average / Paeth: sequential in x only
                cur = dec[:, y]
                for x in range(0, stride, 3):
                    left = cur[:, x - 3 : x] if x else zero_px
                    up = prev[:, x : x + 3]
                    if ftype == 3:
                        pred = (
                            (left.astype(np.uint16) + up.astype(np.uint16)) // 2
                        ).astype(np.uint8)
                    else:
                        upleft = prev[:, x - 3 : x] if x else zero_px
                        pred = _paeth(left, up, upleft)
                    cur[:, x : x + 3] = filt[:, x : x + 3] + pred
            else:
                raise ValueError(f"unknown PNG filter type {ftype}")
        for j, i in enumerate(idxs):
            out[i] = dec[j].reshape(h, w, 3).copy()
    return out  # type: ignore[return-value]


# --------------------------------------------------------------------- GIF
#
# GIF's compression is LZW — a dictionary coder fully specified in the
# format (variable code width 3..12 bits, CLEAR/EOI codes, LSB-first
# bitstream chopped into <=255-byte sub-blocks). No codec library needed:
# the dictionary machinery below is ~60 lines each way. Implemented for
# single-frame, global-color-table images (the still-image shape); the
# encoder is a REAL LZW compressor (builds the dictionary, grows the code
# width, resets at 4096), so a round-trip exercises genuine variable-width
# code sequences, not a degenerate uncompressed stream.


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode an HxW uint8 index matrix + Px3 palette as a GIF89a.

    Real LZW: dictionary build, width growth at code-space exhaustion,
    CLEAR-code reset when the 12-bit space fills.
    """
    if indices.ndim != 2:
        raise ValueError(f"expected HxW index matrix, got shape {indices.shape}")
    h, w = indices.shape
    header, depth = _gif_header(w, h, palette)
    if indices.max(initial=0) >= (1 << depth):
        raise ValueError("index out of palette range")
    out = bytearray(header)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor, no LCT

    out += _gif_image_data(indices, depth)
    out += b"\x3b"  # trailer
    return bytes(out)


def _gif_header(w: int, h: int, palette: np.ndarray) -> tuple[bytes, int]:
    """GIF89a signature + logical screen descriptor + global color table —
    shared by the still and animation encoders. Returns (bytes, depth)."""
    p = len(palette)
    if p > 256:
        # depth 9 would wrap the 3-bit GCT-size field and emit a corrupt
        # logical-screen descriptor — fail loudly instead
        raise ValueError(f"GIF palettes hold at most 256 colors, got {p}")
    depth = max(2, (int(p) - 1).bit_length())  # GCT size is a power of two >= 4
    gct = np.zeros((1 << depth, 3), dtype=np.uint8)
    gct[:p] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += gct.tobytes()
    return bytes(out), depth


def _gif_image_data(indices: np.ndarray, min_code: int) -> bytes:
    """LZW-code one frame's index stream: min-code byte + sub-blocked
    codestream + block terminator (the bytes that follow an image
    descriptor). Shared by the still and animation encoders."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray([min_code])

    bits = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << min_code)}
    next_code, width = eoi + 1, min_code + 1
    emit(clear, width)
    stream = indices.astype(np.uint8).tobytes()
    wseq = stream[:1]
    for b in stream[1:]:
        cand = wseq + bytes([b])
        if cand in table:
            wseq = cand
            continue
        emit(table[wseq], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code > (1 << 12) - 1:
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << min_code)}
            next_code, width = eoi + 1, min_code + 1
        wseq = bytes([b])
    if stream:
        emit(table[wseq], width)
    emit(eoi, width)
    if nbits:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode a single-frame GIF to an HxWx3 uint8 RGB array: header +
    global color table, skip extensions, LZW-inflate the image data
    (variable code width, CLEAR/EOI), map indices through the palette."""
    if bytes(payload[:6]) not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 1 << ((flags & 7) + 1)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:
            break
        elif block == 0x3B:
            raise ValueError("GIF contains no image data")
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    _, _, _, w, h, iflags = struct.unpack_from("<BHHHHB", payload, pos)
    pos += 10
    if iflags & 0x40:
        raise ValueError("interlaced GIF not supported")
    ct = gct
    if iflags & 0x80:
        n = 1 << ((iflags & 7) + 1)
        ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    if ct is None:
        raise ValueError("GIF has no color table")
    idx, pos = _gif_decode_frame(payload, pos, w, h)
    return ct[idx].copy()


def _gif_read_subblocks(payload: bytes, pos: int) -> tuple[bytearray, int]:
    """Concatenate a sub-block chain starting at ``pos``; returns the data
    and the position just past the 0 terminator."""
    data = bytearray()
    while payload[pos]:
        ln = payload[pos]
        data += payload[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    return data, pos + 1


def _gif_decode_frame(payload: bytes, pos: int, w: int, h: int) -> tuple[np.ndarray, int]:
    """LZW-inflate one frame's image data (min-code byte at ``pos``);
    returns the HxW index matrix and the position past the terminator."""
    min_code = payload[pos]
    data, end = _gif_read_subblocks(payload, pos + 1)

    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = nbits = bitpos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if bitpos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[bitpos] << nbits
            bitpos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW code")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    idx = np.frombuffer(bytes(out), np.uint8, w * h).reshape(h, w)
    return idx, end


def encode_gif_animation(
    frames: list[np.ndarray], palette: np.ndarray, delays_cs: list[int]
) -> bytes:
    """Encode same-size index frames as an animated GIF89a: NETSCAPE2.0
    loop extension, then per frame a Graphic Control Extension carrying its
    delay (centiseconds) + image descriptor + real LZW image data. Every
    frame is full-size with no transparency/disposal tricks — the archival
    shape a training corpus stores."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    if len(frames) != len(delays_cs):
        raise ValueError("one delay per frame required")
    if frames[0].ndim != 2:
        raise ValueError(f"expected HxW index matrices, got shape {frames[0].shape}")
    h, w = frames[0].shape
    header, depth = _gif_header(w, h, palette)
    out = bytearray(header)
    # NETSCAPE2.0 application extension: loop forever (the de-facto marker
    # every animated GIF carries)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for frame, delay in zip(frames, delays_cs):
        if frame.shape != (h, w):
            raise ValueError("all animation frames must share the canvas size")
        if frame.max(initial=0) >= (1 << depth):
            raise ValueError("index out of palette range")
        if not 0 <= int(delay) <= 0xFFFF:
            raise ValueError(f"GIF frame delay out of uint16 range: {delay}")
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, int(delay), 0, 0)  # GCE
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
        out += _gif_image_data(frame, depth)
    out += b"\x3b"
    return bytes(out)


def decode_gif_animation(payload: bytes) -> tuple[list[np.ndarray], list[int]]:
    """Decode an animated GIF to (RGB frames, per-frame delays in
    centiseconds). Walks the block stream generically: application/comment
    extensions are skipped, each GCE's delay attaches to the following
    image, local color tables override the global one per frame."""
    if bytes(payload[:6]) not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 1 << ((flags & 7) + 1)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    frames: list[np.ndarray] = []
    delays: list[int] = []
    pending_delay = 0
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:
            label = payload[pos + 1]
            if label == 0xF9:  # Graphic Control Extension
                gce_flags = payload[pos + 3]
                (pending_delay,) = struct.unpack_from("<H", payload, pos + 4)
                if gce_flags & 0x01:
                    # transparency needs the previous composited frame —
                    # outside this decoder's full-frame contract
                    raise ValueError("GIF transparency not supported")
                _, pos = _gif_read_subblocks(payload, pos + 3 + payload[pos + 2])
            else:  # application / comment / plain-text: skip sub-blocks
                _, pos = _gif_read_subblocks(payload, pos + 2)
        elif block == 0x2C:
            _, left, top, w, h, iflags = struct.unpack_from("<BHHHHB", payload, pos)
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            if left or top or (w, h) != (sw, sh):
                # sub-rectangle frames (inter-frame optimization) need
                # canvas compositing — refuse rather than return misaligned
                # crops as if they were full frames
                raise ValueError("GIF sub-rectangle frames not supported")
            ct = gct
            if iflags & 0x80:
                n = 1 << ((iflags & 7) + 1)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF has no color table")
            idx, pos = _gif_decode_frame(payload, pos, w, h)
            frames.append(ct[idx].copy())
            delays.append(pending_delay)
            pending_delay = 0
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, delays
