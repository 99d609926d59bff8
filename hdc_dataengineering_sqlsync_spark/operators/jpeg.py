"""Pure-numpy/stdlib baseline JPEG codec (SOF0, Huffman, 4:4:4).

The container has no JPEG library (Pillow/libjpeg/opencv), but *baseline*
JPEG is fully specified public knowledge: 8x8 FDCT, uniform scalar
quantization, zigzag, differential-DC + run-length-AC Huffman entropy
coding, byte stuffing, and the JFIF YCbCr color transform. Everything
below is implemented from the format spec with numpy float64 DCTs and a
pure-Python bit-level entropy layer — the same posture as the PNG
(zlib-inflate) and GIF (LZW) codecs in media_codecs.py. This closes the
one remaining real-corpus image format the r7 verdict called "within
reach" (VERDICT r7 next-steps #2; no reference file:line exists — the
reference checkout is empty, SURVEY.md §0).

Correctness layering:
- The ENTROPY layer (Huffman + zigzag + DC prediction + stuffing) is
  lossless and exactly invertible: ``decode_jpeg(..., return_coeffs=True)``
  recovers the exact quantized coefficients that went in — unit-tested
  with randomized coefficient blocks (tests/test_roundeight.py).
- The TRANSFORM layer (DCT/quant) is lossy in general, but a block that
  is CONSTANT has only a DC coefficient, and every rounding step becomes
  exact integer arithmetic a SQL oracle can replay: see
  plans/roundeight.py::multimodal_decode_jpeg.
- The tables written into DQT/DHT segments are what the decoder reads
  back — the roundtrip never depends on module constants agreeing with
  the ITU Annex K values, only on the emitted file being self-consistent
  (custom Huffman tables are legal JPEG; optimizing encoders emit them
  routinely).

Scale note: encode/decode run inside Arrow-batched mapInPandas stages;
payload bytes never cross a shuffle boundary — only per-image scalars do.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "encode_jpeg_from_coeffs", "DEFAULT_QUANT"]


def _zigzag_order() -> list[tuple[int, int]]:
    """The standard JPEG zigzag scan as (row, col) pairs, generated
    programmatically (anti-diagonals, alternating direction) so a typo'd
    64-entry literal can't silently scramble coefficients."""
    out: list[tuple[int, int]] = []
    for s in range(15):
        ys = range(max(0, s - 7), min(7, s) + 1)
        for y in (reversed(ys) if s % 2 == 0 else ys):
            out.append((y, s - y))
    return out


_ZIGZAG = _zigzag_order()  # index in scan order -> (row, col)

# Uniform quant tables: value 17 everywhere. Legal (1..255), and the odd
# DC step is load-bearing for the oracle qid: 8*(v-128)/17 can never land
# exactly on a rounding half-boundary (even numerator vs odd denominator),
# so the float FDCT's ~1e-12 error can't flip the quantized DC.
DEFAULT_QUANT = np.full((8, 8), 17, dtype=np.int64)

# Huffman table specs: (bits[1..16] counts, symbol list), canonical code
# assignment. Standard-shaped DC (categories 0..11) and AC (run/size)
# alphabets; emitted into DHT so the decoder reads them from the payload.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]


def _ac_vals() -> list[int]:
    """AC symbol list in the standard luminance ordering, reconstructed
    from its structure: EOB/ZRL plus (run, size) pairs ordered so that
    short codes go to low-run low-size symbols."""
    seq = [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]
    assert len(seq) == sum(_AC_BITS)
    return seq


_AC_VALS = _ac_vals()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) with canonical JPEG code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    t = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    t[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return t


_T = _dct_matrix()


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per the spec
        return bytes(self.buf)


class _BitReader:
    """Reads the entropy-coded segment, un-stuffing FF 00 on the fly and
    stopping at any real marker (FF xx, xx != 0)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker inside entropy stream")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude(value: int) -> tuple[int, int]:
    """(size category, amplitude bits) for a DC diff / AC coefficient."""
    if value == 0:
        return 0, 0
    size = int(abs(value)).bit_length()
    bits = value if value >= 0 else value + (1 << size) - 1
    return size, bits


def _ycbcr_from_rgb(px: np.ndarray) -> np.ndarray:
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 + (-0.168736 * r - 0.331264 * g + 0.5 * b)
    cr = 128.0 + (0.5 * r - 0.418688 * g - 0.081312 * b)
    out = np.stack([y, cb, cr], axis=2)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.int64)


def _rgb_from_ycbcr(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _check_quant(quant: np.ndarray) -> None:
    if quant.min() < 1 or quant.max() > 255:
        # the DQT field is uint8 — out-of-range steps would silently wrap
        # and break the "decoder reads back what was written" invariant;
        # a zero step would also divide-by-zero the quantize pass, so this
        # must run BEFORE any FDCT work
        raise ValueError(f"quant table values must be in 1..255, got {quant.min()}..{quant.max()}")


def _block_coeffs(channel: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Pad a channel to 8x8 multiples (edge replication), FDCT every
    block, quantize with floor(f/q + 0.5). Returns (by, bx, 8, 8) int64."""
    h, w = channel.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(channel, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) - 128.0
    f = np.einsum("ux,byxz,vz->byuv", _T, blocks, _T)
    return np.floor(f / quant + 0.5).astype(np.int64)


def encode_jpeg_from_coeffs(
    coeffs: dict[str, np.ndarray], w: int, h: int, quant: np.ndarray = DEFAULT_QUANT
) -> bytes:
    """Serialize already-quantized coefficient blocks as a baseline 4:4:4
    JPEG. ``coeffs`` maps 'y'/'cb'/'cr' to (by, bx, 8, 8) int arrays of
    identical block-grid shape. This is the lossless half of the codec —
    the exact coefficient roundtrip the unit tests pin."""
    cy, ccb, ccr = coeffs["y"], coeffs["cb"], coeffs["cr"]
    if not (cy.shape == ccb.shape == ccr.shape) or cy.shape[2:] != (8, 8):
        raise ValueError(f"coefficient grids must match, got {cy.shape}/{ccb.shape}/{ccr.shape}")
    by, bx = cy.shape[:2]
    if by * 8 < h or bx * 8 < w:
        raise ValueError("coefficient grid smaller than declared image size")
    _check_quant(quant)
    for nm, comp in (("y", cy), ("cb", ccb), ("cr", ccr)):
        dc = comp[:, :, 0, 0].reshape(-1)
        diffs = np.diff(np.concatenate([[0], dc]))
        if np.abs(diffs).max(initial=0) > 2047:
            raise ValueError(f"{nm} DC diff exceeds baseline Huffman range (|diff| <= 2047)")
        ac = comp.reshape(-1, 64)[:, 1:]
        if np.abs(ac).max(initial=0) > 1023:
            raise ValueError(f"{nm} AC coefficient exceeds baseline Huffman range (|ac| <= 1023)")
    dc_codes = _DC_CODES
    ac_codes = _AC_CODES

    out = bytearray(b"\xff\xd8")  # SOI
    zz = np.array([quant[r, c] for r, c in _ZIGZAG], dtype=np.uint8)
    for tq in (0, 1):
        out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, tq) + zz.tobytes()
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += struct.pack("BBB", cid, 0x11, tq)  # 1x1 sampling = 4:4:4
    for tc_th, bits, vals in (
        (0x00, _DC_BITS, _DC_VALS),
        (0x10, _AC_BITS, _AC_VALS),
        (0x01, _DC_BITS, _DC_VALS),
        (0x11, _AC_BITS, _AC_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3)
    for cid, tda in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack("BB", cid, tda)
    out += struct.pack("BBB", 0, 63, 0)  # Ss, Se, AhAl

    writer = _BitWriter()
    pred = [0, 0, 0]
    for yb in range(by):
        for xb in range(bx):
            for ci, comp in enumerate((cy, ccb, ccr)):
                block = comp[yb, xb]
                zig = [int(block[r, c]) for r, c in _ZIGZAG]
                diff = zig[0] - pred[ci]
                pred[ci] = zig[0]
                size, bits_v = _magnitude(diff)
                code, length = dc_codes[size]
                writer.write(code, length)
                writer.write(bits_v, size)
                run = 0
                last_nz = max((i for i in range(1, 64) if zig[i]), default=0)
                for i in range(1, last_nz + 1):
                    if zig[i] == 0:
                        run += 1
                        continue
                    while run > 15:
                        zc, zl = ac_codes[0xF0]  # ZRL
                        writer.write(zc, zl)
                        run -= 16
                    size, bits_v = _magnitude(zig[i])
                    code, length = ac_codes[(run << 4) | size]
                    writer.write(code, length)
                    writer.write(bits_v, size)
                    run = 0
                if last_nz < 63:
                    ec, el = ac_codes[0x00]  # EOB
                    writer.write(ec, el)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg(pixels: np.ndarray, quant: np.ndarray = DEFAULT_QUANT) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a baseline 4:4:4 JFIF-style JPEG."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected HxWx3 RGB array, got shape {pixels.shape}")
    _check_quant(quant)
    h, w = pixels.shape[:2]
    ycc = _ycbcr_from_rgb(pixels)
    coeffs = {
        "y": _block_coeffs(ycc[:, :, 0], quant),
        "cb": _block_coeffs(ycc[:, :, 1], quant),
        "cr": _block_coeffs(ycc[:, :, 2], quant),
    }
    return encode_jpeg_from_coeffs(coeffs, w, h, quant)


@lru_cache(maxsize=64)
def _parse_huffman(data: bytes) -> dict[int, dict[tuple[int, int], int]]:
    """DHT payload -> {Tc<<4|Th: {(length, code): symbol}}.

    Memoized on the raw segment bytes: a corpus encoded with one table
    set (the overwhelmingly common case — and always ours) builds the
    ~350-entry lookup dicts once per worker instead of once per image."""
    tables: dict[int, dict[tuple[int, int], int]] = {}
    pos = 0
    while pos < len(data):
        if pos + 17 > len(data):
            raise ValueError("truncated DHT segment")
        tc_th = data[pos]
        bits = list(data[pos + 1 : pos + 17])
        n = sum(bits)
        if pos + 17 + n > len(data):
            raise ValueError("truncated DHT segment")
        vals = list(data[pos + 17 : pos + 17 + n])
        lut: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        tables[tc_th] = lut
        pos += 17 + n
    return tables


def _read_symbol(reader: _BitReader, lut: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(value: int, size: int) -> int:
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def decode_jpeg(payload: bytes, return_coeffs: bool = False):
    """Decode a baseline 4:4:4 (or grayscale) JPEG.

    Returns an HxWx3 uint8 RGB array, or — with ``return_coeffs`` — the
    dict of exact quantized coefficient blocks plus (w, h, quant tables),
    exposing the lossless entropy layer for coefficient-exact tests."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant_tables: dict[int, np.ndarray] = {}
    huff: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    scan_comps = None
    while pos < len(payload):
        if pos + 1 >= len(payload):
            raise ValueError("truncated JPEG marker stream")
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them so FF FF DB parses as DQT, not garbage
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            raise ValueError("truncated JPEG marker stream")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment header")
        seglen = struct.unpack_from(">H", payload, pos)[0]
        if pos + seglen > len(payload):
            raise ValueError("truncated JPEG segment body")
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                if p + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                q = np.zeros((8, 8), dtype=np.int64)
                for i, (r, c) in enumerate(_ZIGZAG):
                    q[r, c] = body[p + 1 + i]
                quant_tables[tq] = q
                p += 65
        elif marker == 0xC4:  # DHT
            huff.update(_parse_huffman(body))
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * i)
                if hv != 0x11:
                    raise ValueError("only 4:4:4 (1x1 sampling) supported")
                comps.append((cid, tq))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline SOF0 JPEG supported")
        elif marker == 0xDA:  # SOS
            ncomp = body[0]
            scan_comps = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ncomp)]
            pos += seglen
            break
        pos += seglen
    if frame is None or scan_comps is None:
        raise ValueError("corrupt JPEG: missing SOF0/SOS")
    w, h, comps = frame
    by, bx = -(-h // 8), -(-w // 8)
    reader = _BitReader(payload, pos)
    names = ["y", "cb", "cr"][: len(comps)]
    coeffs = {nm: np.zeros((by, bx, 8, 8), dtype=np.int64) for nm in names}
    pred = [0] * len(comps)
    for yb in range(by):
        for xb in range(bx):
            for ci, (_, tda) in enumerate(scan_comps):
                dc_lut = huff[(tda >> 4)]
                ac_lut = huff[0x10 | (tda & 0x0F)]
                zig = [0] * 64
                size = _read_symbol(reader, dc_lut)
                pred[ci] += _extend(reader.read(size), size)
                zig[0] = pred[ci]
                i = 1
                while i < 64:
                    sym = _read_symbol(reader, ac_lut)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0x0F
                    if sym == 0xF0:  # ZRL
                        i += 16
                        continue
                    i += run
                    if i > 63:
                        raise ValueError("AC coefficient index overflow")
                    zig[i] = _extend(reader.read(size), size)
                    i += 1
                block = coeffs[names[ci]][yb, xb]
                for k, (r, c) in enumerate(_ZIGZAG):
                    block[r, c] = zig[k]
    qmap = {nm: quant_tables[tq] for nm, (_, tq) in zip(names, comps)}
    if return_coeffs:
        return coeffs, (w, h, qmap)
    planes = {}
    for nm in names:
        deq = coeffs[nm].astype(np.float64) * qmap[nm]
        spatial = np.einsum("xu,byuv,zv->byxz", _T.T, deq, _T.T)
        full = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        planes[nm] = np.clip(np.floor(full + 0.5), 0, 255)[:h, :w]
    if len(names) == 1:
        yv = planes["y"].astype(np.uint8)
        return np.stack([yv, yv, yv], axis=2)
    return _rgb_from_ycbcr(planes["y"], planes["cb"], planes["cr"])
