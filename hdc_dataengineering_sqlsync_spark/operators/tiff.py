"""Pure-numpy/struct baseline TIFF codec (uncompressed RGB, both byte orders).

TIFF is the fourth real container format in the codec matrix (BMP, PNG,
GIF, JPEG — media_codecs.py / jpeg.py): no compression to implement, but
a REAL metadata structure — the IFD (Image File Directory) tag walk every
TIFF reader performs. The encoder emits a spec-conforming single-strip
baseline RGB file (II or MM byte order, magic 42, the 8 required tags in
ascending order); the decoder walks the IFD generically: it reads the
byte order from the header (II little-endian / MM big-endian, r12),
resolves tag values whether they are inlined in the 4-byte value slot or
stored at an offset, validates the baseline-RGB contract, and reassembles
pixel rows from ANY strip layout (RowsPerStrip need not divide the
height). Endianness only affects the container integers — 8-bit RGB
samples are single bytes, so the pixel buffer is byte-order-free.

Correctness posture mirrors the other codecs: the multimodal qid
synthesizes closed-form pixels, round-trips the actual bytes, and a
DuckDB oracle recomputes the statistics from the closed form alone — a
wrong tag id/type/count, byte-order slip, strip-offset bug, or row-stride
error mismatches the hash. (No reference file:line exists —
/root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_tiff", "decode_tiff"]

# tag ids (TIFF 6.0 baseline)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_ORIENTATION = 274
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_BYTES = 279

_TYPE_SHORT = 3  # uint16
_TYPE_LONG = 4  # uint32

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

# header order mark -> struct byte-order prefix
_BYTE_ORDER = {b"II": "<", b"MM": ">"}


def encode_tiff(
    pixels: np.ndarray,
    rows_per_strip: int = 4,
    orientation: int | None = None,
    byte_order: str = "II",
) -> bytes:
    """Encode an HxWx3 uint8 RGB array as an uncompressed baseline TIFF
    (little-endian ``II`` by default, big-endian with ``byte_order="MM"``,
    chunky RGB, multiple strips).

    ``orientation`` (TIFF tag 274, the EXIF-style value 1/3/6/8 cameras
    write) is stored as metadata only — pixel data stays in file order, as
    real cameras do; honoring the tag is the READER's job."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected HxWx3 RGB array, got shape {pixels.shape}")
    if orientation is not None and orientation not in (1, 3, 6, 8):
        raise ValueError(f"unsupported TIFF orientation {orientation}")
    order = byte_order.encode() if isinstance(byte_order, str) else bytes(byte_order)
    bo = _BYTE_ORDER.get(order)
    if bo is None:
        raise ValueError(f"TIFF byte_order must be 'II' or 'MM', got {byte_order!r}")
    h, w = pixels.shape[:2]
    rps = max(1, min(rows_per_strip, h))
    n_strips = -(-h // rps)
    strips = [
        np.ascontiguousarray(pixels[i * rps : (i + 1) * rps]).tobytes()
        for i in range(n_strips)
    ]

    # layout: header(8) | strip data | [offsets array][counts array] | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    strip_bytes = [len(s) for s in strips]

    def _arr_or_inline(values: list[int]) -> tuple[int, bytes | None]:
        """LONG-typed tag payload: inline when count==1, else appended."""
        if len(values) == 1:
            return values[0], None
        return -1, struct.pack(f"{bo}{len(values)}I", *values)

    off_val, off_blob = _arr_or_inline(strip_offsets)
    cnt_val, cnt_blob = _arr_or_inline(strip_bytes)
    if off_blob is not None:
        off_val = pos
        pos += len(off_blob)
    if cnt_blob is not None:
        cnt_val = pos
        pos += len(cnt_blob)
    ifd_offset = pos

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        if typ == _TYPE_SHORT and count == 1:
            # an inlined SHORT occupies the FIRST two bytes of the 4-byte
            # value slot in file order — under MM that is the high half of
            # the packed I, so a count-aware pack is required (under II the
            # plain I pack happens to coincide)
            return struct.pack(f"{bo}HHIHH", tag, typ, count, value, 0)
        return struct.pack(f"{bo}HHII", tag, typ, count, value)

    # BitsPerSample needs a 3-element SHORT array -> stored after the IFD
    n_entries = 9 + (orientation is not None)
    bits_off = ifd_offset + 2 + n_entries * 12 + 4
    entries = [
        entry(_T_WIDTH, _TYPE_LONG, 1, w),
        entry(_T_HEIGHT, _TYPE_LONG, 1, h),
        entry(_T_BITS, _TYPE_SHORT, 3, bits_off),
        entry(_T_COMPRESSION, _TYPE_SHORT, 1, 1),  # none
        entry(_T_PHOTOMETRIC, _TYPE_SHORT, 1, 2),  # RGB
        entry(_T_STRIP_OFFSETS, _TYPE_LONG, len(strips), off_val),
    ]
    if orientation is not None:
        # tags must stay in ascending id order (273 < 274 < 277)
        entries.append(entry(_T_ORIENTATION, _TYPE_SHORT, 1, orientation))
    entries += [
        entry(_T_SAMPLES, _TYPE_SHORT, 1, 3),
        entry(_T_ROWS_PER_STRIP, _TYPE_LONG, 1, rps),
        entry(_T_STRIP_BYTES, _TYPE_LONG, len(strips), cnt_val),
    ]
    ifd = struct.pack(f"{bo}H", len(entries)) + b"".join(entries) + struct.pack(f"{bo}I", 0)
    bits = struct.pack(f"{bo}3H", 8, 8, 8)

    out = bytearray(struct.pack(f"{bo}2sHI", order, 42, ifd_offset))
    for s in strips:
        out += s
    if off_blob is not None:
        out += off_blob
    if cnt_blob is not None:
        out += cnt_blob
    out += ifd + bits
    return bytes(out)


def _read_values(
    payload: bytes, typ: int, count: int, slot: bytes, bo: str
) -> list[int] | None:
    """Resolve a tag's values: inline in the 4-byte slot when they fit,
    else at the offset the slot holds. ``bo`` is the file's struct
    byte-order prefix (``"<"`` for II, ``">"`` for MM).

    Returns ``None`` for tag types the decoder cannot interpret as plain
    integers (BYTE/ASCII/RATIONAL/...). Real-world TIFFs routinely carry
    Software (ASCII) or XResolution (RATIONAL) tags a baseline-RGB decoder
    has no use for; a generic IFD walk must skip those, not fail — only a
    *required* tag arriving with an unsupported type is an error, and that
    is raised at the lookup site (``one()`` / ``many()``)."""
    fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I"}.get(typ)
    if fmt is None:
        return None
    size = _TYPE_SIZE[typ]
    total = size * count
    if total <= 4:
        # inlined values fill the slot from its FIRST byte in file order,
        # so unpacking from offset 0 is correct under both byte orders
        return list(struct.unpack_from(f"{bo}{count}{fmt}", slot, 0))
    (offset,) = struct.unpack(f"{bo}I", slot)
    if offset + total > len(payload):
        raise ValueError("truncated TIFF tag payload")
    return list(struct.unpack_from(f"{bo}{count}{fmt}", payload, offset))


def decode_tiff(payload: bytes, return_meta: bool = False):
    """Decode an uncompressed baseline RGB TIFF — little-endian (II) or
    big-endian (MM, r12) — to an HxWx3 uint8 array. The order mark in the
    header selects the integer byte order for every container field (magic,
    IFD offset, tag entries, strip tables); the 8-bit pixel bytes
    themselves are order-free.

    With ``return_meta=True`` returns ``(pixels, meta)`` where ``meta``
    carries the payload-derived IFD facts a caller may want to audit —
    ``n_strips`` (length of the decoded StripOffsets table), ``rows_per_strip``
    and ``n_tags`` — so reports can cite what the file *declared* rather than
    a closed form recomputed from the decoded shape."""
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    bo = _BYTE_ORDER.get(bytes(payload[:2]))
    if bo is None:
        raise ValueError("not a TIFF payload (no II/MM order mark)")
    order, magic, ifd_offset = struct.unpack_from(f"{bo}2sHI", payload, 0)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic} (expected 42)")
    if ifd_offset + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack_from(f"{bo}H", payload, ifd_offset)
    if ifd_offset + 2 + n_entries * 12 + 4 > len(payload):
        raise ValueError("truncated TIFF IFD")
    tags: dict[int, list[int]] = {}
    skipped_types: dict[int, int] = {}  # tag -> unhandled type (BYTE/ASCII/...)
    for i in range(n_entries):
        base = ifd_offset + 2 + i * 12
        tag, typ, count = struct.unpack_from(f"{bo}HHI", payload, base)
        values = _read_values(payload, typ, count, payload[base + 8 : base + 12], bo)
        if values is None:
            skipped_types[tag] = typ  # ignorable unless the tag is required
        else:
            tags[tag] = values

    def many(tag: int, what: str) -> list[int]:
        if tag in tags:
            return tags[tag]
        if tag in skipped_types:
            raise ValueError(
                f"required TIFF tag {tag} ({what}) has unsupported type "
                f"{skipped_types[tag]}"
            )
        raise ValueError(f"TIFF missing required tag {tag} ({what})")

    def one(tag: int, default: int | None = None) -> int:
        if tag not in tags:
            # a defaulted (optional) tag whose type we cannot read is
            # treated as absent — the ADVICE-r8 contract: only a REQUIRED
            # tag with an unsupported type is an error. Misreads of the
            # value-affecting optionals (Compression, RowsPerStrip) are
            # caught downstream by the pixel-data size check.
            if default is not None:
                return default
            if tag in skipped_types:
                raise ValueError(
                    f"required TIFF tag {tag} has unsupported type {skipped_types[tag]}"
                )
            raise ValueError(f"TIFF missing required tag {tag}")
        return tags[tag][0]

    w, h = one(_T_WIDTH), one(_T_HEIGHT)
    if one(_T_COMPRESSION, 1) != 1:
        raise ValueError("only uncompressed TIFF supported")
    if one(_T_PHOTOMETRIC) != 2 or one(_T_SAMPLES, 1) != 3:
        raise ValueError("only baseline RGB TIFF supported")
    if _T_BITS in skipped_types:
        # BitsPerSample changes how the pixel BUFFER is interpreted — an
        # unreadable entry cannot default to 8-bit (unlike orientation or
        # compression, no downstream check reliably catches the misread)
        raise ValueError(
            f"TIFF BitsPerSample tag has unsupported type {skipped_types[_T_BITS]}"
        )
    if tags.get(_T_BITS, [8, 8, 8]) != [8, 8, 8]:
        raise ValueError("only 8-bit samples supported")
    offsets = many(_T_STRIP_OFFSETS, "StripOffsets")
    counts = many(_T_STRIP_BYTES, "StripByteCounts")
    if len(offsets) != len(counts):
        raise ValueError("corrupt TIFF strip tables")
    data = bytearray()
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(payload):
            raise ValueError("truncated TIFF strip")
        data += payload[off : off + cnt]
    if len(data) != h * w * 3:
        raise ValueError(f"TIFF pixel data size mismatch: {len(data)} != {h * w * 3}")
    pixels = np.frombuffer(bytes(data), dtype=np.uint8).reshape(h, w, 3).copy()
    if return_meta:
        meta = {
            "n_strips": len(offsets),
            "rows_per_strip": one(_T_ROWS_PER_STRIP, h),
            "n_tags": n_entries,
            "orientation": one(_T_ORIENTATION, 1),
            "byte_order": order.decode(),
        }
        return pixels, meta
    return pixels
