"""Round-7 unit tests: RLE8 BMP codec edge cases (the declared qid
multimodal_decode_bmp_rle covers the end-to-end path; these pin the codec
corners the fixture's closed-form images never hit)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
    decode_bmp,
    encode_bmp,
    encode_bmp_rle8,
)

_PAL = np.stack(
    [(np.arange(256) * 11) % 256, (np.arange(256) * 23) % 256, (np.arange(256) * 37) % 256],
    axis=1,
).astype(np.uint8)


def _rle_payload(w: int, h: int, data: bytes) -> bytes:
    """Hand-build an RLE8 BMP container around raw RLE bytes."""
    palq = np.zeros((256, 4), dtype=np.uint8)
    palq[:, 0], palq[:, 1], palq[:, 2] = _PAL[:, 2], _PAL[:, 1], _PAL[:, 0]
    offset = 54 + 1024
    hdr = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(data), 2835, 2835, 256, 0)
    return hdr + info + palq.tobytes() + data


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 13),
    w=st.integers(1, 300),
    seed=st.integers(0, 2**31 - 1),
)
def test_rle8_roundtrip(h, w, seed):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 256, (h, w)).astype(np.uint8)
    idx[:, : w // 2] = idx[:, :1]  # force some real runs
    out = decode_bmp(encode_bmp_rle8(idx, _PAL))
    assert out.shape == (h, w, 3)
    assert (out == _PAL[idx]).all()


def test_rle8_run_longer_than_255_splits():
    idx = np.zeros((1, 600), dtype=np.uint8) + 7
    payload = encode_bmp_rle8(idx, _PAL)
    # 600 = 255 + 255 + 90 -> three run pairs + EOL + EOB
    data = payload[54 + 1024 :]
    assert data == bytes([255, 7, 255, 7, 90, 7]) + b"\x00\x00" + b"\x00\x01"
    assert (decode_bmp(payload) == _PAL[idx]).all()


def test_rle8_absolute_mode_even_and_odd():
    # absolute runs are word-aligned: odd counts carry one pad byte
    data = bytes([0, 4, 1, 2, 3, 4]) + b"\x00\x00" + b"\x00\x01"
    out = decode_bmp(_rle_payload(4, 1, data))
    assert (out[0] == _PAL[[1, 2, 3, 4]]).all()
    data = bytes([0, 3, 5, 6, 7, 0]) + bytes([2, 9]) + b"\x00\x00" + b"\x00\x01"
    out = decode_bmp(_rle_payload(5, 1, data))
    assert (out[0] == _PAL[[5, 6, 7, 9, 9]]).all()


def test_rle8_delta_escape_rejected():
    data = bytes([0, 2, 1, 1]) + b"\x00\x01"
    with pytest.raises(ValueError, match="delta"):
        decode_bmp(_rle_payload(4, 2, data))


def test_rle8_bottom_up_row_order():
    idx = np.array([[1, 1], [2, 2]], dtype=np.uint8)
    payload = encode_bmp_rle8(idx, _PAL)
    data = payload[54 + 1024 :]
    # bottom row (2s) must be emitted FIRST
    assert data.startswith(bytes([2, 2]))
    assert (decode_bmp(payload) == _PAL[idx]).all()


def test_uncompressed_bmp_still_decodes():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_bmp(encode_bmp(px)) == px).all()
