"""Round-8 unit tests.

Pins the judge/advice items from round 7:
- RLE8 decoder rejects corrupt payloads loudly (ValueError, not silent
  clipping or a bare IndexError) — ADVICE r7 media_codecs.py:127.
- ``_spread`` adds a round-robin repartition only for under-parallel
  FILE inputs and leaves exchange-output (empty ``inputFiles()``) plans
  alone — VERDICT r7 next-steps #5.
- SyntheticArrowReader validates rows/partitions loudly — VERDICT r7
  next-steps #5.
- ``stress_probe`` per-row ratio arithmetic treats a legitimate 0.0
  ratio as a number, not as a missing value — ADVICE r7 stress_probe:220.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
    decode_bmp,
    encode_bmp_rle8,
)

_PAL = np.stack(
    [(np.arange(256) * 11) % 256, (np.arange(256) * 23) % 256, (np.arange(256) * 37) % 256],
    axis=1,
).astype(np.uint8)


def _rle_container(w: int, h: int, data: bytes) -> bytes:
    palq = np.zeros((256, 4), dtype=np.uint8)
    palq[:, 0], palq[:, 1], palq[:, 2] = _PAL[:, 2], _PAL[:, 1], _PAL[:, 0]
    offset = 54 + 1024
    hdr = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(data), 2835, 2835, 256, 0)
    return hdr + info + palq.tobytes() + data


class TestRle8CorruptInput:
    def test_run_overflowing_row_width_raises(self):
        # 4-wide row, a 9-pixel run: must not silently clip
        data = bytes([9, 3]) + b"\x00\x00" + b"\x00\x01"
        with pytest.raises(ValueError, match="corrupt RLE8"):
            decode_bmp(_rle_container(4, 2, data))

    def test_too_many_end_of_line_markers_raises(self):
        # 1-row image but a run arrives after two EOLs -> row index == h
        data = b"\x00\x00" + b"\x00\x00" + bytes([2, 1]) + b"\x00\x01"
        with pytest.raises(ValueError, match="corrupt RLE8"):
            decode_bmp(_rle_container(4, 1, data))

    def test_absolute_mode_overflowing_row_raises(self):
        data = bytes([0, 6]) + bytes(6) + b"\x00\x01"  # 6 literals into w=4
        with pytest.raises(ValueError, match="corrupt RLE8"):
            decode_bmp(_rle_container(4, 1, data))

    def test_absolute_mode_truncated_payload_raises(self):
        # declares 4 literals but the payload ends after 1
        data = bytes([0, 4]) + bytes(1)
        with pytest.raises(ValueError, match="corrupt RLE8"):
            decode_bmp(_rle_container(8, 1, data))

    def test_trailing_eol_at_exact_height_ok(self):
        # the normal encoder shape: run, EOL (row becomes h), EOB — legal
        idx = np.full((1, 4), 9, dtype=np.uint8)
        assert (decode_bmp(encode_bmp_rle8(idx, _PAL)) == _PAL[idx]).all()


class TestSpread:
    def test_single_file_scan_is_repartitioned(self, spark, sf_dir):
        from hdc_dataengineering_sqlsync_spark.operators.dedup import _spread

        df = spark.read.parquet(f"{sf_dir}/nation.parquet")
        out = _spread(df)
        assert "Exchange" in out._jdf.queryExecution().optimizedPlan().toString() or (
            out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
        )

    def test_exchange_output_left_alone(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from hdc_dataengineering_sqlsync_spark.operators.dedup import _spread

        # spark.range has no leaf files -> empty inputFiles() listing,
        # the documented "already shuffled / in-memory" case
        agg = spark.range(100).groupBy((F.col("id") % 5).alias("k")).agg(F.count("*").alias("c"))
        out = _spread(agg)
        # no NEW node: the returned plan is the same object graph
        assert out is agg

    def test_wide_file_input_not_repartitioned(self, spark, sf_dir, tmp_path):
        from hdc_dataengineering_sqlsync_spark.operators.dedup import _spread

        target = spark.sparkContext.defaultParallelism
        path = str(tmp_path / "many")
        spark.range(target * 10).repartition(target).write.parquet(path)
        df = spark.read.parquet(path)
        assert len(df.inputFiles()) >= target
        assert _spread(df) is df


class TestJpegCodec:
    """Baseline JPEG codec (operators/jpeg.py).

    The entropy layer is lossless — coefficient-exact roundtrips with
    nonzero ACs pin the Huffman/zigzag/DC-prediction/stuffing path that
    the constant-block oracle qid (multimodal_decode_jpeg) cannot reach.
    """

    def test_coefficient_roundtrip_random(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from hdc_dataengineering_sqlsync_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg_from_coeffs,
        )

        @settings(max_examples=20, deadline=None)
        @given(
            by=st.integers(1, 3),
            bx=st.integers(1, 3),
            seed=st.integers(0, 2**31 - 1),
            density=st.floats(0.02, 0.6),
        )
        def check(by, bx, seed, density):
            rng = np.random.default_rng(seed)
            coeffs = {}
            for nm in ("y", "cb", "cr"):
                c = rng.integers(-1023, 1024, (by, bx, 8, 8))  # AC size <= 10
                c = np.where(rng.random((by, bx, 8, 8)) < density, c, 0)
                c[..., 0, 0] = rng.integers(-1023, 1024, (by, bx))
                coeffs[nm] = c
            payload = encode_jpeg_from_coeffs(coeffs, bx * 8, by * 8)
            dec, (w, h, quant) = decode_jpeg(payload, return_coeffs=True)
            assert (w, h) == (bx * 8, by * 8)
            for nm in coeffs:
                assert (dec[nm] == coeffs[nm]).all()

        check()

    def test_long_zero_runs_exercise_zrl(self):
        from hdc_dataengineering_sqlsync_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg_from_coeffs,
        )

        # one AC at the very end of the zigzag forces 3 ZRL emissions
        c = {nm: np.zeros((1, 1, 8, 8), dtype=np.int64) for nm in ("y", "cb", "cr")}
        c["y"][0, 0, 7, 7] = 5  # zigzag index 63: run of 62 zeros
        dec, _ = decode_jpeg(encode_jpeg_from_coeffs(c, 8, 8), return_coeffs=True)
        assert dec["y"][0, 0, 7, 7] == 5
        assert dec["y"].sum() == 5

    def test_constant_gray_blocks_integer_closed_form(self):
        from hdc_dataengineering_sqlsync_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        import math

        for v in [0, 2, 50, 118, 135, 254, 255]:
            px = np.full((16, 16, 3), v, dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(px))
            k = math.floor((16 * (v - 128) + 17) / 34)
            expect = min(255, max(0, (17 * k + 1028) // 8))
            if ((k % 8) + 8) % 8 != 4:  # safe residue class only
                assert (out == expect).all(), (v, expect, np.unique(out))

    def test_lossy_error_bounded_on_random_images(self):
        from hdc_dataengineering_sqlsync_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(px))
        assert out.shape == px.shape
        rms = float(np.sqrt(((out.astype(float) - px.astype(float)) ** 2).mean()))
        assert rms < 30.0

    def test_non_multiple_of_8_dims_crop_back(self):
        from hdc_dataengineering_sqlsync_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, (10, 13, 3)).astype(np.uint8)
        assert decode_jpeg(encode_jpeg(px)).shape == (10, 13, 3)

    def test_corrupt_inputs_raise(self):
        from hdc_dataengineering_sqlsync_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x00\x01\x02")
        good = encode_jpeg(np.full((8, 8, 3), 90, dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_jpeg(good[:40])  # truncated mid-segment
        with pytest.raises(ValueError):
            decode_jpeg(good[:-20])  # truncated entropy stream / missing EOI


class TestSyntheticArrowReaderValidation:
    def test_negative_rows_raises(self):
        from hdc_dataengineering_sqlsync_spark.sources.pydatasource import (
            SyntheticArrowReader,
        )

        with pytest.raises(ValueError, match="rows must be >= 0"):
            SyntheticArrowReader({"rows": "-5"})

    def test_zero_partitions_raises(self):
        from hdc_dataengineering_sqlsync_spark.sources.pydatasource import (
            SyntheticArrowReader,
        )

        with pytest.raises(ValueError, match="partitions must be >= 1"):
            SyntheticArrowReader({"rows": "10", "partitions": "0"})

    def test_zero_rows_yields_empty_partitions(self):
        from hdc_dataengineering_sqlsync_spark.sources.pydatasource import (
            SyntheticArrowReader,
        )

        r = SyntheticArrowReader({"rows": "0", "partitions": "2"})
        parts = r.partitions()
        assert len(parts) == 2
        assert list(r.read(parts[0])) == []


class TestRoundEightQidSemantics:
    """Property pins for the round-8 batch B/C qids, beyond the oracle
    value-match the parametrized catalog test already enforces."""

    def test_shapley_efficiency_axiom(self, spark, sf_dir, oracle):
        """Sum of channel credits (in 1/24 units) must equal
        24 * (v(full) - v(empty)): all conversion credit not explained by
        the empty coalition is distributed, none invented."""
        from hdc_dataengineering_sqlsync_spark.plans import CATALOG

        rows = CATALOG["wl_shapley_attribution_exact"].fn(spark, sf_dir).collect()
        total = sum(r.shapley_24ths for r in rows)
        v_full, v_empty = oracle.execute(
            """
            WITH fp AS (SELECT user_id, min(ts) AS t0 FROM events
                        WHERE event_type = 'purchase' GROUP BY user_id),
            m AS (
              SELECT fp.user_id, count(e.user_id) AS touches
              FROM fp LEFT JOIN events e
                ON e.user_id = fp.user_id AND e.ts < fp.t0
                   AND e.event_type <> 'purchase'
              GROUP BY fp.user_id
            )
            SELECT count(*), sum(CASE WHEN touches = 0 THEN 1 ELSE 0 END) FROM m
            """
        ).fetchone()
        assert total == 24 * (v_full - (v_empty or 0))

    def test_cms_never_underestimates(self, spark, sf_dir):
        from hdc_dataengineering_sqlsync_spark.plans import CATALOG

        rows = CATALOG["sketch_cms_exact_counters"].fn(spark, sf_dir).collect()
        assert len(rows) == 5
        for r in rows:
            assert r.over_by >= 0, r
            assert r.cms_est == r.true_cnt + r.over_by

    def test_vshape_depths_strictly_positive(self, spark, sf_dir):
        """Every V-bottom sits below its run start by construction — a
        zero or negative depth would mean the run-start carry broke."""
        from hdc_dataengineering_sqlsync_spark.plans import CATALOG

        rows = CATALOG["win_match_recognize_vshape"].fn(spark, sf_dir).collect()
        for r in rows:
            assert r.n_vbottoms > 0
            assert r.depth_cents >= r.n_vbottoms  # each depth >= 1 cent
            assert r.max_depth_cents >= 1

    def test_rowgroup_stats_exact_thousand_splits(self, spark, sf_dir):
        from hdc_dataengineering_sqlsync_spark.plans import CATALOG

        rows = CATALOG["scan_parquet_rowgroup_stats"].fn(spark, sf_dir).collect()
        assert rows, "no row groups"
        for r in rows[:-1]:
            assert r.n_rows == 1000
        assert 0 < rows[-1].n_rows <= 1000
        # zone maps of a sorted file must be non-overlapping and ordered
        for a, b in zip(rows, rows[1:]):
            assert a.max_key <= b.min_key

    def test_bitemporal_counts_match_eligible_customers(self, spark, sf_dir, oracle):
        from hdc_dataengineering_sqlsync_spark.plans import CATALOG

        rows = CATALOG["sync_bitemporal_2d_asof"].fn(spark, sf_dir).collect()
        n = sum(r.n_customers for r in rows)
        (expect,) = oracle.execute(
            """
            SELECT count(DISTINCT o_custkey) FROM orders
            WHERE CAST(o_orderdate AS DATE) <= DATE '1996-07-01'
              AND CAST(o_orderdate AS DATE)
                  + (o_orderkey % 7) * INTERVAL 1 DAY <= DATE '1996-09-01'
            """
        ).fetchone()
        assert n == expect


class TestCodeReviewR8Fixes:
    """Pins for the round-8 /code-review findings."""

    def test_jpeg_fill_bytes_before_marker_are_skipped(self):
        """ITU T.81 B.1.1.2 allows 0xFF fill bytes before a marker code;
        some encoders emit them. FF FF DB must parse as DQT."""
        from hdc_dataengineering_sqlsync_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        px = np.full((8, 8, 3), 135, dtype=np.uint8)
        good = encode_jpeg(px)
        # inject a fill byte before the first DQT marker (FF DB)
        i = good.index(b"\xff\xdb")
        padded = good[:i] + b"\xff" + good[i:]
        assert (decode_jpeg(padded) == decode_jpeg(good)).all()

    def test_jpeg_quant_out_of_range_raises(self):
        from hdc_dataengineering_sqlsync_spark.operators.jpeg import encode_jpeg

        px = np.full((8, 8, 3), 50, dtype=np.uint8)
        with pytest.raises(ValueError, match="quant table"):
            encode_jpeg(px, quant=np.full((8, 8), 300, dtype=np.int64))
        with pytest.raises(ValueError, match="quant table"):
            encode_jpeg(px, quant=np.zeros((8, 8), dtype=np.int64))

    def test_jpeg_coefficient_out_of_huffman_range_raises(self):
        from hdc_dataengineering_sqlsync_spark.operators.jpeg import (
            encode_jpeg_from_coeffs,
        )

        c = {nm: np.zeros((1, 1, 8, 8), dtype=np.int64) for nm in ("y", "cb", "cr")}
        c["y"][0, 0, 0, 1] = 1024  # AC size 11 > alphabet max 10
        with pytest.raises(ValueError, match="AC coefficient"):
            encode_jpeg_from_coeffs(c, 8, 8)
        c["y"][0, 0, 0, 1] = 0
        c["y"][0, 0, 0, 0] = 2048  # DC diff size 12 > 11
        with pytest.raises(ValueError, match="DC diff"):
            encode_jpeg_from_coeffs(c, 8, 8)

    def test_hazard_sweep_floor_div_anchor_not_flagged(self):
        import importlib.util
        import re

        spec = importlib.util.spec_from_file_location(
            "ohs", "scripts/oracle_hazard_sweep.py"
        )
        ohs = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ohs)

        def n_flags(sql):
            out = 0
            for a, b in ohs._round_calls(sql):
                arg = sql[a:b]
                for im in re.finditer(r"\bround\s*\(", arg, re.IGNORECASE):
                    io_ = arg.index("(", im.start())
                    ic = ohs._match_paren(arg, io_)
                    if ic < 0:
                        continue
                    if not ohs._is_integer_anchored(sql, a + im.start(), a + ic + 1):
                        out += 1
            return out

        assert n_flags("SELECT round(round(x*100)/100.0, 2) FROM t") == 1
        assert n_flags("SELECT round(CAST(round(x*100) AS BIGINT)/100.0, 2) FROM t") == 0
        assert n_flags("SELECT round((round(x*100) // 1) / 7.0, 4) FROM t") == 0


class TestTiffCodec:
    """Baseline TIFF codec (operators/tiff.py) — IFD walk corners the
    multimodal_decode_tiff fixture never hits."""

    def test_roundtrip_various_dims_and_strip_sizes(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from hdc_dataengineering_sqlsync_spark.operators.tiff import (
            decode_tiff,
            encode_tiff,
        )

        @settings(max_examples=25, deadline=None)
        @given(
            h=st.integers(1, 20),
            w=st.integers(1, 30),
            rps=st.integers(1, 25),
            seed=st.integers(0, 2**31 - 1),
            order=st.sampled_from(["II", "MM"]),
        )
        def check(h, w, rps, seed, order):
            rng = np.random.default_rng(seed)
            px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            enc = encode_tiff(px, rows_per_strip=rps, byte_order=order)
            assert (decode_tiff(enc) == px).all()

        check()

    def test_single_strip_inline_offset(self):
        # one strip -> offsets/counts inline in the 4-byte value slot
        from hdc_dataengineering_sqlsync_spark.operators.tiff import (
            decode_tiff,
            encode_tiff,
        )

        px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        assert (decode_tiff(encode_tiff(px, rows_per_strip=10)) == px).all()

    def test_corrupt_inputs_raise(self):
        from hdc_dataengineering_sqlsync_spark.operators.tiff import (
            decode_tiff,
            encode_tiff,
        )

        # r12: MM is decoded for real now — a truncated MM payload is a
        # corrupt-payload error like its II twin, not a stub boundary
        with pytest.raises(ValueError):
            decode_tiff(b"MM\x00\x2a" + bytes(8))
        with pytest.raises(ValueError, match="no II/MM order mark"):
            decode_tiff(b"XX\x00\x2a" + bytes(8))  # garbage byte order
        with pytest.raises(ValueError, match="bad TIFF magic"):
            decode_tiff(b"MM\x2a\x00" + bytes(8))  # LE magic under a BE mark
        good = encode_tiff(np.zeros((4, 4, 3), dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_tiff(good[:20])  # truncated before IFD
        with pytest.raises(ValueError):
            decode_tiff(good[:6])  # truncated header

    def test_big_endian_roundtrip_and_cross_order_equality(self):
        # r12: the IFD walk is byte-order generic — an MM encode of the
        # same pixels decodes identically to the II encode, multi-strip
        # included, and the two files differ ONLY in container integers
        # (same length, same pixel bytes)
        import numpy as np

        from hdc_dataengineering_sqlsync_spark.operators.tiff import (
            decode_tiff,
            encode_tiff,
        )

        rng = np.random.default_rng(12)
        px = rng.integers(0, 256, (7, 5, 3)).astype(np.uint8)
        le = encode_tiff(px, rows_per_strip=3)
        be = encode_tiff(px, rows_per_strip=3, byte_order="MM")
        assert le[:2] == b"II" and be[:2] == b"MM"
        assert len(le) == len(be)
        assert (decode_tiff(be) == px).all()
        assert (decode_tiff(le) == decode_tiff(be)).all()
        _, meta = decode_tiff(be, return_meta=True)
        assert meta["byte_order"] == "MM" and meta["n_strips"] == 3
        # orientation rides an inlined SHORT slot — the left-justified
        # placement is the MM-specific hazard, so pin it explicitly
        _, m2 = decode_tiff(
            encode_tiff(px, rows_per_strip=7, orientation=6, byte_order="MM"),
            return_meta=True,
        )
        assert m2["orientation"] == 6


class TestCodecEdgePaths:
    """Paths only external files would normally reach."""

    def test_jpeg_grayscale_single_component_decode(self):
        """decode_jpeg supports 1-component (grayscale) baseline JPEGs —
        build one from the module's own entropy primitives and check the
        constant-block closed form on the replicated-channel output."""
        import struct

        from hdc_dataengineering_sqlsync_spark.operators import jpeg as J

        v, q = 135, 17
        k = int(np.floor((16 * (v - 128) + 17) / 34))
        out = bytearray(b"\xff\xd8")
        zz = np.full(64, q, dtype=np.uint8)
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + zz.tobytes()
        out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        out += struct.pack("BBB", 1, 0x11, 0)
        for tc_th, bits, vals in ((0x00, J._DC_BITS, J._DC_VALS), (0x10, J._AC_BITS, J._AC_VALS)):
            out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(vals), tc_th)
            out += bytes(bits) + bytes(vals)
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + struct.pack("BB", 1, 0x00)
        out += struct.pack("BBB", 0, 63, 0)
        w = J._BitWriter()
        size, bits_v = J._magnitude(k)  # DC diff from pred 0
        code, length = J._DC_CODES[size]
        w.write(code, length)
        w.write(bits_v, size)
        ec, el = J._AC_CODES[0x00]
        w.write(ec, el)  # EOB
        out += w.flush() + b"\xff\xd9"
        px = J.decode_jpeg(bytes(out))
        expect = min(255, max(0, (17 * k + 1028) // 8))
        assert px.shape == (8, 8, 3)
        assert (px == expect).all()
        # all three output channels replicate the gray plane
        assert (px[:, :, 0] == px[:, :, 1]).all() and (px[:, :, 1] == px[:, :, 2]).all()

    def test_tiff_unknown_tags_ignored(self):
        """A TIFF with extra (unknown) IFD tags must still decode — real
        files carry Software/DateTime/etc. tags everywhere."""
        import struct

        from hdc_dataengineering_sqlsync_spark.operators.tiff import (
            decode_tiff,
            encode_tiff,
        )

        px = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
        payload = bytearray(encode_tiff(px, rows_per_strip=2))
        # parse the IFD, append a fake Software (305, SHORT, 1, 7) entry
        ifd_off = struct.unpack_from("<I", payload, 4)[0]
        n = struct.unpack_from("<H", payload, ifd_off)[0]
        entries = bytearray(payload[ifd_off + 2 : ifd_off + 2 + n * 12])
        rest = bytes(payload[ifd_off + 2 + n * 12 :])
        # the BitsPerSample array lives AFTER the IFD; inserting an entry
        # shifts it by 12 — patch that tag's stored offset accordingly
        for i in range(n):
            tag, typ, count = struct.unpack_from("<HHI", entries, i * 12)
            if tag == 258:
                (off,) = struct.unpack_from("<I", entries, i * 12 + 8)
                struct.pack_into("<I", entries, i * 12 + 8, off + 12)
        extra = struct.pack("<HHII", 305, 3, 1, 7)
        rebuilt = (
            bytes(payload[:ifd_off])
            + struct.pack("<H", n + 1)
            + bytes(entries)
            + extra
            + rest
        )
        assert (decode_tiff(rebuilt) == px).all()

    @staticmethod
    def _with_extra_tag(payload: bytes, entry12: bytes) -> bytes:
        """Append one 12-byte IFD entry to an encode_tiff payload by
        relocating the IFD to the end (strip/array offsets untouched)."""
        import struct

        ifd_off = struct.unpack_from("<I", payload, 4)[0]
        n = struct.unpack_from("<H", payload, ifd_off)[0]
        entries = payload[ifd_off + 2 : ifd_off + 2 + n * 12]
        new_ifd = struct.pack("<H", n + 1) + entries + entry12 + struct.pack("<I", 0)
        out = bytearray(payload) + new_ifd
        struct.pack_into("<I", out, 4, len(payload))
        return bytes(out)

    def test_tiff_ascii_and_rational_tags_ignored(self):
        """Unhandled tag TYPES (ASCII=2, RATIONAL=5) on ignorable tags must
        be skipped, not raise — real TIFFs carry Software (ASCII) and
        XResolution (RATIONAL) everywhere (r8 ADVICE)."""
        import struct

        from hdc_dataengineering_sqlsync_spark.operators.tiff import (
            decode_tiff,
            encode_tiff,
        )

        px = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
        payload = encode_tiff(px, rows_per_strip=2)
        ascii_tag = struct.pack("<HHI4s", 305, 2, 4, b"hi\x00\x00")  # Software
        rational = struct.pack("<HHII", 282, 5, 1, len(payload))  # XResolution
        for extra in (ascii_tag, rational):
            out, meta = decode_tiff(
                self._with_extra_tag(payload, extra), return_meta=True
            )
            assert (out == px).all()
            assert meta["n_strips"] == 2  # 4 rows / RowsPerStrip 2
            assert meta["n_tags"] == 10  # 9 baseline + the skipped extra

    def test_tiff_required_tag_unsupported_type_raises(self):
        """An unsupported type on a REQUIRED tag is still an error — and a
        ValueError, not a KeyError (decoder convention, r8 ADVICE)."""
        import struct

        from hdc_dataengineering_sqlsync_spark.operators.tiff import (
            decode_tiff,
            encode_tiff,
        )

        px = np.zeros((4, 4, 3), dtype=np.uint8)
        payload = encode_tiff(px, rows_per_strip=2)
        ifd_off = struct.unpack_from("<I", payload, 4)[0]
        n = struct.unpack_from("<H", payload, ifd_off)[0]
        entries = bytearray(payload[ifd_off + 2 : ifd_off + 2 + n * 12])
        kept, mangled = [], []
        for i in range(n):
            tag, typ, count = struct.unpack_from("<HHI", entries, i * 12)
            if tag == 273:  # StripOffsets: flip its type to RATIONAL
                e = bytearray(entries[i * 12 : (i + 1) * 12])
                struct.pack_into("<H", e, 2, 5)
                mangled.append(bytes(e))
            else:
                kept.append(bytes(entries[i * 12 : (i + 1) * 12]))
        new_ifd = (
            struct.pack("<H", n) + b"".join(kept + mangled) + struct.pack("<I", 0)
        )
        out = bytearray(payload) + new_ifd
        struct.pack_into("<I", out, 4, len(payload))
        with pytest.raises(ValueError, match="unsupported type 5"):
            decode_tiff(bytes(out))
        # and a MISSING strip table is also a ValueError, not a KeyError
        no_strip = struct.pack("<H", n - 1) + b"".join(kept) + struct.pack("<I", 0)
        out2 = bytearray(payload) + no_strip
        struct.pack_into("<I", out2, 4, len(payload))
        with pytest.raises(ValueError, match="StripOffsets"):
            decode_tiff(bytes(out2))

    def test_jpeg_zero_quant_rejected_before_fdct(self):
        """A 0 quant step must raise BEFORE the FDCT/quantize pass — no
        numpy divide/cast warnings (r8 ADVICE + VERDICT #7)."""
        import warnings

        from hdc_dataengineering_sqlsync_spark.operators.jpeg import (
            DEFAULT_QUANT,
            encode_jpeg,
        )

        px = np.zeros((8, 8, 3), dtype=np.uint8)
        bad = DEFAULT_QUANT.copy()
        bad[0, 0] = 0
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any RuntimeWarning -> failure
            with pytest.raises(ValueError, match="1..255"):
                encode_jpeg(px, quant=bad)
