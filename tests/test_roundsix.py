"""Round-6 unit tests: PNG codec (all five filter predictors) and the
deterministic merges-table BPE (engine apply == pure-Python reference)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
    decode_png,
    encode_png,
)
from hdc_dataengineering_sqlsync_spark.operators.multimodal import decode_image
from hdc_dataengineering_sqlsync_spark.plans.roundsix import (
    _BPE_MERGES,
    _BPE_STEPS,
    bpe_tokenize_reference,
    bpe_tokens_spark,
)


# --------------------------------------------------------------- PNG codec


@pytest.mark.parametrize("h,w", [(1, 1), (2, 1), (5, 3), (6, 8), (11, 17), (12, 4)])
def test_png_roundtrip_all_filters(h, w):
    """h >= 5 exercises every predictor (encoder filter type is y % 5);
    the small shapes hit the no-left-neighbor / no-up-row edges."""
    rng = np.random.default_rng(h * 100 + w)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_png(encode_png(px))
    assert out.shape == (h, w, 3)
    assert (out == px).all()


def test_png_batch_parity_with_scalar():
    """The corpus-scale batch codec (r9: unfilter vectorized across every
    same-(w,h,filter-vector) class) must be BIT-identical to the scalar
    reference — encode bytes and decode pixels both, over a mixed-class
    input whose order must be preserved."""
    from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
        decode_png_batch,
        encode_png_batch,
    )

    rng = np.random.default_rng(42)
    for h, w in [(1, 1), (3, 4), (5, 8), (12, 14)]:
        stack = rng.integers(0, 256, (7, h, w, 3), dtype=np.uint8)
        assert encode_png_batch(stack) == [encode_png(stack[i]) for i in range(7)]
    imgs = [
        rng.integers(0, 256, (3 + (k % 4) * 3, 4 + (k % 6) * 2, 3), dtype=np.uint8)
        for k in range(25)
    ]
    outs = decode_png_batch([encode_png(im) for im in imgs])
    for im, out in zip(imgs, outs):
        assert (out == im).all()


def test_png_container_layout():
    """Signature, IHDR fields, chunk CRCs, IEND terminator."""
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = encode_png(px)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    (ln,) = struct.unpack_from(">I", payload, 8)
    assert payload[12:16] == b"IHDR" and ln == 13
    w, h, depth, ctype, comp, filt, interlace = struct.unpack_from(">IIBBBBB", payload, 16)
    assert (w, h, depth, ctype, comp, filt, interlace) == (3, 2, 8, 2, 0, 0, 0)
    # every chunk CRC must verify
    pos = 8
    names = []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        name = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        assert crc == (zlib.crc32(name + body) & 0xFFFFFFFF), name
        names.append(bytes(name))
        pos += 12 + ln
    assert names == [b"IHDR", b"IDAT", b"IEND"]


def test_png_filter_bytes_cycle():
    """The encoder really emits filter types 0..4 (decoder coverage proof)."""
    px = np.random.default_rng(1).integers(0, 256, (7, 4, 3), dtype=np.uint8)
    payload = encode_png(px)
    (ln,) = struct.unpack_from(">I", payload, 33)
    assert payload[37:41] == b"IDAT"
    raw = zlib.decompress(payload[41 : 41 + ln])
    stride = 4 * 3 + 1
    assert [raw[y * stride] for y in range(7)] == [0, 1, 2, 3, 4, 0, 1]


def test_decode_image_dispatches_png():
    px = np.random.default_rng(2).integers(0, 256, (6, 5, 3), dtype=np.uint8)
    assert (decode_image(encode_png(px)) == px).all()


def test_decode_image_still_raises_for_compressed_codecs():
    # JPEG dispatches to the real operators/jpeg.py codec since r10; a
    # corrupt payload surfaces as the codec's ValueError, not a stub raise
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)  # JPEG SOI, garbage body
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")  # WebP: genuinely library-bound


def test_png_rejects_non_truecolor():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(encode_png(px))
    payload[25] = 6  # color type RGBA (decode_png doesn't verify CRCs)
    with pytest.raises(ValueError, match="truecolor"):
        decode_png(bytes(payload))


# ------------------------------------------------------------ BPE tokenizer

_FIXTURE_VOCAB = [
    "join", "hash", "row", "batch", "scan", "customer", "column", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream", "window", "spark", "a", "group",
    "part", "big", "sort", "query", "fast", "the", "dup",
]

_EDGE_WORDS = [
    "a",            # single char, zero merges
    "aaa",          # overlapping pair occurrences (left-to-right, non-greedy)
    "zzzz",         # no pair ever ranks
    "smalll",       # merge chain then a dangling repeat
    "rowrow",       # merged token adjacent to itself
    "erer",         # rank-0 pair twice
    "tableer",      # late merge creating a new rankable pair
    "xcustomer",    # ranked word embedded after an unranked char (9 chars
                    #  = the unroll depth bound; 10+ now raises by design)
    "rowrowrow",    # repeated merged token, 9 chars
]


def test_bpe_reference_known_tokenizations():
    assert bpe_tokenize_reference("customer") == ["customer"]
    assert bpe_tokenize_reference("table") == ["t", "a", "b", "l", "e"]
    assert bpe_tokenize_reference("join") == ["join"]
    assert bpe_tokenize_reference("aaa") == ["a", "a", "a"]
    assert bpe_tokenize_reference("erer") == ["er", "er"]


def test_bpe_merges_table_reproduces_from_fixture_vocab():
    """The frozen table IS the frequency-weighted training output on the
    sf0.01 vocabulary (ties lexicographic); guards accidental edits."""
    import duckdb

    vocab = dict(
        duckdb.sql(
            "SELECT word, count(*) FROM (SELECT unnest("
            "string_split_regex(lower(text),'\\s+')) AS word "
            "FROM '/root/testdata/sf0.01/documents.parquet') GROUP BY word"
        ).fetchall()
    )
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(len(_BPE_MERGES)):
        pairs: dict[tuple[str, str], int] = {}
        for w, toks in words.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] = pairs.get((toks[i], toks[i + 1]), 0) + vocab[w]
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        for w, toks in words.items():
            out, i = [], 0
            while i < len(toks):
                if i < len(toks) - 1 and (toks[i], toks[i + 1]) == best:
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            words[w] = out
    assert merges == _BPE_MERGES


def test_bpe_unroll_depth_covers_fixture_vocab():
    """Every fixture word reaches its fixpoint within _BPE_STEPS merges
    (a word of L chars needs at most L-1)."""
    assert max(len(w) for w in _FIXTURE_VOCAB) - 1 <= _BPE_STEPS


def test_bpe_spark_matches_reference(spark):
    words = sorted(set(_FIXTURE_VOCAB + _EDGE_WORDS))
    vocab = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: list(r["bpe_tokens"]) for r in bpe_tokens_spark(vocab).collect()}
    for w in words:
        assert got[w] == bpe_tokenize_reference(w), w


def test_bpe_spark_task_check_matches_eager(spark):
    """check='task' (the catalog query's no-extra-job mode, r12) tokenizes
    identically to the default eager mode on every fixture + edge word."""
    words = sorted(set(_FIXTURE_VOCAB + _EDGE_WORDS))
    vocab = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: list(r["bpe_tokens"])
        for r in bpe_tokens_spark(vocab, check="task").collect()
    }
    for w in words:
        assert got[w] == bpe_tokenize_reference(w), w


def test_bpe_unrolled_form_matches_reference(spark):
    """The retired compile-time-unrolled HOF form (pre-r12 catalog path)
    stays pinned to the reference — the equivalence witness for the r12
    mapInPandas swap."""
    from hdc_dataengineering_sqlsync_spark.plans.roundsix import (
        _bpe_tokens_spark_unrolled,
    )

    words = sorted(set(_FIXTURE_VOCAB + _EDGE_WORDS))
    vocab = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: list(r["bpe_tokens"])
        for r in _bpe_tokens_spark_unrolled(vocab).collect()
    }
    for w in words:
        assert got[w] == bpe_tokenize_reference(w), w


def test_bpe_task_check_rejects_long_word_at_execution(spark):
    """check='task' enforces the same fixpoint-depth bound as eager, just
    at execution time inside the worker (fail-loud contract preserved)."""
    from hdc_dataengineering_sqlsync_spark.plans.roundsix import _BPE_STEPS

    too_long = "er" * (_BPE_STEPS // 2 + 5)
    vocab = spark.createDataFrame([(too_long,)], "word string")
    df = bpe_tokens_spark(vocab, check="task")  # no raise at build time
    with pytest.raises(Exception, match="unrolled BPE"):
        df.collect()


def test_bpe_duckdb_oracle_matches_reference(oracle, sf_dir):
    """The oracle's unrolled CTE chain tokenizes the live fixture vocab
    identically to the reference (token-level, not just counts)."""
    from hdc_dataengineering_sqlsync_spark.plans.roundsix import _bpe_oracle_steps

    sql = f"""
    WITH wc AS (
      SELECT DISTINCT unnest(string_split_regex(lower(text), '\\s+')) AS word
      FROM documents
    ),
    bpe0 AS (SELECT word, string_split(word,'') AS t FROM wc WHERE word <> '')
    {_bpe_oracle_steps()}
    SELECT word, t FROM bpe_final
    """
    for word, toks in oracle.execute(sql).fetchall():
        assert list(toks) == bpe_tokenize_reference(word), word


# ------------------------------------------------- ADVICE r5: option guards


def test_synthetic_arrow_reader_validates_options():
    from hdc_dataengineering_sqlsync_spark.sources.pydatasource import SyntheticArrowReader

    with pytest.raises(ValueError, match="partitions"):
        SyntheticArrowReader({"rows": 10, "partitions": 0})
    with pytest.raises(ValueError, match="rows"):
        SyntheticArrowReader({"rows": -1, "partitions": 2})
    r = SyntheticArrowReader({"rows": 0, "partitions": 2})  # empty is legal
    assert len(r.partitions()) == 2


# --------------------------------------------------------------- GIF codec


@pytest.mark.parametrize("h,w,p", [(1, 1, 4), (3, 5, 16), (8, 8, 16), (40, 60, 16), (9, 9, 3)])
def test_gif_roundtrip(h, w, p):
    from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(h * 100 + w)
    pal = rng.integers(0, 256, (p, 3), dtype=np.uint8)
    idx = rng.integers(0, p, (h, w), dtype=np.uint8)
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()


def test_gif_lzw_dictionary_reset():
    """A long low-entropy stream fills the 12-bit code space and forces the
    CLEAR-code reset path on both sides."""
    from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
        decode_gif,
        encode_gif,
    )

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = (np.indices((300, 300)).sum(axis=0) % 4).astype(np.uint8)
    payload = encode_gif(idx, pal)
    assert len(payload) < idx.size  # really compressed
    assert (decode_gif(payload) == pal[idx]).all()


def test_gif_skips_extension_blocks():
    """decode must walk over 0x21 extension blocks (real encoders emit
    GCE/comment extensions before the image descriptor)."""
    from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
        decode_gif,
        encode_gif,
    )

    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    payload = bytearray(encode_gif(idx, pal))
    # splice a Graphic Control Extension right before the image descriptor
    desc = payload.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    patched = bytes(payload[:desc]) + gce + bytes(payload[desc:])
    assert (decode_gif(patched) == pal[idx]).all()


def test_decode_image_dispatches_gif():
    from hdc_dataengineering_sqlsync_spark.operators.media_codecs import encode_gif

    pal = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    idx = np.array([[0, 1, 1]], dtype=np.uint8)
    assert (decode_image(encode_gif(idx, pal)) == pal[idx]).all()


# ---------------------------------------------------- persisted IVF layout


def test_ivf_persisted_index_layout(spark, sf_dir):
    """The index table really lands partitioned by cell (directory-level
    posting lists), and the query output is exact top-3 per query."""
    import pathlib

    from hdc_dataengineering_sqlsync_spark.plans import CATALOG
    from hdc_dataengineering_sqlsync_spark.plans.scans import _rt_base

    rows = CATALOG["simsearch_ivf_persisted"].fn(spark, sf_dir).collect()
    idx_dir = pathlib.Path(str(_rt_base(sf_dir) / "ivf_index"))
    cells = [p.name for p in idx_dir.iterdir() if p.name.startswith("cell=")]
    assert len(cells) >= 2, cells
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["dot"]))
    for q, rr in per_q.items():
        ranks = [x[0] for x in sorted(rr)]
        assert ranks == list(range(1, len(ranks) + 1)), (q, rr)
        dots = [x[1] for x in sorted(rr)]
        assert dots == sorted(dots, reverse=True), (q, rr)


def test_gif_rejects_oversized_palette():
    from hdc_dataengineering_sqlsync_spark.operators.media_codecs import encode_gif

    pal = np.zeros((257, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(np.zeros((2, 2), dtype=np.uint8), pal)


def test_bpe_rejects_vocab_beyond_unroll_depth(spark):
    from hdc_dataengineering_sqlsync_spark.plans.roundsix import _BPE_STEPS

    too_long = "er" * (_BPE_STEPS // 2 + 5)  # rankable pairs, > steps+1 chars
    vocab = spark.createDataFrame([(too_long,)], "word string")
    with pytest.raises(ValueError, match="unrolled BPE"):
        bpe_tokens_spark(vocab)
