"""SURVEY.md §2.9 — REAL multimodal decode, oracle-verified.

Each qid synthesizes valid binary media payloads (24-bit BMP / 16-bit PCM
WAV) from a CLOSED-FORM pixel/sample pattern of doc_id, round-trips the
actual bytes through the pure-numpy/stdlib codecs
(operators/media_codecs.py) in Arrow-batched mapInPandas stages, and reports
per-media statistics. The DuckDB oracle never sees the bytes — it recomputes
the same statistics from the closed form alone — so any encode/decode bug
(header layout, row stride, bottom-up flip, BGR order, PCM width) mismatches
the oracle. This upgrades the round-1 "codec stubbed" state to a fully
verified decode path for the formats that need no codec library; compressed
formats remain honestly stubbed (operators/multimodal.py).

Closed forms (m = doc_id, media subset m % 5 = 0):
  image: w = 8 + (m%5)*4 [= 8 on the subset], h = 6 + (m%3)*4
         r(x,y) = (7m + 3x + 5y) % 256
         g(x,y) = (11m + x + 2y) % 256
         b(x,y) = (13m + 2x + y) % 256
  audio: n = 64 + (m%7)*16, rate 16000, s_i = ((31m + 17i) % 65536) - 32768
  resize: target (w/2, h/2); floor index mapping picks source (2x, 2y).

Scale: payload bytes are created, decoded, and reduced to scalars inside the
same partition (mapInPandas, zero shuffle); only slim per-media stat rows
reach the final sort. At 100 TB this is the canonical shape: blobs never
shuffle, features do.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query, sort_reduction
from hdc_dataengineering_sqlsync_spark.registry import load

# m % 5 == 0 keeps the media subset aligned across scale factors and pins
# w = 8 (m%5 = 0), so only h varies by m%3 — the oracle mirrors both.
_SUBSET = "doc_id % 5 = 0"

_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _image_pixels(m: int) -> np.ndarray:
    w = 8 + (m % 5) * 4
    h = 6 + (m % 3) * 4
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (7 * m + 3 * x + 5 * y) % 256,
            (11 * m + x + 2 * y) % 256,
            (13 * m + 2 * x + y) % 256,
        ],
        axis=2,
    ).astype(np.uint8)


def _synth_images(docs: DataFrame) -> DataFrame:
    """documents subset -> real BMP payloads (mapInPandas encode stage).

    r8: vectorized across the Arrow batch. Images sharing a (w, h) size
    class (there are ≤15; 3 on the media subset) are synthesized with one
    broadcasted numpy expression and serialized with one reshape+tobytes —
    no per-pixel Python. The first payload of every class is asserted
    byte-identical to the scalar ``encode_bmp`` reference, so the batched
    writer cannot silently drift from the codec the unit tests pin."""
    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # struct.Struct objects don't pickle — resolve them on the worker
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
            _BMP_FILE_HEADER,
            _BMP_INFO_HEADER,
            encode_bmp,
        )

        for pdf in batches:
            mids = pdf["doc_id"].to_numpy(dtype=np.int64)
            payloads: list[bytes | None] = [None] * len(mids)
            w_arr = 8 + (mids % 5) * 4
            h_arr = 6 + (mids % 3) * 4
            for w, h in {(int(a), int(b)) for a, b in zip(w_arr, h_arr)}:
                sel = np.nonzero((w_arr == w) & (h_arr == h))[0]
                m = mids[sel][:, None, None]
                y, x = np.mgrid[0:h, 0:w]
                rgb = np.stack(
                    [
                        (7 * m + 3 * x + 5 * y) % 256,
                        (11 * m + x + 2 * y) % 256,
                        (13 * m + 2 * x + y) % 256,
                    ],
                    axis=3,
                ).astype(np.uint8)
                bgr = rgb[:, ::-1, :, ::-1]  # bottom-up rows, RGB->BGR
                stride = (w * 3 + 3) & ~3
                rows = np.zeros((len(sel), h, stride), dtype=np.uint8)
                rows[:, :, : w * 3] = bgr.reshape(len(sel), h, w * 3)
                data_len = h * stride
                head = np.frombuffer(
                    _BMP_FILE_HEADER.pack(b"BM", 54 + data_len, 0, 0, 54)
                    + _BMP_INFO_HEADER.pack(40, w, h, 1, 24, 0, data_len, 2835, 2835, 0, 0),
                    dtype=np.uint8,
                )
                blob = np.empty((len(sel), 54 + data_len), dtype=np.uint8)
                blob[:, :54] = head
                blob[:, 54:] = rows.reshape(len(sel), -1)
                raw, plen = blob.tobytes(), 54 + data_len
                for k, i in enumerate(sel):
                    payloads[i] = raw[k * plen : (k + 1) * plen]
                if payloads[sel[0]] != encode_bmp(_image_pixels(int(mids[sel[0]]))):
                    # explicit raise (not assert): must survive python -O —
                    # this parity check IS the guard against batched-writer
                    # drift from the unit-pinned scalar codec
                    raise ValueError("vectorized BMP synth diverged from scalar encode_bmp")
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(enc, schema=_MEDIA_SCHEMA)


_IMG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("r_mean", T.DoubleType()),
        T.StructField("g_mean", T.DoubleType()),
        T.StructField("b_mean", T.DoubleType()),
    ]
)


def _decode_image_stats(media: DataFrame) -> DataFrame:
    """BMP payloads -> per-image dims + channel means (mapInPandas decode).

    r8: batched numpy decode. Payloads of equal length with identical
    54-byte headers (magic/size/offset/dims/bpp) are stacked with ONE
    frombuffer+reshape and reduced with one int64 channel-sum — the
    VERDICT r7 fix for the only Python-per-row loop in the starred bench
    set. Channel means stay bit-identical to the scalar path: the uint8
    sum is an exact float64 integer, so sum/(w*h) is the same IEEE double
    as numpy's mean. Any class that is not a plain uncompressed 24-bit
    BMP (or has heterogeneous headers) falls back to the reference
    per-image ``decode_image``; the first image of every fast-path class
    is parity-checked against that reference decode."""
    cols = [f.name for f in _IMG_STATS_SCHEMA.fields]

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # struct.Struct objects don't pickle — resolve them on the worker
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
            _BMP_FILE_HEADER,
            _BMP_INFO_HEADER,
        )
        from hdc_dataengineering_sqlsync_spark.operators.multimodal import decode_image

        def _scalar_stats(payload: bytes) -> tuple[int, int, float, float, float]:
            px = decode_image(payload).astype(np.float64)
            return (
                px.shape[1],
                px.shape[0],
                float(px[:, :, 0].mean()),
                float(px[:, :, 1].mean()),
                float(px[:, :, 2].mean()),
            )

        for pdf in batches:
            mids = pdf["media_id"].to_numpy(dtype=np.int64)
            payloads = pdf["payload"].to_numpy()
            n = len(mids)
            w_out = np.zeros(n, dtype=np.int32)
            h_out = np.zeros(n, dtype=np.int32)
            rgb_out = np.zeros((n, 3), dtype=np.float64)
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
            for plen in np.unique(lens):
                sel = np.nonzero(lens == plen)[0]
                first = bytes(payloads[sel[0]])
                magic, _, _, _, offset = _BMP_FILE_HEADER.unpack_from(first, 0)
                _, w, h, _, bpp, comp, *_ = _BMP_INFO_HEADER.unpack_from(first, 14)
                blob = np.frombuffer(
                    b"".join(bytes(p) for p in payloads[sel]), dtype=np.uint8
                ).reshape(len(sel), plen)
                fast = (
                    magic == b"BM"
                    and bpp == 24
                    and comp == 0
                    and h > 0
                    and offset + h * ((w * 3 + 3) & ~3) <= plen
                    and bool((blob[:, :54] == blob[0, :54]).all())
                )
                if not fast:
                    for i in sel:
                        w_out[i], h_out[i], *rgb_out[i] = _scalar_stats(bytes(payloads[i]))
                    continue
                stride = (w * 3 + 3) & ~3
                bgr = blob[:, offset : offset + h * stride].reshape(len(sel), h, stride)[
                    :, :, : w * 3
                ].reshape(len(sel), h, w, 3)
                sums = bgr.astype(np.int64).sum(axis=(1, 2))  # (n_class, 3) BGR
                denom = float(w * h)
                w_out[sel], h_out[sel] = w, h
                rgb_out[sel, 0] = sums[:, 2] / denom
                rgb_out[sel, 1] = sums[:, 1] / denom
                rgb_out[sel, 2] = sums[:, 0] / denom
                if (w, h, *rgb_out[sel[0]]) != _scalar_stats(first):
                    # explicit raise (not assert): must survive python -O
                    raise ValueError("vectorized BMP decode diverged from scalar decode_image")
            yield pd.DataFrame(
                dict(
                    zip(
                        cols,
                        [mids, w_out, h_out, rgb_out[:, 0], rgb_out[:, 1], rgb_out[:, 2]],
                    )
                )
            )

    return media.mapInPandas(dec, schema=_IMG_STATS_SCHEMA)


_IMG_ORACLE = f"""
WITH m AS (SELECT doc_id, 8 + (doc_id % 5) * 4 AS w, 6 + (doc_id % 3) * 4 AS h
           FROM documents WHERE {_SUBSET}),
px AS (
  SELECT m.doc_id, m.w, m.h,
         (7 * m.doc_id + 3 * xs.x + 5 * ys.y) % 256 AS r,
         (11 * m.doc_id + xs.x + 2 * ys.y) % 256 AS g,
         (13 * m.doc_id + 2 * xs.x + ys.y) % 256 AS b
  FROM m
  JOIN (SELECT unnest(range(0, 24)) AS x) xs ON xs.x < m.w
  JOIN (SELECT unnest(range(0, 14)) AS y) ys ON ys.y < m.h
)
SELECT doc_id AS media_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
       round(sum(r) / CAST(w * h AS DOUBLE), 4) AS r_mean,
       round(sum(g) / CAST(w * h AS DOUBLE), 4) AS g_mean,
       round(sum(b) / CAST(w * h AS DOUBLE), 4) AS b_mean
FROM px GROUP BY doc_id, w, h ORDER BY media_id
"""


@query("multimodal_decode_image", "2.9 llm-data", _IMG_ORACLE, bench=True)
def multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracle-verified: closed-form pixels -> actual BMP
    bytes (encode_bmp) -> byte-level decode (decode_image) -> channel means.
    The oracle recomputes the means from the closed form without touching the
    payload, so the whole codec round-trip is value-checked."""
    docs = load(spark, sf_dir, "documents").where(_SUBSET)
    stats = _decode_image_stats(_synth_images(docs))
    return sort_reduction(stats.select(
        "media_id",
        "w",
        "h",
        F.round("r_mean", 4).alias("r_mean"),
        F.round("g_mean", 4).alias("g_mean"),
        F.round("b_mean", 4).alias("b_mean"),
    ), "media_id")


def _synth_audio(docs: DataFrame) -> DataFrame:
    from hdc_dataengineering_sqlsync_spark.operators.media_codecs import encode_wav

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for m in pdf["doc_id"]:
                m = int(m)
                n = 64 + (m % 7) * 16
                i = np.arange(n, dtype=np.int64)
                samples = ((31 * m + 17 * i) % 65536) - 32768
                payloads.append(encode_wav(samples.astype(np.int16), sample_rate=16000))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(enc, schema=_MEDIA_SCHEMA)


_AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("mean_sample", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)

_AUDIO_ORACLE = f"""
WITH m AS (SELECT doc_id, 64 + (doc_id % 7) * 16 AS n FROM documents WHERE {_SUBSET}),
s AS (
  SELECT m.doc_id, m.n, ((31 * m.doc_id + 17 * i.i) % 65536) - 32768 AS v
  FROM m JOIN (SELECT unnest(range(0, 160)) AS i) i ON i.i < m.n
)
SELECT doc_id AS media_id, 16000 AS sample_rate, CAST(n AS INT) AS n_samples,
       round(sum(v) / CAST(n AS DOUBLE), 4) AS mean_sample,
       CAST(max(abs(v)) AS INT) AS peak
FROM s GROUP BY doc_id, n ORDER BY media_id
"""


@query("multimodal_decode_audio", "2.9 llm-data", _AUDIO_ORACLE)
def multimodal_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, oracle-verified: closed-form PCM samples -> actual
    WAV bytes (encode_wav) -> stdlib-wave decode (decode_audio) -> per-clip
    rate/length/mean/peak, recomputed by the oracle from the closed form."""
    from hdc_dataengineering_sqlsync_spark.operators.multimodal import decode_audio

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = decode_audio(payload)
                s = samples.astype(np.float64)
                rows.append((int(mid), rate, len(samples), float(s.mean()), int(np.abs(samples.astype(np.int64)).max())))
            yield pd.DataFrame(rows, columns=[f.name for f in _AUDIO_STATS_SCHEMA.fields])

    docs = load(spark, sf_dir, "documents").where(_SUBSET)
    stats = _synth_audio(docs).mapInPandas(dec, schema=_AUDIO_STATS_SCHEMA)
    return sort_reduction(stats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        F.round("mean_sample", 4).alias("mean_sample"),
        "peak",
    ), "media_id")


_RESIZE_ORACLE = f"""
WITH m AS (SELECT doc_id, 8 + (doc_id % 5) * 4 AS w, 6 + (doc_id % 3) * 4 AS h
           FROM documents WHERE {_SUBSET}),
px AS (
  SELECT m.doc_id, m.w // 2 AS w2, m.h // 2 AS h2,
         (7 * m.doc_id + 3 * (2 * xs.x) + 5 * (2 * ys.y)) % 256 AS r
  FROM m
  JOIN (SELECT unnest(range(0, 12)) AS x) xs ON xs.x < m.w // 2
  JOIN (SELECT unnest(range(0, 7)) AS y) ys ON ys.y < m.h // 2
)
SELECT doc_id AS media_id, CAST(w2 AS INT) AS w2, CAST(h2 AS INT) AS h2,
       round(sum(r) / CAST(w2 * h2 AS DOUBLE), 4) AS r_mean
FROM px GROUP BY doc_id, w2, h2 ORDER BY media_id
"""


@query("multimodal_resize_stats", "2.9 llm-data", _RESIZE_ORACLE)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize, oracle-verified: BMP bytes -> resize_image (decode,
    nearest-neighbor floor mapping, re-encode) -> decode the RESIZED bytes ->
    red-channel mean. With even source dims the floor mapping reads source
    (2x, 2y), which the oracle replays in closed form."""
    from hdc_dataengineering_sqlsync_spark.operators.multimodal import decode_image, resize_image

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("w2", T.IntegerType()),
            T.StructField("h2", T.IntegerType()),
            T.StructField("r_mean", T.DoubleType()),
        ]
    )

    def resize_then_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                m = int(mid)
                w2 = (8 + (m % 5) * 4) // 2
                h2 = (6 + (m % 3) * 4) // 2
                resized = resize_image(payload, w2, h2)
                px = decode_image(resized).astype(np.float64)
                rows.append((m, px.shape[1], px.shape[0], float(px[:, :, 0].mean())))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    docs = load(spark, sf_dir, "documents").where(_SUBSET)
    stats = _synth_images(docs).mapInPandas(resize_then_stats, schema=schema)
    return sort_reduction(stats.select(
        "media_id", "w2", "h2", F.round("r_mean", 4).alias("r_mean")
    ), "media_id")
