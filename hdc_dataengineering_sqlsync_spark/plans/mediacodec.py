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

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
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
    """documents subset -> real BMP payloads (mapInPandas encode stage)."""
    from hdc_dataengineering_sqlsync_spark.operators.media_codecs import encode_bmp

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [encode_bmp(_image_pixels(int(m))) for m in pdf["doc_id"]],
                }
            )

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
    """BMP payloads -> per-image dims + channel means (mapInPandas decode)."""
    from hdc_dataengineering_sqlsync_spark.operators.multimodal import decode_image

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(payload).astype(np.float64)
                rows.append(
                    (
                        int(mid),
                        px.shape[1],
                        px.shape[0],
                        float(px[:, :, 0].mean()),
                        float(px[:, :, 1].mean()),
                        float(px[:, :, 2].mean()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _IMG_STATS_SCHEMA.fields])

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
    return stats.select(
        "media_id",
        "w",
        "h",
        F.round("r_mean", 4).alias("r_mean"),
        F.round("g_mean", 4).alias("g_mean"),
        F.round("b_mean", 4).alias("b_mean"),
    ).orderBy("media_id")


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
    return stats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        F.round("mean_sample", 4).alias("mean_sample"),
        "peak",
    ).orderBy("media_id")


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
    return stats.select(
        "media_id", "w2", "h2", F.round("r_mean", 4).alias("r_mean")
    ).orderBy("media_id")
