"""Multimodal column plumbing (SURVEY.md §2.9 north star).

Images/audio/video are opaque ``binary`` columns with typed metadata structs.
The Spark-side machinery — schema, partition-preserving mapInPandas, Arrow
batch shapes — is real and tested. Decode/resize are REAL for every
format whose compression ships with the standard library or needs none:
24-bit BMP and 16-bit PCM WAV (r3), 8-bit truecolor PNG (zlib DEFLATE +
five-predictor unfilter, r6), single-frame GIF (full LZW, r6), baseline
JPEG (operators/jpeg.py, r8) and TIFF (operators/tiff.py, r9) — all
pure numpy/stdlib and oracle-verified by the multimodal_decode_* /
multimodal_resize_stats qids. Only formats whose codecs are genuinely
library-bound (WebP/MP3/...) remain stubbed behind NotImplementedError. ``extract_features`` keeps its
deterministic byte-stats featurizer (the multimodal_extract oracle mirrors
it in SQL) — a real encoder slots into the same mapInPandas stage.

At scale: binary payloads ride the same parquet row groups as their metadata;
feature extraction is an Arrow-batched mapInPandas (one Python worker per
partition, zero shuffle), and downstream joins use only the slim metadata /
feature columns, never the blobs.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("kind", T.StringType()),       # image | audio | video
            T.StructField("mime", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table: the text bytes stand in for an encoded
    payload so the binary-column plumbing is testable without codecs. Kind
    cycles image/audio/video by id so every modality path has rows."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            kind.alias("kind"),
            F.concat(kind, F.lit("/x-fake")).alias("mime"),
            (F.length(F.col(text_col)) % 640).cast("int").alias("width"),
            F.lit(480).alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Decode an image payload to an HxWx3 uint8 RGB numpy array.

    REAL for uncompressed 24-bit BMP (pure numpy/struct), 8-bit truecolor
    PNG (stdlib zlib inflate + full five-predictor scanline unfilter, r6),
    single-frame GIF (full LZW: variable code width, CLEAR/EOI, 4096-reset;
    see operators/media_codecs.py) and — wired here in r10, codec shipped
    in r8 — baseline 4:4:4/grayscale JPEG (from-scratch Huffman + IDCT,
    operators/jpeg.py, oracle-verified by the multimodal_decode_jpeg qid)
    and uncompressed baseline TIFF in BOTH byte orders — little-endian II
    and big-endian MM (operators/tiff.py; the IFD walk reads the order
    mark from the header, r12).
    Only WebP/AVIF-class formats, whose codecs are genuinely absent from
    this container, still raise; swap in Pillow/opencv here when available —
    the mapInPandas contract (binary in, array out) is unchanged.
    """
    if bytes(payload[:2]) == b"BM":
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import decode_bmp

        return decode_bmp(bytes(payload))
    if bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import decode_png

        return decode_png(bytes(payload))
    if bytes(payload[:4]) == b"GIF8":
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import decode_gif

        return decode_gif(bytes(payload))
    if bytes(payload[:2]) == b"\xff\xd8":
        from hdc_dataengineering_sqlsync_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(bytes(payload))
    if bytes(payload[:4]) in (b"II*\x00", b"MM\x00*"):
        from hdc_dataengineering_sqlsync_spark.operators.tiff import decode_tiff

        return decode_tiff(bytes(payload))
    raise NotImplementedError("WebP-class image decode requires a codec library (not in container)")


def decode_audio(payload: bytes):
    """Decode an audio payload -> (sample_rate, int16 sample array).

    REAL for mono 16-bit PCM WAV (stdlib wave — oracle-verified by the
    multimodal_decode_audio qid). Compressed formats (MP3/OGG/...) still
    raise: codec library absent from this container.
    """
    if bytes(payload[:4]) == b"RIFF":
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import decode_wav

        return decode_wav(bytes(payload))
    raise NotImplementedError("compressed audio decode requires a codec library (not in container)")


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload, returning a re-encoded payload of the same
    format.

    REAL for BMP, TIFF (both II and MM byte orders — a big-endian input is
    re-encoded in its own byte order, r12), and baseline JPEG (r11, closing
    the decode/resize asymmetry): decode -> nearest-neighbor resample (floor
    index mapping, media_codecs.resize_nearest) -> re-encode with the same
    in-repo codec; the BMP path is oracle-verified by the
    multimodal_resize_stats qid. JPEG re-encode is lossy by nature (requant
    through the default table); BMP/TIFF round-trips are lossless.
    PNG/GIF/WebP-class formats still raise (no in-repo encoder for those).
    Deployment shape either way: a mapInPandas stage identical to
    extract_features — binary in, resized binary out, meta.width/height
    rewritten — zero shuffle.
    """
    from hdc_dataengineering_sqlsync_spark.operators.media_codecs import resize_nearest

    if bytes(payload[:2]) == b"BM":
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import decode_bmp, encode_bmp

        return encode_bmp(resize_nearest(decode_bmp(bytes(payload)), width, height))
    if bytes(payload[:4]) in (b"II*\x00", b"MM\x00*"):
        from hdc_dataengineering_sqlsync_spark.operators.tiff import decode_tiff, encode_tiff

        return encode_tiff(
            resize_nearest(decode_tiff(bytes(payload)), width, height),
            byte_order=bytes(payload[:2]).decode(),
        )
    if bytes(payload[:2]) == b"\xff\xd8":
        from hdc_dataengineering_sqlsync_spark.operators.jpeg import decode_jpeg, encode_jpeg

        return encode_jpeg(resize_nearest(decode_jpeg(bytes(payload)), width, height))
    raise NotImplementedError("image resize for formats without an in-repo encoder (PNG/GIF/WebP) requires a codec library")


def extract_features(media: DataFrame, n_dims: int = 8) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads.

    Deterministic fake featurizer (byte histogram moments + crc32) standing
    in for a real encoder; batch shape, schema, and partitioning are the real
    thing. No shuffle: runs where the data sits.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "checksum": payloads.map(lambda b: zlib.crc32(bytes(b))).astype("int64"),
                    "feature": payloads.map(
                        lambda b: [
                            float(sum(bytes(b)[d::n_dims]) % 997) for d in range(n_dims)
                        ]
                    ),
                }
            )
            yield out

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10, video_only: bool = False) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_idx) rows for a
    downstream decoder via the same mapInPandas contract. Frame decode itself
    is stubbed (no codec). ``video_only`` restricts the fan-out to
    meta.kind == 'video' rows."""
    src = media.where(F.col("meta.kind") == "video") if video_only else media
    idx = F.sequence(F.lit(0), F.lit(every_n - 1))
    return src.select("media_id", F.explode(idx).alias("frame_idx"))


def dhash64(pixels, resize_fn) -> int:
    """64-bit difference hash (dHash) of an RGB pixel array: grayscale mean
    over channels, nearest-neighbor resize to 9x8 (via the caller-supplied
    resize, e.g. media_codecs.resize_nearest), then one sign bit per
    horizontal gradient — bit i set iff gray[y, x+1] > gray[y, x].

    Pure integer/numpy; byte-identical across runs and partitionings, so
    equal images always collide and near-identical images land within a
    small hamming distance (the property near-dup image dedup keys on).
    Returns a non-negative int that fits signed int64: the top gradient bit
    is DROPPED (masked to zero), leaving an effective 63-bit hash — two
    images differing only in that first gradient collide, which near-dup
    banding tolerates by design.
    """
    import numpy as np

    small = resize_fn(pixels, 9, 8)
    gray = small.astype(np.int32).mean(axis=2)
    bits = (gray[:, 1:] > gray[:, :-1]).ravel()
    # vectorized pack (a per-bit Python loop would dominate the hot path)
    weights = np.left_shift(np.uint64(1), np.arange(63, -1, -1, dtype=np.uint64))
    h = np.uint64(np.sum(weights[bits.astype(bool)], dtype=np.uint64))
    # drop the sign bit so the value round-trips through Spark LongType
    return int(h & np.uint64(0x7FFFFFFFFFFFFFFF))
