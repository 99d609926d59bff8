"""SURVEY.md §2 round-7 batch E: RLE8-compressed BMP — a third REAL
compressed image codec (after PNG/zlib and GIF/LZW), pure numpy/struct."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (kept for parity with sibling modules)
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query, sort_reduction
from hdc_dataengineering_sqlsync_spark.registry import load

_RLE_SUBSET = "doc_id % 3 = 1"

# Closed forms shared with the oracle: w = 6 + (m%5)*4, h = 5 + (m%4)*3,
# idx(x,y) = (m + x//4 + 2y) % 13 (horizontal runs of exactly 4, so RLE
# genuinely compresses), palette[i] = ((i*11)%256, (i*23)%256, (i*37)%256).
# Consecutive 4-blocks differ by 1 mod 13 (never merge), so the encoder's
# run structure — hence the exact payload size — is itself closed-form:
# 54 header + 1024 palette + h*(2*ceil(w/4) + 2 EOL) + 2 EOB bytes.
_RLE_ORACLE = f"""
WITH m AS (SELECT doc_id FROM documents WHERE {_RLE_SUBSET}),
px AS (
  SELECT doc_id,
         6 + (doc_id % 5) * 4 AS w,
         5 + (doc_id % 4) * 3 AS h,
         (doc_id + xs.x // 4 + 2 * ys.y) % 13 AS idx
  FROM m, unnest(range(0, 26)) AS xs(x), unnest(range(0, 17)) AS ys(y)
  WHERE xs.x < 6 + (doc_id % 5) * 4 AND ys.y < 5 + (doc_id % 4) * 3
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(sum((idx * 11) % 256) AS BIGINT) AS sum_r,
       CAST(sum((idx * 23) % 256) AS BIGINT) AS sum_g,
       CAST(sum((idx * 37) % 256) AS BIGINT) AS sum_b,
       CAST(count(DISTINCT idx) AS BIGINT) AS n_colors,
       CAST(54 + 1024 + h * (2 * ((w + 3) // 4) + 2) + 2 AS BIGINT)
         AS n_payload_bytes
FROM px GROUP BY doc_id, w, h ORDER BY media_id
"""

_RLE_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)
_RLE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("n_colors", T.LongType()),
        T.StructField("n_payload_bytes", T.LongType()),
    ]
)


@query("multimodal_decode_bmp_rle", "2.9 llm-data", _RLE_ORACLE)
def multimodal_decode_bmp_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL run-length-compressed image decode, oracle-verified: closed-form
    palette indices → actual RLE8 BMP bytes (encode_bmp_rle8: maximal run
    pairs, end-of-line/end-of-bitmap markers, 256-entry BGRA palette — the
    Windows wire format) → byte-level decode (decode_bmp: RLE walk incl.
    absolute mode, palette mapping) → exact int64 channel sums +
    distinct-color census + the PAYLOAD SIZE, whose closed form pins the
    encoder's run structure too (the index pattern's 4-pixel blocks never
    merge, so compressed size is h·(2·ceil(w/4)+2)+EOB exactly). Any run
    split/merge, row-order, palette or marker bug mismatches. Third real
    compressed codec after PNG (zlib) and GIF (LZW). Scale posture
    identical: encode and decode inside ONE mapInPandas partition over
    Arrow batches, payloads never shuffle."""
    import numpy as np
    import pandas as pd

    from hdc_dataengineering_sqlsync_spark.operators.media_codecs import encode_bmp_rle8
    from hdc_dataengineering_sqlsync_spark.operators.multimodal import decode_image

    i = np.arange(256)
    pal = np.stack([(i * 11) % 256, (i * 23) % 256, (i * 37) % 256], axis=1).astype(np.uint8)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for m in pdf["doc_id"]:
                m = int(m)
                w, h = 6 + (m % 5) * 4, 5 + (m % 4) * 3
                y, x = np.mgrid[0:h, 0:w]
                idx = ((m + x // 4 + 2 * y) % 13).astype(np.uint8)
                payloads.append(encode_bmp_rle8(idx, pal))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(payload).astype(np.int64)
                rows.append(
                    (
                        int(mid),
                        px.shape[1],
                        px.shape[0],
                        int(px[:, :, 0].sum()),
                        int(px[:, :, 1].sum()),
                        int(px[:, :, 2].sum()),
                        int(len(np.unique(px.reshape(-1, 3), axis=0))),
                        len(payload),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _RLE_STATS_SCHEMA.fields])

    docs = load(spark, sf_dir, "documents").where(_RLE_SUBSET)
    media = docs.select("doc_id").mapInPandas(enc, schema=_RLE_MEDIA_SCHEMA)
    return sort_reduction(media.mapInPandas(dec, schema=_RLE_STATS_SCHEMA), "media_id")
