"""SURVEY.md §2.9 round-8 batch A: REAL baseline-JPEG decode, oracle-verified.

  multimodal_decode_jpeg   full Huffman+DCT JPEG round-trip, exact oracle

The codec (operators/jpeg.py) is a complete baseline JPEG: FDCT, scalar
quantization, zigzag, differential-DC/run-length-AC Huffman coding, byte
stuffing, 4:4:4 JFIF color transform. JPEG is lossy, so a value-exact
DuckDB oracle needs inputs whose loss is exactly predictable: a GRAYSCALE
image whose 8x8 blocks are each constant.

Why that is exact, step by step (m = doc_id, v = the block's gray level):
- RGB=(v,v,v) -> YCbCr: Y = floor(0.299v+0.587v+0.114v+0.5). The sum is
  v +- a few ulp, and floor(v + eps + 0.5) == v for ANY eps smaller than
  0.5 — the half-boundary can't flip. So Y == v, Cb == Cr == 128 exactly.
- A constant block has only a DC coefficient: DC = 8*(v-128) +- ~1e-12
  from the float FDCT. Quantized k = floor(DC/17 + 0.5); with the ODD
  quant step 17, 8*(v-128)/17 (even numerator, odd denominator) can never
  land exactly on a half-boundary, so the FDCT's epsilon can't flip k.
  Exact integer form: k = floor((16*(v-128) + 17) / 34).
- Decode: pixel = floor(17*k/8 + 128.5) = (17*k + 1028) // 8 — exact
  integer arithmetic, PROVIDED k mod 8 != 4 (the one residue where
  17k+1028 is divisible by 8 and the float iDCT's epsilon could round
  across the floor boundary). The 16-entry gray palette below is drawn
  from the 225 safe residues only.
- Chroma: k = 0 -> decoded Cb = Cr = (0+1028)//8 = 128, so the YCbCr->RGB
  transform adds exactly 0 and R = G = B = decoded Y.

The oracle replays ONLY this integer arithmetic — it never sees the
payload — so any bug in marker layout, DHT parsing, canonical Huffman
code assignment, DC prediction, byte stuffing, zigzag, dequantization, or
the iDCT mismatches the hash. The lossless entropy layer is additionally
pinned coefficient-exact (with nonzero ACs) in tests/test_roundeight.py.

Scale shape: encode+decode run inside ONE mapInPandas stage — payload
bytes are born and die in the partition, only per-image scalar stats
reach the output (the canonical 100 TB blob posture: blobs never
shuffle, features do).

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
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

# 16 gray levels, all in the safe residue class (k mod 8 != 4, see module
# docstring). Chosen spread across 0..255 so DC diffs span sign and
# multiple Huffman size categories.
_SAFE_GRAYS = [2, 16, 33, 50, 67, 84, 101, 118, 135, 152, 169, 186, 203, 220, 237, 254]

_SUBSET = "doc_id % 5 = 0"

_JPEG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("r_mean", T.DoubleType()),
        T.StructField("g_mean", T.DoubleType()),
        T.StructField("b_mean", T.DoubleType()),
    ]
)

_JPEG_ORACLE = f"""
WITH m AS (SELECT doc_id FROM documents WHERE {_SUBSET}),
blocks AS (
  SELECT m.doc_id, t1.bx, t2.by,
         list_extract({_SAFE_GRAYS},
                      CAST((7 * m.doc_id + 3 * t1.bx + 5 * t2.by) % 16 AS INT) + 1) AS v
  FROM m, unnest([0, 1]) t1(bx), unnest([0, 1]) t2(by)
),
k AS (
  SELECT doc_id,
         CAST(floor((16.0 * (v - 128) + 17) / 34.0) AS BIGINT) AS k
  FROM blocks
),
dec AS (
  SELECT doc_id,
         LEAST(255, GREATEST(0, (17 * k + 1028) // 8)) AS px
  FROM k
)
SELECT doc_id AS media_id,
       16 AS w, 16 AS h,
       round(sum(px) / 4.0, 4) AS r_mean,
       round(sum(px) / 4.0, 4) AS g_mean,
       round(sum(px) / 4.0, 4) AS b_mean
FROM dec GROUP BY doc_id ORDER BY media_id
"""


@query("multimodal_decode_jpeg", "2.9 llm-data", _JPEG_ORACLE, bench=True)
def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode, oracle-verified: closed-form block-mosaic pixels
    -> actual baseline JPEG bytes (encode_jpeg: FDCT, quant, zigzag,
    Huffman, stuffing) -> full byte-level decode (decode_jpeg: marker
    parse, DHT canonical codes, DC prediction, dequant, iDCT, YCbCr->RGB)
    -> per-image channel means. The oracle recomputes the means from the
    module-docstring integer arithmetic without touching the payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        grays = np.array(_SAFE_GRAYS, dtype=np.int64)
        for pdf in batches:
            rows = []
            for mid in pdf["doc_id"].to_numpy(dtype=np.int64):
                m = int(mid)
                bx, by = np.meshgrid(np.arange(2), np.arange(2), indexing="xy")
                vals = grays[(7 * m + 3 * bx + 5 * by) % 16]  # (by, bx)
                mosaic = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
                px = np.stack([mosaic] * 3, axis=2).astype(np.uint8)
                out = decode_jpeg(encode_jpeg(px)).astype(np.float64)
                rows.append(
                    (
                        m,
                        out.shape[1],
                        out.shape[0],
                        float(out[:, :, 0].mean()),
                        float(out[:, :, 1].mean()),
                        float(out[:, :, 2].mean()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _JPEG_STATS_SCHEMA.fields])

    docs = load(spark, sf_dir, "documents").where(_SUBSET)
    # the subset lands in one file-scan partition at test scale: round-robin
    # the 8-byte ids so the per-image codec work uses every core (at 100 TB
    # the scan is already wide and this repartition of bare ids is noise)
    ids = docs.select("doc_id").repartition(spark.sparkContext.defaultParallelism)
    stats = ids.mapInPandas(run, schema=_JPEG_STATS_SCHEMA)
    return sort_reduction(stats.select(
        "media_id",
        "w",
        "h",
        F.round("r_mean", 4).alias("r_mean"),
        F.round("g_mean", 4).alias("g_mean"),
        F.round("b_mean", 4).alias("b_mean"),
    ), "media_id")
