"""SURVEY.md §2 round-9 batch Y: audio RMS loudness windows, serpentine
shard balancing, Theil inequality index.

  multimodal_audio_rms   per-window energy census on the real WAV path
  sync_snake_shard_balance  serpentine (boustrophedon) partition packing
  wl_theil_inequality    decomposable inequality, quantized-ln moments

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query, sort_reduction
from hdc_dataengineering_sqlsync_spark.plans.roundnine_i import _ISQRT
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.9 llm-data: windowed RMS loudness census over decoded WAV

_RMS_SUBSET = "doc_id % 5 = 2"
_WIN = 32  # samples per loudness window

_RMS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_windows", T.IntegerType()),
        T.StructField("peak_energy", T.LongType()),
        T.StructField("peak_window", T.IntegerType()),
        T.StructField("peak_rms_milli", T.LongType()),
    ]
)

_RMS_ORACLE = f"""
WITH m AS (SELECT doc_id, 96 + (doc_id % 5) * 32 AS n
           FROM documents WHERE {_RMS_SUBSET}),
s AS (
  SELECT m.doc_id, m.n, i.i,
         (m.doc_id * 13 + i.i * 7) % 2001 - 1000 AS v
  FROM m JOIN (SELECT unnest(range(0, 256)) AS i) i ON i.i < m.n
),
win AS (
  SELECT doc_id, n, i // {_WIN} AS w,
         CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS energy
  FROM s GROUP BY doc_id, n, i // {_WIN}
),
ranked AS (
  SELECT doc_id, n, w, energy,
         max(energy) OVER (PARTITION BY doc_id) AS pk
  FROM win
)
SELECT doc_id AS media_id,
       CAST(n // {_WIN} AS INT) AS n_windows,
       CAST(max(pk) AS BIGINT) AS peak_energy,
       CAST(min(CASE WHEN energy = pk THEN w END) AS INT) AS peak_window,
       CAST({_ISQRT.format(a=f"max(pk) * {1000000 // _WIN}")} AS BIGINT)
         AS peak_rms_milli
FROM ranked GROUP BY doc_id, n ORDER BY media_id
"""


@query("multimodal_audio_rms", "2.9 llm-data", _RMS_ORACLE)
def multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS loudness — the envelope census an audio pipeline
    runs to find the loudest segment of every clip (VAD seeding, clip
    normalization, silence trimming): closed-form int16 samples → real
    RIFF bytes (encode_wav) → decode_wav → per-32-sample-window energy
    Σv² in exact int64, the loudest window (earliest on ties), and its
    RMS in milli-units via the float-seeded exact integer sqrt
    (roundnine_i._ISQRT — isqrt(energy·10⁶/32) is integral because
    10⁶/32 = 31250 exactly). A frame-walk or byte-order bug shifts a
    window boundary and breaks the energy census.

    Scale shape: encode+decode+census in ONE mapInPandas pass over
    repartitioned ids; payloads never shuffle — 4 scalars per clip
    leave the stage (the multimodal_audio_zcr discipline)."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
            decode_wav,
            encode_wav,
        )

        for pdf in batches:
            rows = []
            for mid in pdf["doc_id"].to_numpy(dtype=np.int64):
                m = int(mid)
                n = 96 + (m % 5) * 32
                i = np.arange(n, dtype=np.int64)
                samples = ((m * 13 + i * 7) % 2001 - 1000).astype(np.int16)
                _, dec = decode_wav(encode_wav(samples))
                d = dec.astype(np.int64)
                nw = n // _WIN
                energies = (d[: nw * _WIN] ** 2).reshape(nw, _WIN).sum(axis=1)
                pk = int(energies.max())
                pw = int(energies.argmax())  # argmax returns FIRST max
                rows.append(
                    (m, nw, pk, pw, math.isqrt(pk * (1000000 // _WIN)))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RMS_SCHEMA.fields]
            )

    docs = load(spark, sf_dir, "documents").where(_RMS_SUBSET)
    ids = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    return sort_reduction(ids.mapInPandas(run, schema=_RMS_SCHEMA), "media_id")


# ------ 2.6 sync/dataops: serpentine (boustrophedon) shard balancing

_SNAKE_N = 8

_SNAKE_ORACLE = f"""
WITH parts AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         CAST(count(*) AS BIGINT) AS rows_n
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT mon, rows_n,
         CAST(row_number() OVER (ORDER BY rows_n DESC, mon) AS BIGINT) AS r
  FROM parts
),
assigned AS (
  SELECT mon, rows_n,
         CASE WHEN ((r - 1) // {_SNAKE_N}) % 2 = 0
              THEN (r - 1) % {_SNAKE_N}
              ELSE {_SNAKE_N - 1} - (r - 1) % {_SNAKE_N} END AS shard
  FROM ranked
),
tot AS (SELECT SUM(rows_n) AS t FROM assigned)
SELECT CAST(a.shard AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(SUM(a.rows_n) AS BIGINT) AS rows_total,
       CAST(SUM(a.rows_n) * 10000 // max(t.t) AS BIGINT) AS share_bps
FROM assigned a CROSS JOIN tot t
GROUP BY a.shard ORDER BY shard
"""


@query("sync_snake_shard_balance", "2.6 sync & dataops", _SNAKE_ORACLE)
def sync_snake_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serpentine shard packing — the deterministic answer to skewed
    partition sizes when planning a backfill or export: partitions
    sorted by size descending are dealt to N shards boustrophedon
    (0..7, then 7..0, …), which bounds the size gap far tighter than
    round-robin because every shard gets one pick from each size band
    in alternating draft order. The plan (shard → partitions, row
    totals, share in exact bps) is pure integer arithmetic from the
    size census — reproducible across engines and reruns, unlike
    greedy LPT whose heap order is implementation-defined.

    Scale shape: the size census is one map-combinable keyed agg; the
    rank + deal runs on the ~84-row partition table, never the fact;
    output is N=8 rows."""
    parts = (
        load(spark, sf_dir, "orders")
        .groupBy(F.trunc("o_orderdate", "month").alias("mon"))
        .agg(F.count(F.lit(1)).alias("rows_n"))
    )
    ranked = parts.select(
        "mon",
        "rows_n",
        F.row_number()
        .over(Window.orderBy(F.col("rows_n").desc(), "mon"))
        .cast("long")
        .alias("r"),
    )
    assigned = ranked.select(
        "rows_n",
        F.expr(
            f"CASE WHEN ((r - 1) DIV {_SNAKE_N}) % 2 = 0"
            f" THEN (r - 1) % {_SNAKE_N}"
            f" ELSE {_SNAKE_N - 1} - (r - 1) % {_SNAKE_N} END"
        ).alias("shard"),
    )
    tot = assigned.agg(F.sum("rows_n").alias("t"))
    return (
        assigned.crossJoin(F.broadcast(tot))
        .groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rows_n").alias("rows_total"),
            F.expr("SUM(rows_n) * 10000 DIV max(t)").alias("share_bps"),
        )
        .orderBy("shard")
    )


# ------ 2.12 composite: Theil inequality index, quantized-ln moments

_THEIL_ORACLE = """
WITH spend AS (
  SELECT c.c_mktsegment AS segment,
         CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
),
mom AS (
  SELECT segment,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS xs,
         CAST(SUM(CAST(x AS HUGEINT)
                  * CAST(floor(ln(CAST(x AS DOUBLE)) * 1000000 + 0.5)
                         AS BIGINT)) AS HUGEINT) AS sxlnx_e6
  FROM spend WHERE x > 0 GROUP BY segment
)
SELECT segment, n,
       CAST(xs AS BIGINT) AS spend_cents,
       round(CAST(sxlnx_e6 AS DOUBLE) / 1000000.0 / CAST(xs AS DOUBLE)
             - ln(CAST(xs AS DOUBLE) / CAST(n AS DOUBLE)), 4) AS theil_t
FROM mom ORDER BY segment
"""


@query("wl_theil_inequality", "2.12 composite workloads", _THEIL_ORACLE)
def wl_theil_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index per segment — the decomposable
    alternative to agg_gini_segment (Theil splits exactly into
    between + within components, which Gini cannot): T = Σ(xᵢ/X)·
    ln(xᵢ/μ) = Σxᵢ·ln xᵢ / X − ln μ. The xᵢ·ln xᵢ moment uses the
    1e-6-quantized-ln device (wl_price_elasticity_loglog): ln of each
    exact integer cents value lands on the shared int grid, the
    x-weighted sum stays a wide integer, and T touches floating point
    in ONE final shared expression per segment, rounded 4dp.

    Scale shape: per-customer spend is one keyed map-combinable agg;
    the 3-moment segment fold is map-side; 5 output rows."""
    spend = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("x")
        )
    )
    lnq = F.floor(F.log(F.col("x").cast("double")) * 1000000 + 0.5).cast(
        "long"
    )
    mom = (
        spend.where(F.col("x") > 0)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").cast("decimal(38,0)").alias("xs"),
            F.sum(F.col("x").cast("decimal(38,0)") * lnq).alias("sxlnx_e6"),
        )
    )
    return mom.select(
        "segment",
        "n",
        F.col("xs").cast("long").alias("spend_cents"),
        F.round(
            F.col("sxlnx_e6").cast("double")
            / 1000000.0
            / F.col("xs").cast("double")
            - F.log(
                F.col("xs").cast("double") / F.col("n").cast("double")
            ),
            4,
        ).alias("theil_t"),
    ).orderBy("segment")
