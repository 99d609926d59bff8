"""SURVEY.md §2 round-9 batch I: EOQ with an exact integer sqrt, Sobel
gradient census on the real BMP path, cost-volume-profit break-even.

  wl_eoq_reorder         economic order quantity via float-seeded exact isqrt
  multimodal_sobel_edges central-difference gradient energy per decoded image
  wl_break_even_cvp      contribution margin, break-even units, safety margin

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
from hdc_dataengineering_sqlsync_spark.plans.mediacodec import _image_pixels
from hdc_dataengineering_sqlsync_spark.registry import load

# ------- 2.12 composite: economic order quantity (exact integer sqrt)

# Exact isqrt from a float seed + one integer correction step:
#   s0 = floor(sqrt(double(a)));  s = s0+1 if (s0+1)² ≤ a, s0−1 if s0² > a
# Correct for a < 2^52 (the double conversion is exact and the correctly-
# rounded sqrt lands within 1 of the true floor). Arguments here are
# 2·D·S // H ≲ 1e13 at 1000× fixture scale — inside the envelope; past
# 2^52 the seed needs a second Newton step (documented, not needed here).
_ISQRT = (
    "CASE WHEN (CAST(floor(sqrt(CAST({a} AS DOUBLE))) AS BIGINT) + 1)"
    "          * (CAST(floor(sqrt(CAST({a} AS DOUBLE))) AS BIGINT) + 1) <= {a}"
    "     THEN CAST(floor(sqrt(CAST({a} AS DOUBLE))) AS BIGINT) + 1 "
    "     WHEN CAST(floor(sqrt(CAST({a} AS DOUBLE))) AS BIGINT)"
    "          * CAST(floor(sqrt(CAST({a} AS DOUBLE))) AS BIGINT) > {a}"
    "     THEN CAST(floor(sqrt(CAST({a} AS DOUBLE))) AS BIGINT) - 1 "
    "     ELSE CAST(floor(sqrt(CAST({a} AS DOUBLE))) AS BIGINT) END"
)

_ORDER_COST_CENTS = 2500

_EOQ_ORACLE = f"""
WITH demand AS (
  SELECT p.p_brand AS brand,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS d_units
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) = 1995
  GROUP BY p.p_brand
),
holding AS (
  SELECT p_brand AS brand,
         CAST(SUM(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
              // count(*) AS BIGINT) AS h_cents
  FROM part GROUP BY p_brand
),
arg AS (
  SELECT d.brand, d.d_units, h.h_cents,
         CAST(2 * d.d_units * {_ORDER_COST_CENTS} // h.h_cents AS BIGINT) AS a
  FROM demand d JOIN holding h ON h.brand = d.brand
)
SELECT brand, d_units, h_cents,
       {_ISQRT.format(a="a")} AS eoq_units,
       CAST(d_units // greatest({_ISQRT.format(a="a")}, 1) AS BIGINT)
         AS orders_per_year
FROM arg ORDER BY brand
"""


@query("wl_eoq_reorder", "2.12 composite workloads", _EOQ_ORACLE)
def wl_eoq_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity — Wilson's √(2DS/H) lot-size optimum per
    brand (D = 1995 demand units, S = fixed order cost, H = average
    holding cost in cents), computed EXACTLY: the square root is a
    float-seeded integer sqrt with a one-step integer correction, so both
    engines land on floor(√a) bit-identically even when the double sqrt
    rounds across an integer boundary — the pattern that makes
    'irrational' KPIs safe for cross-engine hashing. Reorder frequency =
    D div EOQ.

    Scale shape: two map-side-combinable keyed aggs (fact demand, part
    holding cost) joined on the ~25-row brand key; the isqrt is scalar
    arithmetic on the result table. The shared _ISQRT expression string
    is the cross-engine contract (the `_det3` idiom)."""
    li = load(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1995)
    p = load(spark, sf_dir, "part")
    demand = (
        li.join(
            F.broadcast(p.select("p_partkey", F.col("p_brand").alias("brand"))),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("brand")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("d_units"))
    )
    holding = p.groupBy(F.col("p_brand").alias("brand")).agg(
        F.expr(
            "CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))"
            " DIV count(*) AS BIGINT)"
        ).alias("h_cents")
    )
    arg = demand.join(F.broadcast(holding), "brand").withColumn(
        "a", F.expr(f"2 * d_units * {_ORDER_COST_CENTS} DIV h_cents")
    )
    isqrt = _ISQRT.format(a="a")
    return (
        arg.select(
            "brand",
            "d_units",
            "h_cents",
            F.expr(isqrt).alias("eoq_units"),
            F.expr(f"d_units DIV greatest({isqrt}, 1)").alias("orders_per_year"),
        )
        .orderBy("brand")
    )


# ------ 2.9 llm-data: central-difference gradient (edge) census

_SOBEL_SUBSET = "doc_id % 4 = 1"

_SOBEL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("edge_energy", T.LongType()),
        T.StructField("n_strong", T.LongType()),
    ]
)

_SOBEL_ORACLE = f"""
WITH m AS (SELECT doc_id, 8 + (doc_id % 5) * 4 AS w, 6 + (doc_id % 3) * 4 AS h
           FROM documents WHERE {_SOBEL_SUBSET}),
px AS (
  SELECT m.doc_id, m.w, m.h, xs.x, ys.y,
         (7 * m.doc_id + 3 * xs.x + 5 * ys.y) % 256 AS v
  FROM m
  JOIN (SELECT unnest(range(0, 24)) AS x) xs ON xs.x < m.w
  JOIN (SELECT unnest(range(0, 14)) AS y) ys ON ys.y < m.h
),
gx AS (
  SELECT doc_id, w, h, x, y, v,
         lead(v) OVER (PARTITION BY doc_id, y ORDER BY x)
           - lag(v) OVER (PARTITION BY doc_id, y ORDER BY x) AS dx
  FROM px
),
gxy AS (
  SELECT doc_id, w, h, x, y, dx,
         lead(v) OVER (PARTITION BY doc_id, x ORDER BY y)
           - lag(v) OVER (PARTITION BY doc_id, x ORDER BY y) AS dy
  FROM gx
),
interior AS (
  SELECT doc_id, w, h, abs(dx) + abs(dy) AS g
  FROM gxy
  WHERE x > 0 AND x < w - 1 AND y > 0 AND y < h - 1
)
SELECT doc_id AS media_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
       CAST(SUM(g) AS BIGINT) AS edge_energy,
       CAST(SUM(CASE WHEN g > 24 THEN 1 ELSE 0 END) AS BIGINT) AS n_strong
FROM interior GROUP BY doc_id, w, h ORDER BY media_id
"""


@query("multimodal_sobel_edges", "2.9 llm-data", _SOBEL_ORACLE)
def multimodal_sobel_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient (edge) census — the |∇| energy statistic vision pipelines
    use to rank image sharpness/complexity before sampling: closed-form
    pixels → real BMP bytes → decode → central-difference gradients on
    the red plane (g = |v(x+1)−v(x−1)| + |v(y+1)−v(y−1)| over interior
    pixels — the mod-256 wraps make gradients non-constant), exact
    integer energy and a strong-edge count. The oracle rebuilds the same
    stencil relationally with lead/lag windows along each axis; a stride,
    BGR-order, or bottom-up-flip decode bug shifts a neighborhood and
    breaks both statistics.

    Scale shape: decode + two np.diff-style slices in ONE mapInPandas
    pass; payloads never shuffle — 4 scalars per image leave the stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
            decode_bmp,
            encode_bmp,
        )

        for pdf in batches:
            rows = []
            for mid in pdf["doc_id"].to_numpy(dtype=np.int64):
                m = int(mid)
                px = decode_bmp(encode_bmp(_image_pixels(m)))
                v = px[:, :, 0].astype(np.int64)
                h, w = v.shape
                dx = v[:, 2:] - v[:, :-2]  # centered at x = 1..w-2
                dy = v[2:, :] - v[:-2, :]  # centered at y = 1..h-2
                g = np.abs(dx[1:-1, :]) + np.abs(dy[:, 1:-1])
                rows.append(
                    (m, w, h, int(g.sum()), int((g > 24).sum()))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _SOBEL_SCHEMA.fields])

    docs = load(spark, sf_dir, "documents").where(_SOBEL_SUBSET)
    ids = docs.select("doc_id").repartition(spark.sparkContext.defaultParallelism)
    return sort_reduction(ids.mapInPandas(run, schema=_SOBEL_SCHEMA), "media_id")


# ------- 2.12 composite: cost-volume-profit break-even analysis

_CVP_ORACLE = """
WITH li AS (
  SELECT p.p_brand AS brand,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
              AS BIGINT) AS net,
         CAST(floor(p.p_retailprice * 60 + 0.5) AS BIGINT) AS unit_var
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) = 1995
),
agg AS (
  SELECT brand,
         CAST(SUM(qty) AS BIGINT) AS units,
         CAST(SUM(net) AS BIGINT) AS revenue,
         CAST(SUM(qty * unit_var) AS BIGINT) AS var_cost
  FROM li GROUP BY brand
),
m AS (
  SELECT brand, units, revenue, var_cost,
         CAST((revenue - var_cost) // units AS BIGINT) AS unit_margin
  FROM agg
)
SELECT brand, units, unit_margin,
       CAST(5000000 // unit_margin + CASE WHEN 5000000 % unit_margin > 0
            THEN 1 ELSE 0 END AS BIGINT) AS breakeven_units,
       CAST((units - (5000000 // unit_margin
             + CASE WHEN 5000000 % unit_margin > 0 THEN 1 ELSE 0 END))
            * 10000 // units AS BIGINT) AS safety_margin_bps
FROM m WHERE unit_margin > 0 ORDER BY brand
"""


@query("wl_break_even_cvp", "2.12 composite workloads", _CVP_ORACLE)
def wl_break_even_cvp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-volume-profit break-even — the finance planning primitive:
    per-brand unit contribution margin (net revenue minus variable cost,
    integral cents per unit, trunc), break-even units against a fixed
    cost block (ceiling division — you cannot sell a fraction of the
    break-even unit), and margin of safety in bps of actual volume.
    Ceiling division is spelled `a div b + (a mod b > 0)` identically on
    both engines (no float ever).

    Scale shape: ONE map-side-combinable keyed agg over the joined fact
    scan; all KPI math on the ~25-row brand table."""
    li = load(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1995)
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_brand").alias("brand"),
        F.floor(F.col("p_retailprice") * 60 + 0.5).cast("long").alias("unit_var"),
    )
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "brand",
            F.col("l_quantity").cast("long").alias("qty"),
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
            )
            .cast("long")
            .alias("net"),
            "unit_var",
        )
        .groupBy("brand")
        .agg(
            F.sum("qty").alias("units"),
            F.sum("net").alias("revenue"),
            F.sum(F.col("qty") * F.col("unit_var")).alias("var_cost"),
        )
    )
    m = agg.withColumn(
        "unit_margin", F.expr("(revenue - var_cost) DIV units")
    ).where(F.col("unit_margin") > 0)
    be = "5000000 DIV unit_margin + CASE WHEN 5000000 % unit_margin > 0 THEN 1 ELSE 0 END"
    return (
        m.select(
            "brand",
            "units",
            "unit_margin",
            F.expr(f"CAST({be} AS BIGINT)").alias("breakeven_units"),
            F.expr(
                f"CAST((units - ({be})) AS DECIMAL(38,0)) * 10000 DIV units"
            ).alias("safety_margin_bps"),
        )
        .orderBy("brand")
    )
