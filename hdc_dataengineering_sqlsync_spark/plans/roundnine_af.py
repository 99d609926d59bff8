"""SURVEY.md §2 round-9 batch AF: rich-club coefficients, SPRT sequential
test, image projection profiles.

  graph_rich_club          hub-core density at multiple degree cuts
  wl_sprt_sequential_test  Wald's sequential ratio test, integer walk
  multimodal_image_row_profile  row-sum layout profile on real BMP path

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query, sort_reduction
from hdc_dataengineering_sqlsync_spark.plans.graphs import _CS_EDGES_SQL, _cs_edges
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.12 composite: rich-club coefficient at several degree cuts

_RC_KS = [4, 8, 16, 32]

# MATERIALIZED: DuckDB inlines CTEs per reference; with `rich` read in
# three branches and an inequality membership join, the whole
# pairs→edges→deg chain re-evaluated per branch (316s at sf0.1 → 0.9s
# materialized, identical rows — probed; the r9s2 oracle-plan lesson).
_RC_ORACLE = f"""
WITH {_CS_EDGES_SQL.strip().replace("pairs AS (", "pairs AS MATERIALIZED (").replace("edges AS (", "edges AS MATERIALIZED (")},
deg AS MATERIALIZED (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS d
  FROM edges GROUP BY src
),
ks(k) AS (VALUES {", ".join(f"({k})" for k in _RC_KS)}),
rich AS MATERIALIZED (
  SELECT ks.k, deg.node FROM ks JOIN deg ON deg.d > ks.k
),
rc_edges AS (
  SELECT r1.k, CAST(count(*) AS BIGINT) AS e_dir
  FROM edges e
  JOIN rich r1 ON r1.node = e.src
  JOIN rich r2 ON r2.node = e.dst AND r2.k = r1.k
  GROUP BY r1.k
),
rc_nodes AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_rich FROM rich GROUP BY k
)
SELECT CAST(n.k AS INT) AS k, n.n_rich,
       CAST(COALESCE(e.e_dir, 0) AS BIGINT) AS n_edges_rich,
       CAST(CASE WHEN n.n_rich > 1
                 THEN COALESCE(e.e_dir, 0) * 10000
                      // (n.n_rich * (n.n_rich - 1))
                 ELSE 0 END AS BIGINT) AS phi_bps
FROM rc_nodes n LEFT JOIN rc_edges e ON e.k = n.k
ORDER BY k
"""


@query("graph_rich_club", "2.12 composite workloads", _RC_ORACLE)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) — do the hubs trade with EACH OTHER?
    Among nodes of degree > k, the realized fraction of possible
    directed edges, at four cuts: a rising φ(k) is the hub-oligopoly
    signature (core-periphery), a flat one a decentralized market.
    All-integer: degree census, membership join, and one integral bps
    division per cut.

    Scale shape: degree census is one keyed count over the edge list;
    membership is a broadcast-joined k-table; the rich-rich edge count
    joins edges to the (small) rich set on BOTH endpoints — at scale
    the rich set is by construction tiny (hubs), so both joins
    broadcast."""
    edges = _cs_edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    ks = spark.createDataFrame([(k,) for k in _RC_KS], "k int")
    rich = F.broadcast(ks).join(deg, deg.d > ks.k).select("k", "node")
    r1 = rich.select(F.col("k").alias("k1"), F.col("node").alias("n1"))
    r2 = rich.select(F.col("k").alias("k2"), F.col("node").alias("n2"))
    rc_edges = (
        edges.join(r1, edges.src == r1.n1)
        .join(r2, (edges.dst == r2.n2) & (r1.k1 == r2.k2))
        .groupBy(F.col("k1").alias("k"))
        .agg(F.count(F.lit(1)).alias("e_dir"))
    )
    rc_nodes = rich.groupBy("k").agg(F.count(F.lit(1)).alias("n_rich"))
    return (
        rc_nodes.join(rc_edges, "k", "left")
        .select(
            F.col("k").cast("int").alias("k"),
            "n_rich",
            F.coalesce("e_dir", F.lit(0)).alias("n_edges_rich"),
            F.expr(
                "CAST(CASE WHEN n_rich > 1 THEN COALESCE(e_dir, 0) * 10000"
                " DIV (n_rich * (n_rich - 1)) ELSE 0 END AS BIGINT)"
            ).alias("phi_bps"),
        )
        .orderBy("k")
    )


# ------ 2.12 composite: Wald SPRT as an exact integer random walk

# symmetric hypotheses p0 = 0.48 vs p1 = 0.52 make the per-trial LLR
# ±ln(13/12); the ONE float (ln(13/12), ln 19) is computed ONCE here and
# embedded as the same integer literal in both engines — the walk itself
# is pure integer arithmetic.
_LLR_E6 = int(math.floor(math.log(52 / 48) * 1_000_000 + 0.5))  # 80043
_THRESH_E6 = int(math.floor(math.log(19.0) * 1_000_000 + 0.5))  # 2944439

_SPRT_ORACLE = f"""
WITH weekly AS (
  SELECT date_trunc('week', l_shipdate) AS wk,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS s,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT)
           AS f
  FROM lineitem WHERE year(l_shipdate) = 1995
    AND l_returnflag IN ('R', 'N')
  GROUP BY 1
),
walk AS (
  SELECT wk, CAST(row_number() OVER (ORDER BY wk) AS BIGINT) AS week_ix,
         CAST((SUM(s - f) OVER (ORDER BY wk)) * {_LLR_E6} AS BIGINT)
           AS llr_e6
  FROM weekly
),
crossing AS (
  SELECT min(week_ix) AS cross_week FROM walk
  WHERE abs(llr_e6) >= {_THRESH_E6}
)
SELECT CAST(count(*) AS BIGINT) AS n_weeks,
       CAST((SELECT cross_week FROM crossing) AS BIGINT) AS crossing_week,
       CAST(max_by(llr_e6, week_ix) AS BIGINT) AS final_llr_e6,
       CAST(max(abs(llr_e6)) AS BIGINT) AS max_abs_llr_e6,
       CASE WHEN (SELECT cross_week FROM crossing) IS NULL THEN 'continue'
            WHEN max_by(llr_e6, week_ix) >= 0 THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision
FROM walk
"""


@query("wl_sprt_sequential_test", "2.12 composite workloads", _SPRT_ORACLE)
def wl_sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT — the sequential test that ends an experiment the
    week the evidence suffices instead of at a fixed horizon: under
    symmetric hypotheses (p₀=0.48 vs p₁=0.52 on the returned-share) the
    cumulative log-likelihood ratio is (successes − failures)·ln(13/12)
    — a pure INTEGER random walk once the single constant is fixed on
    the e6 grid (computed once, embedded identically in both engines;
    threshold ln 19 for α=β=0.05 likewise). The readout: first crossing
    week, final LLR, decision.

    Scale shape: weekly cells reduce map-side; the walk is one window
    over ≤52 rows; the whole test is a census row."""
    weekly = (
        load(spark, sf_dir, "lineitem")
        .where(
            (F.year("l_shipdate") == 1995)
            & F.col("l_returnflag").isin("R", "N")
        )
        .groupBy(F.date_trunc("week", "l_shipdate").alias("wk"))
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("s"),
            F.sum(
                F.when(F.col("l_returnflag") == "N", 1).otherwise(0)
            ).alias("f"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("wk").rowsBetween(Window.unboundedPreceding, 0)
    walk = weekly.select(
        F.row_number().over(Window.orderBy("wk")).cast("long").alias(
            "week_ix"
        ),
        (F.sum(F.col("s") - F.col("f")).over(w) * _LLR_E6).alias("llr_e6"),
    )
    agg = walk.agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.min(
            F.when(
                F.abs(F.col("llr_e6")) >= _THRESH_E6, F.col("week_ix")
            )
        ).alias("crossing_week"),
        F.max_by("llr_e6", "week_ix").alias("final_llr_e6"),
        F.max(F.abs("llr_e6")).alias("max_abs_llr_e6"),
    )
    return agg.select(
        "n_weeks",
        "crossing_week",
        "final_llr_e6",
        "max_abs_llr_e6",
        F.when(F.col("crossing_week").isNull(), "continue")
        .when(F.col("final_llr_e6") >= 0, "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
    )


# ------ 2.9 llm-data: row projection profile on the real BMP path

_PROFILE_SUBSET = "doc_id % 5 = 0"

_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_rows", T.IntegerType()),
        T.StructField("total_gray", T.LongType()),
        T.StructField("peak_row_sum", T.LongType()),
        T.StructField("peak_row", T.IntegerType()),
    ]
)

_PROFILE_ORACLE = f"""
WITH m AS (
  SELECT doc_id, 8 + (doc_id % 5) * 4 AS w, 6 + (doc_id % 3) * 4 AS h
  FROM documents WHERE {_PROFILE_SUBSET}
),
px AS (
  SELECT m.doc_id, m.w, m.h, yy.y, xx.x,
         ((7 * m.doc_id + 3 * xx.x + 5 * yy.y) % 256
          + (11 * m.doc_id + xx.x + 2 * yy.y) % 256
          + (13 * m.doc_id + 2 * xx.x + yy.y) % 256) // 3 AS g
  FROM m
  JOIN (SELECT unnest(range(0, 64)) AS y) yy ON yy.y < m.h
  JOIN (SELECT unnest(range(0, 64)) AS x) xx ON xx.x < m.w
),
rows_ AS (
  SELECT doc_id, h, y, CAST(SUM(g) AS BIGINT) AS rs
  FROM px GROUP BY doc_id, h, y
),
ranked AS (
  SELECT doc_id, h, y, rs, max(rs) OVER (PARTITION BY doc_id) AS pk
  FROM rows_
)
SELECT doc_id AS media_id, CAST(h AS INT) AS n_rows,
       CAST(SUM(rs) AS BIGINT) AS total_gray,
       CAST(max(pk) AS BIGINT) AS peak_row_sum,
       CAST(min(CASE WHEN rs = pk THEN y END) AS INT) AS peak_row
FROM ranked GROUP BY doc_id, h ORDER BY media_id
"""


@query("multimodal_image_row_profile", "2.9 llm-data", _PROFILE_ORACLE)
def multimodal_image_row_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row projection profile — the layout-analysis primitive (text-line
    finding, horizon detection, banding QA): per image, integer gray
    row sums over the REAL BMP decode path (encode_bmp → decode_image),
    reporting the brightest row (earliest on ties) and the total. Gray
    is the integral (r+g+b) DIV 3, so the whole profile is exact and
    the closed-form oracle catches any stride, flip, or channel-order
    bug in the decode walk.

    Scale shape: encode+decode+profile in ONE mapInPandas stage;
    payloads never shuffle — 4 scalars per image leave the partition
    (the multimodal_image_tiles discipline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
            encode_bmp,
        )
        from hdc_dataengineering_sqlsync_spark.operators.multimodal import (
            decode_image,
        )
        from hdc_dataengineering_sqlsync_spark.plans.mediacodec import (
            _image_pixels,
        )

        for pdf in batches:
            rows = []
            for mid in pdf["doc_id"].to_numpy(dtype=np.int64):
                m = int(mid)
                px = decode_image(encode_bmp(_image_pixels(m)))
                g = px.astype(np.int64).sum(axis=2) // 3
                rs = g.sum(axis=1)
                pk = int(rs.max())
                rows.append(
                    (m, px.shape[0], int(g.sum()), pk, int(rs.argmax()))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _PROFILE_SCHEMA.fields]
            )

    docs = load(spark, sf_dir, "documents").where(_PROFILE_SUBSET)
    ids = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    return sort_reduction(ids.mapInPandas(run, schema=_PROFILE_SCHEMA), "media_id")
