"""SURVEY.md §2 round-9 batch A: animated-GIF + orientation-aware TIFF
codec depth, anchored/irregular time-weighted prices, Welch's t, Jaccard
link prediction, materialized-path subtree relocation.

  multimodal_gif_animation    multi-frame GIF89a (GCE delays, NETSCAPE loop)
  multimodal_tiff_orientation EXIF-style orientation tag honored on decode
  ts_vwap_anchored            per-brand year-anchored VWAP, integer cents
  ts_twap_irregular           duration-weighted TWAP over irregular events
  wl_ttest_welch              Welch's t² from exact integer moments
  graph_jaccard_linkpred      supplier link prediction, Jaccard in bps
  hier_subtree_move           materialized-path subtree re-parenting

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

# ------------- 2.9 llm-data: animated GIF (multi-frame container decode)

_ANIM_SUBSET = "doc_id % 5 = 3"

_ANIM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("total_delay_cs", T.LongType()),
        T.StructField("lum_checksum", T.LongType()),
    ]
)

# palette color i = ((13i) % 256, (7i) % 256, (29i) % 256), 16 entries —
# shared closed form between the encoder fixture and the oracle
_ANIM_ORACLE = f"""
WITH m AS (
  SELECT doc_id, 6 + (doc_id % 4) * 2 AS w, 5 + (doc_id % 3) * 2 AS h,
         2 + (doc_id % 3) AS nf
  FROM documents WHERE {_ANIM_SUBSET}
),
px AS (
  SELECT m.doc_id, m.nf, fs.f,
         (m.doc_id + 3 * xs.x + 5 * ys.y + 11 * fs.f) % 16 AS idx
  FROM m
  JOIN (SELECT unnest(range(0, 4)) AS f) fs ON fs.f < m.nf
  JOIN (SELECT unnest(range(0, 12)) AS x) xs ON xs.x < m.w
  JOIN (SELECT unnest(range(0, 9)) AS y) ys ON ys.y < m.h
),
lum AS (
  SELECT doc_id, nf,
         CAST(SUM((f + 1) * (2 * ((idx * 13) % 256)
                             + 3 * ((idx * 7) % 256)
                             + 5 * ((idx * 29) % 256))) AS BIGINT) AS lum_checksum
  FROM px GROUP BY doc_id, nf
),
d AS (
  SELECT m.doc_id,
         CAST(SUM(4 + (m.doc_id + fs.f) % 6) AS BIGINT) AS total_delay_cs
  FROM m JOIN (SELECT unnest(range(0, 4)) AS f) fs ON fs.f < m.nf
  GROUP BY m.doc_id
)
SELECT lum.doc_id AS media_id, CAST(lum.nf AS INT) AS n_frames,
       d.total_delay_cs, lum.lum_checksum
FROM lum JOIN d ON d.doc_id = lum.doc_id
ORDER BY media_id
"""

_ANIM_PALETTE = np.stack(
    [(np.arange(16) * 13) % 256, (np.arange(16) * 7) % 256, (np.arange(16) * 29) % 256],
    axis=1,
).astype(np.uint8)


def _anim_frames(m: int) -> tuple[list[np.ndarray], list[int]]:
    w, h, nf = 6 + (m % 4) * 2, 5 + (m % 3) * 2, 2 + (m % 3)
    y, x = np.mgrid[0:h, 0:w]
    frames = [((m + 3 * x + 5 * y + 11 * f) % 16).astype(np.uint8) for f in range(nf)]
    delays = [4 + (m + f) % 6 for f in range(nf)]
    return frames, delays


@query("multimodal_gif_animation", "2.9 llm-data", _ANIM_ORACLE, bench=True)
def multimodal_gif_animation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANIMATED GIF decode, oracle-verified — the container's multi-frame
    block stream, not just one image: closed-form index frames -> real
    GIF89a bytes (encode_gif_animation: NETSCAPE2.0 loop extension, a
    Graphic Control Extension carrying each frame's centisecond delay,
    per-frame LZW image data) -> full block-walk decode
    (decode_gif_animation: extension skip/capture, repeated descriptor +
    LZW inflate) -> frame count, summed delays, frame-weighted luminance
    checksum over the DECODED RGB. The oracle recomputes everything from
    the closed form and never sees the bytes: a GCE mis-parse, frame-order
    slip, dictionary-reset bug, or palette-map error mismatches.

    Scale shape: encode+decode in ONE mapInPandas pass over doc ids;
    payload bytes never shuffle — 4 scalar columns per clip leave the
    stage. Frame work is per-blob and embarrassingly parallel; ids are
    repartitioned first so a single input file still fans across cores
    (the JPEG-qid lesson)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
            decode_gif_animation,
            encode_gif_animation,
        )

        for pdf in batches:
            rows = []
            for mid in pdf["doc_id"].to_numpy(dtype=np.int64):
                m = int(mid)
                frames, delays = _anim_frames(m)
                blob = encode_gif_animation(frames, _ANIM_PALETTE, delays)
                out_frames, out_delays = decode_gif_animation(blob)
                lum = 0
                for f, rgb in enumerate(out_frames):
                    px = rgb.astype(np.int64)
                    lum += (f + 1) * int(
                        (2 * px[:, :, 0] + 3 * px[:, :, 1] + 5 * px[:, :, 2]).sum()
                    )
                rows.append((m, len(out_frames), sum(out_delays), lum))
            yield pd.DataFrame(rows, columns=[f.name for f in _ANIM_SCHEMA.fields])

    docs = load(spark, sf_dir, "documents").where(_ANIM_SUBSET)
    ids = docs.select("doc_id").repartition(spark.sparkContext.defaultParallelism)
    return sort_reduction(ids.mapInPandas(run, schema=_ANIM_SCHEMA), "media_id")


# ------- 2.9 llm-data: orientation-aware TIFF decode (EXIF-style tag 274)

_ORI_SUBSET = "doc_id % 4 = 2"

_ORI_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("orientation", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("rot_checksum", T.LongType()),
    ]
)

# orientation o = (1,3,6,8)[(doc_id DIV 4) % 4]; rotated coordinates of the
# original pixel (x, y) in a w×h image (verified against np.rot90):
#   o=1: (x, y)            dims (w, h)
#   o=3: (w-1-x, h-1-y)    dims (w, h)       [180°]
#   o=6: (h-1-y, x)        dims (h, w)       [90° CW]
#   o=8: (y, w-1-x)        dims (h, w)       [90° CCW]
_ORI_ORACLE = f"""
WITH m AS (
  SELECT doc_id, 8 + (doc_id % 5) * 4 AS w, 6 + (doc_id % 3) * 4 AS h,
         CASE (doc_id // 4) % 4 WHEN 0 THEN 1 WHEN 1 THEN 3
                                WHEN 2 THEN 6 ELSE 8 END AS o
  FROM documents WHERE {_ORI_SUBSET}
),
px AS (
  SELECT m.doc_id, m.o, m.w, m.h, xs.x, ys.y,
         2 * ((7 * m.doc_id + 3 * xs.x + 5 * ys.y) % 256)
         + 3 * ((11 * m.doc_id + xs.x + 2 * ys.y) % 256)
         + 5 * ((13 * m.doc_id + 2 * xs.x + ys.y) % 256) AS lum
  FROM m
  JOIN (SELECT unnest(range(0, 24)) AS x) xs ON xs.x < m.w
  JOIN (SELECT unnest(range(0, 14)) AS y) ys ON ys.y < m.h
)
SELECT doc_id AS media_id, CAST(o AS INT) AS orientation,
       CAST(CASE WHEN o IN (6, 8) THEN h ELSE w END AS INT) AS out_w,
       CAST(CASE WHEN o IN (6, 8) THEN w ELSE h END AS INT) AS out_h,
       CAST(SUM((3 * CASE o WHEN 1 THEN x WHEN 3 THEN w - 1 - x
                            WHEN 6 THEN h - 1 - y ELSE y END
                 + 7 * CASE o WHEN 1 THEN y WHEN 3 THEN h - 1 - y
                              WHEN 6 THEN x ELSE w - 1 - x END
                 + 1) * lum) AS BIGINT) AS rot_checksum
FROM px GROUP BY doc_id, o, w, h ORDER BY media_id
"""


@query("multimodal_tiff_orientation", "2.9 llm-data", _ORI_ORACLE)
def multimodal_tiff_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orientation-honoring TIFF ingest — the camera-metadata correction
    every image pipeline must apply before features are extracted: pixels
    are stored in file order, an EXIF-style Orientation tag (TIFF 274,
    values 1/3/6/8) says how to display them, and the READER rotates.
    Closed-form pixels -> real TIFF bytes with the tag (encode_tiff
    orientation=...) -> IFD decode reads the tag back from the payload
    (decode_tiff return_meta) -> np.rot90 by the DECLARED value -> exact
    position-weighted checksum over the ROTATED image. The oracle applies
    the rotation as a coordinate substitution on the closed form, so a
    wrong rotation direction, a transposed dimension, or a mis-read tag
    mismatches the hash.

    Scale shape: one mapInPandas pass, blobs never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.tiff import (
            decode_tiff,
            encode_tiff,
        )

        k_by_ori = {1: 0, 3: 2, 6: -1, 8: 1}  # np.rot90 k per orientation
        for pdf in batches:
            rows = []
            for mid in pdf["doc_id"].to_numpy(dtype=np.int64):
                m = int(mid)
                ori = (1, 3, 6, 8)[(m // 4) % 4]
                blob = encode_tiff(_image_pixels(m), rows_per_strip=4, orientation=ori)
                px, meta = decode_tiff(blob, return_meta=True)
                rot = np.rot90(px, k_by_ori[meta["orientation"]]).astype(np.int64)
                hh, ww = rot.shape[:2]
                yy, xx = np.mgrid[0:hh, 0:ww]
                lum = 2 * rot[:, :, 0] + 3 * rot[:, :, 1] + 5 * rot[:, :, 2]
                rows.append(
                    (
                        m,
                        meta["orientation"],
                        ww,
                        hh,
                        int(((3 * xx + 7 * yy + 1) * lum).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _ORI_SCHEMA.fields])

    docs = load(spark, sf_dir, "documents").where(_ORI_SUBSET)
    ids = docs.select("doc_id").repartition(spark.sparkContext.defaultParallelism)
    return sort_reduction(ids.mapInPandas(run, schema=_ORI_SCHEMA), "media_id")


# --------------- 2.10 time series: year-anchored VWAP in integer cents

_VWAP_ORACLE = """
WITH monthly AS (
  SELECT p.p_brand,
         CAST(year(l.l_shipdate) AS INT) AS yr,
         CAST(month(l.l_shipdate) AS INT) AS mon,
         CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                  * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS pv_cents,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand, year(l.l_shipdate), month(l.l_shipdate)
),
anchored AS (
  SELECT p_brand, yr, mon, qty,
         SUM(pv_cents) OVER w AS cum_pv, SUM(qty) OVER w AS cum_qty
  FROM monthly
  WINDOW w AS (PARTITION BY p_brand, yr ORDER BY mon
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT p_brand, yr, mon,
       CAST(cum_pv // cum_qty AS BIGINT) AS vwap_cents,
       CAST(cum_qty AS BIGINT) AS cum_qty
FROM anchored ORDER BY p_brand, yr, mon
"""


@query("ts_vwap_anchored", "2.10 streaming/time series", _VWAP_ORACLE)
def ts_vwap_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchored VWAP (volume-weighted average price since a fixed anchor —
    here each year's start), the execution-quality benchmark every trading
    and pricing pipeline computes: cumulative Σ(price×volume) / Σ(volume)
    per brand-year, reported monthly, entirely in integer cents (price
    floor-rounded to cents once per row; quantities are integral doubles,
    FIXTURES.md). The running ratio is an exact integer floor-division —
    no float accumulates anywhere.

    Scale shape: reduce to month grain FIRST (keyed agg, map-side
    combinable), then the cumulative window runs over ≤12 rows per
    (brand, year) partition — the window never sees line-item-sized data.
    Per-row products are ≤5e8 and a year's sum is bounded by 12 months of
    brand volume, orders of magnitude inside int64 even at 1000×."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    monthly = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")), li.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            F.year("l_shipdate").alias("yr"),
            F.month("l_shipdate").alias("mon"),
            (
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
                * F.col("l_quantity").cast("long")
            ).alias("pv"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("p_brand", "yr", "mon")
        .agg(F.sum("pv").alias("pv_cents"), F.sum("q").alias("qty"))
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("p_brand", "yr")
        .orderBy("mon")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        monthly.withColumn("cum_pv", F.sum("pv_cents").over(w))
        .withColumn("cum_qty", F.sum("qty").over(w))
        .select(
            "p_brand",
            "yr",
            "mon",
            F.expr("cum_pv DIV cum_qty").alias("vwap_cents"),
            "cum_qty",
        )
        .orderBy("p_brand", "yr", "mon")
    )


# ----------- 2.10 time series: duration-weighted TWAP, irregular samples

_TWAP_ORACLE = """
WITH seq AS (
  SELECT user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) AS t_us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_us
  FROM events
),
agg AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_intervals,
         CAST(SUM(next_us - t_us) AS BIGINT) AS dur_total_us,
         CAST(SUM(cents * (next_us - t_us)) AS BIGINT) AS pv
  FROM seq WHERE next_us IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_intervals, dur_total_us,
       CAST(pv // dur_total_us AS BIGINT) AS twap_cents
FROM agg WHERE dur_total_us > 0 ORDER BY user_id
"""


@query("ts_twap_irregular", "2.10 streaming/time series", _TWAP_ORACLE)
def ts_twap_irregular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWAP over IRREGULARLY sampled observations — the step-function
    integral every metering/pricing system needs when samples arrive on
    change, not on a clock: each value holds until the next observation,
    so its weight is the µs gap to the successor (lead over event time;
    the open-ended last sample is excluded). Weighted mean = exact integer
    Σ(cents·gap) // Σ(gap).

    Scale shape: ONE window pass partitioned by user (keyed shuffle),
    then a map-side-combinable keyed agg. The Σ(cents·gap) bound is
    structural — max_cents × the table's total time span (~5e4 × 2.6e12 µs
    ≈ 1.3e17) — inside int64 at any row count because the weights sum to
    the observation window, not to the row count."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        F.unix_micros("ts").alias("t_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).where(F.col("next_us").isNotNull())
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("next_us") - F.col("t_us")).alias("dur_total_us"),
            F.sum(F.col("cents") * (F.col("next_us") - F.col("t_us"))).alias("pv"),
        )
        .where(F.col("dur_total_us") > 0)
        .select(
            "user_id",
            "n_intervals",
            "dur_total_us",
            F.expr("pv DIV dur_total_us").alias("twap_cents"),
        )
        .orderBy("user_id")
    )


# ------------------ 2.12 composite: Welch's t-test (unequal variances)

# ONE shared double expression evaluated on exact integer moments in BOTH
# engines (the text_cooccurrence_pmi idiom): identical IEEE operations on
# identical inputs give bit-identical doubles.
_WELCH_T2 = (
    "(CAST({st} AS DOUBLE) / CAST({nt} AS DOUBLE)"
    " - CAST({sc} AS DOUBLE) / CAST({nc} AS DOUBLE))"
    " * (CAST({st} AS DOUBLE) / CAST({nt} AS DOUBLE)"
    " - CAST({sc} AS DOUBLE) / CAST({nc} AS DOUBLE))"
    " / ((CAST({sst} AS DOUBLE) - CAST({st} AS DOUBLE) * CAST({st} AS DOUBLE)"
    "      / CAST({nt} AS DOUBLE)) / (CAST({nt} AS DOUBLE) - 1.0)"
    "      / CAST({nt} AS DOUBLE)"
    "    + (CAST({ssc} AS DOUBLE) - CAST({sc} AS DOUBLE) * CAST({sc} AS DOUBLE)"
    "      / CAST({nc} AS DOUBLE)) / (CAST({nc} AS DOUBLE) - 1.0)"
    "      / CAST({nc} AS DOUBLE))"
)

_WELCH_ORACLE = f"""
WITH base AS (
  SELECT c.c_mktsegment AS seg, o.o_orderkey % 2 AS grp,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
moments AS (
  SELECT seg,
         CAST(COUNT(*) FILTER (grp = 1) AS BIGINT) AS n_t,
         CAST(COUNT(*) FILTER (grp = 0) AS BIGINT) AS n_c,
         CAST(SUM(cents) FILTER (grp = 1) AS BIGINT) AS s_t,
         CAST(SUM(cents) FILTER (grp = 0) AS BIGINT) AS s_c,
         SUM(CAST(cents AS DECIMAL(38,0)) * cents) FILTER (grp = 1) AS ss_t,
         SUM(CAST(cents AS DECIMAL(38,0)) * cents) FILTER (grp = 0) AS ss_c
  FROM base GROUP BY seg
)
SELECT seg, n_t, n_c,
       round({_WELCH_T2.format(st="s_t", nt="n_t", sc="s_c", nc="n_c",
                               sst="ss_t", ssc="ss_c")}, 6) AS welch_t2
FROM moments ORDER BY seg
"""


@query("wl_ttest_welch", "2.12 composite workloads", _WELCH_ORACLE)
def wl_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test per market segment — the default
    two-sample test when group variances differ (the realistic A/B case
    the pooled test and the z-test both mishandle): t² = (m̄_t − m̄_c)² /
    (s²_t/n_t + s²_c/n_c). Group moments (n, Σx, Σx²) are EXACT — cents
    per row, squares widened to DECIMAL(38,0) before summing so Σx²
    cannot overflow int64 at any scale (the r8 review's 100 TB-regime
    overflow class) — and the single float expression is ONE shared
    string formatted into both engines (identical IEEE ops on identical
    integers ⇒ bit-identical doubles, the cooccurrence-PMI idiom).

    Scale shape: one keyed agg (map-side combinable conditional
    aggregates), 5 output rows; the broadcast dim join is the only join."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == c.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("o_orderkey") % 2).alias("grp"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    moments = base.groupBy("seg").agg(
        F.count(F.when(F.col("grp") == 1, 1)).alias("n_t"),
        F.count(F.when(F.col("grp") == 0, 1)).alias("n_c"),
        F.sum(F.when(F.col("grp") == 1, F.col("cents"))).alias("s_t"),
        F.sum(F.when(F.col("grp") == 0, F.col("cents"))).alias("s_c"),
        F.sum(
            F.when(F.col("grp") == 1, F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        ).alias("ss_t"),
        F.sum(
            F.when(F.col("grp") == 0, F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        ).alias("ss_c"),
    )
    t2 = _WELCH_T2.format(st="s_t", nt="n_t", sc="s_c", nc="n_c", sst="ss_t", ssc="ss_c")
    return moments.select(
        "seg",
        "n_t",
        "n_c",
        F.round(F.expr(t2), 6).alias("welch_t2"),
    ).orderBy("seg")


# ------------- 2.12 composite: Jaccard link prediction (supplier graph)

_JACCARD_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM pairs GROUP BY s),
common AS (
  SELECT a.s AS s1, b.s AS s2, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM pairs a JOIN pairs b ON a.c = b.c AND a.s < b.s
  GROUP BY a.s, b.s
)
SELECT cm.s1, cm.s2, cm.n_common,
       CAST(cm.n_common * 10000 // (d1.d + d2.d - cm.n_common) AS BIGINT)
         AS jaccard_bps
FROM common cm JOIN deg d1 ON d1.s = cm.s1 JOIN deg d2 ON d2.s = cm.s2
ORDER BY jaccard_bps DESC, s1, s2 LIMIT 20
"""


@query("graph_jaccard_linkpred", "2.12 composite workloads", _JACCARD_ORACLE)
def graph_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-coefficient link prediction on the supplier co-purchase
    graph — the neighborhood-overlap score |N(u)∩N(v)| / |N(u)∪N(v)|
    (here: shared customers over either's customers), the third classic
    next to common-neighbors (`graph_common_neighbors`) and resource
    allocation (`graph_resource_allocation`), in exact integer basis
    points via |union| = d(u)+d(v)−|∩|.

    Scale shape: pair counts come from the relationship table self-joined
    on the blocking key (customer) — candidate pairs only materialize for
    suppliers that actually share a customer, never all-pairs; the two
    degree joins are against a supplier-count-sized table (broadcast);
    top-k is a TakeOrdered, no global sort."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg = pairs.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    a = pairs.alias("a")
    b = pairs.alias("b")
    common = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    d1 = F.broadcast(deg).alias("d1")
    d2 = F.broadcast(deg).alias("d2")
    return (
        common.join(d1, F.col("s1") == F.col("d1.s"))
        .join(d2, F.col("s2") == F.col("d2.s"))
        .select(
            "s1",
            "s2",
            "n_common",
            F.expr("n_common * 10000 DIV (d1.d + d2.d - n_common)").alias("jaccard_bps"),
        )
        .orderBy(F.col("jaccard_bps").desc(), "s1", "s2")
        .limit(20)
    )


# ----------------- 2.3 joins: materialized-path subtree re-parenting

# the shared key hierarchy (parent(k) = k DIV 10, roots < 10 — as
# hier_recursive_cte / hier_flatten_path); the move: subtree rooted at key
# 15 is re-parented under key 25, so every descendant's path swaps the
# '1/15' prefix for '2/25/15' and gains one level of depth
_MOVE_ORACLE = """
WITH RECURSIVE walk(k, path) AS (
  SELECT c_custkey, cast(c_custkey AS VARCHAR) FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, concat(w.path, '/', cast(c.c_custkey AS VARCHAR))
  FROM customer c JOIN walk w ON c.c_custkey // 10 = w.k
  WHERE c.c_custkey >= 10
),
anchors AS (
  SELECT (SELECT path FROM walk WHERE k = 15) AS old_root,
         (SELECT path FROM walk WHERE k = 25) || '/15' AS new_root
),
moved AS (
  SELECT w.k,
         CASE WHEN w.path = a.old_root OR w.path LIKE a.old_root || '/%'
              THEN a.new_root || substr(w.path, length(a.old_root) + 1)
              ELSE w.path END AS path
  FROM walk w CROSS JOIN anchors a
)
SELECT CAST(length(path) - length(replace(path, '/', '')) AS INT) AS depth,
       CAST(count(*) AS BIGINT) AS n, min(path) AS min_path, max(path) AS max_path
FROM moved GROUP BY depth ORDER BY depth
"""


@query("hier_subtree_move", "2.3 joins", _MOVE_ORACLE)
def hier_subtree_move(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree relocation in a materialized-path hierarchy — the org-chart
    /category-tree maintenance move: re-parent node 15 (and every
    descendant) under node 25 by ONE prefix rewrite on the path column,
    no re-walk of the hierarchy. The output is the post-move per-depth
    census: the moved subtree shows up one level deeper, everything else
    is untouched (min/max path pin the exact strings).

    Scale shape: the path table is built once (depth-bounded recursive
    self-joins, as hier_flatten_path); the move itself is a single
    map-side CASE against two broadcast scalar anchors — this is why
    materialized paths win over adjacency lists for subtree ops at scale:
    relocation is O(subtree) string surgery with NO join."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH RECURSIVE walk(k, path) AS (
          SELECT c_custkey, cast(c_custkey AS STRING) FROM customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, concat(w.path, '/', cast(c.c_custkey AS STRING))
          FROM customer c JOIN walk w ON c.c_custkey DIV 10 = w.k
          WHERE c.c_custkey >= 10
        ),
        anchors AS (
          SELECT (SELECT path FROM walk WHERE k = 15) AS old_root,
                 (SELECT path FROM walk WHERE k = 25) || '/15' AS new_root
        ),
        moved AS (
          SELECT w.k,
                 CASE WHEN w.path = a.old_root OR w.path LIKE a.old_root || '/%'
                      THEN a.new_root || substr(w.path, length(a.old_root) + 1)
                      ELSE w.path END AS path
          FROM walk w CROSS JOIN anchors a
        )
        SELECT CAST(length(path) - length(replace(path, '/', '')) AS INT) AS depth,
               count(*) AS n, min(path) AS min_path, max(path) AS max_path
        FROM moved GROUP BY depth ORDER BY depth
        """
    )
