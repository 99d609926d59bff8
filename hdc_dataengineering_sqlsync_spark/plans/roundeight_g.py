"""SURVEY.md §2 round-8 batch G: TIFF as the fourth real container codec,
VARIANT schema introspection, exact truncated Katz centrality.

  multimodal_decode_tiff   IFD tag-walk decode, oracle-verified
  fn_variant_schema_of     schema_of_variant census over mixed shapes
  graph_katz_2step         Katz centrality, k<=2 walks, integer 1/64 units

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
from hdc_dataengineering_sqlsync_spark.plans.graphs import (
    _CS_EDGES_SQL,
    _NODE_RENDER_SQL,
    _cs_edges,
    _render_node,
)
from hdc_dataengineering_sqlsync_spark.plans.mediacodec import _image_pixels
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------------------ 2.9 llm-data: REAL TIFF decode (IFD tag walk)

_TIFF_SUBSET = "doc_id % 4 = 1"

_TIFF_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("n_strips", T.IntegerType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
    ]
)

_TIFF_ORACLE = f"""
WITH m AS (SELECT doc_id, 8 + (doc_id % 5) * 4 AS w, 6 + (doc_id % 3) * 4 AS h
           FROM documents WHERE {_TIFF_SUBSET}),
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
       CAST((h + 3) // 4 AS INT) AS n_strips,
       CAST(sum(r) AS BIGINT) AS r_sum,
       CAST(sum(g) AS BIGINT) AS g_sum,
       CAST(sum(b) AS BIGINT) AS b_sum
FROM px GROUP BY doc_id, w, h ORDER BY media_id
"""


@query("multimodal_decode_tiff", "2.9 llm-data", _TIFF_ORACLE)
def multimodal_decode_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF decode, oracle-verified — the FOURTH container format in
    the codec matrix (after BMP/PNG/GIF + JPEG): closed-form pixels ->
    actual multi-strip baseline TIFF bytes (encode_tiff, RowsPerStrip=4,
    which does NOT divide the fixture heights — strip reassembly is
    genuinely exercised) -> full IFD tag-walk decode (inline-vs-offset
    value resolution, strip offset/count tables) -> exact integer channel
    sums plus the strip count the IFD must declare. The oracle recomputes
    everything from the closed form and never sees the bytes, so a wrong
    tag type, byte-order slip, or strip-stitch bug mismatches.

    Scale shape: encode+decode inside ONE mapInPandas stage; payload
    bytes never shuffle — only scalar stats leave the partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.tiff import (
            decode_tiff,
            encode_tiff,
        )

        for pdf in batches:
            rows = []
            for mid in pdf["doc_id"].to_numpy(dtype=np.int64):
                m = int(mid)
                px = _image_pixels(m)
                # alternate the container byte order per doc (r12): the BE
                # (MM) IFD walk decodes to the same stats the II file and
                # the byte-blind oracle produce, so a byte-order slip in
                # either direction mismatches the hash
                payload = encode_tiff(
                    px, rows_per_strip=4, byte_order="MM" if m % 2 else "II"
                )
                decoded, meta = decode_tiff(payload, return_meta=True)
                out = decoded.astype(np.int64)
                h, w = out.shape[:2]
                rows.append(
                    (
                        m,
                        w,
                        h,
                        # the strip count the payload's IFD actually declared
                        # (len of the decoded StripOffsets table) — a genuine
                        # payload-derived check against the oracle's (h+3)//4
                        meta["n_strips"],
                        int(out[:, :, 0].sum()),
                        int(out[:, :, 1].sum()),
                        int(out[:, :, 2].sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _TIFF_STATS_SCHEMA.fields])

    docs = load(spark, sf_dir, "documents").where(_TIFF_SUBSET)
    ids = docs.select("doc_id").repartition(spark.sparkContext.defaultParallelism)
    return sort_reduction(ids.mapInPandas(run, schema=_TIFF_STATS_SCHEMA), "media_id")


# --------------- 2.7 scalar functions: VARIANT schema introspection

_SCHEMA_OF_ORACLE = """
SELECT CASE o_orderkey % 3
         WHEN 0 THEN 'OBJECT<k: BIGINT>'
         WHEN 1 THEN 'OBJECT<k: BIGINT, pr: BIGINT>'
         ELSE 'OBJECT<k: BIGINT, tags: ARRAY<STRING>>'
       END AS shape,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderkey % 3 ORDER BY shape
"""


@query("fn_variant_schema_of", "2.7 scalar functions", _SCHEMA_OF_ORACLE)
def fn_variant_schema_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``schema_of_variant`` over a heterogeneous landing — the drift
    census a VARIANT-first ingest runs to see what shapes a producer
    actually sends: three deterministic JSON shapes are synthesized from
    orders (bare, +integer price field, +string array), parsed to VARIANT,
    and the inferred per-record schema strings are counted. The oracle
    pins the exact schema-string rendering Spark 4 produces (OBJECT<...>
    with field types) — a regression in variant inference or rendering
    flips the hash. Integer/string fields only: a float field's inferred
    DECIMAL(p,s) varies per VALUE and would fragment the census.

    Scale shape: map-side parse + schema render; one tiny census."""
    o = load(spark, sf_dir, "orders")
    js = (
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.to_json(F.struct(F.col("o_orderkey").alias("k"))),
        )
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.to_json(
                F.struct(
                    F.col("o_orderkey").alias("k"),
                    F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("pr"),
                )
            ),
        )
        .otherwise(
            F.to_json(
                F.struct(
                    F.col("o_orderkey").alias("k"),
                    F.array(F.col("o_orderstatus")).alias("tags"),
                )
            )
        )
    )
    return (
        o.select(F.schema_of_variant(F.parse_json(js)).alias("shape"))
        .groupBy("shape")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("shape")
    )


# ------------------- 2.12 composite: truncated Katz centrality (exact)

_KATZ_ORACLE = f"""
WITH {_CS_EDGES_SQL},
deg AS (SELECT dst AS node, count(*) AS d FROM edges GROUP BY dst),
w2 AS (
  SELECT e.dst AS node, sum(ds.d) AS walks2
  FROM edges e JOIN deg ds ON ds.node = e.src
  GROUP BY e.dst
)
SELECT {_NODE_RENDER_SQL.format(n="deg.node")} AS node,
       CAST(8 * deg.d + w2.walks2 AS BIGINT) AS katz_64ths
FROM deg JOIN w2 ON w2.node = deg.node
ORDER BY katz_64ths DESC, deg.node LIMIT 20
"""


@query("graph_katz_2step", "2.12 composite workloads", _KATZ_ORACLE)
def graph_katz_2step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality truncated at walk length 2 with alpha = 1/8 —
    the influence measure that (unlike degree) credits well-connected
    neighbors, exact because the weights are powers of two: 64*(alpha*
    walks1 + alpha^2*walks2) = 8*deg(v) + walks2(v), an integer in 1/64
    units. walks2(v) = sum of deg(u) over in-edges u->v — one join of the
    edge list against the degree table. Top-20 nodes, total-order
    tie-break. The full iterative Katz is this same join iterated; the
    truncation is what bounds it for an exact oracle.

    Scale shape: degree census (map-combinable) + ONE edges-deg equi-join
    + keyed sum + TakeOrderedAndProject — no iteration state, one shuffle
    round more than a degree count."""
    # edges feeds the degree census AND the walks2 join (which reads the
    # degree census again) — checkpoint both once (the graphs.py edge
    # discipline; r10 plan audit caught the fact subtree recomputing).
    edges = _cs_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        edges.groupBy(F.col("dst").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=True)
    )
    w2 = (
        edges.join(deg.withColumnRenamed("node", "src_node"), F.col("src") == F.col("src_node"))
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("d").alias("walks2"))
    )
    scored = deg.join(w2, "node").select(
        "node", (8 * F.col("d") + F.col("walks2")).cast("long").alias("katz_64ths")
    )
    return (
        scored.orderBy(F.desc("katz_64ths"), "node")
        .limit(20)
        .select(_render_node("node").alias("node"), "katz_64ths")
    )
