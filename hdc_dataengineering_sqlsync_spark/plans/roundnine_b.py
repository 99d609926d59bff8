"""SURVEY.md §2 round-9 batch B: histogram equalization on the real BMP
path, corpus vocabulary-richness, IPv4/CIDR classification, stage-DAG
critical paths, token-set entity resolution.

  multimodal_histogram_eq      per-image integer histogram equalization
  text_hapax_ratio             hapax / type-token vocabulary richness
  fn_ipv4_cidr_match           IPv4 format+parse+CIDR containment census
  wl_critical_path_stages      per-order stage-DAG critical path + slack
  wl_entity_resolution_tokenset token-sort-key ER across two messy feeds

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

# -------- 2.9 llm-data: histogram equalization (exact integer CDF remap)

_EQ_SUBSET = "doc_id % 4 = 3"

_EQ_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("eq_checksum", T.LongType()),
    ]
)

_EQ_ORACLE = f"""
WITH m AS (SELECT doc_id, 8 + (doc_id % 5) * 4 AS w, 6 + (doc_id % 3) * 4 AS h
           FROM documents WHERE {_EQ_SUBSET}),
px AS (
  SELECT m.doc_id, m.w, m.h, xs.x, ys.y,
         (7 * m.doc_id + 3 * xs.x + 5 * ys.y) % 256 AS v
  FROM m
  JOIN (SELECT unnest(range(0, 24)) AS x) xs ON xs.x < m.w
  JOIN (SELECT unnest(range(0, 14)) AS y) ys ON ys.y < m.h
),
hist AS (SELECT doc_id, v, count(*) AS c FROM px GROUP BY doc_id, v),
cdf AS (
  SELECT doc_id, v,
         SUM(c) OVER (PARTITION BY doc_id ORDER BY v) AS cum
  FROM hist
),
bounds AS (SELECT doc_id, MIN(cum) AS cmin, MAX(cum) AS n FROM cdf GROUP BY doc_id),
remap AS (
  SELECT cdf.doc_id, cdf.v,
         CASE WHEN b.n > b.cmin
              THEN (cdf.cum - b.cmin) * 255 // (b.n - b.cmin)
              ELSE 0 END AS ev
  FROM cdf JOIN bounds b ON b.doc_id = cdf.doc_id
)
SELECT px.doc_id AS media_id, CAST(px.w AS INT) AS w, CAST(px.h AS INT) AS h,
       CAST(SUM((px.x + 2 * px.y + 1) * r.ev) AS BIGINT) AS eq_checksum
FROM px JOIN remap r ON r.doc_id = px.doc_id AND r.v = px.v
GROUP BY px.doc_id, px.w, px.h ORDER BY media_id
"""


@query("multimodal_histogram_eq", "2.9 llm-data", _EQ_ORACLE)
def multimodal_histogram_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram equalization — the contrast-normalization preprocessing
    step vision pipelines run before feature extraction — done EXACTLY in
    integers on the real codec path: closed-form pixels -> BMP bytes ->
    decode -> per-image 256-bin histogram -> CDF remap
    ``(cdf(v) − cdf_min) · 255 // (n − cdf_min)`` on the red plane ->
    position-weighted checksum of the equalized image. The oracle rebuilds
    the histogram/CDF relationally from the closed form (window cumsum
    over the value census), so an off-by-one in the CDF, a wrong
    ``cdf_min``, or float rounding in the remap mismatches.

    Scale shape: decode + equalize in ONE mapInPandas pass (np.bincount +
    cumsum per image, vectorized remap via take); payloads never shuffle."""

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
                hist = np.bincount(v.ravel(), minlength=256)
                cdf = hist.cumsum()
                present = hist > 0
                cmin = int(cdf[present][0])
                n = h * w
                ev = np.zeros(256, dtype=np.int64)
                if n > cmin:
                    ev[present] = (cdf[present] - cmin) * 255 // (n - cmin)
                eq = ev[v]
                yy, xx = np.mgrid[0:h, 0:w]
                rows.append((m, w, h, int(((xx + 2 * yy + 1) * eq).sum())))
            yield pd.DataFrame(rows, columns=[f.name for f in _EQ_SCHEMA.fields])

    docs = load(spark, sf_dir, "documents").where(_EQ_SUBSET)
    ids = docs.select("doc_id").repartition(spark.sparkContext.defaultParallelism)
    return sort_reduction(ids.mapInPandas(run, schema=_EQ_SCHEMA), "media_id")


# ----------------- 2.9 llm-data: hapax / type-token vocabulary richness

_HAPAX_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents
),
counts AS (
  SELECT source, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY source, w
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT)
         AS hapax_bps,
       CAST(COUNT(*) * 10000 // SUM(c) AS BIGINT) AS ttr_bps
FROM counts GROUP BY source ORDER BY source
"""


@query("text_hapax_ratio", "2.9 llm-data", _HAPAX_ORACLE)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-richness audit per source: hapax-legomena share (words
    seen exactly once over vocabulary size) and type-token ratio — the
    lexical-diversity screens corpus curators use to spot template spam
    (low hapax/TTR) and OCR noise (anomalously high hapax) before
    training. Exact integer basis points.

    Scale shape: tokenize map-side (explode), ONE keyed word census
    (map-side combinable), then a source-grain rollup — the same
    two-level reduction every corpus-stats qid here uses; no Python in
    the hot path."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).where(F.col("w") != "")
    counts = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "vocab",
            "hapax",
            F.expr("hapax * 10000 DIV vocab").alias("hapax_bps"),
            F.expr("vocab * 10000 DIV n_tokens").alias("ttr_bps"),
        )
        .orderBy("source")
    )


# ------------- 2.7 scalar functions: IPv4 format / parse / CIDR classify

# synthetic address per order: Knuth-hash the key into 32 bits, render
# dotted-quad, PARSE IT BACK, and classify against the RFC1918 blocks —
# format->parse->bit-containment is the whole IPv4 scalar surface
_IPV4_ORACLE = """
WITH ips AS (
  SELECT (o_orderkey * 2654435761) % 4294967296 AS ipn
  FROM orders
),
formatted AS (
  SELECT CAST(ipn // 16777216 AS VARCHAR) || '.' ||
         CAST((ipn // 65536) % 256 AS VARCHAR) || '.' ||
         CAST((ipn // 256) % 256 AS VARCHAR) || '.' ||
         CAST(ipn % 256 AS VARCHAR) AS ip
  FROM ips
),
parsed AS (
  SELECT ip,
         CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
         + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
         + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
         + CAST(string_split(ip, '.')[4] AS BIGINT) AS p
  FROM formatted
)
SELECT CASE WHEN p // 16777216 = 10 THEN 'private-10/8'
            WHEN p // 1048576 = 2753 THEN 'private-172.16/12'
            WHEN p // 65536 = 49320 THEN 'private-192.168/16'
            ELSE 'public' END AS ip_class,
       CAST(count(*) AS BIGINT) AS n,
       min(ip) AS min_ip, max(ip) AS max_ip
FROM parsed GROUP BY 1 ORDER BY ip_class
"""


@query("fn_ipv4_cidr_match", "2.7 scalar functions", _IPV4_ORACLE)
def fn_ipv4_cidr_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 scalar surface — format a 32-bit address to dotted-quad, parse
    the STRING back to an integer, and classify by CIDR containment
    (RFC1918 private blocks via prefix arithmetic: /8, /12, /16 are
    integer divisions by 2^24/2^20/2^16). The network-log enrichment
    every access-log pipeline runs; round-tripping through the string
    form is what verifies both directions.

    Scale shape: pure map-side scalar expressions + one tiny census agg;
    whole-stage codegen end to end, no UDF."""
    o = load(spark, sf_dir, "orders")
    # integral DIV for the octets — double '/'+cast can round up across an
    # integer boundary (repo integer-anchor discipline)
    formatted = o.select(
        F.expr(
            "concat_ws('.', "
            " cast(((o_orderkey * 2654435761) % 4294967296) DIV 16777216 as string),"
            " cast((((o_orderkey * 2654435761) % 4294967296) DIV 65536) % 256 as string),"
            " cast((((o_orderkey * 2654435761) % 4294967296) DIV 256) % 256 as string),"
            " cast(((o_orderkey * 2654435761) % 4294967296) % 256 as string))"
        ).alias("ip")
    )
    oct_ = F.split(F.col("ip"), "\\.")
    parsed = formatted.select(
        "ip",
        (
            oct_.getItem(0).cast("long") * 16777216
            + oct_.getItem(1).cast("long") * 65536
            + oct_.getItem(2).cast("long") * 256
            + oct_.getItem(3).cast("long")
        ).alias("p"),
    )
    return (
        parsed.select(
            "ip",
            F.when(F.expr("p DIV 16777216") == 10, "private-10/8")
            .when(F.expr("p DIV 1048576") == 2753, "private-172.16/12")
            .when(F.expr("p DIV 65536") == 49320, "private-192.168/16")
            .otherwise("public")
            .alias("ip_class"),
        )
        .groupBy("ip_class")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ip").alias("min_ip"),
            F.max("ip").alias("max_ip"),
        )
        .orderBy("ip_class")
    )


# ---------------- 2.12 composite: stage-DAG critical path per order

# fixed 4-stage DAG per order (start → {A, B}; A → C; B → {C, D}; {C, D}
# → end), data-dependent integer durations; three root-to-sink paths:
#   P1 = A + C,  P2 = B + C,  P3 = B + D
_CP_ORACLE = """
WITH d AS (
  SELECT o_orderkey AS k,
         1 + o_orderkey % 5 AS da, 2 + o_orderkey % 7 AS db,
         1 + o_orderkey % 3 AS dc, 2 + o_orderkey % 4 AS dd
  FROM orders
),
paths AS (
  SELECT k, da + dc AS p1, db + dc AS p2, db + dd AS p3 FROM d
),
crit AS (
  SELECT k, greatest(p1, p2, p3) AS cp,
         CASE WHEN p1 >= p2 AND p1 >= p3 THEN 'A-C'
              WHEN p2 >= p3 THEN 'B-C' ELSE 'B-D' END AS crit_path,
         greatest(p1, p2, p3) - least(p1, p2, p3) AS max_slack
  FROM paths
)
SELECT crit_path, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(cp) AS BIGINT) AS total_cp,
       CAST(MAX(cp) AS BIGINT) AS max_cp,
       CAST(SUM(max_slack) AS BIGINT) AS total_slack
FROM crit GROUP BY crit_path ORDER BY crit_path
"""


@query("wl_critical_path_stages", "2.12 composite workloads", _CP_ORACLE)
def wl_critical_path_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Critical-path analysis over a per-order fulfillment DAG (pick →
    {pack, invoice} → ship legs) — project-scheduling's CPM reduced to
    what a data engine does well: when the DAG is a fixed shape, the
    critical path is the greatest of the enumerated root-to-sink path
    sums and slack is a subtraction, all exact integers per row. The
    per-million-orders version of a Gantt engine: no iteration, no
    graph traversal, just map-side arithmetic + one census.

    Ties resolve to the earlier path in the fixed order (P1, P2, P3) —
    the same deterministic rule in both engines.

    Scale shape: embarrassingly map-side; ONE keyed census at the end."""
    o = load(spark, sf_dir, "orders")
    d = o.select(
        (1 + F.col("o_orderkey") % 5).alias("da"),
        (2 + F.col("o_orderkey") % 7).alias("db"),
        (1 + F.col("o_orderkey") % 3).alias("dc"),
        (2 + F.col("o_orderkey") % 4).alias("dd"),
    )
    paths = d.select(
        (F.col("da") + F.col("dc")).alias("p1"),
        (F.col("db") + F.col("dc")).alias("p2"),
        (F.col("db") + F.col("dd")).alias("p3"),
    )
    crit = paths.select(
        F.greatest("p1", "p2", "p3").alias("cp"),
        F.when(
            (F.col("p1") >= F.col("p2")) & (F.col("p1") >= F.col("p3")), "A-C"
        )
        .when(F.col("p2") >= F.col("p3"), "B-C")
        .otherwise("B-D")
        .alias("crit_path"),
        (F.greatest("p1", "p2", "p3") - F.least("p1", "p2", "p3")).alias("max_slack"),
    )
    return (
        crit.groupBy("crit_path")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cp").alias("total_cp"),
            F.max("cp").alias("max_cp"),
            F.sum("max_slack").alias("total_slack"),
        )
        .orderBy("crit_path")
    )


# ------------ 2.12 composite: token-set entity resolution (two feeds)

# two "CRM exports" of the same customer universe with formatting noise:
# feed A upper-cases every other record and appends a legal suffix on
# k % 3 = 0; feed B swaps token order, lower-cases, appends a different
# suffix on k % 5 = 0, and CORRUPTS the numeric token on k % 7 = 0 (drops
# its last character) so the match census is non-trivial. Resolution key:
# lower -> strip punctuation -> tokenize -> drop legal-suffix stopwords
# (inc, llc) -> sort tokens -> join. The canonical ER blocking recipe.
_ER_ORACLE = """
WITH a AS (
  SELECT c_custkey AS k,
         CASE WHEN c_custkey % 2 = 0 THEN upper(c_name) ELSE c_name END
           || CASE WHEN c_custkey % 3 = 0 THEN ' Inc.' ELSE '' END AS name
  FROM customer
),
b AS (
  SELECT c_custkey AS k,
         CASE WHEN c_custkey % 7 = 0
              THEN substr(string_split(lower(c_name), '#')[2], 1,
                          length(string_split(lower(c_name), '#')[2]) - 1)
              ELSE string_split(lower(c_name), '#')[2] END
         || ' ' || string_split(lower(c_name), '#')[1]
         || CASE WHEN c_custkey % 5 = 0 THEN ' LLC' ELSE '' END AS name
  FROM customer
),
ca AS (
  SELECT k, array_to_string(list_sort(list_filter(
           string_split_regex(lower(regexp_replace(name, '[^a-zA-Z0-9]+', ' ', 'g')), ' '),
           t -> t <> '' AND t <> 'inc' AND t <> 'llc')), ' ') AS ck
  FROM a
),
cb AS (
  SELECT k, array_to_string(list_sort(list_filter(
           string_split_regex(lower(regexp_replace(name, '[^a-zA-Z0-9]+', ' ', 'g')), ' '),
           t -> t <> '' AND t <> 'inc' AND t <> 'llc')), ' ') AS ck
  FROM b
)
SELECT CAST(count(*) FILTER (ca.k IS NOT NULL AND cb.k IS NOT NULL) AS BIGINT)
         AS n_matched,
       CAST(count(*) FILTER (cb.k IS NULL) AS BIGINT) AS n_only_a,
       CAST(count(*) FILTER (ca.k IS NULL) AS BIGINT) AS n_only_b
FROM ca FULL OUTER JOIN cb ON ca.ck = cb.ck
"""


@query("wl_entity_resolution_tokenset", "2.12 composite workloads", _ER_ORACLE)
def wl_entity_resolution_tokenset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution between two messy feeds of the same customer
    universe — the MDM/CRM dedup shape: case noise, punctuation, token
    reordering, legal-suffix variation ('Inc.', 'LLC'), and a 1-in-7
    corrupted record. The resolver is the canonical token-sort-key:
    lower → strip punctuation → tokenize → drop suffix stopwords → sort
    → join. Output: match / A-only / B-only census (a corrupted B record
    makes both an A-only and a B-only row, so the census proves the key
    actually discriminates).

    Scale shape: canonicalization is map-side string work (codegen, no
    UDF); the resolution is ONE equi-join on the canonical key — token-
    sort-key turns fuzzy matching into hash-join-able equality, which is
    the entire reason this recipe survives at 100 TB."""
    c = load(spark, sf_dir, "customer")
    a = c.select(
        F.col("c_custkey").alias("k"),
        F.concat(
            F.when(F.col("c_custkey") % 2 == 0, F.upper("c_name")).otherwise(
                F.col("c_name")
            ),
            F.when(F.col("c_custkey") % 3 == 0, F.lit(" Inc.")).otherwise(F.lit("")),
        ).alias("name"),
    )
    num = F.split(F.lower("c_name"), "#").getItem(1)
    word = F.split(F.lower("c_name"), "#").getItem(0)
    b = c.select(
        F.col("c_custkey").alias("k"),
        F.concat(
            F.when(
                F.col("c_custkey") % 7 == 0,
                F.expr("substr(split(lower(c_name), '#')[1], 1, "
                       "length(split(lower(c_name), '#')[1]) - 1)"),
            ).otherwise(num),
            F.lit(" "),
            word,
            F.when(F.col("c_custkey") % 5 == 0, F.lit(" LLC")).otherwise(F.lit("")),
        ).alias("name"),
    )

    def canon(df: DataFrame) -> DataFrame:
        return df.select(
            "k",
            F.array_join(
                F.array_sort(
                    F.filter(
                        F.split(
                            F.lower(F.regexp_replace("name", "[^a-zA-Z0-9]+", " ")),
                            " ",
                        ),
                        lambda t: (t != "") & (t != "inc") & (t != "llc"),
                    )
                ),
                " ",
            ).alias("ck"),
        )

    ca, cb = canon(a).alias("ca"), canon(b).alias("cb")
    joined = ca.join(cb, F.col("ca.ck") == F.col("cb.ck"), "full_outer")
    return joined.agg(
        F.count(
            F.when(F.col("ca.k").isNotNull() & F.col("cb.k").isNotNull(), 1)
        ).alias("n_matched"),
        F.count(F.when(F.col("cb.k").isNull(), 1)).alias("n_only_a"),
        F.count(F.when(F.col("ca.k").isNull(), 1)).alias("n_only_b"),
    )
