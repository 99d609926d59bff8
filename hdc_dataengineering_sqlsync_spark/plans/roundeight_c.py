"""SURVEY.md §2 round-8 batch C: the Spark-4 VARIANT surface and an
exactly-verifiable Count-Min sketch.

  fn_variant_json          VARIANT parse + typed path extraction
  sketch_cms_exact_counters from-scratch CMS whose counters hash-match

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import duck_md5_int, query
from hdc_dataengineering_sqlsync_spark.registry import load

# -------------------------- 2.7 scalar functions: Spark 4 VARIANT surface

_VARIANT_ORACLE = """
SELECT o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(sum(o_orderkey % 5) AS BIGINT) AS item0_sum
FROM orders
GROUP BY o_orderstatus ORDER BY status
"""


@query("fn_variant_json", "2.7 scalar functions", _VARIANT_ORACLE)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VARIANT type end-to-end: rows are serialized to JSON
    (to_json over a nested struct+array), re-parsed with ``parse_json``
    into VARIANT, and every reported value is extracted back out with
    typed ``variant_get`` paths — scalar fields, a nested object member,
    and an array index. The oracle recomputes the census straight from
    the base columns and NEVER touches JSON, so a bug anywhere in the
    serialize -> variant-parse -> path-extract chain mismatches.

    Scale shape: the whole VARIANT round-trip is a map-side projection
    (no UDF, JVM-side variant kernels); the only shuffle is the final
    4-group census. This is the semi-structured ingestion posture at
    100 TB: parse once into VARIANT, extract typed columns, aggregate."""
    o = load(spark, sf_dir, "orders")
    js = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
            ).alias("meta"),
            F.array((F.col("o_orderkey") % 5).cast("long")).alias("items"),
        )
    )
    v = o.select(F.parse_json(js).alias("v"))
    extracted = v.select(
        F.variant_get(F.col("v"), "$.meta.status", "string").alias("status"),
        F.variant_get(F.col("v"), "$.meta.cents", "long").alias("cents"),
        F.variant_get(F.col("v"), "$.items[0]", "long").alias("item0"),
    )
    return (
        extracted.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total_cents"),
            F.sum("item0").alias("item0_sum"),
        )
        .orderBy("status")
    )


# ------------------- 2.4 aggregations: exactly-verifiable Count-Min sketch

_CMS_D = 4  # hash rows
_CMS_W = 64  # counter columns per row
_CMS_PROBES = (1, 7, 19, 42, 97)  # part keys to point-query

_CMS_ORACLE = f"""
WITH occ AS (
  SELECT l_partkey AS key, count(*) AS cnt FROM lineitem GROUP BY l_partkey
),
cells AS (
  SELECT j.j,
         {duck_md5_int("CAST(j.j AS VARCHAR) || ':' || CAST(occ.key AS VARCHAR)", 12)}
           % {_CMS_W} AS bucket,
         occ.cnt
  FROM occ, unnest([0, 1, 2, 3]) j(j)
),
cms AS (SELECT j, bucket, sum(cnt) AS counter FROM cells GROUP BY j, bucket),
probes AS (SELECT unnest({list(_CMS_PROBES)}) AS pkey),
est AS (
  SELECT p.pkey,
         min(cms.counter) AS cms_est
  FROM probes p
  JOIN (SELECT j.j AS j,
               {duck_md5_int("CAST(j.j AS VARCHAR) || ':' || CAST(p2.pkey AS VARCHAR)", 12)}
                 % {_CMS_W} AS bucket,
               p2.pkey AS pkey
        FROM (SELECT unnest({list(_CMS_PROBES)}) AS pkey) p2, unnest([0, 1, 2, 3]) j(j)) pb
    ON pb.pkey = p.pkey
  JOIN cms ON cms.j = pb.j AND cms.bucket = pb.bucket
  GROUP BY p.pkey
)
SELECT CAST(est.pkey AS BIGINT) AS probe_key,
       CAST(coalesce(occ.cnt, 0) AS BIGINT) AS true_cnt,
       CAST(est.cms_est AS BIGINT) AS cms_est,
       CAST(est.cms_est - coalesce(occ.cnt, 0) AS BIGINT) AS over_by
FROM est LEFT JOIN occ ON occ.key = est.pkey
ORDER BY probe_key
"""


@query("sketch_cms_exact_counters", "2.4 aggregations", _CMS_ORACLE)
def sketch_cms_exact_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch made hash-verifiable (the agg_hll_exact_registers
    discipline applied to the OTHER classic stream sketch): a d=4 x w=64
    counter matrix built from scratch with the engine-portable md5 bucket
    hash, then point-queried (est = min over the d counters) for 5 part
    keys. Every counter and estimate is an exact integer both engines
    derive identically, and the oracle re-verifies the defining CMS
    guarantee est >= true count (over_by >= 0) value-for-value.

    Scale shape: the key census reduces map-side first (Zipf-collapsed),
    the d-way fan-out runs on the DISTINCT-key grain, and the sketch
    itself is a fixed 256-cell table — mergeable across shards by plain
    addition, which is the whole point of CMS at 100 TB."""
    occ = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    j = F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("j")
    cells = occ.select("key", "cnt", j).select(
        "j",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("j").cast("string"), F.col("key").cast("string"))),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        ).alias("bucket"),
        "cnt",
    )
    cms = cells.groupBy("j", "bucket").agg(F.sum("cnt").alias("counter"))
    probes = spark.createDataFrame([(k,) for k in _CMS_PROBES], ["pkey"])
    pb = probes.select(F.col("pkey").cast("long").alias("pkey"), j).select(
        "pkey",
        "j",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(":", F.col("j").cast("string"), F.col("pkey").cast("string"))
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        ).alias("bucket"),
    )
    est = (
        pb.join(F.broadcast(cms), ["j", "bucket"])
        .groupBy("pkey")
        .agg(F.min("counter").alias("cms_est"))
    )
    # true counts only for the probe keys: the IN filter pushes to the
    # scan side and keeps the compare join 5-vs-5 at ANY corpus size
    occ_probes = occ.where(F.col("key").isin(*[int(k) for k in _CMS_PROBES]))
    return (
        est.join(F.broadcast(occ_probes), est.pkey == occ_probes.key, "left")
        .select(
            F.col("pkey").alias("probe_key"),
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("true_cnt"),
            F.col("cms_est").cast("long").alias("cms_est"),
            (F.col("cms_est") - F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("over_by"),
        )
        .orderBy("probe_key")
    )
