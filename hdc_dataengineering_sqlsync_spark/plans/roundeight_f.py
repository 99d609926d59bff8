"""SURVEY.md §2 round-8 batch F: rescued-data capture for schema-on-read.

  scan_json_rescued_data   unknown-key rescue census over a JSON landing

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# Known landing schema: k, status. Extra keys appear on deterministic
# subsets of rows — exactly what a drifting producer does.
_RESCUE_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k,
         (o_orderkey % 3 = 0) AS has_prio,
         (o_orderkey % 7 = 0) AS has_clerk
  FROM orders
)
SELECT rescued_key,
       CAST(n AS BIGINT) AS n_records
FROM (
  SELECT 'prio' AS rescued_key, count(*) AS n FROM src WHERE has_prio
  UNION ALL
  SELECT 'clerk' AS rescued_key, count(*) AS n FROM src WHERE has_clerk
  UNION ALL
  SELECT '_clean' AS rescued_key, count(*) AS n FROM src
  WHERE NOT has_prio AND NOT has_clerk
)
WHERE n > 0  -- mirror groupBy: no row for an unobserved key
ORDER BY rescued_key
"""


@query("scan_json_rescued_data", "2.1 scans", _RESCUE_ORACLE)
def scan_json_rescued_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescued-data capture for schema-on-read JSON — the "_rescued_data"
    mechanism managed platforms bolt onto drifting producers, built from
    builtins: the landing is read against the DECLARED schema (k, status)
    while ``json_object_keys`` on the raw line diffs every record's
    actual keys against the declaration; unknown keys are exploded into a
    rescue census (which keys, how many records) and clean records are
    counted — the audit that decides whether a sync's schema contract
    drifted before data is silently dropped. JSON lines are synthesized
    in-plan from orders (extra 'prio' on k%3==0, 'clerk' on k%7==0), so
    the oracle recomputes the census from arithmetic alone and never
    parses JSON.

    Scale shape: one map-side projection (to_json, json_object_keys,
    array except against a literal) + an explode of the (near-empty)
    unknown-key arrays + a tiny key census. At 100 TB the rescue pass
    rides the same scan the ingest already pays; only rescued KEYS (not
    payloads) reach the shuffle."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderstatus")
    raw = o.select(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.lit("ok").alias("status"),
                F.when(F.col("o_orderkey") % 3 == 0, F.col("o_orderpriority")).alias("prio"),
                F.when(F.col("o_orderkey") % 7 == 0, F.col("o_orderstatus")).alias("clerk"),
            ),
            {"ignoreNullFields": "true"}
        ).alias("line")
    )
    declared = F.array(F.lit("k"), F.lit("status"))
    keyed = raw.select(
        F.array_except(F.json_object_keys(F.col("line")), declared).alias("unknown")
    )
    rescued = keyed.select(
        F.explode(
            F.when(F.size("unknown") > 0, F.col("unknown")).otherwise(F.array(F.lit("_clean")))
        ).alias("rescued_key")
    )
    return (
        rescued.groupBy("rescued_key")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .orderBy("rescued_key")
    )
