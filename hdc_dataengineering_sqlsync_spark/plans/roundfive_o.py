"""SURVEY.md §2 round-5 additions, batch X.

Legacy-charset CSV ingestion and schema-evolution union. Registered
after ``roundfive_n`` (plans/__init__.py) so the qids append to the END
of the never-checked rotation segment.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# -------------- 2.1 scans: legacy-charset (latin-1) CSV ingestion

_CSV_ENC_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_total,
       CAST(SUM(length(n_name || 'é-ñ')) AS BIGINT) AS chars_total,
       CAST(COUNT(DISTINCT n_name || 'é-ñ') AS BIGINT) AS n_labels
FROM nation
"""


@query("scan_csv_encoding", "2.1 scans", _CSV_ENC_ORACLE)
def scan_csv_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """charset-option CSV read: latin-1 bytes decoded correctly, not mojibake.

    The other half of `fn_utf8_validation`'s byte-hygiene story: many
    legacy exports are ISO-8859-1, where 'é' is the single byte 0xE9 —
    read as UTF-8 that byte is INVALID (and 'ñ' = 0xF1 likewise), so a
    default read either corrupts or nulls the field. The staged file is
    written in REAL latin-1 bytes (each accented char one byte, verified
    by the writer); `spark.read.option("encoding", "ISO-8859-1")`
    decodes it so the census (codepoint lengths, distinct labels) equals
    the closed form computed over proper unicode strings. A UTF-8
    misread cannot produce these counts.

    Scale shape: charset decoding is per-record in the scan; unlike
    multiLine CSV, single-byte charsets keep files line-splittable.
    Normalize to UTF-8 parquet in the landing pass and never carry the
    charset downstream."""
    n = load(spark, sf_dir, "nation")
    tag = hashlib.md5(f"csvenc:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:8]
    root = os.path.join(tempfile.gettempdir(), f"hdc_csvenc_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    try:
        rows = n.select("n_nationkey", "n_name").orderBy("n_nationkey").collect()
        with open(os.path.join(root, "feed.csv"), "wb") as fh:
            for r in rows:
                fh.write(f"{r.n_nationkey},{r.n_name}é-ñ\n".encode("iso-8859-1"))
        back = (
            spark.read.schema("k BIGINT, label STRING")
            .option("encoding", "ISO-8859-1")
            .csv(root)
        )
        out = back.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("key_total"),
            F.sum(F.length("label")).alias("chars_total"),
            F.countDistinct("label").alias("n_labels"),
        )
        out.collect()  # materialize before staging removal
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# -------------- 2.6 sorts/sets: schema-evolution union

_UNION_EVOLVE_ORACLE = """
WITH v1 AS (
  SELECT o_orderkey AS id,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CAST(NULL AS VARCHAR) AS channel
  FROM orders WHERE o_orderkey % 3 = 0
),
v2 AS (
  SELECT o_orderkey AS id,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'store' END AS channel
  FROM orders WHERE o_orderkey % 3 = 1
)
SELECT COALESCE(channel, '(pre-schema)') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
GROUP BY 1 ORDER BY 1
"""


@query("set_union_schema_evolution", "2.6 sorts/sets", _UNION_EVOLVE_ORACLE)
def set_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): union across schema versions.

    The snapshot-concatenation reality of a long-lived sync target: the
    v1 extract predates the `channel` column, the v2 extract carries it.
    Positional UNION would mis-align or fail; `unionByName` matches BY
    NAME and `allowMissingColumns=True` fills the absent column with
    NULL on the older side — the read-time form of schema evolution
    (the write-time forms are `scan_schema_merge` /
    `sync_schema_evolution_apply`). The census buckets '(pre-schema)'
    rows explicitly so silent misalignment hash-fails.

    Scale shape: union is plan-level concatenation — zero shuffle; the
    NULL fill is a literal projection on the v1 leg."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    v1 = o.where(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("id"), cents.alias("cents")
    )
    v2 = o.where(F.col("o_orderkey") % 3 == 1).select(
        F.col("o_orderkey").alias("id"),
        cents.alias("cents"),
        F.when(F.col("o_orderkey") % 2 == 0, "web").otherwise("store").alias("channel"),
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    return (
        u.groupBy(F.coalesce("channel", F.lit("(pre-schema)")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total_cents"),
        )
        .orderBy("channel")
    )
