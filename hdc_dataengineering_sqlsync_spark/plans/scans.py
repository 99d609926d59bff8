"""SURVEY.md §2.1 — scans, sources, sinks.

Round-trip qids exercise the sources/ layer (CSV/JSON/partitioned-parquet
write + schema'd read-back); the oracle checks the round-trip is lossless by
querying the *original* table.
"""

from __future__ import annotations

import hashlib
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import SCHEMAS, load

def _rt_base(sf_dir: str) -> Path:
    """Round-trip staging dir, keyed by sf_dir so concurrent sessions running
    the catalog against different scale factors never overwrite each other's
    in-flight round-trip files (same-sf_dir runs write identical content)."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return Path(tempfile.gettempdir()) / f"hdc_sqlsync_roundtrip_{tag}"


@query("scan_parquet_count", "2.1 scans", "SELECT count(*) AS n FROM lineitem")
def scan_parquet_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "scan_prune_filter",
    "2.1 scans",
    """
    SELECT round(sum(l_quantity), 2) AS total_qty, count(*) AS n
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def scan_prune_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter reach the parquet reader: the physical plan shows
    PushedFilters on l_shipdate and a 2-column ReadSchema (asserted in
    tests/test_plans.py) — at 100 TB this is the difference between scanning
    two columns of some row groups and scanning everything."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_quantity", "l_shipdate")
        .where(F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"), F.count(F.lit(1)).alias("n"))
    )


@query("csv_roundtrip_nation", "2.1 scans", "SELECT * FROM nation")
def csv_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source with explicit schema read-back (bulk extract/load is
    the reference's transport surface; header CSV keeps it lossless for
    int/string columns)."""
    out = str(_rt_base(sf_dir) / "nation_csv")
    load(spark, sf_dir, "nation").write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema(SCHEMAS["nation"]).option("header", True).csv(out)


@query("json_roundtrip_region", "2.1 scans", "SELECT * FROM region")
def json_roundtrip_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = str(_rt_base(sf_dir) / "region_json")
    load(spark, sf_dir, "region").write.mode("overwrite").json(out)
    return spark.read.schema(SCHEMAS["region"]).json(out)


@query(
    "parquet_partitioned_write",
    "2.1 scans",
    "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
)
def parquet_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned sink + partition-discovery source. The read-back group-by
    on the partition column is answerable from directory listing + row-group
    metadata — the layout a 100 TB table would use for partition pruning."""
    out = str(_rt_base(sf_dir) / "orders_by_status")
    load(spark, sf_dir, "orders").write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    return (
        spark.read.parquet(out)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


@query(
    "orc_roundtrip_part",
    "2.1 scans",
    """
    SELECT p_brand, count(*) AS n, round(sum(p_retailprice), 2) AS total
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)
def orc_roundtrip_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source (Spark's second bundled columnar format — same
    pushdown/pruning machinery as parquet): write `part`, read back, verify
    via per-brand rollup. Oracle reads the original table — the
    roundtrip must be lossless for the numeric/string columns."""
    out = str(_rt_base(sf_dir) / "part_orc")
    load(spark, sf_dir, "part").write.mode("overwrite").orc(out)
    return (
        spark.read.schema(SCHEMAS["part"]).orc(out)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("p_retailprice"), 2).alias("total"))
        .orderBy("p_brand")
    )


@query("xml_roundtrip_supplier", "2.1 scans", "SELECT * FROM supplier")
def xml_roundtrip_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source (built into Spark 4 — no external package): write
    `supplier` as row-tagged XML, read back with the declared schema. XML is
    the classic enterprise-integration transport; lossless here for
    int/long/double/string columns. Oracle reads the original table."""
    out = str(_rt_base(sf_dir) / "supplier_xml")
    load(spark, sf_dir, "supplier").write.mode("overwrite").format("xml").option(
        "rowTag", "supplier"
    ).save(out)
    return (
        spark.read.schema(SCHEMAS["supplier"])
        .format("xml")
        .option("rowTag", "supplier")
        .load(out)
    )


@query(
    "text_roundtrip_tokens",
    "2.1 scans",
    r"""
    SELECT count(*) AS n_lines,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           count(DISTINCT lang) AS n_langs
    FROM documents
    """,
)
def text_roundtrip_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text sink + source — the format raw LLM corpora arrive
    in. Write one tab-joined line per document, read back as `value`, split,
    and verify counts/char totals survive. At 100 TB the text source splits
    on line boundaries per 128 MB block, so parallelism is free."""
    out = str(_rt_base(sf_dir) / "documents_text")
    docs = load(spark, sf_dir, "documents")
    docs.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("lang"), F.col("text")).alias("value")
    ).write.mode("overwrite").text(out)
    parts = F.split(F.col("value"), "\t", 3)
    back = spark.read.text(out).select(
        parts.getItem(0).cast("long").alias("doc_id"),
        parts.getItem(1).alias("lang"),
        parts.getItem(2).alias("text"),
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("text")).alias("n_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


_PYDS_ORACLE = """
SELECT CAST(i % 10 AS INT) AS bucket, count(*) AS n,
       round(sum(((i * 37) % 1000) / 10.0), 2) AS total
FROM (SELECT unnest(range(0, 10000)) AS i)
GROUP BY bucket ORDER BY bucket
"""


@query("pyds_custom_source", "2.1 scans", _PYDS_ORACLE)
def pyds_custom_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python DataSource API: a custom pure-Python batch source with
    planned InputPartitions (sources/pydatasource.py) — the extensibility
    path for transports with no built-in connector. The source generates
    rows from a closed form, so the oracle recomputes them from range()
    without running the source."""
    from hdc_dataengineering_sqlsync_spark.sources.pydatasource import register

    # The reader implements pushFilters(), and PySpark 4.1 refuses to plan
    # such a reader unless this conf is on. It is runtime-settable, and the
    # external driver's session (unlike session.py's) does not set it — so it
    # must be set here, in-function, to be environment-independent.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register(spark)
    df = spark.read.format("synthetic_events").option("rows", 10000).option("partitions", 8).load()
    return (
        df.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("bucket")
    )


_PYDS_PUSH_ORACLE = """
SELECT count(*) AS n, round(sum(((i * 37) % 1000) / 10.0), 2) AS total
FROM (SELECT unnest(range(0, 10000)) AS i) WHERE i % 10 = 3
"""


@query("pyds_filter_pushdown", "2.1 scans", _PYDS_PUSH_ORACLE)
def pyds_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter pushdown INTO a Python data source: the reader's pushFilters
    accepts `bucket = 3`, so non-matching rows are never generated (for a
    network transport: never transferred) — the DSv2 pushdown contract from
    pure Python. Requires spark.sql.python.filterPushdown.enabled — set
    here in-function (runtime-settable) so a vanilla driver session plans
    the reader without session.py's confs."""
    from hdc_dataengineering_sqlsync_spark.sources.pydatasource import register

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register(spark)
    df = spark.read.format("synthetic_events").option("rows", 10000).option("partitions", 8).load()
    return df.where(F.col("bucket") == 3).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


@query(
    "scan_schema_merge",
    "2.1 scans",
    """
    SELECT count(*) AS n,
           count(CASE WHEN p_partkey % 2 = 1 THEN 1 END) AS n_with_size,
           round(sum(p_retailprice), 2) AS total_price
    FROM part
    """,
)
def scan_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet batches of the same logical table,
    the newer one carrying an extra column (p_size), unified by
    ``mergeSchema`` — old rows surface NULL for the new column, the count of
    non-null p_size equals the new-batch row count. This is the schema-drift
    posture for a long-lived 100 TB table: additive columns need no rewrite
    of historical files, and the footer-only schema merge costs one metadata
    pass, not a data scan."""
    p = load(spark, sf_dir, "part")
    out = _rt_base(sf_dir) / "part_evolving"
    old_batch = p.where(F.col("p_partkey") % 2 == 0).select("p_partkey", "p_retailprice")
    new_batch = p.where(F.col("p_partkey") % 2 == 1).select("p_partkey", "p_retailprice", "p_size")
    old_batch.write.mode("overwrite").parquet(str(out / "batch=1"))
    new_batch.write.mode("overwrite").parquet(str(out / "batch=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(str(out))
    return merged.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("p_size").alias("n_with_size"),
        F.round(F.sum("p_retailprice"), 2).alias("total_price"),
    )


_CORRUPT_ORACLE = """
SELECT count(*) AS n_lines,
       CAST(sum(CASE WHEN n_nationkey % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(sum(CASE WHEN n_nationkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt
FROM nation
"""


@query("json_corrupt_records", "2.1 scans", _CORRUPT_ORACLE)
def json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE malformed-input handling: a staged JSON file where every
    5th nation row is truncated garbage. The schema'd read routes broken
    lines into _corrupt_record instead of failing the job — the ingestion
    posture for a 100 TB raw feed where one bad line must not kill a
    multi-hour job. The oracle pins exactly how many lines must land on
    each side of the valid/corrupt split."""
    out = str(_rt_base(sf_dir) / "nation_corrupt_json")
    n = load(spark, sf_dir, "nation")
    line = F.when(
        F.col("n_nationkey") % 5 == 0, F.concat(F.lit('{"broken'), F.col("n_name"))
    ).otherwise(
        F.to_json(F.struct("n_nationkey", "n_name"))
    )
    n.select(line.alias("value")).write.mode("overwrite").text(out)
    back = spark.read.schema(
        "n_nationkey int, n_name string, _corrupt_record string"
    ).json(out)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count("n_name").alias("n_valid"),
        F.count("_corrupt_record").alias("n_corrupt"),
    )
