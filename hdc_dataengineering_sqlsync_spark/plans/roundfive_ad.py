"""SURVEY.md §2 round-5 additions, batch MM.

Modern SQL dialect surface (GROUP BY ALL / ORDER BY ALL — probed: both
engines support both clauses with identical semantics) and the
width_bucket equi-width binning builtin (Spark-only builtin; the oracle
derives the identical buckets from integer arithmetic). Registered after
``roundfive_ac`` (plans/__init__.py) so the qids append to the END of
the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import register_views

_GBA_SQL = """
SELECT year(o_orderdate) AS yr,
       o_orderpriority AS prio,
       COUNT(*) AS n_orders,
       SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY ALL
ORDER BY yr, prio
"""

_GBA_ORACLE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       o_orderpriority AS prio,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY ALL
ORDER BY yr, prio
"""


@query("sql_group_by_all", "2.4 aggregations", _GBA_ORACLE)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL: grouping keys inferred from the non-aggregate SELECT list.

    The analyst-ergonomics clause (DuckDB-originated, Spark 3.4+): every
    SELECT item that contains no aggregate becomes a grouping key, so
    adding a dimension to the report never desyncs the GROUP BY. The
    SAME clause text runs on both engines — this qid pins that the two
    dialects infer the SAME key set (yr, prio) from the same projection.

    Scale shape: sugar only — Catalyst expands it to the ordinary keyed
    aggregate (partial/final hash agg, map-side combine); nothing about
    the physical plan differs from an explicit GROUP BY."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_GBA_SQL)


_OBA_SQL = """
SELECT n_regionkey AS region, substring(n_name, 1, 1) AS initial, n_name AS nation
FROM nation
ORDER BY ALL
"""


@query(
    "sql_order_by_all",
    "2.6 sorts/sets",
    "SELECT CAST(n_regionkey AS INTEGER) AS region,"
    " substring(n_name, 1, 1) AS initial, n_name AS nation"
    " FROM nation ORDER BY ALL",
)
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ALL: total ordering over every output column, left to right.

    The deterministic-output shorthand: ORDER BY ALL sorts by each
    SELECT item in projection order, so any query gains a stable total
    order without enumerating columns — exactly what a sync/export job
    wants before writing a diffable file. Both engines bind ALL to the
    same left-to-right column list (probed; this qid pins it).

    Scale shape: an ordinary global sort — range-partitioned sample
    sort in Spark; for the export use case it replaces a hand-written
    ORDER BY over every column, nothing more."""
    register_views(spark, sf_dir, ("nation",))
    return spark.sql(_OBA_SQL)


# width_bucket(v, lo, hi, n): equi-width histogram bucket. Spark has the
# SQL-standard builtin; DuckDB does not, so the oracle derives the same
# bucket from pure integer arithmetic — for integer v and integer bounds
# with (hi-lo) divisible by n, bucket = (v-lo) // width + 1 clamped to
# 0 / n+1 for out-of-range. The probe row census pins the boundary
# semantics (v < lo -> 0, v = hi -> n+1) that differ across databases.
_WB_ORACLE = """
WITH b AS (
  SELECT CASE WHEN l_quantity < 1 THEN 0
              WHEN l_quantity >= 51 THEN 11
              ELSE CAST((CAST(l_quantity AS BIGINT) - 1) // 5 AS BIGINT) + 1
         END AS bucket
  FROM lineitem
),
edge AS (
  SELECT * FROM (VALUES
    ('below_lo', CAST(0 AS BIGINT)),
    ('at_lo',    CAST(1 AS BIGINT)),
    ('at_hi',    CAST(11 AS BIGINT)),
    ('above_hi', CAST(11 AS BIGINT))
  ) AS t(probe, bucket)
)
SELECT 'qty_' || lpad(CAST(bucket AS VARCHAR), 2, '0') AS label,
       COUNT(*) AS n
FROM b GROUP BY 1
UNION ALL
SELECT 'edge_' || probe AS label, bucket AS n FROM edge
ORDER BY label
"""


@query("fn_width_bucket", "2.7 scalar functions", _WB_ORACLE)
def fn_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """width_bucket equi-width binning: histogram census + boundary probes.

    The SQL-standard binning builtin (Spark 3.5+): bucket i covers
    [lo + (i-1)*w, lo + i*w) with w = (hi-lo)/n, under-range maps to 0
    and over-range to n+1. DuckDB lacks the function, so the oracle
    reconstructs the identical bucket with integer floor division —
    possible exactly because bounds (1, 51, 10 buckets) make the width
    an exact integer 5. Four literal edge probes (below lo, at lo, at
    hi, above hi) pin the boundary convention, the part of this builtin
    that actually varies across engines.

    Scale shape: a pure map-side expression + one small keyed count —
    the cheapest possible histogram; at 100 TB it is exactly the
    equi-width pass a profiler runs before choosing richer sketches."""
    from hdc_dataengineering_sqlsync_spark.registry import load

    b = load(spark, sf_dir, "lineitem").select(
        F.expr("width_bucket(l_quantity, 1, 51, 10)").alias("bucket")
    )
    hist = (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat(F.lit("qty_"), F.lpad(F.col("bucket").cast("string"), 2, "0"))
            .alias("label"),
            "n",
        )
    )
    edges = spark.sql(
        "SELECT 'edge_' || probe AS label, width_bucket(v, 1, 51, 10) AS n"
        " FROM VALUES ('below_lo', 0), ('at_lo', 1), ('at_hi', 51),"
        " ('above_hi', 99) AS t(probe, v)"
    )
    return hist.unionByName(edges).orderBy("label")
