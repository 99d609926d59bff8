"""SURVEY.md §2 round-5 additions.

Opens with the r4 verdict's #5: DSv2 aggregate pushdown into a live JDBC
source (`jdbc_agg_pushdown`) — the next transport pushdown a real sync
user hits after the filter pushdown already declared in plans/sync.py.

Registered LAST (plans/__init__.py) so the qids append to the
END of the never-checked rotation segment: the round-5 driver window (50 of
the 81 r4-era unchecked qids, plus this round's stale re-checks) is
unchanged, and these enter the window once that backlog drains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------------------------------------- 2.8 sync: JDBC agg pushdown

_JDBC_AGG_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders WHERE o_orderkey % 10 = 0
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("jdbc_agg_pushdown", "2.8 sync", _JDBC_AGG_ORACLE)
def jdbc_agg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSv2 AGGREGATE pushdown into a live JDBC source: the GROUP BY plus
    COUNT/SUM/MIN/MAX run INSIDE the database (embedded Derby via
    JDBCTableCatalog with ``pushDownAggregate``), so only the ~5 grouped
    rows cross the wire — the v1 ``spark.read.jdbc`` path used by
    `jdbc_filter_pushdown` can push only WHERE clauses and columns. For the
    reference's transport domain this is the decisive extract shape: a 100
    TB-side rollup ships grouped rows, not the table. The scan is
    single-partition, so Spark plans a COMPLETE pushdown (no Spark-side
    HashAggregate at all — the physical plan is Project-over-JDBC-scan with
    ``PushedAggregates``/``PushedGroupByExpressions``, plan-asserted in
    tests). Money is staged as exact int64 cents so the pushed SUM is
    order-free and engine-identical (Derby SUM(BIGINT) -> BIGINT); MIN/MAX
    of 2dp doubles are exact, and no double SUM crosses engines. Limit
    pushdown (``pushDownLimit``) was probed and is NOT supported by the
    Derby dialect (no PushedLimit in the plan) — documented, not declared.
    """
    from hdc_dataengineering_sqlsync_spark.plans.sync import _DERBY_DRIVER, _derby_url
    from hdc_dataengineering_sqlsync_spark.sources.jdbc import JdbcTable, write_jdbc

    url = _derby_url(sf_dir, "aggpush")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    staged = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            cents.alias("cents"),
            "o_totalprice",
        )
    )
    t = JdbcTable(
        url,
        "orders_agg",
        ("o_orderkey",),
        {
            **_DERBY_DRIVER,
            # Derby cannot group/compare CLOB (Spark's default Derby mapping
            # for StringType) — force a comparable VARCHAR
            "createTableColumnTypes": "o_orderpriority VARCHAR(20)",
        },
    )
    write_jdbc(staged, t, mode="overwrite")

    # JDBCTableCatalog is the v2 path that can take aggregates; catalog
    # name is keyed like the database dir (per sf_dir + process) because
    # Spark caches catalog instances by name after first use — a shared
    # name would pin the FIRST url for the session's lifetime
    cat = "derby_" + url.rsplit("hdc_derby_aggpush_", 1)[-1].split(";", 1)[0]
    spark.conf.set(
        f"spark.sql.catalog.{cat}",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
    )
    spark.conf.set(f"spark.sql.catalog.{cat}.url", url)
    spark.conf.set(f"spark.sql.catalog.{cat}.driver", _DERBY_DRIVER["driver"])
    spark.conf.set(f"spark.sql.catalog.{cat}.pushDownAggregate", "true")

    back = spark.table(f"{cat}.ORDERS_AGG")
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total_cents"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("o_orderpriority")
    )
