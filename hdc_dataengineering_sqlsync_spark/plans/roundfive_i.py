"""SURVEY.md §2 round-5 additions, batch R.

Built-in bitmap exact-distinct aggregates, lateral column aliases, and
DDL DEFAULT columns. Registered after
``roundfive_h`` (plans/__init__.py) so the qids append to the END of the
never-checked rotation segment.
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

# ------------- 2.4 aggregations: built-in bitmap exact-distinct family

_BITMAP_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_cust,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("agg_bitmap_builtin", "2.4 aggregations", _BITMAP_ORACLE)
def agg_bitmap_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting via the built-in bitmap_* aggregate family.

    The engine-native form of `agg_exact_distinct_bitmap`'s hand-rolled
    bitmaps: keys bucket by `bitmap_bucket_number` (32768-bit buckets),
    each (group, bucket) folds to ONE fixed-size binary bitmap via
    `bitmap_construct_agg(bitmap_bit_position(key))`, and the group's
    exact distinct count is the SUM of per-bucket `bitmap_count`s. This
    is how exact COUNT(DISTINCT) scales when the re-aggregation state
    must stay bounded: a bucket's state is 4KB regardless of how many
    keys hit it, partial bitmaps OR together associatively (map-side
    combine, incremental view maintenance, cross-partition merge), and
    the expand-shuffle of a naive two-phase distinct never happens.

    Scale shape: one (group, bucket)-keyed aggregate with fixed-size
    state, then a tiny keyed sum. The oracle is plain COUNT(DISTINCT) —
    proving the bitmap algebra is exactly distinct-count."""
    o = load(spark, sf_dir, "orders")
    per_bucket = o.groupBy(
        "o_orderpriority",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_bucket.groupBy("o_orderpriority")
        .agg(
            F.expr("sum(bitmap_count(bm))").alias("n_distinct_cust"),
            F.sum("n").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# ------------- 2.2 projection/filter: lateral column aliases

_LATERAL_ALIAS_ORACLE = """
WITH t AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) // 5000000 AS tier,
         (CAST(round(o_totalprice * 100, 0) AS BIGINT) // 5000000) * 5000000
           AS tier_floor_cents
  FROM orders
)
SELECT CAST(tier AS BIGINT) AS tier,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents - tier_floor_cents) AS BIGINT) AS above_floor_cents
FROM t GROUP BY tier ORDER BY tier
"""


@query("sql_lateral_column_alias", "2.2 projection/filter", _LATERAL_ALIAS_ORACLE)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases: a SELECT item referencing an EARLIER alias.

    The Spark 3.4+ surface that removes the subquery-per-derivation
    idiom: `cents` defines once, `tier` derives from `cents`, and
    `tier_floor_cents` derives from `tier` — no nested SELECT. The
    resolver lowers the chain to LAYERED projections, so each alias is
    evaluated exactly once and reused — strictly better than the
    hand-expanded single SELECT, whose optimized plan inlines the
    round()/cast chain into every derived column (3x evaluation;
    plan-asserted in the unit test). DuckDB supports the same
    referencing rule, so the oracle is nearly the same text.

    Scale shape: one map-side projection + one keyed aggregate; nothing
    about the lateral sugar changes the physical plan."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH t AS (
          SELECT cast(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
                 cents div 5000000 AS tier,
                 tier * 5000000 AS tier_floor_cents
          FROM orders
        )
        SELECT tier,
               count(*) AS n,
               sum(cents - tier_floor_cents) AS above_floor_cents
        FROM t GROUP BY tier ORDER BY tier
        """
    )


# ---------------- 2.8 sync core: DDL DEFAULT column surface

_DEFAULTS_ORACLE = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 'open',   CAST(3 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(2 AS BIGINT), 'closed', CAST(3 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(3 AS BIGINT), 'open',   CAST(7 AS BIGINT), CAST(1 AS BIGINT))
) AS t(id, status, prio, n)
ORDER BY id
"""


@query("sql_default_columns", "2.8 sync core", _DEFAULTS_ORACLE)
def sql_default_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL DEFAULT columns: schema-level defaults filling partial writes.

    A sync target's schema evolves ahead of its sources: new columns
    need values for rows whose upstream doesn't send them. Column
    DEFAULTs move that policy into the TARGET SCHEMA — a partial-column
    INSERT takes the declared default, and the explicit `DEFAULT`
    keyword requests it by name — instead of every producer hardcoding
    fallback literals (which drift). The three inserts cover: all
    defaults, explicit override + DEFAULT keyword, and partial column
    list with an override.

    Scale shape: defaults resolve at WRITE ANALYSIS time to literals in
    the insert projection — zero read-path cost; existing files are
    untouched (contrast backfilling a new column by rewrite)."""
    tag = hashlib.md5(f"defaults:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:8]
    tbl = f"hdc_defaults_{tag}"
    loc = os.path.join(tempfile.gettempdir(), tbl)
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    try:
        spark.sql(
            f"""CREATE TABLE {tbl} (
                  id BIGINT,
                  status STRING DEFAULT 'open',
                  prio BIGINT DEFAULT 3
                ) USING parquet LOCATION '{loc}'"""
        )
        spark.sql(f"INSERT INTO {tbl} (id) VALUES (1)")
        spark.sql(f"INSERT INTO {tbl} VALUES (2, 'closed', DEFAULT)")
        spark.sql(f"INSERT INTO {tbl} (id, prio) VALUES (3, 7)")
        out = spark.sql(
            f"""SELECT id, status, prio, count(*) AS n
                FROM {tbl} GROUP BY id, status, prio ORDER BY id"""
        )
        out.collect()  # materialize before the table location is removed
        return out.localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(loc, ignore_errors=True)
