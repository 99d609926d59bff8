"""SURVEY.md §2.4 — aggregations.

All money/avg values rounded to 2, stats to 4 (convention 1). Oracle SQL
casts DuckDB's wider aggregate types down to Spark's output types
(convention 6): DuckDB ``sum(INTEGER)`` is HUGEINT -> ``cast(... as bigint)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                          AS sum_qty,
  round(sum(l_extendedprice), 2)                                     AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
  round(avg(l_quantity), 2)                                          AS avg_qty,
  round(avg(l_extendedprice), 2)                                     AS avg_price,
  round(avg(l_discount), 2)                                          AS avg_disc,
  count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("agg_pricing_summary", "2.4 aggregations", _Q1_ORACLE, bench=True)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the flagship query (also ``entry()``).

    Scan -> pushed filter -> project -> hash aggregate. Catalyst plans the
    partial (map-side) + final aggregate automatically; at 100 TB this is a
    single shuffle keyed on the 6 (flag, status) groups after near-total
    map-side reduction, so it scales with input size, not group count.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_global",
    "2.4 aggregations",
    """
    SELECT count(*) AS n,
           round(sum(l_extendedprice), 2) AS s,
           round(avg(l_extendedprice), 2) AS a,
           round(min(l_extendedprice), 2) AS mn,
           round(max(l_extendedprice), 2) AS mx
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("s"),
        F.round(F.avg("l_extendedprice"), 2).alias("a"),
        F.round(F.min("l_extendedprice"), 2).alias("mn"),
        F.round(F.max("l_extendedprice"), 2).alias("mx"),
    )


@query(
    "agg_count_distinct",
    "2.4 aggregations",
    """
    SELECT count(DISTINCT o_custkey) AS n_cust,
           count(DISTINCT o_orderpriority) AS n_prio
    FROM orders
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
    )


@query("agg_approx_distinct", "2.4 aggregations", None)  # rows-only: HLL sketches differ per engine
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the 100 TB path for cardinality (no
    shuffle of distinct values, fixed-size sketch per partition)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(F.approx_count_distinct("o_custkey", 0.02).alias("approx_n"))


_ROLLUP_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


@query("agg_rollup", "2.4 aggregations", _ROLLUP_ORACLE, bench=True)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


@query(
    "agg_cube",
    "2.4 aggregations",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


_GSETS_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       cast(grouping(o_orderstatus) AS INT) AS g_status,
       cast(grouping(o_orderpriority) AS INT) AS g_priority,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY status, priority
"""


@query("agg_grouping_sets", "2.4 aggregations", _GSETS_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL surface (EP3): the table is registered as a
    temp view and the query text goes through the same Catalyst pipeline."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               cast(grouping(o_orderstatus) AS INT) AS g_status,
               cast(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
        """
    )


@query(
    "agg_filtered",
    "2.4 aggregations",
    """
    SELECT c_nationkey,
           round(sum(CASE WHEN c_acctbal > 0 THEN c_acctbal END), 2) AS pos_bal,
           count(*) FILTER (WHERE c_acctbal < 0) AS n_neg,
           count(*) AS n
    FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.round(F.sum(F.when(F.col("c_acctbal") > 0, F.col("c_acctbal"))), 2).alias("pos_bal"),
            F.count(F.when(F.col("c_acctbal") < 0, F.lit(1))).alias("n_neg"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "agg_stats",
    "2.4 aggregations",
    """
    SELECT round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
    FROM lineitem
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
    )


@query(
    "agg_percentile",
    "2.4 aggregations",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 3) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 3) AS p90
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (sort-based); DuckDB quantile_cont uses
    the same linear interpolation.

    Snap-rounded at scale 3 and REPORTED at scale 3: the engines'
    interpolation formulas differ at ulp level ((1-g)a+gb vs a+g(b-a)),
    but interpolated values of 2-decimal prices TERMINATE at 3 decimals,
    so the true value is never on a scale-3 rounding boundary and both
    engines snap to the identical 3-decimal double. (The former extra
    round(·,2) re-rounded a value that CAN sit exactly on .xx5 — the
    cross-engine repr-tie class that turned dq_benford_firstdigit red in
    the r5 driver — so it was dropped in r6.)"""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 3).alias("p50"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 3).alias("p90"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_collect_sorted",
    "2.4 aggregations",
    """
    SELECT r_name, string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic array agg: collect_set -> sort_array -> array_join keeps
    raw arrays out of the t2 output (SURVEY §2 convention 3)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"))
        .orderBy("r_name")
    )


@query(
    "agg_min_max_by",
    "2.4 aggregations",
    """
    SELECT c_mktsegment, c_name AS top_name FROM (
      SELECT c_mktsegment, c_name,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
      FROM customer
    ) WHERE rn = 1 ORDER BY c_mktsegment
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax with unique tiebreak: max_by over struct(c_acctbal, c_custkey)
    orders lexicographically, so ties on acctbal resolve to the larger
    custkey — mirrored by the oracle's DESC,DESC window."""
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(F.max_by("c_name", F.struct("c_acctbal", "c_custkey")).alias("top_name"))
        .orderBy("c_mktsegment")
    )


@query(
    "agg_bitwise",
    "2.4 aggregations",
    """
    SELECT o_orderstatus,
           CAST(bit_and(o_orderkey % 256) AS BIGINT) AS band,
           CAST(bit_or(o_orderkey % 256) AS BIGINT) AS bor,
           CAST(bit_xor(o_orderkey % 256) AS BIGINT) AS bxor
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate functions (bit_and/or/xor) over a bounded domain —
    the flag-accumulation aggregates a sync engine uses for row-presence
    bitmaps."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 256
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bit_and(k).alias("band"),
            F.bit_or(k).alias("bor"),
            F.bit_xor(k).alias("bxor"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_bool",
    "2.4 aggregations",
    """
    SELECT o_orderstatus,
           bool_and(o_totalprice > 0) AS all_pos,
           bool_or(o_totalprice > 150000) AS any_large,
           count(*) FILTER (WHERE o_totalprice > 150000) AS n_large
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and/bool_or + filtered count) — the
    every/any invariant checks a sync validation pass runs per table."""
    o = load(spark, sf_dir, "orders")
    large = F.col("o_totalprice") > 150000
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 0).alias("all_pos"),
            F.bool_or(large).alias("any_large"),
            F.sum(F.when(large, 1).otherwise(0)).cast("long").alias("n_large"),
        )
        .orderBy("o_orderstatus")
    )


_HISTOGRAM_ORACLE = """
SELECT CAST(least(floor(o_totalprice / 25000), 19) AS INT) AS bucket,
       count(*) AS n,
       round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
FROM orders GROUP BY bucket ORDER BY bucket
"""


@query("agg_histogram", "2.4 aggregations", _HISTOGRAM_ORACLE)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value (25k buckets, top-capped at 19):
    a single map-side bucket expression + one hash agg — the profile query a
    sync validation or data-quality pass runs per column. Fixed literal
    edges, never a data-dependent discovery pass."""
    o = load(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 25000), F.lit(19)).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


_KEY_SKEW_ORACLE = """
WITH k AS (SELECT o_custkey AS key, count(*) AS cnt FROM orders GROUP BY o_custkey),
t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total, max(cnt) AS mx FROM k)
SELECT key, cnt, round(cnt / t.total, 6) AS share,
       round(cnt / (t.total / (SELECT count(*) FROM k)), 2) AS x_mean
FROM k CROSS JOIN t
ORDER BY cnt DESC, key LIMIT 10
"""


@query("diag_key_skew", "2.4 aggregations", _KEY_SKEW_ORACLE)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the 10 heaviest o_custkey values with their
    share of all rows and multiple-of-mean factor — the report that decides
    whether a join needs AQE skew-split or an explicit salt
    (operators/skew.py::salted_join). One keyed agg + a broadcast 1-row
    totals join + top-k."""
    o = load(spark, sf_dir, "orders")
    k = o.groupBy(F.col("o_custkey").alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    t = k.agg(
        F.sum("cnt").cast("double").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        k.crossJoin(F.broadcast(t))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
            F.round(F.col("cnt") / (F.col("total") / F.col("n_keys")), 2).alias("x_mean"),
        )
        .orderBy(F.col("cnt").desc(), "key")
        .limit(10)
    )


@query("agg_approx_percentile", "2.4 aggregations", None)  # rows-only: sketch engine-specific
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) of l_extendedprice
    per returnflag — the 100 TB companion to the exact agg_percentile (the
    sketch is mergeable and single-pass). Engine-specific estimates, so
    rows-only in t2; the error bound vs the exact percentile is
    unit-tested."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile_approx("l_extendedprice", 0.5, 1000), 2).alias("p50_approx"),
            F.round(F.percentile_approx("l_extendedprice", 0.9, 1000), 2).alias("p90_approx"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_mode",
    "2.4 aggregations",
    """
    WITH c AS (
      SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY cnt DESC, o_orderstatus DESC) AS rn
      FROM c
    )
    SELECT o_orderpriority, o_orderstatus AS mode_status, cnt
    FROM r WHERE rn = 1 ORDER BY o_orderpriority
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic modal value: most frequent order status per priority,
    ties broken toward the lexicographically greatest status (Spark's builtin
    mode() is tie-nondeterministic, so the mode is computed as max_by over a
    (count, value) struct — two hash aggregates, the second over the tiny
    (priority x status) domain; the oracle expresses the same pick as a
    ranked window)."""
    o = load(spark, sf_dir, "orders")
    c = o.groupBy("o_orderpriority", "o_orderstatus").agg(F.count(F.lit(1)).alias("cnt"))
    m = c.groupBy("o_orderpriority").agg(
        F.expr("max_by(struct(o_orderstatus, cnt), struct(cnt, o_orderstatus))").alias("m")
    )
    return (
        m.select(
            "o_orderpriority",
            F.col("m.o_orderstatus").alias("mode_status"),
            F.col("m.cnt").alias("cnt"),
        )
        .orderBy("o_orderpriority")
    )
