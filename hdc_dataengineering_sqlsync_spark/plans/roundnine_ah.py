"""SURVEY.md §2 round-9 batch AH: nation trade-intensity matrix, price
dispersion on identical goods, Fano-factor burstiness.

  wl_trade_intensity_matrix  customer-nation × supplier-nation flows
  wl_price_dispersion        law-of-one-price violations per part
  ts_fano_factor             var/mean of daily counts, exact e4

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.12 composite: trade-intensity matrix + intra-region share

_TRADE_ORACLE = """
WITH flows AS (
  SELECT nc.n_name AS cust_nation, ns.n_name AS supp_nation,
         nc.n_regionkey = ns.n_regionkey AS intra,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
              AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  WHERE year(l.l_shipdate) = 1996
),
cells AS (
  SELECT cust_nation, supp_nation, intra,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(SUM(cents) AS BIGINT) AS flow_cents
  FROM flows GROUP BY 1, 2, 3
),
marked AS (
  SELECT cust_nation, supp_nation, intra, flow_cents,
         max(flow_cents) OVER (PARTITION BY cust_nation) AS mx
  FROM cells
)
SELECT cust_nation,
       CAST(count(*) AS BIGINT) AS n_partners,
       CAST(SUM(flow_cents) AS BIGINT) AS import_cents,
       CAST(SUM(CASE WHEN intra THEN flow_cents ELSE 0 END) AS BIGINT)
         AS intra_region_cents,
       CAST(SUM(CASE WHEN intra THEN flow_cents ELSE 0 END) * 10000
            // SUM(flow_cents) AS BIGINT) AS intra_share_bps,
       min(CASE WHEN flow_cents = mx THEN supp_nation END) AS top_partner
FROM marked GROUP BY cust_nation ORDER BY cust_nation
"""


@query("wl_trade_intensity_matrix", "2.12 composite workloads", _TRADE_ORACLE)
def wl_trade_intensity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade-intensity matrix — the gravity-model input table trade
    economists start from: customer-nation × supplier-nation value
    flows, rolled per importing nation with the intra-region share (the
    regionalization-vs-globalization gauge) in exact integer bps and
    the top partner by exact flow (deterministic argmax: the leader is
    the max flow, ties broken by the MIN partner name — plain window
    max + conditional min, since DuckDB's max_by takes no struct key).

    Scale shape: the 5-way star join broadcasts every dim (nation twice
    under different roles); the flow matrix reduces map-side to ≤625
    cells and everything after runs on cells."""
    li = load(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1996)
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nc = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nck"),
        F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("crk"),
    )
    ns = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nsk"),
        F.col("n_name").alias("supp_nation"),
        F.col("n_regionkey").alias("srk"),
    )
    flows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == nc.nck)
        .join(F.broadcast(ns), F.col("s_nationkey") == ns.nsk)
        .select(
            "cust_nation",
            "supp_nation",
            (F.col("crk") == F.col("srk")).alias("intra"),
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + 0.5
            )
            .cast("long")
            .alias("cents"),
        )
    )
    cells = flows.groupBy("cust_nation", "supp_nation", "intra").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("cents").alias("flow_cents"),
    )
    from pyspark.sql import Window

    marked = cells.withColumn(
        "mx", F.max("flow_cents").over(Window.partitionBy("cust_nation"))
    )
    return (
        marked.groupBy("cust_nation")
        .agg(
            F.count(F.lit(1)).alias("n_partners"),
            F.sum("flow_cents").alias("import_cents"),
            F.sum(
                F.when(F.col("intra"), F.col("flow_cents")).otherwise(0)
            ).alias("intra_region_cents"),
            F.expr(
                "SUM(CASE WHEN intra THEN flow_cents ELSE 0 END) * 10000"
                " DIV SUM(flow_cents)"
            ).alias("intra_share_bps"),
            F.min(
                F.when(
                    F.col("flow_cents") == F.col("mx"), F.col("supp_nation")
                )
            ).alias("top_partner"),
        )
        .orderBy("cust_nation")
    )


# ------ 2.12 composite: price dispersion on identical goods

_DISPERSION_ORACLE = """
WITH unit AS (
  SELECT l_partkey AS pk,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 10
           // CAST(round(l_quantity) AS BIGINT) AS unit_milli
  FROM lineitem
  WHERE year(l_shipdate) = 1996 AND l_quantity >= 1
),
per_part AS (
  SELECT pk, CAST(count(*) AS BIGINT) AS n,
         CAST(min(unit_milli) AS BIGINT) AS lo,
         CAST(max(unit_milli) AS BIGINT) AS hi
  FROM unit GROUP BY pk HAVING count(*) >= 3
),
scored AS (
  SELECT pk, n, lo, hi,
         (hi - lo) * 10000 // lo AS spread_bps
  FROM per_part WHERE lo > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN spread_bps = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_one_price,
       CAST(SUM(CASE WHEN spread_bps > 2000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dispersed_20pct,
       CAST(max(spread_bps) AS BIGINT) AS max_spread_bps,
       CAST(min(CASE WHEN spread_bps = (SELECT max(spread_bps) FROM scored)
                     THEN pk END) AS BIGINT) AS worst_part
FROM scored
"""


@query("wl_price_dispersion", "2.12 composite workloads", _DISPERSION_ORACLE)
def wl_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Law-of-one-price audit — dispersion of the UNIT price paid for
    the IDENTICAL part within one year: unit prices quantize to integer
    milli-cents by integral division (the wl_price_index_family
    device — the quantization is part of the metric's definition), the
    per-part spread (max−min over min) closes in exact bps, and the
    census counts one-price parts, >20%-dispersed parts, and the worst
    offender (deterministic min-key tie-break). Price-discrimination
    and data-error screening in one pass.

    Scale shape: unit prices are map-side scalar work; ONE partkey-keyed
    min/max census (map-combinable); the final census is a scalar fold
    plus a 1-row argmax re-join expressed as a scalar subquery."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.year("l_shipdate") == 1996) & (F.col("l_quantity") >= 1)
    )
    unit = li.select(
        F.col("l_partkey").alias("pk"),
        F.expr(
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 10"
            " DIV CAST(round(l_quantity) AS BIGINT)"
        ).alias("unit_milli"),
    )
    per_part = (
        unit.groupBy("pk")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("unit_milli").alias("lo"),
            F.max("unit_milli").alias("hi"),
        )
        .where(F.col("n") >= 3)
    )
    scored = per_part.where(F.col("lo") > 0).select(
        "pk", F.expr("(hi - lo) * 10000 DIV lo").alias("spread_bps")
    )
    mx = scored.agg(F.max("spread_bps").alias("mx"))
    return (
        scored.crossJoin(F.broadcast(mx))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(
                F.when(F.col("spread_bps") == 0, 1).otherwise(0)
            ).alias("n_one_price"),
            F.sum(
                F.when(F.col("spread_bps") > 2000, 1).otherwise(0)
            ).alias("n_dispersed_20pct"),
            F.max("spread_bps").alias("max_spread_bps"),
            F.min(
                F.when(F.col("spread_bps") == F.col("mx"), F.col("pk"))
            ).alias("worst_part"),
        )
    )


# ------ 2.10 time series: Fano factor (burstiness) of daily counts

_FANO_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
mom AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM daily GROUP BY event_type
)
SELECT event_type, n, s AS total_events,
       CAST((n * sxx - CAST(s AS HUGEINT) * s) * 10000
            // (CAST(n AS HUGEINT) * s) AS BIGINT) AS fano_e4
FROM mom WHERE s > 0 ORDER BY event_type
"""


@query("ts_fano_factor", "2.10 streaming/time series", _FANO_ORACLE)
def ts_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor — variance over mean of the DAILY event count per
    type: the burstiness gauge capacity planning reads (1 = Poisson
    traffic, >1 bursty/overdispersed — provision for spikes, <1
    regular — provision for the mean). Entirely integral: F =
    (n·Σx²−S²)/(n·S) closes with ONE wide-integer division onto the e4
    grid; no variance, no float, no mean is ever materialized.

    Scale shape: the day census reduces map-side; the 3-moment fold per
    type is map-combinable; a handful of output rows."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    xd = F.col("x").cast("decimal(38,0)")
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(xd * xd).alias("sxx"),
    )
    return (
        mom.where(F.col("s") > 0)
        .select(
            "event_type",
            "n",
            F.col("s").alias("total_events"),
            F.expr(
                "CAST((n * sxx - CAST(s AS DECIMAL(38,0)) * s) * 10000"
                " DIV (CAST(n AS DECIMAL(38,0)) * s) AS BIGINT)"
            ).alias("fano_e4"),
        )
        .orderBy("event_type")
    )
