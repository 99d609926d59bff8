"""SURVEY.md §2 round-9 batch AR: inverse percentile, gzip CSV
round-trip, mix-vs-rate decomposition.

  agg_inverse_percentile   where given values fall in the distribution
  scan_csv_gzip_roundtrip  compressed-codec write/read path
  wl_mix_rate_decomposition  rate change split into mix + within effects

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.4 aggregations: inverse percentile (rank of a given value)

_PROBES = [5000000, 15000000, 25000000, 35000000, 45000000]  # cents

_INVPCT_ORACLE = f"""
WITH vals AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v FROM orders
),
probes(p) AS (VALUES {", ".join(f"({p})" for p in _PROBES)}),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals)
SELECT CAST(probes.p AS BIGINT) AS probe_cents,
       CAST(SUM(CASE WHEN vals.v <= probes.p THEN 1 ELSE 0 END) AS BIGINT)
         AS n_at_or_below,
       CAST(SUM(CASE WHEN vals.v <= probes.p THEN 1 ELSE 0 END) * 10000
            // max(tot.n) AS BIGINT) AS pct_bps
FROM probes CROSS JOIN vals CROSS JOIN tot
GROUP BY probes.p ORDER BY probe_cents
"""


@query("agg_inverse_percentile", "2.4 aggregations", _INVPCT_ORACLE)
def agg_inverse_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse percentile — 'where does $X fall?': the empirical CDF
    read AT given probe values (the partner of agg_percentile_disc,
    which reads values at given ranks) — how pricing teams place a
    proposed price and SREs place an SLO against the observed
    distribution. Exact bps by integer threshold counts; the probe list
    is a broadcast VALUES relation so all five reads cost ONE fact
    pass.

    Scale shape: probes broadcast-cross the fact once; the conditional
    counts fold map-side to 5 rows (at width, a range-join against
    sorted probe bounds — same cost class)."""
    vals = load(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("v")
    )
    probes = spark.createDataFrame([(p,) for p in _PROBES], "p long")
    tot = vals.agg(F.count(F.lit(1)).alias("n"))
    return (
        vals.crossJoin(F.broadcast(probes))
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("p").alias("probe_cents"))
        .agg(
            F.sum(
                F.when(F.col("v") <= F.col("p"), 1).otherwise(0)
            ).alias("n_at_or_below"),
            F.expr(
                "SUM(CASE WHEN v <= p THEN 1 ELSE 0 END) * 10000"
                " DIV max(n)"
            ).alias("pct_bps"),
        )
        .orderBy("probe_cents")
    )


# ------ 2.1 scans: gzip-compressed CSV write + transparent re-read

_GZIP_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey
FROM nation ORDER BY n_nationkey
"""


@query("scan_csv_gzip_roundtrip", "2.1 scans", _GZIP_ORACLE)
def scan_csv_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-codec round-trip — CSV written with the gzip codec and
    re-read transparently (extension-based codec inference): the
    interchange path every compressed-feed ingestion exercises. The
    re-read must be lossless against the source (the oracle reads the
    original table), proving the codec layer never touches values —
    and that the reader handles the non-splittable gzip container (one
    task per .gz file; the write keeps files small for exactly that
    reason, documented).

    Scale shape: nation is dim-sized; at scale, gzip's
    non-splittability is the lesson — per-file parallelism only, which
    is why columnar+splittable wins for big feeds (the qid documents
    the trade, the roundtrip proves correctness)."""
    import tempfile
    import uuid

    path = tempfile.mkdtemp(prefix=f"csv_gz_{uuid.uuid4().hex[:8]}_")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    n.write.mode("overwrite").option("header", True).option(
        "compression", "gzip"
    ).csv(path)
    back = (
        spark.read.option("header", True)
        .schema("n_nationkey long, n_name string, n_regionkey long")
        .csv(path)
    )
    return back.orderBy("n_nationkey")


# ------ 2.12 composite: mix-vs-rate decomposition of a rate change

_MIXRATE_ORACLE = """
WITH cells AS (
  SELECT c.c_mktsegment AS segment, year(l.l_shipdate) AS yr,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS r
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE year(l.l_shipdate) IN (1996, 1997)
  GROUP BY 1, 2
),
tot AS (
  SELECT yr, CAST(SUM(n) AS BIGINT) AS nt FROM cells GROUP BY yr
),
enriched AS (
  SELECT c.segment, c.yr, c.n, c.r, t.nt,
         CAST(c.n AS HUGEINT) * 1000000 // t.nt AS share_e6,
         CAST(c.r AS HUGEINT) * 1000000 // c.n AS rate_e6
  FROM cells c JOIN tot t ON t.yr = c.yr
),
wide AS (
  SELECT segment,
         max(CASE WHEN yr = 1996 THEN share_e6 END) AS s0,
         max(CASE WHEN yr = 1997 THEN share_e6 END) AS s1,
         max(CASE WHEN yr = 1996 THEN rate_e6 END) AS r0,
         max(CASE WHEN yr = 1997 THEN rate_e6 END) AS r1
  FROM enriched GROUP BY segment
)
SELECT segment,
       CAST(s0 AS BIGINT) AS share_1996_e6,
       CAST(s1 AS BIGINT) AS share_1997_e6,
       CAST(r0 AS BIGINT) AS rate_1996_e6,
       CAST(r1 AS BIGINT) AS rate_1997_e6,
       CAST((s1 - s0) * r0 // 1000000 AS BIGINT) AS mix_effect_e6,
       CAST(s1 * (r1 - r0) // 1000000 AS BIGINT) AS rate_effect_e6
FROM wide ORDER BY segment
"""


@query(
    "wl_mix_rate_decomposition", "2.12 composite workloads", _MIXRATE_ORACLE
)
def wl_mix_rate_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-vs-rate decomposition — the BI explainability classic ('did
    the return rate rise because segments got worse, or because the mix
    shifted toward worse segments?'): per segment, the year-over-year
    rate change splits into a MIX effect (share shift × old rate) and a
    RATE effect (new share × rate change) — the standard sequential
    decomposition whose terms sum exactly to each segment's
    contribution to the total change. Shares and rates quantize to the
    e6 grid first; each effect closes with one integral division, so
    the decomposition reconciles bit-for-bit.

    Scale shape: (segment, year) cells reduce map-side over the star
    join; totals broadcast; the pivot and effects run on 5 rows."""
    li = load(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(1996, 1997)
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("l_shipdate").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("r"),
        )
    )
    tot = cells.groupBy("yr").agg(F.sum("n").alias("nt"))
    enriched = cells.join(tot, "yr").select(
        "segment",
        "yr",
        F.expr(
            "CAST(CAST(n AS DECIMAL(38,0)) * 1000000 DIV nt AS BIGINT)"
        ).alias("share_e6"),
        F.expr(
            "CAST(CAST(r AS DECIMAL(38,0)) * 1000000 DIV n AS BIGINT)"
        ).alias("rate_e6"),
    )
    wide = enriched.groupBy("segment").agg(
        F.max(F.when(F.col("yr") == 1996, F.col("share_e6"))).alias("s0"),
        F.max(F.when(F.col("yr") == 1997, F.col("share_e6"))).alias("s1"),
        F.max(F.when(F.col("yr") == 1996, F.col("rate_e6"))).alias("r0"),
        F.max(F.when(F.col("yr") == 1997, F.col("rate_e6"))).alias("r1"),
    )
    return wide.select(
        "segment",
        F.col("s0").alias("share_1996_e6"),
        F.col("s1").alias("share_1997_e6"),
        F.col("r0").alias("rate_1996_e6"),
        F.col("r1").alias("rate_1997_e6"),
        F.expr("(s1 - s0) * r0 DIV 1000000").alias("mix_effect_e6"),
        F.expr("s1 * (r1 - r0) DIV 1000000").alias("rate_effect_e6"),
    ).orderBy("segment")
