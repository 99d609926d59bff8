"""SURVEY.md §2 round-7 batch B: seasonal indices, link-prediction RA,
mutual-kNN graph construction, watermark-lag audit.

  ts_seasonal_index_monthly  calendar-month seasonal index in integer bps
  graph_resource_allocation  Resource-Allocation link-prediction index
  simsearch_mutual_knn       label-blocked mutual-kNN edge census
  sync_watermark_lag_report  per-stream-key watermark lag vs global max

All derived ratios/weights are exact integers (floor / half-up integer
division) so no cross-engine float can flap a value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# -------------------- 2.10 streaming/timeseries: monthly seasonal index

_SEASONAL_ORACLE = """
WITH o AS (
  SELECT CAST(extract(month FROM o_orderdate) AS INT) AS month,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '2001-01-01'
),
m AS (
  SELECT month, count(*) AS n_orders, sum(cents) AS revenue_cents
  FROM o GROUP BY month
),
t AS (SELECT sum(revenue_cents) AS total FROM m)
SELECT month,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(revenue_cents AS BIGINT) AS revenue_cents,
       CAST((revenue_cents * 12 * 20000 + t.total) // (2 * t.total) AS BIGINT)
         AS seasonal_idx_bps
FROM m, t ORDER BY month
"""


@query("ts_seasonal_index_monthly", "2.10 streaming", _SEASONAL_ORACLE)
def ts_seasonal_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month seasonal index over six FULL order years (1995-2000 —
    partial years would bias their months): index = month revenue vs the
    1/12-of-total flat line, in half-up integer bps (10000 = exactly
    average; the ratio-to-overall-mean method). Money reduces to exact
    int64 cents first, so the index arithmetic is pure integers.

    Scale shape: ONE map-side-combinable (month) aggregate over the pruned
    scan (filter + 2-column projection reach parquet), then 12-row index
    math against a broadcast total — the same shape at any corpus size."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    m = (
        o.select(
            F.month("o_orderdate").alias("month"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("revenue_cents"))
    )
    t = m.agg(F.sum("revenue_cents").alias("total"))
    return (
        m.crossJoin(F.broadcast(t))
        .select(
            "month",
            "n_orders",
            "revenue_cents",
            F.expr(
                "cast((revenue_cents * 12 * 20000 + total) div (2 * total) as bigint)"
            ).alias("seasonal_idx_bps"),
        )
        .orderBy("month")
    )


# ------------------ 2.12 workloads: Resource-Allocation link prediction

_RA_ORACLE = """
WITH sc AS (
  SELECT DISTINCT l_suppkey AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
cdeg AS (SELECT c, count(*) AS d FROM sc GROUP BY c),
pairs AS (
  SELECT a.s AS s1, b.s AS s2,
         count(*) AS n_common,
         sum(CAST(1000000 // cdeg.d AS BIGINT)) AS ra_micro
  FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
  JOIN cdeg ON cdeg.c = a.c
  GROUP BY 1, 2
)
SELECT s1, s2, CAST(n_common AS BIGINT) AS n_common, ra_micro
FROM pairs ORDER BY ra_micro DESC, s1, s2 LIMIT 20
"""


@query("graph_resource_allocation", "2.12 composite workloads", _RA_ORACLE)
def graph_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link-prediction index (Zhou et al.) between
    suppliers sharing customers: RA(s1,s2) = Σ_z 1/deg(z) over common
    customers z — rare shared neighbors count MORE than popular hubs,
    which plain common-neighbor counting (graph_common_neighbors) can't
    express. Weights are floor(1e6/deg) exact integer micro-units (the
    integer twin of Adamic-Adar, whose ln(deg) would be a cross-engine
    libm hazard), summed as int64; top-20 with full tiebreak.

    Scale shape: incidence self-join ON CUSTOMER — fan-out bounded per
    customer by supplier count, never corpus-quadratic; the hub degrees
    that would blow the fan-out are exactly the ones RA down-weights, and
    a production run caps deg(z) (drop z with deg > D — its weight is
    < 1e6/D anyway), making the join skew-proof. Degrees come from one
    keyed count joined back on the customer key before grouping."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    sc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
        .localCheckpoint()
    )
    cdeg = sc.groupBy("c").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("c").alias("_dc"), "d"
    )
    a, b = sc.alias("a"), sc.alias("b")
    return (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .join(cdeg, F.col("a.c") == F.col("_dc"))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.expr("cast(1000000 div d as bigint)")).alias("ra_micro"),
        )
        .orderBy(F.col("ra_micro").desc(), "s1", "s2")
        .limit(20)
    )


# ---------------------- 2.9 llm-data: mutual-kNN graph construction

_MKNN_K = 3

_MKNN_ORACLE = f"""
WITH comp AS (
  SELECT a.label, a.vec_id AS ia, b.vec_id AS ib,
         round(
           sum(CAST(a.embedding[i.range] AS DOUBLE) * CAST(b.embedding[i.range] AS DOUBLE))
           / (sqrt(sum(CAST(a.embedding[i.range] AS DOUBLE) * CAST(a.embedding[i.range] AS DOUBLE)))
              * sqrt(sum(CAST(b.embedding[i.range] AS DOUBLE) * CAST(b.embedding[i.range] AS DOUBLE)))),
           4) AS c
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id <> b.vec_id
  CROSS JOIN range(1, 65) i
  GROUP BY a.label, a.vec_id, b.vec_id
),
knn AS (
  SELECT label, ia, ib FROM (
    SELECT label, ia, ib,
           row_number() OVER (PARTITION BY ia ORDER BY c DESC, ib) AS r
    FROM comp
  ) WHERE r <= {_MKNN_K}
),
mutual AS (
  SELECT k1.label, k1.ia AS a, k1.ib AS b
  FROM knn k1 JOIN knn k2 ON k1.ia = k2.ib AND k1.ib = k2.ia
  WHERE k1.ia < k1.ib
)
SELECT k.label,
       CAST(count(DISTINCT k.ia) AS BIGINT) AS n_vectors,
       CAST(count(*) AS BIGINT) AS n_directed,
       CAST((SELECT count(*) FROM mutual m WHERE m.label = k.label) AS BIGINT)
         AS n_mutual
FROM knn k GROUP BY k.label ORDER BY k.label
"""


@query("simsearch_mutual_knn", "2.9 llm-data", _MKNN_ORACLE, bench=True)
def simsearch_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN graph construction (label-blocked): directed top-3
    cosine edges per vector within its label block, then the MUTUAL edge
    set (a in b's top-k AND b in a's top-k) — the symmetrization step
    every kNN-graph clustering / graph-ANN index build runs, and the
    quality census (mutual/directed ratio) that flags hubness. Cosine
    rounds to 4dp with a vec_id tiebreak; census is exact integers.

    Scale shape: pair enumeration is blocked by label (the
    dedup_embedding_cosine argument — sum |block|², sharded across
    executors, never corpus-quadratic; IVF cells replace labels when no
    natural key exists); the top-k is a per-vector ranked window over the
    block-local pairs, and mutualization is a self-equi-join of two slim
    k·n edge lists on the reversed key."""
    from hdc_dataengineering_sqlsync_spark.functions.vectors import dot, l2_norm

    e = load(spark, sf_dir, "embeddings")
    xd = F.transform("embedding", lambda v: v.cast("double"))
    # norms hoist to ONE computation per vector BEFORE the pair join (the
    # naive per-pair cosine recomputes both norms |block| times each —
    # measured 14.4s -> ~5s at sf0.1); sqrt(sum(x*x)) is the same double
    # either way, so the 4dp-rounded cosine is unchanged.
    base = e.select("label", "vec_id", xd.alias("x")).withColumn("nrm", l2_norm("x"))
    a = base.select(
        "label", F.col("vec_id").alias("ia"), F.col("x").alias("xa"), F.col("nrm").alias("na")
    )
    b = base.select(
        F.col("label").alias("_lb"),
        F.col("vec_id").alias("ib"),
        F.col("x").alias("xb"),
        F.col("nrm").alias("nb"),
    )
    comp = (
        a.join(b, (F.col("label") == F.col("_lb")) & (F.col("ia") != F.col("ib")))
        .select(
            "label",
            "ia",
            "ib",
            F.round(dot("xa", "xb") / (F.col("na") * F.col("nb")), 4).alias("c"),
        )
    )
    knn = (
        comp.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("ia").orderBy(F.desc("c"), F.asc("ib"))
            ),
        )
        .where(F.col("r") <= _MKNN_K)
        .select("label", "ia", "ib")
        .localCheckpoint()
    )
    rev = knn.select(F.col("ia").alias("ib"), F.col("ib").alias("ia"))
    mutual = (
        knn.join(rev, ["ia", "ib"], "left_semi")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_mutual"))
    )
    return (
        knn.groupBy("label")
        .agg(
            F.countDistinct("ia").alias("n_vectors"),
            F.count(F.lit(1)).alias("n_directed"),
        )
        .join(mutual, "label", "left")
        .select(
            "label",
            "n_vectors",
            "n_directed",
            F.coalesce(F.col("n_mutual"), F.lit(0)).cast("long").alias("n_mutual"),
        )
        .orderBy("label")
    )


# ------------------------- 2.8 sync core: watermark lag report

_WMLAG_ORACLE = """
WITH per AS (
  SELECT event_type, count(*) AS n_events, max(ts) AS max_ts FROM events GROUP BY 1
),
g AS (SELECT max(max_ts) AS gmax FROM per)
SELECT event_type,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(date_diff('second', max_ts, g.gmax) AS BIGINT) AS lag_s,
       CAST(CASE WHEN date_diff('second', max_ts, g.gmax) > 600 THEN 1 ELSE 0 END AS INT)
         AS is_straggler
FROM per, g ORDER BY event_type
"""


@query("sync_watermark_lag_report", "2.8 sync core", _WMLAG_ORACLE)
def sync_watermark_lag_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream-key watermark lag audit: each event_type's high-water
    mark vs the global maximum event time, lag in whole seconds, straggler
    flag at >600s — the health check a multi-source ingestion runs before
    advancing a GLOBAL watermark (one stalled source silently holds back
    every windowed aggregate downstream; this report names it). Completes
    the declared watermark qids (stream_watermark_late_drop enforces the
    policy; this measures who forces it).

    Scale shape: ONE map-side-combinable (key) max/count aggregate over
    the pruned two-column scan, then a broadcast global max — per-source
    lag at 100 TB costs exactly one reduction, no window, no join."""
    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("max_ts")
    )
    g = per.agg(F.max("max_ts").alias("gmax"))
    lag = F.unix_timestamp("gmax") - F.unix_timestamp("max_ts")
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "n_events",
            lag.cast("long").alias("lag_s"),
            F.when(lag > 600, 1).otherwise(0).cast("int").alias("is_straggler"),
        )
        .orderBy("event_type")
    )
