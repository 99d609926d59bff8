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

from pyspark.sql import DataFrame, SparkSession
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
         CAST(sum(CAST(1000000 // cdeg.d AS BIGINT)) AS BIGINT) AS ra_micro
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

# Unit-normalize on the 1e-3-quantized integer grid, then re-quantize to
# 1e-4: every float op (sqrt of an exact int64, one division, +0.5, floor)
# is a correctly-rounded IEEE op over EXACT integer inputs, so qn is
# bit-identical across engines and the kNN ranking is a pure int64 dot
# with an id tiebreak — no order-dependent float sum anywhere, which is
# what lets the Spark side run the whole block census as numpy matmuls.
_MKNN_QN = """
SELECT vec_id, label, qn FROM (
  SELECT vec_id, label,
         list_transform(q, v -> CAST(floor(v * 10000 / sqrt(nn2) + 0.5) AS BIGINT)) AS qn
  FROM (
    SELECT vec_id, label,
           list_transform(range(1, 65), i -> CAST(round(embedding[i] * 1000) AS BIGINT)) AS q,
           list_sum(list_transform(range(1, 65), i ->
             CAST(round(embedding[i] * 1000) AS BIGINT)
             * CAST(round(embedding[i] * 1000) AS BIGINT))) AS nn2
    FROM embeddings
  ) WHERE nn2 > 0
)
"""

def _mknn_oracle() -> str:
    from hdc_dataengineering_sqlsync_spark.plans.llmdata_r4 import _SEM_TARGET_CELL

    return f"""
WITH qv0 AS ({_MKNN_QN}),
kk AS (
  SELECT CAST(greatest(1, (count(*) + {_SEM_TARGET_CELL - 1}) // {_SEM_TARGET_CELL}) AS BIGINT)
           AS k
  FROM embeddings
),
qv AS (
  SELECT vec_id, label, qn,
         CAST(len(ds) - list_indexof(list_reverse(ds), list_max(ds)) AS BIGINT) AS cell
  FROM (
    SELECT vec_id, label, qn,
           list_transform(range(0, kk.k), c ->
             cast(list_sum(list_transform(range(1, 65), i ->
               qn[i] * ((i * (2 * c + 3) * 11) % 41 - 20))) AS BIGINT)) AS ds
    FROM qv0, kk
  )
),
comp AS (
  SELECT a.label, a.vec_id AS ia, b.vec_id AS ib,
         CAST(list_sum(list_transform(range(1, 65), i ->
           a.qn[i] * b.qn[i])) AS BIGINT) AS d
  FROM qv a JOIN qv b
    ON a.label = b.label AND a.cell = b.cell AND a.vec_id <> b.vec_id
),
knn AS (
  SELECT label, ia, ib FROM (
    SELECT label, ia, ib,
           row_number() OVER (PARTITION BY ia ORDER BY d DESC, ib) AS r
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


@query("simsearch_mutual_knn", "2.9 llm-data", _mknn_oracle(), bench=True)
def simsearch_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN graph construction, (label, cell)-blocked: directed
    top-3 neighbor edges per vector within its label × coarse-codebook
    cell, then the MUTUAL edge set (a in b's top-k AND b in a's top-k) —
    the symmetrization step every kNN-graph clustering / graph-ANN index
    build runs, and the per-label mutual/directed hubness census.

    Blocking (r7 final form): label alone is NOT a scale-safe block — the
    factor-30 probe measured 0.99x PER-ROW cost (38s at 150k vectors)
    because block population grows with the corpus while label count
    doesn't, so Σ|block|² is quadratic. Blocks therefore refine by the
    data-driven closed-form codebook cell (K = ceil(n/128) — the
    dedup_semantic_centroid machinery, assignment on the same qn grid the
    ranking uses), holding blocks at ~target size at ANY corpus size;
    kNN-within-cell is exactly how production graph-ANN builds bound the
    exact-kNN stage (coarse partition, local kNN, optional cross-cell
    merge rounds — documented, not declared).

    Ranking metric: integer dot over UNIT-NORMALIZED 1e-4-quantized
    vectors — quantize to 1e-3 ints, norm from the exact int sum of
    squares (order-free), re-quantize x·1e4/‖x‖ with floor(+0.5). Every
    float op is a correctly-rounded IEEE op over exact integer inputs, so
    the grid is bit-identical across engines and the ranking has NO
    order-dependent float sum — which lets the whole per-block census run
    as numpy int64 matmuls inside ONE applyInPandas (the float-cosine
    pair join this replaced spent 4.2s at sf0.1 in interpreted per-pair
    HOF dots). Ties break toward the smaller neighbor id.

    Scale shape: pair work is blocked by label (Σ|block|², sharded —
    IVF cells replace labels when no natural key exists); each block
    arrives once as an Arrow group, the dot matrix is one |block|²·64
    int64 matmul, and only 4 counters per label leave Python."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType

    from hdc_dataengineering_sqlsync_spark.plans.llmdata_r4 import _sem_cent, _sem_k
    from hdc_dataengineering_sqlsync_spark.registry import rowcount

    e = load(spark, sf_dir, "embeddings")
    kcells = _sem_k(rowcount(sf_dir, "embeddings"))
    codebook = np.array([_sem_cent(c) for c in range(kcells)], dtype=np.int64)
    q = F.transform("embedding", lambda x: F.round(x.cast("double") * 1000, 0).cast("long"))
    nn2 = F.aggregate(
        "q", F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )
    qn = F.transform(
        "q",
        lambda v: F.floor(v * F.lit(10000.0) / F.sqrt(F.col("nn2").cast("double")) + F.lit(0.5)).cast(
            "long"
        ),
    )

    def _assign_batch(qs):
        qm = np.array(qs.tolist(), dtype=np.int64)
        dots = qm @ codebook.T
        idx = (dots.shape[1] - 1) - np.argmax(dots[:, ::-1], axis=1)
        return pd.Series(idx.astype("int32"))

    _assign = F.pandas_udf(_assign_batch, IntegerType())
    base = (
        e.select("label", "vec_id", q.alias("q"))
        .withColumn("nn2", nn2)
        .where(F.col("nn2") > 0)
        .select("label", "vec_id", qn.alias("qn"))
        .withColumn("cell", _assign("qn"))
    )

    def _block_census(pdf):
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        qm = np.array(pdf["qn"].tolist(), dtype=np.int64)
        n = len(ids)
        k = min(_MKNN_K, n - 1)
        if k <= 0:
            # a single-vector block has no knn rows — the oracle emits no
            # row for such a block, so neither do we
            return pd.DataFrame(
                {"label": [], "n_vectors": [], "n_directed": [], "n_mutual": []}
            )
        dots = qm @ qm.T
        # exclude self with a sentinel that survives the -dots negation
        # (negating int64 MIN overflows back to itself and would rank
        # self-edges FIRST — caught by the oracle mismatch in r7)
        np.fill_diagonal(dots, -(1 << 62))
        # top-k by (dot DESC, neighbor id ASC): ids are sorted ascending,
        # so a stable argsort on -dot realizes the tiebreak
        order = np.argsort(-dots, axis=1, kind="stable")[:, :k]
        adj = np.zeros((n, n), dtype=bool)
        rows = np.repeat(np.arange(n), k)
        adj[rows, order.ravel()] = True
        mutual = adj & adj.T
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n_vectors": [n],
                "n_directed": [n * k],
                "n_mutual": [int(np.triu(mutual, 1).sum())],
            }
        )

    per_block = (
        # explicit width = session parallelism (== 32 on local[32]): defeats
        # AQE coalescing the tiny block shuffle under the core count while
        # scaling with the cluster instead of pinning 32 tasks at any size;
        # floor of 8 keeps low-parallelism sessions off a 1-2-task funnel
        base.repartition(max(8, spark.sparkContext.defaultParallelism), "label", "cell")
        .groupBy("label", "cell")
        .applyInPandas(
            _block_census, "label int, n_vectors long, n_directed long, n_mutual long"
        )
    )
    return (
        per_block.groupBy("label")
        .agg(
            F.sum("n_vectors").cast("long").alias("n_vectors"),
            F.sum("n_directed").cast("long").alias("n_directed"),
            F.sum("n_mutual").cast("long").alias("n_mutual"),
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
