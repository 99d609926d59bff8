"""SURVEY.md §2 round-7 batch K: IVF recall-vs-nprobe curve and CUPED.

  simsearch_recall_vs_nprobe  hash-matched IVF recall curve (nprobe dial)
  wl_ab_cuped_adjustment      CUPED variance-reduced A/B metrics
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# --------------- 2.9 llm-data: IVF recall@10 vs nprobe (hash-matched)

_NPROBES = [1, 2, 4]
_RECALL_K = 10


def _nprobe_oracle() -> str:
    from hdc_dataengineering_sqlsync_spark.plans.llmdata_r4 import _SEM_TARGET_CELL

    # flat argmax over the closed-form codebook (the semantic-dedup cells),
    # ties toward the greatest cell; every dot is exact int64 on the 1e-3
    # grid, so cells, rankings, and recall are integers end to end.
    probes = ", ".join(str(p) for p in _NPROBES)
    return f"""
WITH kk AS (
  SELECT CAST(greatest(1, (count(*) + {_SEM_TARGET_CELL - 1}) // {_SEM_TARGET_CELL}) AS BIGINT)
           AS k
  FROM embeddings
),
qv AS (
  SELECT vec_id,
         list_transform(range(1, 65), i -> CAST(round(embedding[i] * 1000) AS BIGINT)) AS q
  FROM embeddings
),
cells AS (
  SELECT vec_id, q,
         CAST(len(ds) - list_indexof(list_reverse(ds), list_max(ds)) AS BIGINT) AS cell
  FROM (
    SELECT vec_id, q,
           list_transform(range(0, kk.k), c ->
             cast(list_sum(list_transform(range(1, 65), i ->
               q[i] * ((i * (2 * c + 3) * 11) % 41 - 20))) AS BIGINT)) AS ds
    FROM qv, kk
  )
),
qq AS (SELECT q AS qx, cell AS qcell FROM cells WHERE vec_id = 0),
cellrank AS (
  SELECT cell, row_number() OVER (ORDER BY d DESC, cell) AS crank
  FROM (
    SELECT cr.c AS cell,
           cast(list_sum(list_transform(range(1, 65), i ->
             qq.qx[i] * ((i * (2 * cr.c + 3) * 11) % 41 - 20))) AS BIGINT) AS d
    FROM (SELECT unnest(range(0, kk.k)) AS c FROM kk) cr, qq
  )
),
scored AS (
  SELECT v.vec_id, v.cell,
         CAST(list_sum(list_transform(range(1, 65), i -> v.q[i] * qq.qx[i])) AS BIGINT) AS d
  FROM cells v, qq WHERE v.vec_id <> 0
),
exact AS (
  SELECT vec_id FROM (
    SELECT vec_id, row_number() OVER (ORDER BY d DESC, vec_id) AS r FROM scored
  ) WHERE r <= {_RECALL_K}
),
curve AS (
  SELECT np.np,
         (SELECT count(*)
          FROM (
            SELECT sc.vec_id, row_number() OVER (ORDER BY sc.d DESC, sc.vec_id) AS r
            FROM scored sc JOIN cellrank cr ON cr.cell = sc.cell
            WHERE cr.crank <= np.np
          ) t
          WHERE t.r <= {_RECALL_K}
            AND t.vec_id IN (SELECT vec_id FROM exact)) AS n_hits,
         (SELECT count(*)
          FROM scored sc JOIN cellrank cr ON cr.cell = sc.cell
          WHERE cr.crank <= np.np) AS n_scanned
  FROM (SELECT unnest([{probes}]) AS np) np
)
SELECT CAST(np AS INT) AS nprobe,
       CAST(n_scanned AS BIGINT) AS n_scanned,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST((n_hits * 20000 + {_RECALL_K}) // {2 * _RECALL_K} AS BIGINT)
         AS recall_bps
FROM curve ORDER BY nprobe
"""


@query("simsearch_recall_vs_nprobe", "2.9 llm-data", _nprobe_oracle())
def simsearch_recall_vs_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF nprobe DIAL, hash-matched: recall@10 and scanned-row count
    for nprobe ∈ {1,2,4} against the exact full-scan ranking ON THE SAME
    integer-grid metric — isolating exactly the loss cell pruning causes
    (the declared rows-only simsearch_ivf shows the KMeans path; this one
    uses the closed-form codebook so BOTH engines derive identical cells
    and the recall curve value-checks). Every dot is exact int64; recall
    in half-up bps. This is the table an ANN operator publishes so users
    pick their accuracy/cost point.

    Scale shape: cell assignment is one map-side pass (numpy argmax over
    the closed-form codebook, the dedup_semantic_centroid machinery);
    each nprobe evaluation scans only the probed cells' rows (equi-join
    on cell id, never all-pairs) and reduces to a k-row rank list."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType

    from hdc_dataengineering_sqlsync_spark.plans.llmdata_r4 import _sem_cent, _sem_k
    from hdc_dataengineering_sqlsync_spark.registry import rowcount

    e = load(spark, sf_dir, "embeddings")
    k = _sem_k(rowcount(sf_dir, "embeddings"))
    codebook = np.array([_sem_cent(c) for c in range(k)], dtype=np.int64)

    q = F.transform("embedding", lambda x: F.round(x.cast("double") * 1000, 0).cast("long"))

    def _assign_batch(qs):
        qm = np.array(qs.tolist(), dtype=np.int64)
        dots = qm @ codebook.T
        idx = (dots.shape[1] - 1) - np.argmax(dots[:, ::-1], axis=1)
        return pd.Series(idx.astype("int32"))

    _assign = F.pandas_udf(_assign_batch, IntegerType())
    base = e.select("vec_id", q.alias("q")).select(
        "vec_id", "q", _assign("q").alias("cell")
    ).localCheckpoint()

    qrow = base.where(F.col("vec_id") == 0).select(
        F.col("q").alias("qx")
    )
    dot = F.aggregate(
        F.zip_with(F.col("q"), F.col("qx"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        base.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qrow))
        .select("vec_id", "cell", dot.alias("d"))
        .localCheckpoint()
    )
    # rank cells by query-to-centroid dot (tiny driver-side numpy — K cells)
    qx_np = np.array(
        qrow.collect()[0]["qx"], dtype=np.int64
    )  # 64 ints, bounded driver pull
    cdots = codebook @ qx_np
    crank_order = sorted(range(k), key=lambda c: (-int(cdots[c]), c))
    from pyspark.sql import Window

    exact = (
        scored.withColumn(
            "r", F.row_number().over(Window.orderBy(F.desc("d"), F.asc("vec_id")))
        )
        .where(F.col("r") <= _RECALL_K)
        .select("vec_id")
        .localCheckpoint()
    )
    out = []
    for np_probe in _NPROBES:
        probed_cells = [crank_order[i] for i in range(min(np_probe, k))]
        probed = scored.where(F.col("cell").isin(probed_cells))
        approx = (
            probed.withColumn(
                "r", F.row_number().over(Window.orderBy(F.desc("d"), F.asc("vec_id")))
            )
            .where(F.col("r") <= _RECALL_K)
            .select("vec_id")
        )
        hits = approx.join(exact, "vec_id", "left_semi").count()
        out.append(
            (np_probe, probed.count(), hits, (hits * 20000 + _RECALL_K) // (2 * _RECALL_K))
        )
    return spark.createDataFrame(
        out, "nprobe int, n_scanned long, n_hits long, recall_bps long"
    ).orderBy("nprobe")


# --------------------- 2.12 workloads: CUPED variance reduction

_CUPED_ORACLE = """
WITH per AS (
  SELECT o_custkey AS cust,
         CAST(sum(CASE WHEN year(o_orderdate) IN (1995, 1996)
                       THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN year(o_orderdate) = 1997
                       THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM orders
  GROUP BY o_custkey
),
v AS (
  SELECT cust, x, y,
         CASE WHEN (strpos('0123456789abcdef', substr(md5(CAST(cust AS VARCHAR)), 1, 1)) - 1) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant
  FROM per
),
g AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM v
),
theta AS (
  SELECT CAST(n AS BIGINT) AS n,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           AS th,
         CAST(sx AS DOUBLE) / n AS mx,
         (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS vary_n2
  FROM g
),
adj AS (
  SELECT v.variant, v.y, v.x,
         CAST(v.y AS DOUBLE) - th * (CAST(v.x AS DOUBLE) - mx) AS y_adj
  FROM v, theta
),
pv AS (
  SELECT variant, count(*) AS n,
         round(avg(CAST(y AS DOUBLE)) / 100, 2) AS mean_y,
         round(avg(y_adj) / 100, 2) AS mean_y_adj
  FROM adj GROUP BY variant
),
vr AS (
  SELECT round(1.0 - (avg(y_adj * y_adj) - avg(y_adj) * avg(y_adj))
               / ((avg(CAST(y AS DOUBLE) * y) - avg(CAST(y AS DOUBLE)) * avg(CAST(y AS DOUBLE)))), 4)
           AS var_reduction
  FROM adj
)
SELECT pv.variant, CAST(pv.n AS BIGINT) AS n, pv.mean_y, pv.mean_y_adj,
       vr.var_reduction
FROM pv, vr ORDER BY pv.variant
"""


@query("wl_ab_cuped_adjustment", "2.12 composite workloads", _CUPED_ORACLE)
def wl_ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for A/B metrics (the experimentation-
    platform standard): per customer, pre-period spend X (1995-96) and
    experiment spend Y (1997), θ = cov(X,Y)/var(X) from EXACT integer
    moments (the ONE division is a shared IEEE string), adjusted
    Y* = Y − θ·(X − μx); per md5-hash variant: n, raw and adjusted mean
    (2dp dollars), plus the global variance-reduction factor — the number
    that justifies CUPED (same means, tighter intervals). Moments widen
    to decimal/HUGEINT before squaring (the Bollinger overflow lesson).

    Scale shape: one keyed (customer) reduction, one 6-number global
    moment aggregate broadcast back, map-side adjustment, per-variant
    aggregate — three map-combinable passes, no window, no join bigger
    than a broadcast scalar."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    per = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.sum(F.when(F.year("o_orderdate").isin(1995, 1996), cents).otherwise(0)).alias("x"),
        F.sum(F.when(F.year("o_orderdate") == 1997, cents).otherwise(0)).alias("y"),
    )
    variant = F.when(
        F.conv(F.substring(F.md5(F.col("cust").cast("string")), 1, 1), 16, 10).cast("long") % 2
        == 0,
        "A",
    ).otherwise("B")
    v = per.select("cust", "x", "y", variant.alias("variant"))
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    g = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    theta = g.select(
        "n",
        (
            (F.col("n").cast("double") * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / (F.col("n").cast("double") * F.col("sxx").cast("double")
               - F.col("sx").cast("double") * F.col("sx").cast("double"))
        ).alias("th"),
        (F.col("sx").cast("double") / F.col("n")).alias("mx"),
    )
    adj = v.crossJoin(F.broadcast(theta)).select(
        "variant",
        F.col("y").cast("double").alias("yd"),
        (F.col("y").cast("double") - F.col("th") * (F.col("x").cast("double") - F.col("mx"))).alias(
            "y_adj"
        ),
    )
    pv = adj.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("yd") / 100, 2).alias("mean_y"),
        F.round(F.avg("y_adj") / 100, 2).alias("mean_y_adj"),
    )
    vr = adj.agg(
        F.round(
            1.0
            - (F.avg(F.col("y_adj") * F.col("y_adj")) - F.avg("y_adj") * F.avg("y_adj"))
            / (F.avg(F.col("yd") * F.col("yd")) - F.avg("yd") * F.avg("yd")),
            4,
        ).alias("var_reduction")
    )
    return (
        pv.crossJoin(F.broadcast(vr))
        .select("variant", "n", "mean_y", "mean_y_adj", "var_reduction")
        .orderBy("variant")
    )
