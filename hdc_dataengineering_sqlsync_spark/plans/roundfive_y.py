"""SURVEY.md §2 round-5 additions, batch HH.

Token burstiness (dispersion-index classes) and k-core peeling.
Registered after ``roundfive_x`` (plans/__init__.py) so the qids append
to the END of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ---------- 2.9 llm-data: token burstiness via dispersion index

# VMR (variance-to-mean ratio) classes decided by integer
# CROSS-MULTIPLICATION (the wl_xyz_variability discipline): with N docs,
# T = total occurrences, S = sum of squared per-doc counts (docs without
# the token contribute 0), var/mean > x  <=>  N*S - T^2 > x * N * T.
_BURST_CLASS = (
    "CASE WHEN n_docs * s2 - t * t > 3 * n_docs * t THEN 'heavy'"
    " WHEN n_docs * s2 - t * t > n_docs * t THEN 'bursty'"
    " ELSE 'regular' END"
)

_BURST_ORACLE = f"""
WITH tf AS (
  SELECT doc_id, token, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents)
  GROUP BY doc_id, token
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
per_token AS (
  SELECT token,
         CAST(SUM(c) AS HUGEINT) AS t,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2,
         CAST(COUNT(*) AS HUGEINT) AS df
  FROM tf GROUP BY token
),
classed AS (
  SELECT token, df, {_BURST_CLASS} AS cls
  FROM per_token CROSS JOIN n
)
SELECT cls,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(df) AS BIGINT) AS df_total
FROM classed GROUP BY cls ORDER BY cls
"""


@query("text_burstiness_dispersion", "2.9 llm-data", _BURST_ORACLE)
def text_burstiness_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness: dispersion-index (VMR) classes, division-free.

    The Church-Gale observation that separates CONTENT words from
    function words: a topical token clumps (a doc that mentions it
    mentions it many times — variance far above a Poisson's mean),
    while grammatical glue spreads evenly. VMR = var/mean of the
    per-doc count distribution (zero-docs included); class boundaries
    at 1x and 3x decided by integer cross-multiplication over exact
    moments — no division, no float boundary hazards (the
    `wl_xyz_variability` discipline applied to text). Burstiness feeds
    stopword induction, keyword weighting and quality filters that
    count repetition (`text_repetition_ratio` is the per-doc view;
    this is the per-token view).

    Scale shape: term frequencies reduce map-side to the (doc, token)
    grain; per-token moments are a second keyed agg; the census is
    3 rows. Everything partial-combines."""
    tf = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = load(spark, sf_dir, "documents").agg(
        F.countDistinct("doc_id").cast("decimal(38,0)").alias("n_docs")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per_token = tf.groupBy("token").agg(
        F.sum(dec("c")).alias("t"),
        F.sum(dec("c") * F.col("c")).alias("s2"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("df"),
    )
    classed = per_token.crossJoin(F.broadcast(n)).select(
        "token", "df", F.expr(_BURST_CLASS).alias("cls")
    )
    return (
        classed.groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("df").cast("long").alias("df_total"),
        )
        .orderBy("cls")
    )


# ---------- 2.12 workloads: k-core peeling (3 unrolled rounds)

_KCORE_K = 3

_KCORE_ORACLE = f"""
WITH e0 AS (
  SELECT DISTINCT o.o_custkey AS u, l.l_suppkey + 1000000 AS v
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
d1 AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
  ) GROUP BY node
),
k1 AS (SELECT node FROM d1 WHERE deg >= {_KCORE_K}),
e1 AS (SELECT e0.u, e0.v FROM e0
       JOIN k1 a ON e0.u = a.node JOIN k1 b ON e0.v = b.node),
d2 AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1
  ) GROUP BY node
),
k2 AS (SELECT node FROM d2 WHERE deg >= {_KCORE_K}),
e2 AS (SELECT e1.u, e1.v FROM e1
       JOIN k2 a ON e1.u = a.node JOIN k2 b ON e1.v = b.node),
d3 AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2
  ) GROUP BY node
),
k3 AS (SELECT node FROM d3 WHERE deg >= {_KCORE_K}),
e3 AS (SELECT e2.u, e2.v FROM e2
       JOIN k3 a ON e2.u = a.node JOIN k3 b ON e2.v = b.node)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS round,
         CAST((SELECT COUNT(*) FROM k1) AS BIGINT) AS n_nodes,
         CAST((SELECT COUNT(*) FROM e1) AS BIGINT) AS n_edges
  UNION ALL
  SELECT 2, (SELECT COUNT(*) FROM k2), (SELECT COUNT(*) FROM e2)
  UNION ALL
  SELECT 3, (SELECT COUNT(*) FROM k3), (SELECT COUNT(*) FROM e3)
) ORDER BY round
"""


@query("graph_kcore_peel3", "2.12 composite workloads", _KCORE_ORACLE)
def graph_kcore_peel3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling, three deterministic rounds toward the 3-core.

    The graph-sparsification primitive (community seeds, spam-cluster
    mining, the standard pre-filter before expensive clique work):
    repeatedly delete nodes of degree < k — survivors of the fixpoint
    form the k-core. Three SYNCHRONOUS rounds are unrolled (peel all
    sub-k nodes at once per round — deterministic, unlike sequential
    peeling orders) over the customer-supplier trade graph; the census
    tracks the (nodes, edges) contraction per round — monotone
    non-increasing, unit-asserted.

    Scale shape: each round is one degree count (two keyed partials
    over the edge list) + two semi-joins of edges against surviving
    nodes — all equi-keyed on node id; lineage truncates per round
    (localCheckpoint) exactly like `connected_components`. Full
    fixpoint at deployment loops the same round body with the
    convergence probe; rounds-needed is bounded by the degeneracy
    ordering depth, small on real trade graphs."""
    e = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("u"),
            (F.col("l_suppkey") + 1000000).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    out_rows = []
    edges = e
    for rnd in range(1, 4):
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= _KCORE_K).select("node")
        edges = (
            edges.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        n_nodes = keep.count()
        n_edges = edges.count()
        out_rows.append((rnd, n_nodes, n_edges))
    return spark.createDataFrame(
        out_rows, "round long, n_nodes long, n_edges long"
    ).orderBy("round")
