"""SURVEY.md §2 round-7 batch D: streaming windowed top-k and exact
graph modularity.

  stream_topk_replay        live readStream windowed counts -> rank on sink
  graph_modularity_nations  exact-integer modularity decomposition
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# --------------------------- 2.10 streaming: windowed top-k via replay

_TOPK_STREAM_ORACLE = """
WITH w AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT window_start, event_type, n,
         row_number() OVER (PARTITION BY window_start
                            ORDER BY n DESC, event_type) AS rank
  FROM w
)
SELECT window_start, CAST(rank AS INT) AS rank, event_type, CAST(n AS BIGINT) AS n
FROM r WHERE rank <= 2 ORDER BY window_start, rank
"""


@query("stream_topk_replay", "2.10 streaming", _TOPK_STREAM_ORACLE)
def stream_topk_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed TOP-K through a live stream: readStream -> watermark ->
    1h-tumbling (window, event_type) counts -> availableNow memory sink,
    then the per-window top-2 RANKING runs batch on the drained state —
    the production shape for streaming leaderboards, because rank is not
    a supported streaming aggregate (it would need the whole window's
    final counts; Structured Streaming rightly refuses) and per-batch
    ranks would be wrong under late data. The oracle recomputes the same
    top-2 from scratch, so both the streamed counts AND the rank step are
    value-checked. Full tiebreak (n DESC, event_type).

    Scale shape: the streaming leg is the declared tumbling-agg state
    machine (watermark-bounded state, map-side partial counts); the rank
    leg is a per-window ranked window over #windows x #types rows —
    sink-sized, not event-sized."""
    from hdc_dataengineering_sqlsync_spark.streaming.jobs import (
        events_path,
        read_events_stream,
        run_to_memory,
        tumbling_1h,
    )

    stream = read_events_stream(spark, events_path(sf_dir))
    view, q = run_to_memory(tumbling_1h(stream), mode="complete")
    q.stop()
    r = F.row_number().over(
        Window.partitionBy("window_start").orderBy(F.desc("n"), F.asc("event_type"))
    )
    return (
        spark.table(view)
        .select("window_start", "event_type", "n", r.alias("rank"))
        .where(F.col("rank") <= 2)
        .select("window_start", F.col("rank").cast("int"), "event_type", "n")
        .orderBy("window_start", "rank")
    )


# -------------------- 2.12 workloads: exact-integer graph modularity

_MODULARITY_ORACLE = """
WITH sc AS (
  SELECT DISTINCT l_suppkey AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS (
  SELECT DISTINCT a.s AS s1, b.s AS s2
  FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
),
com AS (SELECT s_suppkey AS s, s_nationkey AS nat FROM supplier),
el AS (
  SELECT e.s1, e.s2, c1.nat AS n1, c2.nat AS n2
  FROM e JOIN com c1 ON e.s1 = c1.s JOIN com c2 ON e.s2 = c2.s
),
m AS (SELECT count(*) AS m FROM el),
deg AS (
  SELECT nat, CAST(sum(d) AS BIGINT) AS deg_sum, count(*) AS n_suppliers
  FROM (
    SELECT s, nat, count(*) AS d
    FROM (SELECT s1 AS s, n1 AS nat FROM el UNION ALL SELECT s2, n2 FROM el)
    GROUP BY s, nat
  ) GROUP BY nat
),
intra AS (
  SELECT n1 AS nat, count(*) AS l_in FROM el WHERE n1 = n2 GROUP BY 1
)
SELECT d.nat AS nationkey,
       CAST(d.n_suppliers AS BIGINT) AS n_suppliers,
       d.deg_sum,
       CAST(coalesce(i.l_in, 0) AS BIGINT) AS internal_edges,
       CAST(m.m AS BIGINT) AS m_edges,
       CAST(4 * m.m * coalesce(i.l_in, 0) - d.deg_sum * d.deg_sum AS BIGINT)
         AS q_num
FROM deg d LEFT JOIN intra i ON d.nat = i.nat, m
ORDER BY nationkey
"""


@query("graph_modularity_nations", "2.12 composite workloads", _MODULARITY_ORACLE)
def graph_modularity_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the NATION partition over the supplier
    co-customer graph, decomposed per community in EXACT integers:
    Q = Σ_c (L_c/m − (D_c/2m)²) = Σ_c q_num_c / (4m²) with q_num_c =
    4m·L_c − D_c² — the community-quality score clustering pipelines gate
    on, computed by cross-multiplication so no float share can flap and
    the caller divides ONCE by 4m² (int64 headroom: D_c ≤ 2m caps q_num
    at ~4m²; decimal(38,0) is the documented widening past ~1e9 edges).

    Scale shape: the edge list is the bounded common-customer self-join
    (per-customer fan-out, never corpus-quadratic); community labels
    broadcast-join from the supplier dim; degrees and intra-edge counts
    are two map-side-combinable keyed aggregates over the edge list."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("s"), F.col("s_nationkey").alias("nat")
    )
    sc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    a, b = sc.alias("a"), sc.alias("b")
    e = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .distinct()
    )
    c1 = sup.select(F.col("s").alias("s1"), F.col("nat").alias("n1"))
    c2 = sup.select(F.col("s").alias("s2"), F.col("nat").alias("n2"))
    el = e.join(F.broadcast(c1), "s1").join(F.broadcast(c2), "s2").localCheckpoint()
    m = el.agg(F.count(F.lit(1)).alias("m"))
    deg = (
        el.select(F.col("s1").alias("s"), F.col("n1").alias("nat"))
        .unionAll(el.select(F.col("s2").alias("s"), F.col("n2").alias("nat")))
        .groupBy("s", "nat")
        .agg(F.count(F.lit(1)).alias("d"))
        .groupBy("nat")
        .agg(F.sum("d").alias("deg_sum"), F.count(F.lit(1)).alias("n_suppliers"))
    )
    intra = (
        el.where(F.col("n1") == F.col("n2"))
        .groupBy(F.col("n1").alias("nat"))
        .agg(F.count(F.lit(1)).alias("l_in"))
    )
    return (
        deg.join(intra, "nat", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.col("nat").alias("nationkey"),
            "n_suppliers",
            F.col("deg_sum").cast("long").alias("deg_sum"),
            F.coalesce(F.col("l_in"), F.lit(0)).cast("long").alias("internal_edges"),
            F.col("m").cast("long").alias("m_edges"),
            (
                4 * F.col("m") * F.coalesce(F.col("l_in"), F.lit(0))
                - F.col("deg_sum") * F.col("deg_sum")
            ).cast("long").alias("q_num"),
        )
        .orderBy("nationkey")
    )
