"""SURVEY.md §2.12 graph analytics (split out of the round-4 modules, r5).

The co-purchase graph family: integer-packed PageRank, frontier BFS,
triangle census, common-neighbor Jaccard, and the degree histogram — all
relational Pregel / keyed-equi-join shapes (no cartesian step anywhere;
see each docstring for the 100 TB argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load


# --------------------------------------------------------- graph derivation
#
# The testdata has no explicit edge table, so the graph qids derive one
# relationally — the same move a production pipeline makes (orders ARE the
# edges of the customer/supplier interaction graph). Shared between
# graph_pagerank and graph_bfs_levels; the SQL constant is the oracle's
# identical derivation.

# Nodes are PACKED INT64 ids (customer k -> 2k, supplier k -> 2k+1): graph
# iterations shuffle 8-byte keys, never strings; ids render to 'C<k>'/'S<k>'
# only in the final (tiny) projection. _NODE_RENDER_SQL is the DuckDB twin.
_CS_EDGES_SQL = """
pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
)
"""

_NODE_RENDER_SQL = (
    "CASE WHEN {n} % 2 = 0 THEN 'C' || CAST({n} // 2 AS VARCHAR) "
    "ELSE 'S' || CAST({n} // 2 AS VARCHAR) END"
)


def _render_node(col) -> "F.Column":
    half = F.expr(f"{col} div 2").cast("string")
    return F.when(F.col(col) % 2 == 0, F.concat(F.lit("C"), half)).otherwise(
        F.concat(F.lit("S"), half)
    )


def _cs_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed edge list of the bipartite customer↔supplier graph: one edge
    per distinct (customer, supplier) trade relationship, in both directions
    (so the graph is symmetric and every node has out-degree ≥ 1 — no
    PageRank dangling-node correction needed). Node ids are packed int64
    (2k / 2k+1) — see _CS_EDGES_SQL comment.

    PACKING INVARIANT (load-bearing, r12 ADVICE): every node id is
    ``2*o_custkey`` or ``2*l_suppkey + 1`` and NOTHING ELSE, so
    ``rowcount(customer) + rowcount(supplier)`` is an upper bound on the
    node count — graph_pagerank's broadcast-hint gate depends on exactly
    this. If this derivation ever adds a third node type, extend that
    bound in the same commit; ``test_cs_edges_node_packing_invariant``
    pins the coupling so it breaks loudly."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    return pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


def _pagerank_oracle() -> str:
    """Unrolled 3-iteration integer PageRank (see graph_pagerank docstring
    for the exact recurrence); each iteration is the same join-aggregate."""
    step = """
{nxt} AS (
  SELECT e.dst AS node,
         CAST(150000 + (85 * sum(r.rank // d.outdeg)) // 100 AS BIGINT) AS rank
  FROM edges e JOIN {cur} r ON r.node = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst
)"""
    iters = ",".join(step.format(cur=f"r{i}", nxt=f"r{i + 1}") for i in range(3))
    return f"""
WITH {_CS_EDGES_SQL.strip()},
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
{iters}
SELECT {_NODE_RENDER_SQL.format(n="node")} AS node, rank
FROM r3 ORDER BY rank DESC, node LIMIT 20
"""


@query("graph_pagerank", "2.12 composite workloads", _pagerank_oracle(), bench=True)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier trade graph, 3 power iterations,
    damping 0.85, as PURE INTEGER arithmetic so both engines agree bitwise:
    ranks start at 1,000,000; each step is
    ``rank'(v) = 150000 + (85 * Σ_{u→v} (rank(u) div outdeg(u))) div 100``
    — floor division on positive int64 is engine-identical, and the sum is
    an order-free integer aggregate (no float accumulation to drift).

    Scale: each iteration is ONE keyed join (edges ⋈ ranks on src, both
    partitioned by the join key after the first shuffle) plus ONE keyed sum
    to #nodes rows — the classic Pregel superstep expressed relationally.
    The edge list is localCheckpoint'ed once so the 3 iterations re-read a
    materialized edge partition, not the 2-table derivation; at 100 TB the
    same plan holds with edges bucketed by src (iterations then shuffle
    only the #nodes-sized rank table, never the edge list).

    Iteration join strategy (r12): the rank table is node-sized while the
    probe side is the checkpointed edge list, whose hash partitioning is
    invisible through the RDD scan — so the planner staged a sort-merge
    join and AQE's later broadcast conversion left a dead Exchange of the
    full edge table per iteration (plan-verified: 2 distinct 36 MiB edge
    shuffles + 1 reuse at sf0.1). When the node table provably fits a
    broadcast (row count from parquet footer metadata, no job), hint it
    explicitly so no iteration ever shuffles the edge list; beyond that
    size the hint is withheld and the sort-merge path stands — the hint is
    data-sized, never unconditional (guide §3.1)."""
    from hdc_dataengineering_sqlsync_spark.registry import rowcount

    edges = _cs_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # ONE materialization: the (src, dst, outdeg) working set the 3
    # iterations re-read (deg is node-sized -> AQE broadcasts the join)
    ed = edges.join(deg, "src").select("src", "dst", "outdeg").localCheckpoint()
    # upper bound on node count: every node id packs a customer or supplier
    # key (the _cs_edges PACKING INVARIANT), so the dimension row counts
    # bound the rank table. Budget lowered 12M -> 2M nodes (~32 MB framed)
    # in r13 on measurement, not estimate: a synthetic crossover probe of
    # this exact superstep at 36M edges (STRESS_r13_pagerank.json) read the
    # broadcast arm ~2.5x FASTER at 1M nodes, a wash at 4M, and ~1.8x
    # SLOWER at 11.9M — rebuilding and shipping a ~200 MB rank relation
    # every superstep costs more than the rank-side shuffle it saves, so
    # the old bound sat well inside the sort-merge-wins regime. The
    # hint-withheld path was also probed end-to-end (12.8M-footer-node
    # replica, 35M edges): no cliff, comparable to the forced-SMJ control.
    n_nodes_max = rowcount(sf_dir, "customer") + rowcount(sf_dir, "supplier")
    hint = F.broadcast if n_nodes_max <= 2_000_000 else (lambda df: df)
    ranks = ed.select(F.col("src").alias("node"), F.lit(1000000).cast("long").alias("rank")).distinct()
    for _ in range(3):
        ranks = (
            ed.join(hint(ranks), ed.src == ranks.node)
            .select("dst", F.expr("rank div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg((F.lit(150000) + F.expr("(85 * sum(contrib)) div 100")).cast("long").alias("rank"))
            .select(F.col("dst").alias("node"), "rank")
        )
    return (
        ranks.select(_render_node("node").alias("node"), "rank")
        .orderBy(F.col("rank").desc(), "node")
        .limit(20)
    )


_BFS_ORACLE = f"""
WITH RECURSIVE {_CS_EDGES_SQL.strip()},
walk(node, lvl) AS (
  SELECT (SELECT min(l_suppkey) * 2 + 1 FROM lineitem), 0
  UNION
  SELECT e.dst, w.lvl + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.lvl < 4
)
SELECT {_NODE_RENDER_SQL.format(n="node")} AS node, CAST(min(lvl) AS INT) AS lvl
FROM walk GROUP BY walk.node ORDER BY lvl, node
"""


@query("graph_bfs_levels", "2.12 composite workloads", _BFS_ORACLE)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distance (≤ 4) from the lowest-keyed supplier over the trade
    graph — frontier expansion, the scale-shape of every iterative graph
    traversal: each round joins ONLY the frontier (previous level's new
    nodes) against the edge list, dedups, and anti-joins the visited set, so
    per-round work tracks the frontier size, never the full graph. Rounds
    localCheckpoint so lineage doesn't compound across iterations. The
    oracle's recursive CTE uses UNION (not UNION ALL) — the same
    visited-set pruning — with min(lvl) collapsing re-reachings."""
    edges = _cs_edges(spark, sf_dir).localCheckpoint()
    src_key = load(spark, sf_dir, "lineitem").agg(F.min("l_suppkey")).collect()[0][0]
    frontier = spark.createDataFrame([(int(src_key) * 2 + 1, 0)], "node long, lvl int")
    visited = frontier
    for i in range(1, 5):
        frontier = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("lvl", F.lit(i))
            .localCheckpoint()
        )
        if not frontier.take(1):
            break
        visited = visited.unionAll(frontier)
    return visited.select(_render_node("node").alias("node"), "lvl").orderBy("lvl", "node")


_TRIANGLE_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
  SELECT a.p AS p1, b.p AS p2
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2
),
deg AS (
  SELECT p, count(*) AS d
  FROM (SELECT p1 AS p FROM e UNION ALL SELECT p2 AS p FROM e)
  GROUP BY p
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.p1 = e1.p2
  JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
)
SELECT (SELECT count(*) FROM deg) AS n_nodes,
       (SELECT count(*) FROM e) AS n_edges,
       (SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) FROM deg) AS n_wedges,
       (SELECT CAST(n_triangles AS BIGINT) FROM tri) AS n_triangles
"""


@query("graph_triangle_stats", "2.12 composite workloads", _TRIANGLE_ORACLE)
def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (edge = pair of parts
    co-ordered in ≥ 2 distinct orders; p1 < p2 orients each edge once):
    node/edge/wedge/triangle counts — the graph-quality profile (global
    clustering = 3·triangles/wedges) behind recommendation graphs.

    Scale: the basket self-join is bounded by basket size (never
    corpus-quadratic, the wl_basket_pairs argument) and the ≥2-support
    threshold prunes the edge list BEFORE the cubic step; the triangle
    join itself is two keyed equi-joins over the pruned p1<p2 edges — each
    wedge (e1.p2 = e2.p1) closes against the oriented edge set, counting
    every triangle exactly once. Production graphs additionally orient
    edges low-degree → high-degree so hub wedges never enumerate; the
    wedge count this query emits is exactly the statistic that decides
    when that reorientation pays."""
    li = load(spark, sf_dir, "lineitem")
    op = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("p1", "p2")
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("p1").alias("p"))
        .unionAll(e.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.p1") == F.col("e1.p2"))
        .join(e3, (F.col("e3.p1") == F.col("e1.p1")) & (F.col("e3.p2") == F.col("e2.p2")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("cast(sum((d * (d - 1)) div 2) as bigint)").alias("n_wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
    )


# --------------------------------------- 2.12 common-neighbor similarity

_COMMON_NBR_ORACLE = """
WITH sc AS (
  SELECT DISTINCT l_suppkey AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
deg AS (SELECT s, count(*) AS d FROM sc GROUP BY s),
common AS (
  SELECT a.s AS s1, b.s AS s2, count(*) AS nc
  FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
  GROUP BY 1, 2
)
SELECT s1, s2, CAST(nc AS BIGINT) AS n_common,
       round(CAST(nc AS DOUBLE) / (d1.d + d2.d - nc), 4) AS jaccard
FROM common JOIN deg d1 ON d1.s = common.s1 JOIN deg d2 ON d2.s = common.s2
ORDER BY jaccard DESC, s1, s2 LIMIT 20
"""


@query("graph_common_neighbors", "2.12 composite workloads", _COMMON_NBR_ORACLE)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor (Jaccard) node similarity between suppliers sharing
    customers — the link-prediction / lookalike primitive: similarity =
    |common customers| / |union|. The pair enumeration joins the
    (supplier, customer) incidence list with itself ON CUSTOMER — fan-out
    bounded per customer by their supplier count (never corpus-quadratic,
    the wl_basket_pairs argument); degrees come from one keyed count and
    join back on the tiny supplier key. Exact integer counts; one rounded
    division; top-20 with full tiebreak."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    sc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
        .localCheckpoint()
    )
    deg = sc.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    a, b = sc.alias("a"), sc.alias("b")
    common = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    d1 = deg.select(F.col("s").alias("s1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("s").alias("s2"), F.col("d").alias("d2"))
    return (
        common.join(F.broadcast(d1), "s1")
        .join(F.broadcast(d2), "s2")
        .select(
            "s1",
            "s2",
            F.col("nc").alias("n_common"),
            F.round(F.col("nc").cast("double") / (F.col("d1") + F.col("d2") - F.col("nc")), 4).alias(
                "jaccard"
            ),
        )
        .orderBy(F.col("jaccard").desc(), "s1", "s2")
        .limit(20)
    )


_DEGREE_HIST_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
  SELECT a.p AS p1, b.p AS p2
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2
),
deg AS (
  SELECT p, count(*) AS d
  FROM (SELECT p1 AS p FROM e UNION ALL SELECT p2 AS p FROM e)
  GROUP BY p
)
SELECT CAST(length(bin(d)) - 1 AS INT) AS log2_bucket,
       count(*) AS n_nodes,
       CAST(min(d) AS BIGINT) AS min_deg, CAST(max(d) AS BIGINT) AS max_deg
FROM deg GROUP BY log2_bucket ORDER BY log2_bucket
"""


@query("graph_degree_histogram", "2.12 composite workloads", _DEGREE_HIST_ORACLE)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree distribution of the co-purchase graph (the
    power-law diagnostic that decides skew strategy: a heavy tail here is
    what makes hub-salting and degree-reorientation pay). Bucket =
    floor(log2(degree)) computed EXACTLY as the binary-string length − 1
    (`length(bin(d)) - 1` in both engines) — a float `ln(d)/ln(2)` flaps
    at exact powers of two. One keyed degree count, one tiny rollup."""
    li = load(spark, sf_dir, "lineitem")
    op = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    a, b = op.alias("a"), op.alias("b")
    # e (the co-purchase edge list, a reduction) feeds BOTH endpoint-census
    # branches of the unionAll; checkpoint it once so the basket self-join
    # doesn't recompute (r10 plan audit: 4 fact scans in one plan) — the
    # same edge discipline as pagerank above.
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("p1", "p2")
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("p1").alias("p"))
        .unionAll(e.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return (
        deg.groupBy(F.expr("cast(length(bin(d)) - 1 as int)").alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("d").alias("min_deg"),
            F.max("d").alias("max_deg"),
        )
        .orderBy("log2_bucket")
    )
