"""SURVEY.md §2 round-4 continuation batch — graph analytics over relational
edge derivations (integer PageRank, frontier BFS, triangle census), the
EXISTS/NOT-IN subquery predicate surface with its three-valued-logic trap,
an exact-integer correlation/covariance aggregate, and a Benford first-digit
audit.

Registered AFTER roundfour (plans/__init__.py) so the qids append to the END
of the never-checked rotation segment and enter the round-5 driver window
without evicting the planned round-4 one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    (2k / 2k+1) — see _CS_EDGES_SQL comment."""
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
    only the #nodes-sized rank table, never the edge list)."""
    edges = _cs_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # ONE materialization: the (src, dst, outdeg) working set the 3
    # iterations re-read (deg is node-sized -> AQE broadcasts the join)
    ed = edges.join(deg, "src").select("src", "dst", "outdeg").localCheckpoint()
    ranks = ed.select(F.col("src").alias("node"), F.lit(1000000).cast("long").alias("rank")).distinct()
    for _ in range(3):
        ranks = (
            ed.join(ranks, ed.src == ranks.node)
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


# ------------------------------------------------------------- 2.3 joins

_EXISTS_NOTIN_ORACLE = """
SELECT 'exists_notin' AS tag, count(*) AS n
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= DATE '1996-01-01'
                AND o.o_orderdate < DATE '1997-01-01')
  AND c.c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
UNION ALL
SELECT 'not_exists' AS tag, count(*) AS n
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '1996-01-01'
                    AND o.o_orderdate < DATE '1997-01-01')
UNION ALL
SELECT 'notin_null_poisoned' AS tag, count(*) AS n
FROM customer c
WHERE c.c_nationkey NOT IN
      (SELECT CASE WHEN n_nationkey = 0 THEN NULL ELSE n_nationkey END
       FROM nation WHERE n_regionkey = 2)
ORDER BY tag
"""


@query("subq_exists_notin", "2.3 joins", _EXISTS_NOTIN_ORACLE)
def subq_exists_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS / NOT IN predicate subqueries through the SQL
    front end, including the NOT-IN NULL trap: branch 3's subquery list
    contains a NULL, so ``x NOT IN (…)`` is never TRUE under three-valued
    logic and the count is 0 — the classic silent-wrong-answer hazard a
    sync engine's key-comparison layer must honor, pinned here in both
    engines. Catalyst rewrites EXISTS → left-semi, NOT EXISTS → left-anti,
    and NOT IN → null-aware anti join (the expensive one — the plan shows
    why production schemas declare keys NOT NULL and use NOT EXISTS)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_EXISTS_NOTIN_ORACLE)


# ---------------------------------------------------------- 2.4 aggregations

_CORR_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(CAST(l_quantity AS BIGINT)) AS sx,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sy,
         sum(CAST(l_quantity AS BIGINT)
             * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sxy,
         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
         AS corr_qty_cents,
       round((CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(n AS DOUBLE), 2) AS covar_pop_qty_cents,
       round((CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(n - 1 AS DOUBLE), 2) AS covar_samp_qty_cents
FROM s ORDER BY l_returnflag
"""


@query("agg_corr_covar_exact", "2.4 aggregations", _CORR_ORACLE)
def agg_corr_covar_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation + covariance as ONE exact-integer
    aggregate pass: quantities are integral and prices 2-decimal, so Σx
    and Σy sum as int64 while every second-moment sum (Σxy ~5e8/row, Σx²,
    Σy² ~1e14/row) accumulates as DECIMAL(38,0) — DuckDB promotes BIGINT
    sums to HUGEINT but non-ANSI Spark sum(long) silently wraps, and at
    ~1e12 rows Σxy alone (~5e20) blows int64 headroom — then the
    closed-form
    moments formulas run ONCE per group in double. This sidesteps the
    cross-engine drift of builtin corr()/covar() (different accumulation
    schemes) the same way wl_price_trend_slope does for regression, and is
    the 100 TB shape: a single map-side-combinable aggregate, no second
    pass over centered values."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast("decimal(38,0)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,0)")).alias("syy"),
    )
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    return s.select(
        "l_returnflag",
        "n",
        F.round(
            (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)), 4
        ).alias("corr_qty_cents"),
        F.round((sxy - sx * sy / n) / n, 2).alias("covar_pop_qty_cents"),
        F.round((sxy - sx * sy / n) / (F.col("n") - 1).cast("double"), 2).alias(
            "covar_samp_qty_cents"
        ),
    ).orderBy("l_returnflag")


# ------------------------------------------------------------ 2.8 sync core

# log10(1 + 1/d) to 4 decimals — fixed literals on BOTH sides so no libm
# log10 ulp difference can leak into the comparison.
_BENFORD = {1: 0.3010, 2: 0.1761, 3: 0.1249, 4: 0.0969, 5: 0.0792, 6: 0.0669, 7: 0.0580, 8: 0.0512, 9: 0.0458}

_BENFORD_CASE = "CASE digit " + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD.items()) + " END"

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
           AS digit
  FROM orders
),
census AS (
  SELECT digit, count(*) AS n FROM digits GROUP BY digit
),
tot AS (SELECT sum(n) AS total FROM census)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / total, 4) AS obs_pct,
       {_BENFORD_CASE} AS exp_pct,
       round(abs(round(CAST(n AS DOUBLE) / total, 4) - ({_BENFORD_CASE})), 4) AS abs_dev
FROM census, tot ORDER BY digit
"""


@query("dq_benford_firstdigit", "2.8 sync core", _BENFORD_ORACLE)
def dq_benford_firstdigit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit on order totals — the fraud /
    synthetic-data screen: observed digit shares vs the Benford expectation
    log10(1+1/d) (fixed 4-decimal literals on both sides, so no libm
    divergence). The leading digit comes from exact cents (×100 shifts the
    decimal point, leaving the first significant digit unchanged), so the
    census is pure integer counting — one map-side-combinable aggregate to
    9 rows, then literal arithmetic over already-rounded shares."""
    o = load(spark, sf_dir, "orders")
    digit = F.substring(F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1).cast("int")
    census = o.select(digit.alias("digit")).groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = census.agg(F.sum("n").alias("total"))
    exp_pct = F.expr(_BENFORD_CASE)
    obs_pct = F.round(F.col("n").cast("double") / F.col("total"), 4)
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            obs_pct.alias("obs_pct"),
            exp_pct.alias("exp_pct"),
            F.round(F.abs(obs_pct - exp_pct), 4).alias("abs_dev"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------- 2.8 Merkle anti-entropy

def _merkle_oracle() -> str:
    from hdc_dataengineering_sqlsync_spark.plans.dataops import _ORDERS_DG
    from hdc_dataengineering_sqlsync_spark.plans.sync import _TARGET_SQL

    dg = f"bit_xor(cast(concat('0x', substr({_ORDERS_DG}, 1, 15)) AS BIGINT))"
    return f"""
WITH target AS ({_TARGET_SQL}),
sm AS (SELECT date_trunc('month', o_orderdate) AS part, count(*) AS n, {dg} AS dg
       FROM orders GROUP BY part),
tm AS (SELECT date_trunc('month', o_orderdate) AS part, count(*) AS n, {dg} AS dg
       FROM target GROUP BY part),
sq AS (SELECT CAST(year(part) AS VARCHAR) || '-Q' || CAST(quarter(part) AS VARCHAR) AS q,
              sum(n) AS n, bit_xor(dg) AS dg FROM sm GROUP BY q),
tq AS (SELECT CAST(year(part) AS VARCHAR) || '-Q' || CAST(quarter(part) AS VARCHAR) AS q,
              sum(n) AS n, bit_xor(dg) AS dg FROM tm GROUP BY q),
sr AS (SELECT sum(n) AS n, bit_xor(dg) AS dg FROM sq),
tr AS (SELECT sum(n) AS n, bit_xor(dg) AS dg FROM tq),
l1 AS (
  SELECT coalesce(sq.q, tq.q) AS node,
         CAST(coalesce(sq.n, 0) AS BIGINT) AS src_n,
         CAST(coalesce(tq.n, 0) AS BIGINT) AS tgt_n,
         CASE WHEN sq.n = tq.n AND sq.dg = tq.dg THEN 'same' ELSE 'diff' END AS status
  FROM sq FULL OUTER JOIN tq ON sq.q = tq.q
),
l2 AS (
  SELECT CAST(year(coalesce(sm.part, tm.part)) AS VARCHAR) || '-Q'
           || CAST(quarter(coalesce(sm.part, tm.part)) AS VARCHAR) AS q,
         strftime(coalesce(sm.part, tm.part), '%Y-%m') AS node,
         CAST(coalesce(sm.n, 0) AS BIGINT) AS src_n,
         CAST(coalesce(tm.n, 0) AS BIGINT) AS tgt_n,
         CASE WHEN sm.n = tm.n AND sm.dg = tm.dg THEN 'same' ELSE 'diff' END AS status
  FROM sm FULL OUTER JOIN tm ON sm.part = tm.part
)
SELECT 0 AS lvl, 'ALL' AS node, CAST(sr.n AS BIGINT) AS src_n, CAST(tr.n AS BIGINT) AS tgt_n,
       CASE WHEN sr.n = tr.n AND sr.dg = tr.dg THEN 'same' ELSE 'diff' END AS status
FROM sr, tr
UNION ALL
SELECT 1 AS lvl, node, src_n, tgt_n, status FROM l1
UNION ALL
SELECT 2 AS lvl, l2.node, l2.src_n, l2.tgt_n, l2.status
FROM l2 JOIN l1 ON l1.node = l2.q WHERE l1.status = 'diff'
ORDER BY lvl, node
"""


@query("sync_anti_entropy_merkle", "2.8 sync core", _merkle_oracle())
def sync_anti_entropy_merkle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-tree anti-entropy between source and drifted target — the
    hierarchical generalization of sync_partition_digest: month leaves roll
    up (sum count, XOR digest — XOR's associativity means a quarter's digest
    IS the XOR of all its rows' digests) into quarter nodes and a root, and
    the drill-down DESCENDS ONLY INTO UNEQUAL SUBTREES: the output carries
    the root, every quarter, but leaf rows only under quarters that differ.
    At 100 TB this is how two stores agree with O(changed-subtrees) digest
    traffic instead of O(partitions): each level is a map-side-combinable
    aggregate over the (already tiny) level below, and matching subtrees
    prune their entire leaf fan-out from the comparison.

    Digest spec shared with the row-level diff (functions/digests.py) — one
    canonicalization, reused at every tree level."""
    from hdc_dataengineering_sqlsync_spark.plans.dataops import _partition_digest
    from hdc_dataengineering_sqlsync_spark.plans.sync import _source, _target

    def levels(df: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
        leaf = _partition_digest(df).localCheckpoint()  # (part, n, dg), ~24 rows
        quarter = F.concat(
            F.year("part").cast("string"), F.lit("-Q"), F.quarter("part").cast("string")
        )
        l1 = leaf.groupBy(quarter.alias("q")).agg(
            F.sum("n").alias("n"), F.expr("bit_xor(dg)").alias("dg")
        )
        root = l1.agg(F.sum("n").alias("n"), F.expr("bit_xor(dg)").alias("dg"))
        return leaf, l1, root

    s_leaf, s_l1, s_root = levels(_source(spark, sf_dir))
    t_leaf, t_l1, t_root = levels(_target(spark, sf_dir))

    def status(a: str, b: str):
        return (
            F.when(
                (F.col(f"{a}.n") == F.col(f"{b}.n")) & (F.col(f"{a}.dg") == F.col(f"{b}.dg")),
                "same",
            )
            .otherwise("diff")
            .alias("status")
        )

    def sides(n_a: str, n_b: str):
        return (
            F.coalesce(F.col(f"{n_a}.n"), F.lit(0)).alias("src_n"),
            F.coalesce(F.col(f"{n_b}.n"), F.lit(0)).alias("tgt_n"),
        )

    root = (
        s_root.alias("a")
        .crossJoin(t_root.alias("b"))
        .select(F.lit(0).alias("lvl"), F.lit("ALL").alias("node"), *sides("a", "b"), status("a", "b"))
    )
    l1 = (
        s_l1.alias("a")
        .join(t_l1.alias("b"), F.col("a.q") == F.col("b.q"), "full_outer")
        .select(
            F.lit(1).alias("lvl"),
            F.coalesce("a.q", "b.q").alias("node"),
            *sides("a", "b"),
            status("a", "b"),
        )
    )
    month_q = F.concat(
        F.year(F.coalesce("a.part", "b.part")).cast("string"),
        F.lit("-Q"),
        F.quarter(F.coalesce("a.part", "b.part")).cast("string"),
    )
    leaf = (
        s_leaf.alias("a")
        .join(t_leaf.alias("b"), F.col("a.part") == F.col("b.part"), "full_outer")
        .select(
            month_q.alias("q"),
            F.date_format(F.coalesce("a.part", "b.part"), "yyyy-MM").alias("node"),
            *sides("a", "b"),
            status("a", "b"),
        )
    )
    diff_q = l1.where(F.col("status") == "diff").select(F.col("node").alias("q"))
    leaf_rows = (
        leaf.join(F.broadcast(diff_q), "q")
        .select(F.lit(2).alias("lvl"), "node", "src_n", "tgt_n", "status")
    )
    return root.unionAll(l1).unionAll(leaf_rows).orderBy("lvl", "node")


# ------------------------------------------------- 2.10 timeseries ACF

_ACF_ORACLE = r"""
WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
           FROM events),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (SELECT t.event_type, g.h
         FROM types t, b, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS g(h)),
counts AS (SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS x
           FROM events GROUP BY 1, 2),
x AS (SELECT g.event_type, g.h, coalesce(c.x, 0) AS x
      FROM grid g LEFT JOIN counts c ON c.event_type = g.event_type AND c.h = g.h),
c AS (SELECT event_type, h,
             count(*) OVER (PARTITION BY event_type) * x
               - sum(x) OVER (PARTITION BY event_type) AS cdev
      FROM x),
l AS (SELECT event_type, cdev,
             lead(cdev, 1) OVER (PARTITION BY event_type ORDER BY h) AS c1,
             lead(cdev, 2) OVER (PARTITION BY event_type ORDER BY h) AS c2,
             lead(cdev, 3) OVER (PARTITION BY event_type ORDER BY h) AS c3
      FROM c),
a AS (SELECT event_type,
             sum(cdev * cdev) AS den,
             sum(cdev * c1) AS n1, sum(cdev * c2) AS n2, sum(cdev * c3) AS n3
      FROM l GROUP BY event_type)
SELECT event_type, lag,
       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4) AS acf
FROM (
  SELECT event_type, 1 AS lag, n1 AS num, den FROM a
  UNION ALL SELECT event_type, 2, n2, den FROM a
  UNION ALL SELECT event_type, 3, n3, den FROM a
)
ORDER BY event_type, lag
"""


@query("ts_acf_lags", "2.10 streaming", _ACF_ORACLE)
def ts_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series autocorrelation at lags 1-3 over the gap-filled hourly
    event grid — the seasonality detector that decides ts_seasonal_naive's
    period. Exact by construction: with integer counts, the centered
    deviation scales to ``n·x_t − S`` (pure int64), so numerator and
    denominator are order-free integer sums and ONE final IEEE division per
    lag is the only float op. Scale: grid construction is
    sequence-explode (no shuffle), counts one keyed agg, and the lag
    windows partition per series — series count × grid length rows, window
    parallelism = #series (high-cardinality in production; the events
    fixture has 5)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    )
    counts = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("x"))
    bounds = ev.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"))
    )
    x = grid.join(counts, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("x", F.lit(0)).alias("x")
    )
    from pyspark.sql import Window

    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("h")
    c = x.select(
        "event_type",
        "h",
        (F.count(F.lit(1)).over(wp) * F.col("x") - F.sum("x").over(wp)).alias("cdev"),
    )
    lagged = c.select(
        "event_type",
        "cdev",
        F.lead("cdev", 1).over(wo).alias("c1"),
        F.lead("cdev", 2).over(wo).alias("c2"),
        F.lead("cdev", 3).over(wo).alias("c3"),
    )
    a = lagged.groupBy("event_type").agg(
        F.sum(F.col("cdev") * F.col("cdev")).alias("den"),
        F.sum(F.col("cdev") * F.col("c1")).alias("n1"),
        F.sum(F.col("cdev") * F.col("c2")).alias("n2"),
        F.sum(F.col("cdev") * F.col("c3")).alias("n3"),
    )
    return (
        a.selectExpr(
            "event_type",
            "stack(3, 1, round(cast(n1 as double) / cast(den as double), 4), "
            "2, round(cast(n2 as double) / cast(den as double), 4), "
            "3, round(cast(n3 as double) / cast(den as double), 4)) as (lag, acf)",
        )
        .orderBy("event_type", "lag")
    )


# --------------------------------------------------------- 2.9 llm-data

_CHUNK_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents
),
n AS (
  SELECT doc_id, toks,
         1 + (greatest(len(toks) - 32, 0) + 23) // 24 AS n_chunks
  FROM tok
)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       CAST(len(list_slice(toks, i * 24 + 1, i * 24 + 32)) AS INT) AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, i * 24 + 1, i * 24 + 32), ' ')) AS chunk_hash
FROM n, unnest(range(0, CAST(n_chunks AS BIGINT))) AS t(i)
ORDER BY doc_id, chunk_id
"""


@query("text_chunk_overlap", "2.9 llm-data", _CHUNK_ORACLE)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window 32, stride 24 — 8-token
    overlap): the RAG/embedding prep step that turns documents into
    retrieval passages. Chunk count is pure integer arithmetic
    (``1 + (max(n−32,0)+23) div 24``), each chunk is a map-side array
    slice, and only (doc_id, chunk_id, 16-byte hash) leave the scan — the
    chunk text itself re-derives from the doc row wherever it's needed
    next (the embedding UDF), so nothing wide ever shuffles. Tail chunks
    keep their partial window (every token belongs to ≥1 chunk)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    n_chunks = F.expr("1 + (greatest(size(split(lower(text), '\\\\s+')) - 32, 0) + 23) div 24")
    chunked = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_id"),
    )
    piece = F.slice("toks", F.col("chunk_id") * 24 + 1, 32)
    return chunked.select(
        "doc_id",
        "chunk_id",
        F.size(piece).alias("n_chunk_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_id")


_PRUNE_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents
),
chunks AS (
  SELECT doc_id, i,
         array_to_string(list_slice(toks, i * 20 + 1, i * 20 + 20), ' ') AS ctext
  FROM tok, unnest(range(0, (len(toks) + 19) // 20)) AS t(i)
),
h AS (SELECT doc_id, i, ctext, md5(ctext) AS phash FROM chunks),
shared AS (SELECT phash FROM h GROUP BY phash HAVING count(DISTINCT doc_id) > 1),
kept AS (SELECT h.doc_id, h.i, h.ctext FROM h LEFT JOIN shared s USING (phash)
         WHERE s.phash IS NULL),
re AS (SELECT doc_id, count(*) AS n_kept,
              md5(string_agg(ctext, ' ' ORDER BY i)) AS clean_hash,
              sum(len(string_split_regex(ctext, '\s+'))) AS n_tokens_kept
       FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, CAST((len(toks) + 19) // 20 AS INT) AS n_chunks FROM tok)
SELECT t.doc_id, t.n_chunks,
       CAST(t.n_chunks - coalesce(re.n_kept, 0) AS INT) AS n_pruned,
       CAST(coalesce(re.n_tokens_kept, 0) AS INT) AS n_tokens_kept,
       coalesce(re.clean_hash, md5('')) AS clean_hash
FROM tot t LEFT JOIN re ON re.doc_id = t.doc_id
ORDER BY t.doc_id
"""


@query("text_boilerplate_prune", "2.9 llm-data", _PRUNE_ORACLE)
def text_boilerplate_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate REMOVAL with reassembly (the C4/RefinedWeb repeated-
    passage prune, completing dedup_passage_exact's detect step): 20-token
    passages appearing in >1 document are cut, survivors rejoin in order
    (tail fragments keep their place), and each doc emits its cleaned-text
    fingerprint + kept-token census. The scale discipline: passage TEXT
    never shuffles — the keyed agg sees only (doc_id, idx, 16-byte hash),
    the per-doc prune list (a few ints) joins back to the doc row, and the
    cleaned text re-derives MAP-SIDE from the original column via
    filter/transform/flatten higher-order functions."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    n_chunks = F.expr("cast((size(split(lower(text), '\\\\s+')) + 19) div 20 as int)")
    hashes = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.md5(F.array_join(F.slice(toks, i * 20 + 1, 20), " ")),
    )
    c = d.select("doc_id", F.posexplode(hashes).alias("i", "phash"))
    shared = (
        c.groupBy("phash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("phash")
    )
    pruned = (
        c.join(shared, "phash")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("i")).alias("pruned_idx"))
    )
    out = d.join(pruned, "doc_id", "left").select(
        "doc_id",
        n_chunks.alias("n_chunks"),
        toks.alias("toks"),
        F.coalesce("pruned_idx", F.array().cast("array<int>")).alias("pruned_idx"),
    )
    kept_idx = F.filter(
        F.sequence(F.lit(0), F.col("n_chunks") - 1),
        lambda i: ~F.array_contains("pruned_idx", i),
    )
    kept_toks = F.flatten(
        F.transform(kept_idx, lambda i: F.slice("toks", i * 20 + 1, 20))
    )
    return out.select(
        "doc_id",
        "n_chunks",
        F.size("pruned_idx").alias("n_pruned"),
        F.size(kept_toks).alias("n_tokens_kept"),
        F.md5(F.array_join(kept_toks, " ")).alias("clean_hash"),
    ).orderBy("doc_id")


# ------------------------------------------------------------ 2.10 streaming

_BACKFILL_ORACLE = """
SELECT CAST(row_number() OVER (ORDER BY n DESC) AS INT) AS batch_rank,
       n AS n_rows
FROM (SELECT count(*) AS n FROM events GROUP BY user_id % 4)
ORDER BY batch_rank
"""


@query("stream_backfill_throttled", "2.10 streaming", _BACKFILL_ORACLE)
def stream_backfill_throttled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throttled backfill: a historical reload drains through the SAME
    streaming pipeline as live data, rate-limited by
    ``maxFilesPerTrigger=1`` so each micro-batch ingests exactly one file —
    the knob that keeps a 100 TB backfill from flooding state stores and
    sinks sized for the live rate. Four files (events sharded by
    user_id % 4) produce four micro-batches; the per-batch row counts,
    rank-ordered, must equal the batch GROUP BY census — proving no file
    was merged, split, or double-read across triggers. foreachBatch
    observes each micro-batch on the driver (bounded: one count per
    batch), exactly how a production backfill meters progress."""
    import hashlib
    import os
    import shutil
    import tempfile

    # pid-keyed (the per-process embedded-Derby rule): a concurrent
    # process running this qid at the same sf_dir must not rmtree a live
    # stream's source/checkpoint; per-process reuse stays bounded
    tag = hashlib.md5(f"backfill:{sf_dir}".encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"hdc_backfill_{tag}_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    src = f"{base}/src"
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    for g in range(4):
        ev.where(F.col("user_id") % 4 == g).coalesce(1).write.mode("append").parquet(src)

    batch_counts: list[int] = []

    def observe(batch_df: DataFrame, epoch_id: int) -> None:
        n = batch_df.count()
        if n > 0:
            batch_counts.append(n)

    stream = spark.readStream.schema("event_id long, user_id long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(observe)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ranked = [(i + 1, n) for i, n in enumerate(sorted(batch_counts, reverse=True))]
    return spark.createDataFrame(ranked, "batch_rank int, n_rows bigint").orderBy("batch_rank")


# ----------------------------------------------------------- 2.11 UDF surface

_UDTF_ANALYZE_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents
)
SELECT doc_id, toks[1] AS tok_1, toks[2] AS tok_2, toks[3] AS tok_3,
       CAST(greatest(len(toks) - 3, 0) AS INT) AS n_extra
FROM tok ORDER BY doc_id
"""


@query("udtf_python_analyze", "2.11 UDF surface", _UDTF_ANALYZE_ORACLE)
def udtf_python_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with an ``analyze()``-time DYNAMIC schema (the Spark-4
    polymorphic-UDTF surface, completing the static-schema udtf_python):
    the output width comes from the constant argument at PLAN time —
    ``split_fixed(text, 3)`` resolves to columns tok_1..tok_3 + n_extra
    before any data moves, so Catalyst prunes/projects through it like any
    other relation. Row-at-a-time Python is the declared API surface here
    (as with udf_python_scalar); the vectorized equivalent of this shape
    is udtf_map_in_pandas."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    @udtf
    class SplitFixed:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            ncols = n.value
            fields = [StructField(f"tok_{i + 1}", StringType(), True) for i in range(ncols)]
            fields.append(StructField("n_extra", IntegerType(), True))
            return AnalyzeResult(StructType(fields))

        def eval(self, text: str, n: int):
            import re

            # RE2 \s class [\t\n\f\r ] — the oracle's
            # string_split_regex('\s+') semantics exactly, including
            # boundary empty tokens on padded text (Python .split() drops
            # them and splits unicode; Java \s additionally matches \v —
            # a fixture-absent divergence shared by every F.split text qid)
            toks = re.split(r"[ \t\n\f\r]+", (text or "").lower())
            row = tuple(toks[i] if i < len(toks) else None for i in range(n))
            yield row + (max(0, len(toks) - n),)

    spark.udtf.register("split_fixed", SplitFixed)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.*
        FROM documents d, LATERAL split_fixed(d.text, 3) t
        ORDER BY d.doc_id
        """
    )


# ----------------------------------------------- 2.4 concentration / entropy

_GINI_ORACLE = """
WITH spend AS (
  SELECT c.c_mktsegment AS segment, c.c_custkey,
         sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT segment, cents,
         row_number() OVER (PARTITION BY segment ORDER BY cents, c_custkey) AS i,
         count(*) OVER (PARTITION BY segment) AS n,
         sum(cents) OVER (PARTITION BY segment) AS sx
  FROM spend
)
SELECT segment, CAST(max(n) AS BIGINT) AS n_customers,
       round((2.0 * CAST(sum(i * cents) AS DOUBLE)
              - CAST(max(n) + 1 AS DOUBLE) * CAST(max(sx) AS DOUBLE))
             / (CAST(max(n) AS DOUBLE) * CAST(max(sx) AS DOUBLE)), 4) AS gini
FROM ranked GROUP BY segment ORDER BY segment
"""


@query("agg_gini_segment", "2.4 aggregations", _GINI_ORACLE)
def agg_gini_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of customer spend per market segment — the
    inequality census behind revenue-concentration dashboards, via the
    sorted-rank identity ``G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)``. Exact
    int64 cents + integer ranks make every sum order-free; ONE double
    division per segment. Scale (the wl_abc_pareto argument): the fact
    stream reduces to #customers rows FIRST (keyed agg), the rank window
    runs over that reduced series partitioned per segment — the total order
    IS the semantics, and parallelism = #segments (in production, the
    grouping key is high-cardinality: per-tenant, per-market)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    spend = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "c_custkey")
        .agg(F.sum(cents).alias("cents"))
    )
    wp = Window.partitionBy("segment")
    wo = wp.orderBy("cents", "c_custkey")
    ranked = spend.select(
        "segment",
        "cents",
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("cents").over(wp).alias("sx"),
    )
    return (
        ranked.groupBy("segment")
        .agg(
            F.max("n").alias("n_customers"),
            F.round(
                (
                    F.lit(2.0) * F.sum(F.col("i") * F.col("cents")).cast("double")
                    - (F.max("n") + 1).cast("double") * F.max("sx").cast("double")
                )
                / (F.max("n").cast("double") * F.max("sx").cast("double")),
                4,
            ).alias("gini"),
        )
        .orderBy("segment")
    )


_ENTROPY_ORACLE = """
WITH c AS (
  SELECT l_returnflag AS f, l_linestatus AS s, count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
m AS (
  SELECT f, s, n,
         sum(n) OVER (PARTITION BY f) AS nf,
         sum(n) OVER (PARTITION BY s) AS ns,
         sum(n) OVER () AS nt
  FROM c
),
h AS (
  SELECT -sum((CAST(n AS DOUBLE) / nt) * ln(CAST(n AS DOUBLE) / nt)) AS hj,
         -sum((CAST(n AS DOUBLE) / nt) * ln(CAST(nf AS DOUBLE) / nt)) AS hf,
         -sum((CAST(n AS DOUBLE) / nt) * ln(CAST(ns AS DOUBLE) / nt)) AS hs
  FROM m
)
SELECT round(hf, 4) AS h_flag, round(hs, 4) AS h_status, round(hj, 4) AS h_joint,
       round(hf + hs - hj, 4) AS mutual_info
FROM h
"""


@query("agg_entropy_mi", "2.4 aggregations", _ENTROPY_ORACLE)
def agg_entropy_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy + mutual information of (returnflag, linestatus) —
    the dependence screen feature stores run over categorical pairs. ONE
    keyed count collapses the fact table to the tiny joint-distribution
    table; marginals come from window sums over those few rows (no second
    scan), and each marginal entropy is computed as a sum over JOINT rows
    (Σ_s n_fs = n_f), so one aggregate yields all three entropies; MI =
    H(f)+H(s)−H(joint) from the unrounded values."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_returnflag").alias("f"), F.col("l_linestatus").alias("s")).agg(
        F.count(F.lit(1)).alias("n")
    )
    m = c.select(
        "n",
        F.sum("n").over(Window.partitionBy("f")).alias("nf"),
        F.sum("n").over(Window.partitionBy("s")).alias("ns"),
        F.sum("n").over(Window.partitionBy()).alias("nt"),
    )
    p = F.col("n").cast("double") / F.col("nt")
    h = m.agg(
        (-F.sum(p * F.log(p))).alias("hj"),
        (-F.sum(p * F.log(F.col("nf").cast("double") / F.col("nt")))).alias("hf"),
        (-F.sum(p * F.log(F.col("ns").cast("double") / F.col("nt")))).alias("hs"),
    )
    return h.select(
        F.round("hf", 4).alias("h_flag"),
        F.round("hs", 4).alias("h_status"),
        F.round("hj", 4).alias("h_joint"),
        F.round(F.col("hf") + F.col("hs") - F.col("hj"), 4).alias("mutual_info"),
    )


# --------------------------------------------------- 2.3 spatial grid join

_SPATIAL_ORACLE = """
WITH p AS (
  SELECT c_custkey,
         CAST(concat('0x', substr(md5('x' || c_custkey), 1, 4)) AS INT) % 500 AS x,
         CAST(concat('0x', substr(md5('y' || c_custkey), 1, 4)) AS INT) % 500 AS y
  FROM customer
)
SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
       CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
FROM p a JOIN p b
  ON a.c_custkey < b.c_custkey
 AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 25
ORDER BY dist2, a_key, b_key LIMIT 50
"""


@query("join_spatial_grid", "2.3 joins", _SPATIAL_ORACLE)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-5 spatial self-join via GRID BLOCKING — the 2-D generalization
    of join_range_bucketized: each point keys by its 5×5 cell, one side
    additionally explodes to its 3×3 cell neighborhood, the pair search
    becomes an EQUI-join on cell (hash-partitionable — never the quadratic
    cross join the oracle is allowed to run), and the exact distance
    predicate + key ordering filter candidates down to true neighbor pairs,
    each found exactly once. Coordinates are md5-derived ints (synthetic
    but deterministic in both engines). At 100 TB cell size tunes to the
    radius (cell = r keeps the neighborhood constant at 9) and hot cells
    split by salting the cell key — the standard geo-join scaling story."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    coord = lambda salt: (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col("c_custkey").cast("string"))), 1, 4), 16, 10).cast("int")
        % 500
    )
    p = c.select("c_custkey", coord("x").alias("x"), coord("y").alias("y"))
    cell = lambda df: df.withColumn("cx", F.expr("x div 5")).withColumn("cy", F.expr("y div 5"))
    left = cell(p).select(
        F.col("c_custkey").alias("a_key"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.explode(F.expr("sequence(cx - 1, cx + 1)")).alias("ncx"),
        F.col("cy").alias("acy"),
    ).select(
        "a_key", "ax", "ay", "ncx", F.explode(F.expr("sequence(acy - 1, acy + 1)")).alias("ncy")
    )
    right = cell(p).select(
        F.col("c_custkey").alias("b_key"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("ncx"),
        F.col("cy").alias("ncy"),
    )
    dist2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        left.join(right, ["ncx", "ncy"])
        .where((F.col("a_key") < F.col("b_key")) & (dist2 <= 25))
        .select("a_key", "b_key", dist2.cast("long").alias("dist2"))
        .orderBy("dist2", "a_key", "b_key")
        .limit(50)
    )


# ------------------------------------------------------- 2.8 OR-Set CRDT

_ORSET_ORACLE = """
WITH adds AS (
  SELECT o_custkey % 100 AS elem, o_orderkey AS tag
  FROM orders WHERE o_orderkey % 5 <> 0
),
removes AS (
  SELECT o_orderkey - 3 AS tag FROM orders WHERE o_orderkey % 5 = 0
),
covered AS (SELECT a.elem, a.tag FROM adds a JOIN removes r USING (tag))
SELECT a.elem,
       CAST(count(*) - count(c.tag) AS BIGINT) AS n_live_tags,
       CAST(count(c.tag) AS BIGINT) AS n_tombstoned
FROM adds a LEFT JOIN covered c ON c.tag = a.tag
GROUP BY a.elem
HAVING count(*) - count(c.tag) > 0
ORDER BY a.elem
"""


@query("sync_crdt_orset", "2.8 sync core", _ORSET_ORACLE)
def sync_crdt_orset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-Set (observed-remove set) CRDT merge — the add/remove companion
    to sync_crdt_gcounter: every add carries a unique tag, a remove
    tombstones only tags it OBSERVED, and after merging all replicas an
    element is present iff it retains ≥1 un-tombstoned tag — concurrent
    add wins over remove (the un-observed tag survives), re-delivered
    removes are idempotent (same tag, same tombstone). Relationally: merge
    = union of add-sets, tombstone application = one keyed join on tag,
    presence census = one keyed count — all shuffle-partitionable by tag/
    element, no coordination, any delivery order."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    adds = o.where(F.col("o_orderkey") % 5 != 0).select(
        (F.col("o_custkey") % 100).alias("elem"), F.col("o_orderkey").alias("tag")
    )
    removes = o.where(F.col("o_orderkey") % 5 == 0).select(
        (F.col("o_orderkey") - 3).alias("tag")
    )
    covered = adds.join(removes, "tag").select("elem", "tag", F.lit(1).alias("tomb"))
    merged = adds.join(covered.select("tag", "tomb"), "tag", "left")
    return (
        merged.groupBy("elem")
        .agg(
            (F.count(F.lit(1)) - F.count("tomb")).alias("n_live_tags"),
            F.count("tomb").alias("n_tombstoned"),
        )
        .where(F.col("n_live_tags") > 0)
        .orderBy("elem")
    )


# ------------------------------------------- 2.9 two-stage ANN rerank

_RERANK_ORACLE = """
WITH quant AS (
  SELECT vec_id, embedding,
         CASE WHEN m > 0 THEN 127.0 / m ELSE 0.0 END AS s
  FROM (SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
        FROM embeddings)
),
qset AS (SELECT vec_id AS q_id, embedding AS qe, s AS qs FROM quant WHERE vec_id IN (0, 1, 2)),
s1 AS (
  SELECT q.q_id, e.vec_id, e.embedding, q.qe,
         sum(CAST(floor(CAST(e.embedding[i.range] AS DOUBLE) * e.s + 0.5) AS BIGINT)
             * CAST(floor(CAST(q.qe[i.range] AS DOUBLE) * q.qs + 0.5) AS BIGINT)) AS score1
  FROM quant e CROSS JOIN qset q CROSS JOIN range(1, 65) i
  WHERE e.vec_id <> q.q_id
  GROUP BY q.q_id, e.vec_id, e.embedding, q.qe
),
c50 AS (
  SELECT q_id, vec_id, embedding, qe
  FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score1 DESC, vec_id) AS rn
        FROM s1)
  WHERE rn <= 50
),
exact AS (
  SELECT q_id, vec_id,
         round(sum(CAST(embedding[i.range] AS DOUBLE) * CAST(qe[i.range] AS DOUBLE))
               / (sqrt(sum(CAST(embedding[i.range] AS DOUBLE) * CAST(embedding[i.range] AS DOUBLE)))
                  * sqrt(sum(CAST(qe[i.range] AS DOUBLE) * CAST(qe[i.range] AS DOUBLE)))), 4) AS cos
  FROM c50 CROSS JOIN range(1, 65) i
  GROUP BY q_id, vec_id
)
SELECT q_id, vec_id, cos
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
      FROM exact)
WHERE rn <= 10
ORDER BY q_id, cos DESC, vec_id
"""


@query("simsearch_rerank_two_stage", "2.9 llm-data", _RERANK_ORACLE)
def simsearch_rerank_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval funnel — THE production ANN serving shape:
    stage 1 ranks every candidate by a CHEAP int8×int8 integer dot product
    (per-vector symmetric quantization, 4× smaller and exact int64 — no
    float drift) keeping top-50 per query; stage 2 re-scores only those 50
    with the exact DOUBLE cosine and emits top-10. At 100 TB stage 1's
    scan reads 64 bytes/vector (the int8 codes) and its shuffle carries
    only (q_id, vec_id, score1); stage 2 broadcast-probes the 50·|Q|
    winner ids against the vector column (no shuffle of vectors — in
    production this rejoin is a point lookup into the vector store); both
    top-ks are ranked windows per query, so WindowGroupLimit keeps k rows
    per partition pre-shuffle."""
    from pyspark.sql import Window

    from hdc_dataengineering_sqlsync_spark.functions.vectors import (
        as_double_array,
        cosine_similarity,
    )

    e = load(spark, sf_dir, "embeddings")
    xd = as_double_array("embedding")
    m = F.array_max(F.transform(xd, lambda v: F.abs(v)))
    s = F.when(m > 0, F.lit(127.0) / m).otherwise(F.lit(0.0))
    qv = F.transform(xd, lambda v: F.floor(v * F.col("s") + F.lit(0.5)).cast("long"))
    quant = e.select("vec_id", "embedding", s.alias("s")).select(
        "vec_id", "embedding", qv.alias("qv")
    )
    qset = quant.where(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"), F.col("qv").alias("qq")
    )
    score1 = F.aggregate(
        F.zip_with("qv", "qq", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w1 = Window.partitionBy("q_id").orderBy(F.col("score1").desc(), "vec_id")
    # stage-1 shuffles ONLY (q_id, vec_id, score1) — 24 bytes/candidate;
    # the vectors rejoin AFTER the top-50 cut (50 rows/query), so the
    # docstring's 64-bytes-per-vector full-scan claim holds end-to-end
    c50 = (
        quant.crossJoin(F.broadcast(qset.select("q_id", "qq")))
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", score1.alias("score1"))
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= 50)
        .select("q_id", "vec_id")
    )
    rejoined = e.select("vec_id", "embedding").join(F.broadcast(c50), "vec_id").join(
        F.broadcast(qset.select("q_id", "qe")), "q_id"
    )
    cos = F.round(cosine_similarity("embedding", "qe"), 4)
    w2 = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        rejoined.select("q_id", "vec_id", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= 10)
        .select("q_id", "vec_id", "cos")
        .orderBy("q_id", F.col("cos").desc(), "vec_id")
    )


# ------------------------------------------------- 2.1 Python stream sink

_PYDS_STREAM_SINK_ORACLE = """
SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n,
       round(sum(value), 2) AS total
FROM events GROUP BY bucket ORDER BY bucket
"""


@query("pyds_stream_sink", "2.1 scans", _PYDS_STREAM_SINK_ORACLE)
def pyds_stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE streaming write through a custom Python DataSource STREAM
    writer (sources/pydatasource.py::JsonLinesStreamWriter) — the final
    cell of the Python DataSource matrix (batch read / pushdown read /
    stream read / batch write / stream write): the events stream drains
    epoch-by-epoch through per-batch two-phase commit (executor-staged
    files → driver rename to DETERMINISTIC epoch-keyed names, so a
    replayed epoch overwrites instead of duplicating — effectively-once).
    The committed files read back and must hash-match the batch rollup
    straight from the source table: a lost epoch, torn partition file, or
    double-committed replay breaks the match."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from hdc_dataengineering_sqlsync_spark.sources.pydatasource import (
        JsonLinesSinkDataSource,
    )
    from hdc_dataengineering_sqlsync_spark.streaming.jobs import (
        events_path,
        read_events_stream,
    )

    spark.dataSource.register(JsonLinesSinkDataSource)
    # pid-keyed like the backfill dir: a concurrent process running this
    # qid at the same sf_dir must not rmtree a live stream's committed
    # epochs/staging or read back its files (the writer docstring requires
    # distinct tags for path sharers)
    tag = hashlib.md5(f"pystreamsink:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"hdc_pystreamsink_{tag}_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    ckpt = tempfile.mkdtemp(prefix=f"hdc_pystreamsink_ckpt_{uuid.uuid4().hex[:8]}_")
    stream = read_events_stream(spark, events_path(sf_dir)).select(
        "event_id", "user_id", "value"
    )
    q = (
        stream.writeStream.format("jsonl_sink")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.schema("event_id long, user_id long, value double").json(
        path, pathGlobFilter="epoch-*.jsonl"
    )
    return (
        back.groupBy((F.col("user_id") % 10).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("bucket")
    )


# --------------------------------------------- 2.7 deterministic UUID mint

_UUID_ORACLE = """
WITH u AS (
  SELECT o_orderpriority,
         substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-3' || substr(h, 14, 3)
           || '-' || substr('89ab', (CAST(concat('0x', substr(h, 17, 1)) AS INT) % 4) + 1, 1)
           || substr(h, 18, 3) || '-' || substr(h, 21, 12) AS uuid
  FROM (SELECT o_orderpriority, md5('order:' || o_orderkey) AS h FROM orders)
)
SELECT o_orderpriority, count(*) AS n,
       count(DISTINCT uuid) AS n_distinct,
       min(uuid) AS min_uuid, max(uuid) AS max_uuid
FROM u GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("fn_uuid_deterministic", "2.7 scalar functions", _UUID_ORACLE)
def fn_uuid_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic name-based UUIDs (RFC 4122 v3 layout: md5 of a
    namespaced key with version nibble '3' and RFC variant in the 17th hex
    digit) — surrogate-key minting a sync engine can repeat on ANY engine,
    ANY retry, and get the same key (unlike uuid()/rand(), which poison
    retried tasks and cross-engine reconciliation). Pure map-side string
    surgery over md5; the census (count vs distinct, min/max exemplars)
    pins both uniqueness and the exact byte layout in both engines."""
    o = load(spark, sf_dir, "orders")
    h = F.md5(F.concat(F.lit("order:"), F.col("o_orderkey").cast("string")))
    var = F.substring(
        F.lit("89ab"), (F.conv(F.substring(F.col("h"), 17, 1), 16, 10).cast("int") % 4) + 1, 1
    )
    # substring(start) is 1-based; layout 8-4-4-4-12 with version '3'
    u = F.concat(
        F.substring("h", 1, 8), F.lit("-"),
        F.substring("h", 9, 4), F.lit("-3"),
        F.substring("h", 14, 3), F.lit("-"),
        var,
        F.substring("h", 18, 3), F.lit("-"),
        F.substring("h", 21, 12),
    )
    return (
        o.select("o_orderpriority", h.alias("h"))
        .select("o_orderpriority", u.alias("uuid"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("uuid").alias("n_distinct"),
            F.min("uuid").alias("min_uuid"),
            F.max("uuid").alias("max_uuid"),
        )
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------ 2.3 fuzzy closest match

_FUZZY_ORACLE = """
WITH probes AS (
  SELECT s_suppkey AS probe_key,
         replace(substr(s_name, 1, length(s_name) - 2), '#', '@')
           || substr(s_name, length(s_name), 1)
           || substr(s_name, length(s_name) - 1, 1) AS probe_name
  FROM supplier WHERE s_suppkey % 7 = 0
),
scored AS (
  SELECT p.probe_key, p.probe_name, s.s_suppkey, s.s_name,
         levenshtein(p.probe_name, s.s_name) AS dist,
         row_number() OVER (PARTITION BY p.probe_key
                            ORDER BY levenshtein(p.probe_name, s.s_name), s.s_suppkey) AS rn
  FROM probes p CROSS JOIN supplier s
)
SELECT probe_key, probe_name, s_suppkey AS match_key, s_name AS match_name,
       CAST(dist AS INT) AS dist
FROM scored WHERE rn = 1 ORDER BY probe_key
"""


@query("join_fuzzy_closest", "2.3 joins", _FUZZY_ORACLE)
def join_fuzzy_closest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy closest-match join (entity resolution): each corrupted probe
    name ('#'→'@' plus a transposed digit pair — no exact match exists)
    resolves to its nearest supplier by Levenshtein distance, ties broken
    by key. The probe side broadcasts and every candidate partition scores
    its rows map-side; per-probe argmin is a ranked window (ties
    deterministic). At 100 TB the all-pairs scoring is the correctness
    baseline — production blocks candidates first (prefix/LSH buckets, the
    dedup_minhash machinery) and scores only within blocks."""
    from pyspark.sql import Window

    s = load(spark, sf_dir, "supplier")
    ln = F.length("s_name")
    probe_name = F.concat(
        F.replace(F.substring(F.col("s_name"), F.lit(1), ln - 2), F.lit("#"), F.lit("@")),
        F.substring(F.col("s_name"), ln, F.lit(1)),
        F.substring(F.col("s_name"), ln - 1, F.lit(1)),
    )
    probes = s.where(F.col("s_suppkey") % 7 == 0).select(
        F.col("s_suppkey").alias("probe_key"), probe_name.alias("probe_name")
    )
    dist = F.levenshtein("probe_name", "s_name")
    w = Window.partitionBy("probe_key").orderBy(dist, "s_suppkey")
    return (
        s.crossJoin(F.broadcast(probes))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "probe_key",
            "probe_name",
            F.col("s_suppkey").alias("match_key"),
            F.col("s_name").alias("match_name"),
            dist.cast("int").alias("dist"),
        )
        .orderBy("probe_key")
    )


# -------------------------------------------- 2.12 DAU/WAU stickiness

_STICKINESS_ORACLE = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
days AS (SELECT DISTINCT d FROM ud),
dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY d),
wau AS (
  SELECT g.d, count(DISTINCT u.user_id) AS wau
  FROM days g JOIN ud u ON u.d BETWEEN g.d - 6 AND g.d
  GROUP BY g.d
)
SELECT g.d AS day, dau.dau, wau.wau,
       round(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
FROM days g JOIN dau ON dau.d = g.d JOIN wau ON wau.d = g.d
ORDER BY day
"""


@query("wl_dau_wau_stickiness", "2.12 composite workloads", _STICKINESS_ORACLE)
def wl_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement composite: daily active
    users over trailing-7-day active users. The scale move: the trailing
    window is NOT a range join — each (user, day) activity row EXPLODES to
    the ≤7 future days it covers (`sequence(d, d+6)`), turning WAU into a
    plain keyed distinct count on an EQUI key. The fact stream reduces to
    distinct (user, day) first (bounded: users × days), the fan-out is a
    constant 7, and everything downstream hash-partitions on day."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    days = ud.select("d").distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    cover = ud.select(
        "user_id", F.explode(F.expr("sequence(d, date_add(d, 6))")).alias("d")
    )
    wau = (
        cover.join(days, "d")
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        days.join(dau, "d")
        .join(wau, "d")
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias("stickiness"),
        )
        .orderBy("day")
    )


# ---------------------------------------------- 2.8 KS distribution drift

_KS_ORACLE = """
WITH target AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 101 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
),
s AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v FROM orders),
t AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v FROM target),
census AS (
  SELECT v, sum(c1) AS n1v, sum(c2) AS n2v
  FROM (SELECT v, 1 AS c1, 0 AS c2 FROM s UNION ALL SELECT v, 0, 1 FROM t)
  GROUP BY v
),
cum AS (
  SELECT v,
         sum(n1v) OVER (ORDER BY v) AS c1,
         sum(n2v) OVER (ORDER BY v) AS c2
  FROM census
),
tot AS (SELECT (SELECT count(*) FROM s) AS n1, (SELECT count(*) FROM t) AS n2),
d AS (
  SELECT v, abs(c1 * n2 - c2 * n1) AS numer
  FROM cum, tot
)
SELECT tot.n1 AS n_src, tot.n2 AS n_tgt,
       round(CAST((SELECT max(numer) FROM d) AS DOUBLE)
             / (CAST(tot.n1 AS DOUBLE) * tot.n2), 6) AS ks_stat,
       CAST((SELECT min(v) FROM d WHERE numer = (SELECT max(numer) FROM d)) AS BIGINT)
         AS argmax_cents
FROM tot
"""


@query("dq_ks_drift", "2.8 sync core", _KS_ORACLE)
def dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between source and
    target order totals — the distribution-level screen that catches value
    drift row counts and digests can't name. Exact by construction: D's
    numerator is max|c1·n2 − c2·n1| in pure int64 (no per-point float
    CDF), ONE final division.

    The scale pattern is the DISTRIBUTED PREFIX SUM: a global CDF needs a
    global cumulative order, but a single-partition window is the
    win_range_frame cliff. Instead values bucket into coarse cells, the
    per-cell totals (bounded: #cells rows) come to the driver once for
    cumulative offsets, and the within-cell cumsum runs as a window
    PARTITIONED BY CELL — full parallelism, identical result. That is how
    a 100 TB engine computes exact quantiles/CDFs without a global sort
    bottleneck."""
    from hdc_dataengineering_sqlsync_spark.operators.cdf import exact_global_cum
    from hdc_dataengineering_sqlsync_spark.plans.sync import _source, _target

    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    s = _source(spark, sf_dir).select(cents.alias("v"), F.lit(1).alias("c1"), F.lit(0).alias("c2"))
    t = _target(spark, sf_dir).select(cents.alias("v"), F.lit(0).alias("c1"), F.lit(1).alias("c2"))
    census = (
        s.unionAll(t)
        .groupBy("v")
        .agg(F.sum("c1").alias("n1v"), F.sum("c2").alias("n2v"))
    )
    cum, totals = exact_global_cum(census, "v", ("n1v", "n2v"))
    n1, n2 = totals["n1v"], totals["n2v"]
    d = cum.select("v", F.abs(F.col("n1v") * n2 - F.col("n2v") * n1).alias("numer"))
    top = d.orderBy(F.col("numer").desc(), "v").limit(1)
    return top.select(
        F.lit(n1).cast("long").alias("n_src"),
        F.lit(n2).cast("long").alias("n_tgt"),
        F.round(F.col("numer").cast("double") / (float(n1) * float(n2)), 6).alias("ks_stat"),
        F.col("v").alias("argmax_cents"),
    )


# ------------------------------------------ 2.10 sweep-line interval union

_INTERVAL_UNION_ORACLE = """
WITH pts AS (
  SELECT user_id, epoch_us(ts) AS t, 1 AS delta FROM events
  UNION ALL
  SELECT user_id, epoch_us(ts) + 300000000 AS t, -1 AS delta FROM events
),
sweep AS (
  SELECT user_id, t, delta,
         sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         lead(t) OVER (PARTITION BY user_id ORDER BY t, delta DESC) AS t_next
  FROM pts
)
SELECT user_id,
       CAST(sum(CASE WHEN cum > 0 THEN t_next - t ELSE 0 END) AS BIGINT) AS union_micros,
       CAST(count(*) / 2 AS BIGINT) AS n_intervals
FROM sweep GROUP BY user_id ORDER BY user_id
"""


@query("ts_interval_union_length", "2.10 streaming", _INTERVAL_UNION_ORACLE)
def ts_interval_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval union: each event opens a 5-minute activity
    interval; per user, the MERGED (overlap-collapsed) covered time — the
    primitive behind billing meters, SLA uptime, and session coverage.
    Classic sweep: ±1 endpoint deltas, running sum, covered time =
    Σ(t_next − t) while the counter is positive; +1 sorts before −1 at
    equal timestamps so touching intervals merge. All integer micros —
    exact. The window partitions PER USER (parallelism = #users); no
    global order anywhere."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("user_id", F.unix_micros("ts").alias("t0"))
    pts = ev.select("user_id", F.col("t0").alias("t"), F.lit(1).alias("delta")).unionAll(
        ev.select("user_id", (F.col("t0") + 300000000).alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("t"), F.col("delta").desc())
    sweep = pts.select(
        "user_id",
        "t",
        F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.lead("t").over(w).alias("t_next"),
    )
    return (
        sweep.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("cum") > 0, F.col("t_next") - F.col("t")).otherwise(F.lit(0))
            ).alias("union_micros"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
        )
        .orderBy("user_id")
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


# ------------------------------------------- 2.9 image patchify (ViT prep)

_TILES_ORACLE = """
WITH m AS (SELECT doc_id, 8 + (doc_id % 5) * 4 AS w, 6 + (doc_id % 3) * 4 AS h
           FROM documents WHERE doc_id % 5 = 0),
px AS (
  SELECT m.doc_id, m.w, m.h, xs.x // 2 AS px_, ys.y // 2 AS py,
         ((7 * m.doc_id + 3 * xs.x + 5 * ys.y) % 256
          + (11 * m.doc_id + xs.x + 2 * ys.y) % 256
          + (13 * m.doc_id + 2 * xs.x + ys.y) % 256) // 3 AS gray
  FROM m
  JOIN (SELECT unnest(range(0, 24)) AS x) xs ON xs.x < m.w
  JOIN (SELECT unnest(range(0, 14)) AS y) ys ON ys.y < m.h
),
patch AS (
  SELECT doc_id, w, h, px_, py, max(gray) - min(gray) AS contrast
  FROM px GROUP BY doc_id, w, h, px_, py
)
SELECT doc_id AS media_id,
       CAST((w // 2) * (h // 2) AS INT) AS n_patches,
       CAST(sum(contrast) AS BIGINT) AS sum_contrast,
       CAST(sum(CASE WHEN contrast < 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat
FROM patch GROUP BY doc_id, w, h ORDER BY media_id
"""


@query("multimodal_image_tiles", "2.9 llm-data", _TILES_ORACLE)
def multimodal_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patchify on the REAL BMP decode path: each synthesized
    image round-trips through actual bytes (encode_bmp → decode_image),
    splits into 2×2 pixel patches, and reports the per-image patch census
    (count, summed patch contrast = max−min of integer gray, flat-patch
    count) — the patch-extraction plumbing a vision-model pipeline runs
    before embedding, with the patch grid computed inside ONE mapInPandas
    stage (blobs never shuffle; only 4 scalars per image leave the
    partition). All-integer statistics, so the closed-form oracle is
    exact — any stride/flip/channel bug in the patch math mismatches."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from hdc_dataengineering_sqlsync_spark.plans.mediacodec import _synth_images

    docs = load(spark, sf_dir, "documents").where("doc_id % 5 = 0")
    media = _synth_images(docs)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_patches", T.IntegerType()),
            T.StructField("sum_contrast", T.LongType()),
            T.StructField("n_flat", T.LongType()),
        ]
    )

    def patchify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.multimodal import decode_image

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(payload).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                gray = px.sum(axis=2) // 3
                h2, w2 = h // 2, w // 2
                blocks = (
                    gray[: h2 * 2, : w2 * 2]
                    .reshape(h2, 2, w2, 2)
                    .transpose(0, 2, 1, 3)
                    .reshape(h2 * w2, 4)
                )
                contrast = blocks.max(axis=1) - blocks.min(axis=1)
                rows.append(
                    (int(mid), int(h2 * w2), int(contrast.sum()), int((contrast < 8).sum()))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.mapInPandas(patchify, schema=schema).orderBy("media_id")


# ------------------------------------------- 2.12 two-factor OLS (Cramer)


def _det3(a1, a2, a3, b1, b2, b3, c1, c2, c3) -> str:
    """3x3 determinant as an expression string over EXACT integer moment
    columns cast to double — the SAME string feeds Spark's F.expr and the
    DuckDB oracle, so the IEEE expression tree is identical by
    construction."""
    d = {k: f"CAST({v} AS DOUBLE)" for k, v in locals().items() if k != "d"}
    return (
        f"{d['a1']} * ({d['b2']} * {d['c3']} - {d['b3']} * {d['c2']})"
        f" - {d['a2']} * ({d['b1']} * {d['c3']} - {d['b3']} * {d['c1']})"
        f" + {d['a3']} * ({d['b1']} * {d['c2']} - {d['b2']} * {d['c1']})"
    )


_OLS_D = _det3("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
_OLS_NC = _det3("sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22")
_OLS_NA = _det3("n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22")
_OLS_NB = _det3("n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y")

_OLS_MOMENTS_SQL = """
  SELECT l_returnflag, count(*) AS n,
         sum(q) AS s1, sum(dp) AS s2, sum(q * q) AS s11,
         sum(dp * dp) AS s22, sum(q * dp) AS s12,
         sum(y) AS sy, sum(q * y) AS s1y, sum(dp * y) AS s2y
  FROM (
    SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS q,
           CAST(round(l_discount * 100, 0) AS BIGINT) AS dp,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
    FROM lineitem
  ) GROUP BY l_returnflag
"""

_OLS_ORACLE = f"""
WITH m AS ({_OLS_MOMENTS_SQL})
SELECT l_returnflag, n,
       round(({_OLS_NA}) / ({_OLS_D}), 2) AS coef_qty,
       round(({_OLS_NB}) / ({_OLS_D}), 2) AS coef_disc,
       round(({_OLS_NC}) / ({_OLS_D}), 2) AS intercept
FROM m ORDER BY l_returnflag
"""


@query("wl_ols_two_factor", "2.12 composite workloads", _OLS_ORACLE)
def wl_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS (price-cents ~ quantity + discount-pct + intercept)
    per returnflag, solved in closed form via Cramer's rule on the 3×3
    normal equations — multi-feature in-database regression with NO solver
    and NO iteration: ONE map-side-combinable aggregate collects the 9
    exact int64 moment sums, then the determinants run once per group in
    double — and the determinant EXPRESSION STRING is shared verbatim
    between the Spark plan and the oracle, so both engines evaluate the
    identical IEEE tree. The k-feature generalization is the same shape
    with a (k+1)² moment matrix — still one aggregate pass at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    dp = F.round(F.col("l_discount") * 100, 0).cast("long")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    m = (
        li.select("l_returnflag", q.alias("q"), dp.alias("dp"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").alias("s1"),
            F.sum("dp").alias("s2"),
            # second-moment products accumulate as DECIMAL(38,0): DuckDB
            # sum(BIGINT) promotes to HUGEINT but non-ANSI Spark sum(long)
            # silently wraps, and dp*y (~1e9/row) exhausts int64 headroom
            # near ~1e10 rows; first moments (sy ~1e7/row) keep int64 safe
            # to ~1e11 rows and stay long for the cheap path
            F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")).alias("s11"),
            F.sum((F.col("dp") * F.col("dp")).cast("decimal(38,0)")).alias("s22"),
            F.sum((F.col("q") * F.col("dp")).cast("decimal(38,0)")).alias("s12"),
            F.sum("y").alias("sy"),
            F.sum((F.col("q") * F.col("y")).cast("decimal(38,0)")).alias("s1y"),
            F.sum((F.col("dp") * F.col("y")).cast("decimal(38,0)")).alias("s2y"),
        )
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(F.expr(f"({_OLS_NA}) / ({_OLS_D})"), 2).alias("coef_qty"),
        F.round(F.expr(f"({_OLS_NB}) / ({_OLS_D})"), 2).alias("coef_disc"),
        F.round(F.expr(f"({_OLS_NC}) / ({_OLS_D})"), 2).alias("intercept"),
    ).orderBy("l_returnflag")


# --------------------------------------- 2.8 snapshot + CDC-catchup handoff

_HANDOFF_ORACLE = """
WITH final_state AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderdate < DATE '1996-07-01' AND o_orderkey % 7 = 0
              THEN (CAST(round(o_totalprice * 100, 0) AS BIGINT) * 11) // 10
              ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT) END AS cents
  FROM orders
  WHERE NOT (o_orderdate < DATE '1996-07-01' AND o_orderkey % 113 = 0)
)
SELECT o_orderstatus, count(*) AS n,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM final_state GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@query("sync_snapshot_cdc_handoff", "2.8 sync core", _HANDOFF_ORACLE)
def sync_snapshot_cdc_handoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full initial-sync lifecycle in one query: bulk SNAPSHOT load
    (orders before the cutover date, as of T0), then CDC CATCH-UP applied
    on top — updates (10% price bump on key%7 pre-cutover rows), deletes
    (key%113 pre-cutover rows), and inserts (everything at/after the
    cutover) — the handoff every snapshot-then-stream sync must get right.
    Spark applies the log MECHANICALLY (delete anti-join, update
    override-join, insert union — upserts win over snapshot images); the
    oracle states the expected final state DECLARATIVELY, so an op mis-
    ordered, double-applied, or dropped during handoff breaks the census.
    Each apply step is one keyed join against the (small) changeset — the
    sync_merge_apply machinery at lifecycle scope. Money rides EXACT
    integer cents; the 10% bump is ``(cents * 11) div 10`` — a
    ``round(x * 1.1, 2)`` formulation measurably diverges cross-engine on
    repr-tie doubles (FIXTURES.md hazard 3, re-confirmed building this
    qid)."""
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate", cents.alias("cents")
    )
    cut = F.lit("1996-07-01").cast("date")
    pre = F.col("o_orderdate") < cut
    snapshot = o.where(pre).select("o_orderkey", "o_orderstatus", "cents")
    deletes = o.where(pre & (F.col("o_orderkey") % 113 == 0)).select("o_orderkey")
    updates = o.where(pre & (F.col("o_orderkey") % 7 == 0)).select(
        "o_orderkey",
        "o_orderstatus",
        F.expr("(cents * 11) div 10").alias("cents"),
    )
    inserts = o.where(~pre).select("o_orderkey", "o_orderstatus", "cents")
    applied = (
        snapshot.join(deletes, "o_orderkey", "left_anti")
        .join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(updates.join(deletes, "o_orderkey", "left_anti"))
        .unionByName(inserts)
    )
    return (
        applied.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total_cents"))
        .orderBy("o_orderstatus")
    )


# ------------------------------------------------ 2.3 subtree rollup

_SUBTREE_ORACLE = """
WITH anc AS (
  SELECT c_custkey // CAST(power(10, j.j) AS BIGINT) AS node,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer, unnest(range(0, 7)) AS j(j)
  WHERE c_custkey // CAST(power(10, j.j) AS BIGINT) > 0
)
SELECT node, count(*) AS n_nodes, CAST(sum(cents) AS BIGINT) AS subtree_cents
FROM anc WHERE node < 1000
GROUP BY node ORDER BY node
"""


@query("hier_subtree_totals", "2.3 joins", _SUBTREE_ORACLE)
def hier_subtree_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree rollup over the parent(k) = k div 10 hierarchy (the
    hier_recursive_cte tree): every node's total balance over itself + all
    descendants — the BOM/org-chart aggregation. NOT a recursive walk:
    each row EXPLODES to its ≤7 ancestors (k div 10^j — constant fan-out =
    tree depth) and one keyed aggregate sums per ancestor; the same move
    that made wl_dau_wau_stickiness an equi-join. Reported for nodes
    < 1000 (depth ≤ 3 of the key space); exact integer cents."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents")
    )
    anc = c.select(
        F.explode(
            F.expr(
                "filter(transform(sequence(0, 6), "
                "j -> c_custkey div cast(power(10, j) as bigint)), v -> v > 0)"
            )
        ).alias("node"),
        "cents",
    )
    return (
        anc.where(F.col("node") < 1000)
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_nodes"), F.sum("cents").alias("subtree_cents"))
        .orderBy("node")
    )


# --------------------------------------------- Spark-4 SQL surface

_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("sql_pipe_syntax", "2.4 aggregations", _PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4's `|>` operator chaining — the linear
    query-authoring surface): the revenue rollup written as
    FROM → |> WHERE → |> AGGREGATE → |> ORDER BY. Parsing is the only
    novelty — the pipeline lowers to the SAME Catalyst plan as the
    classic SELECT (pushdown, partial aggregation, codegen all apply),
    which the hash-identical oracle proves."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |> AGGREGATE count(*) AS n,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n, revenue
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


_SQLVAR_ORACLE = """
SELECT o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
WHERE o_totalprice >= 150000 AND o_orderdate < DATE '1996-07-01'
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("sql_session_variables", "2.2 projection/filter", _SQLVAR_ORACLE)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables + IDENTIFIER() (Spark 4): thresholds arrive
    via DECLARE/SET VARIABLE and the table name via IDENTIFIER(var) — the
    parameterized-query surface that replaces string-splicing in sync job
    templates (injection-safe, plan-cache friendly: the variable is a
    literal at plan time, so pushdown still reaches the scan). The oracle
    inlines the same constants."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql("DECLARE OR REPLACE VARIABLE min_total DOUBLE DEFAULT 0.0")
    spark.sql("DECLARE OR REPLACE VARIABLE cutoff DATE DEFAULT DATE '1999-01-01'")
    spark.sql("DECLARE OR REPLACE VARIABLE tbl STRING DEFAULT 'orders_v'")
    spark.sql("SET VARIABLE min_total = 150000")
    spark.sql("SET VARIABLE cutoff = DATE '1996-07-01'")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM IDENTIFIER(tbl)
        WHERE o_totalprice >= min_total AND o_orderdate < cutoff
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


# ----------------------------------------------------- 2.8 PSI drift

_PSI_ORACLE = """
WITH target AS (
  SELECT o_totalprice FROM orders WHERE o_orderkey % 97 <> 0
),
sb AS (
  SELECT least(CAST(round(o_totalprice * 100, 0) AS BIGINT) // 5000000, 9) AS bin,
         count(*) AS n
  FROM orders GROUP BY bin
),
tb AS (
  SELECT least(CAST(round(o_totalprice * 100, 0) AS BIGINT) // 5000000, 9) AS bin,
         count(*) AS n
  FROM target GROUP BY bin
),
tot AS (SELECT (SELECT count(*) FROM orders) AS ns, (SELECT count(*) FROM target) AS nt),
bins AS (SELECT unnest(range(0, 10)) AS bin)
SELECT b.bin,
       CAST(coalesce(sb.n, 0) AS BIGINT) AS n_src,
       CAST(coalesce(tb.n, 0) AS BIGINT) AS n_tgt,
       round((CAST(coalesce(sb.n, 0) + 1 AS DOUBLE) / (ns + 10)
              - CAST(coalesce(tb.n, 0) + 1 AS DOUBLE) / (nt + 10))
             * ln((CAST(coalesce(sb.n, 0) + 1 AS DOUBLE) / (ns + 10))
                  / (CAST(coalesce(tb.n, 0) + 1 AS DOUBLE) / (nt + 10))), 6)
         AS psi_contrib
FROM bins b LEFT JOIN sb ON sb.bin = b.bin LEFT JOIN tb ON tb.bin = b.bin, tot
ORDER BY b.bin
"""


@query("dq_psi_drift", "2.8 sync core", _PSI_ORACLE)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per bin — the ML-ops drift metric that
    complements dq_ks_drift: KS finds the single worst CDF gap, PSI scores
    WHERE the mass moved, bin by bin (Σ(p−q)·ln(p/q); > 0.2 = retrain
    alarm). Fixed $50k-wide cent bins capped at 10; add-one smoothing
    keeps empty bins finite AND exact (shares are identical rationals in
    both engines, one ln each). ONE lazy plan like its census siblings
    (dq_benford_firstdigit): one aggregate scan per side to ≤10 bin rows,
    side totals via an unpartitioned window over those ≤20 rows (every
    source row lands in a bin, so no second count() scan and no driver
    round-trip), literal bin lattice left-joined so empty bins appear.
    Scale: volume-immune — only the 10-row censuses ever shuffle."""
    from pyspark.sql import Window

    from hdc_dataengineering_sqlsync_spark.plans.sync import _source, _target

    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    bin_ = F.least(F.expr("cents div 5000000"), F.lit(9)).alias("bin")

    def census(df: DataFrame, out: str) -> DataFrame:
        agg = df.select(cents.alias("cents")).groupBy(bin_).agg(F.count(F.lit(1)).alias(out))
        # total = sum over the <=10 bin rows; the single-partition window
        # is over the REDUCED census, never the raw table
        return agg.withColumn("tot_" + out, F.sum(out).over(Window.partitionBy()))

    lattice = spark.range(10).select(F.col("id").cast("long").alias("bin"))
    j = (
        lattice.join(census(_source(spark, sf_dir), "n_src"), "bin", "left")
        .join(census(_target(spark, sf_dir), "n_tgt"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_src", F.lit(0)).alias("n_src"),
            F.coalesce("n_tgt", F.lit(0)).alias("n_tgt"),
            F.coalesce(
                F.first("tot_n_src", ignorenulls=True).over(Window.partitionBy()), F.lit(0)
            ).alias("ns"),
            F.coalesce(
                F.first("tot_n_tgt", ignorenulls=True).over(Window.partitionBy()), F.lit(0)
            ).alias("nt"),
        )
    )
    p = (F.col("n_src") + 1).cast("double") / (F.col("ns") + 10)
    q = (F.col("n_tgt") + 1).cast("double") / (F.col("nt") + 10)
    return j.select(
        "bin", "n_src", "n_tgt", F.round((p - q) * F.log(p / q), 6).alias("psi_contrib")
    ).orderBy("bin")


# ------------------------------------- 2.4 exact distributed deciles

_DECILES_ORACLE = """
WITH census AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v, count(*) AS n
  FROM orders GROUP BY v
),
cum AS (
  SELECT v, sum(n) OVER (ORDER BY v) AS c,
         (SELECT sum(n) FROM census) AS tot
  FROM census
),
d AS (SELECT unnest(range(1, 10)) AS decile)
SELECT CAST(d.decile AS INT) AS decile,
       CAST((SELECT min(v) FROM cum
             WHERE c >= (d.decile * tot + 9) // 10) AS BIGINT)
         AS value_cents
FROM d, (SELECT DISTINCT tot FROM cum) t
ORDER BY decile
"""


@query("agg_deciles_distributed", "2.4 aggregations", _DECILES_ORACLE)
def agg_deciles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global deciles of order totals WITHOUT a global sort — the
    production answer to 'exact percentiles at 100 TB': the dq_ks_drift
    distributed prefix-sum (value census → coarse cells → driver offsets,
    bounded by #cells → per-cell cumsum windows) yields every distinct
    value's exact global rank in parallel; decile d = smallest value whose
    cumulative count reaches ceil(d·n/10) (type-1/disc quantile). Integer
    cents end to end — no interpolation convention to drift."""
    from hdc_dataengineering_sqlsync_spark.operators.cdf import exact_global_cum

    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    census = (
        load(spark, sf_dir, "orders")
        .select(cents.alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cum_df, totals = exact_global_cum(census, "v", ("n",))
    cum = cum_df.select("v", F.col("n").alias("c"))
    tot = totals["n"]
    # pure-integer ceil: d*tot/10 via float is inexact past 2^53
    targets = [(d, (d * tot + 9) // 10) for d in range(1, 10)]
    tdf = spark.createDataFrame(targets, "decile int, target long")
    return (
        cum.join(F.broadcast(tdf), F.col("c") >= F.col("target"))
        .groupBy("decile")
        .agg(F.min("v").alias("value_cents"))
        .orderBy("decile")
    )


# --------------------------------------- 2.9 audio energy segmentation

_AUDIO_SEG_ORACLE = """
WITH m AS (SELECT doc_id, 64 + (doc_id % 7) * 16 AS n FROM documents WHERE doc_id % 5 = 0),
s AS (
  SELECT m.doc_id, i.i // 32 AS frame,
         ((31 * m.doc_id + 17 * i.i) % 65536) - 32768 AS v
  FROM m JOIN (SELECT unnest(range(0, 160)) AS i) i ON i.i < m.n
),
fr AS (
  SELECT doc_id, frame, sum(v * v) AS energy
  FROM s GROUP BY doc_id, frame
),
flag AS (
  SELECT doc_id, frame, CASE WHEN energy > 11000000000 THEN 1 ELSE 0 END AS active
  FROM fr
),
isl AS (
  SELECT doc_id, active,
         frame - row_number() OVER (PARTITION BY doc_id, active ORDER BY frame) AS grp
  FROM flag
),
seg AS (
  SELECT doc_id, count(*) AS seg_len
  FROM isl WHERE active = 1 GROUP BY doc_id, grp
)
SELECT f.doc_id AS media_id,
       CAST(count(*) AS INT) AS n_frames,
       CAST(sum(f.active) AS INT) AS n_active,
       CAST(coalesce((SELECT count(*) FROM seg WHERE seg.doc_id = f.doc_id), 0) AS INT)
         AS n_segments,
       CAST(coalesce((SELECT max(seg_len) FROM seg WHERE seg.doc_id = f.doc_id), 0) AS INT)
         AS longest_segment
FROM flag f GROUP BY f.doc_id ORDER BY media_id
"""


@query("multimodal_audio_segments", "2.9 llm-data", _AUDIO_SEG_ORACLE)
def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-based audio activity segmentation (the VAD shape) on the
    REAL WAV decode path: payloads round-trip through actual RIFF bytes,
    split into 32-sample frames (tail kept), frame energy = Σs² (exact
    int64), frames over the threshold form segments via blob-local
    gaps-and-islands — all inside ONE mapInPandas stage per audio, so the
    1000-executor version never shuffles a sample, only the 4-scalar
    per-media census. The closed-form oracle recomputes frame energies
    and islands relationally without touching the bytes — any PCM width,
    endianness, or framing bug mismatches."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from hdc_dataengineering_sqlsync_spark.plans.mediacodec import _synth_audio

    docs = load(spark, sf_dir, "documents").where("doc_id % 5 = 0")
    media = _synth_audio(docs)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("n_active", T.IntegerType()),
            T.StructField("n_segments", T.IntegerType()),
            T.StructField("longest_segment", T.IntegerType()),
        ]
    )

    def segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import decode_wav

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, samples = decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                n_frames = (len(s) + 31) // 32
                energies = np.array(
                    [int((s[j * 32 : (j + 1) * 32] ** 2).sum()) for j in range(n_frames)]
                )
                active = energies > 11_000_000_000
                n_active = int(active.sum())
                # blob-local islands: runs of consecutive True
                runs, cur = [], 0
                for a in active:
                    if a:
                        cur += 1
                    elif cur:
                        runs.append(cur)
                        cur = 0
                if cur:
                    runs.append(cur)
                rows.append(
                    (int(mid), n_frames, n_active, len(runs), max(runs) if runs else 0)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.mapInPandas(segment, schema=schema).orderBy("media_id")


# ------------------------------------ 2.12 association rules + degree law

_LIFT_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT count(DISTINCT o) AS n_orders FROM op),
c AS (SELECT p, count(*) AS cnt FROM op GROUP BY p),
pairs AS (
  SELECT a.p AS p1, b.p AS p2, count(*) AS c12
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
),
top AS (
  SELECT p1, p2, c12 FROM pairs ORDER BY c12 DESC, p1, p2 LIMIT 20
)
SELECT t.p1, t.p2, CAST(t.c12 AS BIGINT) AS c12,
       round(CAST(t.c12 AS DOUBLE) / c1.cnt, 4) AS conf_1_to_2,
       round(CAST(t.c12 AS DOUBLE) / c2.cnt, 4) AS conf_2_to_1,
       round(CAST(t.c12 AS DOUBLE) * n.n_orders / (CAST(c1.cnt AS DOUBLE) * c2.cnt), 4)
         AS lift
FROM top t JOIN c c1 ON c1.p = t.p1 JOIN c c2 ON c2.p = t.p2, n
ORDER BY c12 DESC, p1, p2
"""


@query("wl_basket_lift", "2.12 composite workloads", _LIFT_ORACLE)
def wl_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the top-20 co-purchased pairs: confidence in
    both directions and lift (`c12·N / (c1·c2)` — >1 means genuinely
    associated, not just popular) — the metric layer wl_basket_pairs
    feeds. All counts exact integers (distinct-order support), three
    rounded divisions at the end; the per-part support table is tiny and
    broadcast back onto the pair list. Same basket-bounded self-join as
    the pair mining — nothing corpus-quadratic."""
    li = load(spark, sf_dir, "lineitem")
    op = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    op = op.localCheckpoint()  # pairs + supports + order count share it
    n_orders = op.select("o").distinct().count()
    c = op.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = op.alias("a"), op.alias("b")
    top = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("c12"))
        .orderBy(F.col("c12").desc(), "p1", "p2")
        .limit(20)
    )
    c1 = c.select(F.col("p").alias("p1"), F.col("cnt").alias("cnt1"))
    c2 = c.select(F.col("p").alias("p2"), F.col("cnt").alias("cnt2"))
    return (
        top.join(F.broadcast(c1), "p1")
        .join(F.broadcast(c2), "p2")
        .select(
            "p1",
            "p2",
            "c12",
            F.round(F.col("c12").cast("double") / F.col("cnt1"), 4).alias("conf_1_to_2"),
            F.round(F.col("c12").cast("double") / F.col("cnt2"), 4).alias("conf_2_to_1"),
            F.round(
                F.col("c12").cast("double") * n_orders
                / (F.col("cnt1").cast("double") * F.col("cnt2")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.col("c12").desc(), "p1", "p2")
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
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("p1", "p2")
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


# ----------------------------------------- 2.4 Lorenz curve (decile points)

_LORENZ_ORACLE = """
WITH spend AS (
  SELECT o_custkey, sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
census AS (SELECT cents AS v, count(*) AS n, sum(cents) AS w FROM spend GROUP BY cents),
cum AS (
  SELECT v,
         sum(n) OVER (ORDER BY v) AS c,
         sum(w) OVER (ORDER BY v) AS cw,
         (SELECT sum(n) FROM census) AS tot,
         (SELECT sum(w) FROM census) AS totw
  FROM census
),
d AS (SELECT unnest(range(1, 10)) AS decile)
SELECT CAST(d.decile AS INT) AS decile,
       round(CAST(k.c AS DOUBLE) / k.tot, 4) AS pop_share,
       round(CAST(k.cw AS DOUBLE) / k.totw, 4) AS spend_share
FROM d, LATERAL (
  SELECT c, cw, tot, totw FROM cum
  WHERE c >= (d.decile * tot + 9) // 10
  ORDER BY v LIMIT 1
) k
ORDER BY decile
"""


@query("agg_lorenz_curve", "2.4 aggregations", _LORENZ_ORACLE)
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer spend at the 9 decile cuts — the
    concentration picture agg_gini_segment summarizes to one number:
    at the smallest spend value covering ≥ d/10 of customers, what share
    of total spend do they hold? Built on operators/cdf.py's distributed
    prefix-sum cumulating TWO measures in one pass (customer count AND
    spend cents — the multi-measure case the operator exists for), so the
    whole curve costs one census + one bounded driver offset pass; all
    cumulative values exact int64, two rounded divisions per point."""
    from hdc_dataengineering_sqlsync_spark.operators.cdf import exact_global_cum

    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    spend = (
        load(spark, sf_dir, "orders")
        .select("o_custkey", cents.alias("cents"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    census = spend.groupBy(F.col("cents").alias("v")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("w")
    )
    cum, totals = exact_global_cum(census, "v", ("n", "w"))
    tot, totw = totals["n"], totals["w"]
    targets = [(d, (d * tot + 9) // 10) for d in range(1, 10)]
    tdf = spark.createDataFrame(targets, "decile int, target long")
    # per decile: the FIRST value reaching the population target
    first = (
        cum.join(F.broadcast(tdf), F.col("n") >= F.col("target"))
        .groupBy("decile")
        .agg(F.min(F.struct(F.col("v"), F.col("n"), F.col("w"))).alias("k"))
    )
    return first.select(
        "decile",
        F.round(F.col("k.n").cast("double") / F.lit(float(tot)), 4).alias("pop_share"),
        F.round(F.col("k.w").cast("double") / F.lit(float(totw)), 4).alias("spend_share"),
    ).orderBy("decile")


# -------------------------------------- 2.12 concentration + repurchase

_HHI_ORACLE = """
WITH rev AS (
  SELECT n.n_name AS nation, l.l_suppkey AS s,
         sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS cents
  FROM lineitem l
  JOIN supplier su ON su.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = su.s_nationkey
  GROUP BY 1, 2
),
tot AS (SELECT nation, sum(cents) AS t, count(*) AS n_suppliers FROM rev GROUP BY nation)
SELECT r.nation, CAST(max(t2.n_suppliers) AS BIGINT) AS n_suppliers,
       round(sum((CAST(r.cents AS DOUBLE) / max_t.t) * (CAST(r.cents AS DOUBLE) / max_t.t))
             * 10000, 2) AS hhi
FROM rev r
JOIN (SELECT nation, t FROM tot) max_t ON max_t.nation = r.nation
JOIN (SELECT nation, n_suppliers FROM tot) t2 ON t2.nation = r.nation
GROUP BY r.nation ORDER BY r.nation
"""


@query("wl_supplier_hhi", "2.12 composite workloads", _HHI_ORACLE)
def wl_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market-concentration index per nation: Σ of
    squared supplier revenue shares ×10000 (the antitrust 2500 threshold
    scale) — the concentration screen a marketplace/sourcing pipeline runs
    per region. Revenue reduces to exact int64 cents per (nation,
    supplier) FIRST (one keyed agg), shares and their squares compute once
    over that tiny table (≤ #suppliers rows), identical double expression
    in both engines, one rounded output."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    rev = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n), su.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("l_suppkey").alias("s"))
        .agg(F.sum(cents).alias("cents"))
    )
    from pyspark.sql import Window

    wp = Window.partitionBy("nation")
    share = F.col("cents").cast("double") / F.sum("cents").over(wp)
    return (
        rev.select("nation", share.alias("share"))
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(F.col("share") * F.col("share")) * 10000, 2).alias("hhi"),
        )
        .orderBy("nation")
    )


_GAP_ORACLE = """
WITH seq AS (
  SELECT c.c_mktsegment AS segment,
         date_diff('day',
                   lag(o.o_orderdate)
                     OVER (PARTITION BY o.o_custkey ORDER BY o.o_orderdate, o.o_orderkey),
                   o.o_orderdate) AS gap
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
)
SELECT segment, count(gap) AS n_gaps,
       round(CAST(sum(gap) AS DOUBLE) / count(gap), 2) AS avg_gap_days,
       CAST(max(gap) AS INT) AS max_gap_days
FROM seq GROUP BY segment ORDER BY segment
"""


@query("wl_interpurchase_gap", "2.12 composite workloads", _GAP_ORACLE)
def wl_interpurchase_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase gap analytics per market segment — the repurchase-
    cadence metric behind churn models: per customer, days between
    consecutive orders (lag window keyed (date, orderkey) for total
    order), rolled up to segment count / exact-integer average / max.
    Windows partition per customer (parallelism = #customers); the rollup
    is one keyed agg over integer day gaps — order-free and engine-exact,
    one final division."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap"),
        )
    )
    return (
        seq.groupBy("segment")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.round(F.sum("gap").cast("double") / F.count("gap"), 2).alias("avg_gap_days"),
            F.max("gap").cast("int").alias("max_gap_days"),
        )
        .orderBy("segment")
    )
