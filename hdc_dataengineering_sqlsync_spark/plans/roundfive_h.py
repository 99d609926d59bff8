"""SURVEY.md §2 round-5 additions, batch Q.

Transitive-closure by iterative doubling, exact XYZ demand-variability
classification, and the Arrow-batch Python data source. Registered after
``roundfive_g`` (plans/__init__.py) so the qids append to the END of the
never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------------- 2.3 joins: ancestor closure via iterative doubling

_CLOSURE_ORACLE = """
WITH RECURSIVE anc(child, anc, dist) AS (
  SELECT c_custkey, c_custkey // 10, 1 FROM customer WHERE c_custkey >= 10
  UNION ALL
  -- the recursive hop goes THROUGH a materialized vertex: the closure is
  -- over edges whose intermediate endpoint exists as a customer row —
  -- exactly what the doubling self-join traverses (a purely arithmetic
  -- walk would silently diverge on any fixture with key gaps)
  SELECT a.child, c.c_custkey // 10, a.dist + 1
  FROM anc a JOIN customer c ON c.c_custkey = a.anc
  WHERE a.anc >= 10
)
SELECT CAST(dist AS BIGINT) AS dist,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(child) AS BIGINT) AS min_child,
       CAST(MAX(child) AS BIGINT) AS max_child,
       CAST(COUNT(DISTINCT anc) AS BIGINT) AS n_ancestors
FROM anc GROUP BY dist ORDER BY dist
"""


@query("hier_closure_doubling", "2.3 joins", _CLOSURE_ORACLE)
def hier_closure_doubling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ancestor-closure table built by ITERATIVE DOUBLING.

    The closure (every (descendant, ancestor, distance) pair) is the
    artifact hierarchy-heavy sync targets materialize so subtree queries
    become single equi-joins. `hier_recursive_cte` walks the same
    synthetic parent(k) = k DIV 10 tree LINEARLY (one join per level);
    doubling instead self-joins the closure with itself — after round i
    it holds every path of length <= 2^i, so a depth-D hierarchy closes
    in ceil(log2 D) shuffles instead of D. Three rounds cover depth 8:
    custkey digits bound the depth (sf100 ~ 1.5e7 keys, depth 7).

    In a TREE each (child, ancestor) pair has exactly one path, so the
    doubling join itself never duplicates a pair — only the carry-over
    union re-emits earlier rounds' short paths, and one distinct per
    round removes them. Closure semantics: paths traverse MATERIALIZED
    vertices (each intermediate ancestor must exist as a customer row —
    what the self-join inherently requires); the oracle's recursive hop
    joins customer for the same rule, so key-gapped fixtures agree.

    Scale shape: each round is ONE self-equi-join on (anc = child) plus
    a distinct — both hash-partitioned on the join key; localCheckpoint
    truncates lineage so round i's plan does not re-execute rounds
    0..i-1. The census is a tiny keyed rollup over the distance column."""
    base = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_custkey") >= 10)
        .select(
            F.col("c_custkey").alias("child"),
            F.col("c_custkey").cast("long").alias("_k"),
        )
        .select("child", F.expr("_k div 10").alias("anc"), F.lit(1).alias("dist"))
    )
    closure = base.localCheckpoint(eager=True)
    for _ in range(3):  # paths of length <= 8 — depth bound through sf100
        a = closure.select(
            F.col("child"), F.col("anc").alias("_mid"), F.col("dist").alias("_d1")
        )
        b = closure.select(
            F.col("child").alias("_mid"), F.col("anc"), F.col("dist").alias("_d2")
        )
        extended = a.join(b, "_mid").select(
            "child", "anc", (F.col("_d1") + F.col("_d2")).alias("dist")
        )
        closure = (
            closure.unionByName(extended).distinct().localCheckpoint(eager=True)
        )
    return (
        closure.groupBy(F.col("dist").cast("long").alias("dist"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("child").alias("min_child"),
            F.max("child").alias("max_child"),
            F.countDistinct("anc").alias("n_ancestors"),
        )
        .orderBy("dist")
    )


# ------------- 2.12 workloads: XYZ demand-variability classification

# Exact-integer class predicate: CV^2 = (n*Sxx - Sx^2) / Sx^2 compared to
# 1/4 and 1 by cross-multiplication — no division, no floats, no
# repr-tie hazards.  X: CV^2 < 1/4, Y: 1/4 <= CV^2 < 1, Z: >= 1.
_XYZ_CLASS = (
    "CASE WHEN 4 * (n * sxx - sx * sx) < sx * sx THEN 'X'"
    " WHEN (n * sxx - sx * sx) < sx * sx THEN 'Y'"
    " ELSE 'Z' END"
)

_XYZ_ORACLE = f"""
WITH pm AS (
  SELECT l_partkey,
         year(l_shipdate) * 12 + month(l_shipdate) AS mo,
         SUM(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem GROUP BY l_partkey, mo
),
moments AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(q) AS HUGEINT) AS sx,
         CAST(SUM(CAST(q AS HUGEINT) * q) AS HUGEINT) AS sxx
  FROM pm GROUP BY l_partkey
),
classed AS (SELECT l_partkey, sx, {_XYZ_CLASS} AS xyz FROM moments)
SELECT xyz,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(sx) AS BIGINT) AS total_qty
FROM classed GROUP BY xyz ORDER BY xyz
"""


@query("wl_xyz_variability", "2.12 composite workloads", _XYZ_ORACLE)
def wl_xyz_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classes, exact-integer classification.

    The companion axis to `wl_abc_pareto` in ABC/XYZ inventory planning:
    parts whose monthly demand is steady (X, CV < 0.5) can run lean
    safety stock; erratic parts (Z, CV >= 1) cannot. The class predicate
    compares CV^2 = (n*Σq² - (Σq)²)/(Σq)² against 1/4 and 1 by integer
    CROSS-MULTIPLICATION — no division ever happens, so the boundary
    cases that would differ in float land are exact in both engines
    (quantities are integer-valued; second moments ride DECIMAL(38,0)/
    HUGEINT per the corr/OLS discipline).

    Scale shape: facts collapse to the (part, month) grain map-side
    first; the moment pass is a second keyed agg on the reduced table;
    the census is 3 rows. Both aggregates partial-combine — nothing
    beyond the (part)-keyed shuffle moves."""
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pm = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            "l_partkey",
            (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("mo"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    moments = pm.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("q")).alias("sx"),
        F.sum(dec("q") * F.col("q")).alias("sxx"),
    )
    classed = moments.select("l_partkey", "sx", F.expr(_XYZ_CLASS).alias("xyz"))
    return (
        classed.groupBy("xyz")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("sx").cast("long").alias("total_qty"),
        )
        .orderBy("xyz")
    )


# ---------------- 2.1 scans: Arrow-batch Python data source

_ARROW_SRC_ORACLE = """
WITH g AS (SELECT unnest(range(0, 20000)) AS i)
SELECT CAST(i % 8 AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM((i * 73) % 10000) AS BIGINT) AS total_cents
FROM g GROUP BY bucket ORDER BY bucket
"""


@query("pyds_arrow_source", "2.1 scans", _ARROW_SRC_ORACLE)
def pyds_arrow_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python data source emitting Arrow RecordBatches (PySpark 4.1).

    The columnar fast path for pure-Python connectors: `read()` yields
    `pyarrow.RecordBatch` objects, so rows cross the Python->JVM
    boundary as Arrow buffers — one (de)serialization per BATCH instead
    of per row, and no per-row Python tuple objects are ever built. Same
    extensibility contract as `pyds_custom_source` (planned
    InputPartitions, executor-side generation), different wire shape;
    closed-form values so the oracle recomputes from range().

    Scale shape: one contiguous range slice -> one columnar batch per
    partition; partitions are independent, so read parallelism is the
    partition count. For a real transport (REST page, kafka chunk,
    scientific format) this is the difference between a Python-loop
    source and one that saturates the link."""
    from hdc_dataengineering_sqlsync_spark.sources.pydatasource import (
        register_arrow,
    )

    register_arrow(spark)
    df = (
        spark.read.format("synthetic_arrow")
        .option("rows", 20000)
        .option("partitions", 8)
        .load()
    )
    return (
        df.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total_cents"),
        )
        .orderBy("bucket")
    )
