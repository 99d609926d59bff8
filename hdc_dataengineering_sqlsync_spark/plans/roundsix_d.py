"""SURVEY.md §2 round-6 batch D: exact-integer HITS and a change-version
continuity audit.

HITS runs UNNORMALIZED for a fixed two iterations so every hub/authority
score is an exact integer (normalization is a presentation step — rankings
are normalization-invariant per iteration); the sequence audit is the
pre-flight check a change-tracking sync runs before trusting an
incremental pull.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------------------------ 2.12 workloads: HITS (2 exact iterations)

_HITS_ORACLE = """
WITH edges AS (
  SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
a1 AS (SELECT c, count(*) AS a1 FROM edges GROUP BY c),
h1 AS (
  SELECT e.s, CAST(sum(a1.a1) AS BIGINT) AS h1
  FROM edges e JOIN a1 ON e.c = a1.c GROUP BY e.s
),
a2 AS (
  SELECT e.c, CAST(sum(h1.h1) AS BIGINT) AS a2
  FROM edges e JOIN h1 ON e.s = h1.s GROUP BY e.c
)
SELECT a2.c AS custkey, a1.a1 AS degree, a2.a2 AS authority2
FROM a2 JOIN a1 ON a2.c = a1.c
ORDER BY a2.a2 DESC, a2.c LIMIT 10
"""


@query("graph_hits_authorities", "2.12 composite workloads", _HITS_ORACLE)
def graph_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities over the supplier→customer trade graph,
    TWO exact iterations: a₁ = in-degree, h₁ = Σ a₁ over a supplier's
    customers, a₂ = Σ h₁ over a customer's suppliers — run UNNORMALIZED so
    every score is an exact int64 (per-iteration rankings are invariant
    to the normalization constant, which is the only float in textbook
    HITS; cross-engine float normalization would be an order-dependent
    sum per node). Top-10 authorities with full (score DESC, key)
    tiebreak. Scale: each iteration is one keyed equi-join + one
    map-side-combinable sum over the distinct edge list — the same
    relational-Pregel shape as graph_pagerank, fan-out bounded by node
    degree, no cartesian step; at 100 TB the edge list is the one big
    table and it shuffles once per iteration on alternating keys."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    a1 = edges.groupBy("c").agg(F.count(F.lit(1)).alias("a1"))
    h1 = (
        edges.join(a1, "c")
        .groupBy("s")
        .agg(F.sum("a1").alias("h1"))
    )
    a2 = (
        edges.join(h1, "s")
        .groupBy("c")
        .agg(F.sum("h1").alias("a2"))
    )
    return (
        a2.join(a1, "c")
        .select(F.col("c").alias("custkey"), F.col("a1").alias("degree"), F.col("a2").alias("authority2"))
        .orderBy(F.col("authority2").desc(), "custkey")
        .limit(10)
    )


# --------------------- 2.8 sync core: change-version sequence continuity

_SEQGAP_ORACLE = """
WITH seq AS (
  SELECT o_orderkey AS v FROM orders
),
stats AS (
  SELECT count(*) AS n_rows,
         count(DISTINCT v) AS n_distinct,
         min(v) AS lo, max(v) AS hi
  FROM seq
),
gaps AS (
  SELECT count(*) AS n_gaps,
         CAST(coalesce(sum(nxt - v - 1), 0) AS BIGINT) AS missing_total
  FROM (
    SELECT v, lead(v) OVER (ORDER BY v) AS nxt
    FROM (SELECT DISTINCT v FROM seq)
  )
  WHERE nxt IS NOT NULL AND nxt > v + 1
)
SELECT CAST(s.n_rows AS BIGINT) AS n_rows,
       CAST(s.n_distinct AS BIGINT) AS n_distinct,
       CAST(s.n_rows - s.n_distinct AS BIGINT) AS n_duplicates,
       CAST(s.lo AS BIGINT) AS lo, CAST(s.hi AS BIGINT) AS hi,
       CAST(s.hi - s.lo + 1 - s.n_distinct AS BIGINT) AS missing_in_range,
       CAST(g.n_gaps AS BIGINT) AS n_gap_runs,
       g.missing_total
FROM stats s, gaps g
"""


@query("sync_sequence_gap_audit", "2.8 sync core", _SEQGAP_ORACLE)
def sync_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-version continuity audit — the pre-flight a change-tracking
    sync runs before trusting an incremental pull: duplicates (a version
    must be unique), the missing-in-range total (hi−lo+1−distinct — ONE
    aggregate, no window needed for the headline number), and the gap-RUN
    census (count + total width via a lead() over the distinct versions)
    that distinguishes 'one big truncation hole' from 'scattered single
    losses'. All exact integers. Scale: the headline stats are one
    map-side-combinable aggregate; the gap census sorts only DISTINCT
    versions — and a real deployment windows it per version-epoch
    partition, so no single-partition global sort grows unbounded (at
    this grain Spark runs one window partition; the per-epoch key is the
    documented 100 TB form)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("v"))
    stats = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("v").alias("n_distinct"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    dv = o.distinct()
    nxt = F.lead("v").over(Window.orderBy("v"))
    runs = dv.select("v", nxt.alias("nxt")).where(
        F.col("nxt").isNotNull() & (F.col("nxt") > F.col("v") + 1)
    )
    gaps = runs.agg(
        F.count(F.lit(1)).alias("n_gap_runs"),
        F.coalesce(F.sum(F.col("nxt") - F.col("v") - 1), F.lit(0)).alias("missing_total"),
    )
    return stats.crossJoin(F.broadcast(gaps)).select(
        "n_rows",
        "n_distinct",
        (F.col("n_rows") - F.col("n_distinct")).alias("n_duplicates"),
        "lo",
        "hi",
        (F.col("hi") - F.col("lo") + 1 - F.col("n_distinct")).alias("missing_in_range"),
        F.col("n_gap_runs").cast("long").alias("n_gap_runs"),
        F.col("missing_total").cast("long").alias("missing_total"),
    )


# ---------------- 2.4 aggregations: KMV bottom-k sketch with set algebra

# k chosen small enough that the sketch is broadcastable state and the
# estimate error (~1/sqrt(k) ≈ 6%) is visible against true_distinct in the
# output; hash = first 12 md5 nibbles (48 bits) — int64-exact on both
# engines, and P(collision) over ~1e5 keys is negligible at 2^48.
_KMV_K = 256
_KMV_HASH_NIBBLES = 12
_KMV_SPACE = float(1 << (4 * _KMV_HASH_NIBBLES))

# estimate = (k-1) / (h_k / 2^48) — ONE shared IEEE string over the exact
# integer k-th minimum hash h_k
_KMV_EST_EXPR = f"({_KMV_K} - 1) * {_KMV_SPACE} / CAST(hk AS DOUBLE)"


def _kmv_oracle() -> str:
    from hdc_dataengineering_sqlsync_spark.plans.catalog import duck_md5_int

    h = duck_md5_int("CAST(k AS VARCHAR)", _KMV_HASH_NIBBLES)
    return f"""
WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders),
b AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 0),
ha AS (SELECT {h} AS h FROM a ORDER BY h LIMIT {_KMV_K}),
hb AS (SELECT {h} AS h FROM b ORDER BY h LIMIT {_KMV_K}),
hu AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
       ORDER BY h LIMIT {_KMV_K}),
est AS (
  SELECT (SELECT max(h) FROM ha) AS hk_a,
         (SELECT max(h) FROM hb) AS hk_b,
         (SELECT max(h) FROM hu) AS hk_u,
         (SELECT count(*) FROM hu JOIN ha USING (h) JOIN hb USING (h))
           AS shared_in_union
),
truth AS (
  SELECT (SELECT count(*) FROM a) AS true_a,
         (SELECT count(*) FROM b) AS true_b,
         (SELECT count(*) FROM (SELECT k FROM a INTERSECT SELECT k FROM b))
           AS true_inter
)
SELECT CAST(true_a AS BIGINT) AS true_a, CAST(true_b AS BIGINT) AS true_b,
       CAST(true_inter AS BIGINT) AS true_inter,
       CAST(hk_u AS BIGINT) AS hk_union,
       CAST(shared_in_union AS BIGINT) AS shared_in_union,
       {_KMV_EST_EXPR.replace("hk", "hk_a")} AS est_a,
       {_KMV_EST_EXPR.replace("hk", "hk_b")} AS est_b,
       {_KMV_EST_EXPR.replace("hk", "hk_u")} AS est_union,
       shared_in_union * 10000 // {_KMV_K} AS jaccard_bps
FROM est, truth
"""


@query("sketch_kmv_set_ops", "2.4 aggregations", _kmv_oracle())
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct sketch with SET ALGEBRA — the second
    estimate-class operator made hash-verifiable (after
    agg_hll_exact_registers): the k smallest 48-bit md5 hashes of each key
    set are a fully deterministic, MERGEABLE summary (union sketch = the
    bottom-k of the concatenated sketches; intersection via the shared
    fraction inside the union sketch — the theta-sketch trick), so
    cardinality AND overlap estimates reproduce bit-for-bit on any engine
    or cluster. The only IEEE math is one shared (k−1)·2⁴⁸/h_k string per
    estimate; Jaccard reports in integer basis points. Scale: each sketch
    is a TakeOrderedAndProject over a distinct-key reduction (no global
    sort), the merge touches 2k rows, and at 100 TB the sketches are the
    shuffle-free way to ask 'how much do these two key sets overlap'
    before committing to a full anti-join sync."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    h = F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, _KMV_HASH_NIBBLES), 16, 10).cast(
        "long"
    )
    # a/b (distinct key sets) each feed a sketch AND the three-way truth
    # census; the k-row sketches feed the union merge and two max probes.
    # Checkpoint each once — the r10 plan audit caught the key-reduction
    # subtrees recomputing (12 fact scans in one plan without this).
    a = o.select(F.col("o_custkey").alias("k")).distinct().localCheckpoint(eager=True)
    b = (
        c.where(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("k"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ha = a.select(h.alias("h")).orderBy("h").limit(_KMV_K).localCheckpoint(eager=True)
    hb = b.select(h.alias("h")).orderBy("h").limit(_KMV_K).localCheckpoint(eager=True)
    hu = ha.union(hb).distinct().orderBy("h").limit(_KMV_K).localCheckpoint(eager=True)
    est = (
        hu.agg(F.max("h").alias("hk_u"), F.count(F.lit(1)).alias("ku"))
        .crossJoin(ha.agg(F.max("h").alias("hk_a")))
        .crossJoin(hb.agg(F.max("h").alias("hk_b")))
        .crossJoin(
            hu.join(ha, "h", "left_semi")
            .join(hb, "h", "left_semi")
            .agg(F.count(F.lit(1)).alias("shared_in_union"))
        )
    )
    truth = (
        a.agg(F.countDistinct("k").alias("true_a"))
        .crossJoin(b.agg(F.countDistinct("k").alias("true_b")))
        .crossJoin(a.join(b, "k", "left_semi").agg(F.count(F.lit(1)).alias("true_inter")))
    )
    return truth.crossJoin(F.broadcast(est)).select(
        "true_a",
        "true_b",
        "true_inter",
        F.col("hk_u").alias("hk_union"),
        "shared_in_union",
        F.expr(_KMV_EST_EXPR.replace("hk", "hk_a")).alias("est_a"),
        F.expr(_KMV_EST_EXPR.replace("hk", "hk_b")).alias("est_b"),
        F.expr(_KMV_EST_EXPR.replace("hk", "hk_u")).alias("est_union"),
        F.expr(f"shared_in_union * 10000 div {_KMV_K}").alias("jaccard_bps"),
    )


# ------------------- 2.10 time series: Wald-Wolfowitz runs test (exact)

# z over exact ints n1, n2, runs — one shared string; mu and sigma^2 are
# rationals over n, kept inside the double expression with CAST-typed
# literals only (bare decimal literals bind DECIMAL in Spark — FIXTURES 7)
_RUNS_Z_EXPR = (
    "(runs - (CAST(2 AS DOUBLE) * n1 * n2 / (n1 + n2) + 1))"
    " / sqrt(CAST(2 AS DOUBLE) * n1 * n2 * (2 * n1 * n2 - n1 - n2)"
    "        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - CAST(1 AS DOUBLE))))"
)

_RUNS_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT day, cents,
         sum(1) OVER (ORDER BY cents, day) AS r,
         count(*) OVER () AS n
  FROM daily
),
signs AS (
  SELECT day, CASE WHEN 2 * r > n THEN 1 ELSE 0 END AS s
  FROM ranked
),
runs AS (
  SELECT CAST(sum(s) AS BIGINT) AS n1,
         CAST(sum(1 - s) AS BIGINT) AS n2,
         CAST(1 + sum(CASE WHEN s <> prev THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM (SELECT s, lag(s) OVER (ORDER BY day) AS prev FROM signs)
)
SELECT n1, n2, runs, {_RUNS_Z_EXPR} AS z
FROM (SELECT n1, n2, runs FROM runs)
"""


@query("ts_runs_test", "2.10 streaming/time series", _RUNS_ORACLE)
def ts_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily-revenue
    sequence: each day signs above/below the MEDIAN-RANK split (rank
    doubling 2r>n — a tie-free integer test, no float median), runs =
    1 + sign changes via one lag window, and the normal z is ONE shared
    expression over exact ints (CAST-typed literals only — the bare
    decimal literal trap is FIXTURES hazard 7). The nonparametric
    autocorrelation screen: too few runs = trending, too many =
    oscillating. Scale: the fact table reduces to the daily grain
    map-side; both windows run over |days| (per-series partitions at
    100 TB, same semantics)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(F.sum(cents).alias("cents"))
    ranked = daily.select(
        "day",
        F.sum(F.lit(1)).over(
            Window.orderBy("cents", "day").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    signs = ranked.select("day", F.when(2 * F.col("r") > F.col("n"), 1).otherwise(0).alias("s"))
    lagged = signs.select("s", F.lag("s").over(Window.orderBy("day")).alias("prev"))
    agg = lagged.agg(
        F.sum("s").alias("n1"),
        F.sum(1 - F.col("s")).alias("n2"),
        (1 + F.sum((F.col("s") != F.col("prev")).cast("long"))).alias("runs"),
    )
    return agg.select("n1", "n2", "runs", F.expr(_RUNS_Z_EXPR).alias("z"))


# ---------------- 2.8 sync core: dynamic partition overwrite semantics

_DPO_ORACLE = """
WITH final AS (
  SELECT o_orderstatus,
         CASE WHEN o_orderstatus = 'F'
              THEN (CAST(round(o_totalprice * 100, 0) AS BIGINT) * 11) // 10
              ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT) END AS cents
  FROM orders
)
SELECT o_orderstatus, count(*) AS n,
       CAST(sum(cents) AS BIGINT) AS cents
FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@query("sync_dynamic_partition_overwrite", "2.8 sync core", _DPO_ORACLE)
def sync_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the storage semantics an incremental
    sync depends on: with partitionOverwriteMode=dynamic, an overwrite
    write replaces ONLY the partitions present in the incoming batch and
    leaves every other partition's files untouched (static mode would
    truncate the whole table — the classic data-loss footgun). The qid
    stages orders partitioned by o_orderstatus, then overwrites just the
    'F' partition with +10%% repriced rows (exact integer cents — money
    mutations never round floats, FIXTURES hazard 3), ASSERTS in-process
    that the untouched partitions' files were not rewritten (mtime check
    — the same proof style as sync_targeted_erasure), and reads the table
    back for the relational census the oracle recomputes. At 100 TB this
    is the difference between rewriting one day's partition and
    rewriting the lake."""
    import os
    import time as _time

    from hdc_dataengineering_sqlsync_spark.plans.scans import _rt_base

    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    base = o.select("o_orderstatus", cents.alias("cents"))
    out = str(_rt_base(sf_dir) / "orders_dpo")
    base.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)

    untouched = {}
    for d in os.listdir(out):
        if d.startswith("o_orderstatus=") and "=F" not in d:
            p = os.path.join(out, d)
            untouched[d] = max(os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p))
    _time.sleep(0.05)  # mtime resolution guard

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        repriced = base.where(F.col("o_orderstatus") == "F").select(
            "o_orderstatus", F.expr("cents * 11 div 10").alias("cents")
        )
        repriced.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    for d, mt in untouched.items():
        p = os.path.join(out, d)
        now = max(os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p))
        if now != mt:
            raise AssertionError(
                f"dynamic overwrite rewrote untouched partition {d} "
                f"(mtime {mt} -> {now}) — static-mode truncation semantics leaked"
            )

    return (
        spark.read.parquet(out)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
        .orderBy("o_orderstatus")
    )
