"""SURVEY.md §2 round-6 batch B: exact-arithmetic statistical tests and
robust estimators.

Chi-square independence (per-cell exact contributions — no cross-cell
float sum exists anywhere), Mann-Whitney U with tie-corrected normal
approximation (doubled integer midranks, the Spearman idiom), Theil-Sen
robust trend slope (median of pairwise slopes over the reduced month
grain), and exact DISCRETE percentiles (distinct-value census + cumulative
window — zero floating point end to end).

Every oracle follows the determinism rules in FIXTURES.md: exact int64 /
decimal(38,0) until at most ONE final IEEE op per output, shared
expression strings where a float formula is unavoidable, and raw
(unrounded) doubles in the output when both engines provably compute the
identical bits — re-rounding identical doubles is exactly the repr-tie
class that made dq_benford_firstdigit flap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------------------- 2.12 workloads: chi-square independence census

_CHISQ_ORACLE = """
WITH cell AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         count(*) AS o
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
m AS (
  SELECT segment, priority, o,
         sum(o) OVER (PARTITION BY segment) AS r,
         sum(o) OVER (PARTITION BY priority) AS c,
         sum(o) OVER () AS n
  FROM cell
)
SELECT segment, priority, CAST(o AS BIGINT) AS o,
       CAST((2000 * r * c + n) // (2 * n) AS BIGINT) AS e_milli,
       CAST(CAST(n * o - r * c AS HUGEINT) * CAST(n * o - r * c AS HUGEINT)
            AS DOUBLE) / CAST(CAST(n AS HUGEINT) * r * c AS DOUBLE) AS chi2_term
FROM m ORDER BY segment, priority
"""


@query("wl_chisq_independence", "2.12 composite workloads", _CHISQ_ORACLE)
def wl_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence (market segment × order priority)
    reported as the PER-CELL contribution table — the contingency audit
    behind cohort-balance checks. Per-cell algebra avoids the float
    Σ(o−e)²/e entirely: term = (N·o − r·c)² / (N·r·c) with the numerator
    squared — and the N·r·c denominator multiplied — in exact
    decimal(38,0)/HUGEINT (fits to N ≈ 3·10⁹ rows; past that, pre-scale
    counts to thousands — the test statistic is scale-free)
    and ONE double division per cell, so no cross-cell float sum with an
    engine-dependent order exists anywhere. Expected counts report in
    exact half-up integer milli-units. One keyed count + three window
    margins over the 25-cell table; the fact table is reduced before any
    window. χ² itself is Σ of the 25 cells — left to the reader/driver
    because summing 25 doubles is the one order-dependent op."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cell = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    m = cell.select(
        "segment",
        "priority",
        "o",
        F.sum("o").over(Window.partitionBy("segment")).alias("r"),
        F.sum("o").over(Window.partitionBy("priority")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    num = (F.col("n") * F.col("o") - F.col("r") * F.col("c")).cast("decimal(38,0)")
    return m.select(
        "segment",
        "priority",
        F.col("o").cast("long").alias("o"),
        F.expr("(2000 * r * c + n) div (2 * n)").cast("long").alias("e_milli"),
        (
            (num * num).cast("double")
            / (F.col("n").cast("decimal(38,0)") * F.col("r") * F.col("c")).cast("double")
        ).alias("chi2_term"),
    ).orderBy("segment", "priority")


# ---------------------------- 2.12 workloads: Mann-Whitney U (tie-corrected)

# The z formula is ONE string fed to both engines (the _det3 idiom): every
# input column is an exact int64, so the IEEE expression trees are
# identical by construction. u2 is the DOUBLED U statistic (doubled
# midranks keep tie averages integral — the Spearman idiom).
# NB: bare decimal literals (12.0) parse as DECIMAL in Spark but DOUBLE in
# DuckDB — a 1-ulp trap found during this qid's gate; CAST(... AS DOUBLE)
# is the portable spelling.
_MWU_Z_EXPR = (
    "(u2 - n1 * n2) / (2 * sqrt((n1 * n2) / CAST(12 AS DOUBLE)"
    " * ((n + 1) - tsum / (n * (n - CAST(1 AS DOUBLE))))))"
)

_MWU_ORACLE = f"""
WITH s AS (
  SELECT l_quantity AS v,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g1
  FROM lineitem WHERE l_returnflag IN ('R', 'A')
),
census AS (
  SELECT v, CAST(sum(g1) AS BIGINT) AS t1, count(*) AS t
  FROM s GROUP BY v
),
ranked AS (
  SELECT t1, t,
         2 * (sum(t) OVER (ORDER BY v) - t) + t + 1 AS midrank2
  FROM census
),
agg AS (
  SELECT CAST(sum(t1) AS BIGINT) AS n1,
         CAST(sum(t - t1) AS BIGINT) AS n2,
         CAST(sum(t1 + t - t1) AS BIGINT) AS n,
         CAST(sum(t1 * midrank2) AS BIGINT) AS r1_2,
         CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS tsum
  FROM ranked
)
SELECT n1, n2,
       CAST(u2 AS BIGINT) AS u2,
       {_MWU_Z_EXPR} AS z
FROM (SELECT n1, n2, n, tsum, r1_2 - n1 * (n1 + 1) AS u2 FROM agg)
"""


@query("wl_mannwhitney_u", "2.12 composite workloads", _MWU_ORACLE)
def wl_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum): do RETURNED lineitems (flag R)
    carry a different quantity distribution than accepted ones (flag A) —
    the nonparametric two-sample test a pipeline reaches for when
    distributions are skewed. Exactness: the
    combined ranking collapses to a DISTINCT-VALUE census (50 quantity
    values at any corpus size — the win_range_frame idiom), midranks are
    kept DOUBLED so ties stay integral, U is exact int64, and the
    tie-corrected normal z is one shared expression string over exact
    integers — identical IEEE trees in both engines, output raw
    (re-rounding identical doubles is the repr-tie trap). Scale: one
    map-side-combinable value census, one 50-row window, one 1-row
    aggregate; the per-value tie cube t³ is widened to decimal(38,0)/
    HUGEINT before summing (t grows linearly with the corpus — the
    widen-before-sum idiom), so nothing downstream of the census can
    overflow or scale with the data."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag").isin("R", "A"))
    s = li.select(
        F.col("l_quantity").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("g1"),
    )
    census = s.groupBy("v").agg(F.sum("g1").alias("t1"), F.count(F.lit(1)).alias("t"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = census.select(
        "t1",
        "t",
        (2 * (F.sum("t").over(w) - F.col("t")) + F.col("t") + 1).alias("midrank2"),
    )
    agg = ranked.agg(
        F.sum("t1").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).alias("n2"),
        F.sum("t").alias("n"),
        F.sum(F.col("t1") * F.col("midrank2")).alias("r1_2"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t") - F.col("t")).alias("tsum"),
    )
    u2 = agg.select(
        "n1",
        "n2",
        "n",
        "tsum",
        (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1)).alias("u2"),
    )
    return u2.select("n1", "n2", "u2", F.expr(_MWU_Z_EXPR).alias("z"))


# --------------------------- 2.10 time series: Theil-Sen robust trend slope



@query(
    "ts_theil_sen_slope",
    "2.10 streaming/time series",
    """
WITH pt AS (
  SELECT l_returnflag AS flag,
         (CAST(year(l_shipdate) AS BIGINT) - 1995) * 12 + month(l_shipdate) AS x,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS y
  FROM lineitem GROUP BY 1, 2
),
slopes AS (
  SELECT a.flag, (b.y - a.y) / (b.x - a.x) AS slope
  FROM pt a JOIN pt b ON a.flag = b.flag AND b.x > a.x
),
ranked AS (
  SELECT flag, slope,
         row_number() OVER (PARTITION BY flag ORDER BY slope) AS i,
         count(*) OVER (PARTITION BY flag) AS m
  FROM slopes
),
med AS (
  SELECT flag, CAST(max(m) AS BIGINT) AS n_pairs,
         sum(CASE WHEN m % 2 = 1 AND i = (m + 1) // 2 THEN slope
                  WHEN m % 2 = 0 AND (i = m // 2 OR i = m // 2 + 1) THEN slope / 2
             END) AS sen_slope_cents
  FROM ranked GROUP BY flag
)
SELECT flag, n_pairs, sen_slope_cents FROM med ORDER BY flag
""",
)
def ts_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope of monthly revenue per returnflag —
    the median of all pairwise month-to-month slopes, the outlier-immune
    alternative to the OLS wl_price_trend_slope. Scale: the fact table
    reduces to the (flag, month) grain FIRST (≤ ~84 points per flag), so
    the pairwise self-join is bounded at ~3.5k pairs per flag — the
    classic reduce-then-quadratic shape, never corpus-quadratic. Each
    slope is ONE int64/int64 IEEE division (identical bits both engines);
    the median picks the middle value(s) by rank — equal-slope tie order
    cannot change the selected VALUE — and the even-count average
    `(s_k + s_{k+1})/2` is expressed as sum(s/2) over the two middle
    ranks so both engines add in the same order. Output raw doubles:
    re-rounding identical doubles is the repr-tie trap."""
    li = load(spark, sf_dir, "lineitem")
    x = ((F.year("l_shipdate") - 1995) * 12 + F.month("l_shipdate")).cast("long")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    pt = li.groupBy(F.col("l_returnflag").alias("flag"), x.alias("x")).agg(
        F.sum(cents).alias("y")
    )
    a = pt.select(F.col("flag"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = pt.select(F.col("flag").alias("flag_b"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = (
        a.join(b, (F.col("flag") == F.col("flag_b")) & (F.col("xb") > F.col("xa")))
        .select("flag", ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))).alias("slope"))
    )
    wri = Window.partitionBy("flag").orderBy("slope")
    wall = Window.partitionBy("flag")
    ranked = slopes.select(
        "flag",
        "slope",
        F.row_number().over(wri).alias("i"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    odd_mid = (F.col("m") % 2 == 1) & (2 * F.col("i") == F.col("m") + 1)
    even_mid = (F.col("m") % 2 == 0) & (
        (2 * F.col("i") == F.col("m")) | (2 * F.col("i") == F.col("m") + 2)
    )
    return (
        ranked.groupBy("flag")
        .agg(
            F.max("m").alias("n_pairs"),
            F.sum(
                F.when(odd_mid, F.col("slope")).when(even_mid, F.col("slope") / 2)
            ).alias("sen_slope_cents"),
        )
        .orderBy("flag")
    )


# --------------------- 2.4 aggregations: exact DISCRETE percentiles

_PCTDISC_ORACLE = """
WITH census AS (
  SELECT l_returnflag AS flag, l_extendedprice AS v, count(*) AS t
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT flag, v,
         sum(t) OVER (PARTITION BY flag ORDER BY v) AS cum,
         sum(t) OVER (PARTITION BY flag) AS n
  FROM census
)
SELECT flag,
       min(CASE WHEN 100 * cum >= 25 * n THEN v END) AS p25,
       min(CASE WHEN 100 * cum >= 50 * n THEN v END) AS p50,
       min(CASE WHEN 100 * cum >= 75 * n THEN v END) AS p75,
       min(CASE WHEN 100 * cum >= 99 * n THEN v END) AS p99
FROM ranked GROUP BY flag ORDER BY flag
"""


@query("agg_percentile_disc", "2.4 aggregations", _PCTDISC_ORACLE)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE percentiles (type-1 quantiles: the smallest data
    value whose cumulative count reaches ⌈p·n⌉) of extended price per
    returnflag — the quantile definition with NO floating point anywhere:
    the answer is an actual data value and the threshold test
    `100·cum ≥ k·n` is pure integer arithmetic, so cross-engine equality
    is by construction (contrast agg_percentile, whose interpolation
    needs ulp-snapping). Scale: the sort collapses to a DISTINCT-VALUE
    census (map-side combinable) before the window — the cumulative pass
    runs over |distinct prices|, not |rows| — and the final min-CASE
    aggregate is one tiny rollup per flag."""
    li = load(spark, sf_dir, "lineitem")
    census = li.groupBy(F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("v")).agg(
        F.count(F.lit(1)).alias("t")
    )
    wcum = Window.partitionBy("flag").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("flag")
    ranked = census.select(
        "flag",
        "v",
        F.sum("t").over(wcum).alias("cum"),
        F.sum("t").over(wall).alias("n"),
    )
    pick = lambda k: F.min(  # noqa: E731
        F.when(100 * F.col("cum") >= k * F.col("n"), F.col("v"))
    ).alias(f"p{k}")
    return ranked.groupBy("flag").agg(pick(25), pick(50), pick(75), pick(99)).orderBy("flag")


# --------------------- 2.9 llm-data: PERSISTED IVF index (index-as-a-table)

# The missing piece named in the r5 verdict: the ANN funnel had no
# persisted index structure. Here the IVF posting lists ARE a table —
# quantized vectors written partitionBy(cell) — so cell probes become
# partition PRUNING on the storage layout (the open-table-format answer to
# vector indexes), and the query side joins the tiny probe list against
# the index so Spark's dynamic partition pruning keeps unprobed posting
# lists unread. Deterministic end to end: exact int64 dots, ties toward
# the greater cell / lower vec_id.

_IVF_NPROBE = 2
_IVF_TOPK = 3
_IVF_QUERY_STRIDE = 97

_IVF_ORACLE = f"""
WITH kk AS (
  SELECT CAST(greatest(1, (count(*) + 127) // 128) AS BIGINT) AS k FROM embeddings
),
q AS (
  SELECT vec_id, embedding,
         list_transform(range(1, 65), i ->
           CAST(round(embedding[i] * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
dots AS (
  SELECT vec_id, qv,
         list_transform(range(0, kk.k), c ->
           CAST(list_sum(list_transform(range(1, 65), i ->
             qv[i] * ((i * (2 * c + 3) * 11) % 41 - 20))) AS BIGINT)) AS ds
  FROM q, kk
),
cells AS (
  SELECT vec_id, qv,
         CAST(len(ds) - list_indexof(list_reverse(ds), list_max(ds)) AS INT) AS cell,
         ds
  FROM dots
),
queries AS (SELECT vec_id AS query_id, qv AS query_v, ds AS qds FROM cells
            WHERE vec_id % {_IVF_QUERY_STRIDE} = 0),
probe AS (
  SELECT query_id, query_v, CAST(c.c AS INT) AS cell,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY qds[CAST(c.c AS INT) + 1] DESC, c.c DESC) AS pr
  FROM queries, (SELECT unnest(range(0, (SELECT k FROM kk))) AS c) c
),
cand AS (
  SELECT p.query_id,
         x.vec_id,
         CAST(list_sum(list_transform(range(1, 65), i ->
           p.query_v[i] * x.qv[i])) AS BIGINT) AS dot
  FROM (SELECT * FROM probe WHERE pr <= {_IVF_NPROBE}) p
  JOIN cells x ON x.cell = p.cell AND x.vec_id <> p.query_id
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, dot
FROM (
  SELECT query_id, vec_id, dot,
         row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rank
  FROM cand
)
WHERE rank <= {_IVF_TOPK} ORDER BY query_id, rank
"""


@query("simsearch_ivf_persisted", "2.9 llm-data", _IVF_ORACLE)
def simsearch_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the index PERSISTED as a partitioned table — the ANN
    funnel's storage leg: quantized vectors land in parquet posting lists
    `partitionBy(cell)` (cell = data-driven closed-form codebook argmax,
    the dedup_semantic_centroid machinery), so a cell probe is directory-
    level partition PRUNING, not a scan. Queries (vec_id % 97) pick their
    `nprobe=2` best cells, and the candidate fetch is a JOIN of that tiny
    probe list against the index table — Spark's dynamic partition
    pruning keeps unprobed posting lists unread (at 100 TB the index is
    written once, bucketed/partitioned, and every query batch reads only
    its probed fraction). Exact int64 dots; top-3 per query with full
    (dot DESC, vec_id) tiebreak; ties toward the greater cell in the
    probe ranking, matching the assignment convention."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType, LongType

    from hdc_dataengineering_sqlsync_spark.operators.dedup import _spread
    from hdc_dataengineering_sqlsync_spark.plans.llmdata_r4 import _sem_cent, _sem_k
    from hdc_dataengineering_sqlsync_spark.plans.scans import _rt_base
    from hdc_dataengineering_sqlsync_spark.registry import rowcount

    e = load(spark, sf_dir, "embeddings")
    k = _sem_k(rowcount(sf_dir, "embeddings"))
    codebook_np = np.array([_sem_cent(c) for c in range(k)], dtype=np.int64)

    def _assign_batch(qs):
        qm = np.array(qs.tolist(), dtype=np.int64)
        dots = qm @ codebook_np.T
        return pd.Series(((dots.shape[1] - 1) - np.argmax(dots[:, ::-1], axis=1)).astype("int32"))

    def _probe_batch(qs):
        qm = np.array(qs.tolist(), dtype=np.int64)
        dots = qm @ codebook_np.T
        # rank cells by (dot DESC, cell DESC): sort a composite key on the
        # REVERSED cell axis so equal dots prefer the greater cell
        order = np.argsort(-dots[:, ::-1], axis=1, kind="stable")[:, :_IVF_NPROBE]
        cells = (dots.shape[1] - 1) - order
        return pd.Series(list(cells.astype("int32")))

    def _dot_batch(a, b):
        am = np.array(a.tolist(), dtype=np.int64)
        bm = np.array(b.tolist(), dtype=np.int64)
        return pd.Series((am * bm).sum(axis=1))

    assign = F.pandas_udf(_assign_batch, IntegerType())
    probe2 = F.pandas_udf(_probe_batch, ArrayType(IntegerType()))
    pair_dot = F.pandas_udf(_dot_batch, LongType())

    qv = F.transform("embedding", lambda x: F.round(x.cast("double") * 1000, 0).cast("long"))
    quantized = _spread(e).select("vec_id", qv.alias("qv"))

    # ---- build: write the posting lists once, partitioned by cell
    out = str(_rt_base(sf_dir) / "ivf_index")
    quantized.select("vec_id", "qv", assign("qv").alias("cell")).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(out)
    index = spark.read.parquet(out)

    # ---- query: tiny probe list joined against the partitioned index
    queries = quantized.where(F.col("vec_id") % _IVF_QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("query_v"),
        F.explode(probe2("qv")).alias("cell"),
    )
    cand = (
        F.broadcast(queries)
        .join(index, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", pair_dot("query_v", "qv").alias("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), "vec_id")
    return (
        cand.select("query_id", F.row_number().over(w).alias("rank"), "vec_id", "dot")
        .where(F.col("rank") <= _IVF_TOPK)
        .orderBy("query_id", "rank")
    )
