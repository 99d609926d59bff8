"""SURVEY.md §2 round-5 additions, batch J.

Scan/quality/sync surface: dynamic partition pruning as a DECLARED query
(previously only unit-asserted), MAD-based robust outlier detection with
fully-integer decision arithmetic, and the late-arriving-dimension pattern.
Registered after ``roundfive_c`` (plans/__init__.py) so the qids append to
the END of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# --------------------------- 2.1 scans: dynamic partition pruning join

_DPP_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("scan_dpp_prune_join", "2.1 scans", _DPP_ORACLE)
def scan_dpp_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: a dim filter prunes fact PARTITIONS at runtime.

    The join shape every incremental sync and star-schema query lives on:
    the fact table is partitioned by the join key; the dimension side is
    selectively filtered by an attribute the optimizer cannot push
    statically (tier rank), so Spark injects a dynamic-pruning subquery
    into the fact scan's PartitionFilters — only the 2 surviving
    partitions are read (plan-asserted in tests; at 100 TB this is the
    difference between scanning 2 partitions and scanning all of them).

    The fixture stages the partitioned layout once per (sf_dir, pid); the
    dim is built from the fact's own distinct priorities with a derived
    rank attribute, filtered rank <= 2."""
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    fact_path = _os.path.join(
        _tempfile.gettempdir(), f"hdc_dpp_{tag}_{_os.getpid()}", "orders_by_prio"
    )
    if not _os.path.exists(_os.path.join(fact_path, "_SUCCESS")):
        load(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
            "o_orderpriority"
        ).parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority")
        .distinct()
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.substring("o_orderpriority", 1, 1).cast("int").alias("tier"),
        )
        .where(F.col("tier") <= 2)
    )
    return (
        fact.join(F.broadcast(dim), fact.o_orderpriority == dim.prio)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "total_cents"
            ),
        )
        .orderBy("o_orderpriority")
    )


# ----------------------- 2.8 sync: MAD robust outlier detection

_MAD_ORACLE = """
WITH c AS (
  SELECT c_mktsegment,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
),
med AS (
  SELECT c_mktsegment, CAST(2 * median(cents) AS BIGINT) AS med2
  FROM c GROUP BY c_mktsegment
),
dev AS (
  SELECT c.c_mktsegment, c.cents, abs(2 * c.cents - med.med2) AS dev2
  FROM c JOIN med ON c.c_mktsegment = med.c_mktsegment
),
mad AS (
  SELECT c_mktsegment, CAST(2 * median(dev2) AS BIGINT) AS mad4
  FROM dev GROUP BY c_mktsegment
)
SELECT dev.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN 2 * dev.dev2 > 7 * mad.mad4 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(MIN(CASE WHEN 2 * dev.dev2 > 7 * mad.mad4 THEN dev.cents END)
            AS BIGINT) AS min_outlier_cents,
       CAST(MAX(CASE WHEN 2 * dev.dev2 > 7 * mad.mad4 THEN dev.cents END)
            AS BIGINT) AS max_outlier_cents
FROM dev JOIN mad ON dev.c_mktsegment = mad.c_mktsegment
GROUP BY dev.c_mktsegment ORDER BY dev.c_mktsegment
"""


@query("dq_outlier_mad_robust", "2.8 sync core", _MAD_ORACLE)
def dq_outlier_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census via Median Absolute Deviation, all-integer.

    The robust sibling of dq_outlier_iqr/ts_anomaly_zscore: mean/stddev
    break down when the outliers themselves inflate the scale estimate;
    MAD (median of |x - median|) has a 50% breakdown point. The decision
    rule |x - med| > 3.5 * MAD is kept EXACT: doubling both medians makes
    them integer-valued (the even-count midpoint is the only fractional
    case, always .5), so the flag is the integer inequality
    2*dev2 > 7*mad4 — no float rounding ever crosses engines.

    Scale shape: two median aggregates per segment (exact percentile is a
    distributed aggregate; at 100 TB swap in approx_percentile — same
    shape, documented not declared) with the tiny per-segment stat tables
    broadcast back; the census is one keyed aggregate."""
    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )
    med = c.groupBy("c_mktsegment").agg(
        (2 * F.median("cents")).cast("long").alias("med2")
    )
    dev = c.join(F.broadcast(med), "c_mktsegment").withColumn(
        "dev2", F.abs(2 * F.col("cents") - F.col("med2"))
    )
    mad = dev.groupBy("c_mktsegment").agg(
        (2 * F.median("dev2")).cast("long").alias("mad4")
    )
    flagged = dev.join(F.broadcast(mad), "c_mktsegment").withColumn(
        "is_outlier", 2 * F.col("dev2") > 7 * F.col("mad4")
    )
    return (
        flagged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)).alias("n_outliers"),
            F.min(F.when(F.col("is_outlier"), F.col("cents"))).alias(
                "min_outlier_cents"
            ),
            F.max(F.when(F.col("is_outlier"), F.col("cents"))).alias(
                "max_outlier_cents"
            ),
        )
        .orderBy("c_mktsegment")
    )


# ----------------------- 2.8 sync: late-arriving dimension members

_LATE_DIM_ORACLE = """
WITH facts AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 THEN o_custkey + 1000000
              ELSE o_custkey END AS custkey
  FROM orders
),
dim_keys AS (SELECT c_custkey AS custkey FROM customer),
status AS (
  SELECT f.custkey,
         CASE
           WHEN d.custkey IS NOT NULL THEN 'known'
           WHEN f.custkey % 2 = 0 THEN 'placeholder_resolved'
           ELSE 'placeholder_open'
         END AS member_status
  FROM (SELECT DISTINCT custkey FROM facts) f
  LEFT JOIN dim_keys d ON f.custkey = d.custkey
),
fact_status AS (
  SELECT s.member_status, COUNT(*) AS n_facts
  FROM facts f JOIN status s ON f.custkey = s.custkey
  GROUP BY s.member_status
)
SELECT s.member_status,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MAX(fs.n_facts) AS BIGINT) AS n_facts
FROM status s JOIN fact_status fs ON s.member_status = fs.member_status
GROUP BY s.member_status ORDER BY s.member_status
"""


@query("sync_late_arriving_dim", "2.8 sync core", _LATE_DIM_ORACLE)
def sync_late_arriving_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension members: placeholder insertion + resolution.

    The warehouse early-arriving-fact pattern: facts referencing dim keys
    that do not exist yet (a deterministic slice remapped beyond the
    customer key range) must NOT be dropped or block the load — each
    unknown key gets an inferred placeholder member; a later dim delivery
    (the even half of the unknown keys) resolves its placeholders.
    Census: members and fact coverage per status (known /
    placeholder_resolved / placeholder_open).

    Scale shape: the unknown-key discovery is a distinct-then-anti-join
    on the key — the distinct collapses fact volume BEFORE the join, and
    the dim side joins on its key (broadcast/bloom at scale); fact
    counts re-join the tiny status table broadcast-style. No row takes a
    second scan."""
    facts = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.col("o_custkey") + 1000000
        )
        .otherwise(F.col("o_custkey"))
        .alias("custkey"),
    )
    dim_keys = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), F.lit(True).alias("known")
    )
    status = (
        facts.select("custkey")
        .distinct()
        .join(dim_keys, "custkey", "left")
        .select(
            "custkey",
            F.when(F.col("known"), "known")
            .when(F.col("custkey") % 2 == 0, "placeholder_resolved")
            .otherwise("placeholder_open")
            .alias("member_status"),
        )
    )
    fact_status = (
        facts.join(status, "custkey")
        .groupBy("member_status")
        .agg(F.count(F.lit(1)).alias("n_facts"))
    )
    return (
        status.groupBy("member_status")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .join(fact_status, "member_status")
        .select("member_status", "n_members", "n_facts")
        .orderBy("member_status")
    )


# ------------------- 2.9 llm-data: ANN recall evaluation (recall@10)

_RECALL_ORACLE = """
WITH comp AS (
  SELECT vec_id, i.range AS pos, CAST(embedding[i.range] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, 65) i
),
mx AS (SELECT vec_id, max(abs(x)) AS m FROM comp GROUP BY vec_id),
qt AS (
  SELECT c.vec_id, c.pos,
         CAST(floor(c.x * (127.0 / mx.m) + 0.5) AS BIGINT) AS q
  FROM comp c JOIN mx ON c.vec_id = mx.vec_id
),
queries AS (SELECT vec_id AS q_id FROM embeddings WHERE vec_id % 97 = 0),
exact_sc AS (
  SELECT q.q_id, a.vec_id,
         sum(a.x * b.x) AS dot,
         sum(a.x * a.x) AS na2, sum(b.x * b.x) AS nb2
  FROM queries q
  JOIN comp b ON b.vec_id = q.q_id
  JOIN comp a ON a.pos = b.pos AND a.vec_id <> q.q_id
  GROUP BY q.q_id, a.vec_id
),
exact_rank AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
           ORDER BY round(dot / (sqrt(na2) * sqrt(nb2)), 4) DESC, vec_id)
           AS rn
  FROM exact_sc QUALIFY rn <= 10
),
int8_sc AS (
  SELECT q.q_id, a.vec_id, sum(a.q * b.q) AS idot
  FROM queries q
  JOIN qt b ON b.vec_id = q.q_id
  JOIN qt a ON a.pos = b.pos AND a.vec_id <> q.q_id
  GROUP BY q.q_id, a.vec_id
),
int8_rank AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY idot DESC, vec_id)
           AS rn
  FROM int8_sc QUALIFY rn <= 10
)
SELECT e.q_id,
       CAST(COUNT(i.vec_id) AS BIGINT) AS n_hits,
       COUNT(i.vec_id) * 10000 // 10 AS recall_bps
FROM exact_rank e
LEFT JOIN int8_rank i ON e.q_id = i.q_id AND e.vec_id = i.vec_id
GROUP BY e.q_id ORDER BY e.q_id
"""


@query("simsearch_recall_at_k", "2.9 llm-data", _RECALL_ORACLE)
def simsearch_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 evaluation of the int8 ANN leg against exact ground truth.

    "Measure, don't guess" as an operator: every approximate retrieval
    path needs a recall harness before it ships — here the int8
    symmetric-quantized dot product (the declared rerank stage-1 /
    simsearch_quantize_int8 compression) is scored per query against the
    exact-cosine top-10, recall in integer basis points. The same
    harness generalizes to the LSH and IVF legs by swapping the
    candidate generator.

    Scale shape: one broadcast of the (tiny) query batch; BOTH legs
    score candidates map-side in one pass each and keep top-10 per query
    via ranked windows (WindowGroupLimit — partitions pre-truncate to
    k); the recall join matches two k-row-per-query rank lists. The int8
    dot is EXACT int64; only the exact-cosine leg rounds (4dp, the
    declared baseline's convention)."""
    from pyspark.sql.window import Window as W

    from hdc_dataengineering_sqlsync_spark.functions.vectors import (
        cosine_similarity,
    )

    emb = load(spark, sf_dir, "embeddings")
    xd = F.transform("embedding", lambda v: v.cast("double"))
    mx = F.array_max(F.transform(xd, lambda v: F.abs(v)))
    qarr = F.transform(
        "_x", lambda v: F.floor(v * (F.lit(127.0) / F.col("_m")) + F.lit(0.5)).cast("long")
    )
    base = (
        emb.select("vec_id", xd.alias("_x"))
        .withColumn("_m", F.array_max(F.transform("_x", lambda v: F.abs(v))))
        .select("vec_id", "_x", qarr.alias("_q8"))
    )
    queries = base.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("_x").alias("_qx"),
        F.col("_q8").alias("_qq8"),
    )
    pairs = base.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("q_id")
    )
    wq = W.partitionBy("q_id")
    exact_rank = (
        pairs.select(
            "q_id",
            "vec_id",
            F.round(cosine_similarity(F.col("_x"), F.col("_qx")), 4).alias("cos"),
        )
        .withColumn(
            "rn",
            F.row_number().over(wq.orderBy(F.col("cos").desc(), "vec_id")),
        )
        .where(F.col("rn") <= 10)
        .select("q_id", "vec_id")
    )
    idot = F.aggregate(
        F.zip_with("_q8", "_qq8", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    int8_rank = (
        pairs.select("q_id", "vec_id", idot.alias("idot"))
        .withColumn(
            "rn",
            F.row_number().over(wq.orderBy(F.col("idot").desc(), "vec_id")),
        )
        .where(F.col("rn") <= 10)
        .select("q_id", F.col("vec_id").alias("i_vec_id"))
    )
    return (
        exact_rank.join(
            int8_rank,
            (exact_rank.q_id == int8_rank.q_id)
            & (exact_rank.vec_id == int8_rank.i_vec_id),
            "left",
        )
        .groupBy(exact_rank.q_id.alias("q_id"))
        .agg(
            F.count("i_vec_id").alias("n_hits"),
            F.expr("count(i_vec_id) * 10000 div 10").alias("recall_bps"),
        )
        .orderBy("q_id")
    )


# --------------------------- 2.12 workloads: revenue bridge waterfall

_BRIDGE_ORACLE = """
WITH li AS (
  SELECT year(l_shipdate) * 12 + month(l_shipdate) AS mo,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS gross,
         CAST(round(l_discount * 100, 0) AS BIGINT) AS d,
         CAST(round(l_tax * 100, 0) AS BIGINT) AS t
  FROM lineitem
),
rowcalc AS (
  SELECT mo, gross,
         gross * d // 100 AS disc_amt,
         (gross - gross * d // 100) * t // 100 AS tax_amt
  FROM li
)
SELECT CAST(mo AS BIGINT) AS mo,
       CAST(SUM(gross) AS BIGINT) AS gross_cents,
       CAST(SUM(disc_amt) AS BIGINT) AS discount_cents,
       CAST(SUM(tax_amt) AS BIGINT) AS tax_cents,
       CAST(SUM(gross - disc_amt + tax_amt) AS BIGINT) AS net_cents
FROM rowcalc GROUP BY mo ORDER BY mo
"""


@query("wl_revenue_bridge", "2.12 composite workloads", _BRIDGE_ORACLE)
def wl_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue bridge: gross -> discount -> tax -> net waterfall.

    The finance decomposition behind every revenue dashboard: each
    month's gross explains net through explicitly-ordered adjustment
    steps (discount off gross, tax on the discounted base). Every
    adjustment is integer-cents floor arithmetic — `gross*d div 100` —
    because the float form (`extendedprice * (1 - discount)`) hits the
    repr-tie rounding divergence (FIXTURES hazard 3) the moment two
    engines round it; the floor-division spec is engine-identical and
    auditable (each row's adjustments reconcile exactly to its net).

    Scale shape: pure map-side integer expression work + ONE keyed
    aggregate on the month — the cheapest query family in the catalog;
    at 100 TB this is a single map-combinable pass."""
    li = load(spark, sf_dir, "lineitem").select(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("mo"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("gross"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("d"),
        F.round(F.col("l_tax") * 100, 0).cast("long").alias("t"),
    )
    rowcalc = li.select(
        "mo",
        "gross",
        F.expr("gross * d div 100").alias("disc_amt"),
        F.expr("(gross - gross * d div 100) * t div 100").alias("tax_amt"),
    )
    return (
        rowcalc.groupBy("mo")
        .agg(
            F.sum("gross").alias("gross_cents"),
            F.sum("disc_amt").alias("discount_cents"),
            F.sum("tax_amt").alias("tax_cents"),
            F.sum(
                F.col("gross") - F.col("disc_amt") + F.col("tax_amt")
            ).alias("net_cents"),
        )
        .select(
            F.col("mo").cast("long").alias("mo"),
            "gross_cents",
            "discount_cents",
            "tax_cents",
            "net_cents",
        )
        .orderBy("mo")
    )


# ------------------------ 2.12 workloads: daily cart abandonment

_ABANDON_ORACLE = """
WITH per_user_day AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, user_id,
         MAX(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END)
           AS engaged,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS purchased
  FROM events GROUP BY day, user_id
)
SELECT day,
       CAST(SUM(engaged) AS BIGINT) AS n_engaged,
       CAST(SUM(CASE WHEN engaged = 1 AND purchased = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_converted,
       CAST(SUM(CASE WHEN engaged = 1 AND purchased = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_abandoned,
       CAST(SUM(CASE WHEN engaged = 1 AND purchased = 0 THEN 1 ELSE 0 END)
         * 10000 // NULLIF(SUM(engaged), 0) AS BIGINT) AS abandon_bps
FROM per_user_day
GROUP BY day HAVING SUM(engaged) > 0 ORDER BY day
"""


@query("wl_cart_abandonment_daily", "2.12 composite workloads", _ABANDON_ORACLE)
def wl_cart_abandonment_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cart abandonment: engaged-but-not-converted user census.

    Behavioral funnel hygiene metric: per UTC day, users who clicked or
    viewed but did not purchase that day. Distinct-user semantics reduce
    FIRST to the (day, user) grain — one boolean OR per user-day — then
    collapse per day; abandonment rate in integer basis points. Days as
    epoch-day integers (no calendar/TZ functions in the key path).

    Scale shape: two map-combinable keyed aggregates, the first on
    (day, user) — the event log's natural key — the second on the tiny
    day series; no distinct-count expansion, no joins."""
    pud = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.expr("unix_micros(ts) div 86400000000").alias("day"), "user_id"
        )
        .agg(
            F.max(
                F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0)
            ).alias("engaged"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("purchased"),
        )
    )
    return (
        pud.groupBy("day")
        .agg(
            F.sum("engaged").alias("n_engaged"),
            F.sum(
                F.when((F.col("engaged") == 1) & (F.col("purchased") == 1), 1).otherwise(0)
            ).alias("n_converted"),
            F.sum(
                F.when((F.col("engaged") == 1) & (F.col("purchased") == 0), 1).otherwise(0)
            ).alias("n_abandoned"),
            F.expr(
                "sum(case when engaged = 1 and purchased = 0 then 1 else 0 end)"
                " * 10000 div nullif(sum(engaged), 0)"
            ).alias("abandon_bps"),
        )
        .where(F.col("n_engaged") > 0)
        .orderBy("day")
    )


# ------------------------- 2.8 sync: CDC ordering-violation audit

_CDC_ORDER_ORACLE = """
WITH chlog AS (
  SELECT l_orderkey AS key, l_linenumber AS commit_seq,
         CAST(l_quantity AS BIGINT) AS version
  FROM lineitem
),
lagged AS (
  SELECT key, commit_seq, version,
         lag(version) OVER (PARTITION BY key ORDER BY commit_seq, version)
           AS prev_version
  FROM chlog
),
per_key AS (
  SELECT key,
         COUNT(*) AS n_commits,
         SUM(CASE WHEN prev_version IS NOT NULL AND version < prev_version
                  THEN 1 ELSE 0 END) AS n_regressions
  FROM lagged GROUP BY key
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN n_regressions > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_keys_violating,
       CAST(SUM(n_regressions) AS BIGINT) AS n_regressions,
       CAST(SUM(n_commits) AS BIGINT) AS n_commits,
       CAST(SUM(CASE WHEN n_regressions > 0 THEN 1 ELSE 0 END) * 10000
         // COUNT(*) AS BIGINT) AS violating_key_bps
FROM per_key
"""


@query("sync_cdc_order_audit", "2.8 sync core", _CDC_ORDER_ORACLE)
def sync_cdc_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC ordering-violation audit: do versions regress within a key?

    A change feed that re-orders or replays stale mutations silently
    corrupts last-writer-wins targets; the audit counts, per key, commits
    whose version is LOWER than the previous commit's (here: the
    lineitem stream keyed by order, sequenced by (line number, version) — the version
    tiebreak makes the per-key version SEQUENCE deterministic even where
    the fixture's line numbers collide, since equal-version swaps cannot
    change any lag comparison — versioned by quantity, a fixture
    guaranteed to contain regressions). The
    per-feed summary (violating-key rate in basis points) is the gate a
    sync pipeline checks before trusting arrival order instead of
    version comparison.

    Scale shape: ONE lag window partitioned by key (the changelog's
    natural partitioning — small per-key runs), then two keyed
    aggregates collapsing to a single summary row; all integers."""
    chlog = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("key"),
        F.col("l_linenumber").alias("commit_seq"),
        F.col("l_quantity").cast("long").alias("version"),
    )
    lagged = chlog.withColumn(
        "prev_version",
        F.lag("version").over(
            Window.partitionBy("key").orderBy("commit_seq", "version")
        ),
    )
    per_key = lagged.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_commits"),
        F.sum(
            F.when(
                F.col("prev_version").isNotNull()
                & (F.col("version") < F.col("prev_version")),
                1,
            ).otherwise(0)
        ).alias("n_regressions"),
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("n_regressions") > 0, 1).otherwise(0)).alias(
            "n_keys_violating"
        ),
        F.sum("n_regressions").alias("n_regressions"),
        F.sum("n_commits").alias("n_commits"),
        F.expr(
            "sum(case when n_regressions > 0 then 1 else 0 end) * 10000"
            " div count(1)"
        ).alias("violating_key_bps"),
    )
