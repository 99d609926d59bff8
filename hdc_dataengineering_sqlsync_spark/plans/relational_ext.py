"""SURVEY.md §2 relational-surface extensions (split out of the round-4
modules, r5): joins (tolerance as-of, SCD2 as-of dim, bloom-pruned, fuzzy
closest, spatial grid), subqueries/hierarchies, window extensions
(streaks, MoM %, ffill), and scan/function surface (CSV edge cases, HOF
lambdas, deterministic UUIDs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load


# --------------------------------------------------------------- 2.3 joins

_ASOF_TOL_ORACLE = """
SELECT event_id,
       CASE WHEN prior_view_ts >= ts - INTERVAL 2 HOUR THEN prior_view_ts END
         AS prior_view_ts
FROM (
  SELECT event_id, event_type, ts,
         max(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_ts
  FROM events
) WHERE event_type = 'purchase'
ORDER BY event_id
"""


@query("join_asof_tolerance", "2.3 joins", _ASOF_TOL_ORACLE)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas merge_asof / kdb wj
    semantics): the latest strictly-prior 'view' per user counts for a
    purchase only when it happened within the last 2 hours — staler matches
    become NULL instead of silently attributing ancient context. Same
    single window pass as join_asof_prior_event (one shuffle on user_id,
    no range join); the tolerance is a post-window map-side predicate, so
    the 100 TB cost is identical to the unbounded as-of."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_view = F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    return (
        e.select("event_id", "event_type", "ts", prior_view.alias("pv"))
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.when(
                F.col("pv") >= F.col("ts") - F.expr("INTERVAL 2 HOURS"), F.col("pv")
            ).alias("prior_view_ts"),
        )
        .orderBy("event_id")
    )


# ------------------------------------------------ round-4 batch 2 (6 qids)

_SCD2_DIM_ORACLE = """
SELECT event_id,
       CASE WHEN v > 0 THEN v END AS dim_version
FROM (
  SELECT event_id, event_type,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS v
  FROM events
) WHERE event_type = 'click'
ORDER BY event_id
"""


@query("join_scd2_asof_dim", "2.3 joins", _SCD2_DIM_ORACLE)
def join_scd2_asof_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension join WITHOUT a range join: each 'click' fact row
    resolves the SCD2 user-state version active at its event time (versions
    are defined by that user's 'purchase' events; clicks before the first
    purchase get NULL). Instead of joining facts to [valid_from, valid_to)
    intervals — a range join that degenerates to per-key quadratic — the
    dim rows INTERLEAVE with the facts in one window pass: a running count
    of version rows over (user, ts, event_id) IS the as-of version id.
    One shuffle on user_id, no join at all; at 100 TB this is the
    sort-merge shape a temporal fact/dim resolve should compile to."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(w)
    return (
        e.select("event_id", "event_type", v.alias("v"))
        .where(F.col("event_type") == "click")
        .select("event_id", F.when(F.col("v") > 0, F.col("v")).alias("dim_version"))
        .orderBy("event_id")
    )


_BLOOM_JOIN_ORACLE = """
SELECT s_name, count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE s_nationkey % 3 = 0
GROUP BY s_name ORDER BY s_name
"""

_BLOOM_WORDS, _BLOOM_BITS, _BLOOM_K = 16, 1024, 4


def _bloom_positions(key):
    """k md5-derived bit positions in [0, 1024) for an int64 key column."""
    h = F.md5(key.cast("string"))
    return [
        (F.conv(F.substring(h, 1 + 3 * i, 3), 16, 10).cast("long") % _BLOOM_BITS).cast("int")
        for i in range(_BLOOM_K)
    ]


@query("join_bloom_pruned", "2.3 joins", _BLOOM_JOIN_ORACLE)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter (bloom-pruned) join — THE shuffle reducer for a
    selective dim join at 100 TB: the filtered supplier keyset builds a
    1024-bit / k=4 bloom filter as ONE row of 16 int64 words (two tiny
    aggs), which broadcast-cross-joins onto lineitem so every fact row
    probes the filter MAP-SIDE (pure bit arithmetic, no explode, no
    shuffle); only surviving rows enter the exact join, which also removes
    any bloom false positives — so the result is IDENTICAL to the plain
    join (the oracle) while non-matching rows never reach the exchange.
    The from-scratch relational form of Spark's injected runtime bloom
    filters, with the filter payload explicit and portable. Prune
    effectiveness is unit-tested (tests/test_roundfour.py)."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier").where(F.col("s_nationkey") % 3 == 0)

    pos = F.explode(F.array(*_bloom_positions(F.col("s_suppkey")))).alias("pos")
    words = (
        sup.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            # SQL form: the PySpark shiftleft wrapper only takes an int
            # shift amount, the SQL function shifts by an expression
            F.expr("shiftleft(CAST(1 AS BIGINT), pos % 64)").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .agg(F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("m"))
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(_BLOOM_WORDS - 1)),
                lambda w: F.coalesce(F.element_at("m", w), F.lit(0).cast("long")),
            ).alias("words")
        )
    )
    probe = _bloom_positions(F.col("l_suppkey"))
    probed = li.crossJoin(F.broadcast(words)).select(
        "*", *[p.alias(f"_p{i}") for i, p in enumerate(probe)]
    )
    hit = None
    for i in range(_BLOOM_K):
        one = F.expr(
            f"(shiftright(element_at(words, CAST(_p{i} / 64 AS INT) + 1), _p{i} % 64) & 1) = 1"
        )
        hit = one if hit is None else (hit & one)
    survivors = probed.where(hit)
    return (
        survivors.join(F.broadcast(sup.select("s_suppkey", "s_name")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("s_name")
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


# ------------------------------------------------------------- 2.5 windows

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
),
isl AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT)
           AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, count(*) AS streak FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(sum(streak) AS BIGINT) AS n_active_days,
       max(streak) AS max_streak
FROM streaks GROUP BY user_id ORDER BY user_id
"""


@query("win_streak_islands", "2.5 windows", _STREAK_ORACLE)
def win_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active days
    (distinct event dates; island key = date − row_number days, constant
    exactly while dates are contiguous) — the classic sessionization-
    by-calendar window problem. One distinct on (user, day) — map-side
    partial — then one window pass partitioned by user_id (150× the
    parallelism of a global window) and two keyed counts. Integer date
    arithmetic only, so no engine drift."""
    e = load(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id", "d", F.date_sub("d", F.row_number().over(w)).alias("island")
    )
    streaks = isl.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("streak"))
    return (
        streaks.groupBy("user_id")
        .agg(F.sum("streak").alias("n_active_days"), F.max("streak").alias("max_streak"))
        .orderBy("user_id")
    )


_MOM_ORACLE = """
WITH m AS (
  SELECT c_mktsegment,
         (CAST(year(o_orderdate) AS BIGINT) - 1995) * 12 + month(o_orderdate) AS x,
         round(sum(o_totalprice), 2) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, x
)
SELECT c_mktsegment, x AS ym,
       round((rev - lag(rev) OVER w) / lag(rev) OVER w, 4) AS mom_change
FROM m
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY x)
ORDER BY c_mktsegment, ym
"""


@query("win_pct_change_mom", "2.5 windows", _MOM_ORACLE)
def win_pct_change_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change per market segment — the standard
    KPI window, built scale-correctly: the fact stream first collapses to
    a (segment, month) series (map-side-combinable agg; the customer dim
    broadcasts), and ONLY that tiny series is window-sorted — lag runs
    over ~80 rows per segment, not 15k orders. Revenue snaps to 2 decimals
    BEFORE the ratio, so both engines divide identical doubles; first
    month per segment is NULL by lag semantics."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    x = ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")).cast("long")
    m = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", x.alias("x"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("x")
    prev = F.lag("rev").over(w)
    return m.select(
        "c_mktsegment",
        F.col("x").alias("ym"),
        F.round((F.col("rev") - prev) / prev, 4).alias("mom_change"),
    ).orderBy("c_mktsegment", "ym")


_FFILL_ORACLE = """
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN round(value, 2) END AS pval
  FROM events
),
f AS (
  SELECT user_id, event_id,
         last_value(pval IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS last_purchase_value
  FROM s
)
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CASE WHEN last_purchase_value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_before_first,
       round(max(last_purchase_value), 2) AS max_carried
FROM f GROUP BY user_id ORDER BY user_id
"""


@query("win_ignore_nulls_ffill", "2.5 windows", _FFILL_ORACLE)
def win_ignore_nulls_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill via IGNORE NULLS — the standard last-observation-
    carried-forward window (`last_value(x IGNORE NULLS)` /
    `F.last(x, ignorenulls=True)`): every event carries the most recent
    purchase value of its user, NULL before the first purchase. The
    per-user rollup keeps output compact while pinning the fill semantics
    (NULL-gap counting + carried maxima). One window pass partitioned by
    user_id; forward-fill at 100 TB is exactly this shape, never a
    self-join."""
    e = load(spark, sf_dir, "events")
    pval = F.when(F.col("event_type") == "purchase", F.round("value", 2))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    f = e.select(
        "user_id",
        F.last(pval, ignorenulls=True).over(w).alias("last_purchase_value"),
    )
    return (
        f.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("last_purchase_value").isNull().cast("long")).alias("n_before_first"),
            F.round(F.max("last_purchase_value"), 2).alias("max_carried"),
        )
        .orderBy("user_id")
    )


_CSV_EDGE_ORACLE = """
WITH f AS (
  SELECT n_nationkey,
         n_name || ', "region ' || CAST(n_regionkey AS VARCHAR) || '"' || chr(10)
           || 'line2 of ' || n_name AS note
  FROM nation
)
SELECT count(*) AS n_rows,
       CAST(sum(length(note)) AS BIGINT) AS total_chars,
       CAST(sum(CASE WHEN contains(note, chr(10)) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_multiline,
       count(DISTINCT n_nationkey) AS n_keys
FROM f
"""


@query("scan_csv_multiline_quoted", "2.1 scans", _CSV_EDGE_ORACLE)
def scan_csv_multiline_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV quoting edge cases, round-tripped LIVE: a synthesized field with
    embedded commas, double quotes, AND newlines writes through Spark's
    CSV sink (quoted + escaped) and reads back with multiLine=true — the
    ingestion reality of feeds with free-text columns, where naive
    line-splitting corrupts rows. The oracle recomputes the aggregate from
    the closed-form field, so ANY quoting/escaping/multiline bug (row
    count drift from split records, char loss from mangled escapes)
    hash-fails. Note multiLine CSV is NOT line-splittable at 100 TB — a
    feed like this should land once and convert to parquet immediately,
    which is exactly what this round-trip stages."""
    import hashlib
    import os
    import tempfile

    n = load(spark, sf_dir, "nation")
    note = F.concat(
        F.col("n_name"),
        F.lit(', "region '),
        F.col("n_regionkey").cast("string"),
        F.lit('"\nline2 of '),
        F.col("n_name"),
    )
    # pid-keyed staging (the _derby_url precedent): a concurrent process —
    # e.g. the vanilla-session subprocess gate — must never race this
    # process's overwrite-then-read on the same directory
    tag = hashlib.md5(f"csvedge:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), f"hdc_csvedge_{tag}")
    n.select("n_nationkey", note.alias("note")).write.mode("overwrite").option(
        "header", True
    ).option("quoteAll", True).csv(out)
    back = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .schema("n_nationkey int, note string")
        .csv(out)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("note")).alias("total_chars"),
        F.sum(F.col("note").contains("\n").cast("long")).alias("n_multiline"),
        F.countDistinct("n_nationkey").alias("n_keys"),
    )


# ------------------------------------------------ round-4 batch 4 (9 qids)

_LAMBDA_ORACLE = """
WITH a AS (
  SELECT o_orderkey, range(1, 2 + o_orderkey % 5) AS arr FROM orders
),
d AS (
  SELECT o_orderkey,
         CAST(list_sum(list_transform(arr, x -> x * x)) AS BIGINT) AS sq_sum,
         CAST(len(list_filter(arr, x -> x % 2 = 0)) AS INT) AS n_even,
         len(list_filter(arr, x -> x > 3)) > 0 AS has_gt3,
         len(list_filter(arr, x -> x > 0)) = len(arr) AS all_pos,
         CAST(list_sum(list_transform(range(1, len(arr) + 1),
                                      i -> arr[i] * i)) AS BIGINT) AS idx_dot
  FROM a
)
SELECT CAST(sum(sq_sum) AS BIGINT) AS total_sq,
       CAST(sum(n_even) AS BIGINT) AS total_even,
       CAST(sum(CASE WHEN has_gt3 THEN 1 ELSE 0 END) AS BIGINT) AS n_has_gt3,
       CAST(sum(CASE WHEN all_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_all_pos,
       CAST(sum(idx_dot) AS BIGINT) AS total_idx_dot
FROM d
"""


@query("fn_array_lambda_suite", "2.7 scalar functions", _LAMBDA_ORACLE)
def fn_array_lambda_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lambda half of the higher-order array API — transform, filter,
    exists, forall, and an index-aware zip_with — over derived integer
    arrays (`sequence(1, 1 + key % 5)`), complementing fn_array_suite's
    transform/aggregate pair. Pure integer math, so every rollup is exact
    int64 in both engines. All map-side expressions until one global
    aggregate; HOFs run interpreted (no codegen) but shuffle nothing."""
    o = load(spark, sf_dir, "orders")
    arr = F.sequence(F.lit(1), (F.lit(1) + F.col("o_orderkey") % 5).cast("int"))
    d = o.select(
        F.aggregate(
            F.transform(arr, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sq_sum"),
        F.size(F.filter(arr, lambda x: x % 2 == 0)).alias("n_even"),
        F.exists(arr, lambda x: x > 3).alias("has_gt3"),
        F.forall(arr, lambda x: x > 0).alias("all_pos"),
        F.aggregate(
            F.zip_with(
                arr,
                F.sequence(F.lit(1), F.size(arr)),
                lambda x, i: (x * i).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("idx_dot"),
    )
    return d.agg(
        F.sum("sq_sum").alias("total_sq"),
        F.sum(F.col("n_even").cast("long")).alias("total_even"),
        F.sum(F.col("has_gt3").cast("long")).alias("n_has_gt3"),
        F.sum(F.col("all_pos").cast("long")).alias("n_all_pos"),
        F.sum("idx_dot").alias("total_idx_dot"),
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
