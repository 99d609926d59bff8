"""SURVEY.md §2 — round-3 data-operations extension, batch 2 (split out
of dataops.py in r5; registration stays contiguous with dataops so the
rotation ledger's never-checked ordering is unchanged).

2.3 joins: join_range_bucketized, hier_flatten_path; 2.8 sync core:
dq_profile_columns, sync_conflict_lww, sync_missing_keys,
sync_partition_repair, pipeline_observe_metrics; 2.9 multimodal_phash_dedup;
2.10 stream_join_outer_replay; 2.5 win_cumulative_distinct; 2.4
agg_decimal_exact; 2.7 fn_try_arithmetic, fn_variant_semistructured;
2.1 pyds_custom_sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.plans.dataops import _partition_digest
from hdc_dataengineering_sqlsync_spark.plans.sync import _TARGET_SQL, _source, _target
from hdc_dataengineering_sqlsync_spark.registry import load



_RANGE_BUCKET_ORACLE = """
WITH probe AS (
  SELECT o_orderkey AS k,
         o_orderdate - INTERVAL 3 DAY AS lo,
         o_orderdate + INTERVAL 3 DAY AS hi
  FROM orders WHERE o_orderkey % 500 = 0
)
SELECT probe.k, CAST(count(o.o_orderkey) AS BIGINT) AS n_in_window
FROM probe LEFT JOIN orders o
  ON o.o_orderdate >= probe.lo AND o.o_orderdate <= probe.hi
GROUP BY probe.k ORDER BY probe.k
"""

_WEEK = 7 * 86400


@query("join_range_bucketized", "2.3 joins", _RANGE_BUCKET_ORACLE)
def join_range_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-range (no equi-key) join executed as an EQUI join on overlap
    cells — the 100 TB strategy SCALE.md documents for range predicates:
    bucketize time into 1-week cells, explode each probe interval (±3 days,
    so ≤2 cells) onto the cells it covers, give each point row its single
    cell, equi-join on the cell, then re-check the exact range predicate.
    A point's cell is unique, so each (probe, point) pair matches at most
    once — no dedup pass. The oracle runs the naive theta join.

    Why it matters: Spark executes a bare range predicate as a
    nested-loop/cartesian join — quadratic at scale. The cell join hashes
    and shuffles on the cell key like any equi join (plan-asserted: no
    BroadcastNestedLoopJoin), at the cost of interval_span/cell_width
    probe-side replication.
    """
    o = load(spark, sf_dir, "orders")
    probe = (
        o.where(F.col("o_orderkey") % 500 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_orderdate") - F.expr("INTERVAL 3 DAY")).alias("lo"),
            (F.col("o_orderdate") + F.expr("INTERVAL 3 DAY")).alias("hi"),
        )
        .withColumn(
            "cell",
            F.explode(
                F.sequence(
                    F.expr(f"unix_seconds(lo) div {_WEEK}"),
                    F.expr(f"unix_seconds(hi) div {_WEEK}"),
                )
            ),
        )
    )
    points = o.select(
        F.col("o_orderkey").alias("pk"),
        F.col("o_orderdate").alias("t"),
        F.expr(f"unix_seconds(o_orderdate) div {_WEEK}").alias("cell"),
    )
    j = probe.join(
        points,
        (probe["cell"] == points["cell"])
        & (points["t"] >= probe["lo"])
        & (points["t"] <= probe["hi"]),
        "left",
    )
    return (
        j.groupBy("k")
        .agg(F.count("pk").alias("n_in_window"))
        .orderBy("k")
    )


_PROFILE_ORACLE = """
SELECT * FROM (
  SELECT 'c_acctbal' AS col_name,
         (SELECT count(*) - count(c_acctbal) FROM customer) AS n_null,
         (SELECT count(DISTINCT c_acctbal) FROM customer) AS n_distinct
  UNION ALL
  SELECT 'c_custkey',
         (SELECT count(*) - count(c_custkey) FROM customer),
         (SELECT count(DISTINCT c_custkey) FROM customer)
  UNION ALL
  SELECT 'c_mktsegment',
         (SELECT count(*) - count(c_mktsegment) FROM customer),
         (SELECT count(DISTINCT c_mktsegment) FROM customer)
  UNION ALL
  SELECT 'c_name',
         (SELECT count(*) - count(c_name) FROM customer),
         (SELECT count(DISTINCT c_name) FROM customer)
  UNION ALL
  SELECT 'c_nationkey',
         (SELECT count(*) - count(c_nationkey) FROM customer),
         (SELECT count(DISTINCT c_nationkey) FROM customer)
)
ORDER BY col_name
"""


@query("dq_profile_columns", "2.8 sync core", _PROFILE_ORACLE)
def dq_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the schema-exploration sibling of the constraint
    audit: per column of customer, null count and exact distinct count, as
    `(col_name, n_null, n_distinct)` rows.

    One aggregate over one scan computes every column's counters (Catalyst
    plans multi-distinct via a single Expand), then the counters unpivot to
    rows driver-free. At 100 TB swap `countDistinct` for
    `approx_count_distinct` — same plan shape, one pass, no Expand blowup
    (documented rather than declared: the HLL estimate is engine-specific
    so it cannot hash-match an oracle).
    """
    c = load(spark, sf_dir, "customer")
    cols = sorted(c.columns)
    aggs = []
    for name in cols:
        aggs.append((F.count(F.lit(1)) - F.count(name)).alias(f"__null_{name}"))
        aggs.append(F.countDistinct(name).alias(f"__dist_{name}"))
    one = c.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col(f"__null_{name}").cast("long").alias("n_null"),
                F.col(f"__dist_{name}").cast("long").alias("n_distinct"),
            )
            for name in cols
        ]
    )
    return one.select(F.inline(rows)).orderBy("col_name")


_LWW_ORACLE = """
WITH ra AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 7 = 0 THEN 'A' ELSE o_orderstatus END AS st,
         1 + o_orderkey % 3 AS v, 0 AS r
  FROM orders
),
rb AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN 'B' ELSE o_orderstatus END,
         1 + (o_orderkey + 1) % 3, 1
  FROM orders
),
u AS (SELECT * FROM ra UNION ALL SELECT * FROM rb),
res AS (SELECT k, arg_max(st, v * 10 + r) AS st FROM u GROUP BY k)
SELECT st AS o_orderstatus, count(*) AS n FROM res GROUP BY st ORDER BY st
"""


@query("sync_conflict_lww", "2.8 sync core", _LWW_ORACLE)
def sync_conflict_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional-sync conflict resolution, last-writer-wins: two
    deterministically drifted replicas of orders (each stamped with a
    per-row version and a replica id) union and collapse to one winner per
    key by `max_by(payload, version*10 + replica_rank)` — version first,
    replica rank as the deterministic tiebreak. Output is the per-status
    census of the resolved table.

    Scale: resolution is ONE keyed aggregate over the union (map-side
    combinable — max_by is associative); no join, no window sort. This is
    the multi-master counterpart of `sync_changelog_compact`'s
    single-stream version collapse.
    """
    o = load(spark, sf_dir, "orders")
    ra = o.select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 7 == 0, "A").otherwise(F.col("o_orderstatus")).alias("st"),
        (1 + F.col("o_orderkey") % 3).alias("v"),
        F.lit(0).alias("r"),
    )
    rb = o.select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 5 == 0, "B").otherwise(F.col("o_orderstatus")).alias("st"),
        (1 + (F.col("o_orderkey") + 1) % 3).alias("v"),
        F.lit(1).alias("r"),
    )
    resolved = (
        ra.unionByName(rb)
        .groupBy("k")
        .agg(F.expr("max_by(st, v * 10 + r)").alias("o_orderstatus"))
    )
    return (
        resolved.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


_FLATTEN_PATH_ORACLE = """
WITH RECURSIVE walk(k, path) AS (
  SELECT c_custkey, cast(c_custkey AS VARCHAR) FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, concat(w.path, '/', cast(c.c_custkey AS VARCHAR))
  FROM customer c JOIN walk w ON c.c_custkey // 10 = w.k
  WHERE c.c_custkey >= 10
)
SELECT CAST(length(path) - length(replace(path, '/', '')) AS INT) AS depth,
       count(*) AS n, min(path) AS min_path, max(path) AS max_path
FROM walk GROUP BY depth ORDER BY depth
"""


@query("hier_flatten_path", "2.3 joins", _FLATTEN_PATH_ORACLE)
def hier_flatten_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-path flattening of the synthetic key hierarchy
    (parent(k) = k DIV 10, as hier_recursive_cte): each node's full
    root-to-node path as a '/'-separated string — the denormalized
    hierarchy table shape downstream filters use (`path LIKE 'root/%'`)
    instead of re-walking the recursion per query.

    Depth is data-bounded (log10 of the key space) so the recursion is a
    handful of distributed self-joins; per-level frames stay partitioned on
    the join key.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH RECURSIVE walk(k, path) AS (
          SELECT c_custkey, cast(c_custkey AS STRING) FROM customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, concat(w.path, '/', cast(c.c_custkey AS STRING))
          FROM customer c JOIN walk w ON c.c_custkey DIV 10 = w.k
          WHERE c.c_custkey >= 10
        )
        SELECT CAST(length(path) - length(replace(path, '/', '')) AS INT) AS depth,
               count(*) AS n, min(path) AS min_path, max(path) AS max_path
        FROM walk GROUP BY depth ORDER BY depth
        """
    )


_PHASH_ORACLE = """
SELECT cast(min(doc_id) AS BIGINT) AS rep_id, count(*) AS n
FROM documents
GROUP BY doc_id % 4 ORDER BY rep_id
"""


@query("multimodal_phash_dedup", "2.9 llm-data", _PHASH_ORACLE)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup over the REAL BMP codec: every document
    gets a synthesized image whose pixels depend only on doc_id % 4 (four
    distinct gradient classes), the bytes round-trip through encode_bmp /
    decode_bmp, and a 64-bit dHash (grayscale -> 9x8 nearest-neighbor
    resize -> horizontal gradient sign bits) computes inside the SAME
    mapInPandas pass — blobs never shuffle, only (doc_id, phash) rows do.
    Groups of equal dHash collapse to (representative = min doc_id, n).

    The oracle recomputes the grouping from the closed form (doc_id % 4):
    it matches iff the codec round-trip is lossless AND dHash is constant
    within a class and distinct across classes — a decode bug (stride,
    BGR order, bottom-up flip) or a hash bug breaks the match. The
    near-dup threshold path (hamming <= k via band-bucketing, as
    dedup_simhash) is unit-tested on perturbed images.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
    )
    from hdc_dataengineering_sqlsync_spark.operators.multimodal import dhash64

    def _pixels(q: int) -> np.ndarray:
        # q-period checkerboards: distinct horizontal-gradient SIGN patterns
        # per class (a monotone gradient would give every class the same
        # all-ones dHash — probed)
        w = 8 + (q % 5) * 4
        h = 6 + (q % 3) * 4
        y, x = np.mgrid[0:h, 0:w]
        r = 255 * (((x + y) // (q + 1)) % 2)
        g = 255 * ((x // (q + 1)) % 2)
        b = (37 * q + 11 * x + 23 * y) % 256
        return np.stack([r, g, b], axis=2).astype(np.uint8)

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("phash", T.LongType())]
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for m in pdf["doc_id"]:
                payload = encode_bmp(_pixels(int(m) % 4))
                hashes.append(dhash64(decode_bmp(payload), resize_nearest))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": hashes})

    docs = load(spark, sf_dir, "documents").select("doc_id")
    hashed = docs.mapInPandas(hash_batch, schema=schema)
    return (
        hashed.groupBy("phash")
        .agg(F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("n"))
        .select("rep_id", "n")
        .orderBy("rep_id")
    )


_STREAM_OUTER_ORACLE = """
WITH mx AS (SELECT max(ts) AS m FROM events),
v AS (
  SELECT user_id, ts, event_id FROM events, mx
  WHERE event_type = 'view' AND ts <= m - INTERVAL 150 MINUTE
),
j AS (
  SELECT v.user_id, v.event_id AS v_id, p.ts AS p_ts
  FROM v LEFT JOIN events p
    ON p.user_id = v.user_id AND p.event_type = 'purchase'
   AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
)
SELECT user_id,
       CAST(count(DISTINCT v_id) AS BIGINT) AS n_views,
       CAST(count(p_ts) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT v_id) - count(DISTINCT CASE WHEN p_ts IS NOT NULL THEN v_id END) AS BIGINT) AS n_lonely
FROM j GROUP BY user_id ORDER BY user_id
"""


@query("stream_join_outer_replay", "2.10 streaming", _STREAM_OUTER_ORACLE)
def stream_join_outer_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE stream-stream LEFT OUTER interval join — the hard half of
    stream joins: an unmatched view row may only be emitted (null-extended)
    once the purchase-side watermark proves no match can still arrive, so
    this qid is an end-to-end proof of watermark-driven state expiry, not
    just of matching. availableNow runs a final no-data micro-batch that
    advances the watermark to max event time, flushing every expired
    window.

    Determinism at the stream tail: views younger than (max_ts - 2.5h) may
    still be open when the replay drains, so BOTH the drained-result rollup
    and the batch oracle cut off at `ts <= max(ts) - 150 minutes` — beyond
    that margin emission is guaranteed (watermark delay 1h + window 1h +
    30min slack, no boundary equality). Per user: n_views, matched pair
    count, and views that expired with NO purchase (n_lonely) — the outer
    rows.
    """
    from hdc_dataengineering_sqlsync_spark.streaming.jobs import (
        events_path,
        interval_join_view_purchase,
        read_events_stream,
        run_to_memory,
    )

    left = read_events_stream(spark, events_path(sf_dir))
    right = read_events_stream(spark, events_path(sf_dir))
    view, q = run_to_memory(
        interval_join_view_purchase(left, right, how="left_outer"), mode="append"
    )
    q.stop()
    cutoff = (
        load(spark, sf_dir, "events")
        .agg((F.max("ts") - F.expr("INTERVAL 150 MINUTE")).alias("m"))
    )
    drained = spark.table(view).crossJoin(F.broadcast(cutoff)).where(F.col("v_ts") <= F.col("m"))
    return (
        drained.groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.countDistinct("v_id").alias("n_views"),
            F.count("p_ts").alias("n_pairs"),
            (
                F.countDistinct("v_id")
                - F.countDistinct(F.when(F.col("p_ts").isNotNull(), F.col("v_id")))
            ).alias("n_lonely"),
        )
        .orderBy("user_id")
    )


_MISSING_KEYS_ORACLE = f"""
WITH target AS ({_TARGET_SQL}),
k AS (SELECT o_orderkey AS k FROM target),
g AS (
  SELECT k, k - lag(k) OVER (ORDER BY k) - 1 AS gap_len
  FROM k
)
SELECT CAST((SELECT count(*) FROM g WHERE gap_len > 0) AS BIGINT) AS n_gaps,
       CAST((SELECT coalesce(sum(gap_len), 0) FROM g WHERE gap_len > 0) AS BIGINT) AS total_missing,
       CAST((SELECT coalesce(max(gap_len), 0) FROM g) AS BIGINT) AS max_gap,
       (SELECT min(k) FROM k) AS key_lo,
       (SELECT max(k) FROM k) AS key_hi
"""


@query("sync_missing_keys", "2.8 sync core", _MISSING_KEYS_ORACLE)
def sync_missing_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-sequence gap audit on the sync target: detect ranges of primary
    keys missing from an expected-contiguous keyspace (here the %97
    deletion fixture) — the fast 'did the transfer drop rows?' check that
    needs no source access at all. Reports gap count, total missing keys,
    the longest gap, and the observed key range.

    The lag-window form shown here needs one global sort; the SCALE.md
    decomposition for 100 TB keyspaces: `total_missing` is pure aggregate
    math ((hi - lo + 1) - count) — no sort at all — and gap LOCATIONS
    decompose per key-block (k div B) with only block-boundary gaps needing
    a tiny cross-block merge over the #blocks-row summary.
    """
    t = _target(spark, sf_dir).select(F.col("o_orderkey").alias("k"))
    w = Window.orderBy("k")
    g = t.select("k", (F.col("k") - F.lag("k").over(w) - 1).alias("gap_len"))
    return g.agg(
        F.coalesce(F.sum((F.col("gap_len") > 0).cast("long")), F.lit(0)).alias("n_gaps"),
        F.coalesce(F.sum(F.when(F.col("gap_len") > 0, F.col("gap_len"))), F.lit(0)).alias("total_missing"),
        F.coalesce(F.max("gap_len"), F.lit(0)).alias("max_gap"),
        F.min("k").alias("key_lo"),
        F.max("k").alias("key_hi"),
    )


_CUM_DISTINCT_ORACLE = """
WITH first_seen AS (
  SELECT l_returnflag, l_suppkey,
         min(date_trunc('month', l_shipdate)) AS first_month
  FROM lineitem GROUP BY l_returnflag, l_suppkey
),
monthly AS (
  SELECT l_returnflag, first_month AS month, count(*) AS n_new
  FROM first_seen GROUP BY l_returnflag, first_month
)
SELECT l_returnflag, cast(month AS DATE) AS month,
       CAST(n_new AS BIGINT) AS n_new_suppliers,
       CAST(sum(n_new) OVER (PARTITION BY l_returnflag ORDER BY month) AS BIGINT) AS cum_distinct
FROM monthly ORDER BY l_returnflag, month
"""


@query("win_cumulative_distinct", "2.5 windows", _CUM_DISTINCT_ORACLE)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered window — which Spark forbids
    directly (DISTINCT is unsupported in window functions) and which the
    naive workaround (size(collect_set() OVER ...)) executes by
    materializing a growing set PER ROW — quadratic state at scale.

    The scalable rewrite declared here: distinct-counting reduces to FIRST
    APPEARANCES — aggregate each (flag, supplier) to its first month, roll
    first-appearances up per month, and a plain running SUM over the tiny
    monthly series equals the cumulative distinct count. Two keyed
    map-side-combinable aggregates + one window over #months rows.
    """
    li = load(spark, sf_dir, "lineitem")
    first_seen = li.groupBy("l_returnflag", "l_suppkey").agg(
        F.min(F.date_trunc("month", "l_shipdate")).alias("first_month")
    )
    monthly = first_seen.groupBy("l_returnflag", F.col("first_month").alias("month")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.partitionBy("l_returnflag").orderBy("month")
    return (
        monthly.select(
            "l_returnflag",
            F.col("month").cast("date").alias("month"),
            F.col("n_new").alias("n_new_suppliers"),
            F.sum("n_new").over(w).alias("cum_distinct"),
        )
        .orderBy("l_returnflag", "month")
    )


_REPAIR_ORACLE = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS part,
       count(*) AS n, 'same' AS status
FROM orders GROUP BY part ORDER BY part
"""


def _with_month_part(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "part", F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM")
    )


def _part_digests(df: DataFrame) -> DataFrame:
    return _partition_digest(df, part_expr=F.col("part"))


@query("sync_partition_repair", "2.8 sync core", _REPAIR_ORACLE)
def sync_partition_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The detect→repair completion of sync_partition_digest: the drifted
    target is staged as a month-partitioned parquet table, the digest
    pre-pass flags diff partitions, and ONLY those partitions are rewritten
    from source via dynamic partition overwrite
    (operators/maintenance.py::repair_partitions — untouched partitions'
    files stay physically in place, asserted in tests). The output
    re-digests the repaired table against source per partition; the oracle
    expects every partition 'same' with source's counts, so an incomplete
    or wrong repair hash-fails.

    Scale: detection is the map-side digest aggregate; repair I/O tracks
    the changed partitions only — the shape that makes a 100 TB
    mostly-unchanged table syncable in minutes.
    """
    import hashlib
    import os
    import tempfile

    from hdc_dataengineering_sqlsync_spark.operators.maintenance import repair_partitions

    src = _with_month_part(_source(spark, sf_dir))
    tgt = _with_month_part(_target(spark, sf_dir))
    tag = hashlib.md5(f"repair:{sf_dir}".encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"hdc_repair_{tag}")
    tgt.write.mode("overwrite").partitionBy("part").parquet(path)

    stored = spark.read.parquet(path)
    sp = _part_digests(src).alias("sp")
    tp = _part_digests(stored).alias("tp")
    flagged = (
        sp.join(tp, F.col("sp.part") == F.col("tp.part"), "full_outer")
        .where(
            ~(
                (F.col("sp.n") == F.col("tp.n"))
                & (F.col("sp.dg") == F.col("tp.dg"))
            ).eqNullSafe(True)
        )
        .select(F.coalesce("sp.part", "tp.part").alias("part"))
    )
    parts = [r["part"] for r in flagged.collect()]
    repair_partitions(spark, src, path, "part", parts)

    repaired = spark.read.parquet(path)
    rp = _part_digests(repaired).alias("rp")
    out = sp.join(rp, F.col("sp.part") == F.col("rp.part"), "full_outer").select(
        F.coalesce("sp.part", "rp.part").alias("part"),
        F.coalesce("rp.n", F.lit(0)).alias("n"),
        F.when(
            (F.col("sp.n") == F.col("rp.n")) & (F.col("sp.dg") == F.col("rp.dg")),
            "same",
        ).otherwise("diff").alias("status"),
    )
    return out.orderBy("part")


_DECIMAL_EXACT_ORACLE = """
SELECT l_returnflag,
       CAST(sum(cast(floor(l_extendedprice * 100 + 0.5) / 100 AS DECIMAL(18,2)))
            AS DECIMAL(28,2)) AS gross,
       CAST(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100
                     AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS net,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("agg_decimal_exact", "2.4 aggregations", _DECIMAL_EXACT_ORACLE)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money done right at 100 TB: amounts convert to DECIMAL(18,2) at the
    scan (via the tie-safe floor formula, since the fixture stores doubles)
    and every aggregate is EXACT integer decimal arithmetic — the result is
    identical for any aggregation order, partitioning, or retry, unlike
    double sums whose ulp drift depends on all three. The output stays
    DECIMAL end-to-end (both engines render sum(DECIMAL(18,2)) with scale
    2), so the t2 compare needs no rounding convention at all.

    Scale: decimal sums are map-side combinable like any sum; the cost of
    exactness is a 128-bit accumulator — noise next to shuffle I/O.
    """
    li = load(spark, sf_dir, "lineitem")

    def money(col):
        return (F.floor(col * 100 + F.lit(0.5)) / 100).cast("decimal(18,2)")

    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(money(F.col("l_extendedprice"))).alias("gross"),
            F.sum(money(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("net"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


_TRY_ARITH_ORACLE = """
SELECT l_returnflag,
       CAST(count(*) - count(l_extendedprice / nullif(l_discount, 0.0)) AS BIGINT) AS n_null_ratio,
       round(avg(l_extendedprice / nullif(l_discount, 0.0)), 2) AS avg_ratio,
       round(sum(l_quantity / nullif(l_tax, 0.0)), 2) AS sum_qty_per_tax
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("fn_try_arithmetic", "2.7 scalar functions", _TRY_ARITH_ORACLE)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface: ``try_divide`` yields NULL instead of
    raising (or silently producing inf) on zero denominators — the ANSI-mode
    -friendly form a pipeline uses so one bad row cannot fail a 100 TB job.
    DuckDB's equivalent spelling is ``x / nullif(y, 0)``; the per-flag
    rollup counts the rows the guard nulled out and aggregates the
    survivors.
    """
    li = load(spark, sf_dir, "lineitem")
    ratio = F.try_divide(F.col("l_extendedprice"), F.nullif(F.col("l_discount"), F.lit(0.0)))
    qpt = F.try_divide(F.col("l_quantity"), F.nullif(F.col("l_tax"), F.lit(0.0)))
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.count(F.lit(1)) - F.count(ratio)).alias("n_null_ratio"),
            F.round(F.avg(ratio), 2).alias("avg_ratio"),
            F.round(F.sum(qpt), 2).alias("sum_qty_per_tax"),
        )
        .orderBy("l_returnflag")
    )


_PYDS_SINK_ORACLE = """
SELECT o_orderstatus, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@query("pyds_custom_sink", "2.1 scans", _PYDS_SINK_ORACLE)
def pyds_custom_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE round-trip through a custom Python DataSource WRITER
    (sources/pydatasource.py::JsonLinesSinkDataSource) — the sink half of
    the Spark-4 Python DataSource surface, complementing the batch reader
    (pyds_custom_source) and stream reader (pyds_stream_source): the
    per-status orders rollup writes task-parallel through the DSv2
    two-phase commit (staged files -> driver commit rename + _SUCCESS),
    then the committed files read back and hash-match the oracle computed
    straight from orders. A lost partition, torn write, or missed commit
    breaks the match.
    """
    import hashlib
    import os
    import shutil
    import tempfile

    from hdc_dataengineering_sqlsync_spark.sources.pydatasource import (
        JsonLinesSinkDataSource,
    )

    spark.dataSource.register(JsonLinesSinkDataSource)
    agg = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )
    tag = hashlib.md5(f"pysink:{sf_dir}".encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"hdc_pysink_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    agg.repartition(3).write.format("jsonl_sink").option("path", path).mode("append").save()
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    back = spark.read.schema("o_orderstatus string, n bigint, total double").json(path)
    return back.orderBy("o_orderstatus")


_VARIANT_ORACLE = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(count(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


@query("fn_variant_semistructured", "2.7 scalar functions", _VARIANT_ORACLE)
def fn_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data via Spark 4's VARIANT type: the JSON props
    column parses ONCE into a binary variant (`parse_json`) and typed
    fields extract with `variant_get` — unlike per-path string re-parsing
    (`get_json_object`, cf. fn_json_extract), the parse cost is paid once
    per row regardless of how many paths are read, which is the 100 TB
    difference for wide semi-structured payloads. Output is plain scalars
    (the variant never crosses the t2 boundary, per SURVEY conventions).
    """
    e = load(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_with_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


_OBSERVE_ORACLE = """
SELECT * FROM (
  SELECT 'n_rows' AS metric, CAST(count(*) AS DOUBLE) AS value
  FROM lineitem WHERE l_quantity > 10
  UNION ALL
  SELECT 'sum_qty', round(sum(l_quantity), 2)
  FROM lineitem WHERE l_quantity > 10
)
ORDER BY metric
"""


@query("pipeline_observe_metrics", "2.8 sync core", _OBSERVE_ORACLE)
def pipeline_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability without a second scan: ``df.observe()``
    attaches named aggregates that are computed DURING the main action —
    the mechanism a sync job uses to count/checksum the rows it writes
    without re-reading 100 TB for validation (cf. sync_rowcount_validate,
    which is the re-scan form). The observed metrics are returned as the
    declared result and must equal the oracle's independently-computed
    aggregates; the metric values ride the driver as scalars (that IS the
    API — metrics, not data).
    """
    from pyspark.sql import Observation

    obs = Observation("sync_write_metrics")
    filtered = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 10)
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )
    filtered.write.format("noop").mode("overwrite").save()  # the "sync write"
    m = obs.get
    return spark.createDataFrame(
        [("n_rows", float(m["n_rows"])), ("sum_qty", float(m["sum_qty"]))],
        "metric string, value double",
    ).orderBy("metric")
