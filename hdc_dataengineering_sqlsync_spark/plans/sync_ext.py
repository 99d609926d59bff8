"""SURVEY.md §2.8 sync-core extensions (split out of the round-4
modules, r5).

Bitemporal AS OF, CRDT merges (G-counter, OR-Set), Merkle anti-entropy,
snapshot+CDC handoff, tombstone GC, schema-evolution apply, and the IQR
outlier audit — the reference's sync domain beyond the first-wave core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load



# ----------------------------------------------------------- 2.8 sync core

_BITEMPORAL_ORACLE = """
WITH v AS (
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT)
           AS version
  FROM events
)
SELECT event_type, count(*) AS n_users,
       round(avg(version), 2) AS avg_version,
       max(version) AS max_version
FROM v
WHERE valid_from <= TIMESTAMP '2024-01-15 12:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 12:00:00')
GROUP BY event_type ORDER BY event_type
"""


@query("sync_bitemporal_asof", "2.8 sync core", _BITEMPORAL_ORACLE)
def sync_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) snapshot reconstruction over the SCD2 interval
    table sync_scd2_intervals builds: each user's version chain (valid_from
    = event ts, valid_to = next event's ts) filtered to the single version
    live at T = 2024-01-15 12:00 — `valid_from <= T < valid_to` with the
    open version unbounded. This is the time-travel read a sync target
    without a transactional table format still needs; at 100 TB the
    interval build is the same one-window pass as SCD2 and the AS OF is a
    map-side filter (never a join), so snapshot cost tracks the table, not
    the history depth. Output: per event-type census of the live versions
    (exactly one per user active before T)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.lit("2024-01-15 12:00:00").cast("timestamp")
    v = e.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
    )
    live = v.where(
        (F.col("valid_from") <= t) & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
    return (
        live.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("version"), 2).alias("avg_version"),
            F.max("version").alias("max_version"),
        )
        .orderBy("event_type")
    )


_IQR_ORACLE = """
WITH fences AS (
  SELECT o_orderpriority,
         round(quantile_cont(o_totalprice, 0.25), 4) AS q1,
         round(quantile_cont(o_totalprice, 0.75), 4) AS q3
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority AS priority, count(*) AS n,
       CAST(sum(CASE WHEN o.o_totalprice < f.q1 - 1.5 * (f.q3 - f.q1)
                       OR o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(CAST(sum(CASE WHEN o.o_totalprice < f.q1 - 1.5 * (f.q3 - f.q1)
                             OR o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1)
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS outlier_frac
FROM orders o JOIN fences f USING (o_orderpriority)
GROUP BY priority ORDER BY priority
"""


@query("dq_outlier_iqr", "2.8 sync core", _IQR_ORACLE)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier census per group: exact interpolated quartiles of
    o_totalprice per priority, 1.5×IQR fences, per-group outlier counts —
    the distributional sibling of dq_constraint_report's rule audit.

    Determinism: quartiles snap-round at scale 4 first (the agg_percentile
    ulp-snap technique, but at QUARTER-quantile precision: 0.25/0.75
    interpolation fractions over 2-decimal money terminate at FOUR
    decimals — e.g. (100.01, 100.02, frac .25) → 100.0125 — so a scale-3
    snap would itself sit on .xxx5 repr ties where the engines' rounding
    genuinely differs; at scale 4 the true value is never a tie), after
    which `1.5*(q3-q1)` and the fence comparisons are identical IEEE
    arithmetic on identical doubles in both engines. Shape: one grouped
    percentile agg to #groups rows, broadcast back onto the scan
    (map-side fence test), one partial+final count agg — two scans, no
    window sort."""
    o = load(spark, sf_dir, "orders")
    fences = o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("q1"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("o_totalprice") < F.col("q1") - 1.5 * iqr) | (
        F.col("o_totalprice") > F.col("q3") + 1.5 * iqr
    )
    return (
        o.join(F.broadcast(fences), "o_orderpriority")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
            F.round(
                F.sum(is_out.cast("long")).cast("double") / F.count(F.lit(1)), 4
            ).alias("outlier_frac"),
        )
        .orderBy("priority")
    )


_TOMBSTONE_ORACLE = """
WITH log AS (
  SELECT o_orderkey AS key, v.v AS version,
         CASE (o_orderkey + v.v) % 4 WHEN 0 THEN 'D' WHEN 1 THEN 'I' ELSE 'U' END AS op
  FROM orders, unnest(range(1, 2 + o_orderkey % 3)) AS v(v)
),
latest AS (
  SELECT key, arg_max(op, version) AS last_op, max(version) AS last_v
  FROM log GROUP BY key
)
SELECT count(*) AS n_keys,
       CAST(sum(CASE WHEN last_op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstones,
       CAST(sum(CASE WHEN last_op = 'D' AND last_v < 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(sum(CASE WHEN last_op = 'D' AND last_v >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retained,
       CAST(sum(CASE WHEN last_op <> 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_live
FROM latest
"""


@query("sync_tombstone_retention", "2.8 sync core", _TOMBSTONE_ORACLE)
def sync_tombstone_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone retention audit — the garbage-collection decision a
    log-compacted sync target must make: keys whose LATEST changelog op is a
    delete are tombstones, and tombstones last written before the retention
    watermark (version < 2 in this derived fixture, the
    sync_changelog_compact convention) can be physically dropped; newer
    ones must be retained so lagging consumers still observe the delete.
    One explode + one keyed max_by/max aggregate (map-side combinable) to
    #keys rows, then a single global conditional rollup — no windows, no
    joins, which is what lets a 100 TB compaction pass decide drops in one
    shuffle."""
    o = load(spark, sf_dir, "orders")
    log = o.select(
        F.col("o_orderkey").alias("key"),
        F.explode(F.sequence(F.lit(1), (F.lit(1) + F.col("o_orderkey") % 3).cast("int"))).alias(
            "version"
        ),
    ).select(
        "key",
        "version",
        F.when((F.col("key") + F.col("version")) % 4 == 0, F.lit("D"))
        .when((F.col("key") + F.col("version")) % 4 == 1, F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    latest = log.groupBy("key").agg(
        F.max_by("op", "version").alias("last_op"), F.max("version").alias("last_v")
    )
    is_tomb = F.col("last_op") == "D"
    return latest.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(is_tomb.cast("long")).alias("n_tombstones"),
        F.sum((is_tomb & (F.col("last_v") < 2)).cast("long")).alias("n_dropped"),
        F.sum((is_tomb & (F.col("last_v") >= 2)).cast("long")).alias("n_retained"),
        F.sum((~is_tomb).cast("long")).alias("n_live"),
    )


_EVOLVE_ORACLE = """
SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN o_orderkey % 97 = 0 OR o_orderkey % 101 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_channel,
       CAST(sum(CASE WHEN o_orderkey % 97 <> 0 AND o_orderkey % 101 <> 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_null_channel,
       round(sum(o_totalprice), 2) AS total
FROM orders
"""


@query("sync_schema_evolution_apply", "2.8 sync core", _EVOLVE_ORACLE)
def sync_schema_evolution_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE apply under ADDITIVE SCHEMA EVOLUTION: the source grew a new
    column (o_channel) the target never had. The changeset-driven apply
    (the sync_merge_apply shape) upserts touched rows WITH the new column
    while untouched target rows carry NULL — additive drift needs no
    rewrite of historical rows, exactly the 100 TB posture of
    scan_schema_merge's footer-level evolution, now proven through the
    MERGE write path. Fixture: standard derived drift (target missing
    %97 keys = inserts, %101 status-drifted = updates); converged row set
    equals source, and the oracle pins WHICH rows carry the new column
    (only the touched ones), so an over-eager backfill or a dropped
    column both hash-fail."""
    o = load(spark, sf_dir, "orders")
    channel = (F.col("o_orderkey") % 3).cast("int").alias("o_channel")
    source = o.select("*", channel)
    target = (
        o.where(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 101 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")),
        )
    )
    # changeset: inserts (missing in target) + updates (digest differs) —
    # keyed on PK; the evolved column rides only the source-sourced rows
    # The changeset is small by construction (~1-2% of keys) but feeds the
    # anti-join AND the union; checkpoint it once so the source-vs-target
    # diff join doesn't recompute (r10 plan audit: 5 fact scans in one plan
    # without this).
    upserts = (
        source.join(
            target.select(F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("st")),
            (F.col("o_orderkey") == F.col("k")),
            "left",
        )
        .where(F.col("k").isNull() | (F.col("st") != F.col("o_orderstatus")))
        .select(source.columns)
        .localCheckpoint(eager=True)
    )
    kept = target.join(upserts.select("o_orderkey"), "o_orderkey", "left_anti").withColumn(
        "o_channel", F.lit(None).cast("int")
    )
    merged = kept.unionByName(upserts)
    return merged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("o_channel").isNotNull().cast("long")).alias("n_with_channel"),
        F.sum(F.col("o_channel").isNull().cast("long")).alias("n_null_channel"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


_GCOUNTER_ORACLE = """
WITH obs AS (
  SELECT o_orderkey AS key, r.r AS replica, o.o AS obs_idx,
         (o_orderkey * 7 + r.r * 13 + o.o * 3) % 100 AS observed
  FROM orders,
       (SELECT unnest(range(0, 3)) AS r) r,
       (SELECT unnest(range(0, 2)) AS o) o
),
merged AS (
  SELECT key, replica, max(observed) AS state FROM obs GROUP BY key, replica
),
totals AS (
  SELECT key, CAST(sum(state) AS BIGINT) AS counter_value FROM merged GROUP BY key
)
SELECT CAST(key % 4 AS INT) AS key_class, count(*) AS n_keys,
       CAST(sum(counter_value) AS BIGINT) AS total,
       CAST(max(counter_value) AS BIGINT) AS max_counter
FROM totals GROUP BY key_class ORDER BY key_class
"""


@query("sync_crdt_gcounter", "2.8 sync core", _GCOUNTER_ORACLE)
def sync_crdt_gcounter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRDT G-counter merge — the convergence algebra under multi-master
    sync when replicas cannot coordinate: each replica's per-key slot only
    grows, merge = elementwise MAX of replica slots (associative,
    commutative, idempotent — re-delivered states merge harmlessly), value
    = sum of merged slots. The fixture derives two observed states per
    (key, replica); a LWW resolver (sync_conflict_lww) would pick one
    writer, the G-counter keeps every replica's contribution. Two keyed
    map-side-combinable aggregates (MAX then SUM) — merge cost is one
    shuffle regardless of how many stale states are re-delivered."""
    o = load(spark, sf_dir, "orders")
    obs = (
        o.select(F.col("o_orderkey").alias("key"))
        .select("key", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("replica"))
        .select("key", "replica", F.explode(F.sequence(F.lit(0), F.lit(1))).alias("obs_idx"))
        .select(
            "key",
            "replica",
            ((F.col("key") * 7 + F.col("replica") * 13 + F.col("obs_idx") * 3) % 100).alias(
                "observed"
            ),
        )
    )
    merged = obs.groupBy("key", "replica").agg(F.max("observed").alias("state"))
    totals = merged.groupBy("key").agg(F.sum("state").alias("counter_value"))
    return (
        totals.groupBy((F.col("key") % 4).cast("int").alias("key_class"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("counter_value").alias("total"),
            F.max("counter_value").alias("max_counter"),
        )
        .orderBy("key_class")
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
