"""SURVEY.md §2 round-5 additions, batch AA.

Consistent-hash ring assignment with a rebalance audit. Registered after
``roundfive_q`` (plans/__init__.py) so the qids append to the END of the
never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import duck_md5_int, query
from hdc_dataengineering_sqlsync_spark.registry import load

# Ring positions are md5-derived 24-bit integers, minted from closed-form
# vnode labels — the same engine-portable hash discipline as
# mix_shard_balance_audit.  V base vnodes, plus one candidate vnode for
# the rebalance audit.
_V_BASE = 16

def _pos_duck(expr: str) -> str:
    return duck_md5_int(expr, 6)


_RING_ORACLE = f"""
WITH vn AS (
  SELECT v, {_pos_duck("'vnode-' || CAST(v AS VARCHAR)")} AS vpos
  FROM (SELECT unnest(range(0, {_V_BASE + 1})) AS v)
),
keys AS (
  SELECT o_orderkey AS k,
         {_pos_duck("CAST(o_orderkey AS VARCHAR)")} AS kpos
  FROM orders
),
owner_of AS (
  SELECT k.k, k.kpos, ring.maxv,
         (SELECT MIN(vpos) FROM vn WHERE v < {_V_BASE} AND vpos >= k.kpos) AS nxt,
         (SELECT MIN(vpos) FROM vn WHERE vpos >= k.kpos) AS nxt_new
  FROM keys k,
       (SELECT MIN(vpos) AS minv, MAX(vpos) AS maxv FROM vn WHERE v < {_V_BASE}) ring
),
owners AS (
  SELECT k,
         COALESCE(nxt, (SELECT MIN(vpos) FROM vn WHERE v < {_V_BASE})) AS owner_base,
         COALESCE(nxt_new, (SELECT MIN(vpos) FROM vn)) AS owner_new
  FROM owner_of
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(COUNT(DISTINCT owner_base) AS BIGINT) AS n_owners_base,
       CAST(COUNT(*) FILTER (WHERE owner_base <> owner_new) AS BIGINT)
         AS n_moved,
       COUNT(*) FILTER (WHERE owner_base <> owner_new) * 10000 // COUNT(*)
         AS moved_bps
FROM owners
"""


@query("sync_consistent_hash_ring", "2.8 sync core", _RING_ORACLE)
def sync_consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring assignment + the add-one-node rebalance audit.

    The shard-assignment scheme whose entire point is WHAT HAPPENS ON
    RESIZE: keys and vnodes hash onto one md5-derived ring (24-bit
    positions, engine-portable like `mix_shard_balance_audit`); a key
    belongs to the first vnode clockwise. Adding vnode 17 must move
    ONLY the keys in the arc it lands in — ~1/(V+1) of them — while
    modulo sharding would reshuffle nearly everything. The census
    computes both ownership maps in one pass and reports the moved
    fraction in bps; the unit test pins it under the 2/(V+1) sanity
    ceiling.

    Scale shape: the vnode table is constant-size — the ownership
    lookup is a broadcast min-over-candidates (here expressed as a
    broadcast join + conditional min, never a sort of the key stream);
    both BEFORE and AFTER maps ride the same pass, so the migration
    plan for a resize is ONE scan of the keyspace."""
    ring_rows = [(v,) for v in range(_V_BASE + 1)]
    vn = (
        spark.createDataFrame(ring_rows, "v int")
        .select(
            "v",
            F.expr(
                "cast(conv(substr(md5(concat('vnode-', cast(v as string))), 1, 6), 16, 10) as bigint)"
            ).alias("vpos"),
        )
    )
    keys = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.expr(
            "cast(conv(substr(md5(cast(o_orderkey as string)), 1, 6), 16, 10) as bigint)"
        ).alias("kpos"),
    )
    # broadcast the tiny ring; per key take the min vnode position >= kpos
    # (wrap to the ring minimum when none) — for both vnode sets at once
    joined = keys.crossJoin(F.broadcast(vn))
    owners = joined.groupBy("k", "kpos").agg(
        F.min(F.when((F.col("v") < _V_BASE) & (F.col("vpos") >= F.col("kpos")), F.col("vpos"))).alias("nxt"),
        F.min(F.when(F.col("vpos") >= F.col("kpos"), F.col("vpos"))).alias("nxt_new"),
        F.min(F.when(F.col("v") < _V_BASE, F.col("vpos"))).alias("minv"),
        F.min("vpos").alias("minv_new"),
    )
    resolved = owners.select(
        "k",
        F.coalesce("nxt", "minv").alias("owner_base"),
        F.coalesce("nxt_new", "minv_new").alias("owner_new"),
    )
    return resolved.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.countDistinct("owner_base").alias("n_owners_base"),
        F.sum((F.col("owner_base") != F.col("owner_new")).cast("long")).alias(
            "n_moved"
        ),
        F.expr(
            "sum(cast(owner_base <> owner_new as long)) * 10000 div count(1)"
        ).alias("moved_bps"),
    )
