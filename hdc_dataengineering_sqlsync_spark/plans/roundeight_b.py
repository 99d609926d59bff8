"""SURVEY.md §2 round-8 batch B: sequence-pattern windows, exact Shapley
attribution, bitemporal as-of, and parquet row-group footer stats.

  win_match_recognize_vshape   MATCH_RECOGNIZE-style V-pattern census
  wl_shapley_attribution_exact exact Shapley channel credit in 1/24 units
  sync_bitemporal_2d_asof         valid-time x transaction-time reconstruction
  scan_parquet_rowgroup_stats  real footer row-group statistics audit

Every derived number is exact integer arithmetic (cents, counts, 1/24
credit units, epoch days), so no cross-engine float can flap a value.
(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# -------------------------------------------- 2.5 windows: MATCH_RECOGNIZE

_VSHAPE_ORACLE = """
WITH t AS (
  SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem
),
s AS (
  SELECT *, lag(cents) OVER w AS prev, row_number() OVER w AS rn
  FROM t
  WINDOW w AS (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
),
c AS (
  SELECT *, CASE WHEN prev IS NULL THEN NULL
                 WHEN cents < prev THEN 'D'
                 WHEN cents > prev THEN 'U' ELSE 'F' END AS step
  FROM s
),
d AS (
  SELECT *,
         lead(step) OVER (PARTITION BY l_partkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber) AS next_step,
         rn - row_number() OVER (PARTITION BY l_partkey, step
                                 ORDER BY l_shipdate, l_orderkey, l_linenumber) AS isl
  FROM c
),
runs AS (
  SELECT *,
         first_value(prev) OVER (PARTITION BY l_partkey, step, isl
                                 ORDER BY l_shipdate, l_orderkey, l_linenumber) AS run_start
  FROM d
),
v AS (SELECT * FROM runs WHERE step = 'D' AND next_step = 'U')
SELECT p.p_brand AS brand,
       CAST(count(*) AS BIGINT) AS n_vbottoms,
       CAST(sum(run_start - cents) AS BIGINT) AS depth_cents,
       CAST(max(run_start - cents) AS BIGINT) AS max_depth_cents
FROM v JOIN part p ON p.p_partkey = v.l_partkey
GROUP BY p.p_brand ORDER BY brand
"""


@query("win_match_recognize_vshape", "2.5 windows", _VSHAPE_ORACLE)
def win_match_recognize_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern detection (`PATTERN (D+ U)`)
    expressed in plain windows — the row-pattern feature Trino/Flink ship
    as dedicated syntax, composed here from lag/lead + gaps-and-islands.
    Per part price timeline (exact cents, unique (shipdate, orderkey,
    linenumber) tie-break): classify each step Down/Up/Flat, find every
    V-bottom (a D-run immediately followed by a U step), and report its
    DEPTH — the price at the D-run's start minus the bottom price, read
    with first_value over the run island. Census per brand.

    Scale shape: EVERY window runs over the same (partkey) partitioning
    and sort — run starts are carried forward with the ignore-nulls
    last() idiom (the win_ignore_nulls_ffill machinery) instead of a
    second gaps-and-islands partitioning, so Spark plans ONE Exchange +
    one sort for the whole pattern pass — then a broadcast join to part
    and a tiny brand rollup. No self-join, no explode; at 100 TB the
    only cost is the one per-key sort every sequence operator needs.
    (The oracle uses the engine-agnostic islands formulation — same
    result, different idiom, which is exactly what makes it a check.)"""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("l_partkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    s = li.withColumn("prev", F.lag("cents").over(w))
    c = s.withColumn(
        "step",
        F.when(F.col("prev").isNull(), F.lit(None).cast("string"))
        .when(F.col("cents") < F.col("prev"), F.lit("D"))
        .when(F.col("cents") > F.col("prev"), F.lit("U"))
        .otherwise(F.lit("F")),
    )
    d = c.withColumn("prev_step", F.lag("step").over(w)).withColumn(
        "next_step", F.lead("step").over(w)
    )
    # price at the start of a D-run: set at the run's FIRST row (prev row
    # was not a D step), then carried forward by last(ignorenulls) — no
    # (partkey, step, island) re-partitioning, one Exchange total
    run_seed = F.when(
        (F.col("step") == "D")
        & (F.col("prev_step").isNull() | (F.col("prev_step") != "D")),
        F.col("prev"),
    )
    runs = d.withColumn(
        "run_start", F.last(run_seed, ignorenulls=True).over(w)
    )
    v = runs.where((F.col("step") == "D") & (F.col("next_step") == "U"))
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        v.join(F.broadcast(part), v.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_vbottoms"),
            F.sum(F.col("run_start") - F.col("cents")).alias("depth_cents"),
            F.max(F.col("run_start") - F.col("cents")).alias("max_depth_cents"),
        )
        .orderBy("brand")
    )


# ------------------------------- 2.12 composite: exact Shapley attribution

# channel -> bit, fixed universe (the 4 non-purchase event types)
_SHAPLEY_CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]

_SHAPLEY_ORACLE = """
WITH fp AS (
  SELECT user_id, min(ts) AS first_purchase
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
masks AS (
  SELECT fp.user_id,
         coalesce(max(CASE WHEN e.event_type = 'click'  THEN 1 ELSE 0 END), 0)
       + coalesce(max(CASE WHEN e.event_type = 'error'  THEN 2 ELSE 0 END), 0)
       + coalesce(max(CASE WHEN e.event_type = 'signup' THEN 4 ELSE 0 END), 0)
       + coalesce(max(CASE WHEN e.event_type = 'view'   THEN 8 ELSE 0 END), 0) AS mask
  FROM fp
  LEFT JOIN events e
    ON e.user_id = fp.user_id AND e.ts < fp.first_purchase
       AND e.event_type <> 'purchase'
  GROUP BY fp.user_id
),
cm AS (SELECT mask, count(*) AS cnt FROM masks GROUP BY mask),
lattice AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS s),
v AS (
  SELECT l.s, coalesce(sum(cm.cnt), 0) AS val
  FROM lattice l LEFT JOIN cm ON (cm.mask & l.s) = cm.mask
  GROUP BY l.s
),
contrib AS (
  SELECT ch.bit, ch.name,
         ((v1.val - v0.val)
          * CASE (v1.s & 1) + ((v1.s >> 1) & 1) + ((v1.s >> 2) & 1) + ((v1.s >> 3) & 1)
              WHEN 1 THEN 6 WHEN 2 THEN 2 WHEN 3 THEN 2 WHEN 4 THEN 6 END) AS w_marginal
  FROM v v1
  JOIN (VALUES ('click', 1), ('error', 2), ('signup', 4), ('view', 8)) ch(name, bit)
    ON (v1.s & ch.bit) = ch.bit
  JOIN v v0 ON v0.s = (v1.s - ch.bit)
)
SELECT name AS channel,
       CAST(sum(w_marginal) AS BIGINT) AS shapley_24ths
FROM contrib GROUP BY name ORDER BY channel
"""


@query("wl_shapley_attribution_exact", "2.12 composite workloads", _SHAPLEY_ORACLE)
def wl_shapley_attribution_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value channel attribution — the game-theoretic credit
    split heuristic attribution (first/last-touch, `wl_attribution_credit`)
    approximates. Characteristic function v(S) = number of converted users
    whose pre-purchase touch set is contained in S, over the fixed 4-channel
    universe {click, error, signup, view}; phi_i = sum over coalitions S
    containing i of (|S|-1)!(4-|S|)! * (v(S) - v(S\\{i})) / 4!. Reported in
    integer 1/24 units (4! = 24), so every value is an exact BIGINT and the
    efficiency axiom (sum phi = v(full) - v(empty)) is integer-checkable.

    Scale shape: the ONLY data-sized work is the per-user touch-mask
    aggregate (map-combinable over events); everything after runs on a
    16-row subset lattice x 4 channels — the closed-form trick that makes
    exact Shapley (exponential in general) free when the channel universe
    is small and fixed, which is how marketing attribution actually runs."""
    ev = load(spark, sf_dir, "events")
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    touches = (
        fp.join(
            ev.where(F.col("event_type") != "purchase").select(
                F.col("user_id").alias("t_user"), "ts", "event_type"
            ),
            (F.col("t_user") == F.col("user_id")) & (F.col("ts") < F.col("first_purchase")),
            "left",
        )
        .groupBy("user_id")
        .agg(
            sum(
                [
                    F.coalesce(
                        F.max(F.when(F.col("event_type") == name, bit).otherwise(0)), F.lit(0)
                    )
                    for name, bit in _SHAPLEY_CHANNELS
                ],
                F.lit(0),
            ).alias("mask")
        )
    )
    cm = touches.groupBy("mask").agg(F.count(F.lit(1)).alias("cnt"))
    lattice = spark.range(16).select(F.col("id").alias("s"))
    v = (
        lattice.join(F.broadcast(cm), (F.col("mask").bitwiseAND(F.col("s"))) == F.col("mask"), "left")
        .groupBy("s")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("val"))
    )
    ch = spark.createDataFrame(_SHAPLEY_CHANNELS, ["name", "bit"])
    popcount = sum(
        [F.shiftright(F.col("s").cast("int"), i).bitwiseAND(F.lit(1)) for i in range(4)],
        F.lit(0),
    )
    weight = (
        F.when(popcount == 1, 6)
        .when(popcount == 2, 2)
        .when(popcount == 3, 2)
        .when(popcount == 4, 6)
    )
    v1 = v.select(F.col("s"), F.col("val"))
    v0 = v.select(F.col("s").alias("s0"), F.col("val").alias("val0"))
    contrib = (
        v1.join(F.broadcast(ch), (F.col("s").bitwiseAND(F.col("bit"))) == F.col("bit"))
        .join(F.broadcast(v0), F.col("s0") == F.col("s") - F.col("bit"))
        .select(
            F.col("name"),
            ((F.col("val") - F.col("val0")) * weight).alias("w_marginal"),
        )
    )
    return (
        contrib.groupBy(F.col("name").alias("channel"))
        .agg(F.sum("w_marginal").cast("long").alias("shapley_24ths"))
        .orderBy("channel")
    )


# ----------------------------------- 2.8 sync core: bitemporal as-of query

_BITEMPORAL_ORACLE = """
WITH ver AS (
  SELECT o_custkey, o_orderkey, o_orderstatus,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS vday,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           + (o_orderkey % 7) AS txday
  FROM orders
),
eligible AS (
  SELECT * FROM ver
  WHERE vday <= date_diff('day', DATE '1970-01-01', DATE '1996-07-01')
    AND txday <= date_diff('day', DATE '1970-01-01', DATE '1996-09-01')
),
pick AS (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY vday DESC, o_orderkey DESC) AS rn
  FROM eligible
)
SELECT o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM pick WHERE rn = 1
GROUP BY o_orderstatus ORDER BY status
"""


@query("sync_bitemporal_2d_asof", "2.8 sync core", _BITEMPORAL_ORACLE)
def sync_bitemporal_2d_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal (valid-time x transaction-time) as-of reconstruction —
    the query a sync target with late-arriving writes must answer: "what
    did we BELIEVE on T about the state VALID on V?". Versions are
    synthesized from orders (valid_from = order date; tx_from lags it by a
    deterministic 0-6-day registration delay keyed on o_orderkey); the
    as-of pick is the newest version with valid_from <= V whose
    transaction time had landed by T, per customer. All interval algebra
    runs on exact epoch-day integers — no date arithmetic can diverge
    cross-engine. Census by order status over the reconstructed state.

    Scale shape: one filter (both predicates push to the scan) + one
    per-key window top-1 (WindowGroupLimit) + a tiny status rollup; the
    same shape as join_scd2_asof_dim but with the second (transaction)
    time axis that plain SCD-2 lacks."""
    epoch = F.lit("1970-01-01").cast("date")
    ver = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.datediff(F.col("o_orderdate").cast("date"), epoch).alias("vday"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), epoch) + F.col("o_orderkey") % 7
        ).alias("txday"),
    )
    v_cut = F.datediff(F.lit("1996-07-01").cast("date"), epoch)
    t_cut = F.datediff(F.lit("1996-09-01").cast("date"), epoch)
    eligible = ver.where((F.col("vday") <= v_cut) & (F.col("txday") <= t_cut))
    w = Window.partitionBy("o_custkey").orderBy(F.desc("vday"), F.desc("o_orderkey"))
    pick = eligible.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        pick.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("total_cents"),
        )
        .orderBy("status")
    )


# ------------------------- 2.1 scans: parquet row-group footer statistics

_ROWGROUP_ORACLE = """
WITH s AS (
  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS rn
  FROM orders
)
SELECT CAST(rn // 1000 AS BIGINT) AS rg_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM s GROUP BY rn // 1000 ORDER BY rg_id
"""

_ROWGROUP_SCHEMA = T.StructType(
    [
        T.StructField("rg_id", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("min_key", T.LongType()),
        T.StructField("max_key", T.LongType()),
    ]
)


def _r8_stage(sf_dir: str) -> str:
    """Round-8 staging dir, keyed by sf_dir (same convention as
    plans/scans._rt_base: same-sf_dir runs write identical content,
    different sf_dirs never collide)."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"hdc_sqlsync_r8_{tag}")
    os.makedirs(d, exist_ok=True)
    return d


@query("scan_parquet_rowgroup_stats", "2.1 scans", _ROWGROUP_ORACLE)
def scan_parquet_rowgroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL parquet footer audit: stage orders sorted by key into a file
    with EXACT 1000-row row groups (pyarrow writer inside a mapInPandas
    task — executor-side, no driver data path), then read ONLY the footer
    and report per-row-group row counts and min/max key statistics. The
    oracle recomputes what the zone map MUST contain from the sorted row
    order alone (row_number // 1000) — so a wrong stats write, a wrong
    group split, or a footer misread all mismatch. This is the min/max
    zone-map machinery data-skipping rests on, made value-checkable.

    Scale shape: the staged write is one sorted single-shard stream (a
    100 TB layout job shards this per partition, identical per-shard
    logic); the audit itself reads FOOTERS only — metadata-scale I/O,
    data-volume-independent.

    Deployment note: the task-side write and the driver-side footer read
    share a filesystem in this harness (local[32]); on a real cluster the
    staged path must be shared storage — same assumption every staging
    qid in plans/scans.py makes. The write lands via write-to-temp +
    os.replace so a concurrent same-sf_dir session can never observe a
    half-written footer (pq.write_table alone is not atomic)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(_r8_stage(sf_dir), "orders_rg1000.parquet")

    def write_sorted(batches):
        import pandas as pd

        pdf = pd.concat(list(batches), ignore_index=True)
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        tmp = f"{out}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp, row_group_size=1000)
        os.replace(tmp, out)  # atomic on POSIX: readers see old or new, never partial
        yield pd.DataFrame({"written": [len(pdf)]})

    keys = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey")
        .repartition(1)
        .sortWithinPartitions("o_orderkey")
    )
    keys.mapInPandas(write_sorted, schema="written long").collect()

    meta = pq.ParquetFile(out).metadata
    col_idx = meta.schema.to_arrow_schema().get_field_index("o_orderkey")
    rows = []
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        stats = g.column(col_idx).statistics
        rows.append((rg, g.num_rows, int(stats.min), int(stats.max)))
    return spark.createDataFrame(rows, _ROWGROUP_SCHEMA).orderBy("rg_id")
