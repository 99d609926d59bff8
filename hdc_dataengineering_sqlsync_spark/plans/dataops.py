"""SURVEY.md §2 — round-3 data-operations extension batch.

Cross-family additions a production sync + training-data platform needs on
top of the core catalog:

  2.8 sync core   dq_constraint_report, dq_reconcile_totals,
                  sync_partition_digest, sync_incremental_agg,
                  dq_profile_columns, sync_conflict_lww, sync_missing_keys,
                  sync_partition_repair
  2.5 windows     win_cumulative_distinct
  2.4 aggs        agg_decimal_exact
  2.7 scalar fns  fn_try_arithmetic
  2.1 scans       pyds_custom_sink
  plus fn_variant_semistructured (2.7) and pipeline_observe_metrics (2.8)
  2.3 joins       join_skew_salted, join_range_bucketized, hier_flatten_path
  2.9 llm-data    text_pii_redact, text_importance_weights,
                  mix_sampling_weights, multimodal_phash_dedup
  2.10 streaming  stream_join_interval_replay, stream_join_outer_replay,
                  ts_interp_linear

Registration: this module imports LAST (after workloads) so its qids append
to the end of the never-driver-checked segment of the rotation ledger — the
already-planned round-3 driver window is untouched and these enter the
round-4 window (batch 1's 10 fit the round-4 budget exactly alongside the
37 older unchecked qids; batch 2's last 5 roll to round 5).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.functions.digests import duckdb_row_digest, row_digest
from hdc_dataengineering_sqlsync_spark.operators.ivm import apply_agg_deltas, grouped_agg_deltas
from hdc_dataengineering_sqlsync_spark.operators.quality import (
    RowRule,
    fk_orphans_report,
    row_rules_report,
    unique_report,
)
from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.plans.sync import _TARGET_SQL, _source, _target
from hdc_dataengineering_sqlsync_spark.registry import SCHEMAS, load, table_bytes

# ---------------------------------------------------------------------------
# 2.8 data quality


_DQ_ORACLE = """
SELECT * FROM (
  SELECT 'lineitem_discount_range' AS rule_name,
         (SELECT count(*) FROM lineitem) AS n_checked,
         (SELECT count(*) FROM lineitem WHERE NOT (l_discount >= 0 AND l_discount <= 1)) AS n_violations
  UNION ALL
  SELECT 'lineitem_fk_orders',
         (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL),
         (SELECT count(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL)
  UNION ALL
  SELECT 'lineitem_pk_unique',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem)
           - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
  UNION ALL
  SELECT 'lineitem_qty_positive',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem WHERE NOT (l_quantity > 0))
  UNION ALL
  SELECT 'lineitem_returnflag_domain',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem WHERE l_returnflag NOT IN ('A','N','R') OR l_returnflag IS NULL)
  UNION ALL
  SELECT 'orders_fk_customer',
         (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL),
         (SELECT count(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
  UNION ALL
  SELECT 'orders_pk_not_null',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders WHERE o_orderkey IS NULL)
  UNION ALL
  SELECT 'orders_pk_unique',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders)
           - (SELECT count(*) FROM (SELECT DISTINCT o_orderkey FROM orders))
  UNION ALL
  SELECT 'orders_price_positive',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders WHERE NOT (o_totalprice > 0))
  UNION ALL
  SELECT 'orders_status_domain',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('F','O','P') OR o_orderstatus IS NULL)
)
ORDER BY rule_name
"""


# r13 single-scan fold gate (bytes of fact tables on disk): BELOW the bound
# the report keeps its r3 shape — one conditional aggregate per rule class,
# 3 scans of lineitem + 4 of orders, all pruned to 1-3 columns each. The
# fold (ONE aggregate over ONE scan per fact table) only pays when a
# re-scan is real storage I/O, and the r13 factor-120 A/B
# (STRESS_r13_dq.json) REFUTED the original 1 GiB bound on a 128 GiB box:
# with 1.2 GiB of facts page-cache-resident the folded arm measured 0.62-
# 0.73x (the mixed distinct/non-distinct aggregate plans an Expand that
# doubles partial-agg row traffic; a two-level groupBy(pk) rewrite — the
# form below — recovers most of that but still only reaches parity, never
# a win, because the saved ~2.6 GiB of re-scans cost ~0 from page cache).
# Crossover math from those runs: the fold saves 2x(lineitem)+3x(orders)
# bytes of scan per report and costs ~5s of aggregate overhead per 1.2 GiB
# of facts, so it wins only where effective scan throughput is below
# ~0.5 GB/s — real remote-object-store territory, never a page-cache hit.
# Default bound: 64 GiB combined = half this worker class's RAM, the
# smallest size at which repeated scans must miss the page cache alongside
# execution memory; S3-class deployments should LOWER it via
# SPARK_GRAFT_DQ_FOLD_BYTES. Derived from parquet file sizes on the driver
# (registry.table_bytes — no Spark job), like graph_pagerank's
# footer-count broadcast gate.
_DQ_FOLD_BYTES = int(os.environ.get("SPARK_GRAFT_DQ_FOLD_BYTES", str(1 << 36)))


def _dq_report_rows(agged: DataFrame, rows: list[tuple[str, Column, Column]]) -> DataFrame:
    """Unpivot one 1-row conditional aggregate into (rule, checked,
    violations) report rows, driver-free (same inline-over-structs idiom as
    operators/quality.py)."""
    arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule_name"),
                checked.cast("long").alias("n_checked"),
                F.coalesce(violations, F.lit(0)).cast("long").alias("n_violations"),
            )
            for name, checked, violations in rows
        ]
    )
    return agged.select(F.inline(arr))


def _dq_constraint_report_folded(li: DataFrame, o: DataFrame, c: DataFrame) -> DataFrame:
    """Single-scan-per-table form of dq_constraint_report (the >= gate arm):
    row rules, pk uniqueness and the broadcast FK probe fold into ONE
    aggregate over ONE scan of each fact table. Output rows are pinned
    identical to the unfolded form by test.

    pk uniqueness comes from a TWO-LEVEL aggregation (groupBy(pk) partials
    -> global rollup; d_pk = number of groups) rather than a countDistinct
    mixed into the plain aggregate: the mixed form plans an Expand that
    doubles partial-agg row traffic and measured 1.34x slower than this
    form at factor 120 (STRESS_r13_dq.json). The pk shuffle itself is the
    same corpus-mass exchange the unfolded distinct leg already pays."""
    okey = F.broadcast(o.select(F.col("o_orderkey").alias("__po")).dropDuplicates())
    li1 = (
        li.join(okey, li["l_orderkey"] == F.col("__po"), "left")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(
                (~((F.col("l_discount") >= 0) & (F.col("l_discount") <= 1))).cast("long")
            ).alias("v_disc"),
            F.sum((~(F.col("l_quantity") > 0)).cast("long")).alias("v_qty"),
            F.sum(
                (
                    ~(
                        F.col("l_returnflag").isNotNull()
                        & F.col("l_returnflag").isin("A", "N", "R")
                    )
                ).cast("long")
            ).alias("v_flag"),
            F.count(F.when(F.col("l_orderkey").isNotNull(), 1)).alias("n_fk"),
            F.sum(
                (F.col("l_orderkey").isNotNull() & F.col("__po").isNull()).cast("long")
            ).alias("v_fk"),
        )
    )
    li_agg = li1.agg(
        F.sum("c").alias("n"),
        F.sum("v_disc").alias("v_disc"),
        F.sum("v_qty").alias("v_qty"),
        F.sum("v_flag").alias("v_flag"),
        F.count(F.lit(1)).alias("d_pk"),
        F.sum("n_fk").alias("n_fk"),
        F.sum("v_fk").alias("v_fk"),
    )
    li_rows = _dq_report_rows(
        li_agg,
        [
            ("lineitem_discount_range", F.col("n"), F.col("v_disc")),
            ("lineitem_fk_orders", F.col("n_fk"), F.col("v_fk")),
            ("lineitem_pk_unique", F.col("n"), F.col("n") - F.col("d_pk")),
            ("lineitem_qty_positive", F.col("n"), F.col("v_qty")),
            ("lineitem_returnflag_domain", F.col("n"), F.col("v_flag")),
        ],
    )
    ckey = F.broadcast(c.select(F.col("c_custkey").alias("__pc")).dropDuplicates())
    o1 = (
        o.join(ckey, o["o_custkey"] == F.col("__pc"), "left")
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("o_orderkey").isNull().cast("long")).alias("v_null"),
            F.sum((~(F.col("o_totalprice") > 0)).cast("long")).alias("v_price"),
            F.sum(
                (
                    ~(
                        F.col("o_orderstatus").isNotNull()
                        & F.col("o_orderstatus").isin("F", "O", "P")
                    )
                ).cast("long")
            ).alias("v_status"),
            F.count(F.when(F.col("o_custkey").isNotNull(), 1)).alias("n_fk"),
            F.sum(
                (F.col("o_custkey").isNotNull() & F.col("__pc").isNull()).cast("long")
            ).alias("v_fk"),
        )
    )
    o_agg = o1.agg(
        F.sum("c").alias("n"),
        F.sum("v_null").alias("v_null"),
        F.sum("v_price").alias("v_price"),
        F.sum("v_status").alias("v_status"),
        F.count(F.lit(1)).alias("d_pk"),
        F.sum("n_fk").alias("n_fk"),
        F.sum("v_fk").alias("v_fk"),
    )
    o_rows = _dq_report_rows(
        o_agg,
        [
            ("orders_fk_customer", F.col("n_fk"), F.col("v_fk")),
            ("orders_pk_not_null", F.col("n"), F.col("v_null")),
            ("orders_pk_unique", F.col("n"), F.col("n") - F.col("d_pk")),
            ("orders_price_positive", F.col("n"), F.col("v_price")),
            ("orders_status_domain", F.col("n"), F.col("v_status")),
        ],
    )
    return li_rows.unionByName(o_rows).orderBy("rule_name")


# bench=True: VERDICT r3 #6 — star one data-ops qid so the newest family has
# a round-over-round baseline gate like the others
@query("dq_constraint_report", "2.8 sync core", _DQ_ORACLE, bench=True)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint audit (operators/quality.py): NOT NULL, domain,
    positivity, key uniqueness, and referential integrity over orders +
    lineitem, emitted as one (rule, n_checked, n_violations) report.

    Scale: all row rules per table fold into ONE conditional aggregate over
    one scan; uniqueness is one keyed aggregate; each FK check is one
    left-anti join with the dimension side broadcast — the fact side is
    never shuffled. Adding a rule adds a map-side counter, not a pass.
    When the fact tables' on-disk bytes reach _DQ_FOLD_BYTES the whole
    report additionally folds to ONE scan per fact table (see the gate
    comment above) — output pinned identical either way.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    if table_bytes(sf_dir, "lineitem") + table_bytes(sf_dir, "orders") >= _DQ_FOLD_BYTES:
        return _dq_constraint_report_folded(li, o, c)
    li_rules = row_rules_report(
        li,
        [
            RowRule("lineitem_discount_range", (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1)),
            RowRule("lineitem_qty_positive", F.col("l_quantity") > 0),
            RowRule(
                "lineitem_returnflag_domain",
                F.col("l_returnflag").isNotNull() & F.col("l_returnflag").isin("A", "N", "R"),
            ),
        ],
    )
    o_rules = row_rules_report(
        o,
        [
            RowRule("orders_pk_not_null", F.col("o_orderkey").isNotNull()),
            RowRule("orders_price_positive", F.col("o_totalprice") > 0),
            RowRule(
                "orders_status_domain",
                F.col("o_orderstatus").isNotNull() & F.col("o_orderstatus").isin("F", "O", "P"),
            ),
        ],
    )
    report = (
        li_rules.unionByName(o_rules)
        .unionByName(unique_report(li, "lineitem_pk_unique", ["l_orderkey", "l_linenumber"]))
        .unionByName(unique_report(o, "orders_pk_unique", ["o_orderkey"]))
        .unionByName(fk_orphans_report(li, "lineitem_fk_orders", ["l_orderkey"], o, ["o_orderkey"]))
        .unionByName(fk_orphans_report(o, "orders_fk_customer", ["o_custkey"], c, ["c_custkey"]))
    )
    return report.orderBy("rule_name")


_RECONCILE_ORACLE = """
WITH l AS (
  SELECT l_orderkey AS k,
         floor(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) / 100 AS line_total
  FROM lineitem GROUP BY k
),
j AS (
  SELECT floor(o.o_totalprice * 100 + 0.5) / 100 AS header_total, l.line_total
  FROM orders o LEFT JOIN l ON o.o_orderkey = l.k
)
SELECT count(*) AS n_orders,
       CAST(count(line_total) AS BIGINT) AS n_with_lines,
       CAST((SELECT count(*) FROM j
             WHERE line_total IS NULL OR abs(header_total - line_total) > 1.0) AS BIGINT) AS n_mismatch,
       round(sum(abs(header_total - coalesce(line_total, 0.0))), 2) AS total_abs_diff
FROM j
"""


@query("dq_reconcile_totals", "2.8 sync core", _RECONCILE_ORACLE)
def dq_reconcile_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header/detail reconciliation: each order's o_totalprice vs the sum of
    its lineitem extended amounts — the classic post-sync financial audit.

    One keyed aggregate over lineitem, one PK join to orders, one global
    rollup. All per-order/per-row rounding uses the tie-safe floor formula
    (see project_rename_cast) so the compared totals are bit-identical
    cross-engine before differencing.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    l = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        (F.floor(F.sum(amount) * 100 + F.lit(0.5)) / 100).alias("line_total")
    )
    # header rounds per-row: the tie-safe floor formula (see
    # project_rename_cast) — per-row round() diverges cross-engine on repr
    # ties, and at table scale some row always hits one.
    j = o.join(l, o["o_orderkey"] == l["k"], "left").select(
        (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)) / 100).alias("header_total"),
        "line_total",
    )
    mismatch = F.col("line_total").isNull() | (
        F.abs(F.col("header_total") - F.col("line_total")) > 1.0
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("line_total").alias("n_with_lines"),
        F.sum(mismatch.cast("long")).alias("n_mismatch"),
        F.round(
            F.sum(F.abs(F.col("header_total") - F.coalesce("line_total", F.lit(0.0)))), 2
        ).alias("total_abs_diff"),
    )


_ORDERS_DG = duckdb_row_digest(SCHEMAS["orders"])

_PARTITION_DIGEST_ORACLE = f"""
WITH target AS ({_TARGET_SQL}),
sp AS (
  SELECT date_trunc('month', o_orderdate) AS part, count(*) AS n,
         bit_xor(cast(concat('0x', substr({_ORDERS_DG}, 1, 15)) AS BIGINT)) AS dg
  FROM orders GROUP BY part
),
tp AS (
  SELECT date_trunc('month', o_orderdate) AS part, count(*) AS n,
         bit_xor(cast(concat('0x', substr({_ORDERS_DG}, 1, 15)) AS BIGINT)) AS dg
  FROM target GROUP BY part
)
SELECT cast(coalesce(sp.part, tp.part) AS DATE) AS part,
       CAST(coalesce(sp.n, 0) AS BIGINT) AS src_n,
       CAST(coalesce(tp.n, 0) AS BIGINT) AS tgt_n,
       CASE WHEN sp.n = tp.n AND sp.dg = tp.dg THEN 'same' ELSE 'diff' END AS status
FROM sp FULL OUTER JOIN tp ON sp.part = tp.part
ORDER BY part
"""


def _partition_digest(df: DataFrame, part_expr=None) -> DataFrame:
    """(part, n, dg) per partition: count + XOR of a 60-bit prefix of the
    cross-engine row digest over the orders columns. ONE definition for
    both the detect (sync_partition_digest) and repair
    (sync_partition_repair) halves — the digest scheme cannot drift
    between them."""
    cols = list(SCHEMAS["orders"].fieldNames())
    dg_int = F.conv(F.substring(row_digest(df, cols), 1, 15), 16, 10).cast("long")
    part = part_expr if part_expr is not None else F.date_trunc("month", "o_orderdate")
    return (
        df.withColumn("_dgi", dg_int)
        .groupBy(part.alias("part"))
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(_dgi)").alias("dg"))
    )


@query("sync_partition_digest", "2.8 sync core", _PARTITION_DIGEST_ORACLE, bench=True)
def sync_partition_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level change detection: per month-of-o_orderdate, compare
    source vs target on (row count, XOR of per-row digest prefixes) and
    report same/diff — the coarse pre-pass that lets a 100 TB sync skip the
    row-level diff for untouched partitions entirely.

    Scale: each side is one map-side-combinable aggregate down to
    #partitions rows (digest XOR is commutative/associative, so partial
    aggregation applies); the compare join is over that tiny result. The
    XOR rides a 60-bit prefix of the same cross-engine md5 row digest the
    row-level diff uses (functions/digests.py) — one canonicalization spec,
    reused. Any digest collision risk is bounded the same way as the
    row-level path and is re-checked by the row diff on 'diff' partitions.
    """
    sp = _partition_digest(_source(spark, sf_dir)).alias("sp")
    tp = _partition_digest(_target(spark, sf_dir)).alias("tp")
    j = sp.join(tp, F.col("sp.part") == F.col("tp.part"), "full_outer")
    return j.select(
        F.coalesce("sp.part", "tp.part").cast("date").alias("part"),
        F.coalesce("sp.n", F.lit(0)).alias("src_n"),
        F.coalesce("tp.n", F.lit(0)).alias("tgt_n"),
        F.when(
            (F.col("sp.n") == F.col("tp.n")) & (F.col("sp.dg") == F.col("tp.dg")), "same"
        ).otherwise("diff").alias("status"),
    ).orderBy("part")


_INCR_AGG_ORACLE = """
SELECT o_orderstatus, count(*) AS n,
       cast(sum(cast(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@query("sync_incremental_agg", "2.8 sync core", _INCR_AGG_ORACLE)
def sync_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/ivm.py): the per-status
    (count, total) view of TARGET is maintained onto SOURCE's state by
    applying changeset deltas only — inserts add, deletes retract, updates
    retract-old/insert-new (routing rows between groups when the group key
    itself changed, as with the fixture's 'X' statuses, whose group drains
    to zero and is dropped). The result must equal — and the oracle
    computes — the full re-aggregation of source.

    Scale: delta volume tracks the CHANGESET, not the 100 TB base; the view
    update is a union of a tiny base aggregate with a changeset-sized delta
    aggregate. Measures are exact DECIMAL so maintained == recomputed with
    no float drift.
    """
    measure = F.round("o_totalprice", 2).cast("decimal(18,2)")
    src = _source(spark, sf_dir).withColumn("_m", measure)
    tgt = _target(spark, sf_dir).withColumn("_m", measure)
    base = tgt.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_m").alias("total")
    )
    deltas = grouped_agg_deltas(src, tgt, pk=["o_orderkey"], group_col="o_orderstatus", measure_col="_m")
    maintained = apply_agg_deltas(base, deltas, "o_orderstatus")
    return maintained.select(
        "o_orderstatus", "n", F.col("total").cast("double").alias("total")
    ).orderBy("o_orderstatus")


# ---------------------------------------------------------------------------
# 2.3 joins — skew mitigation


_SALTED_ORACLE = """
SELECT s.s_name,
       count(*) AS n,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_name ORDER BY s.s_name
"""

_N_SALTS = 8


@query("join_skew_salted", "2.3 joins", _SALTED_ORACLE)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join: supplier is a 10-key dimension, so every lineitem
    shuffle partition keyed on l_suppkey alone lands on ≤10 reducers — the
    textbook skew shape. The fact side gets a deterministic salt
    (xxhash64(PK) mod 8), the dimension side replicates once per salt
    value, and the join keys on (suppkey, salt) — fanning each hot key out
    over 8 reducers. Result is provably identical to the unsalted join (the
    oracle runs the plain join).

    At local/broadcast scale AQE would just broadcast the 10-row dimension;
    the salted form is the shape that survives when BOTH sides are too big
    to broadcast and keys are Zipf-hot (salt count scales with observed
    skew — see also diag_key_skew).
    """
    li = load(spark, sf_dir, "lineitem").withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_N_SALTS)).cast("int")
    )
    sup = load(spark, sf_dir, "supplier").withColumn(
        "_dsalt", F.explode(F.array(*[F.lit(i) for i in range(_N_SALTS)]))
    )
    j = li.join(
        sup,
        (li["l_suppkey"] == sup["s_suppkey"]) & (li["_salt"] == sup["_dsalt"]),
        "inner",
    )
    return (
        j.groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# 2.9 llm-data — governance / curation


_PII_ORACLE = """
WITH c AS (
  SELECT c_mktsegment,
         concat(lower(c_name), '@example.com tel ', cast(c_custkey * 7919 AS VARCHAR)) AS contact
  FROM customer
),
r AS (
  SELECT c_mktsegment, contact,
         regexp_replace(regexp_replace(contact, '[a-z0-9#.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                        '[0-9]{5,}', '<NUM>', 'g') AS redacted
  FROM c
)
SELECT c_mktsegment, count(*) AS n,
       CAST((SELECT count(*) FROM r r2 WHERE r2.c_mktsegment = r.c_mktsegment AND r2.redacted <> r2.contact) AS BIGINT) AS n_redacted,
       round(avg(length(redacted)), 2) AS avg_len
FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


@query("text_pii_redact", "2.9 llm-data", _PII_ORACLE)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: email addresses and long digit
    runs are redacted via sequential regexp_replace (both patterns RE2-safe
    so Spark's Java regex and DuckDB's RE2 agree), reported per segment.
    The contact strings are synthesized deterministically from customer —
    the container's fixtures carry no real PII.

    Scale: pure map-side string work (JVM codegen, no UDF) + one keyed
    rollup; at 100 TB redaction cost is one streaming pass over the text
    column.
    """
    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.concat(
            F.lower("c_name"), F.lit("@example.com tel "), (F.col("c_custkey") * 7919).cast("string")
        ).alias("contact"),
    )
    r = c.withColumn(
        "redacted",
        F.regexp_replace(
            F.regexp_replace("contact", "[a-z0-9#.]+@[a-z0-9.]+", "<EMAIL>"),
            "[0-9]{5,}",
            "<NUM>",
        ),
    )
    return (
        r.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("redacted") != F.col("contact")).cast("long")).alias("n_redacted"),
            F.round(F.avg(F.length("redacted")), 2).alias("avg_len"),
        )
        .orderBy("c_mktsegment")
    )


_IMPORTANCE_ORACLE = r"""
WITH tb AS (
  SELECT doc_id, lang,
         cast(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 1024 AS b
  FROM (SELECT doc_id, lang, unnest(string_split_regex(text, '\s+')) AS tok FROM documents)
),
c AS (SELECT b, count(*) AS cn FROM tb GROUP BY b),
t AS (SELECT b, count(*) AS tn FROM tb WHERE lang = 'en' GROUP BY b),
tot AS (SELECT (SELECT count(*) FROM tb) AS totc,
               (SELECT count(*) FROM tb WHERE lang = 'en') AS tott),
f AS (SELECT c.b, c.cn, coalesce(t.tn, 0) AS tn FROM c LEFT JOIN t ON c.b = t.b)
SELECT tb.doc_id, count(*) AS n_tokens,
       round(sum(ln(((f.tn + 1) / (tot.tott + 1024.0)) / ((f.cn + 1) / (tot.totc + 1024.0)))), 4) AS score
FROM tb JOIN f ON tb.b = f.b CROSS JOIN tot
GROUP BY tb.doc_id
ORDER BY score DESC, doc_id
LIMIT 20
"""


@query("text_importance_weights", "2.9 llm-data", _IMPORTANCE_ORACLE)
def text_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (hashed-ngram importance resampling, after
    Xie et al. 2023): score each document by how much more likely its
    hashed-unigram profile is under the target distribution (lang='en'
    docs) than under the raw corpus — sum over tokens of
    log(p_target/p_corpus) with add-1 smoothing over 1024 hash buckets.
    Top-20 by score = the docs to up-sample toward the target domain.

    Scale: the feature space is FIXED (1024 buckets) regardless of corpus
    size, so both frequency tables build via one map-side-combinable
    aggregate and then BROADCAST back onto the token stream; scoring is one
    more map-side pass + a per-doc rollup. The bucket hash is a
    cross-engine md5 prefix (probed identical), not a JVM-only hash.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(F.split("text", r"\s+")).alias("tok"))
    tokb = tok.select(
        "doc_id",
        "lang",
        (F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % 1024).alias("b"),
    )
    # both frequency tables in ONE pass over the token stream (conditional
    # count), totals derived from the 1024-row result — the corpus is
    # scanned exactly twice (freq build + scoring), not once per table
    freq = tokb.groupBy("b").agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum((F.col("lang") == "en").cast("long")).alias("tn"),
    )
    tot = freq.agg(F.sum("cn").alias("totc"), F.sum("tn").alias("tott"))
    term = F.log(
        ((F.col("tn") + 1) / (F.col("tott") + 1024.0))
        / ((F.col("cn") + 1) / (F.col("totc") + 1024.0))
    )
    return (
        tokb.join(F.broadcast(freq), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.round(F.sum(term), 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )


_MIX_ORACLE = r"""
WITH s AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
k AS (SELECT count(*) AS n_src FROM s)
SELECT s.source, s.n_docs, s.n_tokens,
       round(least(1.0, (20000.0 / k.n_src) / s.n_tokens), 4) AS sample_weight,
       CAST(floor(least(1.0, (20000.0 / k.n_src) / s.n_tokens) * s.n_tokens) AS BIGINT) AS expected_tokens
FROM s CROSS JOIN k ORDER BY s.source
"""


@query("mix_sampling_weights", "2.9 llm-data", _MIX_ORACLE)
def mix_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture planning: given a total token budget (20k) split
    evenly across sources, emit each source's sampling weight
    min(1, per-source-budget / tokens) and the expected token yield — the
    allocation step before a weighted corpus sample (cf. sample_hash_*
    for executing the draw).

    Scale: one aggregate to #sources rows, then a 1-row broadcast of the
    source count; nothing touches row data twice.
    """
    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", r"\s+")).cast("long")).alias("n_tokens"),
    )
    k = s.agg(F.count(F.lit(1)).alias("n_src"))
    w = F.least(F.lit(1.0), (F.lit(20000.0) / F.col("n_src")) / F.col("n_tokens"))
    return (
        s.crossJoin(F.broadcast(k))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(w, 4).alias("sample_weight"),
            F.floor(w * F.col("n_tokens")).cast("long").alias("expected_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# 2.10 streaming / time series


_STREAM_JOIN_ORACLE = """
SELECT v.user_id AS user_id, count(*) AS n_pairs,
       round(sum(p.value), 2) AS purchase_total
FROM events v JOIN events p
  ON p.user_id = v.user_id AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
GROUP BY v.user_id ORDER BY user_id
"""


@query("stream_join_interval_replay", "2.10 streaming", _STREAM_JOIN_ORACLE)
def stream_join_interval_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE stream-stream interval join (streaming/jobs.py::
    interval_join_view_purchase): two file-source replays of events — views
    on one side, purchases on the other — joined on user within
    [view.ts, view.ts + 1h], drained append-mode to a memory sink, then
    rolled up per user and hash-matched against the batch self-join oracle.

    Both sides carry watermarks and the join condition carries the explicit
    event-time range, so join state is evictable at the watermark horizon —
    the only stream-stream join shape that survives unbounded streams.
    """
    from hdc_dataengineering_sqlsync_spark.streaming.jobs import (
        events_path,
        interval_join_view_purchase,
        read_events_stream,
        run_to_memory,
    )

    left = read_events_stream(spark, events_path(sf_dir))
    right = read_events_stream(spark, events_path(sf_dir))
    view, q = run_to_memory(interval_join_view_purchase(left, right), mode="append")
    q.stop()
    return (
        spark.table(view)
        .groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("p_value"), 2).alias("purchase_total"),
        )
        .orderBy("user_id")
    )


_INTERP_ORACLE = """
WITH b AS (
  SELECT date_trunc('hour', ts) AS h, floor(avg(value) * 100 + 0.5) / 100 AS v
  FROM events WHERE event_type = 'purchase' GROUP BY h
),
lim AS (SELECT min(h) AS h0, max(h) AS h1 FROM b),
spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM lim),
g AS (
  SELECT spine.h, b.v, cast(epoch(spine.h) AS BIGINT) // 3600 AS hi
  FROM spine LEFT JOIN b ON spine.h = b.h
),
w AS (
  SELECT h, hi, v,
         last_value(v IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN hi END IGNORE NULLS) OVER wp AS pi,
         first_value(v IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN hi END IGNORE NULLS) OVER wn AS ni
  FROM g
  WINDOW wp AS (ORDER BY hi ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wn AS (ORDER BY hi ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT h AS bucket_ts,
       floor(CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NOT NULL AND nv IS NOT NULL
                  THEN pv + (nv - pv) * ((hi - pi) * 1.0 / (ni - pi))
                  END * 100 + 0.5) / 100 AS value_filled,
       CASE WHEN v IS NOT NULL THEN 'observed'
            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
            ELSE 'edge' END AS src
FROM w ORDER BY bucket_ts
"""


@query("ts_interp_linear", "2.10 streaming", _INTERP_ORACLE)
def ts_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over gap hours: hourly purchase-value averages
    joined to the full hour spine (as ts_gapfill_hourly), then empty
    buckets are filled by interpolating between the nearest observed
    neighbors via IGNORE-NULLS window scans; hour indexes are exact
    integers so the interpolation fraction is bit-identical cross-engine.

    Scale: the windows run over the SPINE (size = time span), not the
    event stream — the heavy aggregation down to hourly buckets happened
    first. A single global sort of the spine is the irreducible cost of a
    cross-bucket scan; for per-key series, partition the window by key.
    """
    e = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    b = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        (F.floor(F.avg("value") * 100 + F.lit(0.5)) / 100).alias("v")
    )
    spine = (
        b.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"))
    )
    g = spine.join(b, "h", "left").select(
        "h", "v", F.expr("unix_seconds(h) div 3600").alias("hi")
    )
    wp = Window.orderBy("hi").rowsBetween(Window.unboundedPreceding, -1)
    wn = Window.orderBy("hi").rowsBetween(1, Window.unboundedFollowing)
    hi_if_obs = F.when(F.col("v").isNotNull(), F.col("hi"))
    w = g.select(
        "h",
        "hi",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(hi_if_obs, ignorenulls=True).over(wp).alias("pi"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(hi_if_obs, ignorenulls=True).over(wn).alias("ni"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("hi") - F.col("pi")) * 1.0 / (F.col("ni") - F.col("pi"))
    )
    filled = F.when(F.col("v").isNotNull(), F.col("v")).when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp
    )
    # tie-safe per-row rounding (see project_rename_cast): interpolated
    # doubles land on .xx5 reprs often enough that round() diverges.
    return w.select(
        F.col("h").alias("bucket_ts"),
        (F.floor(filled * 100 + F.lit(0.5)) / 100).alias("value_filled"),
        F.when(F.col("v").isNotNull(), "observed")
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), "interp")
        .otherwise("edge")
        .alias("src"),
    ).orderBy("bucket_ts")


