"""SURVEY.md §2 round-5 additions, batch P.

Spark-4 collation semantics, exact business-day calendar arithmetic, the
recursive-lookup/glob scan surface, and a shard-balance layout audit.
Registered after ``roundfive_f`` (plans/__init__.py) so the qids append to
the END of the never-checked rotation segment.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import duck_md5_int, query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------------- 2.7 scalar functions: Spark-4 collation semantics

# Case-variant synthesis shared verbatim by both engines: three
# deterministic transforms of a low-cardinality base string so that
# case-INSENSITIVE equivalence classes are strictly coarser than raw
# distinct strings (segments are upper-case in the data, so upper() is
# the identity arm).
_VARIANT = (
    "CASE WHEN c_custkey % 3 = 0 THEN upper({b})"
    " WHEN c_custkey % 3 = 1 THEN lower({b})"
    " ELSE concat(upper(substr({b}, 1, 4)), lower(substr({b}, 5))) END"
).format(b="concat(c_mktsegment, '-', cast(c_nationkey as string))")

_COLLATION_ORACLE = f"""
WITH v AS (SELECT {_VARIANT} AS name_v FROM customer)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT name_v) AS BIGINT) AS d_raw,
       CAST(COUNT(DISTINCT lower(name_v)) AS BIGINT) AS d_ci,
       CAST(COUNT(*) FILTER (WHERE lower(name_v) = 'building-11')
            AS BIGINT) AS n_eq_ci,
       CAST(COUNT(*) FILTER (WHERE lower(name_v) LIKE 'machinery-%')
            AS BIGINT) AS n_prefix_ci
FROM v
"""


@query("fn_collation_lcase", "2.7 scalar functions", _COLLATION_ORACLE)
def fn_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 string collations: UTF8_LCASE comparison/distinct semantics.

    The collation surface replaces the lower()-everywhere idiom for
    case-insensitive matching: `c COLLATE UTF8_LCASE` makes equality,
    DISTINCT and prefix predicates case-insensitive at the TYPE level —
    no per-row rewrite of the data, and the optimizer still sees the
    untouched column. The census proves the semantics: raw distinct
    counts case variants separately, collated distinct collapses them to
    the lower()-class count, and collated equality/prefix predicates hit
    every variant (the DuckDB oracle models collation with lower(),
    which is exactly UTF8_LCASE's definition for ASCII data).

    Scale shape: collation tags ride the string type — comparisons stay
    in JVM codegen; COUNT(DISTINCT collated) expands two-phase like any
    distinct. At 100 TB this beats wrapping the column in lower() only
    when the collated column is reused across many predicates; both
    lower to one pass here."""
    v = load(spark, sf_dir, "customer").selectExpr(f"{_VARIANT} AS name_v")
    c = F.expr("name_v COLLATE UTF8_LCASE")
    return v.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("name_v").alias("d_raw"),
        F.countDistinct(c).alias("d_ci"),
        F.sum(F.when(c == F.lit("building-11"), 1).otherwise(0))
        .cast("long")
        .alias("n_eq_ci"),
        F.sum(F.when(F.expr("startswith(name_v COLLATE UTF8_LCASE, 'MACHINERY-')"), 1).otherwise(0))
        .cast("long")
        .alias("n_prefix_ci"),
    )


# ------------------ 2.7 scalar functions: business-day calendar arithmetic

# Weekday-count-from-epoch, one template instantiated with each engine's
# integer-division spelling (Spark `div`, DuckDB `//`) — everything else
# (`%`, `least`, `+`) is spelled identically, and all arithmetic is exact
# integer: m = epoch_day + 3 makes m % 7 == 0 a Monday (1970-01-01 was a
# Thursday), so g(d) = 5 * full_weeks + clamp(partial_week_days, 5).
_G = "(5 * ((({e}) + 3) {div} 7) + least((({e}) + 3) % 7 + 1, 5))"


def _bdays(e1: str, e2: str, div: str) -> str:
    """Business days in (d1, d2]: weekdays counted after d1 up to d2."""
    return f"({_G.format(e=e2, div=div)} - {_G.format(e=e1, div=div)})"


# The testdata lineitem carries only l_shipdate; the delivery date is a
# deterministic per-row offset (1..10 days, keyed off the line's order) so
# intervals of every weekday-span mix occur, including weekend endpoints.
_BD_SPARK = _bdays(
    "datediff(l_shipdate, date'1970-01-01')",
    "datediff(l_shipdate, date'1970-01-01') + (l_orderkey % 10 + 1)",
    "div",
)
_BD_DUCK = _bdays(
    "date_diff('day', DATE '1970-01-01', l_shipdate)",
    "date_diff('day', DATE '1970-01-01', l_shipdate) + (l_orderkey % 10 + 1)",
    "//",
)

_BDAYS_ORACLE = f"""
WITH bd AS (SELECT l_returnflag, {_BD_DUCK} AS b FROM lineitem)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(b) AS BIGINT) AS sum_bdays,
       CAST(MIN(b) AS BIGINT) AS min_bdays,
       CAST(MAX(b) AS BIGINT) AS max_bdays,
       CAST(SUM(b) * 10000 // COUNT(*) AS BIGINT) AS avg_bdays_bps
FROM bd GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("fn_business_days", "2.7 scalar functions", _BDAYS_ORACLE)
def fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day (weekend-skipping) interval arithmetic, closed form.

    The SLA metric calendars actually use: how many WEEKDAYS elapse
    between ship and receipt. Computed as a closed-form difference of
    weekday-counts-from-epoch — g(d) = 5*full_weeks + clamped partial —
    never a per-day explode or a calendar-table join; one shared formula
    template instantiated into both engines (only the integer-division
    token differs), all arithmetic exact integer.

    Scale shape: pure map-side integer date math inside codegen feeding
    a map-combinable keyed aggregate over 7 ship modes — the whole query
    is one scan + one tiny shuffle at any data size. A calendar-table
    join (the naive form) would shuffle the fact table; the closed form
    moves zero bytes.

    Unit-test pins the formula against an independent per-day Python
    loop over a date matrix including weekend endpoints."""
    bd = load(spark, sf_dir, "lineitem").selectExpr(
        "l_returnflag", f"{_BD_SPARK} AS b"
    )
    return (
        bd.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("b").alias("sum_bdays"),
            F.min("b").cast("long").alias("min_bdays"),
            F.max("b").cast("long").alias("max_bdays"),
            F.expr("sum(b) * 10000 div count(1)").alias("avg_bdays_bps"),
        )
        .orderBy("l_returnflag")
    )


# ---------------- 2.1 scans: recursive lookup + glob-filtered directory scan

_RECURSIVE_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders WHERE o_orderpriority = '1-URGENT'
"""


@query("scan_recursive_glob", "2.1 scans", _RECURSIVE_ORACLE)
def scan_recursive_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recursiveFileLookup + pathGlobFilter over an arbitrarily-nested tree.

    The landing-zone reality the partition-discovery scan can't handle:
    upstream systems drop files in ad-hoc nested directories (dates,
    hosts, retries) that are NOT key=value partition dirs, interleaved
    with sidecar junk (_SUCCESS markers, .txt manifests, checksums).
    `recursiveFileLookup=true` walks every level (and deliberately
    DISABLES partition inference — directory names carry no schema);
    `pathGlobFilter='*.parquet'` drops the sidecars at file-listing
    time, before any read. The staged tree splits urgent orders across
    three directory depths with junk files at each level; the census
    must reconstruct exactly the flat filtered table.

    Scale shape: the glob filter prunes at LISTING time (driver-side
    file enumeration, no data I/O for rejected files); the read itself
    is ordinary splittable parquet. At 100 TB the listing is the
    bottleneck to watch — this is the one-time landing read that feeds
    a compaction into a real partitioned layout (sync_compact_small_files)."""
    src = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    tag = hashlib.md5(f"recglob:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:8]
    root = os.path.join(tempfile.gettempdir(), f"hdc_recglob_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    try:
        slices = {
            "2024-01-01/hostA": 0,
            "2024-01-01/hostA/retry-1": 1,
            "2024-01-02": 2,
        }
        for rel, mod in slices.items():
            src.filter(F.col("o_orderkey") % 3 == mod).write.mode(
                "overwrite"
            ).parquet(os.path.join(root, rel))
        # Sidecar junk at several levels: must be invisible to the scan.
        for rel in ["manifest.txt", "2024-01-01/checksums.txt",
                    "2024-01-01/hostA/notes.txt"]:
            p = os.path.join(root, rel)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "w") as fh:
                fh.write("not parquet\n")
        back = (
            spark.read.option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(root)
        )
        out = back.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_orderpriority").alias("n_prio"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "total_cents"
            ),
        )
        out.collect()  # materialize before the staging tree is removed
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------- 2.9 llm-data: shard-assignment balance audit

# md5-derived shard id, exact in both engines: value of the first four
# hex nibbles mod 32.  Spark spells it conv(); DuckDB reconstructs the
# same integer from nibble positions.
_SHARD_SPARK = (
    "cast(conv(substr(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint) % 32"
)
_SHARD_DUCK = f"{duck_md5_int('CAST(doc_id AS VARCHAR)', 4)} % 32"

_SHARD_ORACLE = f"""
WITH assigned AS (
  SELECT {_SHARD_DUCK} AS shard, n_chars FROM documents
),
per_shard AS (
  SELECT shard, COUNT(*) AS n_rows, SUM(n_chars) AS bytes
  FROM assigned GROUP BY shard
)
SELECT CAST(SUM(n_rows) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_shards,
       CAST(MIN(n_rows) AS BIGINT) AS min_rows,
       CAST(MAX(n_rows) AS BIGINT) AS max_rows,
       CAST(MAX(n_rows) * COUNT(*) * 10000 // SUM(n_rows) AS BIGINT) AS max_skew_bps,
       CAST(MAX(bytes) AS BIGINT) AS max_shard_bytes
FROM per_shard
"""


@query("mix_shard_balance_audit", "2.9 llm-data", _SHARD_ORACLE)
def mix_shard_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard balance audit for a deterministic hash-sharded layout.

    Before a corpus is written as N training shards, audit the layout
    the shard function would produce: rows and bytes per shard, and the
    hot-shard skew in basis points (max_rows / ideal_rows). The shard id
    is minted from md5 — the engine-portable choice (xxhash64/crc32
    differ across engines; the fn_uuid_deterministic discipline), so a
    re-run on any engine assigns identical shards and the audit is
    reproducible. 10000 bps = perfectly balanced; the gate a packing job
    checks before committing a layout.

    Scale shape: the assignment is map-side string hashing in codegen;
    the audit is a two-level keyed aggregate (per-shard partials combine
    map-side, then a 32-row census) — no data movement beyond the tiny
    shard rollup. The REAL write would `repartition(expr)` on the same
    shard expression; this audit predicts that shuffle's balance without
    paying for it."""
    assigned = load(spark, sf_dir, "documents").selectExpr(
        f"{_SHARD_SPARK} AS shard", "n_chars"
    )
    per_shard = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("n_chars").alias("bytes")
    )
    return per_shard.agg(
        F.sum("n_rows").alias("n_docs"),
        F.count(F.lit(1)).alias("n_shards"),
        F.min("n_rows").alias("min_rows"),
        F.max("n_rows").alias("max_rows"),
        F.expr("max(n_rows) * count(1) * 10000 div sum(n_rows)").alias(
            "max_skew_bps"
        ),
        F.max("bytes").alias("max_shard_bytes"),
    )
