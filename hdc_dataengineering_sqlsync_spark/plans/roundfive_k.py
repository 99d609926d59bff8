"""SURVEY.md §2 round-5 additions, batch T.

Join-strategy hints (plan-steered, result-identical), corrupt-file-
tolerant scans, and the built-in mask() PII surface. Registered after
``roundfive_j`` (plans/__init__.py) so the qids append to the END of the
never-checked rotation segment.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ---------------- 2.3 joins: join-strategy hints, result-identical

_HINTS_ORACLE = """
WITH j AS (
  SELECT n.n_name, c.c_acctbal
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
         AS bal_cents
FROM j GROUP BY n_name ORDER BY n_name
"""


@query("join_strategy_hints", "2.3 joins", _HINTS_ORACLE)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join strategy HINTS: steer the physical join, never the result.

    The optimizer-escape-hatch surface: MERGE (sort-merge), SHUFFLE_HASH
    and BROADCAST hints each force a different physical operator for the
    same logical join. The query runs the customer⨝nation rollup under
    the SHUFFLE_HASH hint (the one AQE would not pick by itself here —
    broadcast wins on a 25-row dim); the unit test asserts all three
    hinted plans contain their operator (SortMergeJoin / ShuffledHashJoin
    / BroadcastHashJoin) AND collect() identical rows — hints are
    semantics-free by contract.

    Scale shape: when the build side is too big to broadcast but fits
    per-partition in memory, SHUFFLE_HASH skips the sort-merge's two
    sorts — the classic big⨝medium fix; the hint is per-join, so one
    statement can mix strategies."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").hint("shuffle_hash")
    j = c.join(n, c.c_nationkey == n.n_nationkey)
    return (
        j.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")).alias(
                "bal_cents"
            ),
        )
        .orderBy("n_name")
    )


# ---------------- 2.1 scans: corrupt-file-tolerant directory read

_CORRUPT_FILES_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders WHERE o_orderkey % 2 = 0
"""


@query("scan_ignore_corrupt_files", "2.1 scans", _CORRUPT_FILES_ORACLE)
def scan_ignore_corrupt_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-LEVEL fault tolerance: ignoreCorruptFiles skips bad files.

    The record-level modes (`scan_csv_failfast_modes`,
    `json_corrupt_records`) handle malformed ROWS; this is the layer
    below — a file whose parquet footer/magic is trashed (truncated
    upload, partial object write) would fail the whole job. With
    `spark.read.option("ignoreCorruptFiles", "true")` the scan logs and
    SKIPS the unreadable file and every readable file still lands. Two
    good files + one garbage '.parquet' are staged; the census must
    equal exactly the good files' content — and the unit test pins the
    flip side: without the option the read throws.

    Scale shape: corruption detection is per-file at footer-read time
    (no data decoded from bad files); the option is read-path only, no
    write amplification. At 100 TB fleet scale some landing file is
    ALWAYS broken — this is the difference between a nightly job that
    finishes with an audit line and one that dies at 3am. Pair with a
    count reconciliation (`sync_rowcount_validate`) to bound silent
    loss."""
    src = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 2 == 0)
    tag = hashlib.md5(f"corrupt:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:8]
    root = os.path.join(tempfile.gettempdir(), f"hdc_corrupt_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    try:
        src.filter(F.col("o_orderkey") % 4 == 0).write.parquet(f"{root}/a")
        src.filter(F.col("o_orderkey") % 4 == 2).write.parquet(f"{root}/b")
        # flatten the good part-files into root, then plant the bad one
        files = []
        for sub in ("a", "b"):
            for f in os.listdir(f"{root}/{sub}"):
                if f.endswith(".parquet"):
                    dst = os.path.join(root, f"{sub}_{f}")
                    os.replace(os.path.join(root, sub, f), dst)
                    files.append(dst)
            shutil.rmtree(os.path.join(root, sub), ignore_errors=True)
        with open(os.path.join(root, "zz_truncated.parquet"), "wb") as fh:
            fh.write(b"PAR1 this is not a real parquet footer")
        back = (
            spark.read.option("ignoreCorruptFiles", "true")
            .schema(src.schema)
            .parquet(root)
        )
        out = back.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "total_cents"
            ),
        )
        out.collect()  # materialize before staging removal
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------- 2.7 scalar functions: built-in mask() PII surface

_MASK_ORACLE = """
WITH m AS (
  SELECT regexp_replace(regexp_replace(regexp_replace(
           c_name || '/' || c_mktsegment,
           '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked
  FROM customer
)
SELECT masked,
       CAST(COUNT(*) AS BIGINT) AS n
FROM m GROUP BY masked ORDER BY masked
"""


@query("fn_mask_builtin", "2.7 scalar functions", _MASK_ORACLE)
def fn_mask_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in mask(): shape-preserving PII masking at the TYPE level.

    The complement of `text_pii_redact`'s regex pipeline: mask() maps
    every uppercase→X, lowercase→x, digit→n in ONE native call,
    preserving string SHAPE (length, punctuation, word boundaries) —
    exactly what shipping data to a lower trust zone needs: referential
    joins on masked keys still work, formats stay debuggable, raw
    values are gone. Masking customer names collapses them into their
    shape classes; the census counts each class (the oracle rebuilds
    mask() from three regexp_replace passes).

    Scale shape: map-side codegen; the class census is one keyed agg
    whose cardinality is the number of FORMATS, not rows — masked
    feeds are tiny to audit."""
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            F.expr("mask(concat(c_name, '/', c_mktsegment))").alias("masked")
        )
        .groupBy("masked")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("masked")
    )
