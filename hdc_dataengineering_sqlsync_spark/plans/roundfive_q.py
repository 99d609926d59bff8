"""SURVEY.md §2 round-5 additions, batch Z.

Two-proportion A/B z-test and modification-time-filtered incremental
scans. Registered after ``roundfive_p`` (plans/__init__.py) so the qids
append to the END of the never-checked rotation segment.
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

# ------------- 2.12 workloads: two-proportion A/B z-test

# ONE shared expression string over the four exact integers — identical
# IEEE trees in both engines (the corr/OLS discipline).
# nullif-guarded denominator: with a degenerate pooled rate (p = 0 or 1 —
# every unit converted, or none) the z statistic is undefined; both
# engines yield NULL instead of an ANSI divide-by-zero (Spark ANSI raises
# even on DOUBLE division — caught live at sf0.001 where p = 1).
_Z_EXPR = (
    "round((cast(conv_t as double) / cast(n_t as double)"
    " - cast(conv_c as double) / cast(n_c as double))"
    " / nullif(sqrt((cast(conv_t + conv_c as double) / cast(n_t + n_c as double))"
    "        * (1.0 - cast(conv_t + conv_c as double) / cast(n_t + n_c as double))"
    "        * (1.0 / cast(n_t as double) + 1.0 / cast(n_c as double))), 0.0), 4)"
)

_ABTEST_ORACLE = f"""
WITH assign AS (
  SELECT user_id,
         user_id % 2 = 0 AS treated,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
cells AS (
  SELECT COUNT(*) FILTER (WHERE treated) AS n_t,
         SUM(CASE WHEN treated THEN converted ELSE 0 END) AS conv_t,
         COUNT(*) FILTER (WHERE NOT treated) AS n_c,
         SUM(CASE WHEN NOT treated THEN converted ELSE 0 END) AS conv_c
  FROM assign
)
SELECT CAST(n_t AS BIGINT) AS n_t,
       CAST(conv_t AS BIGINT) AS conv_t,
       CAST(n_c AS BIGINT) AS n_c,
       CAST(conv_c AS BIGINT) AS conv_c,
       CAST(conv_t * 10000 // n_t AS BIGINT) AS rate_t_bps,
       CAST(conv_c * 10000 // n_c AS BIGINT) AS rate_c_bps,
       {_Z_EXPR} AS z_score
FROM cells
"""


@query("wl_ab_test_ztest", "2.12 composite workloads", _ABTEST_ORACLE)
def wl_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test: the experimentation readout primitive.

    The statistical core of every A/B platform: users assign
    deterministically (hash parity — here user_id % 2, the same
    assignment both engines compute), the unit-level outcome is binary
    conversion (any purchase event), and the pooled two-proportion
    z-statistic decides significance. Everything up to the final
    statistic is exact integers (unit counts, conversion counts,
    integer-bps rates); the ONE double formula is a shared expression
    string formatted into both engines verbatim.

    Scale shape: unit-level outcomes reduce map-side to one row per
    user (max-per-key partial), then the test collapses to a FOUR-
    integer cell — the statistic costs nothing at any scale; the
    shuffle is the per-user reduction the experiment already needs for
    any per-unit metric."""
    ev = load(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
    ).withColumn("treated", F.col("user_id") % 2 == 0)
    cells = assign.agg(
        F.sum(F.col("treated").cast("long")).alias("n_t"),
        F.sum(F.when(F.col("treated"), F.col("converted")).otherwise(0)).alias(
            "conv_t"
        ),
        F.sum((~F.col("treated")).cast("long")).alias("n_c"),
        F.sum(F.when(~F.col("treated"), F.col("converted")).otherwise(0)).alias(
            "conv_c"
        ),
    )
    return cells.select(
        "n_t",
        F.col("conv_t").cast("long").alias("conv_t"),
        "n_c",
        F.col("conv_c").cast("long").alias("conv_c"),
        F.expr("conv_t * 10000 div n_t").alias("rate_t_bps"),
        F.expr("conv_c * 10000 div n_c").alias("rate_c_bps"),
        F.expr(_Z_EXPR).alias("z_score"),
    )


# ------------- 2.1 scans: modification-time incremental file filter

_MODIFIED_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_total,
       CAST(COUNT(DISTINCT n_regionkey) AS BIGINT) AS n_regions
FROM nation WHERE n_nationkey % 3 <> 0
"""


@query("scan_modified_after", "2.1 scans", _MODIFIED_ORACLE)
def scan_modified_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """modifiedAfter: incremental landing reads by file modification time.

    The zero-infrastructure incremental pattern: when upstream drops
    files into a directory, `option("modifiedAfter", <last-run>)`
    restricts the LISTING to files newer than the previous sync — no
    manifest, no offsets, no log. Three files stage with controlled
    mtimes (two days apart, far from the cutoff so clock skew cannot
    flip the test); the cutoff admits exactly the two newer files and
    the census equals their closed-form content. The honest caveats
    belong with the pattern and are documented here: mtime is
    assigned by the receiving filesystem (object stores: last PUT), so
    use a cutoff with a safety lag and dedup on content keys
    (`sync_idempotency_keys`) — mtime filtering is the cheap first
    gate, not the exactness mechanism.

    Scale shape: the filter applies at file-LISTING time (driver-side,
    before any I/O) — same lever as `scan_recursive_glob`'s
    pathGlobFilter, keyed on time instead of name."""
    n = load(spark, sf_dir, "nation")
    tag = hashlib.md5(f"modafter:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:8]
    root = os.path.join(tempfile.gettempdir(), f"hdc_modafter_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    try:
        slices = {0: "2024-01-01", 1: "2024-01-03", 2: "2024-01-05"}
        import calendar
        import datetime as dt

        for mod, day in slices.items():
            part = n.where(F.col("n_nationkey") % 3 == mod)
            sub = os.path.join(root, f"s{mod}")
            part.coalesce(1).write.parquet(sub)
            epoch = calendar.timegm(
                dt.datetime.fromisoformat(f"{day}T00:00:00").timetuple()
            )
            for f in os.listdir(sub):
                if f.endswith(".parquet"):
                    src_p = os.path.join(sub, f)
                    dst_p = os.path.join(root, f"slice{mod}.parquet")
                    os.replace(src_p, dst_p)
                    os.utime(dst_p, (epoch, epoch))
            shutil.rmtree(sub, ignore_errors=True)
        back = (
            spark.read.schema(n.schema)
            .option("modifiedAfter", "2024-01-02T00:00:00")
            .parquet(root)
        )
        out = back.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_nationkey").alias("key_total"),
            F.countDistinct("n_regionkey").alias("n_regions"),
        )
        out.collect()  # materialize before staging removal
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
