"""SparkSession factory.

One place to pin every config that matters for correctness (UTC timestamps,
Arrow transfer) and scale (AQE, shuffle partitions, broadcast threshold).

Scale notes (100 TB / 1000-executor target — SURVEY.md §4):
  - AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
    broadcast conversion replace hand-tuned partition counts at scale.
  - ``spark.sql.shuffle.partitions`` here is a *local-mode test* setting; on a
    real cluster it is overridden (or left to AQE's
    ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``).
  - Arrow enabled so every pandas-UDF boundary is vectorized batch transfer,
    never per-row pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_session", "DEFAULT_SHUFFLE_PARTITIONS"]

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "hdc_sqlsync_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the SparkSession with engine defaults.

    Defaults are correct for local[N] testing; on a cluster pass ``master``
    and override partitions via ``extra_conf``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime re-plan (partition coalescing, skew join, broadcast
        # conversion). This is the main lever that makes one logical plan
        # behave well from sf0.001 tests to the 100 TB target.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # local[N] runs everything in the DRIVER JVM, whose Spark default
        # heap is 1g — long sessions repeating checkpoint-heavy iterative
        # queries (pagerank, connected components: localCheckpoint blocks
        # are reclaimed by the ContextCleaner only after a GC notices the
        # dropped references) can OOM it (bench r5 did, 23 queries x 6
        # runs). Effective only at JVM launch, ignored on an existing one;
        # on a real cluster executor/driver memory is deployment config.
        .config("spark.driver.memory", "8g")
        # Arrow for every Python<->JVM data transfer (toPandas, pandas UDFs).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Write timestamps as TIMESTAMP_MICROS, not the legacy INT96 default:
        # INT96 row groups carry NO min/max statistics, so a timestamp
        # predicate can never skip row groups in files we write (probed via
        # the parquet footer — test_sorted_layout_builds_skippable_row_groups)
        # and INT96 is deprecated for interop. Matches the testdata's own
        # timestamp[us] encoding.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # zstd over the snappy default for engine writes: measured on sf0.1
        # lineitem (r3) 10.7 MB -> 8.6 MB (-20%) at equal-or-faster write
        # and read times. At the 100 TB target that is 20% less storage,
        # scan I/O, and sync-transfer volume for free (zstd-jni ships in
        # Spark's classpath; pyarrow/DuckDB read zstd parquet natively).
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Deterministic cross-engine timestamps (DuckDB oracle is UTC-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # Let Python DataSource readers receive pushed filters
        # (sources/pydatasource.py implements pushFilters).
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # State-store maintenance (snapshot/cleanup) never needs to fire
        # inside a short availableNow replay; with the default 60s it starts
        # competing with live micro-batches once a session has run several
        # stateful queries (one provider per shuffle partition per query).
        # Long-running production streams should tune this down again.
        .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
        # Quiet the UI in non-interactive runs.
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
