"""Config-driven table-sync job — the reference's end-to-end lifecycle
(SURVEY.md §3.2), runnable as a module:

    python -m hdc_dataengineering_sqlsync_spark.sync_job --config job.json

Config (JSON)::

    {
      "state_path": "/path/state.json",
      "tables": [
        {"name": "orders",
         "pk": ["o_orderkey"],
         "source_path": "/src/orders.parquet",
         "target_path": "/tgt/orders.parquet",
         "version_col": null}
      ]
    }

Per table the job: reads source, drift-checks its schema against the target,
loads the last sync watermark, pulls either the full snapshot or (when
``version_col`` is set and state exists) only rows past the watermark,
diffs/merges into the target, atomically swaps the target directory,
validates row counts, and persists the new watermark. Exactly the
change-tracking sync loop of an MS-SQL CHANGETABLE-based utility, re-expressed
over parquet + Spark; the JDBC transport (sources/jdbc.py) slots in at the
read/write boundary when a database is reachable.

Scale notes: the diff is one PK-keyed shuffle (operators/diff.py); the
changeset is materialized once (operators/merge.py); the atomic
directory swap is the local stand-in for a table-format commit
(Iceberg/Delta snapshot swap) on a real deployment.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.operators.diff import snapshot_diff
from hdc_dataengineering_sqlsync_spark.operators.merge import (
    materialize_changeset,
    merge_apply,
)
from hdc_dataengineering_sqlsync_spark.operators.schema_drift import SchemaDrift, detect_drift
from hdc_dataengineering_sqlsync_spark.operators.state import StateStore, SyncState


@dataclass
class TableSyncConfig:
    name: str
    pk: list[str]
    source_path: str
    target_path: str
    version_col: str | None = None  # monotone change-version column for CDC pulls


@dataclass
class SyncReport:
    table: str
    mode: str  # "initial_copy" | "snapshot" | "incremental"
    op_counts: dict[str, int] = field(default_factory=dict)
    drift: SchemaDrift | None = None
    validated: bool = False
    new_version: int | None = None


def _atomic_swap_write(df: DataFrame, target_path: str) -> None:
    """Write df to a staging dir, then swap it into place. The merged plan
    reads the OLD target lazily, so writing over it in place would corrupt
    the input mid-scan; staging + swap is also what makes a crashed sync
    leave the previous target intact."""
    staging = target_path.rstrip("/") + "__staging"
    df.write.mode("overwrite").parquet(staging)
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    os.replace(staging, target_path)


def _current_version(source: DataFrame, version_col: str) -> int:
    row = source.agg(F.max(F.col(version_col).cast("long")).alias("v")).collect()[0]
    return int(row["v"] if row["v"] is not None else 0)


def sync_table(spark: SparkSession, cfg: TableSyncConfig, store: StateStore) -> SyncReport:
    source = spark.read.parquet(cfg.source_path)
    state = store.get(cfg.name)
    new_version = _current_version(source, cfg.version_col) if cfg.version_col else (
        (state.last_version + 1) if state else 1
    )

    if not os.path.exists(cfg.target_path):
        # first run: full snapshot copy (the reference's initial sync)
        n = source.count()
        _atomic_swap_write(source, cfg.target_path)
        store.put(SyncState(cfg.name, new_version))
        return SyncReport(
            cfg.name, "initial_copy", {"I": n}, None, validated=True, new_version=new_version
        )

    target = spark.read.parquet(cfg.target_path)
    drift = detect_drift(source.schema, target.schema)
    if drift.is_drifted:
        # structural drift needs an operator decision (migrate vs fail);
        # report and stop rather than silently merging mismatched schemas
        return SyncReport(cfg.name, "snapshot", {}, drift, validated=False)

    if cfg.version_col and state is not None:
        # CDC pull: only rows whose change-version is past the watermark —
        # the CHANGETABLE(CHANGES ..., @last_version) analog. Deletes are
        # invisible to a pure version filter (as in real change tracking a
        # delete arrives as a tombstone row); periodic snapshot diffs catch
        # any residue.
        mode = "incremental"
        delta = source.where(F.col(cfg.version_col).cast("long") > state.last_version)
        changes = materialize_changeset(
            snapshot_diff(delta, target.join(delta.select(*cfg.pk), cfg.pk, "left_semi"),
                          pk=cfg.pk)
        )
    else:
        mode = "snapshot"
        changes = materialize_changeset(snapshot_diff(source, target, pk=cfg.pk))

    op_counts = {
        r["change_op"]: r["n"]
        for r in changes.groupBy("change_op").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    merged = merge_apply(target, changes, pk=cfg.pk)
    _atomic_swap_write(merged, cfg.target_path)

    # post-apply validation (sync_rowcount_validate semantics)
    if mode == "snapshot":
        expect = source.agg(F.count(F.lit(1)).alias("n"), F.countDistinct(*cfg.pk).alias("p"))
        got = spark.read.parquet(cfg.target_path).agg(
            F.count(F.lit(1)).alias("n"), F.countDistinct(*cfg.pk).alias("p")
        )
        validated = expect.collect()[0] == got.collect()[0]
    else:
        validated = True  # incremental: full validation deferred to next snapshot diff
    if validated:
        store.put(SyncState(cfg.name, new_version))
    return SyncReport(cfg.name, mode, op_counts, None, validated, new_version)


def run_sync(spark: SparkSession, config: dict) -> list[SyncReport]:
    store = StateStore(config["state_path"])
    return [
        sync_table(spark, TableSyncConfig(**tbl), store) for tbl in config["tables"]
    ]


def main() -> None:  # pragma: no cover - thin CLI shell over run_sync
    ap = argparse.ArgumentParser(description="Run a config-driven table sync")
    ap.add_argument("--config", required=True, help="path to job JSON")
    args = ap.parse_args()
    with open(args.config) as f:
        config = json.load(f)
    from hdc_dataengineering_sqlsync_spark.session import get_session

    spark = get_session(app_name="sync_job")
    for report in run_sync(spark, config):
        print(json.dumps(report.__dict__, default=lambda o: o.__dict__))


if __name__ == "__main__":  # pragma: no cover
    main()
