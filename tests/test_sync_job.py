"""End-to-end tests for the config-driven sync job (sync_job.py) — the
reference's full lifecycle: initial copy -> corrupted-target repair ->
idempotent no-op -> CDC incremental pull -> drift refusal."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.operators.state import StateStore
from hdc_dataengineering_sqlsync_spark.registry import load
from hdc_dataengineering_sqlsync_spark.sync_job import TableSyncConfig, run_sync, sync_table


@pytest.fixture()
def paths(tmp_path):
    return {
        "src": str(tmp_path / "src_orders"),
        "tgt": str(tmp_path / "tgt_orders"),
        "state": str(tmp_path / "state.json"),
    }


def _digest_set(spark, path):
    df = spark.read.parquet(path)
    return {
        r["d"]
        for r in df.select(
            F.xxhash64(*[F.col(c) for c in sorted(df.columns)]).alias("d")
        ).collect()
    }


def test_sync_job_full_lifecycle(spark, sf_dir, paths):
    orders = load(spark, sf_dir, "orders")
    orders.write.parquet(paths["src"])

    cfg = TableSyncConfig(
        name="orders", pk=["o_orderkey"], source_path=paths["src"], target_path=paths["tgt"]
    )
    store = StateStore(paths["state"])

    # 1) first run: initial full copy
    r1 = sync_table(spark, cfg, store)
    assert r1.mode == "initial_copy" and r1.validated
    assert _digest_set(spark, paths["tgt"]) == _digest_set(spark, paths["src"])

    # 2) corrupt the target (simulated drifted replica), re-sync repairs it
    corrupted = (
        spark.read.parquet(paths["tgt"])
        .where(F.col("o_orderkey") % 7 != 0)  # deletes
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 11 == 0, F.lit("Z")).otherwise(F.col("o_orderstatus")),
        )
    )
    staging = paths["tgt"] + "_c"
    corrupted.write.parquet(staging)
    import shutil

    shutil.rmtree(paths["tgt"])
    os.replace(staging, paths["tgt"])

    r2 = sync_table(spark, cfg, store)
    assert r2.mode == "snapshot" and r2.validated
    assert r2.op_counts.get("I", 0) > 0 and r2.op_counts.get("U", 0) > 0
    assert _digest_set(spark, paths["tgt"]) == _digest_set(spark, paths["src"])

    # 3) idempotent: nothing to apply on an in-sync pair
    r3 = sync_table(spark, cfg, store)
    assert r3.op_counts == {} and r3.validated

    # 4) state advanced monotonically
    st = store.get("orders")
    assert st is not None and st.last_version == r3.new_version


def test_sync_job_incremental_versioned(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    state = str(tmp_path / "state.json")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "id long, val string, ver long"
    )
    v1.write.parquet(src)
    cfg = TableSyncConfig(
        name="t", pk=["id"], source_path=src, target_path=tgt, version_col="ver"
    )
    store = StateStore(state)
    r1 = sync_table(spark, cfg, store)
    assert r1.mode == "initial_copy" and r1.new_version == 10

    # source advances: one update (id=2) and one insert (id=4) at ver=20
    v2 = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", 10), (4, "d", 20)],
        "id long, val string, ver long",
    )
    import shutil

    shutil.rmtree(src)
    v2.write.parquet(src)
    r2 = sync_table(spark, cfg, store)
    assert r2.mode == "incremental" and r2.new_version == 20
    assert r2.op_counts.get("I", 0) == 1 and r2.op_counts.get("U", 0) == 1
    got = {(r["id"], r["val"]) for r in spark.read.parquet(tgt).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


def test_sync_job_refuses_drifted_schema(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    spark.createDataFrame([(1, "a")], "id long, val string").write.parquet(src)
    spark.createDataFrame([(1, 2.5)], "id long, other double").write.parquet(tgt)
    cfg = TableSyncConfig(name="t", pk=["id"], source_path=src, target_path=tgt)
    r = sync_table(spark, cfg, StateStore(str(tmp_path / "s.json")))
    assert not r.validated and r.drift is not None and r.drift.is_drifted
    assert "val" in r.drift.removed and "other" in r.drift.added


def test_run_sync_multi_table(spark, sf_dir, tmp_path):
    cfgs = []
    for name, pk in [("region", ["r_regionkey"]), ("nation", ["n_nationkey"])]:
        src = str(tmp_path / f"src_{name}")
        load(spark, sf_dir, name).write.parquet(src)
        cfgs.append(
            {
                "name": name,
                "pk": pk,
                "source_path": src,
                "target_path": str(tmp_path / f"tgt_{name}"),
            }
        )
    config = {"state_path": str(tmp_path / "state.json"), "tables": cfgs}
    reports = run_sync(spark, config)
    assert [r.validated for r in reports] == [True, True]
    reports2 = run_sync(spark, config)
    assert all(r.op_counts == {} for r in reports2)
