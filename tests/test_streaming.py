"""SURVEY.md §5.3 — streaming equivalence + watermark/state unit tests.

Windowed streaming jobs replayed over events.parquet (availableNow) must
equal their declared batch twins; watermark late-drop and stateful dedup use
two sequential availableNow runs on one checkpoint to force watermark
advancement between micro-batches.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans import CATALOG
from hdc_dataengineering_sqlsync_spark.streaming import jobs
from hdc_dataengineering_sqlsync_spark.testing import canonicalize, spark_result


def _assert_stream_equals_batch(spark, sf_dir, stream_df_fn, batch_qid, drop_cols=()):
    stream = jobs.read_events_stream(spark, jobs.events_path(sf_dir))
    name, q = jobs.run_to_memory(stream_df_fn(stream))
    try:
        got = spark.sql(f"SELECT * FROM {name}")
        want = CATALOG[batch_qid].fn(spark, sf_dir)
        for c in drop_cols:
            got, want = got.drop(c), want.drop(c)
        gc, gr = spark_result(got)
        wc, wr = spark_result(want)
        assert sorted(gc) == sorted(wc)
        assert canonicalize(gc, gr) == canonicalize(wc, wr)
    finally:
        q.stop()


def test_stream_tumbling_equals_batch(spark, sf_dir):
    _assert_stream_equals_batch(spark, sf_dir, jobs.tumbling_1h, "stream_tumbling_1h")


def test_stream_sliding_equals_batch(spark, sf_dir):
    _assert_stream_equals_batch(spark, sf_dir, jobs.sliding_2h_1h, "stream_sliding_2h_1h")


def test_stream_session_equals_batch(spark, sf_dir):
    # compare at the per-session level the batch query aggregates from
    stream = jobs.read_events_stream(spark, jobs.events_path(sf_dir))
    name, q = jobs.run_to_memory(jobs.session_30m(stream))
    try:
        sess = spark.sql(f"SELECT * FROM {name}")
        per_user = (
            sess.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_sessions"),
                F.round(F.avg("secs"), 1).alias("avg_session_secs"),
                F.max("n_events").alias("max_events"),
            )
        )
        want = CATALOG["stream_session_30m"].fn(spark, sf_dir)
        gc, gr = spark_result(per_user)
        wc, wr = spark_result(want)
        assert canonicalize(gc, gr) == canonicalize(wc, wr)
    finally:
        q.stop()


@pytest.fixture()
def two_phase_dirs():
    src = tempfile.mkdtemp(prefix="hdc_stream_src_")
    ckpt = tempfile.mkdtemp(prefix="hdc_stream_ckpt_")
    yield src, ckpt
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        [(i, ts, uid, et, v, "{}") for (i, ts, uid, et, v) in rows],
        schema="event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _drain(spark, src, ckpt, transform, name):
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(src)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT event_id FROM {name}")


def test_watermark_drops_late_rows(spark, two_phase_dirs):
    """Append-mode agg with watermark: a row older than the advanced
    watermark arriving in a later micro-batch is dropped. Two sequential
    availableNow runs on one checkpoint force watermark persistence; the
    sink is parquet (memory sink cannot recover from a checkpoint)."""
    src, ckpt = two_phase_dirs
    out = src + "_out"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def run_phase(rows):
        _write_events(spark, src, rows)
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.format("parquet").option("path", out)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.processAllAvailable()
        q.stop()

    # phase 1: events at 00:30 and 06:00 -> watermark advances to 05:00,
    # closing (and emitting) the 00:00 window with n=1
    run_phase([(1, t0 + dt.timedelta(minutes=30), 1, "view", 1.0),
               (2, t0 + dt.timedelta(hours=6), 1, "view", 1.0)])
    # phase 2: a late event at 00:45 (behind the 05:00 watermark, dropped)
    # + a fresh one at 07:00 that closes the 06:00 window
    run_phase([(3, t0 + dt.timedelta(minutes=45), 1, "view", 1.0),
               (4, t0 + dt.timedelta(hours=7), 1, "view", 1.0)])

    emitted = {r["ws"]: r["n"] for r in spark.read.parquet(out).collect()}
    assert emitted.get(t0) == 1  # late event_id=3 did NOT bump the count
    # the 06:00 window stays open (watermark 06:00 < window end 07:00):
    # append mode emitted exactly the one closed window
    assert emitted == {t0: 1}


def test_drop_duplicates_within_watermark(spark, two_phase_dirs):
    src, ckpt = two_phase_dirs
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    _write_events(spark, src, [(1, t0, 1, "view", 1.0), (1, t0 + dt.timedelta(minutes=1), 1, "view", 1.0),
                               (2, t0 + dt.timedelta(minutes=2), 1, "view", 1.0)])
    got = _drain(
        spark, src, ckpt,
        lambda s: s.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"]),
        "dedup_t",
    )
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2]


def test_foreach_batch_merge_syncs_target(spark, sf_dir, two_phase_dirs):
    """Streaming continuous sync: replaying the source through foreachBatch
    merge converges the target parquet to the source (sync_merge_apply's
    streaming twin)."""
    src, ckpt = two_phase_dirs
    from hdc_dataengineering_sqlsync_spark.registry import load

    orders = load(spark, sf_dir, "orders")
    target_path = src + "/target"
    # corrupted target (same derivation as the sync fixtures)
    target = orders.where(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 101 == 0, "X").otherwise(F.col("o_orderstatus")),
    )
    target.write.mode("overwrite").parquet(target_path)

    src_stream_dir = src + "/source_stream"
    orders.coalesce(1).write.mode("overwrite").parquet(src_stream_dir)
    stream = spark.readStream.schema(orders.schema).parquet(src_stream_dir)
    q = jobs.foreach_batch_merge(stream, target_path, pk=["o_orderkey"], checkpoint_dir=ckpt)
    q.processAllAvailable()
    q.stop()

    merged = spark.read.schema(orders.schema).parquet(target_path)
    assert merged.count() == orders.count()
    assert merged.exceptAll(orders).count() == 0
    assert orders.exceptAll(merged).count() == 0


def test_transform_with_state_counter(spark, sf_dir):
    """transformWithStateInPandas running per-user counter: final counts per
    user equal the batch group-by."""
    import tempfile as tf

    stream = jobs.read_events_stream(spark, jobs.events_path(sf_dir))
    ckpt = tf.mkdtemp(prefix="hdc_tws_ckpt_")
    try:
        counted = jobs.running_user_counter(stream)
        q = (
            counted.writeStream.format("memory").queryName("tws_t")
            .outputMode("update").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.processAllAvailable()
        q.stop()
        # last update per user is the running total
        got = (
            spark.sql("SELECT * FROM tws_t")
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"))
        )
        from hdc_dataengineering_sqlsync_spark.registry import load

        want = load(spark, sf_dir, "events").groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events")
        )
        gc, gr = spark_result(got)
        wc, wr = spark_result(want)
        assert canonicalize(gc, gr) == canonicalize(wc, wr)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_session_window_boundary_exact_gap(spark):
    """SURVEY §7 known-hard #3, measured on PySpark 4.1: an event at exactly
    prev_ts + gap MERGES into the running session (per-event windows
    [ts, ts+gap) merge when touching), while one microsecond past the gap
    starts a new session. The oracle's gaps-and-islands break is therefore
    strict '>' on the diff — '>=' would wrongly split the boundary event."""
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0)),
        (1, datetime(2024, 1, 1, 0, 29, 59)),  # same session (< 30min after prev)
        (1, datetime(2024, 1, 1, 0, 59, 59)),  # exactly 30min after prev -> merges
        (2, datetime(2024, 1, 1, 0, 0, 0)),
        (2, datetime(2024, 1, 1, 0, 30, 0, 1)),  # 30min + 1us -> NEW session
    ]
    e = spark.createDataFrame(rows, "user_id long, ts timestamp")
    sess = e.groupBy("user_id", F.session_window("ts", "30 minutes")).count()
    per_user = {r["user_id"]: r["n"] for r in
                sess.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_user == {1: 1, 2: 2}


def test_update_mode_replay_emits_multiple_versions(spark, sf_dir):
    """stream_update_mode_replay's premise: with maxFilesPerTrigger=1 over
    a 4-file stage, the SAME (window, type) key is emitted in several
    micro-batches, so the update-mode sink holds more rows than the final
    answer — the reconstruction (per-key max) is then load-bearing. Uses
    the qid's OWN pipeline (drain_update_emissions) so test and operator
    cannot drift apart."""
    from pyspark.sql import functions as F

    from hdc_dataengineering_sqlsync_spark.plans import CATALOG
    from hdc_dataengineering_sqlsync_spark.plans.roundnine_j import (
        drain_update_emissions,
    )
    from hdc_dataengineering_sqlsync_spark.registry import load

    log = drain_update_emissions(spark, sf_dir)
    emitted = log.count()
    finals = log.select("window_start", "event_type").distinct().count()
    assert emitted > finals, (emitted, finals)
    # and the qid's reconstruction equals the batch census
    got = CATALOG["stream_update_mode_replay"].fn(spark, sf_dir)
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_final"))
    )
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0


def test_checkpoint_restart_committed_two_separate_batches(spark, sf_dir):
    """stream_checkpoint_restart_exactly_once must really be TWO runs over
    one checkpoint: the file sink's _spark_metadata commit log holds one
    entry per drained micro-batch run (0 and 1), and the union of the two
    runs' outputs covers every event exactly once."""
    import os

    from hdc_dataengineering_sqlsync_spark.plans import CATALOG
    from hdc_dataengineering_sqlsync_spark.registry import load
    from hdc_dataengineering_sqlsync_spark.streaming.jobs import staged_copy_dir

    got = CATALOG["stream_checkpoint_restart_exactly_once"].fn(spark, sf_dir)
    out = os.path.join(staged_copy_dir(sf_dir, "ckpt_restart"), "out")
    meta = os.path.join(out, "_spark_metadata")
    commits = [f for f in os.listdir(meta) if f.isdigit()]
    assert sorted(commits) == ["0", "1"], commits
    n_out = spark.read.parquet(out).count()
    assert n_out == load(spark, sf_dir, "events").count()
    assert got.count() > 0
