"""SURVEY.md §2.10 — batch-equivalent forms of the streaming operators.

Each declared qid computes, in batch, the final state the Structured
Streaming job (streaming/jobs.py) converges to; unit tests assert the two
are collect()-identical. Watermark/late-data behavior is stream-only ->
rows-only/unit (SURVEY §2.10 strategy note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load


@query(
    "stream_tumbling_1h",
    "2.10 streaming",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def stream_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window x event_type via the real F.window primitive (the
    same expression the streaming job uses with a watermark)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
        .orderBy("window_start", "event_type")
    )


@query(
    "stream_sliding_2h_1h",
    "2.10 streaming",
    """
    SELECT ws AS window_start, count(*) AS n
    FROM (
      SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)]) AS ws
      FROM events
    )
    GROUP BY ws ORDER BY ws
    """,
)
def stream_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h window, 1h slide: every event lands in exactly two windows
    (the oracle enumerates both covering slides per row)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
        .orderBy("window_start")
    )


_SESSION_ORACLE = """
WITH o AS (
  SELECT user_id, ts,
         event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
i AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
s AS (
  SELECT user_id, sid, count(*) AS n_events,
         CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1e6 AS secs
  FROM i GROUP BY user_id, sid
)
SELECT user_id, count(*) AS n_sessions,
       round(avg(secs), 1) AS avg_session_secs,
       max(n_events) AS max_events
FROM s GROUP BY user_id ORDER BY user_id
"""


def _session_rollup(sessions: DataFrame) -> DataFrame:
    """Per-user rollup over a (user_id, n_events, secs) session table — the
    single definition both the batch and live-replay session qids share
    (they also share _SESSION_ORACLE, so the contract must not fork)."""
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("secs"), 1).alias("avg_session_secs"),
            F.max("n_events").alias("max_events"),
        )
        .orderBy("user_id")
    )


@query("stream_session_30m", "2.10 streaming", _SESSION_ORACLE, bench=True)
def stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via the native session_window
    primitive; oracle is the gaps-and-islands formulation. Boundary semantics
    match: an event at EXACTLY last_ts + gap still merges into the session
    (Spark merges touching per-event windows; verified by
    tests/test_streaming.py::test_session_window_boundary_exact_gap), so the
    oracle's island break is strict '>' — SURVEY §7 known-hard #3."""
    e = load(spark, sf_dir, "events")
    sess = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    )
    secs = (F.unix_micros("t1") - F.unix_micros("t0")).cast("double") / 1e6
    return _session_rollup(sess.select("user_id", "n_events", secs.alias("secs")))


@query(
    "stream_tumbling_replay",
    "2.10 streaming",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
    bench=True,  # VERDICT r2 #5: streaming-machinery cost in the bench gate
)
def stream_tumbling_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTUAL Structured Streaming pipeline, declared: replay events
    through the file source (readStream -> watermark -> window agg ->
    availableNow memory sink), then return the drained final state. Same
    oracle as stream_tumbling_1h — a readStream job hash-matched against
    DuckDB, proving batch/stream convergence inside the t2 gate rather than
    only in unit tests."""
    from hdc_dataengineering_sqlsync_spark.streaming.jobs import (
        events_path,
        read_events_stream,
        run_to_memory,
        tumbling_1h,
    )

    stream = read_events_stream(spark, events_path(sf_dir))
    view, q = run_to_memory(tumbling_1h(stream), mode="complete")
    q.stop()
    return spark.table(view).orderBy("window_start", "event_type")


@query(
    "stream_sliding_replay",
    "2.10 streaming",
    """
    SELECT ws AS window_start, count(*) AS n
    FROM (
      SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)]) AS ws
      FROM events
    )
    GROUP BY ws ORDER BY ws
    """,
)
def stream_sliding_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live sliding-window streaming run (2h window, 1h slide) via file-source
    replay + availableNow memory sink; same oracle as the batch twin
    stream_sliding_2h_1h — second declared readStream pipeline."""
    from hdc_dataengineering_sqlsync_spark.streaming.jobs import (
        events_path,
        read_events_stream,
        run_to_memory,
        sliding_2h_1h,
    )

    stream = read_events_stream(spark, events_path(sf_dir))
    view, q = run_to_memory(sliding_2h_1h(stream), mode="complete")
    q.stop()
    return spark.table(view).orderBy("window_start")


@query("stream_session_replay", "2.10 streaming", _SESSION_ORACLE)
def stream_session_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live session-window streaming run: readStream -> watermark ->
    session_window(30 min) state -> availableNow memory sink, then the
    per-user rollup on the drained session table (streaming allows a single
    stateful aggregation per query, so the second-level rollup runs batch on
    the sink — the production shape for session analytics). Same oracle as
    stream_session_30m."""
    from hdc_dataengineering_sqlsync_spark.streaming.jobs import (
        events_path,
        read_events_stream,
        run_to_memory,
        session_30m,
    )

    stream = read_events_stream(spark, events_path(sf_dir))
    view, q = run_to_memory(session_30m(stream), mode="complete")
    q.stop()
    return _session_rollup(spark.table(view))


@query(
    "stream_dedup_replay",
    "2.10 streaming",
    """
    SELECT date_trunc('hour', ts) AS bucket_ts, count(DISTINCT event_id) AS n
    FROM events GROUP BY bucket_ts ORDER BY bucket_ts
    """,
)
def stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live stateful stream dedup: the events file source is unioned with
    itself (every event arrives twice), dropDuplicatesWithinWatermark on
    event_id keeps one arrival, and the deduped append stream drains to a
    memory sink; the hourly rollup then runs as a batch query on the drained
    rows (one stateful operator per streaming query, as with the session
    replay). Whichever duplicate arrival wins, the kept row is bit-identical,
    so the result is deterministic and equals the batch DISTINCT oracle."""
    from hdc_dataengineering_sqlsync_spark.streaming.jobs import (
        dedup_within_watermark,
        events_path,
        read_events_stream,
        run_to_memory,
    )

    stream = read_events_stream(spark, events_path(sf_dir))
    doubled = stream.union(read_events_stream(spark, events_path(sf_dir)))
    view, q = run_to_memory(dedup_within_watermark(doubled), mode="append")
    q.stop()
    return (
        spark.table(view)
        .groupBy(F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket_ts")
    )


_PYDS_STREAM_ORACLE = """
SELECT CAST(i % 10 AS INT) AS bucket, count(*) AS n,
       round(sum(((i * 37) % 1000) / 10.0), 2) AS total
FROM (SELECT unnest(range(0, 5000)) AS i)
GROUP BY bucket ORDER BY bucket
"""


@query("pyds_stream_source", "2.10 streaming", _PYDS_STREAM_ORACLE)
def pyds_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A LIVE microbatch run over a custom Python STREAMING data source
    (sources/pydatasource.py::SyntheticEventsStreamReader — Spark 4
    SimpleDataSourceStreamReader): offset-tracked chunks drain through a
    complete-mode memory sink, and the final per-bucket aggregate state is
    hash-matched against the closed-form oracle. Proves the custom-source
    offset/commit/replay contract end-to-end, not just the batch reader."""
    import tempfile
    import uuid

    from hdc_dataengineering_sqlsync_spark.sources.pydatasource import register
    from hdc_dataengineering_sqlsync_spark.streaming.jobs import stream_shuffle

    register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", 5000)  # 2 microbatches: offset advance is still
        .option("chunk", 2500)  # exercised; per-batch Python cost stays low
        .load()
    )
    agg = stream.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    name = f"pyds_stream_{uuid.uuid4().hex[:8]}"
    with stream_shuffle(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="pyds_stream_ckpt_"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.table(name).orderBy("bucket")


@query(
    "stream_stateful_counter_replay",
    "2.10 streaming",
    """
    SELECT user_id, count(*) AS n_events
    FROM events WHERE user_id % 5 = 0
    GROUP BY user_id ORDER BY user_id
    """,
)
def stream_stateful_counter_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARBITRARY stateful streaming op, driver-checked with state recovery:
    the per-user running counter (streaming/jobs.py::running_user_counter,
    applyInPandasWithState) runs as TWO sequential availableNow queries over
    ONE checkpoint — phase 1 counts the first half of the slice (ts before
    Jan 16), phase 2 delivers the rest, and the counter must resume from the
    RECOVERED per-user state, not restart at zero. Every update emission
    appends to a parquet log via foreachBatch (the recoverable sink — memory
    sinks cannot resume a checkpoint); the counter is monotonic per user, so
    the final count is max(n_events) over the log. The oracle is the
    whole-slice batch count, so a state-recovery regression (phase 2
    counting from zero) hash-fails."""
    import tempfile
    import uuid

    from hdc_dataengineering_sqlsync_spark.streaming.jobs import (
        running_user_counter,
        stream_shuffle,
    )

    base = tempfile.mkdtemp(prefix=f"hdc_ctr_{uuid.uuid4().hex[:8]}_")
    src, ckpt, out = f"{base}/src", f"{base}/ckpt", f"{base}/out"
    sliced = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id") % 5 == 0)
        .select("user_id", "ts")
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    schema = "user_id long, ts timestamp"

    def append_updates(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    def run_phase(chunk: DataFrame) -> None:
        chunk.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            running_user_counter(stream)
            .writeStream.foreachBatch(append_updates)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    with stream_shuffle(spark):
        run_phase(sliced.where(F.col("ts") < cut))
        run_phase(sliced.where(F.col("ts") >= cut))
    return (
        spark.read.schema("user_id long, n_events long")
        .parquet(out)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .orderBy("user_id")
    )


_LATE_DROP_ORACLE = """
SELECT * FROM (VALUES (TIMESTAMP '2024-01-01 00:00:00', CAST(2 AS BIGINT)),
                      (TIMESTAMP '2024-01-01 06:00:00', CAST(1 AS BIGINT)))
    AS t(ws, n)
ORDER BY ws
"""


@query("stream_watermark_late_drop", "2.10 streaming", _LATE_DROP_ORACLE)
def stream_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA semantics, driver-checked: two sequential
    availableNow runs over ONE checkpoint (the watermark persists between
    them). Phase 1 advances the watermark past the first window's close;
    phase 2 delivers a LATE row behind the watermark (dropped — it must not
    bump the closed window's count) plus fresh rows that close the next
    window. Append mode emits exactly the closed windows; the oracle pins
    the emitted rows, so a watermark regression (late row counted, window
    emitted early) hash-fails. Self-contained fixture — the semantics under
    test are the streaming engine's, not the data's."""
    import datetime as dt
    import tempfile
    import uuid

    from hdc_dataengineering_sqlsync_spark.streaming.jobs import stream_shuffle

    base = tempfile.mkdtemp(prefix=f"hdc_late_{uuid.uuid4().hex[:8]}_")
    src, ckpt, out = f"{base}/src", f"{base}/ckpt", f"{base}/out"
    # tz-aware: createDataFrame interprets NAIVE datetimes in the PYTHON
    # process TZ (not the pinned session TZ), which shifts the instants —
    # and thus the window boundaries — on a non-UTC machine (r4 TZ sweep)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0, tzinfo=dt.timezone.utc)
    schema = "event_id long, ts timestamp"

    def run_phase(rows) -> None:
        # One explicit slice: createDataFrame(list) otherwise parallelizes
        # into defaultParallelism pickled slices and a coalesce(1) then
        # evaluates all 32 Python slices sequentially in one task — measured
        # ~4.7s per phase on local[32] for a 3-row fixture vs ~0.3s this way.
        fixture = spark.createDataFrame(spark.sparkContext.parallelize(rows, numSlices=1), schema)
        fixture.write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    # 2 shuffle partitions for this 5-row stateful job: the state store
    # creates one provider dir per shuffle partition per run (see
    # streaming/jobs.py::STREAM_SHUFFLE_PARTITIONS). The checkpoint pins the
    # state partitioning at first start, so both phases agree.
    with stream_shuffle(spark, 2):
        # phase 1: two rows in the 00:00 window + one at 06:00 -> watermark
        # 05:00 closes (emits) the 00:00 window with n=2
        run_phase(
            [
                (1, t0 + dt.timedelta(minutes=30)),
                (2, t0 + dt.timedelta(minutes=40)),
                (3, t0 + dt.timedelta(hours=6)),
            ]
        )
        # phase 2: a LATE row at 00:45 (behind the 05:00 watermark ->
        # dropped, the closed 00:00 window stays n=2) + 08:30 -> watermark
        # 07:30 closes the 06:00 window with n=1
        run_phase(
            [
                (4, t0 + dt.timedelta(minutes=45)),
                (5, t0 + dt.timedelta(hours=8, minutes=30)),
            ]
        )
    return spark.read.schema("ws timestamp, n long").parquet(out).orderBy("ws")
