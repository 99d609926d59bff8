"""Structured Streaming jobs (SURVEY.md §2.10).

Each windowed job is the streaming twin of a declared batch qid
(plans/streaming_batch.py); unit tests replay ``events.parquet`` through the
file source with ``trigger(availableNow=True)`` and assert the final state is
collect()-identical to the batch result (SURVEY §5.3).

Design notes for the real-stream deployment:
  - event time = ``ts``; watermarks bound state for append-mode sinks.
  - ``complete`` output to a memory sink is used in tests to observe final
    aggregate state without waiting for watermark closure; production sinks
    use append + watermark, or update to an idempotent upsert sink
    (``foreach_batch_merge`` below, reusing the batch merge operator).
  - state-heavy ops (dropDuplicatesWithinWatermark, transformWithState) keep
    per-key state in the state store; at scale that store is RocksDB-backed
    and keyed by the shuffle partitioning, so state size is bounded by
    watermark horizon, not stream length.
"""

from __future__ import annotations

import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.operators.diff import snapshot_diff
from hdc_dataengineering_sqlsync_spark.operators.merge import merge_apply
from hdc_dataengineering_sqlsync_spark.registry import SCHEMAS, path_for

def read_events_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """File-source stream over events parquet (timestamp[us], read natively
    with the same declared schema as the batch loader in registry.load)."""
    return spark.readStream.schema(SCHEMAS["events"]).parquet(events_path)


def table_stream_dir(sf_dir: str, table: str) -> str:
    """The file stream source needs a *directory*; stage a temp dir holding a
    symlink to the table's parquet (read-only testdata cannot be moved)."""
    import hashlib
    import os
    import tempfile

    src = path_for(sf_dir, table)
    tag = hashlib.md5(src.encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"hdc_stream_{table}_{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{table}.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return d


def events_path(sf_dir: str) -> str:
    return table_stream_dir(sf_dir, "events")


def staged_copy_dir(sf_dir: str, name: str, table: str = "events") -> str:
    """Temp root for qids that stage a REWRITTEN copy of a table (multi-file
    splits for throttled/checkpointed replays — a symlink can't express
    those). Unlike `table_stream_dir`'s always-fresh symlink, a staged copy
    can go stale, so the tag hashes the source's absolute path, mtime and
    size: a trailing-slash sf_dir, a same-basename different tree, or a
    regenerated fixture all land in a DIFFERENT directory and re-stage
    (review-r9 finding: a bare basename key served sf0.1's staged events to
    an sf0.01 oracle). Caller owns creation and its own done-marker."""
    import hashlib
    import os
    import tempfile

    src = path_for(sf_dir, table)
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"hdc_{name}_{tag}")


def tumbling_1h(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


def sliding_2h_1h(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_30m(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    sess = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    )
    secs = (F.unix_micros("t1") - F.unix_micros("t0")).cast("double") / 1e6
    return sess.select("user_id", "n_events", secs.alias("secs"))


# Stateful streaming creates one state-store provider directory per shuffle
# partition per query; at the default 32 partitions a session that replays
# several streaming fixtures piles up 100+ providers whose maintenance and
# per-partition state tasks dominate wall time on small inputs (measured:
# stream_watermark_late_drop 15.2s -> ~5s once providers stay bounded). Four
# partitions still exercises multi-partition state merge; a real deployment
# sizes this per stream volume — state is bounded by the watermark horizon,
# not stream length, so the partition count tracks throughput, not history.
STREAM_SHUFFLE_PARTITIONS = 4


@contextmanager
def stream_shuffle(spark: SparkSession, n: int = STREAM_SHUFFLE_PARTITIONS):
    """Run a streaming query under a reduced shuffle-partition count.

    Safe to restore after ``start()``: a streaming query clones the session
    conf when it starts, so later batches keep the pinned value (and the
    checkpoint pins the state partitioning for the query's lifetime)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def run_to_memory(
    df: DataFrame, mode: str = "complete", name: str | None = None
) -> tuple[str, "object"]:
    """Drain all available input into a memory sink; returns (view_name,
    query). availableNow + processAllAvailable makes the run synchronous."""
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    spark = df.sparkSession
    with stream_shuffle(spark):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
    return name, q


def dedup_within_watermark(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful stream dedup on event_id bounded by the watermark horizon."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def interval_join_view_purchase(
    views: DataFrame, purchases: DataFrame, horizon: str = "1 hour", how: str = "inner"
) -> DataFrame:
    """Stream-stream interval join: each view event pairs with the same
    user's purchase events landing within [view.ts, view.ts + horizon].

    Both sides carry a watermark and the join condition carries an explicit
    event-time range, so Spark can bound join state: a buffered view row is
    evictable once the purchase-side watermark passes view.ts + horizon
    (state size tracks the horizon × arrival rate, not stream length). The
    equality key (user_id) keys the state-store shuffle, so matching is
    partition-local after one shuffle per side.
    """
    v = (
        views.where(F.col("event_type") == "view")
        .withWatermark("ts", horizon)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("v_id"),
        )
    )
    p = (
        purchases.where(F.col("event_type") == "purchase")
        .withWatermark("ts", horizon)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
    )
    return v.join(
        p,
        F.expr(
            f"v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + INTERVAL {horizon}"
        ),
        how,
    )


def foreach_batch_merge(
    change_stream: DataFrame,
    target_path: str,
    pk: list[str],
    checkpoint_dir: str,
):
    """Continuous sync: every micro-batch of source rows is diffed against the
    current target parquet and merged in — the streaming form of
    sync_merge_apply, reusing the exact batch operators. At the real-DB
    boundary the same function body issues a JDBC MERGE instead of a parquet
    rewrite."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        target = spark.read.schema(batch_df.schema).parquet(target_path)
        changes = snapshot_diff(batch_df, target, pk=pk)
        merged = merge_apply(target, changes, pk=pk)
        # localCheckpoint materializes before the overwrite (cannot lazily
        # read + overwrite the same files)
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_path)

    return (
        change_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


_COUNTER_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
_COUNTER_STATE = T.StructType([T.StructField("n", T.LongType())])


def running_user_counter(stream: DataFrame) -> DataFrame:
    """Arbitrary stateful op: running per-user event counter via
    applyInPandasWithState (GroupState API — chosen over Spark 4's
    transformWithStateInPandas because the latter's driver worker needs
    protobuf, absent in this container; same per-key state semantics)."""
    import pandas as pd

    def count_fn(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    return stream.groupBy("user_id").applyInPandasWithState(
        count_fn,
        outputStructType=_COUNTER_OUT,
        stateStructType=_COUNTER_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
