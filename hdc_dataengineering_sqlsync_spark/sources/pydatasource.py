"""Spark 4 Python DataSource API — a custom batch source with partition
planning and filter pushdown (SURVEY.md §2.1 sources surface).

This is the extensibility story for transports Spark has no built-in
connector for (a bespoke REST/export API, a proprietary dump format): a
pure-Python `DataSource` whose reader plans N independent `InputPartition`s
(so a 1000-executor cluster reads in parallel — no driver bottleneck) and
accepts pushed filters via ``pushFilters`` (so selective reads skip
generation/transfer instead of filtering after the fact, the same contract
DSv2 gives JVM sources).

The concrete source here generates deterministic synthetic events from a
closed form — which makes it *oracle-verifiable*: a DuckDB range() query
recomputes every row without running the source. Swap `read` for HTTP/file
calls and the partition/pushdown mechanics carry over unchanged.

Closed form (event_id = i, striped over partitions):
  bucket = i % 10
  value  = ((i * 37) % 1000) / 10.0
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SOURCE_NAME = "synthetic_events"


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)`` batch
    source. Options: ``rows`` (total row count, default 1000),
    ``partitions`` (read parallelism, default 8)."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return "event_id bigint, bucket int, value double"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.bucket_eq: int | None = None  # set by pushFilters

    def pushFilters(self, filters: list[Filter]):
        """Accept ``bucket = k`` equality pushdown; everything else is
        returned for Spark to evaluate post-scan. A pushed bucket filter
        skips row *generation* (for a network transport: skips transfer)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("bucket",) and self.bucket_eq is None:
                self.bucket_eq = int(f.value)
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        # rows striped by partition id -> equal-size independent slices; no
        # shared state, so executors read concurrently without coordination.
        for i in range(partition.value, self.n_rows, self.n_parts):
            bucket = i % 10
            if self.bucket_eq is not None and bucket != self.bucket_eq:
                continue
            yield (i, bucket, ((i * 37) % 1000) / 10.0)


def register(spark) -> None:
    """Idempotently register the source with this session."""
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Bounded closed-form event stream. Offsets are ``{"i": next_row}``;
    each microbatch serves one chunk and the reader reports caught-up (same
    offset, empty batch) once ``rows`` have been served, so
    ``processAllAvailable`` terminates deterministically."""

    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.chunk = int(options.get("chunk", 250))

    def initialOffset(self) -> dict:
        return {"i": 0}

    @staticmethod
    def _rows(start: int, end: int) -> list:
        return [(i, i % 10, ((i * 37) % 1000) / 10.0) for i in range(start, end)]

    def read(self, start: dict):
        # contract (pyspark datasource_internal): return a COPYABLE iterator
        # (list_iterator works, a generator does not — the prefetch cache
        # copy.copy()s it), and when caught up return the SAME offset with an
        # immediately-exhausted iterator.
        i = int(start["i"])
        if i >= self.n_rows:
            return iter(()), start  # caught up: no data, offset unchanged
        end = min(i + self.chunk, self.n_rows)
        return iter(self._rows(i, end)), {"i": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery: offsets fully define the data
        return iter(self._rows(int(start["i"]), int(end["i"])))


# ---------------------------------------------------------------------------
# Python DataSource WRITER — the sink half of the extensibility surface.


SINK_NAME = "jsonl_sink"


class JsonLinesSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()`` — a
    pure-Python batch SINK with the DSv2 two-phase commit protocol:

      1. each task streams its partition to a STAGED file
         (``_staged_<uuid>.jsonl``) and returns the staged name in its
         commit message;
      2. the driver's ``commit`` renames every staged file into place and
         writes ``_SUCCESS`` — so readers never observe a torn write, and
         a failed/speculated task's orphan staging is ignored (``abort``
         removes it).

    This is the transport shape for bespoke export targets (an ingest API,
    a proprietary loader): swap the file write for the API call and the
    task-parallel + atomic-commit mechanics carry over. Parallelism = input
    partitions; no driver bottleneck.
    """

    @classmethod
    def name(cls) -> str:
        return SINK_NAME

    def writer(self, schema, overwrite: bool) -> "JsonLinesWriter":
        return JsonLinesWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonLinesStreamWriter":
        return JsonLinesStreamWriter(self.options, schema)


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool) -> None:
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires .option('path', ...)")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite
        # per-JOB tag, minted on the driver and shipped to every task via
        # writer pickling: commit() may reap only ITS OWN job's orphaned
        # staged files — a second job appending to the same path
        # concurrently stages under a different tag and must not be touched
        self.job_tag = uuid.uuid4().hex[:12]

    def write(self, iterator) -> "WriterCommitMessage":
        # runs on executors: stream the partition to a staged file
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        staged = f"_staged_{self.job_tag}_{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, staged), "w") as f:
            for row in iterator:
                rec = {k: row[k] for k in self.fields}
                f.write(json.dumps(rec, default=str) + "\n")
                n += 1
        return JsonLinesCommit(staged=staged, n_rows=n)

    def commit(self, messages) -> None:
        # driver: atomically promote every staged file, then mark success.
        # Final names keep the staged uuid so an APPEND onto a previously
        # committed directory can never clobber or interleave with existing
        # part files (an index-based rename would).
        import os

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("part-") and f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        for m in messages:
            os.replace(
                os.path.join(self.path, m.staged),
                os.path.join(self.path, f"part-{m.staged[len('_staged_'):]}"),
            )
        # THIS job's staged files not in `messages` are orphans from
        # retried/speculated tasks whose commit message was never collected
        # — readers already ignore underscore-prefixed files, but reap them
        # so appends don't accumulate dead bytes forever. Scoped to this
        # job's tag: another job's in-flight staged files on the same path
        # must survive (r4 review finding — an unscoped reap broke the
        # uuid-keyed concurrent-append safety this class advertises).
        own = f"_staged_{self.job_tag}_"
        for f in os.listdir(self.path):
            if f.startswith(own) and f.endswith(".jsonl"):
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.staged))
                except OSError:
                    pass


class JsonLinesCommit(WriterCommitMessage):
    def __init__(self, staged: str, n_rows: int) -> None:
        self.staged = staged
        self.n_rows = n_rows


class JsonLinesStreamWriter(DataSourceStreamWriter):
    """Streaming writer half of the jsonl sink (DataSourceStreamWriter):
    per micro-batch, executors stage partition files and the driver's
    ``commit(messages, batchId)`` promotes them to DETERMINISTIC final
    names ``epoch-<stream>-<batchId>-<i>.jsonl`` — and FIRST removes any
    leftover files of that same ``(stream, batchId)`` namespace, so a
    replayed epoch (checkpoint said uncommitted, engine re-runs it) fully
    REPLACES the dead attempt's output even when the replay plans fewer
    partitions than the original (an index-only overwrite would leave the
    higher-index files behind and double-count): at-least-once delivery +
    epoch-scoped replace = effectively-once output, the same contract
    foreachBatch users build by hand.

    ``stream`` is the STABLE stream identity (``.option("stream_tag",
    ...)``, default ``main``) — stable across restarts, which is what
    makes replay-overwrite AND crash-orphan reaping work: each commit
    reaps this stream's ``_stream_staged_<tag>_*`` leftovers (a restarted
    query reuses the tag, so a crashed attempt's staging is collected),
    while a concurrent query on the same path under a DIFFERENT tag keeps
    both its staging and its committed epochs untouched. Two queries
    sharing a path must use distinct tags (as they must use distinct
    checkpoints)."""

    def __init__(self, options, schema) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires .option('path', ...)")
        self.fields = [f.name for f in schema.fields]
        # STABLE across restarts (unlike a per-writer uuid): epoch replace
        # and orphan reaping key on it — see class docstring
        self.stream_tag = options.get("stream_tag", "main")

    def write(self, iterator) -> "WriterCommitMessage":
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        staged = f"_stream_staged_{self.stream_tag}_{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, staged), "w") as f:
            for row in iterator:
                rec = {k: row[k] for k in self.fields}
                f.write(json.dumps(rec, default=str) + "\n")
                n += 1
        return JsonLinesCommit(staged=staged, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        import os

        # replace, not overwrite: a dead attempt of THIS (stream, epoch)
        # may have committed more partition files than this replay plans.
        # Scoped to the stream tag so a concurrent query's committed
        # epochs on the same path are never touched.
        prefix = f"epoch-{self.stream_tag}-{batchId:08d}-"
        for f in os.listdir(self.path):
            if f.startswith(prefix) and f.endswith(".jsonl"):
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass
        for i, m in enumerate(messages):
            if m is None:
                continue
            os.replace(
                os.path.join(self.path, m.staged),
                os.path.join(self.path, f"{prefix}{i:05d}.jsonl"),
            )
        # reap THIS stream's staged leftovers — the tag is stable across
        # restarts, so a crashed attempt's staging is collected here too
        own = f"_stream_staged_{self.stream_tag}_"
        for f in os.listdir(self.path):
            if f.startswith(own) and f.endswith(".jsonl"):
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.staged))
                except OSError:
                    pass


ARROW_SOURCE_NAME = "synthetic_arrow"


class SyntheticArrowDataSource(DataSource):
    """Arrow-BATCH Python data source: ``read()`` yields
    ``pyarrow.RecordBatch`` objects instead of per-row tuples, so rows
    cross the Python/JVM boundary as columnar Arrow buffers (one
    serialization per batch, not per row) — the fast path for pure-Python
    connectors that can produce columnar data natively.

    Options: ``rows`` (total, default 1000), ``partitions`` (default 8).
    Values are a closed form over the row index, all-integer, so the t2
    oracle recomputes them from range() without running the source."""

    @classmethod
    def name(cls) -> str:
        return ARROW_SOURCE_NAME

    def schema(self) -> str:
        return "row_id bigint, bucket int, cents bigint"

    def reader(self, schema) -> "SyntheticArrowReader":
        return SyntheticArrowReader(self.options)


class SyntheticArrowReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        # fail fast with a readable message on the driver — partitions < 1
        # would otherwise surface as an opaque empty-partition-list failure
        # Spark-side, and negative rows would silently yield no data
        if self.n_rows < 0:
            raise ValueError(f"rows must be >= 0, got {self.n_rows}")
        if self.n_parts < 1:
            raise ValueError(f"partitions must be >= 1, got {self.n_parts}")

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        import pyarrow as pa

        # contiguous range slices -> one columnar batch per partition;
        # vectorized construction, no per-row Python objects at all.
        per = -(-self.n_rows // self.n_parts)  # ceil
        lo = partition.value * per
        hi = min(lo + per, self.n_rows)
        if lo >= hi:
            return
        ids = list(range(lo, hi))
        yield pa.record_batch(
            {
                "row_id": pa.array(ids, pa.int64()),
                "bucket": pa.array([i % 8 for i in ids], pa.int32()),
                "cents": pa.array([(i * 73) % 10000 for i in ids], pa.int64()),
            }
        )


def register_arrow(spark) -> None:
    """Idempotently register the Arrow-batch source with this session."""
    spark.dataSource.register(SyntheticArrowDataSource)
