"""SURVEY.md §2 execution-surface extensions (split out of the round-4
modules, r5): UDF serialization matrix completions (Arrow Python UDF,
analyze()-time polymorphic UDTF), Spark-4 SQL surface (pipe syntax,
session variables), timeseries tails (seasonal-naive backtest, ACF,
sweep-line interval union), throttled streaming backfill, the Python
stream sink, and the mergeable-HLL proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load



_ARROW_UDF_ORACLE = """
SELECT CAST(n_nationkey % 5 AS INT) AS bucket,
       CAST(sum(CAST(string_split(n_name, '_')[2] AS BIGINT) * 2 + 1) AS BIGINT)
         AS total_score
FROM nation GROUP BY bucket ORDER BY bucket
"""


@query("udf_arrow_python", "2.11 UDF surface", _ARROW_UDF_ORACLE)
def udf_arrow_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED Python scalar UDF (`useArrow=True`, Spark 3.5+/4):
    same row-wise author experience as udf_python_scalar, but arguments
    and results cross the JVM/Python boundary as Arrow batches instead of
    pickled rows — the drop-in serialization upgrade when a true pandas
    vectorization (udf_pandas_scalar) is not feasible. The suffix-parse
    scoring here is deliberately row-wise Python; the oracle recomputes
    it relationally."""
    n = load(spark, sf_dir, "nation")

    @F.udf("long", useArrow=True)
    def score(name: str) -> int:
        return int(name.split("_")[1]) * 2 + 1

    return (
        n.groupBy((F.col("n_nationkey") % 5).cast("int").alias("bucket"))
        .agg(F.sum(score("n_name")).alias("total_score"))
        .orderBy("bucket")
    )


# ----------------------------------------------------------- 2.11 UDF surface

_UDTF_ANALYZE_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents
)
SELECT doc_id, toks[1] AS tok_1, toks[2] AS tok_2, toks[3] AS tok_3,
       CAST(greatest(len(toks) - 3, 0) AS INT) AS n_extra
FROM tok ORDER BY doc_id
"""


@query("udtf_python_analyze", "2.11 UDF surface", _UDTF_ANALYZE_ORACLE)
def udtf_python_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with an ``analyze()``-time DYNAMIC schema (the Spark-4
    polymorphic-UDTF surface, completing the static-schema udtf_python):
    the output width comes from the constant argument at PLAN time —
    ``split_fixed(text, 3)`` resolves to columns tok_1..tok_3 + n_extra
    before any data moves, so Catalyst prunes/projects through it like any
    other relation. Row-at-a-time Python is the declared API surface here
    (as with udf_python_scalar); the vectorized equivalent of this shape
    is udtf_map_in_pandas."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    @udtf
    class SplitFixed:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            ncols = n.value
            fields = [StructField(f"tok_{i + 1}", StringType(), True) for i in range(ncols)]
            fields.append(StructField("n_extra", IntegerType(), True))
            return AnalyzeResult(StructType(fields))

        def eval(self, text: str, n: int):
            import re

            # RE2 \s class [\t\n\f\r ] — the oracle's
            # string_split_regex('\s+') semantics exactly, including
            # boundary empty tokens on padded text (Python .split() drops
            # them and splits unicode; Java \s additionally matches \v —
            # a fixture-absent divergence shared by every F.split text qid)
            toks = re.split(r"[ \t\n\f\r]+", (text or "").lower())
            row = tuple(toks[i] if i < len(toks) else None for i in range(n))
            yield row + (max(0, len(toks) - n),)

    spark.udtf.register("split_fixed", SplitFixed)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.*
        FROM documents d, LATERAL split_fixed(d.text, 3) t
        ORDER BY d.doc_id
        """
    )


# --------------------------------------------- Spark-4 SQL surface

_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("sql_pipe_syntax", "2.4 aggregations", _PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4's `|>` operator chaining — the linear
    query-authoring surface): the revenue rollup written as
    FROM → |> WHERE → |> AGGREGATE → |> ORDER BY. Parsing is the only
    novelty — the pipeline lowers to the SAME Catalyst plan as the
    classic SELECT (pushdown, partial aggregation, codegen all apply),
    which the hash-identical oracle proves."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |> AGGREGATE count(*) AS n,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n, revenue
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


_SQLVAR_ORACLE = """
SELECT o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
WHERE o_totalprice >= 150000 AND o_orderdate < DATE '1996-07-01'
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("sql_session_variables", "2.2 projection/filter", _SQLVAR_ORACLE)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables + IDENTIFIER() (Spark 4): thresholds arrive
    via DECLARE/SET VARIABLE and the table name via IDENTIFIER(var) — the
    parameterized-query surface that replaces string-splicing in sync job
    templates (injection-safe, plan-cache friendly: the variable is a
    literal at plan time, so pushdown still reaches the scan). The oracle
    inlines the same constants."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql("DECLARE OR REPLACE VARIABLE min_total DOUBLE DEFAULT 0.0")
    spark.sql("DECLARE OR REPLACE VARIABLE cutoff DATE DEFAULT DATE '1999-01-01'")
    spark.sql("DECLARE OR REPLACE VARIABLE tbl STRING DEFAULT 'orders_v'")
    spark.sql("SET VARIABLE min_total = 150000")
    spark.sql("SET VARIABLE cutoff = DATE '1996-07-01'")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM IDENTIFIER(tbl)
        WHERE o_totalprice >= min_total AND o_orderdate < cutoff
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


_SEASONAL_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n
  FROM events GROUP BY d
),
scored AS (
  SELECT a.d, a.n AS actual, f.n AS forecast
  FROM daily a JOIN daily f ON f.d = a.d - INTERVAL 7 DAY
  WHERE a.d >= DATE '2024-01-22'
)
SELECT count(*) AS n_days,
       CAST(sum(abs(actual - forecast)) AS BIGINT) AS total_abs_err,
       round(CAST(sum(abs(actual - forecast)) AS DOUBLE) / count(*), 4) AS mae,
       CAST(max(abs(actual - forecast)) AS BIGINT) AS max_abs_err
FROM scored
"""


@query("ts_seasonal_naive_forecast", "2.10 streaming", _SEASONAL_ORACLE)
def ts_seasonal_naive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every forecasting
    pipeline must beat: predict each day's event count with the count from
    7 days earlier, score MAE/max-error over the holdout tail (days from
    Jan 22). Integer counts make every error metric exact. Shape: one
    keyed daily rollup (map-side combinable), then a self-equi-join on the
    shifted date — a calendar join, not a window, so the series can shard
    by date range at 100 TB."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    f = daily.select(F.date_add("d", 7).alias("fd"), F.col("n").alias("forecast"))
    scored = (
        daily.join(f, daily.d == f.fd)
        .where(F.col("d") >= F.lit("2024-01-22").cast("date"))
        .select(F.col("n").alias("actual"), "forecast")
    )
    err = F.abs(F.col("actual") - F.col("forecast"))
    return scored.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(err).alias("total_abs_err"),
        F.round(F.sum(err).cast("double") / F.count(F.lit(1)), 4).alias("mae"),
        F.max(err).alias("max_abs_err"),
    )


# ------------------------------------------------- 2.10 timeseries ACF

_ACF_ORACLE = r"""
WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
           FROM events),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (SELECT t.event_type, g.h
         FROM types t, b, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS g(h)),
counts AS (SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS x
           FROM events GROUP BY 1, 2),
x AS (SELECT g.event_type, g.h, coalesce(c.x, 0) AS x
      FROM grid g LEFT JOIN counts c ON c.event_type = g.event_type AND c.h = g.h),
c AS (SELECT event_type, h,
             count(*) OVER (PARTITION BY event_type) * x
               - sum(x) OVER (PARTITION BY event_type) AS cdev
      FROM x),
l AS (SELECT event_type, cdev,
             lead(cdev, 1) OVER (PARTITION BY event_type ORDER BY h) AS c1,
             lead(cdev, 2) OVER (PARTITION BY event_type ORDER BY h) AS c2,
             lead(cdev, 3) OVER (PARTITION BY event_type ORDER BY h) AS c3
      FROM c),
a AS (SELECT event_type,
             sum(cdev * cdev) AS den,
             sum(cdev * c1) AS n1, sum(cdev * c2) AS n2, sum(cdev * c3) AS n3
      FROM l GROUP BY event_type)
SELECT event_type, lag,
       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4) AS acf
FROM (
  SELECT event_type, 1 AS lag, n1 AS num, den FROM a
  UNION ALL SELECT event_type, 2, n2, den FROM a
  UNION ALL SELECT event_type, 3, n3, den FROM a
)
ORDER BY event_type, lag
"""


@query("ts_acf_lags", "2.10 streaming", _ACF_ORACLE)
def ts_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series autocorrelation at lags 1-3 over the gap-filled hourly
    event grid — the seasonality detector that decides ts_seasonal_naive's
    period. Exact by construction: with integer counts, the centered
    deviation scales to ``n·x_t − S`` (pure int64), so numerator and
    denominator are order-free integer sums and ONE final IEEE division per
    lag is the only float op. Scale: grid construction is
    sequence-explode (no shuffle), counts one keyed agg, and the lag
    windows partition per series — series count × grid length rows, window
    parallelism = #series (high-cardinality in production; the events
    fixture has 5)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    )
    counts = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("x"))
    bounds = ev.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"))
    )
    x = grid.join(counts, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("x", F.lit(0)).alias("x")
    )
    from pyspark.sql import Window

    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("h")
    c = x.select(
        "event_type",
        "h",
        (F.count(F.lit(1)).over(wp) * F.col("x") - F.sum("x").over(wp)).alias("cdev"),
    )
    lagged = c.select(
        "event_type",
        "cdev",
        F.lead("cdev", 1).over(wo).alias("c1"),
        F.lead("cdev", 2).over(wo).alias("c2"),
        F.lead("cdev", 3).over(wo).alias("c3"),
    )
    a = lagged.groupBy("event_type").agg(
        F.sum(F.col("cdev") * F.col("cdev")).alias("den"),
        F.sum(F.col("cdev") * F.col("c1")).alias("n1"),
        F.sum(F.col("cdev") * F.col("c2")).alias("n2"),
        F.sum(F.col("cdev") * F.col("c3")).alias("n3"),
    )
    return (
        a.selectExpr(
            "event_type",
            "stack(3, 1, round(cast(n1 as double) / cast(den as double), 4), "
            "2, round(cast(n2 as double) / cast(den as double), 4), "
            "3, round(cast(n3 as double) / cast(den as double), 4)) as (lag, acf)",
        )
        .orderBy("event_type", "lag")
    )


# ------------------------------------------ 2.10 sweep-line interval union

_INTERVAL_UNION_ORACLE = """
WITH pts AS (
  SELECT user_id, epoch_us(ts) AS t, 1 AS delta FROM events
  UNION ALL
  SELECT user_id, epoch_us(ts) + 300000000 AS t, -1 AS delta FROM events
),
sweep AS (
  SELECT user_id, t, delta,
         sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         lead(t) OVER (PARTITION BY user_id ORDER BY t, delta DESC) AS t_next
  FROM pts
)
SELECT user_id,
       CAST(sum(CASE WHEN cum > 0 THEN t_next - t ELSE 0 END) AS BIGINT) AS union_micros,
       CAST(count(*) / 2 AS BIGINT) AS n_intervals
FROM sweep GROUP BY user_id ORDER BY user_id
"""


@query("ts_interval_union_length", "2.10 streaming", _INTERVAL_UNION_ORACLE)
def ts_interval_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval union: each event opens a 5-minute activity
    interval; per user, the MERGED (overlap-collapsed) covered time — the
    primitive behind billing meters, SLA uptime, and session coverage.
    Classic sweep: ±1 endpoint deltas, running sum, covered time =
    Σ(t_next − t) while the counter is positive; +1 sorts before −1 at
    equal timestamps so touching intervals merge. All integer micros —
    exact. The window partitions PER USER (parallelism = #users); no
    global order anywhere."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("user_id", F.unix_micros("ts").alias("t0"))
    pts = ev.select("user_id", F.col("t0").alias("t"), F.lit(1).alias("delta")).unionAll(
        ev.select("user_id", (F.col("t0") + 300000000).alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("t"), F.col("delta").desc())
    sweep = pts.select(
        "user_id",
        "t",
        F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.lead("t").over(w).alias("t_next"),
    )
    return (
        sweep.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("cum") > 0, F.col("t_next") - F.col("t")).otherwise(F.lit(0))
            ).alias("union_micros"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
        )
        .orderBy("user_id")
    )


# ------------------------------------------------------------ 2.10 streaming

_BACKFILL_ORACLE = """
SELECT CAST(row_number() OVER (ORDER BY n DESC) AS INT) AS batch_rank,
       n AS n_rows
FROM (SELECT count(*) AS n FROM events GROUP BY user_id % 4)
ORDER BY batch_rank
"""


@query("stream_backfill_throttled", "2.10 streaming", _BACKFILL_ORACLE)
def stream_backfill_throttled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throttled backfill: a historical reload drains through the SAME
    streaming pipeline as live data, rate-limited by
    ``maxFilesPerTrigger=1`` so each micro-batch ingests exactly one file —
    the knob that keeps a 100 TB backfill from flooding state stores and
    sinks sized for the live rate. Four files (events sharded by
    user_id % 4) produce four micro-batches; the per-batch row counts,
    rank-ordered, must equal the batch GROUP BY census — proving no file
    was merged, split, or double-read across triggers. foreachBatch
    observes each micro-batch on the driver (bounded: one count per
    batch), exactly how a production backfill meters progress."""
    import hashlib
    import os
    import shutil
    import tempfile

    # pid-keyed (the per-process embedded-Derby rule): a concurrent
    # process running this qid at the same sf_dir must not rmtree a live
    # stream's source/checkpoint; per-process reuse stays bounded
    tag = hashlib.md5(f"backfill:{sf_dir}".encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"hdc_backfill_{tag}_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    src = f"{base}/src"
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    for g in range(4):
        ev.where(F.col("user_id") % 4 == g).coalesce(1).write.mode("append").parquet(src)

    batch_counts: list[int] = []

    def observe(batch_df: DataFrame, epoch_id: int) -> None:
        n = batch_df.count()
        if n > 0:
            batch_counts.append(n)

    stream = spark.readStream.schema("event_id long, user_id long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(observe)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ranked = [(i + 1, n) for i, n in enumerate(sorted(batch_counts, reverse=True))]
    return spark.createDataFrame(ranked, "batch_rank int, n_rows bigint").orderBy("batch_rank")


# ------------------------------------------------- 2.1 Python stream sink

_PYDS_STREAM_SINK_ORACLE = """
SELECT CAST(user_id % 10 AS BIGINT) AS bucket, count(*) AS n,
       round(sum(value), 2) AS total
FROM events GROUP BY bucket ORDER BY bucket
"""


@query("pyds_stream_sink", "2.1 scans", _PYDS_STREAM_SINK_ORACLE)
def pyds_stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE streaming write through a custom Python DataSource STREAM
    writer (sources/pydatasource.py::JsonLinesStreamWriter) — the final
    cell of the Python DataSource matrix (batch read / pushdown read /
    stream read / batch write / stream write): the events stream drains
    epoch-by-epoch through per-batch two-phase commit (executor-staged
    files → driver rename to DETERMINISTIC epoch-keyed names, so a
    replayed epoch overwrites instead of duplicating — effectively-once).
    The committed files read back and must hash-match the batch rollup
    straight from the source table: a lost epoch, torn partition file, or
    double-committed replay breaks the match."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from hdc_dataengineering_sqlsync_spark.sources.pydatasource import (
        JsonLinesSinkDataSource,
    )
    from hdc_dataengineering_sqlsync_spark.streaming.jobs import (
        events_path,
        read_events_stream,
    )

    spark.dataSource.register(JsonLinesSinkDataSource)
    # pid-keyed like the backfill dir: a concurrent process running this
    # qid at the same sf_dir must not rmtree a live stream's committed
    # epochs/staging or read back its files (the writer docstring requires
    # distinct tags for path sharers)
    tag = hashlib.md5(f"pystreamsink:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"hdc_pystreamsink_{tag}_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    ckpt = tempfile.mkdtemp(prefix=f"hdc_pystreamsink_ckpt_{uuid.uuid4().hex[:8]}_")
    stream = read_events_stream(spark, events_path(sf_dir)).select(
        "event_id", "user_id", "value"
    )
    q = (
        stream.writeStream.format("jsonl_sink")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.schema("event_id long, user_id long, value double").json(
        path, pathGlobFilter="epoch-*.jsonl"
    )
    return (
        back.groupBy((F.col("user_id") % 10).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("bucket")
    )


# -------------------------------------------------------- 2.4 aggregations


@query("agg_hll_partial_merge", "2.4 aggregations", None)
def agg_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch proof for distributed distinct counting: per-lang
    Datasketches HLL sketches of the token vocabulary (hll_sketch_agg)
    union into ONE corpus sketch (hll_union_agg) whose estimate must
    equal the single-pass whole-corpus sketch's — the algebraic property
    that lets a 1000-executor cluster count distincts with a constant-size
    shuffle (sketch bytes, not values) and lets per-partition sketches be
    maintained incrementally and merged on demand. Output pins the
    merge-consistency bit plus both estimates alongside the exact count.
    Rows-only: sketch estimates are engine-specific (DuckDB's HLL differs),
    like agg_approx_distinct; the ±5%-of-exact bound and merge determinism
    are unit-tested (tests/test_roundfour.py)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
    per_lang = tok.groupBy("lang").agg(F.hll_sketch_agg("token").alias("sk"))
    merged = per_lang.agg(
        F.count(F.lit(1)).alias("n_langs"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
    )
    whole = tok.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("token")).alias("global_est"),
        F.countDistinct("token").alias("exact_distinct"),
    )
    return (
        merged.crossJoin(F.broadcast(whole))
        .select(
            "n_langs",
            "exact_distinct",
            "global_est",
            "merged_est",
            (F.col("merged_est") == F.col("global_est")).alias("merge_consistent"),
        )
    )


_BINFILES_ORACLE = """
WITH f AS (
  SELECT n_nationkey,
         repeat(n_name || '|', 1 + n_nationkey % 4) AS content
  FROM nation
)
SELECT count(*) AS n_files,
       CAST(sum(length(content)) AS BIGINT) AS total_bytes,
       count(DISTINCT md5(content)) AS n_distinct_payloads
FROM f
"""


@query("scan_binary_files", "2.1 scans", _BINFILES_ORACLE)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `binaryFile` source — Spark's whole-file ingestion path for blob
    corpora (images, audio, models): each staged file becomes one row of
    (path, modificationTime, length, content). Closed-form per-nation
    payloads are staged as real files, read back via binaryFile, and
    reduced to count / byte-total / distinct-payload-md5 — path and mtime
    (non-deterministic) never reach the output. At 100 TB the caveat is
    the point: one row per FILE, no splitting — binaryFile is the landing
    read that feeds a parquet conversion (cf. multimodal_* which process
    blob COLUMNS after exactly that conversion)."""
    import hashlib
    import os
    import tempfile

    n = load(spark, sf_dir, "nation")
    rows = n.select(
        "n_nationkey",
        F.repeat(F.concat(F.col("n_name"), F.lit("|")), (1 + F.col("n_nationkey") % 4).cast("int")).alias(
            "content"
        ),
    ).collect()  # 25 rows: driver-side staging of the FILE fixture only
    tag = hashlib.md5(f"binfiles:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), f"hdc_binfiles_{tag}")
    os.makedirs(out, exist_ok=True)
    for r in rows:
        with open(os.path.join(out, f"blob_{r.n_nationkey}.bin"), "wb") as f:
            f.write(r.content.encode())
    df = spark.read.format("binaryFile").load(out)
    return df.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.countDistinct(F.md5("content")).alias("n_distinct_payloads"),
    )
