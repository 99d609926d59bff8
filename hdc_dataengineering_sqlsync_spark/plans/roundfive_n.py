"""SURVEY.md §2 round-5 additions, batch W.

UTF-8 validation/repair surface and bounded-state streaming dedup
(dropDuplicatesWithinWatermark). Registered after ``roundfive_m``
(plans/__init__.py) so the qids append to the END of the never-checked
rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# -------------- 2.7 scalar functions: UTF-8 validation / repair

# Three deterministic byte classes keyed off nation keys:
#   k%3=0 -> 414243   ('ABC'        — valid, 3 chars)
#   k%3=1 -> C3A94F4B ('éOK'        — valid multibyte, 3 chars)
#   k%3=2 -> 4180FF42 ('A' ?? 'B'   — INVALID: 0x80/0xFF continuation
#            bytes; make_valid_utf8 repairs each bad byte to U+FFFD,
#            4 chars total, probed)
_UTF8_ORACLE = """
WITH cls AS (SELECT n_nationkey % 3 AS c FROM nation)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE c IN (0, 1)) AS BIGINT) AS n_valid,
       CAST(COUNT(*) FILTER (WHERE c = 2) AS BIGINT) AS n_invalid,
       CAST(SUM(CASE WHEN c = 2 THEN 4 ELSE 3 END) AS BIGINT)
         AS repaired_chars_total
FROM cls
"""


@query("fn_utf8_validation", "2.7 scalar functions", _UTF8_ORACLE)
def fn_utf8_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """is_valid_utf8 / make_valid_utf8: byte-level encoding hygiene.

    What actually arrives in 100 TB of scraped/legacy text is not all
    UTF-8: stray continuation bytes, latin-1 leakage, truncated
    multibyte sequences. Spark 4's validation family makes the repair a
    declared step: `is_valid_utf8` gates, `make_valid_utf8` replaces
    each invalid byte with U+FFFD so downstream string ops can't throw.
    Three deterministic byte classes (pure ASCII, valid multibyte,
    corrupted) synthesize from unhex'd patterns; the census pins
    validity counts AND repaired codepoint totals against a closed-form
    oracle (DuckDB VARCHARs are validated at construction — invalid
    bytes cannot exist there, which is itself the point: repair happens
    AT INGESTION or never).

    Scale shape: map-side codegen over the binary column; the repair
    belongs in the landing pass next to `fn_try_to_timestamp_formats`'
    time normalization."""
    n = load(spark, sf_dir, "nation")
    pat = (
        F.when(F.col("n_nationkey") % 3 == 0, "414243")
        .when(F.col("n_nationkey") % 3 == 1, "C3A94F4B")
        .otherwise("4180FF42")
    )
    v = n.select(F.unhex(pat).alias("b"))
    return v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("is_valid_utf8(b)").cast("long")).alias("n_valid"),
        F.sum((~F.expr("is_valid_utf8(b)")).cast("long")).alias("n_invalid"),
        F.sum(F.length(F.expr("make_valid_utf8(cast(b as string))"))).alias(
            "repaired_chars_total"
        ),
    )


# ---------- 2.10 streaming: bounded-state dedup (watermark TTL)

_DDWW_ORACLE = """
SELECT * FROM (VALUES
  ('K',  CAST(2 AS BIGINT)),
  ('K2', CAST(1 AS BIGINT)),
  ('X',  CAST(1 AS BIGINT)),
  ('Y',  CAST(1 AS BIGINT))
) AS t(k, n_emitted)
ORDER BY k
"""


@query("stream_dedup_within_watermark", "2.10 streaming", _DDWW_ORACLE)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark: dedup whose state EXPIRES.

    `stream_dedup_replay`'s exact dedup keeps every key forever —
    unbounded state on an unbounded stream. The 3.5 API bounds it: a
    key's dedup state lives until the watermark passes eventTime +
    delay, after which the SAME key is legitimately emitted again (a
    re-sent business event, not a duplicate). Driver-checked across a
    checkpoint: phase 1 emits K(00:00) and suppresses its 00:30
    duplicate, then advances the watermark to 05:00 (06:00 max − 1h
    delay) which EVICTS K's state (expiry 01:00); phase 2's K(06:30)
    re-emits — while K2 (04:30, expiry 05:30, still live) suppresses
    its 05:15 duplicate. The oracle pins the exact emission multiset:
    K twice, everything else once.

    Scale shape: state size is bounded by keys ACTIVE within one
    watermark delay, not the key universe — the difference between a
    dedup that runs forever and one that OOMs in week two; eviction is
    the same mechanism late-data dropping uses, no extra pass."""
    import datetime as dt
    import tempfile
    import uuid

    from hdc_dataengineering_sqlsync_spark.streaming.jobs import stream_shuffle

    base = tempfile.mkdtemp(prefix=f"hdc_ddww_{uuid.uuid4().hex[:8]}_")
    src, ckpt, out = f"{base}/src", f"{base}/ckpt", f"{base}/out"
    schema = "k string, ts timestamp"
    T = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

    def run_phase(rows: list) -> None:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        dedup = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
            ["k"]
        )
        q = (
            dedup.writeStream.foreachBatch(
                lambda b, e: b.write.mode("append").parquet(out)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    import shutil

    try:
        with stream_shuffle(spark):
            run_phase(
                [("K", T(0)), ("K", T(0, 30)), ("K2", T(4, 30)), ("X", T(6))]
            )
            run_phase([("K", T(6, 30)), ("K2", T(5, 15)), ("Y", T(7))])
        res = (
            spark.read.schema(schema)
            .parquet(out)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n_emitted"))
            .orderBy("k")
        )
        res.collect()  # materialize before the staging tree is removed
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
