"""SURVEY.md §2 round-5 additions, batch V.

Multi-format timestamp parsing waterfall, the LIMIT-0 schema probe, and
SUM(DISTINCT). Registered after ``roundfive_l`` (plans/__init__.py) so
the qids append to the END of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import SCHEMAS, load

# ---------- 2.7 scalar functions: timestamp-format parsing waterfall

# Deterministic mixed-format feed synthesized from customer keys with
# engine-identical string assembly (lpad/concat only).  k%3 selects the
# format; k%7==0 corrupts the payload.
_TS_PARTS_DUCK = """
  SELECT c_custkey AS k,
         lpad(CAST(c_custkey % 12 + 1 AS VARCHAR), 2, '0') AS mo,
         lpad(CAST(c_custkey % 28 + 1 AS VARCHAR), 2, '0') AS dd,
         lpad(CAST(c_custkey % 24 AS VARCHAR), 2, '0') AS hh,
         lpad(CAST(c_custkey % 60 AS VARCHAR), 2, '0') AS mi
  FROM customer
"""

_TRY_TS_ORACLE = f"""
WITH parts AS ({_TS_PARTS_DUCK}),
feed AS (
  SELECT k,
         CASE WHEN k % 7 = 0 THEN 'bad-' || CAST(k AS VARCHAR)
              WHEN k % 3 = 0 THEN
                '2024-' || mo || '-' || dd || ' ' || hh || ':' || mi || ':00'
              WHEN k % 3 = 1 THEN
                dd || '/' || mo || '/2024 ' || hh || ':' || mi
              ELSE '2024' || mo || dd || 'T' || hh || mi || '00'
         END AS raw
  FROM parts
),
parsed AS (
  SELECT k, COALESCE(
    try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
    try_strptime(raw, '%d/%m/%Y %H:%M'),
    try_strptime(raw, '%Y%m%dT%H%M%S')
  ) AS ts
  FROM feed
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(ts) AS BIGINT) AS n_parsed,
       CAST(COUNT(*) - COUNT(ts) AS BIGINT) AS n_failed,
       CAST(SUM(epoch_us(ts) // 1000000) AS BIGINT) AS epoch_s_total
FROM parsed
"""


@query("fn_try_to_timestamp_formats", "2.7 scalar functions", _TRY_TS_ORACLE)
def fn_try_to_timestamp_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format timestamp parsing waterfall with error-safe fallback.

    The messy-feed reality: one string column carries THREE timestamp
    dialects (ISO, day-first European, compact ISO-basic) plus garbage.
    `coalesce(try_to_timestamp(raw, f1), try_to_timestamp(raw, f2), ...)`
    tries each format in precedence order and yields NULL — never an
    exception — when nothing matches (`fn_to_number_format`'s contract,
    for time). The census pins parse coverage AND the exact epoch sum,
    so a format that silently mis-binds fields (dd/MM vs MM/dd!) cannot
    pass. (The sum rides epoch SECONDS: micros × row-count overflows
    int64 at sf0.1 already — the ANSI overflow error caught it live.)

    Scale shape: the waterfall is map-side codegen; short-circuit
    evaluation means the common (first) format pays one parse. At
    100 TB, normalize ONCE at the landing pass and store timestamps
    typed — this operator IS that pass."""
    parts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.lpad((F.col("c_custkey") % 12 + 1).cast("string"), 2, "0").alias("mo"),
        F.lpad((F.col("c_custkey") % 28 + 1).cast("string"), 2, "0").alias("dd"),
        F.lpad((F.col("c_custkey") % 24).cast("string"), 2, "0").alias("hh"),
        F.lpad((F.col("c_custkey") % 60).cast("string"), 2, "0").alias("mi"),
    )
    feed = parts.select(
        "k",
        F.when(F.col("k") % 7 == 0, F.concat(F.lit("bad-"), F.col("k").cast("string")))
        .when(
            F.col("k") % 3 == 0,
            F.concat(
                F.lit("2024-"), F.col("mo"), F.lit("-"), F.col("dd"),
                F.lit(" "), F.col("hh"), F.lit(":"), F.col("mi"), F.lit(":00"),
            ),
        )
        .when(
            F.col("k") % 3 == 1,
            F.concat(
                F.col("dd"), F.lit("/"), F.col("mo"), F.lit("/2024 "),
                F.col("hh"), F.lit(":"), F.col("mi"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("2024"), F.col("mo"), F.col("dd"), F.lit("T"),
                F.col("hh"), F.col("mi"), F.lit("00"),
            )
        )
        .alias("raw"),
    )
    parsed = feed.select(
        F.coalesce(
            F.expr("try_to_timestamp(raw, 'yyyy-MM-dd HH:mm:ss')"),
            F.expr("try_to_timestamp(raw, 'dd/MM/yyyy HH:mm')"),
            F.expr("try_to_timestamp(raw, \"yyyyMMdd'T'HHmmss\")"),
        ).alias("ts")
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("ts").alias("n_parsed"),
        (F.count(F.lit(1)) - F.count("ts")).alias("n_failed"),
        F.sum(F.expr("unix_micros(ts) div 1000000")).alias("epoch_s_total"),
    )


# ---------------- 2.1 scans: the LIMIT-0 schema probe

_SCHEMA_PROBE_ORACLE = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT),  'l_orderkey',      'bigint'),
  (CAST(2 AS BIGINT),  'l_partkey',       'bigint'),
  (CAST(3 AS BIGINT),  'l_suppkey',       'bigint'),
  (CAST(4 AS BIGINT),  'l_linenumber',    'int'),
  (CAST(5 AS BIGINT),  'l_quantity',      'double'),
  (CAST(6 AS BIGINT),  'l_extendedprice', 'double'),
  (CAST(7 AS BIGINT),  'l_discount',      'double'),
  (CAST(8 AS BIGINT),  'l_tax',           'double'),
  (CAST(9 AS BIGINT),  'l_returnflag',    'string'),
  (CAST(10 AS BIGINT), 'l_linestatus',    'string'),
  (CAST(11 AS BIGINT), 'l_shipdate',      'timestamp')
) AS t(ordinal, col_name, dtype)
ORDER BY ordinal
"""


@query("scan_schema_probe_limit0", "2.1 scans", _SCHEMA_PROBE_ORACLE)
def scan_schema_probe_limit0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LIMIT-0 schema probe: metadata discovery with ZERO data read.

    How a sync engine introspects a source it is about to replicate:
    `SELECT * FROM t WHERE 1=0` (here `.limit(0)`) type-checks the full
    projection and returns the resolved schema without reading a row —
    Catalyst folds the probe to an EMPTY LocalRelation, so not even a
    file footer is opened at execution (plan-asserted in the unit
    test). The probed (ordinal, name, type) triples become the output,
    pinned against the declared registry schema — a drifted source
    column would hash-fail here before any copy job runs.

    Scale shape: O(1) regardless of table size — the entire point. The
    schema-diff follow-ups are `sync_schema_drift_report` /
    `sync_schema_evolution_apply`."""
    probe = load(spark, sf_dir, "lineitem").limit(0)
    assert probe.count() == 0  # executes the folded empty relation
    rows = [
        (i + 1, f.name, f.dataType.simpleString())
        for i, f in enumerate(probe.schema.fields)
    ]
    out_schema = T.StructType(
        [
            T.StructField("ordinal", T.LongType()),
            T.StructField("col_name", T.StringType()),
            T.StructField("dtype", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, out_schema).orderBy("ordinal")


# ---------------- 2.4 aggregations: SUM(DISTINCT)

_SUM_DISTINCT_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT)
         AS qty_distinct_sum,
       CAST(COUNT(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT)
         AS qty_distinct_n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("agg_sum_distinct", "2.4 aggregations", _SUM_DISTINCT_ORACLE)
def agg_sum_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(DISTINCT): aggregation over the de-duplicated value set.

    The SQL surface that looks like SUM but plans like COUNT(DISTINCT):
    the engine de-duplicates (group, value) pairs BEFORE summing. With
    every distinct aggregate sharing ONE child (qty), Spark rewrites to
    the THREE-level aggregate — partial on (group, value), merge, final
    — with no Expand (plan-asserted; Expand appears only when distinct
    children differ, the shape that silently multiplies shuffle volume
    when mixed distincts are added casually to a report). Worth a
    declared qid precisely because it LOOKS as cheap as SUM.

    Scale shape: (group, value)-keyed two-phase agg; value cardinality
    (50 quantities) bounds the re-aggregation."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum_distinct(q).alias("qty_distinct_sum"),
            F.count_distinct(q).alias("qty_distinct_n"),
            F.sum(q).alias("qty_total"),
        )
        .orderBy("l_returnflag")
    )
