"""SURVEY.md §2 round-9 batch V: UDTF TABLE arguments, VALUES inline
tables, posexplode ordinality.

  udtf_table_partition_by   Python UDTF over TABLE(...) PARTITION BY/ORDER BY
  sql_values_inline_table   VALUES-derived dimension joined to real tables
  fn_posexplode_ordinality  0-based position contract + index arithmetic

Note: transformWithStateInPandas (the other Spark-4.x stateful surface)
was probed and is NOT runnable in this environment — its driver worker
needs google.protobuf, absent from the container — so arbitrary stateful
streaming stays covered by applyInPandasWithState
(stream_stateful_counter_replay).

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.11 UDF surface: UDTF consuming TABLE(...) PARTITION BY/ORDER BY

_UDTF_TABLE_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events WHERE user_id % 7 = 0
),
g AS (
  SELECT user_id,
         es - lag(es) OVER (PARTITION BY user_id ORDER BY es) AS gap
  FROM ev
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(1 + SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions,
       CAST(COALESCE(max(gap), 0) AS BIGINT) AS max_gap_s
FROM g GROUP BY user_id ORDER BY user_id
"""


@query("udtf_table_partition_by", "2.11 UDF surface", _UDTF_TABLE_ORACLE)
def udtf_table_partition_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF over a TABLE argument with PARTITION BY … ORDER BY —
    the Spark-4 surface that turns a UDTF into a per-group SEQUENTIAL
    processor: the engine shuffles by the partition key, feeds eval()
    the group's rows in order, and calls terminate() once per partition
    (instance state resets between partitions — that contract is what
    this qid pins). The processor is a session counter (30-min gap)
    whose per-user output must match the window-function oracle exactly,
    proving row order, partition isolation, and terminate-time emission.

    Scale shape: one hash shuffle on the partition key, then
    partition-parallel Python with O(1) state per group — the same
    shape as applyInPandas but row-at-a-time (API-surface qid, not a
    hot-path pattern; see udfs.py rule)."""
    from pyspark.sql.functions import udtf

    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id") % 7 == 0)
        .select(
            "user_id",
            F.expr(
                "CAST(floor(unix_micros(CAST(ts AS TIMESTAMP)) / 1000000)"
                " AS BIGINT)"
            ).alias("es"),
        )
    )
    view = "udtf_tbl_ev_v"
    ev.createOrReplaceTempView(view)

    @udtf(
        returnType="user_id bigint, n_events bigint, n_sessions bigint,"
        " max_gap_s bigint"
    )
    class SessionStats:
        def __init__(self) -> None:
            self.uid = None
            self.n = 0
            self.sessions = 0
            self.max_gap = 0
            self.prev = None

        def eval(self, row) -> None:
            self.uid = row["user_id"]
            self.n += 1
            if self.prev is None:
                self.sessions = 1
            else:
                gap = row["es"] - self.prev
                if gap > self.max_gap:
                    self.max_gap = gap
                if gap > 1800:
                    self.sessions += 1
            self.prev = row["es"]

        def terminate(self):
            if self.uid is not None:
                yield (self.uid, self.n, self.sessions, self.max_gap)

    spark.udtf.register("session_stats_udtf", SessionStats)
    return spark.sql(
        f"SELECT * FROM session_stats_udtf(TABLE({view})"
        " PARTITION BY user_id ORDER BY es) ORDER BY user_id"
    )


# --------- 2.8 SQL surface: VALUES inline table as a join dimension

_VALUES_SQL = """
WITH targets(region_name, mult_bps) AS (VALUES
  ('AFRICA', 11000), ('AMERICA', 10500), ('ASIA', 12000),
  ('EUROPE', 9800), ('MIDDLE EAST', 10200)
),
per_region AS (
  SELECT r.r_name AS region,
         CAST(count(DISTINCT n.n_nationkey) AS BIGINT) AS n_nations,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS acctbal_cents
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1
)
SELECT p.region, p.n_nations, p.n_suppliers, p.acctbal_cents,
       CAST(t.mult_bps AS BIGINT) AS mult_bps,
       CAST(p.acctbal_cents * t.mult_bps {intdiv} 10000 AS BIGINT)
         AS target_cents
FROM per_region p JOIN targets t ON t.region_name = p.region
ORDER BY region
"""


@query(
    "sql_values_inline_table",
    "2.8 SQL surface",
    _VALUES_SQL.format(intdiv="//"),
)
def sql_values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES as a first-class inline table — the literal-dimension idiom
    (rate cards, targets, code→name maps) every migration hits: a named
    WITH … (col, col) AS (VALUES …) relation joined against real tables,
    exercising column aliasing in the CTE header, literal typing, and
    join semantics. Targets multiply exact account-balance cents with an
    integral bps division (trunc-identical both engines, negative
    balances included).

    Scale shape: the VALUES relation is a 5-row broadcast by
    construction; the census is one keyed agg over the supplier-dim
    join — the inline table never shuffles."""
    for t in ("supplier", "nation", "region"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"values_qid_{t}")
    sql = _VALUES_SQL.format(intdiv="DIV")
    # retarget only the relation references (FROM/JOIN), never identifiers
    # like region_name / p.region
    sql = sql.replace("FROM supplier s", "FROM values_qid_supplier s")
    sql = sql.replace("JOIN nation n", "JOIN values_qid_nation n")
    sql = sql.replace("JOIN region r", "JOIN values_qid_region r")
    return spark.sql(sql)


# ------ 2.7 scalar functions: posexplode 0-based ordinality contract

_POSEXPLODE_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k,
         [o_orderkey % 7, o_orderkey % 5, o_orderkey % 3] AS arr
  FROM orders WHERE o_orderkey <= 300
),
x AS (
  SELECT k, unnest(arr) AS v, generate_subscripts(arr, 1) - 1 AS pos
  FROM src
)
SELECT CAST(pos AS INT) AS pos,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(SUM((pos + 1) * v) AS BIGINT) AS sum_weighted
FROM x GROUP BY pos ORDER BY pos
"""


@query("fn_posexplode_ordinality", "2.7 scalar functions", _POSEXPLODE_ORACLE)
def fn_posexplode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The posexplode ordinality contract, pinned: positions are 0-BASED
    and follow array order (SQL's ordinality tradition — and DuckDB's
    generate_subscripts — is 1-based; the oracle subtracts 1, which is
    itself documentation of the off-by-one every port must handle).
    Position-weighted sums prove the index column participates in
    arithmetic, not just labeling.

    Scale shape: generation + posexplode are map-side Generate nodes;
    the census folds to 3 rows."""
    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 300)
        .select(
            F.col("o_orderkey").alias("k"),
            F.array(
                F.col("o_orderkey") % 7,
                F.col("o_orderkey") % 5,
                F.col("o_orderkey") % 3,
            ).alias("arr"),
        )
    )
    x = src.select("k", F.posexplode("arr").alias("pos", "v"))
    return (
        x.groupBy(F.col("pos").cast("int").alias("pos"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.sum((F.col("pos") + 1) * F.col("v")).alias("sum_weighted"),
        )
        .orderBy("pos")
    )
