"""SURVEY.md §2 round-5 additions, batch U.

Null-aware anti join (NOT IN three-valued semantics), Luhn checksum
validation, and inline CSV payload parsing. Registered after
``roundfive_k`` (plans/__init__.py) so the qids append to the END of the
never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------- 2.3 joins: null-aware anti join (NOT IN semantics)

_NAAJ_ORACLE = """
WITH blocked AS (
  SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_custkey END AS bk
  FROM customer WHERE c_custkey % 10 = 0
),
with_null AS (
  SELECT COUNT(*) AS n FROM orders
  WHERE o_custkey NOT IN (SELECT bk FROM blocked)
),
no_null AS (
  SELECT COUNT(*) AS n FROM orders
  WHERE o_custkey NOT IN (SELECT bk FROM blocked WHERE bk IS NOT NULL)
)
SELECT 'no_null' AS variant, CAST(n AS BIGINT) AS n_rows FROM no_null
UNION ALL
SELECT 'with_null', CAST(n AS BIGINT) FROM with_null
ORDER BY variant
"""


@query("join_null_aware_anti", "2.3 joins", _NAAJ_ORACLE)
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN's three-valued logic: the null-aware anti join.

    The sync-exclusion trap: `key NOT IN (blocklist)` is NOT an anti
    join when the blocklist can contain NULL — `k <> NULL` is UNKNOWN,
    so a single NULL in the subquery silently empties the entire result
    (the with_null variant returns 0 rows; the is-not-null-filtered
    variant returns the real exclusion). Spark plans the single-column
    case as a hash anti join with the null-aware flag (the trailing
    `isNullAwareAntiJoin=true` in the operator — plan-asserted in the
    unit test) instead of the quadratic BroadcastNestedLoop it would
    otherwise need for three-valued semantics.

    Scale shape: the blocklist side broadcasts (it is a filter list);
    the probe side streams map-side — the null-aware check adds one
    broadcast-side null-existence bit, not a plan change. The REAL
    lesson for 100 TB sync jobs is in the variant pair: always
    null-filter exclusion lists."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") % 10 == 0)
    blocked = c.select(
        F.when(F.col("c_custkey") % 50 == 0, None)
        .otherwise(F.col("c_custkey"))
        .alias("bk")
    )
    blocked.createOrReplaceTempView("hdc_naaj_blocked")
    load(spark, sf_dir, "orders").createOrReplaceTempView("hdc_naaj_orders")
    return spark.sql(
        """
        WITH with_null AS (
          SELECT count(*) AS n FROM hdc_naaj_orders
          WHERE o_custkey NOT IN (SELECT bk FROM hdc_naaj_blocked)
        ),
        no_null AS (
          SELECT count(*) AS n FROM hdc_naaj_orders
          WHERE o_custkey NOT IN
            (SELECT bk FROM hdc_naaj_blocked WHERE bk IS NOT NULL)
        )
        SELECT 'no_null' AS variant, n AS n_rows FROM no_null
        UNION ALL
        SELECT 'with_null', n FROM with_null
        ORDER BY variant
        """
    )


# ------------- 2.7 scalar functions: Luhn checksum validation

_LUHN_ORACLE = """
WITH nums AS (
  SELECT lpad(CAST(c_custkey * 7919 % 100000000 AS VARCHAR), 8, '0')
         || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS pan12
  FROM customer
),
digits AS (
  SELECT pan12, i.i AS pos,
         CAST(substr(pan12, CAST(13 - i.i AS INT), 1) AS BIGINT) AS d
  FROM nums, unnest(range(1, 13)) AS i(i)
),
checks AS (
  SELECT pan12,
         SUM(CASE WHEN pos % 2 = 0
             THEN CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END
             ELSE d END) AS luhn_sum
  FROM digits GROUP BY pan12
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE luhn_sum % 10 = 0) AS BIGINT) AS n_valid,
       CAST(COUNT(DISTINCT pan12) AS BIGINT) AS n_distinct
FROM checks
"""


@query("fn_luhn_check", "2.7 scalar functions", _LUHN_ORACLE)
def fn_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in luhn_check(): checksum-gate for card-shaped identifiers.

    The ingestion-validation primitive for PAN-like fields: the Luhn
    mod-10 test (double every second digit from the right, subtract 9
    over 9, sum ≡ 0 mod 10) catches single-digit typos and adjacent
    transpositions. Spark 3.5 ships it natively; the oracle re-derives
    the checksum from first principles (digit explode → positional
    doubling → mod 10), so the census (valid count over synthesized
    12-digit numbers) proves the built-in implements exactly that
    algebra. In a DQ pipeline this gates rows BEFORE masking/redaction
    (`fn_mask_builtin`, `text_pii_redact`).

    Scale shape: map-side codegen per row + one global census; the
    oracle's explode form is the spec, not the scale path."""
    c = load(spark, sf_dir, "customer")
    nums = c.select(
        F.concat(
            F.lpad((F.col("c_custkey") * 7919 % 100000000).cast("string"), 8, "0"),
            F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        ).alias("pan12")
    )
    return nums.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("luhn_check(pan12)").cast("long")).alias("n_valid"),
        F.countDistinct("pan12").alias("n_distinct"),
    )


# ------------- 2.7 scalar functions: inline CSV payload parsing

_FROM_CSV_ORACLE = """
WITH payload AS (
  SELECT CAST(n_nationkey AS VARCHAR) || ',' || n_name || ','
         || CAST(n_regionkey * 10 + 5 AS VARCHAR) AS line
  FROM nation
),
parsed AS (
  SELECT CAST(string_split(line, ',')[1] AS BIGINT) AS k,
         string_split(line, ',')[2] AS name,
         CAST(string_split(line, ',')[3] AS BIGINT) AS score
  FROM payload
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS key_total,
       CAST(SUM(score) AS BIGINT) AS score_total,
       CAST(COUNT(DISTINCT name) AS BIGINT) AS n_names
FROM parsed
"""


@query("fn_from_csv_inline", "2.7 scalar functions", _FROM_CSV_ORACLE)
def fn_from_csv_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_csv(): typed parsing of CSV-in-a-column payloads.

    The message-bus reality the FILE scanners (`csv_roundtrip_nation`,
    `scan_csv_*`) don't cover: a string COLUMN carries a delimited
    record (queue messages, log fields, legacy EDI blobs), and
    `from_csv(line, 'k BIGINT, name STRING, score BIGINT')` parses it
    into a typed struct inline — schema enforcement per value, no
    staging files, same options surface as the file reader. The oracle
    rebuilds the parse from string_split + casts.

    Scale shape: map-side parse in the scan projection; at 100 TB this
    is the decode step of a landed message dump, fused into the first
    pass over the data."""
    n = load(spark, sf_dir, "nation")
    payload = n.select(
        F.concat_ws(
            ",",
            F.col("n_nationkey").cast("string"),
            F.col("n_name"),
            (F.col("n_regionkey") * 10 + 5).cast("string"),
        ).alias("line")
    )
    parsed = payload.select(
        F.from_csv("line", "k BIGINT, name STRING, score BIGINT").alias("r")
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r.k").alias("key_total"),
        F.sum("r.score").alias("score_total"),
        F.countDistinct("r.name").alias("n_names"),
    )
