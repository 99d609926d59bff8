"""JDBC transport — the reference's actual source/sink (SURVEY.md §2.1).

No database SERVER is reachable in this sandbox, but Spark's classpath
ships embedded Derby (its metastore engine), so the read/write wrappers
below are exercised LIVE against a real JDBC database by the
`jdbc_roundtrip_nation` / `jdbc_filter_pushdown` qids (plans/sync.py) —
including the keyset-partitioned parallel read and WHERE-clause filter
pushdown (plan-asserted). The SQL-Server-specific pieces remain pure SQL
generation, unit-tested without a server:

  - ``partitioned_read_options``: the parallel-extract spec
    (partitionColumn/lowerBound/upperBound/numPartitions on the PK) — the
    JDBC-side equivalent of operators/incremental.keyset_ranges. Each of N
    executors issues one bounded range query; the server does the chunking.
  - ``change_tracking_query``: the CHANGETABLE(CHANGES ...) pull statement
    (SQL Server change-tracking semantics, version-keyed CDC).
  - ``merge_statement``: the T-SQL MERGE an upsert sink issues per
    foreachBatch micro-batch (streaming/jobs.foreach_batch_merge's real-DB
    twin).
  - ``read_jdbc`` / ``write_jdbc``: thin wrappers over spark.read/write
    format("jdbc") applying those options.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcTable:
    url: str  # jdbc:sqlserver://host;databaseName=db
    table: str  # dbo.T
    pk: tuple[str, ...]
    properties: dict[str, str] = field(default_factory=dict)


def partitioned_read_options(
    table: JdbcTable,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Options for a parallel bounded-range JDBC extract. numPartitions range
    queries run concurrently, one per executor slot; fetchsize bounds
    per-roundtrip row batches."""
    if upper_bound <= lower_bound:
        raise ValueError("upperBound must exceed lowerBound")
    if num_partitions < 1:
        raise ValueError("numPartitions must be >= 1")
    return {
        "url": table.url,
        "dbtable": table.table,
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetchsize),
        **table.properties,
    }


def change_tracking_query(table: JdbcTable, last_sync_version: int) -> str:
    """Version-keyed incremental pull: primary keys + operation for every row
    changed since ``last_sync_version`` (joined to current values)."""
    pk_on = " AND ".join(f"ct.{k} = t.{k}" for k in table.pk)
    pk_cols = ", ".join(f"ct.{k}" for k in table.pk)
    return (
        f"SELECT {pk_cols}, ct.SYS_CHANGE_OPERATION AS change_op, "
        f"ct.SYS_CHANGE_VERSION AS change_version, t.* "
        f"FROM CHANGETABLE(CHANGES {table.table}, {last_sync_version}) AS ct "
        f"LEFT JOIN {table.table} AS t ON {pk_on}"
    )


def merge_statement(table: JdbcTable, columns: list[str], staging_table: str) -> str:
    """T-SQL MERGE applying a staged I/U/D changeset to the target table —
    the per-micro-batch upsert a streaming sink issues."""
    pk = table.pk
    on = " AND ".join(f"target.{k} = src.{k}" for k in pk)
    non_pk = [c for c in columns if c not in pk]
    set_clause = ", ".join(f"target.{c} = src.{c}" for c in non_pk)
    insert_cols = ", ".join(columns)
    insert_vals = ", ".join(f"src.{c}" for c in columns)
    return (
        f"MERGE {table.table} AS target "
        f"USING {staging_table} AS src ON {on} "
        f"WHEN MATCHED AND src.change_op = 'D' THEN DELETE "
        f"WHEN MATCHED AND src.change_op IN ('I', 'U') THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED BY TARGET AND src.change_op IN ('I', 'U') "
        f"THEN INSERT ({insert_cols}) VALUES ({insert_vals});"
    )


def read_jdbc(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    return spark.read.format("jdbc").options(**options).load()


def write_jdbc(df: DataFrame, table: JdbcTable, mode: str = "append") -> None:
    df.write.format("jdbc").options(url=table.url, dbtable=table.table, **table.properties).mode(
        mode
    ).save()


def ansi_merge_statement(
    table: JdbcTable, set_cols: list[str], staging_table: str, op_col: str = "op"
) -> str:
    """ANSI MERGE (Derby/Postgres-15+/standard form) applying a staged
    changeset with INTEGER op codes (1=I, 2=U, 3=D) — the dialect-portable
    twin of ``merge_statement`` (T-SQL). Identifiers are double-quoted
    because Spark's JDBC writer creates case-sensitive quoted columns.
    Exercised LIVE against embedded Derby by `jdbc_sync_merge_live`."""
    q = lambda c: f'"{c}"'  # noqa: E731
    pk = table.pk
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in pk)
    non_pk = [c for c in set_cols if c not in pk]
    set_clause = ", ".join(f"{q(c)} = s.{q(c)}" for c in non_pk)
    insert_cols = ", ".join(q(c) for c in set_cols)
    insert_vals = ", ".join(f"s.{q(c)}" for c in set_cols)
    return (
        f"MERGE INTO {table.table} t USING {staging_table} s ON {on} "
        f"WHEN MATCHED AND s.{q(op_col)} = 3 THEN DELETE "
        f"WHEN MATCHED AND s.{q(op_col)} IN (1, 2) THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED AND s.{q(op_col)} IN (1, 2) "
        f"THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )


def execute_statement(spark: SparkSession, url: str, sql: str) -> int:
    """Run one DML/DDL statement over JDBC via the JVM's DriverManager —
    how the sync loop issues its MERGE against the target database (the
    rows never pass through the driver; the DB applies the staged set)."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # type: ignore[union-attr]
    try:
        stmt = conn.createStatement()
        try:
            return stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()
