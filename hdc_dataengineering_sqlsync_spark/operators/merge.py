"""Changeset apply (MERGE/upsert without Delta Lake) — SURVEY.md §2.8 & §4.

Spark has no MERGE INTO against plain parquet, so the merge is expressed as
  kept    = target ANTI JOIN (keys with op in {U, D})   -- drop stale rows
  applied = kept UNION ALL (changeset rows with op in {I, U})
which is exactly the relational algebra a MERGE executes. ``unionByName``
keeps column order/type alignment (SURVEY.md §7 known-hard #2).

Scale: the anti join and the union are both keyed on the PK; with the
changeset typically << target, Catalyst/AQE broadcasts the changeset side of
the anti join — no shuffle of the big table. At the real-DB boundary the
same changeset drives a JDBC foreachBatch MERGE (sources/jdbc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.operators.diff import CHANGE_OP


def merge_apply(target: DataFrame, changeset: DataFrame, pk: list[str]) -> DataFrame:
    """Apply an I/U/D changeset (from ``snapshot_diff`` with payload) to
    target; returns the merged table with target's column order."""
    cols = target.columns
    stale_keys = changeset.where(F.col(CHANGE_OP).isin("U", "D")).select(*pk)
    kept = target.join(stale_keys, pk, "left_anti")
    upserts = changeset.where(F.col(CHANGE_OP).isin("I", "U")).select(*cols)
    return kept.unionByName(upserts)
