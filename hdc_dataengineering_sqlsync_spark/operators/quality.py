"""Declarative data-quality constraint auditing (SURVEY.md §2.8 extension).

A table-sync utility's natural companion: before/after a sync you audit the
target against declared constraints (NOT NULL, domain membership, key
uniqueness, referential integrity, header/detail reconciliation) and ship a
per-constraint violation report.

Scale design
------------
* All ROW rules against one table fold into a SINGLE conditional aggregate
  over one scan — adding a rule adds a map-side `sum(case when ...)` column,
  never another pass over 100 TB.
* UNIQUE rules are one hash aggregate on the declared key (count vs distinct
  count) — map-side partial aggregation applies.
* FK rules are ONE scan of the child per rule (left join against the
  broadcast deduplicated parent keyset + a single conditional aggregate);
  the parent side is typically a dimension and is explicitly broadcast
  when small (``broadcast_parent=True``), so the 100 TB fact side never
  shuffles and is never read twice.
* The report itself is a union of 1-row aggregates — negligible.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["RowRule", "row_rules_report", "unique_report", "fk_orphans_report"]

REPORT_COLS = ("rule_name", "n_checked", "n_violations")


@dataclass(frozen=True)
class RowRule:
    """A named per-row predicate that must hold (``ok`` True == no violation).

    SQL three-valued logic applies: a predicate that evaluates to NULL
    (e.g. ``qty > 0`` on a NULL qty) is counted as a PASS, because ``~NULL``
    stays NULL and ``sum`` skips it — the same answer an ANSI engine gives
    for ``sum(CASE WHEN NOT ok THEN 1 END)``. If NULL should mean violation,
    write the rule's NULL handling explicitly, e.g.
    ``ok=F.coalesce(qty > 0, F.lit(False))`` or ``ok=qty.isNotNull() & (qty > 0)``.
    """

    name: str
    ok: Column


def _report_row(name: Column | str, checked: Column, violations: Column) -> Column:
    nm = F.lit(name) if isinstance(name, str) else name
    return F.struct(
        nm.alias("rule_name"),
        checked.cast("long").alias("n_checked"),
        violations.cast("long").alias("n_violations"),
    )


def row_rules_report(df: DataFrame, rules: list[RowRule]) -> DataFrame:
    """All row rules over ``df`` in ONE scan: a single conditional aggregate,
    then the per-rule counters unpivot into report rows driver-free
    (inline over an array of structs — no collect)."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum((~r.ok).cast("long")).alias(f"__v_{i}") for i, r in enumerate(rules)
    ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            _report_row(r.name, F.col("__n"), F.coalesce(F.col(f"__v_{i}"), F.lit(0)))
            for i, r in enumerate(rules)
        ]
    )
    return one.select(F.inline(rows))


def unique_report(df: DataFrame, name: str, key: list[str]) -> DataFrame:
    """Key-uniqueness audit: violations = rows beyond the first per key
    (count(*) - count(distinct key)) — one hash aggregate.

    The distinct count runs over a STRUCT of the key so NULL key tuples
    are retained as distinct values (SQL `SELECT DISTINCT` semantics, and
    what the paired DuckDB oracle computes) — a bare countDistinct would
    silently drop NULL-keyed rows and over-count violations."""
    return df.agg(
        _report_row(
            name,
            F.count(F.lit(1)),
            F.count(F.lit(1)) - F.countDistinct(F.struct(*[F.col(k) for k in key])),
        ).alias("r")
    ).select("r.*")


def fk_orphans_report(
    child: DataFrame,
    name: str,
    keys: list[str],
    parent: DataFrame,
    parent_keys: list[str],
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential-integrity audit: child rows (with non-null key) whose key
    has no parent. ONE scan of the child: a left join against the
    (broadcast, deduplicated) parent keyset, then a single conditional
    aggregate counts checked rows and parent-misses together — the
    anti-join + separate count formulation would scan the 100 TB fact side
    twice."""
    non_null = child.na.drop(subset=keys)
    p = parent.select(
        *[F.col(pk).alias(f"__p_{i}") for i, pk in enumerate(parent_keys)]
    ).dropDuplicates()
    if broadcast_parent:
        p = F.broadcast(p)
    cond = [non_null[k] == p[f"__p_{i}"] for i, k in enumerate(keys)]
    joined = non_null.join(p, cond, "left")
    missing = F.col("__p_0").isNull()
    return joined.agg(
        _report_row(
            name,
            F.count(F.lit(1)),
            F.coalesce(F.sum(missing.cast("long")), F.lit(0)),
        ).alias("r")
    ).select("r.*")
