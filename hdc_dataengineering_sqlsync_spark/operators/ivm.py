"""Incremental (grouped-aggregate) view maintenance — apply a changeset's
DELTAS to a pre-aggregated view instead of recomputing it from the base
table (SURVEY.md §2.8 extension).

The sync engine's changelog (I/U/D per primary key) carries exactly the
information needed to maintain SUM/COUNT-style grouped aggregates without
rescanning the base table:

  I  row appears   -> (+1, +measure) to its group
  D  row vanishes  -> (-1, -measure) from its group
  U  row changes   -> (-1, -old) from the old group, (+1, +new) to the new
                      (group-key changes route the row between groups)

At 100 TB this is the difference between a changeset-sized delta aggregation
(KBs..GBs) and a full re-aggregation of the base table: cost tracks the
CHANGE volume. The one full-outer PK join below is the same join the sync
diff already performs — in a deployed pipeline the deltas fall out of the
existing ``snapshot_diff`` pass for free.

Determinism: callers pass the measure pre-cast to ``DECIMAL`` so delta sums
are exact (order-insensitive) — floating-point measures would make
"maintained" and "recomputed" views differ by ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_agg_deltas", "apply_agg_deltas"]


def grouped_agg_deltas(
    source: DataFrame,
    target: DataFrame,
    pk: list[str],
    group_col: str,
    measure_col: str,
) -> DataFrame:
    """Delta rows ``(group, d_n, d_measure)`` that move the grouped aggregate
    of ``target`` onto that of ``source``.

    One full-outer join on the PK over reduced ``(pk, group, measure)``
    projections; unchanged rows emit nothing, updates emit a retract/insert
    pair (possibly into different groups).
    """
    s = source.select(
        *pk,
        F.lit(1).alias("_s_present"),
        F.col(group_col).alias("_sg"),
        F.col(measure_col).alias("_sm"),
    )
    t = target.select(
        *[F.col(k).alias(f"_t_{k}") for k in pk],
        F.lit(1).alias("_t_present"),
        F.col(group_col).alias("_tg"),
        F.col(measure_col).alias("_tm"),
    )
    cond = [s[k] == t[f"_t_{k}"] for k in pk]
    j = s.join(t, cond, "full_outer")

    in_s = F.col("_s_present").isNotNull()
    in_t = F.col("_t_present").isNotNull()
    changed = in_s & in_t & (
        ~F.col("_sg").eqNullSafe(F.col("_tg")) | ~F.col("_sm").eqNullSafe(F.col("_tm"))
    )
    retract = F.when(
        in_t & (changed | ~in_s),
        F.struct(
            F.col("_tg").alias(group_col),
            F.lit(-1).cast("long").alias("d_n"),
            (-F.col("_tm")).alias("d_measure"),
        ),
    )
    insert = F.when(
        in_s & (changed | ~in_t),
        F.struct(
            F.col("_sg").alias(group_col),
            F.lit(1).cast("long").alias("d_n"),
            F.col("_sm").alias("d_measure"),
        ),
    )
    return j.select(
        F.explode(F.array_compact(F.array(retract, insert))).alias("d")
    ).select("d.*")


def apply_agg_deltas(base_agg: DataFrame, deltas: DataFrame, group_col: str) -> DataFrame:
    """Fold delta rows into a ``(group, n, total)`` view: union + one keyed
    re-aggregate (delta volume, not base volume), dropping groups whose
    count reaches zero."""
    d = deltas.groupBy(group_col).agg(
        F.sum("d_n").alias("n"), F.sum("d_measure").alias("total")
    )
    return (
        base_agg.unionByName(d)
        .groupBy(group_col)
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        .where(F.col("n") > 0)
    )
