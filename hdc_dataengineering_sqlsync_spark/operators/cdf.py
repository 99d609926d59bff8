"""Exact global CDF / cumulative counts WITHOUT a global sort — the
distributed prefix-sum pattern (SURVEY.md §2.8 dq_ks_drift, §2.4
agg_deciles_distributed).

A global cumulative order normally means a single-partition window (the
retired win_range_frame cliff). Instead:

  1. reduce to a value census (value -> count) — one keyed, map-side
     combinable aggregate; the only data-sized pass;
  2. bucket values into COARSE cells (``value div cell_width``) and bring
     the per-cell totals to the driver ONCE — bounded by #cells, a dial
     independent of data volume;
  3. turn them into per-cell starting offsets (a tiny driver-side scan);
  4. within-cell cumulative sums run as windows PARTITIONED BY CELL —
     full parallelism — and add the broadcast offset.

The result is every distinct value's EXACT global cumulative count, with
shuffle parallelism throughout. Serves exact quantiles, KS statistics,
Lorenz curves, and calibration plots at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["exact_global_cum"]


def exact_global_cum(
    census: DataFrame,
    value_col: str = "v",
    count_cols: tuple[str, ...] = ("n",),
    cell_width: int = 1_000_000,
) -> tuple[DataFrame, dict[str, int]]:
    """Exact global cumulative counts over a (value, count...) census.

    ``census`` must hold one row per distinct integer ``value_col`` with
    one or more count columns (multiple sides of a comparison cumulate in
    one pass, as dq_ks_drift needs). Returns ``(cum_df, totals)`` where
    ``cum_df`` has ``value_col`` plus, for each count column ``c``, a
    column ``c`` holding its exact global cumulative sum over values
    ``<= value``; ``totals`` maps each count column to its grand total.

    The driver materializes ONLY the per-cell totals (#cells rows — pick
    ``cell_width`` so that count stays small; it does not grow with data
    volume). The census itself is localCheckpoint'ed because it is
    consumed twice (cell totals + cumsum).
    """
    census = census.withColumn("_cell", F.expr(f"{value_col} div {cell_width}")).localCheckpoint()
    cells = census.groupBy("_cell").agg(
        *[F.sum(c).alias(c) for c in count_cols]
    )
    offsets: dict[str, dict[int, int]] = {c: {} for c in count_cols}
    acc = {c: 0 for c in count_cols}
    for r in sorted(cells.collect(), key=lambda r: r._cell):
        for c in count_cols:
            offsets[c][r._cell] = acc[c]
            acc[c] += r[c] or 0
    w = Window.partitionBy("_cell").orderBy(value_col)
    out_cols = [F.col(value_col)]
    for c in count_cols:
        omap = F.create_map(*[F.lit(x) for kv in offsets[c].items() for x in kv])
        out_cols.append((F.sum(c).over(w) + omap[F.col("_cell")]).alias(c))
    return census.select(*out_cols), acc
