"""Generic as-of join (SURVEY.md §4: no native Spark operator).

``asof_join(left, right, ...)``: for every left row, attach the latest right
row whose timestamp is <= (or strictly <) the left timestamp, per key.

Implementation is the union-tag trick, not a range join:
  1. union left (tagged 1) and right (tagged 0) into one stream of rows,
  2. single window pass per key ordered by (ts, tag): last_value of the
     right-side payload over UNBOUNDED PRECEDING,
  3. keep left rows.

Cost: ONE shuffle on the key + one sort — linear, the same plan shape at
100 TB (a naive interval join is quadratic per key; Spark would fall back to
broadcast-nested-loop). Tag ordering encodes strictness: with strict=True a
right row at the exact left timestamp sorts AFTER the left row and is
excluded from its frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_TAG = "_asof_tag"  # right=0 sorts before left=1 on ties (non-strict)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: latest right value at-or-before (strict: before)
    each left row's timestamp. Returns left columns + value_cols renamed with
    ``suffix``."""
    value_cols = value_cols or [c for c in right.columns if c not in on and c != right_ts]
    if not value_cols:
        raise ValueError(
            "no value columns to carry from the right side; pass value_cols "
            f"explicitly (e.g. value_cols=[{right_ts!r}] to carry the as-of timestamp)"
        )
    out_names = [f"{v}{suffix}" for v in value_cols]

    from pyspark.sql import types as T

    left_tag, right_tag = (0, 1) if strict else (1, 0)
    # The right payload rides as ONE struct so last(ignorenulls) picks the
    # latest right ROW atomically — filling each column independently would
    # back-fill NULL fields of the latest row from OLDER rows and emit
    # column mixtures that never existed.
    payload_type = T.StructType(
        [T.StructField(o, right.schema[v].dataType) for v, o in zip(value_cols, out_names)]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(right_tag).alias(_TAG),
        F.struct(*[F.col(v).alias(o) for v, o in zip(value_cols, out_names)]).alias("_payload"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(  # noqa: E741
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(left_tag).alias(_TAG),
        F.lit(None).cast(payload_type).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    unioned = r.unionByName(l)

    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", _TAG)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        F.last("_payload", ignorenulls=True).over(w).alias("_payload"),
        *[F.col(f"_l_{c}") for c in left.columns],
        F.col(_TAG),
    )
    is_left = F.col(_TAG) == F.lit(left_tag)
    # strict mode tags left=0 < right=1, so a right row at the same ts sorts
    # after the left row and never enters its frame; non-strict tags right
    # first so same-ts right rows are visible.
    return filled.where(is_left).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_payload.{o}").alias(o) for o in out_names],
    )
