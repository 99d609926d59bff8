"""Vector math over ArrayType(Float) columns — pure builtin higher-order
functions (zip_with / aggregate / transform), JVM-side, no UDFs.

All arithmetic in DOUBLE (FIXTURES.md hazard #6: float32 accumulation would
drift from the DuckDB oracle's double math).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-order dot product: sum order is the array order on both
    engines, so results are reproducible bit-for-bit."""
    prods = F.zip_with(as_double_array(a), as_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    sq = F.aggregate(
        F.transform(as_double_array(a), lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
