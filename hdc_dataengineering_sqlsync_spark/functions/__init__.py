"""Reusable column-expression builders (JVM-side, codegen-friendly).

Everything here returns pyspark Columns composed from builtin functions —
no Python UDFs — so hot-path expressions stay inside whole-stage codegen.
"""

from hdc_dataengineering_sqlsync_spark.functions.digests import (
    NULL_SENTINEL,
    canonical_str,
    row_digest,
    duckdb_canonical_str,
    duckdb_row_digest,
)
from hdc_dataengineering_sqlsync_spark.functions.vectors import (
    as_double_array,
    dot,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "NULL_SENTINEL",
    "canonical_str",
    "row_digest",
    "duckdb_canonical_str",
    "duckdb_row_digest",
    "as_double_array",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
