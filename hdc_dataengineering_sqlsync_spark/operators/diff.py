"""Snapshot diff — the core sync operator (SURVEY.md §2.8).

Semantics (source-of-truth perspective, matching SQL Server change-tracking's
I/U/D operations): for each primary key,

  I  key in source, missing from target      (target needs insert)
  U  key in both, row digest differs         (target needs update)
  D  key in target, missing from source      (target needs delete)
  =  key in both, digests equal              (no-op)

Scale: one full-outer shuffle join keyed on the PK; both sides are reduced to
(pk, digest, payload) before the join, so the shuffle carries one hash per
row, not N comparison columns. At 100 TB the join is the unavoidable cost;
everything else is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.functions.digests import row_digest, row_digest_fast

CHANGE_OP = "change_op"
_SRC_DIGEST = "_src_digest"
_TGT_DIGEST = "_tgt_digest"


def snapshot_diff(
    source: DataFrame,
    target: DataFrame,
    pk: list[str],
    compare_cols: list[str] | None = None,
    keep_source_payload: bool = True,
    cross_engine_digest: bool = False,
) -> DataFrame:
    """Classify every PK as I/U/D/= between source and target.

    Returns columns: pk..., change_op, and (when ``keep_source_payload``)
    the source's non-pk columns — exactly what ``merge.merge_apply`` needs
    to apply the changeset.

    The digest is ``row_digest_fast`` (xxhash64 over raw values — no string
    rendering, ~2x cheaper) unless ``cross_engine_digest`` asks for the
    md5-canonical-string form whose VALUE reproduces in other engines.
    """
    digest = row_digest if cross_engine_digest else row_digest_fast
    non_pk = [c for c in source.columns if c not in pk]
    s = source.withColumn(_SRC_DIGEST, digest(source, compare_cols))
    t = target.select(
        *[F.col(c).alias(f"_t_{c}") for c in pk],
        digest(target, compare_cols).alias(_TGT_DIGEST),
    )
    cond = [s[k] == t[f"_t_{k}"] for k in pk]
    joined = s.join(t, cond, "full_outer")

    src_present = F.col(_SRC_DIGEST).isNotNull()
    tgt_present = F.col(_TGT_DIGEST).isNotNull()
    op = (
        F.when(src_present & ~tgt_present, "I")
        .when(~src_present & tgt_present, "D")
        .when(F.col(_SRC_DIGEST) != F.col(_TGT_DIGEST), "U")
        .otherwise("=")
    )
    # PK comes from whichever side has the row (D rows have no source pk).
    pk_cols = [F.coalesce(s[k], t[f"_t_{k}"]).alias(k) for k in pk]
    payload = non_pk if keep_source_payload else []
    return joined.select(*pk_cols, op.alias(CHANGE_OP), *payload)


def diff_summary(diff: DataFrame) -> DataFrame:
    """change_op -> count, the validation view of a diff."""
    return diff.groupBy(CHANGE_OP).agg(F.count(F.lit(1)).alias("n")).orderBy(CHANGE_OP)
