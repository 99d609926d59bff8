"""Skew-mitigation join (SURVEY.md §4, 100 TB mandate).

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. ``salted_join`` is the
explicit fallback for the pathological case AQE can't fix: a SINGLE hot key
whose rows exceed one executor's memory on the build side. Salting spreads
each hot key over ``n_salts`` shuffle partitions by appending a deterministic
salt to the big side's key and replicating the small side once per salt
value — trading a bounded small-side blowup (|small| x n_salts) for an even
big-side distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big ⋈ small on ``on`` with the big side salted.

    The salt is deterministic (xxhash64 of the whole big row, mod n_salts) so
    repeated runs shuffle identically — no rand(), per SURVEY.md §2
    convention 7. Result is row-identical to ``big.join(small, on, how)``
    for the supported join types; right/full outer are rejected because the
    replicated small side would null-extend once per unmatched salt,
    duplicating output rows.
    """
    supported = {"inner", "left", "leftouter", "left_outer", "left_semi",
                 "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in supported:
        raise ValueError(
            f"salted_join supports {sorted(supported)} joins; {how!r} would "
            "emit one null-extended row per unmatched salt on the small side"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn(_SALT, salt.cast("int"))
    s = small.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return b.join(s, [*on, _SALT], how).drop(_SALT)
