"""Dry DuckDB type audit over every declared oracle (no Spark needed).

Round 8's one real defect class was oracle-side typing: 13 oracles computed
``SUM(BIGINT) * 10000 // …`` basis-points columns, which DuckDB types as
HUGEINT while the Spark side emits BIGINT. Values were row-for-row identical,
but the driver hashes at *typed* fidelity, so those qids hash-failed — and the
local ``fetchall()``-based sweep couldn't see it (HUGEINT degrades to a plain
Python int). This audit binds (not executes) every oracle and fails if any
output column has a type outside the driver's BIGINT/DOUBLE/... mapping, so
the class can never be reintroduced silently (VERDICT r8 directive #3).
"""

from __future__ import annotations

import pytest

from hdc_dataengineering_sqlsync_spark.plans import CATALOG
from hdc_dataengineering_sqlsync_spark.testing import DUCK_TO_SPARK, duckdb_connect

ORACLE_QIDS = sorted(q for q, spec in CATALOG.items() if spec.oracle is not None)


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connect(sf_dir)


def _is_mappable(duck_type: str) -> bool:
    return duck_type.startswith("DECIMAL") or duck_type in DUCK_TO_SPARK


@pytest.mark.parametrize("qid", ORACLE_QIDS)
def test_oracle_output_types_mappable(con, qid):
    rel = con.sql(CATALOG[qid].oracle)  # bind only — no execution
    offenders = [
        (c, t)
        for c, t in zip(rel.columns, (str(t).upper() for t in rel.types))
        if not _is_mappable(t)
    ]
    assert not offenders, (
        f"{qid}: oracle emits driver-unmappable DuckDB type(s) {offenders}; "
        "CAST the column (e.g. AS BIGINT) — the driver's typed hash will fail "
        "even when values match"
    )
