"""The primary correctness net: every declared qid's Spark result must match
its DuckDB oracle (row-count + schema + order-insensitive values) — the local
mirror of the driver's t2 gate (SURVEY.md §5.1-5.2)."""

from __future__ import annotations

import pytest

from hdc_dataengineering_sqlsync_spark.plans import CATALOG
from hdc_dataengineering_sqlsync_spark.testing import assert_query_matches

QIDS = sorted(CATALOG)


@pytest.mark.parametrize("qid", QIDS)
def test_query_matches_oracle(spark, oracle, sf_dir, qid):
    q = CATALOG[qid]
    if q.oracle is None:
        # rows-only contract: runs and yields a stable, non-crashing result
        df = q.fn(spark, sf_dir)
        assert df.count() >= 0
        return
    assert_query_matches(spark, oracle, q.fn, q.oracle, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    for k, v in qs.items():
        assert callable(v), k
    for k, v in os_.items():
        assert isinstance(v, str) and v.strip(), k
