"""Round-5 additions: structural/plan assertions beyond the oracle compare
(which every qid already gets via test_catalog_oracle + driver_sim)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans import CATALOG


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_jdbc_agg_pushdown_plan_is_complete_pushdown(spark, sf_dir):
    """The aggregate must run DB-side: the physical plan carries
    PushedAggregates/PushedGroupByExpressions on the JDBC scan and — the
    single-partition complete-pushdown shape — NO Spark-side HashAggregate
    re-aggregating raw rows."""
    plan = _explain(CATALOG["jdbc_agg_pushdown"].fn(spark, sf_dir))
    assert "PushedAggregates" in plan, plan
    assert "PushedGroupByExpressions" in plan, plan
    assert "HashAggregate" not in plan, plan
    # the pushed spec covers every output aggregate
    for fn in ("COUNT", "SUM", "MIN", "MAX"):
        assert fn in plan.split("PushedAggregates", 1)[1].split("\n", 1)[0], plan


def test_psi_drift_is_one_lazy_plan(spark, sf_dir):
    """VERDICT r4 #4: no eager driver round-trips inside the query fn —
    building the DataFrame must launch zero Spark jobs (collect()-free),
    and the raw tables must not feed the single-partition totals window
    (only the ≤10-row censuses do)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = CATALOG["dq_psi_drift"].fn(spark, sf_dir)
    after = tracker.getJobIdsForGroup(None)
    assert list(before) == list(after), "building dq_psi_drift launched Spark jobs"
    rows = df.collect()
    assert [r.bin for r in rows] == list(range(10))
    assert abs(sum(r.psi_contrib for r in rows)) < 5.0  # finite, smoothed
