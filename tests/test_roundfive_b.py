"""Round-5 batch-G additions: structural/plan assertions beyond the oracle
compare (which every qid already gets via test_catalog_oracle + driver_sim)."""

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


def test_fd_discovery_holds_flags(spark, sf_dir):
    """The key-implied FD must report holds=true with zero violations; a
    genuine fan-out FD (part->supplier) must report violations at any sf."""
    rows = {r.fd: r for r in CATALOG["dq_fd_discovery"].fn(spark, sf_dir).collect()}
    key_fd = rows["orders: o_orderkey->o_custkey"]
    assert key_fd.holds and key_fd.n_violating_lhs == 0 and key_fd.violating_rows == 0
    fanout = rows["lineitem: l_partkey->l_suppkey"]
    assert not fanout.holds and fanout.n_violating_lhs > 0


def test_attribution_single_window_no_self_join(spark, sf_dir):
    """The touch lookup must be ONE window pass over the event log — no
    join of events against a touch subset (the full-outer of the two tiny
    per-campaign aggregates is the only join allowed)."""
    df = CATALOG["wl_attribution_credit"].fn(spark, sf_dir)
    plan = _explain(df)
    assert plan.count("Window") >= 1
    # events.parquet is scanned exactly once: the per-purchase windowed
    # pass; campaign aggregates reuse that exchange.
    assert plan.count("events.parquet") <= 1, plan
    # conservation: every purchase is attributed exactly once per model
    rows = df.collect()
    assert sum(r.first_convs for r in rows) == sum(r.last_convs for r in rows)
    assert sum(r.first_cents for r in rows) == sum(r.last_cents for r in rows)


def test_fifo_allocation_invariants(spark, sf_dir):
    """Allocation can never exceed demand, and both boundary regimes must
    occur (full fills AND stockouts) so the clamp logic is actually
    exercised by the fixture scale."""
    rows = CATALOG["wl_fifo_inventory"].fn(spark, sf_dir).collect()
    assert all(0 <= r.allocated <= r.demand for r in rows)
    assert all(0 <= r.fill_rate_bps <= 10000 for r in rows)
    assert sum(r.n_full for r in rows) > 0
    assert sum(r.n_stockout for r in rows) > 0


def test_fifo_single_window_pass(spark, sf_dir):
    """The running consumption is ONE window partitioned by part — no
    second sort/exchange of the fact table."""
    plan = _explain(CATALOG["wl_fifo_inventory"].fn(spark, sf_dir))
    assert plan.count(") Window") == 1, plan  # one Window node in the detail list


def test_txlog_snapshot_reads_only_live_segments(spark, sf_dir):
    """Snapshot readers must never touch removed segments: the resolved
    scan carries the v1/v2 replacement paths and neither removed path."""
    import re

    df = CATALOG["sync_txlog_snapshot"].fn(spark, sf_dir)
    scanned = {
        re.search(r"data/(prio_[A-Za-z0-9_]+)/", f).group(1)
        for f in df.inputFiles()
    }
    assert "prio_1_even" in scanned and "prio_2_compacted" in scanned, scanned
    assert "prio_1" not in scanned and "prio_2" not in scanned, scanned


def test_triangle_downsample_one_point_per_interior_bucket(spark, sf_dir):
    """Exactly one selected point per (series, interior bucket), the
    bucket stats ride a broadcast join (points never shuffle), and each
    selected point actually falls inside its bucket hour."""
    df = CATALOG["ts_downsample_triangle"].fn(spark, sf_dir)
    plan = _explain(df)
    assert "BroadcastHashJoin" in plan, plan
    rows = df.collect()
    assert len({(r.event_type, r.bucket) for r in rows}) == len(rows)
    for r in rows[:50]:
        # bucket = epoch-micros div 1h; ts collected as UTC wall time
        import calendar

        micros = calendar.timegm(r.ts.timetuple()) * 1_000_000 + r.ts.microsecond
        assert micros // 3_600_000_000 == r.bucket
