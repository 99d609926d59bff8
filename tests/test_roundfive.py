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


def test_zorder_layout_skips_on_both_dims(spark, sf_dir):
    """The Morton layout must beat a single-column sort where it matters:
    a 5%-band predicate on EITHER dimension must skip a meaningful share
    of granules by min/max stats alone, while the date-sorted control
    skips (near) none on the non-sorted dim."""
    import glob
    import os

    import pyarrow.parquet as pq

    from hdc_dataengineering_sqlsync_spark.plans.roundfive import _r5_stage

    # build (or refresh) the layout via the qid itself
    CATALOG["sync_zorder_layout"].fn(spark, sf_dir).collect()
    out = os.path.join(_r5_stage(sf_dir), "orders_zorder")

    import pyspark.sql.functions as F

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    s = o.agg(
        F.min("o_custkey").alias("c0"), F.max("o_custkey").alias("c1"),
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    ).collect()[0]
    lo_c = s.c0 + (s.c1 - s.c0) // 2
    hi_c = lo_c + (s.c1 - s.c0) // 20
    span = (s.d1 - s.d0).days
    import datetime

    lo_d = s.d0 + datetime.timedelta(days=span // 2)
    hi_d = s.d0 + datetime.timedelta(days=span // 2 + (span + 1) // 20)

    total = skip_c = skip_d = 0
    for f in glob.glob(out + "/*.parquet"):
        pf = pq.ParquetFile(f)
        sch = {
            pf.metadata.row_group(0).column(i).path_in_schema: i
            for i in range(pf.metadata.num_columns)
        }
        for r in range(pf.metadata.num_row_groups):
            rg = pf.metadata.row_group(r)
            total += 1
            st = rg.column(sch["o_custkey"]).statistics
            if st.max < lo_c or st.min > hi_c:
                skip_c += 1
            st = rg.column(sch["o_orderdate"]).statistics
            if st.max.date() < lo_d or st.min.date() > hi_d:
                skip_d += 1
    assert total >= 16, total
    # both dims must skip at least a quarter of granules (measured ~50%/69%)
    assert skip_c >= total // 4, (skip_c, total)
    assert skip_d >= total // 4, (skip_d, total)


def test_parquet_bloom_filters_are_written(spark, sf_dir):
    """Blooms are invisible to pyarrow's metadata API here, so assert the
    physical signal: the bloomed write is measurably larger than an
    identical bloom-less control write, and both reads agree."""
    import glob
    import os

    import pyspark.sql.functions as F

    from hdc_dataengineering_sqlsync_spark.plans.roundfive import _BLOOM_KEYS, _r5_stage

    CATALOG["scan_parquet_bloom_skip"].fn(spark, sf_dir).collect()
    bloomed = os.path.join(_r5_stage(sf_dir), "orders_bloom")
    control = os.path.join(_r5_stage(sf_dir), "orders_bloom_control")
    (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select("o_orderkey", "o_totalprice")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(control)
    )

    def nbytes(d):
        return sum(os.path.getsize(f) for f in glob.glob(d + "/*.parquet"))

    assert nbytes(bloomed) > nbytes(control) * 1.05, (nbytes(bloomed), nbytes(control))
    a = (
        spark.read.parquet(bloomed)
        .where(F.col("o_orderkey").isin(*_BLOOM_KEYS))
        .agg(F.sum("o_orderkey").alias("s"))
        .collect()[0].s
    )
    b = (
        spark.read.parquet(control)
        .where(F.col("o_orderkey").isin(*_BLOOM_KEYS))
        .agg(F.sum("o_orderkey").alias("s"))
        .collect()[0].s
    )
    assert a == b


def test_rate_counter_recovers_true_increase(spark, sf_dir):
    """The reset-aware recovery must equal the true unwrapped increase on
    the fixture (every inter-sample delta below the modulus), and resets
    must actually occur somewhere (otherwise the qid tests nothing)."""
    rows = CATALOG["ts_rate_counter_resets"].fn(spark, sf_dir).collect()
    assert rows
    assert any(r.n_resets > 0 for r in rows)
    for r in rows:
        assert r.recovered_cents == r.true_increase_cents, r


def test_zipf_topk_uses_window_group_limit(spark, sf_dir):
    """The per-lang top-50 must group-limit inside the window (k rows kept
    per partition pre-shuffle), never rank-then-filter the full census."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        CATALOG["text_zipf_fit"].fn(spark, sf_dir).explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()


def test_matryoshka_funnel_mechanics(spark, sf_dir):
    """Funnel mechanics: exactly 10 survivors, full-dim rescore present
    for each, prefix ranking strictly ordered and deterministic across
    runs. (Recall vs the full-dim ranking is NOT asserted: the synthetic
    embeddings are random, not MRL-trained, so prefix dims carry no
    privileged signal — the qid docstring documents this.)"""
    rows = CATALOG["simsearch_matryoshka_truncate"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.cos64 is not None for r in rows)
    assert [r.rk for r in rows] == list(range(1, 11))
    assert all(rows[i].cos16 >= rows[i + 1].cos16 for i in range(9))
    again = CATALOG["simsearch_matryoshka_truncate"].fn(spark, sf_dir).collect()
    assert [(r.rk, r.vec_id) for r in rows] == [(r.rk, r.vec_id) for r in again]


def test_train_test_split_is_disjoint_and_stable(spark, sf_dir):
    """Hash assignment must be reproducible run-to-run (same census twice)
    and roughly 90/10 overall."""
    a = {(r.lang, r.split): r.n_docs for r in CATALOG["mix_train_test_split"].fn(spark, sf_dir).collect()}
    b = {(r.lang, r.split): r.n_docs for r in CATALOG["mix_train_test_split"].fn(spark, sf_dir).collect()}
    assert a == b
    train = sum(v for (_, s), v in a.items() if s == "train")
    test = sum(v for (_, s), v in a.items() if s == "test")
    assert 0.02 < test / (train + test) < 0.25
