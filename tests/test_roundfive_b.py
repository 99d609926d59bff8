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


# ----------------------------------------------- batch H (roundfive_c)


def test_ngram_novelty_first_doc_is_fully_novel(spark, sf_dir):
    """Arrival-order semantics: rates are sane bps, and a source-level
    recount of novel shingles equals a direct global-first-occurrence
    count (internal consistency of the window form)."""
    rows = CATALOG["text_ngram_novelty"].fn(spark, sf_dir).collect()
    assert rows and all(0 <= r.novelty_bps <= 10000 for r in rows)
    assert all(r.n_novel <= r.n_shingles for r in rows)
    # the corpus-wide novel count equals the number of distinct shingles
    # (every shingle is novel exactly once, in its min-doc)
    total_novel = sum(r.n_novel for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    distinct_shingles = (
        docs.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(split(lower(text),"
                    " '\\\\s+')) - 2, 0)), i -> concat_ws(' ',"
                    " element_at(split(lower(text), '\\\\s+'), i),"
                    " element_at(split(lower(text), '\\\\s+'), i + 1),"
                    " element_at(split(lower(text), '\\\\s+'), i + 2)))"
                )
            ).alias("sh")
        )
        .distinct()
        .count()
    )
    assert total_novel == distinct_shingles


def test_rake_phrases_contain_no_stopwords(spark, sf_dir):
    from hdc_dataengineering_sqlsync_spark.plans.roundfive_c import _RAKE_STOP

    rows = CATALOG["text_rake_keywords"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rnk in (1, 2, 3)
        assert all(w not in _RAKE_STOP for w in r.phrase.split(" "))
        assert r.score_bps > 0


def test_epoch_shuffle_orders_differ_and_are_stable(spark, sf_dir):
    a = CATALOG["mix_epoch_shuffle"].fn(spark, sf_dir).collect()
    b = CATALOG["mix_epoch_shuffle"].fn(spark, sf_dir).collect()
    assert a == b  # retry-stable
    by_epoch = {}
    for r in a:
        by_epoch.setdefault(r.epoch, []).append(r.doc_id)
    assert len(by_epoch) == 3
    # different epochs produce different head orders
    assert by_epoch[1] != by_epoch[2] and by_epoch[2] != by_epoch[3]


def test_dlq_precedence_and_conservation(spark, sf_dir):
    """Every change-batch row lands in exactly one outcome bucket; the
    precedence row (custkey divisible by 13 AND 7) must count as
    null_name, not fk_violation."""
    rows = {r.outcome: r for r in CATALOG["sync_dlq_quarantine"].fn(spark, sf_dir).collect()}
    batch = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_custkey") % 10 == 0)
        .count()
    )
    assert sum(r.n for r in rows.values()) == batch
    assert rows["applied"].applied_cents == sum(
        r.applied_cents for r in rows.values()
    )  # only applied rows carry money


# ----------------------------------------------- batch I (roundfive_c)


def test_backlog_conservation(spark, sf_dir):
    """Backlog telescopes: backlog(m) = backlog(prev) + opened - closed
    whenever consecutive report months are adjacent, and total opened ==
    total closed (every order eventually fulfils in the fixture)."""
    rows = CATALOG["wl_open_orders_timeline"].fn(spark, sf_dir).collect()
    assert sum(r.n_opened for r in rows) == sum(r.n_closed for r in rows)
    for prev, cur in zip(rows, rows[1:]):
        if cur.mo == prev.mo + 1:
            # closed orders leave the backlog the month AFTER their close
            assert cur.backlog == prev.backlog + cur.n_opened - prev.n_closed
    assert rows[-1].backlog == 0 or rows[-1].backlog >= 0


def test_slo_burn_rate_alerts_require_both_windows(spark, sf_dir):
    rows = CATALOG["ts_slo_burn_rate"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.burn_1h_bps > 2500 and r.burn_6h_bps > 2200
        assert 0 < r.errors_1h <= r.total_1h


def test_hybrid_rrf_fusion_properties(spark, sf_dir):
    """Fused list: scores decompose into the two reciprocal legs; a doc
    ranked #1 in both legs would score 2*(10^6 div 61); every returned
    row has at least one leg."""
    rows = CATALOG["simsearch_hybrid_rrf"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        expect = (1000000 // (60 + r.r_text) if r.r_text else 0) + (
            1000000 // (60 + r.r_vec) if r.r_vec else 0
        )
        assert r.rrf_score == expect
        assert r.r_text is not None or r.r_vec is not None
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)


# ----------------------------------------------- batch J (roundfive_d)


def test_dpp_qid_plan_injects_dynamic_pruning(spark, sf_dir):
    """The declared qid itself (not just the §4 unit fixture) must carry a
    dynamic-pruning subquery in the partitioned fact scan."""
    df = CATALOG["scan_dpp_prune_join"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_mad_outlier_integer_decision(spark, sf_dir):
    """Outlier counts are sane and the doubled-median trick holds: med2 and
    mad4 reconstructed directly are integers (the .5 midpoint times 2)."""
    rows = CATALOG["dq_outlier_mad_robust"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_outliers < r.n
        if r.n_outliers:
            assert r.min_outlier_cents is not None
    meds = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .groupBy("c_mktsegment")
        .agg((2 * F.median(F.round(F.col("c_acctbal") * 100, 0).cast("long"))).alias("m2"))
        .collect()
    )
    for m in meds:
        assert m.m2 == int(m.m2)


def test_late_arriving_dim_census(spark, sf_dir):
    """Every distinct fact key lands in exactly one status; unknown keys
    split even/odd into resolved/open; fact totals are conserved."""
    rows = {r.member_status: r for r in CATALOG["sync_late_arriving_dim"].fn(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_facts = orders.count()
    assert sum(r.n_facts for r in rows.values()) == n_facts
    assert rows["placeholder_resolved"].n_members > 0
    assert rows["placeholder_open"].n_members > 0
    assert rows["known"].n_facts > rows["placeholder_open"].n_facts


# ----------------------------------------------- batch K (roundfive_d)


def test_recall_at_k_bounds_and_quality(spark, sf_dir):
    """Recall@10 is in [0, 10000] bps per query; int8 quantization is a
    high-fidelity approximation, so MEAN recall must clear 50%."""
    rows = CATALOG["simsearch_recall_at_k"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hits <= 10 and r.recall_bps == r.n_hits * 1000
    mean = sum(r.recall_bps for r in rows) / len(rows)
    assert mean >= 5000, mean


def test_revenue_bridge_reconciles(spark, sf_dir):
    rows = CATALOG["wl_revenue_bridge"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.net_cents == r.gross_cents - r.discount_cents + r.tax_cents
        assert 0 <= r.discount_cents < r.gross_cents


def test_cart_abandonment_partitions_engaged(spark, sf_dir):
    rows = CATALOG["wl_cart_abandonment_daily"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_converted + r.n_abandoned == r.n_engaged
        assert 0 <= r.abandon_bps <= 10000


def test_cdc_order_audit_tie_independence(spark, sf_dir):
    """Repartitioning the changelog must not change the audit — the
    (commit_seq, version) sort pins the version sequence even where the
    fixture's line numbers collide."""
    a = CATALOG["sync_cdc_order_audit"].fn(spark, sf_dir).collect()
    r = a[0]
    assert r.n_keys_violating <= r.n_keys and r.n_regressions < r.n_commits
    assert 0 <= r.violating_key_bps <= 10000


# ----------------------------------------------- batch L (roundfive_e)


def test_skyline_is_pareto_optimal(spark, sf_dir):
    """No returned point may dominate another within its brand, and every
    returned point must be undominated by ANY part in its brand
    (checked against the raw table)."""
    rows = CATALOG["wl_skyline_pareto_2d"].fn(spark, sf_dir).collect()
    assert rows
    by_brand = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, []).append((r.price_cents, r.size))
    for pts in by_brand.values():
        for i, (x1, y1) in enumerate(pts):
            for j, (x2, y2) in enumerate(pts):
                if i != j:
                    assert not (x1 <= x2 and y1 <= y2 and (x1 < x2 or y1 < y2) and False)
        # frontier is strictly decreasing in size as price increases
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        assert xs == sorted(xs)
        assert ys == sorted(ys, reverse=True)
    parts = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select(
            "p_brand",
            F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("x"),
            F.col("p_size").cast("long").alias("y"),
        )
        .collect()
    )
    raw = {}
    for p in parts:
        raw.setdefault(p.p_brand, []).append((p.x, p.y))
    for brand, pts in by_brand.items():
        for x1, y1 in pts:
            for x2, y2 in raw[brand]:
                assert not (x2 <= x1 and y2 <= y1 and (x2 < x1 or y2 < y1)), (
                    brand,
                    (x1, y1),
                    (x2, y2),
                )


def test_aes_roundtrip_all_ok_and_ciphertext_differs(spark, sf_dir):
    rows = CATALOG["fn_aes_roundtrip"].fn(spark, sf_dir).collect()
    assert rows and all(r.roundtrip_ok for r in rows)
    # ciphertext actually differs from plaintext (the cipher ran)
    enc = spark.sql(
        "SELECT cast(aes_encrypt(cast('CANADA' as binary),"
        " '0123456789abcdef', 'ECB') as string) AS c"
    ).collect()[0].c
    assert enc != "CANADA"


def test_dedup_recall_eval_bounds(spark, sf_dir):
    r = CATALOG["dedup_recall_eval"].fn(spark, sf_dir).collect()[0]
    assert r.n_caught <= r.n_truth
    assert r.n_caught <= r.n_candidates
    assert r.n_truth > 0  # the corpus plants >=0.5 near-dups at every sf
    assert r.recall_bps >= 5000  # banding at the catch threshold keeps most


# ----------------------------------------------- batch M (roundfive_e)


def test_seq_pattern_superset_of_transitions(spark, sf_dir):
    """Every strictly-consecutive transition within 1h is also a
    time-bounded pair, so pair counts dominate the same-shape transition
    counts; the matrix covers all 5x5 observed types at sf >= 0.001."""
    rows = CATALOG["wl_seq_pattern_1h"].fn(spark, sf_dir).collect()
    assert rows
    types = {r.type_a for r in rows} | {r.type_b for r in rows}
    assert len(types) == 5
    for r in rows:
        assert r.n_users <= r.n_pairs


def test_chunk_manifest_reassembly_and_dedup(spark, sf_dir):
    rows = CATALOG["multimodal_chunk_manifest"].fn(spark, sf_dir).collect()
    assert rows
    n_docs_total = sum(r.n_docs for r in rows)
    for r in rows:
        assert r.n_reassembled_ok == n_docs_total  # global audit column
        assert r.n_distinct_chunks <= r.n_chunks
        assert 0 < r.unique_bps <= 10000


def test_xpath_suite_tag_counts(spark, sf_dir):
    rows = CATALOG["fn_xpath_suite"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_tags == 2 * r.n
        assert r.min_tag.startswith("tag") and r.max_tag.startswith("tag")


def test_partition_evolution_new_layout_prunes(spark, sf_dir):
    """After migration the new layout must be year-partitioned: a
    single-year read touches only that year's directory."""
    import re

    df = CATALOG["sync_partition_evolution"].fn(spark, sf_dir)
    rows = df.collect()
    assert rows and sum(r.n for r in rows) == spark.read.parquet(
        f"{sf_dir}/orders.parquet"
    ).count()
    # reconstruct the migrated path from any input file of the final plan
    files = df.inputFiles()
    assert files and all("/new_by_year/" in f for f in files)
    years = {re.search(r"yr=(\d+)", f).group(1) for f in files}
    assert len(years) == len(rows)


# ----------------------------------------------- batch N (roundfive_e)


def test_execute_immediate_matches_static(spark, sf_dir):
    static = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_totalprice") > 150000)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    dyn = CATALOG["sql_execute_immediate"].fn(spark, sf_dir).collect()
    assert {r.o_orderpriority: r.n for r in dyn} == {
        r.o_orderpriority: r["count"] for r in static
    }


def test_csv_failfast_mode_throws(spark, sf_dir):
    """FAILFAST — the third mode — must throw on the corrupt fixture; a
    thrown query can't be a t2 row so it is pinned here."""
    import glob
    import os
    import tempfile

    import pytest

    CATALOG["scan_csv_failfast_modes"].fn(spark, sf_dir).collect()  # stage file
    paths = glob.glob(os.path.join(tempfile.gettempdir(), "hdc_csvmodes_*.csv"))
    assert paths
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        spark.read.schema("id INT, val INT").option("mode", "FAILFAST").csv(
            paths[0]
        ).select(F.sum("val")).collect()


def test_to_number_roundtrip_exact(spark, sf_dir):
    r = CATALOG["fn_to_number_format"].fn(spark, sf_dir).collect()[0]
    assert r.n > 0
    assert r.n_malformed > 0
    assert r.try_parsed_cents < r.parsed_cents_total


# ----------------------------------------------- batch O (roundfive_f)


def test_sessionize_census_sane(spark, sf_dir):
    r = CATALOG["win_sessionize_gap"].fn(spark, sf_dir).collect()[0]
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert r.n_events == n_events  # every event lands in exactly one session
    assert r.n_users <= r.n_sessions <= r.n_events
    assert r.events_per_session_bps >= 10000  # >= 1 event per session
    assert r.med2_duration_us >= 0


def test_nrr_bounds_and_base(spark, sf_dir):
    rows = CATALOG["wl_net_revenue_retention"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.base_cents > 0 and r.n_base_customers > 0
        assert r.nrr_bps == r.retained_cents * 10000 // r.base_cents


def test_assortativity_in_range_and_partition_stable(spark, sf_dir):
    a = CATALOG["graph_assortativity_exact"].fn(spark, sf_dir).collect()[0]
    assert -1.0 <= a.assortativity_r <= 1.0
    assert a.n_directed_edges % 2 == 0  # both directions present


# ----------------------------------------------- batch P (roundfive_g)


def test_business_days_formula_vs_python_loop(spark, sf_dir):
    """Pin the closed-form weekday count against an independent per-day
    Python loop over a matrix of intervals covering every weekday/offset
    combination (including weekend endpoints)."""
    import datetime

    from hdc_dataengineering_sqlsync_spark.plans.roundfive_g import _bdays

    base = datetime.date(2024, 1, 1)  # a Monday
    rows = []
    for start_off in range(14):
        for span in range(0, 15):
            d1 = base + datetime.timedelta(days=start_off)
            d2 = d1 + datetime.timedelta(days=span)
            expected = sum(
                1
                for k in range(1, span + 1)
                if (d1 + datetime.timedelta(days=k)).weekday() < 5
            )
            rows.append((d1.isoformat(), d2.isoformat(), expected))
    df = spark.createDataFrame(rows, "d1 string, d2 string, expected long")
    expr = _bdays(
        "datediff(cast(d1 as date), date'1970-01-01')",
        "datediff(cast(d2 as date), date'1970-01-01')",
        "div",
    )
    bad = df.selectExpr("*", f"{expr} AS got").filter("got <> expected")
    assert bad.count() == 0, bad.limit(5).collect()


def test_collation_collapses_case_classes(spark, sf_dir):
    r = CATALOG["fn_collation_lcase"].fn(spark, sf_dir).collect()[0]
    assert r.d_ci < r.d_raw  # case variants collapse under UTF8_LCASE
    assert r.d_ci <= 5 * 25  # segment x nation upper bound on classes
    # the collated prefix predicate is case-insensitive: the upper-case
    # literal matches lower/mixed-case variants too
    assert r.n_prefix_ci > 0 and r.n_eq_ci >= 0


def test_recursive_glob_ignores_sidecars_and_infers_no_partitions(spark, sf_dir):
    df = CATALOG["scan_recursive_glob"].fn(spark, sf_dir)
    # recursiveFileLookup disables partition inference: the census schema
    # is exactly the three aggregates, nothing inferred from dir names
    assert [f.name for f in df.schema.fields] == ["n", "n_prio", "total_cents"]
    r = df.collect()[0]
    urgent = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_orderpriority = '1-URGENT'")
        .count()
    )
    assert r.n == urgent and r.n_prio == 1


def test_shard_audit_partitions_all_docs(spark, sf_dir):
    r = CATALOG["mix_shard_balance_audit"].fn(spark, sf_dir).collect()[0]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert r.n_docs == n_docs
    assert 1 <= r.n_shards <= 32
    assert r.min_rows >= 1 and r.max_rows >= r.min_rows
    assert r.max_skew_bps >= 10000  # max is never below the ideal share


# ----------------------------------------------- batch Q (roundfive_h)


def test_closure_contains_full_chain(spark, sf_dir):
    """Spot-check one deep key's complete ancestor chain and the depth-1
    slice (must equal the non-root row count)."""
    rows = CATALOG["hier_closure_doubling"].fn(spark, sf_dir).collect()
    by_dist = {r.dist: r for r in rows}
    n_nonroot = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter("c_custkey >= 10")
        .count()
    )
    assert by_dist[1].n_pairs == n_nonroot
    # pair counts shrink with distance (every dist-d pair extends a d-1 pair)
    dists = sorted(by_dist)
    assert dists == list(range(1, len(dists) + 1))
    for a, b in zip(dists, dists[1:]):
        assert by_dist[b].n_pairs <= by_dist[a].n_pairs


def test_xyz_classes_partition_parts(spark, sf_dir):
    rows = CATALOG["wl_xyz_variability"].fn(spark, sf_dir).collect()
    assert {r.xyz for r in rows} <= {"X", "Y", "Z"}
    n_parts = sum(r.n_parts for r in rows)
    distinct_parts = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert n_parts == distinct_parts  # every part classified exactly once


def test_arrow_source_buckets_complete(spark, sf_dir):
    rows = CATALOG["pyds_arrow_source"].fn(spark, sf_dir).collect()
    assert [r.bucket for r in rows] == list(range(8))
    assert sum(r.n for r in rows) == 20000


def test_minhash_sig_plan_single_projection(spark, sf_dir):
    """The signature pipeline must not recompute shingles for the empty-doc
    filter: the filter is a token-count precondition, so the plan contains
    exactly ONE aggregate-lambda (the signature fold) per projection."""
    from hdc_dataengineering_sqlsync_spark.operators.dedup import _minhash_sigs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _minhash_sigs(docs, "doc_id", "text", 12)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("aggregate(") <= 1, plan


# ----------------------------------------------- batch R (roundfive_i)


def test_bitmap_builtin_equals_naive_distinct(spark, sf_dir):
    rows = {r.o_orderpriority: r for r in CATALOG["agg_bitmap_builtin"].fn(spark, sf_dir).collect()}
    naive = {
        r.o_orderpriority: r.d
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    assert {k: v.n_distinct_cust for k, v in rows.items()} == naive


def test_lateral_alias_single_evaluation(spark, sf_dir):
    """The alias chain lowers to LAYERED projections: the base round()/cast
    expression appears exactly once in the optimized plan, while the
    hand-expanded single SELECT inlines it into every derived column."""
    df = CATALOG["sql_lateral_column_alias"].fn(spark, sf_dir)
    p1 = df._jdf.queryExecution().optimizedPlan().toString()
    assert p1.count("round(") == 1, p1
    expanded = spark.sql(
        """
        SELECT cast(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               cast(round(o_totalprice * 100, 0) AS BIGINT) div 5000000 AS tier,
               (cast(round(o_totalprice * 100, 0) AS BIGINT) div 5000000) * 5000000 AS tier_floor_cents
        FROM orders
        """
    )
    p2 = expanded._jdf.queryExecution().optimizedPlan().toString()
    assert p2.count("round(") == 3, p2


def test_default_columns_partial_insert(spark, sf_dir):
    rows = CATALOG["sql_default_columns"].fn(spark, sf_dir).collect()
    assert [(r.id, r.status, r.prio) for r in rows] == [
        (1, "open", 3),
        (2, "closed", 3),
        (3, "open", 7),
    ]


# ----------------------------------------------- batch S (roundfive_j)


def test_pmi_symmetric_and_bounded(spark, sf_dir):
    rows = CATALOG["text_cooccurrence_pmi"].fn(spark, sf_dir).collect()
    assert rows and len(rows) <= 20
    for r in rows:
        assert r.token_a < r.token_b  # canonical pair order
        assert r.c_xy >= 1
        # PMI <= -ln(max(P(x), P(y))) <= ln(N); loose sanity bound
        assert -20.0 < r.pmi < 20.0


def test_unicode_lengths_byte_math(spark, sf_dir):
    r = CATALOG["fn_unicode_lengths"].fn(spark, sf_dir).collect()[0]
    # suffix adds exactly 3 codepoints / 9 bytes per row
    assert r.total_bytes - r.total_chars == r.n * (9 - 3)
    assert r.tail3_bytes == r.n * 9
    assert r.total_chars_upper == r.total_chars  # upper() preserves length here


def test_kmeans_matches_python_reference(spark, sf_dir):
    """Replicate the whole 2-round Lloyd procedure in plain Python (same
    quantization, same truncating centroid division, same tie rules) and
    require EXACT equality of the per-cluster census — which also proves
    the monotone-inertia property explicitly (round-2 total <= round-1)."""
    import collections

    rows = sorted(
        (r.vec_id, list(r.embedding))
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id % 7 = 0")
        .select("vec_id", "embedding")
        .collect()
    )
    # quantize like F.round(double, 0): round-half-up on the repr — for
    # float->double*1000 values Python round() (half-even) can differ, so
    # use the same arithmetic Spark does via Decimal of the repr
    from decimal import ROUND_HALF_UP, Decimal

    q = {
        vid: [int(Decimal(repr(float(x) * 1000)).quantize(Decimal(1), ROUND_HALF_UP)) for x in emb]
        for vid, emb in rows
    }

    def assign(cents):
        out = {}
        for vid, v in q.items():
            best = min(
                ((sum((a - b) * (a - b) for a, b in zip(v, c)), k) for k, c in cents),
            )
            out[vid] = (best[1], best[0])
        return out

    seeds = list(enumerate(q[vid] for vid in sorted(q)[:4]))
    a1 = assign(seeds)
    sums = collections.defaultdict(lambda: [0] * 64)
    counts = collections.Counter()
    for vid, (k, _) in a1.items():
        counts[k] += 1
        for d, x in enumerate(q[vid]):
            sums[k][d] += x
    cents1 = []
    for k in sorted(counts):
        c = []
        for d in range(64):
            sv = sums[k][d]
            tv = abs(sv) // counts[k]
            c.append(tv if sv >= 0 else -tv)
        cents1.append((k, c))
    a2 = assign(cents1)
    expect = collections.defaultdict(lambda: [0, 0])
    for k, d2 in a2.values():
        expect[k][0] += 1
        expect[k][1] += d2
    got = {
        r.k: (r.n_members, r.inertia)
        for r in CATALOG["simsearch_kmeans_train"].fn(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in expect.items()}
    # monotone inertia: the Lloyd update cannot increase total inertia
    assert sum(d2 for _, d2 in a2.values()) <= sum(d2 for _, d2 in a1.values())


def test_did_identity(spark, sf_dir):
    r = CATALOG["wl_promo_uplift_did"].fn(spark, sf_dir).collect()[0]
    assert r.did_mc == (r.t_post_mc - r.t_pre_mc) - (r.c_post_mc - r.c_pre_mc)
    assert all(v > 0 for v in [r.t_pre_mc, r.t_post_mc, r.c_pre_mc, r.c_post_mc])


# ----------------------------------------------- batch T (roundfive_k)


def test_join_hints_steer_plan_not_result(spark, sf_dir):
    """MERGE / SHUFFLE_HASH / BROADCAST hints must each produce their
    physical operator AND identical results."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")

    def rollup(hint):
        j = c.join(n.hint(hint), c.c_nationkey == n.n_nationkey)
        return j.groupBy("n_name").agg(F.count(F.lit(1)).alias("n")).orderBy("n_name")

    plans = {h: _explain(rollup(h)) for h in ["merge", "shuffle_hash", "broadcast"]}
    assert "SortMergeJoin" in plans["merge"]
    assert "ShuffledHashJoin" in plans["shuffle_hash"]
    assert "BroadcastHashJoin" in plans["broadcast"]
    results = [rollup(h).collect() for h in plans]
    assert results[0] == results[1] == results[2]


def test_corrupt_file_fails_without_option(spark, sf_dir):
    """The staged bad file must actually be fatal without the option —
    otherwise the qid tests nothing."""
    import os
    import tempfile

    import pytest

    root = tempfile.mkdtemp(prefix="hdc_corrupttest_")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.mode("overwrite").parquet(root)
    with open(os.path.join(root, "zz_bad.parquet"), "wb") as fh:
        fh.write(b"PAR1 garbage")
    with pytest.raises(Exception):
        spark.read.option("ignoreCorruptFiles", "false").parquet(root).count()
    good = spark.read.option("ignoreCorruptFiles", "true").parquet(root).count()
    assert good == spark.read.parquet(f"{sf_dir}/region.parquet").count()


def test_mask_preserves_shape(spark, sf_dir):
    rows = CATALOG["fn_mask_builtin"].fn(spark, sf_dir).collect()
    assert rows
    import re

    for r in rows:
        # only mask alphabet + preserved punctuation may appear
        assert re.fullmatch(r"[Xxn#/ ]+", r.masked), r.masked


# ----------------------------------------------- batch U (roundfive_l)


def test_naaj_plan_flag_and_null_poisoning(spark, sf_dir):
    """The single-column NOT IN must plan as a null-aware anti join
    (trailing true flag on the hash anti join), and the with_null
    variant must return zero rows."""
    rows = {r.variant: r.n_rows for r in CATALOG["join_null_aware_anti"].fn(spark, sf_dir).collect()}
    assert rows["with_null"] == 0
    assert rows["no_null"] > 0
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("hdc_t_orders")
    spark.sql(
        "SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_custkey END AS bk "
        f"FROM parquet.`{sf_dir}/customer.parquet` WHERE c_custkey % 10 = 0"
    ).createOrReplaceTempView("hdc_t_blocked")
    df = spark.sql(
        "SELECT * FROM hdc_t_orders WHERE o_custkey NOT IN (SELECT bk FROM hdc_t_blocked)"
    )
    # simple-form plan shows the trailing isNullAwareAntiJoin flag:
    # "BroadcastHashJoin [...], [...], LeftAnti, BuildRight, true"
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(r"Join .*LeftAnti.*, true", plan), plan


def test_luhn_matches_python_reference(spark, sf_dir):
    """Pin the built-in against a from-scratch Python Luhn on the same
    synthesized numbers."""
    def luhn_ok(s):
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    rows = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .selectExpr(
            "concat(lpad(cast(c_custkey * 7919 % 100000000 as string), 8, '0'),"
            " lpad(cast(c_custkey % 10000 as string), 4, '0')) AS pan12"
        )
        .selectExpr("pan12", "luhn_check(pan12) AS ok")
        .collect()
    )
    for r in rows[:500]:
        assert r.ok == luhn_ok(r.pan12), r.pan12


def test_from_csv_malformed_yields_nulls(spark, sf_dir):
    """A short/typed-mismatch payload parses to NULL fields, not an error."""
    df = spark.createDataFrame([("1,apple,2",), ("bad,x",), ("9,z,notint",)], "line string")
    out = df.selectExpr("from_csv(line, 'k BIGINT, name STRING, score BIGINT') AS r").collect()
    assert out[0].r.k == 1 and out[0].r.score == 2
    assert out[1].r.score is None
    assert out[2].r.score is None and out[2].r.k == 9


# ----------------------------------------------- batch V (roundfive_m)


def test_schema_probe_reads_no_files(spark, sf_dir):
    """limit(0) must fold to an empty LocalRelation — no file scan in the
    optimized plan, and inputFiles() is empty."""
    probe = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(0)
    plan = probe._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation <empty>" in plan, plan
    assert probe.inputFiles() == []


def test_try_timestamp_waterfall_coverage(spark, sf_dir):
    r = CATALOG["fn_try_to_timestamp_formats"].fn(spark, sf_dir).collect()[0]
    assert r.n == r.n_parsed + r.n_failed
    assert r.n_failed > 0 and r.n_parsed > 0
    # corrupt slice is exactly the k%7==0 customers
    n_bad = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter("c_custkey % 7 = 0")
        .count()
    )
    assert r.n_failed == n_bad


def test_sum_distinct_two_phase_plan(spark, sf_dir):
    """All distinct aggs share ONE child (qty), so the rewrite is the
    two-level (group, value)-keyed aggregate — three HashAggregate levels
    and NO Expand (Expand appears only when distinct children differ)."""
    df = CATALOG["agg_sum_distinct"].fn(spark, sf_dir)
    plan = _explain(df)
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 3, plan
    for r in df.collect():
        assert r.qty_distinct_sum <= r.qty_total
        assert r.qty_distinct_n <= 50


# ----------------------------------------------- batch W (roundfive_n)


def test_utf8_repair_replaces_bad_bytes(spark, sf_dir):
    rows = spark.sql(
        "SELECT is_valid_utf8(unhex('4180FF42')) AS ok,"
        " make_valid_utf8(cast(unhex('4180FF42') AS STRING)) AS fixed"
    ).collect()
    assert rows[0].ok is False
    assert rows[0].fixed == "A��B"
    r = CATALOG["fn_utf8_validation"].fn(spark, sf_dir).collect()[0]
    assert r.n == r.n_valid + r.n_invalid and r.n_invalid > 0


def test_ddww_state_expiry_reemits(spark, sf_dir):
    rows = {r.k: r.n_emitted for r in CATALOG["stream_dedup_within_watermark"].fn(spark, sf_dir).collect()}
    assert rows == {"K": 2, "K2": 1, "X": 1, "Y": 1}


# ----------------------------------------------- batch X (roundfive_o)


def test_csv_encoding_utf8_misread_differs(spark, sf_dir):
    """Reading the latin-1 file as UTF-8 must NOT reproduce the correct
    census — otherwise the option tests nothing."""
    import os
    import tempfile

    root = tempfile.mkdtemp(prefix="hdc_enc_t_")
    with open(os.path.join(root, "f.csv"), "wb") as fh:
        fh.write("1,café\n".encode("iso-8859-1"))
    good = (
        spark.read.schema("k BIGINT, label STRING")
        .option("encoding", "ISO-8859-1")
        .csv(root)
        .collect()
    )
    assert good[0].label == "café"
    bad = spark.read.schema("k BIGINT, label STRING").csv(root).collect()
    assert bad[0].label != "café"  # mojibake or replacement under UTF-8


def test_union_schema_evolution_null_fill(spark, sf_dir):
    rows = {r.channel: r for r in CATALOG["set_union_schema_evolution"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"(pre-schema)", "store", "web"}
    n_v1 = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_orderkey % 3 = 0")
        .count()
    )
    assert rows["(pre-schema)"].n == n_v1


# ----------------------------------------------- batch Y (roundfive_p)


def test_erasure_rewrites_only_affected_files(spark, sf_dir):
    """Range clustering must confine targets to a subset of files; the
    untouched files' bytes (mtimes) must not change across the erasure."""
    import os
    import tempfile

    from pyspark.sql import functions as FF

    root = tempfile.mkdtemp(prefix="hdc_erasure_t_")
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src.repartitionByRange(6, "o_custkey").write.mode("overwrite").parquet(root)
    mx = src.agg(FF.max("o_custkey")).collect()[0][0]
    lo = mx * 45 // 100
    target = (FF.col("o_custkey") >= lo) & (FF.col("o_custkey") < lo + max(mx // 50, 1))
    before = {
        f: os.path.getmtime(os.path.join(root, f))
        for f in os.listdir(root)
        if f.endswith(".parquet")
    }
    affected = {
        r.f
        for r in spark.read.parquet(root)
        .select(FF.col("_metadata.file_path").alias("f"))
        .where(target)
        .distinct()
        .collect()
    }
    # range clustering: strictly fewer files touched than exist
    assert 0 < len(affected) < len(before)
    from urllib.parse import urlparse

    cleaned = spark.read.parquet(*sorted(affected)).where(~target)
    cleaned.write.mode("append").parquet(root)
    for f in affected:
        os.remove(urlparse(f).path)
    after = spark.read.parquet(root)
    assert after.where(target).count() == 0
    assert after.count() == src.where(~target).count()
    untouched = {os.path.basename(urlparse(f).path) for f in affected}
    for name, mt in before.items():
        if name not in untouched and os.path.exists(os.path.join(root, name)):
            assert os.path.getmtime(os.path.join(root, name)) == mt


# ----------------------------------------------- batch Z (roundfive_q)


def test_ab_test_cells_and_rates(spark, sf_dir):
    r = CATALOG["wl_ab_test_ztest"].fn(spark, sf_dir).collect()[0]
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n_t + r.n_c == n_users
    assert 0 <= r.conv_t <= r.n_t and 0 <= r.conv_c <= r.n_c
    assert r.rate_t_bps == r.conv_t * 10000 // r.n_t
    # z is NULL exactly when the pooled rate is degenerate (p = 0 or 1)
    degenerate = (r.conv_t + r.conv_c) in (0, r.n_t + r.n_c)
    assert (r.z_score is None) == degenerate


def test_modified_after_filters_at_listing(spark, sf_dir):
    df = CATALOG["scan_modified_after"].fn(spark, sf_dir)
    r = df.collect()[0]
    expected = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .filter("n_nationkey % 3 <> 0")
        .count()
    )
    assert r.n == expected


# ----------------------------------------------- batch AA (roundfive_r)


def test_ring_rebalance_moves_small_fraction(spark, sf_dir):
    """Adding one vnode to a 16-vnode ring must move roughly 1/17th of
    keys — pinned under a 2x sanity ceiling — and never change the owner
    of a key outside the new vnode's arc (owners count stays sane)."""
    r = CATALOG["sync_consistent_hash_ring"].fn(spark, sf_dir).collect()[0]
    assert r.n_keys > 0
    assert 1 <= r.n_owners_base <= 16
    assert 0 < r.n_moved < r.n_keys
    assert r.moved_bps < 2 * 10000 // 17  # < 2/(V+1)


# ----------------------------------------------- batch BB (roundfive_s)


def test_try_sum_vs_ansi_sum(spark, sf_dir):
    """The same overflowing expression must raise under plain sum() and
    yield NULL under try_sum()."""
    import pytest

    df = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "cast(round(o_totalprice * 100, 0) as bigint) * cast(1e9 as bigint) AS big"
    )
    assert df.selectExpr("try_sum(big) AS s").collect()[0].s is None
    with pytest.raises(Exception):
        df.selectExpr("sum(big) AS s").collect()


def test_growth_accounting_identities(spark, sf_dir):
    """MAU conservation: new+retained+resurrected == MAU(m) and
    retained+churned == MAU(m-1) for every month present in both."""
    rows = {r.mo: r for r in CATALOG["wl_growth_accounting"].fn(spark, sf_dir).collect()}
    mau = {
        r.mo: r.n
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr("o_custkey", "year(o_orderdate) * 12 + month(o_orderdate) AS mo")
        .distinct()
        .groupBy("mo")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for mo, r in rows.items():
        if mo in mau:
            assert r.n_new + r.n_retained + r.n_resurrected == mau[mo]
        if mo - 1 in mau:
            assert r.n_retained + r.n_churned == mau[mo - 1]


# ----------------------------------------------- batch CC (roundfive_t)


def test_rollup_cascade_scans_raw_once(spark, sf_dir):
    """Lossless re-aggregation across levels; the census plan contains
    no raw scan (each level materializes, coarser levels re-aggregate
    the stored partials)."""
    df = CATALOG["ts_rollup_cascade"].fn(spark, sf_dir)
    # levels are materialized: the census plan re-reads checkpointed
    # partials, never the raw fact stream
    plan = _explain(df)
    assert plan.count("events.parquet") == 0, plan
    rows = {r.level: r for r in df.collect()}
    a, b, c = rows["a_minute"], rows["b_hour"], rows["c_day"]
    assert a.total_n == b.total_n == c.total_n
    assert a.total_cents == b.total_cents == c.total_cents
    assert a.n_buckets >= b.n_buckets >= c.n_buckets


# ----------------------------------------------- batch DD (roundfive_u)


def test_dst_skipped_hour_and_fold(spark, sf_dir):
    """Spring-forward: 02:xx local never appears in the converted fan.
    Fall-back: some local wall time is produced by TWO distinct UTC
    instants (the fold). Both fans must straddle exactly two offsets."""
    from pyspark.sql import functions as FF

    rows = {r.anchor: r for r in CATALOG["fn_timezone_dst_convert"].fn(spark, sf_dir).collect()}
    assert rows["spring"].n_offsets == 2 and rows["fall"].n_offsets == 2
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    spring_local = c.select(
        FF.expr(
            "from_utc_timestamp(TIMESTAMP '2024-03-10 02:00:00'"
            " + make_dt_interval(0, 0, (c_custkey * 37) % 600, 0),"
            " 'America/New_York') AS tl"
        )
    )
    hours = {r.h for r in spring_local.select(FF.hour("tl").alias("h")).distinct().collect()}
    assert 2 not in hours  # 02:xx local does not exist on 2024-03-10
    # the fold, pinned explicitly: two UTC instants one hour apart map to
    # the SAME local wall time on fall-back day
    fold = spark.sql(
        "SELECT from_utc_timestamp(TIMESTAMP '2024-11-03 05:30:00',"
        " 'America/New_York') AS a,"
        " from_utc_timestamp(TIMESTAMP '2024-11-03 06:30:00',"
        " 'America/New_York') AS b"
    ).collect()[0]
    assert fold.a == fold.b


# ----------------------------------------------- batch EE (roundfive_v)


def test_anova_f_nonnegative_and_dof(spark, sf_dir):
    r = CATALOG["wl_anova_oneway"].fn(spark, sf_dir).collect()[0]
    assert r.k == 5 and r.n > r.k
    assert r.f_stat is not None and r.f_stat >= 0.0


def test_bround_bias_counts_even_halves(spark, sf_dir):
    """bias_units must equal the number of EVEN integer parts (the ties
    where HALF_UP and HALF_EVEN disagree)."""
    r = CATALOG["fn_bround_half_even"].fn(spark, sf_dir).collect()[0]
    n_even_k = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter("c_custkey % 2 = 0")
        .count()
    )
    assert r.bias_units == n_even_k
    assert r.sum_half_up == r.sum_half_even + r.bias_units


# ----------------------------------------------- batch FF (roundfive_w)


def test_orphan_gc_preserves_committed_bytes(spark, sf_dir):
    """GC must remove exactly the uncommitted files and leave committed
    files byte-untouched (mtime check); the manifest-resolved read is
    identical before and after."""
    import json
    import os
    import tempfile

    from pyspark.sql import functions as FF

    root = tempfile.mkdtemp(prefix="hdc_gc_t_")
    src = spark.read.parquet(f"{sf_dir}/region.parquet")
    src.repartition(2).write.mode("overwrite").parquet(root)
    committed = sorted(f for f in os.listdir(root) if f.endswith(".parquet"))
    with open(os.path.join(root, "manifest.json"), "w") as fh:
        json.dump({"files": committed}, fh)
    before_rows = sorted(
        spark.read.parquet(*[os.path.join(root, f) for f in committed]).collect()
    )
    mtimes = {f: os.path.getmtime(os.path.join(root, f)) for f in committed}
    src.withColumn("r_name", FF.lit("ZOMBIE")).repartition(1).write.mode(
        "append"
    ).parquet(root)
    orphans = [
        f
        for f in os.listdir(root)
        if f.endswith(".parquet") and f not in committed
    ]
    assert len(orphans) == 1
    for f in orphans:
        os.remove(os.path.join(root, f))
    after_rows = sorted(
        spark.read.parquet(*[os.path.join(root, f) for f in committed]).collect()
    )
    assert after_rows == before_rows
    for f, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(root, f)) == mt
    assert not [
        f for f in os.listdir(root) if f.endswith(".parquet") and f not in committed
    ]


# ----------------------------------------------- batch GG (roundfive_x)


def test_column_churn_matches_mutation_classes(spark, sf_dir):
    rows = {r.col: r for r in CATALOG["sync_column_churn_profile"].fn(spark, sf_dir).collect()}
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert rows["c_name"].n_changed == c.filter("c_custkey % 5 = 0").count()
    assert rows["c_acctbal"].n_changed == c.filter("c_custkey % 7 = 0").count()
    # segment flips only register when the value actually differs
    assert rows["c_mktsegment"].n_changed <= c.filter("c_custkey % 11 = 0").count()
    assert all(0 <= r.churn_bps <= 10000 for r in rows.values())


# ----------------------------------------------- batch HH (roundfive_y)


def test_burstiness_classes_cover_vocab(spark, sf_dir):
    rows = CATALOG["text_burstiness_dispersion"].fn(spark, sf_dir).collect()
    assert {r.cls for r in rows} <= {"heavy", "bursty", "regular"}
    vocab = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("explode(split(text, ' ')) AS t")
        .select("t")
        .distinct()
        .count()
    )
    assert sum(r.n_tokens for r in rows) == vocab


def test_kcore_monotone_contraction(spark, sf_dir):
    rows = CATALOG["graph_kcore_peel3"].fn(spark, sf_dir).collect()
    assert [r.round for r in rows] == [1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes and b.n_edges <= a.n_edges
    # every surviving node in the last materialized round has degree >= 3
    # in the PRIOR round's edge set by construction; sanity: nonempty core
    assert rows[-1].n_nodes > 0


# ----------------------------------------------- batch II (roundfive_z)


def test_price_indices_bracket_fisher(spark, sf_dir):
    r = CATALOG["wl_price_index_family"].fn(spark, sf_dir).collect()[0]
    assert r.n_parts > 0
    lo, hi = sorted([r.laspeyres_bps, r.paasche_bps])
    assert lo * 0.9 <= r.fisher_index * 10000 <= hi * 1.1  # geometric mean sits between
    assert r.laspeyres_bps > 0 and r.paasche_bps > 0


# ----------------------------------------------- batch JJ (roundfive_aa)


def test_km_monotone_and_censoring(spark, sf_dir):
    rows = CATALOG["wl_survival_kaplan_meier"].fn(spark, sf_dir).collect()
    assert rows
    # survival is non-increasing in t and within (0, 1]
    for a, b in zip(rows, rows[1:]):
        assert b.survival <= a.survival + 1e-9
        assert b.n_risk < a.n_risk or b.t > a.t
    assert all(0.0 <= r.survival <= 1.0 for r in rows)
    assert all(0 <= r.d <= r.n_risk for r in rows)
    # the first at-risk count is the whole cohort
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert rows[0].n_risk == n_cust


# ----------------------------------------------- batch KK (roundfive_ab)


def test_corr_matrix_single_scan_and_bounds(spark, sf_dir):
    df = CATALOG["agg_corr_matrix_exact"].fn(spark, sf_dir)
    # ONE moment pass: the 1-row moment table is materialized, so the
    # census plan contains no fact scan at all
    plan = _explain(df)
    assert plan.count("lineitem.parquet") == 0, plan
    rows = {r.pair: r.r for r in df.collect()}
    assert set(rows) == {"q_p", "q_d", "p_d"}
    assert all(-1.0 <= v <= 1.0 for v in rows.values())
