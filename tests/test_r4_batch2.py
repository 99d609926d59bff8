"""Unit tests for the round-4 continuation qids (now split across
plans/graphs.py, plans/exact_stats.py, plans/sync_ext.py, plans/llmdata_r4.py,
plans/workloads_ext.py, plans/surface_ext.py) —
structural properties beyond the per-row oracle: Merkle drill-down pruning,
BFS frontier soundness, chunk coverage, prune/reassembly consistency, and
backfill batch integrity."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.graphs import (
    graph_bfs_levels,
    graph_pagerank,
    graph_triangle_stats,
)
from hdc_dataengineering_sqlsync_spark.plans.llmdata_r4 import (
    text_boilerplate_prune,
    text_chunk_overlap,
)
from hdc_dataengineering_sqlsync_spark.plans.surface_ext import stream_backfill_throttled
from hdc_dataengineering_sqlsync_spark.plans.sync_ext import sync_anti_entropy_merkle
from hdc_dataengineering_sqlsync_spark.registry import load


def test_merkle_descends_only_into_diff_subtrees(spark, sf_dir):
    """The anti-entropy contract: leaf (month) rows appear IFF their quarter
    differs — 'same' quarters prune their whole leaf fan-out — and every
    emitted diff quarter contains at least one emitted leaf explaining it;
    the root must be 'diff' iff any quarter is."""
    rows = sync_anti_entropy_merkle(spark, sf_dir).collect()
    by_lvl = {lvl: [r for r in rows if r.lvl == lvl] for lvl in (0, 1, 2)}
    assert len(by_lvl[0]) == 1 and by_lvl[0][0].node == "ALL"
    quarters = {r.node: r.status for r in by_lvl[1]}
    assert by_lvl[0][0].status == (
        "diff" if any(s == "diff" for s in quarters.values()) else "same"
    )
    # month -> quarter: node format 'YYYY-MM'
    def quarter_of(month_node: str) -> str:
        y, m = month_node.split("-")
        return f"{y}-Q{(int(m) - 1) // 3 + 1}"

    emitted_quarters = {quarter_of(r.node) for r in by_lvl[2]}
    diff_quarters = {q for q, s in quarters.items() if s == "diff"}
    # leaves appear only under diff quarters ...
    assert emitted_quarters <= diff_quarters
    # ... and every diff quarter is explained by >=1 differing leaf
    for q in diff_quarters:
        leaves = [r for r in by_lvl[2] if quarter_of(r.node) == q]
        assert leaves, f"diff quarter {q} emitted no leaves"
        assert any(r.status == "diff" for r in leaves), f"diff quarter {q} has no diff leaf"
    # count conservation up the tree (per side)
    assert sum(r.src_n for r in by_lvl[1]) == by_lvl[0][0].src_n
    assert sum(r.tgt_n for r in by_lvl[1]) == by_lvl[0][0].tgt_n


def test_bfs_levels_are_sound(spark, sf_dir):
    """Level 0 is exactly the source; every level-k node (k>=1) has an edge
    from some level-(k-1) node and none from any earlier level (else its
    level would be smaller) — the frontier invariant."""
    from hdc_dataengineering_sqlsync_spark.plans.graphs import _cs_edges

    def render(n: int) -> str:
        return f"C{n // 2}" if n % 2 == 0 else f"S{n // 2}"

    levels = {r.node: r.lvl for r in graph_bfs_levels(spark, sf_dir).collect()}
    edges = _cs_edges(spark, sf_dir).collect()
    nbrs: dict[str, set[str]] = {}
    for e in edges:
        nbrs.setdefault(render(e.dst), set()).add(render(e.src))
    sources = [n for n, l in levels.items() if l == 0]
    assert len(sources) == 1 and sources[0].startswith("S")
    for node, lvl in levels.items():
        if lvl == 0:
            continue
        in_lvls = {levels[s] for s in nbrs.get(node, set()) if s in levels}
        assert min(in_lvls) == lvl - 1, f"{node} at lvl {lvl} has in-levels {in_lvls}"


def test_pagerank_conserves_node_set_and_is_positive(spark, sf_dir):
    """Top-20 ranks are positive, strictly ordered by (rank desc, node), and
    bounded above by the theoretical max (a node receiving every unit of
    rank in the graph)."""
    from hdc_dataengineering_sqlsync_spark.plans.graphs import _cs_edges

    rows = graph_pagerank(spark, sf_dir).collect()
    assert len(rows) == 20
    n_nodes = _cs_edges(spark, sf_dir).select("src").distinct().count()
    total_rank_bound = 150000 + (85 * n_nodes * 1000000) // 100
    for a, b in zip(rows, rows[1:]):
        assert a.rank > b.rank or (a.rank == b.rank and a.node < b.node)
    assert all(0 < r.rank < total_rank_bound for r in rows)


def test_triangle_stats_internal_consistency(spark, sf_dir):
    """3·triangles <= wedges (each triangle closes exactly 3 wedges) and the
    edge/degree handshake sum holds."""
    row = graph_triangle_stats(spark, sf_dir).collect()[0]
    if row.n_edges == 0:
        return
    assert 3 * row.n_triangles <= row.n_wedges
    assert row.n_nodes >= 2


def test_chunk_overlap_covers_every_token(spark, sf_dir):
    """Every token index of every doc falls inside >=1 chunk window, chunk
    token counts are consistent with window/stride (32/24), and consecutive
    chunks overlap by exactly 8 tokens except after the tail."""
    import re

    chunks = text_chunk_overlap(spark, sf_dir).collect()
    # ASCII \s+ split WITHOUT dropping boundary empties — the exact token
    # semantics of the implementation's F.split(lower(text), '\s+')
    docs = {
        r.doc_id: len(re.split(r"[ \t\n\r\f\v]+", r.text.lower()))
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    per_doc: dict[int, list] = {}
    for c in chunks:
        per_doc.setdefault(c.doc_id, []).append(c)
    assert set(per_doc) == set(docs)
    for doc_id, nt in docs.items():
        cs = sorted(per_doc[doc_id], key=lambda c: c.chunk_id)
        covered = set()
        for c in cs:
            start = c.chunk_id * 24
            assert c.n_chunk_tokens == min(32, nt - start)
            covered.update(range(start, start + c.n_chunk_tokens))
        assert covered == set(range(nt)), f"doc {doc_id} coverage gap"


def test_boilerplate_prune_reassembly(spark, sf_dir):
    """Docs with zero pruned chunks must fingerprint to md5 of their full
    lowered token join; all-pruned docs fingerprint to md5(''); kept token
    counts never exceed the doc's token count."""
    import re

    out = {r.doc_id: r for r in text_boilerplate_prune(spark, sf_dir).collect()}
    docs = {
        r.doc_id: " ".join(re.split(r"[ \t\n\r\f\v]+", r.text.lower()))
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    assert set(out) == set(docs)
    empty_md5 = hashlib.md5(b"").hexdigest()
    n_unpruned = 0
    for doc_id, text in docs.items():
        r = out[doc_id]
        nt = len(text.split())
        assert 0 <= r.n_pruned <= r.n_chunks
        assert r.n_tokens_kept <= nt
        if r.n_pruned == 0:
            n_unpruned += 1
            assert r.n_tokens_kept == nt
            assert r.clean_hash == hashlib.md5(text.encode()).hexdigest()
        if r.n_pruned == r.n_chunks:
            assert r.n_tokens_kept == 0 and r.clean_hash == empty_md5
    assert n_unpruned > 0  # fixture sanity: pruning isn't total


def test_backfill_batches_partition_the_input(spark, sf_dir):
    """The throttled replay's batch counts must partition the event count
    exactly (no file merged, dropped, or double-read)."""
    rows = stream_backfill_throttled(spark, sf_dir).collect()
    total = load(spark, sf_dir, "events").count()
    assert sum(r.n_rows for r in rows) == total
    assert [r.batch_rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == 4


def test_ks_drift_bounds_and_self_zero(spark, sf_dir):
    """KS D lies in [0,1]; and the distributed-prefix-sum machinery must
    report EXACTLY zero when both sides are the same relation (the
    source-vs-source degenerate case — any nonzero would mean the cell
    offsets or within-cell cumsums are broken)."""
    from pyspark.sql import functions as F
    from hdc_dataengineering_sqlsync_spark.plans.exact_stats import dq_ks_drift

    row = dq_ks_drift(spark, sf_dir).collect()[0]
    assert 0.0 <= row.ks_stat <= 1.0
    assert row.n_src >= row.n_tgt  # target drops ~1/97 of keys

    # self-comparison: patch the target loader to the source
    import hdc_dataengineering_sqlsync_spark.plans.sync as sync_mod

    orig = sync_mod._target
    try:
        sync_mod._target = sync_mod._source
        import importlib
        from hdc_dataengineering_sqlsync_spark.plans import exact_stats as rb

        self_row = rb.dq_ks_drift(spark, sf_dir).collect()[0]
        assert self_row.ks_stat == 0.0
        assert self_row.n_src == self_row.n_tgt
    finally:
        sync_mod._target = orig


def test_interval_union_bounds(spark, sf_dir):
    """Per user: union length never exceeds n_intervals * 300s (disjoint
    upper bound), never goes below 300s (one interval minimum), and is
    strictly less than the disjoint bound for any user with two events
    closer than 5 minutes."""
    from hdc_dataengineering_sqlsync_spark.plans.surface_ext import (
        ts_interval_union_length,
    )

    rows = ts_interval_union_length(spark, sf_dir).collect()
    assert rows
    saw_merge = False
    for r in rows:
        assert 300_000_000 <= r.union_micros <= r.n_intervals * 300_000_000
        if r.union_micros < r.n_intervals * 300_000_000:
            saw_merge = True
    assert saw_merge, "fixture sanity: no overlapping intervals anywhere"


def test_uuid_layout_rfc4122(spark, sf_dir):
    """Minted UUIDs must parse as RFC 4122: version nibble 3, variant in
    {8,9,a,b}, 8-4-4-4-12 grouping — checked on the min/max exemplars the
    query emits per priority class."""
    import re

    from hdc_dataengineering_sqlsync_spark.plans.relational_ext import fn_uuid_deterministic

    pat = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$")
    for r in fn_uuid_deterministic(spark, sf_dir).collect():
        assert pat.match(r.min_uuid), r.min_uuid
        assert pat.match(r.max_uuid), r.max_uuid
        assert r.n == r.n_distinct  # unique keys -> unique uuids


def test_gini_and_stickiness_ranges(spark, sf_dir):
    from hdc_dataengineering_sqlsync_spark.plans.exact_stats import agg_gini_segment
    from hdc_dataengineering_sqlsync_spark.plans.workloads_ext import wl_dau_wau_stickiness

    for r in agg_gini_segment(spark, sf_dir).collect():
        assert 0.0 <= r.gini < 1.0
    for r in wl_dau_wau_stickiness(spark, sf_dir).collect():
        assert r.dau <= r.wau
        assert 0.0 < r.stickiness <= 1.0


def test_stream_sink_epoch_replace_removes_stale_files(spark, sf_dir, tmp_path):
    """The review-found replay hole: a dead attempt of an epoch may have
    committed MORE partition files than the replay plans; commit must
    replace the whole epoch-<id>-* namespace, not just overwrite its own
    indices. Seed a stale high-index epoch-0 file and verify the next
    epoch-0 commit removes it (and that readback sees only live rows)."""
    import os

    from hdc_dataengineering_sqlsync_spark.sources.pydatasource import (
        JsonLinesSinkDataSource,
    )

    spark.dataSource.register(JsonLinesSinkDataSource)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    stale = os.path.join(out, "epoch-main-00000000-99999.jsonl")
    with open(stale, "w") as f:
        f.write('{"v": 999999}\n')
    # a DIFFERENT stream's committed epoch + in-flight staging on the same
    # path must both survive this stream's commit (tag-scoped namespaces)
    foreign_epoch = os.path.join(out, "epoch-other-00000000-00000.jsonl")
    foreign_staged = os.path.join(out, "_stream_staged_other_deadbeef.jsonl")
    for p in (foreign_epoch, foreign_staged):
        with open(p, "w") as f:
            f.write('{"v": 777}\n')

    src = str(tmp_path / "src")
    spark.createDataFrame([(i,) for i in range(10)], "v long").coalesce(1).write.parquet(src)
    q = (
        spark.readStream.schema("v long")
        .parquet(src)
        .writeStream.format("jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert not os.path.exists(stale), "stale dead-attempt epoch file survived commit"
    assert os.path.exists(foreign_epoch), "concurrent stream's committed epoch deleted"
    assert os.path.exists(foreign_staged), "concurrent stream's staging deleted"
    os.remove(foreign_epoch)  # keep the readback assertion below exact
    back = spark.read.schema("v long").json(out, pathGlobFilter="epoch-*.jsonl")
    assert sorted(r.v for r in back.collect()) == list(range(10))


def test_exact_global_cum_matches_reference_on_random_data(spark):
    """Hypothesis property: the distributed prefix-sum (cells → driver
    offsets → per-cell windows) must equal the trivial single-threaded
    cumulative sum for ANY integer multiset — including adversarial cases
    (all values in one cell, one value per cell, duplicate-heavy, counts
    of zero rows absent). Tiny cell_width forces MANY cells so the
    offset-stitching is actually exercised."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from hdc_dataengineering_sqlsync_spark.operators.cdf import exact_global_cum

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(st.integers(min_value=-50, max_value=50), st.integers(1, 5)),
            min_size=1,
            max_size=30,
        ),
        st.sampled_from([1, 3, 1000]),  # one-value cells / small cells / one big cell
    )
    def prop(pairs, cell_width):
        # collapse duplicates into a census, as the operator requires
        census: dict[int, int] = {}
        for v, n in pairs:
            census[v] = census.get(v, 0) + n
        cdf_df = spark.createDataFrame(sorted(census.items()), "v long, n long")
        cum, totals = exact_global_cum(cdf_df, "v", ("n",), cell_width=cell_width)
        got = {r.v: r.n for r in cum.collect()}
        acc, want = 0, {}
        for v in sorted(census):
            acc += census[v]
            want[v] = acc
        assert got == want
        assert totals["n"] == acc

    prop()


def test_cs_edges_node_packing_invariant(spark, sf_dir):
    """r12 ADVICE: graph_pagerank's broadcast-hint gate bounds the node
    count by rowcount(customer) + rowcount(supplier), which is only valid
    while _cs_edges packs EVERY node id as 2*custkey or 2*suppkey+1. Pin
    the coupling: every node in the derived edge list must be one of those
    two forms over keys that exist in the dimensions, and the distinct
    node count must respect the bound."""
    from hdc_dataengineering_sqlsync_spark.plans.graphs import _cs_edges
    from hdc_dataengineering_sqlsync_spark.registry import load, rowcount

    edges = _cs_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("n")).unionAll(
        edges.select(F.col("dst").alias("n"))
    ).distinct()
    cust = load(spark, sf_dir, "customer").select((F.col("c_custkey") * 2).alias("n"))
    supp = load(spark, sf_dir, "supplier").select((F.col("s_suppkey") * 2 + 1).alias("n"))
    stray = nodes.join(cust.unionAll(supp).distinct(), "n", "left_anti").count()
    assert stray == 0, f"{stray} node id(s) outside the 2k/2k+1 dimension packing"
    assert nodes.count() <= rowcount(sf_dir, "customer") + rowcount(sf_dir, "supplier")
