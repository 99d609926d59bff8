"""Scale-stress probe: run the heavy catalog shapes at 1x (sf0.1) and Nx
(default 10x) replicated volume and emit STRESS_r{N}.json, so scale
regressions gate round-over-round like bench regressions (VERDICT r4 #8 —
promotes the ad-hoc 10x/30x probes recorded in SCALE.md to an artifact).

Usage: python scripts/stress_probe.py [--round=5] [--factor=10] [--runs=1]

Replica construction (deterministic, key-shifted — NOT naive duplication):
  volume  orders+lineitem with o_orderkey/l_orderkey shifted per replica
          (Nx rows, same dimension keys) — census/sync/basket shapes.
  graph   additionally shifts l_partkey per replica: Nx nodes AND Nx edges
          in the co-purchase graph — the pagerank/BFS/triangle family.
  docs    documents with per-replica doc_id shift and a per-replica salt
          token appended to text (so shingles differ across replicas, no
          pathological 100% dup rate); embeddings with shifted ids and
          UNCHANGED vectors (matches the r4 probe that exposed the
          fixed-K semantic-centroid cliff).
Untouched tables are copied from the base dir so any qid can run.

The per-qid stress verdict is the RATIO t_stress / t_base vs the replica
factor: ratio << factor means sublinear (volume collapses before the
expensive step), ratio ~ factor is linear, ratio >> factor is a cliff —
the semantic-centroid quadratic found in r4 showed ratio ~14 on factor 10.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# qid -> replica mode; the heavy families per SCALE.md / bench history
PROBE_SET: dict[str, str] = {
    "graph_pagerank": "graph",
    "graph_common_neighbors": "graph",
    "graph_triangle_stats": "graph",
    "dq_ks_drift": "volume",
    "agg_deciles_distributed": "volume",
    "dq_psi_drift": "volume",
    "sync_anti_entropy_merkle": "volume",
    "wl_basket_pairs": "volume",
    "wl_abc_pareto": "volume",
    "dedup_minhash_banded": "docs",
    "dedup_cluster_components": "docs",
    "dedup_semantic_centroid": "docs",
    # round-5 session-2 additions: new heavy/novel shapes under the gate
    "text_ngram_novelty": "docs",
    "dedup_recall_eval": "docs",
    "wl_fifo_inventory": "volume",
    "wl_seq_pattern_1h": "events",
    "wl_attribution_credit": "events",
    # round-5 session-3 additions
    "hier_closure_doubling": "customers",  # doubling self-joins over Nx keys
    "graph_assortativity_exact": "graph",  # exact-moment pass over Nx edges
    "text_cooccurrence_pmi": "docs",     # doc-keyed pair join fan-out
    "win_sessionize_gap": "events",      # per-user window over Nx histories
    "simsearch_kmeans_train": "docs",    # Nx sample vs fixed-K codebook
    # round-6 additions: the reworked dedup shapes plus new heavy machinery
    "simsearch_ivf_persisted": "docs",   # index write + DPP probe over Nx vectors
    "text_token_count_bpe": "docs",      # vocab-grain BPE — should be ~flat
    "wl_mannwhitney_u": "volume",        # value-census rank test over Nx rows
    "ts_theil_sen_slope": "volume",      # reduce-then-quadratic month pairs
    # round-7 additions: new heavy shapes
    "dedup_substring_coverage": "docs",  # window explode + dup-mass re-explode
    "simsearch_mutual_knn": "docs",      # label-blocked pair scan + rank window
    "graph_resource_allocation": "graph",  # incidence self-join fan-out
    # round-8 additions (VERDICT r7 #4): the sync-core and join heavies get
    # the same scrutiny that caught the mutual-kNN quadratic — plus the new
    # JPEG codec qid (per-image Python entropy work must stay linear)
    "sync_merge_apply": "volume",        # diff+merge round-trip over Nx orders
    "sync_snapshot_diff": "volume",      # full-outer digest diff over Nx orders
    "sync_partition_digest": "volume",   # partition-XOR digest fold over Nx orders
    "join_skew_salted": "volume",        # salted skew join: Nx fact vs same dims
    "win_range_frame": "volume",         # distinct-cell band join over Nx rows
    "agg_heavy_hitters_exact": "volume", # exact heavy-hitter census over Nx rows
    "multimodal_decode_jpeg": "docs",    # real JPEG roundtrip over Nx images
    # round-8 batch E/F/G shapes with scale-sensitive paths
    "text_dedup_segment_lines": "docs",  # segment explode + digest census join
    "join_pit_multi_asof": "events",     # 3-stream union window over Nx users
    "win_match_recognize_vshape": "volume",  # pattern windows over Nx rows
    "graph_katz_2step": "graph",         # edges x degree join over Nx nodes
    "multimodal_decode_tiff": "docs",    # IFD walk + strip stitch over Nx images
    # round-9 additions: the new scale-sensitive shapes
    "graph_jaccard_linkpred": "graph",   # customer-blocked pair self-join fan-out
    "multimodal_gif_animation": "docs",  # multi-frame LZW roundtrip per image
    "multimodal_histogram_eq": "docs",   # per-image bincount+remap over Nx images
    "wl_entity_resolution_tokenset": "customers",  # canonical-key join over Nx names
    "ts_twap_irregular": "events",       # per-user lead window over Nx histories
    "wl_segment_migration_matrix": "volume",  # two period aggs + FO join over Nx orders
    "multimodal_audio_stereo_balance": "docs",  # stereo interleave roundtrip per clip
    "ts_peak_prominence": "volume",      # daily-grain reduce + shared-sort windows
    "dedup_threshold_curve": "docs",     # blocked pair pass + threshold sweep
    "graph_two_hop_reach": "graph",      # distinct-count over blocked pair fan-out
    # round-9 session-2 additions (batches F-K)
    "wl_basket_triples": "volume",       # C(k,3) blocked triple fan-out over Nx orders
    "wl_newsvendor_quantile": "volume",  # quantity census + window over Nx rows
    "agg_winsorized_mean": "customers",  # balance census windows over Nx customers
    "hier_nested_set": "customers",      # recursion + prefix explode over Nx keys
    "wl_loss_dev_triangle": "volume",    # cell-grid reduce — should be ~flat
    "ts_holt_linear": "volume",          # reduce-then-recursion — should be ~flat
    "mix_length_bucketed_batching": "docs",  # bucket windows over Nx docs
    "wl_lift_gains_deciles": "customers",  # global ntile over Nx customers
    "multimodal_sobel_edges": "docs",    # per-image stencil over Nx images
    "multimodal_audio_zcr": "docs",      # per-clip PCM roundtrip over Nx clips
    "wl_rules_two_antecedent": "volume",  # pair+triple blocked fan-out over Nx orders
    "wl_skyline_3d": "volume",           # per-brand dominance anti-join, Nx demand reduce
    # round-10 additions: the plan-audit recompute fixes whose shape changed
    # structurally (checkpointed reductions; markov's self-join -> window lead)
    "graph_markov_4step": "events",      # per-user lead census -> checkpointed squarings
    "wl_event_funnel": "events",         # staged first-hit frames over Nx user histories
    "wl_dso_countback": "volume",        # month-grain walk over Nx fact rows
    "sketch_kmv_set_ops": "volume",      # bottom-k sketches over Nx-row distinct reduce
    "text_js_divergence_sources": "docs",  # one corpus explode -> vocab-grain rollups
    "sketch_bloom_membership": "docs",   # vocab build/probe over Nx docs
    "sync_schema_evolution_apply": "volume",  # diff join + checkpointed changeset
    "sync_range_join_bin_plan": "volume",  # interval census -> checkpointed percentile
    "dedup_near_jaccard": "docs",        # df-capped blocked pair pass (shared operator)
    # round-12 additions (VERDICT r11 #2): never-x100-probed heavy shapes
    "simsearch_pq_adc": "docs",          # PQ codebook train + ADC scan over Nx vectors
    "sync_zorder_layout": "volume",      # z-order interleave + range layout over Nx rows
}

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build_replica(spark, mode: str, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return
    os.makedirs(out_dir, exist_ok=True)

    def base(name):
        return spark.read.parquet(os.path.join(BASE_SF, f"{name}.parquet"))

    replicated: dict[str, object] = {}
    rep = spark.range(factor).select(F.col("id").cast("long").alias("rep"))

    if mode in ("volume", "graph"):
        okey_span = base("orders").agg(F.max("o_orderkey")).collect()[0][0] + 1
        o = base("orders").crossJoin(F.broadcast(rep)).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("rep") * okey_span
        ).drop("rep")
        li = base("lineitem").crossJoin(F.broadcast(rep)).withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("rep") * okey_span
        )
        if mode == "graph":
            pkey_span = base("part").agg(F.max("p_partkey")).collect()[0][0] + 1
            li = li.withColumn("l_partkey", F.col("l_partkey") + F.col("rep") * pkey_span)
        replicated["orders"] = o
        replicated["lineitem"] = li.drop("rep")
    elif mode == "events":
        # Nx events AND Nx users (per-replica user shift): per-user history
        # length stays constant, so user-partitioned windows/joins are
        # probed on MORE partitions, not pathologically longer ones —
        # the realistic growth axis for an event log.
        evid_span = base("events").agg(F.max("event_id")).collect()[0][0] + 1
        uid_span = base("events").agg(F.max("user_id")).collect()[0][0] + 1
        replicated["events"] = (
            base("events")
            .crossJoin(F.broadcast(rep))
            .withColumn("event_id", F.col("event_id") + F.col("rep") * evid_span)
            .withColumn("user_id", F.col("user_id") + F.col("rep") * uid_span)
            .drop("rep")
        )
    elif mode == "customers":
        # Nx customers with shifted keys: the synthetic parent(k)=k DIV 10
        # hierarchy gets Nx nodes and (for shifted replicas) deeper key
        # ranges — the closure's doubling rounds see a strictly larger
        # pair table per round.
        ckey_span = base("customer").agg(F.max("c_custkey")).collect()[0][0] + 1
        replicated["customer"] = (
            base("customer")
            .crossJoin(F.broadcast(rep))
            .withColumn("c_custkey", F.col("c_custkey") + F.col("rep") * ckey_span)
            .drop("rep")
        )
    elif mode == "docs":
        did_span = base("documents").agg(F.max("doc_id")).collect()[0][0] + 1
        replicated["documents"] = (
            base("documents")
            .crossJoin(F.broadcast(rep))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * did_span)
            .withColumn("text", F.concat(F.col("text"), F.lit(" rep"), F.col("rep")))
            .drop("rep")
        )
        eid_span = base("embeddings").agg(F.max("vec_id")).collect()[0][0] + 1
        replicated["embeddings"] = (
            base("embeddings")
            .crossJoin(F.broadcast(rep))
            .withColumn("vec_id", F.col("vec_id") + F.col("rep") * eid_span)
            .drop("rep")
        )

    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if name in replicated:
            replicated[name].repartition(32).write.mode("overwrite").parquet(dst)
        elif not os.path.exists(dst):
            src = os.path.join(BASE_SF, f"{name}.parquet")
            # testdata tables are single parquet FILES, not directories
            (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, dst)
    open(os.path.join(out_dir, "_DONE"), "w").write("ok\n")


def main() -> int:
    rnd, factor, runs, only, tag, sink = 0, 10, 1, None, "", "collect"
    for a in sys.argv[1:]:
        if a.startswith("--round="):
            rnd = int(a.split("=")[1])
        elif a.startswith("--factor="):
            factor = int(a.split("=")[1])
        elif a.startswith("--runs="):
            runs = int(a.split("=")[1])
        elif a.startswith("--only="):
            only = set(a.split("=")[1].split(","))
        elif a.startswith("--tag="):
            tag = "_" + a.split("=")[1]
        elif a.startswith("--sink="):
            # collect: the driver-contract shape (but for fact-sized outputs
            #   the x100 wall measures the DRIVER collect, not the engine —
            #   the r11 win_range_frame arbitration).
            # noop: write.format("noop") — computes every output column
            #   distributed, materializes nothing on the driver; unlike
            #   count(), column pruning cannot elide window/UDF work whose
            #   output is part of the result. The engine-cost yardstick.
            sink = a.split("=")[1]
            if sink not in ("collect", "noop"):
                sys.exit(f"--sink must be collect or noop, got {sink}")
        else:
            sys.exit(f"unknown arg {a}")

    from hdc_dataengineering_sqlsync_spark.plans import CATALOG
    from hdc_dataengineering_sqlsync_spark.session import get_session

    spark = get_session(app_name="stress_probe")
    spark.sparkContext.setLogLevel("ERROR")

    probe_set = {q: m for q, m in PROBE_SET.items() if only is None or q in only}
    if only and set(probe_set) != only:
        sys.exit(f"unknown qids in --only: {sorted(only - set(probe_set))}")
    modes = sorted({m for m in probe_set.values()})
    dirs = {}
    for m in modes:
        d = f"/tmp/hdc_stress_x{factor}_{m}"
        print(f"building {m} replica at {d} ...", file=sys.stderr)
        t0 = time.time()
        build_replica(spark, m, factor, d)
        print(f"  {time.time() - t0:.1f}s", file=sys.stderr)
        dirs[m] = d

    def timed(fn, sf_dir):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    out = {}
    for qid, mode in probe_set.items():
        fn = CATALOG[qid].fn
        t_base = timed(fn, BASE_SF)
        t_stress = timed(fn, dirs[mode])
        ratio = round(t_stress / t_base, 2) if t_base else None
        out[qid] = {
            "mode": mode,
            "t_base": t_base,
            "t_stress": t_stress,
            "ratio": ratio,
            # cost-per-row multiple at Nx data: ratio/factor. < 1.0 means the
            # per-row cost FELL with scale (sublinear per row — the verdict
            # that matters for 100 TB); ~1.0 is linear; > 1.0 is a cliff.
            "per_row_ratio": round(ratio / factor, 3) if ratio is not None else None,
        }
        ratio_s = f"{ratio}x" if ratio is not None else "n/a"
        prr = out[qid]["per_row_ratio"]
        prr_s = f"{prr}x" if prr is not None else "n/a"
        print(
            f"  {qid:28s} {t_base:7.2f}s -> {t_stress:7.2f}s  "
            f"({ratio_s} wall on {factor}x data = {prr_s} per row)",
            file=sys.stderr,
        )

    payload = {
        "factor": factor,
        "base_sf_dir": BASE_SF,
        "runs": runs,
        "sink": sink,
        "queries": out,
    }
    path = os.path.join(REPO, f"STRESS_r{rnd:02d}{tag}.json" if rnd else f"STRESS{tag}.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
