"""Benchmark harness (BASELINE.md protocol).

Runs the starred query families (Query.bench flags in the catalog; 14 as of
round 2) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]: one discarded warm-up + median of N timed runs per
query, wall-clock to a fully materialized result (collect).

Prints exactly ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {qid: median_sec, ...}, "sf": ...}

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_RUNS (default 5),
BENCH_DUCKDB=1 adds the DuckDB yardstick timings (stderr, not the JSON line).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hdc_dataengineering_sqlsync_spark.plans import CATALOG
from hdc_dataengineering_sqlsync_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_RUNS", "5"))

# Host-factor yardstick (r11, per the r10 verdict): three fixed bench-set
# oracles re-timed in DuckDB every run, divided by the r1 anchor box's
# DuckDB column in BASELINE.md. DuckDB is single-threaded, Spark-free code
# reading the same parquet — if it reads slow, the HOST is slower than the
# anchor box, not the engine; anchor comparisons divide by this factor
# before gate arithmetic (policy paragraph in BASELINE.md). The three are
# the bench set's LARGEST DuckDB times (0.2-0.5s — above timer noise).
_HOST_YARDSTICK = {
    "win_range_frame": 0.469,
    "graph_pagerank": 0.512,
    "text_unigram_logprob": 0.203,
}


def _sf_from_dir(sf_dir: str) -> float:
    tail = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(tail.removeprefix("sf"))
    except ValueError:
        return -1.0


def time_query(spark, fn, sf_dir: str, runs: int) -> float:
    times = []
    for i in range(runs + 1):  # first run is the discarded warm-up
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)
    return statistics.median(times)


def _proc_count() -> int:
    """Number of live processes on the box (contention witness)."""
    try:
        return sum(1 for p in os.listdir("/proc") if p.isdigit())
    except OSError:
        return -1


def _cpu_ticks() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from /proc/stat — the VM-neighbor witness.

    loadavg only sees THIS box's runqueue; on a shared host the contamination
    that actually skews timings is hypervisor steal, so the JSON stamps the
    steal share measured across the whole run."""
    try:
        fields = open("/proc/stat").readline().split()[1:]
        vals = [int(v) for v in fields[:8]]
        return vals[7], sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def main() -> None:
    bench_set = {qid: q for qid, q in CATALOG.items() if q.bench}
    # Contamination stamp (r9 verdict): BENCH_r09 was measured on a busy box
    # and read as a false 2.13x anchor breach. Record 1-minute loadavg and
    # process count before/after so a contaminated run is self-evident —
    # anchors are only comparable when loadavg_before is ~0 (idle box).
    load_before = os.getloadavg()[0]
    procs_before = _proc_count()
    ticks_before = _cpu_ticks()
    spark = get_session(app_name="bench")

    medians: dict[str, float] = {}
    for qid in sorted(bench_set):
        medians[qid] = round(time_query(spark, bench_set[qid].fn, SF_DIR, RUNS), 4)
        # r13 (VERDICT r12 #5): a compute-only second timing — one noop-sink
        # run (guide §1.4) AFTER the timed collect runs, stderr-only. For
        # collect-bound shapes (win_range_frame: ~75% of its bench time is
        # materializing 600k rows into driver Python objects) this separates
        # engine drift from driver-materialization cost round over round.
        # DIAGNOSTIC ONLY: the JSON line's medians above stay collect-based
        # and byte-identical in methodology to every prior round.
        try:
            t0 = time.perf_counter()
            bench_set[qid].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            noop_s = time.perf_counter() - t0
            print(
                f"  {qid}: {medians[qid]:.3f}s (compute-only noop {noop_s:.3f}s)",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001 — diagnostics never abort the bench
            print(f"  {qid}: {medians[qid]:.3f}s (noop probe failed: {exc!r})",
                  file=sys.stderr)

    if os.environ.get("BENCH_DUCKDB"):
        import duckdb  # yardstick: same SQL, same files, same machine

        from hdc_dataengineering_sqlsync_spark.testing import duckdb_connect

        con = duckdb_connect(SF_DIR)
        for qid in sorted(bench_set):
            oracle = bench_set[qid].oracle
            if not oracle:
                continue
            times = []
            for i in range(RUNS + 1):
                t0 = time.perf_counter()
                con.execute(oracle).fetchall()
                if i > 0:
                    times.append(time.perf_counter() - t0)
            print(f"  duckdb {qid}: {statistics.median(times):.3f}s", file=sys.stderr)

    host_factor = None
    if _sf_from_dir(SF_DIR) == 0.1:  # yardstick anchors are sf0.1 numbers
        # best-effort: the yardstick is diagnostic metadata, not a gate —
        # a missing duckdb or a failed oracle degrades to null, never
        # aborts the bench before its JSON line is emitted (r12 ADVICE)
        try:
            import math

            import duckdb  # noqa: F401  (import probe before opening a connection)

            from hdc_dataengineering_sqlsync_spark.testing import duckdb_connect

            ycon = duckdb_connect(SF_DIR)
            ratios = []
            for yqid, ref_sec in _HOST_YARDSTICK.items():
                oracle = CATALOG[yqid].oracle
                times = []
                for i in range(4):  # warm-up + median of 3: ~5s total overhead
                    t0 = time.perf_counter()
                    ycon.execute(oracle).fetchall()
                    if i > 0:
                        times.append(time.perf_counter() - t0)
                ratios.append(statistics.median(times) / ref_sec)
                print(f"  yardstick {yqid}: {statistics.median(times):.3f}s "
                      f"({ratios[-1]:.2f}x anchor box)", file=sys.stderr)
            host_factor = round(
                math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 3
            )
        except Exception as exc:  # noqa: BLE001
            print(f"  yardstick unavailable ({exc!r}); "
                  "duckdb_host_factor=null", file=sys.stderr)
            host_factor = None

    ticks_after = _cpu_ticks()
    steal_pct = None
    if ticks_before and ticks_after and ticks_after[1] > ticks_before[1]:
        steal_pct = round(
            100.0 * (ticks_after[0] - ticks_before[0]) / (ticks_after[1] - ticks_before[1]), 2
        )

    total = round(sum(medians.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_set_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": medians,
                "sf": _sf_from_dir(SF_DIR),
                "qps": round(len(medians) / total, 4) if total else None,
                "runs_per_query": RUNS,
                "loadavg_before": round(load_before, 2),
                "loadavg_after": round(os.getloadavg()[0], 2),
                "procs_before": procs_before,
                "procs_after": _proc_count(),
                "steal_pct": steal_pct,
                "duckdb_host_factor": host_factor,
            }
        )
    )


if __name__ == "__main__":
    main()
