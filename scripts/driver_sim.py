"""Simulate the driver's verify pass against the real contract surface.

Imports ``__spark_entry__`` exactly as the driver does, smoke-runs
``entry(spark)``, then runs every ``queries()[qid]`` at the given sf dir and
compares against ``oracle_sql()[qid]`` in DuckDB (row-count + schema +
order-insensitive values). Prints one line per qid and a summary; exit 1 on
any mismatch.

Usage: python scripts/driver_sim.py [--vanilla] [--only=qid1,qid2]
           [--sample=N] [--seed=S] [sf_dir]
       (default sf_dir /root/testdata/sf0.01)

``--only=`` restricts the sweep to a comma-separated qid subset — the
fast per-change gate (changed qids at sf0.001/0.01/0.1) before the full
pre-commit sweep; unknown qids in the list fail loudly.

``--sample=N`` (r11, per the r10 verdict's stretch item) draws N random
qids from the FULL catalog at full typed fidelity — the per-commit drift
net for UNCHANGED qids: a shared-helper edit that silently shifts an
untouched query's output is caught here instead of at the end-of-round
full sweep. The seed defaults to the current git HEAD hash, so the draw
is reproducible for a given commit but rotates across commits; override
with ``--seed=``. Composes with ``--only=`` (sample is drawn from the
restricted set). Per-commit form: ``python scripts/driver_sim.py
--vanilla --sample=20 /root/testdata/sf0.001``.

``--vanilla`` builds a bare ``SparkSession.builder.master("local[*]")``
session with NONE of session.py's confs — the same environment the external
driver runs in. Round 3 proved why this matters: two Python-DataSource qids
passed every local check under ``get_session()`` (which enables
``spark.sql.python.filterPushdown.enabled``) and then errored in the
driver's plain session. The vanilla sweep is the pre-submission gate; any
conf a query needs must be set inside that query's own function.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

flags = {a for a in sys.argv[1:] if a.startswith("--")}
argv = [a for a in sys.argv[1:] if not a.startswith("--")]
ONLY: set[str] | None = None
SAMPLE: int | None = None
SEED: str | None = None
for f in list(flags):
    if f.startswith("--only="):
        ONLY = {q for q in f[len("--only="):].split(",") if q}
        flags.discard(f)
    elif f.startswith("--sample="):
        SAMPLE = int(f[len("--sample="):])
        flags.discard(f)
    elif f.startswith("--seed="):
        SEED = f[len("--seed="):]
        flags.discard(f)
_KNOWN = {"--vanilla", "--exec-only"}
if flags - _KNOWN:
    # a silently-swallowed typo ('--vanila') would run the WRONG gate and
    # defeat the whole pre-submission environment check — fail loudly
    sys.exit(f"driver_sim: unknown flag(s) {sorted(flags - _KNOWN)}; known: {sorted(_KNOWN)}")
VANILLA = "--vanilla" in flags
EXEC_ONLY = "--exec-only" in flags  # run + collect every fn, skip the oracle
SF_DIR = argv[0] if argv else "/root/testdata/sf0.01"

import __spark_entry__ as entry_mod
from hdc_dataengineering_sqlsync_spark.testing import (
    compare_results,
    duckdb_connect,
    duckdb_result,
    spark_result,
    type_mismatches,
)


def make_session():
    if VANILLA:
        from pyspark.sql import SparkSession

        return SparkSession.builder.master("local[*]").appName("driver_sim_vanilla").getOrCreate()
    from hdc_dataengineering_sqlsync_spark.session import get_session

    return get_session(app_name="driver_sim")


def main() -> int:
    spark = make_session()
    spark.sparkContext.setLogLevel("ERROR")
    print(f"session: {'VANILLA (driver-like, no session.py confs)' if VANILLA else 'get_session()'}")
    con = duckdb_connect(SF_DIR)

    t0 = time.time()
    n = entry_mod.entry(spark).count()
    print(f"entry(): {n} rows in {time.time() - t0:.2f}s " + ("OK" if n > 0 else "FAIL (0 rows)"))

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if ONLY is not None:
        unknown = ONLY - set(qs)
        if unknown:
            sys.exit(f"driver_sim: --only names unknown qid(s) {sorted(unknown)}")
        qs = {qid: fn for qid, fn in qs.items() if qid in ONLY}
    if SAMPLE is not None:
        import random
        import subprocess

        seed = SEED
        if seed is None:
            # per-commit-deterministic, rotating across commits: the drift
            # net covers a DIFFERENT random 20 qids on every commit
            seed = subprocess.run(
                ["git", "-C", REPO, "rev-parse", "HEAD"],
                capture_output=True, text=True, check=True,
            ).stdout.strip()
        picked = random.Random(seed).sample(sorted(qs), min(SAMPLE, len(qs)))
        print(f"sample: {len(picked)} qids, seed={seed[:12]}")
        qs = {qid: qs[qid] for qid in picked}
    failures: list[str] = []
    for qid in sorted(qs):
        t0 = time.time()
        try:
            df = qs[qid](spark, SF_DIR)
            sc, sr = spark_result(df)
            if EXEC_ONLY:
                status = f"ran ({len(sr)} rows)"
                problems = []
            elif qid in oracles:
                dc, dr, dtypes = duckdb_result(con, oracles[qid])
                problems = type_mismatches(df.schema, dc, dtypes) + compare_results(
                    sc, sr, dc, dr
                )
                status = "MATCH" if not problems else "MISMATCH: " + "; ".join(problems)
            else:
                status = f"rows-only ({len(sr)} rows)"
                problems = []
        except Exception:
            problems = ["exception"]
            status = "ERROR:\n" + traceback.format_exc()
        dt = time.time() - t0
        print(f"{qid:32s} {dt:6.2f}s  {status}")
        if problems:
            failures.append(qid)

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries OK at {SF_DIR}"
          + (f"; FAILED: {failures}" if failures else ""))
    return 1 if (failures or n == 0) else 0


if __name__ == "__main__":
    sys.exit(main())
