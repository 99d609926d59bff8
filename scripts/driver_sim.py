"""Simulate the driver's verify pass against the real contract surface.

Imports ``__spark_entry__`` exactly as the driver does, smoke-runs
``entry(spark)``, then runs every ``queries()[qid]`` at the given sf dir and
compares against ``oracle_sql()[qid]`` in DuckDB (row-count + schema +
order-insensitive values). Prints one line per qid and a summary; exit 1 on
any mismatch.

Usage: python scripts/driver_sim.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

import __spark_entry__ as entry_mod
from hdc_dataengineering_sqlsync_spark.session import get_session
from hdc_dataengineering_sqlsync_spark.testing import (
    compare_results,
    duckdb_connect,
    duckdb_result,
    spark_result,
)


def main() -> int:
    spark = get_session(app_name="driver_sim")
    con = duckdb_connect(SF_DIR)

    t0 = time.time()
    n = entry_mod.entry(spark).count()
    print(f"entry(): {n} rows in {time.time() - t0:.2f}s " + ("OK" if n > 0 else "FAIL (0 rows)"))

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures: list[str] = []
    for qid in sorted(qs):
        t0 = time.time()
        try:
            df = qs[qid](spark, SF_DIR)
            sc, sr = spark_result(df)
            if qid in oracles:
                dc, dr = duckdb_result(con, oracles[qid])
                problems = compare_results(sc, sr, dc, dr)
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
