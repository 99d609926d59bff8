"""Full-catalog physical-plan audit (r10): the scale smells, counted.

For every declared qid, build the plan at sf0.001 and count the operators
that decide 100 TB behavior:

  - ``scans``      — `Scan parquet` operators. A plan whose fact-scan subtree
                     is recomputed (no cache/checkpoint over a reused frame)
                     shows the same scan N times; each repeat is a full extra
                     pass over the fact table at scale.
  - ``bnlj``       — BroadcastNestedLoopJoin. Benign ONLY for 1-row/tiny
                     broadcast scalar attaches (the crossJoin(broadcast(...))
                     pattern); anything else is a quadratic join.
  - ``cartesian``  — CartesianProduct: never acceptable on fact-sized inputs.
  - ``rangepart``  — `Exchange rangepartitioning`: global sorts. One for a
                     final presentation ORDER BY is fine; more usually means
                     a window/sort that should have been partition-keyed.
  - ``exchanges``  — total shuffles (context, not a gate).

Writes PLAN_AUDIT_r{N}.json with per-qid counters plus a ``flagged`` section
(>= 3 scans of the SAME table — breadth across different tables is a wide
join, not a smell; 2 of one table is usually a self-join — or any
cartesian). BNLJ sites are listed for eyeball review, not auto-flagged,
because the 1-row scalar-attach pattern is legitimate and common.

Usage: python scripts/plan_audit.py [sf_dir] [round_tag]

The r10 pass found and fixed 14 recompute shapes (SCALE.md round-10
section); run this after any round that adds or reworks multi-consumer
reductions.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hdc_dataengineering_sqlsync_spark.plans import CATALOG
from hdc_dataengineering_sqlsync_spark.session import get_session

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def audit_plan(plan: str) -> dict:
    # Per-table scan census: N scans of 6 DIFFERENT tables is a wide join
    # (fine); >=3 scans of the SAME table is the recompute smell — a reused
    # frame whose subtree Spark re-derives because nothing materialized it.
    # (2 of the same table is usually a legitimate self-join.)
    tables: dict[str, int] = {}
    for loc in re.findall(r"Location: \S+ \[[^\]]*/([A-Za-z0-9_.-]+)\]", plan):
        name = loc.removesuffix(".parquet")
        tables[name] = tables.get(name, 0) + 1
    return {
        "scans": len(re.findall(r"\(\d+\) Scan parquet", plan)),
        "same_table_max": max(tables.values(), default=0),
        "tables": tables,
        "bnlj": len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"\(\d+\) CartesianProduct", plan)),
        "rangepart": len(re.findall(r"Exchange rangepartitioning", plan)),
        "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
    }


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    tag = sys.argv[2] if len(sys.argv) > 2 else "r10"
    spark = get_session(app_name="plan_audit")
    rows: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for qid in sorted(CATALOG):
        try:
            df = CATALOG[qid].fn(spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            rows[qid] = audit_plan(buf.getvalue())
        except Exception as exc:  # audit must cover the catalog even if one fn dies
            errors[qid] = f"{type(exc).__name__}: {exc}"[:200]
        print(f"{qid}: {rows.get(qid) or errors.get(qid)}", file=sys.stderr)

    flagged = sorted(
        q for q, r in rows.items() if r["same_table_max"] >= 3 or r["cartesian"] > 0
    )
    bnlj_sites = sorted(q for q, r in rows.items() if r["bnlj"] > 0)
    out = {
        "sf_dir": sf,
        "qids_audited": len(rows),
        "errors": errors,
        "flagged_same_table_ge3_or_cartesian": flagged,
        "bnlj_sites_for_review": bnlj_sites,
        "per_qid": rows,
    }
    path = os.path.join(REPO, f"PLAN_AUDIT_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"{len(rows)} audited, {len(errors)} errors, "
          f"{len(flagged)} flagged, {len(bnlj_sites)} bnlj sites -> {path}")


if __name__ == "__main__":
    main()
