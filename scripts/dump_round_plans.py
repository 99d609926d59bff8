"""Dump per-query `.explain("formatted")` output for the optimization-round
plan evidence (plans/r<N>/<qid>_<tag>.txt).

Usage:
    python scripts/dump_round_plans.py --round=12 --tag=before [qid ...]

With no qids, dumps every bench-starred query. Each query is collect()ed
first so AQE finalizes and the captured plan is the executed one (same
convention as scripts/dump_plans.py / PLANS.md).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hdc_dataengineering_sqlsync_spark.plans import CATALOG
from hdc_dataengineering_sqlsync_spark.session import get_session


def main() -> None:
    rnd, tag, qids = "12", "before", []
    for arg in sys.argv[1:]:
        if arg.startswith("--round="):
            rnd = arg.split("=", 1)[1]
        elif arg.startswith("--tag="):
            tag = arg.split("=", 1)[1]
        else:
            qids.append(arg)
    if not qids:
        qids = sorted(q for q, v in CATALOG.items() if v.bench)

    out_dir = os.path.join(REPO, "plans", f"r{rnd}")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name=f"plan_dump_r{rnd}")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for qid in qids:
        spark.sparkContext.setJobDescription(f"plan_dump {qid}")
        df = CATALOG[qid].fn(spark, sf)
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        for attr, label in (
            ("_sort_reduction_child", "sort_reduction child (pre-checkpoint subtree)"),
            ("_audit_extra_child", "checkpoint-hidden branch (pre-checkpoint subtree)"),
        ):
            child = getattr(df, attr, None)
            if child is not None:
                # append the stashed pre-checkpoint child where the real
                # scan/codec subtree lives (see plan_audit.py for the two
                # stash flavors)
                buf.write(f"\n--- {label} ---\n\n")
                with contextlib.redirect_stdout(buf):
                    child.explain("formatted")
        path = os.path.join(out_dir, f"{qid}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
