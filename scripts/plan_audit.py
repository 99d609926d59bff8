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

Usage:
    python scripts/plan_audit.py [sf_dir] [round_tag]
    python scripts/plan_audit.py --diff=PLAN_AUDIT_rPREV.json [sf_dir] [tag]
    python scripts/plan_audit.py --diff-only OLD.json NEW.json

``--diff`` (r11, per the r10 verdict): after writing PLAN_AUDIT_{tag}.json,
compare per-qid against the named baseline audit and exit 1 if any qid's
same-table scan multiplicity, BNLJ count, or cartesian count GREW, or a new
qid arrives already flagged — growth must be adjudicated in SCALE.md before
it lands. Improvements and benign drift (fewer scans/exchanges) pass.
``--diff-only`` compares two existing audit files without building plans
(no Spark) — the cheap per-commit form once the round's audit exists.

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


# Adjudicated growth (the SCALE.md escape hatch the r11 gate doc promised):
# {qid: {counter: ceiling}} — growth up to the ceiling passes the diff, with
# the reason recorded HERE and in SCALE.md. Each entry must name the round
# that accepted it. Anything beyond the ceiling still fails.
ACCEPTED_GROWTH: dict[str, dict[str, int]] = {
    # r12: shingle_jaccard_pairs switched its uncapped shingle table from
    # localCheckpoint (lineage-truncating, not fault-tolerant) to
    # persist(MEMORY_AND_DISK)+count. The checkpoint had removed the
    # documents scan from the printed plan entirely (0 scans); the persist
    # keeps lineage, so the ONE scan inside the InMemoryRelation subtree is
    # visible again. Execution still reads the parquet once (cache hit on
    # all three consumers) — the counter growth is a printing artifact of
    # the safer materialization, not a recompute. SCALE.md round-12.
    "dedup_shingle_jaccard": {"same_table_max": 1},
    "dedup_recall_eval": {"same_table_max": 1},
    # r13: win_range_frame / text_token_count_bpe stash their checkpointed
    # reduction's pre-checkpoint child as `_audit_extra_child`, so the audit
    # again SEES the one fact scan the lazy checkpoint had hidden since
    # r11/r12 (rows were scans=0/tables={}). Execution is unchanged — the
    # growth is the audit becoming honest about the same plan, not a new
    # pass over the data. SCALE.md round-13.
    "win_range_frame": {"same_table_max": 1},
    # "scans": 0 adjudicates the HISTORICAL r11 -> r12 opaque transition
    # (the r12 BPE rework's wc checkpoint dropped the audit row to scans=0;
    # the r13 stash makes it visible again, so r12 -> r13 is pure growth
    # back to honest counts). The committed-audit diff test replays the
    # last two rounds' files, so the old transition must stay adjudicated.
    "text_token_count_bpe": {"same_table_max": 1, "scans": 0},
}


def diff_audits(old: dict, new: dict) -> list[str]:
    """Regressions in ``new`` vs the accepted baseline ``old``: any growth in
    the gated counters (same_table_max, bnlj, cartesian) per qid, any qid
    arriving already flagged, and any audit error. Shrinkage and exchange
    drift are benign; growth listed in ``ACCEPTED_GROWTH`` (adjudicated in
    SCALE.md) passes up to its ceiling. Returns one human-readable line per
    regression."""
    bad: list[str] = []
    old_q, new_q = old["per_qid"], new["per_qid"]
    for qid, row in sorted(new_q.items()):
        base = old_q.get(qid)
        if base is None:
            if row["same_table_max"] >= 3 or row["cartesian"] > 0:
                bad.append(f"{qid}: NEW qid lands flagged ({row['tables']}, cartesian={row['cartesian']}) — adjudicate in SCALE.md")
            continue
        for key in ("same_table_max", "bnlj", "cartesian"):
            if row[key] > base[key]:
                if row[key] <= ACCEPTED_GROWTH.get(qid, {}).get(key, -1):
                    continue  # adjudicated (see ACCEPTED_GROWTH + SCALE.md)
                bad.append(f"{qid}: {key} grew {base[key]} -> {row[key]} (tables={row['tables']})")
        # a qid whose parquet scans DROP TO ZERO went opaque (a checkpoint
        # now hides the real subtree — e.g. a sort_reduction frame whose
        # _sort_reduction_child stash got dropped by a later transformation):
        # that must be adjudicated like growth, not pass as shrinkage (r12
        # ADVICE: fail loudly instead of silently auditing the opaque frame)
        if base.get("scans", 0) > 0 and row.get("scans", 0) == 0:
            if "scans" not in ACCEPTED_GROWTH.get(qid, {}):
                bad.append(
                    f"{qid}: plan went OPAQUE (scans {base['scans']} -> 0; "
                    "checkpoint hides the subtree — stash/audit the child or adjudicate)"
                )
    for qid, err in sorted(new.get("errors", {}).items()):
        bad.append(f"{qid}: audit error {err}")
    return bad


def run_diff(old_path: str, new: dict) -> None:
    with open(old_path) as f:
        old = json.load(f)
    bad = diff_audits(old, new)
    if bad:
        print(f"plan-audit diff vs {os.path.basename(old_path)}: {len(bad)} regression(s)")
        for line in bad:
            print(f"  {line}")
        sys.exit(1)
    print(f"plan-audit diff clean vs {os.path.basename(old_path)} ({new['qids_audited']} qids)")


def main() -> None:
    argv = list(sys.argv[1:])
    if argv and argv[0] == "--diff-only":
        with open(argv[2]) as f:
            run_diff(argv[1], json.load(f))
        return
    diff_base = None
    if argv and argv[0].startswith("--diff="):
        diff_base = argv.pop(0)[len("--diff="):]
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.001"
    tag = argv[1] if len(argv) > 1 else "r10"
    spark = get_session(app_name="plan_audit")
    rows: dict[str, dict] = {}
    errors: dict[str, str] = {}
    def _formatted(df) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    for qid in sorted(CATALOG):
        try:
            df = CATALOG[qid].fn(spark, sf)
            # Checkpoint-bearing qids (r12/r13): audit the DECLARED frame
            # (the executed sort/exchange above the checkpoint) PLUS the
            # stashed pre-checkpoint child, where the real scan/codec
            # subtree lives — counters sum across both plans (the declared
            # side has zero parquet scans for the hidden branch, so scan
            # multiplicity stays the child's; the final range-partition
            # exchange stays visible) and the row is annotated so rounds
            # stay comparable (r12 ADVICE). Two stash flavors, same audit
            # treatment: `_sort_reduction_child` (declared plan is opaque,
            # child is the whole real shape — tests/dump_plans substitute
            # it) and `_audit_extra_child` (declared plan is real, child is
            # only the checkpoint-hidden branch — appended, never
            # substituted).
            row = audit_plan(_formatted(df))
            for attr in ("_sort_reduction_child", "_audit_extra_child"):
                child = getattr(df, attr, None)
                if child is None:
                    continue
                crow = audit_plan(_formatted(child))
                for key in ("scans", "bnlj", "cartesian", "rangepart", "exchanges"):
                    row[key] += crow[key]
                for t, n in crow["tables"].items():
                    row["tables"][t] = row["tables"].get(t, 0) + n
                row["same_table_max"] = max(row["tables"].values(), default=0)
                row[attr.lstrip("_")] = True
            rows[qid] = row
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
    if diff_base:
        run_diff(diff_base, out)


if __name__ == "__main__":
    main()
