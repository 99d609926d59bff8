"""Rebuild driver_coverage.json from the committed CORRECTNESS_r*.json files.

The external correctness driver verifies only the first ~50 qids of
``__spark_entry__.queries()`` per round, in registration order. To guarantee
every declared qid eventually gets a hard driver row (rather than relying on
the local full-catalog ``driver_sim.py`` alone), registration order is derived
from a checkpoint ledger of what the driver has already verified — see
``hdc_dataengineering_sqlsync_spark/plans/__init__.py``.

This script is that ledger's single source of truth: it folds every
``CORRECTNESS_r*.json`` in round order into per-qid latest status and writes
``driver_coverage.json``. Run it once per round, after the driver's file
lands, and commit the result:

    python scripts/update_coverage.py

Ledger shape:
    {
      "rounds_merged": ["CORRECTNESS_r01.json", ...],
      "green":  [qid, ...],   # latest driver row passed (hash or rows-only)
      "failed": [qid, ...],   # latest driver row failed -> re-verify first
      "stale":  [qid, ...],   # hand-maintained: qids whose plan/shared loader
                              #   changed since their last green driver row
      "never_sampled": [...]  # derived: declared qids with no driver row yet,
    }                         #   RANKED in rotation order (the order they
                              #   enter the driver's ~50-qid window)

``stale`` is NOT overwritten by this script — it is the per-round declaration
(reviewed in the round log) that a previously-green qid must be re-verified
because its implementation changed.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rebuild_ledger(repo: str) -> dict:
    """Fold every CORRECTNESS_r*.json (round order) into per-qid latest
    status; preserve the existing ledger's hand-maintained ``stale`` list.
    A qid is green iff its LATEST driver row passed (later rounds override
    earlier ones); rows-only rows (err == no_oracle) count as passed."""
    latest: dict[str, bool] = {}
    rounds = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    for path in rounds:
        with open(path) as f:
            rows = json.load(f)
        for qid, row in rows.items():
            if row.get("err") == "no_oracle":
                ok = True  # declared rows-only: the driver's weaker check ran
            else:
                ok = bool(row.get("rows_match") and row.get("schema_match") and row.get("hash_match"))
            latest[qid] = ok

    ledger_path = os.path.join(repo, "driver_coverage.json")
    stale: list[str] = []
    if os.path.exists(ledger_path):
        with open(ledger_path) as f:
            stale = json.load(f).get("stale", [])

    ledger = {
        "rounds_merged": [os.path.basename(p) for p in rounds],
        "green": sorted(q for q, ok in latest.items() if ok and q not in stale),
        "failed": sorted(q for q, ok in latest.items() if not ok),
        "stale": stale,
    }
    ledger["never_sampled"] = rank_never_sampled(ledger)
    return ledger


def rank_never_sampled(ledger: dict) -> list[str]:
    """Declared qids with no driver row yet, in the exact order they will
    enter the driver's window: ``plans.__init__`` puts stale + failed first,
    then never-checked qids in layout order, so the never-sampled ranking IS
    the unchecked segment of the rotated catalog. Importing plans applies the
    rotation from the ledger on disk; we re-derive the unchecked segment here
    from the fresh ledger so the two never disagree."""
    import sys

    sys.path.insert(0, REPO)
    from hdc_dataengineering_sqlsync_spark.plans import CATALOG  # noqa: E402

    seen = set(ledger["green"]) | set(ledger["failed"]) | set(ledger["stale"])
    # CATALOG rotation already orders unchecked qids in layout order; filter
    # preserves that order regardless of which ledger version was on disk.
    return [q for q in CATALOG if q not in seen]


def main() -> None:
    ledger = rebuild_ledger(REPO)
    with open(os.path.join(REPO, "driver_coverage.json"), "w") as f:
        json.dump(ledger, f, indent=2)
        f.write("\n")
    print(
        f"merged {len(ledger['rounds_merged'])} rounds: {len(ledger['green'])} green, "
        f"{len(ledger['failed'])} failed, {len(ledger['stale'])} stale"
    )


if __name__ == "__main__":
    main()
