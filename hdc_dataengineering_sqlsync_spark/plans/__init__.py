"""Query catalog: one (spark_fn, oracle_sql) pair per SURVEY.md §2 qid.

Importing this package populates ``CATALOG`` by importing every section
module. ``__spark_entry__.py`` derives ``queries()`` / ``oracle_sql()`` from
it; tests iterate it.

Registration order
------------------
Section modules import in SURVEY.md §2 layout order (2.1 scans … 2.12
workloads). The external correctness driver verifies only the first ~50
registered qids per round, so after the layout-ordered imports the catalog is
deterministically reordered from the committed ``driver_coverage.json``
ledger (rebuilt each round by ``scripts/update_coverage.py`` from the
driver's own ``CORRECTNESS_r*.json`` output):

  1. ``stale``  — previously-green qids whose implementation changed this
                  round and must be re-verified;
  2. ``failed`` — qids whose latest driver row failed;
  3. never-checked qids (no driver row yet), in layout order;
  4. ``green``  — qids whose latest driver row passed, in layout order.

This is a coverage checkpoint, not a hand-tuned ordering: qids rotate
through the driver's window until the ledger shows a green row for every
declared qid, and any qid that changes is declared stale and re-enters the
window. The full catalog is additionally verified locally every round via
``scripts/driver_sim.py`` (committed as ``CORRECTNESS_FULL_r*.log``).
"""

from __future__ import annotations

import json
import os

from hdc_dataengineering_sqlsync_spark.plans.catalog import CATALOG, Query, query

# SURVEY.md §2 layout order (2.1 -> 2.12).
from hdc_dataengineering_sqlsync_spark.plans import (  # noqa: E402,F401
    scans,
    filters,
    joins,
    subqueries,
    aggregates,
    reshape,
    windows,
    sorts_sets,
    scalar_fns,
    sync,
    llmdata,
    llmdata_ext,
    mediacodec,
    streaming_batch,
    timeseries,
    udfs,
    workloads,
    # The remaining modules import in never-checked PRIORITY order (r5): the
    # unchecked segment of the rotation is layout-ordered, so the module
    # sequence below decides which never-driver-checked qids enter the next
    # ~50-qid window first. Per the r4 verdict, the families with the most
    # novel machinery front-load: dataops leftovers, graphs, exact
    # statistics, CRDT/sync extensions, then the LLM-data r4 additions;
    # workloads/relational/surface extensions and round-5 additions fill
    # the residue window. New qids always go in the newest last-imported
    # module so the already-planned window is unchanged.
    dataops,
    dataops_b,
    graphs,
    exact_stats,
    sync_ext,
    llmdata_r4,
    workloads_ext,
    relational_ext,
    surface_ext,
    roundfive,
    roundfive_b,
    roundfive_c,
    roundfive_d,
    roundfive_e,
    roundfive_f,
    roundfive_g,
    roundfive_h,
    roundfive_i,
    roundfive_j,
    roundfive_k,
    roundfive_l,
    roundfive_m,
    roundfive_n,
    roundfive_o,
    roundfive_p,
    roundfive_q,
    roundfive_r,
    roundfive_s,
    roundfive_t,
    roundfive_u,
    roundfive_v,
    roundfive_w,
    roundfive_x,
    roundfive_y,
    roundfive_z,
    roundfive_aa,
    roundfive_ab,
    roundfive_ac,
    roundfive_ad,
    roundfive_ae,
    roundfive_af,
    roundfive_ag,
    roundsix,
    roundsix_b,
    roundsix_c,
    roundsix_d,
    roundseven,
    roundseven_b,
    roundseven_c,
    roundseven_d,
    roundseven_e,
    roundseven_f,
    roundseven_g,
    roundseven_h,
    roundseven_i,
    roundseven_j,
    roundseven_k,
    roundseven_l,
    roundeight,
    roundeight_b,
    roundeight_c,
    roundeight_d,
    roundeight_e,
    roundeight_f,
    roundeight_g,
    roundnine,
    roundnine_b,
    roundnine_c,
    roundnine_d,
    roundnine_e,
    roundnine_f,
    roundnine_g,
    roundnine_h,
    roundnine_i,
    roundnine_j,
    roundnine_k,
    roundnine_l,
    roundnine_m,
    roundnine_n,
    roundnine_o,
    roundnine_p,
    roundnine_q,
    roundnine_r,
    roundnine_s,
    roundnine_t,
    roundnine_u,
    roundnine_v,
    roundnine_w,
    roundnine_x,
    roundnine_y,
    roundnine_z,
    roundnine_aa,
    roundnine_ab,
    roundnine_ac,
    roundnine_ad,
    roundnine_ae,
    roundnine_af,
    roundnine_ag,
    roundnine_ah,
    roundnine_ai,
    roundnine_aj,
    roundnine_ak,
    roundnine_al,
    roundnine_am,
    roundnine_an,
    roundnine_ao,
    roundnine_ap,
    roundnine_aq,
    roundnine_ar,
    roundnine_as,
    roundnine_at,
    roundnine_au,
    roundnine_av,
)

_LEDGER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "driver_coverage.json",
)


def _rotate_catalog() -> None:
    try:
        with open(_LEDGER) as f:
            ledger = json.load(f)
    except (OSError, ValueError):
        # no ledger (fresh checkout) or malformed JSON (truncated write,
        # bad merge): degrade to layout order instead of failing import
        return
    stale = [q for q in ledger.get("stale", []) if q in CATALOG]
    failed = [q for q in ledger.get("failed", []) if q in CATALOG and q not in stale]
    green = set(ledger.get("green", []))
    head = set(stale) | set(failed)
    unchecked = [q for q in CATALOG if q not in head and q not in green]
    # r12 steering (VERDICT r11 task 1): §2.10 streaming went to 100%
    # driver-verified in r11, so the window now front-loads the two
    # largest never-sampled pools — 2.12 composite workloads (48), then
    # 2.9 llm-data (41) — so the driver's ~50-qid window burns down those
    # pools before the rest. Stable sort keeps layout order within each
    # priority class.
    unchecked.sort(
        key=lambda q: 0 if CATALOG[q].family.startswith("2.12") else 1 if CATALOG[q].family.startswith("2.9") else 2
    )
    tail = [q for q in CATALOG if q in green and q not in head]
    ordered = {q: CATALOG[q] for q in stale + failed + unchecked + tail}
    assert len(ordered) == len(CATALOG)
    CATALOG.clear()
    CATALOG.update(ordered)


_rotate_catalog()

__all__ = ["CATALOG", "Query", "query"]
