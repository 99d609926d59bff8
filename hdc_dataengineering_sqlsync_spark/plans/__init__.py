"""Query catalog: one (spark_fn, oracle_sql) pair per SURVEY.md §2 qid.

Importing this package populates ``CATALOG`` by importing every section
module. ``__spark_entry__.py`` derives ``queries()`` / ``oracle_sql()`` from
it; tests iterate it.
"""

from __future__ import annotations

from hdc_dataengineering_sqlsync_spark.plans.catalog import CATALOG, Query, query

# Section modules register themselves into CATALOG on import. Registration
# order matters: the round-1 driver verified only the first ~50 registered
# qids before exhausting its budget (CORRECTNESS_r01.json stops at windows),
# so the families it has never checked (sync, llm-data, streaming, workloads,
# timeseries, udfs, …) register FIRST and the families it already verified
# green in round 1 (scans → windows) register last.
from hdc_dataengineering_sqlsync_spark.plans import (  # noqa: E402,F401
    sync,
    llmdata,
    llmdata_ext,
    mediacodec,
    workloads,
    streaming_batch,
    timeseries,
    udfs,
    subqueries,
    reshape,
    sorts_sets,
    scalar_fns,
    scans,
    filters,
    joins,
    aggregates,
    windows,
)

__all__ = ["CATALOG", "Query", "query"]
