"""Query catalog: one (spark_fn, oracle_sql) pair per SURVEY.md §2 qid.

Importing this package populates ``CATALOG`` by importing every section
module. ``__spark_entry__.py`` derives ``queries()`` / ``oracle_sql()`` from
it; tests iterate it.
"""

from __future__ import annotations

from hdc_dataengineering_sqlsync_spark.plans.catalog import CATALOG, Query, query

# Section modules register themselves into CATALOG on import, mirroring the
# SURVEY.md §2 subsection layout.
from hdc_dataengineering_sqlsync_spark.plans import (  # noqa: E402,F401
    scans,
    filters,
    joins,
    aggregates,
    windows,
    sorts_sets,
    scalar_fns,
    sync,
    llmdata,
    llmdata_ext,
    reshape,
    workloads,
    streaming_batch,
    subqueries,
    timeseries,
    udfs,
)

__all__ = ["CATALOG", "Query", "query"]
