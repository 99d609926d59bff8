"""Registry plumbing for the t2 query catalog (SURVEY.md §2).

Each declared qid carries a Spark callable ``(spark, sf_dir) -> DataFrame``
and, unless the operator is not SQL-expressible, a DuckDB oracle SQL string
over the pre-registered views ``region nation customer supplier part orders
lineitem events documents embeddings`` (driver contract,
``__spark_entry__.py``).

Conventions enforced by review, SURVEY.md §2:
  1. float aggregates rounded (2 for money, 4 for ratios) on BOTH sides;
  2. every LIMIT/top-k has a total order ending in a unique key;
  3. no raw arrays/structs/maps in output;
  4. dates out as DateType;
  6. oracle casts to Spark's output types (sum(int)->bigint, year->int, ...).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Query", "CATALOG", "query"]

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    qid: str
    fn: SparkFn
    oracle: str | None  # None => rows-only check (driver contract)
    family: str  # SURVEY.md §2 subsection, e.g. "2.4 aggregations"
    bench: bool = False  # part of the BASELINE.md starred bench set


CATALOG: dict[str, Query] = {}


def query(qid: str, family: str, oracle: str | None, bench: bool = False) -> Callable[[SparkFn], SparkFn]:
    """Decorator registering a Spark query fn + its oracle under ``qid``."""

    def deco(fn: SparkFn) -> SparkFn:
        if qid in CATALOG:
            raise ValueError(f"duplicate qid {qid!r}")
        CATALOG[qid] = Query(qid=qid, fn=fn, oracle=oracle, family=family, bench=bench)
        return fn

    return deco
