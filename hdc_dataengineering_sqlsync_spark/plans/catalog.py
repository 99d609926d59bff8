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

__all__ = ["Query", "CATALOG", "query", "duck_md5_int", "sort_reduction"]


def sort_reduction(df: DataFrame, *cols: str) -> DataFrame:
    """Globally sort a per-key REDUCTION that sits on top of an opaque
    Python stage (the mapInPandas codec/feature chains).

    A bare ``orderBy`` range-partitions its input, and the RangePartitioner
    first runs a SAMPLING job over the child — which, when the child is an
    opaque Python subtree, re-executes the whole encode/decode chain a
    second time per action (r12: measured 0.94s -> 0.61s on
    multimodal_decode_image at sf0.1 from this alone). Lazily
    localCheckpoint the reduction so the sampling pass and the exchange
    both read materialized partitions instead of re-running Python.

    Only for reductions (media-grain stat rows, bounded by item count) —
    never fact-sized frames (the r10 checkpoint rule); on executor loss the
    truncated lineage costs a query retry, the documented trade for
    reductions.

    The checkpoint swaps the logical plan for an RDD scan, so the computed
    subtree (scan pruning, the MapInPandas codec stage) disappears from the
    declared DataFrame's explain output; the pre-checkpoint child is stashed
    on the result as ``_sort_reduction_child`` so plan tests and audits can
    still introspect the real shape (same caveat class PLANS.md documents
    for eager-checkpointed reductions). Two caveats (r12 ADVICE): the stash
    is a plain attribute — any FURTHER DataFrame transformation returns a
    new frame without it, which ``scripts/plan_audit.py``'s diff now catches
    as a loud "plan went OPAQUE" regression (scans dropping to zero) rather
    than silently auditing the bare RDD scan. And checkpoint blocks are
    never explicitly unpersisted: each is one slim media-grain reduction
    (KBs at sf0.1), reclaimed only when the ContextCleaner GCs the dropped
    reference, so a long session running many checkpointing qids
    accumulates executor storage between GCs — bounded in practice by the
    reductions' tiny size, but worth knowing when reading storage-tab
    numbers during a bench."""
    out = df.localCheckpoint(eager=False).orderBy(*cols)
    out._sort_reduction_child = df
    return out

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    qid: str
    fn: SparkFn
    oracle: str | None  # None => rows-only check (driver contract)
    family: str  # SURVEY.md §2 subsection, e.g. "2.4 aggregations"
    bench: bool = False  # part of the BASELINE.md starred bench set


CATALOG: dict[str, Query] = {}


def normalize_oracle_rounding(sql: str) -> str:
    """Rewrite every ``round(E, n)`` into ``cast(cast(E AS DECIMAL(38,n)) AS
    DOUBLE)``.

    Why (probed, FIXTURES.md-hazard class): Spark's ``round`` rounds the
    *shortest decimal repr* of the double (BigDecimal.valueOf, HALF_UP) —
    identical to a decimal cast in BOTH engines — while DuckDB's ``round``
    divides by 1e-n in binary and diverges on repr-ties (round(1.005, 2) ->
    1.0 in DuckDB, 1.01 in Spark). Averages/percentiles of 2-decimal data hit
    such ties constantly. Oracles are written with readable ``round`` and
    normalized here so both engines round identically.
    """
    out = []
    i, n = 0, len(sql)
    low = sql.lower()
    while i < n:
        j = low.find("round(", i)
        # only bare round( — not bround/round_even (neither used in oracles)
        while j > 0 and (low[j - 1].isalnum() or low[j - 1] == "_"):
            j = low.find("round(", j + 1)
        if j == -1:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        k = j + len("round(")
        depth = 1
        last_comma = -1
        while k < n and depth:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                last_comma = k
            k += 1
        if last_comma == -1:
            out.append(sql[j:k])  # round(x) single-arg: leave alone
        else:
            expr = normalize_oracle_rounding(sql[j + len("round(") : last_comma])
            scale = sql[last_comma + 1 : k - 1].strip()
            out.append(f"cast(cast({expr} AS DECIMAL(38,{scale})) AS DOUBLE)")
        i = k
    return "".join(out)


def duck_md5_int(expr: str, nibbles: int) -> str:
    """DuckDB SQL for the integer value of the first ``nibbles`` hex digits
    of ``md5(expr)`` — the engine-portable hash idiom (Spark side:
    ``conv(substr(md5(x), 1, n), 16, 10)``). One definition so every
    oracle that mints md5-derived shard/ring positions shares the same
    nibble reconstruction."""
    parts = [
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (nibbles - 1 - i)}"
        for i in range(nibbles)
    ]
    return "(" + " + ".join(parts) + ")"


def _pin_utc(fn: SparkFn) -> SparkFn:
    """Pin ``spark.sql.session.timeZone=UTC`` around every catalog query.

    The testdata's temporal columns are parquet timestamps WITHOUT UTC
    adjustment, which Spark reads as TIMESTAMP_LTZ — so date extraction,
    window bucketing, and date-range filters all shift with the machine TZ,
    while the DuckDB oracle reads the same bytes as naive wall times. The
    round-4 TZ sweep (``TZ=America/New_York scripts/driver_sim.py
    --vanilla``) showed 29 qids diverging this way. The catalog therefore
    declares UTC temporal semantics: deterministic output on any machine,
    and a no-op under the driver's UTC environment.

    Checked per call, SET only when it differs: ``conf.set`` is a Py4J
    round-trip measured at ~30-60 ms per call that also invalidates
    session plan caches (it inflated the whole r4 bench ~40% when issued
    unconditionally), while ``conf.get`` is ~0.2 ms and side-effect-free.
    The get-guard (rather than a pinned-once session cache) also survives
    outside code re-setting the TZ mid-session.
    """

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query_fn")
    wrapped.__doc__ = fn.__doc__
    wrapped.__wrapped__ = fn
    return wrapped


def query(qid: str, family: str, oracle: str | None, bench: bool = False) -> Callable[[SparkFn], SparkFn]:
    """Decorator registering a Spark query fn + its oracle under ``qid``.

    The oracle SQL is normalized so DuckDB's rounding matches Spark's (see
    ``normalize_oracle_rounding``); the Spark fn is wrapped to pin the
    session timezone to UTC (see ``_pin_utc``).
    """

    def deco(fn: SparkFn) -> SparkFn:
        if qid in CATALOG:
            raise ValueError(f"duplicate qid {qid!r}")
        norm = normalize_oracle_rounding(oracle) if oracle else oracle
        CATALOG[qid] = Query(qid=qid, fn=_pin_utc(fn), oracle=norm, family=family, bench=bench)
        return fn

    return deco
