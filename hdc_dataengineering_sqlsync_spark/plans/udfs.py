"""SURVEY.md §2.11 — UDF / UDAF / UDTF surface.

UDFs are the deliberate slow path: every qid here exists to prove the
Python-boundary machinery (row UDF, Arrow-vectorized pandas UDF, grouped-agg
UDF, mapInPandas, @udtf, applyInPandas), not for performance. Rule learned
from cross-engine rounding: pandas code returns RAW doubles and Spark's
F.round (HALF_UP, matching DuckDB's half-away-from-zero) does the rounding —
numpy's half-even np.round would diverge on .xxxx5 boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Iterator as TypingIterator
from typing import Tuple as TypingTuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.plans.scalar_fns import _SPLIT_ORACLE
from hdc_dataengineering_sqlsync_spark.registry import load


@query(
    "udf_python_scalar",
    "2.11 udf surface",
    "SELECT c_custkey, reverse(c_name) AS rev_name FROM customer ORDER BY c_custkey",
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the anti-pattern, present for surface
    parity; see udf_pandas_scalar for the right way)."""
    reverse_str = F.udf(lambda s: None if s is None else s[::-1], T.StringType())
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", reverse_str("c_name").alias("rev_name")).orderBy("c_custkey")


@query(
    "udf_pandas_scalar",
    "2.11 udf surface",
    """
    SELECT l_returnflag, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (SNIPPETS.md [2]/[3] pattern):
    batches cross the JVM<->Python boundary as Arrow, 10-100x the row UDF."""

    @F.pandas_udf("double")
    def disc_price(ep: pd.Series, disc: pd.Series) -> pd.Series:
        return ep * (1.0 - disc)

    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.sum(disc_price("l_extendedprice", "l_discount")), 2).alias("revenue"))
        .orderBy("l_returnflag")
    )


@query(
    "udaf_pandas_grouped",
    "2.11 udf surface",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wmean
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (Series -> scalar): quantity-weighted
    mean price per return flag."""

    @F.pandas_udf("double")
    def wmean(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wmean("l_extendedprice", "l_quantity"), 4).alias("wmean"))
        .orderBy("l_returnflag")
    )


@query(
    "udtf_map_in_pandas",
    "2.11 udf surface",
    """
    WITH s AS (SELECT avg(l_quantity) AS m, stddev_samp(l_quantity) AS sd FROM lineitem)
    SELECT CAST(floor((l_quantity - m) / sd) AS BIGINT) AS bucket, count(*) AS n
    FROM lineitem, s GROUP BY bucket ORDER BY bucket
    """,
)
def udtf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas z-score bucketing, two-pass: global stats are computed by
    Spark first (one tiny agg), broadcast into the closure as plain floats,
    then applied per Arrow batch — no second shuffle."""
    li = load(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.avg("l_quantity").alias("m"), F.stddev_samp("l_quantity").alias("sd")
    ).collect()[0]
    mean, sd = float(stats["m"]), float(stats["sd"])

    def zbucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            z = (pdf["l_quantity"] - mean) / sd
            yield pd.DataFrame({"bucket": np.floor(z).astype("int64")})

    buckets = li.select("l_quantity").mapInPandas(zbucket, schema="bucket long")
    return buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).orderBy("bucket")


@query("udtf_python", "2.11 udf surface", _SPLIT_ORACLE)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (@udtf, Spark >=3.5) via SQL LATERAL join — same output
    contract as fn_split_explode, so it reuses that oracle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string")
    class SplitTokens:
        def eval(self, text: str):
            if text is not None:
                for tok in text.split(" "):
                    yield (tok,)

    spark.udtf.register("split_tokens", SplitTokens)
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT t.token, count(*) AS cnt
        FROM part, LATERAL split_tokens(p_type) t
        GROUP BY t.token ORDER BY cnt DESC, token
        """
    )


@query(
    "udtf_apply_in_pandas",
    "2.11 udf surface",
    """
    SELECT c_custkey,
           round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 4) AS pct
    FROM customer ORDER BY c_custkey
    """,
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped map: rank-normalize acctbal to [0,1] per
    segment (pandas rank(method='min') == SQL percent_rank's rank)."""

    def rank_normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        r = pdf["c_acctbal"].rank(method="min")
        pct = (r - 1.0) / (n - 1.0) if n > 1 else r * 0.0
        return pd.DataFrame({"c_custkey": pdf["c_custkey"], "pct": pct})

    c = load(spark, sf_dir, "customer")
    out = c.groupBy("c_mktsegment").applyInPandas(rank_normalize, schema="c_custkey long, pct double")
    return out.select("c_custkey", F.round("pct", 4).alias("pct")).orderBy("c_custkey")


@query(
    "udf_pandas_iter",
    "2.11 udf surface",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS charge
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (Iterator[batch] -> Iterator[batch]): the
    flavor that amortizes one-time setup (model load, dictionary build)
    across all Arrow batches of a partition instead of paying it per batch —
    the right shape for featurizers at 100 TB."""

    @F.pandas_udf("double")
    def charge(
        it: TypingIterator[TypingTuple[pd.Series, pd.Series, pd.Series]],
    ) -> TypingIterator[pd.Series]:
        one = 1.0  # stands in for expensive per-worker init, done ONCE here
        for ep, disc, tax in it:
            yield ep * (one - disc) * (one + tax)

    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum(charge("l_extendedprice", "l_discount", "l_tax")), 2).alias("charge")
        )
        .orderBy("l_returnflag")
    )


@query(
    "udtf_cogroup",
    "2.11 udf surface",
    """
    SELECT o.o_orderkey,
           CAST(count(l.l_orderkey) AS INT) AS n_lines,
           round(o.o_totalprice - coalesce(sum(l.l_extendedprice), 0.0), 2) AS price_gap
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey % 100 = 0
    GROUP BY o.o_orderkey, o.o_totalprice ORDER BY o.o_orderkey
    """,
)
def udtf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (groupBy().cogroup(...)): both sides of a key
    arrive as aligned pandas frames in one Python call — the primitive for
    per-key reconciliation that doesn't decompose into a join + agg (here it
    deliberately does, so the oracle can verify the machinery). Each side
    shuffles once on the key; the pairing itself adds no extra exchange.
    Restricted to a key subset: cogroup costs ONE Python call per key, so
    it is for logic that needs both sides at once, never a bulk join
    replacement (the full-key form measured 59s vs 0.5s for the join at
    sf0.01 — that asymmetry is the point of documenting it)."""

    def reconcile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=["o_orderkey", "n_lines", "price_gap"])
        return pd.DataFrame(
            {
                "o_orderkey": left["o_orderkey"].iloc[:1],
                "n_lines": [len(right)],
                "price_gap": [
                    float(left["o_totalprice"].iloc[0])
                    - float(right["l_extendedprice"].sum() if len(right) else 0.0)
                ],
            }
        )

    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_extendedprice")
    )
    out = (
        o.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(reconcile, schema="o_orderkey long, n_lines int, price_gap double")
    )
    return out.select(
        "o_orderkey", "n_lines", F.round("price_gap", 2).alias("price_gap")
    ).orderBy("o_orderkey")


@query(
    "udtf_map_in_arrow",
    "2.11 udf surface",
    """
    SELECT CAST(l_linenumber AS INT) AS l_linenumber,
           round(sum(l_quantity * l_extendedprice), 2) AS weighted
    FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber
    """,
)
def udtf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy tier below mapInPandas — RecordBatches are
    processed with pyarrow.compute kernels, skipping the Arrow->pandas
    conversion entirely. The cheapest Python boundary Spark offers; use it
    when the transform is expressible in Arrow kernels."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def weight(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column("l_linenumber"), pc.multiply(b.column("l_quantity"), b.column("l_extendedprice"))],
                names=["l_linenumber", "w"],
            )

    li = load(spark, sf_dir, "lineitem").select("l_linenumber", "l_quantity", "l_extendedprice")
    out = li.mapInArrow(weight, schema="l_linenumber int, w double")
    return (
        out.groupBy("l_linenumber")
        .agg(F.round(F.sum("w"), 2).alias("weighted"))
        .orderBy("l_linenumber")
    )
