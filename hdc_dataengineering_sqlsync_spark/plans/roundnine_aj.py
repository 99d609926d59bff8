"""SURVEY.md §2 round-9 batch AJ: Markov 4-step by matrix squaring,
sequential purchase rules, audio clipping detector.

  graph_markov_4step       P⁴ via two relational squarings, exact e6
  wl_sequential_purchase_rules  A-then-B rules across consecutive orders
  multimodal_audio_clipping     rail-hit census on the real WAV path

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query, sort_reduction
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.12 composite: 4-step transition matrix by repeated squaring

_MARKOV_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
trans AS (
  SELECT a.event_type AS s, b.event_type AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM ev a JOIN ev b ON b.user_id = a.user_id AND b.rn = a.rn + 1
  GROUP BY 1, 2
),
p1 AS (
  SELECT s, d,
         CAST(c * 1000000 // SUM(c) OVER (PARTITION BY s) AS BIGINT)
           AS p_e6
  FROM trans
),
p2 AS (
  SELECT a.s, b.d,
         CAST(SUM(a.p_e6 * b.p_e6) // 1000000 AS BIGINT) AS p_e6
  FROM p1 a JOIN p1 b ON b.s = a.d
  GROUP BY a.s, b.d
),
p4 AS (
  SELECT a.s, b.d,
         CAST(SUM(a.p_e6 * b.p_e6) // 1000000 AS BIGINT) AS p_e6
  FROM p2 a JOIN p2 b ON b.s = a.d
  GROUP BY a.s, b.d
)
SELECT s AS from_state, d AS to_state, p_e6 AS p4_e6
FROM p4 ORDER BY from_state, to_state
"""


@query("graph_markov_4step", "2.12 composite workloads", _MARKOV_ORACLE)
def graph_markov_4step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where will a user be FOUR events from now — P⁴ computed by
    repeated squaring (P²=P·P, P⁴=P²·P²): matrix multiplication
    expressed relationally as join-on-the-inner-index + keyed sum, the
    pattern that turns k-step reachability into log₂k shuffles instead
    of k. Rates live on the exact e6 grid; each squaring sums integer
    products then closes with ONE integral division (the per-squaring
    quantization is the declared semantics, identical in both engines
    — float matrix powers would drift and, worse, differ by engine).

    Scale shape: the transition census is ONE per-user window lead over
    the fact (r10 rework — the original rank self-join read the fact
    twice and, unmaterialized, recomputed through the nested squarings
    for 8 fact passes in one plan), reducing to a ≤|states|² cell table
    that is localCheckpoint'ed; both squarings are joins between
    checkpointed cell tables (tiny), never fact-sized."""
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        load(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("s"),
            F.lead("event_type").over(wu).alias("d"),
        )
        .where(F.col("d").isNotNull())
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    p1 = trans.select(
        "s",
        "d",
        F.expr(
            "CAST(c * 1000000 DIV SUM(c) OVER (PARTITION BY s) AS BIGINT)"
        ).alias("p_e6"),
    ).localCheckpoint(eager=True)

    def square(p: DataFrame) -> DataFrame:
        l = p.select(
            F.col("s").alias("ls"), F.col("d").alias("ld"),
            F.col("p_e6").alias("lp"),
        )
        r = p.select(
            F.col("s").alias("rs"), F.col("d").alias("rd"),
            F.col("p_e6").alias("rp"),
        )
        return (
            l.join(r, l.ld == r.rs)
            .groupBy(F.col("ls").alias("s"), F.col("rd").alias("d"))
            .agg(F.expr("CAST(SUM(lp * rp) DIV 1000000 AS BIGINT)").alias("p_e6"))
        )

    p2 = square(p1).localCheckpoint(eager=True)  # read twice by the outer squaring
    p4 = square(p2)
    return p4.select(
        F.col("s").alias("from_state"),
        F.col("d").alias("to_state"),
        F.col("p_e6").alias("p4_e6"),
    ).orderBy("from_state", "to_state")


# ------ 2.12 composite: sequential (A-then-B) purchase rules

_SEQRULES_ORACLE = """
WITH ord AS (
  SELECT o_custkey AS ck, o_orderkey AS k,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
basket AS (
  SELECT DISTINCT o.ck, o.rn, p.p_brand AS brand
  FROM ord o
  JOIN lineitem l ON l.l_orderkey = o.k
  JOIN part p ON p.p_partkey = l.l_partkey
),
pairs AS (
  SELECT a.brand AS ante, b.brand AS cons,
         CAST(count(*) AS BIGINT) AS supp
  FROM basket a JOIN basket b
    ON b.ck = a.ck AND b.rn = a.rn + 1
  GROUP BY 1, 2
),
ante_supp AS (
  SELECT ante, CAST(SUM(supp) AS BIGINT) AS total FROM pairs GROUP BY ante
)
SELECT p.ante, p.cons, p.supp,
       CAST(p.supp * 10000 // a.total AS BIGINT) AS confidence_bps
FROM pairs p JOIN ante_supp a ON a.ante = p.ante
WHERE p.supp >= 20
ORDER BY confidence_bps DESC, p.ante, p.cons LIMIT 15
"""


@query(
    "wl_sequential_purchase_rules", "2.12 composite workloads",
    _SEQRULES_ORACLE,
)
def wl_sequential_purchase_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential purchase rules — 'customers who bought brand A LAST
    order buy brand B next order': the temporal upgrade of
    wl_basket_pairs (co-occurrence can't tell direction; sequence can),
    the next-best-offer miner. Rule events are counted at the
    (customer, consecutive-order-pair, brand-pair) grain with baskets
    deduped per order first; confidence = supp(A→B)/supp(A→*) in exact
    bps; top-15 with a full deterministic order.

    Scale shape: order ranks are a per-customer window; the
    consecutive-pair join is keyed on (customer, rank+1) — both sides
    partition-parallel on the customer key; brand baskets dedup
    map-side; the rule table is |brands|² cells."""
    ord_ = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("k"),
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("rn"),
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    basket = (
        ord_.join(li, ord_.k == li.l_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("ck", "rn", "brand")
        .distinct()
    )
    a = basket.select(
        F.col("ck").alias("ca"), F.col("rn").alias("ra"),
        F.col("brand").alias("ante"),
    )
    b = basket.select(
        F.col("ck").alias("cb"), F.col("rn").alias("rb"),
        F.col("brand").alias("cons"),
    )
    pairs = (
        a.join(b, (a.ca == b.cb) & (b.rb == a.ra + 1))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("supp"))
    )
    ante_supp = pairs.groupBy("ante").agg(F.sum("supp").alias("total"))
    return (
        pairs.join(ante_supp, "ante")
        .where(F.col("supp") >= 20)
        .select(
            "ante",
            "cons",
            "supp",
            F.expr("supp * 10000 DIV total").alias("confidence_bps"),
        )
        .orderBy(F.col("confidence_bps").desc(), "ante", "cons")
        .limit(15)
    )


# ------ 2.9 llm-data: clipping detector on the real WAV path

_CLIP_SUBSET = "doc_id % 5 = 1"

_CLIP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_clip_hi", T.LongType()),
        T.StructField("n_clip_lo", T.LongType()),
        T.StructField("clip_bps", T.LongType()),
    ]
)

_CLIP_ORACLE = f"""
WITH m AS (SELECT doc_id, 96 + (doc_id % 5) * 32 AS n
           FROM documents WHERE {_CLIP_SUBSET}),
s AS (
  SELECT m.doc_id, m.n, i.i,
         GREATEST(-32768, LEAST(32767,
           (m.doc_id * 37 + i.i * 11) % 80001 - 40000)) AS v
  FROM m JOIN (SELECT unnest(range(0, 256)) AS i) i ON i.i < m.n
)
SELECT doc_id AS media_id, CAST(n AS INT) AS n_samples,
       CAST(SUM(CASE WHEN v = 32767 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_hi,
       CAST(SUM(CASE WHEN v = -32768 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_lo,
       CAST(SUM(CASE WHEN v = 32767 OR v = -32768 THEN 1 ELSE 0 END)
            * 10000 // n AS BIGINT) AS clip_bps
FROM s GROUP BY doc_id, n ORDER BY media_id
"""


@query("multimodal_audio_clipping", "2.9 llm-data", _CLIP_ORACLE)
def multimodal_audio_clipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipping detector — the first audio-QA gate (clipped clips
    distort every downstream feature): synthesize an over-range signal,
    clamp to the int16 rails exactly as an ADC would, round-trip through
    real RIFF bytes, and census rail hits (±32767/−32768) per clip in
    exact bps. A decode that mangles the sign bit or byte order moves
    rail counts and mismatches the closed form.

    Scale shape: encode+decode+census in ONE mapInPandas pass;
    payloads never shuffle — 4 scalars per clip leave the stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
            decode_wav,
            encode_wav,
        )

        for pdf in batches:
            rows = []
            for mid in pdf["doc_id"].to_numpy(dtype=np.int64):
                m = int(mid)
                n = 96 + (m % 5) * 32
                i = np.arange(n, dtype=np.int64)
                raw = (m * 37 + i * 11) % 80001 - 40000
                samples = np.clip(raw, -32768, 32767).astype(np.int16)
                _, dec = decode_wav(encode_wav(samples))
                d = dec.astype(np.int64)
                hi = int((d == 32767).sum())
                lo = int((d == -32768).sum())
                rows.append((m, n, hi, lo, (hi + lo) * 10000 // n))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _CLIP_SCHEMA.fields]
            )

    docs = load(spark, sf_dir, "documents").where(_CLIP_SUBSET)
    ids = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    return sort_reduction(ids.mapInPandas(run, schema=_CLIP_SCHEMA), "media_id")
