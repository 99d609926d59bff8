"""SURVEY.md §2 round-5 additions, batch H.

LLM-training-data pipeline surface: corpus novelty audit (ordered-arrival
n-gram overlap), RAKE keyword extraction, deterministic epoch shuffling,
and the dead-letter-queue quarantine pattern for sync ingestion.
Registered after ``roundfive_b`` (plans/__init__.py) so the qids append to
the END of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------------------------ 2.9 llm-data: corpus novelty audit

_NOVELTY_ORACLE = """
WITH t AS (
  SELECT doc_id, source, string_split_regex(lower(text), '\\s+') AS toks
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, source,
         unnest(list_transform(
           generate_series(1, GREATEST(len(toks) - 2, 0)),
           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
         )) AS shingle
  FROM t
),
firsts AS (
  SELECT doc_id, source,
         (doc_id = MIN(doc_id) OVER (PARTITION BY shingle)) AS novel
  FROM sh
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN novel THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN novel THEN 1 ELSE 0 END) * 10000 // COUNT(*)
         AS BIGINT) AS novelty_bps
FROM firsts GROUP BY source ORDER BY source
"""


@query("text_ngram_novelty", "2.9 llm-data", _NOVELTY_ORACLE)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty audit: how much of each doc is first-seen content?

    The ordered-arrival diversity measure a training-data pipeline runs
    per crawl batch: a doc's token-trigram shingle is NOVEL iff no
    earlier doc (doc_id = arrival order) contains it; per-source novelty
    rate in integer basis points. Sources whose rate collapses are
    re-crawling content already in the corpus — dedup's leading
    indicator, cheaper than pairwise similarity.

    Scale shape: trigrams derive MAP-SIDE from the token array
    (transform over an index sequence — no positional self-join), the
    per-doc DISTINCT and the global min-arrival window both key by
    shingle, so the only shuffle is the (shingle, doc, source) stream —
    the exact shape of the dedup family. Integer bps via floor division,
    no float crosses engines. Tokenizer is the RE2/Java parity split."""
    t = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split(F.lower("text"), r"\s+").alias("toks")
    )
    tri = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("toks") - 2, F.lit(0))),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("toks"), i),
            F.element_at(F.col("toks"), i + 1),
            F.element_at(F.col("toks"), i + 2),
        ),
    )
    sh = (
        t.select("doc_id", "source", F.explode(tri).alias("shingle"))
        .dropDuplicates(["doc_id", "shingle"])
    )
    firsts = sh.withColumn(
        "novel",
        F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("shingle")),
    )
    return (
        firsts.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("novel"), 1).otherwise(0)).alias("n_novel"),
            F.expr(
                "sum(case when novel then 1 else 0 end) * 10000"
                " div count(1)"
            ).alias("novelty_bps"),
        )
        .orderBy("source")
    )


# ------------------------------ 2.9 llm-data: RAKE keyword extraction

_RAKE_STOP = ("a", "the", "of", "and", "to", "in", "is", "on", "")

_RAKE_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang,
         CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
         unnest(toks) AS token
  FROM (SELECT doc_id, lang,
               string_split_regex(lower(text), '\\s+') AS toks
        FROM documents)
),
ns AS (
  SELECT doc_id, lang, pos, token,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS island
  FROM tok
  WHERE token NOT IN ('a', 'the', 'of', 'and', 'to', 'in', 'is', 'on', '')
),
ph AS (
  SELECT doc_id, lang, island,
         string_agg(token, ' ' ORDER BY pos) AS phrase,
         COUNT(*) AS plen
  FROM ns GROUP BY doc_id, lang, island
),
wstat AS (
  SELECT ns.lang, ns.token,
         COUNT(*) AS freq, SUM(ph.plen) AS deg
  FROM ns JOIN ph ON ns.doc_id = ph.doc_id AND ns.island = ph.island
                 AND ns.lang = ph.lang
  GROUP BY ns.lang, ns.token
),
scored AS (
  SELECT ph.lang, ph.phrase,
         SUM(wstat.deg) * 10000 // SUM(wstat.freq) AS score_bps
  FROM ns JOIN ph ON ns.doc_id = ph.doc_id AND ns.island = ph.island
                 AND ns.lang = ph.lang
          JOIN wstat ON wstat.lang = ns.lang AND wstat.token = ns.token
  GROUP BY ph.lang, ph.doc_id, ph.island, ph.phrase
),
best AS (
  SELECT DISTINCT lang, phrase, score_bps FROM scored
),
ranked AS (
  SELECT lang, phrase, CAST(score_bps AS BIGINT) AS score_bps,
         row_number() OVER (
           PARTITION BY lang ORDER BY score_bps DESC, phrase) AS rnk
  FROM best
)
SELECT lang, CAST(rnk AS INTEGER) AS rnk, phrase, score_bps
FROM ranked WHERE rnk <= 3 ORDER BY lang, rnk
"""


@query("text_rake_keywords", "2.9 llm-data", _RAKE_ORACLE)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (deterministic integer-ratio variant).

    Rapid Automatic Keyword Extraction: candidate phrases are maximal
    stopword-free token runs (gaps-and-islands on the token stream);
    word degree = sum of lengths of phrases containing the word, word
    freq = occurrence count; a phrase scores SUM(deg)/SUM(freq) — kept
    EXACT as integer basis points via floor division (classic RAKE sums
    per-word deg/freq ratios in floating point, whose addition order is
    engine-dependent; the ratio-of-sums variant ranks near-identically
    and is cross-engine exact). Top-3 distinct phrases per language.

    Scale shape: one posexplode + ONE window (row_number per doc) forms
    islands; phrases and word stats are keyed aggregates; the phrase
    re-score joins on (lang, token) against the Zipf-small word-stat
    table (broadcast at any scale). Identical phrase text -> identical
    global score, so the DISTINCT collapse is exact."""
    tok = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos0", "token"),
    ).select("doc_id", "lang", (F.col("pos0") + 1).alias("pos"), "token")
    ns = tok.where(~F.col("token").isin(*_RAKE_STOP)).withColumn(
        "island",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    ph = ns.groupBy("doc_id", "lang", "island").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "token"))),
                lambda s: s.token,
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    ns_ph = ns.join(ph, ["doc_id", "lang", "island"])
    wstat = ns_ph.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    scored = (
        ns_ph.join(F.broadcast(wstat), ["lang", "token"])
        .groupBy("lang", "doc_id", "island", "phrase")
        .agg(F.expr("sum(deg) * 10000 div sum(freq)").alias("score_bps"))
    )
    best = scored.select("lang", "phrase", "score_bps").distinct()
    ranked = best.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(
                F.col("score_bps").desc(), "phrase"
            )
        ),
    )
    return (
        ranked.where(F.col("rnk") <= 3)
        .select("lang", "rnk", "phrase", "score_bps")
        .orderBy("lang", "rnk")
    )


# --------------------------- 2.9 llm-data: deterministic epoch shuffle

_EPOCH_ORACLE = """
WITH keyed AS (
  SELECT e.range AS epoch, d.doc_id,
         md5(CAST(e.range AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR))
           AS shuffle_key
  FROM documents d CROSS JOIN range(1, 4) e
),
ranked AS (
  SELECT epoch, doc_id, shuffle_key,
         row_number() OVER (PARTITION BY epoch ORDER BY shuffle_key, doc_id)
           AS rnk
  FROM keyed
)
SELECT CAST(epoch AS BIGINT) AS epoch, CAST(rnk AS INTEGER) AS rnk,
       doc_id, shuffle_key
FROM ranked WHERE rnk <= 10 ORDER BY epoch, rnk
"""


@query("mix_epoch_shuffle", "2.9 llm-data", _EPOCH_ORACLE)
def mix_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training shuffle order.

    Multi-epoch training needs a DIFFERENT global order each epoch that
    is nonetheless reproducible under retries and elastic workers —
    `df.sample`/`rand()` are partition- and attempt-dependent, so the
    shuffle key is content-derived: md5(epoch ':' doc_id). Emits each
    epoch's head (top-10 by key) as the verifiable fingerprint of the
    full order.

    Scale shape: the key is map-side hash arithmetic; a full epoch
    materialization would be ONE range-partitioned sort by
    (epoch, key) — exactly how the engine writes shuffled training
    shards; the top-10 head here plans as TakeOrderedAndProject per
    epoch (no global sort materialized). Constant fan-out 3 explode,
    identical md5 hex across engines."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    keyed = d.select(
        "doc_id", F.explode(F.array(*[F.lit(e) for e in (1, 2, 3)])).alias("epoch")
    ).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws(":", F.col("epoch").cast("string"), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
    )
    ranked = keyed.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("epoch").orderBy("shuffle_key", "doc_id")
        ),
    )
    return (
        ranked.where(F.col("rnk") <= 10)
        .select(F.col("epoch").cast("long").alias("epoch"), "rnk", "doc_id", "shuffle_key")
        .orderBy("epoch", "rnk")
    )


# ------------------------- 2.8 sync: dead-letter-queue quarantine

_DLQ_ORACLE = """
WITH chg AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_name END AS name,
         CASE WHEN c_custkey % 7 = 0 THEN c_nationkey + 100
              ELSE c_nationkey END AS nationkey,
         CASE WHEN c_custkey % 5 = 0
              THEN CAST(round(c_acctbal * 100, 0) AS BIGINT) - 300000
              ELSE CAST(round(c_acctbal * 100, 0) AS BIGINT) END AS cents
  FROM customer WHERE c_custkey % 10 = 0
),
classified AS (
  SELECT *,
         CASE
           WHEN name IS NULL THEN 'dlq_null_name'
           WHEN nationkey NOT IN (SELECT n_nationkey FROM nation)
             THEN 'dlq_fk_violation'
           WHEN cents < -99999 THEN 'dlq_balance_floor'
           ELSE 'applied'
         END AS outcome
  FROM chg
)
SELECT outcome,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN outcome = 'applied' THEN cents ELSE 0 END)
            AS BIGINT) AS applied_cents
FROM classified GROUP BY outcome ORDER BY outcome
"""


@query("sync_dlq_quarantine", "2.8 sync core", _DLQ_ORACLE)
def sync_dlq_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter-queue ingestion: quarantine invalid changes, apply the rest.

    The at-least-once ingestion pattern: a change batch (deterministically
    drifted customer slice) validates against the target's contract —
    NOT NULL name, nation FK membership, balance floor — and each row
    routes to exactly one outcome with FIRST-FAILING-RULE precedence
    (null_name > fk_violation > balance_floor > applied). Census per
    outcome plus the applied money total; quarantined rows carry their
    reason back to the producer instead of poisoning the target.

    Scale shape: ONE conditional projection pass over the batch; the FK
    membership check rides the broadcast nation key set (at 100 TB the
    dim side of an FK is still broadcast-size or bloom-compressible) —
    no row ever takes a second scan, and the census is one keyed
    aggregate. Money in exact integer cents (the -3000.00 debit is an
    integer-cents mutation, FIXTURES hazard 3)."""
    cust = load(spark, sf_dir, "customer").where(F.col("c_custkey") % 10 == 0)
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    chg = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 13 == 0, F.lit(None)).otherwise(
            F.col("c_name")
        ).alias("name"),
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_nationkey") + 100)
        .otherwise(F.col("c_nationkey"))
        .alias("nationkey"),
        F.when(F.col("c_custkey") % 5 == 0, cents - 300000)
        .otherwise(cents)
        .alias("cents"),
    )
    nations = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"), F.lit(True).alias("fk_ok")
    )
    classified = chg.join(F.broadcast(nations), "nationkey", "left").select(
        F.when(F.col("name").isNull(), "dlq_null_name")
        .when(F.col("fk_ok").isNull(), "dlq_fk_violation")
        .when(F.col("cents") < -99999, "dlq_balance_floor")
        .otherwise("applied")
        .alias("outcome"),
        "cents",
    )
    return (
        classified.groupBy("outcome")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("outcome") == "applied", F.col("cents")).otherwise(0)
            ).alias("applied_cents"),
        )
        .orderBy("outcome")
    )


# ----------------------- 2.12 workloads: open-orders backlog timeline

_BACKLOG_ORACLE = """
WITH closes AS (
  SELECT l_orderkey,
         MAX(year(l_shipdate) * 12 + month(l_shipdate)) AS mo_close
  FROM lineitem GROUP BY l_orderkey
),
spans AS (
  SELECT o.o_orderkey,
         year(o.o_orderdate) * 12 + month(o.o_orderdate) AS mo_open,
         c.mo_close
  FROM orders o JOIN closes c ON o.o_orderkey = c.l_orderkey
),
deltas AS (
  SELECT mo_open AS mo, 1 AS d FROM spans
  UNION ALL
  SELECT mo_close + 1, -1 FROM spans
),
cum AS (
  SELECT mo, SUM(SUM(d)) OVER (ORDER BY mo
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS backlog
  FROM deltas GROUP BY mo
),
opened AS (SELECT mo_open AS mo, COUNT(*) AS n_opened FROM spans GROUP BY mo_open),
closed AS (SELECT mo_close AS mo, COUNT(*) AS n_closed FROM spans GROUP BY mo_close)
SELECT CAST(cum.mo AS BIGINT) AS mo,
       CAST(COALESCE(opened.n_opened, 0) AS BIGINT) AS n_opened,
       CAST(COALESCE(closed.n_closed, 0) AS BIGINT) AS n_closed,
       CAST(cum.backlog AS BIGINT) AS backlog
FROM cum
LEFT JOIN opened ON cum.mo = opened.mo
LEFT JOIN closed ON cum.mo = closed.mo
WHERE opened.n_opened IS NOT NULL OR closed.n_closed IS NOT NULL
ORDER BY mo
"""


@query("wl_open_orders_timeline", "2.12 composite workloads", _BACKLOG_ORACLE)
def wl_open_orders_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-orders backlog timeline: the sweep-line census over order lifespans.

    WIP/backlog analytics: an order is OPEN from its order month through
    its fulfilment month (max lineitem ship month); per month report
    opened, closed, and the number of orders open at any point in that
    month. The interval-stabbing census — counting, per time cell, the
    intervals covering it — done WITHOUT an interval join: each order
    contributes +1 at open and -1 after close, and a running sum over the
    reduced month series recovers the concurrent-open count exactly.

    Scale shape: the fulfilment lookup is one keyed max-aggregate
    (orderkey — co-partitioned with orders), the delta stream is a
    constant fan-out-2 projection, and every window/join downstream runs
    on the MONTH-indexed series — a few hundred rows regardless of fact
    volume (the ordered pass touches the reduced series only, the
    aggregate-then-window discipline). Months as exact linear integers
    (y*12+m); orders with no lineitems are out of scope (inner join) —
    they never opened work."""
    closes = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.max(
                F.year("l_shipdate") * 12 + F.month("l_shipdate")
            ).alias("mo_close")
        )
    )
    spans = (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mo_open"),
        )
        .join(closes, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    deltas = spans.select(
        F.explode(
            F.array(
                F.struct(F.col("mo_open").alias("mo"), F.lit(1).alias("d")),
                F.struct((F.col("mo_close") + 1).alias("mo"), F.lit(-1).alias("d")),
            )
        ).alias("e")
    ).select("e.mo", "e.d")
    cum = (
        deltas.groupBy("mo")
        .agg(F.sum("d").alias("dsum"))
        .withColumn(
            "backlog",
            F.sum("dsum").over(
                Window.orderBy("mo").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    opened = spans.groupBy(F.col("mo_open").alias("mo")).agg(
        F.count(F.lit(1)).alias("n_opened")
    )
    closed = spans.groupBy(F.col("mo_close").alias("mo")).agg(
        F.count(F.lit(1)).alias("n_closed")
    )
    return (
        cum.join(opened, "mo", "left")
        .join(closed, "mo", "left")
        .where(F.col("n_opened").isNotNull() | F.col("n_closed").isNotNull())
        .select(
            F.col("mo").cast("long").alias("mo"),
            F.coalesce("n_opened", F.lit(0)).alias("n_opened"),
            F.coalesce("n_closed", F.lit(0)).alias("n_closed"),
            F.col("backlog").cast("long").alias("backlog"),
        )
        .orderBy("mo")
    )


# --------------------------- 2.10 streaming/ts: SLO burn-rate alerts

_BURN_ORACLE = """
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS bucket,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errors,
         COUNT(*) AS total
  FROM events GROUP BY epoch_us(ts) // 3600000000
),
trail6 AS (
  SELECT bucket, errors, total,
         SUM(errors) OVER w AS errors6, SUM(total) OVER w AS total6
  FROM hourly
  WINDOW w AS (ORDER BY bucket RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(errors AS BIGINT) AS errors_1h,
       CAST(total AS BIGINT) AS total_1h,
       CAST(errors * 10000 // total AS BIGINT) AS burn_1h_bps,
       CAST(errors6 * 10000 // total6 AS BIGINT) AS burn_6h_bps
FROM trail6
WHERE errors * 10000 // total > 2500 AND errors6 * 10000 // total6 > 2200
ORDER BY bucket
"""


@query("ts_slo_burn_rate", "2.10 streaming", _BURN_ORACLE)
def ts_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the SRE error-budget pattern).

    An alert fires when BOTH the fast window (1h error rate > 25.00%) and
    the slow window (trailing 6h rate > 22.00%) burn hot — the standard
    guard against paging on a single noisy hour. Rates in integer basis
    points (floor division): no float threshold comparison can flap
    across engines.

    Scale shape: the hourly census is one map-combinable aggregate; the
    trailing 6h sum is NOT a global ordered window over raw events —
    each hourly row explodes onto the ≤6 target buckets it covers
    (constant fan-out, the wl_dau_wau_stickiness move) and re-aggregates
    on the EQUI bucket key, so gaps contribute zero and nothing ever
    single-partition-sorts. The oracle states the same sums as a RANGE
    frame over the integer bucket (gap-correct by frame semantics)."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(F.expr("unix_micros(ts) div 3600000000").alias("bucket"))
        .agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
                "errors"
            ),
            F.count(F.lit(1)).alias("total"),
        )
    )
    fanout = hourly.select(
        F.explode(
            F.sequence(F.col("bucket"), F.col("bucket") + 5)
        ).alias("target"),
        "errors",
        "total",
    )
    trailing = fanout.groupBy("target").agg(
        F.sum("errors").alias("errors6"), F.sum("total").alias("total6")
    )
    return (
        hourly.join(trailing, hourly.bucket == trailing.target)
        .select(
            "bucket",
            F.col("errors").alias("errors_1h"),
            F.col("total").alias("total_1h"),
            F.expr("errors * 10000 div total").alias("burn_1h_bps"),
            F.expr("errors6 * 10000 div total6").alias("burn_6h_bps"),
        )
        .where((F.col("burn_1h_bps") > 2500) & (F.col("burn_6h_bps") > 2200))
        .orderBy("bucket")
    )


# -------------------- 2.9 llm-data: hybrid retrieval (RRF fusion)

_RRF_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(CAST(dlen AS DOUBLE)) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok
  WHERE token IN ('window', 'join') GROUP BY doc_id, token
),
idf AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
bm25 AS (
  SELECT tf.doc_id,
         sum(ln((stats.n_docs - idf.df + 0.5) / (idf.df + 0.5) + 1.0)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dlen / stats.avgdl)))
           AS score
  FROM tf
  JOIN idf ON tf.token = idf.token
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
trank AS (
  SELECT doc_id AS id,
         CAST(row_number() OVER (ORDER BY round(score, 4) DESC, doc_id)
              AS INTEGER) AS r_text
  FROM bm25 QUALIFY r_text <= 20
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
comp AS (
  SELECT e.vec_id,
         sum(CAST(e.embedding[i.range] AS DOUBLE) * CAST(q.qe[i.range] AS DOUBLE)) AS dot,
         sum(CAST(e.embedding[i.range] AS DOUBLE) * CAST(e.embedding[i.range] AS DOUBLE)) AS na2,
         sum(CAST(q.qe[i.range] AS DOUBLE) * CAST(q.qe[i.range] AS DOUBLE)) AS nb2
  FROM embeddings e CROSS JOIN q CROSS JOIN range(1, 65) i
  WHERE e.vec_id <> 0
  GROUP BY e.vec_id
),
vrank AS (
  SELECT vec_id AS id,
         CAST(row_number() OVER (
           ORDER BY round(dot / (sqrt(na2) * sqrt(nb2)), 4) DESC, vec_id)
              AS INTEGER) AS r_vec
  FROM comp QUALIFY r_vec <= 20
),
fused AS (
  SELECT COALESCE(trank.id, vrank.id) AS id, r_text, r_vec,
         COALESCE(1000000 // (60 + r_text), 0)
         + COALESCE(1000000 // (60 + r_vec), 0) AS rrf_score
  FROM trank FULL OUTER JOIN vrank ON trank.id = vrank.id
)
SELECT id, r_text, r_vec, CAST(rrf_score AS BIGINT) AS rrf_score
FROM fused ORDER BY rrf_score DESC, id LIMIT 10
"""


@query("simsearch_hybrid_rrf", "2.9 llm-data", _RRF_ORACLE)
def simsearch_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 + dense cosine fused by Reciprocal Rank Fusion.

    The production retrieval stack's merge step: the lexical leg (BM25,
    same formula/constants as text_bm25_search) and the dense leg
    (cosine to the query vector, same rounding as simsearch_cosine_topk)
    each contribute their top-20 RANKS — never their incomparable raw
    scores — and fuse as RRF with k=60. The reciprocal 1/(60+r) is kept
    EXACT as integer micro-units (1000000 div (60+r)): float RRF sums
    are addition-order-dependent across engines, integer division is
    not. Absent legs contribute 0 (standard RRF over the candidate
    union). Documents and embeddings align on id (doc_id = vec_id).

    Scale shape: both legs are already-declared scale shapes (tf
    filtered to query terms before any shuffle; brute cosine as the
    declared baseline with LSH/IVF as the scale path); the fusion joins
    two k-row rank lists — driver-trivial at any corpus size."""
    from pyspark.sql.window import Window as W

    from hdc_dataengineering_sqlsync_spark.functions.vectors import (
        cosine_similarity,
    )

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dlen").cast("double")).alias("avgdl"),
    )
    tf = (
        tok.where(F.col("token").isin("window", "join"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tfpart = (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dlen") / F.col("avgdl"))
    )
    bm25 = (
        tf.join(F.broadcast(dfq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * tfpart).alias("score"))
    )
    trank = (
        bm25.withColumn(
            "r_text",
            F.row_number().over(
                W.orderBy(F.round("score", 4).desc(), "doc_id")
            ),
        )
        .where(F.col("r_text") <= 20)
        .select(F.col("doc_id").alias("id"), "r_text")
    )
    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("_q"))
    vrank = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), F.col("_q")), 4).alias(
                "cos"
            ),
        )
        .withColumn(
            "r_vec", F.row_number().over(W.orderBy(F.col("cos").desc(), "vec_id"))
        )
        .where(F.col("r_vec") <= 20)
        .select(F.col("vec_id").alias("id"), "r_vec")
    )
    fused = trank.join(vrank, "id", "full_outer").select(
        "id",
        "r_text",
        "r_vec",
        (
            F.coalesce(F.expr("1000000 div (60 + r_text)"), F.lit(0))
            + F.coalesce(F.expr("1000000 div (60 + r_vec)"), F.lit(0))
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), "id").limit(10)
