"""SURVEY.md §2 round-4 additions — 10 qids widening the families the r3
verdict graded strongest: tolerance-bounded as-of join, bitemporal AS OF
reconstruction, IQR outlier audit, passage-level exact dedup, URL
canonicalization, temperature-scaled mixture weights, product-quantization
ANN (ADC), retention cohorts, activity-streak islands, and a mergeable-HLL
partial/union proof (rows-only).

Registered AFTER dataops (plans/__init__.py) so the qids append to the END
of the never-checked rotation segment and enter the round-5 driver window
without evicting the planned round-4 one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# --------------------------------------------------------------- 2.3 joins

_ASOF_TOL_ORACLE = """
SELECT event_id,
       CASE WHEN prior_view_ts >= ts - INTERVAL 2 HOUR THEN prior_view_ts END
         AS prior_view_ts
FROM (
  SELECT event_id, event_type, ts,
         max(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_ts
  FROM events
) WHERE event_type = 'purchase'
ORDER BY event_id
"""


@query("join_asof_tolerance", "2.3 joins", _ASOF_TOL_ORACLE)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas merge_asof / kdb wj
    semantics): the latest strictly-prior 'view' per user counts for a
    purchase only when it happened within the last 2 hours — staler matches
    become NULL instead of silently attributing ancient context. Same
    single window pass as join_asof_prior_event (one shuffle on user_id,
    no range join); the tolerance is a post-window map-side predicate, so
    the 100 TB cost is identical to the unbounded as-of."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_view = F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    return (
        e.select("event_id", "event_type", "ts", prior_view.alias("pv"))
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.when(
                F.col("pv") >= F.col("ts") - F.expr("INTERVAL 2 HOURS"), F.col("pv")
            ).alias("prior_view_ts"),
        )
        .orderBy("event_id")
    )


# ----------------------------------------------------------- 2.8 sync core

_BITEMPORAL_ORACLE = """
WITH v AS (
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT)
           AS version
  FROM events
)
SELECT event_type, count(*) AS n_users,
       round(avg(version), 2) AS avg_version,
       max(version) AS max_version
FROM v
WHERE valid_from <= TIMESTAMP '2024-01-15 12:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 12:00:00')
GROUP BY event_type ORDER BY event_type
"""


@query("sync_bitemporal_asof", "2.8 sync core", _BITEMPORAL_ORACLE)
def sync_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) snapshot reconstruction over the SCD2 interval
    table sync_scd2_intervals builds: each user's version chain (valid_from
    = event ts, valid_to = next event's ts) filtered to the single version
    live at T = 2024-01-15 12:00 — `valid_from <= T < valid_to` with the
    open version unbounded. This is the time-travel read a sync target
    without a transactional table format still needs; at 100 TB the
    interval build is the same one-window pass as SCD2 and the AS OF is a
    map-side filter (never a join), so snapshot cost tracks the table, not
    the history depth. Output: per event-type census of the live versions
    (exactly one per user active before T)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.lit("2024-01-15 12:00:00").cast("timestamp")
    v = e.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
    )
    live = v.where(
        (F.col("valid_from") <= t) & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
    return (
        live.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("version"), 2).alias("avg_version"),
            F.max("version").alias("max_version"),
        )
        .orderBy("event_type")
    )


_IQR_ORACLE = """
WITH fences AS (
  SELECT o_orderpriority,
         round(quantile_cont(o_totalprice, 0.25), 4) AS q1,
         round(quantile_cont(o_totalprice, 0.75), 4) AS q3
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority AS priority, count(*) AS n,
       CAST(sum(CASE WHEN o.o_totalprice < f.q1 - 1.5 * (f.q3 - f.q1)
                       OR o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(CAST(sum(CASE WHEN o.o_totalprice < f.q1 - 1.5 * (f.q3 - f.q1)
                             OR o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1)
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS outlier_frac
FROM orders o JOIN fences f USING (o_orderpriority)
GROUP BY priority ORDER BY priority
"""


@query("dq_outlier_iqr", "2.8 sync core", _IQR_ORACLE)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier census per group: exact interpolated quartiles of
    o_totalprice per priority, 1.5×IQR fences, per-group outlier counts —
    the distributional sibling of dq_constraint_report's rule audit.

    Determinism: quartiles snap-round at scale 4 first (the agg_percentile
    ulp-snap technique, but at QUARTER-quantile precision: 0.25/0.75
    interpolation fractions over 2-decimal money terminate at FOUR
    decimals — e.g. (100.01, 100.02, frac .25) → 100.0125 — so a scale-3
    snap would itself sit on .xxx5 repr ties where the engines' rounding
    genuinely differs; at scale 4 the true value is never a tie), after
    which `1.5*(q3-q1)` and the fence comparisons are identical IEEE
    arithmetic on identical doubles in both engines. Shape: one grouped
    percentile agg to #groups rows, broadcast back onto the scan
    (map-side fence test), one partial+final count agg — two scans, no
    window sort."""
    o = load(spark, sf_dir, "orders")
    fences = o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("q1"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("o_totalprice") < F.col("q1") - 1.5 * iqr) | (
        F.col("o_totalprice") > F.col("q3") + 1.5 * iqr
    )
    return (
        o.join(F.broadcast(fences), "o_orderpriority")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
            F.round(
                F.sum(is_out.cast("long")).cast("double") / F.count(F.lit(1)), 4
            ).alias("outlier_frac"),
        )
        .orderBy("priority")
    )


# ------------------------------------------------------------ 2.9 llm-data

_PASSAGE_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS toks
  FROM documents
),
chunks AS (
  SELECT doc_id, lang,
         md5(array_to_string(list_slice(toks, i * 20 + 1, i * 20 + 20), ' ')) AS phash
  FROM tok, unnest(range(0, CAST(floor(len(toks) / 20) AS BIGINT))) AS t(i)
),
per_hash AS (
  SELECT lang, phash, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
  FROM chunks GROUP BY lang, phash
)
SELECT lang,
       CAST(sum(cnt) AS BIGINT) AS n_passages,
       count(*) AS n_distinct,
       CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       round(CAST(sum(CASE WHEN n_docs > 1 THEN cnt ELSE 0 END) AS DOUBLE)
             / sum(cnt), 4) AS shared_frac
FROM per_hash GROUP BY lang ORDER BY lang
"""


@query("dedup_passage_exact", "2.9 llm-data", _PASSAGE_ORACLE)
def dedup_passage_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup (the RefinedWeb/CCNet line-dedup shape):
    each doc splits into consecutive non-overlapping 20-token passages
    (tail fragments dropped), passages key by md5 of their joined text, and
    a passage is 'shared' when it appears in more than one document of the
    same lang — boilerplate detection finer than whole-doc dedup_exact and
    cheaper than shingle Jaccard. All map-side builtin array ops (split →
    slice per chunk index → md5) until one keyed count; at 100 TB only
    16-byte hashes shuffle, never passage text, and the per-lang rollup is
    a second tiny agg."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    n_chunks = F.floor(F.size(toks) / 20).cast("int")
    # guard: sequence(0, -1) would count DOWN ([0, -1]) for sub-20-token
    # docs — emit an empty chunk list instead (explode then drops the row,
    # matching the oracle's empty range())
    idx = F.when(n_chunks >= 1, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(idx, lambda i: F.md5(F.array_join(F.slice(toks, i * 20 + 1, 20), " ")))
        ).alias("phash"),
    )
    per_hash = chunks.groupBy("lang", "phash").agg(
        F.count(F.lit(1)).alias("cnt"), F.countDistinct("doc_id").alias("n_docs")
    )
    shared = F.col("n_docs") > 1
    return (
        per_hash.groupBy("lang")
        .agg(
            F.sum("cnt").alias("n_passages"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(shared.cast("long")).alias("n_shared"),
            F.round(
                F.sum(F.when(shared, F.col("cnt")).otherwise(F.lit(0))).cast("double")
                / F.sum("cnt"),
                4,
            ).alias("shared_frac"),
        )
        .orderBy("lang")
    )


# Deterministic URL fixture (the text_pii_redact technique: synthesize from
# customer inside the query so DuckDB reproduces it without extra files).
# Noise: uppercase scheme/host, explicit :443, utm_* tracking params,
# trailing slash, #fragment — all things canonicalization must strip.
_URL_EXPR_SQL = """
  'HTTPS://WWW.Shop' || CAST(c_custkey % 50 AS VARCHAR) || '.COM'
  || CASE WHEN c_custkey % 3 = 0 THEN ':443' ELSE '' END
  || '/item/' || CAST(c_custkey % 200 AS VARCHAR)
  || CASE WHEN c_custkey % 2 = 0 THEN '/' ELSE '' END
  || CASE WHEN c_custkey % 4 = 0
          THEN '?utm_source=news' || CAST(c_custkey % 7 AS VARCHAR) ELSE '' END
  || CASE WHEN c_custkey % 5 = 0 THEN '#sec' || CAST(c_custkey % 3 AS VARCHAR)
          ELSE '' END
"""

_URL_ORACLE = f"""
WITH raw AS (SELECT c_custkey, {_URL_EXPR_SQL} AS url FROM customer),
canon AS (
  SELECT c_custkey, url,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(regexp_replace(lower(url), '#.*$', ''),
                              ':443/', '/'),
               '[?&]utm_[a-z]+=[a-z0-9]*', ''),
             '/$', ''),
           '/([?])', '?') AS curl
  FROM raw
)
SELECT count(*) AS n_urls,
       count(DISTINCT url) AS n_raw_distinct,
       count(DISTINCT curl) AS n_canon_distinct,
       count(DISTINCT regexp_extract(curl, '^https://([^/:?#]+)', 1)) AS n_hosts
FROM canon
"""


@query("text_url_canonicalize", "2.9 llm-data", _URL_ORACLE)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the first step of any web-scale crawl
    pipeline: scheme/host lowercasing, default-port (:443) stripping,
    utm_* tracking-param removal, trailing-slash and #fragment stripping
    collapse cosmetically distinct URLs onto one canonical form (raw
    distinct count >> canonical distinct count). Fixture URLs synthesize
    deterministically from customer keys; every transform is a sequential
    RE2∩Java-safe regexp_replace (JVM codegen, the text_pii_redact
    pattern), so the whole op is map-side until four final counters in ONE
    aggregate. ':443' strips via ':443/' -> '/' (the path slash anchors
    the port end — RE2 has no lookahead)."""
    c = load(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    url = F.concat(
        F.lit("HTTPS://WWW.Shop"),
        (key % 50).cast("string"),
        F.lit(".COM"),
        F.when(key % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/item/"),
        (key % 200).cast("string"),
        F.when(key % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(key % 4 == 0, F.concat(F.lit("?utm_source=news"), (key % 7).cast("string"))).otherwise(
            F.lit("")
        ),
        F.when(key % 5 == 0, F.concat(F.lit("#sec"), (key % 3).cast("string"))).otherwise(
            F.lit("")
        ),
    )
    curl = F.lower(url)
    curl = F.regexp_replace(curl, r"#.*$", "")
    curl = F.regexp_replace(curl, r":443/", "/")
    curl = F.regexp_replace(curl, r"[?&]utm_[a-z]+=[a-z0-9]*", "")
    curl = F.regexp_replace(curl, r"/$", "")
    curl = F.regexp_replace(curl, r"/([?])", "?")
    host = F.regexp_extract(curl, r"^https://([^/:?#]+)", 1)
    return c.select(url.alias("url"), curl.alias("curl"), host.alias("host")).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("url").alias("n_raw_distinct"),
        F.countDistinct("curl").alias("n_canon_distinct"),
        F.countDistinct("host").alias("n_hosts"),
    )


_TEMPERATURE_ORACLE = """
WITH per_lang AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(len(string_split_regex(lower(text), '\\s+'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total FROM per_lang)
SELECT lang, n_docs, n_tokens,
       round(n_tokens / total, 4) AS p_raw,
       round(sqrt(n_tokens / total)
             / sum(sqrt(n_tokens / total)) OVER (), 4) AS w_temp
FROM per_lang CROSS JOIN tot
ORDER BY lang
"""


@query("mix_temperature_weights", "2.9 llm-data", _TEMPERATURE_ORACLE)
def mix_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (the mT5/UniMax multilingual
    rebalance): raw token shares p_i flatten to w_i ∝ p_i^(1/T) with
    1/T = 0.5, boosting low-resource langs without equalizing. α = 0.5
    deliberately: p^0.5 is IEEE sqrt — correctly rounded and identical in
    both engines, unlike a general pow. One agg to #langs rows; the
    normalizer is a window/broadcast over that tiny table, so at 100 TB
    this costs one map-side-combinable token count. Companion to
    mix_sampling_weights (budget-capped allocation) and sample_hash_*
    (the draw itself)."""
    d = load(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.lower("text"), r"\s+"))).alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    p = F.col("n_tokens") / F.sum("n_tokens").over(w_all).cast("double")
    w = F.sqrt(p) / F.sum(F.sqrt(p)).over(w_all)
    return per_lang.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(p, 4).alias("p_raw"),
        F.round(w, 4).alias("w_temp"),
    ).orderBy("lang")


# Product quantization: 8 subspaces x 8 dims, 4 codes each. Codebook entries
# are CLOSED-FORM integers — cent(s, c)[j] = ((s*8+j)*(c+1)*7) % 41 - 20 —
# so both engines derive identical literals and, with embeddings quantized
# to integer 1e-3 units (the simsearch_centroid_assign technique), every
# dot product is exact int64: associative, order-free, bit-identical.
_PQ_SUBS, _PQ_DIMS, _PQ_CODES = 8, 8, 4


def _pq_cent(s: int, c: int) -> list[int]:
    return [((s * _PQ_DIMS + j) * (c + 1) * 7) % 41 - 20 for j in range(_PQ_DIMS)]


def _pq_oracle() -> str:
    # exact-int subspace dots: d_{s}_{c} = sum_j q[s*8+j+1] * cent[j]
    def dot(s: int, c: int) -> str:
        cent = _pq_cent(s, c)
        terms = " + ".join(
            f"CAST(round(embedding[{s * _PQ_DIMS + j + 1}] * 1000, 0) AS BIGINT) * ({cent[j]})"
            for j in range(_PQ_DIMS)
        )
        return f"CAST({terms} AS BIGINT)"

    dots = ",\n         ".join(
        f"{dot(s, c)} AS d{s}_{c}" for s in range(_PQ_SUBS) for c in range(_PQ_CODES)
    )
    # per-subspace code: argmax dot, ties toward the greatest code id —
    # test codes in DESCENDING order, first one >= all others wins
    codes = ",\n         ".join(
        "CASE "
        + " ".join(
            f"WHEN "
            + " AND ".join(f"d{s}_{c} >= d{s}_{o}" for o in range(_PQ_CODES) if o != c)
            + f" THEN {c}"
            for c in range(_PQ_CODES - 1, -1, -1)
        )
        + f" END AS code{s}"
        for s in range(_PQ_SUBS)
    )
    adc = " + ".join(
        "CASE v.code{s} ".format(s=s)
        + " ".join(f"WHEN {c} THEN q.d{s}_{c}" for c in range(_PQ_CODES))
        + " END"
        for s in range(_PQ_SUBS)
    )
    return f"""
WITH dots AS (
  SELECT vec_id,
         {dots}
  FROM embeddings
),
coded AS (
  SELECT vec_id,
         {codes}
  FROM dots
),
q AS (SELECT * FROM dots WHERE vec_id = 0)
SELECT v.vec_id, round(CAST(({adc}) AS DOUBLE) / 1e6, 4) AS adc_sim
FROM coded v CROSS JOIN q
WHERE v.vec_id <> 0
ORDER BY adc_sim DESC, v.vec_id
LIMIT 5
"""


@query("simsearch_pq_adc", "2.9 llm-data", _pq_oracle())
def simsearch_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation (ADC)
    — the memory-side of IVF-PQ indexes: each 64-dim embedding encodes to
    8 codes of 2 bits (argmax inner product against 4 closed-form integer
    centroids per 8-dim subspace, ties toward the greatest code), and the
    UNQUANTIZED query scores candidates via an 8×4 lookup table of exact
    query-centroid dots — candidates are never decoded. Index memory per
    vector drops 64×4 bytes → 2 bytes; at 100 TB the codebook and the
    query's lookup table broadcast (here: a 1-row broadcast cross join)
    while candidates stay map-side until the global top-5, which plans as
    TakeOrderedAndProject (per-partition k, no global sort). Exact int64
    everywhere (1e-3-quantized embeddings × integer centroids), so scores
    are bit-identical across engines and partitionings."""
    e = load(spark, sf_dir, "embeddings")

    def dot(s: int, c: int):
        cent = _pq_cent(s, c)
        sub = F.slice("embedding", s * _PQ_DIMS + 1, _PQ_DIMS)
        return F.aggregate(
            F.zip_with(
                sub,
                F.array(*[F.lit(v) for v in cent]),
                lambda x, y: F.round(x.cast("double") * 1000, 0).cast("long") * y.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    dcols = e.select(
        "vec_id", *[dot(s, c).alias(f"d{s}_{c}") for s in range(_PQ_SUBS) for c in range(_PQ_CODES)]
    )
    code = [
        F.greatest(
            *[
                F.struct(F.col(f"d{s}_{c}").alias("d"), F.lit(c).alias("c"))
                for c in range(_PQ_CODES)
            ]
        )["c"].alias(f"code{s}")
        for s in range(_PQ_SUBS)
    ]
    coded = dcols.select("vec_id", *code).where(F.col("vec_id") != 0)
    qlut = dcols.where(F.col("vec_id") == 0).select(
        *[F.col(f"d{s}_{c}").alias(f"q{s}_{c}") for s in range(_PQ_SUBS) for c in range(_PQ_CODES)]
    )
    adc = sum(
        F.element_at(
            F.array(*[F.col(f"q{s}_{c}") for c in range(_PQ_CODES)]), F.col(f"code{s}") + 1
        )
        for s in range(_PQ_SUBS)
    )
    return (
        coded.crossJoin(F.broadcast(qlut))
        .select("vec_id", F.round(adc.cast("double") / 1e6, 4).alias("adc_sim"))
        .orderBy(F.desc("adc_sim"), "vec_id")
        .limit(5)
    )


# ------------------------------------------------------------- 2.5 windows

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
),
isl AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT)
           AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, count(*) AS streak FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(sum(streak) AS BIGINT) AS n_active_days,
       max(streak) AS max_streak
FROM streaks GROUP BY user_id ORDER BY user_id
"""


@query("win_streak_islands", "2.5 windows", _STREAK_ORACLE)
def win_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active days
    (distinct event dates; island key = date − row_number days, constant
    exactly while dates are contiguous) — the classic sessionization-
    by-calendar window problem. One distinct on (user, day) — map-side
    partial — then one window pass partitioned by user_id (150× the
    parallelism of a global window) and two keyed counts. Integer date
    arithmetic only, so no engine drift."""
    e = load(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id", "d", F.date_sub("d", F.row_number().over(w)).alias("island")
    )
    streaks = isl.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("streak"))
    return (
        streaks.groupBy("user_id")
        .agg(F.sum("streak").alias("n_active_days"), F.max("streak").alias("max_streak"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------- 2.12 workloads

_RETENTION_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(date_diff('day', DATE '2024-01-01',
                              CAST(date_trunc('day', ts) AS DATE)) / 7) AS INT)
           AS wk
  FROM events
),
cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM ud GROUP BY user_id)
SELECT c.cohort_wk, u.wk - c.cohort_wk AS week_offset,
       count(DISTINCT u.user_id) AS n_users
FROM ud u JOIN cohort c USING (user_id)
GROUP BY c.cohort_wk, week_offset
ORDER BY c.cohort_wk, week_offset
"""


@query("wl_retention_cohorts", "2.12 composite workloads", _RETENTION_ORACLE)
def wl_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the canonical product-analytics composite:
    users cohort by their first active week (weeks since 2024-01-01,
    integer arithmetic), and each later active week counts them at that
    offset; row (w, k) = users from cohort w still active k weeks in.
    Shape: distinct (user, week) map-side, per-user min-week agg (150
    rows) BROADCAST back — the fact stream never shuffles twice — then one
    grouped distinct count. At 100 TB the cohort table is users-sized, not
    events-sized, so the broadcast stays small relative to the scan."""
    e = load(spark, sf_dir, "events")
    wk = F.floor(F.datediff(F.to_date(F.date_trunc("day", "ts")), F.lit("2024-01-01")) / 7).cast(
        "int"
    )
    ud = e.select("user_id", wk.alias("wk")).distinct()
    cohort = ud.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        ud.join(F.broadcast(cohort), "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_wk", "week_offset")
    )


# -------------------------------------------------------- 2.4 aggregations


@query("agg_hll_partial_merge", "2.4 aggregations", None)
def agg_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch proof for distributed distinct counting: per-lang
    Datasketches HLL sketches of the token vocabulary (hll_sketch_agg)
    union into ONE corpus sketch (hll_union_agg) whose estimate must
    equal the single-pass whole-corpus sketch's — the algebraic property
    that lets a 1000-executor cluster count distincts with a constant-size
    shuffle (sketch bytes, not values) and lets per-partition sketches be
    maintained incrementally and merged on demand. Output pins the
    merge-consistency bit plus both estimates alongside the exact count.
    Rows-only: sketch estimates are engine-specific (DuckDB's HLL differs),
    like agg_approx_distinct; the ±5%-of-exact bound and merge determinism
    are unit-tested (tests/test_roundfour.py)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
    per_lang = tok.groupBy("lang").agg(F.hll_sketch_agg("token").alias("sk"))
    merged = per_lang.agg(
        F.count(F.lit(1)).alias("n_langs"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
    )
    whole = tok.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("token")).alias("global_est"),
        F.countDistinct("token").alias("exact_distinct"),
    )
    return (
        merged.crossJoin(F.broadcast(whole))
        .select(
            "n_langs",
            "exact_distinct",
            "global_est",
            "merged_est",
            (F.col("merged_est") == F.col("global_est")).alias("merge_consistent"),
        )
    )


# ------------------------------------------------ round-4 batch 2 (6 qids)

_SCD2_DIM_ORACLE = """
SELECT event_id,
       CASE WHEN v > 0 THEN v END AS dim_version
FROM (
  SELECT event_id, event_type,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS v
  FROM events
) WHERE event_type = 'click'
ORDER BY event_id
"""


@query("join_scd2_asof_dim", "2.3 joins", _SCD2_DIM_ORACLE)
def join_scd2_asof_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension join WITHOUT a range join: each 'click' fact row
    resolves the SCD2 user-state version active at its event time (versions
    are defined by that user's 'purchase' events; clicks before the first
    purchase get NULL). Instead of joining facts to [valid_from, valid_to)
    intervals — a range join that degenerates to per-key quadratic — the
    dim rows INTERLEAVE with the facts in one window pass: a running count
    of version rows over (user, ts, event_id) IS the as-of version id.
    One shuffle on user_id, no join at all; at 100 TB this is the
    sort-merge shape a temporal fact/dim resolve should compile to."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(w)
    return (
        e.select("event_id", "event_type", v.alias("v"))
        .where(F.col("event_type") == "click")
        .select("event_id", F.when(F.col("v") > 0, F.col("v")).alias("dim_version"))
        .orderBy("event_id")
    )


_BLOOM_JOIN_ORACLE = """
SELECT s_name, count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE s_nationkey % 3 = 0
GROUP BY s_name ORDER BY s_name
"""

_BLOOM_WORDS, _BLOOM_BITS, _BLOOM_K = 16, 1024, 4


def _bloom_positions(key):
    """k md5-derived bit positions in [0, 1024) for an int64 key column."""
    h = F.md5(key.cast("string"))
    return [
        (F.conv(F.substring(h, 1 + 3 * i, 3), 16, 10).cast("long") % _BLOOM_BITS).cast("int")
        for i in range(_BLOOM_K)
    ]


@query("join_bloom_pruned", "2.3 joins", _BLOOM_JOIN_ORACLE)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter (bloom-pruned) join — THE shuffle reducer for a
    selective dim join at 100 TB: the filtered supplier keyset builds a
    1024-bit / k=4 bloom filter as ONE row of 16 int64 words (two tiny
    aggs), which broadcast-cross-joins onto lineitem so every fact row
    probes the filter MAP-SIDE (pure bit arithmetic, no explode, no
    shuffle); only surviving rows enter the exact join, which also removes
    any bloom false positives — so the result is IDENTICAL to the plain
    join (the oracle) while non-matching rows never reach the exchange.
    The from-scratch relational form of Spark's injected runtime bloom
    filters, with the filter payload explicit and portable. Prune
    effectiveness is unit-tested (tests/test_roundfour.py)."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier").where(F.col("s_nationkey") % 3 == 0)

    pos = F.explode(F.array(*_bloom_positions(F.col("s_suppkey")))).alias("pos")
    words = (
        sup.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            # SQL form: the PySpark shiftleft wrapper only takes an int
            # shift amount, the SQL function shifts by an expression
            F.expr("shiftleft(CAST(1 AS BIGINT), pos % 64)").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .agg(F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("m"))
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(_BLOOM_WORDS - 1)),
                lambda w: F.coalesce(F.element_at("m", w), F.lit(0).cast("long")),
            ).alias("words")
        )
    )
    probe = _bloom_positions(F.col("l_suppkey"))
    probed = li.crossJoin(F.broadcast(words)).select(
        "*", *[p.alias(f"_p{i}") for i, p in enumerate(probe)]
    )
    hit = None
    for i in range(_BLOOM_K):
        one = F.expr(
            f"(shiftright(element_at(words, CAST(_p{i} / 64 AS INT) + 1), _p{i} % 64) & 1) = 1"
        )
        hit = one if hit is None else (hit & one)
    survivors = probed.where(hit)
    return (
        survivors.join(F.broadcast(sup.select("s_suppkey", "s_name")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("s_name")
    )


_BASKET_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n
FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY p1, p2
ORDER BY n DESC, p1, p2
LIMIT 20
"""


@query("wl_basket_pairs", "2.12 composite workloads", _BASKET_ORACLE)
def wl_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs ordered together in
    the same order — the association-mining composite. The self-join keys
    on l_orderkey, whose fan-out is bounded by lines-per-order (≤7 here,
    small everywhere), so pair generation is linear in rows × basket size,
    never corpus-quadratic; the distinct pre-pass collapses duplicate
    (order, part) lines before pairing, and the top-20 plans as
    TakeOrderedAndProject after one keyed count."""
    li = load(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    b = op.select(F.col("l_orderkey").alias("k2"), F.col("l_partkey").alias("p2"))
    return (
        op.join(b, (F.col("l_orderkey") == F.col("k2")) & (F.col("l_partkey") < F.col("p2")))
        .groupBy(F.col("l_partkey").alias("p1"), "p2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "p1", "p2")
        .limit(20)
    )


_TOMBSTONE_ORACLE = """
WITH log AS (
  SELECT o_orderkey AS key, v.v AS version,
         CASE (o_orderkey + v.v) % 4 WHEN 0 THEN 'D' WHEN 1 THEN 'I' ELSE 'U' END AS op
  FROM orders, unnest(range(1, 2 + o_orderkey % 3)) AS v(v)
),
latest AS (
  SELECT key, arg_max(op, version) AS last_op, max(version) AS last_v
  FROM log GROUP BY key
)
SELECT count(*) AS n_keys,
       CAST(sum(CASE WHEN last_op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstones,
       CAST(sum(CASE WHEN last_op = 'D' AND last_v < 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(sum(CASE WHEN last_op = 'D' AND last_v >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retained,
       CAST(sum(CASE WHEN last_op <> 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_live
FROM latest
"""


@query("sync_tombstone_retention", "2.8 sync core", _TOMBSTONE_ORACLE)
def sync_tombstone_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone retention audit — the garbage-collection decision a
    log-compacted sync target must make: keys whose LATEST changelog op is a
    delete are tombstones, and tombstones last written before the retention
    watermark (version < 2 in this derived fixture, the
    sync_changelog_compact convention) can be physically dropped; newer
    ones must be retained so lagging consumers still observe the delete.
    One explode + one keyed max_by/max aggregate (map-side combinable) to
    #keys rows, then a single global conditional rollup — no windows, no
    joins, which is what lets a 100 TB compaction pass decide drops in one
    shuffle."""
    o = load(spark, sf_dir, "orders")
    log = o.select(
        F.col("o_orderkey").alias("key"),
        F.explode(F.sequence(F.lit(1), (F.lit(1) + F.col("o_orderkey") % 3).cast("int"))).alias(
            "version"
        ),
    ).select(
        "key",
        "version",
        F.when((F.col("key") + F.col("version")) % 4 == 0, F.lit("D"))
        .when((F.col("key") + F.col("version")) % 4 == 1, F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    latest = log.groupBy("key").agg(
        F.max_by("op", "version").alias("last_op"), F.max("version").alias("last_v")
    )
    is_tomb = F.col("last_op") == "D"
    return latest.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(is_tomb.cast("long")).alias("n_tombstones"),
        F.sum((is_tomb & (F.col("last_v") < 2)).cast("long")).alias("n_dropped"),
        F.sum((is_tomb & (F.col("last_v") >= 2)).cast("long")).alias("n_retained"),
        F.sum((~is_tomb).cast("long")).alias("n_live"),
    )


_WMEDIAN_ORACLE = """
WITH c AS (
  SELECT l_returnflag, CAST(month(l_shipdate) AS INT) AS mon, l_extendedprice,
         sum(CAST(l_quantity AS BIGINT))
           OVER (PARTITION BY l_returnflag, month(l_shipdate)
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber
                 ROWS UNBOUNDED PRECEDING) AS cum,
         sum(CAST(l_quantity AS BIGINT))
           OVER (PARTITION BY l_returnflag, month(l_shipdate)) AS tot
  FROM lineitem
)
SELECT l_returnflag, mon, min(CASE WHEN 2 * cum >= tot THEN l_extendedprice END)
         AS weighted_median
FROM c GROUP BY l_returnflag, mon ORDER BY l_returnflag, mon
"""


@query("agg_weighted_median", "2.4 aggregations", _WMEDIAN_ORACLE)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (quantity-weighted price) per (returnflag, ship
    month): the smallest price whose cumulative weight reaches half the
    group's total. Weights are integral quantities cast to int64, and the
    half-total test is `2*cum >= tot` — pure integer comparison, no
    floating threshold to flap; the median itself is a SELECTED value, so
    no rounding convention is needed. Partitioning by (flag, month) gives
    ~36 window partitions — the parallelism a grouped value-ranking needs
    (contrast the retired 3-key win_range_frame)."""
    li = load(spark, sf_dir, "lineitem")
    # mon must be a REAL column before the windows reference it (Spark
    # rejects lateral column aliases inside window partition specs)
    base = li.select(
        "l_returnflag",
        F.month("l_shipdate").alias("mon"),
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    grp = ["l_returnflag", "mon"]
    wc = (
        Window.partitionBy(*grp)
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*grp)
    c = base.select(
        "l_returnflag",
        "mon",
        "l_extendedprice",
        F.sum("qty").over(wc).alias("cum"),
        F.sum("qty").over(wt).alias("tot"),
    )
    return (
        c.groupBy(*grp)
        .agg(
            F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("l_extendedprice"))).alias(
                "weighted_median"
            )
        )
        .orderBy("l_returnflag", "mon")
    )


_SCENECUT_ORACLE = """
WITH m AS (SELECT doc_id, 1 + doc_id % 6 AS cut FROM documents WHERE doc_id % 5 = 0),
px AS (
  SELECT m.doc_id, m.cut,
         abs(((13 * m.doc_id + 40 + 3 * xs.x + 5 * ys.y) % 256)
             - ((13 * m.doc_id + 3 * xs.x + 5 * ys.y) % 256)) AS d
  FROM m,
       (SELECT unnest(range(0, 8)) AS x) xs,
       (SELECT unnest(range(0, 8)) AS y) ys
)
SELECT doc_id AS media_id, CAST(8 AS INT) AS n_frames, CAST(1 AS INT) AS n_cuts,
       CAST(cut AS INT) AS first_cut,
       round(sum(d) / 64.0, 4) AS cut_diff
FROM px GROUP BY doc_id, cut ORDER BY media_id
"""


@query("multimodal_video_scenecut", "2.9 llm-data", _SCENECUT_ORACLE)
def multimodal_video_scenecut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video columns, end-to-end: each media row synthesizes a REAL binary
    video container (header `VID0|n|w|h` + 8 concatenated 8×8 raw
    grayscale frames; pixels closed-form in doc_id with a scene change at
    frame `1 + doc_id % 6`), and a second Arrow-batched mapInPandas stage
    PARSES THE BYTES back — header, frame stride, reshape — and runs
    vectorized scene-cut detection (mean absolute inter-frame difference
    > 20). The oracle recomputes `(n_frames, n_cuts, first_cut, cut_diff)`
    from the closed form and never sees the bytes, so a container-layout,
    stride, or diff bug mismatches. Same 100 TB shape as the image/audio
    codecs: blobs are born, parsed, and reduced to slim feature rows
    inside one partition — frames never shuffle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    d = load(spark, sf_dir, "documents").where("doc_id % 5 = 0").select("doc_id")
    n_frames, w, h, thresh = 8, 8, 8, 20.0

    def synth(batches):
        for pdf in batches:
            payloads = []
            for m in pdf["doc_id"]:
                m = int(m)
                cut = 1 + m % 6
                y, x = np.mgrid[0:h, 0:w]
                frames = [
                    ((13 * m + 40 * (1 if f >= cut else 0) + 3 * x + 5 * y) % 256).astype(
                        np.uint8
                    )
                    for f in range(n_frames)
                ]
                blob = b"VID0" + bytes([n_frames, w, h]) + b"".join(f.tobytes() for f in frames)
                payloads.append(blob)
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    media = d.mapInPandas(
        synth,
        schema=T.StructType(
            [T.StructField("media_id", T.LongType()), T.StructField("payload", T.BinaryType())]
        ),
    )

    def detect(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                blob = bytes(blob)
                assert blob[:4] == b"VID0", "bad container magic"
                nf, fw, fh = blob[4], blob[5], blob[6]
                frames = np.frombuffer(blob, dtype=np.uint8, offset=7).reshape(nf, fh, fw)
                diffs = np.abs(np.diff(frames.astype(np.int16), axis=0)).mean(axis=(1, 2))
                cuts = np.nonzero(diffs > thresh)[0] + 1  # cut index = first frame of new scene
                rows.append(
                    (
                        int(mid),
                        int(nf),
                        int(len(cuts)),
                        int(cuts[0]) if len(cuts) else None,
                        float(round(float(diffs[cuts[0] - 1]), 4)) if len(cuts) else None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_frames", "n_cuts", "first_cut", "cut_diff"]
            )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("n_cuts", T.IntegerType()),
            T.StructField("first_cut", T.IntegerType()),
            T.StructField("cut_diff", T.DoubleType()),
        ]
    )
    return media.mapInPandas(detect, schema=out_schema).orderBy("media_id")


# ------------------------------------------------ round-4 batch 3 (4 qids)

_TREND_ORACLE = """
WITH pt AS (
  SELECT l_returnflag,
         (CAST(year(l_shipdate) AS BIGINT) - 1995) * 12 + month(l_shipdate) AS x,
         CAST(round(round(avg(l_extendedprice), 2) * 100, 0) AS BIGINT) AS yc
  FROM lineitem GROUP BY l_returnflag, x
),
s AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
         CAST(sum(x * yc) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM pt GROUP BY l_returnflag
)
SELECT l_returnflag, n AS n_months,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (100.0 * CAST(n * sxx - sx * sx AS DOUBLE)), 4) AS slope_per_month
FROM s ORDER BY l_returnflag
"""


@query("wl_price_trend_slope", "2.12 composite workloads", _TREND_ORACLE)
def wl_price_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS trend slope of the monthly average price per returnflag — linear
    regression AS AN AGGREGATE (the closed-form normal equation), the way
    a 100 TB engine fits millions of tiny per-group models: no solver, no
    iteration, just sums. Determinism: the monthly averages snap to
    2 decimals and then to int64 cents, the month index is an integer, so
    every Σx, Σy, Σxy, Σx² is EXACT int64 (order-free) and the single
    final division is identical IEEE in both engines. Two keyed aggregates
    — months per flag, then one row per flag; both map-side combinable."""
    li = load(spark, sf_dir, "lineitem")
    x = ((F.year("l_shipdate") - 1995) * 12 + F.month("l_shipdate")).cast("long")
    pt = (
        li.groupBy("l_returnflag", x.alias("x"))
        .agg(F.round(F.round(F.avg("l_extendedprice"), 2) * 100, 0).cast("long").alias("yc"))
    )
    s = pt.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("x") * F.col("yc")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = 100.0 * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return s.select(
        "l_returnflag",
        F.col("n").alias("n_months"),
        F.round(num / den, 4).alias("slope_per_month"),
    ).orderBy("l_returnflag")


_EVOLVE_ORACLE = """
SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN o_orderkey % 97 = 0 OR o_orderkey % 101 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_channel,
       CAST(sum(CASE WHEN o_orderkey % 97 <> 0 AND o_orderkey % 101 <> 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_null_channel,
       round(sum(o_totalprice), 2) AS total
FROM orders
"""


@query("sync_schema_evolution_apply", "2.8 sync core", _EVOLVE_ORACLE)
def sync_schema_evolution_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE apply under ADDITIVE SCHEMA EVOLUTION: the source grew a new
    column (o_channel) the target never had. The changeset-driven apply
    (the sync_merge_apply shape) upserts touched rows WITH the new column
    while untouched target rows carry NULL — additive drift needs no
    rewrite of historical rows, exactly the 100 TB posture of
    scan_schema_merge's footer-level evolution, now proven through the
    MERGE write path. Fixture: standard derived drift (target missing
    %97 keys = inserts, %101 status-drifted = updates); converged row set
    equals source, and the oracle pins WHICH rows carry the new column
    (only the touched ones), so an over-eager backfill or a dropped
    column both hash-fail."""
    o = load(spark, sf_dir, "orders")
    channel = (F.col("o_orderkey") % 3).cast("int").alias("o_channel")
    source = o.select("*", channel)
    target = (
        o.where(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 101 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")),
        )
    )
    # changeset: inserts (missing in target) + updates (digest differs) —
    # keyed on PK; the evolved column rides only the source-sourced rows
    upserts = source.join(
        target.select(F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("st")),
        (F.col("o_orderkey") == F.col("k")),
        "left",
    ).where(F.col("k").isNull() | (F.col("st") != F.col("o_orderstatus"))).select(source.columns)
    kept = target.join(upserts.select("o_orderkey"), "o_orderkey", "left_anti").withColumn(
        "o_channel", F.lit(None).cast("int")
    )
    merged = kept.unionByName(upserts)
    return merged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("o_channel").isNotNull().cast("long")).alias("n_with_channel"),
        F.sum(F.col("o_channel").isNull().cast("long")).alias("n_null_channel"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


_MOM_ORACLE = """
WITH m AS (
  SELECT c_mktsegment,
         (CAST(year(o_orderdate) AS BIGINT) - 1995) * 12 + month(o_orderdate) AS x,
         round(sum(o_totalprice), 2) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, x
)
SELECT c_mktsegment, x AS ym,
       round((rev - lag(rev) OVER w) / lag(rev) OVER w, 4) AS mom_change
FROM m
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY x)
ORDER BY c_mktsegment, ym
"""


@query("win_pct_change_mom", "2.5 windows", _MOM_ORACLE)
def win_pct_change_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change per market segment — the standard
    KPI window, built scale-correctly: the fact stream first collapses to
    a (segment, month) series (map-side-combinable agg; the customer dim
    broadcasts), and ONLY that tiny series is window-sorted — lag runs
    over ~80 rows per segment, not 15k orders. Revenue snaps to 2 decimals
    BEFORE the ratio, so both engines divide identical doubles; first
    month per segment is NULL by lag semantics."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    x = ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")).cast("long")
    m = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", x.alias("x"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("x")
    prev = F.lag("rev").over(w)
    return m.select(
        "c_mktsegment",
        F.col("x").alias("ym"),
        F.round((F.col("rev") - prev) / prev, 4).alias("mom_change"),
    ).orderBy("c_mktsegment", "ym")


_CSV_EDGE_ORACLE = """
WITH f AS (
  SELECT n_nationkey,
         n_name || ', "region ' || CAST(n_regionkey AS VARCHAR) || '"' || chr(10)
           || 'line2 of ' || n_name AS note
  FROM nation
)
SELECT count(*) AS n_rows,
       CAST(sum(length(note)) AS BIGINT) AS total_chars,
       CAST(sum(CASE WHEN contains(note, chr(10)) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_multiline,
       count(DISTINCT n_nationkey) AS n_keys
FROM f
"""


@query("scan_csv_multiline_quoted", "2.1 scans", _CSV_EDGE_ORACLE)
def scan_csv_multiline_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV quoting edge cases, round-tripped LIVE: a synthesized field with
    embedded commas, double quotes, AND newlines writes through Spark's
    CSV sink (quoted + escaped) and reads back with multiLine=true — the
    ingestion reality of feeds with free-text columns, where naive
    line-splitting corrupts rows. The oracle recomputes the aggregate from
    the closed-form field, so ANY quoting/escaping/multiline bug (row
    count drift from split records, char loss from mangled escapes)
    hash-fails. Note multiLine CSV is NOT line-splittable at 100 TB — a
    feed like this should land once and convert to parquet immediately,
    which is exactly what this round-trip stages."""
    import hashlib
    import os
    import tempfile

    n = load(spark, sf_dir, "nation")
    note = F.concat(
        F.col("n_name"),
        F.lit(', "region '),
        F.col("n_regionkey").cast("string"),
        F.lit('"\nline2 of '),
        F.col("n_name"),
    )
    # pid-keyed staging (the _derby_url precedent): a concurrent process —
    # e.g. the vanilla-session subprocess gate — must never race this
    # process's overwrite-then-read on the same directory
    tag = hashlib.md5(f"csvedge:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), f"hdc_csvedge_{tag}")
    n.select("n_nationkey", note.alias("note")).write.mode("overwrite").option(
        "header", True
    ).option("quoteAll", True).csv(out)
    back = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .schema("n_nationkey int, note string")
        .csv(out)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("note")).alias("total_chars"),
        F.sum(F.col("note").contains("\n").cast("long")).alias("n_multiline"),
        F.countDistinct("n_nationkey").alias("n_keys"),
    )


# ------------------------------------------------ round-4 batch 4 (9 qids)

_LAMBDA_ORACLE = """
WITH a AS (
  SELECT o_orderkey, range(1, 2 + o_orderkey % 5) AS arr FROM orders
),
d AS (
  SELECT o_orderkey,
         CAST(list_sum(list_transform(arr, x -> x * x)) AS BIGINT) AS sq_sum,
         CAST(len(list_filter(arr, x -> x % 2 = 0)) AS INT) AS n_even,
         len(list_filter(arr, x -> x > 3)) > 0 AS has_gt3,
         len(list_filter(arr, x -> x > 0)) = len(arr) AS all_pos,
         CAST(list_sum(list_transform(range(1, len(arr) + 1),
                                      i -> arr[i] * i)) AS BIGINT) AS idx_dot
  FROM a
)
SELECT CAST(sum(sq_sum) AS BIGINT) AS total_sq,
       CAST(sum(n_even) AS BIGINT) AS total_even,
       CAST(sum(CASE WHEN has_gt3 THEN 1 ELSE 0 END) AS BIGINT) AS n_has_gt3,
       CAST(sum(CASE WHEN all_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_all_pos,
       CAST(sum(idx_dot) AS BIGINT) AS total_idx_dot
FROM d
"""


@query("fn_array_lambda_suite", "2.7 scalar functions", _LAMBDA_ORACLE)
def fn_array_lambda_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lambda half of the higher-order array API — transform, filter,
    exists, forall, and an index-aware zip_with — over derived integer
    arrays (`sequence(1, 1 + key % 5)`), complementing fn_array_suite's
    transform/aggregate pair. Pure integer math, so every rollup is exact
    int64 in both engines. All map-side expressions until one global
    aggregate; HOFs run interpreted (no codegen) but shuffle nothing."""
    o = load(spark, sf_dir, "orders")
    arr = F.sequence(F.lit(1), (F.lit(1) + F.col("o_orderkey") % 5).cast("int"))
    d = o.select(
        F.aggregate(
            F.transform(arr, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sq_sum"),
        F.size(F.filter(arr, lambda x: x % 2 == 0)).alias("n_even"),
        F.exists(arr, lambda x: x > 3).alias("has_gt3"),
        F.forall(arr, lambda x: x > 0).alias("all_pos"),
        F.aggregate(
            F.zip_with(
                arr,
                F.sequence(F.lit(1), F.size(arr)),
                lambda x, i: (x * i).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("idx_dot"),
    )
    return d.agg(
        F.sum("sq_sum").alias("total_sq"),
        F.sum(F.col("n_even").cast("long")).alias("total_even"),
        F.sum(F.col("has_gt3").cast("long")).alias("n_has_gt3"),
        F.sum(F.col("all_pos").cast("long")).alias("n_all_pos"),
        F.sum("idx_dot").alias("total_idx_dot"),
    )


_GCOUNTER_ORACLE = """
WITH obs AS (
  SELECT o_orderkey AS key, r.r AS replica, o.o AS obs_idx,
         (o_orderkey * 7 + r.r * 13 + o.o * 3) % 100 AS observed
  FROM orders,
       (SELECT unnest(range(0, 3)) AS r) r,
       (SELECT unnest(range(0, 2)) AS o) o
),
merged AS (
  SELECT key, replica, max(observed) AS state FROM obs GROUP BY key, replica
),
totals AS (
  SELECT key, CAST(sum(state) AS BIGINT) AS counter_value FROM merged GROUP BY key
)
SELECT CAST(key % 4 AS INT) AS key_class, count(*) AS n_keys,
       CAST(sum(counter_value) AS BIGINT) AS total,
       CAST(max(counter_value) AS BIGINT) AS max_counter
FROM totals GROUP BY key_class ORDER BY key_class
"""


@query("sync_crdt_gcounter", "2.8 sync core", _GCOUNTER_ORACLE)
def sync_crdt_gcounter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRDT G-counter merge — the convergence algebra under multi-master
    sync when replicas cannot coordinate: each replica's per-key slot only
    grows, merge = elementwise MAX of replica slots (associative,
    commutative, idempotent — re-delivered states merge harmlessly), value
    = sum of merged slots. The fixture derives two observed states per
    (key, replica); a LWW resolver (sync_conflict_lww) would pick one
    writer, the G-counter keeps every replica's contribution. Two keyed
    map-side-combinable aggregates (MAX then SUM) — merge cost is one
    shuffle regardless of how many stale states are re-delivered."""
    o = load(spark, sf_dir, "orders")
    obs = (
        o.select(F.col("o_orderkey").alias("key"))
        .select("key", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("replica"))
        .select("key", "replica", F.explode(F.sequence(F.lit(0), F.lit(1))).alias("obs_idx"))
        .select(
            "key",
            "replica",
            ((F.col("key") * 7 + F.col("replica") * 13 + F.col("obs_idx") * 3) % 100).alias(
                "observed"
            ),
        )
    )
    merged = obs.groupBy("key", "replica").agg(F.max("observed").alias("state"))
    totals = merged.groupBy("key").agg(F.sum("state").alias("counter_value"))
    return (
        totals.groupBy((F.col("key") % 4).cast("int").alias("key_class"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("counter_value").alias("total"),
            F.max("counter_value").alias("max_counter"),
        )
        .orderBy("key_class")
    )


# Coarse codebook for cell-blocked semantic dedup: K closed-form integer
# centroids — cent(c)[j] = ((j + 1) * (2*c + 3) * 11) % 41 - 20 — so both
# engines derive identical literals at ANY K. K is THE scale dial: cells
# shard the quadratic pair scan, so K grows with corpus size
# (K ~ n / target_cell_size). K=16 here; the r4 10x stress probe measured
# the cliff at K=4 (6.9s -> 95s for 10x vectors) and the fix is more
# cells, not a different algorithm.
_SEM_K = 16


def _sem_cent(c: int) -> list[int]:
    return [((j + 1) * (2 * c + 3) * 11) % 41 - 20 for j in range(64)]


def _semantic_dedup_oracle() -> str:
    def dot(c: list[int]) -> str:
        arr = "[" + ", ".join(str(v) for v in c) + "]"
        return (
            "cast(list_sum(list_transform(range(1, 65), i -> "
            f"cast(round(embedding[i] * 1000, 0) AS BIGINT) * ({arr})[i])) AS BIGINT)"
        )

    dots = ",\n         ".join(f"{dot(_sem_cent(k))} AS d{k}" for k in range(_SEM_K))
    best = (
        "CASE "
        + " ".join(
            "WHEN "
            + " AND ".join(f"d{c} >= d{o}" for o in range(_SEM_K) if o != c)
            + f" THEN {c}"
            for c in range(_SEM_K - 1, -1, -1)
        )
        + " END"
    )
    return f"""
WITH dots AS (
  SELECT vec_id, embedding,
         {dots}
  FROM embeddings
),
cells AS (SELECT vec_id, embedding, {best} AS cell FROM dots),
pairs AS (
  SELECT a.cell,
         cast(list_sum(list_transform(range(1, 65), i ->
             cast(round(a.embedding[i] * 1000, 0) AS BIGINT)
             * cast(round(b.embedding[i] * 1000, 0) AS BIGINT))) AS BIGINT) AS pdot
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT c.cell, count(DISTINCT c.vec_id) AS n_members,
       coalesce(CAST(p.n_near AS BIGINT), 0) AS n_near_pairs
FROM cells c
LEFT JOIN (SELECT cell, count(*) AS n_near FROM pairs WHERE pdot >= 150000
           GROUP BY cell) p
  ON c.cell = p.cell
GROUP BY c.cell, p.n_near ORDER BY c.cell
"""


@query("dedup_semantic_centroid", "2.9 llm-data", _semantic_dedup_oracle(), bench=True)
def dedup_semantic_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-blocked embedding near-dup — the IVF-style SCALE PATH for
    semantic dedup: embeddings first assign to K coarse centroids (exact
    int64 argmax over the closed-form codebook, ties toward the greatest
    cell), and the quadratic pair scan runs ONLY inside each cell —
    candidate pairs drop from O(n^2) to sum(|cell|^2), and cells shard
    across the cluster. K is the scale dial (K ~ n / target_cell_size):
    the r4 10x stress probe measured 95s at K=4 vs the K=16 form here —
    the remedy for growth is MORE cells, same algorithm. Near pair =
    exact int64 dot >= 150000 (~cos 0.15 at 1e-3 quantization). Compare
    dedup_embedding_cosine (label-blocked exact baseline): same pair
    math, blocking key learned from the data instead of a given label.
    Output: per non-empty cell (n_members, n_near_pairs)."""
    e = load(spark, sf_dir, "embeddings")
    q = F.transform("embedding", lambda x: F.round(x.cast("double") * 1000, 0).cast("long"))
    dots = [
        F.aggregate(
            F.zip_with(
                "q", F.array(*[F.lit(v) for v in _sem_cent(k)]), lambda x, y: x * y.cast("long")
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias(f"d{k}")
        for k in range(_SEM_K)
    ]
    cell = F.greatest(
        *[F.struct(F.col(f"d{k}").alias("d"), F.lit(k).alias("c")) for k in range(_SEM_K)]
    )["c"]
    cells = (
        e.select("vec_id", q.alias("q"))
        .select("vec_id", "q", *dots)
        .select("vec_id", "q", cell.alias("cell"))
        # consumed 3x (both self-join sides + member census); the K x 64-dim
        # argmax is the expensive part — materialize it once
        .localCheckpoint()
    )
    b = cells.select(
        F.col("cell").alias("cell2"), F.col("vec_id").alias("v2"), F.col("q").alias("q2")
    )
    pdot = F.aggregate(
        F.zip_with("q", "q2", lambda x, y: x * y), F.lit(0).cast("long"), lambda a, x: a + x
    )
    near = (
        cells.join(b, (F.col("cell") == F.col("cell2")) & (F.col("vec_id") < F.col("v2")))
        .select("cell", pdot.alias("pdot"))
        .where(F.col("pdot") >= 150000)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_near_pairs"))
    )
    members = cells.groupBy("cell").agg(F.countDistinct("vec_id").alias("n_members"))
    return (
        members.join(near, "cell", "left")
        .select(
            "cell",
            "n_members",
            F.coalesce(F.col("n_near_pairs"), F.lit(0).cast("long")).alias("n_near_pairs"),
        )
        .orderBy("cell")
    )


_SEASONAL_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n
  FROM events GROUP BY d
),
scored AS (
  SELECT a.d, a.n AS actual, f.n AS forecast
  FROM daily a JOIN daily f ON f.d = a.d - INTERVAL 7 DAY
  WHERE a.d >= DATE '2024-01-22'
)
SELECT count(*) AS n_days,
       CAST(sum(abs(actual - forecast)) AS BIGINT) AS total_abs_err,
       round(CAST(sum(abs(actual - forecast)) AS DOUBLE) / count(*), 4) AS mae,
       CAST(max(abs(actual - forecast)) AS BIGINT) AS max_abs_err
FROM scored
"""


@query("ts_seasonal_naive_forecast", "2.10 streaming", _SEASONAL_ORACLE)
def ts_seasonal_naive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every forecasting
    pipeline must beat: predict each day's event count with the count from
    7 days earlier, score MAE/max-error over the holdout tail (days from
    Jan 22). Integer counts make every error metric exact. Shape: one
    keyed daily rollup (map-side combinable), then a self-equi-join on the
    shifted date — a calendar join, not a window, so the series can shard
    by date range at 100 TB."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    f = daily.select(F.date_add("d", 7).alias("fd"), F.col("n").alias("forecast"))
    scored = (
        daily.join(f, daily.d == f.fd)
        .where(F.col("d") >= F.lit("2024-01-22").cast("date"))
        .select(F.col("n").alias("actual"), "forecast")
    )
    err = F.abs(F.col("actual") - F.col("forecast"))
    return scored.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(err).alias("total_abs_err"),
        F.round(F.sum(err).cast("double") / F.count(F.lit(1)), 4).alias("mae"),
        F.max(err).alias("max_abs_err"),
    )


_ABC_ORACLE = """
WITH pr AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT l_partkey, rev,
         CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(rev) OVER () AS BIGINT) AS tot
  FROM pr
)
SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
            WHEN cum * 100 <= tot * 95 THEN 'B' ELSE 'C' END AS abc_class,
       count(*) AS n_parts,
       round(CAST(sum(rev) AS DOUBLE) / 1e4, 2) AS class_revenue
FROM ranked GROUP BY abc_class ORDER BY abc_class
"""


@query("wl_abc_pareto", "2.12 composite workloads", _ABC_ORACLE)
def wl_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification — parts bucketed by cumulative revenue
    share (A ≤ 80%, B ≤ 95%, C rest), the inventory-analytics composite.
    Scale-correct: the fact stream reduces to per-part EXACT int64
    1e-4-unit revenues first (the wl_product_profit money path — 2-decimal
    price × 2-decimal discount factor terminates at 4 decimals), and only
    the #parts-row series is window-scanned; class boundaries compare
    `cum*100 <= tot*{80,95}` in pure integers, so no float share can flap
    a part across classes. The global-ORDER window is the honest cost: a
    Pareto ranking is inherently a total order over parts (#parts ≪
    #rows); at 100 TB the per-part agg shards, the ranking runs over the
    reduced series."""
    li = load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc = F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
    pr = li.groupBy("l_partkey").agg(F.sum(cents * disc).alias("rev"))
    w = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    ranked = pr.select(
        "l_partkey",
        "rev",
        F.sum("rev").over(w).alias("cum"),
        F.sum("rev").over(wt).alias("tot"),
    )
    cls = (
        F.when(F.col("cum") * 100 <= F.col("tot") * 80, F.lit("A"))
        .when(F.col("cum") * 100 <= F.col("tot") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        ranked.groupBy(cls.alias("abc_class"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("rev").cast("double") / 1e4, 2).alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


_RFM_ORACLE = """
WITH rfm AS (
  SELECT o_custkey,
         CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '2001-09-01') AS BIGINT)
           AS recency,
         count(*) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT ntile(4) OVER (ORDER BY recency, o_custkey) AS r_score,
         ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
         ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
  FROM rfm
)
SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score, count(*) AS n_customers
FROM scored GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


@query("wl_rfm_segmentation", "2.12 composite workloads", _RFM_ORACLE)
def wl_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary quartile
    scores (ntile(4), best = 1) and the segment census, the canonical CRM
    composite. Determinism: every metric is exact (day diff, count, int64
    cents) and every ntile carries a custkey tiebreak so quartile
    boundaries cannot flap; ntile's larger-earlier-bucket fill rule is the
    same in both engines. Shape: one keyed agg to #customers rows, three
    windows over that reduced table, one final census agg."""
    o = load(spark, sf_dir, "orders")
    ref = F.lit("2001-09-01").cast("date")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(ref, F.to_date(F.max("o_orderdate"))).cast("long").alias("recency"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("monetary"),
    )
    scored = rfm.select(
        F.ntile(4).over(Window.orderBy("recency", "o_custkey")).alias("r_score"),
        F.ntile(4).over(Window.orderBy(F.desc("frequency"), "o_custkey")).alias("f_score"),
        F.ntile(4).over(Window.orderBy(F.desc("monetary"), "o_custkey")).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )


_BINFILES_ORACLE = """
WITH f AS (
  SELECT n_nationkey,
         repeat(n_name || '|', 1 + n_nationkey % 4) AS content
  FROM nation
)
SELECT count(*) AS n_files,
       CAST(sum(length(content)) AS BIGINT) AS total_bytes,
       count(DISTINCT md5(content)) AS n_distinct_payloads
FROM f
"""


@query("scan_binary_files", "2.1 scans", _BINFILES_ORACLE)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `binaryFile` source — Spark's whole-file ingestion path for blob
    corpora (images, audio, models): each staged file becomes one row of
    (path, modificationTime, length, content). Closed-form per-nation
    payloads are staged as real files, read back via binaryFile, and
    reduced to count / byte-total / distinct-payload-md5 — path and mtime
    (non-deterministic) never reach the output. At 100 TB the caveat is
    the point: one row per FILE, no splitting — binaryFile is the landing
    read that feeds a parquet conversion (cf. multimodal_* which process
    blob COLUMNS after exactly that conversion)."""
    import hashlib
    import os
    import tempfile

    n = load(spark, sf_dir, "nation")
    rows = n.select(
        "n_nationkey",
        F.repeat(F.concat(F.col("n_name"), F.lit("|")), (1 + F.col("n_nationkey") % 4).cast("int")).alias(
            "content"
        ),
    ).collect()  # 25 rows: driver-side staging of the FILE fixture only
    tag = hashlib.md5(f"binfiles:{sf_dir}:{os.getpid()}".encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), f"hdc_binfiles_{tag}")
    os.makedirs(out, exist_ok=True)
    for r in rows:
        with open(os.path.join(out, f"blob_{r.n_nationkey}.bin"), "wb") as f:
            f.write(r.content.encode())
    df = spark.read.format("binaryFile").load(out)
    return df.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.countDistinct(F.md5("content")).alias("n_distinct_payloads"),
    )


_ARROW_UDF_ORACLE = """
SELECT CAST(n_nationkey % 5 AS INT) AS bucket,
       CAST(sum(CAST(string_split(n_name, '_')[2] AS BIGINT) * 2 + 1) AS BIGINT)
         AS total_score
FROM nation GROUP BY bucket ORDER BY bucket
"""


@query("udf_arrow_python", "2.11 UDF surface", _ARROW_UDF_ORACLE)
def udf_arrow_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED Python scalar UDF (`useArrow=True`, Spark 3.5+/4):
    same row-wise author experience as udf_python_scalar, but arguments
    and results cross the JVM/Python boundary as Arrow batches instead of
    pickled rows — the drop-in serialization upgrade when a true pandas
    vectorization (udf_pandas_scalar) is not feasible. The suffix-parse
    scoring here is deliberately row-wise Python; the oracle recomputes
    it relationally."""
    n = load(spark, sf_dir, "nation")

    @F.udf("long", useArrow=True)
    def score(name: str) -> int:
        return int(name.split("_")[1]) * 2 + 1

    return (
        n.groupBy((F.col("n_nationkey") % 5).cast("int").alias("bucket"))
        .agg(F.sum(score("n_name")).alias("total_score"))
        .orderBy("bucket")
    )


_FFILL_ORACLE = """
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN round(value, 2) END AS pval
  FROM events
),
f AS (
  SELECT user_id, event_id,
         last_value(pval IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS last_purchase_value
  FROM s
)
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CASE WHEN last_purchase_value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_before_first,
       round(max(last_purchase_value), 2) AS max_carried
FROM f GROUP BY user_id ORDER BY user_id
"""


@query("win_ignore_nulls_ffill", "2.5 windows", _FFILL_ORACLE)
def win_ignore_nulls_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill via IGNORE NULLS — the standard last-observation-
    carried-forward window (`last_value(x IGNORE NULLS)` /
    `F.last(x, ignorenulls=True)`): every event carries the most recent
    purchase value of its user, NULL before the first purchase. The
    per-user rollup keeps output compact while pinning the fill semantics
    (NULL-gap counting + carried maxima). One window pass partitioned by
    user_id; forward-fill at 100 TB is exactly this shape, never a
    self-join."""
    e = load(spark, sf_dir, "events")
    pval = F.when(F.col("event_type") == "purchase", F.round("value", 2))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    f = e.select(
        "user_id",
        F.last(pval, ignorenulls=True).over(w).alias("last_purchase_value"),
    )
    return (
        f.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("last_purchase_value").isNull().cast("long")).alias("n_before_first"),
            F.round(F.max("last_purchase_value"), 2).alias("max_carried"),
        )
        .orderBy("user_id")
    )
