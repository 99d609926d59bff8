"""SURVEY.md §2 round-5 additions, batch S.

Doc-level co-occurrence PMI, unicode length semantics, integer-exact
k-means codebook training, and a difference-in-differences uplift
workload. Registered after ``roundfive_i`` (plans/__init__.py) so the
qids append to the END of the never-checked rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# --------------- 2.9 llm-data: doc-level co-occurrence PMI

# ONE expression string for the PMI double math, formatted into both
# engines verbatim (shared-expression-string discipline).
_PMI_EXPR = (
    "round(ln(cast(c_xy as double) * cast(n_docs as double)"
    " / (cast(c_x as double) * cast(c_y as double))), 4)"
)

_PMI_ORACLE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok),
df AS (SELECT token, COUNT(*) AS df FROM tok GROUP BY token),
pairs AS (
  SELECT a.token AS token_a, b.token AS token_b, COUNT(*) AS c_xy
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY a.token, b.token
)
SELECT token_a, token_b,
       CAST(c_xy AS BIGINT) AS c_xy,
       {_PMI_EXPR} AS pmi
FROM (
  SELECT p.token_a, p.token_b, p.c_xy,
         da.df AS c_x, db.df AS c_y, n.n_docs
  FROM pairs p
  JOIN df da ON da.token = p.token_a
  JOIN df db ON db.token = p.token_b
  CROSS JOIN n
)
ORDER BY c_xy DESC, token_a, token_b LIMIT 20
"""


@query("text_cooccurrence_pmi", "2.9 llm-data", _PMI_ORACLE)
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring in a doc.

    The distributional-association primitive (collocation discovery,
    taxonomy seeds, phrase mining): PMI = ln(P(x,y) / (P(x)P(y))) over
    document-level co-occurrence. All counts are exact integers; the ONE
    double expression (ln of a ratio of exact ints) is a shared string
    formatted into both engines, and the top-k ordering is on the
    INTEGER count (double-tie-free), with PMI as a value column.

    Scale shape: distinct (doc, token) reduces map-side; the pair join
    is an equi-join on doc_id whose fan-out is Σ_doc t_d² — on a real
    open vocabulary it needs the df-cap discipline of
    `dedup_near_jaccard` (hot tokens excluded), noted here because this
    corpus's closed 31-token vocabulary bounds t_d ≤ 31 by itself;
    marginals broadcast to the pair table (two tiny dimension joins)."""
    # tok feeds the doc count, the df marginals, and BOTH pair-join sides —
    # checkpoint so the corpus explode runs once (r10 plan audit: 5 fact
    # scans in one plan without this).
    tok = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    df = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    a = tok.select(F.col("doc_id"), F.col("token").alias("token_a"))
    b = tok.select(F.col("doc_id"), F.col("token").alias("token_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    enriched = (
        pairs.join(
            F.broadcast(df.select(F.col("token").alias("token_a"), F.col("df").alias("c_x"))),
            "token_a",
        )
        .join(
            F.broadcast(df.select(F.col("token").alias("token_b"), F.col("df").alias("c_y"))),
            "token_b",
        )
        .crossJoin(F.broadcast(n))
    )
    return (
        enriched.select(
            "token_a",
            "token_b",
            "c_xy",
            F.expr(_PMI_EXPR).alias("pmi"),
        )
        .orderBy(F.col("c_xy").desc(), "token_a", "token_b")
        .limit(20)
    )


# --------------- 2.7 scalar functions: unicode length semantics

_UNICODE_ORACLE = """
WITH v AS (
  SELECT n_name || 'é中\U0001F600' AS s FROM nation
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(length(s)) AS BIGINT) AS total_chars,
       CAST(SUM(strlen(s)) AS BIGINT) AS total_bytes,
       CAST(SUM(length(upper(s))) AS BIGINT) AS total_chars_upper,
       CAST(SUM(strlen(substr(s, length(s) - 2, 3))) AS BIGINT)
         AS tail3_bytes
FROM v
"""


@query("fn_unicode_lengths", "2.7 scalar functions", _UNICODE_ORACLE)
def fn_unicode_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character vs byte length semantics on multibyte text.

    The classic ingestion trap: `length()` counts CODEPOINTS in both
    engines, byte width (`octet_length` / DuckDB `strlen`) differs per
    codepoint (é=2, 中=3, emoji=4 bytes in UTF-8) — the distinction
    that sizes varchar targets, validates truncation limits, and prices
    storage. Each nation name gets the same three multibyte suffix
    codepoints (2+3+4 UTF-8 bytes, passed as a literal — Spark's chr()
    wraps at 256, so chr() cannot mint them portably); substr/upper must
    operate on codepoints (the 3-codepoint tail spans 9 bytes), probed
    by the tail3_bytes column.

    Scale shape: pure map-side string codegen + one global census."""
    v = load(spark, sf_dir, "nation").select(
        F.concat("n_name", F.lit("é中\U0001F600")).alias("s")
    )
    return v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("s")).alias("total_chars"),
        F.sum(F.octet_length("s")).alias("total_bytes"),
        F.sum(F.length(F.upper("s"))).alias("total_chars_upper"),
        F.sum(F.expr("octet_length(substr(s, length(s) - 2, 3))")).alias(
            "tail3_bytes"
        ),
    )


# --------------- 2.9 llm-data: integer-exact k-means codebook training

# SINGLE-ARG round, deliberately: the catalog's round-normalization
# rewrites two-arg round(E, n) into a decimal cast, and DuckDB's
# double->decimal cast rounds HALF-EVEN while Spark's rounds HALF-UP —
# an exactly-representable .5 (e.g. float 0.0625 * 1000 = 62.5) diverges
# by one unit (measured: one cluster's inertia off by 529 at sf0.1).
# Raw round() agrees between the engines on doubles at scale 0, and
# normalize leaves the single-arg form untouched.
_KMEANS_Q = "list_transform(range(1, 65), i -> CAST(round(embedding[i] * 1000) AS BIGINT))"

_KMEANS_ORACLE = f"""
WITH samp AS (
  SELECT vec_id, {_KMEANS_Q} AS q FROM embeddings WHERE vec_id % 7 = 0
),
seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, q AS c
  FROM samp ORDER BY vec_id LIMIT 4
),
a1 AS (
  SELECT * FROM (
    SELECT s.vec_id, s.q, sd.k,
           list_sum(list_transform(range(1, 65),
             i -> (s.q[i] - sd.c[i]) * (s.q[i] - sd.c[i]))) AS d2,
           row_number() OVER (PARTITION BY s.vec_id
             ORDER BY list_sum(list_transform(range(1, 65),
               i -> (s.q[i] - sd.c[i]) * (s.q[i] - sd.c[i]))), sd.k) AS rn
    FROM samp s CROSS JOIN seeds sd
  ) WHERE rn = 1
),
cdims AS (
  SELECT a1.k, i.i AS dim, SUM(q[CAST(i.i AS INT)]) // COUNT(*) AS cv
  FROM a1, unnest(range(1, 65)) AS i(i)
  GROUP BY a1.k, i.i
),
cents1 AS (SELECT k, list(cv ORDER BY dim) AS c FROM cdims GROUP BY k),
a2 AS (
  SELECT * FROM (
    SELECT s.vec_id, c1.k,
           list_sum(list_transform(range(1, 65),
             i -> (s.q[i] - c1.c[i]) * (s.q[i] - c1.c[i]))) AS d2,
           row_number() OVER (PARTITION BY s.vec_id
             ORDER BY list_sum(list_transform(range(1, 65),
               i -> (s.q[i] - c1.c[i]) * (s.q[i] - c1.c[i]))), c1.k) AS rn
    FROM samp s CROSS JOIN cents1 c1
  ) WHERE rn = 1
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(d2) AS BIGINT) AS inertia
FROM a2 GROUP BY k ORDER BY k
"""


@query("simsearch_kmeans_train", "2.9 llm-data", _KMEANS_ORACLE)
def simsearch_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means codebook training, integer-exact and cross-engine.

    The training step behind IVF/PQ indexes (`simsearch_ivf` /
    `simsearch_pq_adc` assign against FIXED codebooks; this LEARNS one):
    K=4 centroids over a deterministic hash-sample (vec_id % 7 — codebooks
    train on samples in practice), seeded from the 4 smallest vec_ids, two
    Lloyd rounds unrolled. Everything is exact integer: vectors quantize
    to milli-units, assignment minimizes integer squared L2 (ties to the
    smallest cluster id), and centroid updates use TRUNCATING division
    toward zero — DuckDB's integer `//` truncates (-7//2 = -3) while
    Python's floors, so the driver-side update spells the truncation out
    explicitly; dimension sums go negative, so this 1-unit boundary
    matters (it cost a 928-unit inertia drift when floored). Output:
    per-cluster member count + exact inertia after the second assignment.

    Scale shape: the SAMPLE is small by construction — assignment is a
    map over it with the K×64 codebook as an array literal (the
    `dedup_semantic_centroid` data-driven argmin, one fold, ds evaluated
    once); the update is one (k, dim)-keyed sum (posexplode, 64 rows per
    vector) collected to the driver (K×64 ints — the broadcast-scale
    coordination every distributed k-means does per round). Assigning the
    FULL corpus against the learned codebook is `simsearch_ivf`'s shape."""
    from hdc_dataengineering_sqlsync_spark.operators.dedup import _spread

    e = load(spark, sf_dir, "embeddings").where(F.col("vec_id") % 7 == 0)
    q = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
    )
    samp = _spread(e).select("vec_id", q.alias("q")).localCheckpoint(eager=True)
    seeds = samp.orderBy("vec_id").limit(4).collect()
    centroids = [list(r.q) for r in seeds]  # k = seed rank by vec_id

    def assign(cents: list[tuple[int, list[int]]]):
        # cents carries (ORIGINAL cluster id, centroid): if a cluster
        # empties after an update it simply drops out, and surviving
        # clusters keep their ids — the oracle's cents1 behaves the same
        # way, so labels can never silently compact (0,1,3 -> 0,1,2).
        cb = F.array(
            *[F.array(*[F.lit(int(v)).cast("long") for v in c]) for _, c in cents]
        )
        ks = F.array(*[F.lit(int(k)) for k, _ in cents])
        d2s = F.transform(
            cb,
            lambda c: F.aggregate(
                F.zip_with("q", c, lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ),
        )
        # single-pass argmin fold (ds evaluated once); strict < keeps the
        # FIRST minimum -> ties resolve to the smallest cluster id
        best = F.aggregate(
            F.zip_with(d2s, ks, lambda d, i: F.struct(d.alias("d"), i.alias("i"))),
            F.struct(
                F.lit(2**62).cast("long").alias("d"), F.lit(-1).alias("i")
            ),
            lambda acc, x: F.when(x["d"] < acc["d"], x).otherwise(acc),
        )
        return samp.select(
            "vec_id", "q", best["i"].alias("k"), best["d"].alias("d2")
        )

    a1 = assign(list(enumerate(centroids)))
    sums = (
        a1.select("k", F.posexplode("q").alias("dim", "v"))
        .groupBy("k", "dim")
        .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    upd: dict[int, list[int]] = {}
    for r in sums:
        # truncate toward zero: DuckDB integer `//` truncates, Python floors
        tv = abs(r.sv) // r.n
        upd.setdefault(r.k, [0] * 64)[r.dim] = tv if r.sv >= 0 else -tv
    a2 = assign(sorted(upd.items()))
    return (
        a2.groupBy(F.col("k").cast("long").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("d2").alias("inertia"),
        )
        .orderBy("k")
    )


# --------------- 2.12 workloads: difference-in-differences uplift

_DID_ORACLE = """
WITH cells AS (
  SELECT CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS treated,
         CASE WHEN l.l_shipdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END
           AS post,
         CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS cp
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
agg AS (
  SELECT treated, post, COUNT(*) AS n, SUM(cp) AS total
  FROM cells GROUP BY treated, post
),
m AS (
  SELECT
    MAX(CASE WHEN treated = 1 AND post = 1 THEN total * 10 // n END) AS t_post,
    MAX(CASE WHEN treated = 1 AND post = 0 THEN total * 10 // n END) AS t_pre,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN total * 10 // n END) AS c_post,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN total * 10 // n END) AS c_pre
  FROM agg
)
SELECT CAST(t_pre AS BIGINT) AS t_pre_mc,
       CAST(t_post AS BIGINT) AS t_post_mc,
       CAST(c_pre AS BIGINT) AS c_pre_mc,
       CAST(c_post AS BIGINT) AS c_post_mc,
       CAST((t_post - t_pre) - (c_post - c_pre) AS BIGINT) AS did_mc
FROM m
"""


@query("wl_promo_uplift_did", "2.12 composite workloads", _DID_ORACLE)
def wl_promo_uplift_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo uplift by difference-in-differences, exact milli-cents.

    The causal-inference workhorse for observational pricing data: did
    PROMO parts' average line revenue move differently across the
    1998-01-01 boundary than everyone else's? DiD = (T_post − T_pre) −
    (C_post − C_pre) nets out both the group level difference and the
    common time trend. Net revenue NEVER becomes a derived double:
    price and discount round to integers straight off the 2dp source
    columns and multiply as ints (cent-percent units — the FIXTURES.md
    hazard-3 idiom; `round(price*(1-disc)*100)` would repr-tie-diverge
    across engines, measured ±1 per cell here); cell averages are
    integer division in milli-cent units, so the final estimate is
    plain integer subtraction.

    Scale shape: the part dimension broadcasts into the fact scan; the
    whole query then collapses to a FOUR-cell aggregate —
    map-combinable, nothing but 4 partial rows cross the wire; the DiD
    arithmetic runs on the driver-sized result."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").cast("int").alias("treated")
    )
    cells = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "treated",
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .cast("int")
        .alias("post"),
        (
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            * (100 - F.round(F.col("l_discount") * 100, 0).cast("long"))
        ).alias("cp"),
    )
    agg = cells.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cp").alias("total")
    )
    m = agg.agg(
        *[
            F.max(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == p_),
                    F.expr("total * 10 div n"),
                )
            ).alias(name)
            for name, t, p_ in [
                ("t_post", 1, 1),
                ("t_pre", 1, 0),
                ("c_post", 0, 1),
                ("c_pre", 0, 0),
            ]
        ]
    )
    return m.select(
        F.col("t_pre").alias("t_pre_mc"),
        F.col("t_post").alias("t_post_mc"),
        F.col("c_pre").alias("c_pre_mc"),
        F.col("c_post").alias("c_post_mc"),
        ((F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre"))).alias(
            "did_mc"
        ),
    )
