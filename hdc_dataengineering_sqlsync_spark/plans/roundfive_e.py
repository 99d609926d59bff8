"""SURVEY.md §2 round-5 additions, batch L.

Skyline (Pareto-frontier) queries, the AES crypto scalar surface, and the
dedup recall-evaluation harness (the LSH counterpart of
simsearch_recall_at_k). Registered after ``roundfive_d``
(plans/__init__.py) so the qids append to the END of the never-checked
rotation segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ----------------------------- 2.12 workloads: 2-D skyline (Pareto)

_SKYLINE_ORACLE = """
WITH pts AS (
  SELECT p_brand,
         CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size,
         COUNT(*) AS n_parts
  FROM part GROUP BY p_brand, price_cents, size
),
perx AS (
  SELECT p_brand, price_cents, MIN(size) AS size,
         CAST(SUM(n_parts) AS BIGINT) AS nx
  FROM pts GROUP BY p_brand, price_cents
),
sky AS (
  SELECT p_brand, price_cents, size, nx,
         MIN(size) OVER (PARTITION BY p_brand ORDER BY price_cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
  FROM perx
)
SELECT p_brand, price_cents, size
FROM sky
WHERE best_prev IS NULL OR size < best_prev
ORDER BY p_brand, price_cents
"""


@query("wl_skyline_pareto_2d", "2.12 composite workloads", _SKYLINE_ORACLE)
def wl_skyline_pareto_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): minimize (price, size) per brand.

    The classic SKYLINE operator — rows no other row dominates on both
    dimensions — behind "cheapest AND smallest" product pickers and
    cost/latency frontier dashboards. The 2-D case needs NO pairwise
    dominance join: reduce to one min-size point per distinct price,
    then a point is on the frontier iff its size beats the running
    strict-prefix minimum in price order. Collapsing to distinct prices
    first removes every tie hazard (x strictly increases across rows, so
    strict-prefix dominance is unambiguous in both engines).

    Scale shape: one keyed aggregate to the (brand, price) grain —
    cardinality-bounded, not row-bounded — then ONE window per brand
    partition over that reduced series. The d>2 generalization is the
    documented iterative/block-nested variant; 2-D stays a single sorted
    pass."""
    pts = (
        load(spark, sf_dir, "part")
        .groupBy(
            "p_brand",
            F.round(F.col("p_retailprice") * 100, 0)
            .cast("long")
            .alias("price_cents"),
        )
        .agg(F.min(F.col("p_size").cast("long")).alias("size"))
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pts.withColumn("best_prev", F.min("size").over(w))
        .where(F.col("best_prev").isNull() | (F.col("size") < F.col("best_prev")))
        .select("p_brand", "price_cents", "size")
        .orderBy("p_brand", "price_cents")
    )


# ------------------------------- 2.7 scalar functions: AES roundtrip

_AES_ORACLE = """
SELECT n_nationkey AS region_key, n_name,
       CAST(1 AS BIGINT) AS n_rows,
       TRUE AS roundtrip_ok
FROM nation ORDER BY n_nationkey
"""


@query("fn_aes_roundtrip", "2.7 scalar functions", _AES_ORACLE)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AES encrypt/decrypt roundtrip (the column-level crypto surface).

    Field-level encryption before landing data in a less-trusted zone:
    `aes_encrypt` in deterministic ECB mode (CBC/GCM salt a random IV —
    right for production, wrong for an equality-checkable fixture; the
    mode trade-off is the documented point) roundtrips through
    `aes_decrypt` back to the plaintext. The oracle cannot run AES, so
    the declared output is the roundtrip IDENTITY: decrypted == original
    per row, which the oracle states directly from the base table —
    any cipher/codec asymmetry breaks the value match.

    Scale shape: pure map-side JVM cipher work inside codegen; nothing
    shuffles but the final tiny census."""
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 fixture key
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("region_key"),
        "n_name",
        F.aes_decrypt(
            F.aes_encrypt(
                F.col("n_name").cast("binary"), key, F.lit("ECB")
            ),
            key,
            F.lit("ECB"),
        )
        .cast("string")
        .alias("decrypted"),
    )
    return n.select(
        "region_key",
        "n_name",
        F.lit(1).cast("long").alias("n_rows"),
        (F.col("decrypted") == F.col("n_name")).alias("roundtrip_ok"),
    ).orderBy("region_key")


# -------------------- 2.9 llm-data: LSH dedup recall evaluation

_DEDUP_RECALL_ORACLE = None  # assembled below from the shared minhash CTEs


def _build_dedup_recall_oracle() -> str:
    from hdc_dataengineering_sqlsync_spark.plans.llmdata import _MINHASH_CTES

    return f"""
WITH {_MINHASH_CTES},
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
sh2 AS (
  SELECT DISTINCT t.doc_id, d.lang,
         array_to_string(t.t[CAST(i.i AS INT):CAST(i.i + 2 AS INT)], ' ') AS shingle
  FROM toks t JOIN documents d ON t.doc_id = d.doc_id,
       unnest(range(1, len(t.t) - 1)) AS i(i)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh2 a JOIN sh2 b
    ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
truth AS (
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) >= 0.5
)
SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM truth t
             JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b) AS BIGINT)
         AS n_caught,
       (SELECT COUNT(*) FROM truth t
        JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b) * 10000
         // NULLIF((SELECT COUNT(*) FROM truth), 0) AS recall_bps
"""


@query("dedup_recall_eval", "2.9 llm-data", _build_dedup_recall_oracle())
def dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of banded MinHash-LSH candidates vs exact-Jaccard ground truth.

    The dedup counterpart of simsearch_recall_at_k: the banded LSH
    candidate generator (dedup_minhash_banded's exact machinery — same
    signatures, bands, buckets) is scored against the exact 3-word-shingle
    Jaccard >= 0.5 pair set (dedup_shingle_jaccard's machinery at the
    banding's catch threshold). Recall in integer basis points — the
    number a pipeline owner checks before trusting LSH to replace the
    quadratic exact pass. b=4/r=3 catches ~(1/4)^(1/3)=0.63 Jaccard with
    probability 1/2, so >=0.5 truth pairs land mostly above the S-curve
    knee and recall should be high but honestly below 100%.

    Scale shape: both legs are the already-declared scale shapes (banded
    equi-join candidates; df-bounded shingle join for truth — at 100 TB
    the truth leg runs on a SAMPLE, documented); the evaluation join
    touches two slim pair lists."""
    from hdc_dataengineering_sqlsync_spark.operators.dedup import (
        minhash_banded_pairs,
        shingle_jaccard_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    cand = minhash_banded_pairs(docs).select(
        F.col("doc_id").alias("id_a"), F.col("doc_id2").alias("id_b")
    )
    truth = shingle_jaccard_pairs(docs, k_shingle=3, threshold=0.5).select(
        F.col("doc_id").alias("id_a"), F.col("doc_id2").alias("id_b")
    )
    caught = truth.join(cand, ["id_a", "id_b"], "left_semi")
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_caught = caught.agg(F.count(F.lit(1)).alias("n_caught"))
    return (
        n_truth.crossJoin(n_cand)
        .crossJoin(n_caught)
        .select(
            "n_truth",
            "n_candidates",
            "n_caught",
            F.expr("n_caught * 10000 div nullif(n_truth, 0)").alias(
                "recall_bps"
            ),
        )
    )
