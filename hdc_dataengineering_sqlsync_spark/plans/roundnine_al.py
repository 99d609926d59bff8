"""SURVEY.md §2 round-9 batch AL: neighbor-degree curve, content-defined
chunking, range-join bin planning.

  graph_avg_neighbor_degree  k_nn(k) — the assortativity CURVE
  text_cdc_chunking          shingle-hash content-defined chunk census
  sync_range_join_bin_plan   pick the bucketized-range-join bin from data

(No reference file:line exists — /root/reference/ is empty; SURVEY.md §0.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.plans.graphs import _CS_EDGES_SQL, _cs_edges
from hdc_dataengineering_sqlsync_spark.registry import load

# ------ 2.12 composite: average neighbor degree by degree bucket

# MATERIALIZED for the same multi-reference reason as _RC_ORACLE
_KNN_ORACLE = f"""
WITH {_CS_EDGES_SQL.strip().replace("pairs AS (", "pairs AS MATERIALIZED (").replace("edges AS (", "edges AS MATERIALIZED (")},
deg AS MATERIALIZED (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS d
  FROM edges GROUP BY src
),
nbr AS (
  SELECT e.src, CAST(SUM(dd.d) AS BIGINT) AS nbr_deg_sum,
         CAST(count(*) AS BIGINT) AS n_nbrs
  FROM edges e JOIN deg dd ON dd.node = e.dst
  GROUP BY e.src
),
buckets AS (
  SELECT CASE WHEN d.d <= 2 THEN '1-2' WHEN d.d <= 8 THEN '3-8'
              WHEN d.d <= 32 THEN '9-32' ELSE '33+' END AS deg_bucket,
         d.d, n.nbr_deg_sum, n.n_nbrs
  FROM deg d JOIN nbr n ON n.src = d.node
)
SELECT deg_bucket,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(SUM(nbr_deg_sum) * 1000 // SUM(n_nbrs) AS BIGINT)
         AS avg_nbr_degree_milli
FROM buckets GROUP BY deg_bucket ORDER BY deg_bucket
"""


@query(
    "graph_avg_neighbor_degree", "2.12 composite workloads", _KNN_ORACLE
)
def graph_avg_neighbor_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assortativity CURVE k_nn(k) — average neighbor degree by
    degree bucket: graph_assortativity_exact compresses mixing into one
    coefficient; this shows WHERE it comes from (a falling curve =
    hubs attach to leaves, the disassortative market signature; rising
    = rich club). The bucket averages close with one integral
    milli-degree division each.

    Scale shape: degree census once; neighbor-degree sums are one
    edges⋈degree join keyed on dst (degree table is node-sized —
    broadcast at scale); bucket rollup on node-grain rows."""
    edges = _cs_edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    dd = deg.select(F.col("node").alias("nd"), F.col("d").alias("ndeg"))
    nbr = (
        edges.join(dd, edges.dst == dd.nd)
        .groupBy("src")
        .agg(
            F.sum("ndeg").alias("nbr_deg_sum"),
            F.count(F.lit(1)).alias("n_nbrs"),
        )
    )
    buckets = deg.join(nbr, deg.node == nbr.src).select(
        F.when(F.col("d") <= 2, "1-2")
        .when(F.col("d") <= 8, "3-8")
        .when(F.col("d") <= 32, "9-32")
        .otherwise("33+")
        .alias("deg_bucket"),
        "nbr_deg_sum",
        "n_nbrs",
    )
    return (
        buckets.groupBy("deg_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.expr(
                "SUM(nbr_deg_sum) * 1000 DIV SUM(n_nbrs)"
            ).alias("avg_nbr_degree_milli"),
        )
        .orderBy("deg_bucket")
    )


# ------ 2.9 llm-data: content-defined chunking (shingle-hash cuts)

_CDC_ORACLE = """
WITH tok AS (
  SELECT doc_id, w, i
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
  ) WHERE w <> ''
),
tri AS (
  SELECT doc_id, i,
         CASE WHEN substr(md5(w || '|'
                || lag(w, 1, '') OVER (PARTITION BY doc_id ORDER BY i)
                || '|'
                || lag(w, 2, '') OVER (PARTITION BY doc_id ORDER BY i)),
              1, 1) = '0' THEN 1 ELSE 0 END AS cut
  FROM tok
),
census AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS ntok,
         CAST(SUM(cut) AS BIGINT) AS n_cuts
  FROM tri GROUP BY doc_id
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       CAST(SUM(n_cuts + 1) AS BIGINT) AS n_chunks,
       CAST(SUM(ntok) * 1000 // SUM(n_cuts + 1) AS BIGINT)
         AS mean_chunk_milli,
       CAST(SUM(CASE WHEN n_cuts = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_uncut_docs
FROM census
"""


@query("text_cdc_chunking", "2.9 llm-data", _CDC_ORACLE)
def text_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking — the dedup-storage primitive (borrowed
    by RAG splitters): cut points are decided by CONTENT (a local
    3-token shingle hash hitting 1/16 of the space), not by position,
    so an insertion early in a document shifts only one chunk boundary
    instead of all of them. The hash is md5 of the joined shingle —
    byte-identical across engines — and the expected chunk size (~16
    tokens) is read back from the census as an exact milli-token mean.

    Scale shape: tokenize + shingle lags are per-doc window work
    (partition-parallel); the census folds map-side to one row."""
    tok = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("i", "w"))
        .where(F.col("w") != "")
    )
    tri = tok.select(
        "doc_id",
        F.when(
            F.expr(
                "substr(md5(concat(w, '|', "
                "coalesce(lag(w, 1) OVER (PARTITION BY doc_id ORDER BY i),"
                " ''), '|', "
                "coalesce(lag(w, 2) OVER (PARTITION BY doc_id ORDER BY i),"
                " ''))), 1, 1) = '0'"
            ),
            1,
        )
        .otherwise(0)
        .alias("cut"),
    )
    census = tri.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("ntok"), F.sum("cut").alias("n_cuts")
    )
    return census.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").alias("n_tokens"),
        F.sum(F.col("n_cuts") + 1).alias("n_chunks"),
        F.expr("SUM(ntok) * 1000 DIV SUM(n_cuts + 1)").alias(
            "mean_chunk_milli"
        ),
        F.sum(F.when(F.col("n_cuts") == 0, 1).otherwise(0)).alias(
            "n_uncut_docs"
        ),
    )


# ------ 2.6 sync & dataops: pick the range-join bin width from data

_BIN_ORACLE = """
WITH ship AS (
  SELECT l_orderkey AS k, max(l_shipdate) AS ship FROM lineitem GROUP BY 1
),
iv AS (
  SELECT date_diff('day', o.o_orderdate, s.ship) + 1 AS len
  FROM orders o JOIN ship s ON s.k = o.o_orderkey
  WHERE s.ship >= o.o_orderdate
),
census AS (
  SELECT len, CAST(count(*) AS BIGINT) AS c FROM iv GROUP BY len
),
ranked AS (
  SELECT len, c,
         CAST(SUM(c) OVER (ORDER BY len) AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM census
),
p95 AS (
  SELECT CAST(min(CASE WHEN 100 * cum >= 95 * n THEN len END) AS BIGINT)
    AS p95_len
  FROM ranked
),
pows(pw) AS (VALUES (1), (2), (4), (8), (16), (32), (64), (128), (256), (512), (1024), (2048), (4096), (8192), (16384), (32768), (65536)),
binned AS (
  -- bin = smallest power of two >= p95 length, decided by EXACT integer
  -- comparison against a powers table (ceil(ln/ln2) is a float-boundary
  -- hazard when p95 lands exactly on a power of two)
  SELECT p95_len,
         CAST((SELECT min(pw) FROM pows WHERE pw >= p95.p95_len) AS BIGINT)
           AS bin_days
  FROM p95
)
SELECT b.p95_len, b.bin_days,
       CAST((SELECT max(len) FROM iv) AS BIGINT) AS max_len,
       CAST((SELECT SUM((CAST(len AS HUGEINT) + b.bin_days - 1)
                        // b.bin_days * c) * 1000 // SUM(c)
             FROM census) AS BIGINT) AS avg_bins_per_interval_milli
FROM binned b
"""


@query("sync_range_join_bin_plan", "2.6 sync & dataops", _BIN_ORACLE)
def sync_range_join_bin_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-width planning for a bucketized range join — the tuning
    decision join_range_bucketized leaves implicit, made from data: bin
    = the smallest power of two covering the p95 interval length (p95
    by the integer threshold device; the power itself by EXACT integer
    comparison against a broadcast powers table — ceil(ln/ln2) would be
    a float-boundary hazard exactly when p95 lands on a power of two).
    The plan reports the resulting probe
    amplification (average bins each interval expands into, exact
    milli) — the replicate-vs-prune trade a 100 TB range join lives on.

    Scale shape: the interval-length census is map-combinable and
    localCheckpoint'ed (r10 plan audit: the p95 / max / amplification
    branches each re-derived it — FOUR fact-scan subtrees in one plan;
    checkpointing the |distinct lengths|-row census makes it ONE fact
    pass); the percentile pass runs over |distinct lengths|; the
    amplification audit is one pass over the same census."""
    ship = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.max("l_shipdate").alias("ship"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    iv = (
        o.join(ship, o.o_orderkey == ship.k)
        .where(F.col("ship") >= F.col("o_orderdate"))
        .select((F.datediff("ship", "o_orderdate") + 1).alias("len"))
    )
    census = (
        iv.groupBy("len")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    wc = Window.orderBy("len").rowsBetween(Window.unboundedPreceding, 0)
    ranked = census.select(
        "len",
        "c",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    p95 = ranked.agg(
        F.min(
            F.when(100 * F.col("cum") >= 95 * F.col("n"), F.col("len"))
        ).alias("p95_len")
    )
    pows = spark.createDataFrame(
        [(2**i,) for i in range(17)], "pw long"
    )
    binned = (
        p95.crossJoin(F.broadcast(pows))
        .where(F.col("pw") >= F.col("p95_len"))
        .groupBy("p95_len")
        .agg(F.min("pw").alias("bin_days"))
    )
    mx = census.agg(F.max("len").alias("max_len"))
    amp = (
        census.crossJoin(F.broadcast(binned))
        .agg(
            F.expr(
                "CAST(SUM((CAST(len AS DECIMAL(38,0)) + bin_days - 1)"
                " DIV bin_days * c) * 1000 DIV SUM(c) AS BIGINT)"
            ).alias("avg_bins_per_interval_milli")
        )
    )
    return (
        binned.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(amp))
        .select("p95_len", "bin_days", "max_len", "avg_bins_per_interval_milli")
    )
