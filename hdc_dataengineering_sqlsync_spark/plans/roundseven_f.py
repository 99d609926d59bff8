"""SURVEY.md §2 round-7 batch F: source-divergence diagnostics, printf
surface, hierarchy LCA.

  text_js_divergence_sources  Jensen-Shannon divergence source vs corpus
  fn_printf_format            printf-style formatting surface
  hier_lowest_common_ancestor LCA over the div-10 key hierarchy, map-side
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# ------------------- 2.9 llm-data: Jensen-Shannon source divergence

_JSD_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
sw AS (SELECT source, w, count(*) AS cs FROM tok GROUP BY 1, 2),
ns AS (SELECT source, sum(cs) AS ns FROM sw GROUP BY 1),
gw AS (SELECT w, count(*) AS cw FROM tok GROUP BY 1),
n AS (SELECT sum(cw) AS n FROM gw),
terms AS (
  SELECT sw.source,
         (CAST(sw.cs AS DOUBLE) / ns.ns) AS p,
         (CAST(gw.cw AS DOUBLE) / n.n) AS q
  FROM sw JOIN ns ON sw.source = ns.source JOIN gw ON sw.w = gw.w, n
),
qonly AS (
  -- corpus tokens the source never uses: p = 0, only the q-side term
  SELECT s.source, CAST(gw.cw AS DOUBLE) / n.n AS q
  FROM (SELECT DISTINCT source FROM sw) s, gw, n
  WHERE NOT EXISTS (SELECT 1 FROM sw WHERE sw.source = s.source AND sw.w = gw.w)
),
j AS (
  SELECT source,
         sum(0.5 * p * ln(p / ((p + q) / 2)) + 0.5 * q * ln(q / ((p + q) / 2))) AS jsd
  FROM terms GROUP BY source
),
j0 AS (
  SELECT source, sum(0.5 * q * ln(2)) AS jsd0 FROM qonly GROUP BY source
)
SELECT ns.source,
       CAST(ns.ns AS BIGINT) AS n_tokens,
       round(j.jsd + coalesce(j0.jsd0, 0), 4) AS jsd
FROM ns JOIN j ON ns.source = j.source LEFT JOIN j0 ON ns.source = j0.source
ORDER BY ns.source
"""


@query("text_js_divergence_sources", "2.9 llm-data", _JSD_ORACLE)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each SOURCE's unigram distribution from
    the corpus mixture — the drift diagnostic mixture tuning runs per
    ingest feed ('which source no longer looks like the blend?'), the
    symmetric/bounded cousin of dq_psi_drift's binned PSI. Counts are
    exact integers; p, q, and the ln terms are IDENTICAL expression
    strings in both engines (the text_unigram_logprob convention), summed
    then rounded 4dp. Tokens a source never uses contribute the exact
    0.5·q·ln2 limit term (p→0), kept as a separate anti-join leg so no
    engine-specific NULL/0·ln(0) behavior is touched.

    Scale shape: one token explode feeding two map-side-combinable counts
    ((source,w) and (w)); the term join is (source,w)-keyed against a
    broadcast Zipf-small vocab table; everything after the explode is
    vocabulary-grain, not corpus-grain."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split(F.col("text"), " ")).alias("w"))
    # sw/gw/ns are vocabulary-grain reductions each read by 2-4 consumers
    # (terms, the missing-token anti leg, the final join). Checkpoint the
    # (source, w) census once and ROLL THE OTHERS UP FROM IT — gw and ns
    # are exact marginals of sw — so the corpus explode runs ONCE; the r10
    # plan audit caught the explode subtree recomputing 9 times without this.
    sw = (
        tok.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cs"))
        .localCheckpoint(eager=True)
    )
    ns = (
        sw.groupBy("source").agg(F.sum("cs").alias("ns")).localCheckpoint(eager=True)
    )
    gw = sw.groupBy("w").agg(F.sum("cs").alias("cw")).localCheckpoint(eager=True)
    n = gw.agg(F.sum("cw").alias("n"))
    terms = (
        sw.join(ns, "source")
        .join(F.broadcast(gw), "w")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            (F.col("cs").cast("double") / F.col("ns")).alias("p"),
            (F.col("cw").cast("double") / F.col("n")).alias("q"),
        )
    )
    j = terms.groupBy("source").agg(
        F.sum(
            0.5 * F.col("p") * F.log(F.col("p") / ((F.col("p") + F.col("q")) / 2))
            + 0.5 * F.col("q") * F.log(F.col("q") / ((F.col("p") + F.col("q")) / 2))
        ).alias("jsd")
    )
    qonly = (
        ns.select("source")
        .crossJoin(F.broadcast(gw))
        .join(sw.select("source", "w"), ["source", "w"], "left_anti")
        .crossJoin(F.broadcast(n))
        .groupBy("source")
        .agg(F.sum(0.5 * (F.col("cw").cast("double") / F.col("n")) * F.log(F.lit(2.0))).alias("jsd0"))
    )
    return (
        ns.join(j, "source")
        .join(qonly, "source", "left")
        .select(
            "source",
            F.col("ns").cast("long").alias("n_tokens"),
            F.round(F.col("jsd") + F.coalesce(F.col("jsd0"), F.lit(0.0)), 4).alias("jsd"),
        )
        .orderBy("source")
    )


# ----------------------------- 2.7 scalar fns: printf-style formatting

_PRINTF_ORACLE = """
SELECT n_nationkey,
       printf('%03d|%s|%08x|%d%%', n_nationkey, n_name, n_nationkey * 2654435761,
              n_regionkey * 10) AS label
FROM nation ORDER BY n_nationkey
"""


@query("fn_printf_format", "2.7 scalar functions", _PRINTF_ORACLE)
def fn_printf_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting surface (`format_string` / `printf`):
    zero-padded decimal, string, zero-padded HEX of a Knuth-hash product,
    and a literal %% — the label-minting every export/partition-naming
    path uses. Integer-only conversions deliberately: %f of derived
    doubles would pit Java Formatter's decimal-repr rounding against C
    printf's binary rounding (the round() hazard class in a different
    coat); the declared money path formats cents as %d.

    Scale shape: pure map-side codegen expression over the 25-row dim —
    declared for the SURFACE, the formatting cost is the same per row at
    any scale."""
    nt = load(spark, sf_dir, "nation")
    return nt.select(
        "n_nationkey",
        F.format_string(
            "%03d|%s|%08x|%d%%",
            F.col("n_nationkey"),
            F.col("n_name"),
            (F.col("n_nationkey") * F.lit(2654435761)).cast("long"),
            F.col("n_regionkey") * 10,
        ).alias("label"),
    ).orderBy("n_nationkey")


# -------------------- 2.3 joins/hierarchy: lowest common ancestor

_ANC_POWS = [10**j for j in range(8)]


def _anc_sql(col: str) -> str:
    return "list_value(" + ", ".join(f"{col} // {p}" for p in _ANC_POWS) + ")"


_LCA_ORACLE = f"""
WITH pairs AS (
  SELECT c_custkey AS a, c_custkey // 3 AS b FROM customer WHERE c_custkey % 50 = 0
),
l AS (
  SELECT a, b,
         list_max(list_filter({_anc_sql('a')},
                              y -> list_contains({_anc_sql('b')}, y)))
           AS lca
  FROM pairs
)
SELECT a, b, CAST(lca AS BIGINT) AS lca,
       CAST(length(CAST(a AS VARCHAR)) - length(CAST(lca AS VARCHAR))
            + length(CAST(b AS VARCHAR)) - length(CAST(lca AS VARCHAR))
            + CASE WHEN lca = 0 THEN 2 ELSE 0 END AS INT) AS tree_dist
FROM l ORDER BY a
"""


@query("hier_lowest_common_ancestor", "2.3 joins", _LCA_ORACLE)
def hier_lowest_common_ancestor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lowest common ancestor over the parent(k) = k div 10 hierarchy,
    ENTIRELY map-side: each key's ancestor chain is the ≤8-element array
    k div 10^j, common ancestors are an array intersection, and the
    DEEPEST one is simply the numeric max (chains are strictly decreasing
    suffixes of each other). Tree distance = depth(a)+depth(b)−2·depth(lca)
    with depth = decimal digit count (the materialized-path trick — root 0
    is depth 0, hence the +2 correction when the walk passes the root).
    The org-chart/taxonomy primitive behind 'nearest shared category'
    joins, here with NO join at all — compare hier_closure_doubling,
    which materializes what this computes on the fly.

    Scale shape: constant fan-out (8) per row, all higher-order array
    functions, zero shuffle before the final ORDER BY of the probe rows."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") % 50 == 0)
    pairs = c.select(
        F.col("c_custkey").alias("a"), F.expr("c_custkey div 3").alias("b")
    )
    # ancestor chains as 8 explicit exact integer divisions — no pow(),
    # no double anywhere
    a_anc = F.array(*[F.expr(f"a div {p}") for p in _ANC_POWS])
    b_anc = F.array(*[F.expr(f"b div {p}") for p in _ANC_POWS])
    lca = F.array_max(F.array_intersect(a_anc, b_anc))
    depth = lambda c_: F.length(c_.cast("string"))  # noqa: E731
    return (
        pairs.select("a", "b", lca.alias("lca"))
        .select(
            "a",
            "b",
            F.col("lca").cast("long").alias("lca"),
            (
                depth(F.col("a"))
                - depth(F.col("lca"))
                + depth(F.col("b"))
                - depth(F.col("lca"))
                + F.when(F.col("lca") == 0, 2).otherwise(0)
            ).cast("int").alias("tree_dist"),
        )
        .orderBy("a")
    )
