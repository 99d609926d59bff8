"""SURVEY.md §2 — subquery / lateral / recursive query surface (EP3, the SQL
entry point). PySpark 4.1 supports correlated scalar subqueries (decorrelated
by Catalyst into joins), LATERAL subqueries, and WITH RECURSIVE — probed this
session; each qid here exercises one of them through ``spark.sql`` so the
text goes through the full ANTLR → Catalyst pipeline.

Oracles are near-identical SQL; the only dialect deltas are integer division
(Spark ``DIV``, DuckDB ``//``) and type casts per SURVEY §2 convention 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

_CORR_ORACLE = """
WITH flagged AS (
  SELECT o_orderpriority,
         CASE WHEN o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
                                   WHERE o2.o_custkey = o.o_custkey)
              THEN 1 ELSE 0 END AS above
  FROM orders o
)
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(above) AS BIGINT) AS n_above_cust_avg
FROM flagged GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("subq_scalar_correlated", "2.3 joins", _CORR_ORACLE)
def subq_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders priced above their own customer's
    average, counted per priority. Catalyst decorrelates the subquery into
    an aggregate + join (RewriteCorrelatedScalarSubquery) — no per-row
    re-execution, which is what makes the construct survive at scale."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH flagged AS (
          SELECT o_orderpriority,
                 CASE WHEN o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
                                           WHERE o2.o_custkey = o.o_custkey)
                      THEN 1 ELSE 0 END AS above
          FROM orders o
        )
        SELECT o_orderpriority, count(*) AS n_orders,
               CAST(sum(above) AS BIGINT) AS n_above_cust_avg
        FROM flagged GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


_LATERAL_ORACLE = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
"""


@query("join_lateral_topk", "2.3 joins", _LATERAL_ORACLE)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL subquery: each nation's top-2 customers by balance — the
    per-row-subquery formulation of top-k-per-group. Same result as the
    window formulation (win_topk_per_group shape); declared through the SQL
    surface to cover the LATERAL operator itself."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
        """
    )


# Synthetic hierarchy over customer keys: parent(k) = k // 10, roots are
# k < 10 — every key walks to its root in <= 4 steps at sf0.01 scale. The
# recursive step must exclude the roots as children: key 0 is its own
# parent (0 // 10 = 0), a self-loop that would recurse forever.
_RECURSIVE_ORACLE = """
WITH RECURSIVE walk(c_custkey, depth) AS (
  SELECT c_custkey, 0 FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, w.depth + 1
  FROM customer c JOIN walk w ON c.c_custkey // 10 = w.c_custkey
  WHERE c.c_custkey >= 10
)
SELECT depth, count(*) AS n, min(c_custkey) AS min_key, max(c_custkey) AS max_key
FROM walk GROUP BY depth ORDER BY depth
"""


@query("hier_recursive_cte", "2.3 joins", _RECURSIVE_ORACLE)
def hier_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4.x): walk the synthetic parent(k) = k DIV 10
    hierarchy from the root keys, report per-depth counts. Each recursion
    step is one self-join — the engine-native form of iterative graph
    traversal (the DataFrame-loop form is operators/dedup.py::
    connected_components)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH RECURSIVE walk(c_custkey, depth) AS (
          SELECT c_custkey, 0 AS depth FROM customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, w.depth + 1
          FROM customer c JOIN walk w ON c.c_custkey DIV 10 = w.c_custkey
          WHERE c.c_custkey >= 10
        )
        SELECT depth, count(*) AS n, min(c_custkey) AS min_key, max(c_custkey) AS max_key
        FROM walk GROUP BY depth ORDER BY depth
        """
    )
