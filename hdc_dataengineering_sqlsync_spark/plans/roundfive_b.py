"""SURVEY.md §2 round-5 additions, batch G.

Data-engineering surface growth: functional-dependency discovery audits
(the profiling step a sync tool runs before choosing merge keys),
multi-touch attribution over the event stream, and the URL scalar-function
suite. Registered after ``roundfive`` (plans/__init__.py) so the qids
append to the END of the never-checked rotation segment and leave the
planned round-5 driver window unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load

# --------------------------------------- 2.8 sync: FD discovery audit

_FD_ORACLE = """
WITH fd AS (
  SELECT 'lineitem: l_partkey->l_suppkey' AS fd, l_partkey AS lhs,
         COUNT(DISTINCT l_suppkey) AS n_rhs, COUNT(*) AS n_rows
  FROM lineitem GROUP BY l_partkey
  UNION ALL
  SELECT 'orders: o_custkey->o_orderpriority', o_custkey,
         COUNT(DISTINCT o_orderpriority), COUNT(*)
  FROM orders GROUP BY o_custkey
  UNION ALL
  SELECT 'orders: o_orderkey->o_custkey', o_orderkey,
         COUNT(DISTINCT o_custkey), COUNT(*)
  FROM orders GROUP BY o_orderkey
  UNION ALL
  SELECT 'part: p_brand->p_type', p_brand,
         COUNT(DISTINCT p_type), COUNT(*)
  FROM part GROUP BY p_brand
)
SELECT fd,
       CAST(COUNT(*) AS BIGINT) AS n_lhs,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_lhs,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS violating_rows,
       (MAX(n_rhs) = 1) AS holds
FROM fd GROUP BY fd ORDER BY fd
"""


@query("dq_fd_discovery", "2.8 sync core", _FD_ORACLE)
def dq_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery audit: does LHS -> RHS hold?

    The schema-profiling step a sync/merge tool runs before trusting a
    column as a merge key or a denormalization target: for each candidate
    FD, count LHS values that map to >1 distinct RHS value and the rows
    living in those violating groups. Candidates mix known-violated
    (part->supplier fan-out, customer->priority) with a key-implied FD
    (o_orderkey->o_custkey) as the holds=true control.

    Scale shape: each candidate is ONE hash aggregate on its own LHS key
    (partial map-side count-distinct per group), emitting #distinct-LHS
    rows, then a second tiny aggregate collapses to 4 report rows. The
    four audits scan only the 2-3 columns they profile (column pruning),
    never shuffle full rows, and union AFTER reduction — at 100 TB each
    audit's shuffle is bounded by the LHS cardinality, not the row count.
    """

    def audit(df: DataFrame, name: str, lhs: str, rhs: str) -> DataFrame:
        per_lhs = df.groupBy(F.col(lhs).alias("lhs")).agg(
            F.countDistinct(rhs).alias("n_rhs"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        return per_lhs.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).alias("n_lhs"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).alias(
                "n_violating_lhs"
            ),
            F.sum(
                F.when(F.col("n_rhs") > 1, F.col("n_rows")).otherwise(0)
            ).alias("violating_rows"),
            (F.max("n_rhs") == 1).alias("holds"),
        )

    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    out = (
        audit(lineitem, "lineitem: l_partkey->l_suppkey", "l_partkey", "l_suppkey")
        .unionByName(
            audit(orders, "orders: o_custkey->o_orderpriority", "o_custkey", "o_orderpriority")
        )
        .unionByName(
            audit(orders, "orders: o_orderkey->o_custkey", "o_orderkey", "o_custkey")
        )
        .unionByName(audit(part, "part: p_brand->p_type", "p_brand", "p_type"))
    )
    return out.select(
        "fd", "n_lhs", "n_violating_lhs", "violating_rows", "holds"
    ).orderBy("fd")


# ----------------------------- 2.12 workloads: multi-touch attribution

_ATTRIB_ORACLE = """
WITH ev AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         CASE WHEN event_type IN ('click', 'view', 'signup')
              THEN CAST(json_extract(props, '$.k') AS BIGINT) % 7 END
           AS touch_campaign
  FROM events
),
touched AS (
  SELECT *,
         first_value(touch_campaign IGNORE NULLS) OVER w AS first_touch,
         last_value(touch_campaign IGNORE NULLS) OVER w AS last_touch
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
conv AS (
  SELECT COALESCE(first_touch, -1) AS first_touch,
         COALESCE(last_touch, -1) AS last_touch, cents
  FROM touched WHERE event_type = 'purchase'
),
credit AS (
  SELECT first_touch AS campaign, 'f' AS model, cents FROM conv
  UNION ALL
  SELECT last_touch, 'l', cents FROM conv
)
SELECT campaign,
       CAST(SUM(CASE WHEN model = 'f' THEN 1 ELSE 0 END) AS BIGINT)
         AS first_convs,
       CAST(SUM(CASE WHEN model = 'f' THEN cents ELSE 0 END) AS BIGINT)
         AS first_cents,
       CAST(SUM(CASE WHEN model = 'l' THEN 1 ELSE 0 END) AS BIGINT)
         AS last_convs,
       CAST(SUM(CASE WHEN model = 'l' THEN cents ELSE 0 END) AS BIGINT)
         AS last_cents
FROM credit GROUP BY campaign ORDER BY campaign
"""


@query("wl_attribution_credit", "2.12 composite workloads", _ATTRIB_ORACLE)
def wl_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch conversion attribution over the event log.

    Marketing-analytics staple: every purchase credits the campaign of the
    user's FIRST and LAST preceding touch event (click/view/signup;
    campaign = props.k mod 7), unattributed purchases land in campaign -1.
    Revenue stays in exact integer cents (FIXTURES hazard: value is 2dp —
    round(value*100) is the only safe mutation).

    Scale shape: ONE window pass partitioned by user_id (the natural
    event-log partitioning — each user's history is small and
    co-located), using first/last IGNORE NULLS over the running frame so
    no self-join against the touch subset is ever materialized. Each
    purchase then EXPLODES to its two (model, campaign) credit rows —
    constant fan-out 2 — so both attribution models collapse in ONE
    keyed aggregate over ONE scan (no second pass, no join; the plan
    assertion pins it). Ordering key (ts, event_id) is total, so the
    window is deterministic across engines.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.when(
            F.col("event_type").isin("click", "view", "signup"),
            F.get_json_object("props", "$.k").cast("long") % 7,
        ).alias("touch_campaign"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    conv = (
        ev.withColumn(
            "first_touch", F.first("touch_campaign", ignorenulls=True).over(w)
        )
        .withColumn(
            "last_touch", F.last("touch_campaign", ignorenulls=True).over(w)
        )
        .where(F.col("event_type") == "purchase")
        .select(
            F.coalesce("first_touch", F.lit(-1)).alias("first_touch"),
            F.coalesce("last_touch", F.lit(-1)).alias("last_touch"),
            "cents",
        )
    )
    credit = conv.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("f").alias("model"), F.col("first_touch").alias("campaign")
                ),
                F.struct(
                    F.lit("l").alias("model"), F.col("last_touch").alias("campaign")
                ),
            )
        ).alias("e"),
        "cents",
    ).select("e.model", "e.campaign", "cents")
    return (
        credit.groupBy("campaign")
        .agg(
            F.sum(F.when(F.col("model") == "f", 1).otherwise(0)).alias(
                "first_convs"
            ),
            F.sum(
                F.when(F.col("model") == "f", F.col("cents")).otherwise(0)
            ).alias("first_cents"),
            F.sum(F.when(F.col("model") == "l", 1).otherwise(0)).alias(
                "last_convs"
            ),
            F.sum(
                F.when(F.col("model") == "l", F.col("cents")).otherwise(0)
            ).alias("last_cents"),
        )
        .orderBy("campaign")
    )


# --------------------------------- 2.7 scalar functions: URL suite

_URL_ORACLE = """
WITH u AS (
  SELECT s_suppkey,
         'https://www.shop' || (s_suppkey % 50) || '.com/products/item-'
           || s_suppkey || '?ref=aff' || (s_suppkey % 7)
           || '&q=blue%20steel%20' || (s_suppkey % 11) AS url
  FROM supplier
),
parsed AS (
  SELECT s_suppkey,
         regexp_extract(url, 'https://([^/]+)/', 1) AS host,
         regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
         regexp_extract(url, 'ref=([^&]*)', 1) AS ref,
         replace(regexp_extract(url, 'q=([^&]*)', 1), '%20', ' ')
           AS q_decoded
  FROM u
)
SELECT ref,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
       MIN(q_decoded) AS min_q,
       MAX(q_decoded) AS max_q
FROM parsed GROUP BY ref ORDER BY ref
"""


@query("fn_url_suite", "2.7 scalar functions", _URL_ORACLE)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar-function suite: parse_url HOST/PATH/QUERY:key + url_decode.

    Exercises Spark's dedicated URL functions (`parse_url`, `url_decode`)
    on deterministically synthesized URLs; the DuckDB oracle re-derives
    the same parts with anchored regexes (exact because the URL shape is
    controlled — no scheme/port/fragment variants that would make regex
    and RFC parsing diverge).

    Scale shape: pure map-side expression work inside whole-stage codegen
    (JVM java.net URI parsing per row, no Python), then one small
    aggregate keyed by the 7-value ref bucket.
    """
    u = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.concat(
            F.lit("https://www.shop"),
            F.col("s_suppkey") % 50,
            F.lit(".com/products/item-"),
            F.col("s_suppkey"),
            F.lit("?ref=aff"),
            F.col("s_suppkey") % 7,
            F.lit("&q=blue%20steel%20"),
            F.col("s_suppkey") % 11,
        ).alias("url"),
    )
    parsed = u.select(
        "s_suppkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref"),
        F.url_decode(F.parse_url("url", F.lit("QUERY"), F.lit("q"))).alias(
            "q_decoded"
        ),
    )
    return (
        parsed.groupBy("ref")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("host").alias("n_hosts"),
            F.countDistinct("path").alias("n_paths"),
            F.min("q_decoded").alias("min_q"),
            F.max("q_decoded").alias("max_q"),
        )
        .orderBy("ref")
    )


# --------------------------------- 2.12 workloads: FIFO stock allocation

_FIFO_ORACLE = """
WITH dem AS (
  SELECT l.l_partkey, p.p_brand, CAST(p.p_size AS BIGINT) * 20 AS stock,
         CAST(l.l_quantity AS BIGINT) AS qty,
         COALESCE(SUM(CAST(l.l_quantity AS BIGINT)) OVER (
           PARTITION BY l.l_partkey
           ORDER BY l.l_shipdate, l.l_orderkey, l.l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
alloc AS (
  SELECT p_brand, qty,
         LEAST(qty, GREATEST(stock - cum_before, 0)) AS alloc
  FROM dem
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(qty) AS BIGINT) AS demand,
       CAST(SUM(alloc) AS BIGINT) AS allocated,
       CAST(SUM(CASE WHEN alloc = qty THEN 1 ELSE 0 END) AS BIGINT)
         AS n_full,
       CAST(SUM(CASE WHEN alloc = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stockout,
       CAST(SUM(alloc) * 10000 // SUM(qty) AS BIGINT) AS fill_rate_bps
FROM alloc GROUP BY p_brand ORDER BY p_brand
"""


@query("wl_fifo_inventory", "2.12 composite workloads", _FIFO_ORACLE)
def wl_fifo_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO stock allocation: serve demand in ship-date order until stock runs out.

    The classic "allocate a finite opening balance first-come-first-served"
    workload (inventory ATP, budget burn-down, quota consumption): each
    part's opening stock (p_size x 20 — deterministic, straddles real
    demand so brands mix fills and stockouts) is consumed by its lineitems
    in (shipdate, orderkey, linenumber) order; a line gets
    least(qty, greatest(stock - cum_before, 0)).

    Scale shape: ONE running-sum window partitioned by part — the natural
    co-location key, millions of small independent partitions, no global
    sort — after a keyed join to the part dim (broadcast when the dim
    fits, shuffle-co-partitioned otherwise). Everything downstream is a
    keyed aggregate; all arithmetic exact int64 (quantities are whole
    numbers; the fill rate is integer basis points via floor division, no
    float rounding hazard)."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", (F.col("p_size").cast("long") * 20).alias("stock")
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dem = li.join(part, li.l_partkey == part.p_partkey).withColumn(
        "cum_before", F.coalesce(F.sum("qty").over(w), F.lit(0))
    )
    alloc = dem.select(
        "p_brand",
        "qty",
        F.least(
            F.col("qty"), F.greatest(F.col("stock") - F.col("cum_before"), F.lit(0))
        ).alias("alloc"),
    )
    return (
        alloc.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("qty").alias("demand"),
            F.sum("alloc").alias("allocated"),
            F.sum(F.when(F.col("alloc") == F.col("qty"), 1).otherwise(0)).alias(
                "n_full"
            ),
            F.sum(F.when(F.col("alloc") == 0, 1).otherwise(0)).alias("n_stockout"),
            F.expr("sum(alloc) * 10000 div sum(qty)").alias("fill_rate_bps"),
        )
        .orderBy("p_brand")
    )


# ------------------------- 2.8 sync: transaction-log snapshot isolation

_TXLOG_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderpriority <> '1-URGENT' OR o_orderkey % 2 = 0
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("sync_txlog_snapshot", "2.8 sync core", _TXLOG_ORACLE)
def sync_txlog_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal transactional table format: commit log -> snapshot read.

    The Delta/Iceberg mechanism built Spark-first with zero library
    dependency: data lives as immutable parquet segments, a JSONL commit
    log records add/remove file actions per version, and a snapshot read
    resolves the LIVE segment set (adds minus later removes) before
    touching any data. Three commits exercise the core transitions —
    v0 initial adds (one segment per priority), v1 rewrite (URGENT
    replaced by its even-orderkey subset: remove+add), v2 compaction
    (remove+add with identical rows — content no-op, layout change).
    Readers at the latest version must see exactly the surviving rows;
    the oracle states that surviving set as a predicate on the base table.

    Scale shape: the log is bounded METADATA (#segments, not #rows) —
    parsing it driver-side is the same bounded collect Delta's own log
    replay does; the data read is a plain multi-path parquet scan that
    prunes/pushes down like any other. Segment writes shuffle nothing
    (partition-local filters of the source).
    """
    import hashlib as _hashlib
    import json as _json
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = _os.path.join(
        _tempfile.gettempdir(), f"hdc_txlog_{tag}_{_os.getpid()}"
    )
    _shutil.rmtree(base, ignore_errors=True)
    _os.makedirs(_os.path.join(base, "data"), exist_ok=True)

    orders = load(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

    def seg(name: str, df: DataFrame) -> str:
        df.write.mode("overwrite").parquet(_os.path.join(base, "data", name))
        return name

    log: list[dict] = []
    for p in prios:
        nm = seg(f"prio_{p[0]}", orders.where(F.col("o_orderpriority") == p))
        log.append({"v": 0, "action": "add", "path": nm})
    log.append({"v": 1, "action": "remove", "path": "prio_1"})
    log.append(
        {
            "v": 1,
            "action": "add",
            "path": seg(
                "prio_1_even",
                orders.where(
                    (F.col("o_orderpriority") == "1-URGENT")
                    & (F.col("o_orderkey") % 2 == 0)
                ),
            ),
        }
    )
    log.append({"v": 2, "action": "remove", "path": "prio_2"})
    log.append(
        {
            "v": 2,
            "action": "add",
            "path": seg(
                "prio_2_compacted",
                orders.where(F.col("o_orderpriority") == "2-HIGH").coalesce(1),
            ),
        }
    )
    with open(_os.path.join(base, "commits.jsonl"), "w") as f:
        for entry in log:
            f.write(_json.dumps(entry) + "\n")

    # Snapshot resolution: replay the log in version order. The log is
    # bounded metadata (#segments), so this collect is O(#files) like
    # Delta's own state reconstruction, never O(rows).
    actions = (
        spark.read.json(_os.path.join(base, "commits.jsonl"))
        .orderBy("v", "action")  # removes sort before adds within a version:
        # a version that rewrites a path removes the OLD segment and adds
        # the new one under a DIFFERENT name, so ordering within v is safe
        .collect()
    )
    live: set[str] = set()
    for a in sorted(actions, key=lambda r: (r["v"],)):
        if a["action"] == "add":
            live.add(a["path"])
        else:
            live.discard(a["path"])
    paths = [_os.path.join(base, "data", p) for p in sorted(live)]
    snap = spark.read.parquet(*paths)
    return (
        snap.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "total_cents"
            ),
        )
        .orderBy("o_orderpriority")
    )


# ------------------- 2.10 streaming/ts: triangle-area downsampling (LTTB family)

_TRIANGLE_ORACLE = """
WITH pt AS (
  SELECT event_type, epoch_us(ts) AS x,
         CAST(round(value * 100, 0) AS BIGINT) AS y, ts, event_id
  FROM events
),
b AS (
  SELECT event_type, x // 3600000000 AS bucket,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy
  FROM pt GROUP BY event_type, x // 3600000000
),
nb AS (
  SELECT *,
         lag(n) OVER w AS np, lag(sx) OVER w AS sxp, lag(sy) OVER w AS syp,
         lead(n) OVER w AS nn, lead(sx) OVER w AS sxn, lead(sy) OVER w AS syn
  FROM b WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
),
sc AS (
  SELECT pt.event_type, nb.bucket, pt.ts, pt.event_id, pt.y,
         (sxp - CAST(pt.x AS HUGEINT) * np) * (syn - CAST(pt.y AS HUGEINT) * nn)
         - (sxn - CAST(pt.x AS HUGEINT) * nn) * (syp - CAST(pt.y AS HUGEINT) * np)
           AS d
  FROM pt
  JOIN nb ON pt.event_type = nb.event_type AND pt.x // 3600000000 = nb.bucket
  WHERE np IS NOT NULL AND nn IS NOT NULL
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_type, bucket ORDER BY abs(d) DESC, ts, event_id) AS rn
  FROM sc
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket, ts,
       CAST(y AS BIGINT) AS cents
FROM r WHERE rn = 1 ORDER BY event_type, bucket
"""


@query("ts_downsample_triangle", "2.10 streaming", _TRIANGLE_ORACLE)
def ts_downsample_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle-area downsampling (the LTTB family, parallel variant).

    Dashboard-grade series reduction: keep ONE visually-significant point
    per hour bucket — the point maximizing the triangle area against the
    neighboring buckets' centroids. True LTTB anchors on the previously
    SELECTED point (a sequential dependency that cannot parallelize);
    anchoring on fixed bucket centroids (the largest-triangle-one-bucket
    variant) keeps the visual property and makes every bucket independent.

    Exactness: with centroids p=(Sxp/np, Syp/np), n=(Sxn/nn, Syn/nn) and
    point (x,y), 2*Area*np*nn = (Sxp-x*np)(Syn-y*nn) - (Sxn-x*nn)(Syp-y*np)
    — multiplying through by the counts clears every division, so the
    argmax runs on EXACT integers (DECIMAL(38,0) here, HUGEINT in the
    oracle; epoch-micros x sums overflow int64 at modest bucket sizes).
    Ties break on (ts, event_id) — a total order.

    Scale shape: one map-combinable bucket aggregate (tiny: #buckets
    rows), lag/lead over the bucket series (partitioned by series key),
    then an equi-join of points to their own bucket's stats — broadcast
    (the bucket table is time-bounded metadata), so points never shuffle;
    the per-bucket argmax is a WindowGroupLimit-able rank on the
    (type, bucket) key. Interior buckets only (LTTB pins first/last
    points; edge buckets have no opposing anchor)."""
    from pyspark.sql import Window

    pt = load(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("x"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y"),
        "ts",
        "event_id",
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    b = pt.groupBy(
        "event_type", F.expr("x div 3600000000").alias("bucket")
    ).agg(
        dec(F.count(F.lit(1))).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
    )
    wb = Window.partitionBy("event_type").orderBy("bucket")
    nb = b.select(
        "event_type",
        "bucket",
        F.lag("n").over(wb).alias("np"),
        F.lag("sx").over(wb).alias("sxp"),
        F.lag("sy").over(wb).alias("syp"),
        F.lead("n").over(wb).alias("nn"),
        F.lead("sx").over(wb).alias("sxn"),
        F.lead("sy").over(wb).alias("syn"),
    ).where(F.col("np").isNotNull() & F.col("nn").isNotNull())
    sc = pt.withColumn("bucket", F.expr("x div 3600000000")).join(
        F.broadcast(nb), ["event_type", "bucket"]
    )
    d = (F.col("sxp") - dec(F.col("x")) * F.col("np")) * (
        F.col("syn") - dec(F.col("y")) * F.col("nn")
    ) - (F.col("sxn") - dec(F.col("x")) * F.col("nn")) * (
        F.col("syp") - dec(F.col("y")) * F.col("np")
    )
    wr = Window.partitionBy("event_type", "bucket").orderBy(
        F.abs(F.col("d")).desc(), "ts", "event_id"
    )
    return (
        sc.withColumn("d", d)
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select("event_type", "bucket", "ts", F.col("y").alias("cents"))
        .orderBy("event_type", "bucket")
    )
