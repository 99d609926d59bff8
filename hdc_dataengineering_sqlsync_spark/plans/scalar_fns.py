"""SURVEY.md §2.7 — scalar functions (string / regex / date / math / array /
map / json / hash / conditional).

Oracle SQL casts DuckDB's return types down to Spark's (convention 6):
DuckDB length/strpos -> BIGINT vs Spark INT; floor -> DOUBLE vs Spark LONG;
sign -> TINYINT vs Spark DOUBLE; year() -> BIGINT vs Spark INT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdc_dataengineering_sqlsync_spark.plans.catalog import query
from hdc_dataengineering_sqlsync_spark.registry import load


@query(
    "fn_string_suite",
    "2.7 scalar functions",
    """
    SELECT c_custkey,
           concat_ws('-', upper(substring(c_name, 1, 8)), lower(c_mktsegment)) AS tag,
           trim(c_name) AS trimmed,
           lpad(cast(c_custkey AS VARCHAR), 8, '0') AS padded,
           replace(c_name, 'Customer', 'C') AS replaced,
           cast(length(c_name) AS INT) AS name_len,
           cast(strpos(c_name, '1') AS INT) AS pos_1
    FROM customer ORDER BY c_custkey
    """,
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("-", F.upper(F.substring("c_name", 1, 8)), F.lower("c_mktsegment")).alias("tag"),
        F.trim("c_name").alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("replaced"),
        F.length("c_name").alias("name_len"),
        F.instr(F.col("c_name"), "1").alias("pos_1"),
    ).orderBy("c_custkey")


@query(
    "fn_regexp",
    "2.7 scalar functions",
    r"""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)$', 1) AS trailing_digits,
           regexp_replace(c_name, '[aeiouAEIOU]', '', 'g') AS devoweled,
           regexp_matches(c_name, '[02468]$') AS ends_even
    FROM customer ORDER BY c_custkey
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # patterns kept in the RE2 ∩ Java-regex common subset; DuckDB
    # regexp_replace needs the 'g' flag to match Spark's replace-all.
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("trailing_digits"),
        F.regexp_replace("c_name", r"[aeiouAEIOU]", "").alias("devoweled"),
        F.col("c_name").rlike(r"[02468]$").alias("ends_even"),
    ).orderBy("c_custkey")


_SPLIT_ORACLE = """
SELECT token, count(*) AS cnt
FROM (SELECT unnest(string_split(p_type, ' ')) AS token FROM part)
GROUP BY token ORDER BY cnt DESC, token
"""


@query("fn_split_explode", "2.7 scalar functions", _SPLIT_ORACLE)
def fn_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_type", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
    )


@query(
    "fn_date_suite",
    "2.7 scalar functions",
    """
    WITH d AS (SELECT cast(o_orderdate AS DATE) AS od FROM orders)
    SELECT cast(year(od) AS INT) AS y,
           count(*) AS n,
           count(*) FILTER (WHERE month(od) = 1) AS n_jan,
           count(*) FILTER (WHERE dayofweek(od) + 1 = 1) AS n_sunday,
           max(od + INTERVAL 30 DAY)::DATE AS max_plus30,
           min(cast(date_trunc('month', od) AS DATE)) AS min_month_start,
           min(last_day(od)) AS min_last_day,
           cast(sum(datediff('day', od, DATE '1998-01-01')) AS BIGINT) AS days_to_98
    FROM d GROUP BY y ORDER BY y
    """,
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date function suite. Convention 6: Spark dayofweek is 1=Sunday while
    DuckDB's is 0=Sunday, so the oracle writes dayofweek(x)+1; DuckDB year()
    returns BIGINT -> cast to INT."""
    o = load(spark, sf_dir, "orders")
    d = o.select(F.col("o_orderdate").cast("date").alias("od"))
    return (
        d.groupBy(F.year("od").alias("y"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.month("od") == 1, 1)).alias("n_jan"),
            F.count(F.when(F.dayofweek("od") == 1, 1)).alias("n_sunday"),
            F.max(F.date_add("od", 30)).alias("max_plus30"),
            F.min(F.date_trunc("month", "od").cast("date")).alias("min_month_start"),
            F.min(F.last_day("od")).alias("min_last_day"),
            F.sum(F.datediff(F.lit("1998-01-01").cast("date"), F.col("od"))).alias("days_to_98"),
        )
        .orderBy("y")
    )


@query(
    "fn_math_suite",
    "2.7 scalar functions",
    """
    SELECT round(sum(abs(l_quantity - 25.0)), 2) AS s_abs,
           cast(sum(floor(l_extendedprice / 1000.0)) AS BIGINT) AS s_floor,
           cast(sum(ceil(l_discount * 100.0)) AS BIGINT) AS s_ceil,
           round(sum(pow(l_quantity, 2.0)), 2) AS s_pow,
           round(sum(sqrt(l_extendedprice)), 2) AS s_sqrt,
           round(sum(ln(l_extendedprice + 1.0)), 4) AS s_ln,
           round(sum(log10(l_extendedprice + 1.0)), 4) AS s_log10,
           round(sum(cast(sign(l_quantity - 25.0) AS DOUBLE)), 1) AS s_sign,
           cast(sum(mod(l_orderkey, 7)) AS BIGINT) AS s_pmod,
           round(sum(greatest(l_quantity, l_discount * 100.0)), 2) AS s_great,
           round(sum(least(l_quantity, l_discount * 100.0)), 2) AS s_least
    FROM lineitem
    """,
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pmod == mod here because l_orderkey >= 0 (SURVEY §2.7: non-negative
    # args sidestep the pmod-vs-% sign divergence).
    li = load(spark, sf_dir, "lineitem")
    q, ep, disc = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return li.agg(
        F.round(F.sum(F.abs(q - 25.0)), 2).alias("s_abs"),
        F.sum(F.floor(ep / 1000.0)).alias("s_floor"),
        F.sum(F.ceil(disc * 100.0)).alias("s_ceil"),
        F.round(F.sum(F.pow(q, 2.0)), 2).alias("s_pow"),
        F.round(F.sum(F.sqrt(ep)), 2).alias("s_sqrt"),
        F.round(F.sum(F.log(ep + 1.0)), 4).alias("s_ln"),
        F.round(F.sum(F.log10(ep + 1.0)), 4).alias("s_log10"),
        F.round(F.sum(F.signum(q - 25.0)), 1).alias("s_sign"),
        F.sum(F.pmod(F.col("l_orderkey"), F.lit(7))).alias("s_pmod"),
        F.round(F.sum(F.greatest(q, disc * 100.0)), 2).alias("s_great"),
        F.round(F.sum(F.least(q, disc * 100.0)), 2).alias("s_least"),
    )


@query(
    "fn_array_suite",
    "2.7 scalar functions",
    """
    SELECT vec_id,
           cast(len(embedding) AS INT) AS dim,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) AS vsum,
           round(sqrt(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS l2norm
    FROM embeddings ORDER BY vec_id LIMIT 50
    """,
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column, computed in
    DOUBLE on both sides (FIXTURES.md hazard #6). See functions/vectors.py
    for the reusable expressions."""
    e = load(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    vsum = F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x)
    sq_sum = F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x * x)
    return (
        e.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(vsum, 4).alias("vsum"),
            F.round(F.sqrt(sq_sum), 4).alias("l2norm"),
        )
        .orderBy("vec_id")
        .limit(50)
    )


@query(
    "fn_map_struct",
    "2.7 scalar functions",
    # Identity oracle: the map/struct round-trip must reproduce the source
    # scalars exactly (DuckDB's map[] access returns LIST, so the mechanism
    # is engine-specific but the contract output is plain columns).
    """
    SELECT o_orderkey, o_orderstatus AS status_from_map, o_orderkey AS key_from_struct
    FROM orders ORDER BY o_orderkey
    """,
)
def fn_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    m = F.create_map(F.lit("status"), F.col("o_orderstatus"))
    s = F.struct(F.col("o_orderkey"), F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        m.getItem("status").alias("status_from_map"),
        s.getField("o_orderkey").alias("key_from_struct"),
    ).orderBy("o_orderkey")


@query(
    "fn_json_extract",
    "2.7 scalar functions",
    """
    SELECT event_type,
           cast(sum(cast(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@query(
    "fn_hash_digest",
    "2.7 scalar functions",
    """
    SELECT count(DISTINCT md5(concat_ws('|', cast(o_orderkey AS VARCHAR), o_orderstatus))) AS n_digests,
           count(*) AS n
    FROM orders
    """,
    bench=True,
)
def fn_hash_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine row checksums (md5 of canonical strings is byte-identical
    across engines — FIXTURES.md hazard #2). The full-row version powers the
    sync diff (functions/digests.py)."""
    o = load(spark, sf_dir, "orders")
    digest = F.md5(F.concat_ws("|", F.col("o_orderkey").cast("string"), F.col("o_orderstatus")))
    return o.agg(
        F.countDistinct(digest).alias("n_digests"), F.count(F.lit(1)).alias("n")
    )


@query(
    "fn_conditional",
    "2.7 scalar functions",
    """
    SELECT count(*) - count(nullif(l_discount, 0.0)) AS n_zero_disc,
           round(sum(coalesce(nullif(l_discount, 0.0), 0.5)), 2) AS s_coalesce,
           round(sum(least(l_discount, l_tax)), 2) AS s_least_dt,
           round(sum(greatest(coalesce(nullif(l_tax, 0.0), 0.0), l_discount)), 2) AS s_great_cond
    FROM lineitem
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc, tax = F.col("l_discount"), F.col("l_tax")
    nz = F.nullif(disc, F.lit(0.0))
    return li.agg(
        (F.count(F.lit(1)) - F.count(nz)).alias("n_zero_disc"),
        F.round(F.sum(F.coalesce(nz, F.lit(0.5))), 2).alias("s_coalesce"),
        F.round(F.sum(F.least(disc, tax)), 2).alias("s_least_dt"),
        F.round(F.sum(F.greatest(F.coalesce(F.nullif(tax, F.lit(0.0)), F.lit(0.0)), disc)), 2).alias(
            "s_great_cond"
        ),
    )


@query(
    "fn_levenshtein",
    "2.7 scalar functions",
    """
    SELECT lang,
           round(avg(levenshtein(substr(text, 1, 20), substr(text, 21, 20))), 2) AS avg_lev,
           CAST(max(levenshtein(substr(text, 1, 20), substr(text, 21, 20))) AS INT)
             AS max_lev
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance between two fixed slices of each doc, aggregated per
    lang — the fuzzy-match primitive behind typo-tolerant dedup (both
    engines implement the same Wagner-Fischer distance)."""
    d = load(spark, sf_dir, "documents")
    lev = F.levenshtein(F.substring("text", 1, 20), F.substring("text", 21, 20))
    return (
        d.groupBy("lang")
        .agg(F.round(F.avg(lev), 2).alias("avg_lev"), F.max(lev).alias("max_lev"))
        .orderBy("lang")
    )


@query(
    "fn_bitwise_scalar",
    "2.7 scalar functions",
    """
    SELECT o_orderstatus,
           CAST(sum(((o_orderkey % 16) << 2) | ((o_orderkey % 16) >> 1)) AS BIGINT) AS s1,
           CAST(sum(xor(o_orderkey % 16, 5)) AS BIGINT) AS s2,
           CAST(sum((o_orderkey % 16) & 12) AS BIGINT) AS s3
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def fn_bitwise_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar bit ops (shift left/right, or, xor, and) over a bounded domain,
    summed per status — the bit-packing primitives used by SimHash/LSH
    signatures."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 16
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.sum(F.shiftleft(k, 2).bitwiseOR(F.shiftright(k, 1))).alias("s1"),
            F.sum(k.bitwiseXOR(F.lit(5))).alias("s2"),
            F.sum(k.bitwiseAND(F.lit(12))).alias("s3"),
        )
        .orderBy("o_orderstatus")
    )


_BINARY_ORACLE = """
SELECT c_mktsegment,
       count(DISTINCT base64(CAST(c_name AS BLOB))) AS n_b64,
       CAST(sum(length(hex(CAST(c_name AS BLOB)))) AS BIGINT) AS hex_chars,
       count(*) AS n
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


@query("fn_binary_encode", "2.7 scalar-fns", _BINARY_ORACLE)
def fn_binary_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encodings (base64 / hex — probed byte-identical across
    engines): per segment, distinct base64 payloads and total hex length.
    The encode path a sync uses to move varbinary columns through text
    transports."""
    c = load(spark, sf_dir, "customer")
    b = F.col("c_name").cast("binary")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.countDistinct(F.base64(b)).alias("n_b64"),
            F.sum(F.length(F.hex(b))).alias("hex_chars"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )
