"""Query suite, batch 2: scalar-function coverage (SURVEY.md §2.7),
window-function variants (§2.5), multi-dimensional aggregation
(rollup/pivot — §2.4 'expressible through SQL' surface), and correlated
subquery shapes. Same bitwise-parity conventions as queries.py.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_platform_spark.queries import DEC, _dec, _t


# ---------------------------------------------------------------------------
# scalar functions (§2.7)
# ---------------------------------------------------------------------------

def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/trim (the reference's whitelisted apply fns) plus the
    wider string surface: concat, substring, lpad, length, replace,
    regexp_extract, split-part."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.trim(F.lit("  padded  ")).alias("trimmed"),
        F.concat(F.col("c_name"), F.lit("@"), F.col("c_mktsegment")).alias("concatenated"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.length("c_name").cast("long").alias("name_len"),
        F.regexp_extract("c_name", r"(\d+)", 1).alias("name_digits"),
        F.replace(F.col("c_mktsegment"), F.lit("E"), F.lit("3")).alias("leeted"),
    )


ORACLE_STRING_FUNCTIONS = """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       lower(c_mktsegment) AS segment_lower,
       trim('  padded  ') AS trimmed,
       c_name || '@' || c_mktsegment AS concatenated,
       substring(c_name, 1, 8) AS name_prefix,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
       CAST(length(c_name) AS BIGINT) AS name_len,
       regexp_extract(c_name, '(\\d+)', 1) AS name_digits,
       replace(c_mktsegment, 'E', '3') AS leeted
FROM customer
"""


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal surface: extract fields, truncation, day arithmetic,
    diffs, quarter/dow."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
    )


ORACLE_DATE_FUNCTIONS = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(quarter(o_orderdate) AS BIGINT) AS q,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       CAST(day(o_orderdate) AS BIGINT) AS d,
       date_trunc('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL 30 DAY AS due_date,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k
FROM orders
"""


def q_math_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + null-handling surface: round/floor/ceil/abs/sqrt/ln, mod,
    coalesce/nullif/greatest/least."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_rounded"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("flag_or_none"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


ORACLE_MATH_NULL_FUNCTIONS = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 0) AS price_rounded,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       abs(l_discount - 0.05) AS disc_dev,
       round(sqrt(l_quantity), 6) AS qty_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       l_orderkey % 7 AS key_mod7,
       coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate
FROM lineitem
"""


# ---------------------------------------------------------------------------
# window variants (§2.5)
# ---------------------------------------------------------------------------

def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: per-customer order-to-order gap in days."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        )
        .cast("long")
        .alias("days_since_prev"),
    )


ORACLE_WINDOW_LAG_LEAD = """
SELECT o_custkey, o_orderkey,
       lag(o_orderkey) OVER w AS prev_orderkey,
       lead(o_orderkey) OVER w AS next_orderkey,
       CAST(date_diff('day',
            lag(CAST(o_orderdate AS DATE)) OVER w,
            CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / dense_rank / ntile / percent_rank / cume_dist over a
    deterministic ordering (unique o_orderkey tie-break), scale-safe.

    The naive form is a global orderBy-without-partitionBy window over
    the full orders fact — ONE task at 100 TB. Because the output keeps
    only rn <= 500 and the ordering is total (unique key tie-break), the
    distribution functions are pure arithmetic on (rn, N):

      * the top-500 rows come from orderBy().limit(500) — compiles to
        TakeOrderedAndProject, a parallel per-partition top-K + merge;
      * rn / dense_rank over that bounded 500-row frame equal their
        global values (both depend only on rows ranked above, all of
        which are inside the prefix);
      * with no peers (unique tie-break): percent_rank = (rn-1)/(N-1),
        cume_dist = rn/N, and ntile(k) is the standard first-(N mod k)-
        buckets-get-ceil(N/k) formula — N arrives as a broadcast 1-row
        aggregate, never a global sort.

    The only window left runs over 500 rows, independent of table size.
    """
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    n_df = orders.agg(F.count(F.lit(1)).alias("_n"))
    top = orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(500)
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    ranked = top.select(
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    ).crossJoin(F.broadcast(n_df))
    rn, n = F.col("rn"), F.col("_n")
    base = F.floor(n / 10)          # bucket floor size
    rem = n % 10                    # first `rem` buckets get base+1 rows
    cutoff = rem * (base + F.lit(1))
    decile = F.when(rn <= cutoff, F.ceil(rn / (base + F.lit(1)))).otherwise(
        rem + F.ceil((rn - cutoff) / base)
    )
    return ranked.select(
        "o_orderkey",
        "o_totalprice",
        "rn",
        "drnk",
        decile.cast("long").alias("decile"),
        F.round((rn - F.lit(1)) / (n - F.lit(1)), 6).alias("pct_rank"),
        F.round(rn / n, 6).alias("cdist"),
    )


ORACLE_WINDOW_DISTRIBUTION = """
WITH t AS (
  SELECT o_orderkey, o_totalprice,
         CAST(row_number() OVER w AS BIGINT) AS rn,
         CAST(dense_rank() OVER w AS BIGINT) AS drnk,
         CAST(ntile(10) OVER w AS BIGINT) AS decile,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cdist
  FROM orders
  WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
)
SELECT * FROM t WHERE rn <= 500
"""


def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with explicit frames per partition."""
    orders = _t(spark, sf_dir, "orders")
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w_full).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
    )


ORACLE_WINDOW_FIRST_LAST = """
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER w AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ---------------------------------------------------------------------------
# multi-dimensional aggregation
# ---------------------------------------------------------------------------

def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(returnflag, linestatus): subtotals + grand total."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


ORACLE_ROLLUP_REVENUE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


ORACLE_CUBE_COUNTS = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_pivot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per year x market segment (DataFrame pivot;
    oracle via portable conditional aggregation)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    out = (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .pivot("c_mktsegment", segments)
        .agg(F.count(F.lit(1)))
    )
    # pivot yields nulls for empty cells; normalize to 0 to match the
    # conditional-agg oracle
    for s in segments:
        out = out.withColumn(s, F.coalesce(F.col(s), F.lit(0)))
    return out


ORACLE_PIVOT_SEGMENTS = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS "AUTOMOBILE",
       CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS "BUILDING",
       CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS "FURNITURE",
       CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS "HOUSEHOLD",
       CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS "MACHINERY"
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H-shaped composites + correlated subqueries
# ---------------------------------------------------------------------------

def q_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 open-order revenue by orderkey."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


ORACLE_TOP_UNSHIPPED = """
SELECT o_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'O'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight filter + single global agg (the pushdown
    showcase — predicate reaches the parquet scan)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("forecast_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_FORECAST_REVENUE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS forecast_revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders having >= 1 late lineitem (correlated
    EXISTS, decorrelated by Catalyst into a semi join)."""
    spark_t = __import__("data_pipeline_platform_spark.operators.sql_transformer",
                         fromlist=["SQLTransformer"]).SQLTransformer(spark)
    return spark_t.transform_multi(
        {"orders_v": _t(spark, sf_dir, "orders"), "lineitem_v": _t(spark, sf_dir, "lineitem")},
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders_v
        WHERE EXISTS (
          SELECT 1 FROM lineitem_v
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        )
        GROUP BY o_orderpriority
        """,
    )


ORACLE_EXISTS_CORRELATED = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
"""


def q_small_quantity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: items below 50% of their part's average quantity
    (scalar correlated subquery -> aggregate + self-join rewrite)."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


ORACLE_SMALL_QUANTITY_PARTS = """
WITH avg_q AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
       COUNT(*) AS n_small
FROM lineitem JOIN avg_q ON l_partkey = pk
WHERE l_quantity < 0.5 * avg_qty
"""


def q_conditional_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if + distinct-on-expression + filtered aggregates.

    Every output is pinned to an unambiguous representation: all three
    counters cast to BIGINT and the conditional MAX coalesced to -1, so
    groups with no qualifying row hash identically in both engines
    (r01's one hash mismatch was representational, not semantic)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).cast("long").alias("n_high"),
        F.countDistinct(F.col("user_id") % 10).cast("long").alias("user_buckets"),
        F.coalesce(
            F.max(F.when(F.col("value") > 100, F.col("user_id"))), F.lit(-1)
        )
        .cast("long")
        .alias("max_high_user"),
    )


ORACLE_CONDITIONAL_DISTINCT = """
SELECT event_type,
       CAST(count_if(value > 100) AS BIGINT) AS n_high,
       CAST(COUNT(DISTINCT user_id % 10) AS BIGINT) AS user_buckets,
       CAST(COALESCE(MAX(CASE WHEN value > 100 THEN user_id END), -1) AS BIGINT) AS max_high_user
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# batch 3: statistics, argmin joins, array functions
# ---------------------------------------------------------------------------

def q_value_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance/stddev with *engineered determinism*: accumulate
    exact integer sums (cents and squared cents), then evaluate the
    closed-form variance in double with an expression both engines
    compute identically. Plain stddev() would differ in final bits
    between engines because float accumulation order differs."""
    ev = _t(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("long")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s"),
        F.sum(c * c).alias("ss"),
    )
    s_d = F.col("s").cast("double")
    ss_d = F.col("ss").cast("double")
    n_d = F.col("n").cast("double")
    var_cents = (ss_d - s_d * s_d / n_d) / n_d
    return agg.select(
        "event_type",
        "n",
        (s_d / 100.0 / n_d).alias("mean_value"),
        F.round(var_cents / 10000.0, 6).alias("var_pop"),
        F.round(F.sqrt(var_cents) / 100.0, 6).alias("stddev_pop"),
    )


ORACLE_VALUE_STATISTICS = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc FROM events
), agg AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(vc) AS BIGINT) AS s, CAST(SUM(vc * vc) AS BIGINT) AS ss
  FROM c GROUP BY event_type
)
SELECT event_type, n,
       CAST(s AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) AS mean_value,
       round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 10000.0, 6) AS var_pop,
       round(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) / 100.0, 6) AS stddev_pop
FROM agg
"""


def q_argmin_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the lowest-balance supplier per nation (argmin via
    row_number — one shuffle, no self-join; ties broken by suppkey)."""
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return (
        supp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("n_name", "s_suppkey", "s_name", "s_acctbal")
    )


ORACLE_ARGMIN_SUPPLIER = """
WITH ranked AS (
  SELECT s_nationkey, s_suppkey, s_name, s_acctbal,
         row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS rn
  FROM supplier
)
SELECT n_name, s_suppkey, s_name, s_acctbal
FROM ranked JOIN nation ON s_nationkey = n_nationkey
WHERE rn = 1
"""


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over the embedding column: element access, slicing,
    size, min/max — first-class array<float> handling (the reference has
    no array types at all; SURVEY §1.1)."""
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_component"),
        F.element_at("embedding", -1).alias("last_component"),
        F.array_min("embedding").alias("min_component"),
        F.array_max("embedding").alias("max_component"),
        F.size(F.slice("embedding", 1, 8)).cast("long").alias("head_len"),
    )


ORACLE_ARRAY_FUNCTIONS = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       embedding[1] AS first_component,
       embedding[-1] AS last_component,
       list_min(embedding) AS min_component,
       list_max(embedding) AS max_component,
       CAST(len(embedding[1:8]) AS BIGINT) AS head_len
FROM embeddings
"""


def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode: (doc, position, token) rows for a doc subset —
    the UDTF-shaped operation (generator in the select list)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "token"),
    ).withColumn("pos", F.col("pos").cast("long"))


ORACLE_POSEXPLODE_TOKENS = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents WHERE doc_id < 20
)
SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token
FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)
"""


BATCH2_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "string_functions": q_string_functions,
    "date_functions": q_date_functions,
    "math_null_functions": q_math_null_functions,
    "window_lag_lead": q_window_lag_lead,
    "window_distribution": q_window_distribution,
    "window_first_last": q_window_first_last,
    "rollup_revenue": q_rollup_revenue,
    "cube_counts": q_cube_counts,
    "pivot_segments": q_pivot_segments,
    "top_unshipped": q_top_unshipped,
    "forecast_revenue": q_forecast_revenue,
    "exists_correlated": q_exists_correlated,
    "small_quantity_parts": q_small_quantity_parts,
    "conditional_distinct": q_conditional_distinct,
    "value_statistics": q_value_statistics,
    "argmin_supplier": q_argmin_supplier,
    "array_functions": q_array_functions,
    "posexplode_tokens": q_posexplode_tokens,
}

BATCH2_ORACLES: Dict[str, str] = {
    "string_functions": ORACLE_STRING_FUNCTIONS,
    "date_functions": ORACLE_DATE_FUNCTIONS,
    "math_null_functions": ORACLE_MATH_NULL_FUNCTIONS,
    "window_lag_lead": ORACLE_WINDOW_LAG_LEAD,
    "window_distribution": ORACLE_WINDOW_DISTRIBUTION,
    "window_first_last": ORACLE_WINDOW_FIRST_LAST,
    "rollup_revenue": ORACLE_ROLLUP_REVENUE,
    "cube_counts": ORACLE_CUBE_COUNTS,
    "pivot_segments": ORACLE_PIVOT_SEGMENTS,
    "top_unshipped": ORACLE_TOP_UNSHIPPED,
    "forecast_revenue": ORACLE_FORECAST_REVENUE,
    "exists_correlated": ORACLE_EXISTS_CORRELATED,
    "small_quantity_parts": ORACLE_SMALL_QUANTITY_PARTS,
    "conditional_distinct": ORACLE_CONDITIONAL_DISTINCT,
    "value_statistics": ORACLE_VALUE_STATISTICS,
    "argmin_supplier": ORACLE_ARGMIN_SUPPLIER,
    "array_functions": ORACLE_ARRAY_FUNCTIONS,
    "posexplode_tokens": ORACLE_POSEXPLODE_TOKENS,
}
