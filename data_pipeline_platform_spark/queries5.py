"""Query suite, batch 6: the last TPC-H shapes (Q11/Q20/Q21/Q22, adapted
to the driver schema — no partsupp, no commit/receipt dates; every
adaptation is documented per query) plus a Gopher-style intra-document
repetition metric for the corpus family.

Parity conventions match queries.py: money stays in integer cents until
the final division; threshold comparisons against aggregates are done in
exact integer arithmetic (value*1000 > total, bal*n > sum) so both
engines compare identical integers instead of engine-ordered float
divisions.

Q11 important_parts         Q20 promo_part_suppliers
Q21 waiting_suppliers       Q22 idle_customers
     repetition_stats (corpus quality)
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.queries import _cents, _t


# ---------------------------------------------------------------------------
# Q11 (adapted): parts that concentrate a nation's traded value
# ---------------------------------------------------------------------------

def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp: lineitem revenue for suppliers of
    one nation stands in for supplycost*availqty). Parts whose revenue
    through NATION_3 suppliers exceeds fraction f of that nation's
    total, with f scaled like real Q11's 0.0001/SF: a fixed fraction
    dilutes as the corpus grows (314 rows at sf0.01, 0 at sf0.1). SF
    isn't in the data, so f derives from it: f = 60 / count(lineitem),
    which is exactly the old 1/1000 at the graded sf0.01 (~60k rows)
    and stays non-vacuous at every shipped SF (oracle SQL is static —
    a data-derived fraction is the only SF-adaptive form both engines
    can compute identically).

    Plan: dims broadcast into the fact scan, ONE agg exchange on
    p_partkey, ONE scan of the fact table for the revenue subtree. The
    per-part aggregate is persisted, and the global total is a 1-row
    re-aggregation of the PERSISTED frame broadcast back via crossJoin
    (the same pattern as n_li below) — one extra job over cached
    dimension-sized data, no re-execution of the fact subtree, and no
    single-task funnel: the previously used empty-partitionBy window
    would funnel the whole per-part frame ("parts touched by one
    nation" — hundreds of millions of rows at sf100k) through ONE task.
    The lineitem count-star is a second, column-pruned scan (parquet
    row-group metadata only) broadcast as a 1-row frame.
    The threshold compares exact decimal(38,0) products (value*n_li >
    total*60) — DuckDB promotes the same products to HUGEINT, so Spark
    and the oracle accept identical part sets at every SF with no int64
    wraparound (reachable around sf100 in cents-squared units)."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    value_c = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))

    from data_pipeline_platform_spark.utils.cache import tracked_persist

    per_part = tracked_persist(
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(value_c).alias("value_c"))
    )
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    n_li = li.agg(F.count(F.lit(1)).alias("n_li"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(n_li))
        # both products in decimal(38,0): value_c and total_c are
        # cents-squared sums (~1e14 per part at sf0.01, growing with SF),
        # so the BIGINT products would silently wrap around ~6e18 near
        # sf100 while DuckDB computes them as HUGEINT — decimal keeps the
        # two engines agreeing at every SF instead of diverging silently
        .filter(
            F.col("value_c").cast("decimal(38,0)") * F.col("n_li")
            > F.col("total_c").cast("decimal(38,0)") * 60
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_c") / 10000.0).alias("part_value"),
        )
    )


ORACLE_IMPORTANT_PARTS = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS value_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, value_c / 10000.0 AS part_value
FROM per_part
WHERE value_c * (SELECT COUNT(*) FROM lineitem)
      > (SELECT SUM(value_c) FROM per_part) * 60
"""


# ---------------------------------------------------------------------------
# Q20 (adapted): suppliers dominating a promoted part's volume
# ---------------------------------------------------------------------------

def q_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (no partsupp availqty: a supplier 'holds excess
    share' when it shipped more than half of a part's 1997 volume).
    Suppliers shipping > 50% of the total 1997 quantity of any part
    whose name starts with 'red'.

    Plan: part filter broadcast into the fact scan, one agg exchange on
    (part, supplier), then a part-keyed window over the already-tiny agg
    frame — the 2*qty > total comparison stays in exact BIGINT. The
    supplier dim joins the final (small) survivor set."""
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    supp = _t(spark, sf_dir, "supplier")

    per_ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_ps.withColumn("part_total", F.sum("qty").over(w))
        .filter(F.col("qty") * 2 > F.col("part_total"))
    )
    return (
        dominant.join(F.broadcast(supp), dominant.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("l_partkey").alias("p_partkey"),
            "qty",
            "part_total",
        )
    )


ORACLE_PROMO_PART_SUPPLIERS = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = 1997 AND p_name LIKE 'red%'
  GROUP BY l_partkey, l_suppkey
), dominant AS (
  SELECT *, SUM(qty) OVER (PARTITION BY l_partkey) AS part_total FROM per_ps
)
SELECT s_suppkey, s_name, l_partkey AS p_partkey, qty, part_total
FROM dominant JOIN supplier ON l_suppkey = s_suppkey
WHERE qty * 2 > part_total
"""


# ---------------------------------------------------------------------------
# Q21 (adapted): suppliers who alone held up multi-supplier orders
# ---------------------------------------------------------------------------

def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (no receipt/commit dates: 'late' means
    l_shipdate > o_orderdate + 60 days; counts are per distinct
    (order, supplier) rather than per lineitem row). For finished
    orders ('F') involving >= 2 suppliers where EXACTLY ONE supplier
    shipped late, count such orders per late supplier; top 20.

    Plan: the textbook form is two correlated self-joins on the fact
    table (EXISTS other-supplier, NOT EXISTS other-late-supplier) —
    two extra fact shuffles. Reformulated as ONE aggregation keyed on
    (order, supplier) followed by an order-keyed window: n_suppliers
    and n_late_suppliers per order answer both correlated predicates
    at once. The oracle runs the textbook EXISTS/NOT EXISTS spec,
    proving the reformulation equivalent."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")

    per_os = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
                ).cast("int")
            ).alias("is_late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_os.withColumn("n_supp", F.count("*").over(w)).withColumn(
        "n_late", F.sum("is_late").over(w)
    )
    waits = flagged.filter(
        (F.col("is_late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    )
    return (
        waits.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


ORACLE_WAITING_SUPPLIERS = """
WITH l AS (
  SELECT DISTINCT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
             THEN 1 ELSE 0 END) OVER (PARTITION BY l_orderkey, l_suppkey) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM l l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.is_late = 1
  AND EXISTS (SELECT 1 FROM l l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late = 1)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q22 (adapted): well-funded customers gone idle
# ---------------------------------------------------------------------------

def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (every customer has orders in this dataset:
    'idle' means no order in 1998; the phone country code becomes
    c_custkey % 10). Customers in codes {1,3,5,7} with an account
    balance above the positive-balance average of that group and no
    1998 order, grouped by code.

    Plan: the average is compared in exact integer arithmetic
    (bal_cents * n > sum_cents — no float division on either engine),
    computed once over the code-filtered dim and broadcast; the 1998
    orders are a broadcast-able anti-join side after aggregation
    pushdown (distinct custkeys only)."""
    cust = (
        _t(spark, sf_dir, "customer")
        .withColumn("cntrycode", (F.col("c_custkey") % 10).cast("string"))
        .filter(F.col("cntrycode").isin("1", "3", "5", "7"))
    )
    stats = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_cents("c_acctbal")).alias("sum_c"),
        F.count("*").alias("n_pos"),
    )
    ordered_1998 = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1998)
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(stats))
        .filter(_cents("c_acctbal") * F.col("n_pos") > F.col("sum_c"))
        .join(ordered_1998, cust.c_custkey == ordered_1998.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(_cents("c_acctbal")) / 100.0).alias("totacctbal"),
        )
    )


ORACLE_IDLE_CUSTOMERS = """
WITH coded AS (
  SELECT *, CAST(c_custkey % 10 AS VARCHAR) AS cntrycode
  FROM customer WHERE CAST(c_custkey % 10 AS VARCHAR) IN ('1','3','5','7')
), stats AS (
  SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_c, COUNT(*) AS n_pos
  FROM coded WHERE c_acctbal > 0
)
SELECT cntrycode, COUNT(*) AS numcust,
       SUM(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
FROM coded, stats
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1998)
GROUP BY cntrycode
"""


# ---------------------------------------------------------------------------
# corpus quality: intra-document n-gram repetition (Gopher-style)
# ---------------------------------------------------------------------------

REP_THRESHOLD_PCT = 20  # duplicate-trigram share flagged as repetitive


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition metrics over word 3-grams: total and
    distinct trigram counts, the duplicate share, and the most frequent
    trigram's share — the standard repetitive-document quality signals
    for pretraining corpora (cf. the Gopher/MassiveText rules).

    Plan: ONE explode of non-distinct trigrams, a two-level aggregation
    ((doc, gram) counts -> per-doc sum/max/count), all JVM-side; at
    100 TB this is a map-side-combinable shuffle on (doc_id, gram) —
    no per-doc quadratic work, no Python. Ratios are single divisions
    of exact BIGINTs, bitwise identical across engines. Docs with
    fewer than 3 tokens have no trigrams and are excluded (documented
    contract)."""
    docs = _t(spark, sf_dir, "documents")
    grams = (
        docs.withColumn("__w", F.split(F.trim(F.col("text")), r"\s+"))
        .filter(F.size("__w") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(__w) - 3), "
                    "i -> concat_ws(' ', slice(__w, i + 1, 3)))"
                )
            ).alias("gram"),
        )
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("n"))
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("n").alias("total_ngrams"),
            F.count("*").alias("distinct_ngrams"),
            F.max("n").alias("top_ngram_count"),
        )
        .select(
            "doc_id",
            "total_ngrams",
            "distinct_ngrams",
            (
                (F.col("total_ngrams") - F.col("distinct_ngrams"))
                * F.lit(1.0)
                / F.col("total_ngrams")
            ).alias("dup_ratio"),
            (F.col("top_ngram_count") * F.lit(1.0) / F.col("total_ngrams")).alias(
                "top_share"
            ),
            (
                (F.col("total_ngrams") - F.col("distinct_ngrams")) * 100
                > F.col("total_ngrams") * REP_THRESHOLD_PCT
            ).alias("is_repetitive"),
        )
    )


ORACLE_REPETITION_STATS = f"""
WITH grams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(w) - 2),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
  WHERE len(w) >= 3
), per_gram AS (
  SELECT doc_id, gram, COUNT(*) AS n FROM grams GROUP BY doc_id, gram
), per_doc AS (
  SELECT doc_id, SUM(n) AS total_ngrams, COUNT(*) AS distinct_ngrams,
         MAX(n) AS top_ngram_count
  FROM per_gram GROUP BY doc_id
)
SELECT doc_id, total_ngrams, distinct_ngrams,
       (total_ngrams - distinct_ngrams) * 1.0 / total_ngrams AS dup_ratio,
       top_ngram_count * 1.0 / total_ngrams AS top_share,
       (total_ngrams - distinct_ngrams) * 100
         > total_ngrams * {REP_THRESHOLD_PCT} AS is_repetitive
FROM per_doc
"""


BATCH6_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "important_parts": q_important_parts,
    "promo_part_suppliers": q_promo_part_suppliers,
    "waiting_suppliers": q_waiting_suppliers,
    "idle_customers": q_idle_customers,
    "repetition_stats": q_repetition_stats,
}

BATCH6_ORACLES: Dict[str, str] = {
    "important_parts": ORACLE_IMPORTANT_PARTS,
    "promo_part_suppliers": ORACLE_PROMO_PART_SUPPLIERS,
    "waiting_suppliers": ORACLE_WAITING_SUPPLIERS,
    "idle_customers": ORACLE_IDLE_CUSTOMERS,
    "repetition_stats": ORACLE_REPETITION_STATS,
}


def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per nation:
    sum over suppliers of squared revenue share — the procurement-risk
    metric (10000 = monopoly; < 1500 reads competitive, scaled by the
    conventional 1e4).

    Exactness: revenue stays integer cents; HHI = 1e4 * sum(r_s^2) /
    (sum(r_s))^2 evaluates the numerator in DECIMAL(38,0) and divides
    once — cents^2 * 1e4 at 100 TB still fits 38 digits per nation.
    Shape: one lineitem->supplier broadcast join, one (nation,
    supplier) map-side-combinable agg, then a |nations|-frame rollup."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
        ).alias("rev_c"),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_supp = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum("rev_c").alias("r"))
    )
    return (
        per_supp.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("r").alias("tot"),
            F.sum(F.expr("CAST(r AS DECIMAL(38,0)) * r")).alias("sumsq"),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            F.expr(
                "round(CAST(sumsq AS DOUBLE) * 10000 "
                "/ (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6)"
            ).alias("hhi"),
        )
    )


ORACLE_SUPPLIER_HHI = """
WITH per_supp AS (
  SELECT s.s_nationkey, l.l_suppkey,
         SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS r
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
), rolled AS (
  SELECT s_nationkey, COUNT(*) AS n_suppliers,
         SUM(r) AS tot, SUM(CAST(r AS HUGEINT) * r) AS sumsq
  FROM per_supp GROUP BY 1
)
SELECT n.n_name AS nation, ro.n_suppliers,
       round(CAST(ro.sumsq AS DOUBLE) * 10000
             / (CAST(ro.tot AS DOUBLE) * CAST(ro.tot AS DOUBLE)), 6) AS hhi
FROM rolled ro JOIN nation n ON ro.s_nationkey = n.n_nationkey
"""

BATCH6_QUERIES["supplier_hhi"] = q_supplier_hhi
BATCH6_ORACLES["supplier_hhi"] = ORACLE_SUPPLIER_HHI


def q_brand_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand return rates with an ELEVATED flag: brands whose
    return share sits more than two binomial standard errors above the
    corpus rate — the supplier-quality escalation list.

    The z-test comparison is cleared of square roots into the exact
    integer inequality (r1*n0 - r0*n1)^2 > 4*r0*(n0-r0)*n1 (both
    sides scaled by n0^2*n1^2; DECIMAL(38,0)/HUGEINT — exact through
    ~1e9 items per side), so both engines flag the identical brand
    set. One broadcast part join + one map-side-combinable agg."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_brand = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.expr("CAST(l_returnflag = 'R' AS INT)")).alias("n_returned"),
        )
    )
    tot = per_brand.agg(
        F.sum("n_items").alias("n0"), F.sum("n_returned").alias("r0")
    )
    return (
        per_brand.crossJoin(F.broadcast(tot))
        .select(
            F.col("p_brand").alias("brand"),
            "n_items",
            F.col("n_returned").cast("bigint").alias("n_returned"),
            F.expr("round(CAST(n_returned AS DOUBLE) / n_items, 6)").alias(
                "return_rate"
            ),
            (
                (F.col("n_returned") * F.col("n0") > F.col("r0") * F.col("n_items"))
                & (
                    F.expr(
                        "CAST(n_returned AS DECIMAL(38,0)) * n0 - CAST(r0 AS DECIMAL(38,0)) * n_items"
                    )
                    * F.expr(
                        "CAST(n_returned AS DECIMAL(38,0)) * n0 - CAST(r0 AS DECIMAL(38,0)) * n_items"
                    )
                    > F.expr(
                        "CAST(4 AS DECIMAL(38,0)) * r0 * (n0 - r0) * n_items"
                    )
                )
            ).alias("elevated"),
        )
    )


ORACLE_BRAND_RETURN_RATE = """
WITH per_brand AS (
  SELECT p.p_brand AS brand, COUNT(*) AS n_items,
         SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1
), tot AS (
  SELECT SUM(n_items) AS n0, SUM(n_returned) AS r0 FROM per_brand
)
SELECT brand, n_items, CAST(n_returned AS BIGINT) AS n_returned,
       round(CAST(n_returned AS DOUBLE) / n_items, 6) AS return_rate,
       (n_returned * n0 > r0 * n_items) AND
       ((CAST(n_returned AS HUGEINT) * n0 - CAST(r0 AS HUGEINT) * n_items)
        * (CAST(n_returned AS HUGEINT) * n0 - CAST(r0 AS HUGEINT) * n_items)
        > CAST(4 AS HUGEINT) * r0 * (n0 - r0) * n_items) AS elevated
FROM per_brand, tot
"""

BATCH6_QUERIES["brand_return_rate"] = q_brand_return_rate
BATCH6_ORACLES["brand_return_rate"] = ORACLE_BRAND_RETURN_RATE


def q_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full bilateral trade matrix: revenue flow from every supplier
    nation to every customer nation — the N x N generalization of
    TPC-H Q7's two-nation volume query, the one-glance view of which
    geographies actually trade.

    Shape: the one fact-fact join (orders x lineitem on orderkey);
    customer, supplier, and both nation dims broadcast; the (N x N)
    rollup is map-side combinable with dimension-bounded keys. Revenue
    is exact DECIMAL cents until the final cast."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
        ).alias("rev_c"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("ck"),
        )
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sk"),
        )
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.expr("round(CAST(SUM(rev_c) AS DOUBLE) / 100, 6)").alias("revenue"),
        )
    )


ORACLE_TRADE_MATRIX = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       COUNT(*) AS n_lineitems,
       round(CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                           AS BIGINT)) AS DOUBLE) / 100, 6) AS revenue
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
GROUP BY 1, 2
"""

BATCH6_QUERIES["trade_matrix"] = q_trade_matrix
BATCH6_ORACLES["trade_matrix"] = ORACLE_TRADE_MATRIX


def q_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 report: what share of revenue the top decile of
    customers carries. The top-decile membership comes from ONE exact
    percentile scalar over per-customer revenue (broadcast back — the
    rfm_segments posture, no global sort/NTILE); shares stay exact
    cents until the final division."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sources.readers import load_table

    cust_rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("rev_c")
        )
    )
    p90 = cust_rev.agg(F.expr("percentile(rev_c, 0.9)").alias("p90"))
    return (
        cust_rev.crossJoin(F.broadcast(p90))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.expr("CAST(rev_c > p90 AS INT)")).cast("bigint").alias("n_top"),
            F.expr("round(MAX(p90) / 100, 6)").alias("p90_revenue"),
            F.expr(
                "round(CAST(SUM(CASE WHEN rev_c > p90 THEN rev_c ELSE 0 END) AS DOUBLE) "
                "/ SUM(rev_c), 6)"
            ).alias("top_decile_share"),
        )
    )


ORACLE_PARETO_SHARE = """
WITH cust_rev AS (
  SELECT o_custkey,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1
), b AS (SELECT quantile_cont(rev_c, 0.9) AS p90 FROM cust_rev)
SELECT COUNT(*) AS n_customers,
       CAST(SUM(CASE WHEN rev_c > p90 THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
       round(MAX(p90) / 100, 6) AS p90_revenue,
       round(CAST(SUM(CASE WHEN rev_c > p90 THEN rev_c ELSE 0 END) AS DOUBLE)
             / SUM(rev_c), 6) AS top_decile_share
FROM cust_rev, b
"""

BATCH6_QUERIES["pareto_share"] = q_pareto_share
BATCH6_ORACLES["pareto_share"] = ORACLE_PARETO_SHARE


def q_region_share_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share by customer region per order year — the
    market-share-over-time view (TPC-H Q8 generalized from one region
    to the full trend surface). Exact cents; yearly totals come from a
    window over the (region x year) frame, dimension-bounded."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("rev_c"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cells = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), "yr")
        .agg(F.sum("rev_c").alias("rev_c"))
    )
    w_yr = W.partitionBy("yr")
    return cells.select(
        "region",
        F.col("yr").cast("bigint").alias("yr"),
        F.expr("round(CAST(rev_c AS DOUBLE) / 100, 6)").alias("revenue"),
        F.expr("round(CAST(rev_c AS DOUBLE) / SUM(rev_c) OVER "
               "(PARTITION BY yr), 6)").alias("share"),
    )


ORACLE_REGION_SHARE_TREND = """
WITH cells AS (
  SELECT r.r_name AS region, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT region, yr,
       round(CAST(rev_c AS DOUBLE) / 100, 6) AS revenue,
       round(CAST(rev_c AS DOUBLE) / SUM(rev_c) OVER (PARTITION BY yr), 6)
         AS share
FROM cells
"""

BATCH6_QUERIES["region_share_trend"] = q_region_share_trend
BATCH6_ORACLES["region_share_trend"] = ORACLE_REGION_SHARE_TREND


def q_catalog_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assortment health per brand: how much of the catalog has ever
    actually sold (ordered parts / catalog parts). A left join from
    the part dim to the distinct ordered-part set — the dim side
    drives, so never-sold parts are counted rather than silently
    dropped."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sources.readers import load_table

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ordered = (
        load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    )
    return (
        part.join(ordered, part["p_partkey"] == ordered["l_partkey"], "left")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.expr("CAST(l_partkey IS NOT NULL AS INT)"))
            .cast("bigint")
            .alias("n_ordered"),
        )
        .select(
            "brand",
            "n_parts",
            "n_ordered",
            F.expr("round(CAST(n_ordered AS DOUBLE) / n_parts, 6)").alias("coverage"),
        )
    )


ORACLE_CATALOG_COVERAGE = """
WITH ordered AS (SELECT DISTINCT l_partkey FROM lineitem)
SELECT p.p_brand AS brand, COUNT(*) AS n_parts,
       CAST(SUM(CASE WHEN o.l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ordered,
       round(CAST(SUM(CASE WHEN o.l_partkey IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS coverage
FROM part p LEFT JOIN ordered o ON p.p_partkey = o.l_partkey
GROUP BY 1
"""

BATCH6_QUERIES["catalog_coverage"] = q_catalog_coverage
BATCH6_ORACLES["catalog_coverage"] = ORACLE_CATALOG_COVERAGE


def q_price_realization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing discipline per brand: realized unit price as a share of
    list price (1.0 = selling at list; lower = discounting pressure).
    Per-line ratios are row-local doubles quantized to 1e-6 fixed
    point, so the per-brand mean is an exact integer sum divided once
    — no double ever aggregates. One broadcast part join."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    ratio_fp = F.expr(
        "CAST(round(l_extendedprice * (1 - l_discount) "
        "/ (l_quantity * p_retailprice) * 1000000) AS BIGINT)"
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(F.col("p_brand").alias("brand"), ratio_fp.alias("r_fp"))
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.expr(
                "round(CAST(SUM(r_fp) AS DOUBLE) / 1000000 / COUNT(*), 6)"
            ).alias("mean_realization"),
            F.expr(
                "round(CAST(SUM(CAST(r_fp < 1000000 AS INT)) AS DOUBLE) "
                "/ COUNT(*), 6)"
            ).alias("below_list_share"),
        )
    )


ORACLE_PRICE_REALIZATION = """
WITH j AS (
  SELECT p.p_brand AS brand,
         CAST(round(l.l_extendedprice * (1 - l.l_discount)
              / (l.l_quantity * p.p_retailprice) * 1000000) AS BIGINT) AS r_fp
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT brand, COUNT(*) AS n_lines,
       round(CAST(SUM(r_fp) AS DOUBLE) / 1000000 / COUNT(*), 6)
         AS mean_realization,
       round(CAST(SUM(CASE WHEN r_fp < 1000000 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS below_list_share
FROM j GROUP BY brand
"""

BATCH6_QUERIES["price_realization"] = q_price_realization
BATCH6_ORACLES["price_realization"] = ORACLE_PRICE_REALIZATION


def q_double_submit_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality screen for double-submitted orders: groups of
    orders sharing (customer, order date, exact total) — the classic
    retry-bug fingerprint an ingest pipeline audits for. Emits each
    suspicious group with its size; exact-cents equality, one
    map-side-combinable group census."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            "o_custkey",
            F.date_trunc("DAY", "o_orderdate").alias("order_day"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .select(
            "o_custkey",
            "order_day",
            F.expr("round(CAST(cents AS DOUBLE) / 100, 6)").alias("total"),
            "n_orders",
        )
    )


ORACLE_DOUBLE_SUBMIT_CHECK = """
SELECT o_custkey, date_trunc('day', o_orderdate) AS order_day,
       round(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE) / 100, 6)
         AS total,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1, 2, CAST(round(o_totalprice * 100) AS BIGINT)
HAVING COUNT(*) >= 2
"""

BATCH6_QUERIES["double_submit_check"] = q_double_submit_check
BATCH6_ORACLES["double_submit_check"] = ORACLE_DOUBLE_SUBMIT_CHECK
