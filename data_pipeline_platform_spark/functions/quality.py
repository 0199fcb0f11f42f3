"""Data-quality expectations (M8 extension): declarative rule checks
compiled to ONE conditional-aggregation pass — the expectations report
an ETL platform runs before promoting a batch.

Design: each rule is (name, boolean Column over a row); violations are
``SUM(CASE WHEN NOT cond ...)`` so N rules cost one scan and one 1-row
aggregate, not N jobs. NULL condition results count as violations
(a rule that cannot evaluate did not pass). Referential-integrity rules
need a join and are expressed separately (`orphan_count`), then unioned
into the same report shape. At 100 TB the report is one map-side-
combinable pass over the fact table plus one aggregation-pruned
anti-join per FK rule.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register


def check_expectations(
    df: DataFrame, rules: List[Tuple[str, Column]]
) -> DataFrame:
    """Evaluate boolean row-level rules in one aggregation pass.

    Returns (rule, checked, violations) per rule — `checked` is the
    row count (same for all row-level rules), `violations` counts rows
    where the rule is false OR null."""
    aggs = [F.count(F.lit(1)).alias("__checked")]
    for name, cond in rules:
        aggs.append(
            F.sum(
                F.when(F.coalesce(cond.cast("boolean"), F.lit(False)), 0).otherwise(1)
            ).alias(f"__v_{name}")
        )
    row = df.agg(*aggs)
    per_rule = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__checked").alias("checked"),
                F.col(f"__v_{name}").alias("violations"),
            )
            for name, _ in rules
        ]
    )
    return (
        row.select(F.explode(per_rule).alias("r"))
        .select("r.rule", "r.checked", "r.violations")
    )


def orphan_count(
    child: DataFrame, parent: DataFrame, keys: List[str], rule: str
) -> DataFrame:
    """Referential-integrity rule: child rows with no matching parent.
    The anti-join side is pruned to the key columns (aggregation
    pushdown: distinct parent keys), so the join moves keys, not rows."""
    parent_keys = parent.select(*keys).distinct()
    orphans = child.join(parent_keys, keys, "left_anti")
    return child.agg(
        F.lit(rule).alias("rule"),
        F.count(F.lit(1)).alias("checked"),
    ).crossJoin(
        F.broadcast(orphans.agg(F.count(F.lit(1)).alias("violations")))
    ).select("rule", "checked", "violations")


def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The promotion gate for a lineitem batch: range, nullability, and
    domain rules in one scan, plus an orders referential check — the
    operator a pipeline runs between transform and persist."""
    from data_pipeline_platform_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rules = [
        ("quantity_in_range", (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50)),
        ("discount_in_range", (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1)),
        ("shipdate_not_null", F.col("l_shipdate").isNotNull()),
        ("price_positive", F.col("l_extendedprice") > 0),
        ("tax_in_range", (F.col("l_tax") >= 0) & (F.col("l_tax") <= 0.08)),
        ("returnflag_domain", F.col("l_returnflag").isin("A", "N", "R")),
    ]
    report = check_expectations(li, rules)
    fk = orphan_count(
        li.select("l_orderkey"), orders.select("o_orderkey").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        ), ["l_orderkey"], "orderkey_references_orders"
    )
    return report.unionByName(fk)


ORACLE_DATA_QUALITY_REPORT = """
WITH base AS (
  SELECT COUNT(*) AS checked,
    SUM(CASE WHEN COALESCE(l_quantity >= 1 AND l_quantity <= 50, false) THEN 0 ELSE 1 END) AS v_qty,
    SUM(CASE WHEN COALESCE(l_discount >= 0 AND l_discount <= 0.1, false) THEN 0 ELSE 1 END) AS v_disc,
    SUM(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END) AS v_ship,
    SUM(CASE WHEN COALESCE(l_extendedprice > 0, false) THEN 0 ELSE 1 END) AS v_price,
    SUM(CASE WHEN COALESCE(l_tax >= 0 AND l_tax <= 0.08, false) THEN 0 ELSE 1 END) AS v_tax,
    SUM(CASE WHEN COALESCE(l_returnflag IN ('A','N','R'), false) THEN 0 ELSE 1 END) AS v_flag
  FROM lineitem
)
SELECT 'quantity_in_range' AS rule, checked, CAST(v_qty AS BIGINT) AS violations FROM base
UNION ALL SELECT 'discount_in_range', checked, CAST(v_disc AS BIGINT) FROM base
UNION ALL SELECT 'shipdate_not_null', checked, CAST(v_ship AS BIGINT) FROM base
UNION ALL SELECT 'price_positive', checked, CAST(v_price AS BIGINT) FROM base
UNION ALL SELECT 'tax_in_range', checked, CAST(v_tax AS BIGINT) FROM base
UNION ALL SELECT 'returnflag_domain', checked, CAST(v_flag AS BIGINT) FROM base
UNION ALL
SELECT 'orderkey_references_orders',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
"""


register("data_quality_report", q_data_quality_report, ORACLE_DATA_QUALITY_REPORT)


# Benford first-digit expectations log10(1 + 1/d), precomputed in Python
# and embedded as identical literals in both engines (log10 at runtime
# is a libm-portability risk; nine constants are not).
_BENFORD_P = {
    1: 0.301029995663981,
    2: 0.176091259055681,
    3: 0.124938736608300,
    4: 0.096910013008056,
    5: 0.079181246047625,
    6: 0.066946789630613,
    7: 0.057991946977687,
    8: 0.051152522447381,
    9: 0.045757490560675,
}


def q_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen on order amounts — the fraud/synthetic-data
    tell auditors run first: naturally occurring monetary amounts
    follow P(first digit d) = log10(1 + 1/d); fabricated ones rarely
    do. Reports per digit the observed share, the Benford expectation,
    and the chi-square contribution (sum them for the test statistic).

    Determinism: the first digit comes from the INTEGER cents string
    (exact round-trip in both engines) — never from double formatting
    (Spark renders large doubles as '1.2E5') nor floor(log10(x))
    (libm-edge at exact powers of ten). One map-side-combinable digit
    census; the 9-row frame then does row-local double math with
    embedded constants."""
    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    digits = orders.select(
        F.substring(
            F.expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"), 1, 1
        )
        .cast("int")
        .alias("digit")
    ).filter(F.col("digit") >= 1)
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    expect = F.expr(
        "CASE digit "
        + " ".join(f"WHEN {d} THEN CAST({p} AS DOUBLE)" for d, p in _BENFORD_P.items())
        + " END"
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("expected_p", expect)
        .select(
            "digit",
            "n",
            F.expr("round(CAST(n AS DOUBLE) / total, 6)").alias("observed_p"),
            F.round(F.col("expected_p"), 6).alias("expected_p"),
            F.expr(
                "round((CAST(n AS DOUBLE) - expected_p * total) "
                "* (CAST(n AS DOUBLE) - expected_p * total) "
                "/ (expected_p * total), 6)"
            ).alias("chi2_term"),
        )
    )


ORACLE_BENFORD_CHECK = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
), counts AS (
  SELECT digit, COUNT(*) AS n FROM digits WHERE digit >= 1 GROUP BY 1
), tot AS (SELECT SUM(n) AS total FROM counts),
e AS (
  SELECT digit, n, total,
         CASE digit {" ".join(f"WHEN {d} THEN CAST({p} AS DOUBLE)" for d, p in _BENFORD_P.items())} END AS expected_p
  FROM counts, tot
)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / total, 6) AS observed_p,
       round(expected_p, 6) AS expected_p,
       round((CAST(n AS DOUBLE) - expected_p * total)
             * (CAST(n AS DOUBLE) - expected_p * total)
             / (expected_p * total), 6) AS chi2_term
FROM e
"""

register("benford_check", q_benford_check, ORACLE_BENFORD_CHECK)


def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen: is order priority independent of
    customer market segment? Emits each contingency cell with its
    expected count under independence and the chi2 contribution (sum
    them and look up the CDF at (R-1)(C-1) df — the statistic is
    portable, the CDF is the caller's).

    Shape: one fact join (customer broadcasts at dimension ratio), one
    map-side-combinable cell count; marginals derive from the cell
    frame (|segments| x |priorities| rows) and broadcast back. Expected
    counts are exact-integer products divided once per cell."""
    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cells = (
        orders.join(
            F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = cells.groupBy("c_mktsegment").agg(F.sum("n").alias("nr"))
    col_tot = cells.groupBy("o_orderpriority").agg(F.sum("n").alias("nc"))
    grand = cells.agg(F.sum("n").alias("nt"))
    return (
        cells.join(F.broadcast(row_tot), "c_mktsegment")
        .join(F.broadcast(col_tot), "o_orderpriority")
        .crossJoin(F.broadcast(grand))
        .select(
            "c_mktsegment",
            "o_orderpriority",
            "n",
            F.expr("round(CAST(nr AS DOUBLE) * nc / nt, 6)").alias("expected"),
            F.expr(
                "round((CAST(n AS DOUBLE) - CAST(nr AS DOUBLE) * nc / nt) "
                "* (CAST(n AS DOUBLE) - CAST(nr AS DOUBLE) * nc / nt) "
                "/ (CAST(nr AS DOUBLE) * nc / nt), 6)"
            ).alias("chi2_term"),
        )
    )


ORACLE_CHI2_INDEPENDENCE = """
WITH cells AS (
  SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), rt AS (SELECT c_mktsegment, SUM(n) AS nr FROM cells GROUP BY 1),
ct AS (SELECT o_orderpriority, SUM(n) AS nc FROM cells GROUP BY 1),
gt AS (SELECT SUM(n) AS nt FROM cells)
SELECT cells.c_mktsegment, cells.o_orderpriority, cells.n,
       round(CAST(nr AS DOUBLE) * nc / nt, 6) AS expected,
       round((CAST(n AS DOUBLE) - CAST(nr AS DOUBLE) * nc / nt)
             * (CAST(n AS DOUBLE) - CAST(nr AS DOUBLE) * nc / nt)
             / (CAST(nr AS DOUBLE) * nc / nt), 6) AS chi2_term
FROM cells
JOIN rt USING (c_mktsegment)
JOIN ct USING (o_orderpriority), gt
"""

register("chi2_independence", q_chi2_independence, ORACLE_CHI2_INDEPENDENCE)


# (pair name, table, x column, y column) — categorical pairs within a
# single table, so each MI is one scan + one cell census
_MI_PAIRS = [
    ("orders.priority~status", "orders", "o_orderpriority", "o_orderstatus"),
    ("lineitem.returnflag~linestatus", "lineitem", "l_returnflag", "l_linestatus"),
    ("customer.mktsegment~nationkey", "customer", "c_mktsegment", "c_nationkey"),
]

_MI_SCALE = 1_000_000  # 1e-6 ln() grid: absorbs cross-engine libm ulps


def q_mutual_information_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between categorical column pairs —
    the dependence screen next to ``chi2_independence`` (MI gives an
    effect size in bits/nats where chi2 gives a test statistic).

    Exactness (the bigram_logprob idiom): each cell's pointwise term
    ln((n_xy * N) / (n_x * n_y)) is computed as ONE double ln, rounded
    to the 1e-6 fixed-point grid, multiplied by the exact BIGINT cell
    count, and summed as integers — order-free, so both engines agree
    bitwise; MI itself is one final division by (grid * N). Entropy of
    each marginal gets the same treatment, and nmi = mi / min(hx, hy)
    is arithmetic on those quotients.

    Scale: one map-side-combinable cell census per table scan;
    marginals derive from the cell frame (|X| x |Y| rows, bounded by
    the category domains) and broadcast back."""
    from data_pipeline_platform_spark.sources.readers import load_table

    frames = []
    for name, table, cx, cy in _MI_PAIRS:
        cells = (
            load_table(spark, sf_dir, table)
            .groupBy(
                F.col(cx).cast("string").alias("x"),
                F.col(cy).cast("string").alias("y"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
        xm = cells.groupBy("x").agg(F.sum("n").alias("nx"))
        ym = cells.groupBy("y").agg(F.sum("n").alias("ny"))
        tot = cells.agg(F.sum("n").alias("nt"))
        joined = (
            cells.join(F.broadcast(xm), "x")
            .join(F.broadcast(ym), "y")
            .crossJoin(F.broadcast(tot))
        )
        mi_fp = joined.agg(
            F.max("nt").alias("n_total"),
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(
                F.expr(
                    f"CAST(round(ln(CAST(n AS DOUBLE) * CAST(nt AS DOUBLE) "
                    f"/ (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))) * {_MI_SCALE}) "
                    f"AS BIGINT) * n"
                )
            ).alias("mi_fp"),
        )
        hx_fp = xm.crossJoin(F.broadcast(tot)).agg(
            F.sum(
                F.expr(
                    f"CAST(round(ln(CAST(nt AS DOUBLE) / CAST(nx AS DOUBLE)) "
                    f"* {_MI_SCALE}) AS BIGINT) * nx"
                )
            ).alias("hx_fp")
        )
        hy_fp = ym.crossJoin(F.broadcast(tot)).agg(
            F.sum(
                F.expr(
                    f"CAST(round(ln(CAST(nt AS DOUBLE) / CAST(ny AS DOUBLE)) "
                    f"* {_MI_SCALE}) AS BIGINT) * ny"
                )
            ).alias("hy_fp")
        )
        frames.append(
            mi_fp.crossJoin(F.broadcast(hx_fp))
            .crossJoin(F.broadcast(hy_fp))
            .select(
                F.lit(name).alias("pair"),
                F.col("n_total").cast("bigint").alias("n_total"),
                F.col("n_cells").cast("bigint").alias("n_cells"),
                F.col("mi_fp").cast("bigint").alias("mi_fp"),
                (
                    F.col("mi_fp").cast("double")
                    / (F.lit(float(_MI_SCALE)) * F.col("n_total").cast("double"))
                ).alias("mi_nats"),
                (
                    F.col("mi_fp").cast("double")
                    / F.least(F.col("hx_fp"), F.col("hy_fp")).cast("double")
                ).alias("nmi"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _duck_mi(name: str, table: str, cx: str, cy: str) -> str:
    # CTE name keyed by the full (table, x, y) triple: a second pair on
    # the same table must not collide with this one's cell census
    cte = f"cells_{table}_{cx}_{cy}"
    return f"""
SELECT '{name}' AS pair, n_total, n_cells, mi_fp,
       CAST(mi_fp AS DOUBLE) / ({_MI_SCALE}.0 * CAST(n_total AS DOUBLE)) AS mi_nats,
       CAST(mi_fp AS DOUBLE) / CAST(LEAST(
         (SELECT SUM(CAST(round(ln(CAST(nt AS DOUBLE) / CAST(nx AS DOUBLE)) * {_MI_SCALE}) AS BIGINT) * nx)
          FROM (SELECT x, SUM(n) AS nx FROM {cte} GROUP BY 1) xm,
               (SELECT SUM(n) AS nt FROM {cte}) t),
         (SELECT SUM(CAST(round(ln(CAST(nt AS DOUBLE) / CAST(ny AS DOUBLE)) * {_MI_SCALE}) AS BIGINT) * ny)
          FROM (SELECT y, SUM(n) AS ny FROM {cte} GROUP BY 1) ym,
               (SELECT SUM(n) AS nt FROM {cte}) t)
       ) AS DOUBLE) AS nmi
FROM (
  SELECT CAST(MAX(nt) AS BIGINT) AS n_total, COUNT(*) AS n_cells,
         CAST(SUM(CAST(round(ln(CAST(n AS DOUBLE) * CAST(nt AS DOUBLE)
           / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))) * {_MI_SCALE}) AS BIGINT) * n) AS BIGINT) AS mi_fp
  FROM {cte} c
  JOIN (SELECT x, SUM(n) AS nx FROM {cte} GROUP BY 1) xm USING (x)
  JOIN (SELECT y, SUM(n) AS ny FROM {cte} GROUP BY 1) ym USING (y),
       (SELECT SUM(n) AS nt FROM {cte}) t
)"""


_MI_CELL_CTES = ", ".join(
    f"""cells_{table}_{cx}_{cy} AS (
  SELECT CAST({cx} AS VARCHAR) AS x, CAST({cy} AS VARCHAR) AS y, COUNT(*) AS n
  FROM {table} GROUP BY 1, 2
)"""
    for _, table, cx, cy in _MI_PAIRS
)

ORACLE_MUTUAL_INFORMATION_PAIRS = (
    "WITH "
    + _MI_CELL_CTES
    + " "
    + " UNION ALL ".join(_duck_mi(*p) for p in _MI_PAIRS)
)


register(
    "mutual_information_pairs",
    q_mutual_information_pairs,
    ORACLE_MUTUAL_INFORMATION_PAIRS,
)
