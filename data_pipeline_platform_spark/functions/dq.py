"""Declarative data-quality engine (extension; no reference counterpart —
the reference validates schemas, SURVEY.md §1.4, but has no row-content
constraint engine).

The shape is the Deequ/Great-Expectations idea re-expressed Spark-first:

- ``run_checks(df, rules)`` compiles an arbitrary list of declarative
  constraints (not_null / unique / in_range / in_set / matches / expr)
  into ONE aggregation pass — every rule becomes a violation-count
  expression in a single ``df.agg(...)``, so checking 50 rules costs the
  same single scan as checking one.  Map-side partial aggregation does
  almost all the work; the exchange carries one row per task.
- ``unique`` rides the same pass as ``COUNT(col) - COUNT(DISTINCT col)``
  (the distinct-agg expand keeps it single-scan).
- ``foreign_key`` rules are the one shape that genuinely needs a second
  relation: each compiles to a LEFT ANTI join against the (deduplicated,
  broadcast-when-small) reference keys, reduced to a 1-row count and
  unioned onto the main result.  At 100 TB the dim side is the small
  side by construction — Spark broadcasts it; a fact-sized reference
  degrades gracefully to a shuffle anti-join.
- ``profile(df)`` is the discovery half: per-column row/null/distinct
  counts, min/max, and (for strings) total character length, again in
  ONE aggregation pass, unpivoted to a row per column.  ``approx=True``
  swaps exact COUNT(DISTINCT) for HLL ``approx_count_distinct`` — at
  100 TB the exact distinct's expand is the only expensive part of the
  pass, and the sketch removes it without touching the other stats.
- ``suggest_rules(profile_rows)`` closes the loop Deequ-style:
  constraints inferred from an observed profile (not_null where no
  nulls, unique where distinct == rows).

Everything graded is exact integer/boolean arithmetic, so the DuckDB
oracles replay bitwise.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

# ---------------------------------------------------------------------------
# constraint engine
# ---------------------------------------------------------------------------

#: rule kinds whose violation count compiles into the single-pass agg
_ROW_RULES = {"not_null", "unique", "in_range", "in_set", "matches", "expr"}


def _violation_expr(rule: Dict) -> F.Column:
    """Compile one declarative rule to a violation-count aggregate.

    NULL handling is deliberate and uniform: a NULL value never violates
    a *content* rule (in_range / in_set / matches) — nullability is
    ``not_null``'s job, so one bad column doesn't double-report.  ``expr``
    counts rows where the predicate is not TRUE (so a NULL predicate IS a
    violation — an expr rule states an invariant, and "unknown" breaks
    an invariant).
    """
    kind = rule["rule"]
    col = rule.get("column")
    zero = F.lit(0).cast("bigint")
    if kind == "not_null":
        # coalesce: SUM over an EMPTY relation is NULL, and an empty
        # table violates nothing (hypothesis-found edge)
        return F.coalesce(F.sum(F.col(col).isNull().cast("bigint")), zero)
    if kind == "unique":
        # surplus non-null duplicates; rides the same single pass via the
        # distinct-agg expand
        return F.count(F.col(col)) - F.countDistinct(F.col(col))
    if kind == "in_range":
        lo, hi = rule["min"], rule["max"]
        bad = ~F.col(col).between(F.lit(lo), F.lit(hi))
        return F.coalesce(F.sum(bad.cast("bigint")), F.lit(0).cast("bigint"))
    if kind == "in_set":
        bad = ~F.col(col).isin(list(rule["values"]))
        return F.coalesce(F.sum(bad.cast("bigint")), F.lit(0).cast("bigint"))
    if kind == "matches":
        bad = ~F.col(col).rlike(rule["pattern"])
        return F.coalesce(F.sum(bad.cast("bigint")), F.lit(0).cast("bigint"))
    if kind == "expr":
        return F.coalesce(
            F.sum(F.when(F.expr(rule["expr"]), F.lit(0)).otherwise(F.lit(1))), zero
        )
    raise ValueError(f"unknown rule kind: {kind!r}")


def run_checks(
    df: DataFrame,
    rules: Sequence[Dict],
    refs: Optional[Dict[str, DataFrame]] = None,
) -> DataFrame:
    """Evaluate declarative constraints; returns one row per rule:
    (rule_id, rule, col_name, violations, passed).

    All row-content rules share ONE aggregation pass over ``df``.
    ``foreign_key`` rules (``{"rule": "foreign_key", "column": c,
    "ref": name, "ref_column": rc}``) each add a LEFT ANTI join against
    ``refs[name]`` — dedup'd reference keys, broadcast when small.
    """
    refs = refs or {}
    row_rules = [(i, r) for i, r in enumerate(rules) if r["rule"] in _ROW_RULES]
    fk_rules = [(i, r) for i, r in enumerate(rules) if r["rule"] == "foreign_key"]
    unknown = [r["rule"] for r in rules if r["rule"] not in _ROW_RULES | {"foreign_key"}]
    if unknown:
        raise ValueError(f"unknown rule kinds: {unknown}")

    parts: List[DataFrame] = []
    if row_rules:
        one = df.agg(
            *[_violation_expr(r).alias(f"v{i}") for i, r in row_rules]
        )
        # unpivot via a typed struct array, not a stack() SQL string —
        # rule labels (esp. free-form expr text) must not be re-parsed
        # as SQL literals
        rows = F.array(
            *[
                F.struct(
                    F.lit(i).alias("rule_id"),
                    F.lit(r["rule"]).alias("rule"),
                    F.lit(r.get("column") or r.get("expr", "")).alias("col_name"),
                    F.col(f"v{i}").cast("bigint").alias("violations"),
                )
                for i, r in row_rules
            ]
        )
        parts.append(one.select(F.explode(rows).alias("r")).select("r.*"))
    for i, r in fk_rules:
        ref = refs[r["ref"]]
        keys = ref.select(F.col(r["ref_column"]).alias("__ref_key")).distinct()
        orphans = (
            df.select(F.col(r["column"]).alias("__fk"))
            .filter(F.col("__fk").isNotNull())
            .join(F.broadcast(keys), F.col("__fk") == F.col("__ref_key"), "left_anti")
        )
        parts.append(
            orphans.agg(F.count(F.lit(1)).alias("violations")).select(
                F.lit(i).alias("rule_id"),
                F.lit("foreign_key").alias("rule"),
                F.lit(r["column"]).alias("col_name"),
                F.col("violations"),
            )
        )
    if not parts:
        raise ValueError("no rules given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("rule_id").cast("int").alias("rule_id"),
        "rule",
        "col_name",
        F.col("violations").cast("bigint").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )


# ---------------------------------------------------------------------------
# single-pass column profiler
# ---------------------------------------------------------------------------


def profile(
    df: DataFrame, cols: Optional[Sequence[str]] = None, approx: bool = False
) -> DataFrame:
    """One-pass per-column profile: (col_name, n_rows, n_nulls,
    n_distinct, min_s, max_s, len_sum).

    min/max are computed natively (so numeric order, not lexicographic)
    and cast to string for a uniform schema; ``len_sum`` is the total
    character count for string columns (NULL otherwise) — avg length is
    ``len_sum / (n_rows - n_nulls)``, left to the caller so the profile
    stays exact integers.  ``approx=True`` replaces exact COUNT(DISTINCT)
    with approx_count_distinct: at 100 TB the distinct expand is the only
    part of this pass whose cost grows superlinearly with column count.
    """
    cols = list(cols or df.columns)
    types = dict(df.dtypes)
    aggs: List[F.Column] = [F.count(F.lit(1)).alias("__n")]
    zero = F.lit(0).cast("bigint")
    for c in cols:
        aggs.append(
            F.coalesce(F.sum(F.col(c).isNull().cast("bigint")), zero).alias(f"__nulls_{c}")
        )
        distinct = (
            F.approx_count_distinct(c) if approx else F.countDistinct(F.col(c))
        )
        aggs.append(distinct.alias(f"__distinct_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
        if types.get(c) == "string":
            aggs.append(F.sum(F.length(F.col(c))).alias(f"__len_{c}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").cast("bigint").alias("n_rows"),
                F.col(f"__nulls_{c}").cast("bigint").alias("n_nulls"),
                F.col(f"__distinct_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_s"),
                F.col(f"__max_{c}").alias("max_s"),
                (
                    F.col(f"__len_{c}").cast("bigint")
                    if types.get(c) == "string"
                    else F.lit(None).cast("bigint")
                ).alias("len_sum"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def suggest_rules(profile_rows: Sequence[Dict]) -> List[Dict]:
    """Deequ-style constraint suggestion from an observed profile
    (list of dicts as returned by ``profile(...).collect()``):
    not_null where the column had no nulls, unique where every non-null
    value was distinct.  The output feeds straight back into
    ``run_checks`` against future batches."""
    rules: List[Dict] = []
    for row in profile_rows:
        c = row["col_name"]
        if row["n_nulls"] == 0:
            rules.append({"rule": "not_null", "column": c})
        if row["n_distinct"] == row["n_rows"] - row["n_nulls"] and row["n_rows"] > 0:
            rules.append({"rule": "unique", "column": c})
    return rules


# ---------------------------------------------------------------------------
# graded queries
# ---------------------------------------------------------------------------


def q_dq_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full rule vocabulary over orders in one engine call: 6
    single-pass content rules + a foreign-key rule against customer."""
    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rules = [
        {"rule": "not_null", "column": "o_orderkey"},
        {"rule": "unique", "column": "o_orderkey"},
        {"rule": "in_range", "column": "o_totalprice", "min": 0.0, "max": 600000.0},
        {"rule": "in_set", "column": "o_orderstatus", "values": ["O", "F", "P"]},
        {"rule": "matches", "column": "o_orderpriority", "pattern": "^[1-5]-"},
        {"rule": "expr", "expr": "o_orderdate IS NOT NULL AND year(o_orderdate) BETWEEN 1992 AND 1998"},
        {
            "rule": "foreign_key",
            "column": "o_custkey",
            "ref": "customer",
            "ref_column": "c_custkey",
        },
    ]
    return run_checks(orders, rules, refs={"customer": customer})


ORACLE_DQ_CHECKS_ORDERS = """
SELECT 0 AS rule_id, 'not_null' AS rule, 'o_orderkey' AS col_name,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
       SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0 AS passed
FROM orders
UNION ALL
SELECT 1, 'unique', 'o_orderkey',
       CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT),
       COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) = 0
FROM orders
UNION ALL
SELECT 2, 'in_range', 'o_totalprice',
       CAST(SUM(CASE WHEN o_totalprice NOT BETWEEN 0.0 AND 600000.0 THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN o_totalprice NOT BETWEEN 0.0 AND 600000.0 THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 3, 'in_set', 'o_orderstatus',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 4, 'matches', 'o_orderpriority',
       CAST(SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 5, 'expr', 'o_orderdate IS NOT NULL AND year(o_orderdate) BETWEEN 1992 AND 1998',
       CAST(SUM(CASE WHEN o_orderdate IS NOT NULL
                      AND year(o_orderdate) BETWEEN 1992 AND 1998
                     THEN 0 ELSE 1 END) AS BIGINT),
       SUM(CASE WHEN o_orderdate IS NOT NULL
                 AND year(o_orderdate) BETWEEN 1992 AND 1998
                THEN 0 ELSE 1 END) = 0
FROM orders
UNION ALL
SELECT 6, 'foreign_key', 'o_custkey',
       CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


def q_dq_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass discovery profile of the documents table — the input
    to suggest_rules and the before/after evidence for every curation
    step."""
    from data_pipeline_platform_spark.sources.readers import load_table

    return profile(load_table(spark, sf_dir, "documents"))


def _profile_col_sql(c: str, is_string: bool) -> str:
    len_sum = f"CAST(SUM(length({c})) AS BIGINT)" if is_string else "CAST(NULL AS BIGINT)"
    return f"""
SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_s,
       CAST(MAX({c}) AS VARCHAR) AS max_s,
       {len_sum} AS len_sum
FROM documents"""


ORACLE_DQ_PROFILE_DOCUMENTS = "\nUNION ALL\n".join(
    _profile_col_sql(c, s)
    for c, s in [
        ("doc_id", False),
        ("text", True),
        ("lang", True),
        ("source", True),
        ("n_chars", False),
    ]
)


register("dq_checks_orders", q_dq_checks_orders, ORACLE_DQ_CHECKS_ORDERS)
register("dq_profile_documents", q_dq_profile_documents, ORACLE_DQ_PROFILE_DOCUMENTS)
