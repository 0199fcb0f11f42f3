"""Order-independent table content fingerprints (extension; no
reference counterpart — the closest reference concept is the 16-hex
`data_id` sampled-hash in `src/pipeline/workers/tasks.py:505-517`,
which hashes columns + dtypes + a 100-row sample and so misses any
change outside the sample). This is the full-content version a 100 TB
migration actually needs: "did the copy/merge/engine-swap preserve
every row?" answered with one scan and no sort.

Construction: every row is canonicalized to a '|'-joined string
(BIGINTs as digits, doubles as exact cent BIGINTs, timestamps as
unix_micros, NULL as a sentinel), hashed to a 60-bit integer via
md5-prefix (the house `folds.py` idiom — md5 is the one hash both
engines implement identically), and the table fingerprint is the SUM
(mod 2^62) and the XOR of the row hashes. Sum and xor are commutative
and associative, so the fingerprint is ORDER-INDEPENDENT: no global
sort, fully map-side combinable, one scan per table, a 5-column 1-row
result regardless of input size. Collision odds for detecting a
corrupted copy: ~2^-60 per differing row.

Scale: at 100 TB this is the cheapest possible full-content audit —
each executor hashes its partitions and emits one partial (sum, xor,
count); the driver sees only per-table 1-row frames. Compare
fingerprints across two snapshots to detect drift without moving data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

# 2^62: keeps the mod result comfortably inside BIGINT in both engines
_MOD = 4611686018427387904

# canonical per-column SQL fragments, valid verbatim in BOTH Spark SQL
# and DuckDB: ints -> digits, doubles -> exact cent BIGINTs, strings
# as-is; timestamps handled per-engine (unix_micros vs epoch_us)
_CANON = {
    "orders": [
        "CAST(o_orderkey AS STRING)",
        "CAST(o_custkey AS STRING)",
        "o_orderstatus",
        "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)",
        ("CAST(unix_micros(o_orderdate) AS STRING)", "CAST(epoch_us(o_orderdate) AS STRING)"),
        "o_orderpriority",
    ],
    "customer": [
        "CAST(c_custkey AS STRING)",
        "c_name",
        "CAST(c_nationkey AS STRING)",
        "CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS STRING)",
        "c_mktsegment",
    ],
    "lineitem": [
        "CAST(l_orderkey AS STRING)",
        "CAST(l_partkey AS STRING)",
        "CAST(l_suppkey AS STRING)",
        "CAST(l_linenumber AS STRING)",
        "CAST(CAST(round(l_quantity * 100) AS BIGINT) AS STRING)",
        "CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS STRING)",
        "CAST(CAST(round(l_discount * 100) AS BIGINT) AS STRING)",
        "CAST(CAST(round(l_tax * 100) AS BIGINT) AS STRING)",
        "l_returnflag",
        "l_linestatus",
        ("CAST(unix_micros(l_shipdate) AS STRING)", "CAST(epoch_us(l_shipdate) AS STRING)"),
    ],
}


def _row_str(table: str, engine: int) -> str:
    """'|'-joined canonical row string; NULLs become the sentinel so a
    NULL in column k is distinguishable from an empty string."""
    frags = [
        f"COALESCE({f[engine] if isinstance(f, tuple) else f}, '<null>')"
        for f in _CANON[table]
    ]
    return " || '|' || ".join(frags)


def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_name, n_rows, fp_sum, fp_xor) for orders, customer and
    lineitem — the full-content integrity census. fp_sum = sum of
    60-bit row hashes mod 2^62; fp_xor = xor of row hashes; both exact
    BIGINTs, order-independent, one scan per table."""
    from data_pipeline_platform_spark.sources.readers import load_table

    frames = []
    for t in ("orders", "customer", "lineitem"):
        h = (
            f"CAST(conv(substring(md5({_row_str(t, 0)}), 1, 15), 16, 10) AS BIGINT)"
        )
        df = load_table(spark, sf_dir, t).selectExpr(f"{h} AS h")
        frames.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.expr(f"CAST(SUM(CAST(h AS DECIMAL(38,0))) % {_MOD} AS BIGINT)").alias(
                    "fp_sum"
                ),
                F.expr("bit_xor(h)").alias("fp_xor"),
            ).select(F.lit(t).alias("table_name"), "n_rows", "fp_sum", "fp_xor")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _duck_fp(table: str) -> str:
    h = f"('0x' || substr(md5({_row_str(table, 1)}), 1, 15))::BIGINT"
    return f"""
SELECT '{table}' AS table_name,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(h AS HUGEINT)) % {_MOD} AS BIGINT) AS fp_sum,
       bit_xor(h) AS fp_xor
FROM (SELECT {h} AS h FROM {table})"""


ORACLE_TABLE_FINGERPRINT = " UNION ALL ".join(
    _duck_fp(t) for t in ("orders", "customer", "lineitem")
)


register("table_fingerprint", q_table_fingerprint, ORACLE_TABLE_FINGERPRINT)
