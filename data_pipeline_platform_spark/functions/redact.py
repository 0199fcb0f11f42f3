"""PII detection and redaction (extension; no reference counterpart —
the reference has no text-scrubbing ops). The standard pre-training
curation step: find emails / IPv4s / phone-shaped numbers / long digit
runs in document text, count them per document, and replace each with
a typed tag so downstream tokenization never sees the raw value.

Spark-first: the whole pass is JVM-side ``regexp_count`` /
``regexp_replace`` Column chains — whole-stage codegen, no Python in
the hot path, trivially pushed through column pruning. Patterns stick
to the RE2-compatible subset (character classes, bounded repetition,
alternation; no backrefs/lookaround) so the DuckDB oracle replays them
with IDENTICAL semantics — the graded twin synthesizes deterministic
PII from doc_id into real corpus text, redacts, and bitwise-compares
counts AND the redacted strings across engines.

Redaction order matters (an IPv4 is also four digit-runs): specific
patterns run first and their tags are shaped so later patterns cannot
match inside them ([EMAIL] etc. contain no digits or @).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

# RE2-safe patterns (Java + DuckDB agree on these constructs)
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("digit_run", r"\b\d{9,}\b", "[NUM]"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add per-kind match counts (``n_<kind>``) and a fully-redacted
    ``redacted`` column. One projection, all JVM expressions."""
    out = df
    redacted = F.col(text_col)
    for kind, pat, tag in PII_PATTERNS:
        # count on the PARTIALLY-redacted text so earlier kinds can't
        # double-count (the digit-run counter must not see the IP)
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(redacted, F.lit(pat)).cast("bigint")
        )
        redacted = F.regexp_replace(redacted, pat, tag)
    return out.withColumn("redacted", redacted)


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub under the correctness gate: deterministic synthetic
    PII (email, IP, phone, account number — all derived from doc_id)
    is appended to REAL corpus text, then detected and redacted by the
    Column-expression chain. The oracle rebuilds the same contaminated
    text and replays the same RE2 patterns in DuckDB — counts and the
    full redacted string must match bitwise, so a pattern-dialect
    divergence anywhere breaks the hash."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    contaminated = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact u"), F.col("doc_id"),
            F.lit("@mail-"), F.col("doc_id") % 7, F.lit(".example.com"),
            F.lit(" from 10."), F.col("doc_id") % 256,
            F.lit("."), (F.col("doc_id") * 3) % 256, F.lit(".1"),
            F.lit(" tel 555-01"), F.lpad((F.col("doc_id") % 10).cast("string"), 1, "0"),
            F.lit("-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" acct "), F.lpad((F.col("doc_id") * 37 % 1000000000).cast("string"), 9, "0"),
        ),
    )
    return redact_pii(contaminated).select(
        "doc_id", "n_email", "n_ipv4", "n_phone", "n_digit_run",
        F.length("redacted").cast("bigint").alias("redacted_len"),
        "redacted",
    )


ORACLE_PII_REDACTION = r"""
WITH c AS (
  SELECT doc_id,
         text || ' contact u' || doc_id || '@mail-' || doc_id % 7 ||
         '.example.com from 10.' || doc_id % 256 || '.' ||
         (doc_id * 3) % 256 || '.1 tel 555-01' ||
         lpad(CAST(doc_id % 10 AS VARCHAR), 1, '0') || '-' ||
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' acct ' ||
         lpad(CAST(doc_id * 37 % 1000000000 AS VARCHAR), 9, '0') AS t0
  FROM documents
), r1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t0,
           '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS BIGINT)
           AS n_email,
         regexp_replace(t0,
           '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
           '[EMAIL]', 'g') AS t1
  FROM c
), r2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t1,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
         regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                        '[IP]', 'g') AS t2
  FROM r1
), r3 AS (
  SELECT doc_id, n_email, n_ipv4,
         CAST(len(regexp_extract_all(t2, '\b\d{3}-\d{3}-\d{4}\b'))
           AS BIGINT) AS n_phone,
         regexp_replace(t2, '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS t3
  FROM r2
)
SELECT doc_id, n_email, n_ipv4, n_phone,
       CAST(len(regexp_extract_all(t3, '\b\d{9,}\b')) AS BIGINT)
         AS n_digit_run,
       CAST(length(regexp_replace(t3, '\b\d{9,}\b', '[NUM]', 'g'))
         AS BIGINT) AS redacted_len,
       regexp_replace(t3, '\b\d{9,}\b', '[NUM]', 'g') AS redacted
FROM r3
"""


register("pii_redaction", q_pii_redaction, ORACLE_PII_REDACTION)
