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

# r12 hardening (verdict #7): MAC / IBAN / credit-card coverage. The
# card pattern only NOMINATES candidates; redaction is gated on a
# row-local Luhn checksum built from higher-order Column functions —
# still zero Python, still whole-stage-codegen-able — so a 16-digit
# number that merely LOOKS like a PAN (fails Luhn) is left for the
# digit-run scrubber instead of being mislabeled [CC].
MAC_PATTERN = r"\b[0-9A-Fa-f]{2}(?::[0-9A-Fa-f]{2}){5}\b"
IBAN_PATTERN = r"\b[A-Z]{2}\d{2}[A-Z0-9]{12,30}\b"
CC_PATTERN = r"\b\d{4}-?\d{4}-?\d{4}-?\d{4}\b"


def _luhn_valid(cand):
    """Luhn checksum over a 16-digit candidate Column (hyphens allowed
    in the input; stripped before summing). Pure Column algebra:
    transform over positions 1..16, doubling odd positions left-to-
    right (equivalent to the classic right-to-left even doubling for
    even-length strings)."""
    s = F.replace(cand, F.lit("-"), F.lit(""))

    def term(i):
        d = s.substr(i, F.lit(1)).cast("int")
        doubled = d * 2
        return (
            F.when(i % 2 == 1,
                   F.when(doubled > 9, doubled - 9).otherwise(doubled))
            .otherwise(d)
        )

    total = F.aggregate(
        F.transform(F.sequence(F.lit(1), F.lit(16)), term),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return total % 10 == 0


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


def redact_pii_extended(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The hardened scrub: email / IPv4 / MAC / IBAN / Luhn-gated
    credit card / phone / long digit run, in that order (specific
    first; every tag is digit-free so later patterns cannot match
    inside it). Adds ``n_<kind>`` counts and ``redacted``. All JVM
    Column expressions — the Luhn gate included."""
    head = (
        PII_PATTERNS[0],                      # email
        PII_PATTERNS[1],                      # ipv4
        ("mac", MAC_PATTERN, "[MAC]"),
        ("iban", IBAN_PATTERN, "[IBAN]"),
    )
    tail = (
        PII_PATTERNS[2],                      # phone
        PII_PATTERNS[3],                      # digit_run
    )
    out = df
    redacted = F.col(text_col)
    for kind, pat, tag in head:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(redacted, F.lit(pat)).cast("bigint")
        )
        redacted = F.regexp_replace(redacted, pat, tag)
    # credit card: nominate 16-digit(-ish) candidates, keep only the
    # Luhn-valid ones; count every occurrence, then rewrite POSITION-
    # ANCHORED (r12 advisor): one \b-wrapped alternation over the
    # distinct valid candidates, so only the occurrences the nominating
    # pattern could see are tagged — the same PAN embedded inside a
    # longer digit run stays for the digit-run scrubber, and the [CC]
    # tag count always equals n_credit_card. Candidates are digits and
    # hyphens only, so the alternation needs no regex escaping.
    cands = F.regexp_extract_all(redacted, F.lit(CC_PATTERN), F.lit(0))
    valid = F.filter(cands, _luhn_valid)
    out = out.withColumn("n_credit_card", F.size(valid).cast("bigint"))
    cc_pat = F.concat(
        F.lit(r"\b("), F.array_join(F.array_distinct(valid), "|"),
        F.lit(r")\b"),
    )
    redacted = F.when(
        F.size(valid) > 0, F.regexp_replace(redacted, cc_pat, F.lit("[CC]"))
    ).otherwise(redacted)
    for kind, pat, tag in tail:
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


# Luhn-valid public test PANs (the card-network published 16-digit test
# numbers — Visa/MC/Discover/JCB docs); the fixture cycles through them
# so every row carries a REAL checksum-passing candidate.
_TEST_PANS = (
    "4111111111111111", "4012888888881881", "5105105105105100",
    "5500005555555559", "6011111111111117", "3530111333300000",
)
_HEX_PAIRS = ("0f", "1e", "2d", "3c", "4b", "5a", "66", "77")


def q_pii_redaction_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hardened scrub under the correctness gate: the fixture
    plants, per document, an email, an IPv4, a MAC, an IBAN, a
    Luhn-VALID card in both plain and hyphenated form, a Luhn-INVALID
    hyphenated card (must survive redaction untouched — the checksum
    gate, not the regex, decides), a phone, and a 9-digit account
    run. The oracle replays the identical patterns AND the identical
    Luhn fold in DuckDB; counts and the full redacted string must
    match bitwise."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    card = F.element_at(
        F.array(*[F.lit(c) for c in _TEST_PANS]), (d % 6).cast("int") + 1
    )
    hyph = F.concat_ws(
        "-", card.substr(1, 4), card.substr(5, 4),
        card.substr(9, 4), card.substr(13, 4),
    )
    contaminated = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" pii u"), d, F.lit("@x.example.org"),
            F.lit(" ip 10."), d % 256, F.lit(".0.1"),
            F.lit(" mac 0a:1b:2c:3d:4e:"),
            F.element_at(
                F.array(*[F.lit(h) for h in _HEX_PAIRS]),
                (d % 8).cast("int") + 1,
            ),
            F.lit(" iban DE"),
            F.lpad((d % 100).cast("string"), 2, "0"),
            F.lit("BANK"),
            F.lpad((d % 1000000).cast("string"), 10, "0"),
            F.lit(" card "), card,
            F.lit(" alt "), hyph,
            F.lit(" bad 0000-0000-0000-0001"),
            F.lit(" tel 555-012-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
            F.lit(" acct "),
            F.lpad((d * 37 % 1000000000).cast("string"), 9, "0"),
        ),
    )
    return redact_pii_extended(contaminated).select(
        "doc_id", "n_email", "n_ipv4", "n_mac", "n_iban", "n_credit_card",
        "n_phone", "n_digit_run",
        F.length("redacted").cast("bigint").alias("redacted_len"),
        "redacted",
    )


def _duck_luhn(var: str) -> str:
    return (
        "list_sum(list_transform(range(1,17), i -> "
        "CASE WHEN i % 2 = 1 THEN "
        f"CASE WHEN 2*CAST(substring(replace({var}, '-', ''), i, 1) AS INT) > 9 "
        f"THEN 2*CAST(substring(replace({var}, '-', ''), i, 1) AS INT) - 9 "
        f"ELSE 2*CAST(substring(replace({var}, '-', ''), i, 1) AS INT) END "
        f"ELSE CAST(substring(replace({var}, '-', ''), i, 1) AS INT) END)) "
        "% 10 = 0"
    )


ORACLE_PII_REDACTION_EXTENDED = r"""
WITH c AS (
  SELECT doc_id,
         text || ' pii u' || doc_id || '@x.example.org' ||
         ' ip 10.' || doc_id % 256 || '.0.1' ||
         ' mac 0a:1b:2c:3d:4e:' ||
         (['0f','1e','2d','3c','4b','5a','66','77'])[doc_id % 8 + 1] ||
         ' iban DE' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
         'BANK' || lpad(CAST(doc_id % 1000000 AS VARCHAR), 10, '0') ||
         ' card ' ||
         (['4111111111111111','4012888888881881','5105105105105100',
           '5500005555555559','6011111111111117','3530111333300000']
          )[doc_id % 6 + 1] ||
         ' alt ' ||
         substring((['4111111111111111','4012888888881881','5105105105105100',
           '5500005555555559','6011111111111117','3530111333300000']
          )[doc_id % 6 + 1], 1, 4) || '-' ||
         substring((['4111111111111111','4012888888881881','5105105105105100',
           '5500005555555559','6011111111111117','3530111333300000']
          )[doc_id % 6 + 1], 5, 4) || '-' ||
         substring((['4111111111111111','4012888888881881','5105105105105100',
           '5500005555555559','6011111111111117','3530111333300000']
          )[doc_id % 6 + 1], 9, 4) || '-' ||
         substring((['4111111111111111','4012888888881881','5105105105105100',
           '5500005555555559','6011111111111117','3530111333300000']
          )[doc_id % 6 + 1], 13, 4) ||
         ' bad 0000-0000-0000-0001' ||
         ' tel 555-012-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         ' acct ' || lpad(CAST(doc_id * 37 % 1000000000 AS VARCHAR), 9, '0')
           AS t0
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
         CAST(len(regexp_extract_all(t2,
           '\b[0-9A-Fa-f]{2}(?::[0-9A-Fa-f]{2}){5}\b')) AS BIGINT) AS n_mac,
         regexp_replace(t2, '\b[0-9A-Fa-f]{2}(?::[0-9A-Fa-f]{2}){5}\b',
                        '[MAC]', 'g') AS t3
  FROM r2
), r4 AS (
  SELECT doc_id, n_email, n_ipv4, n_mac,
         CAST(len(regexp_extract_all(t3,
           '\b[A-Z]{2}\d{2}[A-Z0-9]{12,30}\b')) AS BIGINT) AS n_iban,
         regexp_replace(t3, '\b[A-Z]{2}\d{2}[A-Z0-9]{12,30}\b',
                        '[IBAN]', 'g') AS t4
  FROM r3
), r5 AS (
  SELECT doc_id, n_email, n_ipv4, n_mac, n_iban,
         list_filter(regexp_extract_all(t4,
           '\b\d{4}-?\d{4}-?\d{4}-?\d{4}\b'), x -> __LUHN__) AS valid,
         t4
  FROM r4
), r6 AS (
  SELECT doc_id, n_email, n_ipv4, n_mac, n_iban,
         CAST(len(valid) AS BIGINT) AS n_credit_card,
         CASE WHEN len(valid) > 0 THEN
           regexp_replace(t4,
             '\b(' || array_to_string(list_distinct(valid), '|') || ')\b',
             '[CC]', 'g')
         ELSE t4 END AS t5
  FROM r5
), r7 AS (
  SELECT doc_id, n_email, n_ipv4, n_mac, n_iban, n_credit_card,
         CAST(len(regexp_extract_all(t5, '\b\d{3}-\d{3}-\d{4}\b'))
           AS BIGINT) AS n_phone,
         regexp_replace(t5, '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS t6
  FROM r6
)
SELECT doc_id, n_email, n_ipv4, n_mac, n_iban, n_credit_card, n_phone,
       CAST(len(regexp_extract_all(t6, '\b\d{9,}\b')) AS BIGINT)
         AS n_digit_run,
       CAST(length(regexp_replace(t6, '\b\d{9,}\b', '[NUM]', 'g'))
         AS BIGINT) AS redacted_len,
       regexp_replace(t6, '\b\d{9,}\b', '[NUM]', 'g') AS redacted
FROM r7
""".replace("__LUHN__", _duck_luhn("x"))


register(
    "pii_redaction_extended", q_pii_redaction_extended,
    ORACLE_PII_REDACTION_EXTENDED,
)
