"""HyperLogLog distinct counting with mergeable dense registers
(extension; no reference counterpart — the reference has no analytics
ops, see SURVEY.md §2.11). Flajolet et al., "HyperLogLog: the analysis
of a near-optimal cardinality estimation algorithm" (AofA 2007).

``hll_distinct_sources``: per-source estimate of the distinct-token
count over ``documents``. Companion to ``hll_distinct_users``
(functions/sketches.py — inline per-event-type estimate with an exact
twin); THIS module factors the sketch into a reusable register API
whose frames MERGE across shards (``hll_merge``: max-fold, with the
merge-equals-union property test) — the piece a 100 TB profiler
actually composes with. The registers are a plain DataFrame:

    groupBy(source, bucket).agg(max(rho))

so they are MERGEABLE across shards/days by construction (max is the
fold — ``hll_merge`` below), and the whole sketch build is ONE
map-side-combinable shuffle whose reduced size is |sources| × m
registers, never the corpus. No approx_count_distinct: Spark's own HLL
is not replayable in another engine; this one is deterministic —
md5-based 60-bit hashes, integer register math — so the DuckDB oracle
REPLAYS the identical algorithm and the result is bitwise-graded, not
tolerance-graded.

Register math (p=10, m=1024 buckets, w=50 rho bits):

    h      = 60-bit md5 prefix (the table_fingerprint idiom,
             functions/integrity.py:91)
    bucket = h % m          (low p bits)
    rest   = h // m         (w bits)
    rho    = w - len(bin(rest)) + 1   (leading-zero count + 1; w+1 if 0)

Estimator: E = alpha_m * m^2 / sum_j 2^(-M_j), computed EXACTLY in
integers as alpha_m * m^2 * 2^(w+1) / S with S = sum_j 2^(w+1 - M_j)
(absent registers contribute 2^(w+1); every magnitude <= 2^61) — ONE
closing double division. Small-range (linear-counting) correction when
E <= 2.5m and empty registers exist: m * ln(m / zeros), ln on an exact
integer ratio, rounded to 1e-6 (the round-after-ln rule).

Scale: the sketch is the 100 TB profiler's shape — per-shard registers
merge by max without re-scanning (a day's registers + history's
registers = the union's registers), driver state is m rows per source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

P = 10
M = 1 << P            # 1024 registers
W = 60 - P            # rho-field width in bits
_ALPHA = 0.7213 / (1.0 + 1.079 / M)
# alpha_m * m^2 * 2^(w+1) as one exact-at-parse float literal: both
# engines divide this same double by the same BIGINT S
_NUM = repr(_ALPHA * M * M * float(1 << (W + 1)))


def with_hll_register(df: DataFrame, value_col: str) -> DataFrame:
    """(bucket, rho) for each row's value — the per-item sketch input."""
    h = f"CAST(conv(substring(md5({value_col}), 1, 15), 16, 10) AS BIGINT)"
    return df.selectExpr(
        "*",
        f"pmod({h}, {M}) AS bucket",
        f"CASE WHEN {h} DIV {M} > 0 "
        f"THEN {W} - length(bin({h} DIV {M})) + 1 "
        f"ELSE {W + 1} END AS rho",
    )


def hll_registers(df: DataFrame, value_col: str, keys=()) -> DataFrame:
    """Dense registers per key group: one map-side-combinable shuffle,
    reduced size |keys| x m."""
    return (
        with_hll_register(df, value_col)
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("mj"))
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Union shards' registers and re-max: merge(sketch(A), sketch(B))
    == sketch(A ∪ B) exactly — the property test's contract."""
    out = register_frames[0]
    for f in register_frames[1:]:
        out = out.unionByName(f)
    keys = [c for c in out.columns if c not in ("mj",)]
    return out.groupBy(*keys).agg(F.max("mj").alias("mj"))


def hll_estimate(regs: DataFrame, keys=()) -> DataFrame:
    """(keys..., n_buckets_used, zeros, est_distinct) from registers."""
    per = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("nb"),
        F.expr(
            f"SUM(shiftleft(CAST(1 AS BIGINT), {W + 1} - mj))"
        ).alias("s_present"),
    )
    return per.selectExpr(
        *keys,
        "CAST(nb AS BIGINT) AS n_buckets_used",
        f"CAST({M} - nb AS BIGINT) AS zeros",
        # S folds absent registers in as 2^(w+1) each; raw estimate and
        # linear-counting correction both close with ONE rounded step
        f"""CASE WHEN {_NUM} / CAST(s_present
                   + ({M} - nb) * shiftleft(CAST(1 AS BIGINT), {W + 1}) AS DOUBLE)
                 <= {2.5 * M} AND nb < {M}
            THEN round({M} * ln(CAST({M} AS DOUBLE) / ({M} - nb)), 6)
            ELSE round({_NUM} / CAST(s_present
                   + ({M} - nb) * shiftleft(CAST(1 AS BIGINT), {W + 1}) AS DOUBLE), 6)
            END AS est_distinct""",
    )


def q_hll_distinct_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_platform_spark.sources.readers import load_table

    tok = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    )
    regs = hll_registers(tok, "tok", keys=["source"])
    return hll_estimate(regs, keys=["source"])


ORACLE_HLL_DISTINCT_SOURCES = f"""
WITH tok AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
), h AS (
  SELECT source, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM tok
), br AS (
  SELECT source, hv % {M} AS bucket,
         CASE WHEN hv // {M} > 0
              THEN {W} - length(bin(hv // {M})) + 1
              ELSE {W + 1} END AS rho
  FROM h
), regs AS (
  SELECT source, bucket, MAX(rho) AS mj FROM br GROUP BY 1, 2
), per AS (
  SELECT source, COUNT(*) AS nb,
         SUM(1::BIGINT << ({W + 1} - mj)) AS s_present
  FROM regs GROUP BY 1
)
SELECT source,
       CAST(nb AS BIGINT) AS n_buckets_used,
       CAST({M} - nb AS BIGINT) AS zeros,
       CASE WHEN {_NUM} / CAST(s_present
                + ({M} - nb) * (1::BIGINT << {W + 1}) AS DOUBLE) <= {2.5 * M}
                AND nb < {M}
            THEN round({M} * ln(CAST({M} AS DOUBLE) / ({M} - nb)), 6)
            ELSE round({_NUM} / CAST(s_present
                + ({M} - nb) * (1::BIGINT << {W + 1}) AS DOUBLE), 6)
       END AS est_distinct
FROM per
"""

register("hll_distinct_sources", q_hll_distinct_sources, ORACLE_HLL_DISTINCT_SOURCES)


def q_hll_distinct_sources_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE path under the correctness gate: registers built on two
    disjoint corpus shards (doc_id parity — the per-day/per-shard
    ingestion shape), merged by max-fold, then estimated. Graded against
    the SAME one-shot oracle as `hll_distinct_sources`, proving
    merge(sketch(A), sketch(B)) == sketch(A ∪ B) exactly — not just in
    the unit test."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    shards = [
        docs.filter(F.col("doc_id") % 2 == p).select(
            "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
        )
        for p in (0, 1)
    ]
    merged = hll_merge(*[hll_registers(s, "tok", keys=["source"]) for s in shards])
    return hll_estimate(merged, keys=["source"])


register(
    "hll_distinct_sources_sharded",
    q_hll_distinct_sources_sharded,
    ORACLE_HLL_DISTINCT_SOURCES,
)
