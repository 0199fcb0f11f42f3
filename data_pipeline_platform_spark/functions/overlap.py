"""Cross-source corpus overlap estimation (extension; no reference
counterpart — the reference has no text ops, see SURVEY.md §2.11).

`source_overlap` answers the corpus-health question "which ingest feeds
mirror each other?" at the SOURCE level (the per-pair near-dup view is
`dedup_rate_by_source`; this is the set-theoretic complement): estimate
the shingle-set Jaccard between every pair of sources from one MinHash
signature per source.

Scale shape — this is the op where sketching pays for itself:

- shingles are row-local (explode over the token array);
- the UNION MinHash per source is an ordinary min() groupBy keyed on
  (source, seed) — ONE shuffle whose output is |sources| x n_hashes
  rows, i.e. the corpus collapses to a few hundred numbers no matter
  how many TB went in (min is associative: map-side partial agg does
  almost all the work);
- the pairwise comparison is over the signature frame only —
  |sources|² x n_hashes, driver-scale, never corpus².

The exact same question asked exactly (list_intersect over per-source
shingle sets) needs the full distinct shingle inventory per source in
one place — a shuffle that grows with the corpus. The estimate's error
is ~1/sqrt(n_hashes) (~13% absolute at 64 hashes), which is the right
trade for a monitoring signal.

Hashes are md5-hex folds (the engine-portable uniform used by
`deterministic_sample` / `train_val_test_split`), so the whole
estimator — signatures included — replays bitwise in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

# 64 seeds: std error of the Jaccard estimate ~ sqrt(j(1-j)/64) <= 6.3%
# absolute — enough to rank source pairs; doubling hashes halves nothing
# a monitoring dashboard can see.
N_HASHES = 64
SHINGLE_K = 3

# Carter-Wegman slot hashes h_i(x) = (a_i*x + b_i) mod p over the 48-bit
# md5 base reduced mod p. A multiplicative-only remix (b*odd mod 2^48)
# is NOT a usable family here: for bases below 2^48/129 the product
# never wraps, every slot preserves the base ordering, and all 64 slots
# elect the SAME argmin — the estimator collapses to one Bernoulli
# trial. The affine family over a prime field actually permutes.
_P = 2_147_483_647  # 2^31 - 1; a*x + b < 2^62, exact in BIGINT

def _cw_constants() -> tuple[list, list]:
    import hashlib

    a = [
        int(hashlib.md5(f"overlap:a:{i}".encode()).hexdigest()[:8], 16) % (_P - 1) + 1
        for i in range(N_HASHES)
    ]
    b = [
        int(hashlib.md5(f"overlap:b:{i}".encode()).hexdigest()[:8], 16) % _P
        for i in range(N_HASHES)
    ]
    return a, b


_CW_A, _CW_B = _cw_constants()


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated shingle-set Jaccard for every source pair:
    (source_a, source_b, matches, jaccard_est), source_a < source_b,
    ordered output left to the driver's sort.

    The union-MinHash identity: min over the UNION of two sets of a
    uniform hash equals min of the two per-set minima, and
    P(argmin lands in the intersection) = J(A, B) — so the fraction of
    agreeing signature slots estimates Jaccard directly."""
    from data_pipeline_platform_spark.sources.readers import load_table, spread_scan

    # spread_scan: a small corpus arrives as one parquet split, and the
    # md5 signature fold is CPU-bound — spread it across cores (no-op at
    # scale; min-merge is order-independent, so the repartition is safe)
    docs = spread_scan(
        load_table(spark, sf_dir, "documents").select(
            "source", F.split(F.trim("text"), r"\s+").alias("toks")
        )
    )
    # row-local shingling + per-DOC signature fold: the (shingle x seed)
    # blowup never leaves the row — each doc reduces to one 64-slot
    # array before anything shuffles (same zero-shuffle shape as
    # dedup.minhash_signatures, but with an md5-based fold so the oracle
    # can replay it).
    # one md5 per shingle (48-bit base reduced mod p), then the 64
    # seeded values are affine remixes (a_i*x + b_i) mod p — 64x fewer
    # md5 calls than hashing (shingle, seed) pairs; every product stays
    # < 2^62 so BIGINT arithmetic is exact in both engines
    a_lit = ", ".join(str(v) for v in _CW_A)
    b_lit = ", ".join(str(v) for v in _CW_B)
    sig_expr = (
        f"aggregate("
        f"  transform("
        f"    transform(sequence(1, greatest(size(toks) - {SHINGLE_K} + 1, 0)), "
        f"              s -> concat_ws(' ', slice(toks, s, {SHINGLE_K}))), "
        f"    sh -> pmod(CAST(conv(substring(md5(sh), 1, 12), 16, 10) AS BIGINT), {_P})), "
        f"  array_repeat(CAST(9223372036854775807 AS BIGINT), {N_HASHES}), "
        f"  (acc, x) -> zip_with(acc, sequence(0, {N_HASHES - 1}), "
        f"    (m, i) -> least(m, (element_at(array({a_lit}), i + 1) * x "
        f"                        + element_at(array({b_lit}), i + 1)) % {_P}))"
        f")"
    )
    per_doc = docs.select(
        "source", F.posexplode(F.expr(sig_expr)).alias("seed", "hv")
    )
    # ONE shuffle of 64 x |docs| rows (min is associative: map-side
    # partials collapse each task to |sources| x 64 before the exchange);
    # output is |sources| x N_HASHES rows no matter the corpus size
    sigs = per_doc.groupBy("source", "seed").agg(F.min("hv").alias("mh"))
    a = sigs.select(
        F.col("source").alias("source_a"), "seed", F.col("mh").alias("mh_a")
    )
    b = sigs.select(
        F.col("source").alias("source_b"), "seed", F.col("mh").alias("mh_b")
    )
    # signature-frame join only: |sources|^2 x N_HASHES rows, never corpus²
    return (
        a.join(b, "seed")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum((F.col("mh_a") == F.col("mh_b")).cast("bigint")).alias("matches")
        )
        .select(
            "source_a",
            "source_b",
            "matches",
            F.round(F.col("matches") / F.lit(float(N_HASHES)), 6).alias("jaccard_est"),
        )
    )


ORACLE_SOURCE_OVERLAP = f"""
WITH toks AS (
  SELECT source, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), shingles AS (
  SELECT source,
         array_to_string(toks[s:s + {SHINGLE_K} - 1], ' ') AS sh
  FROM toks, LATERAL unnest(generate_series(1, greatest(len(toks) - {SHINGLE_K} + 1, 0))) t(s)
), bases AS (
  SELECT source, ('0x' || substr(md5(sh), 1, 12))::BIGINT % {_P} AS x FROM shingles
), cw(seed, ca, cb) AS (
  VALUES {", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(zip(_CW_A, _CW_B)))}
), hashed AS (
  SELECT source, seed, (ca * x + cb) % {_P} AS hv
  FROM bases, cw
), sigs AS (
  SELECT source, seed, MIN(hv) AS mh FROM hashed GROUP BY 1, 2
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS matches,
       round(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) / {float(N_HASHES)}, 6)
         AS jaccard_est
FROM sigs a JOIN sigs b ON a.seed = b.seed AND a.source < b.source
GROUP BY 1, 2
"""

register("source_overlap", q_source_overlap, ORACLE_SOURCE_OVERLAP)
