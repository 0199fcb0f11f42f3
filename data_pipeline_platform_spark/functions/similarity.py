"""Similarity search over the `embeddings` table (M8 extension).

- Brute-force cosine top-k: exact baseline; one pass over the table per
  query vector (broadcast the query). All arithmetic JVM-side via
  higher-order functions (zip_with + aggregate) — sequential summation,
  which matches DuckDB's list_dot_product fold exactly (bitwise).
- LSH-bucketed ANN: random-hyperplane signatures -> candidates share a
  signature bucket -> exact cosine re-rank inside buckets. The 100 TB
  path: the index pass is one projection + groupBy; query cost ~ bucket
  size, not table size. (IVF with trained centroids would slot into the
  same candidates->rerank frame; hyperplanes need no training.)
- Embedding near-dup pairs: all pairs with cosine >= 0.95 (brute force
  at test SF; the bucketed variant is the scale path).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.utils.cache import tracked_persist

DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_platform_spark.sources.readers import load_table, spread_scan

    # spread: parallelize the per-row dot-product kernels when the
    # embeddings table arrives as a single row-group. Safe here: scores
    # are per-row and every top-k orders with a deterministic tiebreak.
    # (The IVF path loads the raw table instead — its sampled KMeans fit
    # draws different rows under a different partitioning.)
    return spread_scan(load_table(spark, sf_dir, "embeddings"))


def _dot(a: str, b: str):
    """Exact sequential dot product of two array<double> columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


# Fixed-point squared L2 distance at micro resolution: components are
# quantized to round(x * 1e6) BIGINTs, so every difference, square, and
# sum is exact integer arithmetic — bitwise-portable across engines by
# construction. A pure double fold is NOT: both engines apply the same
# IEEE ops in the same order, but C++ builds may contract mul+add into
# FMA where the JVM cannot, and a 1-ulp distance difference at an argmin
# near-tie flips a cluster assignment (observed once in 320k assignments
# at sf0.1). Overflow-safe: |component| < 1.2 here, so squares are
# < 1.5e12 and a 64-dim sum < 1e14 << 2^63. Used wherever a distance
# ORDERS something (argmin assignment, probe ranking).
FP_SCALE = 1_000_000


def _dist_fp_sql(a: str, b: str) -> str:
    q = f"CAST(round({{v}} * {FP_SCALE}) AS BIGINT)"
    dx = f"({q.format(v='x')} - {q.format(v='y')})"
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> {dx} * {dx}), "
        f"CAST(0 AS BIGINT), (acc, t) -> acc + t)"
    )


def _duck_dist_fp(a: str, b: str) -> str:
    q = f"CAST(round({{v}} * {FP_SCALE}) AS BIGINT)"
    dx = f"({q.format(v='p[1]')} - {q.format(v='p[2]')})"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_zip({a}, {b}), p -> {dx} * {dx})), "
        f"(acc, t) -> acc + t)"
    )


def _as_double(col: str):
    return F.expr(f"transform({col}, x -> CAST(x AS DOUBLE))")


def with_norm(df: DataFrame, vec_col: str = "vec") -> DataFrame:
    return df.withColumn("norm", F.sqrt(_dot(vec_col, vec_col)))


def cosine_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k neighbors of one stored vector (excluding itself)."""
    base = emb.withColumn("vec", _as_double(vec_col))
    q = base.filter(F.col("vec_id") == query_vec_id).select(
        F.col("vec").alias("qvec")
    )
    joined = base.filter(F.col("vec_id") != query_vec_id).crossJoin(F.broadcast(q))
    scored = joined.withColumn(
        "cosine",
        _dot("vec", "qvec")
        / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("qvec", "qvec"))),
    )
    # round BEFORE ranking: DuckDB's ORDER BY resolves the select-list
    # alias (the rounded value), so ranking the rounded value here makes
    # ties and the LIMIT boundary identical in both engines
    return (
        scored.select("vec_id", "label", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(_emb(spark, sf_dir), query_vec_id=0, k=10)


ORACLE_COSINE_TOPK = """
WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
q AS (SELECT vec FROM base WHERE vec_id = 0)
SELECT b.vec_id, b.label,
       round(list_dot_product(b.vec, q.vec) /
             (sqrt(list_dot_product(b.vec, b.vec)) * sqrt(list_dot_product(q.vec, q.vec))), 6)
       AS cosine
FROM base b CROSS JOIN q
WHERE b.vec_id != 0
ORDER BY cosine DESC, b.vec_id
LIMIT 10
"""


def _hyperplanes(n_planes: int, dim: int = DIM) -> list:
    """Deterministic pseudo-random hyperplanes (seeded; no training)."""
    rng = random.Random(42)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        planes.append([x / n for x in v])
    return planes


def with_lsh_bucket(df: DataFrame, vec_col: str = "vec", n_planes: int = 8) -> DataFrame:
    """Random-hyperplane signature: bit b = sign(vec . plane_b)."""
    planes = _hyperplanes(n_planes)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        lit_arr = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(vec_col, "__plane") > 0).cast("long")
        # build per-plane column then fold into the bucket id
        df = df.withColumn("__plane", lit_arr).withColumn(
            f"__bit_{i}", bit
        ).drop("__plane")
        bucket = bucket + F.col(f"__bit_{i}") * F.lit(1 << i).cast("long")
    return df.withColumn("lsh_bucket", bucket).drop(
        *[f"__bit_{i}" for i in range(n_planes)]
    )


def q_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN variant: candidates = vectors in the query's hyperplane bucket
    (plus Hamming-1 neighbor buckets for recall), exact cosine re-rank.
    The bucket construction is deterministic (seeded planes), so the
    DuckDB oracle replays it exactly and the grade is a hash match on
    the precise candidate-set semantics, not an approximation."""
    emb = _emb(spark, sf_dir).withColumn("vec", _as_double("embedding"))
    bucketed = with_lsh_bucket(emb)
    q = bucketed.filter(F.col("vec_id") == 0).select(
        F.col("vec").alias("qvec"), F.col("lsh_bucket").alias("qbucket")
    )
    cand = bucketed.crossJoin(F.broadcast(q)).filter(
        (F.col("vec_id") != 0)
        # same bucket or Hamming distance 1 (probe neighboring buckets)
        & (
            F.bit_count(
                F.col("lsh_bucket").bitwiseXOR(F.col("qbucket")).cast("long")
            )
            <= 1
        )
    )
    scored = cand.withColumn(
        "cosine",
        _dot("vec", "qvec")
        / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("qvec", "qvec"))),
    )
    # round before ranking — same tie semantics as the DuckDB oracle,
    # whose ORDER BY binds to the rounded select-list alias
    return (
        scored.select("vec_id", "label", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


def _oracle_cosine_topk_lsh() -> str:
    """DuckDB twin of q_cosine_topk_lsh: identical seeded planes,
    identical bucket assembly (bit i weighted 1<<i), identical Hamming-1
    probe and exact re-rank."""
    planes = _hyperplanes(8)

    def plane_sql(p):
        return "[" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in p) + "]"

    bit_exprs = ",\n       ".join(
        f"CAST(list_dot_product(vec, {plane_sql(p)}) > 0 AS BIGINT) AS b{i}"
        for i, p in enumerate(planes)
    )
    bucket_expr = " + ".join(f"b{i} * {1 << i}" for i in range(8))
    return f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), bits AS (
  SELECT vec_id, label, vec,
       {bit_exprs}
  FROM base
), bucketed AS (
  SELECT vec_id, label, vec, {bucket_expr} AS bucket FROM bits
), q AS (
  SELECT vec AS qvec, bucket AS qbucket FROM bucketed WHERE vec_id = 0
), cand AS (
  SELECT c.vec_id, c.label, c.vec, q.qvec
  FROM bucketed c, q
  WHERE c.vec_id <> 0 AND bit_count(xor(c.bucket, q.qbucket)) <= 1
), scored AS (
  SELECT vec_id, label,
         list_dot_product(vec, qvec) /
         (sqrt(list_dot_product(vec, vec)) * sqrt(list_dot_product(qvec, qvec))) AS cosine
  FROM cand
)
SELECT vec_id, label, round(cosine, 6) AS cosine
FROM scored ORDER BY cosine DESC, vec_id LIMIT 10
"""


ORACLE_COSINE_TOPK_LSH = _oracle_cosine_topk_lsh()


# ---------------------------------------------------------------------------
# embedding near-dup: banded hyperplane LSH -> candidates -> exact re-rank
# ---------------------------------------------------------------------------

# 8 planes in 4 bands x 2 bits. The banding is part of the operator's
# declared semantics (pairs the index surfaces, exactly re-ranked), and
# the DuckDB oracle computes the *same* deterministic planes/bands, so
# the grade is exact, not "approximately right". At 100 TB you'd raise
# bits-per-band so E[bucket] stays bounded (cost = sum of bucket^2);
# both sides of the trade-off are parameters here.
ND_PLANES = 8
ND_BANDS = 4
ND_BITS = ND_PLANES // ND_BANDS
ND_THRESHOLD = 0.44  # discriminating at test SF (planted max cosine ~0.51)


def _dot_lit(vec_col: str, plane: list):
    """Dot product of a vector column with a literal plane — same
    sequential fold as ``_dot`` so the sign matches DuckDB bitwise."""
    arr = "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in plane) + ")"
    return F.expr(
        f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def hyperplane_band_array(
    df: DataFrame,
    vec_col: str = "vec",
    n_planes: int = ND_PLANES,
    n_bands: int = ND_BANDS,
) -> DataFrame:
    """df plus a ``bands`` array column: bands[j] folds the j-th band's
    sign bits. This is the STORABLE form — an incremental vector index
    (functions/dedup_index.py) persists it so history is banded ONCE at
    ingest and never re-projected through the hyperplanes again."""
    planes = _hyperplanes(n_planes)
    bits_per = n_planes // n_bands
    bits = [(_dot_lit(vec_col, p) > 0).cast("int") for p in planes]
    band_vals = [
        sum(bits[j * bits_per + r] * (1 << r) for r in range(bits_per))
        for j in range(n_bands)
    ]
    return df.withColumn("bands", F.array(*band_vals))


def explode_band_array(df: DataFrame) -> DataFrame:
    """(vec_id, band_idx, band_val) rows from a stored ``bands`` array —
    the cheap (integer-explode) path for already-banded vectors."""
    return df.select(
        "vec_id", F.posexplode("bands").alias("band_idx", "band_val")
    )


def with_hyperplane_bands(
    df: DataFrame,
    vec_col: str = "vec",
    n_planes: int = ND_PLANES,
    n_bands: int = ND_BANDS,
) -> DataFrame:
    """Explode each vector into (band_idx, band_val) LSH keys.

    band_val folds ``n_planes/n_bands`` sign bits; a pair is a candidate
    iff it collides on >= 1 band — the equi-join shape that replaces the
    O(n^2) theta join."""
    return explode_band_array(
        hyperplane_band_array(df, vec_col, n_planes, n_bands)
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via banded hyperplane LSH.

    Candidates = pairs colliding on >= 1 signature band (equi-join on
    (band_idx, band_val) — one shuffle, no cartesian), then the exact
    cosine re-rank keeps pairs >= threshold. The oracle replays the
    identical seeded planes, so output is deterministic and graded
    exactly. Scale: cost ~ sum over buckets of bucket^2, bounded by
    bits-per-band, vs the old all-pairs theta join (O(n^2) always)."""
    # feeds the banding pass + both sides of the verify join; tracked so
    # long-lived callers can free it after materializing (utils.cache)
    base = tracked_persist(
        _emb(spark, sf_dir).select("vec_id", _as_double("embedding").alias("vec"))
    )
    banded = with_hyperplane_bands(base)

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )

    x = base.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("va"))
    y = base.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"))
    return (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .withColumn(
            "cosine",
            _dot("va", "vb")
            / (F.sqrt(_dot("va", "va")) * F.sqrt(_dot("vb", "vb"))),
        )
        .filter(F.col("cosine") >= ND_THRESHOLD)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def _oracle_embedding_near_dup() -> str:
    """DuckDB twin: identical seeded planes as literal lists, identical
    banding, identical sequential dot-product fold -> identical rows."""
    planes = _hyperplanes(ND_PLANES)

    def plane_sql(p):
        return "[" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in p) + "]"

    bit_exprs = ",\n       ".join(
        f"CAST(list_dot_product(vec, {plane_sql(p)}) > 0 AS INT) AS b{i}"
        for i, p in enumerate(planes)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT vec_id, {j} AS band_idx, {expr} AS band_val FROM bits".format(
            j=j,
            expr=" + ".join(
                f"b{j * ND_BITS + r} * {1 << r}" for r in range(ND_BITS)
            ),
        )
        for j in range(ND_BANDS)
    )
    return f"""
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
bits AS (
  SELECT vec_id, vec,
       {bit_exprs}
  FROM base
),
banded AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.vec_id < b.vec_id
),
scored AS (
  SELECT id_a, id_b,
         list_dot_product(x.vec, y.vec) /
         (sqrt(list_dot_product(x.vec, x.vec)) * sqrt(list_dot_product(y.vec, y.vec))) AS cosine
  FROM cand JOIN base x ON cand.id_a = x.vec_id JOIN base y ON cand.id_b = y.vec_id
)
SELECT id_a, id_b, round(cosine, 6) AS cosine FROM scored WHERE cosine >= {ND_THRESHOLD}
"""


ORACLE_EMBEDDING_NEAR_DUP = _oracle_embedding_near_dup()


def build_ivf_index(
    emb: DataFrame,
    n_cells: int = 16,
    vec_col: str = "vec",
    seed: int = 42,
    fit_sample_rows: int = 100_000,
):
    """IVF coarse quantizer: k-means centroids over a bounded sample;
    each vector is assigned to its nearest cell. Returns (indexed_df,
    centroids) where indexed_df has an ``ivf_cell`` column.

    At 100 TB the fit input is capped at ``fit_sample_rows`` (a coarse
    quantizer needs a representative sample, not the corpus), then one
    assignment pass over everything; the cell id becomes the partition
    key so query cost ~ probed cells, not corpus size. The row count is
    one deliberate action at index-build time (an offline, once-per-
    corpus job — not a query-path action)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    ml_df = emb.withColumn("features", array_to_vector(F.col(vec_col)))
    n = ml_df.count()
    if n > fit_sample_rows:
        # 1.05 oversample then cap: sample() is per-row Bernoulli, so the
        # draw can land slightly under the target fraction
        frac = min(1.0, 1.05 * fit_sample_rows / n)
        fit_df = ml_df.sample(fraction=frac, seed=seed).limit(fit_sample_rows)
    else:
        fit_df = ml_df
    model = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="ivf_cell").fit(
        fit_df
    )
    indexed = model.transform(ml_df).drop("features")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return indexed, centroids


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 8,
) -> DataFrame:
    """IVF ANN search: rank cells by centroid distance to the query,
    exact-cosine re-rank inside the ``n_probe`` closest cells."""
    base = emb.withColumn("vec", _as_double("embedding"))
    indexed, centroids = build_ivf_index(base, n_cells=n_cells)
    indexed = tracked_persist(indexed)

    q_rows = indexed.filter(F.col("vec_id") == query_vec_id).select("vec").collect()
    qvec = list(q_rows[0]["vec"])

    # rank cells by centroid distance (driver-side: n_cells floats)
    def dist2(c):
        return sum((a - b) ** 2 for a, b in zip(c, qvec))

    probe_cells = [
        cell for cell, _ in sorted(
            ((i, dist2(c)) for i, c in enumerate(centroids)), key=lambda t: t[1]
        )[:n_probe]
    ]

    qdf = indexed.filter(F.col("vec_id") == query_vec_id).select(
        F.col("vec").alias("qvec")
    )
    cand = (
        indexed.filter(F.col("ivf_cell").isin(probe_cells))
        .filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qdf))
    )
    return (
        cand.withColumn(
            "cosine",
            _dot("vec", "qvec")
            / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("qvec", "qvec"))),
        )
        .select("vec_id", "label", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def q_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN twin of cosine_topk backed by Spark-ML KMeans. Not in the
    graded registry (ML-fit centroids have no SQL-replayable oracle) —
    covered by the recall test in tests/test_extensions.py; the graded
    IVF slot is q_cosine_topk_ivf_exact."""
    from data_pipeline_platform_spark.sources.readers import load_table

    # raw scan (no spread): the sampled KMeans fit must see a stable
    # partitioning, or the coarse centroids drift run-to-run
    return ivf_topk(load_table(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


# ---------------------------------------------------------------------------
# batch-of-queries cosine top-k: one scan, window top-k per query
# ---------------------------------------------------------------------------

BATCH_QUERY_IDS = [0, 1, 2, 3, 4]


def cosine_topk_batch(
    emb: DataFrame, query_ids: list, k: int = 5, vec_col: str = "embedding"
) -> DataFrame:
    """Top-k neighbors for a SET of query vectors in one pass.

    The query set is broadcast (thousands of vectors = a few MB); the
    corpus is scanned once, each row scored against every query
    JVM-side, then one window shuffle on query_id picks top-k. At
    100 TB this is the batch-scoring shape: scan cost amortized over
    the whole query batch instead of one pass per query."""
    base = emb.withColumn("vec", _as_double(vec_col))
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot("vec", "qvec")
                / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("qvec", "qvec"))),
                6,
            ),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "label", "cosine")
    )


def q_cosine_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk_batch(_emb(spark, sf_dir), BATCH_QUERY_IDS, k=5)


ORACLE_COSINE_TOPK_BATCH = f"""
WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
q AS (SELECT vec_id AS query_id, vec AS qvec FROM base
      WHERE vec_id IN ({", ".join(map(str, BATCH_QUERY_IDS))})),
scored AS (
  SELECT q.query_id, b.vec_id, b.label,
         round(list_dot_product(b.vec, q.qvec) /
               (sqrt(list_dot_product(b.vec, b.vec)) * sqrt(list_dot_product(q.qvec, q.qvec))), 6)
         AS cosine
  FROM base b CROSS JOIN q
  WHERE b.vec_id != q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, label, cosine FROM ranked WHERE rn <= 5
"""


register("cosine_topk", q_cosine_topk, ORACLE_COSINE_TOPK)
register("cosine_topk_batch", q_cosine_topk_batch, ORACLE_COSINE_TOPK_BATCH)
# q_cosine_topk_ivf (Spark-ML KMeans coarse quantizer) is deliberately
# NOT registry-graded: its centroids are ML-fit, so no SQL oracle can
# replay them — grading it would be the registry's one rows-only hole.
# The graded IVF slot is cosine_topk_ivf_exact (deterministic index
# build, bitwise); the ML variant keeps its recall + determinism tests
# in tests/test_extensions.py.
register("cosine_topk_lsh", q_cosine_topk_lsh, ORACLE_COSINE_TOPK_LSH)
register("embedding_near_dup", q_embedding_near_dup, ORACLE_EMBEDDING_NEAR_DUP)


def hard_negatives(
    emb: DataFrame, query_vec_id: int, k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Hard-negative mining for contrastive training: the k corpus
    vectors MOST similar to the anchor that carry a DIFFERENT label —
    exactly the negatives that produce useful gradient (Robinson et al.,
    "Contrastive Learning with Hard Negative Samples", 2021).  Same
    one-scan broadcast shape as cosine_topk; the label predicate pushes
    into the scan, so cost is one pass over the (filtered) corpus and a
    parallel TakeOrderedAndProject."""
    base = emb.withColumn("vec", _as_double(vec_col))
    q = base.filter(F.col("vec_id") == query_vec_id).select(
        F.col("vec").alias("qvec"), F.col("label").alias("qlabel")
    )
    joined = base.crossJoin(F.broadcast(q)).filter(
        (F.col("vec_id") != query_vec_id) & (F.col("label") != F.col("qlabel"))
    )
    scored = joined.withColumn(
        "cosine",
        _dot("vec", "qvec")
        / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("qvec", "qvec"))),
    )
    return (
        scored.select("vec_id", "label", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hard_negatives(_emb(spark, sf_dir), query_vec_id=0, k=10)


ORACLE_HARD_NEGATIVES = """
WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
q AS (SELECT vec, label AS qlabel FROM base WHERE vec_id = 0)
SELECT b.vec_id, b.label,
       round(list_dot_product(b.vec, q.vec) /
             (sqrt(list_dot_product(b.vec, b.vec)) * sqrt(list_dot_product(q.vec, q.vec))), 6)
       AS cosine
FROM base b CROSS JOIN q
WHERE b.vec_id != 0 AND b.label != q.qlabel
ORDER BY cosine DESC, b.vec_id
LIMIT 10
"""


register("hard_negatives", q_hard_negatives, ORACLE_HARD_NEGATIVES)


# ---------------------------------------------------------------------------
# nearest-centroid classification (embedding -> label assignment)
# ---------------------------------------------------------------------------

def q_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify every embedding by its nearest label centroid — the
    domain/quality classification step of a training-data pipeline
    (fit: per-label mean vectors; predict: argmin L2 distance).

    Engine-exact by construction: centroid components are fixed-point
    BIGINT sums at 1e-9 resolution (order-free, and round() ties break
    half-away in BOTH engines — unlike double->DECIMAL casts, where
    Spark rounds HALF_UP but DuckDB half-even, so a dyadic component
    like 0.1494140625 diverges by 1e-9), distances are fixed-point
    BIGINT folds (FP_SCALE), and the argmin tie-breaks on label — so
    the DuckDB oracle reproduces every assignment bitwise.

    Plan: one posexplode+agg pass fits the centroids (label-dim grain,
    tiny), broadcast back; scoring is a single scan of embeddings with
    a 5-row broadcast nested loop (the right shape: the model is small,
    the data is not); one window shuffle on vec_id picks the argmin."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    ex = emb.select("label", F.posexplode("vec").alias("dim", "comp"))
    cents = (
        ex.groupBy("label", "dim")
        .agg(
            (
                F.sum(F.expr("CAST(round(comp * 1000000000) AS BIGINT)")).cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000000.0)
            ).alias("c")
        )
    )
    cent_arr = (
        cents.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select(
            F.col("label").alias("c_label"),
            F.expr("transform(dc, x -> x.c)").alias("cvec"),
        )
    )
    scored = emb.crossJoin(F.broadcast(cent_arr)).withColumn(
        "dist_fp", F.expr(_dist_fp_sql("vec", "cvec"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("dist_fp"), F.col("c_label"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "label",
            F.col("c_label").alias("predicted_label"),
            "dist_fp",
        )
    )


ORACLE_CENTROID_CLASSIFY = f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), ex AS (
  SELECT label, i - 1 AS dim, vec[i] AS comp
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(vec))) AS i)
), cents AS (
  SELECT label, dim,
         CAST(SUM(CAST(round(comp * 1000000000) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1000000000.0 AS c
  FROM ex GROUP BY label, dim
), carr AS (
  SELECT label AS c_label, list(c ORDER BY dim) AS cvec FROM cents GROUP BY label
), scored AS (
  SELECT b.vec_id, b.label, ca.c_label,
         {_duck_dist_fp('b.vec', 'ca.cvec')} AS dist_fp
  FROM base b CROSS JOIN carr ca
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist_fp, c_label) AS rn
  FROM scored
)
SELECT vec_id, label, c_label AS predicted_label, dist_fp
FROM ranked WHERE rn = 1
"""


def q_kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd iteration, engine-exact: fit per-label seed
    centroids (decimal means), reassign every vector to its nearest
    seed, then recompute the centroids of the NEW clusters. This is the
    k-means building block — iterating it is a driver loop over this
    exact plan, the same Pregel-as-joins pattern `graph.py` uses for
    PageRank.

    Determinism: fixed-point BIGINT component sums at 1e-9 resolution
    (order-free, tie-portable — see centroid_classify), fixed-point
    BIGINT distance folds (FP_SCALE), argmin tie-broken on label — so
    the DuckDB oracle replays the whole step bitwise, including the
    re-aggregation.
    Output grain: (cluster, dim) with the new component and the
    cluster's member count."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    ex = emb.select("label", F.posexplode("vec").alias("dim", "comp"))
    cents = ex.groupBy("label", "dim").agg(
        (
            F.sum(F.expr("CAST(round(comp * 1000000000) AS BIGINT)")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000000.0)
        ).alias("c")
    )
    cent_arr = (
        cents.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select(
            F.col("label").alias("c_label"),
            F.expr("transform(dc, x -> x.c)").alias("cvec"),
        )
    )
    scored = emb.crossJoin(F.broadcast(cent_arr)).withColumn(
        "dist_fp", F.expr(_dist_fp_sql("vec", "cvec"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("dist_fp"), F.col("c_label"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "vec", F.col("c_label").alias("cluster"))
    )
    re_ex = assigned.select("cluster", F.posexplode("vec").alias("dim", "comp"))
    return re_ex.groupBy("cluster", "dim").agg(
        (
            F.sum(F.expr("CAST(round(comp * 1000000000) AS BIGINT)")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000000.0)
        ).alias("c_new"),
        F.count(F.lit(1)).alias("n_members"),
    )


ORACLE_KMEANS_LLOYD_STEP = f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), ex AS (
  SELECT label, i - 1 AS dim, vec[i] AS comp
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(vec))) AS i)
), cents AS (
  SELECT label, dim,
         CAST(SUM(CAST(round(comp * 1000000000) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1000000000.0 AS c
  FROM ex GROUP BY label, dim
), carr AS (
  SELECT label AS c_label, list(c ORDER BY dim) AS cvec FROM cents GROUP BY label
), scored AS (
  SELECT b.vec_id, b.vec, ca.c_label,
         {_duck_dist_fp('b.vec', 'ca.cvec')} AS dist_fp
  FROM base b CROSS JOIN carr ca
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist_fp, c_label) AS rn
  FROM scored
), assigned AS (
  SELECT vec_id, vec, c_label AS cluster FROM ranked WHERE rn = 1
), re_ex AS (
  SELECT cluster, i - 1 AS dim, vec[i] AS comp
  FROM assigned, LATERAL (SELECT unnest(generate_series(1, len(vec))) AS i)
)
SELECT cluster, dim,
       CAST(SUM(CAST(round(comp * 1000000000) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1000000000.0 AS c_new,
       COUNT(*) AS n_members
FROM re_ex GROUP BY cluster, dim
"""


register("centroid_classify", q_centroid_classify, ORACLE_CENTROID_CLASSIFY)
register("kmeans_lloyd_step", q_kmeans_lloyd_step, ORACLE_KMEANS_LLOYD_STEP)


# ---------------------------------------------------------------------------
# deterministic IVF: content-addressed seeds + one decimal-exact Lloyd
# refinement -> every stage replayable by the oracle (the bitwise-graded
# counterpart of the Spark-ML-backed cosine_topk_ivf above)
# ---------------------------------------------------------------------------

IVFX_CELLS = 16
IVFX_PROBE = 4
IVFX_K = 10

# assignment/probe distances use the fixed-point fold (_dist_fp_sql):
# ordering on double folds is 1-ulp-fragile at near-ties (FP_SCALE note)


def ivfx_train(train):
    """The deterministic IVF quantizer (content-addressed seeds + one
    decimal-exact Lloyd refinement) fit on ``train`` (vec_id, vec
    [, ...]): returns the tracked-persisted refined-centroid frame
    (cell, cvec). Split out of ``ivfx_index`` so a PERSISTED index
    (functions/dedup_index.py::IncrementalAnnIndex) can train on a base
    corpus and assign later batches to FROZEN centroids — the standard
    IVF serving model."""
    from pyspark.sql.window import Window

    seeds = (
        train.withColumn("__h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__h", "vec_id")
        .limit(IVFX_CELLS)
        .withColumn(
            "seed_id", F.row_number().over(Window.orderBy("__h", "vec_id"))
        )
        .select("seed_id", F.col("vec").alias("svec"))
    )
    # argmin as a partial-aggregable min over struct(dist, seed_id, vec)
    # — identical winner to the former row_number window ((dist,
    # seed_id) is unique per vec_id, and `vec` is functionally
    # determined by the group so the comparison never reaches it), but
    # the map side combines the n_seeds candidate rows per vector down
    # to ONE before the shuffle instead of sorting corpus x n_seeds
    # full-vector rows through a window exchange (r14; the
    # ivfx_assign/pq_encode posture applied to training)
    a0 = (
        train.crossJoin(F.broadcast(seeds))
        .withColumn("dist", F.expr(_dist_fp_sql("vec", "svec")))
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "seed_id", "vec")).alias("__w"))
        .select(
            "vec_id",
            F.col("__w.vec").alias("vec"),
            F.col("__w.seed_id").alias("cell0"),
        )
    )
    ex = a0.select("cell0", F.posexplode("vec").alias("dim", "comp"))
    cents = ex.groupBy("cell0", "dim").agg(
        (
            F.sum(F.expr("CAST(round(comp * 1000000000) AS BIGINT)")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000000.0)
        ).alias("c")
    )
    # persist: the 16-row centroid frame feeds the final assignment AND
    # the probe ranking — uncached, each consumer would re-execute the
    # whole seed+assign+refine chain behind it; cached, the quantizer
    # fits exactly once per search
    return tracked_persist(
        cents.groupBy("cell0")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select(
            F.col("cell0").alias("cell"), F.expr("transform(dc, x -> x.c)").alias("cvec")
        )
    )


def ivfx_assign(emb, cent_arr):
    """Assign every row of ``emb`` (vec_id, vec, passthrough cols) to
    its nearest centroid (fixed-point distance, cell-id tie-break) —
    the inverted-file build/probe-side write path. Output: emb's
    columns minus vec ordering + ``cell``.

    Argmin as a partial-aggregable min over struct(dist, cell, row):
    (dist, cell) is unique within a vec_id's candidate rows, so the
    struct min IS the winner row and the map side combines the
    n_cells candidates per vector down to one before the shuffle —
    no corpus x n_cells window sort."""
    out_cols = [c for c in emb.columns]
    carried = [c for c in out_cols if c != "vec_id"]
    return (
        emb.crossJoin(F.broadcast(cent_arr))
        .withColumn("dist", F.expr(_dist_fp_sql("vec", "cvec")))
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cell", *carried)).alias("__w"))
        .select(
            "vec_id",
            *[F.col(f"__w.{c}").alias(c) for c in carried],
            F.col("__w.cell").alias("cell"),
        )
    )


def ivfx_index(spark: SparkSession, sf_dir: str):
    """Build the deterministic IVF index over the whole embeddings
    table (train on all + assign all): returns (cent_arr, ivf) where
    cent_arr is the 16-row refined-centroid frame (tracked-persisted)
    and ivf is (vec_id, label, vec, cell) (tracked-persisted). Shared
    by the ANN search and the semantic sampler; the DuckDB twin is
    DUCK_IVFX_INDEX."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    cent_arr = ivfx_train(emb.select("vec_id", "vec"))
    ivf = tracked_persist(
        ivfx_assign(emb, cent_arr).select("vec_id", "label", "vec", "cell")
    )
    return cent_arr, ivf


def q_cosine_topk_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search with a fully deterministic quantizer, so the
    DuckDB oracle replays the ENTIRE index build and probe bitwise —
    upgrading the IVF family from rows-only to hash-graded:

    1. seeds: the 16 vectors with smallest md5(vec_id) (content-
       addressed sample — reproducible across engines/cluster sizes,
       the `deterministic_sample` trick; TakeOrdered, not a full sort).
    2. one Lloyd refinement: assign to seeds (fixed-point L2,
       tie-break on seed id), recompute centroids as fixed-point
       BIGINT component means (accumulation-order-free, tie-portable —
       the `kmeans_lloyd_step` technique).
    3. final assignment to refined centroids = the inverted file.
    4. probe: rank cells by centroid distance to the query vector, keep
       the 4 closest; exact-cosine re-rank inside probed cells only.

    Plan: the index build is two broadcast-scored scans + one
    (cell, dim) aggregation; the search is a broadcast semi-join on the
    probed cells + one top-k. The inverted file is tracked-persisted:
    the query row and the candidate set both read it. At 100 TB the
    probe touches ~n_probe/n_cells of the corpus — the IVF contract."""
    from pyspark.sql.window import Window

    cent_arr, ivf = ivfx_index(spark, sf_dir)
    q = ivf.filter(F.col("vec_id") == 0).select(F.col("vec").alias("qvec"))
    probed = (
        cent_arr.crossJoin(F.broadcast(q))
        .withColumn("qdist", F.expr(_dist_fp_sql("cvec", "qvec")))
        .withColumn("__pn", F.row_number().over(Window.orderBy("qdist", "cell")))
        .filter(F.col("__pn") <= IVFX_PROBE)
        .select("cell")
    )
    cand = (
        ivf.join(F.broadcast(probed), "cell")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
    )
    return (
        cand.withColumn(
            "cosine",
            _dot("vec", "qvec")
            / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("qvec", "qvec"))),
        )
        .select("vec_id", "label", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(IVFX_K)
    )


# shared deterministic IVF index build (seeds -> one Lloyd refinement ->
# final assignment): used by the ANN search oracle below AND the
# semantic_stratified_sample oracle, so the two cannot drift
DUCK_IVFX_INDEX = f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), seeds AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) AS seed_id, vec AS svec
  FROM (SELECT vec_id, vec, md5(CAST(vec_id AS VARCHAR)) AS h
        FROM base ORDER BY h, vec_id LIMIT {IVFX_CELLS})
), a0 AS (
  SELECT vec_id, vec, seed_id AS cell0 FROM (
    SELECT b.vec_id, b.vec, s.seed_id,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_duck_dist_fp('b.vec', 's.svec')}, s.seed_id) AS rn
    FROM base b CROSS JOIN seeds s
  ) WHERE rn = 1
), ex AS (
  SELECT cell0, i - 1 AS dim, vec[i] AS comp
  FROM a0, LATERAL (SELECT unnest(generate_series(1, len(vec))) AS i)
), cents AS (
  SELECT cell0, dim,
         CAST(SUM(CAST(round(comp * 1000000000) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1000000000.0 AS c
  FROM ex GROUP BY cell0, dim
), carr AS (
  SELECT cell0 AS cell, list(c ORDER BY dim) AS cvec FROM cents GROUP BY cell0
), ivf AS (
  SELECT vec_id, label, vec, cell FROM (
    SELECT b.vec_id, b.label, b.vec, ca.cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_duck_dist_fp('b.vec', 'ca.cvec')}, ca.cell) AS rn
    FROM base b CROSS JOIN carr ca
  ) WHERE rn = 1
"""


ORACLE_COSINE_TOPK_IVF_EXACT = f"""
{DUCK_IVFX_INDEX}
), q AS (
  SELECT vec AS qvec FROM ivf WHERE vec_id = 0
), probed AS (
  SELECT cell FROM (
    SELECT ca.cell,
           row_number() OVER (
             ORDER BY {_duck_dist_fp('ca.cvec', 'q.qvec')}, ca.cell) AS pn
    FROM carr ca CROSS JOIN q
  ) WHERE pn <= {IVFX_PROBE}
), scored AS (
  SELECT i.vec_id, i.label,
         round(
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_zip(i.vec, q.qvec), p -> p[1] * p[2])),
             (acc, t) -> acc + t)
           / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(i.vec, x -> x * x)), (acc, t) -> acc + t))
              * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(q.qvec, x -> x * x)), (acc, t) -> acc + t))),
           6) AS cosine
  FROM ivf i JOIN probed USING (cell) CROSS JOIN q
  WHERE i.vec_id != 0
)
SELECT vec_id, label, cosine FROM scored
ORDER BY cosine DESC, vec_id LIMIT {IVFX_K}
"""


register("cosine_topk_ivf_exact", q_cosine_topk_ivf_exact, ORACLE_COSINE_TOPK_IVF_EXACT)


# ---------------------------------------------------------------------------
# semantic stratified sampling (SemDeDup-style, Abbas et al. 2023):
# cluster the embedding space, then sample a bounded quota per cluster
# so the kept corpus covers every semantic region instead of letting
# dense regions dominate — the cluster-balanced counterpart of
# corpus.py's source/lang-stratified sampling
# ---------------------------------------------------------------------------

SEM_SAMPLE_PER_CELL = 20


def q_semantic_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced document sample: assign each document's
    embedding to a deterministic IVF cell (the graded quantizer from
    cosine_topk_ivf_exact, shared via ivfx_index), then keep up to
    ``SEM_SAMPLE_PER_CELL`` docs per cell by content-addressed rank
    (md5(doc_id) — the deterministic_sample trick, so the kept set is
    stable under corpus growth within a cell's hash order).

    Plan: the quantizer is two broadcast-scored scans; the quota pass
    is one window partitioned by cell (cells are balanced by the Lloyd
    step, so no single-partition collapse). Embeddings join documents
    1:1 on vec_id = doc_id. Output grain: one row per kept doc."""
    from pyspark.sql.window import Window

    from data_pipeline_platform_spark.sources.readers import load_table

    _, ivf = ivfx_index(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    joined = ivf.select(F.col("vec_id").alias("doc_id"), "cell").join(docs, "doc_id")
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        joined.withColumn("cell_rank", F.row_number().over(w))
        .withColumn("n_cell", F.count(F.lit(1)).over(Window.partitionBy("cell")))
        .filter(F.col("cell_rank") <= SEM_SAMPLE_PER_CELL)
        .select("doc_id", "cell", "cell_rank", "n_cell", "lang", "source")
    )


ORACLE_SEMANTIC_STRATIFIED_SAMPLE = f"""{DUCK_IVFX_INDEX}
), joined AS (
  SELECT d.doc_id, i.cell, d.lang, d.source
  FROM ivf i JOIN documents d ON d.doc_id = i.vec_id
), ranked AS (
  SELECT doc_id, cell, lang, source,
         row_number() OVER (PARTITION BY cell
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cell_rank,
         COUNT(*) OVER (PARTITION BY cell) AS n_cell
  FROM joined
)
SELECT doc_id, cell, cell_rank, n_cell, lang, source
FROM ranked WHERE cell_rank <= {SEM_SAMPLE_PER_CELL}
"""


register(
    "semantic_stratified_sample",
    q_semantic_stratified_sample,
    ORACLE_SEMANTIC_STRATIFIED_SAMPLE,
)


# in-cell near-duplicate cosine threshold. Production SemDeDup uses
# ~0.9+; the synthetic random embeddings top out near 0.5 in-cell
# cosine (no true semantic dups exist), so the graded threshold sits
# at the observed p99 to exercise the full pipeline with a non-empty,
# discriminating output.
SEMDEDUP_COS = 0.35


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup proper (Abbas et al. 2023): embeddings whose cosine
    similarity exceeds the threshold INSIDE the same IVF cell are
    duplicates; keep the smallest vec_id of each duplicate pair-set.
    Output: the dropped vectors with the kept vector they duplicate
    and the (6dp) cosine — the audit trail a curation run logs.

    Scale shape: pairwise comparison happens only WITHIN a cell — the
    quantizer bounds the candidate set per vector by the cell size
    (corpus/n_cells expected), never the corpus. The cell self-join is
    an equi-join on cell, and the per-pair cosine is a row-local fold.
    At 100 TB with proportionally more cells, in-cell density — and
    the pairwise cost — stays constant."""
    _, ivf = ivfx_index(spark, sf_dir)
    a = ivf.select(
        F.col("cell"), F.col("vec_id").alias("id_a"), F.col("vec").alias("va")
    )
    b = ivf.select(
        F.col("cell"), F.col("vec_id").alias("id_b"), F.col("vec").alias("vb")
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                _dot("va", "vb")
                / (F.sqrt(_dot("va", "va")) * F.sqrt(_dot("vb", "vb"))),
                6,
            ),
        )
        .filter(F.col("cosine") >= SEMDEDUP_COS)
    )
    # a dropped vector may duplicate several keepers: keep the smallest
    # partner as the canonical "kept" attribution
    return (
        pairs.groupBy(F.col("id_b").alias("dropped_vec_id"))
        .agg(
            F.min("id_a").alias("kept_vec_id"),
            F.max("cosine").alias("max_cosine"),
            F.count(F.lit(1)).alias("n_dup_partners"),
        )
    )


ORACLE_SEMANTIC_DEDUP = f"""{DUCK_IVFX_INDEX}
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_zip(a.vec, b.vec), p -> p[1] * p[2])),
             (acc, t) -> acc + t)
           / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(a.vec, x -> x * x)), (acc, t) -> acc + t))
              * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(b.vec, x -> x * x)), (acc, t) -> acc + t))),
           6) AS cosine
  FROM ivf a JOIN ivf b ON a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT id_b AS dropped_vec_id, MIN(id_a) AS kept_vec_id,
       MAX(cosine) AS max_cosine, COUNT(*) AS n_dup_partners
FROM pairs WHERE cosine >= {SEMDEDUP_COS}
GROUP BY id_b
"""


register("semantic_dedup", q_semantic_dedup, ORACLE_SEMANTIC_DEDUP)


# ---------------------------------------------------------------------------
# int8 embedding quantization with a reconstruction audit
# ---------------------------------------------------------------------------
# At 100 TB the embedding column dominates storage and ANN scan I/O;
# symmetric per-vector int8 quantization cuts both 4x (float32 -> int8)
# at a cosine cost this operator MEASURES per vector instead of
# assuming. Row-local end to end — the corpus never shuffles; the only
# exchange is the driver-facing result order.


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization: q_i = round(x_i / s) with
    s = maxabs/127, dequantized audit columns next to the codes:
    cosine(original, dequantized) and relative L2 error, plus a BIGINT
    checksum pinning the code array itself. All folds are sequential
    per-row array aggregates (DETERMINISM.md #4); the scale guard
    greatest(maxabs, 1e-12) keeps the all-zero vector defined."""
    emb = _emb(spark, sf_dir).withColumn("vec", _as_double("embedding"))
    scale = "greatest(aggregate(vec, CAST(0.0 AS DOUBLE), (acc, x) -> greatest(acc, abs(x))), 1e-12) / 127"
    df = emb.withColumn("s", F.expr(scale)).withColumn(
        "q", F.expr("transform(vec, x -> CAST(round(x / s) AS BIGINT))")
    ).withColumn("dq", F.expr("transform(q, v -> CAST(v AS DOUBLE) * s)"))
    dot_vd = "aggregate(zip_with(vec, dq, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    dot_vv = "aggregate(vec, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)"
    dot_dd = "aggregate(dq, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)"
    dot_ee = "aggregate(zip_with(vec, dq, (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    return df.select(
        "vec_id",
        "label",
        F.expr("aggregate(q, CAST(0 AS BIGINT), (acc, v) -> acc + v)").alias(
            "q_checksum"
        ),
        F.expr(
            f"round({dot_vd} / (sqrt({dot_vv}) * sqrt({dot_dd})), 6)"
        ).alias("cos_recon"),
        F.expr(f"round(sqrt({dot_ee}) / sqrt({dot_vv}), 6)").alias("l2_rel_err"),
    )


def _duck_fold(expr_list: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {expr_list}), "
        "(acc, t) -> acc + t)"
    )


ORACLE_QUANTIZE_EMBEDDINGS = f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), scaled AS (
  SELECT vec_id, label, vec,
         greatest(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vec),
                              (acc, x) -> greatest(acc, abs(x))), 1e-12) / 127
           AS s
  FROM base
), coded AS (
  SELECT vec_id, label, vec, s,
         list_transform(vec, x -> CAST(round(x / s) AS BIGINT)) AS q
  FROM scaled
), deq AS (
  SELECT vec_id, label, vec, s, q,
         list_transform(q, v -> CAST(v AS DOUBLE) * s) AS dq
  FROM coded
)
SELECT vec_id, label,
       list_reduce(list_prepend(CAST(0 AS BIGINT), q), (acc, v) -> acc + v)
         AS q_checksum,
       round({_duck_fold("list_transform(list_zip(vec, dq), p -> p[1] * p[2])")}
             / (sqrt({_duck_fold("list_transform(vec, x -> x * x)")})
                * sqrt({_duck_fold("list_transform(dq, x -> x * x)")})), 6)
         AS cos_recon,
       round(sqrt({_duck_fold("list_transform(list_zip(vec, dq), p -> (p[1] - p[2]) * (p[1] - p[2]))")})
             / sqrt({_duck_fold("list_transform(vec, x -> x * x)")}), 6)
         AS l2_rel_err
FROM deq
"""

register("quantize_embeddings", q_quantize_embeddings, ORACLE_QUANTIZE_EMBEDDINGS)


# int8-probe ANN: rank candidates on the quantized codes, re-rank the
# survivors exactly. The win at 100 TB is scan I/O — the probe reads
# int8 codes (4x smaller than float32) and the exact vectors are
# fetched only for the candidate set. Rank-equivalence note: with
# per-vector symmetric scales, cos(q_a, q_b) = dot_int / (|q_a||q_b|)
# — the scales cancel, so the probe needs no floats beyond two sqrts
# of exact integers.
INT8_CANDIDATES = 30


def q_cosine_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbours of vec_id=0 via the int8 probe:
    candidates = top-30 by quantized cosine, then exact re-rank.
    Output carries BOTH scores so the probe's fidelity is auditable
    per row."""
    emb = _emb(spark, sf_dir).withColumn("vec", _as_double("embedding"))
    s_expr = (
        "greatest(aggregate(vec, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> greatest(acc, abs(x))), 1e-12) / 127"
    )
    coded = emb.withColumn("s", F.expr(s_expr)).select(
        "vec_id",
        "label",
        "vec",
        F.expr("transform(vec, x -> CAST(round(x / s) AS BIGINT))").alias("q"),
    )
    qv = coded.filter(F.col("vec_id") == 0).select(
        F.col("vec").alias("qvec"), F.col("q").alias("qq")
    )
    dot_int = (
        "aggregate(zip_with(q, qq, (x, y) -> x * y), CAST(0 AS BIGINT), "
        "(acc, t) -> acc + t)"
    )
    nrm = "sqrt(CAST(aggregate({c}, CAST(0 AS BIGINT), (acc, x) -> acc + x * x) AS DOUBLE))"
    approx = (
        coded.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            "vec",
            "qvec",
            F.expr(
                f"round(CAST({dot_int} AS DOUBLE) / "
                f"({nrm.format(c='q')} * {nrm.format(c='qq')}), 6)"
            ).alias("approx_cos"),
        )
        .orderBy(F.desc("approx_cos"), "vec_id")
        .limit(INT8_CANDIDATES)
    )
    exact_cos = (
        "round(aggregate(zip_with(vec, qvec, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, t) -> acc + t) / "
        "(sqrt(aggregate(vec, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)) * "
        "sqrt(aggregate(qvec, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))), 6)"
    )
    return (
        approx.select(
            "vec_id", "label", "approx_cos", F.expr(exact_cos).alias("cosine")
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


_DUCK_INT8 = """
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), scaled AS (
  SELECT vec_id, label, vec,
         greatest(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vec),
                  (acc, y) -> greatest(acc, abs(y))), 1e-12) / 127 AS s
  FROM base
), coded AS (
  SELECT vec_id, label, vec,
         list_transform(vec, x -> CAST(round(x / s) AS BIGINT)) AS q
  FROM scaled
), qv AS (
  SELECT vec AS qvec, q AS qq FROM coded WHERE vec_id = 0
), approx AS (
  SELECT c.vec_id, c.label, c.vec, qv.qvec,
         round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(list_zip(c.q, qv.qq), p -> p[1] * p[2])),
                 (acc, t) -> acc + t) AS DOUBLE)
               / (sqrt(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(c.q, x -> x * x)), (acc, t) -> acc + t) AS DOUBLE))
                  * sqrt(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(qv.qq, x -> x * x)), (acc, t) -> acc + t) AS DOUBLE))),
               6) AS approx_cos
  FROM coded c CROSS JOIN qv
  WHERE c.vec_id != 0
  ORDER BY approx_cos DESC, c.vec_id
  LIMIT {cand}
)
SELECT vec_id, label, approx_cos,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list_zip(vec, qvec), p -> p[1] * p[2])),
               (acc, t) -> acc + t)
             / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(vec, x -> x * x)), (acc, t) -> acc + t))
                * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(qvec, x -> x * x)), (acc, t) -> acc + t))),
             6) AS cosine
FROM approx
ORDER BY cosine DESC, vec_id
LIMIT 10
"""

ORACLE_COSINE_TOPK_INT8 = _DUCK_INT8.format(cand=INT8_CANDIDATES)

register("cosine_topk_int8", q_cosine_topk_int8, ORACLE_COSINE_TOPK_INT8)


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality screen: flag embeddings sitting more than two
    standard deviations beyond their OWN label's mean centroid
    distance — the mislabeled/corrupted-vector sweep an embedding
    table gets before training a classifier on it.

    Engine-exact: centroids are the fixed-point means from
    `centroid_classify`; distances are the exact BIGINT folds
    (FP_SCALE); per-label moments accumulate in DECIMAL(38,0) (the
    squared fixed-point distances overflow BIGINT), and the z>2 flag
    evaluates as (n*d - S)^2 > 4*(n*S2 - S^2) — the z-test cleared of
    divisions and square roots, exact up to the DECIMAL(38,0) bound
    (safe through ~1e5 vectors/label at these magnitudes; the
    events_anomaly integer-moments posture).

    Plan: centroid fit is one posexplode agg (label-dim grain); the
    scoring join broadcasts the |labels| centroid rows; moments are a
    second map-side-combinable agg on the label key; the flag is a
    row-local comparison after the tiny moments frame broadcasts back.
    No window anywhere."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    ex = emb.select("label", F.posexplode("vec").alias("dim", "comp"))
    cents = ex.groupBy("label", "dim").agg(
        (
            F.sum(F.expr("CAST(round(comp * 1000000000) AS BIGINT)")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000000.0)
        ).alias("c")
    )
    cent_arr = (
        cents.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select("label", F.expr("transform(dc, x -> x.c)").alias("cvec"))
    )
    scored = emb.join(F.broadcast(cent_arr), "label").select(
        "vec_id", "label", F.expr(_dist_fp_sql("vec", "cvec")).alias("dist_fp")
    )
    moments = scored.groupBy("label").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("dist_fp").cast("decimal(38,0)")).alias("s"),
        F.sum(
            (F.col("dist_fp").cast("decimal(38,0)") * F.col("dist_fp").cast("decimal(38,0)"))
        ).alias("s2"),
    )
    return (
        scored.join(F.broadcast(moments), "label")
        .select(
            "vec_id",
            "label",
            "dist_fp",
            (
                ((F.col("n") * F.col("dist_fp") - F.col("s")) > 0)
                & (
                    (F.col("n") * F.col("dist_fp") - F.col("s"))
                    * (F.col("n") * F.col("dist_fp") - F.col("s"))
                    > F.lit(4) * (F.col("n") * F.col("s2") - F.col("s") * F.col("s"))
                )
            ).alias("outlier"),
        )
    )


ORACLE_EMBEDDING_OUTLIERS = f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), ex AS (
  SELECT label, i - 1 AS dim, vec[i] AS comp
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(vec))) AS i)
), cents AS (
  SELECT label, dim,
         CAST(SUM(CAST(round(comp * 1000000000) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1000000000.0 AS c
  FROM ex GROUP BY label, dim
), carr AS (
  SELECT label, list(c ORDER BY dim) AS cvec FROM cents GROUP BY label
), scored AS (
  SELECT b.vec_id, b.label,
         {_duck_dist_fp('b.vec', 'ca.cvec')} AS dist_fp
  FROM base b JOIN carr ca USING (label)
), moments AS (
  SELECT label, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(dist_fp AS HUGEINT)) AS s,
         SUM(CAST(dist_fp AS HUGEINT) * CAST(dist_fp AS HUGEINT)) AS s2
  FROM scored GROUP BY label
)
SELECT sc.vec_id, sc.label, sc.dist_fp,
       (m.n * sc.dist_fp - m.s) > 0 AND
       (m.n * sc.dist_fp - m.s) * (m.n * sc.dist_fp - m.s)
         > 4 * (m.n * m.s2 - m.s * m.s) AS outlier
FROM scored sc JOIN moments m USING (label)
"""

register("embedding_outliers", q_embedding_outliers, ORACLE_EMBEDDING_OUTLIERS)


KNN_K = 5


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label prediction over the shared deterministic IVF
    quantizer: each vector votes among its KNN_K nearest IN-CELL
    neighbors (exact fixed-point L2, ties by neighbor id; vote ties by
    smaller label). The instance-based sibling of `centroid_classify` —
    what a label-noise audit actually runs, since a mislabeled vector's
    neighbors out-vote its own tag.

    Scale shape: the quantizer bounds each vector's candidate set to
    its cell (corpus/n_cells expected, constant in-cell density as
    cells scale with data); ONE exchange co-locates each cell, the
    in-cell scoring runs batch-vectorized (guide §4.2 — the former
    cell self-join evaluated an interpreted fixed-point fold per
    (query, neighbor) pair: |cell|^2 x d lambda steps, ~3s at sf0.1),
    and the vote window partitions by vec_id — no global ordering
    anywhere. Task memory holds its cells' vectors, the same
    cell-bounded budget the self-join's per-key build side needed."""
    from pyspark.sql.window import Window

    _, ivf = ivfx_index(spark, sf_dir)

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        def quant(v):
            # SQL round(): half away from zero on the exact double
            f = np.floor(v)
            frac = v - f
            up = (frac > 0.5) | ((frac == 0.5) & (v > 0))
            return (f + up).astype(np.int64)

        cells_l, ids_l, labels_l, vecs_l = [], [], [], []
        for batch in batches:
            if batch.num_rows == 0:
                continue
            cells_l.append(
                batch.column(0).to_numpy(zero_copy_only=False)
            )
            ids_l.append(batch.column(1).to_numpy(zero_copy_only=False))
            labels_l.append(
                batch.column(2).to_numpy(zero_copy_only=False)
            )
            vc = batch.column(3)
            vecs_l.append(
                vc.flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(batch.num_rows, -1)
            )
        if not ids_l:
            return
        cells = np.concatenate(cells_l)
        ids = np.concatenate(ids_l)
        labels = np.concatenate(labels_l)
        Qx = quant(np.concatenate(vecs_l).astype(np.float64) * 1_000_000.0)
        out_q, out_ql, out_nl = [], [], []
        for c in np.unique(cells):
            idx = np.flatnonzero(cells == c)
            m = len(idx)
            if m < 2:
                continue  # no neighbors: the self-join dropped it too
            Q = Qx[idx]
            cid = ids[idx]
            clab = labels[idx]
            # exact int64 pairwise distances, query-blocked to bound
            # the m x m intermediate
            for s0 in range(0, m, 256):
                blk = Q[s0 : s0 + 256]
                diff = blk[:, None, :] - Q[None, :, :]
                d2 = np.einsum("ijk,ijk->ij", diff, diff)
                for r in range(blk.shape[0]):
                    qpos = s0 + r
                    keep = np.flatnonzero(np.arange(m) != qpos)
                    order = keep[np.lexsort((cid[keep], d2[r][keep]))][
                        :KNN_K
                    ]
                    out_q.append(
                        np.full(len(order), cid[qpos], dtype=np.int64)
                    )
                    out_ql.append(
                        np.full(len(order), clab[qpos], dtype=np.int32)
                    )
                    out_nl.append(clab[order].astype(np.int32))
        if out_q:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q), pa.int64()),
                    pa.array(np.concatenate(out_ql), pa.int32()),
                    pa.array(np.concatenate(out_nl), pa.int32()),
                ],
                ["qid", "qlabel", "nlabel"],
            )

    top = (
        ivf.select("cell", "vec_id", "label", "vec")
        .repartition("cell")
        .mapInArrow(gen, "qid long, qlabel int, nlabel int")
    )
    votes = top.groupBy("qid", "qlabel", "nlabel").agg(
        F.count(F.lit(1)).alias("votes")
    )
    w_vote = Window.partitionBy("qid").orderBy(
        F.desc("votes"), F.asc("nlabel")
    )
    return (
        votes.withColumn("vr", F.row_number().over(w_vote))
        .filter(F.col("vr") == 1)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("qlabel").alias("label"),
            F.col("nlabel").alias("predicted_label"),
            F.col("votes").cast("bigint").alias("votes"),
        )
    )


ORACLE_KNN_CLASSIFY = f"""{DUCK_IVFX_INDEX}
), top AS (
  SELECT qid, qlabel, nlabel FROM (
    SELECT a.vec_id AS qid, a.label AS qlabel, b.label AS nlabel,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY {_duck_dist_fp('a.vec', 'b.vec')}, b.vec_id) AS rn
    FROM ivf a JOIN ivf b ON a.cell = b.cell AND a.vec_id != b.vec_id
  ) WHERE rn <= {KNN_K}
), votes AS (
  SELECT qid, qlabel, nlabel, COUNT(*) AS votes FROM top GROUP BY 1, 2, 3
)
SELECT qid AS vec_id, qlabel AS label, nlabel AS predicted_label,
       CAST(votes AS BIGINT) AS votes
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
    ORDER BY votes DESC, nlabel ASC) AS vr FROM votes
) WHERE vr = 1
"""

register("knn_classify", q_knn_classify, ORACLE_KNN_CLASSIFY)


def q_embedding_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-pipeline consistency check: split the table into two
    content-addressed halves (md5 of vec_id — the train_val_test_split
    posture) and measure, per label, the distance between the halves'
    centroids. Stable labels give near-zero drift; a label whose
    halves disagree is noisy or the embedder changed mid-ingest.

    All fixed-point exact: per-half centroids are the
    `centroid_classify` means; the drift is the exact BIGINT distance
    fold between the two 1e-9-rounded centroid vectors. Two map-side-
    combinable aggs; the per-label join is |labels|-sized."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    halves = emb.withColumn(
        "half",
        (F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1) < "8").cast("int"),
    )
    ex = halves.select("label", "half", F.posexplode("vec").alias("dim", "comp"))
    cents = ex.groupBy("label", "half", "dim").agg(
        (
            F.sum(F.expr("CAST(round(comp * 1000000000) AS BIGINT)")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000000.0)
        ).alias("c"),
        F.count(F.lit(1)).alias("cnt"),
    )
    arr = (
        cents.groupBy("label", "half")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"),
            F.max("cnt").alias("n_vecs"),
        )
        .select(
            "label",
            "half",
            F.expr("transform(dc, x -> x.c)").alias("cvec"),
            "n_vecs",
        )
    )
    a = arr.filter(F.col("half") == 1).select(
        "label", F.col("cvec").alias("ca"), F.col("n_vecs").alias("n_a")
    )
    b = arr.filter(F.col("half") == 0).select(
        "label", F.col("cvec").alias("cb"), F.col("n_vecs").alias("n_b")
    )
    return a.join(b, "label").select(
        "label",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.expr(_dist_fp_sql("ca", "cb")).alias("drift_fp"),
    )


ORACLE_EMBEDDING_SPLIT_DRIFT = f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec,
         CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '8'
              THEN 1 ELSE 0 END AS half
  FROM embeddings
), ex AS (
  SELECT label, half, i - 1 AS dim, vec[i] AS comp
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(vec))) AS i)
), cents AS (
  SELECT label, half, dim,
         CAST(SUM(CAST(round(comp * 1000000000) AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 1000000000.0 AS c,
         COUNT(*) AS cnt
  FROM ex GROUP BY 1, 2, 3
), arr AS (
  SELECT label, half, list(c ORDER BY dim) AS cvec, MAX(cnt) AS n_vecs
  FROM cents GROUP BY 1, 2
)
SELECT a.label, CAST(a.n_vecs AS BIGINT) AS n_a, CAST(b.n_vecs AS BIGINT) AS n_b,
       {_duck_dist_fp('a.cvec', 'b.cvec')} AS drift_fp
FROM arr a JOIN arr b ON a.label = b.label AND a.half = 1 AND b.half = 0
"""

register("embedding_split_drift", q_embedding_split_drift, ORACLE_EMBEDDING_SPLIT_DRIFT)


MATRYOSHKA_DIM = 16
MATRYOSHKA_K = 10
MATRYOSHKA_PROBE_MOD = 25


def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval eval (Kusupati et al. 2022
    shape): for a broadcast probe panel, compare exact cosine top-k
    under the FULL embedding vs the first-MATRYOSHKA_DIM prefix, and
    report per-probe recall@k of the truncated index — the measurement
    that decides how many dimensions a 100 TB ANN index actually needs
    (a 16/64 prefix cuts index memory and bandwidth 4x; this query says
    what it costs in recall).

    Shape: ONE corpus scan crossed with the broadcast probe panel
    (|probes| = |corpus| / MATRYOSHKA_PROBE_MOD sampled by key, the
    retrieval_eval posture); both cosines compute per row JVM-side
    (sequential zip_with fold — the engine-shared order); per-probe
    ranks come from keyed windows (WindowGroupLimit pushes the k), so
    nothing global ever materializes. Recall is an exact overlap count
    divided once.

    Determinism: both cosines round to 6 dp BEFORE ranking with vec_id
    tie-break (the cosine_topk rule); the overlap count is exact."""
    from pyspark.sql.window import Window

    base = _emb(spark, sf_dir).withColumn("vec", _as_double("embedding"))
    probes = base.filter(F.col("vec_id") % MATRYOSHKA_PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("vec").alias("qfull"),
        F.expr(f"slice(vec, 1, {MATRYOSHKA_DIM})").alias("qtrunc"),
    )
    cands = base.select(
        "vec_id",
        "vec",
        F.expr(f"slice(vec, 1, {MATRYOSHKA_DIM})").alias("tvec"),
    )
    scored = (
        cands.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(
                _dot("vec", "qfull")
                / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("qfull", "qfull"))),
                6,
            ).alias("cos_full"),
            F.round(
                _dot("tvec", "qtrunc")
                / (F.sqrt(_dot("tvec", "tvec")) * F.sqrt(_dot("qtrunc", "qtrunc"))),
                6,
            ).alias("cos_trunc"),
        )
    )
    wf = Window.partitionBy("probe_id").orderBy(F.col("cos_full").desc(), "vec_id")
    wt = Window.partitionBy("probe_id").orderBy(F.col("cos_trunc").desc(), "vec_id")
    ranked = scored.withColumn("rf", F.row_number().over(wf)).withColumn(
        "rt", F.row_number().over(wt)
    )
    return (
        ranked.filter(F.col("rf") <= MATRYOSHKA_K)
        .groupBy("probe_id")
        .agg(
            F.sum(
                F.expr(f"CASE WHEN rt <= {MATRYOSHKA_K} THEN 1 ELSE 0 END")
            ).alias("n_overlap")
        )
        .select(
            "probe_id",
            "n_overlap",
            F.expr(f"CAST(n_overlap AS DOUBLE) / {MATRYOSHKA_K}").alias("recall_at_k"),
        )
    )


ORACLE_MATRYOSHKA_RECALL = f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), probes AS (
  SELECT vec_id AS probe_id, vec AS qfull, vec[1:{MATRYOSHKA_DIM}] AS qtrunc
  FROM base WHERE vec_id % {MATRYOSHKA_PROBE_MOD} = 0
), scored AS (
  SELECT p.probe_id, b.vec_id,
         round(list_dot_product(b.vec, p.qfull) /
               (sqrt(list_dot_product(b.vec, b.vec))
                * sqrt(list_dot_product(p.qfull, p.qfull))), 6) AS cos_full,
         round(list_dot_product(b.vec[1:{MATRYOSHKA_DIM}], p.qtrunc) /
               (sqrt(list_dot_product(b.vec[1:{MATRYOSHKA_DIM}],
                                      b.vec[1:{MATRYOSHKA_DIM}]))
                * sqrt(list_dot_product(p.qtrunc, p.qtrunc))), 6) AS cos_trunc
  FROM base b CROSS JOIN probes p
  WHERE b.vec_id != p.probe_id
), ranked AS (
  SELECT probe_id, vec_id,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos_full DESC, vec_id) AS rf,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos_trunc DESC, vec_id) AS rt
  FROM scored
)
SELECT probe_id,
       SUM(CASE WHEN rt <= {MATRYOSHKA_K} THEN 1 ELSE 0 END) AS n_overlap,
       CAST(SUM(CASE WHEN rt <= {MATRYOSHKA_K} THEN 1 ELSE 0 END) AS DOUBLE)
         / {MATRYOSHKA_K} AS recall_at_k
FROM ranked
WHERE rf <= {MATRYOSHKA_K}
GROUP BY probe_id
"""


register("matryoshka_recall", q_matryoshka_recall, ORACLE_MATRYOSHKA_RECALL)


RRF_K = 60
RRF_TOP = 10


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of the full-dim and
    truncated-dim cosine rankings: score = 1/(K+rank_full) +
    1/(K+rank_trunc), fused top-RRF_TOP per probe. The standard
    zero-tuning ensemble for hybrid retrieval (here: cheap truncated
    index fused with the exact ranking — the production pattern is
    BM25 + dense, the algebra is identical).

    Determinism: ranks come from the matryoshka windows (rounded
    cosines, vec_id tie-break); each RRF term is one exact double
    division of integers and their sum is a PER-ROW two-term add (no
    cross-row float accumulation), rounded to 6 dp before the final
    ranking with vec_id tie-break."""
    from pyspark.sql.window import Window

    base = _emb(spark, sf_dir).withColumn("vec", _as_double("embedding"))
    probes = base.filter(F.col("vec_id") % MATRYOSHKA_PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("vec").alias("qfull"),
        F.expr(f"slice(vec, 1, {MATRYOSHKA_DIM})").alias("qtrunc"),
    )
    cands = base.select(
        "vec_id", "vec", F.expr(f"slice(vec, 1, {MATRYOSHKA_DIM})").alias("tvec")
    )
    scored = (
        cands.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(
                _dot("vec", "qfull")
                / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("qfull", "qfull"))),
                6,
            ).alias("cos_full"),
            F.round(
                _dot("tvec", "qtrunc")
                / (F.sqrt(_dot("tvec", "tvec")) * F.sqrt(_dot("qtrunc", "qtrunc"))),
                6,
            ).alias("cos_trunc"),
        )
    )
    wf = Window.partitionBy("probe_id").orderBy(F.col("cos_full").desc(), "vec_id")
    wt = Window.partitionBy("probe_id").orderBy(F.col("cos_trunc").desc(), "vec_id")
    fused = scored.withColumn("rf", F.row_number().over(wf)).withColumn(
        "rt", F.row_number().over(wt)
    ).select(
        "probe_id",
        "vec_id",
        F.expr(
            f"round(CAST(1.0 AS DOUBLE) / ({RRF_K} + rf) + CAST(1.0 AS DOUBLE) / ({RRF_K} + rt), 6)"
        ).alias("rrf"),
    )
    wr = Window.partitionBy("probe_id").orderBy(F.col("rrf").desc(), "vec_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wr))
        .filter(F.col("fused_rank") <= RRF_TOP)
        .select("probe_id", "vec_id", "rrf", "fused_rank")
    )


ORACLE_RRF_FUSION = f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), probes AS (
  SELECT vec_id AS probe_id, vec AS qfull, vec[1:{MATRYOSHKA_DIM}] AS qtrunc
  FROM base WHERE vec_id % {MATRYOSHKA_PROBE_MOD} = 0
), scored AS (
  SELECT p.probe_id, b.vec_id,
         round(list_dot_product(b.vec, p.qfull) /
               (sqrt(list_dot_product(b.vec, b.vec))
                * sqrt(list_dot_product(p.qfull, p.qfull))), 6) AS cos_full,
         round(list_dot_product(b.vec[1:{MATRYOSHKA_DIM}], p.qtrunc) /
               (sqrt(list_dot_product(b.vec[1:{MATRYOSHKA_DIM}],
                                      b.vec[1:{MATRYOSHKA_DIM}]))
                * sqrt(list_dot_product(p.qtrunc, p.qtrunc))), 6) AS cos_trunc
  FROM base b CROSS JOIN probes p
  WHERE b.vec_id != p.probe_id
), ranked AS (
  SELECT probe_id, vec_id,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos_full DESC, vec_id) AS rf,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos_trunc DESC, vec_id) AS rt
  FROM scored
), fused AS (
  SELECT probe_id, vec_id,
         round(1.0 / ({RRF_K} + rf) + 1.0 / ({RRF_K} + rt), 6) AS rrf
  FROM ranked
)
SELECT probe_id, vec_id, rrf, fused_rank
FROM (
  SELECT probe_id, vec_id, rrf,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY rrf DESC, vec_id) AS fused_rank
  FROM fused
)
WHERE fused_rank <= {RRF_TOP}
"""


register("rrf_fusion", q_rrf_fusion, ORACLE_RRF_FUSION)
