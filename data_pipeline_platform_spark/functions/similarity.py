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

DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_platform_spark.sources.readers import load_table

    return load_table(spark, sf_dir, "embeddings")


def _dot(a: str, b: str):
    """Exact sequential dot product of two array<double> columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
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
    return (
        scored.orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .select("vec_id", "label", F.round("cosine", 6).alias("cosine"))
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
    Approximate by design -> rows-only check; the exact twin
    (cosine_topk) is the graded baseline."""
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
    return (
        scored.orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .select("vec_id", "label", F.round("cosine", 6).alias("cosine"))
        .limit(10)
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All vector pairs with cosine >= 0.95 (embedding near-dup detection).

    Brute-force pair join at test SF; at scale the LSH bucket (or IVF
    cell) becomes the join key so only intra-bucket pairs are scored."""
    emb = _emb(spark, sf_dir).select("vec_id", _as_double("embedding").alias("vec"))
    norm = emb.withColumn("n", F.sqrt(_dot("vec", "vec")))
    a = norm.select(
        F.col("vec_id").alias("id_a"), F.col("vec").alias("va"), F.col("n").alias("na")
    )
    b = norm.select(
        F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"), F.col("n").alias("nb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", _dot("va", "vb") / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= 0.95)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


ORACLE_EMBEDDING_NEAR_DUP = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.vec, b.vec) / (a.n * b.n), 6) AS cosine
FROM base a JOIN base b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.vec, b.vec) / (a.n * b.n) >= 0.95
"""


def build_ivf_index(
    emb: DataFrame, n_cells: int = 16, vec_col: str = "vec", seed: int = 42
):
    """IVF coarse quantizer: k-means centroids over the corpus; each
    vector is assigned to its nearest cell. Returns (indexed_df,
    centroids) where indexed_df has an ``ivf_cell`` column.

    At 100 TB the index build is one ML fit (sampled) + one assignment
    pass, and the assignment column becomes the partition key — query
    cost is proportional to the probed cells, not the corpus."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    ml_df = emb.withColumn("features", array_to_vector(F.col(vec_col)))
    model = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="ivf_cell").fit(
        ml_df
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
    indexed = indexed.persist()

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
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .select("vec_id", "label", F.round("cosine", 6).alias("cosine"))
        .limit(k)
    )


def q_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN twin of cosine_topk (approximate -> rows-only check; the
    recall test lives in tests/test_extensions.py)."""
    return ivf_topk(_emb(spark, sf_dir), query_vec_id=0, k=10)


register("cosine_topk", q_cosine_topk, ORACLE_COSINE_TOPK)
register("cosine_topk_ivf", q_cosine_topk_ivf)  # approximate -> rows-only
register("cosine_topk_lsh", q_cosine_topk_lsh)  # approximate -> rows-only
register("embedding_near_dup", q_embedding_near_dup, ORACLE_EMBEDDING_NEAR_DUP)
