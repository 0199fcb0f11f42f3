"""Maximal Marginal Relevance re-ranking (extension; retrieval-side
complement to `kcenter_coreset`'s training-side diversity selection).

MMR (Carbonell & Goldstein, SIGIR 1998) turns a similarity top-N into a
DIVERSE top-k: greedily pick the candidate maximizing
``lambda * relevance - (1 - lambda) * max_similarity_to_selected`` — the
standard de-redundancy step in front of RAG context assembly, where
feeding the model 5 near-identical passages wastes 4 slots.

Scale shape: relevance ranking is the existing one-scan broadcast
cosine top-N (`TakeOrderedAndProject`); the MMR loop then runs on the
N-candidate frame only (N = 20 here), one tiny argmax round per
selection with a running max-similarity column — corpus cost is the
top-N retrieval, the re-rank is O(k·N) kernels on a bounded frame.

Determinism: every compared quantity is a round(·, 6) of a cosine (the
package's cross-engine contract for similarity scores) and the MMR
score is plain IEEE arithmetic on those rounded values, with vec_id
tie-breaks — the DuckDB oracle unrolls the selection rounds as a CTE
chain and matches bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.functions.similarity import _as_double, _dot

N_CAND = 20
K_SELECT = 5
LAM = 0.7


def _cos_to(lit_vec) -> F.Column:
    """round(cos(vec, s), 6) against a broadcast literal vector."""
    s = F.lit(lit_vec).cast("array<double>")
    df_expr = (
        _dot("vec", "__s") / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("__s", "__s")))
    )
    return df_expr, s


def mmr_select(cand: DataFrame, k: int = K_SELECT, lam: float = LAM) -> list:
    """Greedy MMR over a candidate frame (vec_id, vec, rel); returns
    [(sel_order, vec_id, rel, score)].  Round r adds ONE similarity
    kernel against the newly selected vector (running max), so the loop
    is O(k·N) kernels on the bounded candidate frame."""
    first = cand.orderBy(F.col("rel").desc(), F.col("vec_id")).limit(1).collect()
    if not first:
        return []
    fid, frel, fvec = int(first[0]["vec_id"]), first[0]["rel"], first[0]["vec"]
    out = [(0, fid, float(frel), float(frel))]
    expr, s = _cos_to(fvec)
    rem = (
        cand.filter(F.col("vec_id") != fid)
        .withColumn("__s", s)
        .withColumn("maxsim", F.round(expr, 6))
        .drop("__s")
        .localCheckpoint()
    )
    for step in range(1, k):
        score = F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("maxsim")
        top = (
            rem.withColumn("score", score)
            .orderBy(F.col("score").desc(), F.col("vec_id"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        nid, nrel, nscore, nvec = (
            int(top[0]["vec_id"]),
            float(top[0]["rel"]),
            float(top[0]["score"]),
            top[0]["vec"],
        )
        out.append((step, nid, nrel, nscore))
        expr, s = _cos_to(nvec)
        rem = (
            rem.filter(F.col("vec_id") != nid)
            .withColumn("__s", s)
            .withColumn("maxsim", F.greatest("maxsim", F.round(expr, 6)))
            .drop("__s")
            .localCheckpoint()
        )
    return out


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_platform_spark.sources.readers import load_table

    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("vec")
    )
    q = base.filter(F.col("vec_id") == 0).select(F.col("vec").alias("qvec"))
    cand = (
        base.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "rel",
            F.round(
                _dot("vec", "qvec")
                / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("qvec", "qvec"))),
                6,
            ),
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id"))
        .limit(N_CAND)
        .select("vec_id", "vec", "rel")
    )
    rows = mmr_select(cand)
    return spark.createDataFrame(
        rows, "sel_order int, vec_id bigint, rel double, score double"
    )


def _duck_cos(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )


def _oracle_mmr(k: int = K_SELECT, lam: float = LAM) -> str:
    parts = [
        "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),",
        "q AS (SELECT vec AS qvec FROM base WHERE vec_id = 0),",
        f"""cand AS (
  SELECT b.vec_id, b.vec, {_duck_cos("b.vec", "q.qvec")} AS rel
  FROM base b, q WHERE b.vec_id <> 0
  ORDER BY rel DESC, b.vec_id LIMIT {N_CAND}
),""",
        "sel0 AS (SELECT vec_id, vec, rel FROM cand ORDER BY rel DESC, vec_id LIMIT 1),",
        f"""m1 AS (
  SELECT c.vec_id, c.vec, c.rel, {_duck_cos("c.vec", "s.vec")} AS maxsim
  FROM cand c, sel0 s WHERE c.vec_id <> s.vec_id
),""",
    ]
    for step in range(1, k):
        parts.append(
            f"sel{step} AS (SELECT vec_id, vec, rel, "
            f"{lam} * rel - {1.0 - lam} * maxsim AS score FROM m{step} "
            f"ORDER BY score DESC, vec_id LIMIT 1),"
        )
        if step < k - 1:
            parts.append(
                f"""m{step + 1} AS (
  SELECT c.vec_id, c.vec, c.rel,
         GREATEST(c.maxsim, {_duck_cos("c.vec", "s.vec")}) AS maxsim
  FROM m{step} c, sel{step} s WHERE c.vec_id <> s.vec_id
),"""
            )
    selects = [
        "SELECT 0 AS sel_order, CAST(vec_id AS BIGINT) AS vec_id, rel, "
        "rel AS score FROM sel0"
    ] + [
        f"SELECT {s}, CAST(vec_id AS BIGINT), rel, score FROM sel{s}"
        for s in range(1, k)
    ]
    sql = "\n".join(parts).rstrip().rstrip(",")
    return sql + "\n" + "\nUNION ALL\n".join(selects)


register("mmr_rerank", q_mmr_rerank, _oracle_mmr())
