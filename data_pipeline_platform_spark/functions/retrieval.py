"""Retrieval-quality evaluation (extension; no reference counterpart —
SURVEY.md §2.11): Average Precision @ 10 and reciprocal rank for a
label-relevance kNN retrieval over the embeddings table — the eval half
of the similarity-search family (`cosine_topk`, `knn_classify`).

Exact-rational AP: the usual float accumulation of precision@k is
summation-order-fragile, but every AP@K term is a rational with
denominator <= K, so with L = lcm(1..10) = 2520 the sum
  ap_num = sum_{k<=10, rel_k} hits@k * (L / k)
is an exact BIGINT in both engines; AP itself is ONE final IEEE
division by L * min(R, 10). Reciprocal rank is 1.0 / first_rel_rank —
also a single division. Ranking uses the fixed-point BIGINT distance
fold (`similarity.FP_SCALE`) with a vec_id tie-break, the house rule
for anything that orders by distance.

Scale: probes are a fixed bounded panel (vec_id < N_PROBES) broadcast
against ONE corpus scan; per-probe top-10 is a keyed window
(WindowGroupLimit pushes the limit before the sort spills), never a
global window. At 100 TB the corpus scan dominates and parallelizes;
the eval frame is |probes| x 10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.functions.similarity import (
    _as_double,
    _duck_dist_fp,
)

N_PROBES = 20
K = 10
LCM_K = 2520  # lcm(1..10): L/k is an exact integer for every k <= 10


def _probe_topk_partials(emb: DataFrame, probes_rows, k: int) -> DataFrame:
    """Per-batch partial top-k candidates for a bounded probe panel,
    computed batch-vectorized in numpy (guide §4.2) instead of per-row
    JVM lambda folds: the former shape evaluated |corpus| x |probes| x
    d interpreted aggregate-lambda steps (measured ~4s at sf0.1 for a
    2000-row corpus — the expression interpreter, not the data, was
    the cost).

    Exactness: quantization replicates SQL round() (half away from
    zero on the exact double) and distances are int64 sums of squared
    quantized diffs — the identical integers `_dist_fp_sql` folds to,
    bit for bit (d * (2 * FP_SCALE)^2 << 2^63 for unit-scale vectors;
    the synthetic corpus bound). Emitting each batch's k smallest
    (dist_fp, vec_id) rows per probe preserves the global top-k
    through the downstream window: top-k of a union of per-subset
    top-ks is the global top-k.

    ``probes_rows``: collected probe panel (bounded by construction —
    the same rows the old plan broadcast). Returns (probe_id,
    probe_label, vec_id, label, dist_fp)."""
    pids = [int(r["probe_id"]) for r in probes_rows]
    plabels = [int(r["probe_label"]) for r in probes_rows]
    pvecs = [list(map(float, r["pvec"])) for r in probes_rows]

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        def quant(v):
            # SQL round(): half away from zero on the exact double
            f = np.floor(v)
            frac = v - f
            up = (frac > 0.5) | ((frac == 0.5) & (v > 0))
            return (f + up).astype(np.int64)

        Qp = quant(np.asarray(pvecs, dtype=np.float64) * 1_000_000.0)
        probe_id_arr = np.asarray(pids, dtype=np.int64)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            vec_col = batch.column(2)
            if vec_col.null_count or batch.column(0).null_count:
                raise ValueError(
                    "probe_topk: NULL vec_id/vec rows are outside the "
                    "embeddings contract"
                )
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            X = (
                vec_col.flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(n, -1)
                .astype(np.float64, copy=False)
            )
            Qx = quant(X * 1_000_000.0)
            out_p, out_idx, out_d = [], [], []
            for j in range(len(pids)):
                diff = Qx - Qp[j]
                d2 = np.einsum("ij,ij->i", diff, diff)
                keep = np.flatnonzero(ids != probe_id_arr[j])
                # k smallest by (dist_fp, vec_id) — lexsort: last key
                # is primary
                order = keep[np.lexsort((ids[keep], d2[keep]))][:k]
                out_p.append(np.full(len(order), pids[j], dtype=np.int64))
                out_idx.append(order)
                out_d.append(d2[order])
            idx = np.concatenate(out_idx)
            take = pa.array(idx, pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_p), pa.int64()),
                    batch.column(0).take(take),
                    batch.column(1).take(take),
                    pa.array(np.concatenate(out_d), pa.int64()),
                ],
                ["probe_id", "vec_id", "label", "dist_fp"],
            )

    partial = emb.select("vec_id", "label", "vec").mapInArrow(
        gen, "probe_id long, vec_id long, label int, dist_fp long"
    )
    plabel_map = F.create_map(
        *[x for pid, pl in zip(pids, plabels) for x in (F.lit(pid), F.lit(pl))]
    )
    return partial.withColumn("probe_label", plabel_map[F.col("probe_id")])


def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-probe retrieval quality: (probe_id, probe_label, n_rel_top10,
    first_rel_rank, ap_num, ap10, rr) where relevance = same label,
    candidates ranked by fixed-point L2 distance (ties by vec_id)."""
    from data_pipeline_platform_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        F.col("vec").alias("pvec"),
    )
    # total relevant per probe label (excluding the probe itself) for
    # the AP@K normalizer min(R, K)
    label_counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_label"))
    # bounded probe panel (N_PROBES rows) — the same rows the former
    # plan broadcast; the scoring runs batch-vectorized (see
    # _probe_topk_partials), the final top-K stays a keyed window
    cand = _probe_topk_partials(emb, probes.collect(), K)
    w = Window.partitionBy("probe_id").orderBy("dist_fp", "vec_id")
    top = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .withColumn("rel", (F.col("label") == F.col("probe_label")).cast("bigint"))
    )
    wh = (
        Window.partitionBy("probe_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hits = top.withColumn("hits", F.sum("rel").over(wh))
    per_probe = hits.groupBy("probe_id", "probe_label").agg(
        F.sum("rel").alias("n_rel_top10"),
        F.min(F.when(F.col("rel") == 1, F.col("rn"))).alias("first_rel_rank"),
        F.sum(
            F.when(F.col("rel") == 1, F.col("hits") * F.expr(f"{LCM_K} DIV rn"))
            .otherwise(0)
        ).alias("ap_num"),
    )
    return (
        per_probe.join(
            F.broadcast(label_counts), per_probe.probe_label == label_counts.label
        )
        .select(
            "probe_id",
            "probe_label",
            F.col("n_rel_top10").cast("bigint").alias("n_rel_top10"),
            F.col("first_rel_rank").cast("bigint").alias("first_rel_rank"),
            F.col("ap_num").cast("bigint").alias("ap_num"),
            (
                F.col("ap_num").cast("double")
                / (F.lit(LCM_K) * F.least(F.col("n_label") - 1, F.lit(K))).cast("double")
            ).alias("ap10"),
            F.coalesce(
                F.lit(1.0) / F.col("first_rel_rank").cast("double"), F.lit(0.0)
            ).alias("rr"),
        )
    )


ORACLE_RETRIEVAL_EVAL = f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), probes AS (
  SELECT vec_id AS probe_id, label AS probe_label, vec AS pvec
  FROM base WHERE vec_id < {N_PROBES}
), label_counts AS (
  SELECT label, COUNT(*) AS n_label FROM base GROUP BY 1
), scored AS (
  SELECT b.vec_id, b.label, p.probe_id, p.probe_label,
         {_duck_dist_fp('b.vec', 'p.pvec')} AS dist_fp
  FROM base b CROSS JOIN probes p
  WHERE b.vec_id <> p.probe_id
), ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY probe_id ORDER BY dist_fp, vec_id) AS rn
  FROM scored
), top AS (
  SELECT *, CASE WHEN label = probe_label THEN 1 ELSE 0 END AS rel
  FROM ranked WHERE rn <= {K}
), hits AS (
  SELECT *, SUM(rel) OVER (PARTITION BY probe_id ORDER BY rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hits
  FROM top
), per_probe AS (
  SELECT probe_id, probe_label,
         CAST(SUM(rel) AS BIGINT) AS n_rel_top10,
         CAST(MIN(CASE WHEN rel = 1 THEN rn END) AS BIGINT) AS first_rel_rank,
         CAST(SUM(CASE WHEN rel = 1 THEN hits * ({LCM_K} // rn) ELSE 0 END) AS BIGINT)
           AS ap_num
  FROM hits GROUP BY 1, 2
)
SELECT p.probe_id, p.probe_label, p.n_rel_top10, p.first_rel_rank, p.ap_num,
       CAST(p.ap_num AS DOUBLE)
         / CAST({LCM_K} * LEAST(lc.n_label - 1, {K}) AS DOUBLE) AS ap10,
       COALESCE(1.0 / CAST(p.first_rel_rank AS DOUBLE), 0.0) AS rr
FROM per_probe p JOIN label_counts lc ON p.probe_label = lc.label
"""


# NDCG@10 discount weights: w_i = round(1e15 / log2(i + 1)), computed
# ONCE here and embedded as the SAME integer literals in both the Spark
# expression and the DuckDB oracle — so no engine ever evaluates log2 at
# query time and libm ulp drift is impossible. idcg prefix m = sum of
# the first m weights (binary relevance: the ideal ranking is all
# relevant docs first).
import math as _math

_NDCG_W = [round(1e15 / _math.log2(i + 1)) for i in range(1, K + 1)]
_NDCG_PREFIX = [sum(_NDCG_W[: m + 1]) for m in range(K)]


def _case_by_rank(var: str, values: list) -> str:
    """CASE <var> WHEN 1 THEN v1 ... END — identical text for both engines."""
    whens = " ".join(f"WHEN {i + 1} THEN CAST({v} AS BIGINT)" for i, v in enumerate(values))
    return f"CASE {var} {whens} END"


def q_ndcg_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per probe for the same label-relevance kNN retrieval as
    ``retrieval_eval``: dcg_num = sum over relevant top-10 hits of the
    scaled integer discount w_rn; idcg_num = prefix sum of the first
    min(R, 10) weights (ideal ranking = all relevant first); ndcg10 is
    ONE final IEEE division. All integer arithmetic until that division
    (max dcg_num = 10 * 1e15 << 2^63), so both engines agree bitwise.

    Scale: identical shape to retrieval_eval — broadcast bounded probe
    panel x ONE corpus scan, per-probe keyed top-10 window
    (WindowGroupLimit), |probes| x 10 eval frame.
    """
    from data_pipeline_platform_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        F.col("vec").alias("pvec"),
    )
    label_counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_label"))
    # same vectorized partial-top-k shape as retrieval_eval
    cand = _probe_topk_partials(emb, probes.collect(), K)
    w = Window.partitionBy("probe_id").orderBy("dist_fp", "vec_id")
    top = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .withColumn("rel", (F.col("label") == F.col("probe_label")).cast("bigint"))
        .withColumn("disc", F.expr(_case_by_rank("rn", _NDCG_W)))
    )
    per_probe = top.groupBy("probe_id", "probe_label").agg(
        F.sum("rel").alias("n_rel_top10"),
        F.sum(F.col("rel") * F.col("disc")).alias("dcg_num"),
    )
    return (
        per_probe.join(
            F.broadcast(label_counts), per_probe.probe_label == label_counts.label
        )
        .withColumn(
            "idcg_num",
            F.expr(_case_by_rank(f"LEAST(n_label - 1, {K})", _NDCG_PREFIX)),
        )
        .select(
            "probe_id",
            "probe_label",
            F.col("n_rel_top10").cast("bigint").alias("n_rel_top10"),
            F.col("dcg_num").cast("bigint").alias("dcg_num"),
            F.col("idcg_num").cast("bigint").alias("idcg_num"),
            (F.col("dcg_num").cast("double") / F.col("idcg_num").cast("double")).alias(
                "ndcg10"
            ),
        )
    )


ORACLE_NDCG_RETRIEVAL = f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), probes AS (
  SELECT vec_id AS probe_id, label AS probe_label, vec AS pvec
  FROM base WHERE vec_id < {{n_probes}}
), label_counts AS (
  SELECT label, COUNT(*) AS n_label FROM base GROUP BY 1
), scored AS (
  SELECT b.vec_id, b.label, p.probe_id, p.probe_label,
         {{dist}} AS dist_fp
  FROM base b CROSS JOIN probes p
  WHERE b.vec_id <> p.probe_id
), ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY probe_id ORDER BY dist_fp, vec_id) AS rn
  FROM scored
), top AS (
  SELECT *, CASE WHEN label = probe_label THEN 1 ELSE 0 END AS rel,
         {{disc_case}} AS disc
  FROM ranked WHERE rn <= {{k}}
), per_probe AS (
  SELECT probe_id, probe_label,
         CAST(SUM(rel) AS BIGINT) AS n_rel_top10,
         CAST(SUM(rel * disc) AS BIGINT) AS dcg_num
  FROM top GROUP BY 1, 2
)
SELECT p.probe_id, p.probe_label, p.n_rel_top10, p.dcg_num,
       CAST({{idcg_case}} AS BIGINT) AS idcg_num,
       CAST(p.dcg_num AS DOUBLE) / CAST({{idcg_case}} AS DOUBLE) AS ndcg10
FROM per_probe p JOIN label_counts lc ON p.probe_label = lc.label
""".format(
    n_probes=N_PROBES,
    k=K,
    dist=_duck_dist_fp("b.vec", "p.pvec"),
    disc_case=_case_by_rank("rn", _NDCG_W),
    idcg_case=_case_by_rank(f"LEAST(lc.n_label - 1, {K})", _NDCG_PREFIX),
)


register("retrieval_eval", q_retrieval_eval, ORACLE_RETRIEVAL_EVAL)
register("ndcg_retrieval", q_ndcg_retrieval, ORACLE_NDCG_RETRIEVAL)
