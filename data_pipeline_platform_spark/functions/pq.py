"""Product quantization (PQ) for embedding search — the FAISS
IVFADC codec (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011) rebuilt on the repo's deterministic
quantizer recipe so the ENTIRE pipeline (sub-quantizer training,
encoding, asymmetric-distance search) replays bitwise in the DuckDB
oracle — the same upgrade cosine_topk_ivf_exact made for IVF.

Why PQ at 100 TB: a 64-dim float64 vector is 512 bytes; its PQ code is
M=8 sub-codes of 4 bits = 8 small ints (~8 bytes stored, 4 bytes
packed) — a ~64-128x scan-size reduction. Candidate generation then
reads ONLY the code table (tiny) plus one M x Ks distance table per
query (M*Ks = 128 numbers, broadcast), never the raw vectors; exact
re-ranking touches just the top candidates. Composed with the IVF
inverted file (cells from ivfx_train, codes within cells) this is the
standard billion-scale ANN serving layout.

Determinism: sub-quantizer seeds are content-addressed (the 16 rows
with smallest md5(vec_id) — the SAME seed rows for every block);
training assignment and encoding use the fixed-point L2 distance
(similarity.FP_SCALE micro-quantization, exact BIGINT arithmetic,
seed/cell-id tie-breaks); centroid recompute is the fixed-point BIGINT
component mean (accumulation-order-free); the ADC score is an exact
BIGINT sum of per-block BIGINT table entries. The only doubles are the
final cosine re-rank (round 6, the family convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.functions.similarity import (
    _as_double,
    _dist_fp_sql,
    _dot,
    _duck_dist_fp,
    _emb,
)
from data_pipeline_platform_spark.utils.cache import tracked_persist

PQ_M = 8        # sub-vector blocks
PQ_SUBDIM = 8   # dims per block (PQ_M * PQ_SUBDIM = 64, the table dim)
PQ_KS = 16      # centroids per sub-quantizer (4-bit codes)
PQ_CAND = 50    # ADC candidates re-ranked exactly
PQ_K = 10


def _subvectors(df: DataFrame, vec_col: str = "vec") -> DataFrame:
    """(id cols..., block, svec): the M-way split of each vector."""
    return df.select(
        *[c for c in df.columns if c != vec_col],
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {PQ_M - 1}), "
                f"b -> slice({vec_col}, b * {PQ_SUBDIM} + 1, {PQ_SUBDIM}))"
            )
        ).alias("block", "svec"),
    )


def pq_train(emb: DataFrame) -> DataFrame:
    """Train the M sub-quantizers: content-addressed seed rows (shared
    across blocks), one fixed-point Lloyd refinement per block.
    Returns the (block, cell, cvec) sub-centroid frame
    (M x Ks = 128 rows, tracked-persisted — broadcast-sized at any
    corpus size)."""
    seeds = (
        emb.withColumn("__h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__h", "vec_id")
        .limit(PQ_KS)
        .withColumn(
            "seed_id", F.row_number().over(Window.orderBy("__h", "vec_id"))
        )
        .select("seed_id", "vec")
    )
    seed_sub = _subvectors(seeds).select(
        "seed_id", "block", F.col("svec").alias("ssub")
    )
    sub = _subvectors(emb.select("vec_id", "vec"))
    # argmin as a partial-aggregable min over struct(dist, seed_id,
    # svec) — identical winner to the former row_number window ((dist,
    # seed_id) is unique per (vec_id, block) and svec is functionally
    # determined by the group), with map-side combine collapsing the
    # Ks candidates per sub-vector before the shuffle instead of
    # sorting corpus x M x Ks sub-vector rows through a window
    # exchange (r14; the pq_encode posture applied to training)
    a0 = (
        sub.join(F.broadcast(seed_sub), "block")
        .withColumn("dist", F.expr(_dist_fp_sql("svec", "ssub")))
        .groupBy("vec_id", "block")
        .agg(F.min(F.struct("dist", "seed_id", "svec")).alias("__w"))
        .select(
            "block",
            F.col("__w.svec").alias("svec"),
            F.col("__w.seed_id").alias("cell0"),
        )
    )
    ex = a0.select("block", "cell0", F.posexplode("svec").alias("dim", "comp"))
    cents = ex.groupBy("block", "cell0", "dim").agg(
        (
            F.sum(F.expr("CAST(round(comp * 1000000000) AS BIGINT)")).cast(
                "double"
            )
            / F.count(F.lit(1))
            / F.lit(1000000000.0)
        ).alias("c")
    )
    return tracked_persist(
        cents.groupBy("block", "cell0")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select(
            "block",
            F.col("cell0").alias("cell"),
            F.expr("transform(dc, x -> x.c)").alias("cvec"),
        )
    )


def pq_encode(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, block, code): each sub-vector's nearest sub-centroid —
    the stored representation (M small ints per vector).

    The argmin is a partial-aggregable min over (dist, cell) — struct
    ordering IS the (dist asc, cell asc) tie-break — so the map side
    combines the Ks candidate rows per (vec, block) down to one before
    the shuffle, instead of shuffling corpus x M x Ks rows into a
    row_number window sort."""
    sub = _subvectors(emb.select("vec_id", "vec"))
    return (
        sub.join(F.broadcast(cents), "block")
        .withColumn("dist", F.expr(_dist_fp_sql("svec", "cvec")))
        .groupBy("vec_id", "block")
        .agg(F.min(F.struct("dist", "cell")).alias("__w"))
        .select("vec_id", "block", F.col("__w.cell").alias("code"))
    )


def pq_adc_candidates(
    codes: DataFrame, cents: DataFrame, qsub: DataFrame, n_cand: int = PQ_CAND
) -> DataFrame:
    """Asymmetric-distance candidates: ONE M x Ks distance table from
    the query's sub-vectors (broadcast), summed per vec_id over the
    code table — the scan never touches a raw vector."""
    dtable = (
        cents.join(F.broadcast(qsub), "block")
        .withColumn("d", F.expr(_dist_fp_sql("cvec", "qsub")))
        .select("block", F.col("cell").alias("code"), "d")
    )
    return (
        codes.join(F.broadcast(dtable), ["block", "code"])
        .groupBy("vec_id")
        .agg(F.sum("d").alias("adc"))
        .orderBy("adc", "vec_id")
        .limit(n_cand)
    )


def q_cosine_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN search end to end: train sub-quantizers, encode the
    corpus to 8x4-bit codes, rank by exact-integer asymmetric distance
    to the query's 128-entry table, re-rank the top candidates by exact
    cosine. The oracle replays training, encoding, ADC and re-rank in
    SQL — bitwise-graded, not recall-graded (a separate unit test pins
    recall vs the exact scan)."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    vecs = tracked_persist(emb)
    cents = pq_train(vecs.select("vec_id", "vec"))
    codes = pq_encode(vecs.select("vec_id", "vec"), cents)
    qsub = _subvectors(
        vecs.filter(F.col("vec_id") == 0).select("vec")
    ).select("block", F.col("svec").alias("qsub"))
    cand = pq_adc_candidates(
        codes.filter(F.col("vec_id") != 0), cents, qsub
    )
    q = vecs.filter(F.col("vec_id") == 0).select(F.col("vec").alias("qvec"))
    return (
        vecs.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(q))
        .withColumn(
            "cosine",
            _dot("vec", "qvec")
            / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("qvec", "qvec"))),
        )
        .select("vec_id", "label", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(PQ_K)
    )


_DUCK_SUB = (
    f"SELECT vec_id, b AS block, "
    f"list_slice(vec, b * {PQ_SUBDIM} + 1, b * {PQ_SUBDIM} + {PQ_SUBDIM}) AS svec "
    "FROM {src}, LATERAL (SELECT unnest(generate_series(0, "
    f"{PQ_M - 1})) AS b)"
)

ORACLE_COSINE_TOPK_PQ = f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), seeds AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) AS seed_id, vec
  FROM (SELECT vec_id, vec, md5(CAST(vec_id AS VARCHAR)) AS h
        FROM base ORDER BY h, vec_id LIMIT {PQ_KS})
), seed_sub AS (
  SELECT seed_id, b AS block,
         list_slice(vec, b * {PQ_SUBDIM} + 1, b * {PQ_SUBDIM} + {PQ_SUBDIM}) AS ssub
  FROM seeds, LATERAL (SELECT unnest(generate_series(0, {PQ_M - 1})) AS b)
), sub AS (
  {_DUCK_SUB.format(src='base')}
), a0 AS (
  SELECT block, svec, seed_id AS cell0 FROM (
    SELECT s.block, s.svec, ss.seed_id,
           row_number() OVER (PARTITION BY s.vec_id, s.block
             ORDER BY {_duck_dist_fp('s.svec', 'ss.ssub')}, ss.seed_id) AS rn
    FROM sub s JOIN seed_sub ss USING (block)
  ) WHERE rn = 1
), ex AS (
  SELECT block, cell0, i - 1 AS dim, svec[i] AS comp
  FROM a0, LATERAL (SELECT unnest(generate_series(1, len(svec))) AS i)
), cents AS (
  SELECT block, cell0, dim,
         CAST(SUM(CAST(round(comp * 1000000000) AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 1000000000.0 AS c
  FROM ex GROUP BY block, cell0, dim
), carr AS (
  SELECT block, cell0 AS cell, list(c ORDER BY dim) AS cvec
  FROM cents GROUP BY block, cell0
), codes AS (
  SELECT vec_id, block, cell AS code FROM (
    SELECT s.vec_id, s.block, ca.cell,
           row_number() OVER (PARTITION BY s.vec_id, s.block
             ORDER BY {_duck_dist_fp('s.svec', 'ca.cvec')}, ca.cell) AS rn
    FROM sub s JOIN carr ca USING (block)
  ) WHERE rn = 1
), qsub AS (
  SELECT block, svec AS qs FROM sub WHERE vec_id = 0
), dtable AS (
  SELECT ca.block, ca.cell AS code,
         {_duck_dist_fp('ca.cvec', 'q.qs')} AS d
  FROM carr ca JOIN qsub q USING (block)
), cand AS (
  SELECT c.vec_id, SUM(dt.d) AS adc
  FROM codes c JOIN dtable dt USING (block, code)
  WHERE c.vec_id != 0
  GROUP BY c.vec_id
  ORDER BY adc, c.vec_id LIMIT {PQ_CAND}
), q AS (
  SELECT vec AS qvec FROM base WHERE vec_id = 0
), scored AS (
  SELECT b.vec_id, b.label,
         round(
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_zip(b.vec, q.qvec), p -> p[1] * p[2])),
             (acc, t) -> acc + t)
           / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(b.vec, x -> x * x)), (acc, t) -> acc + t))
              * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(q.qvec, x -> x * x)), (acc, t) -> acc + t))),
           6) AS cosine
  FROM base b JOIN cand USING (vec_id) CROSS JOIN q
)
SELECT vec_id, label, cosine FROM scored
ORDER BY cosine DESC, vec_id LIMIT {PQ_K}
"""

register("cosine_topk_pq", q_cosine_topk_pq, ORACLE_COSINE_TOPK_PQ)


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the full billion-scale ANN serving layout (FAISS
    IndexIVFPQ): the deterministic IVF quantizer partitions the corpus
    into cells, PQ encodes each vector's RESIDUAL against its cell
    centroid (residual PQ — the codebook spends its bits on the
    within-cell structure instead of re-encoding the cell location),
    and the search probes the nprobe nearest cells, building one
    per-probed-cell ADC table from the QUERY residual, summing exact
    BIGINT entries over the code table, then exact-cosine re-ranking a
    fixed candidate budget.

    100 TB shape: the raw vectors are touched only at (a) index build
    and (b) the final re-rank of PQ_CAND rows; candidate generation
    reads the code table (M bytes/vector) restricted to nprobe/n_cells
    of the corpus, scored against nprobe x M x Ks broadcast table
    entries. Every stage is the deterministic fixed-point machinery, so
    the DuckDB oracle replays the WHOLE index + search bitwise."""
    from data_pipeline_platform_spark.functions.similarity import (
        IVFX_PROBE,
        ivfx_index,
    )

    cent_arr, ivf = ivfx_index(spark, sf_dir)  # (cell, cvec), assigned corpus
    # residuals against the OWN cell centroid (exact IEEE subtraction —
    # both engines compute the identical doubles)
    resid = tracked_persist(
        ivf.join(F.broadcast(cent_arr), "cell").select(
            "vec_id",
            "label",
            "cell",
            F.expr("zip_with(vec, cvec, (x, y) -> x - y)").alias("rvec"),
            "vec",
        )
    )
    cents = pq_train(
        resid.select("vec_id", F.col("rvec").alias("vec"))
    )
    codes = pq_encode(
        resid.select("vec_id", F.col("rvec").alias("vec")), cents
    ).join(resid.select("vec_id", "cell"), "vec_id")
    # probe: nprobe cells nearest the query vector
    q_row = resid.filter(F.col("vec_id") == 0)
    q = q_row.select(F.col("vec").alias("qvec"))
    probed = (
        cent_arr.crossJoin(F.broadcast(q))
        .withColumn("qdist", F.expr(_dist_fp_sql("cvec", "qvec")))
        .withColumn(
            "__pn", F.row_number().over(Window.orderBy("qdist", "cell"))
        )
        .filter(F.col("__pn") <= IVFX_PROBE)
        .select("cell", "cvec")
    )
    # per-probed-cell query residual -> one ADC table per cell
    q_resid_sub = _subvectors(
        probed.crossJoin(F.broadcast(q)).select(
            "cell", F.expr("zip_with(qvec, cvec, (x, y) -> x - y)").alias("vec")
        ),
        vec_col="vec",
    ).select("cell", "block", F.col("svec").alias("qsub"))
    dtable = (
        cents.withColumnRenamed("cell", "code")
        .join(F.broadcast(q_resid_sub), "block")
        .withColumn("d", F.expr(_dist_fp_sql("cvec", "qsub")))
        .select("cell", "block", "code", "d")
    )
    cand = (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(dtable), ["cell", "block", "code"])
        .groupBy("vec_id")
        .agg(F.sum("d").alias("adc"))
        .orderBy("adc", "vec_id")
        .limit(PQ_CAND)
    )
    return (
        resid.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(q))
        .withColumn(
            "cosine",
            _dot("vec", "qvec")
            / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("qvec", "qvec"))),
        )
        .select("vec_id", "label", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(PQ_K)
    )


def oracle_ivfpq_sql(
    index_sql: str = None,
    pq_seed_where: str = "",
    pq_train_where: str = "",
) -> str:
    """DuckDB SQL replaying residual-PQ-over-IVF end to end.
    ``index_sql``: an open-ended CTE chain defining base/carr/ivf
    (defaults to the shared full-corpus DUCK_IVFX_INDEX; the persisted
    incremental twin passes its train-on-subset variant).
    ``pq_seed_where`` / ``pq_train_where``: optional WHERE clauses
    restricting the sub-quantizer's seed pool and training rows (the
    add-after-train contract: PQ fits on the BASE batch only)."""
    from data_pipeline_platform_spark.functions.similarity import (
        DUCK_IVFX_INDEX,
        IVFX_PROBE,
    )

    if index_sql is None:
        index_sql = DUCK_IVFX_INDEX
    lat = f"LATERAL (SELECT unnest(generate_series(0, {PQ_M - 1})) AS b)"

    def sl(col):
        return (
            f"list_slice({col}, b * {PQ_SUBDIM} + 1, "
            f"b * {PQ_SUBDIM} + {PQ_SUBDIM})"
        )

    return f"""
{index_sql}
), resid AS (
  SELECT i.vec_id, i.label, i.cell,
         list_transform(list_zip(i.vec, ca.cvec), z -> z[1] - z[2]) AS rvec,
         i.vec
  FROM ivf i JOIN carr ca USING (cell)
), pseeds AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) AS seed_id, rvec
  FROM (SELECT vec_id, rvec, md5(CAST(vec_id AS VARCHAR)) AS h
        FROM resid {pq_seed_where} ORDER BY h, vec_id LIMIT {PQ_KS})
), pseed_sub AS (
  SELECT seed_id, b AS block, {sl('rvec')} AS ssub FROM pseeds, {lat}
), psub AS (
  SELECT vec_id, b AS block, {sl('rvec')} AS svec FROM resid, {lat}
), pa0 AS (
  SELECT block, svec, seed_id AS cell0 FROM (
    SELECT s.block, s.svec, ss.seed_id,
           row_number() OVER (PARTITION BY s.vec_id, s.block
             ORDER BY {_duck_dist_fp('s.svec', 'ss.ssub')}, ss.seed_id) AS rn
    FROM psub s JOIN pseed_sub ss USING (block) {pq_train_where}
  ) WHERE rn = 1
), pex AS (
  SELECT block, cell0, i - 1 AS dim, svec[i] AS comp
  FROM pa0, LATERAL (SELECT unnest(generate_series(1, len(svec))) AS i)
), pcents AS (
  SELECT block, cell0, dim,
         CAST(SUM(CAST(round(comp * 1000000000) AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 1000000000.0 AS c
  FROM pex GROUP BY block, cell0, dim
), pcarr AS (
  SELECT block, cell0 AS pcell, list(c ORDER BY dim) AS pcvec
  FROM pcents GROUP BY block, cell0
), pcodes AS (
  SELECT vec_id, block, pcell AS code FROM (
    SELECT s.vec_id, s.block, pc.pcell,
           row_number() OVER (PARTITION BY s.vec_id, s.block
             ORDER BY {_duck_dist_fp('s.svec', 'pc.pcvec')}, pc.pcell) AS rn
    FROM psub s JOIN pcarr pc USING (block)
  ) WHERE rn = 1
), codes_cells AS (
  SELECT pc.vec_id, r.cell, pc.block, pc.code
  FROM pcodes pc JOIN resid r USING (vec_id)
), q AS (
  SELECT vec AS qvec FROM resid WHERE vec_id = 0
), probed AS (
  SELECT cell, cvec FROM (
    SELECT ca.cell, ca.cvec,
           row_number() OVER (
             ORDER BY {_duck_dist_fp('ca.cvec', 'q.qvec')}, ca.cell) AS pn
    FROM carr ca CROSS JOIN q
  ) WHERE pn <= {IVFX_PROBE}
), qrsub AS (
  SELECT pr.cell, b AS block,
         {sl("list_transform(list_zip(q.qvec, pr.cvec), z -> z[1] - z[2])")}
           AS qsub
  FROM probed pr CROSS JOIN q, {lat}
), dtable AS (
  SELECT qr.cell, qr.block, pca.pcell AS code,
         {_duck_dist_fp('pca.pcvec', 'qr.qsub')} AS d
  FROM pcarr pca JOIN qrsub qr USING (block)
), cand AS (
  SELECT cc.vec_id, SUM(dt.d) AS adc
  FROM codes_cells cc JOIN dtable dt USING (cell, block, code)
  WHERE cc.vec_id != 0
  GROUP BY cc.vec_id
  ORDER BY adc, cc.vec_id LIMIT {PQ_CAND}
), scored AS (
  SELECT r.vec_id, r.label,
         round(
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_zip(r.vec, q.qvec), z -> z[1] * z[2])),
             (acc, t) -> acc + t)
           / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(r.vec, x -> x * x)), (acc, t) -> acc + t))
              * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(q.qvec, x -> x * x)), (acc, t) -> acc + t))),
           6) AS cosine
  FROM resid r JOIN cand USING (vec_id) CROSS JOIN q
)
SELECT vec_id, label, cosine FROM scored
ORDER BY cosine DESC, vec_id LIMIT {PQ_K}
"""


ORACLE_ANN_IVFPQ_TOPK = oracle_ivfpq_sql()

register("ann_ivfpq_topk", q_ann_ivfpq_topk, ORACLE_ANN_IVFPQ_TOPK)
