"""Domain mixture reweighting, DoReMi-style (extension; no reference
counterpart — the reference has no corpus ops, see SURVEY.md §2.11).

`doremi_mixture_step` is one Group-DRO reweighting step from DoReMi
(Xie et al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language
Model Pretraining", arXiv:2305.10429): domains whose data is HARDER
than average for a proxy model get upweighted for the next mixture.
Here the domains are the ingest sources and the proxy loss is the
corpus-self-trained unigram LM's per-token negative log-probability
(the same fixed-point ln machinery as `unigram_logprob` /
`bigram_logprob`, so per-domain loss sums are exact BIGINTs).

Two deliberate deviations, both for engine portability:

- the exponentiated-gradient factor exp(eta * excess) is LINEARIZED to
  (1 + eta * excess) — `pow`/`exp` are not bitwise-portable across
  engines (the same reason `temperature_sample` pinned alpha=0.5);
  first-order equal for the small per-step excesses the method sees;
- the re-normalization sum runs over fixed-point BIGINT weights
  (double SUM is order-dependent; 20 domains is already enough to
  drift an ulp under different add orders).

Scale shape: ONE fact-sized shuffle (the token frequency census,
map-side combinable) + the shuffle-free broadcast-scored corpus pass
shared with unigram_logprob; everything after the per-source agg runs
on a |sources|-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.functions.repetition import (
    _DUCK_TOKS,
    _LP_SCALE,
    _TOKS,
)

ETA = 0.1  # EG step size (linearized)
SMOOTH = 0.1  # uniform-mixture smoothing, as in the paper
_W_SCALE = 1_000_000_000_000  # fixed-point for the renormalization sum


def q_doremi_mixture_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One mixture step: (source, n_tokens, loss, excess, weight_old,
    weight_new). weight_old = token share; weight_new = smoothed
    linearized-EG update, summing to 1."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select("source", F.explode(F.expr(_TOKS)).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    total = counts.agg(F.sum("freq").alias("total"))
    # per-source exact loss sums (fixed-point ln, shared with
    # unigram_logprob)
    per_source = (
        tok.join(F.broadcast(counts), "token")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lp_fp",
            F.expr(
                f"CAST(round(ln(CAST(freq AS DOUBLE) / total) * {_LP_SCALE}) AS BIGINT)"
            ),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lp_fp").alias("s_fp"),
        )
    )
    # |sources|-row frame from here on
    glob = per_source.agg(
        F.sum("n_tokens").alias("n_all"), F.sum("s_fp").alias("s_all")
    )
    stepped = (
        per_source.crossJoin(F.broadcast(glob))
        .withColumn(
            "loss",
            F.expr(f"round(-CAST(s_fp AS DOUBLE) / n_tokens / {_LP_SCALE}, 6)"),
        )
        .withColumn(
            "excess",
            F.expr(
                f"round(-CAST(s_fp AS DOUBLE) / n_tokens / {_LP_SCALE} "
                f"+ CAST(s_all AS DOUBLE) / n_all / {_LP_SCALE}, 6)"
            ),
        )
        .withColumn("weight_old", F.expr("round(CAST(n_tokens AS DOUBLE) / n_all, 6)"))
        # linearized EG in fixed point so the normalization sum is exact
        .withColumn(
            "unnorm_fp",
            F.expr(
                f"CAST(round((CAST(n_tokens AS DOUBLE) / n_all) * (1 + {ETA} * "
                f"round(-CAST(s_fp AS DOUBLE) / n_tokens / {_LP_SCALE} "
                f"+ CAST(s_all AS DOUBLE) / n_all / {_LP_SCALE}, 6)) "
                f"* {_W_SCALE}) AS BIGINT)"
            ),
        )
    )
    norm = stepped.agg(F.sum("unnorm_fp").alias("z_fp"))
    k = stepped.agg(F.count(F.lit(1)).alias("k"))
    return (
        stepped.crossJoin(F.broadcast(norm))
        .crossJoin(F.broadcast(k))
        .select(
            "source",
            "n_tokens",
            "loss",
            "excess",
            "weight_old",
            F.expr(
                f"round((1 - {SMOOTH}) * CAST(unnorm_fp AS DOUBLE) / z_fp "
                f"+ {SMOOTH} / CAST(k AS DOUBLE), 6)"
            ).alias("weight_new"),
        )
    )


ORACLE_DOREMI_MIXTURE_STEP = f"""
WITH t AS (
  SELECT source, unnest({_DUCK_TOKS}) AS token FROM documents
), c AS (
  SELECT token, COUNT(*) AS freq FROM t GROUP BY token
), tot AS (SELECT SUM(freq) AS total FROM c),
per_source AS (
  SELECT source, COUNT(*) AS n_tokens,
         SUM(CAST(round(ln(CAST(freq AS DOUBLE) / total) * {_LP_SCALE}) AS BIGINT))
           AS s_fp
  FROM t JOIN c USING (token) CROSS JOIN tot
  GROUP BY source
), tots AS (
  SELECT SUM(n_tokens) AS n_all, SUM(s_fp) AS s_all FROM per_source
), stepped AS (
  SELECT source, n_tokens,
         round(-CAST(s_fp AS DOUBLE) / n_tokens / {_LP_SCALE}, 6) AS loss,
         round(-CAST(s_fp AS DOUBLE) / n_tokens / {_LP_SCALE}
               + CAST(s_all AS DOUBLE) / n_all / {_LP_SCALE}, 6) AS excess,
         round(CAST(n_tokens AS DOUBLE) / n_all, 6) AS weight_old,
         CAST(round((CAST(n_tokens AS DOUBLE) / n_all) * (1 + {ETA} *
           round(-CAST(s_fp AS DOUBLE) / n_tokens / {_LP_SCALE}
                 + CAST(s_all AS DOUBLE) / n_all / {_LP_SCALE}, 6))
           * {_W_SCALE}) AS BIGINT) AS unnorm_fp
  FROM per_source CROSS JOIN tots
), norm AS (
  SELECT SUM(unnorm_fp) AS z_fp, COUNT(*) AS k FROM stepped
)
SELECT source, n_tokens, loss, excess, weight_old,
       round((1 - {SMOOTH}) * CAST(unnorm_fp AS DOUBLE) / z_fp
             + {SMOOTH} / CAST(k AS DOUBLE), 6) AS weight_new
FROM stepped CROSS JOIN norm
"""

register("doremi_mixture_step", q_doremi_mixture_step, ORACLE_DOREMI_MIXTURE_STEP)


def q_corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source corpus-health dashboard as ONE frame — the r6
    observability flagship, composing three verified building blocks:

    - `gopher_quality_filter` -> per-source gate pass rate,
    - `source_overlap`        -> worst mirror (max estimated Jaccard
                                 against any other source),
    - `doremi_mixture_step`   -> proxy loss and the next mixture
                                 weight.

    Everything reduces to |sources|-row frames before the final joins,
    so the report costs what its inputs cost (each of which is
    independently graded); the oracle nests those operators' SQL texts
    verbatim (shared-fragment discipline, DETERMINISM.md #9)."""
    from data_pipeline_platform_spark.functions.repetition import (
        q_gopher_quality_filter,
    )
    from data_pipeline_platform_spark.functions.overlap import q_source_overlap
    from data_pipeline_platform_spark.sources.readers import load_table

    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    gate = (
        q_gopher_quality_filter(spark, sf_dir)
        .join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("int")).alias("n_pass"),
        )
        .select(
            "source",
            "n_docs",
            F.expr("round(CAST(n_pass AS DOUBLE) / n_docs, 6)").alias(
                "gate_pass_rate"
            ),
        )
    )
    so = q_source_overlap(spark, sf_dir)
    mirror = (
        so.select(F.col("source_a").alias("source"), "jaccard_est")
        .unionByName(so.select(F.col("source_b").alias("source"), "jaccard_est"))
        .groupBy("source")
        .agg(F.max("jaccard_est").alias("max_source_overlap"))
    )
    dm = q_doremi_mixture_step(spark, sf_dir).select(
        "source", "n_tokens", "loss", "weight_old", "weight_new"
    )
    return (
        gate.join(mirror, "source")
        .join(dm, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "gate_pass_rate",
            "max_source_overlap",
            "loss",
            "weight_old",
            "weight_new",
        )
    )


def _oracle_corpus_health() -> str:
    from data_pipeline_platform_spark.functions.overlap import ORACLE_SOURCE_OVERLAP
    from data_pipeline_platform_spark.functions.repetition import (
        ORACLE_GOPHER_QUALITY_FILTER,
    )

    return f"""
WITH so AS MATERIALIZED ({ORACLE_SOURCE_OVERLAP}),
dm AS MATERIALIZED ({ORACLE_DOREMI_MIXTURE_STEP}),
gsel AS MATERIALIZED ({ORACLE_GOPHER_QUALITY_FILTER}),
gate AS (
  SELECT d.source, COUNT(*) AS n_docs,
         round(CAST(SUM(CAST(g.keep AS INT)) AS DOUBLE) / COUNT(*), 6)
           AS gate_pass_rate
  FROM gsel g JOIN documents d USING (doc_id)
  GROUP BY 1
), mirror AS (
  SELECT source, MAX(jaccard_est) AS max_source_overlap FROM (
    SELECT source_a AS source, jaccard_est FROM so
    UNION ALL
    SELECT source_b, jaccard_est FROM so
  ) GROUP BY 1
)
SELECT g.source, g.n_docs, dm.n_tokens, g.gate_pass_rate,
       m.max_source_overlap, dm.loss, dm.weight_old, dm.weight_new
FROM gate g
JOIN mirror m ON m.source = g.source
JOIN dm ON dm.source = g.source
"""


ORACLE_CORPUS_HEALTH_REPORT = _oracle_corpus_health()

register("corpus_health_report", q_corpus_health_report, ORACLE_CORPUS_HEALTH_REPORT)
