"""Beyond-reference extension operators (SURVEY.md §2.11 / M8):
dedup, similarity search, text analysis, multimodal plumbing.

Each module registers its queries/oracles here; queries.py merges them
into the driver-facing registry.
"""

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession

EXTENSION_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
EXTENSION_ORACLES: Dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], oracle: str = None):
    EXTENSION_QUERIES[name] = fn
    if oracle is not None:
        EXTENSION_ORACLES[name] = oracle


def _load_all() -> None:
    # a broken module here must fail LOUDLY — swallowing the ImportError
    # would silently drop its queries from the registry and the grading
    # surface without any other symptom
    from data_pipeline_platform_spark.functions import text  # noqa: F401
    from data_pipeline_platform_spark.functions import dedup  # noqa: F401
    from data_pipeline_platform_spark.functions import similarity  # noqa: F401
    from data_pipeline_platform_spark.functions import events  # noqa: F401
    from data_pipeline_platform_spark.functions import corpus  # noqa: F401
    from data_pipeline_platform_spark.functions import multimodal  # noqa: F401
    from data_pipeline_platform_spark.functions import quality  # noqa: F401
    from data_pipeline_platform_spark.functions import repetition  # noqa: F401
    from data_pipeline_platform_spark.functions import bpe  # noqa: F401
    from data_pipeline_platform_spark.functions import spectral  # noqa: F401
    from data_pipeline_platform_spark.functions import sketches  # noqa: F401
    from data_pipeline_platform_spark.functions import substring  # noqa: F401
    from data_pipeline_platform_spark.functions import dsir  # noqa: F401
    from data_pipeline_platform_spark.functions import rfm  # noqa: F401
    from data_pipeline_platform_spark.functions import basket  # noqa: F401
    from data_pipeline_platform_spark.functions import bm25  # noqa: F401
    from data_pipeline_platform_spark.functions import scale  # noqa: F401
    from data_pipeline_platform_spark.functions import graph  # noqa: F401
    from data_pipeline_platform_spark.functions import overlap  # noqa: F401
    from data_pipeline_platform_spark.functions import changepoint  # noqa: F401
    from data_pipeline_platform_spark.functions import vocab  # noqa: F401
    from data_pipeline_platform_spark.functions import mixture  # noqa: F401
    from data_pipeline_platform_spark.functions import pmi  # noqa: F401
    from data_pipeline_platform_spark.functions import regression  # noqa: F401
    from data_pipeline_platform_spark.functions import lake  # noqa: F401
    from data_pipeline_platform_spark.functions import dq  # noqa: F401
    from data_pipeline_platform_spark.functions import scd2  # noqa: F401
    from data_pipeline_platform_spark.functions import privacy  # noqa: F401
    from data_pipeline_platform_spark.functions import linkage  # noqa: F401
    from data_pipeline_platform_spark.functions import coreset  # noqa: F401
    from data_pipeline_platform_spark.functions import mmr  # noqa: F401
    # matview's graded query lives in lake.py (already imported above)
    from data_pipeline_platform_spark.functions import intervals  # noqa: F401
    from data_pipeline_platform_spark.functions import labelnoise  # noqa: F401
    from data_pipeline_platform_spark.functions import augment  # noqa: F401
    from data_pipeline_platform_spark.functions import ranktests  # noqa: F401
    from data_pipeline_platform_spark.functions import retrieval  # noqa: F401
    from data_pipeline_platform_spark.functions import folds  # noqa: F401
    from data_pipeline_platform_spark.functions import vectorize  # noqa: F401
    from data_pipeline_platform_spark.functions import robust  # noqa: F401
    from data_pipeline_platform_spark.functions import ingestq  # noqa: F401
    from data_pipeline_platform_spark.functions import density  # noqa: F401
    from data_pipeline_platform_spark.functions import rake  # noqa: F401
    from data_pipeline_platform_spark.functions import textrank  # noqa: F401
    from data_pipeline_platform_spark.functions import integrity  # noqa: F401
    from data_pipeline_platform_spark.functions import profile  # noqa: F401
    from data_pipeline_platform_spark.functions import rankcorr  # noqa: F401
    from data_pipeline_platform_spark.functions import keyness  # noqa: F401
    from data_pipeline_platform_spark.functions import diverge  # noqa: F401
    from data_pipeline_platform_spark.functions import shift  # noqa: F401
    from data_pipeline_platform_spark.functions import medallion  # noqa: F401
    from data_pipeline_platform_spark.functions import hll  # noqa: F401
    from data_pipeline_platform_spark.functions import dedup_index  # noqa: F401
    from data_pipeline_platform_spark.functions import timeseries  # noqa: F401
    from data_pipeline_platform_spark.functions import pq  # noqa: F401
    from data_pipeline_platform_spark.functions import packing  # noqa: F401
    from data_pipeline_platform_spark.functions import redact  # noqa: F401
    # link_prediction_parts lives in basket.py (already imported above)


_load_all()
