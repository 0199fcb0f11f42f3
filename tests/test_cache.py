"""Tracked DataFrame caching (utils/cache.py): operators persist
intermediates, long-lived callers release them after materializing."""

from pyspark.sql import functions as F

from data_pipeline_platform_spark.utils.cache import (
    release_tracked,
    tracked_count,
    tracked_persist,
)


def test_tracked_persist_registers_and_releases(spark):
    release_tracked()  # clean slate
    df = tracked_persist(spark.range(100).withColumn("x", F.col("id") * 2))
    assert tracked_count() == 1
    assert df.count() == 100  # materialize -> cache populated
    assert df.storageLevel.useMemory
    released = release_tracked()
    assert released == 1
    assert tracked_count() == 0
    assert not df.storageLevel.useMemory


def test_release_is_idempotent_and_safe(spark):
    release_tracked()
    assert release_tracked() == 0
    a = tracked_persist(spark.range(10))
    b = tracked_persist(spark.range(20))
    a.count(), b.count()
    assert release_tracked() == 2
    # frames remain usable (recompute) after release
    assert a.count() == 10 and b.count() == 20


def test_operator_caches_are_released_after_query(spark):
    """The dedup/similarity operators register their internal persists;
    a caller that materializes then releases must leave nothing cached."""
    from data_pipeline_platform_spark.functions.dedup import q_dedup_minhash_lsh

    release_tracked()
    df = q_dedup_minhash_lsh(spark, "/root/testdata/sf0.001")
    df.count()
    assert tracked_count() >= 1
    release_tracked()
    assert tracked_count() == 0
