"""Secondary key index (sinks/keyindex.py): exact file pruning on a
non-clustered column, stale detection, incremental refresh deltas, and
deletion-vector interaction."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable
from data_pipeline_platform_spark.sinks.keyindex import KeyIndex, StaleIndexError


@pytest.fixture()
def setup(spark, tmp_path):
    table = AcidTable(spark, str(tmp_path / "data"))
    # cluster by k so the probe column v interleaves across every file
    df = spark.range(1, 201).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("v")
    )
    table.write(
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
        stats_cols=["k"], binpack=False,
    )
    index = KeyIndex(table, "v", str(tmp_path / "idx"))
    index.build()
    return table, index


def test_lookup_and_range(spark, setup):
    table, index = setup
    got = {r["k"] for r in index.lookup([3]).collect()}
    assert got == {k for k in range(1, 201) if k % 10 == 3}
    rng = {r["k"] for r in index.lookup_range(7, 8).collect()}
    assert rng == {k for k in range(1, 201) if k % 10 in (7, 8)}


def test_index_prunes_files(spark, setup):
    table, index = setup
    # plant a value that lives in exactly one file: k=1..50 is file 1
    # under the range clustering; v = k % 10 spreads everywhere, so use
    # a merge to give ONE row a unique marker value
    src = spark.createDataFrame([(17, 999)], "k long, v long")
    table.merge(src, keys=["k"])
    index.refresh()
    hit = index.acid.read().filter("k = 999").select("file").distinct()
    assert hit.count() == 1  # exactly one data file named
    assert {r["k"] for r in index.lookup([999]).collect()} == {17}


def test_stale_detection_and_auto_refresh(spark, setup):
    table, index = setup
    table.merge(
        spark.createDataFrame([(5, 555)], "k long, v long"), keys=["k"]
    )
    with pytest.raises(StaleIndexError):
        index.lookup([555])
    got = {r["k"] for r in index.lookup([555], auto_refresh=True).collect()}
    assert got == {5}
    assert index.indexed_version() == table.latest_version()


def test_refresh_is_incremental(spark, setup):
    table, index = setup
    table.merge(
        spark.createDataFrame([(42, 777)], "k long, v long"), keys=["k"]
    )
    out = index.refresh()
    # the merge rewrote one file: one departed, its rewrite(s) added
    assert out["files_removed"] == 1
    assert out["files_added"] >= 1
    # no-op refresh after a constraint-only commit just re-marks
    table.add_constraint("v_nonneg", "v >= 0")
    out2 = index.refresh()
    assert out2 == {"files_added": 0, "files_removed": 0} or out2[
        "files_added"
    ] == 0
    assert index.indexed_version() == table.latest_version()


def test_dv_delete_keeps_index_valid(spark, setup):
    table, index = setup
    # merge-on-read delete: same files, new sidecar — the index stays
    # file-level valid; the residual DV-aware scan drops the dead rows
    table.delete("k = 13", mode="dv")
    out = index.refresh()
    assert out["files_added"] == 0 and out["files_removed"] == 0
    got = {r["k"] for r in index.lookup([3]).collect()}
    assert got == {k for k in range(1, 201) if k % 10 == 3 and k != 13}
