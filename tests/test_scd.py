"""SCD Type-2 dimension maintenance (sinks/scd.py) over the ACID lake
layer: open/close bookkeeping, unchanged-presence no-ops, late-arriving
keys, as-of reconstruction, validation, and merge file pruning."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.scd import Scd2Table


@pytest.fixture()
def dim(spark, tmp_path):
    return Scd2Table(spark, str(tmp_path / "dim"), keys=["k"], tracked=["seg"])


def _b(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string")


def _rows(df):
    return sorted(
        (r["k"], r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    )


def test_open_close_lifecycle(spark, dim):
    out1 = dim.apply(_b(spark, [(1, "a"), (2, "b")]), batch_id=1)
    assert out1 == {"opened": 2, "closed": 0, "files_rewritten": 0}
    # 1 changes, 2 present-but-unchanged (no-op), 3 is new
    out2 = dim.apply(_b(spark, [(1, "a2"), (2, "b"), (3, "c")]), batch_id=2)
    assert out2["opened"] == 2 and out2["closed"] == 1
    assert _rows(dim.read()) == [
        (1, "a", 1, 2, False),
        (1, "a2", 2, None, True),
        (2, "b", 1, None, True),
        (3, "c", 2, None, True),
    ]


def test_absent_key_stays_current_and_as_of(spark, dim):
    dim.apply(_b(spark, [(1, "a"), (2, "b")]), batch_id=1)
    dim.apply(_b(spark, [(1, "a2")]), batch_id=5)  # 2 absent -> untouched
    cur = {(r["k"], r["seg"]) for r in dim.current().collect()}
    assert cur == {(1, "a2"), (2, "b")}
    # as_of reconstructs any past state from the final table alone
    past = {(r["k"], r["seg"]) for r in dim.as_of(1).collect()}
    assert past == {(1, "a"), (2, "b")}
    assert {(r["k"], r["seg"]) for r in dim.as_of(5).collect()} == cur


def test_null_safe_change_detection(spark, dim):
    dim.apply(_b(spark, [(1, None)]), batch_id=1)
    # NULL -> NULL is NOT a change
    out = dim.apply(_b(spark, [(1, None)]), batch_id=2)
    assert out == {"opened": 0, "closed": 0, "files_rewritten": 0}
    # NULL -> value IS a change
    out = dim.apply(_b(spark, [(1, "x")]), batch_id=3)
    assert out["opened"] == 1 and out["closed"] == 1


def test_duplicate_batch_keys_raise(spark, dim):
    # r14: the guard is in-plan (window count + raise_error filter, the
    # AcidTable.changes() posture) — the error surfaces when apply()'s
    # first action materializes the batch, wrapped in Spark's runtime
    # exception chain, still BEFORE anything commits
    with pytest.raises(Exception, match="duplicate business keys"):
        dim.apply(_b(spark, [(1, "a"), (1, "b")]), batch_id=1)
    assert not dim.acid.exists()  # refused loudly, nothing committed


def test_non_monotone_batch_id_raises(spark, dim):
    dim.apply(_b(spark, [(1, "a")]), batch_id=3)
    with pytest.raises(ValueError, match="not after last applied"):
        dim.apply(_b(spark, [(1, "b")]), batch_id=3)


def test_key_tracked_overlap_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="both key and tracked"):
        Scd2Table(spark, str(tmp_path / "x"), keys=["k"], tracked=["k"])


def test_merge_prunes_untouched_files(spark, tmp_path):
    dim = Scd2Table(spark, str(tmp_path / "dim"), keys=["k"], tracked=["seg"])
    base = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.concat(F.lit("s"), F.col("id") % 5).alias("seg")
    )
    # write the initial load as several key-ranged files so a narrow
    # update has files to skip
    dim.apply(base.repartitionByRange(8, "k"), batch_id=1)
    out = dim.apply(_b(spark, [(3, "changed")]), batch_id=2)
    assert out["opened"] == 1 and out["closed"] == 1
    # only the file(s) holding k=3 were rewritten
    assert out["files_rewritten"] <= 2
    assert _rows(dim.read().filter(F.col("k") == 3)) == [
        (3, "changed", 2, None, True),
        (3, "s3", 1, 2, False),
    ]
    assert dim.read().count() == 1001
