"""Deletion vectors (sinks/acid.py merge-on-read deletes — the Delta
DV / Iceberg position-delete shape): a selective DELETE publishes a
position sidecar and re-adds the SAME data file instead of rewriting
it. Invariants: data files stay byte-identical, reads/CDF/merge/
point-lookup subtract the positions, rewrites purge DVs, restore/
vacuum/fsck treat (path, dv) as the file-version identity, and the
change-feed consumer folds a DV delete instead of skipping it as
metadata-only."""

import json
import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable


@pytest.fixture()
def table(spark, tmp_path):
    return AcidTable(spark, str(tmp_path / "t"))


def _base(spark, table, n=100, files=4):
    df = spark.range(1, n + 1).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    table.write(df.repartition(files, "k"), stats_cols=["k"], binpack=False)
    return {
        a["path"]: (os.path.getsize(a["path"]), os.path.getmtime(a["path"]))
        for a in table.snapshot_files()
    }


def test_dv_delete_leaves_data_files_byte_identical(spark, table):
    sig = _base(spark, table)
    out = table.delete("k % 10 = 3", mode="dv")
    assert out["files_rewritten"] == 0 and out["files_dropped"] == 0
    assert out["files_dv"] >= 1
    # same physical files, untouched bytes — only sidecars were written
    actions = {a["path"]: a for a in table.snapshot_files()}
    assert set(actions) == set(sig)
    for p, (size, mtime) in sig.items():
        assert os.path.getsize(p) == size and os.path.getmtime(p) == mtime
    assert table.read().count() == 90
    assert table.read().filter("k % 10 = 3").count() == 0
    # rows field stays EXACT per action
    assert sum(a["rows"] for a in actions.values()) == 90
    for a in actions.values():
        if a.get("dv"):
            with open(a["dv"]["path"]) as f:
                dv = json.load(f)
            assert dv["file"] == os.path.basename(a["path"])
            assert len(dv["positions"]) == a["dv"]["dead"]


def test_dv_accumulates_and_time_travels(spark, table):
    _base(spark, table)
    table.delete("k % 10 = 3", mode="dv")
    table.delete("k % 10 = 7", mode="dv")
    assert table.read().count() == 80
    # each live action carries ONE dv holding the union of both waves
    for a in table.snapshot_files():
        if a.get("dv"):
            positions = json.load(open(a["dv"]["path"]))["positions"]
            assert len(positions) == a["dv"]["dead"]
    # time travel reads each version's own dv state
    assert table.read(version=1).count() == 100
    assert table.read(version=2).count() == 90
    assert table.read(version=3).count() == 80


def test_cdf_across_dv_delete_emits_exactly_the_dead_rows(spark, table):
    _base(spark, table)
    table.delete("k % 10 = 3", mode="dv")
    rows = table.changes(["k"], v_from=1, v_to=2).collect()
    assert {r["change_type"] for r in rows} == {"delete"}
    assert sorted(r["k"] for r in rows) == [
        k for k in range(1, 101) if k % 10 == 3
    ]
    # second wave diffs only against the FIRST dv, not genesis
    table.delete("k % 10 = 7", mode="dv")
    rows2 = table.changes(["k"], v_from=2, v_to=3).collect()
    assert sorted(r["k"] for r in rows2) == [
        k for k in range(1, 101) if k % 10 == 7
    ]
    assert {r["change_type"] for r in rows2} == {"delete"}


def test_merge_over_dv_no_resurrection_and_purges_dv(spark, table):
    _base(spark, table)
    table.delete("k % 10 = 3", mode="dv")
    # update a live key and re-insert a dv-deleted key
    src = spark.createDataFrame([(4, 888), (3, 999)], "k long, v long")
    table.merge(src, keys=["k"])
    final = {r["k"]: r["v"] for r in table.read().collect()}
    assert final[3] == 999 and final[4] == 888
    assert 13 not in final and 23 not in final  # still dead
    assert table.read().count() == 91
    # the rewritten file(s) carry no dv — merge purged it
    for a in table.snapshot_files():
        if a.get("dv"):
            # any surviving dv belongs to an untouched file
            dead = json.load(open(a["dv"]["path"]))["positions"]
            assert len(dead) == a["dv"]["dead"]
    # a key deleted by dv in a touched file must NOT have resurrected:
    # total row count is the ground truth above


def test_threshold_fallback_rewrites_and_full_death_drops(spark, table):
    _base(spark, table)
    # >50% of every file dead -> rewrite, no dv
    out = table.delete("k % 4 != 0", mode="dv")
    assert out["files_dv"] == 0
    assert out["files_rewritten"] + out["files_dropped"] >= 1
    assert table.read().count() == 25
    assert not any(a.get("dv") for a in table.snapshot_files())
    # kill everything that remains: files drop outright
    out2 = table.delete("TRUE", mode="dv")
    assert out2["files_dropped"] >= 1 and out2["files_dv"] == 0
    assert table.read().count() == 0


def test_compact_purges_deletion_vectors(spark, table):
    _base(spark, table)
    table.delete("k % 10 = 3", mode="dv")
    table.compact(target_files=1)
    actions = table.snapshot_files()
    assert not any(a.get("dv") for a in actions)
    assert table.read().count() == 90
    assert table.read().filter("k % 10 = 3").count() == 0


def test_restore_across_dv_versions(spark, table):
    _base(spark, table)
    table.delete("k % 10 = 3", mode="dv")  # v2
    table.delete("k % 10 = 7", mode="dv")  # v3
    table.restore(1)  # back to no deletions
    assert table.read().count() == 100
    table.restore(2)  # forward again to the FIRST dv state
    assert table.read().count() == 90
    assert table.read().filter("k % 10 = 3").count() == 0
    assert table.read().filter("k % 10 = 7").count() == 10


def test_vacuum_keeps_live_dv_removes_orphans(spark, table):
    _base(spark, table)
    table.delete("k % 10 = 3", mode="dv")
    live_dv = {
        a["dv"]["path"] for a in table.snapshot_files() if a.get("dv")
    }
    assert live_dv
    table.delete("k % 10 = 7", mode="dv")  # supersedes the first dv set
    removed = table.vacuum()
    # old sidecars gone, new ones kept
    assert all(os.path.exists(p) is False for p in live_dv)
    assert any(p in removed for p in live_dv)
    for a in table.snapshot_files():
        if a.get("dv"):
            assert os.path.exists(a["dv"]["path"])
    assert table.read().count() == 80
    # retention: keep the previous version's dv alive
    table2 = AcidTable(table.spark, table.path)
    assert table2.fsck()["ok"]


def test_fsck_detects_missing_live_dv(spark, table):
    _base(spark, table)
    table.delete("k % 10 = 3", mode="dv")
    dv_path = next(
        a["dv"]["path"] for a in table.snapshot_files() if a.get("dv")
    )
    os.remove(dv_path)
    report = table.fsck()
    assert not report["ok"]
    assert dv_path in report["missing"]


def test_point_lookup_respects_dv(spark, table):
    df = table.spark.range(1, 101).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    table.write(df.repartition(4, "k"), stats_cols=["k"],
                bloom_cols=["k"], binpack=False)
    table.delete("k = 42", mode="dv")
    assert table.point_lookup("k", [42]).count() == 0
    assert table.point_lookup("k", [41]).count() == 1


def test_cdf_consumer_folds_dv_delete_not_metadata_only(spark, tmp_path):
    """A DV delete changes rows but not paths: the consumer must fold
    it (the path-set metadata-only short-circuit would skip it and
    silver would diverge forever)."""
    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
    from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer

    bronze = AcidTable(spark, str(tmp_path / "bronze"))
    view = MaterializedAgg(
        spark, str(tmp_path / "silver"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x")],
    )
    consumer = ChangeFeedConsumer(bronze, ["k"], view, count_col="n")
    bronze.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 5), (3, "b", 7), (4, "b", 1)],
            "k long, g string, x long",
        ),
        stats_cols=["k"],
    )
    consumer.process_available()
    out = bronze.delete("k = 2", mode="dv")
    assert out["files_dv"] >= 1 or out["files_rewritten"] >= 1
    stats = consumer.process_available()
    assert not stats.get("metadata_only")
    want = {
        r["g"]: (r["n"], r["s"])
        for r in bronze.read().groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
        ).collect()
    }
    got = {r["g"]: (r["n"], r["s"]) for r in consumer.state().collect()}
    assert got == want


def test_compact_small_packs_only_the_tail(spark, tmp_path):
    from pyspark.sql import functions as F2

    table = AcidTable(spark, str(tmp_path / "cs"))
    big = spark.range(1, 5001).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("v")
    )
    table.write(big.coalesce(1), stats_cols=["k"])
    big_path = table.snapshot_files()[0]["path"]
    # accrete a tail of tiny per-batch files
    for i in range(3):
        table.write(
            spark.createDataFrame(
                [(10000 + i, "x")], "k long, v string"
            ),
            mode="append", stats_cols=["k"],
        )
    assert len(table.snapshot_files()) == 4
    out = table.compact_small(small_bytes=64 * 1024)
    assert out["files_compacted"] == 3 and out["files_kept"] == 1
    paths = {a["path"] for a in table.snapshot_files()}
    assert big_path in paths and len(paths) == 2  # big file untouched
    assert table.read().count() == 5003
    # fewer than two small files: no-op
    assert table.compact_small(small_bytes=64 * 1024) == {
        "files_compacted": 0, "files_kept": 2,
    }


def test_compact_small_purges_dv_on_small_files_only(spark, tmp_path):
    table = AcidTable(spark, str(tmp_path / "csdv"))
    table.write(
        spark.range(1, 101).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).repartition(2, "k"),
        stats_cols=["k"], binpack=False,
    )
    table.delete("k % 10 = 1", mode="dv")
    out = table.compact_small(small_bytes=1 << 30)  # everything is small
    assert out["files_compacted"] == 2
    assert not any(a.get("dv") for a in table.snapshot_files())
    assert table.read().count() == 90


def test_timestamp_time_travel(spark, table):
    import time as _t

    _base(spark, table)
    t_mid = _t.time()
    _t.sleep(0.05)
    table.delete("k % 10 = 3", mode="dv")
    assert table.version_as_of(t_mid) == 1
    assert table.read_as_of(t_mid).count() == 100
    assert table.read_as_of(_t.time()).count() == 90
    import pytest as _pt

    with _pt.raises(ValueError, match="no committed version"):
        table.version_as_of(0.0)


def test_deep_clone_is_independent_and_content_equal(spark, table, tmp_path):
    _base(spark, table)
    table.delete("k % 10 = 3", mode="dv")  # clone must carry the DV
    table.add_constraint("k_pos", "k > 0")
    dest = table.deep_clone(str(tmp_path / "dr"))
    # content equal (incl. the deletion vector's effect)
    src_rows = sorted((r["k"], r["v"]) for r in table.read().collect())
    dst_rows = sorted((r["k"], r["v"]) for r in dest.read().collect())
    assert src_rows == dst_rows and len(dst_rows) == 90
    assert dest.constraints() == {"k_pos": "k > 0"}
    # independence: vacuum + mutate the SOURCE; the clone is untouched
    table.delete("TRUE")
    table.vacuum()
    assert dest.read().count() == 90
    assert dest.fsck()["ok"]
    # and the reverse: the clone's own writes never touch the source
    dest.delete("k = 2")
    assert dest.read().count() == 89


def test_vacuum_dry_run_reports_without_removing(spark, table):
    import os as _os

    _base(spark, table)
    table.delete("k % 10 = 3", mode="dv")
    table.compact(target_files=1)  # orphans the dv + the old files
    would = table.vacuum(dry_run=True)
    assert would
    assert all(_os.path.exists(p) for p in would)  # nothing touched
    removed = table.vacuum()
    assert sorted(removed) == sorted(would)
    assert all(not _os.path.exists(p) for p in removed)


def test_null_predicate_rows_survive_in_every_branch(spark, tmp_path):
    """A row where the predicate evaluates to NULL survives DELETE in
    all three paths — cow, dv-sidecar, and the dv threshold-fallback
    rewrite — so survival never depends on which per-file branch fired.
    (Regression: the rewrite fallback used NOT(predicate), which drops
    predicate-NULL rows under three-valued logic.)"""
    rows = [(k, None if k % 5 == 0 else k * 10) for k in range(1, 101)]
    df = spark.createDataFrame(rows, "k long, v long")
    for mode, frac in (("cow", 0.5), ("dv", 0.5), ("dv", 0.0)):
        t = AcidTable(spark, str(tmp_path / f"np_{mode}_{frac}"))
        t.write(df.repartition(4, "k"), stats_cols=["k"], binpack=False)
        out = t.delete("v > 500", mode=mode, dv_max_fraction=frac) \
            if mode == "dv" else t.delete("v > 500", mode=mode)
        if mode == "dv" and frac == 0.0:
            # force every touched file down the rewrite fallback
            assert out["files_dv"] == 0 and out["files_rewritten"] >= 1
        survivors = {r["k"] for r in t.read().collect()}
        # dead iff v > 500 is TRUE: k in 51..100 with k % 5 != 0
        want = {k for k in range(1, 101) if k % 5 == 0 or k <= 50}
        assert survivors == want, (mode, frac)
        assert t.read().filter("v IS NULL").count() == 20, (mode, frac)


def test_dv_broad_predicate_classifies_before_collecting(spark, table):
    """A broad under-threshold predicate (40% dead) still takes the DV
    path and yields exact counts — the per-file pre-count classifier
    must agree with the collected positions."""
    _base(spark, table)
    # ~40% dead overall; per-file fractions vary under hash
    # partitioning, so lift the threshold to keep every file on the
    # DV path and exercise the bounded phase-2 collect
    out = table.delete("k % 10 < 4", mode="dv", dv_max_fraction=0.95)
    assert out["files_rewritten"] == 0 and out["files_dropped"] == 0
    assert out["files_dv"] >= 1
    assert table.read().count() == 60
    for a in table.snapshot_files():
        if a.get("dv"):
            positions = json.load(open(a["dv"]["path"]))["positions"]
            assert len(positions) == a["dv"]["dead"]
