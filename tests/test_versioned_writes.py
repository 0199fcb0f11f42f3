"""Snapshot-versioned writes: immutability, time travel, crash
invisibility, O(1) rollback, key diffs."""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def vw(spark, tmp_path):
    from data_pipeline_platform_spark.sinks.versioned import VersionedWriter

    return VersionedWriter(spark, str(tmp_path / "lake"))


def _df(spark, ids):
    return spark.createDataFrame([(i, i * 10) for i in ids], "id long, v long")


def test_time_travel_reads_exact_snapshots(spark, vw):
    vw.write_snapshot(_df(spark, range(5)), "corpus", "initial")
    vw.write_snapshot(_df(spark, range(8)), "corpus", "grew")
    assert vw.read("corpus", 1).count() == 5
    assert vw.read("corpus", 2).count() == 8
    assert vw.read("corpus").count() == 8  # latest
    hist = vw.history("corpus")
    assert [e["version"] for e in hist] == [1, 2]
    assert hist[0]["rows"] == 5 and hist[1]["rows"] == 8


def test_old_snapshot_files_are_immutable(spark, vw, tmp_path):
    vw.write_snapshot(_df(spark, range(5)), "corpus")
    d = str(tmp_path / "lake" / "corpus" / "v=1")
    before = {f: os.path.getmtime(f"{d}/{f}") for f in os.listdir(d)}
    vw.write_snapshot(_df(spark, range(9)), "corpus")
    after = {f: os.path.getmtime(f"{d}/{f}") for f in os.listdir(d)}
    assert before == after


def test_crashed_write_is_invisible_and_not_reused(spark, vw, tmp_path):
    """Data-without-log-entry (a crash between write and commit) must
    be invisible to readers, and the next writer must NOT adopt the
    orphan's directory."""
    vw.write_snapshot(_df(spark, range(3)), "corpus")
    orphan = str(tmp_path / "lake" / "corpus" / "v=2")
    _df(spark, range(99)).write.parquet(orphan)  # simulated crash
    assert vw.read("corpus").count() == 3
    entry = vw.write_snapshot(_df(spark, range(6)), "corpus")
    assert entry["version"] == 3  # skipped the orphan slot
    assert vw.read("corpus").count() == 6
    # the orphan stays unreferenced
    assert all(e["dir"] != "v=2" for e in vw.history("corpus"))


def test_rollback_is_log_only(spark, vw, tmp_path):
    vw.write_snapshot(_df(spark, range(5)), "corpus")
    vw.write_snapshot(_df(spark, range(2)), "corpus", "bad curation run")
    entry = vw.rollback("corpus", to_version=1)
    assert entry["dir"] == "v=1"
    assert vw.read("corpus").count() == 5
    # nothing was rewritten: rollback added no data directory
    dirs = [
        d
        for d in os.listdir(str(tmp_path / "lake" / "corpus"))
        if d.startswith("v=")
    ]
    assert sorted(dirs) == ["v=1", "v=2"]


def test_diff_counts_between_versions(spark, vw):
    vw.write_snapshot(_df(spark, [1, 2, 3, 4]), "corpus")
    vw.write_snapshot(_df(spark, [3, 4, 5, 6, 7]), "corpus")
    d = vw.diff_counts("corpus", 1, 2, key="id")
    assert d == {"added": 3, "removed": 2}


def test_unknown_version_raises(spark, vw):
    vw.write_snapshot(_df(spark, range(3)), "corpus")
    with pytest.raises(KeyError):
        vw.read("corpus", 9)
    with pytest.raises(KeyError):
        vw.rollback("corpus", 9)
    with pytest.raises(KeyError):
        vw.read("never_written")


def test_optimize_compacts_as_new_snapshot(spark, vw, tmp_path):
    """OPTIMIZE rewrites the latest snapshot into fewer files as a NEW
    version — identical rows, old version untouched."""
    import os

    df = _df(spark, range(200)).repartition(16)
    vw.write_snapshot(df, "corpus")
    entry = vw.optimize("corpus", target_files=2)
    assert entry["version"] == 2 and entry["rows"] == 200
    d2 = str(tmp_path / "lake" / "corpus" / "v=2")
    n_files = len([f for f in os.listdir(d2) if f.endswith(".parquet")])
    assert n_files <= 2
    assert sorted(r["id"] for r in vw.read("corpus", 2).collect()) == sorted(
        r["id"] for r in vw.read("corpus", 1).collect()
    )


def test_concurrent_snapshot_writers_serialize(spark, vw):
    """Two threads snapshotting the same table concurrently must both
    commit, with unique versions and a log that references every data
    dir exactly once — the O_EXCL lock is the only coordinator."""
    import threading

    errs = []

    def write(n):
        try:
            vw.write_snapshot(_df(spark, range(n)), "corpus", f"writer-{n}")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=write, args=(n,)) for n in (5, 9, 13)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    hist = vw.history("corpus")
    versions = [e["version"] for e in hist]
    assert len(versions) == 3 and len(set(versions)) == 3
    dirs = [e["dir"] for e in hist]
    assert len(set(dirs)) == 3
    assert sorted(e["rows"] for e in hist) == [5, 9, 13]
    # every committed version reads back its own rows
    for e in hist:
        assert vw.read("corpus", e["version"]).count() == e["rows"]
