"""ACID lake-table layer (sinks/acid.py): log-replay snapshots, atomic
commit publishing, time travel, copy-on-write MERGE with footer-stats
file pruning, delete/compact/vacuum — the Delta-protocol shape that
closes SURVEY §7/M4's lake-format MERGE gap."""

import json
import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import AcidTable, CommitConflictError


@pytest.fixture()
def table(spark, tmp_path):
    return AcidTable(spark, str(tmp_path / "t"))


def _df(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def test_write_read_append_and_time_travel(spark, table):
    v1 = table.write(_df(spark, [(1, "a"), (2, "b")]), stats_cols=["k"])
    assert v1 == 1 and table.read().count() == 2
    v2 = table.write(_df(spark, [(3, "c")]), mode="append", stats_cols=["k"])
    assert v2 == 2 and table.read().count() == 3
    # time travel: version 1 still reads the pre-append snapshot
    assert table.read(version=1).count() == 2
    assert {r["k"] for r in table.read().collect()} == {1, 2, 3}


def test_overwrite_replaces_snapshot_not_files(spark, table):
    table.write(_df(spark, [(1, "a")]))
    table.write(_df(spark, [(9, "z")]), mode="overwrite")
    assert [r["k"] for r in table.read().collect()] == [9]
    # the old file still exists on disk (time travel) until vacuum
    assert table.read(version=1).collect()[0]["k"] == 1


def test_commit_is_atomic_create_losers_conflict(spark, table):
    table.write(_df(spark, [(1, "a")]))
    # simulate a concurrent winner for version 2
    with open(table._version_file(2), "x") as f:
        json.dump({"version": 2, "op": "X", "ts": 0, "add": [], "remove": [],
                   "meta": {}}, f)
    with pytest.raises(CommitConflictError):
        table._commit(1, "APPEND", [], [])
    # write() retries onto version 3 and succeeds
    v = table.write(_df(spark, [(2, "b")]), mode="append")
    assert v == 3


def test_crash_orphans_are_invisible_and_vacuumable(spark, table):
    table.write(_df(spark, [(1, "a")]))
    # a crashed writer: data file on disk, no commit referencing it
    orphan = os.path.join(table.path, "part-orphan-00000.parquet")
    _df(spark, [(99, "zz")]).coalesce(1).write.mode("overwrite").parquet(
        str(table.path) + "_tmp"
    )
    import glob
    import shutil

    shutil.move(glob.glob(str(table.path) + "_tmp/*.parquet")[0], orphan)
    assert table.read().count() == 1  # snapshot untouched by the orphan
    removed = table.vacuum()
    assert orphan in removed and table.read().count() == 1


def test_merge_updates_inserts_and_prunes(spark, table):
    # two files with disjoint key ranges -> stats prune one of them
    table.write(_df(spark, [(i, f"v{i}") for i in range(0, 50)]).repartition(1),
                stats_cols=["k"])
    table.write(
        _df(spark, [(i, f"v{i}") for i in range(100, 150)]).repartition(1),
        mode="append", stats_cols=["k"],
    )
    assert len(table.snapshot_files()) == 2
    src = _df(spark, [(10, "NEW"), (11, "NEW"), (999, "INS")])
    stats = table.merge(src, keys=["k"])
    # low-range file touched; high-range file pruned by footer stats
    assert stats["files_pruned"] == 1
    assert stats["files_rewritten"] == 1
    out = {r["k"]: r["v"] for r in table.read().collect()}
    assert out[10] == "NEW" and out[11] == "NEW" and out[999] == "INS"
    assert out[12] == "v12" and out[120] == "v120"
    assert len(out) == 101
    # reference ON CONFLICT contract: non-key columns fully replaced
    assert table.read().count() == 101


def test_merge_untouched_file_bytes_identical(spark, table):
    """Copy-on-write must not rewrite pruned files — their add-actions
    (paths) survive the MERGE commit verbatim."""
    table.write(_df(spark, [(1, "a")]).repartition(1), stats_cols=["k"])
    table.write(_df(spark, [(1000, "z")]).repartition(1), mode="append",
                stats_cols=["k"])
    before = {a["path"] for a in table.snapshot_files()}
    table.merge(_df(spark, [(1, "UP")]), keys=["k"])
    after = {a["path"] for a in table.snapshot_files()}
    surviving = before & after
    assert len(surviving) == 1  # the pruned high-range file kept as-is
    kept = surviving.pop()
    assert spark.read.parquet(kept).collect()[0]["k"] == 1000


def test_merge_delete_matched(spark, table):
    table.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), stats_cols=["k"])
    table.merge(_df(spark, [(2, "x")]), keys=["k"], delete_matched=True)
    assert {r["k"] for r in table.read().collect()} == {1, 3}


def test_merge_insert_only_rewrites_nothing(spark, table):
    table.write(_df(spark, [(1, "a")]), stats_cols=["k"])
    stats = table.merge(_df(spark, [(50, "new")]), keys=["k"])
    assert stats["files_rewritten"] == 0
    assert table.read().count() == 2


def test_merge_in_batch_duplicates_collapse(spark, table):
    table.write(_df(spark, [(1, "a")]), stats_cols=["k"])
    table.merge(_df(spark, [(1, "x"), (1, "x")]), keys=["k"])
    assert table.read().filter("k = 1").count() == 1


def test_delete_predicate_rewrites_only_matching_files(spark, table):
    table.write(_df(spark, [(i, "lo") for i in range(5)]).repartition(1),
                stats_cols=["k"])
    table.write(_df(spark, [(i, "hi") for i in range(100, 105)]).repartition(1),
                mode="append", stats_cols=["k"])
    res = table.delete("k = 3")
    assert res["files_rewritten"] == 1
    assert table.read().count() == 9
    assert table.read().filter("k = 3").count() == 0


def test_compact_and_history(spark, table):
    table.write(_df(spark, [(1, "a")]), stats_cols=["k"])
    table.write(_df(spark, [(2, "b")]), mode="append", stats_cols=["k"])
    table.compact(target_files=1)
    assert len(table.snapshot_files()) == 1
    assert table.read().count() == 2
    ops = [h["op"] for h in table.history()]
    assert ops == ["OVERWRITE", "APPEND", "COMPACT"]
    # stats survive compaction (pruning keeps working)
    assert "k" in table.snapshot_files()[0]["stats"]


def test_vacuum_after_compact_drops_old_versions(spark, table):
    table.write(_df(spark, [(1, "a")]))
    table.write(_df(spark, [(2, "b")]), mode="append")
    table.compact()
    removed = table.vacuum()
    assert len(removed) >= 2
    assert table.read().count() == 2  # latest snapshot unaffected
    with pytest.raises(Exception):
        table.read(version=1).collect()  # time travel gone, by contract


def test_merge_matches_sql_merge_oracle(spark, table, tmp_path):
    """MERGE result equals the reference ON-CONFLICT semantics expressed
    in plain SQL (the same contract upsert_merge grades)."""
    import duckdb

    base = [(i, f"v{i}") for i in range(20)]
    delta = [(5, "U5"), (7, "U7"), (25, "I25")]
    table.write(_df(spark, base).repartition(2), stats_cols=["k"])
    table.merge(_df(spark, delta), keys=["k"])
    got = sorted((r["k"], r["v"]) for r in table.read().collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", base)
    con.execute("CREATE TABLE s (k BIGINT, v VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?, ?)", delta)
    want = sorted(
        con.execute(
            "SELECT k, v FROM (SELECT COALESCE(s.k, t.k) AS k, "
            "COALESCE(s.v, t.v) AS v FROM t FULL JOIN s USING (k))"
        ).fetchall()
    )
    assert got == want


def _changes(table, v_from, v_to=None):
    return sorted(
        (r["change_type"], r["k"], r["v"])
        for r in table.changes(["k"], v_from, v_to).collect()
    )


def test_change_feed_classifies_merge(spark, table):
    table.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), stats_cols=["k"])
    table.merge(_df(spark, [(2, "B"), (9, "z")]), keys=["k"])
    assert _changes(table, 1, 2) == [
        ("insert", 9, "z"),
        ("update_postimage", 2, "B"),
        ("update_preimage", 2, "b"),
    ]
    # survivor rows (1, 3) were rewritten copy-on-write with identical
    # values and must NOT appear


def test_change_feed_append_and_delete(spark, table):
    table.write(_df(spark, [(1, "a")]), stats_cols=["k"])
    table.write(_df(spark, [(2, "b")]), mode="append", stats_cols=["k"])
    assert _changes(table, 1, 2) == [("insert", 2, "b")]
    table.delete("k = 1")
    assert _changes(table, 2, 3) == [("delete", 1, "a")]
    # spanning feed composes: v1 -> v3 sees the append and the delete
    assert _changes(table, 1, 3) == [("delete", 1, "a"), ("insert", 2, "b")]


def test_change_feed_prunes_untouched_files(spark, table):
    # two key-ranged files; merge touches only one
    table.write(
        _df(spark, [(1, "a"), (2, "b"), (100, "x"), (101, "y")]).repartitionByRange(
            2, "k"
        ),
        stats_cols=["k"],
        binpack=False,  # the 2-file range layout IS the fixture
    )
    table.merge(_df(spark, [(1, "A")]), keys=["k"])
    feed = table.changes(["k"], 1, 2)
    assert sorted((r["change_type"], r["k"]) for r in feed.collect()) == [
        ("update_postimage", 1),
        ("update_preimage", 1),
    ]
    # the diff read only the touched files: scan inputs exclude the
    # 100/101 file (it was neither added nor removed by the merge)
    scanned = feed.inputFiles()
    tbl_rows = {r["k"]: r for r in spark.read.parquet(*scanned).collect()}
    assert 100 not in tbl_rows and 101 not in tbl_rows


def test_change_feed_no_changes_raises(spark, table):
    table.write(_df(spark, [(1, "a")]), stats_cols=["k"])
    with pytest.raises(ValueError, match="no data files changed"):
        table.changes(["k"], 1, 1)


def test_write_binpacks_fragmented_versions(spark, table):
    """A 16-partition shuffle of tiny rows must publish as ONE file
    (small-file policy), and binpack=False must preserve the caller's
    layout verbatim."""
    table.write(_df(spark, [(i, f"v{i}") for i in range(100)]).repartition(16),
                stats_cols=["k"])
    files_v1 = table.snapshot_files()
    assert len(files_v1) == 1
    # stats survive the pack: the single file carries the full key range
    assert files_v1[0]["stats"]["k"] == {"min": 0, "max": 99}
    assert sorted(r["k"] for r in table.read().collect()) == list(range(100))

    t2 = AcidTable(spark, table.path + "-raw")
    t2.write(_df(spark, [(i, f"v{i}") for i in range(100)]).repartition(16),
             stats_cols=["k"], binpack=False)
    assert len(t2.snapshot_files()) == 16


def test_merge_null_key_matches_null_target(spark, table):
    """ADVICE r7: NULL source keys must UPDATE existing NULL-key rows
    (null-safe match, like groupBy/_fold/changes), not insert dupes."""
    table.write(_df(spark, [(None, "n"), (1, "a")]), stats_cols=["k"])
    stats = table.merge(_df(spark, [(None, "N2"), (1, "A")]), keys=["k"])
    out = {r["k"]: r["v"] for r in table.read().collect()}
    assert out == {None: "N2", 1: "A"}
    assert table.read().count() == 2  # no duplicate NULL-key row
    assert stats["files_rewritten"] >= 1


def test_merge_null_key_insert_and_delete(spark, table):
    table.write(_df(spark, [(1, "a")]), stats_cols=["k"])
    table.merge(_df(spark, [(None, "n")]), keys=["k"])
    assert table.read().count() == 2
    table.merge(_df(spark, [(None, "x")]), keys=["k"], delete_matched=True)
    assert [r["k"] for r in table.read().collect()] == [1]


def test_matview_null_group_key_stays_single_row(spark, tmp_path):
    """The documented 'state equals one-shot groupBy' invariant for a
    batch stream containing NULL group keys."""
    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg

    view = MaterializedAgg(
        spark, str(tmp_path / "mv"), keys=["g"],
        aggs=[("n", "count", ""), ("s", "sum", "x")],
    )
    b1 = spark.createDataFrame([(None, 10), ("a", 1)], "g string, x long")
    b2 = spark.createDataFrame([(None, 5), ("a", 2)], "g string, x long")
    view.update(b1)
    view.update(b2)
    state = {r["g"]: (r["n"], r["s"]) for r in view.read().collect()}
    assert state == {None: (2, 15), "a": (2, 3)}


def test_change_feed_duplicate_keys_raise(spark, table):
    table.write(_df(spark, [(1, "a"), (1, "b")]), stats_cols=["k"])
    table.write(_df(spark, [(2, "c")]), mode="overwrite", stats_cols=["k"])
    # r14: the dup check rides inside the feed plan (no dedicated
    # pre-check job), so it surfaces when the feed MATERIALIZES —
    # Spark wraps the raise_error in its runtime-exception chain
    with pytest.raises(Exception, match="unique keys"):
        table.changes(["k"], 1, 2).count()
    # explicit opt-out still works
    assert table.changes(["k"], 1, 2, check_unique=False).count() >= 1


def test_restore_publishes_new_version_keeping_history(spark, table):
    table.write(_df(spark, [(1, "a"), (2, "b")]), stats_cols=["k"])
    table.merge(_df(spark, [(2, "B2"), (3, "c")]), keys=["k"])
    table.delete("k = 1")
    v = table.restore(1)
    assert v == 4  # restore is itself a commit
    assert {(r["k"], r["v"]) for r in table.read().collect()} == {(1, "a"), (2, "b")}
    # history intact: v3 still readable
    assert {r["k"] for r in table.read(version=3).collect()} == {2, 3}
    ops = [h["op"] for h in table.history()]
    assert ops[-1] == "RESTORE" and table.history()[-1]["meta"]["restored_to"] == 1
    with pytest.raises(ValueError):
        table.restore(99)


def test_restore_after_vacuum_raises(spark, table):
    table.write(_df(spark, [(1, "a")]), stats_cols=["k"])
    table.write(_df(spark, [(9, "z")]), mode="overwrite", stats_cols=["k"])
    table.vacuum()  # drops v1's file
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        table.restore(1)


def test_clustered_compact_improves_merge_pruning(spark, table):
    """After compact(cluster_by=['k']), files hold disjoint key ranges,
    so a narrow merge prunes all but one file."""
    # interleaved layout: both files span the whole key range
    lo = [(i, f"v{i}") for i in range(0, 100, 2)]
    hi = [(i, f"v{i}") for i in range(1, 100, 2)]
    table.write(_df(spark, lo).repartition(1), stats_cols=["k"], binpack=False)
    table.write(_df(spark, hi).repartition(1), mode="append", stats_cols=["k"],
                binpack=False)
    stats_before = table.merge(_df(spark, [(4, "X")]), keys=["k"])
    assert stats_before["files_pruned"] == 0  # interleaved: nothing prunes
    table.compact(target_files=2, cluster_by=["k"])
    assert len(table.snapshot_files()) == 2
    stats_after = table.merge(_df(spark, [(6, "Y")]), keys=["k"])
    assert stats_after["files_pruned"] == 1  # disjoint ranges: half pruned
    out = {r["k"]: r["v"] for r in table.read().collect()}
    assert out[4] == "X" and out[6] == "Y" and len(out) == 100


def test_checkpoint_accelerated_snapshot_matches_full_replay(spark, table):
    """After > _CHECKPOINT_INTERVAL commits a checkpoint exists, snapshot
    reads start from it, and the state matches exact fold expectations."""
    import os as _os

    from data_pipeline_platform_spark.sinks import acid as acid_mod

    for i in range(12):
        table.write(_df(spark, [(i, f"v{i}")]), mode="append", stats_cols=["k"])
    ckpts = [
        f for f in _os.listdir(table.log_dir) if f.endswith(".checkpoint.json")
    ]
    assert ckpts, "no checkpoint written after 12 commits"
    assert table._latest_checkpoint_at_or_before(12) == 10
    # snapshot via checkpoint equals state: all 12 rows
    assert sorted(r["k"] for r in table.read().collect()) == list(range(12))
    # time travel BEFORE the checkpoint still replays from genesis
    assert sorted(r["k"] for r in table.read(version=5).collect()) == list(range(5))
    # a corrupt checkpoint falls back to full replay
    with open(_os.path.join(table.log_dir, ckpts[0]), "w") as f:
        f.write("not json")
    assert sorted(r["k"] for r in table.read().collect()) == list(range(12))


def test_delete_rewrites_only_touched_files(spark, table):
    """delete() must resolve touched files via row-group membership and
    carry untouched files over BY REFERENCE — the predicate here hits
    one of two disjoint key ranges written as separate commits."""
    table.write(_df(spark, [(1, "a"), (2, "b")]), stats_cols=["k"])
    table.write(_df(spark, [(100, "x"), (101, "y")]), mode="append", stats_cols=["k"])
    before = {a["path"] for a in table.snapshot_files()}
    out = table.delete("k >= 100 AND k % 2 = 0")
    assert out["files_rewritten"] == 1
    after = {a["path"] for a in table.snapshot_files()}
    # the low-range file is the SAME physical file in the new snapshot
    kept_low = {p for p in before if p in after}
    assert len(kept_low) >= 1
    assert sorted(r["k"] for r in table.read().collect()) == [1, 2, 101]


def test_delete_no_match_is_metadata_noop(spark, table):
    table.write(_df(spark, [(1, "a")]), stats_cols=["k"])
    v = table.latest_version()
    assert table.delete("k = 999") == {"files_rewritten": 0}
    assert table.latest_version() == v  # no empty commit published


def test_log_stats_equal_data_stats(spark, table):
    """The add-action footer stats must agree with the data — the
    contract the metadata-only stats query (q_acid_stats_orders) and
    merge's file pruning both stand on."""
    table.write(
        _df(spark, [(5, "a"), (17, "b"), (2, "c")]).repartition(2, "k"),
        stats_cols=["k"],
    )
    files = table.snapshot_files()
    log_min = min(a["stats"]["k"]["min"] for a in files)
    log_max = max(a["stats"]["k"]["max"] for a in files)
    log_rows = sum(a["rows"] for a in files)
    data = table.read().agg({"k": "min"}).collect()[0][0], table.read().agg(
        {"k": "max"}
    ).collect()[0][0], table.read().count()
    assert (log_min, log_max, log_rows) == data


def test_merge_retries_on_commit_conflict(spark, tmp_path):
    """OCC loop: a competing writer steals the version slot between
    merge's snapshot read and its commit; merge must re-resolve against
    the NEW snapshot and succeed, leaving the loser attempt's staged
    files as vacuum-able orphans."""
    t = AcidTable(spark, str(tmp_path / "occ"))
    t.write(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, x long"),
        stats_cols=["k"],
    )
    orig = t._write_data_files
    state = {"fired": False}

    def hijack(df, stats_cols=(), binpack=True):
        files = orig(df, stats_cols, binpack=binpack)
        if not state["fired"]:
            state["fired"] = True
            # competing writer (separate handle) wins the version slot
            # AFTER this attempt staged its files but BEFORE its commit
            AcidTable(spark, t.path).write(
                spark.createDataFrame([(9, 90)], "k long, x long"),
                mode="append",
                stats_cols=["k"],
            )
        return files

    t._write_data_files = hijack
    stats = t.merge(
        spark.createDataFrame([(2, 99)], "k long, x long"), keys=["k"]
    )
    assert stats["files_rewritten"] >= 1
    got = {r["k"]: r["x"] for r in t.read().collect()}
    # the merge applied AND the competing append survived
    assert got == {1: 10, 2: 99, 9: 90}
    # versions: base write, competing append, winning merge attempt
    assert t.latest_version() == 3
    # the lost attempt's staged files are orphans; vacuum removes them
    assert len(t.vacuum()) >= 1


def test_merge_gives_up_after_max_retries(spark, tmp_path):
    t = AcidTable(spark, str(tmp_path / "occ2"))
    t.write(spark.createDataFrame([(1, 10)], "k long, x long"), stats_cols=["k"])
    orig = t._write_data_files

    def always_lose(df, stats_cols=(), binpack=True):
        files = orig(df, stats_cols, binpack=binpack)
        AcidTable(spark, t.path).write(
            spark.createDataFrame([(1, -1)], "k long, x long"),
            mode="append", stats_cols=["k"],
        )
        return files

    t._write_data_files = always_lose
    with pytest.raises(CommitConflictError):
        t.merge(
            spark.createDataFrame([(1, 99)], "k long, x long"),
            keys=["k"], max_retries=2,
        )


def _kx(spark, rows):
    return spark.createDataFrame(rows, "k long, x long")


def test_check_constraints_enforced_on_write_and_merge(spark, tmp_path):
    from data_pipeline_platform_spark.sinks.acid import ConstraintViolationError

    t = AcidTable(spark, str(tmp_path / "chk"))
    t.write(_kx(spark, [(1, 10), (2, 20)]), stats_cols=["k"])
    t.add_constraint("x_nonneg", "x >= 0")
    assert t.constraints() == {"x_nonneg": "x >= 0"}
    # violating append refused BEFORE any data file publishes
    v = t.latest_version()
    with pytest.raises(ConstraintViolationError, match="x_nonneg"):
        t.write(_kx(spark, [(3, -1)]), mode="append", stats_cols=["k"])
    with pytest.raises(ConstraintViolationError, match="x_nonneg"):
        t.merge(_kx(spark, [(1, -5)]), keys=["k"])
    assert t.latest_version() == v  # nothing committed
    # clean rows pass; delete-merges never add rows and skip the probe
    t.merge(_kx(spark, [(3, 30)]), keys=["k"])
    t.merge(_kx(spark, [(1, 0)]), keys=["k"], delete_matched=True)
    assert {r["k"]: r["x"] for r in t.read().collect()} == {2: 20, 3: 30}
    # drop re-opens the gate
    t.drop_constraint("x_nonneg")
    t.write(_kx(spark, [(9, -9)]), mode="append", stats_cols=["k"])
    assert t.read().filter("x < 0").count() == 1


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    from data_pipeline_platform_spark.sinks.acid import ConstraintViolationError

    t = AcidTable(spark, str(tmp_path / "chk2"))
    t.write(_kx(spark, [(1, -1)]), stats_cols=["k"])
    with pytest.raises(ConstraintViolationError, match="existing"):
        t.add_constraint("x_nonneg", "x >= 0")
    t.add_constraint("x_nonneg", "x >= 0", validate_existing=False)
    assert "x_nonneg" in t.constraints()


def test_shallow_clone_is_zero_copy_and_isolated(spark, tmp_path):
    import os

    t = AcidTable(spark, str(tmp_path / "src"))
    t.write(_kx(spark, [(1, 10), (2, 20), (3, 30)]), stats_cols=["k"])
    t.add_constraint("x_nonneg", "x >= 0")
    c = t.clone(str(tmp_path / "dst"))
    # zero-copy: no parquet under the clone dir, content identical
    assert not [f for f in os.listdir(c.path) if f.endswith(".parquet")]
    assert {r["k"]: r["x"] for r in c.read().collect()} == {1: 10, 2: 20, 3: 30}
    assert c.constraints() == {"x_nonneg": "x >= 0"}
    # clone diverges without touching the source
    c.merge(_kx(spark, [(2, 99)]), keys=["k"])
    assert {r["k"]: r["x"] for r in c.read().collect()} == {1: 10, 2: 99, 3: 30}
    assert {r["k"]: r["x"] for r in t.read().collect()} == {1: 10, 2: 20, 3: 30}
    # clone vacuum scans only its own dir: source files survive
    c.vacuum()
    assert {r["k"]: r["x"] for r in t.read().collect()} == {1: 10, 2: 20, 3: 30}
    with pytest.raises(FileExistsError):
        t.clone(str(tmp_path / "dst"))


def test_merge_into_emptied_table_inserts(spark, tmp_path):
    """MERGE into a table whose current snapshot has zero rows (all
    deleted) degenerates to pure insert; delete_matched to an audit
    no-op — never a FileNotFoundError (the table EXISTS; only a
    never-created target is an error)."""
    t = AcidTable(spark, str(tmp_path / "emptied"))
    t.write(_kx(spark, [(1, 10)]), stats_cols=["k"])
    t.merge(_kx(spark, [(1, 10)]), keys=["k"], delete_matched=True)
    # an existing-but-emptied table reads as an EMPTY frame with the
    # historical schema (never FileNotFoundError — that's reserved for
    # never-created tables)
    assert t.read().count() == 0
    assert t.read().columns == ["k", "x"]
    t.merge(_kx(spark, [(2, 20)]), keys=["k"], delete_matched=True)  # audit no-op
    stats = t.merge(_kx(spark, [(3, 30)]), keys=["k"])
    assert stats["files_rewritten"] == 0
    assert {r["k"]: r["x"] for r in t.read().collect()} == {3: 30}
    # and the never-created case still raises
    with pytest.raises(FileNotFoundError):
        AcidTable(spark, str(tmp_path / "nope")).merge(
            _kx(spark, [(1, 1)]), keys=["k"]
        )


def test_zorder_compaction_prunes_every_cluster_dimension(spark, tmp_path):
    """Multi-column OPTIMIZE ZORDER: after a z-curve rewrite, a range
    probe on EITHER cluster column prunes most files; lexicographic
    clustering only prunes the leading column."""
    from pyspark.sql import functions as F

    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("bigint").alias("b"),
        F.col("id").alias("v"),
    )

    def candidates(table, col, lo, hi):
        n = 0
        for action in table.snapshot_files():
            st = (action.get("stats") or {}).get(col)
            if st is None or not (st["max"] < lo or st["min"] > hi):
                n += 1
        return n

    z = AcidTable(spark, str(tmp_path / "z"))
    z.write(grid.repartition(8), stats_cols=["a", "b"])
    z.compact(target_files=16, cluster_by=["a", "b"], zorder=True)
    assert z.read().count() == 4096  # content preserved
    assert candidates(z, "a", 0, 7) <= 6  # ~sqrt locality on BOTH dims
    assert candidates(z, "b", 0, 7) <= 6

    lex = AcidTable(spark, str(tmp_path / "lex"))
    lex.write(grid.repartition(8), stats_cols=["a", "b"])
    lex.compact(target_files=16, cluster_by=["a", "b"])
    assert candidates(lex, "a", 0, 7) <= 4  # leading column: tight
    assert candidates(lex, "b", 0, 7) == 16  # trailing column: useless


def test_vacuum_retention_window_preserves_recent_time_travel(spark, tmp_path):
    """vacuum(retain_versions=k) keeps the last k+1 snapshots readable;
    older versions' exclusive files go."""
    from pyspark.sql import functions as F

    t = AcidTable(spark, str(tmp_path / "ret"))
    for i in range(1, 4):
        t.write(spark.range(i * 10).select(F.col("id").alias("k")))
    removed = t.vacuum(retain_versions=1)
    assert removed  # v1's file went
    assert t.read(3).count() == 30
    assert t.read(2).count() == 20  # retained: still time-travelable
    import pyspark

    with pytest.raises(Exception):
        t.read(1).count()  # vacuumed away
    # restore within the window still works
    t.restore(2)
    assert t.read().count() == 20


class TestForeignKeys:
    """Write-time FOREIGN KEY enforcement: the preventive complement to
    the fk_orphan_profile audit. NULL FK columns pass (MATCH SIMPLE);
    the referenced table resolves by path at every probe."""

    def _dim(self, spark, tmp_path):
        dim = AcidTable(spark, str(tmp_path / "dim"))
        dim.write(
            spark.createDataFrame([(1, "x"), (2, "y")], "d long, name string")
        )
        return dim

    def test_orphan_batch_refused_clean_batch_accepted(self, spark, tmp_path):
        from data_pipeline_platform_spark.sinks.acid import (
            ConstraintViolationError,
        )

        dim = self._dim(spark, tmp_path)
        facts = AcidTable(spark, str(tmp_path / "facts"))
        facts.write(spark.createDataFrame([(10, 1)], "k long, d long"))
        facts.add_fk_constraint("fk_d", ["d"], dim, ["d"])
        with pytest.raises(ConstraintViolationError, match="FK 'fk_d'"):
            facts.write(
                spark.createDataFrame([(11, 99)], "k long, d long"),
                mode="append",
            )
        facts.write(
            spark.createDataFrame([(11, 2)], "k long, d long"), mode="append"
        )
        assert facts.read().count() == 2

    def test_null_fk_passes_match_simple(self, spark, tmp_path):
        dim = self._dim(spark, tmp_path)
        facts = AcidTable(spark, str(tmp_path / "facts"))
        facts.write(spark.createDataFrame([(10, 1)], "k long, d long"))
        facts.add_fk_constraint("fk_d", ["d"], dim, ["d"])
        facts.write(
            spark.createDataFrame([(12, None)], "k long, d long"),
            mode="append",
        )
        assert facts.read().count() == 2

    def test_existing_orphans_refuse_the_constraint(self, spark, tmp_path):
        from data_pipeline_platform_spark.sinks.acid import (
            ConstraintViolationError,
        )

        dim = self._dim(spark, tmp_path)
        facts = AcidTable(spark, str(tmp_path / "facts"))
        facts.write(spark.createDataFrame([(10, 99)], "k long, d long"))
        with pytest.raises(ConstraintViolationError, match="existing rows"):
            facts.add_fk_constraint("fk_d", ["d"], dim, ["d"])
        facts.add_fk_constraint(
            "fk_d", ["d"], dim, ["d"], validate_existing=False
        )

    def test_fk_sees_reference_growth_and_merge_enforces(self, spark, tmp_path):
        from data_pipeline_platform_spark.sinks.acid import (
            ConstraintViolationError,
        )

        dim = self._dim(spark, tmp_path)
        facts = AcidTable(spark, str(tmp_path / "facts"))
        facts.write(spark.createDataFrame([(10, 1)], "k long, d long"))
        facts.add_fk_constraint("fk_d", ["d"], dim, ["d"])
        with pytest.raises(ConstraintViolationError):
            facts.merge(
                spark.createDataFrame([(11, 3)], "k long, d long"), keys=["k"]
            )
        dim.write(
            spark.createDataFrame([(3, "z")], "d long, name string"),
            mode="append",
        )  # the ref resolves by path: new dim rows legalize the key
        facts.merge(
            spark.createDataFrame([(11, 3)], "k long, d long"), keys=["k"]
        )
        assert facts.read().count() == 2

    def test_drop_reopens_and_clone_carries(self, spark, tmp_path):
        dim = self._dim(spark, tmp_path)
        facts = AcidTable(spark, str(tmp_path / "facts"))
        facts.write(spark.createDataFrame([(10, 1)], "k long, d long"))
        facts.add_fk_constraint("fk_d", ["d"], dim, ["d"])
        clone = facts.clone(str(tmp_path / "clone"))
        assert "fk_d" in clone.fk_constraints()
        facts.drop_fk_constraint("fk_d")
        facts.write(
            spark.createDataFrame([(13, 42)], "k long, d long"), mode="append"
        )
        assert facts.read().count() == 2


class TestFsck:
    def test_clean_table_passes(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"))
        t.write(spark.createDataFrame([(1, "a")], "k long, v string"))
        t.write(
            spark.createDataFrame([(2, "b")], "k long, v string"),
            mode="append",
        )
        t.merge(spark.createDataFrame([(1, "z")], "k long, v string"), keys=["k"])
        report = t.fsck()
        assert report["ok"]
        assert report["versions"] == 3
        assert report["live_files"] >= 1

    def test_missing_live_file_detected(self, spark, tmp_path):
        import os

        t = AcidTable(spark, str(tmp_path / "t"))
        t.write(spark.createDataFrame([(1, "a")], "k long, v string"))
        victim = t.snapshot_files()[0]["path"]
        os.remove(victim)
        report = t.fsck()
        assert not report["ok"]
        assert victim in report["missing"]

    def test_vacuumed_history_is_normal(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "t"))
        t.write(spark.createDataFrame([(1, "a")], "k long, v string"))
        t.write(spark.createDataFrame([(2, "b")], "k long, v string"))
        t.vacuum()
        report = t.fsck()
        assert report["ok"]
        assert report["vacuumed_history"] >= 1

    def test_pending_txn_surfaced(self, spark, tmp_path):
        from data_pipeline_platform_spark.sinks.txn import MultiTableTxn

        t = AcidTable(spark, str(tmp_path / "t"))
        t.write(spark.createDataFrame([(1, "a")], "k long, v string"))
        txn = MultiTableTxn(str(tmp_path / "_txns"))
        txn.stage_write(
            t, spark.createDataFrame([(2, "b")], "k long, v string"),
            mode="append",
        )
        report = t.fsck()
        assert report["ok"]  # pending is a state, not corruption
        assert len(report["pending_txns"]) == 1


class TestMergeConditional:
    """Clause algebra of merge_conditional (r10): precedence, kept
    rows, None conditions, one-commit atomicity."""

    def _table(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "mc"))
        t.write(
            spark.createDataFrame(
                [(1, "urgent", 100), (2, "low", 200), (3, "urgent", 300),
                 (4, "low", 400)],
                "k long, prio string, v long",
            ),
            stats_cols=["k"],
        )
        return t

    def test_clause_set_and_precedence(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        src = spark.createDataFrame(
            # k=1: higher v -> UPDATE (even though urgent+... update wins)
            # k=2: lower v, not urgent -> neither clause: KEPT unchanged
            # k=3: lower v, urgent -> DELETE
            # k=5: unmatched, prio drop -> filtered at the insert gate
            # k=6: unmatched, passes -> INSERT
            [(1, "urgent", 150), (2, "low", 50), (3, "urgent", 50),
             (5, "drop", 500), (6, "ok", 600)],
            "k long, prio string, v long",
        )
        before = t.latest_version()
        t.merge_conditional(
            src, keys=["k"],
            update_when="s.v > t.v",
            delete_when="t.prio = 'urgent' AND s.v < t.v",
            insert_when="s.prio <> 'drop'",
        )
        assert t.latest_version() == before + 1  # ONE atomic commit
        state = {r["k"]: (r["prio"], r["v"]) for r in t.read().collect()}
        assert state == {
            1: ("urgent", 150),  # updated
            2: ("low", 200),     # matched, no clause: kept
            4: ("low", 400),     # untouched
            6: ("ok", 600),      # inserted
        }

    def test_none_conditions_degenerate_to_plain_merge(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        src = spark.createDataFrame(
            [(1, "x", 1), (9, "y", 9)], "k long, prio string, v long"
        )
        t.merge_conditional(src, keys=["k"])  # update/insert always fire
        state = {r["k"]: (r["prio"], r["v"]) for r in t.read().collect()}
        assert state[1] == ("x", 1) and state[9] == ("y", 9)
        assert state[2] == ("low", 200)

    def test_delete_only_clause(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        src = spark.createDataFrame(
            [(3, "urgent", 0), (4, "low", 0)], "k long, prio string, v long"
        )
        t.merge_conditional(
            src, keys=["k"],
            update_when="false",          # never update
            delete_when="t.prio = 'urgent'",
            insert_when="false",          # never insert
        )
        state = {r["k"]: r["v"] for r in t.read().collect()}
        assert state == {1: 100, 2: 200, 4: 400}  # only urgent k=3 left


class TestBloomPointLookup:
    """Per-file bloom index (r10): point lookups skip files whose bloom
    excludes the key — the case footer ranges cannot prune (keys
    interleaved across files)."""

    def _table(self, spark, tmp_path):
        t = AcidTable(spark, str(tmp_path / "bl"))
        # interleave keys across 8 files so every file's [min, max]
        # covers every key — range pruning is USELESS here by design
        df = spark.range(0, 400).selectExpr(
            "id AS k", "id * 10 AS v", "CAST(id % 8 AS INT) AS part"
        ).repartition(8, "part").drop("part")
        t.write(df, stats_cols=["k"], bloom_cols=["k"], binpack=False)
        return t

    def test_bloom_prunes_where_ranges_cannot(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        n_files = len(t.snapshot_files())
        assert n_files >= 4
        # a key present in exactly one file: bloom keeps ~1 file where
        # ranges keep all (md5 is fixed, so this outcome is
        # deterministic, not flaky)
        keep, pruned = t.lookup_files("k", [7])
        assert pruned >= n_files - 2
        assert {r["k"]: r["v"] for r in t.point_lookup("k", [7]).collect()} == {
            7: 70
        }
        # an absent key prunes everything
        keep, _ = t.lookup_files("k", [10**9 + 7])
        assert keep == []
        assert t.point_lookup("k", [10**9 + 7]).count() == 0

    def test_multi_value_lookup_and_no_bloom_fallback(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        got = {
            r["k"]: r["v"]
            for r in t.point_lookup("k", [3, 250, 10**9]).collect()
        }
        assert got == {3: 30, 250: 2500}
        # files written WITHOUT blooms are always scanned (conservative)
        t2 = AcidTable(spark, str(tmp_path / "nb"))
        t2.write(
            spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
            stats_cols=["k"],
        )
        keep, pruned = t2.lookup_files("k", [1])
        assert len(keep) == len(t2.snapshot_files())
        assert {r["k"] for r in t2.point_lookup("k", [1]).collect()} == {1}

    def test_saturated_bloom_not_recorded(self):
        from data_pipeline_platform_spark.sinks.acid import _build_bloom

        assert _build_bloom(set(range(2000))) is None
        assert _build_bloom(set()) is None
        b = _build_bloom({1, 2, 3})
        assert b["m"] == 8192 and len(b["bits"]) == 8192 // 4

    def test_table_level_bloom_index_survives_merge(self, spark, tmp_path):
        """set_bloom_index: MERGE-rewritten and inserted files carry
        fresh blooms automatically, so point-lookup pruning survives
        rewrites (the parameter-per-write form covers only that write)."""
        t = AcidTable(spark, str(tmp_path / "tb"))
        df = spark.range(0, 200).selectExpr(
            "id AS k", "id AS v", "CAST(id % 4 AS INT) AS part"
        ).repartition(4, "part").drop("part")
        t.write(df, stats_cols=["k"], binpack=False)
        t.set_bloom_index(["k"])
        assert t.bloom_columns() == {"k"}
        # merge rewrites every file (keys interleave) + inserts new keys
        t.merge(
            spark.createDataFrame(
                [(k, k * 100) for k in (1, 2, 3, 500)], "k long, v long"
            ),
            keys=["k"],
        )
        blooms = [
            (a.get("stats") or {}).get("k", {}).get("bloom")
            for a in t.snapshot_files()
        ]
        assert any(b is not None for b in blooms)
        # an absent key is pruned by the rewritten files' fresh blooms
        # (ranges can't: the rewrite spans the whole key domain)
        keep, pruned = t.lookup_files("k", [10**9 + 1])
        assert keep == [] and pruned >= 1
        assert {r["v"] for r in t.point_lookup("k", [500, 1]).collect()} == {
            50000, 100,
        }
        t.drop_bloom_index(["k"])
        assert t.bloom_columns() == set()


def test_merge_update_set_partial_columns(spark, table):
    """UPDATE SET touches only listed columns; unlisted keep values;
    inserts take defaults / source / typed NULL."""
    table.write(
        _df(spark, [(1, "keep-a"), (2, "keep-b")]).withColumn(
            "bal", F.lit(100).cast("bigint")
        ),
        stats_cols=["k"],
    )
    delta = spark.createDataFrame([(1, 7), (9, 3)], "k long, d long")
    table.merge_update_set(
        delta,
        keys=["k"],
        set_exprs={"bal": "t.bal + s.d"},
        insert_defaults={"bal": "s.d"},
    )
    rows = {r["k"]: (r["v"], r["bal"]) for r in table.read().collect()}
    assert rows[1] == ("keep-a", 107)   # updated, v untouched
    assert rows[2] == ("keep-b", 100)   # unmatched target untouched
    assert rows[9] == (None, 3)         # insert: default bal, NULL v


def test_commit_publish_falls_back_when_hardlinks_unsupported(
    spark, table, monkeypatch
):
    """FUSE/object-store mounts can refuse os.link (r12 advisor): the
    commit must still publish via the exclusive-create fallback, keep
    the one-winner conflict check, and leave no stage litter."""
    import errno as _errno

    def no_link(src, dst, *a, **k):
        raise OSError(_errno.EPERM, "Operation not permitted", dst)

    monkeypatch.setattr(os, "link", no_link)
    v1 = table.write(_df(spark, [(1, "a"), (2, "b")]))
    assert v1 == 1 and table.read().count() == 2
    v2 = table.write(_df(spark, [(3, "c")]), mode="append")
    assert v2 == 2 and table.read().count() == 3
    # the published record is complete JSON
    rec = table._read_commit(2)
    assert rec["version"] == 2 and rec["op"].lower() == "append"
    # one-winner: a concurrent version-3 winner still conflicts
    with open(table._version_file(3), "x") as f:
        json.dump({"version": 3, "op": "append", "ts": 0.0,
                   "add": [], "remove": [], "meta": {}}, f)
    with pytest.raises(CommitConflictError):
        table._commit(2, "append", [], [])
    # no leaked .stage-* files
    stray = [f for f in os.listdir(table.log_dir) if ".stage-" in f]
    assert stray == []


def test_commit_unexpected_link_oserror_propagates(spark, table, monkeypatch):
    """Only link-unsupported errnos trigger the fallback; a genuine I/O
    failure (e.g. EIO) must surface, not silently degrade."""
    import errno as _errno

    table.write(_df(spark, [(1, "a")]))

    def eio(src, dst, *a, **k):
        raise OSError(_errno.EIO, "I/O error", dst)

    monkeypatch.setattr(os, "link", eio)
    with pytest.raises(OSError) as exc:
        table.write(_df(spark, [(2, "b")]), mode="append")
    assert exc.value.errno == _errno.EIO
