"""Write-strategy tests (reference tests/unit/test_batch_writer.py:44-120:
strategy count checks + batched writes)."""

import pytest

from data_pipeline_platform_spark.sinks.writers import (
    BatchWriter,
    DuplicateKeyError,
    WriteStrategy,
)


@pytest.fixture()
def writer(spark, tmp_warehouse):
    return BatchWriter(spark, base_path=tmp_warehouse)


def test_insert_then_append_accumulates(writer, users_df):
    writer.write(users_df, "users", WriteStrategy.INSERT)
    writer.write(users_df, "users", WriteStrategy.APPEND)
    assert writer.read_table("users").count() == 10


def test_replace_truncates(writer, users_df):
    writer.write(users_df, "users", WriteStrategy.INSERT)
    writer.write(users_df.limit(2), "users", WriteStrategy.REPLACE)
    assert writer.read_table("users").count() == 2


def test_upsert_updates_and_inserts(writer, spark, users_df):
    writer.write(users_df, "users", WriteStrategy.INSERT)
    updates = spark.createDataFrame(
        [
            (1, "Alicia", "alicia@example.com", 26, None),  # update
            (99, "Zed", "zed@example.com", 50, None),  # insert
        ],
        "id long, name string, email string, age long, created_at timestamp",
    )
    stat = writer.write(updates, "users", WriteStrategy.UPSERT, upsert_keys=["id"])
    out = writer.read_table("users")
    assert stat["rows_written"] == 6
    rows = {r["id"]: r["name"] for r in out.collect()}
    assert rows[1] == "Alicia" and rows[99] == "Zed" and rows[2] == "Bob"


def test_upsert_duplicate_keys_in_batch_last_wins(writer, spark):
    base = spark.createDataFrame([(1, "old")], "id long, v string")
    writer.write(base, "t", WriteStrategy.INSERT)
    dup = spark.createDataFrame([(1, "first"), (1, "second")], "id long, v string")
    writer.write(dup, "t", WriteStrategy.UPSERT, upsert_keys=["id"])
    assert writer.read_table("t").collect()[0]["v"] == "second"


def test_upsert_requires_keys(writer, users_df):
    from data_pipeline_platform_spark.utils.retry import RetryError

    with pytest.raises((ValueError, RetryError)):
        writer.write(users_df, "users", WriteStrategy.UPSERT)


def test_insert_duplicate_check(writer, users_df):
    from data_pipeline_platform_spark.utils.retry import RetryError

    writer.write(users_df, "users", WriteStrategy.INSERT)
    with pytest.raises((DuplicateKeyError, RetryError)):
        writer.write(
            users_df, "users", WriteStrategy.INSERT, upsert_keys=["id"], check_duplicates=True
        )


def test_unknown_strategy_maps_to_insert():
    assert WriteStrategy.from_string("nonsense") == WriteStrategy.INSERT
    assert WriteStrategy.from_string("UPSERT") == WriteStrategy.UPSERT


def test_write_stats(writer, users_df):
    writer.write(users_df, "users", WriteStrategy.INSERT)
    stats = writer.get_write_stats("users")
    assert len(stats) == 1
    assert stats[0]["rows_written"] == 5
    assert stats[0]["strategy"] == "insert"
    writer.clear_stats()
    assert writer.get_write_stats() == []


def test_partitioned_write(writer, users_df, spark):
    writer.write(users_df, "by_age", WriteStrategy.REPLACE, partition_by=["age"])
    out = writer.read_table("by_age")
    assert out.count() == 5 and "age" in out.columns


def test_upsert_partitioned_target(writer, spark):
    # partition values that type-inference leaves as strings (date-like
    # directory names would read back as DateType)
    base = spark.createDataFrame(
        [(1, "a", "us"), (2, "b", "eu")], "k long, v string, region string"
    )
    writer.write(base, "pt", WriteStrategy.REPLACE, partition_by=["region"])
    updates = spark.createDataFrame(
        [(2, "B", "eu"), (3, "c", "ap")], "k long, v string, region string"
    )
    writer.write(updates, "pt", WriteStrategy.UPSERT, upsert_keys=["k"], partition_by=["region"])
    rows = {r["k"]: (r["v"], r["region"]) for r in writer.read_table("pt").collect()}
    assert rows == {1: ("a", "us"), 2: ("B", "eu"), 3: ("c", "ap")}


def test_upsert_recovers_from_crash_mid_swap(writer, spark):
    """A crash between `path -> .__old__` and `.__staging__ -> path`
    leaves the backup as the ONLY copy of the table. The retried upsert
    must restore it and merge against the full pre-crash target, not
    treat the table as empty (which would drop every existing row)."""
    import os

    base = spark.createDataFrame([(i, "orig") for i in range(10)], "id long, name string")
    writer.write(base, "t", WriteStrategy.INSERT)
    path = writer._table_path("t")
    os.rename(path, path + ".__old__")  # simulate crash after 1st rename
    updates = spark.createDataFrame([(0, "updated"), (500, "new")], "id long, name string")
    writer.write(updates, "t", WriteStrategy.UPSERT, upsert_keys=["id"])
    out = {r["id"]: r["name"] for r in writer.read_table("t").collect()}
    assert len(out) == 11  # 10 originals (1 updated) + 1 insert
    assert out[0] == "updated" and out[500] == "new" and out[5] == "orig"
    assert not os.path.isdir(path + ".__old__")
    assert not os.path.isdir(path + ".__staging__")


def test_upsert_discards_stale_backup_and_staging(writer, spark):
    """Backup beside a live table (crash after swap, before cleanup) and
    leftover staging are both stale — discarded, table treated as
    current."""
    import os

    base = spark.createDataFrame([(i, "orig") for i in range(10)], "id long, name string")
    writer.write(base, "t", WriteStrategy.INSERT)
    path = writer._table_path("t")
    # fake stale state: bogus backup + bogus staging
    os.makedirs(path + ".__old__")
    spark.range(3).write.parquet(path + ".__staging__")
    updates = spark.createDataFrame([(1, "u")], "id long, name string")
    writer.write(updates, "t", WriteStrategy.UPSERT, upsert_keys=["id"])
    out = {r["id"]: r["name"] for r in writer.read_table("t").collect()}
    assert len(out) == 10 and out[1] == "u"
    assert not os.path.isdir(path + ".__old__")
    assert not os.path.isdir(path + ".__staging__")


def test_savepoint_rollback_restores_and_drops(writer, spark):
    """Savepoint analog (reference batch_writer.py:427-454): an exception
    inside the scope restores every touched table to its pre-scope state
    and removes tables created inside the scope."""
    base = spark.createDataFrame([(i, "orig") for i in range(5)], "id long, name string")
    writer.write(base, "t", WriteStrategy.INSERT)
    with pytest.raises(RuntimeError, match="boom"):
        with writer.savepoint("cp1"):
            writer.write(
                spark.createDataFrame([(1, "mut")], "id long, name string"),
                "t", WriteStrategy.UPSERT, upsert_keys=["id"],
            )
            writer.write(base, "created_inside", WriteStrategy.INSERT)
            raise RuntimeError("boom")
    out = {r["id"]: r["name"] for r in writer.read_table("t").collect()}
    assert out == {i: "orig" for i in range(5)}  # mutation rolled back
    assert not writer.table_exists("created_inside")


def test_savepoint_commit_and_nesting(writer, spark):
    """Success discards snapshots; an inner rollback must not disturb
    the outer scope's committed writes (ROLLBACK TO SAVEPOINT parity)."""
    import os

    base = spark.createDataFrame([(i, "v0") for i in range(3)], "id long, name string")
    writer.write(base, "t", WriteStrategy.INSERT)
    with writer.savepoint("outer"):
        writer.write(
            spark.createDataFrame([(0, "v1")], "id long, name string"),
            "t", WriteStrategy.UPSERT, upsert_keys=["id"],
        )
        with pytest.raises(ValueError):
            with writer.savepoint("inner"):
                writer.write(
                    spark.createDataFrame([(1, "v2")], "id long, name string"),
                    "t", WriteStrategy.UPSERT, upsert_keys=["id"],
                )
                raise ValueError("inner fails")
    out = {r["id"]: r["name"] for r in writer.read_table("t").collect()}
    # outer write survived, inner write rolled back
    assert out == {0: "v1", 1: "v0", 2: "v0"}
    # no snapshot litter
    table_dir = os.path.dirname(writer._table_path("t"))
    assert not [f for f in os.listdir(table_dir) if "__sp_" in f]


def test_write_clustered_rowgroup_stats_prunable(spark, tmp_path):
    """Clustered layout contract, checked from the parquet footers: with
    range-partition + sort on l_orderkey, per-file [min, max] key ranges
    must be near-disjoint, so a key-range predicate can skip most row
    groups via statistics. The same data written unclustered has every
    file spanning ~the whole key range (nothing prunable). (The cluster
    key is the bigint key, not the timestamp: Spark's INT96 timestamp
    encoding carries no parquet min/max statistics to prune on.)"""
    import pyarrow.parquet as pq
    from data_pipeline_platform_spark.sinks.writers import BatchWriter
    from data_pipeline_platform_spark.sources.readers import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    writer = BatchWriter(spark, base_path=str(tmp_path))
    path = writer.write_clustered(li, "li_clustered", ["l_orderkey"], num_files=8)

    def file_ranges(p):
        import glob as g

        ranges = []
        for f in sorted(g.glob(f"{p}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(len(md.schema))]
            col = names.index("l_orderkey")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if mins:
                ranges.append((min(mins), max(maxs)))
        return ranges

    clustered = file_ranges(path)
    assert len(clustered) >= 4
    # near-disjoint: each file's range overlaps at most the boundary of
    # the next (range partitioning splits at exact key boundaries)
    for (a_min, a_max), (b_min, b_max) in zip(sorted(clustered), sorted(clustered)[1:]):
        assert a_max <= b_min or a_max <= b_max  # ordered, minimal overlap

    # selectivity: a 1-file-wide date slice must exclude most files
    lo = sorted(clustered)[0][1]  # first file's max
    excluded = sum(1 for mn, mx in clustered if mn > lo)
    assert excluded >= len(clustered) - 2

    # control: unclustered write -> every file spans ~the full range
    li.repartition(8).write.mode("overwrite").parquet(str(tmp_path / "li_plain"))
    plain = file_ranges(str(tmp_path / "li_plain"))
    overall_min = min(mn for mn, _ in plain)
    excluded_plain = sum(1 for mn, mx in plain if mn > lo)
    assert excluded_plain == 0, "random layout should not be prunable"
    assert overall_min == min(mn for mn, _ in clustered)


def test_write_zorder_prunes_on_both_columns(spark, tmp_path):
    """Z-order layout contract from the parquet footers: after Morton
    clustering on (l_orderkey, l_partkey), BOTH columns' per-file
    [min, max] spans must narrow vs an unclustered control — the
    multi-column pruning 1-D clustering cannot give. Plan contract: no
    global-window single task (boundaries are broadcast literals)."""
    import glob as g

    import pyarrow.parquet as pq

    from data_pipeline_platform_spark.sinks.writers import BatchWriter
    from data_pipeline_platform_spark.sources.readers import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    writer = BatchWriter(spark, base_path=str(tmp_path))
    path = writer.write_zorder(li, "li_z", ["l_orderkey", "l_partkey"], num_files=16)

    def spans(p, colname):
        out = []
        for f in sorted(g.glob(f"{p}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(len(md.schema))]
            col = names.index(colname)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if mins:
                out.append(max(maxs) - min(mins))
        return out

    li.repartition(16).write.mode("overwrite").parquet(str(tmp_path / "li_plain"))

    for col in ("l_orderkey", "l_partkey"):
        z = spans(path, col)
        plain = spans(str(tmp_path / "li_plain"), col)
        assert len(z) >= 8
        mean_z = sum(z) / len(z)
        mean_plain = sum(plain) / len(plain)
        # each file should cover a materially smaller slice of BOTH
        # dimensions than the shuffled control
        assert mean_z < 0.6 * mean_plain, (col, mean_z, mean_plain)

    # round-trip: no helper columns leak into the written schema
    cols = set(spark.read.parquet(path).columns)
    assert cols == {"l_orderkey", "l_partkey", "l_quantity"}


def test_backfill_partitions_touches_only_named_partitions(spark, tmp_path):
    """Backfill of two dates must replace exactly those partition dirs,
    leave the rest byte-identical, ignore out-of-range rows in the
    recompute frame (the safety interlock), and replay idempotently."""
    import os

    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sinks.writers import BatchWriter

    w = BatchWriter(spark, base_path=str(tmp_path / "lake"))
    full = spark.createDataFrame(
        [(i, f"d{i % 4}", i * 10) for i in range(40)],
        "id long, day string, v long",
    )
    w.write(full, "facts", partition_by=["day"])
    path = str(tmp_path / "lake" / "default" / "facts")

    def files_of(day):
        d = f"{path}/day={day}"
        return {
            f: os.path.getmtime(f"{d}/{f}")
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before = {d: files_of(d) for d in ("d0", "d1", "d2", "d3")}

    # recompute d1 and d2 with new values; frame also carries d3 rows
    # that must NOT be written (out of the requested range)
    recompute = spark.createDataFrame(
        [(100 + i, day, 999) for i, day in enumerate(["d1", "d2", "d3"] * 3)],
        "id long, day string, v long",
    )
    stat = w.backfill_partitions(recompute, "facts", "day", ["d1", "d2"])
    assert stat["rows_written"] == 6
    after = spark.read.parquet(path)
    assert after.filter("day = 'd1'").count() == 3
    assert set(
        r["v"] for r in after.filter("day IN ('d1','d2')").collect()
    ) == {999}
    # untouched partitions keep their exact files
    assert files_of("d0") == before["d0"]
    assert files_of("d3") == before["d3"]
    assert after.filter("day = 'd3'").count() == 10

    # replay: same call converges to the same state
    w.backfill_partitions(recompute, "facts", "day", ["d1", "d2"])
    again = spark.read.parquet(path)
    assert again.filter("day IN ('d1','d2')").count() == 6
    assert again.count() == 20 + 6
