"""AcidTable schema evolution: the commit log (not the data files) is
the source of truth for the table schema, per the Delta metaData-action
pattern. Files written before a column existed read as NULL for it;
appends validate against the logged schema; the schema itself
time-travels with the snapshot.

Reference analog: none (the reference's batch writer trusts the
incoming DataFrame schema outright, src/pipeline/persistence/
batch_writer.py) — this is the first wall a long-lived lake table hits
when upstream adds a field mid-stream.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.sinks.acid import (
    AcidTable,
    SchemaMismatchError,
)


@pytest.fixture()
def table(spark, tmp_path):
    return AcidTable(spark, str(tmp_path / "evo"))


def _base(spark):
    return spark.range(4).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def _wide(spark):
    return spark.range(4, 6).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.lit("web").alias("ch"),
    )


def test_append_new_column_refused_without_merge_schema(spark, table):
    table.write(_base(spark))
    with pytest.raises(SchemaMismatchError, match="merge_schema=True"):
        table.write(_wide(spark), mode="append")


def test_merge_schema_append_widens_and_null_pads_old_files(spark, table):
    table.write(_base(spark))
    table.write(_wide(spark), mode="append", merge_schema=True)
    snap = {r["k"]: (r["v"], r["ch"]) for r in table.read().collect()}
    assert snap[0] == (0, None)  # pre-evolution file: NULL-padded
    assert snap[4] == (40, "web")
    assert table.read().columns == ["k", "v", "ch"]


def test_schema_time_travels(spark, table):
    table.write(_base(spark))
    table.write(_wide(spark), mode="append", merge_schema=True)
    assert table.read(1).columns == ["k", "v"]  # v1 never had ch
    assert table.table_schema(1).names == ["k", "v"]
    assert table.table_schema(2).names == ["k", "v", "ch"]


def test_append_missing_column_fills_null(spark, table):
    table.write(_base(spark))
    table.write(_wide(spark), mode="append", merge_schema=True)
    table.write(
        spark.createDataFrame([(9, 90)], "k long, v long"), mode="append"
    )
    row = table.read().filter("k = 9").collect()[0]
    assert row["ch"] is None


def test_append_type_conflict_refused(spark, table):
    table.write(_base(spark))
    bad = spark.createDataFrame([(1, "oops")], "k long, v string")
    with pytest.raises(SchemaMismatchError, match="'v'"):
        table.write(bad, mode="append")


def test_merge_source_missing_column_refused(spark, table):
    table.write(_base(spark))
    table.write(_wide(spark), mode="append", merge_schema=True)
    with pytest.raises(SchemaMismatchError, match="lacks table column"):
        table.merge(
            spark.createDataFrame([(1, 5)], "k long, v long"), keys=["k"]
        )


def test_merge_rewrite_of_pre_evolution_file_keeps_new_column(spark, table):
    """The pinned touched-file read: updating a row that lives in a
    pre-evolution file must not drop the new column from the rewrite."""
    table.write(_base(spark), stats_cols=["k"])
    table.write(_wide(spark), mode="append", merge_schema=True)
    src = spark.createDataFrame([(0, 111, "store")], "k long, v long, ch string")
    table.merge(src, keys=["k"])
    snap = {r["k"]: (r["v"], r["ch"]) for r in table.read().collect()}
    assert snap[0] == (111, "store")
    assert snap[4] == (40, "web")  # untouched post-evolution row intact
    assert snap[1] == (10, None)  # rewritten survivor stays NULL


def test_merge_can_introduce_column_with_merge_schema(spark, table):
    table.write(_base(spark), stats_cols=["k"])
    src = spark.createDataFrame([(0, 111, "store")], "k long, v long, ch string")
    with pytest.raises(SchemaMismatchError, match="merge_schema=True"):
        table.merge(src, keys=["k"])
    table.merge(src, keys=["k"], merge_schema=True)
    assert table.table_schema().names == ["k", "v", "ch"]
    snap = {r["k"]: (r["v"], r["ch"]) for r in table.read().collect()}
    assert snap[0] == (111, "store")
    assert snap[1] == (10, None)


def test_changes_across_evolution_span_uses_destination_schema(spark, table):
    table.write(_base(spark), stats_cols=["k"])
    v1 = table.latest_version()
    table.write(_wide(spark), mode="append", merge_schema=True)
    src = spark.createDataFrame([(0, 111, "store")], "k long, v long, ch string")
    table.merge(src, keys=["k"])
    feed = table.changes(["k"], v1)
    assert set(feed.columns) == {"change_type", "k", "v", "ch"}
    by = {(r["change_type"], r["k"]): r for r in feed.collect()}
    # the pre-evolution preimage surfaces ch as NULL
    assert by[("update_preimage", 0)]["ch"] is None
    assert by[("update_postimage", 0)]["ch"] == "store"
    assert by[("insert", 4)]["ch"] == "web"


def test_delete_and_compact_preserve_evolved_schema(spark, table):
    table.write(_base(spark), stats_cols=["k"])
    table.write(_wide(spark), mode="append", merge_schema=True)
    table.delete("k = 2")
    table.compact()
    snap = table.read()
    assert snap.columns == ["k", "v", "ch"]
    assert snap.count() == 5
    assert snap.filter("ch = 'web'").count() == 2


def test_restore_reverts_schema(spark, table):
    table.write(_base(spark))
    table.write(_wide(spark), mode="append", merge_schema=True)
    table.restore(1)
    assert table.table_schema().names == ["k", "v"]
    assert table.read().columns == ["k", "v"]
    assert table.read().count() == 4


def test_clone_carries_schema(spark, table, tmp_path):
    table.write(_base(spark))
    table.write(_wide(spark), mode="append", merge_schema=True)
    clone = table.clone(str(tmp_path / "clone"))
    assert clone.table_schema().names == ["k", "v", "ch"]
    assert clone.read().columns == ["k", "v", "ch"]


def test_emptied_table_reads_with_logged_schema(spark, table):
    table.write(_base(spark))
    table.write(_wide(spark), mode="append", merge_schema=True)
    table.delete("TRUE")
    empty = table.read()
    assert empty.columns == ["k", "v", "ch"]
    assert empty.count() == 0


def test_legacy_tables_without_logged_schema_still_read(spark, table):
    """Commits written before schema tracking carry no schema key;
    table_schema() is None and reads fall back to parquet
    self-description."""
    import json
    import os

    table.write(_base(spark))
    # strip the schema key from the commit, simulating a legacy log
    vf = table._version_file(1)
    with open(vf) as f:
        payload = json.load(f)
    payload.pop("schema", None)
    os.remove(vf)
    with open(vf, "w") as f:
        json.dump(payload, f)
    fresh = AcidTable(spark, table.path)
    assert fresh.table_schema() is None
    assert fresh.read().count() == 4


def test_consumer_replay_noop_across_evolution(spark, tmp_path):
    """Exactly-once survives the widening span: re-running
    process_available after the schema change folds nothing twice."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.sinks.matview import MaterializedAgg
    from data_pipeline_platform_spark.streaming.cdf import ChangeFeedConsumer

    bronze = AcidTable(spark, str(tmp_path / "bronze"))
    view = MaterializedAgg(
        spark,
        str(tmp_path / "silver"),
        keys=["ch"],
        aggs=[("n", "count", ""), ("s", "sum", "v")],
    )

    def norm(df):
        if "ch" not in df.columns:
            df = df.withColumn("ch", F.lit(None).cast("string"))
        return df

    consumer = ChangeFeedConsumer(
        bronze, source_keys=["k"], view=view, count_col="n", feed_transform=norm
    )
    bronze.write(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
        stats_cols=["k"],
    )
    consumer.process_available()
    bronze.write(
        spark.createDataFrame([(3, 30, "web")], "k long, v long, ch string"),
        mode="append",
        merge_schema=True,
    )
    consumer.process_available()
    state1 = {r["ch"]: (r["n"], r["s"]) for r in consumer.state().collect()}
    # replay: a fresh consumer handle resumes from the marker, no-op
    fresh = ChangeFeedConsumer(
        bronze, source_keys=["k"], view=view, count_col="n", feed_transform=norm
    )
    out = fresh.process_available()
    assert out["versions_behind"] == 0
    state2 = {r["ch"]: (r["n"], r["s"]) for r in fresh.state().collect()}
    assert state2 == state1
    assert state1[None] == (2, 30) and state1["web"] == (1, 30)
