"""Source reader tests (SURVEY.md §2.1 S1-S6): file formats, batch
iteration, introspection, health."""

import pytest

from data_pipeline_platform_spark.sources.readers import BatchIngestor, register_views


@pytest.fixture()
def ing(spark):
    return BatchIngestor(spark, batch_size=100)


def test_ingest_sql_lazy(ing, users_df):
    users_df.createOrReplaceTempView("u_src")
    df = ing.ingest("SELECT id, name FROM u_src WHERE age >= :min_age", {"min_age": 35})
    assert df.count() == 3  # S1 + S4


def test_ingest_batches_chunking(ing, spark):
    """S3 parity: 250 rows / batch 100 -> [100, 100, 50] (reference
    batching arithmetic test shape: 3 rows / size 2 -> [2, 1])."""
    spark.range(250).createOrReplaceTempView("r250")
    sizes = [len(b) for b in ing.ingest_batches("SELECT * FROM r250")]
    assert sizes == [100, 100, 50]
    assert sum(sizes) == 250


def test_read_csv_roundtrip(ing, users_df, tmp_path):
    p = str(tmp_path / "users_csv")
    users_df.write.option("header", True).csv(p)
    back = ing.read_csv(p)
    assert back.count() == 5
    assert set(back.columns) == set(users_df.columns)
    # inferSchema recovers numerics
    assert dict(back.dtypes)["age"] in ("int", "bigint")


def test_read_json_roundtrip(ing, users_df, tmp_path):
    p = str(tmp_path / "users_json")
    users_df.write.json(p)
    back = ing.read_json(p)
    assert back.count() == 5
    assert "email" in back.columns


DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_jdbc_roundtrip_embedded_derby(ing, spark, tmp_path):
    """Live JDBC round-trip against embedded Derby (the derby jars ship
    inside pyspark for the Hive metastore, so the driver is already on
    the JVM classpath — no network, no install). Covers the reference's
    primary source path (batch_ingestor.py:67-100) end-to-end: bulk
    write, partitioned parallel read, and the query= path.

    Derby folds unquoted identifiers to UPPER while Spark's JDBC writer
    CREATEs quoted lowercase columns, so the query= path quotes — that
    is Derby semantics, not a reader quirk."""
    from data_pipeline_platform_spark.sinks.writers import BatchWriter

    url = f"jdbc:derby:{tmp_path}/testdb;create=true"
    df = spark.range(100).selectExpr("id", "id * 2 as v")
    BatchWriter(spark).write_jdbc(df, url, "t_rt", mode="overwrite", properties=DERBY)

    # partitioned read: 4 bound-split connections, the scale path
    back = ing.read_jdbc(
        url,
        table="t_rt",
        properties=DERBY,
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg({"v": "sum"}).collect()[0][0] == 9900

    # query pushdown path (S4 analog over JDBC)
    q = ing.read_jdbc(url, query='SELECT "id", "v" FROM t_rt WHERE "id" < 10', properties=DERBY)
    assert q.count() == 10

    # append mode accumulates
    BatchWriter(spark).write_jdbc(df.limit(5), url, "t_rt", mode="append", properties=DERBY)
    assert ing.read_jdbc(url, table="t_rt", properties=DERBY).count() == 105


def test_jdbc_requires_query_or_table(ing):
    with pytest.raises(ValueError):
        ing.read_jdbc(url="jdbc:postgresql://x/db")
    with pytest.raises(ValueError):
        # partitioned read requires dbtable, not query
        ing.read_jdbc(
            url="jdbc:x",
            query="SELECT 1",
            partition_column="id",
            lower_bound=0,
            upper_bound=10,
        )


def test_get_table_info(ing, users_df):
    users_df.createOrReplaceTempView("info_t")
    info = ing.get_table_info("info_t")
    assert info["row_count"] == 5
    cols = {c["name"]: c["type"] for c in info["columns"]}
    assert cols["id"] == "bigint" and cols["name"] == "string"


def test_connection_probe(ing):
    assert ing.test_connection() is True


def test_register_views(spark):
    register_views(spark, "/root/testdata/sf0.001", tables=("region", "nation"))
    assert spark.table("region").count() == 5
    assert spark.table("nation").count() == 25


def test_events_ts_normalized(spark):
    """The nanos->timestamp conversion must survive both load paths."""
    from data_pipeline_platform_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    row = ev.orderBy("event_id").limit(1).collect()[0]
    assert row["ts"].year == 2024


def test_nanos_refresh_of_any_ts_table_normalizes(spark, tmp_path):
    """r6 ADVICE regression: a nanos-encoded refresh of orders/lineitem
    (not just events) must read through load_table as contract
    timestamps with identical wall-clock values — drift_check accepts
    ns/int64 for these columns, so the reader must actually absorb it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_platform_spark.sources.readers import load_table

    src = "/root/testdata/sf0.001/orders.parquet"
    t = pq.read_table(src)
    idx = t.schema.get_field_index("o_orderdate")
    t2 = t.set_column(idx, "o_orderdate", t.column("o_orderdate").cast(pa.timestamp("ns")))
    # store_schema=False drops the arrow schema hint, so Spark sees the
    # raw parquet TIMESTAMP(NANOS) type — the crashing encoding
    pq.write_table(t2, str(tmp_path / "orders.parquet"), store_schema=False)

    got = load_table(spark, str(tmp_path), "orders")
    assert dict(got.dtypes)["o_orderdate"] == "timestamp"
    want_rows = (
        load_table(spark, "/root/testdata/sf0.001", "orders")
        .select("o_orderkey", "o_orderdate").orderBy("o_orderkey").limit(10).collect()
    )
    got_rows = got.select("o_orderkey", "o_orderdate").orderBy("o_orderkey").limit(10).collect()
    assert got_rows == want_rows


# FIXTURES.md §2 contract: the dtype every query is entitled to assume,
# per table, regardless of how the parquet files encode it. Data
# refreshes have shipped timestamps as nanos-as-long, adjusted-to-UTC
# TIMESTAMP, and TIMESTAMP_NTZ — load_table owns absorbing that drift.
_CONTRACT = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {"c_custkey": "bigint", "c_acctbal": "double", "c_mktsegment": "string"},
    "supplier": {"s_suppkey": "bigint", "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_retailprice": "double", "p_size": "int"},
    "orders": {"o_orderkey": "bigint", "o_totalprice": "double", "o_orderdate": "timestamp"},
    "lineitem": {
        "l_orderkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_shipdate": "timestamp",
    },
    "events": {"event_id": "bigint", "ts": "timestamp", "value": "double", "props": "string"},
    "documents": {"doc_id": "bigint", "text": "string", "n_chars": "bigint"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.parametrize("table", sorted(_CONTRACT))
def test_schema_contract(spark, table):
    """Every table comes out of load_table with contract dtypes and no
    TIMESTAMP_NTZ leakage (NTZ arithmetic like CAST(ts AS BIGINT) is an
    AnalysisException downstream, so a leak breaks queries at runtime)."""
    from data_pipeline_platform_spark.sources.readers import load_table

    df = load_table(spark, "/root/testdata/sf0.001", table)
    dtypes = dict(df.dtypes)
    for col, want in _CONTRACT[table].items():
        assert dtypes[col] == want, f"{table}.{col}: {dtypes[col]} != {want}"
    assert not any("timestamp_ntz" in t for t in dtypes.values()), dtypes


def test_csv_corrupt_record_handling(ing, spark, tmp_path):
    """PERMISSIVE nulls malformed fields; DROPMALFORMED skips the row;
    FAILFAST raises (reference lenient-coercion parity, SURVEY §1.2)."""
    p = tmp_path / "bad.csv"
    p.write_text("id,age\n1,25\n2,not_a_number\n3,35\n")
    schema = "id INT, age INT"

    permissive = ing.read_csv(str(p), infer_schema=False, schema=schema).collect()
    by_id = {r["id"]: r["age"] for r in permissive}
    assert by_id[1] == 25 and by_id[2] is None and by_id[3] == 35

    # DROPMALFORMED applies to structurally malformed rows (wrong token
    # count); type-cast failures are field-level and null out instead
    p2 = tmp_path / "bad2.csv"
    p2.write_text("id,age\n1,25\n2,30,extra,fields,here\n3,35\n")
    dropped = ing.read_csv(str(p2), infer_schema=False, schema=schema, mode="DROPMALFORMED")
    # len(collect()), not count(): count() prunes every column, so the
    # parser never sees the malformed fields (SPARK-21610)
    assert len(dropped.collect()) == 2

    with __import__("pytest").raises(Exception):
        ing.read_csv(str(p), infer_schema=False, schema=schema, mode="FAILFAST").collect()


def test_json_corrupt_record_column(ing, spark, tmp_path):
    p = tmp_path / "bad.json"
    p.write_text('{"id": 1, "v": 10}\n{broken json line\n{"id": 2, "v": 20}\n')
    df = ing.read_json(
        str(p),
        schema="id LONG, v LONG, _corrupt_record STRING",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    rows = df.collect()
    good = [r for r in rows if r["id"] is not None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 2 and len(bad) == 1


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from data_pipeline_platform_spark.sources.readers import BatchIngestor, load_table

    nation = load_table(spark, "/root/testdata/sf0.001", "nation")
    path = str(tmp_path / "nation_orc")
    nation.write.orc(path)
    ing = BatchIngestor(spark)
    out = ing.read_orc(path).filter("n_regionkey = 2").select("n_name")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == nation.filter("n_regionkey = 2").count()
    # predicate reaches the ORC scan
    assert "PushedFilters" in plan and "n_regionkey" in plan


def test_text_reader_lines_and_whole(spark, tmp_path):
    from data_pipeline_platform_spark.sources.readers import BatchIngestor

    p = tmp_path / "docs"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("single doc body")
    ing = BatchIngestor(spark)
    lines = ing.read_text(str(p))
    assert lines.count() == 3 and lines.columns == ["value"]
    whole = ing.read_text(str(p), whole_text=True)
    assert whole.count() == 2
    texts = {r["value"] for r in whole.collect()}
    assert "single doc body" in texts


def test_runner_ingests_orc_and_text(spark, tmp_path):
    from data_pipeline_platform_spark.plans.runner import PipelineRunner
    from data_pipeline_platform_spark.sources.readers import load_table

    region = load_table(spark, "/root/testdata/sf0.001", "region")
    orc_path = str(tmp_path / "region_orc")
    region.write.orc(orc_path)
    runner = PipelineRunner(spark)
    df = runner.ingest_stage({"path": orc_path, "format": "orc"})
    assert df.count() == 5

    txt = tmp_path / "t"
    txt.mkdir()
    (txt / "x.txt").write_text("hello\nworld\n")
    df = runner.ingest_stage({"path": str(txt), "format": "text"})
    assert df.count() == 2


def test_ingest_files_jsonl_round_trips_documents(spark, tmp_path):
    """A JSONL drop of the documents table must read back identical to
    the parquet original under the same explicit schema."""
    from data_pipeline_platform_spark.sources.readers import (
        ingest_files,
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    p = str(tmp_path / "docs_jsonl")
    docs.write.json(p)
    back = ingest_files(spark, p, "jsonl", docs.schema)
    assert back.schema == docs.schema
    assert sorted(back.collect()) == sorted(docs.collect())


def test_ingest_files_csv_round_trips_region(spark, tmp_path):
    from data_pipeline_platform_spark.sources.readers import (
        ingest_files,
        load_table,
    )

    region = load_table(spark, "/root/testdata/sf0.001", "region")
    p = str(tmp_path / "region_csv")
    region.write.option("header", "true").csv(p)
    back = ingest_files(spark, p, "csv", region.schema)
    assert sorted(back.collect()) == sorted(region.collect())


def test_ingest_files_jsonl_events_honors_timestamp_contract(spark, tmp_path):
    """Events via JSONL must come out with the same session-TZ
    timestamp type and wall-clock values as the parquet path — the
    contract normalization is format-independent."""
    from data_pipeline_platform_spark.sources.readers import (
        ingest_files,
        load_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    p = str(tmp_path / "events_jsonl")
    # Spark's default JSON timestampFormat carries millis only — a
    # microsecond-precision contract column must pin the format on BOTH
    # sides (exactly the encoding-drift class ingest_files exists for)
    micro_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ev.write.option("timestampFormat", micro_fmt).json(p)
    back = ingest_files(
        spark, p, "jsonl", ev.schema,
        contract_table="events", timestampFormat=micro_fmt,
    )
    assert back.schema["ts"].dataType.simpleString() == "timestamp"
    a = sorted((r["event_id"], r["ts"]) for r in back.select("event_id", "ts").collect())
    b = sorted((r["event_id"], r["ts"]) for r in ev.select("event_id", "ts").collect())
    assert a == b


def test_ingest_files_rejects_unknown_format(spark):
    import pytest as _pytest

    from data_pipeline_platform_spark.sources.readers import ingest_files

    with _pytest.raises(ValueError, match="unsupported format"):
        ingest_files(spark, "/nope", "avro", None)


def test_ingest_files_orc_round_trips_orders_slice(spark, tmp_path):
    """ingest_files' ORC branch: schema-pinned read-back of a Spark
    ORC write is value-identical for lossless types."""
    from data_pipeline_platform_spark.sources.readers import ingest_files

    df = spark.createDataFrame(
        [(1, "O", 123456, "1995-03-05"), (2, "F", 999, "1997-11-30")],
        "o_orderkey long, o_orderstatus string, cents long, ds string",
    ).selectExpr("o_orderkey", "o_orderstatus", "cents", "CAST(ds AS DATE) AS d")
    path = str(tmp_path / "orc")
    df.write.orc(path)
    back = ingest_files(
        spark, path, "orc", "o_orderkey bigint, o_orderstatus string, cents bigint, d date"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_spread_scan_spreads_narrow_single_split(spark, tmp_path):
    """A single-row-group parquet scan (one input split) fans out to
    defaultParallelism so per-row-heavy downstream work uses every
    core."""
    from data_pipeline_platform_spark.sources.readers import spread_scan

    p = str(tmp_path / "one_split")
    spark.range(1000).coalesce(1).write.parquet(p)
    out = spread_scan(spark.read.parquet(p))
    assert (
        out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )
    assert out.count() == 1000


def test_spread_scan_leaves_wide_plans_unchanged_without_execution(spark):
    """On a plan with a wide operator (aggregate/join/window) the probe
    must NOT run: under AQE, df.rdd.getNumPartitions() materializes
    every upstream query stage — a hidden re-execution of the pipeline
    per call. spread_scan now reads the optimized logical plan and
    returns such frames untouched, scheduling ZERO jobs."""
    from data_pipeline_platform_spark.sources.readers import spread_scan

    sc = spark.sparkContext
    agg = spark.range(10_000).groupBy("id").count()
    # job-id watermark: ids are monotone per context
    sc.parallelize([0], 1).count()
    ids_before = max(sc.statusTracker().getJobIdsForGroup(None))
    out = spread_scan(agg)
    ids_after = max(sc.statusTracker().getJobIdsForGroup(None))
    assert out is agg  # unchanged frame, no added repartition
    assert ids_after == ids_before  # and no job was scheduled


def test_spread_scan_leaves_cached_plans_unchanged(spark):
    """Cached relations pin their own partitioning
    (canChangeCachedPlanOutputPartitioning default) — spread_scan must
    not wrap them in a repartition or force materialization."""
    from data_pipeline_platform_spark.sources.readers import spread_scan

    df = spark.range(100).selectExpr("id", "id * 2 AS v").cache()
    try:
        out = spread_scan(df)
        assert out is df
    finally:
        df.unpersist()
