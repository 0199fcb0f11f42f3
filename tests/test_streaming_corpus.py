"""Streaming corpus ingestion: quality filter + lake-table dedup must
equal the batch curation pipeline deduped by fingerprint, including
under source replay (every file delivered twice)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_platform_spark.sinks.writers import BatchWriter
from data_pipeline_platform_spark.sources.readers import load_table
from data_pipeline_platform_spark.streaming.corpus import (
    curated_ingest,
    read_documents_stream,
    stream_curation,
)

SF = "/root/testdata/sf0.001"


def _batch_expected(spark):
    """Batch twin: curation filter then min-doc_id-per-fingerprint."""
    from data_pipeline_platform_spark.functions.text import q_curation_pipeline

    curated = q_curation_pipeline(spark, SF)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        curated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def test_stream_curation_matches_batch_on_static_frame(spark):
    """The same function body runs on a batch frame — predicates and
    projection must match q_curation_pipeline exactly."""
    from data_pipeline_platform_spark.functions.text import q_curation_pipeline

    docs = load_table(spark, SF, "documents")
    a = stream_curation(docs).orderBy("doc_id").collect()
    b = q_curation_pipeline(spark, SF).orderBy("doc_id").collect()
    assert a == b


def test_streaming_ingest_dedups_under_replay(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    stream_dir = str(tmp_path / "docs_in")
    # simulated redelivery: every document arrives twice, across
    # different files/micro-batches
    docs.repartition(3).write.parquet(stream_dir)
    docs.repartition(2).write.mode("append").parquet(stream_dir)

    writer = BatchWriter(spark, base_path=str(tmp_path / "lake"))
    stream = read_documents_stream(spark, stream_dir, max_files_per_trigger=2)
    q = curated_ingest(
        stream_curation(stream),
        writer,
        table="curated_docs",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {
        r["fingerprint"]: (r["doc_id"], r["token_count"])
        for r in writer.read_table("curated_docs").collect()
    }
    expected = {
        r["fingerprint"]: (r["doc_id"], r["token_count"])
        for r in _batch_expected(spark).collect()
    }
    assert got == expected
    # idempotency: a second full replay adds nothing
    stream2 = read_documents_stream(spark, stream_dir, max_files_per_trigger=4)
    q2 = curated_ingest(
        stream_curation(stream2),
        writer,
        table="curated_docs",
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(180)
    assert writer.read_table("curated_docs").count() == len(expected)


def test_streaming_hll_matches_batch_bitwise(spark, tmp_path):
    """After the stream drains, the merged register table must equal
    the batch-computed registers bit for bit — and therefore the
    estimates too (registers are exact integers; MAX-merge across
    micro-batches loses nothing)."""
    from data_pipeline_platform_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )
    from data_pipeline_platform_spark.sources.readers import load_table
    from data_pipeline_platform_spark.streaming.sketches import (
        hll_state_estimate,
        streaming_hll_ingest,
    )
    from data_pipeline_platform_spark.streaming.windows import read_events_stream

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    stream_dir = str(tmp_path / "ev_hll")
    events.repartition(4).write.parquet(stream_dir)

    state = str(tmp_path / "hll_state")
    q = streaming_hll_ingest(
        read_events_stream(spark, stream_dir, max_files_per_trigger=1),
        state,
        str(tmp_path / "ckpt_hll"),
    )
    q.awaitTermination(180)

    streamed = {
        (r["event_type"], r["bucket"]): r["r"]
        for r in spark.read.parquet(state).collect()
    }
    batch = {
        (r["event_type"], r["bucket"]): r["r"]
        for r in hll_registers(events).collect()
    }
    assert streamed == batch

    s_est = {r["event_type"]: r["hll_estimate"] for r in hll_state_estimate(spark, state).collect()}
    b_est = {
        r["event_type"]: r["hll_estimate"]
        for r in hll_estimate(hll_registers(events)).collect()
    }
    assert s_est == b_est


def test_streaming_cms_matches_batch_and_replays_idempotently(spark, tmp_path):
    """CMS cells merge by + (NOT idempotent like HLL's MAX), so the
    stream stores per-batch deltas keyed by batch_id. Two contracts:
    (a) drained stream cells == batch cells bit for bit; (b) replaying
    a batch (same batch_id) changes nothing — the at-least-once
    foreachBatch delivery is absorbed by partition overwrite."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.functions.sketches import cms_cells
    from data_pipeline_platform_spark.sources.readers import load_table
    from data_pipeline_platform_spark.streaming.corpus import read_documents_stream
    from data_pipeline_platform_spark.streaming.sketches import (
        cms_state_cells,
        merge_cms_batch,
        streaming_cms_ingest,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    stream_dir = str(tmp_path / "docs_cms")
    docs.repartition(4).write.parquet(stream_dir)

    state = str(tmp_path / "cms_state")
    q = streaming_cms_ingest(
        read_documents_stream(spark, stream_dir, max_files_per_trigger=1),
        state,
        str(tmp_path / "ckpt_cms"),
    )
    q.awaitTermination(180)

    def cells_of(df):
        return {(r["row_i"], r["bucket"]): r["c"] for r in df.collect()}

    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    batch = cells_of(cms_cells(toks))
    streamed = cells_of(cms_state_cells(spark, state))
    assert streamed == batch

    # (b) replay: deliver the SAME batch (same batch_id) twice into a
    # fresh state — the delta partition overwrites itself, so the
    # at-least-once re-delivery is a no-op
    state2 = str(tmp_path / "cms_state2")
    merge_cms_batch(docs, 7, state2)
    once = cells_of(cms_state_cells(spark, state2))
    merge_cms_batch(docs, 7, state2)  # at-least-once re-delivery
    twice = cells_of(cms_state_cells(spark, state2))
    assert once == twice == batch


def test_stream_stream_attribution_matches_batch(spark, tmp_path):
    """The watermarked stream-stream interval join, drained, must emit
    exactly the batch all-pairs attribution set (the last-touch argmax
    is a downstream batch step on both sides)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from data_pipeline_platform_spark.functions.events import (
        ATTRIB_WINDOW_SEC,
        q_events_attribution,
        _events,
    )
    from data_pipeline_platform_spark.streaming.joins import (
        attribution_pairs_stream,
    )
    from data_pipeline_platform_spark.streaming.windows import read_events_stream

    sf = "/root/testdata/sf0.001"
    ev = _events(spark, sf)
    stream_dir = str(tmp_path / "ev_attr")
    ev.repartition(4).write.parquet(stream_dir)

    pairs = attribution_pairs_stream(
        read_events_stream(spark, stream_dir, max_files_per_trigger=2)
    )
    out_dir = str(tmp_path / "attr_out")
    q = (
        pairs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = {
        (r["purchase_id"], r["click_id"], r["latency_sec"])
        for r in spark.read.parquet(out_dir).collect()
    }

    # batch all-pairs (same shape the streaming stage emits)
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    batch = {
        (r["purchase_id"], r["click_id"], r["latency_sec"])
        for r in purchases.join(clicks, "user_id")
        .filter(
            (F.col("c_ts") <= F.col("p_ts"))
            & F.expr(f"c_ts >= p_ts - INTERVAL {ATTRIB_WINDOW_SEC} SECOND")
        )
        .select(
            "purchase_id",
            "click_id",
            F.expr(
                "CAST((unix_micros(p_ts) - unix_micros(c_ts)) div 1000000 AS BIGINT)"
            ).alias("latency_sec"),
        )
        .collect()
    }
    assert streamed == batch and len(batch) > 0

    # and the last-touch reduction over the streamed pairs equals the
    # graded batch operator exactly
    streamed_df = spark.read.parquet(out_dir)
    last = (
        streamed_df.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("purchase_id").orderBy(
                    F.asc("latency_sec"), F.desc("click_id")
                )
            ),
        )
        .filter("rn = 1")
        .select("purchase_id", "click_id", "latency_sec")
    )
    graded = q_events_attribution(spark, sf).select(
        "purchase_id", "click_id", "latency_sec"
    )
    assert {tuple(r) for r in last.collect()} == {tuple(r) for r in graded.collect()}


def test_streaming_bottomk_matches_batch_bitwise(spark, tmp_path):
    """KMV merge law under micro-batching: after the stream drains, the
    maintained k-sample equals the one-shot bottom-k over the whole
    input bit for bit (bottom-k of per-batch bottom-ks == bottom-k of
    the union — order of batch arrival is irrelevant)."""
    from data_pipeline_platform_spark.functions.sketches import bottomk_sketch
    from data_pipeline_platform_spark.sources.readers import load_table
    from data_pipeline_platform_spark.streaming.sketches import (
        bottomk_state,
        streaming_bottomk_ingest,
    )
    from data_pipeline_platform_spark.streaming.windows import read_events_stream

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    stream_dir = str(tmp_path / "ev_bk")
    events.repartition(4).write.parquet(stream_dir)

    state = str(tmp_path / "bk_state")
    q = streaming_bottomk_ingest(
        read_events_stream(spark, stream_dir, max_files_per_trigger=1),
        "user_id",
        state,
        str(tmp_path / "ckpt_bk"),
        k=32,
    )
    q.awaitTermination(180)

    streamed = [
        (r["user_id"], r["h"]) for r in bottomk_state(spark, state).collect()
    ]
    batch = [
        (r["user_id"], r["h"])
        for r in bottomk_sketch(events, "user_id", 32).collect()
    ]
    assert streamed == batch
    # KMV samples the DISTINCT-key set: a hot user repeated across
    # batches occupies ONE slot, so the state holds min(k, n_distinct)
    # unique keys
    n_distinct = events.select("user_id").distinct().count()
    assert len(streamed) == min(32, n_distinct)
    assert len({u for u, _ in streamed}) == len(streamed)


def test_clean_lines_c4_rules_and_global_dedup(spark):
    """Line rules are row-local; the duplicate census drops a repeated
    line from EVERY document (including its first occurrence)."""
    from data_pipeline_platform_spark.functions.corpus import (
        clean_lines_c4,
    )

    rows = [
        # doc 1: one good line, one too-short, one no-punct, one blocked
        (1, 0, "this line is perfectly fine."),
        (1, 1, "too short."),
        (1, 2, "this one has no terminal punctuation"),
        (1, 3, "please accept our cookie policy now."),
        # docs 2+3 share a boilerplate line -> dropped from both
        (2, 0, "subscribe to our newsletter today."),
        (2, 1, "unique content in document two."),
        (3, 0, "subscribe to our newsletter today."),
        (3, 1, "unique content in document three."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, line_no int, line string")
    out = {r["doc_id"]: r for r in clean_lines_c4(df).collect()}
    r1 = out[1]
    assert (r1["n_lines"], r1["n_kept"], r1["n_dropped_rules"],
            r1["n_dropped_dup"]) == (4, 1, 3, 0)
    assert r1["clean_text"] == "this line is perfectly fine."
    for d in (2, 3):
        r = out[d]
        assert (r["n_kept"], r["n_dropped_dup"]) == (1, 1)
        assert "newsletter" not in r["clean_text"]
        assert r["clean_text"].startswith("unique content")


def test_filter_by_url_rules_and_census(spark):
    """Host blocklist, TLD blocklist, and the over-representation
    census each independently veto; clean under-cap hosts keep."""
    from data_pipeline_platform_spark.functions.corpus import (
        filter_by_url,
    )

    rows = (
        [(i, f"https://example.com/p/{i}") for i in range(20)]  # over cap
        + [(100, "https://ads.tracker.com/x"),
           (101, "https://fine.org/a"),
           (102, "https://sketchy.info/b"),
           # r12-advisor parse hardening
           (103, "http://plain-http.org/a"),      # http scheme
           (104, "https://no-path.org"),          # no trailing slash
           (105, "HTTPS://Ads.Tracker.COM:443/x"),  # case + port
           (106, "ftp://files.org/a"),            # unsupported scheme
           (107, "not a url at all")]             # garbage
    )
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in filter_by_url(df).collect()}
    assert out[0]["over_represented"] and not out[0]["keep"]
    assert out[100]["blocked_host"] and not out[100]["keep"]
    assert out[102]["blocked_tld"] and not out[102]["keep"]
    r = out[101]
    assert (r["host"], r["tld"], r["n_docs_host"]) == ("fine.org", ".org", 1)
    assert r["keep"] and not r["blocked_host"] and not r["blocked_tld"]
    # http:// and path-less URLs parse and keep
    assert out[103]["host"] == "plain-http.org" and out[103]["keep"]
    assert out[104]["host"] == "no-path.org" and out[104]["keep"]
    # uppercase + port folds onto the blocklisted host -> veto
    assert out[105]["host"] == "ads.tracker.com"
    assert out[105]["blocked_host"] and not out[105]["keep"]
    # unparseable never slips past the blocklists
    for d in (106, 107):
        assert out[d]["host"] == "" and not out[d]["parseable"]
        assert not out[d]["keep"]


def test_incremental_line_cleaner_matches_one_shot_with_retroactive_drop(
    spark, tmp_path
):
    """The census-maintained cleaner equals clean_lines_c4 bitwise even
    when a line only crosses the duplicate threshold in a LATER batch
    (the batch-1 doc must retroactively lose it), and duplicate
    delivery of a batch is a no-op on both the lines store and the
    census."""
    from data_pipeline_platform_spark.functions.corpus import clean_lines_c4
    from data_pipeline_platform_spark.streaming.corpus import (
        IncrementalLineCleaner,
    )

    rows = [
        # doc 1 (batch 0) and doc 5 (batch 2) share the boilerplate
        # line: it becomes a duplicate only once batch 2 folds
        (1, 0, "shared boilerplate line appears twice here."),
        (1, 1, "unique one first document content line."),
        (2, 0, "unique two second document content line."),
        (5, 0, "shared boilerplate line appears twice here."),
        (5, 1, "unique five fifth document content line."),
        (4, 0, "short."),  # fails the min-words rule
    ]
    lines = spark.createDataFrame(
        rows, "doc_id long, line_no int, line string"
    )
    cleaner = IncrementalLineCleaner(
        spark, str(tmp_path / "lines"), str(tmp_path / "census")
    )
    for b in range(3):
        batch = lines.filter(F.col("doc_id") % 3 == b)
        cleaner.process_batch(batch, batch_id=b)
    # duplicate delivery of the last batch: no state change
    v_lines = cleaner.lines.latest_version()
    v_census = cleaner.census.acid.latest_version()
    stats = cleaner.process_batch(
        lines.filter(F.col("doc_id") % 3 == 2), batch_id=2
    )
    assert not stats["appended"] and not stats["folded"]
    assert cleaner.lines.latest_version() == v_lines
    assert cleaner.census.acid.latest_version() == v_census

    got = {r["doc_id"]: r.asDict() for r in cleaner.summaries().collect()}
    want = {r["doc_id"]: r.asDict() for r in clean_lines_c4(lines).collect()}
    assert got == want
    # the retroactive drop actually happened: doc 1's shared line is
    # counted as a duplicate drop even though it arrived in batch 0
    assert got[1]["n_dropped_dup"] == 1
    assert "shared boilerplate" not in got[1]["clean_text"]


def test_incremental_line_cleaner_under_structured_streaming(
    spark, tmp_path
):
    """stream_clean_lines drives the same cleaner under a real
    foreachBatch query (file source, availableNow) and still matches
    the one-shot pass."""
    from data_pipeline_platform_spark.functions.corpus import clean_lines_c4
    from data_pipeline_platform_spark.streaming.corpus import (
        IncrementalLineCleaner,
        stream_clean_lines,
    )

    docs = load_table(spark, SF, "documents").limit(60)
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split("text", r"\. ")).alias("line_no", "line"),
    ).withColumn("line", F.concat(F.col("line"), F.lit(".")))
    src = str(tmp_path / "lines_in")
    lines.repartition(4).write.parquet(src)

    cleaner = IncrementalLineCleaner(
        spark, str(tmp_path / "slines"), str(tmp_path / "scensus")
    )
    stream = (
        spark.readStream.schema("doc_id long, line_no int, line string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = stream_clean_lines(stream, cleaner, str(tmp_path / "sckpt"))
    q.awaitTermination(180)

    got = {r["doc_id"]: r.asDict() for r in cleaner.summaries().collect()}
    want = {r["doc_id"]: r.asDict() for r in clean_lines_c4(lines).collect()}
    assert got == want and len(got) > 0


def test_salted_census_join_back_is_equivalent_and_spreads_key(spark):
    """salt_buckets routes the census join-back through salted_join:
    output identical to the unsalted path, and the join exchange keys
    on (content key, __salt) so a 60%-hot key spreads across reducers
    (r12 verdict #5; balance numbers in SCALE.md via
    tools/census_skew_stress.py)."""
    from data_pipeline_platform_spark.functions.corpus import (
        clean_lines_c4,
        filter_by_url,
    )

    hot = "shared boilerplate content line appearing everywhere."
    rows = [(d, 0, hot) for d in range(30)] + [
        (d, 1, f"unique content line number {d} with many words in it.")
        for d in range(30)
    ]
    lines = spark.createDataFrame(
        rows, "doc_id long, line_no int, line string"
    )
    plain = {r["doc_id"]: r.asDict() for r in clean_lines_c4(lines).collect()}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted_df = clean_lines_c4(lines, salt_buckets=8)
        salted = {r["doc_id"]: r.asDict() for r in salted_df.collect()}
        assert salted == plain
        plan = salted_df._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan  # the join really keys on (line, salt)

        urls = spark.createDataFrame(
            [(d, "https://hot.example.com/p/%d" % d) for d in range(30)]
            + [(100, "https://fine.org/a")],
            "doc_id long, url string",
        )
        plain_u = {r["doc_id"]: r.asDict()
                   for r in filter_by_url(urls).collect()}
        salted_u_df = filter_by_url(urls, salt_buckets=8)
        salted_u = {r["doc_id"]: r.asDict() for r in salted_u_df.collect()}
        assert salted_u == plain_u
        assert "__salt" in (
            salted_u_df._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_incremental_url_filter_retroactive_cap_and_replay(spark, tmp_path):
    """The census-maintained URL filter equals filter_by_url bitwise
    even when a host only crosses the over-representation cap in a
    later batch (earlier docs retroactively flip keep=false), and a
    duplicate batch delivery is a no-op on both stores."""
    from data_pipeline_platform_spark.functions.corpus import (
        URL_HOST_CAP,
        filter_by_url,
    )
    from data_pipeline_platform_spark.streaming.corpus import (
        IncrementalUrlFilter,
    )

    # hot.example.com: 10 docs in batch 0, 10 in batch 2 -> crosses the
    # cap (15) only once batch 2 folds
    rows = (
        [(d, "https://hot.example.com/p/%d" % d) for d in range(0, 30, 3)]
        + [(d, "https://hot.example.com/p/%d" % d) for d in range(2, 32, 3)]
        + [(100, "https://fine.org/a"), (103, "http://also-fine.org/b")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    flt = IncrementalUrlFilter(
        spark, str(tmp_path / "docs"), str(tmp_path / "census")
    )
    for b in range(3):
        flt.process_batch(docs.filter(F.col("doc_id") % 3 == b), batch_id=b)
    v_docs = flt.docs.latest_version()
    v_census = flt.census.acid.latest_version()
    stats = flt.process_batch(
        docs.filter(F.col("doc_id") % 3 == 2), batch_id=2
    )
    assert not stats["appended"] and not stats["folded"]
    assert flt.docs.latest_version() == v_docs
    assert flt.census.acid.latest_version() == v_census

    got = {r["doc_id"]: r.asDict() for r in flt.verdicts().collect()}
    want = {r["doc_id"]: r.asDict() for r in filter_by_url(docs).collect()}
    assert got == want
    # the retroactive flip: a batch-0 doc of the hot host is now over
    # the cap even though its batch saw only 10 docs
    assert got[0]["n_docs_host"] == 20 > URL_HOST_CAP
    assert got[0]["over_represented"] and not got[0]["keep"]
    assert got[100]["keep"] and got[103]["keep"]


def test_incremental_url_filter_under_structured_streaming(spark, tmp_path):
    """stream_filter_urls drives the same filter under a real
    foreachBatch query and matches the one-shot pass."""
    from data_pipeline_platform_spark.functions.corpus import filter_by_url
    from data_pipeline_platform_spark.streaming.corpus import (
        IncrementalUrlFilter,
        stream_filter_urls,
    )

    docs = load_table(spark, SF, "documents").limit(80).select(
        "doc_id",
        F.concat(
            F.lit("https://h"), F.col("doc_id") % 4, F.lit(".example.org/p/"),
            F.col("doc_id"),
        ).alias("url"),
    )
    src = str(tmp_path / "urls_in")
    docs.repartition(4).write.parquet(src)

    flt = IncrementalUrlFilter(
        spark, str(tmp_path / "sdocs"), str(tmp_path / "scensus")
    )
    stream = (
        spark.readStream.schema("doc_id long, url string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = stream_filter_urls(stream, flt, str(tmp_path / "uckpt"))
    q.awaitTermination(180)

    got = {r["doc_id"]: r.asDict() for r in flt.verdicts().collect()}
    want = {r["doc_id"]: r.asDict() for r in filter_by_url(docs).collect()}
    assert got == want and len(got) > 0


def test_incremental_summaries_salted_equivalence(spark, tmp_path):
    """summaries(salt_buckets=)/verdicts(salt_buckets=) keep bitwise
    output — the incremental paths share the one-shot join-back's skew
    hardening."""
    from data_pipeline_platform_spark.streaming.corpus import (
        IncrementalLineCleaner,
        IncrementalUrlFilter,
    )

    lines = spark.createDataFrame(
        [(d, 0, "common boilerplate line with many words here.")
         for d in range(10)]
        + [(d, 1, f"unique content line {d} with several words in it.")
           for d in range(10)],
        "doc_id long, line_no int, line string",
    )
    cl = IncrementalLineCleaner(
        spark, str(tmp_path / "l"), str(tmp_path / "c")
    )
    cl.process_batch(lines, 0)
    plain = {r["doc_id"]: r.asDict() for r in cl.summaries().collect()}
    salted = {r["doc_id"]: r.asDict()
              for r in cl.summaries(salt_buckets=4).collect()}
    assert salted == plain

    urls = spark.createDataFrame(
        [(d, "https://hot.example.com/p/%d" % d) for d in range(20)],
        "doc_id long, url string",
    )
    uf = IncrementalUrlFilter(
        spark, str(tmp_path / "d"), str(tmp_path / "uc")
    )
    uf.process_batch(urls, 0)
    plain_u = {r["doc_id"]: r.asDict() for r in uf.verdicts().collect()}
    salted_u = {r["doc_id"]: r.asDict()
                for r in uf.verdicts(salt_buckets=4).collect()}
    assert salted_u == plain_u
