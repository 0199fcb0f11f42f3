"""Extension-operator tests: dedup, similarity, text, multimodal,
streaming (M8). Golden-value style on tiny inline fixtures + the sf0.001
driver tables."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# -- text -------------------------------------------------------------------

def test_text_stats_golden(spark):
    from data_pipeline_platform_spark.functions.text import with_text_stats

    df = spark.createDataFrame(
        [(1, "the cat sat the mat"), (2, "hello")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in with_text_stats(df).collect()}
    assert out[1]["token_count"] == 5
    assert out[1]["distinct_tokens"] == 4  # 'the' twice
    assert out[1]["stopword_count"] == 2
    assert out[2]["token_count"] == 1 and out[2]["stopword_count"] == 0


def test_fingerprint_is_content_hash(spark):
    from data_pipeline_platform_spark.functions.text import q_fingerprint

    out = q_fingerprint(spark, SF)
    import hashlib

    row = out.filter("doc_id = 0").collect()[0]
    from data_pipeline_platform_spark.sources.readers import load_table

    text = load_table(spark, SF, "documents").filter("doc_id = 0").collect()[0]["text"]
    assert row["fingerprint"] == hashlib.md5(text.lower().strip().encode()).hexdigest()


# -- dedup ------------------------------------------------------------------

def test_shingles(spark):
    from data_pipeline_platform_spark.functions.dedup import with_shingles

    df = spark.createDataFrame([(1, "a b c d"), (2, "x y")], "doc_id long, text string")
    out = {r["doc_id"]: r["shingles"] for r in with_shingles(df).collect()}
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []  # fewer than k tokens


def test_exact_dedup_finds_duplicates(spark):
    from data_pipeline_platform_spark.functions.dedup import q_dedup_exact

    # sf tables have no exact dups; craft one
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("t")
    from pyspark.sql import functions as F

    out = (
        df.withColumn("content_hash", F.md5("text"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )
    rows = {r["keep_doc_id"]: r["n_copies"] for r in out.collect()}
    assert rows[1] == 2 and rows[3] == 1


def test_minhash_catches_planted_near_dups(spark):
    from data_pipeline_platform_spark.functions.dedup import (
        q_dedup_minhash_lsh,
        q_dedup_ngram_jaccard,
    )

    brute = {
        (r["doc_a"], r["doc_b"])
        for r in q_dedup_ngram_jaccard(spark, SF).filter("jaccard >= 0.8").collect()
    }
    lsh = {(r["doc_a"], r["doc_b"]) for r in q_dedup_minhash_lsh(spark, SF).collect()}
    assert brute == lsh  # full recall at j>=0.8 with 32x2 bands
    assert len(lsh) > 0  # the corpus has planted near-dups


def test_simhash_similar_docs_low_hamming(spark):
    from data_pipeline_platform_spark.functions.dedup import _simhash64

    a = _simhash64("the quick brown fox jumps over the lazy dog".split())
    b = _simhash64("the quick brown fox jumps over the lazy cat".split())
    c = _simhash64("completely different words entirely unrelated".split())
    ham_ab = bin((a ^ b) & (2**64 - 1)).count("1")
    ham_ac = bin((a ^ c) & (2**64 - 1)).count("1")
    assert ham_ab < ham_ac


# -- similarity -------------------------------------------------------------

def test_cosine_topk_self_similarity(spark):
    from data_pipeline_platform_spark.functions.similarity import cosine_topk
    from data_pipeline_platform_spark.sources.readers import load_table

    emb = load_table(spark, SF, "embeddings")
    out = cosine_topk(emb, query_vec_id=0, k=5).collect()
    assert len(out) == 5
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in out)
    # descending order
    scores = [r["cosine"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_lsh_bucket_deterministic(spark):
    from data_pipeline_platform_spark.functions.similarity import _as_double, with_lsh_bucket
    from data_pipeline_platform_spark.sources.readers import load_table

    emb = load_table(spark, SF, "embeddings").limit(50).withColumn(
        "vec", _as_double("embedding")
    )
    b1 = {r["vec_id"]: r["lsh_bucket"] for r in with_lsh_bucket(emb).collect()}
    b2 = {r["vec_id"]: r["lsh_bucket"] for r in with_lsh_bucket(emb).collect()}
    assert b1 == b2
    assert 0 <= min(b1.values()) and max(b1.values()) < 256


# -- multimodal -------------------------------------------------------------

def test_media_feature_extraction(spark):
    from data_pipeline_platform_spark.functions.multimodal import (
        extract_image_features,
        make_fake_media_df,
    )

    media = make_fake_media_df(spark, n=9)
    feats = extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == 9
    r = rows[0]
    assert r["n_bytes"] > 0 and 0.0 < r["byte_entropy"] <= 8.0
    assert len(r["embedding"]) == 64
    # unit-norm embedding
    import math

    norm = math.sqrt(sum(x * x for x in r["embedding"]))
    assert abs(norm - 1.0) < 1e-5


def test_png_decode_end_to_end(spark):
    """Real byte payload -> real decode through extract_image_features:
    a stdlib-built 8-bit grayscale PNG decodes to its actual pixels (no
    stub), and the embedding is the 8x8 block-mean of those pixels."""
    import struct
    import zlib

    import numpy as np

    from data_pipeline_platform_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
    )

    g = np.arange(16 * 16, dtype=np.uint8).reshape(16, 16)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(16))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 16, 16, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), "image/png", 16, 16, None)], MEDIA_SCHEMA
    )
    r = extract_image_features(media).collect()[0]
    assert r["n_bytes"] == len(png)
    # mean over DECODED pixels, not over file bytes: proves a real decode
    assert abs(r["mean_byte"] - float(g.mean())) < 1e-4
    want = np.array(
        [[g[2 * i : 2 * i + 2, 2 * j : 2 * j + 2].mean() for j in range(8)] for i in range(8)]
    ).reshape(64)
    want = want / np.linalg.norm(want)
    assert np.allclose(np.array(r["embedding"]), want, atol=1e-5)


def test_connected_components_raises_on_non_convergence(spark):
    """A path graph longer than max_iterations cannot reach fixpoint —
    the guard must raise rather than silently return split components."""
    import pytest as _pytest

    from data_pipeline_platform_spark.functions.dedup import connected_components

    path_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path_edges, max_iterations=3)
    # and with room to converge the same graph is one component
    labels = connected_components(path_edges, max_iterations=15).collect()
    assert {r["component"] for r in labels} == {0}


def test_video_frame_sampling(spark):
    from data_pipeline_platform_spark.functions.multimodal import (
        make_fake_media_df,
        sample_video_frames,
    )

    media = make_fake_media_df(spark, n=9).filter("kind = 'video'")
    frames = sample_video_frames(media, every_ms=1000)
    per_media = (
        frames.groupBy("media_id").count().collect()
    )
    durations = {r["media_id"]: r["duration_ms"] for r in media.collect()}
    for row in per_media:
        assert row["count"] == durations[row["media_id"]] // 1000 + (
            1 if durations[row["media_id"]] % 1000 else 0
        )


def test_media_metadata_stats(spark):
    from data_pipeline_platform_spark.functions.multimodal import (
        make_fake_media_df,
        media_metadata_stats,
    )

    out = {r["kind"]: r for r in media_metadata_stats(make_fake_media_df(spark, 9)).collect()}
    assert set(out) == {"image", "audio", "video"}
    assert out["image"]["max_width"] is not None


# -- streaming --------------------------------------------------------------

def test_streaming_tumbling_matches_batch(spark, tmp_path):
    """Streaming tumbling agg over a finite directory == batch groupBy."""
    from data_pipeline_platform_spark.sources.readers import load_table
    from data_pipeline_platform_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        tumbling_window_agg,
    )

    events = load_table(spark, SF, "events")
    stream_dir = str(tmp_path / "events_stream")
    events.repartition(4).write.parquet(stream_dir)

    stream = read_events_stream(spark, stream_dir, max_files_per_trigger=2)
    q = run_to_memory(tumbling_window_agg(stream), "t_tumbling")
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT window_start, event_type, n_events FROM t_tumbling"
    ).collect()
    expected = (
        events.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    got_map = {(r["window_start"], r["event_type"]): r["n_events"] for r in got}
    exp_map = {(r["window_start"], r["event_type"]): r["n_events"] for r in expected}
    # append-mode semantics: windows still open when input ends (those the
    # final watermark = max_ts - 30min hasn't passed) are never emitted —
    # every emitted window must match batch exactly, and the only missing
    # windows must be at the tail of event time
    assert set(got_map) <= set(exp_map)
    for k, v in got_map.items():
        assert v == exp_map[k], f"window {k}: streaming {v} != batch {exp_map[k]}"
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    import datetime

    for ws, _etype in set(exp_map) - set(got_map):
        assert ws >= max_ts - datetime.timedelta(hours=1, minutes=30)


def test_streaming_session_window_runs(spark, tmp_path):
    from data_pipeline_platform_spark.sources.readers import load_table
    from data_pipeline_platform_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        stream_sessionize,
    )

    events = load_table(spark, SF, "events").limit(200)
    stream_dir = str(tmp_path / "ev2")
    events.write.parquet(stream_dir)
    stream = read_events_stream(spark, stream_dir)
    q = run_to_memory(stream_sessionize(stream), "t_sessions")
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM t_sessions").collect()
    assert len(rows) > 0
    assert all(r["session_end"] >= r["session_start"] for r in rows)


def test_ivf_recall_vs_exact(spark):
    """IVF with 4-of-16 probed cells should recover most of the exact
    top-10 (recall floor 0.5 on this small corpus, typically ~1.0)."""
    from data_pipeline_platform_spark.functions.similarity import (
        cosine_topk,
        ivf_topk,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    emb = load_table(spark, SF, "embeddings")
    exact = {r["vec_id"] for r in cosine_topk(emb, 0, k=10).collect()}
    approx = {r["vec_id"] for r in ivf_topk(emb, 0, k=10).collect()}
    assert len(approx) == 10
    assert len(exact & approx) >= 5


def test_ivf_exact_deterministic_and_recall(spark):
    """The deterministic IVF (content-addressed seeds + one Lloyd
    refinement) must return identical rows across runs and recover a
    reasonable share of the exact top-10 with 4/16 cells probed."""
    from data_pipeline_platform_spark.functions.similarity import (
        cosine_topk,
        q_cosine_topk_ivf_exact,
    )
    from data_pipeline_platform_spark.sources.readers import load_table
    from data_pipeline_platform_spark.utils.cache import release_tracked

    r1 = [tuple(r) for r in q_cosine_topk_ivf_exact(spark, SF).collect()]
    release_tracked()
    r2 = [tuple(r) for r in q_cosine_topk_ivf_exact(spark, SF).collect()]
    release_tracked()
    assert r1 == r2
    assert len(r1) == 10

    emb = load_table(spark, SF, "embeddings")
    exact = {r["vec_id"] for r in cosine_topk(emb, 0, k=10).collect()}
    assert len(exact & {t[0] for t in r1}) >= 5


def test_stop_shingle_cutoff_preserves_output(spark):
    """A corpus-wide boilerplate shingle must be dropped from the
    candidate index (bounding the self-join) WITHOUT changing the
    verified output: the planted dup pair shares rare shingles and its
    jaccard is computed over the full shingle sets."""
    from data_pipeline_platform_spark.functions.dedup import _jaccard_pairs

    boiler = "click here to subscribe now please"  # hot shingles, df = n
    rows = [(i, f"{boiler} unique body {i} filler words {i * 7}") for i in range(40)]
    # planted near-dup pair: long shared tail, distinct from the others
    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows += [(100, f"{boiler} {dup}"), (101, f"{boiler} {dup} extra")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(threshold, df_cut):
        return {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 6))
            for r in _jaccard_pairs(docs, threshold, stop_shingle_df=df_cut).collect()
        }

    # At 0.5 every qualifying pair shares rare shingles (the filler docs
    # peak at ~0.43 on boilerplate alone), so the cutoff is invisible:
    # identical pairs AND identical jaccard values (exact, over full sets).
    assert pairs(0.5, 10) == pairs(0.5, 10**9) == {(100, 101, round(16 / 17, 6))}

    # At 0.2 the filler pairs qualify in brute force but share ONLY hot
    # shingles — the cutoff drops exactly those (the documented recall
    # contract), never a pair with a rare shared shingle, and never
    # changes a surviving pair's score.
    low_cut, low_brute = pairs(0.2, 10), pairs(0.2, 10**9)
    assert low_cut == {(100, 101, round(16 / 17, 6))}
    assert low_cut < low_brute
    dropped = {(a, b) for a, b, _ in low_brute - low_cut}
    assert dropped and all(a < 100 and b < 100 for a, b in dropped)


def test_with_ngrams_short_doc_guard(spark):
    from data_pipeline_platform_spark.functions.corpus import with_ngrams

    docs = spark.createDataFrame(
        [(1, "only two"), (2, "one"), (3, "a b c d")], "doc_id long, text string"
    )
    out = with_ngrams(docs, 3, "ng").select("doc_id", "ng").collect()
    got = {(r["doc_id"], r["ng"]) for r in out}
    # doc 1 (2 tokens) and doc 2 (1 token) emit nothing for n=3
    assert got == {(3, "a b c"), (3, "b c d")}


def test_pack_sequences_bins_respect_budget(spark):
    from data_pipeline_platform_spark.functions.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 30)) for i in range(10)], "doc_id long, text string"
    )
    rows = pack_sequences(docs, budget=100).select("doc_id", "bin_id").collect()
    bins = {r["doc_id"]: r["bin_id"] for r in rows}
    # 30 tokens each: docs 0-3 start below 100 (prior 0,30,60,90 -> bin 0),
    # docs 4-6 prior 120..180 -> bin 1, docs 7-9 prior 210..270 -> bin 2
    assert bins == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1, 7: 2, 8: 2, 9: 2}


def test_pack_sequences_sharded_runs_per_shard(spark):
    """shard_col partitions the running sum: each shard's prefix sum
    restarts at 0, so bin_id is per-shard."""
    from data_pipeline_platform_spark.functions.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, "a" if i < 5 else "b", " ".join(["w"] * 30)) for i in range(10)],
        "doc_id long, lang string, text string",
    )
    rows = pack_sequences(docs, budget=100, shard_col="lang").select(
        "lang", "doc_id", "bin_id"
    ).collect()
    bins = {(r["lang"], r["doc_id"]): r["bin_id"] for r in rows}
    # each shard has 5 docs x 30 tokens: priors 0,30,60,90,120 -> bins 0,0,0,0,1
    assert bins == {
        ("a", 0): 0, ("a", 1): 0, ("a", 2): 0, ("a", 3): 0, ("a", 4): 1,
        ("b", 5): 0, ("b", 6): 0, ("b", 7): 0, ("b", 8): 0, ("b", 9): 1,
    }


def test_contamination_finds_planted_overlap(spark):
    from data_pipeline_platform_spark.functions.corpus import contamination_check

    evalset = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "totally unrelated content with no overlap here at all"),
            (2, "prefix words then the quick brown fox jumps over something"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_shared_ngrams"] for r in contamination_check(train, evalset, n=5).collect()}
    # doc 2 shares "the quick brown fox jumps" and "quick brown fox jumps over"
    assert out == {2: 2}


def test_corpus_plans_stay_shuffle_lean(spark):
    """deterministic_sample and pii_scrub must be pure scan+filter (no
    exchange); contamination_check must be an equi-join (no cartesian)."""
    from data_pipeline_platform_spark.functions.corpus import (
        q_contamination_check,
        q_deterministic_sample,
        q_pii_scrub,
    )

    sf = "/root/testdata/sf0.001"
    from data_pipeline_platform_spark.functions.corpus import q_chunk_documents

    for q in (q_deterministic_sample, q_pii_scrub, q_chunk_documents):
        plan = q(spark, sf)._jdf.queryExecution().executedPlan().toString()
        # no KEY shuffle — the only allowed exchange is spread_scan's
        # deliberate round-robin fan-out of a single-split source
        assert "hashpartitioning" not in plan, q.__name__
        assert "rangepartitioning" not in plan, q.__name__
        assert "EvalPython" not in plan, q.__name__
    plan = q_contamination_check(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_stratified_sample_balanced_and_deterministic(spark):
    from data_pipeline_platform_spark.functions.corpus import stratified_sample

    rows = [(i, f"src{i % 4}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    s1 = stratified_sample(df, k=3).collect()
    s2 = stratified_sample(df, k=3).collect()
    per = {}
    for r in s1:
        per.setdefault(r["source"], set()).add(r["doc_id"])
    assert all(len(v) == 3 for v in per.values()) and len(per) == 4
    # deterministic across runs
    assert {(r["doc_id"], r["source"]) for r in s1} == {
        (r["doc_id"], r["source"]) for r in s2
    }
    # strata smaller than k are kept whole
    tiny = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string")
    out = stratified_sample(tiny, k=5)
    assert out.count() == 3


def test_chunk_documents_boundaries_and_overlap(spark):
    """Chunking invariants at the window-math boundaries: exact-size and
    size+stride edges, tail-drop rule (a start within `overlap` of the
    end is dropped and loses no tokens), overlap equality between
    consecutive full chunks, and loss-free reconstruction."""
    from data_pipeline_platform_spark.functions.corpus import (
        CHUNK_OVERLAP,
        CHUNK_SIZE,
        CHUNK_STRIDE,
        chunk_documents,
    )

    def doc(n):
        return " ".join(f"t{i}" for i in range(1, n + 1))

    sizes = {1: 1, 2: CHUNK_SIZE, 3: CHUNK_SIZE + 1, 4: 112, 5: 113}
    df = spark.createDataFrame(
        [(k, doc(n)) for k, n in sizes.items()] + [(6, "   ")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_id"])

    assert 6 not in by_doc  # whitespace-only doc yields nothing
    # n=1 and n=64: a second start would add <= overlap new tokens -> 1 chunk
    assert [r["n_tokens"] for r in by_doc[1]] == [1]
    assert [r["n_tokens"] for r in by_doc[2]] == [CHUNK_SIZE]
    # n=65: second chunk covers tokens 49..65 (overlap 16 + 1 new)
    assert [r["n_tokens"] for r in by_doc[3]] == [CHUNK_SIZE, CHUNK_OVERLAP + 1]
    # n=112: start 97 dropped (97+16 > 112), chunk 2 ends exactly at 112
    assert [r["n_tokens"] for r in by_doc[4]] == [CHUNK_SIZE, CHUNK_SIZE]
    # n=113: start 97 kept (97+16 <= 113)
    assert [r["n_tokens"] for r in by_doc[5]] == [
        CHUNK_SIZE,
        CHUNK_SIZE,
        CHUNK_OVERLAP + 1,
    ]

    for doc_id, n in sizes.items():
        chunks = by_doc[doc_id]
        assert [r["chunk_id"] for r in chunks] == list(range(len(chunks)))
        toks = [c["chunk_text"].split(" ") for c in chunks]
        # consecutive chunks share exactly `overlap` tokens
        for a, b in zip(toks, toks[1:]):
            assert a[CHUNK_STRIDE:] == b[: len(a) - CHUNK_STRIDE]
        # reconstruction: first chunk + post-overlap suffixes == original
        rebuilt = list(toks[0])
        for b in toks[1:]:
            rebuilt.extend(b[CHUNK_OVERLAP:])
        assert rebuilt == doc(n).split(" ")
        covered = set()
        start = 1
        for c in chunks:
            covered.update(range(start, start + c["n_tokens"]))
            start += CHUNK_STRIDE
        assert covered == set(range(1, n + 1)), f"doc {doc_id} lost tokens"


def test_oov_rate_flags_planted_gibberish(spark):
    """A doc of unique gibberish tokens must score oov_rate 1.0 while
    docs made of corpus-common tokens score low; the vocabulary side
    must broadcast (never shuffle the corpus for the join)."""
    from data_pipeline_platform_spark.functions.text import q_oov_rate

    sf = "/root/testdata/sf0.001"
    df = q_oov_rate(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan

    rows = df.collect()
    assert all(0 <= r["n_oov"] <= r["n_tokens"] for r in rows)
    assert all(abs(r["oov_rate"] - r["n_oov"] / r["n_tokens"]) == 0.0 for r in rows)
    # the corpus is synthetic-English-ish: the bulk of tokens are in the
    # top-1000 vocabulary, so the median rate must be well under 1
    rates = sorted(r["oov_rate"] for r in rows)
    assert rates[len(rates) // 2] < 0.5


def test_split_stable_under_corpus_growth(spark):
    """A doc's train/val/test label must not change when the corpus
    grows or shrinks (the property that keeps eval sets uncontaminated
    across corpus versions), and the bands must be ~90/5/5."""
    from data_pipeline_platform_spark.functions.corpus import with_split

    full = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    half = full.filter("doc_id % 2 = 0")
    s_full = {r["doc_id"]: r["split"] for r in with_split(full).collect()}
    s_half = {r["doc_id"]: r["split"] for r in with_split(half).collect()}
    assert all(s_full[k] == v for k, v in s_half.items())

    from collections import Counter

    shares = Counter(s_full.values())
    assert 0.85 < shares["train"] / 4000 < 0.95
    assert 0.02 < shares["val"] / 4000 < 0.08
    assert 0.02 < shares["test"] / 4000 < 0.08


def test_repetition_stats_invariants(spark):
    """Repetition fractions are bounded and consistent with a planted
    fully-repetitive doc vs a planted all-distinct doc; the whole op is
    row-local (no exchange in the plan)."""
    from data_pipeline_platform_spark.functions.repetition import _with_repetition

    df = spark.createDataFrame(
        [(1, "x x x x x x"), (2, "a b c d e f"), (3, "solo")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in _with_repetition(df).collect()}
    assert rows[1]["top_word_frac"] == 1.0
    assert rows[1]["dup_bigram_frac"] == 1.0 - 1.0 / 5.0
    assert rows[2]["top_word_frac"] == 1.0 / 6.0
    assert rows[2]["dup_bigram_frac"] == 0.0
    # single-token doc: guards, not NULLs/divide-by-zero
    assert rows[3]["dup_bigram_frac"] == 0.0 and rows[3]["dup_trigram_frac"] == 0.0

    from data_pipeline_platform_spark.functions.repetition import q_repetition_stats

    plan = (
        q_repetition_stats(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # row-local: the only exchange allowed is the spread_scan
    # round-robin repartition, never a hash/range shuffle
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert "EvalPython" not in plan


def test_gopher_filter_discriminates(spark):
    """The gate must neither pass nor reject everything on the test
    corpus, and `keep` must equal the conjunction of the rule columns."""
    from data_pipeline_platform_spark.functions.repetition import (
        q_gopher_quality_filter,
    )

    rows = q_gopher_quality_filter(spark, "/root/testdata/sf0.001").collect()
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)
    for r in rows:
        assert r["keep"] == (
            r["r_tokens"]
            and r["r_word_len"]
            and r["r_stopwords"]
            and r["r_top_word"]
            and r["r_dup_bigram"]
        )


def test_unigram_logprob_orders_common_vs_rare(spark):
    """Docs built from corpus-frequent tokens must outscore docs of
    rare tokens; the scoring join must broadcast the frequency table."""
    from data_pipeline_platform_spark.functions.repetition import q_unigram_logprob

    df = q_unigram_logprob(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan
    rows = df.collect()
    assert len(rows) == 500
    # mean unigram logprob of an in-vocab corpus is strictly negative
    # and bounded below by ln(1/total_tokens)
    assert all(r["mean_logprob"] < 0 for r in rows)


def test_dedup_bow_catches_permuted_duplicate(spark):
    """A token-permuted copy must collapse into the original's group
    even though its md5(text) differs (the case dedup_exact misses)."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.functions.dedup import q_dedup_bow

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    perm = (
        base.filter(F.col("doc_id") == 0)
        .withColumn("doc_id", F.lit(900000).cast("long"))
        .withColumn(
            "text",
            F.expr("concat_ws(' ', reverse(split(trim(text), '\\\\s+')))"),
        )
    )
    view = base.unionByName(perm)
    view.createOrReplaceTempView("__bow_docs")
    keyed = view.withColumn(
        "bow_key",
        F.md5(
            F.expr(
                "concat_ws(' ', array_sort(array_distinct(split(trim(text), '\\\\s+'))))"
            )
        ),
    )
    grouped = keyed.groupBy("bow_key").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    )
    joined = keyed.filter(F.col("doc_id").isin(0, 900000)).select("bow_key").distinct()
    assert joined.count() == 1  # permutation did not change the key
    hit = grouped.join(joined, "bow_key").collect()
    assert hit[0]["doc_id"] == 0 and hit[0]["n_copies"] >= 2

    # registry form runs and is deterministic
    a = {r["bow_key"]: r["n_copies"] for r in q_dedup_bow(spark, "/root/testdata/sf0.001").collect()}
    b = {r["bow_key"]: r["n_copies"] for r in q_dedup_bow(spark, "/root/testdata/sf0.001").collect()}
    assert a == b


def test_events_anomaly_flags_planted_outlier(spark):
    """Stats must broadcast back onto the events scan, and z-scores must
    be symmetric exact: recompute one flagged row's z from raw data."""
    import math

    from data_pipeline_platform_spark.functions.events import (
        _Z_THRESHOLD,
        q_events_anomaly,
    )

    df = q_events_anomaly(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert len(rows) > 0
    assert all(abs(r["z"]) >= _Z_THRESHOLD for r in rows)

    # cross-check one row against a pandas recomputation
    import pandas as pd

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    r = rows[0]
    grp = ev[ev.user_id == r["user_id"]]
    v_fp = (grp.value * 1_000_000).round().astype("int64")
    mean = v_fp.mean()
    var = (v_fp.astype("float64") ** 2).mean() - mean * mean
    mine = (round(r["value"] * 1_000_000) - mean) / math.sqrt(var)
    assert abs(mine - r["z"]) < 1e-4


def test_dedup_keep_best_picks_longest_member(spark):
    """Every kept doc must be a member of its own cluster with the
    max token count (ties -> smallest doc_id), and clusters must be
    disjoint from each other."""
    from data_pipeline_platform_spark.functions.dedup import (
        q_dedup_clusters,
        q_dedup_keep_best,
    )

    sf = "/root/testdata/sf0.001"
    members = {}
    for r in q_dedup_clusters(spark, sf).collect():
        members.setdefault(r["cluster"], []).append(r["doc_id"])
    docs = {
        r["doc_id"]: len(r["text"].split())
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    kept = q_dedup_keep_best(spark, sf).collect()
    assert {r["cluster"] for r in kept} == set(members)
    for r in kept:
        group = members[r["cluster"]]
        assert r["n_members"] == len(group)
        best = sorted(group, key=lambda d: (-docs[d], d))[0]
        assert r["keep_doc_id"] == best
        assert r["token_count"] == docs[best]


def test_corpus_report_reconciles_with_parts(spark):
    """The rollup's totals must reconcile with the standalone graded
    operators it composes (gate pass counts, BOW dup counts)."""
    from data_pipeline_platform_spark.functions.dedup import q_dedup_bow
    from data_pipeline_platform_spark.functions.repetition import (
        q_corpus_report,
        q_gopher_quality_filter,
    )

    sf = "/root/testdata/sf0.001"
    report = {r["lang"]: r for r in q_corpus_report(spark, sf).collect()}
    gate = q_gopher_quality_filter(spark, sf).collect()
    docs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    n_keep = {}
    for r in gate:
        lang = docs[r["doc_id"]]
        n_keep[lang] = n_keep.get(lang, 0) + int(r["keep"])
    assert {k: v["n_keep"] for k, v in report.items()} == n_keep
    assert sum(v["n_docs"] for v in report.values()) == len(docs)
    # BOW dup docs: total duplicated docs across langs equals
    # sum(n_copies) - groups over dup groups
    dup_total = sum(
        r["n_copies"] for r in q_dedup_bow(spark, sf).collect() if r["n_copies"] > 1
    )
    assert sum(v["n_bow_dup_docs"] for v in report.values()) == dup_total


def test_bpe_merge_fold_greedy_semantics(spark):
    """The fold must implement standard greedy left-to-right BPE:
    'a a a' + (a,a) -> [aa, a]; 'a b a b' + (a,b) -> [ab, ab];
    merged symbols must not cascade within the same step."""
    from data_pipeline_platform_spark.functions.bpe import _merge_fold_sql

    df = spark.createDataFrame(
        [(1, ["a", "a", "a"]), (2, ["a", "b", "a", "b"]), (3, ["x"]), (4, ["b", "a"])],
        "id int, syms array<string>",
    )
    aa = {r["id"]: r["m"] for r in df.selectExpr("id", _merge_fold_sql("a", "a") + " AS m").collect()}
    assert aa[1] == ["aa", "a"]
    ab = {r["id"]: r["m"] for r in df.selectExpr("id", _merge_fold_sql("a", "b") + " AS m").collect()}
    assert ab[2] == ["ab", "ab"]
    assert ab[3] == ["x"]
    assert ab[4] == ["b", "a"]


def test_bpe_train_merges_hand_checked(spark, tmp_path):
    """Train on a tiny controlled corpus and hand-verify the first two
    merges (pair counts weighted by word frequency, ties lexicographic)."""
    from data_pipeline_platform_spark.functions import bpe as bpe_mod
    from data_pipeline_platform_spark.functions.bpe import q_bpe_train_merges

    # corpus: 'abab' x3, 'abc' x2 -> pairs: (a,b):3*2+2=8, (b,a):3, (b,c):2
    docs = spark.createDataFrame(
        [(1, "abab abab abab abc abc", "en", "s", 22)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "documents.parquet")
    docs.write.parquet(d)
    # point the op at the tiny corpus dir
    import shutil

    sfdir = str(tmp_path)
    res = q_bpe_train_merges(spark, sfdir).orderBy("step").collect()
    assert (res[0]["lhs"], res[0]["rhs"], res[0]["pair_count"]) == ("a", "b", 8)
    # after merge 1: 'abab'->[ab,ab] x3, 'abc'->[ab,c] x2
    # pairs: (ab,ab):3, (ab,c):2 -> merge 2 = (ab,ab) count 3
    assert (res[1]["lhs"], res[1]["rhs"], res[1]["pair_count"]) == ("ab", "ab", 3)
    assert res[1]["merged"] == "abab"


def test_bigram_logprob_orders_fluency(spark):
    """Bigram scores must be finite/negative, cover every doc, and the
    unigram joins must broadcast while the bigram join may shuffle."""
    from data_pipeline_platform_spark.functions.repetition import q_bigram_logprob

    df = q_bigram_logprob(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan
    rows = df.collect()
    assert len(rows) == 500
    assert all(r["mean_logprob"] < 0 for r in rows)
    # a doc's token budget is preserved: n_tokens == whitespace tokens
    toks = {
        r["doc_id"]: len(r["text"].split())
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet").collect()
    }
    for r in rows:
        assert r["n_tokens"] == toks[r["doc_id"]]


def test_pca_top_component_matches_numpy(spark):
    """The 6-step power iterate must align with numpy's dominant
    eigenvector of the same centered covariance (up to sign), carry an
    inf-norm of exactly 1, and be bit-identical across runs."""
    import numpy as np

    from data_pipeline_platform_spark.functions.spectral import q_pca_top_component

    sf = "/root/testdata/sf0.001"
    rows = q_pca_top_component(spark, sf).collect()
    x = np.zeros(len(rows))
    for r in rows:
        x[r["dim"]] = r["component"]
    assert np.max(np.abs(x)) == 1.0
    eig = rows[0]["eigenvalue"]
    assert eig > 0

    import pandas as pd

    vecs = np.array(
        pd.read_parquet(f"{sf}/embeddings.parquet")["embedding"].tolist(),
        dtype="float64",
    )
    c = vecs - vecs.mean(axis=0)
    cov = c.T @ c / len(vecs)
    w, v = np.linalg.eigh(cov)
    top = v[:, -1]
    cos = abs(np.dot(x, top)) / (np.linalg.norm(x) * np.linalg.norm(top))
    assert cos > 0.99, f"power iterate misaligned with numpy eigvector: {cos}"
    # eigenvalue estimate within 5% of numpy's (quantization + 6 steps)
    assert abs(eig - w[-1]) / w[-1] < 0.05

    again = {r["dim"]: r["component"] for r in q_pca_top_component(spark, sf).collect()}
    assert all(again[r["dim"]] == r["component"] for r in rows)


def test_whiten_embeddings_reduces_projection(spark):
    """Whitening must (a) satisfy the Pythagorean identity
    norm_after^2 ≈ norm_before^2 - proj^2·||x||^2 ... verified via
    numpy recomputation per vector, and (b) leave the pass row-local
    (no hash exchange downstream of the component collect)."""
    import numpy as np
    import pandas as pd

    from data_pipeline_platform_spark.functions.spectral import (
        q_pca_top_component,
        q_whiten_embeddings,
    )

    sf = "/root/testdata/sf0.001"
    top = q_pca_top_component(spark, sf).collect()
    x = np.zeros(len(top))
    for r in top:
        x[r["dim"]] = r["component"]
    vecs = {
        int(i): np.array(v, dtype="float64")
        for i, v in pd.read_parquet(f"{sf}/embeddings.parquet")[
            ["vec_id", "embedding"]
        ].itertuples(index=False)
    }
    rows = q_whiten_embeddings(spark, sf).collect()
    assert len(rows) == len(vecs)
    xx = float(x @ x)
    for r in rows[:50]:
        v = vecs[r["vec_id"]]
        proj = float(v @ x) / xx
        after = v - proj * x
        assert abs(r["proj"] - proj) < 1e-5
        assert abs(r["norm_after"] - np.linalg.norm(after)) < 1e-5
        assert r["norm_after"] <= r["norm_before"] + 1e-9


def test_hll_estimate_within_expected_error(spark):
    """With m=64 registers the standard error is ~1.04/sqrt(64) = 13%;
    require every per-type estimate within 3 sigma and the register
    build to be a two-level (map-side combinable) aggregation with no
    Python in the plan."""
    from data_pipeline_platform_spark.functions.sketches import q_hll_distinct_users

    df = q_hll_distinct_users(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["rel_error"] < 0.39, (r["event_type"], r["rel_error"])
        assert r["hll_estimate"] > 0


def test_events_ewma_exact_recurrence(spark):
    """The fold must equal the halving recurrence computed in python
    over the same (ts, event_id) order — bit-for-bit, since /2 is
    exact — and n_events must cover every event."""
    import pandas as pd

    from data_pipeline_platform_spark.functions.events import q_events_ewma

    sf = "/root/testdata/sf0.001"
    rows = {r["user_id"]: r for r in q_events_ewma(spark, sf).collect()}
    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values(["ts", "event_id"])
    for uid, grp in ev.groupby("user_id"):
        vals = list(grp["value"])
        s = vals[0]
        for v in vals[1:]:
            s = (v + s) / 2
        r = rows[uid]
        assert r["n_events"] == len(vals)
        assert r["ewma"] == round(s, 6) or abs(r["ewma"] - s) < 1e-6
        assert r["last_value"] == vals[-1]


def test_semantic_sample_covers_all_cells(spark):
    """Every IVF cell must contribute (coverage is the op's point), no
    cell may exceed the quota, ranks must be 1..k dense per cell, and
    the kept set must be deterministic across runs."""
    from data_pipeline_platform_spark.functions.similarity import (
        SEM_SAMPLE_PER_CELL,
        q_semantic_stratified_sample,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_semantic_stratified_sample(spark, sf).collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    # the 16-cell quantizer over 500 docs: every cell populated
    assert len(by_cell) == 16
    for cell, members in by_cell.items():
        assert len(members) <= SEM_SAMPLE_PER_CELL
        ranks = sorted(m["cell_rank"] for m in members)
        assert ranks == list(range(1, len(ranks) + 1))
        assert all(m["n_cell"] >= len(members) for m in members)

    again = {(r["doc_id"], r["cell"]) for r in q_semantic_stratified_sample(spark, sf).collect()}
    assert again == {(r["doc_id"], r["cell"]) for r in rows}


def test_semantic_dedup_pairs_verified_in_numpy(spark):
    """Every reported duplicate pair must exceed the threshold by
    numpy's cosine on the raw vectors, kept id < dropped id, and the
    self-join must stay inside cells (equi-join, no cartesian)."""
    import numpy as np
    import pandas as pd

    from data_pipeline_platform_spark.functions.similarity import (
        SEMDEDUP_COS,
        q_semantic_dedup,
    )

    sf = "/root/testdata/sf0.001"
    df = q_semantic_dedup(spark, sf)
    # the quantizer legitimately cross-joins 16-row broadcast frames;
    # the scale contract here is that the PAIR join is keyed on cell —
    # visible as a hash/sort-merge join with cell in its keys
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan
    rows = df.collect()
    assert len(rows) > 0
    vecs = {
        int(i): np.array(v, dtype="float64")
        for i, v in pd.read_parquet(f"{sf}/embeddings.parquet")[
            ["vec_id", "embedding"]
        ].itertuples(index=False)
    }
    for r in rows:
        assert r["kept_vec_id"] < r["dropped_vec_id"]
        a, b = vecs[r["kept_vec_id"]], vecs[r["dropped_vec_id"]]
        # max_cosine is vs the BEST partner, which may not be the kept
        # (min-id) one — recompute the pairwise cosine bound only
        assert r["max_cosine"] >= SEMDEDUP_COS
        cos = float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        if r["n_dup_partners"] == 1:
            assert abs(cos - r["max_cosine"]) < 1e-5


def test_extract_audio_features_real_wav(spark):
    """A genuine stdlib-synthesized 16-bit PCM WAV must decode for real
    (decoded=true, correct rate/channels/duration, sine RMS ~ A/sqrt(2));
    junk bytes must yield an auditable stub row, not a crash."""
    import io
    import math
    import struct
    import wave

    from data_pipeline_platform_spark.functions.multimodal import (
        extract_audio_features,
    )

    sr, secs, amp = 8000, 0.5, 0.6
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        n = int(sr * secs)
        frames = b"".join(
            struct.pack(
                "<h", int(amp * 32767 * math.sin(2 * math.pi * 440 * i / sr))
            )
            for i in range(n)
        )
        w.writeframes(frames)
    wav_bytes = buf.getvalue()

    df = spark.createDataFrame(
        [(1, bytearray(wav_bytes)), (2, bytearray(b"not a wav at all"))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    good = rows[1]
    assert good["decoded"] and good["sample_rate"] == sr and good["n_channels"] == 1
    assert abs(good["duration_sec"] - secs) < 1e-6
    assert abs(good["rms"] - amp / math.sqrt(2)) < 0.01
    assert abs(good["peak"] - amp) < 0.01
    bad = rows[2]
    assert not bad["decoded"] and bad["n_bytes"] == 16


def test_events_markov_rows_are_distributions(spark):
    """Each source type's outgoing probabilities must sum to 1 exactly
    (count ratios over a shared exact total), and transition counts
    must reconcile with a pandas recomputation."""
    import pandas as pd

    from data_pipeline_platform_spark.functions.events import q_events_markov

    sf = "/root/testdata/sf0.001"
    rows = q_events_markov(spark, sf).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["event_type"], []).append(r)
    for src, outs in by_src.items():
        total = sum(r["n"] for r in outs)
        assert abs(sum(r["p"] for r in outs) - 1.0) < 1e-12
        for r in outs:
            assert r["p"] == r["n"] / total

    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values(["ts", "event_id"])
    expected = {}
    for _, grp in ev.groupby("user_id"):
        types = list(grp["event_type"])
        for a, b in zip(types, types[1:]):
            expected[(a, b)] = expected.get((a, b), 0) + 1
    got = {(r["event_type"], r["next_type"]): r["n"] for r in rows}
    assert got == expected


def test_hll_registers_merge_property(spark):
    """Sketch mergeability: registers(A ∪ B) must equal the MAX-merge
    of registers(A) and registers(B) for any split — the algebraic
    property the streaming foreachBatch merge relies on."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.functions.sketches import hll_registers
    from data_pipeline_platform_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    for split_expr in ("event_id % 2 = 0", "user_id < 8", "value > 100"):
        a = ev.filter(split_expr)
        b = ev.filter(f"NOT ({split_expr})")
        whole = {
            (r["event_type"], r["bucket"]): r["r"]
            for r in hll_registers(ev).collect()
        }
        merged = {
            (r["event_type"], r["bucket"]): r["r"]
            for r in hll_registers(a)
            .unionByName(hll_registers(b))
            .groupBy("event_type", "bucket")
            .agg(F.max("r").alias("r"))
            .collect()
        }
        assert merged == whole, split_expr


def test_histogram_quantiles_error_bounded_by_grid(spark):
    """The histogram estimate can miss the exact quantile by at most
    one bucket width; check that bound and that the register pass has
    no Python in the plan."""
    from data_pipeline_platform_spark.functions.sketches import (
        HQ_BUCKET,
        q_histogram_quantiles,
    )

    df = q_histogram_quantiles(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    rows = df.collect()
    assert len(rows) == 15  # 5 event types x 3 quantiles
    # the true guarantee: the estimate lies in the bucket of the
    # rank-target ORDER STATISTIC (within one width of it). The
    # interpolated exact percentile can sit farther away wherever
    # adjacent order statistics are sparse, so it only gets a loose
    # relative bound.
    import math

    import pandas as pd

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    for r in rows:
        q = int(r["quantile"][1:]) / 100
        vals = sorted(ev[ev.event_type == r["event_type"]]["value"])
        order_stat = vals[math.ceil(q * len(vals)) - 1]
        assert abs(r["estimate"] - order_stat) <= HQ_BUCKET + 1e-9, (
            r["event_type"],
            r["quantile"],
        )
        # rel_error is an audit column, not the contract (a 0.25-wide
        # bucket is a large RELATIVE slice of a small-valued quantile)
        assert r["rel_error"] < 0.5


def test_cms_never_undercounts_any_token(spark):
    """CMS guarantee: estimate >= exact for EVERY key (collisions only
    inflate). Checked over the full vocabulary, not just the graded
    top-K — and with w=16 on this corpus collisions DO occur, so the
    estimator's min-over-rows is doing real work."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.functions.sketches import (
        cms_cells,
        cms_estimate_for,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
    est = cms_estimate_for(exact, cms_cells(toks)).collect()
    assert len(est) > 0
    assert all(r["cms_estimate"] >= r["exact_count"] for r in est)
    # the sized-to-collide sketch must actually overcount somewhere,
    # otherwise the audit column is decorative
    assert any(r["cms_estimate"] > r["exact_count"] for r in est)


def test_cms_cells_merge_by_addition(spark):
    """Sketch mergeability: cells(A ∪ B) == cells(A) + cells(B) for any
    split — the property that makes the build map-side combinable and a
    streaming foreachBatch merge possible."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.functions.sketches import cms_cells
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    def toks(df):
        return df.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
        ).filter(F.col("token") != "")

    for split_expr in ("doc_id % 2 = 0", "n_chars < 200"):
        a = docs.filter(split_expr)
        b = docs.filter(f"NOT ({split_expr})")
        whole = {
            (r["row_i"], r["bucket"]): r["c"]
            for r in cms_cells(toks(docs)).collect()
        }
        merged = {
            (r["row_i"], r["bucket"]): r["c"]
            for r in cms_cells(toks(a))
            .unionByName(cms_cells(toks(b)))
            .groupBy("row_i", "bucket")
            .agg(F.sum("c").alias("c"))
            .collect()
        }
        assert merged == whole, split_expr


def test_dup_span_fraction_hand_computed(spark):
    """Two docs share one 6-token phrase (one duplicated 5-gram chain);
    a third shares nothing. Coverage must be the union of overlapping
    gram intervals, not the gram count times K."""
    from data_pipeline_platform_spark.functions.substring import (
        DUP_K,
        q_dup_span_fraction,
    )

    assert DUP_K == 5
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens -> 2 dup 5-grams
    df = spark.createDataFrame(
        [
            (1, f"one two {shared} three four", "en", "s", 1),
            (2, f"{shared} nine ten eleven twelve", "en", "s", 1),
            (3, "completely different words with no repeats here", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        rows = {
            r["doc_id"]: r for r in q_dup_span_fraction(spark, d).collect()
        }
    # doc 1: 10 tokens; two overlapping dup grams at s=3,4 cover
    # tokens 3..8 -> 6 tokens (union, NOT 2*5)
    assert rows[1]["n_tokens"] == 10
    assert rows[1]["dup_tokens"] == 6
    assert rows[1]["dup_fraction"] == 0.6
    # doc 2: same phrase at s=1,2 -> 6 of 10
    assert rows[2]["dup_tokens"] == 6
    # doc 3: nothing duplicated
    assert rows[3]["dup_tokens"] == 0 and rows[3]["dup_fraction"] == 0.0


def test_avi_decode_real_frames(spark):
    """End-to-end REAL video decode: build an uncompressed 24-bit DIB
    AVI in-test, run it through sample_video_frames, and check the
    sampled means against the known pixel values."""
    import numpy as np

    from data_pipeline_platform_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        make_avi_bytes,
        sample_video_frames,
    )

    # 4 frames at 2 fps (500 ms each, 2 s total), constant-intensity
    # frames 10/60/110/160 — and a non-4-multiple width to hit stride
    # padding
    frames = [np.full((6, 5, 3), 10 + 50 * i, dtype=np.uint8) for i in range(4)]
    avi = make_avi_bytes(frames, fps=2)
    media = spark.createDataFrame(
        [(1, "video", bytearray(avi), "video/x-msvideo", None, None, 2000)],
        MEDIA_SCHEMA,
    )
    out = sample_video_frames(media, every_ms=500).collect()
    assert len(out) == 4
    assert all(r["decoded"] for r in out)
    got = {r["frame_ts_ms"]: r["mean_pixel"] for r in out}
    assert got == {0: 10.0, 500: 60.0, 1000: 110.0, 1500: 160.0}
    # tokens derive from pixels, not byte checksums
    assert {r["frame_token"] for r in out} == {10000, 60000, 110000, 160000}


def test_avi_decode_rejects_non_avi_falls_back_to_stub(spark):
    """Non-AVI video payloads keep the deterministic stub path and are
    marked decoded=false — fake rows stay auditable."""
    from data_pipeline_platform_spark.functions.multimodal import (
        make_fake_media_df,
        sample_video_frames,
    )

    media = make_fake_media_df(spark, n=9).filter("kind = 'video'")
    out = sample_video_frames(media, every_ms=1000).collect()
    assert len(out) > 0
    assert all(not r["decoded"] for r in out)
    assert all(r["mean_pixel"] == 0.0 for r in out)


def test_dsir_weights_separate_target_language(spark):
    """DSIR sanity: with lang='en' as the target domain, the mean
    per-gram log importance weight of en docs must exceed that of
    non-en docs (the estimator must actually rank target-like data
    up), and weights must be finite."""
    import math

    from data_pipeline_platform_spark.functions.dsir import (
        q_dsir_importance_weights,
    )

    rows = q_dsir_importance_weights(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    assert all(math.isfinite(r["avg_logweight"]) for r in rows)
    en = [r["avg_logweight"] for r in rows if r["lang"] == "en"]
    rest = [r["avg_logweight"] for r in rows if r["lang"] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_bpe_encode_compresses_below_characters(spark):
    """Encoding invariants: every doc's BPE symbol count sits between
    its whitespace token count (>= 1 symbol per word) and its character
    count; and the learned merges must actually compress — corpus-wide
    BPE symbols < corpus-wide alnum characters."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.functions.bpe import q_bpe_encode_stats
    from data_pipeline_platform_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    rows = q_bpe_encode_stats(spark, sf).collect()
    assert len(rows) == 500
    assert all(r["bpe_tokens"] >= r["ws_tokens"] for r in rows)
    assert all(r["expansion"] >= 1.0 for r in rows)
    char_total = (
        load_table(spark, sf, "documents")
        .select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
        )
        .select(
            F.when(
                F.col("w").rlike("^[A-Za-z0-9]+$"), F.length("w")
            ).otherwise(F.lit(1)).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    bpe_total = sum(r["bpe_tokens"] for r in rows)
    assert bpe_total < char_total


def test_quantize_embeddings_reconstruction_quality(spark):
    """int8 symmetric quantization on 64-dim vectors must keep
    reconstruction cosine ~1 (>= 0.999) and relative L2 error small
    (< 0.05) for every vector — the audit columns must show a usable
    codec, not just compute."""
    from data_pipeline_platform_spark.functions.similarity import (
        q_quantize_embeddings,
    )

    rows = q_quantize_embeddings(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    assert all(r["cos_recon"] >= 0.999 for r in rows)
    assert all(0.0 <= r["l2_rel_err"] < 0.05 for r in rows)
    # codes must differ across vectors (the checksum pins real content)
    assert len({r["q_checksum"] for r in rows}) > 100


def test_int8_probe_recalls_exact_topk(spark):
    """The int8 probe's final top-10 must recall >= 9 of the exact
    top-10 (on 64-dim vectors the quantized ranking is near-lossless),
    and each row's approx_cos must sit within 0.01 of the exact
    cosine."""
    from data_pipeline_platform_spark.functions.similarity import (
        q_cosine_topk,
        q_cosine_topk_int8,
    )

    sf = "/root/testdata/sf0.001"
    exact_ids = {r["vec_id"] for r in q_cosine_topk(spark, sf).collect()}
    got = q_cosine_topk_int8(spark, sf).collect()
    got_ids = {r["vec_id"] for r in got}
    assert len(got_ids & exact_ids) >= 9
    assert all(abs(r["approx_cos"] - r["cosine"]) < 0.01 for r in got)


def test_time_weighted_avg_hand_computed(spark, tmp_path):
    """TWA vs plain AVG on a burst-y series: value 10 held for 9s then
    value 100 for 1s -> TWA 19.0 (plain AVG of readings would say 55 or
    with the trailing reading excluded, something else entirely)."""
    from datetime import datetime

    from data_pipeline_platform_spark.functions.events import (
        q_events_time_weighted_avg,
    )

    rows = [
        (1, 7, "a", datetime(2024, 1, 1, 0, 0, 0), 10.0, "{}"),
        (2, 7, "a", datetime(2024, 1, 1, 0, 0, 9), 100.0, "{}"),
        (3, 7, "a", datetime(2024, 1, 1, 0, 0, 10), 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp, value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = q_events_time_weighted_avg(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_intervals"] == 2
    assert r["twa_value"] == (10.0 * 9 + 100.0 * 1) / 10


def test_rfm_scores_balanced_and_no_ordered_window(spark):
    """Quintile scores must actually partition the customers (every
    score level populated on the real data) and the plan must contain
    NO Window operator — the boundaries-broadcast design is the point."""
    from collections import Counter

    from data_pipeline_platform_spark.functions.rfm import q_rfm_segments

    df = q_rfm_segments(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    rows = df.collect()
    for col in ("r_score", "f_score", "m_score"):
        c = Counter(r[col] for r in rows)
        assert set(c) <= {1, 2, 3, 4, 5}
        assert len(c) >= 4, (col, c)  # quintiles genuinely populated
    assert all(100 <= r["rfm_code"] <= 555 for r in rows)


def test_frequent_itemsets_pairs_and_no_fact_self_join(spark):
    """Pairs must be canonical (pa < pb), supports >= MIN_SUPPORT, lift
    consistent with a recount; and the plan must contain NO sort-merge
    self-join of the fact table (pair generation is row-local over the
    basket array)."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.functions.basket import (
        MIN_SUPPORT,
        q_frequent_itemsets,
    )

    df = q_frequent_itemsets(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    rows = df.collect()
    assert len(rows) > 100
    assert all(r["pa"] < r["pb"] for r in rows)
    assert all(r["support_ab"] >= MIN_SUPPORT for r in rows)
    assert all(r["lift"] > 0 for r in rows)


def test_triangle_count_matches_networkx_style_bruteforce(spark):
    """Per-part triangle counts vs a direct Python enumeration over the
    same edge set."""
    from itertools import combinations

    from data_pipeline_platform_spark.functions.basket import (
        q_copurchase_triangles,
        q_frequent_itemsets,
    )

    sf = "/root/testdata/sf0.001"
    edges = {
        (r["pa"], r["pb"])
        for r in q_frequent_itemsets(spark, sf).select("pa", "pb").collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri_count = {}
    for node, nbrs in adj.items():
        t = 0
        for x, y in combinations(sorted(nbrs), 2):
            if (x, y) in edges or (y, x) in edges:
                t += 1
        tri_count[node] = t
    got = {
        r["part"]: r["n_triangles"]
        for r in q_copurchase_triangles(spark, sf).collect()
    }
    assert got == tri_count


def test_bm25_matches_rank_bm25_reference_math(spark):
    """BM25 scores vs a direct Python recomputation (textbook Okapi
    formula with the +1 idf smoothing) on the real corpus."""
    import math
    from collections import Counter

    import pandas as pd

    from data_pipeline_platform_spark.functions.bm25 import (
        BM25_B,
        BM25_K1,
        q_bm25_more_like_doc0,
    )

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    toks = {
        r.doc_id: [t for t in r.text.strip().split() if t]
        for r in docs.itertuples()
    }
    q0 = [t for t, _ in sorted(Counter(toks[0]).items(), key=lambda kv: (-kv[1], kv[0]))[:3]]
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in q0}

    def score(doc):
        tf = Counter(toks[doc])
        s_fp = 0
        for t in q0:
            if tf[t] == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            c = idf * (tf[t] * (BM25_K1 + 1.0)) / (
                tf[t] + BM25_K1 * (1.0 - BM25_B + BM25_B * len(toks[doc]) / avgdl)
            )
            s_fp += int(round(c * 1_000_000))
        return round(s_fp / 1_000_000, 6)

    expected = sorted(
        ((score(d), d) for d in toks if d != 0 and score(d) > 0),
        key=lambda kv: (-kv[0], kv[1]),
    )[:20]
    got = [
        (r["score"], r["doc_id"])
        for r in q_bm25_more_like_doc0(spark, sf).collect()
    ]
    assert got == [(s, d) for s, d in expected]


def test_scd2_intervals_tile_history_without_gaps(spark):
    """SCD2 invariants: per customer, versions are 1..n, exactly one
    current row, and consecutive intervals tile (valid_to of version k
    == valid_from of version k+1)."""
    from collections import defaultdict

    from data_pipeline_platform_spark.functions.rfm import (
        q_scd2_customer_balance,
    )

    rows = q_scd2_customer_balance(spark, "/root/testdata/sf0.001").collect()
    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r["o_custkey"]].append(r)
    assert len(by_cust) > 0
    for cust, vs in by_cust.items():
        vs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in vs] == list(range(1, len(vs) + 1))
        assert sum(1 for r in vs if r["is_current"]) == 1
        assert vs[-1]["is_current"] and vs[-1]["valid_to"] is None
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"], cust


def test_source_overlap_estimates_track_true_jaccard(spark):
    """Identical sources must estimate J=1 exactly (identical shingle
    sets -> identical signatures); disjoint sources must estimate near
    0; a half-overlapping pair must land within the 64-hash standard
    error of the true Jaccard."""
    import tempfile

    from data_pipeline_platform_spark.functions.overlap import (
        N_HASHES,
        q_source_overlap,
    )

    base = " ".join(f"tok{i}" for i in range(60))
    other = " ".join(f"zzz{i}" for i in range(60))
    half = " ".join(f"tok{i}" for i in range(30)) + " " + " ".join(
        f"yyy{i}" for i in range(30)
    )
    rows = [
        (1, base, "en", "sA", 1),
        (2, base, "en", "sB", 1),   # sB == sA -> J = 1
        (3, other, "en", "sC", 1),  # sC disjoint from sA
        (4, half, "en", "sD", 1),   # sD half-overlaps sA
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {
            (r["source_a"], r["source_b"]): r
            for r in q_source_overlap(spark, d).collect()
        }
    assert out[("sA", "sB")]["matches"] == N_HASHES
    assert out[("sA", "sB")]["jaccard_est"] == 1.0
    assert out[("sA", "sC")]["jaccard_est"] <= 0.1
    # true J(sA, sD): shared shingles are the 28 3-grams inside tok0..tok29
    # of 58+58 total per side -> 28 / (58 + 58 - 28) ~ 0.318; allow 3 SE
    est = out[("sA", "sD")]["jaccard_est"]
    true_j = 28.0 / (58 + 58 - 28)
    se = (true_j * (1 - true_j) / N_HASHES) ** 0.5
    assert abs(est - true_j) <= 3 * se


def test_cusum_flags_planted_drift_not_steady_state(spark):
    """A steady 10-events/hour series must never flag; the same series
    whose rate doubles halfway must flag by the end of the drifted run
    (and the closed form P - min(prefix, 0) must equal the textbook
    recursion S_t = max(0, S_{t-1} + x_t - mu) replayed in Python)."""
    import datetime
    import tempfile

    from data_pipeline_platform_spark.functions.changepoint import (
        q_cusum_changepoints,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for h in range(48):
        # steady: 10/hour throughout
        for _ in range(10):
            rows.append((eid, t0 + datetime.timedelta(hours=h, minutes=1), 1, "steady", 1.0, "{}"))
            eid += 1
        # drift: 10/hour for day one, 20/hour for day two
        for _ in range(10 if h < 24 else 20):
            rows.append((eid, t0 + datetime.timedelta(hours=h, minutes=2), 2, "drift", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = q_cusum_changepoints(spark, d).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    steady = sorted(by_type["steady"], key=lambda r: r["hour_start"])
    drift = sorted(by_type["drift"], key=lambda r: r["hour_start"])
    assert not any(r["drifting"] for r in steady)
    assert all(r["cusum_scaled"] == 0 for r in steady)
    assert drift[-1]["drifting"]  # accumulated by the end of the run
    assert not any(r["drifting"] for r in drift[:24])  # not before the shift
    # closed form == textbook recursion (scaled domain: mu = T/n exactly)
    n, total = len(drift), sum(r["n_events"] for r in drift)
    s = 0
    for r in drift:
        s = max(0, s + n * r["n_events"] - total)
        assert r["cusum_scaled"] == s


def test_similar_parts_topk_is_symmetric_bounded_and_ranked(spark):
    """Every (part -> neighbor) edge must have the mirrored edge's
    jaccard (symmetry of the undirected census), ranks are 1..k dense
    per part, and each listed jaccard matches the exact co/|union|
    recomputed from the raw baskets."""
    from data_pipeline_platform_spark.functions.basket import (
        TOPK_NEIGHBORS,
        q_similar_parts_topk,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_similar_parts_topk(spark, sf).collect()
    assert rows, "non-vacuous at sf0.001"
    by_part = {}
    jac = {}
    for r in rows:
        by_part.setdefault(r["part"], []).append(r["rank"])
        jac[(r["part"], r["neighbor"])] = r["jaccard"]
    for part, ranks in by_part.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= TOPK_NEIGHBORS
    # recompute one listed pair exactly from the raw fact table
    from data_pipeline_platform_spark.sources.readers import load_table

    some = rows[0]
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    pa = {r[0] for r in li.filter(f"l_partkey = {some['part']}").select("l_orderkey").collect()}
    pb = {r[0] for r in li.filter(f"l_partkey = {some['neighbor']}").select("l_orderkey").collect()}
    co = len(pa & pb)
    assert some["co_orders"] == co
    assert some["jaccard"] == round(co / len(pa | pb), 6)


def test_vocab_growth_invariants(spark):
    """cum_types is nondecreasing, its last value equals the corpus
    distinct-type count, sum(n_docs) equals the doc count, and a
    bucket's new_types can never exceed its token occurrences."""
    from data_pipeline_platform_spark.functions.vocab import q_vocab_growth
    from data_pipeline_platform_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    rows = sorted(q_vocab_growth(spark, sf).collect(), key=lambda r: r["bucket"])
    assert rows
    cums = [r["cum_types"] for r in rows]
    assert cums == sorted(cums)
    assert all(r["new_types"] <= r["n_token_occurrences"] for r in rows)
    docs = load_table(spark, sf, "documents")
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    import pyspark.sql.functions as F

    n_types = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
        .select("t")
        .distinct()
        .count()
    )
    assert cums[-1] == n_types


def test_doremi_step_conserves_mass_and_upweights_hard_domain(spark):
    """weight_new sums to 1 (within fixed-point rounding), every weight
    respects the uniform-smoothing floor, and a domain whose tokens are
    rare (high unigram loss) must gain weight while an easy domain of
    common tokens loses it."""
    import tempfile

    from data_pipeline_platform_spark.functions.mixture import (
        SMOOTH,
        q_doremi_mixture_step,
    )

    common = " ".join(["the quick brown fox jumps over dog"] * 10)
    rows = []
    did = 0
    for i in range(20):  # easy domain: same common tokens everywhere
        rows.append((did, common, "en", "easy", 1)); did += 1
    for i in range(20):  # hard domain: unique tokens per doc
        rows.append((did, " ".join(f"rare{did}x{j}" for j in range(70)), "en", "hard", 1)); did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {r["source"]: r for r in q_doremi_mixture_step(spark, d).collect()}
    total = sum(r["weight_new"] for r in out.values())
    assert abs(total - 1.0) < 1e-4
    k = len(out)
    assert all(r["weight_new"] >= SMOOTH / k - 1e-9 for r in out.values())
    assert out["hard"]["excess"] > 0 > out["easy"]["excess"]
    assert out["hard"]["weight_new"] > out["hard"]["weight_old"]
    assert out["easy"]["weight_new"] < out["easy"]["weight_old"]


def test_pmi_separates_collocation_from_chance(spark):
    """A planted collocation (two tokens always adjacent) must score
    high positive PMI; two frequent-but-independent tokens near zero;
    and pair_count must equal the hand-counted window co-occurrences."""
    import math
    import tempfile

    from data_pipeline_platform_spark.functions.pmi import q_pmi_cooccurrence

    filler = ["alpha", "beta", "gamma", "delta"]
    rows = []
    for i in range(30):
        # "san francisco" always adjacent; filler adjacency mixed by a
        # varying stride so no filler pair becomes a collocation itself
        mid = " ".join(filler[(i * 7 + j * (1 + i % 3)) % 4] for j in range(8))
        rows.append((i, f"san francisco {mid}", "en", "s", 1))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {(r["wa"], r["wb"]): r for r in q_pmi_cooccurrence(spark, d).collect()}
    sf = out[("francisco", "san")]
    assert sf["pair_count"] == 30
    assert sf["pmi"] > 1.0  # strong collocation
    # filler pairs co-occur by construction but are frequent everywhere:
    # their PMI must sit well below the planted collocation's
    filler_pmis = [
        r["pmi"] for (a, b), r in out.items() if a in filler and b in filler
    ]
    assert filler_pmis and max(filler_pmis) < sf["pmi"] - 0.2
    assert sf["pmi"] == max(r["pmi"] for r in out.values())


def test_tokenizer_fertility_reconciles_with_encode_stats(spark):
    """Per-lang fertility must equal the doc-level encode stats rolled
    up by language — the two ops share one contract."""
    from data_pipeline_platform_spark.functions.bpe import (
        q_bpe_encode_stats,
        q_tokenizer_fertility,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    fert = {r["lang"]: r for r in q_tokenizer_fertility(spark, sf).collect()}
    per_doc = q_bpe_encode_stats(spark, sf).collect()
    langs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, sf, "documents").select("doc_id", "lang").collect()
    }
    agg = {}
    for r in per_doc:
        la = langs[r["doc_id"]]
        d = agg.setdefault(la, {"docs": 0, "ws": 0, "bpe": 0})
        d["docs"] += 1; d["ws"] += r["ws_tokens"]; d["bpe"] += r["bpe_tokens"]
    assert set(agg) == set(fert)
    for la, d in agg.items():
        assert fert[la]["n_docs"] == d["docs"]
        assert fert[la]["ws_tokens"] == d["ws"]
        assert fert[la]["bpe_tokens"] == d["bpe"]
        assert fert[la]["fertility"] == round(d["bpe"] / d["ws"], 6)
        assert 1.0 <= fert[la]["fertility"]  # >= one symbol per word


def test_dedup_span_clean_removes_exactly_the_measured_spans(spark):
    """cleaned docs keep exactly n_tokens - dup_tokens tokens (the two
    ops share one coverage contract), the planted shared phrase is gone
    from both docs, and untouched docs round-trip verbatim."""
    import tempfile

    from data_pipeline_platform_spark.functions.substring import (
        q_dedup_span_clean,
        q_dup_span_fraction,
    )

    shared = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [
            (1, f"one two {shared} three four", "en", "s", 1),
            (2, f"{shared} nine ten eleven twelve", "en", "s", 1),
            (3, "completely different words with no repeats here", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        clean = {r["doc_id"]: r for r in q_dedup_span_clean(spark, d).collect()}
        frac = {r["doc_id"]: r for r in q_dup_span_fraction(spark, d).collect()}
    for did in (1, 2, 3):
        assert clean[did]["kept_tokens"] == frac[did]["n_tokens"] - frac[did]["dup_tokens"]
        assert len(clean[did]["cleaned_text"].split()) == clean[did]["kept_tokens"]
    assert clean[1]["cleaned_text"] == "one two three four"
    assert clean[2]["cleaned_text"] == "nine ten eleven twelve"
    assert clean[3]["cleaned_text"] == "completely different words with no repeats here"


def test_embedding_outliers_flags_planted_far_vector(spark):
    """A cluster of near-identical vectors plus one far vector: the far
    vector must flag, the tight cluster must not, and the flag must
    agree with a numpy replay of the z>2 rule."""
    import tempfile

    import numpy as np

    from data_pipeline_platform_spark.functions.similarity import (
        q_embedding_outliers,
    )

    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):  # tight cluster around 1.0
        rows.append((i, (1.0 + 0.01 * rng.standard_normal(8)).astype("float32").tolist(), 0))
    rows.append((99, [5.0] * 8, 0))  # planted outlier
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/embeddings.parquet")
        out = {r["vec_id"]: r for r in q_embedding_outliers(spark, d).collect()}
    assert out[99]["outlier"] is True
    assert sum(1 for r in out.values() if r["outlier"]) == 1
    # numpy replay on the exact integer distances
    import math

    d_fp = {k: r["dist_fp"] for k, r in out.items()}
    vals = list(d_fp.values())
    n, s, s2 = len(vals), sum(vals), sum(v * v for v in vals)
    for k, v in d_fp.items():
        expected = (n * v - s) > 0 and (n * v - s) ** 2 > 4 * (n * s2 - s * s)
        assert out[k]["outlier"] == expected


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A 12-token doc fully embedded in a 60-token host: Jaccard ~ 0.17
    (below every dedup threshold) but containment = 1.0 must flag it,
    oriented small-inside-large."""
    import tempfile

    from data_pipeline_platform_spark.functions.dedup import (
        q_dedup_clusters,
        q_dedup_containment,
    )

    excerpt = " ".join(f"w{i}" for i in range(12))
    host = excerpt + " " + " ".join(f"h{i}" for i in range(48))
    other = " ".join(f"z{i}" for i in range(30))
    df = spark.createDataFrame(
        [
            (1, excerpt, "en", "s", 1),
            (2, host, "en", "s", 1),
            (3, other, "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        rows = q_dedup_containment(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["contained_doc"] == 1 and r["container_doc"] == 2
    assert r["containment"] == 1.0


def test_knn_classify_recovers_planted_cluster_labels(spark):
    """Two well-separated label clusters with one mislabeled vector:
    k-NN must predict every clean vector's own label and out-vote the
    mislabeled one with its neighbors' label."""
    import tempfile

    import numpy as np

    from data_pipeline_platform_spark.functions.similarity import q_knn_classify

    rng = np.random.default_rng(3)
    rows = []
    for i in range(30):  # label 0 cluster near (1, ..., 1)
        rows.append((i, (1.0 + 0.02 * rng.standard_normal(8)).astype("float32").tolist(), 0))
    for i in range(30, 60):  # label 1 cluster near (-1, ..., -1)
        rows.append((i, (-1.0 + 0.02 * rng.standard_normal(8)).astype("float32").tolist(), 1))
    # mislabeled: sits in cluster 0 but tagged 1
    rows.append((99, (1.0 + 0.02 * rng.standard_normal(8)).astype("float32").tolist(), 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/embeddings.parquet")
        out = {r["vec_id"]: r for r in q_knn_classify(spark, d).collect()}
    assert out[99]["predicted_label"] == 0 and out[99]["label"] == 1
    clean_wrong = [
        k for k, r in out.items() if k != 99 and r["predicted_label"] != r["label"]
    ]
    assert clean_wrong == []


def test_session_paths_respect_session_boundaries(spark):
    """Paths must never span a >30-min silence: a user emitting
    A,B,C then a 2-hour gap then D,E,F yields exactly the two in-
    session paths and nothing bridging the gap."""
    import datetime
    import tempfile

    from data_pipeline_platform_spark.functions.changepoint import q_session_paths

    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, minutes, etype):
        return (eid, t0 + datetime.timedelta(minutes=minutes), 1, etype, 1.0, "{}")

    rows = [
        ev(1, 0, "A"), ev(2, 1, "B"), ev(3, 2, "C"),
        ev(4, 150, "D"), ev(5, 151, "E"), ev(6, 152, "F"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r["path"]: r["n"] for r in q_session_paths(spark, d).collect()}
    assert out == {"A > B > C": 1, "D > E > F": 1}


def test_quality_ablation_reconciles_with_gate_audits(spark):
    """n_fail / n_unique_fail per rule must equal a recount over the
    gate's own audit booleans, and unique <= fail <= n_docs."""
    from data_pipeline_platform_spark.functions.repetition import (
        _GOPHER_RULES,
        q_gopher_quality_filter,
        q_quality_ablation_report,
    )

    sf = "/root/testdata/sf0.001"
    audits = q_gopher_quality_filter(spark, sf).collect()
    rep = {r["rule"]: r for r in q_quality_ablation_report(spark, sf).collect()}
    assert set(rep) == set(_GOPHER_RULES)
    for rule in _GOPHER_RULES:
        fails = sum(1 for a in audits if not a[rule])
        uniq = sum(
            1
            for a in audits
            if not a[rule] and all(a[o] for o in _GOPHER_RULES if o != rule)
        )
        assert rep[rule]["n_docs"] == len(audits)
        assert rep[rule]["n_fail"] == fails
        assert rep[rule]["n_unique_fail"] == uniq
        assert uniq <= fails <= len(audits)


def test_benford_shares_sum_to_one_and_chi2_matches_scipy_style(spark):
    """Observed shares sum to 1 over digits 1-9, expectations are the
    Benford constants, and each chi2 term matches a python recompute."""
    from data_pipeline_platform_spark.functions.quality import (
        _BENFORD_P,
        q_benford_check,
    )

    sf = "/root/testdata/sf0.001"
    rows = {r["digit"]: r for r in q_benford_check(spark, sf).collect()}
    assert set(rows) <= set(range(1, 10))
    total = sum(r["n"] for r in rows.values())
    assert abs(sum(r["observed_p"] for r in rows.values()) - 1.0) < 1e-4
    for d, r in rows.items():
        assert r["expected_p"] == round(_BENFORD_P[d], 6)
        e = _BENFORD_P[d] * total
        assert abs(r["chi2_term"] - (r["n"] - e) ** 2 / e) < 1e-3


def test_seasonality_decompose_identity_and_planted_weekly_pattern(spark):
    """revenue == trend + seasonal + residual (to fixed-point
    resolution) on real data, and on a planted flat-trend series with
    a weekend bump the seasonal component must carry the bump."""
    import datetime
    import tempfile

    from data_pipeline_platform_spark.functions.changepoint import (
        q_seasonality_decompose,
    )

    sf = "/root/testdata/sf0.001"
    for r in q_seasonality_decompose(spark, sf).collect():
        assert abs(r["revenue"] - (r["trend"] + r["seasonal"] + r["residual"])) < 2e-4
    # planted: 100/day, 200 on day-of-week 5 and 6 (Sat/Sun from the
    # Monday epoch), for 8 weeks
    t0 = datetime.datetime(2024, 1, 1)  # a Monday
    rows = []
    oid = 0
    for d in range(56):
        dow = d % 7
        amt = 200.0 if dow >= 5 else 100.0
        rows.append((oid, 1, "O", amt, t0 + datetime.timedelta(days=d), "1-URGENT"))
        oid += 1
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/orders.parquet")
        out = q_seasonality_decompose(spark, d).collect()
    import statistics

    by_dow = {}
    for r in out:
        by_dow.setdefault(r["day"].weekday(), []).append(r["seasonal"])
    weekend = statistics.mean(by_dow[5] + by_dow[6])
    weekday = statistics.mean(sum((by_dow[i] for i in range(5)), []))
    assert weekend > weekday + 50  # the bump lands in the seasonal term


def test_char_entropy_orders_text_classes_and_matches_python(spark):
    """Uniform random-ish base64 must score above English-like text,
    which must score above a one-character run; values must match a
    python recompute of the same fixed-point formula."""
    import math
    import tempfile

    from data_pipeline_platform_spark.functions.text import (
        _ENT_SCALE,
        q_char_entropy,
    )

    texts = {
        1: "the quick brown fox jumps over the lazy dog and keeps running",
        2: "QmFzZTY0IGJsb2JzIGxvb2sgbGlrZSB0aGlzIHh5ejAxMjM0NTY3ODk rTuV",
        3: "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    }
    df = spark.createDataFrame(
        [(k, v, "en", "s", len(v)) for k, v in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r["entropy_bits"] for r in q_char_entropy(spark, d).collect()}

    def replay(s):
        n = len(s)
        acc = 0
        for ch in sorted(set(s)):
            c = s.count(ch)
            acc += c * round(math.log(c / n) * _ENT_SCALE)
        return round(-acc / n / _ENT_SCALE / math.log(2.0), 6)

    for k, v in texts.items():
        assert out[k] == replay(v)
    assert out[2] > out[1] > out[3] == 0.0


def test_corpus_health_report_reconciles_with_components(spark):
    """Each column must equal its standalone operator's value — the
    report is a composition, not a re-derivation."""
    from data_pipeline_platform_spark.functions.mixture import (
        q_corpus_health_report,
        q_doremi_mixture_step,
    )
    from data_pipeline_platform_spark.functions.overlap import q_source_overlap

    sf = "/root/testdata/sf0.001"
    rep = {r["source"]: r for r in q_corpus_health_report(spark, sf).collect()}
    dm = {r["source"]: r for r in q_doremi_mixture_step(spark, sf).collect()}
    so = q_source_overlap(spark, sf).collect()
    max_ov = {}
    for r in so:
        for s in (r["source_a"], r["source_b"]):
            max_ov[s] = max(max_ov.get(s, 0.0), r["jaccard_est"])
    assert set(rep) == set(dm)
    for s, r in rep.items():
        assert r["n_tokens"] == dm[s]["n_tokens"]
        assert r["weight_new"] == dm[s]["weight_new"]
        assert r["loss"] == dm[s]["loss"]
        assert r["max_source_overlap"] == max_ov[s]
        assert 0.0 <= r["gate_pass_rate"] <= 1.0


def test_language_confusion_marginals_reconcile(spark):
    """Cell counts must sum to the doc count, recall shares to 1 per
    true class, precision shares to 1 per predicted class, and the
    matrix must agree with a recount of language_id's output."""
    from data_pipeline_platform_spark.functions.text import (
        q_language_confusion,
        q_language_id,
    )

    sf = "/root/testdata/sf0.001"
    cm = q_language_confusion(spark, sf).collect()
    preds = q_language_id(spark, sf).collect()
    assert sum(r["n"] for r in cm) == len(preds)
    from collections import Counter

    recount = Counter((r["lang"], r["predicted_lang"]) for r in preds)
    assert {(r["lang"], r["predicted_lang"]): r["n"] for r in cm} == dict(recount)
    by_true, by_pred = {}, {}
    for r in cm:
        by_true[r["lang"]] = by_true.get(r["lang"], 0.0) + r["recall_share"]
        by_pred[r["predicted_lang"]] = by_pred.get(r["predicted_lang"], 0.0) + r["precision_share"]
    assert all(abs(v - 1.0) < 1e-3 for v in by_true.values())
    assert all(abs(v - 1.0) < 1e-3 for v in by_pred.values())


def test_holt_forecast_tracks_linear_trend_and_replays_in_python(spark):
    """On a perfectly linear revenue series the forecast must continue
    the line (within the geometric-convergence residue), and the exact
    doubles must equal a python replay of the same recursion."""
    import datetime
    import tempfile

    from data_pipeline_platform_spark.functions.changepoint import (
        FORECAST_H,
        q_holt_forecast,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(40):  # revenue 100 + 10*d dollars
        rows.append((d, 1, "O", 100.0 + 10.0 * d, t0 + datetime.timedelta(days=d), "1-URGENT"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/orders.parquet")
        out = {r["horizon"]: r["forecast"] for r in q_holt_forecast(spark, d).collect()}
    # python replay
    xs = [(100.0 + 10.0 * i) * 100 for i in range(40)]
    l, b = float(xs[0]), 0.0
    for x in xs[1:]:
        nl = 0.5 * float(x) + 0.5 * (l + b)
        b = 0.5 * (nl - l) + 0.5 * b
        l = nl
    for h in range(1, FORECAST_H + 1):
        assert out[h] == round((l + h * b) / 100, 6)
        expected_line = 100.0 + 10.0 * (39 + h)
        assert abs(out[h] - expected_line) < 1.0  # converged to the trend


def test_dedup_cluster_sizes_reconcile_with_clusters(spark):
    """The histogram must recount q_dedup_clusters exactly and exclude
    singletons."""
    from collections import Counter

    from data_pipeline_platform_spark.functions.dedup import (
        q_dedup_cluster_sizes,
        q_dedup_clusters,
    )

    sf = "/root/testdata/sf0.001"
    cl = q_dedup_clusters(spark, sf).collect()
    sizes = Counter(Counter(r["cluster"] for r in cl).values())
    expected = {s: n for s, n in sizes.items() if s >= 2}
    got = {
        r["cluster_size"]: r["n_clusters"]
        for r in q_dedup_cluster_sizes(spark, sf).collect()
    }
    assert got == expected and got  # non-vacuous at sf0.001


def test_winsorize_clips_about_two_percent_and_preserves_interior(spark):
    """~1% clips on each side, interior values pass through unchanged,
    and every winsorized value sits inside [p1, p99]."""
    from data_pipeline_platform_spark.functions.changepoint import (
        q_winsorize_events,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_winsorize_events(spark, sf).collect()
    n = len(rows)
    lo = sum(1 for r in rows if r["clipped_low"])
    hi = sum(1 for r in rows if r["clipped_high"])
    assert 0 < lo <= 0.02 * n and 0 < hi <= 0.02 * n
    interior = [r for r in rows if not r["clipped_low"] and not r["clipped_high"]]
    for r in interior[:50]:
        assert abs(r["winsorized"] - round(r["value"], 6)) < 2e-6
    wmin = min(r["winsorized"] for r in rows)
    wmax = max(r["winsorized"] for r in rows)
    for r in rows:
        assert wmin <= r["winsorized"] <= wmax


def test_heldout_perplexity_scores_unseen_tokens_lower(spark):
    """A held-out doc of in-vocab tokens must score above one full of
    never-seen tokens, OOV counts must be exact, and every mean
    logprob is negative."""
    import tempfile

    from data_pipeline_platform_spark.functions.repetition import (
        q_heldout_perplexity,
    )

    rows = []
    for i in range(20):  # training: src1, common vocabulary
        rows.append((i, "data table query join filter sort merge scan", "en", "src1", 1))
    rows.append((100, "data table query join", "en", "src0", 1))       # in-vocab
    rows.append((101, "zebra quasar nebula fjord", "en", "src0", 1))   # all OOV
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in q_heldout_perplexity(spark, d).collect()}
    assert set(out) == {100, 101}
    assert out[100]["oov_tokens"] == 0
    assert out[101]["oov_tokens"] == 4
    assert out[100]["mean_logprob"] > out[101]["mean_logprob"]
    assert all(r["mean_logprob"] < 0 for r in out.values())


def test_ab_ttest_matches_textbook_welch(spark):
    """t statistic and Welch df must match a python recompute from the
    raw values (to 6dp rounding), and a planted mean shift must push
    |t| far above the null."""
    import tempfile
    import datetime

    from data_pipeline_platform_spark.functions.changepoint import q_ab_ttest

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    a_vals = [10.0 + (i % 5) * 0.5 for i in range(40)]       # mean ~11
    b_vals = [5.0 + (i % 7) * 0.25 for i in range(60)]       # mean ~5.75
    for v in a_vals:
        rows.append((eid, t0, 1, "purchase", v, "{}")); eid += 1
    for v in b_vals:
        rows.append((eid, t0, 1, "view", v, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        r = q_ab_ttest(spark, d).collect()[0]

    import statistics

    ma, mb = statistics.mean(a_vals), statistics.mean(b_vals)
    va = statistics.variance(a_vals) / len(a_vals)
    vb = statistics.variance(b_vals) / len(b_vals)
    t = (ma - mb) / (va + vb) ** 0.5
    df_w = (va + vb) ** 2 / (va * va / (len(a_vals) - 1) + vb * vb / (len(b_vals) - 1))
    assert r["n_a"] == 40 and r["n_b"] == 60
    assert abs(r["mean_a"] - round(ma, 6)) < 1e-6
    assert abs(r["t_stat"] - t) < 1e-4
    assert abs(r["welch_df"] - df_w) < 1e-3
    assert r["t_stat"] > 10  # planted shift is unmistakable


def test_pca_variance_explained_matches_numpy(spark):
    """eigenvalue/trace must land within quantization distance of
    numpy's top-eigenvalue share on the real embedding table, and lie
    in (1/d, 1]."""
    import numpy as np

    from data_pipeline_platform_spark.functions.spectral import (
        q_pca_variance_explained,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    r = q_pca_variance_explained(spark, sf).collect()[0]
    vecs = np.array(
        [
            row["embedding"]
            for row in load_table(spark, sf, "embeddings").select("embedding").collect()
        ],
        dtype="float64",
    )
    c = vecs - vecs.mean(axis=0)
    cov = (c.T @ c) / len(vecs)
    w = np.linalg.eigvalsh(cov)
    expected = w[-1] / np.trace(cov)
    assert abs(r["variance_explained"] - expected) < 0.01
    d = vecs.shape[1]
    assert 1.0 / d < r["variance_explained"] <= 1.0
    assert abs(r["trace"] - np.trace(cov)) < 1e-3


def test_bootstrap_ci_brackets_the_mean_with_sane_width(spark):
    """The interval must contain the point mean, be ordered, and its
    width must be within a few multiples of the CLT standard error."""
    from data_pipeline_platform_spark.functions.changepoint import q_bootstrap_ci
    from data_pipeline_platform_spark.sources.readers import load_table
    import statistics

    sf = "/root/testdata/sf0.001"
    r = q_bootstrap_ci(spark, sf).collect()[0]
    assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"]
    vals = [
        row["o_totalprice"]
        for row in load_table(spark, sf, "orders").select("o_totalprice").collect()
    ]
    se = statistics.stdev(vals) / len(vals) ** 0.5
    width = r["ci_hi"] - r["ci_lo"]
    # 95% CI ~ 3.92 SE; Poisson bootstrap at B=100 is noisy — allow 2-8 SE
    assert 2 * se < width < 8 * se


def test_chi2_terms_reconcile_and_marginals_hold(spark):
    """Expected counts must reproduce the marginal products, cell
    counts must sum to the order count, and chi2 terms match a python
    recompute."""
    from data_pipeline_platform_spark.functions.quality import (
        q_chi2_independence,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    rows = q_chi2_independence(spark, sf).collect()
    n_orders = load_table(spark, sf, "orders").count()
    assert sum(r["n"] for r in rows) == n_orders
    from collections import defaultdict

    nr, nc = defaultdict(int), defaultdict(int)
    for r in rows:
        nr[r["c_mktsegment"]] += r["n"]
        nc[r["o_orderpriority"]] += r["n"]
    for r in rows:
        e = nr[r["c_mktsegment"]] * nc[r["o_orderpriority"]] / n_orders
        assert abs(r["expected"] - e) < 1e-3
        assert abs(r["chi2_term"] - (r["n"] - e) ** 2 / e) < 1e-3


def test_cohort_ltv_curves_are_monotone_and_reconcile(spark):
    """Cumulative LTV is nondecreasing within each cohort, ages start
    at 0, and total revenue across cells equals the orders total."""
    from data_pipeline_platform_spark.functions.rfm import q_cohort_ltv
    from data_pipeline_platform_spark.sources.readers import load_table
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    rows = q_cohort_ltv(spark, sf).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age"])
        assert rs[0]["age"] == 0
        curve = [r["cum_ltv_per_customer"] for r in rs]
        assert curve == sorted(curve)
    total = round(sum(r["revenue"] for r in rows), 2)
    expected = load_table(spark, sf, "orders").agg(
        F.round(F.sum("o_totalprice"), 2)
    ).collect()[0][0]
    assert abs(total - float(expected)) < 0.05


def test_km_survival_matches_lifelines_style_recompute(spark):
    """log-survival must equal a python KM replay over the same
    lifetimes/censoring, be nonincreasing, and never count censored
    users as deaths."""
    import math

    from data_pipeline_platform_spark.functions.changepoint import q_km_survival
    from data_pipeline_platform_spark.sources.readers import load_table
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    rows = sorted(q_km_survival(spark, sf).collect(), key=lambda r: r["life_h"])
    # python replay from raw events
    ev = load_table(spark, sf, "events")
    t_end = ev.agg(F.max("ts")).collect()[0][0]
    lives = []
    for r in (
        ev.groupBy("user_id").agg(F.min("ts").alias("t0"), F.max("ts").alias("t1")).collect()
    ):
        life = (int(r["t1"].timestamp()) - int(r["t0"].timestamp())) // 3600
        cens = (int(t_end.timestamp()) - int(r["t1"].timestamp())) < 86400
        lives.append((life, cens))
    hours = sorted({h for h, _ in lives})
    ln_acc = 0.0
    expect = {}
    for h in hours:
        at_risk = sum(1 for lh, _ in lives if lh >= h)
        deaths = sum(1 for lh, c in lives if lh == h and not c)
        if deaths:
            ln_acc += round(math.log((at_risk - deaths) / at_risk) * 1e6) / 1e6 * 1e6
        expect[h] = ln_acc
    got = {r["life_h"]: r["log_survival"] for r in rows}
    assert set(got) == set(hours)
    for h in hours:
        assert abs(got[h] - expect[h] / 1e6) < 2e-6
    curve = [r["log_survival"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(curve, curve[1:]))


def test_user_features_momentum_detects_accelerating_user(spark):
    """A user whose events crowd the second half of their interval
    must show positive momentum; a uniform user near zero; counts and
    span reconcile exactly."""
    import datetime
    import tempfile

    from data_pipeline_platform_spark.functions.events import q_user_features

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # user 1: uniform, one event every hour for 10 hours
    for h in range(10):
        rows.append((eid, t0 + datetime.timedelta(hours=h), 1, "view", 2.0, "{}")); eid += 1
    # user 2: 2 early events then 8 crowded at the end of a 10h span
    rows.append((eid, t0, 2, "view", 1.0, "{}")); eid += 1
    rows.append((eid, t0 + datetime.timedelta(hours=1), 2, "view", 1.0, "{}")); eid += 1
    for m in range(8):
        rows.append((eid, t0 + datetime.timedelta(hours=10, minutes=-m), 2, "view", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r["user_id"]: r for r in q_user_features(spark, d).collect()}
    assert out[1]["n_events"] == 10 and out[1]["span_hours"] == 9
    assert abs(out[1]["momentum"]) <= 0.2
    assert out[2]["momentum"] >= 0.6
    assert out[2]["late_events"] == 8
    assert out[2]["mean_value"] == 1.0


def test_contamination_span_fraction_measures_planted_overlap(spark):
    """A train doc embedding a 7-token benchmark phrase must show
    exactly 7 contaminated tokens (union of overlapping 5-gram spans);
    clean docs show zero."""
    import tempfile

    from data_pipeline_platform_spark.functions.substring import (
        q_contamination_span_fraction,
    )

    phrase = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    df = spark.createDataFrame(
        [
            (1, f"intro words {phrase} trailing words here", "en", "src1", 1),
            (2, "totally unrelated training text goes here", "en", "src2", 1),
            (3, f"benchmark has {phrase} inside it", "en", "src0", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in q_contamination_span_fraction(spark, d).collect()}
    assert set(out) == {1, 2}  # benchmark doc itself excluded
    assert out[1]["contam_tokens"] == 7
    assert out[1]["contam_fraction"] == round(7 / out[1]["n_tokens"], 6)
    assert out[2]["contam_tokens"] == 0


def test_seasonal_cusum_ignores_weekly_pattern_catches_level_shift(spark):
    """A strong weekend pattern with a flat level must NOT drift; the
    same pattern with a genuine +60% level shift halfway must."""
    import datetime
    import tempfile

    from data_pipeline_platform_spark.functions.changepoint import q_seasonal_cusum

    def build(shift):
        t0 = datetime.datetime(2024, 1, 1)  # Monday
        rows, oid = [], 0
        for d in range(84):  # 12 weeks
            dow = d % 7
            amt = 200.0 if dow >= 5 else 100.0
            if shift and d >= 42:
                amt *= 1.6
            rows.append((oid, 1, "O", amt, t0 + datetime.timedelta(days=d), "1-URGENT"))
            oid += 1
        return rows

    schema = "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    with tempfile.TemporaryDirectory() as d1, tempfile.TemporaryDirectory() as d2:
        spark.createDataFrame(build(False), schema).write.parquet(f"{d1}/orders.parquet")
        spark.createDataFrame(build(True), schema).write.parquet(f"{d2}/orders.parquet")
        flat = q_seasonal_cusum(spark, d1).collect()
        shifted = sorted(q_seasonal_cusum(spark, d2).collect(), key=lambda r: r["day"])
    assert not any(r["drifting"] for r in flat)
    assert any(r["drifting"] for r in shifted[42:])
    assert not any(r["drifting"] for r in shifted[:35])


def test_feature_correlations_match_numpy_least_squares(spark):
    """slope/intercept/r for each feature must match numpy's polyfit/
    corrcoef on the same (quantized) pairs."""
    import numpy as np

    from data_pipeline_platform_spark.functions.regression import (
        _FEATURES,
        _FP,
        q_feature_correlations,
    )
    from data_pipeline_platform_spark.functions.repetition import (
        q_unigram_logprob,
    )
    from data_pipeline_platform_spark.functions.text import q_text_stats

    sf = "/root/testdata/sf0.001"
    out = {r["feature"]: r for r in q_feature_correlations(spark, sf).collect()}
    stats = {r["doc_id"]: r for r in q_text_stats(spark, sf).collect()}
    flu = {
        r["doc_id"]: round(r["mean_logprob"] * _FP) / _FP
        for r in q_unigram_logprob(spark, sf).collect()
    }
    for f in _FEATURES:
        xs = np.array([round(stats[d][f] * _FP) / _FP for d in flu])
        ys = np.array([flu[d] for d in flu])
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        assert abs(out[f]["slope"] - slope) < 1e-4 * max(1, abs(slope))
        assert abs(out[f]["intercept"] - intercept) < 1e-3
        assert abs(out[f]["pearson_r"] - r) < 1e-4
        assert out[f]["n"] == len(xs)


def test_score_calibration_deciles_partition_the_corpus(spark):
    """Decile counts must sum to the doc count, mean scores must be
    strictly increasing across deciles, and pass rates stay in [0,1]."""
    from data_pipeline_platform_spark.functions.regression import (
        q_score_calibration,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    rows = sorted(q_score_calibration(spark, sf).collect(), key=lambda r: r["decile"])
    n_docs = load_table(spark, sf, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    means = [r["mean_score"] for r in rows]
    assert means == sorted(means)
    assert all(0.0 <= r["gate_pass_rate"] <= 1.0 for r in rows)
    assert 8 <= len(rows) <= 10  # ties can merge buckets, never explode


def test_simhash_curve_separates_head_from_tail(spark):
    """Small hamming must mean true near-dups (exact Jaccard ~ 1),
    large hamming chance collisions (~ 0) — the separation the screen
    is built on; counts reconcile with the raw pair set."""
    from data_pipeline_platform_spark.functions.dedup import (
        q_dedup_simhash,
        q_simhash_jaccard_curve,
    )

    sf = "/root/testdata/sf0.001"
    curve = sorted(
        q_simhash_jaccard_curve(spark, sf).collect(), key=lambda r: r["hamming"]
    )
    assert curve
    n_pairs = q_dedup_simhash(spark, sf).count()
    assert sum(r["n_pairs"] for r in curve) == n_pairs
    # the screen's premise is SEPARATION, not smooth monotonicity: tiny
    # hamming = true near-dups, large hamming = chance collisions
    head = [r for r in curve if r["hamming"] <= 2]
    tail = [r for r in curve if r["hamming"] >= 5]
    assert head and min(r["mean_jaccard"] for r in head) >= 0.9
    assert tail and max(r["mean_jaccard"] for r in tail) <= 0.2
    for r in curve:
        assert 0 <= r["true_near_dups"] <= r["n_pairs"]


def test_supplier_hhi_bounds_and_monopoly_case(spark):
    """HHI lies in (1e4/n_suppliers, 1e4]; a one-supplier nation scores
    exactly 10000."""
    import tempfile

    from data_pipeline_platform_spark.queries5 import q_supplier_hhi

    sf = "/root/testdata/sf0.001"
    for r in q_supplier_hhi(spark, sf).collect():
        assert 10000.0 / r["n_suppliers"] - 1e-6 <= r["hhi"] <= 10000.0 + 1e-6
    # synthetic monopoly
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", __import__("datetime").datetime(2024, 1, 1))],
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
        ).write.parquet(f"{d}/lineitem.parquet")
        spark.createDataFrame(
            [(1, 0)], "s_suppkey long, s_nationkey long"
        ).write.parquet(f"{d}/supplier.parquet")
        spark.createDataFrame(
            [(0, "MONO")], "n_nationkey long, n_name string"
        ).write.parquet(f"{d}/nation.parquet")
        rows = q_supplier_hhi(spark, d).collect()
    assert len(rows) == 1 and rows[0]["hhi"] == 10000.0


def test_brand_return_rate_flag_replays_z_rule(spark):
    """The elevated flag must equal a python replay of the exact
    integer z-rule, and rates reconcile with counts."""
    from data_pipeline_platform_spark.queries5 import q_brand_return_rate

    sf = "/root/testdata/sf0.001"
    rows = q_brand_return_rate(spark, sf).collect()
    n0 = sum(r["n_items"] for r in rows)
    r0 = sum(r["n_returned"] for r in rows)
    for r in rows:
        assert r["return_rate"] == round(r["n_returned"] / r["n_items"], 6)
        d = r["n_returned"] * n0 - r0 * r["n_items"]
        expected = d > 0 and d * d > 4 * r0 * (n0 - r0) * r["n_items"]
        assert bool(r["elevated"]) == expected


def test_user_type_entropy_bounds_and_degenerate_user(spark):
    """A one-type user scores exactly 0; a uniform k-type user scores
    exactly log2(k) (up to fixed-point); entropy never exceeds
    log2(n_types)."""
    import datetime
    import math
    import tempfile

    from data_pipeline_platform_spark.functions.events import q_user_type_entropy

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for _ in range(8):  # user 1: only clicks
        rows.append((eid, t0, 1, "click", 1.0, "{}")); eid += 1
    for t in ("a", "b", "c", "d"):  # user 2: uniform over 4 types
        for _ in range(5):
            rows.append((eid, t0, 2, t, 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r["user_id"]: r for r in q_user_type_entropy(spark, d).collect()}
    assert out[1]["entropy_bits"] == 0.0 and out[1]["n_types"] == 1
    assert abs(out[2]["entropy_bits"] - 2.0) < 1e-5
    for r in out.values():
        assert r["entropy_bits"] <= math.log2(max(r["n_types"], 1)) + 1e-6


def test_embedding_split_drift_zero_for_identical_halves(spark):
    """If both halves contain identical vectors the centroids agree
    exactly (drift 0); shifting one half's vectors produces drift."""
    import tempfile

    from data_pipeline_platform_spark.functions.similarity import (
        q_embedding_split_drift,
    )

    # vec_ids chosen so md5 first hex splits them across halves; all
    # identical vectors -> whatever the split, centroids coincide
    rows = [(i, [1.0] * 8, 0) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/embeddings.parquet")
        out = q_embedding_split_drift(spark, d).collect()
    assert len(out) == 1 and out[0]["drift_fp"] == 0


def test_trade_matrix_reconciles_with_total_revenue(spark):
    """Matrix cells must sum to the corpus revenue and cover every
    supplier nation present in the data."""
    import pyspark.sql.functions as F

    from data_pipeline_platform_spark.queries5 import q_trade_matrix
    from data_pipeline_platform_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    rows = q_trade_matrix(spark, sf).collect()
    total = round(sum(r["revenue"] for r in rows), 2)
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders").select("o_orderkey")
    expected = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .agg(
            F.expr(
                "round(CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100, 2)"
            )
        )
        .collect()[0][0]
    )
    assert abs(total - float(expected)) < 0.05
    assert len({r["supp_nation"] for r in rows}) >= 5


def test_pareto_share_bounds_and_replay(spark):
    """~10% of customers are 'top', their share exceeds 10% (revenue
    concentrates), and the share matches a python recompute."""
    from data_pipeline_platform_spark.queries5 import q_pareto_share
    from data_pipeline_platform_spark.sources.readers import load_table
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    r = q_pareto_share(spark, sf).collect()[0]
    assert 0.05 <= r["n_top"] / r["n_customers"] <= 0.15
    assert r["top_decile_share"] > 0.1
    revs = [
        row["rev"]
        for row in load_table(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.expr("SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev"))
        .collect()
    ]
    import statistics

    p90 = statistics.quantiles(sorted(revs), n=10, method="inclusive")[-1]
    top = sum(v for v in revs if v > p90)
    assert abs(r["top_decile_share"] - top / sum(revs)) < 1e-6


def test_arrival_burstiness_separates_heartbeat_from_bursts(spark):
    """A strict 60s heartbeat must score CV = 0; a bursty stream
    (tight clusters separated by long silences) scores CV > 1."""
    import datetime
    import tempfile

    from data_pipeline_platform_spark.functions.events import q_arrival_burstiness

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for i in range(50):  # heartbeat: exactly every 60s
        rows.append((eid, t0 + datetime.timedelta(seconds=60 * i), 1, "heartbeat", 1.0, "{}")); eid += 1
    ts = 0
    for burst in range(10):  # bursts of 5 events 1s apart, then 1h gap
        for j in range(5):
            rows.append((eid, t0 + datetime.timedelta(seconds=ts + j), 2, "bursty", 1.0, "{}")); eid += 1
        ts += 3600
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r["event_type"]: r for r in q_arrival_burstiness(spark, d).collect()}
    assert out["heartbeat"]["cv"] == 0.0
    assert out["heartbeat"]["mean_gap_s"] == 60.0
    assert out["bursty"]["cv"] > 1.5


def test_degree_hist_reconciles_with_triangle_op_degrees(spark):
    """The histogram must recount the per-part degrees the triangle op
    reports."""
    from collections import Counter

    from data_pipeline_platform_spark.functions.basket import (
        q_copurchase_degree_hist,
        q_copurchase_triangles,
    )

    sf = "/root/testdata/sf0.001"
    tri = q_copurchase_triangles(spark, sf).collect()
    expected = Counter(r["degree"] for r in tri)
    got = {
        r["degree"]: r["n_parts"] for r in q_copurchase_degree_hist(spark, sf).collect()
    }
    assert got == dict(expected) and got


def test_region_shares_sum_to_one_per_year(spark):
    from collections import defaultdict

    from data_pipeline_platform_spark.queries5 import q_region_share_trend

    rows = q_region_share_trend(spark, "/root/testdata/sf0.001").collect()
    by_yr = defaultdict(float)
    for r in rows:
        by_yr[r["yr"]] += r["share"]
    assert by_yr and all(abs(v - 1.0) < 1e-4 for v in by_yr.values())


def test_catalog_coverage_counts_unsold_parts(spark):
    import pyspark.sql.functions as F

    from data_pipeline_platform_spark.queries5 import q_catalog_coverage
    from data_pipeline_platform_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    rows = q_catalog_coverage(spark, sf).collect()
    n_parts = load_table(spark, sf, "part").count()
    n_ordered = (
        load_table(spark, sf, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert sum(r["n_ordered"] for r in rows) == n_ordered
    assert all(0.0 <= r["coverage"] <= 1.0 for r in rows)


def test_events_load_profile_partitions_all_events(spark):
    from data_pipeline_platform_spark.functions.events import (
        q_events_load_profile,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    rows = q_events_load_profile(spark, sf).collect()
    assert sum(r["n_events"] for r in rows) == load_table(spark, sf, "events").count()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    assert all(0 <= r["dow"] <= 6 and 0 <= r["hour"] <= 23 for r in rows)


def test_term_drift_flags_planted_vocabulary_shift(spark):
    """Terms used equally in both halves sit near zero log-ratio; a
    term concentrated in one half shows a large |log-ratio|."""
    import tempfile

    from data_pipeline_platform_spark.functions.vocab import (
        DRIFT_MIN_COUNT,
        q_term_drift,
    )
    import hashlib

    common = " ".join(["stable"] * 30)
    rows = []
    for i in range(80):
        half = int(hashlib.md5(str(i).encode()).hexdigest()[0] < "8")
        # "newword" appears heavily in half 1 only, lightly in half 0
        # (it must clear MIN_COUNT in both halves to be reported)
        extra = " ".join(["newword"] * (12 if half else 1))
        rows.append((i, f"{common} {extra}", "en", "s", 1))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {r["term"]: r for r in q_term_drift(spark, d).collect()}
    assert out["newword"]["count_a"] >= DRIFT_MIN_COUNT
    # exact python replay of the share log-ratio
    import math

    ta = sum(r["count_a"] for r in out.values())
    tb = sum(r["count_b"] for r in out.values())
    for term, r in out.items():
        expect = round(
            math.log((r["count_a"] / ta) / (r["count_b"] / tb)) * 1e6
        )
        assert r["log_ratio_fp"] == expect, term
    # the planted shift dominates the share-normalization echo on
    # "stable" by an order of magnitude
    assert out["newword"]["log_ratio_fp"] > 1_000_000
    assert out["newword"]["log_ratio_fp"] > 3 * abs(out["stable"]["log_ratio_fp"])


def test_basket_dispersion_matches_statistics_replay(spark):
    """mean and VMR (population variance / mean) must match a python
    recompute of items-per-order."""
    from collections import Counter

    from data_pipeline_platform_spark.functions.basket import (
        q_basket_size_dispersion,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    r = q_basket_size_dispersion(spark, sf).collect()[0]
    ks = list(
        Counter(
            row["l_orderkey"]
            for row in load_table(spark, sf, "lineitem").select("l_orderkey").collect()
        ).values()
    )
    n = len(ks)
    mean = sum(ks) / n
    var = sum(k * k for k in ks) / n - mean * mean
    assert r["n_orders"] == n
    assert abs(r["mean_items"] - mean) < 1e-6
    assert abs(r["vmr"] - var / mean) < 1e-4


def test_price_realization_bounds_and_replay_one_brand(spark):
    """Realization shares are in (0, ~1.2]; below_list_share in [0,1];
    one brand's mean matches a python replay."""
    from data_pipeline_platform_spark.queries5 import q_price_realization
    from data_pipeline_platform_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    rows = q_price_realization(spark, sf).collect()
    assert rows
    for r in rows:
        # synthetic prices are independent of quantity x list, so the
        # ratio is only sanity-bounded, not ~1 as production data is
        assert 0.0 < r["mean_realization"] < 100.0
        assert 0.0 <= r["below_list_share"] <= 1.0
    brand = rows[0]["brand"]
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(f"p_brand = '{brand}'")
    pairs = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select("l_extendedprice", "l_discount", "l_quantity", "p_retailprice")
        .collect()
    )
    fps = [
        round(p["l_extendedprice"] * (1 - p["l_discount"])
              / (p["l_quantity"] * p["p_retailprice"]) * 1e6)
        for p in pairs
    ]
    assert rows[0]["n_lines"] == len(fps)
    assert rows[0]["mean_realization"] == round(sum(fps) / 1e6 / len(fps), 6)


def test_double_submit_detects_planted_duplicate(spark):
    import datetime
    import tempfile

    from data_pipeline_platform_spark.queries5 import q_double_submit_check

    t0 = datetime.datetime(2024, 1, 1, 10)
    rows = [
        (1, 7, "O", 100.50, t0, "1-URGENT"),
        (2, 7, "O", 100.50, t0 + datetime.timedelta(hours=2), "1-URGENT"),  # same day+total
        (3, 7, "O", 200.00, t0, "1-URGENT"),
        (4, 8, "O", 100.50, t0, "1-URGENT"),  # different customer
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/orders.parquet")
        out = q_double_submit_check(spark, d).collect()
    assert len(out) == 1
    assert out[0]["o_custkey"] == 7 and out[0]["n_orders"] == 2
    assert out[0]["total"] == 100.5


def test_conversion_lag_planted_funnel(spark):
    """Three viewers, two converters (1h and 3h lags), one pre-view
    purchaser (excluded): rate 2/3, mean 2h, median 2h."""
    import datetime
    import tempfile

    from data_pipeline_platform_spark.functions.events import (
        q_conversion_lag_stats,
    )

    t0 = datetime.datetime(2024, 1, 1, 12)

    def ev(eid, uid, etype, hours):
        return (eid, t0 + datetime.timedelta(hours=hours), uid, etype, 1.0, "{}")

    rows = [
        ev(1, 1, "view", 0), ev(2, 1, "purchase", 1),     # 1h lag
        ev(3, 2, "view", 0), ev(4, 2, "purchase", 3),     # 3h lag
        ev(5, 3, "view", 0),                              # never converts
        ev(6, 4, "purchase", 0), ev(7, 4, "view", 2),     # purchase BEFORE view
        ev(8, 4, "view", 5),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        r = q_conversion_lag_stats(spark, d).collect()[0]
    assert r["n_viewers"] == 4 and r["n_converted"] == 2
    assert r["conversion_rate"] == 0.5
    assert r["mean_lag_h"] == 2.0
    assert r["median_lag_h"] == 2.0


def test_hll_overlap_tracks_exact_intersections(spark):
    """Each pair's estimated intersection must land within the
    combined HLL error budget of the exact user-set intersection."""
    from data_pipeline_platform_spark.functions.sketches import (
        HLL_M,
        q_hll_audience_overlap,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    rows = q_hll_audience_overlap(spark, sf).collect()
    assert len(rows) == 10  # C(5,2) pairs
    ev = load_table(spark, sf, "events").select("event_type", "user_id").collect()
    sets = {}
    for r in ev:
        sets.setdefault(r["event_type"], set()).add(r["user_id"])
    # 1.04/sqrt(m) per sketch; three sketches feed the estimate
    tol = 3 * 1.04 / (HLL_M ** 0.5)
    for r in rows:
        exact = len(sets[r["type_a"]] & sets[r["type_b"]])
        denom = max(len(sets[r["type_a"]] | sets[r["type_b"]]), 1)
        assert abs(r["est_intersection"] - exact) / denom <= tol
        assert r["est_union"] <= r["est_a"] + r["est_b"] + 1e-6


def test_bpe_batched_equals_sequential_trainer(spark):
    """The batched trainer (prefix-stop top-M selection, one set-fold
    per round) must produce EXACTLY the sequential trainer's merge list
    — same pairs, same order, same selection-time counts — in fewer
    driver round-trips than merges (the r6 verdict's batched-BPE
    contract)."""
    from data_pipeline_platform_spark.functions.bpe import (
        train_merges,
        train_merges_batched,
    )
    from data_pipeline_platform_spark.functions.text import _docs

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        batched = train_merges_batched(_docs(spark, sf))
        n = len(batched)
        rounds = max(m[0] for m in batched)
        assert rounds < n, f"batching degenerated to sequential at {sf}"
        seq = train_merges(_docs(spark, sf), n_merges=n)
        assert [(m[1], m[2], m[3], m[4], m[5]) for m in batched] == [
            tuple(m) for m in seq
        ], f"batched != sequential at {sf}"


# --- compressed-container metadata extraction (r8) -------------------------

def test_jpeg_metadata_roundtrip():
    from data_pipeline_platform_spark.functions.multimodal import (
        _jpeg_metadata,
        make_jpeg_header_bytes,
    )

    for w, h, nc in [(640, 480, 3), (1, 1, 1), (65000, 2, 2)]:
        assert _jpeg_metadata(make_jpeg_header_bytes(w, h, nc)) == (w, h, nc)
    import pytest as _p

    with _p.raises(ValueError):
        _jpeg_metadata(b"\x89PNG\r\n\x1a\n")
    # SOS before any SOF must fail loudly, not return garbage
    with _p.raises(ValueError):
        _jpeg_metadata(b"\xff\xd8\xff\xda\x00\x02")


def test_mp3_metadata_census_and_id3_skip():
    from data_pipeline_platform_spark.functions.multimodal import (
        _mp3_metadata,
        make_mp3_bytes,
    )

    sr, kbps, nf, dur = _mp3_metadata(make_mp3_bytes(5, 128, 44100))
    assert (sr, kbps, nf) == (44100, 128, 5)
    assert dur == (5 * 1152 * 1000) // 44100
    # ID3v2 tag must be skipped, not counted as frames
    tagged = make_mp3_bytes(3, 192, 32000, id3_tag=True)
    assert _mp3_metadata(tagged)[:3] == (32000, 192, 3)
    import pytest as _p

    with _p.raises(ValueError):
        _mp3_metadata(b"RIFF....")


def test_mp4_metadata_box_walk():
    from data_pipeline_platform_spark.functions.multimodal import (
        _mp4_metadata,
        make_mp4_bytes,
    )

    dur_ms, n_tracks = _mp4_metadata(make_mp4_bytes(1800, n_tracks=2))
    assert dur_ms == (1800 * 1000) // 600 and n_tracks == 2
    import pytest as _p

    with _p.raises(ValueError):
        _mp4_metadata(b"\x00" * 32)


def test_extract_media_metadata_dispatch(spark):
    from data_pipeline_platform_spark.functions.multimodal import (
        extract_media_metadata,
        make_jpeg_header_bytes,
        make_mp3_bytes,
        make_mp4_bytes,
    )

    rows = [
        (0, bytearray(make_jpeg_header_bytes(320, 240, 3))),
        (1, bytearray(make_mp3_bytes(4, 64, 48000))),
        (2, bytearray(make_mp4_bytes(6000, n_tracks=1))),
        (3, bytearray(b"garbage-payload")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r.asDict() for r in extract_media_metadata(df).collect()}
    assert out[0]["container"] == "jpeg" and out[0]["width"] == 320
    assert out[1]["container"] == "mp3" and out[1]["n_frames"] == 4
    assert out[2]["container"] == "mp4" and out[2]["duration_ms"] == 10000
    assert out[3]["parsed"] is False and out[3]["container"] == "unknown"
    assert all(out[i]["parsed"] for i in (0, 1, 2))


def test_assign_sequential_ids_gap_free_and_boundary_stable(spark):
    """Gap-free 1..N in order, equal results for any partition count —
    the sampled range boundaries must not be observable."""
    from data_pipeline_platform_spark.functions.scale import (
        assign_sequential_ids,
    )

    df = spark.range(1, 501).select(
        (F.col("id") * 7919 % 500).alias("k"), F.col("id").alias("u")
    )
    out = {}
    for n in (2, 8):
        got = assign_sequential_ids(
            df, ["k", "u"], num_partitions=n
        ).collect()
        ids = sorted(r["seq_id"] for r in got)
        assert ids == list(range(1, 501))  # gap-free, exactly once
        out[n] = {(r["k"], r["u"]): r["seq_id"] for r in got}
    assert out[2] == out[8]  # boundary-independent
    # order respected: id order == (k, u) order
    by_id = sorted(out[8].items(), key=lambda kv: kv[1])
    assert [kv[0] for kv in by_id] == sorted(out[8])


def test_jpeg_decode_end_to_end_and_png_parity(spark):
    """Real baseline-JPEG payload -> real pixel decode through
    extract_image_features (no stub), and on identical pixel content
    the JPEG path's features match the PNG path's: same mean, same
    8x8 block-mean embedding (constant tiles round-trip exactly at
    qscale=1, so the parity is exact, not approximate)."""
    import struct
    import zlib

    import numpy as np

    from data_pipeline_platform_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
        make_baseline_jpeg_bytes,
    )

    px = np.zeros((16, 16), dtype=np.uint8)
    px[:8, :8], px[:8, 8:], px[8:, :8], px[8:, 8:] = 17, 200, 99, 255

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d))

    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(16))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 16, 16, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    jpg = make_baseline_jpeg_bytes(px)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), "image/png", 16, 16, None),
         (2, "image", bytearray(jpg), "image/jpeg", 16, 16, None)],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in
            extract_image_features(media).collect()}
    assert abs(rows[2]["mean_pixel" if "mean_pixel" in rows[2].asDict()
               else "mean_byte"] - float(px.mean())) < 1e-4
    assert np.allclose(np.array(rows[1]["embedding"]),
                       np.array(rows[2]["embedding"]), atol=1e-6)


def test_jpeg_codec_roundtrip_bounds():
    """Gradient and random images round-trip within +-1 grey level at
    qscale=1 (DCT rounding only); constant tiles are bit-exact; odd
    (non-multiple-of-8) sizes crop correctly."""
    import numpy as np

    from data_pipeline_platform_spark.functions.multimodal import (
        _decode_jpeg,
        make_baseline_jpeg_bytes,
    )

    const = np.full((8, 8), 137, dtype=np.uint8)
    assert np.array_equal(
        _decode_jpeg(make_baseline_jpeg_bytes(const)), const.astype(np.float32))
    g = (np.add.outer(np.arange(24) * 7, np.arange(40) * 3) % 256).astype(
        np.uint8)
    d = _decode_jpeg(make_baseline_jpeg_bytes(g))
    assert d.shape == (24, 40) and float(np.max(np.abs(d - g))) <= 1.0
    rng = np.random.RandomState(11)
    h = rng.randint(0, 256, (13, 21)).astype(np.uint8)
    d2 = _decode_jpeg(make_baseline_jpeg_bytes(h))
    assert d2.shape == (13, 21) and float(np.max(np.abs(d2 - h))) <= 1.0
    # progressive/unsupported streams refuse instead of mis-decoding
    import pytest as _pt

    bad = bytearray(make_baseline_jpeg_bytes(const))
    bad[bad.index(b"\xff\xc0")] = 0xFF  # keep marker prefix
    bad[bad.index(b"\xff\xc0") + 1] = 0xC2  # SOF0 -> SOF2
    with _pt.raises(ValueError):
        _decode_jpeg(bytes(bad))


def test_jpeg_color_420_and_restart_intervals():
    """Color 4:2:0 JPEG (interleaved 16x16 MCUs, the camera/web
    layout) decodes through the generic-sampling path to the true luma
    plane; restart markers (DRI + FFD0-7, predictor resets) do not
    perturb the pixels."""
    import numpy as np

    from data_pipeline_platform_spark.functions.multimodal import (
        _decode_jpeg,
        _jpeg_metadata,
        make_baseline_jpeg_color_bytes,
    )

    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    base = None
    for ri in (0, 1, 3):
        jp = make_baseline_jpeg_color_bytes(rgb, restart_interval=ri)
        assert _jpeg_metadata(jp) == (40, 24, 3)
        dec = _decode_jpeg(jp)
        assert dec.shape == (24, 40)
        assert float(np.max(np.abs(dec - y))) <= 1.5  # qscale-1 bound
        if base is None:
            base = dec
        else:  # restarts change framing only, never pixel values
            assert np.array_equal(dec, base)


def test_redact_pii_order_and_counts(spark):
    """Redaction order prevents double counting: an IPv4 is never also
    counted as digit runs, a phone never as a digit run, and tags are
    opaque to later patterns. Untouched text passes through."""
    from data_pipeline_platform_spark.functions.redact import redact_pii

    rows = [
        (1, "mail a.b+c@x-y.co and ip 192.168.0.1 tel 555-123-4567 "
            "acct 123456789 short 12345678"),
        (2, "clean text with no pii at all"),
        (3, "two mails a@b.io c@d.net same ip 10.0.0.1 10.0.0.1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    r1 = out[1]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_phone"], r1["n_digit_run"]) == (
        1, 1, 1, 1)  # 12345678 is 8 digits: below the 9+ run threshold
    assert "[EMAIL]" in r1["redacted"] and "[IP]" in r1["redacted"]
    assert "[PHONE]" in r1["redacted"] and "[NUM]" in r1["redacted"]
    assert "192.168" not in r1["redacted"] and "@" not in r1["redacted"]
    assert "12345678" in r1["redacted"]  # under-threshold run kept
    r2 = out[2]
    assert r2["redacted"] == rows[1][1]
    assert (r2["n_email"], r2["n_ipv4"], r2["n_phone"], r2["n_digit_run"]) == (
        0, 0, 0, 0)
    r3 = out[3]
    assert (r3["n_email"], r3["n_ipv4"]) == (2, 2)


def test_ulaw_codec_matches_audioop_exactly():
    """Pure-numpy G.711 mu-law == the stdlib audioop reference on all
    256 byte values (decode) and all 65536 sample values (encode)."""
    import numpy as np
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from data_pipeline_platform_spark.functions.multimodal import (
        ulaw_decode,
        ulaw_encode,
    )

    all_bytes = bytes(range(256))
    ref = np.frombuffer(audioop.ulaw2lin(all_bytes, 2), dtype="<i2")
    assert np.array_equal(ulaw_decode(all_bytes), ref)
    samples = np.arange(-32768, 32768, dtype=np.int16)
    ref_enc = audioop.lin2ulaw(samples.astype("<i2").tobytes(), 2)
    assert ulaw_encode(samples) == ref_enc


def test_ima_adpcm_roundtrip_and_wav_container(spark):
    """IMA ADPCM: encode->decode tracks the original within the step
    quantization error; the non-PCM WAV container (fmt 0x11 + fact)
    parses through decode_wav_any; mu-law WAVs (fmt 7) decode through
    the same entry point; stdlib-refused formats raise."""
    import numpy as np

    from data_pipeline_platform_spark.functions.multimodal import (
        decode_wav_any,
        ima_adpcm_decode,
        ima_adpcm_encode,
        make_compressed_wav_bytes,
        ulaw_encode,
    )

    t = np.arange(2000)
    sig = (8000 * np.sin(t / 20.0)).astype(np.int16)
    payload, block_align = ima_adpcm_encode(sig)
    dec = ima_adpcm_decode(payload, block_align)
    assert len(dec) >= len(sig)
    err = np.abs(dec[: len(sig)].astype(np.int64) - sig.astype(np.int64))
    # ADPCM is lossy; tracking error stays well under the signal swing
    assert float(np.mean(err)) < 200 and int(err.max()) < 4000
    wav = make_compressed_wav_bytes(
        payload, 0x0011, 8000, len(sig), 4, block_align
    )
    sr, nch, samples = decode_wav_any(wav)
    assert sr == 8000 and len(samples) >= len(sig)
    # mu-law through the same dispatcher
    uw = make_compressed_wav_bytes(ulaw_encode(sig), 0x0007, 8000, len(sig), 8, 1)
    sr2, _, s2 = decode_wav_any(uw)
    ints = np.rint(np.asarray(s2) * 32768.0).astype(np.int64)
    err2 = np.abs(ints - sig.astype(np.int64))
    assert sr2 == 8000 and int(err2.max()) < 1024  # segment-bounded
    import pytest as _pt

    bad = make_compressed_wav_bytes(b"\x00" * 10, 0x0050, 8000, 10, 8, 1)
    with _pt.raises(ValueError):
        decode_wav_any(bad)


def test_bloom_decontamination_prunes_and_loses_nothing(spark):
    """The Bloom pre-filter must actually PRUNE (candidate n-grams a
    small fraction of the corpus n-grams on this data) and must lose
    nothing: flagged docs and shared-n-gram counts equal the exact
    unfiltered check's."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.functions.corpus import (
        CONTAM_NGRAM,
        contamination_check,
        with_ngrams,
    )
    from data_pipeline_platform_spark.functions.scale import (
        bloom_prune,
        build_bloom,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    evalset = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    eg = with_ngrams(evalset, CONTAM_NGRAM, "ng").select("ng").distinct()
    tg = with_ngrams(train, CONTAM_NGRAM, "ng").select("doc_id", "ng").distinct()
    survivors = bloom_prune(tg, "ng", build_bloom(eg, "ng"))
    n_all, n_surv = tg.count(), survivors.count()
    assert n_surv < 0.25 * n_all, (n_surv, n_all)  # real pruning
    got = {r["doc_id"]: r["n_shared_ngrams"] for r in
           survivors.join(eg, "ng").groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_shared_ngrams")).collect()}
    want = {r["doc_id"]: r["n_shared_ngrams"] for r in
            contamination_check(train, evalset).collect()}
    assert got == want  # zero false negatives, FPs removed by the join


def test_redact_pii_extended_luhn_gate(spark):
    """The credit-card scrub is checksum-gated, not regex-gated: a
    Luhn-valid PAN is redacted in both plain and hyphenated form, a
    Luhn-invalid 16-digit candidate survives verbatim (hyphenated) or
    falls through to the digit-run scrubber (contiguous), and MAC /
    IBAN get their own tags."""
    from data_pipeline_platform_spark.functions.redact import (
        redact_pii_extended,
    )

    rows = [
        (1, "card 4111111111111111 alt 4111-1111-1111-1111 "
            "bad 0000-0000-0000-0001 badrun 1234567890123456"),
        (2, "mac 0a:1B:2c:3D:4e:5f iban DE44500105175407324931 ok"),
        (3, "mail a@b.io ip 10.0.0.1 tel 555-123-4567 acct 987654321"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii_extended(df).collect()}
    r1 = out[1]
    assert r1["n_credit_card"] == 2  # plain + hyphenated valid forms
    assert r1["redacted"].count("[CC]") == 2
    # invalid hyphenated candidate survives untouched; invalid
    # contiguous candidate is still scrubbed — but as a digit run
    assert "0000-0000-0000-0001" in r1["redacted"]
    assert "1234567890123456" not in r1["redacted"]
    assert r1["n_digit_run"] == 1
    assert "4111" not in r1["redacted"]
    r2 = out[2]
    assert (r2["n_mac"], r2["n_iban"]) == (1, 1)
    assert "[MAC]" in r2["redacted"] and "[IBAN]" in r2["redacted"]
    assert "0a:1B" not in r2["redacted"] and "DE44" not in r2["redacted"]
    r3 = out[3]
    assert (r3["n_email"], r3["n_ipv4"], r3["n_phone"], r3["n_digit_run"],
            r3["n_credit_card"]) == (1, 1, 1, 1, 0)


def test_redact_pii_extended_cc_rewrite_is_position_anchored(spark):
    """r12 advisor: the CC rewrite must tag only \\b-delimited
    occurrences — the same PAN embedded inside a longer digit run is
    NOT a nominated candidate and falls to the digit-run scrubber, and
    the number of [CC] tags always equals n_credit_card."""
    from data_pipeline_platform_spark.functions.redact import (
        redact_pii_extended,
    )

    rows = [
        # standalone valid PAN + same PAN embedded in a 20-digit run
        (1, "card 4111111111111111 run 99994111111111111111 end"),
        # PAN appears twice standalone: two tags, count 2
        (2, "a 4111111111111111 b 4111111111111111"),
        # embedded only, never standalone: zero CC, one digit run
        (3, "run 99994111111111111111 only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii_extended(df).collect()}
    r1 = out[1]
    assert r1["n_credit_card"] == 1
    assert r1["redacted"].count("[CC]") == 1
    assert "[NUM]" in r1["redacted"]  # the 20-digit run, scrubbed as a run
    assert "4111" not in r1["redacted"]
    r2 = out[2]
    assert r2["n_credit_card"] == 2
    assert r2["redacted"].count("[CC]") == 2
    r3 = out[3]
    assert r3["n_credit_card"] == 0
    assert "[CC]" not in r3["redacted"]
    assert r3["n_digit_run"] == 1 and "[NUM]" in r3["redacted"]
