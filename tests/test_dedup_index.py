"""IncrementalLshIndex (functions/dedup_index.py): batched ingestion
equals one-shot LSH, replays are no-ops, and a crash between the pairs
commit and the index commit heals on replay."""

from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions.dedup import (
    q_dedup_minhash_lsh,
)
from data_pipeline_platform_spark.functions.dedup_index import (
    IncrementalLshIndex,
    _last_batch,
)
from data_pipeline_platform_spark.utils.cache import release_tracked

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from data_pipeline_platform_spark.sources.readers import load_table

    return load_table(spark, SF, "documents").select("doc_id", "text")


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in df.collect()}


def _index(spark, tmp_path, tag=""):
    return IncrementalLshIndex(
        spark, str(tmp_path / f"idx{tag}"), str(tmp_path / f"prs{tag}")
    )


def test_batched_ingestion_equals_one_shot(spark, tmp_path):
    docs = _docs(spark)
    idx = _index(spark, tmp_path)
    for b in range(3):
        idx.add_batch(docs.filter(F.col("doc_id") % 3 == b), batch_id=b)
    got = _pairs(idx.all_pairs())
    want = _pairs(q_dedup_minhash_lsh(spark, SF))
    release_tracked()
    assert got == want
    assert len(got) > 0  # the fixture plants near-dups


def test_replayed_batch_is_noop(spark, tmp_path):
    docs = _docs(spark)
    idx = _index(spark, tmp_path, "r")
    idx.add_batch(docs.filter(F.col("doc_id") % 3 == 0), batch_id=0)
    idx.add_batch(docs.filter(F.col("doc_id") % 3 == 1), batch_id=1)
    pv, iv = idx.pairs.latest_version(), idx.index.latest_version()
    before = _pairs(idx.all_pairs())
    stats = idx.add_batch(docs.filter(F.col("doc_id") % 3 == 1), batch_id=1)
    assert stats["new_pairs"] == 0
    assert (idx.pairs.latest_version(), idx.index.latest_version()) == (pv, iv)
    assert _pairs(idx.all_pairs()) == before


def test_crash_between_pairs_and_index_commits_heals(spark, tmp_path):
    docs = _docs(spark)
    idx = _index(spark, tmp_path, "c")
    idx.add_batch(docs.filter(F.col("doc_id") % 3 == 0), batch_id=0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)

    # simulate: pairs commit published, crash before the index commit
    orig_write = idx.index.write
    idx.index.write = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash")
    )
    try:
        idx.add_batch(b1, batch_id=1)
    except RuntimeError:
        pass
    assert _last_batch(idx.pairs) == 1
    assert _last_batch(idx.index) == 0  # index missed the batch
    idx.index.write = orig_write

    # replay: pairs append skips, index append completes
    pv = idx.pairs.latest_version()
    idx.add_batch(b1, batch_id=1)
    assert idx.pairs.latest_version() == pv  # no duplicate pairs commit
    assert _last_batch(idx.index) == 1

    # and the final state still equals one-shot over batches 0+1
    idx.add_batch(docs.filter(F.col("doc_id") % 3 == 2), batch_id=2)
    got = _pairs(idx.all_pairs())
    want = _pairs(q_dedup_minhash_lsh(spark, SF))
    release_tracked()
    assert got == want


def test_embedding_batched_equals_one_shot(spark, tmp_path):
    from pyspark.sql import functions as F2

    from data_pipeline_platform_spark.functions.dedup_index import (
        IncrementalEmbeddingIndex,
    )
    from data_pipeline_platform_spark.functions.similarity import (
        _as_double,
        _emb,
        q_embedding_near_dup,
    )

    base = _emb(spark, SF).select("vec_id", _as_double("embedding").alias("vec"))
    idx = IncrementalEmbeddingIndex(
        spark, str(tmp_path / "eidx"), str(tmp_path / "eprs")
    )
    for b in range(3):
        idx.add_batch(base.filter(F2.col("vec_id") % 3 == b), batch_id=b)
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in idx.all_pairs().collect()}
    want = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in q_embedding_near_dup(spark, SF).collect()
    }
    release_tracked()
    assert got == want and len(got) > 0
    # replay no-op
    pv = idx.pairs.latest_version()
    assert idx.add_batch(base.filter(F2.col("vec_id") % 3 == 2), 2)["new_pairs"] == 0
    assert idx.pairs.latest_version() == pv


def test_lsh_erase_removes_signatures_and_pairs(spark, tmp_path):
    """Right-to-be-forgotten: after erase(ids), the index holds no row
    for the ids, no accumulated pair names them, and re-ingesting a doc
    rediscovers pairs against the REMAINING corpus only."""
    from data_pipeline_platform_spark.functions.dedup_index import (
        IncrementalLshIndex,
    )

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),
        (4, "completely different text about spark incremental indexes"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = IncrementalLshIndex(
        spark, str(tmp_path / "i"), str(tmp_path / "p")
    )
    idx.add_batch(df, batch_id=0)
    pairs0 = {(r["doc_a"], r["doc_b"]) for r in idx.all_pairs().collect()}
    assert pairs0 == {(1, 2), (1, 3), (2, 3)}

    out = idx.erase([2])
    assert out["rows_erased"] == 1 and out["pairs_erased"] == 2
    assert {r["doc_id"] for r in idx.index.read().collect()} == {1, 3, 4}
    pairs1 = {(r["doc_a"], r["doc_b"]) for r in idx.all_pairs().collect()}
    assert pairs1 == {(1, 3)}

    # re-ingest a near-dup of the survivors: discovers pairs vs the
    # remaining corpus, never vs the erased doc
    idx.add_batch(
        spark.createDataFrame(
            [(9, docs[0][1])], "doc_id long, text string"
        ),
        batch_id=1,
    )
    pairs2 = {(r["doc_a"], r["doc_b"]) for r in idx.all_pairs().collect()}
    assert pairs2 == {(1, 3), (1, 9), (3, 9)}


def test_embedding_erase_and_ann_erase(spark, tmp_path):
    from data_pipeline_platform_spark.functions.dedup_index import (
        IncrementalAnnIndex,
        IncrementalEmbeddingIndex,
    )

    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.001, 0.0]),
        (3, [0.999, 0.002, 0.0]),
        (4, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, vec array<double>")
    idx = IncrementalEmbeddingIndex(
        spark, str(tmp_path / "ei"), str(tmp_path / "ep")
    )
    idx.add_batch(df, batch_id=0)
    assert {(r["id_a"], r["id_b"]) for r in idx.all_pairs().collect()} == {
        (1, 2), (1, 3), (2, 3)
    }
    out = idx.erase([1])
    assert out["rows_erased"] == 1 and out["pairs_erased"] == 2
    assert {(r["id_a"], r["id_b"]) for r in idx.all_pairs().collect()} == {
        (2, 3)
    }
    assert {r["vec_id"] for r in idx.index.read().collect()} == {2, 3, 4}

    ann = IncrementalAnnIndex(
        spark, str(tmp_path / "ac"), str(tmp_path / "ai")
    )
    lab = df.withColumn("label", F.lit("x"))
    ann.train(lab, batch_id=0)
    out = ann.erase([2])
    assert out["rows_erased"] == 1
    assert {r["vec_id"] for r in ann.ivf.read().collect()} == {1, 3, 4}
    got = [r["vec_id"] for r in ann.search_by_id(1).collect()]
    assert 2 not in got and 3 in got


def test_ann_ivfpq_incremental_replay_and_erase(spark, tmp_path):
    """PQ-backed persisted index: codes ride the inverted-file rows, a
    redelivered batch skips (marker), and erase() removes the vector
    from ADC candidacy along with its codes."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.functions.dedup_index import (
        IncrementalAnnIndex,
    )
    from data_pipeline_platform_spark.functions.similarity import (
        _as_double,
        _emb,
    )
    from tests.conftest import SF_DIR

    emb = _emb(spark, SF_DIR).select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    idx = IncrementalAnnIndex(
        spark,
        str(tmp_path / "cent"),
        str(tmp_path / "ivf"),
        pq_path=str(tmp_path / "pq"),
    )
    idx.train(emb.filter(F.col("vec_id") % 3 == 1), batch_id=0)
    idx.add_batch(emb.filter(F.col("vec_id") % 3 == 2), batch_id=1)
    idx.add_batch(emb.filter(F.col("vec_id") % 3 == 0), batch_id=2)
    n = idx.ivf.read().count()
    idx.add_batch(emb.filter(F.col("vec_id") % 3 == 2), batch_id=1)  # replay
    assert idx.ivf.read().count() == n
    # every indexed row carries exactly M codes in the sub-code domain
    from data_pipeline_platform_spark.functions.pq import PQ_KS, PQ_M

    bad = idx.ivf.read().filter(
        (F.size("codes") != PQ_M)
        | F.exists("codes", lambda c: (c < 1) | (c > PQ_KS))
    ).count()
    assert bad == 0
    top = idx.search_adc(0).collect()
    assert len(top) == 10
    victim = top[0]["vec_id"]
    idx.erase([victim])
    after = {r["vec_id"] for r in idx.search_adc(0).collect()}
    assert victim not in after


def test_ann_refresh_encodes_only_the_delta(spark, tmp_path):
    """refresh(): a snapshot superset indexes only un-coded vectors; a
    second refresh of the same snapshot adds nothing and commits
    NOTHING (encode-once — stored code rows are never rewritten)."""
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.functions.dedup_index import (
        IncrementalAnnIndex,
    )
    from data_pipeline_platform_spark.functions.similarity import (
        _as_double,
        _emb,
    )
    from tests.conftest import SF_DIR

    emb = _emb(spark, SF_DIR).select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    total = emb.count()
    third = emb.filter(F.col("vec_id") % 3 == 1)
    idx = IncrementalAnnIndex(
        spark, str(tmp_path / "c"), str(tmp_path / "i"),
        pq_path=str(tmp_path / "p"),
    )
    idx.train(third, batch_id=0)
    n0 = idx.ivf.read().count()
    out1 = idx.refresh(emb, batch_id=1)
    assert out1["added"] == total - n0
    assert idx.ivf.read().count() == total
    v = idx.ivf.latest_version()
    # same snapshot again: nothing new -> no commit, no code rewrite
    out2 = idx.refresh(emb, batch_id=2)
    assert out2["added"] == 0
    assert idx.ivf.latest_version() == v
    # replayed batch id short-circuits before even the anti-join
    assert idx.refresh(emb, batch_id=1) == {"added": 0, "replay": 1}
    # vec_ids stay unique — the anti-join never re-appends a coded row
    assert idx.ivf.read().select("vec_id").distinct().count() == total


def test_bands_republish_is_idempotent(spark, tmp_path):
    """Crash between the bands publish and the index marker write must
    not duplicate the batch's band rows on replay: the bands table is
    EXTERNAL, so a catalog-only DROP PARTITION leaves the old parquet
    files readable — _publish_bands must physically overwrite the
    partition (advisor r11, dedup_index.py)."""
    docs = _docs(spark)
    idx = IncrementalLshIndex(
        spark,
        str(tmp_path / "bidx"),
        str(tmp_path / "bprs"),
        bands_table="lsh_bands_replay_gate",
        bands_path=str(tmp_path / "bands"),
    )
    try:
        idx.add_batch(docs.filter(F.col("doc_id") % 3 == 0), batch_id=0)
        b1 = docs.filter(F.col("doc_id") % 3 == 1)

        # crash AFTER the bands publish, BEFORE the index marker commit
        orig_write = idx.index.write
        idx.index.write = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("simulated crash")
        )
        try:
            idx.add_batch(b1, batch_id=1)
        except RuntimeError:
            pass
        idx.index.write = orig_write
        per_batch_crash = {
            r["batch_id"]: r["n"]
            for r in spark.table(idx.bands_table)
            .groupBy("batch_id").agg(F.count("*").alias("n")).collect()
        }
        assert 1 in per_batch_crash  # bands made it out before the crash

        # replay republishes batch 1's partition: counts UNCHANGED
        idx.add_batch(b1, batch_id=1)
        per_batch = {
            r["batch_id"]: r["n"]
            for r in spark.table(idx.bands_table)
            .groupBy("batch_id").agg(F.count("*").alias("n")).collect()
        }
        assert per_batch == per_batch_crash  # no doubled partition
        # band rows are unique per (doc, band) — duplicates would break this
        total = spark.table(idx.bands_table).count()
        distinct = (
            spark.table(idx.bands_table)
            .select("doc_id", "band").distinct().count()
        )
        assert total == distinct

        # end state still equals the one-shot oracle
        idx.add_batch(docs.filter(F.col("doc_id") % 3 == 2), batch_id=2)
        got = _pairs(idx.all_pairs())
        want = _pairs(q_dedup_minhash_lsh(spark, SF))
        release_tracked()
        assert got == want
    finally:
        idx.drop_bands_table()


def test_bands_compaction_preserves_answers_and_bounds_files(
    spark, tmp_path
):
    """compact_bands folds the per-batch partitions into one negative-id
    base: candidate joins keep producing the one-shot pair set, the
    file count drops to <= num_buckets for history, and the next
    ingest keeps working against the compacted layout."""
    import os

    docs = _docs(spark)
    idx = IncrementalLshIndex(
        spark,
        str(tmp_path / "cidx"),
        str(tmp_path / "cprs"),
        bands_table="lsh_bands_compact_gate",
        bands_path=str(tmp_path / "cbands"),
    )
    try:
        for b in range(2):
            idx.add_batch(docs.filter(F.col("doc_id") % 3 == b), batch_id=b)
        stats = idx.compact_bands()
        assert stats["swept_partitions"] == 2
        base = stats["base_batch_id"]
        assert base < 0
        # only the base partition remains; its file count is bucketed
        assert idx._bands.partition_ids() == [base]
        part = os.path.join(str(tmp_path / "cbands"), f"batch_id={base}")
        files = [f for f in os.listdir(part) if f.endswith(".parquet")]
        assert 0 < len(files) <= idx.num_buckets
        # band rows survived the fold exactly (16 bands per doc)
        n_docs = idx.index.read().count()
        assert spark.table(idx.bands_table).count() == 16 * n_docs

        # ingest continues against the compacted base
        idx.add_batch(docs.filter(F.col("doc_id") % 3 == 2), batch_id=2)
        got = _pairs(idx.all_pairs())
        want = _pairs(q_dedup_minhash_lsh(spark, SF))
        release_tracked()
        assert got == want
    finally:
        idx.drop_bands_table()


def test_bands_compaction_crash_leaves_superset_then_heals(spark, tmp_path):
    """A crash between the base publish and the partition sweep leaves
    DUPLICATE band rows (never missing ones): candidates stay correct,
    and the next compact() sweeps the leftovers."""
    docs = _docs(spark)
    idx = IncrementalLshIndex(
        spark,
        str(tmp_path / "xidx"),
        str(tmp_path / "xprs"),
        bands_table="lsh_bands_crash_compact",
        bands_path=str(tmp_path / "xbands"),
    )
    try:
        for b in range(2):
            idx.add_batch(docs.filter(F.col("doc_id") % 3 == b), batch_id=b)
        n_docs = idx.index.read().count()

        # simulate: base published, crash before any partition drop
        through = 1
        from data_pipeline_platform_spark.functions.dedup import (
            bands_from_signatures,
        )

        rows = bands_from_signatures(idx.index.read().select("doc_id", "sig"))
        idx._bands.publish(rows, -1)  # what compact() does first
        # superset now: originals + full consolidated copy
        assert spark.table(idx.bands_table).count() == 2 * 16 * n_docs
        assert sorted(idx._bands.partition_ids()) == [-1, 0, 1]

        # duplicates do not corrupt the next ingest's answers
        idx.add_batch(docs.filter(F.col("doc_id") % 3 == 2), batch_id=2)
        got = _pairs(idx.all_pairs())
        want = _pairs(q_dedup_minhash_lsh(spark, SF))
        release_tracked()
        assert got == want

        # re-run compaction: leftovers (old batches AND the stale base)
        # are swept into a fresh base covering batch 2 as well
        stats = idx.compact_bands()
        assert stats["base_batch_id"] == -2
        assert idx._bands.partition_ids() == [-2]
        n_docs3 = idx.index.read().count()
        assert spark.table(idx.bands_table).count() == 16 * n_docs3
    finally:
        idx.drop_bands_table()


def test_embedding_bands_compaction(spark, tmp_path):
    """Embedding twin: compact, then ingest, answers still equal the
    non-bucketed path and the stored side stays bucket-aligned (no
    Exchange over the compacted base)."""
    from pyspark.sql import functions as F2

    from data_pipeline_platform_spark.functions.dedup_index import (
        IncrementalEmbeddingIndex,
    )
    from data_pipeline_platform_spark.functions.similarity import (
        _as_double,
        _emb,
        explode_band_array,
        hyperplane_band_array,
    )

    base = _emb(spark, SF).select(
        "vec_id", _as_double("embedding").alias("vec")
    )
    idx = IncrementalEmbeddingIndex(
        spark, str(tmp_path / "ei"), str(tmp_path / "ep"),
        bands_table="emb_bands_compact_gate",
        bands_path=str(tmp_path / "eb"),
    )
    ref = IncrementalEmbeddingIndex(
        spark, str(tmp_path / "ri"), str(tmp_path / "rp")
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for b in range(2):
            batch = base.filter(F2.col("vec_id") % 3 == b)
            idx.add_batch(batch, batch_id=b)
            ref.add_batch(batch, batch_id=b)
        stats = idx.compact_bands()
        assert stats["swept_partitions"] == 2
        assert idx._bands.partition_ids() == [stats["base_batch_id"]]
        # the compacted base still joins bucket-aligned
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        new_bands = explode_band_array(
            hyperplane_band_array(
                base.filter(F2.col("vec_id") % 3 == 2).select("vec_id", "vec")
            )
        )
        old_bands = idx._bands.before(2).select(
            F2.col("vec_id").alias("old_id"), "band_idx", "band_val"
        )
        plan = (
            new_bands.join(old_bands, ["band_idx", "band_val"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Bucketed: true" in plan
        assert plan.count("Exchange hashpartitioning") == 1
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

        last = base.filter(F2.col("vec_id") % 3 == 2)
        idx.add_batch(last, batch_id=2)
        ref.add_batch(last, batch_id=2)
        got = sorted(
            (r["id_a"], r["id_b"], r["cosine"])
            for r in idx.all_pairs().collect()
        )
        want = sorted(
            (r["id_a"], r["id_b"], r["cosine"])
            for r in ref.all_pairs().collect()
        )
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        idx.drop_bands_table()


def test_auto_compaction_policy_bounds_files_over_many_batches(
    spark, tmp_path
):
    """auto_compact_every=N triggers compact_bands from add_batch itself
    (r12 verdict #4: the op existed but nothing called it). Over 10
    batches the live batch-partition count never reaches N+1, exactly
    one base partition is live at every step, total parquet file count
    stays <= (N + 1) x num_buckets, and the final pair set is bitwise
    the non-compacting index's."""
    import os

    docs = _docs(spark)
    every = 3
    idx = IncrementalLshIndex(
        spark,
        str(tmp_path / "aidx"),
        str(tmp_path / "aprs"),
        bands_table="lsh_bands_auto_compact",
        bands_path=str(tmp_path / "abands"),
        auto_compact_every=every,
    )
    ref = IncrementalLshIndex(
        spark, str(tmp_path / "ridx"), str(tmp_path / "rprs")
    )
    bands_root = str(tmp_path / "abands")

    def _n_files():
        total = 0
        for dirpath, _dirs, files in os.walk(bands_root):
            total += sum(1 for f in files if f.endswith(".parquet"))
        return total

    try:
        n_compactions = 0
        for b in range(10):
            batch = docs.filter(F.col("doc_id") % 10 == b)
            stats = idx.add_batch(batch, batch_id=b)
            ref.add_batch(batch, batch_id=b)
            if "compacted" in stats:
                n_compactions += 1
            live = idx._bands.partition_ids()
            n_batches = sum(1 for p in live if p >= 0)
            n_bases = sum(1 for p in live if p < 0)
            # the policy fires AT the threshold, so the count resets
            # to zero whenever it touches `every`
            assert n_batches < every + 1
            assert n_bases <= 1
            assert _n_files() <= (every + 1) * idx.num_buckets
        assert n_compactions == 3  # fired at batches 2, 5, 8
        # end state: answers bitwise vs the never-compacted twin
        got = _pairs(idx.all_pairs())
        want = _pairs(ref.all_pairs())
        release_tracked()
        assert got == want and len(got) > 0
    finally:
        idx.drop_bands_table()


def test_auto_compaction_sweeps_crashed_base_on_next_ingest(
    spark, tmp_path
):
    """A crashed compact() leaves a second base partition; with the
    policy on, the NEXT add_batch detects >1 live bases and re-runs the
    fold without operator intervention."""
    from data_pipeline_platform_spark.functions.dedup import (
        bands_from_signatures,
    )

    docs = _docs(spark)
    idx = IncrementalLshIndex(
        spark,
        str(tmp_path / "hidx"),
        str(tmp_path / "hprs"),
        bands_table="lsh_bands_auto_heal",
        bands_path=str(tmp_path / "hbands"),
        auto_compact_every=100,  # count trigger never fires here
    )
    try:
        for b in range(2):
            idx.add_batch(docs.filter(F.col("doc_id") % 3 == b), batch_id=b)
        idx.compact_bands()  # base -1, sweeps batches 0-1
        # simulate a crashed second compact: base published, no sweep
        rows = bands_from_signatures(idx.index.read().select("doc_id", "sig"))
        idx._bands.publish(rows, -2)
        assert sorted(idx._bands.partition_ids()) == [-2, -1]

        stats = idx.add_batch(
            docs.filter(F.col("doc_id") % 3 == 2), batch_id=2
        )
        assert "compacted" in stats  # healed by the >1-bases trigger
        assert len(idx._bands.partition_ids()) == 1
        got = _pairs(idx.all_pairs())
        want = _pairs(q_dedup_minhash_lsh(spark, SF))
        release_tracked()
        assert got == want
    finally:
        idx.drop_bands_table()


def test_embedding_auto_compaction_trigger(spark, tmp_path):
    """The embedding index shares _auto_compact_due: with every=2 the
    fold fires on the second batch and ingest continues bitwise."""
    from pyspark.sql import functions as F2

    from data_pipeline_platform_spark.functions.dedup_index import (
        IncrementalEmbeddingIndex,
    )
    from data_pipeline_platform_spark.functions.similarity import (
        _as_double,
        _emb,
    )

    base = _emb(spark, SF).select(
        "vec_id", _as_double("embedding").alias("vec")
    )
    idx = IncrementalEmbeddingIndex(
        spark, str(tmp_path / "aei"), str(tmp_path / "aep"),
        bands_table="emb_bands_auto_compact",
        bands_path=str(tmp_path / "aeb"),
        auto_compact_every=2,
    )
    ref = IncrementalEmbeddingIndex(
        spark, str(tmp_path / "rei"), str(tmp_path / "rep")
    )
    try:
        fired = []
        for b in range(3):
            batch = base.filter(F2.col("vec_id") % 3 == b)
            stats = idx.add_batch(batch, batch_id=b)
            ref.add_batch(batch, batch_id=b)
            fired.append("compacted" in stats)
        assert fired == [False, True, False]
        assert sum(1 for p in idx._bands.partition_ids() if p < 0) == 1
        got = sorted(
            (r["id_a"], r["id_b"], r["cosine"])
            for r in idx.all_pairs().collect()
        )
        want = sorted(
            (r["id_a"], r["id_b"], r["cosine"])
            for r in ref.all_pairs().collect()
        )
        assert got == want and len(got) > 0
    finally:
        idx.drop_bands_table()
