"""Incremental MinHash-LSH dedup against a persisted index
(extension; no reference counterpart — the reference has no dedup ops,
see SURVEY.md §2.11).

``dedup_minhash_lsh`` re-shingles the whole corpus per run; at 100 TB
with daily ingestion the platform-grade pattern is an ACID-backed
signature INDEX folded forward per batch: each new batch is shingled
and signed ONCE, banded candidates come from (a) the in-batch bucket
groupBy and (b) one (band, sig) EQUI-JOIN of the batch's bands against
the stored index — never a re-shingle or self-join of history — and
only collisions pay the exact-Jaccard verification. Identical banding
parameters to `functions/dedup.py` (32 hashes, 16x2), so the verified
output equals the one-shot brute force with the same ~5e-15 miss
probability, and the graded twin checks exactly that: three ingested
batches must reproduce the one-shot pair set bitwise.

Exactly-once: each table (pairs first, then index) carries a
``{stream_id: "lsh", batch_id}`` marker inside its append commit; a
replayed batch skips the appends it already published, and a crash
between the two commits replays only the missing one (both are
deterministic functions of index-without-batch + batch).

Scale shape: per batch, work = |batch| shingling (projection) +
|batch bands| ⋈ |index bands| equi-join + exact verification on
collisions only. By default the index side is a column-pruned
projection of the stored (doc_id, sig) rows re-exploded per batch;
the production layout (``bands_table=``) persists the exploded
(band, sig, doc_id) table bucketed on the join key, so the candidate
join reads the index side bucket-aligned with ZERO Exchange — only
the batch side shuffles (plan-gated by
tests/test_plan_quality.py::test_bucketed_lsh_band_join_no_exchange_on_index_side,
value-graded by ``dedup_incremental_lsh_bucketed``). Index growth is
|docs| rows; history is never re-shingled.
"""

from __future__ import annotations

import tempfile
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.functions.dedup import (
    ORACLE_DEDUP_MINHASH_LSH,
    bands_from_signatures,
    minhash_signatures,
    nonempty_shingled,
)
from data_pipeline_platform_spark.sinks.acid import AcidTable

_STREAM = "lsh"


def _last_batch(table: AcidTable, stream: str = _STREAM) -> int:
    for v in range(table.latest_version(), 0, -1):
        commit = table._read_commit(v)
        # markers inside unresolved/aborted txn stages never count
        # (same rule as streaming/cdc_apply.last_applied_batch)
        if table._txn_state(commit) in ("pending", "aborted"):
            continue
        meta = commit.get("meta") or {}
        if meta.get("stream_id") == stream:
            return int(meta["batch_id"])
    return -1


class _BucketedBandTable:
    """The production band-table layout shared by the text-LSH and
    embedding indexes: an EXTERNAL catalog table of exploded band rows,
    bucketed on the candidate-join key (so the per-batch join reads the
    stored side bucket-aligned with ZERO Exchange) and partitioned by
    batch_id (so a crash-replay republishes its partition idempotently
    — catalog DROP PARTITION plus a physical directory delete, because
    the table is external and a catalog-only drop leaves the old files
    readable)."""

    def __init__(self, spark: SparkSession, table: str, path: str,
                 bucket_cols, num_buckets: int):
        self.spark = spark
        self.table = table
        self.path = path
        self.bucket_cols = list(bucket_cols)
        self.num_buckets = num_buckets

    def ready(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def _delete_partition_dir(self, batch_id: int) -> None:
        jvm = self.spark._jvm
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
        part = jvm.org.apache.hadoop.fs.Path(
            f"{self.path}/batch_id={int(batch_id)}"
        )
        fs = part.getFileSystem(hconf)
        if fs.exists(part):
            fs.delete(part, True)

    def publish(self, rows: DataFrame, batch_id: int) -> None:
        # The replay sweep (catalog DROP PARTITION + dir delete) runs
        # only when the partition's directory actually exists — the
        # rare redelivery/crash-replay case. The normal ingest path
        # used to pay a metastore round trip (ALTER TABLE ... DROP IF
        # EXISTS PARTITION is a catalog op even when it drops nothing)
        # on EVERY batch (r14, ~0.1-0.2s each at sf0.1). The directory
        # listing is authoritative for data (saveAsTable publishes
        # files before registering the partition, so a catalog entry
        # without a directory cannot exist mid-crash, and a directory
        # without a catalog entry is exactly what the sweep handles).
        if batch_id in set(self.partition_ids()):
            if self.ready():
                self.spark.sql(
                    f"ALTER TABLE {self.table} DROP IF EXISTS "
                    f"PARTITION (batch_id={int(batch_id)})"
                )
            self._delete_partition_dir(batch_id)
        (
            # repartition by the SAME hash the bucketing uses so each
            # task holds exactly one bucket's rows -> one file per
            # bucket per batch, not tasks x buckets small files
            rows.withColumn("batch_id", F.lit(int(batch_id)))
            .repartition(self.num_buckets, *self.bucket_cols)
            .write.mode("append")
            .partitionBy("batch_id")
            .bucketBy(self.num_buckets, *self.bucket_cols)
            .option("path", self.path)
            .saveAsTable(self.table)
        )

    def before(self, batch_id: int) -> DataFrame:
        return self.spark.table(self.table).filter(
            F.col("batch_id") < int(batch_id)
        )

    def partition_ids(self):
        """batch_ids with a live partition, read from the FILESYSTEM
        (authoritative even when a crash left the catalog behind)."""
        jvm = self.spark._jvm
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
        root = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = root.getFileSystem(hconf)
        if not fs.exists(root):
            return []
        out = []
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("batch_id="):
                try:
                    out.append(int(name.split("=", 1)[1]))
                except ValueError:
                    pass
        return sorted(out)

    def compact(self, rows: DataFrame, through_batch: int) -> Dict[str, int]:
        """Fold every partition with batch_id <= ``through_batch`` (and
        any older compaction base) into ONE fresh base partition,
        bounding the file count at num_buckets + one set per
        not-yet-compacted batch instead of batches x buckets.

        ``rows`` must be the AUTHORITATIVE consolidated band rows for
        all batches <= through_batch (derived from the index store, a
        pure projection — never re-shingled/re-projected).

        Crash-safety by invariant, not by atomicity: base partitions
        use NEGATIVE batch_ids (always < any real batch, so ``before``
        reads them for every join), and the order is (1) publish the
        consolidated copy at a FRESH negative id, (2) drop the folded
        partitions. A crash anywhere leaves the row multiset a
        SUPERSET of the true set — candidate generation tolerates
        duplicates (pairs are .distinct()ed) — and the next compact()
        sweeps the leftovers. Rows are never lost mid-protocol."""
        existing = self.partition_ids()
        new_base = min([0] + [b for b in existing if b < 0]) - 1
        self.publish(rows, new_base)
        swept = 0
        for b in existing:
            if (0 <= b <= int(through_batch)) or (new_base < b < 0):
                self.spark.sql(
                    f"ALTER TABLE {self.table} DROP IF EXISTS "
                    f"PARTITION (batch_id={b})"
                )
                self._delete_partition_dir(b)
                swept += 1
        self.spark.catalog.refreshTable(self.table)
        return {"base_batch_id": new_base, "swept_partitions": swept}

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")


def _auto_compact_due(bands: "_BucketedBandTable", every: Optional[int]) -> bool:
    """Auto-compaction trigger (r12 verdict #4: compact_bands existed but
    nothing called it, so a long-running ingest re-inherited the
    small-files drift the op was built to fix). Due when the live
    per-batch partition count reaches ``every`` — bounding the file
    count at num_buckets (base) + every x num_buckets steady-state — or
    when MORE than one negative-id base partition is live, which only
    happens after a crashed compact() left its superset leftovers: the
    next ingest then self-heals instead of waiting for an operator."""
    if not (every and bands and bands.ready()):
        return False
    live = bands.partition_ids()
    n_batches = sum(1 for b in live if b >= 0)
    n_bases = sum(1 for b in live if b < 0)
    return n_batches >= int(every) or n_bases > 1


class IncrementalLshIndex:
    """ACID-backed MinHash index (rows: doc_id, shingles, sig) plus the
    accumulated verified near-duplicate pairs.

    ``bands_table``/``bands_path`` (optional, the production layout):
    also maintain the EXPLODED (band, sig, doc_id) table as a catalog
    table bucketed on the join key (band, sig). The per-batch candidate
    join then reads the index side bucket-aligned — NO Exchange over
    the stored bands, only the (small) batch side shuffles to the
    bucket count — closing the one remaining per-batch full shuffle of
    the 100 TB ingest path. The table is partitioned by batch_id so a
    replayed batch's band rows are idempotently re-published via a
    partition overwrite, mirroring the ACID markers."""

    def __init__(self, spark: SparkSession, index_path: str, pairs_path: str,
                 threshold: float = 0.8,
                 bands_table: Optional[str] = None,
                 bands_path: Optional[str] = None,
                 num_buckets: int = 32,
                 auto_compact_every: Optional[int] = None):
        self.spark = spark
        self.index = AcidTable(spark, index_path)
        self.pairs = AcidTable(spark, pairs_path)
        self.threshold = threshold
        if bands_table and not bands_path:
            raise ValueError("bands_table requires bands_path")
        self.bands_table = bands_table
        self.bands_path = bands_path
        self.num_buckets = num_buckets
        #: fold the band table every N live batch partitions (see
        #: _auto_compact_due); None = manual compact_bands() only
        self.auto_compact_every = auto_compact_every
        self._bands = (
            _BucketedBandTable(
                spark, bands_table, bands_path, ("band", "sig"), num_buckets
            )
            if bands_table
            else None
        )

    def _bands_ready(self) -> bool:
        return bool(self._bands and self._bands.ready())

    def _publish_bands(self, new_bands: DataFrame, batch_id: int) -> None:
        """Append the batch's band rows to the bucketed catalog table,
        idempotently (see _BucketedBandTable.publish)."""
        self._bands.publish(new_bands, batch_id)

    def drop_bands_table(self) -> None:
        if self._bands:
            self._bands.drop()

    def compact_bands(self) -> Dict[str, int]:
        """Fold the per-batch band partitions into one bucketed base
        partition (file count: batches x buckets -> buckets + newer
        batches). The consolidated rows re-derive from the ACID index
        store — a cheap explode of the STORED signatures, never a
        re-shingle — so the band table stays a pure projection of the
        authoritative index; see _BucketedBandTable.compact for the
        crash-safety argument."""
        through = _last_batch(self.index)
        rows = bands_from_signatures(
            self.index.read().select("doc_id", "sig")
        )
        return self._bands.compact(rows, through)

    def add_batch(self, docs: DataFrame, batch_id: int) -> Dict[str, int]:
        """Ingest one batch (columns doc_id, text): discover new-new and
        new-old near-dup pairs, append them, then append the batch's
        signatures to the index — each append marker-guarded."""
        prepared = minhash_signatures(
            nonempty_shingled(docs).select("doc_id", "shingles"),
            extra_cols=("shingles",),
        ).persist()
        try:
            new_bands = bands_from_signatures(prepared.select("doc_id", "sig"))
            # (a) in-batch candidates: one bucket groupBy, in-bucket pairs
            in_batch = (
                new_bands.groupBy("band", "sig")
                .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
                .filter(F.size("ids") > 1)
                .select(
                    F.explode(
                        F.expr(
                            "flatten(transform(ids, (x, i) -> "
                            "transform(slice(ids, i + 2, size(ids)), y -> "
                            "struct(x AS doc_a, y AS doc_b))))"
                        )
                    ).alias("p")
                )
                .select("p.doc_a", "p.doc_b")
            )
            if self.index.exists():
                old = self.index.read()
                if self._bands_ready():
                    # bucket-aligned index side: scans its buckets in
                    # place, no Exchange over the stored bands
                    old_bands = self._bands.before(batch_id).select(
                        F.col("doc_id").alias("old_id"), "band", "sig"
                    )
                else:
                    old_bands = bands_from_signatures(
                        old.select("doc_id", "sig")
                    ).select(F.col("doc_id").alias("old_id"), "band", "sig")
                cross = (
                    new_bands.join(old_bands, ["band", "sig"])
                    .select(
                        F.least("doc_id", "old_id").alias("doc_a"),
                        F.greatest("doc_id", "old_id").alias("doc_b"),
                    )
                )
                candidates = in_batch.unionByName(cross).distinct()
                lookup = old.unionByName(prepared).select("doc_id", "shingles")
            else:
                candidates = in_batch.distinct()
                lookup = prepared.select("doc_id", "shingles")
            sh_a = lookup.select(
                F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
            )
            sh_b = lookup.select(
                F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
            )
            verified = (
                candidates.join(sh_a, "doc_a")
                .join(sh_b, "doc_b")
                .withColumn(
                    "jaccard",
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    * F.lit(1.0)
                    / F.size(F.array_union("sh_a", "sh_b")),
                )
                .filter(F.col("jaccard") >= self.threshold)
                .select("doc_a", "doc_b", "jaccard")
            )
            # persist + eager count, deliberately: the count LOOKS like
            # a redundant job (the staged write's footers carry the row
            # count), but materializing the verify join as a CACHE BUILD
            # executes its ~dozen tiny shuffle stages as ONE non-AQE job
            # with concurrent stage scheduling, where the staged parquet
            # write would run them under AQE — one sequential driver
            # round-trip per query stage. Measured on the embedding twin
            # at sf0.1: AQE-staged 3.7-5.2s vs single-job 1.2-1.7s per
            # batch (an attempt to drop this count/persist pair was a
            # 0.75x regression, reverted; see OPTIMIZATION_r13.md). At
            # cluster scale stage work dwarfs dispatch latency and the
            # cache is batch-sized either way.
            verified = verified.persist()
            marker = {"stream_id": _STREAM, "batch_id": batch_id}
            n_pairs = 0
            try:
                if batch_id > _last_batch(self.pairs):
                    n_pairs = verified.count()
                    self.pairs.write(verified, mode="append", extra_meta=marker)
                if batch_id > _last_batch(self.index):
                    if self.bands_table:
                        # before the index marker: if the index has the
                        # batch, the bands do too; a crash in between
                        # republishes the batch partition idempotently
                        self._publish_bands(new_bands, batch_id)
                    self.index.write(prepared, mode="append", extra_meta=marker)
            finally:
                verified.unpersist(blocking=False)
        finally:
            prepared.unpersist(blocking=False)
        out = {"batch_id": batch_id, "new_pairs": n_pairs}
        if _auto_compact_due(self._bands, self.auto_compact_every):
            out["compacted"] = self.compact_bands()
        return out

    def all_pairs(self) -> DataFrame:
        try:
            return self.pairs.read()
        except FileNotFoundError:
            # every batch yielded zero pairs: a valid, empty result
            return self.spark.createDataFrame(
                [], "doc_a long, doc_b long, jaccard double"
            )

    def erase(self, doc_ids) -> Dict[str, int]:
        """Right-to-be-forgotten: remove the docs' signatures from the
        index and every accumulated pair naming them (see
        ``_erase_from``)."""
        return _erase_from(
            self.index, self.pairs, "doc_id", "doc_a", "doc_b", doc_ids
        )


def q_dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three ingestion batches (doc_id % 3) through the persisted index;
    the accumulated verified pairs must bitwise-equal the one-shot
    brute-force Jaccard >= 0.8 over the whole corpus — the SAME oracle
    `dedup_minhash_lsh` grades against, proving the incremental path
    loses nothing at a third of the per-run cost."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = IncrementalLshIndex(
        spark,
        tempfile.mkdtemp(prefix="lshidx_"),
        tempfile.mkdtemp(prefix="lshpairs_"),
    )
    for b in range(3):
        idx.add_batch(docs.filter(F.col("doc_id") % 3 == b), batch_id=b)
    return idx.all_pairs()


register("dedup_incremental_lsh", q_dedup_incremental_lsh, ORACLE_DEDUP_MINHASH_LSH)


def q_dedup_incremental_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed-band-table production layout of the incremental
    LSH index: identical three-batch ingest and the SAME one-shot
    oracle, but the per-batch candidate join reads the stored band
    side bucket-aligned (bucketBy on (band, sig)) — no Exchange over
    the index, only the batch side shuffles. Value-parity with
    `dedup_incremental_lsh` proves the layout changes the plan, not
    the answer."""
    import os as _os

    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="lshbkt_")
    idx = IncrementalLshIndex(
        spark,
        _os.path.join(root, "idx"),
        _os.path.join(root, "pairs"),
        bands_table=f"lsh_bands_{_os.path.basename(root).replace('lshbkt_', '')}",
        bands_path=_os.path.join(root, "bands"),
    )
    try:
        for b in range(3):
            idx.add_batch(docs.filter(F.col("doc_id") % 3 == b), batch_id=b)
    finally:
        idx.drop_bands_table()  # result rides the pairs table, not this
    return idx.all_pairs()


register(
    "dedup_incremental_lsh_bucketed",
    q_dedup_incremental_lsh_bucketed,
    ORACLE_DEDUP_MINHASH_LSH,
)


def q_dedup_incremental_lsh_autocompact(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """The auto-compaction policy under the correctness gate: same
    three-batch bucketed ingest and one-shot oracle as
    dedup_incremental_lsh_bucketed, but auto_compact_every=2 folds the
    band table MID-INGEST (after batch 1) — batch 2's candidate join
    reads history from the compacted negative-id base, and the final
    pair set must still be bitwise the one-shot LSH answer. Grades the
    r13 policy (r12 verdict #4), not just the manual compact() op."""
    import os as _os

    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="lshac_")
    idx = IncrementalLshIndex(
        spark,
        _os.path.join(root, "idx"),
        _os.path.join(root, "pairs"),
        bands_table=(
            f"lsh_acbands_{_os.path.basename(root).replace('lshac_', '')}"
        ),
        bands_path=_os.path.join(root, "bands"),
        auto_compact_every=2,
    )
    try:
        compactions = 0
        for b in range(3):
            stats = idx.add_batch(
                docs.filter(F.col("doc_id") % 3 == b), batch_id=b
            )
            compactions += "compacted" in stats
        assert compactions >= 1, "policy never fired"
    finally:
        idx.drop_bands_table()  # result rides the pairs table, not this
    return idx.all_pairs()


register(
    "dedup_incremental_lsh_autocompact",
    q_dedup_incremental_lsh_autocompact,
    ORACLE_DEDUP_MINHASH_LSH,
)


_EMB_STREAM = "emb-lsh"


class IncrementalEmbeddingIndex:
    """The vector twin of ``IncrementalLshIndex``: an ACID-backed
    (vec_id, vec) store whose hyperplane band keys are a deterministic
    projection (seeded planes — functions/similarity.py), so each new
    embedding batch discovers near-dup pairs against history with one
    (band_idx, band_val) equi-join and an exact-cosine verify on
    collisions only. Band collision is pairwise, so batched discovery
    equals the one-shot banded pass exactly — the graded twin shares
    `embedding_near_dup`'s plane-replaying oracle."""

    def __init__(self, spark: SparkSession, index_path: str, pairs_path: str,
                 bands_table: Optional[str] = None,
                 bands_path: Optional[str] = None,
                 num_buckets: int = 32,
                 auto_compact_every: Optional[int] = None):
        self.spark = spark
        self.index = AcidTable(spark, index_path)
        self.pairs = AcidTable(spark, pairs_path)
        if bands_table and not bands_path:
            raise ValueError("bands_table requires bands_path")
        self.bands_table = bands_table
        self.num_buckets = num_buckets
        #: fold the band table every N live batch partitions (see
        #: _auto_compact_due); None = manual compact_bands() only
        self.auto_compact_every = auto_compact_every
        #: production layout (r12, mirroring the text-LSH index): the
        #: exploded (vec_id, band_idx, band_val) rows as a catalog
        #: table bucketed on the join key — the per-batch candidate
        #: join reads the stored side with ZERO Exchange instead of
        #: re-shuffling every stored band row per batch
        self._bands = (
            _BucketedBandTable(
                spark, bands_table, bands_path,
                ("band_idx", "band_val"), num_buckets,
            )
            if bands_table
            else None
        )

    def drop_bands_table(self) -> None:
        if self._bands:
            self._bands.drop()

    def compact_bands(self) -> Dict[str, int]:
        """Embedding twin of IncrementalLshIndex.compact_bands: the
        consolidated rows are the integer explode of the STORED band
        arrays (zero dot products)."""
        from data_pipeline_platform_spark.functions.similarity import (
            explode_band_array,
        )

        through = _last_batch(self.index, _EMB_STREAM)
        rows = explode_band_array(self.index.read()).select(
            "vec_id", "band_idx", "band_val"
        )
        return self._bands.compact(rows, through)

    def add_batch(self, emb: DataFrame, batch_id: int) -> Dict[str, int]:
        """``emb``: (vec_id, vec array<double>) rows new to the corpus.

        The index stores (vec_id, vec, bands) — each vector is projected
        through the hyperplanes EXACTLY ONCE, at ingest; history's band
        keys replay from the stored integer array (r9 verdict #4: the
        old shape re-projected the whole history every batch, making
        batch cost O(|history| × planes × dim) instead of
        O(|history| band rows))."""
        from data_pipeline_platform_spark.functions.similarity import (
            ND_THRESHOLD,
            _dot,
            explode_band_array,
            hyperplane_band_array,
        )

        prepared = hyperplane_band_array(emb.select("vec_id", "vec")).persist()
        try:
            new_bands = explode_band_array(prepared)
            in_batch = (
                new_bands.groupBy("band_idx", "band_val")
                .agg(F.array_sort(F.collect_list("vec_id")).alias("ids"))
                .filter(F.size("ids") > 1)
                .select(
                    F.explode(
                        F.expr(
                            "flatten(transform(ids, (x, i) -> "
                            "transform(slice(ids, i + 2, size(ids)), y -> "
                            "struct(x AS id_a, y AS id_b))))"
                        )
                    ).alias("p")
                )
                .select("p.id_a", "p.id_b")
            )
            if self.index.exists():
                old = self.index.read()
                if self._bands and self._bands.ready():
                    # bucket-aligned stored side: scans its buckets in
                    # place, no Exchange over the index's band rows
                    old_bands = self._bands.before(batch_id).select(
                        F.col("vec_id").alias("old_id"),
                        "band_idx", "band_val",
                    )
                else:
                    # stored band keys: an integer explode, zero dot
                    # products (but the join still shuffles them)
                    old_bands = explode_band_array(old).select(
                        F.col("vec_id").alias("old_id"), "band_idx", "band_val"
                    )
                cross = new_bands.join(
                    old_bands, ["band_idx", "band_val"]
                ).select(
                    F.least("vec_id", "old_id").alias("id_a"),
                    F.greatest("vec_id", "old_id").alias("id_b"),
                )
                candidates = in_batch.unionByName(cross).distinct()
                lookup = old.select("vec_id", "vec").unionByName(
                    prepared.select("vec_id", "vec")
                )
            else:
                candidates = in_batch.distinct()
                lookup = prepared.select("vec_id", "vec")
            x = lookup.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("va"))
            y = lookup.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"))
            verified = (
                candidates.join(x, "id_a")
                .join(y, "id_b")
                .withColumn(
                    "cosine",
                    _dot("va", "vb")
                    / (F.sqrt(_dot("va", "va")) * F.sqrt(_dot("vb", "vb"))),
                )
                .filter(F.col("cosine") >= ND_THRESHOLD)
                .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
            )
            # persist + eager count: materializes the verify join as a
            # single non-AQE cache-build job — see the text twin above
            # for the measured rationale (AQE stages the deep tiny-
            # shuffle plan one driver round-trip at a time: 3.7-5.2s vs
            # 1.2-1.7s per batch at sf0.1)
            verified = verified.persist()
            marker = {"stream_id": _EMB_STREAM, "batch_id": batch_id}
            n_pairs = 0
            try:
                if batch_id > _last_batch(self.pairs, _EMB_STREAM):
                    n_pairs = verified.count()
                    self.pairs.write(verified, mode="append", extra_meta=marker)
                if batch_id > _last_batch(self.index, _EMB_STREAM):
                    if self._bands:
                        # before the index marker: if the index has the
                        # batch, the bands do too; a crash in between
                        # republishes the partition idempotently
                        self._bands.publish(
                            new_bands.select("vec_id", "band_idx", "band_val"),
                            batch_id,
                        )
                    self.index.write(prepared, mode="append", extra_meta=marker)
            finally:
                verified.unpersist(blocking=False)
        finally:
            prepared.unpersist(blocking=False)
        out = {"batch_id": batch_id, "new_pairs": n_pairs}
        if _auto_compact_due(self._bands, self.auto_compact_every):
            out["compacted"] = self.compact_bands()
        return out

    def all_pairs(self) -> DataFrame:
        try:
            return self.pairs.read()
        except FileNotFoundError:
            return self.spark.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )

    def erase(self, vec_ids) -> Dict[str, int]:
        """Right-to-be-forgotten: remove the vectors from the store and
        every accumulated pair naming them (see ``_erase_from``)."""
        return _erase_from(
            self.index, self.pairs, "vec_id", "id_a", "id_b", vec_ids
        )


def q_embedding_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three embedding-ingestion batches (vec_id % 3) through the
    persisted vector index; accumulated pairs must bitwise-equal the
    one-shot banded pass — the SAME plane-replaying oracle
    `embedding_near_dup` grades against."""
    from data_pipeline_platform_spark.functions.similarity import (
        _as_double,
        _emb,
    )

    base = _emb(spark, sf_dir).select(
        "vec_id", _as_double("embedding").alias("vec")
    )
    idx = IncrementalEmbeddingIndex(
        spark,
        tempfile.mkdtemp(prefix="embidx_"),
        tempfile.mkdtemp(prefix="embpairs_"),
    )
    for b in range(3):
        idx.add_batch(base.filter(F.col("vec_id") % 3 == b), batch_id=b)
    return idx.all_pairs()


def q_embedding_incremental_near_dup_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The bucketed-band-table production layout of the embedding
    index: identical three-batch ingest and the SAME plane-replaying
    oracle, but the per-batch candidate join reads the stored
    (band_idx, band_val) rows bucket-aligned — no Exchange over the
    index side, only the batch shuffles. Value-parity with
    `embedding_incremental_near_dup` proves the layout changes the
    plan, not the answer."""
    import os as _os

    from data_pipeline_platform_spark.functions.similarity import (
        _as_double,
        _emb,
    )

    base = _emb(spark, sf_dir).select(
        "vec_id", _as_double("embedding").alias("vec")
    )
    root = tempfile.mkdtemp(prefix="embbkt_")
    idx = IncrementalEmbeddingIndex(
        spark,
        _os.path.join(root, "idx"),
        _os.path.join(root, "pairs"),
        bands_table=(
            f"emb_bands_{_os.path.basename(root).replace('embbkt_', '')}"
        ),
        bands_path=_os.path.join(root, "bands"),
    )
    try:
        for b in range(3):
            idx.add_batch(base.filter(F.col("vec_id") % 3 == b), batch_id=b)
    finally:
        idx.drop_bands_table()  # result rides the pairs table, not this
    return idx.all_pairs()


def _register_embedding_incremental() -> None:
    from data_pipeline_platform_spark.functions.similarity import (
        ORACLE_EMBEDDING_NEAR_DUP,
    )

    register(
        "embedding_incremental_near_dup",
        q_embedding_incremental_near_dup,
        ORACLE_EMBEDDING_NEAR_DUP,
    )
    register(
        "embedding_incremental_near_dup_bucketed",
        q_embedding_incremental_near_dup_bucketed,
        ORACLE_EMBEDDING_NEAR_DUP,
    )


_register_embedding_incremental()


_ANN_STREAM = "ann-ivf"


class IncrementalAnnIndex:
    """PERSISTED IVF ANN index — the serving-shape sibling of the
    one-shot graded `cosine_topk_ivf_exact` (functions/similarity.py):

    - ``train``: fit the deterministic quantizer (content-addressed
      seeds + one decimal-exact Lloyd refinement, `ivfx_train`) on a
      base corpus ONCE; store the centroid table and the base's
      inverted file in ACID tables.
    - ``add_batch``: assign new vectors to the FROZEN centroids
      (broadcast 16 rows, fixed-point distance, cell tie-break) and
      append — history is never re-trained or re-assigned, the
      standard IVF serving model (FAISS's add-after-train contract).
    - ``search``: rank cells by centroid distance to the query, probe
      the closest ``nprobe``, exact-cosine re-rank inside probed cells.

    100 TB posture: per-batch cost is |batch| x 16 broadcast scores +
    one append; a search touches ~nprobe/n_cells of the corpus via the
    cell equi-join (cluster/partition the ivf table by cell and the
    file pruning makes that literal). Marker-guarded appends give
    exactly-once batch ingestion like the LSH/embedding indexes."""

    def __init__(
        self,
        spark: SparkSession,
        centroids_path: str,
        ivf_path: str,
        pq_path: Optional[str] = None,
    ):
        self.spark = spark
        self.centroids = AcidTable(spark, centroids_path)
        self.ivf = AcidTable(spark, ivf_path)
        #: optional persisted residual-PQ codebook (functions/pq.py):
        #: with it, every indexed row also stores its M sub-codes and
        #: ``search_adc`` generates candidates WITHOUT touching raw
        #: vectors — the FAISS IndexIVFPQ serving layout, persisted
        self.pq = AcidTable(spark, pq_path) if pq_path else None

    def _residuals(self, assigned: DataFrame, cent: DataFrame) -> DataFrame:
        return assigned.join(F.broadcast(cent), "cell").select(
            "vec_id",
            F.expr("zip_with(vec, cvec, (x, y) -> x - y)").alias("vec"),
        )

    def _with_codes(self, assigned: DataFrame, cent: DataFrame) -> DataFrame:
        """Attach the residual-PQ code array (element i = block i's
        code) to an assigned batch, encoding against the FROZEN stored
        sub-quantizers."""
        from data_pipeline_platform_spark.functions.pq import pq_encode

        codes = pq_encode(self._residuals(assigned, cent), self.pq.read())
        arr = codes.groupBy("vec_id").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(block, code))), "
                "x -> x.code)"
            ).alias("codes")
        )
        return assigned.join(arr, "vec_id")

    def train(self, emb: DataFrame, batch_id: int = 0) -> None:
        """``emb``: (vec_id, label, vec array<double>) — the training
        base; also becomes the first indexed batch. With a PQ store,
        the sub-quantizers fit on the BASE's residuals and freeze with
        the centroids (add-after-train for both quantizer levels)."""
        from data_pipeline_platform_spark.functions.similarity import (
            ivfx_assign,
            ivfx_train,
        )

        marker = {"stream_id": _ANN_STREAM, "batch_id": batch_id}
        if not self.centroids.exists():
            cent = ivfx_train(emb.select("vec_id", "vec"))
            self.centroids.write(cent, extra_meta=marker)
        else:
            # a re-train against an existing index must NOT assign with
            # freshly-fit centroids the store never sees — the stored
            # table is the quantizer search_by_id probes with, and a
            # disagreeing ivf would hide vectors in never-probed cells
            cent = self.centroids.read()
        # batch-sized assignment, materialized once WHEN the PQ path
        # multiplies its consumers (PQ training residuals, _with_codes'
        # residual/join pair, the final write — uncached, the
        # broadcast-assign re-executed up to 4x). Without PQ the write
        # is the sole consumer: persisting would only add a pass.
        assigned = ivfx_assign(emb, cent)
        if self.pq is not None:
            assigned = assigned.persist()
        try:
            if self.pq is not None and not self.pq.exists():
                from data_pipeline_platform_spark.functions.pq import pq_train

                self.pq.write(
                    pq_train(self._residuals(assigned, cent)),
                    extra_meta=marker,
                )
            if batch_id > _last_batch(self.ivf, _ANN_STREAM):
                rows = (
                    self._with_codes(assigned, cent)
                    if self.pq is not None
                    else assigned
                )
                self.ivf.write(rows, mode="append", extra_meta=marker)
        finally:
            if self.pq is not None:
                assigned.unpersist(blocking=False)

    def add_batch(self, emb: DataFrame, batch_id: int) -> None:
        from data_pipeline_platform_spark.functions.similarity import (
            ivfx_assign,
        )

        cent = self.centroids.read()
        if batch_id > _last_batch(self.ivf, _ANN_STREAM):
            # persist ONLY on the PQ path, where _with_codes consumes
            # the assignment twice (residual encode + code join) and
            # the write a third time; without PQ the write is the sole
            # consumer and a persist is a pure extra materialization
            # pass (measured 0.72x on ann_incremental_topk)
            assigned = ivfx_assign(emb, cent)
            if self.pq is not None:
                assigned = assigned.persist()
            try:
                rows = assigned
                if self.pq is not None:
                    rows = self._with_codes(assigned, cent)
                self.ivf.write(
                    rows,
                    mode="append",
                    extra_meta={
                        "stream_id": _ANN_STREAM, "batch_id": batch_id,
                    },
                )
            finally:
                if self.pq is not None:
                    assigned.unpersist(blocking=False)

    def refresh(self, emb: DataFrame, batch_id: int) -> Dict[str, int]:
        """Snapshot-refresh ingestion: hand the WHOLE corpus (or any
        superset of what was delivered before) and index only what is
        new. The delta is resolved by a column-pruned anti-join of the
        snapshot's vec_ids against the stored inverted file, so the
        frozen-quantizer assign+encode — the expensive part (|new| x
        n_cells scores + |new| x M x Ks sub-scores) — runs over the
        NEW vectors only, never the full corpus again. Already-stored
        codes are encode-once by construction: a refresh that
        discovers nothing new commits nothing (the stored code rows
        are read for the anti-join but never rewritten), so repeated
        refreshes against an unchanged corpus are O(anti-join), not
        O(re-encode)."""
        from data_pipeline_platform_spark.functions.similarity import (
            ivfx_assign,
        )

        if batch_id <= _last_batch(self.ivf, _ANN_STREAM):
            return {"added": 0, "replay": 1}
        cent = self.centroids.read()
        new = emb.join(
            self.ivf.read().select("vec_id"), "vec_id", "left_anti"
        )
        # persist the delta assignment ONLY when the PQ path reads it
        # twice (residual encode + code join) — without PQ, rows IS the
        # assignment and the tracked_persist below already pins it
        assigned = ivfx_assign(new, cent)
        if self.pq is not None:
            assigned = assigned.persist()
        rows = assigned
        if self.pq is not None:
            rows = self._with_codes(assigned, cent)
        from data_pipeline_platform_spark.utils.cache import tracked_persist

        rows = tracked_persist(rows)
        try:
            n = rows.count()
            if n == 0:
                return {"added": 0, "replay": 0}
            self.ivf.write(
                rows,
                mode="append",
                extra_meta={"stream_id": _ANN_STREAM, "batch_id": batch_id},
            )
        finally:
            rows.unpersist(blocking=False)
            if self.pq is not None:
                assigned.unpersist(blocking=False)
        return {"added": n, "replay": 0}

    def erase(self, vec_ids) -> Dict[str, int]:
        """Right-to-be-forgotten: remove the vectors from the inverted
        file (one atomic file-pruned commit; vacuum reclaims the
        bytes). The centroid table stays frozen — it is an aggregate
        over >= cell-many vectors, not per-id data, and the
        add-after-train contract keeps assignments stable."""
        return _erase_from(self.ivf, None, "vec_id", ids=vec_ids)

    def search_by_id(self, query_vec_id: int, k: int = None, nprobe: int = None):
        """Top-k neighbors of an INDEXED vector (excluded from its own
        results), deterministic ordering (cosine desc, vec_id)."""
        from pyspark.sql.window import Window

        from data_pipeline_platform_spark.functions.similarity import (
            IVFX_K,
            IVFX_PROBE,
            _dist_fp_sql,
            _dot,
        )

        k = k or IVFX_K
        nprobe = nprobe or IVFX_PROBE
        cent = self.centroids.read()
        ivf = self.ivf.read()
        q = ivf.filter(F.col("vec_id") == query_vec_id).select(
            F.col("vec").alias("qvec")
        )
        probed = (
            cent.crossJoin(F.broadcast(q))
            .withColumn("qdist", F.expr(_dist_fp_sql("cvec", "qvec")))
            .withColumn(
                "__pn", F.row_number().over(Window.orderBy("qdist", "cell"))
            )
            .filter(F.col("__pn") <= nprobe)
            .select("cell")
        )
        cand = (
            ivf.join(F.broadcast(probed), "cell")
            .filter(F.col("vec_id") != query_vec_id)
            .crossJoin(F.broadcast(q))
        )
        return (
            cand.withColumn(
                "cosine",
                _dot("vec", "qvec")
                / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("qvec", "qvec"))),
            )
            .select("vec_id", "label", F.round("cosine", 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), "vec_id")
            .limit(k)
        )

    def search_adc(
        self,
        query_vec_id: int,
        k: int = None,
        nprobe: int = None,
        n_cand: int = None,
    ):
        """IVFADC search over the PERSISTED index (requires a PQ
        store): probe the nprobe nearest cells, build one query-
        residual ADC table per probed cell (nprobe x M x Ks broadcast
        BIGINT entries), sum exact integers over the STORED code
        arrays, exact-cosine re-rank the n_cand best. Candidate
        generation reads (cell, codes) only — at 100 TB the raw
        vectors are touched for the final n_cand rows alone."""
        from pyspark.sql.window import Window

        from data_pipeline_platform_spark.functions.pq import (
            PQ_CAND,
            PQ_K,
            _subvectors,
        )
        from data_pipeline_platform_spark.functions.similarity import (
            IVFX_PROBE,
            _dist_fp_sql,
            _dot,
        )

        if self.pq is None:
            raise ValueError("search_adc requires a pq_path store")
        k = k or PQ_K
        nprobe = nprobe or IVFX_PROBE
        n_cand = n_cand or PQ_CAND
        cent = self.centroids.read()
        pqc = self.pq.read()
        ivf = self.ivf.read()
        q = ivf.filter(F.col("vec_id") == query_vec_id).select(
            F.col("vec").alias("qvec")
        )
        probed = (
            cent.crossJoin(F.broadcast(q))
            .withColumn("qdist", F.expr(_dist_fp_sql("cvec", "qvec")))
            .withColumn(
                "__pn", F.row_number().over(Window.orderBy("qdist", "cell"))
            )
            .filter(F.col("__pn") <= nprobe)
            .select("cell", "cvec")
        )
        q_resid_sub = _subvectors(
            probed.crossJoin(F.broadcast(q)).select(
                "cell",
                F.expr("zip_with(qvec, cvec, (x, y) -> x - y)").alias("vec"),
            ),
            vec_col="vec",
        ).select("cell", "block", F.col("svec").alias("qsub"))
        dtable = (
            pqc.withColumnRenamed("cell", "code")
            .join(F.broadcast(q_resid_sub), "block")
            .withColumn("d", F.expr(_dist_fp_sql("cvec", "qsub")))
            .select("cell", "block", "code", "d")
        )
        cand = (
            ivf.join(F.broadcast(probed.select("cell")), "cell")
            .filter(F.col("vec_id") != query_vec_id)
            .select(
                "vec_id", "cell", F.posexplode("codes").alias("block", "code")
            )
            .join(F.broadcast(dtable), ["cell", "block", "code"])
            .groupBy("vec_id")
            .agg(F.sum("d").alias("adc"))
            .orderBy("adc", "vec_id")
            .limit(n_cand)
        )
        return (
            ivf.join(F.broadcast(cand), "vec_id")
            .crossJoin(F.broadcast(q))
            .withColumn(
                "cosine",
                _dot("vec", "qvec")
                / (F.sqrt(_dot("vec", "vec")) * F.sqrt(_dot("qvec", "qvec"))),
            )
            .select("vec_id", "label", F.round("cosine", 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), "vec_id")
            .limit(k)
        )


def q_ann_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three ingestion batches through the persisted IVF index: the
    quantizer trains on batch 0 ONLY (vec_id % 3 == 1) and is then
    FROZEN; batches 1-2 assign to the stored centroids and append. The
    search must bitwise-equal the oracle, which replays the train-on-
    subset quantizer and the full-corpus frozen assignment in SQL —
    proving add-after-train loses nothing vs a from-scratch build on
    the same centroids."""
    from data_pipeline_platform_spark.functions.similarity import (
        _as_double,
        _emb,
    )

    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    idx = IncrementalAnnIndex(
        spark,
        tempfile.mkdtemp(prefix="anncent_"),
        tempfile.mkdtemp(prefix="annivf_"),
    )
    idx.train(emb.filter(F.col("vec_id") % 3 == 1), batch_id=0)
    idx.add_batch(emb.filter(F.col("vec_id") % 3 == 2), batch_id=1)
    idx.add_batch(emb.filter(F.col("vec_id") % 3 == 0), batch_id=2)
    return idx.search_by_id(0)


def _subset_index_sql() -> str:
    """Open-ended CTE chain (base/carr/ivf) for the TRAIN-ON-SUBSET
    deterministic IVF index: quantizer fit on vec_id % 3 == 1 only,
    frozen assignment over the full corpus — the add-after-train
    contract both persisted-index oracles replay."""
    from data_pipeline_platform_spark.functions.similarity import (
        IVFX_CELLS,
        _duck_dist_fp,
    )

    return f"""
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), train AS (
  SELECT vec_id, vec FROM base WHERE vec_id % 3 = 1
), seeds AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) AS seed_id, vec AS svec
  FROM (SELECT vec_id, vec, md5(CAST(vec_id AS VARCHAR)) AS h
        FROM train ORDER BY h, vec_id LIMIT {IVFX_CELLS})
), a0 AS (
  SELECT vec_id, vec, seed_id AS cell0 FROM (
    SELECT b.vec_id, b.vec, s.seed_id,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_duck_dist_fp('b.vec', 's.svec')}, s.seed_id) AS rn
    FROM train b CROSS JOIN seeds s
  ) WHERE rn = 1
), ex AS (
  SELECT cell0, i - 1 AS dim, vec[i] AS comp
  FROM a0, LATERAL (SELECT unnest(generate_series(1, len(vec))) AS i)
), cents AS (
  SELECT cell0, dim,
         CAST(SUM(CAST(round(comp * 1000000000) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1000000000.0 AS c
  FROM ex GROUP BY cell0, dim
), carr AS (
  SELECT cell0 AS cell, list(c ORDER BY dim) AS cvec FROM cents GROUP BY cell0
), ivf AS (
  SELECT vec_id, label, vec, cell FROM (
    SELECT b.vec_id, b.label, b.vec, ca.cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY {_duck_dist_fp('b.vec', 'ca.cvec')}, ca.cell) AS rn
    FROM base b CROSS JOIN carr ca
  ) WHERE rn = 1"""


def _register_ann_incremental() -> None:
    from data_pipeline_platform_spark.functions.similarity import (
        IVFX_K,
        IVFX_PROBE,
        _duck_dist_fp,
    )

    oracle = f"""
{_subset_index_sql()}
), q AS (
  SELECT vec AS qvec FROM ivf WHERE vec_id = 0
), probed AS (
  SELECT cell FROM (
    SELECT ca.cell,
           row_number() OVER (
             ORDER BY {_duck_dist_fp('ca.cvec', 'q.qvec')}, ca.cell) AS pn
    FROM carr ca CROSS JOIN q
  ) WHERE pn <= {IVFX_PROBE}
), scored AS (
  SELECT i.vec_id, i.label,
         round(
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_zip(i.vec, q.qvec), p -> p[1] * p[2])),
             (acc, t) -> acc + t)
           / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(i.vec, x -> x * x)), (acc, t) -> acc + t))
              * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(q.qvec, x -> x * x)), (acc, t) -> acc + t))),
           6) AS cosine
  FROM ivf i JOIN probed USING (cell) CROSS JOIN q
  WHERE i.vec_id != 0
)
SELECT vec_id, label, cosine FROM scored
ORDER BY cosine DESC, vec_id LIMIT {IVFX_K}
"""
    register("ann_incremental_topk", q_ann_incremental_topk, oracle)


_register_ann_incremental()


def _erase_from(index: AcidTable, pairs, id_col: str,
                pair_a: str = None, pair_b: str = None, ids=None) -> Dict[str, int]:
    """Shared right-to-be-forgotten walk for the incremental indexes:
    remove the ids' rows from the index table AND (when ``pairs`` is
    given) every accumulated pair referencing them, each in one atomic
    file-pruned commit. ``ids`` is a list or a 1-column DataFrame.
    Returns audit counts.

    An erased id leaves NO trace: its vectors/signatures are gone from
    the store (vacuum reclaims the bytes) and no derived pair names it.
    Re-ingesting a doc later rediscovers pairs against the REMAINING
    corpus only — exactly the semantics a deletion request demands."""
    spark = index.spark
    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame([(int(i),) for i in ids], f"{id_col} long")
    ids = ids.select(F.col(ids.columns[0]).alias(id_col)).distinct()
    removed_rows = 0
    if index.exists():
        # persist: one computation feeds the audit count AND (via the
        # merge's own delete_keys resolution) nothing else — but the
        # count alone would otherwise re-scan the index inside merge
        hit = index.read().join(
            F.broadcast(ids), id_col, "left_semi"
        ).persist()
        try:
            removed_rows = hit.count()
            if removed_rows:
                index.merge(
                    hit.limit(0),
                    keys=[id_col],
                    delete_keys=ids,
                    extra_meta={"op_note": "erasure"},
                )
        finally:
            hit.unpersist(blocking=False)
    removed_pairs = 0
    if pairs is not None and pairs.exists():
        p = pairs.read()
        doomed = p.join(
            F.broadcast(ids.select(F.col(id_col).alias(pair_a))),
            pair_a,
            "left_semi",
        ).unionByName(
            p.join(
                F.broadcast(ids.select(F.col(id_col).alias(pair_b))),
                pair_b,
                "left_semi",
            )
        ).distinct().persist()  # count + delete_keys: ONE computation
        try:
            removed_pairs = doomed.count()
            if removed_pairs:
                pairs.merge(
                    doomed.limit(0),
                    keys=[pair_a, pair_b],
                    delete_keys=doomed.select(pair_a, pair_b),
                    extra_meta={"op_note": "erasure"},
                )
        finally:
            doomed.unpersist(blocking=False)
    return {"rows_erased": removed_rows, "pairs_erased": removed_pairs}


def q_ann_ivfpq_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted IVFADC index end to end (the production serving
    capstone): the IVF quantizer AND the residual-PQ sub-quantizers
    both train on batch 0 ONLY and freeze; batches 1-2 assign + encode
    against the stored tables and append (codes ride in the inverted
    file's rows); the search probes cells, scores STORED codes against
    per-probed-cell query-residual ADC tables (exact BIGINTs), and
    exact-cosine re-ranks. The oracle replays the train-on-subset IVF,
    the subset-trained sub-quantizers, the full-corpus frozen encode,
    and the ADC search — so add-after-train at BOTH quantizer levels is
    value-graded against the one-shot build."""
    from data_pipeline_platform_spark.functions.similarity import (
        _as_double,
        _emb,
    )

    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    idx = IncrementalAnnIndex(
        spark,
        tempfile.mkdtemp(prefix="pqcent_"),
        tempfile.mkdtemp(prefix="pqivf_"),
        pq_path=tempfile.mkdtemp(prefix="pqsub_"),
    )
    idx.train(emb.filter(F.col("vec_id") % 3 == 1), batch_id=0)
    idx.add_batch(emb.filter(F.col("vec_id") % 3 == 2), batch_id=1)
    idx.add_batch(emb.filter(F.col("vec_id") % 3 == 0), batch_id=2)
    return idx.search_adc(0)


def _register_ann_ivfpq_incremental() -> None:
    from data_pipeline_platform_spark.functions.pq import oracle_ivfpq_sql

    register(
        "ann_ivfpq_incremental",
        q_ann_ivfpq_incremental,
        oracle_ivfpq_sql(
            index_sql=_subset_index_sql(),
            pq_seed_where="WHERE vec_id % 3 = 1",
            pq_train_where="WHERE s.vec_id % 3 = 1",
        ),
    )


_register_ann_ivfpq_incremental()


def q_ann_ivfpq_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The refresh-from-snapshot ingest path: train the persisted
    IVFADC index on a third of the corpus, then hand the WHOLE corpus
    to ``refresh`` — the anti-join indexes only the un-coded two
    thirds against the frozen quantizers, and a second refresh of the
    same snapshot adds nothing and commits nothing (encode-once). The
    final stored state is identical to the slice-by-slice incremental
    build, so the same subset-trained oracle value-grades it."""
    from data_pipeline_platform_spark.functions.similarity import (
        _as_double,
        _emb,
    )

    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", _as_double("embedding").alias("vec")
    )
    idx = IncrementalAnnIndex(
        spark,
        tempfile.mkdtemp(prefix="rfcent_"),
        tempfile.mkdtemp(prefix="rfivf_"),
        pq_path=tempfile.mkdtemp(prefix="rfsub_"),
    )
    idx.train(emb.filter(F.col("vec_id") % 3 == 1), batch_id=0)
    out1 = idx.refresh(emb, batch_id=1)
    v_after = idx.ivf.latest_version()
    out2 = idx.refresh(emb, batch_id=2)  # nothing new: no commit
    assert out1["added"] > 0 and out2["added"] == 0
    assert idx.ivf.latest_version() == v_after
    return idx.search_adc(0)


def _register_ann_ivfpq_refresh() -> None:
    from data_pipeline_platform_spark.functions.pq import oracle_ivfpq_sql

    register(
        "ann_ivfpq_refresh",
        q_ann_ivfpq_refresh,
        oracle_ivfpq_sql(
            index_sql=_subset_index_sql(),
            pq_seed_where="WHERE vec_id % 3 = 1",
            pq_train_where="WHERE s.vec_id % 3 = 1",
        ),
    )


_register_ann_ivfpq_refresh()
