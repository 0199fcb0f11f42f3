"""Sequence packing for LLM training-data pipelines (extension; no
reference counterpart — the reference has no tokenizer/packing ops).

The GPT-style packing contract: concatenate the corpus in a canonical
document order and split the token stream into fixed-capacity training
sequences (bins of ``capacity`` tokens); a document may straddle a bin
boundary. Deciding each document's placement is exactly one number —
its GLOBAL token offset, an exclusive prefix sum over the canonical
order.

SCALE: the naive prefix sum (`Window.orderBy(doc_id)` with no
partitioning) is a single-task global sort — the canonical example of
an operator that works at sf0.1 and dies at 100 TB. This module
implements the two-phase distributed scan instead:

1. range-repartition on the order column (Exchange rangepartitioning —
   a real shuffle, but parallel), stamp ``spark_partition_id()`` and
   PERSIST so the partition assignment is decided exactly once;
2. one tiny action: per-partition token totals (#partitions rows to
   the driver, k-bounded) -> exclusive per-partition offsets,
   broadcast back as a #partitions-row join;
3. per-partition cumulative sum (Window partitioned BY the partition
   id — every partition scans independently, no global sort) plus the
   broadcast offset.

The graded twin value-grades the whole scheme against DuckDB's global
window — bitwise, so a partition-boundary off-by-one anywhere breaks
the hash. A plan gate pins the absence of a partition-less Window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

PACK_CAPACITY = 2048


def with_global_offsets(
    df: DataFrame,
    order_col,
    weight_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Add ``global_offset`` = exclusive prefix sum of ``weight_col``
    in ``order_col`` order (a column name or a list of names — the
    composite orders lexicographically), via the two-phase distributed
    scan (no single-partition global window). The combination of order
    columns must be unique per row."""
    from data_pipeline_platform_spark.utils.cache import tracked_persist

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    ranged = tracked_persist(
        df.repartitionByRange(
            num_partitions, *[F.col(c) for c in order_cols]
        ).withColumn("__pid", F.spark_partition_id())
    )
    # phase 2: k-bounded driver hop — one row per partition
    totals = (
        ranged.groupBy("__pid")
        .agg(
            F.sum(weight_col).alias("__tot"),
            F.min(F.struct(*order_cols)).alias("__lo"),
        )
        .collect()
    )
    # range partitions are ordered by key range, not by pid — order by
    # each partition's minimum key to build the exclusive offsets
    running = 0
    offsets = []
    for row in sorted(totals, key=lambda r: tuple(r["__lo"])):
        offsets.append((row["__pid"], running))
        running += int(row["__tot"] or 0)
    off_df = df.sparkSession.createDataFrame(
        offsets, "__pid int, __part_offset long"
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(
            "global_offset",
            F.col("__part_offset")
            + F.coalesce(F.sum(weight_col).over(w), F.lit(0)),
        )
        .drop("__pid", "__part_offset")
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int = PACK_CAPACITY,
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign every document its bin span under contiguous fixed-
    capacity packing: (global_offset, first_bin, last_bin, n_bins).
    A document straddles bins iff its token run crosses a multiple of
    ``capacity``."""
    out = with_global_offsets(docs, order_col, tokens_col)
    # integer DIV, not double division: `/` is exact only while capacity
    # is a power of two; near 2^53 a double-rounded quotient can shift a
    # boundary document by one bin, diverging from the oracle's `//`
    cap = int(capacity)
    first = F.expr(f"global_offset DIV {cap}")
    last = F.expr(f"(global_offset + `{tokens_col}` - 1) DIV {cap}")
    return (
        out.withColumn("first_bin", first)
        .withColumn("last_bin", last)
        .withColumn("n_bins", (last - first + 1).cast("bigint"))
    )


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing over the documents table: whitespace
    token counts (the text_stats tokenizer), canonical doc_id order,
    2048-token bins. Every row's global offset comes from the two-phase
    distributed prefix sum; the oracle recomputes it with DuckDB's
    global window — bitwise equality proves the partition hand-off adds
    and misses nothing."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("n_tokens"),
    )
    return pack_sequences(docs).select(
        "doc_id", "n_tokens", "global_offset", "first_bin", "last_bin",
        "n_bins",
    )


ORACLE_SEQUENCE_PACKING = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS global_offset
  FROM t
)
SELECT doc_id, n_tokens, global_offset,
       CAST(global_offset // {PACK_CAPACITY} AS BIGINT) AS first_bin,
       CAST((global_offset + n_tokens - 1) // {PACK_CAPACITY} AS BIGINT)
         AS last_bin,
       CAST((global_offset + n_tokens - 1) // {PACK_CAPACITY}
            - global_offset // {PACK_CAPACITY} + 1 AS BIGINT) AS n_bins
FROM s
"""


def q_packing_bin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-level fill report from the same packing: tokens per bin
    (every bin holds exactly ``capacity`` except the last), documents
    touching each bin, straddler count — the packing-efficiency audit
    a training run reads. Derived per-bin via a doc->bins explode of
    the per-doc spans (each doc explodes into n_bins rows — bounded by
    total_tokens/capacity extra rows corpus-wide, not by doc count)."""
    packed = q_sequence_packing(spark, sf_dir)
    spans = packed.select(
        "doc_id",
        "n_tokens",
        "global_offset",
        F.explode(F.sequence("first_bin", "last_bin")).alias("bin_id"),
        "n_bins",
    )
    cap = F.lit(PACK_CAPACITY).cast("bigint")
    start = F.greatest(F.col("global_offset"), F.col("bin_id") * cap)
    end = F.least(
        F.col("global_offset") + F.col("n_tokens"),
        (F.col("bin_id") + 1) * cap,
    )
    return (
        spans.withColumn("tok_in_bin", (end - start).cast("bigint"))
        .groupBy("bin_id")
        .agg(
            F.sum("tok_in_bin").alias("bin_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("n_bins") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_straddlers"),
        )
    )


ORACLE_PACKING_BIN_STATS = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS global_offset
  FROM t
), spans AS (
  SELECT doc_id, n_tokens, global_offset,
         CAST(global_offset // {PACK_CAPACITY} AS BIGINT) AS first_bin,
         CAST((global_offset + n_tokens - 1) // {PACK_CAPACITY} AS BIGINT)
           AS last_bin
  FROM s
), ex AS (
  SELECT doc_id, n_tokens, global_offset, first_bin, last_bin,
         UNNEST(generate_series(first_bin, last_bin)) AS bin_id
  FROM spans
)
SELECT CAST(bin_id AS BIGINT) AS bin_id,
       CAST(SUM(LEAST(global_offset + n_tokens,
                      (bin_id + 1) * {PACK_CAPACITY})
                - GREATEST(global_offset, bin_id * {PACK_CAPACITY}))
            AS BIGINT) AS bin_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN last_bin > first_bin THEN 1 ELSE 0 END)
            AS BIGINT) AS n_straddlers
FROM ex
GROUP BY bin_id
"""


register("sequence_packing", q_sequence_packing, ORACLE_SEQUENCE_PACKING)
register("packing_bin_stats", q_packing_bin_stats, ORACLE_PACKING_BIN_STATS)


_PACK_STREAM = "pack"


class IncrementalPacker:
    """Exactly-once INCREMENTAL sequence packing — the production shape
    of `pack_sequences`: daily ingest batches append to one persisted
    packed-corpus manifest (an AcidTable of per-doc bin spans), each
    batch continuing from the stored high-water token offset.

    The running total rides in the append commit's meta
    ({stream_id, batch_id, total_tokens}), so resuming costs an O(1)
    newest-first commit walk — never a SUM over the manifest — and a
    redelivered batch is skipped by its marker (the cdc_apply /
    LSH-index exactly-once pattern). Within a batch the offsets come
    from the same two-phase distributed prefix sum as the one-shot
    path, so delivering the corpus as ordered slices reproduces the
    one-shot packing BITWISE (the graded twin's contract)."""

    def __init__(self, spark: SparkSession, path: str,
                 capacity: int = PACK_CAPACITY):
        from data_pipeline_platform_spark.sinks.acid import AcidTable

        self.spark = spark
        self.table = AcidTable(spark, path)
        self.capacity = capacity

    def _state(self):
        """(last_batch_id, running_total_tokens) from commit meta."""
        if not self.table.exists():
            return -1, 0
        for v in range(self.table.latest_version(), 0, -1):
            commit = self.table._read_commit(v)
            if self.table._txn_state(commit) in ("pending", "aborted"):
                continue
            meta = commit.get("meta") or {}
            if meta.get("stream_id") == _PACK_STREAM:
                return int(meta["batch_id"]), int(meta["total_tokens"])
        return -1, 0

    def pack_batch(self, docs: DataFrame, batch_id: int,
                   order_col: str = "doc_id",
                   tokens_col: str = "n_tokens") -> Dict:
        last, base = self._state()
        if batch_id <= last:
            return {"batch_id": batch_id, "replay": 1, "added": 0}
        from data_pipeline_platform_spark.utils.cache import tracked_persist

        out = tracked_persist(
            with_global_offsets(docs, order_col, tokens_col).withColumn(
                "global_offset", F.col("global_offset") + F.lit(base)
            )
        )
        try:
            cap = int(self.capacity)
            # integer DIV (same fix as with_bin_spans): double division
            # is exact only for power-of-two capacities
            first = F.expr(f"global_offset DIV {cap}")
            last_b = F.expr(f"(global_offset + `{tokens_col}` - 1) DIV {cap}")
            rows = (
                out.withColumn("first_bin", first)
                .withColumn("last_bin", last_b)
                .withColumn("n_bins", (last_b - first + 1).cast("bigint"))
            )
            stats = out.agg(
                F.count(F.lit(1)).alias("n"), F.sum(tokens_col).alias("t")
            ).collect()[0]
            self.table.write(
                rows,
                mode="append",
                extra_meta={
                    "stream_id": _PACK_STREAM,
                    "batch_id": batch_id,
                    "total_tokens": base + int(stats["t"] or 0),
                },
            )
            return {"batch_id": batch_id, "replay": 0,
                    "added": int(stats["n"])}
        finally:
            out.unpersist(blocking=False)

    def manifest(self) -> DataFrame:
        return self.table.read()


def q_sequence_packing_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three ordered ingest slices (doc_id thirds by RANGE — the
    arrival order a partitioned ingest gives) through the persisted
    packer, with slice 1 REDELIVERED to prove the replay skip; the
    accumulated manifest must bitwise-equal the ONE-SHOT packing of
    the whole corpus — the same oracle `sequence_packing` grades
    against — so a wrong high-water offset, a dropped row, or a
    double-applied batch is a value mismatch."""
    import tempfile

    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("n_tokens"),
    )
    m = docs.agg(F.max("doc_id")).collect()[0][0]
    cut1, cut2 = m // 3, 2 * m // 3
    packer = IncrementalPacker(spark, tempfile.mkdtemp(prefix="incpack_"))
    slices = [
        docs.filter(F.col("doc_id") <= cut1),
        docs.filter((F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2)),
        docs.filter(F.col("doc_id") > cut2),
    ]
    for b, sl in enumerate(slices):
        packer.pack_batch(sl, batch_id=b)
        if b == 1:
            out = packer.pack_batch(sl, batch_id=b)  # redelivery
            assert out["replay"] == 1, "replay not skipped"
    return packer.manifest().select(
        "doc_id", "n_tokens", "global_offset", "first_bin", "last_bin",
        "n_bins",
    )


register(
    "sequence_packing_incremental",
    q_sequence_packing_incremental,
    ORACLE_SEQUENCE_PACKING,
)
