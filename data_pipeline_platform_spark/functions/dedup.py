"""Deduplication operators over `documents`/`embeddings` (M8 extension).

Four families, each a different scale/accuracy trade-off:

- exact        — content-hash groupBy; one shuffle on a 32-char key.
- ngram Jaccard— inverted-index pair join on 3-word shingles: explodes
                 each doc into shingles, joins docs sharing a shingle,
                 computes exact Jaccard. Cost ~ sum over shingles of
                 (docs-per-shingle)^2 — fine when shingles are diverse;
                 at 100 TB you'd first drop shingles with document
                 frequency > cutoff (stop-shingles) to bound the join.
- MinHash LSH  — 64 xxhash64-based min-hashes, banded 32x2; only
                 band-collision candidates get the exact-Jaccard check.
                 This is the 100 TB path: cost ~ candidates, not pairs.
- SimHash      — 64-bit signature via per-token hash bit-votes, banded
                 by 4x16-bit chunks, Hamming-verified. Pandas-UDF
                 signature computation (bit ops beat Column exprs here),
                 Arrow-batched.
- embedding cosine near-dup — exact pair join over LSH-style buckets is
                 in similarity.py; here the brute-force variant used as
                 its oracle baseline.

All candidate->verify steps compute the *exact* metric, so LSH recall
(not precision) is the only approximation; band parameters are chosen so
P(miss | jaccard >= threshold) < 1e-10 and the verified output equals the
brute-force result — which is exactly what the DuckDB oracles compute.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.utils.cache import tracked_persist


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_platform_spark.sources.readers import load_table

    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-groupBy exact dedup: representative = min(doc_id) per content
    hash. At scale: one shuffle keyed on md5 — skew-free by construction."""
    docs = _docs(spark, sf_dir)
    return (
        docs.withColumn("content_hash", F.md5(F.col("text")))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


ORACLE_DEDUP_EXACT = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# ---------------------------------------------------------------------------
# shingling (shared by jaccard + minhash)
# ---------------------------------------------------------------------------

def with_shingles(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Distinct k-word shingles as array<string> (empty if < k tokens)."""
    return df.withColumn("__w", F.split(F.trim(F.col(text_col)), r"\s+")).withColumn(
        "shingles",
        F.expr(
            f"CASE WHEN size(__w) >= {k} THEN array_distinct(transform("
            f"sequence(0, size(__w) - {k}), "
            f"i -> concat_ws(' ', slice(__w, i + 1, {k})))) "
            "ELSE array() END"
        ),
    ).drop("__w")


def nonempty_shingled(
    df: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """``with_shingles`` restricted to docs that produce >= 1 shingle.

    Equivalent to ``with_shingles(df).filter(size(shingles) > 0)`` —
    a doc shingles non-empty iff it has >= k tokens — but the filter is
    applied BEFORE the shingle projection, on the token count alone.
    The post-projection spelling let Catalyst push ``size(shingles) >
    0`` below the projection as a predicate over the raw text, so the
    whole shingle pipeline (split + transform + concat_ws per position
    + array_distinct) was evaluated TWICE per surviving row (guide
    §4.4's duplicated-evaluation shape, with built-in expressions):
    once inside the pushed filter, once in the projection. Pre-filtering
    on ``size(split(...)) >= k`` duplicates only the cheap split."""
    pre = df.filter(F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= k)
    return with_shingles(pre, text_col, k)


_DUCK_SHINGLES = """
  SELECT doc_id, list_distinct(
           CASE WHEN len(w) >= 3 THEN
             list_transform(generate_series(1, len(w) - 2),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
           ELSE [] END) AS shingles
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
"""


STOP_SHINGLE_DF = 50


def _jaccard_pairs(
    docs: DataFrame, threshold: float, stop_shingle_df: int = STOP_SHINGLE_DF
) -> DataFrame:
    """Inverted-index exact-Jaccard pairs over 3-word shingles, with a
    document-frequency cutoff bounding the index self-join.

    Shingles appearing in more than ``stop_shingle_df`` documents
    ("click here to"-style boilerplate) are dropped from the *candidate*
    index — the self-join cost is sum(df^2) per shingle, so one hot
    shingle otherwise dominates the whole job. Verification then
    computes the exact Jaccard over the FULL shingle sets, so the only
    recall contract is: a qualifying pair must share at least one
    sub-cutoff shingle. Near-dups (many shared shingles, most of them
    rare) satisfy it by construction; at test SF the max shingle df is
    9, so the cutoff is non-binding and output equals brute force (the
    oracle)."""
    # persist: feeds the candidate index and both sides of the verify
    # join. Tracked so long-lived callers can free it after the lazy
    # result materializes (utils.cache.release_tracked).
    from data_pipeline_platform_spark.sources.readers import spread_scan

    sh = tracked_persist(with_shingles(spread_scan(docs)).select("doc_id", "shingles"))
    exploded = sh.select("doc_id", F.explode("shingles").alias("s"))
    # ONE shuffle does everything: group the inverted index per shingle,
    # measure document frequency as the posting-list size (distinct
    # docs), apply the stop-shingle cutoff, and expand in-bucket pairs
    # with a higher-order expression. The former shape (window df count
    # + exploded self-join) shuffled the index three times for the same
    # result; the cutoff bounds the m(m-1)/2 expansion at cutoff².
    cand = (
        exploded.groupBy("s")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= stop_shingle_df))
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
        # explicit-count repartition + dropDuplicates instead of
        # distinct(): the candidate rows are two longs each, so AQE's
        # byte-proportional coalescing squeezes this exchange onto a
        # handful of tasks — but the stage DOWNSTREAM of it does the
        # exact-Jaccard verification (array_intersect over full shingle
        # sets), the most CPU-dense work per byte in the whole plan
        # (r13: ~34 s of task time serialized onto 8 tasks inside
        # training_data_pipeline). A user-specified partition count is
        # exempt from AQE coalescing, pinning the verify stage at the
        # session's configured shuffle parallelism; same set semantics
        # as distinct(). (The r13 fix — a global 256 KiB coalescing
        # floor — bought this back at the price of 4x task counts on
        # every tiny exchange in the suite; the r14 full-headline A/B
        # measured that as a net loss, so the parallelism is pinned
        # here, where the CPU density is, instead of globally.)
        .repartition(
            int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions")),
            "doc_a",
            "doc_b",
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("shared", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("shared")
            * F.lit(1.0)
            / (F.size("sh_a") + F.size("sh_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "shared", "jaccard")
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jaccard_pairs(_docs(spark, sf_dir), threshold=0.2)


# The oracle models the SAME declared semantics as _jaccard_pairs,
# including the stop-shingle document-frequency cutoff: candidate pairs
# must share at least one shingle with 1 < df <= STOP_SHINGLE_DF, then
# the exact Jaccard is verified over the FULL shingle sets. At test SF
# the cutoff is non-binding (max df = 9), but the grade stays exact on
# any corpus where it binds.
ORACLE_DEDUP_NGRAM_JACCARD = f"""
WITH sh AS ({_DUCK_SHINGLES}),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
live AS (
  SELECT s FROM ex GROUP BY s
  HAVING COUNT(*) > 1 AND COUNT(*) <= {STOP_SHINGLE_DF}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
),
verified AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sa.shingles, sb.shingles)) AS shared,
         len(sa.shingles) AS na, len(sb.shingles) AS nb
  FROM cand
  JOIN sh sa ON doc_a = sa.doc_id
  JOIN sh sb ON doc_b = sb.doc_id
)
SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared,
       shared * 1.0 / (na + nb - shared) AS jaccard
FROM verified
WHERE shared * 1.0 / (na + nb - shared) >= 0.2
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# 32 hashes in 16 bands x 2 rows: P(candidate | j) = 1-(1-j^2)^16.
# At the verify threshold j=0.8 the miss probability is (1-0.64)^16 ~ 2e-7
# and the planted near-dups (j~0.99) are missed w.p. ~1e-22 — so the
# verified output still equals brute force, at half the signature cost of
# the textbook 64-hash config.
N_HASHES = 32
N_BANDS = 16
ROWS_PER_BAND = N_HASHES // N_BANDS


def minhash_signatures(
    shingled: DataFrame,
    n_hashes: int = N_HASHES,
    id_col: str = "doc_id",
    extra_cols: tuple = (),
) -> DataFrame:
    """Min-hash signatures as one array column ``sig`` (entry i =
    min over shingles of xxhash64(shingle, i)), computed in a single
    per-row ``aggregate`` over the shingle array.

    Zero shuffle: each doc's signature is a pure projection of its own
    row, so signature computation rides whatever partitioning the scan
    has. The former shape (explode + 32-way min groupBy) moved every
    (doc, shingle) pair through a hash exchange to reassemble rows that
    were never apart — measured 6x slower at sf0.1 with bitwise-equal
    signatures."""
    sig = (
        f"aggregate(shingles, "
        f"array_repeat(CAST(9223372036854775807 AS BIGINT), {n_hashes}), "
        f"(acc, s) -> zip_with(acc, sequence(0, {n_hashes - 1}), "
        f"(a, seed) -> least(a, xxhash64(s, seed))))"
    )
    return shingled.select(id_col, *extra_cols, F.expr(sig).alias("sig"))


def bands_from_signatures(mh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, sig) band-bucket keys from a frame that already
    carries a ``sig`` signature array — the projection the persisted
    signature index (functions/dedup_index.py) replays without
    re-shingling history."""
    # bands directly from the signature array — sig[i] is 0-based
    band_structs = (
        f"transform(sequence(0, {N_BANDS - 1}), b -> struct(b AS band, xxhash64("
        + ", ".join(f"sig[b * {ROWS_PER_BAND} + {r}]" for r in range(ROWS_PER_BAND))
        + ") AS sig))"
    )
    return mh.select(
        id_col, F.explode(F.expr(band_structs)).alias("bs")
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def lsh_band_keys(shingled: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, sig) LSH keys: one-pass minhash signature, then each
    band's rows hash into a single 64-bit bucket key. Two docs collide
    in a band iff their signature rows agree there — the equi-join key
    both the self-dedup and the cross-corpus decontamination use."""
    return bands_from_signatures(
        minhash_signatures(shingled, id_col=id_col), id_col=id_col
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-banded MinHash candidates, exact-Jaccard verified at 0.8.

    With 32x2 banding, P(miss) at j=0.8 is (1-0.64)^32 ~ 5e-15, so the
    verified output equals brute force (the oracle) w.p. ~1. Scale path:
    candidates ~ colliding pairs only — never the n^2 cross join."""
    from data_pipeline_platform_spark.sources.readers import spread_scan

    docs = spread_scan(_docs(spark, sf_dir).select("doc_id", "text"))
    # persist: the shingle set feeds (a) both sides of the band self-join
    # and (b) the verification join — without a persist the text-split +
    # hash subtree executes four times (Spark self-joins don't share
    # uncached subplans). At cluster scale this is a materialized
    # signatures table.
    sh = tracked_persist(
        nonempty_shingled(docs).select("doc_id", "shingles")
    )
    bands = lsh_band_keys(sh)

    # candidates via ONE shuffle: group docs per (band, sig) bucket and
    # expand in-bucket pairs with a higher-order expression. A self-join
    # would shuffle the bands frame on both sides (and force a persist to
    # avoid recomputing the signature subtree); the groupBy moves the
    # same bytes once. Bucket sizes are the LSH collision sets — small by
    # construction — so the m(m-1)/2 expansion stays tiny; a pathological
    # hot bucket means the banding parameters are wrong, not the plan.
    candidates = (
        bands.groupBy("band", "sig")
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
        .distinct()
    )

    # verify candidates with the exact metric
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            * F.lit(1.0)
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
    )


ORACLE_DEDUP_MINHASH_LSH = f"""
WITH sh AS ({_DUCK_SHINGLES}),
nonempty AS (SELECT * FROM sh WHERE len(shingles) > 0),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.shingles, b.shingles)) * 1.0 /
         len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
  FROM nonempty a JOIN nonempty b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.8
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash64(tokens: list) -> int:
    """64-bit SimHash with a stable (process-independent) token hash."""
    import hashlib

    votes = [0] * 64
    for tok in tokens:
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for bit in range(64):
            votes[bit] += 1 if (h >> bit) & 1 else -1
    sig = 0
    for bit in range(64):
        if votes[bit] > 0:
            sig |= 1 << bit
    return sig - (1 << 63)  # to signed for LongType


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures + banded Hamming-distance pairs (<= 6 bits).

    Signature computation is a mapInPandas batch job (bit-level votes are
    awkward as Column exprs); banding on 16-bit chunks turns the pair
    search into 4 equi-joins — the scalable alternative to an n^2 XOR
    scan. Fully oracle-graded: the DuckDB twin rebuilds the md5 bit
    votes from hex nibbles (validated bit-identical to this kernel) and
    replays the banded candidate restriction."""
    from data_pipeline_platform_spark.sources.readers import spread_scan

    docs = spread_scan(_docs(spark, sf_dir).select("doc_id", "text"))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained kernel: everything defined inside the closure so
        # cloudpickle ships it by VALUE — workers need no import of this
        # package (external harnesses run drivers whose workers don't
        # have it on PYTHONPATH)
        import hashlib

        def simhash64(tokens):
            votes = [0] * 64
            for tok in tokens:
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                for bit in range(64):
                    votes[bit] += 1 if (h >> bit) & 1 else -1
            sig = 0
            for bit in range(64):
                if votes[bit] > 0:
                    sig |= 1 << bit
            return sig - (1 << 63)

        for pdf in batches:
            toks = pdf["text"].map(lambda t: t.split())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "simhash": toks.map(simhash64).astype("int64"),
                }
            )

    sig = docs.mapInPandas(compute, schema="doc_id long, simhash long")
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))

    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= 6)
        .select("doc_a", "doc_b", "hamming")
    )


# The md5-bit kernel IS SQL-expressible after all: per-token bits come out
# of the md5 hex string nibble-by-nibble (validated bit-identical to the
# Python kernel's int.from_bytes(md5[:8], 'big')), votes/banding/Hamming
# follow in plain SQL. The banded candidate restriction (share >= 1 exact
# 16-bit chunk) is replayed via EXISTS so the oracle grades exactly what
# the Spark query computes, including its recall contract.
ORACLE_DEDUP_SIMHASH = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
), bits AS (
  SELECT doc_id, b,
         ((strpos('0123456789abcdef', substr(md5(tok), 16 - b//4, 1)) - 1) >> (b % 4)) & 1 AS bit
  FROM toks, range(0, 64) r(b)
), votes AS (
  SELECT doc_id, b, SUM(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS v
  FROM bits GROUP BY 1, 2
), sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS HUGEINT) << b) ELSE CAST(0 AS HUGEINT) END)
              - (CAST(1 AS HUGEINT) << 63) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
), usig AS (
  SELECT doc_id, simhash,
         CAST(simhash AS HUGEINT) + CASE WHEN simhash < 0 THEN CAST(1 AS HUGEINT) << 64 ELSE 0 END AS u
  FROM sig
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM usig a JOIN usig b ON a.doc_id < b.doc_id
  WHERE EXISTS (SELECT 1 FROM range(0, 4) c(ci)
                WHERE ((a.u >> (ci*16)) & 65535) = ((b.u >> (ci*16)) & 65535))
)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 6
"""


# ---------------------------------------------------------------------------
# near-dup clustering (iterative connected components)
# ---------------------------------------------------------------------------

def connected_components(edges: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Min-label propagation over an undirected edge list
    (``src``/``dst`` long columns) until fixpoint.

    The iterative-algorithm pattern: each round is one join+aggregate
    plan; convergence is checked with a cheap count. Rounds needed =
    graph diameter (near-dup clusters are tiny, so 2-4 in practice).
    Labels are min doc ids — fully deterministic.

    Raises ``RuntimeError`` if the fixpoint isn't reached within
    ``max_iterations`` — a silent early stop would return WRONG
    components (two labels for one cluster) with no other symptom. A
    pathological long-path graph (diameter > max_iterations) is the only
    known trigger; raise the cap or pre-split such graphs."""
    from pyspark.sql import functions as F

    # repartition on the join key BEFORE caching: InMemoryTableScan
    # preserves its child's outputPartitioning, so every iteration's
    # neighbor join reads bidir already hash-partitioned on b and only
    # the (changing) labels side shuffles — halving per-round exchanges
    bidir = tracked_persist(
        edges.selectExpr("src AS a", "dst AS b")
        .unionByName(edges.selectExpr("dst AS a", "src AS b"))
        .distinct()
        .repartition("b")
    )
    labels = bidir.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    ).persist()

    converged = False
    prev_sum = None
    for _ in range(max_iterations):
        neighbor_min = (
            bidir.join(labels, bidir.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        # localCheckpoint (not persist): `labels` appears TWICE per round
        # (neighbor_min and the outer join), so an un-truncated logical
        # plan DOUBLES every iteration — 2^rounds plan nodes OOMs the
        # driver during analysis near round ~12 even on a 12-edge graph.
        # Checkpointing materializes the round's result and cuts lineage,
        # making plan size constant per round. eager=False (r14): the
        # convergence sum below is the round's first action and
        # materializes the checkpoint as a side effect — one Spark job
        # per round instead of two (checkpoint job + sum job).
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        # Min-propagation labels are monotone non-increasing, so the
        # label multiset changed iff its exact sum decreased — one cheap
        # aggregate over the checkpointed frame instead of a full
        # old-vs-new join per round. DECIMAL(38,0): overflow-proof for
        # any node count * id range this engine will meet.
        label_sum = new_labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels.unpersist()
        labels = new_labels
        if prev_sum is not None and label_sum == prev_sum:
            converged = True
            break
        prev_sum = label_sum
    if not converged:
        labels.unpersist()
        bidir.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (graph diameter exceeds the cap); labels would be "
            "WRONG — raise max_iterations for long-path graphs"
        )
    # the final labels frame stays cached until the caller materializes
    # the result; register it so release_tracked() can free it
    return tracked_persist(labels)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster near-duplicate documents: Jaccard >= 0.2 pairs -> connected
    components -> (doc_id, cluster) with cluster = min doc_id reachable."""
    pairs = _jaccard_pairs(_docs(spark, sf_dir), threshold=0.2)
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst")
    return connected_components(edges).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster")
    )


# Mirrors the stop-shingle cutoff exactly like ORACLE_DEDUP_NGRAM_JACCARD:
# candidates from sub-cutoff shingles only, exact Jaccard verified over
# the full shingle sets.
ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE sh AS ({_DUCK_SHINGLES}),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
live AS (
  SELECT s FROM ex GROUP BY s
  HAVING COUNT(*) > 1 AND COUNT(*) <= {STOP_SHINGLE_DF}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
),
pairs AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b,
           len(list_intersect(sa.shingles, sb.shingles)) AS shared,
           len(sa.shingles) AS na, len(sb.shingles) AS nb
    FROM cand
    JOIN sh sa ON doc_a = sa.doc_id
    JOIN sh sb ON doc_b = sb.doc_id
  ) WHERE shared * 1.0 / (na + nb - shared) >= 0.2
),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach AS (
  SELECT a, a AS b FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY a
"""


register("dedup_exact", q_dedup_exact, ORACLE_DEDUP_EXACT)
register("dedup_clusters", q_dedup_clusters, ORACLE_DEDUP_CLUSTERS)
register("dedup_ngram_jaccard", q_dedup_ngram_jaccard, ORACLE_DEDUP_NGRAM_JACCARD)
register("dedup_minhash_lsh", q_dedup_minhash_lsh, ORACLE_DEDUP_MINHASH_LSH)
register("dedup_simhash", q_dedup_simhash, ORACLE_DEDUP_SIMHASH)


# ---------------------------------------------------------------------------
# edit-distance verification (character-level near-dup confirmation)
# ---------------------------------------------------------------------------

LEV_CAND_JACCARD = 0.2  # shingle-Jaccard candidate screen


def q_dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup verification: for every candidate pair
    from the shingle inverted index (Jaccard >= 0.2 screen — the cheap
    set-level signal), compute the exact Levenshtein distance and the
    normalized edit similarity 1 - lev/max(len). Token-set measures
    (Jaccard, MinHash) are blind to within-token edits and reorderings;
    edit distance is the character-level ground truth a dedup pipeline
    verifies borderline pairs with.

    Exactness: Levenshtein is integer dynamic programming with unit
    costs — both engines return identical BIGINTs (verified against
    DuckDB's levenshtein); the similarity is one integer division
    rounded at 6 places.

    Plan shape at 100 TB: candidates come from the bounded inverted
    index (sum(df^2) with the stop-shingle cutoff), then the tiny pair
    frame broadcasts INTO two corpus scans to fetch texts — the O(n*m)
    per-pair DP runs only on screened pairs, never corpus x corpus."""
    docs = _docs(spark, sf_dir)
    pairs = _jaccard_pairs(docs, threshold=LEV_CAND_JACCARD).select("doc_a", "doc_b")
    t_a = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("__ta"))
    t_b = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("__tb"))
    return (
        t_a.join(F.broadcast(pairs), "doc_a")
        .join(t_b, "doc_b")
        .withColumn("lev", F.levenshtein("__ta", "__tb").cast("long"))
        .withColumn(
            "edit_sim",
            F.round(
                F.lit(1.0)
                - F.col("lev")
                / F.greatest(F.length("__ta"), F.length("__tb")),
                6,
            ),
        )
        .select("doc_a", "doc_b", "lev", "edit_sim")
    )


ORACLE_DEDUP_LEVENSHTEIN = f"""
WITH sh AS ({_DUCK_SHINGLES}),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
live AS (
  SELECT s FROM ex GROUP BY s
  HAVING COUNT(*) > 1 AND COUNT(*) <= {STOP_SHINGLE_DF}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
),
screened AS (
  SELECT doc_a, doc_b
  FROM cand
  JOIN sh sa ON doc_a = sa.doc_id
  JOIN sh sb ON doc_b = sb.doc_id
  WHERE len(list_intersect(sa.shingles, sb.shingles)) * 1.0
        / (len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles)))
        >= {LEV_CAND_JACCARD}
)
SELECT doc_a, doc_b,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
       round(1.0 - CAST(levenshtein(da.text, db.text) AS BIGINT)
               * 1.0 / greatest(length(da.text), length(db.text)), 6) AS edit_sim
FROM screened
JOIN documents da ON doc_a = da.doc_id
JOIN documents db ON doc_b = db.doc_id
"""


register("dedup_levenshtein", q_dedup_levenshtein, ORACLE_DEDUP_LEVENSHTEIN)


def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health report: near-dup pair counts per (source_a,
    source_b) — which sources duplicate INTO which. Cross-source
    concentrations mean one feed is mirroring another (drop or
    down-weight it); diagonal concentrations mean a feed self-duplicates
    (template/boilerplate pages). The per-pair machinery is the verified
    inverted-index Jaccard; this is its aggregate view, one extra
    group-agg over the (tiny) pair frame after two broadcast joins back
    to doc metadata."""
    docs = _docs(spark, sf_dir)
    pairs = _jaccard_pairs(docs, threshold=0.8).select("doc_a", "doc_b")
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b"))
    return (
        sa.join(F.broadcast(pairs), "doc_a")
        .join(sb, "doc_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


ORACLE_DEDUP_RATE_BY_SOURCE = f"""
WITH sh AS ({_DUCK_SHINGLES}),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
live AS (
  SELECT s FROM ex GROUP BY s
  HAVING COUNT(*) > 1 AND COUNT(*) <= {STOP_SHINGLE_DF}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
),
verified AS (
  SELECT doc_a, doc_b
  FROM cand
  JOIN sh sa ON doc_a = sa.doc_id
  JOIN sh sb ON doc_b = sb.doc_id
  WHERE len(list_intersect(sa.shingles, sb.shingles)) * 1.0
        / (len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles))) >= 0.8
)
SELECT da.source AS source_a, db.source AS source_b, COUNT(*) AS n_pairs
FROM verified
JOIN documents da ON doc_a = da.doc_id
JOIN documents db ON doc_b = db.doc_id
GROUP BY da.source, db.source
"""


register("dedup_rate_by_source", q_dedup_rate_by_source, ORACLE_DEDUP_RATE_BY_SOURCE)


def q_dedup_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words dedup: two documents with the same *vocabulary
    support* (sorted distinct token set) are treated as duplicates even
    when token ORDER differs — the permutation/shuffle near-dup class
    that exact-hash dedup (`dedup_exact`) misses and MinHash only
    catches probabilistically. Key = md5 of the sorted distinct tokens;
    one row per group with the surviving (minimum) doc_id and the
    duplicate multiplicity.

    Scale: the key is a row-local array_sort + hash (codegen); the only
    shuffle is the groupBy on a 128-bit uniformly distributed key — the
    same one-shuffle shape as dedup_exact, skew-free by construction.
    """
    docs = _docs(spark, sf_dir)
    keyed = docs.withColumn(
        "bow_key",
        F.md5(
            F.expr(
                "concat_ws(' ', array_sort(array_distinct(split(trim(text), '\\\\s+'))))"
            )
        ),
    )
    return keyed.groupBy("bow_key").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


ORACLE_DEDUP_BOW = r"""
WITH k AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(
             string_split_regex(trim(text), '\s+'))), ' ')) AS bow_key
  FROM documents
)
SELECT bow_key, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM k GROUP BY bow_key
"""


register("dedup_bow", q_dedup_bow, ORACLE_DEDUP_BOW)


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: among each near-dup cluster's
    members keep the BEST copy — longest version wins (the standard
    corpus-dedup keep policy; boilerplate-trimmed copies lose to the
    full document), ties broken on doc_id. Composes the verified
    connected-components clustering with a per-cluster argmax window.

    Scale: the clusters frame is pair-derived (tiny next to the
    corpus); the token counts join back on doc_id and the argmax
    windows partition by cluster — both keys well-distributed, nothing
    corpus-squared."""
    from pyspark.sql.window import Window

    clusters = q_dedup_clusters(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr("CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)").alias(
            "token_count"
        ),
    )
    joined = clusters.join(docs, "doc_id")
    w = Window.partitionBy("cluster").orderBy(
        F.col("token_count").desc(), F.col("doc_id")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members", F.count(F.lit(1)).over(Window.partitionBy("cluster"))
        )
        .filter(F.col("rn") == 1)
        .select(
            "cluster",
            F.col("doc_id").alias("keep_doc_id"),
            "token_count",
            "n_members",
        )
    )


ORACLE_DEDUP_KEEP_BEST = f"""
WITH clusters AS ({ORACLE_DEDUP_CLUSTERS}),
tc AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS token_count
  FROM documents
),
j AS (
  SELECT c.cluster, c.doc_id, t.token_count
  FROM clusters c JOIN tc t USING (doc_id)
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY token_count DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY cluster) AS n_members
  FROM j
)
SELECT cluster, doc_id AS keep_doc_id, token_count, n_members
FROM r WHERE rn = 1
"""


register("dedup_keep_best", q_dedup_keep_best, ORACLE_DEDUP_KEEP_BEST)


# threshold 0.9 evaluates as the exact integer test shared*10 >= small*9


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup screen: SMALL documents embedded in larger
    ones. Jaccard misses a quote or excerpt whose host is much longer
    (|A∩B|/|A∪B| shrinks with the size gap); containment
    |A∩B| / |smaller| >= 0.9 catches exactly that excerpt-duplication
    case — the "this doc is mostly a copy of part of that doc" signal.

    Same scale posture as `_jaccard_pairs`: candidates come from the
    stop-shingle-bounded inverted index (one shuffle, in-bucket
    row-local pair expansion), the exact containment verifies on
    candidates only. The contained/container orientation resolves
    row-locally from shingle-set sizes (ties by doc id)."""
    from data_pipeline_platform_spark.sources.readers import spread_scan

    sh = tracked_persist(
        with_shingles(spread_scan(_docs(spark, sf_dir))).select("doc_id", "shingles")
    )
    exploded = sh.select("doc_id", F.explode("shingles").alias("s"))
    cand = (
        exploded.groupBy("s")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= STOP_SHINGLE_DF))
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
        .distinct()
    )
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("shared", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "contained_doc",
            F.expr(
                "CASE WHEN size(sh_a) < size(sh_b) OR "
                "(size(sh_a) = size(sh_b) AND doc_a < doc_b) THEN doc_a ELSE doc_b END"
            ),
        )
        .withColumn(
            "container_doc",
            F.expr("CASE WHEN contained_doc = doc_a THEN doc_b ELSE doc_a END"),
        )
        .withColumn("small_size", F.least(F.size("sh_a"), F.size("sh_b")))
        .filter(
            (F.col("small_size") > 0)
            & (F.col("shared") * 10 >= F.col("small_size") * 9)
        )
        .select(
            "contained_doc",
            "container_doc",
            F.col("shared").cast("bigint").alias("shared"),
            F.expr(
                "round(CAST(shared AS DOUBLE) / small_size, 6)"
            ).alias("containment"),
        )
    )


# exact-containment brute force is the oracle (the banded candidate
# restriction loses pairs only when NO shared shingle is sub-cutoff —
# same recall contract as ORACLE_DEDUP_MINHASH_LSH, non-binding at the
# shipped SFs where max shingle df << cutoff)
ORACLE_DEDUP_CONTAINMENT = f"""
WITH sh AS ({_DUCK_SHINGLES}),
nonempty AS (SELECT * FROM sh WHERE len(shingles) > 0),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.shingles, b.shingles)) AS shared,
         len(a.shingles) AS na, len(b.shingles) AS nb
  FROM nonempty a JOIN nonempty b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.shingles, b.shingles)) > 0
), oriented AS (
  SELECT CASE WHEN na < nb OR (na = nb AND doc_a < doc_b)
              THEN doc_a ELSE doc_b END AS contained_doc,
         CASE WHEN na < nb OR (na = nb AND doc_a < doc_b)
              THEN doc_b ELSE doc_a END AS container_doc,
         shared, least(na, nb) AS small_size
  FROM pairs
)
SELECT contained_doc, container_doc, CAST(shared AS BIGINT) AS shared,
       round(CAST(shared AS DOUBLE) / small_size, 6) AS containment
FROM oriented
WHERE shared * 10 >= small_size * 9
"""

register("dedup_containment", q_dedup_containment, ORACLE_DEDUP_CONTAINMENT)


def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup severity profile: the histogram of near-dup cluster sizes
    (how many clusters of 2, of 3, ... — the one-glance view of whether
    duplication is pairwise noise or mirror-site pathology). Composes
    the verified `dedup_clusters`; two |clusters|-sized aggregations on
    top, nothing fact-sized. Oracle nests the recursive-CTE clusters
    SQL verbatim."""
    clusters = q_dedup_clusters(spark, sf_dir)
    return (
        clusters.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("sz"))
        .groupBy(F.col("sz").alias("cluster_size"))
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .filter(F.col("cluster_size") >= 2)  # singletons are non-dups
    )


ORACLE_DEDUP_CLUSTER_SIZES = f"""
WITH cl AS MATERIALIZED ({ORACLE_DEDUP_CLUSTERS})
SELECT cluster_size, COUNT(*) AS n_clusters FROM (
  SELECT cluster, COUNT(*) AS cluster_size FROM cl GROUP BY 1
) WHERE cluster_size >= 2
GROUP BY 1
"""

register("dedup_cluster_sizes", q_dedup_cluster_sizes, ORACLE_DEDUP_CLUSTER_SIZES)


def q_simhash_jaccard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Screen-vs-truth calibration for the SimHash dedup screen: for
    every candidate pair the screen emits (hamming <= 6), compute the
    EXACT shingle Jaccard and aggregate per hamming distance — the
    curve that tells a dedup owner what a hamming threshold actually
    means in Jaccard terms before they tune it.

    Shape: the screened pairs are the bounded candidate set (banded
    16-bit chunks, never n²); the exact verify joins the shingle frame
    twice on doc id; the curve is a <= 7-row aggregation."""
    pairs = q_dedup_simhash(spark, sf_dir)
    sh = tracked_persist(
        with_shingles(_docs(spark, sf_dir)).select("doc_id", "shingles")
    )
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    scored = (
        pairs.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("shared", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size("sh_a") + F.size("sh_b") - F.col("shared"))
        .withColumn(
            "jac_fp",
            F.expr(
                "CASE WHEN uni = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST(round(CAST(shared AS DOUBLE) / uni * 1000000) AS BIGINT) END"
            ),
        )
    )
    return scored.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("round(CAST(SUM(jac_fp) AS DOUBLE) / 1000000 / COUNT(*), 6)").alias(
            "mean_jaccard"
        ),
        F.sum(F.expr("CAST(jac_fp >= 800000 AS INT)"))
        .cast("bigint")
        .alias("true_near_dups"),
    )


ORACLE_SIMHASH_JACCARD_CURVE = f"""
WITH pairs AS MATERIALIZED ({ORACLE_DEDUP_SIMHASH}),
sh2 AS MATERIALIZED ({_DUCK_SHINGLES}),
scored AS (
  SELECT p.hamming,
         len(list_intersect(a.shingles, b.shingles)) AS shared,
         len(a.shingles) + len(b.shingles)
           - len(list_intersect(a.shingles, b.shingles)) AS uni
  FROM pairs p
  JOIN sh2 a ON a.doc_id = p.doc_a
  JOIN sh2 b ON b.doc_id = p.doc_b
), fp AS (
  SELECT hamming,
         CASE WHEN uni = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(round(CAST(shared AS DOUBLE) / uni * 1000000) AS BIGINT)
         END AS jac_fp
  FROM scored
)
SELECT hamming, COUNT(*) AS n_pairs,
       round(CAST(SUM(jac_fp) AS DOUBLE) / 1000000 / COUNT(*), 6) AS mean_jaccard,
       CAST(SUM(CASE WHEN jac_fp >= 800000 THEN 1 ELSE 0 END) AS BIGINT)
         AS true_near_dups
FROM fp GROUP BY hamming
"""

register("simhash_jaccard_curve", q_simhash_jaccard_curve, ORACLE_SIMHASH_JACCARD_CURVE)
