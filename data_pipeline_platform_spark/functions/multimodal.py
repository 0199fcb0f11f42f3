"""Multimodal column plumbing (M8 extension): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The container has no image/audio codecs, so the decode kernels are
STUBBED (deterministic fakes clearly marked) — but everything Spark-side
is real and tested: schemas, batch iteration, partition sizing, UDF
signatures, and the metadata extraction that runs before any decode.

Scale design: binary payloads dominate partition size, so operators that
carry blobs repartition by target partition *bytes* not row count
(``repartition_for_blobs``); feature extraction drops the blob column as
early as possible so downstream shuffles move only features.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, byte_entropy double, mean_byte double, embedding array<float>"
)


def repartition_for_blobs(
    df: DataFrame,
    avg_blob_bytes: int,
    target_partition_bytes: int = 128 << 20,
    n_rows: Optional[int] = None,
) -> DataFrame:
    """Partition by payload volume: rows-per-partition chosen so one Arrow
    batch stays within executor memory even when each row carries MBs.

    Pass ``n_rows`` when known (catalog stats, a prior Observation, the
    manifest of an ingest batch) — otherwise this triggers a counting
    action over ``df`` mid-pipeline, an acceptable one-off for a sizing
    heuristic but a full extra scan of the upstream plan."""
    rows_per_partition = max(1, target_partition_bytes // max(1, avg_blob_bytes))
    if n_rows is None:
        n_rows = df.count()
    n_parts = max(1, (n_rows + rows_per_partition - 1) // rows_per_partition)
    return df.repartition(n_parts)


def _decode_image_stub(content: bytes) -> np.ndarray:
    """STUB — real impl: PIL/opencv decode. Container lacks codecs, so:
    deterministic fake 'pixels' derived from the bytes (stable across
    runs/executors, good enough to exercise downstream plumbing)."""
    arr = np.frombuffer(content[:1024] if content else b"\x00", dtype=np.uint8)
    return arr.astype(np.float32)


def _resize_stub(pixels: np.ndarray, size: int = 64) -> np.ndarray:
    """STUB — real impl: interpolated resize; here: pad/trim to length."""
    out = np.zeros(size, dtype=np.float32)
    out[: min(size, len(pixels))] = pixels[:size]
    return out


def extract_image_features(df: DataFrame) -> DataFrame:
    """Binary -> features via one mapInPandas pass; drops the blob column
    in the same stage so only (id, stats, embedding) ever shuffles."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_bytes, entropy, mean_b, embs = [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                counts = np.bincount(
                    np.frombuffer(raw, dtype=np.uint8), minlength=256
                ) if raw else np.zeros(256)
                p = counts / counts.sum() if counts.sum() else counts
                ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
                pixels = _decode_image_stub(raw)
                emb = _resize_stub(pixels)
                norm = np.linalg.norm(emb)
                if norm > 0:
                    emb = emb / norm
                ids.append(mid)
                n_bytes.append(len(raw))
                entropy.append(ent)
                mean_b.append(float(np.mean(pixels)) if len(pixels) else 0.0)
                embs.append(emb.tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": n_bytes,
                    "byte_entropy": entropy,
                    "mean_byte": mean_b,
                    "embedding": embs,
                }
            )

    return df.select("media_id", "content").mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, frame_decoder: Optional[Callable] = None
) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled timestamp. The
    decoder is pluggable; default STUB yields a content-derived token
    per frame (real impl: ffmpeg/pyav seek+decode)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                duration = row["duration_ms"] or 0
                raw = bytes(row["content"]) if row["content"] is not None else b""
                for t in range(0, int(duration), every_ms):
                    if frame_decoder is not None:
                        token = frame_decoder(raw, t)
                    else:
                        # STUB frame token: deterministic slice checksum
                        lo = t % max(1, len(raw)) if raw else 0
                        token = int(sum(raw[lo : lo + 64]) % 2**31)
                    out_rows.append(
                        {"media_id": row["media_id"], "frame_ts_ms": t, "frame_token": token}
                    )
            yield pd.DataFrame(
                out_rows, columns=["media_id", "frame_ts_ms", "frame_token"]
            )

    return df.select("media_id", "duration_ms", "content").mapInPandas(
        kernel, schema="media_id long, frame_ts_ms long, frame_token long"
    )


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Pure-Column metadata profile — no decode, runs at full scan speed."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.avg(F.length("content")).alias("avg_bytes"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )


def make_fake_media_df(spark, n: int = 32) -> DataFrame:
    """Deterministic in-repo media fixture (no external data needed)."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        content = bytes(rng.getrandbits(8) for _ in range(256 + (i % 5) * 128))
        rows.append(
            (
                i,
                kind,
                content,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i if kind == "image" else None,
                48 + i if kind == "image" else None,
                3000 + 500 * i if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# driver-graded end-to-end run of the binary plumbing
# ---------------------------------------------------------------------------

BYTE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, head_checksum long, mean_head_byte double, "
    "head_preview string"
)


def extract_byte_features(df: DataFrame) -> DataFrame:
    """Binary -> integer-exact byte features in ONE Arrow-batched
    mapInPandas pass (blob dropped in-stage, same shape as
    extract_image_features): payload size, checksum and mean of the
    first 64 bytes, and the first 8 bytes as a typed array. Features
    are integers (plus one exact division), so a SQL oracle can replay
    them bitwise — which is how the stubbed-decode plumbing still gets
    hash-graded end-to-end."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_bytes, checksums, means, heads = [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                head64 = np.frombuffer(raw[:64], dtype=np.uint8)
                csum = int(head64.sum())
                ids.append(mid)
                n_bytes.append(len(raw))
                checksums.append(csum)
                means.append(csum / max(1, len(head64)))
                heads.append(",".join(str(int(b)) for b in raw[:8]))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": n_bytes,
                    "head_checksum": checksums,
                    "mean_head_byte": means,
                    "head_preview": heads,
                }
            )

    return df.select("media_id", "content").mapInPandas(
        kernel, schema=BYTE_FEATURES_SCHEMA
    )


def q_multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing under the correctness gate: the documents'
    UTF-8 bytes stand in for media blobs (the corpus is pure ASCII, so
    DuckDB replays every byte via ascii()), and the features flow
    through the real binary mapInPandas path — schema, Arrow batching,
    blob-dropped-early projection — not a test double."""
    from data_pipeline_platform_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
    )
    return extract_byte_features(media)


ORACLE_MULTIMODAL_BYTE_FEATURES = """
SELECT doc_id AS media_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(list_sum(list_transform(generate_series(1, least(64, strlen(text))),
                                    i -> ascii(text[i]))) AS BIGINT) AS head_checksum,
       CAST(list_sum(list_transform(generate_series(1, least(64, strlen(text))),
                                    i -> ascii(text[i]))) AS BIGINT) * 1.0
         / greatest(1, least(64, strlen(text))) AS mean_head_byte,
       array_to_string(list_transform(generate_series(1, least(8, strlen(text))),
                                       i -> ascii(text[i])), ',') AS head_preview
FROM documents
"""


from data_pipeline_platform_spark.functions import register

register(
    "multimodal_byte_features",
    q_multimodal_byte_features,
    ORACLE_MULTIMODAL_BYTE_FEATURES,
)
