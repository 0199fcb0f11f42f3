"""Environment-variable driven settings.

Mirrors the reference's Settings surface (reference:
src/pipeline/config/settings.py:12-184 — BATCH_SIZE, MAX_RETRIES,
RETRY_BACKOFF_BASE, DB/Redis URLs, pool sizes, worker concurrency) and adds
the Spark-relevant knobs. Celery/Redis/pool knobs that have no Spark
equivalent are kept as documented no-ops so existing configs keep loading.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except (TypeError, ValueError):
        return default


def _env_float(name: str, default: float) -> float:
    try:
        return float(os.environ.get(name, default))
    except (TypeError, ValueError):
        return default


def _env_bool(name: str, default: bool) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in ("1", "true", "yes", "on")


@dataclass
class Settings:
    """Runtime configuration, resolved from the environment at construction.

    Reference parity (settings.py:43-76): batch sizes, retry policy, worker
    concurrency. Spark additions: master, shuffle partitions, AQE, ANSI mode
    (kept off to preserve the reference's lenient coerce-to-null casts —
    SURVEY.md §7 "what's hard" #2), session timezone (UTC so timestamps
    round-trip identically against file data and the DuckDB oracle).
    """

    # --- reference-parity knobs ---
    batch_size: int = field(default_factory=lambda: _env_int("BATCH_SIZE", 10_000))
    chunk_size: int = field(default_factory=lambda: _env_int("DEFAULT_CHUNK_SIZE", 10_000))
    max_retries: int = field(default_factory=lambda: _env_int("MAX_RETRIES", 3))
    retry_delay: float = field(default_factory=lambda: _env_float("RETRY_DELAY", 1.0))
    retry_backoff_base: float = field(default_factory=lambda: _env_float("RETRY_BACKOFF_BASE", 2.0))
    source_db_url: str = field(default_factory=lambda: _env("SOURCE_DB_URL", ""))
    dest_db_url: str = field(default_factory=lambda: _env("DEST_DB_URL", ""))
    worker_concurrency: int = field(default_factory=lambda: _env_int("WORKER_CONCURRENCY", 4))
    idempotency_enabled: bool = field(default_factory=lambda: _env_bool("IDEMPOTENCY_ENABLED", True))
    idempotency_ttl_days: int = field(default_factory=lambda: _env_int("IDEMPOTENCY_TTL_DAYS", 7))

    # --- Spark knobs ---
    spark_master: str = field(
        default_factory=lambda: _env(
            "SPARK_MASTER", f"local[{_env('SPARK_GRAFT_CPUS', '32')}]"
        )
    )
    shuffle_partitions: int = field(
        default_factory=lambda: _env_int("SPARK_SHUFFLE_PARTITIONS", 32)
    )
    adaptive_enabled: bool = field(default_factory=lambda: _env_bool("SPARK_AQE", True))
    ansi_enabled: bool = field(default_factory=lambda: _env_bool("SPARK_ANSI", False))
    session_timezone: str = field(default_factory=lambda: _env("SPARK_SESSION_TZ", "UTC"))
    driver_memory: str = field(default_factory=lambda: _env("SPARK_DRIVER_MEMORY", "8g"))
    max_partition_bytes: str = field(
        default_factory=lambda: _env("SPARK_MAX_PARTITION_BYTES", "134217728")
    )
    # AQE partition-coalescing floor (spark.sql.adaptive.coalescePartitions
    # .minPartitionSize), kept at Spark's 1 MiB default. r13 shipped a
    # 256 KiB floor after an A/B on ~10 queries; the r14 full-headline
    # interleaved A/B (tools/ab_env.py, 83 queries x 2 rounds x 2 trials,
    # /tmp + OPTIMIZATION_r14.md) found it a net LOSS: geomean 1.03-1.05x
    # SLOWER, with the iterative/multi-commit paths it never swept
    # (pagerank, dedup_incremental_lsh, dv_delete, cdc_tombstone)
    # regressing far more than the CPU-dense verify stages gained — a
    # 4x task-count multiplier on tiny exchanges is pure scheduling
    # overhead for multi-job fixtures. The one robust winner
    # (training_data_pipeline's candidate-verify stage) keeps its
    # parallelism floor-independently: functions/dedup.py pins the
    # candidate exchange with an explicit shuffle-partition-count
    # repartition, which AQE never coalesces. Value is a plain-byte
    # numeric string like its siblings (r13 advisor).
    aqe_min_partition_size: str = field(
        default_factory=lambda: _env("SPARK_AQE_MIN_PARTITION_SIZE", "1048576")
    )
    broadcast_threshold: str = field(
        default_factory=lambda: _env("SPARK_BROADCAST_THRESHOLD", "67108864")
    )
    warehouse_dir: str = field(
        default_factory=lambda: _env("SPARK_WAREHOUSE_DIR", "/tmp/dpps-warehouse")
    )

    def spark_conf(self) -> dict[str, Any]:
        """Spark conf dict applied by the session factory."""
        return {
            "spark.sql.shuffle.partitions": str(self.shuffle_partitions),
            "spark.sql.adaptive.enabled": str(self.adaptive_enabled).lower(),
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": (
                self.aqe_min_partition_size
            ),
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.ansi.enabled": str(self.ansi_enabled).lower(),
            "spark.sql.session.timeZone": self.session_timezone,
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.sql.files.maxPartitionBytes": self.max_partition_bytes,
            "spark.sql.autoBroadcastJoinThreshold": self.broadcast_threshold,
            "spark.sql.parquet.compression.codec": "snappy",
            # events.parquet stores ts as TIMESTAMP(NANOS); Spark 4 rejects
            # nanos natively — read as long and normalize in load_table
            "spark.sql.legacy.parquet.nanosAsLong": "true",
            "spark.driver.memory": self.driver_memory,
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": self.warehouse_dir,
            # File-output commit cost (guide §6 / §1.2: the ACID fixture
            # paths are commit-bound — 6+ staged parquet writes per
            # maintained-view build, measured 0.3-0.7s each at sf0.1, and
            # the v1 committer's job-commit pays one sequential driver-
            # side rename per task file plus a _SUCCESS marker nothing
            # reads). Algorithm v2 renames task output directly at task
            # commit; the marker is skipped. Safe here BY CONSTRUCTION:
            # every table write stages into a private uuid-named dir and
            # only becomes visible via the ACID log's atomic version
            # publish, so the committer's weaker job-commit atomicity is
            # never load-bearing (readers glob the staged files, never
            # _SUCCESS). Interleaved A/B on matview_percentile_census:
            # 9.86 -> 9.03s median of 3 alternating pairs.
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
            "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs": (
                "false"
            ),
        }


settings = Settings()
