"""Pipeline orchestration (SURVEY.md §2.12, §3).

Reference (src/pipeline/workers/tasks.py:52-475): Celery chains
ingest_task -> transform_task -> persist_task, pickling the whole pandas
DataFrame through Redis at every boundary (tasks.py:478-502).

Spark restatement: one *lazy* DataFrame threads through the stages — the
"stage boundary" is a Python object hand-off with zero serialization, and
Catalyst optimizes across the entire ingest+transform+persist plan (e.g. a
transform filter is pushed into the ingest scan). Only the final persist
triggers execution. Stage result dicts keep the reference's shape
(``{status, row_count, columns, pipeline_id, data_id}``) so callers of the
old API see identical payloads.

Concurrency: the reference's 4-worker Celery parallelism maps to Spark's
own task parallelism; for concurrent *pipelines*, run() is thread-safe and
a FAIR scheduler pool can be set per thread.
"""

from __future__ import annotations

import hashlib
import time
import traceback
import uuid
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_platform_spark.operators.code_transformer import CodeTransformer
from data_pipeline_platform_spark.operators.config_transformer import ConfigTransformer
from data_pipeline_platform_spark.operators.sql_transformer import SQLTransformer
from data_pipeline_platform_spark.sinks.writers import BatchWriter, WriteStrategy
from data_pipeline_platform_spark.sources.readers import BatchIngestor
from data_pipeline_platform_spark.utils.idempotency import IdempotencyManager
from data_pipeline_platform_spark.utils.logging import pipeline_context, stage_context


def compute_data_id(df: DataFrame, sample_rows: int = 100) -> str:
    """SHA-256[:16] of schema + a bounded row sample (reference
    tasks.py:505-517 hashes columns + dtypes + a 100-row sample)."""
    h = hashlib.sha256()
    h.update(df.schema.json().encode())
    for row in df.limit(sample_rows).collect():
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()[:16]


class PipelineRunner:
    """Execute ingest -> transform -> persist from a config dict (O4)."""

    def __init__(
        self,
        spark: SparkSession,
        writer: Optional[BatchWriter] = None,
        idempotency: Optional[IdempotencyManager] = None,
    ):
        self.spark = spark
        self.ingestor = BatchIngestor(spark)
        self.sql_transformer = SQLTransformer(spark)
        self.config_transformer = ConfigTransformer()
        self.code_transformer = CodeTransformer()
        self.writer = writer or BatchWriter(spark)
        self.idempotency = idempotency
        self._runs: Dict[str, Dict[str, Any]] = {}
        self._counters = {"succeeded": 0, "failed": 0}

    # -- O1 ingest stage --------------------------------------------------
    def ingest_stage(self, config: Dict[str, Any]) -> DataFrame:
        query = config.get("query")
        if query:
            return self.ingestor.ingest(query, config.get("parameters"))
        path = config.get("path")
        fmt = config.get("format", "parquet")
        if not path:
            raise ValueError("ingestion config requires 'query' or 'path'")
        if fmt == "parquet":
            return self.ingestor.read_parquet(path)
        if fmt == "csv":
            return self.ingestor.read_csv(path, **config.get("options", {}))
        if fmt == "json":
            return self.ingestor.read_json(path, **config.get("options", {}))
        if fmt == "jdbc":
            return self.ingestor.read_jdbc(**config.get("options", {}))
        if fmt == "orc":
            return self.ingestor.read_orc(path, **config.get("options", {}))
        if fmt == "text":
            return self.ingestor.read_text(path, **config.get("options", {}))
        raise ValueError(f"unsupported ingestion format: {fmt!r}")

    # -- O2 transform stage (dispatch parity: tasks.py:205-225) ----------
    def transform_stage(self, df: DataFrame, config: Dict[str, Any]) -> DataFrame:
        ttype = config.get("type", "sql")
        if ttype == "sql":
            return self.sql_transformer.transform(
                df,
                config["query"],
                table_name=config.get("table_name", "input_data"),
                parameters=config.get("parameters"),
            )
        if ttype == "config":
            cfg = config.get("config")
            if cfg is None and config.get("config_path"):
                cfg = ConfigTransformer.load_config(config["config_path"])
            return self.config_transformer.transform(df, cfg or {})
        if ttype == "code":
            return self.code_transformer.transform(
                df, config["function"], **config.get("kwargs", {})
            )
        raise ValueError(f"unsupported transformation type: {ttype!r}")

    # -- O3 persist stage -------------------------------------------------
    def persist_stage(self, df: DataFrame, config: Dict[str, Any]) -> Dict[str, Any]:
        strategy = WriteStrategy.from_string(config.get("strategy", "insert"))
        return self.writer.write(
            df,
            config["table"],
            strategy=strategy,
            schema=config.get("schema"),
            upsert_keys=config.get("upsert_keys"),
            partition_by=config.get("partition_by"),
        )

    # -- O4 full pipeline -------------------------------------------------
    def run(self, config: Dict[str, Any], pipeline_id: Optional[str] = None) -> Dict[str, Any]:
        """Chain the three stages; result dict shape mirrors
        reference tasks.py:457-475 including error form."""
        pid = pipeline_id or uuid.uuid4().hex[:12]
        started = time.time()

        if self.idempotency is not None:
            key = self.idempotency.make_key("pipeline", config)
            if not self.idempotency.check_and_set(key):
                cached = self.idempotency.get_result(key)
                if cached is not None:
                    return cached

        with pipeline_context(pid):
            try:
                with stage_context("ingestion"):
                    df = self.ingest_stage(config.get("ingestion", {}))
                    ingest_result = {"status": "success", "columns": df.columns}
                with stage_context("transformation"):
                    if "transformation" in config:
                        df = self.transform_stage(df, config["transformation"])
                    transform_result = {"status": "success", "columns": df.columns}
                with stage_context("persistence"):
                    if "persistence" in config:
                        stat = self.persist_stage(df, config["persistence"])
                        row_count = stat["rows_written"]
                    else:
                        row_count = df.count()
                        stat = {"rows_written": row_count}
                result = {
                    "status": "success",
                    "pipeline_id": pid,
                    "row_count": row_count,
                    "duration": time.time() - started,
                    "stages": {
                        "ingestion": ingest_result,
                        "transformation": transform_result,
                        "persistence": {"status": "success", **stat},
                    },
                }
                self._counters["succeeded"] += 1
            except Exception as exc:
                self._counters["failed"] += 1
                result = {
                    "status": "error",
                    "pipeline_id": pid,
                    "error": str(exc),
                    "traceback": traceback.format_exc(),
                    "duration": time.time() - started,
                }
                if self.idempotency is not None:
                    self.idempotency.clear(key)
                self._runs[pid] = result
                self._log_run(result)
                return result

        if self.idempotency is not None:
            self.idempotency.store_result(key, result)
        self._runs[pid] = result
        self._log_run(result)
        return result

    # -- durable run log (lets `pipeline-cli status` work cross-process,
    # like the reference's Celery result backend did) --------------------
    def _log_run(self, result: Dict[str, Any]) -> None:
        import json
        import os

        try:
            runs_dir = os.path.join(self.writer.base_path, "_runs")
            os.makedirs(runs_dir, exist_ok=True)
            with open(os.path.join(runs_dir, f"{result['pipeline_id']}.json"), "w") as f:
                json.dump({k: v for k, v in result.items() if k != "traceback"}, f, default=str)
        except OSError:
            pass  # the run log is advisory; never fail the pipeline for it

    def load_run(self, pipeline_id: str) -> Optional[Dict[str, Any]]:
        """Cross-process status lookup from the run log."""
        import json
        import os

        path = os.path.join(self.writer.base_path, "_runs", f"{pipeline_id}.json")
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    # -- dry-run: show the composed plan without executing ---------------
    def explain(self, config: Dict[str, Any], mode: str = "formatted") -> str:
        """Build ingest+transform as ONE lazy plan and return Catalyst's
        explanation — no data moves. Only possible because stages
        compose lazily (the reference executes eagerly at every stage,
        so it has nothing comparable)."""
        import contextlib
        import io

        df = self.ingest_stage(config.get("ingestion", {}))
        if "transformation" in config:
            df = self.transform_stage(df, config["transformation"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()

    # -- O5 optional checkpoint (the reference pickles every stage; here
    # checkpointing is opt-in and goes to parquet, not the driver) -------
    def checkpoint(self, df: DataFrame, name: Optional[str] = None) -> DataFrame:
        """Materialize an intermediate frame to parquet and return the
        re-read (cuts lineage for iterative pipelines; the Spark-native
        replacement for the reference's pickle-through-Redis hand-off,
        tasks.py:478-502)."""
        name = name or f"__checkpoint_{uuid.uuid4().hex[:8]}"
        path = f"{self.writer.base_path}/checkpoints/{name}"
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    # -- O10 health/status ------------------------------------------------
    def get_status(self, pipeline_id: str) -> Optional[Dict[str, Any]]:
        return self._runs.get(pipeline_id)

    def health(self) -> Dict[str, Any]:
        total = self._counters["succeeded"] + self._counters["failed"]
        return {
            "is_healthy": True,
            "pipelines_run": total,
            "succeeded": self._counters["succeeded"],
            "failed": self._counters["failed"],
            "success_rate": (self._counters["succeeded"] / total) if total else 1.0,
            "spark_version": self.spark.version,
        }
