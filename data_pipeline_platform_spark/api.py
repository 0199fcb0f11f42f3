"""REST API (SURVEY.md §2.12 O12; reference src/pipeline/api/main.py:117-455).

FastAPI surface over the PipelineRunner: submit returns a pipeline_id,
status polls the run registry — the same contract as the reference's
Celery-backed endpoints, minus the broker (pipelines execute on a
background thread pool; Spark's FAIR scheduler interleaves them).

FastAPI is not installed in this container, so the module import-gates it:
``create_app()`` raises a clear error without fastapi, and the route
handlers are plain functions that are fully testable without HTTP.
"""

from __future__ import annotations

import threading
import uuid
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional

try:
    from fastapi import FastAPI, HTTPException

    HAS_FASTAPI = True
except ImportError:  # pragma: no cover - container has no fastapi
    FastAPI = None  # type: ignore
    HTTPException = None  # type: ignore
    HAS_FASTAPI = False


class PipelineService:
    """Transport-agnostic handlers (the testable core of the API)."""

    def __init__(self, runner, max_workers: int = 4):
        # max_workers mirrors the reference's WORKER_CONCURRENCY=4
        self.runner = runner
        self._pool = ThreadPoolExecutor(max_workers=max_workers)
        self._futures: Dict[str, Any] = {}
        self._lock = threading.Lock()

    # POST /pipelines (reference api/main.py:169-198)
    def submit_pipeline(self, pipeline_config: Dict[str, Any]) -> Dict[str, Any]:
        pipeline_id = uuid.uuid4().hex[:12]

        def _run() -> Dict[str, Any]:
            # each pipeline gets its own FAIR pool so one long pipeline
            # can't starve the others (set spark.scheduler.mode=FAIR to
            # activate; local properties are per-thread, matching the
            # thread-per-pipeline model here)
            sc = getattr(self.runner.spark, "sparkContext", None)
            if sc is not None:
                sc.setLocalProperty("spark.scheduler.pool", f"pipeline_{pipeline_id}")
            try:
                return self.runner.run(pipeline_config, pipeline_id)
            finally:
                if sc is not None:
                    sc.setLocalProperty("spark.scheduler.pool", None)

        future = self._pool.submit(_run)
        with self._lock:
            self._futures[pipeline_id] = future
        return {"pipeline_id": pipeline_id, "status": "submitted"}

    # GET /pipelines/{id}/status (reference api/main.py:201-264)
    def pipeline_status(self, pipeline_id: str) -> Dict[str, Any]:
        with self._lock:
            future = self._futures.get(pipeline_id)
        if future is None:
            return {"pipeline_id": pipeline_id, "status": "unknown"}
        if not future.done():
            return {"pipeline_id": pipeline_id, "status": "running"}
        result = future.result()
        return {"pipeline_id": pipeline_id, "status": result["status"], "result": result}

    # GET /health (reference api/main.py:~140)
    def health(self) -> Dict[str, Any]:
        return {"status": "healthy", **self.runner.health()}

    # GET /workers (reference api/main.py:404-455) — thread pool stats
    def workers(self) -> Dict[str, Any]:
        with self._lock:
            running = sum(1 for f in self._futures.values() if not f.done())
            done = sum(1 for f in self._futures.values() if f.done())
        return {"max_workers": self._pool._max_workers, "running": running, "completed": done}

    def shutdown(self) -> None:
        self._pool.shutdown(wait=False)


def create_app(runner=None):
    """Build the FastAPI app (requires fastapi installed)."""
    if not HAS_FASTAPI:
        raise ImportError(
            "fastapi is not installed; use PipelineService directly or install fastapi"
        )
    if runner is None:
        from data_pipeline_platform_spark.plans.runner import PipelineRunner
        from data_pipeline_platform_spark.session import get_spark

        runner = PipelineRunner(get_spark("pipeline-api"))

    service = PipelineService(runner)
    app = FastAPI(title="data-pipeline-platform-spark")

    @app.get("/")
    def root():
        return {"service": "data-pipeline-platform-spark", "status": "ok"}

    @app.get("/health")
    def health():
        return service.health()

    @app.post("/pipelines")
    def create_pipeline(body: Dict[str, Any]):
        config = body.get("pipeline_config")
        if not config:
            raise HTTPException(status_code=422, detail="pipeline_config required")
        return service.submit_pipeline(config)

    @app.get("/pipelines/{pipeline_id}/status")
    def pipeline_status(pipeline_id: str):
        return service.pipeline_status(pipeline_id)

    @app.get("/workers")
    def workers():
        return service.workers()

    return app
