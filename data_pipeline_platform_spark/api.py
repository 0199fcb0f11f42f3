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
        # health probes get their own lane: submitting the probe to the
        # work pool reports "unhealthy" whenever all workers are merely
        # busy — saturation must read as busy, not broken
        self._probe_pool = ThreadPoolExecutor(max_workers=1)
        self._futures: Dict[str, Any] = {}
        self._tasks: Dict[str, Any] = {}
        # data_id -> lazy DataFrame: the per-stage hand-off. The
        # reference pickles the full frame through Redis at each task
        # boundary (workers/tasks.py:478-502); here the registry holds a
        # PLAN — handing a 100 TB frame between stages costs nothing,
        # and Catalyst still optimizes across the eventual persist.
        self._data: Dict[str, Any] = {}
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

    # -- per-stage tasks (reference api/main.py:267-401) ------------------
    def _submit_task(self, kind: str, work) -> Dict[str, Any]:
        task_id = uuid.uuid4().hex[:12]
        future = self._pool.submit(work)
        with self._lock:
            self._tasks[task_id] = future
        # PipelineResponse shape (api/main.py: status/pipeline_id/task_id)
        return {
            "status": "submitted",
            "pipeline_id": f"{kind}_task",
            "task_id": task_id,
            "message": f"{kind.capitalize()} task submitted successfully",
        }

    def _register_data(self, df) -> str:
        from data_pipeline_platform_spark.plans.runner import compute_data_id

        data_id = f"data_{compute_data_id(df)}"
        with self._lock:
            self._data[data_id] = df
        return data_id

    def _get_data(self, data_id: str):
        with self._lock:
            df = self._data.get(data_id)
        if df is None:
            # message parity: workers/tasks.py:202, :307
            raise ValueError(f"Data not found for data_id: {data_id}")
        return df

    # POST /tasks/ingest (api/main.py:267-301; result: tasks.py:113-146)
    def submit_ingest(self, config: Dict[str, Any]) -> Dict[str, Any]:
        if not config.get("query") and not config.get("path"):
            raise ValueError("Query is required for ingestion")  # :275-279

        def _work() -> Dict[str, Any]:
            df = self.runner.ingest_stage(config)
            data_id = self._register_data(df)
            return {
                "status": "success",
                "data_id": data_id,
                "row_count": df.count(),
                "columns": df.columns,
            }

        return self._submit_task("ingest", _work)

    # POST /tasks/transform (api/main.py:304-334; result: tasks.py:229-246)
    def submit_transform(self, data_id: str, config: Dict[str, Any]) -> Dict[str, Any]:
        def _work() -> Dict[str, Any]:
            df = self.runner.transform_stage(self._get_data(data_id), config)
            new_data_id = self._register_data(df)
            return {
                "status": "success",
                "data_id": new_data_id,
                "row_count": df.count(),
                "columns": df.columns,
            }

        return self._submit_task("transform", _work)

    # POST /tasks/persist (api/main.py:337-368; result: writer stat K9)
    def submit_persist(self, data_id: str, config: Dict[str, Any]) -> Dict[str, Any]:
        def _work() -> Dict[str, Any]:
            stat = self.runner.persist_stage(self._get_data(data_id), config)
            return {"status": "success", **stat}

        return self._submit_task("persist", _work)

    # GET /tasks/{task_id} (api/main.py:371-401 TaskStatusResponse)
    def task_status(self, task_id: str) -> Dict[str, Any]:
        with self._lock:
            future = self._tasks.get(task_id)
        if future is None:
            return {"task_id": task_id, "status": "unknown"}
        if not future.done():
            return {"task_id": task_id, "status": "pending"}
        exc = future.exception()
        if exc is not None:
            return {"task_id": task_id, "status": "failed", "error": str(exc)}
        return {"task_id": task_id, "status": "completed", "result": future.result()}

    # GET /health (reference api/main.py:~140)
    def health(self) -> Dict[str, Any]:
        return {"status": "healthy", **self.runner.health()}

    # GET /workers (reference api/main.py:404-455) — thread pool stats
    def workers(self) -> Dict[str, Any]:
        with self._lock:
            running = sum(1 for f in self._futures.values() if not f.done())
            done = sum(1 for f in self._futures.values() if f.done())
        return {"max_workers": self._pool._max_workers, "running": running, "completed": done}

    # GET /workers/health (reference api/main.py:404-455: dispatches a
    # health_check_task through the worker and waits ≤ timeout)
    def workers_health(self, timeout: float = 10.0) -> Dict[str, Any]:
        def _probe() -> Dict[str, Any]:
            health = self.runner.health()
            # exercise the execution path end-to-end, not just the dict
            spark = getattr(self.runner, "spark", None)
            if spark is not None:
                health["probe_rows"] = spark.range(1).count()
            return health

        future = self._probe_pool.submit(_probe)
        try:
            return {"status": "healthy", "result": future.result(timeout=timeout)}
        except Exception as exc:  # timeout or probe failure (:451-455)
            return {"status": "unhealthy", "error": str(exc)}

    def shutdown(self) -> None:
        self._pool.shutdown(wait=False)
        self._probe_pool.shutdown(wait=False)


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

    @app.post("/tasks/ingest")
    def task_ingest(body: Dict[str, Any]):
        try:
            return service.submit_ingest(body)
        except ValueError as exc:
            raise HTTPException(status_code=400, detail=str(exc))

    @app.post("/tasks/transform")
    def task_transform(body: Dict[str, Any]):
        data_id = body.get("data_id")
        if not data_id:
            raise HTTPException(status_code=422, detail="data_id required")
        return service.submit_transform(data_id, body.get("transformation_config") or body)

    @app.post("/tasks/persist")
    def task_persist(body: Dict[str, Any]):
        data_id = body.get("data_id")
        if not data_id:
            raise HTTPException(status_code=422, detail="data_id required")
        return service.submit_persist(data_id, body)

    @app.get("/tasks/{task_id}")
    def task_status(task_id: str):
        return service.task_status(task_id)

    @app.get("/workers")
    def workers():
        return service.workers()

    @app.get("/workers/health")
    def workers_health():
        return service.workers_health()

    return app


def build_http_server(runner, host: str = "127.0.0.1", port: int = 0):
    """Stdlib HTTP transport over PipelineService — the same ten routes
    as ``create_app`` (reference api/main.py:117-455), served by
    ``http.server.ThreadingHTTPServer`` so the HTTP layer is exercisable
    end-to-end in environments without fastapi (like this container).

    Error contract mirrors FastAPI's: a failed route returns
    ``{"detail": ...}`` with a 400/404/422 status. Returns the server;
    callers start it with ``serve_forever()`` (typically on a thread)
    and stop it with ``shutdown()`` + ``server.service.shutdown()``.
    Port 0 binds an ephemeral port (read it from ``server.server_port``).
    """
    import json as _json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    service = PipelineService(runner)

    class _Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # keep test output clean
            pass

        def _send(self, code: int, obj) -> None:
            payload = _json.dumps(obj).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _body(self) -> Dict[str, Any]:
            length = int(self.headers.get("Content-Length") or 0)
            if not length:
                return {}
            try:
                return _json.loads(self.rfile.read(length) or b"{}")
            except ValueError:
                return {}

        def do_GET(self) -> None:
            path = self.path.split("?", 1)[0].rstrip("/") or "/"
            if path == "/":
                self._send(
                    200, {"service": "data-pipeline-platform-spark", "status": "ok"}
                )
            elif path == "/health":
                self._send(200, service.health())
            elif path == "/workers":
                self._send(200, service.workers())
            elif path == "/workers/health":
                self._send(200, service.workers_health())
            elif path.startswith("/pipelines/") and path.endswith("/status"):
                pipeline_id = path[len("/pipelines/") : -len("/status")]
                self._send(200, service.pipeline_status(pipeline_id))
            elif path.startswith("/tasks/"):
                self._send(200, service.task_status(path[len("/tasks/") :]))
            else:
                self._send(404, {"detail": "not found"})

        def do_POST(self) -> None:
            path = self.path.split("?", 1)[0].rstrip("/")
            body = self._body()
            if path == "/pipelines":
                config = body.get("pipeline_config")
                if not config:
                    self._send(422, {"detail": "pipeline_config required"})
                    return
                self._send(200, service.submit_pipeline(config))
            elif path == "/tasks/ingest":
                try:
                    self._send(200, service.submit_ingest(body))
                except ValueError as exc:
                    self._send(400, {"detail": str(exc)})
            elif path == "/tasks/transform":
                data_id = body.get("data_id")
                if not data_id:
                    self._send(422, {"detail": "data_id required"})
                    return
                self._send(
                    200,
                    service.submit_transform(
                        data_id, body.get("transformation_config") or body
                    ),
                )
            elif path == "/tasks/persist":
                data_id = body.get("data_id")
                if not data_id:
                    self._send(422, {"detail": "data_id required"})
                    return
                self._send(200, service.submit_persist(data_id, body))
            else:
                self._send(404, {"detail": "not found"})

    server = ThreadingHTTPServer((host, port), _Handler)
    server.service = service  # type: ignore[attr-defined]
    return server
