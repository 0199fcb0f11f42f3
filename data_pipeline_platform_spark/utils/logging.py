"""Structured logging with correlation context (SURVEY.md §2 O9).

Reference: src/pipeline/utils/logging.py — contextvars for
correlation_id / pipeline_id / stage / task_id; JSON and text formatters;
stage/pipeline context managers. Engine-agnostic port.
"""

from __future__ import annotations

import contextlib
import contextvars
import json
import logging
import sys
import time
import uuid
from typing import Any, Dict, Iterator, Optional

correlation_id: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    "correlation_id", default=None
)
pipeline_id: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    "pipeline_id", default=None
)
stage: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar("stage", default=None)


class JSONFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload: Dict[str, Any] = {
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime(record.created)),
            "level": record.levelname,
            "logger": record.name,
            "message": record.getMessage(),
        }
        for name, var in (
            ("correlation_id", correlation_id),
            ("pipeline_id", pipeline_id),
            ("stage", stage),
        ):
            value = var.get()
            if value is not None:
                payload[name] = value
        if record.exc_info:
            payload["exception"] = self.formatException(record.exc_info)
        return json.dumps(payload)


class TextFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        ctx_parts = []
        for name, var in (("corr", correlation_id), ("pipe", pipeline_id), ("stage", stage)):
            value = var.get()
            if value is not None:
                ctx_parts.append(f"{name}={value}")
        ctx = f" [{' '.join(ctx_parts)}]" if ctx_parts else ""
        base = super().format(record)
        return f"{base}{ctx}"


def configure_logging(level: int = logging.INFO, fmt: str = "text") -> None:
    handler = logging.StreamHandler(sys.stderr)
    if fmt == "json":
        handler.setFormatter(JSONFormatter())
    else:
        handler.setFormatter(TextFormatter("%(asctime)s %(levelname)s %(name)s: %(message)s"))
    root = logging.getLogger()
    root.handlers = [handler]
    root.setLevel(level)


@contextlib.contextmanager
def pipeline_context(pid: Optional[str] = None) -> Iterator[str]:
    """Set pipeline + correlation ids for the duration of a run."""
    pid = pid or uuid.uuid4().hex[:12]
    cid = correlation_id.get() or uuid.uuid4().hex[:12]
    t1 = pipeline_id.set(pid)
    t2 = correlation_id.set(cid)
    try:
        yield pid
    finally:
        pipeline_id.reset(t1)
        correlation_id.reset(t2)


@contextlib.contextmanager
def stage_context(name: str) -> Iterator[None]:
    token = stage.set(name)
    try:
        yield
    finally:
        stage.reset(token)
