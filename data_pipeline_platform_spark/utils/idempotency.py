"""Idempotency keys (SURVEY.md §2 O7).

Reference: src/pipeline/utils/idempotency.py — SHA-256(source_id +
content-hash) keys, Redis SET-NX with TTL-days, *fail-open* on store
errors, enabled flag, ``@idempotent`` decorator returning the cached
result and deleting the key on error.

Backing store here is a pluggable KV with a local-filesystem default
(Redis drops in unchanged if present). Fail-open + enabled-flag semantics
preserved (:52-82).
"""

from __future__ import annotations

import functools
import hashlib
import json
import os
import time
from typing import Any, Callable, Dict, Optional


class FileKVStore:
    """Filesystem KV with TTL — single-box default backing store."""

    def __init__(self, path: str = "/tmp/dpps-idempotency"):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _file(self, key: str) -> str:
        return os.path.join(self.path, key)

    def set_nx(self, key: str, value: str, ttl_seconds: float) -> bool:
        """True if the key was newly set; False if a live key exists."""
        f = self._file(key)
        if os.path.exists(f):
            try:
                with open(f) as fh:
                    entry = json.load(fh)
                if entry["expires_at"] > time.time():
                    return False
            except (OSError, json.JSONDecodeError, KeyError):
                pass
        with open(f, "w") as fh:
            json.dump({"value": value, "expires_at": time.time() + ttl_seconds}, fh)
        return True

    def get(self, key: str) -> Optional[str]:
        try:
            with open(self._file(key)) as fh:
                entry = json.load(fh)
            if entry["expires_at"] > time.time():
                return entry["value"]
        except (OSError, json.JSONDecodeError, KeyError):
            pass
        return None

    def delete(self, key: str) -> None:
        try:
            os.remove(self._file(key))
        except OSError:
            pass


class IdempotencyManager:
    """check_and_set / result caching over a KV store, fail-open."""

    def __init__(
        self,
        store: Optional[Any] = None,
        enabled: bool = True,
        ttl_days: float = 7.0,
    ):
        self.store = store if store is not None else FileKVStore()
        self.enabled = enabled
        self.ttl_seconds = ttl_days * 86400

    @staticmethod
    def make_key(source_id: str, content: Any) -> str:
        """SHA-256(source_id + content hash) (reference :84-118)."""
        content_repr = json.dumps(content, sort_keys=True, default=str)
        return hashlib.sha256(f"{source_id}:{content_repr}".encode()).hexdigest()

    def check_and_set(self, key: str) -> bool:
        """True => first time (proceed); False => duplicate (skip).
        Fail-open: store errors report "first time" (reference :223-284)."""
        if not self.enabled:
            return True
        try:
            return self.store.set_nx(key, json.dumps({"status": "in_progress"}), self.ttl_seconds)
        except Exception:
            return True

    def get_result(self, key: str) -> Optional[Dict[str, Any]]:
        if not self.enabled:
            return None
        try:
            raw = self.store.get(key)
            if raw:
                entry = json.loads(raw)
                if entry.get("status") == "done":
                    return entry.get("result")
        except Exception:
            pass
        return None

    def store_result(self, key: str, result: Any) -> None:
        try:
            self.store.delete(key)
            self.store.set_nx(
                key, json.dumps({"status": "done", "result": result}, default=str), self.ttl_seconds
            )
        except Exception:
            pass

    def clear(self, key: str) -> None:
        try:
            self.store.delete(key)
        except Exception:
            pass


def idempotent(
    manager: Optional[IdempotencyManager] = None,
    source_id: Optional[str] = None,
) -> Callable:
    """Decorator (reference :320-399): cached-result return on duplicate,
    delete-key-on-error so failed runs can retry."""

    def decorator(func: Callable) -> Callable:
        mgr = manager or IdempotencyManager()
        sid = source_id or func.__qualname__

        @functools.wraps(func)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            key = mgr.make_key(sid, {"args": [repr(a) for a in args], "kwargs": kwargs})
            if not mgr.check_and_set(key):
                cached = mgr.get_result(key)
                if cached is not None:
                    return cached
                return None  # in-progress elsewhere
            try:
                result = func(*args, **kwargs)
            except Exception:
                mgr.clear(key)
                raise
            mgr.store_result(key, result)
            return result

        return wrapper

    return decorator
