"""Transformation versioning + execution tracking.

The reference repeats the same registry pattern in all three transformers
(SURVEY.md §2.10; reference sql_transformer.py:218-350,
code_transformer.py:308-448, config_transformer.py:352-530): an in-memory
``{transformation_id: {version: artifact}}`` map plus an execution-history
list. Factored here once; engine-agnostic.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional


class VersionRegistry:
    """In-memory versioned artifact store with optional JSON persistence.

    Semantics preserved from the reference:
    - ``register`` overwrites an existing (id, version) silently.
    - ``get(id)`` with no version returns the latest = max(version keys).
    - ``history`` returns entries sorted ascending by version.
    """

    def __init__(self, persist_path: Optional[str] = None):
        self._versions: Dict[str, Dict[int, Any]] = {}
        self._meta: Dict[str, Dict[int, Dict[str, Any]]] = {}
        self._history: List[Dict[str, Any]] = []
        self._persist_path = persist_path
        if persist_path and os.path.exists(persist_path):
            self._load()

    def register(
        self,
        transformation_id: str,
        version: int,
        artifact: Any,
        description: str = "",
        metadata: Optional[Dict[str, Any]] = None,
    ) -> None:
        self._versions.setdefault(transformation_id, {})[version] = artifact
        self._meta.setdefault(transformation_id, {})[version] = {
            "description": description,
            "metadata": metadata or {},
            "registered_at": time.time(),
        }
        self._save()

    def get(self, transformation_id: str, version: Optional[int] = None) -> Any:
        versions = self._versions.get(transformation_id)
        if not versions:
            raise KeyError(f"unknown transformation_id: {transformation_id}")
        if version is None:
            version = max(versions)
        if version not in versions:
            raise KeyError(f"unknown version {version} for {transformation_id}")
        return versions[version]

    def latest_version(self, transformation_id: str) -> int:
        versions = self._versions.get(transformation_id)
        if not versions:
            raise KeyError(f"unknown transformation_id: {transformation_id}")
        return max(versions)

    def history(self, transformation_id: str) -> List[Dict[str, Any]]:
        meta = self._meta.get(transformation_id, {})
        return [
            {"version": v, **meta.get(v, {})}
            for v in sorted(self._versions.get(transformation_id, {}))
        ]

    def track_execution(
        self, transformation_id: str, version: Optional[int], info: Dict[str, Any]
    ) -> None:
        self._history.append(
            {
                "transformation_id": transformation_id,
                "version": version,
                "timestamp": time.time(),
                **info,
            }
        )

    @property
    def execution_history(self) -> List[Dict[str, Any]]:
        return list(self._history)

    # -- optional durability (artifacts must be JSON-serializable) -------
    def _save(self) -> None:
        if not self._persist_path:
            return
        try:
            payload = {
                tid: {str(v): art for v, art in versions.items()}
                for tid, versions in self._versions.items()
                if all(_jsonable(a) for a in versions.values())
            }
            with open(self._persist_path, "w") as f:
                json.dump(payload, f)
        except (TypeError, OSError):
            pass  # best-effort persistence; in-memory copy stays authoritative

    def _load(self) -> None:
        try:
            with open(self._persist_path) as f:
                payload = json.load(f)
            for tid, versions in payload.items():
                for v, art in versions.items():
                    self._versions.setdefault(tid, {})[int(v)] = art
                    self._meta.setdefault(tid, {})[int(v)] = {}
        except (json.JSONDecodeError, OSError):
            pass


def _jsonable(obj: Any) -> bool:
    try:
        json.dumps(obj)
        return True
    except (TypeError, ValueError):
        return False
