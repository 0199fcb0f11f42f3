"""SparkSession factory.

The reference's resource handle is a SQLAlchemy engine + connection pool
(reference: src/pipeline/ingestion/connection_manager.py:19-63). In the
Spark rebuild the SparkSession *is* the resource handle; pooling, pre-ping,
and reconnect logic have no equivalent (executors manage their own
connections for JDBC sources). What remains is a factory that applies the
Settings-derived conf and is safe to call repeatedly (returns the active
session when one exists).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession

from data_pipeline_platform_spark.config.settings import Settings

# Python workers import functions pickled by reference (mapInPandas /
# applyInPandasWithState kernels live in this package) — they spawn with
# the driver's PYTHONPATH env, not its sys.path, so the package root must
# be on the env or any driver running outside the repo dir breaks.
_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _export_pkg_to_workers() -> None:
    current = os.environ.get("PYTHONPATH", "")
    if _PKG_ROOT not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{_PKG_ROOT}{os.pathsep}{current}" if current else _PKG_ROOT
        )


def get_spark(
    app_name: str = "data-pipeline-platform-spark",
    settings: Optional[Settings] = None,
    master: Optional[str] = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured from Settings.

    Conf highlights and why (SURVEY.md §7):
    - AQE on: runtime shuffle-partition coalescing + skew-join splitting —
      this is what makes one static ``spark.sql.shuffle.partitions`` value
      survive a 1000x data-scale change.
    - ANSI off: preserves the reference's lenient coerce-to-null cast
      semantics (pd.to_numeric(errors="coerce") ==> CAST returning NULL).
    - UTC session timezone: parquet timestamps and the DuckDB oracle agree.
    - Arrow on: pandas interchange and pandas UDFs use Arrow batches.
    """
    settings = settings or Settings()
    _export_pkg_to_workers()
    builder = SparkSession.builder.appName(app_name).master(master or settings.spark_master)
    for k, v in settings.spark_conf().items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    """Stop the active session if any (test teardown helper)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
