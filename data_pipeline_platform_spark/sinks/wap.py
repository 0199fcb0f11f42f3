"""Write-Audit-Publish (the Iceberg WAP pattern) natively on the
AcidTable txn machinery: a batch is STAGED under a single-table
transaction (its commit reserves the version slot but is invisible to
every reader — sinks/txn.py), the declarative DQ rule set
(functions/dq.py) runs against EXACTLY the staged files, and the one
atomic decide publishes or aborts. No reader can ever observe an
un-audited row; an aborted wave's files are vacuum-able orphans.

vs write-then-delete-on-failure: there is no window where bad data is
visible, no compensating delete to crash halfway through, and the
audit reads the staged parquet directly — the bytes that WOULD become
the table, not a pre-write DataFrame that a non-deterministic source
could re-evaluate differently at write time.

SCALE: the audit is ONE aggregation pass over the staged files (plus a
broadcast anti-join per foreign_key rule) — batch-sized; the decide is
one marker create, independent of data volume.
"""

from __future__ import annotations

import tempfile
from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame

from data_pipeline_platform_spark.functions.dq import run_checks
from data_pipeline_platform_spark.sinks.acid import AcidTable
from data_pipeline_platform_spark.sinks.txn import MultiTableTxn


def write_audit_publish(
    table: AcidTable,
    df: DataFrame,
    rules: Sequence[Dict],
    coordinator_dir: Optional[str] = None,
    mode: str = "append",
    refs: Optional[Dict[str, DataFrame]] = None,
    **write_kw: Any,
) -> Dict[str, Any]:
    """Stage ``df`` (write semantics: append/overwrite), audit the
    staged files against ``rules``, publish or abort atomically.
    Returns {published, version, failed_rules, report} where report is
    the per-rule (rule, col_name, violations, passed) rows. MERGE-shaped
    ingestion composes the same way via ``txn.stage_merge`` — this
    helper covers the append/overwrite ingest gate."""
    coordinator_dir = coordinator_dir or tempfile.mkdtemp(prefix="wap_")
    txn = MultiTableTxn(coordinator_dir)
    version = table.write(df, mode=mode, txn=txn._ref(), **write_kw)
    txn.record(table.path, version)
    # Audit failures of ANY kind must never leave the table blocked
    # behind a pending txn: a crashed rule (typo'd expr, transient scan
    # error) aborts the stage — conservative: un-audited data does not
    # publish — and re-raises for the caller.
    try:
        staged_commit = table._read_commit(version)
        staged_actions = staged_commit["add"]
        if staged_actions:
            # Audit under the schema the bytes WILL publish with: the
            # staged commit's own recorded schema. table_schema(version)
            # skips pending commits — and the staged commit is pending
            # right now — so a schema-widening write would otherwise be
            # audited under the OLD schema, hiding the new column from
            # the DQ rules.
            from pyspark.sql.types import StructType

            recorded = staged_commit.get("schema")
            audit_schema = (
                StructType.fromJson(recorded)
                if recorded
                else table.table_schema(version)
            )
            staged = table._scan(staged_actions, audit_schema)
        else:
            staged = df.limit(0)
        report_rows: List[Dict] = [
            r.asDict()
            for r in run_checks(staged, list(rules), refs).collect()
        ]
    except Exception:
        txn.abort()
        raise
    failed = [r for r in report_rows if not r["passed"]]
    if failed:
        txn.abort()
    else:
        txn.commit()
    return {
        "published": not failed,
        "version": version,
        "failed_rules": len(failed),
        "report": report_rows,
    }
