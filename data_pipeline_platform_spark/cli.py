"""CLI (SURVEY.md §2.12 O13; reference src/cli/main.py:294-397).

``pipeline-cli run|ingest|transform|persist|status|health`` with
``--config`` JSON/YAML or inline flags. The Celery submit/poll pair
collapses into synchronous execution on the runner ( --wait semantics are
therefore the default and only mode; the flag is accepted for CLI
compatibility).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any, Dict, Optional


def load_config_file(path: str) -> Dict[str, Any]:
    """JSON or YAML by extension (reference cli/main.py:24-43)."""
    if path.endswith((".yaml", ".yml")):
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)
    with open(path) as f:
        return json.load(f)


def _build_runner(base_path: Optional[str] = None):
    from data_pipeline_platform_spark.plans.runner import PipelineRunner
    from data_pipeline_platform_spark.session import get_spark
    from data_pipeline_platform_spark.sinks.writers import BatchWriter

    spark = get_spark("pipeline-cli")
    writer = BatchWriter(spark, base_path=base_path) if base_path else BatchWriter(spark)
    return PipelineRunner(spark, writer=writer)


def run_command(args: argparse.Namespace) -> int:
    if args.config:
        try:
            config = load_config_file(args.config)
        except (OSError, ValueError) as exc:
            print(f"error: cannot load config {args.config}: {exc}", file=sys.stderr)
            return 2
    else:
        config = {}
        if args.query:
            config["ingestion"] = {"query": args.query}
        elif args.path:
            config["ingestion"] = {"path": args.path, "format": args.format}
        if args.transform_sql:
            config["transformation"] = {"type": "sql", "query": args.transform_sql}
        if args.table:
            config["persistence"] = {"table": args.table, "strategy": args.strategy}
    runner = _build_runner(args.warehouse)
    result = runner.run(config)
    print(json.dumps(_brief(result), indent=2, default=str))
    return 0 if result["status"] == "success" else 1


def _brief(result: Dict[str, Any]) -> Dict[str, Any]:
    out = {k: v for k, v in result.items() if k != "traceback"}
    return out


def ingest_command(args: argparse.Namespace) -> int:
    runner = _build_runner(args.warehouse)
    cfg = {"query": args.query} if args.query else {"path": args.path, "format": args.format}
    df = runner.ingest_stage(cfg)
    n = args.limit or 10
    for row in df.limit(n).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


def transform_command(args: argparse.Namespace) -> int:
    runner = _build_runner(args.warehouse)
    df = runner.ingest_stage(
        {"query": args.query} if args.query else {"path": args.path, "format": args.format}
    )
    if args.transform_sql:
        tcfg: Dict[str, Any] = {"type": "sql", "query": args.transform_sql}
    elif args.transform_config:
        tcfg = {"type": "config", "config_path": args.transform_config}
    else:
        print("transform requires --transform-sql or --transform-config", file=sys.stderr)
        return 2
    out = runner.transform_stage(df, tcfg)
    for row in out.limit(args.limit or 10).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


def persist_command(args: argparse.Namespace) -> int:
    runner = _build_runner(args.warehouse)
    df = runner.ingest_stage(
        {"query": args.query} if args.query else {"path": args.path, "format": args.format}
    )
    stat = runner.persist_stage(
        df,
        {
            "table": args.table,
            "strategy": args.strategy,
            "upsert_keys": args.upsert_keys.split(",") if args.upsert_keys else None,
        },
    )
    print(json.dumps(stat, default=str))
    return 0


def health_command(args: argparse.Namespace) -> int:
    runner = _build_runner(args.warehouse)
    print(json.dumps(runner.health(), default=str))
    return 0


def status_command(args: argparse.Namespace) -> int:
    """Cross-process run status from the warehouse run log (reference
    cli/main.py:213-237 polled the Celery result backend)."""
    runner = _build_runner(args.warehouse)
    result = runner.load_run(args.pipeline_id)
    if result is None:
        print(json.dumps({"pipeline_id": args.pipeline_id, "status": "unknown"}))
        return 1
    print(json.dumps(result, indent=2, default=str))
    return 0


def workers_command(args: argparse.Namespace) -> int:
    """Execution-resource report (reference `workers` listed Celery
    workers; here: the Spark session's scheduler geometry)."""
    from data_pipeline_platform_spark.session import get_spark

    spark = get_spark("pipeline-cli")
    sc = spark.sparkContext
    print(
        json.dumps(
            {
                "master": sc.master,
                "default_parallelism": sc.defaultParallelism,
                "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
                "spark_version": spark.version,
                "scheduler_mode": spark.conf.get("spark.scheduler.mode", "FIFO"),
            }
        )
    )
    return 0


def explain_command(args: argparse.Namespace) -> int:
    """Print the optimized/physical plan of a registry query (``--list``
    prints the available names). The plan-first workflow: check
    pushdown/broadcast/exchange shape before running anything big."""
    from data_pipeline_platform_spark.queries import all_queries
    from data_pipeline_platform_spark.session import get_spark

    registry = all_queries()
    if args.list:
        for name in registry:
            print(name)
        return 0
    if args.name not in registry:
        print(f"unknown query: {args.name!r} (use --list)", file=sys.stderr)
        return 2
    spark = get_spark("pipeline-cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = registry[args.name](spark, args.sf_dir)
    df.explain(args.mode)
    return 0


def dq_command(args: argparse.Namespace) -> int:
    """Run declarative data-quality checks against a parquet path: rules
    come from a JSON/YAML file (a list of rule dicts, the
    functions/dq.py vocabulary; foreign_key rules name their reference
    via ``ref_path``). Prints one JSON line per rule; exit code 1 when
    any rule fails — the shape a CI data gate wants."""
    from data_pipeline_platform_spark.functions.dq import run_checks
    from data_pipeline_platform_spark.session import get_spark

    rules = load_config_file(args.rules)
    if not isinstance(rules, list):
        print("rules file must hold a JSON/YAML LIST of rule dicts", file=sys.stderr)
        return 2
    spark = get_spark("pipeline-cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.path)
    refs = {}
    for r in rules:
        if r.get("rule") == "foreign_key":
            ref_path = r.get("ref_path")
            if not ref_path:
                print("foreign_key rule needs ref_path", file=sys.stderr)
                return 2
            r["ref"] = ref_path
            refs[ref_path] = spark.read.parquet(ref_path)
    failed = 0
    for row in run_checks(df, rules, refs=refs).collect():
        rec = row.asDict()
        print(json.dumps(rec, default=str))
        if not rec["passed"]:
            failed += 1
    return 1 if failed else 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pipeline-cli", description="Spark pipeline CLI")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--config", help="JSON/YAML pipeline config file")
        sp.add_argument("--query", help="ingestion SQL")
        sp.add_argument("--path", help="ingestion file path")
        sp.add_argument("--format", default="parquet", choices=["parquet", "csv", "json", "jdbc"])
        sp.add_argument("--warehouse", help="writer base path")
        sp.add_argument("--limit", type=int, help="rows to print")
        sp.add_argument("--wait", action="store_true", help="accepted for compatibility (always synchronous)")
        sp.add_argument("--timeout", type=float, help="accepted for compatibility")

    sp_run = sub.add_parser("run", help="full ingest->transform->persist pipeline")
    common(sp_run)
    sp_run.add_argument("--transform-sql")
    sp_run.add_argument("--table")
    sp_run.add_argument("--strategy", default="insert")
    sp_run.set_defaults(func=run_command)

    sp_ing = sub.add_parser("ingest", help="run ingestion, print sample rows")
    common(sp_ing)
    sp_ing.set_defaults(func=ingest_command)

    sp_tr = sub.add_parser("transform", help="ingest + transform, print sample rows")
    common(sp_tr)
    sp_tr.add_argument("--transform-sql")
    sp_tr.add_argument("--transform-config")
    sp_tr.set_defaults(func=transform_command)

    sp_pe = sub.add_parser("persist", help="ingest + persist")
    common(sp_pe)
    sp_pe.add_argument("--table", required=True)
    sp_pe.add_argument("--strategy", default="insert")
    sp_pe.add_argument("--upsert-keys")
    sp_pe.set_defaults(func=persist_command)

    sp_he = sub.add_parser("health", help="runner/session health")
    common(sp_he)
    sp_he.set_defaults(func=health_command)

    sp_st = sub.add_parser("status", help="status of a past run by pipeline id")
    common(sp_st)
    sp_st.add_argument("pipeline_id")
    sp_st.set_defaults(func=status_command)

    sp_wk = sub.add_parser("workers", help="execution resources report")
    common(sp_wk)
    sp_wk.set_defaults(func=workers_command)

    sp_ex = sub.add_parser("explain", help="print a registry query's plan")
    sp_ex.add_argument("name", nargs="?", default="")
    sp_ex.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sp_ex.add_argument(
        "--mode", default="formatted", choices=["simple", "extended", "formatted", "cost"]
    )
    sp_ex.add_argument("--list", action="store_true", help="list query names")
    sp_ex.set_defaults(func=explain_command)

    sp_dq = sub.add_parser("dq", help="run declarative data-quality checks")
    sp_dq.add_argument("path", help="parquet path to check")
    sp_dq.add_argument("--rules", required=True, help="JSON/YAML rules file")
    sp_dq.set_defaults(func=dq_command)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
