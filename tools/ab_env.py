#!/usr/bin/env python
"""Interleaved same-host A/B perf harness for ENV-toggled settings on one
checkout (sibling of ab_perf.py, which A/Bs two checkouts).

Why: the r13 verdict (what's-wrong #1) found the global AQE coalescing
floor (256k) was shipped after an A/B on ~10 of 83 headline queries and
regressed the unswept iterative/multi-commit paths (pagerank 3.3->8.0s).
This harness sweeps a setting over the FULL headline set, interleaved on
the same host: R rounds, each round launching one subprocess per env
configuration (alternating which goes first), each subprocess warming the
JVM + each query once and then timing T runs with bench.py's noop-sink
protocol. Steady-state = median over all rounds' post-warm-up samples.

Usage:
  python tools/ab_env.py --env-a SPARK_AQE_MIN_PARTITION_SIZE=256k \
      --env-b SPARK_AQE_MIN_PARTITION_SIZE=1m \
      --queries all  [--rounds 2] [--trials 2] [--json out]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
repo = sys.argv[1]; sf_dir = sys.argv[2]; trials = int(sys.argv[3])
names = sys.argv[4].split(",")
sys.path.insert(0, repo)
from data_pipeline_platform_spark.session import get_spark
from data_pipeline_platform_spark.queries import all_queries
from data_pipeline_platform_spark.utils.cache import release_tracked
spark = get_spark("abenv"); spark.sparkContext.setLogLevel("ERROR")
registry = all_queries()
spark.range(1).count()  # JVM warm
out = {}
for name in names:
    fn = registry.get(name)
    if fn is None:
        continue
    try:
        # one discarded warm-up: parquet footers, code paths, JIT
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_tracked()
        runs = []
        for _ in range(trials):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            release_tracked()
        out[name] = runs
    except Exception as exc:  # noqa: BLE001 - record, keep sweeping
        out[name] = "ERROR: " + type(exc).__name__
    finally:
        release_tracked()
print("ABENV " + json.dumps(out))
"""


def run_worker(env_kv: str, sf_dir: str, trials: int, names: list[str]) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    for pair in env_kv.split(","):
        if pair:
            k, _, v = pair.partition("=")
            env[k] = v
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, REPO, sf_dir, str(trials), ",".join(names)],
        capture_output=True, text=True, env=env, cwd="/tmp",
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABENV "):
            return json.loads(line[len("ABENV "):])
    raise RuntimeError(
        f"worker failed for {env_kv}: rc={proc.returncode}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-a", required=True, help="comma-joined K=V list for side A")
    ap.add_argument("--env-b", required=True, help="comma-joined K=V list for side B")
    ap.add_argument("--queries", required=True,
                    help="comma list, or 'all' for bench.py's HEADLINE set")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    if args.queries == "all":
        sys.path.insert(0, REPO)
        import bench
        names = list(bench.HEADLINE)
    else:
        names = args.queries.split(",")

    samples: dict[str, dict[str, list[float]]] = {
        "a": {n: [] for n in names}, "b": {n: [] for n in names}
    }
    errors: dict[str, str] = {}
    for rnd in range(args.rounds):
        # alternate launch order so slow-host windows hit both sides
        order = [("a", args.env_a), ("b", args.env_b)]
        if rnd % 2:
            order.reverse()
        for label, env_kv in order:
            got = run_worker(env_kv, args.sf, args.trials, names)
            for n, runs in got.items():
                if isinstance(runs, list):
                    samples[label][n].extend(runs)
                else:
                    errors[f"{label}:{n}"] = runs
            print(f"round {rnd} {label} ({env_kv}): done", file=sys.stderr)

    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = None
    report = {"env_a": args.env_a, "env_b": args.env_b,
              "rounds": args.rounds, "trials": args.trials,
              "sf": args.sf, "load_avg_1m_end": load1,
              "errors": errors, "queries": {}}
    sum_a = sum_b = 0.0
    log_ratios = []
    for n in names:
        if not samples["a"][n] or not samples["b"][n]:
            continue
        a = statistics.median(samples["a"][n])
        b = statistics.median(samples["b"][n])
        sum_a += a
        sum_b += b
        if a > 0 and b > 0:
            import math
            log_ratios.append(math.log(a / b))
        report["queries"][n] = {
            "a_median": a, "b_median": b,
            "a_over_b": round(a / b, 3) if b else None,
            "a_samples": samples["a"][n], "b_samples": samples["b"][n],
        }
    import math
    report["sum_a"] = round(sum_a, 2)
    report["sum_b"] = round(sum_b, 2)
    report["geomean_a_over_b"] = (
        round(math.exp(sum(log_ratios) / len(log_ratios)), 4)
        if log_ratios else None
    )
    line = json.dumps(report)
    print(line)
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
