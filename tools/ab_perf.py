#!/usr/bin/env python
"""Interleaved same-host A/B perf harness for named registry queries
across two repo checkouts (e.g. HEAD vs a round-tag worktree).

Why: round-over-round bench deltas on this host routinely drift 1.3-2x
with zero code change (BENCH_r5..r11 history), so a single-number
comparison cannot distinguish "the rewrite regressed the query" from
"the host was busier this round". This harness interleaves the two
versions on the same host within minutes of each other: R rounds, each
round launching one subprocess per repo (alternating which goes first),
each subprocess warming the JVM + the query once and then timing T
runs with the same noop-sink protocol bench.py uses. Steady-state =
median over all rounds' post-warm-up samples.

Usage:
  python tools/ab_perf.py --repo-a /root/repo --repo-b /root/repo/.ab_r10 \
      --queries cosine_topk_ivf_exact,ann_ivfpq_topk \
      [--rounds 2] [--trials 3] [--sf /root/testdata/sf0.1] [--json out]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
repo = sys.argv[1]; sf_dir = sys.argv[2]; trials = int(sys.argv[3])
names = sys.argv[4].split(",")
sys.path.insert(0, repo)
from data_pipeline_platform_spark.session import get_spark
from data_pipeline_platform_spark.queries import all_queries
from data_pipeline_platform_spark.utils.cache import release_tracked
spark = get_spark("abperf"); spark.sparkContext.setLogLevel("ERROR")
registry = all_queries()
spark.range(1).count()  # JVM warm
out = {}
for name in names:
    fn = registry[name]
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
print("ABPERF " + json.dumps(out))
"""


def run_worker(repo: str, sf_dir: str, trials: int, names: list[str]) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, repo, sf_dir, str(trials), ",".join(names)],
        capture_output=True, text=True, env=env, cwd="/tmp",
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABPERF "):
            return json.loads(line[len("ABPERF "):])
    raise RuntimeError(
        f"worker failed for {repo}: rc={proc.returncode}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo-a", required=True, help="label A checkout (e.g. HEAD)")
    ap.add_argument("--repo-b", required=True, help="label B checkout (e.g. r10)")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    names = args.queries.split(",")

    samples: dict[str, dict[str, list[float]]] = {
        "a": {n: [] for n in names}, "b": {n: [] for n in names}
    }
    for rnd in range(args.rounds):
        # alternate launch order so slow-host windows hit both versions
        order = [("a", args.repo_a), ("b", args.repo_b)]
        if rnd % 2:
            order.reverse()
        for label, repo in order:
            got = run_worker(repo, args.sf, args.trials, names)
            for n, runs in got.items():
                samples[label][n].extend(runs)
            print(f"round {rnd} {label} ({repo}): {got}", file=sys.stderr)

    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = None
    report = {"repo_a": args.repo_a, "repo_b": args.repo_b,
              "rounds": args.rounds, "trials": args.trials,
              "sf": args.sf, "load_avg_1m_end": load1, "queries": {}}
    for n in names:
        a = statistics.median(samples["a"][n])
        b = statistics.median(samples["b"][n])
        report["queries"][n] = {
            "a_median": a, "b_median": b,
            "a_over_b": round(a / b, 3) if b else None,
            "a_samples": samples["a"][n], "b_samples": samples["b"][n],
        }
    line = json.dumps(report)
    print(line)
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
