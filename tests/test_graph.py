"""Unit tests for fixed-point PageRank (functions/graph.py)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_symmetric_pair_is_a_fixed_point(spark):
    """On a 2-cycle every iteration returns the initial mass exactly:
    r' = 0.15*S + 0.85*(S div 1) = S. Exercises the integer damping
    arithmetic end to end."""
    from data_pipeline_platform_spark.functions.graph import (
        PR_SCALE,
        pagerank_fixed_point,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], ["src", "dst"]
    )
    out = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(edges).collect()}
    assert out == {"a": PR_SCALE, "b": PR_SCALE}


def test_star_center_outranks_leaves(spark):
    """On a symmetrized star the hub accumulates the leaves' mass."""
    from data_pipeline_platform_spark.functions.graph import pagerank_fixed_point

    leaves = [f"l{i}" for i in range(5)]
    edges = spark.createDataFrame(
        [("hub", l) for l in leaves] + [(l, "hub") for l in leaves],
        ["src", "dst"],
    )
    out = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(edges).collect()}
    assert all(out["hub"] > out[l] for l in leaves)
    # leaves are symmetric: identical ranks, bit for bit
    assert len({out[l] for l in leaves}) == 1


def test_pagerank_plan_is_equi_join_per_iteration(spark):
    """Each Pregel round must plan as hash equi-joins — a nested-loop
    anywhere would be quadratic in the edge list."""
    from data_pipeline_platform_spark.functions.graph import q_pagerank

    plan = q_pagerank(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_mass_is_conserved_approximately(spark):
    """Total fixed-point mass stays within rounding slack of n*SCALE
    (each node loses < PR_DAMP_DEN units per iteration to integer
    truncation)."""
    from data_pipeline_platform_spark.functions.graph import (
        PR_ITERATIONS,
        PR_SCALE,
        pagerank_fixed_point,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("b", "a"), ("c", "b"), ("a", "c")],
        ["src", "dst"],
    )
    out = pagerank_fixed_point(edges).agg(F.sum("rank_fp")).collect()[0][0]
    n = 3
    assert abs(out - n * PR_SCALE) < n * 200 * PR_ITERATIONS


def test_bfs_hops_min_distance_and_bound(spark):
    from pyspark.sql import functions as F

    from data_pipeline_platform_spark.functions.graph import bfs_hops

    # path 1-2-3-4-5 plus shortcut 1-4: node 4 is 1 hop via shortcut,
    # node 5 is 2; node 9-8 is a separate component (unreached)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (9, 8)], "src long, dst long"
    )
    out = {r["part"]: r["hops"] for r in bfs_hops(edges, F.lit(1), max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    # tighter bound truncates the frontier
    out1 = {r["part"]: r["hops"] for r in bfs_hops(edges, F.lit(1), max_hops=1).collect()}
    assert out1 == {1: 0, 2: 1, 4: 1}
