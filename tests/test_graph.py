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


def test_label_propagation_partitions_all_nodes(spark):
    """Every graph node lands in exactly one community; communities are
    disjoint and cover the node set; member stats are consistent."""
    from pyspark.sql import functions as F
    from data_pipeline_platform_spark.functions.basket import q_frequent_itemsets
    from data_pipeline_platform_spark.functions.graph import q_label_propagation
    from tests.conftest import SF_DIR

    comm = q_label_propagation(spark, SF_DIR)
    edges = q_frequent_itemsets(spark, SF_DIR)
    n_nodes = (
        edges.select(F.col("pa").alias("p"))
        .unionByName(edges.select(F.col("pb").alias("p")))
        .distinct()
        .count()
    )
    rows = comm.collect()
    assert sum(r.n_members for r in rows) == n_nodes
    for r in rows:
        assert r.min_member <= r.max_member
        assert r.n_members >= 1


def test_label_propagation_two_cliques_stay_separate(spark):
    """Two 3-cliques joined by one bridge edge must resolve to two
    communities — the density boundary LP respects and CC does not."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from data_pipeline_platform_spark.functions.graph import LP_ROUNDS

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)],
        "pa long, pb long",
    )
    und = edges.select(F.col("pa").alias("v"), F.col("pb").alias("u")).unionByName(
        edges.select(F.col("pb").alias("v"), F.col("pa").alias("u"))
    )
    labels = und.select("v").distinct().select("v", F.col("v").alias("lbl"))
    w = Window.partitionBy("v").orderBy(F.col("cnt").desc(), F.col("nlbl"))
    for _ in range(LP_ROUNDS):
        nbr = und.join(labels.select(F.col("v").alias("u"), F.col("lbl").alias("nlbl")), "u")
        census = nbr.groupBy("v", "nlbl").agg(F.count(F.lit(1)).alias("cnt"))
        labels = (
            census.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", F.col("nlbl").alias("lbl"))
        )
    got = {r.v: r.lbl for r in labels.collect()}
    assert len({got[1], got[2], got[3]} | {got[10], got[11], got[12]}) <= 2
    assert {got[1], got[2]} != {got[11], got[12]} or got[1] != got[11]


def test_theil_sen_outlier_resistance(spark):
    """Theil-Sen on a clean line plus one massive outlier recovers the
    true slope exactly (the median shrugs the outlier off)."""
    from pyspark.sql import functions as F

    rows = [(d, 100 + 5 * d) for d in range(30)]
    rows[15] = (15, 10**6)  # one wrecked day
    daily = spark.createDataFrame(rows, "d int, rev long")
    a = daily.select(F.col("d").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("d").alias("db"), F.col("rev").alias("rb"))
    slope = (
        a.join(b, F.col("da") < F.col("db"))
        .select(
            F.expr(
                "CAST(round(CAST(rb - ra AS DOUBLE) / (db - da) * 1000000) AS BIGINT)"
            ).alias("s_fp")
        )
        .agg(F.expr("percentile(s_fp, 0.5)").alias("slope_fp"))
        .collect()[0]
    )
    assert slope.slope_fp == 5_000_000.0  # exactly 5 per day


def test_k_core_peels_chain_keeps_clique(spark):
    """A 4-clique with a pendant chain: the 3-core is exactly the
    clique (every member at degree 3); the chain — and the clique
    member's pendant edge with it — peels away over the rounds."""
    from data_pipeline_platform_spark.functions.graph import k_core

    clique = [(a, b) for a in range(4) for b in range(4) if a != b]
    chain = [(3, 10), (10, 3), (10, 11), (11, 10), (11, 12), (12, 11)]
    edges = spark.createDataFrame(clique + chain, ["v", "u"])
    out = {r["part"]: r["core_degree"] for r in k_core(edges, k=3).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_k_core_converges_within_round_budget(spark):
    """The graded query's fixed K_CORE_ROUNDS must be PAST convergence
    at test scale: one extra round changes nothing (the idempotence the
    determinism note relies on)."""
    from data_pipeline_platform_spark.functions.graph import (
        K_CORE_ROUNDS,
        K_CORE_SUPPORT,
        k_core,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .count()
        .filter(F.col("count") >= K_CORE_SUPPORT)
        .select("pa", "pb")
    )
    und = e0.select(F.col("pa").alias("v"), F.col("pb").alias("u")).unionByName(
        e0.select(F.col("pb").alias("v"), F.col("pa").alias("u"))
    )
    at_budget = sorted(map(tuple, k_core(und, rounds=K_CORE_ROUNDS).collect()))
    one_more = sorted(map(tuple, k_core(und, rounds=K_CORE_ROUNDS + 1).collect()))
    assert at_budget == one_more and len(at_budget) > 0


def test_hits_authority_max_is_scale_and_popular_supplier_wins(spark):
    """Invariants on the graded HITS output at sf0.001: normalization
    pins max authority to exactly HITS_SCALE, and the supplier with the
    most distinct customers holds it (authority = customer mass on a
    bipartite graph)."""
    from data_pipeline_platform_spark.functions.graph import (
        HITS_SCALE,
        q_hits_authority,
    )
    from data_pipeline_platform_spark.sources.readers import load_table

    out = {r["supplier"]: r["authority_fp"] for r in q_hits_authority(spark, SF).collect()}
    assert max(out.values()) == HITS_SCALE
    assert all(0 < v <= HITS_SCALE for v in out.values())
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    deg = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .groupBy("l_suppkey")
        .count()
        .collect()
    )
    top_deg = max(r["count"] for r in deg)
    top_suppliers = {r["l_suppkey"] for r in deg if r["count"] == top_deg}
    best_auth = max(out, key=out.get)
    assert best_auth in top_suppliers
