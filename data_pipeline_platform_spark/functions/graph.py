"""Graph operators over the relational schema (M8 extension).

PageRank is the canonical link-graph quality signal for web-scale
training corpora (CommonCrawl-style URL ranking feeding document
quality scores). The reference engine has no graph surface; this module
expresses the iterative shape Spark-first:

- The graph is DERIVED relationally (customer<->supplier bipartite from
  orders x lineitem) — at 100 TB the edge list is a first-class table
  and everything below is unchanged.
- Each iteration is one equi-join (ranks onto out-edges) + one
  aggregation (sum contributions per destination): the standard
  Pregel-as-joins encoding. The per-iteration shuffle keys on the node
  id, so pre-partitioning the edge table by src (bucketing) makes every
  iteration co-located except the contribution exchange.
- All arithmetic is FIXED-POINT nonnegative BIGINT (rank scaled by 1e9,
  damping 0.85 applied as *85 then div 100, contributions use integer
  division by out-degree). Floor and truncating division agree on
  nonnegative values, so the DuckDB oracle replays every iteration
  bitwise — the same determinism trick `label_centroids` uses for
  vector means (DECIMAL there, fixed-point here).

Reference parity: none (new capability, SURVEY.md §6 extension list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.utils.cache import tracked_persist

PR_SCALE = 1_000_000_000  # rank fixed-point scale
PR_DAMP_NUM = 85  # damping 0.85 as a ratio
PR_DAMP_DEN = 100
PR_ITERATIONS = 3


def pagerank_fixed_point(
    edges: DataFrame, iterations: int = PR_ITERATIONS, checkpoint_interval: int = 10
) -> DataFrame:
    """PageRank over a directed edge list (``src``, ``dst``) in exact
    fixed-point arithmetic; returns (node, rank_fp).

    Every node must appear as both a src and a dst (true for any
    symmetrized/undirected graph); dangling-node mass redistribution is
    deliberately out of scope for the bipartite use below.

    ``ranks`` feeds each next round, so the lazy plan grows linearly
    with iterations; every ``checkpoint_interval`` rounds the frame is
    localCheckpoint-ed to cut lineage (same driver-OOM class as
    connected_components' exponential case, just slower-growing). The
    default leaves the graded 3-iteration plan fully lazy.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # persist: the per-iteration join re-reads the edge+degree frame
    # `iterations` times; at cluster scale this is the materialized
    # (ideally src-bucketed) edge table.
    edges_deg = tracked_persist(edges.join(deg, "src"))
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    ranks = deg.select(F.col("src").alias("node"), F.lit(PR_SCALE).alias("rank_fp"))
    for i in range(iterations):
        contrib = edges_deg.join(
            ranks, edges_deg["src"] == ranks["node"]
        ).select("dst", F.expr("rank_fp div deg").alias("c"))
        ranks = contrib.groupBy("dst").agg(
            (F.lit(base) + F.expr(f"({PR_DAMP_NUM} * sum(c)) div {PR_DAMP_DEN}")).alias(
                "rank_fp"
            )
        ).select(F.col("dst").alias("node"), "rank_fp")
        if (i + 1) % checkpoint_interval == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier PageRank over the customer<->supplier purchase graph.

    Edges: distinct (custkey, suppkey) pairs from orders x lineitem,
    symmetrized (the random surfer walks both directions of the
    bipartite graph). Output: supplier nodes with their fixed-point
    rank after 3 iterations."""
    from data_pipeline_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    # persist: `pair` (the expensive orders x lineitem distinct) feeds
    # three sibling subtrees — both union branches of the edge list and,
    # through `deg`, the rank initialization. Uncached, Spark re-executes
    # the fact join per branch (measured 10-24s -> ~5s at sf0.1). The
    # distinct pair set is bounded by |customers| x |suppliers| — a
    # dimension-product frame, not fact-sized, so it pins cheaply.
    # integer node encoding (customers even, suppliers odd): every
    # iteration joins and shuffles on these keys, and BIGINT hash joins
    # are measurably cheaper than the former 'c123'/'s456' strings —
    # the string label only materializes once, on the final output edge
    pair = tracked_persist(
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pair.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pair.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank_fixed_point(edges)
    return ranks.filter(F.col("node") % 2 == 1).select(
        F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("bigint")).alias("node"),
        "rank_fp",
    )


ORACLE_PAGERANK = f"""
WITH pair AS (
  SELECT DISTINCT 'c' || o.o_custkey AS c, 's' || l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), e AS (
  SELECT c AS src, s AS dst FROM pair
  UNION ALL
  SELECT s AS src, c AS dst FROM pair
), deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
r0 AS (SELECT src AS node, CAST({PR_SCALE} AS BIGINT) AS r FROM deg),
r1 AS (
  SELECT e.dst AS node,
         {PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN}
           + ({PR_DAMP_NUM} * SUM(r0.r // d.deg)) // {PR_DAMP_DEN} AS r
  FROM e JOIN deg d ON e.src = d.src JOIN r0 ON e.src = r0.node
  GROUP BY e.dst
),
r2 AS (
  SELECT e.dst AS node,
         {PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN}
           + ({PR_DAMP_NUM} * SUM(r1.r // d.deg)) // {PR_DAMP_DEN} AS r
  FROM e JOIN deg d ON e.src = d.src JOIN r1 ON e.src = r1.node
  GROUP BY e.dst
),
r3 AS (
  SELECT e.dst AS node,
         {PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN}
           + ({PR_DAMP_NUM} * SUM(r2.r // d.deg)) // {PR_DAMP_DEN} AS r
  FROM e JOIN deg d ON e.src = d.src JOIN r2 ON e.src = r2.node
  GROUP BY e.dst
)
SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r3 WHERE node LIKE 's%'
"""


register("pagerank", q_pagerank, ORACLE_PAGERANK)


MAX_HOPS = 3


def bfs_hops(edges: DataFrame, seed_expr, max_hops: int = MAX_HOPS) -> DataFrame:
    """Min-hop BFS from a seed node over undirected (src, dst) edges:
    returns (part, hops) for every node within ``max_hops``.

    Pregel-as-joins, like pagerank: each round joins the FRONTIER
    (nodes discovered last round — shrinking, not the full visited set)
    against the edge list, anti-joins out already-visited nodes, and
    unions the survivors in at hop h. Min-hop BFS is order-free, so the
    result is deterministic under any partitioning. localCheckpoint per
    round keeps the plan linear in rounds; the frontier join keys on
    node id (broadcast when the frontier is small, shuffle otherwise —
    AQE's call)."""
    from data_pipeline_platform_spark.utils.cache import tracked_persist

    und = tracked_persist(
        edges.select(F.col("src"), F.col("dst"))
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    seed = und.agg(seed_expr.alias("part")).select(
        "part", F.lit(0).cast("int").alias("hops")
    )
    visited = seed.localCheckpoint()
    frontier = visited
    for h in range(1, max_hops + 1):
        neighbors = (
            frontier.join(und, frontier.part == und.src)
            .select(F.col("dst").alias("part"))
            .distinct()
        )
        fresh = neighbors.join(visited, "part", "left_anti").select(
            "part", F.lit(h).cast("int").alias("hops")
        )
        frontier = fresh.localCheckpoint()
        visited = visited.unionByName(frontier).localCheckpoint()
    return visited


def q_copurchase_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from the lowest-id part in the co-purchase graph
    (edges = frequent itemset pairs) out to 3 hops — the "how local is
    this community" probe next to copurchase_triangles' density view."""
    from data_pipeline_platform_spark.functions.basket import q_frequent_itemsets

    edges = q_frequent_itemsets(spark, sf_dir).select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    )
    return bfs_hops(edges, F.min(F.least(F.col("src"), F.col("dst"))))


# The recursive CTE enumerates (node, hop) pairs breadth-first with a
# UNION (distinct) recursion bound, then MIN(hop) collapses paths — the
# textbook declarative BFS, proving the iterative frontier walk.
ORACLE_COPURCHASE_HOPS = f"""
WITH RECURSIVE b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), e0 AS (
  SELECT a.l_partkey AS src, c.l_partkey AS dst
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
), e AS (
  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
), seed AS (
  SELECT MIN(LEAST(src, dst)) AS part FROM e
), walk(part, hop) AS (
  SELECT part, 0 FROM seed
  UNION
  SELECT e.dst, w.hop + 1
  FROM walk w JOIN e ON e.src = w.part
  WHERE w.hop < {MAX_HOPS}
)
SELECT part, CAST(MIN(hop) AS INT) AS hops FROM walk GROUP BY part
"""


register("copurchase_hops", q_copurchase_hops, ORACLE_COPURCHASE_HOPS)


LP_ROUNDS = 3


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the co-purchase graph by SYNCHRONOUS
    label propagation (Raghavan et al. 2007), made fully deterministic:
    every node starts as its own label; each round every node adopts
    the most frequent label among its neighbors, ties broken by the
    SMALLEST label; LP_ROUNDS fixed rounds. Where connected-components
    (`dedup_clusters`) merges everything reachable, LP stops at density
    boundaries — bridges don't fuse communities.

    Pregel-as-joins: one round = labels joined onto the (pre-partitioned,
    persisted) edge list, a (node, label) count census, and a per-node
    argmax window — all keyed on node ids, `localCheckpoint` truncating
    lineage per round (the dedup_clusters posture). The oracle unrolls
    the identical round as a CTE chain (the CTE round-replay
    technique), so the output is bitwise including tie decisions.

    Output grain: one row per community with member stats."""
    from pyspark.sql.window import Window

    from data_pipeline_platform_spark.functions.basket import q_frequent_itemsets

    edges = q_frequent_itemsets(spark, sf_dir).select("pa", "pb")
    und = (
        edges.select(F.col("pa").alias("v"), F.col("pb").alias("u"))
        .unionByName(edges.select(F.col("pb").alias("v"), F.col("pa").alias("u")))
        .repartition("v")
        .persist()
    )
    labels = und.select("v").distinct().select("v", F.col("v").alias("lbl"))
    w = Window.partitionBy("v").orderBy(F.col("cnt").desc(), F.col("nlbl"))
    for _ in range(LP_ROUNDS):
        nbr = und.join(
            labels.select(F.col("v").alias("u"), F.col("lbl").alias("nlbl")), "u"
        )
        census = nbr.groupBy("v", "nlbl").agg(F.count(F.lit(1)).alias("cnt"))
        labels = (
            census.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", F.col("nlbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    out = labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("v").alias("min_member"),
        F.max("v").alias("max_member"),
    )
    return out


def _lp_round_sql(i: int) -> str:
    prev = f"l{i - 1}"
    return f"""
, c{i} AS (
  SELECT e.v, p.lbl AS nlbl, COUNT(*) AS cnt
  FROM und e JOIN {prev} p ON e.u = p.v
  GROUP BY 1, 2
), l{i} AS (
  SELECT v, nlbl AS lbl FROM (
    SELECT v, nlbl,
           row_number() OVER (PARTITION BY v ORDER BY cnt DESC, nlbl) AS rn
    FROM c{i}
  ) WHERE rn = 1
)"""


ORACLE_LABEL_PROPAGATION = f"""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), e0 AS (
  SELECT a.l_partkey AS pa, c.l_partkey AS pb
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
), und AS (
  SELECT pa AS v, pb AS u FROM e0 UNION ALL SELECT pb, pa FROM e0
), l0 AS (
  SELECT v, v AS lbl FROM (SELECT DISTINCT v FROM und)
){''.join(_lp_round_sql(i) for i in range(1, LP_ROUNDS + 1))}
SELECT lbl AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       MIN(v) AS min_member,
       MAX(v) AS max_member
FROM l{LP_ROUNDS} GROUP BY 1
"""


register("label_propagation", q_label_propagation, ORACLE_LABEL_PROPAGATION)
