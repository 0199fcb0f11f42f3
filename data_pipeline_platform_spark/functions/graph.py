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
    # eager=False (r14): the checkpoints only truncate lineage; nothing
    # inspects per-round state driver-side, so materialization can ride
    # the caller's single action instead of paying 2 blocking jobs per
    # hop (the k_core / label_propagation posture)
    visited = seed.localCheckpoint(eager=False)
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
        frontier = fresh.localCheckpoint(eager=False)
        visited = visited.unionByName(frontier).localCheckpoint(eager=False)
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


K_CORE_K = 3
K_CORE_ROUNDS = 12


def k_core(edges: DataFrame, k: int = K_CORE_K, rounds: int = K_CORE_ROUNDS) -> DataFrame:
    """k-core of an undirected edge list (``v``, ``u``): iteratively
    peel every node whose CURRENT degree is below k, re-deriving
    degrees on the shrunken graph each round; returns the surviving
    (node, core_degree) frame.

    Determinism: both engines run the SAME FIXED round count — the
    peel is idempotent once converged, so extra rounds are free no-ops
    and the two sides cannot drift even mid-convergence (the CTE
    round-replay technique, like label_propagation). A unit test pins
    actual convergence within the budget at test scale.

    Shape: each round is one degree census (groupBy on node id) + two
    semi-joins filtering the edge list to surviving endpoints — all
    keyed on node ids, so a src-bucketed edge table keeps every round
    co-located at cluster scale. The edge frame SHRINKS monotonically;
    localCheckpoint per round truncates the linearly-growing lineage
    (the connected-components posture)."""
    cur = edges
    for r in range(rounds):
        deg = cur.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("v")
        cur = (
            cur.join(keep, "v", "left_semi")
            .join(keep.select(F.col("v").alias("u")), "u", "left_semi")
            .localCheckpoint(eager=False)
        )
    return cur.groupBy(F.col("v").alias("part")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


K_CORE_SUPPORT = 2


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase graph: the dense backbone left after
    iteratively shedding weakly-connected parts — the standard
    community-mining preprocessing step (peel before expensive
    triangle/cluster work touches the graph).

    Edges use support >= K_CORE_SUPPORT (2), one notch below
    frequent_itemsets' 3: the support-3 graph is already so sparse at
    the larger SFs that its k-core is empty, which would grade the peel
    on a vacuum — the support-2 graph keeps a real backbone at the
    driver's correctness scale while the peel still removes most of
    it."""
    from data_pipeline_platform_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= K_CORE_SUPPORT)
        .select("pa", "pb")
    )
    und = e0.select(F.col("pa").alias("v"), F.col("pb").alias("u")).unionByName(
        e0.select(F.col("pb").alias("v"), F.col("pa").alias("u"))
    )
    return k_core(und)


def _kcore_round_sql(i: int) -> str:
    prev = f"g{i - 1}"
    return f"""
, keep{i} AS MATERIALIZED (
  SELECT v FROM {prev} GROUP BY v HAVING COUNT(*) >= {K_CORE_K}
), g{i} AS MATERIALIZED (
  SELECT e.v, e.u FROM {prev} e
  JOIN keep{i} kv ON e.v = kv.v
  JOIN keep{i} ku ON e.u = ku.v
)"""


ORACLE_K_CORE = f"""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), e0 AS (
  SELECT a.l_partkey AS pa, c.l_partkey AS pb
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {K_CORE_SUPPORT}
), g0 AS (
  SELECT pa AS v, pb AS u FROM e0 UNION ALL SELECT pb, pa FROM e0
){''.join(_kcore_round_sql(i) for i in range(1, K_CORE_ROUNDS + 1))}
SELECT v AS part, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM g{K_CORE_ROUNDS} GROUP BY v
"""


register("k_core", q_k_core, ORACLE_K_CORE)


HITS_SCALE = 1_000_000_000
HITS_ITERATIONS = 2


def q_hits_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) hub/authority scores over the directed
    customer->supplier purchase graph: customers are hubs (they point
    at the suppliers they buy from), suppliers are authorities. Output:
    supplier authority scores after HITS_ITERATIONS full iterations.

    Determinism: all-integer fixed-point. Scores start at HITS_SCALE;
    each half-step is an exact BIGINT sum over in/out edges, then
    renormalized as ``score * SCALE div max(score)`` — max is order-free
    and truncating integer division matches DuckDB's ``//`` on
    nonnegative values (the pagerank trick, with max-normalization
    standing in for the L2 norm, which would need a sqrt). The
    ``score * SCALE`` product can reach degree * SCALE^2 (~1e22), past
    BIGINT — it runs in DECIMAL(38,0) on Spark and HUGEINT in DuckDB,
    both exact 128-bit-class integers. The oracle replays the identical
    half-steps as a CTE chain.

    Shape: each half-step is one equi-join (scores onto the edge list)
    + one groupBy on the opposite endpoint — node-id keyed shuffles,
    bucketing-friendly, no global window anywhere; the normalizing max
    is a 1-row agg cross-joined back (broadcast)."""
    from data_pipeline_platform_spark.sources.readers import load_table
    from data_pipeline_platform_spark.utils.cache import tracked_persist

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # distinct (cust, supp) edges: dimension-product bounded, persisted
    # because every half-step re-joins it (same rationale as pagerank)
    edges = tracked_persist(
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    hubs = edges.select("c").distinct().select("c", F.lit(HITS_SCALE).alias("h"))
    auth = None
    for _ in range(HITS_ITERATIONS):
        # persist each half-step: the normalizing max and the normalized
        # scores both read it, and the next half-step folds it into its
        # own lineage — unpersisted, every level recomputes its parent
        # TWICE (once per consumer), i.e. 2^(2*iterations) subtree
        # replays (measured 44s -> ~7s at sf0.1). The frames are
        # node-cardinality, so pinning them is cheap at any scale.
        raw_a = tracked_persist(
            edges.join(hubs, "c").groupBy("s").agg(F.sum("h").alias("a"))
        )
        max_a = raw_a.agg(F.max("a").alias("ma"))
        auth = raw_a.crossJoin(F.broadcast(max_a)).select(
            "s",
            F.expr(
                f"CAST((CAST(a AS DECIMAL(28,0)) * {HITS_SCALE}) div ma AS BIGINT)"
            ).alias("a"),
        )
        raw_h = edges.join(auth, "s").groupBy("c").agg(F.sum("a").alias("h"))
        max_h = raw_h.agg(F.max("h").alias("mh"))
        hubs = raw_h.crossJoin(F.broadcast(max_h)).select(
            "c",
            F.expr(
                f"CAST((CAST(h AS DECIMAL(28,0)) * {HITS_SCALE}) div mh AS BIGINT)"
            ).alias("h"),
        )
    return auth.select(F.col("s").alias("supplier"), F.col("a").alias("authority_fp"))


def _hits_round_sql(i: int) -> str:
    prev_h = f"h{i - 1}"
    return f"""
, ra{i} AS MATERIALIZED (
  SELECT e.s, SUM(h.h) AS a FROM e JOIN {prev_h} h ON e.c = h.c GROUP BY e.s
), a{i} AS MATERIALIZED (
  SELECT s,
         CAST((CAST(a AS HUGEINT) * {HITS_SCALE})
              // (SELECT MAX(a) FROM ra{i}) AS BIGINT) AS a
  FROM ra{i}
), rh{i} AS MATERIALIZED (
  SELECT e.c, SUM(a.a) AS h FROM e JOIN a{i} a ON e.s = a.s GROUP BY e.c
), h{i} AS MATERIALIZED (
  SELECT c,
         CAST((CAST(h AS HUGEINT) * {HITS_SCALE})
              // (SELECT MAX(h) FROM rh{i}) AS BIGINT) AS h
  FROM rh{i}
)"""


ORACLE_HITS_AUTHORITY = f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), h0 AS (
  SELECT c, CAST({HITS_SCALE} AS BIGINT) AS h FROM (SELECT DISTINCT c FROM e)
){''.join(_hits_round_sql(i) for i in range(1, HITS_ITERATIONS + 1))}
SELECT s AS supplier, CAST(a AS BIGINT) AS authority_fp
FROM a{HITS_ITERATIONS}
"""


register("hits_authority", q_hits_authority, ORACLE_HITS_AUTHORITY)


# --- single-source weighted shortest path (Bellman-Ford rounds) --------------

SP_ROUNDS = 4


def q_nation_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source weighted shortest path over the bilateral nation
    trade graph: nodes = nations, undirected edge weight = the MINIMUM
    line-item revenue (exact cents) ever traded between the two
    nations, source = the lowest nation key present. ``SP_ROUNDS``
    fixed Bellman-Ford relaxation rounds — each round joins the
    current distance frame against the edge list and min-combines, so
    the result after round r is exactly "cheapest path using <= r
    edges" (order-free, deterministic under any partitioning; min is
    the idempotent combiner).

    Scale: the edge build is the one fact-fact join (orders x lineitem)
    with all dims broadcast — the trade_matrix shape. The iterative
    frame is node-keyed; each round is ONE shuffle keyed on node id
    (AQE broadcasts the frontier while it is small). On a
    billion-node graph the same loop holds: distances are (node,
    BIGINT) rows, never driver-side. localCheckpoint per round keeps
    the plan linear in rounds (the HITS lineage lesson).

    Exactness: weights and path sums are BIGINT cents end-to-end; no
    floats anywhere.
    """
    from data_pipeline_platform_spark.sources.readers import load_table
    from data_pipeline_platform_spark.utils.cache import tracked_persist

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
        ).alias("rev_c"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    directed = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").cast("int").alias("a"),
            F.col("c_nationkey").cast("int").alias("b"),
        )
        .agg(F.min("rev_c").alias("w"))
    )
    edges = tracked_persist(
        directed.select("a", "b", "w")
        .unionByName(
            directed.select(
                F.col("b").alias("a"), F.col("a").alias("b"), F.col("w")
            )
        )
        .groupBy(F.col("a").alias("src"), F.col("b").alias("dst"))
        .agg(F.min("w").alias("w"))
    )
    # eager=False (r14): fixed-round relaxation with no per-round driver
    # inspection — the checkpoints are pure lineage truncation, so all
    # rounds materialize inside the caller's one action instead of one
    # blocking job per round (the k_core / label_propagation posture)
    dist = (
        edges.agg(F.min(F.least(F.col("src"), F.col("dst"))).alias("node"))
        .select("node", F.lit(0).cast("bigint").alias("dist_c"))
        .localCheckpoint(eager=False)
    )
    for _ in range(SP_ROUNDS):
        relaxed = dist.join(edges, dist["node"] == edges["src"]).select(
            F.col("dst").alias("node"), (F.col("dist_c") + F.col("w")).alias("dist_c")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist_c").alias("dist_c"))
            .localCheckpoint(eager=False)
        )
    return dist.select(F.col("node").cast("int").alias("node"), "dist_c")


def _sp_round_sql(i: int) -> str:
    return f""", d{i} AS (
  SELECT node, MIN(dist_c) AS dist_c FROM (
    SELECT node, dist_c FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, d.dist_c + e.w AS dist_c
    FROM d{i - 1} d JOIN e ON e.src = d.node
  ) GROUP BY node
)"""


# The oracle unrolls the exact same SP_ROUNDS relaxation rounds as
# chained CTEs — a declarative round-replay of the iterative frontier
# loop (the hits_authority/k_core oracle pattern), so both engines
# compute "cheapest path using <= SP_ROUNDS edges" identically.
ORACLE_NATION_SHORTEST_PATH = f"""
WITH directed AS (
  SELECT CAST(s.s_nationkey AS INT) AS a, CAST(c.c_nationkey AS INT) AS b,
         MIN(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS w
  FROM orders o
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
), e AS (
  SELECT src, dst, MIN(w) AS w FROM (
    SELECT a AS src, b AS dst, w FROM directed
    UNION ALL
    SELECT b AS src, a AS dst, w FROM directed
  ) GROUP BY 1, 2
), d0 AS (
  SELECT MIN(LEAST(src, dst)) AS node, CAST(0 AS BIGINT) AS dist_c FROM e
){''.join(_sp_round_sql(i) for i in range(1, SP_ROUNDS + 1))}
SELECT CAST(node AS INT) AS node, dist_c FROM d{SP_ROUNDS}
"""


register("nation_shortest_path", q_nation_shortest_path, ORACLE_NATION_SHORTEST_PATH)
