"""Market-basket analysis (extension): frequent part pairs with lift —
the level-2 A-priori census, shaped for scale.

The naive shape self-joins the (order, part) table on order — a
fact-fact shuffle join whose output is quadratic in basket size and
whose join key (order) is fact-cardinality. Here baskets collapse to
one sorted-distinct array per order (one shuffle, map-side combinable),
pair generation is ROW-LOCAL over the array's upper triangle (bounded
by basket size, the same slice-transform trick as the PCA covariance),
and the pair census is a second map-side-combinable count whose keys
are item pairs — dimension-, not fact-, cardinality. Lift derives from
exact integer supports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register

MIN_SUPPORT = 3  # pair must co-occur in >= this many orders


def q_frequent_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs bought together in >= MIN_SUPPORT orders, with
    support counts and lift (co-occurrence vs independence)."""
    from data_pipeline_platform_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (a, i) -> "
                "transform(slice(parts, i + 2, size(parts) - i - 1), "
                "b -> named_struct('pa', a, 'pb', b))))"
            )
        ).alias("p")
    ).select("p.pa", "p.pb")
    pair_sup = (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support_ab"))
        .filter(F.col("support_ab") >= MIN_SUPPORT)
    )
    single = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("sup"))
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        pair_sup.join(
            F.broadcast(single.select(F.col("l_partkey").alias("pa"), F.col("sup").alias("sup_a"))),
            "pa",
        )
        .join(
            F.broadcast(single.select(F.col("l_partkey").alias("pb"), F.col("sup").alias("sup_b"))),
            "pb",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "pa",
            "pb",
            "support_ab",
            F.expr(
                "round(CAST(support_ab * n_orders AS DOUBLE) / (sup_a * sup_b), 6)"
            ).alias("lift"),
        )
    )


ORACLE_FREQUENT_ITEMSETS = f"""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pair_sup AS (
  SELECT a.l_partkey AS pa, c.l_partkey AS pb, COUNT(*) AS support_ab
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_SUPPORT}
), single AS (
  SELECT l_partkey, COUNT(*) AS sup FROM b GROUP BY 1
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem
)
SELECT p.pa, p.pb, p.support_ab,
       round(CAST(p.support_ab * n.n_orders AS DOUBLE) / (sa.sup * sb.sup), 6)
         AS lift
FROM pair_sup p
JOIN single sa ON sa.l_partkey = p.pa
JOIN single sb ON sb.l_partkey = p.pb, n
"""

register("frequent_itemsets", q_frequent_itemsets, ORACLE_FREQUENT_ITEMSETS)


def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph (edges
    = part pairs with support >= MIN_SUPPORT): the local clustering
    signal that separates parts living in dense communities from
    bridge parts.

    Shape: edges are dimension-cardinality (the basket census bounds
    them), all pairs canonical (pa < pb), so triangles enumerate with
    the textbook two-join closure a<b<c — each triangle found exactly
    once, no orientation bookkeeping. Both joins key on part ids."""
    edges = q_frequent_itemsets(spark, sf_dir).select("pa", "pb")
    e1 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = edges.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    e3 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    per_part = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        edges.select(F.col("pa").alias("part"))
        .unionByName(edges.select(F.col("pb").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.join(per_part, "part", "left").select(
        "part",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
        # local clustering coefficient: closed wedges / possible wedges
        F.expr(
            "round(CASE WHEN degree >= 2 THEN "
            "CAST(2 * coalesce(n_triangles, 0) AS DOUBLE) / (degree * (degree - 1)) "
            "ELSE 0.0 END, 6)"
        ).alias("clustering"),
    )


ORACLE_COPURCHASE_TRIANGLES = f"""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS MATERIALIZED (
  SELECT a.l_partkey AS pa, c.l_partkey AS pb
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_SUPPORT}
), tri AS (
  SELECT e1.pa AS a, e1.pb AS b2, e2.pb AS c
  FROM edges e1
  JOIN edges e2 ON e1.pb = e2.pa
  JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
), per_part AS (
  SELECT part, COUNT(*) AS n_triangles FROM (
    SELECT unnest([a, b2, c]) AS part FROM tri
  ) GROUP BY 1
), deg AS (
  SELECT part, COUNT(*) AS degree FROM (
    SELECT pa AS part FROM edges UNION ALL SELECT pb FROM edges
  ) GROUP BY 1
)
SELECT d.part, d.degree,
       CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS n_triangles,
       round(CASE WHEN d.degree >= 2 THEN
         CAST(2 * COALESCE(p.n_triangles, 0) AS DOUBLE)
           / (d.degree * (d.degree - 1))
         ELSE 0.0 END, 6) AS clustering
FROM deg d LEFT JOIN per_part p USING (part)
"""

register("copurchase_triangles", q_copurchase_triangles, ORACLE_COPURCHASE_TRIANGLES)


TOPK_NEIGHBORS = 3


def q_similar_parts_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-based collaborative filtering retrieval structure: for each
    part, its TOPK_NEIGHBORS most similar parts by co-purchase Jaccard
    (|orders with both| / |orders with either|), deterministic
    tie-break on neighbor id.

    Shape: the SAME bounded pair census as `frequent_itemsets` (pairs
    generate row-locally over basket arrays; co-occurrence counts key
    on part pairs, dimension cardinality), then the candidate edges
    symmetrize (each undirected edge emits both directions — a
    row-local union, not a join) and the top-k is a per-part rank
    window over the edge frame. Degrees broadcast onto the census.
    Nothing fact-sized ever self-joins; the rank window partitions by
    part, so no single-task window at any scale."""
    from data_pipeline_platform_spark.sources.readers import load_table
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (a, i) -> "
                "transform(slice(parts, i + 2, size(parts) - i - 1), "
                "b -> named_struct('pa', a, 'pb', b))))"
            )
        ).alias("p")
    ).select("p.pa", "p.pb")
    pair_sup = (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("co_orders"))
        .filter(F.col("co_orders") >= MIN_SUPPORT)
    )
    deg = (
        li.distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    scored = (
        pair_sup.join(
            F.broadcast(deg.select(F.col("l_partkey").alias("pa"), F.col("deg").alias("deg_a"))),
            "pa",
        )
        .join(
            F.broadcast(deg.select(F.col("l_partkey").alias("pb"), F.col("deg").alias("deg_b"))),
            "pb",
        )
        .select(
            "pa",
            "pb",
            "co_orders",
            F.expr(
                "round(CAST(co_orders AS DOUBLE) / (deg_a + deg_b - co_orders), 6)"
            ).alias("jaccard"),
        )
    )
    # symmetrize row-locally: each undirected edge serves both endpoints
    directed = scored.select(
        F.explode(
            F.expr(
                "array(named_struct('part', pa, 'neighbor', pb), "
                "named_struct('part', pb, 'neighbor', pa))"
            )
        ).alias("e"),
        "co_orders",
        "jaccard",
    ).select("e.part", "e.neighbor", "co_orders", "jaccard")
    w = Window.partitionBy("part").orderBy(F.desc("jaccard"), F.asc("neighbor"))
    return (
        directed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK_NEIGHBORS)
        .select("part", "neighbor", "co_orders", "jaccard", F.col("rank").cast("bigint").alias("rank"))
    )


ORACLE_SIMILAR_PARTS_TOPK = f"""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pair_sup AS (
  SELECT a.l_partkey AS pa, c.l_partkey AS pb, COUNT(*) AS co_orders
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_SUPPORT}
), deg AS (
  SELECT l_partkey, COUNT(*) AS deg FROM b GROUP BY 1
), scored AS (
  SELECT p.pa, p.pb, p.co_orders,
         round(CAST(p.co_orders AS DOUBLE)
               / (da.deg + db.deg - p.co_orders), 6) AS jaccard
  FROM pair_sup p
  JOIN deg da ON da.l_partkey = p.pa
  JOIN deg db ON db.l_partkey = p.pb
), directed AS (
  SELECT pa AS part, pb AS neighbor, co_orders, jaccard FROM scored
  UNION ALL
  SELECT pb, pa, co_orders, jaccard FROM scored
), ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY part ORDER BY jaccard DESC, neighbor ASC) AS rank
  FROM directed
)
SELECT part, neighbor, co_orders, CAST(rank AS BIGINT) AS rank, jaccard
FROM ranked WHERE rank <= {TOPK_NEIGHBORS}
"""

register("similar_parts_topk", q_similar_parts_topk, ORACLE_SIMILAR_PARTS_TOPK)


def q_copurchase_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph (edges = part
    pairs with support >= MIN_SUPPORT): the shape diagnostic that says
    whether the graph is hub-dominated (heavy tail — a few parts
    co-occur with everything, salting candidates for the triangle and
    CF ops) or uniform. Two dimension-sized aggs over the bounded edge
    census."""
    edges = q_frequent_itemsets(spark, sf_dir).select("pa", "pb")
    deg = (
        edges.select(F.explode(F.array("pa", "pb")).alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .select(F.col("degree").cast("bigint").alias("degree"), "n_parts")
    )


ORACLE_COPURCHASE_DEGREE_HIST = f"""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
  SELECT a.l_partkey AS pa, c.l_partkey AS pb
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_SUPPORT}
), deg AS (
  SELECT part, COUNT(*) AS degree FROM (
    SELECT pa AS part FROM edges UNION ALL SELECT pb FROM edges
  ) GROUP BY 1
)
SELECT CAST(degree AS BIGINT) AS degree, COUNT(*) AS n_parts
FROM deg GROUP BY 1
"""

register("copurchase_degree_hist", q_copurchase_degree_hist, ORACLE_COPURCHASE_DEGREE_HIST)


def q_basket_size_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion check on basket sizes (items per order): the
    variance-to-mean ratio that says whether order sizes are
    Poisson-like (VMR ~ 1, independent adds) or clumped (VMR > 1,
    bulk-order behavior) — the distributional fact a basket simulator
    or inventory model must match.

    One order-keyed count, one exact-moment agg (DECIMAL(38,0)
    squares), VMR evaluated on the 1-row frame — the ab_ttest
    posture."""
    from data_pipeline_platform_spark.sources.readers import load_table

    sizes = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    return sizes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.expr("round(CAST(SUM(k) AS DOUBLE) / COUNT(*), 6)").alias("mean_items"),
        F.expr(
            "round(CAST(COUNT(*) * SUM(CAST(k AS DECIMAL(38,0)) * k) "
            "- CAST(SUM(k) AS DECIMAL(38,0)) * SUM(k) AS DOUBLE) "
            "/ CAST(COUNT(*) AS DOUBLE) / COUNT(*) "
            "/ (CAST(SUM(k) AS DOUBLE) / COUNT(*)), 6)"
        ).alias("vmr"),
    )


ORACLE_BASKET_SIZE_DISPERSION = """
WITH sizes AS (
  SELECT l_orderkey, COUNT(*) AS k FROM lineitem GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       round(CAST(SUM(k) AS DOUBLE) / COUNT(*), 6) AS mean_items,
       round(CAST(COUNT(*) * SUM(CAST(k AS HUGEINT) * k)
                  - CAST(SUM(k) AS HUGEINT) * SUM(k) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / COUNT(*)
             / (CAST(SUM(k) AS DOUBLE) / COUNT(*)), 6) AS vmr
FROM sizes
"""

register("basket_size_dispersion", q_basket_size_dispersion, ORACLE_BASKET_SIZE_DISPERSION)


def q_link_prediction_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted NEW co-purchase edges by neighbor-set Jaccard:
    for part pairs at distance 2 in the co-purchase graph (support >=
    MIN_SUPPORT edges, canonical pa < pb) that are NOT already edges,
    score |N(a) & N(b)| / |N(a) | N(b)|. The classic common-neighbors
    recommender, shaped for scale: candidates come from the wedge join
    (bounded by degree^2 on the dimension-cardinality edge set), never
    from all part pairs; the head is orderBy().limit —
    TakeOrderedAndProject, no global window.

    Determinism: jaccard is ONE IEEE division of exact BIGINT counts
    (identical in both engines); ordering tie-breaks on (a, b)."""
    edges = q_frequent_itemsets(spark, sf_dir).select("pa", "pb")
    und = edges.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        edges.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    wedges = (
        und.select(F.col("v").alias("x"), F.col("u").alias("a"))
        .join(und.select(F.col("u").alias("x"), F.col("v").alias("b")), "x")
        .filter(F.col("a") < F.col("b"))
    )
    common = wedges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("common_cnt"))
    cand = common.join(
        edges, (common.a == edges.pa) & (common.b == edges.pb), "left_anti"
    )
    scored = (
        cand.join(deg.select(F.col("u").alias("a"), F.col("degree").alias("deg_a")), "a")
        .join(deg.select(F.col("u").alias("b"), F.col("degree").alias("deg_b")), "b")
        .select(
            "a",
            "b",
            F.col("common_cnt").cast("bigint").alias("common_cnt"),
            (F.col("deg_a") + F.col("deg_b") - F.col("common_cnt"))
            .cast("bigint")
            .alias("union_cnt"),
            (
                F.col("common_cnt").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common_cnt")).cast("double")
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(F.col("jaccard").desc(), "a", "b").limit(20)


ORACLE_LINK_PREDICTION_PARTS = f"""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS MATERIALIZED (
  SELECT a.l_partkey AS pa, c.l_partkey AS pb
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_SUPPORT}
), und AS (
  SELECT pa AS u, pb AS v FROM edges
  UNION ALL SELECT pb, pa FROM edges
), deg AS (
  SELECT u, COUNT(*) AS degree FROM und GROUP BY 1
), wedges AS (
  SELECT w1.u AS a, w2.v AS b
  FROM und w1 JOIN und w2 ON w1.v = w2.u
  WHERE w1.u < w2.v
), common AS (
  SELECT a, b, COUNT(*) AS common_cnt FROM wedges GROUP BY 1, 2
), cand AS (
  SELECT c.* FROM common c
  ANTI JOIN edges e ON c.a = e.pa AND c.b = e.pb
)
SELECT c.a, c.b,
       CAST(c.common_cnt AS BIGINT) AS common_cnt,
       CAST(da.degree + db.degree - c.common_cnt AS BIGINT) AS union_cnt,
       CAST(c.common_cnt AS DOUBLE)
         / CAST(da.degree + db.degree - c.common_cnt AS DOUBLE) AS jaccard
FROM cand c
JOIN deg da ON c.a = da.u
JOIN deg db ON c.b = db.u
ORDER BY jaccard DESC, c.a, c.b
LIMIT 20
"""

register("link_prediction_parts", q_link_prediction_parts, ORACLE_LINK_PREDICTION_PARTS)
