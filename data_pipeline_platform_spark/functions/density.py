"""Grid-density clustering (DBSCAN-lite) over the embedding table —
the density member of the clustering family (k-means step, k-center
coreset, label propagation, connected components already ship).

True DBSCAN's eps-neighborhood graph is an all-pairs range query; the
scale-correct carrier is the classic GRIDDED approximation: quantize
points to fixed-width cells, call a cell CORE when it holds >= minPts
points, union-find the core cells over 8-neighborhood adjacency, then
attach border points (non-core-cell points adjacent to a core cell) and
mark the rest noise. Every dense region becomes one cluster of cells;
resolution is the cell width.

Scale shape: ONE pass quantizes points (row-local floor), the cell
census is VALUE-DOMAIN bounded (unit-normalized embeddings at width
0.05 cap the grid at ~40x40 cells per axis pair), the 8-neighbor
self-join and the component propagation run on that bounded census —
never on points. Point assignment is two broadcast joins against the
labeled cells. Nothing all-pairs, nothing point-quadratic.

Determinism: cell ids are exact integer floors of double products
(float32 -> double is exact; both engines multiply the same doubles by
20.0), components are MIN cell ids (connected_components), border
points take the MIN adjacent core component. The oracle replays the
identical grid in SQL with a recursive-CTE reachability closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions import register
from data_pipeline_platform_spark.functions.dedup import connected_components
from data_pipeline_platform_spark.sources.readers import load_table

#: 1/cell-width: width 0.05 on unit-normalized coords
_GRID_SCALE = 20.0
_MIN_PTS = 3
#: cell id encoding: cx * stride + cy (coords span ~[-20, 20] at this
#: scale, so 100k keeps ids collision-free and order-consistent)
_CID_STRIDE = 100_000


def q_grid_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.floor(F.col("embedding")[0].cast("double") * _GRID_SCALE)
        .cast("bigint")
        .alias("cx"),
        F.floor(F.col("embedding")[1].cast("double") * _GRID_SCALE)
        .cast("bigint")
        .alias("cy"),
    )
    cells = emb.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n"))
    core = cells.filter(F.col("n") >= _MIN_PTS).select(
        "cx", "cy", (F.col("cx") * _CID_STRIDE + F.col("cy")).alias("cid")
    )
    a, b = core.alias("a"), core.alias("b")
    edges = a.join(
        F.broadcast(b),
        (F.abs(F.col("a.cx") - F.col("b.cx")) <= 1)
        & (F.abs(F.col("a.cy") - F.col("b.cy")) <= 1),
    ).select(F.col("a.cid").alias("src"), F.col("b.cid").alias("dst"))
    comp = connected_components(edges).select(
        F.col("node").alias("cid"), F.col("component").alias("cluster")
    )
    labeled_core = core.join(comp, "cid")  # (cx, cy, cid, cluster)

    in_core = emb.join(
        F.broadcast(labeled_core.select("cx", "cy", "cluster")), ["cx", "cy"]
    ).select("vec_id", "cx", "cy", "cluster")
    rest = emb.join(
        F.broadcast(labeled_core.select("cx", "cy")), ["cx", "cy"], "left_anti"
    )
    border = (
        rest.alias("p")
        .join(
            F.broadcast(labeled_core.alias("k")),
            (F.abs(F.col("p.cx") - F.col("k.cx")) <= 1)
            & (F.abs(F.col("p.cy") - F.col("k.cy")) <= 1),
            "left",
        )
        .groupBy("p.vec_id", "p.cx", "p.cy")
        .agg(F.min("k.cluster").alias("cluster"))  # NULL when no core nearby
        .select(
            F.col("vec_id"), F.col("cx"), F.col("cy"), F.col("cluster")
        )
    )
    return in_core.unionByName(border).select(
        "vec_id", "cx", "cy", "cluster"
    )


ORACLE_GRID_DENSITY_CLUSTERS = f"""
WITH RECURSIVE e AS (
  SELECT vec_id,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * {_GRID_SCALE}) AS BIGINT) AS cx,
         CAST(floor(CAST(embedding[2] AS DOUBLE) * {_GRID_SCALE}) AS BIGINT) AS cy
  FROM embeddings
), cells AS (
  SELECT cx, cy, COUNT(*) AS n FROM e GROUP BY 1, 2
), core AS (
  SELECT cx, cy, cx * {_CID_STRIDE} + cy AS cid FROM cells WHERE n >= {_MIN_PTS}
), edges AS (
  SELECT a.cid AS src, b.cid AS dst
  FROM core a JOIN core b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
), reach AS (
  SELECT src AS a, src AS b FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT r.a, e2.dst FROM reach r JOIN edges e2 ON r.b = e2.src
), comp AS (
  SELECT a AS cid, MIN(b) AS cluster FROM reach GROUP BY a
), labeled AS (
  SELECT core.cx, core.cy, comp.cluster FROM core JOIN comp USING (cid)
), in_core AS (
  SELECT e.vec_id, e.cx, e.cy, l.cluster
  FROM e JOIN labeled l ON e.cx = l.cx AND e.cy = l.cy
), rest AS (
  SELECT e.* FROM e
  WHERE NOT EXISTS (SELECT 1 FROM labeled l WHERE l.cx = e.cx AND l.cy = e.cy)
), border AS (
  SELECT r.vec_id, r.cx, r.cy, MIN(l.cluster) AS cluster
  FROM rest r LEFT JOIN labeled l
    ON abs(r.cx - l.cx) <= 1 AND abs(r.cy - l.cy) <= 1
  GROUP BY 1, 2, 3
)
SELECT * FROM in_core UNION ALL SELECT * FROM border
"""

register(
    "grid_density_clusters", q_grid_density_clusters, ORACLE_GRID_DENSITY_CLUSTERS
)
