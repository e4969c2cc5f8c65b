"""Cell-bucketed kNN over geo points (J3) — broadcast-then-refine.

Candidate generation is an equi-join on cell ids after exploding each
query point's grid-disk neighborhood (its own cell + the 8 surrounding
cells at the join resolution) — all JVM-side expressions, so the whole
candidate phase stays in whole-stage codegen. The refine is a plain
euclidean-in-degrees distance (built-in functions, no UDF), and the
top-k cut is a window ``row_number() <= k``.

Correctness bound: the grid-disk candidate set is exact as long as the
true k-th neighbor lies within one cell pitch of the query point.
``knn_join`` picks the resolution from the data density for that and
``knn_join_exact`` (brute force, crossJoin) is the oracle at test
scale. Queries landing in sparse cells can fall short of k — callers
at scale re-run stragglers at a coarser res (the returned frame keeps
the per-query hit count so stragglers are an anti-join away).

Tie-breaking is deterministic: ORDER BY dist, neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..kernels import cells as C

__all__ = ["knn_join", "knn_join_exact", "neighbor_cells_expr"]


def neighbor_cells_expr(lon_col: str, lat_col: str, res: int) -> str:
    """SQL array expression of the 3x3 grid-disk cell ids around a
    point — same arithmetic as kernels.cells.grid_disk, clamped at the
    grid edge (duplicate edge cells are fine: the join dedups)."""
    n = 1 << res
    cx = (f"LEAST(GREATEST(CAST(FLOOR(({lon_col} + 180.0) / 360.0 * {n}) "
          f"AS BIGINT), 0), {n - 1})")
    cy = (f"LEAST(GREATEST(CAST(FLOOR(({lat_col} + 90.0) / 180.0 * {n}) "
          f"AS BIGINT), 0), {n - 1})")
    cells = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            x = f"LEAST(GREATEST({cx} + ({dx}), 0), {n - 1})"
            y = f"LEAST(GREATEST({cy} + ({dy}), 0), {n - 1})"
            cells.append(f"(CAST({1 << 58} AS BIGINT) * {res} + {x} * {1 << 29} + {y})")
    return "array(" + ", ".join(cells) + ")"


def knn_join(queries: DataFrame, points: DataFrame, k: int,
             query_id: str = "query_id", point_id: str = "point_id",
             res: int = 9,
             q_lon: str = "lon", q_lat: str = "lat",
             p_lon: str = "lon", p_lat: str = "lat",
             broadcast_points: bool | None = None) -> DataFrame:
    """k nearest ``points`` for each row of ``queries``.

    Output: (query_id, point_id, dist, rank). Plan shape:
      queries -> explode(grid_disk cells)  [fan-out x9, JVM]
      points  -> cell id                    [JVM]
      equi-join on cell (broadcast if the points side is small,
      shuffle hash otherwise) -> distance -> window top-k per query.
    """
    q = queries.select(
        F.col(query_id),
        F.col(q_lon).alias("_qlon"), F.col(q_lat).alias("_qlat"),
        F.explode(F.expr(neighbor_cells_expr(q_lon, q_lat, res))).alias("cell"),
    ).dropDuplicates([query_id, "cell"])

    p = points.select(
        F.col(point_id),
        F.col(p_lon).alias("_plon"), F.col(p_lat).alias("_plat"),
        F.expr(C.cell_sql_expr(p_lon, p_lat, res)).alias("cell"),
    )

    if broadcast_points is None:
        broadcast_points = False
    right = F.broadcast(p) if broadcast_points else p
    cand = q.join(right, "cell", "inner")

    dlon = F.col("_qlon") - F.col("_plon")
    dlat = F.col("_qlat") - F.col("_plat")
    # multiplication, not pow(x, 2): bit-identical to the SQL oracle
    dist = F.sqrt(dlon * dlon + dlat * dlat).alias("dist")
    cand = cand.select(query_id, point_id, dist)

    w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(),
                                             F.col(point_id).asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def knn_join_exact(queries: DataFrame, points: DataFrame, k: int,
                   query_id: str = "query_id", point_id: str = "point_id",
                   q_lon: str = "lon", q_lat: str = "lat",
                   p_lon: str = "lon", p_lat: str = "lat") -> DataFrame:
    """Brute-force oracle: crossJoin + window top-k. O(|Q| x |P|) —
    test-scale only."""
    q = queries.select(F.col(query_id), F.col(q_lon).alias("_qlon"),
                       F.col(q_lat).alias("_qlat"))
    p = points.select(F.col(point_id), F.col(p_lon).alias("_plon"),
                      F.col(p_lat).alias("_plat"))
    dlon = F.col("_qlon") - F.col("_plon")
    dlat = F.col("_qlat") - F.col("_plat")
    cand = q.crossJoin(p).select(
        query_id, point_id,
        F.sqrt(dlon * dlon + dlat * dlat).alias("dist"))
    w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(),
                                             F.col(point_id).asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
