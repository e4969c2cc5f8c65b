"""Pure-SQL geometry statistics over ESRI rings_json columns.

The rings stay JSON on disk (the extract sink's format); these helpers
parse and fold them entirely with JVM higher-order functions
(from_json / transform / aggregate), so per-polygon stats run in
whole-stage codegen with zero Python — the cheap-metadata path for
polygon tables at warehouse scale (a billion parcels' vertex counts
and areas should not wake a Python worker).

Shoelace convention: signed ring area is positive for counter-
clockwise vertex order in y-up coordinates, so ESRI clockwise shells
come out negative and their counter-clockwise holes positive — the
signed SUM over all rings is therefore -(shell area - hole area) and
its magnitude is the even-odd filled area. The wrap term of an
explicitly closed ring is zero, so closure never changes the result
(same invariance as ``kernels.rings.close_ring`` consumers).

DuckDB twin: ``polygon_stats_sql_duck`` emits the same folds over
``CAST(rings_json AS DOUBLE[][][])`` with 1-based list indexing —
the oracle recomputes, it does not freeze literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_polygon_stats", "polygon_stats_sql_duck"]

_RINGS_TYPE = "array<array<array<double>>>"

# signed shoelace of one ring `r` (array of [x, y]), Spark SQL HOFs;
# element_at is 1-based, transform's index 0-based. The successor
# point is bound ONCE per vertex (zip_with against the rotated ring)
# instead of re-evaluating element_at twice in the cross term; the
# per-vertex terms and the fold order are unchanged, so the result is
# bit-identical to the pre-hoist form (and to the DuckDB twin).
_RING_AREA = (
    "aggregate(zip_with(r, "
    "transform(r, (p, i) -> element_at(r, ((i + 1) % size(r)) + 1)), "
    "(p, q) -> element_at(p, 1) * element_at(q, 2)"
    " - element_at(q, 1) * element_at(p, 2)), "
    "CAST(0 AS DOUBLE), (a, v) -> a + v) / 2.0")


def with_polygon_stats(df: DataFrame, rings_col: str = "rings_json",
                       round_digits: int = 6) -> DataFrame:
    """Append (n_rings, n_vertices, area_r) computed from the JSON
    rings column — JVM-only expressions, no Python anywhere.
    ``area_r`` is the signed ring-area sum rounded to ``round_digits``
    (rounding pins the cross-engine float fold order). The trailing
    ``+ 0.0`` normalizes signed zero: Spark's round() routes through
    Java BigDecimal (no -0.0) while DuckDB's IEEE round() can emit
    -0.0 on degenerate slivers; IEEE ``-0.0 + 0.0 = 0.0`` pins both
    engines to the same bit pattern (twin carries the same term)."""
    rings = F.from_json(F.col(rings_col), _RINGS_TYPE)
    return (df.withColumn("_rings", rings)
            .withColumn("n_rings", F.size("_rings"))
            .withColumn("n_vertices", F.expr(
                "aggregate(_rings, 0, (a, r) -> a + size(r))"))
            .withColumn("area_r", F.round(F.expr(
                "aggregate(transform(_rings, r -> " + _RING_AREA + "), "
                "CAST(0 AS DOUBLE), (a, v) -> a + v)"), round_digits) + F.lit(0.0))
            .drop("_rings"))


def polygon_stats_sql_duck(values_rows: str, round_digits: int = 6) -> str:
    """DuckDB twin over a VALUES list of (poly_id, rings_json) rows:
    identical parse + folds with DuckDB list functions (1-based
    subscripts; r[i][1] = x, r[i][2] = y)."""
    return f"""
        WITH src(poly_id, rings_json) AS (VALUES
             {values_rows}),
        parsed AS (SELECT poly_id,
                          CAST(rings_json AS DOUBLE[][][]) AS rings
                   FROM src)
        SELECT CAST(poly_id AS BIGINT) AS poly_id,
               CAST(len(rings) AS INT) AS n_rings,
               CAST(list_sum(list_transform(rings, r -> len(r)))
                    AS INT) AS n_vertices,
               round(list_sum(list_transform(rings, r ->
                   list_sum(list_transform(range(1, len(r) + 1), i ->
                       r[i][1] * r[(i % len(r)) + 1][2]
                       - r[(i % len(r)) + 1][1] * r[i][2])) / 2.0)),
                     {round_digits}) + 0.0 AS area_r
        FROM parsed"""
