"""SQL twins of the geometry predicates — oracle-grade ANSI SQL.

These generate plain SQL expressions (valid in both Spark SQL and
DuckDB) for the engine's core spatial predicates so that every spatial
operator has an independent, engine-external oracle:

  * ``derived_lonlat_sql``  — deterministic synthetic coordinates from
    an integer key (exact integer mod arithmetic, then one division:
    bit-identical across engines)
  * ``raycast_sql``         — the reference's even-odd ray-cast
    (/root/reference/lib/rings2geojson.ts:54-64) UNROLLED over a fixed
    ring's edges as CASE WHEN terms; the same half-open inequalities,
    so the SQL and the NumPy kernel agree on every point that doesn't
    sit exactly on an edge (fixtures avoid edge-grid collisions)
"""

from __future__ import annotations

__all__ = ["derived_lonlat_sql", "raycast_sql"]


def derived_lonlat_sql(key: str, lon_mod: int = 36000, lat_mod: int = 18000,
                       lon_off: float = -180.0, lat_off: float = -90.0):
    """(lon_sql, lat_sql): pseudo-uniform 0.01-degree-grid coordinates
    from a bigint key. Defaults span the globe; pass smaller mods and
    offsets to target a window."""
    # explicit CAST AS DOUBLE: Spark parses bare decimal literals as
    # DECIMAL type (DuckDB as DOUBLE); the cast pins both engines to
    # IEEE double arithmetic
    lon = f"(CAST((({key}) * 7919) % {lon_mod} AS DOUBLE) / 100.0 + ({lon_off}))"
    lat = f"(CAST((({key}) * 104729) % {lat_mod} AS DOUBLE) / 100.0 + ({lat_off}))"
    return lon, lat


def raycast_sql(ring: list[list[float]], px: str, py: str) -> str:
    """Boolean SQL: point (px, py) inside ``ring`` by the reference's
    exact even-odd crossing rule. ``ring`` must be closed (first ==
    last); edges are (j -> i) pairs like the reference loop."""
    assert ring[0] == ring[-1], "ring must be closed"
    terms = []
    n = len(ring) - 1  # unique vertices
    for i in range(n):
        j = (i - 1) % n
        xi, yi = ring[i]
        xj, yj = ring[j]
        if yi == yj:
            continue  # horizontal edge never satisfies the y-interval
        cond_y = (f"(({yi} <= {py} AND {py} < {yj}) OR "
                  f"({yj} <= {py} AND {py} < {yi}))")
        cross = f"(({xj}) - ({xi})) * (({py}) - ({yi})) / (({yj}) - ({yi})) + ({xi})"
        terms.append(f"CASE WHEN {cond_y} AND ({px}) < ({cross}) "
                     f"THEN 1 ELSE 0 END")
    if not terms:
        return "FALSE"
    return "((" + " + ".join(terms) + ") % 2 = 1)"
