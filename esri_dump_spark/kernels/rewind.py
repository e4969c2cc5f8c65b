"""RFC-7946 right-hand-rule rewind (G8 in SURVEY.md §2.3).

Parity target: /root/reference/lib/rewind.ts:10-54 — ring 0 of every
(Multi)Polygon forced counter-clockwise, inner rings clockwise, with a
*compensated* shoelace signed-area so near-zero sliver polygons get the
correct sign (the reference uses a Neumaier-style running compensation;
we use math.fsum which is correctly rounded and therefore at least as
accurate — the `near-zero` golden fixture checks this).

Works on plain GeoJSON dicts (Feature / FeatureCollection /
GeometryCollection / Polygon / MultiPolygon); mutates in place and
returns the object, like the reference.
"""

from __future__ import annotations

import math

__all__ = ["rewind", "ring_signed_sum"]


def ring_signed_sum(ring) -> float:
    """Compensated shoelace-style sum: sum((x_i - x_j) * (y_j + y_i))
    over consecutive vertex pairs (j = i-1, wrapping). >= 0 means
    clockwise under this convention."""
    terms = []
    n = len(ring)
    j = n - 1
    for i in range(n):
        terms.append((ring[i][0] - ring[j][0]) * (ring[j][1] + ring[i][1]))
        j = i
    return math.fsum(terms)


def _rewind_ring(ring: list, direction: bool) -> None:
    # reference: if (area >= 0) != !!dir -> reverse
    if (ring_signed_sum(ring) >= 0) != bool(direction):
        ring.reverse()


def _rewind_rings(rings: list, outer) -> None:
    if not rings:
        return
    _rewind_ring(rings[0], outer)
    for i in range(1, len(rings)):
        _rewind_ring(rings[i], not outer)


def rewind(gj, outer=None):
    """Normalize winding order in place; returns ``gj``.

    ``outer`` mirrors the reference's (undocumented) second argument:
    falsy => ring 0 counter-clockwise (the RFC-7946 default).
    """
    t = gj.get("type") if gj else None
    if t == "FeatureCollection":
        for f in gj["features"]:
            rewind(f, outer)
    elif t == "GeometryCollection":
        for g in gj["geometries"]:
            rewind(g, outer)
    elif t == "Feature":
        # .get: a Feature with no geometry key is legal lenient
        # GeoJSON; the reference's `gj && gj.type` guard recurses on
        # undefined and returns safely (rewind.ts)
        rewind(gj.get("geometry"), outer)
    elif t == "Polygon":
        _rewind_rings(gj["coordinates"], outer)
    elif t == "MultiPolygon":
        for poly in gj["coordinates"]:
            _rewind_rings(poly, outer)
    return gj
