"""Property tests (hypothesis): the cache-blocked ray cast must equal
a literal transcription of the reference predicate on arbitrary rings
and points, and ring assembly invariants must hold for arbitrary ring
soups.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from esri_dump_spark.kernels.rings import (close_ring, points_in_ring,
                                           ring_is_clockwise,
                                           rings_to_geojson)

coord = st.floats(min_value=-180.0, max_value=180.0,
                  allow_nan=False, allow_infinity=False, width=64)


def _reference_raycast(points: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Direct transcription of lib/rings2geojson.ts:54-64."""
    px, py = points[:, 0], points[:, 1]
    inside = np.zeros(points.shape[0], dtype=bool)
    n = ring.shape[0]
    for i in range(n):
        j = i - 1 if i > 0 else n - 1
        xi, yi = ring[i]
        xj, yj = ring[j]
        yc = ((yi <= py) & (py < yj)) | ((yj <= py) & (py < yi))
        with np.errstate(divide="ignore", invalid="ignore"):
            xc = px < (xj - xi) * (py - yi) / (yj - yi) + xi
        inside ^= yc & xc
    return inside


@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=40),
       st.lists(st.tuples(coord, coord), min_size=1, max_size=300))
@settings(max_examples=60, deadline=None)
def test_raycast_matches_reference_transcription(ring_pts, query_pts):
    ring = close_ring(np.array(ring_pts, dtype=np.float64))
    pts = np.array(query_pts, dtype=np.float64)
    got = points_in_ring(pts, ring)
    exp = _reference_raycast(pts, ring)
    assert np.array_equal(got, exp)


@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=40),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_blocked_path_equals_broadcast_path(ring_pts, seed):
    ring = close_ring(np.array(ring_pts, dtype=np.float64))
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-180, 180, size=(70000, 2))
    # large call takes the cache-blocked path; chunked small calls take
    # the broadcast path — results must be identical
    big = points_in_ring(pts, ring)
    small = np.concatenate([points_in_ring(pts[i:i + 997], ring)
                            for i in range(0, len(pts), 997)])
    assert np.array_equal(big, small)


@given(st.lists(st.lists(st.tuples(coord, coord), min_size=3, max_size=12),
                min_size=1, max_size=6))
@settings(max_examples=60, deadline=None)
def test_assembly_invariants(raw_rings):
    geo = rings_to_geojson([np.array(r, dtype=np.float64)
                            for r in raw_rings])
    assert geo["type"] in ("Polygon", "MultiPolygon")
    polys = [geo["coordinates"]] if geo["type"] == "Polygon" \
        else geo["coordinates"]
    for poly in polys:
        for ring in poly:
            # every emitted ring is closed with >= 4 points
            assert len(ring) >= 4
            assert ring[0] == ring[-1]
