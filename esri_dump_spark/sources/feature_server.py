"""Synthetic ESRI FeatureServer replay (S2-S5 in SURVEY.md §2.1).

Replays the server-side semantics the reference's paged scans depend
on, without a network:

  * layer metadata with fields / extent / geometryType / maxRecordCount
    and the capability checks the reference's #fetchMeta validates
  * ``returnCountOnly`` count probe
  * offset paging (``resultOffset``) in stable OID order
  * envelope (bbox) queries with *inclusive* boundary intersection —
    so features on a split line are returned by multiple quadrants,
    exercising the cross-partition OID dedup exactly like overlapping
    bbox pages do against a live server
  * ``exceededTransferLimit`` when an envelope matches more than
    ``max_record_count`` rows

Everything is a pure function of (seed, feature index), so executors
can regenerate any page independently — the object is tiny and
picklable, making it a legitimate distributed source: the *page
manifest* is the DataFrame, the page decode runs in ``mapInPandas``.
"""

from __future__ import annotations

import math
import zlib
from dataclasses import dataclass, field

import numpy as np

__all__ = ["SyntheticFeatureServer", "TransientServerError",
           "DEFAULT_EXTENT"]


class TransientServerError(RuntimeError):
    """A retryable server failure (the reference sees these as
    ``data.error`` responses and retries the page up to 5 times,
    /root/reference/lib/geometry.ts:105-142)."""

# the reference test-suite envelope (test/geometry.test.ts:6-10)
DEFAULT_EXTENT = (-97.0189932385465, 20.52053000026018,
                  -88.57449931419137, 29.116263085773653)

_FIELDS = [
    {"name": "objectid", "type": "esriFieldTypeOID"},
    {"name": "name", "type": "esriFieldTypeString", "length": 64},
    {"name": "eventdate", "type": "esriFieldTypeDate"},
    {"name": "rotation", "type": "esriFieldTypeInteger"},
    {"name": "value", "type": "esriFieldTypeDouble"},
]


def _round7(x: float) -> float:
    """geometryPrecision=7 — server-side coordinate rounding (P5)."""
    return round(x, 7)


@dataclass
class SyntheticFeatureServer:
    """A deterministic layer. geometry_type in {'esriGeometryPoint',
    'esriGeometryPolygon', 'esriGeometryPolyline'}."""

    n_features: int = 5000
    geometry_type: str = "esriGeometryPoint"
    max_record_count: int = 1000
    seed: int = 42
    extent: tuple = DEFAULT_EXTENT
    capabilities: str = "Map,Query,Data"
    attribute_only_every: int = 97   # rows with no geometry (P3 filter)
    # failure injection (E1): every ``flaky_every``-th page fails its
    # first ``flaky_failures`` attempts with a TransientServerError;
    # the per-process attempt counter makes retries deterministic
    flaky_every: int = 0
    flaky_failures: int = 2
    # every feature at ONE point (worst case for the quadtree: no split
    # can separate coincident features, forcing the depth-capped-leaf
    # offset-paging drain path)
    coincident_at: tuple | None = None
    # False replays an ArcGIS endpoint with supportsPagination=false:
    # resultOffset is ignored on envelope queries — the same first page
    # returns with exceededTransferLimit=true forever
    supports_pagination: bool = True
    _attempts: dict = field(default_factory=dict, repr=False, compare=False)

    def _maybe_fail(self, key) -> None:
        if not self.flaky_every:
            return
        if key[0] == "page":
            page_no = key[1]
        else:
            # stable across processes — hash() of a str-bearing tuple is
            # PYTHONHASHSEED-randomized, which would change WHICH
            # envelopes fail run to run (the module contract is
            # determinism as a pure function of the key)
            page_no = zlib.crc32(repr(key).encode())
        # every flaky_every-th page starting at page 1; the `1 %` keeps
        # flaky_every=1 meaning "every page" (n % 1 == 0 for all n)
        if (page_no % self.flaky_every) != (1 % self.flaky_every):
            return
        k = self._attempts.get(key, 0)
        if k < self.flaky_failures:
            self._attempts[key] = k + 1
            raise TransientServerError(
                f"synthetic transient failure {key} attempt={k + 1}")

    def metadata(self) -> dict:
        xmin, ymin, xmax, ymax = self.extent
        return {
            "name": "synthetic-layer",
            "geometryType": self.geometry_type,
            "capabilities": self.capabilities,
            "maxRecordCount": self.max_record_count,
            "extent": {"xmin": xmin, "ymin": ymin, "xmax": xmax,
                       "ymax": ymax,
                       "spatialReference": {"wkid": 4326}},
            "fields": list(_FIELDS),
        }

    # ------------------------------------------------------------ features

    def _lonlat(self, i: int) -> tuple[float, float]:
        """Deterministic position; ~20% of rows collapse into one hot
        sub-cell of the extent to create join skew."""
        if self.coincident_at is not None:
            return self.coincident_at
        xmin, ymin, xmax, ymax = self.extent
        # splitmix-style integer scramble, stable across platforms
        z = (i + self.seed * 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z ^= z >> 31
        u = (z & 0xFFFFFFFF) / 2**32
        v = ((z >> 32) & 0xFFFFFFFF) / 2**32
        if i % 5 == 0:  # hot spot: 20% of rows in a tiny box
            lon = xmin + (xmax - xmin) * (0.25 + 0.002 * u)
            lat = ymin + (ymax - ymin) * (0.25 + 0.002 * v)
        else:
            lon = xmin + (xmax - xmin) * u
            lat = ymin + (ymax - ymin) * v
        return _round7(lon), _round7(lat)

    def feature(self, i: int) -> dict:
        """Raw ESRI feature i (0-based); oid = i + 1."""
        oid = i + 1
        attrs = {
            "objectid": oid,
            "name": f"feat-{i}",
            # exercise the falsy guard (P1): None and 0 stay raw
            "eventdate": (None if i % 11 == 3 else
                          0 if i % 11 == 7 else
                          1600000000000 + i * 86400000),
            "rotation": i % 360,
            "value": round(i * 0.5, 2),
        }
        if self.attribute_only_every and i % self.attribute_only_every == 5:
            return {"attributes": attrs, "geometry": None}

        lon, lat = self._lonlat(i)
        if self.geometry_type == "esriGeometryPoint":
            geom = {"x": lon, "y": lat}
        elif self.geometry_type == "esriGeometryPolygon":
            d = 0.01 + (i % 10) * 0.001
            shell = [[lon, lat], [lon, _round7(lat + d)],
                     [_round7(lon + d), _round7(lat + d)],
                     [_round7(lon + d), lat], [lon, lat]]  # CW (y-up)
            rings = [shell]
            if i % 10 == 0:  # add a CCW hole
                h0, h1 = _round7(lon + d / 4), _round7(lat + d / 4)
                h2, h3 = _round7(lon + d / 2), _round7(lat + d / 2)
                rings.append([[h0, h1], [h2, h1], [h2, h3], [h0, h3], [h0, h1]])
            geom = {"rings": rings}
        elif self.geometry_type == "esriGeometryPolyline":
            geom = {"paths": [[[lon, lat],
                               [_round7(lon + 0.01), _round7(lat + 0.01)]]]}
        else:
            geom = None
        return {"attributes": attrs, "geometry": geom}

    def _feature_bbox(self, i: int):
        f = self.feature(i)
        g = f["geometry"]
        if g is None:
            return None
        if "x" in g:
            return (g["x"], g["y"], g["x"], g["y"])
        pts = [p for part in (g.get("rings") or g.get("paths")) for p in part]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        return (min(xs), min(ys), max(xs), max(ys))

    # ------------------------------------------------------------ queries

    def query_count(self, top_filter: dict | None = None) -> int:
        """returnCountOnly=true (optionally against /queryTopFeatures)."""
        if top_filter is not None:
            return len(self.top_feature_indices(top_filter))
        return self.n_features

    def top_feature_indices(self, top_filter: dict) -> list[int]:
        """S5 / queryTopFeatures server semantics: the top ``topCount``
        rows per ``groupByFields`` group ordered by ``orderByFields``
        (ties broken by OID ascending, nulls last — ArcGIS behavior),
        returned as feature indices in stable OID order for paging.
        The reference only swaps the URL fragment
        (/root/reference/lib/geometry.ts:74) and forwards the client's
        topFilter param — the reduction itself is server-side, which is
        what this replays."""
        group_fields = [s.strip()
                        for s in str(top_filter["groupByFields"]).split(",")]
        # orderByFields is a comma-separated list of "field [ASC|DESC]"
        # specs (ArcGIS accepts several, incl. string fields). Parse
        # every spec; sort multi-key via sequential stable passes.
        order: list[tuple[str, bool]] = []
        for spec in str(top_filter.get("orderByFields", "")).split(","):
            spec = spec.strip()
            if not spec:
                continue
            fld, _, dirn = spec.partition(" ")
            order.append((fld.strip(), dirn.strip().upper() == "DESC"))
        k = int(top_filter["topCount"])
        groups: dict[tuple, list] = {}
        for i in range(self.n_features):
            at = self.feature(i)["attributes"]
            key = tuple(at.get(g) for g in group_fields)
            vals = tuple(at.get(f) for f, _ in order)
            groups.setdefault(key, []).append((vals, at["objectid"], i))
        keep: list[int] = []
        for rows in groups.values():
            # (field1 dir1, field2 dir2, ..., oid ASC, NULLs last per
            # field) without arithmetic negation so string orderByFields
            # work. Python sorts are stable (reverse=True keeps ties in
            # original order), so sorting by oid first, then applying
            # one stable pass per field from LAST key to FIRST, yields
            # the multi-key order with oid as the final tie-break.
            rows.sort(key=lambda r: r[1])
            for j in range(len(order) - 1, -1, -1):
                desc = order[j][1]
                valued = [r for r in rows if r[0][j] is not None]
                nones = [r for r in rows if r[0][j] is None]
                valued.sort(key=lambda r: r[0][j], reverse=desc)
                rows = valued + nones
            keep.extend(idx for _, _, idx in rows[:k])
        return sorted(keep)

    def query_page(self, offset: int, page_size: int | None = None,
                   top_filter: dict | None = None) -> list[dict]:
        """resultOffset paging in OID order (/query, or
        /queryTopFeatures when ``top_filter`` is given)."""
        page_size = page_size or self.max_record_count
        self._maybe_fail(("page", offset // page_size))
        if top_filter is not None:
            idxs = self.top_feature_indices(top_filter)
            return [self.feature(i) for i in idxs[offset:offset + page_size]]
        end = min(offset + page_size, self.n_features)
        return [self.feature(i) for i in range(offset, end)]

    def _bbox_match(self, i: int, env) -> bool:
        fb = self._feature_bbox(i)
        if fb is None:
            # attribute-only rows still match spatial queries in ArcGIS
            # only when no geometry filter applies; envelope query skips
            return False
        xmin, ymin, xmax, ymax = env
        return not (fb[2] < xmin or fb[0] > xmax or fb[3] < ymin or fb[1] > ymax)

    def _candidate_indices(self, top_filter: dict | None):
        if top_filter is not None:
            return self.top_feature_indices(top_filter)
        return range(self.n_features)

    def query_bbox_count(self, env, top_filter: dict | None = None) -> int:
        return sum(1 for i in self._candidate_indices(top_filter)
                   if self._bbox_match(i, env))

    def query_bbox(self, env, top_filter: dict | None = None,
                   offset: int = 0) -> tuple[list[dict], bool]:
        """Returns (features, exceeded_transfer_limit). Inclusive edge
        intersection => duplicates across adjacent quadrants. With
        ``top_filter`` the envelope scans the /queryTopFeatures-reduced
        set (top-k reduction precedes the spatial filter, as on the
        live endpoint). ``offset`` replays resultOffset paging WITHIN
        an envelope (the live endpoint accepts geometry + resultOffset
        together) — how a depth-capped quadtree leaf that still
        exceeds maxRecordCount is drained without data loss."""
        self._maybe_fail(("bbox", tuple(env)))
        if not self.supports_pagination:
            offset = 0
        out = []
        skipped = 0
        for i in self._candidate_indices(top_filter):
            if self._bbox_match(i, env):
                if skipped < offset:
                    skipped += 1
                    continue
                out.append(self.feature(i))
                if len(out) > self.max_record_count:
                    return out[: self.max_record_count], True
        return out, False
