"""TileJSON derivation (EP3 / S8) — driver-side metadata transform.

Parity target: /root/reference/lib/tilejson.ts:84-220 — extent pick
order (fullExtent > extent > initialExtent), wkid fallback chain
(wkt -> latestWkid -> wkid, VERTCS-stripped), zoom rules (tileInfo.lods
else min/maxLOD else [0, 22]), vector_layers field map (drops
Geometry/Blob/Raster types), raster typing for ImageServer /
serviceDataType.

Reprojection: pyproj is not installed; the engine ships its own WKT
parser + ellipsoidal projection kernels (kernels/proj.py) and a
compact parameter table derived from the reference's full public
wkid lookup (lib/wkid.json, 4582 CRS — rebuilt by
scripts/build_wkid_table.py). The 4-corner min/max fold matches
lib/tilejson.ts:119-135; WKT in spatialReference is parsed directly
(VERTCS-stripped first); web-mercator wkids absent from the table
(102100/900913/102113) use the built-in spherical formulas, the same
role proj4js's built-in EPSG:3857 definition plays. Projection
families proj4js cannot transform raise UnsupportedProjectionError —
the reference throws on those too.
"""

from __future__ import annotations

import json as _json
import math
import os

from ..kernels.proj import (UnsupportedProjectionError, crs_from_wkt,
                            inverse_to_lonlat)

__all__ = ["tilejson", "bounds_from_extent", "strip_vertical_reference"]

_FIELD_TYPES = {
    "esriFieldTypeDate": "date-time",
    "esriFieldTypeString": "string",
    "esriFieldTypeDouble": "number",
    "esriFieldTypeSingle": "number",
    "esriFieldTypeOID": "number",
    "esriFieldTypeInteger": "integer",
    "esriFieldTypeSmallInteger": "integer",
    "esriFieldTypeGlobalID": "string",
    "esriFieldTypeGUID": "string",
    "esriFieldTypeXML": "string",
}

_MERCATOR_WKIDS = {3857, 102100, 900913, 102113}
_R = 6378137.0


def strip_vertical_reference(wkt: str) -> str:
    """Remove a trailing VERTCS/VERTCRS block by bracket-depth scan."""
    for marker in (",VERTCS[", ",VERTCRS["):
        start = wkt.find(marker)
        if start == -1:
            continue
        depth = 0
        seen_open = False
        for index in range(start, len(wkt)):
            ch = wkt[index]
            if ch == "[":
                depth += 1
                seen_open = True
            elif ch == "]":
                depth -= 1
                if seen_open and depth == 0:
                    return wkt[:start] + wkt[index + 1:]
    return wkt


def _mercator_to_lonlat(x: float, y: float) -> tuple[float, float]:
    lon = math.degrees(x / _R)
    lat = math.degrees(2.0 * math.atan(math.exp(y / _R)) - math.pi / 2.0)
    return lon, lat


def _extent_from_metadata(metadata: dict):
    for key in ("fullExtent", "extent", "initialExtent"):
        if metadata.get(key):
            return metadata[key]
    return None


_WKID_TABLE_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "wkid_params.json")
_WKID_TABLE: dict | None = None


def _wkid_table() -> dict:
    global _WKID_TABLE
    if _WKID_TABLE is None:
        with open(_WKID_TABLE_PATH) as f:
            _WKID_TABLE = _json.load(f)
    return _WKID_TABLE


def _crs_for_wkid(wkid: int) -> dict | None:
    tab = _wkid_table()
    e = tab["entries"].get(str(int(wkid)))
    if e is None:
        return None
    pname = tab["projections"][e[0]]
    return {"kind": "projected" if pname else "geographic",
            "projection": pname or None, "a": e[1], "rf": e[2],
            "primem_deg": e[3], "unit_to_m": e[4], "params": e[5]}


def _fold_corners(transform, extent):
    corners = [
        transform(extent["xmin"], extent["ymin"]),
        transform(extent["xmin"], extent["ymax"]),
        transform(extent["xmax"], extent["ymin"]),
        transform(extent["xmax"], extent["ymax"]),
    ]
    return [min(c[0] for c in corners), min(c[1] for c in corners),
            max(c[0] for c in corners), max(c[1] for c in corners)]


def bounds_from_extent(extent: dict | None):
    if not extent:
        return None
    sr = extent.get("spatialReference") or {}
    wkid = sr.get("wkid")
    latest = sr.get("latestWkid")
    if not sr or wkid == 4326 or latest == 4326:
        return [extent["xmin"], extent["ymin"], extent["xmax"], extent["ymax"]]

    # reference's projectionDefinition order (lib/tilejson.ts:84-103):
    # explicit WKT first, then latestWkid, then wkid table lookups
    if sr.get("wkt"):
        crs = crs_from_wkt(strip_vertical_reference(str(sr["wkt"])))
        return _fold_corners(
            lambda x, y: inverse_to_lonlat(crs, x, y), extent)

    # `not bool`: the reference's `typeof === 'number'` filter drops
    # booleans, and Python's bool is an int subclass
    candidates = [c for c in (latest, wkid)
                  if isinstance(c, (int, float)) and not isinstance(c, bool)]
    for c in candidates:
        if int(c) == 4326:
            return [extent["xmin"], extent["ymin"],
                    extent["xmax"], extent["ymax"]]
        crs = _crs_for_wkid(int(c))
        if crs is not None:
            return _fold_corners(
                lambda x, y: inverse_to_lonlat(crs, x, y), extent)
    # proj4's built-in EPSG:3857 role for web-mercator ids the table
    # doesn't carry
    if any(int(c) in _MERCATOR_WKIDS for c in candidates):
        return _fold_corners(_mercator_to_lonlat, extent)
    if not candidates:
        # reference parity (lib/tilejson.ts:101): a spatialReference
        # with no wkt and no NUMERIC wkid/latestWkid (string wkid,
        # vcsWkid only, ...) falls back to 'EPSG:4326' — an identity
        # proj4 call, i.e. raw-extent passthrough — rather than failing
        return [extent["xmin"], extent["ymin"],
                extent["xmax"], extent["ymax"]]
    raise UnsupportedProjectionError(
        f"CRS {candidates!r}: no wkid-table definition and no "
        "built-in fallback (proj4js would equally fail on "
        f"'EPSG:{int(candidates[0])}')")


def _zoom_range(metadata: dict) -> tuple[int, int]:
    ti = metadata.get("tileInfo")
    if ti and isinstance(ti.get("lods"), list) and ti["lods"]:
        return int(ti["lods"][0]["level"]), int(ti["lods"][-1]["level"])

    def _num(v):
        try:
            f = float(v)
            return None if math.isnan(f) else f
        except (TypeError, ValueError):
            return None

    mn, mx = _num(metadata.get("minLOD")), _num(metadata.get("maxLOD"))
    if mn is not None or mx is not None:
        return (0 if mn is None else int(mn), 22 if mx is None else int(mx))
    return 0, 22


def _vector_layers(metadata: dict):
    fields = metadata.get("fields")
    if not isinstance(fields, list):
        return None
    out = {}
    for f in fields:
        t = str(f.get("type"))
        if t in ("esriFieldTypeGeometry", "esriFieldTypeBlob",
                 "esriFieldTypeRaster"):
            continue
        out[str(f["name"])] = _FIELD_TYPES.get(t, "string")
    return [{"id": "out", "fields": out}]


def _source_type(metadata: dict, resource_type: str | None) -> str:
    if resource_type == "ImageServer":
        return "raster"
    if metadata.get("geometryType"):
        return "vector"
    if metadata.get("serviceDataType"):
        return "raster"
    return "vector"


def tilejson(metadata: dict, resource_type: str | None = None) -> dict:
    bounds = bounds_from_extent(_extent_from_metadata(metadata))
    minzoom, maxzoom = _zoom_range(metadata)
    src_type = _source_type(metadata, resource_type)
    name = (metadata.get("name") or metadata.get("mapName")
            or (metadata.get("documentInfo") or {}).get("Title"))
    description = (metadata.get("description")
                   or metadata.get("serviceDescription") or "")
    attribution = metadata.get("copyrightText") or None

    doc = {
        "tilejson": "3.0.0",
        "version": "1.0.0",
        "scheme": "xyz",
        "type": src_type,
        "minzoom": minzoom,
        "maxzoom": maxzoom,
    }
    if name:
        doc["name"] = str(name)
    if description:
        doc["description"] = str(description)
    if attribution:
        doc["attribution"] = str(attribution)
    if bounds:
        doc["bounds"] = bounds
        doc["center"] = [(bounds[0] + bounds[2]) / 2,
                         (bounds[1] + bounds[3]) / 2]
    if src_type == "vector":
        layers = _vector_layers(metadata)
        if layers:
            doc["vector_layers"] = layers
    return doc
