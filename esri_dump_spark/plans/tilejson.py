"""TileJSON derivation (EP3 / S8) — driver-side metadata transform.

Parity target: /root/reference/lib/tilejson.ts:84-220 — extent pick
order (fullExtent > extent > initialExtent), wkid fallback chain
(wkt -> latestWkid -> wkid, VERTCS-stripped), zoom rules (tileInfo.lods
else min/maxLOD else [0, 22]), vector_layers field map (drops
Geometry/Blob/Raster types), raster typing for ImageServer /
serviceDataType.

Reprojection: pyproj is not installed, so the engine ships exact
formulas for the two projections the reference's tests exercise
(EPSG:3857 / 102100 Web Mercator) and treats anything else as an
error — a lookup-table seam where production plugs in pyproj with the
same 4-corner min/max fold.
"""

from __future__ import annotations

import math

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


def bounds_from_extent(extent: dict | None):
    if not extent:
        return None
    sr = extent.get("spatialReference") or {}
    wkid = sr.get("wkid")
    latest = sr.get("latestWkid")
    if not sr or wkid == 4326 or latest == 4326:
        return [extent["xmin"], extent["ymin"], extent["xmax"], extent["ymax"]]

    candidates = [c for c in (latest, wkid) if isinstance(c, (int, float))]
    if any(int(c) in _MERCATOR_WKIDS for c in candidates):
        corners = [
            _mercator_to_lonlat(extent["xmin"], extent["ymin"]),
            _mercator_to_lonlat(extent["xmin"], extent["ymax"]),
            _mercator_to_lonlat(extent["xmax"], extent["ymin"]),
            _mercator_to_lonlat(extent["xmax"], extent["ymax"]),
        ]
        return [min(c[0] for c in corners), min(c[1] for c in corners),
                max(c[0] for c in corners), max(c[1] for c in corners)]
    raise NotImplementedError(
        f"CRS {candidates or sr.get('wkt', '')!r} requires pyproj; "
        "only 4326 and Web Mercator are built in")


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
