"""MapLibre StyleJSON compiler (EP3 / §2.1 S8, §2.4 A5-A6, §2.7 F7).

Re-expresses the reference's renderer -> style compilation
(/root/reference/lib/stylejson.ts:1092-1135 entry, :500-615 symbol
dispatch, :622-845 uniqueValue match / classBreaks step compilation,
:985-1063 labels) as a data-driven Python builder: one generic
per-ml-type property table serves simple, uniqueValue (MapLibre
``match`` expressions) and classBreaks (``step`` expressions) alike,
instead of the reference's per-type function family. Behavior parity
targets: constant-collapse in match (:355-371), sprite content-hash id
(:320-348), dash table (:300-315), pt->px and opacity rounding
(:277-295), placement anchors (:1066-1080).

Driver-side, single-document — no Spark needed. The row-level analog
of the ``match``/``step`` trees is ``plans/renderer.py:
compile_renderer`` (Catalyst CASE WHEN columns over feature rows) —
analog, not twin: the classBreaks ``step`` here pairs each
classMaxValue stop with that SAME class's style, exactly as the
reference's stepExpr does (stylejson.ts:853/898 — parity-pinned), so a
value between two maxima draws the PREVIOUS class's style, while
compile_renderer (classMinValue-based stops) assigns it the next
class. Do not "fix" either side: both faithfully mirror their
reference counterparts.
"""

from __future__ import annotations

import json

from .renderer import (layer_opacity, parse_value, pt_to_px, rgba,
                       scale_to_zoom)

__all__ = ["stylejson", "sprite_id", "ml_match", "ml_step", "DASH_PATTERNS"]

SOURCE_ID = "esri"
SOURCE_LAYER = "out"

DASH_PATTERNS = {
    "esriSLSDash": [4, 3],
    "esriSLSDot": [1, 3],
    "esriSLSDashDot": [4, 3, 1, 3],
    "esriSLSDashDotDot": [4, 3, 1, 3, 1, 3],
    "esriSLSLongDash": [8, 3],
    "esriSLSLongDashDot": [8, 3, 1, 3],
    "esriSLSShortDash": [4, 1],
    "esriSLSShortDot": [1, 1],
    "esriSLSShortDashDot": [4, 1, 1, 1],
    "esriSLSShortDashDotDot": [4, 1, 1, 1, 1, 1],
}


# ------------------------------------------------------------- sprites

def sprite_id(symbol: dict) -> str:
    """Content-hash sprite id — JS 32-bit string hash, base36
    (reference :322-327)."""
    if symbol.get("url"):
        return f"esri-{symbol['url']}"
    h = 0
    for ch in symbol.get("imageData") or "":
        h = ((h << 5) - h) + ord(ch)
        h &= 0xFFFFFFFF
        if h >= 0x80000000:
            h -= 0x100000000  # JS |0 keeps it signed 32-bit
    # Math.abs(hash).toString(36)
    n = abs(h)
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    out = ""
    while True:
        n, r = divmod(n, 36)
        out = digits[r] + out
        if n == 0:
            break
    return f"esri-{out}"


def _collect_sprite(symbol: dict, sprites: list) -> None:
    if not symbol.get("imageData"):
        return
    sid = sprite_id(symbol)
    if any(s["id"] == sid for s in sprites):
        return
    sprites.append({"id": sid, "imageData": symbol["imageData"],
                    "contentType": symbol.get("contentType", "image/png"),
                    "width": symbol.get("width"),
                    "height": symbol.get("height")})


# --------------------------------------------------------- expressions

def ml_match(field, entries, fallback):
    """MapLibre ``match``; collapses to the constant when every branch
    equals the fallback."""
    if not entries:
        return fallback
    fb = json.dumps(fallback, sort_keys=True)
    if all(json.dumps(r, sort_keys=True) == fb for _, r in entries):
        return fallback
    expr = ["match", field]
    for value, result in entries:
        expr += [value, result]
    expr.append(fallback)
    return expr


def ml_step(field, breaks, fallback):
    """MapLibre ``step``: fallback below the first stop."""
    if not breaks:
        return fallback
    expr = ["step", field, fallback]
    for stop, result in breaks:
        expr += [stop, result]
    return expr


def _uv_field(renderer: dict):
    fields = [renderer.get(k) for k in ("field1", "field2", "field3")]
    fields = [f for f in fields if f]
    if len(fields) == 1:
        return ["get", fields[0]]
    delim = renderer.get("fieldDelimiter") or ","
    parts = ["concat"]
    for i, f in enumerate(fields):
        if i > 0:
            parts.append(delim)
        parts.append(["get", f])
    return parts


# ----------------------------------------------------- symbol -> props

def _circle_props(s: dict) -> dict:
    ol = s.get("outline")
    return {
        "color": rgba(s.get("color")),
        "radius": pt_to_px((s.get("size") or 0) / 2),
        "strokeColor": rgba(ol.get("color")) if ol else "rgba(0,0,0,0)",
        "strokeWidth": (ol.get("width", 1)
                        if ol and ol.get("style") != "esriSLSNull" else 0),
    }


def _line_props(s: dict) -> dict:
    return {
        "color": rgba(s.get("color")),
        "width": pt_to_px(s.get("width") or 0),
        "dash": DASH_PATTERNS.get(s.get("style")),
        "opacity": 0 if s.get("style") == "esriSLSNull" else 1,
    }


def _fill_props(s: dict) -> dict:
    fp = {"color": rgba(s.get("color")),
          "opacity": 0 if s.get("style") == "esriSFSNull" else 1}
    ol = s.get("outline")
    if ol and ol.get("style") != "esriSLSNull":
        fp["outlineColor"] = rgba(ol.get("color"))
        fp["outlineWidth"] = ol.get("width", 1)
        fp["outlineDash"] = DASH_PATTERNS.get(ol.get("style") or "esriSLSSolid")
    return fp


_ML_TYPE = {"esriSMS": "circle", "esriSLS": "line", "esriSFS": "fill",
            "esriPMS": "symbol", "esriPFS": "fill", "esriTS": "symbol"}

# fallback props when the default symbol is absent / a different type
_UV_DEFAULTS = {
    "circle": {"color": "rgba(0,0,0,1)", "radius": 5,
               "strokeColor": "rgba(0,0,0,0)", "strokeWidth": 0},
    "line": {"color": "rgba(0,0,0,1)", "width": 1, "opacity": 1},
    "fill": {"color": "rgba(0,0,0,1)", "opacity": 1},
}

_PROPS = {"circle": _circle_props, "line": _line_props, "fill": _fill_props}
_SYM_OF = {"circle": "esriSMS", "line": "esriSLS", "fill": "esriSFS"}


def _base(layer_id: str, filt=None) -> dict:
    d = {"id": layer_id, "source": SOURCE_ID, "source-layer": SOURCE_LAYER}
    if filt is not None:
        d["filter"] = filt
    return d


# ----------------------------------------------- single-symbol layers

def symbol_layers(layer_id: str, symbol: dict, transparency, sprites,
                  filt=None) -> list:
    """One concrete symbol -> MapLibre layer list (reference :499-615)."""
    op = layer_opacity(transparency)
    t = symbol.get("type")
    if t == "esriSMS":
        p = _circle_props(symbol)
        return [{**_base(layer_id, filt), "type": "circle", "paint": {
            "circle-color": p["color"], "circle-radius": p["radius"],
            "circle-opacity": op,
            "circle-stroke-color": p["strokeColor"],
            "circle-stroke-width": p["strokeWidth"],
            "circle-stroke-opacity": op}}]
    if t == "esriSLS":
        p = _line_props(symbol)
        paint = {"line-color": p["color"], "line-width": p["width"],
                 "line-opacity": p["opacity"] * op}
        if p["dash"]:
            paint["line-dasharray"] = p["dash"]
        return [{**_base(layer_id, filt), "type": "line", "paint": paint}]
    if t == "esriSFS":
        p = _fill_props(symbol)
        layers = [{**_base(layer_id, filt), "type": "fill", "paint": {
            "fill-color": p["color"], "fill-opacity": p["opacity"] * op}}]
        if p.get("outlineColor"):
            ol = {"line-color": p["outlineColor"],
                  "line-width": p.get("outlineWidth", 1),
                  "line-opacity": op}
            if p.get("outlineDash"):
                ol["line-dasharray"] = p["outlineDash"]
            layers.append({**_base(f"{layer_id}-outline", filt),
                           "type": "line", "paint": ol})
        return layers
    if t == "esriPMS":
        _collect_sprite(symbol, sprites)
        layout = {"icon-image": sprite_id(symbol),
                  "icon-allow-overlap": True}
        if symbol.get("angle"):
            layout["icon-rotate"] = symbol["angle"]
        if symbol.get("xoffset") or symbol.get("yoffset"):
            layout["icon-offset"] = [symbol.get("xoffset") or 0,
                                     symbol.get("yoffset") or 0]
        paint = {"icon-opacity": op} if op < 1 else {}
        return [{**_base(layer_id, filt), "type": "symbol",
                 "layout": layout, "paint": paint}]
    if t == "esriPFS":
        _collect_sprite(symbol, sprites)
        layers = [{**_base(layer_id, filt), "type": "fill", "paint": {
            "fill-pattern": sprite_id(symbol), "fill-opacity": op}}]
        ol = symbol.get("outline")
        if ol and ol.get("style") != "esriSLSNull":
            paint = {"line-color": rgba(ol.get("color")),
                     "line-width": ol.get("width", 1), "line-opacity": op}
            dash = DASH_PATTERNS.get(ol.get("style") or "esriSLSSolid")
            if dash:
                paint["line-dasharray"] = dash
            layers.append({**_base(f"{layer_id}-outline", filt),
                           "type": "line", "paint": paint})
        return layers
    if t == "esriTS":
        layout, paint = {}, {"text-color": rgba(symbol.get("color"))}
        font = symbol.get("font")
        if font:
            family = font.get("family") or "Arial Unicode MS"
            bold = font.get("weight") in ("bold", "bolder")
            layout["text-font"] = [f"{family} Bold" if bold
                                   else f"{family} Regular"]
            if isinstance(font.get("size"), (int, float)):
                layout["text-size"] = pt_to_px(font["size"])
        if symbol.get("angle"):
            layout["text-rotate"] = symbol["angle"]
        if symbol.get("haloColor"):
            paint["text-halo-color"] = rgba(symbol["haloColor"])
        if isinstance(symbol.get("haloSize"), (int, float)):
            paint["text-halo-width"] = pt_to_px(symbol["haloSize"])
        if op < 1:
            paint["text-opacity"] = op
        return [{**_base(layer_id, filt), "type": "symbol",
                 "layout": layout, "paint": paint}]
    return []


# ------------------------------------- expression-compiled layer family

def _expr_layers(mltype: str, field, items, default_symbol, transparency,
                 expr_fn) -> list:
    """Shared uniqueValue(match) / classBreaks(step) builder for
    circle/line/fill — ``items`` is [(key, props)], ``expr_fn`` is
    ml_match or ml_step."""
    op = layer_opacity(transparency)
    props = _PROPS[mltype]
    if default_symbol and default_symbol.get("type") == _SYM_OF[mltype]:
        d = props(default_symbol)
    elif expr_fn is ml_step and items:
        d = items[0][1]  # classBreaks defaults to the first class
    else:
        d = dict(_UV_DEFAULTS[mltype])

    def col(prop, fallback, scale=None, only_present=False):
        ents = [(k, p[prop]) for k, p in items
                if not only_present or p.get(prop) is not None]
        if scale is not None:
            ents = [(k, r * scale) for k, r in ents]
            fallback = fallback * scale
        return expr_fn(field, ents, fallback)

    if mltype == "circle":
        return [{**_base("esri-layer"), "type": "circle", "paint": {
            "circle-color": col("color", d["color"]),
            "circle-radius": col("radius", d["radius"]),
            "circle-opacity": op,
            "circle-stroke-color": col("strokeColor", d["strokeColor"]),
            "circle-stroke-width": col("strokeWidth", d["strokeWidth"]),
            "circle-stroke-opacity": op}}]
    if mltype == "line":
        paint = {"line-color": col("color", d["color"]),
                 "line-width": col("width", d["width"]),
                 "line-opacity": col("opacity", d["opacity"], scale=op)}
        dashes = [p["dash"] for _, p in items if p.get("dash")]
        if dashes:
            # dash-array doesn't support expressions; most common wins
            paint["line-dasharray"] = dashes[0]
        return [{**_base("esri-layer"), "type": "line", "paint": paint}]
    if mltype == "fill":
        layers = [{**_base("esri-layer"), "type": "fill", "paint": {
            "fill-color": col("color", d["color"]),
            "fill-opacity": col("opacity", d.get("opacity", 1), scale=op)}}]
        if any(p.get("outlineColor") for _, p in items):
            layers.append({**_base("esri-layer-outline"), "type": "line",
                           "paint": {
                "line-color": col("outlineColor",
                                  d.get("outlineColor") or "rgba(0,0,0,0)",
                                  only_present=True),
                "line-width": col("outlineWidth",
                                  d.get("outlineWidth", 0),
                                  only_present=True),
                "line-opacity": op}})
        return layers
    raise ValueError(mltype)


def _pms_layers(field, items, default_symbol, transparency, sprites,
                expr_fn) -> list:
    default_image = sprite_id(default_symbol) \
        if default_symbol and default_symbol.get("type") == "esriPMS" else ""
    layout = {"icon-image": expr_fn(field, items, default_image),
              "icon-allow-overlap": True}
    op = layer_opacity(transparency)
    paint = {"icon-opacity": op} if op < 1 else {}
    return [{**_base("esri-layer"), "type": "symbol",
             "layout": layout, "paint": paint}]


# -------------------------------------------------------- renderers

def _unique_value_layers(renderer, transparency, sprites) -> list:
    infos = renderer.get("uniqueValueInfos")
    if not infos:
        if renderer.get("defaultSymbol"):
            return symbol_layers("esri-layer", renderer["defaultSymbol"],
                                 transparency, sprites)
        return []
    field = _uv_field(renderer)
    types = {_ML_TYPE[i["symbol"]["type"]] for i in infos}

    if len(types) > 1:
        # reference parity (stylejson.ts:786-805): infos are GROUPED by
        # MapLibre type first (insertion-ordered Map), so all circles
        # come before all lines etc. — ids and draw order follow the
        # grouped sequence, not the original info order
        groups: dict[str, list] = {}
        for info in infos:
            groups.setdefault(_ML_TYPE[info["symbol"]["type"]],
                              []).append(info)
        layers = []
        idx = 0
        for ginfos in groups.values():
            for info in ginfos:
                filt = ["==", field, parse_value(info["value"])]
                layers += symbol_layers(f"esri-layer-{idx}",
                                        info["symbol"],
                                        transparency, sprites, filt)
                idx += 1
        if renderer.get("defaultSymbol"):
            matched = [parse_value(i["value"]) for i in infos]
            filt = ["!", ["in", field, ["literal", matched]]]
            layers += symbol_layers("esri-layer-default",
                                    renderer["defaultSymbol"],
                                    transparency, sprites, filt)
        return layers

    mltype = next(iter(types))
    default = renderer.get("defaultSymbol")
    if mltype == "symbol":
        for i in infos:
            if i["symbol"]["type"] in ("esriPMS", "esriPFS"):
                _collect_sprite(i["symbol"], sprites)
        if default and default.get("type") in ("esriPMS", "esriPFS"):
            _collect_sprite(default, sprites)
        items = [(parse_value(i["value"]), sprite_id(i["symbol"]))
                 for i in infos if i["symbol"]["type"] == "esriPMS"]
        return _pms_layers(field, items, default, transparency, sprites,
                           ml_match)
    items = [(parse_value(i["value"]), _PROPS[mltype](i["symbol"]))
             for i in infos]
    return _expr_layers(mltype, field, items, default, transparency,
                        ml_match)


def _class_breaks_layers(renderer, transparency, sprites) -> list:
    breaks = renderer.get("classBreakInfos")
    if not breaks:
        if renderer.get("defaultSymbol"):
            return symbol_layers("esri-layer", renderer["defaultSymbol"],
                                 transparency, sprites)
        return []
    field = ["get", renderer.get("field")]
    types = {_ML_TYPE[b["symbol"]["type"]] for b in breaks}

    if len(types) > 1:
        layers = []
        for i, b in enumerate(breaks):
            lo = b.get("classMinValue")
            if lo is None:
                lo = breaks[i - 1]["classMaxValue"] if i > 0 \
                    else renderer.get("minValue", float("-inf"))
            filt = ["all", [">=", field, lo],
                    ["<", field, b["classMaxValue"]]]
            layers += symbol_layers(f"esri-layer-{i}", b["symbol"],
                                    transparency, sprites, filt)
        if renderer.get("defaultSymbol"):
            layers += symbol_layers("esri-layer-default",
                                    renderer["defaultSymbol"],
                                    transparency, sprites)
        return layers

    mltype = next(iter(types))
    default = renderer.get("defaultSymbol")
    if mltype == "symbol":
        for b in breaks:
            if b["symbol"]["type"] in ("esriPMS", "esriPFS"):
                _collect_sprite(b["symbol"], sprites)
        if default and default.get("type") in ("esriPMS", "esriPFS"):
            _collect_sprite(default, sprites)
        items = [(b["classMaxValue"], sprite_id(b["symbol"]))
                 for b in breaks if b["symbol"]["type"] == "esriPMS"]
        return _pms_layers(field, items, default, transparency, sprites,
                           ml_step)
    items = [(b["classMaxValue"], _PROPS[mltype](b["symbol"]))
             for b in breaks]
    return _expr_layers(mltype, field, items, default, transparency,
                        ml_step)


# ------------------------------------------------------------- labels

_PLACEMENT_ANCHOR = {
    "esriServerPointLabelPlacementAboveCenter": "bottom",
    "esriServerPointLabelPlacementAboveLeft": "bottom-right",
    "esriServerPointLabelPlacementAboveRight": "bottom-left",
    "esriServerPointLabelPlacementBelowCenter": "top",
    "esriServerPointLabelPlacementBelowLeft": "top-right",
    "esriServerPointLabelPlacementBelowRight": "top-left",
    "esriServerPointLabelPlacementCenterCenter": "center",
    "esriServerPointLabelPlacementCenterLeft": "right",
    "esriServerPointLabelPlacementCenterRight": "left",
}


def _label_field(expr: str):
    """ESRI "[FIELD]"-style label expression -> text-field."""
    import re
    m = re.fullmatch(r"\[(\w+)\]", expr)
    if m:
        return ["get", m.group(1)]
    parts = ["concat"]
    for field, lit in re.findall(r"\[(\w+)\]|([^\[\]]+)", expr):
        parts.append(["get", field] if field else lit)
    return parts if len(parts) > 2 else expr


def _labeling_layers(infos: list, transparency) -> list:
    layers = []
    op = layer_opacity(transparency)
    for i, info in enumerate(infos):
        sym = info.get("symbol")
        if not sym:
            continue
        layout, paint = {}, {"text-color": rgba(sym.get("color"))}
        if info.get("labelExpression"):
            layout["text-field"] = _label_field(info["labelExpression"])
        font = sym.get("font")
        if font:
            family = font.get("family") or "Arial Unicode MS"
            bold = font.get("weight") in ("bold", "bolder")
            layout["text-font"] = [f"{family} Bold" if bold
                                   else f"{family} Regular"]
            if isinstance(font.get("size"), (int, float)):
                layout["text-size"] = pt_to_px(font["size"])
        placement = info.get("labelPlacement")
        if placement:
            anchor = _PLACEMENT_ANCHOR.get(placement)
            if anchor:
                layout["text-anchor"] = anchor
            if "Line" in placement:
                layout["symbol-placement"] = "line"
        layout["text-allow-overlap"] = False
        if sym.get("haloColor"):
            paint["text-halo-color"] = rgba(sym["haloColor"])
        if isinstance(sym.get("haloSize"), (int, float)):
            paint["text-halo-width"] = pt_to_px(sym["haloSize"])
        if op < 1:
            paint["text-opacity"] = op
        layer = {**_base(f"esri-label-{i}"), "type": "symbol",
                 "layout": layout, "paint": paint}
        if info.get("where"):
            layer["filter"] = ["==", 1, 1]  # ESRI SQL not convertible
        if info.get("minScale"):
            layer["maxzoom"] = (22 if info["minScale"] <= 0
                                else scale_to_zoom(info["minScale"]))
        if info.get("maxScale"):
            layer["minzoom"] = (22 if info["maxScale"] <= 0
                                else scale_to_zoom(info["maxScale"]))
        layers.append(layer)
    return layers


# -------------------------------------------------------------- entry

def stylejson(metadata: dict) -> dict:
    """Layer metadata -> MapLibre style document (reference entry
    :1092-1135)."""
    drawing = metadata.get("drawingInfo") or {}
    renderer = drawing.get("renderer")
    transparency = drawing.get("transparency")
    name = (metadata.get("name") or metadata.get("mapName")
            or (metadata.get("documentInfo") or {}).get("Title"))

    sprites: list = []
    layers: list = []
    if renderer:
        rtype = renderer.get("type")
        if rtype == "simple":
            # `or {}`: an explicit JSON null symbol (common in real
            # layer metadata) must behave like a missing one
            layers = symbol_layers("esri-layer",
                                   renderer.get("symbol") or {},
                                   transparency, sprites)
        elif rtype == "uniqueValue":
            layers = _unique_value_layers(renderer, transparency, sprites)
        elif rtype == "classBreaks":
            layers = _class_breaks_layers(renderer, transparency, sprites)

    if drawing.get("labelingInfo"):
        layers = layers + _labeling_layers(drawing["labelingInfo"],
                                           transparency)

    style = {"version": 8,
             "sources": {SOURCE_ID: {"type": "vector"}},
             "layers": layers}
    if name:
        style["name"] = str(name)
    if sprites:
        style["metadata"] = {"esri:sprites": sprites}
    return style
