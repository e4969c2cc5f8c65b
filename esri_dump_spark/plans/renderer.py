"""Renderer expression compiler (F7) — ESRI drawingInfo renderers to
Spark Column expressions (the engine's analog of the reference's
MapLibre match/step compilation).

Parity targets in /root/reference/lib/stylejson.ts:
  * matchExpr  (:355-371) — uniqueValue -> match; collapses to the
    fallback constant when every branch equals it (the reference's own
    constant folding; Catalyst folds the generated CASE WHEN the same
    way)
  * stepExpr   (:374-384) — classBreaks -> step (half-open: value >=
    stop picks the following result)
  * uvFieldExpr (:389-404) — multi-field unique value key with
    delimiter -> concat_ws
  * parseValue (:407-411) — numeric-string coercion with round-trip
    check
  * scalar helpers: rgba (:277-282), opacity (:284-287), round3
    (:289-291), ptToPx (:293-295), scale->zoom (log2(559082264/scale))

The compiled Columns evaluate renderers *against feature rows at
scale* — e.g. "which style class does each of 10^9 features get" is a
single JVM-side CASE WHEN projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["match_expr", "step_expr", "uv_field_expr", "parse_value",
           "rgba", "layer_opacity", "round3", "pt_to_px", "scale_to_zoom",
           "compile_renderer"]


def round3(n: float) -> float:
    import math
    return math.floor(n * 1000 + 0.5) / 1000


def rgba(color=None) -> str:
    if not color:
        return "rgba(0,0,0,1)"
    r, g, b = color[0], color[1], color[2]
    a = color[3] if len(color) > 3 else 255
    a_r = round3(a / 255)
    a_s = str(int(a_r)) if a_r == int(a_r) else str(a_r)
    return f"rgba({r},{g},{b},{a_s})"


def layer_opacity(transparency=None) -> float:
    if not isinstance(transparency, (int, float)) or transparency <= 0:
        return 1
    return round3(1 - transparency / 100)


def pt_to_px(pt: float) -> float:
    import math
    return math.floor(pt * 4 / 3 * 100 + 0.5) / 100


def scale_to_zoom(scale: float) -> float:
    import math
    return round(math.log2(559082264 / scale), 2)


def parse_value(v: str):
    """Numeric-string coercion with exact round-trip check."""
    try:
        n = float(v)
    except (TypeError, ValueError):
        return v
    if n.is_integer() and str(int(n)) == v:
        return int(n)
    if str(n) == v:
        return n
    return v


def uv_field_expr(renderer: dict) -> Column:
    """Unique-value field key; multi-field -> concat_ws(delimiter)."""
    fields = [renderer.get(k) for k in ("field1", "field2", "field3")]
    fields = [f for f in fields if f]
    if len(fields) == 1:
        return F.col(fields[0])
    delim = renderer.get("fieldDelimiter") or ","
    return F.concat_ws(delim, *[F.col(f) for f in fields])


def match_expr(field: Column, entries: list[tuple], fallback) -> Column:
    """uniqueValue -> CASE WHEN chain; constant-collapse when every
    branch equals the fallback (reference matchExpr parity)."""
    if not entries or all(r == fallback for _, r in entries):
        return F.lit(fallback)
    expr = None
    for value, result in entries:
        cond = field == F.lit(value)
        expr = F.when(cond, F.lit(result)) if expr is None \
            else expr.when(cond, F.lit(result))
    return expr.otherwise(F.lit(fallback))


def step_expr(field: Column, breaks: list[tuple], fallback) -> Column:
    """classBreaks -> step semantics: result of the LAST stop <= value,
    fallback below the first stop."""
    if not breaks:
        return F.lit(fallback)
    expr = F.lit(fallback)
    # evaluate in reverse so the highest matching stop wins
    out = None
    for stop, result in reversed(breaks):
        cond = field >= F.lit(stop)
        out = F.when(cond, F.lit(result)) if out is None \
            else out.when(cond, F.lit(result))
    return out.otherwise(expr)


def compile_renderer(renderer: dict, value_key: str = "label") -> Column:
    """drawingInfo.renderer -> one Column assigning each feature its
    style class (simple / uniqueValue / classBreaks dispatch)."""
    rtype = renderer.get("type")
    if rtype == "simple":
        return F.lit(renderer.get(value_key, "default"))
    if rtype == "uniqueValue":
        field = uv_field_expr(renderer)
        entries = [(str(i.get("value")), i.get(value_key, str(i.get("value"))))
                   for i in renderer.get("uniqueValueInfos", [])]
        fallback = (renderer.get("defaultLabel")
                    or renderer.get("defaultSymbol", {}).get("label")
                    or "other")
        return match_expr(field, entries, fallback)
    if rtype == "classBreaks":
        field = F.col(renderer["field"]).cast("double")
        infos = renderer.get("classBreakInfos", [])
        breaks = []
        fallback = renderer.get("defaultLabel") or "other"
        lo = renderer.get("minValue")
        for i, info in enumerate(infos):
            stop = info.get("classMinValue")
            if stop is None:
                stop = lo if i == 0 else infos[i - 1].get("classMaxValue")
            if stop is None:
                # stylejson.ts:970: `renderer.minValue ?? -Infinity` —
                # classMinValue and minValue are both optional; the
                # first class is open below
                stop = float("-inf")
            breaks.append((float(stop), info.get(value_key, f"class{i}")))
        return step_expr(field, breaks, fallback)
    raise ValueError(f"unknown renderer type {rtype!r}")
