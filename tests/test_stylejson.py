"""StyleJSON compiler parity tests (reference lib/stylejson.ts) —
hand-built expectations from the reference's documented behavior."""

from __future__ import annotations

from esri_dump_spark.plans.stylejson import (DASH_PATTERNS, ml_match,
                                             ml_step, sprite_id, stylejson)

SMS = {"type": "esriSMS", "color": [255, 0, 0, 255], "size": 12,
       "outline": {"color": [0, 0, 0, 255], "width": 2,
                   "style": "esriSLSSolid"}}
SLS_DASHED = {"type": "esriSLS", "color": [0, 0, 255, 128], "width": 3,
              "style": "esriSLSDash"}
SFS = {"type": "esriSFS", "color": [0, 255, 0, 255], "style": "esriSFSSolid",
       "outline": {"color": [10, 20, 30, 255], "width": 1.5,
                   "style": "esriSLSSolid"}}


def test_simple_sms_circle_layer():
    doc = stylejson({"name": "lyr", "drawingInfo": {
        "renderer": {"type": "simple", "symbol": SMS}}})
    assert doc["version"] == 8
    assert doc["sources"] == {"esri": {"type": "vector"}}
    assert doc["name"] == "lyr"
    (layer,) = doc["layers"]
    assert layer["type"] == "circle"
    p = layer["paint"]
    assert p["circle-color"] == "rgba(255,0,0,1)"
    assert p["circle-radius"] == 8.0          # 12pt/2 -> px
    assert p["circle-stroke-width"] == 2
    assert p["circle-opacity"] == 1


def test_simple_sls_dash_and_transparency():
    doc = stylejson({"drawingInfo": {
        "renderer": {"type": "simple", "symbol": SLS_DASHED},
        "transparency": 25}})
    (layer,) = doc["layers"]
    p = layer["paint"]
    assert p["line-color"] == "rgba(0,0,255,0.502)"
    assert p["line-width"] == 4.0             # 3pt -> px
    assert p["line-dasharray"] == [4, 3]
    assert p["line-opacity"] == 0.75          # layer transparency


def test_simple_sfs_outline_layer():
    doc = stylejson({"drawingInfo": {
        "renderer": {"type": "simple", "symbol": SFS}}})
    fill, outline = doc["layers"]
    assert fill["type"] == "fill" and outline["type"] == "line"
    assert outline["id"] == "esri-layer-outline"
    assert outline["paint"]["line-color"] == "rgba(10,20,30,1)"
    assert outline["paint"]["line-width"] == 1.5


def test_unique_value_same_type_match_exprs():
    renderer = {
        "type": "uniqueValue", "field1": "kind",
        "uniqueValueInfos": [
            {"value": "a", "symbol": {"type": "esriSFS",
                                      "color": [255, 0, 0, 255],
                                      "style": "esriSFSSolid"}},
            {"value": "7", "symbol": {"type": "esriSFS",
                                      "color": [0, 0, 255, 255],
                                      "style": "esriSFSSolid"}},
        ]}
    doc = stylejson({"drawingInfo": {"renderer": renderer}})
    (fill,) = doc["layers"]
    # numeric-looking value parsed to number (reference parseValue)
    assert fill["paint"]["fill-color"] == [
        "match", ["get", "kind"],
        "a", "rgba(255,0,0,1)", 7, "rgba(0,0,255,1)", "rgba(0,0,0,1)"]
    # all opacities equal -> collapsed to the constant
    assert fill["paint"]["fill-opacity"] == 1


def test_unique_value_mixed_types_filters():
    renderer = {
        "type": "uniqueValue", "field1": "kind",
        "defaultSymbol": SMS,
        "uniqueValueInfos": [
            {"value": "pt", "symbol": SMS},
            {"value": "ln", "symbol": SLS_DASHED},
        ]}
    doc = stylejson({"drawingInfo": {"renderer": renderer}})
    kinds = [(l["type"], l.get("filter")) for l in doc["layers"]]
    assert kinds[0] == ("circle", ["==", ["get", "kind"], "pt"])
    assert kinds[1] == ("line", ["==", ["get", "kind"], "ln"])
    assert kinds[2] == ("circle", ["!", ["in", ["get", "kind"],
                                         ["literal", ["pt", "ln"]]]])


def test_class_breaks_step_exprs():
    renderer = {
        "type": "classBreaks", "field": "pop",
        "classBreakInfos": [
            {"classMaxValue": 100, "symbol": {
                "type": "esriSLS", "color": [1, 2, 3, 255], "width": 1,
                "style": "esriSLSSolid"}},
            {"classMaxValue": 1000, "symbol": {
                "type": "esriSLS", "color": [4, 5, 6, 255], "width": 2,
                "style": "esriSLSSolid"}},
        ]}
    doc = stylejson({"drawingInfo": {"renderer": renderer}})
    (line,) = doc["layers"]
    # no defaultSymbol -> first class's props are the below-first fallback
    assert line["paint"]["line-color"] == [
        "step", ["get", "pop"], "rgba(1,2,3,1)",
        100, "rgba(1,2,3,1)", 1000, "rgba(4,5,6,1)"]
    assert line["paint"]["line-width"] == [
        "step", ["get", "pop"], 1.33, 100, 1.33, 1000, 2.67]


def test_match_constant_collapse_and_step_fallback():
    assert ml_match(["get", "f"], [("a", "x"), ("b", "x")], "x") == "x"
    assert ml_match(["get", "f"], [], "fb") == "fb"
    assert ml_step(["get", "f"], [], "fb") == "fb"


def test_sprite_id_js_hash_parity():
    # independent JS `(h << 5) - h + c |0` evaluation via int32 wrap
    import numpy as np
    s = "iVBORw0KGgoAAAANS"
    h = np.int32(0)
    with np.errstate(over="ignore"):
        for ch in s:
            h = np.int32(np.int32(h << np.int32(5)) - h + np.int32(ord(ch)))
    expected = f"esri-{np.base_repr(abs(int(h)), 36).lower()}"
    assert sprite_id({"imageData": s}) == expected
    assert sprite_id({"url": "http://x/y.png"}) == "esri-http://x/y.png"


def test_pms_sprites_collected_into_metadata():
    pms = {"type": "esriPMS", "imageData": "QUJD", "contentType": "image/png",
           "width": 8, "height": 8}
    doc = stylejson({"drawingInfo": {
        "renderer": {"type": "simple", "symbol": pms}}})
    (layer,) = doc["layers"]
    assert layer["type"] == "symbol"
    sprites = doc["metadata"]["esri:sprites"]
    assert len(sprites) == 1
    assert layer["layout"]["icon-image"] == sprites[0]["id"]


def test_labeling_layers():
    doc = stylejson({"drawingInfo": {
        "renderer": {"type": "simple", "symbol": SMS},
        "labelingInfo": [{
            "labelExpression": "[NAME]",
            "labelPlacement": "esriServerPointLabelPlacementAboveCenter",
            "minScale": 559082264,
            "symbol": {"type": "esriTS", "color": [0, 0, 0, 255],
                       "font": {"family": "Arial", "weight": "bold",
                                "size": 9}}}]}})
    label = doc["layers"][-1]
    assert label["id"] == "esri-label-0"
    assert label["layout"]["text-field"] == ["get", "NAME"]
    assert label["layout"]["text-anchor"] == "bottom"
    assert label["layout"]["text-font"] == ["Arial Bold"]
    assert label["layout"]["text-size"] == 12.0
    assert label["maxzoom"] == 0.0


def test_label_multifield_concat():
    from esri_dump_spark.plans.stylejson import _label_field
    assert _label_field("[A] - [B]") == ["concat", ["get", "A"], " - ",
                                         ["get", "B"]]
    assert _label_field("[ONLY]") == ["get", "ONLY"]


def test_unique_value_mixed_types_groups_by_ml_type():
    """stylejson.ts:786-805: mixed-type infos are GROUPED by MapLibre
    type (first-occurrence order) before ids are assigned — an
    interleaved [SMS, SLS, SMS] renderer emits circle-0, circle-1,
    line-2, not circle-0, line-1, circle-2."""
    renderer = {
        "type": "uniqueValue", "field1": "kind",
        "uniqueValueInfos": [
            {"value": "p1", "symbol": SMS},
            {"value": "ln", "symbol": SLS_DASHED},
            {"value": "p2", "symbol": SMS},
        ]}
    doc = stylejson({"drawingInfo": {"renderer": renderer}})
    got = [(l["id"], l["type"], l["filter"][2]) for l in doc["layers"]]
    assert got == [("esri-layer-0", "circle", "p1"),
                   ("esri-layer-1", "circle", "p2"),
                   ("esri-layer-2", "line", "ln")]


def test_null_symbol_and_colorless_outline_tolerated():
    """An explicit JSON null symbol behaves like a missing one, and an
    esriSMS outline with no color falls back to the default rgba
    (reference: rgba(undefined) -> 'rgba(0,0,0,1)')."""
    doc = stylejson({"drawingInfo": {"renderer":
                                     {"type": "simple", "symbol": None}}})
    assert doc["layers"] == []
    sms = {"type": "esriSMS", "style": "esriSMSCircle", "size": 8,
           "color": [10, 20, 30, 255],
           "outline": {"style": "esriSLSSolid", "width": 1}}
    doc2 = stylejson({"drawingInfo": {"renderer":
                                      {"type": "simple", "symbol": sms}}})
    paint = doc2["layers"][0]["paint"]
    assert paint["circle-stroke-color"] == "rgba(0,0,0,1)"
