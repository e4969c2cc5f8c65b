"""Discovery catalog scan (S6) + sinks (S7/S8) tests."""

from __future__ import annotations

import json

from esri_dump_spark.sources.discovery import discover_tree
from esri_dump_spark.operators.sinks import (
    write_jsonl, features_to_collection, write_schema_doc,
    write_tilejson_doc)
from esri_dump_spark.operators.extract import extract
from esri_dump_spark.sources.feature_server import SyntheticFeatureServer


def test_discover_tree(spark):
    tree = {
        "folders": {
            "fires": {
                "services": [{
                    "name": "Wildfire", "type": "FeatureServer",
                    "layers": [
                        {"name": "points", "geometryType": "esriGeometryPoint",
                         "fields": [{"name": "objectid",
                                     "type": "esriFieldTypeOID"}]},
                        {"name": "perimeters",
                         "geometryType": "esriGeometryPolygon",
                         "fields": [{"name": "objectid",
                                     "type": "esriFieldTypeOID"},
                                    {"name": "name",
                                     "type": "esriFieldTypeString",
                                     "length": 20}]},
                    ],
                }],
            },
        },
        "services": [{"name": "Root", "type": "MapServer",
                      "layers": [{"name": "base", "fields": []}]}],
    }
    df = discover_tree(spark, tree)
    rows = {r.path: r for r in df.collect()}
    assert len(rows) == 3
    r = rows["/fires/Wildfire/FeatureServer/1"]
    assert r.name == "perimeters" and r.geometry_type == "esriGeometryPolygon"
    doc = json.loads(r.schema_json)
    assert doc["properties"]["name"] == {"type": "string", "maxLength": 20}
    assert rows["/Root/MapServer/0"].layer_type == "MapServer"


def test_write_jsonl_and_collection(spark, tmp_path):
    srv = SyntheticFeatureServer(n_features=50, max_record_count=20)
    df = extract(spark, srv, "iter")
    out = str(tmp_path / "features")
    write_jsonl(df, out)
    lines = [json.loads(line) for part in
             __import__("glob").glob(f"{out}/part-*")
             for line in open(part)]
    assert len(lines) == df.count()
    assert all(l["type"] == "Feature" for l in lines)

    fc = features_to_collection(df, limit=10)
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 10


def test_schema_and_tilejson_docs(tmp_path):
    meta = {"name": "layer", "geometryType": "esriGeometryPoint",
            "extent": {"xmin": 0, "ymin": 0, "xmax": 1, "ymax": 1,
                       "spatialReference": {"wkid": 4326}},
            "fields": [{"name": "objectid", "type": "esriFieldTypeOID"}]}
    sdoc = write_schema_doc(meta, str(tmp_path / "schema.json"))
    assert sdoc["properties"]["objectid"] == {"type": "number"}
    tdoc = write_tilejson_doc(meta, str(tmp_path / "tile.json"),
                              "FeatureServer")
    assert tdoc["scheme"] == "xyz" and tdoc["type"] == "vector"
    assert json.load(open(tmp_path / "tile.json")) == tdoc
