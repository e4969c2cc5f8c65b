"""Catalog discovery scan (S6) — the reference's recursive
folder→service→layer enumeration, re-expressed over Spark catalogs and
synthetic service trees.

Parity target: /root/reference/lib/discovery.ts:34-137 — recursive
listing that emits one record per layer with its metadata + derived
JSON schema. Two sources:

  * ``discover_catalog``  — walk a Spark catalog (databases → tables),
    emitting a `layers` DataFrame. This is the Iceberg-namespace
    analog of folder/service recursion.
  * ``discover_tree``     — walk an in-memory service-tree dict (the
    synthetic stand-in for an ArcGIS REST server's folder listing),
    validating each layer like the reference (#folders/#service/#layer).

The recursion is driver-side (catalog trees are small); the *result*
is a DataFrame so downstream filtering/joining over millions of layers
would still distribute.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..plans.schema import field_to_schema

__all__ = ["discover_catalog", "discover_tree", "LAYER_SCHEMA"]

LAYER_SCHEMA = ("path string, name string, layer_type string, "
                "geometry_type string, n_fields int, schema_json string")


def discover_catalog(spark: SparkSession) -> DataFrame:
    """Enumerate databases/tables of the active Spark catalog into a
    layers DataFrame (path, name, layer_type, ...)."""
    rows = []
    for db in spark.catalog.listDatabases():
        for t in spark.catalog.listTables(db.name):
            try:
                cols = spark.catalog.listColumns(t.name, db.name)
                fields = [{"name": c.name, "type": c.dataType} for c in cols]
            except Exception:
                fields = []
            rows.append((f"{db.name}.{t.name}", t.name,
                         t.tableType or "TABLE", None, len(fields),
                         json.dumps({"fields": fields})))
    return spark.createDataFrame(rows, LAYER_SCHEMA)


def discover_tree(spark: SparkSession, tree: dict,
                  path: str = "") -> DataFrame:
    """Recursively walk {folders: {name: subtree}, services: [{name,
    type, layers: [layer_meta, ...]}]} and emit one row per layer with
    its derived JSON schema — the reference's discovery output shape."""
    rows: list[tuple] = []

    def walk(node: dict, prefix: str) -> None:
        for name, sub in (node.get("folders") or {}).items():
            walk(sub, f"{prefix}/{name}")
        for svc in node.get("services") or []:
            svc_path = f"{prefix}/{svc['name']}/{svc.get('type', 'FeatureServer')}"
            for i, layer in enumerate(svc.get("layers") or []):
                doc = field_to_schema(layer)
                rows.append((
                    f"{svc_path}/{i}",
                    str(layer.get("name", i)),
                    svc.get("type", "FeatureServer"),
                    layer.get("geometryType"),
                    len(layer.get("fields") or []),
                    json.dumps(doc, separators=(",", ":")),
                ))

    walk(tree, path)
    return spark.createDataFrame(rows, LAYER_SCHEMA)
