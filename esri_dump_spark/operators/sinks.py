"""Sinks (S7/S8): JSONL feature output and single-document metadata
sinks (schema / TileJSON / StyleJSON-layer classes).

The reference streams one JSON feature per line to stdout (cli.ts:84-86)
and writes single JSON documents for schema/tilejson/stylejson. Here:

  * ``write_jsonl``      — distributed JSONL: each feature row's
    canonical ``geojson`` string column written as text (no re-encode;
    the decode already produced canonical JSON), or ``to_json(struct)``
    when no prebuilt column exists.
  * ``features_to_collection`` — driver-side FeatureCollection assembly
    for small results (the README example's client-side accumulation).
  * ``write_schema_doc`` / ``write_tilejson_doc`` — single-document
    sinks from layer metadata.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.schema import field_to_schema
from ..plans.tilejson import tilejson

__all__ = ["write_jsonl", "features_to_collection", "write_schema_doc",
           "write_tilejson_doc"]


def write_jsonl(df: DataFrame, path: str, json_col: str = "geojson",
                mode: str = "overwrite") -> None:
    """One JSON document per line, partition-parallel."""
    if json_col in df.columns:
        out = df.select(F.col(json_col).alias("value"))
    else:
        out = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    out.write.mode(mode).text(path)


def features_to_collection(df: DataFrame, json_col: str = "geojson",
                           limit: int | None = None,
                           max_rows: int = 100_000) -> dict:
    """Driver-side FeatureCollection — small results only. With
    ``limit=None`` the collect is guarded by ``max_rows``: one extra
    row is fetched and an oversized result raises instead of OOMing
    the driver. Use ``write_jsonl`` for large outputs."""
    if limit is not None:
        take = df.select(json_col).limit(limit)
        rows = take.collect()
    else:
        rows = df.select(json_col).limit(max_rows + 1).collect()
        if len(rows) > max_rows:
            raise ValueError(
                f"features_to_collection: result exceeds max_rows="
                f"{max_rows}; pass limit= or use write_jsonl for "
                "large feature sets")
    features = [json.loads(r[0]) for r in rows]
    return {"type": "FeatureCollection", "features": features}


def write_schema_doc(metadata: dict, path: str) -> dict:
    doc = field_to_schema(metadata)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    return doc


def write_tilejson_doc(metadata: dict, path: str,
                       resource_type: str | None = None) -> dict:
    doc = tilejson(metadata, resource_type)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    return doc
