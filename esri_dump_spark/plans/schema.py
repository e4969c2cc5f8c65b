"""Layer metadata -> JSON Schema and Spark StructType (EP2).

Parity target: /root/reference/lib/schema.ts:4-48 — the 13-entry ESRI
field-type map, string ``maxLength`` from ``field.length``, unknown
types falling back to plain string, ``additionalProperties: false``.

The Spark mapping (SURVEY.md §1.2) adds a StructType builder so the
same metadata drives both the JSON-Schema sink (S8) and DataFrame
schemas for the extraction pipeline.
"""

from __future__ import annotations

import math

from pyspark.sql import types as T

__all__ = ["ESRI_TO_JSON_SCHEMA", "field_to_schema", "metadata_to_struct",
           "find_oid_field"]

ESRI_TO_JSON_SCHEMA: dict[str, dict] = {
    "esriFieldTypeDate": {"type": "string", "format": "date-time"},
    "esriFieldTypeString": {"type": "string"},
    "esriFieldTypeDouble": {"type": "number"},
    "esriFieldTypeSingle": {"type": "number"},
    "esriFieldTypeOID": {"type": "number"},
    "esriFieldTypeInteger": {"type": "integer"},
    "esriFieldTypeSmallInteger": {"type": "integer"},
    "esriFieldTypeGeometry": {"type": "object"},
    "esriFieldTypeBlob": {"type": "object"},
    "esriFieldTypeGlobalID": {"type": "string"},
    "esriFieldTypeRaster": {"type": "object"},
    "esriFieldTypeGUID": {"type": "string"},
    "esriFieldTypeXML": {"type": "string"},
}

_ESRI_TO_SPARK: dict[str, T.DataType] = {
    "esriFieldTypeDate": T.TimestampType(),
    "esriFieldTypeString": T.StringType(),
    "esriFieldTypeDouble": T.DoubleType(),
    "esriFieldTypeSingle": T.FloatType(),
    "esriFieldTypeOID": T.LongType(),
    "esriFieldTypeInteger": T.IntegerType(),
    "esriFieldTypeSmallInteger": T.ShortType(),
    "esriFieldTypeGeometry": T.StringType(),  # geojson-string geometry
    "esriFieldTypeBlob": T.BinaryType(),
    "esriFieldTypeGlobalID": T.StringType(),
    "esriFieldTypeRaster": T.BinaryType(),
    "esriFieldTypeGUID": T.StringType(),
    "esriFieldTypeXML": T.StringType(),
}


_MISSING = object()


def _js_not_nan(v) -> bool:
    """JS ``!isNaN(v)`` with Number() coercion — the reference's guard
    (schema.ts:42). Notably ``Number(null) === 0``, so a present-but-
    null length still emits ``"maxLength": null``; an absent length
    (undefined → NaN) does not."""
    if v is _MISSING:
        return False          # undefined → NaN
    if v is None or isinstance(v, bool):
        return True           # Number(null)=0, Number(bool)=0|1
    if isinstance(v, (int, float)):
        return not math.isnan(float(v))
    if isinstance(v, str):
        s = v.strip()
        if s == "":
            return True       # Number('') = 0
        # JS Number() literal grammar differs from Python float():
        if s in ("Infinity", "+Infinity", "-Infinity"):
            return True
        low = s.lower()
        if low in ("inf", "+inf", "-inf", "infinity", "+infinity",
                   "-infinity", "nan", "+nan", "-nan"):
            return False      # float() accepts; Number() is NaN
        if "_" in s:
            return False      # Number('1_2') = NaN; float('1_2') = 12
        if low.startswith(("0x", "0b", "0o")):
            # unsigned radix literals parse in JS (signed do not)
            try:
                int(s, 0)
                return True
            except ValueError:
                return False
        try:
            return not math.isnan(float(s))
        except ValueError:
            return False
    return False              # objects → NaN


def field_to_schema(metadata: dict) -> dict:
    """Derive the JSON Schema document for a layer's attributes."""
    doc = {
        "type": "object",
        "required": [],
        "additionalProperties": False,
        "properties": {},
    }
    fields = metadata.get("fields")
    if not isinstance(fields, list):
        return doc
    for field in fields:
        name = str(field["name"])
        base = ESRI_TO_JSON_SCHEMA.get(field.get("type"), {"type": "string"})
        prop = dict(base)
        if (_js_not_nan(field.get("length", _MISSING))
                and base.get("type") == "string"):
            prop["maxLength"] = field["length"]
        doc["properties"][name] = prop
    return doc


def metadata_to_struct(metadata: dict) -> T.StructType:
    """Layer metadata -> Spark StructType for the attributes struct."""
    fields = []
    for field in metadata.get("fields") or []:
        dt = _ESRI_TO_SPARK.get(field.get("type"), T.StringType())
        fields.append(T.StructField(str(field["name"]), dt, True))
    return T.StructType(fields)


_OID_PRIORITY = ["OBJECTID", "objectid", "FID", "ID", "fid", "id"]


def find_oid_field(fields: list[dict]) -> str:
    """OID resolution (P8): the esriFieldTypeOID field, else the best
    name from the priority list, else error — same order and failure
    message semantics as the reference resolver."""
    for field in fields:
        if field.get("type") == "esriFieldTypeOID":
            return field["name"]
    candidates = [f for f in fields if f.get("name") in _OID_PRIORITY]
    if candidates:
        candidates.sort(key=lambda f: _OID_PRIORITY.index(f["name"]))
        return candidates[0]["name"]
    raise ValueError("Could not determine OBJECTID field.")
