"""Paged FeatureServer extraction as a partition-parallel pipeline (EP1).

The reference runs this single-threaded: count probe -> sequential
offset pages (or a LIFO bbox-quadtree) -> per-feature decode -> OID
dedup -> rewind -> emit. Our physical plan:

  driver:    metadata validation (same error conditions), count probe,
             page/envelope MANIFEST (tiny DataFrame, one row per page)
  executors: ``mapInPandas`` decodes whole pages per task — attribute
             projection + ISO date cast (with the reference's falsy
             guard), geometry assembly via the ring kernels, RFC-7946
             rewind — emitting Arrow batches of GeoJSON rows
  shuffle:   exactly one — ``dropDuplicates('id')`` across overlapping
             bbox quadrants / shifted pages
  sink:      columnar rows with a canonical ``geojson`` string column

Scale notes (100 TB design point): the manifest is the unit of
parallelism — 1000 executors each own disjoint page ranges; there is
no driver-side collect of feature rows, and the only wide exchange is
the hash dedup on the 8-byte id. For an Iceberg-resident source the
manifest step disappears entirely (the table's file plan is the
manifest) — see ``read_feature_table``.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.rings import rings_to_geojson
from ..kernels.rewind import rewind
from ..kernels.bbox import BBox, quadtree_partition
from ..plans.schema import field_to_schema, find_oid_field
from ..sources.feature_server import TransientServerError

__all__ = ["validate_metadata", "extract", "FEATURE_SCHEMA", "iso8601_ms",
           "MAX_PAGE_RETRIES"]

# E1 parity: a page may SUCCEED on at most its 5th attempt. The
# reference's loop (`attempts = 0; while (attempts <= 5) { attempts++;
# ... break on success }`, /root/reference/lib/geometry.ts:94-142)
# performs up to six fetches, but the post-loop `if (attempts > 5)`
# check errors out even when the sixth fetch returned features — so
# the observable success bound is five attempts, and a sixth fetch
# could never change the outcome. Spark task retries
# (spark.task.maxFailures) remain the outer recovery layer.
MAX_PAGE_RETRIES = 5


def _with_retries(fn, desc: str):
    last: Exception | None = None
    for _ in range(MAX_PAGE_RETRIES):
        try:
            return fn()
        except TransientServerError as e:
            last = e
    raise RuntimeError(
        f"{desc}: failed after {MAX_PAGE_RETRIES} attempts: {last}")

FEATURE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("geom_type", T.StringType()),
    T.StructField("properties", T.StringType()),   # canonical JSON
    T.StructField("geometry", T.StringType()),     # canonical GeoJSON geometry
    T.StructField("geojson", T.StringType()),      # full Feature document
    T.StructField("lon", T.DoubleType()),          # representative point
    T.StructField("lat", T.DoubleType()),
])


def validate_metadata(metadata: dict, require_geometry: bool = True) -> None:
    """The reference's #fetchMeta validation rules (E3), as asserts."""
    caps = [c.strip() for c in str(metadata.get("capabilities", "")).split(",")]
    if "Query" not in caps:
        raise ValueError("Layer does not support query operations")
    if require_geometry:
        if not metadata.get("extent"):
            raise ValueError("Layer does not have geometric features")
        if metadata.get("subLayers"):
            raise ValueError("Layer has sublayers; query a leaf layer")
        if not metadata.get("geometryType"):
            raise ValueError("Layer does not have geometric features")


def iso8601_ms(ms: int) -> str:
    """epoch-millis -> ISO-8601 with milliseconds (JS Date.toISOString
    parity: 'YYYY-MM-DDTHH:mm:ss.sssZ')."""
    from datetime import datetime, timezone
    dt = datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{ms % 1000:03d}Z"


def _decode_feature(esri: dict, geom_type: str, oid_field: str,
                    date_fields: set[str]) -> dict | None:
    """ESRI feature -> GeoJSON Feature row dict (P1, P2, P7, G7, G8).
    Returns None for invalid (attribute-only) features (P3)."""
    attrs = esri.get("attributes") or {}
    oid = attrs.get(oid_field)
    props = {}
    for k, v in attrs.items():
        # the reference converts only truthy values of date-time fields:
        # None and 0 pass through raw (epoch-0 is NOT converted)
        if k in date_fields and v:
            props[k] = iso8601_ms(int(v))
        else:
            props[k] = v

    g = esri.get("geometry")
    if geom_type == "esriGeometryPolygon":
        if not g or not g.get("rings"):
            return None
        geometry = rings_to_geojson(g["rings"])
    elif geom_type == "esriGeometryPolyline":
        if not g or not g.get("paths"):
            return None
        geometry = {"type": "MultiLineString", "coordinates": g["paths"]}
    elif geom_type == "esriGeometryPoint":
        if not g or g.get("x") is None:
            return None
        geometry = {"type": "Point", "coordinates": [g["x"], g["y"]]}
    else:
        return None  # unsupported geometry type -> filtered, counted

    feature = {"id": oid, "type": "Feature", "properties": props,
               "geometry": geometry}
    rewind(feature)

    # representative point for downstream cell indexing
    c = geometry["coordinates"]
    if geometry["type"] == "Point":
        lon, lat = c
    elif geometry["type"] == "MultiLineString":
        lon, lat = c[0][0][0], c[0][0][1]
    elif geometry["type"] == "Polygon":
        lon, lat = c[0][0][0], c[0][0][1]
    else:  # MultiPolygon
        lon, lat = c[0][0][0][0], c[0][0][0][1]

    return {
        "id": oid,
        "geom_type": geometry["type"],
        "properties": json.dumps(props, separators=(",", ":")),
        "geometry": json.dumps(geometry, separators=(",", ":")),
        "geojson": json.dumps(feature, separators=(",", ":")),
        "lon": float(lon),
        "lat": float(lat),
    }


def extract(spark: SparkSession, server, approach: str = "iter",
            map_fn: Callable[[dict], dict] | None = None,
            top_filter: dict | None = None) -> DataFrame:
    """Full extraction pipeline; returns the feature DataFrame.

    ``map_fn`` is the engine's version of the reference's per-feature
    user hook — but applied batch-wise inside the page decode (it
    receives and returns a feature dict; still vectorized at the Arrow
    batch level, no extra pass over the data).

    ``top_filter`` (required for the top_features_* approaches; dict of
    groupByFields / topCount / orderByFields) is forwarded to the
    server's /queryTopFeatures endpoint — the per-group top-k reduction
    happens SERVER-side during paging, exactly like the reference's
    URL-fragment swap (/root/reference/lib/geometry.ts:74,
    index.ts:19-20); the count probe and every page run against the
    reduced feature set.
    """
    metadata = server.metadata()
    validate_metadata(metadata)

    if approach in ("top_features_iter", "top_features_bbox"):
        if top_filter is None:
            raise ValueError(
                "top_features approaches require a top_filter "
                "(groupByFields, topCount, orderByFields)")
    else:
        top_filter = None

    geom_type = metadata["geometryType"]
    oid_field = find_oid_field(metadata["fields"])
    schema_doc = field_to_schema(metadata)
    date_fields = {k for k, v in schema_doc["properties"].items()
                   if v.get("format") == "date-time"}

    if approach in ("iter", "top_features_iter"):
        count = server.query_count(top_filter) if top_filter is not None \
            else server.query_count()
        page = server.max_record_count
        manifest = spark.range(0, count, page).toDF("offset") \
            .withColumn("kind", F.lit("offset"))
        manifest = manifest.select(
            "kind", "offset",
            F.lit(None).cast("double").alias("xmin"),
            F.lit(None).cast("double").alias("ymin"),
            F.lit(None).cast("double").alias("xmax"),
            F.lit(None).cast("double").alias("ymax"))
    elif approach in ("bbox", "top_features_bbox"):
        ext = metadata["extent"]
        root = BBox(ext["xmin"], ext["ymin"], ext["xmax"], ext["ymax"])
        # driver-side quadtree refinement — the reference's adaptive
        # partitioner, run against cheap count probes only
        leaves = quadtree_partition(
            root,
            (lambda env: server.query_bbox_count(env, top_filter))
            if top_filter is not None else server.query_bbox_count,
            server.max_record_count)
        manifest = spark.createDataFrame(
            [("bbox", None, *b) for b in leaves],
            "kind string, offset long, xmin double, ymin double, "
            "xmax double, ymax double")
    else:
        raise ValueError("Unknown Approach")

    # one task per page/envelope; repartition so local[N] parallelizes
    n_tasks = max(manifest.count(), 1)
    manifest = manifest.repartition(min(int(n_tasks), 256))

    def decode_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for rec in b.itertuples(index=False):
                if rec.kind == "offset":
                    feats = _with_retries(
                        lambda: server.query_page(int(rec.offset),
                                                  top_filter=top_filter),
                        f"page offset={rec.offset}")
                else:
                    env = (rec.xmin, rec.ymin, rec.xmax, rec.ymax)
                    # a depth-capped quadtree leaf can still exceed the
                    # transfer limit (coincident features the splitter
                    # cannot separate — the reference's LIFO loop would
                    # re-split such an envelope forever,
                    # lib/geometry.ts:187-190). Drain it with
                    # resultOffset paging within the envelope instead
                    # of silently truncating.
                    feats = []
                    off = 0
                    prev_first = object()
                    while True:
                        page_feats, exceeded = _with_retries(
                            lambda o=off: server.query_bbox(
                                env, top_filter=top_filter, offset=o),
                            f"bbox {env} offset={off}")
                        # forward-progress guard: a server that ignores
                        # resultOffset (supportsPagination=false) or
                        # returns an empty exceeded page would loop
                        # forever accumulating the same rows — fail
                        # loudly instead of OOMing the executor
                        first = (page_feats[0]["attributes"]
                                 if page_feats else None)
                        if exceeded and (not page_feats
                                         or first == prev_first):
                            raise ValueError(
                                f"bbox {env}: server reports "
                                "exceededTransferLimit but makes no "
                                "paging progress (resultOffset "
                                "unsupported?) — cannot drain leaf")
                        prev_first = first
                        feats.extend(page_feats)
                        if not exceeded:
                            break
                        off += len(page_feats)
                for esri in feats:
                    row = _decode_feature(esri, geom_type, oid_field,
                                          date_fields)
                    if row is None:
                        continue
                    if map_fn is not None:
                        row = map_fn(row)
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    features = manifest.mapInPandas(decode_pages, schema=FEATURE_SCHEMA)
    # A2: cross-page/quadrant dedup — rows for a given OID are identical
    # across duplicates, so dropDuplicates' arbitrary pick is
    # deterministic. NOTE dropDuplicates treats NULL ids as equal, so
    # features missing their OID attribute collapse to one survivor —
    # intentional reference parity: the reference's seen-set does the
    # same (`this.set.add(undefined)` admits only the first OID-less
    # feature, lib/geometry.ts:193-196).
    return features.dropDuplicates(["id"])


def read_feature_table(spark: SparkSession, path: str) -> DataFrame:
    """Iceberg/parquet-resident variant: the table's own file plan is
    the manifest; Catalyst handles pruning/pushdown."""
    return spark.read.parquet(path)
