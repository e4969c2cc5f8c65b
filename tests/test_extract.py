"""End-to-end extraction pipeline tests (EP1): synthetic FeatureServer
-> manifest -> mapInPandas decode -> dedup -> rewind -> GeoJSON rows.
Mirrors the reference's featureserver/mapserver e2e suites but fully
deterministic (SURVEY.md §5 style 3)."""

from __future__ import annotations

import json

import pytest

from esri_dump_spark.operators.extract import (
    extract, validate_metadata, iso8601_ms)
from esri_dump_spark.sources.feature_server import SyntheticFeatureServer
from esri_dump_spark.kernels.rewind import ring_signed_sum


def test_iso8601_parity():
    # JS: new Date(1600000000000).toISOString() === '2020-09-13T12:26:40.000Z'
    assert iso8601_ms(1600000000000) == "2020-09-13T12:26:40.000Z"
    assert iso8601_ms(1600000000123) == "2020-09-13T12:26:40.123Z"


def test_validate_metadata_errors():
    with pytest.raises(ValueError, match="query"):
        validate_metadata({"capabilities": "Map,Data"})
    with pytest.raises(ValueError, match="geometric"):
        validate_metadata({"capabilities": "Query"})
    with pytest.raises(ValueError, match="sublayers"):
        validate_metadata({"capabilities": "Query",
                           "extent": {"xmin": 0}, "subLayers": [1]})
    # requireGeometry=False: attribute-only layers OK (schema endpoint)
    validate_metadata({"capabilities": "Query"}, require_geometry=False)


@pytest.mark.parametrize("approach", ["iter", "bbox"])
def test_extract_points(spark, approach):
    srv = SyntheticFeatureServer(n_features=500, max_record_count=100,
                                 geometry_type="esriGeometryPoint")
    df = extract(spark, srv, approach=approach).cache()
    rows = df.collect()
    # 500 features minus the attribute-only ones (i % 97 == 5)
    expected = 500 - len([i for i in range(500) if i % 97 == 5])
    assert len(rows) == expected
    assert len({r.id for r in rows}) == len(rows)  # OIDs unique after dedup
    f = json.loads(next(r for r in rows if r.id == 1).geojson)
    assert f["type"] == "Feature" and f["geometry"]["type"] == "Point"
    props = f["properties"]
    # date guard parity: i=0 -> truthy epoch-ms converted to ISO
    assert props["eventdate"] == "2020-09-13T12:26:40.000Z"
    df.unpersist()


def test_extract_date_falsy_guard(spark):
    srv = SyntheticFeatureServer(n_features=30, max_record_count=10)
    rows = {r.id: json.loads(r.properties)
            for r in extract(spark, srv, approach="iter").collect()}
    # i % 11 == 3 -> None stays None; i % 11 == 7 -> 0 stays 0 (not 1970)
    assert rows[4]["eventdate"] is None
    assert rows[8]["eventdate"] == 0
    assert isinstance(rows[2]["eventdate"], str)


@pytest.mark.parametrize("approach", ["iter", "bbox"])
def test_extract_polygons_rewound(spark, approach):
    srv = SyntheticFeatureServer(n_features=200, max_record_count=64,
                                 geometry_type="esriGeometryPolygon")
    df = extract(spark, srv, approach=approach)
    rows = df.collect()
    assert len(rows) == 200 - len([i for i in range(200) if i % 97 == 5])
    for r in rows[:50]:
        g = json.loads(r.geometry)
        assert g["type"] in ("Polygon", "MultiPolygon")
        coords = g["coordinates"] if g["type"] == "MultiPolygon" else [g["coordinates"]]
        for poly in coords:
            assert ring_signed_sum(poly[0]) < 0, "exterior must be CCW (RFC 7946)"
            for hole in poly[1:]:
                assert ring_signed_sum(hole) >= 0, "holes must be CW"
    # features with i % 10 == 0 carry holes
    with_hole = json.loads(next(r for r in rows if r.id == 11).geometry)
    assert len(with_hole["coordinates"]) == 2


def test_extract_bbox_iter_agree(spark):
    """The two scan strategies must produce identical feature sets —
    the reference guarantees this via OID dedup over overlapping pages."""
    srv = SyntheticFeatureServer(n_features=300, max_record_count=50,
                                 geometry_type="esriGeometryPoint")
    a = {(r.id, r.geojson) for r in extract(spark, srv, "iter").collect()}
    b = {(r.id, r.geojson) for r in extract(spark, srv, "bbox").collect()}
    assert a == b


def test_extract_polyline(spark):
    srv = SyntheticFeatureServer(n_features=40, max_record_count=16,
                                 geometry_type="esriGeometryPolyline")
    rows = extract(spark, srv, "iter").collect()
    g = json.loads(rows[0].geometry)
    assert g["type"] == "MultiLineString"


def test_extract_user_map_hook(spark):
    srv = SyntheticFeatureServer(n_features=20, max_record_count=10)

    def upper_name(row):
        props = json.loads(row["properties"])
        props["name"] = props["name"].upper()
        row["properties"] = json.dumps(props, separators=(",", ":"))
        return row

    rows = extract(spark, srv, "iter", map_fn=upper_name).collect()
    assert all(json.loads(r.properties)["name"].startswith("FEAT-")
               for r in rows)


def test_top_features_extract_matches_reduction(spark):
    """S5: the server-side per-group top-k reduction — paged extraction
    over /queryTopFeatures must equal the reduction computed directly,
    minus client-side-filtered attribute-only rows; the bbox strategy
    must produce the identical set."""
    from esri_dump_spark.operators.extract import extract
    from esri_dump_spark.sources.feature_server import SyntheticFeatureServer
    srv = SyntheticFeatureServer(n_features=700, max_record_count=100,
                                 geometry_type="esriGeometryPoint")
    top = {"groupByFields": "rotation", "topCount": 2,
           "orderByFields": "value DESC"}

    # independent expectation from the raw attribute formulas
    groups: dict = {}
    for i in range(700):
        groups.setdefault(i % 360, []).append(i)
    exp = set()
    for rows in groups.values():
        rows.sort(key=lambda i: (-i * 0.5, i + 1))
        exp.update(i + 1 for i in rows[:2] if i % 97 != 5)

    got_iter = {r.id for r in
                extract(spark, srv, "top_features_iter", top_filter=top)
                .select("id").collect()}
    assert got_iter == exp
    got_bbox = {r.id for r in
                extract(spark, srv, "top_features_bbox", top_filter=top)
                .select("id").collect()}
    assert got_bbox == exp


def test_top_features_requires_filter(spark):
    import pytest as _pytest
    from esri_dump_spark.operators.extract import extract
    from esri_dump_spark.sources.feature_server import SyntheticFeatureServer
    srv = SyntheticFeatureServer(n_features=10)
    with _pytest.raises(ValueError, match="top_filter"):
        extract(spark, srv, "top_features_iter")


def test_extract_retries_transient_failures(spark):
    from esri_dump_spark.operators.extract import extract
    from esri_dump_spark.sources.feature_server import SyntheticFeatureServer
    flaky = SyntheticFeatureServer(n_features=1000, max_record_count=250,
                                   flaky_every=2, flaky_failures=2)
    stable = SyntheticFeatureServer(n_features=1000, max_record_count=250)
    a = sorted((r.id, r.geojson) for r in
               extract(spark, flaky).select("id", "geojson").collect())
    b = sorted((r.id, r.geojson) for r in
               extract(spark, stable).select("id", "geojson").collect())
    assert a == b


def test_extract_hard_fails_after_max_retries(spark):
    import pytest as _pytest
    from esri_dump_spark.operators.extract import extract
    from esri_dump_spark.sources.feature_server import SyntheticFeatureServer
    hopeless = SyntheticFeatureServer(n_features=500, max_record_count=250,
                                      flaky_every=2, flaky_failures=99)
    with _pytest.raises(Exception) as ei:
        extract(spark, hopeless).count()
    # reference parity: success bound is 5 attempts — geometry.ts
    # fetches six times but its post-loop `attempts > 5` check fails
    # the stream even when the sixth fetch succeeded
    assert "failed after 5 attempts" in str(ei.value)


def test_bbox_drains_depth_capped_coincident_leaf(spark):
    """Every feature at ONE point: no quadtree split can separate them,
    so the bbox approach hits a depth-capped leaf that exceeds the
    transfer limit and must drain it by within-envelope offset paging
    (the reference's LIFO loop would re-split such an envelope forever,
    lib/geometry.ts:187-190)."""
    srv = SyntheticFeatureServer(n_features=2500, max_record_count=1000,
                                 geometry_type="esriGeometryPoint",
                                 coincident_at=(-93.0, 24.0))
    got_bbox = {r.id for r in extract(spark, srv, "bbox")
                .select("id").collect()}
    got_iter = {r.id for r in extract(spark, srv, "iter")
                .select("id").collect()}
    # all geometry-bearing features (i % 97 != 5 are kept) survive;
    # nothing is silently truncated at the transfer limit
    exp = {i + 1 for i in range(2500) if i % 97 != 5}
    assert got_iter == exp
    assert got_bbox == exp


class _AttrServer(SyntheticFeatureServer):
    """Handcrafted attribute rows for order-semantics tests."""
    ROWS = [
        # (objectid, grp, a, b)
        (1, 1, 5, "x"),
        (2, 1, 5, "a"),
        (3, 1, 7, "z"),
        (4, 1, None, "a"),
        (5, 1, 5, "a"),
        (6, 2, 1, None),
        (7, 2, 1, "b"),
    ]

    def feature(self, i):
        oid, grp, a, b = self.ROWS[i]
        return {"attributes": {"objectid": oid, "grp": grp,
                               "a": a, "b": b},
                "geometry": {"x": 0.0, "y": 0.0}}


def test_top_feature_indices_multi_field_order():
    """ArcGIS orderByFields accepts a comma-separated multi-field list;
    each field keeps its own direction, NULLs last per field, OID as
    the final tie-break."""
    srv = _AttrServer(n_features=7)
    # single field: a DESC -> oid3 (a=7), then a=5 tie -> oid ASC -> oid1
    got = srv.top_feature_indices({"groupByFields": "grp", "topCount": 2,
                                   "orderByFields": "a DESC"})
    assert [srv.ROWS[i][0] for i in got] == [1, 3, 6, 7]
    # multi field: a DESC then b ASC -> oid3, then (5,'a') pair by oid
    got = srv.top_feature_indices({"groupByFields": "grp", "topCount": 2,
                                   "orderByFields": "a DESC, b ASC"})
    # grp1 keeps oid3 (a=7) then oid2 ((5,'a') beats (5,'x'), oid beats
    # oid5 on the tie); grp2 keeps oid7 then oid6 (NULL b last)
    assert [srv.ROWS[i][0] for i in got] == [2, 3, 6, 7]


def test_bbox_drain_fails_loudly_without_paging_progress(spark):
    """supportsPagination=false + a coincident cluster: the drain loop
    must detect that resultOffset makes no progress and raise, never
    spin forever accumulating the same page."""
    srv = SyntheticFeatureServer(n_features=2500, max_record_count=1000,
                                 geometry_type="esriGeometryPoint",
                                 coincident_at=(-93.0, 24.0),
                                 supports_pagination=False)
    with pytest.raises(Exception, match="no paging progress"):
        extract(spark, srv, "bbox").count()
