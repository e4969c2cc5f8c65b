"""CLI entry point mirroring the reference's command surface
(/root/reference/cli.ts:75-107): the same five modes over this
engine's sources.

    python -m esri_dump_spark fetch     [--approach iter|bbox] <source>
    python -m esri_dump_spark schema    <source>
    python -m esri_dump_spark tilejson  <source>
    python -m esri_dump_spark stylejson <source>
    python -m esri_dump_spark discover  <source>

``<source>`` is either
  * ``synthetic:<n>[:<geometry>]`` — the deterministic synthetic
    FeatureServer (e.g. ``synthetic:2000:polygon``); the only
    fetchable/discoverable source in this environment (S1 in SURVEY.md:
    no live HTTP by design), or
  * a path to a JSON file holding a layer-metadata document (for the
    doc modes: schema / tilejson / stylejson) or a catalog tree (for
    discover).

Output parity with the reference: ``fetch`` streams one GeoJSON
feature per line (the 'feature' event loop in cli.ts:82-88),
``discover`` streams one JSON object per service/layer (cli.ts:96-104),
and the three doc modes print a single pretty-printed JSON document
(cli.ts:90-94). ``--header``/``--param`` are accepted for argument
parity (cli.ts options + lib/fetch.ts:11-39) and ignored with a note,
since no network request is ever made.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_source(src: str):
    """-> ('synthetic', server) | ('file', dict)."""
    if src.startswith("synthetic:"):
        from .sources.feature_server import SyntheticFeatureServer
        parts = src.split(":")
        n = int(parts[1]) if len(parts) > 1 and parts[1] else 1000
        geom = parts[2] if len(parts) > 2 else "point"
        gt = {"point": "esriGeometryPoint",
              "polyline": "esriGeometryPolyline",
              "polygon": "esriGeometryPolygon"}.get(geom, geom)
        return "synthetic", SyntheticFeatureServer(n_features=n,
                                                   geometry_type=gt)
    with open(src) as f:
        return "file", json.load(f)


def _metadata(kind, obj) -> dict:
    return obj.metadata() if kind == "synthetic" else obj


def _spark(cores: int):
    from .session import get_spark
    return get_spark(app_name="esri-dump-spark-cli", cores=cores,
                     shuffle_partitions=max(cores * 2, 8))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m esri_dump_spark",
        description="esri-dump-compatible modes over the Spark engine")
    p.add_argument("mode", choices=["fetch", "schema", "tilejson",
                                    "stylejson", "discover"])
    p.add_argument("source", help="synthetic:<n>[:<geometry>] or a "
                   "JSON metadata/tree file")
    p.add_argument("--approach", choices=["iter", "bbox"], default="iter",
                   help="fetch paging strategy (cli.ts --approach)")
    p.add_argument("--header", action="append", default=[],
                   metavar="K=V", help="accepted for parity; unused "
                   "(no live HTTP in this build)")
    p.add_argument("--param", action="append", default=[],
                   metavar="K=V", help="accepted for parity; unused")
    p.add_argument("--cores", type=int, default=4,
                   help="local Spark parallelism for fetch/discover")
    args = p.parse_args(argv)

    if args.header or args.param:
        print("note: --header/--param accepted for parity but unused "
              "(no live HTTP; see SURVEY.md S1)", file=sys.stderr)

    kind, obj = _parse_source(args.source)

    if args.mode == "schema":
        from .plans.schema import field_to_schema
        print(json.dumps(field_to_schema(_metadata(kind, obj)), indent=4))
        return 0
    if args.mode == "tilejson":
        from .plans.tilejson import tilejson
        print(json.dumps(tilejson(_metadata(kind, obj)), indent=4))
        return 0
    if args.mode == "stylejson":
        from .plans.stylejson import stylejson
        print(json.dumps(stylejson(_metadata(kind, obj)), indent=4))
        return 0

    if args.mode == "fetch":
        if kind != "synthetic":
            p.error("fetch needs a synthetic:<n> source — there is no "
                    "live HTTP transport in this build")
        spark = _spark(args.cores)
        try:
            from .operators.extract import extract
            df = extract(spark, obj, approach=args.approach)
            for row in df.select("geojson").toLocalIterator():
                print(row.geojson)
        finally:
            spark.stop()
        return 0

    # discover
    if kind == "synthetic":
        meta = obj.metadata()
        tree = {"services": [{"name": "synthetic", "type": "FeatureServer",
                              "layers": [meta]}]}
    else:
        tree = obj
    spark = _spark(args.cores)
    try:
        from .sources.discovery import discover_tree
        for row in discover_tree(spark, tree).toLocalIterator():
            print(json.dumps(row.asDict(), sort_keys=True))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
