#!/usr/bin/env python
"""Benchmark harness.

Default run (what the driver does):
  * headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    on local[$SPARK_GRAFT_CPUS]
  * prints ONE JSON line:
      {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Scaling protocol (BASELINE.md): run with --scaling (also runs by default
unless SPARK_GRAFT_SCALING=0) to execute the identical spatial-join +
tile-assignment job at local[8] and local[32] on the same input and
write rows/sec at both plus efficiency = (r32/r8)/4 to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "200000"))


def _spark(cores: int):
    from esri_dump_spark.session import get_spark
    return get_spark(app_name=f"esri-dump-spark-bench-{cores}", cores=cores,
                     shuffle_partitions=max(cores * 2, 16))


def _spatial_tile_job(spark, images_path: str):
    """The north-star job: image table -> PIP spatial join (cell
    broadcast + ray-cast refine) -> tile assignment -> per-(poly, tile)
    rollup. Returns rows processed."""
    import pyspark.sql.functions as F
    from esri_dump_spark.operators.spatial_join import point_in_polygon_join
    from esri_dump_spark.operators.tiles import assign_tiles
    from esri_dump_spark.sources.fixtures import polygons_pdf

    imgs = spark.read.parquet(images_path).select("image_id", "lon", "lat")
    joined = point_in_polygon_join(imgs, polygons_pdf(), res=11)
    tiled = assign_tiles(joined, z=13)
    out = (tiled.groupBy("poly_id", "tile_id")
           .agg(F.count(F.lit(1)).alias("n")))
    out.count()  # materialize
    return imgs.count()


def run_headline(spark) -> dict[str, float]:
    import __spark_entry__ as E

    names = [
        "agg_pricing", "join_broadcast", "topk_window", "dedup_first_event",
        "cell_assign", "tile_assign", "pip_rect", "pip_diamond", "knn_geo",
        "token_count", "quality_score", "lang_id", "exact_dedup",
        "ann_cosine", "events_hourly", "minhash_pairs",
        "image_decode_stats", "extract_synthetic",
    ]
    qs = E.queries()
    times: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        print(f"  {name}: {times[name]}s ({n} rows)", file=sys.stderr)
    return times


def run_scaling(images_path: str) -> dict:
    results = {}
    for cores in (8, 32):
        spark = _spark(cores)
        try:
            _spatial_tile_job(spark, images_path)  # warm (JIT, page cache)
            t0 = time.time()
            n = _spatial_tile_job(spark, images_path)
            dt = time.time() - t0
            results[cores] = {"rows": n, "sec": round(dt, 3),
                              "rows_per_sec": round(n / dt, 1)}
        finally:
            spark.stop()
    r8, r32 = results[8]["rows_per_sec"], results[32]["rows_per_sec"]
    eff = (r32 / r8) / 4.0
    results["scaling_efficiency"] = round(eff, 3)

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH scaling protocol results

Job: spatial-join + tile-assignment over the deterministic synthetic
image table ({results[8]['rows']} rows, seed=42): PIP join (cell
broadcast + exact ray-cast refine, res 11) -> xyz tile assignment
(z=13) -> per-(polygon, tile) rollup. Identical input and plan at both
parallelism levels (sandbox stand-in for N vs 4N executors per
BASELINE.md).

| parallelism | elapsed (s) | rows/sec |
|---|---|---|
| local[8]  | {results[8]['sec']} | {results[8]['rows_per_sec']} |
| local[32] | {results[32]['sec']} | {results[32]['rows_per_sec']} |

**Scaling efficiency (rows/sec@32 / rows/sec@8) / 4 = {eff:.3f}**
(target >= 0.8 per BASELINE.json north rule)
""")
    return results


def main() -> None:
    from esri_dump_spark.sources.fixtures import ensure_images_parquet

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    images_path = ensure_images_parquet(N_IMAGES)

    spark = _spark(CPUS)
    t_start = time.time()
    times = run_headline(spark)

    # north-star throughput at full parallelism
    _spatial_tile_job(spark, images_path)  # warm
    t0 = time.time()
    n = _spatial_tile_job(spark, images_path)
    spatial_dt = time.time() - t0
    spark.stop()

    scaling = None
    do_scaling = ("--scaling" in sys.argv
                  or os.environ.get("SPARK_GRAFT_SCALING", "1") != "0")
    if do_scaling:
        scaling = run_scaling(images_path)

    out = {
        "metric": "headline_suite_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "spatial_join_rows": n,
        "spatial_join_rows_per_sec": round(n / spatial_dt, 1),
        "wall_sec": round(time.time() - t_start, 3),
    }
    if scaling:
        out["scaling_efficiency"] = scaling["scaling_efficiency"]
        out["rows_per_sec_local8"] = scaling[8]["rows_per_sec"]
        out["rows_per_sec_local32"] = scaling[32]["rows_per_sec"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
