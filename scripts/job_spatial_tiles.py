#!/usr/bin/env python
"""The north-star job as a spark-submit entry point: image table ->
point-in-polygon spatial join -> tile assignment -> per-(polygon, tile)
rollup, with per-partition lineage records and checkpoint-resume.

Run: scripts/submit.sh  (packages esri_dump_spark.zip via --py-files)
Args: [images_parquet] [output_dir] [lineage_dir]
"""

from __future__ import annotations

import sys
import uuid

from pyspark.sql import SparkSession
import pyspark.sql.functions as F


def main() -> None:
    images_path = sys.argv[1] if len(sys.argv) > 1 else None
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/esri_dump_spark_out"
    lineage_dir = sys.argv[3] if len(sys.argv) > 3 else f"{out_dir}/_lineage"

    spark = SparkSession.builder.appName("esri-dump-spark-job").getOrCreate()

    from esri_dump_spark.operators.spatial_join import point_in_polygon_join
    from esri_dump_spark.operators.tiles import assign_tiles
    from esri_dump_spark.operators.lineage import with_lineage, observe_metrics
    from esri_dump_spark.sources.fixtures import (polygons_pdf,
                                                  ensure_images_parquet)

    if images_path is None:
        images_path = ensure_images_parquet(100_000)

    run_id = uuid.uuid4().hex[:12]
    imgs = spark.read.parquet(images_path).select("image_id", "lon", "lat")
    joined = point_in_polygon_join(imgs, polygons_pdf(), res=11)
    tiled = assign_tiles(joined, z=13)
    tiled = with_lineage(tiled, run_id, lineage_dir)
    out = tiled.groupBy("poly_id", "tile_id").agg(
        F.count(F.lit(1)).alias("n"))
    observed, obs = observe_metrics(out)
    observed.write.mode("overwrite").parquet(f"{out_dir}/assignments")
    print({"run_id": run_id, "metrics": dict(obs.get)})
    spark.stop()


if __name__ == "__main__":
    main()
