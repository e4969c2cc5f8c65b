"""File-granularity checkpoint-resume of the north-star job
(scripts/job_spatial_tiles.py): completed input files are certified by
per-partition lineage and skipped on restart; appended partial rollups
sum to the single-shot result.
"""

from __future__ import annotations

import importlib.util
import os

import pyspark.sql.functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "job_spatial_tiles", os.path.join(REPO, "scripts", "job_spatial_tiles.py"))
job = importlib.util.module_from_spec(spec)
spec.loader.exec_module(job)


def _write_points(spark, path, start, n, n_files):
    from esri_dump_spark.sources.feature_server import DEFAULT_EXTENT
    xmin, ymin, xmax, ymax = DEFAULT_EXTENT
    (spark.range(start, start + n, 1, n_files).selectExpr(
        "concat('img', id) AS image_id",
        f"{xmin} + {xmax - xmin} * ((cast(xxhash64(id, 7) as double) "
        "/ 9.223372036854776e18 + 1.0) / 2.0) AS lon",
        f"{ymin} + {ymax - ymin} * ((cast(xxhash64(id, 8) as double) "
        "/ 9.223372036854776e18 + 1.0) / 2.0) AS lat",
    ).write.mode("append").parquet(path))


def _totals(spark, out_dir):
    df = (spark.read.parquet(f"{out_dir}/assignments")
          .groupBy("poly_id", "tile_id").agg(F.sum("n").alias("n")))
    return sorted(tuple(r) for r in df.collect())


def test_job_resumes_from_file_lineage(spark, tmp_path):
    inp = str(tmp_path / "points")
    out = str(tmp_path / "out")
    ref_out = str(tmp_path / "ref_out")

    _write_points(spark, inp, 0, 4000, 4)
    r1 = job.run(spark, inp, out, run_id="r")
    assert r1["resumed_skipping_files"] == 0

    # new files arrive; restart must skip the 4 completed ones
    _write_points(spark, inp, 4000, 4000, 4)
    r2 = job.run(spark, inp, out, run_id="r")
    assert r2["resumed_skipping_files"] == 4

    # a third restart with nothing new processes zero rows
    r3 = job.run(spark, inp, out, run_id="r")
    assert r3["resumed_skipping_files"] == 8
    assert r3["metrics"]["n_rows"] == 0

    # summed partial rollups == single-shot run over everything
    ref = job.run(spark, inp, ref_out, run_id="fresh")
    assert ref["resumed_skipping_files"] == 0
    assert _totals(spark, out) == _totals(spark, ref_out)
