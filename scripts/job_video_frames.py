#!/usr/bin/env python
"""Checkpoint-resumable video frame-extraction job: MJPEG-AVI table ->
sampled frame rows (verbatim per-frame JPEG + phash/luma stats) with
per-partition lineage — the multimodal counterpart of
``job_spatial_tiles.py``, proving the lineage/resume machinery is
payload-agnostic (the work-key plumbing never looks at the bytes).

Run: scripts/submit.sh scripts/job_video_frames.py \
         <videos_parquet> <out_dir> <run_id> [every_n]

Resume model (identical to the spatial job): the work unit is the
input FILE; lineage wraps the SCAN side so a video whose frames all
fail to decode still certifies once scanned + committed (its rows land
as ok=false — the P3 contract — so the sink DOES receive them). On
restart with the same run_id + out_dir, completed files are anti-joined
away. Delivery is AT-LEAST-ONCE, not idempotent: a crash between the
sink append returning and ``commit_attempt`` writing the marker leaves
that attempt uncommitted, so resume re-processes the file and the sink
then holds its frame rows twice. Consumers must dedup by
(video_id, frame_idx) after a crash in that window — the same caveat
``run_resumable``'s docstring states.

Crash-safety ordering (CLAUDE.md invariant): lineage rows land during
the map stage and certify NOTHING until ``commit_attempt`` writes the
marker AFTER the sink write returns.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
import pyspark.sql.functions as F


def run(spark: SparkSession, videos_path: str, out_dir: str,
        run_id: str = "default", every_n: int = 2) -> dict:
    from esri_dump_spark.operators.lineage import run_resumable
    from esri_dump_spark.operators.multimodal import frame_sample

    vids = (spark.read.parquet(videos_path)
            .select("video_id", "bytes")
            .withColumn("work_key", F.input_file_name()))
    # the crash-safety ordering lives in run_resumable, not here
    return run_resumable(
        spark, vids, lambda pending: frame_sample(pending,
                                                  every_n=every_n),
        out_dir, run_id, sink_name="frames")


def main() -> None:
    videos_path = sys.argv[1] if len(sys.argv) > 1 else None
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/esri_video_out"
    run_id = sys.argv[3] if len(sys.argv) > 3 else "default"
    every_n = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    spark = SparkSession.builder.appName("esri-dump-video-job").getOrCreate()
    if videos_path is None:
        from esri_dump_spark.sources.fixtures import ensure_videos_parquet
        videos_path = ensure_videos_parquet(2000)
    print(run(spark, videos_path, out_dir, run_id, every_n))
    spark.stop()


if __name__ == "__main__":
    main()
