"""Image+caption table source (S9 — BASELINE.json input_hint).

Schema contract:
  (image_id string, bytes binary, w int, h int, fmt string,
   caption string, phash long) [+ lon/lat carried for spatial ops]

At scale the table is Iceberg — ``spark.read.table`` against a catalog
name gives partition pruning, column pruning (``bytes`` skipped unless
projected), and bucketing metadata (bucket by cell for shuffle-free
spatial joins, SCALE.md). This sandbox has no Iceberg runtime jar, so
the same reader transparently falls back to a parquet path: every
downstream plan is identical because both are DataSource-v2 scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_images", "IMAGE_COLUMNS"]

IMAGE_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


def read_images(spark: SparkSession, source: str,
                with_bytes: bool = True) -> DataFrame:
    """Read the image table from a catalog table name (Iceberg in
    production) or a parquet path (sandbox fixture).

    ``with_bytes=False`` prunes the binary column at the scan — the
    default posture for any query that doesn't decode pixels, so the
    heavy column never enters the plan at all.
    """
    try:
        df = spark.read.table(source)
    except Exception as e:
        # fall back to a parquet path ONLY for not-a-table errors; a
        # real catalog failure (permissions, corrupt Iceberg metadata)
        # must surface, not morph into a misleading 'path does not
        # exist' from the parquet reader
        msg = f"{type(e).__name__}: {e}"
        if not any(tok in msg for tok in
                   ("TABLE_OR_VIEW_NOT_FOUND", "Table or view not found",
                    "PATH_NOT_FOUND", "ParseException",
                    "INVALID_IDENTIFIER", "not found")):
            raise
        df = spark.read.parquet(source)
    if not with_bytes:
        df = df.select([c for c in df.columns if c != "bytes"])
    return df
