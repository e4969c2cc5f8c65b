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
           "write_tilejson_doc", "shard_assign", "write_training_shards",
           "read_training_shards"]


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


def shard_assign(df: DataFrame, id_col: str, num_shards: int,
                 seed: str = "", shard_col: str = "shard") -> DataFrame:
    """Deterministic shard id in ``[0, num_shards)``: the repo's
    md5-u60 hash of ``(id, seed)`` mod ``num_shards``. A pure function
    of the row — stable across reruns, resumes, parallelism, and
    engines (the hash is non-negative, so ``%`` agrees between Spark
    and ANSI SQL). Map-only, zero shuffle."""
    from .sample import hash_u60
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    if shard_col in df.columns:
        raise ValueError(f"`{shard_col}` already exists — pick "
                         "another shard_col")
    return df.withColumn(
        shard_col, hash_u60(id_col, seed) % F.lit(int(num_shards)))


def write_training_shards(df: DataFrame, path: str, id_col: str,
                          num_shards: int,
                          split_col: str | None = None,
                          seed: str = "", mode: str = "error",
                          shard_col: str = "shard") -> None:
    """Partitioned parquet training-shard sink: rows land in
    ``path/[split=…/]shard=K/`` by the deterministic ``shard_assign``
    hash, so a shard's CONTENT is a pure function of the data — two
    runs (or a resume) produce byte-stable row sets per directory,
    and a trainer can address "shard 17 of split train" forever.

    Scale shape: one shuffle — ``repartition`` on the partition
    columns — puts each (split, shard) combination in exactly ONE
    task, so every leaf directory holds ONE parquet file (no
    small-file explosion: output file count = #splits × num_shards,
    independent of input partitioning; size shards via num_shards,
    e.g. ~1 GiB each at the target scale). Rows are sorted by
    ``id_col`` within each file for stable read order and better
    column compression. Directory-partitioned layout means a reader
    filtering on split/shard prunes at the FILE level for free.
    """
    parts = ([split_col] if split_col else []) + [shard_col]
    out = shard_assign(df, id_col, num_shards, seed, shard_col)
    (out.repartition(*[F.col(c) for c in parts])
        .sortWithinPartitions(*parts, id_col)
        .write.partitionBy(*parts).mode(mode).parquet(path))


def read_training_shards(spark, path: str) -> DataFrame:
    """Read a ``write_training_shards`` layout back; the partition
    columns (split/shard) come back as directory-derived columns and
    filters on them prune directories before any file is opened."""
    return spark.read.parquet(path)


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
