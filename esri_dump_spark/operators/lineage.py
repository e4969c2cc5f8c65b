"""Per-partition lineage + metrics and checkpoint-resumable runs
(north_rule: "each partition emits lineage + metrics records enabling
checkpoint-resumable runs").

Mechanics:
  * ``with_lineage(df, run_id, sink)`` wraps a DataFrame in a
    mapInPandas pass-through that appends one lineage row per task
    partition — (run_id, partition_id, n_rows, bytes_in, t_start,
    t_end, status) — to a parquet lineage sink, written atomically per
    partition (tmp file + rename) so a killed run leaves only complete
    records.
  * ``observe_metrics(df, name)`` attaches driver-visible aggregate
    metrics (row counts, null geometry counts) via df.observe — the
    zero-cost path for whole-job counters.
  * ``pending_work(manifest, lineage, key)`` is the resume operator:
    anti-join the work manifest against completed lineage — only
    unfinished work items survive. A restarted job re-plans exactly the
    missing partitions (the reference's LIFO bbox stack made this
    implicit; here it is explicit and durable).
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["LINEAGE_COLUMNS", "with_lineage", "read_lineage",
           "observe_metrics", "pending_work", "completed_keys"]

LINEAGE_COLUMNS = ["run_id", "partition_id", "work_key", "n_rows",
                   "bytes_in", "t_start", "t_end", "status"]


def with_lineage(df: DataFrame, run_id: str, sink_dir: str,
                 work_key_col: str | None = None,
                 collect_keys: bool = False) -> DataFrame:
    """Pass-through that records one lineage row per task partition.

    ``work_key_col``: optional column identifying the work item (page
    id, cell id, input file); recorded as min..max range per partition,
    or — with ``collect_keys=True`` — as the comma-joined set of
    distinct keys seen by the partition. The distinct-set form is what
    checkpoint-resume consumes (``completed_keys``): when work items
    never split across partitions (input files below
    ``spark.sql.files.maxPartitionBytes``; manifest pages), an ok
    partition certifies every one of its keys complete.
    The data itself is unchanged — downstream plans see the same rows.
    """
    os.makedirs(sink_dir, exist_ok=True)
    schema = df.schema
    cols = list(df.columns)
    key_idx = cols.index(work_key_col) if work_key_col else None

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        t0 = time.time()
        n = 0
        nbytes = 0
        kmin = kmax = None
        keys: set = set()
        status = "ok"
        try:
            for b in it:
                n += len(b)
                nbytes += int(b.memory_usage(deep=True).sum())
                if key_idx is not None and len(b):
                    col = b.iloc[:, key_idx]
                    if collect_keys:
                        keys.update(col.unique().tolist())
                    else:
                        kmin = col.min() if kmin is None \
                            else min(kmin, col.min())
                        kmax = col.max() if kmax is None \
                            else max(kmax, col.max())
                yield b
        except Exception:
            status = "error"
            raise
        finally:
            if collect_keys:
                work_key = ",".join(sorted(str(k) for k in keys)) \
                    if keys else None
            else:
                work_key = f"{kmin}..{kmax}" if kmin is not None else None
            rec = pd.DataFrame([{
                "run_id": run_id, "partition_id": pid,
                "work_key": work_key,
                "n_rows": n, "bytes_in": nbytes,
                "t_start": t0, "t_end": time.time(), "status": status,
            }])
            # pin the schema: an all-null work_key must still be string
            rec["work_key"] = rec["work_key"].astype("string")
            tmp = os.path.join(sink_dir, f".{uuid.uuid4().hex}.tmp")
            rec.to_parquet(tmp, index=False)
            os.replace(tmp, os.path.join(
                sink_dir, f"lineage-{run_id}-{pid}-{uuid.uuid4().hex}.parquet"))

    return df.mapInPandas(run, schema=schema)


def read_lineage(spark, sink_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sink_dir, "lineage-*.parquet"))


def observe_metrics(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """Attach whole-job counters; read ``obs.get`` after an action."""
    obs = Observation(name)
    observed = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    return observed, obs


def completed_keys(spark, sink_dir: str, run_id: str) -> DataFrame:
    """Work keys certified complete by earlier attempts of ``run_id``:
    the union of distinct keys from every ok partition recorded with
    ``collect_keys=True``. Valid whenever a work item never splits
    across partitions (unsplit input files, manifest rows) — then an
    ok partition saw *all* rows of each of its keys.

    Returns a one-column ``work_key`` DataFrame (empty if no lineage
    yet) for a broadcast left_anti against the new run's input.
    """
    import glob
    if not glob.glob(os.path.join(sink_dir, "lineage-*.parquet")):
        return spark.createDataFrame([], "work_key string")
    lin = read_lineage(spark, sink_dir).filter(
        (F.col("run_id") == run_id) & (F.col("status") == "ok")
        & F.col("work_key").isNotNull())
    return (lin.select(F.explode(F.split("work_key", ","))
                       .alias("work_key"))
            .distinct())


def pending_work(manifest: DataFrame, lineage: DataFrame,
                 manifest_key: str, lineage_key: str = "work_key") -> DataFrame:
    """Resume: work items in the manifest with no completed lineage
    record. left_anti on the key — the restarted run processes only
    what is missing."""
    done = (lineage.filter(F.col("status") == "ok")
            .select(F.col(lineage_key).alias(manifest_key)).distinct())
    return manifest.join(done, manifest_key, "left_anti")
