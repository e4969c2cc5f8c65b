"""Per-partition lineage + metrics and checkpoint-resumable runs
(north_rule: "each partition emits lineage + metrics records enabling
checkpoint-resumable runs").

Mechanics:
  * ``with_lineage(df, run_id, sink_dir, attempt_id=...)`` wraps a
    DataFrame in a mapInPandas pass-through that appends one lineage
    row per task partition — (run_id, attempt_id, partition_id,
    work_key range, work_keys set, n_rows, bytes_in, t_start, t_end,
    status) — to a parquet lineage sink, written atomically per
    partition (tmp file + rename) so a killed run leaves only complete
    records.
  * ``commit_attempt(sink_dir, run_id, attempt_id)`` — the durable
    "output landed" marker. Lineage rows are written during the SHUFFLE
    MAP stage, i.e. before the job's sink write commits; trusting them
    alone would let a crash between the map stage and the write mark
    work complete that produced no output. Resume therefore trusts only
    attempts whose marker exists, and the caller writes the marker
    strictly AFTER its sink write returns.
  * ``observe_metrics(df, name)`` attaches driver-visible aggregate
    metrics (row counts) via df.observe — the zero-cost path for
    whole-job counters.
  * ``completed_keys`` / ``pending_work`` are the resume operators:
    anti-join the work manifest against committed lineage — only
    unfinished work items survive. A restarted job re-plans exactly the
    missing partitions (the reference's LIFO bbox stack made this
    implicit; here it is explicit and durable).

Work keys are stored as a parquet ``list<string>`` column (never a
joined string): keys are file paths / cell ids and may legally contain
any delimiter character.
"""

from __future__ import annotations

import glob
import os
import time
import uuid
from typing import Iterator

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["LINEAGE_COLUMNS", "new_attempt_id", "with_lineage",
           "read_lineage", "commit_attempt", "committed_attempts",
           "observe_metrics", "pending_work", "completed_keys",
           "run_resumable"]

LINEAGE_COLUMNS = ["run_id", "attempt_id", "partition_id", "work_key",
                   "work_keys", "n_rows", "bytes_in", "t_start", "t_end",
                   "status"]

# explicit arrow schema: an empty/None work_keys cell must still be
# list<string> so Spark's parquet schema merge never sees a null type
_LINEAGE_PA_SCHEMA = pa.schema([
    ("run_id", pa.string()),
    ("attempt_id", pa.string()),
    ("partition_id", pa.int64()),
    ("work_key", pa.string()),
    ("work_keys", pa.list_(pa.string())),
    ("n_rows", pa.int64()),
    ("bytes_in", pa.int64()),
    ("t_start", pa.float64()),
    ("t_end", pa.float64()),
    ("status", pa.string()),
])


def new_attempt_id() -> str:
    """Fresh attempt id; pass it to ``with_lineage`` and, after the
    sink write succeeds, to ``commit_attempt``."""
    return uuid.uuid4().hex


def with_lineage(df: DataFrame, run_id: str, sink_dir: str,
                 work_key_col: str | None = None,
                 collect_keys: bool = False,
                 attempt_id: str | None = None) -> DataFrame:
    """Pass-through that records one lineage row per task partition.

    ``work_key_col``: optional column identifying the work item (page
    id, cell id, input file); recorded as min..max range per partition,
    or — with ``collect_keys=True`` — as the distinct-key set seen by
    the partition (``work_keys`` array column). The distinct-set form
    is what checkpoint-resume consumes (``completed_keys``): when work
    items never split across partitions (input files below
    ``spark.sql.files.maxPartitionBytes``; manifest pages), an ok
    partition certifies every one of its keys complete — once the
    attempt is committed (``commit_attempt``).
    The data itself is unchanged — downstream plans see the same rows.
    """
    os.makedirs(sink_dir, exist_ok=True)
    schema = df.schema
    cols = list(df.columns)
    key_idx = cols.index(work_key_col) if work_key_col else None
    attempt_id = attempt_id or new_attempt_id()

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
                        keys.update(str(k) for k in col.unique().tolist())
                    else:
                        kmin = col.min() if kmin is None \
                            else min(kmin, col.min())
                        kmax = col.max() if kmax is None \
                            else max(kmax, col.max())
                yield b
        except BaseException:
            # BaseException, not Exception: an early-closed iterator
            # (downstream limit/take, cancelled task) raises
            # GeneratorExit at the yield — that partition only
            # partially processed its keys and must NOT record ok,
            # or completed_keys would certify rows that never reached
            # the sink.
            status = "error"
            raise
        finally:
            work_key = f"{kmin}..{kmax}" if kmin is not None else None
            work_keys = sorted(keys) if keys else None
            tbl = pa.table({
                "run_id": [run_id], "attempt_id": [attempt_id],
                "partition_id": [pid], "work_key": [work_key],
                "work_keys": [work_keys],
                "n_rows": [n], "bytes_in": [nbytes],
                "t_start": [t0], "t_end": [time.time()],
                "status": [status],
            }, schema=_LINEAGE_PA_SCHEMA)
            tmp = os.path.join(sink_dir, f".{uuid.uuid4().hex}.tmp")
            pq.write_table(tbl, tmp)
            os.replace(tmp, os.path.join(
                sink_dir,
                f"lineage-{run_id}-{pid}-{uuid.uuid4().hex}.parquet"))

    return df.mapInPandas(run, schema=schema)


def read_lineage(spark, sink_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sink_dir, "lineage-*.parquet"))


def commit_attempt(sink_dir: str, run_id: str, attempt_id: str) -> None:
    """Durably mark ``attempt_id``'s output as committed. Call ONLY
    after the job's sink write has returned — this is the write-ahead
    ordering that makes resume crash-safe (lineage rows land during the
    map stage; the marker certifies the reduce/write stage finished)."""
    os.makedirs(sink_dir, exist_ok=True)
    tmp = os.path.join(sink_dir, f".{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        f.write(f"{time.time()}\n")
    os.replace(tmp, os.path.join(
        sink_dir, f"committed-{run_id}-{attempt_id}.marker"))


def committed_attempts(sink_dir: str, run_id: str) -> list[str]:
    pre = f"committed-{run_id}-"
    return [os.path.basename(p)[len(pre):-len(".marker")]
            for p in glob.glob(os.path.join(sink_dir, f"{pre}*.marker"))]


def observe_metrics(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """Attach whole-job counters; read ``obs.get`` after an action."""
    obs = Observation(name)
    observed = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    return observed, obs


def completed_keys(spark, sink_dir: str, run_id: str) -> DataFrame:
    """Work keys certified complete by earlier attempts of ``run_id``:
    the union of distinct keys from every ok partition of every
    COMMITTED attempt (lineage rows from attempts whose sink write
    never finished are ignored — their output does not exist, so their
    keys must be reprocessed). Valid whenever a work item never splits
    across partitions (unsplit input files, manifest rows) — then an
    ok partition saw *all* rows of each of its keys.

    Returns a one-column ``work_key`` DataFrame (empty if no committed
    lineage yet) for a broadcast left_anti against the new run's input.
    """
    attempts = committed_attempts(sink_dir, run_id)
    if not attempts or not glob.glob(
            os.path.join(sink_dir, "lineage-*.parquet")):
        return spark.createDataFrame([], "work_key string")
    lin = read_lineage(spark, sink_dir).filter(
        (F.col("run_id") == run_id) & (F.col("status") == "ok")
        & F.col("attempt_id").isin(attempts)
        & F.col("work_keys").isNotNull())
    return (lin.select(F.explode("work_keys").alias("work_key"))
            .distinct())


def pending_work(manifest: DataFrame, done: DataFrame,
                 manifest_key: str) -> DataFrame:
    """Resume: manifest work items not yet certified complete.

    ``done`` must be the output of :func:`completed_keys` (a
    one-column ``work_key`` DataFrame, commit-gated). Raw
    ``read_lineage`` output is NOT a valid input here: its
    ``work_key`` column holds ``min..max`` range strings that never
    equal a manifest key, and its rows land during the map stage —
    before the sink write commits — so trusting ``status == 'ok'``
    alone would mark work complete whose output never landed.
    ``completed_keys`` applies both gates; this is just the broadcast
    left_anti against the manifest."""
    done = done.select(F.col("work_key").alias(manifest_key)).distinct()
    return manifest.join(F.broadcast(done), manifest_key, "left_anti")


def run_resumable(spark, manifest: DataFrame, transform,
                  out_dir: str, run_id: str,
                  sink_name: str = "output",
                  work_key_col: str = "work_key") -> dict:
    """The checkpoint-resume harness, payload-agnostic: ONE place that
    owns the crash-safety ordering every resumable job must keep
    (CLAUDE.md invariant — lineage rows land during the map stage and
    certify NOTHING until the commit marker lands strictly AFTER the
    sink write returns).

    ``manifest``: the input rows plus a ``work_key_col`` identifying
    each work item (typically ``F.input_file_name()``); work items
    must not split across partitions (files below
    ``spark.sql.files.maxPartitionBytes``).
    ``transform``: DataFrame -> DataFrame over the PENDING manifest
    rows; its output is appended to ``{out_dir}/{sink_name}``, so it
    must be re-aggregatable or idempotent per work item.

    Returns {run_id, resumed_skipping_files, metrics}.
    """
    lineage_dir = f"{out_dir}/_lineage"
    attempt_id = new_attempt_id()
    done = completed_keys(spark, lineage_dir, run_id)
    n_done = done.count()
    pending = pending_work(manifest, done, work_key_col)
    # lineage wraps the SCAN side (pre-transform): a work item whose
    # rows all filter out downstream still certifies once scanned +
    # committed — wrapping post-transform leaves such items
    # re-processed on every resume, the pending set never converging
    pending = with_lineage(pending, run_id, lineage_dir,
                           work_key_col=work_key_col, collect_keys=True,
                           attempt_id=attempt_id)
    observed, obs = observe_metrics(transform(pending))
    observed.write.mode("append").parquet(f"{out_dir}/{sink_name}")
    # the ordering invariant: marker strictly after the sink write
    commit_attempt(lineage_dir, run_id, attempt_id)
    return {"run_id": run_id, "resumed_skipping_files": n_done,
            "metrics": dict(obs.get)}
