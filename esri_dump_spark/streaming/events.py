"""Streaming event-time operators over the events table shape
(event_id, ts, user_id, event_type, value, props).

  * ``windowed_counts`` — tumbling event-time window + watermark for
    late data; identical expression tree in batch and streaming mode
    (the batch twin is __spark_entry__.q_events_hourly's oracle-checked
    aggregate).
  * ``run_available_now`` — drain a bounded stream with the
    Trigger.AvailableNow pattern; the standard backfill-then-tail
    deployment shape.
  * ``sessionize`` — custom stateful operator via
    applyInPandasWithState: groups a user's events into sessions split
    by a gap timeout. This is the "custom stateful streaming operator"
    seam (SURVEY.md §2.8); it also runs in batch via applyInPandas for
    the deterministic tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_events_stream", "windowed_counts", "run_available_now",
           "dedup_events", "sessionize_batch", "sessionize_window",
           "sessionize_stream", "SESSION_SCHEMA"]


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window; works on both batch and streaming
    DataFrames (watermark applied only when streaming)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (src.groupBy(F.window("ts", window).alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("win.start").alias("window_start"),
                    "event_type", "n", "sum_value"))


def dedup_events(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "2 hours") -> DataFrame:
    """Exact dedup that works in BOTH execution modes — the streaming
    twin of the extraction's cross-page ``dropDuplicates('id')`` (A2):

      batch:     plain ``dropDuplicates(keys)`` (hash shuffle on keys);
      streaming: ``dropDuplicatesWithinWatermark(keys)`` — the state
                 store retains a key only until the watermark passes
                 its event time, so state is bounded by (dup horizon x
                 arrival rate) instead of growing with the whole
                 stream. That bound is the difference between a dedup
                 that survives an unbounded 10^12-row feed and one
                 that OOMs the state store.

    Duplicate rows are identical in real replays (a re-fetched page
    re-emits the same feature), so the arbitrary-survivor pick is
    deterministic in both modes."""
    keys = list(keys or ["event_id"])
    if events.isStreaming:
        # watermarks require zoned TIMESTAMP; parquet sources often
        # surface TIMESTAMP_NTZ
        src = events.withColumn("ts", F.col("ts").cast("timestamp"))
        return (src.withWatermark("ts", watermark)
                .dropDuplicatesWithinWatermark(keys))
    return events.dropDuplicates(keys)


def run_available_now(stream_df: DataFrame, query_name: str,
                      timeout_sec: int = 120, output_mode: str | None = None):
    """Drain everything currently available into an in-memory table and
    stop (backfill pattern). Returns the terminated query.

    ``output_mode=None`` picks the mode that is legal for the plan:
    'complete' only exists for aggregated streams, so non-aggregated
    streams (raw reads, dedup, filters) drain in 'append'. Raises
    TimeoutError if the drain does not finish within ``timeout_sec`` —
    returning a still-running query would hand callers a partially
    populated memory table with no warning."""
    if output_mode is None:
        # complete-mode requires a streaming aggregation: probe for an
        # Aggregate NODE at the start of a plan line (after the tree
        # art) — a raw substring match would also hit attribute names
        # like `AggregateScore#12`
        import re
        plan = stream_df._jdf.queryExecution().analyzed().toString()
        # tree-art prefix includes `~` on streaming nodes
        has_agg = re.search(r"(?m)^[\s:+\-~]*Aggregate[ \[]", plan)
        output_mode = "complete" if has_agg else "append"
    q = (stream_df.writeStream.format("memory")
         .queryName(query_name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"availableNow drain of {query_name!r} did not finish in "
            f"{timeout_sec}s (query stopped; memory table is partial)")
    return q


SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (batch form of the stateful operator):
    per user, events sorted by time; a gap > ``gap_minutes`` starts a
    new session. applyInPandas = one Arrow batch per user group."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def sess(key, pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [p for p in pdf_iter]
        pdf = pd.concat(frames).sort_values("ts")
        new_session = (pdf["ts"].diff() > gap).cumsum()
        out = pdf.groupby(new_session).agg(
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("event_id", "count"), sum_value=("value", "sum"))
        out.insert(0, "user_id", key[0])
        out["n_events"] = out["n_events"].astype("int64")
        yield out.reset_index(drop=True)

    return (events.select("user_id", "event_id", "ts", "value")
            .groupBy("user_id")
            .applyInPandas(lambda k, pdf: next(sess(k, iter([pdf]))),
                           schema=SESSION_SCHEMA))


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """The true custom stateful streaming operator (SURVEY.md §2.8):
    gap sessionization over an unbounded stream via
    ``applyInPandasWithState``. Per user, the open session lives in the
    state store across micro-batches; a batch CLOSES a session when a
    gap larger than ``gap_minutes`` is observed and emits it (append
    mode). The still-open tail session stays in state.

    The per-batch work is vectorized pandas (sort -> diff -> cumsum ->
    groupby agg) — no per-row Python. Assumes per-user event-time order
    across micro-batches (time-sliced input files / a watermarked
    upstream); same contract as the reference's page-ordered stream.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_minutes) * 60_000_000
    state_schema = T.StructType([
        T.StructField("session_start", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ])

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        # an empty batch iterator is legal (e.g. timeout-triggered keys);
        # pd.concat([]) raises, so it must be a no-op, not a crash
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            return
        evs = pd.concat(chunks)
        evs = evs.sort_values("ts")
        t = (evs["ts"].astype("datetime64[us]").astype("int64")).to_numpy()
        vals = evs["value"].to_numpy()

        carried = state.get if state.exists else None
        closed = []  # (start_us, end_us, n, sum)
        if carried is not None and t[0] - carried[1] > gap_us:
            closed.append(tuple(carried))
            carried = None

        # vectorized session split within the batch
        brk = (t[1:] - t[:-1]) > gap_us
        sid = pd.Series([0, *brk]).cumsum().to_numpy()
        g = pd.DataFrame({"sid": sid, "t": t, "v": vals}).groupby("sid")
        agg = g.agg(start=("t", "min"), end=("t", "max"),
                    n=("t", "size"), s=("v", "sum"))

        first = agg.iloc[0]
        if carried is not None:
            # batch's first session continues the carried open session
            agg.iloc[0] = (carried[0], first["end"],
                           carried[2] + first["n"], carried[3] + first["s"])
        closed.extend(map(tuple, agg.iloc[:-1].itertuples(index=False)))
        tail = agg.iloc[-1]
        state.update((int(tail["start"]), int(tail["end"]),
                      int(tail["n"]), float(tail["s"])))

        out = pd.DataFrame(closed, columns=["start", "end", "n", "s"])
        yield pd.DataFrame({
            "user_id": key[0],
            "session_start": pd.to_datetime(out["start"], unit="us"),
            "session_end": pd.to_datetime(out["end"], unit="us"),
            "n_events": out["n"].astype("int64"),
            "sum_value": out["s"].astype("float64"),
        })

    return (events.select("user_id", "ts", "value")
            .groupBy("user_id")
            .applyInPandasWithState(fn, SESSION_SCHEMA, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def sessionize_window(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap sessionization entirely JVM-side (two window passes: lag ->
    gap flag -> running sum = session id -> rollup). Identical result
    to ``sessionize_batch``; preferred in batch because it stays in
    whole-stage codegen with zero Python. The applyInPandas form exists
    as the batch twin of the applyInPandasWithState streaming operator,
    where per-key custom state genuinely needs Python."""
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    flagged = events.withColumn(
        "_brk", F.when(F.col("ts") - F.lag("ts").over(w) > gap, 1)
                 .otherwise(0))
    sess = flagged.withColumn(
        "_sess", F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "_sess")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .drop("_sess"))
