"""Batch as-of join — attach the nearest prior right-side row per key.

The training-data-pipeline workhorse the equi-join can't express:
"for each event, the most recent snapshot/annotation/quote at or
before its timestamp". The reference engine has no temporal joins;
this extends the event family (SURVEY.md §2.8) the same way the
spatial layer extends its geometry core.

Spark-first plan (no per-row Python, ONE wide exchange):

    left  --+                                  (tag _side=1)
            |-- unionByName --> window over (key) ordered by
    right --+                   (_t, _side, tiebreak)          --> filter _side=1
            (tag _side=0)       last(<right cols>, ignorenulls)
                                carries the latest right payload
                                forward onto every left row

The union shuffles ONCE on the key for the window sort — the same
exchange an equi-join would need, with no range-explode and no
driver-side interval index, so it scales like any keyed window
(sessionize shares the plan family). Inclusive (right.ts <= left.ts)
vs strict (right.ts < left.ts) is purely the tie order of ``_side``
at equal timestamps.

Correctness is checked against DuckDB's native ``ASOF JOIN`` — an
independent implementation of the same semantics — in
``__spark_entry__.oracle_sql()['asof_events']`` and the unit suite.

Determinism: when several right rows share (key, right_time), pass
``tiebreak`` (a right column; the largest value wins, matching an
``arg_max`` oracle). Without it the pick among exact duplicates is
plan-dependent, like any unordered SQL tie.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]


def asof_join(left: DataFrame, right: DataFrame,
              by: str | list[str],
              left_time: str = "ts", right_time: str = "ts",
              right_cols: list[str] | None = None,
              prefix: str = "asof_",
              strict: bool = False,
              tolerance: float | None = None,
              tiebreak: str | None = None) -> DataFrame:
    """For every ``left`` row, the latest ``right`` row with the same
    ``by`` key and ``right_time`` <= ``left_time`` (``<`` when
    ``strict``); unmatched left rows keep NULLs (left-join
    semantics).

    Output: every left column, plus ``prefix + c`` for each carried
    right column and ``prefix + right_time`` (the matched timestamp).
    ``tolerance`` (seconds) voids matches older than
    ``left_time - tolerance``. ``right_cols=None`` carries every
    right column except the key and time.
    """
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in by and c != right_time]
    if tiebreak is not None and tiebreak not in right_cols:
        right_cols = right_cols + [tiebreak]
    carried = list(right_cols) + [right_time]
    lcols = [c for c in left.columns if c not in by]
    clash = {prefix + c for c in carried} & set(by + lcols)
    if clash:
        raise ValueError(
            f"prefixed right columns collide with left columns: "
            f"{sorted(clash)} — pick a different prefix")

    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    l = left.select(
        *by,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(rtypes[c]).alias(prefix + c) for c in carried],
    )
    r = right.select(
        *by,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        *[F.col(c).alias(prefix + c) for c in carried],
    )
    u = l.unionByName(r)

    # at equal _t: inclusive wants right rows (0) BEFORE the left row
    # so last() sees them; strict wants the left row first
    order = [F.col("_t").asc(),
             F.col("_side").desc() if strict else F.col("_side").asc()]
    if tiebreak is not None:
        # within equal (key, _t) right rows: ascending, so last() picks
        # the MAX tiebreak — the arg_max-deterministic winner
        order.append(F.col(prefix + tiebreak).asc())
    w = (Window.partitionBy(*by).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    attached = u.select(
        *by, "_t", "_side", *lcols,
        *[F.last(prefix + c, ignorenulls=True).over(w).alias(prefix + c)
          for c in carried],
    ).filter(F.col("_side") == 1)

    if tolerance is not None:
        mt = F.col(prefix + right_time)
        ok = mt.isNotNull() & (
            (F.col("_t").cast("double") - mt.cast("double"))
            <= F.lit(float(tolerance)))
        attached = attached.select(
            *by, "_t", "_side", *lcols,
            *[F.when(ok, F.col(prefix + c)).alias(prefix + c)
              for c in carried],
        )
    return attached.select(*by, *lcols,
                           *[prefix + c for c in carried])


def _bucket_sql(col: str, dtype: str, bucket_seconds: float) -> str:
    """SQL expression mapping a time column to its bucket ordinal.

    Timestamps bucket on integer microseconds (``unix_micros .. div``)
    — exact, no float rounding; numeric epoch columns use
    floor-of-division, which is monotone even under double rounding, so
    ``t >= start`` always implies ``bucket(t) >= bucket(start)``.
    """
    if dtype.startswith("timestamp"):
        us = int(round(bucket_seconds * 1_000_000))
        if us <= 0:
            raise ValueError("bucket_seconds too small for microsecond "
                             "timestamps")
        if dtype == "timestamp_ntz":
            # timestampdiff stays in the NTZ domain — no session-tz
            # cast, so bucketing is exact and tz-independent
            return (f"timestampdiff(MICROSECOND, "
                    f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`) "
                    f"div {us}")
        return f"unix_micros(`{col}`) div {us}"
    return f"cast(floor(`{col}` / {float(bucket_seconds)!r}) as bigint)"


def interval_join(events: DataFrame, intervals: DataFrame,
                  by: str | list[str] | None = None,
                  time_col: str = "ts",
                  start_col: str = "start", end_col: str = "end",
                  bucket_seconds: float = 3600.0,
                  max_fanout: int = 4096,
                  broadcast_intervals: bool | None = None) -> DataFrame:
    """Event-in-interval join: every (event, interval) pair with the
    same ``by`` key and ``start <= t <= end`` (inclusive both ends).

    The temporal analog of ``radius_join``: never an inequality
    (theta) join — time is quantized into fixed ``bucket_seconds``
    buckets, each interval explodes to the bucket range it spans
    (``sequence`` + ``explode``, pure JVM), each event lands in
    exactly ONE bucket, and the pair survives an equi-join on
    (key, bucket) plus the exact boundary filter. One bucket per
    event means each qualifying pair is produced exactly once — no
    dedup, no window, and the join is broadcast when the interval
    side is small, shuffle-hash otherwise. At 100 TB this is the only
    shape that survives: a raw ``t BETWEEN start AND end`` join is a
    BroadcastNestedLoop/cartesian.

    Pick ``bucket_seconds`` near the typical interval length: fan-out
    per interval is ``ceil(span / bucket)`` and is hard-capped at
    ``max_fanout`` (a ``raise_error`` guard fails fast instead of
    silently exploding a year-long interval into millions of rows).
    Degenerate intervals (``end < start``) match nothing and are
    pruned before the explode.

    Output: every event column, then every interval column not in
    ``by`` (clashes raise). Oracled against a plain DuckDB inequality
    join in ``__spark_entry__.oracle_sql()['interval_attrib']``.
    """
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    icols = [c for c in intervals.columns if c not in by]
    clash = set(icols) & set(events.columns)
    if clash:
        raise ValueError(
            f"interval columns collide with event columns: "
            f"{sorted(clash)} — rename before the join")
    for c in (start_col, end_col):
        if c not in icols:
            raise ValueError(f"interval side is missing `{c}`")

    edt, idt = dict(events.dtypes), dict(intervals.dtypes)
    e = events.withColumn(
        "_b", F.expr(_bucket_sql(time_col, edt[time_col], bucket_seconds)))
    b0 = F.expr(_bucket_sql(start_col, idt[start_col], bucket_seconds))
    b1 = F.expr(_bucket_sql(end_col, idt[end_col], bucket_seconds))
    guarded_b1 = F.when(
        (b1 - b0) < F.lit(int(max_fanout)), b1,
    ).otherwise(F.raise_error(F.lit(
        f"interval_join: an interval spans >= {max_fanout} buckets of "
        f"{bucket_seconds}s — raise bucket_seconds or max_fanout")))
    iv = (intervals
          .filter(F.col(end_col) >= F.col(start_col))
          .select(*by, *icols,
                  F.explode(F.sequence(b0, guarded_b1)).alias("_b")))

    if broadcast_intervals is None:
        broadcast_intervals = intervals.count() <= 1_000_000
    right = F.broadcast(iv) if broadcast_intervals else iv
    cand = e.join(right, by + ["_b"], "inner")
    out = cand.filter((F.col(start_col) <= F.col(time_col))
                      & (F.col(time_col) <= F.col(end_col)))
    return out.select(*events.columns, *icols)
