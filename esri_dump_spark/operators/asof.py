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

__all__ = ["asof_join"]


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
