"""Dataset profiling — the "data card" rollup a training-data
pipeline publishes next to every corpus snapshot (row counts, null
counts, distinct cardinalities, value ranges per column). The
observability sibling of ``dedup.cluster_size_histogram``: run it
before and after a cleaning stage and the two profiles ARE the
stage's audit record.

Exactness contract: only INTEGRAL and STRING columns are profiled
(enforced). Integer min/max cast to string AFTER aggregation (never
before — lexicographic min of stringified ints is wrong), and both
engines render an int64 identically; string comparisons are binary
(UTF-8 byte order) in Spark AND DuckDB's default collation, and
count / count-distinct are exact integers — so the DuckDB twin
matches bit-for-bit with no rounding anywhere. Floats are rejected:
their string rendering is engine-dependent, and an exact profile of
a float column is better served by ``value_quantiles``-style rounded
stats.

Scale shape: ONE aggregate over the pruned column set. Spark plans
the multiple COUNT(DISTINCT) via Expand — each input row is
replicated once per distinct column (N+1 way), but only the profiled
columns survive pruning into the Expand, and the shuffle carries
partial aggregates, not rows. For very wide profiles at 100 TB,
profile in column batches (the op is per-call composable); the
1-row pivot to long format afterwards is driver-trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ByteType, IntegerType, LongType,
                               ShortType, StringType)

__all__ = ["profile_columns"]

_OK_TYPES = (ByteType, ShortType, IntegerType, LongType, StringType)


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: ``(col_name, n_rows, n_null,
    n_distinct, min_s, max_s)``. ``n_distinct`` ignores NULLs (both
    engines); an all-NULL column yields NULL min_s/max_s (both
    engines). Output is exactly ``len(cols)`` rows regardless of
    input size."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if len(set(cols)) != len(cols):
        raise ValueError("cols must be distinct")
    for c in cols:
        t = df.schema[c].dataType
        if not isinstance(t, _OK_TYPES):
            raise ValueError(
                f"`{c}` must be integral or string (got "
                f"{t.simpleString()}) — float renderings are "
                "engine-dependent; profile floats via rounded stats")
    # index-based internal aliases and backtick-quoted resolution
    # (never bare F.col(c)/df[c], which parse '.' as struct nesting):
    # column names may legally contain spaces, dots, quotes — they
    # must not reach the parser as identifiers, and the stack label
    # literal is quote-escaped
    from .sample import _qcol as _c
    aggs = [F.count(F.lit(1)).alias("_pc_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(_c(c)).alias(f"_pc_nn_{i}"),
            F.countDistinct(_c(c)).alias(f"_pc_nd_{i}"),
            # cast AFTER the aggregate: min of stringified ints would
            # be lexicographic ('10' < '9'), min-then-cast is numeric
            F.min(_c(c)).cast("string").alias(f"_pc_mn_{i}"),
            F.max(_c(c)).cast("string").alias(f"_pc_mx_{i}"),
        ]
    one = df.agg(*aggs)
    # Spark unescapes backslash sequences inside '...' literals, so
    # backslashes must double BEFORE quote doubling or 'a\b' comes
    # back as a backspace char in the published col_name
    stack_args = ", ".join(
        "'{}', _pc_nn_{i}, _pc_nd_{i}, _pc_mn_{i}, _pc_mx_{i}".format(
            c.replace("\\", "\\\\").replace("'", "''"), i=i)
        for i, c in enumerate(cols))
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, _pc_nn, n_distinct, min_s, max_s)",
        "_pc_n AS n_rows",
    ).selectExpr(
        "col_name", "n_rows",
        "n_rows - _pc_nn AS n_null",
        "n_distinct", "min_s", "max_s")
