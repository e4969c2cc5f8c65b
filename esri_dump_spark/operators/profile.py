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

__all__ = ["profile_columns", "moment_stats", "moment_mean_sql",
           "moment_var_sql", "rank_normalize", "pct_rank_sql",
           "rank_normalize_docs_oracle_sql"]

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


def moment_mean_sql(sx_expr: str, n_expr: str,
                    anchor: int = 0) -> str:
    """THE mean spelling: one IEEE division over exactly-cast integer
    operands — correctly rounded in both engines, bit-exact. With an
    anchor, ``mean = anchor + sum(x - anchor)/n`` adds ONE more
    correctly-rounded IEEE op on an exact-double anchor — still
    bit-exact. ``anchor = 0`` keeps the original spelling
    byte-identical (twin stability)."""
    div = (f"(CAST({sx_expr} AS DOUBLE)"
           f" / CAST({n_expr} AS DOUBLE))")
    if anchor == 0:
        return div
    return f"(CAST({int(anchor)} AS DOUBLE) + {div})"


def moment_var_sql(n_expr: str, sx_expr: str, sxx_expr: str) -> str:
    """THE population-variance spelling: ``(n*sxx - sx^2) / n^2``
    with the numerator and denominator formed ENTIRELY in BIGINT
    (exact; Cauchy-Schwarz keeps the numerator >= 0, so no signed
    zero can appear) and ONE IEEE division at the end. The int ->
    double CASTs are IEEE round-to-nearest in both engines even past
    2^53 — the HLL z_int precedent."""
    num = f"(({n_expr}) * ({sxx_expr}) - ({sx_expr}) * ({sx_expr}))"
    den = f"(({n_expr}) * ({n_expr}))"
    return (f"(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE))")


def moment_stats(df: DataFrame, value_col: str,
                 by: tuple[str, ...] = (),
                 anchor: int = 0) -> DataFrame:
    """Per-group exact moment statistics over an INTEGRAL column:
    ``(by..., n, sum_x, sum_xx, mean_x, var_pop, std_pop)``.
    ``sum_x``/``sum_xx`` are the moments of ``x - anchor``.

    The float-stats siblings (``stddev``, ``var_pop`` built-ins)
    accumulate DISTRIBUTED float sums — partition-order-dependent,
    never bit-stable across plans or engines (the bigram_perplexity
    precedent). This operator instead keeps every AGGREGATE
    all-integer (``sum(x)``, ``sum(x*x)`` in BIGINT — exact), and
    derives mean / variance / stddev in the final projection as a
    fixed chain of one IEEE division (plus one correctly-rounded
    ``sqrt`` for stddev) — bit-exact across engines with NO rounding,
    the CLAUDE.md construction.

    ``value_col`` must be integral (enforced). Overflow contract:
    the binding constraint is the variance numerator's ``sx * sx``
    and ``n * sxx`` products, both bounded by ``(n * max|x -
    anchor|)^2`` — so the requirement is ``n * max|x - anchor| <
    2^31.5 (~3.0e9)`` per group (NOT the looser ``n * max^2 < 2^63``,
    which only protects the sum-of-squares aggregate). Both engines
    RAISE on BIGINT overflow (Spark ANSI multiply, DuckDB always)
    rather than silently wrapping — pinned by test. When raw values
    are large but concentrated (timestamps, document offsets), pass
    an integer ``anchor`` near the mean: variance is
    translation-invariant, every aggregate stays exactly integer,
    and the bound applies to the small deviations instead of the raw
    magnitudes. NULL values are excluded BEFORE grouping (so every
    emitted group has ``n >= 1`` and the divisions never see 0); a
    group whose values are all NULL emits no row, and NULL GROUP
    KEYS among surviving rows form their own group (groupBy
    semantics — a SQL twin ordering on the keys must pin NULL
    placement, Spark default is NULLS FIRST vs DuckDB NULLS LAST).

    Scale: ONE map-side-combined aggregate over the scan — the wire
    carries three BIGINTs per group, never values."""
    vt = df.schema[value_col].dataType
    if not isinstance(vt, (ByteType, ShortType, IntegerType,
                           LongType)):
        raise ValueError(
            f"`{value_col}` must be integral (got {vt.simpleString()})"
            " — integer moments are what make variance exact")
    if not isinstance(anchor, int) or isinstance(anchor, bool) or \
            abs(anchor) >= 1 << 53:
        raise ValueError("anchor must be an int with |anchor| < 2^53 "
                         "(it must be an exact double for the mean)")
    from .sample import _qcol as _c, _qident as _q
    from .sketch import _no_clash
    groups = [str(g) for g in by]
    _no_clash(set(groups), "n", "sum_x", "sum_xx", "mean_x",
              "var_pop", "std_pop", "_ms_x")
    v = _q(value_col)
    centered = (f"CAST({v} AS BIGINT)" if anchor == 0 else
                f"CAST({v} AS BIGINT) - CAST({int(anchor)} AS BIGINT)")
    agg = (df.where(_c(value_col).isNotNull())
             .selectExpr(*[_q(g) for g in groups],
                         f"{centered} AS _ms_x")
             .groupBy(*[_c(g) for g in groups])
             .agg(F.expr("CAST(count(*) AS BIGINT)").alias("n"),
                  F.expr("CAST(sum(_ms_x) AS BIGINT)").alias("sum_x"),
                  F.expr("CAST(sum(_ms_x * _ms_x) AS BIGINT)")
                   .alias("sum_xx")))
    var = moment_var_sql("n", "sum_x", "sum_xx")
    return agg.selectExpr(*[_q(g) for g in groups],
                          "n", "sum_x", "sum_xx",
                          f"{moment_mean_sql('sum_x', 'n', anchor)}"
                          " AS mean_x",
                          f"{var} AS var_pop",
                          f"sqrt({var}) AS std_pop")


def moment_docs_oracle_sql() -> str:
    """DuckDB twin of the ``moment_stats`` entry query: identical
    integer moments over ``documents.n_chars`` per lang (sum casts
    are the HUGEINT rule; the products run in BIGINT because the
    operands are cast BEFORE multiplying) and the SAME mean/variance
    spellings — bit-exact by construction. NULL langs are filtered on
    both sides (engine NULL-ordering split)."""
    var = moment_var_sql("n", "sum_x", "sum_xx")
    return f"""
        WITH s AS (
          SELECT lang, CAST(n_chars AS BIGINT) AS x
          FROM documents
          WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        a AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sum_x,
                 CAST(sum(x * x) AS BIGINT) AS sum_xx
          FROM s GROUP BY lang)
        SELECT lang, n, sum_x, sum_xx,
               {moment_mean_sql('sum_x', 'n')} AS mean_x,
               {var} AS var_pop,
               sqrt({var}) AS std_pop
        FROM a ORDER BY lang"""


def pct_rank_sql(rn_expr: str, n_expr: str) -> str:
    """THE percent-rank spelling: one IEEE division over exactly-cast
    integer rank/count — bit-exact in both engines."""
    return (f"(CAST({rn_expr} AS DOUBLE)"
            f" / CAST({n_expr} AS DOUBLE))")


def rank_normalize(df: DataFrame, value_col: str,
                   by: tuple[str, ...] = (),
                   tie_cols: tuple[str, ...] = (),
                   out_col: str = "pct_rank") -> DataFrame:
    """Per-group rank normalization: append ``rank_n`` (1-based rank
    of ``value_col`` ascending), ``n_group`` and ``out_col`` =
    ``rank_n / n_group`` in (0, 1] — the cross-source calibration
    trick: raw quality scores from different scorers are not
    comparable, their per-source percentile ranks are. NULL and NaN
    values are EXCLUDED (they have no rank; rows drop — filter
    upstream to keep them).

    Determinism contract: ``(value_col, *tie_cols)`` must totally
    order each group — pass a unique id in ``tie_cols`` whenever
    values can repeat, or ranks of tied rows are layout-dependent
    (the caller owns this; the entry query ties on doc_id). All
    ranks/counts are integers and ``out_col`` is ONE division — the
    twin is exact by construction.

    Scale: one window exchange on the group keys (the topk_window
    shape); the count rides the same window frame, so there is no
    second aggregate or join."""
    from pyspark.sql import Window
    from .sample import _qcol, _qident
    from .sketch import _no_clash
    groups = [str(g) for g in by]
    ties = [str(t) for t in tie_cols]
    # check against EVERY input column, not just the named ones:
    # unlike the aggregate-shaped siblings this operator keeps all
    # columns, so a pre-existing rank_n would be silently overwritten
    _no_clash(set(df.columns),
              "rank_n", "n_group", str(out_col))
    v = _qident(value_col)
    src = df.where(F.expr(
        f"{v} IS NOT NULL AND NOT isnan(CAST({v} AS DOUBLE))"))
    # ties pin NULLS LAST: Spark's bare asc() is NULLS FIRST while a
    # SQL twin's bare ASC is NULLS LAST in DuckDB — the skew_report
    # rule (value_col needs no pin: NULLs are filtered above)
    win = (Window.partitionBy(*[_qcol(g) for g in groups])
                 .orderBy(_qcol(value_col).asc(),
                          *[_qcol(t).asc_nulls_last() for t in ties]))
    cw = (Window.partitionBy(*[_qcol(g) for g in groups])
                .rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing))
    return (src.withColumn("rank_n", F.row_number().over(win)
                            .cast("bigint"))
               .withColumn("n_group", F.count(F.lit(1)).over(cw)
                            .cast("bigint"))
               .withColumn(out_col,
                           F.expr(pct_rank_sql("rank_n", "n_group"))))


def rank_normalize_docs_oracle_sql() -> str:
    """DuckDB twin of the ``rank_normalize`` entry query: identical
    rank/count windows per lang over n_chars (tie: doc_id) and THE
    pct spelling — exact by construction. NULL langs filtered on
    both sides (NULL-ordering split)."""
    return f"""
        WITH s AS (
          SELECT doc_id, lang, n_chars
          FROM documents
          WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
        r AS (
          SELECT doc_id, lang, n_chars,
                 CAST(row_number() OVER (PARTITION BY lang
                      ORDER BY n_chars ASC, doc_id ASC) AS BIGINT)
                     AS rank_n,
                 CAST(count(*) OVER (PARTITION BY lang) AS BIGINT)
                     AS n_group
          FROM s)
        SELECT doc_id, lang, n_chars, rank_n, n_group,
               {pct_rank_sql('rank_n', 'n_group')} AS pct_rank
        FROM r ORDER BY lang, rank_n"""
