"""Explicit skew handling: hot-key detection, salted repartition,
salted join, two-phase salted aggregation (north_rule requirement).

AQE's skew-join splitter is left ON as a backstop
(spark.sql.adaptive.skewJoin.enabled in session.py), but the engine
also handles skew *explicitly* so plans stay efficient when AQE can't
see the skew (e.g. pre-shuffle pandas UDF stages):

  * ``hot_keys``            — histogram the key, return keys above a
                              frequency threshold (tiny driver result:
                              only keys > threshold are collected)
  * ``salted_repartition``  — spread a hot key's rows over ``nsalt``
                              sub-partitions: repartition on
                              (key, salt) where salt is uniform for
                              hot keys and 0 otherwise
  * ``two_phase_agg``       — partial agg on (key, salt) then final on
                              key: map-side combine analog for skewed
                              groupBy
  * ``salted_join``         — big-side salt = pmod(hash(row), n),
                              small side exploded n ways for hot keys:
                              a shuffle equi-join where no single task
                              owns a whole hot key
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hot_keys", "salted_repartition", "two_phase_agg",
           "salted_join", "skew_report", "share_ppm_sql",
           "skew_report_oracle_sql"]


def hot_keys(df: DataFrame, key: str, threshold_frac: float = 0.01,
             min_count: int = 1000,
             sample_frac: float | None = None, seed: int = 42) -> list:
    """Keys holding more than ``threshold_frac`` of rows (and at least
    ``min_count``).

    ``sample_frac=None`` scans the full table — exact, test-scale.
    The SCALE PATH sets ``sample_frac`` (e.g. 0.001): the histogram
    runs on a Bernoulli sample and the thresholds scale by the
    fraction, so detection costs one sampled scan instead of two full
    ones. A key at threshold_frac of 10^12 rows appears ~10^7 times in
    a 0.001 sample — detection is effectively certain; only keys
    hovering at the threshold can flip, and both salting decisions are
    correct there (salting a near-hot key is harmless)."""
    if sample_frac is not None:
        df = df.sample(withReplacement=False, fraction=sample_frac,
                       seed=seed)
        scale = sample_frac
    else:
        scale = 1.0
    total = df.count()
    thresh = max(int(total * threshold_frac), min_count * scale)
    rows = (df.groupBy(key).count()
            .filter(F.col("count") >= thresh)
            .select(key).collect())
    return [r[0] for r in rows]


def _salt_col(df_key: Column, hot: list, nsalt: int, scatter: Column) -> Column:
    if not hot:
        return F.lit(0)
    return F.when(df_key.isin(hot), scatter).otherwise(F.lit(0))


def salted_repartition(df: DataFrame, key: str, nsalt: int = 16,
                       hot: list | None = None,
                       seed: int = 42, keep_salt: bool = False) -> DataFrame:
    """Repartition by (key, salt): hot keys fan out over nsalt
    sub-partitions, cold keys keep salt 0 (stable single partition).

    Pass-through schema: the helper ``_salt`` column is dropped after
    the exchange (the projection sits above the shuffle, so the
    partitioning survives) unless ``keep_salt=True``."""
    if hot is None:
        hot = hot_keys(df, key)
    scatter = (F.rand(seed) * nsalt).cast("int")
    out = df.withColumn("_salt", _salt_col(F.col(key), hot, nsalt, scatter))
    out = out.repartition(F.col(key), F.col("_salt"))
    return out if keep_salt else out.drop("_salt")


def two_phase_agg(df: DataFrame, key: str, aggs: dict[str, str],
                  nsalt: int = 16, hot: list | None = None,
                  seed: int = 42) -> DataFrame:
    """Skew-safe groupBy: partial aggregate on (key, salt), final on key.

    ``aggs`` maps output column -> 'fn(input)' where fn is decomposable
    (count / sum / min / max). e.g. {'n': 'count(*)', 's': 'sum(v)'}.
    """
    if hot is None:
        hot = hot_keys(df, key)
    scatter = (F.rand(seed) * nsalt).cast("int")
    salted = df.withColumn("_salt", _salt_col(F.col(key), hot, nsalt, scatter))

    partial_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        arg = arg.rstrip(")")
        fn = fn.strip().lower()
        p = f"__p_{out}"
        # \b: reject only the DISTINCT keyword, not a column whose
        # name happens to start with 'distinct'
        if re.match(r"distinct\b", arg.strip(), re.IGNORECASE):
            # per-(key,salt) distinct partials double-count values that
            # land in several salt buckets — not decomposable this way
            raise ValueError(
                f"non-decomposable agg {spec!r}: distinct aggregates "
                "cannot be salted (a value may appear in multiple salt "
                "buckets); use Spark's groupBy directly or "
                "approx_count_distinct")
        if fn == "count":
            partial_exprs.append(F.expr(f"count({arg})").alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(F.expr(f"{fn}({arg})").alias(p))
            final_exprs.append(getattr(F, fn)(p).alias(out))
        else:
            raise ValueError(f"non-decomposable agg {fn!r}")
    partial = salted.groupBy(key, "_salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                nsalt: int = 8, hot: list | None = None,
                how: str = "inner", seed: int = 42) -> DataFrame:
    """Shuffle equi-join with hot keys fanned out.

    big side:   salt = uniform(0..nsalt) for hot keys else 0
    small side: hot-key rows replicated nsalt times (explode), cold 0

    Only big-side-preserving join types are valid: replicating the
    small side nsalt ways means an UNMATCHED small row would surface
    once per replica under right/full outer — so those are rejected.
    """
    _SAFE_HOW = {"inner", "left", "left_outer", "leftouter",
                 "left_semi", "leftsemi", "semi",
                 "left_anti", "leftanti", "anti"}
    if how.lower().replace("_", "") not in {
            h.replace("_", "") for h in _SAFE_HOW}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side "
            "is replicated per salt, so right/full outer joins would "
            "emit unmatched small rows once per replica. Use "
            "big.join(small, key, how) directly for those.")
    if hot is None:
        hot = hot_keys(big, key)
    scatter = (F.rand(seed) * nsalt).cast("int")
    b = big.withColumn("_salt", _salt_col(F.col(key), hot, nsalt, scatter))
    if hot:
        s_hot = (small.filter(F.col(key).isin(hot))
                 .withColumn("_salt",
                             F.explode(F.sequence(F.lit(0), F.lit(nsalt - 1)))))
        # null-safe complement: ~isin(hot) is NULL (not True) for a
        # NULL key, which would silently drop small null-key rows
        s_cold = (small.filter(F.col(key).isNull() | ~F.col(key).isin(hot))
                  .withColumn("_salt", F.lit(0)))
        s = s_hot.unionByName(s_cold)
    else:
        s = small.withColumn("_salt", F.lit(0))
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def share_ppm_sql(cnt_expr: str, total_expr: str, dialect) -> str:
    """THE share spelling: parts-per-million as the ALL-INTEGER
    ``(cnt * 1000000) DIV total`` — exact in both engines, no float
    ever enters the share."""
    return (f"CAST((({cnt_expr}) * 1000000)"
            f" {dialect['div']} ({total_expr}) AS BIGINT)")


def skew_report(df: DataFrame, key_cols: tuple[str, ...],
                k: int = 10) -> DataFrame:
    """The pre-join skew gauge: the ``k`` heaviest join-key values as
    ``(rank, key..., cnt, share_ppm)`` — run it on a join input
    BEFORE committing to a shuffle strategy; a head key above a few
    percent is the signal to reach for ``salted_join`` /
    ``two_phase_agg`` (or trust AQE's splitter, which this report
    lets you verify). Deterministic total order (cnt DESC, keys ASC
    NULLS LAST — pinned explicitly: Spark's default ASC is NULLS
    FIRST, DuckDB's is NULLS LAST) and an ALL-INTEGER ppm share, so
    the observable face is exactly twinnable where ``hot_keys``
    (driver-side threshold list) is not.

    Scale: ONE map-side-combined count aggregate over the scan — the
    rank and the total both ride windows over the key-cardinality
    counts table (the total is a full-frame window sum, NOT a second
    aggregate branch: a separate ``counts.agg`` would re-plan the
    corpus scan and only runtime exchange reuse would save it).
    NULL keys count as their own group, like groupBy."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not (isinstance(k, int) and 1 <= k <= 100000):
        raise ValueError("k must be an int in [1, 100000]")
    from pyspark.sql import Window

    from .sample import _qcol
    from .sketch import SPARK, _no_clash
    keys = [str(c) for c in key_cols]
    _no_clash(set(keys), "cnt", "rank", "share_ppm", "_sr_total")
    from .sample import _qident
    counts = (df.groupBy(*[_qcol(c) for c in keys])
                .agg(F.expr("CAST(count(*) AS BIGINT)").alias("cnt")))
    win = Window.orderBy(F.desc("cnt"),
                         *[_qcol(c).asc_nulls_last() for c in keys])
    # the total is a full-frame window sum over the SAME (global)
    # counts partition the rank uses — one structural aggregate, no
    # second scan branch for exchange reuse to rescue
    tot_w = (Window.partitionBy()
                   .rowsBetween(Window.unboundedPreceding,
                                Window.unboundedFollowing))
    return (counts.withColumn("rank", F.row_number().over(win))
                  .withColumn("_sr_total",
                              F.sum("cnt").over(tot_w).cast("bigint"))
                  .where(F.col("rank") <= k)
                  .selectExpr("CAST(rank AS INT) AS rank",
                              *[_qident(c) for c in keys], "cnt",
                              share_ppm_sql("cnt", "_sr_total", SPARK)
                              + " AS share_ppm"))


def skew_report_oracle_sql(key_sql: str, table: str, k: int) -> str:
    """DuckDB twin of a ``skew_report`` over one key column: the
    identical count/rank/share derivation (NULLS LAST pinned on the
    tiebreak; DIV dialect via ``sketch.DUCK``) — ALL-INTEGER, exact
    by construction."""
    from .sketch import DUCK
    return f"""
        WITH c AS (
          SELECT {key_sql} AS key, CAST(count(*) AS BIGINT) AS cnt
          FROM {table} GROUP BY 1),
        t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
        r AS (
          SELECT key, cnt,
                 row_number() OVER (ORDER BY cnt DESC,
                                    key ASC NULLS LAST) AS rank
          FROM c)
        SELECT CAST(rank AS INT) AS rank, key, cnt,
               {share_ppm_sql('cnt', 'total', DUCK)} AS share_ppm
        FROM r, t WHERE rank <= {int(k)}
        ORDER BY rank"""
