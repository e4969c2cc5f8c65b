"""Approximate-nearest-neighbor search over an embedding column.

Two paths:
  * ``cosine_topk``      — brute-force exact top-k per query, entirely
                           in built-in expressions (zip_with/aggregate
                           dot product + window row_number). The
                           correctness baseline; O(|Q| x |P|) compute
                           but no shuffle of the big side beyond the
                           final window per query.
  * ``ivf_topk``         — IVF-style scale path: k-means-lite
                           centroids (sampled, driver-fit, tiny),
                           every vector assigned to its nearest
                           centroid JVM-side via a broadcast centroid
                           cross-score, queries probe ``nprobe``
                           nearest centroids, candidates equi-join on
                           centroid id, exact re-rank inside buckets.
                           At 10^12 rows the bucket join replaces the
                           full scan: compute drops by ~ncells/nprobe.

Distances are cosine; embeddings need not be normalized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["cosine_topk", "fit_centroids", "assign_centroid", "ivf_topk"]


def _cos_side(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    """Hoist the double cast + norm per ROW so the scoring stage folds
    one dot product per (query, vector) pair instead of three — bit-
    identical to the historical per-pair `dot/(na*nb)` expression
    (same element promotions, same fold order, same division; see
    dedup._cos_sides)."""
    return (df.withColumn(
                f"_n{out}",
                F.expr(f"sqrt(aggregate({vec_col}, 0D, (acc, v) -> "
                       f"acc + CAST(v AS DOUBLE) * v))"))
            .withColumn(out, F.expr(
                f"transform({vec_col}, x -> CAST(x AS DOUBLE))"))
            .drop(vec_col))


_PAIR_COS = ("aggregate(zip_with(_qv, _pv, (x, y) -> x * y), 0D, "
             "(acc, v) -> acc + v) / (_n_qv * _n_pv)")


def cosine_topk(queries: DataFrame, vectors: DataFrame, k: int,
                query_id: str = "query_id", vec_id: str = "vec_id",
                q_vec: str = "embedding", p_vec: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank)."""
    q = _cos_side(queries.select(F.col(query_id),
                                 F.col(q_vec).alias("_v")), "_v", "_qv")
    p = _cos_side(vectors.select(F.col(vec_id),
                                 F.col(p_vec).alias("_v")), "_v", "_pv")
    scored = (F.broadcast(q).crossJoin(p)
              .withColumn("cosine", F.expr(_PAIR_COS)))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(vec_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, vec_id,
                    F.round("cosine", 6).alias("cosine"), "rank"))


def fit_centroids(vectors: DataFrame, vec_col: str = "embedding",
                  n_centroids: int = 16, iters: int = 5,
                  sample: int = 4096, seed: int = 42) -> np.ndarray:
    """k-means-lite on a deterministic sample, fitted driver-side.
    The centroid matrix is tiny (n_centroids x dim) and broadcast to
    executors by closure.

    The sample is a seeded uniform draw over the WHOLE table — NOT
    ``limit(sample)``, which takes the head of the first partition(s)
    and fits centroids on whatever region of the sphere the table
    happens to start with (embedding dumps are typically ordered by
    source). Mechanics chosen for scale: a count (metadata-only on
    parquet/Iceberg) sizes a Bernoulli ``sample()`` whose expectation
    is ~1.25x the target, the sampled rows (bounded, ~1.25x sample)
    come to the driver, and a seeded driver-side choice trims to
    exactly ``sample``. No global sort and no single task ever sees
    more than its own partition's sampled rows — unlike
    orderBy(rand).limit, which funnels partitions x sample rows
    through one final task."""
    n = vectors.count()
    sel = vectors.select(vec_col)
    if n > sample:
        frac = min(1.0, 1.25 * sample / n)
        sel = sel.sample(withReplacement=False, fraction=frac, seed=seed)
    pdf = sel.toPandas()
    if len(pdf) > sample:
        rng0 = np.random.default_rng(seed)
        pdf = pdf.iloc[rng0.choice(len(pdf), size=sample, replace=False)]
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True).clip(min=1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ C.T
        assign = sims.argmax(axis=1)
        for j in range(C.shape[0]):
            m = assign == j
            if m.any():
                v = X[m].mean(axis=0)
                C[j] = v / max(np.linalg.norm(v), 1e-12)
    return C


def assign_centroid(df: DataFrame, centroids: np.ndarray,
                    vec_col: str = "embedding",
                    out: str = "centroid_id") -> DataFrame:
    """Nearest-centroid id per row (Arrow-batched matmul)."""
    C = centroids

    @pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True).clip(min=1e-12)
        return pd.Series((X @ C.T).argmax(axis=1).astype(np.int32))

    return df.withColumn(out, nearest(F.col(vec_col)))


def ivf_topk(queries: DataFrame, vectors: DataFrame, k: int,
             query_id: str = "query_id", vec_id: str = "vec_id",
             q_vec: str = "embedding", p_vec: str = "embedding",
             n_centroids: int = 16, nprobe: int = 4,
             centroids: np.ndarray | None = None) -> DataFrame:
    """IVF-bucketed ANN: probe ``nprobe`` centroid buckets per query,
    exact re-rank within. Recall < 1 by construction; raise nprobe to
    trade compute for recall (nprobe = n_centroids reproduces exact)."""
    if centroids is None:
        centroids = fit_centroids(vectors, p_vec, n_centroids)
    C = centroids
    npb = min(nprobe, C.shape[0])

    vecs = assign_centroid(
        vectors.select(F.col(vec_id), F.col(p_vec).alias("_pv")),
        C, "_pv")

    @pandas_udf("array<int>")
    def probes(qv: pd.Series) -> pd.Series:
        X = np.stack(qv.to_numpy()).astype(np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True).clip(min=1e-12)
        order = np.argsort(-(X @ C.T), axis=1)[:, :npb].astype(np.int32)
        return pd.Series(list(order))

    q = (queries.select(F.col(query_id), F.col(q_vec).alias("_qv"))
         .withColumn("centroid_id", F.explode(probes(F.col("_qv")))))
    # hoist after the probe UDF (it reads the raw float arrays) —
    # the re-rank then folds one dot per candidate
    q = _cos_side(q.withColumnRenamed("_qv", "_v"), "_v", "_qv")
    vecs = _cos_side(vecs.withColumnRenamed("_pv", "_v"), "_v", "_pv")

    cand = q.join(vecs, "centroid_id", "inner")
    scored = cand.withColumn("cosine", F.expr(_PAIR_COS))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(vec_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, vec_id,
                    F.round("cosine", 6).alias("cosine"), "rank"))
