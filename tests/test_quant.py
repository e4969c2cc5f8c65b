"""int8 embedding quantization + quantized cosine top-k
(operators/ann.py) against NumPy brute force reproducing the exact
floor-based derivation, plus the float-vs-quantized agreement check."""

from __future__ import annotations

import math

import numpy as np
import pytest

from esri_dump_spark.operators.ann import (cosine_topk,
                                           quantize_embeddings,
                                           quantized_cosine_topk)

_VECS = [
    (1, [1.0, -2.0, 0.5, 0.0]),
    (2, [0.001, 0.002, -0.003, 0.004]),   # tiny magnitudes
    (3, [5.0, 5.0, 5.0, 5.0]),
    (4, [0.0, 0.0, 0.0, 0.0]),            # zero vector
    (5, None),                            # NULL vector
    (6, [-7.25, 3.125, 0.0625, 1.0]),     # exact binary fractions
    (7, [1e-30, -1e-30, 1e-30, -1e-30]),  # denormal-ish scale
]


def _df(spark):
    return spark.createDataFrame(_VECS, "vec_id INT, embedding ARRAY<FLOAT>")


def _brute_q(vec):
    v = np.array(vec, dtype=np.float32).astype(np.float64)
    mx = float(np.max(np.abs(v))) if len(v) else 0.0
    if mx == 0.0:
        return [0] * len(v), 0.0
    q = [int(math.floor(float(x) * 127.0 / mx + 0.5)) for x in v]
    return q, mx / 127.0


def test_quantize_matches_brute_force(spark):
    rows = {r.vec_id: r for r in quantize_embeddings(_df(spark)).collect()}
    for i, vec in _VECS:
        if vec is None:
            assert rows[i].qvec is None and rows[i].scale is None
            continue
        q, scale = _brute_q(vec)
        assert rows[i].qvec == q, i
        assert rows[i].scale == pytest.approx(scale, rel=1e-12)
        assert all(-127 <= x <= 127 for x in rows[i].qvec)
    # the max-|v| element always hits +-127; zero vector -> zeros
    assert 127 in [abs(x) for x in rows[1].qvec]
    assert rows[4].qvec == [0, 0, 0, 0] and rows[4].scale == 0.0


def test_quantized_topk_matches_brute_force(spark):
    qt = quantize_embeddings(_df(spark))
    got = [(r.vec_id, r.cosq_r, r.rank) for r in
           quantized_cosine_topk(qt, k=10, query_vec_id=1).collect()]
    # brute force: same integer dots, same IEEE sqrt/div
    qs = {i: _brute_q(v)[0] for i, v in _VECS if v is not None}
    qq = qs[1]
    qn = sum(x * x for x in qq)
    exp = []
    for i, q in qs.items():
        pn = sum(x * x for x in q)
        if pn == 0:
            continue
        dot = sum(a * b for a, b in zip(qq, q))
        exp.append((i, round(dot / math.sqrt(float(qn) * float(pn)), 6)
                    + 0.0))
    exp.sort(key=lambda t: (-t[1], t[0]))
    assert got == [(i, c, r + 1) for r, (i, c) in enumerate(exp)]
    assert got[0][0] == 1 and got[0][1] == 1.0  # self-match tops


def test_quantized_topk_agrees_with_float_cosine(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = (emb.filter("vec_id = 3")
          .selectExpr("vec_id AS query_id", "embedding"))
    exact = [r.vec_id for r in cosine_topk(qv, emb, k=10).collect()]
    qt = quantize_embeddings(emb)
    quant = [r.vec_id for r in
             quantized_cosine_topk(qt, k=10, query_vec_id=3).collect()]
    # int8 keeps ~2-3 decimal digits of cosine: the top-10 sets agree
    # almost everywhere on real data; require >= 8/10 overlap and the
    # same #1
    assert quant[0] == exact[0] == 3
    assert len(set(quant) & set(exact)) >= 8


def test_quantized_topk_validation(spark):
    with pytest.raises(ValueError, match="positive"):
        quantized_cosine_topk(quantize_embeddings(_df(spark)), k=0,
                              query_vec_id=1)


def test_quantize_is_map_only_jvm(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = (quantize_embeddings(emb)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
