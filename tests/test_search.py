"""BM25 lexical top-k (operators/search.py) against a brute-force
Python reference that reproduces the IEEE operation order of the
shared `_bm25_score_sql` spelling, plus contract and layout checks.
The DuckDB-twin parity runs in tests/test_oracle_parity.py once the
query is registered in __spark_entry__.py."""

from __future__ import annotations

import math
import re

import pytest

from esri_dump_spark.operators.search import bm25_topk, rrf_fuse

_TOK = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]")


def _ascii_lower(s: str) -> str:
    # the operator's translate() fold: ASCII-only, never Unicode lower
    return s.translate(str.maketrans(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"))

# Texts crafted so adjacent scores differ by >> 1e-3: cross-engine
# ln() wobble (sub-ulp) can never reorder or change the 6-dp rounding.
_DOCS = [
    (1, "spark spark spark joins the table"),
    (2, "spark merge merge sort is a table scan over rows"),
    (3, "merge only merge here merge merge"),
    (4, "nothing relevant appears in this document at all"),
    (5, "spark merge spark merge"),
    (6, None),
    (7, "spark"),
    (8, "a very long document that mentions spark once and then "
        "keeps going with many filler tokens to stretch the length "
        "normalization denominator out"),
]


def _brute(rows, terms, k, k1=1.2, b=0.75):
    docs = [(i, _TOK.findall(_ascii_lower(t)))
            for i, t in rows if t is not None]
    n = len(docs)
    avgdl = float(sum(len(ts) for _, ts in docs)) / n
    df = {t: sum(1 for _, ts in docs if t in ts) for t in terms}
    out = []
    for i, ts in docs:
        dl = len(ts)
        s = 0.0
        for t in terms:
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s = s + (idf * (ts.count(t) * (k1 + 1.0))
                     / (ts.count(t) + k1 * (1 - b + b * dl / avgdl)))
        if s > 0:
            out.append((i, round(s, 6)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return [(i, s, r + 1) for r, (i, s) in enumerate(out[:k])]


def _docs_df(spark):
    return spark.createDataFrame(_DOCS, "doc_id INT, text STRING")


def test_bm25_matches_brute_force(spark):
    got = [tuple(r) for r in
           bm25_topk(_docs_df(spark), ["spark", "merge"], k=5).collect()]
    exp = _brute(_DOCS, ["spark", "merge"], k=5)
    assert [(g[0], g[2]) for g in got] == [(e[0], e[2]) for e in exp]
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], abs=2e-6)
    # doc 4 (no term) and doc 6 (NULL) never appear at any k
    all_ids = {r[0] for r in
               bm25_topk(_docs_df(spark), ["spark", "merge"], k=100)
               .collect()}
    assert 4 not in all_ids and 6 not in all_ids


def test_bm25_k_exceeds_matches_returns_fewer(spark):
    rows = bm25_topk(_docs_df(spark), ["spark"], k=50).collect()
    assert len(rows) == 5  # docs 1,2,5,7,8 contain 'spark'
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]


def test_bm25_tf_and_length_physics(spark):
    # doc 3 is merge-dense AND short: both BM25 levers favor it
    top = bm25_topk(_docs_df(spark), ["merge"], k=1).collect()[0]
    assert top.doc_id == 3 and top.rank == 1


def test_bm25_layout_invariant(spark):
    a = sorted(map(tuple,
                   bm25_topk(_docs_df(spark), ["spark", "merge"], k=5)
                   .collect()))
    b = sorted(map(tuple,
                   bm25_topk(_docs_df(spark).repartition(7),
                             ["spark", "merge"], k=5).collect()))
    assert a == b


def _ranked(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id INT, rank INT")


def test_rrf_fuse_hand_example(spark):
    a = _ranked(spark, [(10, 1), (20, 2), (30, 3)])
    b = _ranked(spark, [(20, 1), (40, 2), (10, 3)])
    got = [tuple(r) for r in rrf_fuse([a, b], k=10, c=60).collect()]
    exp = sorted(
        [(10, 0.0 + 1 / 61 + 1 / 63, 2),
         (20, 0.0 + 1 / 62 + 1 / 61, 2),
         (30, 0.0 + 1 / 63 + 0.0, 1),
         (40, 0.0 + 0.0 + 1 / 62, 1)],
        key=lambda t: (-t[1], t[0]))
    assert got == [(i, s, n, r + 1)
                   for r, (i, s, n) in enumerate(exp)]
    # both-list consensus outranks either single-list entry
    assert got[0][0] in (10, 20) and got[0][2] == 2


def test_rrf_fuse_tie_breaks_by_id(spark):
    # doc 5 only in list A at rank 2; doc 3 only in list B at rank 2:
    # identical scores, id ascending wins
    a = _ranked(spark, [(9, 1), (5, 2)])
    b = _ranked(spark, [(9, 1), (3, 2)])
    rows = rrf_fuse([a, b], k=3).collect()
    assert [(r.doc_id, r.rank) for r in rows] == [(9, 1), (3, 2), (5, 3)]


def test_rrf_fuse_three_lists_fixed_fold_order(spark):
    lists = [
        _ranked(spark, [(1, 1), (2, 2)]),
        _ranked(spark, [(2, 1), (3, 2)]),
        _ranked(spark, [(3, 1), (1, 2)]),
    ]
    got = {r.doc_id: r.rrf for r in rrf_fuse(lists, k=10).collect()}
    # expected = the SAME left-to-right fold the operator documents
    exp = {
        1: ((0.0 + 1 / 61) + 0.0) + 1 / 62,
        2: ((0.0 + 1 / 62) + 1 / 61) + 0.0,
        3: ((0.0 + 0.0) + 1 / 62) + 1 / 61,
    }
    assert got == exp  # bit-exact, not approx


def test_rrf_fuse_validation(spark):
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])


def test_bm25_term_validation(spark):
    df = _docs_df(spark)
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(df, [])
    with pytest.raises(ValueError, match="distinct"):
        bm25_topk(df, ["spark", "spark"])
    for bad in ["Spark", "two words", "", "a-b", "gpt4"]:
        # 'gpt4' would tokenize as 'gpt','4' and silently never match
        with pytest.raises(ValueError, match="letter run"):
            bm25_topk(df, [bad])


def test_bm25_cross_engine_on_nasty_unicode(spark):
    """The round-5 review hazards, pinned: Java lower() would split
    U+0130 into 'i'+U+0307 (an extra symbol token) and Java \\s counts
    U+000B as whitespace while RE2 does not — the ASCII translate fold
    and the explicit whitespace class make both engines agree on this
    corpus. Full Spark-vs-DuckDB compare, not a brute-force proxy."""
    import duckdb
    import pandas as pd

    from esri_dump_spark.operators.search import bm25_topk_oracle_sql

    nasty = [
        (1, "SPARK İstanbul spark merge"),       # dotted capital I
        (2, "spark\x0bmerge spark"),                  # vertical tab
        (3, "MERGE merge Merge Über"),           # U+00DC
        (4, "spark " * 5 + "İ\x0bİ"),
        (5, None),
    ]
    sdf = spark.createDataFrame(nasty, "doc_id INT, text STRING")
    got = [tuple(r) for r in
           bm25_topk(sdf, ["spark", "merge"], k=10).collect()]

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        nasty, columns=["doc_id", "text"]))
    exp = con.sql(bm25_topk_oracle_sql(["spark", "merge"], k=10)
                  ).fetchall()
    assert got == [tuple(r) for r in exp]
    assert len(got) == 4
