"""Winnowing fingerprints (MOSS) against a pure-Python reference
implementation of the published algorithm, the guarantee property
(shared substrings >= w+k-1 always produce a common fingerprint),
edge cases, layout invariance, and the DuckDB twin."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from esri_dump_spark.operators.winnow import (winnow_fingerprints,
                                              winnow_fingerprints_sql,
                                              winnow_overlap_pairs)


def _h60(v, seed=""):
    return int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16)


def _ref_winnow(text, k, w, seed=""):
    """The published algorithm verbatim: k-gram hashes, w-windows,
    min per window with rightmost tie-break, distinct selections."""
    if text is None or len(text) < k:
        return set()
    grams = [(_h60(text[i:i + k], seed), i + 1)
             for i in range(len(text) - k + 1)]
    out = set()
    n_windows = max(len(grams) - w + 1, 1)
    for j in range(n_windows):
        window = grams[j:j + w]
        mh = min(h for h, _ in window)
        pos = max(p for h, p in window if h == mh)  # rightmost tie
        out.add((pos, mh))
    return out


_TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "aaaaaaaaaaaaaaaa"),          # all grams identical: tie storm
    (4, "short"),                     # shorter than k -> no rows
    (5, ""),                          # empty -> no rows
    (6, None),                        # NULL -> no rows
    (7, "abcdefgh"),                  # exactly k chars: one gram
    (8, "abcdefghij"),                # fewer grams than w: one window
]


def _df(spark):
    return spark.createDataFrame(_TEXTS, "doc_id INT, text STRING")


def test_winnow_matches_reference(spark):
    got = {}
    for r in winnow_fingerprints(_df(spark), "doc_id",
                                 k=8, w=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for doc_id, text in _TEXTS:
        assert got.get(doc_id, set()) == _ref_winnow(text, 8, 4), \
            f"doc {doc_id}"
    # the tie storm selects exactly one fingerprint per window, all
    # the same hash, rightmost positions
    assert len(got[3]) == len(_ref_winnow("a" * 16, 8, 4)) > 0


def test_winnow_shared_passage_guarantee(spark):
    # any shared substring of length >= w + k - 1 = 11 must yield at
    # least one identical fingerprint in both documents
    passage = "SHARED-PASSAGE-XYZ"
    rows = [(1, "prefix one %s tail alpha" % passage),
            (2, "completely different start %s other end" % passage),
            (3, "no common content here at all whatsoever")]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    fps = {}
    for r in winnow_fingerprints(df, "doc_id", k=8, w=4).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "guaranteed shared fingerprint missing"
    pairs = {(r.doc_id_a, r.doc_id_b): r.n_shared_fps
             for r in winnow_overlap_pairs(df, "doc_id", k=8, w=4,
                                           min_shared=1).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnow_layout_invariant_and_twin(spark):
    df = _df(spark)
    a = sorted((r.doc_id, r.pos, r.fp) for r in
               winnow_fingerprints(df, "doc_id", k=8, w=4).collect())
    b = sorted((r.doc_id, r.pos, r.fp) for r in
               winnow_fingerprints(df.repartition(13), "doc_id",
                                   k=8, w=4).collect())
    assert a == b
    con = duckdb.connect()
    con.sql("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", _TEXTS)
    want = sorted(map(tuple, con.sql(winnow_fingerprints_sql(
        "doc_id", "text", 8, 4, table="t")).fetchall()))
    assert a == want


def test_winnow_validation_and_plan(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="positive"):
        winnow_fingerprints(df, "doc_id", k=0)
    with pytest.raises(ValueError, match="collide"):
        winnow_fingerprints(df.withColumn("_wf", df.doc_id), "doc_id")
    # `_wg` is a lambda variable now (the let-binding that keeps gram
    # hashing linear) — a real `_wg` column is shadowed, not a clash
    got = winnow_fingerprints(df.withColumn("_wg", df.doc_id),
                              "doc_id", k=8, w=4)
    ref = winnow_fingerprints(df, "doc_id", k=8, w=4)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, ref.collect()))
    # zero shuffles, zero Python before the explode
    plan = (winnow_fingerprints(df, "doc_id", k=8, w=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # the gram md5 must appear at exactly ONE site: a second site
    # means CollapseProject re-inlined the gram array into the window
    # references and hashing went quadratic in document length again
    assert plan.count("md5(") == 1, plan.count("md5(")
