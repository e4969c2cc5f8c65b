"""Corpus bigram LM scoring (operators/lm.py): hand-counted and
brute-force references for the integer-exact typicality statistics,
a DuckDB bit-pattern parity check for the twin, and a pure-Python
add-one model pinning `bigram_perplexity` (which is deliberately not
oracle-twinned — see the module doc). Driver-window parity for the
registered query runs in tests/test_oracle_parity.py."""

from __future__ import annotations

import math
import random
import re
import struct

import pytest

from esri_dump_spark.operators.lm import (
    bigram_lm_score, bigram_lm_score_oracle_sql, bigram_perplexity)

_TOK = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]")


def _ascii_lower(s: str) -> str:
    return s.translate(str.maketrans(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"))


def _bigrams(text: str) -> list[str]:
    ts = _TOK.findall(_ascii_lower(text))
    return [f"{a} {b}" for a, b in zip(ts, ts[1:])]


def _brute_score(rows, min_count=2):
    """Pure-Python bigram_lm_score: corpus counts, then per-doc
    (n_bigrams, sum_freq, rare_bigrams, typicality)."""
    per_doc = {i: _bigrams(t) for i, t in rows if t is not None}
    counts: dict[str, int] = {}
    for gs in per_doc.values():
        for g in gs:
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for i, gs in per_doc.items():
        if not gs:
            continue
        n = len(gs)
        sf = sum(counts[g] for g in gs)
        rare = sum(1 for g in gs if counts[g] < min_count)
        out[i] = (n, sf, rare, float(sf) / float(n))
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


_HAND = [
    (1, "a b A b c"),      # case fold: A -> a
    (2, "a b c"),
    (3, "x"),              # one token -> no bigrams -> dropped
    (4, None),             # NULL text -> dropped
]


def test_hand_example(spark):
    # corpus bigram counts: 'a b':3, 'b a':1, 'b c':2
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_freq"],
                         r["rare_bigrams"], r["typicality"])
           for r in bigram_lm_score(_df(spark, _HAND)).collect()}
    assert got == {1: (4, 2 * 3 + 1 + 2, 1, 9 / 4),
                   2: (2, 3 + 2, 0, 5 / 2)}


def test_brute_force_random_corpus(spark):
    rng = random.Random(7)
    vocab = ["spark", "join", "scan", "row", "agg", "t0", "42", "!"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(0, 30))))
            for i in range(60)]
    rows += [(100, None), (101, "solo")]
    for mc in (1, 2, 5):
        want = _brute_score(rows, min_count=mc)
        got = {r["doc_id"]: (r["n_bigrams"], r["sum_freq"],
                             r["rare_bigrams"], r["typicality"])
               for r in bigram_lm_score(_df(spark, rows),
                                        min_count=mc).collect()}
        # typicality is ints-below-2^53 division: Python's / is the
        # same correctly-rounded IEEE op, so equality is EXACT
        assert got == want


def test_duckdb_twin_bit_exact(spark):
    duckdb = pytest.importorskip("duckdb")
    rng = random.Random(11)
    vocab = ["a", "b", "c", "d", "UP", "7"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(2, 25))))
            for i in range(40)] + [(900, None), (901, "x")]
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_freq"],
                         r["rare_bigrams"], r["typicality"])
          for r in bigram_lm_score(_df(spark, rows),
                                   min_count=3).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {i: (n, sf, rare, ty) for i, n, sf, rare, ty in con.execute(
        bigram_lm_score_oracle_sql(min_count=3)).fetchall()}
    assert set(got) == set(want)
    for i in got:
        assert got[i][:3] == want[i][:3]
        # float compared on the IEEE bit pattern, the driver's bar
        assert struct.pack("<d", got[i][3]) == \
            struct.pack("<d", want[i][3]), i


def _brute_ppl(rows):
    docs = {i: _TOK.findall(_ascii_lower(t))
            for i, t in rows if t is not None}
    uni: dict[str, int] = {}
    big: dict[str, int] = {}
    for ts in docs.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            g = f"{a} {b}"
            big[g] = big.get(g, 0) + 1
    V = len(uni)
    out = {}
    for i, ts in docs.items():
        if len(ts) < 2:
            continue
        lp = sum(math.log((big[f"{a} {b}"] + 1) / (uni[a] + V))
                 for a, b in zip(ts, ts[1:]))
        n = len(ts) - 1
        out[i] = (n, -lp / n)
    return out


def test_perplexity_vs_python_reference(spark):
    rng = random.Random(3)
    vocab = ["the", "model", "sees", "data", "q", "9"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(2, 20))))
            for i in range(30)] + [(99, None)]
    want = _brute_ppl(rows)
    got = {r["doc_id"]: (r["n_bigrams"], r["nll"], r["ppl"])
           for r in bigram_perplexity(_df(spark, rows)).collect()}
    assert set(got) == set(want)
    for i, (n, nll) in want.items():
        gn, gnll, gppl = got[i]
        assert gn == n
        assert gnll == pytest.approx(nll, rel=1e-9)
        assert gppl == pytest.approx(math.exp(nll), rel=1e-9)
        assert gnll > 0  # every smoothed P < 1


def test_min_count_validation(spark):
    with pytest.raises(ValueError, match="min_count"):
        bigram_lm_score(_df(spark, _HAND), min_count=0)


def test_short_and_null_docs_dropped(spark):
    rows = [(1, None), (2, ""), (3, "one"), (4, "two tokens")]
    got = bigram_lm_score(_df(spark, rows)).collect()
    assert [r["doc_id"] for r in got] == [4]
    assert got[0]["n_bigrams"] == 1 and got[0]["typicality"] == 1.0


def test_plans_stay_jvm_side(spark):
    rows = [(1, "a b c d"), (2, "b c d e")]
    for df in (bigram_lm_score(_df(spark, rows)),
               bigram_perplexity(_df(spark, rows))):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


# ---------------------------------------------- corpus diversity

def _words(text: str) -> list[str]:
    return _TOK.findall(_ascii_lower(text))


def test_corpus_diversity_matches_python(spark):
    rows = [("s1", "a b a b c"), ("s1", "a a"), ("s2", "x y"),
            ("s1", None), (None, "dropped upstream")]
    from esri_dump_spark.operators.lm import corpus_diversity
    df = spark.createDataFrame(rows, "src string, text string")
    got = {r["src"]: r for r in
           corpus_diversity(df.where("src IS NOT NULL"),
                            "text", ("src",)).collect()}
    want = {}
    from collections import Counter
    per = {}
    for s, t in rows:
        if s is None or t is None:
            continue
        per.setdefault(s, Counter()).update(_words(t))
    for s, c in per.items():
        n_tok, n_typ = sum(c.values()), len(c)
        want[s] = (n_tok, n_typ, n_typ / n_tok)
    assert set(got) == set(want)
    for s, (nt, ny, ttr) in want.items():
        r = got[s]
        assert (r["n_tokens"], r["n_types"]) == (nt, ny)
        assert struct.pack("<d", r["ttr"]) == struct.pack("<d", ttr)


def test_zipf_topk_deterministic_ties(spark):
    # 'b' and 'c' tie on freq — rank must break by word ASC in both
    # engines, never by partition layout
    rows = [("l1", "a a a b b c c"), ("l1", "d")]
    from esri_dump_spark.operators.lm import zipf_topk
    df = spark.createDataFrame(rows, "lang string, text string")
    got = [(r["rank"], r["w"], r["freq"]) for r in
           zipf_topk(df, "text", ("lang",), 3)
           .orderBy("lang", "rank").collect()]
    assert got == [(1, "a", 3), (2, "b", 2), (3, "c", 2)]
    # layout invariance
    got13 = [(r["rank"], r["w"], r["freq"]) for r in
             zipf_topk(df.repartition(13), "text", ("lang",), 3)
             .orderBy("lang", "rank").collect()]
    assert got13 == got


def test_diversity_twins_bit_exact(spark, sf_dir):
    import duckdb
    from esri_dump_spark.operators.lm import (
        corpus_diversity, corpus_diversity_oracle_sql,
        zipf_topk, zipf_topk_oracle_sql)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    sp = (corpus_diversity(docs.where("source IS NOT NULL"),
                           "text", ("source",))
          .orderBy("source").collect())
    du = con.execute(corpus_diversity_oracle_sql()).fetchall()
    assert len(sp) == len(du) > 0
    for a, b in zip(sp, du):
        ta = tuple(a)
        assert ta[:3] == b[:3]
        assert struct.pack("<d", ta[3]) == struct.pack("<d", b[3])
    spz = (zipf_topk(docs.where("lang IS NOT NULL"),
                     "text", ("lang",), 5)
           .orderBy("lang", "rank").collect())
    duz = con.execute(zipf_topk_oracle_sql(5)).fetchall()
    assert len(spz) == len(duz) > 0
    assert [tuple(r) for r in spz] == [tuple(r) for r in duz]


def test_diversity_validation_and_plans(spark):
    from esri_dump_spark.operators.lm import (corpus_diversity,
                                              word_counts, zipf_topk)
    rows = [("l1", "a b c")]
    df = spark.createDataFrame(rows, "lang string, text string")
    with pytest.raises(ValueError, match="k must be"):
        zipf_topk(df, "text", ("lang",), 0)
    with pytest.raises(ValueError, match="collide"):
        word_counts(df.selectExpr("lang AS w", "text"), "text", ("w",))
    with pytest.raises(ValueError, match="collide"):
        corpus_diversity(df.selectExpr("lang AS ttr", "text"),
                         "text", ("ttr",))
    for d in (word_counts(df, "text", ("lang",)),
              corpus_diversity(df, "text", ("lang",)),
              zipf_topk(df, "text", ("lang",), 3)):
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
    # the word-count agg partial-combines map-side (local vocab per
    # task on the wire, never raw tokens)
    p = word_counts(df, "text", ("lang",)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert p.count("HashAggregate") >= 2
