"""BPE vocabulary induction (operators/bpe.py) against an exact
pure-Python reference implementation of Sennrich-style BPE with the
same determinism contract (argmax ties by count DESC, left ASC,
right ASC; greedy left-to-right merge application). bpe_train is the
repo's canonical iterative algorithm — rows-only in the driver
window by design — so THIS file is its correctness oracle."""

from __future__ import annotations

import random
import re

import pytest

from esri_dump_spark.operators.bpe import (
    END_MARK, bpe_encode_words, bpe_piece_counts, bpe_train)

_TOK = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]")


def _ascii_lower(s: str) -> str:
    return s.translate(str.maketrans(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"))


def _ref_word_counts(rows):
    counts: dict[str, int] = {}
    for _, t in rows:
        if t is None:
            continue
        for w in _TOK.findall(_ascii_lower(t)):
            counts[w] = counts.get(w, 0) + 1
    return counts


def _ref_train(word_counts, num_merges, min_pair_count=2):
    words = {tuple(list(w) + [END_MARK]): n
             for w, n in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        # count DESC, left ASC, right ASC — the operator's total order
        (l, r), c = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < min_pair_count:
            break
        merges.append((l, r, c))
        new = {}
        for syms, n in words.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            new[tuple(out)] = new.get(tuple(out), 0) + n
        words = new
    return merges


def _ref_encode(word, merges):
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    syms = list(word) + [END_MARK]
    while len(syms) >= 2:
        cands = [ranks[p] for p in zip(syms, syms[1:]) if p in ranks]
        if not cands:
            break
        l, r, _ = merges[min(cands)]
        out = []
        for x in syms:
            if out and out[-1] == l and x == r:
                out[-1] = l + r
            else:
                out.append(x)
        syms = out
    return syms


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


_ROWS = [
    (1, "low low low low low lower lower"),
    (2, "newest newest newest newest newest newest"),
    (3, "widest widest widest lowest!"),
    (4, None),
]


def test_train_matches_reference_hand_corpus(spark):
    got = bpe_train(_df(spark, _ROWS), num_merges=12)
    want = _ref_train(_ref_word_counts(_ROWS), 12)
    assert got == want
    assert len(got) >= 8
    # the classic corpus learns word-final 'est</w>' pieces en route
    assert any(l + r == "est" + END_MARK or l + r == "est"
               for l, r, _ in got)


def test_train_matches_reference_random(spark):
    rng = random.Random(5)
    vocab = ["banana", "bandana", "ban", "anna", "a", "7b!"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(1, 12))))
            for i in range(25)]
    got = bpe_train(_df(spark, rows), num_merges=15)
    want = _ref_train(_ref_word_counts(rows), 15)
    assert got == want


def test_train_layout_invariant(spark):
    df = _df(spark, _ROWS)
    assert bpe_train(df, 8) == bpe_train(df.repartition(13), 8)


def test_train_early_stop_and_validation(spark):
    # every word distinct and used once -> all pair counts are 1,
    # below the min_pair_count=2 floor: no merges at all
    rows = [(1, "abc xyz"), (2, "qrs")]
    assert bpe_train(_df(spark, rows), 5) == []
    with pytest.raises(ValueError, match="num_merges"):
        bpe_train(_df(spark, rows), 0)


def test_encode_words_matches_reference(spark):
    merges = bpe_train(_df(spark, _ROWS), 10)
    words = ["low", "lower", "lowest", "newest", "widest", "unseen",
             "w", "!"]
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: (list(r["pieces"]), r["n_pieces"])
           for r in bpe_encode_words(wdf, merges).collect()}
    for w in words:
        ref = _ref_encode(w, merges)
        assert got[w] == (ref, len(ref)), w
        # pieces always reassemble the word + end marker
        assert "".join(got[w][0]) == w + END_MARK


def test_piece_counts_brute(spark):
    merges = bpe_train(_df(spark, _ROWS), 10)
    rows = _ROWS + [(9, "   ")]   # whitespace-only: zero tokens
    got = {r["doc_id"]: (r["n_words"], r["n_pieces"],
                         r["pieces_per_word"])
           for r in bpe_piece_counts(_df(spark, rows), merges)
           .collect()}
    assert 9 not in got           # documented zero-token drop
    for i, t in _ROWS:
        if t is None:
            assert i not in got
            continue
        ws = _TOK.findall(_ascii_lower(t))
        np_ = sum(len(_ref_encode(w, merges)) for w in ws)
        assert got[i] == (len(ws), np_, np_ / len(ws))


def test_corpus_python_boundary(spark):
    """Python appears ONLY in the vocab-sized encode: the per-doc
    stats plan has exactly one MapInPandas, fed by a distinct over
    words — never by the raw corpus rows."""
    merges = bpe_train(_df(spark, _ROWS), 5)
    plan = (bpe_piece_counts(_df(spark, _ROWS), merges)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
