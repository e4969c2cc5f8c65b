"""Byte-pair-encoding vocabulary induction and encoding.

Real BPE (Sennrich, Haddow & Birch, ACL 2016 — public method), not
the "BPE-ish" regex tokenizer in `operators/text.py`: learn a merge
table from the corpus, then segment text with it. Completes the
tokenization story a training-data engine needs (count → quality →
LM-score → TOKENIZE).

Scale shape — the published algorithm's own structure is what makes
this Spark-friendly:

- BPE never iterates over the corpus. It iterates over the WORD
  FREQUENCY table: one corpus-scale tokenize+groupBy builds
  (word, count), and every merge round after that is vocab-sized
  (distinct words), orders of magnitude smaller than occurrences.
  At 100 TB the corpus is touched exactly once.
- Each merge round is: pair-count aggregate over the symbol arrays
  (weighted by word count), a deterministic argmax (ONE row to the
  driver — the only driver traffic, num_merges rows total), and a
  map-only fold applying the merge greedily left-to-right. The word
  table is localCheckpoint-ed per round so the iterative lineage
  stays flat (the component-labels precedent).
- Merge rounds are inherently SEQUENTIAL (each argmax depends on the
  table the previous merge produced) — this is the canonical
  iterative algorithm, which is exactly why `bpe_merges` carries a
  rows-only rationale instead of a DuckDB twin (CLAUDE.md allows
  this class); correctness is pinned EXACTLY by a pure-Python
  reference implementation in tests/test_bpe.py.
- Encoding never runs Python over the corpus either: the merge list
  (tiny) is applied to the DISTINCT word table with one vocab-sized
  ``mapInPandas``, and the corpus gets its piece counts via a
  broadcast-or-AQE join on the word — one corpus-scale join, zero
  corpus-scale Python.

Determinism: pair argmax breaks ties by (count DESC, left ASC,
right ASC) — a total order, so the merge table is a pure function of
the corpus however it is partitioned (two-layout probe in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .search import toks_expr

__all__ = ["bpe_train", "bpe_encode_words", "bpe_piece_counts",
           "END_MARK"]

# end-of-word marker symbol (Sennrich-style, appended as its own
# symbol so merges can learn word-final pieces)
END_MARK = "</w>"


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, count): the ONLY corpus-scale stage. Tokenizes with the
    shared bm25 spelling (`search.toks_expr`) so the BPE word
    universe can never drift from the lm/bm25 operators'."""
    return (docs.filter(F.col(text_col).isNotNull())
            .select(F.explode(F.expr(toks_expr(text_col))).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


# greedy left-to-right single-merge application over a symbol array:
# push x; if the top two of the stack are (left, right), replace them
# with the merged symbol. The merged symbol is left||right, which can
# never equal `right` (left is nonempty), so a freshly merged symbol
# cannot immediately re-trigger the same rule — exactly BPE's
# greedy-per-round semantics ("aaa" + rule (a,a) -> ["aa","a"]).
def _merge_fold(left: str, right: str) -> str:
    l, r = _sq(left), _sq(right)
    return ("aggregate(syms, CAST(array() AS ARRAY<STRING>), "
            "(acc, x) -> CASE WHEN size(acc) >= 1 "
            f"AND element_at(acc, -1) = '{l}' AND x = '{r}' "
            f"THEN concat(slice(acc, 1, size(acc) - 1), "
            f"array('{l}{r}')) "
            "ELSE concat(acc, array(x)) END)")


def _sq(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def bpe_train(docs: DataFrame, num_merges: int,
              text_col: str = "text",
              min_pair_count: int = 2) -> list[tuple[str, str, int]]:
    """Learn up to ``num_merges`` BPE merges from ``docs``. Returns
    the ordered merge list [(left, right, pair_count), ...] — tiny
    (≤ num_merges entries), the natural driver-side artifact a
    tokenizer ships with. Stops early when the best remaining pair
    occurs fewer than ``min_pair_count`` times.

    Words are symbol sequences of their characters plus END_MARK.
    Merge k's argmax is evaluated on the table produced by merges
    1..k-1 (sequential by definition — see module doc)."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    spark = docs.sparkSession
    words = (_word_counts(docs, text_col)
             .select(F.expr("concat(split(word, ''), "
                            f"array('{END_MARK}'))").alias("syms"),
                     F.col("n"))
             .localCheckpoint())
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs = (words.filter(F.size("syms") >= 2)
                 .select(F.explode(F.expr(
                     "transform(sequence(1, size(syms) - 1), "
                     "i -> struct(element_at(syms, i) AS l, "
                     "element_at(syms, i + 1) AS r))")).alias("p"),
                     F.col("n"))
                 .groupBy("p.l", "p.r").agg(F.sum("n").alias("c")))
        best = (pairs.orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
                .first())
        if best is None or best["c"] < min_pair_count:
            break
        merges.append((best["l"], best["r"], int(best["c"])))
        words = (words.select(
            F.expr(_merge_fold(best["l"], best["r"])).alias("syms"),
            F.col("n")).localCheckpoint())
    return merges


def bpe_merges_df(spark: SparkSession,
                  merges: list[tuple[str, str, int]]) -> DataFrame:
    """The merge list as a DataFrame (rank, left, right, pair_count)
    — the queries() face of ``bpe_train``."""
    rows = [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, pair_count bigint")


def bpe_encode_words(words: DataFrame,
                     merges: list[tuple[str, str, int]],
                     word_col: str = "word") -> DataFrame:
    """Apply a learned merge list to a DISTINCT word table: adds
    ``pieces`` (array<string>) and ``n_pieces``. Runs ONE vocab-sized
    ``mapInPandas`` — the per-word merge loop is inherently
    sequential Python, but it touches each distinct word once, never
    the corpus (the encode join in ``bpe_piece_counts`` is where the
    corpus meets the result)."""
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    def _encode(batches):
        import pandas as pd
        for pdf in batches:
            out_pieces, out_n = [], []
            for w in pdf[word_col]:
                syms = list(w) + [END_MARK]
                while len(syms) >= 2:
                    cands = [ranks[p] for p in zip(syms, syms[1:])
                             if p in ranks]
                    if not cands:
                        break
                    l, r, _ = merges[min(cands)]
                    merged, j = [], 0
                    while j < len(syms):
                        if (j + 1 < len(syms) and syms[j] == l
                                and syms[j + 1] == r):
                            merged.append(l + r)
                            j += 2
                        else:
                            merged.append(syms[j])
                            j += 1
                    syms = merged
                out_pieces.append(syms)
                out_n.append(len(syms))
            yield pd.DataFrame({word_col: pdf[word_col],
                                "pieces": out_pieces,
                                "n_pieces": out_n})

    schema = (f"{word_col} string, pieces array<string>, "
              f"n_pieces int")
    return words.select(word_col).mapInPandas(_encode, schema=schema)


def bpe_piece_counts(docs: DataFrame,
                     merges: list[tuple[str, str, int]],
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document BPE piece statistics under a learned merge list:
    (id, n_words, n_pieces, pieces_per_word). The corpus-scale work
    is one explode + one join against the vocab-sized encoded word
    table (AQE broadcasts it when it fits) + one rollup; Python only
    ever sees distinct words.

    Returns one row per document with >= 1 token: NULL texts and
    texts that tokenize to nothing (e.g. whitespace-only) carry no
    word evidence and are DROPPED, the same contract as
    ``lm.bigram_lm_score`` — join back to the documents table if full
    coverage is needed."""
    occurrences = (docs.filter(F.col(text_col).isNotNull())
                   .select(F.col(id_col),
                           F.explode(F.expr(toks_expr(text_col)))
                           .alias("word")))
    encoded = bpe_encode_words(
        occurrences.select("word").distinct(), merges)
    per_doc = (occurrences.join(encoded.select("word", "n_pieces"),
                                "word")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_words"),
                    F.sum("n_pieces").alias("n_pieces")))
    return per_doc.withColumn(
        "pieces_per_word",
        F.expr("CAST(n_pieces AS DOUBLE) / CAST(n_words AS DOUBLE)"))
