"""Corpus n-gram language-model scoring (CCNet-style quality filter).

Training-data pipelines filter documents by how well a language model
trained on a reference corpus predicts them (Wenzek et al., CCNet,
LREC 2020 — public method; the reference repo has no LM surface, this
is part of the training-data extension family). Two operators:

- ``bigram_lm_score`` — the DRIVER-GRADEABLE face: per-document
  corpus-typicality statistics that are exact cross-engine. Every
  column is an integer (bigram occurrence counts, summed corpus
  frequencies, rare-gram occurrences) except ``typicality``, which is
  ONE IEEE division of two exact-below-2^53 integers — the same
  bit-exactness construction as ``ann.quantized_cosine_topk`` (casts
  are exact, division is correctly rounded in both engines), so the
  DuckDB twin needs no rounding defense and no signed-zero
  normalization (the domain is positive).
- ``bigram_perplexity`` — true add-one-smoothed bigram NLL /
  perplexity. DELIBERATELY not oracle-twinned: the score is a
  distributed sum of hundreds of ``ln`` terms per document, and both
  the association order of a shuffled float sum and Java-vs-libm
  ``ln`` ulps make the low bits engine- and run-dependent; a rounded
  twin would be a coin-flip at the driver's bit-sensitive hash
  (CLAUDE.md signed-zero/ln notes). It is pinned instead by a pure-
  Python reference model in tests/test_lm.py at 1e-9 relative
  tolerance.

Spark-first shape (and why it scales):

- Tokenization reuses the bm25 spelling (`search.toks_expr` —
  ASCII ``translate`` fold — never locale ``lower()``): one
  ``regexp_extract_all`` per document, bigrams from one
  ``transform(sequence(...))`` over the token array; the text column
  never survives past the first projection.
- Gram keys are the repo's canonical md5 low-60-bit hash
  (``sample.hash_u60`` / ``hash_u60_sql`` — the CLAUDE.md
  one-spelling invariant), so every shuffle after the explode carries
  FIXED-WIDTH longs, never strings, and the DuckDB twin recomputes
  identical keys. A 2^-60 collision would merge the same two grams in
  BOTH engines — consistency is preserved even then.
- Count-then-join, never self-join: (doc, gram) occurrences are
  pre-aggregated per document (repetitive documents shrink before
  anything wide) and PERSISTED — fixed-width (id, long, long), never
  text — because they feed both the corpus-count aggregate and the
  scoring join (without the persist Catalyst plans the corpus-scale
  tokenize+explode subtree twice, the bm25 stats-base precedent). AQE
  broadcasts the counts side outright when the vocabulary fits —
  Zipf makes that the common case.
- At 100 TB the explode is corpus-token-scale — that is inherent to
  corpus LM counting — but everything it feeds is fixed-width and
  partially aggregated map-side; no stage ever shuffles text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sample import hash_u60, hash_u60_sql
from .search import toks_duck_sql, toks_expr

__all__ = ["bigram_lm_score", "bigram_lm_score_oracle_sql",
           "bigram_perplexity", "typicality_sql",
           "word_counts", "corpus_diversity", "zipf_topk", "ttr_sql",
           "corpus_diversity_oracle_sql", "zipf_topk_oracle_sql"]


def typicality_sql() -> str:
    """THE spelling of the typicality ratio over columns
    ``sum_freq`` / ``n_bigrams`` — shared verbatim by the Spark plan
    and the DuckDB twin. Both operands are integers below 2^53, so
    the casts are exact and the single IEEE division is correctly
    rounded in both engines: bit-identical with no rounding step."""
    return "CAST(sum_freq AS DOUBLE) / CAST(n_bigrams AS DOUBLE)"


# token arrays use search.toks_expr / search.toks_duck_sql — THE
# shared bm25 tokenizer spelling (one place, so the lm/bpe/bm25 word
# universes can never drift)


# Bigram array over a token-array column `_t` (1-based element_at,
# mirroring DuckDB's 1-based list indexing in the twin). Tokens never
# contain spaces, so the ' ' joiner is collision-free; they are never
# NULL, so Spark's NULL-propagating concat is safe here. The size
# guard matters: sequence(2, 1) would count DOWN in Spark.
_GRAMS_EXPR = ("CASE WHEN size(_t) >= 2 THEN "
               "transform(sequence(2, size(_t)), "
               "i -> concat(element_at(_t, i - 1), ' ', "
               "element_at(_t, i))) ELSE array() END")


def _docgram_counts(docs: DataFrame, id_col: str,
                    text_col: str) -> DataFrame:
    """(id, _g, n_occ): per-document occurrence counts of each
    hashed bigram. The only stage that sees text; output is
    fixed-width."""
    grams = (docs.filter(F.col(text_col).isNotNull())
             .select(F.col(id_col),
                     F.expr(toks_expr(text_col)).alias("_t"))
             .select(id_col, F.explode(F.expr(_GRAMS_EXPR)).alias("_gram"))
             .select(id_col, hash_u60("_gram").alias("_g")))
    return grams.groupBy(id_col, "_g").agg(
        F.count(F.lit(1)).alias("n_occ"))


def bigram_lm_score(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    min_count: int = 2) -> DataFrame:
    """Per-document corpus-typicality statistics from a bigram model
    counted over ``docs`` itself (counts include the document's own
    occurrences, so every gram has count >= 1 — no zero handling).

    Returns one row per document that has at least one bigram (NULL
    or sub-2-token texts carry no bigram evidence and are dropped):

    - ``n_bigrams``   — bigram occurrences in the document;
    - ``sum_freq``    — sum over those occurrences of the corpus-wide
      count of that bigram (how "seen elsewhere" the document is);
    - ``rare_bigrams``— occurrences whose corpus count is below
      ``min_count`` (the OOV/novelty tail a CCNet-style filter cuts);
    - ``typicality``  — ``sum_freq / n_bigrams``, the mean corpus
      frequency of the document's bigrams. Low = outlier/noise,
      high = boilerplate; both tails are what pipelines inspect.

    All-integer until the single final division (see module doc), so
    the DuckDB twin (``bigram_lm_score_oracle_sql``) matches
    bit-for-bit with no rounding defense.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    # persisted like bm25's stats base: docgrams feeds BOTH the corpus
    # counts and the scoring join, and without the persist Catalyst
    # plans the tokenize+explode subtree twice (the corpus-scale
    # stage). What is cached is (id, long, long) — fixed width, never
    # text. The entry lives in the SQL CacheManager until evicted
    # under storage-memory pressure or cleared explicitly
    # (spark.catalog.clearCache()) — persist() on a DataFrame is NOT
    # reclaimed when the result goes unreachable; callers scoring
    # many corpora in one session should clear between runs.
    docgrams = _docgram_counts(docs, id_col, text_col).persist()
    counts = docgrams.groupBy("_g").agg(F.sum("n_occ").alias("_c"))
    per_doc = (docgrams.join(counts, "_g")
               .groupBy(id_col)
               .agg(F.sum("n_occ").alias("n_bigrams"),
                    F.sum(F.col("n_occ") * F.col("_c")).alias("sum_freq"),
                    F.sum(F.when(F.col("_c") < min_count,
                                 F.col("n_occ")).otherwise(F.lit(0)))
                    .alias("rare_bigrams")))
    return per_doc.withColumn("typicality", F.expr(typicality_sql()))


def bigram_lm_score_oracle_sql(id_col: str = "doc_id",
                               text_col: str = "text",
                               min_count: int = 2,
                               table: str = "documents") -> str:
    """DuckDB twin of ``bigram_lm_score``: same tokenizer spelling,
    same md5-u60 gram keys (``hash_u60_sql`` — the one-spelling
    invariant), integer aggregates CAST to BIGINT (the HUGEINT /
    float64 representation trap), and the shared ``typicality_sql``
    division."""
    toks = toks_duck_sql(text_col)
    gram = "t[i-1] || ' ' || t[i]"
    return f"""
        WITH _tok AS (
            SELECT {id_col}, {toks} AS t
            FROM {table} WHERE {text_col} IS NOT NULL),
        _idx AS (
            SELECT {id_col}, t,
                   unnest(generate_series(2, len(t))) AS i
            FROM _tok WHERE len(t) >= 2),
        _docgrams AS (
            SELECT {id_col}, {hash_u60_sql(gram)} AS _g,
                   CAST(count(*) AS BIGINT) AS n_occ
            FROM _idx GROUP BY {id_col}, {hash_u60_sql(gram)}),
        _counts AS (
            SELECT _g, CAST(sum(n_occ) AS BIGINT) AS _c
            FROM _docgrams GROUP BY _g),
        _per AS (
            SELECT d.{id_col},
                   CAST(sum(d.n_occ) AS BIGINT) AS n_bigrams,
                   CAST(sum(d.n_occ * c._c) AS BIGINT) AS sum_freq,
                   CAST(sum(CASE WHEN c._c < {int(min_count)}
                            THEN d.n_occ ELSE 0 END) AS BIGINT)
                       AS rare_bigrams
            FROM _docgrams d JOIN _counts c ON d._g = c._g
            GROUP BY d.{id_col})
        SELECT {id_col}, n_bigrams, sum_freq, rare_bigrams,
               {typicality_sql()} AS typicality
        FROM _per"""


def bigram_perplexity(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Add-one-smoothed bigram NLL / perplexity of each document
    under the model counted from ``docs`` itself:

        P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)

    with V the corpus vocabulary size and c(w1) the unigram
    occurrence count of the history token. Returns (id, n_bigrams,
    nll, ppl) for documents with >= 1 bigram, where nll is the mean
    negative log-likelihood and ppl = exp(nll).

    Pytest-verified against a pure-Python reference (not
    oracle-twinned — module doc explains why a sum of ln terms can
    never face the driver's bit-sensitive hash). Plan shape matches
    ``bigram_lm_score`` plus one extra fixed-width join for the
    history-token counts; V and the (w1, w2) decomposition keep
    string keys out of every shuffle via the same md5-u60 hashing.
    """
    base = (docs.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col),
                    F.expr(toks_expr(text_col)).alias("_t")))
    # persisted tables hold only fixed-width longs (never token text)
    # and only at VOCAB cardinality, never corpus-occurrence
    # cardinality: uni_counts (one row per distinct token) feeds both
    # the history join and V — deriving V as its row count saves a
    # second corpus-scale pass over the token occurrences
    unis = (base.select(F.explode("_t").alias("_w"))
            .select(hash_u60("_w").alias("_w1")))
    uni_counts = unis.groupBy("_w1").agg(
        F.count(F.lit(1)).alias("_c1")).persist()
    vocab = uni_counts.agg(F.count(F.lit(1)).alias("_V"))

    pairs = (base.select(id_col, F.explode(F.expr(_GRAMS_EXPR))
                         .alias("_gram"))
             .select(id_col,
                     hash_u60("_gram").alias("_g"),
                     hash_u60(F.expr("split_part(_gram, ' ', 1)"))
                     .alias("_w1")))
    docgrams = pairs.groupBy(id_col, "_g", "_w1").agg(
        F.count(F.lit(1)).alias("n_occ")).persist()
    gram_counts = docgrams.groupBy("_g").agg(
        F.sum("n_occ").alias("_c12"))
    # no broadcast hint on uni_counts: the unigram vocabulary is
    # unbounded (a forced broadcast would OOM on a web-scale corpus);
    # AQE picks broadcast itself whenever the table fits. vocab is a
    # single row — always broadcastable.
    scored = (docgrams.join(gram_counts, "_g")
              .join(uni_counts, "_w1")
              .crossJoin(F.broadcast(vocab))
              .withColumn("_lp", F.col("n_occ") *
                          F.log((F.col("_c12") + F.lit(1)).cast("double") /
                                (F.col("_c1") + F.col("_V"))
                                .cast("double"))))
    per_doc = scored.groupBy(id_col).agg(
        F.sum("n_occ").alias("n_bigrams"),
        (-F.sum("_lp") / F.sum("n_occ")).alias("nll"))
    return per_doc.withColumn("ppl", F.exp("nll"))


# ------------------------------------------------- corpus diversity

def ttr_sql(types_expr: str, tokens_expr: str) -> str:
    """THE type-token-ratio spelling: one IEEE division over
    exactly-cast integer operands — bit-exact in both engines."""
    return (f"(CAST({types_expr} AS DOUBLE)"
            f" / CAST({tokens_expr} AS DOUBLE))")


def word_counts(docs: DataFrame, text_col: str = "text",
                by: tuple[str, ...] = ()) -> DataFrame:
    """Per-group word-frequency table ``(by..., w, freq)`` over the
    shared bm25 tokenizer (one spelling — the lm/bpe/bm25 rule).

    Scale: the tokenize+explode projection is codegen over the scan
    and the count aggregate partial-combines map-side, so each task
    ships its LOCAL vocabulary once — Zipf makes that far smaller
    than its token count. Downstream consumers (diversity, Zipf
    head) run over the vocab-sized result."""
    from .sketch import _no_clash
    groups = [str(g) for g in by]
    _no_clash(set(groups), "w", "freq", "_t")
    from .sample import _qcol, _qident
    src = (docs.filter(_qcol(text_col).isNotNull())
               .selectExpr(*[_qident(g) for g in groups],
                           f"{toks_expr(_qident(text_col))} AS _t")
               .selectExpr(*[_qident(g) for g in groups],
                           "explode_outer(_t) AS w")
               .where(F.col("w").isNotNull()))
    return (src.groupBy(*[_qcol(g) for g in groups], F.col("w"))
               .agg(F.expr("CAST(count(*) AS BIGINT)").alias("freq")))


def corpus_diversity(docs: DataFrame, text_col: str = "text",
                     by: tuple[str, ...] = ()) -> DataFrame:
    """Per-group corpus diversity: ``(by..., n_tokens, n_types,
    ttr)`` — total token occurrences, distinct word types, and the
    type-token ratio. The corpus-level redundancy gauge (a source
    whose TTR collapses is template/boilerplate-heavy) next to the
    per-document ``repetition`` gate. Groups with zero tokens emit
    no row (no 0-division). ALL-INTEGER plus one division — exact
    twin by construction.

    Scale: rolls up the vocab-sized ``word_counts`` table; the
    corpus-scale work is that one map-side-combined aggregate (never
    an Expand over raw tokens, which a direct COUNT DISTINCT would
    plan)."""
    from .sample import _qcol, _qident
    from .sketch import _no_clash
    groups = [str(g) for g in by]
    _no_clash(set(groups), "n_tokens", "n_types", "ttr")
    wc = word_counts(docs, text_col, by)
    return (wc.groupBy(*[_qcol(g) for g in groups])
              .agg(F.expr("CAST(sum(freq) AS BIGINT)")
                    .alias("n_tokens"),
                   F.expr("CAST(count(*) AS BIGINT)")
                    .alias("n_types"))
              .selectExpr(*[_qident(g) for g in groups],
                          "n_tokens", "n_types",
                          f"{ttr_sql('n_types', 'n_tokens')} AS ttr"))


def zipf_topk(docs: DataFrame, text_col: str = "text",
              by: tuple[str, ...] = (), k: int = 5) -> DataFrame:
    """Per-group Zipf head: the ``k`` most frequent words as
    ``(by..., rank, w, freq)`` with a DETERMINISTIC total order
    (freq DESC, word ASC — ties can never reorder between engines).
    The classic corpus diagnostic: a head that drifts from the
    expected stopword profile flags boilerplate injection or
    language-ID leaks.

    Scale: the rank window runs over the vocab-sized word-count
    table, partitioned by group — never over raw tokens."""
    if not (isinstance(k, int) and 1 <= k <= 10000):
        raise ValueError("k must be an int in [1, 10000]")
    from .sample import _qcol
    from .sketch import _no_clash
    groups = [str(g) for g in by]
    _no_clash(set(groups), "rank")
    from pyspark.sql import Window
    wc = word_counts(docs, text_col, by)
    win = (Window.partitionBy(*[_qcol(g) for g in groups])
                 .orderBy(F.desc("freq"), F.asc("w")))
    return (wc.withColumn("rank", F.row_number().over(win))
              .where(F.col("rank") <= k)
              .select(*[_qcol(g) for g in groups],
                      "rank", "w", "freq"))


def corpus_diversity_oracle_sql() -> str:
    """DuckDB twin of the ``corpus_diversity`` entry query: the
    identical word-count rollup per source over the shared tokenizer
    (sum cast is the HUGEINT rule) and THE ttr spelling — bit-exact.
    NULL sources filtered on both sides (NULL-ordering split)."""
    return f"""
        WITH w AS (
          SELECT source, unnest({toks_duck_sql('text')}) AS w
          FROM documents
          WHERE text IS NOT NULL AND source IS NOT NULL),
        c AS (
          SELECT source, w, CAST(count(*) AS BIGINT) AS freq
          FROM w GROUP BY source, w)
        SELECT source, CAST(sum(freq) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_types,
               {ttr_sql('count(*)', 'sum(freq)')} AS ttr
        FROM c GROUP BY source ORDER BY source"""


def zipf_topk_oracle_sql(k: int) -> str:
    """DuckDB twin of the ``zipf_topk`` entry query: identical
    word counts per lang and the identical deterministic rank order
    (freq DESC, w ASC) — ALL-INTEGER, exact by construction."""
    return f"""
        WITH w AS (
          SELECT lang, unnest({toks_duck_sql('text')}) AS w
          FROM documents
          WHERE text IS NOT NULL AND lang IS NOT NULL),
        c AS (
          SELECT lang, w, CAST(count(*) AS BIGINT) AS freq
          FROM w GROUP BY lang, w),
        r AS (
          SELECT lang, w, freq,
                 row_number() OVER (PARTITION BY lang
                     ORDER BY freq DESC, w ASC) AS rank
          FROM c)
        SELECT lang, CAST(rank AS INT) AS rank, w, freq
        FROM r WHERE rank <= {int(k)}
        ORDER BY lang, rank"""
