"""weighted_sample (Efraimidis-Spirakis top-n) and pack_sequences
(concat-then-chunk binning) against brute-force Python references
that reproduce the shared key/ordering derivations exactly."""

from __future__ import annotations

import hashlib
import math

import pytest

from esri_dump_spark.operators.sample import pack_sequences, weighted_sample

_U60 = 1 << 60


def _h60(v, seed=""):
    return int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16)


def _es_key(v, w, seed=""):
    # the operator orders by the 12-dp ROUNDED key (ties by id) —
    # the bm25-style defense against cross-engine ln() ulp wobble
    return round(math.log((_h60(v, seed) + 1) / _U60) / w, 12)


_ROWS = [  # (doc_id, weight) — includes zero, NULL, heavy and tiny
    (1, 100), (2, 1), (3, 0), (4, None), (5, 2500),
    (6, 40), (7, 7), (8, 900), (9, 13), (10, 1),
]


def _docs(spark):
    return spark.createDataFrame(_ROWS, "doc_id INT, w INT")


def _brute_top(n, seed=""):
    elig = [(i, w) for i, w in _ROWS if w is not None and w > 0]
    ranked = sorted(elig, key=lambda t: (-_es_key(t[0], t[1], seed), t[0]))
    return [i for i, _ in ranked[:n]]


def test_weighted_sample_matches_brute_force(spark):
    for n in (1, 3, 5, 20):
        got = sorted(r.doc_id for r in
                     weighted_sample(_docs(spark), n, "w", "doc_id")
                     .collect())
        assert got == sorted(_brute_top(n)), f"n={n}"


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    got = {r.doc_id for r in
           weighted_sample(_docs(spark), 20, "w", "doc_id").collect()}
    assert 3 not in got and 4 not in got and len(got) == 8


def test_weighted_sample_nests_and_is_layout_invariant(spark):
    top3 = {r.doc_id for r in
            weighted_sample(_docs(spark), 3, "w", "doc_id").collect()}
    top7 = {r.doc_id for r in
            weighted_sample(_docs(spark).repartition(5), 7, "w",
                            "doc_id").collect()}
    assert top3 <= top7


def test_weighted_sample_seed_changes_draw(spark):
    a = {r.doc_id for r in
         weighted_sample(_docs(spark), 4, "w", "doc_id").collect()}
    b = {r.doc_id for r in
         weighted_sample(_docs(spark), 4, "w", "doc_id",
                         seed="other").collect()}
    assert a == set(_brute_top(4)) and b == set(_brute_top(4, "other"))
    assert a != b  # these seeds happen to disagree — pinned


def test_weighted_sample_validation(spark):
    with pytest.raises(ValueError, match="positive"):
        weighted_sample(_docs(spark), 0, "w", "doc_id")
    df = _docs(spark)
    bad = df.withColumn("_wkey", df.w)
    with pytest.raises(ValueError, match="collide"):
        weighted_sample(bad, 3, "w", "doc_id")


def _brute_pack(rows, budget, seed="", key=None):
    order = sorted(rows, key=lambda t: (_h60(t[0], seed), t[0]))
    out, before = {}, 0
    for i, size in order:
        out[i] = (before // budget, before % budget)
        before += size
    return out


def test_pack_sequences_matches_brute_force(spark):
    rows = [(i, s) for i, s in
            [(1, 700), (2, 300), (3, 1200), (4, 50), (5, 1),
             (6, 999), (7, 2048), (8, 10), (9, 512), (10, 4096)]]
    df = spark.createDataFrame(rows, "doc_id INT, n_tok INT")
    got = {r.doc_id: (r.bin_id, r.bin_offset) for r in
           pack_sequences(df, 1024, "n_tok", "doc_id").collect()}
    assert got == _brute_pack(rows, 1024)
    # a row larger than the budget still gets ONE (bin, offset) —
    # concat-then-chunk lets it straddle into following bins
    assert max(b for b, _ in got.values()) >= 2


def test_pack_sequences_by_groups_independently(spark):
    rows = [(1, 600, "a"), (2, 600, "a"), (3, 600, "b"), (4, 600, "b")]
    df = spark.createDataFrame(rows, "doc_id INT, n_tok INT, src STRING")
    got = {r.doc_id: (r.bin_id, r.bin_offset) for r in
           pack_sequences(df, 1000, "n_tok", "doc_id",
                          by="src").collect()}
    for grp in ("a", "b"):
        ids = [i for i, _, g in rows if g == grp]
        exp = _brute_pack([(i, 600) for i in ids], 1000)
        for i in ids:
            assert got[i] == exp[i]


def test_pack_sequences_validation(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id INT, n_tok INT")
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(df, 0, "n_tok", "doc_id")
    bad = df.withColumnRenamed("n_tok", "bin_id")
    with pytest.raises(ValueError, match="collide"):
        pack_sequences(bad.withColumn("n_tok", bad.bin_id),
                       128, "n_tok", "doc_id")


# ---------------------------------------------------------------- MAD


def _brute_mad(vals, k):
    import statistics
    present = [v for v in vals if v is not None]
    med = float(statistics.median(present))
    mad = float(statistics.median([abs(v - med) for v in present]))
    return med, mad, [None if v is None else abs(v - med) > k * mad
                      for v in vals]


def test_mad_outliers_matches_brute_force(spark):
    from esri_dump_spark.operators.sample import mad_outliers
    rows = [("a", 1, 10), ("a", 2, 12), ("a", 3, 11), ("a", 4, 500),
            ("a", 5, 13), ("b", 6, 7), ("b", 7, 7), ("b", 8, 7),
            ("b", 9, 900), ("a", 10, None)]
    df = spark.createDataFrame(rows, "g STRING, id INT, v INT")
    out = {r.id: (r.med, r.mad, r.is_outlier)
           for r in mad_outliers(df, "v", by="g", k=4).collect()}
    for g in ("a", "b"):
        grp = [(i, v) for gg, i, v in rows if gg == g]
        med, mad, flags = _brute_mad([v for _, v in grp], 4)
        for (i, _), fl in zip(grp, flags):
            assert out[i] == (med, mad, fl), f"id={i}"
    assert out[4][2] is True and out[9][2] is True
    assert out[10][2] is None  # NULL value -> NULL flag


def test_mad_outliers_global_and_boundary(spark):
    from esri_dump_spark.operators.sample import mad_outliers
    # med=4, devs {3,1,0,1,3} -> mad=1; k=3 puts 1 and 7 EXACTLY on
    # the cut (dev == k*mad) — boundary hits are never outliers
    df = spark.createDataFrame([(i, v) for i, v in
                                enumerate([1, 3, 4, 5, 7])],
                               "id INT, v INT")
    got = mad_outliers(df, "v", k=3).collect()
    assert all(r.is_outlier is False for r in got)
    assert all(r.med == 4.0 and r.mad == 1.0 for r in got)


def test_mad_outliers_validation(spark):
    from esri_dump_spark.operators.sample import mad_outliers
    df = spark.createDataFrame([(1, 1.5)], "id INT, v DOUBLE")
    with pytest.raises(ValueError, match="integral"):
        mad_outliers(df, "v")
    idf = spark.createDataFrame([(1, 2)], "id INT, v INT")
    with pytest.raises(ValueError, match="0.25"):
        mad_outliers(idf, "v", k=0.3)
    with pytest.raises(ValueError, match="0.25"):
        mad_outliers(idf, "v", k=0)
    with pytest.raises(ValueError, match="collide"):
        mad_outliers(idf.withColumnRenamed("id", "mad"), "v")


# -------------------------------------------------- temperature mix


def _tm_docs(spark, counts):
    rows = [(f"{s}_{i}", s) for s, n in counts.items()
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id STRING, source STRING")


def test_temperature_mix_alpha_one_is_passthrough(spark):
    from esri_dump_spark.operators.sample import temperature_mix
    df = _tm_docs(spark, {"w": 40, "b": 9, "c": 3})
    assert temperature_mix(df, "source", "doc_id", alpha=1).count() == 52


def test_temperature_mix_alpha_zero_levels_to_min(spark):
    from esri_dump_spark.operators.sample import temperature_mix
    df = _tm_docs(spark, {"w": 40, "b": 9, "c": 3})
    out = temperature_mix(df, "source", "doc_id", alpha=0)
    cnt = {r.source: r.n for r in
           out.groupBy("source").count().withColumnRenamed(
               "count", "n").collect()}
    assert cnt == {"w": 3, "b": 3, "c": 3}


def test_temperature_mix_sqrt_quotas_and_membership(spark):
    from esri_dump_spark.operators.sample import temperature_mix
    counts = {"w": 40, "b": 9, "c": 3}
    df = _tm_docs(spark, counts)
    out = temperature_mix(df, "source", "doc_id", alpha=0.5, seed="t")
    # w_i = floor(sqrt(n)): w->6, b->3, c->1; M = min(40//6,9//3,3//1)=3
    want_quota = {"w": 18, "b": 9, "c": 3}
    got = {}
    for r in out.collect():
        got.setdefault(r.source, []).append(r.doc_id)
    assert {s: len(v) for s, v in got.items()} == want_quota
    for s, q in want_quota.items():  # exact membership: hash-order prefix
        ids = sorted((f"{s}_{i}" for i in range(counts[s])),
                     key=lambda d: (_h60(d, "t"), d))
        assert sorted(got[s]) == sorted(ids[:q])


def test_temperature_mix_validation(spark):
    from esri_dump_spark.operators.sample import temperature_mix, \
        temp_weight_sql
    df = _tm_docs(spark, {"w": 2})
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, "source", "doc_id", alpha=0.6)
    with pytest.raises(ValueError, match="collide"):
        temperature_mix(df.withColumn("_n", df.doc_id), "source",
                        "doc_id")
    assert temp_weight_sql("n", 0) == "CAST(1 AS BIGINT)"
    assert "sqrt" not in temp_weight_sql("n", 1)


# ------------------------------------------------- training shards


def test_training_shards_roundtrip_and_layout(spark, tmp_path):
    import os
    from esri_dump_spark.operators.sample import split_assign
    from esri_dump_spark.operators.sinks import (
        read_training_shards, shard_assign, write_training_shards)
    df = spark.createDataFrame([(i, f"t{i}") for i in range(200)],
                               "doc_id INT, text STRING")
    src = split_assign(df, "doc_id", seed="s")
    out_dir = str(tmp_path / "shards")
    write_training_shards(src, out_dir, "doc_id", 4,
                          split_col="split", seed="sh")
    back = read_training_shards(spark, out_dir)
    # content roundtrip (shard column re-derivable from doc_id)
    want = {(r.doc_id, r.text, r.split, _h60(r.doc_id, "sh") % 4)
            for r in src.collect()}
    got = {(r.doc_id, r.text, r.split, int(r.shard))
           for r in back.collect()}
    assert got == want
    # one parquet file per leaf directory — no small-file explosion
    for split_dir in os.listdir(out_dir):
        if not split_dir.startswith("split="):
            continue
        for shard_dir in os.listdir(os.path.join(out_dir, split_dir)):
            leaf = os.path.join(out_dir, split_dir, shard_dir)
            files = [f for f in os.listdir(leaf)
                     if f.endswith(".parquet")]
            assert len(files) == 1, leaf
    # determinism: a second write produces identical shard membership
    out2 = str(tmp_path / "shards2")
    write_training_shards(src.repartition(7), out2, "doc_id", 4,
                          split_col="split", seed="sh")
    got2 = {(r.doc_id, r.text, r.split, int(r.shard))
            for r in read_training_shards(spark, out2).collect()}
    assert got2 == got
    # validation
    with pytest.raises(ValueError, match="num_shards"):
        shard_assign(df, "doc_id", 0)
    with pytest.raises(ValueError, match="already exists"):
        shard_assign(df.withColumn("shard", df.doc_id), "doc_id", 2)


def test_mad_outliers_null_group_key_forms_own_group(spark):
    # groupBy produces a NULL group; the null-safe stats joins must
    # classify those rows instead of silently dropping them
    from esri_dump_spark.operators.sample import mad_outliers
    rows = [("a", 1, 10), ("a", 2, 12), (None, 3, 5), (None, 4, 7),
            (None, 5, 6)]
    df = spark.createDataFrame(rows, "g STRING, id INT, v INT")
    out = {r.id: (r.g, r.med, r.is_outlier)
           for r in mad_outliers(df, "v", by="g", k=2).collect()}
    assert len(out) == 5
    assert out[4] == (None, 6.0, False)  # NULL group med over {5,6,7}


def test_mad_outliers_accepts_small_integral_types(spark):
    from esri_dump_spark.operators.sample import mad_outliers
    df = spark.createDataFrame([(1, 3), (2, 5), (3, 9)],
                               "id INT, v INT").selectExpr(
        "id", "CAST(v AS SMALLINT) AS v")
    got = mad_outliers(df, "v", k=1).collect()
    assert {r.med for r in got} == {5.0}


def test_temperature_mix_null_source_cannot_poison_quota(spark):
    # two NULL-source rows must neither appear in the output nor
    # constrain M (min over n_i div w_i) for the real sources
    from esri_dump_spark.operators.sample import temperature_mix
    df = _tm_docs(spark, {"w": 40, "b": 9}).union(
        spark.createDataFrame([("x1", None), ("x2", None)],
                              "doc_id STRING, source STRING"))
    out = temperature_mix(df, "source", "doc_id", alpha=0.5)
    cnt = {r.source: r.n for r in
           out.groupBy("source").count().withColumnRenamed(
               "count", "n").collect()}
    # w->6, b->3; M = min(40//6, 9//3) = 3 -> quotas 18 / 9
    assert cnt == {"w": 18, "b": 9}


def test_mad_and_temperature_hostile_column_names(spark):
    # dots/spaces in legal column names must resolve literally
    from esri_dump_spark.operators.sample import (mad_outliers,
                                                  temperature_mix)
    rows = [("a", 1, 10), ("a", 2, 12), ("a", 3, 500), ("b", 4, 7),
            ("b", 5, 9)]
    df = spark.createDataFrame(rows, "g STRING, id INT, v INT") \
        .selectExpr("g AS `g.k`", "id AS `the id`", "v AS `v.x`")
    mo = {r["the id"]: r.is_outlier
          for r in mad_outliers(df, "v.x", by="g.k", k=2).collect()}
    assert mo[3] is True and mo[1] is False and len(mo) == 5
    tm = temperature_mix(df, "g.k", "the id", alpha=0.5)
    # w: a->1 (floor sqrt 3), b->1; M = min(3//1, 2//1) = 2
    cnt = {r["g.k"]: r.n for r in
           tm.groupBy("`g.k`").count().withColumnRenamed(
               "count", "n").collect()}
    assert cnt == {"a": 2, "b": 2}
