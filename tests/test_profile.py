"""profile_columns (dataset-card rollup) against hand-computed
ground truth, including NULL handling, all-NULL columns, numeric
(not lexicographic) min/max, and type validation."""

from __future__ import annotations

import pytest

from esri_dump_spark.operators.profile import profile_columns


def _df(spark):
    rows = [
        (1, "en", 9),
        (2, "en", 10),
        (3, None, 100),
        (4, "de", None),
        (5, "de", 2),
    ]
    return spark.createDataFrame(rows, "id INT, lang STRING, v INT")


def test_profile_matches_ground_truth(spark):
    out = {r.col_name: r for r in
           profile_columns(_df(spark), ["id", "lang", "v"]).collect()}
    assert len(out) == 3
    assert (out["id"].n_rows, out["id"].n_null, out["id"].n_distinct,
            out["id"].min_s, out["id"].max_s) == (5, 0, 5, "1", "5")
    assert (out["lang"].n_null, out["lang"].n_distinct,
            out["lang"].min_s, out["lang"].max_s) == (1, 2, "de", "en")
    # numeric min/max: 2 < 9 < 10 < 100 (lexicographic would say
    # '10' < '2' and '9' > '100')
    assert (out["v"].n_null, out["v"].n_distinct,
            out["v"].min_s, out["v"].max_s) == (1, 4, "2", "100")


def test_profile_all_null_column(spark):
    df = _df(spark).selectExpr("id", "CAST(NULL AS STRING) AS empty")
    row = {r.col_name: r for r in
           profile_columns(df, ["empty"]).collect()}["empty"]
    assert (row.n_rows, row.n_null, row.n_distinct,
            row.min_s, row.max_s) == (5, 5, 0, None, None)


def test_profile_layout_invariant(spark):
    a = sorted(map(tuple, profile_columns(
        _df(spark), ["id", "v"]).collect()))
    b = sorted(map(tuple, profile_columns(
        _df(spark).repartition(13), ["id", "v"]).collect()))
    assert a == b


def test_profile_validation(spark):
    df = _df(spark).selectExpr("*", "v * 0.5 AS f")
    with pytest.raises(ValueError, match="integral or string"):
        profile_columns(df, ["f"])
    with pytest.raises(ValueError, match="non-empty"):
        profile_columns(df, [])
    with pytest.raises(ValueError, match="distinct"):
        profile_columns(df, ["id", "id"])


def test_profile_hostile_column_names(spark):
    # spaces, dots and quotes are legal column names — they must be
    # resolved as data (df[c]), never parsed as SQL identifiers
    df = _df(spark).selectExpr(
        "id AS `a b`", "lang AS `o'brien`", "v AS `x.y`")
    out = {r.col_name: r for r in
           profile_columns(df, ["a b", "o'brien", "x.y"]).collect()}
    assert set(out) == {"a b", "o'brien", "x.y"}
    assert (out["a b"].min_s, out["a b"].max_s) == ("1", "5")
    assert out["x.y"].n_distinct == 4


# ------------------------------------------------- normalize_text
# (lives here with the other stage-boundary hygiene ops)


def test_normalize_text_stages_and_counts(spark):
    from esri_dump_spark.operators.text import normalize_text
    raw = "\x01 hi\r\nthere\tnow  ok\n\n\n\nend  "
    df = spark.createDataFrame([(1, raw), (2, None), (3, "clean")],
                               "id INT, text STRING")
    out = {r.id: r for r in normalize_text(df).collect()}
    r = out[1]
    # \x01 stripped, CRLF->LF, tab->space, double-space collapsed,
    # 4 newlines -> 2, leading space (from \x01 strip order: ctrl
    # runs FIRST so '\x01 ' leaves a leading space) + trailing trimmed
    assert r.text_norm == "hi\nthere now ok\n\nend"
    # n_spaces = 2 runs: 'now  ok' and the trailing '  '
    assert (r.n_ctrl, r.n_cr, r.n_tab, r.n_spaces, r.n_newlines,
            r.n_edge) == (1, 1, 1, 2, 1, 2)
    # NULL propagates; clean text is a fixpoint with all-zero counts
    assert out[2].text_norm is None and out[2].n_ctrl is None
    c = out[3]
    assert c.text_norm == "clean"
    assert (c.n_ctrl, c.n_cr, c.n_tab, c.n_spaces, c.n_newlines,
            c.n_edge) == (0, 0, 0, 0, 0, 0)


def test_normalize_text_idempotent(spark):
    from esri_dump_spark.operators.text import normalize_text
    raw = " a\rb\x7f\t\tc   d\n\n\n\n\ne "
    df = spark.createDataFrame([(1, raw)], "id INT, text STRING")
    once = normalize_text(df).select("id", "text_norm")
    twice = normalize_text(once, "text_norm", out="text_norm2")
    row = twice.collect()[0]
    assert row.text_norm2 == row.text_norm
    assert row.text_norm == "a\nb c d\n\ne"


def test_normalize_text_all_whitespace_and_collisions(spark):
    from esri_dump_spark.operators.text import normalize_text
    import pytest as _pt
    df = spark.createDataFrame([(1, " \t \r\n ")], "id INT, text STRING")
    assert normalize_text(df).collect()[0].text_norm == ""
    bad = df.selectExpr("*", "1 AS n_ctrl")
    with _pt.raises(ValueError, match="collide"):
        normalize_text(bad)


def test_normalize_text_z_anchor_cross_engine(spark):
    # Java's un-flagged $ matches BEFORE a trailing line terminator
    # (LF, CR, U+0085, U+2028, U+2029); RE2's $ is true end-of-text.
    # The edge stage uses \z so text ending whitespace+separator must
    # normalize IDENTICALLY in both engines (the separators are not in
    # the ctrl class, so they survive and block the trim on BOTH sides)
    import duckdb
    from esri_dump_spark.operators.text import (normalize_text,
                                                normalize_text_sql)
    nasty = ["a " + chr(0x2028), "b " + chr(0x85), "c " + chr(0x2029),
             "d \n", "e "]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(nasty)],
                               "id INT, text STRING")
    got = {r.id: (r.text_norm, r.n_edge)
           for r in normalize_text(df).collect()}
    nt = normalize_text_sql("text")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    list(enumerate(nasty)))
    want = {i: (tn, ne) for i, tn, ne in con.execute(
        f"SELECT id, {nt['text_norm']}, {nt['n_edge']} FROM t"
    ).fetchall()}
    assert got == want
    assert got[0] == ("a " + chr(0x2028), 0)  # separator blocks trim
    assert got[3] == ("d", 1) and got[4] == ("e", 1)


def test_normalize_text_out_collision_guard(spark):
    from esri_dump_spark.operators.text import normalize_text
    df = spark.createDataFrame([(1, "x")], "id INT, text STRING")
    with pytest.raises(ValueError, match="stage count"):
        normalize_text(df, out="n_tab")


def test_profile_backslash_column_name(spark):
    # Spark unescapes backslashes in '...' literals — the stack label
    # must survive round-trip for names containing backslashes
    df = _df(spark).withColumnRenamed("id", "a\\b")
    out = {r.col_name for r in
           profile_columns(df, ["a\\b", "v"]).collect()}
    assert out == {"a\\b", "v"}


def test_staged_regexp_rejects_metachar_replacements(spark):
    from esri_dump_spark.operators.text import (_staged_regexp,
                                                _staged_regexp_sql)
    df = spark.createDataFrame([(1, "x")], "id INT, text STRING")
    bad = [("s", "x", "$1")]
    with pytest.raises(ValueError, match="metacharacters"):
        _staged_regexp(df, bad, "text", "o")
    with pytest.raises(ValueError, match="metacharacters"):
        _staged_regexp_sql([("s", "x", "a\\b")], "text", "o")


# ------------------------------------------- rank_normalize / skew

def test_rank_normalize_matches_python(spark):
    import struct

    from esri_dump_spark.operators.profile import rank_normalize
    rows = [(1, "a", 30), (2, "a", 10), (3, "a", 30), (4, "b", 5),
            (5, "a", None), (6, "a", float("nan"))]
    df = spark.createDataFrame(
        [(i, g, float(v) if v is not None else None)
         for i, g, v in rows], "id long, g string, x double")
    got = {r["id"]: r for r in
           rank_normalize(df, "x", ("g",), ("id",)).collect()}
    # NULL and NaN rows dropped (no rank)
    assert set(got) == {1, 2, 3, 4}
    # tie at x=30 breaks by id: 1 before 3
    want = {2: (1, 3), 1: (2, 3), 3: (3, 3), 4: (1, 1)}
    for i, (rn, n) in want.items():
        r = got[i]
        assert (r["rank_n"], r["n_group"]) == (rn, n)
        assert struct.pack("<d", r["pct_rank"]) == \
            struct.pack("<d", rn / n)
    # layout invariance of the tie-break
    got13 = {r["id"]: (r["rank_n"], r["n_group"]) for r in
             rank_normalize(df.repartition(13), "x", ("g",),
                            ("id",)).collect()}
    assert got13 == {i: want[i] for i in got13}


def test_rank_normalize_validation(spark):
    from esri_dump_spark.operators.profile import rank_normalize
    df = spark.createDataFrame([(1, 2.0)], "rank_n long, x double")
    with pytest.raises(ValueError, match="collide"):
        rank_normalize(df, "x", ("rank_n",))
    # ANY pre-existing output-named column must refuse, even when it
    # is not a group/tie/value column — this operator keeps all
    # columns, so it would otherwise be silently overwritten
    df2 = spark.createDataFrame([(1, 2.0, 999)],
                                "id long, x double, n_group long")
    with pytest.raises(ValueError, match="collide"):
        rank_normalize(df2, "x", (), ("id",))


def test_rank_normalize_null_tie_matches_duckdb(spark):
    # a NULL tie value at a tied rank must order LAST in BOTH engines
    # (Spark's bare asc() would put it FIRST)
    import duckdb
    from esri_dump_spark.operators.profile import rank_normalize
    df = spark.createDataFrame([(None, 5.0), (7, 5.0), (3, 5.0)],
                               "id long, x double")
    got = [(r["id"], r["rank_n"]) for r in
           rank_normalize(df, "x", (), ("id",))
           .orderBy("rank_n").collect()]
    du = duckdb.connect().execute(
        "SELECT id, row_number() OVER (ORDER BY x ASC, id ASC) "
        "FROM (VALUES (NULL, 5.0), (7, 5.0), (3, 5.0)) v(id, x) "
        "ORDER BY 2").fetchall()
    assert got == [tuple(r) for r in du] == [(3, 1), (7, 2), (None, 3)]


def test_skew_report_matches_python_and_layout(spark):
    from esri_dump_spark.operators.skew import skew_report
    rows = ([("hot",)] * 50 + [("warm",)] * 30 + [("w2",)] * 30
            + [(f"k{i}",) for i in range(20)])
    df = spark.createDataFrame(rows, "k string")
    got = [(r["rank"], r["k"], r["cnt"], r["share_ppm"]) for r in
           skew_report(df, ("k",), 3).orderBy("rank").collect()]
    total = len(rows)
    # tie at 30 breaks by key ASC: w2 before warm
    assert got == [(1, "hot", 50, 50 * 1000000 // total),
                   (2, "w2", 30, 30 * 1000000 // total),
                   (3, "warm", 30, 30 * 1000000 // total)]
    got13 = [(r["rank"], r["k"], r["cnt"], r["share_ppm"]) for r in
             skew_report(df.repartition(13), ("k",), 3)
             .orderBy("rank").collect()]
    assert got13 == got
    with pytest.raises(ValueError, match="key_cols"):
        skew_report(df, ())
    with pytest.raises(ValueError, match="collide"):
        skew_report(df.selectExpr("k AS cnt"), ("cnt",))
    # hostile key names survive the output projection too
    hostile = df.selectExpr("k AS `we``ird`")
    got_h = skew_report(hostile, ("we`ird",), 1).collect()
    assert got_h[0]["we`ird"] == "hot"


def test_skew_report_null_keys_and_nulls_last(spark):
    from esri_dump_spark.operators.skew import skew_report
    # NULL keys count as a group; at a cnt tie the NULL key ranks
    # LAST (pinned NULLS LAST — DuckDB's default, Spark's is not)
    df = spark.createDataFrame([("a",), ("a",), (None,), (None,)],
                               "k string")
    got = [(r["rank"], r["k"], r["cnt"]) for r in
           skew_report(df, ("k",), 5).orderBy("rank").collect()]
    assert got == [(1, "a", 2), (2, None, 2)]


def test_rank_and_skew_plans_stay_jvm(spark):
    from esri_dump_spark.operators.profile import rank_normalize
    from esri_dump_spark.operators.skew import skew_report
    df = spark.range(1000).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS g",
        "CAST(id % 97 AS DOUBLE) AS x")
    for d in (rank_normalize(df, "x", ("g",), ("id",)),
              skew_report(df, ("g",), 3)):
        p = d._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in p and "ArrowEval" not in p
    # the total is a window over the counts table, NOT a second
    # aggregate branch: exactly one partial/final HashAggregate pair
    # and no join node in the skew_report plan
    p = skew_report(df, ("g",), 3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert p.count("HashAggregate") == 2
    for node in ("CartesianProduct", "BroadcastNestedLoop", "Join"):
        assert node not in p
