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
