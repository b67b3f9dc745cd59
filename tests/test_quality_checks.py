"""Deequ-style constraint checking (operators/quality_checks.py)."""

import pytest

from dataingestion_spark.operators import quality_checks as qc


def make_df(spark):
    return spark.createDataFrame(
        [(1, "a", 5, "x@y.com"),
         (2, "a", 50, "bad"),
         (3, None, -1, "z@w.org"),
         (3, "c", 7, None)],
        "id long, grp string, v long, email string",
    )


def test_all_rule_kinds(spark):
    df = make_df(spark)
    ref = spark.createDataFrame([("a",), ("b",)], "k string")
    report = {
        r.rule: r.violations
        for r in qc.check_constraints(df, [
            qc.not_null("grp"),
            qc.unique("id"),
            qc.in_range("v", 0, 10),
            qc.matches("email", r"^[^@]+@[^@]+$"),
            qc.in_set("grp", ["a", "b"]),
            qc.refers_to("grp", ref, "k"),
        ]).collect()
    }
    assert report == {
        "not_null(grp)": 1,
        "unique(id)": 2,          # id=3 twice -> both rows count
        "in_range(v,0,10)": 2,    # 50 and -1
        "matches(email)": 1,      # 'bad'; null email not a violation
        "in_set(grp)": 1,         # 'c'; null not a violation
        "refers_to(grp->k)": 1,   # 'c' missing from ref; null ignored
    }


def test_assert_constraints_gate(spark):
    df = make_df(spark)
    qc.assert_constraints(df, [qc.in_range("v", -10, 100)])  # passes
    with pytest.raises(AssertionError, match=r"not_null\(grp\)=1"):
        qc.assert_constraints(df, [qc.not_null("grp")])


def test_n_rows_reported(spark):
    df = make_df(spark)
    rows = qc.check_constraints(df, [qc.not_null("id")]).collect()
    assert rows[0].n_rows == 4


def test_profile_table_per_column_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", None), (3, None, 8.0), (3, "b", 2.0)],
        "id long, s string, v double",
    )
    prof = {r.column: r for r in qc.profile_table(df).collect()}
    assert prof["id"].n_rows == 4 and prof["id"].n_distinct == 3
    assert prof["s"].n_nulls == 1 and prof["s"].min_str == "a"
    assert prof["v"].n_nulls == 1 and prof["v"].mean == 4.0
    assert prof["s"].mean is None  # non-numeric
    sub = qc.profile_table(df, ["id"])
    assert [r.column for r in sub.collect()] == ["id"]
