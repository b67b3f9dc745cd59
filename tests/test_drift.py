"""Snapshot drift detection (operators/drift.py)."""

import math

from pyspark.sql import Row

from dataingestion_spark.operators.drift import (
    categorical_drift,
    drift_report,
    histogram_counts,
)

EDGES = [0.0, 10.0, 20.0, 30.0]


def _vals(spark, xs):
    return spark.createDataFrame([Row(v=x) for x in xs], "v double")


def test_bins_cover_under_over_and_null(spark):
    df = _vals(spark, [-5.0, 0.0, 9.9, 10.0, 25.0, 35.0, None])
    got = {r.bin: r.n for r in histogram_counts(df, "v", EDGES).collect()}
    # -5→0(under), 0/9.9→1, 10→2, 25→3, 35→4(over), None→-1
    assert got == {-1: 1, 0: 1, 1: 2, 2: 1, 3: 1, 4: 1}


def test_identical_snapshots_have_zero_drift(spark):
    xs = [float(i % 37) for i in range(500)]
    rep = drift_report(_vals(spark, xs), _vals(spark, xs), "v", EDGES).collect()[0]
    assert rep.tvd == 0.0 and rep.chi2 == 0.0 and rep.max_bin_gap == 0.0
    assert abs(rep.psi) < 1e-12


def test_disjoint_snapshots_have_tvd_one(spark):
    a = _vals(spark, [5.0] * 100)    # all bin 1
    b = _vals(spark, [25.0] * 100)   # all bin 3
    rep = drift_report(a, b, "v", EDGES).collect()[0]
    assert rep.tvd == 1.0
    assert rep.chi2 == 2.0  # 1 + 1
    assert rep.psi > 1.0


def test_tvd_matches_hand_computation(spark):
    a = _vals(spark, [5.0] * 60 + [15.0] * 40)
    b = _vals(spark, [5.0] * 30 + [15.0] * 70)
    rep = drift_report(a, b, "v", EDGES).collect()[0]
    assert math.isclose(rep.tvd, 0.3, abs_tol=1e-12)
    assert rep.n_bins_hit == 2


def test_null_rate_shift_is_drift(spark):
    a = _vals(spark, [5.0] * 90 + [None] * 10)
    b = _vals(spark, [5.0] * 50 + [None] * 50)
    rep = drift_report(a, b, "v", EDGES).collect()[0]
    assert math.isclose(rep.tvd, 0.4, abs_tol=1e-12)


def test_categorical_drift_proportions_and_tvd(spark):
    a = spark.createDataFrame([Row(c=x) for x in ["en"] * 8 + ["de"] * 2])
    b = spark.createDataFrame([Row(c=x) for x in ["en"] * 5 + ["fr"] * 5])
    rows = {r.cat: r for r in categorical_drift(a, b, "c").collect()}
    assert set(rows) == {"en", "de", "fr"}
    assert math.isclose(rows["en"].gap, 0.3, abs_tol=1e-12)
    assert rows["de"].n_b == 0 and rows["fr"].n_a == 0
    # TVD = (0.3 + 0.2 + 0.5) / 2
    assert math.isclose(rows["en"].tvd, 0.5, abs_tol=1e-12)


def test_empty_snapshot_reads_as_total_drift_not_silence(spark):
    """A source going dark must FIRE the alert, not fold to NULL/zero."""
    a = _vals(spark, [5.0] * 100)
    b = _vals(spark, []).filter("v IS NOT NULL")  # empty frame
    rep = drift_report(a, b, "v", EDGES).collect()[0]
    assert rep.tvd == 0.5          # all of a's mass vs nothing
    assert rep.chi2 > 0.0
    assert rep.max_bin_gap == 1.0
    assert rep.n_total_a == 100 and rep.n_total_b == 0


def test_drift_by_group_isolates_groups(spark):
    from dataingestion_spark.operators.drift import drift_report_by

    rows_a = ([Row(g="stable", v=5.0)] * 50 + [Row(g="moved", v=5.0)] * 50)
    rows_b = ([Row(g="stable", v=5.0)] * 70 + [Row(g="moved", v=25.0)] * 30
              + [Row(g="gone_dark", v=5.0)] * 0)
    a = spark.createDataFrame(rows_a + [Row(g="gone_dark", v=5.0)] * 10)
    b = spark.createDataFrame(rows_b)
    out = {r.g: r for r in
           drift_report_by(a, b, "v", EDGES, "g").collect()}
    assert out["stable"].tvd == 0.0
    assert out["moved"].tvd == 1.0            # bin 1 -> bin 3 entirely
    assert out["gone_dark"].tvd == 0.5        # outage, visible per group
    assert out["gone_dark"].n_total_b == 0
