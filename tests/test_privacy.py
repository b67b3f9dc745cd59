"""k-anonymity / l-diversity release gate (operators/privacy.py)."""

import pytest

from pyspark.sql import Row

from dataingestion_spark.operators.privacy import (
    anonymity_groups,
    k_anonymity_report,
)

ROWS = [
    # (zip, age_band, diagnosis)
    ("94110", "30s", "flu"), ("94110", "30s", "cold"), ("94110", "30s", "flu"),
    ("94110", "40s", "flu"), ("94110", "40s", "flu"),   # 2 rows, 1 sensitive
    ("10001", "20s", "ok"),                             # singleton
]


def _df(spark):
    return spark.createDataFrame(
        [Row(zip=z, age=a, dx=d) for z, a, d in ROWS])


def test_group_sizes_and_sensitive_counts(spark):
    g = {(r.zip, r.age): (r.group_size, r.n_sensitive)
         for r in anonymity_groups(_df(spark), ["zip", "age"], "dx").collect()}
    assert g[("94110", "30s")] == (3, 2)
    assert g[("94110", "40s")] == (2, 1)
    assert g[("10001", "20s")] == (1, 1)


def test_report_counts_k_and_l_violations(spark):
    r = k_anonymity_report(_df(spark), ["zip", "age"], k=3,
                           sensitive_col="dx", l=2).collect()[0]
    assert r.n_rows == 6 and r.n_groups == 3 and r.min_group_size == 1
    assert r.k_violating_groups == 2      # the 2-row and 1-row groups
    assert r.k_violating_rows == 3
    assert r.l_violating_groups == 2      # 40s (1 dx) + singleton (1 dx)
    assert r.is_k_anonymous is False


def test_k1_always_passes(spark):
    r = k_anonymity_report(_df(spark), ["zip", "age"], k=1).collect()[0]
    assert r.k_violating_groups == 0 and r.is_k_anonymous is True
    assert not hasattr(r, "l_violating_groups")


def test_null_quasi_values_form_a_group(spark):
    df = spark.createDataFrame(
        [("94110", None, "a"), ("94110", None, "b")],
        "zip string, age string, dx string")
    g = anonymity_groups(df, ["zip", "age"], "dx").collect()
    assert len(g) == 1 and g[0].group_size == 2


def test_mismatched_sensitive_args_raise(spark):
    with pytest.raises(ValueError):
        k_anonymity_report(_df(spark), ["zip"], k=2, sensitive_col="dx")
    with pytest.raises(ValueError):
        k_anonymity_report(_df(spark), ["zip"], k=2, l=2)
