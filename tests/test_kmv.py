"""KMV / theta sketch set algebra (operators/kmv.py)."""

import hashlib

from pyspark.sql import Row, functions as F

from dataingestion_spark.operators.kmv import (
    kmv_estimate,
    kmv_sample,
    kmv_set_estimates,
    kmv_union_sample,
)


def _vals(spark, xs):
    return spark.createDataFrame([Row(v=x) for x in xs])


def test_unsaturated_sketch_is_exact(spark):
    df = _vals(spark, [f"item-{i}" for i in range(40)] * 3)  # 40 distinct
    est = kmv_estimate(kmv_sample(df, "v", k=64), k=64).collect()[0]
    assert est.n_sample == 40
    assert est.est == 40.0


def test_sample_is_k_smallest_md5_prefixes(spark):
    xs = [f"val{i}" for i in range(200)]
    df = _vals(spark, xs)
    got = [r.h for r in kmv_sample(df, "v", k=16).orderBy("h").collect()]
    want = sorted(hashlib.md5(x.encode()).hexdigest()[:13] for x in set(xs))[:16]
    assert got == want


def test_saturated_estimate_within_rse(spark):
    n, k = 5000, 256
    df = _vals(spark, [f"user-{i}" for i in range(n)])
    est = kmv_estimate(kmv_sample(df, "v", k=k), k=k).collect()[0]
    assert est.n_sample == k
    # RSE of KMV is ~1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est.est - n) / n < 0.25, est.est


def test_merge_equals_sketch_of_concatenation(spark):
    a = _vals(spark, [f"a{i}" for i in range(300)])
    b = _vals(spark, [f"b{i}" for i in range(300)] + [f"a{i}" for i in range(50)])
    k = 32
    merged = kmv_union_sample(kmv_sample(a, "v", k), kmv_sample(b, "v", k), k)
    direct = kmv_sample(a.unionByName(b), "v", k)
    assert [r.h for r in merged.orderBy("h").collect()] == \
           [r.h for r in direct.orderBy("h").collect()]


def test_set_estimates_track_exact_overlap(spark):
    k = 256
    a_set = {f"x{i}" for i in range(2000)}
    b_set = {f"x{i}" for i in range(1000, 3000)}  # overlap = 1000
    a = kmv_sample(_vals(spark, sorted(a_set)), "v", k)
    b = kmv_sample(_vals(spark, sorted(b_set)), "v", k)
    row = kmv_set_estimates(a, b, k).collect()[0]
    assert abs(row.est_union - 3000) / 3000 < 0.25
    assert abs(row.est_intersect - 1000) / 1000 < 0.5
    assert abs(row.est_diff_a - 1000) / 1000 < 0.5
    # internal consistency: union = intersect + diff_a + diff_b ≥ parts
    assert row.n_intersect <= row.n_union


def test_disjoint_sets_estimate_zero_intersection(spark):
    k = 64
    a = kmv_sample(_vals(spark, [f"a{i}" for i in range(500)]), "v", k)
    b = kmv_sample(_vals(spark, [f"b{i}" for i in range(500)]), "v", k)
    row = kmv_set_estimates(a, b, k).collect()[0]
    assert row.est_intersect == 0.0


def test_nulls_are_ignored(spark):
    df = spark.createDataFrame([Row(v="x"), Row(v=None), Row(v="y")])
    est = kmv_estimate(kmv_sample(df, "v", k=8), k=8).collect()[0]
    assert est.n_sample == 2 and est.est == 2.0


def test_group_estimates_match_global_for_single_group(spark):
    from dataingestion_spark.operators.kmv import kmv_estimate_by
    xs = [f"u{i}" for i in range(3000)]
    df = spark.createDataFrame([Row(g="a", v=x) for x in xs])
    row = kmv_estimate_by(df, "v", "g", k=128).collect()[0]
    glob = kmv_estimate(kmv_sample(df, "v", k=128), k=128).collect()[0]
    assert (row.n_sample, row.est) == (glob.n_sample, glob.est)


def test_group_estimates_are_independent(spark):
    from dataingestion_spark.operators.kmv import kmv_estimate_by
    rows = ([Row(g="small", v=f"s{i}") for i in range(10)]
            + [Row(g="big", v=f"b{i}") for i in range(2000)])
    df = spark.createDataFrame(rows)
    got = {r.g: r for r in kmv_estimate_by(df, "v", "g", k=64).collect()}
    assert got["small"].est == 10.0           # unsaturated → exact
    assert abs(got["big"].est - 2000) / 2000 < 0.5
