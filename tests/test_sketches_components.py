"""Connected components (min-label propagation) and the deterministic HLL
sketch — unit-level behavior; cross-engine equivalence is pinned by the
driver oracles (dedup_cluster_canonical, sketch_hll_users)."""

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.operators.dedup import connected_components, neardup_clusters
from dataingestion_spark.operators.sketches import hll_distinct


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_components_chain_and_star(spark):
    # chain 1-2-3-4, star 10-(11,12), isolated pair 20-21
    comp = connected_components(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21)])
    )
    got = {r.node: r.component for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_direction_independent(spark):
    # min reachable only via an edge pointing *into* the min
    comp = connected_components(_edges(spark, [(5, 1), (5, 9)]))
    got = {r.node: r.component for r in comp.collect()}
    assert got == {1: 1, 5: 1, 9: 1}


def test_components_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]), max_iter=1
        )


def test_neardup_clusters_transitive(spark):
    # A≈B and B≈C but A,C may not pair directly — cluster must still unite them
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " tail"),
            (3, base),
            (50, "completely different text about spark queries and parquet files"),
        ],
        "doc_id long, text string",
    )
    clusters = neardup_clusters(docs)
    got = {r.doc_id: r.canonical_id for r in clusters.collect()}
    assert got[1] == 1 and got[2] == 1 and got[3] == 1
    assert 50 not in got  # no candidates → not in the cluster map
    kept = docs.join(
        clusters.filter(F.col("doc_id") != F.col("canonical_id")),
        "doc_id",
        "left_anti",
    )
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [1, 50]


def test_hll_accuracy(spark):
    n = 3000
    df = spark.range(n).select(F.col("id").alias("v"))
    est = hll_distinct(df, "v").first().hll_estimate
    assert abs(est - n) / n < 0.15  # p=8 → ~6.5% expected std error


def test_hll_small_range_correction(spark):
    n = 40  # far below m=256 → raw HLL overcounts, linear counting kicks in
    df = spark.range(n).select(F.col("id").alias("v"))
    row = hll_distinct(df, "v", corrected=True).first()
    assert abs(row.hll_estimate_corrected - n) <= abs(row.hll_estimate - n) + 1e-9
    assert abs(row.hll_estimate_corrected - n) / n < 0.15


def test_hll_grouped_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(500)] + [("b", i) for i in range(100)] + [("b", None)],
        "g string, v long",
    )
    rows = {r.g: r for r in hll_distinct(df, "v", ["g"]).collect()}
    assert abs(rows["a"].hll_estimate - 500) / 500 < 0.2
    assert rows["b"].hll_nonempty_buckets <= 100  # null ignored


def test_histogram_quantiles_accuracy(spark):
    from dataingestion_spark.operators.sketches import histogram_quantiles

    df = spark.range(10000).select((F.col("id") % 1000).cast("double").alias("v"))
    rows = {r.q: r.estimate
            for r in histogram_quantiles(df, "v", lo=0.0, hi=1000.0,
                                         nbins=100).collect()}
    # uniform 0..999 → true quantiles ≈ 1000q; bin width 10 bounds the error
    for q in (0.5, 0.95, 0.99):
        assert abs(rows[q] - 1000 * q) <= 10.0, (q, rows[q])


def test_histogram_quantiles_clamps_and_validates(spark):
    import pytest as _pytest

    from dataingestion_spark.operators.sketches import histogram_quantiles

    df = spark.createDataFrame([(-50.0,), (5.0,), (500.0,), (None,)], "v double")
    rows = histogram_quantiles(df, "v", lo=0.0, hi=10.0, nbins=10, qs=(1.0,)).collect()
    # out-of-range values clamp into edge bins, nulls ignored; q=1.0 hits the top bin
    assert len(rows) == 1 and rows[0].estimate <= 10.0
    with _pytest.raises(ValueError):
        histogram_quantiles(df, "v", lo=5.0, hi=5.0)


def test_cm_sketch_exact_when_no_collisions(spark):
    from dataingestion_spark.operators.sketches import cm_sketch, cm_estimate

    rows = [(v,) for v in ["a"] * 7 + ["b"] * 3 + ["c"] * 1]
    df = spark.createDataFrame(rows, "v string")
    sk = cm_sketch(df, "v")
    items = spark.createDataFrame([("a",), ("b",), ("c",), ("absent",)], "v string")
    est = {r.v: r.cm_estimate for r in cm_estimate(sk, items, "v").collect()}
    # 3 tiny keys in a 4x4096 sketch: no collisions, estimates are exact;
    # an absent key estimates 0 (all its counters empty)
    assert est == {"a": 7, "b": 3, "c": 1, "absent": 0}
    # the sketch never exceeds depth x width cells
    assert sk.count() <= 4 * 4096


def test_cm_estimate_upper_bounds_truth(spark):
    from dataingestion_spark.operators.sketches import cm_sketch, cm_estimate

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select("user_id")
    sk = cm_sketch(ev, "user_id")
    est = cm_estimate(sk, ev.distinct(), "user_id")
    exact = ev.groupBy("user_id").count()
    bad = est.join(exact, "user_id").filter(F.col("cm_estimate") < F.col("count"))
    assert bad.count() == 0  # CM never underestimates


def test_bloom_no_false_negatives(spark):
    from dataingestion_spark.operators.sketches import bloom_build, bloom_might_contain

    members = spark.createDataFrame([(i,) for i in range(100)], "k long")
    probes = spark.createDataFrame([(i,) for i in range(200)], "k long")
    bloom = bloom_build(members, "k")
    got = {r.k: r.bloom_maybe for r in bloom_might_contain(bloom, probes, "k").collect()}
    # every member answers yes (no false negatives, the bloom contract)
    assert all(got[i] for i in range(100))
    # 100 keys * 4 hashes in 65536 bits: non-members overwhelmingly answer no
    fp = sum(1 for i in range(100, 200) if got[i])
    assert fp <= 2


def test_hll_merge_equals_direct(spark):
    from dataingestion_spark.operators.sketches import (
        hll_distinct, hll_merge, hll_registers,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    direct = hll_distinct(e, "user_id").first()
    merged = hll_merge(hll_registers(e, "user_id", ["event_type"])).first()
    assert merged.hll_estimate == direct.hll_estimate  # bit-exact
    assert merged.hll_nonempty_buckets == direct.hll_nonempty_buckets
    # partial merge down to a retained group equals direct per-group
    per_type = {r.event_type: r.hll_estimate
                for r in hll_distinct(e, "user_id", ["event_type"]).collect()}
    via_regs = {
        r.event_type: r.hll_estimate
        for r in hll_merge(hll_registers(e, "user_id", ["event_type"]),
                           ["event_type"]).collect()
    }
    assert per_type == via_regs


def test_ndcg_and_mrr(spark):
    """Hand-computable fixture: 1 query, results ranked [d1,d2,d3],
    judgments d1:rel2 (rank 1), d3:rel1 (rank 3), d9:rel3 (missed)."""
    import math

    from dataingestion_spark.operators.similarity import mrr_at_k, ndcg_at_k

    results = spark.createDataFrame(
        [("q1", 1, "d1"), ("q1", 2, "d2"), ("q1", 3, "d3")],
        ["query_id", "rank", "vec_id"])
    rel = spark.createDataFrame(
        [("q1", "d1", 2.0), ("q1", "d3", 1.0), ("q1", "d9", 3.0),
         ("q2", "d1", 1.0)],  # q2 judged but never retrieved
        ["query_id", "vec_id", "rel"])
    nd = {r.query_id: r for r in ndcg_at_k(results, rel, 10).collect()}
    dcg = (2 ** 2 - 1) / math.log2(2) + (2 ** 1 - 1) / math.log2(4)
    idcg = ((2 ** 3 - 1) / math.log2(2) + (2 ** 2 - 1) / math.log2(3)
            + (2 ** 1 - 1) / math.log2(4))
    assert abs(nd["q1"].dcg - round(dcg, 6)) < 1e-9
    assert abs(nd["q1"].idcg - round(idcg, 6)) < 1e-9
    assert abs(nd["q1"].ndcg - round(dcg / idcg, 6)) < 1e-9
    assert nd["q2"].ndcg == 0.0 and nd["q2"].dcg == 0.0  # judged, no hits
    rr = {r.query_id: r for r in mrr_at_k(results, rel, 10).collect()}
    assert rr["q1"].first_rank == 1 and rr["q1"].rr == 1.0
    assert rr["q2"].first_rank is None and rr["q2"].rr == 0.0
