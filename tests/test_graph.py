"""Unit tests for operators/graph.py::pagerank."""

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_two_node_cycle_is_uniform(spark):
    # symmetric cycle: ranks stay at 1/N every iteration
    e = _edges(spark, [(0, 1), (1, 0)])
    out = {r.node: r.rank for r in pagerank(e, iters=4).collect()}
    assert out[0] == pytest.approx(0.5, abs=1e-15)
    assert out[1] == pytest.approx(0.5, abs=1e-15)


def test_pagerank_star_hubs_beat_plain_leaves(spark):
    # leaves point at the center; the center points back at leaf 1 only.
    # (center↔leaf1 form a 2-cycle, so their relative order oscillates by
    # iteration parity — the stable claims are hub > plain leaf and exact
    # symmetry of the untouched leaves.)
    e = _edges(spark, [(1, 0), (2, 0), (3, 0), (0, 1)])
    out = {r.node: r.rank for r in pagerank(e, iters=10).collect()}
    assert out[0] > out[2] and out[1] > out[2]
    assert out[2] == out[3]  # symmetric leaves tie exactly


def test_pagerank_one_iteration_hand_computed(spark):
    # 0→1, 0→2, 1→2: after one iteration from uniform 1/3 with d=0.85:
    # r(0) = .15/3                      (no in-edges)
    # r(1) = .15/3 + .85·(1/3)/2        (from 0, outdeg 2)
    # r(2) = .15/3 + .85·((1/3)/2 + (1/3)/1)
    e = _edges(spark, [(0, 1), (0, 2), (1, 2)])
    out = {r.node: r.rank for r in pagerank(e, iters=1).collect()}
    third = 1.0 / 3.0
    assert out[0] == pytest.approx(0.15 / 3, abs=1e-15)
    assert out[1] == pytest.approx(0.15 / 3 + 0.85 * third / 2, abs=1e-15)
    assert out[2] == pytest.approx(0.15 / 3 + 0.85 * (third / 2 + third), abs=1e-15)


def test_pagerank_dangling_mass_dropped(spark):
    # node 2 is dangling: total rank decays below 1 (documented variant)
    e = _edges(spark, [(0, 2), (1, 2)])
    total = pagerank(e, iters=5).agg(F.sum("rank")).collect()[0][0]
    assert total < 1.0


def test_triangle_count_k4_plus_pendant(spark):
    from dataingestion_spark.operators.graph import triangle_count

    # K4 on {1..4} + pendant 5, with a reversed dup and a self loop
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
         (2, 1), (3, 3)],
        "src int, dst int",
    )
    got = sorted(tuple(r) for r in triangle_count(edges).collect())
    assert got == [(1, 3), (2, 3), (3, 3), (4, 3)]  # pendant excluded


def test_personalized_pagerank_concentrates_on_seed_neighborhood(spark):
    from pyspark.sql import Row
    from dataingestion_spark.operators.graph import pagerank

    # two disconnected 2-cycles; seed only in the first
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=1),
         Row(src=10, dst=11), Row(src=11, dst=10)])
    seeds = spark.createDataFrame([Row(node=1)])
    ranks = {r.node: r.rank for r in
             pagerank(edges, iters=8, seeds=seeds).collect()}
    assert ranks[1] > 0.4 and ranks[2] > 0.3    # mass stays in the seed cycle
    assert ranks[10] == 0.0 and ranks[11] == 0.0  # unreachable from seeds
    # global pagerank spreads everywhere instead
    g = {r.node: r.rank for r in pagerank(edges, iters=8).collect()}
    assert g[10] > 0.2


def test_personalized_pagerank_empty_seeds_raises(spark):
    import pytest
    from pyspark.sql import Row
    from dataingestion_spark.operators.graph import pagerank

    edges = spark.createDataFrame([Row(src=1, dst=2)])
    seeds = spark.createDataFrame([Row(node=1)]).filter("node > 5")
    with pytest.raises(ValueError):
        pagerank(edges, seeds=seeds)


def test_pagerank_checkpointed_identical_to_uncheckpointed(spark):
    # the eager edge/nodes/e checkpoints are materialization boundaries
    # only — bit-identical ranks with them on or off, including through
    # a DERIVED edge frame (join + distinct, the q_pagerank_nations
    # shape that motivated checkpointing the edge list once)
    raw = _edges(spark, [(0, 1), (1, 2), (2, 0), (2, 1), (3, 1), (1, 3)])
    names = spark.createDataFrame([(i, f"n{i}") for i in range(4)],
                                  "id long, name string")
    derived = (raw.join(names, raw.src == names.id)
               .select("src", "dst").distinct())
    on = {r.node: r.rank for r in
          pagerank(derived, iters=4, checkpoint=True).collect()}
    off = {r.node: r.rank for r in
           pagerank(derived, iters=4, checkpoint=False).collect()}
    assert on == off
