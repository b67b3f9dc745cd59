"""fan_out: the scale-adaptive scan fan-out (r14 optimization round).

Pins the three contract points: (1) under-parallel frames are raised to
the scheduler's slot count, (2) already-parallel frames pass through
untouched (the at-scale no-op), (3) the kill switch disables the
rewrite, and (4) results of a fanned operator are identical to the
unfanned run — the property every oracle check this round relied on.
"""

import os

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.partitioning import fan_out


def test_fan_out_raises_parallelism(spark):
    slots = spark.sparkContext.defaultParallelism
    df = spark.range(1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    fanned = fan_out(df)
    assert fanned.rdd.getNumPartitions() == slots
    # row multiset unchanged
    assert sorted(r[0] for r in fanned.collect()) == list(range(1000))


def test_fan_out_noop_when_already_parallel(spark):
    slots = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(slots + 2)
    # already >= slots: the SAME object comes back — no extra shuffle node
    assert fan_out(df) is df


def test_fan_out_kill_switch(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_FANOUT", "0")
    df = spark.range(10).coalesce(1)
    assert fan_out(df) is df


def test_fanned_minhash_identical(spark, monkeypatch):
    from dataingestion_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 7} epsilon zeta eta theta")
         for i in range(60)],
        ["doc_id", "text"],
    ).coalesce(1)

    def sigs():
        out = dedup.minhash_signature(docs, num_hashes=8)
        return sorted((r["doc_id"], tuple(r["signature"])) for r in out.collect())

    monkeypatch.setenv("SPARK_GRAFT_FANOUT", "0")
    plain = sigs()
    monkeypatch.setenv("SPARK_GRAFT_FANOUT", "1")
    fanned = sigs()
    assert plain == fanned
