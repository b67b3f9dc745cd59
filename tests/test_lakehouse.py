"""Delta backend gating: this image has no Delta jars, so the probe must
say so and every entry point must fail with the provisioning hint — and
the pure helpers must work offline."""

import pytest

from dataingestion_spark.sinks import lakehouse as lh


def test_probe_false_without_jars(spark):
    assert lh.delta_available(spark) is False


def test_entry_points_raise_clear_error(spark, tmp_path):
    df = spark.range(1).selectExpr(
        "cast(id as string) documentid", "cast(id as int) doc_bucket"
    )
    with pytest.raises(lh.DeltaUnavailable, match="delta-spark"):
        lh.write_vector_table_delta(df, str(tmp_path / "t"))
    with pytest.raises(lh.DeltaUnavailable):
        lh.read_vector_table_delta(spark, str(tmp_path / "t"))
    with pytest.raises(lh.DeltaUnavailable):
        lh.incremental_replace_delta(df, str(tmp_path / "t"))
    with pytest.raises(lh.DeltaUnavailable):
        lh.vacuum_delta(spark, str(tmp_path / "t"))


def test_replace_predicate_shape():
    p = lh.replace_predicate(["b", "a", "a"], buckets=[7, 3, 7])
    assert p == "doc_bucket IN (3, 7) AND documentid IN ('a', 'b')"
    # no bucket hint → documentid-only predicate (still correct, less pruning)
    assert lh.replace_predicate(["x"]) == "documentid IN ('x')"
    # quoting: single quotes and backslashes must not break the predicate
    assert lh.replace_predicate(["o'brien"]) == r"documentid IN ('o\'brien')"
    with pytest.raises(ValueError):
        lh.replace_predicate([])


def test_session_options_are_pure_data():
    opts = lh.delta_session_builder_options()
    assert "io.delta.sql.DeltaSparkSessionExtension" in opts.values()
