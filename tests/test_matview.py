"""Incrementally-maintained aggregate views (sinks/matview.py)."""

import os

from pyspark.sql import functions as F

from dataingestion_spark.sinks import manifest_store as ms
from dataingestion_spark.sinks import matview as mv

SPEC = (["src"], [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")])


def rows_df(spark, rows):
    return spark.createDataFrame(
        rows, "documentid string, src string, v long"
    )


def expected(spark, base):
    return {
        tuple(r)
        for r in ms.read_table(spark, base)
        .groupBy("src")
        .agg(F.count("*").alias("n_rows"), F.sum("v").alias("sum_v"),
             F.min("v").alias("min_v"), F.max("v").alias("max_v"))
        .collect()
    }


def view_rows(spark, view):
    return {tuple(r) for r in mv.read_view(spark, view).select(
        "src", "n_rows", "sum_v", "min_v", "max_v").collect()}


def test_refresh_full_then_incremental_then_noop(spark, tmp_path):
    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    ms.write_table(rows_df(spark, [("a", "x", 1), ("b", "x", 5), ("c", "y", 2)]), base)
    assert mv.refresh(spark, base, view, *SPEC) == "full"
    assert view_rows(spark, view) == expected(spark, base)

    ms.append_table(rows_df(spark, [("d", "x", 7), ("e", "z", 3)]), base)
    assert mv.refresh(spark, base, view, *SPEC) == "incremental"
    assert view_rows(spark, view) == expected(spark, base)

    assert mv.refresh(spark, base, view, *SPEC) == "noop"


def test_incremental_reads_only_appended_files(spark, tmp_path, monkeypatch):
    base, view = str(tmp_path / "b2"), str(tmp_path / "v2")
    ms.write_table(rows_df(spark, [(f"d{i}", "x", i) for i in range(20)]), base)
    mv.refresh(spark, base, view, *SPEC)

    seen = {}
    orig = ms._read_files

    def spy(spark_, table, manifest, bucket_subset=None, file_subset=None):
        seen["file_subset"] = file_subset
        return orig(spark_, table, manifest, bucket_subset, file_subset)

    monkeypatch.setattr(ms, "_read_files", spy)
    ms.append_table(rows_df(spark, [("new1", "x", 100)]), base)
    assert mv.refresh(spark, base, view, *SPEC) == "incremental"
    m = ms.read_manifest(base)
    all_files = {n for fs in m["buckets"].values() for n in fs}
    assert seen["file_subset"] is not None
    assert len(seen["file_subset"]) < len(all_files)  # delta only
    assert view_rows(spark, view) == expected(spark, base)


def test_delete_forces_full_recompute_then_appends_incremental_again(spark, tmp_path):
    base, view = str(tmp_path / "b3"), str(tmp_path / "v3")
    ms.write_table(rows_df(spark, [("a", "x", 1), ("b", "x", 5), ("c", "y", 2)]), base)
    mv.refresh(spark, base, view, *SPEC)
    ms.delete_documents(spark, base, ["b"])  # adds a deletion vector
    assert mv.refresh(spark, base, view, *SPEC) == "full"
    assert view_rows(spark, view) == expected(spark, base)
    # appends after the DV: old vectors can't touch new files → delta rule holds
    ms.append_table(rows_df(spark, [("f", "y", 9)]), base)
    assert mv.refresh(spark, base, view, *SPEC) == "incremental"
    assert view_rows(spark, view) == expected(spark, base)


def test_compaction_forces_full(spark, tmp_path):
    base, view = str(tmp_path / "b4"), str(tmp_path / "v4")
    # doc4 / doc39 / doc117 hash to the same bucket → 3 files to compact
    ms.write_table(rows_df(spark, [("doc4", "x", 1)]), base)
    ms.append_table(rows_df(spark, [("doc39", "x", 5)]), base)
    ms.append_table(rows_df(spark, [("doc117", "y", 2)]), base)
    mv.refresh(spark, base, view, *SPEC)
    v = ms.compact(spark, base, max_files_per_bucket=1)  # rewrites files
    assert v == ms.read_manifest(base)["version"]
    assert mv.refresh(spark, base, view, *SPEC) == "full"
    assert view_rows(spark, view) == expected(spark, base)


def test_spec_change_forces_full(spark, tmp_path):
    base, view = str(tmp_path / "b5"), str(tmp_path / "v5")
    ms.write_table(rows_df(spark, [("a", "x", 1)]), base)
    mv.refresh(spark, base, view, *SPEC)
    assert mv.refresh(spark, base, view, ["src"], [("v", "count")]) == "full"
    got = mv.read_view(spark, view)
    assert got.columns == ["src", "n_rows"]
    assert os.path.exists(os.path.join(str(tmp_path / "v5"), "_VIEW_META"))


def test_crash_between_data_and_meta_never_double_counts(spark, tmp_path):
    """A refresh that dies after publishing the new data file but BEFORE
    the meta swap must not leave a state where the next refresh folds the
    appended files in a second time (the pre-generation-naming bug: data
    swapped onto a fixed name first, stale meta then claimed the old file
    set, and the incremental branch double-counted)."""
    base, view = str(tmp_path / "b6"), str(tmp_path / "v6")
    ms.write_table(rows_df(spark, [("a", "x", 1), ("b", "x", 5)]), base)
    mv.refresh(spark, base, view, *SPEC)
    ms.append_table(rows_df(spark, [("c", "x", 100)]), base)

    # simulate the crash: run the refresh but abort _write_view right
    # after the data-file publish, before the meta swap
    import pytest

    real_replace = os.replace
    def dying_replace(src, dst):
        real_replace(src, dst)
        if dst.endswith(".parquet"):
            raise RuntimeError("simulated crash after data publish")
    import unittest.mock as um

    with um.patch.object(mv.os, "replace", dying_replace):
        with pytest.raises(RuntimeError):
            mv.refresh(spark, base, view, *SPEC)

    # readers still see the previous consistent snapshot
    assert view_rows(spark, view) == {("x", 2, 6, 1, 5)}
    # and the retried refresh produces the exact aggregate, not 2× deltas
    assert mv.refresh(spark, base, view, *SPEC) in ("incremental", "full")
    assert view_rows(spark, view) == expected(spark, base)


def test_streaming_ingest_composes_with_incremental_view(spark, tmp_path):
    """stream_ingest_dedup appends O(batch) commits; the aggregate view
    refreshes from exactly those deltas — the streaming-lakehouse loop."""
    from pyspark.sql import functions as F

    from dataingestion_spark.streaming.pipeline import stream_ingest_dedup

    indir = tmp_path / "in"
    indir.mkdir()
    table = str(tmp_path / "tbl")
    view = str(tmp_path / "view")
    docs1 = spark.createDataFrame(
        [(1, "alpha text", "en", "s0", 10), (2, "beta text", "de", "s0", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    def land(df, name):
        # the file stream watches indir itself: stage, then move part files in
        import shutil

        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        for i, p in enumerate(sorted(stage.glob("*.parquet"))):
            shutil.move(str(p), str(indir / f"{name}-{i}.parquet"))

    land(docs1, "b1")
    stream_ingest_dedup(spark, str(indir), table).awaitTermination()
    spec = (["lang"], [("doc_id", "count")])
    assert mv.refresh(spark, table, view, *spec) == "full"

    docs2 = spark.createDataFrame(
        [(3, "gamma text", "en", "s1", 10),
         (4, "alpha text", "xx", "s1", 10)],  # duplicate content: dropped
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    land(docs2, "b2")
    stream_ingest_dedup(spark, str(indir), table).awaitTermination()
    assert mv.refresh(spark, table, view, *spec) == "incremental"
    got = {r.lang: r.n_rows for r in mv.read_view(spark, view).collect()}
    assert got == {"en": 2, "de": 1}  # the dup's 'xx' row never landed


CDF_SPEC = (["src"], [("v", "count"), ("v", "sum")])


def view_rows_cdf(spark, view):
    return {tuple(r) for r in mv.read_view(spark, view).select(
        "src", "n_rows", "sum_v").collect()}


def expected_cdf(spark, base):
    return {
        tuple(r)
        for r in ms.read_table(spark, base)
        .groupBy("src")
        .agg(F.count("v").alias("n_rows"), F.sum("v").alias("sum_v"))
        .collect()
    }


def test_cdf_refresh_stays_incremental_under_deletes_and_updates(spark, tmp_path, monkeypatch):
    base, view = str(tmp_path / "b7"), str(tmp_path / "v7")
    ms.write_table(rows_df(spark, [("a", "x", 1), ("b", "x", 5),
                                   ("c", "y", 2), ("d", "y", 7)]), base)
    mv.refresh(spark, base, view, *CDF_SPEC)

    # a DELETE is applied from the change feed, not a rescan
    ms.delete_documents(spark, base, ["b"])
    assert mv.refresh(spark, base, view, *CDF_SPEC) == "incremental_cdf"
    assert view_rows_cdf(spark, view) == expected_cdf(spark, base)

    # an UPDATE merge (delete+insert pair in the feed) too
    ms.merge_table(rows_df(spark, [("a", "x", 100)]), base)
    assert mv.refresh(spark, base, view, *CDF_SPEC) == "incremental_cdf"
    assert view_rows_cdf(spark, view) == expected_cdf(spark, base)

    # emptying a group removes its row entirely
    ms.delete_documents(spark, base, ["c", "d"])
    assert mv.refresh(spark, base, view, *CDF_SPEC) == "incremental_cdf"
    got = view_rows_cdf(spark, view)
    assert got == expected_cdf(spark, base)
    assert all(r[0] != "y" for r in got)

    # and the result still matches a from-scratch recompute exactly
    assert mv.refresh(spark, base, view, *CDF_SPEC) == "noop"


def test_cdf_ineligible_specs_still_full(spark, tmp_path):
    base, view = str(tmp_path / "b8"), str(tmp_path / "v8")
    ms.write_table(rows_df(spark, [("a", "x", 1), ("b", "y", 5)]), base)
    mv.refresh(spark, base, view, *SPEC)           # has min/max
    ms.delete_documents(spark, base, ["a"])
    assert mv.refresh(spark, base, view, *SPEC) == "full"
    assert view_rows(spark, view) == expected(spark, base)


def test_legacy_snapshot_without_rows_forces_full(spark, tmp_path):
    """A view snapshot written before _rows existed must take the FULL
    branch on its next refresh, not seed NULL _rows (regression: F.sum
    skips nulls, so groups untouched by the seeding append carried NULL
    _rows forever and the CDF branch's `_rows > 0` filter dropped them
    on the first delete)."""
    import json

    import pandas as pd

    base, view = str(tmp_path / "b9"), str(tmp_path / "v9")
    spec = (["src"], [("v", "count"), ("v", "sum")])
    ms.write_table(rows_df(spark, [("a", "x", 1), ("b", "x", 5),
                                   ("c", "y", 2)]), base)
    assert mv.refresh(spark, base, view, *spec) == "full"
    # simulate the legacy snapshot: drop _rows from the stored data file
    with open(os.path.join(view, "_VIEW_META")) as fh:
        meta = json.load(fh)
    path = os.path.join(view, meta["data_file"])
    pd.read_parquet(path).drop(columns=["_rows"]).to_parquet(path, index=False)

    ms.append_table(rows_df(spark, [("d", "z", 7)]), base)
    assert mv.refresh(spark, base, view, *spec) == "full"  # NOT incremental
    got = {tuple(r) for r in mv.read_view(spark, view)
           .select("src", "n_rows", "sum_v").collect()}
    assert got == {("x", 2, 6), ("y", 1, 2), ("z", 1, 7)}

    # the recompute restored _rows, so CDF stays incremental AND keeps
    # the groups the regression used to drop
    ms.delete_documents(spark, base, ["d"])
    assert mv.refresh(spark, base, view, *spec) == "incremental_cdf"
    got = {tuple(r) for r in mv.read_view(spark, view)
           .select("src", "n_rows", "sum_v").collect()}
    assert got == {("x", 2, 6), ("y", 1, 2)}
