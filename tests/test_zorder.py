"""Z-order clustering (operators/zorder.py)."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dataingestion_spark.operators.zorder import scale_to_bits, write_zordered, zvalue

SF = "/root/testdata/sf0.001"


def test_zvalue_interleave_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], ["x", "y"]
    )
    out = [
        r.z
        for r in df.select(
            zvalue([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()
    ]
    # x bits at even positions, y bits at odd: (3,5) = x:0b11, y:0b101
    # -> z = (1<<0)+(1<<2) + (1<<1)+(1<<5) = 1+4+2+32 = 39
    assert out == [0, 1, 2, 39]


def test_zvalue_locality_beats_single_sort(spark, tmp_path):
    """Each z-ordered file must cover a small fraction of BOTH dimension
    ranges; a single-column sort leaves the other dimension's per-file
    stats covering ~the full range (no skipping possible)."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id"
    )
    zpath = str(tmp_path / "z")
    back, _ = write_zordered(ev, zpath, by=["event_id", "user_id"], n_files=8)
    assert back.count() == ev.count()

    spath = str(tmp_path / "s")
    (ev.repartitionByRange(8, "event_id").sortWithinPartitions("event_id")
       .write.parquet(spath))

    def avg_cover(path, col, total_span):
        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            spans.append((hi - lo) / total_span)
        return sum(spans) / len(spans)

    lo, hi = ev.agg(F.min("user_id"), F.max("user_id")).first()
    span_u = hi - lo
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).first()
    span_e = hi - lo

    z_user = avg_cover(zpath, "user_id", span_u)
    z_event = avg_cover(zpath, "event_id", span_e)
    s_user = avg_cover(spath, "user_id", span_u)
    # z-order: BOTH dims partially tight; event-sort leaves user wide open
    assert z_user < 0.75 and z_event < 0.75
    assert s_user > 0.9
    assert z_user < s_user


def test_scale_to_bits_bounds(spark):
    df = spark.createDataFrame([(0,), (50,), (100,)], ["v"])
    out = [
        r.s
        for r in df.select(
            scale_to_bits(F.col("v"), 0, 100, bits=8).alias("s")
        ).collect()
    ]
    assert out[0] == 0 and out[2] == 255 and 0 < out[1] < 255
