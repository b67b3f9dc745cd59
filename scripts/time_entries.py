"""Time a subset of bench entries with the bench harness's noop-sink
methodology (reps, min+median), without running the whole suite.

Usage: python scripts/time_entries.py entry1,entry2,... [reps]

Prints one line per entry: name, min, median, all reps, load1. Used for
focused before/after pairs (run once per code state, ABBA at the
process level) where the full suite would cost too much wall-clock and
drown the signal in this host's documented external load spikes.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ONLY = sys.argv[1].split(",") if len(sys.argv) > 1 else []
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main() -> None:
    # the entries timed here are all plain q_ functions; the table below
    # mirrors their bench.py registrations
    from pyspark.sql import functions as F  # noqa: F401

    import __spark_entry__ as em
    from dataingestion_spark.session import get_spark

    spark = get_spark("time-entries", cpus=CPUS, shuffle_partitions=int(CPUS),
                      driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    spark.sparkContext.setLogLevel("ERROR")

    table = {
        "avro_io": em.q_io_avro_roundtrip,
        "avro_snappy_io": em.q_io_avro_snappy_roundtrip,
        "avro_split_read": em.q_io_avro_split_read,
        "avro_tokens_vec": em.q_io_avro_tokens_vec,
        "avro_struct_vec": em.q_io_avro_struct_vec,
        "avro_nstruct_vec": em.q_io_avro_nullable_struct_vec,
        "avro_astruct_vec": em.q_io_avro_array_struct_vec,
        "arrow_ipc_io": em.q_arrow_ipc_roundtrip,
        "arrow_ipc_split_read": em.q_io_arrow_ipc_split,
        "bm25_hybrid": em.q_hybrid_rrf,
        "lm_perplexity": em.q_lm_perplexity,
        "boilerplate_lines": em.q_boilerplate_lines,
        "pq_adc": em.q_topk_pq,
        "pq_rerank": em.q_topk_pq_rerank,
        "quality_checks": em.q_quality_constraints,
    }
    names = ONLY or list(table)
    for name in names:
        fn = table[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for i in range(REPS):
            spark.sparkContext.setJobDescription(f"{name}:r{i}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(time.monotonic() - t0)
        print(f"{name}: min={min(ts):.3f} med={statistics.median(ts):.3f} "
              f"all={[round(t, 3) for t in ts]} "
              f"load1={os.getloadavg()[0]:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
