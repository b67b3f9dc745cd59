"""Interleaved fan-out A/B for the residual >1.15x bench tail.

The r14 closing full-suite run showed `rake_keywords` 1.23x,
`quality_checks` 1.21x and `collocations` 1.19x vs the BEFORE mins.
rake/collocations carry the scan fan-out; quality_checks does NOT
(untouched code — it rides along as the jitter control: any apparent
ON/OFF difference it shows is the harness's noise floor, since the
toggle cannot reach its plan). Per entry: tight back-to-back
alternation (on,off,off,on,on,off,off,on, ...) so position effects
cancel within adjacent pairs; paired per-rep deltas reported.

Usage: python scripts/ab_fanout_tail.py [pairs_per_entry]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 6


def main():
    import __spark_entry__ as em
    from dataingestion_spark.session import get_spark

    spark = get_spark(
        "ab-fanout-tail", cpus=CPUS, shuffle_partitions=int(CPUS),
        driver_mem="48g",
    )
    spark.sparkContext.setLogLevel("ERROR")

    entries = {
        "rake_keywords": em.q_rake_keywords,
        "collocations": em.q_collocations,
        "quality_checks": em.q_quality_constraints,
    }

    def run(fn, arm):
        os.environ["SPARK_GRAFT_FANOUT"] = "1" if arm == "on" else "0"
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    for name, fn in entries.items():
        # warm-up both arms, untimed
        run(fn, "on"), run(fn, "off")
        on, off = [], []
        for p in range(PAIRS):
            # ABBA ordering: position bias cancels pair-by-pair
            order = ["on", "off"] if p % 2 == 0 else ["off", "on"]
            for arm in order:
                spark.sparkContext.setJobDescription(f"{name}:{arm}:p{p}")
                (on if arm == "on" else off).append(run(fn, arm))
        deltas = [a - b for a, b in zip(on, off)]
        print(f"{name}: ON  min={min(on):.3f} med={statistics.median(on):.3f} "
              f"all={[round(x, 3) for x in on]}")
        print(f"{name}: OFF min={min(off):.3f} med={statistics.median(off):.3f} "
              f"all={[round(x, 3) for x in off]}")
        print(f"{name}: paired ON-OFF deltas "
              f"med={statistics.median(deltas):+.3f} "
              f"all={[round(d, 3) for d in deltas]} "
              f"load1={os.getloadavg()[0]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
