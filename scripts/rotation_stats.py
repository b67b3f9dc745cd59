"""Correctness-sample rotation helper.

The driver's gate oracles the FIRST 50 entries of
`__spark_entry__.queries()`; the standing policy rotates that prefix
to the least-recently-verified entries each round (new queries enter
the head). This script computes, from the CORRECTNESS_r*.json
artifacts, everything the rotation needs:

  python scripts/rotation_stats.py            # histogram + stalest 50
  python scripts/rotation_stats.py --check    # verify the CURRENT head

--check exits non-zero if the current first-50 is not exactly
{never-sampled/new entries} + the stalest previously-verified ones —
i.e. if a rotation was forgotten or mis-ordered.
"""
import glob
import importlib.util
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_green():
    last = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for k in json.load(open(f)):
            last[k] = max(last.get(k, 0), r)
    return last


def load_queries():
    spec = importlib.util.spec_from_file_location(
        "e", os.path.join(ROOT, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return list(m.queries()), m.oracle_sql()


def main():
    last = last_green()
    keys, oracles = load_queries()
    missing_oracle = [k for k in keys if k not in oracles]
    if missing_oracle:
        print(f"ERROR: {len(missing_oracle)} queries lack oracles: "
              f"{missing_oracle[:5]}", file=sys.stderr)
        return 2

    hist = {}
    for k in keys:
        hist[last.get(k, 0)] = hist.get(last.get(k, 0), 0) + 1
    print(f"registry: {len(keys)} queries, last-green histogram "
          f"(0 = never sampled): {dict(sorted(hist.items()))}")

    ranked = sorted(keys, key=lambda k: (last.get(k, 0), k))
    if "--check" in sys.argv:
        head = set(keys[:50])
        want = set(ranked[:50])
        extra = sorted(head - want)
        if extra:
            # new/unsampled entries may legitimately displace the tail
            # of the stalest block — flag only if a STALER entry was
            # left out in favor of a FRESHER one
            worst_in = max(last.get(k, 0) for k in head)
            best_out = min(last.get(k, 0) for k in keys[50:])
            if worst_in > best_out:
                print(f"ROTATION STALE: head holds r{worst_in} entries "
                      f"while r{best_out} entries wait outside; "
                      f"e.g. in-head {sorted(k for k in head if last.get(k,0)==worst_in)[:3]}, "
                      f"waiting {sorted(k for k in keys[50:] if last.get(k,0)==best_out)[:3]}",
                      file=sys.stderr)
                return 1
        print("head-50 rotation OK (no fresher entry displaces a "
              "staler one)")
        return 0

    print("\nstalest 50 (round, key):")
    for k in ranked[:50]:
        print(f"  r{last.get(k, 0):<3} {k}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
