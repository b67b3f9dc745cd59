"""Curation demo: the training-data funnel over the synthetic documents
table — language filter → quality filter → exact dedup → near-dup cluster
dedup — plus the sketch operators for corpus statistics.

Run: python examples/curation_demo.py [sf_dir]   (default sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataingestion_spark import (
    get_spark,
    histogram_quantiles,
    hll_distinct,
)
from dataingestion_spark.curation import curate_with_report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-demo")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # one shared stage set: the funnel counts and the kept corpus run the
    # annotate/dedup/cluster work once, not twice
    kept, funnel = curate_with_report(docs)

    print("== funnel ==")
    for r in funnel.orderBy("stage").collect():
        print(f"  {r.stage:16s} docs={r.docs_kept:6d} words={r.words_kept}")
    print("\n== kept corpus stats ==")
    n_docs = hll_distinct(kept, "doc_id").first()
    print(f"  approx distinct docs (HLL): {n_docs.hll_estimate:.1f}")
    for r in histogram_quantiles(kept, "n_words", lo=0.0, hi=200.0,
                                 nbins=100, qs=(0.5, 0.9, 0.99)).collect():
        print(f"  words/doc p{int(r.q * 100)}: ~{r.estimate:.1f}")

    spark.stop()


if __name__ == "__main__":
    main()
