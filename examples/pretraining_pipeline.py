"""End-to-end pretraining data pipeline: every stage a 100 TB corpus
walks through between raw documents and training shards, composed from
the operators in this repo.

    curate (lang → quality → C4 → Gopher → exact dedup → near-dup)
      → decontaminate against a benchmark set
      → mix domains by fractional epoch weights
      → split train/valid/test (append-stable md5 draws)
      → pack the train split into fixed-length sequences
      → assign token-budget shards
      → train a BPE vocab, encode, and materialize real token-id rows

Every keep/placement decision is a deterministic function of (salt,
doc_id) — re-running on any cluster size reproduces the same corpus.

Run: python examples/pretraining_pipeline.py [sf_dir]   (default sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataingestion_spark import get_spark
from dataingestion_spark.curation import CurationConfig, curate_with_report
from dataingestion_spark.operators.dedup import contamination_check
from dataingestion_spark.operators.packing import pack_sequences
from dataingestion_spark.operators.sampling import upsample_by_epochs
from dataingestion_spark.operators.sharding import assign_shards, hash_split


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("pretraining-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. curation funnel with the Gopher heuristic filter switched on
    # (c4=True needs sentence-punctuated text; the synthetic corpus is
    # punctuation-free word salad, which C4 would — correctly — drop
    # wholesale)
    cfg = CurationConfig(gopher=True)
    kept, funnel = curate_with_report(docs, config=cfg)
    print("== funnel ==")
    for r in funnel.orderBy("stage").collect():
        print(f"  {r['stage']:<16} docs={r['docs_kept']:>7}")

    # 2. decontamination: drop docs sharing 3-gram shingles with a
    # "benchmark" (here: the 5 lowest-id docs stand in for an eval set)
    bench = docs.filter(F.col("doc_id") < 5).select("doc_id", "text")
    contaminated = contamination_check(kept, bench, shingle_n=3).select(
        "doc_id"
    ).distinct()
    clean = kept.join(contaminated, "doc_id", "left_anti")
    print(f"decontaminated: {kept.count()} -> {clean.count()} docs")

    # 3. domain mixing: upsample scarce sources, downsample the glut
    mixed = upsample_by_epochs(
        clean, "source", {"src0": 2.0, "src1": 0.5}, default_epochs=1.0
    )

    # 4. append-stable splits
    split = hash_split(mixed, weights={"train": 0.96, "valid": 0.02, "test": 0.02})
    print("== splits ==")
    for r in split.groupBy("split").count().orderBy("split").collect():
        print(f"  {r['split']:<6} {r['count']:>7}")

    # 5. pack the train split into 4096-token sequences (chars stand in
    # for tokens at demo scale), shard-parallel
    train = (split.filter(F.col("split") == "train")
             .withColumn("shard_id", F.abs(F.hash("doc_id")) % 8))
    packed = pack_sequences(train, "n_chars", 4096, "shard_id",
                            order_cols=("doc_id", "copy"))
    n_seqs = (packed.groupBy("shard_id")
              .agg((F.max("seq_in_shard") + 1).alias("n"))
              .agg(F.sum("n")).collect()[0][0])
    print(f"packed {packed.count()} doc-copies into {n_seqs} sequences")

    # 6. token-budget shards for the writer
    sharded = assign_shards(packed, "n_chars", budget=200_000,
                            order_cols=("doc_id", "copy"))
    print("== shards ==")
    for r in (sharded.groupBy("shard_id").agg(
            F.count("*").alias("docs"), F.sum("n_chars").alias("chars"))
            .orderBy("shard_id").limit(5).collect()):
        print(f"  shard {r['shard_id']:>3}  docs={r['docs']:>6} chars={r['chars']}")

    # 7. REAL tokens end-to-end: train a BPE vocab on the cleaned corpus,
    # encode every document, and materialize fixed-length training rows
    # of actual token ids (documents cross sequence boundaries)
    from dataingestion_spark.bpe import BPE
    from dataingestion_spark.operators.bpe_train import (
        bpe_encode_df, train_bpe_distributed,
    )
    from dataingestion_spark.operators.packing import pack_token_ids

    corpus = clean.select(F.col("doc_id").cast("string").alias("documentid"),
                          "text")
    ranks = train_bpe_distributed(corpus, vocab_size=400)
    enc = bpe_encode_df(corpus, ranks)
    seqs = pack_token_ids(enc, seq_len=512)
    n, toks = seqs.agg(F.count("*"), F.sum("n")).collect()[0]
    print(f"tokenized: {n} sequences x 512 real BPE ids ({toks} tokens)")
    sample = seqs.orderBy("seq_id").limit(1).collect()[0]
    preview = BPE(ranks).decode(list(sample.tokens)[:40])
    print(f"  seq 0 decodes to: {preview[:70]!r} ...")

    spark.stop()


if __name__ == "__main__":
    main()
