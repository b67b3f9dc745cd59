"""Incremental near-dup detection: probe a NEW batch against a persisted
MinHash index without touching the corpus text.

``minhash_lsh_pairs`` (dedup.py:154) answers "which documents in THIS
frame collide" — a self-join, right for one-shot curation. A continuously
ingesting pipeline asks a different question: *does tonight's crawl
duplicate anything in the 100 TB corpus we already keep?* Recomputing
corpus signatures nightly is a full scan; the standard answer is to
persist the signatures once and probe them.

Index layout under ``path``:

* ``bands/``      — (band_key string, doc_id) parquet, **partitioned by
  band index**. A probe always carries every band, so the win is not
  partition pruning — it is that each band's equi-join is a join on ONE
  directory's files, and band files sort by ``band_key`` at write time so
  parquet min/max row-group stats prune within the band.
* ``signatures/`` — (doc_id, signature array<string>) for candidate
  verification: MinHash's estimator (fraction of agreeing components,
  Broder 1997) needs only the signatures, never the text.
* ``_MINHASH_META.json`` — num_hashes / bands / shingle_n, so probes and
  appends are structurally unable to hash with different parameters.

Scale shape: the probe computes batch signatures (one shuffle over the
batch only), then equi-joins batch band keys against the index — the
batch side is the small side, so AQE broadcasts it and the big index
scan never shuffles. Appends are O(batch): new files land in the
existing partition directories; nothing is rewritten.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import minhash_signature, signature_bands

__all__ = [
    "write_minhash_index",
    "append_minhash_index",
    "probe_minhash_index",
    "signature_bands",
]

_META = "_MINHASH_META.json"


def _write_meta(path: str, meta: dict) -> None:
    # through the commit-backend seam, not open(): the meta must live
    # wherever the parquet lives (object stores included)
    from ..sinks.commit_backend import backend_for

    backend_for(path).put_atomic(f"{path.rstrip('/')}/{_META}", json.dumps(meta))


def _read_meta(path: str) -> dict:
    from ..sinks.commit_backend import backend_for

    text = backend_for(path).read_text(f"{path.rstrip('/')}/{_META}")
    if text is None:
        raise FileNotFoundError(f"no {_META} under {path} — not a MinHash index")
    return json.loads(text)


def write_minhash_index(df: DataFrame, path: str, text_col: str = "text",
                        id_col: str = "doc_id", num_hashes: int = 16,
                        bands: int = 4, shingle_n: int = 3) -> None:
    """Build the index from scratch. One signature pass over the corpus;
    the text never leaves the scan."""
    sigs = minhash_signature(df, text_col, id_col, num_hashes, shingle_n)
    sigs = sigs.localCheckpoint(eager=False)
    # repartition on (band, id): parallelism scales with the corpus
    # instead of capping at `bands` tasks; files stay band_key-sorted
    (signature_bands(sigs, id_col, num_hashes, bands)
     .repartition("band", id_col).sortWithinPartitions("band", "band_key")
     .write.mode("overwrite").partitionBy("band")
     .parquet(os.path.join(path, "bands")))
    sigs.write.mode("overwrite").parquet(os.path.join(path, "signatures"))
    _write_meta(path, {"num_hashes": num_hashes, "bands": bands,
                       "shingle_n": shingle_n, "id_col": id_col})


def append_minhash_index(df: DataFrame, path: str,
                         text_col: str = "text") -> None:
    """O(batch) append: new band/signature files land beside the old
    ones; the corpus is never rescanned."""
    meta = _read_meta(path)
    id_col = meta["id_col"]
    sigs = minhash_signature(df, text_col, id_col,
                             meta["num_hashes"], meta["shingle_n"])
    sigs = sigs.localCheckpoint(eager=False)
    (signature_bands(sigs, id_col, meta["num_hashes"], meta["bands"])
     .repartition("band", id_col).sortWithinPartitions("band", "band_key")
     .write.mode("append").partitionBy("band")
     .parquet(os.path.join(path, "bands")))
    sigs.write.mode("append").parquet(os.path.join(path, "signatures"))


def probe_minhash_index(batch: DataFrame, path: str, text_col: str = "text",
                        batch_id_col: str = "doc_id",
                        min_est_jaccard: float = 0.0) -> DataFrame:
    """Near-dup matches of ``batch`` against the indexed corpus:
    ``(batch_id, corpus_id, n_agree, est_jaccard)``.

    Candidates = band-key collisions (any band); verification = the
    MinHash estimate ``n_agree / num_hashes`` from the two stored
    signatures — zip_with + filter + size, expression-only. A batch doc
    indexed under the same id does not match itself."""
    spark = batch.sparkSession
    meta = _read_meta(path)
    nh, nb = meta["num_hashes"], meta["bands"]
    sigs = minhash_signature(batch, text_col, batch_id_col, nh,
                             meta["shingle_n"])
    sigs = sigs.localCheckpoint(eager=False)
    probe = (signature_bands(sigs, batch_id_col, nh, nb)
             .withColumnRenamed(batch_id_col, "batch_id"))
    idx = spark.read.parquet(os.path.join(path, "bands")) \
        .withColumnRenamed(meta["id_col"], "corpus_id")
    cand = (idx.join(F.broadcast(probe), ["band", "band_key"])
            .filter(F.col("batch_id") != F.col("corpus_id"))
            .select("batch_id", "corpus_id").distinct())
    corpus_sigs = (spark.read.parquet(os.path.join(path, "signatures"))
                   .withColumnRenamed(meta["id_col"], "corpus_id")
                   .withColumnRenamed("signature", "sig_c"))
    batch_sigs = (sigs.withColumnRenamed(batch_id_col, "batch_id")
                  .withColumnRenamed("signature", "sig_b"))
    agree = F.size(F.filter(
        F.zip_with("sig_b", "sig_c", lambda x, y: x == y),
        lambda eq: eq))
    # candidates (batch-sized) stay the broadcast side of BOTH joins so
    # the big stored-signature table is scanned once and never shuffled
    small = cand.join(F.broadcast(batch_sigs), "batch_id")
    out = (corpus_sigs
           .join(F.broadcast(small), "corpus_id")
           .withColumn("n_agree", agree.cast("int"))
           .withColumn("est_jaccard",
                       F.col("n_agree").cast("double") / F.lit(float(nh))))
    if min_est_jaccard > 0.0:
        out = out.filter(F.col("est_jaccard") >= min_est_jaccard)
    return out.select("batch_id", "corpus_id", "n_agree", "est_jaccard")
