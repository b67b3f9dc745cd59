"""Tour of the round-3 corpus-management operators: incremental near-dup
against a persisted index, snapshot drift, KMV set algebra, SFT rendering
with loss masks, the privacy release gate, and the persisted BM25 index.

Run: python examples/corpus_ops_tour.py [sf_dir]
(defaults to /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row, functions as F

from dataingestion_spark import (
    append_minhash_index,
    categorical_drift,
    drift_report,
    get_spark,
    k_anonymity_report,
    kmv_estimate,
    kmv_sample,
    kmv_set_estimates,
    probe_minhash_index,
    render_chat,
    render_messages,
    search_text_index,
    write_minhash_index,
    write_text_index,
)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("corpus-ops-tour")
docs = spark.read.parquet(f"{sf}/documents.parquet")
from dataingestion_spark.streaming.pipeline import normalize_event_ts
events = normalize_event_ts(spark.read.parquet(f"{sf}/events.parquet"))

# 1. Index the corpus once; probe tonight's "crawl" without rescanning it.
idx = tempfile.mkdtemp(prefix="tour_mh_") + "/idx"
os.makedirs(idx, exist_ok=True)
write_minhash_index(docs, idx)
crawl = (docs.orderBy("doc_id").limit(20)   # deterministic batch across re-evaluations
         .select((F.col("doc_id") + 10_000).alias("doc_id"), "text"))
matches = probe_minhash_index(crawl, idx, min_est_jaccard=0.8)
n_dup = matches.select("batch_id").distinct().count()
print(f"[dedup-index] {n_dup} of 20 crawled docs already in corpus")
append_minhash_index(crawl, idx)  # O(batch): tonight's docs join the index

# 2. Did the distribution move between the two halves of the corpus?
a, b = docs.filter(F.col("doc_id") % 2 == 0), docs.filter(F.col("doc_id") % 2 == 1)
rep = drift_report(a, b, "n_chars", [0, 200, 500, 1000, 2000, 5000]).collect()[0]
print(f"[drift] n_chars TVD={rep.tvd:.4f} chi2={rep.chi2:.4f} psi={rep.psi:.4f}")
print("[drift] lang mix gap:",
      {r.cat: round(r.gap, 4) for r in categorical_drift(a, b, "lang").collect()})

# 3. How much do the even/odd event-day user populations overlap? (No join.)
ua = kmv_sample(events.filter(F.dayofmonth("ts") % 2 == 0), "user_id", 256)
ub = kmv_sample(events.filter(F.dayofmonth("ts") % 2 == 1), "user_id", 256)
est = kmv_set_estimates(ua, ub, 256).collect()[0]
print(f"[kmv] users: union≈{est.est_union:.0f} overlap≈{est.est_intersect:.0f}")
print(f"[kmv] all-time distinct users ≈ "
      f"{kmv_estimate(kmv_sample(events, 'user_id', 256), 256).collect()[0].est:.0f}")

# 4. Render SFT conversations with loss-mask offsets.
msgs = spark.createDataFrame([
    Row(conv_id=1, pos=0, role="user", content="Summarize the corpus."),
    Row(conv_id=1, pos=1, role="assistant", content="It is synthetic."),
])
chat = render_chat(render_messages(msgs)).collect()[0]
print(f"[sft] rendered {chat.n_msgs} msgs, {chat.mask_chars} loss chars, "
      f"first span at {chat.first_mask_start}")

# 5. Privacy gate before releasing a slice.
gate = k_anonymity_report(
    docs.select("lang", "source",
                F.floor(F.col("n_chars") / 500).alias("len_band")),
    ["lang", "source", "len_band"], k=5).collect()[0]
print(f"[privacy] k=5 gate: {'PASS' if gate.is_k_anonymous else 'FAIL'} "
      f"({gate.k_violating_rows} rows in {gate.k_violating_groups} thin groups)")

# 6. Persisted BM25: build once, serve queries off the pruned postings.
tidx = tempfile.mkdtemp(prefix="tour_bm25_") + "/idx"
write_text_index(docs, tidx)
q = spark.createDataFrame([Row(query_id=1, query_text="data model the")])
for r in search_text_index(spark, tidx, q, k=3).collect():
    print(f"[bm25-index] rank {r.rank}: doc {r.doc_id} score {r.score:.3f}")

spark.stop()
