"""dataingestion_spark — a PySpark-native document-ingestion & analytics engine.

A from-scratch re-expression of the capabilities of
Microsoft.Extensions.DataIngestion (adamsitnik/dataingestion) on Apache Spark:

* readers normalize documents into an ``elements`` DataFrame (one row per
  document-tree node; see ``model.ELEMENTS_SCHEMA``),
* document processors are ``DataFrame -> DataFrame`` transforms,
* chunkers turn elements into a ``chunks`` DataFrame (``model.CHUNKS_SCHEMA``),
* chunk enrichers add metadata columns,
* the vector-store writer materializes a queryable parquet "vector table"
  (``key / embedding / content / context / documentid`` + metadata columns)
  with incremental replace-by-document semantics,
* the read side is filtered gets and (filtered) top-k cosine search,

plus the large-scale training-data operators a 100 TB pipeline needs:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
near-dup), approximate nearest-neighbour search, text analytics
(language id, quality scoring, token counting, fingerprinting).

Design stance: DataFrame/SQL first (Catalyst + whole-stage codegen),
``applyInPandas`` only for genuinely sequential per-document logic
(chunk packing), deterministic md5-based hashing everywhere so results are
reproducible across engines (and auditable against a DuckDB oracle).
"""

__version__ = "0.1.0"

from .operators.chunkers import (  # noqa: E402,F401
    ChunkerOptions,
    header_chunker,
    image_chunker,
    markdown_chunker,
    section_chunker,
    semantic_chunker,
    token_chunk_text,
    token_chunker,
)
from .bpe import BPETokenizer, default_bpe_tokenizer, train_bpe  # noqa: E402,F401
from .curation import (  # noqa: E402,F401
    CurationConfig,
    curate,
    curate_with_report,
    curation_funnel,
)
from .operators.dedup import (  # noqa: E402,F401
    connected_components,
    contamination_check,
    exact_dedup,
    minhash_lsh_pairs,
    neardup_clusters,
)
from .operators.removal import remove_empty_sections, remove_footers  # noqa: E402,F401
from .operators.sharding import assign_shards, hash_split  # noqa: E402,F401
from .operators.sampling import (  # noqa: E402,F401
    mixture_sample,
    stratified_sample,
    upsample_by_epochs,
)
from .operators.packing import (  # noqa: E402,F401
    concat_chunk_spans,
    pack_sequences,
)
from .operators.similarity import (  # noqa: E402,F401
    quantize_embeddings,
    topk_cosine_quantized,
)
from .operators.pq import (  # noqa: E402,F401
    pq_encode,
    pq_train,
    topk_ivf_pq,
    topk_pq_adc,
)
from .operators.text_analysis import repetition_signals  # noqa: E402,F401
from .operators.sketches import hll_distinct, histogram_quantiles  # noqa: E402,F401
from .operators.drift import (  # noqa: E402,F401
    categorical_drift,
    drift_report,
    drift_report_by,
)
from .operators.dedup_index import (  # noqa: E402,F401
    append_minhash_index,
    probe_minhash_index,
    write_minhash_index,
)
from .operators.augment import prefix_lm_split, span_corruption  # noqa: E402,F401
from .operators.privacy import (  # noqa: E402,F401
    anonymity_groups,
    k_anonymity_report,
)
from .operators.kmv import (  # noqa: E402,F401
    kmv_estimate,
    kmv_sample,
    kmv_set_estimates,
    kmv_union_sample,
)
from .operators.sft import (  # noqa: E402,F401
    render_chat,
    render_messages,
    token_loss_mask,
)
from .operators.temporal import (  # noqa: E402,F401
    asof_join,
    cohort_retention,
    funnel_steps,
    interval_join,
    resample_gapfill,
    rolling_zscore,
    transition_counts,
)
from .operators.sampling import (  # noqa: E402,F401
    uniform_sample_k,
    weighted_sample_k,
)
from .operators.sharding import cluster_aware_split, curriculum_buckets, kfold_assign  # noqa: E402,F401
from .operators.quality_checks import (  # noqa: E402,F401
    assert_constraints,
    check_constraints,
    profile_table,
)
from .operators.text_search import (  # noqa: E402,F401
    bm25_topk,
    collocations,
    phrase_search,
    rrf_fuse,
    tfidf_top_terms,
)
from .operators.text_analysis import (  # noqa: E402,F401
    compression_ratio,
    normalize_text,
    script_profile,
)
from .operators.bpe_train import train_bpe_distributed  # noqa: E402,F401
from .operators.similarity import (  # noqa: E402,F401
    hard_negatives,
    mrr_at_k,
    ndcg_at_k,
    recall_at_k,
)
from .operators.graph import pagerank, triangle_count  # noqa: E402,F401
from .operators.urls import parse_robots, robots_disallowed  # noqa: E402,F401
from .sinks.manifest_store import (  # noqa: E402,F401
    add_constraint,
    analyze_table,
    clone_table,
    delete_where,
    drop_column,
    maintain_table,
    merge_table,
    metadata_count,
    metadata_minmax,
    register_table,
    rename_column,
    optimize_zorder,
    pair_update_images,
    restore_table,
    set_bloom_columns,
    table_diff,
    table_history,
    table_stats,
    table_sql,
    update_where,
)
from .sinks.matview import refresh as refresh_view  # noqa: E402,F401
from .sinks.scd import scd2_at, scd2_current, scd2_merge  # noqa: E402,F401
from .streaming.table_source import (  # noqa: E402,F401
    stream_changes,
    stream_table,
)
from .streaming.pipeline import (  # noqa: E402,F401
    stream_history,
    stream_replicate,
    stream_scd2,
    stream_table_pipeline,
)
from .interop.delta import (  # noqa: E402,F401
    export_delta,
    mirror_delta,
    read_delta,
    vacuum_delta,
)
from .sinks.text_index import (  # noqa: E402,F401
    append_text_index,
    hybrid_search_indexed,
    search_text_index,
    write_text_index,
)
from .sinks.vector_index import (  # noqa: E402,F401
    append_ivf_index,
    build_ivf_index,
    search_ivf_index,
)
from .sources.jsonl import read_jsonl, write_jsonl  # noqa: E402,F401
from .pipeline import IngestionPipeline  # noqa: E402,F401
from .session import get_spark  # noqa: E402,F401
from .sinks.vector_store import (  # noqa: E402,F401
    filtered_get,
    get_document,
    read_vector_table,
    search,
    write_vector_table,
)
from .sources.markdown import read_markdown  # noqa: E402,F401
