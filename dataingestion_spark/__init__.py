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
