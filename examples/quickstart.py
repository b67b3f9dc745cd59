"""Quickstart: the reference CLI sample's flow (``src/Samples/Program.cs``)
on Spark — ingest a directory of markdown, chunk by headers, enrich, store
with embeddings, then answer a question by filtered top-k search.

Run: python examples/quickstart.py [markdown_dir] [output_table]
(With no args, builds a demo corpus in a temp dir.)
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataingestion_spark import (
    ChunkerOptions,
    IngestionPipeline,
    get_spark,
    header_chunker,
    read_vector_table,
    remove_footers,
    search,
)
from dataingestion_spark.operators.enrichers import sentiment_enricher, summary_enricher
from dataingestion_spark.sinks.vector_store import write_vector_table
from dataingestion_spark.tokenizer import WordTokenizer

# A deterministic bag-of-terms embedder, so the demo's ranking is actually
# semantic. Swap in a real model (Arrow-batched pandas UDF) in production.
VOCAB = ["spark", "fast", "big", "data", "ducks", "birds", "water", "small"]


def term_embedding(col):
    words = F.split(F.lower(F.trim(col)), r"[^a-z0-9]+")

    def count(term):
        # single-param lambda (a second param would be the array index)
        eq = lambda x: x == F.lit(term)  # noqa: E731
        return F.size(F.filter(words, eq)).cast("float")

    return F.array(*[count(t) + F.lit(0.01) for t in VOCAB])

DEMO_DOCS = {
    "spark.md": "# Spark\n\nSpark is fast and great for big data.\n\n---\n\ninternal footer",
    "ducks.md": "# Ducks\n\nDucks are small birds that love water.",
}


def main():
    if len(sys.argv) >= 2:
        src = sys.argv[1]
    else:
        d = Path(tempfile.mkdtemp(prefix="quickstart_"))
        for name, body in DEMO_DOCS.items():
            (d / name).write_text(body)
        src = str(d)
    out = sys.argv[2] if len(sys.argv) >= 3 else str(Path(tempfile.mkdtemp()) / "table")

    spark = get_spark("quickstart")

    pipeline = IngestionPipeline(
        doc_processors=[remove_footers],
        chunker=lambda el: header_chunker(el, ChunkerOptions(WordTokenizer(), 500)),
        chunk_processors=[summary_enricher, sentiment_enricher],
        writer=lambda chunks: write_vector_table(
            chunks, out, embed=term_embedding, deterministic_keys=True
        ),
    )
    pipeline.run(spark, src, out)

    table = read_vector_table(spark, out)
    print(f"ingested {table.count()} chunks from {src}")

    # "ask a question": embed the query text the same way the table was
    # embedded, search top-1 (Program.cs:50-53 uses k=1)
    question = "what is fast for big data?"
    qvec = (
        spark.range(1)
        .select(term_embedding(F.lit(question)).alias("v"))
        .first()["v"]
    )
    hit = search(table, qvec, k=1).first()
    print(f"Q: {question}")
    print(f"A (top chunk, score={hit['score']:.3f}, doc={hit['documentid']}):")
    print(hit["content"])


if __name__ == "__main__":
    main()
