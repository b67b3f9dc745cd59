"""End-to-end pipeline matrix, modeled on the reference's
DocumentPipelineTests (readers × chunkers into a store, then retrieval)."""

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.operators.chunkers import (
    ChunkerOptions,
    header_chunker,
    markdown_chunker,
    section_chunker,
    semantic_chunker,
    token_chunker,
)
from dataingestion_spark.operators.enrichers import (
    classification_enricher,
    keyword_enricher,
    sentiment_enricher,
    summary_enricher,
)
from dataingestion_spark.pipeline import IngestionPipeline
from dataingestion_spark.sinks.vector_store import read_vector_table, search
from dataingestion_spark.tokenizer import WordTokenizer

DOCS = {
    "a.md": "# Alpha\n\nThe fast engine is small and great.\n\n## Part\n\nMore alpha text here.",
    "b.md": "# Beta\n\nA slow big topic entirely different.\n\n- item x\n- item y",
}

OPTS = ChunkerOptions(WordTokenizer(), 200)


def _make_semantic():
    # nested so cloudpickle serializes it by value — a module-level function
    # in a test file is pickled by reference and executors can't import it
    def embed(texts):
        import hashlib

        import numpy as np

        return np.array(
            [[int(hashlib.md5(f"{t}:{d}".encode()).hexdigest()[:2], 16) / 256.0
              for d in range(4)] for t in texts]
        )

    return lambda df: semantic_chunker(df, embed, OPTS)


CHUNKERS = {
    "header": lambda df: header_chunker(df, OPTS),
    "section": lambda df: section_chunker(df, OPTS),
    "markdown": lambda df: markdown_chunker(df),
    "token": lambda df: token_chunker(df, ChunkerOptions(WordTokenizer(), 50, 10)),
    "semantic": _make_semantic(),
}


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    for name, body in DOCS.items():
        (d / name).write_text(body)
    return str(d)


def test_pipeline_fused_path_matches_modular(spark, tmp_path, corpus_dir):
    from dataingestion_spark.operators.chunkers import header_chunk_doc

    out = str(tmp_path / "vt_fused")
    fused = IngestionPipeline(
        chunk_doc_fn=lambda rows: header_chunk_doc(rows, OPTS)
    )
    fused.run(spark, corpus_dir, out)
    modular = IngestionPipeline(chunker=CHUNKERS["header"])
    got_f = sorted(
        (r.documentid, r.content)
        for r in read_vector_table(spark, out).collect()
    )
    out2 = str(tmp_path / "vt_modular")
    modular.run(spark, corpus_dir, out2)
    got_m = sorted(
        (r.documentid, r.content)
        for r in read_vector_table(spark, out2).collect()
    )
    assert got_f == got_m


@pytest.mark.parametrize("chunker_name", sorted(CHUNKERS))
def test_pipeline_matrix(spark, tmp_path, corpus_dir, chunker_name):
    out = str(tmp_path / f"vt_{chunker_name}")
    pipe = IngestionPipeline(
        chunker=CHUNKERS[chunker_name],
        chunk_processors=[
            summary_enricher,
            sentiment_enricher,
            lambda df: classification_enricher(df, classes=["engine", "topic"]),
            keyword_enricher,
        ],
    )
    pipe.run(spark, corpus_dir, out)
    table = read_vector_table(spark, out)
    assert table.count() > 0
    # record shape: fixed columns + promoted enricher columns, all lowercase
    assert {"key", "embedding", "content", "context", "documentid",
            "summary", "sentiment", "classification", "keywords"} <= set(table.columns)
    # every document produced at least one retrievable chunk
    assert table.select("documentid").distinct().count() == len(DOCS)
    # retrieval: the alpha doc's own vector finds an alpha chunk first
    row = table.filter(F.col("documentid").endswith("a.md")).first()
    top = search(table, row["embedding"], k=1).first()
    assert top["documentid"].endswith("a.md")
    # enricher sanity on the positive-words doc
    alpha = table.filter(F.col("documentid").endswith("a.md")).collect()
    assert any(r["sentiment"] == "Positive" for r in alpha)
