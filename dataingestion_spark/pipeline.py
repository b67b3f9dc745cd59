"""IngestionPipeline: the user-facing composition façade.

The reference wires reader → document processors → chunker → chunk
processors → writer as an object graph and interprets it sequentially per
file (``IngestionPipeline.cs:47-167``). Here every stage is a
``DataFrame → DataFrame`` function, so the "pipeline" is just lazy function
composition — Catalyst sees one end-to-end plan (scan → parse → transform →
pack → enrich → write) and optimizes across stage boundaries; files
parallelize across the cluster instead of the reference's one-at-a-time
loop (``IngestionPipeline.cs:121``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame

from .operators.chunkers import ChunkerOptions, header_chunker, parse_and_chunk
from .sinks.vector_store import write_vector_table
from .sources.markdown import binary_file_scan, read_markdown


class IngestionPipeline:
    """Compose reader → doc processors → chunker → chunk processors → writer.

    ``chunk_doc_fn`` (rows → chunk dicts, e.g.
    ``lambda rows: header_chunk_doc(rows, opts)``) selects the fused
    single-Python-stage ingest (``parse_and_chunk``, ~7× the two-stage
    plan). It is mutually exclusive with ``chunker``, ``doc_processors``,
    and a custom ``reader`` — those need the modular elements path, and
    silently ignoring them would be worse than refusing."""

    def __init__(
        self,
        reader: Callable[..., DataFrame] = read_markdown,
        doc_processors: Sequence[Callable[[DataFrame], DataFrame]] = (),
        chunker: Optional[Callable[[DataFrame], DataFrame]] = None,
        chunk_processors: Sequence[Callable[[DataFrame], DataFrame]] = (),
        writer: Optional[Callable[[DataFrame], None]] = None,
        chunk_doc_fn: Optional[Callable] = None,
    ):
        if chunk_doc_fn is not None and chunker is not None:
            raise ValueError("pass either chunk_doc_fn (fused) or chunker, not both")
        if chunk_doc_fn is not None and reader is not read_markdown:
            raise ValueError(
                "the fused path parses markdown itself; a custom reader "
                "requires the modular chunker= form"
            )
        if chunk_doc_fn is not None and doc_processors:
            raise ValueError(
                "document processors need the elements DataFrame; use the "
                "modular chunker= form"
            )
        self.reader = reader
        self.doc_processors = list(doc_processors)
        self.chunker = chunker or (lambda df: header_chunker(df, ChunkerOptions()))
        self.chunk_processors = list(chunk_processors)
        self.writer = writer
        self.chunk_doc_fn = chunk_doc_fn

    def elements(self, spark, source, **reader_kwargs) -> DataFrame:
        df = self.reader(spark, source, **reader_kwargs)
        for p in self.doc_processors:
            df = p(df)
        return df

    def chunks(self, spark, source, **reader_kwargs) -> DataFrame:
        if self.chunk_doc_fn is not None:
            unknown = set(reader_kwargs) - {"glob", "recursive"}
            if unknown:
                raise TypeError(
                    f"fused path supports glob/recursive only; got {sorted(unknown)}"
                )
            files = binary_file_scan(
                spark, source,
                glob=reader_kwargs.get("glob", "*.md"),
                recursive=reader_kwargs.get("recursive", False),
            )
            df = parse_and_chunk(files, self.chunk_doc_fn, id_col="path",
                                 content_col="content")
        else:
            df = self.chunker(self.elements(spark, source, **reader_kwargs))
        for p in self.chunk_processors:
            df = p(df)
        return df

    def run(self, spark, source, output_path: str, incremental: bool = False,
            span_sink: Optional[dict] = None, **reader_kwargs) -> None:
        """Execute the pipeline. Orchestration is wrapped in spans
        (``observability.span``: timing + OpenTelemetry when installed) the
        way the reference wraps ProcessDirectory/ProcessFiles in Activities
        (``IngestionPipeline.cs:64-100``). Note the plan/write split: plan
        construction is ~instant (lazy), the write span carries the work."""
        from .observability import (
            SPAN_PROCESS_DIRECTORY,
            SPAN_WRITE,
            TAG_FILE_PATH,
            span,
        )

        with span(SPAN_PROCESS_DIRECTORY, span_sink, {TAG_FILE_PATH: str(source)}):
            chunks = self.chunks(spark, source, **reader_kwargs)
            if self.writer is not None:
                if incremental:
                    raise ValueError(
                        "incremental=True has no effect with a custom writer; "
                        "implement the replace inside the writer instead"
                    )
                with span(SPAN_WRITE, span_sink):
                    self.writer(chunks)
            else:
                with span(SPAN_WRITE, span_sink):
                    write_vector_table(chunks, output_path, incremental=incremental)
