"""Arrow IPC (Feather v2) file source and sink.

The Arrow IPC *file* format is the random-access interchange format
training loops and dataloaders read zero-copy (mmap) — the natural
hand-off between a Spark curation pipeline and a local tokenizer/
packing stage when parquet decode overhead matters. Both sides ride
pyarrow's bundled implementation; no new dependency.

Scale shape: an IPC file is a sequence of record batches with a footer
index — random-access by BATCH, but the repo's reader keeps the
one-task-per-file shape of the other byte-stream sources (TFRecord,
WARC, zstd-JSONL) because `binaryFile` delivers whole blobs; shard at
write time so files stay executor-memory sized. The writer is one task
per hash-shard with in-shard ordering, so bytes are DETERMINISTIC
given the data (same layout contract as the TFRecord/WebDataset/zstd
sinks — re-exports are idempotent, shards content-addressable).

Cited parity: the reference has no Arrow surface; this extends the
training-data interchange matrix (SURVEY.md §2-beyond) the same way
TFRecord (`sources/tfrecord.py`) and WebDataset (`sinks/webdataset.py`)
do.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["read_arrow_ipc", "read_arrow_ipc_split",
           "write_arrow_ipc"]


def read_arrow_ipc(spark: SparkSession, path: str,
                   columns: Optional[List[str]] = None,
                   glob: str = "*.arrow",
                   arrow: bool = True) -> DataFrame:
    """Read a directory of Arrow IPC (Feather v2) files.

    Schema comes from the first file's footer (one driver-side read —
    explicit, not inferred per task); every file must match it, a
    mismatch fails loudly with the file name. ``columns`` prunes at the
    deserialization boundary (IPC is columnar, so unprojected columns
    are never materialized into pandas). One task per file.

    ``arrow=True`` (r14; default since r15): the file's own RecordBatches ship straight
    to the JVM via ``mapInArrow`` — the on-disk format IS Arrow, so
    the default path's arrow→pandas→arrow round-trip is pure waste.
    Timestamp-bearing schemas route back to mapInPandas (Spark's
    pandas serializer defines their session-timezone semantics);
    values are row-for-row identical either way."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import from_arrow_schema

    scan = (spark.read.format("binaryFile")
            .option("pathGlobFilter", glob).load(path)
            .select("path", "content"))
    # schema comes from one FOOTER, not one whole file: collect only the
    # path (cheap metadata row) and open the footer directly when the
    # scheme is local; only a non-local scheme pays a full-blob collect
    first = scan.select("path").limit(1).collect()
    if not first:
        raise ValueError(f"no files match {glob!r} under {path}")
    fpath = first[0]["path"]
    if fpath.startswith("file:"):
        local = fpath[5:]
        while local.startswith("//"):  # file:///x and file:/x both occur
            local = local[1:]
        schema = pa.ipc.open_file(local).schema
    else:  # pragma: no cover - no object store in this image
        blob = scan.limit(1).collect()[0]["content"]
        schema = pa.ipc.open_file(pa.py_buffer(bytes(blob))).schema
    if columns is not None:
        missing = [c for c in columns if c not in schema.names]
        if missing:
            raise ValueError(f"columns not in schema: {missing}")
        schema = pa.schema([schema.field(c) for c in columns])
    spark_schema = from_arrow_schema(schema)
    want = [f.name for f in schema]

    def parse(batches):
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                reader = pa.ipc.open_file(pa.py_buffer(bytes(blob)))
                _check_file_schema(reader.schema, schema, want, fpath)
                tbl = reader.read_all().select(want)
                yield tbl.to_pandas()

    def parse_arrow(rbs):
        from .arrow_interchange import arrow_batch_builder

        _target, _batch = arrow_batch_builder(spark_schema, want)
        for rb in rbs:
            paths = rb.column("path")
            contents = rb.column("content")
            for i in range(rb.num_rows):
                fpath = paths[i].as_py()
                reader = pa.ipc.open_file(
                    pa.py_buffer(bytes(contents[i].as_py())))
                _check_file_schema(reader.schema, schema, want, fpath)
                for bi in range(reader.num_record_batches):
                    b = reader.get_batch(bi)
                    if b.num_rows:
                        yield _batch({c: b.column(c) for c in want})

    from .arrow_interchange import schema_has_timestamp

    if arrow and not schema_has_timestamp(spark_schema):
        return scan.mapInArrow(parse_arrow, spark_schema)
    return scan.mapInPandas(parse, spark_schema)


def _check_file_schema(fschema, schema, want, fpath) -> None:
    """Every projected field must exist in the file with the exact
    footer-probed type — a mismatch names the file and field."""
    for name in want:
        expect = schema.field(name)
        if (name not in fschema.names
                or fschema.field(name).type != expect.type):
            got = (fschema.field(name).type
                   if name in fschema.names else None)
            raise ValueError(
                f"{fpath}: field {name!r} is {got}, "
                f"expected {expect.type}")


def write_arrow_ipc(df: DataFrame, out_dir: str, shards: int = 4,
                    order_by: Optional[str] = None,
                    prefix: str = "part",
                    batch_rows: int = 4096,
                    compression: Optional[str] = None) -> List[str]:
    """Write ``df`` as ``shards`` Arrow IPC (Feather v2) files.

    Rows hash-shard on ``order_by`` (default: first column) and sort
    within a shard — deterministic bytes given the data. ``batch_rows``
    sets the record-batch granularity inside each file (the unit a
    random-access consumer reads); one task per shard. Returns shard
    names.

    ``compression`` ('zstd' or 'lz4') uses the IPC format's native
    per-buffer compression — unlike whole-file gzip, the file STAYS
    random-access by batch and readers (ours included) decompress
    transparently; mmap zero-copy is traded away, which is the
    standard Feather-compressed trade."""
    import os

    if shards < 1:
        raise ValueError("shards must be >= 1")
    if compression not in (None, "zstd", "lz4"):
        raise ValueError(f"unsupported compression {compression!r} "
                         "(None, 'zstd' or 'lz4')")
    from pyspark.sql.pandas.types import to_arrow_schema

    key = order_by or df.columns[0]
    cols = df.columns
    # the file schema is PINNED from the Spark schema — from_pandas
    # inference would type an all-null column as null() and an
    # int-with-NaN column as float64, making shard schemas diverge by
    # CONTENT and fail the reader's per-file type check
    arrow_schema = to_arrow_schema(df.select(*cols).schema)
    os.makedirs(out_dir, exist_ok=True)
    sel = df.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(key).cast("string")),
                         F.lit(shards)).cast("int"))

    def write_shard(pdf):
        import pandas as pd
        import pyarrow as pa

        if len(pdf) == 0:
            return pd.DataFrame({"name": [], "n_records": []})
        shard = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(key, kind="mergesort")
        name = f"{prefix}-{shard:05d}-of-{shards:05d}.arrow"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        tbl = pa.Table.from_pandas(pdf[cols], schema=arrow_schema,
                                   preserve_index=False)
        opts = pa.ipc.IpcWriteOptions(
            compression=compression) if compression else None
        with pa.OSFile(tmp, "wb") as sink:
            with pa.ipc.new_file(sink, tbl.schema, options=opts) as w:
                for batch in tbl.to_batches(max_chunksize=batch_rows):
                    w.write_batch(batch)
        os.replace(tmp, os.path.join(out_dir, name))
        return pd.DataFrame({"name": [name], "n_records": [len(pdf)]})

    manifest = (sel.groupBy("_shard").applyInPandas(
        write_shard, "name string, n_records long").collect())
    return sorted(r["name"] for r in manifest)


def _open_ipc(path: str, backend):
    """Random-access IPC reader handle: plain pyarrow file open for
    the local backend (lazy per-batch reads from an OSFile), a
    ``pa.PythonFile`` over the buffered :class:`RangedFile` elsewhere
    (footer + assigned batches arrive as ranged GETs)."""
    import pyarrow as pa

    from ..sinks.data_backend import LocalDataBackend, RangedFile

    if isinstance(backend, LocalDataBackend):
        return pa.ipc.open_file(path)
    return pa.ipc.open_file(pa.PythonFile(RangedFile(backend, path),
                                          mode="r"))


def _ipc_meta(path: str, backend) -> tuple:
    """(num record batches, file size) from the footer — a couple of
    small tail reads, callable driver- or executor-side."""
    size = backend.size(path)
    if size is None:
        raise FileNotFoundError(path)
    return _open_ipc(path, backend).num_record_batches, size


def read_arrow_ipc_split(spark: SparkSession, path: str,
                         columns: Optional[List[str]] = None, *,
                         split_mb: int = 128,
                         glob_pat: str = "*.arrow",
                         backend=None,
                         arrow: bool = True) -> DataFrame:
    """Scale-IN Arrow IPC reader: the file format's FOOTER indexes
    every record batch, so splitting needs no resync heuristics at all
    — the planner reads each footer (small tail reads), assigns
    contiguous batch ranges of ~``split_mb`` bytes to tasks, and each
    task random-accesses exactly its batches (``get_batch`` seeks per
    the footer's block index; unassigned batches are never read).

    Contrast :func:`read_arrow_ipc` (one ``binaryFile`` task per
    file): there parallelism = shard count and a task materializes the
    whole blob; here parallelism = corpus bytes / split_mb and a task
    touches only its own batch ranges — what one oversized Feather
    shard of embeddings needs. Same schema contract as the whole-file
    reader: pinned from the first footer, per-file type check, loud
    mismatch. ``columns`` prunes at the deserialization boundary.
    Local paths open directly; other schemes route through the
    range-read DataBackend (or pass ``backend=``). Footer probes run
    as one Spark job above 32 files. ``arrow=True`` ships each task's
    batches straight to the JVM via ``mapInArrow`` (see
    :func:`read_arrow_ipc`)."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import from_arrow_schema

    from ..sinks.data_backend import (
        list_split_files, resolve_split_backend,
    )

    if split_mb < 1:
        raise ValueError("split_mb must be >= 1")
    backend = resolve_split_backend(path, backend)
    files = list_split_files(path, glob_pat, backend)
    if not files:
        raise ValueError(f"no files match {glob_pat!r} under {path}")
    if len(files) <= 32:
        metas = {p: _ipc_meta(p, backend) for p in files}
    else:
        bk = backend
        metas = dict(
            spark.sparkContext
            .parallelize(files, min(len(files), 256))
            .map(lambda p: (p, _ipc_meta(p, bk))).collect())

    schema = _open_ipc(files[0], backend).schema
    if columns is not None:
        missing = [c for c in columns if c not in schema.names]
        if missing:
            raise ValueError(f"columns not in schema: {missing}")
        schema = pa.schema([schema.field(c) for c in columns])
    spark_schema = from_arrow_schema(schema)
    want = [f.name for f in schema]

    step = split_mb << 20
    ranges = []
    for p in files:
        n_batches, size = metas[p]
        if n_batches == 0:
            continue
        per_batch = max(size // n_batches, 1)
        per_task = max(int(step // per_batch), 1)
        for lo in range(0, n_batches, per_task):
            ranges.append((p, lo, min(per_task, n_batches - lo)))
    if not ranges:  # only empty files: one no-op task keeps the shape
        ranges = [(files[0], 0, 0)]
    rdf = spark.createDataFrame(
        ranges, "path string, first long, count long"
    ).repartition(min(len(ranges), 4096))

    def decode(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                reader = _open_ipc(row.path, backend)
                _check_file_schema(reader.schema, schema, want,
                                   row.path)
                if row.count == 0:
                    continue
                got_b = [reader.get_batch(int(row.first) + i)
                         for i in range(int(row.count))]
                tbl = pa.Table.from_batches(got_b).select(want)
                yield tbl.to_pandas()

    def decode_arrow(rbs):
        from .arrow_interchange import arrow_batch_builder

        _target, _batch = arrow_batch_builder(spark_schema, want)
        for rb in rbs:
            for i in range(rb.num_rows):
                fpath = rb.column("path")[i].as_py()
                first = int(rb.column("first")[i].as_py())
                count = int(rb.column("count")[i].as_py())
                reader = _open_ipc(fpath, backend)
                _check_file_schema(reader.schema, schema, want, fpath)
                for bi in range(count):
                    b = reader.get_batch(first + bi)
                    if b.num_rows:
                        yield _batch({c: b.column(c) for c in want})

    from .arrow_interchange import schema_has_timestamp

    if arrow and not schema_has_timestamp(spark_schema):
        return rdf.mapInArrow(decode_arrow, spark_schema)
    return rdf.mapInPandas(decode, spark_schema)
