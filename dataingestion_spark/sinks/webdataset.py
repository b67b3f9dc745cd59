"""WebDataset-style tar shard export.

Training loaders (WebDataset, torchdata, NeMo) stream samples from tar
shards: members grouped by a basename key, extension = field
(``000123.txt``, ``000123.json``, …), shards sized for sequential
reads. This sink turns a DataFrame into those shards with Spark doing
the heavy lifting: one ``applyInPandas`` group per shard (the shard is
the parallel unit — 100 TB is just more shards), members sorted by key
inside each shard, and a manifest row per shard back to the planner.

Determinism is part of the contract: fixed USTAR format, mtime=0,
uid/gid=0, mode 0644, sorted members — the same rows always produce
byte-identical shards, so shard files can be content-addressed and
re-exports are idempotent. The archive size is a closed form of the
member sizes (512-byte header + payload rounded up to 512 per member,
1024-byte end marker, whole archive padded to the 10240-byte record
size), which is what the driver oracle checks.

The reference's sinks write per-chunk rows to vector stores
(``src/Microsoft.Extensions.DataIngestion/Writers/VectorStoreWriter.cs``);
tar-shard export is part of the beyond-reference training-data surface.
Executors write shards with local file APIs — point ``out_dir`` at a
fuse mount (or swap ``open`` for an fsspec handle) for object storage.
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("n_members", IntegerType()),
        StructField("tar_nbytes", LongType()),
        StructField("first_key", StringType()),
        StructField("last_key", StringType()),
    ]
)


def build_tar_bytes(members: List[Tuple[str, bytes]]) -> bytes:
    """Byte-deterministic USTAR archive from (name, payload) members."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            info.mode = 0o644
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def tar_size_closed_form(member_sizes: List[int]) -> int:
    """What ``len(build_tar_bytes(...))`` must return — kept next to the
    builder so the invariant is stated once (the DuckDB oracle mirrors
    this arithmetic)."""
    body = sum(512 + (s + 511) // 512 * 512 for s in member_sizes) + 1024
    return (body + 10239) // 10240 * 10240


def write_webdataset(
    df: DataFrame,
    out_dir: Optional[str],
    shard_col: str = "shard_id",
    key_col: str = "key",
    text_col: str = "text",
    meta_col: Optional[str] = "meta",
) -> DataFrame:
    """Export ``df`` as WebDataset tar shards; returns the manifest.

    Each row becomes ``{key}.txt`` (+ ``{key}.json`` when ``meta_col``
    is set, already-serialized JSON strings). Rows are sorted by key
    within the shard. ``out_dir=None`` builds every archive in memory
    and returns the manifest without writing — the dry-run/audit path.
    """
    cols = [shard_col, key_col, text_col] + ([meta_col] if meta_col else [])

    def export(pdf):
        import pandas as pd

        pdf = pdf.sort_values(key_col)
        shard_id = int(pdf[shard_col].iloc[0])
        members: List[Tuple[str, bytes]] = []
        for _, row in pdf.iterrows():
            key = str(row[key_col])
            members.append((f"{key}.txt", str(row[text_col]).encode()))
            if meta_col:
                members.append((f"{key}.json", str(row[meta_col]).encode()))
        data = build_tar_bytes(members)
        assert len(data) == tar_size_closed_form([len(d) for _, d in members])
        if out_dir is not None:
            os.makedirs(out_dir, exist_ok=True)
            tmp = os.path.join(out_dir, f".shard-{shard_id:05d}.tar.tmp")
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, os.path.join(out_dir, f"shard-{shard_id:05d}.tar"))
        return pd.DataFrame(
            [
                (
                    shard_id,
                    len(members),
                    len(data),
                    str(pdf[key_col].iloc[0]),
                    str(pdf[key_col].iloc[-1]),
                )
            ],
            columns=[f.name for f in MANIFEST_SCHEMA.fields],
        )

    return (
        df.select(*cols).groupBy(shard_col).applyInPandas(export, MANIFEST_SCHEMA)
    )


def read_webdataset(spark, path: str) -> DataFrame:
    """Shards → (shard, key, ext, payload) rows — the loader-side check
    that exported shards are readable; binaryFile scan, one tar per
    task."""
    from ..sources.markdown import binary_file_scan

    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("key", StringType()),
            StructField("ext", StringType()),
            StructField("payload", StringType()),
        ]
    )

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for info in tf.getmembers():
                        base, _, ext = info.name.rpartition(".")
                        payload = tf.extractfile(info).read().decode("utf-8", "replace")
                        rows.append((p, base, ext, payload))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return binary_file_scan(spark, path, glob="*.tar").mapInPandas(run, schema)
