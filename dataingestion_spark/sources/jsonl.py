"""JSONL corpus interchange (the Dolma / RedPajama / HF-datasets wire
format: one JSON document per line, optionally gzipped).

Readers in the reference consume files one at a time
(``MarkdownReader``/``MarkItDownReader``); web-scale corpora ship as
JSONL shards instead, so this is the ingestion format a training
pipeline actually starts from. Spark's native JSON source does the heavy
lifting — the value here is pinning the tolerant-read contract:

* **explicit schema always** (never inference — an inference pass is a
  full extra scan at 100 TB, and schema drift across shards silently
  widens types);
* **malformed lines are data, not poison**: PERMISSIVE mode routes them
  to ``_corrupt`` with every real column null, so one truncated shard
  tail can't kill a 10-hour job; count them, alert on the rate;
* round trips are byte-faithful for string/integer columns (JSON escapes
  newlines inside ``text``), so write→read is lossless — the driver
  query proves it against the parquet original.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

#: documents-table shape (TESTDATA.md); any schema works, this is the default
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt"


def read_jsonl(spark: SparkSession, path: str,
               schema: Optional[T.StructType] = None,
               keep_corrupt: bool = False) -> DataFrame:
    """Schema-enforced tolerant JSONL read. With ``keep_corrupt`` the
    ``_corrupt`` column carries each unparseable line verbatim (null for
    good rows); otherwise corrupt lines are dropped silently — use
    :func:`corrupt_count` first when the rate matters.

    Implemented as ``text`` source + ``from_json`` rather than the native
    JSON source: same Jackson parser and pushdown-friendly scan, but free
    of the analyzer restriction that a plan referencing ONLY the internal
    corrupt-record column (e.g. a count after filtering on it) is
    disallowed — and blank lines are structural, never counted corrupt."""
    schema = schema or DOCUMENTS_SCHEMA
    # from_json (Spark 4) yields a null-FIELDED struct for malformed input,
    # not a null struct — the corrupt-record field in the parse schema is
    # what actually distinguishes "unparseable line" from "all fields null"
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    raw = spark.read.text(path).filter(F.trim(F.col("value")) != "")
    parsed = raw.select(
        F.from_json(
            F.col("value"), with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("_r")
    )
    if keep_corrupt:
        return parsed.select("_r.*")
    return parsed.filter(F.col(f"_r.{_CORRUPT}").isNull()).select("_r.*").drop(_CORRUPT)


def corrupt_count(spark: SparkSession, path: str,
                  schema: Optional[T.StructType] = None) -> int:
    """Number of malformed lines in the shard set (one scan that prunes
    to the raw line column)."""
    df = read_jsonl(spark, path, schema, keep_corrupt=True)
    return df.filter(F.col(_CORRUPT).isNotNull()).count()


def write_jsonl(df: DataFrame, path: str, compression: Optional[str] = "gzip",
                shards: Optional[int] = None) -> None:
    """Write JSONL shards (one file per partition — pass ``shards`` to
    control the shard count; gzip by default, the format's convention)."""
    if shards is not None:
        df = df.repartition(shards)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
