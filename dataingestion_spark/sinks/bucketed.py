"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of fact⋈fact joins is shuffling both sides on
the key. Writing both tables bucketed (and sorted) by that key pins rows to
hash buckets at write time, so later equi-joins read matching buckets
pairwise — Catalyst elides the Exchange (and with sorted buckets, the Sort)
entirely. This is the Spark analog of co-partitioned storage layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(df: DataFrame, table_name: str, key: str, buckets: int = 16,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table_name)


def read_table(spark, table_name: str) -> DataFrame:
    return spark.table(table_name)
