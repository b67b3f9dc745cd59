"""One-shot sweep: build every queries() DataFrame at sf0.001 and flag any
top-level array/map/struct output column — the driver's canonicalizer sorts
rows with raw pandas and throws on list cells (the r8 pack_token_id_rows
red).  Exit 1 if any query ships a non-scalar column."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entrymod


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("scalar-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad, err = [], []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:
            err.append((name, str(e)[:120]))
            print(f"ERR   {name}: {str(e)[:120]}")
            continue
        nonscalar = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nonscalar:
            bad.append((name, nonscalar))
            print(f"BAD   {name}: {nonscalar}")
        else:
            print(f"ok    {name}")
    print(f"\n{len(bad)} non-scalar, {len(err)} errors")
    if bad:
        print("non-scalar:", bad)
    sys.exit(1 if (bad or err) else 0)


if __name__ == "__main__":
    main()
