"""Shared helpers for the r14 mapInArrow interchange (Avro + Arrow
IPC readers): decoded/native Arrow columns cross executor→JVM as
RecordBatches with no pandas round-trip.

Two rules make this safe:

- **Nullability**: Arrow refuses nullable→non-nullable casts, and
  Spark's reader applies its OWN schema while ignoring batch
  nullability flags — so arrays cast to an all-nullable twin of the
  schema's Arrow types.
- **Timezones**: Spark's PANDAS serializer defines session-timezone
  localization for timestamp columns; rather than re-implement it,
  readers route timestamp-bearing schemas back to their mapInPandas
  contract (:func:`schema_has_timestamp` is the gate). ``date32`` is
  timezone-free and safe.
"""
from __future__ import annotations


def arrow_batch_builder(spark_schema, want):
    """(target type map, arrays→RecordBatch fn). Executor-side only
    (imports pyarrow lazily)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    def _nullable(t):
        if pa.types.is_struct(t):
            return pa.struct([pa.field(f.name, _nullable(f.type))
                              for f in t])
        if pa.types.is_large_list(t) or pa.types.is_list(t):
            return pa.list_(_nullable(t.value_type))
        return t

    target = {f.name: _nullable(f.type)
              for f in to_arrow_schema(spark_schema)}

    def _batch(arrays_by_name):
        out = []
        for c in want:
            arr = arrays_by_name[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if arr.type != target[c]:
                arr = arr.cast(target[c])
            out.append(arr)
        return pa.RecordBatch.from_arrays(out, names=want)

    return target, _batch


def schema_has_timestamp(dt) -> bool:
    """True if the Spark type (recursively) contains a timestamp —
    the mapInArrow gate (timestamps ride the pandas serializer's
    session-timezone semantics)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return True
    if isinstance(dt, T.StructType):
        return any(schema_has_timestamp(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return schema_has_timestamp(dt.elementType)
    if isinstance(dt, T.MapType):
        return (schema_has_timestamp(dt.keyType)
                or schema_has_timestamp(dt.valueType))
    return False
