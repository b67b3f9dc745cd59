"""Minimal pure-python protobuf runtime — just enough for protoc-generated
``*_pb2.py`` modules of self-contained proto3 files (no imports, no
extensions, no services), written against PUBLIC documentation only: the
protobuf wire format (varint / length-delimited) and the stable field
numbers of ``descriptor.proto``'s ``FileDescriptorProto`` family.

Purpose: PySpark's state API v2 (``transformWithStateInPandas``) speaks
protobuf between the Python worker and the JVM state server
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``), and the real
``protobuf`` package is not installed in this image (and may not be on a
user's cluster). This shim implements the runtime surface that generated
module touches — ``descriptor``, ``descriptor_pool``,
``runtime_version``, ``symbol_database``, ``internal.builder``,
``message`` — backed by one dynamic message engine
(:mod:`._mini_runtime`) that parses the serialized
``FileDescriptorProto`` embedded in the generated file and builds
message classes speaking standard proto3 wire format.

Supported: singular/repeated int32/int64/uint32/uint64/bool/enum/
string/bytes/message fields, oneofs, proto3 optional; unknown fields
are skipped on parse. Not supported (loud ``NotImplementedError``):
groups, packed repeated varints on serialize (none of the target protos
use them), fixed/float types, maps, extensions.

The engine only activates when the REAL protobuf is absent: this
directory is appended to ``sys.path`` by
``dataingestion_spark.streaming.tws.ensure_protobuf`` after an
``importlib.util.find_spec("google.protobuf")`` miss, and shipped to
executors with ``SparkContext.addPyFile``.
"""

__version__ = "6.33.0"  # mirrors the runtime the gencode validates against
