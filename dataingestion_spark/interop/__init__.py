"""Interop with open table formats (Delta Lake protocol export/import)."""

from .delta import export_delta, mirror_delta, read_delta, vacuum_delta  # noqa: F401
