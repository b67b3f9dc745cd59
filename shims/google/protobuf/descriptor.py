"""Descriptor surface of the mini runtime. Generated modules check
``_USE_C_DESCRIPTORS`` and assign ``_serialized_start``/``_loaded_options``
onto descriptors — the mini descriptor classes accept arbitrary
attributes."""

from ._mini_runtime import (  # noqa: F401 — re-exported surface
    EnumDesc as EnumDescriptor,
    FieldDesc as FieldDescriptor,
    FileDesc as FileDescriptor,
    MessageDesc as Descriptor,
    OneofDesc as OneofDescriptor,
)

_USE_C_DESCRIPTORS = False
