"""Descriptor pool: parses the serialized FileDescriptorProto a generated
module embeds and returns the file descriptor. One process-wide default
pool, keyed by file name so re-imports return the same object."""

from typing import Dict

from ._mini_runtime import FileDesc, parse_file_descriptor


class DescriptorPool:
    def __init__(self):
        self._files: Dict[str, FileDesc] = {}

    def AddSerializedFile(self, serialized: bytes) -> FileDesc:
        fd = parse_file_descriptor(bytes(serialized))
        if fd.name in self._files:
            return self._files[fd.name]
        self._files[fd.name] = fd
        return fd

    def FindFileByName(self, name: str) -> FileDesc:
        return self._files[name]


_DEFAULT = DescriptorPool()


def Default() -> DescriptorPool:
    return _DEFAULT
