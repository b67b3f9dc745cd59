"""Symbol database: generated modules grab the default instance; the mini
runtime resolves classes through descriptors directly, so registration is
bookkeeping only."""

from typing import Dict


class SymbolDatabase:
    def __init__(self):
        self._classes: Dict[str, type] = {}

    def RegisterMessage(self, cls) -> type:
        self._classes[cls.DESCRIPTOR.full_name] = cls
        return cls

    def RegisterFileDescriptor(self, fd) -> None:
        pass

    def GetSymbol(self, name: str) -> type:
        return self._classes[name]


_DEFAULT = SymbolDatabase()


def Default() -> SymbolDatabase:
    return _DEFAULT
