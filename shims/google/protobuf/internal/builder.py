"""Builder hooks the generated module calls to materialize descriptors
and message classes into its module globals.

``BuildMessageAndEnumDescriptors`` exposes ``_UPPERNAME`` descriptor
globals (the generated tail assigns ``_serialized_start`` offsets onto
them); ``BuildTopDescriptorsAndMessages`` exposes the concrete message
classes under their proto names, enum wrapper objects, and every enum
VALUE as a module-level constant (proto3 style: ``stateMessage.CREATED``).
"""

from .._mini_runtime import FileDesc, build_message_class


class _EnumTypeWrapper:
    def __init__(self, desc):
        self.DESCRIPTOR = desc
        for name, number in desc.values.items():
            setattr(self, name, number)
        self._by_number = {v: k for k, v in desc.values.items()}

    def Name(self, number: int) -> str:
        return self._by_number[number]

    def Value(self, name: str) -> int:
        return self.DESCRIPTOR.values[name]

    def keys(self):
        return list(self.DESCRIPTOR.values)

    def values(self):
        return list(self.DESCRIPTOR.values.values())


def BuildMessageAndEnumDescriptors(file_des: FileDesc, module_globals) -> None:
    for m in file_des.messages:
        module_globals["_" + m.name.upper()] = m
    for e in file_des.enums:
        module_globals["_" + e.name.upper()] = e


def BuildTopDescriptorsAndMessages(file_des: FileDesc, module_name: str,
                                   module_globals) -> None:
    for m in file_des.messages:
        cls = build_message_class(m)
        cls.__module__ = module_name
        module_globals[m.name] = cls
    for e in file_des.enums:
        module_globals[e.name] = _EnumTypeWrapper(e)
        for name, number in e.values.items():
            module_globals[name] = number
