"""The engine behind the shim: wire-format codec, ``FileDescriptorProto``
parsing, and dynamic message classes.

Wire format (public spec): a message is a sequence of
``tag = (field_number << 3) | wire_type`` records; wire type 0 = varint,
1 = 64-bit, 2 = length-delimited, 5 = 32-bit. Varints are little-endian
base-128; negative int32/int64 values serialize as the 10-byte two's
complement of the 64-bit value. proto3 serialization skips singular
scalars equal to their default unless the field belongs to a oneof (or
is ``optional``), in which case explicit presence wins.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

# --- FieldDescriptorProto.Type values (stable public constants) -----------
TYPE_DOUBLE = 1
TYPE_FLOAT = 2
TYPE_INT64 = 3
TYPE_UINT64 = 4
TYPE_INT32 = 5
TYPE_FIXED64 = 6
TYPE_FIXED32 = 7
TYPE_BOOL = 8
TYPE_STRING = 9
TYPE_GROUP = 10
TYPE_MESSAGE = 11
TYPE_BYTES = 12
TYPE_UINT32 = 13
TYPE_ENUM = 14

_VARINT_TYPES = {TYPE_INT64, TYPE_UINT64, TYPE_INT32, TYPE_UINT32,
                 TYPE_BOOL, TYPE_ENUM}
_SIGNED_TYPES = {TYPE_INT64, TYPE_INT32}
_LEN_TYPES = {TYPE_STRING, TYPE_BYTES, TYPE_MESSAGE}

LABEL_REPEATED = 3


class DecodeError(Exception):
    pass


class EncodeError(Exception):
    pass


# --- varint / tag primitives ----------------------------------------------

def write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        value &= 0xFFFFFFFFFFFFFFFF  # two's complement, 10-byte encoding
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise DecodeError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise DecodeError("varint too long")


def _skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = read_varint(buf, pos)
        return pos
    if wire_type == 1:
        return pos + 8
    if wire_type == 2:
        n, pos = read_varint(buf, pos)
        return pos + n
    if wire_type == 5:
        return pos + 4
    raise DecodeError(f"unsupported wire type {wire_type}")


# --- descriptor model ------------------------------------------------------

class FieldDesc:
    __slots__ = ("name", "number", "label", "type", "type_name",
                 "oneof_index", "proto3_optional", "message_type",
                 "containing_oneof")

    def __init__(self):
        self.name = ""
        self.number = 0
        self.label = 1
        self.type = 0
        self.type_name = ""
        self.oneof_index: Optional[int] = None
        self.proto3_optional = False
        self.message_type: Optional["MessageDesc"] = None  # resolved later
        self.containing_oneof: Optional[str] = None

    @property
    def is_repeated(self) -> bool:
        return self.label == LABEL_REPEATED

    def default(self):
        if self.is_repeated:
            return []
        if self.type in (TYPE_STRING,):
            return ""
        if self.type == TYPE_BYTES:
            return b""
        if self.type == TYPE_BOOL:
            return False
        if self.type == TYPE_MESSAGE:
            return None
        return 0


class OneofDesc:
    __slots__ = ("name", "fields")

    def __init__(self, name: str):
        self.name = name
        self.fields: List[str] = []


class MessageDesc:
    """Allows arbitrary attribute assignment — generated modules set
    ``_serialized_start``/``_serialized_end``/``_loaded_options``."""

    def __init__(self, name: str, full_name: str):
        self.name = name
        self.full_name = full_name
        self.fields: List[FieldDesc] = []
        self.fields_by_name: Dict[str, FieldDesc] = {}
        self.fields_by_number: Dict[int, FieldDesc] = {}
        self.oneofs: List[OneofDesc] = []
        self._concrete_class = None


class EnumDesc:
    def __init__(self, name: str, full_name: str):
        self.name = name
        self.full_name = full_name
        self.values: Dict[str, int] = {}


class FileDesc:
    """Result of AddSerializedFile; attribute-assignable like above."""

    def __init__(self):
        self.name = ""
        self.package = ""
        self.messages: List[MessageDesc] = []
        self.enums: List[EnumDesc] = []
        self.message_types_by_name: Dict[str, MessageDesc] = {}
        self.enum_types_by_name: Dict[str, EnumDesc] = {}


# --- FileDescriptorProto parsing (stable descriptor.proto field numbers) --

def _parse_enum(buf: bytes, package: str) -> EnumDesc:
    name = ""
    values: Dict[str, int] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if fnum == 1 and wt == 2:  # name
            n, pos = read_varint(buf, pos)
            name = buf[pos:pos + n].decode()
            pos += n
        elif fnum == 2 and wt == 2:  # value: EnumValueDescriptorProto
            n, pos = read_varint(buf, pos)
            sub = buf[pos:pos + n]
            pos += n
            vname, vnum, sp = "", 0, 0
            while sp < len(sub):
                stag, sp = read_varint(sub, sp)
                sfn, swt = stag >> 3, stag & 7
                if sfn == 1 and swt == 2:
                    sn, sp = read_varint(sub, sp)
                    vname = sub[sp:sp + sn].decode()
                    sp += sn
                elif sfn == 2 and swt == 0:
                    vnum, sp = read_varint(sub, sp)
                else:
                    sp = _skip_field(sub, sp, swt)
            values[vname] = vnum
        else:
            pos = _skip_field(buf, pos, wt)
    e = EnumDesc(name, f"{package}.{name}" if package else name)
    e.values = values
    return e


def _parse_field(buf: bytes) -> FieldDesc:
    f = FieldDesc()
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if fnum == 1 and wt == 2:
            n, pos = read_varint(buf, pos)
            f.name = buf[pos:pos + n].decode()
            pos += n
        elif fnum == 3 and wt == 0:
            f.number, pos = read_varint(buf, pos)
        elif fnum == 4 and wt == 0:
            f.label, pos = read_varint(buf, pos)
        elif fnum == 5 and wt == 0:
            f.type, pos = read_varint(buf, pos)
        elif fnum == 6 and wt == 2:
            n, pos = read_varint(buf, pos)
            f.type_name = buf[pos:pos + n].decode()
            pos += n
        elif fnum == 9 and wt == 0:
            f.oneof_index, pos = read_varint(buf, pos)
        elif fnum == 17 and wt == 0:
            v, pos = read_varint(buf, pos)
            f.proto3_optional = bool(v)
        else:
            pos = _skip_field(buf, pos, wt)
    return f


def _parse_message(buf: bytes, package: str) -> MessageDesc:
    name = ""
    fields: List[FieldDesc] = []
    oneofs: List[OneofDesc] = []
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if fnum == 1 and wt == 2:
            n, pos = read_varint(buf, pos)
            name = buf[pos:pos + n].decode()
            pos += n
        elif fnum == 2 and wt == 2:  # field
            n, pos = read_varint(buf, pos)
            fields.append(_parse_field(buf[pos:pos + n]))
            pos += n
        elif fnum == 8 and wt == 2:  # oneof_decl
            n, pos = read_varint(buf, pos)
            sub = buf[pos:pos + n]
            pos += n
            oname, sp = "", 0
            while sp < len(sub):
                stag, sp = read_varint(sub, sp)
                if (stag >> 3) == 1 and (stag & 7) == 2:
                    sn, sp = read_varint(sub, sp)
                    oname = sub[sp:sp + sn].decode()
                    sp += sn
                else:
                    sp = _skip_field(sub, sp, stag & 7)
            oneofs.append(OneofDesc(oname))
        elif fnum in (3, 4) and wt == 2:  # nested_type / enum_type
            raise NotImplementedError(
                "mini protobuf runtime: nested message/enum declarations "
                "are not supported (target protos declare all types at "
                "file scope)")
        else:
            pos = _skip_field(buf, pos, wt)
    m = MessageDesc(name, f"{package}.{name}" if package else name)
    m.fields = fields
    m.oneofs = oneofs
    for f in fields:
        m.fields_by_name[f.name] = f
        m.fields_by_number[f.number] = f
        if f.oneof_index is not None and f.oneof_index < len(oneofs):
            oneofs[f.oneof_index].fields.append(f.name)
            f.containing_oneof = oneofs[f.oneof_index].name
    return m


def parse_file_descriptor(data: bytes) -> FileDesc:
    fd = FileDesc()
    pos = 0
    while pos < len(data):
        tag, pos = read_varint(data, pos)
        fnum, wt = tag >> 3, tag & 7
        if fnum == 1 and wt == 2:
            n, pos = read_varint(data, pos)
            fd.name = data[pos:pos + n].decode()
            pos += n
        elif fnum == 2 and wt == 2:
            n, pos = read_varint(data, pos)
            fd.package = data[pos:pos + n].decode()
            pos += n
        elif fnum == 4 and wt == 2:
            n, pos = read_varint(data, pos)
            fd.messages.append(_parse_message(data[pos:pos + n], fd.package))
            pos += n
        elif fnum == 5 and wt == 2:
            n, pos = read_varint(data, pos)
            fd.enums.append(_parse_enum(data[pos:pos + n], fd.package))
            pos += n
        else:
            pos = _skip_field(data, pos, wt)
    for m in fd.messages:
        fd.message_types_by_name[m.name] = m
    for e in fd.enums:
        fd.enum_types_by_name[e.name] = e
    # resolve message-typed fields within the file (self-contained protos)
    by_full = {m.full_name: m for m in fd.messages}
    for m in fd.messages:
        for f in m.fields:
            if f.type == TYPE_MESSAGE:
                key = f.type_name.lstrip(".")
                f.message_type = by_full.get(key) or fd.message_types_by_name.get(
                    key.rsplit(".", 1)[-1])
                if f.message_type is None:
                    raise NotImplementedError(
                        f"mini protobuf runtime: cannot resolve {f.type_name} "
                        f"(cross-file imports unsupported)")
    return fd


# --- dynamic message classes ----------------------------------------------

class RepeatedField(list):
    """list with protobuf's ``add()`` for repeated message fields."""

    def __init__(self, field: FieldDesc, parent: "MiniMessage"):
        super().__init__()
        self._field = field
        self._parent = parent

    def add(self, **kwargs):
        if self._field.type != TYPE_MESSAGE:
            raise TypeError("add() is only for repeated message fields")
        msg = self._field.message_type._concrete_class(**kwargs)
        self.append(msg)
        self._parent._mark_present(self._field.name)
        return msg

    def append(self, item):  # noqa: A003 - protobuf container API
        super().append(item)
        self._parent._mark_present(self._field.name)

    def extend(self, items):  # noqa: A003
        items = list(items)
        super().extend(items)
        if items:
            self._parent._mark_present(self._field.name)


class MiniMessage:
    """Dynamic message: proto3 semantics for the feature subset the
    generated clients use (kwargs construction, attribute get/set,
    auto-vivified sub-messages with deferred presence, oneof clearing,
    SerializeToString / ParseFromString, CopyFrom, HasField)."""

    DESCRIPTOR: MessageDesc = None  # set on subclass creation

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_present", set())
        object.__setattr__(self, "_parent", None)  # (parent_msg, field_name)
        for k, v in kwargs.items():
            if v is None:
                continue
            setattr(self, k, v)

    # -- presence / oneof ---------------------------------------------------
    def _mark_present(self, name: str) -> None:
        f = self.DESCRIPTOR.fields_by_name[name]
        if f.containing_oneof is not None:
            for other in self._oneof_fields(f.containing_oneof):
                if other != name:
                    self._present.discard(other)
                    self._values.pop(other, None)
        self._present.add(name)
        parent = self._parent
        if parent is not None:
            parent[0]._mark_present(parent[1])

    def _oneof_fields(self, oneof_name: str):
        for o in self.DESCRIPTOR.oneofs:
            if o.name == oneof_name:
                return o.fields
        return []

    def HasField(self, name: str) -> bool:
        if name not in self.DESCRIPTOR.fields_by_name:
            raise ValueError(f"unknown field {name}")
        return name in self._present

    def WhichOneof(self, oneof_name: str) -> Optional[str]:
        for fname in self._oneof_fields(oneof_name):
            if fname in self._present:
                return fname
        return None

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str):
        desc = type(self).DESCRIPTOR
        f = desc.fields_by_name.get(name)
        if f is None:
            raise AttributeError(name)
        values = self._values
        if name in values:
            return values[name]
        if f.is_repeated:
            container = RepeatedField(f, self)
            values[name] = container
            return container
        if f.type == TYPE_MESSAGE:
            child = f.message_type._concrete_class()
            object.__setattr__(child, "_parent", (self, name))
            values[name] = child
            return child  # present only once something is set through it
        return f.default()

    def __setattr__(self, name: str, value) -> None:
        f = self.DESCRIPTOR.fields_by_name.get(name)
        if f is None:
            raise AttributeError(f"{self.DESCRIPTOR.name} has no field {name}")
        if f.is_repeated:
            container = RepeatedField(f, self)
            list.extend(container, value)
            self._values[name] = container
            self._mark_present(name)
            return
        if f.type == TYPE_MESSAGE:
            if not isinstance(value, MiniMessage):
                raise TypeError(f"{name} expects a message, got {type(value)}")
            object.__setattr__(value, "_parent", (self, name))
            self._values[name] = value
            self._mark_present(name)
            return
        if f.type == TYPE_STRING and not isinstance(value, str):
            raise TypeError(f"{name} expects str")
        if f.type == TYPE_BYTES:
            value = bytes(value)
        if f.type == TYPE_BOOL:
            value = bool(value)
        if f.type in (TYPE_INT32, TYPE_INT64, TYPE_UINT32, TYPE_UINT64,
                      TYPE_ENUM):
            value = int(value)
        self._values[name] = value
        self._mark_present(name)

    # -- protobuf API -------------------------------------------------------
    def Clear(self) -> None:
        self._values.clear()
        self._present.clear()

    def CopyFrom(self, other: "MiniMessage") -> None:
        self.ParseFromString(other.SerializeToString())

    def SetInParent(self) -> None:
        parent = self._parent
        if parent is not None:
            parent[0]._mark_present(parent[1])

    def ByteSize(self) -> int:
        return len(self.SerializeToString())

    def SerializeToString(self) -> bytes:
        out = bytearray()
        for f in sorted(self.DESCRIPTOR.fields, key=lambda x: x.number):
            name = f.name
            if f.is_repeated:
                for item in self._values.get(name, ()):  # empty = absent
                    self._emit(out, f, item)
                continue
            if f.type == TYPE_MESSAGE:
                if name in self._present:
                    self._emit(out, f, self._values[name])
                continue
            value = self._values.get(name, f.default())
            explicit = f.containing_oneof is not None or f.proto3_optional
            if (name in self._present and explicit) or value != f.default():
                self._emit(out, f, value)
        return bytes(out)

    @staticmethod
    def _emit(out: bytearray, f: FieldDesc, value) -> None:
        if f.type in _VARINT_TYPES:
            write_varint(out, (f.number << 3) | 0)
            write_varint(out, int(value))
        elif f.type == TYPE_STRING:
            data = value.encode("utf-8")
            write_varint(out, (f.number << 3) | 2)
            write_varint(out, len(data))
            out += data
        elif f.type == TYPE_BYTES:
            data = bytes(value)
            write_varint(out, (f.number << 3) | 2)
            write_varint(out, len(data))
            out += data
        elif f.type == TYPE_MESSAGE:
            data = value.SerializeToString()
            write_varint(out, (f.number << 3) | 2)
            write_varint(out, len(data))
            out += data
        else:
            raise NotImplementedError(
                f"mini protobuf runtime: field type {f.type} unsupported")

    def ParseFromString(self, data: bytes) -> int:
        self.Clear()
        self._merge(bytes(data))
        return len(data)

    def MergeFromString(self, data: bytes) -> int:
        self._merge(bytes(data))
        return len(data)

    def _merge(self, buf: bytes) -> None:
        desc = self.DESCRIPTOR
        pos = 0
        while pos < len(buf):
            tag, pos = read_varint(buf, pos)
            fnum, wt = tag >> 3, tag & 7
            f = desc.fields_by_number.get(fnum)
            if f is None:
                pos = _skip_field(buf, pos, wt)
                continue
            if f.type in _VARINT_TYPES and wt == 0:
                raw, pos = read_varint(buf, pos)
                if f.type in _SIGNED_TYPES and raw >= 1 << 63:
                    raw -= 1 << 64
                value = bool(raw) if f.type == TYPE_BOOL else raw
                if f.is_repeated:
                    getattr(self, f.name).append(value)
                else:
                    setattr(self, f.name, value)
            elif f.type in _LEN_TYPES and wt == 2:
                n, pos = read_varint(buf, pos)
                payload = buf[pos:pos + n]
                pos += n
                if f.type == TYPE_MESSAGE:
                    child = f.message_type._concrete_class()
                    child._merge(payload)
                    if f.is_repeated:
                        getattr(self, f.name).append(child)
                    else:
                        setattr(self, f.name, child)
                else:
                    value = payload.decode("utf-8") if f.type == TYPE_STRING \
                        else bytes(payload)
                    if f.is_repeated:
                        getattr(self, f.name).append(value)
                    else:
                        setattr(self, f.name, value)
            elif f.type in _VARINT_TYPES and wt == 2 and f.is_repeated:
                # packed repeated varints (proto3 default for senders)
                n, pos = read_varint(buf, pos)
                end = pos + n
                container = getattr(self, f.name)
                while pos < end:
                    raw, pos = read_varint(buf, pos)
                    if f.type in _SIGNED_TYPES and raw >= 1 << 63:
                        raw -= 1 << 64
                    container.append(bool(raw) if f.type == TYPE_BOOL else raw)
            else:
                pos = _skip_field(buf, pos, wt)

    def __repr__(self) -> str:
        body = ", ".join(f"{k}={v!r}" for k, v in self._values.items()
                         if k in self._present)
        return f"{self.DESCRIPTOR.name}({body})"

    def __eq__(self, other) -> bool:
        return (isinstance(other, MiniMessage)
                and self.DESCRIPTOR is other.DESCRIPTOR
                and self.SerializeToString() == other.SerializeToString())


def build_message_class(desc: MessageDesc) -> type:
    cls = type(desc.name, (MiniMessage,), {"DESCRIPTOR": desc})
    desc._concrete_class = cls
    return cls
