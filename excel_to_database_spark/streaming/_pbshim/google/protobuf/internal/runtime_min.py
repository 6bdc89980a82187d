"""Minimal pure-Python protobuf runtime — clean-room, from the public
wire-format specification (protobuf.dev/programming-guides/encoding) and
the public ``descriptor.proto`` schema.

Scope: exactly what protoc-generated ``*_pb2`` modules need to
round-trip proto3 messages whose fields are scalars, strings, bytes,
enums, oneofs, and (repeated) sub-messages — the shape of Spark's
``StateMessage.proto`` state-server protocol. Not implemented: groups,
maps-as-fields, extensions, unknown-field retention, text format,
JSON, reflection beyond attribute access.

Why this exists: ``transformWithStateInPandas`` needs the
``google.protobuf`` runtime in the PYTHON WORKER to speak the typed
state protocol, and this container cannot pip-install. The shim is
shipped to workers with ``SparkContext.addPyFile`` (see
``streaming.tws.ensure_protobuf``); on any system with the real
protobuf installed, the shim never activates.
"""

from __future__ import annotations

import struct

# --- field types (public descriptor.proto FieldDescriptorProto.Type) ---
T_DOUBLE, T_FLOAT, T_INT64, T_UINT64, T_INT32 = 1, 2, 3, 4, 5
T_FIXED64, T_FIXED32, T_BOOL, T_STRING, T_GROUP = 6, 7, 8, 9, 10
T_MESSAGE, T_BYTES, T_UINT32, T_ENUM = 11, 12, 13, 14
T_SFIXED32, T_SFIXED64, T_SINT32, T_SINT64 = 15, 16, 17, 18

LABEL_REPEATED = 3

_VARINT_TYPES = {
    T_INT64, T_UINT64, T_INT32, T_BOOL, T_UINT32, T_ENUM, T_SINT32, T_SINT64
}
_FIXED64_TYPES = {T_DOUBLE, T_FIXED64, T_SFIXED64}
_FIXED32_TYPES = {T_FLOAT, T_FIXED32, T_SFIXED32}
_LEN_TYPES = {T_STRING, T_BYTES, T_MESSAGE}

_MASK64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------


def _enc_varint(out: bytearray, value: int) -> None:
    value &= _MASK64
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _dec_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & _MASK64, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def _skip(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _dec_varint(buf, pos)
    elif wire == 1:
        pos += 8
    elif wire == 2:
        n, pos = _dec_varint(buf, pos)
        pos += n
    elif wire == 5:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire}")
    return pos


# ---------------------------------------------------------------------------
# descriptors (plain attribute objects; generated code pokes
# _serialized_start/_loaded_options onto them, so keep them open)
# ---------------------------------------------------------------------------


class FieldDescriptor:
    def __init__(self, name, number, ftype, label, type_name="", oneof_index=None):
        self.name = name
        self.number = number
        self.type = ftype
        self.label = label
        self.type_name = type_name  # ".pkg.Message" for message/enum fields
        self.oneof_index = oneof_index
        self.message_type = None  # resolved Descriptor for T_MESSAGE
        self.enum_type = None

    @property
    def is_repeated(self):
        return self.label == LABEL_REPEATED

    def default(self):
        if self.is_repeated:
            return []
        if self.type in (T_STRING,):
            return ""
        if self.type in (T_BYTES,):
            return b""
        if self.type == T_BOOL:
            return False
        if self.type in (T_DOUBLE, T_FLOAT):
            return 0.0
        if self.type == T_MESSAGE:
            return None
        return 0


class EnumDescriptor:
    def __init__(self, name, values):
        self.name = name
        self.full_name = name
        self.values = values  # list[(name, number)]
        self.values_by_name = {n: v for n, v in values}


class Descriptor:
    def __init__(self, name, full_name, fields, nested_types, enum_types, oneofs):
        self.name = name
        self.full_name = full_name
        self.fields = fields
        self.fields_by_name = {f.name: f for f in fields}
        self.fields_by_number = {f.number: f for f in fields}
        self.nested_types = nested_types
        self.enum_types = enum_types
        self.oneofs = oneofs  # list[str]


class FileDescriptor:
    def __init__(self, name, package, message_types, enum_types):
        self.name = name
        self.package = package
        self.message_types_by_name = {m.name: m for m in message_types}
        self.enum_types_by_name = {e.name: e for e in enum_types}


# ---------------------------------------------------------------------------
# FileDescriptorProto parser (schema: public descriptor.proto)
# ---------------------------------------------------------------------------


def _parse_fields(buf: bytes):
    """Yield (field_number, wire_type, value) with length-delimited
    payloads returned as raw bytes and varints as unsigned ints."""
    pos = 0
    while pos < len(buf):
        tag, pos = _dec_varint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _dec_varint(buf, pos)
        elif wire == 2:
            n, pos = _dec_varint(buf, pos)
            val = buf[pos : pos + n]
            pos += n
        elif wire == 1:
            val = buf[pos : pos + 8]
            pos += 8
        elif wire == 5:
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"wire type {wire}")
        yield num, wire, val


def _parse_field_desc(buf: bytes) -> FieldDescriptor:
    name = ""
    number = 0
    ftype = 0
    label = 1
    type_name = ""
    oneof_index = None
    for num, _w, val in _parse_fields(buf):
        if num == 1:
            name = val.decode("utf-8")
        elif num == 3:
            number = val
        elif num == 4:
            label = val
        elif num == 5:
            ftype = val
        elif num == 6:
            type_name = val.decode("utf-8")
        elif num == 9:
            oneof_index = val
    return FieldDescriptor(name, number, ftype, label, type_name, oneof_index)


def _parse_enum_desc(buf: bytes) -> EnumDescriptor:
    name = ""
    values = []
    for num, _w, val in _parse_fields(buf):
        if num == 1:
            name = val.decode("utf-8")
        elif num == 2:
            vname, vnum = "", 0
            for n2, _w2, v2 in _parse_fields(val):
                if n2 == 1:
                    vname = v2.decode("utf-8")
                elif n2 == 2:
                    vnum = v2
            values.append((vname, vnum))
    return EnumDescriptor(name, values)


def _parse_message_desc(buf: bytes, prefix: str) -> Descriptor:
    name = ""
    fields = []
    nested = []
    enums = []
    oneofs = []
    raw_nested = []
    for num, _w, val in _parse_fields(buf):
        if num == 1:
            name = val.decode("utf-8")
        elif num == 2:
            fields.append(_parse_field_desc(val))
        elif num == 3:
            raw_nested.append(val)
        elif num == 4:
            enums.append(_parse_enum_desc(val))
        elif num == 8:  # oneof_decl
            oname = ""
            for n2, _w2, v2 in _parse_fields(val):
                if n2 == 1:
                    oname = v2.decode("utf-8")
            oneofs.append(oname)
    full = f"{prefix}.{name}" if prefix else name
    nested = [_parse_message_desc(b, full) for b in raw_nested]
    return Descriptor(name, full, fields, nested, enums, oneofs)


def parse_file_descriptor(blob: bytes) -> FileDescriptor:
    fname = ""
    package = ""
    raw_msgs = []
    enums = []
    for num, _w, val in _parse_fields(blob):
        if num == 1:
            fname = val.decode("utf-8")
        elif num == 2:
            package = val.decode("utf-8")
        elif num == 4:
            raw_msgs.append(val)
        elif num == 5:
            enums.append(_parse_enum_desc(val))
    msgs = [_parse_message_desc(b, package) for b in raw_msgs]
    fd = FileDescriptor(fname, package, msgs, enums)
    # resolve message/enum type references now that the tree exists
    index: dict[str, Descriptor] = {}
    eindex: dict[str, EnumDescriptor] = {}

    def walk(d: Descriptor):
        index[d.full_name] = d
        for e in d.enum_types:
            eindex[f"{d.full_name}.{e.name}"] = e
        for n in d.nested_types:
            walk(n)

    for m in msgs:
        walk(m)
    for e in enums:
        eindex[f"{package}.{e.name}" if package else e.name] = e

    def resolve(d: Descriptor):
        for f in d.fields:
            key = f.type_name.lstrip(".")
            if f.type == T_MESSAGE:
                f.message_type = index[key]
            elif f.type == T_ENUM:
                f.enum_type = eindex.get(key)
        for n in d.nested_types:
            resolve(n)

    for m in msgs:
        resolve(m)
    return fd


# ---------------------------------------------------------------------------
# dynamic messages
# ---------------------------------------------------------------------------


class _NotifyingList(list):
    """Repeated-field container that cascades set-tracking to lazily
    vivified ancestor messages on CONTENT mutation (append through a
    chain of unset sub-messages must surface on the wire, exactly like
    a scalar write)."""

    def __init__(self, owner, items=()):
        super().__init__(items)
        self._owner = owner

    def _note(self):
        self._owner._notify_set()

    def append(self, item):
        super().append(item)
        self._note()

    def extend(self, items):
        super().extend(items)
        self._note()

    def insert(self, i, item):
        super().insert(i, item)
        self._note()

    def __setitem__(self, i, item):
        super().__setitem__(i, item)
        self._note()

    def __iadd__(self, items):
        super().extend(items)
        self._note()
        return self


class Message:
    """Base of all shim messages: explicit set-tracking (``_values``),
    canonical field-number serialization order, proto3 parse
    semantics (unknown fields skipped, packed repeated accepted)."""

    DESCRIPTOR: Descriptor = None

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        for k, v in kwargs.items():
            if v is None:
                continue
            setattr(self, k, v)

    # -- attribute surface ------------------------------------------------
    def __getattr__(self, name):
        d = type(self).DESCRIPTOR
        f = d.fields_by_name.get(name) if d else None
        if f is None:
            raise AttributeError(name)
        vals = object.__getattribute__(self, "_values")
        if f.number in vals:
            return vals[f.number]
        if f.is_repeated:
            # empty list ≡ absent on the wire, so caching it in
            # _values is presence-neutral; the notifying list makes a
            # later in-place append cascade set-tracking up the chain
            return vals.setdefault(f.number, _NotifyingList(self))
        if f.type == T_MESSAGE:
            # lazy vivification matching real protobuf mutation
            # semantics: the sub-message created on first access is
            # CACHED and carries a parent link, so the common idioms
            # ``msg.sub.field = x`` / ``msg.sub.CopyFrom(...)`` mutate
            # state serialization will see (a fresh unattached
            # instance here would silently drop such writes) — but a
            # mere READ does not mark presence: _values (what
            # HasField/WhichOneof/SerializeToString consult) is only
            # updated when the child is actually written, via
            # ``_notify_set`` cascading up the parent chain.
            lazy = self.__dict__.setdefault("_lazy", {})
            if f.number not in lazy:
                inst = _class_for(f.message_type)()
                inst.__dict__["_pl"] = (self, f.number)
                lazy[f.number] = inst
            return lazy[f.number]
        return f.default()

    def _notify_set(self):
        """A write happened to this message: if it is a lazily
        vivified child not yet in its parent's _values, attach it
        (and recurse — the write may need to surface through several
        lazy ancestors)."""
        pl = self.__dict__.get("_pl")
        if pl is None:
            return
        parent, num = pl
        pv = object.__getattribute__(parent, "_values")
        if pv.get(num) is not self:
            pv[num] = self
            parent._notify_set()

    def __setattr__(self, name, value):
        d = type(self).DESCRIPTOR
        f = d.fields_by_name.get(name) if d else None
        if f is None:
            raise AttributeError(f"{d.name if d else type(self)} has no field {name}")
        if f.is_repeated and not isinstance(value, list):
            value = list(value)
        self._values[f.number] = value
        self._notify_set()

    def HasField(self, name):  # noqa: N802 (protobuf API casing)
        f = type(self).DESCRIPTOR.fields_by_name[name]
        return f.number in self._values

    def WhichOneof(self, oneof_name):  # noqa: N802
        d = type(self).DESCRIPTOR
        for f in d.fields:
            if (
                f.oneof_index is not None
                and f.oneof_index < len(d.oneofs)
                and d.oneofs[f.oneof_index] == oneof_name
                and f.number in self._values
            ):
                return f.name
        return None

    def CopyFrom(self, other):  # noqa: N802
        self._values.clear()
        self.ParseFromString(other.SerializeToString())
        self._notify_set()

    # -- serialization ----------------------------------------------------
    def SerializeToString(self) -> bytes:  # noqa: N802
        out = bytearray()
        for f in sorted(type(self).DESCRIPTOR.fields, key=lambda x: x.number):
            if f.number not in self._values:
                continue
            val = self._values[f.number]
            if f.is_repeated:
                for item in val:
                    _enc_field(out, f, item)
            else:
                _enc_field(out, f, val)
        return bytes(out)

    def ParseFromString(self, data: bytes) -> int:  # noqa: N802
        self._values.clear()
        # detach previously vivified children: their state belongs to
        # the pre-parse value, and a held reference mutated later must
        # not resurface inside the freshly parsed message
        lazy = self.__dict__.get("_lazy")
        if lazy:
            for child in lazy.values():
                child.__dict__.pop("_pl", None)
            lazy.clear()
        self._merge(bytes(data))
        self._notify_set()
        return len(data)

    def _merge(self, buf: bytes) -> None:
        d = type(self).DESCRIPTOR
        pos = 0
        while pos < len(buf):
            tag, pos = _dec_varint(buf, pos)
            num, wire = tag >> 3, tag & 7
            f = d.fields_by_number.get(num)
            if f is None:
                pos = _skip(buf, pos, wire)
                continue
            if f.type in _LEN_TYPES or (f.is_repeated and wire == 2 and f.type in _VARINT_TYPES | _FIXED32_TYPES | _FIXED64_TYPES):
                n, pos = _dec_varint(buf, pos)
                payload = buf[pos : pos + n]
                pos += n
                if f.type == T_MESSAGE:
                    sub = _class_for(f.message_type)()
                    sub._merge(payload)
                    val = sub
                elif f.type == T_STRING:
                    val = payload.decode("utf-8")
                elif f.type == T_BYTES:
                    val = bytes(payload)
                else:  # packed repeated numerics
                    vals = []
                    p2 = 0
                    while p2 < len(payload):
                        v, p2 = _dec_scalar(payload, p2, f)
                        vals.append(v)
                    self._values.setdefault(num, []).extend(vals)
                    continue
            else:
                val, pos = _dec_scalar(buf, pos, f, wire)
            if f.is_repeated:
                self._values.setdefault(num, []).append(val)
            else:
                self._values[num] = val

    def __repr__(self):
        d = type(self).DESCRIPTOR
        body = ", ".join(
            f"{d.fields_by_number[n].name}={v!r}" for n, v in sorted(self._values.items())
        )
        return f"{d.name}({body})"

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.SerializeToString() == other.SerializeToString()
        )


def _enc_field(out: bytearray, f: FieldDescriptor, val) -> None:
    num = f.number
    if f.type in _VARINT_TYPES:
        _enc_varint(out, num << 3 | 0)
        if f.type in (T_SINT32, T_SINT64):
            _enc_varint(out, _zigzag_enc(int(val)))
        else:
            _enc_varint(out, int(val))
    elif f.type in _FIXED64_TYPES:
        _enc_varint(out, num << 3 | 1)
        out += struct.pack(
            "<d" if f.type == T_DOUBLE else "<q" if f.type == T_SFIXED64 else "<Q",
            val,
        )
    elif f.type in _FIXED32_TYPES:
        _enc_varint(out, num << 3 | 5)
        out += struct.pack(
            "<f" if f.type == T_FLOAT else "<i" if f.type == T_SFIXED32 else "<I",
            val,
        )
    elif f.type == T_STRING:
        payload = val.encode("utf-8")
        _enc_varint(out, num << 3 | 2)
        _enc_varint(out, len(payload))
        out += payload
    elif f.type == T_BYTES:
        payload = bytes(val)
        _enc_varint(out, num << 3 | 2)
        _enc_varint(out, len(payload))
        out += payload
    elif f.type == T_MESSAGE:
        payload = val.SerializeToString()
        _enc_varint(out, num << 3 | 2)
        _enc_varint(out, len(payload))
        out += payload
    else:
        raise ValueError(f"unsupported field type {f.type}")


def _dec_scalar(buf: bytes, pos: int, f: FieldDescriptor, wire: int | None = None):
    if f.type in _VARINT_TYPES:
        v, pos = _dec_varint(buf, pos)
        if f.type in (T_SINT32, T_SINT64):
            return _zigzag_dec(v), pos
        if f.type == T_BOOL:
            return bool(v), pos
        if f.type in (T_INT32, T_INT64, T_ENUM):
            return _signed(v), pos
        return v, pos
    if f.type in _FIXED64_TYPES:
        fmt = "<d" if f.type == T_DOUBLE else "<q" if f.type == T_SFIXED64 else "<Q"
        return struct.unpack_from(fmt, buf, pos)[0], pos + 8
    if f.type in _FIXED32_TYPES:
        fmt = "<f" if f.type == T_FLOAT else "<i" if f.type == T_SFIXED32 else "<I"
        return struct.unpack_from(fmt, buf, pos)[0], pos + 4
    raise ValueError(f"scalar decode for type {f.type}")


_CLASS_CACHE: dict[int, type] = {}


def _class_for(desc: Descriptor) -> type:
    cls = _CLASS_CACHE.get(id(desc))
    if cls is None:
        cls = type(desc.name, (Message,), {"DESCRIPTOR": desc})
        _CLASS_CACHE[id(desc)] = cls
        for nested in desc.nested_types:
            setattr(cls, nested.name, _class_for(nested))
        for e in desc.enum_types:
            for vname, vnum in e.values:
                setattr(cls, vname, vnum)
    return cls


def build_message_classes(fd: FileDescriptor, target: dict) -> None:
    """The ``_builder.BuildTopDescriptorsAndMessages`` contract: inject
    message classes and top-level enum value constants into the
    generated module's globals."""
    for m in fd.message_types_by_name.values():
        target[m.name] = _class_for(m)
    for e in fd.enum_types_by_name.values():
        target[e.name] = e
        for vname, vnum in e.values:
            target[vname] = vnum


def build_descriptor_globals(fd: FileDescriptor, target: dict) -> None:
    """The ``_builder.BuildMessageAndEnumDescriptors`` contract: inject
    ``_UPPERCASED`` descriptor objects (generated modules assign
    ``_serialized_start/_end`` onto them)."""

    def walk(d: Descriptor, path: str):
        target[f"_{path.upper()}"] = d
        for e in d.enum_types:
            target[f"_{path.upper()}_{e.name.upper()}"] = e
        for n in d.nested_types:
            walk(n, f"{path}_{n.name}")

    for m in fd.message_types_by_name.values():
        walk(m, m.name)
    for e in fd.enum_types_by_name.values():
        target[f"_{e.name.upper()}"] = e
