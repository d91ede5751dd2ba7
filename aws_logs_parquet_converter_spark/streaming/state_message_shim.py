"""Wire-compatible stand-in for ``pyspark.sql.streaming.proto.StateMessage_pb2``.

The ``transformWithStateInPandas`` Python client speaks a protobuf protocol
to the JVM state server, and pyspark's generated module needs the
``google.protobuf`` runtime — absent in some environments (this container).
The messages themselves are tiny (7 field types, ~45 message classes, no
maps/groups/extensions), and the Python client uses only the narrow API
surface ``Msg(**kwargs)`` / ``SerializeToString()`` / ``ParseFromString()``
/ attribute reads / module-level enum constants (verified by grep over
``stateful_processor_api_client.py`` and the value/list/map state clients).

So instead of vendoring the full protobuf runtime, this module:

1. reads the serialized ``FileDescriptorProto`` blob out of the installed
   pyspark's generated ``StateMessage_pb2.py`` (keeping field numbers
   version-locked to the running pyspark with zero copied code — the blob
   is data, parsed with a ~60-line bootstrap wire parser below);
2. synthesizes plain-Python message classes implementing exactly that API
   with correct proto3 wire semantics (varint zig-zag-free int32/int64 with
   64-bit sign extension, length-delimited strings/bytes/submessages,
   explicit-presence serialization so oneof cases survive, repeated
   fields, unknown-field skip on parse);
3. installs the synthesized module under the pb2 name in ``sys.modules``
   ONLY when the real one is unimportable.

The wire format and descriptor.proto field numbers are public, stable
protobuf specification facts. The JVM side runs the real protobuf-java, so
every byte this shim emits is validated by a conformant parser on every
exchange — and the e2e gate (``stream_tws_user_counts``) compares final
state against the batch answer under the DuckDB oracle.
"""

from __future__ import annotations

import ast
import re
import sys
import types

_PB2_NAME = "pyspark.sql.streaming.proto.StateMessage_pb2"

# descriptor.proto field numbers (public, frozen by protobuf compatibility)
_FILE_PACKAGE, _FILE_MESSAGE, _FILE_ENUM = 2, 4, 5
_MSG_NAME, _MSG_FIELD, _MSG_NESTED, _MSG_ENUM, _MSG_ONEOF = 1, 2, 3, 4, 8
_FLD_NAME, _FLD_NUMBER, _FLD_LABEL, _FLD_TYPE, _FLD_TYPE_NAME, _FLD_ONEOF = 1, 3, 4, 5, 6, 9
_ENUM_NAME, _ENUM_VALUE = 1, 2
_EV_NAME, _EV_NUMBER = 1, 2
_LABEL_REPEATED = 3
# FieldDescriptorProto.Type values we support (all that StateMessage uses)
_T_INT64, _T_INT32, _T_BOOL, _T_STRING, _T_MESSAGE, _T_BYTES, _T_ENUM = 3, 5, 8, 9, 11, 12, 14
_VARINT_TYPES = {_T_INT64, _T_INT32, _T_BOOL, _T_ENUM}
_LEN_TYPES = {_T_STRING, _T_BYTES, _T_MESSAGE}


# ---------------------------------------------------------------------------
# Bootstrap wire parser (enough to read FileDescriptorProto)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _wire_fields(buf: bytes):
    """Yield (field_number, wire_type, raw_value) triples; skips cleanly over
    every wire type so unknown fields never desync the stream."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == 0:
            val, i = _read_varint(buf, i)
        elif wtype == 2:
            ln, i = _read_varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wtype == 5:
            val = buf[i : i + 4]
            i += 4
        elif wtype == 1:
            val = buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


# ---------------------------------------------------------------------------
# Descriptor model
# ---------------------------------------------------------------------------


class _Field:
    __slots__ = ("name", "number", "type", "repeated", "type_name", "in_oneof")

    def __init__(self, name, number, ftype, repeated, type_name, in_oneof):
        self.name = name
        self.number = number
        self.type = ftype
        self.repeated = repeated
        self.type_name = type_name  # fully-qualified for message/enum fields
        self.in_oneof = in_oneof


def _parse_field(buf: bytes) -> _Field:
    name = type_name = None
    number = ftype = label = 0
    in_oneof = False
    for fnum, _w, val in _wire_fields(buf):
        if fnum == _FLD_NAME:
            name = val.decode()
        elif fnum == _FLD_NUMBER:
            number = val
        elif fnum == _FLD_LABEL:
            label = val
        elif fnum == _FLD_TYPE:
            ftype = val
        elif fnum == _FLD_TYPE_NAME:
            type_name = val.decode()
        elif fnum == _FLD_ONEOF:
            in_oneof = True
    return _Field(name, number, ftype, label == _LABEL_REPEATED, type_name, in_oneof)


def _parse_enum(buf: bytes) -> tuple[str, dict[str, int]]:
    name = None
    values: dict[str, int] = {}
    for fnum, _w, val in _wire_fields(buf):
        if fnum == _ENUM_NAME:
            name = val.decode()
        elif fnum == _ENUM_VALUE:
            ev_name, ev_num = None, 0
            for f2, _w2, v2 in _wire_fields(val):
                if f2 == _EV_NAME:
                    ev_name = v2.decode()
                elif f2 == _EV_NUMBER:
                    ev_num = v2
            values[ev_name] = ev_num
    return name, values


def _parse_message(buf: bytes, prefix: str, out_msgs: dict, out_enums: dict) -> None:
    name = None
    fields: list[_Field] = []
    nested: list[bytes] = []
    enums: list[bytes] = []
    for fnum, _w, val in _wire_fields(buf):
        if fnum == _MSG_NAME:
            name = val.decode()
        elif fnum == _MSG_FIELD:
            fields.append(_parse_field(val))
        elif fnum == _MSG_NESTED:
            nested.append(val)
        elif fnum == _MSG_ENUM:
            enums.append(val)
    full = f"{prefix}.{name}"
    out_msgs[full] = fields
    for nb in nested:
        _parse_message(nb, full, out_msgs, out_enums)
    for eb in enums:
        en, ev = _parse_enum(eb)
        out_enums[f"{full}.{en}"] = ev


def _load_descriptor() -> tuple[str, dict, dict]:
    """(package, {fqname: [fields]}, {fq_enum_name: {name: number}}) from the
    serialized FileDescriptorProto embedded in pyspark's generated module."""
    # zip-aware read: worker processes often run pyspark from a zipimport
    # (e.g. .../pyspark.zip), where plain open() on __file__ paths fails
    import pkgutil

    raw = pkgutil.get_data("pyspark.sql.streaming.proto", "StateMessage_pb2.py")
    if raw is None:
        raise ImportError("could not read StateMessage_pb2.py from the pyspark package")
    src = raw.decode("utf-8")
    m = re.search(r"AddSerializedFile\(\s*(b(?:'''|\"\"\"|'|\").*?)\s*\)\s*\n", src, re.S)
    if not m:
        raise ImportError("could not locate serialized descriptor in StateMessage_pb2.py")
    blob = ast.literal_eval(m.group(1))
    package = ""
    msgs: dict[str, list[_Field]] = {}
    enums: dict[str, dict[str, int]] = {}
    top_msgs: list[bytes] = []
    top_enums: list[bytes] = []
    for fnum, _w, val in _wire_fields(blob):
        if fnum == _FILE_PACKAGE:
            package = val.decode()
        elif fnum == _FILE_MESSAGE:
            top_msgs.append(val)
        elif fnum == _FILE_ENUM:
            top_enums.append(val)
    prefix = f".{package}" if package else ""
    for mb in top_msgs:
        _parse_message(mb, prefix, msgs, enums)
    for eb in top_enums:
        en, ev = _parse_enum(eb)
        enums[f"{prefix}.{en}"] = ev
    return package, msgs, enums


# ---------------------------------------------------------------------------
# Message runtime
# ---------------------------------------------------------------------------


def _encode_varint(out: bytearray, value: int) -> None:
    if value < 0:
        value += 1 << 64  # proto int32/int64 negatives: 64-bit two's complement
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _decode_signed(value: int) -> int:
    return value - (1 << 64) if value >= 1 << 63 else value


class _ShimMessage:
    """proto3 message with explicit-presence tracking.

    Any field passed to the constructor or assigned is serialized even at
    its default value — required for oneof members (the JVM dispatches on
    which case is present) and harmless for plain proto3 fields.
    """

    _fields_by_name: dict[str, _Field] = {}
    _fields_by_number: dict[int, _Field] = {}
    _registry: dict[str, type] = {}

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __setattr__(self, name, value):
        spec = self._fields_by_name.get(name)
        if spec is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        if value is None:
            self._values.pop(name, None)
            return
        if spec.repeated and not isinstance(value, list):
            value = list(value)
        self._values[name] = value

    def __getattr__(self, name):
        # fields live in _values, never in __dict__, so every field read
        # lands here: explicit value first, proto3 default otherwise
        spec = type(self)._fields_by_name.get(name)
        if spec is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        values = object.__getattribute__(self, "_values")
        if name in values:
            return values[name]
        if spec.repeated:
            return values.setdefault(name, [])
        if spec.type == _T_MESSAGE:
            return self._registry[spec.type_name]()  # default (unset) instance
        return {_T_STRING: "", _T_BYTES: b"", _T_BOOL: False}.get(spec.type, 0)

    def SerializeToString(self) -> bytes:
        out = bytearray()
        for spec in sorted(self._fields_by_name.values(), key=lambda s: s.number):
            if spec.name not in self._values:
                continue
            value = self._values[spec.name]
            items = value if spec.repeated else [value]
            for item in items:
                if spec.type in _VARINT_TYPES:
                    _encode_varint(out, spec.number << 3 | 0)
                    _encode_varint(out, int(item))
                elif spec.type == _T_STRING:
                    data = item.encode("utf-8")
                    _encode_varint(out, spec.number << 3 | 2)
                    _encode_varint(out, len(data))
                    out += data
                elif spec.type == _T_BYTES:
                    data = bytes(item)
                    _encode_varint(out, spec.number << 3 | 2)
                    _encode_varint(out, len(data))
                    out += data
                elif spec.type == _T_MESSAGE:
                    data = item.SerializeToString()
                    _encode_varint(out, spec.number << 3 | 2)
                    _encode_varint(out, len(data))
                    out += data
                else:  # pragma: no cover - schema uses no other types
                    raise TypeError(f"unsupported field type {spec.type}")
        return bytes(out)

    def ParseFromString(self, data: bytes) -> int:
        self._values.clear()
        for fnum, wtype, raw in _wire_fields(data):
            spec = self._fields_by_number.get(fnum)
            if spec is None:
                continue  # unknown field: skipped by _wire_fields framing
            if spec.type in _VARINT_TYPES and wtype == 0:
                val = _decode_signed(raw)
                if spec.type == _T_BOOL:
                    val = bool(val)
            elif spec.type == _T_STRING and wtype == 2:
                val = raw.decode("utf-8")
            elif spec.type == _T_BYTES and wtype == 2:
                val = bytes(raw)
            elif spec.type == _T_MESSAGE and wtype == 2:
                val = self._registry[spec.type_name]()
                val.ParseFromString(raw)
            else:
                continue  # wire/schema mismatch: ignore like an unknown field
            if spec.repeated:
                self._values.setdefault(spec.name, []).append(val)
            else:
                self._values[spec.name] = val
        return len(data)

    def __repr__(self):  # debugging aid only
        inner = ", ".join(f"{k}={v!r}" for k, v in self._values.items())
        return f"{type(self).__name__}({inner})"


def _build_module() -> types.ModuleType:
    package, msgs, enums = _load_descriptor()
    mod = types.ModuleType(_PB2_NAME)
    mod.__doc__ = "synthesized wire-compatible StateMessage_pb2 (protobuf runtime absent)"
    registry: dict[str, type] = {}
    for fqname, fields in msgs.items():
        cls = type(
            fqname.rsplit(".", 1)[-1],
            (_ShimMessage,),
            {
                "_fields_by_name": {f.name: f for f in fields},
                "_fields_by_number": {f.number: f for f in fields},
                "_registry": registry,
                "DESCRIPTOR": None,  # sentinel; no descriptor API provided
            },
        )
        registry[fqname] = cls
        setattr(mod, cls.__name__, cls)
    for fq_enum, values in enums.items():
        enum_ns = types.SimpleNamespace(**values)
        setattr(mod, fq_enum.rsplit(".", 1)[-1], enum_ns)
        for name, number in values.items():
            # pb2 modules export top-level enum VALUES at module scope
            setattr(mod, name, number)
    return mod


def ensure_installed() -> str:
    """Make ``import pyspark.sql.streaming.proto.StateMessage_pb2`` work.

    Returns 'native' when the real generated module imports (protobuf runtime
    present), 'shim' when the synthesized module was (or already is)
    installed. Raises ImportError only if neither path is possible.
    """
    if _PB2_NAME in sys.modules:
        return "shim" if isinstance(sys.modules[_PB2_NAME], types.ModuleType) and getattr(
            sys.modules[_PB2_NAME], "__doc__", ""
        ).startswith("synthesized") else "native"
    try:
        import importlib

        importlib.import_module(_PB2_NAME)
        return "native"
    except ImportError:
        pass
    mod = _build_module()
    sys.modules[_PB2_NAME] = mod
    import pyspark.sql.streaming.proto as proto_pkg

    setattr(proto_pkg, "StateMessage_pb2", mod)
    return "shim"
