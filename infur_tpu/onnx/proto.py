"""Protobuf wire-format codec for the ONNX schema subset.

No ``onnx`` package (and no network to fetch ``onnx.proto``) exists in this
environment, so the framework carries its own minimal protobuf implementation:
a generic varint/length-delimited wire codec plus declarative message classes
for the parts of the ONNX schema a vision-model importer needs.  Field
numbers follow the public onnx.proto3 schema (onnx/onnx.proto, Apache-2.0).

Wire format essentials (protobuf encoding spec):
  key = (field_number << 3) | wire_type
  wire types: 0 = varint, 1 = fixed64, 2 = length-delimited, 5 = fixed32
  repeated scalars may arrive packed (wire type 2) or unpacked; we accept
  both and always write packed.
"""

from __future__ import annotations

import struct
from typing import Any, BinaryIO

import numpy as np

# ---------------------------------------------------------------------------
# Generic wire codec
# ---------------------------------------------------------------------------

_VARINT = 0
_FIXED64 = 1
_LEN = 2
_FIXED32 = 5


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        value &= (1 << 64) - 1  # two's-complement 64-bit, like protobuf int64
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _signed64(v: int) -> int:
    """Interpret an unsigned varint as two's-complement int64."""
    return v - (1 << 64) if v >= (1 << 63) else v


# Scalar kinds: (wire_type, decode(raw)->py, encode(out, py))
_SCALARS: dict[str, Any] = {
    "int64": (_VARINT, _signed64, _write_varint),
    "int32": (_VARINT, lambda v: _signed64(v), _write_varint),
    "uint64": (_VARINT, lambda v: v, _write_varint),
    "bool": (_VARINT, lambda v: bool(v), lambda o, v: _write_varint(o, int(v))),
    "enum": (_VARINT, lambda v: v, _write_varint),
    "float": (_FIXED32, None, None),   # handled specially
    "double": (_FIXED64, None, None),  # handled specially
    "bytes": (_LEN, bytes, None),
    "string": (_LEN, lambda b: b.decode("utf-8", "replace"), None),
}


class Field:
    __slots__ = ("num", "name", "kind", "repeated")

    def __init__(self, num: int, name: str, kind: Any, repeated: bool = False):
        self.num, self.name, self.kind, self.repeated = num, name, kind, repeated


class Message:
    """Base for declarative protobuf messages.

    Subclasses set ``FIELDS: list[Field]``.  Unknown fields are skipped on
    decode (forward compatibility) and never produced on encode.
    """

    FIELDS: list[Field] = []
    _BY_NUM: dict[int, Field]

    def __init_subclass__(cls) -> None:
        cls._BY_NUM = {f.num: f for f in cls.FIELDS}

    def __init__(self, **kwargs: Any):
        for f in self.FIELDS:
            setattr(self, f.name, [] if f.repeated else None)
        for k, v in kwargs.items():
            if k not in {f.name for f in self.FIELDS}:
                raise TypeError(f"{type(self).__name__} has no field {k!r}")
            setattr(self, k, v)

    # -- decode -------------------------------------------------------------

    @classmethod
    def decode(cls, data: bytes | memoryview) -> "Message":
        msg = cls()
        buf = memoryview(data)
        pos = 0
        end = len(buf)
        while pos < end:
            key, pos = _read_varint(buf, pos)
            fnum, wtype = key >> 3, key & 7
            field = cls._BY_NUM.get(fnum)
            if field is None:
                pos = _skip(buf, pos, wtype)
                continue
            pos = msg._decode_field(field, buf, pos, wtype)
        return msg

    def _decode_field(self, f: Field, buf: memoryview, pos: int, wtype: int) -> int:
        kind = f.kind
        if isinstance(kind, type) and issubclass(kind, Message):
            assert wtype == _LEN
            ln, pos = _read_varint(buf, pos)
            sub = kind.decode(buf[pos:pos + ln])
            self._store(f, sub)
            return pos + ln
        if kind == "float":
            if wtype == _LEN:  # packed
                ln, pos = _read_varint(buf, pos)
                vals = np.frombuffer(buf[pos:pos + ln], "<f4").tolist()
                getattr(self, f.name).extend(vals)
                return pos + ln
            (v,) = struct.unpack_from("<f", buf, pos)
            self._store(f, v)
            return pos + 4
        if kind == "double":
            if wtype == _LEN:
                ln, pos = _read_varint(buf, pos)
                vals = np.frombuffer(buf[pos:pos + ln], "<f8").tolist()
                getattr(self, f.name).extend(vals)
                return pos + ln
            (v,) = struct.unpack_from("<d", buf, pos)
            self._store(f, v)
            return pos + 8
        if kind in ("bytes", "string"):
            ln, pos = _read_varint(buf, pos)
            raw = bytes(buf[pos:pos + ln])
            self._store(f, raw.decode("utf-8", "replace") if kind == "string" else raw)
            return pos + ln
        # varint scalar (possibly packed)
        decode = _SCALARS[kind][1]
        if wtype == _LEN and f.repeated:
            ln, pos = _read_varint(buf, pos)
            stop = pos + ln
            lst = getattr(self, f.name)
            while pos < stop:
                v, pos = _read_varint(buf, pos)
                lst.append(decode(v))
            return pos
        v, pos = _read_varint(buf, pos)
        self._store(f, decode(v))
        return pos

    def _store(self, f: Field, value: Any) -> None:
        if f.repeated:
            getattr(self, f.name).append(value)
        else:
            setattr(self, f.name, value)

    # -- encode -------------------------------------------------------------

    def encode(self) -> bytes:
        out = bytearray()
        for f in self.FIELDS:
            val = getattr(self, f.name)
            if val is None or (f.repeated and not val):
                continue
            self._encode_field(out, f, val)
        return bytes(out)

    def _encode_field(self, out: bytearray, f: Field, val: Any) -> None:
        kind = f.kind
        if isinstance(kind, type) and issubclass(kind, Message):
            for item in (val if f.repeated else [val]):
                body = item.encode()
                _write_varint(out, (f.num << 3) | _LEN)
                _write_varint(out, len(body))
                out.extend(body)
            return
        if kind in ("float", "double"):
            fmt, size = ("<f", 4) if kind == "float" else ("<d", 8)
            if f.repeated:  # packed
                _write_varint(out, (f.num << 3) | _LEN)
                _write_varint(out, size * len(val))
                for v in val:
                    out.extend(struct.pack(fmt, v))
            else:
                _write_varint(out, (f.num << 3) | (_FIXED32 if size == 4 else _FIXED64))
                out.extend(struct.pack(fmt, val))
            return
        if kind in ("bytes", "string"):
            for item in (val if f.repeated else [val]):
                raw = item.encode("utf-8") if isinstance(item, str) else bytes(item)
                _write_varint(out, (f.num << 3) | _LEN)
                _write_varint(out, len(raw))
                out.extend(raw)
            return
        # varint scalars
        enc = _SCALARS[kind][2]
        if f.repeated:  # packed
            body = bytearray()
            for v in val:
                enc(body, int(v))
            _write_varint(out, (f.num << 3) | _LEN)
            _write_varint(out, len(body))
            out.extend(body)
        else:
            _write_varint(out, (f.num << 3) | _VARINT)
            enc(out, int(val))

    def __repr__(self) -> str:
        parts = []
        for f in self.FIELDS:
            v = getattr(self, f.name)
            if v is None or (f.repeated and not v):
                continue
            s = f"[{len(v)} items]" if f.repeated and len(str(v)) > 60 else repr(v)
            parts.append(f"{f.name}={s}")
        return f"{type(self).__name__}({', '.join(parts)})"


def _skip(buf: memoryview, pos: int, wtype: int) -> int:
    if wtype == _VARINT:
        _, pos = _read_varint(buf, pos)
        return pos
    if wtype == _FIXED64:
        return pos + 8
    if wtype == _LEN:
        ln, pos = _read_varint(buf, pos)
        return pos + ln
    if wtype == _FIXED32:
        return pos + 4
    raise ValueError(f"cannot skip wire type {wtype}")


# ---------------------------------------------------------------------------
# ONNX schema subset (field numbers per public onnx.proto3)
# ---------------------------------------------------------------------------

class TensorProto(Message):
    # data_type enum values
    FLOAT, UINT8, INT8, UINT16, INT16, INT32, INT64 = 1, 2, 3, 4, 5, 6, 7
    STRING, BOOL, FLOAT16, DOUBLE, UINT32, UINT64 = 8, 9, 10, 11, 12, 13
    FIELDS = [
        Field(1, "dims", "int64", repeated=True),
        Field(2, "data_type", "int32"),
        Field(4, "float_data", "float", repeated=True),
        Field(5, "int32_data", "int32", repeated=True),
        Field(6, "string_data", "bytes", repeated=True),
        Field(7, "int64_data", "int64", repeated=True),
        Field(8, "name", "string"),
        Field(9, "raw_data", "bytes"),
        Field(10, "double_data", "double", repeated=True),
        Field(11, "uint64_data", "uint64", repeated=True),
        # decoded for presence detection only (payload stays on disk)
        Field(13, "external_data", "bytes", repeated=True),
        Field(14, "data_location", "enum"),
    ]


_DTYPE_MAP: dict[int, np.dtype] = {
    TensorProto.FLOAT: np.dtype("<f4"),
    TensorProto.UINT8: np.dtype("u1"),
    TensorProto.INT8: np.dtype("i1"),
    TensorProto.UINT16: np.dtype("<u2"),
    TensorProto.INT16: np.dtype("<i2"),
    TensorProto.INT32: np.dtype("<i4"),
    TensorProto.INT64: np.dtype("<i8"),
    TensorProto.BOOL: np.dtype("?"),
    TensorProto.FLOAT16: np.dtype("<f2"),
    TensorProto.DOUBLE: np.dtype("<f8"),
    TensorProto.UINT32: np.dtype("<u4"),
    TensorProto.UINT64: np.dtype("<u8"),
}
_DTYPE_TO_ONNX = {v: k for k, v in _DTYPE_MAP.items()}


def tensor_to_numpy(t: TensorProto) -> np.ndarray:
    dt = _DTYPE_MAP.get(t.data_type)
    if dt is None:
        raise ValueError(f"unsupported ONNX tensor dtype {t.data_type}")
    shape = tuple(t.dims)
    if t.raw_data:
        arr = np.frombuffer(t.raw_data, dt)
    elif t.float_data and t.data_type == TensorProto.FLOAT:
        arr = np.asarray(t.float_data, dt)
    elif t.double_data and t.data_type == TensorProto.DOUBLE:
        arr = np.asarray(t.double_data, dt)
    elif t.int64_data and t.data_type == TensorProto.INT64:
        arr = np.asarray(t.int64_data, dt)
    elif t.int32_data:  # int32 field also carries int8/16/bool/fp16 payloads
        if t.data_type == TensorProto.FLOAT16:
            arr = np.asarray(t.int32_data, np.uint16).view(np.float16)
        else:
            arr = np.asarray(t.int32_data, np.int64).astype(dt)
    elif t.uint64_data:
        arr = np.asarray(t.uint64_data, dt)
    elif t.external_data or t.data_location:
        raise ValueError(
            f"tensor {t.name!r} stores its payload in external data files, "
            "which this loader does not support — re-save the model with "
            "all tensors internal (onnx.external_data_helper)")
    elif shape and int(np.prod(shape)) > 0:
        raise ValueError(
            f"tensor {t.name!r} declares shape {shape} but carries no data")
    else:
        arr = np.zeros(int(np.prod(shape)) if shape else 0, dt)
    return arr.reshape(shape).copy()


def numpy_to_tensor(arr: np.ndarray, name: str = "") -> TensorProto:
    arr = np.asarray(arr)
    shape = arr.shape  # ascontiguousarray would flatten 0-d to 1-d
    arr = np.ascontiguousarray(arr).reshape(shape)
    key = arr.dtype.newbyteorder("<") if arr.dtype.byteorder == ">" else arr.dtype
    onnx_dt = _DTYPE_TO_ONNX.get(np.dtype(key))
    if onnx_dt is None:
        raise ValueError(f"unsupported numpy dtype {arr.dtype}")
    return TensorProto(dims=list(arr.shape), data_type=onnx_dt,
                       raw_data=arr.astype(key).tobytes(), name=name)


class TensorShapeDim(Message):
    FIELDS = [
        Field(1, "dim_value", "int64"),
        Field(2, "dim_param", "string"),
    ]


class TensorShapeProto(Message):
    FIELDS = [Field(1, "dim", TensorShapeDim, repeated=True)]


class TensorTypeProto(Message):
    FIELDS = [
        Field(1, "elem_type", "int32"),
        Field(2, "shape", TensorShapeProto),
    ]


class TypeProto(Message):
    FIELDS = [Field(1, "tensor_type", TensorTypeProto)]


class ValueInfoProto(Message):
    FIELDS = [
        Field(1, "name", "string"),
        Field(2, "type", TypeProto),
    ]

    @property
    def shape(self) -> tuple[int | str | None, ...]:
        tt = self.type.tensor_type if self.type else None
        if tt is None or tt.shape is None:
            return ()
        out: list[int | str | None] = []
        for d in tt.shape.dim:
            if d.dim_value is not None:
                out.append(int(d.dim_value))
            elif d.dim_param:
                out.append(d.dim_param)
            else:
                out.append(None)
        return tuple(out)

    @property
    def elem_type(self) -> int | None:
        tt = self.type.tensor_type if self.type else None
        return None if tt is None else tt.elem_type


def make_value_info(name: str, elem_type: int,
                    shape: tuple[int | str, ...]) -> ValueInfoProto:
    dims = []
    for d in shape:
        dims.append(TensorShapeDim(dim_param=d) if isinstance(d, str)
                    else TensorShapeDim(dim_value=int(d)))
    return ValueInfoProto(
        name=name,
        type=TypeProto(tensor_type=TensorTypeProto(
            elem_type=elem_type, shape=TensorShapeProto(dim=dims))))


class AttributeProto(Message):
    FLOAT, INT, STRING, TENSOR, GRAPH = 1, 2, 3, 4, 5
    FLOATS, INTS, STRINGS, TENSORS, GRAPHS = 6, 7, 8, 9, 10
    FIELDS = [
        Field(1, "name", "string"),
        Field(2, "f", "float"),
        Field(3, "i", "int64"),
        Field(4, "s", "bytes"),
        Field(5, "t", TensorProto),
        Field(7, "floats", "float", repeated=True),
        Field(8, "ints", "int64", repeated=True),
        Field(9, "strings", "bytes", repeated=True),
        Field(10, "tensors", TensorProto, repeated=True),
        Field(20, "type", "enum"),
    ]

    def value(self) -> Any:
        t = self.type
        # proto3 serializers omit zero-valued singular scalars from the
        # wire, so a typed-but-absent field means 0/0.0 — not None (a None
        # here would silently drop e.g. Clip's min=0.0 or Gather's axis=0
        # on models exported by onnx/torch)
        if t == self.FLOAT:
            return self.f if self.f is not None else 0.0
        if t == self.INT:
            return self.i if self.i is not None else 0
        if t == self.STRING:
            return self.s.decode("utf-8", "replace") if self.s is not None else ""
        if t == self.TENSOR:
            return tensor_to_numpy(self.t)
        if t == self.FLOATS:
            return list(self.floats)
        if t == self.INTS:
            return list(self.ints)
        if t == self.STRINGS:
            return [s.decode("utf-8", "replace") for s in self.strings]
        if t == self.TENSORS:
            return [tensor_to_numpy(x) for x in self.tensors]
        # untyped attributes: best effort
        for attr in ("i", "f"):
            if getattr(self, attr) is not None:
                return getattr(self, attr)
        if self.ints:
            return list(self.ints)
        if self.floats:
            return list(self.floats)
        if self.s is not None:
            return self.s.decode("utf-8", "replace")
        if self.t is not None:
            return tensor_to_numpy(self.t)
        return None


def make_attribute(name: str, value: Any) -> AttributeProto:
    a = AttributeProto(name=name)
    if isinstance(value, bool):
        a.type, a.i = AttributeProto.INT, int(value)
    elif isinstance(value, int):
        a.type, a.i = AttributeProto.INT, value
    elif isinstance(value, float):
        a.type, a.f = AttributeProto.FLOAT, value
    elif isinstance(value, str):
        a.type, a.s = AttributeProto.STRING, value.encode()
    elif isinstance(value, bytes):
        a.type, a.s = AttributeProto.STRING, value
    elif isinstance(value, np.ndarray):
        a.type, a.t = AttributeProto.TENSOR, numpy_to_tensor(value)
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, (int, np.integer)) for v in value):
            a.type, a.ints = AttributeProto.INTS, [int(v) for v in value]
        elif all(isinstance(v, (float, int, np.floating)) for v in value):
            a.type, a.floats = AttributeProto.FLOATS, [float(v) for v in value]
        elif all(isinstance(v, str) for v in value):
            a.type, a.strings = AttributeProto.STRINGS, [v.encode() for v in value]
        else:
            raise TypeError(f"cannot encode attribute list {value!r}")
    else:
        raise TypeError(f"cannot encode attribute {name}={value!r}")
    return a


class NodeProto(Message):
    FIELDS = [
        Field(1, "input", "string", repeated=True),
        Field(2, "output", "string", repeated=True),
        Field(3, "name", "string"),
        Field(4, "op_type", "string"),
        Field(5, "attribute", AttributeProto, repeated=True),
        Field(7, "domain", "string"),
    ]

    def attrs(self) -> dict[str, Any]:
        return {a.name: a.value() for a in self.attribute}


def make_node(op_type: str, inputs: list[str], outputs: list[str],
              name: str = "", domain: str = "", **attrs: Any) -> NodeProto:
    return NodeProto(
        op_type=op_type, input=list(inputs), output=list(outputs), name=name,
        domain=domain or None,
        attribute=[make_attribute(k, v) for k, v in attrs.items() if v is not None])


class GraphProto(Message):
    FIELDS = [
        Field(1, "node", NodeProto, repeated=True),
        Field(2, "name", "string"),
        Field(5, "initializer", TensorProto, repeated=True),
        Field(11, "input", ValueInfoProto, repeated=True),
        Field(12, "output", ValueInfoProto, repeated=True),
        Field(13, "value_info", ValueInfoProto, repeated=True),
    ]


class OperatorSetId(Message):
    FIELDS = [
        Field(1, "domain", "string"),
        Field(2, "version", "int64"),
    ]


class StringStringEntryProto(Message):
    """metadata_props entries (onnx.proto StringStringEntryProto)."""
    FIELDS = [
        Field(1, "key", "string"),
        Field(2, "value", "string"),
    ]


class ModelProto(Message):
    FIELDS = [
        Field(1, "ir_version", "int64"),
        Field(2, "producer_name", "string"),
        Field(3, "producer_version", "string"),
        Field(5, "model_version", "int64"),
        Field(7, "graph", GraphProto),
        Field(8, "opset_import", OperatorSetId, repeated=True),
        Field(14, "metadata_props", StringStringEntryProto, repeated=True),
    ]

    def metadata(self) -> dict[str, str]:
        return {e.key: e.value for e in self.metadata_props
                if e.key is not None}


def load_model(path_or_bytes: str | bytes) -> ModelProto:
    if isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
        data = path_or_bytes
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    return ModelProto.decode(data)


def save_model(model: ModelProto, path_or_file: str | BinaryIO) -> None:
    data = model.encode()
    if hasattr(path_or_file, "write"):
        path_or_file.write(data)
    else:
        with open(path_or_file, "wb") as f:
            f.write(data)


def make_model(graph: GraphProto, opset: int = 13,
               producer: str = "infur-tpu",
               metadata: dict[str, str] | None = None) -> ModelProto:
    props = [StringStringEntryProto(key=k, value=v)
             for k, v in (metadata or {}).items()]
    return ModelProto(ir_version=8, producer_name=producer, graph=graph,
                      opset_import=[OperatorSetId(domain="", version=opset)],
                      metadata_props=props)
