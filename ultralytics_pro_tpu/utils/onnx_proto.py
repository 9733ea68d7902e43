"""Dependency-free ONNX protobuf writer/reader (VERDICT r2 Next #6).

onnx / tf2onnx / jax2onnx are not installable in this environment, and ONNX is
the reference's main interchange format (reference engine/exporter.py:631).
This module hand-encodes the protobuf wire format for the small subset of
onnx.proto needed to serialize (and re-parse) ModelProto graphs:

    ModelProto{ir_version=8, opset_import=[{"": 17}], graph}
    GraphProto{name, node*, initializer*, input*, output*}
    NodeProto{input*, output*, op_type, name, attribute*}
    AttributeProto{name, type, i/f/s/ints/floats/t}
    TensorProto{dims*, data_type, raw_data, name}
    ValueInfoProto{name, type{tensor_type{elem_type, shape{dim{dim_value}}}}}

Wire format: field_header = (field_num << 3) | wire_type; varint (type 0),
64-bit (1), length-delimited (2), 32-bit (5). Field numbers follow the
official onnx.proto3.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

# onnx TensorProto.DataType
FLOAT = 1
UINT8 = 2
INT8 = 3
INT32 = 6
INT64 = 7
BOOL = 9
FLOAT16 = 10
DOUBLE = 11

NP2ONNX = {
    np.dtype(np.float32): FLOAT,
    np.dtype(np.uint8): UINT8,
    np.dtype(np.int8): INT8,
    np.dtype(np.int32): INT32,
    np.dtype(np.int64): INT64,
    np.dtype(np.bool_): BOOL,
    np.dtype(np.float16): FLOAT16,
    np.dtype(np.float64): DOUBLE,
}
ONNX2NP = {v: k for k, v in NP2ONNX.items()}


# ---------------------------------------------------------------- writing --

def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:
    return _tag(field, 0) + _varint(value)


def _f32(field: int, value: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", value)


def _s(field: int, value: str) -> bytes:
    return _ld(field, value.encode("utf-8"))


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    out = b""
    for d in arr.shape:
        out += _vi(1, int(d))            # dims
    out += _vi(2, NP2ONNX[arr.dtype])    # data_type
    out += _s(8, name)                   # name
    out += _ld(9, arr.tobytes())         # raw_data
    return out


def _attr(name: str, value: Any) -> bytes:
    out = _s(1, name)
    if isinstance(value, bool):
        out += _vi(3, int(value)) + _vi(20, 2)          # i, type=INT
    elif isinstance(value, int):
        out += _vi(3, value) + _vi(20, 2)
    elif isinstance(value, float):
        out += _f32(2, value) + _vi(20, 1)              # f, type=FLOAT
    elif isinstance(value, str):
        out += _ld(4, value.encode()) + _vi(20, 3)      # s, type=STRING
    elif isinstance(value, np.ndarray):
        out += _ld(5, tensor_proto(name, value)) + _vi(20, 4)  # t, type=TENSOR
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, int) for v in value):
            for v in value:
                out += _vi(8, v)                        # ints
            out += _vi(20, 7)                           # type=INTS
        else:
            for v in value:
                out += _f32(7, float(v))                # floats
            out += _vi(20, 6)                           # type=FLOATS
    else:
        raise TypeError(f"attr {name}: {type(value)}")
    return out


def node_proto(op_type: str, inputs: Sequence[str], outputs: Sequence[str],
               name: str = "", **attrs) -> bytes:
    out = b""
    for i in inputs:
        out += _s(1, i)
    for o in outputs:
        out += _s(2, o)
    out += _s(3, name or f"{op_type}_{outputs[0]}")
    out += _s(4, op_type)
    for k, v in attrs.items():
        out += _ld(5, _attr(k, v))
    return out


def value_info(name: str, shape: Sequence[int], elem_type: int = FLOAT) -> bytes:
    dims = b""
    for d in shape:
        dims += _ld(1, _vi(1, int(d)))                  # dim{dim_value}
    tensor_type = _vi(1, elem_type) + _ld(2, dims)      # elem_type, shape
    type_proto = _ld(1, tensor_type)                    # tensor_type
    return _s(1, name) + _ld(2, type_proto)


def graph_proto(name: str, nodes: List[bytes], initializers: List[bytes],
                inputs: List[bytes], outputs: List[bytes]) -> bytes:
    out = b""
    for n in nodes:
        out += _ld(1, n)
    out += _s(2, name)
    for t in initializers:
        out += _ld(5, t)
    for i in inputs:
        out += _ld(11, i)
    for o in outputs:
        out += _ld(12, o)
    return out


def model_proto(graph: bytes, opset: int = 17, producer: str = "ultralytics_pro_tpu",
                metadata: Optional[Dict[str, str]] = None) -> bytes:
    out = _vi(1, 8)                                     # ir_version
    out += _s(2, producer)
    out += _ld(7, graph)
    # opset_import: OperatorSetIdProto{domain="", version}
    out += _ld(8, _s(1, "") + _vi(2, opset))
    for k, v in (metadata or {}).items():
        out += _ld(14, _s(1, k) + _s(2, v))             # metadata_props
    return out


# ---------------------------------------------------------------- reading --

def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def parse_message(buf: bytes) -> Dict[int, List[Any]]:
    """Parse one protobuf message into {field: [raw values]}."""
    out: Dict[int, List[Any]] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            v = struct.unpack("<f", buf[pos:pos + 4])[0]
            pos += 4
        elif wire == 1:
            v = struct.unpack("<d", buf[pos:pos + 8])[0]
            pos += 8
        else:
            raise ValueError(f"wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    m = parse_message(buf)
    dims = [int(d) for d in m.get(1, [])]
    dtype = ONNX2NP[int(m[2][0])]
    name = m.get(8, [b""])[0].decode()
    raw = m.get(9, [b""])[0]
    return name, np.frombuffer(raw, dtype=dtype).reshape(dims).copy()


def parse_attr(buf: bytes) -> Tuple[str, Any]:
    m = parse_message(buf)
    name = m[1][0].decode()
    atype = int(m.get(20, [0])[0])
    if atype == 2:
        return name, int(m[3][0])
    if atype == 1:
        return name, float(m[2][0])
    if atype == 3:
        return name, m[4][0].decode()
    if atype == 7:
        return name, [int(v) for v in m.get(8, [])]
    if atype == 6:
        return name, [float(v) for v in m.get(7, [])]
    if atype == 4:
        return name, parse_tensor(m[5][0])[1]
    raise ValueError(f"attr type {atype}")


def parse_node(buf: bytes) -> Dict[str, Any]:
    m = parse_message(buf)
    return {
        "inputs": [v.decode() for v in m.get(1, [])],
        "outputs": [v.decode() for v in m.get(2, [])],
        "name": m.get(3, [b""])[0].decode(),
        "op_type": m[4][0].decode(),
        "attrs": dict(parse_attr(a) for a in m.get(5, [])),
    }


def parse_model(buf: bytes) -> Dict[str, Any]:
    m = parse_message(buf)
    g = parse_message(m[7][0])
    inits = dict(parse_tensor(t) for t in g.get(5, []))

    def vi_name(b):
        return parse_message(b)[1][0].decode()

    opsets = [parse_message(o) for o in m.get(8, [])]
    metadata = {}
    for mp in m.get(14, []):
        kv = parse_message(mp)
        metadata[kv[1][0].decode()] = kv[2][0].decode()
    return {
        "metadata": metadata,
        "ir_version": int(m[1][0]),
        "opset": int(opsets[0][2][0]) if opsets else 0,
        "nodes": [parse_node(n) for n in g.get(1, [])],
        "initializers": inits,
        "inputs": [vi_name(b) for b in g.get(11, [])],
        "outputs": [vi_name(b) for b in g.get(12, [])],
    }
