"""Raw-protobuf ONNX reader: hand-encoded wire-format fixtures."""

import struct

import numpy as np
import pytest

from fluidaudio_tpu.convert.onnx_reader import (
    OnnxParseError,
    read_onnx,
    read_onnx_initializers,
)


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    key = _varint((num << 3) | wire)
    if wire == 2:
        return key + _varint(len(payload)) + payload
    return key + payload


def _tensor(name: str, arr: np.ndarray, use_raw=True) -> bytes:
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, _varint(d))
    dtype_code = {np.float32: 1, np.int64: 7, np.float16: 10}[arr.dtype.type]
    msg += _field(2, 0, _varint(dtype_code))
    msg += _field(8, 2, name.encode())
    if use_raw:
        msg += _field(9, 2, arr.tobytes())
    else:
        packed = b"".join(struct.pack("<f", float(x)) for x in arr.reshape(-1))
        msg += _field(4, 2, packed)
    return msg


def _node(op_type: str) -> bytes:
    return _field(4, 2, op_type.encode())


def _model(tensors: list[bytes], nodes: list[bytes]) -> bytes:
    graph = b"".join(_field(1, 2, n) for n in nodes)
    graph += b"".join(_field(5, 2, t) for t in tensors)
    return _field(1, 0, _varint(8)) + _field(7, 2, graph)  # ir_version + graph


def test_reads_raw_and_packed_tensors(tmp_path):
    w1 = np.arange(12, dtype=np.float32).reshape(3, 4)
    w2 = np.asarray([7, -1, 3], np.int64)
    w3 = np.asarray([1.5, -2.5], np.float32)
    data = _model(
        [_tensor("enc.weight", w1), _tensor("ids", w2),
         _tensor("packed", w3, use_raw=False)],
        [_node("MatMul"), _node("MatMul"), _node("Conv")],
    )
    p = tmp_path / "m.onnx"
    p.write_bytes(data)
    weights, ops = read_onnx(p)
    np.testing.assert_array_equal(weights["enc.weight"], w1)
    # int64_data varints are unsigned two's complement in proto — only check
    # the positive entries round-trip
    assert weights["ids"][0] == 7 and weights["ids"][2] == 3
    np.testing.assert_allclose(weights["packed"], w3)
    assert ops == {"MatMul": 2, "Conv": 1}


def test_fp16_raw(tmp_path):
    w = np.asarray([[0.5, 1.25]], np.float16)
    p = tmp_path / "m.onnx"
    p.write_bytes(_model([_tensor("h", w)], []))
    got = read_onnx_initializers(p)["h"]
    assert got.dtype == np.float16
    np.testing.assert_array_equal(got, w)


def test_not_onnx_raises(tmp_path):
    p = tmp_path / "bad.onnx"
    p.write_bytes(b"\x08\x01")  # just ir_version, no graph
    with pytest.raises(OnnxParseError):
        read_onnx(p)


def test_supertonic_inventory_missing(tmp_path):
    from fluidaudio_tpu.convert.supertonic3 import ConversionError, convert_supertonic3, inventory

    inv = inventory(tmp_path)
    assert all(not v["present"] for v in inv.values())
    with pytest.raises(ConversionError):
        convert_supertonic3(tmp_path)


def test_supertonic_inventory_with_graphs(tmp_path):
    from fluidaudio_tpu.convert.supertonic3 import STAGES, inventory

    w = np.zeros((2, 3), np.float32)
    for s in STAGES:
        (tmp_path / f"{s}.onnx").write_bytes(
            _model([_tensor(f"{s}.w", w)], [_node("MatMul")])
        )
    inv = inventory(tmp_path)
    for s in STAGES:
        assert inv[s]["present"] and inv[s]["n_initializers"] == 1
        assert inv[s]["shapes"][f"{s}.w"] == (2, 3)


def test_negative_int64_packed_twos_complement(tmp_path):
    """Packed int64_data varints carry negatives as 10-byte two's-complement
    uint64s; the reader must sign-restore them (axis=-1 constants)."""
    vals = [-1, 3, -42]
    msg = _field(1, 0, _varint(3))          # dims [3]
    msg += _field(2, 0, _varint(7))          # dtype int64
    msg += _field(8, 2, b"neg")
    packed = b"".join(_varint(v & ((1 << 64) - 1)) for v in vals)
    msg += _field(7, 2, packed)              # packed int64_data
    path = tmp_path / "m.onnx"
    path.write_bytes(_model([msg], []))
    weights, _ = read_onnx(path)
    np.testing.assert_array_equal(weights["neg"], np.asarray(vals, np.int64))
