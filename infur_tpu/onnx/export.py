"""Programmatic ONNX graph construction + model export.

Replaces the reference's reliance on downloading fixture models from the
onnx/models zoo (reference infur-test-gen/build.rs:88-93) — this environment
has no network, so test fixtures are *built*: the builder assembles real ONNX
protobuf files which then exercise the real import path end-to-end.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from infur_tpu.onnx.proto import (
    GraphProto, ModelProto, TensorProto, make_model, make_node,
    make_value_info, numpy_to_tensor,
)

_NP_TO_ONNX = {
    np.dtype(np.float32): TensorProto.FLOAT,
    np.dtype(np.float16): TensorProto.FLOAT16,
    np.dtype(np.float64): TensorProto.DOUBLE,
    np.dtype(np.uint8): TensorProto.UINT8,
    np.dtype(np.int8): TensorProto.INT8,
    np.dtype(np.int32): TensorProto.INT32,
    np.dtype(np.int64): TensorProto.INT64,
    np.dtype(np.bool_): TensorProto.BOOL,
}


class GraphBuilder:
    """Tiny fluent builder for ONNX graphs.

    >>> g = GraphBuilder("net")
    >>> x = g.input("x", np.float32, (1, 3, 8, 8))
    >>> w = g.init("w", np.zeros((4, 3, 3, 3), np.float32))
    >>> y = g.node("Conv", [x, w], pads=[1, 1, 1, 1])
    >>> g.output(y, np.float32, (1, 4, 8, 8))
    >>> model = g.model()
    """

    def __init__(self, name: str = "graph"):
        self._g = GraphProto(name=name)
        self._counter = 0

    def fresh(self, prefix: str = "t") -> str:
        self._counter += 1
        return f"{prefix}_{self._counter}"

    def input(self, name: str, dtype: Any, shape: Sequence[int | str]) -> str:
        self._g.input.append(
            make_value_info(name, _NP_TO_ONNX[np.dtype(dtype)], tuple(shape)))
        return name

    def output(self, name: str, dtype: Any, shape: Sequence[int | str]) -> str:
        self._g.output.append(
            make_value_info(name, _NP_TO_ONNX[np.dtype(dtype)], tuple(shape)))
        return name

    def init(self, name: str, arr: np.ndarray) -> str:
        self._g.initializer.append(numpy_to_tensor(np.asarray(arr), name))
        return name

    def const(self, arr: np.ndarray, name: str | None = None) -> str:
        return self.init(name or self.fresh("const"), arr)

    def node(self, op_type: str, inputs: Sequence[str],
             outputs: Sequence[str] | int = 1, name: str = "",
             domain: str = "", **attrs: Any) -> str | list[str]:
        if isinstance(outputs, int):
            outs = [self.fresh(op_type.lower()) for _ in range(outputs)]
        else:
            outs = list(outputs)
        self._g.node.append(
            make_node(op_type, list(inputs), outs,
                      name=name or self.fresh("n"), domain=domain, **attrs))
        return outs[0] if len(outs) == 1 else outs

    def graph(self) -> GraphProto:
        return self._g

    def model(self, opset: int = 13,
              metadata: dict[str, str] | None = None) -> ModelProto:
        """``metadata``: ModelProto metadata_props — e.g. the ONNX image
        category keys (Image.BitmapPixelFormat / Image.NominalPixelRange)
        that drive metadata-aware preprocessing in the model stage."""
        return make_model(self._g, opset=opset, metadata=metadata)
