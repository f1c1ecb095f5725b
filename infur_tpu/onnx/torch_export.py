"""Run ``torch.onnx.export`` without the ``onnx`` package installed.

The reference's defining interop scenario is loading *foreign* ONNX
artifacts — real zoo files produced by exporters the framework's authors
never saw (reference infur/src/predict_onnx.rs:357-381 downloads a real
torchvision export; infur-test-gen/build.rs:64-94 pins it as a fixture).
This environment has no network and no ``onnx``/``onnxruntime`` packages,
but it DOES have CPU torch — whose legacy TorchScript exporter serializes
the ModelProto with its own C++ protobuf writer.  A torch-exported file is
therefore the closest available *real* foreign artifact: independent graph
topology, attribute conventions, initializer layout, and wire encoding.

torch 2.13's legacy path needs the Python ``onnx`` module for exactly one
step: ``_add_onnxscript_fn`` loads the serialized bytes back and scans the
graph for custom onnxscript functions (torch/onnx/_internal/
torchscript_exporter/onnx_proto_utils.py).  For standard ATen-only models
that scan finds nothing and returns the bytes unchanged.  We satisfy the
import with a shim backed by this package's own protobuf codec
(:mod:`infur_tpu.onnx.proto`), installed into ``sys.modules`` only for the
duration of the export and only when the real package is absent.
"""

from __future__ import annotations

import contextlib
import sys
import types
from typing import Any

from infur_tpu.onnx import proto


class _ShimAttribute:
    """The fields ``_find_onnxscript_op`` touches on an AttributeProto.

    ``g`` (a control-flow subgraph) is a field our codec does not decode;
    exposing it as ``None`` is correct for ATen-only exports (no If/Loop
    bodies carrying custom onnxscript ops) and makes torch's recursion a
    no-op rather than an AttributeError.
    """

    __slots__ = ("g",)

    def __init__(self) -> None:
        self.g = None


class _ShimNode:
    __slots__ = ("domain", "op_type", "attribute")

    def __init__(self, node: proto.NodeProto) -> None:
        # proto3 omits empty strings on the wire; torch concatenates
        # ``node.domain + "::" + node.op_type`` so None must become "".
        self.domain = node.domain or ""
        self.op_type = node.op_type or ""
        self.attribute = [_ShimAttribute() for _ in node.attribute]


class _ShimGraph:
    __slots__ = ("node",)

    def __init__(self, graph: proto.GraphProto | None) -> None:
        self.node = [_ShimNode(n) for n in (graph.node if graph else [])]


class _ShimModel:
    """ModelProto stand-in: keeps the original bytes for SerializeToString."""

    def __init__(self, data: bytes) -> None:
        self._bytes = bytes(data)
        decoded = proto.ModelProto.decode(self._bytes)
        self.graph = _ShimGraph(decoded.graph)
        self.functions: list[Any] = _NoFunctions()

    def SerializeToString(self) -> bytes:  # noqa: N802 (protobuf API name)
        return self._bytes


class _NoFunctions(list):
    """torch only mutates ``model.functions`` when the graph uses custom
    onnxscript ops; the shim cannot re-serialize those, so fail loudly
    instead of silently dropping them."""

    def extend(self, items: Any) -> None:
        items = list(items)
        if items:
            raise NotImplementedError(
                "onnxscript custom functions are not supported by the "
                "infur_tpu onnx shim; install the real onnx package")
        super().extend(items)


def _make_shim_module() -> types.ModuleType:
    mod = types.ModuleType("onnx")
    mod.__doc__ = ("infur_tpu shim standing in for the onnx package during "
                   "torch.onnx.export; see infur_tpu/onnx/torch_export.py")
    mod.load_model_from_string = _ShimModel
    mod.load_from_string = _ShimModel
    mod.ModelProto = _ShimModel
    mod.__infur_tpu_shim__ = True
    return mod


@contextlib.contextmanager
def onnx_shim():
    """Temporarily provide ``import onnx`` if the real package is absent."""
    try:
        import onnx  # noqa: F401  (real package present: nothing to do)
        yield
        return
    except ImportError:
        pass
    mod = _make_shim_module()
    sys.modules["onnx"] = mod
    try:
        yield
    finally:
        # only remove our own shim (the export may legitimately import more)
        if getattr(sys.modules.get("onnx"), "__infur_tpu_shim__", False):
            del sys.modules["onnx"]


def export_torch_module(module: Any, args: Any, f: str, *,
                        opset: int = 13,
                        input_names: list[str] | None = None,
                        output_names: list[str] | None = None,
                        dynamic_axes: dict[str, Any] | None = None) -> None:
    """Export a ``torch.nn.Module`` to an ONNX file via torch's own
    (C++-serialized) legacy exporter, shimming the ``onnx`` import.

    The result is a genuinely foreign artifact for the importer: torch
    chooses the op decompositions, attribute spellings, and initializer
    naming — none of it produced by this package's GraphBuilder.
    """
    import torch

    with onnx_shim():
        torch.onnx.export(
            module, args, f,
            dynamo=False,
            opset_version=opset,
            do_constant_folding=True,
            input_names=input_names,
            output_names=output_names,
            dynamic_axes=dynamic_axes,
        )
