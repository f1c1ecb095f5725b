"""ONNX support, self-contained (no ``onnx``/``onnxruntime`` dependency).

The reference loads ONNX models through the onnxruntime C++ library
(reference infur/src/predict_onnx.rs:288-293).  This framework instead owns
the whole path TPU-natively:

* :mod:`infur_tpu.onnx.proto`    — protobuf wire-format reader/writer for the
  ONNX schema subset (ModelProto/GraphProto/NodeProto/TensorProto/...).
* :mod:`infur_tpu.onnx.importer` — ONNX graph -> jitted JAX callable
  (constant-folds Shape/Reshape idioms at import, everything else lowers to
  jnp/lax so XLA fuses it onto the MXU).
* :mod:`infur_tpu.onnx.oracle`   — pure-NumPy reference executor, the golden
  oracle for mask-parity tests (stands in for onnxruntime-CPU).
* :mod:`infur_tpu.onnx.export`   — serialize our native models to ONNX files
  (test fixtures; interop with the reference's model zoo).
"""

from infur_tpu.onnx.proto import (  # noqa: F401
    ModelProto, GraphProto, NodeProto, TensorProto, AttributeProto,
    ValueInfoProto, load_model, save_model, tensor_to_numpy, numpy_to_tensor,
)
from infur_tpu.onnx.importer import ImportedModel, import_graph, import_model  # noqa: F401
from infur_tpu.onnx.export import GraphBuilder  # noqa: F401
from infur_tpu.onnx.oracle import run_graph, run_model  # noqa: F401
