"""Native model families (plain functional JAX, params as pytrees).

The reference runs one model family — torchvision's FCN-ResNet50
segmentation net, consumed as an ONNX file (reference
infur-test-gen/build.rs:88-93, infur/src/predict_onnx.rs:371-381).  This
framework supports both consumption styles:

* **native**: the architectures below, written channels-last for the TPU
  (weights are HWIO, compute optionally bfloat16 on the MXU, params are a
  pytree you can shard with ``jax.sharding``);
* **imported**: any ONNX file via :mod:`infur_tpu.onnx.importer`.

``to_onnx`` exporters produce reference-format ONNX graphs from native
params, which doubles as the full-scale fixture generator (no model-zoo
download is possible here) and pins down native<->imported parity.
"""

from infur_tpu.models.fcn_resnet50 import (  # noqa: F401
    fcn_resnet50_apply, fcn_resnet50_to_onnx, init_fcn_resnet50,
)
from infur_tpu.models.segformer import init_segformer, segformer_apply  # noqa: F401
from infur_tpu.models.deeplabv3 import (  # noqa: F401
    deeplabv3_apply, deeplabv3_to_onnx, init_deeplabv3_resnet50,
)
from infur_tpu.models.segformer_moe import (  # noqa: F401
    init_segformer_moe, segformer_moe_apply,
)
from infur_tpu.models.lraspp_mobilenetv3 import (  # noqa: F401
    init_lraspp_mobilenet_v3_large, lraspp_apply,
)
