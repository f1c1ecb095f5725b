"""infur-tpu: a TPU-native real-time video inference framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
``ahirner/infur`` (real-time dense-model segmentation over video): an external
decoder feeds raw BGR frames into a composable :class:`Processor` pipeline
(video-in -> scale -> model -> color-coded mask overlay) with live fps/drop
stats, runtime-tunable parameters, hot-swappable models and persisted settings.

Unlike the reference (CPU/onnxruntime, five full-frame host copies per frame —
see reference infur/src/app.rs:107-153), frames here go HBM-resident straight
after decode and only the final composited RGBA overlay leaves the device.

Layer map (mirrors SURVEY.md sec. 1, re-centered on the device):

==  ======================  =========================================
L0  frame buffers           ``infur_tpu.video.rvf`` / C++ ring (csrc/)
L1  video decode            ``infur_tpu.video`` (ffmpeg pipe | RVF | synth)
L2  processor protocol      ``infur_tpu.processing``
L3  pipeline stages         ``infur_tpu.processing`` / ``infur_tpu.model_stage``
L3' device kernels          ``infur_tpu.ops`` (Pallas), ``infur_tpu.models``
L4  app composite           ``infur_tpu.app``
L5  scheduler loop          ``infur_tpu.runtime.loop``
L6  frontend                ``infur_tpu.cli`` / ``infur_tpu.viewer``
==  ======================  =========================================
"""

__version__ = "0.1.0"
