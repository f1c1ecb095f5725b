"""Example: segment a video end to end with the library API.

Builds a short synthetic clip, runs FCN-ResNet50 over it through the same
app composite the CLI/viewer use, and writes composited frames — the
programmatic equivalent of:

    python -m infur_tpu play synth:320x240@10:2 --model fcn_resnet50 \
        --scale 0.5 --out out/
"""

import numpy as np
from PIL import Image

from infur_tpu.app import ModelCmd, ProcessingApp, ScaleCmd
from infur_tpu.processing import Play

app = ProcessingApp()
app.control(ScaleCmd(0.5))
app.control(Play(["synth:320x240@10:2"]))   # any ffmpeg input works too
app.control(ModelCmd("fcn_resnet50"))        # or model.onnx / segformer:b0

frame_count = 0
while (frame := app.generate()) is not None:
    Image.fromarray(np.asarray(frame.composited), "RGBA") \
        .save(f"frame_{frame.id:04d}.png")
    frame_count += 1
app.close()
print(f"segmented {frame_count} frames")
