"""Example: segment a still image (the reference's "images" capability,
reference Cargo.toml:9 — one decoded frame, then the retained frame keeps
re-rendering through parameter changes).

    python examples/segment_image.py photo.jpg
"""

import sys

import numpy as np
from PIL import Image

from infur_tpu.app import ModelCmd, ProcessingApp, ScaleCmd
from infur_tpu.processing import Play

path = sys.argv[1] if len(sys.argv) > 1 else "photo.jpg"

app = ProcessingApp()
app.control(Play([path]))                      # .png/.jpg/.npy all work
app.control(ModelCmd("lraspp?interp=bilinear"))  # preprocess override knobs
frame = app.generate()                         # the image, segmented

app.control(ScaleCmd(2.0))                     # params re-render the SAME frame
upscaled = app.generate()
assert upscaled.id == frame.id

Image.fromarray(np.asarray(upscaled.composited), "RGBA").save("segmented.png")
app.close()
print(f"wrote segmented.png ({np.asarray(upscaled.composited).shape})")
