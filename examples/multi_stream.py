"""Example: N video streams through one batched device step (data-parallel
over a mesh when more than one chip is available)."""

import numpy as np

from infur_tpu.multistream import MultiStreamApp
from infur_tpu.parallel import make_mesh

import jax

mesh = make_mesh(len(jax.devices()), model_axis=1) \
    if len(jax.devices()) > 1 else None
app = MultiStreamApp(4, mesh=mesh)
for i in range(4):
    app.play(i, [f"synth:320x240@10:1"])
app.set_scale(0.5)
app.load_model("fcn_resnet50:bf16")

for tick in range(5):
    for sf in app.tick():
        print(f"tick {tick}: stream {sf.stream} frame {sf.id} "
              f"rgba {np.asarray(sf.rgba).shape}")
app.close()
