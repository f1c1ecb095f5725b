"""Test configuration.

Tests run on a virtual 8-device CPU mesh (no multi-chip TPU hardware is
available): the env vars must be set before the first ``import jax`` anywhere
in the process, which is why they live at the top of conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-registers the TPU backend, overriding
# JAX_PLATFORMS from the environment — the config update below is what
# actually pins tests to the 8-device virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def small_clip(tmp_path_factory):
    """A tiny RVF fixture clip: 64x48, 10 frames (test-gen equivalent of the
    reference's synthesized fixture videos, infur-test-gen/build.rs:78-85)."""
    from infur_tpu.video.rvf import write_rvf
    from infur_tpu.video.testsrc import SynthSpec, testsrc_video

    spec = SynthSpec(width=64, height=48, fps=10.0, count=10)
    frames = testsrc_video(spec)
    path = tmp_path_factory.mktemp("media") / "synth_64x48_10f.rvf"
    write_rvf(path, frames, fps=10)
    return str(path), spec, frames
