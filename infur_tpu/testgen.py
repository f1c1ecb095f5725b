"""Test fixture generator (the reference's infur-test-gen equivalent).

The reference synthesizes two test videos with ffmpeg's testsrc and
downloads an int8 FCN-ResNet50 from the model zoo at build time
(reference infur-test-gen/build.rs:64-94).  No network exists here, so the
model fixtures are *built*: the native FCN-ResNet50 is exported to the
reference's f32 ONNX format, and the int8 variant is produced by the
framework's own static quantizer — same artifact class as the zoo file.

Fixtures (cached, regenerated only if missing):
    media/synth_1280x720_5secs_30fps.rvf     (same content spec as build.rs:78-85)
    media/synth_640x480_40secs_10fps.rvf
    models/fcn_resnet50.onnx                 (f32, random-init params)
    models/fcn_resnet50_int8.onnx            (statically quantized)
"""

from __future__ import annotations

import os


def long_small_video(root: str) -> str:
    return os.path.join(root, "media", "synth_640x480_40secs_10fps.rvf")


def short_large_video(root: str) -> str:
    return os.path.join(root, "media", "synth_1280x720_5secs_30fps.rvf")


def fcn_resnet50_onnx(root: str) -> str:
    return os.path.join(root, "models", "fcn_resnet50.onnx")


def fcn_resnet50_int8_onnx(root: str) -> str:
    return os.path.join(root, "models", "fcn_resnet50_int8.onnx")


def generate(root: str, model_hw: tuple[int, int] = (120, 160),
             long_secs: float = 40.0, verbose: bool = True) -> dict[str, str]:
    """Generate all fixtures under ``root``; returns name->path."""
    import numpy as np

    from infur_tpu.video.rvf import write_rvf
    from infur_tpu.video.testsrc import SynthSpec, testsrc_video

    os.makedirs(os.path.join(root, "media"), exist_ok=True)
    os.makedirs(os.path.join(root, "models"), exist_ok=True)
    out: dict[str, str] = {}

    def log(msg: str) -> None:
        if verbose:
            print(msg, flush=True)

    p = short_large_video(root)
    if not os.path.exists(p):
        log(f"synthesizing {p} (1280x720 @30 x5s)")
        write_rvf(p, testsrc_video(SynthSpec(1280, 720, 30.0, 150)), fps=30)
    out["short_large_video"] = p

    p = long_small_video(root)
    if not os.path.exists(p):
        n = int(10 * long_secs)
        log(f"synthesizing {p} (640x480 @10 x{long_secs:.0f}s)")
        write_rvf(p, testsrc_video(SynthSpec(640, 480, 10.0, n)), fps=10)
    out["long_small_video"] = p

    f32_path = fcn_resnet50_onnx(root)
    if not os.path.exists(f32_path):
        import jax

        from infur_tpu.models import fcn_resnet50_to_onnx, init_fcn_resnet50
        from infur_tpu.onnx import save_model

        log(f"building {f32_path} at {model_hw[0]}x{model_hw[1]}")
        params = init_fcn_resnet50(jax.random.PRNGKey(0))
        save_model(fcn_resnet50_to_onnx(params, model_hw), f32_path)
    out["fcn_resnet50_onnx"] = f32_path

    p = fcn_resnet50_int8_onnx(root)
    if not os.path.exists(p):
        import numpy as np

        from infur_tpu.onnx import load_model, save_model
        from infur_tpu.onnx.passes import fold_batchnorm
        from infur_tpu.onnx.quantize import quantize_static

        log(f"quantizing -> {p} (calibrating with synth frames)")
        folded = fold_batchnorm(load_model(f32_path))
        rng = np.random.default_rng(0)
        h, w = model_hw
        feeds = [{"input": rng.normal(size=(1, 3, h, w)).astype(np.float32)}
                 for _ in range(3)]
        save_model(quantize_static(folded, feeds), p)
    out["fcn_resnet50_int8_onnx"] = p
    return out
