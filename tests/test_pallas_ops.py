"""Pallas kernels (interpret mode on CPU; hardware parity is driven by the
verify recipe on the real chip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from infur_tpu.ops.colorcode import color_code, make_palette, overlay
from infur_tpu.ops.pallas_colorcode import argmax_conf_pallas, color_code_pallas
from infur_tpu.ops.pallas_overlay import overlay_pallas


@pytest.fixture()
def scores(rng):
    return rng.normal(size=(21, 67, 93)).astype(np.float32)  # awkward dims


def test_argmax_conf_matches_numpy(scores):
    m, c = argmax_conf_pallas(scores, interpret=True)
    np.testing.assert_array_equal(np.asarray(m), scores.argmax(0))
    np.testing.assert_allclose(np.asarray(c), scores.max(0), rtol=1e-6)


def test_color_code_pallas_matches_jnp(scores):
    pal = make_palette()
    want = np.asarray(color_code(scores))
    got = np.asarray(color_code_pallas(scores, pal, interpret=True))
    np.testing.assert_array_equal(want, got)


def test_overlay_pallas_matches_jnp(rng, scores):
    frame = rng.integers(0, 255, (134, 186, 3), dtype=np.uint8)
    want = np.asarray(overlay(frame, scores))          # scores upsampled 2x
    got = np.asarray(overlay_pallas(frame, scores, interpret=True))
    assert np.abs(want.astype(int) - got.astype(int)).max() <= 1


def test_overlay_pallas_softmax(rng, scores):
    frame = rng.integers(0, 255, (67, 93, 3), dtype=np.uint8)
    want = np.asarray(overlay(frame, scores, apply_softmax=True))
    got = np.asarray(overlay_pallas(frame, scores, apply_softmax=True,
                                    interpret=True))
    assert np.abs(want.astype(int) - got.astype(int)).max() <= 1


def test_tiny_single_tile(rng):
    """Sub-tile inputs exercise the padding path."""
    scores = rng.normal(size=(4, 5, 7)).astype(np.float32)
    m, c = argmax_conf_pallas(scores, interpret=True)
    np.testing.assert_array_equal(np.asarray(m), scores.argmax(0))


def test_i420_preprocess_kernel_matches_reference_chain(rng):
    """Fused YUV->normalized-RGB affine == the i420_to_rgbf + normalize
    chain (gamut clip included)."""
    from infur_tpu.ops.pallas_preprocess import i420_to_normalized_pallas
    from infur_tpu.ops.preprocess import IMAGENET_MEAN_RGB, IMAGENET_STD_RGB
    from infur_tpu.ops.yuv import bgr_to_i420, i420_to_rgbf

    img = rng.integers(0, 255, (46, 62, 3), dtype=np.uint8)
    flat = bgr_to_i420(img)
    got = np.asarray(i420_to_normalized_pallas(flat, 46, 62, interpret=True))
    rgbf = np.asarray(i420_to_rgbf(flat, 46, 62))
    want = (rgbf - np.float32(IMAGENET_MEAN_RGB)) / np.float32(IMAGENET_STD_RGB)
    assert got.shape == (46, 62, 3)
    np.testing.assert_allclose(got, want, atol=2e-5)


class TestFlashAttention:
    """Fused SegFormer attention (ops/pallas_attention.py) vs the einsum
    reference, including every padding path (dh<128, ragged L and L2)."""

    @staticmethod
    def _reference(q, k, v, scale):
        import jax.numpy as jnp
        import jax
        s = jnp.einsum("nhld,nhmd->nhlm", q, k) * scale
        att = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("nhlm,nhmd->nhld", att, v)

    def _case(self, rng, n, heads, l, l2, dh, dtype=np.float32, tol=2e-6):
        from infur_tpu.ops.pallas_attention import flash_attention
        q = rng.normal(size=(n, heads, l, dh)).astype(dtype)
        k = rng.normal(size=(n, heads, l2, dh)).astype(dtype)
        v = rng.normal(size=(n, heads, l2, dh)).astype(dtype)
        scale = 1.0 / np.sqrt(dh)
        got = np.asarray(flash_attention(q, k, v, scale, interpret=True),
                         np.float32)
        want = np.asarray(self._reference(q, k, v, scale), np.float32)
        np.testing.assert_allclose(got, want, atol=tol, rtol=tol)

    def test_segformer_stage_shapes(self, rng):
        # b0 stage-1-like: 1 head, dh 32, ragged L, small L2
        self._case(rng, 1, 1, 67 * 93, 9 * 12, 32)

    def test_multi_head_ragged_l2(self, rng):
        self._case(rng, 2, 4, 300, 130, 32)  # L2 just over one lane tile

    def test_tile_exact_shapes(self, rng):
        self._case(rng, 1, 2, 512, 128, 64)  # no padding anywhere

    def test_tiny(self, rng):
        self._case(rng, 1, 1, 5, 3, 8)

    def test_bf16_inputs(self, rng):
        import jax.numpy as jnp
        from infur_tpu.ops.pallas_attention import flash_attention
        q = rng.normal(size=(1, 2, 100, 32))
        k = rng.normal(size=(1, 2, 30, 32))
        v = rng.normal(size=(1, 2, 30, 32))
        qb, kb, vb = (jnp.asarray(a, jnp.bfloat16) for a in (q, k, v))
        got = np.asarray(flash_attention(qb, kb, vb, 1.0 / np.sqrt(32.0),
                                         interpret=True), np.float32)
        want = np.asarray(self._reference(qb, kb, vb, 1.0 / np.sqrt(32.0)),
                          np.float32)
        np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


class TestFlashAttentionPacked:
    """Head-packed variant (block-diagonal K, 128-lane score contraction)
    == the einsum reference on every grouping path (g=4, g=2, fallback)."""

    def _case(self, rng, n, heads, l, l2, dh, tol=2e-6):
        from infur_tpu.ops.pallas_attention import flash_attention_packed
        q = rng.normal(size=(n, heads, l, dh)).astype(np.float32)
        k = rng.normal(size=(n, heads, l2, dh)).astype(np.float32)
        v = rng.normal(size=(n, heads, l2, dh)).astype(np.float32)
        scale = 1.0 / np.sqrt(dh)
        got = np.asarray(flash_attention_packed(q, k, v, scale,
                                                interpret=True), np.float32)
        want = np.asarray(TestFlashAttention._reference(q, k, v, scale),
                          np.float32)
        np.testing.assert_allclose(got, want, atol=tol, rtol=tol)

    def test_g4_multi_head(self, rng):
        self._case(rng, 1, 8, 300, 130, 32)   # g=4, ragged L/L2

    def test_g4_batch_times_heads(self, rng):
        self._case(rng, 4, 1, 200, 40, 32)    # stage-1-like batched

    def test_g2(self, rng):
        self._case(rng, 1, 2, 100, 30, 32)

    def test_fallback_g1(self, rng):
        self._case(rng, 1, 5, 64, 20, 32)     # 5 has no 2/4 divisor

    def test_fallback_large_dh(self, rng):
        self._case(rng, 1, 4, 64, 20, 64)     # dh>32 -> plain kernel

    def test_lane_exact(self, rng):
        self._case(rng, 1, 4, 256, 128, 32)   # no padding anywhere


def test_segformer_flash_attention_end_to_end(rng):
    """The whole model agrees between attention implementations."""
    import jax
    from infur_tpu.models.segformer import init_segformer, segformer_apply

    params = init_segformer(jax.random.PRNGKey(0), num_classes=7)
    x = rng.normal(size=(1, 64, 96, 3)).astype(np.float32)
    ref = np.asarray(segformer_apply(params, x)["out"])
    got = np.asarray(segformer_apply(params, x,
                                     attn_impl="flash_interpret")["out"])
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


class TestQGemmRequant:
    """ops/pallas_qgemm.py: fused int8 GEMM + requant epilogue == the
    NumPy fixed-point reference, including padding edges and per-channel
    multipliers."""

    def _case(self, rng, m, k, o, per_channel=True, y_zp8=3):
        from infur_tpu.onnx.requant import decompose_multiplier, requant_ref
        from infur_tpu.ops.pallas_qgemm import qgemm_requant

        x8 = rng.integers(-128, 128, (m, k), dtype=np.int64)
        w8 = rng.integers(-127, 128, (k, o), dtype=np.int64)
        base = rng.integers(-2**20, 2**20, o, dtype=np.int64)
        ms = 10.0 ** rng.uniform(-4.2, -2.5, o if per_channel else 1)
        q, shift = decompose_multiplier(ms if per_channel else float(ms[0]))
        assert np.all(shift >= 33)
        acc = x8 @ w8 + base
        want = requant_ref(acc, q.reshape(1, -1) if per_channel else q,
                           shift.reshape(1, -1) if per_channel else shift,
                           y_zp8, np.int8)
        got = np.asarray(qgemm_requant(
            jnp.asarray(x8, jnp.int8), jnp.asarray(w8, jnp.int8),
            base.astype(np.int32), q, shift, y_zp8, interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_aligned(self, rng):
        self._case(rng, 256, 128, 128)

    def test_ragged_everything(self, rng):
        self._case(rng, 300, 70, 150)   # every axis padded

    def test_scalar_multiplier(self, rng):
        self._case(rng, 64, 64, 96, per_channel=False)

    def test_large_accumulators(self, rng):
        # adversarial: maximize |acc| toward int32 range via big K
        self._case(rng, 32, 512, 64)


def test_qexec_pallas_1x1_bit_exact(rng):
    """compile_qexec with INFUR_QEXEC_PALLAS=1 (interpret on CPU) ==
    the NumPy oracle on a bottleneck-like QLinear graph with 1x1 convs
    (stride 1 and 2) around a 3x3."""
    import os

    import jax

    from infur_tpu.models import init_fcn_resnet50
    from infur_tpu.models.fcn_resnet50 import fcn_resnet50_to_onnx
    from infur_tpu.onnx import run_model
    from infur_tpu.onnx.passes import fold_batchnorm
    from infur_tpu.onnx.quantize import quantize_static
    from infur_tpu.onnx.qexec import compile_qexec

    params = init_fcn_resnet50(jax.random.PRNGKey(0))
    model = fold_batchnorm(fcn_resnet50_to_onnx(params, (32, 32)))
    feed = {"input": rng.normal(size=(1, 3, 32, 32)).astype(np.float32)}
    calib = [{"input": rng.normal(size=(1, 3, 32, 32)).astype(np.float32)}
             for _ in range(2)]
    qmodel = quantize_static(model, calib)
    want = run_model(qmodel, feed)["out"]
    os.environ["INFUR_QEXEC_PALLAS"] = "1"
    try:
        got = np.asarray(compile_qexec(qmodel)(feed)["out"])
    finally:
        os.environ["INFUR_QEXEC_PALLAS"] = "0"
    np.testing.assert_array_equal(got, want)


def test_qgemm_ksplit_bit_exact(rng):
    """K > K_BLOCK_MAX routes through the K-tiled scratch-accumulator
    kernel; integer adds are associative so the split must be
    bit-exact vs the NumPy fixed-point reference."""
    from infur_tpu.onnx.requant import decompose_multiplier, requant_ref
    from infur_tpu.ops import pallas_qgemm as PQ

    m, k, o = 64, PQ.K_BLOCK_MAX + 300, 96  # forces the ksplit grid
    x8 = rng.integers(-128, 128, (m, k), dtype=np.int64)
    w8 = rng.integers(-127, 128, (k, o), dtype=np.int64)
    base = rng.integers(-2**20, 2**20, o, dtype=np.int64)
    q, shift = decompose_multiplier(10.0 ** rng.uniform(-4.5, -3.5, o))
    assert np.all(shift >= 33)
    want = requant_ref(x8 @ w8 + base, q.reshape(1, -1),
                       shift.reshape(1, -1), -5, np.int8)
    got = np.asarray(PQ.qgemm_requant(
        jnp.asarray(x8, jnp.int8), jnp.asarray(w8, jnp.int8),
        base.astype(np.int32), q, shift, -5, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_qexec_pallas_3x3_bit_exact(rng):
    """INFUR_QEXEC_PALLAS3=1 routes KxK convs (stride/dilation/asymmetric
    pads included) through im2col + the fused GEMM; the zp-padded input
    makes the folded base term exact at the borders.  Must equal the
    NumPy oracle bit-for-bit."""
    import os

    from infur_tpu.onnx import GraphBuilder, run_model
    from infur_tpu.onnx.qexec import compile_qexec
    from infur_tpu.onnx.quantize import quantize_static

    rng_w = np.random.default_rng(7)
    g = GraphBuilder("net3")
    x = g.input("input", np.float32, (1, 64, 12, 14))
    w1 = g.init("w1", rng_w.normal(size=(64, 64, 3, 3))
                .astype(np.float32) * 0.1)
    y = g.node("Conv", [x, w1], pads=[1, 1, 1, 1])
    y = g.node("Relu", [y])
    w2 = g.init("w2", rng_w.normal(size=(96, 64, 3, 3))
                .astype(np.float32) * 0.1)
    y = g.node("Conv", [y, w2], pads=[2, 2, 2, 2], dilations=[2, 2])
    y = g.node("Relu", [y])
    w3 = g.init("w3", rng_w.normal(size=(64, 96, 3, 3))
                .astype(np.float32) * 0.1)
    y = g.node("Conv", [y, w3], pads=[1, 1, 1, 1], strides=[2, 2])
    g.output(y, np.float32, (1, 64, 6, 7))
    model = g.model()

    feed = {"input": rng.normal(size=(1, 64, 12, 14)).astype(np.float32)}
    calib = [{"input": rng.normal(size=(1, 64, 12, 14)).astype(np.float32)}
             for _ in range(2)]
    qmodel = quantize_static(model, calib)
    out_name = model.graph.output[0].name
    want = run_model(qmodel, feed)[out_name]
    os.environ["INFUR_QEXEC_PALLAS3"] = "1"
    os.environ["INFUR_QEXEC_PALLAS"] = "1"
    try:
        got = np.asarray(compile_qexec(qmodel)(feed)[out_name])
    finally:
        os.environ["INFUR_QEXEC_PALLAS3"] = "0"
        os.environ["INFUR_QEXEC_PALLAS"] = "0"
    np.testing.assert_array_equal(got, want)
