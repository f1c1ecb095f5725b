"""Oracle <-> importer parity sweep across the ONNX op registry.

Each case builds a one-node (or tiny) graph with the GraphBuilder, runs it
through the NumPy oracle and the JAX importer, and requires near-exact
agreement — the contract that makes the oracle a valid golden reference
for everything downstream (quantization calibration, mask parity).
"""

import numpy as np
import pytest

from infur_tpu.onnx import GraphBuilder, import_model, run_model


def _run_case(rng, op, in_specs, attrs=None, extra_inputs=(), tol=1e-5):
    """in_specs: list of (dtype, shape) for graph inputs; extra_inputs:
    list of (name, array) initializers appended to the node inputs."""
    g = GraphBuilder(f"op_{op.lower()}")
    names = []
    feeds = {}
    for i, (dt, shape) in enumerate(in_specs):
        nm = f"in{i}"
        g.input(nm, dt, shape)
        if np.issubdtype(np.dtype(dt), np.floating):
            v = rng.normal(size=shape).astype(dt)
            if op in ("Log", "Sqrt"):
                v = np.abs(v) + np.float32(0.1)  # keep in-domain
            feeds[nm] = v
        else:
            feeds[nm] = rng.integers(0, 6, size=shape).astype(dt)
        names.append(nm)
    for nm, arr in extra_inputs:
        names.append(g.init(nm, arr))
    out = g.node(op, names, **(attrs or {}))
    outs = out if isinstance(out, list) else [out]
    for o in outs:
        g.output(o, np.float32, ())  # dtype/shape metadata is advisory
    model = g.model()
    want = run_model(model, feeds)
    got = import_model(model)(feeds)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k], np.float64),
                                   np.asarray(want[k], np.float64),
                                   rtol=tol, atol=tol, err_msg=f"{op}/{k}")


CASES = [
    ("Sub", [(np.float32, (3, 4)), (np.float32, (3, 4))], None, ()),
    ("Pow", [(np.float32, (3, 4))], None,
     [("e", np.asarray(2.0, np.float32))]),
    ("Sqrt", [(np.float32, (3, 4))], None, ()),
    ("Exp", [(np.float32, (2, 3))], None, ()),
    ("Log", [(np.float32, (2, 3))], None, ()),
    ("Abs", [(np.float32, (2, 3))], None, ()),
    ("Neg", [(np.float32, (2, 3))], None, ()),
    ("Floor", [(np.float32, (2, 3))], None, ()),
    ("Ceil", [(np.float32, (2, 3))], None, ()),
    ("Sigmoid", [(np.float32, (2, 3))], None, ()),
    ("Tanh", [(np.float32, (2, 3))], None, ()),
    ("LeakyRelu", [(np.float32, (2, 3))], {"alpha": 0.2}, ()),
    ("HardSigmoid", [(np.float32, (2, 3))], None, ()),
    ("HardSwish", [(np.float32, (2, 3))], None, ()),
    ("Clip", [(np.float32, (3, 4))], None,
     [("lo", np.float32(-0.5)), ("hi", np.float32(0.5))]),
    ("Max", [(np.float32, (3, 4)), (np.float32, (3, 4))], None, ()),
    ("Min", [(np.float32, (3, 4)), (np.float32, (3, 4))], None, ()),
    ("Where", [(np.bool_, (3, 4)), (np.float32, (3, 4)),
               (np.float32, (3, 4))], None, ()),
    ("Gemm", [(np.float32, (4, 5)), (np.float32, (6, 5)),
              (np.float32, (6,))], {"transB": 1, "alpha": 0.5, "beta": 2.0}, ()),
    ("Flatten", [(np.float32, (2, 3, 4))], {"axis": 2}, ()),
    ("Transpose", [(np.float32, (2, 3, 4))], {"perm": [2, 0, 1]}, ()),
    ("Concat", [(np.float32, (2, 3)), (np.float32, (2, 5))], {"axis": 1}, ()),
    ("Squeeze", [(np.float32, (2, 1, 3))], None,
     [("axes", np.asarray([1], np.int64))]),
    ("Unsqueeze", [(np.float32, (2, 3))], None,
     [("axes", np.asarray([0, 3], np.int64))]),
    ("Gather", [(np.float32, (5, 3))], {"axis": 0},
     [("idx", np.asarray([0, 4, 2], np.int64))]),
    ("GatherElements", [(np.float32, (3, 4))], {"axis": 1},
     [("idx", np.asarray([[0, 1], [2, 3], [1, 0]], np.int64))]),
    ("Slice", [(np.float32, (5, 6))], None,
     [("starts", np.asarray([1, 0], np.int64)),
      ("ends", np.asarray([4, 5], np.int64)),
      ("axes", np.asarray([0, 1], np.int64)),
      ("steps", np.asarray([2, 1], np.int64))]),
    ("Pad", [(np.float32, (2, 3))], {"mode": "constant"},
     [("pads", np.asarray([1, 0, 0, 2], np.int64)),
      ("value", np.float32(7.0))]),
    ("Expand", [(np.float32, (1, 3))], None,
     [("shape", np.asarray([4, 3], np.int64))]),
    ("Tile", [(np.float32, (2, 3))], None,
     [("reps", np.asarray([2, 2], np.int64))]),
    ("ReduceMean", [(np.float32, (2, 3, 4))], {"keepdims": 1},
     [("axes", np.asarray([1], np.int64))]),
    ("ReduceSum", [(np.float32, (2, 3, 4))], {"keepdims": 0},
     [("axes", np.asarray([0, 2], np.int64))]),
    ("ReduceMax", [(np.float32, (2, 3, 4))], {"keepdims": 1},
     [("axes", np.asarray([-1], np.int64))]),
    ("ArgMax", [(np.float32, (3, 5))], {"axis": 1, "keepdims": 0}, ()),
    ("InstanceNormalization", [(np.float32, (2, 3, 6, 6))], {"epsilon": 1e-4},
     [("sc", np.asarray([1.0, 2.0, 0.5], np.float32)),
      ("bi", np.asarray([0.1, -0.2, 0.0], np.float32))]),
    ("AveragePool", [(np.float32, (1, 2, 8, 8))],
     {"kernel_shape": [3, 3], "strides": [2, 2], "pads": [1, 1, 1, 1]}, ()),
    ("AveragePool", [(np.float32, (1, 2, 7, 7))],
     {"kernel_shape": [2, 2], "strides": [2, 2], "ceil_mode": 1}, ()),
    ("MaxPool", [(np.float32, (1, 2, 8, 8))],
     {"kernel_shape": [3, 3], "strides": [1, 1], "dilations": [2, 2]}, ()),
    ("GlobalAveragePool", [(np.float32, (2, 3, 5, 5))], None, ()),
    ("GlobalMaxPool", [(np.float32, (2, 3, 5, 5))], None, ()),
    ("Softmax", [(np.float32, (3, 7))], {"axis": 0}, ()),
    ("Split", [(np.float32, (2, 9))], {"axis": 1},
     [("split", np.asarray([3, 2, 4], np.int64))]),
]


@pytest.mark.parametrize("op,in_specs,attrs,extra",
                         CASES, ids=[f"{c[0]}_{i}" for i, c in enumerate(CASES)])
def test_op_parity(rng, op, in_specs, attrs, extra):
    _run_case(rng, op, in_specs, attrs, extra)


def test_conv_transpose_parity(rng):
    g = GraphBuilder("ct")
    x = g.input("x", np.float32, (1, 4, 6, 6))
    w = g.init("w", rng.normal(size=(4, 3, 3, 3)).astype(np.float32) * 0.3)
    b = g.init("b", rng.normal(size=3).astype(np.float32))
    y = g.node("ConvTranspose", [x, w, b], strides=[2, 2], pads=[1, 1, 1, 1],
               output_padding=[1, 1])
    g.output(y, np.float32, ())
    model = g.model()
    feed = {"x": rng.normal(size=(1, 4, 6, 6)).astype(np.float32)}
    want = run_model(model, feed)
    got = import_model(model)(feed)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k],
                                   rtol=1e-4, atol=1e-5)


def test_grouped_conv_parity(rng):
    g = GraphBuilder("gc")
    x = g.input("x", np.float32, (1, 4, 8, 8))
    w = g.init("w", rng.normal(size=(8, 2, 3, 3)).astype(np.float32) * 0.3)
    y = g.node("Conv", [x, w], group=2, pads=[1, 1, 1, 1])
    g.output(y, np.float32, ())
    model = g.model()
    feed = {"x": rng.normal(size=(1, 4, 8, 8)).astype(np.float32)}
    want = run_model(model, feed)
    got = import_model(model)(feed)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k],
                                   rtol=1e-4, atol=1e-5)


def _qlconv_case(rng, x_dtype, cin, cout, hw, group=1, pads=(1, 1, 1, 1),
                 strides=(1, 1), x_zp=57, big_w=False):
    """QLinearConv graph hitting the importer's int8 MXU fast path
    (s8 symmetric weights, u8/s8 activation): must be bit-exact vs the
    oracle's int32 reference."""
    g = GraphBuilder("qlc")
    x = g.input("x", x_dtype, (1, cin, hw, hw))
    kw = (cout, cin // group, 3, 3)
    w_np = rng.integers(-127, 128, size=kw).astype(np.int8)
    names = [
        x,
        g.init("xs", np.float32(0.02)),
        g.init("xz", np.asarray(x_zp, x_dtype)),
        g.init("w", w_np),
        g.init("ws", rng.uniform(0.001, 0.05, cout).astype(np.float32)),
        g.init("wz", np.zeros(cout, np.int8)),
        g.init("ys", np.float32(0.05)),
        g.init("yz", np.asarray(7, x_dtype)),
        g.init("b", rng.integers(-1000, 1000, cout).astype(np.int32)),
    ]
    y = g.node("QLinearConv", names, group=group, pads=list(pads),
               strides=list(strides))
    g.output(y, x_dtype, ())
    model = g.model()
    lo, hi = (0, 255) if x_dtype == np.uint8 else (-128, 127)
    feed = {"x": rng.integers(lo, hi + 1, (1, cin, hw, hw)).astype(x_dtype)}
    want = run_model(model, feed)
    got = import_model(model)(feed)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), want[k])
    if big_w:
        assert w_np.size > 1024  # weight stayed a runtime param, not folded


def test_qlinear_conv_int8_fastpath_u8_act(rng):
    _qlconv_case(rng, np.uint8, cin=16, cout=8, hw=10, big_w=True)


def test_qlinear_conv_int8_fastpath_s8_act(rng):
    _qlconv_case(rng, np.int8, cin=4, cout=6, hw=8, x_zp=-3)


def test_qlinear_conv_int8_fastpath_grouped_strided(rng):
    _qlconv_case(rng, np.uint8, cin=8, cout=8, hw=12, group=4,
                 strides=(2, 2), x_zp=200)


def test_qlinear_conv_int8_fastpath_zp128_no_correction(rng):
    _qlconv_case(rng, np.uint8, cin=4, cout=4, hw=8, x_zp=128)


def test_qlinear_matmul_int8_fastpath(rng):
    g = GraphBuilder("qlm")
    a = g.input("a", np.uint8, (3, 5, 7))
    names = [
        a,
        g.init("as_", np.float32(0.03)),
        g.init("az", np.uint8(91)),
        g.init("b", rng.integers(-127, 128, (7, 9)).astype(np.int8)),
        g.init("bs", np.float32(0.01)),
        g.init("bz", np.int8(0)),
        g.init("ys", np.float32(0.07)),
        g.init("yz", np.uint8(5)),
    ]
    y = g.node("QLinearMatMul", names)
    g.output(y, np.uint8, ())
    model = g.model()
    feed = {"a": rng.integers(0, 256, (3, 5, 7)).astype(np.uint8)}
    want = run_model(model, feed)
    got = import_model(model)(feed)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), want[k])


def test_qlinear_conv_lowering_keeps_int8_operands(rng, monkeypatch):
    """Pin the MXU path itself, not just its numerics: the lowered module
    must contain a convolution with i8 operands (plus the small i32
    correction conv); with INFUR_INT8_MXU=0 the conv widens to i32."""
    import jax

    from infur_tpu.onnx import GraphBuilder, import_model

    def build():
        g = GraphBuilder("qlc")
        x = g.input("x", np.uint8, (1, 16, 8, 8))
        names = [x, g.init("xs", np.float32(0.02)),
                 g.init("xz", np.uint8(57)),
                 g.init("w", rng.integers(-127, 128, (8, 16, 3, 3))
                        .astype(np.int8)),
                 g.init("ws", rng.uniform(0.001, 0.05, 8).astype(np.float32)),
                 g.init("wz", np.zeros(8, np.int8)),
                 g.init("ys", np.float32(0.05)), g.init("yz", np.uint8(7))]
        y = g.node("QLinearConv", names, pads=[1, 1, 1, 1])
        g.output(y, np.uint8, ())
        return g.model()

    feed = {"x": rng.integers(0, 256, (1, 16, 8, 8)).astype(np.uint8)}

    def conv_operand_dtypes(model):
        m = import_model(model)
        txt = m.jitted.lower(m.params, feed).as_text()
        return [line for line in txt.splitlines() if "convolution" in line]

    fast = conv_operand_dtypes(build())
    assert any("xi8>, tensor<8x16x3x3xi8>" in line for line in fast), fast

    monkeypatch.setenv("INFUR_INT8_MXU", "0")
    slow = conv_operand_dtypes(build())
    assert not any("xi8>" in line for line in slow), slow
