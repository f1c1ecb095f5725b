"""NHWC channels-last int8 executor (onnx/qexec.py) vs the NumPy oracle.

The reference's flagship model is a statically-quantized int8 FCN
(infur-test-gen/build.rs:88-93) — int8 is its production path, so the TPU
build's quantized executor must be both FAST (channels-last, fused
requant, no correction convs) and bit-exact vs the oracle.  These tests
pin bit-exactness per conv geometry (strides/pads/dilations/groups — the
border zero-point correction is the subtle part), per fused-op motif, and
through the ModelStage serving path, plus the data-parallel mesh row.
"""

import numpy as np
import pytest

from infur_tpu.onnx import GraphBuilder, run_model
from infur_tpu.onnx.passes import fold_batchnorm
from infur_tpu.onnx.qexec import QExecUnsupported, compile_qexec
from infur_tpu.onnx.quantize import quantize_static


def _qconv_model(rng, kh, kw, sh, sw, pads, dil, cin, cout, h, w, x_zp,
                 groups=1):
    g = GraphBuilder("c")
    x = g.input("x", np.uint8, (1, cin, h, w))
    w8 = rng.integers(-127, 128,
                      size=(cout, cin // groups, kh, kw)).astype(np.int8)
    ins = [x, g.init("xs", np.float32(0.02)), g.init("xz", np.uint8(x_zp)),
           g.init("w", w8),
           g.init("ws", rng.uniform(0.001, 0.01, cout).astype(np.float32)),
           g.init("wz", np.zeros(cout, np.int8)),
           g.init("ys", np.float32(0.05)), g.init("yz", np.uint8(131)),
           g.init("b", rng.integers(-1000, 1000, cout).astype(np.int32))]
    y = g.node("QLinearConv", ins, pads=list(pads), strides=[sh, sw],
               dilations=[dil, dil], group=groups)
    g.output(y, np.uint8, (1, cout, h, w))
    return g.model(), y


def _run_both(m, out_name, x_u8):
    """Oracle u8 result and the executor's (rebased s8 feed/result)."""
    ref = run_model(m, {"x": x_u8})[out_name]
    qe = compile_qexec(m)
    x8 = (x_u8.astype(np.int16) - 128).astype(np.int8)
    got = np.asarray(qe({"x": x8})[out_name]).astype(np.int32) + 128
    return ref.astype(np.int32), got


@pytest.mark.parametrize("kh,stride,pad,dil,x_zp,groups", [
    (7, 2, 3, 1, 114, 1),   # the ResNet stem
    (3, 1, 1, 1, 0, 1),     # standard 3x3 (zp 0: no correction at all)
    (3, 1, 2, 2, 77, 1),    # dilated (FCN layer3/4)
    (3, 2, 1, 1, 200, 1),   # strided, non-divisible H (off-by-one trap)
    (1, 1, 0, 1, 50, 1),    # pointwise
    (3, 2, 1, 1, 90, 4),    # grouped
    (5, 1, 2, 1, 128, 8),   # depthwise-ish, zp at the rebase point
])
def test_qlinear_conv_geometries_bit_exact(rng, kh, stride, pad, dil,
                                           x_zp, groups):
    cin = cout = 8
    m, out = _qconv_model(rng, kh, kh, stride, stride, (pad,) * 4, dil,
                          cin, cout, 24, 26, x_zp, groups)
    x = rng.integers(0, 256, size=(1, cin, 24, 26)).astype(np.uint8)
    ref, got = _run_both(m, out, x)
    np.testing.assert_array_equal(ref, got)


def test_tiny_activation_full_map_fallback(rng):
    """When every output position clips (pads >= extent), the strip
    decomposition degenerates and the full-map correction path runs."""
    m, out = _qconv_model(rng, 7, 7, 1, 1, (3,) * 4, 1, 4, 4, 5, 5, 33)
    x = rng.integers(0, 256, size=(1, 4, 5, 5)).astype(np.uint8)
    ref, got = _run_both(m, out, x)
    np.testing.assert_array_equal(ref, got)


def test_mini_convnet_quantized_exact(rng):
    from test_quantize import mini_convnet
    feeds = [{"x": rng.normal(size=(1, 3, 16, 16)).astype(np.float32)}
             for _ in range(3)]
    q = quantize_static(fold_batchnorm(mini_convnet(rng)), feeds)
    qe = compile_qexec(q)
    for f in feeds:
        ref = run_model(q, f)
        got = {k: np.asarray(v) for k, v in qe(f).items()}
        for k in ref:
            np.testing.assert_array_equal(ref[k].astype(np.float32), got[k])


def _se_resize_net(rng):
    """GAP -> HardSigmoid -> Mul gate + Shape-driven linear Resize: the
    LRASPP head motifs (lraspp_mobilenetv3.py exporter) at toy size."""
    g = GraphBuilder("se")
    x = g.input("x", np.float32, (1, 4, 12, 14))
    w1 = g.init("w1", rng.normal(size=(4, 4, 3, 3)).astype(np.float32) * .3)
    y = g.node("Conv", [x, w1], pads=[1, 1, 1, 1])
    y = g.node("Relu", [y])
    s = g.node("GlobalAveragePool", [y])
    s = g.node("HardSigmoid", [s], alpha=0.2, beta=0.5)
    y = g.node("Mul", [y, s])
    # resize back up to the input's H x W via Shape machinery
    shp = g.node("Shape", [x])
    hw = g.node("Slice", [shp, g.const(np.asarray([2], np.int64)),
                          g.const(np.asarray([4], np.int64)),
                          g.const(np.asarray([0], np.int64))])
    sizes = g.node("Concat", [g.const(np.asarray([1, 4], np.int64)), hw],
                   axis=0)
    y = g.node("MaxPool", [y], kernel_shape=[2, 2], strides=[2, 2])
    y = g.node("Resize", [y, "", "", sizes], mode="linear",
               coordinate_transformation_mode="half_pixel")
    g.output(y, np.float32, (1, 4, 12, 14))
    return g.model()


def test_se_gate_and_shape_driven_resize_exact(rng):
    feeds = [{"x": rng.normal(size=(1, 4, 12, 14)).astype(np.float32)}
             for _ in range(3)]
    q = quantize_static(_se_resize_net(rng), feeds)
    ops = {n.op_type for n in q.graph.node}
    assert {"QLinearGlobalAveragePool", "QLookupTable", "QLinearMul",
            "QLinearResize"} <= ops
    qe = compile_qexec(q)
    for f in feeds:
        ref = run_model(q, f)
        got = {k: np.asarray(v) for k, v in qe(f).items()}
        for k in ref:
            np.testing.assert_array_equal(ref[k].astype(np.float32), got[k])


def test_batched_and_odd_sizes(rng):
    """Batch > 1 and a frame size unrelated to the build size run the same
    executable (shapes re-trace under jit)."""
    feeds = [{"x": rng.normal(size=(1, 3, 16, 16)).astype(np.float32)}]
    from test_quantize import mini_convnet
    q = quantize_static(fold_batchnorm(mini_convnet(rng)), feeds)
    qe = compile_qexec(q)
    x = rng.normal(size=(3, 3, 18, 22)).astype(np.float32)
    ref = run_model(q, {"x": x})
    got = {k: np.asarray(v) for k, v in qe({"x": x}).items()}
    for k in ref:
        np.testing.assert_array_equal(ref[k].astype(np.float32), got[k])


def test_unsupported_graph_raises(rng):
    g = GraphBuilder("soft")
    x = g.input("x", np.float32, (1, 3, 8, 8))
    y = g.node("Softmax", [x], axis=1)
    g.output(y, np.float32, (1, 3, 8, 8))
    with pytest.raises(QExecUnsupported):
        compile_qexec(g.model())


def test_import_quantized_fallback(rng, monkeypatch):
    """_import_quantized: qexec for QOperator CNN graphs, the generic
    importer otherwise, and INFUR_INT8_NHWC=0 forces the importer."""
    from infur_tpu.model_stage import _import_quantized
    from infur_tpu.onnx.importer import ImportedModel
    from infur_tpu.onnx.qexec import QExecModel
    from test_quantize import mini_convnet
    feeds = [{"x": rng.normal(size=(1, 3, 16, 16)).astype(np.float32)}]
    q = quantize_static(fold_batchnorm(mini_convnet(rng)), feeds)
    assert isinstance(_import_quantized(q), QExecModel)
    monkeypatch.setenv("INFUR_INT8_NHWC", "0")
    assert isinstance(_import_quantized(q), ImportedModel)

    g = GraphBuilder("soft")
    x = g.input("x", np.float32, (1, 3, 8, 8))
    g.output(g.node("Softmax", [x], axis=1), np.float32, (1, 3, 8, 8))
    monkeypatch.delenv("INFUR_INT8_NHWC")
    assert isinstance(_import_quantized(g.model()), ImportedModel)


def test_nhwc_input_layout(rng):
    """input_layout="NHWC": feeds arrive channels-last (the fused Pallas
    ingest's output layout), results identical to the NCHW contract."""
    from test_quantize import mini_convnet
    feeds = [{"x": rng.normal(size=(1, 3, 16, 16)).astype(np.float32)}]
    q = quantize_static(fold_batchnorm(mini_convnet(rng)), feeds)
    a = compile_qexec(q, input_layout="NCHW")
    b = compile_qexec(q, input_layout="NHWC")
    x = feeds[0]["x"]
    ra = {k: np.asarray(v) for k, v in a({"x": x}).items()}
    rb = {k: np.asarray(v)
          for k, v in b({"x": x.transpose(0, 2, 3, 1)}).items()}
    for k in ra:
        np.testing.assert_array_equal(ra[k], rb[k])


@pytest.mark.slow
def test_model_stage_int8_mesh_dp(rng):
    """``lraspp:int8:mesh=2x1``: batch-data-parallel quantized serving on
    the virtual CPU mesh — results equal the unsharded executable, odd
    batches pad loudly and crop (VERDICT r4 #5)."""
    import warnings

    from infur_tpu.model_stage import Load, ModelStage

    st = ModelStage()
    st.control(Load("lraspp:int8:mesh=2x1"))
    b = st._backend
    assert b._int8_mesh is not None
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32) \
        if getattr(b._int8, "input_layout", "NCHW") == "NHWC" \
        else rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    sharded = {k: np.asarray(v) for k, v in b(x).items()}
    plain = {k: np.asarray(v)
             for k, v in b._int8({b._int8.input_info[0].name: x}).items()}
    for k in plain:
        np.testing.assert_array_equal(sharded[k], plain[k])
    # odd batch: loud pad + crop
    x3 = np.concatenate([x, x[:1]], axis=0)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out3 = {k: np.asarray(v) for k, v in b(x3).items()}
    assert any("not divisible" in str(w.message) for w in caught)
    assert out3["out"].shape[0] == 3

    from infur_tpu.errors import ModelLoadError
    with pytest.raises(ModelLoadError):  # spatial sharding is not offered
        ModelStage().control(Load("lraspp:int8:mesh=2x2"))


def test_model_stage_keyed_ingest_lossless(rng, monkeypatch):
    """The app model path's keyed dirty-chunk H2D (VERDICT r4 #3): the
    rebuilt device frame is byte-identical to the host frame, cap
    overflow refreshes the key, and INFUR_APP_INGEST=dense disables."""
    import infur_tpu.ops as ops_pkg
    from infur_tpu.model_stage import ModelStage

    monkeypatch.setattr(ops_pkg, "on_tpu", lambda: True)
    st = ModelStage()
    n = 64 * 600  # chunks cleanly; > the 512-chunk key cap when all-dirty
    f1 = rng.integers(0, 256, n, dtype=np.int16).astype(np.uint8)
    d1 = st._keyed_ingest(f1)  # first frame: dense upload becomes the key
    np.testing.assert_array_equal(np.asarray(d1), f1)
    f2 = f1.copy()
    f2[128:192] ^= 255  # one dirty chunk
    d2 = st._keyed_ingest(f2)
    np.testing.assert_array_equal(np.asarray(d2), f2)  # lossless rebuild
    assert np.array_equal(st._ikey["host"], f1)  # key unchanged (delta hit)
    f3 = rng.integers(0, 256, n, dtype=np.int16).astype(np.uint8)
    d3 = st._keyed_ingest(f3)  # everything dirty: cap overflow -> refresh
    np.testing.assert_array_equal(np.asarray(d3), f3)
    assert np.array_equal(st._ikey["host"], f3)
    monkeypatch.setenv("INFUR_APP_INGEST", "dense")
    assert st._keyed_ingest(f1) is None


def test_weights_as_args_bit_identical(rng):
    """weights="args" routes the conv weights/biases through the params
    argument (the bf16-model pattern; the executable sheds its ~MB of
    embedded constants) — same arrays, same ops, bit-identical results;
    calling fn without the params is a loud KeyError, not silence."""
    # 16x16x3x3 s8 = 2304 B: over the 1 KiB routing threshold
    m, out = _qconv_model(rng, 3, 3, 1, 1, (1,) * 4, 1, 16, 16, 20, 22, 97)
    baked = compile_qexec(m)
    via_args = compile_qexec(m, weights="args")
    assert baked.params == {} and via_args.params
    x = rng.integers(0, 256, size=(1, 16, 20, 22)).astype(np.uint8)
    x8 = (x.astype(np.int16) - 128).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(baked({"x": x8})[out]),
                                  np.asarray(via_args({"x": x8})[out]))
    with pytest.raises(KeyError, match="pass model.params"):
        via_args.fn({}, {"x": x8})
    with pytest.raises(ValueError, match="baked|args"):
        compile_qexec(m, weights="frozen")
