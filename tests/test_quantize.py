"""Static int8 quantization: BN folding, calibration, QLinear rewrite.

Mirrors the reference's flagship-model situation (an ort-statically-
quantized FCN-ResNet50): here the framework *produces* the int8 model and
then runs it through both executors (NumPy oracle, JAX importer) —
integer semantics must agree exactly, and the int8 masks must track f32.
"""

import numpy as np
import pytest

from infur_tpu.onnx import GraphBuilder, import_model, run_model
from infur_tpu.onnx.passes import fold_batchnorm
from infur_tpu.onnx.quantize import calibrate, quantize_static


def mini_convnet(rng, with_bn=True):
    """Conv-BN-Relu x2 with a residual Add, MaxPool head — the structural
    motifs of the FCN backbone at toy size."""
    g = GraphBuilder("mini")
    x = g.input("x", np.float32, (1, 3, 16, 16))
    w1 = g.init("w1", rng.normal(size=(8, 3, 3, 3)).astype(np.float32) * 0.3)
    y = g.node("Conv", [x, w1], pads=[1, 1, 1, 1])
    if with_bn:
        y = g.node("BatchNormalization", [
            y, g.init("s1", rng.uniform(0.5, 2, 8).astype(np.float32)),
            g.init("b1", rng.normal(size=8).astype(np.float32)),
            g.init("m1", rng.normal(size=8).astype(np.float32) * 0.1),
            g.init("v1", rng.uniform(0.5, 2, 8).astype(np.float32))],
            epsilon=1e-5)
    y = g.node("Relu", [y])
    skip = y
    w2 = g.init("w2", rng.normal(size=(8, 8, 3, 3)).astype(np.float32) * 0.2)
    b2 = g.init("b2", rng.normal(size=8).astype(np.float32) * 0.1)
    y = g.node("Conv", [y, w2, b2], pads=[1, 1, 1, 1])
    y = g.node("Relu", [y])
    y = g.node("Add", [y, skip])
    y = g.node("MaxPool", [y], kernel_shape=[2, 2], strides=[2, 2])
    g.output(y, np.float32, (1, 8, 8, 8))
    return g.model()


@pytest.fixture()
def feeds(rng):
    return [{"x": rng.normal(size=(1, 3, 16, 16)).astype(np.float32)}
            for _ in range(4)]


def test_fold_batchnorm_preserves_outputs(rng, feeds):
    model = mini_convnet(rng)
    folded = fold_batchnorm(model)
    assert not any(n.op_type == "BatchNormalization" for n in folded.graph.node)
    for f in feeds[:2]:
        a = run_model(model, f)
        b = run_model(folded, f)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-5)


def test_calibrate_covers_all_activations(rng, feeds):
    model = fold_batchnorm(mini_convnet(rng))
    ranges = calibrate(model, feeds)
    assert "x" in ranges
    for n in model.graph.node:
        for o in n.output:
            assert o in ranges, f"missing range for {o}"
    for lo, hi in ranges.values():
        assert lo <= hi


def test_quantized_graph_structure(rng, feeds):
    q = quantize_static(fold_batchnorm(mini_convnet(rng)), feeds)
    ops = [n.op_type for n in q.graph.node]
    assert ops.count("QLinearConv") == 2
    assert "QLinearAdd" in ops
    assert "Conv" not in ops and "Add" not in ops and "Relu" not in ops
    assert ops.count("QuantizeLinear") >= 1      # graph entry
    assert ops.count("DequantizeLinear") >= 1    # graph exit
    # weights are stored s8
    from infur_tpu.onnx.proto import tensor_to_numpy
    s8_kernels = [t for t in q.graph.initializer
                  if tensor_to_numpy(t).dtype == np.int8
                  and tensor_to_numpy(t).ndim == 4]
    assert len(s8_kernels) == 2


def test_int8_oracle_importer_exact_agreement(rng, feeds):
    q = quantize_static(fold_batchnorm(mini_convnet(rng)), feeds)
    imported = import_model(q)
    f = feeds[0]
    a = run_model(q, f)
    b = imported(f)
    for k in a:
        mismatch = (a[k] != np.asarray(b[k])).mean()
        assert mismatch < 0.005, f"{k}: {mismatch:.4f} of elements differ"


def test_int8_tracks_f32(rng, feeds):
    model = fold_batchnorm(mini_convnet(rng))
    q = quantize_static(model, feeds)
    f = feeds[0]
    y32 = next(iter(run_model(model, f).values()))
    y8 = next(iter(run_model(q, f).values()))
    err = np.abs(y32 - y8).mean() / (np.abs(y32).mean() + 1e-9)
    assert err < 0.1, f"relative int8 error too large: {err:.3f}"


def test_fcn_resnet50_int8_end_to_end(rng):
    """The flagship path at reduced size: export native FCN -> fold BN ->
    quantize -> run int8 via the importer -> masks track f32."""
    import jax

    from infur_tpu.models import fcn_resnet50_to_onnx, init_fcn_resnet50

    params = init_fcn_resnet50(jax.random.PRNGKey(0))
    model = fcn_resnet50_to_onnx(params, (32, 32))
    folded = fold_batchnorm(model)
    assert not any(n.op_type == "BatchNormalization"
                   for n in folded.graph.node)
    feeds = [{"input": rng.normal(size=(1, 3, 32, 32)).astype(np.float32)}
             for _ in range(2)]
    q = quantize_static(folded, feeds)
    assert sum(n.op_type == "QLinearConv" for n in q.graph.node) == 57
    imported = import_model(q)
    out8 = np.asarray(imported(feeds[0])["out"])
    out32 = run_model(folded, feeds[0])["out"]
    m8, m32 = out8.argmax(1), out32.argmax(1)
    agreement = (m8 == m32).mean()
    assert agreement > 0.85, f"int8 mask agreement {agreement:.3f}"


def test_fold_keeps_bn_when_conv_output_is_graph_output(rng):
    """Folding must not orphan a graph output that aliases the conv output."""
    g = GraphBuilder("edge")
    x = g.input("x", np.float32, (1, 2, 4, 4))
    w = g.init("w", rng.normal(size=(2, 2, 1, 1)).astype(np.float32))
    conv_out = g.node("Conv", [x, w])
    bn_out = g.node("BatchNormalization", [
        conv_out, g.init("s", np.ones(2, np.float32)),
        g.init("b", np.zeros(2, np.float32)),
        g.init("m", np.zeros(2, np.float32)),
        g.init("v", np.ones(2, np.float32))])
    g.output(conv_out, np.float32, (1, 2, 4, 4))  # conv output IS an output
    g.output(bn_out, np.float32, (1, 2, 4, 4))
    model = g.model()
    folded = fold_batchnorm(model)
    feeds = {"x": rng.normal(size=(1, 2, 4, 4)).astype(np.float32)}
    a, b = run_model(model, feeds), run_model(folded, feeds)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5)


def test_grouped_depthwise_conv_quantizes_exactly(rng):
    """Depthwise (grouped) convs — the MobileNetV3/LRASPP motif — survive
    quantization: the group attr rides through to QLinearConv and both
    executors agree bit-exactly on the integer path."""
    g = GraphBuilder("dw")
    x = g.input("x", np.float32, (1, 8, 16, 16))
    w1 = g.init("w1", rng.normal(size=(8, 1, 3, 3)).astype(np.float32) * 0.4)
    y = g.node("Conv", [x, w1], pads=[1, 1, 1, 1], group=8)  # depthwise
    y = g.node("Relu", [y])
    w2 = g.init("w2", rng.normal(size=(12, 8, 1, 1)).astype(np.float32) * 0.3)
    y = g.node("Conv", [y, w2])  # pointwise
    y = g.node("Relu", [y])
    g.output(y, np.float32, (1, 12, 16, 16))
    model = g.model()

    feeds = [{"x": rng.normal(size=(1, 8, 16, 16)).astype(np.float32)}
             for _ in range(4)]
    qmodel = quantize_static(model, feeds)
    qops = [n.op_type for n in qmodel.graph.node]
    assert qops.count("QLinearConv") == 2, qops
    dw = [n for n in qmodel.graph.node if n.op_type == "QLinearConv"][0]
    assert dict(dw.attrs()).get("group") == 8

    feed = feeds[0]
    oracle = run_model(qmodel, feed)
    imported = import_model(qmodel)(feed)
    for k in oracle:
        np.testing.assert_array_equal(
            oracle[k], np.asarray(imported[k]),
            err_msg="int8 grouped conv: oracle vs importer")
    # int8 tracks f32
    f32 = run_model(model, feed)
    for k in f32:
        scale = max(np.abs(f32[k]).max(), 1e-6)
        assert np.abs(oracle[k] - f32[k]).max() / scale < 0.15


def test_lut_activation_exact(rng):
    """Sigmoid/HardSwish/etc. quantize to a baked QLookupTable: the table
    is the op, so oracle == importer bit-exactly and the dequantized
    output tracks f32 within a quantization step."""
    g = GraphBuilder("lut")
    x = g.input("x", np.float32, (1, 4, 8, 8))
    w = g.init("w", rng.normal(size=(4, 4, 1, 1)).astype(np.float32) * 0.5)
    y = g.node("Conv", [x, w])
    y = g.node("HardSwish", [y])
    y = g.node("Sigmoid", [y])
    g.output(y, np.float32, (1, 4, 8, 8))
    model = g.model()
    feeds = [{"x": rng.normal(size=(1, 4, 8, 8)).astype(np.float32)}
             for _ in range(4)]
    qmodel = quantize_static(model, feeds)
    qops = [n.op_type for n in qmodel.graph.node]
    assert qops.count("QLookupTable") == 2, qops
    oracle = run_model(qmodel, feeds[0])
    imported = import_model(qmodel)(feeds[0])
    for k in oracle:
        np.testing.assert_array_equal(oracle[k], np.asarray(imported[k]))
    f32 = run_model(model, feeds[0])
    for k in f32:  # sigmoid output in (0,1): scale ~1/255
        assert np.abs(oracle[k] - f32[k]).max() < 0.02


def test_qlinear_mul_exact(rng):
    """Mul of two quantized activations -> QLinearMul (integer product +
    fixed-point requant), broadcast included."""
    g = GraphBuilder("mul")
    x = g.input("x", np.float32, (1, 4, 8, 8))
    w = g.init("w", rng.normal(size=(4, 4, 1, 1)).astype(np.float32) * 0.5)
    a = g.node("Conv", [x, w])
    s = g.node("GlobalAveragePool", [a])
    s = g.node("Sigmoid", [s])
    y = g.node("Mul", [a, s])  # (1,4,8,8) * (1,4,1,1) broadcast
    g.output(y, np.float32, (1, 4, 8, 8))
    model = g.model()
    feeds = [{"x": rng.normal(size=(1, 4, 8, 8)).astype(np.float32)}
             for _ in range(4)]
    qmodel = quantize_static(model, feeds)
    qops = [n.op_type for n in qmodel.graph.node]
    assert "QLinearMul" in qops and "QLinearGlobalAveragePool" in qops, qops
    oracle = run_model(qmodel, feeds[0])
    imported = import_model(qmodel)(feeds[0])
    for k in oracle:
        np.testing.assert_array_equal(oracle[k], np.asarray(imported[k]))
    f32 = run_model(model, feeds[0])
    for k in f32:
        scale = max(np.abs(f32[k]).max(), 1e-6)
        assert np.abs(oracle[k] - f32[k]).max() / scale < 0.1


def test_qlinear_resize_integer_exact(rng):
    """Linear Resize between quantized ops stays integer (QLinearResize,
    scale/zp passthrough) and matches f32 Resize within interpolation of
    one quantization step."""
    g = GraphBuilder("rsz")
    x = g.input("x", np.float32, (1, 3, 8, 8))
    w = g.init("w", rng.normal(size=(6, 3, 1, 1)).astype(np.float32) * 0.5)
    y = g.node("Conv", [x, w])
    y = g.node("Relu", [y])
    y = g.node("Resize", [y, "", "", g.const(np.asarray([1, 6, 16, 16],
                                                        np.int64))],
               mode="linear", coordinate_transformation_mode="half_pixel")
    w2 = g.init("w2", rng.normal(size=(6, 6, 1, 1)).astype(np.float32) * 0.3)
    y = g.node("Conv", [y, w2])
    g.output(y, np.float32, (1, 6, 16, 16))
    model = g.model()
    feeds = [{"x": rng.normal(size=(1, 3, 8, 8)).astype(np.float32)}
             for _ in range(4)]
    qmodel = quantize_static(model, feeds)
    qops = [n.op_type for n in qmodel.graph.node]
    assert "QLinearResize" in qops, qops
    assert "Resize" not in qops
    oracle = run_model(qmodel, feeds[0])
    imported = import_model(qmodel)(feeds[0])
    for k in oracle:
        np.testing.assert_array_equal(oracle[k], np.asarray(imported[k]))
    f32 = run_model(model, feeds[0])
    for k in f32:
        scale = max(np.abs(f32[k]).max(), 1e-6)
        assert np.abs(oracle[k] - f32[k]).max() / scale < 0.1


def test_int8_lraspp_end_to_end_bit_exact(rng):
    """The second real architecture through the full int8 pipeline: the
    quantized LRASPP graph is integer from the entry QuantizeLinear to the
    boundary Dequantize (LUT activations, QLinearMul SE gates, quantized
    GAP, integer Resize), oracle == importer bit-exactly, and the int8
    mask tracks f32."""
    import jax
    from infur_tpu.models.lraspp_mobilenetv3 import (
        init_lraspp_mobilenet_v3_large, lraspp_apply, lraspp_to_onnx,
    )
    from infur_tpu.onnx.passes import fold_batchnorm

    p = init_lraspp_mobilenet_v3_large(jax.random.PRNGKey(3))
    model = lraspp_to_onnx(p)
    feeds = [{"input": rng.normal(size=(1, 3, 64, 64)).astype(np.float32) * 0.5}
             for _ in range(3)]
    qmodel = quantize_static(fold_batchnorm(model), feeds)
    # fully integer interior: nothing f32 between entry quant + exit dequant
    f32_ops = [n.op_type for n in qmodel.graph.node
               if n.op_type in ("Conv", "Mul", "Add", "Resize", "Sigmoid",
                                "HardSwish", "HardSigmoid",
                                "GlobalAveragePool")]
    assert not f32_ops, f32_ops
    oracle = run_model(qmodel, feeds[0])["out"]
    got = np.asarray(import_model(qmodel)(feeds[0])["out"])
    np.testing.assert_array_equal(oracle, got)
    f32 = np.asarray(lraspp_apply(
        p, np.ascontiguousarray(np.transpose(feeds[0]["input"],
                                             (0, 2, 3, 1))))["out"])
    agree = (np.argmax(oracle, axis=1) == np.argmax(f32, axis=1)).mean()
    assert agree > 0.9, agree


def test_int8_segformer_transformer_graph_mixed(rng):
    """The legacy mixed-precision scheme (``transformer_int=False``):
    every dense (activation @ weight) MatMul becomes QLinearMatMul while
    the 16 activation-activation attention matmuls (2 per block) stay
    f32.  Oracle and importer agree bit-exactly on the quantized graph.
    The fully-integer default scheme is covered by tests/test_qint.py."""
    import jax
    from infur_tpu.models.segformer import init_segformer, segformer_to_onnx
    from infur_tpu.onnx import import_model, run_model
    from infur_tpu.onnx.quantize import quantize_static

    p = init_segformer(jax.random.PRNGKey(0), num_classes=5)
    model = segformer_to_onnx(p, (32, 32))
    feeds = [{"input": rng.normal(size=(1, 3, 32, 32)).astype(np.float32)}
             for _ in range(2)]
    qm = quantize_static(model, feeds, transformer_int=False)
    ops = {}
    for n in qm.graph.node:
        ops[n.op_type] = ops.get(n.op_type, 0) + 1
    assert ops["QLinearMatMul"] == 44      # 60 total - 16 act@act
    assert ops["MatMul"] == 16
    assert ops["QLinearConv"] == 20        # patch embeds, sr convs, dwconvs

    out_q = run_model(qm, feeds[0])["out"]
    out_j = np.asarray(import_model(qm)({"input": feeds[0]["input"]})["out"])
    np.testing.assert_array_equal(out_q, out_j)  # executors bit-exact
    out_f = run_model(model, feeds[0])["out"]
    agree = (out_f.argmax(1) == out_q.argmax(1)).mean()
    assert agree > 0.75, f"int8 mask diverged too far: {agree}"
