"""Compositional fuzz: random ONNX graphs, oracle vs importer.

The curated op-parity sweep (test_op_parity.py) checks ops in isolation;
this harness composes them randomly — shape plumbing, broadcast, and
dtype interactions between ops are where independent implementations
drift.  Seeded, so failures reproduce.
"""

import numpy as np
import pytest

from infur_tpu.onnx import GraphBuilder, import_model, run_model


def _rand_graph(rng: np.random.Generator, idx: int):
    """A random chain/DAG over a safe op subset, f32, static shapes."""
    g = GraphBuilder(f"fuzz_{idx}")
    c = int(rng.integers(2, 6))
    h = int(rng.integers(6, 13))
    w = int(rng.integers(6, 13))
    x = g.input("x", np.float32, (1, c, h, w))
    pool = [(x, (1, c, h, w))]  # (name, shape)

    def t(shape):
        return (rng.normal(size=shape) * 0.5).astype(np.float32)

    n_ops = int(rng.integers(3, 9))
    for _ in range(n_ops):
        name, shape = pool[int(rng.integers(len(pool)))]
        _, cc, hh, ww = shape
        op = rng.choice(["conv", "relu", "sigmoid", "add", "mul", "gelu",
                         "maxpool", "avgpool", "bn", "softmax", "ln_hw",
                         "concat_self", "gap", "resize"])
        if op == "conv":
            m = int(rng.integers(2, 6))
            k = int(rng.choice([1, 3]))
            y = g.node("Conv", [name, g.init(g.fresh("w"), t((m, cc, k, k))),
                                g.init(g.fresh("b"), t((m,)))],
                       pads=[k // 2] * 4)
            pool.append((y, (1, m, hh, ww)))
        elif op in ("relu", "sigmoid", "gelu", "softmax"):
            onnx_op = {"relu": "Relu", "sigmoid": "Sigmoid",
                       "gelu": "Gelu", "softmax": "Softmax"}[op]
            kw = {"axis": 1} if op == "softmax" else {}
            pool.append((g.node(onnx_op, [name], **kw), shape))
        elif op in ("add", "mul"):
            onnx_op = "Add" if op == "add" else "Mul"
            if rng.random() < 0.5:  # channel-broadcast constant
                other = g.init(g.fresh("k"), t((1, cc, 1, 1)))
            else:
                other = g.node("Relu", [name])  # same-shape activation
            pool.append((g.node(onnx_op, [name, other]), shape))
        elif op == "maxpool" and hh >= 4 and ww >= 4:
            y = g.node("MaxPool", [name], kernel_shape=[2, 2],
                       strides=[2, 2])
            pool.append((y, (1, cc, hh // 2, ww // 2)))
        elif op == "avgpool" and hh >= 4 and ww >= 4:
            y = g.node("AveragePool", [name], kernel_shape=[2, 2],
                       strides=[2, 2])
            pool.append((y, (1, cc, hh // 2, ww // 2)))
        elif op == "bn":
            y = g.node("BatchNormalization", [
                name,
                g.init(g.fresh("s"), np.abs(t((cc,))) + 0.5),
                g.init(g.fresh("b"), t((cc,))),
                g.init(g.fresh("m"), t((cc,))),
                g.init(g.fresh("v"), np.abs(t((cc,))) + 0.5)],
                epsilon=1e-5)
            pool.append((y, shape))
        elif op == "ln_hw":
            # LayerNormalization over the last axis (W)
            y = g.node("LayerNormalization", [
                name, g.init(g.fresh("ls"), np.abs(t((ww,))) + 0.5),
                g.init(g.fresh("lb"), t((ww,)))], epsilon=1e-5)
            pool.append((y, shape))
        elif op == "concat_self":
            y = g.node("Concat", [name, name], axis=1)
            pool.append((y, (1, 2 * cc, hh, ww)))
        elif op == "gap":
            y = g.node("GlobalAveragePool", [name])
            pool.append((y, (1, cc, 1, 1)))
        elif op == "resize" and hh <= 16 and ww <= 16:
            y = g.node("Resize", [name, "", "",
                                  g.const(np.asarray((1, cc, hh * 2, ww * 2),
                                                     np.int64))],
                       mode="linear",
                       coordinate_transformation_mode="half_pixel")
            pool.append((y, (1, cc, hh * 2, ww * 2)))
    out_name, out_shape = pool[-1]
    g.output(g.node("Identity", [out_name], outputs=["out"]), np.float32,
             out_shape)
    return g.model(), (1, c, h, w)


@pytest.mark.parametrize("seed", range(12))
def test_random_graph_oracle_vs_importer(seed):
    rng = np.random.default_rng(1000 + seed)
    model, in_shape = _rand_graph(rng, seed)
    feed = {"x": (rng.normal(size=in_shape) * 0.5).astype(np.float32)}
    want = run_model(model, feed)["out"]
    got = np.asarray(import_model(model)(feed)["out"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
