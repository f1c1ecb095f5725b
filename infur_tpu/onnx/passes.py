"""Graph rewrite passes on GraphProto.

``fold_batchnorm`` is the prerequisite for static quantization: inference
BN is an affine per-channel transform, so Conv -> BatchNormalization
collapses into the Conv's weights/bias (the same fold every production
quantizer performs before emitting QLinearConv).
"""

from __future__ import annotations

import numpy as np

from infur_tpu.onnx.proto import (
    GraphProto, ModelProto, make_model, numpy_to_tensor, tensor_to_numpy,
)


def _consumers(graph: GraphProto, name: str) -> list:
    return [n for n in graph.node if name in n.input]


def fold_batchnorm(model: ModelProto) -> ModelProto:
    """Fold Conv->BatchNormalization pairs; returns a new model.

    Only folds when the Conv's output feeds exactly the BN and the BN's
    parameters are initializers.  Other BNs are left in place.
    """
    from infur_tpu.onnx.proto import make_node

    g = model.graph
    inits = {t.name: tensor_to_numpy(t) for t in g.initializer}
    # deep-copy nodes so the input model is left untouched
    g_nodes = [make_node(n.op_type, list(n.input), list(n.output),
                         name=n.name, domain=n.domain, **n.attrs())
               for n in g.node]
    producers = {}
    for n in g_nodes:
        for o in n.output:
            producers[o] = n

    drop: set[int] = set()
    rename: dict[str, str] = {}
    new_inits = dict(inits)

    for bi, bn in enumerate(g_nodes):
        if bn.op_type != "BatchNormalization":
            continue
        conv = producers.get(bn.input[0])
        if conv is None or conv.op_type != "Conv":
            continue
        if len([n for n in g_nodes if conv.output[0] in n.input]) != 1:
            continue
        if any(o.name == conv.output[0] for o in g.output):
            continue  # conv output doubles as a graph output: keep the BN
        names = list(bn.input[1:5])
        if not all(nm in new_inits for nm in names) or \
                conv.input[1] not in new_inits:
            continue
        scale, bias, mean, var = (new_inits[nm] for nm in names)
        eps = bn.attrs().get("epsilon", 1e-5)
        k = (scale / np.sqrt(var + eps)).astype(np.float32)

        w = new_inits[conv.input[1]]
        w2 = (w * k.reshape(-1, 1, 1, 1)).astype(np.float32)
        b_src = conv.input[2] if len(conv.input) > 2 and conv.input[2] else None
        b = new_inits[b_src] if b_src else np.zeros(w.shape[0], np.float32)
        b2 = ((b - mean) * k + bias).astype(np.float32)

        wname = conv.input[1] + "_bnfold"
        bname = (b_src or conv.output[0] + "_bias") + "_bnfold"
        new_inits[wname] = w2
        new_inits[bname] = b2
        conv.input[:] = [conv.input[0], wname, bname]
        # conv now produces the BN's output name directly
        rename[conv.output[0]] = bn.output[0]
        conv.output[0] = bn.output[0]
        drop.add(bi)

    nodes = [n for i, n in enumerate(g_nodes) if i not in drop]
    for n in nodes:
        n.input[:] = [rename.get(i, i) for i in n.input]

    g2 = GraphProto(name=g.name, node=nodes, input=list(g.input),
                    output=list(g.output))
    used = set()
    for n in nodes:
        used.update(n.input)
    g2.initializer = [numpy_to_tensor(arr, nm)
                      for nm, arr in new_inits.items() if nm in used]
    return make_model(g2)
