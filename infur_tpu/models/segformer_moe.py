"""SegFormer-MoE: the SegFormer family with routed mixture-of-experts FFNs.

A capacity demonstration past the reference's scope (its one model is a
dense CNN — reference infur-test-gen/build.rs:88-93): the two deepest
encoder stages swap their Mix-FFN for a Switch-style top-1 routed MoE
(:mod:`infur_tpu.parallel.moe`), giving the framework a model whose weights
scale along an ``expert`` mesh axis — true expert parallelism, the "ep" in
the dp/tp/sp/pp/ep sharding set exercised by ``dryrun_multichip``.

Deviation from Mix-FFN, by design: expert FFNs are token-wise 2-layer MLPs
(no depthwise 3x3) — routed token dispatch and a spatial conv don't
compose; the attention path's spatial reduction already carries locality.

Same I/O contract as every family: ``apply(params, x_nhwc)`` returns
``{"out": (N, K, H, W) f32}`` at input resolution; the Switch
load-balancing loss is exposed separately for the train step.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infur_tpu.models.segformer import (
    CONFIGS, HEADS, PATCH, SR, _attn, _ln, _mixffn, init_segformer,
)
from infur_tpu.parallel.moe import init_moe_ffn, moe_ffn_apply

MOE_STAGES = (3, 4)  # 1-indexed encoder stages whose FFNs are routed


def init_segformer_moe(key: jax.Array, num_classes: int = 21,
                       variant: str = "b0", n_experts: int = 4,
                       moe_stages: tuple[int, ...] = MOE_STAGES
                       ) -> dict[str, Any]:
    """SegFormer params with MoE FFNs in ``moe_stages``.  Dense FFN weights
    of those blocks are replaced by a ``moe`` subtree (router + stacked
    experts, each sized like the dense Mix-FFN it replaces)."""
    k_dense, k_moe = jax.random.split(key)
    params = init_segformer(k_dense, num_classes, variant)
    dims = CONFIGS[variant]["dims"]
    mkeys = iter(jax.random.split(k_moe, 64))
    for s in moe_stages:
        d = dims[s - 1]
        for blk in params[f"stage{s}"]["blocks"]:
            for name in ("fc1", "fc1_b", "dw", "dw_b", "fc2", "fc2_b"):
                del blk[name]
            blk["moe"] = init_moe_ffn(next(mkeys), d, 4 * d, n_experts)
    return params


def _moe_block_ffn(x_nhwc: jax.Array, blk: dict[str, Any],
                   capacity_factor: float) -> tuple[jax.Array, jax.Array]:
    n, h, w, d = x_nhwc.shape
    tokens = x_nhwc.reshape(n * h * w, d)
    y, aux = moe_ffn_apply(blk["moe"], tokens, capacity_factor)
    return y.reshape(n, h, w, d).astype(x_nhwc.dtype), aux


def segformer_moe_forward(params: dict[str, Any], x_nhwc: jax.Array,
                          compute_dtype: str = "float32",
                          capacity_factor: float = 1.25
                          ) -> tuple[dict[str, jax.Array], jax.Array]:
    """Forward returning (logits dict, summed Switch aux loss)."""
    n, h0, w0, _ = x_nhwc.shape
    x = x_nhwc.astype(compute_dtype)
    feats = []
    aux_total = jnp.zeros((), jnp.float32)
    for s in range(4):
        st = params[f"stage{s + 1}"]
        k, stride = PATCH[s]
        pad = (k - 1) // 2
        x = lax.conv_general_dilated(
            x, st["patch_conv"].astype(x.dtype), (stride, stride),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype) \
            + st["patch_bias"].astype(x.dtype)
        x = _ln(x, st["patch_ln"])
        heads, sr = HEADS[s], SR[s]
        for blk in st["blocks"]:
            x = x + _attn(_ln(x, blk["ln1"]), blk, heads, sr)
            if "moe" in blk:
                y, aux = _moe_block_ffn(_ln(x, blk["ln2"]), blk,
                                        capacity_factor)
                x = x + y
                aux_total = aux_total + aux
            else:
                x = x + _mixffn(_ln(x, blk["ln2"]), blk)
        x = _ln(x, st["out_ln"])
        feats.append(x)

    from infur_tpu.models.segformer import _segformer_head
    return _segformer_head(params, feats, (n, h0, w0)), aux_total


@partial(jax.jit, static_argnames=("compute_dtype",))
def segformer_moe_apply(params: dict[str, Any], x_nhwc: jax.Array,
                        compute_dtype: str = "float32"
                        ) -> dict[str, jax.Array]:
    """Family-contract apply: {"out": (N, K, H, W) f32}."""
    with jax.default_matmul_precision(
            "highest" if compute_dtype == "float32" else "default"):
        logits, _ = segformer_moe_forward(params, x_nhwc, compute_dtype)
        return logits


def shard_segformer_moe_params(params: Any, mesh: Mesh,
                               axis: str = "expert") -> Any:
    """NamedShardings: expert-stacked leaves (inside ``moe`` subtrees)
    shard dim 0 over ``axis``; everything else replicates."""
    size = mesh.shape[axis]

    expert_stacked = {"w1", "b1", "w2", "b2"}

    def walk(tree, in_moe=False, name=""):
        if isinstance(tree, dict):
            return {k: walk(v, in_moe or k == "moe", k)
                    for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, in_moe, name) for v in tree]
        if in_moe and name in expert_stacked:
            assert tree.shape[0] % size == 0, \
                f"{name}: {tree.shape[0]} experts not divisible by {size}"
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return walk(params)
