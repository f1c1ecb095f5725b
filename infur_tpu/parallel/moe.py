"""Mixture-of-Experts FFN with expert parallelism over an ``expert`` axis.

Switch-Transformer-style top-1 routed MoE, built the GSPMD way: expert
weights are stacked along a leading expert axis and sharded over the
mesh's ``expert`` dimension with ``NamedSharding``; the dispatch/combine
einsums then force XLA to insert the all-to-all-shaped collectives over
ICI.  No manual collectives — annotate shardings, let GSPMD partition
(scaling-book recipe), same design stance as :mod:`infur_tpu.parallel.mesh`.

Numerics: top-1 routing makes the dispatch/combine einsums one-hot
selections — the cross-shard sums they induce add exact zeros, so routing
itself introduces **no** sharding error; the only divergence vs the
replicated result is XLA's within-expert matmul tiling (low-bit f32
reassociation when the local expert count changes).  Pinned at 1e-6 by
``tests/test_pipeline_moe.py``.

Routing is capacity-based and deterministic (argmax; position-in-expert by
cumulative sum, overflow tokens fall through to the residual path), which
keeps the whole thing jit-static: fixed shapes (T, E, C), no data-dependent
control flow — XLA-friendly by construction.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_moe_ffn(key: jax.Array, d_model: int, d_ff: int,
                 n_experts: int) -> dict[str, Any]:
    """Router + stacked expert MLPs.  Leaves with a leading ``n_experts``
    dim shard over the ``expert`` mesh axis (see :func:`shard_moe_params`)."""
    ks = jax.random.split(key, 3)

    def u(k, shape):
        lim = float(np.sqrt(6.0 / (shape[-2] + shape[-1])))
        return jax.random.uniform(k, shape, jnp.float32, -lim, lim)

    return {
        "router": u(ks[0], (d_model, n_experts)),
        "router_b": jnp.zeros((n_experts,), jnp.float32),
        "w1": u(ks[1], (n_experts, d_model, d_ff)),
        "b1": jnp.zeros((n_experts, d_ff), jnp.float32),
        "w2": u(ks[2], (n_experts, d_ff, d_model)),
        "b2": jnp.zeros((n_experts, d_model), jnp.float32),
    }


def moe_capacity(n_tokens: int, n_experts: int,
                 capacity_factor: float = 1.25) -> int:
    """Per-expert token capacity C = ceil(T/E * factor) (Switch §2.2)."""
    return max(1, math.ceil(n_tokens / n_experts * capacity_factor))


def moe_ffn_apply(p: dict[str, Any], x_td: jax.Array,
                  capacity_factor: float = 1.25,
                  router_dtype: Any = jnp.float32
                  ) -> tuple[jax.Array, jax.Array]:
    """Top-1 routed expert FFN on a flat token matrix.

    Args:
      p: params from :func:`init_moe_ffn`.
      x_td: (T, d_model) tokens.
      capacity_factor: per-expert capacity slack; overflow tokens emit 0
        from the MoE (their residual connection carries them unchanged).
      router_dtype: router softmax dtype (f32 for stable gates).

    Returns:
      (y_td, aux_loss) — the combined expert outputs (gate-weighted) and
      the Switch load-balancing auxiliary loss (E * sum_e f_e * P_e).
    """
    t, d = x_td.shape
    e = p["router"].shape[1]
    c = moe_capacity(t, e, capacity_factor)

    logits = (x_td.astype(router_dtype) @ p["router"].astype(router_dtype)
              + p["router_b"].astype(router_dtype))
    probs = jax.nn.softmax(logits, axis=-1)              # (T, E)
    expert = jnp.argmax(probs, axis=-1)                  # (T,)
    gate = jnp.max(probs, axis=-1)                       # (T,)

    onehot = jax.nn.one_hot(expert, e, dtype=router_dtype)       # (T, E)
    # position of each token within its expert's queue (0-based)
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0              # (T, E)
    within = (pos >= 0) & (pos < c)
    dispatch = onehot * within                                    # (T, E)
    # (T, E, C): one-hot over the capacity slot
    slot = jax.nn.one_hot(jnp.clip(pos, 0, c - 1).astype(jnp.int32), c,
                          dtype=x_td.dtype) * dispatch[..., None]

    # Switch aux loss: fraction routed to e  *  mean router prob of e
    frac = dispatch.mean(axis=0)
    mean_prob = probs.mean(axis=0)
    aux = (frac * mean_prob).sum() * e

    xin = jnp.einsum("tec,td->ecd", slot, x_td)                  # (E, C, d)
    h = jnp.einsum("ecd,edf->ecf", xin, p["w1"].astype(xin.dtype))
    h = jax.nn.gelu(h + p["b1"][:, None, :].astype(h.dtype))
    out = jnp.einsum("ecf,efd->ecd", h, p["w2"].astype(h.dtype))
    out = out + p["b2"][:, None, :].astype(out.dtype)

    combine = slot * gate.astype(slot.dtype)[:, None, None]      # (T, E, C)
    y = jnp.einsum("tec,ecd->td", combine, out)
    return y, aux.astype(jnp.float32)


_EXPERT_STACKED = frozenset({"w1", "b1", "w2", "b2"})


def shard_moe_params(p: dict[str, Any], mesh: Mesh,
                     axis: str = "expert") -> dict[str, Any]:
    """NamedShardings: expert-stacked leaves (w1/b1/w2/b2, leading dim E)
    shard dim 0 over ``axis``; the router replicates.  Keyed by name — a
    shape heuristic can't tell the (d_model, E) router from an (E, d) bias."""
    size = mesh.shape[axis]
    for name in _EXPERT_STACKED:
        assert p[name].shape[0] % size == 0, \
            f"{name}: {p[name].shape[0]} experts not divisible by {size}"
    return {k: NamedSharding(mesh, P(axis) if k in _EXPERT_STACKED else P())
            for k in p}
