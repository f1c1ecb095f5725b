"""Params checkpoint I/O (npz flat format).

The reference has no model checkpointing (models are opaque ONNX files);
native model families here need one.  Format: a single ``.npz`` whose keys
are ``/``-joined pytree paths — loadable without knowing the tree shape,
and diffable with plain numpy tooling.  (orbax is available for sharded
multi-host checkpoints later; this flat format is the portable baseline.)
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k.startswith("#"):
                raise ValueError(f"dict key {k!r} collides with the list marker")
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        # "#<i>" marks list indices unambiguously (a dict with digit-string
        # keys must round-trip as a dict, not silently become a list)
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> Any:
    root: dict = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def listify(node: Any) -> Any:
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.startswith("#") for k in keys):
            want = {f"#{i}" for i in range(len(keys))}
            if set(keys) != want:
                raise ValueError(f"non-contiguous list indices: {sorted(keys)}")
            return [listify(node[f"#{i}"]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(path: str, params: Any) -> None:
    np.savez(path, **_flatten(params))


def load_params(path: str) -> Any:
    if os.path.isdir(path):
        return load_params_orbax(path)
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})


# -- resumable train state (params + optimizer state + step) ---------------

def save_train_state(path: str, params: Any, opt_state: Any,
                     step: int = 0) -> None:
    """One ``.npz`` holding params (named pytree paths), the optimizer
    state's leaves (positional — optax states are namedtuples whose
    structure comes from ``tx.init``), and the step counter."""
    import jax
    flat = {f"params/{k}": v for k, v in _flatten(params).items()}
    for i, leaf in enumerate(jax.tree.leaves(opt_state)):
        flat[f"opt/{i}"] = np.asarray(leaf)
    flat["step"] = np.asarray(step, np.int64)
    np.savez(path, **flat)


def load_train_state(path: str, tx: Any) -> tuple[Any, Any, int]:
    """Restore (params, opt_state, step).  ``tx`` (the same optax
    transformation) provides the opt-state treedef via ``tx.init``."""
    import jax
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten({k[len("params/"):]: v for k, v in flat.items()
                         if k.startswith("params/")})
    n = sum(1 for k in flat if k.startswith("opt/"))
    leaves = [flat[f"opt/{i}"] for i in range(n)]
    template = tx.init(params)
    treedef = jax.tree.structure(template)
    want = treedef.num_leaves
    if want != n:
        raise ValueError(
            f"optimizer state mismatch: checkpoint has {n} leaves, "
            f"tx.init produces {want} (different optimizer?)")
    opt_state = jax.tree.unflatten(treedef, leaves)
    return params, opt_state, int(flat["step"])


# -- orbax backend: sharded/async checkpoints for multi-chip params --------

def save_params_orbax(path: str, params: Any) -> None:
    """Checkpoint a (possibly NamedSharding-sharded) params pytree with
    orbax — each host writes its shards; restores re-shard on load."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_params_orbax(path: str, like: Any = None) -> Any:
    """Restore an orbax checkpoint directory; ``like`` (a pytree of arrays
    or ShapeDtypeStructs with shardings) controls placement on restore."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(os.path.abspath(path))
        return ckptr.restore(os.path.abspath(path), like)
