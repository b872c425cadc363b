"""Checkpoint / resume for deterministic replay.

The reference has no persistence at all — its nearest analog is the
``set_pose`` service that resets odometry at runtime (SURVEY.md section 5;
odometer.cpp:169-187). Here: any pytree of arrays (PipelineState, EKFState,
BlockedState, ...) round-trips through a single ``.npz`` file together with
its tree structure, so a run can stop at tick t and resume bit-identically
(state + RNG key + step counter all live in the tree).

Design notes:
- npz rather than orbax: zero format/version risk, single-file artifact,
  loads anywhere numpy does. Leaves are host-transferred on save and
  device-put lazily on load.
- tree structure is stored as a JSON descriptor built from
  ``jax.tree_util.tree_flatten`` paths; mismatched structures fail loudly.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return ["/".join(str(k) for k in path) for path, _ in flat]


def save(path: str, tree: Any, step: int | None = None) -> None:
    """Write a pytree checkpoint. ``step`` is stored alongside if given."""
    flat, treedef = jax.tree_util.tree_flatten(tree)
    names = _paths(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    meta = {"names": names, "num_leaves": len(flat)}
    if step is not None:
        meta["step"] = int(step)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load(path: str, like: Any):
    """Load a checkpoint into the structure of ``like`` (a template pytree
    with matching treedef — dtypes/shapes are validated). Returns
    ``(tree, step)`` where step is None if not recorded."""
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    flat_like, treedef = jax.tree_util.tree_flatten(like)
    if meta["num_leaves"] != len(flat_like):
        raise ValueError(
            f"checkpoint has {meta['num_leaves']} leaves, template has "
            f"{len(flat_like)}")
    names = _paths(like)
    if names != meta["names"]:
        raise ValueError(
            f"checkpoint structure mismatch:\n saved: {meta['names']}\n "
            f"template: {names}")
    leaves = []
    for i, tmpl in enumerate(flat_like):
        arr = data[f"leaf_{i}"]
        tmpl_arr = jnp.asarray(tmpl)
        if tuple(arr.shape) != tuple(tmpl_arr.shape):
            raise ValueError(
                f"leaf {names[i]}: saved shape {arr.shape} != template "
                f"{tmpl_arr.shape}")
        leaves.append(jnp.asarray(arr, tmpl_arr.dtype))
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    return tree, meta.get("step")
