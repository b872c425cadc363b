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

__all__ = ["save", "load", "save_sharded", "load_sharded"]


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


# ---------------------------------------------------------------------------
# Multi-host (jax.distributed) checkpointing: per-process shard files.
#
# `save`/`load` above require fully-addressable arrays; on a mesh whose axes
# span processes (SURVEY §2.5 backend row) each process can only see its own
# shards. `save_sharded` has every process write exactly its addressable
# shards (+ their global indices) to `<path>.proc<k>.npz`; `load_sharded`
# has every process read back ITS file and reassemble the global arrays via
# `jax.make_array_from_callback` — valid whenever the restoring run uses the
# same mesh shape/layout, which is the supported resume contract (the
# single-process `save`/`load` handles resharding cases by going through a
# host copy). This is the failure-recovery mechanism SURVEY §5 plans for
# multi-host runs; the reference's only analog is the runtime set_pose state
# reset (ref rigid2d/src/odometer.cpp:169-187).
# ---------------------------------------------------------------------------


def _norm_index(index, shape):
    """Shard index (tuple of slices) -> hashable ((start, stop), ...)."""
    out = []
    for sl, dim in zip(index, shape):
        start, stop, step_ = sl.indices(dim)
        assert step_ == 1, "strided shard indices unsupported"
        out.append((start, stop))
    return tuple(out)


def _proc_file(path: str, process_index: int) -> str:
    return f"{path}.proc{process_index}.npz"


def save_sharded(path: str, tree: Any, step: int | None = None) -> None:
    """Each process writes its addressable shards of every leaf to
    ``<path>.proc<jax.process_index()>.npz``. Call from ALL processes."""
    flat, _ = jax.tree_util.tree_flatten(tree)
    names = _paths(tree)
    arrays = {}
    shard_indices = []
    for i, x in enumerate(flat):
        x = jnp.asarray(x)
        leaf_idx = []
        for j, sh in enumerate(x.addressable_shards):
            arrays[f"leaf_{i}_shard_{j}"] = np.asarray(sh.data)
            leaf_idx.append(_norm_index(sh.index, x.shape))
        shard_indices.append(leaf_idx)
    meta = {
        "names": names,
        "num_leaves": len(flat),
        "shard_indices": shard_indices,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
    if step is not None:
        meta["step"] = int(step)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(_proc_file(path, jax.process_index()), **arrays)


def load_sharded(path: str, like: Any, mesh, specs):
    """Restore a :func:`save_sharded` checkpoint onto ``mesh`` with the
    PartitionSpec pytree ``specs`` (same mesh shape/layout as at save time).
    ``like`` is a template pytree with the GLOBAL shapes/dtypes (e.g. the
    output of the matching ``init``). Call from ALL processes; each reads
    only its own shard file. Returns ``(tree, step)``."""
    from jax.sharding import NamedSharding, PartitionSpec

    data = np.load(_proc_file(path, jax.process_index()))
    meta = json.loads(bytes(data["__meta__"]).decode())
    flat_like, treedef = jax.tree_util.tree_flatten(like)
    spec_flat, _ = jax.tree_util.tree_flatten(
        specs, is_leaf=lambda x: isinstance(x, PartitionSpec))
    names = _paths(like)
    if names != meta["names"]:
        raise ValueError(
            f"checkpoint structure mismatch:\n saved: {meta['names']}\n "
            f"template: {names}")
    if meta["process_count"] != jax.process_count():
        raise ValueError(
            f"checkpoint written by {meta['process_count']} processes, "
            f"restoring with {jax.process_count()} — mesh must match")
    leaves = []
    for i, (tmpl, spec) in enumerate(zip(flat_like, spec_flat)):
        tmpl_arr = jnp.asarray(tmpl)
        shape, dtype = tmpl_arr.shape, tmpl_arr.dtype
        lookup = {
            tuple(tuple(p) for p in idx): data[f"leaf_{i}_shard_{j}"]
            for j, idx in enumerate(meta["shard_indices"][i])
        }

        def cb(index, _lookup=lookup, _shape=shape, _dtype=dtype,
               _name=names[i]):
            key = _norm_index(index, _shape)
            if key not in _lookup:
                raise ValueError(
                    f"leaf {_name}: shard {key} not in this process's "
                    f"checkpoint file — mesh layout changed since save")
            return np.asarray(_lookup[key], _dtype)

        sharding = NamedSharding(mesh, spec)
        leaves.append(
            jax.make_array_from_callback(shape, sharding, cb))
    return jax.tree_util.tree_unflatten(treedef, leaves), meta.get("step")
