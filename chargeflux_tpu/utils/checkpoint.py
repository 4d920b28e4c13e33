"""Checkpoint / resume for MD state and scene specs.

The reference plugin has no serialization at all (SURVEY §5: no
CoulForceProxy; checkpointing is inherited from OpenMM Context).  Here the
entire simulation state is a pytree, so checkpointing is first-class: an
.npz dump of the flattened leaves plus the static treedef/spec metadata.
Works for MDState, ChargeFluxSystem, BondedParams, or any nested pytree of
them.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

import jax


def _spec_to_json(obj):
    """Serialize StaticSpec-like frozen dataclasses found in treedefs."""
    import dataclasses

    if dataclasses.is_dataclass(obj):
        return {"__dataclass__": type(obj).__name__,
                "fields": {k: _spec_to_json(v) for k, v in
                           dataclasses.asdict(obj).items()}}
    if isinstance(obj, tuple):
        return {"__tuple__": [_spec_to_json(v) for v in obj]}
    return obj


def save_checkpoint(path: str | os.PathLike, state: Any, step: int = 0,
                    extra: dict | None = None):
    """Save a pytree of arrays to ``path`` (.npz + .json sidecar)."""
    path = os.fspath(path)
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz",
                        **arrays)
    meta = {
        "step": step,
        "n_leaves": len(leaves),
        "treedef": str(treedef),
        "extra": extra or {},
    }
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_checkpoint(path: str | os.PathLike, like: Any):
    """Load a checkpoint saved by :func:`save_checkpoint` into the structure
    of ``like`` (dtypes follow ``like``).

    The template is validated structurally: the stored treedef string must
    match ``like``'s and every leaf shape must agree — a same-length but
    differently shaped template (e.g. velocities where positions belong)
    raises instead of silently transposing arrays.

    Returns (state, step).
    """
    path = os.fspath(path)
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = jax.tree.flatten(like)
    if len(leaves) != len(npz.files):
        raise ValueError(
            f"checkpoint has {len(npz.files)} leaves, template has {len(leaves)}")
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    saved_treedef = meta.get("treedef")
    if saved_treedef is not None and saved_treedef != str(treedef):
        raise ValueError(
            "checkpoint treedef does not match the template structure:\n"
            f"  saved:    {saved_treedef}\n  template: {treedef}")
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = npz[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"checkpoint leaf {i} has shape {tuple(arr.shape)}, "
                f"template expects {tuple(np.shape(leaf))}")
        new_leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    return jax.tree.unflatten(treedef, new_leaves), int(meta.get("step", 0))


def _meta_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".meta.json"
