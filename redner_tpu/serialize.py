"""Checkpoint / resume: state_dict round-trips for every scene object
(reference state_dict()/load_state_dict() on each class,
pyredner/scene.py:70-86 etc., exercised by tests/test_serialize.py).

Scenes are JAX pytrees, so a state dict is just the path-keyed leaves; the
static structure (counts, flags, camera type...) is carried alongside so
`load_state_dict` can validate it.  `save_scene`/`load_scene` persist to
.npz for on-disk checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def state_dict(obj) -> Dict[str, Any]:
    """Pytree -> {path: numpy array} (+ '__treedef__' structure token)."""
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(obj)
    out: Dict[str, Any] = {}
    for path, leaf in leaves_with_paths:
        out[_path_str(path)] = np.asarray(leaf)
    out["__treedef__"] = str(treedef)
    return out


def load_state_dict(obj, state: Dict[str, Any]):
    """Rebuild `obj` with leaves replaced from `state` (strict paths)."""
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(obj)
    expected = str(treedef)
    if "__treedef__" in state and state["__treedef__"] != expected:
        raise ValueError(
            "state_dict structure mismatch:\n"
            f"  saved:    {state['__treedef__']}\n"
            f"  expected: {expected}"
        )
    new_leaves = []
    for path, leaf in leaves_with_paths:
        key = _path_str(path)
        if key not in state:
            raise KeyError(f"state_dict missing leaf {key!r}")
        new_leaves.append(jnp.asarray(state[key], leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_scene(scene, filename: str):
    """Persist a scene pytree to .npz."""
    sd = state_dict(scene)
    tdef = sd.pop("__treedef__")
    np.savez(filename, __treedef__=np.asarray(tdef), **sd)


def load_scene(scene_template, filename: str):
    """Load leaves from .npz into a structurally-identical scene."""
    data = np.load(filename, allow_pickle=False)
    sd = {k: data[k] for k in data.files if k != "__treedef__"}
    sd["__treedef__"] = str(data["__treedef__"])
    return load_state_dict(scene_template, sd)
