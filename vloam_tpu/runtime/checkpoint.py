"""Checkpoint / resume for device-resident pipeline state.

The reference has no checkpointing (SURVEY.md §5: the map lives only in
RAM; a crash restarts the whole drive). Here the full LoamState/VisionLoState/MapState
pytree (cube map, feature clouds, pose chain) can be saved to an .npz and
restored, so long runs survive interruption and maps can be reused across
sessions.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_state(path: str, state) -> None:
    arrays, _ = _flatten_with_paths(state)
    np.savez_compressed(path, **arrays)


def load_state(path: str, template):
    """Restore into the structure of `template` (e.g. LoamState.create(cfg))."""
    data = np.load(path)
    arrays, treedef = _flatten_with_paths(template)
    leaves = []
    for key, tmpl in arrays.items():
        if key not in data:
            raise KeyError(f"checkpoint missing field {key}")
        arr = data[key]
        if arr.shape != tmpl.shape:
            raise ValueError(
                f"shape mismatch for {key}: {arr.shape} vs {tmpl.shape}"
            )
        leaves.append(jnp.asarray(arr.astype(tmpl.dtype)))
    return jax.tree_util.tree_unflatten(treedef, leaves)
