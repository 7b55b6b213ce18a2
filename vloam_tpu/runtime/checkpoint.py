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


# Format history: v1 (unversioned, rounds 1-3) used FeatureGrid.cnt and a
# single VloamState pytree; v2 renamed cnt -> n_live and split the engine
# state into VisionLoState + MapState. There is no migration shim — the
# map layout also changed — so v1 checkpoints must be regenerated.
CHECKPOINT_FORMAT_VERSION = 2


def save_state(path: str, state) -> None:
    arrays, _ = _flatten_with_paths(state)
    arrays["__format_version__"] = np.int32(CHECKPOINT_FORMAT_VERSION)
    np.savez_compressed(path, **arrays)


def load_state(path: str, template):
    """Restore into the structure of `template` (e.g. LoamState.create(cfg))."""
    data = np.load(path)
    version = int(data["__format_version__"]) if "__format_version__" in data \
        else 1
    if version != CHECKPOINT_FORMAT_VERSION:
        raise ValueError(
            f"checkpoint {path} has format v{version}, this build reads "
            f"v{CHECKPOINT_FORMAT_VERSION}; pre-round-4 checkpoints "
            "(FeatureGrid.cnt / unified VloamState) cannot be migrated — "
            "regenerate with --save-state")
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
