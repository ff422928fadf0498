"""Checkpoint / resume for the receiver state.

The reference has no checkpointing; its complete resumable state is the
scattered collection of zi tails, PLL fields and bit carries enumerated in
SURVEY.md §5.  Here that state is one named pytree, so checkpointing is a
flat save/load.  npz keeps zero extra dependencies; for multi-host sharded
state use ``orbax.checkpoint`` with the same pytree.
"""

from __future__ import annotations

import numpy as np
import jax

from rtsdr_tpu.pipeline.receiver import ReceiverState


def _flatten_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_state(path: str, state: ReceiverState) -> None:
    """Save a receiver state pytree to an .npz file."""
    arrays, _ = _flatten_paths(state)
    np.savez_compressed(path, **arrays)


def load_state(path: str, like: ReceiverState) -> ReceiverState:
    """Load a state saved by ``save_state``; ``like`` provides the pytree
    structure and dtypes (from ``init_fn()``)."""
    data = np.load(path)
    arrays, treedef = _flatten_paths(like)
    leaves = []
    for key, proto in arrays.items():
        if key not in data:
            raise KeyError(f"checkpoint missing state leaf {key}")
        arr = data[key]
        if arr.shape != proto.shape:
            raise ValueError(
                f"leaf {key}: checkpoint shape {arr.shape} != {proto.shape}")
        leaves.append(jax.numpy.asarray(arr.astype(proto.dtype)))
    return jax.tree_util.tree_unflatten(treedef, leaves)
