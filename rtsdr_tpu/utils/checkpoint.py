"""Checkpoint / resume for the receiver state.

The reference has no checkpointing; its complete resumable state is the
scattered collection of zi tails, PLL fields and bit carries enumerated in
SURVEY.md §5.  Here that state is one named pytree, so checkpointing is a
flat save/load.  npz keeps zero extra dependencies.

Sharded state (the (channel, time) mesh receivers, parallel/) round-trips
through the same two functions: ``save_state`` gathers each leaf's
addressable shards to one host array, and ``load_state`` re-places every
leaf with the sharding carried by the ``like`` pytree (pass
``init_fn()``'s output — its leaves hold the mesh placement), so a resumed
time-sharded receiver continues bit-exactly without a re-shard step.  For
multi-host (DCN) state where no single process addresses every shard, use
``orbax.checkpoint`` with the same pytree.
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
    """Save a receiver state pytree to an .npz file.

    Sharded leaves (NamedSharding over a mesh) are gathered to full host
    arrays — every shard must be addressable by this process."""
    arrays, _ = _flatten_paths(state)
    np.savez_compressed(path, **arrays)


def load_state(path: str, like: ReceiverState) -> ReceiverState:
    """Load a state saved by ``save_state``; ``like`` provides the pytree
    structure, dtypes, and device placement (from ``init_fn()``): a leaf
    carrying a sharding is restored onto that sharding."""
    data = np.load(path)
    arrays, treedef = _flatten_paths(like)
    like_leaves = jax.tree_util.tree_leaves(like)
    leaves = []
    for (key, proto), ref in zip(arrays.items(), like_leaves):
        if key not in data:
            raise KeyError(f"checkpoint missing state leaf {key}")
        arr = data[key]
        if arr.shape != proto.shape:
            raise ValueError(
                f"leaf {key}: checkpoint shape {arr.shape} != {proto.shape}")
        arr = arr.astype(proto.dtype)
        sharding = getattr(ref, "sharding", None)
        if isinstance(ref, jax.Array) and sharding is not None:
            leaves.append(jax.device_put(arr, sharding))
        else:
            leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)
