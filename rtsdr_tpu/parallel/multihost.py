"""Multi-host deployment helpers (DCN-level scaling, SURVEY.md §2c).

Each host ingests its own set of FM stations (its SDR front ends or
capture shards) and owns the corresponding channel rows of the global
(channels, time) mesh; ICI carries time-axis halos within a slice while
hosts never exchange sample data — only the usual XLA launch coordination
crosses DCN.

This module cannot be exercised on the single-host dev box; it is the
documented deployment path and is covered by the CPU-mesh sharding tests
for the per-host math.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rtsdr_tpu.parallel.mesh import CHANNEL_AXIS, make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up jax.distributed (no-op on a single host)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_channel_slice(n_channels: int) -> slice:
    """The contiguous block of global channel indices this host ingests."""
    n_hosts = jax.process_count()
    assert n_channels % n_hosts == 0, (
        f"{n_channels} channels not divisible by {n_hosts} hosts")
    per_host = n_channels // n_hosts
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def make_global_input(mesh, n_channels: int, block_size: int,
                      local_blocks: np.ndarray) -> jax.Array:
    """Assemble the globally-sharded (n_channels, block_size) uint8 input
    from this host's local station blocks.

    ``local_blocks``: (n_channels/process_count, block_size) uint8 read by
    this host.  Uses make_array_from_process_local_data so each host only
    transfers its own rows (ingest rides host->device links, never DCN).
    """
    sharding = NamedSharding(mesh, P(CHANNEL_AXIS, None))
    return jax.make_array_from_process_local_data(
        sharding, local_blocks, (n_channels, block_size))
