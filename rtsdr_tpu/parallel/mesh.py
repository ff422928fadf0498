"""Device mesh construction for the (channel, time) sharding axes."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


CHANNEL_AXIS = "ch"
TIME_AXIS = "t"


def make_mesh(n_channel_shards: int | None = None, n_time_shards: int = 1,
              devices=None) -> Mesh:
    """Build a (ch, t) mesh.

    Defaults to all channels: ``(n_devices, 1)``.  The channel axis is the
    throughput axis (embarrassingly parallel stations); the time axis is for
    latency scaling of a single station via halo exchange.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_channel_shards is None:
        n_channel_shards = n // n_time_shards
    assert n_channel_shards * n_time_shards <= n, (
        f"mesh {n_channel_shards}x{n_time_shards} exceeds {n} devices")
    devs = np.asarray(devices[: n_channel_shards * n_time_shards]).reshape(
        n_channel_shards, n_time_shards)
    return Mesh(devs, (CHANNEL_AXIS, TIME_AXIS))
