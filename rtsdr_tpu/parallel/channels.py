"""Channel-parallel receiver: many FM stations sharded across the mesh.

The reference handles exactly one station (SURVEY.md §2c "DP — absent").
Here the batched receiver (leading channel dim) is placed on the mesh with
the channel dim sharded over the ``ch`` axis; XLA runs each device's
stations locally with zero communication.  State and outputs share the same
sharding, so a streaming loop never moves state off-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtsdr_tpu.config import ReceiverConfig
from rtsdr_tpu.parallel.mesh import CHANNEL_AXIS
from rtsdr_tpu.pipeline.receiver import make_receiver


def make_channel_sharded_receiver(
    cfg: ReceiverConfig,
    mesh: Mesh,
    n_channels: int,
    dtype=jnp.float32,
    **kwargs,
):
    """Build ``(init_fn, step_fn)`` with the channel axis sharded over the
    mesh's ``ch`` axis (other mesh axes unused / replicated).

    ``step_fn(state, raw_u8)``: raw_u8 is (n_channels, block_size) uint8;
    jit-compiled with sharded in/out so the ingest transfer is split across
    devices too.
    """
    n_ch_shards = mesh.shape[CHANNEL_AXIS]
    assert n_channels % n_ch_shards == 0, (
        f"{n_channels} channels not divisible by {n_ch_shards} shards")

    init_fn, step_fn = make_receiver(cfg, (n_channels,), dtype, **kwargs)

    batch_sharding = NamedSharding(mesh, P(CHANNEL_AXIS))

    def shard_tree(tree):
        def place(x):
            if x is None:
                return None
            spec = P(CHANNEL_AXIS, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.tree.map(place, tree)

    def sharded_init():
        return shard_tree(init_fn())

    step_jit = jax.jit(step_fn, donate_argnums=0)

    def sharded_step(state, raw_u8):
        raw_u8 = jax.device_put(raw_u8, batch_sharding)
        return step_jit(state, raw_u8)

    return sharded_init, sharded_step, batch_sharding


def make_wideband_sharded_receiver(
    cfg: ReceiverConfig,
    mesh: Mesh,
    n_rf_channels: int,
    dtype=jnp.float32,
    **kwargs,
):
    """Wideband receiver (pipeline/wideband.py) decoded across the mesh:
    one K-wide capture in, the K stations sharded over the ``ch`` axis.

    The raw wideband stream is replicated (every device reads its bytes —
    at 64 ms per block that transfer overlaps compute); the channelizer
    matmul's output columns are constrained to the channel sharding, so
    XLA materializes each station's baseband only on its own device and
    the entire per-station chain runs without communication.
    """
    n_sh = mesh.shape[CHANNEL_AXIS]
    assert n_rf_channels % n_sh == 0, (
        f"{n_rf_channels} RF channels not divisible by {n_sh} shards")
    from rtsdr_tpu.pipeline.wideband import make_wideband_receiver

    iq_sharding = NamedSharding(mesh, P(CHANNEL_AXIS, None, None))
    init_fn, step_fn = make_wideband_receiver(
        cfg, n_rf_channels, dtype=dtype, channel_sharding=iq_sharding,
        **kwargs)

    repl = NamedSharding(mesh, P())

    def sharded_init():
        st = init_fn()
        rx = jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh,
                                 P(CHANNEL_AXIS, *([None] * (x.ndim - 1))))),
            st.rx)
        return st._replace(chan_zi=jax.device_put(st.chan_zi, repl), rx=rx)

    step_jit = jax.jit(step_fn, donate_argnums=0)

    def sharded_step(state, raw_u8):
        raw_u8 = jax.device_put(raw_u8, repl)
        return step_jit(state, raw_u8)

    return sharded_init, sharded_step
