"""Wideband multi-station receiver: PFB channelizer + batched receivers.

Beyond the reference (one dongle pipe = one station,
src/fm_radio.cpp:31-147): one wideband capture at ``K x 2.4 MS/s`` is
split by the polyphase channelizer (ops/channelizer.py) into K complex
basebands at exactly the station rate, and ALL K stations decode in one
jitted step through the standard batched receiver (mono + stereo + RDS +
frame sync per channel).  Channel k sits at center frequency
``k * fs_w / K`` (wrapped; ops.channelizer.channel_center_freqs).

The whole thing — channelizer FMA chain, tiny batched IFFT, banded-matmul
FIRs, fused Pallas PLL pair — is one XLA program per block.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rtsdr_tpu.config import ReceiverConfig
from rtsdr_tpu.ops.channelizer import (
    channelizer_taps,
    channelizer_zi,
    channelizer_zi_u8,
    pfb_channelize,
    pfb_channelize_u8,
)
from rtsdr_tpu.pipeline.receiver import ReceiverState, make_receiver


class WidebandState(NamedTuple):
    chan_zi: jax.Array       # channelizer carried input tail (complex)
    rx: ReceiverState        # batched per-channel receiver state


def make_wideband_receiver(
    cfg: ReceiverConfig,
    n_rf_channels: int,
    batch_shape: tuple = (),
    dtype=jnp.float32,
    taps_per_branch: int = 16,
    channel_sharding=None,
    **receiver_kwargs,
):
    """Build ``(init_fn, step_fn)`` for a K-channel wideband receiver.

    ``step_fn(state, raw_u8)``: raw_u8 is (..., K * cfg.block_size)
    interleaved uint8 IQ at ``fs_w = K * cfg.rf.fs``.  Outputs are the
    standard ``ReceiverOutputs`` with a trailing (..., K) channel batch
    dim prepended to each leaf's time axis.

    ``channel_sharding``: optional ``NamedSharding`` for the channelizer
    output (K, 2, M); constrains the per-station decode onto a device
    mesh — the channelizer's banded matmul splits its output columns
    across the channel axis and everything downstream stays local
    (parallel/channels.py ``make_wideband_sharded_receiver``).
    """
    k = n_rf_channels
    h = np.asarray(channelizer_taps(k, taps_per_branch))
    taps = len(h)

    init_rx, step_rx = make_receiver(
        cfg, (*batch_shape, k), dtype, frontend_impl="iq",
        **receiver_kwargs)

    cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
    # The raw-byte banded-matmul channelizer (one matmul, no complex
    # intermediates) needs whole output blocks and f32; the complex
    # phase-plane path remains for ragged lengths and the f64 oracle.
    m_per_block = cfg.block_size // 2  # per-channel samples per step
    use_u8 = dtype == jnp.float32 and m_per_block % 32 == 0

    def init_fn() -> WidebandState:
        chan_zi = (channelizer_zi_u8(k, taps, batch_shape) if use_u8
                   else channelizer_zi(k, taps, batch_shape, cdtype))
        return WidebandState(chan_zi=chan_zi, rx=init_rx())

    def step_fn(state: WidebandState, raw_u8: jax.Array):
        if use_u8:
            raw_iq, chan_zi = pfb_channelize_u8(raw_u8, h, state.chan_zi, k)
        else:
            pairs = raw_u8.reshape(*raw_u8.shape[:-1], -1, 2)
            iq = (jnp.swapaxes(pairs, -1, -2).astype(dtype)
                  - 128.0) * (1.0 / 128.0)
            x = (iq[..., 0, :] + 1j * iq[..., 1, :]).astype(cdtype)
            y, chan_zi = pfb_channelize(x, h, state.chan_zi, k)
            # (..., M, K) -> (..., K, 2, M): per-channel stacked I/Q at
            # the station rate, the receiver's 'iq' frontend input
            y = jnp.moveaxis(y, -1, -2)
            raw_iq = jnp.stack([jnp.real(y), jnp.imag(y)],
                               axis=-2).astype(dtype)
        if channel_sharding is not None:
            raw_iq = jax.lax.with_sharding_constraint(raw_iq,
                                                      channel_sharding)
        rx_state, out = step_rx(state.rx, raw_iq)
        return WidebandState(chan_zi=chan_zi, rx=rx_state), out

    return init_fn, step_fn
