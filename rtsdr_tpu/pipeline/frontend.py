"""RF front end: IQ LPF + decimate to IF, then FM discrimination.

Replaces the reference rf_thread (src/fm_radio.cpp:31-147): deinterleave,
151-tap LPF at Fc=100 kHz fused with the /10 decimator on both I and Q
(the reference's "fused I+Q" kernel C7 is here simply a batched leading dim
feeding one convolution), then the discriminator.  Coefficients are computed
once at build time, not per block (reference quirk at src/fm_radio.cpp:75).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rtsdr_tpu.config import ReceiverConfig
from rtsdr_tpu.ops import coeffs
from rtsdr_tpu.ops.demod import demod_init, fm_discriminator
from rtsdr_tpu.ops.fir import fir_decimate, fir_zi


class FrontendState(NamedTuple):
    zi_i: jax.Array       # (..., rf_taps-1)
    zi_q: jax.Array
    prev_i: jax.Array     # (...,) discriminator state
    prev_q: jax.Array


def frontend_init(cfg: ReceiverConfig, batch_shape: tuple = (),
                  dtype=jnp.float32) -> FrontendState:
    pi, pq = demod_init(batch_shape, dtype)
    return FrontendState(
        zi_i=fir_zi(cfg.rf.taps, batch_shape, dtype),
        zi_q=fir_zi(cfg.rf.taps, batch_shape, dtype),
        prev_i=pi,
        prev_q=pq,
    )


def make_frontend(cfg: ReceiverConfig):
    """Returns ``frontend(state, i, q) -> (fm_demod, new_state)``.

    i, q: (..., iq_len) deinterleaved, normalized IQ samples.
    fm_demod: (..., if_len) at the IF rate.
    """
    rf_h = coeffs.lowpass_taps(cfg.rf.fs, cfg.rf.fc, cfg.rf.taps)
    decim = cfg.rf.decim

    def frontend(state: FrontendState, i: jax.Array, q: jax.Array = None):
        # One batched convolution filters I and Q together (reference C7).
        # ``i`` may already be the stacked (..., 2, N) IQ array (fast path
        # from the receiver's reshape-deinterleave); else stack here.
        iq = i if q is None else jnp.stack([i, q], axis=-2)
        zi = jnp.stack([state.zi_i, state.zi_q], axis=-2)
        iq_ds, zi_new = fir_decimate(iq, rf_h, zi, decim)
        i_ds = iq_ds[..., 0, :]
        q_ds = iq_ds[..., 1, :]
        fm, (pi, pq) = fm_discriminator(i_ds, q_ds, (state.prev_i, state.prev_q))
        new_state = FrontendState(
            zi_i=zi_new[..., 0, :], zi_q=zi_new[..., 1, :], prev_i=pi, prev_q=pq)
        return fm, new_state

    return frontend
