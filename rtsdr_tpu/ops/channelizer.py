"""Critically-sampled polyphase filter-bank (PFB) channelizer.

Beyond the reference (which tunes ONE station per dongle pipe,
src/fm_radio.cpp:31-147): split one wideband IQ capture into K
frequency channels, each downconverted to complex baseband and decimated
by K — the K-station front door for the batched receiver.

Math.  Channel k = ``decimate_K(LPF(x[t] * exp(-2j*pi*k*t/K)))`` with a
shared prototype low-pass ``h``.  Substituting n = j*K + p gives the
polyphase form

    y[m, k] = sum_p exp(+2j*pi*k*p/K) * u_p[m]
    u_p[m]  = sum_j h[j*K + p] * x[m*K - p - j*K]

i.e. per-phase FIR over the decimated phase planes followed by a length-K
inverse DFT across phases — ``K * ifft(u, axis=phase)``.  Both pieces are
TPU-shaped: the phase-plane construction is one pad + reshape + flip (no
gathers), the branch FIR is a t-term FMA chain over (M, K) planes, and
the IDFT is a tiny batched FFT.

Streaming: the carried state is the last ``t*K + K - 1`` input samples
(the phase-plane window tail), so chained blocks are exactly equal to one
long call (tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rtsdr_tpu.ops.coeffs import lowpass_taps


def channelizer_taps(n_channels: int, taps_per_branch: int = 16,
                     cutoff_frac: float = 0.45) -> np.ndarray:
    """Prototype low-pass for a K-channel PFB.

    cutoff = cutoff_frac * (fs / K): 0.45 leaves a guard band between
    adjacent 1/K-wide slots; the per-station RF LPF downstream does the
    tight selectivity.
    """
    k = n_channels
    taps = taps_per_branch * k
    return lowpass_taps(1.0, cutoff_frac / k, taps)


def channelizer_zi(n_channels: int, taps: int, batch_shape: tuple = (),
                   dtype=jnp.complex64) -> jax.Array:
    """Zero initial state: the carried input tail."""
    t = -(-taps // n_channels)  # taps per branch (ceil)
    return jnp.zeros((*batch_shape, t * n_channels + n_channels - 1), dtype)


def pfb_channelize(
    x: jax.Array,
    h,
    zi: jax.Array,
    n_channels: int,
) -> tuple[jax.Array, jax.Array]:
    """Channelize complex x (..., N) -> (..., M, K), M = N/K.

    Output m, k is exactly ``sum_n h[n] x_ext[L + m*K - n] * W(k, n)``
    with W the downconversion twiddle — equal to mix->lfilter->[::K] of
    the concatenated stream (oracle-tested; lfilter alignment: output
    sample m corresponds to input index m*K).
    """
    k = n_channels
    h = jnp.asarray(h)
    taps = h.shape[0]
    t = -(-taps // k)
    if taps < t * k:  # pad the prototype to a whole number of branches
        h = jnp.pad(h, (0, t * k - taps))
    n = x.shape[-1]
    assert n % k == 0, "block length must divide by n_channels"
    m_out = n // k
    batch = x.shape[:-1]
    l_zi = t * k + k - 1
    assert zi.shape[-1] == l_zi

    x_ext = jnp.concatenate([zi.astype(x.dtype), x], axis=-1)
    # Phase planes v[r, p] = x_ext[(r+2)K - 1 - p], one reshape + flip
    # (no gathers).  The base offset K keeps output m on the K-grid of
    # the stream: u[m, p] below reads x_ext[a + (m+t-1)K - n] with
    # a = 2K-1, and stream position = that - len(zi) = m*K - n — exactly
    # lfilter(h, 1, mix(x))[::K] sample m.
    rows = (x_ext.shape[-1] - k) // k
    v = x_ext[..., k:k + rows * k].reshape(*batch, rows, k)[..., ::-1]
    # u[m, p] = sum_j h[jK + p] v[m + t - 1 - j, p]
    h_b = h.reshape(t, k)  # h_b[j, p] = h[jK + p]
    u = jnp.zeros((*batch, m_out, k), x.dtype)
    for j in range(t):
        w = v[..., t - 1 - j: t - 1 - j + m_out, :]
        u = u + w * h_b[j].astype(x.dtype)
    y = k * jnp.fft.ifft(u, axis=-1)

    new_zi = x_ext[..., -l_zi:]
    return y.astype(x.dtype), new_zi.astype(zi.dtype)


def channel_center_freqs(n_channels: int, fs: float) -> np.ndarray:
    """Center frequency of each output channel (Hz), wrapped to +-fs/2."""
    k = np.arange(n_channels)
    f = k * fs / n_channels
    return np.where(f >= fs / 2, f - fs, f)
