"""Bartlett-method PSD estimation (observability, SURVEY.md layer Lx).

Replaces the reference's O(N^2) DFT (src/fourier.cpp:15-23) and its C++/
Python ``estimatePSD`` (src/fourier.cpp:36-110, model/fmSupportLib.py:66-140)
with a batched ``jnp.fft.rfft`` — same estimate, FFT cost.

Numerics match the golden model: Hann window ``sin^2(pi*i/NFFT)`` (the
model's periodic-style window, model/fmSupportLib.py:80-82), per-segment
``|FFT|^2 * 2 / (Fs * NFFT/2)``, dB, then segment-average.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def psd_freqs(nfft: int, fs: float) -> np.ndarray:
    """The frequency grid of ``estimate_psd``'s bins (host numpy)."""
    return np.arange(0, fs / 2.0, fs / nfft)[: nfft // 2]


def estimate_psd(samples: jax.Array, nfft: int, fs: float,
                 eps: float = 1e-30) -> tuple[np.ndarray, jax.Array]:
    """Bartlett PSD estimate.

    Args:
      samples: (..., N) real signal; N is truncated to a multiple of nfft.
      nfft: number of frequency bins (segment length).
      fs: sampling rate.

    Returns:
      freq: (nfft//2,) positive frequency bins (host numpy, for plotting).
      psd:  (..., nfft//2) averaged PSD in dB.
    """
    n = samples.shape[-1]
    num_segments = n // nfft
    x = samples[..., : num_segments * nfft]
    segs = x.reshape((*x.shape[:-1], num_segments, nfft))

    i = jnp.arange(nfft, dtype=samples.dtype)
    hann = jnp.sin(i * math.pi / nfft) ** 2
    windowed = segs * hann

    spec = jnp.fft.rfft(windowed, n=nfft, axis=-1)[..., : nfft // 2]
    power = (2.0 / (fs * nfft / 2.0)) * jnp.abs(spec) ** 2
    db = 10.0 * jnp.log10(power + eps)
    psd = jnp.mean(db, axis=-2)

    return psd_freqs(nfft, fs), psd
