"""Associative-scan IIR vs scipy.lfilter."""

import jax.numpy as jnp
import numpy as np
from scipy import signal

from rtsdr_tpu.ops.iir import deemphasis_coeffs, deemphasize, first_order_iir


def test_first_order_iir_matches_lfilter(rng):
    b_c, a_c = 0.3, 0.65
    x = rng.standard_normal((3, 1024))
    ref = signal.lfilter([b_c], [1.0, -a_c], x, axis=-1)
    y, yl = first_order_iir(jnp.asarray(x), b_c, a_c,
                            jnp.zeros((3,), jnp.float64))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(yl), ref[:, -1], rtol=1e-9)


def test_block_chaining(rng):
    b_c, a_c = deemphasis_coeffs(48e3)
    x = rng.standard_normal(4096)
    ref = signal.lfilter([b_c], [1.0, -a_c], x)
    yp = jnp.zeros((), jnp.float64)
    outs = []
    for s in range(4):
        y, yp = first_order_iir(jnp.asarray(x[s * 1024:(s + 1) * 1024]),
                                b_c, a_c, yp)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs), ref, rtol=1e-9,
                               atol=1e-11)


def test_deemphasis_response():
    """-3 dB near 1/(2*pi*tau) ~= 2.12 kHz; strong treble cut at 15 kHz."""
    fs = 48e3
    n = 48000
    t = np.arange(n) / fs

    def gain(freq):
        x = jnp.asarray(np.sin(2 * np.pi * freq * t))
        y, _ = deemphasize(x, jnp.zeros((), jnp.float64), fs)
        yy = np.asarray(y)[n // 2:]
        return np.sqrt(2 * np.mean(yy**2))

    assert gain(100.0) > 0.97
    g3 = gain(2122.0)
    assert 0.6 < g3 < 0.8  # ~ -3 dB
    assert gain(15000.0) < 0.2
