"""PLL/NCO scan vs a numpy transcription of the golden fmPll
(model/fmPll.py:4-49), plus lock-quality tests in float32."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from rtsdr_tpu.ops.pll import pll, pll_init


def golden_pll(pll_in, freq, fs, state, nco_scale=1.0, phase_adjust=0.0,
               norm_bandwidth=0.01):
    """Independent numpy oracle with the model's exact update order and
    state convention [integrator, phaseEst, feedbackI, feedbackQ, ncoLast,
    trigOffset] (+ ncoLastQ, which the model leaves uninitialized)."""
    cp, ci = 2.666, 3.555
    kp = norm_bandwidth * cp
    ki = norm_bandwidth * norm_bandwidth * ci

    n = len(pll_in)
    nco = np.empty(n + 1)
    nco_q = np.empty(n + 1)
    integrator, phase_est, fb_i, fb_q, nco_last, trig_offset, nco_last_q = state
    nco[0] = nco_last
    nco_q[0] = nco_last_q

    for k in range(n):
        error_i = pll_in[k] * (+fb_i)
        error_q = pll_in[k] * (-fb_q)
        error_d = math.atan2(error_q, error_i)
        integrator += ki * error_d
        phase_est += kp * error_d + integrator
        trig_arg = 2 * math.pi * (freq / fs) * (trig_offset + k + 1) + phase_est
        fb_i = math.cos(trig_arg)
        fb_q = math.sin(trig_arg)
        nco[k + 1] = math.cos(trig_arg * nco_scale + phase_adjust)
        nco_q[k + 1] = math.sin(trig_arg * nco_scale + phase_adjust)

    state = [integrator, phase_est, fb_i, fb_q, nco[-1], trig_offset + n, nco_q[-1]]
    return nco, nco_q, state


def _pilot(n, fs=240e3, f=19e3, phase=0.4, noise=0.0, rng=None):
    t = np.arange(n) / fs
    x = np.cos(2 * np.pi * f * t + phase)
    if noise:
        x = x + noise * rng.standard_normal(n)
    return x


@pytest.mark.parametrize(
    "nco_scale,phase_adjust,bw,freq",
    [
        (2.0, 0.0, 0.01, 19e3),                                  # stereo pilot
        (0.5, math.pi / 3.3 - math.pi / 1.5, 0.001, 114e3),      # RDS carrier
    ],
)
def test_pll_matches_golden_float64(rng, nco_scale, phase_adjust, bw, freq):
    fs = 240e3
    x = _pilot(2000, fs=fs, f=freq / 2 if nco_scale == 2.0 else freq,
               noise=0.05, rng=rng)
    # drive the loop with a tone at its center frequency
    t = np.arange(2000) / fs
    x = np.cos(2 * np.pi * freq * t + 0.3) + 0.05 * rng.standard_normal(2000)

    ref_state = [0.0, 0.0, 1.0, 0.0, 1.0, 0.0, 0.0]
    ref_i, ref_q, ref_state = golden_pll(
        x, freq, fs, ref_state, nco_scale, phase_adjust, bw)

    state = pll_init(dtype=jnp.float64)
    nco_i, nco_q, state = pll(
        jnp.asarray(x), state, freq=freq, fs=fs, nco_scale=nco_scale,
        phase_adjust=phase_adjust, norm_bandwidth=bw)

    # ours returns the delayed view == ref[0:N]
    np.testing.assert_allclose(np.asarray(nco_i), ref_i[:-1], rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(nco_q), ref_q[:-1], rtol=0, atol=1e-8)


def test_pll_block_chaining_matches_single_pass(rng):
    fs, freq = 240e3, 19e3
    x = _pilot(4096, fs=fs, f=freq, noise=0.02, rng=rng)

    ref_state = [0.0, 0.0, 1.0, 0.0, 1.0, 0.0, 0.0]
    ref_i, _, _ = golden_pll(x, freq, fs, ref_state, 2.0, 0.0, 0.01)

    state = pll_init(dtype=jnp.float64)
    outs = []
    for b in range(4):
        xb = jnp.asarray(x[b * 1024:(b + 1) * 1024])
        nco_i, _, state = pll(xb, state, freq=freq, fs=fs, nco_scale=2.0)
        outs.append(np.asarray(nco_i))
    np.testing.assert_allclose(np.concatenate(outs), ref_i[:-1], atol=1e-8)


def _lock_quality(nco, freq_out, fs, n):
    """Fit nco ~ cos(2*pi*freq_out*t + psi); return (amplitude, rms error).

    The loop locks with a constant detector-equilibrium phase offset (the
    golden model behaves identically — float64 parity is tested above), so
    lock is judged by frequency tracking and spectral purity, not by an
    analytic phase prediction.
    """
    t = (np.arange(n) - 1)[n // 2:] / fs
    x = nco[n // 2:]
    c = np.cos(2 * np.pi * freq_out * t)
    s = np.sin(2 * np.pi * freq_out * t)
    a, b = 2 * np.mean(x * c), -2 * np.mean(x * s)
    psi = np.arctan2(b, a)
    fit = np.cos(2 * np.pi * freq_out * t + psi)
    return np.hypot(a, b), np.sqrt(np.mean((x - fit) ** 2))


def test_pll_locks_float32():
    """After convergence the NCO must be a clean 38 kHz carrier: the float32
    production path, judged by lock quality rather than bitwise parity."""
    fs, freq, phase = 240e3, 19e3, 0.7
    n = 24000
    x = _pilot(n, fs=fs, f=freq, phase=phase)

    state = pll_init(dtype=jnp.float32)
    nco_i, nco_q, _ = pll(jnp.asarray(x, jnp.float32), state, freq=freq,
                          fs=fs, nco_scale=2.0)
    amp, rms = _lock_quality(np.asarray(nco_i), 2 * freq, fs, n)
    assert abs(amp - 1.0) < 0.02, f"not a unit carrier, amp={amp}"
    assert rms < 0.08, f"PLL failed to lock, rms={rms}"


def test_pll_batched_matches_scalar(rng):
    fs, freq = 240e3, 19e3
    x = np.stack([_pilot(512, phase=p) for p in (0.0, 1.0, 2.0)])
    state = pll_init((3,), dtype=jnp.float64)
    nb, _, sb = pll(jnp.asarray(x), state, freq=freq, fs=fs, nco_scale=2.0)
    for c in range(3):
        nc, _, sc = pll(jnp.asarray(x[c]), pll_init(dtype=jnp.float64),
                        freq=freq, fs=fs, nco_scale=2.0)
        np.testing.assert_allclose(np.asarray(nb[c]), np.asarray(nc), atol=1e-12)


def test_pll_long_run_float32_stays_bounded():
    """The mod-4pi wrap must keep float32 accurate over many blocks
    (the reference's unbounded trigOffset loses precision)."""
    fs, freq = 240e3, 19e3
    state = pll_init(dtype=jnp.float32)
    # n*freq/fs integer -> repeating the block gives a phase-continuous pilot
    n = 4800
    x = jnp.asarray(_pilot(n, fs=fs, f=freq), jnp.float32)
    for _ in range(50):  # ~1 s of stream time
        nco_i, _, state = pll(x, state, freq=freq, fs=fs, nco_scale=2.0)
    assert float(jnp.max(jnp.abs(state.theta))) <= 4 * math.pi
    assert not np.any(np.isnan(np.asarray(nco_i)))
    # still locked at the end: clean 38 kHz carrier
    amp, rms = _lock_quality(np.asarray(nco_i), 2 * freq, fs, n)
    assert abs(amp - 1.0) < 0.02
    assert rms < 0.08
