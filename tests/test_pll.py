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


@pytest.mark.parametrize(
    "freq,bw,scale,df",
    [
        # stereo pilot loop (B=0.01): a real RTL-SDR's clock error is ~1 Hz
        # at 19 kHz per 50 ppm; test far beyond that
        (19e3, 0.01, 2.0, 50.0),
        (19e3, 0.01, 2.0, 100.0),
        (19e3, 0.01, 2.0, 1000.0),
        # RDS carrier loop (B=0.001): squaring doubles the 57 kHz detune,
        # so +-50 ppm appears as ~+-6 Hz at 114 kHz
        (114e3, 0.001, 0.5, 10.0),
        (114e3, 0.001, 0.5, 100.0),
    ],
)
def test_pll_pulls_in_and_holds_detuned(freq, bw, scale, df):
    """The loop must acquire a carrier offset from its center frequency and
    hold it — the PLL's entire job on a real capture (model/fmPll.py:22-37).
    Measured pull-in range (float32, 0.4 s): pilot loop ~+-6 kHz, RDS loop
    ~+-1.2 kHz; tested comfortably inside that."""
    fs, n = 240e3, 48000
    t = np.arange(n) / fs
    x = np.cos(2 * np.pi * (freq + df) * t + 0.4).astype(np.float32)
    nco_i, _, _ = pll(jnp.asarray(x), pll_init(dtype=jnp.float32), freq=freq,
                      fs=fs, nco_scale=scale, norm_bandwidth=bw)
    # once locked the NCO is a clean carrier at scale*(freq+df), NOT at
    # scale*freq — frequency tracking, not just phase
    amp, rms = _lock_quality(np.asarray(nco_i), scale * (freq + df), fs, n)
    assert abs(amp - 1.0) < 0.03, f"df={df}: not tracking, amp={amp}"
    assert rms < 0.1, f"df={df}: failed to lock, rms={rms}"


def test_pll_beyond_pull_in_range_documented():
    """Past the measured pull-in boundary the loop must NOT lock — locates
    the documented capability edge (pilot loop: guaranteed lock to +-6 kHz,
    phase-dependent acquisition to ~8 kHz, no lock at >=12 kHz)."""
    fs, n = 240e3, 96000
    t = np.arange(n) / fs
    x = np.cos(2 * np.pi * (19e3 + 12000.0) * t).astype(np.float32)
    nco_i, _, _ = pll(jnp.asarray(x), pll_init(dtype=jnp.float32), freq=19e3,
                      fs=fs, nco_scale=2.0)
    amp, _ = _lock_quality(np.asarray(nco_i), 2 * (19e3 + 12000.0), fs, n)
    assert amp < 0.5, f"unexpectedly locked at +12 kHz, amp={amp}"


def test_pll_tracks_slow_drift():
    """Linear pilot drift (aging/thermal XO): the NCO must follow the
    instantaneous frequency.  500 Hz/s is ~3 orders beyond a real XO."""
    fs, n = 240e3, 96000
    rate = 500.0  # Hz/s
    t = np.arange(n) / fs
    x = np.cos(2 * np.pi * (19e3 * t + 0.5 * rate * t * t)).astype(np.float32)
    nco_i, _, _ = pll(jnp.asarray(x), pll_init(dtype=jnp.float32), freq=19e3,
                      fs=fs, nco_scale=2.0)
    # correlate the settled half against the ideal chirp at 2x
    sl = slice(n // 2, n)
    chirp = np.exp(-2j * np.pi * 2 * (19e3 * t[sl] + 0.5 * rate * t[sl] ** 2))
    amp = 2 * np.abs(np.mean(np.asarray(nco_i)[sl] * chirp))
    assert amp > 0.97, f"not tracking drift, amp={amp}"


def test_pll_locks_under_phase_noise(rng):
    """Random-walk phase noise on the pilot: the loop tracks the noisy
    phase; NCO stays unit-amplitude and correlated with the true (noisy)
    carrier at 2x."""
    fs, n = 240e3, 48000
    t = np.arange(n) / fs
    walk = np.cumsum(2e-3 * rng.standard_normal(n))
    arg = 2 * np.pi * 19e3 * t + walk
    x = np.cos(arg).astype(np.float32)
    nco_i, _, _ = pll(jnp.asarray(x), pll_init(dtype=jnp.float32), freq=19e3,
                      fs=fs, nco_scale=2.0)
    sl = slice(n // 2, n)
    ref = np.exp(-2j * arg[sl])
    amp = 2 * np.abs(np.mean(np.asarray(nco_i)[sl] * ref))
    assert amp > 0.95, f"lost the noisy carrier, amp={amp}"


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
