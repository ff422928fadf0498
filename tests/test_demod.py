"""FM discriminator vs the golden model's atan2+unwrap loop
(model/fmSupportLib.py:15-44)."""

import jax.numpy as jnp
import numpy as np

from rtsdr_tpu.ops.demod import (
    demod_init,
    fm_discriminator,
    fm_discriminator_linear,
)


def golden_fm_demod(i, q, prev_phase=0.0):
    """Independent numpy transcription of the golden discriminator."""
    import math

    out = np.empty(len(i))
    for k in range(len(i)):
        current = math.atan2(q[k], i[k])
        prev_phase, current = np.unwrap([prev_phase, current])
        out[k] = current - prev_phase
        prev_phase = current
    return out, prev_phase


def _fm_iq(rng, n, fs=240e3, fdev=75e3, fm=1e3):
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * fm * t) + 0.3 * rng.standard_normal(n)
    phase = np.cumsum(2 * np.pi * fdev * msg / fs)
    return np.cos(phase), np.sin(phase)


def test_exact_discriminator_matches_golden(rng):
    i, q = _fm_iq(rng, 3000)
    ref, _ = golden_fm_demod(i, q)

    state = demod_init(dtype=jnp.float64)
    ours, _ = fm_discriminator(jnp.asarray(i), jnp.asarray(q), state)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-10, atol=1e-12)


def test_block_chaining_matches_single_pass(rng):
    i, q = _fm_iq(rng, 4096)
    ref, _ = golden_fm_demod(i, q)

    state = demod_init(dtype=jnp.float64)
    outs = []
    for s in range(4):
        sl = slice(s * 1024, (s + 1) * 1024)
        y, state = fm_discriminator(jnp.asarray(i[sl]), jnp.asarray(q[sl]), state)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs), ref, rtol=1e-10, atol=1e-12)


def test_linear_discriminator_close_on_clean_fm(rng):
    # On clean (noiseless) FM with moderate deviation, the derivative form
    # approximates the exact phase difference.
    fs, n = 240e3, 4096
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * 1e3 * t)
    phase = np.cumsum(2 * np.pi * 25e3 * msg / fs)
    i, q = np.cos(phase), np.sin(phase)

    state = demod_init(dtype=jnp.float64)
    exact, _ = fm_discriminator(jnp.asarray(i), jnp.asarray(q), state)
    lin, _ = fm_discriminator_linear(jnp.asarray(i), jnp.asarray(q),
                                     demod_init(dtype=jnp.float64))
    err = np.asarray(exact - lin)[10:]
    # first-order approximation: small rms error, bounded peak error
    assert np.sqrt(np.mean(err**2)) < 0.1
    assert np.max(np.abs(err)) < 0.5


def test_batched_shapes(rng):
    i, q = _fm_iq(rng, 256)
    ib = jnp.stack([jnp.asarray(i)] * 3)
    qb = jnp.stack([jnp.asarray(q)] * 3)
    y, (si, sq) = fm_discriminator(ib, qb, demod_init((3,), dtype=jnp.float64))
    assert y.shape == (3, 256)
    assert si.shape == (3,)
