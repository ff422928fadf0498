"""Block FIR / decimator / resampler vs chained scipy.signal.lfilter.

The golden models do all filtering as lfilter(zi=...) chains
(model/fmMonoBlock.py:86-160, model/fmRDSblock.py:133-204); block-chained
output equivalence is the reference's own refactoring criterion ("bit
equivalence is expected", SURVEY.md §4.3).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal

from rtsdr_tpu.ops.coeffs import lowpass_taps
from rtsdr_tpu.ops.fir import (
    fir_block,
    fir_decimate,
    fir_resample,
    fir_zi,
    resample_zi,
)


def _chained_lfilter(h, blocks):
    zi = np.zeros(len(h) - 1)
    outs = []
    for b in blocks:
        y, zi = signal.lfilter(h, 1.0, b, zi=zi)
        outs.append(y)
    return np.concatenate(outs)


@pytest.mark.parametrize("dtype,tol", [(jnp.float64, 1e-12), (jnp.float32, 2e-5)])
def test_fir_block_matches_lfilter_chain(rng, dtype, tol):
    h = lowpass_taps(240e3, 16e3, 151)
    x = rng.standard_normal(4096)
    blocks = x.reshape(4, 1024)

    zi = fir_zi(151, dtype=dtype)
    outs = []
    for b in blocks:
        y, zi = fir_block(jnp.asarray(b, dtype), h, zi)
        outs.append(np.asarray(y))
    ours = np.concatenate(outs)

    ref = _chained_lfilter(h, blocks)
    np.testing.assert_allclose(ours, ref, rtol=tol, atol=tol)


def test_fir_decimate_matches_lfilter_stride(rng):
    h = lowpass_taps(2.4e6, 100e3, 151)
    decim = 10
    blocks = rng.standard_normal((3, 2000))

    zi = fir_zi(151, dtype=jnp.float64)
    outs = []
    for b in blocks:
        y, zi = fir_decimate(jnp.asarray(b, jnp.float64), h, zi, decim)
        outs.append(np.asarray(y))
    ours = np.concatenate(outs)

    # oracle: full lfilter chain then stride (block-aligned since D | len)
    ref_full = _chained_lfilter(h, blocks)
    ref = ref_full[::decim]
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_fir_resample_matches_golden_pipeline(rng):
    """Oracle is the RDS resampler pipeline (model/fmRDSblock.py:184-199):
    zero-stuff x19, lfilter anti-image (zi chained), [::80] * 19."""
    up, down = 19, 80
    h = lowpass_taps(240e3 * up, 57e3 / 2, 151)
    n = 1520  # divisible: n*19/80 = 361
    blocks = rng.standard_normal((3, n))

    zi = resample_zi(151, dtype=jnp.float64)
    outs = []
    for b in blocks:
        y, zi = fir_resample(jnp.asarray(b, jnp.float64), h, zi, up, down)
        outs.append(np.asarray(y))
    ours = np.concatenate(outs)

    zi_ref = np.zeros(150)
    ref_outs = []
    for b in blocks:
        u = np.zeros(len(b) * up)
        u[::up] = b
        yu, zi_ref = signal.lfilter(h, 1.0, u, zi=zi_ref)
        ref_outs.append(yu[::down] * up)
    ref = np.concatenate(ref_outs)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_fir_resample_mode1_shape():
    """Mode-1 audio resampler: 16000 IF samples -> 3072 audio samples."""
    up, down, taps = 24, 125, 151 * 24
    h = lowpass_taps(250e3 * up, 16e3, taps)
    x = jnp.ones((16000,), jnp.float32)
    y, zi = fir_resample(x, h, resample_zi(taps, dtype=jnp.float32), up, down)
    assert y.shape == (16000 * up // down,)
    assert zi.shape == (taps - 1,)


def test_batched_matches_loop(rng):
    """Leading channel dims must be equivalent to looping channels."""
    h = lowpass_taps(240e3, 16e3, 151)
    x = rng.standard_normal((5, 2048))
    zi = fir_zi(151, (5,), dtype=jnp.float64)
    y_b, zi_b = fir_decimate(jnp.asarray(x), h, zi, 5)
    for c in range(5):
        y_c, zi_c = fir_decimate(jnp.asarray(x[c]), h, fir_zi(151, dtype=jnp.float64), 5)
        np.testing.assert_allclose(np.asarray(y_b[c]), np.asarray(y_c), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(zi_b[c]), np.asarray(zi_c), rtol=1e-12)
