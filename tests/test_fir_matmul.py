"""MXU matmul conv formulation vs the XLA conv reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from rtsdr_tpu.ops.coeffs import lowpass_taps
from rtsdr_tpu.ops.fir import _conv1d_valid_matmul, _conv1d_valid_xla


@pytest.mark.parametrize("stride,n", [(1, 15360), (1, 1000), (5, 15360),
                                      (10, 153600), (80, 291840), (3, 299)])
def test_matmul_conv_matches_xla(rng, stride, n):
    taps = 151
    h = lowpass_taps(240e3, 16e3, taps)
    x = rng.standard_normal((3, n + taps - 1))
    ref = np.asarray(_conv1d_valid_xla(jnp.asarray(x), jnp.asarray(h), stride))
    ours = np.asarray(_conv1d_valid_matmul(jnp.asarray(x), jnp.asarray(h),
                                           stride))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("up,down,n,taps", [
    (19, 80, 15360, 151),    # RDS resampler
    (24, 125, 16000, 3624),  # mode-1 audio resampler
    (3, 7, 1400, 45),
    (5, 2, 200, 31),
])
def test_polyphase_matmul_matches_u_domain(rng, up, down, n, taps):
    """The x-domain polyphase matmul must equal the u-domain reference
    exactly, including the zi boundary terms and the carried state."""
    from rtsdr_tpu.ops.fir import (
        _resample_polyphase_matmul,
        fir_resample,
        resample_zi,
    )
    import jax

    h = np.sin(np.arange(taps) * 0.37) / taps  # arbitrary full-band taps
    x1 = rng.standard_normal((2, n))
    x2 = rng.standard_normal((2, n))

    # reference: u-domain chain over two blocks (fir_resample on CPU)
    zi = resample_zi(taps, (2,), jnp.float64)
    ref1, zi_ref = fir_resample(jnp.asarray(x1), h, zi, up, down)
    ref2, zi_ref2 = fir_resample(jnp.asarray(x2), h, zi_ref, up, down)

    zi = resample_zi(taps, (2,), jnp.float64)
    o1, zi_o = _resample_polyphase_matmul(jnp.asarray(x1), jnp.asarray(h),
                                          zi, up, down)
    o2, zi_o2 = _resample_polyphase_matmul(jnp.asarray(x2), jnp.asarray(h),
                                           zi_o, up, down)
    np.testing.assert_allclose(np.asarray(o1) * up, np.asarray(ref1),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(zi_o), np.asarray(zi_ref))
    np.testing.assert_allclose(np.asarray(o2) * up, np.asarray(ref2),
                               rtol=1e-12, atol=1e-12)


def test_matmul_conv_f32(rng):
    h = lowpass_taps(240e3, 16e3, 151).astype(np.float32)
    x = rng.standard_normal((2, 2, 15510)).astype(np.float32)
    ref = np.asarray(_conv1d_valid_xla(jnp.asarray(x), jnp.asarray(h), 1))
    ours = np.asarray(_conv1d_valid_matmul(jnp.asarray(x), jnp.asarray(h), 1))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-6)


def test_multi_filter_matmul_matches_individual(rng):
    """Stacked F-filter banded matmul == per-filter matmuls exactly."""
    from rtsdr_tpu.ops.fir import _conv1d_valid_multi_matmul

    taps = 151
    hs = [lowpass_taps(240e3, 16e3, taps),
          lowpass_taps(240e3, 3e3, taps),
          np.sin(np.arange(taps) * 0.7) / taps]
    xext = rng.standard_normal((3, 15360 + taps - 1))
    got = np.asarray(_conv1d_valid_multi_matmul(
        jnp.asarray(xext), jnp.stack([jnp.asarray(h) for h in hs])))
    assert got.shape == (3, 3, 15360)
    for f, h in enumerate(hs):
        ref = np.asarray(_conv1d_valid_matmul(jnp.asarray(xext),
                                              jnp.asarray(h)))
        np.testing.assert_allclose(got[:, f], ref, rtol=1e-12, atol=1e-12)


def test_fir_block_multi_state_chain(rng):
    """fir_block_multi == F separate fir_block chains, including state."""
    from rtsdr_tpu.ops.fir import fir_block, fir_block_multi, fir_zi

    taps = 151
    hs = [lowpass_taps(240e3, 16e3, taps),
          np.cos(np.arange(taps) * 0.3) / taps]
    x1 = rng.standard_normal((2, 2000))
    x2 = rng.standard_normal((2, 2000))

    zi = fir_zi(taps, (2,), jnp.float64)
    y1, zi1 = fir_block_multi(jnp.asarray(x1), hs, zi)
    y2, zi2 = fir_block_multi(jnp.asarray(x2), hs, zi1)

    for f, h in enumerate(hs):
        zr = fir_zi(taps, (2,), jnp.float64)
        r1, zr1 = fir_block(jnp.asarray(x1), h, zr)
        r2, zr2 = fir_block(jnp.asarray(x2), h, zr1)
        np.testing.assert_allclose(np.asarray(y1[:, f]), np.asarray(r1),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(y2[:, f]), np.asarray(r2),
                                   atol=1e-12)
        np.testing.assert_array_equal(np.asarray(zi2), np.asarray(zr2))
