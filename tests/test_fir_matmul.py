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


def test_matmul_conv_f32(rng):
    h = lowpass_taps(240e3, 16e3, 151).astype(np.float32)
    x = rng.standard_normal((2, 2, 15510)).astype(np.float32)
    ref = np.asarray(_conv1d_valid_xla(jnp.asarray(x), jnp.asarray(h), 1))
    ours = np.asarray(_conv1d_valid_matmul(jnp.asarray(x), jnp.asarray(h), 1))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-6)
