"""fourier wrappers, binary IO, multihost helpers (single-host behavior)."""

import jax.numpy as jnp
import numpy as np

from rtsdr_tpu.io.binio import read_f32, read_iq_u8, write_f32
from rtsdr_tpu.ops.fourier import dft, magnitude


def test_dft_matches_quadratic_definition(rng):
    """Oracle: the O(N^2) DFT definition (reference src/fourier.cpp:15-23)."""
    n = 64
    x = rng.standard_normal(n)
    k = np.arange(n)
    ref = np.array([np.sum(x * np.exp(-2j * np.pi * k * m / n))
                    for m in range(n)])
    ours = np.asarray(dft(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-9)

    mag = np.asarray(magnitude(jnp.asarray(ref)))
    np.testing.assert_allclose(mag, np.abs(ref) / n, atol=1e-12)


def test_binio_roundtrip(tmp_path, rng):
    x = rng.standard_normal(100).astype(np.float32)
    p = str(tmp_path / "x.raw")
    write_f32(p, x)
    np.testing.assert_array_equal(read_f32(p), x)

    u8 = rng.integers(0, 256, 50, dtype=np.uint8)
    p2 = str(tmp_path / "iq.raw")
    u8.tofile(p2)
    np.testing.assert_array_equal(read_iq_u8(p2), u8)
    norm = read_iq_u8(p2, normalize=True)
    np.testing.assert_allclose(norm, (u8.astype(np.float32) - 128) / 128)


def test_multihost_single_host():
    from rtsdr_tpu.parallel.multihost import host_channel_slice, initialize

    initialize()  # no-op on one host
    assert host_channel_slice(8) == slice(0, 8)
