"""Fused u8 ingest+FIR front end vs the reference split pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from rtsdr_tpu.ops.coeffs import lowpass_taps
from rtsdr_tpu.ops.fir import fir_decimate, fir_zi
from rtsdr_tpu.ops.ingestfir import ingest_fir_decimate


@pytest.mark.parametrize("n_pairs,decim,taps", [(15360, 10, 151),
                                                (1600, 4, 31),
                                                (1000, 10, 151)])
def test_fused_matches_split(rng, n_pairs, decim, taps):
    h = lowpass_taps(2.4e6, 100e3, taps)
    raw1 = rng.integers(0, 256, (3, 2 * n_pairs), dtype=np.uint8)
    raw2 = rng.integers(0, 256, (3, 2 * n_pairs), dtype=np.uint8)

    def split_chain(raw, zi):
        x = (jnp.asarray(raw).astype(jnp.float32) - 128.0) / 128.0
        iq = jnp.stack([x[..., 0::2], x[..., 1::2]], axis=-2)
        y, zi = fir_decimate(iq, h, zi, decim)
        return y, zi

    zi = fir_zi(taps, (3, 2), jnp.float32)
    r1, zi = split_chain(raw1, zi)
    r2, zi = split_chain(raw2, zi)

    zi_i = fir_zi(taps, (3,), jnp.float32)
    zi_q = fir_zi(taps, (3,), jnp.float32)
    o1i, o1q, zi_i, zi_q = ingest_fir_decimate(jnp.asarray(raw1), h,
                                               zi_i, zi_q, decim)
    o2i, o2q, zi_i, zi_q = ingest_fir_decimate(jnp.asarray(raw2), h,
                                               zi_i, zi_q, decim)

    for ours, ref in [(o1i, r1[:, 0]), (o1q, r1[:, 1]),
                      (o2i, r2[:, 0]), (o2q, r2[:, 1])]:
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=0, atol=3e-6)


def test_pallas_block64_matches(rng):
    """The narrower output-block geometry (less banded-FLOP waste,
    different look-back ref width) is output-identical."""
    h = lowpass_taps(2.4e6, 100e3, 151)
    raw = rng.integers(0, 256, (32, 6 * 128 * 20), dtype=np.uint8)
    zi = rng.standard_normal((32, 150)).astype(np.float32)
    a = ingest_fir_decimate(jnp.asarray(raw), h, jnp.asarray(zi),
                            jnp.asarray(zi), 10, block=128, impl="pallas")
    b = ingest_fir_decimate(jnp.asarray(raw), h, jnp.asarray(zi),
                            jnp.asarray(zi), 10, block=64, impl="pallas")
    for k in range(2):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=0, atol=1e-6)


def test_pallas_matches_s8_and_f32(rng):
    """The fused Pallas kernel (interpret mode on CPU) vs the XLA paths.

    vs the s8 XLA path: same integer dot + same f32 epilogue -> float
    rounding only.  vs f32: bounded by the two-level s8 tap quantization
    (~4e-5, 26x tighter than one bf16 level; measured on-chip).
    """
    h = lowpass_taps(2.4e6, 100e3, 151)
    c, nblk = 32, 6
    raw = rng.integers(0, 256, (c, nblk * 128 * 20), dtype=np.uint8)
    zi = rng.standard_normal((c, 150)).astype(np.float32)
    zq = rng.standard_normal((c, 150)).astype(np.float32)
    outs = {impl: ingest_fir_decimate(jnp.asarray(raw), h,
                                      jnp.asarray(zi), jnp.asarray(zq),
                                      10, impl=impl)
            for impl in ("f32", "s8", "pallas")}
    for k in range(2):
        np.testing.assert_allclose(np.asarray(outs["pallas"][k]),
                                   np.asarray(outs["s8"][k]),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(outs["pallas"][k]),
                                   np.asarray(outs["f32"][k]),
                                   rtol=0, atol=1e-4)
    # carried tail state is impl-independent
    for k in (2, 3):
        assert np.array_equal(np.asarray(outs["pallas"][k]),
                              np.asarray(outs["f32"][k]))
