"""Fused-window Pallas FIR bank (interpret mode on CPU).

The kernel mimics the TPU MXU's default-precision bf16 operand
truncation, so comparisons against the f32 XLA path use a bf16-scale
tolerance; state-carry seams are checked pallas-vs-pallas (exact).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rtsdr_tpu.ops import coeffs
from rtsdr_tpu.ops.fir import fir_block, fir_decimate
from rtsdr_tpu.ops.pallas_fir import eligible, fir_bank_carried

BANK_H = [coeffs.bandpass_taps(240e3, 18.5e3, 19.5e3, 151),
          coeffs.bandpass_taps(240e3, 22e3, 54e3, 151),
          coeffs.bandpass_taps(240e3, 54e3, 60e3, 151)]
AUDIO_H = coeffs.lowpass_taps(240e3, 16e3, 101)


def _bf16_tol(y):
    return 2e-2 * float(np.max(np.abs(y))) + 1e-6


def test_bank_matches_fir_block(rng):
    c, n = 32, 2560
    x = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    zi = jnp.asarray(rng.standard_normal((c, 150)).astype(np.float32))
    assert eligible(x, 151, 1)
    ys, new_zi = fir_bank_carried(x, BANK_H, zi, 1)
    for f, h in enumerate(BANK_H):
        ref, ref_zi = fir_block(x, h, zi)
        np.testing.assert_allclose(np.asarray(ys[f]), np.asarray(ref),
                                   rtol=0, atol=_bf16_tol(ref))
        assert np.array_equal(np.asarray(new_zi), np.asarray(ref_zi))


@pytest.mark.parametrize("pre", ["square", "mul2"])
def test_bank_preops(rng, pre):
    c, n = 32, 2560
    x = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    zi = jnp.asarray(rng.standard_normal((c, 150)).astype(np.float32))
    ys, new_zi = fir_bank_carried(x, [BANK_H[2]], zi, 1, x2=x2, pre=pre)
    xp = x * x if pre == "square" else 2.0 * x * x2
    ref, ref_zi = fir_block(xp, BANK_H[2], zi)
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(ref),
                               rtol=0, atol=_bf16_tol(ref))
    np.testing.assert_allclose(np.asarray(new_zi), np.asarray(ref_zi),
                               rtol=0, atol=1e-6)


def test_bank_decimating(rng):
    c, n = 32, 5 * 1280
    x = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    zi = jnp.asarray(rng.standard_normal((c, 100)).astype(np.float32))
    assert eligible(x, 101, 5)
    ys, new_zi = fir_bank_carried(x, [AUDIO_H], zi, 5)
    ref, ref_zi = fir_decimate(x, AUDIO_H, zi, 5)
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(ref),
                               rtol=0, atol=_bf16_tol(ref))
    assert np.array_equal(np.asarray(new_zi), np.asarray(ref_zi))


def test_bank_block_seam(rng):
    """Two chained blocks == one double-length block.

    Seam outputs differ only at bf16 operand scale: the chained run
    applies the carried tail via the f32 boundary matmul, the one-shot
    run sees those samples through the bf16 in-kernel window (the XLA
    banded path has the same property with roles reversed)."""
    c, n = 32, 2560
    x1 = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    zi0 = jnp.zeros((c, 150), jnp.float32)
    y1, zi = fir_bank_carried(x1, [BANK_H[0]], zi0, 1)
    y2, _ = fir_bank_carried(x2, [BANK_H[0]], zi, 1)
    chained = np.concatenate([np.asarray(y1[0]), np.asarray(y2[0])],
                             axis=-1)
    y_full, _ = fir_bank_carried(jnp.concatenate([x1, x2], axis=-1),
                                 [BANK_H[0]], zi0, 1)
    full = np.asarray(y_full[0])
    np.testing.assert_allclose(chained, full, rtol=0, atol=_bf16_tol(full))
    # away from the carry region the windows are identical -> f32-exact
    np.testing.assert_allclose(chained[:, 256:n], full[:, 256:n],
                               rtol=0, atol=2e-5)


def test_ineligible_shapes(rng):
    x = jnp.zeros((31, 2560), jnp.float32)       # c % 32 != 0
    assert not eligible(x, 151, 1)
    # m % block != 0 is ELIGIBLE for stride-1 banks since round 5: the
    # zero-state kernel right-pads to the block grid and slices
    # (mode-1's if_len=16000); strided banks still require divisibility
    x = jnp.zeros((32, 2560 + 128), jnp.float32)
    assert eligible(x, 151, 1)
    x = jnp.zeros((32, 5 * 1344), jnp.float32)   # m=1344 % 128 != 0
    assert not eligible(x, 101, 5)
    x = jnp.zeros((32, 2560), jnp.float64)        # dtype
    assert not eligible(x, 151, 1)
    x = jnp.zeros((32, 2560), jnp.float32)        # 1-tap filter (hw = 0)
    assert not eligible(x, 1, 1)


def test_bank_padded_grid_matches_fir_block(rng):
    """Stride-1 bank on a length that does NOT divide the block grid
    (mode-1's if_len=16000 shape, scaled down): right-pad + slice must
    equal the XLA fir_block exactly, including the carried tail."""
    c = 32
    for n in (2000, 16000 // 4):      # 2000 % 256 != 0, 4000 % 512 != 0
        x = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        zi = jnp.asarray(rng.standard_normal((c, 150)).astype(np.float32))
        assert eligible(x, 151, 1)
        ys, new_zi = fir_bank_carried(x, BANK_H, zi, 1)
        assert ys[0].shape == (c, n)
        for f, h in enumerate(BANK_H):
            ref, ref_zi = fir_block(x, h, zi)
            np.testing.assert_allclose(np.asarray(ys[f]), np.asarray(ref),
                                       rtol=0, atol=_bf16_tol(ref))
        assert np.array_equal(np.asarray(new_zi), np.asarray(ref_zi))


class TestResampleMul2:
    """Fused mixer + polyphase resampler vs the materialized-mixer path."""

    UP, DOWN = 19, 80

    def _comb(self):
        from rtsdr_tpu.config import MODE0
        from rtsdr_tpu.pipeline.rds import composed_resampler_taps

        return composed_resampler_taps(MODE0)  # 3001 taps

    def _ref(self, e, ni, nq, h, zi):
        from rtsdr_tpu.ops.fir import fir_resample

        mixed = 2.0 * e[..., None, :] * jnp.stack([ni, nq], axis=-2)
        return fir_resample(mixed, h, zi, self.UP, self.DOWN)

    def test_matches_xla_path(self, rng):
        from rtsdr_tpu.ops.pallas_fir import _resample_geom, resample_mul2

        h = self._comb()
        c, n = 32, 3840
        assert _resample_geom(n, self.UP, self.DOWN, len(h) - 1)
        e = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        ni = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        nq = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        zi = jnp.asarray(
            rng.standard_normal((c, 2, len(h) - 1)).astype(np.float32))
        y, new_zi = resample_mul2(e, ni, nq, h, zi, self.UP, self.DOWN,
                                  impl="pallas")
        ref, ref_zi = self._ref(e, ni, nq, h, zi)
        assert y.shape == ref.shape == (c, 2, n * self.UP // self.DOWN)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=0, atol=_bf16_tol(ref))
        np.testing.assert_array_equal(np.asarray(new_zi),
                                      np.asarray(ref_zi))

    def test_block_seam(self, rng):
        """Chained blocks == one double block (bf16 tolerance at the
        seam, where the carry enters via the f32 boundary matmul)."""
        from rtsdr_tpu.ops.pallas_fir import resample_mul2

        h = self._comb()
        c, n = 32, 3840
        t1 = len(h) - 1
        mk = lambda: jnp.asarray(
            rng.standard_normal((c, 2 * n)).astype(np.float32))
        e, ni, nq = mk(), mk(), mk()
        zi0 = jnp.zeros((c, 2, t1), jnp.float32)
        y1, zi = resample_mul2(e[:, :n], ni[:, :n], nq[:, :n], h, zi0,
                               self.UP, self.DOWN, impl="pallas")
        y2, _ = resample_mul2(e[:, n:], ni[:, n:], nq[:, n:], h, zi,
                              self.UP, self.DOWN, impl="pallas")
        y_full, _ = resample_mul2(e, ni, nq, h, zi0, self.UP, self.DOWN,
                                  impl="pallas")
        chained = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
        full = np.asarray(y_full)
        np.testing.assert_allclose(chained, full, rtol=0,
                                   atol=_bf16_tol(full))

    def test_mode1_geometry_falls_back(self):
        """MODE1_RDS x57/250: phase-banded matrix too large -> XLA path."""
        from rtsdr_tpu.ops.pallas_fir import _resample_geom

        assert _resample_geom(16000, 57, 250, 8700) is None

    def test_rrc_fused_matches_composition(self, rng):
        """resample_mul2_rrc == resample_mul2 then fir_block(rrc)."""
        from rtsdr_tpu.config import MODE0
        from rtsdr_tpu.ops.fir import fir_block
        from rtsdr_tpu.ops.pallas_fir import resample_mul2, resample_mul2_rrc

        h = self._comb()
        r = MODE0.rds
        rrc_h = coeffs.rrc_taps(r.rrc_fs, r.rrc_taps, r.rrc_beta,
                                r.symbol_rate)
        c, n = 32, 3840
        t1 = len(h) - 1
        t1r = len(rrc_h) - 1
        e = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        ni = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        nq = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        zi = jnp.asarray(
            rng.standard_normal((c, 2, t1)).astype(np.float32) * 0.1)
        rrc_zi = jnp.asarray(
            rng.standard_normal((c, 2, t1r)).astype(np.float32) * 0.1)
        rrc, new_zi, new_rrc_zi = resample_mul2_rrc(
            e, ni, nq, h, zi, rrc_h, rrc_zi, self.UP, self.DOWN,
            impl="pallas")
        resamp, ref_zi = resample_mul2(e, ni, nq, h, zi, self.UP,
                                       self.DOWN, impl="pallas")
        ref_rrc, ref_rrc_zi = fir_block(resamp, rrc_h, rrc_zi)
        assert rrc.shape == ref_rrc.shape
        np.testing.assert_allclose(np.asarray(rrc), np.asarray(ref_rrc),
                                   rtol=0, atol=_bf16_tol(ref_rrc))
        np.testing.assert_array_equal(np.asarray(new_zi),
                                      np.asarray(ref_zi))
        # tail is taken from the in-kernel resampler output (bitwise the
        # resample_mul2 output there)
        np.testing.assert_array_equal(np.asarray(new_rrc_zi),
                                      np.asarray(ref_rrc_zi))

    def test_rrc_fused_block_seam(self, rng):
        """Chained fused blocks == one double fused block (carries enter
        via f32 boundary matmuls at the seam -> bf16-scale tolerance)."""
        from rtsdr_tpu.config import MODE0
        from rtsdr_tpu.ops.pallas_fir import resample_mul2_rrc

        h = self._comb()
        r = MODE0.rds
        rrc_h = coeffs.rrc_taps(r.rrc_fs, r.rrc_taps, r.rrc_beta,
                                r.symbol_rate)
        c, n = 32, 3840
        t1, t1r = len(h) - 1, len(rrc_h) - 1
        mk = lambda: jnp.asarray(
            rng.standard_normal((c, 2 * n)).astype(np.float32))
        e, ni, nq = mk(), mk(), mk()
        zi0 = jnp.zeros((c, 2, t1), jnp.float32)
        rzi0 = jnp.zeros((c, 2, t1r), jnp.float32)
        y1, zi, rzi = resample_mul2_rrc(e[:, :n], ni[:, :n], nq[:, :n],
                                        h, zi0, rrc_h, rzi0,
                                        self.UP, self.DOWN, impl="pallas")
        y2, _, _ = resample_mul2_rrc(e[:, n:], ni[:, n:], nq[:, n:],
                                     h, zi, rrc_h, rzi,
                                     self.UP, self.DOWN, impl="pallas")
        y_full, _, _ = resample_mul2_rrc(e, ni, nq, h, zi0, rrc_h, rzi0,
                                         self.UP, self.DOWN, impl="pallas")
        chained = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
        full = np.asarray(y_full)
        np.testing.assert_allclose(chained, full, rtol=0,
                                   atol=_bf16_tol(full))

    @pytest.mark.parametrize("up,down,n,taps", [
        (3, 4, 1024, 31),     # fractional up
        (5, 2, 512, 41),      # net upsampling
        (19, 80, 3840, 301),  # RDS-like, shorter filter
    ])
    def test_geometry_sweep(self, rng, up, down, n, taps):
        """Kernel == fallback across unrelated rational geometries."""
        from rtsdr_tpu.ops.fir import fir_resample
        from rtsdr_tpu.ops.pallas_fir import resample_mul2

        h = np.asarray(coeffs.lowpass_taps(240e3, 16e3, taps), np.float64)
        c = 32
        t1 = taps - 1
        e = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        ni = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        nq = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        zi = jnp.asarray(
            rng.standard_normal((c, 2, t1)).astype(np.float32) * 0.3)
        y, new_zi = resample_mul2(e, ni, nq, h, zi, up, down,
                                  impl="pallas")
        mixed = 2.0 * e[..., None, :] * jnp.stack([ni, nq], axis=-2)
        ref, ref_zi = fir_resample(mixed, h, zi, up, down)
        assert y.shape == (c, 2, n * up // down)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=0, atol=_bf16_tol(ref))
        np.testing.assert_array_equal(np.asarray(new_zi),
                                      np.asarray(ref_zi))

    @pytest.mark.parametrize("up,down,n,taps,rrc_taps", [
        (3, 4, 1024, 31, 25),     # fractional up, short matched filter
        (5, 2, 512, 41, 61),      # net upsampling
        (19, 80, 3840, 301, 151), # RDS-like
    ])
    def test_rrc_fused_geometry_sweep(self, rng, up, down, n, taps,
                                      rrc_taps):
        """Fused resampler+RRC == composition across unrelated rational
        geometries (the in-kernel rolling scratch and the outside
        boundary matmuls must hold for any (b, bp, hw2))."""
        from rtsdr_tpu.ops.fir import fir_block
        from rtsdr_tpu.ops.pallas_fir import resample_mul2, resample_mul2_rrc

        h = np.asarray(coeffs.lowpass_taps(240e3, 16e3, taps), np.float64)
        rrc_h = np.asarray(
            coeffs.rrc_taps(57e3, rrc_taps, 0.9, 2375), np.float64)
        c = 32
        t1, t1r = taps - 1, rrc_taps - 1
        e = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        ni = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        nq = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        zi = jnp.asarray(
            rng.standard_normal((c, 2, t1)).astype(np.float32) * 0.3)
        rzi = jnp.asarray(
            rng.standard_normal((c, 2, t1r)).astype(np.float32) * 0.3)
        rrc, new_zi, new_rzi = resample_mul2_rrc(
            e, ni, nq, h, zi, rrc_h, rzi, up, down, impl="pallas")
        resamp, ref_zi = resample_mul2(e, ni, nq, h, zi, up, down,
                                       impl="pallas")
        ref_rrc, ref_rzi = fir_block(resamp, rrc_h, rzi)
        np.testing.assert_allclose(np.asarray(rrc), np.asarray(ref_rrc),
                                   rtol=0, atol=_bf16_tol(ref_rrc))
        np.testing.assert_array_equal(np.asarray(new_zi),
                                      np.asarray(ref_zi))
        np.testing.assert_array_equal(np.asarray(new_rzi),
                                      np.asarray(ref_rzi))
