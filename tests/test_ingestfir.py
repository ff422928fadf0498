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


def test_kernel_atan2_matches_numpy():
    """The Pallas polynomial atan2 vs np.arctan2 across quadrants, axes,
    zeros (incl. the y=0, x<0 -> +pi convention) and magnitudes."""
    from rtsdr_tpu.ops.ingestfir import _atan2

    rng = np.random.default_rng(7)
    y = rng.standard_normal(20000).astype(np.float32) * \
        10.0 ** rng.uniform(-6, 3, 20000).astype(np.float32)
    x = rng.standard_normal(20000).astype(np.float32) * \
        10.0 ** rng.uniform(-6, 3, 20000).astype(np.float32)
    specials = np.array([[0, 0], [0, 1], [0, -1], [1, 0], [-1, 0],
                         [1e-30, -1], [-1e-30, -1]], np.float32)
    y = np.concatenate([y, specials[:, 0]])
    x = np.concatenate([x, specials[:, 1]])
    got = np.asarray(_atan2(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y, x)
    np.testing.assert_allclose(got, ref, atol=4e-6, rtol=0)
    assert got[-7] == 0.0                       # atan2(0, 0)
    assert got[-5] == np.float32(np.arctan2(0.0, -1.0))   # +pi


def test_fused_demod_matches_split(rng):
    """ingest_fir_demod (interpret-mode kernel) vs the split chain
    (ingest + XLA atan2 discriminator), two chained blocks."""
    from rtsdr_tpu.ops.demod import fm_discriminator
    from rtsdr_tpu.ops.ingestfir import ingest_fir_demod

    h = lowpass_taps(2.4e6, 100e3, 151)
    c = 32
    raw1 = rng.integers(0, 256, (c, 128 * 20 * 6), dtype=np.uint8)
    raw2 = rng.integers(0, 256, (c, 128 * 20 * 6), dtype=np.uint8)
    zi = rng.standard_normal((c, 150)).astype(np.float32)
    zq = rng.standard_normal((c, 150)).astype(np.float32)
    pi0 = jnp.ones((c,), jnp.float32)
    pq0 = jnp.zeros((c,), jnp.float32)

    a, b, pi, pq = zi, zq, pi0, pq0
    fused = []
    for raw in (raw1, raw2):
        fm, a, b, pi, pq = ingest_fir_demod(jnp.asarray(raw), h, a, b,
                                            pi, pq, 10, impl="pallas")
        fused.append(np.asarray(fm))

    a, b, st = jnp.asarray(zi), jnp.asarray(zq), (pi0, pq0)
    split = []
    for raw in (raw1, raw2):
        yi, yq, a, b = ingest_fir_decimate(jnp.asarray(raw), h, a, b, 10,
                                           impl="s8")
        fm, st = fm_discriminator(yi, yq, st)
        split.append(np.asarray(fm))

    for f, s in zip(fused, split):
        np.testing.assert_allclose(f, s, atol=5e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(pi), np.asarray(st[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pq), np.asarray(st[1]), atol=1e-6)


@pytest.mark.parametrize("emit_fm", [True, False])
def test_demod_audio_fused_matches_composition(rng, emit_fm):
    """ingest_fir_demod_audio == ingest_fir_demod then fir_decimate:
    fm and every carried state bitwise, audio at bf16-window scale
    (the in-kernel second stage regroups the banded accumulation)."""
    from rtsdr_tpu.ops import coeffs
    from rtsdr_tpu.ops.fir import fir_decimate
    from rtsdr_tpu.ops.ingestfir import (
        ingest_fir_demod,
        ingest_fir_demod_audio,
    )

    c, decim, down = 32, 10, 5
    n = 2 * decim * 128 * down * 4          # 4 output tiles of 640
    raw = jnp.asarray(rng.integers(0, 256, (c, n), np.uint8))
    rf_h = np.asarray(coeffs.lowpass_taps(2.4e6, 100e3, 151), np.float64)
    mono_h = np.asarray(coeffs.lowpass_taps(240e3, 16e3, 151), np.float64)
    zi = jnp.asarray(rng.standard_normal((c, 150)).astype(np.float32) * .1)
    azi = jnp.asarray(rng.standard_normal((c, 150)).astype(np.float32) * .1)
    pi = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * .1)
    pq = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * .1)

    fm_r, zii_r, ziq_r, pi_r, pq_r = ingest_fir_demod(
        raw, rf_h, zi, zi, pi, pq, decim, impl="pallas")
    au_r, azi_r = fir_decimate(fm_r, mono_h, azi, down)

    fm, au, zii, ziq, pi2, pq2, azi2 = ingest_fir_demod_audio(
        raw, rf_h, zi, zi, pi, pq, decim, mono_h, azi, down,
        emit_fm=emit_fm, impl="pallas")
    if emit_fm:
        np.testing.assert_array_equal(np.asarray(fm), np.asarray(fm_r))
    else:
        assert fm is None
    tol = 2e-2 * float(np.max(np.abs(np.asarray(au_r)))) + 1e-6
    np.testing.assert_allclose(np.asarray(au), np.asarray(au_r),
                               rtol=0, atol=tol)
    np.testing.assert_array_equal(np.asarray(azi2), np.asarray(azi_r))
    np.testing.assert_array_equal(np.asarray(zii), np.asarray(zii_r))
    np.testing.assert_array_equal(np.asarray(pi2), np.asarray(pi_r))
    np.testing.assert_array_equal(np.asarray(pq2), np.asarray(pq_r))


@pytest.mark.parametrize("emit_fm", [True, False])
def test_demod_audio_bank_fused_matches_composition(rng, emit_fm):
    """The in-epilogue IF band-pass bank (round-5 VERDICT task 5) ==
    ingest_fir_demod -> fir_block_bank on the same fm, per filter, at
    bf16-window scale; every carried state bitwise vs the audio-only
    kernel."""
    from rtsdr_tpu.ops import coeffs
    from rtsdr_tpu.ops.fir import fir_block
    from rtsdr_tpu.ops.ingestfir import (
        ingest_fir_demod,
        ingest_fir_demod_audio,
    )

    c, decim, down = 32, 10, 5
    n = 2 * decim * 128 * down * 4
    raw = jnp.asarray(rng.integers(0, 256, (c, n), np.uint8))
    rf_h = np.asarray(coeffs.lowpass_taps(2.4e6, 100e3, 151), np.float64)
    mono_h = np.asarray(coeffs.lowpass_taps(240e3, 16e3, 151), np.float64)
    bank_h = [
        np.asarray(coeffs.bandpass_taps(240e3, 18.5e3, 19.5e3, 151)),
        np.asarray(coeffs.bandpass_taps(240e3, 22e3, 54e3, 151)),
        np.asarray(coeffs.bandpass_taps(240e3, 54e3, 60e3, 151)),
    ]
    zi = jnp.asarray(rng.standard_normal((c, 150)).astype(np.float32) * .1)
    azi = jnp.asarray(rng.standard_normal((c, 150)).astype(np.float32) * .1)
    bzi = jnp.asarray(rng.standard_normal((c, 150)).astype(np.float32) * .1)
    pi = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * .1)
    pq = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * .1)

    fm_r, *_ = ingest_fir_demod(raw, rf_h, zi, zi, pi, pq, decim,
                                impl="pallas")

    out = ingest_fir_demod_audio(
        raw, rf_h, zi, zi, pi, pq, decim, mono_h, azi, down,
        emit_fm=emit_fm, impl="pallas", bank_h=bank_h, bank_zi=bzi)
    banks = out[7]
    assert len(banks) == 3
    for f, bh in enumerate(bank_h):
        ref, _ = fir_block(fm_r, bh, bzi)
        ref = np.asarray(ref)
        tol = 2e-2 * float(np.max(np.abs(ref))) + 1e-6
        np.testing.assert_allclose(np.asarray(banks[f]), ref,
                                   rtol=0, atol=tol)


def test_receiver_fused_bank_matches_unfused(rng, monkeypatch):
    """Full stereo+RDS receiver with the bank epilogue vs the same
    receiver with the separate bank pass (both on the fused ingest
    kernel, policy gate bypassed; interpret mode), on a locked-pilot
    multiplex signal across TWO chained blocks so the shared fm tail
    crosses the seam.  A pilot-locked PLL is contractive, so the
    bf16-window-scale bank difference stays bounded through the loop
    (random-byte input would be chaotic there by design)."""
    import sys

    import jax

    from rtsdr_tpu.config import MODE0
    from rtsdr_tpu.ops import ingestfir
    from rtsdr_tpu.pipeline.receiver import make_receiver

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from oracles import synth_multiplex_iq

    cfg = MODE0
    c = 32
    u8 = synth_multiplex_iq(2 * cfg.block_size // 2)
    raw = np.broadcast_to(u8.reshape(2, cfg.block_size),
                          (c, 2, cfg.block_size)).transpose(1, 0, 2)

    real_eligible = ingestfir.ingest_audio_eligible
    monkeypatch.setattr(
        ingestfir, "ingest_audio_eligible",
        lambda *a, **k: real_eligible(*a, **{**k, "policy": False}))

    def run(fuse):
        init_fn, step_fn = make_receiver(cfg, (c,), jnp.float32,
                                         fuse_if_bank=fuse)
        state = init_fn()
        outs = []
        for b in range(2):
            state, out = step_fn(state, jnp.asarray(raw[b]))
            outs.append(out)
        return outs

    fused = run(True)
    ref = run(False)
    for b in range(2):
        for name in ("left", "right", "mono"):
            r = np.asarray(getattr(ref[b], name))
            f = np.asarray(getattr(fused[b], name))
            tol = 2e-2 * float(np.max(np.abs(r))) + 1e-5
            np.testing.assert_allclose(f, r, rtol=0, atol=tol)
        # frame decisions identical on a clean station
        np.testing.assert_array_equal(np.asarray(ref[b].rds.is_sync),
                                      np.asarray(fused[b].rds.is_sync))
