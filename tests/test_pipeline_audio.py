"""Mono+stereo pipeline vs the block-chained golden model oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtsdr_tpu.config import MODE0, MODE1
from rtsdr_tpu.pipeline.receiver import Receiver, make_receiver

from oracles import golden_mono_stereo, synth_multiplex_iq


@pytest.fixture(scope="module")
def multiplex_u8():
    n_blocks = 3
    return synth_multiplex_iq(n_blocks * 307200 // 2), n_blocks


def test_mono_stereo_matches_golden_chain(multiplex_u8):
    iq_u8, n_blocks = multiplex_u8
    ref = golden_mono_stereo(iq_u8, n_blocks)

    init_fn, step_fn = make_receiver(MODE0, dtype=jnp.float64,
                                     enable_rds=False)
    state = init_fn()
    step = jax.jit(step_fn)
    outs = {k: [] for k in ("mono", "left", "right")}
    bs = MODE0.block_size
    for b in range(n_blocks):
        blk = jnp.asarray(iq_u8[b * bs:(b + 1) * bs])
        state, out = step(state, blk)
        outs["mono"].append(np.asarray(out.mono))
        outs["left"].append(np.asarray(out.left))
        outs["right"].append(np.asarray(out.right))

    # Skip the start-of-stream warmup: while the zero-state transient rings,
    # I/Q are denormal-tiny and consecutive phases land on the +-pi unwrap
    # boundary, where lfilter-vs-conv rounding differences flip a demod
    # sample by 2*pi; the PLL then needs ~200 audio samples to re-converge
    # from those differing inputs.  Steady state (including all block seams)
    # matches to 1e-10.
    warmup = 500
    for k in ("mono", "left", "right"):
        ours = np.concatenate(outs[k])
        np.testing.assert_allclose(ours[warmup:], ref[k][warmup:], rtol=0,
                                   atol=1e-7, err_msg=f"channel {k}")


def test_mono_tone_recovered(multiplex_u8):
    """End-to-end sanity: the 1.1 kHz mono tone must dominate the decoded
    mono channel at the right amplitude (deviation-scaled)."""
    iq_u8, n_blocks = multiplex_u8
    rx = Receiver(MODE0, dtype=jnp.float32, enable_rds=False, jit=True)
    state = rx.init()
    bs = MODE0.block_size
    mono = []
    for b in range(n_blocks):
        state, out = rx.step(state, jnp.asarray(iq_u8[b * bs:(b + 1) * bs]))
        mono.append(np.asarray(out.mono))
    x = np.concatenate(mono)[MODE0.audio_len:]  # skip filter warmup

    fs = 48e3
    t = np.arange(len(x)) / fs
    c = np.sin(2 * np.pi * 1.1e3 * t)
    s = np.cos(2 * np.pi * 1.1e3 * t)
    amp = np.hypot(2 * np.mean(x * c), 2 * np.mean(x * s))
    # fm demod yields 2*pi*deviation*m/if_fs rad/sample; mono amp 0.45
    expected = 2 * np.pi * 75e3 * 0.45 / 240e3
    assert abs(amp - expected) / expected < 0.05
    # tone dominates: residual power well below tone power
    resid = x - amp * np.sin(2 * np.pi * 1.1e3 * t + np.arctan2(
        2 * np.mean(x * s), 2 * np.mean(x * c)))
    snr = 10 * np.log10(np.mean(x**2) / np.mean(resid**2))
    assert snr > 10, f"mono SNR too low: {snr:.1f} dB"


def test_stereo_separation(multiplex_u8):
    """The 2.3 kHz L-R tone must appear in the stereo difference output."""
    iq_u8, n_blocks = multiplex_u8
    init_fn, step_fn = make_receiver(MODE0, dtype=jnp.float32,
                                     enable_rds=False)
    state = init_fn()
    step = jax.jit(step_fn)
    bs = MODE0.block_size
    l_all, r_all = [], []
    for b in range(n_blocks):
        state, out = step(state, jnp.asarray(iq_u8[b * bs:(b + 1) * bs]))
        l_all.append(np.asarray(out.left))
        r_all.append(np.asarray(out.right))
    diff = np.concatenate(l_all) - np.concatenate(r_all)  # = stereo channel
    diff = diff[MODE0.audio_len:]
    fs = 48e3
    t = np.arange(len(diff)) / fs
    c = np.sin(2 * np.pi * 2.3e3 * t)
    s = np.cos(2 * np.pi * 2.3e3 * t)
    amp = np.hypot(2 * np.mean(diff * c), 2 * np.mean(diff * s))
    expected = 2 * np.pi * 75e3 * 0.45 / 240e3
    # The model's ncoOut[0:N] view is time-aligned (entries one-indexed),
    # so DSB-SC recovery is near-full; residual ~5% loss is filter rolloff
    # at 2.3 kHz + mixing products.
    assert amp > 0.85 * expected, f"stereo tone too weak: {amp} vs {expected}"


def test_mode1_shapes_and_audio():
    """Mode 1: 2.5 MS/s front end + x24/125 resampler -> 48 kS/s."""
    n_blocks = 2
    iq_u8 = synth_multiplex_iq(n_blocks * MODE1.block_size // 2, rf_fs=2.5e6)
    rx = Receiver(MODE1, dtype=jnp.float32, jit=True)
    state = rx.init()
    bs = MODE1.block_size
    mono = []
    for b in range(n_blocks):
        state, out = rx.step(state, jnp.asarray(iq_u8[b * bs:(b + 1) * bs]))
        assert out.left.shape == (MODE1.audio_len,)
        assert out.rds is None
        mono.append(np.asarray(out.mono))
    x = np.concatenate(mono)[MODE1.audio_len:]
    fs = 48e3
    t = np.arange(len(x)) / fs
    amp = np.hypot(2 * np.mean(x * np.sin(2 * np.pi * 1.1e3 * t)),
                   2 * np.mean(x * np.cos(2 * np.pi * 1.1e3 * t)))
    expected = 2 * np.pi * 75e3 * 0.45 / 250e3
    assert abs(amp - expected) / expected < 0.05


def test_batched_receiver_matches_single(multiplex_u8):
    iq_u8, _ = multiplex_u8
    bs = MODE0.block_size
    blk = iq_u8[:bs]
    batch = jnp.asarray(np.stack([blk, blk, blk]))

    init_b, step_b = make_receiver(MODE0, batch_shape=(3,),
                                   dtype=jnp.float64, enable_rds=False)
    init_s, step_s = make_receiver(MODE0, dtype=jnp.float64, enable_rds=False)
    sb, ob = step_b(init_b(), batch)
    ss, os_ = step_s(init_s(), jnp.asarray(blk))
    np.testing.assert_allclose(np.asarray(ob.left[1]), np.asarray(os_.left),
                               atol=1e-12)
