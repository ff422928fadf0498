"""Mode-1 (2.5 MS/s, x24/125 audio) golden-chain parity.

The reference has no mode-1 Python model (its C++ mode 1 carries known
rate bugs, SURVEY.md §7), so the oracle here is the same golden *structure*
at mode-1 rates: firwin + chained lfilter + zero-stuff/decimate — the
physically-correct chain this framework implements.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal

from rtsdr_tpu.config import MODE1
from rtsdr_tpu.pipeline.receiver import make_receiver

from oracles import golden_fm_demod, golden_pll, pll_init_state, synth_multiplex_iq


def golden_mode1(iq_u8, n_blocks):
    rf_fs, rf_decim, taps = 2.5e6, 10, 151
    if_fs = rf_fs / rf_decim  # 250 kS/s
    up, down = 24, 125
    a_taps = taps * up
    bs = MODE1.block_size

    rf_coeff = signal.firwin(taps, 100e3 / (rf_fs / 2), window="hann")
    audio_coeff = signal.firwin(a_taps, 16e3 / (if_fs * up / 2), window="hann")
    pilot_coeff = signal.firwin(taps, [18.5e3 / (if_fs / 2), 19.5e3 / (if_fs / 2)],
                                window="hann", pass_zero="bandpass")
    chan_coeff = signal.firwin(taps, [22e3 / (if_fs / 2), 54e3 / (if_fs / 2)],
                               window="hann", pass_zero="bandpass")

    zi_i = np.zeros(taps - 1)
    zi_q = np.zeros(taps - 1)
    prev_phase = 0.0
    zi_m = np.zeros(a_taps - 1)
    zi_p = np.zeros(taps - 1)
    zi_c = np.zeros(taps - 1)
    zi_s = np.zeros(a_taps - 1)
    pll_state = pll_init_state()

    iq = (iq_u8.astype(np.float64) - 128.0) / 128.0
    left = []
    for b in range(n_blocks):
        blk = iq[b * bs:(b + 1) * bs]
        i_f, zi_i = signal.lfilter(rf_coeff, 1.0, blk[0::2], zi=zi_i)
        q_f, zi_q = signal.lfilter(rf_coeff, 1.0, blk[1::2], zi=zi_q)
        fm, prev_phase = golden_fm_demod(i_f[::rf_decim], q_f[::rf_decim],
                                         prev_phase)
        um = np.zeros(len(fm) * up)
        um[::up] = fm
        mono_f, zi_m = signal.lfilter(audio_coeff, 1.0, um, zi=zi_m)
        mono = mono_f[::down] * up

        pilot, zi_p = signal.lfilter(pilot_coeff, 1.0, fm, zi=zi_p)
        nco, _, pll_state = golden_pll(pilot, 19e3, if_fs, pll_state, 2.0)
        chan, zi_c = signal.lfilter(chan_coeff, 1.0, fm, zi=zi_c)
        mixed = 2.0 * chan * nco[: len(chan)]
        us = np.zeros(len(mixed) * up)
        us[::up] = mixed
        st_f, zi_s = signal.lfilter(audio_coeff, 1.0, us, zi=zi_s)
        stereo = st_f[::down] * up
        left.append((mono + stereo) / 2)
    return np.concatenate(left)


def test_mode1_matches_golden_chain():
    n_blocks = 2
    iq_u8 = synth_multiplex_iq(n_blocks * MODE1.block_size // 2, rf_fs=2.5e6)
    ref = golden_mode1(iq_u8, n_blocks)

    init_fn, step_fn = make_receiver(MODE1, dtype=jnp.float64)
    state = init_fn()
    step = jax.jit(step_fn)
    outs = []
    bs = MODE1.block_size
    for b in range(n_blocks):
        state, out = step(state, jnp.asarray(iq_u8[b * bs:(b + 1) * bs]))
        outs.append(np.asarray(out.left))
    ours = np.concatenate(outs)
    # skip start-of-stream unwrap-boundary warmup (see test_pipeline_audio)
    np.testing.assert_allclose(ours[500:], ref[500:], rtol=0, atol=1e-7)
