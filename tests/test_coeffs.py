"""Coefficient generators vs scipy.signal.firwin and the golden RRC formula.

The golden models use firwin with a Hann window for every LPF/BPF
(reference model/fmMonoBlock.py:43-45,115,150,159; model/fmRDSblock.py:64-111),
so firwin is the oracle here.
"""

import numpy as np
import pytest
from scipy import signal

from rtsdr_tpu.ops.coeffs import bandpass_taps, lowpass_taps, rrc_taps


@pytest.mark.parametrize(
    "fs,fc,taps",
    [
        (2.4e6, 100e3, 151),   # RF front end
        (240e3, 16e3, 151),    # mono / stereo post-mix LPF
        (240e3, 3e3, 151),     # RDS 3 kHz LPF
        (240e3 * 19, 28.5e3, 151),  # RDS anti-image LPF
        (250e3 * 24, 16e3 * 24 / 125, 151 * 24),  # mode-1 audio resampler LPF
    ],
)
def test_lowpass_matches_firwin(fs, fc, taps):
    ours = lowpass_taps(fs, fc, taps)
    ref = signal.firwin(taps, fc / (fs / 2), window="hann")
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize(
    "fs,lo,hi,taps",
    [
        (240e3, 18.5e3, 19.5e3, 151),   # stereo pilot
        (240e3, 22e3, 54e3, 151),       # stereo channel
        (240e3, 54e3, 60e3, 151),       # RDS extraction
        (240e3, 113.5e3, 114.5e3, 151), # RDS squared carrier
    ],
)
def test_bandpass_matches_firwin(fs, lo, hi, taps):
    ours = bandpass_taps(fs, lo, hi, taps)
    ref = signal.firwin(taps, [lo / (fs / 2), hi / (fs / 2)], window="hann",
                        pass_zero="bandpass")
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-15)


def _golden_rrc(fs, n_taps):
    """Literal transcription of the RRC math from the project spec
    (reference model/fmRRC.py:12-47) as an independent oracle."""
    import math

    t_symbol = 1 / 2375.0
    beta = 0.90
    h = np.empty(n_taps)
    for k in range(n_taps):
        t = float(k - n_taps / 2) / fs
        if t == 0.0:
            h[k] = 1.0 + beta * ((4 / math.pi) - 1)
        elif t == -t_symbol / (4 * beta) or t == t_symbol / (4 * beta):
            h[k] = (beta / np.sqrt(2)) * (
                ((1 + 2 / math.pi) * (math.sin(math.pi / (4 * beta))))
                + ((1 - 2 / math.pi) * (math.cos(math.pi / (4 * beta))))
            )
        else:
            h[k] = (
                math.sin(math.pi * t * (1 - beta) / t_symbol)
                + 4 * beta * (t / t_symbol) * math.cos(math.pi * t * (1 + beta) / t_symbol)
            ) / (math.pi * t * (1 - (4 * beta * t / t_symbol) ** 2) / t_symbol)
    return h


def test_rrc_matches_golden():
    ours = rrc_taps(57e3, 151)
    ref = _golden_rrc(57e3, 151)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-15)


def test_rrc_is_peaked_at_center():
    h = rrc_taps(57e3, 151)
    assert np.argmax(h) == 75  # center at taps/2 (golden convention)
    # with 151 taps the golden center lands at t=-0.5/fs, not exactly 0,
    # so the peak is slightly below the t=0 value
    assert 1.0 < h[75] < 1.0 + 0.9 * (4 / np.pi - 1)
    # even tap count hits t=0 exactly
    h_even = rrc_taps(57e3, 150)
    assert h_even[75] == pytest.approx(1.0 + 0.9 * (4 / np.pi - 1))
