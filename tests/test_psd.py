"""PSD estimator vs a numpy transcription of the golden Bartlett estimator
(model/fmSupportLib.py:66-140)."""

import math

import jax.numpy as jnp
import numpy as np

from rtsdr_tpu.ops.psd import estimate_psd


def golden_psd(samples, nfft, fs):
    freq_bins = nfft
    hann = np.array([math.sin(i * math.pi / freq_bins) ** 2
                     for i in range(freq_bins)])
    no_segments = int(math.floor(len(samples) / float(freq_bins)))
    psd_list = []
    for k in range(no_segments):
        windowed = samples[k * freq_bins:(k + 1) * freq_bins] * hann
        xf = np.fft.fft(windowed, freq_bins)[: freq_bins // 2]
        psd_seg = 2 * (1 / (fs * freq_bins / 2)) * np.abs(xf) ** 2
        psd_list.extend(10 * np.log10(psd_seg))
    psd_est = np.zeros(freq_bins // 2)
    for k in range(freq_bins // 2):
        for seg in range(no_segments):
            psd_est[k] += psd_list[k + seg * (freq_bins // 2)]
        psd_est[k] /= no_segments
    return psd_est


def test_psd_matches_golden(rng):
    fs, nfft = 240e3, 512
    t = np.arange(8 * nfft) / fs
    x = np.sin(2 * np.pi * 19e3 * t) + 0.1 * rng.standard_normal(len(t))
    ref = golden_psd(x, nfft, fs)
    freq, ours = estimate_psd(jnp.asarray(x), nfft, fs)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6, atol=1e-6)
    assert freq.shape == (nfft // 2,)
    # peak at 19 kHz
    assert abs(freq[np.argmax(np.asarray(ours))] - 19e3) < fs / nfft
