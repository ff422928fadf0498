"""Band scanner (pipeline/scan.py): per-channel activity metrics from one
wideband capture — beyond the reference, whose operator finds stations by
retuning the dongle and listening."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal

from oracles import encode_rds_blocks, rds_baseband, synth_multiplex_iq
from rtsdr_tpu.config import MODE0
from rtsdr_tpu.pipeline.scan import classify, make_band_scanner


def _wideband_capture(k, n_blocks, stations):
    """stations: {slot: synth kwargs} -> uint8 wideband capture."""
    bs = MODE0.block_size
    n_iq = n_blocks * bs // 2
    wide = np.zeros(n_iq * k, dtype=np.complex128)
    for slot, kw in stations.items():
        u8 = synth_multiplex_iq(n_iq, quantize=False, **kw)
        xi = u8[0::2] + 1j * u8[1::2]
        up = signal.resample_poly(xi, k, 1)
        wide += up * np.exp(2j * np.pi * slot * np.arange(len(up)) / k)
    wide /= max(1.0, np.abs(wide).max() / 0.95)
    raw = np.empty(2 * len(wide), np.float64)
    raw[0::2] = wide.real
    raw[1::2] = wide.imag
    return np.clip(np.round(raw * 128 + 128), 0, 255).astype(np.uint8)


def test_scan_classifies_band():
    k, n_blocks = 4, 3
    rng = np.random.default_rng(5)
    wave = rds_baseband(encode_rds_blocks(
        [int(w) for w in rng.integers(0, 1 << 16, 120)]))
    raw = _wideband_capture(k, n_blocks, {
        # slot 1: full station — stereo pilot + RDS, pilot detuned +300 Hz
        # (a real exciter offset; the probes use +-500 Hz / +-1.5 kHz
        # windows so detuned stations still classify)
        1: dict(rds_wave=wave, pilot_hz=19.3e3,
                rng=np.random.default_rng(7)),
        # slot 3: mono-only carrier — no pilot, no stereo, no RDS
        3: dict(pilot_amp=0.0, stereo_amp=0.0, mono_amp=0.9,
                rng=np.random.default_rng(8)),
    })

    init_fn, step_fn = make_band_scanner(MODE0, k)
    state = init_fn()
    step = jax.jit(step_fn)
    wbs = k * MODE0.block_size
    acc = []
    for b in range(n_blocks):
        m, state = step(state, jnp.asarray(raw[b * wbs:(b + 1) * wbs]))
        if b > 0:
            acc.append(jax.tree.map(np.asarray, m))
    mean = jax.tree.map(lambda *xs: np.mean(np.stack(xs), axis=0), *acc)

    verdicts = classify(mean)
    assert verdicts[1] == "station+stereo+rds", (verdicts, mean)
    assert verdicts[3] == "station", (verdicts, mean)
    assert verdicts[0] == "empty" and verdicts[2] == "empty", (verdicts, mean)

    # occupied slots carry far more power than empty ones
    assert mean.rssi_db[1] > mean.rssi_db[0] + 20
    assert mean.rssi_db[3] > mean.rssi_db[2] + 20
    # pilot/RDS probes are selective, not just "loud channel"
    assert mean.pilot_snr_db[1] > mean.pilot_snr_db[3] + 6
    assert mean.rds_snr_db[1] > mean.rds_snr_db[3] + 6
