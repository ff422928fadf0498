"""Band scanner: one wideband capture -> per-channel station metrics.

Beyond the reference (whose operator picks a station by retuning the
dongle and listening, src/fm_radio.cpp:732-764): the PFB channelizer
splits a K-wide capture into K candidate stations, each runs only the RF
front end + FM discriminator, and Bartlett-PSD probes on the demodulated
multiplex classify activity per channel:

  * rssi_db      — mean baseband power at the channel rate (is there a
                   carrier in this slot at all?),
  * pilot_snr_db — 19 kHz pilot power over the multiplex noise floor
                   (an FM *stereo* broadcast),
  * rds_snr_db   — 57 kHz subcarrier power over the floor (RDS present).

One jitted step per wideband block; all K channels scan in one program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rtsdr_tpu.config import ReceiverConfig
from rtsdr_tpu.ops.channelizer import (
    channelizer_taps,
    channelizer_zi_u8,
    pfb_channelize_u8,
)
from rtsdr_tpu.ops.psd import estimate_psd, psd_freqs
from rtsdr_tpu.pipeline.frontend import FrontendState, frontend_init, make_frontend


class ScanState(NamedTuple):
    chan_zi: jax.Array      # channelizer carried raw-byte tail
    fe: FrontendState       # per-channel RF front-end state


class ScanMetrics(NamedTuple):
    rssi_db: jax.Array      # (..., K)
    pilot_snr_db: jax.Array
    rds_snr_db: jax.Array


def _band_bins(freqs: np.ndarray, center: float, half_width: float):
    sel = np.nonzero(np.abs(freqs - center) <= half_width)[0]
    assert sel.size > 0
    return jnp.asarray(sel)


def make_band_scanner(cfg: ReceiverConfig, n_rf_channels: int,
                      nfft: int = 1024, taps_per_branch: int = 16):
    """Build ``(init_fn, step_fn)``; ``step_fn(state, raw_u8) ->
    (ScanMetrics, state)`` over (K * cfg.block_size,) interleaved uint8
    at ``fs_w = K * cfg.rf.fs``."""
    k = n_rf_channels
    h = np.asarray(channelizer_taps(k, taps_per_branch))
    fe_fn = make_frontend(cfg, impl="iq")
    if_fs = cfg.rf.if_fs

    freqs = psd_freqs(nfft, if_fs)
    pilot_bins = _band_bins(freqs, 19e3, 500.0)
    rds_bins = _band_bins(freqs, 57e3, 1500.0)
    # noise floor: median of the FM multiplex band, away from DC
    floor_bins = _band_bins(freqs, 51.5e3, 48.5e3)

    def init_fn() -> ScanState:
        return ScanState(chan_zi=channelizer_zi_u8(k, len(h)),
                         fe=frontend_init(cfg, (k,)))

    def step_fn(state: ScanState, raw_u8: jax.Array):
        raw_iq, chan_zi = pfb_channelize_u8(raw_u8, h, state.chan_zi, k)
        i = raw_iq[..., 0, :]
        q = raw_iq[..., 1, :]
        rssi_db = 10.0 * jnp.log10(jnp.mean(i * i + q * q, axis=-1) + 1e-30)
        fm, fe = fe_fn(state.fe, raw_iq)
        _, psd = estimate_psd(fm, nfft, if_fs)          # (K, nfft//2) dB
        floor = jnp.median(psd[..., floor_bins], axis=-1)
        pilot = jnp.max(psd[..., pilot_bins], axis=-1) - floor
        rds = jnp.max(psd[..., rds_bins], axis=-1) - floor
        return (ScanMetrics(rssi_db=rssi_db, pilot_snr_db=pilot,
                            rds_snr_db=rds),
                ScanState(chan_zi=chan_zi, fe=fe))

    return init_fn, step_fn


def classify(m: "np.ndarray | ScanMetrics",
             rssi_floor_db: float = -35.0,
             snr_db: float = 8.0) -> list:
    """Human verdict per channel from (block-averaged) ScanMetrics.

    A slot is a *station* when its RSSI clears ``rssi_floor_db`` — an
    absolute threshold against normalized full scale: an empty slot of a
    uint8 capture sits at the quantization floor (~-50 dB; thermal noise
    in a real capture is somewhat higher), while any decodable carrier is
    tens of dB up.  Absolute, not relative to the quietest slot, so a
    fully-occupied band (or K=1) classifies correctly.  Pilot/RDS tags
    need ``snr_db`` over the multiplex floor.
    """
    rssi = np.asarray(m.rssi_db)
    pilot = np.asarray(m.pilot_snr_db)
    rds = np.asarray(m.rds_snr_db)
    out = []
    for c in range(rssi.shape[-1]):
        if rssi[c] < rssi_floor_db:
            out.append("empty")
            continue
        tags = ["station"]
        if pilot[c] >= snr_db:
            tags.append("stereo")
        if rds[c] >= snr_db:
            tags.append("rds")
        out.append("+".join(tags))
    return out
