"""Per-stage timing table — apples-to-apples with the reference's report
(SURVEY.md §6: runtime/block per stage on their hardware).

Each stage is timed with slope methodology (K chained calls, one fetch; see
bench.py) on representative block-sized inputs, batched over channels.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from rtsdr_tpu.config import MODE0, ReceiverConfig
from rtsdr_tpu.ops import coeffs
from rtsdr_tpu.ops.demod import demod_init, fm_discriminator
from rtsdr_tpu.ops.fir import fir_block, fir_decimate, fir_resample, fir_zi, resample_zi
from rtsdr_tpu.ops.pll import pll, pll_init


def _slope(fn, args, k1=4, k2=14, repeats=2):
    jf = jax.jit(fn)

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = jf(*args)
        float(jnp.sum(jax.tree.leaves(o)[0][..., :1]))
        return time.perf_counter() - t0

    run(k1)
    run(k2)
    t1 = min(run(k1) for _ in range(repeats))
    t2 = min(run(k2) for _ in range(repeats))
    return (t2 - t1) / (k2 - k1)


def stage_timings(cfg: ReceiverConfig = MODE0, n_channels: int = 256,
                  pll_impl: str = "auto") -> list[dict]:
    """Time each pipeline stage on one block batch; returns records with
    seconds-per-block-batch and per-channel-block."""
    rng = np.random.default_rng(0)
    C = n_channels
    if_fs = cfg.rf.if_fs
    n_if = cfg.if_len

    iq = jnp.asarray(rng.standard_normal((C, 2, cfg.iq_len)).astype(np.float32))
    fm = jnp.asarray(rng.standard_normal((C, n_if)).astype(np.float32))
    fm2 = jnp.asarray(rng.standard_normal((C, 2, n_if)).astype(np.float32))

    rf_h = coeffs.lowpass_taps(cfg.rf.fs, cfg.rf.fc, cfg.rf.taps)
    mono_h = coeffs.lowpass_taps(if_fs * cfg.mono.up, cfg.mono.fc,
                                 cfg.mono.taps * cfg.mono.up)
    pilot_h = coeffs.bandpass_taps(if_fs, cfg.stereo.pilot_lo,
                                   cfg.stereo.pilot_hi, cfg.stereo.taps)
    r = cfg.rds
    anti_h = coeffs.lowpass_taps(if_fs * r.up, r.rrc_fs / 2, r.anti_img_taps) \
        if r else None
    rrc_h = coeffs.rrc_taps(r.rrc_fs, r.rrc_taps) if r else None

    stages = []

    def add(name, fn, args, ref_note=""):
        dt = _slope(fn, args)
        stages.append({
            "stage": name,
            "sec_per_block_batch": dt,
            "sec_per_channel_block": dt / C,
            "channels": C,
            "reference_note": ref_note,
        })

    zi2 = fir_zi(cfg.rf.taps, (C, 2), jnp.float32)
    add("rf_frontend_fir_decim", lambda x, z: fir_decimate(x, rf_h, z, cfg.rf.decim),
        (iq, zi2), "report: 9.294e-3 s/blk on RPi4")
    add("fm_discriminator",
        lambda i, q: fm_discriminator(i, q, demod_init((C,), jnp.float32)),
        (iq[:, 0, : n_if], iq[:, 1, : n_if]), "report: 9.246e-5")
    zim = resample_zi(cfg.mono.taps * cfg.mono.up, (C,), jnp.float32)
    add("mono_resample", lambda x, z: fir_resample(x, mono_h, z, cfg.mono.up,
                                                   cfg.mono.down),
        (fm, zim), "report: 5.944e-4 (mode 0)")
    zi1 = fir_zi(cfg.stereo.taps, (C,), jnp.float32)
    add("pilot_bpf", lambda x, z: fir_block(x, pilot_h, z), (fm, zi1),
        "report: 2.975e-3")
    add("pll_x2", lambda x: pll(x, pll_init((C,), jnp.float32), freq=19e3,
                                fs=if_fs, nco_scale=2.0, impl=pll_impl),
        (fm,), "report: 1.949e-3")
    add("mixer", lambda a, b: 2.0 * a * b, (fm, fm), "report: 1.018e-5")
    if r:
        ziu = resample_zi(r.anti_img_taps, (C, 2), jnp.float32)
        lpf = jnp.asarray(rng.standard_normal((C, 2, n_if)).astype(np.float32))
        add("rds_resampler_19_80",
            lambda x, z: fir_resample(x, anti_h, z, r.up, r.down),
            (lpf, ziu), "report: 5.886e-3")
        res = jnp.asarray(rng.standard_normal((C, 2, cfg.rds_len)).astype(np.float32))
        zir = fir_zi(r.rrc_taps, (C, 2), jnp.float32)
        add("rrc_filter", lambda x, z: fir_block(x, rrc_h, z), (res, zir),
            "report: 7.72e-4")
    return stages


if __name__ == "__main__":
    import json

    for rec in stage_timings():
        print(json.dumps(rec))
