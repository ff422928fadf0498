"""Per-stage standalone timings at in-chain shapes (slope-timed).

Times each kernel of the full chain in isolation at the shapes the
512-channel receiver feeds it, to compare against the end-to-end chain
decomposition from profile_chain.py (differences = fusion/overlap
effects).  Run on TPU:  python tools/profile_stages.py [channels]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rtsdr_tpu.config import MODE0  # noqa: E402
from rtsdr_tpu.ops import coeffs  # noqa: E402
from rtsdr_tpu.ops.demod import fm_discriminator  # noqa: E402
from rtsdr_tpu.ops.fir import (  # noqa: E402
    fir_block,
    fir_block_multi,
    fir_decimate,
    fir_resample,
)
from rtsdr_tpu.ops.ingestfir import ingest_fir_decimate  # noqa: E402
from rtsdr_tpu.ops.pll import pll, pll_init  # noqa: E402
from rtsdr_tpu.pipeline.rds import composed_resampler_taps  # noqa: E402


def slope(fn, feed, args, n_lo=3, n_hi=13):
    """fn(*args) -> out; feed(args, out) -> new args (serializing dep)."""
    def run(k):
        a = args
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*a)
            a = feed(a, out)
        jax.tree.leaves(out)
        float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
        return time.perf_counter() - t0
    run(3); run(n_hi)
    t1 = min(run(n_lo) for _ in range(3))
    t2 = min(run(n_hi) for _ in range(3))
    return (t2 - t1) / (n_hi - n_lo)


def feed0(args, out):
    """Perturb arg0 by a 0-scaled scalar of the first output leaf."""
    leaf = jax.tree.leaves(out)[0]
    d = (leaf.ravel()[:1] * 0).astype(args[0].dtype)
    return (args[0] + d,) + tuple(args[1:])


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = MODE0
    rng = np.random.default_rng(0)
    if_len = cfg.if_len
    f32 = jnp.float32

    rf_h = coeffs.lowpass_taps(cfg.rf.fs, cfg.rf.fc, cfg.rf.taps)
    audio_h = coeffs.lowpass_taps(cfg.rf.if_fs, cfg.mono.fc, cfg.mono.taps)
    if_bank = [
        coeffs.bandpass_taps(cfg.rf.if_fs, cfg.stereo.pilot_lo,
                             cfg.stereo.pilot_hi, cfg.stereo.taps),
        coeffs.bandpass_taps(cfg.rf.if_fs, cfg.stereo.chan_lo,
                             cfg.stereo.chan_hi, cfg.stereo.taps),
        coeffs.bandpass_taps(cfg.rf.if_fs, cfg.rds.extract_lo,
                             cfg.rds.extract_hi, cfg.rds.taps),
    ]
    squared_h = coeffs.bandpass_taps(cfg.rf.if_fs, cfg.rds.squared_lo,
                                     cfg.rds.squared_hi, cfg.rds.taps)
    comb_h = composed_resampler_taps(cfg)
    rrc_h = coeffs.rrc_taps(cfg.rds.rrc_fs, cfg.rds.rrc_taps,
                            cfg.rds.rrc_beta, cfg.rds.symbol_rate)

    raw = jnp.asarray(rng.integers(0, 256, (c, cfg.block_size), np.uint8))
    fm = jnp.asarray(rng.standard_normal((c, if_len)).astype(np.float32))
    t1 = cfg.rf.taps - 1

    recs = {}

    # ingest + RF FIR
    f = jax.jit(lambda r, zi: ingest_fir_decimate(r, rf_h, zi, zi,
                                                  cfg.rf.decim)[:2])
    dt = slope(f, lambda a, o: (a[0], a[1] + (o[0].ravel()[:1] * 0)),
               (raw, jnp.zeros((c, t1), f32)))
    recs["ingest_rf_fir"] = dt

    # discriminator
    f = jax.jit(lambda i, q: fm_discriminator(i, q, (i[..., 0], q[..., 0]))[0])
    x_i = jnp.asarray(rng.standard_normal((c, if_len)).astype(np.float32))
    dt = slope(f, feed0, (x_i, x_i + 0.5))
    recs["demod"] = dt

    # mono LPF + decimate
    f = jax.jit(lambda x, zi: fir_decimate(x, audio_h, zi, cfg.mono.down)[0])
    dt = slope(f, feed0, (fm, jnp.zeros((c, cfg.mono.taps - 1), f32)))
    recs["mono_lpf_decim"] = dt

    # IF bank (pilot + chan + extract, one pass)
    f = jax.jit(lambda x, zi: fir_block_multi(x, if_bank, zi)[0])
    dt = slope(f, feed0, (fm, jnp.zeros((c, cfg.stereo.taps - 1), f32)))
    recs["if_bank_3f"] = dt

    # squared BPF (production path: square fused in-kernel when eligible)
    from rtsdr_tpu.ops.pallas_fir import fir_block_pre

    f = jax.jit(lambda x, zi: fir_block_pre(x, squared_h, zi, "square")[0])
    dt = slope(f, feed0, (fm, jnp.zeros((c, cfg.rds.taps - 1), f32)))
    recs["squared_bpf"] = dt

    # fused PLL pair (2, c)
    x2 = jnp.asarray(rng.standard_normal((2, c, if_len)).astype(np.float32))
    freqs = np.array([cfg.stereo.pll.freq, cfg.rds.pll.freq])[:, None]
    bws = np.array([cfg.stereo.pll.norm_bandwidth,
                    cfg.rds.pll.norm_bandwidth])[:, None]
    scales = np.array([cfg.stereo.pll.nco_scale,
                       cfg.rds.pll.nco_scale])[:, None]
    st0 = pll_init((2, c), f32)

    def pll_fn(x, st):
        ni, nq, st2 = pll(x, st, freq=freqs, fs=cfg.rf.if_fs,
                          nco_scale=scales, norm_bandwidth=bws, impl="auto")
        return ni, st2
    f = jax.jit(pll_fn)

    def feed_pll(a, o):
        return (a[0], o[1])
    dt = slope(f, feed_pll, (x2, st0))
    recs["pll_pair_fused"] = dt

    # stereo mixer + LPF decim (production: mixer fused in-kernel)
    from rtsdr_tpu.ops import pallas_fir

    def mix_fn(ch, nco, zi):
        if pallas_fir.eligible(ch, cfg.mono.taps, cfg.mono.down):
            ys, _ = pallas_fir.fir_bank_carried(ch, [audio_h], zi,
                                                cfg.mono.down, x2=nco,
                                                pre="mul2")
            return ys[0]
        return fir_decimate(2.0 * ch * nco, audio_h, zi, cfg.mono.down)[0]
    f = jax.jit(mix_fn)
    dt = slope(f, feed0, (fm, fm, jnp.zeros((c, cfg.mono.taps - 1), f32)))
    recs["stereo_mix_lpf"] = dt

    # RDS mixer + composed resampler (I&Q)
    mixed = jnp.asarray(
        rng.standard_normal((c, 2, if_len)).astype(np.float32))
    comb_t1 = len(comb_h) - 1
    f = jax.jit(lambda x, zi: fir_resample(x, comb_h, zi, cfg.rds.up,
                                           cfg.rds.down)[0])
    dt = slope(f, feed0, (mixed, jnp.zeros((c, 2, comb_t1), f32)))
    recs["rds_resample_comb"] = dt

    # RRC
    rds_len = if_len * cfg.rds.up // cfg.rds.down
    rrc_in = jnp.asarray(
        rng.standard_normal((c, 2, rds_len)).astype(np.float32))
    f = jax.jit(lambda x, zi: fir_block(x, rrc_h, zi)[0])
    dt = slope(f, feed0, (rrc_in, jnp.zeros((c, 2, cfg.rds.rrc_taps - 1),
                                            f32)))
    recs["rrc"] = dt

    total = sum(recs.values())
    for k, v in recs.items():
        print(json.dumps({"stage": k, "ms": round(v * 1e3, 4)}), flush=True)
    print(json.dumps({"stage": "SUM", "ms": round(total * 1e3, 4),
                      "channels": c}), flush=True)


if __name__ == "__main__":
    main()
