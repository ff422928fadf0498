"""A/B probe for the fused ingest kernel's output-tile width.

At out_tile=128 the 1024-channel demod-fused ingest runs 960 grid steps
of ~1 us each — per-step fixed overhead is a large slice of the mono
chain's dominant kernel.  out_tile 256/512 quarter the step count with
the same shift-invariant banded sub-dots (outputs bitwise identical —
integer-exact s8 accumulation; verified in interpret mode).

Run on TPU:  python tools/profile_ingest.py [channels]
Interleaved-min duel (see profile_resample.py for why).
"""

from __future__ import annotations

import json
import os
import sys

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
from rtsdr_tpu.ops.ingestfir import (  # noqa: E402
    ingest_fir_decimate,
    ingest_fir_demod,
)
from profile_resample import duel  # noqa: E402  (tools/ on sys.path)


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cfg = MODE0
    rng = np.random.default_rng(0)
    rf_h = np.asarray(
        coeffs.lowpass_taps(cfg.rf.fs, cfg.rf.fc, cfg.rf.taps), np.float64)
    t1 = cfg.rf.taps - 1
    raw = jnp.asarray(rng.integers(0, 256, (c, cfg.block_size), np.uint8))
    zi = jnp.zeros((c, t1), jnp.float32)
    pi = jnp.zeros((c,), jnp.float32)
    pq = jnp.zeros((c,), jnp.float32)

    entries = []
    for ot in (128, 256, 512):
        fd = jax.jit(lambda r, z, p, q, ot=ot: ingest_fir_demod(
            r, rf_h, z, z, p, q, cfg.rf.decim, impl="pallas",
            out_tile=ot)[:3])
        entries.append((f"demod@{ot}", fd, (raw, zi, pi, pq)))
        fs = jax.jit(lambda r, z, ot=ot: ingest_fir_decimate(
            r, rf_h, z, z, cfg.rf.decim, impl="pallas", out_tile=ot)[:2])
        entries.append((f"decim@{ot}", fs, (raw, zi)))
    duel(entries, rounds=12)


if __name__ == "__main__":
    main()
