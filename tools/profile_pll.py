"""PLL kernel lane-scaling probe: ns/step vs channel count.

If time/step is flat in C, the sequential chain is latency-bound and
packing both PLL instances (stereo pilot + RDS carrier) into one kernel
halves PLL cost; if it scales ~linearly, the VPU issue rate is the floor.

Run on TPU:  python tools/profile_pll.py
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

from rtsdr_tpu.ops.pallas_pll import pll_pallas  # noqa: E402
from rtsdr_tpu.ops.pll import pll_init  # noqa: E402


def _time(step, init_state, x, n):
    def run(k):
        st = jax.tree.map(lambda v: jnp.array(v, copy=True), init_state)
        jax.block_until_ready(st)
        xi = x
        t0 = time.perf_counter()
        for _ in range(k):
            nco, st = step(xi, st)
            xi = nco  # serialize: next input depends on prior output
        float(jnp.sum(nco[..., :1]))
        return time.perf_counter() - t0

    run(3)
    run(13)
    t1 = min(run(3) for _ in range(3))
    t2 = min(run(13) for _ in range(3))
    dt = (t2 - t1) / 10
    return {"ms_per_call": round(dt * 1e3, 4),
            "ns_per_step": round(dt / n * 1e9, 2)}


def main():
    n = 15360
    rng = np.random.default_rng(0)

    # scalar-constant kernel at various lane counts
    for c in (256, 512, 1024):
        x = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))

        @jax.jit
        def step(xi, st):
            nco_i, _, st2 = pll_pallas(xi, st, freq=19e3, fs=240e3,
                                       nco_scale=2.0)
            return nco_i, st2

        rec = _time(step, pll_init((c,), jnp.float32), x, n)
        print(json.dumps({"mode": "scalar", "channels": c, **rec}),
              flush=True)

    # fused two-config call at (2, C) lanes: uniform-per-config params
    # compile to per-group scalars ("fused_groups"); per-channel varying
    # params force the vector-constant fallback ("fused_vector")
    for c in (256, 512):
        x = jnp.asarray(rng.standard_normal((2, c, n)).astype(np.float32))
        for mode, freqs in (
                ("fused_groups", np.array([19e3, 114e3])[:, None]),
                ("fused_vector",
                 np.array([19e3, 114e3])[:, None]
                 + np.linspace(0, 1, c)[None, :])):
            bws = np.array([0.01, 0.001])[:, None]
            scales = np.array([2.0, 0.5])[:, None]

            @jax.jit
            def step(xi, st):
                nco_i, _, st2 = pll_pallas(xi, st, freq=freqs, fs=240e3,
                                           nco_scale=scales,
                                           norm_bandwidth=bws)
                return nco_i, st2

            rec = _time(step, pll_init((2, c), jnp.float32), x, n)
            print(json.dumps({"mode": mode, "channels": 2 * c, **rec}),
                  flush=True)


if __name__ == "__main__":
    main()
