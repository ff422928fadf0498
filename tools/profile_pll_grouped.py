"""v4 vs v7 (grouped-lane) PLL kernel duel — round-5 re-probe of the
Mosaic-blocked (8, C) grouping (PERF.md round-2 "v5" dead end).

Interleaved-min A/B (the only trustworthy protocol on this shared chip,
PERF.md methodology): both variants compiled in one process — the
RTSDR_PLL_GROUPED env var is read at TRACE time, so each jit closure
traces its own kernel choice — then timed alternately, min over visits.
Also asserts on-chip bitwise parity of the NCO streams and final state.

Run on TPU:  python tools/profile_pll_grouped.py
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

N = 15360


def build_pair_step(n_ch, env):
    """The production fused stereo+RDS pair: tuple input (2 parts of
    n_ch lanes), per-config loop constants -> 2*n_ch flattened lanes."""
    os.environ["RTSDR_PLL_GROUPED"] = env
    freqs = np.array([19e3, 114e3]).reshape(2, 1)
    bws = np.array([0.01, 0.001]).reshape(2, 1)
    scales = np.array([2.0, 0.5]).reshape(2, 1)

    @jax.jit
    def step(x1, x2, st):
        nco_i, nco_q, st2 = pll_pallas(
            (x1, x2), st, freq=freqs, fs=240e3, nco_scale=scales,
            norm_bandwidth=bws)
        return nco_i, nco_q, st2

    st0 = pll_init((2, n_ch), jnp.float32)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((n_ch, N)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((n_ch, N)).astype(np.float32))
    # compile now (env is trace-time)
    out = step(x1, x2, st0)
    jax.block_until_ready(out)
    return step, (x1, x2, st0), out


def timed_visit(step, args, k):
    x1, x2, st0 = args
    st = jax.tree.map(lambda v: jnp.array(v, copy=True), st0)
    jax.block_until_ready(st)
    xi = x1
    t0 = time.perf_counter()
    for _ in range(k):
        ni, nq, st = step(xi, x2, st)
        xi = ni[0]
    float(jnp.sum(ni[..., :1]))
    return time.perf_counter() - t0


def duel(n_ch, reps=8):
    a_step, a_args, a_out = build_pair_step(n_ch, "0")   # v4
    b_step, b_args, b_out = build_pair_step(n_ch, "1")   # v7

    # on-chip parity: bitwise NCO + state
    for x, y, name in ((a_out[0], b_out[0], "nco_i"),
                       (a_out[1], b_out[1], "nco_q")):
        same = bool(jnp.all(x == y))
        print(f"# parity {name} @ {n_ch}ch: "
              f"{'bitwise' if same else 'DIFF ' + str(float(jnp.max(jnp.abs(x - y))))}")
    for la, lb in zip(jax.tree.leaves(a_out[2]), jax.tree.leaves(b_out[2])):
        assert bool(jnp.all(la == lb)), "state mismatch"

    best = {"v4": 1e9, "v7": 1e9}
    for name, step, args in (("v4", a_step, a_args), ("v7", b_step, b_args)):
        timed_visit(step, args, 3)  # warm
    for _ in range(reps):
        for name, step, args in (("v4", a_step, a_args),
                                 ("v7", b_step, b_args)):
            t1 = timed_visit(step, args, 3)
            t2 = timed_visit(step, args, 13)
            best[name] = min(best[name], (t2 - t1) / 10)
    for name in ("v4", "v7"):
        print(json.dumps({"kernel": name, "pair_channels": n_ch,
                          "lanes": 2 * n_ch,
                          "ms_per_call": round(best[name] * 1e3, 4),
                          "ns_per_step": round(best[name] / N * 1e9, 2)}),
              flush=True)
    return best


def main():
    for n_ch in (1024, 2048):
        duel(n_ch)


if __name__ == "__main__":
    main()
