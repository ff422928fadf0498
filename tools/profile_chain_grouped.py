"""Full-chain A/B: v4 vs v7 (grouped-lane) PLL inside the production
receiver, interleaved-min, plus the 1024-vs-2048-channel knee re-sweep
the VERDICT asked for once the PLL cheapens.

RTSDR_PLL_GROUPED is read at trace time, so each runner is built (and
warmed, forcing the trace) under its own setting before interleaving.

Run on TPU:  python tools/profile_chain_grouped.py
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

from bench import _make_runner, _metrics  # noqa: E402


def main():
    k1, k2, rounds = 4, 24, 10
    runners = {}
    for name, ch, env in (("full1024_v4", 1024, "0"),
                          ("full1024_v7", 1024, "1"),
                          ("full2048_v4", 2048, "0"),
                          ("full2048_v7", 2048, "1")):
        os.environ["RTSDR_PLL_GROUPED"] = env
        run = _make_runner(ch)
        run(k1)
        run(k2)          # trace + compile under this env
        runners[name] = (ch, run)
    t1 = {n: float("inf") for n in runners}
    t2 = {n: float("inf") for n in runners}
    for _ in range(rounds):
        for n, (ch, run) in runners.items():
            t1[n] = min(t1[n], run(k1))
            t2[n] = min(t2[n], run(k2))
    for n, (ch, run) in runners.items():
        m = _metrics(ch, max(t2[n] - t1[n], 1e-9) / (k2 - k1))
        print(json.dumps({"config": n, **{k: round(v, 2) if k != "sec_per_step"
                                          else v for k, v in m.items()}}),
              flush=True)


if __name__ == "__main__":
    main()
