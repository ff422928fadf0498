"""On-device end-to-end check: decode a synthetic RDS station on the local
accelerator (TPU) and verify the syndrome sequence + audio tone.

The CPU test suite can't cover TPU-specific numeric paths (banded-matmul
FIRs, x-domain polyphase resampler, Pallas PLL, f32 MXU frame matmul);
this script does.  Run: `python tools/tpu_e2e_check.py` (any backend).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.makedirs(cache, exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from oracles import encode_rds_blocks, rds_baseband, synth_multiplex_iq  # noqa: E402

from rtsdr_tpu.config import MODE0  # noqa: E402
from rtsdr_tpu.pipeline.receiver import make_receiver  # noqa: E402


def main() -> int:
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(42)
    bits = encode_rds_blocks(rng.integers(0, 2, (40, 16)))
    iq = synth_multiplex_iq(4 * MODE0.block_size // 2,
                            rds_wave=rds_baseband(bits))

    init_fn, step_fn = make_receiver(MODE0, dtype=jnp.float32,
                                     use_abs_clock=True)
    state = init_fn()
    step = jax.jit(step_fn)
    bs = MODE0.block_size
    syncs, audio = [], []
    for b in range(4):
        state, out = step(state, jnp.asarray(iq[b * bs:(b + 1) * bs]))
        fo = out.rds
        sid = np.asarray(fo.syndrome_id)
        ok = np.asarray(fo.is_sync)
        pos = np.asarray(fo.positions)
        from rtsdr_tpu.pipeline.frame import SYNDROME_NAMES

        syncs += [(int(pos[w]), SYNDROME_NAMES[sid[w] - 1])
                  for w in range(int(fo.n_windows)) if sid[w] and ok[w]]
        audio.append(np.asarray(out.left))

    x = np.concatenate(audio)[MODE0.audio_len:]
    t = np.arange(len(x)) / 48e3
    amp = np.hypot(2 * np.mean(x * np.sin(2 * np.pi * 1.1e3 * t)),
                   2 * np.mean(x * np.cos(2 * np.pi * 1.1e3 * t)))
    spacings = np.diff([p for p, _ in syncs])

    print("syncs:", syncs)
    print(f"mono tone amp: {amp:.4f}  (expect ~0.44)")
    assert len(syncs) >= 8, "too few syndromes"
    assert np.all(spacings % 26 == 0), f"bad spacing {spacings}"
    # cyclic A->B->C->D order (the first flagged window depends on the
    # capture's bit alignment, not on the decoder); C' is block 3 of
    # version-B groups, i.e. the C slot
    slot = {"A": 0, "B": 1, "C": 2, "C'": 2, "D": 3}
    idx = [slot[n] for _, n in syncs]
    steps = (np.diff(idx) - np.array([s // 26 for s in spacings])) % 4
    assert not np.any(steps), f"broken syndrome cycle {syncs}"
    assert abs(amp - 0.442) < 0.02
    assert not np.any(np.isnan(x))
    print("TPU end-to-end decode: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
