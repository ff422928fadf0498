"""Batched on-device end-to-end check: the channel-batched receiver on
TPU exercises the fused Pallas paths (ingest kernel, fused-window FIR
bank) that only engage for 2-D batches with c % 32 == 0.

Decodes 32 copies of a synthetic RDS station, asserts the syndrome
sequence cycles at spacing 26, the mono tone demodulates, and all
channels agree bitwise.  Run: python tools/tpu_batched_e2e.py
"""

import os
import sys

import numpy as np

cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.makedirs(cache, exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from oracles import encode_rds_blocks, rds_baseband, synth_multiplex_iq  # noqa: E402

from rtsdr_tpu.config import MODE0  # noqa: E402
from rtsdr_tpu.pipeline.receiver import make_receiver  # noqa: E402


def main() -> int:
    c = 32
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(42)
    bits = encode_rds_blocks(rng.integers(0, 2, (40, 16)))
    iq = synth_multiplex_iq(4 * MODE0.block_size // 2,
                            rds_wave=rds_baseband(bits))

    init_fn, step_fn = make_receiver(MODE0, (c,), dtype=jnp.float32,
                                     use_abs_clock=True)
    state = init_fn()
    step = jax.jit(step_fn)
    bs = MODE0.block_size
    syncs, audio, audio_r = [], [], []
    for b in range(4):
        blk = np.broadcast_to(iq[b * bs:(b + 1) * bs], (c, bs))
        state, out = step(state, jnp.asarray(blk))
        fo = out.rds
        sid = np.asarray(fo.syndrome_id[0])
        ok = np.asarray(fo.is_sync[0])
        pos = np.asarray(fo.positions[0])
        n_w = int(np.asarray(fo.n_windows).ravel()[0])
        syncs += [(int(pos[w]), "ABCD"[sid[w] - 1])
                  for w in range(n_w) if sid[w] and ok[w]]
        left = np.asarray(out.left)
        right = np.asarray(out.right)
        assert (left == left[:1]).all(), "channels diverge"
        audio.append(left[0])
        audio_r.append(right[0])

    x = np.concatenate(audio)[MODE0.audio_len:]
    xd = (np.concatenate(audio)
          - np.concatenate(audio_r))[MODE0.audio_len:]
    t = np.arange(len(x)) / 48e3

    def tone(sig, f):
        return np.hypot(2 * np.mean(sig * np.sin(2 * np.pi * f * t)),
                        2 * np.mean(sig * np.cos(2 * np.pi * f * t)))

    amp = tone(x, 1.1e3)
    amp_st = tone(xd, 2.3e3)
    spacings = np.diff([p for p, _ in syncs])

    print("syncs:", syncs)
    print(f"mono tone amp: {amp:.4f}  (expect ~0.44)")
    print(f"stereo L-R tone amp: {amp_st:.4f}  (expect ~0.83)")
    assert len(syncs) >= 8, "too few syndromes"
    assert (spacings == 26).all(), f"bad spacings: {spacings}"
    assert 0.40 < amp < 0.49, "mono tone amplitude off"
    assert 0.75 < amp_st < 0.92, "stereo tone amplitude off"
    print("batched TPU end-to-end decode: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
