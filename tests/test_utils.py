"""Aux subsystems: signal generators, logging dumps, checkpoint/resume."""

import jax.numpy as jnp
import numpy as np

from rtsdr_tpu.config import MODE0
from rtsdr_tpu.pipeline.receiver import make_receiver
from rtsdr_tpu.utils.checkpoint import load_state, save_state
from rtsdr_tpu.utils.logging import log_psd, log_vector
from rtsdr_tpu.utils.signals import fm_multiplex_iq, generate_sin, mix_sin


def test_generators():
    s1 = generate_sin(48e3, 1e3, 480)
    s2 = generate_sin(48e3, 2e3, 480)
    m = mix_sin(s1, s2)
    assert m.shape == (480,)
    np.testing.assert_allclose(m, (s1 + s2) / 2)


def test_log_vector_roundtrip(tmp_path):
    y = np.linspace(0, 1, 10)
    path = log_vector("probe", y, out_dir=str(tmp_path))
    data = np.loadtxt(path)
    np.testing.assert_allclose(data[:, 1], y, atol=1e-8)
    path = log_psd("psd", generate_sin(48e3, 1e3, 2048), 512, 48e3,
                   out_dir=str(tmp_path))
    data = np.loadtxt(path)
    assert data.shape == (256, 2)


def test_stage_timings_smoke():
    """Per-stage profiler runs and returns coherent records (CPU)."""
    from rtsdr_tpu.utils.profiling import stage_timings

    recs = stage_timings(MODE0, n_channels=2, pll_impl="scan")
    names = [r["stage"] for r in recs]
    assert "rf_frontend_fir_decim" in names and "pll_x2" in names
    for r in recs:
        assert r["channels"] == 2
        assert np.isfinite(r["sec_per_block_batch"])


def test_trace_helper(tmp_path):
    import jax.numpy as _jnp

    from rtsdr_tpu.utils.trace import annotate, trace

    with trace(str(tmp_path / "t")):
        with annotate("probe"):
            _ = _jnp.sum(_jnp.ones(16)).block_until_ready()
    assert any((tmp_path / "t").rglob("*"))


def test_checkpoint_resume_bit_exact(tmp_path):
    """Stopping, checkpointing, and resuming must be invisible in outputs."""
    iq = fm_multiplex_iq(3 * MODE0.block_size // 2)
    init_fn, step_fn = make_receiver(MODE0, dtype=jnp.float32)
    bs = MODE0.block_size

    # continuous run
    state = init_fn()
    outs = []
    for b in range(3):
        state, out = step_fn(state, jnp.asarray(iq[b * bs:(b + 1) * bs]))
        outs.append(np.asarray(out.left))

    # run 1 block, checkpoint, reload into a fresh process-like state, resume
    state = init_fn()
    state, out0 = step_fn(state, jnp.asarray(iq[:bs]))
    ckpt = str(tmp_path / "state.npz")
    save_state(ckpt, state)
    resumed = load_state(ckpt, init_fn())
    outs2 = [np.asarray(out0.left)]
    state = resumed
    for b in range(1, 3):
        state, out = step_fn(state, jnp.asarray(iq[b * bs:(b + 1) * bs]))
        outs2.append(np.asarray(out.left))

    np.testing.assert_array_equal(np.concatenate(outs), np.concatenate(outs2))


def test_checkpoint_resume_sharded_bit_exact(tmp_path):
    """Round 5 (VERDICT task 6): save/restore of a SHARDED ReceiverState
    under the (ch, t) virtual mesh.  ``save_state`` gathers the
    addressable shards; ``load_state`` re-places every leaf onto the
    sharding carried by ``init_fn()``'s pytree — the resumed time-sharded
    receiver must continue bit-exactly AND its state leaves must land
    back on the mesh (not as single-device arrays)."""
    import jax
    from jax.sharding import NamedSharding

    from rtsdr_tpu.parallel.mesh import make_mesh
    from rtsdr_tpu.parallel.timeshard import make_time_sharded_receiver

    n_ch, n_blocks = 2, 3
    iq = fm_multiplex_iq(n_blocks * MODE0.block_size // 2)
    mesh = make_mesh(2, 4)
    init_fn, step_fn = make_time_sharded_receiver(MODE0, mesh, n_ch,
                                                  jnp.float32)
    bs = MODE0.block_size

    def blk(b):
        return jnp.asarray(np.stack([iq[b * bs:(b + 1) * bs]] * n_ch))

    # continuous run
    state = init_fn()
    outs = []
    for b in range(n_blocks):
        state, out = step_fn(state, blk(b))
        outs.append(np.asarray(out.left))

    # 1 block, checkpoint, restore into a fresh mesh placement, resume
    state = init_fn()
    state, out0 = step_fn(state, blk(0))
    ckpt = str(tmp_path / "sharded.npz")
    save_state(ckpt, state)
    resumed = load_state(ckpt, init_fn())
    for leaf in jax.tree.leaves(resumed):
        assert isinstance(leaf.sharding, NamedSharding), leaf.sharding
        assert leaf.sharding.mesh.shape == mesh.shape
    outs2 = [np.asarray(out0.left)]
    state = resumed
    for b in range(1, n_blocks):
        state, out = step_fn(state, blk(b))
        outs2.append(np.asarray(out.left))

    np.testing.assert_array_equal(np.concatenate(outs),
                                  np.concatenate(outs2))
