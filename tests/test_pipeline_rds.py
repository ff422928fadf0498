"""RDS DSP chain + bit layer vs golden oracles, and end-to-end decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtsdr_tpu.config import MODE0
from rtsdr_tpu.pipeline.frame import frame_init, frame_sizes, make_frame
from rtsdr_tpu.pipeline.rds import make_rds, rds_init
from rtsdr_tpu.pipeline.receiver import make_receiver

from oracles import (
    GoldenFrameDecoder,
    encode_rds_blocks,
    golden_mono_stereo,
    golden_rds_dsp,
    rds_baseband,
    synth_multiplex_iq,
)


def _rds_multiplex(n_blocks, rng, n_info_words=40):
    info = rng.integers(0, 2, size=(n_info_words, 16))
    bits = encode_rds_blocks(info)
    wave = rds_baseband(bits)
    iq_u8 = synth_multiplex_iq(n_blocks * 307200 // 2, rds_wave=wave)
    return iq_u8, bits


@pytest.fixture(scope="module")
def rds_setup():
    rng = np.random.default_rng(0x5757)
    n_blocks = 4
    iq_u8, bits = _rds_multiplex(n_blocks, rng)
    # golden front end -> fm blocks
    ref_audio = golden_mono_stereo(iq_u8, n_blocks)
    fm = ref_audio["fm"]
    fm_blocks = [fm[b * 15360:(b + 1) * 15360] for b in range(n_blocks)]
    rrc_ref = golden_rds_dsp(fm_blocks)
    return iq_u8, bits, fm_blocks, rrc_ref, n_blocks


def test_rds_dsp_matches_golden_chain(rds_setup):
    _, _, fm_blocks, rrc_ref, n_blocks = rds_setup
    rds_fn = make_rds(MODE0)
    state = rds_init(MODE0, dtype=jnp.float64)
    rds = jax.jit(rds_fn)
    for b in range(n_blocks):
        (rrc_i, rrc_q), state = rds(state, jnp.asarray(fm_blocks[b]))
        ref_i, ref_q = rrc_ref[b]
        # skip stream warmup on block 0 (see test_pipeline_audio)
        lo = 600 if b == 0 else 0
        np.testing.assert_allclose(np.asarray(rrc_i)[lo:], ref_i[lo:],
                                   atol=2e-7, err_msg=f"block {b} I")
        np.testing.assert_allclose(np.asarray(rrc_q)[lo:], ref_q[lo:],
                                   atol=2e-7, err_msg=f"block {b} Q")


@pytest.mark.parametrize("offset_mode", ["track", "hold"])
def test_frame_layer_matches_golden(rds_setup, offset_mode):
    """Feed identical RRC blocks to the golden bit-layer decoder and to the
    jitted fixed-shape one; symbol streams and syndrome events must agree."""
    _, _, _, rrc_ref, n_blocks = rds_setup

    golden = GoldenFrameDecoder(offset_mode=offset_mode)
    frame_fn = jax.jit(make_frame(MODE0, offset_mode=offset_mode))
    state = frame_init(MODE0, dtype=jnp.float64)

    names = {1: "A", 2: "B", 3: "C", 4: "D", 5: "C'"}
    for b in range(n_blocks):
        ri, rq = rrc_ref[b]
        ref_symbols, ref_events = golden.step(ri, rq)
        out, state = frame_fn(state, jnp.asarray(ri), jnp.asarray(rq))

        n_sym = int(out.n_sym)
        assert n_sym == len(ref_symbols), f"block {b} symbol count"
        np.testing.assert_allclose(np.asarray(out.symbols_i)[:n_sym],
                                   ref_symbols, atol=0,
                                   err_msg=f"block {b} symbols")

        n_w = int(out.n_windows)
        ours_events = []
        for w in range(n_w):
            sid = int(out.syndrome_id[w])
            if sid:
                ours_events.append((names[sid], int(out.positions[w]),
                                    bool(out.is_sync[w])))
        assert ours_events == ref_events, f"block {b} events"


def test_end_to_end_rds_decode(rds_setup):
    """Full receiver on a synthetic RDS multiplex: after carrier-lock
    warmup, frame sync must find a run of 26-bit-spaced syndromes."""
    iq_u8, _, _, _, n_blocks = rds_setup
    init_fn, step_fn = make_receiver(MODE0, dtype=jnp.float64,
                                     offset_mode="hold", use_abs_clock=True)
    state = init_fn()
    step = jax.jit(step_fn)
    bs = MODE0.block_size

    # block 0: PLL/clock warmup; then reset the frame layer so its block-0
    # clock/phase screening sees locked signal
    state, _ = step(state, jnp.asarray(iq_u8[:bs]))
    state = state._replace(frame=frame_init(MODE0, dtype=jnp.float64))

    syncs = []
    for b in range(1, n_blocks):
        state, out = step(state, jnp.asarray(iq_u8[b * bs:(b + 1) * bs]))
        fo = out.rds
        n_w = int(fo.n_windows)
        for w in range(n_w):
            if int(fo.syndrome_id[w]) and bool(fo.is_sync[w]):
                syncs.append(int(fo.positions[w]))

    assert len(syncs) >= 5, f"too few syncs: {syncs}"
    spacings = np.diff(syncs)
    assert np.all(spacings % 26 == 0), f"bad spacing: {spacings}"
    # mostly consecutive blocks
    assert np.mean(spacings == 26) > 0.6, f"sparse syncs: {spacings}"


def test_frame_sizes():
    s_max, b_max, e_max, w_max = frame_sizes(MODE0)
    assert s_max == MODE0.rds_len // 24 == 152
    assert b_max == 76 and e_max == 103 and w_max == 77
