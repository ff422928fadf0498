"""PFB channelizer + wideband multi-station receiver.

Channelizer oracle: the polyphase form must equal mix -> lfilter ->
decimate exactly (float64), including across chained blocks.

Wideband e2e: two FM stations synthesized into different slots of one
K=4-wide capture decode simultaneously through the standard batched
receiver — each channel recovers its own station's mono tone, an empty
slot stays silent, and the tones do not cross channels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal

from rtsdr_tpu.config import MODE0
from rtsdr_tpu.ops.channelizer import (
    channel_center_freqs,
    channelizer_taps,
    channelizer_zi,
    pfb_channelize,
)
from rtsdr_tpu.pipeline.wideband import make_wideband_receiver

from oracles import synth_multiplex_iq


def test_channelizer_matches_mix_lfilter_decimate():
    rng = np.random.default_rng(0)
    k = 8
    h = np.asarray(channelizer_taps(k, 12), np.float64)
    n = k * 400
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n))

    zi = channelizer_zi(k, len(h), dtype=jnp.complex128)
    y, zi_mid = pfb_channelize(jnp.asarray(x), h, zi, k)
    y = np.asarray(y)

    for ch in (0, 1, 3, 7):
        z = x * np.exp(-2j * np.pi * ch * np.arange(n) / k)
        ref = signal.lfilter(h, 1.0, z)[::k]
        np.testing.assert_allclose(y[:, ch], ref, atol=1e-10)

    # chained half blocks == one call (overlap state is exact)
    zi = channelizer_zi(k, len(h), dtype=jnp.complex128)
    y1, zi_a = pfb_channelize(jnp.asarray(x[:n // 2]), h, zi, k)
    y2, _ = pfb_channelize(jnp.asarray(x[n // 2:]), h, zi_a, k)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(y1), np.asarray(y2)]), y)


def _tone_amp(x, f, fs=48e3):
    t = np.arange(len(x)) / fs
    return 2 * np.hypot(np.mean(x * np.cos(2 * np.pi * f * t)),
                        np.mean(x * np.sin(2 * np.pi * f * t)))


def test_wideband_two_stations_decode():
    k = 4
    n_blocks = 2
    bs = MODE0.block_size
    n_iq = n_blocks * bs // 2          # per-station IQ samples

    # station A (slot 1): 1.1 kHz mono; station B (slot 3): 0.7 kHz mono
    stations = {1: 1.1e3, 3: 0.7e3}
    wide = np.zeros(n_iq * k, dtype=np.complex128)
    for slot, tone in stations.items():
        u8 = synth_multiplex_iq(n_iq, mono_hz=tone, quantize=False)
        xi = u8[0::2] + 1j * u8[1::2]
        up = signal.resample_poly(xi, k, 1)
        wide += up * np.exp(2j * np.pi * slot * np.arange(len(up)) / k)
    wide /= max(1.0, np.abs(wide).max() / 0.95)

    raw = np.empty(2 * len(wide), np.float64)
    raw[0::2] = wide.real
    raw[1::2] = wide.imag
    raw_u8 = np.clip(np.round(raw * 128 + 128), 0, 255).astype(np.uint8)

    init_fn, step_fn = make_wideband_receiver(
        MODE0, k, enable_rds=False, enable_stereo=True)
    state = init_fn()
    step = jax.jit(step_fn)
    wbs = k * bs
    lefts = []
    for b in range(n_blocks):
        state, out = step(state, jnp.asarray(raw_u8[b * wbs:(b + 1) * wbs]))
        lefts.append(np.asarray(out.left))
    audio = np.concatenate(lefts, axis=-1)[:, MODE0.audio_len:]  # (K, T)

    a_11 = [_tone_amp(audio[ch], 1.1e3) for ch in range(k)]
    a_07 = [_tone_amp(audio[ch], 0.7e3) for ch in range(k)]

    assert a_11[1] > 0.35, a_11          # station A decodes in slot 1
    assert a_07[3] > 0.35, a_07          # station B decodes in slot 3
    assert a_11[3] < 0.05 and a_07[1] < 0.05, (a_11, a_07)  # no crosstalk
    assert a_11[2] < 0.05 and a_07[2] < 0.05, (a_11, a_07)  # empty slot


def test_wideband_mode1():
    """--wideband composes with mode 1 (2.5 MS/s, x24/125 fractional
    audio resampler): a station in one slot of a K=4 capture at
    4 x 2.5 MS/s decodes its mono tone; a far slot stays silent.

    (K=4 with a FAR empty slot, not K=2: FM demodulation is amplitude-
    blind, so even a -40 dB channelizer leak into an adjacent slot
    demodulates to full-scale audio at degraded SNR — empty-slot
    *audio* silence only holds where quantization noise dominates the
    leak.  Occupancy questions belong to --scan's RSSI, which is
    amplitude-aware.)"""
    from rtsdr_tpu.config import MODE1

    k = 4
    n_blocks = 2
    bs = MODE1.block_size
    n_iq = n_blocks * bs // 2
    u8 = synth_multiplex_iq(n_iq, rf_fs=2.5e6, quantize=False)
    xi = u8[0::2] + 1j * u8[1::2]
    up = signal.resample_poly(xi, k, 1)
    wide = up * np.exp(2j * np.pi * 1 * np.arange(len(up)) / k)
    wide /= max(1.0, np.abs(wide).max() / 0.95)
    raw = np.empty(2 * len(wide), np.float64)
    raw[0::2] = wide.real
    raw[1::2] = wide.imag
    raw_u8 = np.clip(np.round(raw * 128 + 128), 0, 255).astype(np.uint8)

    init_fn, step_fn = make_wideband_receiver(
        MODE1, k, enable_rds=False, enable_stereo=True)
    state = init_fn()
    step = jax.jit(step_fn)
    wbs = k * bs
    lefts = []
    for b in range(n_blocks):
        state, out = step(state, jnp.asarray(raw_u8[b * wbs:(b + 1) * wbs]))
        lefts.append(np.asarray(out.left))
    audio = np.concatenate(lefts, axis=-1)[:, MODE1.audio_len:]
    a1 = _tone_amp(audio[1], 1.1e3)
    a3 = _tone_amp(audio[3], 1.1e3)
    assert a1 > 0.35, (a1, a3)
    # the far slot still demodulates a partially-coherent residual of
    # the leak (~0.06 with mode-1's single-station noise floor); assert
    # separation, not absolute silence
    assert a3 < 0.12, (a1, a3)


def test_wideband_rds_decodes_per_channel():
    """The CLI-default configuration (--wideband K runs with RDS + frame
    sync ON) end to end: an RDS station in one slot of a K=4 capture must
    deliver 26-bit-spaced syndromes AND decoded group payloads through
    the batched frame layer on channelizer output, while the empty slots
    decode nothing.  Covers the round-3 gap: every wideband test passed
    enable_rds=False, so the channelizer->squared-PLL->frame feed (with
    its different group delay and f32 rounding) had zero coverage."""
    from rtsdr_tpu.pipeline.groups import GroupDecoder

    from oracles import encode_rds_blocks, rds_baseband

    k = 4
    n_blocks = 12
    bs = MODE0.block_size
    n_iq = n_blocks * bs // 2

    # station in slot 1: PS 'WIDE RDS' via 0A groups (seg cycling),
    # TA=1 MS=1; ~0.73 groups/block
    pi, pty = 0x4D58, 5
    ps = "WIDE RDS"
    words = []
    for g in range(40 * n_blocks):
        seg = g % 4
        b = ((0 << 12) | (0 << 11) | (1 << 10) | (pty << 5)
             | (1 << 4) | (1 << 3) | seg)
        words.extend([pi, b, 0,
                      (ord(ps[2 * seg]) << 8) | ord(ps[2 * seg + 1])])
    wave = rds_baseband(encode_rds_blocks(words))
    u8 = synth_multiplex_iq(n_iq, rds_wave=wave, quantize=False)
    xi = u8[0::2] + 1j * u8[1::2]
    up = signal.resample_poly(xi, k, 1)
    wide = up * np.exp(2j * np.pi * 1 * np.arange(len(up)) / k)
    wide /= max(1.0, np.abs(wide).max() / 0.95)
    raw = np.empty(2 * len(wide), np.float64)
    raw[0::2] = wide.real
    raw[1::2] = wide.imag
    raw_u8 = np.clip(np.round(raw * 128 + 128), 0, 255).astype(np.uint8)

    # the CLI's defaults: RDS + frame + resync on, abs clock
    init_fn, step_fn = make_wideband_receiver(
        MODE0, k, use_abs_clock=True, resync=True)
    state = init_fn()
    step = jax.jit(step_fn)
    wbs = k * bs
    decs = [GroupDecoder() for _ in range(k)]
    sync_positions = [[] for _ in range(k)]
    for b in range(n_blocks):
        state, out = step(state, jnp.asarray(raw_u8[b * wbs:(b + 1) * wbs]))
        fo = out.rds
        for ch in range(k):
            fo_ch = jax.tree.map(lambda a: np.asarray(a)[ch], fo)
            decs[ch].feed(fo_ch)
            nw = int(fo_ch.n_windows)
            sync = np.asarray(fo_ch.is_sync)[:nw]
            posn = np.asarray(fo_ch.positions)[:nw]
            sync_positions[ch].extend(posn[sync].tolist())

    # slot 1: syndrome cadence (26-bit lattice, mostly consecutive)
    syncs = sync_positions[1]
    assert len(syncs) >= 20, f"too few syncs in slot 1: {len(syncs)}"
    spacings = np.diff(syncs)
    assert np.all(spacings % 26 == 0), spacings
    assert np.mean(spacings == 26) > 0.6, spacings
    # slot 1: group payloads
    dec = decs[1]
    assert len(dec.groups) >= 5, f"only {len(dec.groups)} groups"
    assert dec.pi == pi and dec.pty == pty
    assert dec.ps_name == ps
    assert dec.ta == 1 and dec.ms == 1
    # empty slots assemble nothing
    for ch in (0, 2, 3):
        assert len(decs[ch].groups) == 0, f"slot {ch} decoded phantom groups"


@pytest.mark.parametrize("off_hz", [150e3, 1e6])
def test_wideband_off_grid_station_decodes(off_hz):
    """OFF-GRID support (channel_offsets_hz): a station 150 kHz off its
    slot center — a real 100 kHz-raster frequency that the k*fs_w/K grid
    cannot hit — must decode with full stereo separation once the
    per-slot residual NCO mixes it to baseband, and must NOT decode
    without the offset (the 100 kHz RF LPF kills a 150 kHz-detuned
    station; the reference retunes the dongle instead,
    src/fm_radio.cpp:736-764).  Also checks the carried NCO phase chains
    blocks continuously (tones stay clean across the 3-block run).

    The 1 MHz point guards the NCO's float64 mod-2pi ramp reduction: an
    unreduced f32 angle reaches ~4e5 rad there (ulp 0.03 rad — ~5 kHz
    RMS instantaneous-frequency noise), wrecking stereo separation."""
    k = 4
    n_blocks = 3
    bs = MODE0.block_size
    n_iq = n_blocks * bs // 2
    fs_w = k * MODE0.rf.fs

    u8 = synth_multiplex_iq(n_iq, mono_hz=1.1e3, quantize=False)
    xi = u8[0::2] + 1j * u8[1::2]
    up = signal.resample_poly(xi, k, 1)
    f_sta = (1 * fs_w / k) + off_hz       # slot 1 center + 150 kHz
    wide = up * np.exp(2j * np.pi * f_sta * np.arange(len(up)) / fs_w)
    wide /= max(1.0, np.abs(wide).max() / 0.95)
    raw = np.empty(2 * len(wide), np.float64)
    raw[0::2] = wide.real
    raw[1::2] = wide.imag
    raw_u8 = np.clip(np.round(raw * 128 + 128), 0, 255).astype(np.uint8)

    offs = np.zeros(k)
    offs[1] = off_hz

    def run(offsets):
        init_fn, step_fn = make_wideband_receiver(
            MODE0, k, enable_rds=False, enable_stereo=True,
            channel_offsets_hz=offsets)
        state = init_fn()
        step = jax.jit(step_fn)
        wbs = k * bs
        l_all, r_all = [], []
        for b in range(n_blocks):
            state, out = step(state,
                              jnp.asarray(raw_u8[b * wbs:(b + 1) * wbs]))
            l_all.append(np.asarray(out.left))
            r_all.append(np.asarray(out.right))
        return (np.concatenate(l_all, -1)[:, MODE0.audio_len:],
                np.concatenate(r_all, -1)[:, MODE0.audio_len:])

    left, right = run(offs)
    mono_amp = _tone_amp(left[1] + right[1], 1.1e3) / 2
    assert mono_amp > 0.35, f"off-grid mono lost: {mono_amp}"
    # full stereo separation: the 2.3 kHz L-R tone survives the mix-out
    sep = _tone_amp(left[1] - right[1], 2.3e3)
    expected = 2 * np.pi * 75e3 * 0.45 / 240e3
    assert sep > 0.8 * expected, f"off-grid stereo separation: {sep}"

    if off_hz <= 200e3:
        # negative control (raster case only): without the offset the
        # 100 kHz RF LPF kills the station.  At large offsets this
        # check is meaningless — FM demod is amplitude-blind, so even
        # the LPF's deep-stopband leak demodulates to a partially-
        # coherent tone (~0.3x here) at terrible SNR.
        left0, right0 = run(None)
        assert _tone_amp(left0[1] + right0[1], 1.1e3) / 2 < 0.1 * mono_amp


def test_channel_center_freqs():
    f = channel_center_freqs(4, 9.6e6)
    np.testing.assert_allclose(f, [0.0, 2.4e6, -4.8e6, -2.4e6])


def test_cli_centers_to_offsets():
    """--wideband-centers maps real raster frequencies to nearest-slot
    residual offsets, with suffix parsing, wrap-around (the fs_w circle),
    and same-slot collisions rejected."""
    from rtsdr_tpu.cli import _centers_to_offsets, _parse_freq

    assert _parse_freq("98.1M") == 98.1e6
    assert _parse_freq("-200k") == -200e3
    assert _parse_freq("150000") == 150e3

    offs, err = _centers_to_offsets(MODE0, 4, "+2.5M,-2.3M")
    assert err is None
    np.testing.assert_allclose(offs, [0.0, 0.1e6, 0.0, 0.1e6])

    # -4.7M is nearest slot 2 (center -4.8M)
    offs, err = _centers_to_offsets(MODE0, 4, "-4.7M")
    assert err is None
    np.testing.assert_allclose(offs, [0.0, 0.0, 0.1e6, 0.0])

    # 4.9M reaches slot 2 across the fs_w wrap (9.6M circle)
    offs, err = _centers_to_offsets(MODE0, 4, "4.9M")
    assert err is None
    np.testing.assert_allclose(offs, [0.0, 0.0, 0.1e6, 0.0])

    _, err = _centers_to_offsets(MODE0, 4, "2.3M,2.5M")
    assert err is not None and "both map" in err

    _, err = _centers_to_offsets(MODE0, 4, "oops")
    assert err is not None

    # a residual beyond the decodable +/-1.1 MHz band (e.g. an absolute
    # RF frequency whose fs_w wrap lands mid-gap) -> loud error, not
    # silent noise wavs.  (The wrap of a typo CAN land in-band — 98.1M
    # mod 9.6M = 2.1M, a valid -0.3 MHz residual — so this guard is
    # necessary but not sufficient for typos.)
    _, err = _centers_to_offsets(MODE0, 4, "+1.15M")
    assert err is not None and "relative to the capture center" in err
    # the boundary itself still parses (1 MHz < 1.1 MHz limit)
    offs, err = _centers_to_offsets(MODE0, 4, "+1.0M")
    assert err is None
    np.testing.assert_allclose(offs, [1.0e6, 0.0, 0.0, 0.0])


def test_u8_channelizer_matches_complex_path(rng):
    """The raw-byte banded-matmul channelizer == normalize -> complex ->
    pfb_channelize, including the carried state across blocks."""
    import jax.numpy as jnp

    from rtsdr_tpu.ops.channelizer import (
        channelizer_taps,
        channelizer_zi,
        channelizer_zi_u8,
        pfb_channelize,
        pfb_channelize_u8,
    )

    k, c, m_out = 8, 2, 192
    h = channelizer_taps(k, 16)
    n = m_out * k

    def cplx(raw, zi):
        pairs = raw.reshape(c, -1, 2)
        iq = (pairs.astype(np.float32) - 128.0) / 128.0
        x = jnp.asarray(iq[..., 0] + 1j * iq[..., 1], jnp.complex64)
        y, zi = pfb_channelize(x, h, zi, k)
        y = jnp.moveaxis(y, -1, -2)
        return np.stack([np.real(y), np.imag(y)], axis=-2), zi

    zi_c = channelizer_zi(k, len(h), (c,), jnp.complex64)
    zi_u = channelizer_zi_u8(k, len(h), (c,))
    for _ in range(2):  # second block exercises the byte-tail carry
        raw = rng.integers(0, 256, (c, 2 * n), np.uint8)
        ref, zi_c = cplx(raw, zi_c)
        ours, zi_u = pfb_channelize_u8(jnp.asarray(raw), h, zi_u, k)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=0,
                                   atol=2e-6)


def test_composed_channelizer_matches_two_stage():
    """The composed channelizer+RF kernel == channelize (f64 oracle) ->
    lfilter(h_rf) -> [::decim] per station, including the byte-tail
    carry across blocks.  f32 tolerance: the composed path evaluates
    ONE 2656-term dot where the two-stage path rounds at the channel
    rate in between."""
    from rtsdr_tpu.ops.channelizer import (
        composed_channelize_u8,
        composed_rf_taps,
        composed_zi_u8,
    )
    from rtsdr_tpu.pipeline.frontend import rf_lpf_taps

    rng = np.random.default_rng(7)
    k, c, decim = 8, 2, 10
    m_out = 480                       # per-channel samples per block
    p_if = m_out // decim             # 48, divides 16
    h = channelizer_taps(k, 16)
    h_rf = np.asarray(rf_lpf_taps(MODE0), np.float64)
    g = composed_rf_taps(k, h, h_rf, decim)
    n = m_out * k

    blocks = [rng.integers(0, 256, (c, 2 * n), np.uint8) for _ in range(2)]

    # f64 oracle over the CONCATENATED stream: channelize, RF-filter,
    # decimate (zero history)
    full = np.concatenate(blocks, axis=-1)
    pairs = full.reshape(c, -1, 2)
    x = ((pairs[..., 0] - 128.0) + 1j * (pairs[..., 1] - 128.0)) / 128.0
    zi_c = channelizer_zi(k, len(h), (c,), jnp.complex128)
    y, _ = pfb_channelize(jnp.asarray(x), h, zi_c, k)  # (c, M, K)
    y = np.asarray(y)
    ref = np.empty((c, k, 2, 2 * p_if))
    for ci in range(c):
        for ch in range(k):
            z = signal.lfilter(h_rf, 1.0, y[ci, :, ch])[::decim]
            ref[ci, ch, 0] = z.real
            ref[ci, ch, 1] = z.imag

    zi_u = composed_zi_u8(g.shape[1], (c,))
    outs = []
    for blk in blocks:
        o, zi_u = composed_channelize_u8(jnp.asarray(blk), g, zi_u, decim)
        assert o.shape == (c, k, 2, p_if)
        outs.append(np.asarray(o))
    got = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(got, ref, rtol=0, atol=5e-5)


@pytest.mark.parametrize("off_khz", [150.0])
def test_composed_wideband_matches_pfb_path(off_khz):
    """End to end at tiny K: the composed wideband receiver (one-matmul
    front door, IF-rate residual NCO) == the two-stage path (channelize
    -> channel-rate mix -> per-station float RF FIR) on the same bytes,
    with off-grid offsets exercised on both."""
    k = 2
    bs = MODE0.block_size
    n_iq = bs // 2
    u8 = synth_multiplex_iq(n_iq, quantize=False)
    xi = u8[0::2] + 1j * u8[1::2]
    up = signal.resample_poly(xi, k, 1)
    off = off_khz * 1e3
    fs_w = k * MODE0.rf.fs
    wide = up * np.exp(2j * np.pi * (fs_w / k + off)
                       * np.arange(len(up)) / fs_w)
    wide /= max(1.0, np.abs(wide).max() / 0.95)
    raw = np.empty(2 * len(wide), np.float64)
    raw[0::2] = wide.real
    raw[1::2] = wide.imag
    raw_u8 = np.clip(np.round(raw * 128 + 128), 0, 255).astype(np.uint8)

    offsets = [0.0, off]   # the station sits off slot 1's center
    outs = {}
    for impl in ("composed", "pfb"):
        init_fn, step_fn = make_wideband_receiver(
            MODE0, k, enable_rds=False, channel_offsets_hz=offsets,
            channelizer_impl=impl)
        state = init_fn()
        state, out = jax.jit(step_fn)(state, jnp.asarray(raw_u8))
        outs[impl] = np.asarray(out.left)
    assert outs["composed"].shape == (k, MODE0.audio_len)
    # same station, same audio: f32-rounding-level agreement
    np.testing.assert_allclose(outs["composed"], outs["pfb"], atol=2e-4)
    # and the off-grid station actually decodes on the composed path
    amp = _tone_amp(outs["composed"][1][MODE0.audio_len // 2:], 1.1e3)
    assert amp > 0.15, amp


def test_wideband_channel_sharded_matches_single_device():
    """The wideband receiver decoded across a (ch=8) mesh: the channelizer
    output is sharding-constrained per station, everything downstream runs
    device-local.  The partitioned program refuses differently, so equality
    is to float32 accumulation noise (~5e-6 observed on a ~2.0 scale),
    not bitwise."""
    from rtsdr_tpu.parallel.channels import make_wideband_sharded_receiver
    from rtsdr_tpu.parallel.mesh import make_mesh

    k, n_blocks = 8, 2
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 256, n_blocks * k * MODE0.block_size,
                       dtype=np.uint8)
    kw = dict(enable_rds=False, enable_stereo=True)

    init_fn, step_fn = make_wideband_receiver(MODE0, k, **kw)
    mesh = make_mesh(8, 1)
    init_sh, step_sh = make_wideband_sharded_receiver(MODE0, mesh, k, **kw)

    state = init_fn()
    state_sh = init_sh()
    step = jax.jit(step_fn)
    wbs = k * MODE0.block_size
    for b in range(n_blocks):
        blk = jnp.asarray(raw[b * wbs:(b + 1) * wbs])
        state, out = step(state, blk)
        state_sh, out_sh = step_sh(state_sh, blk)
        np.testing.assert_allclose(np.asarray(out_sh.left),
                                   np.asarray(out.left), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_sh.right),
                                   np.asarray(out.right), atol=2e-5)


def test_wideband_composes_receiver_options():
    """The receiver options added in round 3 (pll_loop_div, stereo_blend,
    deemphasis) must compose through the wideband path's kwargs
    forwarding — compile-and-run smoke at tiny K, finite audio out."""
    k = 2
    bs = MODE0.block_size
    n_iq = bs // 2
    u8 = synth_multiplex_iq(n_iq, quantize=False)
    xi = u8[0::2] + 1j * u8[1::2]
    up = signal.resample_poly(xi, k, 1)
    wide = up * np.exp(2j * np.pi * 1 * np.arange(len(up)) / k)
    wide /= max(1.0, np.abs(wide).max() / 0.95)
    raw = np.empty(2 * len(wide), np.float64)
    raw[0::2] = wide.real
    raw[1::2] = wide.imag
    raw_u8 = np.clip(np.round(raw * 128 + 128), 0, 255).astype(np.uint8)

    init_fn, step_fn = make_wideband_receiver(
        MODE0, k, enable_rds=False, pll_loop_div=2, stereo_blend=True,
        deemphasis=75e-6)
    state = init_fn()
    state, out = jax.jit(step_fn)(state, jnp.asarray(raw_u8))
    audio = np.asarray(out.left)
    assert audio.shape == (k, MODE0.audio_len)
    assert np.all(np.isfinite(audio))
