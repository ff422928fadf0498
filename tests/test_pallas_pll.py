"""Pallas PLL kernel vs the lax.scan reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtsdr_tpu.ops.pll import pll, pll_init
from rtsdr_tpu.ops.pallas_pll import pll_pallas


_FOUR_PI = 4 * np.pi


def _assert_state_close(our_st, ref_st, atol):
    """Per-leaf state comparison.

    phase_est and theta are angles mod 4pi — compared circularly (the
    kernel's float64-table theta ramp can wrap one step before/after the
    scan's sequentially-rounded one).  The tolerance covers the scan's own
    sequential f32 rounding bias (~2.4e-7 * n), which the kernel does not
    replicate; the loop feedback keeps the NCO outputs far tighter.
    """
    names = type(ref_st)._fields
    for name, a, b in zip(names, our_st, ref_st):
        a, b = np.asarray(a), np.asarray(b)
        if name in ("phase_est", "theta"):
            d = np.abs(a - b) % _FOUR_PI
            d = np.minimum(d, _FOUR_PI - d)
            np.testing.assert_allclose(d, 0.0, atol=atol, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, atol=atol, err_msg=name)


def _pilot(n, c=None, fs=240e3, f=19e3):
    t = np.arange(n) / fs
    x = np.cos(2 * np.pi * f * t + 0.4)
    if c is None:
        return x
    return np.stack([np.cos(2 * np.pi * f * t + 0.1 * k) for k in range(c)])


@pytest.mark.parametrize("batch", [(), (3,), (130,)])
def test_pallas_matches_scan(batch):
    n = 1920
    c = int(np.prod(batch)) if batch else None
    x = jnp.asarray(_pilot(n, c), jnp.float32)

    st0 = pll_init(batch, jnp.float32)
    ref_i, ref_q, ref_st = pll(x, st0, freq=19e3, fs=240e3, nco_scale=2.0)
    our_i, our_q, our_st = pll_pallas(x, pll_init(batch, jnp.float32),
                                      freq=19e3, fs=240e3, nco_scale=2.0,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(our_i), np.asarray(ref_i),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(our_q), np.asarray(ref_q),
                               atol=5e-5)
    _assert_state_close(our_st, ref_st, atol=1e-3)


def test_pallas_chunking_and_state_chain():
    """Multi-chunk grid + block chaining must equal one serial scan."""
    n = 1920 * 4
    x = jnp.asarray(_pilot(n), jnp.float32)
    ref_i, _, ref_st = pll(x, pll_init((), jnp.float32), freq=19e3, fs=240e3,
                           nco_scale=2.0)

    st = pll_init((), jnp.float32)
    outs = []
    for b in range(4):
        xi = x[b * 1920:(b + 1) * 1920]
        oi, _, st = pll_pallas(xi, st, freq=19e3, fs=240e3, nco_scale=2.0,
                               chunk=960, interpret=True)
        outs.append(np.asarray(oi))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(ref_i),
                               atol=5e-5)


def test_fused_wide_batch_matches_scan():
    """(2, 128) lanes with per-config-uniform params — the receiver's
    fused stereo-pilot + RDS-carrier layout — must match scan."""
    import math

    n = 1920
    c = 128
    t = np.arange(n) / 240e3
    rows = [np.cos(2 * np.pi * 19e3 * t + 0.1 * k) for k in range(c)]
    rows += [np.cos(2 * np.pi * 114e3 * t + 0.1 * k) for k in range(c)]
    x = jnp.asarray(np.stack(rows).reshape(2, c, n), jnp.float32)

    shape = (2, 1)
    freqs = np.array([19e3, 114e3]).reshape(shape)
    bws = np.array([0.01, 0.001]).reshape(shape)
    scales = np.array([2.0, 0.5]).reshape(shape)
    adjusts = np.array([0.0, math.pi / 3.3 - math.pi / 1.5]).reshape(shape)

    ref_i, ref_q, ref_st = pll(
        x, pll_init((2, c), jnp.float32), freq=freqs, fs=240e3,
        nco_scale=scales, phase_adjust=adjusts, norm_bandwidth=bws)
    our_i, our_q, our_st = pll_pallas(
        x, pll_init((2, c), jnp.float32), freq=freqs, fs=240e3,
        nco_scale=scales, phase_adjust=adjusts, norm_bandwidth=bws,
        interpret=True)
    np.testing.assert_allclose(np.asarray(our_i), np.asarray(ref_i),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(our_q), np.asarray(ref_q),
                               atol=5e-5)
    _assert_state_close(our_st, ref_st, atol=1e-3)


def test_fused_two_config_matches_separate():
    """One call with per-lane loop constants (stereo pilot + RDS carrier
    fused as batch rows) must equal two separately-configured calls —
    scan and pallas paths."""
    import math

    from rtsdr_tpu.ops.pll import pll

    n = 1920
    t = np.arange(n) / 240e3
    x_pilot = np.cos(2 * np.pi * 19e3 * t + 0.4).astype(np.float32)
    x_rds = np.cos(2 * np.pi * 114e3 * t + 1.1).astype(np.float32)
    x2 = jnp.asarray(np.stack([x_pilot, x_rds]))

    freqs = np.array([19e3, 114e3])
    bws = np.array([0.01, 0.001])
    scales = np.array([2.0, 0.5])
    adjusts = np.array([0.0, math.pi / 3.3 - math.pi / 1.5])

    for impl_kwargs in ({"impl": "scan"}, {"impl": "pallas"}):
        fused_i, fused_q, fused_st = pll(
            x2, pll_init((2,), jnp.float32), freq=freqs, fs=240e3,
            nco_scale=scales, phase_adjust=adjusts, norm_bandwidth=bws,
            **impl_kwargs)
        for r in range(2):
            ref_i, ref_q, ref_st = pll(
                x2[r], pll_init((), jnp.float32), freq=float(freqs[r]),
                fs=240e3, nco_scale=float(scales[r]),
                phase_adjust=float(adjusts[r]),
                norm_bandwidth=float(bws[r]), **impl_kwargs)
            np.testing.assert_allclose(np.asarray(fused_i[r]),
                                       np.asarray(ref_i), atol=1e-6,
                                       err_msg=f"{impl_kwargs} row {r}")
            for a, b in zip(jax.tree.leaves(jax.tree.map(lambda v: v[r], fused_st)),
                            jax.tree.leaves(ref_st)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-6)


def test_v4_chunk_lane_alignment():
    """v4 block lane dims must be 128-multiples (mode-1 if_len=16000
    once picked 400 and failed Mosaic lowering); the selector must only
    return 128-multiple divisors, or None to trigger the fallback."""
    from rtsdr_tpu.ops.pallas_pll import _v4_chunk

    for n in (15360, 16000, 1920, 3840):
        ch = _v4_chunk(n, 512)
        assert ch is not None and n % ch == 0 and ch % 128 == 0, (n, ch)
    assert _v4_chunk(1000, 512) is None  # no 128-multiple divisor


def test_pallas_mode1_length():
    """Mode-1 if_len (16000, not divisible by 512) through the kernel."""
    n = 16000
    x = jnp.asarray(_pilot(n), jnp.float32)
    ref_i, _, ref_st = pll(x, pll_init((), jnp.float32), freq=19e3,
                           fs=250e3, nco_scale=2.0)
    our_i, _, our_st = pll_pallas(x, pll_init((), jnp.float32), freq=19e3,
                                  fs=250e3, nco_scale=2.0, interpret=True)
    np.testing.assert_allclose(np.asarray(our_i), np.asarray(ref_i),
                               atol=5e-5)
    # scan's own sequential f32 rounding bias scales with n (~2.4e-7*n)
    _assert_state_close(our_st, ref_st, atol=4e-7 * n)


def test_tuple_input_matches_stacked():
    """pll(x=(a, b)) == pll(jnp.stack([a, b])): the tuple form feeds the
    v4 kernel's in-VMEM transpose directly (no stacked HBM copy), and
    must be exactly the stacked call on both impls."""
    import math

    n, c = 1920, 4
    t = np.arange(n) / 240e3
    a = np.stack([np.cos(2 * np.pi * 19e3 * t + 0.1 * k)
                  for k in range(c)]).astype(np.float32)
    b = np.stack([np.cos(2 * np.pi * 114e3 * t + 0.2 * k)
                  for k in range(c)]).astype(np.float32)
    x2 = jnp.asarray(np.stack([a, b]))
    pair = (jnp.asarray(a), jnp.asarray(b))

    freqs = np.array([19e3, 114e3]).reshape(2, 1)
    bws = np.array([0.01, 0.001]).reshape(2, 1)
    scales = np.array([2.0, 0.5]).reshape(2, 1)
    adjusts = np.array([0.0, math.pi / 3.3 - math.pi / 1.5]).reshape(2, 1)
    kw = dict(freq=freqs, fs=240e3, nco_scale=scales, phase_adjust=adjusts,
              norm_bandwidth=bws)

    for impl in ("scan", "pallas"):
        ref_i, ref_q, ref_st = pll(x2, pll_init((2, c), jnp.float32),
                                   impl=impl, **kw)
        tup_i, tup_q, tup_st = pll(pair, pll_init((2, c), jnp.float32),
                                   impl=impl, **kw)
        np.testing.assert_array_equal(np.asarray(tup_i), np.asarray(ref_i),
                                      err_msg=impl)
        np.testing.assert_array_equal(np.asarray(tup_q), np.asarray(ref_q))
        for x, y in zip(jax.tree.leaves(tup_st), jax.tree.leaves(ref_st)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_tuple_multiref_kernel_path():
    """128-row parts keep their lane offsets 128-aligned, so the v4
    kernel's per-part block specs + in-VMEM lane-offset transpose run
    (the production receiver's two 512-row refs take this path); must
    equal the stacked call exactly."""
    import math

    n, c = 1920, 128  # c % 128 == 0 -> multi-ref path (no concat)
    t = np.arange(n) / 240e3
    a = np.stack([np.cos(2 * np.pi * 19e3 * t + 0.01 * k)
                  for k in range(c)]).astype(np.float32)
    b = np.stack([np.cos(2 * np.pi * 114e3 * t + 0.02 * k)
                  for k in range(c)]).astype(np.float32)
    kw = dict(freq=np.array([19e3, 114e3]).reshape(2, 1), fs=240e3,
              nco_scale=np.array([2.0, 0.5]).reshape(2, 1),
              phase_adjust=np.array(
                  [0.0, math.pi / 3.3 - math.pi / 1.5]).reshape(2, 1),
              norm_bandwidth=np.array([0.01, 0.001]).reshape(2, 1))
    ref = pll_pallas(jnp.asarray(np.stack([a, b])),
                     pll_init((2, c), jnp.float32), **kw)
    tup = pll_pallas((jnp.asarray(a), jnp.asarray(b)),
                     pll_init((2, c), jnp.float32), **kw)
    np.testing.assert_array_equal(np.asarray(tup[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(tup[1]), np.asarray(ref[1]))
    for x, y in zip(jax.tree.leaves(tup[2]), jax.tree.leaves(ref[2])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_tuple_shape_mismatch_raises():
    a = jnp.zeros((4, 1920), jnp.float32)
    b = jnp.zeros((8, 1920), jnp.float32)
    with pytest.raises(ValueError, match="equal shapes"):
        pll_pallas((a, b), pll_init((2, 4), jnp.float32),
                   freq=19e3, fs=240e3)


@pytest.mark.parametrize("div", [2, 4])
def test_loop_div_pallas_matches_scan(div):
    """loop_div: recurrence every div-th sample, full-rate NCO out — the
    kernel and the grouped scan must agree (same math, different
    engines), including the carried state across a block boundary."""
    n = 3840
    x = jnp.asarray(_pilot(n), jnp.float32)
    kw = dict(freq=19e3, fs=240e3, nco_scale=2.0, loop_div=div)
    ref_i, ref_q, ref_st = pll(x, pll_init((), jnp.float32),
                               impl="scan", **kw)
    our_i, our_q, our_st = pll_pallas(x, pll_init((), jnp.float32),
                                      interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(our_i), np.asarray(ref_i),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(our_q), np.asarray(ref_q),
                               atol=5e-5)
    _assert_state_close(our_st, ref_st, atol=1e-3)

    # block chaining: two half-blocks == one run
    st = pll_init((), jnp.float32)
    outs = []
    for b in range(2):
        oi, _, st = pll_pallas(x[b * 1920:(b + 1) * 1920], st,
                               interpret=True, **kw)
        outs.append(np.asarray(oi))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(our_i),
                               atol=5e-5)


@pytest.mark.parametrize("div", [1, 2, 4])
def test_loop_div_locks_on_detuned_pilot(div):
    """With bandwidth-preserving gains the divided loop acquires a
    detuned pilot (+80 Hz) just like the full-rate loop: the steady-state
    NCO is a clean carrier at exactly 2x the input frequency (coherence
    |mean(nco * e^{-j2w t})| -> 0.5 for a locked cos with small phase
    ripple)."""
    n = 15360
    fs = 240e3
    f_in = 19e3 + 80.0
    t = np.arange(n) / fs
    x = jnp.asarray(np.cos(2 * np.pi * f_in * t + 0.7), jnp.float32)
    nco_i, _, _ = pll(x, pll_init((), jnp.float32), freq=19e3, fs=fs,
                      nco_scale=2.0, impl="scan", loop_div=div)
    a = np.asarray(nco_i)[-n // 4:]
    # the pll output is delayed by one sample: NCO sample k sits at t[k-1]
    tt = t[-n // 4 - 1:-1]
    c = np.mean(a * np.exp(-2j * np.pi * (2 * f_in) * tt))
    assert np.abs(c) > 0.47, (
        f"div={div}: lock coherence {np.abs(c):.3f} (0.5 = perfect)")


@pytest.mark.parametrize("div", [1, 2])
def test_wide_kernel_matches_scan(div, monkeypatch):
    """The wide-lane v6 kernel (2-D prep/trig passes around a minimal
    loop) must match the scan reference and chain across blocks, like
    v4 — forced on via RTSDR_PLL_WIDE regardless of lane count."""
    monkeypatch.setenv("RTSDR_PLL_WIDE", "1")
    n = 3840
    x = jnp.asarray(_pilot(n), jnp.float32)
    kw = dict(freq=19e3, fs=240e3, nco_scale=2.0, loop_div=div)
    ref_i, ref_q, ref_st = pll(x, pll_init((), jnp.float32),
                               impl="scan", **kw)
    our_i, our_q, our_st = pll_pallas(x, pll_init((), jnp.float32),
                                      interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(our_i), np.asarray(ref_i),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(our_q), np.asarray(ref_q),
                               atol=5e-5)
    _assert_state_close(our_st, ref_st, atol=1e-3)

    st = pll_init((), jnp.float32)
    outs = []
    for b in range(2):
        oi, _, st = pll_pallas(x[b * 1920:(b + 1) * 1920], st,
                               interpret=True, **kw)
        outs.append(np.asarray(oi))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(our_i),
                               atol=5e-5)


def test_wide_kernel_fused_pair_matches_v4(monkeypatch):
    """v6 vs v4 on the production fused stereo+RDS pair layout."""
    import math

    n, c = 1920, 128
    t = np.arange(n) / 240e3
    a = np.stack([np.cos(2 * np.pi * 19e3 * t + 0.01 * k)
                  for k in range(c)]).astype(np.float32)
    b = np.stack([np.cos(2 * np.pi * 114e3 * t + 0.02 * k)
                  for k in range(c)]).astype(np.float32)
    kw = dict(freq=np.array([19e3, 114e3]).reshape(2, 1), fs=240e3,
              nco_scale=np.array([2.0, 0.5]).reshape(2, 1),
              phase_adjust=np.array(
                  [0.0, math.pi / 3.3 - math.pi / 1.5]).reshape(2, 1),
              norm_bandwidth=np.array([0.01, 0.001]).reshape(2, 1),
              interpret=True)
    monkeypatch.setenv("RTSDR_PLL_WIDE", "0")
    ref = pll_pallas((jnp.asarray(a), jnp.asarray(b)),
                     pll_init((2, c), jnp.float32), **kw)
    monkeypatch.setenv("RTSDR_PLL_WIDE", "1")
    wide = pll_pallas((jnp.asarray(a), jnp.asarray(b)),
                      pll_init((2, c), jnp.float32), **kw)
    np.testing.assert_allclose(np.asarray(wide[0]), np.asarray(ref[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(wide[1]), np.asarray(ref[1]),
                               atol=1e-6)
    for x_, y_ in zip(jax.tree.leaves(wide[2]), jax.tree.leaves(ref[2])):
        np.testing.assert_allclose(np.asarray(x_), np.asarray(y_),
                                   atol=1e-6)


def test_lane_slab_split_matches_scan(monkeypatch):
    """Batches past _MAX_LANES_PER_CALL lane-slab into sequential kernel
    calls; forced small here so a (2, 130) batch needs 3 slabs with a
    ragged tail — must match the scan reference, per-lane params
    sliced correctly."""
    import math

    import rtsdr_tpu.ops.pallas_pll as pp

    monkeypatch.setattr(pp, "_MAX_LANES_PER_CALL", 128)
    n, c = 1920, 130
    t = np.arange(n) / 240e3
    a = np.stack([np.cos(2 * np.pi * 19e3 * t + 0.01 * k)
                  for k in range(c)]).astype(np.float32)
    b = np.stack([np.cos(2 * np.pi * 114e3 * t + 0.02 * k)
                  for k in range(c)]).astype(np.float32)
    x = jnp.asarray(np.stack([a, b]))
    kw = dict(freq=np.array([19e3, 114e3]).reshape(2, 1), fs=240e3,
              nco_scale=np.array([2.0, 0.5]).reshape(2, 1),
              phase_adjust=np.array(
                  [0.0, math.pi / 3.3 - math.pi / 1.5]).reshape(2, 1),
              norm_bandwidth=np.array([0.01, 0.001]).reshape(2, 1))
    ref_i, ref_q, ref_st = pll(x, pll_init((2, c), jnp.float32),
                               impl="scan", **kw)
    our_i, our_q, our_st = pp.pll_pallas(x, pll_init((2, c), jnp.float32),
                                         interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(our_i), np.asarray(ref_i),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(our_q), np.asarray(ref_q),
                               atol=5e-5)
    _assert_state_close(our_st, ref_st, atol=1e-3)
