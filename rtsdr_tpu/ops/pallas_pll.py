"""Pallas TPU kernel for the PLL/NCO recurrence.

The PLL is the full chain's bottleneck: a strictly sequential per-sample
loop (SURVEY.md §7 hard part #1).  Two structural observations make it
fast without changing the math:

1. **The phase detector needs no atan2.**  Its input is
   ``(x*cos(a), -x*sin(a))`` with ``a`` the previous feedback argument, so
   ``atan2(-x sin a, x cos a)`` is exactly ``wrap_pi(-a)`` for x>0,
   ``wrap_pi(pi-a)`` for x<0, and 0 for x==0 — a select plus a wrap.

2. **No transcendental is inside the loop at all.**  With (1), the
   recurrence over (integrator, phase, arg, theta) is pure add/mul/select/
   mod; the NCO outputs ``cos/sin(arg*scale + adjust)`` depend on the arg
   *sequence* but never feed back.  The kernel therefore emits the arg
   sequence with ~12 cheap VPU ops per step, and the cos/sin run afterwards
   as one fully-vectorized batched pass that XLA fuses.

Layout: x transposed to (N, C) with channels in the lane dimension; the
loop walks 8 time-steps per iteration (one aligned (8, C) load/store, eight
register-resident sub-steps); the grid walks N in VMEM-sized chunks with
Pallas double-buffering the DMA.  Numerically equivalent to ``ops.pll.pll``
(same update order, same mod-4pi wrapping; float32).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtsdr_tpu.ops.pll import PLLState

_FOUR_PI = 4.0 * math.pi
_PI = math.pi
_TWO_PI = 2.0 * math.pi
_LANES = 128


def _wrap_pi(z):
    """Wrap to [-pi, pi] — branch-free, any input range."""
    return z - _TWO_PI * jnp.round(z * (1.0 / _TWO_PI))


def _kernel(x_ref, s_ref, arg_ref, s_out_ref, carry, *, chunk, groups):
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry[:] = s_ref[:]

    # carry rows: 0 integ, 1 phase, 2 arg (feedback trig argument), 4 theta.
    # ``groups`` is a static tuple of (lane_start, lane_stop, kp, ki,
    # dtheta): each group is a contiguous 128-aligned lane span whose loop
    # constants are compiled-in python scalars (cheapest — no extra live
    # vectors in the loop).  A single-config call is one full-width group;
    # a fused multi-config call (stereo pilot + RDS carrier as extra lanes)
    # is one group per config.  When constants genuinely vary per lane,
    # kp is None and they ride in carry rows 5/6/7 as vectors instead
    # (measurably slower at high lane counts: register pressure).
    c0 = []
    consts = []
    for (s0, s1, kp, ki, dtheta) in groups:
        c0.append((carry[0, s0:s1], carry[1, s0:s1], carry[2, s0:s1],
                   carry[4, s0:s1]))
        if kp is None:
            consts.append((carry[5, s0:s1], carry[6, s0:s1],
                           carry[7, s0:s1]))
        else:
            consts.append((kp, ki, dtheta))
    c0 = tuple(c0)

    def body(j, cs):
        base = pl.multiple_of(j * 8, 8)
        out = []
        for gi, (s0, s1, *_unused) in enumerate(groups):
            kp, ki, dtheta = consts[gi]
            integ, phase, arg, theta = cs[gi]
            xb = x_ref[pl.ds(base, 8), s0:s1]
            rows = []
            for r in range(8):
                xk = xb[r, :]
                # select-free detector (jnp.where on 1-D vectors is
                # pathological in Mosaic): s=sign(x);
                # error = s^2 * wrap_pi(-arg + pi*(1-s)/2)
                # == wrap_pi(-arg) for x>0, wrap_pi(pi-arg) for x<0,
                # 0 for x==0.
                s = jnp.sign(xk)
                error_d = (s * s) * _wrap_pi(-arg + (_PI * 0.5) * (1.0 - s))
                integ = integ + ki * error_d
                phase = jnp.mod(phase + kp * error_d + integ, _FOUR_PI)
                theta = jnp.mod(theta + dtheta, _FOUR_PI)
                arg = theta + phase
                rows.append(arg)
            arg_ref[pl.ds(base, 8), s0:s1] = jnp.stack(rows)
            out.append((integ, phase, arg, theta))
        return tuple(out)

    cs = jax.lax.fori_loop(0, chunk // 8, body, c0)

    for gi, (s0, s1, *_unused) in enumerate(groups):
        integ, phase, arg, theta = cs[gi]
        carry[0, s0:s1] = integ
        carry[1, s0:s1] = phase
        carry[2, s0:s1] = arg
        carry[4, s0:s1] = theta

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        s_out_ref[:] = carry[:]


def pll_pallas(
    x: jax.Array,
    state: PLLState,
    *,
    freq,
    fs: float,
    nco_scale=1.0,
    phase_adjust=0.0,
    norm_bandwidth=0.01,
    chunk: int = 4096,
    interpret: bool | None = None,
    delay_output: bool = True,
) -> tuple[jax.Array, jax.Array, PLLState]:
    """Drop-in replacement for ``ops.pll.pll`` (float32, TPU-compiled).

    x: (..., N); state leaves (...,).  Returns the same delayed-by-one NCO
    views and updated state.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = x.dtype
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    c_real = 1
    for d in batch_shape:
        c_real *= d
    c = max(_LANES, -(-c_real // _LANES) * _LANES)

    # VMEM budget: 2 (chunk, C) buffers, double-buffered by the pipeline.
    vmem_rows = max(8, (1024 * 1024) // (4 * c) // 8 * 8)
    chunk = min(chunk, vmem_rows)
    if n % chunk != 0 or chunk % 8 != 0:
        # largest divisor of n that is a multiple of 8 and <= requested
        chunk = next((s for s in range(min(chunk, n), 7, -1)
                      if n % s == 0 and s % 8 == 0), None)
        if chunk is None:
            raise ValueError(f"PLL block length {n} must have a divisor "
                             "that is a multiple of 8")

    xt = x.reshape(c_real, n).T  # (N, C_real)
    if c != c_real:
        xt = jnp.pad(xt, ((0, 0), (0, c - c_real)))

    cp, ci = 2.666, 3.555
    # loop constants per lane (float64 host math, then cast — matches the
    # scan implementation's rounding); scalars broadcast, arrays fuse
    # differently-configured loop instances into one kernel
    np_t = np.float32 if dtype == jnp.float32 else np.float64

    def lane_np(v):
        arr = np.broadcast_to(np.asarray(v, np_t), batch_shape)
        return np.ascontiguousarray(arr.reshape(c_real), np_t)

    nb64 = np.asarray(norm_bandwidth, np.float64)
    kp_np = lane_np(nb64 * cp)
    ki_np = lane_np(nb64 * nb64 * ci)
    dtheta_np = lane_np(2.0 * math.pi * np.asarray(freq, np.float64) / fs)
    kp_v, ki_v, dtheta_v = (jnp.asarray(a, dtype)
                            for a in (kp_np, ki_np, dtheta_np))

    def _groups():
        """Static (lane_start, lane_stop, kp, ki, dtheta) spans.

        Compiled scalar constants beat per-lane vectors in the loop, so we
        look for contiguous 128-aligned lane spans within which all three
        constants are uniform: one full-width group for a single-config
        call; one group per leading-batch entry for the receiver's fused
        stereo-pilot + RDS-carrier call (configs stacked at axis 0).
        Otherwise fall back to vector constants from carry rows 5/6/7.
        """
        # Multi-group (per-config lane spans with per-group scalars) was
        # measured SLOWER than the vector fallback on v5e — Mosaic inserts
        # relayouts for the lane-sliced sub-vectors — so only the
        # trivial full-width case compiles scalars.  Padding lanes (x==0
        # there -> zero detector error) are harmless either way.
        uniform = all(np.ptp(a) == 0 for a in (kp_np, ki_np, dtheta_np))
        if uniform:
            return ((0, c, float(kp_np[0]), float(ki_np[0]),
                     float(dtheta_np[0])),)
        return ((0, c, None, None, None),)

    groups = _groups()

    def pack(st: PLLState):
        # row 2 carries the feedback trig argument recovered from
        # (fb_i, fb_q); any 2*pi ambiguity is harmless (wrapped detector)
        arg0 = jnp.arctan2(st.fb_q, st.fb_i)
        rows = [st.integrator.reshape(c_real),
                st.phase_est.reshape(c_real), arg0.reshape(c_real),
                jnp.zeros(c_real, dtype), st.theta.reshape(c_real),
                kp_v, ki_v, dtheta_v]
        m = jnp.stack([r.astype(dtype) for r in rows])
        if c != c_real:
            m = jnp.pad(m, ((0, 0), (0, c - c_real)))
        return m.astype(dtype)

    s_in = pack(state)

    kern = partial(_kernel, chunk=chunk, groups=groups)

    grid = (n // chunk,)
    args_t, s_out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), dtype),
            jax.ShapeDtypeStruct((8, c), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((8, c), dtype)],
        interpret=interpret,
    )(xt, s_in)

    # batched NCO synthesis — the transcendentals, fully vectorized;
    # nco_scale / phase_adjust broadcast per lane like the loop constants
    args = args_t[:, :c_real].T.reshape(*batch_shape, n)
    scale_v = jnp.asarray(
        np.broadcast_to(np.asarray(nco_scale, np_t), batch_shape), dtype)
    adjust_v = jnp.asarray(
        np.broadcast_to(np.asarray(phase_adjust, np_t), batch_shape), dtype)
    nco_arg = args * scale_v[..., None] + adjust_v[..., None]
    nco_i_new = jnp.cos(nco_arg)
    nco_q_new = jnp.sin(nco_arg)

    def unpack_row(i):
        return s_out[i, :c_real].reshape(batch_shape)

    arg_end = unpack_row(2)
    new_state = PLLState(
        integrator=unpack_row(0), phase_est=unpack_row(1),
        fb_i=jnp.cos(arg_end), fb_q=jnp.sin(arg_end),
        nco_i=nco_i_new[..., -1], nco_q=nco_q_new[..., -1],
        theta=unpack_row(4))

    if delay_output:
        nco_i = jnp.concatenate([state.nco_i[..., None], nco_i_new[..., :-1]],
                                axis=-1)
        nco_q = jnp.concatenate([state.nco_q[..., None], nco_q_new[..., :-1]],
                                axis=-1)
    else:
        nco_i, nco_q = nco_i_new, nco_q_new
    return nco_i, nco_q, new_state
