"""Pallas TPU kernel for the PLL/NCO recurrence.

The PLL is the full chain's bottleneck: a strictly sequential per-sample
loop (SURVEY.md §7 hard part #1).  Three structural observations make it
fast without changing the math:

1. **The phase detector needs no atan2.**  Its input is
   ``(x*cos(a), -x*sin(a))`` with ``a`` the previous feedback argument, so
   ``atan2(-x sin a, x cos a)`` is exactly ``wrap_pi(-a)`` for x>0,
   ``wrap_pi(pi-a)`` for x<0, and 0 for x==0 — a select plus a wrap.

2. **No transcendental is inside the loop at all.**  With (1), the
   recurrence is pure add/mul/mod; the NCO outputs
   ``cos/sin(arg*scale + adjust)`` depend on the arg *sequence* but never
   feed back, so they run afterwards as one batched pass XLA fuses.

3. **Only (integrator, phase) actually recur.**  The NCO ramp
   ``theta_j = theta0 + (j+1)*dtheta mod 4pi`` is an affine sequence —
   precomputed outside from a per-config host table (float64 products, so
   no catastrophic j*dtheta rounding).  The loop reads the raw input and
   the theta-prev stream; sign/mask/offset prep is data-parallel and sits
   OFF the sequential dependency chain, leaving a 2-row recurrence
   (with ``kq = kp + ki`` folding ``phase += kp*e + integ_new`` into
   old-integ form)::

       t     = wrap_pi(off - theta_prev - phase)
       integ += (m*ki) * t
       phase  = (phase + integ_old) + (m*kq) * t

   whose phase->phase critical path is ~6 dependent VPU ops (the loop is
   latency-bound, not issue-bound: op count barely matters, chain depth
   is time).  The per-step ``mod 4pi`` is gone — the carry wraps once per
   8-step group, and the emitted phase stream is wrapped vectorized
   outside (exact up to fp re-association: values differ from the
   per-step-wrapped ones by multiples of 4pi).  NCO arguments rebuild
   outside as ``arg_j = theta_j + phase_j``.

Layout: streams transposed to (N, C) with channels in the lane dimension;
the loop walks 8 time-steps per iteration (one aligned (8, C) load/store,
eight register-resident sub-steps); the grid walks N in VMEM-sized chunks
with Pallas double-buffering the DMA.  Numerically equivalent to
``ops.pll.pll`` (same update order, same wrapping semantics; float32).

Two measured-on-v5e variants of the phase update (Mosaic schedules them
differently at different lane counts):

* ``v3b`` (lanes <= 512): distributed form ``(pi_pre + b*z) - (2pi*b)*r``
  — chain ~5; fastest at partial-vreg lane counts (0.68 ms / 512 lanes /
  15360 steps).
* ``v3`` (lanes > 512): factored form ``pi_pre + b*t`` with vector
  constants — 0.96 ms at 1024 lanes (the receiver's fused stereo+RDS
  pair at 512 channels), vs 4.5 ms for the v2 kernel.

``dtheta`` must be uniform over contiguous lane spans (true for every
production call — single config, or the receiver's axis-0-stacked
stereo-pilot + RDS-carrier pair).  Calls with many distinct ``dtheta``
values (e.g. per-channel carrier offsets) take the legacy in-loop-theta
kernel instead.
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
_INV_TWO_PI = 1.0 / _TWO_PI
_LANES = 128
_MAX_SPANS = 32  # v2 eligibility: distinct-dtheta lane spans


def _wrap_pi(z):
    """Wrap to [-pi, pi] — branch-free, any input range."""
    return z - _TWO_PI * jnp.round(z * (1.0 / _TWO_PI))


def _kernel(x_ref, thp_ref, s_ref, ph_ref, s_out_ref, carry, *, chunk,
            kq, ki, variant):
    """2-row recurrence; sign/mask/offset prep is off the critical chain.

    carry rows: 0 integrator, 1 phase; rows 2/3 hold per-lane kq/ki when
    they vary (``kq is None``), otherwise kq/ki are compiled-in scalars.
    ``kq = kp + ki`` (the phase update in old-integ form).
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry[:] = s_ref[:]

    integ0, phase0 = carry[0, :], carry[1, :]
    if kq is None:
        kq_v, ki_v = carry[2, :], carry[3, :]
    else:
        kq_v, ki_v = kq, ki

    def body(j, c):
        integ, phase = c
        base = pl.multiple_of(j * 8, 8)
        xb = x_ref[pl.ds(base, 8), :]
        tb = thp_ref[pl.ds(base, 8), :]
        rows = []
        for r in range(8):
            # prep (independent of phase/integ — hides in latency bubbles):
            # select-free detector, s=sign(x): m zeroes e at x==0, off adds
            # pi for x<0 (jnp.where on 1-D vectors is pathological in
            # Mosaic, so arithmetic masks)
            s = jnp.sign(xb[r, :])
            m = s * s
            w = (_PI * 0.5) * (1.0 - s) - tb[r, :]
            b = m * kq_v
            a = m * ki_v
            pi_pre = phase + integ
            # critical chain: z -> (round) -> phase'
            z = w - phase
            rr = jnp.round(z * _INV_TWO_PI)
            t = z - _TWO_PI * rr
            integ = integ + a * t
            if variant == "v3":
                phase = pi_pre + b * t
            else:  # v3b: distributed — one dependent op shorter
                phase = (pi_pre + b * z) - (_TWO_PI * b) * rr
            rows.append(phase)
        phase = jnp.mod(phase, _FOUR_PI)  # wrap once per 8-step group
        ph_ref[pl.ds(base, 8), :] = jnp.stack(rows)
        return (integ, phase)

    integ, phase = jax.lax.fori_loop(0, chunk // 8, body, (integ0, phase0))

    carry[0, :] = integ
    carry[1, :] = phase

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        s_out_ref[:] = carry[:]


def _kernel_theta(x_ref, s_ref, arg_ref, s_out_ref, carry, *, chunk):
    """Legacy kernel with theta in the loop (arbitrary per-lane dtheta).

    carry rows: 0 integ, 1 phase, 2 arg (feedback trig argument), 4 theta;
    rows 5/6/7 hold the per-lane loop constants kp/ki/dtheta.
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry[:] = s_ref[:]

    c0 = (carry[0, :], carry[1, :], carry[2, :], carry[4, :])
    kp = carry[5, :]
    ki = carry[6, :]
    dtheta = carry[7, :]

    def body(j, c):
        integ, phase, arg, theta = c
        base = pl.multiple_of(j * 8, 8)
        xb = x_ref[pl.ds(base, 8), :]
        rows = []
        for r in range(8):
            xk = xb[r, :]
            # select-free detector (jnp.where on 1-D vectors is pathological
            # in Mosaic): s=sign(x); error = s^2 * wrap_pi(-arg + pi*(1-s)/2)
            s = jnp.sign(xk)
            error_d = (s * s) * _wrap_pi(-arg + (_PI * 0.5) * (1.0 - s))
            integ = integ + ki * error_d
            phase = jnp.mod(phase + kp * error_d + integ, _FOUR_PI)
            theta = jnp.mod(theta + dtheta, _FOUR_PI)
            arg = theta + phase
            rows.append(arg)
        arg_ref[pl.ds(base, 8), :] = jnp.stack(rows)
        return (integ, phase, arg, theta)

    integ, phase, arg, theta = jax.lax.fori_loop(0, chunk // 8, body, c0)

    carry[0, :] = integ
    carry[1, :] = phase
    carry[2, :] = arg
    carry[4, :] = theta

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        s_out_ref[:] = carry[:]


def _dtheta_spans(dtheta_np):
    """Contiguous lane spans of uniform dtheta: [(start, stop, value)]."""
    spans = []
    start = 0
    for i in range(1, len(dtheta_np) + 1):
        if i == len(dtheta_np) or dtheta_np[i] != dtheta_np[start]:
            spans.append((start, i, float(dtheta_np[start])))
            start = i
    return spans


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

    # VMEM budget: 2 (chunk, C) streams + phases, double-buffered.
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
    dtheta64 = np.broadcast_to(
        2.0 * np.pi * np.asarray(freq, np.float64) / fs,
        batch_shape).reshape(c_real)
    spans = _dtheta_spans(dtheta64)

    kern_args = None
    if len(spans) <= _MAX_SPANS:
        kern_args = _call_v2(xt, state, kp_np, ki_np, spans, n, c, c_real,
                             chunk, dtype, batch_shape, interpret)
    else:
        kern_args = _call_theta(xt, state, kp_np, ki_np,
                                dtheta64.astype(np_t), n, c, c_real, chunk,
                                dtype, batch_shape, interpret)
    args_t, unpack = kern_args

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

    integ_end, phase_end, arg_end, theta_end = unpack()
    new_state = PLLState(
        integrator=integ_end, phase_est=phase_end,
        fb_i=jnp.cos(arg_end), fb_q=jnp.sin(arg_end),
        nco_i=nco_i_new[..., -1], nco_q=nco_q_new[..., -1],
        theta=theta_end)

    if delay_output:
        nco_i = jnp.concatenate([state.nco_i[..., None], nco_i_new[..., :-1]],
                                axis=-1)
        nco_q = jnp.concatenate([state.nco_q[..., None], nco_q_new[..., :-1]],
                                axis=-1)
    else:
        nco_i, nco_q = nco_i_new, nco_q_new
    return nco_i, nco_q, new_state


def _call_v2(xt, state, kp_np, ki_np, spans, n, c, c_real, chunk, dtype,
             batch_shape, interpret):
    """Precomputed-theta kernel: returns ((N, C) args, unpack_state)."""
    # theta ramp per span from a float64 host table (values < 4pi, so the
    # in-graph add+mod is exact to one ulp — no j*dtheta blow-up)
    j1 = np.arange(1, n + 1, dtype=np.float64)
    theta0 = state.theta.reshape(c_real).astype(dtype)
    cols = []
    for (s0, s1, dth) in spans:
        table = jnp.asarray(np.mod(j1 * dth, 4.0 * np.pi), dtype)
        cols.append(jnp.mod(theta0[s0:s1][None, :] + table[:, None],
                            _FOUR_PI))
    theta_seq = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)
    if c != c_real:
        theta_seq = jnp.pad(theta_seq, ((0, 0), (0, c - c_real)))

    # theta-prev stream; the j=0 row folds the carried feedback argument
    # arg0 in place of theta_{-1} + phase0 (e_0 = m*wrap_pi(-arg0 + off_0))
    arg0 = jnp.arctan2(state.fb_q, state.fb_i).reshape(c_real).astype(dtype)
    phase0 = state.phase_est.reshape(c_real).astype(dtype)
    th_prev0 = arg0 - phase0
    if c != c_real:
        th_prev0 = jnp.pad(th_prev0, (0, c - c_real))
    theta_prev = jnp.concatenate([th_prev0[None, :], theta_seq[:-1, :]],
                                 axis=0)

    kq_np = kp_np + ki_np
    uniform = np.ptp(kq_np) == 0 and np.ptp(ki_np) == 0
    # measured (v5e): scalar constants + distributed update fastest at
    # partial/full-single-vreg lanes; vector constants + factored update
    # at wider fused calls (see module docstring)
    variant = "v3b" if c <= 512 else "v3"
    use_scalar = uniform and c <= 512
    kq = float(kq_np[0]) if use_scalar else None
    ki = float(ki_np[0]) if use_scalar else None

    def pad_row(a):
        r = jnp.asarray(a, dtype)
        return jnp.pad(r, (0, c - c_real)) if c != c_real else r

    integ0 = state.integrator.reshape(c_real).astype(dtype)
    rows = [pad_row(integ0), pad_row(phase0), pad_row(kq_np),
            pad_row(ki_np)]
    s_in = jnp.concatenate(
        [jnp.stack(rows), jnp.zeros((4, c), dtype)], axis=0)

    kern = partial(_kernel, chunk=chunk, kq=kq, ki=ki, variant=variant)
    phases, s_out = pl.pallas_call(
        kern,
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
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
    )(xt, theta_prev, s_in)

    # the kernel defers the per-step mod to one vectorized pass here
    # (values differ by exact multiples of 4pi from the per-step form)
    args_t = theta_seq + jnp.mod(phases, _FOUR_PI)

    def unpack():
        integ_end = s_out[0, :c_real].reshape(batch_shape)
        phase_end = s_out[1, :c_real].reshape(batch_shape)
        theta_end = theta_seq[-1, :c_real].reshape(batch_shape)
        arg_end = theta_end + phase_end
        return integ_end, phase_end, arg_end, theta_end

    return args_t, unpack


def _call_theta(xt, state, kp_np, ki_np, dtheta_np, n, c, c_real, chunk,
                dtype, batch_shape, interpret):
    """Legacy in-loop-theta kernel for arbitrary per-lane dtheta."""
    kp_v, ki_v, dtheta_v = (jnp.asarray(a, dtype)
                            for a in (kp_np, ki_np, dtheta_np))

    # row 2 carries the feedback trig argument recovered from
    # (fb_i, fb_q); any 2*pi ambiguity is harmless (wrapped detector)
    arg0 = jnp.arctan2(state.fb_q, state.fb_i)
    rows = [state.integrator.reshape(c_real),
            state.phase_est.reshape(c_real), arg0.reshape(c_real),
            jnp.zeros(c_real, dtype), state.theta.reshape(c_real),
            kp_v, ki_v, dtheta_v]
    s_in = jnp.stack([r.astype(dtype) for r in rows])
    if c != c_real:
        s_in = jnp.pad(s_in, ((0, 0), (0, c - c_real)))
    s_in = s_in.astype(dtype)

    kern = partial(_kernel_theta, chunk=chunk)
    args_t, s_out = pl.pallas_call(
        kern,
        grid=(n // chunk,),
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

    def unpack():
        def row(i):
            return s_out[i, :c_real].reshape(batch_shape)
        return row(0), row(1), row(2), row(4)

    return args_t, unpack
