"""Pallas TPU kernel for the PLL/NCO recurrence.

The PLL is the full chain's bottleneck: a strictly sequential per-sample
loop (SURVEY.md §7 hard part #1).  Three structural observations make it
fast without changing the math:

1. **The phase detector needs no atan2.**  Its input is
   ``(x*cos(a), -x*sin(a))`` with ``a`` the previous feedback argument, so
   ``atan2(-x sin a, x cos a)`` is exactly ``wrap_pi(-a)`` for x>0,
   ``wrap_pi(pi-a)`` for x<0, and 0 for x==0 — a select plus a wrap.

2. **Only (integrator, phase) actually recur.**  Sign/mask/offset prep,
   the NCO ramp theta, and the cos/sin synthesis are all data-parallel
   and sit OFF the sequential dependency chain — and because the loop is
   latency-bound, not issue-bound (time = chain depth x op latency, with
   most VPU issue slots idle), that off-chain work is nearly free: it
   hides in the bubbles.  The 2-row recurrence (``kq = kp + ki`` folds
   ``phase += kp*e + integ_new`` into old-integ form)::

       t     = wrap_pi(off - theta_prev - phase)
       integ += (m*ki) * t
       phase  = (phase + integ_old) + (m*kq) * t

   has a phase->phase critical path of ~6 dependent VPU ops.  The
   per-step ``mod 4pi`` is deferred: the carry wraps once per 8-step
   group (values differ from the per-step-wrapped ones by exact
   multiples of 4pi).

3. **The whole stage lives in one kernel (v4).**  The v3 kernel emitted
   a phase stream and left the NCO synthesis, theta streams, delay
   concatenates and (N, C) layout transposes to XLA — ~1 ms/step of HBM
   round-trips around a ~1 ms loop at 512 channels (seen in optimized
   HLO).  v4 does everything in-kernel: inputs arrive channel-major and
   transpose in VMEM, theta_prev rebuilds from a per-8-step-group
   float64 host table (``P_g + r*dtheta``, r < 8 — exact product, one
   wrap; no (N, C) theta stream), cos/sin run per 8-row group inside the
   loop body (bitwise-identical lowering to XLA's, verified), the
   delayed-by-one output view is a carried row, and the NCO streams
   transpose back on write-out.  HBM traffic is x in + two NCO streams
   out — nothing else.  Measured (v5e, same-process A/B, fused
   stereo+RDS pair at 512 channels): full stage 3.90 -> 1.08 ms.

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
_MAX_SPANS = 32  # v4 eligibility: distinct-dtheta lane spans
# beyond this many flattened lanes one kernel invocation exceeds VMEM
# (3+ (chunk, C) scratch planes at chunk>=128); larger batches are
# lane-slabbed into sequential calls — the loop is issue-bound past
# ~1024 lanes (total vector ops scale with C), so serial slabs cost
# what one giant call would
_MAX_LANES_PER_CALL = 2048


def _wrap_pi(z):
    """Wrap to [-pi, pi] — branch-free, any input range."""
    return z - _TWO_PI * jnp.round(z * (1.0 / _TWO_PI))


def _kernel_v4(*refs, chunk, kq, ki, delayed, part_rows, loop_div=1):
    """v4: the whole PLL stage in one kernel — layout transposes, theta
    reconstruction, the 2-row recurrence, NCO cos/sin synthesis and the
    delayed-by-one output all live here.

    v3 left ~1 ms/step of XLA glue around the 0.96 ms loop at 512
    channels (time-major transposes of x and both NCO streams, the
    (N, C) theta-prev stream, the wrap + theta add, the cos/sin pass,
    and the delay concatenates — each a full HBM round-trip, seen in the
    optimized HLO).  Here HBM traffic is x in + 2 NCO streams out, and
    the trig runs in the recurrence's latency bubbles (the loop is
    chain-latency-bound, so off-chain vector work is nearly free).

    theta_prev rebuilds from a per-8-row-group float64 host table
    (``p_ref`` rows: theta at the group's first step) plus ``r*dtheta``
    (r < 8, exact product; one wrap).  Inputs arrive channel-major
    (C, chunk) and transpose in VMEM; NCO accumulates time-major and
    transposes back on write-out.

    carry rows: 0 integ, 1 phase, 2/3 delayed nco i/q carry.
    s_ref rows: 0 integ0, 1 phase0, 2 kq, 3 ki, 4 theta-prev override
    (arg0 - phase0, used only at the very first step), 5/6 nco i/q
    carry-in, 7 dtheta, 8 nco_scale, 9 phase_adjust.
    """
    n_p = len(part_rows)
    x_refs = refs[:n_p]
    (p_ref, s_ref, ni_ref, nq_ref, s_out_ref, carry, xt, ni, nq) = refs[n_p:]
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        carry[0, :] = s_ref[0, :]
        carry[1, :] = s_ref[1, :]
        carry[2, :] = s_ref[5, :]
        carry[3, :] = s_ref[6, :]

    # in-VMEM transpose to time-major; multi-part inputs (e.g. the
    # receiver's pilot + RDS-carrier pair) land at their lane offsets —
    # the stacked copy never exists in HBM
    off = 0
    for xr, rows_n in zip(x_refs, part_rows):
        xt[:, off:off + rows_n] = xr[...].T
        off += rows_n
    integ0, phase0 = carry[0, :], carry[1, :]
    nco_i0, nco_q0 = carry[2, :], carry[3, :]
    if kq is None:
        kq_v, ki_v = s_ref[2, :], s_ref[3, :]
    else:
        kq_v, ki_v = kq, ki
    dth = s_ref[7, :]
    scale_v = s_ref[8, :]
    adjust_v = s_ref[9, :]
    ovr = s_ref[4, :]
    f_first = jnp.float32(first)

    def body(g, c):
        integ, phase, ci_, cq_ = c
        base = pl.multiple_of(g * 8, 8)
        xb = xt[pl.ds(base, 8), :]
        pg = p_ref[g, :]
        rows_i, rows_q = [], []
        for r in range(8):
            if r % loop_div == 0:
                # --- prep, all off the phase->phase chain ---
                tp = pg + jnp.float32(r) * dth if r else pg
                tp = tp - _FOUR_PI * jnp.floor(tp * (1.0 / _FOUR_PI))
                if r == 0:
                    # very first step: feedback argument replaces theta_prev
                    f = f_first * jnp.float32(g == 0)
                    tp = f * ovr + (1.0 - f) * tp
                s = jnp.sign(xb[r, :])
                m = s * s
                w = (_PI * 0.5) * (1.0 - s) - tp
                b = m * kq_v
                a = m * ki_v
                pi_pre = phase + integ
                # --- critical chain (identical to v3) ---
                z = w - phase
                rr = jnp.round(z * _INV_TWO_PI)
                t = z - _TWO_PI * rr
                integ = integ + a * t
                phase = pi_pre + b * t
            # --- NCO synthesis, off-chain (hides in the bubbles) ---
            th_j = pg + jnp.float32(r + 1) * dth
            th_j = th_j - _FOUR_PI * jnp.floor(th_j * (1.0 / _FOUR_PI))
            ph_m = phase - _FOUR_PI * jnp.floor(phase * (1.0 / _FOUR_PI))
            na = (th_j + ph_m) * scale_v + adjust_v
            i_new = jnp.cos(na)
            q_new = jnp.sin(na)
            if delayed:
                rows_i.append(ci_)
                rows_q.append(cq_)
                ci_, cq_ = i_new, q_new
            else:
                rows_i.append(i_new)
                rows_q.append(q_new)
                ci_, cq_ = i_new, q_new
        phase = jnp.mod(phase, _FOUR_PI)
        ni[pl.ds(base, 8), :] = jnp.stack(rows_i)
        nq[pl.ds(base, 8), :] = jnp.stack(rows_q)
        return (integ, phase, ci_, cq_)

    integ, phase, ci_, cq_ = jax.lax.fori_loop(
        0, chunk // 8, body, (integ0, phase0, nco_i0, nco_q0))

    carry[0, :] = integ
    carry[1, :] = phase
    carry[2, :] = ci_
    carry[3, :] = cq_
    ni_ref[...] = ni[...].T
    nq_ref[...] = nq[...].T

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        s_out_ref[0, :] = integ
        s_out_ref[1, :] = phase
        s_out_ref[2, :] = ci_
        s_out_ref[3, :] = cq_
        s_out_ref[4, :] = integ
        s_out_ref[5, :] = integ
        s_out_ref[6, :] = integ
        s_out_ref[7, :] = integ


def _kernel_v6(*refs, chunk, kq, ki, delayed, part_rows, loop_div=1):
    """Wide-lane variant of v4: all data-parallel work runs as full
    (chunk, C) 2-D passes before/after the sequential loop.

    At >=1024 lanes the v4 loop is ISSUE-bound, not latency-bound: every
    per-step 1-D op spans C/128 vector registers, so the ~18 off-chain
    ops per step no longer hide in the recurrence's latency bubbles.
    Here the detector prep (sign/gain/wrap-offset), the NCO ramp and the
    cos/sin synthesis are 2-D elementwise passes over VMEM scratch, and
    the loop body touches only the 6-op critical chain plus row
    reads/stores — ~2x fewer in-loop vector ops.  Same math and carries
    as v4 (the deferred mod-4pi trick wraps the stored phase rows in the
    post-pass).

    Scratch: wt holds the time-major input transpose, then is
    overwritten by the detector offsets W; ni/nq hold the per-step gains
    A=m*ki / B=m*kq during the loop, then the NCO cos/sin after it; thj
    holds the NCO ramp; ph collects the phase rows.
    """
    n_p = len(part_rows)
    x_refs = refs[:n_p]
    (p_ref, s_ref, ni_ref, nq_ref, s_out_ref, carry,
     wt, thj, ph, ni, nq) = refs[n_p:]
    first = pl.program_id(0) == 0
    c = wt.shape[1]

    @pl.when(first)
    def _():
        carry[0, :] = s_ref[0, :]
        carry[1, :] = s_ref[1, :]
        carry[2, :] = s_ref[5, :]
        carry[3, :] = s_ref[6, :]

    off = 0
    for xr, rows_n in zip(x_refs, part_rows):
        wt[:, off:off + rows_n] = xr[...].T
        off += rows_n
    integ0, phase0 = carry[0, :], carry[1, :]
    nco_i0, nco_q0 = carry[2, :], carry[3, :]
    if kq is None:
        kq_v, ki_v = s_ref[2, :], s_ref[3, :]
    else:
        kq_v, ki_v = kq, ki
    dth = s_ref[7, :]
    scale_v = s_ref[8, :]
    adjust_v = s_ref[9, :]
    ovr = s_ref[4, :]
    f_first = jnp.float32(first)

    # ---- pre-pass: (chunk, C) elementwise ----
    riota = jax.lax.broadcasted_iota(jnp.int32, (chunk, c), 0)
    r8 = (riota % 8).astype(jnp.float32)
    p = p_ref[...]
    pfull = jnp.broadcast_to(p[:, None, :], (chunk // 8, 8, c)
                             ).reshape(chunk, c)
    tp = pfull + r8 * dth
    tp = tp - _FOUR_PI * jnp.floor(tp * (1.0 / _FOUR_PI))
    fmask = f_first * (riota == 0).astype(jnp.float32)
    tp = fmask * ovr + (1.0 - fmask) * tp
    x2 = wt[...]
    s = jnp.sign(x2)
    m = s * s
    wt[...] = (_PI * 0.5) * (1.0 - s) - tp
    ni[...] = m * ki_v
    nq[...] = m * kq_v
    t2 = pfull + (r8 + 1.0) * dth
    thj[...] = t2 - _FOUR_PI * jnp.floor(t2 * (1.0 / _FOUR_PI))

    def body(g, car):
        integ, phase = car
        base = pl.multiple_of(g * 8, 8)
        wb = wt[pl.ds(base, 8), :]
        ab = ni[pl.ds(base, 8), :]
        bb = nq[pl.ds(base, 8), :]
        rows = []
        for r in range(8):
            # loop_div: the recurrence fires only every loop_div-th
            # sample (r is a Python constant in this unroll; loop_div
            # divides 8 so base+r ≡ r mod loop_div); skipped rows hold
            # the phase — exactly v4's semantics
            if r % loop_div == 0:
                pi_pre = phase + integ
                z = wb[r, :] - phase
                rr = jnp.round(z * _INV_TWO_PI)
                t = z - _TWO_PI * rr
                integ = integ + ab[r, :] * t
                phase = pi_pre + bb[r, :] * t
            rows.append(phase)
        ph[pl.ds(base, 8), :] = jnp.stack(rows)
        return (integ, jnp.mod(phase, _FOUR_PI))

    integ, phase = jax.lax.fori_loop(0, chunk // 8, body, (integ0, phase0))

    # ---- post-pass: (chunk, C) elementwise ----
    phm = ph[...]
    phm = phm - _FOUR_PI * jnp.floor(phm * (1.0 / _FOUR_PI))
    na = (thj[...] + phm) * scale_v + adjust_v
    i_new = jnp.cos(na)
    q_new = jnp.sin(na)
    ni[...] = i_new
    nq[...] = q_new
    last_i = ni[chunk - 1, :]
    last_q = nq[chunk - 1, :]
    if delayed:
        row0 = (riota == 0).astype(jnp.float32)
        i_out = row0 * nco_i0 + (1.0 - row0) * pltpu.roll(i_new, 1, 0)
        q_out = row0 * nco_q0 + (1.0 - row0) * pltpu.roll(q_new, 1, 0)
    else:
        i_out, q_out = i_new, q_new
    ni_ref[...] = i_out.T
    nq_ref[...] = q_out.T

    carry[0, :] = integ
    carry[1, :] = phase
    carry[2, :] = last_i
    carry[3, :] = last_q

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        s_out_ref[0, :] = integ
        s_out_ref[1, :] = phase
        s_out_ref[2, :] = last_i
        s_out_ref[3, :] = last_q
        s_out_ref[4, :] = integ
        s_out_ref[5, :] = integ
        s_out_ref[6, :] = integ
        s_out_ref[7, :] = integ


def _kernel_v7(*refs, chunk, kq, ki, delayed, part_rows, cg, loop_div=1):
    """Grouped-lane variant of v4: the C flattened lanes live as
    (8, C/8) 2-D values, so every op in the sequential loop is
    sublane-DENSE.

    Why: a 1-D (C,) f32 row in Mosaic occupies one sublane of each
    (8, 128) vreg — at 2048 lanes every per-step op issues 16 vregs at
    1/8 density, and the loop is measured ISSUE-bound there (PERF.md
    v6 experiment).  Mapping lane ``c`` to (sublane s, lane l) with
    ``c = s*cg + l`` (cg = C/8, a multiple of 128) makes each per-step
    value a dense (8, cg) tile — 2 vregs at 2048 lanes, ~8x fewer
    issue slots for the SAME op sequence.  The mapping is a pure
    relabeling of independent lanes: per-lane op order and values are
    bitwise v4's (tested).

    The relayout happens once per chunk at the kernel edges: input
    slab s (channel-major rows [s*cg, (s+1)*cg)) transposes into
    sublane s of every (8, cg) tile of the time-major scratch, and the
    NCO accumulators transpose back slab-wise on write-out.  Host-side
    tables (p_ref theta groups, s_ref parameter rows) arrive already
    grouped via free XLA reshapes.

    This is the round-2 "v5" (8, C) grouping idea: any stacked
    (8, C>=512) value feeding 2-D elementwise math crashed Mosaic
    layout inference then (layout.h:320); the crash no longer
    reproduces on jax 0.9.0 (round-4 note, re-probed round 5).

    carry rows (each (8, cg)): 0 integ, 1 phase, 2/3 delayed nco i/q.
    s_ref rows as v4, grouped: (16, 8, cg).
    """
    n_p = len(part_rows)
    x_refs = refs[:n_p]
    (p_ref, s_ref, ni_ref, nq_ref, s_out_ref, carry, xt3, ni3, nq3) = \
        refs[n_p:]
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        carry[0] = s_ref[0]
        carry[1] = s_ref[1]
        carry[2] = s_ref[5]
        carry[3] = s_ref[6]

    # grouped-lane input relayout: channel slab s -> sublane s of every
    # time tile.  A part whose lane span crosses a slab boundary (all
    # offsets are 128-aligned) contributes lane sub-ranges.
    off = 0
    for xr, rows_n in zip(x_refs, part_rows):
        s_lo = off // cg
        s_hi = -(-(off + rows_n) // cg)
        for s in range(s_lo, s_hi):
            lo = max(off, s * cg)
            hi = min(off + rows_n, (s + 1) * cg)
            xt3[:, s, lo - s * cg:hi - s * cg] = xr[lo - off:hi - off, :].T
        off += rows_n

    integ0, phase0 = carry[0], carry[1]
    nco_i0, nco_q0 = carry[2], carry[3]
    if kq is None:
        kq_v, ki_v = s_ref[2], s_ref[3]
    else:
        kq_v, ki_v = kq, ki
    dth = s_ref[7]
    scale_v = s_ref[8]
    adjust_v = s_ref[9]
    ovr = s_ref[4]
    f_first = jnp.float32(first)

    def body(g, c):
        integ, phase, ci_, cq_ = c
        base = pl.multiple_of(g * 8, 8)
        xb = xt3[pl.ds(base, 8)]          # (8, 8, cg): time x (s, l)
        pg = p_ref[g]                     # (8, cg)
        rows_i, rows_q = [], []
        for r in range(8):
            if r % loop_div == 0:
                # --- prep, off the phase->phase chain (dense tiles) ---
                tp = pg + jnp.float32(r) * dth if r else pg
                tp = tp - _FOUR_PI * jnp.floor(tp * (1.0 / _FOUR_PI))
                if r == 0:
                    f = f_first * jnp.float32(g == 0)
                    tp = f * ovr + (1.0 - f) * tp
                s = jnp.sign(xb[r])
                m = s * s
                w = (_PI * 0.5) * (1.0 - s) - tp
                b = m * kq_v
                a = m * ki_v
                pi_pre = phase + integ
                # --- critical chain (identical math to v4) ---
                z = w - phase
                rr = jnp.round(z * _INV_TWO_PI)
                t = z - _TWO_PI * rr
                integ = integ + a * t
                phase = pi_pre + b * t
            # --- NCO synthesis ---
            th_j = pg + jnp.float32(r + 1) * dth
            th_j = th_j - _FOUR_PI * jnp.floor(th_j * (1.0 / _FOUR_PI))
            ph_m = phase - _FOUR_PI * jnp.floor(phase * (1.0 / _FOUR_PI))
            na = (th_j + ph_m) * scale_v + adjust_v
            i_new = jnp.cos(na)
            q_new = jnp.sin(na)
            if delayed:
                rows_i.append(ci_)
                rows_q.append(cq_)
                ci_, cq_ = i_new, q_new
            else:
                rows_i.append(i_new)
                rows_q.append(q_new)
                ci_, cq_ = i_new, q_new
        phase = jnp.mod(phase, _FOUR_PI)
        ni3[pl.ds(base, 8)] = jnp.stack(rows_i)
        nq3[pl.ds(base, 8)] = jnp.stack(rows_q)
        return (integ, phase, ci_, cq_)

    integ, phase, ci_, cq_ = jax.lax.fori_loop(
        0, chunk // 8, body, (integ0, phase0, nco_i0, nco_q0))

    carry[0] = integ
    carry[1] = phase
    carry[2] = ci_
    carry[3] = cq_
    # grouped-lane output relayout: sublane s back to channel slab s
    n_slabs = ni_ref.shape[0] // cg
    for s in range(n_slabs):
        ni_ref[s * cg:(s + 1) * cg, :] = ni3[:, s, :].T
        nq_ref[s * cg:(s + 1) * cg, :] = nq3[:, s, :].T

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        s_out_ref[0] = integ
        s_out_ref[1] = phase
        s_out_ref[2] = ci_
        s_out_ref[3] = cq_
        s_out_ref[4] = integ
        s_out_ref[5] = integ
        s_out_ref[6] = integ
        s_out_ref[7] = integ


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
    loop_div: int = 1,
) -> tuple[jax.Array, jax.Array, PLLState]:
    """Drop-in replacement for ``ops.pll.pll`` (float32, TPU-compiled).

    x: (..., N); state leaves (...,).  Returns the same delayed-by-one NCO
    views and updated state.  ``loop_div`` (see ``ops.pll.pll``): the
    recurrence runs every loop_div-th sample with bandwidth-preserving
    gains while the NCO emits at full rate — the in-kernel dependency
    chain (the stage's latency bound) shrinks by ~loop_div.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if loop_div not in (1, 2, 4, 8):
        raise ValueError("loop_div must divide the kernel's 8-step group")
    # tuple input = jnp.stack(x, axis=0) semantics; the v4 kernel reads
    # the parts directly (no stacked HBM copy — the receiver's fused
    # stereo+RDS pair saves a full IF-rate buffer per step)
    parts = list(x) if isinstance(x, (tuple, list)) else None
    if parts is not None:
        x0 = parts[0]
        if any(p.shape != x0.shape or p.dtype != x0.dtype
               for p in parts[1:]):
            raise ValueError(
                "pll tuple input requires equal shapes/dtypes, got "
                f"{[(p.shape, p.dtype) for p in parts]}")
        dtype = x0.dtype
        batch_shape = (len(parts),) + x0.shape[:-1]
        n = x0.shape[-1]
    else:
        dtype = x.dtype
        batch_shape = x.shape[:-1]
        n = x.shape[-1]
    c_real = 1
    for d in batch_shape:
        c_real *= d

    if c_real > _MAX_LANES_PER_CALL:
        # lane-slab: run sequential <=2048-lane kernel calls (see
        # _MAX_LANES_PER_CALL).  Each slab slices the PARTS directly —
        # the round-4 path stacked tuple inputs into one (C, N) HBM
        # copy first, which at 4096 lanes (the 2048-channel receiver
        # pair) re-materialized the full IF-rate pair every step and
        # was a measured chunk of the "superlinear past 2048 lanes"
        # wall.  Per-lane parameters broadcast host-side and slice with
        # the lanes.
        flat_parts = ([p.reshape(-1, n) for p in parts]
                      if parts is not None else [x.reshape(c_real, n)])
        st_flat = jax.tree.map(lambda v: v.reshape(c_real), state)

        def bs(v):
            return np.broadcast_to(np.asarray(v, np.float64),
                                   batch_shape).reshape(c_real)

        fr, nb = bs(freq), bs(norm_bandwidth)
        sc, ad = bs(nco_scale), bs(phase_adjust)
        part_offs = np.cumsum([0] + [int(p.shape[0]) for p in flat_parts])
        nis, nqs, sts = [], [], []
        for s0 in range(0, c_real, _MAX_LANES_PER_CALL):
            s1 = min(s0 + _MAX_LANES_PER_CALL, c_real)
            sub_parts = []
            for p, off in zip(flat_parts, part_offs[:-1]):
                lo = max(s0, int(off))
                hi = min(s1, int(off) + int(p.shape[0]))
                if lo < hi:
                    sub_parts.append(p[lo - int(off):hi - int(off)])
            if len(sub_parts) > 1 and any(
                    p.shape != sub_parts[0].shape for p in sub_parts[1:]):
                # slab crosses part boundaries unevenly: the tuple path
                # needs equal parts — concatenate just this slab's rows
                sub_x = jnp.concatenate(sub_parts, axis=0)
                sub_parts = [sub_x]
            sub_x = (tuple(sub_parts) if len(sub_parts) > 1
                     else sub_parts[0])
            sub_st = jax.tree.map(lambda v: v[s0:s1], st_flat)
            ni, nq, st_o = pll_pallas(
                sub_x, sub_st, freq=fr[s0:s1], fs=fs,
                nco_scale=sc[s0:s1], phase_adjust=ad[s0:s1],
                norm_bandwidth=nb[s0:s1], chunk=chunk,
                interpret=interpret, delay_output=delay_output,
                loop_div=loop_div)
            if isinstance(sub_x, tuple):
                ni = ni.reshape(s1 - s0, n)
                nq = nq.reshape(s1 - s0, n)
                st_o = jax.tree.map(lambda v: v.reshape(s1 - s0), st_o)
            nis.append(ni)
            nqs.append(nq)
            sts.append(st_o)
        nco_i = jnp.concatenate(nis, axis=0).reshape(*batch_shape, n)
        nco_q = jnp.concatenate(nqs, axis=0).reshape(*batch_shape, n)
        new_state = jax.tree.map(
            lambda *vs: jnp.concatenate(vs, axis=0).reshape(batch_shape),
            *sts)
        return nco_i, nco_q, new_state

    c = max(_LANES, -(-c_real // _LANES) * _LANES)

    cp, ci = 2.666, 3.555
    # loop constants per lane (float64 host math, then cast — matches the
    # scan implementation's rounding); scalars broadcast, arrays fuse
    # differently-configured loop instances into one kernel
    np_t = np.float32 if dtype == jnp.float32 else np.float64

    def lane_np(v):
        arr = np.broadcast_to(np.asarray(v, np_t), batch_shape)
        return np.ascontiguousarray(arr.reshape(c_real), np_t)

    # loop_div scales the gains so the loop bandwidth in Hz is unchanged
    # at the decimated update rate (see ops.pll.pll docstring)
    nb64 = np.asarray(norm_bandwidth, np.float64) * loop_div
    kp_np = lane_np(nb64 * cp)
    ki_np = lane_np(nb64 * nb64 * ci)
    dtheta64 = np.broadcast_to(
        2.0 * np.pi * np.asarray(freq, np.float64) / fs,
        batch_shape).reshape(c_real)
    spans = _dtheta_spans(dtheta64)

    if len(spans) <= _MAX_SPANS and _v4_chunk(n, c) is not None:
        # fully-fused path: NCO synthesis, delay and transposes in-kernel
        if parts is not None:
            x2d_parts = [p.reshape(-1, n) for p in parts]
            # each part lands at its lane offset in the in-VMEM
            # transpose; keep offsets 128-aligned (small odd batches
            # would hit Mosaic's masked-lane slow path) — else stack
            offs_ok = all(int(p.shape[0]) % _LANES == 0
                          for p in x2d_parts[:-1])
            if not offs_ok:
                x2d_parts = [jnp.concatenate(x2d_parts, axis=0)]
        else:
            x2d_parts = [x.reshape(c_real, n)]
        return _call_v4(x2d_parts, state, kp_np, ki_np, spans,
                        nco_scale, phase_adjust, n, c, c_real, dtype,
                        batch_shape, interpret, delay_output, np_t,
                        lane_np, loop_div)

    if loop_div != 1:
        raise ValueError(
            "loop_div > 1 needs the fused v4 kernel (uniform dtheta "
            "spans, 128-multiple chunk); this call is not eligible — "
            "use impl='scan' or loop_div=1")
    if parts is not None:
        x = jnp.stack(parts, axis=0)
    xt = x.reshape(c_real, n).T  # (N, C_real)
    if c != c_real:
        xt = jnp.pad(xt, ((0, 0), (0, c - c_real)))
    args_t, unpack = _call_theta(xt, state, kp_np, ki_np,
                                 dtheta64.astype(np_t), n, c, c_real, chunk,
                                 dtype, batch_shape, interpret)

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


def _v4_chunk(n: int, c: int, wide: bool = False) -> int | None:
    """Largest VMEM-fitting v4/v6 chunk: divides n, multiple of 128 (the
    channel-major (C, chunk) blocks put time in lanes).  None if n has
    no 128-multiple divisor — the caller falls back to the legacy
    kernel.  VMEM: ~9 (chunk, C) f32 buffers for v4 (x + 2 outs
    double-buffered, 3 scratches, transpose working set) under ~9 MB;
    the wide kernel carries 2 more scratch planes."""
    bufs = 44 if wide else 36
    cap = min(512, max(128, (9 * 1024 * 1024) // (bufs * c) // 128 * 128))
    return next((s for s in range(min(cap, n), 127, -128)
                 if n % s == 0 and s % 128 == 0), None)


def _call_v4(x2d_parts, state, kp_np, ki_np, spans, nco_scale, phase_adjust,
             n, c, c_real, dtype, batch_shape, interpret, delay_output,
             np_t, lane_np, loop_div=1):
    """Fully-fused kernel path: channel-major in/out, no XLA glue.

    ``x2d_parts``: list of (c_i, n) arrays concatenated logically along
    the channel axis (sum c_i = c_real) — each becomes its own input ref
    and lands in the in-VMEM transpose at its lane offset, so a stacked
    pair never materializes in HBM.  Returns (nco_i, nco_q, new_state)
    shaped like ``ops.pll.pll``."""
    if c != c_real:
        last = x2d_parts[-1]
        x2d_parts = x2d_parts[:-1] + [
            jnp.pad(last, ((0, c - c_real), (0, 0)))]
    part_rows = tuple(int(p.shape[0]) for p in x2d_parts)

    # per-8-step-group theta table (N/8, C) from float64 host ramps
    # (theta at the group's first step j=8g: mod(theta0 + 8g*dth, 4pi));
    # rows r<8 rebuild in-kernel as P_g + r*dth (exact product, one wrap)
    g8 = 8.0 * np.arange(n // 8, dtype=np.float64)
    theta0 = state.theta.reshape(c_real).astype(dtype)
    cols = []
    ends = []
    for (s0, s1, dth) in spans:
        table = jnp.asarray(np.mod(g8 * dth, 4.0 * np.pi), dtype)
        cols.append(jnp.mod(theta0[s0:s1][None, :] + table[:, None],
                            _FOUR_PI))
        end64 = float(np.mod(n * dth, 4.0 * np.pi))
        ends.append(jnp.mod(theta0[s0:s1] + jnp.asarray(end64, dtype),
                            _FOUR_PI))
    p_seq = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)
    theta_end = ends[0] if len(ends) == 1 else jnp.concatenate(ends)
    if c != c_real:
        p_seq = jnp.pad(p_seq, ((0, 0), (0, c - c_real)))

    arg0 = jnp.arctan2(state.fb_q, state.fb_i).reshape(c_real).astype(dtype)
    phase0 = state.phase_est.reshape(c_real).astype(dtype)
    ovr0 = arg0 - phase0

    kq_np = kp_np + ki_np
    uniform = np.ptp(kq_np) == 0 and np.ptp(ki_np) == 0
    use_scalar = uniform and c <= 512
    kq = float(kq_np[0]) if use_scalar else None
    ki = float(ki_np[0]) if use_scalar else None

    def pad_row(a):
        r = jnp.asarray(a, dtype)
        return jnp.pad(r, (0, c - c_real)) if c != c_real else r

    dtheta_row = np.empty(c_real, np_t)
    for (s0, s1, dth) in spans:
        dtheta_row[s0:s1] = np_t(dth)
    rows = [pad_row(state.integrator.reshape(c_real)),
            pad_row(phase0), pad_row(kq_np), pad_row(ki_np),
            pad_row(ovr0),
            pad_row(state.nco_i.reshape(c_real)),
            pad_row(state.nco_q.reshape(c_real)),
            pad_row(dtheta_row),
            pad_row(lane_np(nco_scale)),
            pad_row(lane_np(phase_adjust))]
    s_in = jnp.concatenate(
        [jnp.stack(rows), jnp.zeros((6, c), dtype)], axis=0)

    # v6 (RTSDR_PLL_WIDE=1): hoists the data-parallel prep/trig into 2-D
    # passes around a minimal loop.  Measured on-chip at 2048 lanes:
    # bitwise-identical to v4 and only ~2% faster — the 6-op critical
    # chain itself spans C/128 vregs per op, so past ~1024 lanes the
    # CHAIN is the issue bound (6 x 16 vregs x 15360 steps ~ 1.6 ms at
    # 2048 lanes); stripping the off-chain work doesn't move it.  Kept
    # opt-in as the experimental record; loop_div is the lever that
    # actually shortens the chain.  NOTE the env var is read at TRACE
    # time: set it before the first jit-compile of a step — toggling it
    # later leaves the cached executable unchanged.
    import os

    wide = os.environ.get("RTSDR_PLL_WIDE") == "1"
    # v7 grouped-lane kernel (round 5): lanes as (8, c/8) dense tiles —
    # ~8x fewer vector issues per loop op where the loop is issue-bound
    # (>= 2048 lanes).  Needs cg = c/8 to be a lane-tile multiple.
    # RTSDR_PLL_GROUPED=0/1 forces it off/on (trace-time, like
    # RTSDR_PLL_WIDE).
    grp_env = os.environ.get("RTSDR_PLL_GROUPED")
    grouped = (not wide and c % 1024 == 0
               and (grp_env == "1" or (grp_env != "0" and c >= 2048)))
    chunk = _v4_chunk(n, c, wide=wide)

    if grouped:
        cg = c // 8
        kern = partial(_kernel_v7, chunk=chunk, kq=kq, ki=ki,
                       delayed=delay_output, part_rows=part_rows,
                       cg=cg, loop_div=loop_div)
        scratch = [pltpu.VMEM((4, 8, cg), dtype)] + \
            [pltpu.VMEM((chunk, 8, cg), dtype) for _ in range(3)]
        p_in = p_seq.reshape(n // 8, 8, cg)
        s_in3 = s_in.reshape(16, 8, cg)
        tab_specs = [
            pl.BlockSpec((chunk // 8, 8, cg), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 8, cg), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        s_out_spec = pl.BlockSpec((8, 8, cg), lambda i: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
        s_out_shape = jax.ShapeDtypeStruct((8, 8, cg), dtype)
    elif wide:
        kern = partial(_kernel_v6, chunk=chunk, kq=kq, ki=ki,
                       delayed=delay_output, part_rows=part_rows,
                       loop_div=loop_div)
        scratch = [pltpu.VMEM((8, c), dtype)] + \
            [pltpu.VMEM((chunk, c), dtype) for _ in range(5)]
    else:
        kern = partial(_kernel_v4, chunk=chunk, kq=kq, ki=ki,
                       delayed=delay_output, part_rows=part_rows,
                       loop_div=loop_div)
        scratch = [pltpu.VMEM((8, c), dtype)] + \
            [pltpu.VMEM((chunk, c), dtype) for _ in range(3)]
    if not grouped:
        p_in = p_seq
        s_in3 = s_in
        tab_specs = [
            pl.BlockSpec((chunk // 8, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        s_out_spec = pl.BlockSpec((8, c), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        s_out_shape = jax.ShapeDtypeStruct((8, c), dtype)
    ni, nq, s_out = pl.pallas_call(
        kern,
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec((r, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
            for r in part_rows
        ] + tab_specs,
        out_specs=[
            pl.BlockSpec((c, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            s_out_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, n), dtype),
            jax.ShapeDtypeStruct((c, n), dtype),
            s_out_shape,
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*x2d_parts, p_in, s_in3)
    if grouped:
        s_out = s_out.reshape(8, c)

    nco_i = ni[:c_real].reshape(*batch_shape, n)
    nco_q = nq[:c_real].reshape(*batch_shape, n)
    integ_end = s_out[0, :c_real].reshape(batch_shape)
    phase_end = s_out[1, :c_real].reshape(batch_shape)
    nco_i_last = s_out[2, :c_real].reshape(batch_shape)
    nco_q_last = s_out[3, :c_real].reshape(batch_shape)
    theta_end = theta_end.reshape(batch_shape)
    arg_end = theta_end + phase_end
    new_state = PLLState(
        integrator=integ_end, phase_est=phase_end,
        fb_i=jnp.cos(arg_end), fb_q=jnp.sin(arg_end),
        nco_i=nco_i_last, nco_q=nco_q_last, theta=theta_end)
    return nco_i, nco_q, new_state


def _call_theta(xt, state, kp_np, ki_np, dtheta_np, n, c, c_real, chunk,
                dtype, batch_shape, interpret):
    """Legacy in-loop-theta kernel for arbitrary per-lane dtheta."""
    # VMEM budget: 2 (chunk, C) streams + phases, double-buffered;
    # chunk must divide n and be a multiple of 8
    vmem_rows = max(8, (1024 * 1024) // (4 * c) // 8 * 8)
    chunk = min(chunk, vmem_rows)
    if n % chunk != 0 or chunk % 8 != 0:
        chunk = next((s for s in range(min(chunk, n), 7, -1)
                      if n % s == 0 and s % 8 == 0), None)
        if chunk is None:
            raise ValueError(f"PLL block length {n} must have a divisor "
                             "that is a multiple of 8")
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
