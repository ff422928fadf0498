"""PLL / NCO carrier recovery as a ``lax.scan`` recurrence.

Faithful to the golden model ``fmPll`` (model/fmPll.py:4-49): first-order
loop with an atan2 phase detector, PI loop filter (Cp=2.666, Ci=3.555,
Kp=B*Cp, Ki=B^2*Ci), and an NCO emitting cos/sin(trigArg*ncoScale +
phaseAdjust).  The recurrence is inherently sequential per channel —
throughput on TPU comes from ``vmap``/sharding across channels (each scan
step is a VPU-vectorized op over the batch), not from parallelizing a single
loop (SURVEY.md §7 "hard parts" #1).

Improvements over the reference, deliberate (SURVEY.md §7):

* The reference accumulates ``trigOffset`` and ``phaseEst`` without bound
  (model/fmPll.py:33,44), so float32 trig arguments lose precision within
  minutes of stream time.  We wrap both modulo 4*pi each step — exact for
  any half-integer ``nco_scale`` (cos((x mod 4pi)*s + p) == cos(x*s + p)
  for s in {0.5, 1, 2, ...}) — so float32 stays accurate indefinitely.
* Both NCO quadratures are carried in the state (the reference leaves
  ``ncoOutQ[0]`` uninitialized, model/fmPll.py:13,36-37).

Output alignment matches the model's consumers exactly: the model returns
``ncoOut`` of length N+1 whose element 0 is the *previous* block's last NCO
sample, and the mixers consume ``ncoOut[0:N]`` (model/fmMonoBlock.py:155,
model/fmRDSblock.py:173-175) — i.e. the NCO is applied with one sample of
delay.  ``pll`` returns that delayed-by-one view directly.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PLLState(NamedTuple):
    """Block-continuity state (reference pll_state_type, src/helper.h:17-19)."""

    integrator: jax.Array
    phase_est: jax.Array   # wrapped mod 4*pi
    fb_i: jax.Array
    fb_q: jax.Array
    nco_i: jax.Array       # last NCO cos sample (model recovery_state[4])
    nco_q: jax.Array       # last NCO sin sample
    theta: jax.Array       # 2*pi*(freq/fs)*trigOffset, wrapped mod 4*pi


_FOUR_PI = 4.0 * math.pi


def pll_init(batch_shape: tuple = (), dtype=jnp.float32) -> PLLState:
    """Initial state matching the model's [0, 0, 1, 0, 1, 0] convention
    (model/fmMonoBlock.py:76) plus nco_q=0."""
    z = jnp.zeros(batch_shape, dtype=dtype)
    o = jnp.ones(batch_shape, dtype=dtype)
    return PLLState(integrator=z, phase_est=z, fb_i=o, fb_q=z,
                    nco_i=o, nco_q=z, theta=z)


def pll(
    x: jax.Array,
    state: PLLState,
    *,
    freq: float,
    fs: float,
    nco_scale: float = 1.0,
    phase_adjust: float = 0.0,
    norm_bandwidth: float = 0.01,
    unroll: int = 2,
    impl: str = "scan",
    delay_output: bool = True,
    loop_div: int = 1,
) -> tuple[jax.Array, jax.Array, PLLState]:
    """Run the PLL over one block.

    Args:
      x: (..., N) real input (band-passed pilot / squared carrier); or a
        TUPLE of equal-shape arrays, treated exactly as
        ``jnp.stack(x, axis=0)`` — the Pallas path then reads the parts
        directly instead of materializing the stacked copy (the receiver
        feeds the stereo-pilot + RDS-carrier pair this way).
      state: PLLState with fields shaped (...,).
      impl: 'scan' (lax.scan, any backend/dtype), 'pallas' (TPU kernel,
        much lower loop overhead; interpret-mode elsewhere), or 'auto'
        (pallas for float32 on TPU, else scan).
      delay_output: True (default) reproduces the golden model's
        ``ncoOut[0:N]`` mixer view.  Because ``ncoOut`` entries are
        one-indexed (ncoOut[k+1] holds the NCO at sample k), this view is
        the *time-aligned* one.  False shifts the NCO one sample early
        (diagnostic only).
      loop_div: run the loop-filter recurrence only every ``loop_div``-th
        sample (1 = golden parity).  The NCO / feedback angles still
        advance at full rate, so the output is a full-rate carrier; the
        detector samples the error process ``loop_div`` x more sparsely
        and the PI gains are scaled (norm_bandwidth x loop_div at the
        decimated update rate) so the loop's bandwidth in Hz is
        unchanged.  The recurrence is latency-bound on TPU, so the PLL
        stage's wall-time drops by ~loop_div; lock/tracking behavior is
        preserved within the loop's own noise (tests assert stereo
        separation and RDS sync parity at div<=4).  N must be divisible
        by loop_div.

    Returns:
      nco_i, nco_q: (..., N) NCO outputs *delayed by one sample* (the
        model's ``ncoOut[0:N]`` view — element 0 is the previous block's
        last NCO sample).
      new_state.
    """
    x_dtype = x[0].dtype if isinstance(x, (tuple, list)) else x.dtype
    if impl == "auto":
        use_pallas = (jax.default_backend() == "tpu"
                      and x_dtype == jnp.float32)
    else:
        use_pallas = impl == "pallas"
    if use_pallas:
        from rtsdr_tpu.ops.pallas_pll import pll_pallas

        return pll_pallas(
            x, state, freq=freq, fs=fs, nco_scale=nco_scale,
            phase_adjust=phase_adjust, norm_bandwidth=norm_bandwidth,
            delay_output=delay_output, loop_div=loop_div)
    if isinstance(x, (tuple, list)):
        x = jnp.stack(x, axis=0)
    dtype = x.dtype
    cp, ci = 2.666, 3.555
    # freq / norm_bandwidth / nco_scale / phase_adjust may be arrays
    # broadcastable to the batch shape (fusing differently-configured loop
    # instances into one call — e.g. the stereo pilot and RDS carrier
    # loops); per-lane numerics are identical to separate calls because the
    # derived constants are computed in float64 host-side, then cast.
    import numpy as np

    assert loop_div >= 1 and x.shape[-1] % loop_div == 0
    nb64 = np.asarray(norm_bandwidth, np.float64) * loop_div
    f64 = np.asarray(freq, np.float64)
    kp = jnp.asarray(np.asarray(nb64 * cp)).astype(dtype)
    ki = jnp.asarray(np.asarray(nb64 * nb64 * ci)).astype(dtype)
    dtheta = jnp.asarray(np.asarray(2.0 * math.pi * f64 / fs)).astype(dtype)
    scale = jnp.asarray(np.asarray(nco_scale, np.float64)).astype(dtype)
    adjust = jnp.asarray(np.asarray(phase_adjust, np.float64)).astype(dtype)
    four_pi = jnp.asarray(_FOUR_PI, dtype)

    # time-major for scan: (N, ...)
    xs = jnp.moveaxis(x, -1, 0)

    def update(carry, xk):
        """One loop-filter update from detector sample xk (pre-update
        feedback angles), followed by a theta advance."""
        integ, phase, fb_i, fb_q, theta = carry
        error_i = xk * fb_i
        error_q = xk * (-fb_q)
        error_d = jnp.arctan2(error_q, error_i)
        integ = integ + ki * error_d
        phase = jnp.mod(phase + kp * error_d + integ, four_pi)
        return integ, phase, theta

    def emit(phase, theta, dth):
        theta = jnp.mod(theta + dth, four_pi)
        arg = theta + phase
        nco_arg = arg * scale + adjust
        return theta, arg, jnp.cos(nco_arg), jnp.sin(nco_arg)

    if loop_div == 1:
        def step(carry, xk):
            integ, phase, theta = update(carry, xk)
            theta, arg, nco_i, nco_q = emit(phase, theta, dtheta)
            return ((integ, phase, jnp.cos(arg), jnp.sin(arg), theta),
                    (nco_i, nco_q))
        scan_xs = xs
    else:
        # grouped scan: one recurrence per group of loop_div samples, the
        # NCO/theta advancing per sample (full-rate carrier out)
        def step(carry, xg):
            integ, phase, theta = update(carry, xg[0])
            outs_i, outs_q = [], []
            for j in range(loop_div):
                theta, arg, nco_i, nco_q = emit(phase, theta, dtheta)
                outs_i.append(nco_i)
                outs_q.append(nco_q)
            return ((integ, phase, jnp.cos(arg), jnp.sin(arg), theta),
                    (jnp.stack(outs_i), jnp.stack(outs_q)))
        scan_xs = xs.reshape(xs.shape[0] // loop_div, loop_div,
                             *xs.shape[1:])

    carry0 = (state.integrator, state.phase_est, state.fb_i, state.fb_q,
              state.theta)
    (integ, phase, fb_i, fb_q, theta), (nco_i_seq, nco_q_seq) = jax.lax.scan(
        step, carry0, scan_xs, unroll=unroll)
    if loop_div > 1:
        nco_i_seq = nco_i_seq.reshape(-1, *nco_i_seq.shape[2:])
        nco_q_seq = nco_q_seq.reshape(-1, *nco_q_seq.shape[2:])

    # (N, ...) -> (..., N)
    nco_i_new = jnp.moveaxis(nco_i_seq, 0, -1)
    nco_q_new = jnp.moveaxis(nco_q_seq, 0, -1)

    if delay_output:
        # Delayed-by-one view: prepend previous block's last NCO sample.
        nco_i = jnp.concatenate([state.nco_i[..., None], nco_i_new[..., :-1]],
                                axis=-1)
        nco_q = jnp.concatenate([state.nco_q[..., None], nco_q_new[..., :-1]],
                                axis=-1)
    else:
        nco_i, nco_q = nco_i_new, nco_q_new

    new_state = PLLState(
        integrator=integ, phase_est=phase, fb_i=fb_i, fb_q=fb_q,
        nco_i=nco_i_new[..., -1], nco_q=nco_q_new[..., -1], theta=theta)
    return nco_i, nco_q, new_state


def pll_extrapolate_by(
    state: PLLState,
    theta_advance,
    n_steps,
    *,
    nco_scale: float = 1.0,
    phase_adjust: float = 0.0,
) -> PLLState:
    """Advance a PLL state with no input, assuming lock, by a precomputed
    ramp advance.

    In lock the detector error is ~0, so per step the loop advances
    ``theta`` by the NCO ramp ``2*pi*freq/fs`` and ``phase_est`` by the
    integrator (the steady-state slope of ``phase = phase + kp*e + integ``
    with e ~ 0; see the scan body above).  The feedback and NCO samples are
    recomputed from the extrapolated angles exactly as the loop would.

    ``theta_advance`` is ``(n_steps * dtheta) mod 4*pi`` — compute it
    host-side in float64 so extrapolation adds no trig-argument drift.
    Both ``theta_advance`` and ``n_steps`` may be arrays broadcastable to
    the state's batch shape (time-sharded receivers extrapolate each shard
    by its own offset in one call).
    """
    import numpy as np

    dtype = state.phase_est.dtype
    four_pi = jnp.asarray(_FOUR_PI, dtype)
    theta = jnp.mod(state.theta + jnp.asarray(theta_advance, dtype), four_pi)
    phase = jnp.mod(state.phase_est
                    + jnp.asarray(n_steps, dtype) * state.integrator,
                    four_pi)
    arg = theta + phase
    scale = jnp.asarray(np.asarray(nco_scale, np.float64)).astype(dtype)
    adjust = jnp.asarray(np.asarray(phase_adjust, np.float64)).astype(dtype)
    nco_arg = arg * scale + adjust
    return PLLState(integrator=state.integrator, phase_est=phase,
                    fb_i=jnp.cos(arg), fb_q=jnp.sin(arg),
                    nco_i=jnp.cos(nco_arg), nco_q=jnp.sin(nco_arg),
                    theta=theta)


def pll_extrapolate(
    state: PLLState,
    n_steps: int,
    *,
    freq: float,
    fs: float,
    nco_scale: float = 1.0,
    phase_adjust: float = 0.0,
) -> PLLState:
    """Advance a PLL state ``n_steps`` samples with no input, assuming lock.

    This is the stale-handoff primitive for time-sharded latency scaling
    (parallel/timeshard.py ``pll_handoff='stale'|'iterate'``): each time
    shard seeds its chunk from the exact end-of-previous-block carry,
    extrapolated across its own start offset — removing the sequential
    shard-to-shard pipeline (the Amdahl term in SCALING_r02.json's
    ici_comm_model) at the cost of a lock-transient approximation instead
    of bit-exact parity.  See ``pll_extrapolate_by`` for the math.
    """
    import numpy as np

    dth = np.mod(2.0 * np.pi * np.float64(freq) / np.float64(fs)
                 * np.float64(n_steps), 2.0 * _FOUR_PI) % _FOUR_PI
    return pll_extrapolate_by(state, dth, float(n_steps),
                              nco_scale=nco_scale,
                              phase_adjust=phase_adjust)
