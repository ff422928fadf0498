"""FM discriminator.

Two variants, both branch-free and fully vectorized (no per-sample scan):

* ``fm_discriminator`` — exact phase-difference demodulator.  Produces
  outputs identical to the golden model's atan2 + unwrap + derivative loop
  (model/fmSupportLib.py:15-44): the unwrapped difference of consecutive
  atan2 phases equals atan2 of the conjugate product,
      dphi[k] = atan2(Q[k] I[k-1] - I[k] Q[k-1],  I[k] I[k-1] + Q[k] Q[k-1]),
  exactly (both lie in (-pi, pi]).  This removes the golden model's
  per-sample Python loop without changing a single output bit in exact
  arithmetic.

* ``fm_discriminator_linear`` — the derivative approximation used by the
  reference C++ hot path (src/rf_module.cpp:13-34):
      (I dQ - Q dI) / (I^2 + Q^2).
  Cheaper (no atan2) but only first-order accurate; kept for parity
  experiments and for SNR/throughput tradeoffs.

State is the previous block's last (I, Q) pair — unlike the reference C++,
which resets its state every block (src/rf_module.cpp:15, a quirk we do not
replicate; SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def demod_init(batch_shape: tuple = (), dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
    """Initial state: previous (I, Q) = (1, 0), i.e. previous phase = 0,
    matching the golden model's ``prev_phase=0`` default."""
    return (jnp.ones(batch_shape, dtype=dtype), jnp.zeros(batch_shape, dtype=dtype))


def _shift_prev(x: jax.Array, x0: jax.Array) -> jax.Array:
    return jnp.concatenate([x0[..., None], x[..., :-1]], axis=-1)


def fm_discriminator(i: jax.Array, q: jax.Array, state) -> tuple[jax.Array, tuple]:
    """Exact FM demodulation: wrapped phase derivative of the IQ stream.

    Args:
      i, q:  (..., N) in-phase / quadrature samples at the IF rate.
      state: (prev_i, prev_q) each (...,) — last sample of previous block.

    Returns:
      fm: (..., N) instantaneous frequency in rad/sample, in (-pi, pi].
      new state.
    """
    prev_i, prev_q = state
    ip = _shift_prev(i, prev_i)
    qp = _shift_prev(q, prev_q)
    num = q * ip - i * qp
    den = i * ip + q * qp
    fm = jnp.arctan2(num, den)
    return fm, (i[..., -1], q[..., -1])


def fm_discriminator_linear(i: jax.Array, q: jax.Array, state,
                            eps: float = 1e-12) -> tuple[jax.Array, tuple]:
    """Derivative-form discriminator (reference src/rf_module.cpp:27)."""
    prev_i, prev_q = state
    ip = _shift_prev(i, prev_i)
    qp = _shift_prev(q, prev_q)
    num = i * (q - qp) - q * (i - ip)
    den = i * i + q * q
    fm = num / (den + jnp.asarray(eps, i.dtype))
    return fm, (i[..., -1], q[..., -1])
