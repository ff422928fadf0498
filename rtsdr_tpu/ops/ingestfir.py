"""Fused ingest + RF front end: uint8 interleaved IQ -> decimated IF.

The separate normalize/deinterleave/transpose/concat steps materialize
several float copies of the 2.4 MS/s stream and scale superlinearly with
channel count (9.6 ms for the mono chain at 512 channels).  Here the
banded-matmul FIR consumes the *raw interleaved uint8* stream directly:

  * output windows are slices of the (128-left-padded) raw bytes; the
    (b-128)/128 conversion folds into the window gather;
  * I and Q come out of one matmul as interleaved columns of a banded
    filter matrix over the raw domain (stride 2*decim, taps at even
    offsets for I / odd for Q);
  * the carried overlap-save state contributes only to the first
    ceil((taps-1)/decim) outputs, applied as a tiny boundary matmul —
    exactly the scheme of ``ops.fir._resample_polyphase_matmul``.

Output-equivalent to ``frontend`` built from normalize + fir_decimate
(float32 rounding differences only; tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ingest_fir_decimate(
    raw_u8: jax.Array,
    h,
    zi_i: jax.Array,
    zi_q: jax.Array,
    decim: int,
    block: int = 128,
    halo: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """uint8 (..., 2N) interleaved IQ -> ((..., M) i, (..., M) q, new zis).

    Exactly ``fir_decimate(normalize(deinterleave(raw)), h, zi, decim)``
    for both I and Q, M = N/decim.

    ``halo=True``: the first ``2*(taps-1)`` bytes of ``raw_u8`` are a REAL
    left halo (the preceding chunk's tail) instead of the implicit 128-pad
    — used by the time-sharded receiver so every output is a pure window
    dot, bitwise identical to an unsharded run over the concatenated
    stream (as long as each chunk's output count is a multiple of
    ``block``, which preserves the banded-matmul grouping).  The zi
    boundary matmul still applies (pass zeros to no-op it exactly: the
    ``+0.0`` add is bitwise neutral).
    """
    h = np.asarray(h, np.float64)
    taps = h.shape[0]
    t1 = taps - 1
    stride_raw = 2 * decim
    n_raw = raw_u8.shape[-1] - (2 * t1 if halo else 0)
    n = n_raw // 2
    assert n % decim == 0
    m_total = n // decim
    batch = raw_u8.shape[:-1]

    nblk = -(-m_total // block)
    span = (block - 1) * stride_raw + 2 * t1 + 2  # raw samples per window
    # left pad = 2*t1 raw bytes of value 128 (normalizes to 0; the true
    # carried samples enter via the zi boundary matmul below) — unless a
    # real halo is already prepended
    pad_left = 0 if halo else 2 * t1
    need_right = ((nblk - 1) * block * stride_raw + span
                  - pad_left - raw_u8.shape[-1])
    raw_pad = jnp.pad(raw_u8, [(0, 0)] * (raw_u8.ndim - 1)
                      + [(pad_left, max(0, need_right))],
                      constant_values=128)

    # On TPU the windows buffer (the dominant HBM traffic, ~1.1x the raw
    # stream per step in f32) materializes as INT8: (b - 128) is exactly
    # the two's-complement reinterpretation of b ^ 0x80, the taps go in
    # as a two-level s8 quantization h*s ~= A + B/127 (A, B int8 — ~15
    # significant bits, 26x more accurate than a bf16 single level,
    # measured 3.8e-5 vs 1.0e-3 max error against the float64 oracle at
    # equal speed), and the s8 x s8 -> s32 accumulation is integer-exact
    # (|sum| <= 2842 * 128 * 127 < 2^31).  The xor/convert happens PER
    # SLICE so it fuses into the concatenate's operands — converting the
    # stacked windows afterwards materializes two copies (verified in
    # optimized HLO).  CPU path stays float32.
    on_tpu = jax.default_backend() == "tpu"

    def w_slice(s):
        sl = jax.lax.slice_in_dim(raw_pad, s * block * stride_raw,
                                  s * block * stride_raw + span, axis=-1)
        if on_tpu:
            return (sl ^ jnp.uint8(0x80)).astype(jnp.int8)
        return (sl.astype(jnp.float32) - 128.0) * (1.0 / 128.0)

    windows = jnp.stack([w_slice(s) for s in range(nblk)], axis=-2)

    # banded H over the raw domain: output i, quadrature phi reads window
    # position s = stride_raw*i + 2*(t1 - k) + phi with tap h[k]
    i_idx = np.arange(block)[:, None]
    k_idx = np.arange(taps)[None, :]
    s_even = stride_raw * i_idx + 2 * (t1 - k_idx)
    rows = np.broadcast_to(i_idx, s_even.shape)

    if on_tpu:
        s1 = 127.0 / np.abs(h).max()
        h_hi = np.round(h * s1)
        h_lo = np.round((h * s1 - h_hi) * 127.0)
        h_mat = np.zeros((span, 4 * block), np.int8)
        for off, vals in ((0, h_hi), (2 * block, h_lo)):
            h_b = np.broadcast_to(vals, s_even.shape)
            h_mat[s_even.ravel(), off + 2 * rows.ravel()] = h_b.ravel()
            h_mat[s_even.ravel() + 1, off + 2 * rows.ravel() + 1] = \
                h_b.ravel()
        y32 = jax.lax.dot_general(
            windows, jnp.asarray(h_mat),
            dimension_numbers=(((windows.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)    # (..., nblk, 4*block)
        y32 = y32.reshape(*batch, nblk, 2, 2 * block)
        y = ((y32[..., 0, :].astype(jnp.float32)
              + y32[..., 1, :].astype(jnp.float32) * np.float32(1 / 127.0))
             * np.float32(1.0 / (128.0 * s1)))
    else:
        h_mat = np.zeros((span, 2 * block), np.float32)
        h_b = np.broadcast_to(h, s_even.shape)
        h_mat[s_even.ravel(), 2 * rows.ravel()] = \
            h_b.ravel().astype(np.float32)
        h_mat[s_even.ravel() + 1, 2 * rows.ravel() + 1] = \
            h_b.ravel().astype(np.float32)
        y = jax.lax.dot_general(
            windows, jnp.asarray(h_mat),
            dimension_numbers=(((windows.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (..., nblk, 2*block)
    y = y.reshape(*batch, nblk * block, 2)[..., :m_total, :]
    y_i = y[..., 0]
    y_q = y[..., 1]

    # zi boundary: outputs m < ceil(t1/decim) also read the carried tail
    # (overlap-save index p = m*decim + t1 - k < t1  =>  k > m*decim)
    nb = -(-t1 // decim)
    mz = np.arange(nb)[:, None]
    p = np.arange(t1)[None, :]
    kz = mz * decim + t1 - p
    validz = (kz >= 1) & (kz <= t1) & (p < t1) & (p >= mz * decim)
    hz = jnp.asarray(np.where(validz, h[np.clip(kz, 0, t1)], 0.0),
                     jnp.float32)
    dot = lambda zi: jax.lax.dot_general(
        zi.astype(jnp.float32), hz,
        dimension_numbers=(((zi.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y_i = y_i.at[..., :nb].add(dot(zi_i))
    y_q = y_q.at[..., :nb].add(dot(zi_q))

    # new state: last t1 I/Q samples, normalized (tiny)
    tail = raw_u8[..., -2 * t1:]
    tail = (tail.astype(jnp.float32) - 128.0) * (1.0 / 128.0)
    new_zi_i = tail[..., 0::2]
    new_zi_q = tail[..., 1::2]
    return y_i, y_q, new_zi_i, new_zi_q
