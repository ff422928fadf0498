"""Block FIR filtering with overlap-save state carry.

TPU-native replacement for the reference's nine convolution variants
(src/filter.cpp:96-401) and for scipy ``lfilter(..., zi=...)`` chains in the
golden models (model/fmMonoBlock.py:86-160).  One formulation covers them
all:

  * the carried state is the last ``taps-1`` *input* samples (overlap-save),
    exactly the semantics of the golden model's ``my_convoloution``
    (model/fmSupportLib.py:157-176): output-equivalent to chained
    ``scipy.signal.lfilter`` from zero initial conditions;
  * decimation fuses into the convolution as the XLA window stride
    (reference C5/C6, src/filter.cpp:126-185);
  * rational up/down resampling fuses in as lhs dilation + window stride —
    XLA's native polyphase form (reference C8/C9, src/filter.cpp:222-339);
  * the "fused" squaring/mixer variants (C10/C11, src/filter.cpp:342-401)
    need no special kernels here: elementwise pre-ops compose under jit and
    XLA fuses them into the convolution's input.

All functions are shape-polymorphic over leading batch dimensions (channels),
which is where TPU throughput comes from: a (channels, time) batch feeds the
MXU as one big convolution.

Everything is exact (no approximation), dtype-polymorphic (float32 for the
production path, float64 under x64 for oracle parity tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fir_zi(num_taps: int, batch_shape: tuple = (), dtype=jnp.float32) -> jax.Array:
    """Zero initial overlap-save state (last ``taps-1`` inputs)."""
    return jnp.zeros((*batch_shape, num_taps - 1), dtype=dtype)


def _as_taps(h, dtype) -> jax.Array:
    h = jnp.asarray(h)
    return h.astype(dtype)


def _conv1d_valid_xla(x: jax.Array, h: jax.Array, stride: int = 1) -> jax.Array:
    """VALID 1-D convolution via ``lax.conv_general_dilated``.

    Exact and dtype-general, but XLA's TPU lowering of feature=1 convs runs
    at only ~0.7 TFLOP/s — used for float64 oracle parity and CPU."""
    batch_shape = x.shape[:-1]
    length = x.shape[-1]
    lhs = x.reshape((-1, 1, length))
    rhs = h[::-1].reshape((1, 1, h.shape[0]))
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=x.dtype if x.dtype == jnp.float64 else jnp.float32,
    )
    return out.reshape((*batch_shape, out.shape[-1])).astype(x.dtype)


def _mxu_input(x: jax.Array) -> jax.Array:
    """Cast a float32 FIR input to bf16 on TPU BEFORE window construction.

    TPU f32 dots at default precision truncate both operands to bf16 on
    the MXU anyway, so building the im2col windows buffer (the dominant
    HBM traffic of every FIR here) directly in bf16 is numerically
    identical to today's compute at half the bytes.  The cast must happen
    before the stack-of-slices: casting the stacked windows afterwards
    materializes BOTH an f32 and a bf16 copy (XLA does not fuse a convert
    into a concatenate's output — verified in optimized HLO).
    CPU/f64 paths keep full precision.
    """
    if x.dtype == jnp.float32 and jax.default_backend() == "tpu":
        return x.astype(jnp.bfloat16)
    return x


def _block_for_stride(stride: int, taps: int) -> int:
    """Outputs per matmul row-block: keep the window span (the contraction
    dim) around <=2048 so padding waste stays bounded for large strides."""
    if stride == 1:
        return 128
    block = (2048 - taps) // stride + 1
    return max(8, min(128, block // 8 * 8))


def _conv1d_valid_matmul(x: jax.Array, h: jax.Array,
                         stride: int = 1) -> jax.Array:
    """VALID 1-D convolution as a dense MXU matmul.

    Outputs are computed in blocks of B: the window spanning one block
    ((B-1)*stride + taps samples) contracts against a banded Toeplitz
    matrix H (B, span) with H[i, i*stride + j] = h_rev[j].  The im2col
    expansion is only span/(B*stride) ~ 2.2x for stride 1, and both matmul
    output dims (outputs x B) are MXU-sized — ~8x faster than XLA's
    feature=1 conv lowering on TPU (measured v5e).
    """
    taps = h.shape[0]
    length = x.shape[-1]
    batch_shape = x.shape[:-1]
    out_dtype = x.dtype
    x = _mxu_input(x)
    h = h.astype(x.dtype)
    m = (length - taps) // stride + 1
    block = _block_for_stride(stride, taps)
    nblk = -(-m // block)
    span = (block - 1) * stride + taps
    need = (nblk - 1) * block * stride + span
    if need > length:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, need - length)])

    # (..., nblk, span) windows; static slices fuse into one gather/copy
    windows = jnp.stack(
        [jax.lax.slice_in_dim(x, s * block * stride,
                              s * block * stride + span, axis=-1)
         for s in range(nblk)], axis=-2)

    h_rev = h[::-1]
    rows = jnp.arange(block)[:, None] * stride + jnp.arange(taps)[None, :]
    h_mat = jnp.zeros((block, span), h.dtype).at[
        jnp.arange(block)[:, None], rows].set(
        jnp.broadcast_to(h_rev, (block, taps)))

    y = jax.lax.dot_general(
        windows, h_mat,
        dimension_numbers=(((windows.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=(out_dtype if out_dtype == jnp.float64
                                else jnp.float32),
    )  # (..., nblk, block)
    y = y.reshape((*batch_shape, nblk * block))[..., :m]
    return y.astype(out_dtype)


def _conv1d_valid(x: jax.Array, h: jax.Array, stride: int = 1,
                  impl: str | None = None) -> jax.Array:
    """VALID 1-D convolution (true convolution: kernel flipped) over the
    last axis, batched over all leading axes.

    impl: 'xla' | 'matmul' | None (auto: matmul on TPU, xla elsewhere).
    """
    if impl is None:
        impl = "matmul" if jax.default_backend() == "tpu" else "xla"
    if impl == "matmul":
        return _conv1d_valid_matmul(x, h, stride)
    return _conv1d_valid_xla(x, h, stride)


def _h_concrete(h):
    """h as float64 numpy, or None if it's a traced value (the fused
    Pallas path bakes taps into the kernel, so it needs concrete h)."""
    if isinstance(h, jax.core.Tracer):
        return None
    try:
        return np.asarray(h, np.float64)
    except Exception:
        return None


def _bank_fast_shape(x, taps: int, stride: int):
    """(flat_batch, n) reshape plan if the fused Pallas kernel applies,
    else None.  TPU-only; CPU/f64/odd shapes keep the XLA paths."""
    if jax.default_backend() != "tpu" or x.dtype != jnp.float32:
        return None
    if x.ndim < 2 or x.shape[-1] % max(stride, 1):
        return None
    from rtsdr_tpu.ops import pallas_fir

    flat = int(np.prod(x.shape[:-1]))
    x2d = x.reshape(flat, x.shape[-1])
    if not pallas_fir.eligible(x2d, taps, stride):
        return None
    return x2d


def _bank_fast(x, h_list, zi, stride: int):
    """Run the fused kernel on the flattened batch; None if ineligible."""
    taps = len(h_list[0])
    x2d = _bank_fast_shape(x, taps, stride)
    if x2d is None:
        return None
    from rtsdr_tpu.ops import pallas_fir

    zi2d = zi.reshape(x2d.shape[0], taps - 1)
    ys, new_zi = pallas_fir.fir_bank_carried(x2d, h_list, zi2d, stride)
    out_shape = x.shape[:-1] + (x.shape[-1] // stride,)
    ys = [y.reshape(out_shape) for y in ys]
    return ys, new_zi.reshape(zi.shape)


def fir_block(x: jax.Array, h, zi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Stateful block FIR: y[n] = sum_k h[k] * xext[n + taps - 1 - k].

    Args:
      x:  (..., N) input block.
      h:  (taps,) impulse response.
      zi: (..., taps-1) previous block's input tail.

    Returns:
      y:      (..., N) filtered block (same alignment as lfilter).
      new_zi: (..., taps-1) this block's input tail.
    """
    if x.dtype == jnp.float32:
        h_np = _h_concrete(h)
        fast = (_bank_fast(x, [h_np], zi, 1)
                if h_np is not None else None)
        if fast is not None:
            return fast[0][0], fast[1]
    h = _as_taps(h, x.dtype)
    xext = jnp.concatenate([zi, x], axis=-1)
    y = _conv1d_valid(xext, h)
    return y, xext[..., -(h.shape[0] - 1):]


def fir_block_bank(x: jax.Array, h_list, zi: jax.Array
                   ) -> tuple[tuple, jax.Array]:
    """``fir_block_multi`` returning a TUPLE of per-filter outputs.

    On the fused Pallas path the F outputs are naturally separate
    arrays; returning them unstacked lets callers that immediately
    unpack (pipeline/receiver.py, pipeline/audio.py) skip a full
    (..., F, N) stack materialization per step."""
    if x.dtype == jnp.float32:
        hs_np = [_h_concrete(h) for h in h_list]
        fast = (_bank_fast(x, hs_np, zi, 1)
                if all(h is not None for h in hs_np) else None)
        if fast is not None:
            return tuple(fast[0]), fast[1]
    y, new_zi = fir_block_multi(x, h_list, zi)
    return tuple(y[..., f, :] for f in range(len(h_list))), new_zi


def fir_block_multi(x: jax.Array, h_list, zi: jax.Array
                    ) -> tuple[jax.Array, jax.Array]:
    """F same-length FIRs over ONE input with ONE shared overlap-save state.

    The stacked banded matmul reads the input windows from HBM once and
    contracts them against all F filter matrices in a single dot — the
    windows buffer (~2.2x the input) dominates FIR cost at IF rate, so
    filtering the demodulated stream through the pilot, stereo-channel and
    RDS-extraction band-passes together costs ~1 filter instead of 3.

    Args:
      x: (..., N); h_list: sequence of (taps,) responses, equal taps.
      zi: (..., taps-1) shared input tail (all filters see the same input).

    Returns:
      y: (..., F, N); new_zi: (..., taps-1).
    """
    taps = {len(h) for h in h_list}
    assert len(taps) == 1, "fir_block_multi requires equal tap counts"
    if x.dtype == jnp.float32:
        hs_np = [_h_concrete(h) for h in h_list]
        fast = (_bank_fast(x, hs_np, zi, 1)
                if all(h is not None for h in hs_np) else None)
        if fast is not None:
            return jnp.stack(fast[0], axis=-2), fast[1]
    hs = jnp.stack([_as_taps(h, x.dtype) for h in h_list])  # (F, taps)
    xext = jnp.concatenate([zi, x], axis=-1)
    new_zi = xext[..., -(hs.shape[-1] - 1):]

    if jax.default_backend() != "tpu":
        y = jnp.stack([_conv1d_valid(xext, hs[f], impl="xla")
                       for f in range(hs.shape[0])], axis=-2)
        return y, new_zi
    return _conv1d_valid_multi_matmul(xext, hs), new_zi


def _conv1d_valid_multi_matmul(xext: jax.Array, hs: jax.Array) -> jax.Array:
    """F-filter VALID convolution as one stacked banded matmul.

    xext: (..., L); hs: (F, taps).  Returns (..., F, L - taps + 1)."""
    n_f, taps = hs.shape
    length = xext.shape[-1]
    batch_shape = xext.shape[:-1]
    out_dtype = xext.dtype
    xext = _mxu_input(xext)
    hs = hs.astype(xext.dtype)
    m = length - taps + 1
    block = 128
    nblk = -(-m // block)
    span = block - 1 + taps
    need = (nblk - 1) * block + span
    if need > length:
        xext = jnp.pad(xext, [(0, 0)] * (xext.ndim - 1)
                       + [(0, need - length)])
    windows = jnp.stack(
        [jax.lax.slice_in_dim(xext, s * block, s * block + span, axis=-1)
         for s in range(nblk)], axis=-2)

    rows = jnp.arange(block)[:, None] + jnp.arange(taps)[None, :]
    h_rev = hs[:, ::-1]
    h_mat = jnp.zeros((n_f, block, span), hs.dtype).at[
        :, jnp.arange(block)[:, None], rows].set(
        jnp.broadcast_to(h_rev[:, None, :], (n_f, block, taps)))
    h_flat = h_mat.reshape(n_f * block, span)

    y = jax.lax.dot_general(
        windows, h_flat,
        dimension_numbers=(((windows.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=(out_dtype if out_dtype == jnp.float64
                                else jnp.float32),
    )  # (..., nblk, F*block)
    y = y.reshape((*batch_shape, nblk, n_f, block))
    y = jnp.moveaxis(y, -2, -3)  # (..., F, nblk, block)
    y = y.reshape((*batch_shape, n_f, nblk * block))[..., :m]
    return y.astype(out_dtype)


def fir_decimate(x: jax.Array, h, zi: jax.Array,
                 decim: int) -> tuple[jax.Array, jax.Array]:
    """Fused FIR + downsample-by-``decim``: computes only the kept outputs.

    Equivalent to ``lfilter(h, 1, x, zi)[::decim]`` (golden model
    model/fmMonoBlock.py:86-105) but never materializes the dropped samples
    (reference C5, src/filter.cpp:126-154).
    """
    if x.dtype == jnp.float32:
        h_np = _h_concrete(h)
        fast = (_bank_fast(x, [h_np], zi, decim)
                if h_np is not None else None)
        if fast is not None:
            return fast[0][0], fast[1]
    h = _as_taps(h, x.dtype)
    xext = jnp.concatenate([zi, x], axis=-1)
    y = _conv1d_valid(xext, h, stride=decim)
    return y, xext[..., -(h.shape[0] - 1):]


def _upsampled_tail_of(x: jax.Array, n_tail: int, up: int) -> jax.Array:
    """Last ``n_tail`` samples of zero-stuff(x, up), without materializing."""
    k = -(-n_tail // up)
    xt = x[..., -k:]
    u = jnp.pad(xt[..., None], [(0, 0)] * xt.ndim + [(0, up - 1)])
    return u.reshape(*xt.shape[:-1], k * up)[..., -n_tail:]


def _resample_boundary_index(t1: int, up: int, down: int
                             ) -> tuple[np.ndarray, np.ndarray]:
    """Index math for the resampler's carried-state boundary matmul.

    The first ceil(t1/down) outputs also read the carried upsampled-
    domain tail: output r takes tap kz = r*down + t1 - j from zi position
    j where valid.  Shared by the XLA path below and the fused Pallas
    kernel (ops/pallas_fir.py::resample_mul2) so the two stay in
    lock-step.  Returns (kz clipped to [0, t1], valid mask), both
    (ceil(t1/down), t1) numpy arrays.
    """
    nb = -(-t1 // down)
    rz = np.arange(nb)[:, None]
    j = np.arange(t1)[None, :]
    kz = rz * down + t1 - j
    valid = (j >= rz * down) & (kz >= 0) & (kz <= t1)
    return np.clip(kz, 0, t1), valid


def _resample_polyphase_matmul(x: jax.Array, h: jax.Array, zi: jax.Array,
                               up: int, down: int) -> tuple[jax.Array, jax.Array]:
    """Rational resampler without the upsampled-domain buffer.

    Exact reformulation of ``y[m] = sum_k h[k] * uext[m*down + taps-1 - k]``
    (uext = [zi | zero-stuff(x, up)]) in the x domain:

        y[m] = sum_i h[m*down + taps-1 - i*up] * x[i]   (+ zi boundary terms)

    Output blocks of B (up | B*down/up alignment) contract x windows against
    a phase-banded matrix H[r, t] = h[r*down + taps-1 - t*up] — the same
    MXU-matmul shape as ``_conv1d_valid_matmul`` but with only the ~taps/up
    genuinely contributing taps per output, so nothing upsampled is ever
    materialized (the u-domain form costs ~600 MB of traffic per RDS block
    batch at 256 channels).
    """
    taps = h.shape[0]
    t1 = taps - 1
    n = x.shape[-1]
    batch = x.shape[:-1]
    assert (n * up) % down == 0
    m_total = n * up // down

    # B: multiple of up so every block starts at phase 0.  Size toward
    # ~128-256 output rows: the dot's N dimension pads to the 128-lane
    # MXU grid, so b=57 (up=57, old 96//up heuristic) wasted 125% of
    # the output tile (57 -> 128) — b=228 pads 12% and quarters the
    # window-slice count (mode-1 RDS x57/250: the measured win feeds
    # the round-5 chain numbers in PERF.md)
    b = up * max(1, 192 // up)
    nblk = -(-m_total // b)
    stride_x = b * down // up
    # output r in a block reads x[i] for (r*down - t1)/up <= i <= r*down/up;
    # the window leads the block's x origin by g = ceil(t1/up) samples
    # (left region j < t1 belongs to zi, handled below; left-pad zeros here)
    g = -(-t1 // up)
    span = (b - 1) * down // up + g + 1
    right_need = (nblk - 1) * stride_x - g + span - n
    xb = _mxu_input(x)
    x_pad = jnp.pad(xb, [(0, 0)] * (x.ndim - 1)
                    + [(g, max(0, right_need))])

    windows = jnp.stack(
        [jax.lax.slice_in_dim(x_pad, s * stride_x, s * stride_x + span,
                              axis=-1) for s in range(nblk)], axis=-2)

    r = np.arange(b)[:, None]
    t = np.arange(span)[None, :]
    k = r * down + g * up - t * up  # h index for x[i = s*stride_x - g + t]
    valid = (k >= 0) & (k <= t1)
    # indices/masks are compile-time numpy; h may be traced
    h_mat = jnp.where(jnp.asarray(valid),
                      h[jnp.asarray(np.clip(k, 0, t1))],
                      0.0).astype(xb.dtype)

    y = jax.lax.dot_general(
        windows, h_mat,
        dimension_numbers=(((windows.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype if x.dtype == jnp.float64 else jnp.float32,
    ).reshape(*batch, nblk * b)[..., :m_total]

    # boundary: the first ceil(t1/down) outputs also read the carried zi
    kz, validz = _resample_boundary_index(t1, up, down)
    nb = kz.shape[0]
    hz = jnp.where(jnp.asarray(validz),
                   h[jnp.asarray(kz)], 0.0).astype(x.dtype)
    y_zi = jax.lax.dot_general(
        zi, hz, dimension_numbers=(((zi.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype if x.dtype == jnp.float64 else jnp.float32)
    y = y.at[..., :nb].add(y_zi.astype(x.dtype))

    new_zi = _upsampled_tail_of(x, t1, up)
    return y, new_zi


def fir_resample(x: jax.Array, h, zi: jax.Array, up: int, down: int,
                 gain: float | None = None) -> tuple[jax.Array, jax.Array]:
    """Fused rational resampler: zero-stuff x``up``, FIR, keep every ``down``-th.

    Matches the golden model's explicit pipeline (model/fmRDSblock.py:184-199):
    upsample by ``up``, anti-image ``lfilter(h, zi)``, ``[::down] * up``.  The
    zero-stuffed signal is never materialized — XLA's ``lhs_dilation`` is the
    polyphase decomposition (only non-zero taps contribute per output phase),
    replacing the reference's hand-strided tap loop (C8,
    src/filter.cpp:235-244).

    ``zi`` lives in the *upsampled* domain: shape (..., taps-1), carrying the
    tail of the zero-stuffed stream, so outputs are bit-identical to the
    golden model's chained lfilter.  ``gain`` defaults to ``up`` (Parseval
    compensation, reference C9 src/filter.cpp:333).
    """
    if gain is None:
        gain = float(up)

    if up == 1:
        # pass h unconverted so fir_decimate's fused fast path (which
        # needs concrete taps) can engage
        y, new_zi = fir_decimate(x, h, zi, down)
        if gain == 1.0:
            return y, new_zi
        return y * jnp.asarray(gain, x.dtype), new_zi

    h = _as_taps(h, x.dtype)
    taps = h.shape[0]
    n = x.shape[-1]
    batch = x.shape[:-1]

    if jax.default_backend() == "tpu":
        y, new_zi = _resample_polyphase_matmul(x, h, zi, up, down)
        return y * jnp.asarray(gain, x.dtype), new_zi

    # Dilated conv computes conv(h, dilate(x)) with output offset such that
    # output position j corresponds to dilated index j.  To carry the
    # overlap-save state exactly, prepend the upsampled-domain tail: the
    # first taps-1 dilated positions must come from zi.  We materialize only
    # the tail region (taps-1 samples), not the whole dilated signal.
    up_len = n * up
    # Dilation of x alone yields length (n-1)*up + 1; the stream semantics
    # pad with up-1 trailing zeros to length n*up.  Handle by appending
    # zeros to x's dilated form via explicit pad on the conv output side:
    # we instead build uext = [zi | dilate_full(x)] with dilate_full length
    # n*up.  conv_general_dilated cannot express the zi prefix plus dilation
    # in one call with exact stream alignment, so compose from two convs:
    #   y[j] = sum_k h[k] uext[j + taps-1 - k]
    # Split uext = [zi (taps-1) | u (n*up)]:
    #   head contribution from zi (dense small conv), body from dilated x.
    # For simplicity and exactness we materialize u only once per call; at
    # production block sizes this buffer is small (<2 MB) and XLA fuses the
    # scatter into the conv input.
    # zero-stuff via pad+reshape (contiguous); a strided scatter
    # (.at[..., ::up].set) costs ~5 ms at production sizes on TPU
    u = jnp.pad(x[..., None], [(0, 0)] * x.ndim + [(0, up - 1)])
    u = u.reshape(*batch, up_len)
    uext = jnp.concatenate([zi, u], axis=-1)
    y = _conv1d_valid(uext, h, stride=down)
    new_zi = uext[..., -(taps - 1):]
    return y * jnp.asarray(gain, x.dtype), new_zi


def resample_zi(num_taps: int, batch_shape: tuple = (),
                dtype=jnp.float32) -> jax.Array:
    """Zero initial state for ``fir_resample`` (upsampled-domain tail)."""
    return jnp.zeros((*batch_shape, num_taps - 1), dtype=dtype)
