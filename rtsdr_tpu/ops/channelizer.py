"""Critically-sampled polyphase filter-bank (PFB) channelizer.

Beyond the reference (which tunes ONE station per dongle pipe,
src/fm_radio.cpp:31-147): split one wideband IQ capture into K
frequency channels, each downconverted to complex baseband and decimated
by K — the K-station front door for the batched receiver.

Math.  Channel k = ``decimate_K(LPF(x[t] * exp(-2j*pi*k*t/K)))`` with a
shared prototype low-pass ``h``.  Substituting n = j*K + p gives the
polyphase form

    y[m, k] = sum_p exp(+2j*pi*k*p/K) * u_p[m]
    u_p[m]  = sum_j h[j*K + p] * x[m*K - p - j*K]

i.e. per-phase FIR over the decimated phase planes followed by a length-K
inverse DFT across phases — ``K * ifft(u, axis=phase)``.  Both pieces are
TPU-shaped: the phase-plane construction is one pad + reshape + flip (no
gathers), the branch FIR is a t-term FMA chain over (M, K) planes, and
the IDFT is a tiny batched FFT.

Streaming: the carried state is the last ``t*K + K - 1`` input samples
(the phase-plane window tail), so chained blocks are exactly equal to one
long call (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtsdr_tpu.ops.coeffs import lowpass_taps


def channelizer_taps(n_channels: int, taps_per_branch: int = 16,
                     cutoff_frac: float = 0.45) -> np.ndarray:
    """Prototype low-pass for a K-channel PFB.

    cutoff = cutoff_frac * (fs / K): 0.45 leaves a guard band between
    adjacent 1/K-wide slots; the per-station RF LPF downstream does the
    tight selectivity.
    """
    k = n_channels
    taps = taps_per_branch * k
    return lowpass_taps(1.0, cutoff_frac / k, taps)


def channelizer_zi(n_channels: int, taps: int, batch_shape: tuple = (),
                   dtype=jnp.complex64) -> jax.Array:
    """Zero initial state: the carried input tail."""
    t = -(-taps // n_channels)  # taps per branch (ceil)
    return jnp.zeros((*batch_shape, t * n_channels + n_channels - 1), dtype)


def pfb_channelize(
    x: jax.Array,
    h,
    zi: jax.Array,
    n_channels: int,
) -> tuple[jax.Array, jax.Array]:
    """Channelize complex x (..., N) -> (..., M, K), M = N/K.

    Output m, k is exactly ``sum_n h[n] x_ext[L + m*K - n] * W(k, n)``
    with W the downconversion twiddle — equal to mix->lfilter->[::K] of
    the concatenated stream (oracle-tested; lfilter alignment: output
    sample m corresponds to input index m*K).
    """
    k = n_channels
    h = jnp.asarray(h)
    taps = h.shape[0]
    t = -(-taps // k)
    if taps < t * k:  # pad the prototype to a whole number of branches
        h = jnp.pad(h, (0, t * k - taps))
    n = x.shape[-1]
    assert n % k == 0, "block length must divide by n_channels"
    m_out = n // k
    batch = x.shape[:-1]
    l_zi = t * k + k - 1
    assert zi.shape[-1] == l_zi

    x_ext = jnp.concatenate([zi.astype(x.dtype), x], axis=-1)
    # Phase planes v[r, p] = x_ext[(r+2)K - 1 - p], one reshape + flip
    # (no gathers).  The base offset K keeps output m on the K-grid of
    # the stream: u[m, p] below reads x_ext[a + (m+t-1)K - n] with
    # a = 2K-1, and stream position = that - len(zi) = m*K - n — exactly
    # lfilter(h, 1, mix(x))[::K] sample m.
    rows = (x_ext.shape[-1] - k) // k
    v = x_ext[..., k:k + rows * k].reshape(*batch, rows, k)[..., ::-1]
    # u[m, p] = sum_j h[jK + p] v[m + t - 1 - j, p]
    h_b = h.reshape(t, k)  # h_b[j, p] = h[jK + p]
    u = jnp.zeros((*batch, m_out, k), x.dtype)
    for j in range(t):
        w = v[..., t - 1 - j: t - 1 - j + m_out, :]
        u = u + w * h_b[j].astype(x.dtype)
    y = k * jnp.fft.ifft(u, axis=-1)

    new_zi = x_ext[..., -l_zi:]
    return y.astype(x.dtype), new_zi.astype(zi.dtype)


def channelizer_zi_u8(n_channels: int, taps: int,
                      batch_shape: tuple = ()) -> jax.Array:
    """Zero initial state for the raw-byte path: value-128 bytes
    (normalize to 0 — equal to the complex path's zero tail)."""
    t = -(-taps // n_channels)
    l_zi = t * n_channels + n_channels - 1
    return jnp.full((*batch_shape, 2 * l_zi), 128, jnp.uint8)


def pfb_channelize_u8(
    raw_u8: jax.Array,
    h,
    zi_raw: jax.Array,
    n_channels: int,
    block: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """K-channel PFB straight from interleaved uint8 IQ bytes.

    The mix + prototype LPF + decimate-by-K for ALL K channels and both
    quadratures is ONE banded matmul over the raw byte stream: the
    length-K inverse DFT across polyphase branches folds into the
    filter matrix (channel k's complex taps are h[n]*exp(2j*pi*n*k/K)),
    and the (b-128)/128 normalization folds into the matrix values, so
    neither a float copy of the wideband stream, nor phase planes, nor
    any complex intermediate ever materializes.  Output-equivalent to
    normalize -> complex -> ``pfb_channelize`` (float32 rounding only;
    the t-term complex FMA chain of that path re-reads its (M, K)
    planes t times — tens of ms per step at production widths on v5e).

    raw_u8: (..., 2*N) interleaved IQ; zi_raw: (..., 2*(t*K + K - 1))
    carried byte tail (prepend-halo streaming; start from
    ``channelizer_zi_u8``).  Returns ((..., K, 2, M) float32 stacked
    I/Q at the channel rate — the receivers' 'iq' frontend input — and
    the new byte tail).
    """
    k = n_channels
    h64 = np.asarray(h, np.float64)
    taps = h64.shape[0]
    t = -(-taps // k)
    if taps < t * k:
        h64 = np.pad(h64, (0, t * k - taps))
    l_zi = t * k + k - 1
    assert zi_raw.shape[-1] == 2 * l_zi
    n = raw_u8.shape[-1] // 2
    assert n % k == 0
    m_out = n // k
    assert m_out % block == 0, "use pfb_channelize for ragged lengths"
    assert t <= block + 1, "window must fit two stride slabs"
    nblk = m_out // block
    batch = raw_u8.shape[:-1]
    span = 2 * k * (block - 1 + t)
    stride = 2 * k * block
    on_tpu = jax.default_backend() == "tpu"

    # right-pad so both slabs reshape exactly (value 128 -> 0, and the
    # pad rows multiply zero filter-matrix entries anyway); folding the
    # pad into the zi concat keeps this to ONE copy of the stream
    need = 2 * k + (nblk + 1) * stride
    pad_n = max(0, need - 2 * l_zi - raw_u8.shape[-1])
    x_ext = jnp.concatenate(
        [zi_raw, raw_u8] + ([jnp.full((*batch, pad_n), 128, jnp.uint8)]
                            if pad_n else []), axis=-1)

    def norm(b):
        if on_tpu:
            return b.astype(jnp.bfloat16) - 128.0
        return (b.astype(jnp.float32) - 128.0) * (1.0 / 128.0)

    # windows[s] = x_ext[2k + s*stride : + span]: span <= 2*stride, so
    # two shifted stride-row slabs cover every window — the per-block
    # stack-of-slices form emits thousands of slice ops at these block
    # counts (nblk ~ 1e4 at production widths) and dominated the step
    def slab(off):
        sl = jax.lax.slice_in_dim(x_ext, off, off + nblk * stride, axis=-1)
        return norm(sl).reshape(*batch, nblk, stride)

    windows = jnp.concatenate(
        [slab(2 * k), slab(2 * k + stride)[..., :span - stride]], axis=-1)

    # H[byte, col(i, ch, quad)]: output i of a block, channel ch, reads
    # x_ext complex idx (i+t)*K - 1 - n_tap (rel. block window) with
    # complex coefficient c = h[n_tap] * exp(2j*pi*n_tap*ch/K):
    #   y_re = sum re(c)*x_re - im(c)*x_im ; y_im = sum im(c)*x_re + re(c)*x_im
    i_idx = np.arange(block)[:, None]
    n_idx = np.arange(t * k)[None, :]
    r_even = 2 * ((i_idx + t) * k - 1 - n_idx)  # (block, t*k) byte rows
    scale = 1.0 / 128.0 if on_tpu else 1.0  # fold normalize on TPU
    h_mat = np.zeros((span, block * k * 2), np.float64)
    for ch in range(k):
        c = h64 * np.exp(2j * np.pi * n_idx[0] * ch / k) * scale
        cr = np.broadcast_to(c.real, r_even.shape)
        ci = np.broadcast_to(c.imag, r_even.shape)
        col_re = np.broadcast_to(ch * 2 * block + i_idx, r_even.shape)
        rs = r_even.ravel()
        h_mat[rs, col_re.ravel()] = cr.ravel()
        h_mat[rs + 1, col_re.ravel()] = -ci.ravel()
        h_mat[rs, col_re.ravel() + block] = ci.ravel()
        h_mat[rs + 1, col_re.ravel() + block] = cr.ravel()
    h_j = jnp.asarray(h_mat, jnp.bfloat16 if on_tpu else jnp.float32)

    y = jax.lax.dot_general(
        windows, h_j,
        dimension_numbers=(((windows.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (..., nblk, K*2*block)
    y = y.reshape(*batch, nblk, k, 2, block)
    y = jnp.moveaxis(y, -4, -2)             # (..., K, 2, nblk, block)
    y = y.reshape(*batch, k, 2, m_out)
    assert n >= l_zi
    return y, raw_u8[..., -2 * l_zi:]


def composed_rf_taps(
    n_channels: int,
    h_proto,
    h_rf,
    decim: int,
    offsets_hz=None,
    fs_ch: float | None = None,
) -> np.ndarray:
    """Compose channelizer slot k + the per-station RF decimating LPF
    into one complex FIR per station, straight at the wideband rate.

    Both stages are LTI decimating FIRs, so the cascade
    ``decimate_10(h_rf * decimate_K(h_ch^(k) * x))`` is EXACTLY one
    decimate-by-``10K`` FIR with taps

        g_k[t] = sum_j h_rf[j] * h_ch^(k)[t - j*K],
        h_ch^(k)[n] = h_ch[n] * exp(2j*pi*k*n/K)

    (i.e. ``conv(upsample_K(h_rf), h_ch^(k))``).  This is the wideband
    analogue of the mono chain's fused uint8 ingest: the reference runs
    its RF front end once per retuned dongle (src/fm_radio.cpp:31-147);
    here ALL K stations' front ends and the channelizer are one filter
    bank — no channel-rate intermediate (at K=16/B=8 production widths
    the two-stage path wrote + re-read + transposed a 157 MB float
    plane; measured 5.6 ms of a 7.5 ms step, tools/profile_channelizer).

    ``offsets_hz`` (length K, off-grid stations): mixing between the
    stages commutes into the composition exactly —
    ``mix(theta) -> h_rf`` equals ``(h_rf[j] * exp(-1j*step*j)) ->
    post-mix exp(1j*theta(decim*p))`` — so the residual NCO moves to
    the IF rate (10x fewer samples); apply the post-mix with
    ``step_k = -2*pi*offsets_hz[k]/fs_ch`` per IF sample times
    ``decim`` (see pipeline/wideband.py).

    Returns (K, L) complex128, L = (len(h_rf)-1)*K + len(h_ch_padded).
    """
    k = n_channels
    h64 = np.asarray(h_proto, np.float64)
    t = -(-len(h64) // k)
    if len(h64) < t * k:
        h64 = np.pad(h64, (0, t * k - len(h64)))
    h_rf = np.asarray(h_rf, np.float64)
    j_idx = np.arange(len(h_rf), dtype=np.float64)
    n_idx = np.arange(t * k, dtype=np.float64)
    g = []
    for ch in range(k):
        h_rf_k = h_rf.astype(np.complex128)
        if offsets_hz is not None and offsets_hz[ch]:
            assert fs_ch is not None
            step = -2.0 * np.pi * float(offsets_hz[ch]) / fs_ch
            h_rf_k = h_rf_k * np.exp(-1j * step * j_idx)
        up = np.zeros(((len(h_rf) - 1) * k + 1), np.complex128)
        up[::k] = h_rf_k
        h_chk = h64 * np.exp(2j * np.pi * n_idx * ch / k)
        g.append(np.convolve(up, h_chk))
    return np.stack(g)


def composed_zi_u8(g_len: int, batch_shape: tuple = ()) -> jax.Array:
    """Zero history for the composed path: value-128 bytes for the last
    L-1 complex wideband samples."""
    return jnp.full((*batch_shape, 2 * (g_len - 1)), 128, jnp.uint8)


def _composed_h_mat(g: np.ndarray, d: int, block: int,
                    scale: float) -> np.ndarray:
    """(span_b, K*2*block) banded byte-domain matrix for the composed
    filter bank: column (ch, quad, i) reads complex window offset
    o = d*i + (L-1) - t for tap t (bijective in t per column)."""
    k, g_l = g.shape
    span_b = 2 * (d * (block - 1) + g_l)
    i_idx = np.arange(block)[:, None]
    t_idx = np.arange(g_l)[None, :]
    o = d * i_idx + (g_l - 1) - t_idx
    h_mat = np.zeros((span_b, block * k * 2), np.float64)
    for ch in range(k):
        c = g[ch] * scale
        cr = np.broadcast_to(c.real, o.shape)
        ci = np.broadcast_to(c.imag, o.shape)
        col_re = np.broadcast_to(ch * 2 * block + i_idx, o.shape)
        rs = 2 * o.ravel()
        h_mat[rs, col_re.ravel()] = cr.ravel()
        h_mat[rs + 1, col_re.ravel()] = -ci.ravel()
        h_mat[rs, col_re.ravel() + block] = ci.ravel()
        h_mat[rs + 1, col_re.ravel() + block] = cr.ravel()
    return h_mat


def _composed_kernel(a_ref, b_ref, h_ref, o_ref, w_ref, *,
                     rowt: int, stride_b: int, n_pieces: int):
    """One (capture, row-tile) step of the composed filter bank.

    Row r of the im2col operand is the byte window starting at
    r*stride_b; consecutive windows overlap by span-stride, so the
    whole (rowt, n_pieces*stride_b) operand assembles from the A-tile
    and its successor tile with SUBLANE ROLLS only (piece p of row r is
    input row r+p):  A_p = where(row < rowt-p, roll(a, -p), roll(b, -p))
    — no gathers, no HBM im2col.  The banded weight stays VMEM-resident
    across the whole grid (constant index map), so the HBM traffic is
    the raw bytes once plus the small IF-rate output: the XLA windows
    formulation instead re-streams its 10 MB weight per M-tile and
    materializes a 155 MB windows buffer (measured 1.65 ms; see
    PERF.md round-5)."""
    a = a_ref[0].astype(jnp.bfloat16) - 128.0
    b = b_ref[0].astype(jnp.bfloat16) - 128.0
    rows = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    for p in range(n_pieces):
        w_ref[:, p * stride_b:(p + 1) * stride_b] = jnp.where(
            rows < rowt - p, pltpu.roll(a, -p, 0), pltpu.roll(b, -p, 0))
    o_ref[0] = jax.lax.dot_general(
        w_ref[...], h_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


_PALLAS_BLOCK = 8      # outputs per im2col row
_PALLAS_ROWT = 256     # im2col rows per grid step (M tile)


def _try_pallas_composed(raw_u8, g, zi_raw, decim, force: bool = False):
    """Route to the Pallas composed kernel; None if ineligible."""
    k, g_l = g.shape
    d = decim * k
    block = _PALLAS_BLOCK
    stride_b = 2 * d * block
    span_b = 2 * (d * (block - 1) + g_l)
    n_pieces = -(-span_b // stride_b)
    n = raw_u8.shape[-1] // 2
    cols = k * 2 * block
    rowt = _PALLAS_ROWT
    ok = (raw_u8.dtype == jnp.uint8
          and n % d == 0 and (n // d) % block == 0
          and stride_b % 128 == 0 and cols % 128 == 0
          and n_pieces <= rowt
          # weight + operand scratch must fit VMEM comfortably
          and n_pieces * stride_b * (rowt + cols) * 2 <= 12 << 20
          and (jax.default_backend() == "tpu" or force))
    if not ok:
        return None
    p_out = n // d
    rows = p_out // block
    rows_padded = -(-rows // rowt) * rowt
    rows_alloc = rows_padded + rowt
    batch = raw_u8.shape[:-1]
    bsz = int(np.prod(batch)) if batch else 1
    r2 = raw_u8.reshape(bsz, -1)
    z2 = zi_raw.reshape(bsz, -1)
    total = rows_alloc * stride_b
    pad_n = total - z2.shape[-1] - r2.shape[-1]
    assert pad_n >= 0
    x_ext = jnp.concatenate(
        [z2, r2, jnp.full((bsz, pad_n), 128, jnp.uint8)], axis=-1
    ).reshape(bsz, rows_alloc, stride_b)

    h_mat = _composed_h_mat(g, d, block, 1.0 / 128.0)
    h_pad = np.zeros((n_pieces * stride_b, cols), np.float64)
    h_pad[:h_mat.shape[0]] = h_mat
    h_j = jnp.asarray(h_pad, jnp.bfloat16)

    y = _pallas_composed(x_ext, h_j, stride_b, n_pieces, rowt)
    y = y[:, :rows].reshape(bsz, rows, k, 2, block)
    y = jnp.moveaxis(y, -4, -2).reshape(*batch, k, 2, p_out)
    return y, raw_u8[..., -2 * (g_l - 1):]


@functools.partial(jax.jit, static_argnums=(2, 3, 4), inline=True)
def _pallas_composed(x_ext, h_j, stride_b: int, n_pieces: int, rowt: int):
    """x_ext: (B, rows_alloc, stride_b) u8 rows (window r = rows r..r+2
    concatenated, trailing tiles are 128-pad); h_j: (n_pieces*stride_b,
    cols) bf16.  Returns (B, rows_padded, cols) f32."""
    bsz, rows_alloc, _ = x_ext.shape
    rows_padded = rows_alloc - rowt
    cols = h_j.shape[1]
    grid = (bsz, rows_padded // rowt)
    kern = functools.partial(_composed_kernel, rowt=rowt,
                             stride_b=stride_b, n_pieces=n_pieces)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rowt, stride_b), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rowt, stride_b), lambda b, j: (b, j + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(h_j.shape, lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rowt, cols), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, rows_padded, cols),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((rowt, n_pieces * stride_b),
                                   jnp.bfloat16)],
        interpret=jax.default_backend() != "tpu",
    )(x_ext, x_ext, h_j)


def composed_channelize_u8(
    raw_u8: jax.Array,
    g: np.ndarray,
    zi_raw: jax.Array,
    decim: int,
    block: int = 16,
    impl: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """K stations' channelizer + RF front-end LPF + decimate in ONE
    banded matmul over the raw wideband bytes.

    ``g``: (K, L) complex taps from ``composed_rf_taps``.  Output p of
    station ch is ``sum_t g[ch, t] * X[decim*K*p - t]`` with X the
    normalized complex stream — bitwise the same recurrence as
    channelize -> ``ops.fir.fir_decimate`` in exact arithmetic (f32/bf16
    rounding only; parity-tested against the two-stage path).

    raw_u8: (..., 2*N) interleaved uint8 at ``fs_w = K*fs``;
    zi_raw: (..., 2*(L-1)) carried byte tail.  Returns
    ((..., K, 2, P) float32 decimated station I/Q at the IF rate,
    P = N/(decim*K), and the new byte tail) — feed receivers built with
    ``frontend_impl='if'``.

    ``impl``: 'auto' takes the Pallas kernel on TPU when the geometry
    fits (in-VMEM im2col via sublane rolls, VMEM-resident weight — see
    ``_composed_kernel``), else the XLA windows+dot; 'pallas' forces
    the kernel (error if ineligible), 'xla' the windows path.
    """
    assert impl in ("auto", "pallas", "xla")
    if impl != "xla":
        out = _try_pallas_composed(raw_u8, g, zi_raw, decim,
                                   force=impl == "pallas")
        if out is not None:
            return out
        if impl == "pallas":
            raise ValueError(
                f"composed impl='pallas' ineligible: shape "
                f"{raw_u8.shape}, K={g.shape[0]}, L={g.shape[1]}, "
                f"decim={decim}")
    k, g_l = g.shape
    d = decim * k                       # complex samples per output
    assert zi_raw.shape[-1] == 2 * (g_l - 1)
    n = raw_u8.shape[-1] // 2
    assert n % d == 0
    p_out = n // d
    assert p_out % block == 0, "P must divide the output block"
    span_c = d * (block - 1) + g_l      # complex window per output block
    stride_b = 2 * d * block
    span_b = 2 * span_c
    n_slabs = -(-span_b // stride_b)
    assert n_slabs <= 3, "window too long for the slab construction"
    nblk = p_out // block
    batch = raw_u8.shape[:-1]
    on_tpu = jax.default_backend() == "tpu"

    need = n_slabs * stride_b + (nblk - 1) * stride_b
    pad_n = max(0, need - (zi_raw.shape[-1] + raw_u8.shape[-1]))
    x_ext = jnp.concatenate(
        [zi_raw, raw_u8] + ([jnp.full((*batch, pad_n), 128, jnp.uint8)]
                            if pad_n else []), axis=-1)

    def norm(b):
        if on_tpu:
            return b.astype(jnp.bfloat16) - 128.0
        return (b.astype(jnp.float32) - 128.0) * (1.0 / 128.0)

    def slab(off):
        sl = jax.lax.slice_in_dim(x_ext, off, off + nblk * stride_b,
                                  axis=-1)
        return norm(sl).reshape(*batch, nblk, stride_b)

    windows = jnp.concatenate(
        [slab(0)] + [slab(i * stride_b)[..., :min(stride_b,
                                                  span_b - i * stride_b)]
                     for i in range(1, n_slabs)], axis=-1)

    # H[byte, col(ch, quad, i)]: output i reads complex window offset
    # o = d*i + (L-1) - t for tap t (bijective in t per column)
    i_idx = np.arange(block)[:, None]
    t_idx = np.arange(g_l)[None, :]
    o = d * i_idx + (g_l - 1) - t_idx          # (block, L) complex rows
    scale = 1.0 / 128.0 if on_tpu else 1.0
    h_mat = np.zeros((span_b, block * k * 2), np.float64)
    for ch in range(k):
        c = g[ch] * scale                       # (L,)
        cr = np.broadcast_to(c.real, o.shape)
        ci = np.broadcast_to(c.imag, o.shape)
        col_re = np.broadcast_to(ch * 2 * block + i_idx, o.shape)
        rs = 2 * o.ravel()
        h_mat[rs, col_re.ravel()] = cr.ravel()
        h_mat[rs + 1, col_re.ravel()] = -ci.ravel()
        h_mat[rs, col_re.ravel() + block] = ci.ravel()
        h_mat[rs + 1, col_re.ravel() + block] = cr.ravel()
    h_j = jnp.asarray(h_mat, jnp.bfloat16 if on_tpu else jnp.float32)

    y = jax.lax.dot_general(
        windows, h_j,
        dimension_numbers=(((windows.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)     # (..., nblk, K*2*block)
    y = y.reshape(*batch, nblk, k, 2, block)
    y = jnp.moveaxis(y, -4, -2)                 # (..., K, 2, nblk, block)
    y = y.reshape(*batch, k, 2, p_out)
    assert n >= g_l - 1
    return y, raw_u8[..., -2 * (g_l - 1):]


def channel_center_freqs(n_channels: int, fs: float) -> np.ndarray:
    """Center frequency of each output channel (Hz), wrapped to +-fs/2."""
    k = np.arange(n_channels)
    f = k * fs / n_channels
    return np.where(f >= fs / 2, f - fs, f)
