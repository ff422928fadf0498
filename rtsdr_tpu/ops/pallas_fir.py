"""Fused-window banded FIR bank as a Pallas TPU kernel.

The XLA banded-matmul FIRs (ops/fir.py) materialize their im2col windows
in HBM (~1.1-2.2x the input per pass, in bf16); at 512 channels the
IF-rate stages each round-trip tens of MB per step.  This kernel builds
the windows in VMEM instead — each grid step reads its input A-block
plus an aligned look-back head block, applies the optional elementwise
pre-op, converts to bf16 (numerically identical to the XLA path: TPU
f32 dots truncate operands to bf16 at default precision), and contracts
against a banded filter matrix resident in VMEM.  F filters over the
same input share one window read (the fir_block_multi trick, without
the HBM windows).

Same overlap-save convention as ops/fir.py: the carried state is the
last taps-1 *input* samples, applied outside as a tiny boundary matmul;
in-kernel, outputs near the left edge see zeros there (the head block's
contribution is masked at j=0).

Reference anchor: this covers the reference's stride-1 band-pass stages
and decimating LPFs (src/filter.cpp:96-185) plus the squaring/mixer
fusions (C10/C11, src/filter.cpp:342-401) via the ``pre`` hook.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fir_kernel(*refs, block: int, n_f: int, pre: str):
    """refs = (x-head, x-A, [x2-head, x2-A,] H, out_0..out_{F-1})."""
    if pre == "mul2":
        ph, pa, qh, qa, h_ref = refs[:5]
        outs = refs[5:]
        hd = ph[...] * qh[...] * 2.0
        aw = pa[...] * qa[...] * 2.0
    else:
        ph, pa, h_ref = refs[:3]
        outs = refs[3:]
        if pre == "square":
            hd = ph[...] * ph[...]
            aw = pa[...] * pa[...]
        else:
            hd = ph[...]
            aw = pa[...]
    j = pl.program_id(1)
    hd = hd * (j > 0).astype(jnp.float32)
    w = jnp.concatenate([hd, aw], axis=-1).astype(jnp.bfloat16)
    o = jax.lax.dot_general(
        w, h_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # (tile_c, n_f*block)
    for f in range(n_f):
        outs[f][...] = o[:, f * block:(f + 1) * block]


def _banded_h(h_list, block: int, stride: int, hw: int) -> np.ndarray:
    """(K, F*block) banded matrix: col f*block+i, row i*stride + k - t1
    + hw holds h_rev[k] (= y[m] = sum_k h[k] x[m*stride + t1 - k])."""
    taps = len(h_list[0])
    t1 = taps - 1
    k_dim = hw + block * stride
    i_idx = np.arange(block)[:, None]
    k_idx = np.arange(taps)[None, :]
    r = stride * i_idx + k_idx - t1 + hw
    h_mat = np.zeros((k_dim, len(h_list) * block), np.float32)
    for f, h in enumerate(h_list):
        h_rev = np.asarray(h, np.float64)[::-1]
        h_b = np.broadcast_to(h_rev, r.shape)
        cols = np.broadcast_to(f * block + i_idx, r.shape)
        h_mat[r.ravel(), cols.ravel()] = h_b.ravel()
    return h_mat


@functools.partial(jax.jit,
                   static_argnums=(3, 4, 5, 6, 7), inline=True)
def _pallas_fir(x, x2, h_mat, stride: int, block: int, tile_c: int,
                hw: int, pre: str):
    c, n = x.shape
    m = n // stride
    nblk = m // block
    a_w = block * stride
    n_f = h_mat.shape[1] // block
    kern = functools.partial(_fir_kernel, block=block, n_f=n_f, pre=pre)
    ratio = a_w // hw

    def head_map(i, j):
        return (i, jnp.maximum(j * ratio - 1, 0))

    def xspecs():
        return [
            pl.BlockSpec((tile_c, hw), head_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, a_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ]

    in_specs = xspecs()
    args = [x, x]
    if pre == "mul2":
        in_specs += xspecs()
        args += [x2, x2]
    in_specs.append(pl.BlockSpec((hw + a_w, n_f * block),
                                 lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(h_mat)
    outs = pl.pallas_call(
        kern,
        grid=(c // tile_c, nblk),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((tile_c, block), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)] * n_f,
        out_shape=[jax.ShapeDtypeStruct((c, m), jnp.float32)] * n_f,
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return outs


def tile_channels(c: int) -> int:
    """Channel (sublane/M) tile for the fused kernels; 0 if no tiling."""
    for t in (128, 64, 32):
        if c % t == 0:
            return t
    return 0


def _bank_block(stride: int, m: int, taps: int, c: int) -> int:
    """Default output-block width for the fused FIR bank.

    Prefer 512 outputs per grid step where measured faster (fewer grid
    steps; the per-step overhead dominates these sub-microsecond dots):
    stride==1 at any channel count (1024 ch: 0.43 vs 0.66 ms, neutral at
    128-512), decimating banks only at >=1024 channels (1024 ch: 0.27 vs
    0.40 ms; at 512 ch the narrow 128 block is fastest) — falling back
    through the candidates until one divides the output length and is
    hw-aligned (mode-1's if_len=16000 matches none and keeps the XLA
    path, as before)."""
    hw = -(-(taps - 1) // 128) * 128
    cands = ((512, 256) if stride == 1
             else (512, 256, 128) if c >= 1024 else (128,))
    for b in cands:
        if m % b == 0 and (b * stride) % hw == 0 and (b * stride) % 128 == 0:
            return b
    if stride == 1:
        # no candidate divides m: the bank is stateless, so the caller
        # right-pads the input to the next block multiple and slices
        # the outputs (mode-1's if_len=16000 lands here — it used to
        # fall all the way back to the XLA windows, 1.05 vs ~0.3 ms at
        # 512 ch).  Prefer the wide 512 block when it is hw-aligned.
        for b in (512, 256, 2 * hw):
            if b % hw == 0 and b % 128 == 0:
                return b
    return 256 if stride == 1 else 128


def eligible(x, taps: int, stride: int, block: int | None = None) -> bool:
    """Shapes the fused kernel handles; callers fall back to XLA else."""
    if x.ndim != 2 or x.dtype != jnp.float32 or taps < 2:
        return False
    c, n = x.shape
    if not tile_channels(c) or n % stride:
        return False
    m = n // stride
    block = block or _bank_block(stride, m, taps, c)
    a_w = block * stride
    hw = -(-(taps - 1) // 128) * 128
    if stride == 1 and m % block:
        # stride-1 banks are stateless: fir_bank_carried right-pads to
        # the next block multiple and slices, so only alignment gates
        return block % hw == 0 and block % 128 == 0
    return m % block == 0 and a_w % hw == 0 and a_w % 128 == 0


def fir_bank_carried(x, h_list, zi, stride: int = 1, x2=None,
                     pre: str = "none") -> tuple[list[jax.Array], jax.Array]:
    """``fir_block``/``fir_decimate`` semantics on the fused kernel.

    y[f][m] = sum_k h_f[k] * xext[m*stride + taps-1 - k], xext = [zi | x']
    (x' = pre-op of x), per filter; returns (ys, new_zi).  The zero-state
    part runs in-kernel; the carried tail enters via a tiny boundary
    matmul over the first ceil((taps-1)/stride) outputs (same scheme as
    ops/ingestfir.py).  The boundary dot runs in f32 (the XLA path
    truncates the carried tail to bf16 inside the windows; this is
    slightly tighter, inside every parity tolerance).
    """
    taps = len(h_list[0])
    t1 = taps - 1
    xt = x[..., -t1:]
    if pre == "square":
        tail = xt * xt
    elif pre == "mul2":
        tail = 2.0 * xt * x2[..., -t1:]
    else:
        tail = xt
    m = x.shape[-1] // max(stride, 1)
    pad = 0
    if stride == 1:
        blk = _bank_block(1, m, taps, x.shape[0])
        pad = -(-m // blk) * blk - m
        if pad:
            # stateless zero-state convolution: right-pad to the block
            # grid, slice the garbage tail off below (the carried tail
            # above already came from the REAL x)
            padw = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
            x = jnp.pad(x, padw)
            if x2 is not None:
                x2 = jnp.pad(x2, padw)
    ys = list(fir_bank(x, h_list, stride, x2=x2, pre=pre))
    if pad:
        ys = [y[..., :m] for y in ys]
    nb = -(-t1 // stride)
    mz = np.arange(nb)[:, None]
    p = np.arange(t1)[None, :]
    kz = t1 - p + mz * stride
    validz = (kz >= 1) & (kz <= t1) & (p >= mz * stride)
    for f, h in enumerate(h_list):
        h64 = np.asarray(h, np.float64)
        hz = jnp.asarray(np.where(validz, h64[np.clip(kz, 0, t1)], 0.0),
                         jnp.float32)
        b = jax.lax.dot_general(
            zi, hz, dimension_numbers=(((zi.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ys[f] = ys[f].at[..., :nb].add(b)
    return ys, tail


def fir_block_pre(x, h, zi, pre: str, x2=None
                  ) -> tuple[jax.Array, jax.Array]:
    """``fir_block`` over an elementwise pre-op of x, pre-op fused
    in-kernel when the shapes allow (the reference's C10 squaring+FIR /
    C11 mixer+FIR fusions, src/filter.cpp:342-401); otherwise falls back
    to the XLA path on the materialized signal."""
    taps = len(h)
    if (jax.default_backend() == "tpu" and x.ndim == 2
            and x.dtype == jnp.float32 and eligible(x, taps, 1)):
        ys, new_zi = fir_bank_carried(x, [h], zi, 1, x2=x2, pre=pre)
        return ys[0], new_zi
    from rtsdr_tpu.ops.fir import fir_block

    xp = x * x if pre == "square" else 2.0 * x * x2
    return fir_block(xp, h, zi)


def _resample_geom(n: int, up: int, down: int, t1: int,
                   block: int | None = None, hw: int | None = None,
                   max_h_bytes: int = 4 << 20):
    """Search an output-block geometry for the fused polyphase kernel.

    Returns (b, a_w, hw) — b outputs per grid step (multiple of ``up`` so
    every block starts at phase 0), a_w = b*down/up input samples advanced
    per step (must be lane-aligned), hw = look-back head width (lane-
    aligned divisor of a_w covering the g = ceil(t1/up) x-domain taps).
    None if no geometry fits (caller falls back to the XLA path).
    """
    if (n * up) % down:
        return None
    m = n * up // down
    g = -(-t1 // up)
    cands = ([block] if block else
             [up * k for k in (4, 8, 12, 16, 24, 32, 48, 64)])
    best = None
    for b in cands:
        if b % up or m % b or (b * down) % up:
            continue
        a_w = b * down // up
        if a_w % 128 or n % a_w:
            continue
        span = (b - 1) * down // up + g + 1
        bp = -(-b // 128) * 128  # output blocks are lane-padded
        hws = [hw] if hw else [h for h in range(128, a_w + 1, 128)]
        for h_w in hws:
            if h_w < g or a_w % h_w or span > h_w + a_w:
                continue
            if (h_w + a_w) * bp * 2 > max_h_bytes:
                continue
            # total MXU work ~ nblk * K * padded-out-width, plus a
            # per-grid-step overhead term: these dots are ~1 us of MXU
            # work each, so step count matters as much as FLOPs.  Re-
            # checked round 4 for the stacked-branch kernel with the
            # interleaved-min duel (tools/profile_resample.py): block
            # 608 ranks at or above 304 across quiet and busy windows
            # (e.g. 0.63 vs 0.69 ms / 0.90 vs 1.01 ms at 1024 ch), so
            # the 1<<20 overhead weight that selects it stays.
            cost = (m // b) * ((h_w + a_w) * bp + (1 << 20))
            if best is None or cost < best[0]:
                best = (cost, b, a_w, h_w)
    return best[1:] if best else None


def _resample_h(h: np.ndarray, up: int, down: int, b: int, hw: int,
                a_w: int, gain: float) -> np.ndarray:
    """Phase-banded filter matrix in kernel window coordinates.

    Window position p maps to x index i = j*a_w - hw + p; output column r
    (absolute output m = j*b + r) reads tap k = m*down - i*up = r*down +
    hw*up - p*up — the j terms cancel because b*down = a_w*up, so one
    matrix serves every grid step.  ``gain`` (Parseval) folds in here."""
    t1 = len(h) - 1
    bp = -(-b // 128) * 128
    p = np.arange(hw + a_w)[:, None]
    r = np.arange(bp)[None, :]
    k = r * down + hw * up - p * up
    valid = (k >= 0) & (k <= t1) & (r < b)  # columns >= b are lane padding
    h64 = np.asarray(h, np.float64) * gain
    return np.where(valid, h64[np.clip(k, 0, t1)], 0.0).astype(np.float32)


def _mix_resample_core(eh, ea, ih, ia, qh, qa, h_ref, w_ref,
                       tile_c: int, hw: int):
    """Shared core of the fused mixer+resampler kernels: one
    (channel-tile, output-block) step returning the (2*tile_c, bp) f32
    resampler output, I/Q branches stacked on sublanes.

    Builds the two mixed IF-rate streams (2*extract*nco_i/q) directly in
    VMEM from their head/A input blocks, truncates to bf16 (numerically
    identical to the XLA path's windows: TPU f32 dots truncate operands
    anyway) and contracts both in ONE dot against the phase-banded matrix,
    the branches stacked on the sublane axis of a bf16 scratch so the
    (2*tile_c, K) operand fills all 128 MXU rows (at the production
    tile_c=64 the previous per-branch split dots ran the MXU half-empty:
    one stacked dot measures 0.86 vs 1.14 ms at 1024 ch / block 304 —
    round-4 A/B, tools/profile_resample.py; the round-3 hypothesis that
    per-step VMEM copies dominated is retired by the same probe).
    The head block's contribution is masked at j=0 where it is
    semantically the left zero-pad."""
    j = pl.program_id(1)
    mask = (j > 0).astype(jnp.float32)
    e_h2 = eh[...] * (2.0 * mask)
    e_a2 = ea[...] * 2.0
    w_ref[:tile_c, :hw] = (e_h2 * ih[...]).astype(jnp.bfloat16)
    w_ref[:tile_c, hw:] = (e_a2 * ia[...]).astype(jnp.bfloat16)
    w_ref[tile_c:, :hw] = (e_h2 * qh[...]).astype(jnp.bfloat16)
    w_ref[tile_c:, hw:] = (e_a2 * qa[...]).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        w_ref[...], h_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _resample_mix_kernel(eh, ea, ih, ia, qh, qa, h_ref, yi, yq, w_ref,
                         *, tile_c: int, hw: int):
    o = _mix_resample_core(eh, ea, ih, ia, qh, qa, h_ref, w_ref,
                           tile_c, hw)
    yi[...] = o[:tile_c]
    yq[...] = o[tile_c:]


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7), inline=True)
def _pallas_resample_mix(e, ni, nq, h_mat, b: int, a_w: int, tile_c: int,
                         hw: int):
    """Returns lane-padded outputs (c, nblk*bp); the wrapper strips the
    bp-b zero columns per block (Mosaic requires 128-divisible output
    block lanes; b is a multiple of ``up`` instead)."""
    c, n = e.shape
    m = n * b // a_w
    nblk = m // b
    bp = -(-b // 128) * 128
    ratio = a_w // hw

    def head_map(i, j):
        return (i, jnp.maximum(j * ratio - 1, 0))

    def a_map(i, j):
        return (i, j)

    def specs():
        return [
            pl.BlockSpec((tile_c, hw), head_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, a_w), a_map, memory_space=pltpu.VMEM),
        ]

    in_specs = specs() + specs() + specs()
    in_specs.append(pl.BlockSpec((hw + a_w, bp), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_resample_mix_kernel, tile_c=tile_c, hw=hw),
        grid=(c // tile_c, nblk),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((tile_c, bp), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((c, nblk * bp), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((2 * tile_c, hw + a_w), jnp.bfloat16)],
        interpret=jax.default_backend() != "tpu",
    )(e, e, ni, ni, nq, nq, h_mat)
    if bp == b:
        return outs
    return [o.reshape(c, nblk, bp)[..., :b].reshape(c, m) for o in outs]


def resample_mul2(extract, nco_i, nco_q, h, zi, up: int, down: int,
                  gain: float | None = None, block: int | None = None,
                  hw: int | None = None, tile: int | None = None,
                  impl: str = "auto") -> tuple[jax.Array, jax.Array]:
    """Fused RDS mixer + rational resampler: the C11 mixer (2*x*nco,
    src/filter.cpp:373-401) and the C8/C9 polyphase resampler
    (src/filter.cpp:301-339) in one Pallas pass.

    Equivalent to ``fir_resample(2*extract*stack([nco_i, nco_q]), h, zi,
    up, down)`` but the (..., 2, N) mixed IF-rate buffer and the im2col
    windows never touch HBM — both live in VMEM per grid step.  The
    carried upsampled-domain tail enters via the same boundary matmul as
    ``ops.fir._resample_polyphase_matmul``; ``new_zi`` is the upsampled
    tail of the mixed stream, computed from the last ceil(t1/up) input
    samples only.

    Falls back to the materialized-mixer XLA path off-TPU / for
    geometries the kernel does not fit (e.g. MODE1_RDS's x57/250, whose
    phase-banded matrix exceeds VMEM).
    """
    from rtsdr_tpu.ops.fir import fir_resample

    if gain is None:
        gain = float(up)
    h_np = None
    if not isinstance(h, jax.core.Tracer):
        try:
            h_np = np.asarray(h, np.float64)
        except Exception:
            h_np = None
    taps = len(h) if h_np is None else h_np.shape[0]
    t1 = taps - 1
    n = extract.shape[-1]
    batch = extract.shape[:-1]
    flat = int(np.prod(batch)) if batch else 1
    geom = (_resample_geom(n, up, down, t1, block, hw)
            if h_np is not None else None)
    ok = (extract.dtype == jnp.float32 and geom is not None
          and tile_channels(flat) and extract.ndim >= 2
          and (jax.default_backend() == "tpu" or impl == "pallas"))
    if impl == "pallas" and not ok:
        # explicit request: fail loudly instead of silently demoting
        # (same contract as timeshard's ingest_impl='fused')
        raise ValueError(
            f"resample_mul2 impl='pallas' ineligible: n={n} up={up} "
            f"down={down} taps={taps} flat_batch={flat} "
            f"dtype={extract.dtype} geom={geom}")
    if impl == "xla" or not ok:
        mixed = 2.0 * extract[..., None, :] * jnp.stack(
            [nco_i, nco_q], axis=-2)
        return fir_resample(mixed, h, zi, up, down, gain=gain)

    b, a_w, h_w = geom
    # narrower channel tiles win HERE (opposite of the FIR banks): the
    # per-step mixed-window build + wide-K dot overlap better with the
    # input DMA at 64 rows (same-process A/B at 1024 ch, block 608:
    # tile 64 -> 1.28 ms vs tile 128 -> 1.5; 256 exceeds VMEM)
    tile_c = tile or (64 if flat % 64 == 0 else tile_channels(flat))
    assert flat % tile_c == 0, (
        f"channel tile {tile_c} must divide the flattened batch {flat}")
    h_mat = jnp.asarray(_resample_h(h_np, up, down, b, h_w, a_w, gain),
                        jnp.bfloat16)
    e2 = extract.reshape(flat, n)
    yi, yq = _pallas_resample_mix(e2, nco_i.reshape(flat, n),
                                  nco_q.reshape(flat, n), h_mat, b, a_w,
                                  tile_c, h_w)
    m = n * up // down
    y = jnp.stack([yi, yq], axis=-2).reshape(*batch, 2, m)

    # boundary: the first ceil(t1/down) outputs also read the carried zi
    # (upsampled domain) — shared index math with the XLA path
    from rtsdr_tpu.ops.fir import _resample_boundary_index

    kz, validz = _resample_boundary_index(t1, up, down)
    hz = jnp.asarray(
        np.where(validz, (h_np * gain)[kz], 0.0), jnp.float32)
    y_zi = jax.lax.dot_general(
        zi, hz, dimension_numbers=(((zi.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y.at[..., :kz.shape[0]].add(y_zi)

    new_zi = resample_mul2_tail(extract, nco_i, nco_q, t1, up)
    return y, new_zi


def _resample_mix_rrc_kernel(*refs, tile_c: int, hw: int, hw2: int,
                             bp: int, b: int, tw: int):
    """Mixer + resampler + RRC matched filter, one grid step.

    The first dot is `_mix_resample_core`.  Its (2*tile_c, bp) f32
    result is then truncated to bf16 into the A-half of a persistent
    rolling scratch whose head half holds the tail of the PREVIOUS output
    block (grid iterates j fastest, so consecutive steps are consecutive
    output blocks of one channel tile), and a second dot against a banded
    RRC matrix emits the matched-filter output.  The head half is zeroed
    at j=0 — there the look-back is semantically the rrc_zi carry,
    applied outside in f32 (same boundary-matmul scheme as the
    resampler's own zi).  Replaces the separate XLA RRC pass over the
    (c, 2, m) HBM intermediate (reference chain: src/fm_radio.cpp:
    408-411, resample then RRC as two block convolutions).

    ``tw > 0``: the resampler stream never leaves VMEM — only its last
    ``tw`` valid columns (the next block's rrc_zi carry, f32) are
    emitted via a constant-index tail output whose last grid step's
    write wins.  ``tw == 0`` keeps full yi/yq outputs (geometries with
    b < the tail width, where the carry spans output blocks)."""
    (eh, ea, ih, ia, qh, qa, h_ref, h2_ref) = refs[:8]
    if tw:
        ty, ri, rq = refs[8:11]
        w_ref, w2_ref = refs[11:13]
    else:
        yi, yq, ri, rq = refs[8:12]
        w_ref, w2_ref = refs[12:14]
    o = _mix_resample_core(eh, ea, ih, ia, qh, qa, h_ref, w_ref,
                           tile_c, hw)
    if tw:
        ty[...] = o[:, b - tw:b]
    else:
        yi[...] = o[:tile_c]
        yq[...] = o[tile_c:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        w2_ref[:, :hw2] = jnp.zeros((2 * tile_c, hw2), jnp.bfloat16)

    w2_ref[:, hw2:] = o.astype(jnp.bfloat16)
    r2 = jax.lax.dot_general(
        w2_ref[...], h2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ri[...] = r2[:tile_c]
    rq[...] = r2[tile_c:]
    # roll: keep the last hw2 lanes of this block for the next step
    w2_ref[:, :hw2] = w2_ref[:, bp:]


def _rrc_banded(rrc_h: np.ndarray, b: int, bp: int, hw2: int) -> np.ndarray:
    """(hw2 + bp, bp) banded matrix for the in-kernel RRC dot.

    Scratch lane p < hw2 holds previous-block output column (bp-hw2)+p;
    lane hw2+p holds current column p.  Output column r of block j is
    rrc[j*b + r] = sum_k rrc_h[k] * y[j*b + r - k]."""
    t1r = len(rrc_h) - 1
    h64 = np.asarray(rrc_h, np.float64)
    m2 = np.zeros((hw2 + bp, bp), np.float64)
    p = np.arange(hw2)[:, None]
    r = np.arange(bp)[None, :]
    k = b + r - (bp - hw2) - p          # previous block half
    valid = (k >= 1) & (k <= t1r) & ((bp - hw2) + p < b) & (r < b)
    m2[:hw2] = np.where(valid, h64[np.clip(k, 0, t1r)], 0.0)
    p = np.arange(bp)[:, None]
    k = r - p                            # current block half
    valid = (k >= 0) & (k <= t1r) & (p < b) & (r < b)
    m2[hw2:] = np.where(valid, h64[np.clip(k, 0, t1r)], 0.0)
    return m2.astype(np.float32)


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10),
                   inline=True)
def _pallas_resample_mix_rrc(e, ni, nq, h_mat, h2_mat, b: int, a_w: int,
                             tile_c: int, hw: int, hw2: int, tw: int):
    """Returns (y_tail | yi, yq, ri, rq): with tw > 0, y_tail is the
    (2*c, tw) stacked-branch resampler tail (rows [2*tc*i, 2*tc*i+tc) =
    I of channel tile i) and the full resampler stream never reaches
    HBM; with tw == 0, full yi/yq come back (small-b geometries)."""
    c, n = e.shape
    m = n * b // a_w
    nblk = m // b
    bp = -(-b // 128) * 128
    ratio = a_w // hw

    def head_map(i, j):
        return (i, jnp.maximum(j * ratio - 1, 0))

    def specs():
        return [
            pl.BlockSpec((tile_c, hw), head_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, a_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ]

    in_specs = specs() + specs() + specs()
    in_specs.append(pl.BlockSpec((hw + a_w, bp), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((hw2 + bp, bp), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM))
    rrc_specs = [pl.BlockSpec((tile_c, bp), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)] * 2
    rrc_shape = [jax.ShapeDtypeStruct((c, nblk * bp), jnp.float32)] * 2
    if tw:
        out_specs = [pl.BlockSpec((2 * tile_c, tw), lambda i, j: (i, 0),
                                  memory_space=pltpu.VMEM)] + rrc_specs
        out_shape = [jax.ShapeDtypeStruct((2 * c, tw), jnp.float32)
                     ] + rrc_shape
    else:
        out_specs = rrc_specs[:1] * 2 + rrc_specs
        out_shape = rrc_shape + rrc_shape
    outs = pl.pallas_call(
        functools.partial(_resample_mix_rrc_kernel, tile_c=tile_c, hw=hw,
                          hw2=hw2, bp=bp, b=b, tw=tw),
        grid=(c // tile_c, nblk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2 * tile_c, hw + a_w), jnp.bfloat16),
                        pltpu.VMEM((2 * tile_c, hw2 + bp), jnp.bfloat16)],
        interpret=jax.default_backend() != "tpu",
    )(e, e, ni, ni, nq, nq, h_mat, h2_mat)
    if tw:
        ty = outs[0].reshape(c // tile_c, 2, tile_c, tw)
        yi = ty[:, 0].reshape(c, tw)
        yq = ty[:, 1].reshape(c, tw)
        rest = outs[1:]
    else:
        yi, yq = outs[:2]
        rest = outs[2:]
    if bp != b:
        rest = [o.reshape(c, nblk, bp)[..., :b].reshape(c, m)
                for o in rest]
        if not tw:
            yi = yi.reshape(c, nblk, bp)[..., :b].reshape(c, m)
            yq = yq.reshape(c, nblk, bp)[..., :b].reshape(c, m)
    return yi, yq, rest[0], rest[1]


def resample_mul2_rrc(extract, nco_i, nco_q, h, zi, rrc_h, rrc_zi,
                      up: int, down: int, gain: float | None = None,
                      impl: str = "auto"
                      ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """``resample_mul2`` with the RRC matched filter fused in-kernel.

    Semantics: ``resamp, new_zi = resample_mul2(...)`` followed by
    ``rrc, new_rrc_zi = fir_block(resamp, rrc_h, rrc_zi)`` — the
    reference's back-to-back resampler + RRC block convolutions
    (src/fm_radio.cpp:408-411) — returning (rrc, new_zi, new_rrc_zi).
    On the fused path the (c, 2, m) resampler stream never leaves VMEM:
    each grid step's resampler output block feeds a second banded dot
    against the RRC matrix, with the previous block's tail carried in a
    persistent scratch.  The carried states enter outside in f32:
    rrc_zi through a triangular boundary matmul on the first taps-1
    outputs, and the resampler's own zi boundary correction propagated
    through the RRC by a second small matmul (linearity).  Falls back to
    the unfused pair off-TPU or for ineligible geometries (e.g.
    MODE1_RDS); the fallback is bitwise the unfused composition.
    """
    from rtsdr_tpu.ops.fir import _resample_boundary_index

    if gain is None:
        gain = float(up)
    h_np = None
    if not isinstance(h, jax.core.Tracer):
        try:
            h_np = np.asarray(h, np.float64)
        except Exception:
            h_np = None
    rrc_np = None
    if not isinstance(rrc_h, jax.core.Tracer):
        try:
            rrc_np = np.asarray(rrc_h, np.float64)
        except Exception:
            rrc_np = None
    taps = len(h) if h_np is None else h_np.shape[0]
    t1 = taps - 1
    t1r = len(rrc_h) - 1
    n = extract.shape[-1]
    batch = extract.shape[:-1]
    flat = int(np.prod(batch)) if batch else 1
    geom = (_resample_geom(n, up, down, t1)
            if h_np is not None and rrc_np is not None else None)
    ok = (extract.dtype == jnp.float32 and geom is not None
          and tile_channels(flat) and extract.ndim >= 2
          and (jax.default_backend() == "tpu" or impl == "pallas"))
    if ok:
        b, a_w, h_w = geom
        bp = -(-b // 128) * 128
        hw2 = -(-(bp - b + t1r) // 128) * 128
        m = n * up // down
        kz38 = -(-t1 // down)
        ok = (t1r < b and hw2 <= bp and m >= kz38 + t1r
              and rrc_zi.shape[-1] == t1r)
    if impl == "pallas" and not ok:
        raise ValueError(
            f"resample_mul2_rrc impl='pallas' ineligible: n={n} up={up} "
            f"down={down} taps={taps} rrc_taps={t1r + 1} "
            f"flat_batch={flat} dtype={extract.dtype} geom={geom}")
    if impl == "xla" or not ok:
        from rtsdr_tpu.ops.fir import fir_block

        resamp, new_zi = resample_mul2(extract, nco_i, nco_q, h, zi,
                                       up, down, gain=gain, impl=impl)
        rrc, new_rrc_zi = fir_block(resamp, rrc_h, rrc_zi)
        return rrc, new_zi, new_rrc_zi

    tile_c = 64 if flat % 64 == 0 else tile_channels(flat)
    h_mat = jnp.asarray(_resample_h(h_np, up, down, b, h_w, a_w, gain),
                        jnp.bfloat16)
    h2_mat = jnp.asarray(_rrc_banded(rrc_np, b, bp, hw2), jnp.bfloat16)
    e2 = extract.reshape(flat, n)
    # tail-only resampler output where one block covers the rrc carry:
    # the full (c, 2, m) stream then never reaches HBM (saves its write;
    # the only consumer outside the kernel is the last t1r columns)
    tw = -(-t1r // 128) * 128
    if tw > b:
        tw = 0
    yi, yq, ri, rq = _pallas_resample_mix_rrc(
        e2, nco_i.reshape(flat, n), nco_q.reshape(flat, n), h_mat, h2_mat,
        b, a_w, tile_c, h_w, hw2, tw)
    rrc = jnp.stack([ri, rq], axis=-2).reshape(*batch, 2, m)

    # resampler zi boundary (same as resample_mul2) ...
    kz, validz = _resample_boundary_index(t1, up, down)
    hz = jnp.asarray(np.where(validz, (h_np * gain)[kz], 0.0), jnp.float32)
    c38 = jax.lax.dot_general(
        zi, hz, dimension_numbers=(((zi.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # the resampler tail (-> next block's rrc_zi) is far from the zi
    # boundary (m >= kz38 + t1r checked above), so it needs no correction
    tail_w = tw if tw else m
    y_tail = jnp.stack([yi, yq], axis=-2).reshape(*batch, 2, tail_w)
    new_rrc_zi = y_tail[..., -t1r:]

    # ... its effect propagated through the RRC by linearity
    i_idx = np.arange(kz.shape[0])[:, None]
    mm = np.arange(kz.shape[0] + t1r)[None, :]
    km = mm - i_idx
    m38 = jnp.asarray(np.where((km >= 0) & (km <= t1r),
                               rrc_np[np.clip(km, 0, t1r)], 0.0),
                      jnp.float32)
    rrc_c = jax.lax.dot_general(
        c38, m38, dimension_numbers=(((c38.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # rrc_zi boundary: first t1r outputs read the carried RRC tail
    ii = np.arange(t1r)[:, None]
    mt = np.arange(t1r)[None, :]
    kt = t1r + mt - ii
    tri = jnp.asarray(np.where((kt >= 1) & (kt <= t1r) & (ii >= mt),
                               rrc_np[np.clip(kt, 0, t1r)], 0.0),
                      jnp.float32)
    rrc_z = jax.lax.dot_general(
        rrc_zi, tri, dimension_numbers=(((rrc_zi.ndim - 1,), (0,)),
                                        ((), ())),
        preferred_element_type=jnp.float32)
    rrc = rrc.at[..., :t1r].add(rrc_z)
    rrc = rrc.at[..., :kz.shape[0] + t1r].add(rrc_c)

    new_zi = resample_mul2_tail(extract, nco_i, nco_q, t1, up)
    return rrc, new_zi, new_rrc_zi


def resample_mul2_tail(extract, nco_i, nco_q, t1: int, up: int) -> jax.Array:
    """The upsampled-domain carry ``resample_mul2`` returns as ``new_zi``:
    the zero-stuffed tail of the mixed stream, from the last ceil(t1/up)
    input samples only.  Exposed so the time-sharded receiver's halo (the
    left neighbor's carry, ppermuted) is definitionally the same value."""
    from rtsdr_tpu.ops.fir import _upsampled_tail_of

    kt = -(-t1 // up)
    tail = 2.0 * extract[..., None, -kt:] * jnp.stack(
        [nco_i[..., -kt:], nco_q[..., -kt:]], axis=-2)
    return _upsampled_tail_of(tail, t1, up)


def fir_bank(x, h_list, stride: int = 1, x2=None, pre: str = "none",
             block: int | None = None,
             tile: int | None = None) -> list[jax.Array]:
    """F same-length filters over one (c, n) f32 input, fused windows.

    Returns F arrays (c, n//stride); zero-state convolution (the caller
    adds the overlap-save boundary term).  ``pre`` applies elementwise
    before filtering: "square" -> x*x, "mul2" -> 2*x*x2.  ``block``/
    ``tile`` override the output-block / channel-tile geometry (A/B
    probes; defaults are the production choices).
    """
    taps = len(h_list[0])
    assert all(len(h) == taps for h in h_list)
    c, n = x.shape
    block = block or _bank_block(stride, n // stride, taps, c)
    hw = -(-(taps - 1) // 128) * 128
    h_mat = jnp.asarray(_banded_h(h_list, block, stride, hw),
                        jnp.bfloat16)
    # wider channel tiles pair with the wider blocks (fewer grid steps;
    # measured with the 512-block sweeps) — bank-only, the ingest kernel
    # keeps its own tuned tiling.  The mul2 banks carry TWO extra input
    # streams (x2 head+A), so tile 256 overruns the 16 MB scoped-VMEM
    # limit at 1024 ch / block 512 (measured: 16.12M, a 128 KB cliff) —
    # they stay at the 128 tile.
    tile = tile or (256 if c % 256 == 0 and block >= 512 and x2 is None
                    else tile_channels(c))
    return _pallas_fir(x, x if x2 is None else x2, h_mat, stride, block,
                       tile, hw, pre)
