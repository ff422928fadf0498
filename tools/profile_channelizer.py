"""Channelizer cost split: windows build vs dot vs output transpose.

The wideband profile (tools/profile_wideband.py) pins 5.6 of the 7.5 ms
step on `pfb_channelize_u8`.  This probes variants to locate the cost:

  v0   current kernel (windows bf16, dot, reshape+moveaxis to (K,2,M))
  v1   no final transpose (dot output left (nblk, K*2*block))
  v2   windows left as raw-order dot, transpose done in bf16
  v3   lax.conv_general_dilated formulation (XLA's own im2col/lowering),
       features = K*2, stride 2K, which emits (B, K*2, M) directly

Run on TPU:  python tools/profile_channelizer.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rtsdr_tpu.config import MODE0  # noqa: E402
from rtsdr_tpu.ops.channelizer import (  # noqa: E402
    channelizer_taps,
    channelizer_zi_u8,
    pfb_channelize_u8,
)

K, B = 16, 8


def timer(fn, arg, reps=6, k1=3, k2=13):
    def run(n):
        y = arg
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(y)
            y = arg
        # host readback, not block_until_ready: the axon tunnel's
        # block_until_ready intermittently acks before execution
        # finishes, and min-of-reps amplifies that into garbage
        float(jnp.sum(out.ravel()[:1]))
        return time.perf_counter() - t0

    run(k1)
    run(k2)
    t1 = min(run(k1) for _ in range(reps))
    t2 = min(run(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1)


def main():
    cfg = MODE0
    rng = np.random.default_rng(0)
    wbs = K * cfg.block_size
    raw = jax.device_put(rng.integers(0, 256, (B, wbs), dtype=np.uint8))
    h = np.asarray(channelizer_taps(K, 16))
    taps = len(h)
    zi = jax.device_put(np.asarray(channelizer_zi_u8(K, taps, (B,))))

    @jax.jit
    def v0(r):
        y, _ = pfb_channelize_u8(r, h, zi, K)
        return y

    # v1/v2: replicate the kernel body with the transpose varied
    h64 = np.asarray(h, np.float64)
    t = taps // K
    l_zi = t * K + K - 1
    block = 16
    n = wbs // 2
    m_out = n // K
    nblk = m_out // block
    span = 2 * K * (block - 1 + t)
    stride = 2 * K * block
    i_idx = np.arange(block)[:, None]
    n_idx = np.arange(t * K)[None, :]
    r_even = 2 * ((i_idx + t) * K - 1 - n_idx)
    scale = 1.0 / 128.0
    h_mat = np.zeros((span, block * K * 2), np.float64)
    for ch in range(K):
        c = h64 * np.exp(2j * np.pi * n_idx[0] * ch / K) * scale
        cr = np.broadcast_to(c.real, r_even.shape)
        ci = np.broadcast_to(c.imag, r_even.shape)
        col_re = np.broadcast_to(ch * 2 * block + i_idx, r_even.shape)
        rs = r_even.ravel()
        h_mat[rs, col_re.ravel()] = cr.ravel()
        h_mat[rs + 1, col_re.ravel()] = -ci.ravel()
        h_mat[rs, col_re.ravel() + block] = ci.ravel()
        h_mat[rs + 1, col_re.ravel() + block] = cr.ravel()
    h_j = jnp.asarray(h_mat, jnp.bfloat16)

    def dot_part(r, out_bf16=False):
        need = 2 * K + (nblk + 1) * stride
        pad_n = max(0, need - 2 * l_zi - r.shape[-1])
        x_ext = jnp.concatenate(
            [zi, r] + ([jnp.full((B, pad_n), 128, jnp.uint8)]
                       if pad_n else []), axis=-1)

        def slab(off):
            sl = jax.lax.slice_in_dim(x_ext, off, off + nblk * stride,
                                      axis=-1)
            return (sl.astype(jnp.bfloat16) - 128.0).reshape(B, nblk, stride)

        windows = jnp.concatenate(
            [slab(2 * K), slab(2 * K + stride)[..., :span - stride]],
            axis=-1)
        y = jax.lax.dot_general(
            windows, h_j, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=(jnp.bfloat16 if out_bf16
                                    else jnp.float32))
        return y

    @jax.jit
    def v1(r):
        return dot_part(r)          # (B, nblk, K*2*block), no transpose

    @jax.jit
    def v2(r):
        y = dot_part(r, out_bf16=True)
        y = y.reshape(B, nblk, K, 2, block)
        y = jnp.moveaxis(y, -4, -2)
        return y.reshape(B, K, 2, m_out).astype(jnp.float32)

    # v3: conv formulation — features emit channel-major directly
    filt = np.zeros((2 * K * t + 2, 2, 2 * K), np.float32)  # (W, inC, outC)
    # x as (B, 2, n) I/Q planes? keep interleaved: treat input feature=2
    # (I and Q lanes) with window over complex samples
    h_c = np.stack([h64 * np.exp(2j * np.pi * np.arange(t * K) * ch / K)
                    for ch in range(K)])  # (K, tK)
    w = np.zeros((K * 2, 2, t * K), np.float32)  # (outC, inC, W)
    for ch in range(K):
        # y[m] = sum_n h_c[ch, n] * x[mK - 1 - n + tK...]: alignment set
        # below by padding; conv computes sum_w filt[o, i, w]*x[i, s*m+w]
        w[2 * ch, 0, :] = h_c[ch].real[::-1] * scale
        w[2 * ch, 1, :] = -h_c[ch].imag[::-1] * scale
        w[2 * ch + 1, 0, :] = h_c[ch].imag[::-1] * scale
        w[2 * ch + 1, 1, :] = h_c[ch].real[::-1] * scale
    w_j = jnp.asarray(w, jnp.bfloat16)

    @jax.jit
    def v3(r):
        pairs = r.reshape(B, -1, 2)
        x = (jnp.swapaxes(pairs, -1, -2).astype(jnp.bfloat16) - 128.0)
        x = jnp.pad(x, ((0, 0), (0, 0), (t * K, 0)))
        y = jax.lax.conv_general_dilated(
            x, w_j, window_strides=(K,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32)
        return y  # (B, 2K, m_out+?) channel-major already

    for name, fn in (("v0_current", v0), ("v1_no_transpose", v1),
                     ("v2_bf16_transpose", v2), ("v3_conv", v3)):
        try:
            dt = timer(fn, raw)
            shape = jax.eval_shape(fn, raw).shape
            print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                              "out_shape": list(shape)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
