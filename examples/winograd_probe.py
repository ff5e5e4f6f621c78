#!/usr/bin/env python
"""Winograd F(4x4, 3x3) probe: measured decision for the 3x3s1 conv strategy.

The reference's RVV backend routes 3x3s1 convs to Winograd b4f3/b6f3
transforms (ref: shl_rvv_conv2d_init_int8 strategy select,
source/thead_rvv/int8/convolution.c:69-140; transforms
source/thead_rvv/fp32/convolution_3x3_fp32_packn.c:58,903) because RISC-V
cores are MAC-limited — 2.25-4× fewer multiplies wins.  On TPU the MXU is
FLOP-rich and convs at CNN shapes are predominantly HBM-bound
(runtime/roofline.py), so the prediction is that Winograd's extra
intermediate traffic (36/16 = 2.25× the activation bytes in transform space)
LOSES to XLA's direct conv.  This probe measures that instead of arguing it
(pattern: examples/dsfuse_probe.py; result recorded in PARITY.md).

Winograd here is the best-case XLA formulation: patch extraction + the
transform pair as small matmuls + the 36 per-frequency [K,C]x[C,T] GEMMs on
the MXU — exactly how one would productionize it on TPU.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax import lax

# F(4x4, 3x3) transform matrices (standard Cook-Toom construction with
# points {0, ±1, ±2}; same family as the reference's b4f3 constants)
BT = np.array([
    [4, 0, -5, 0, 1, 0],
    [0, -4, -4, 1, 1, 0],
    [0, 4, -4, -1, 1, 0],
    [0, -2, -1, 2, 1, 0],
    [0, 2, -1, -2, 1, 0],
    [0, 4, 0, -5, 0, 1],
], np.float32)
G = np.array([
    [1 / 4, 0, 0],
    [-1 / 6, -1 / 6, -1 / 6],
    [-1 / 6, 1 / 6, -1 / 6],
    [1 / 24, 1 / 12, 1 / 6],
    [1 / 24, -1 / 12, 1 / 6],
    [0, 0, 1],
], np.float32)
AT = np.array([
    [1, 1, 1, 1, 1, 0],
    [0, 1, -1, 2, -2, 0],
    [0, 1, 1, 4, 4, 0],
    [0, 1, -1, 8, -8, 1],
], np.float32)


def winograd_conv(x, w):
    """x [N,H,W,C] f32/bf16, w [3,3,C,K] → y [N,H,W,K] (SAME, stride 1)."""
    N, H, W, C = x.shape
    K = w.shape[-1]
    th, tw = -(-H // 4), -(-W // 4)
    # pad to 1 + 4*t + 1 so every 6x6 input tile exists
    xp = jnp.pad(x, ((0, 0), (1, 4 * th + 1 - H), (1, 4 * tw + 1 - W), (0, 0)))
    # extract 6x6 patches at stride 4: [N, th, tw, 6, 6, C]
    idx_h = (4 * jnp.arange(th)[:, None] + jnp.arange(6)[None, :])  # [th, 6]
    idx_w = (4 * jnp.arange(tw)[:, None] + jnp.arange(6)[None, :])
    d = xp[:, idx_h][:, :, :, idx_w]          # [N, th, 6, tw, 6, C]
    d = jnp.transpose(d, (0, 1, 3, 2, 4, 5))  # [N, th, tw, 6, 6, C]

    bt = jnp.asarray(BT, x.dtype)
    V = jnp.einsum("ab,ntubcq,cd->ntuadq", bt, d, bt.T)   # B^T d B
    U = jnp.einsum("ab,bcxk,cd->adxk", jnp.asarray(G, w.dtype), w,
                   jnp.asarray(G, w.dtype).T)             # [6,6,C,K]
    # the 36 per-frequency GEMMs: [T, C] x [C, K] batched over (a, d)
    M = jnp.einsum("ntuadq,adqk->ntuadk", V, U)
    at = jnp.asarray(AT, x.dtype)
    Y = jnp.einsum("ab,ntubck,cd->ntuadk", at, M, at.T)   # A^T M A [.,4,4,K]
    y = jnp.transpose(Y, (0, 1, 3, 2, 4, 5)).reshape(N, 4 * th, 4 * tw, K)
    return y[:, :H, :W, :]


def direct_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def device_time(fn, args, iters=192, reps=4):
    # iters must push the marginal past the tunnel's ~0.5-1 ms RPC jitter
    # (at 16 iters a 50 us kernel is an unmeasurable 0.8 ms marginal)
    staged = [jax.device_put(jnp.stack([a, a])) for a in args]
    staged = jax.block_until_ready(staged)

    @jax.jit
    def jfn(n, *st):
        def body(i, acc):
            ins = [jax.lax.dynamic_index_in_dim(s, i % 2, 0, keepdims=False)
                   for s in st]
            return acc + jnp.sum(fn(*ins).astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def fetch(n):
        t0 = time.perf_counter()
        np.asarray(jfn(jnp.int32(n), *staged))
        return time.perf_counter() - t0

    fetch(2); fetch(2 + iters)
    t_s = min(fetch(2) for _ in range(reps))
    t_l = min(fetch(2 + iters) for _ in range(reps))
    return max(t_l - t_s, 1e-12) / iters


def main():
    print(f"# backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    # ResNet-50 3x3 bottleneck shapes (the reference's winograd class) at the
    # bench batch; bf16 carriers (the TPU fast-conv dtype)
    shapes = [(32, 56, 56, 64, 64), (32, 14, 14, 256, 256)]
    for (N, H, W, C, K) in shapes:
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, C, K)) * 0.1, jnp.bfloat16)

        # correctness first — at FULL f32 matmul precision: the TPU default
        # rounds f32 dots through bf16 and the Winograd transform matrices
        # amplify that rounding (measured rel err 0.107 at default precision
        # vs 2e-6 on CPU); the timing below still runs the production bf16
        # path for both formulations.
        with jax.default_matmul_precision("float32"):
            yw = winograd_conv(x.astype(jnp.float32), w.astype(jnp.float32))
            yd = direct_conv(x.astype(jnp.float32), w.astype(jnp.float32))
            err = float(jnp.max(jnp.abs(yw - yd)) / jnp.max(jnp.abs(yd)))
        assert err < 2e-2, f"winograd mismatch: rel {err}"

        td = device_time(direct_conv, [x, w])
        tw_ = device_time(winograd_conv, [x, w])
        flops = 2.0 * N * H * W * K * C * 9
        print(f"N{N} {H}x{W} C{C} K{K}: direct {td*1e6:8.1f} us "
              f"({flops/td/1e12:5.1f} TF)  winograd {tw_*1e6:8.1f} us "
              f"-> winograd/direct = {tw_/td:.2f}x  (rel err {err:.1e})",
              flush=True)


if __name__ == "__main__":
    main()
