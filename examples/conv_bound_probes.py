#!/usr/bin/env python
"""Depthwise / pointwise conv bound probes — the measurements behind the r4
MobileNet kernel decisions (run on 1× TPU v5e, 2026-08-21).

Probe 1 — depthwise carrier dtype (dw 3×3, [128,56,56,128]):
    int8  dw: 309 us -> 333 GB/s effective
    bf16  dw: 320 us -> 321 GB/s
    f32   dw: 381 us -> 269 GB/s
  929M int-ops / 309 us = 3.0 T ops/s ≈ the VPU's int-MAC throughput:
  depthwise convs are VPU-COMPUTE-bound, not HBM-bound — no carrier dtype
  helps, and no Pallas rewrite can beat the unit's own rate.

Probe 2 — block-diagonal regrouping (same shape; dw expressed as a grouped
conv with group_size in/out channels and block-diagonal weights, hoping the
MXU picks it up at group_size·FLOPs):
    group_size=8:   409 us   group_size=32: 339 us   group_size=128: 410 us
    bf16 gs=32:     409 us
  No better than depthwise — XLA keeps grouped convs off the MXU here.

Probe 3 — k·k-tap elementwise MAC (strided slices of the padded input times
per-channel tap weights, summed in int32; the hand-fused "one VPU pass"
formulation): measured WORSE end-to-end (MNv1 75→69% of SOL, bs1 latency
0.08→0.65 ms) — XLA does not fuse the strided tap slices into one pass.
Kept opt-in via CSINN2_DW_TAPS=1 (kernels/qconv._dw_taps_int).

Probe 4 — small-C pointwise convs (isolated, with requant epilogue):
    pw 16->96 @112: 837 GB/s     pw 32->96 @112: 1083 GB/s
    pw 96->24 @56:  485 GB/s     pw 64->128 @56: 773 GB/s
  Isolated 1×1 convs run near/above the logical-HBM rate — the 710-741 us
  measured for MNv2 b1.expand IN-GRAPH came from the zp-correction operand
  breaking epilogue fusion, not from the conv (see kernels/qconv.py:
  vector-only correction).  Routing 1×1 convs through the Pallas quant GEMM
  instead was also probed and LOSES (its tiles are tuned for skinny-M).

Usage: python examples/conv_bound_probes.py  (re-runs probes 1, 2, 4)
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax import lax


def device_time(fn, args, iters=64, reps=3):
    """Traced-count fori_loop marginal (see Session.run_benchmark_device)."""
    staged = jax.block_until_ready(
        [jax.device_put(jnp.stack([a, a])) for a in args])

    @jax.jit
    def jfn(n, *st):
        def body(i, acc):
            ins = [jax.lax.dynamic_index_in_dim(s, i % 2, 0, keepdims=False)
                   for s in st]
            return acc + jnp.sum(fn(*ins).astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def fetch(n):
        t0 = time.perf_counter()
        float(np.asarray(jfn(jnp.int32(n), *staged)))
        return time.perf_counter() - t0

    fetch(3)
    t_s = min(fetch(3) for _ in range(reps))
    t_l = min(fetch(3 + iters) for _ in range(reps))
    return max(t_l - t_s, 1e-12) / iters


def main():
    rng = np.random.default_rng(0)
    dn = ("NHWC", "OIHW", "NHWC")
    N, H, W, C = 128, 56, 56, 128
    x8 = jnp.asarray(rng.integers(-100, 100, (N, H, W, C)).astype(np.int8))
    w8 = jnp.asarray(rng.integers(-100, 100, (C, 1, 3, 3)).astype(np.int8))
    bytes_io = N * H * W * C * 2

    print("== probe 1: depthwise carrier dtype ==")

    def dw_int(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            feature_group_count=C,
            preferred_element_type=jnp.int32).astype(jnp.int8)

    def dw_bf16(x, w):
        xb = x.astype(jnp.int32).astype(jnp.bfloat16)
        wb = w.astype(jnp.int32).astype(jnp.bfloat16)
        return lax.conv_general_dilated(
            xb, wb, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            feature_group_count=C,
            preferred_element_type=jnp.float32).astype(jnp.int8)

    for name, fn in [("int8", dw_int), ("bf16", dw_bf16)]:
        dt = device_time(fn, [x8, w8])
        ops = 2 * 9 * N * H * W * C
        print(f"  {name} dw: {dt*1e6:.0f} us -> {bytes_io/dt/1e9:.0f} GB/s, "
              f"{ops/dt/1e12:.2f} T ops/s")

    print("== probe 2: block-diagonal regrouping ==")
    for gsz in (8, 32):
        g = C // gsz
        wd = np.zeros((C, gsz, 3, 3), np.int8)
        for c in range(C):
            wd[c, c % gsz] = rng.integers(-100, 100, (3, 3))
        w = jnp.asarray(wd)

        def bd(x, w, _g=g):
            return lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                feature_group_count=_g,
                preferred_element_type=jnp.int32).astype(jnp.int8)

        dt = device_time(bd, [x8, w])
        print(f"  group_size={gsz}: {dt*1e6:.0f} us "
              f"-> {bytes_io/dt/1e9:.0f} GB/s")

    print("== probe 4: small-C pointwise ==")
    for ci, co, hw in [(16, 96, 112), (96, 24, 56), (64, 128, 56)]:
        x = jnp.asarray(rng.integers(-100, 100, (128, hw, hw, ci))
                        .astype(np.int8))
        w = jnp.asarray(rng.integers(-100, 100, (co, ci, 1, 1))
                        .astype(np.int8))

        def pw(x, w):
            a = lax.conv_general_dilated(
                x, w, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return jnp.clip(jnp.round(a.astype(jnp.float32) * 0.01),
                            -128, 127).astype(jnp.int8)

        dt = device_time(pw, [x, w])
        mb = 128 * hw * hw * (ci + co) / 1e6
        print(f"  pw {ci}->{co} @{hw}: {dt*1e6:.0f} us "
              f"({mb/1e3/dt:.0f} GB/s)")


if __name__ == "__main__":
    main()
