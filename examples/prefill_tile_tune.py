#!/usr/bin/env python
"""Focused prefill-GEMM tile tuner for the Llama-7B hot shapes at M=128.

Times each (bm, bn, bk, deq) config of the Pallas block-dequant GEMM with the
device-loop marginal harness (checksum = full-output sum — safe for Pallas
calls, which XLA cannot see through; XLA-dot baselines are intentionally NOT
timed here, their loop checksums admit algebraic rewrites that invalidate the
measurement).  Prints per-shape ranking + the speed-of-light floor.

Result (v5e, 2026-08-20 run recorded in PARITY.md): defaults for M>16 were
bn=256/bk=512 (62 TFLOPS); bn=1024/bk=1024 reaches ~110 TFLOPS.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from csinn2_tpu.kernels.qmatmul import quant_matmul, BLOCK

HBM = 763e9 * 1.073  # GiB/s → B/s
TF = 197e12


def device_time(fn, args, iters=256, reps=4):
    # iters must push the marginal well past the tunnel's RPC jitter
    # (~0.5-1 ms on a ~23 ms round-trip): at 24 iters a 50 us kernel is a
    # 1.2 ms marginal and the sweep printed impossible >peak TFLOPS; at 256
    # iters the same kernel is a 13 ms marginal and the noise is <5%.
    staged = [jax.device_put(jnp.stack([a, a])) for a in args]
    staged = jax.block_until_ready(staged)

    # traced loop count: ONE compile serves both loop lengths
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
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    # 7B prefill shapes: wqkv, w13, w2, wo, lm_head.  Per-shape configs:
    # defaults = the divisor-aware auto tiles (see qmatmul._pick_tile — tiles
    # that don't divide the dims force a full-weight jnp.pad copy in-jit).
    # r3 sweep history (v5e): defaults-r2 (256/512) ran 57-60 TF everywhere;
    # divisor-aware 2048-class tiles fixed the in-jit pad copy and reached
    # 103-140 TF; wide-N (bn 4096-5504, bk 256-512) won every shape tried:
    # wqkv (2048,1024)=150.8 TF, w13 (5504,512)=146 TF, w2 (4096,256)=139.9,
    # wo (2048,1024)=134.9, lm_head (1280,2048)=140.7.
    shapes = {
        (4096, 12288): [(128, 2048, 1024, "repeat"), (128, 4096, 512, "repeat"),
                        (128, 6144, 512, "repeat")],
        (4096, 22016): [(128, 5504, 512, "repeat"), (128, 5504, 1024, "repeat"),
                        (128, 11008, 512, "repeat"), (128, 11008, 256, "repeat")],
        (11008, 4096): [(128, 4096, 256, "repeat"), (128, 2048, 256, "repeat"),
                        (128, 2048, 5504, "repeat"), (128, 1024, 5504, "repeat"),
                        (64, 4096, 256, "repeat")],
        (4096, 4096): [(128, 2048, 1024, "repeat"), (128, 4096, 512, "repeat")],
        (4096, 32000): [(128, 1280, 2048, "repeat"), (128, 3200, 512, "repeat"),
                        (128, 3200, 1024, "repeat")],
    }
    for (K, N), extra in shapes.items():
        configs = [(None, None, None, "repeat")] + extra
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        s = jnp.asarray(rng.random((K // BLOCK, N)) * 0.01, jnp.float32)
        flops = 2.0 * M * K * N
        sol = max(flops / TF, (K * N + M * K * 2) / HBM)
        print(f"-- M{M} K{K} N{N}: SOL {sol*1e6:.0f} us", flush=True)
        for (bm, bn, bk, dq) in configs:
            kw = dict(scale_mode="block", deq=dq)
            if bm:
                kw.update(bm=bm, bn=bn, bk=bk)
            try:
                t = device_time(
                    lambda a, _kw=kw: quant_matmul(a, wq, s, **_kw), [x])
                lbl = f"bm{bm} bn{bn} bk{bk} {dq}" if bm else f"defaults {dq}"
                print(f"   {lbl:26s}: {t*1e6:8.1f} us  {flops/t/1e12:6.1f} TF"
                      f"  {100*sol/t:5.1f}% SOL", flush=True)
            except Exception as e:
                print(f"   bm{bm} bn{bn} bk{bk}: FAIL {type(e).__name__} "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
