#!/usr/bin/env python
"""Decode-GEMM (M=1) tile tuner at the 7B hot shapes.

Same harness as examples/prefill_tile_tune.py (device-loop marginal with a
full-output checksum, 256 iters so the marginal clears the tunnel's ~1 ms
RPC jitter).  Decode GEMMs are weight-read-bound: SOL = weight+scale bytes /
HBM bandwidth.  The M<=16 defaults (wide-N divisor tiles, bk | K) sit at
79-90% of that floor per examples/llm_profile.py; this sweep checks whether
other (bn, bk) splits close the rest.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from csinn2_tpu.kernels.qmatmul import quant_matmul, BLOCK

HBM = 763e9 * 1.073


def device_time(fn, args, iters=256, reps=4):
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
    # (K, N) -> extra (bn, bk) configs beyond the auto defaults
    shapes = {
        (4096, 12288): [(6144, 512), (12288, 512), (4096, 1024)],
        (4096, 22016): [(11008, 512), (22016, 256)],
        (11008, 4096): [(4096, 512), (2048, 256)],
        (4096, 4096): [(4096, 512), (2048, 1024)],
        (4096, 32000): [(6400, 512), (32000, 128)],
    }
    M = 1
    for (K, N), extra in shapes.items():
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        s = jnp.asarray(rng.random((K // BLOCK, N)) * 0.01, jnp.float32)
        bytes_ = K * N + (K // BLOCK) * N * 4 + M * K * 2
        sol = bytes_ / HBM
        print(f"-- M{M} K{K} N{N}: weight-read SOL {sol*1e6:.0f} us", flush=True)
        for cfgt in [None] + extra:
            kw = dict(scale_mode="block")
            if cfgt:
                kw.update(bn=cfgt[0], bk=cfgt[1])
            try:
                t = device_time(
                    lambda a, _kw=kw: quant_matmul(a, wq, s, **_kw), [x])
                lbl = f"bn{cfgt[0]} bk{cfgt[1]}" if cfgt else "defaults"
                eff = bytes_ / t / 1e9
                print(f"   {lbl:18s}: {t*1e6:8.1f} us  {eff:6.0f} GB/s "
                      f"{100*sol/t:5.1f}% SOL", flush=True)
            except Exception as e:
                print(f"   {cfgt}: FAIL {type(e).__name__} {str(e)[:90]}",
                      flush=True)


if __name__ == "__main__":
    main()
