#!/usr/bin/env python
"""Robust (min-of-reps) tile tuner for the andmask q4_0 decode kernel.

Device timing on the tunnel shows +-20-50%% run-to-run variance at these
microsecond scales, so every config is measured REPS times and the min is
reported — the bench harness reproduces the min in steady state.
"""

import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(__file__.rsplit("/", 2)[0], ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.join(__file__.rsplit("/", 2)[0], "examples"))
import int4_dequant_probe as P          # noqa: E402
from csinn2_tpu.kernels.qmatmul import BLOCK  # noqa: E402

REPS = int(os.environ.get("REPS", "3"))


def main():
    print(f"# backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    shapes = [(4096, 12288), (4096, 22016), (11008, 4096), (4096, 4096)]
    M = 8
    results = {}
    for K, N in shapes:
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        q = rng.integers(-8, 8, (K, N)).astype(np.int8)
        s = jnp.asarray(rng.random((K // BLOCK, N)) * 0.01 + 0.005,
                        jnp.float32)
        wp_m = P.pack_int4_mixed(q)
        bytes_ = K * N // 2 + (K // BLOCK) * N * 4 + M * K * 2
        sol = bytes_ / P.HBM
        print(f"-- M{M} K{K} N{N}: int4 SOL {sol*1e6:7.1f} us", flush=True)
        cfgs = []
        for bn in {N, N // 2, N // 4}:
            for bk in (256, 512, 1024):
                if K % bk or N % bn or bn % 128 or bn < 512:
                    continue
                # compute-footprint guard: planes 2*(bk/2*bn*2B) + packed
                # double buffer + acc
                vm = 2 * bk * bn + 2 * (bk // 2) * bn + M * bn * 4
                if vm > 14.5 * 2 ** 20:
                    continue
                cfgs.append((bn, bk))
        for bn, bk in sorted(cfgs):
            fn = lambda a: P.run_andmask(a, wp_m, s, M, bn, bk)
            try:
                ts = [P.device_time(fn, [x]) for _ in range(REPS)]
                t = min(ts)
                spread = (max(ts) - t) / t * 100
                results[(K, N, bn, bk)] = t
                print(f"   bn{bn:6d} bk{bk:5d}: {t*1e6:7.1f} us "
                      f"{100*sol/t:5.1f}% SOL  (spread +{spread:.0f}%)",
                      flush=True)
            except Exception as e:
                print(f"   bn{bn:6d} bk{bk:5d}: FAIL {type(e).__name__}",
                      flush=True)
        best = min(((v, k) for k, v in results.items() if k[0] == K and k[1] == N),
                   default=None)
        if best:
            t, (_, _, bn, bk) = best
            print(f"   BEST: bn{bn} bk{bk} {t*1e6:.1f} us "
                  f"{100*sol/t:.1f}% SOL", flush=True)


if __name__ == "__main__":
    main()
