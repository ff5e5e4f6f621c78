#!/usr/bin/env python
"""Decode-shape dequant-GEMM tile/layout sweep on the real chip.

Measures effective HBM bandwidth (weight+scale bytes / marginal device time)
of quant_matmul at the decode shape [1,K]x[K,N] for (a) the standard [K,N]
weight layout at several (bn,bk) tiles and (b) the transposed/rearranged
[N,K] layout (contiguous K-streams, ref: the reference's rearranged-weight
GEMMs, source/c920_opt/fp16/gemm_fp16_rearrange.c).  Drives the tile
heuristic in kernels/qmatmul.py.

Usage: python examples/gemm_tile_sweep.py [--K 4096] [--N 11008] [--int4]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--N", type=int, default=11008)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--int4", action="store_true")
    ap.add_argument("--layout", choices=["kn", "nk", "both"], default="both")
    ap.add_argument("--tiles", default="",
                    help="comma list of bnxbk pairs, e.g. 256x2048,512x1024")
    args = ap.parse_args()

    from csinn2_tpu.utils.platform import backend_summary, honor_env_platform
    honor_env_platform()
    import jax
    import jax.numpy as jnp
    from csinn2_tpu.kernels.qmatmul import (
        pack_int4, pack_int4_t, quant_matmul, quant_matmul_ref)

    print(f"== dequant-GEMM sweep [1,{args.K}]x[{args.K},{args.N}] "
          f"{'q4_0' if args.int4 else 'q8_0'} on {backend_summary()} ==",
          flush=True)

    K, N = args.K, args.N
    rng = np.random.default_rng(0)
    bound = 7 if args.int4 else 127
    w = rng.integers(-bound, bound + 1, (K, N)).astype(np.int8)
    s = (rng.random((K // 32, N)) * 0.01 + 0.001).astype(np.float32)
    x = (rng.standard_normal((1, K)) * 0.1).astype(np.float32)

    xd = jnp.asarray(x, jnp.bfloat16)
    sd = jnp.asarray(s)
    st = jnp.asarray(np.ascontiguousarray(s.T))
    if args.int4:
        wd = pack_int4(jnp.asarray(w))
        wt = pack_int4_t(jnp.asarray(np.ascontiguousarray(w.T)))
    else:
        wd = jnp.asarray(w)
        wt = jnp.asarray(np.ascontiguousarray(w.T))
    wbytes = (w.nbytes // (2 if args.int4 else 1)) + s.nbytes

    gold = np.asarray(quant_matmul_ref(x, jnp.asarray(w), s,
                                       scale_mode="block"))

    def bench(fn, iters):
        x2 = jnp.stack([xd, xd])

        def looped(n):
            # dynamic trip count → ONE compile serves both loop lengths
            def body(i, acc):
                xi = jax.lax.dynamic_index_in_dim(x2, i % 2, 0, keepdims=False)
                y = fn(xi)
                return acc + y[0, :8].astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        jf = jax.jit(looped)

        def run(n):
            t0 = time.perf_counter()
            float(np.asarray(jf(jnp.int32(n))))
            return time.perf_counter() - t0

        base = 16
        run(base)
        run(base + iters)
        ts = min(run(base) for _ in range(3))
        tl = min(run(base + iters) for _ in range(3))
        return (tl - ts) / iters

    tiles = [(256, 2048), (512, 1024), (2048, 512), (5504, 512), (11008, 256)]
    if args.tiles:
        tiles = [tuple(int(v) for v in t.split("x")) for t in args.tiles.split(",")]
    layouts = {"kn": (False,), "nk": (True,), "both": (False, True)}[args.layout]
    pk = bool(args.int4)
    for transposed in layouts:
        wa, sa = (wt, st) if transposed else (wd, sd)
        for bn, bk in tiles:
            if bn > N or bk > K:
                continue
            if (bn * bk) // (2 if pk else 1) > 8 * 2**20:
                continue
            kw = dict(scale_mode="block", bm=8, bn=bn, bk=bk,
                      packed_int4=pk, w_transposed=transposed)
            try:
                got = np.asarray(quant_matmul(xd, wa, sa, **kw))
            except Exception as e:
                print(f"  {'T' if transposed else ' '} bn={bn:5d} bk={bk:5d}  "
                      f"FAILED: {str(e).splitlines()[0][:70]}", flush=True)
                continue
            err = np.abs(got - gold).max() / (np.abs(gold).max() + 1e-9)
            dt = bench(lambda xi, _kw=kw, _w=wa, _s=sa:
                       quant_matmul(xi, _w, _s, **_kw), args.iters)
            gbs = wbytes / dt / 2**30
            print(f"  {'T' if transposed else ' '} bn={bn:5d} bk={bk:5d}  "
                  f"{dt*1e6:7.1f} us  {gbs:6.1f} GiB/s  relerr={err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
