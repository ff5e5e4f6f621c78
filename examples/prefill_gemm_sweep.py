#!/usr/bin/env python
"""Prefill-shape dequant-GEMM tile sweep on the real chip.

TTFT is 10× off the bf16 FLOP bound (BENCH r2 initial); decode tiles are
tuned (890 GiB/s) but prefill (M=128..512) was never swept.  Compares the
Pallas block-dequant GEMM against the pure-bf16 XLA matmul upper bound on
the Llama-7B hot shapes.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from csinn2_tpu.kernels.qmatmul import quant_matmul, BLOCK


def device_time(fn, args, iters=32):
    staged = [jax.device_put(jnp.stack([a, a])) for a in args]
    staged = jax.block_until_ready(staged)

    def looped(n, *st):
        def body(i, acc):
            ins = [jax.lax.dynamic_index_in_dim(s, i % 2, 0, keepdims=False)
                   for s in st]
            out = fn(*ins)
            # checksum = sum of SQUARES of the full output: a [:8] slice lets
            # XLA dead-code-eliminate GEMM columns (measured "2451 TFLOPS"),
            # and a plain sum lets the algebraic simplifier factor
            # sum(x@W) into rank-1 reductions (measured "324 TFLOPS");
            # sum((x@W)^2) admits neither rewrite.
            o = out.astype(jnp.float32)
            return acc + jnp.sum(o * o)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jfn = jax.jit(looped, static_argnums=0)

    def fetch(n):
        t0 = time.perf_counter()
        float(np.asarray(jfn(n, *staged)))
        return time.perf_counter() - t0

    fetch(2); fetch(2 + iters)
    t_s = min(fetch(2) for _ in range(3))
    t_l = min(fetch(2 + iters) for _ in range(3))
    return max(t_l - t_s, 1e-12) / iters


def main():
    print(f"# backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    shapes = [(4096, 11008)]
    for K, N in shapes:
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        wqt = jnp.asarray(np.asarray(wq).T)
        s = jnp.asarray(rng.random((K // BLOCK, N)) * 0.01, jnp.float32)
        st = jnp.asarray(np.asarray(s).T)
        wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

        flops = 2.0 * M * K * N

        t = device_time(lambda a: jnp.dot(a, wb, preferred_element_type=jnp.float32), [x])
        print(f"M{M} K{K} N{N} bf16-XLA            : {t*1e6:8.1f} us "
              f"{flops/t/1e12:6.1f} TFLOPS", flush=True)

        # XLA dequant-then-dot upper-reference (materializes bf16 weights;
        # XLA may or may not fuse the dequant into the dot operand)
        def xla_dq(a):
            wf = wq.astype(jnp.bfloat16) * jnp.repeat(s, BLOCK, axis=0
                                                      ).astype(jnp.bfloat16)
            return jnp.dot(a, wf, preferred_element_type=jnp.float32)
        t = device_time(xla_dq, [x])
        print(f"M{M} K{K} N{N} q8_0 XLA dequant+dot   : {t*1e6:8.1f} us "
              f"{flops/t/1e12:6.1f} TFLOPS", flush=True)

        for (bm, bn, bk, wt, dq) in [
            (None, None, None, False, "repeat"),  # current defaults, [K,N]
            (None, None, None, True, "repeat"),   # current defaults, [N,K]
            (128, 512, 2048, False, "repeat"),
            (128, 1024, 1024, False, "repeat"),
            (128, 1024, 1024, False, "bcast"),
            (128, 1024, 2048, False, "repeat"),
            (128, 2048, 1024, False, "repeat"),
            (128, 512, 4096, True, "repeat"),
        ]:
            kw = dict(scale_mode="block", deq=dq)
            if wt:
                args = (x, wqt, st)
                kw["w_transposed"] = True
            else:
                args = (x, wq, s)
            if bm:
                kw.update(bm=bm, bn=bn, bk=bk)
            try:
                f = lambda a, _kw=kw, _w=args[1], _s=args[2]: quant_matmul(
                    a, _w, _s, **_kw)
                t = device_time(f, [x])
                lbl = (f"bm{bm} bn{bn} bk{bk} wt={wt} {dq}" if bm
                       else f"defaults wt={wt}")
                print(f"M{M} K{K} N{N} q8_0 {lbl:28s}: {t*1e6:8.1f} us "
                      f"{flops/t/1e12:6.1f} TFLOPS", flush=True)
            except Exception as e:
                print(f"M{M} K{K} N{N} bm{bm} bn{bn} bk{bk} wt={wt}: "
                      f"FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        print()


if __name__ == "__main__":
    main()
