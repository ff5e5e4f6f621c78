#!/usr/bin/env python
"""Quick chip check: 7B q8_0 device-side TTFT (prompt 128) + decode tok/s.

Used to validate kernel-tile changes without running the full bench matrix
(bench.py runs the same InferenceEngine benchmark methods).
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from csinn2_tpu.llm.config import LlamaConfig
from csinn2_tpu.llm.engine import InferenceEngine
from csinn2_tpu.llm.model import init_params_device

HBM_GIBPS = 763.0
BF16_TFLOPS = 197.0


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "q8_0"
    print(f"# backend: {jax.default_backend()}  mode={mode}", flush=True)
    cfg = LlamaConfig.llama2_7b()
    t0 = time.time()
    params = jax.block_until_ready(init_params_device(cfg, mode=mode, seed=0))
    tot = sum(l.nbytes for l in jax.tree_util.tree_leaves(params))
    n_params = sum(int(np.prod(l.shape)) * (2 if str(l.dtype) == "int8" and
                                            mode in ("int4", "q4_0") else 1)
                   for l in jax.tree_util.tree_leaves(params)
                   if l.dtype == np.int8)
    print(f"# init {time.time()-t0:.0f}s, {tot/2**30:.2f} GiB weights", flush=True)

    eng = InferenceEngine(cfg, params, batch=1, quantized_kv=True)

    if "--decode-only" in sys.argv:
        t0 = time.time()
        tps = eng.benchmark_decode_device(iters=128)
        dec_sol = HBM_GIBPS * 2**30 / tot
        print(f"decode bs1: {tps:.1f} tok/s  (SOL {dec_sol:.0f} -> "
              f"{100*tps/dec_sol:.0f}%)  [{time.time()-t0:.0f}s incl compile]",
              flush=True)
        return

    t0 = time.time()
    ttft = eng.benchmark_prefill_device(n_prompt=128, iters=8)
    flop_bound = 2.0 * n_params * 128 / (BF16_TFLOPS * 1e12)
    read_bound = tot / (HBM_GIBPS * 2**30)
    sol = max(flop_bound, read_bound)
    print(f"TTFT prompt128: {ttft*1e3:.2f} ms  (bound {sol*1e3:.1f} ms -> "
          f"{100*sol/ttft:.0f}%)  [{time.time()-t0:.0f}s incl compile]",
          flush=True)

    t0 = time.time()
    tps = eng.benchmark_decode_device(iters=128)
    dec_sol = HBM_GIBPS * 2**30 / tot
    print(f"decode bs1: {tps:.1f} tok/s  (SOL {dec_sol:.0f} -> "
          f"{100*tps/dec_sol:.0f}%)  [{time.time()-t0:.0f}s incl compile]",
          flush=True)


if __name__ == "__main__":
    main()
