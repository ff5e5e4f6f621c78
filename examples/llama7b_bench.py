#!/usr/bin/env python
"""Llama-2-7B weight-only-quantized inference benchmark on ONE TPU chip —
BASELINE.md config 4 ("Llama-2-7B weight-only INT8/INT4 with quantized
KV-cache, 1 host"; ref engine: source/llm/llama2.c, hard-coded 7B).

Random weights are generated AND quantized on-device (init_params_device) so
the 7B init takes seconds; correctness of the quantized pipeline is gated
separately at small dims (tests/test_llm.py, examples/llama_generate.py).

Reports: prefill TTFT (prompt 128), fused-scan decode tokens/s, HBM footprint,
and the dequant-GEMM roofline fraction (decode is HBM-bandwidth-bound: each
token must read every weight byte once — tok/s ≈ BW / bytes(weights)).

Usage:  python examples/llama7b_bench.py [--mode q8_0] [--layers 32]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="q8_0",
                    choices=["int8", "int4", "q8_0", "q4_0"])
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="HBM bandwidth for the roofline (v5e: 819 GB/s)")
    args = ap.parse_args()

    from csinn2_tpu.utils.platform import backend_summary, honor_env_platform
    honor_env_platform()
    import jax

    from csinn2_tpu.llm.config import LlamaConfig
    from csinn2_tpu.llm.engine import InferenceEngine
    from csinn2_tpu.llm.model import init_params_device

    cfg = LlamaConfig.llama2_7b()
    cfg = LlamaConfig(**{**cfg.__dict__, "n_layers": args.layers,
                         "head_dim": 0})
    print(f"== Llama2-7B (L={cfg.n_layers}) mode={args.mode} quant-KV "
          f"on {backend_summary()} ==", flush=True)

    t0 = time.perf_counter()
    params = init_params_device(cfg, mode=args.mode, seed=0)
    params = jax.block_until_ready(params)
    print(f"device init+quant: {time.perf_counter()-t0:.1f}s", flush=True)

    wbytes = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params)
                 if l.dtype == np.int8)
    sbytes = sum(l.nbytes for l in jax.tree_util.tree_leaves(params)) - wbytes
    print(f"weights: {wbytes/2**30:.2f} GiB int8 carriers "
          f"+ {sbytes/2**30:.2f} GiB scales/embeddings", flush=True)

    eng = InferenceEngine(cfg, params, batch=1, quantized_kv=True)
    prompt = list(np.random.default_rng(0).integers(1, cfg.vocab_size,
                                                    args.prompt))

    # prefill TTFT
    t0 = time.perf_counter()
    eng.generate(prompt, max_new_tokens=1)
    print(f"prefill+1 (incl compile): {time.perf_counter()-t0:.1f}s", flush=True)
    ttfts = []
    for _ in range(3):
        t0 = time.perf_counter()
        eng.generate(prompt, max_new_tokens=1)
        ttfts.append(time.perf_counter() - t0)
    ttft = min(ttfts)
    print(f"p50 TTFT (prompt {args.prompt}): {ttft*1e3:.1f} ms", flush=True)

    # fused-scan decode, device-marginal timing (one lax.scan executable;
    # long-minus-short cancels compile/dispatch/transfer)
    t0 = time.perf_counter()
    tps = eng.benchmark_decode_device(iters=args.tokens)
    print(f"fused decode bench (incl compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    sol = args.hbm_gbps * 2**30 / (wbytes + sbytes)  # tok/s if pure weight-read
    print(f"decode: {tps:.1f} tokens/s  "
          f"(roofline ≈{sol:.0f} tok/s → {100*tps/sol:.0f}% of "
          f"weight-read speed-of-light)", flush=True)
    print("PASS" if np.isfinite(tps) and tps > 0 else "FAIL")


if __name__ == "__main__":
    main()
