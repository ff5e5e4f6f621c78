#!/usr/bin/env python
"""LLM engine demo — the analog of tests/llm/llama2.c: build a (random-weight)
Llama, quantize weights, generate tokens, report decode tokens/s and the
quantized-vs-float logit cosine.

With --ckpt, loads a REAL converted model dir instead (produced by
`python -m csinn2_tpu.llm.convert <gguf-or-hf> <dir>`) and generates from
--prompt text through the bundled tokenizer — the full real-weights path the
reference exercises in tests/llm/llama2.c.

Usage:  python examples/llama_generate.py [--mode q8_0] [--layers 2] [--dim 256]
        python examples/llama_generate.py --ckpt /path/to/model_dir \
            --prompt "Once upon a time" --tokens 64
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from csinn2_tpu.llm.config import LlamaConfig
from csinn2_tpu.llm.engine import InferenceEngine
from csinn2_tpu.llm.model import FLOAT, init_params_device
from csinn2_tpu.utils.verify import cosine_similarity


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="q8_0",
                    choices=["float", "int8", "int4", "q8_0", "q4_0"])
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=16)
    ap.add_argument("--quant-kv", action="store_true")
    ap.add_argument("--ckpt", default=None,
                    help="converted model dir (llm/convert.py output); "
                         "overrides the random-weight demo")
    ap.add_argument("--prompt", default="Once upon a time")
    ap.add_argument("--temperature", type=float, default=0.0)
    args = ap.parse_args()

    from csinn2_tpu.utils.platform import backend_summary, honor_env_platform
    honor_env_platform()

    if args.ckpt:
        return run_checkpoint(args)
    cfg = LlamaConfig(dim=args.dim, n_layers=args.layers, n_heads=args.heads,
                      n_kv_heads=args.heads, ffn_dim=args.dim * 4,
                      vocab_size=1024, max_seq_len=256)
    print(f"== Llama dim={cfg.dim} L={cfg.n_layers} mode={args.mode} "
          f"on {backend_summary()} ==")

    # init + quantize ON DEVICE: the same PRNG draws feed both the float and
    # the quantized pytree, so the cosine gate below compares like-for-like
    # (host init would push ~40 small arrays one-by-one through the tunnel —
    # minutes of pure transfer latency for a model this small)
    t0 = time.perf_counter()
    params = init_params_device(cfg, mode=args.mode, seed=0)
    print(f"params init+quant (on device): {time.perf_counter()-t0:.2f}s")

    eng = InferenceEngine(cfg, params, batch=1, quantized_kv=args.quant_kv)
    prompt = [1, 5, 9, 13, 21]

    t0 = time.perf_counter()
    out = eng.generate_fused(prompt, max_new_tokens=args.tokens)
    print(f"generate {args.tokens} tokens (incl. compile): {time.perf_counter()-t0:.2f}s")
    print(f"tokens: {out}")

    tps = eng.benchmark_decode(iters=10, warmup=2)
    print(f"decode throughput (per-step dispatch): {tps:.1f} tokens/s")

    # fused scan decode, device-marginal timing (long-minus-short scan; host
    # wall-clock on one call still includes dispatch + transfer)
    tps = eng.benchmark_decode_device(iters=64)
    print(f"decode throughput (fused scan, device loop): {tps:.1f} tokens/s")

    if args.mode != "float":
        fparams = init_params_device(cfg, mode=FLOAT, seed=0)
        feng = InferenceEngine(cfg, fparams, batch=1)
        fl = feng.prefill(0, prompt)
        ql = eng.prefill(0, prompt)
        cs = cosine_similarity(ql, fl)
        print(f"logit cosine ({args.mode} vs float): {cs:.5f}")
        ok = cs >= 0.95
        print("PASS" if ok else "FAIL")
        return 0 if ok else 1
    print("PASS")
    return 0


def run_checkpoint(args):
    """Real-weights generation: CTBM model dir + bundled tokenizer."""
    from csinn2_tpu.llm.json_io import load_llm
    from csinn2_tpu.llm.tokenizer import load_tokenizer
    from csinn2_tpu.utils.platform import backend_summary

    t0 = time.perf_counter()
    cfg, params = load_llm(args.ckpt)
    tok = load_tokenizer(args.ckpt)
    print(f"== {args.ckpt}: dim={cfg.dim} L={cfg.n_layers} "
          f"V={cfg.vocab_size} on {backend_summary()} "
          f"(load {time.perf_counter()-t0:.1f}s) ==")

    eng = InferenceEngine(cfg, params, batch=1, quantized_kv=args.quant_kv)
    ids = tok.encode(args.prompt, bos=True)
    print(f"prompt → {len(ids)} tokens")

    t0 = time.perf_counter()
    out = eng.generate_fused(ids, max_new_tokens=args.tokens,
                             temperature=args.temperature)
    dt = time.perf_counter() - t0
    print(tok.decode(list(ids) + [int(t) for t in out]))
    print(f"[{args.tokens} tokens in {dt:.2f}s incl compile]")
    tps = eng.benchmark_decode_device(iters=64)
    print(f"decode throughput (device loop): {tps:.1f} tokens/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
