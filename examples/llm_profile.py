#!/usr/bin/env python
"""Per-component attribution of the Llama prefill (TTFT) and decode steps.

The LLM analog of examples/mobilenet_profile.py (ref: the reference's
per-layer benchmark printer, source/utils/debug.c:1037-1052): times each
component of one transformer layer at the exact prefill/decode shapes with
device-side loops, scales by layer count, and compares the sum against the
measured whole step.  Guides the TTFT/decode-SOL optimization (VERDICT r2
items 1 and 3).

Usage:  python examples/llm_profile.py [prefill|decode|both] [--mode q8_0]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def device_time(fn, args, iters=256, reps=4):
    """Device-loop marginal timing; consumes a checksum of the FULL output
    (sum), so XLA cannot dead-code-eliminate any part of the computation
    (a [:8] slice checksum lets XLA DCE whole GEMM columns — measured
    'impossible' 2451 TFLOPS before this fix).  iters must push the marginal
    well past the tunnel's ~0.5-1 ms RPC jitter: at 32 iters a 50 us
    component is a 1.6 ms marginal and the sweep printed >peak TFLOPS."""
    staged = [jax.device_put(jnp.stack([a, a])) for a in args]
    staged = jax.block_until_ready(staged)

    # traced loop count: ONE compile serves both loop lengths
    @jax.jit
    def jfn(n, *st):
        def body(i, acc):
            ins = [jax.lax.dynamic_index_in_dim(s, i % 2, 0, keepdims=False)
                   for s in st]
            out = fn(*ins)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
                             if jnp.issubdtype(l.dtype, jnp.floating)
                             or jnp.issubdtype(l.dtype, jnp.integer))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def fetch(n):
        t0 = time.perf_counter()
        np.asarray(jfn(jnp.int32(n), *staged))
        return time.perf_counter() - t0

    fetch(2); fetch(2 + iters)
    t_s = min(fetch(2) for _ in range(reps))
    t_l = min(fetch(2 + iters) for _ in range(reps))
    return max(t_l - t_s, 1e-12) / iters


def profile_phase(cfg, mode, s, kv_bound, label):
    """Time each component of one layer at [b=1, s] with the given KV bound,
    plus the non-layer pieces (embedding, final norm, lm_head)."""
    from csinn2_tpu.kernels.flash_attention import flash_attention
    from csinn2_tpu.kernels.qmatmul import quant_matmul
    from csinn2_tpu.llm.model import (init_params_device, fuse_layer_weights,
                                      rms_norm, rope_rotate)

    D, F, V = cfg.dim, cfg.ffn_dim, cfg.vocab_size
    hq, hk, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    L = cfg.n_layers
    rng = np.random.default_rng(0)

    # one layer of real quantized weights (fused like the engine)
    one = jax.tree_util.tree_map(
        lambda x: x, init_params_device(
            type(cfg)(**{**cfg.__dict__, "n_layers": 1}), mode=mode, seed=0))
    lp = fuse_layer_weights(one["layers"][0])
    out_w = one["output"]

    x = jnp.asarray(rng.standard_normal((1, s, D)), jnp.bfloat16)
    xf = jnp.asarray(rng.standard_normal((1, s, D)), jnp.float32)
    h_ffn = jnp.asarray(rng.standard_normal((1, s, F)), jnp.bfloat16)
    nw = jnp.ones((D,), jnp.float32)
    q4 = jnp.asarray(rng.standard_normal((1, s, hq, dh)), jnp.bfloat16)
    kc = jnp.asarray(rng.integers(-127, 127, (1, hk, kv_bound, dh)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 127, (1, hk, kv_bound, dh)), jnp.int8)
    qt = jnp.asarray(rng.standard_normal((1, hq, s, dh)), jnp.bfloat16)
    toks = jnp.asarray(rng.integers(0, V, (1, s)), jnp.int32)
    emb = one["tok_embedding"]

    x2 = x.reshape(s, D)
    h2 = h_ffn.reshape(s, F)

    def glin(qw):
        def f(a):
            return quant_matmul(a, qw.values, qw.scales,
                                scale_mode="block" if qw.mode in ("q8_0", "q4_0")
                                else "channel",
                                packed_int4=qw.packed, out_dtype=jnp.float32)
        return f

    rows = []

    def add(name, t, n=1, note=""):
        rows.append((name, t, n, note))

    add("rms_norm [1,%d,%d]" % (s, D),
        device_time(lambda a: rms_norm(a, nw, cfg.norm_eps), [xf]), 2 * L + 1)
    add("rope [1,%d,%d,%d]" % (s, hq, dh),
        device_time(lambda a: rope_rotate(a, jnp.arange(s), cfg.rope_base),
                    [q4]), 2 * L)
    add("wqkv GEMM %dx%d" % (D, lp["wqkv"].shape[-1]),
        device_time(glin(lp["wqkv"]), [x2]), L)
    add("wo GEMM %dx%d" % (D, D), device_time(glin(lp["wo"]), [x2]), L)
    add("w13 GEMM %dx%d" % (D, lp["w13"].shape[-1]),
        device_time(glin(lp["w13"]), [x2]), L)
    add("w2 GEMM %dx%d" % (F, D), device_time(glin(lp["w2"]), [h2]), L)
    add("flash_attn q%d kv%d" % (s, kv_bound),
        device_time(lambda a: flash_attention(
            a, kc, vc, causal=True, q_offset=0, kv_len=kv_bound,
            kv_scale=0.05), [qt]), L)
    add("silu*mul [1,%d,%d]" % (s, F),
        device_time(lambda a: jax.nn.silu(a[..., :F // 2].astype(jnp.float32))
                    * a[..., F // 2:].astype(jnp.float32), [h_ffn]), L)
    add("embedding lookup", device_time(lambda t: emb[t], [toks]), 1)
    add("lm_head GEMM %dx%d" % (D, V), device_time(glin(out_w), [x2]), 1)

    print(f"\n== {label}: per-layer components x n ==")
    total = 0.0
    for name, t, n, note in sorted(rows, key=lambda r: -r[1] * r[2]):
        tt = t * n
        total += tt
        print(f"  {name:34s} {t*1e6:9.1f} us x{n:3d} = {tt*1e3:8.3f} ms {note}")
    print(f"  {'SUM OF PARTS':34s} {'':9s}      = {total*1e3:8.3f} ms")
    return total


def profile_whole(cfg, params, mode):
    from csinn2_tpu.llm.engine import InferenceEngine
    eng = InferenceEngine(cfg, params, batch=1, quantized_kv=True)
    prompt = list(np.random.default_rng(0).integers(1, cfg.vocab_size, 128))
    eng.generate(prompt, max_new_tokens=1)   # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        eng.prefill(0, prompt)
        jax.block_until_ready(eng.cache.k)
        ts.append(time.perf_counter() - t0)
    ttft = float(np.median(ts))
    print(f"\n== whole prefill (eng.prefill, prompt 128): {ttft*1e3:.1f} ms ==")

    tps = eng.benchmark_decode_device(iters=64)
    print(f"== whole decode: {tps:.1f} tok/s = {1e3/tps:.3f} ms/tok ==")
    return ttft, tps


def main():
    from csinn2_tpu.llm.config import LlamaConfig
    from csinn2_tpu.llm.model import init_params_device

    phase = sys.argv[1] if len(sys.argv) > 1 else "both"
    mode = "q8_0"
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
    print(f"# backend: {jax.default_backend()}  mode={mode}", flush=True)

    cfg = LlamaConfig.llama2_7b()
    if phase in ("prefill", "both"):
        profile_phase(cfg, mode, s=128, kv_bound=256, label="prefill s=128")
    if phase in ("decode", "both"):
        profile_phase(cfg, mode, s=1, kv_bound=256, label="decode s=1 kv=256")
    if phase == "whole":
        params = jax.block_until_ready(
            init_params_device(cfg, mode=mode, seed=0))
        profile_whole(cfg, params, mode)


if __name__ == "__main__":
    main()
