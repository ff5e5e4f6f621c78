#!/usr/bin/env python
"""TTFT (prefill) component attribution at 7B s=128.

Device per-op XPlane events are not exported over the axon tunnel (the
trace contains one XLA-Modules event), so each component of the prefill
step is timed STANDALONE with the device-loop marginal harness and compared
against the whole-step time from benchmark_prefill_device.  Standalone sums
ignore XLA cross-op fusion, so sum >= whole-step is expected — the value is
the RANKING (same methodology as examples/mobilenet_profile.py).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(__file__.rsplit("/", 2)[0], ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from csinn2_tpu.kernels.qmatmul import quant_matmul, BLOCK  # noqa: E402
from csinn2_tpu.kernels.flash_attention import flash_attention  # noqa: E402
from csinn2_tpu.llm.model import rms_norm, rope_rotate  # noqa: E402


def device_time(fn, args, iters=128, reps=3):
    staged = [jax.device_put(jnp.stack([a, a])) for a in args]
    staged = jax.block_until_ready(staged)

    @jax.jit
    def jfn(n, *st):
        def body(i, acc):
            ins = [jax.lax.dynamic_index_in_dim(s, i % 2, 0, keepdims=False)
                   for s in st]
            out = fn(*ins)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
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
    rng = np.random.default_rng(0)
    D, F, V = 4096, 11008, 32000
    hq = hk = 32
    dh = 128
    s, bound = 128, 256
    L = 32
    print(f"# 7B prefill s={s} components (per-call; x{L} for per-layer rows)",
          flush=True)

    def q8(K, N):
        w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        sc = jnp.asarray(rng.random((K // BLOCK, N)) * 0.01 + 0.005, jnp.float32)
        return w, sc

    x = jnp.asarray(rng.standard_normal((s, D)), jnp.bfloat16)
    rows = []

    # --- GEMMs (per layer) ---
    for name, K, N in [("wqkv", D, 12288), ("wo", D, D),
                       ("w13", D, 2 * F), ("w2", F, D)]:
        w, sc = q8(K, N)
        xx = jnp.asarray(rng.standard_normal((s, K)), jnp.bfloat16)
        t = device_time(lambda a, w=w, sc=sc: quant_matmul(
            a, w, sc, scale_mode="block"), [xx])
        fl = 2 * s * K * N
        rows.append((f"GEMM {name}", t, L, f"{fl/t/1e12:6.1f} TF"))

    # --- lm_head (once) ---
    w, sc = q8(D, V)
    t = device_time(lambda a: quant_matmul(a, w, sc, scale_mode="block"), [x])
    rows.append(("GEMM lm_head (all 128 pos)", t, 1,
                 f"{2*s*D*V/t/1e12:6.1f} TF"))
    x1 = x[:8]
    t = device_time(lambda a: quant_matmul(a, w, sc, scale_mode="block"), [x1])
    rows.append(("GEMM lm_head (last tok)", t, 1, ""))

    # --- RoPE (per layer: q and k) ---
    qv = jnp.asarray(rng.standard_normal((1, s, hq, dh)), jnp.bfloat16)
    pos = jnp.arange(s, dtype=jnp.int32)
    t = device_time(lambda a: rope_rotate(a, pos, 10000.0), [qv])
    rows.append(("rope_rotate (1 call)", t, 2 * L, ""))

    # --- RMSNorm (per layer x2 + final) ---
    xf = jnp.asarray(rng.standard_normal((1, s, D)), jnp.bfloat16)
    wn = jnp.ones((D,), jnp.float32)
    t = device_time(lambda a: rms_norm(a, wn, 1e-5), [xf])
    rows.append(("rms_norm", t, 2 * L + 1, ""))

    # --- flash attention (per layer) ---
    qt = jnp.asarray(rng.standard_normal((1, hq, s, dh)), jnp.bfloat16)
    kt = jnp.asarray(rng.integers(-127, 128, (1, hk, bound, dh)), jnp.int8)
    vt = jnp.asarray(rng.integers(-127, 128, (1, hk, bound, dh)), jnp.int8)
    t = device_time(lambda a: flash_attention(
        a, kt, vt, causal=True, q_offset=jnp.int32(0), kv_len=jnp.int32(s),
        kv_scale=0.05), [qt])
    rows.append(("flash_attention prefill", t, L, ""))

    # --- transposes (per layer: ktall/vtall int8 + q + out) ---
    t = device_time(lambda a: jnp.transpose(a, (0, 2, 1, 3)), [qv])
    rows.append(("transpose q/out bf16 [1,128,32,128]", t, 2 * L, ""))
    kall = jnp.asarray(rng.integers(-127, 128, (1, bound, hk, dh)), jnp.int8)
    t = device_time(lambda a: jnp.transpose(a, (0, 2, 1, 3)), [kall])
    rows.append(("transpose k/v int8 [1,256,32,128]", t, 2 * L, ""))

    # --- KV quantize + scatter (per layer) ---
    kv_new = jnp.asarray(rng.standard_normal((1, s, hk, dh)), jnp.float32)
    big = jnp.zeros((L, 1, bound, hk, dh), jnp.int8)

    def store(kn, buf):
        q8v = jnp.clip(jnp.round(kn / 0.05), -127, 127).astype(jnp.int8)
        return jax.lax.dynamic_update_slice(buf, q8v[None], (0, 0, 0, 0, 0))
    t = device_time(lambda a: store(a, big), [kv_new])
    rows.append(("KV quant+scatter (k or v)", t, 2 * L, ""))

    # --- embedding + residual adds ---
    emb = jnp.asarray(rng.standard_normal((V, D)), jnp.bfloat16)
    tok = jnp.ones((1, s), jnp.int32)
    t = device_time(lambda a: emb[a], [tok])
    rows.append(("embedding gather", t, 1, ""))
    t = device_time(lambda a: (a + a.astype(jnp.float32).astype(jnp.bfloat16)),
                    [xf])
    rows.append(("residual add", t, 2 * L, ""))

    total = 0.0
    for name, t, mult, extra in rows:
        total += t * mult
        print(f"  {name:38s}: {t*1e6:8.1f} us x{mult:3d} = "
              f"{t*mult*1e3:7.3f} ms  {extra}", flush=True)
    print(f"  SUM (standalone): {total*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
