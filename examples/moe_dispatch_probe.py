#!/usr/bin/env python
"""Measured dense-no-drop vs routed MoE dispatch at inference batch sizes.

The dense formulation (llm/model.py moe_ffn_block) computes every expert on
every token (E/k× the routed FLOPs); the routed formulation
(moe_ffn_block_routed) pays dispatch/combine einsums + gather/scatter to
compute only cap = T·k/E·factor tokens per expert.  This probe records which
wins per token count T on real hardware — the engine default follows the
measurement (PARITY.md), not intuition.  E=8 / top-2, 7B-class expert shapes.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from csinn2_tpu.llm.config import LlamaConfig
from csinn2_tpu.llm.model import (FLOAT, init_params, moe_ffn_block,
                                  moe_ffn_block_routed)


def device_time(fn, args, consts=None, iters=192, reps=4):
    # iters must push the marginal past the tunnel's ~0.5-1 ms RPC jitter
    # (at 16 iters a 50 us kernel is an unmeasurable 0.8 ms marginal).
    # `consts` (a pytree of weights) is threaded through as a jit ARGUMENT:
    # closing over 540 MB of expert weights captures them as lowering
    # constants that get shipped to the (remote) compiler — HTTP 413.
    staged = [jax.device_put(jnp.stack([a, a])) for a in args]
    staged = jax.block_until_ready(staged)

    @jax.jit
    def jfn(n, consts, *st):
        def body(i, acc):
            ins = [jax.lax.dynamic_index_in_dim(s, i % 2, 0, keepdims=False)
                   for s in st]
            return acc + jnp.sum(fn(*ins, consts).astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def fetch(n):
        t0 = time.perf_counter()
        np.asarray(jfn(jnp.int32(n), consts, *staged))
        return time.perf_counter() - t0

    fetch(2); fetch(2 + iters)
    t_s = min(fetch(2) for _ in range(reps))
    t_l = min(fetch(2 + iters) for _ in range(reps))
    return max(t_l - t_s, 1e-12) / iters


def main():
    print(f"# backend: {jax.default_backend()}", flush=True)
    E, k = 8, 2
    cfg = LlamaConfig(dim=4096, n_layers=1, n_heads=32, n_kv_heads=32,
                      ffn_dim=11008 // 4, vocab_size=256, max_seq_len=64,
                      n_experts=E, moe_top_k=k)
    params = init_params(cfg, mode=FLOAT, seed=0)
    lp = params["layers"][0]
    rng = np.random.default_rng(0)

    print(f"E={E} top-{k}, dim={cfg.dim}, ffn={cfg.ffn_dim} (bf16 experts)",
          flush=True)
    for T in (8, 32, 128, 512):
        x = jnp.asarray(rng.standard_normal((1, T, cfg.dim)), jnp.bfloat16)
        td = device_time(lambda a, _lp: moe_ffn_block(a, _lp, cfg), [x],
                         consts=lp)
        tr = device_time(lambda a, _lp: moe_ffn_block_routed(
            a, _lp, cfg, capacity_factor=2.0), [x], consts=lp)
        win = "routed" if tr < td else "dense"
        print(f"T={T:4d}: dense {td*1e6:9.1f} us   routed {tr*1e6:9.1f} us "
              f"  routed/dense = {tr/td:5.2f}x  -> {win}", flush=True)


if __name__ == "__main__":
    main()
