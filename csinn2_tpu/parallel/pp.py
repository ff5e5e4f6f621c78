"""Pipeline parallelism: transformer layers split into stages across devices.

Net-new capability (SURVEY.md §2 parallelism note).  Inference-oriented
GPipe-style design: each stage owns a contiguous slice of layers (stage 0
adds the embedding, the last stage adds final norm + lm_head), its params
and KV-cache slice live on its own device, and the host streams microbatches
through the stages.  Because jax dispatch is asynchronous, issuing
microbatch m+1 to stage 0 while microbatch m executes on stage 1 overlaps
for real — the host loop only enqueues work; cross-stage activations move
device-to-device via jax.device_put (ICI on TPU).

Interplay with the rest of the 5-axis story: PP composes with TP/DP by
handing each stage a submesh instead of a single device; this module keeps
one device per stage (the dryrun/CI shape) for clarity.
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp

from csinn2_tpu.llm.config import LlamaConfig
from csinn2_tpu.llm.model import (
    KVCache, attention_block, ffn_block, linear, moe_ffn_block, rms_norm,
)


class PipelinedLlama:
    def __init__(self, params, cfg: LlamaConfig, devices: Sequence[Any],
                 n_stages: Optional[int] = None,
                 use_pallas: Optional[bool] = None):
        n_stages = n_stages or len(devices)
        assert cfg.n_layers % n_stages == 0, \
            f"n_layers={cfg.n_layers} not divisible by {n_stages} stages"
        assert len(devices) >= n_stages
        self.cfg = cfg
        self.n_stages = n_stages
        self.devices = list(devices[:n_stages])
        self.per_stage = cfg.n_layers // n_stages
        self.use_pallas = use_pallas

        # place each stage's params on its device
        self.stage_params: List[dict] = []
        for s in range(n_stages):
            dev = self.devices[s]
            sp = {"layers": jax.device_put(
                params["layers"][s * self.per_stage:(s + 1) * self.per_stage],
                dev)}
            if s == 0:
                sp["tok_embedding"] = jax.device_put(params["tok_embedding"], dev)
            if s == n_stages - 1:
                sp["norm"] = jax.device_put(params["norm"], dev)
                sp["output"] = jax.device_put(params["output"], dev)
            self.stage_params.append(sp)

        self._fns = [self._make_stage_fn(s) for s in range(n_stages)]

    def _make_stage_fn(self, s: int):
        cfg = self.cfg
        first = s == 0
        last = s == self.n_stages - 1
        use_pallas = self.use_pallas

        def stage(sp, x, cache: KVCache, pos):
            if first:
                x = sp["tok_embedding"][x]           # tokens → [b, s, D]
            for i, lp in enumerate(sp["layers"]):
                h = rms_norm(x, lp["attn_norm"], cfg.norm_eps)
                attn_out, cache = attention_block(
                    h.astype(jnp.bfloat16), lp, cache, i, pos, cfg, use_pallas)
                x = x + attn_out.astype(x.dtype)
                h = rms_norm(x, lp["ffn_norm"], cfg.norm_eps)
                if "gate" in lp:
                    f = moe_ffn_block(h.astype(jnp.bfloat16), lp, cfg, use_pallas)
                else:
                    f = ffn_block(h.astype(jnp.bfloat16), lp, use_pallas)
                x = x + f.astype(x.dtype)
            if last:
                x = rms_norm(x, sp["norm"], cfg.norm_eps)
                x = linear(x.astype(jnp.bfloat16), sp["output"],
                           use_pallas=use_pallas)
            return x, cache

        with jax.default_device(self.devices[s]):
            return jax.jit(stage)

    def init_caches(self, batch: int, quantized: bool = False) -> List[KVCache]:
        """Per-stage KV caches ([per_stage, b, S, hk, dh]) on stage devices."""
        import dataclasses
        sub_cfg = dataclasses.replace(self.cfg, n_layers=self.per_stage)
        return [jax.device_put(KVCache.create(sub_cfg, batch, quantized),
                               self.devices[s]) for s in range(self.n_stages)]

    def __call__(self, tokens, caches: List[KVCache], pos,
                 microbatches: int = 1):
        """tokens [b, s] → (logits [b, s, V], caches').  b must divide into
        `microbatches` chunks; chunks stream through the stages (async
        dispatch overlaps stage execution across chunks)."""
        b = tokens.shape[0]
        assert b % microbatches == 0
        chunks = jnp.split(jnp.asarray(tokens), microbatches, axis=0)
        # per-microbatch cache rows
        mb_caches = [[KVCache(k=jnp.split(c.k, microbatches, axis=1)[m],
                              v=jnp.split(c.v, microbatches, axis=1)[m],
                              scale=c.scale)
                      for c in caches] for m in range(microbatches)]

        outs = []
        for m, chunk in enumerate(chunks):
            h = chunk
            for s in range(self.n_stages):
                h = jax.device_put(h, self.devices[s])
                h, mb_caches[m][s] = self._fns[s](self.stage_params[s], h,
                                                  mb_caches[m][s], pos)
            outs.append(h)
        logits = jnp.concatenate([jax.device_put(o, self.devices[-1])
                                  for o in outs], axis=0)
        new_caches = [KVCache(
            k=jnp.concatenate([mb_caches[m][s].k for m in range(microbatches)],
                              axis=1),
            v=jnp.concatenate([mb_caches[m][s].v for m in range(microbatches)],
                              axis=1),
            scale=caches[s].scale) for s in range(self.n_stages)]
        return logits, new_caches
