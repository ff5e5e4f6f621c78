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
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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


# ---------------------------------------------------------------------------
# SPMD pipeline: ONE executable, ppermute ring, GPipe tick schedule
# ---------------------------------------------------------------------------

class SPMDPipelinedLlama:
    """Pipeline parallelism compiled into a single SPMD executable.

    The host-stepped PipelinedLlama above relies on async dispatch for
    overlap; this class instead expresses the whole pipeline inside one
    shard_map + lax.scan program, so overlap is *structural*: every device
    executes the identical tick loop, and at tick t stage s computes
    microbatch (t - s) while its activation output rides the ICI to stage
    s+1 via lax.ppermute.  Bubble fraction is the GPipe (P-1)/(M+P-1).

    Layer params and the KV cache shard along the LAYER axis of the 'pp'
    mesh axis (stage s owns layers [s·Lp, (s+1)·Lp)); the embedding table
    and lm head run replicated outside the pipelined region (they are <2%
    of FLOPs).  Net-new vs the reference, which is single-core sequential
    (SURVEY.md §2 parallelism note).

    PP×TP composition: give the constructor a 2-D ('pp','tp') mesh and each
    stage's layer weights additionally shard per the Megatron specs in
    parallel/tp.py (wq/wk/wv/w1/w3 column-, wo/w2 row-sharded; KV cache by
    head) — inside every tick the attention/FFN sublayers psum over 'tp'
    exactly as in tp_llama_forward, while activations ride the 'pp' ring.
    """

    def __init__(self, params, cfg: LlamaConfig, mesh: Optional[Mesh] = None,
                 n_stages: Optional[int] = None, microbatches: int = 4,
                 use_pallas: Optional[bool] = None):
        if mesh is None:
            n_stages = n_stages or jax.device_count()
            mesh = Mesh(jax.devices()[:n_stages], ("pp",))
        self.mesh = mesh
        self.P = mesh.shape["pp"]
        self.tp = int(mesh.shape["tp"]) if "tp" in mesh.axis_names else 1
        assert cfg.n_layers % self.P == 0
        self.Lp = cfg.n_layers // self.P
        self.cfg = cfg
        self.M = microbatches
        self.use_pallas = use_pallas

        # stack the per-layer dicts into one pytree with a leading layer axis
        # and shard that axis over 'pp' (requires uniform layer structure)
        keys = {frozenset(lp.keys()) for lp in params["layers"]}
        assert len(keys) == 1, "pipeline stages need uniform layer structure"
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])
        rsharding = NamedSharding(mesh, P())
        if self.tp == 1:
            self._layer_specs = P("pp")
            self.layers = jax.device_put(stacked,
                                         NamedSharding(mesh, P("pp")))
        else:
            # per-weight TP specs with the stacked layer axis prepended:
            # [L, K, N] → P('pp', <tp spec for [K, N]>)
            from csinn2_tpu.parallel.tp import param_specs
            lspec0 = param_specs(params)["layers"][0]
            self._layer_specs = jax.tree.map(
                lambda s: P("pp", *tuple(s)), lspec0)
            self.layers = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                stacked, self._layer_specs)
        self.embed = jax.device_put(params["tok_embedding"], rsharding)
        self.norm = jax.device_put(params["norm"], rsharding)
        self.output = jax.device_put(params["output"], rsharding)
        self._fn = None
        self._fn_scale = None

    def _cache_pspec(self):
        # [Lp, B, S, hk, dh]: layers over 'pp', heads over 'tp' (if present)
        return P("pp", None, None, "tp", None) if self.tp > 1 else P("pp")

    def init_cache(self, batch: int, quantized: bool = False) -> KVCache:
        cache = KVCache.create(self.cfg, batch, quantized)
        return jax.device_put(cache,
                              NamedSharding(self.mesh, self._cache_pspec()))

    def _pipeline_fn(self, kv_scale):
        cfg, Pn, Lp, M = self.cfg, self.P, self.Lp, self.M
        use_pallas = self.use_pallas
        tp_axis = "tp" if self.tp > 1 else None
        if self.tp > 1:
            from csinn2_tpu.parallel.tp import local_config
            cfg = local_config(cfg, self.tp)     # per-device head/ffn counts

        def body(layers_loc, x_mb, cache_k, cache_v, pos):
            # x_mb [M, mb, s, D] replicated; cache_[kv] local [Lp, B, S, hk, dh]
            sidx = lax.axis_index("pp")
            mb = x_mb.shape[1]

            def run_stage(x, ck, cv, m):
                sub = KVCache(
                    k=lax.dynamic_slice_in_dim(ck, m * mb, mb, axis=1),
                    v=lax.dynamic_slice_in_dim(cv, m * mb, mb, axis=1),
                    scale=kv_scale)
                y = x
                for i in range(Lp):
                    lp = jax.tree.map(lambda a: a[i], layers_loc)
                    h = rms_norm(y, lp["attn_norm"], cfg.norm_eps)
                    attn, sub = attention_block(h.astype(jnp.bfloat16), lp,
                                                sub, i, pos, cfg, use_pallas,
                                                tp_axis=tp_axis)
                    y = y + attn.astype(y.dtype)
                    h = rms_norm(y, lp["ffn_norm"], cfg.norm_eps)
                    if "gate" in lp:
                        f = moe_ffn_block(h.astype(jnp.bfloat16), lp, cfg,
                                          use_pallas, tp_axis=tp_axis)
                    else:
                        f = ffn_block(h.astype(jnp.bfloat16), lp, use_pallas,
                                      tp_axis=tp_axis)
                    y = y + f.astype(y.dtype)
                return y, sub

            def tick(carry, t):
                h, ck, cv, out_buf = carry
                m_id = t - sidx
                active = (m_id >= 0) & (m_id < M)
                m = jnp.clip(m_id, 0, M - 1)
                x_in = jnp.where(sidx == 0,
                                 lax.dynamic_index_in_dim(x_mb, m, 0,
                                                          keepdims=False), h)
                y, sub = run_stage(x_in, ck, cv, m)
                # masked write-back of this microbatch's cache rows
                old_k = lax.dynamic_slice_in_dim(ck, m * mb, mb, axis=1)
                old_v = lax.dynamic_slice_in_dim(cv, m * mb, mb, axis=1)
                ck = lax.dynamic_update_slice_in_dim(
                    ck, jnp.where(active, sub.k, old_k), m * mb, axis=1)
                cv = lax.dynamic_update_slice_in_dim(
                    cv, jnp.where(active, sub.v, old_v), m * mb, axis=1)
                # last stage records its finished microbatch
                write = active & (sidx == Pn - 1)
                cur = lax.dynamic_index_in_dim(out_buf, m, 0, keepdims=False)
                out_buf = lax.dynamic_update_index_in_dim(
                    out_buf, jnp.where(write, y, cur), m, 0)
                h_next = lax.ppermute(y, "pp",
                                      [(i, (i + 1) % Pn) for i in range(Pn)])
                return (h_next, ck, cv, out_buf), None

            h0 = jnp.zeros(x_mb.shape[1:], x_mb.dtype)
            out0 = jnp.zeros_like(x_mb)
            (h, ck, cv, out_buf), _ = lax.scan(
                tick, (h0, cache_k, cache_v, out0),
                jnp.arange(M + Pn - 1, dtype=jnp.int32))
            # only the last stage's out_buf is meaningful: zero the others
            # (free — they are already zeros, tick masks every write with
            # sidx == Pn-1) and psum once so the result comes back REPLICATED
            # ([M, mb, s, D], not a [P, M, ...] per-stage stack — the psum is
            # effectively a broadcast from the last stage, one collective)
            out = lax.psum(jnp.where(sidx == Pn - 1, out_buf, 0.0), "pp")
            return out, ck, cv

        cspec = self._cache_pspec()
        from jax.experimental.shard_map import shard_map
        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(self._layer_specs, P(), cspec, cspec, P()),
            out_specs=(P(), cspec, cspec),
            check_rep=False)
        return jax.jit(fn)

    def __call__(self, tokens, cache: KVCache, pos):
        """tokens [B, s] with B = microbatches · mb → (logits, cache')."""
        B, s = tokens.shape
        assert B % self.M == 0, (B, self.M)
        mb = B // self.M
        x = self.embed[jnp.asarray(tokens)]                     # [B, s, D]
        x_mb = x.reshape(self.M, mb, s, x.shape[-1])
        if self._fn is None or self._fn_scale != cache.scale:
            self._fn = self._pipeline_fn(cache.scale)
            self._fn_scale = cache.scale
        out, ck, cv = self._fn(self.layers, x_mb, cache.k, cache.v,
                               jnp.asarray(pos, jnp.int32))
        y = out.reshape(B, s, x.shape[-1])      # replicated last-stage output
        y = rms_norm(y, self.norm, self.cfg.norm_eps)
        logits = linear(y.astype(jnp.bfloat16), self.output,
                        use_pallas=self.use_pallas)
        return logits, KVCache(k=ck, v=cv, scale=cache.scale)
