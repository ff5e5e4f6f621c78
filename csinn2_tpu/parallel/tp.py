"""Tensor-parallel Llama over a device mesh via shard_map.

Sharding layout (the scaling-book "Megatron" recipe, net-new vs the
single-core reference — SURVEY.md §2 parallelism note):

  wq/wk/wv : [D, H·Dh]  column-sharded (heads split across tp)
  wo       : [H·Dh, D]  row-sharded    → psum after wo
  w1/w3    : [D, F]     column-sharded (F split)
  w2       : [F, D]     row-sharded    → psum after w2
  output   : [D, V]     column-sharded → all-gather logits
  KV cache : [L, B, S, H_kv, Dh] head-sharded (each device attends its heads)
  embedding, norms, residual stream: replicated

Two collectives per layer (psum after wo, psum after w2) + one all-gather at
the head — all riding ICI inside jit-scheduled async collectives.

shard_map (not bare GSPMD jit) is used so the Pallas quantized GEMM and flash
attention kernels run on local shards.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from csinn2_tpu.llm.config import LlamaConfig
from csinn2_tpu.llm.model import KVCache, QWeight, llama_forward


def local_config(cfg: LlamaConfig, tp: int) -> LlamaConfig:
    """Per-device config under head/ffn sharding."""
    assert cfg.n_heads % tp == 0 and cfg.n_kv_heads % tp == 0 \
        and cfg.ffn_dim % tp == 0 and cfg.vocab_size % tp == 0, \
        f"config not divisible by tp={tp}"
    return dataclasses.replace(cfg, n_heads=cfg.n_heads // tp,
                               n_kv_heads=cfg.n_kv_heads // tp,
                               ffn_dim=cfg.ffn_dim // tp)


def _qw_spec_for(qw: QWeight, col_sharded: bool, axis: str = "tp",
                 ep_axis: Optional[str] = None) -> QWeight:
    """PartitionSpec QWeight for a 2-D [K, N] weight (dense) or 3-D [E, K, N]
    stacked-expert weight (MoE; E sharded over ep_axis when given) —
    col_sharded splits N over `axis`, else K (row)."""
    from csinn2_tpu.llm.model import FLOAT, INT4_CHANNEL, INT8_CHANNEL
    moe = hasattr(qw.values, "ndim") and qw.values.ndim == 3
    e = (ep_axis,) if moe else ()
    if col_sharded:
        v = P(*e, None, axis)
        if qw.mode == FLOAT:
            s = None
        elif qw.mode in (INT8_CHANNEL, INT4_CHANNEL):
            s = P(*e, axis)            # [N]
        else:
            s = P(*e, None, axis)      # [K/32, N]
    else:
        v = P(*e, axis, None)
        if qw.mode == FLOAT:
            s = None
        elif qw.mode in (INT8_CHANNEL, INT4_CHANNEL):
            s = P(*e)                  # [N] replicated over tp
        else:
            s = P(*e, axis, None)      # [K/32, N]
    return QWeight(values=v, scales=s, mode=qw.mode, packed=qw.packed)


def param_specs(params, axis: str = "tp", ep_axis: Optional[str] = None) -> dict:
    """PartitionSpec pytree for a Llama params pytree.  Handles the fused
    wqkv/w13 weights (their N axis is tp-interleaved by fuse_params(tp=…),
    so plain column sharding is correct) and MoE layers (gate replicated,
    stacked expert weights sharded over ep_axis and, within each expert,
    over tp — TP×EP composition)."""
    col = dict(col_sharded=True, axis=axis, ep_axis=ep_axis)
    row = dict(col_sharded=False, axis=axis, ep_axis=ep_axis)
    specs = {
        "tok_embedding": P(None, None),
        "norm": P(None),
        "output": _qw_spec_for(params["output"], **col),
        "layers": [],
    }
    for lp in params["layers"]:
        ls = {"attn_norm": P(None), "ffn_norm": P(None)}
        for k in lp:
            if k in ("attn_norm", "ffn_norm"):
                continue
            if k == "gate":
                ls[k] = P(None, None)
            elif k in ("wq", "wk", "wv", "wqkv", "w1", "w3", "w13"):
                ls[k] = _qw_spec_for(lp[k], **col)
            elif k in ("wo", "w2"):
                ls[k] = _qw_spec_for(lp[k], **row)
            else:
                raise KeyError(f"no TP spec for layer weight {k}")
        specs["layers"].append(ls)
    return specs


def cache_spec() -> KVCache:
    # [L, B, S, H_kv, Dh] — heads sharded
    return KVCache(k=P(None, "dp", None, "tp", None),
                   v=P(None, "dp", None, "tp", None), scale=None)


def shard_llama_params(params, mesh: Mesh):
    """Place a params pytree onto the mesh per param_specs."""
    specs = param_specs(params)

    def place(x, spec):
        if x is None or spec is None:
            return x
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params, specs,
                                  is_leaf=lambda x: x is None)


def tp_llama_forward(mesh: Mesh, cfg: LlamaConfig,
                     use_pallas: Optional[bool] = None):
    """Build the shard_map'd forward: (params, tokens, cache, pos) →
    (logits, cache')."""
    tp = mesh.shape["tp"]
    lcfg = local_config(cfg, tp)

    def fwd(params, tokens, cache, pos):
        return llama_forward(params, tokens, cache, pos, lcfg,
                             use_pallas=use_pallas, tp_axis="tp")

    def apply(params, tokens, cache, pos):
        pspecs = param_specs(params)
        # spec pytree aux data (QWeight.mode / KVCache.scale) must equal the
        # value's aux for treedef matching
        cspec = KVCache(k=P(None, "dp", None, "tp", None),
                        v=P(None, "dp", None, "tp", None),
                        scale=cache.scale)
        in_specs = (pspecs, P("dp", None), cspec, P())
        out_specs = (P("dp", None, None), cspec)
        fn = shard_map(fwd, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        return fn(params, tokens, cache, pos)

    return apply
