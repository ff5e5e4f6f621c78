"""Expert parallelism: MoE experts sharded over an `ep` mesh axis.

Net-new capability (SURVEY.md §2 parallelism note — the reference is a
single-core inference library; EP is mandated by the BASELINE north star).

Layout: every layer's stacked expert weights w1/w2/w3 [E, K, N] shard their
expert axis across `ep`; attention weights, gate, embedding and norms are
replicated.  The dense no-drop MoE formulation (llm/model.py moe_ffn_block)
needs exactly one psum per FFN sublayer — each device computes its E/ep
experts on all tokens, scales by the router weights of those experts, and
the psum sums expert contributions across the mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from csinn2_tpu.llm.config import LlamaConfig
from csinn2_tpu.llm.model import FLOAT, KVCache, QWeight, llama_forward


def _qw_replicated(qw: QWeight) -> QWeight:
    return QWeight(values=P(None, None),
                   scales=None if qw.scales is None else P(*([None] * qw.scales.ndim)),
                   mode=qw.mode, packed=qw.packed)


def _qw_expert_sharded(qw: QWeight, axis: str = "ep") -> QWeight:
    v = P(*(axis,) + (None,) * (qw.values.ndim - 1))
    s = None if qw.scales is None else P(*(axis,) + (None,) * (qw.scales.ndim - 1))
    return QWeight(values=v, scales=s, mode=qw.mode, packed=qw.packed)


def ep_param_specs(params) -> dict:
    specs = {
        "tok_embedding": P(None, None),
        "norm": P(None),
        "output": _qw_replicated(params["output"]),
        "layers": [],
    }
    for lp in params["layers"]:
        ls = {
            "attn_norm": P(None),
            "ffn_norm": P(None),
            "gate": P(None, None),
            "wq": _qw_replicated(lp["wq"]),
            "wk": _qw_replicated(lp["wk"]),
            "wv": _qw_replicated(lp["wv"]),
            "wo": _qw_replicated(lp["wo"]),
            "w1": _qw_expert_sharded(lp["w1"]),
            "w2": _qw_expert_sharded(lp["w2"]),
            "w3": _qw_expert_sharded(lp["w3"]),
        }
        specs["layers"].append(ls)
    return specs


def shard_moe_params(params, mesh: Mesh):
    specs = ep_param_specs(params)

    def place(x, spec):
        if x is None or spec is None:
            return x
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params, specs,
                                  is_leaf=lambda x: x is None)


def ep_llama_forward(mesh: Mesh, cfg: LlamaConfig,
                     use_pallas: Optional[bool] = None):
    """Build the shard_map'd MoE forward: (params, tokens, cache, pos) →
    (logits, cache').  Attention/cache are computed replicated on every ep
    device (identical inputs → identical results); only the experts split."""
    assert cfg.n_experts % mesh.shape["ep"] == 0, \
        f"n_experts={cfg.n_experts} not divisible by ep={mesh.shape['ep']}"

    def fwd(params, tokens, cache, pos):
        return llama_forward(params, tokens, cache, pos, cfg,
                             use_pallas=use_pallas, ep_axis="ep")

    def apply(params, tokens, cache, pos):
        pspecs = ep_param_specs(params)
        cspec = KVCache(k=P(None, None, None, None, None),
                        v=P(None, None, None, None, None), scale=cache.scale)
        fn = shard_map(fwd, mesh=mesh,
                       in_specs=(pspecs, P(None, None), cspec, P()),
                       out_specs=(P(None, None, None), cspec),
                       check_vma=False)
        return fn(params, tokens, cache, pos)

    return apply
