"""Op dispatch registry: (op, scheme, api) → implementation.

TPU-native re-expression of the reference's callback-table dispatch
(ref: shl_op_callback_map / shl_cb_func_table, source/nn2/setup.c:97-124, and
the per-target `shl_cb_map_*` chains like rvm→rvv→ref,
source/thead_rvv/setup.c:43-57).  The reference's 19-ISA matrix collapses on
TPU to a lowering choice per op: a hand Pallas kernel if one is registered and
profitable (the `caps` arbitration analog, ref: shl_gref_best_callback,
source/graph_ref/setup.c:617-652), else the XLA/jnp implementation.

All implementations are *functional*: f(inputs_f32_or_q, params) → arrays.
Quantized execution wrapping (dequant→f32→requant) happens in ops/api.py,
mirroring shl_ref_conv_callback_base (ref: source/reference/utils.c:609-650).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

from csinn2_tpu.core.dtypes import Api, QuantScheme


@dataclasses.dataclass
class OpCallback:
    """(ref: struct csinn_callback {init, est, exec, caps, perf},
    csinn_data_structure.h:557-563).  `init` becomes the weight-prepack hook,
    `exec` the lowering, `caps` a profitability predicate."""

    exec: Callable
    init: Optional[Callable] = None       # weight prepack: params → params'
    caps: Optional[Callable] = None       # (metas, params) → bool: is this kernel applicable?
    api: Api = Api.XLA
    name: str = ""
    quant_direct: bool = False            # kernel consumes integer carriers + qinfos directly


class OpRegistry:
    def __init__(self):
        # op → {api → OpCallback}; scheme-specific overrides op+"@"+scheme
        self._table: Dict[str, Dict[Api, OpCallback]] = {}

    def register(self, op: str, fn: Callable = None, *, api: Api = Api.XLA,
                 scheme: Optional[QuantScheme] = None, init: Callable = None,
                 caps: Callable = None, quant_direct: bool = False):
        """Register an implementation; usable as decorator."""
        def do(fn):
            key = f"{op}@{scheme.value}" if scheme else op
            self._table.setdefault(key, {})[api] = OpCallback(
                exec=fn, init=init, caps=caps, api=api,
                name=f"{key}:{api.value}", quant_direct=quant_direct)
            return fn
        return do(fn) if fn is not None else do

    def lookup(self, op: str, scheme: Optional[QuantScheme] = None,
               api: Api = Api.AUTO, metas=None, params=None) -> OpCallback:
        """Resolve with fallback chain PALLAS → XLA (the rvv→ref analog).

        AUTO prefers the Pallas kernel when its `caps` accepts the shapes.
        Config-gated keys (the Kconfig CONFIG_*_DISABLED analog) are skipped,
        forcing the fallback chain."""
        from csinn2_tpu.utils.config import config
        cands = {}
        if scheme is not None and not config.is_disabled(op, scheme.value):
            cands.update(self._table.get(f"{op}@{scheme.value}", {}))
        base = self._table.get(op, {})
        for k, v in base.items():
            cands.setdefault(k, v)
        if not cands:
            raise NotImplementedError(f"op '{op}' has no registered implementation")
        if api in (Api.PALLAS, Api.XLA, Api.REF):
            if api in cands:
                return cands[api]
            if api == Api.PALLAS and Api.XLA in cands:
                return cands[Api.XLA]   # fallback chain
            if Api.REF in cands and api != Api.PALLAS:
                return cands[Api.REF]
            raise NotImplementedError(f"op '{op}' has no {api.value} implementation")
        # AUTO
        pal = cands.get(Api.PALLAS)
        if pal is not None:
            if pal.caps is None or pal.caps(metas, params):
                return pal
        return cands.get(Api.XLA) or cands.get(Api.REF) or pal

    def ops(self):
        return sorted({k.split("@")[0] for k in self._table})

    def has(self, op: str) -> bool:
        return op in self._table or any(k.startswith(op + "@") for k in self._table)


registry = OpRegistry()
