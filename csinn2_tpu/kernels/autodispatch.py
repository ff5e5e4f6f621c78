"""Cost-model arbitration: register Pallas kernels as PALLAS-api callbacks
with profitability predicates so AUTO dispatch picks them when they win.

This is the TPU analog of the reference's best-callback arbitration
(ref: shl_gref_best_callback, source/graph_ref/setup.c:617-652 — prefer the
specialized kernel unless `caps` says the shapes don't qualify) collapsed to
one question per op: Pallas hand kernel or XLA-HLO lowering?

The `caps` predicates encode a simple roofline argument instead of the
reference's CSINN_OPT_* capability tiers:

  * flash SDPA: profitable once the S×S score matrix would spill out of
    VMEM under the XLA lowering (long sequences) AND we're actually on TPU —
    the Pallas kernel never materializes scores (blocked online softmax).
  * block-quant GEMM (Q8_0/Q4_0): XLA has no native sub-channel-scale
    dot_general; dequantizing to f32 in HLO doubles HBM traffic on the
    weight stream.  The Pallas kernel dequantizes in-register, so it wins
    whenever the weight is block-quantized — shape-independent.

Importing this module populates the registry (done in kernels/__init__).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csinn2_tpu.core.dtypes import Api, MemType, QuantScheme
from csinn2_tpu.kernels.flash_attention import flash_attention
from csinn2_tpu.kernels.qmatmul import quant_matmul
from csinn2_tpu.ops.params import SDPAParams
from csinn2_tpu.ops.registry import registry


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# --- flash attention as the PALLAS sdpa callback -----------------------------

def _sdpa_caps(metas, params) -> bool:
    if not _on_tpu() or metas is None or len(metas) < 3:
        return False
    sq = metas[0].shape[-2]
    sk = metas[1].shape[-2]
    d = metas[0].shape[-1]
    if d > 256:
        return False
    if params is not None and (getattr(params, "kv_len", 0)
                               or getattr(params, "pos_offset", 0)):
        # decode over a static partially-filled cache: the kernel's masked
        # kv_len skips dead-score work regardless of total size
        return True
    # below this the whole score tile fits VMEM and XLA's fusion is as fast;
    # above it the Pallas kernel avoids materializing [sq, sk] scores
    return sq * sk >= 128 * 512


def _sdpa_pallas(q, k, v, params: SDPAParams):
    scale = params.norm_factor if params.norm_factor else None
    kv_len = getattr(params, "kv_len", 0) or None   # 0 → full sk
    return flash_attention(jnp.asarray(q, jnp.bfloat16),
                           jnp.asarray(k, jnp.bfloat16),
                           jnp.asarray(v, jnp.bfloat16),
                           causal=params.causal, q_offset=params.pos_offset,
                           kv_len=kv_len,
                           scale=scale).astype(jnp.float32)


registry.register("scaled_dot_product_attention", _sdpa_pallas,
                  api=Api.PALLAS, caps=_sdpa_caps)


# --- block-quant GEMM as the PALLAS matmul/fc callback -----------------------

_BLOCK = (MemType.BLOCK_Q4_0, MemType.BLOCK_Q8_0,
          MemType.BLOCK_Q4_0_REARRANGE, MemType.BLOCK_Q8_0_REARRANGE)


def _block_caps(metas, params) -> bool:
    return (_on_tpu() and metas is not None and len(metas) >= 2
            and metas[1].mem_type in _BLOCK)


def _block_matmul(arrays, metas, params, out_qinfo, **extra):
    """Weight is a (int8/int4-as-int8 values, f16 scales) pair; activation
    float.  In-register dequant fused into the GEMM epilogue
    (ref: shl_c920_matmul_a0b1_fp16_block_quant,
    source/c920_opt/fp16/matmul_fp16.c:304-347)."""
    x = arrays[0]
    values, scales = arrays[1]
    bias = arrays[2] if len(arrays) > 2 and arrays[2] is not None else None
    # weight stored [N, K] row-major like the reference's b1 operand;
    # quant_matmul wants [K, N] with scales [K/32, N]
    w = values.T
    s = scales.T if scales.ndim == 2 else scales
    y = quant_matmul(jnp.asarray(x, jnp.bfloat16), w, s,
                     scale_mode="block")
    if bias is not None:
        y = y + jnp.asarray(bias, y.dtype)
    if out_qinfo is not None and not out_qinfo.dtype.is_float:
        so = jnp.float32(out_qinfo.scale)
        zo = jnp.float32(out_qinfo.zero_point)
        q = jnp.clip(jnp.round(y.astype(jnp.float32) / so) + zo,
                     out_qinfo.dtype.qmin, out_qinfo.dtype.qmax)
        return q.astype(out_qinfo.dtype.jnp)
    return y


for _op in ("matmul", "fullyconnected"):
    registry.register(_op, _block_matmul, api=Api.PALLAS,
                      caps=_block_caps, quant_direct=True)
