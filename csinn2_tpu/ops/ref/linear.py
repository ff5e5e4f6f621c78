"""Dense / matmul family (ref: source/reference/fullyconnected.c, matmul.c;
fast analogs source/thead_rvv/*/gemm*.c, source/c920_opt/fp16/matmul_fp16.c)."""

from __future__ import annotations

import jax.numpy as jnp

from csinn2_tpu.core.dtypes import Api
from csinn2_tpu.ops.params import FCParams, MatmulParams
from csinn2_tpu.ops.registry import registry


@registry.register("fullyconnected", api=Api.XLA)
def fullyconnected(x, weight, bias, params: FCParams):
    """y = x @ W^T + b; weight [units, in] (ref: shl_ref_fullyconnected_f32).
    Leading dims of x are batch."""
    out = jnp.matmul(jnp.asarray(x, jnp.float32), jnp.asarray(weight, jnp.float32).T,
                     preferred_element_type=jnp.float32)
    if bias is not None and jnp.size(bias) > 0:
        out = out + bias
    return out


@registry.register("matmul", api=Api.XLA)
def matmul(a, b, params: MatmulParams):
    """Batched matmul with optional transposes (ref: shl_ref_matmul_f32)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if params.trans_a:
        a = jnp.swapaxes(a, -1, -2)
    if params.trans_b:
        b = jnp.swapaxes(b, -1, -2)
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


@registry.register("embedding", api=Api.XLA)
def embedding(ids, table, params=None):
    """Token-id lookup (ref: shl_rvv_embedding, used by the LLM path)."""
    return jnp.take(jnp.asarray(table), jnp.asarray(ids, jnp.int32), axis=0)
