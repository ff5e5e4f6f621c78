"""Unary math, binary arithmetic, comparison and logical ops
(ref: source/reference/{abs,acos,...,xor}.c — the long tail of the op zoo).
All support numpy broadcasting like the reference's diso ops."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csinn2_tpu.core.dtypes import Api
from csinn2_tpu.ops.registry import registry

_f = jnp.float32


def _u(name, fn):
    registry.register(name, lambda x, params=None, _fn=fn: _fn(jnp.asarray(x, _f)), api=Api.XLA)


def _b(name, fn):
    registry.register(
        name,
        lambda a, b, params=None, _fn=fn: _fn(jnp.asarray(a, _f), jnp.asarray(b, _f)),
        api=Api.XLA)


# --- unary (ref: siso ops) --------------------------------------------------
_u("abs", jnp.abs)
_u("acos", jnp.arccos)
_u("acosh", jnp.arccosh)
_u("asin", jnp.arcsin)
_u("asinh", jnp.arcsinh)
_u("atan", jnp.arctan)
_u("atanh", jnp.arctanh)
_u("ceil", jnp.ceil)
_u("cos", jnp.cos)
_u("cosh", jnp.cosh)
_u("exp", jnp.exp)
_u("expm1", jnp.expm1)
_u("floor", jnp.floor)
_u("log", jnp.log)
_u("log1p", jnp.log1p)
_u("negative", jnp.negative)
_u("round", jnp.round)
_u("rsqrt", jax.lax.rsqrt)
_u("sign", jnp.sign)
_u("sin", jnp.sin)
_u("sinh", jnp.sinh)
_u("sqrt", jnp.sqrt)
_u("square", jnp.square)
_u("tan", jnp.tan)
_u("trunc", jnp.trunc)
_u("isnan", jnp.isnan)

# --- binary arithmetic (ref: diso ops) --------------------------------------
_b("add", jnp.add)
_b("sub", jnp.subtract)
_b("mul", jnp.multiply)
_b("div", jnp.divide)
_b("power", jnp.power)
_b("maximum", jnp.maximum)
_b("minimum", jnp.minimum)
_b("mod", lambda a, b: jnp.fmod(a, b))           # ref MOD: C fmod semantics
_b("floor_mod", jnp.mod)                         # python/floor semantics
_b("floor_divide", jnp.floor_divide)

# --- comparison -------------------------------------------------------------
_b("equal", jnp.equal)          # ref enum typo "EQUANL"
_b("not_equal", jnp.not_equal)
_b("greater", jnp.greater)      # ref enum typo "GREATHER"
_b("greater_equal", jnp.greater_equal)
_b("less", jnp.less)
_b("less_equal", jnp.less_equal)

# --- logical ----------------------------------------------------------------
registry.register("logical_and",
                  lambda a, b, params=None: jnp.logical_and(jnp.asarray(a, bool), jnp.asarray(b, bool)),
                  api=Api.XLA)
registry.register("logical_or",
                  lambda a, b, params=None: jnp.logical_or(jnp.asarray(a, bool), jnp.asarray(b, bool)),
                  api=Api.XLA)
registry.register("logical_xor",
                  lambda a, b, params=None: jnp.logical_xor(jnp.asarray(a, bool), jnp.asarray(b, bool)),
                  api=Api.XLA)
registry.register("logical_not",
                  lambda x, params=None: jnp.logical_not(jnp.asarray(x, bool)), api=Api.XLA)

# bitwise forms (ref AND/OR/XOR/NOT operate on integer tensors)
registry.register("and", lambda a, b, params=None: jnp.bitwise_and(jnp.asarray(a), jnp.asarray(b)), api=Api.XLA)
registry.register("or", lambda a, b, params=None: jnp.bitwise_or(jnp.asarray(a), jnp.asarray(b)), api=Api.XLA)
registry.register("xor", lambda a, b, params=None: jnp.bitwise_xor(jnp.asarray(a), jnp.asarray(b)), api=Api.XLA)
registry.register("not", lambda x, params=None: jnp.bitwise_not(jnp.asarray(x)), api=Api.XLA)


@registry.register("select", api=Api.XLA)
def select(cond, a, b, params=None):
    """(ref: shl_ref_select_f32 / CSINN_OP_SELECT, also WHERE with 3 args)."""
    return jnp.where(jnp.asarray(cond, bool), jnp.asarray(a, _f), jnp.asarray(b, _f))


registry.register("where", select, api=Api.XLA)


@registry.register("where_softmax", api=Api.XLA)
def where_softmax(cond, x, params=None, axis: int = -1):
    """masked softmax: where(cond, x, -inf) then softmax
    (ref: CSINN_OP_WHERE_SOFTMAX, used for attention masks)."""
    masked = jnp.where(jnp.asarray(cond, bool), jnp.asarray(x, _f), -jnp.inf)
    return jax.nn.softmax(masked, axis=axis)


@registry.register("data_convert", api=Api.XLA)
def data_convert(x, params=None):
    """Identity in float space; the api-layer quant wrapper performs the
    actual dequant→requant into the requested out_qinfo
    (ref: CSINN_OP_DATA_CONVERT, source/thead_rvv/*/data_convert.c)."""
    return jnp.asarray(x)
