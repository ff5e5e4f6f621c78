"""Activations (ref: source/reference/{relu,relu1,relu6,relun,leaky_relu,
prelu,elu,sigmoid,hard_sigmoid,softmax,log_softmax,softplus,softsign,erf,
clip,threshold_relu,softrelu}.c; RVV fast paths source/thead_rvv/*/)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csinn2_tpu.core.dtypes import Api
from csinn2_tpu.ops.params import ClipParams, PReluParams, ReluParams, SoftmaxParams
from csinn2_tpu.ops.registry import registry

_f = jnp.float32


def _reg_unary(name, fn):
    registry.register(name, lambda x, params=None, _fn=fn: _fn(jnp.asarray(x, _f)), api=Api.XLA)


_reg_unary("relu", lambda x: jnp.maximum(x, 0.0))
_reg_unary("relu1", lambda x: jnp.clip(x, 0.0, 1.0))
_reg_unary("relu6", lambda x: jnp.clip(x, 0.0, 6.0))
_reg_unary("sigmoid", jax.nn.sigmoid)
_reg_unary("hard_sigmoid", lambda x: jnp.clip(x / 6.0 + 0.5, 0.0, 1.0))
_reg_unary("silu", jax.nn.silu)
_reg_unary("erf", jax.lax.erf)
_reg_unary("tanh", jnp.tanh)
_reg_unary("softplus", jax.nn.softplus)
_reg_unary("softrelu", jax.nn.softplus)  # ref SOFTRELU == log(1+e^x)
_reg_unary("softsign", lambda x: x / (1.0 + jnp.abs(x)))
_reg_unary("gelu", jax.nn.gelu)


@registry.register("relun", api=Api.XLA)
def relun(x, params: ReluParams):
    return jnp.clip(jnp.asarray(x, _f), 0.0, params.n)


@registry.register("leaky_relu", api=Api.XLA)
def leaky_relu(x, params: ReluParams):
    x = jnp.asarray(x, _f)
    return jnp.where(x >= 0, x, x * params.n)


@registry.register("threshold_relu", api=Api.XLA)
def threshold_relu(x, params: ReluParams):
    x = jnp.asarray(x, _f)
    return jnp.where(x > params.n, x, 0.0)


@registry.register("prelu", api=Api.XLA)
def prelu(x, alpha, params: PReluParams):
    """alpha is per-channel along params.axis (ref: shl_ref_prelu_f32)."""
    x = jnp.asarray(x, _f)
    shape = [1] * x.ndim
    shape[params.axis] = -1
    a = jnp.reshape(jnp.asarray(alpha, _f), shape)
    return jnp.where(x >= 0, x, x * a)


@registry.register("elu", api=Api.XLA)
def elu(x, params=None):
    return jax.nn.elu(jnp.asarray(x, _f))


@registry.register("clip", api=Api.XLA)
def clip(x, params: ClipParams):
    return jnp.clip(jnp.asarray(x, _f), params.min_value, params.max_value)


@registry.register("softmax", api=Api.XLA)
def softmax(x, params: SoftmaxParams):
    return jax.nn.softmax(jnp.asarray(x, _f), axis=params.axis)


@registry.register("log_softmax", api=Api.XLA)
def log_softmax(x, params: SoftmaxParams):
    return jax.nn.log_softmax(jnp.asarray(x, _f), axis=params.axis)
