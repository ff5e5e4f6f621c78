"""Normalization ops (ref: source/reference/{batch_normalization,layer_norm,
instance_norm,l2_normalization,lrn}.c; rms_norm source/thead_rvv/*/rms_norm*)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from csinn2_tpu.core.dtypes import Api, Layout
from csinn2_tpu.ops.params import BatchNormParams, LRNParams, NormParams, PoolParams
from csinn2_tpu.ops.registry import registry

_f = jnp.float32


@registry.register("batch_norm", api=Api.XLA)
def batch_norm(x, mean, variance, gamma, beta, params: BatchNormParams):
    """Inference BN over the channel axis of params.layout (ref: shl_ref_batch_normalization_f32)."""
    caxis = 1 if params.layout in (Layout.NCHW, Layout.NCW) else jnp.ndim(x) - 1
    shape = [1] * jnp.ndim(x)
    shape[caxis] = -1
    x = jnp.asarray(x, _f)
    inv = lax.rsqrt(jnp.reshape(jnp.asarray(variance, _f), shape) + params.epsilon)
    out = (x - jnp.reshape(jnp.asarray(mean, _f), shape)) * inv
    if gamma is not None:
        out = out * jnp.reshape(jnp.asarray(gamma, _f), shape)
    if beta is not None:
        out = out + jnp.reshape(jnp.asarray(beta, _f), shape)
    return out


@registry.register("layer_norm", api=Api.XLA)
def layer_norm(x, gamma, beta, params: NormParams):
    """Normalize over trailing axes starting at params.axis (ref: shl_ref_layer_norm_f32)."""
    x = jnp.asarray(x, _f)
    axis = params.axis if params.axis >= 0 else x.ndim + params.axis
    axes = tuple(range(axis, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    out = (x - mean) * lax.rsqrt(var + params.epsilon)
    if params.scale and gamma is not None:
        out = out * jnp.asarray(gamma, _f)
    if params.center and beta is not None:
        out = out + jnp.asarray(beta, _f)
    return out


@registry.register("rms_norm", api=Api.XLA)
def rms_norm(x, gamma, params: NormParams):
    """x / rms(x) * gamma over trailing axes (ref: shl_rvv_rms_norm_fp16,
    used by the LLM path llama2.c)."""
    x = jnp.asarray(x, _f)
    axis = params.axis if params.axis >= 0 else x.ndim + params.axis
    axes = tuple(range(axis, x.ndim))
    ms = jnp.mean(jnp.square(x), axis=axes, keepdims=True)
    out = x * lax.rsqrt(ms + params.epsilon)
    if gamma is not None:
        out = out * jnp.asarray(gamma, _f)
    return out


@registry.register("instance_norm", api=Api.XLA)
def instance_norm(x, gamma, beta, params: NormParams):
    """Per-(N,C) spatial normalization (ref: CSINN_OP_INSTANCE_NORM)."""
    x = jnp.asarray(x, _f)
    if params.layout == Layout.NCHW:
        axes, shape = (2, 3), (1, -1, 1, 1)
    else:
        axes, shape = (1, 2), (1, 1, 1, -1)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    out = (x - mean) * lax.rsqrt(var + params.epsilon)
    if gamma is not None:
        out = out * jnp.reshape(jnp.asarray(gamma, _f), shape)
    if beta is not None:
        out = out + jnp.reshape(jnp.asarray(beta, _f), shape)
    return out


@registry.register("l2_normalization", api=Api.XLA)
def l2_normalization(x, params: NormParams):
    """(ref: CSINN_OP_L2N, shl_ref_l2_normalization_f32)."""
    x = jnp.asarray(x, _f)
    denom = jnp.sqrt(jnp.sum(jnp.square(x), axis=params.axis, keepdims=True))
    return x / jnp.maximum(denom, params.epsilon)


@registry.register("lrn", api=Api.XLA)
def lrn(x, params: LRNParams):
    """Local response norm across channels, NCHW
    (ref: shl_ref_lrn_f32, window `range` centered)."""
    x = jnp.asarray(x, _f)
    half = params.range // 2
    sq = jnp.square(x)
    # sum over a channel window via reduce_window on axis 1
    summed = lax.reduce_window(sq, 0.0, lax.add,
                               (1, params.range, 1, 1), (1, 1, 1, 1),
                               ((0, 0), (half, params.range - 1 - half), (0, 0), (0, 0)))
    return x / jnp.power(params.bias + params.alpha * summed, params.beta)


@registry.register("l2pool2d", api=Api.XLA)
def l2pool2d(x, params: PoolParams):
    """sqrt of windowed mean-square (ref: CSINN_OP_L2POOL2D)."""
    kh, kw = params.kernel
    sh, sw = params.stride
    pt, pd, pl, pr = params.pad
    if params.layout == Layout.NCHW:
        dims, strides = (1, 1, kh, kw), (1, 1, sh, sw)
        pads = ((0, 0), (0, 0), (pt, pd), (pl, pr))
    else:
        dims, strides = (1, kh, kw, 1), (1, sh, sw, 1)
        pads = ((0, 0), (pt, pd), (pl, pr), (0, 0))
    x = jnp.asarray(x, _f)
    summed = lax.reduce_window(jnp.square(x), 0.0, lax.add, dims, strides, pads)
    return jnp.sqrt(summed / float(kh * kw))
