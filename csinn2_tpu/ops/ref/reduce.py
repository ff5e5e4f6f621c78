"""Reductions, arg ops, cumulative ops, segment ops
(ref: source/reference/{sum,mean,max,min,prod,all,any,argmax,argmin,
reduce_*,cumsum,cumprod,segment_*}.c)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csinn2_tpu.core.dtypes import Api
from csinn2_tpu.ops.params import (ArgParams, CumsumParams, ReduceParams,
                                   SegmentParams, StridedReduceParams)
from csinn2_tpu.ops.registry import registry

_f = jnp.float32


def _axes(params: ReduceParams):
    if params.axis is None:
        return None
    return tuple(params.axis) if not isinstance(params.axis, int) else (params.axis,)


def _reg_reduce(name, fn):
    def impl(x, params: ReduceParams, _fn=fn):
        return _fn(jnp.asarray(x, _f), axis=_axes(params), keepdims=params.keepdims)
    registry.register(name, impl, api=Api.XLA)


_reg_reduce("reduce_sum", jnp.sum)
_reg_reduce("sum", jnp.sum)
_reg_reduce("reduce_mean", jnp.mean)
_reg_reduce("mean", jnp.mean)
_reg_reduce("reduce_max", jnp.max)
_reg_reduce("max", jnp.max)
_reg_reduce("reduce_min", jnp.min)
_reg_reduce("min", jnp.min)
_reg_reduce("reduce_prod", jnp.prod)
_reg_reduce("prod", jnp.prod)


@registry.register("reduce_logsumexp", api=Api.XLA)
def reduce_logsumexp(x, params: ReduceParams):
    return jax.scipy.special.logsumexp(jnp.asarray(x, _f), axis=_axes(params),
                                       keepdims=params.keepdims)


@registry.register("all", api=Api.XLA)
def all_(x, params: ReduceParams):
    return jnp.all(jnp.asarray(x, bool), axis=_axes(params), keepdims=params.keepdims)


@registry.register("any", api=Api.XLA)
def any_(x, params: ReduceParams):
    return jnp.any(jnp.asarray(x, bool), axis=_axes(params), keepdims=params.keepdims)


@registry.register("argmax", api=Api.XLA)
def argmax(x, params: ArgParams):
    out = jnp.argmax(jnp.asarray(x, _f), axis=params.axis)
    return out[..., None] if params.keepdims else out


@registry.register("argmin", api=Api.XLA)
def argmin(x, params: ArgParams):
    out = jnp.argmin(jnp.asarray(x, _f), axis=params.axis)
    return out[..., None] if params.keepdims else out


@registry.register("cumsum", api=Api.XLA)
def cumsum(x, params: CumsumParams):
    x = jnp.asarray(x, _f)
    out = jnp.cumsum(x, axis=params.axis)
    if params.exclusive:
        out = out - x
    return out


@registry.register("cumprod", api=Api.XLA)
def cumprod(x, params: CumsumParams):
    x = jnp.asarray(x, _f)
    out = jnp.cumprod(x, axis=params.axis)
    if params.exclusive:
        out = out / jnp.where(x == 0, 1.0, x)
    return out


def _seg(name, jfn, init):
    def impl(x, segment_ids, params: SegmentParams, _jfn=jfn):
        return _jfn(jnp.asarray(x, _f), jnp.asarray(segment_ids, jnp.int32),
                    num_segments=params.num_segments)
    registry.register(name, impl, api=Api.XLA)


_seg("segment_sum", jax.ops.segment_sum, 0.0)
_seg("segment_max", jax.ops.segment_max, -jnp.inf)
_seg("segment_min", jax.ops.segment_min, jnp.inf)
_seg("segment_prod", jax.ops.segment_prod, 1.0)


@registry.register("segment_mean", api=Api.XLA)
def segment_mean(x, segment_ids, params: SegmentParams):
    ids = jnp.asarray(segment_ids, jnp.int32)
    s = jax.ops.segment_sum(jnp.asarray(x, _f), ids, num_segments=params.num_segments)
    n = jax.ops.segment_sum(jnp.ones(ids.shape, _f), ids, num_segments=params.num_segments)
    n = jnp.reshape(n, (-1,) + (1,) * (s.ndim - 1))
    return s / jnp.maximum(n, 1.0)


# Unsorted variants: JAX's segment ops never assume sorted ids, so both
# CSINN_OP_SEGMENT_* and CSINN_OP_UNSORTED_SEGMENT_* map to one impl
# (ref: shl_ref_unsorted_segment_*_f32 vs shl_ref_segment_*_f32,
# source/reference/segment_*.c — the sorted one is just the fast path).
for _nm in ("sum", "max", "min", "prod", "mean"):
    registry.register(f"unsorted_segment_{_nm}",
                      registry.lookup(f"segment_{_nm}", api=Api.XLA).exec,
                      api=Api.XLA)


def _stride_reduce(x, params: StridedReduceParams, reducer):
    """Generalized strided reduction over explicit (strides, extents) index
    spaces (ref: shl_ref_mean_stride_f32, source/reference/mean.c:21-54)."""
    xf = jnp.asarray(x, _f).reshape(-1)

    def flat_index(strides, extents):
        idx = jnp.zeros((), jnp.int32)
        grids = jnp.meshgrid(*[jnp.arange(e) for e in extents], indexing="ij") \
            if extents else [jnp.zeros((1,), jnp.int32)]
        flat = jnp.zeros(grids[0].size, jnp.int32)
        for g, s in zip(grids, strides):
            flat = flat + g.reshape(-1) * s
        return flat

    out_idx = flat_index(params.out_strides, params.out_extents)
    inner_idx = flat_index(params.inner_strides, params.inner_extents)
    vals = xf[out_idx[:, None] + inner_idx[None, :]]
    out = reducer(vals, axis=1)
    return out.reshape(params.out_extents) if params.out_extents else out


@registry.register("mean_stride", api=Api.XLA)
def mean_stride(x, params: StridedReduceParams):
    return _stride_reduce(x, params, jnp.mean)


@registry.register("min_stride", api=Api.XLA)
def min_stride(x, params: StridedReduceParams):
    return _stride_reduce(x, params, jnp.min)
