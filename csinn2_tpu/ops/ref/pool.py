"""Pooling family (ref: source/reference/averagepool.c, maxpool.c,
global_averagepool.c, global_maxpool.c)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from csinn2_tpu.core.dtypes import Api, Layout
from csinn2_tpu.ops.params import PoolParams
from csinn2_tpu.ops.registry import registry


def _win(params: PoolParams, rank: int, layout: Layout):
    """window_dims/strides/padding for reduce_window over a rank-4 activation."""
    kh, kw = params.kernel
    sh, sw = params.stride
    pt, pd, pl, pr = params.pad
    if layout == Layout.NCHW:
        dims = (1, 1, kh, kw)
        strides = (1, 1, sh, sw)
        pads = ((0, 0), (0, 0), (pt, pd), (pl, pr))
    else:
        dims = (1, kh, 1 if rank == 3 else kw, 1)[:rank] if rank != 4 else (1, kh, kw, 1)
        strides = (1, sh, sw, 1)
        pads = ((0, 0), (pt, pd), (pl, pr), (0, 0))
    return dims, strides, pads


@registry.register("maxpool2d", api=Api.XLA)
def maxpool2d(x, params: PoolParams):
    x = jnp.asarray(x, jnp.float32)
    dims, strides, pads = _win(params, 4, params.layout)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, pads)


@registry.register("avgpool2d", api=Api.XLA)
def avgpool2d(x, params: PoolParams):
    """count_include_pad semantics mirror csinn_pool_params.count_include_pad."""
    x = jnp.asarray(x, jnp.float32)
    dims, strides, pads = _win(params, 4, params.layout)
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    if params.count_include_pad:
        count = float(np.prod(params.kernel))
        return summed / count
    ones = jnp.ones_like(x)
    count = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pads)
    return summed / jnp.maximum(count, 1.0)


@registry.register("global_maxpool2d", api=Api.XLA)
def global_maxpool2d(x, params: PoolParams):
    axes = (2, 3) if params.layout == Layout.NCHW else (1, 2)
    return jnp.max(jnp.asarray(x, jnp.float32), axis=axes, keepdims=True)


@registry.register("global_avgpool2d", api=Api.XLA)
def global_avgpool2d(x, params: PoolParams):
    axes = (2, 3) if params.layout == Layout.NCHW else (1, 2)
    return jnp.mean(jnp.asarray(x, jnp.float32), axis=axes, keepdims=True)


@registry.register("maxpool3d", api=Api.XLA)
def maxpool3d(x, params: PoolParams):
    kd, kh, kw = params.kernel
    sd, sh, sw = params.stride
    p = params.pad  # (d0,d1,t,b,l,r)
    dims = (1, 1, kd, kh, kw)
    strides = (1, 1, sd, sh, sw)
    pads = ((0, 0), (0, 0), (p[0], p[1]), (p[2], p[3]), (p[4], p[5]))
    return lax.reduce_window(jnp.asarray(x, jnp.float32), -jnp.inf, lax.max, dims, strides, pads)


@registry.register("avgpool3d", api=Api.XLA)
def avgpool3d(x, params: PoolParams):
    kd, kh, kw = params.kernel
    sd, sh, sw = params.stride
    p = params.pad
    dims = (1, 1, kd, kh, kw)
    strides = (1, 1, sd, sh, sw)
    pads = ((0, 0), (0, 0), (p[0], p[1]), (p[2], p[3]), (p[4], p[5]))
    x = jnp.asarray(x, jnp.float32)
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    if params.count_include_pad:
        return summed / float(np.prod(params.kernel))
    count = lax.reduce_window(jnp.ones_like(x), 0.0, lax.add, dims, strides, pads)
    return summed / jnp.maximum(count, 1.0)
