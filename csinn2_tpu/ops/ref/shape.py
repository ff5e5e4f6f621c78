"""Tensor manipulation ops (ref: source/reference/{reshape,transpose,concat,
split,slice,strided_slice,pad,gather,gather_nd,scatter_nd,tile,squeeze,
expand_dims,reverse,stack,unstack,flatten,broadcast_to,shape,crop,
depth_to_space,space_to_depth,space_to_batch,batch_to_space,shuffle_channel,
im2col,col2im,reorg,sequence_mask,one_hot,arange,cast}.c)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from csinn2_tpu.core.dtypes import Api, Layout
from csinn2_tpu.ops.params import (
    ArangeParams,
    SpaceToBatchNdParams,
    BatchToSpaceParams, BroadcastToParams, ConcatParams, CropParams,
    DepthToSpaceParams, ExpandDimsParams, FlipParams, GatherParams,
    OneHotParams, PadParams, ReshapeParams, ShuffleChannelParams, SliceParams,
    Space2DepthParams, SpaceToBatchParams, SplitParams, SqueezeParams,
    StackParams, StridedSliceParams, TileParams, TopKParams, TransposeParams,
)
from csinn2_tpu.ops.registry import registry

_f = jnp.float32


@registry.register("reshape", api=Api.XLA)
def reshape(x, params: ReshapeParams):
    return jnp.reshape(jnp.asarray(x), params.shape)


@registry.register("flatten", api=Api.XLA)
def flatten(x, params=None):
    x = jnp.asarray(x)
    return jnp.reshape(x, (x.shape[0], -1))


@registry.register("transpose", api=Api.XLA)
def transpose(x, params: TransposeParams):
    return jnp.transpose(jnp.asarray(x), params.permute)


@registry.register("concat", api=Api.XLA)
def concat(inputs, params: ConcatParams):
    return jnp.concatenate([jnp.asarray(t) for t in inputs], axis=params.axis)


@registry.register("split", api=Api.XLA)
def split(x, params: SplitParams):
    """split_index are boundary offsets like the reference's split points."""
    return jnp.split(jnp.asarray(x), list(params.split_index), axis=params.axis)


@registry.register("slice", api=Api.XLA)
def slice_(x, params: SliceParams):
    x = jnp.asarray(x)
    idx = tuple(slice(b, e) for b, e in zip(params.begin, params.end))
    return x[idx]


@registry.register("strided_slice", api=Api.XLA)
def strided_slice(x, params: StridedSliceParams):
    x = jnp.asarray(x)
    idx = tuple(slice(b, e, s) for b, e, s in zip(params.begin, params.end, params.stride))
    return x[idx]


@registry.register("pad", api=Api.XLA)
def pad(x, params: PadParams):
    x = jnp.asarray(x, _f)
    widths = list(zip(params.pad_before, params.pad_after))
    if params.pad_mode == "constant":
        return jnp.pad(x, widths, constant_values=params.pad_value)
    return jnp.pad(x, widths, mode=params.pad_mode)


@registry.register("gather", api=Api.XLA)
def gather(x, indices, params: GatherParams):
    return jnp.take(jnp.asarray(x), jnp.asarray(indices, jnp.int32), axis=params.axis)


@registry.register("gather_nd", api=Api.XLA)
def gather_nd(x, indices, params=None):
    x = jnp.asarray(x)
    idx = jnp.asarray(indices, jnp.int32)
    d = idx.shape[-1]
    flat_idx = idx.reshape(-1, d)
    out = x[tuple(flat_idx[:, i] for i in range(d))]
    return out.reshape(idx.shape[:-1] + x.shape[d:])


@registry.register("scatter_nd", api=Api.XLA)
def scatter_nd(indices, updates, params=None, shape=None):
    idx = jnp.asarray(indices, jnp.int32)
    upd = jnp.asarray(updates, _f)
    out = jnp.zeros(shape, _f)
    d = idx.shape[-1]
    flat_idx = idx.reshape(-1, d)
    flat_upd = upd.reshape((-1,) + upd.shape[idx.ndim - 1:])
    return out.at[tuple(flat_idx[:, i] for i in range(d))].add(flat_upd)


@registry.register("tile", api=Api.XLA)
def tile(x, params: TileParams):
    return jnp.tile(jnp.asarray(x), params.reps)


@registry.register("squeeze", api=Api.XLA)
def squeeze(x, params: SqueezeParams):
    return jnp.squeeze(jnp.asarray(x), axis=params.axis)


@registry.register("expand_dims", api=Api.XLA)
def expand_dims(x, params: ExpandDimsParams):
    return jnp.expand_dims(jnp.asarray(x), params.axis)


@registry.register("reverse", api=Api.XLA)
def reverse(x, params: FlipParams):
    return jnp.flip(jnp.asarray(x), axis=params.axis)


registry.register("flip", lambda x, params: jnp.flip(jnp.asarray(x), axis=params.axis), api=Api.XLA)


@registry.register("stack", api=Api.XLA)
def stack(inputs, params: StackParams):
    return jnp.stack([jnp.asarray(t) for t in inputs], axis=params.axis)


@registry.register("unstack", api=Api.XLA)
def unstack(x, params: StackParams):
    x = jnp.asarray(x)
    return [jnp.squeeze(s, params.axis) for s in jnp.split(x, x.shape[params.axis], params.axis)]


@registry.register("broadcast_to", api=Api.XLA)
def broadcast_to(x, params: BroadcastToParams):
    return jnp.broadcast_to(jnp.asarray(x), params.shape)


@registry.register("shape", api=Api.XLA)
def shape_op(x, params=None):
    return jnp.asarray(jnp.asarray(x).shape, jnp.int32)


@registry.register("ndarray_size", api=Api.XLA)
def ndarray_size(x, params=None):
    return jnp.asarray(jnp.asarray(x).size, jnp.int32)


@registry.register("crop", api=Api.XLA)
def crop(x, params: CropParams = None, ref_shape=None):
    """Caffe-style crop from params.axis with offsets (ref: shl_ref_crop_f32).
    (params precedes ref_shape: call_op passes params positionally and every
    **extra kwarg by name — the old (x, ref_shape, params) order made every
    dispatch through ops.crop a TypeError, caught by the registry-wide golden
    sweep.)"""
    x = jnp.asarray(x)
    idx = []
    off_i = 0
    for i in range(x.ndim):
        if i < params.axis:
            idx.append(slice(None))
        else:
            off = params.offset[off_i] if off_i < len(params.offset) else params.offset[0]
            idx.append(slice(off, off + ref_shape[i]))
            off_i += 1
    return x[tuple(idx)]


@registry.register("depth_to_space", api=Api.XLA)
def depth_to_space(x, params: DepthToSpaceParams):
    """NCHW DCR/CRD (ref: shl_ref_depth_to_space_f32)."""
    n, c, h, w = x.shape
    b = params.block_size
    x = jnp.asarray(x)
    if params.mode == "DCR":
        x = x.reshape(n, b, b, c // (b * b), h, w)
        x = jnp.transpose(x, (0, 3, 4, 1, 5, 2))
    else:
        x = x.reshape(n, c // (b * b), b, b, h, w)
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(n, c // (b * b), h * b, w * b)


@registry.register("space_to_depth", api=Api.XLA)
def space_to_depth(x, params: Space2DepthParams):
    n, c, h, w = x.shape
    b = params.block_size
    x = jnp.asarray(x).reshape(n, c, h // b, b, w // b, b)
    x = jnp.transpose(x, (0, 3, 5, 1, 2, 4))
    return x.reshape(n, c * b * b, h // b, w // b)


@registry.register("reorg", api=Api.XLA)
def reorg(x, params: Space2DepthParams):
    """YOLO reorg (ref: CSINN_OP_REORG) — channel-major space-to-depth variant."""
    n, c, h, w = x.shape
    s = params.block_size
    x = jnp.asarray(x).reshape(n, c, h // s, s, w // s, s)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(n, c * s * s, h // s, w // s)


@registry.register("space_to_batch", api=Api.XLA)
def space_to_batch(x, params: SpaceToBatchParams):
    n, c, h, w = x.shape
    b = params.block_size
    pt, pd, pl, pr = params.pad
    x = jnp.pad(jnp.asarray(x, _f), ((0, 0), (0, 0), (pt, pd), (pl, pr)))
    h2, w2 = x.shape[2], x.shape[3]
    x = x.reshape(n, c, h2 // b, b, w2 // b, b)
    x = jnp.transpose(x, (3, 5, 0, 1, 2, 4))
    return x.reshape(n * b * b, c, h2 // b, w2 // b)


@registry.register("batch_to_space", api=Api.XLA)
def batch_to_space(x, params: BatchToSpaceParams):
    nb, c, h, w = x.shape
    b = params.block_size
    n = nb // (b * b)
    ct, cd, cl, cr = params.crop
    x = jnp.asarray(x, _f).reshape(b, b, n, c, h, w)
    x = jnp.transpose(x, (2, 3, 4, 0, 5, 1))
    x = x.reshape(n, c, h * b, w * b)
    return x[:, :, ct:h * b - cd, cl:w * b - cr]


@registry.register("shuffle_channel", api=Api.XLA)
def shuffle_channel(x, params: ShuffleChannelParams):
    n, c, h, w = x.shape
    g = params.group
    x = jnp.asarray(x).reshape(n, g, c // g, h, w)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(n, c, h, w)


@registry.register("im2col", api=Api.XLA)
def im2col(x, params=None, kernel=(3, 3), stride=(1, 1), pad=(0, 0, 0, 0)):
    """NCHW im2col to [N, C*kh*kw, oh*ow] (ref: shl_ref_im2col_f32)."""
    kh, kw = kernel
    sh, sw = stride
    pt, pd, pl, pr = pad
    x = jnp.pad(jnp.asarray(x, _f), ((0, 0), (0, 0), (pt, pd), (pl, pr)))
    n, c, h, w = x.shape
    oh = (h - kh) // sh + 1
    ow = (w - kw) // sw + 1
    patches = lax.conv_general_dilated_patches(
        x, (kh, kw), (sh, sw), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return patches.reshape(n, c * kh * kw, oh * ow)


@registry.register("sequence_mask", api=Api.XLA)
def sequence_mask(lengths, params=None, maxlen: int = 0):
    lengths = jnp.asarray(lengths, jnp.int32)
    ar = jnp.arange(maxlen, dtype=jnp.int32)
    return ar[None, :] < lengths[:, None]


@registry.register("one_hot", api=Api.XLA)
def one_hot(x, params: OneHotParams):
    oh = jnp.equal(jnp.expand_dims(jnp.asarray(x, jnp.int32), params.axis if params.axis >= 0 else -1),
                   jnp.arange(params.depth))
    return jnp.where(oh, params.on_value, params.off_value).astype(_f)


@registry.register("arange", api=Api.XLA)
def arange(params=None, start=0, stop=0, step=1):
    return jnp.arange(start, stop, step, dtype=_f)


@registry.register("cast", api=Api.XLA)
def cast(x, params=None, dtype=jnp.float32):
    """CSINN_OP_CAST / DATA_CONVERT raw dtype cast."""
    return jnp.asarray(x).astype(dtype)


@registry.register("topk", api=Api.XLA)
def topk(x, params: TopKParams):
    import jax
    return jax.lax.top_k(jnp.asarray(x, _f), params.k)


@registry.register("arange", api=Api.XLA)
def arange(params: ArangeParams):
    """(ref: shl_ref_arange_f32, source/reference/arange.c)."""
    return jnp.arange(params.start, params.stop, params.step, dtype=jnp.float32)


@registry.register("space_to_batch_nd", api=Api.XLA)
def space_to_batch_nd(x, params: SpaceToBatchNdParams):
    """TF-convention ND space→batch: [N, s1..sM, rest] with per-dim padding
    (ref: shl_gref_space_to_batch_nd_infer_shape — spatial dims follow batch,
    source/graph_ref/space_to_batch_nd.c)."""
    x = jnp.asarray(x)
    m = len(params.block_shape)
    pads = [(0, 0)] + list(params.pads) + [(0, 0)] * (x.ndim - 1 - m)
    x = jnp.pad(x, pads)
    n = x.shape[0]
    rest = x.shape[1 + m:]
    # split each spatial dim into (out, block)
    shape = [n]
    for i, b in enumerate(params.block_shape):
        shape += [x.shape[1 + i] // b, b]
    x = x.reshape(shape + list(rest))
    # [N, o1,b1, o2,b2, ...] → [b1..bM, N, o1..oM, rest]
    perm = [2 * i + 2 for i in range(m)] + [0] + [2 * i + 1 for i in range(m)] \
        + list(range(1 + 2 * m, x.ndim))
    x = jnp.transpose(x, perm)
    out_batch = n
    for b in params.block_shape:
        out_batch *= b
    return x.reshape([out_batch] + [s for i, s in enumerate(shape[1::2])] + list(rest))


@registry.register("batch_to_space_nd", api=Api.XLA)
def batch_to_space_nd(x, params: SpaceToBatchNdParams):
    """Inverse of space_to_batch_nd; params.pads acts as crops
    (ref: shl_gref_batch_to_space_nd_infer_shape)."""
    x = jnp.asarray(x)
    m = len(params.block_shape)
    block = 1
    for b in params.block_shape:
        block *= b
    n = x.shape[0] // block
    spatial = x.shape[1:1 + m]
    rest = x.shape[1 + m:]
    x = x.reshape(list(params.block_shape) + [n] + list(spatial) + list(rest))
    # [b1..bM, N, s1..sM, rest] → [N, s1,b1, s2,b2, ..., rest]
    perm = [m]
    for i in range(m):
        perm += [m + 1 + i, i]
    perm += list(range(2 * m + 1, x.ndim))
    x = jnp.transpose(x, perm)
    shape = [n] + [spatial[i] * params.block_shape[i] for i in range(m)] + list(rest)
    x = x.reshape(shape)
    idx = [slice(None)]
    for i, (c0, c1) in enumerate(params.pads):
        idx.append(slice(c0, shape[1 + i] - c1))
    return x[tuple(idx)]
