"""Public op API: one function per operator over Tensor handles.

This is the csinn_<op>() surface (ref: include/csinn/csi_nn.h — 346 functions;
impl pattern source/nn2/convolution.c:26-85).  Differences from the reference,
by design:

  * no separate `_init`/`exec` pair — weight prepack happens at session
    setup (the `init` hook on the resolved callback), and eager "layer mode"
    calls execute immediately;
  * in GRAPH mode the same calls record nodes into the active Session — the
    TPU-native `est` hook (ref: csinn_data_structure.h:557-563);
  * quantized execution wraps the float kernel as dequant→f32→requant exactly
    like the reference's quant wrappers (ref: shl_ref_conv_callback_base /
    siso/diso, source/reference/utils.c:609-650), unless a Pallas kernel
    registered for the scheme consumes the integer carriers directly.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from csinn2_tpu.core.dtypes import Api, Dtype, Layout, MemType, QuantScheme
from csinn2_tpu.core.quant import QuantInfo, dequantize, quantize
from csinn2_tpu.core.tensor import Tensor, TensorMeta
from csinn2_tpu.graph.ir import Node
from csinn2_tpu.ops import params as P
from csinn2_tpu.ops.registry import registry
from csinn2_tpu.runtime.session import current_session

TensorLike = Union[Tensor, jnp.ndarray, None]


def _as_tensor(x: TensorLike) -> Optional[Tensor]:
    if x is None or isinstance(x, Tensor):
        return x
    return Tensor(data=jnp.asarray(x))


def _dequant_array(arr, t: Tensor, compute_dtype):
    """Integer carrier → float per the tensor's quant metadata
    (ref: shl_ref_tensor_transform_f32, source/reference/utils.c:579)."""
    if t.meta.mem_type in (MemType.BLOCK_Q4_0, MemType.BLOCK_Q8_0):
        values, scales = arr
        v = jnp.asarray(values, jnp.float32).reshape(*values.shape[:-1], -1, 32)
        s = jnp.asarray(scales, jnp.float32)[..., None]
        return (v * s).reshape(values.shape).astype(compute_dtype)
    q = t.qinfo
    if q is not None and q.dtype.is_quantized_int:
        return dequantize(arr, q).astype(compute_dtype)
    if jnp.issubdtype(jnp.asarray(arr).dtype if not hasattr(arr, "dtype") else arr.dtype,
                      jnp.floating):
        return jnp.asarray(arr, compute_dtype)
    return arr  # integer-semantic input (ids, indices, masks)


def _requant_array(out, out_qinfo: Optional[QuantInfo]):
    if out_qinfo is None:
        return out
    if out_qinfo.dtype.is_float:
        return jnp.asarray(out, out_qinfo.dtype.jnp)
    return quantize(out, out_qinfo)


def call_op(op: str, tensors: Sequence[Any], params=None,
            out_qinfo: Optional[QuantInfo] = None, n_outputs: int = 1,
            out_layout: Optional[Layout] = None, **extra):
    """Dispatch one op: record a graph node (GRAPH mode) or execute eagerly.

    `tensors` may contain Tensor, None, raw arrays, or a list of Tensors
    (variadic ops like concat).
    """
    sess = current_session()
    api_pref = sess.api if sess else Api.AUTO
    compute_dtype = sess.compute_dtype if sess else jnp.float32

    # normalize structure; remember it to rebuild inside exec
    norm: List[Any] = []
    flat: List[Tensor] = []
    structure: List[Any] = []     # 'T' tensor, 'N' none, ('L', n) list
    for item in tensors:
        if item is None:
            structure.append("N")
        elif isinstance(item, (list, tuple)):
            ts = [_as_tensor(t) for t in item]
            structure.append(("L", len(ts)))
            flat.extend(ts)
        else:
            t = _as_tensor(item)
            structure.append("T")
            flat.append(t)

    metas = [t.meta for t in flat]
    scheme = None
    for t in flat:
        if t.qinfo is not None and t.qinfo.scheme != QuantScheme.UNSET:
            scheme = t.qinfo.scheme
            break
    cb = registry.lookup(op, scheme=scheme, api=api_pref, metas=metas, params=params)

    # per-op-signature debug printer (ref: SHL_DEBUG_CALL, include/shl_debug.h:32-40)
    from csinn2_tpu.utils import logging as _log
    from csinn2_tpu.core.dtypes import DebugLevel as _DL
    if _log.get_level() <= _DL.DEBUG:
        _log.debug("%s[%s] %s -> cb=%s",
                   op, getattr(params, "name", "") or "-",
                   ",".join(f"{t.dtype.value}{list(t.shape)}" for t in flat),
                   cb.name)

    quantized_direct = cb.quant_direct
    # the AOT zp-map helper input is a fast-path-only operand: strip it when
    # dispatch resolved to a generic (dequant→f32) callback, whose signature
    # does not know it (it is always appended last by the conv wrappers)
    if not quantized_direct and flat and \
            getattr(flat[-1].meta, "name", "") == "__zp_wsum__":
        flat = flat[:-1]
        structure = structure[:-1]
        metas = metas[:-1]

    def exec_fn(arrays, _flat=tuple(flat), _structure=tuple(structure)):
        # rebuild positional args with dequantized floats
        it = iter(range(len(_flat)))
        args: List[Any] = []
        for s in _structure:
            if s == "N":
                args.append(None)
            elif s == "T":
                i = next(it)
                args.append(_dequant_array(arrays[i], _flat[i], compute_dtype))
            else:
                n = s[1]
                idxs = [next(it) for _ in range(n)]
                args.append([_dequant_array(arrays[i], _flat[i], compute_dtype)
                             for i in idxs])
        out = cb.exec(*args, params, **extra) if params is not None else \
            cb.exec(*args, **extra)
        if isinstance(out, (tuple, list)):
            return tuple(_requant_array(o, out_qinfo) for o in out)
        return _requant_array(out, out_qinfo)

    def pallas_exec_fn(arrays, _flat=tuple(flat)):
        # quantized fast path: kernel consumes raw carriers + qinfos
        return cb.exec(arrays, [t.meta for t in _flat], params, out_qinfo, **extra)

    fn = pallas_exec_fn if quantized_direct else exec_fn

    layout = out_layout or (getattr(params, "layout", Layout.NCHW) if params else Layout.NCHW)

    if sess is not None and sess.recording:
        # symbolic: infer output shapes by abstract evaluation (replaces the
        # per-op *_infer_shape table, ref: source/graph_ref/*_infer_shape)
        shapes = [_abstract(t) for t in flat]
        out_shape = jax.eval_shape(lambda *a: fn(a), *shapes)
        leaves = out_shape if isinstance(out_shape, (tuple, list)) else (out_shape,)
        node = Node(op=op, inputs=list(flat), params=params, exec_fn=fn,
                    name=getattr(params, "name", "") or op, cb_name=cb.name,
                    structure=list(structure), extra=dict(extra),
                    out_qinfo=out_qinfo)
        outs = []
        for i, l in enumerate(leaves):
            meta = TensorMeta(shape=tuple(l.shape), dtype=_dtype_of(l.dtype),
                              layout=layout, qinfo=out_qinfo,
                              name=f"{node.name}_out{i}")
            outs.append(Tensor(meta=meta, producer=node, out_index=i))
        node.outputs = outs
        sess.record(node)
        return outs[0] if len(outs) == 1 else tuple(outs)

    # eager (layer mode)
    arrays = [t.data for t in flat]
    result = fn(arrays)
    if isinstance(result, tuple):
        return tuple(Tensor(data=r, qinfo=out_qinfo, layout=layout) for r in result)
    return Tensor(data=result, qinfo=out_qinfo, layout=layout)


def _abstract(t: Tensor):
    """ShapeDtypeStruct (or pair, for block-quant (values, scales)) of a tensor."""
    if t.meta.mem_type in (MemType.BLOCK_Q4_0, MemType.BLOCK_Q8_0):
        values, scales = t.data
        return (jax.ShapeDtypeStruct(values.shape, values.dtype),
                jax.ShapeDtypeStruct(scales.shape, scales.dtype))
    return jax.ShapeDtypeStruct(t.shape, t.dtype.jnp)


def _dtype_of(jdt) -> Dtype:
    import numpy as np
    name = "bfloat16" if "bfloat16" in str(jdt) else np.dtype(jdt).name
    for d in Dtype:
        if d.value == name:
            return d
    return Dtype.FLOAT32


# ---------------------------------------------------------------------------
# Generated thin wrappers — the 346-function csinn_* surface
# ---------------------------------------------------------------------------

def _unary(op):
    def fn(x, params=None, out_qinfo=None):
        return call_op(op, [x], params, out_qinfo)
    fn.__name__ = op
    return fn


def _binary(op):
    def fn(a, b, params=None, out_qinfo=None):
        return call_op(op, [a, b], params, out_qinfo)
    fn.__name__ = op
    return fn


_UNARY_OPS = [
    "abs", "acos", "acosh", "asin", "asinh", "atan", "atanh", "ceil", "cos",
    "cosh", "exp", "expm1", "floor", "log", "log1p", "negative", "round",
    "rsqrt", "sign", "sin", "sinh", "sqrt", "square", "tan", "trunc", "isnan",
    "relu", "relu1", "relu6", "sigmoid", "hard_sigmoid", "silu", "erf", "tanh",
    "softplus", "softrelu", "softsign", "gelu", "elu", "logical_not", "not",
    "flatten", "shape", "ndarray_size", "yuv_rgb_scale",
]
_BINARY_OPS = [
    "add", "sub", "mul", "div", "power", "maximum", "minimum", "mod",
    "floor_mod", "floor_divide", "equal", "not_equal", "greater",
    "greater_equal", "less", "less_equal", "logical_and", "logical_or",
    "logical_xor", "and", "or", "xor",
]

for _op in _UNARY_OPS:
    globals()[_op if _op not in ("and", "or", "not") else _op + "_"] = _unary(_op)
for _op in _BINARY_OPS:
    globals()[_op if _op not in ("and", "or") else _op + "_"] = _binary(_op)


# --- structured ops ---------------------------------------------------------

def _zp_sumw_tensor(x, weight, params):
    """AOT activation-zp correction vector for the integer conv fast path
    (kernels/qconv.precompute_zp_wsum): computed at graph build when the
    weight is a const int carrier and x has a static nonzero effective
    zero-point.  Returned as a const Tensor (name-tagged so the kernel
    recognizes it) or None."""
    import numpy as np
    if not isinstance(x, Tensor) or not isinstance(weight, Tensor):
        return None
    if weight.data is None or x.qinfo is None or x.qinfo.dtype.is_float:
        return None
    if x.dtype not in (Dtype.INT8, Dtype.UINT8) or \
            weight.dtype not in (Dtype.INT8, Dtype.UINT8):
        return None
    try:
        zp = float(np.asarray(x.qinfo.zero_point).reshape(()))
    except Exception:
        return None
    if x.dtype == Dtype.UINT8:
        zp -= 128.0                       # kernel shifts u8 x into s8
    # NB: builtins like round/abs are SHADOWED in this module by the
    # generated op wrappers — use numpy
    if int(np.round(zp)) == 0:
        return None
    from csinn2_tpu.kernels.qconv import precompute_zp_wsum
    m = precompute_zp_wsum(np.asarray(weight.data), w_layout=_w_layout(weight))
    t = Tensor(m)
    t.meta.name = "__zp_wsum__"
    return t


def _conv_inputs(x, weight, bias, params, residual=None):
    ins = [x, weight, bias]
    if residual is not None:
        # fused residual rides between bias and the zp map so the quant
        # callback finds it at a fixed slot and the generic path's
        # strip-last-__zp_wsum__ logic stays valid
        ins.append(residual)
    m = _zp_sumw_tensor(x, weight, params)
    if m is not None:
        ins.append(m)
    return ins


def conv2d(x, weight, bias=None, params: P.Conv2dParams = None, out_qinfo=None,
           residual=None):
    """residual: optional same-shape tensor added to the conv output BEFORE
    the fused activation/requantize — the ResNet join in one epilogue (the
    graph-opt the reference's HHB performs on conv→add chains)."""
    params = params or P.Conv2dParams()
    if residual is not None:
        import dataclasses as _dc
        params = _dc.replace(params, fuse_add=True)
        if bias is None:
            O = weight.shape[0]
            bias = Tensor(np.zeros((O,), np.float32))
    return call_op("conv2d", _conv_inputs(x, weight, bias, params, residual),
                   params, out_qinfo, w_layout=_w_layout(weight))


def depthwise_conv2d(x, weight, bias=None, params: P.Conv2dParams = None, out_qinfo=None):
    params = params or P.Conv2dParams()
    return call_op("depthwise_conv2d", _conv_inputs(x, weight, bias, params),
                   params, out_qinfo, w_layout=_w_layout(weight))


def group_conv2d(x, weight, bias=None, params: P.Conv2dParams = None, out_qinfo=None):
    params = params or P.Conv2dParams()
    return call_op("group_conv2d", _conv_inputs(x, weight, bias, params),
                   params, out_qinfo, w_layout=_w_layout(weight))


def _w_layout(weight):
    if isinstance(weight, Tensor) and weight.layout in (Layout.OHWI, Layout.OIHW,
                                                        Layout.O1HW, Layout.HWO1):
        return weight.layout
    return Layout.OIHW


def conv1d(x, weight, bias=None, params: P.Conv1dParams = None, out_qinfo=None):
    return call_op("conv1d", [x, weight, bias], params or P.Conv1dParams(), out_qinfo)


def conv3d(x, weight, bias=None, params: P.Conv3dParams = None, out_qinfo=None):
    return call_op("conv3d", [x, weight, bias], params or P.Conv3dParams(), out_qinfo)


def deconv2d(x, weight, bias=None, params: P.Deconv2dParams = None, out_qinfo=None):
    return call_op("deconv2d", [x, weight, bias], params or P.Deconv2dParams(), out_qinfo)


def fullyconnected(x, weight, bias=None, params: P.FCParams = None, out_qinfo=None):
    return call_op("fullyconnected", [x, weight, bias], params or P.FCParams(), out_qinfo)


def matmul(a, b, params: P.MatmulParams = None, out_qinfo=None):
    return call_op("matmul", [a, b], params or P.MatmulParams(), out_qinfo)


def embedding(ids, table, params=None, out_qinfo=None):
    return call_op("embedding", [ids, table], params, out_qinfo)


def maxpool2d(x, params: P.PoolParams, out_qinfo=None):
    return call_op("maxpool2d", [x], params, out_qinfo)


def avgpool2d(x, params: P.PoolParams, out_qinfo=None):
    return call_op("avgpool2d", [x], params, out_qinfo)


def global_maxpool2d(x, params: P.PoolParams = None, out_qinfo=None):
    return call_op("global_maxpool2d", [x], params or P.PoolParams(), out_qinfo)


def global_avgpool2d(x, params: P.PoolParams = None, out_qinfo=None):
    return call_op("global_avgpool2d", [x], params or P.PoolParams(), out_qinfo)


def maxpool3d(x, params: P.PoolParams, out_qinfo=None):
    return call_op("maxpool3d", [x], params, out_qinfo)


def avgpool3d(x, params: P.PoolParams, out_qinfo=None):
    return call_op("avgpool3d", [x], params, out_qinfo)


def l2pool2d(x, params: P.PoolParams, out_qinfo=None):
    return call_op("l2pool2d", [x], params, out_qinfo)


def maxpool2d_locat(x, params: P.PoolParams, out_qinfo=None):
    return call_op("maxpool2d_locat", [x], params, out_qinfo, n_outputs=2)


def unpooling(x, mask, params=None, out_hw=None, out_qinfo=None):
    return call_op("unpooling", [x, mask], params, out_qinfo, out_hw=out_hw)


def softmax(x, params: P.SoftmaxParams = None, out_qinfo=None):
    return call_op("softmax", [x], params or P.SoftmaxParams(), out_qinfo)


def log_softmax(x, params: P.SoftmaxParams = None, out_qinfo=None):
    return call_op("log_softmax", [x], params or P.SoftmaxParams(), out_qinfo)


def leaky_relu(x, params: P.ReluParams, out_qinfo=None):
    return call_op("leaky_relu", [x], params, out_qinfo)


def relun(x, params: P.ReluParams, out_qinfo=None):
    return call_op("relun", [x], params, out_qinfo)


def threshold_relu(x, params: P.ReluParams, out_qinfo=None):
    return call_op("threshold_relu", [x], params, out_qinfo)


def prelu(x, alpha, params: P.PReluParams = None, out_qinfo=None):
    return call_op("prelu", [x, alpha], params or P.PReluParams(), out_qinfo)


def clip(x, params: P.ClipParams, out_qinfo=None):
    return call_op("clip", [x], params, out_qinfo)


def batch_norm(x, mean, variance, gamma=None, beta=None,
               params: P.BatchNormParams = None, out_qinfo=None):
    return call_op("batch_norm", [x, mean, variance, gamma, beta],
                   params or P.BatchNormParams(), out_qinfo)


def layer_norm(x, gamma=None, beta=None, params: P.NormParams = None, out_qinfo=None):
    return call_op("layer_norm", [x, gamma, beta], params or P.NormParams(), out_qinfo)


def rms_norm(x, gamma=None, params: P.NormParams = None, out_qinfo=None):
    return call_op("rms_norm", [x, gamma], params or P.NormParams(), out_qinfo)


def instance_norm(x, gamma=None, beta=None, params: P.NormParams = None, out_qinfo=None):
    return call_op("instance_norm", [x, gamma, beta], params or P.NormParams(), out_qinfo)


def l2_normalization(x, params: P.NormParams = None, out_qinfo=None):
    return call_op("l2_normalization", [x], params or P.NormParams(), out_qinfo)


def lrn(x, params: P.LRNParams, out_qinfo=None):
    return call_op("lrn", [x], params, out_qinfo)


# reductions
def _reduce(op):
    def fn(x, params: P.ReduceParams, out_qinfo=None):
        return call_op(op, [x], params, out_qinfo)
    fn.__name__ = op
    return fn


for _op in ["reduce_sum", "sum", "reduce_mean", "mean", "reduce_max", "max",
            "reduce_min", "min", "reduce_prod", "prod", "reduce_logsumexp",
            "all", "any"]:
    globals()[_op if _op not in ("sum", "max", "min", "all", "any") else _op + "_"] = _reduce(_op)


def argmax(x, params: P.ArgParams, out_qinfo=None):
    return call_op("argmax", [x], params, out_qinfo)


def argmin(x, params: P.ArgParams, out_qinfo=None):
    return call_op("argmin", [x], params, out_qinfo)


def cumsum(x, params: P.CumsumParams, out_qinfo=None):
    return call_op("cumsum", [x], params, out_qinfo)


def cumprod(x, params: P.CumsumParams, out_qinfo=None):
    return call_op("cumprod", [x], params, out_qinfo)


def topk(x, params: P.TopKParams, out_qinfo=None):
    return call_op("topk", [x], params, out_qinfo, n_outputs=2)


# shape ops
def reshape(x, params: P.ReshapeParams, out_qinfo=None):
    return call_op("reshape", [x], params, out_qinfo)


def transpose(x, params: P.TransposeParams, out_qinfo=None):
    return call_op("transpose", [x], params, out_qinfo)


def concat(inputs, params: P.ConcatParams, out_qinfo=None):
    return call_op("concat", [list(inputs)], params, out_qinfo)


def split(x, params: P.SplitParams, out_qinfo=None):
    return call_op("split", [x], params, out_qinfo)


def slice(x, params: P.SliceParams, out_qinfo=None):  # noqa: A001
    return call_op("slice", [x], params, out_qinfo)


def strided_slice(x, params: P.StridedSliceParams, out_qinfo=None):
    return call_op("strided_slice", [x], params, out_qinfo)


def pad(x, params: P.PadParams, out_qinfo=None):
    return call_op("pad", [x], params, out_qinfo)


def gather(x, indices, params: P.GatherParams, out_qinfo=None):
    return call_op("gather", [x, indices], params, out_qinfo)


def gather_nd(x, indices, params=None, out_qinfo=None):
    return call_op("gather_nd", [x, indices], params, out_qinfo)


def scatter_nd(indices, updates, shape, params=None, out_qinfo=None):
    return call_op("scatter_nd", [indices, updates], params, out_qinfo, shape=shape)


def tile(x, params: P.TileParams, out_qinfo=None):
    return call_op("tile", [x], params, out_qinfo)


def squeeze(x, params: P.SqueezeParams, out_qinfo=None):
    return call_op("squeeze", [x], params, out_qinfo)


def expand_dims(x, params: P.ExpandDimsParams, out_qinfo=None):
    return call_op("expand_dims", [x], params, out_qinfo)


def reverse(x, params: P.FlipParams, out_qinfo=None):
    return call_op("reverse", [x], params, out_qinfo)


def flip(x, params: P.FlipParams, out_qinfo=None):
    return call_op("flip", [x], params, out_qinfo)


def stack(inputs, params: P.StackParams, out_qinfo=None):
    return call_op("stack", [list(inputs)], params, out_qinfo)


def unstack(x, params: P.StackParams, out_qinfo=None):
    return call_op("unstack", [x], params, out_qinfo)


def broadcast_to(x, params: P.BroadcastToParams, out_qinfo=None):
    return call_op("broadcast_to", [x], params, out_qinfo)


def crop(x, ref_shape, params: P.CropParams, out_qinfo=None):
    return call_op("crop", [x], params, out_qinfo, ref_shape=ref_shape)


def depth_to_space(x, params: P.DepthToSpaceParams, out_qinfo=None):
    return call_op("depth_to_space", [x], params, out_qinfo)


def space_to_depth(x, params: P.Space2DepthParams, out_qinfo=None):
    return call_op("space_to_depth", [x], params, out_qinfo)


def reorg(x, params: P.Space2DepthParams, out_qinfo=None):
    return call_op("reorg", [x], params, out_qinfo)


def space_to_batch(x, params: P.SpaceToBatchParams, out_qinfo=None):
    return call_op("space_to_batch", [x], params, out_qinfo)


def batch_to_space(x, params: P.BatchToSpaceParams, out_qinfo=None):
    return call_op("batch_to_space", [x], params, out_qinfo)


def shuffle_channel(x, params: P.ShuffleChannelParams, out_qinfo=None):
    return call_op("shuffle_channel", [x], params, out_qinfo)


def one_hot(x, params: P.OneHotParams, out_qinfo=None):
    return call_op("one_hot", [x], params, out_qinfo)


def sequence_mask(lengths, maxlen, params=None, out_qinfo=None):
    return call_op("sequence_mask", [lengths], params, out_qinfo, maxlen=maxlen)


def where(cond, a, b, params=None, out_qinfo=None):
    return call_op("where", [cond, a, b], params, out_qinfo)


def select(cond, a, b, params=None, out_qinfo=None):
    return call_op("select", [cond, a, b], params, out_qinfo)


def where_softmax(cond, x, params=None, axis=-1, out_qinfo=None):
    return call_op("where_softmax", [cond, x], params, out_qinfo, axis=axis)


def cast(x, dtype, params=None, out_qinfo=None):
    return call_op("cast", [x], params, out_qinfo, dtype=dtype)


def resize(x, params: P.ResizeParams, out_qinfo=None):
    return call_op("resize", [x], params, out_qinfo)


def im2col(x, kernel, stride, pad_, params=None, out_qinfo=None):
    return call_op("im2col", [x], params, out_qinfo, kernel=kernel, stride=stride, pad=pad_)


def col2im(x, out_shape, kernel, stride, pad_, params=None, out_qinfo=None):
    return call_op("col2im", [x], params, out_qinfo, out_shape=out_shape,
                   kernel=kernel, stride=stride, pad=pad_)


def segment_sum(x, ids, params: P.SegmentParams, out_qinfo=None):
    return call_op("segment_sum", [x, ids], params, out_qinfo)


def segment_mean(x, ids, params: P.SegmentParams, out_qinfo=None):
    return call_op("segment_mean", [x, ids], params, out_qinfo)


def segment_max(x, ids, params: P.SegmentParams, out_qinfo=None):
    return call_op("segment_max", [x, ids], params, out_qinfo)


def segment_min(x, ids, params: P.SegmentParams, out_qinfo=None):
    return call_op("segment_min", [x, ids], params, out_qinfo)


def segment_prod(x, ids, params: P.SegmentParams, out_qinfo=None):
    return call_op("segment_prod", [x, ids], params, out_qinfo)


def roipool(x, rois, pooled_size, spatial_scale, params=None, out_qinfo=None):
    return call_op("roipool", [x, rois], params, out_qinfo,
                   pooled_size=pooled_size, spatial_scale=spatial_scale)


def non_max_suppression(boxes, scores, iou_threshold=0.5, max_out=100,
                        params=None, out_qinfo=None):
    return call_op("non_max_suppression", [boxes, scores], params, out_qinfo,
                   iou_threshold=iou_threshold, max_out=max_out)


# LLM / sequence ops
def rope(x, params: P.RopeParams, positions=None, out_qinfo=None):
    return call_op("rope", [x], params, out_qinfo, positions=positions)


def scaled_dot_product_attention(q, k, v, params: P.SDPAParams = None, out_qinfo=None):
    return call_op("scaled_dot_product_attention", [q, k, v],
                   params or P.SDPAParams(), out_qinfo)


def llm_pos(x, cache, params: P.LlmPosParams, out_qinfo=None):
    return call_op("llm_pos", [x, cache], params, out_qinfo)


def cache_matmul(x, weight, bias, cache, params: P.CacheMatmulParams, out_qinfo=None):
    return call_op("cache_matmul", [x, weight, bias, cache], params, out_qinfo)


def cache_conv1d(x, weight, bias, cache, params: P.CacheConv1dParams, out_qinfo=None):
    return call_op("cache_conv1d", [x, weight, bias, cache], params, out_qinfo)


def fsmn(frame, l_filter, r_filter, frame_sequence, frame_counter,
         params: P.FSMNParams, out_qinfo=None):
    return call_op("fsmn", [frame, l_filter, r_filter, frame_sequence, frame_counter],
                   params, out_qinfo)


# --- detection / nd / strided-reduce surface (ref: csi_nn.h csinn_roi_align,
# csinn_psroipooling, csinn_proposal, csinn_space_to_batch_nd,
# csinn_batch_to_space_nd, csinn_arange, csinn_mean/min stride variants,
# csinn_unsorted_segment_*, csinn_data_convert) -------------------------------

def roialign(x, rois, params: P.RoiAlignParams = None, out_qinfo=None):
    return call_op("roialign", [x, rois], params or P.RoiAlignParams(), out_qinfo)


def psroipooling(x, rois, params: P.PSROIPoolingParams = None, out_qinfo=None):
    return call_op("psroipooling", [x, rois], params or P.PSROIPoolingParams(), out_qinfo)


def proposal(cls_prob, bbox_pred, im_info, params: P.ProposalParams = None, out_qinfo=None):
    return call_op("proposal", [cls_prob, bbox_pred, im_info],
                   params or P.ProposalParams(), out_qinfo)


def arange(params: P.ArangeParams, out_qinfo=None):
    return call_op("arange", [], params, out_qinfo)


def space_to_batch_nd(x, params: P.SpaceToBatchNdParams, out_qinfo=None):
    return call_op("space_to_batch_nd", [x], params, out_qinfo)


def batch_to_space_nd(x, params: P.SpaceToBatchNdParams, out_qinfo=None):
    return call_op("batch_to_space_nd", [x], params, out_qinfo)


def mean_stride(x, params: P.StridedReduceParams, out_qinfo=None):
    return call_op("mean_stride", [x], params, out_qinfo)


def min_stride(x, params: P.StridedReduceParams, out_qinfo=None):
    return call_op("min_stride", [x], params, out_qinfo)


def deconv3d(x, weight, bias=None, params: P.Conv3dParams = None, out_qinfo=None):
    return call_op("deconv3d", [x, weight, bias], params or P.Conv3dParams(), out_qinfo)


def depthwise_conv1d(x, weight, bias=None, params: P.Conv1dParams = None, out_qinfo=None):
    return call_op("depthwise_conv1d", [x, weight, bias], params or P.Conv1dParams(), out_qinfo)


def group_conv1d(x, weight, bias=None, params: P.Conv1dParams = None, out_qinfo=None):
    return call_op("group_conv1d", [x, weight, bias], params or P.Conv1dParams(), out_qinfo)


def depthwise_deconv2d(x, weight, bias=None, params: P.Deconv2dParams = None, out_qinfo=None):
    return call_op("depthwise_deconv2d", [x, weight, bias],
                   params or P.Deconv2dParams(), out_qinfo)


def group_deconv2d(x, weight, bias=None, params: P.Deconv2dParams = None, out_qinfo=None):
    return call_op("group_deconv2d", [x, weight, bias],
                   params or P.Deconv2dParams(), out_qinfo)


for _op in ["unsorted_segment_sum", "unsorted_segment_max", "unsorted_segment_min",
            "unsorted_segment_prod", "unsorted_segment_mean"]:
    def _mk(_o):
        def fn(x, segment_ids, params: P.SegmentParams, out_qinfo=None):
            return call_op(_o, [x, segment_ids], params, out_qinfo)
        fn.__name__ = _o
        return fn
    globals()[_op] = _mk(_op)


def data_convert(x, params=None, out_qinfo=None):
    """Dtype/quant-scheme conversion as a graph op (ref: CSINN_OP_DATA_CONVERT,
    shl_rvv data_convert kernels): dequant→requant into out_qinfo."""
    return call_op("data_convert", [x], params, out_qinfo)
