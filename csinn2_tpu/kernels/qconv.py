"""Quantized conv2d/fc fast paths: integer carriers on the bf16 MXU with the
whole dequant→conv→requant chain fused by XLA.

Analog of the reference's int8 conv kernels (ref: shl_rvv_conv_im2col_gemm_
packn_int8 + requantize epilogue, source/thead_rvv/int8/).  Design note: on
TPU the optimal int8 conv is *not* an integer pipeline — int8 values are
exact in bfloat16, so we subtract the activation zero-point in bf16, run the
MXU conv with f32 accumulation (bit-exact integer math), and apply
scale/zero-point/clip in the f32 epilogue, which XLA fuses into the conv.
Weight zero-points are zero by scheme (all our weight schemes are symmetric,
like the reference's W_SYM schemes).

These register as scheme-specialized callbacks with quant_direct=True: the
dispatcher hands them raw integer carriers + metadata instead of dequantized
floats (ref: the (op,dtype)-keyed callback table, source/nn2/setup.c:97-124).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from csinn2_tpu.core.dtypes import Api, Layout, QuantScheme
from csinn2_tpu.core.quant import QuantInfo
from csinn2_tpu.ops.registry import registry

# Only schemes whose weights are symmetric (zp_w == 0): the fused epilogue
# assumes acc = conv(x - zx, w)·sx·sw.  The u8 schemes quantize weights
# asymmetrically and take the generic dequant→f32→requant path instead
# (ref: the reference routes u8 through the same wrapper,
# source/reference/utils.c:609-650).
_QSCHEMES = [QuantScheme.INT8_SYM, QuantScheme.INT8_ASYM,
             QuantScheme.INT8_ASYM_W_SYM, QuantScheme.INT4_SYM,
             QuantScheme.INT4_ASYM_W_SYM, QuantScheme.INT16_SYM]

_DN2D = {
    Layout.NCHW: ("NCHW", "OIHW", "NCHW"),
    Layout.NHWC: ("NHWC", "HWIO", "NHWC"),
}


def _scales(qi):
    """(scale, zero_point); identity when the tensor is float/unquantized."""
    if qi is None or qi.dtype.is_float:
        return jnp.float32(1.0), jnp.float32(0.0)
    s = jnp.asarray(qi.scale, jnp.float32)
    z = jnp.asarray(qi.zero_point, jnp.float32)
    return s, z


def _conv2d_quant(arrays, metas, params, out_qinfo, w_layout=Layout.OIHW):
    """x int carrier, w int carrier (per-channel sym), optional f32 bias."""
    x = arrays[0]
    w = arrays[1]
    bias = arrays[2] if len(arrays) > 2 else None
    x_qi = metas[0].qinfo
    w_qi = metas[1].qinfo

    sx, zx = _scales(x_qi)
    sw, _ = _scales(w_qi)          # per-out-channel [O] or scalar

    # int8→int32→bf16: a direct int8→bf16 convert fused into a grouped conv
    # miscompiles to NaN on the v5e backend (XLA fusion bug, verified
    # empirically); the widening hop compiles correctly and fuses fine.
    def _widen(a):
        return a.astype(jnp.int32).astype(jnp.bfloat16) \
            if a.dtype in (jnp.int8, jnp.uint8) else a.astype(jnp.bfloat16)

    xb = _widen(x) - zx.astype(jnp.bfloat16)
    # weight arrives [O, I/g, kh, kw] (OIHW view) or OHWI
    if w_layout == Layout.OHWI:
        w = jnp.transpose(w, (0, 3, 1, 2))
    dn = _DN2D[params.layout]
    if dn[1] == "HWIO":
        wb = _widen(jnp.transpose(w, (2, 3, 1, 0)))
    else:
        wb = _widen(w)
    pt, pd, pl_, pr = params.pad
    acc = lax.conv_general_dilated(
        xb, wb, window_strides=params.stride, padding=((pt, pd), (pl_, pr)),
        rhs_dilation=params.dilation, dimension_numbers=dn,
        feature_group_count=params.group, preferred_element_type=jnp.float32)

    caxis = 1 if params.layout == Layout.NCHW else 3
    shape = [1] * 4
    shape[caxis] = -1
    eff = jnp.reshape(sx * sw, shape) if jnp.ndim(sw) else sx * sw
    y = acc * eff
    if bias is not None:
        y = y + jnp.reshape(jnp.asarray(bias, jnp.float32), shape)
    if params.fuse_relu:
        y = jnp.maximum(y, 0.0)
    if params.fuse_relu6:
        y = jnp.clip(y, 0.0, 6.0)
    if out_qinfo is None or out_qinfo.dtype.is_float:
        return y if out_qinfo is None else y.astype(out_qinfo.dtype.jnp)
    so, zo = _scales(out_qinfo)
    q = jnp.round(y / so) + zo
    q = jnp.clip(q, out_qinfo.dtype.qmin, out_qinfo.dtype.qmax)
    return q.astype(out_qinfo.dtype.jnp)


def _depthwise_quant(arrays, metas, params, out_qinfo, w_layout=Layout.OIHW):
    from csinn2_tpu.ops.params import Conv2dParams
    caxis = 1 if params.layout == Layout.NCHW else 3
    cin = metas[0].shape[caxis]
    p = Conv2dParams(**{**params.__dict__, "group": cin})
    return _conv2d_quant(arrays, metas, p, out_qinfo, w_layout)


def _fc_quant(arrays, metas, params, out_qinfo):
    """y = (x - zx) @ W^T · (sx·sw) + b, requantized."""
    x = arrays[0]
    w = arrays[1]
    bias = arrays[2] if len(arrays) > 2 else None
    sx, zx = _scales(metas[0].qinfo)
    sw, _ = _scales(metas[1].qinfo)

    def _widen(a):
        return a.astype(jnp.int32).astype(jnp.bfloat16) \
            if a.dtype in (jnp.int8, jnp.uint8) else a.astype(jnp.bfloat16)

    xb = _widen(x) - zx.astype(jnp.bfloat16)
    wb = _widen(w)
    acc = jnp.matmul(xb, wb.T, preferred_element_type=jnp.float32)
    y = acc * (sx * sw)            # sw broadcasts over last dim [units]
    if bias is not None:
        y = y + jnp.asarray(bias, jnp.float32)
    if out_qinfo is None or out_qinfo.dtype.is_float:
        return y if out_qinfo is None else y.astype(out_qinfo.dtype.jnp)
    so, zo = _scales(out_qinfo)
    q = jnp.clip(jnp.round(y / so) + zo, out_qinfo.dtype.qmin, out_qinfo.dtype.qmax)
    return q.astype(out_qinfo.dtype.jnp)


for _s in _QSCHEMES:
    registry.register("conv2d", _conv2d_quant, api=Api.XLA, scheme=_s,
                      quant_direct=True)
    registry.register("group_conv2d", _conv2d_quant, api=Api.XLA, scheme=_s,
                      quant_direct=True)
    registry.register("depthwise_conv2d", _depthwise_quant, api=Api.XLA, scheme=_s,
                      quant_direct=True)
    registry.register("fullyconnected", _fc_quant, api=Api.XLA, scheme=_s,
                      quant_direct=True)
