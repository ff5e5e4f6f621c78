"""Convolution family: conv1d/2d/3d, depthwise, group, transposed.

Analog of the reference's conv kernels (ref: source/reference/convolution.c,
source/thead_rvv/*/convolution*.c).  The reference picks 1x1-GEMM / Winograd /
im2col-GEMM per shape (ref: shl_rvv_conv2d_init_int8,
source/thead_rvv/int8/convolution.c:69-140); on TPU all of these lower to one
`lax.conv_general_dilated`, which XLA tiles onto the MXU directly — an im2col
or Winograd rewrite would only add HBM traffic, so the strategy table collapses
(decision recorded in SURVEY.md §7 step 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from csinn2_tpu.core.dtypes import Layout
from csinn2_tpu.ops.params import Conv1dParams, Conv2dParams, Conv3dParams, Deconv2dParams
from csinn2_tpu.ops.registry import registry
from csinn2_tpu.core.dtypes import Api

# dimension_numbers per logical layout: (input, weight, output)
_DN2D = {
    Layout.NCHW: ("NCHW", "OIHW", "NCHW"),
    Layout.NHWC: ("NHWC", "HWIO", "NHWC"),
}


def _weight_to(dn_weight: str, w, w_layout: Layout):
    """Weights arrive OIHW (NCHW models) or OHWI (NHWC models); convert to
    what dimension_numbers expects."""
    if dn_weight == "OIHW":
        if w_layout in (Layout.OIHW, Layout.O1HW):
            return w
        if w_layout == Layout.OHWI:
            return jnp.transpose(w, (0, 3, 1, 2))
    if dn_weight == "HWIO":
        if w_layout == Layout.OHWI:
            return jnp.transpose(w, (1, 2, 3, 0))
        if w_layout in (Layout.OIHW, Layout.O1HW):
            return jnp.transpose(w, (2, 3, 1, 0))
    raise ValueError(f"bad weight layout {w_layout} for {dn_weight}")


@registry.register("conv2d", api=Api.XLA)
def conv2d(x, weight, bias, *rest, w_layout: Layout = Layout.OIHW):
    """Grouped/depthwise 2-D convolution, f32.

    x: activation in params.layout; weight [O, I/g, kh, kw] (OIHW view);
    pad = (top, down, left, right) as in csinn_conv2d_params.
    rest: (params,) or (residual, params) — a fused residual (params.fuse_add,
    already dequantized by the generic dispatch) adds into the output before
    the fused activation.
    """
    params: Conv2dParams = rest[-1]
    residual = rest[0] if len(rest) > 1 else None
    dn = _DN2D[params.layout]
    w = _weight_to(dn[1], weight, w_layout)
    pt, pd, pl, pr = params.pad
    out = lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32),
        window_strides=params.stride,
        padding=((pt, pd), (pl, pr)),
        rhs_dilation=params.dilation,
        dimension_numbers=dn,
        feature_group_count=params.group,
        preferred_element_type=jnp.float32,
    )
    if bias is not None and jnp.size(bias) > 0:
        caxis = 1 if params.layout == Layout.NCHW else 3
        out = out + jnp.reshape(bias, [-1 if i == caxis else 1 for i in range(4)])
    if residual is not None:
        out = out + jnp.asarray(residual, jnp.float32)
    if params.fuse_relu:
        out = jnp.maximum(out, 0.0)
    if params.fuse_relu6:
        out = jnp.clip(out, 0.0, 6.0)
    if params.fuse_hswish:
        out = out * jnp.clip(out + 3.0, 0.0, 6.0) * (1.0 / 6.0)
    return out


@registry.register("depthwise_conv2d", api=Api.XLA)
def depthwise_conv2d(x, weight, bias, params: Conv2dParams, w_layout: Layout = Layout.OIHW):
    """Depthwise = grouped conv with group == C_in; weight [C,1,kh,kw]
    (ref: shl_ref_depthwise_conv2d_f32)."""
    cin = x.shape[1] if params.layout == Layout.NCHW else x.shape[3]
    p = Conv2dParams(**{**params.__dict__, "group": cin})
    return conv2d(x, weight, bias, p, w_layout=w_layout)


@registry.register("group_conv2d", api=Api.XLA)
def group_conv2d(x, weight, bias, params: Conv2dParams, w_layout: Layout = Layout.OIHW):
    return conv2d(x, weight, bias, params, w_layout=w_layout)


@registry.register("conv1d", api=Api.XLA)
def conv1d(x, weight, bias, params: Conv1dParams):
    """x: [N,C,W] (NCW) or [N,W,C]; weight [O, I/g, kw]."""
    if params.layout in (Layout.NCW, Layout.NCHW):
        x4 = x[:, :, None, :]           # N C 1 W
        w4 = weight[:, :, None, :]
        p2 = Conv2dParams(layout=Layout.NCHW, group=params.group,
                          stride=(1, params.stride), pad=(0, 0, *params.pad),
                          dilation=(1, params.dilation))
        out = conv2d(x4, w4, bias, p2)
        return out[:, :, 0, :]
    x4 = x[:, None, :, :]               # N 1 W C
    w4 = weight[:, None, :, :]          # O 1 kw I -> treated OHWI
    p2 = Conv2dParams(layout=Layout.NHWC, group=params.group,
                      stride=(1, params.stride), pad=(0, 0, *params.pad),
                      dilation=(1, params.dilation))
    out = conv2d(x4, w4, bias, p2, w_layout=Layout.OHWI)
    return out[:, 0, :, :]


@registry.register("conv3d", api=Api.XLA)
def conv3d(x, weight, bias, params: Conv3dParams):
    """x: [N,C,D,H,W]; weight [O, I/g, kd, kh, kw] (ref: shl_ref_conv3d_f32)."""
    dn = ("NCDHW", "OIDHW", "NCDHW")
    p = params.pad
    out = lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), jnp.asarray(weight, jnp.float32),
        window_strides=params.stride,
        padding=((p[0], p[1]), (p[2], p[3]), (p[4], p[5])),
        rhs_dilation=params.dilation,
        dimension_numbers=dn,
        feature_group_count=params.group,
        preferred_element_type=jnp.float32,
    )
    if bias is not None and jnp.size(bias) > 0:
        out = out + bias[None, :, None, None, None]
    return out


@registry.register("deconv2d", api=Api.XLA)
def deconv2d(x, weight, bias, params: Deconv2dParams):
    """Transposed conv (ref: shl_ref_deconv2d_f32).  weight [I, O/g, kh, kw]
    per the reference's deconv weight convention; NCHW only."""
    kh, kw = weight.shape[2], weight.shape[3]
    pt, pd, pl, pr = params.pad
    sh, sw = params.stride
    dh, dw = params.dilation
    # transposed conv = lhs-dilated conv with flipped kernel
    w = jnp.flip(weight, axis=(2, 3))
    w = jnp.swapaxes(w, 0, 1)  # -> [O/g, I, kh, kw]; for group>1 handled below
    if params.group > 1:
        # weight [I, O/g, kh, kw] grouped: build block form
        ig = weight.shape[0] // params.group
        wg = weight.reshape(params.group, ig, *weight.shape[1:])
        w = jnp.concatenate([jnp.swapaxes(jnp.flip(wg[g], axis=(2, 3)), 0, 1)
                             for g in range(params.group)], axis=0)
    pad_h = (dh * (kh - 1) - pt, dh * (kh - 1) - pd + params.out_pad[0])
    pad_w = (dw * (kw - 1) - pl, dw * (kw - 1) - pr + params.out_pad[1])
    out = lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32),
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(sh, sw),
        rhs_dilation=(dh, dw),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=params.group,
        preferred_element_type=jnp.float32,
    )
    if bias is not None and jnp.size(bias) > 0:
        out = out + bias[None, :, None, None]
    return out


@registry.register("deconv3d", api=Api.XLA)
def deconv3d(x, weight, bias, params: Conv3dParams):
    """Transposed 3-D conv (ref: shl_ref_deconv3d_f32).  x: [N,C,D,H,W];
    weight [I, O/g, kd, kh, kw]; lhs-dilated conv with flipped kernel."""
    kd, kh, kw = weight.shape[2:]
    p = params.pad
    sd, sh, sw = params.stride
    dd, dh, dw = params.dilation
    w = jnp.flip(jnp.asarray(weight, jnp.float32), axis=(2, 3, 4))
    if params.group > 1:
        ig = weight.shape[0] // params.group
        wg = w.reshape(params.group, ig, *w.shape[1:])
        w = jnp.concatenate([jnp.swapaxes(wg[g], 0, 1) for g in range(params.group)],
                            axis=0)
    else:
        w = jnp.swapaxes(w, 0, 1)
    pads = ((dd * (kd - 1) - p[0], dd * (kd - 1) - p[1]),
            (dh * (kh - 1) - p[2], dh * (kh - 1) - p[3]),
            (dw * (kw - 1) - p[4], dw * (kw - 1) - p[5]))
    out = lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), w, window_strides=(1, 1, 1), padding=pads,
        lhs_dilation=(sd, sh, sw), rhs_dilation=(dd, dh, dw),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        feature_group_count=params.group, preferred_element_type=jnp.float32)
    if bias is not None and jnp.size(bias) > 0:
        out = out + bias[None, :, None, None, None]
    return out


# Grouped / depthwise aliases: the reference registers these as distinct
# CSINN_OP_* entries (DEPTHWISE_CONV1D, GROUP_CONV1D, DEPTHWISE_DECONV2D,
# GROUP_DECONV2D); the group count in params carries the semantics here.
registry.register("depthwise_conv1d", conv1d, api=Api.XLA)
registry.register("group_conv1d", conv1d, api=Api.XLA)
registry.register("depthwise_deconv2d", deconv2d, api=Api.XLA)
registry.register("group_deconv2d", deconv2d, api=Api.XLA)
