"""Remaining zoo: resize, detection ops, unpooling, col2im, yuv conversion
(ref: source/reference/{resize,roipool,roi_align,non_max_suppression,proposal,
psroipooling,unpooling,col2im,yuv_rgb_scale,maxpool2d_locat,threshold_relu}.c)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csinn2_tpu.core.dtypes import Api, Layout
from csinn2_tpu.ops.params import PoolParams, ResizeParams
from csinn2_tpu.ops.registry import registry

_f = jnp.float32


@registry.register("resize", api=Api.XLA)
def resize(x, params: ResizeParams):
    """Nearest / bilinear spatial resize, NCHW or NHWC
    (ref: shl_ref_resize_f32)."""
    x = jnp.asarray(x, _f)
    th, tw = params.target_size
    if params.layout == Layout.NCHW:
        n, c, h, w = x.shape
        out_shape = (n, c, th, tw)
        spatial = (2, 3)
    else:
        n, h, w, c = x.shape
        out_shape = (n, th, tw, c)
        spatial = (1, 2)
    if params.mode == "nearest":
        method = "nearest"
    else:
        method = "linear"
    if params.align_corners and params.mode != "nearest":
        # align_corners: sample grid endpoints map to endpoints
        idx_h = jnp.linspace(0.0, x.shape[spatial[0]] - 1, th)
        idx_w = jnp.linspace(0.0, x.shape[spatial[1]] - 1, tw)
        x_h = _interp_axis(x, idx_h, spatial[0])
        return _interp_axis(x_h, idx_w, spatial[1])
    return jax.image.resize(x, out_shape, method=method)


def _interp_axis(x, idx, axis):
    lo = jnp.floor(idx).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, x.shape[axis] - 1)
    frac = (idx - lo).astype(_f)
    xl = jnp.take(x, lo, axis=axis)
    xh = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = -1
    return xl + (xh - xl) * jnp.reshape(frac, shape)


@registry.register("maxpool2d_locat", api=Api.XLA)
def maxpool2d_locat(x, params: PoolParams):
    """Max-pool that outputs flat argmax indices per window
    (ref: shl_ref_maxpool2d_locat_f32), NCHW."""
    x = jnp.asarray(x, _f)
    n, c, h, w = x.shape
    kh, kw = params.kernel
    sh, sw = params.stride
    pt, pd, pl, pr = params.pad
    xp = jnp.pad(x, ((0, 0), (0, 0), (pt, pd), (pl, pr)), constant_values=-jnp.inf)
    # flat index map of the padded tensor translated to original coords
    hh = jnp.arange(xp.shape[2]) - pt
    ww = jnp.arange(xp.shape[3]) - pl
    flat = (hh[:, None] * w + ww[None, :]).astype(_f)
    oh = (xp.shape[2] - kh) // sh + 1
    ow = (xp.shape[3] - kw) // sw + 1
    outs = []
    idxs = []
    # static small windows: unroll
    vals = jnp.full((n, c, oh, ow), -jnp.inf, _f)
    locs = jnp.zeros((n, c, oh, ow), _f)
    for di in range(kh):
        for dj in range(kw):
            sub = xp[:, :, di:di + oh * sh:sh, dj:dj + ow * sw:sw]
            loc = flat[di:di + oh * sh:sh, dj:dj + ow * sw:sw]
            take = sub > vals
            vals = jnp.where(take, sub, vals)
            locs = jnp.where(take, loc[None, None], locs)
    return vals, locs.astype(jnp.int32)


@registry.register("unpooling", api=Api.XLA)
def unpooling(x, mask, params=None, out_hw=None):
    """Scatter pooled values back to argmax locations
    (ref: shl_ref_unpooling_f32), NCHW; mask holds flat h*W+w indices."""
    x = jnp.asarray(x, _f)
    n, c, h, w = x.shape
    oh, ow = out_hw
    flat = jnp.zeros((n, c, oh * ow), _f)
    m = jnp.asarray(mask, jnp.int32).reshape(n, c, -1)
    v = x.reshape(n, c, -1)
    flat = jax.vmap(jax.vmap(lambda f, mm, vv: f.at[mm].set(vv)))(flat, m, v)
    return flat.reshape(n, c, oh, ow)


@registry.register("col2im", api=Api.XLA)
def col2im(x, params=None, out_shape=None, kernel=(3, 3), stride=(1, 1), pad=(0, 0)):
    """Inverse of im2col: sum overlapping patches (ref: shl_ref_col2im_f32).
    x: [N, C*kh*kw, L]."""
    n, ckk, L = x.shape
    c = ckk // (kernel[0] * kernel[1])
    oh, ow = out_shape
    kh, kw = kernel
    sh, sw = stride
    ph, pw = pad
    cols_h = (oh + 2 * ph - kh) // sh + 1
    cols_w = (ow + 2 * pw - kw) // sw + 1
    x = jnp.asarray(x, _f).reshape(n, c, kh, kw, cols_h, cols_w)
    out = jnp.zeros((n, c, oh + 2 * ph, ow + 2 * pw), _f)
    for di in range(kh):
        for dj in range(kw):
            out = out.at[:, :, di:di + cols_h * sh:sh, dj:dj + cols_w * sw:sw].add(
                x[:, :, di, dj])
    return out[:, :, ph:ph + oh, pw:pw + ow]


@registry.register("roipool", api=Api.XLA)
def roipool(x, rois, params=None, pooled_size=(7, 7), spatial_scale=1.0):
    """ROI max pooling (ref: shl_ref_roipool_f32).  rois: [R, 5] (batch,x1,y1,x2,y2)."""
    x = jnp.asarray(x, _f)
    ph, pw = pooled_size

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        x1 = jnp.round(roi[1] * spatial_scale).astype(jnp.int32)
        y1 = jnp.round(roi[2] * spatial_scale).astype(jnp.int32)
        x2 = jnp.round(roi[3] * spatial_scale).astype(jnp.int32)
        y2 = jnp.round(roi[4] * spatial_scale).astype(jnp.int32)
        rw = jnp.maximum(x2 - x1 + 1, 1)
        rh = jnp.maximum(y2 - y1 + 1, 1)
        fmap = x[b]
        h, w = fmap.shape[1], fmap.shape[2]
        out = jnp.full((fmap.shape[0], ph, pw), -jnp.inf, _f)
        hs = jnp.arange(h)
        ws = jnp.arange(w)
        for i in range(ph):
            for j in range(pw):
                hstart = y1 + (i * rh) // ph
                hend = y1 + ((i + 1) * rh + ph - 1) // ph
                wstart = x1 + (j * rw) // pw
                wend = x1 + ((j + 1) * rw + pw - 1) // pw
                m = ((hs[:, None] >= hstart) & (hs[:, None] < hend) &
                     (ws[None, :] >= wstart) & (ws[None, :] < wend))
                vals = jnp.where(m[None], fmap, -jnp.inf)
                out = out.at[:, i, j].set(jnp.max(vals, axis=(1, 2)))
        return jnp.where(jnp.isfinite(out), out, 0.0)

    return jax.vmap(one_roi)(jnp.asarray(rois, _f))


@registry.register("non_max_suppression", api=Api.XLA)
def non_max_suppression(boxes, scores, params=None, iou_threshold=0.5, max_out=100):
    """Greedy NMS returning selected indices padded with -1
    (ref: shl_ref_non_max_suppression_std)."""
    boxes = jnp.asarray(boxes, _f)
    scores = jnp.asarray(scores, _f)
    n = boxes.shape[0]
    order = jnp.argsort(-scores)

    def iou(a, b):
        tl = jnp.maximum(a[:2], b[:2])
        br = jnp.minimum(a[2:], b[2:])
        wh = jnp.maximum(br - tl, 0.0)
        inter = wh[0] * wh[1]
        area_a = (a[2] - a[0]) * (a[3] - a[1])
        area_b = (b[2] - b[0]) * (b[3] - b[1])
        return inter / jnp.maximum(area_a + area_b - inter, 1e-9)

    def body(i, state):
        keep, suppressed, count = state
        idx = order[i]
        is_sup = suppressed[idx]

        def do_keep(st):
            keep, suppressed, count = st
            keep = keep.at[count].set(idx)
            ious = jax.vmap(lambda b: iou(boxes[idx], b))(boxes)
            suppressed = suppressed | (ious > iou_threshold)
            return keep, suppressed, count + 1

        return jax.lax.cond(is_sup | (count >= max_out), lambda st: st, do_keep,
                            (keep, suppressed, count))

    keep0 = jnp.full((max_out,), -1, jnp.int32)
    sup0 = jnp.zeros((n,), bool)
    keep, _, count = jax.lax.fori_loop(0, n, body, (keep0, sup0, 0))
    return keep


@registry.register("yuv_rgb_scale", api=Api.XLA)
def yuv_rgb_scale(x, params=None):
    """YUV→RGB conversion (ref: shl_ref_yuv_rgb_scale_f32); x: [N,3,H,W] YUV."""
    x = jnp.asarray(x, _f)
    y, u, v = x[:, 0], x[:, 1], x[:, 2]
    r = y + 1.13983 * v
    g = y - 0.39465 * u - 0.58060 * v
    b = y + 2.03211 * u
    return jnp.stack([r, g, b], axis=1)
