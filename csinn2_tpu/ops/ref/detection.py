"""Detection-head ops: roi_align, psroipooling, proposal (RPN).

(ref: source/reference/roialign.c, source/reference/psroipooling.c,
source/reference/proposal.c).  These are host-friendly ops — data-dependent
box counts make them natural CPU-base-graph residents in HYBRID mode (the
reference likewise never offloads them to the NPU), but every implementation
here is still fully jittable with static output shapes (padded with -1 / 0)
so they can run on-device when fused into a TPU graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from csinn2_tpu.core.dtypes import Api
from csinn2_tpu.ops.params import ProposalParams, PSROIPoolingParams, RoiAlignParams
from csinn2_tpu.ops.registry import registry

_f = jnp.float32


def _bilinear_at(fmap, y, x):
    """Bilinear sample fmap [C,H,W] at scalar (y, x) with the roialign
    border rules (ref: pre_calc_for_bilinear, roialign.c:30-80)."""
    h, w = fmap.shape[1], fmap.shape[2]
    oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    v = (fmap[:, y0, x0] * (1 - ly) * (1 - lx) + fmap[:, y0, x1] * (1 - ly) * lx +
         fmap[:, y1, x0] * ly * (1 - lx) + fmap[:, y1, x1] * ly * lx)
    return jnp.where(oob, 0.0, v)


@registry.register("roialign", api=Api.XLA)
def roialign(x, rois, params: RoiAlignParams):
    """ROI Align with bilinear sampling (ref: shl_ref_roi_align_f32,
    source/reference/roialign.c).  x: [N,C,H,W]; rois: [R,5] (batch,x1,y1,x2,y2)."""
    x = jnp.asarray(x, _f)
    rois = jnp.asarray(rois, _f)
    ph, pw = params.pooled_size
    scale = params.spatial_scale

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        x1, y1, x2, y2 = roi[1] * scale, roi[2] * scale, roi[3] * scale, roi[4] * scale
        rw = jnp.maximum(x2 - x1, 1.0)
        rh = jnp.maximum(y2 - y1, 1.0)
        bh, bw = rh / ph, rw / pw
        gh = params.sample_ratio if params.sample_ratio > 0 else int(2)
        gw = params.sample_ratio if params.sample_ratio > 0 else int(2)
        fmap = x[b]

        def one_bin(py, px):
            acc = jnp.zeros((fmap.shape[0],), _f)
            for iy in range(gh):
                for ix in range(gw):
                    yy = y1 + py * bh + (iy + 0.5) * bh / gh
                    xx = x1 + px * bw + (ix + 0.5) * bw / gw
                    acc = acc + _bilinear_at(fmap, yy, xx)
            return acc / (gh * gw)

        grid = jnp.stack([jnp.stack([one_bin(_f(i), _f(j)) for j in range(pw)],
                                    axis=-1) for i in range(ph)], axis=-2)
        return grid  # [C, ph, pw]

    return jax.vmap(one_roi)(rois)


@registry.register("psroipooling", api=Api.XLA)
def psroipooling(x, rois, params: PSROIPoolingParams):
    """Position-sensitive ROI pooling (ref: shl_ref_psroipooling_f32,
    source/reference/psroipooling.c:23-90).  x: [N, output_dim*g*g, H, W];
    rois: [R,5]; output [R, output_dim, g, g] via average pooling of the
    (ctop, ph, pw)-th score map over each bin."""
    x = jnp.asarray(x, _f)
    rois = jnp.asarray(rois, _f)
    g = params.group_size
    od = params.output_dim
    n, _, height, width = x.shape
    scale = params.spatial_scale
    hs = jnp.arange(height, dtype=_f)
    ws = jnp.arange(width, dtype=_f)

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        sw = jnp.round(roi[1]) * scale
        sh = jnp.round(roi[2]) * scale
        ew = jnp.round(roi[3] + 1.0) * scale
        eh = jnp.round(roi[4] + 1.0) * scale
        rh = jnp.maximum(eh - sh, 0.1)
        rw = jnp.maximum(ew - sw, 0.1)
        bh, bw = rh / g, rw / g
        fmap = x[b].reshape(od, g, g, height, width)

        out = jnp.zeros((od, g, g), _f)
        for ph in range(g):
            for pw in range(g):
                hstart = jnp.clip(jnp.floor(ph * bh + sh), 0, height)
                hend = jnp.clip(jnp.ceil((ph + 1) * bh + sh), 0, height)
                wstart = jnp.clip(jnp.floor(pw * bw + sw), 0, width)
                wend = jnp.clip(jnp.ceil((pw + 1) * bw + sw), 0, width)
                m = ((hs[:, None] >= hstart) & (hs[:, None] < hend) &
                     (ws[None, :] >= wstart) & (ws[None, :] < wend))
                cnt = jnp.sum(m.astype(_f))
                s = jnp.sum(jnp.where(m[None], fmap[:, ph, pw], 0.0), axis=(1, 2))
                out = out.at[:, ph, pw].set(jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0))
        return out

    return jax.vmap(one_roi)(rois)


@registry.register("proposal", api=Api.XLA)
def proposal(cls_prob, bbox_pred, im_info, params: ProposalParams):
    """Faster-RCNN RPN proposal layer (ref: shl_ref_proposal_f32,
    source/reference/proposal.c): anchor generation → bbox regression →
    clip to image → min-size filter → score sort → NMS → top-N rois.

    cls_prob: [N, 2*A, H, W] (bg/fg scores), bbox_pred: [N, 4*A, H, W],
    im_info: [N, 3] (height, width, scale).  Returns [post_nms_top_n, 5]
    rois as (batch_idx, x1, y1, x2, y2), padded by repeating the last box.
    Batch 1 (the reference likewise processes batch 0 only)."""
    cls_prob = jnp.asarray(cls_prob, _f)
    bbox_pred = jnp.asarray(bbox_pred, _f)
    im_info = jnp.asarray(im_info, _f).reshape(-1)[:3]
    num_anchors = len(params.scales) * len(params.ratios)
    h, w = cls_prob.shape[2], cls_prob.shape[3]
    stride = params.feature_stride

    # anchor boxes per (ratio, scale) around each feature cell
    # (ref: generate_anchor, proposal.c:63-81)
    anchors = []
    base = _f(stride)
    x_ctr = y_ctr = 0.5 * (base - 1.0)
    for ratio in params.ratios:
        size_ratio = jnp.floor(base * base / ratio)
        new_w = jnp.floor(jnp.sqrt(size_ratio) + 0.5)
        new_h = jnp.floor(new_w * ratio + 0.5)
        for scale in params.scales:
            ww, hh = new_w * scale, new_h * scale
            anchors.append(jnp.stack([x_ctr - 0.5 * (ww - 1), y_ctr - 0.5 * (hh - 1),
                                      x_ctr + 0.5 * (ww - 1), y_ctr + 0.5 * (hh - 1)]))
    anchors = jnp.stack(anchors)                     # [A, 4]

    shift_x = jnp.arange(w, dtype=_f) * stride
    shift_y = jnp.arange(h, dtype=_f) * stride
    sx, sy = jnp.meshgrid(shift_x, shift_y)          # [H, W]
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    all_anchors = (shifts + anchors[None]).reshape(-1, 4)   # [H*W*A, 4]

    # fg scores and bbox deltas aligned to anchor order (A fastest per cell)
    scores = cls_prob[0, num_anchors:].reshape(num_anchors, -1).T.reshape(-1)
    deltas = bbox_pred[0].reshape(num_anchors, 4, h * w)
    deltas = jnp.transpose(deltas, (2, 0, 1)).reshape(-1, 4)

    # bbox regression (ref: reg_bbox, proposal.c:43-61)
    bw = all_anchors[:, 2] - all_anchors[:, 0] + 1.0
    bh = all_anchors[:, 3] - all_anchors[:, 1] + 1.0
    cx = all_anchors[:, 0] + 0.5 * (bw - 1.0)
    cy = all_anchors[:, 1] + 0.5 * (bh - 1.0)
    pcx = deltas[:, 0] * bw + cx
    pcy = deltas[:, 1] * bh + cy
    pw_ = jnp.exp(jnp.clip(deltas[:, 2], -10, 10)) * bw
    ph_ = jnp.exp(jnp.clip(deltas[:, 3], -10, 10)) * bh
    boxes = jnp.stack([pcx - 0.5 * (pw_ - 1), pcy - 0.5 * (ph_ - 1),
                       pcx + 0.5 * (pw_ - 1), pcy + 0.5 * (ph_ - 1)], axis=1)

    # clip to image, filter small boxes (ref: proposal.c main loop)
    boxes = jnp.stack([jnp.clip(boxes[:, 0], 0, im_info[1] - 1),
                       jnp.clip(boxes[:, 1], 0, im_info[0] - 1),
                       jnp.clip(boxes[:, 2], 0, im_info[1] - 1),
                       jnp.clip(boxes[:, 3], 0, im_info[0] - 1)], axis=1)
    min_size = params.rpn_min_size * im_info[2]
    keep = ((boxes[:, 2] - boxes[:, 0] + 1 >= min_size) &
            (boxes[:, 3] - boxes[:, 1] + 1 >= min_size))
    scores = jnp.where(keep, scores, -jnp.inf)

    pre_n = min(params.rpn_pre_nms_top_n, boxes.shape[0])
    top_scores, order = jax.lax.top_k(scores, pre_n)
    top_boxes = boxes[order]

    nms_fn = registry.lookup("non_max_suppression", api=Api.XLA).exec
    sel = nms_fn(top_boxes, top_scores, iou_threshold=params.threshold,
                 max_out=params.rpn_post_nms_top_n)
    sel = jnp.maximum(sel, 0)        # pad -1 → index 0 (repeat best box)
    rois = top_boxes[sel]
    return jnp.concatenate([jnp.zeros((rois.shape[0], 1), _f), rois], axis=1)
