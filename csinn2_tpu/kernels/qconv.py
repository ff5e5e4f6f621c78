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

import os

import numpy as np
import jax.numpy as jnp
from jax import lax

from csinn2_tpu.core.dtypes import Api, Layout, QuantScheme
from csinn2_tpu.core.quant import QuantInfo
from csinn2_tpu.ops.registry import registry

# Symmetric-weight schemes use acc = conv(x - zx, w)·sx·sw directly; the u8
# schemes (asymmetric weights) shift both carriers by 128 into s8 and correct
# the weight zero-point exactly with an integer window-sum term — see
# _conv2d_quant (ref: the reference runs u8 through its int kernels with the
# zp folded into bias, fuse_zp_to_bias, tests/validation_layer/testutil.h).
_QSCHEMES = [QuantScheme.INT8_SYM, QuantScheme.INT8_ASYM,
             QuantScheme.INT8_ASYM_W_SYM, QuantScheme.INT4_SYM,
             QuantScheme.INT4_ASYM_W_SYM, QuantScheme.INT16_SYM]
_U8_SCHEMES = [QuantScheme.UINT8_ASYM, QuantScheme.UINT8_SYM]

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


def _static_zp(qi) -> float:
    """Activation zero-point when statically known, else None."""
    if qi is None:
        return 0.0
    try:
        return float(np.asarray(qi.zero_point).reshape(()))
    except Exception:
        return None


def _static_zp_vec(qi):
    """Weight zero-point as a static numpy vector/scalar, else None."""
    if qi is None:
        return np.float32(0.0)
    try:
        return np.asarray(qi.zero_point)
    except Exception:
        return None


def precompute_zp_wsum(w_np, w_layout=Layout.OIHW):
    """AOT per-out-channel weight sum for the activation-zp correction,
    computed ONCE at graph build from the const weight: with zp-padding
    every window is full, so  y = acc - zx·Σw[o]  exactly (the reference's
    fuse_zp_to_bias AOT fold, tests/validation_layer/testutil.h).

    A VECTOR is the only correction form that stays inside the fused conv
    epilogue: positional [1,O,H',W'] maps (whether AOT consts or in-graph
    ones-convs) break the fusion and force the int32 accumulator through
    HBM — measured 710-741 µs vs 215 µs for the bare conv at MNv2
    b1.expand.  NOTE: update_const() of the weight does not refresh this
    fold (same caveat as any AOT fold)."""
    w = np.asarray(w_np)
    if w_layout == Layout.OHWI:
        w = np.transpose(w, (0, 3, 1, 2))
    # u8-stored weights correspond to shifted s8 carriers (see _conv2d_quant)
    if w.dtype == np.uint8:
        w = w.astype(np.int64) - 128
    return w.astype(np.int64).sum(axis=(1, 2, 3)).astype(np.int32)   # [O]


def _dw_taps_int(x, wv, params, dn, padding):
    """Depthwise conv (channel multiplier 1) as a kh·kw-tap integer
    elementwise MAC: one strided slice of the zero-padded input per tap,
    times that tap's per-channel weight, summed in int32.  Everything is
    elementwise/slice, so XLA fuses it into a single VPU pass over x —
    bypassing the slow grouped-conv lowering (see caller).  Returns the
    int32 accumulator in the layer's activation layout, or None when the
    geometry does not fit."""
    if dn[0] == "NHWC":
        h_ax, w_ax, c_ax = 1, 2, 3
    else:
        h_ax, w_ax, c_ax = 2, 3, 1
    o_ax, i_ax = dn[1].index("O"), dn[1].index("I")
    k_axes = [a for a in range(4) if a not in (o_ax, i_ax)]
    kh, kw = wv.shape[k_axes[0]], wv.shape[k_axes[1]]
    sh, sw = params.stride
    (pt, pd), (pl_, pr) = padding
    H, W = x.shape[h_ax], x.shape[w_ax]
    oh = (H + pt + pd - kh) // sh + 1
    ow = (W + pl_ + pr - kw) // sw + 1

    pads = [(0, 0)] * 4
    pads[h_ax] = (pt, pd)
    pads[w_ax] = (pl_, pr)
    xpad = jnp.pad(x, pads)                      # zero pad (zp map corrects)

    # per-channel tap weights broadcast along the activation channel axis
    wtaps = jnp.transpose(wv, (o_ax, i_ax) + tuple(k_axes))[:, 0]  # [C,kh,kw]
    bshape = [1] * 4
    bshape[c_ax] = -1

    acc = jnp.zeros([x.shape[0] if a == 0 else
                     (oh if a == h_ax else (ow if a == w_ax else x.shape[c_ax]))
                     for a in range(4)], jnp.int32)
    for di in range(kh):
        for dj in range(kw):
            start = [0] * 4
            limit = list(xpad.shape)
            strides = [1] * 4
            start[h_ax], limit[h_ax], strides[h_ax] = di, di + (oh - 1) * sh + 1, sh
            start[w_ax], limit[w_ax], strides[w_ax] = dj, dj + (ow - 1) * sw + 1, sw
            sl = lax.slice(xpad, start, limit, strides)
            acc = acc + sl.astype(jnp.int32) * \
                jnp.reshape(wtaps[:, di, dj].astype(jnp.int32), bshape)
    return acc


def _conv2d_quant(arrays, metas, params, out_qinfo, w_layout=Layout.OIHW):
    """x int carrier, w int carrier (per-channel sym), optional f32 bias.

    Fast path: TRUE integer convolution s8×s8→s32 on the MXU int8 pipe
    (preferred_element_type=int32 — measured 437 TOPS on v5e, 27× the bf16-
    carrier conv, and bit-exact).  An asymmetric activation zero-point is
    handled exactly by padding with zp instead of 0 and subtracting
    zp·Σw per out-channel afterwards (the reference folds the same
    correction into bias at init, ref: fuse_zp_to_bias,
    tests/validation_layer/testutil.h).  int16 carriers (INT16_SYM) run
    s16×s16→s32 through the same integer path — exact where the f32-carrier
    fallback is not (s16 products exceed the 24-bit f32 mantissa)."""
    smap = None
    if len(arrays) > 2 and getattr(metas[-1], "name", "") == "__zp_wsum__":
        # AOT-precomputed per-channel weight-sum vector (precompute_zp_wsum,
        # appended by the op API when x has a static nonzero zp)
        smap = arrays[-1]
        arrays = arrays[:-1]
        metas = metas[:-1]
    residual = r_qi = None
    if getattr(params, "fuse_add", False):
        # fused residual join (slot after bias — see ops/api._conv_inputs):
        # added to the dequantized accumulator inside the SAME fused epilogue
        residual = arrays[3]
        r_qi = metas[3].qinfo
        arrays = arrays[:3]
    x = arrays[0]
    w = arrays[1]
    bias = arrays[2] if len(arrays) > 2 else None
    x_qi = metas[0].qinfo
    w_qi = metas[1].qinfo

    sx, zx = _scales(x_qi)
    sw, zw_f = _scales(w_qi)       # per-out-channel [O] or scalar

    # weight arrives [O, I/g, kh, kw] (OIHW view) or OHWI
    if w_layout == Layout.OHWI:
        w = jnp.transpose(w, (0, 3, 1, 2))
    dn = _DN2D[params.layout]
    wv = jnp.transpose(w, (2, 3, 1, 0)) if dn[1] == "HWIO" else w
    pt, pd, pl_, pr = params.pad
    caxis = 1 if params.layout == Layout.NCHW else 3
    shape = [1] * 4
    shape[caxis] = -1

    zp = _static_zp(x_qi)
    w_zp = _static_zp_vec(w_qi)
    u8 = (x.dtype == jnp.uint8 and wv.dtype == jnp.uint8 and zp is not None
          and w_zp is not None)
    if u8:
        # -- u8 asymmetric: shift both carriers by 128 into s8 ----------------
        # (x_u8 - zx)(w_u8 - zw) == (x_s8 - zx')(w_s8 - zw') with
        # x_s8 = x-128, zx' = zx-128 (ditto w) — EXACT, and it reuses the
        # s8 integer MXU pipe below.  The remaining asymmetric-weight term
        # -zw'·Σwindow(x - zx') is computed with an integer ones-kernel conv
        # (the conv-shaped generalization of the reference's fuse_zp_to_bias:
        # a dense FC folds it into bias, a conv needs the per-window sum).
        x = (x.astype(jnp.int16) - 128).astype(jnp.int8)
        wv = (wv.astype(jnp.int16) - 128).astype(jnp.int8)
        zp = zp - 128.0
        zw_vec = np.asarray(w_zp, np.int64) - 128          # [O] or scalar
    elif (x.dtype == jnp.uint8 and wv.dtype == jnp.int8 and zp is not None):
        # -- u8 graph edge → s8 interior: only the INPUT tensor is u8 (the
        # model builder quantizes weights and internal activations straight
        # to s8, models/common.py); shift x once — this is the single
        # extra HBM pass the u8 edge costs, paid only on the network input
        x = (x.astype(jnp.int16) - 128).astype(jnp.int8)
        zp = zp - 128.0
    same_int = (x.dtype == wv.dtype and x.dtype in (jnp.int8, jnp.int16))
    if same_int and zp is not None:
        # -- integer path: s8×s8→s32 on the MXU int pipe; s16×s16→s32 lowers
        # through XLA's integer conv (int16 is sym-only here, so zp == 0 —
        # this is the exact-accumulation path the f32 carrier cannot provide:
        # s16 products reach 2^30 > the f32 24-bit mantissa.
        # (ref: the int16 GEMM core, source/c908_opt/gemm_int16_ncxhwx.S —
        # same int32 accumulator, same >=2^31 saturation caveat at huge K)
        zp_i = int(round(zp))
        pad_with_zp = zp_i != 0 and bool(pt or pd or pl_ or pr)
        if pad_with_zp:
            # zp-pad so border windows see (zp - zp)·w = 0 like interior
            # ones — the correction then stays a PER-CHANNEL VECTOR, which
            # fuses into the conv epilogue exactly like bias.  A positional
            # [1,O,H',W'] correction map (AOT const or in-graph ones-conv)
            # does NOT fuse — it forces the int32 accumulator through HBM
            # (measured: MNv2 b1.expand 710-741 µs with either map form vs
            # 215 µs for the bare conv; MNv1's map-free int8-sym pw convs
            # run at the HBM floor).  The pad costs one extra pass over x
            # for spatially-padded convs only.
            pads = [(0, 0)] * 4
            haxis = 1 if params.layout == Layout.NHWC else 2
            pads[haxis] = (pt, pd)
            pads[haxis + 1] = (pl_, pr)
            x = jnp.pad(x, pads, constant_values=np.asarray(zp_i, x.dtype))
            padding = ((0, 0), (0, 0))
        else:
            padding = ((pt, pd), (pl_, pr))
        acc = None
        o_ax = dn[1].index("O")
        dw_mult1 = (params.group > 1 and wv.shape[dn[1].index("I")] == 1
                    and wv.shape[o_ax] == params.group
                    and params.dilation == (1, 1)
                    and max(wv.shape[a] for a in range(4)
                            if a not in (o_ax, dn[1].index("I"))) <= 7
                    and os.environ.get("CSINN2_DW_TAPS", "0") == "1")
        if dw_mult1:
            # MEASURED NEGATIVE (v5e, r4): XLA's grouped integer conv runs
            # dw layers at 37-65% of HBM bandwidth (per-layer profile), and
            # this k·k-tap elementwise MAC was built to fuse into one VPU
            # pass — but XLA does NOT fuse the strided tap slices (MNv1
            # 75→69% of SOL, bs1 latency 0.08→0.65 ms; MNv2 20.6k→19.8k
            # img/s).  Kept opt-in (CSINN2_DW_TAPS=1) as the probe record.
            acc = _dw_taps_int(x, wv, params, dn, padding)
        if acc is None:
            acc = lax.conv_general_dilated(
                x, wv, window_strides=params.stride, padding=padding,
                rhs_dilation=params.dilation, dimension_numbers=dn,
                feature_group_count=params.group,
                preferred_element_type=jnp.int32)

        def _convg(img, wgt, groups):
            # helper conv with the layer's exact geometry
            return lax.conv_general_dilated(
                img, wgt, window_strides=params.stride, padding=padding,
                rhs_dilation=params.dilation, dimension_numbers=dn,
                feature_group_count=groups, preferred_element_type=jnp.int32)

        if zp_i != 0:
            # Activation-zp correction: with zp-padding every window is full,
            # so the exact correction is the PER-CHANNEL Σw vector — it rides
            # the fused epilogue like bias (ref: fuse_zp_to_bias,
            # tests/validation_layer/testutil.h).  Preferred source: the AOT
            # const vector (appended by the op API); fallback: an in-graph
            # weight reduction (tiny [O] output, one extra read of w per run).
            if smap is not None and smap.ndim == 1:
                wsum = smap.astype(jnp.int32)
            else:
                o_axis = dn[1].index("O")
                wsum = jnp.sum(wv.astype(jnp.int32),
                               axis=tuple(a for a in range(4) if a != o_axis))
            acc = acc - zp_i * jnp.reshape(wsum, shape)
        if u8 and np.any(zw_vec != 0):
            # General asymmetric-weight path (arbitrary zw): needs per-window
            # activation sums S[p] = Σ_window (x - zx') — one ones-KERNEL
            # conv over x (full-batch, unavoidable for true asym weights).
            # zp_i != 0 → x is zp-padded (full windows): subtract zx'·count.
            # zp_i == 0 → zero padding and the sum is already exact.
            g = params.group
            o_axis = dn[1].index("O")
            i_axis = dn[1].index("I")
            kh_kw = [wv.shape[a] for a in range(4) if a not in (o_axis, i_axis)]
            ig = wv.shape[i_axis]
            ones_shape = [0] * 4
            ones_shape[o_axis] = g
            ones_shape[i_axis] = ig
            rest = [a for a in range(4) if a not in (o_axis, i_axis)]
            ones_shape[rest[0]], ones_shape[rest[1]] = kh_kw
            ones_w = jnp.ones(ones_shape, jnp.int8)
            s0 = _convg(x, ones_w, g)                      # [N, g, H', W']
            winsum = s0 - zp_i * (ig * kh_kw[0] * kh_kw[1])
            O = wv.shape[o_axis]
            if g != O:
                winsum = jnp.repeat(winsum, O // g, axis=caxis)
            zw_arr = jnp.asarray(np.broadcast_to(zw_vec, (O,)), jnp.int32)
            acc = acc - jnp.reshape(zw_arr, shape) * winsum
        acc = acc.astype(jnp.float32)
    else:
        # -- float-carrier fallback (asym-unknown zp, mixed dtypes) ----------
        def _widen(a):
            # int8→int32→bf16: a direct int8→bf16 convert fused into a grouped
            # conv miscompiles to NaN on v5e (XLA fusion bug, verified
            # empirically); int16 carries in f32 (bf16 would truncate) but is
            # NOT bit-exact at s16 full scale — the integer path above is
            return a.astype(jnp.int32).astype(
                jnp.float32 if a.dtype == jnp.int16 else jnp.bfloat16)

        xb = _widen(x)
        wb = _widen(wv)
        if xb.dtype != wb.dtype:
            xb, wb = xb.astype(jnp.float32), wb.astype(jnp.float32)
        xb = xb - zx.astype(xb.dtype)
        # asymmetric weights (u8 schemes with a dynamic zp): subtract zw on
        # the O axis of the dn[1]-layout weight
        o_shape = [1] * 4
        o_shape[dn[1].index("O")] = -1
        wb = wb - jnp.reshape(zw_f, o_shape if jnp.ndim(zw_f) else ()) \
                     .astype(wb.dtype)
        acc = lax.conv_general_dilated(
            xb, wb, window_strides=params.stride, padding=((pt, pd), (pl_, pr)),
            rhs_dilation=params.dilation, dimension_numbers=dn,
            feature_group_count=params.group, preferred_element_type=jnp.float32)

    def _b(v):
        return jnp.reshape(v, shape) if jnp.ndim(v) else v

    def _res_fp():
        # dequantized residual (r - zr)*sr as f32 — ONE extra multiply-add
        # per element inside the fused conv epilogue (vs a standalone int8
        # add node: 2 reads + requantize + write, 70-290 us at bs128)
        if r_qi is None or r_qi.dtype.is_float:
            return residual.astype(jnp.float32)
        sr, zr = _scales(r_qi)
        return (residual.astype(jnp.float32) - zr) * sr

    eff = sx * sw                           # [O] or scalar, f32
    if out_qinfo is not None and not out_qinfo.dtype.is_float:
        # Fully-folded requantize: ONE multiply + ONE add + round + clip.
        # scale2 = sx·sw/so, bias2 = zo + bias/so; the fused-relu/relu6
        # clamps fold into the integer clip bounds (round(y/so)+zo is
        # monotone affine, so clamping y to [0, 6] == clamping q to
        # [zo, round(6/so)+zo]).  The unfolded chain (·eff, +bias, relu6,
        # /so, +zo, clip) pushed XLA past its conv-epilogue fusion budget
        # and spilled the accumulator to HBM — measured 725 µs vs 330 µs
        # for this folded form at MNv2 b1.expand shapes.  (ref: the fused
        # requantize epilogue requantize_m4_s,
        # source/thead_rvv/int8/gemm_int8_packn.c:26-41.)
        so, zo = _scales(out_qinfo)
        # clip bounds must be STATIC python floats: traced bounds stop XLA
        # recognizing the clamp pattern and the epilogue falls out of the
        # conv fusion (the output qinfo is per-tensor, so they are static;
        # a dynamic qinfo falls through to the unfolded float path below)
        try:
            so_f = float(np.asarray(out_qinfo.scale).reshape(()))
            zo_f = float(np.asarray(out_qinfo.zero_point).reshape(()))
        except Exception:
            so_f = None
        # MEASURED dispatch (v5e): the folded form wins for ASYMMETRIC
        # outputs (MNv2-u8 24.3k → 41.8k img/s — the longer unfolded chain
        # ·eff, +bias, relu6, /so, +zo, clip overflows XLA's conv-epilogue
        # fusion budget and spills the accumulator), but REGRESSES the
        # symmetric-output models (MNv1-int8 60k → 38.6k img/s with either
        # static or traced clip bounds).  Dispatch on zo: zero → classic
        # chain, nonzero → folded.
        if so_f is not None and zo_f != 0.0 and not params.fuse_hswish:
            scale2 = eff / so
            bias2 = zo if bias is None else \
                zo + jnp.asarray(bias, jnp.float32) / so
            lo = float(out_qinfo.dtype.qmin)
            hi = float(out_qinfo.dtype.qmax)
            if params.fuse_relu or params.fuse_relu6:
                lo = max(lo, zo_f)
            if params.fuse_relu6:
                hi = min(hi, float(np.round(6.0 / so_f)) + zo_f)
            y = acc.astype(jnp.float32) * _b(scale2) + _b(bias2)
            if residual is not None:
                # folded residual: r_q*(sr/so) with the -zr*sr/so constant in
                # the bias term — keeps the epilogue one mul-add deeper only
                if r_qi is None or r_qi.dtype.is_float:
                    y = y + residual.astype(jnp.float32) / so
                else:
                    sr, zr = _scales(r_qi)
                    y = y + residual.astype(jnp.float32) * (sr / so) \
                        - zr * sr / so
            q = jnp.clip(jnp.round(y), lo, hi)
            return q.astype(out_qinfo.dtype.jnp)
        y = acc.astype(jnp.float32) * _b(eff)
        if bias is not None:
            y = y + _b(jnp.asarray(bias, jnp.float32))
        if residual is not None:
            y = y + _res_fp()
        if params.fuse_relu:
            y = jnp.maximum(y, 0.0)
        if params.fuse_relu6:
            y = jnp.clip(y, 0.0, 6.0)
        if params.fuse_hswish:
            y = y * jnp.clip(y + 3.0, 0.0, 6.0) * (1.0 / 6.0)
        q = jnp.clip(jnp.round(y / so) + zo, out_qinfo.dtype.qmin,
                     out_qinfo.dtype.qmax)
        return q.astype(out_qinfo.dtype.jnp)

    y = acc * _b(eff)
    if bias is not None:
        y = y + _b(jnp.asarray(bias, jnp.float32))
    if residual is not None:
        y = y + _res_fp()
    if params.fuse_relu:
        y = jnp.maximum(y, 0.0)
    if params.fuse_relu6:
        y = jnp.clip(y, 0.0, 6.0)
    if params.fuse_hswish:
        y = y * jnp.clip(y + 3.0, 0.0, 6.0) * (1.0 / 6.0)
    return y if out_qinfo is None else y.astype(out_qinfo.dtype.jnp)


def _depthwise_quant(arrays, metas, params, out_qinfo, w_layout=Layout.OIHW):
    from csinn2_tpu.ops.params import Conv2dParams
    caxis = 1 if params.layout == Layout.NCHW else 3
    cin = metas[0].shape[caxis]
    p = Conv2dParams(**{**params.__dict__, "group": cin})
    return _conv2d_quant(arrays, metas, p, out_qinfo, w_layout)


def _fc_quant(arrays, metas, params, out_qinfo):
    """y = (x - zx) @ (W - zw)^T · (sx·sw) + b, requantized."""
    x = arrays[0]
    w = arrays[1]
    bias = arrays[2] if len(arrays) > 2 else None
    x_qi = metas[0].qinfo
    w_qi = metas[1].qinfo
    sx, zx = _scales(x_qi)
    sw, zw_f = _scales(w_qi)

    def _widen(a):
        if a.dtype in (jnp.int8, jnp.uint8):
            # int8→int32→bf16 hop: see _conv2d_quant fallback note
            return a.astype(jnp.int32).astype(jnp.bfloat16)
        if a.dtype == jnp.int16:
            return a.astype(jnp.float32)    # bf16 would truncate >8-bit values
        return a.astype(jnp.bfloat16)

    zp = _static_zp(x_qi)
    w_zp = _static_zp_vec(w_qi)
    u8 = (x.dtype == jnp.uint8 and w.dtype == jnp.uint8 and zp is not None
          and w_zp is not None)
    if u8:
        # shift both carriers by 128 into s8 — exact (see _conv2d_quant)
        x = (x.astype(jnp.int16) - 128).astype(jnp.int8)
        w = (w.astype(jnp.int16) - 128).astype(jnp.int8)
        zp = zp - 128.0
    elif x.dtype == jnp.uint8 and w.dtype == jnp.int8 and zp is not None:
        # u8 graph edge → s8 interior (see _conv2d_quant)
        x = (x.astype(jnp.int16) - 128).astype(jnp.int8)
        zp = zp - 128.0
    if (x.dtype == w.dtype and x.dtype in (jnp.int8, jnp.int16)
            and zp is not None):
        # integer dot s8×s8→s32 on the MXU int pipe (s16×s16→s32 through
        # XLA's integer dot — the exact-accumulation path for INT16_SYM,
        # ref: gemm_int16_ncxhwx.S); zp corrections are exact for a dense
        # dot (the reference's fuse_zp_to_bias fold,
        # tests/validation_layer/testutil.h):
        # (x-zx)@(W-zw)ᵀ = x@Wᵀ - zx·Σ_k W - zw·(Σ_k x - K·zx)
        acc = lax.dot_general(x, w, (((x.ndim - 1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
        zp_i = int(round(zp))
        if zp_i != 0:
            acc = acc - zp_i * jnp.sum(w.astype(jnp.int32), axis=1)
        if u8:
            zw_vec = np.asarray(w_zp, np.int64) - 128      # [units] or scalar
            if np.any(zw_vec != 0):
                K = x.shape[-1]
                xsum = jnp.sum(x.astype(jnp.int32), axis=-1, keepdims=True)
                zw_arr = jnp.asarray(np.broadcast_to(zw_vec, (w.shape[0],)),
                                     jnp.int32)
                acc = acc - zw_arr * (xsum - K * zp_i)
        acc = acc.astype(jnp.float32)
        y = acc * (sx * sw)
        if bias is not None:
            y = y + jnp.asarray(bias, jnp.float32)
        if out_qinfo is None or out_qinfo.dtype.is_float:
            return y if out_qinfo is None else y.astype(out_qinfo.dtype.jnp)
        so, zo = _scales(out_qinfo)
        q = jnp.clip(jnp.round(y / so) + zo, out_qinfo.dtype.qmin,
                     out_qinfo.dtype.qmax)
        return q.astype(out_qinfo.dtype.jnp)

    xb = _widen(x)
    wb = _widen(w)
    if xb.dtype != wb.dtype:
        xb, wb = xb.astype(jnp.float32), wb.astype(jnp.float32)
    xb = xb - zx.astype(xb.dtype)
    wb = wb - (jnp.reshape(zw_f, (-1, 1)) if jnp.ndim(zw_f)
               else zw_f).astype(wb.dtype)
    acc = jnp.matmul(xb, wb.T, preferred_element_type=jnp.float32)
    y = acc * (sx * sw)            # sw broadcasts over last dim [units]
    if bias is not None:
        y = y + jnp.asarray(bias, jnp.float32)
    if out_qinfo is None or out_qinfo.dtype.is_float:
        return y if out_qinfo is None else y.astype(out_qinfo.dtype.jnp)
    so, zo = _scales(out_qinfo)
    q = jnp.clip(jnp.round(y / so) + zo, out_qinfo.dtype.qmin, out_qinfo.dtype.qmax)
    return q.astype(out_qinfo.dtype.jnp)


for _s in _QSCHEMES + _U8_SCHEMES:
    registry.register("conv2d", _conv2d_quant, api=Api.XLA, scheme=_s,
                      quant_direct=True)
    registry.register("group_conv2d", _conv2d_quant, api=Api.XLA, scheme=_s,
                      quant_direct=True)
    registry.register("depthwise_conv2d", _depthwise_quant, api=Api.XLA, scheme=_s,
                      quant_direct=True)
    registry.register("fullyconnected", _fc_quant, api=Api.XLA, scheme=_s,
                      quant_direct=True)
