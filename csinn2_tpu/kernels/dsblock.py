"""Fused depthwise-separable block: dw-conv(kxk) → requant → pw-conv(1x1) in
ONE Pallas kernel, int8 in → int8 out.

Why this kernel exists: a MobileNet-style graph is HBM-bandwidth-bound on TPU
— every layer boundary writes the full activation to HBM and reads it back
(XLA cannot fuse two convolutions into one HLO).  The depthwise intermediate
is the same size as the block input, so fusing the dw→pw pair removes a full
round-trip of the largest tensors in the network (the reference gets the same
effect on RISC-V by keeping the dw tile in L1 between its packn dw kernel and
the following 1x1 GEMM; ref: dedicated depthwise kernels
source/thead_rvv/int8/depthwise_convolution_3x3_int8_packn.c + the im2col-free
1x1 path in source/thead_rvv/int8/convolution_1x1_int8_packn.c).

Layout/semantics contract (must match kernels/qconv.py bit-for-bit, since the
graph pass in graph/fuse.py swaps this in for the two-node XLA path):

  mid  = clip(round((dwacc_i32 · effd[c] + bd[c])  clipped by relu)/s_mid)
  out  = clip(round((pwacc_i32 · effp[o] + bp[o])  clipped by relu)/s_out + zo)

with dwacc the exact integer depthwise accumulation (zero-padding is exact
because the symmetric schemes have activation zp = 0) and pwacc the exact
s8×s8→s32 MXU contraction over channels.

Stride-2 blocks: the W-dimension subsample cannot be expressed as a
lane-friendly strided slice inside the kernel, so the wrapper pre-splits the
input into even/odd W phases with XLA (one extra read+write of x) and the
kernel picks the phase per tap — the fusion still nets one full intermediate
round-trip of savings.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _clip_act(y, relu, relu6):
    if relu6:
        return jnp.clip(y, 0.0, 6.0)
    if relu:
        return jnp.maximum(y, 0.0)
    return y


def _kernel_s1(x_ref, dww_ref, effd_ref, bd_ref, pww_ref, effp_ref, bp_ref,
               out_ref, *, k: int, pads: Tuple[int, int, int, int],
               mid_scale: float, mid_relu: bool, mid_relu6: bool,
               out_relu: bool, out_relu6: bool, out_scale: Optional[float],
               out_zp: float, qmin: float, qmax: float, out_dtype):
    """One batch image, stride 1: grid (N,)."""
    pt, pd, pl_, pr = pads
    # dw accumulation in f32: int8×int8 products (≤ 2^14) summed over ≤ 25
    # taps stay < 2^24, exact in f32 — and f32 FMA is the VPU's native op
    # (int32 multiply is microcoded and ~10× slower on TPU)
    x = x_ref[0].astype(jnp.float32)                  # [H, W, C]
    H, W, C = x.shape
    Ho = H + pt + pd - k + 1
    Wo = W + pl_ + pr - k + 1
    xp = jnp.pad(x, ((pt, pd), (pl_, pr), (0, 0)))    # zp = 0 (symmetric)

    taps = dww_ref[:].astype(jnp.float32)             # [k*k, C]
    acc = jnp.zeros((Ho, Wo, C), jnp.float32)
    for dx in range(k):                               # W shift (sublane
        xs = jax.lax.slice(xp, (0, dx, 0),            # relayout) hoisted:
                           (H + pt + pd, dx + Wo, C))  # k copies, not k²
        for dy in range(k):
            sl = jax.lax.slice(xs, (dy, 0, 0), (dy + Ho, Wo, C))
            acc = acc + sl * taps[dy * k + dx].reshape(1, 1, C)

    y = acc * effd_ref[0].reshape(1, 1, C) \
        + bd_ref[0].reshape(1, 1, C)
    y = _clip_act(y, mid_relu, mid_relu6)
    q = jnp.clip(jnp.round(y / mid_scale), -128, 127).astype(jnp.int8)

    # flatten (Ho, Wo) for the MXU contraction; Wo padded to a sublane
    # multiple so the merge is layout-preserving
    Wp = _round_up(Wo, 8)
    if Wp != Wo:
        q = jnp.pad(q, ((0, 0), (0, Wp - Wo), (0, 0)))
    q2 = q.reshape(Ho * Wp, C)
    accp = jax.lax.dot_general(q2, pww_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    O = accp.shape[-1]
    y2 = accp.astype(jnp.float32) * effp_ref[0].reshape(1, O) \
        + bp_ref[0].reshape(1, O)
    y2 = _clip_act(y2, out_relu, out_relu6)
    y3 = y2.reshape(Ho, Wp, O)[:, :Wo, :]
    if out_scale is not None:
        y3 = jnp.clip(jnp.round(y3 / out_scale) + out_zp, qmin, qmax)
    out_ref[0] = y3.astype(out_dtype)


def _kernel_s2(xe_ref, xo_ref, dww_ref, effd_ref, bd_ref, pww_ref, effp_ref,
               bp_ref, out_ref, *, k: int, pads: Tuple[int, int, int, int],
               Ho: int, Wo: int,
               mid_scale: float, mid_relu: bool, mid_relu6: bool,
               out_relu: bool, out_relu6: bool, out_scale: Optional[float],
               out_zp: float, qmin: float, qmax: float, out_dtype):
    """One batch image, stride 2.  xe/xo are the even/odd W phases of x
    ([H, W/2(+1), C]); output col j reads input col 2j+dx-pl, which lives in
    phase (dx-pl) mod 2 at a unit-stride offset — all slices below are
    unit-stride, the H-subsample is an outer-dim stride (free)."""
    pt, pd, pl_, pr = pads
    xe = xe_ref[0].astype(jnp.int32)                  # [H, We, C]
    xo = xo_ref[0].astype(jnp.int32)                  # [H, Wo_ph, C]
    H, Wh, C = xe.shape
    # pad H for taps reaching past the image (to an even total so the
    # H-subsample below is a parity reshape — Mosaic has no stride-2 vector
    # slice); pad each phase by 1 col both sides so negative W offsets
    # become unit-stride slices
    Hp = 2 * (Ho + (k + 1) // 2)
    xe = jnp.pad(xe, ((pt, Hp - H - pt), (1, 1), (0, 0)))
    xo = jnp.pad(xo, ((pt, Hp - H - pt), (1, 1), (0, 0)))
    # split rows into (H/2, parity): row 2i+dy = [i + dy//2, dy%2]
    xe = xe.reshape(Hp // 2, 2, Wh + 2, C)
    xo = xo.reshape(Hp // 2, 2, Wh + 2, C)

    taps = dww_ref[:].astype(jnp.int32)               # [k*k, C]
    acc = jnp.zeros((Ho, Wo, C), jnp.int32)
    for dy in range(k):
        for dx in range(k):
            c0 = dx - pl_                              # input col = 2j + c0
            ph, off = (xe, c0 // 2) if c0 % 2 == 0 else (xo, (c0 - 1) // 2)
            rows = jax.lax.slice(ph, (dy // 2, dy % 2, off + 1, 0),
                                 (dy // 2 + Ho, dy % 2 + 1, off + 1 + Wo, C))
            acc = acc + rows.reshape(Ho, Wo, C) * taps[dy * k + dx].reshape(1, 1, C)

    y = acc.astype(jnp.float32) * effd_ref[0].reshape(1, 1, C) \
        + bd_ref[0].reshape(1, 1, C)
    y = _clip_act(y, mid_relu, mid_relu6)
    q = jnp.clip(jnp.round(y / mid_scale), -128, 127).astype(jnp.int8)

    Wp = _round_up(Wo, 8)
    if Wp != Wo:
        q = jnp.pad(q, ((0, 0), (0, Wp - Wo), (0, 0)))
    q2 = q.reshape(Ho * Wp, C)
    accp = jax.lax.dot_general(q2, pww_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    O = accp.shape[-1]
    y2 = accp.astype(jnp.float32) * effp_ref[0].reshape(1, O) \
        + bp_ref[0].reshape(1, O)
    y2 = _clip_act(y2, out_relu, out_relu6)
    y3 = y2.reshape(Ho, Wp, O)[:, :Wo, :]
    if out_scale is not None:
        y3 = jnp.clip(jnp.round(y3 / out_scale) + out_zp, qmin, qmax)
    out_ref[0] = y3.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("k", "stride", "pads", "mid_scale", "mid_relu",
                     "mid_relu6", "out_relu", "out_relu6", "out_scale",
                     "out_zp", "out_dtype", "interpret"))
def fused_dsconv(x, dw_w, effd, bd, pw_w, effp, bp, *, k: int, stride: int,
                 pads: Tuple[int, int, int, int], mid_scale: float,
                 mid_relu: bool, mid_relu6: bool, out_relu: bool,
                 out_relu6: bool, out_scale: Optional[float], out_zp: float,
                 out_dtype=jnp.int8, interpret: bool = False):
    """x [N,H,W,C] int8 NHWC; dw_w [k*k, C] int8; pw_w [C, O] int8;
    effd/bd [C] f32 (sx·sw_dw, dw bias); effp/bp [O] f32 (s_mid·sw_pw, pw
    bias); returns [N, Ho, Wo, O] out_dtype."""
    N, H, W, C = x.shape
    O = pw_w.shape[1]
    pt, pd, pl_, pr = pads
    Ho = (H + pt + pd - k) // stride + 1
    Wo = (W + pl_ + pr - k) // stride + 1

    odt = jnp.dtype(out_dtype)
    if jnp.issubdtype(odt, jnp.integer):
        info = jnp.iinfo(odt)
        qmin, qmax = float(info.min), float(info.max)
    else:
        qmin = qmax = 0.0

    effd = jnp.asarray(effd, jnp.float32).reshape(1, C)
    bd = jnp.asarray(bd, jnp.float32).reshape(1, C)
    effp = jnp.asarray(effp, jnp.float32).reshape(1, O)
    bp = jnp.asarray(bp, jnp.float32).reshape(1, O)
    dw_w = jnp.asarray(dw_w, jnp.int8).reshape(k * k, C)
    pw_w = jnp.asarray(pw_w, jnp.int8)

    const = lambda shape: pl.BlockSpec(shape, lambda n: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    common = [const((k * k, C)), const((1, C)), const((1, C)),
              const((C, O)), const((1, O)), const((1, O))]
    kw = dict(k=k, pads=pads, mid_scale=mid_scale, mid_relu=mid_relu,
              mid_relu6=mid_relu6, out_relu=out_relu, out_relu6=out_relu6,
              out_scale=out_scale, out_zp=out_zp, qmin=qmin, qmax=qmax,
              out_dtype=out_dtype)

    flops = N * Ho * Wo * (k * k * C + 2 * C * O)
    bytes_accessed = x.size + dw_w.size + pw_w.size + N * Ho * Wo * O * odt.itemsize

    if stride == 1:
        body = functools.partial(_kernel_s1, **kw)
        in_specs = [pl.BlockSpec((1, H, W, C), lambda n: (n, 0, 0, 0),
                                 memory_space=pltpu.VMEM)] + common
        args = [x]
    else:
        assert stride == 2, stride
        # W phase split (see module docstring); odd W gets one pad col so
        # both phases have the same width
        if W % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
        xe = x[:, :, 0::2, :]
        xo = x[:, :, 1::2, :]
        Wh = xe.shape[2]
        body = functools.partial(_kernel_s2, Ho=Ho, Wo=Wo, **kw)
        in_specs = [pl.BlockSpec((1, H, Wh, C), lambda n: (n, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, H, Wh, C), lambda n: (n, 0, 0, 0),
                                 memory_space=pltpu.VMEM)] + common
        args = [xe, xo]

    return pl.pallas_call(
        body,
        grid=(N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Ho, Wo, O), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Ho, Wo, O), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(flops=int(flops),
                                      bytes_accessed=int(bytes_accessed),
                                      transcendentals=0),
        interpret=interpret,
    )(*args, dw_w, effd, bd, pw_w, effp, bp)


# --- op callback + registration ---------------------------------------------

def _static_scalar(v):
    try:
        return float(np.asarray(v).reshape(()))
    except Exception:
        return None


def ds_block_xla(arrays, metas, params, out_qinfo, *, k, mid_scale, mid_relu,
                 mid_relu6, pw_relu, pw_relu6):
    """XLA fallback: the two qconv fast paths composed — bit-identical to the
    unfused graph by construction (same code), used on CPU and as the safety
    net when the Pallas kernel's preconditions fail."""
    import dataclasses as _dc

    from csinn2_tpu.core.dtypes import Dtype, Layout
    from csinn2_tpu.core.quant import QuantInfo
    from csinn2_tpu.core.tensor import TensorMeta
    from csinn2_tpu.kernels.qconv import _conv2d_quant, _depthwise_quant
    from csinn2_tpu.ops.params import Conv2dParams

    x, w1, b1, w2, b2 = arrays
    xm, w1m, b1m, w2m, b2m = metas
    mid_qi = QuantInfo(scale=mid_scale, zero_point=0, dtype=Dtype.INT8,
                       scheme=xm.qinfo.scheme)
    dw_params = _dc.replace(params, fuse_relu=mid_relu, fuse_relu6=mid_relu6)
    mid = _depthwise_quant([x, w1, b1], [xm, w1m, b1m], dw_params, mid_qi)
    mid_meta = TensorMeta(shape=tuple(mid.shape), dtype=Dtype.INT8,
                          layout=Layout.NHWC, qinfo=mid_qi)
    pw_params = Conv2dParams(stride=(1, 1), pad=(0, 0, 0, 0), group=1,
                             layout=Layout.NHWC, fuse_relu=pw_relu,
                             fuse_relu6=pw_relu6)
    return _conv2d_quant([mid, w2, b2], [mid_meta, w2m, b2m], pw_params,
                         out_qinfo)


def ds_block_cb(arrays, metas, params, out_qinfo, *, k, mid_scale, mid_relu,
                mid_relu6, pw_relu, pw_relu6):
    """Fused depthwise-separable block (op "ds_block").

    arrays = [x, dw_w, dw_b, pw_w, pw_b] (int8 carriers + f32 biases).
    The graph pass (graph/fuse.py) guarantees the structural preconditions;
    remaining dynamic ones (static scales, TPU backend) route to the XLA
    composition above."""
    import jax as _jax

    kw = dict(k=k, mid_scale=mid_scale, mid_relu=mid_relu,
              mid_relu6=mid_relu6, pw_relu=pw_relu, pw_relu6=pw_relu6)
    on_tpu = _jax.default_backend() == "tpu"
    if not on_tpu:
        return ds_block_xla(arrays, metas, params, out_qinfo, **kw)

    x, w1, b1, w2, b2 = arrays
    xm, w1m, w2m = metas[0], metas[1], metas[3]
    C = x.shape[-1]
    O = w2.shape[0]
    sx = _static_scalar(xm.qinfo.scale)
    if sx is None:
        return ds_block_xla(arrays, metas, params, out_qinfo, **kw)
    sw1 = np.broadcast_to(np.asarray(w1m.qinfo.scale, np.float32), (C,))
    sw2 = np.broadcast_to(np.asarray(w2m.qinfo.scale, np.float32), (O,))
    if out_qinfo is None or out_qinfo.dtype.is_float:
        out_scale, out_zp = None, 0.0
        out_dtype = jnp.float32 if out_qinfo is None else out_qinfo.dtype.jnp
    else:
        out_scale = _static_scalar(out_qinfo.scale)
        out_zp = _static_scalar(out_qinfo.zero_point)
        if out_scale is None or out_zp is None:
            return ds_block_xla(arrays, metas, params, out_qinfo, **kw)
        out_dtype = out_qinfo.dtype.jnp

    dw_w = jnp.transpose(jnp.reshape(jnp.asarray(w1, jnp.int8), (C, k * k)),
                         (1, 0))                    # [k*k, C]
    pw_w = jnp.transpose(jnp.reshape(jnp.asarray(w2, jnp.int8), (O, C)),
                         (1, 0))                    # [C, O]
    effd = sx * sw1
    bd = np.zeros((C,), np.float32) if b1 is None else b1
    effp = mid_scale * sw2
    bp = np.zeros((O,), np.float32) if b2 is None else b2
    return fused_dsconv(
        x, dw_w, effd, bd, pw_w, effp, bp, k=k,
        stride=int(params.stride[0]), pads=tuple(params.pad),
        mid_scale=mid_scale, mid_relu=mid_relu, mid_relu6=mid_relu6,
        out_relu=pw_relu, out_relu6=pw_relu6, out_scale=out_scale,
        out_zp=out_zp, out_dtype=out_dtype)


def _register():
    from csinn2_tpu.core.dtypes import Api
    from csinn2_tpu.ops.registry import registry
    registry.register("ds_block", ds_block_cb, api=Api.XLA, quant_direct=True)


_register()

