#!/usr/bin/env python
"""q4_0 decode-GEMM dequant-strategy probe at the 7B hot shapes.

r4 finding: q4_0 decode sits at ~44% of the int4 weight-read SOL while q8_0
reaches 74% of its — the gap is VPU nibble-dequant throughput, measured
identical for unpack+concat and split-nibble-dot kernel forms.  This probe
measures structurally different dequant pipelines per (bn, bk) tile:

  cur      — shipping split-dot: int8->int32 widen, 3 int32 shifts, 2 casts
             to bf16, per-element scale multiply on both nibble planes
  i8shift  — same split-dot but nibble extraction in int8 lanes (4x the
             int32 lane width) and direct int8->bf16 casts
  i4native — weight stored as jnp.int4 [K, N]; Mosaic's native sub-byte
             unpack on load, single dot (no split), scale via sublane repeat
  bitcast  — nibble -> bf16 by bit surgery in int16 lanes:
             (0x4300 | nib) bitcast to bf16 gives 128+nib; the -(128+8)
             offset is folded OUT of the kernel into a per-block correction
             dot y -= 136 * (xbsum @ s), so the kernel never subtracts
  i8dot    — W4A8: activation pre-quantized per-32-block to int8, nibble
             planes stay int8, s8xs8->s32 MXU dots per K-block pair with
             scales applied to int32 block partials (llama.cpp Q8_1-style)

SOL = (K*N/2 packed bytes + K/32*N*4 scale bytes + x) / HBM.
(ref: the C920 block-quant matmul family this collapses,
source/c920_opt/fp16/matmul_fp16.c:304-347)
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from csinn2_tpu.kernels.qmatmul import quant_matmul, pack_int4, BLOCK

HBM = 763e9 * 1.073


def _cdiv(a, b):
    return -(-a // b)


def device_time(fn, args, iters=256, reps=4):
    staged = [jax.device_put(jnp.stack([a, a])) for a in args]
    staged = jax.block_until_ready(staged)

    @jax.jit
    def jfn(n, *st):
        def body(i, acc):
            ins = [jax.lax.dynamic_index_in_dim(s, i % 2, 0, keepdims=False)
                   for s in st]
            return acc + jnp.sum(fn(*ins).astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def fetch(n):
        t0 = time.perf_counter()
        np.asarray(jfn(jnp.int32(n), *staged))
        return time.perf_counter() - t0

    fetch(2); fetch(2 + iters)
    t_s = min(fetch(2) for _ in range(reps))
    t_l = min(fetch(2 + iters) for _ in range(reps))
    return max(t_l - t_s, 1e-12) / iters


# ---------------------------------------------------------------- variants --

def _mk_call(kernel, M, K, N, bm, bn, bk, in_specs, args, n_scratch=1):
    n_k = K // bk
    grid = (M // bm, N // bn, n_k)
    return pl.pallas_call(
        functools.partial(kernel, n_k=n_k, bk=bk, bn=bn),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)] * n_scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(*args)


def _split_kernel(x_ref, xh_ref, w_ref, s_ref, o_ref, acc, *, n_k, bk, bn,
                  shifts: str):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    if shifts == "i32":
        p = w_ref[:].astype(jnp.int32)
        lo = ((p << 28) >> 28).astype(jnp.bfloat16)
        hi = (p >> 4).astype(jnp.bfloat16)
    else:  # int8-lane shifts
        p = w_ref[:]
        lo = ((p << 4) >> 4).astype(jnp.bfloat16)
        hi = (p >> 4).astype(jnp.bfloat16)
    s = s_ref[:].astype(jnp.bfloat16)
    s_half = jnp.repeat(s, 16, axis=0)
    lo = lo * s_half
    hi = hi * s_half
    xlo = x_ref[:].astype(jnp.bfloat16)
    xhi = xh_ref[:].astype(jnp.bfloat16)
    acc[:] += (jnp.dot(xlo, lo, preferred_element_type=jnp.float32)
               + jnp.dot(xhi, hi, preferred_element_type=jnp.float32))

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc[:]


def run_split(x, wp, s, bm, bn, bk, shifts):
    M, K = x.shape[0], 2 * wp.shape[0]
    N = wp.shape[1]
    x3 = x.reshape(M, K // BLOCK, BLOCK)
    xlo = x3[:, :, :16].reshape(M, K // 2)
    xhi = x3[:, :, 16:].reshape(M, K // 2)
    in_specs = [
        pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // BLOCK, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
    ]
    return _mk_call(functools.partial(_split_kernel, shifts=shifts),
                    M, K, N, bm, bn, bk, in_specs, [xlo, xhi, wp, s])


def _i4_kernel(x_ref, w_ref, s_ref, o_ref, acc, *, n_k, bk, bn):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    w = w_ref[:].astype(jnp.bfloat16)
    s = s_ref[:].astype(jnp.bfloat16)
    w = w * jnp.repeat(s, BLOCK, axis=0)
    acc[:] += jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc[:]


def run_i4(x, w4, s, bm, bn, bk):
    M, K = x.shape
    N = w4.shape[1]
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // BLOCK, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
    ]
    return _mk_call(_i4_kernel, M, K, N, bm, bn, bk, in_specs, [x, w4, s])


def _bitcast_kernel(x_ref, xh_ref, w_ref, s_ref, o_ref, acc, *, n_k, bk, bn):
    """nibble -> bf16 by bit surgery: bf16 0x4300|n = 128+n (n in [0,16));
    the constant 128 + the [-8,7] recentre (-8 after &0xF... the nibble here
    is the RAW 4 bits, value = raw - 16*(raw>=8); we instead dequantize
    raw directly and fold the correction outside:
       w_signed = raw - 16*b,  y = sum x*(raw)*s - 16*sum (x*b)*s
    still needs b.  Simpler fold: treat raw in [0,15], w = raw - 8 iff we
    ALSO re-bias storage by +8 at pack time (raw' = w+8 in [0,15]); then
    value = raw' - 8 and the -8 folds into y -= 8 * (xbsum @ s).  This probe
    uses the re-biased storage (one-time repack)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]                                     # int8, raw' = val+8 packed
    # widen to int16 lanes once, then pure 16-bit bit ops
    p16 = p.astype(jnp.int16)
    lo16 = (p16 & 0xF) | 0x4300
    hi16 = ((p16 >> 4) & 0xF) | 0x4300
    lo = jax.lax.bitcast_convert_type(lo16, jnp.bfloat16)   # 128 + raw'
    hi = jax.lax.bitcast_convert_type(hi16, jnp.bfloat16)
    s = s_ref[:].astype(jnp.bfloat16)
    s_half = jnp.repeat(s, 16, axis=0)
    lo = lo * s_half
    hi = hi * s_half
    xlo = x_ref[:].astype(jnp.bfloat16)
    xhi = xh_ref[:].astype(jnp.bfloat16)
    acc[:] += (jnp.dot(xlo, lo, preferred_element_type=jnp.float32)
               + jnp.dot(xhi, hi, preferred_element_type=jnp.float32))

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc[:]


def run_bitcast(x, wp_biased, s, bm, bn, bk):
    """y = kernel(x, raw') - (128+8) * (x_blocksum @ s)."""
    M, K = x.shape[0], 2 * wp_biased.shape[0]
    N = wp_biased.shape[1]
    x3 = x.reshape(M, K // BLOCK, BLOCK)
    xlo = x3[:, :, :16].reshape(M, K // 2)
    xhi = x3[:, :, 16:].reshape(M, K // 2)
    in_specs = [
        pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // BLOCK, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
    ]
    y = _mk_call(_bitcast_kernel, M, K, N, bm, bn, bk, in_specs,
                 [xlo, xhi, wp_biased, s])
    bsum = jnp.sum(x3, axis=2)                       # [M, K/32]
    corr = jnp.dot(bsum, s, preferred_element_type=jnp.float32)
    return y - 136.0 * corr


def _andmask_kernel(x_ref, xh_ref, w_ref, s_ref, o_ref, acc, *, n_k, bk, bn):
    """Mixed-bias pack: byte = (w_hi<<4) | ((w_lo+8)&0xF).  Then in int8 lanes
    (4x the int32 ALU width, no shifts — Mosaic can't legalize narrow shli):
       p & 0x0F = w_lo + 8           (bias corrected by an outside dot)
       p & 0xF0 = 16*w_hi  EXACTLY   (two's complement; /16 pre-folded into
                                      the x_hi activation half outside)
    so dequant is 2 ANDs + 2 casts + 2 scale mults per byte."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]                                     # int8 [bk/2, bn]
    l8 = p & jnp.int8(0x0F)
    h8 = p & jnp.int8(-16)                           # 0xF0 as signed int8
    s = s_ref[:].astype(jnp.bfloat16)
    s_half = jnp.repeat(s, 16, axis=0)
    lo = l8.astype(jnp.bfloat16) * s_half
    hi = h8.astype(jnp.bfloat16) * s_half
    acc[:] += (jnp.dot(x_ref[:], lo, preferred_element_type=jnp.float32)
               + jnp.dot(xh_ref[:], hi, preferred_element_type=jnp.float32))

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc[:]


def pack_int4_mixed(q):
    """[K, N] int4 values in [-8,7] -> [K/2, N] bytes: hi nibble = two's
    complement w(j+16), lo nibble = w(j) + 8 (biased)."""
    K = q.shape[0]
    q3 = np.asarray(q, np.int16).reshape(K // BLOCK, BLOCK, -1)
    lo = (q3[:, :16, :] + 8) & 0xF
    hi = q3[:, 16:, :] & 0xF
    return jnp.asarray((lo | (hi << 4)).astype(np.int8).reshape(K // 2, -1))


def run_andmask(x, wp_mixed, s, bm, bn, bk):
    M, K = x.shape[0], 2 * wp_mixed.shape[0]
    N = wp_mixed.shape[1]
    x3 = x.reshape(M, K // BLOCK, BLOCK)
    xlo = x3[:, :, :16].reshape(M, K // 2).astype(jnp.bfloat16)
    xhi = (x3[:, :, 16:].reshape(M, K // 2) / 16).astype(jnp.bfloat16)
    in_specs = [
        pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // BLOCK, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
    ]
    y = _mk_call(_andmask_kernel, M, K, N, bm, bn, bk, in_specs,
                 [xlo, xhi, wp_mixed, s])
    bsum_lo = jnp.sum(x3[:, :, :16], axis=2).astype(jnp.float32)  # [M, K/32]
    return y - 8.0 * jnp.dot(bsum_lo, s, preferred_element_type=jnp.float32)


def _stream_kernel(x_ref, w_ref, o_ref, acc, *, n_k, bk, bn):
    """Pure weight-stream: one cheap op per byte — the per-tile HBM ceiling.
    Depends on x so the timing loop can't hoist it as loop-invariant."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = x_ref[:, :bn].astype(jnp.float32)

    r = bk // 2 // 8
    a = acc[:]
    for i in range(8):
        a = a + w_ref[i * r, :].astype(jnp.float32)[None, :]
    acc[:] = a

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc[:]


def run_stream(x, wp, s, bm, bn, bk):
    M, K = 8, 2 * wp.shape[0]
    N = wp.shape[1]
    in_specs = [
        pl.BlockSpec((M, bn), lambda i, j, k: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
    ]
    xw = jnp.tile(x[:, :128], (1, _cdiv(N, 128)))[:, :N].astype(jnp.float32)
    return _mk_call(_stream_kernel, M, K, N, M, bn, bk, in_specs, [xw, wp])


def _intdot_kernel(x_ref, xh_ref, sx_ref, w_ref, s_ref, o_ref, acc, *,
                   n_k, bk, bn):
    """W4A8: per-32-block int8 activations, s8xs8->s32 dots per K-block with
    scales applied to the int32 partials (the reference's int8 GEMM epilogue
    at block granularity; ref: gemm_int8_packn.c:26-41 requantize-on-acc)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]                                     # int8 [bk/2, bn]
    l8 = p & jnp.int8(0x0F)                          # w_lo + 8 (mixed pack)
    h8 = p & jnp.int8(-16)                           # 16*w_hi
    G = bk // BLOCK
    a = acc[:]
    sxa = sx_ref[:]                                  # [bm, bk/2] lane-expanded
    for g in range(G):
        wl = l8[g * 16:(g + 1) * 16, :]
        wh = h8[g * 16:(g + 1) * 16, :]
        p_lo = jnp.dot(x_ref[:, g * 16:(g + 1) * 16], wl,
                       preferred_element_type=jnp.int32)
        p_hi = jnp.dot(xh_ref[:, g * 16:(g + 1) * 16], wh,
                       preferred_element_type=jnp.int32)
        # h8 = 16*w_hi -> p_hi is a multiple of 16; >>4 is exact
        pz = p_lo + (p_hi >> 4)
        sc = sxa[:, g * 16:g * 16 + 1] * s_ref[g:g + 1, :]   # [bm,bn] outer
        a = a + pz.astype(jnp.float32) * sc
    acc[:] = a

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc[:]


def run_intdot(x, wp_mixed, s, bm, bn, bk):
    """x quantized per-32-block to int8 outside; hi-half activations carry the
    /16 fold; +8 lo-bias corrected by an outside dot on the int8 block sums."""
    M, K = x.shape[0], 2 * wp_mixed.shape[0]
    N = wp_mixed.shape[1]
    x3 = jnp.asarray(x, jnp.float32).reshape(M, K // BLOCK, BLOCK)
    sx = jnp.max(jnp.abs(x3), axis=2) / 127.0 + 1e-12          # [M, K/32]
    xq3 = jnp.clip(jnp.round(x3 / sx[:, :, None]), -127, 127)
    xlo = xq3[:, :, :16].reshape(M, K // 2).astype(jnp.int8)
    xhi = xq3[:, :, 16:].reshape(M, K // 2).astype(jnp.int8)
    sxh = (sx / 16.0).astype(jnp.float32)
    in_specs = [
        pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // BLOCK, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
    ]
    # h8 = 16*w_hi so p_hi is 16x too big; the kernel corrects with an exact
    # int32 arithmetic shift (>>4) on the partial before scaling
    sxe = jnp.repeat(sx.astype(jnp.float32), 16, axis=1)       # [M, K/2]
    y = _mk_call(_intdot_kernel, M, K, N, bm, bn, bk, in_specs,
                 [xlo, xhi, sxe, wp_mixed, s])
    bsum_lo = jnp.sum(xq3[:, :, :16], axis=2) * sx               # [M, K/32]
    return y - 8.0 * jnp.dot(bsum_lo.astype(jnp.float32), s,
                             preferred_element_type=jnp.float32)


def _andmask_bf16s_kernel(x_ref, xh_ref, w_ref, s_ref, o_ref, acc, *,
                          n_k, bk, bn):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]
    l8 = p & jnp.int8(0x0F)
    h8 = p & jnp.int8(-16)
    s_half = jnp.repeat(s_ref[:], 16, axis=0)        # already bf16
    lo = l8.astype(jnp.bfloat16) * s_half
    hi = h8.astype(jnp.bfloat16) * s_half
    acc[:] += (jnp.dot(x_ref[:], lo, preferred_element_type=jnp.float32)
               + jnp.dot(xh_ref[:], hi, preferred_element_type=jnp.float32))

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc[:]


def run_andmask_bf16s(x, wp_mixed, s16, bm, bn, bk):
    M, K = x.shape[0], 2 * wp_mixed.shape[0]
    N = wp_mixed.shape[1]
    x3 = x.reshape(M, K // BLOCK, BLOCK)
    xlo = x3[:, :, :16].reshape(M, K // 2).astype(jnp.bfloat16)
    xhi = (x3[:, :, 16:].reshape(M, K // 2) / 16).astype(jnp.bfloat16)
    in_specs = [
        pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // BLOCK, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
    ]
    y = _mk_call(_andmask_bf16s_kernel, M, K, N, bm, bn, bk, in_specs,
                 [xlo, xhi, wp_mixed, s16])
    bsum_lo = jnp.sum(x3[:, :, :16], axis=2).astype(jnp.float32)
    return y - 8.0 * jnp.dot(bsum_lo, s16.astype(jnp.float32),
                             preferred_element_type=jnp.float32)


def _noscale_kernel(x_ref, xh_ref, w_ref, s_ref, o_ref, acc, *, n_k, bk, bn):
    """TIMING ONLY (wrong math): andmask without the per-value scale mults —
    isolates what the 2 bf16 multiplies + repeat cost."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]
    lo = (p & jnp.int8(0x0F)).astype(jnp.bfloat16)
    hi = (p & jnp.int8(-16)).astype(jnp.bfloat16)
    acc[:] += (jnp.dot(x_ref[:], lo, preferred_element_type=jnp.float32)
               + jnp.dot(xh_ref[:], hi, preferred_element_type=jnp.float32))

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc[:] + s_ref[0, 0]


def _halfq8_kernel(x_ref, xh_ref, w_ref, s_ref, o_ref, acc, *, n_k, bk, bn):
    """TIMING ONLY: single-plane cast+scale+dot on the raw packed bytes —
    the q8_0-kernel cost profile at half the values."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    w = w_ref[:].astype(jnp.bfloat16)
    s_half = jnp.repeat(s_ref[:], 16, axis=0)
    acc[:] += jnp.dot(x_ref[:], w * s_half, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc[:] + jnp.sum(xh_ref[0, :1])


def run_timing_variant(kern, x, wp, s16, bm, bn, bk):
    M, K = x.shape[0], 2 * wp.shape[0]
    N = wp.shape[1]
    x3 = x.reshape(M, K // BLOCK, BLOCK)
    xlo = x3[:, :, :16].reshape(M, K // 2).astype(jnp.bfloat16)
    xhi = x3[:, :, 16:].reshape(M, K // 2).astype(jnp.bfloat16)
    in_specs = [
        pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // BLOCK, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
    ]
    return _mk_call(kern, M, K, N, bm, bn, bk, in_specs, [xlo, xhi, wp, s16])


def _w4a8_kernel(x_ref, s_ref, w_ref, o_ref, acc, *, n_k, bk, bn):
    """W4A8 block-diag: x is pre-expanded to X'[(g,m), k] int8 (nonzero only
    in block g), so ONE s8xs8->s32 MXU dot per nibble plane yields per-block
    partials Z[(g,m), n] — the per-32-block weight scales then apply to Z
    rows (g-major), not per weight value.  The VPU never touches a weight
    value beyond the two extraction ANDs (int8 lanes).

    Weight plane h8 = p & 0xF0 = 16*w_hi exactly (two's complement); the /16
    folds into the hi-plane partial via an exact int32 shift.  l8 = p & 0x0F
    = w_lo + 8 (mixed pack); the +8 rides an outside correction dot."""
    k = pl.program_id(2)
    G = bk // BLOCK                                   # 16 at bk=512

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:]                                      # int8 [bk/2, bn]
    l8 = p & jnp.int8(0x0F)
    h8 = p & jnp.int8(-16)
    x = x_ref[:]                                      # int8 [8G, bk/2] x2 planes
    z_lo = jnp.dot(x[:, :bk // 2], l8, preferred_element_type=jnp.int32)
    z_hi = jnp.dot(x[:, bk // 2:], h8, preferred_element_type=jnp.int32)
    z = z_lo + (z_hi >> 4)                            # [8G, bn] int32
    s_rep = jnp.repeat(s_ref[:], 8, axis=0)           # [G,bn] -> [8G,bn]
    zs = z.astype(jnp.float32) * s_rep
    acc[:] += jnp.sum(zs.reshape(G, 8, bn), axis=0)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc[:]


def run_w4a8(x, wp_mixed, s, bm, bn, bk):
    """Per-token (row) int8 activation scale; block-diag expansion outside."""
    M, K = x.shape[0], 2 * wp_mixed.shape[0]
    N = wp_mixed.shape[1]
    G = bk // BLOCK
    xf = jnp.asarray(x, jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0 + 1e-12  # [M,1]
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)     # [M,K]
    # X'[(g,m), tile-k]: for K-tile t, row g*8+m covers x[m, t*bk + g*32 : +32]
    # nibble-split: lo half then hi half along lanes ([8G, bk/2] each).
    nt = K // bk
    x4 = xq.reshape(M, nt, G, BLOCK)                  # [M, nt, G, 32]
    gid = jax.lax.broadcasted_iota(jnp.int32, (G, 1, 1, 1, 1), 0)
    g2 = jax.lax.broadcasted_iota(jnp.int32, (G, 1, 1, G, 1), 3)
    mask = (g2 == gid)                                # [G,1,1,G,1]
    # xe[(g,m), nt, G*32] = x4[m, nt, :, :] masked to block g
    xe = jnp.where(mask, x4[None], 0)                 # [G, M, nt, G, 32]
    xlo = xe[..., :16].reshape(G, M, nt, G * 16)
    xhi = xe[..., 16:].reshape(G, M, nt, G * 16)
    xp = jnp.concatenate([xlo, xhi], axis=-1)         # [G, M, nt, bk]
    xp = xp.transpose(2, 0, 1, 3).reshape(nt, G * M, bk)
    xp = xp.transpose(1, 0, 2).reshape(G * M, K)      # [(g,m), k-tiles*bk]
    in_specs = [
        pl.BlockSpec((G * M, bk), lambda i, j, k: (0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // BLOCK, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
    ]
    n_k = K // bk
    grid = (1, N // bn, n_k)
    y = pl.pallas_call(
        functools.partial(_w4a8_kernel, n_k=n_k, bk=bk, bn=bn),
        grid=grid,
        in_specs=in_specs + [pl.BlockSpec((bk // 2, bn),
                                          lambda i, j, k: (k, j),
                                          memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, bn), lambda i, j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xp, s, wp_mixed)
    # +8 lo-bias correction: sum over lo-lane xq per block g
    bsum = jnp.sum(x4[..., :16], axis=3).reshape(M, K // BLOCK)
    y = y - 8.0 * jnp.dot(bsum.astype(jnp.float32), s,
                          preferred_element_type=jnp.float32)
    return y * sx


def main():
    import os
    cache_dir = os.path.join(__file__.rsplit("/", 2)[0], ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    print(f"# backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    all_shapes = [
        # (K, N, bn, bk)
        (4096, 12288, 6144, 512),
        (4096, 22016, 5504, 512),
        (11008, 4096, 4096, 512),
        (4096, 4096, 4096, 512),
    ]
    pick = os.environ.get("SHAPES")
    shapes = ([all_shapes[int(i)] for i in pick.split(",")]
              if pick else all_shapes)
    only = os.environ.get("VARIANTS")
    M = 8
    for (K, N, bn, bk) in shapes:
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        q = rng.integers(-8, 8, (K, N)).astype(np.int8)
        s = jnp.asarray(rng.random((K // BLOCK, N)) * 0.01 + 0.005, jnp.float32)
        wp = pack_int4(jnp.asarray(q))
        wp_b = pack_int4(jnp.asarray(q + 8)) if False else None
        # re-biased pack: raw' = val + 8 in [0,15] -> same byte packing but
        # unsigned nibbles (pack_int4 masks to 4 bits, so just add 8 first)
        qb = ((q.astype(np.int16) + 8) & 0xF).astype(np.int8)
        q3 = qb.reshape(K // BLOCK, BLOCK, N)
        wp_b = jnp.asarray(
            (q3[:, :16, :].astype(np.int32)
             | (q3[:, 16:, :].astype(np.int32) << 4))
            .astype(np.int8).reshape(K // 2, N))
        wp_m = pack_int4_mixed(q)
        try:
            w4 = jax.jit(lambda a: a.astype(jnp.int4))(jnp.asarray(q))
        except Exception as e:
            print(f"   (int4 dtype unavailable: {type(e).__name__})")
            w4 = None

        # golden
        wf = q.astype(np.float32).reshape(K // BLOCK, BLOCK, N) \
            * np.asarray(s)[:, None, :]
        gold = np.asarray(x, np.float32) @ wf.reshape(K, N)

        bytes_ = K * N // 2 + (K // BLOCK) * N * 4 + M * K * 2
        sol = bytes_ / HBM
        print(f"-- M{M} K{K} N{N} bn{bn} bk{bk}: int4 SOL {sol*1e6:7.1f} us",
              flush=True)

        variants = {
            "cur(quant_matmul)": lambda a: quant_matmul(
                a, wp, s, scale_mode="block", packed_int4=True),
            "split_i32": lambda a: run_split(a, wp, s, M, bn, bk, "i32"),
            "split_i8": lambda a: run_split(a, wp, s, M, bn, bk, "i8"),
            **({"i4native": lambda a: run_i4(a, w4, s, M, bn, bk)}
               if w4 is not None else {}),
            "bitcast": lambda a: run_bitcast(a, wp_b, s, M, bn, bk),
            "andmask": lambda a: run_andmask(a, wp_m, s, M, bn, bk),
            "andmask_bf16s": lambda a: run_andmask_bf16s(
                a, wp_m, s.astype(jnp.bfloat16), M, bn, bk),
            "stream": lambda a: run_stream(a, wp, s, M, bn, bk),
            "intdot": lambda a: run_intdot(a, wp_m, s, M, bn, bk),
            "w4a8": lambda a: run_w4a8(a, wp_m, s, M, bn, bk),
            "w4a8_n2048": lambda a: run_w4a8(a, wp_m, s, M, 2048, 512),
            "w4a8_n1024": lambda a: run_w4a8(a, wp_m, s, M, 1024, 512),
            "noscale(timing)": lambda a: run_timing_variant(
                _noscale_kernel, a, wp_m, s.astype(jnp.bfloat16), M, bn, bk),
            "halfq8(timing)": lambda a: run_timing_variant(
                _halfq8_kernel, a, wp_m, s.astype(jnp.bfloat16), M, bn, bk),
        }
        for bn2, bk2 in [(N, 256), (N // 2, 256), (N, 512), (N // 4, 256)]:
            if bn2 > N or K % bk2 or N % bn2:
                continue
            variants[f"andmask_bn{bn2}_bk{bk2}"] = (
                lambda a, b1=bn2, b2=bk2: run_andmask(a, wp_m, s, M, b1, b2))
        for name, fn in variants.items():
            if only and not any(v in name for v in only.split(",")):
                continue
            try:
                y = np.asarray(fn(x))
                cos = float(np.dot(y.ravel(), gold.ravel())
                            / (np.linalg.norm(y) * np.linalg.norm(gold) + 1e-30))
                t = device_time(fn, [x])
                eff = bytes_ / t / 1e9
                print(f"   {name:18s}: {t*1e6:8.1f} us  {eff:6.0f} GB/s "
                      f"{100*sol/t:5.1f}% SOL  cos={cos:.6f}", flush=True)
            except Exception as e:
                print(f"   {name:18s}: FAIL {type(e).__name__} "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
