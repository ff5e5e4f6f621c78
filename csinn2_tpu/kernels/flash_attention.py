"""Blockwise (flash) scaled-dot-product attention Pallas kernel.

TPU-native analog of the reference's fused single-pass per-head attention
kernel q0k1_softmax_v1 (ref:
source/thead_rvv/fp16/scaled_dot_product_attention.c:25-76 — QK^T → causal
mask → softmax → V per head, OpenMP over batch×heads).  On TPU the per-head
loop becomes the Pallas grid, the single-pass softmax becomes the
online-softmax recurrence over K/V blocks (so sk never materializes in VMEM),
and OpenMP work-sharing becomes MXU tiling.

Supports:
  * causal masking with *dynamic, per-batch-row* query offset and kv length
    (continuous batching: each lane of a decode batch sits at its own
    position in the static KV cache — one compiled kernel serves every
    combination of positions; the retrace-free analog of the reference's
    per-token dynamic-shape re-inference, ref: llm_session_dynamic_infer_shape,
    source/llm/llm.c:3-141)
  * grouped-query attention (hq a multiple of hk) via head index mapping
  * optional per-tensor KV dequant scale (int8-quantized KV cache,
    BASELINE configs 4/5)

Numerics: both dots run with bf16 operands on the MXU (the bf16 rate is ~3×
the f32 rate on v5e) with f32 accumulation; softmax state (m, l) and the
output accumulator stay f32.  int8 KV carriers are exact in bf16 (8-bit
mantissa) and their dequant scale is folded into the f32 scalar scale of the
QK product and the f32 epilogue of the PV product, so quantized-KV attention
loses no precision to the bf16 carriers.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                 scale: float, causal: bool, blk_k: int, n_kb: int,
                 kv_scale: Optional[float], hq: int):
    """Grid: (batch*heads, n_q_blocks, n_k_blocks); K innermost.
    lens_ref (SMEM): [b, 2] rows of (q_offset, kv_len)."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bi = pl.program_id(0) // hq
    q_offset = lens_ref[bi, 0]
    kv_len = lens_ref[bi, 1]

    # bf16 MXU dots, f32 accumulation; the KV dequant scale commutes with both
    # contractions so it is applied in f32 (QK: folded into `scale`; PV: in the
    # final epilogue), keeping int8 carriers exact in bf16.
    q = q_ref[0].astype(jnp.bfloat16)          # [blk_q, d]
    k = k_ref[0].astype(jnp.bfloat16)          # [blk_k, d]
    v = v_ref[0].astype(jnp.bfloat16)          # [blk_k, d]
    qk_scale = scale * (kv_scale if kv_scale is not None else 1.0)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * qk_scale

    qb = pl.program_id(1)
    blk_q = q.shape[0]
    qpos = qb * blk_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_offset
    kpos = kb * blk_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = kpos < kv_len
    if causal:
        mask = mask & (kpos <= qpos)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ref[:]                          # [blk_q, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                     # [blk_q, blk_k]
    p = jnp.where(mask, p, 0.0)                # kill exp(NEG_INF - NEG_INF) = 1
    alpha = jnp.exp(m_prev - m_new)            # [blk_q, 1]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(kb == n_kb - 1)
    def _():
        denom = jnp.where(l_ref[:] == 0.0, 1.0, l_ref[:])
        acc = acc_ref[:] / denom
        if kv_scale is not None:
            acc = acc * kv_scale
        o_ref[0] = acc.astype(o_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


def _decode_attn_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *,
                        scale: float, kv_scale: Optional[float], group: int,
                        S: int):
    """Single-pass decode attention (sq == 1): the whole KV window of a head
    block sits in VMEM, so softmax is exact two-reduction math — no online
    recurrence, no K-block grid axis.  Replaces 32 tiny grid steps per layer
    (one per head, each DMAing a 32 KB block: latency-bound, measured
    18.5 µs/layer fixed cost at 7B decode) with ceil(hk/hk_blk) steps of
    megabyte-sized DMAs.  Grid: (batch, head_blocks)."""
    bi = pl.program_id(0)
    kv_len = lens_ref[bi, 1]
    hq_blk = q_ref.shape[1]
    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    mask = kpos < kv_len
    ks = scale * (kv_scale if kv_scale is not None else 1.0)
    for h in range(hq_blk):                      # unrolled; hq_blk is small
        q = q_ref[0, h][None].astype(jnp.bfloat16)            # [1, dp]
        k = k_ref[0, h // group].astype(jnp.bfloat16)         # [S, dp]
        v = v_ref[0, h // group].astype(jnp.bfloat16)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * ks
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s)
        p = jnp.where(mask, jnp.exp(s - m), 0.0)              # [1, S]
        l = jnp.sum(p)
        acc = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if kv_scale is not None:
            acc = acc * kv_scale
        # kv_len == 0 (inactive continuous-batching slot) makes l == 0;
        # clamp so that lane outputs 0 instead of NaN
        o_ref[0, h] = (acc[0] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "kv_scale", "hk_blk",
                                             "interpret"))
def decode_attention(q, k, v, *, q_offset, kv_len=None,
                     scale: Optional[float] = None,
                     kv_scale: Optional[float] = None, hk_blk: int = 8,
                     interpret: bool = False):
    """Decode-specialized attention: q [b, hq, 1, d]; k/v [b, hk, S, d]
    (int8 carriers or floats) → [b, hq, 1, d].  q_offset/kv_len as in
    flash_attention ([b] or scalar).  Falls back to flash_attention for
    sq > 1 shapes (callers guard)."""
    b, hq, sq, d = q.shape
    _, hk, sk, _ = k.shape
    assert sq == 1 and hq % hk == 0
    group = hq // hk
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if kv_len is None:
        kv_len = jnp.asarray(q_offset, jnp.int32) + 1
    dp = _round_up(d, 128)
    Sp = _round_up(sk, 128)
    hk_blk = min(hk_blk, hk)
    while hk % hk_blk:
        hk_blk -= 1
    hq_blk = hk_blk * group

    q3 = jnp.pad(q.reshape(b, hq, d), ((0, 0), (0, 0), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - sk), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - sk), (0, dp - d)))
    off = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32).reshape(-1), (b,))
    kvl = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32).reshape(-1), (b,))
    lens = jnp.stack([off, jnp.minimum(kvl, sk)], axis=1)     # [b, 2]

    kernel = functools.partial(_decode_attn_kernel, scale=scale,
                               kv_scale=kv_scale, group=group, S=Sp)
    out = pl.pallas_call(
        kernel,
        grid=(b, hk // hk_blk),
        in_specs=[
            pl.BlockSpec((b, 2), lambda bi, hb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hq_blk, dp), lambda bi, hb: (bi, hb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hk_blk, Sp, dp), lambda bi, hb: (bi, hb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hk_blk, Sp, dp), lambda bi, hb: (bi, hb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hq_blk, dp), lambda bi, hb: (bi, hb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * hq * Sp * dp),
            bytes_accessed=int(kp.size + vp.size + q3.size * 2),
            transcendentals=int(b * hq * Sp),
        ),
        interpret=interpret,
    )(lens, q3, kp, vp)
    return out[:, :, None, :d]


def _prefill_attn_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *,
                         scale: float, causal: bool,
                         kv_scale: Optional[float], hq: int, hk: int,
                         Sp: int, dp: int, blk_q: int):
    """Whole-KV, head-batched prefill attention: grid (b, n_qb) — ONE step
    per (batch, q-block) instead of one per (batch*head, q-block, k-block).
    The 32-head flash grid at 7B s=128 cost 24.7 us/layer against a ~5 us
    DMA floor (examples/ttft_profile.py): 32 tiny grid steps are latency-
    bound.  Here all heads' KV sits in VMEM ([hk*Sp, dp] int8 ~1 MB at
    S=256), the head loop runs in-kernel over cheap lane/sublane slices,
    and the single K block admits EXACT two-pass softmax (no online
    recurrence).  q/o ride the bshd activation layout (heads on lanes)."""
    bi = pl.program_id(0)
    q_offset = lens_ref[bi, 0]
    kv_len = lens_ref[bi, 1]
    qb = pl.program_id(1)
    group = hq // hk

    qpos = (qb * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, Sp), 0)
            + q_offset)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (blk_q, Sp), 1)
    mask = kpos < kv_len
    if causal:
        mask = mask & (kpos <= qpos)
    qk_scale = scale * (kv_scale if kv_scale is not None else 1.0)

    for h in range(hq):
        q = q_ref[0, :, h * dp:(h + 1) * dp].astype(jnp.bfloat16)
        hkid = h // group
        k = k_ref[0, hkid * Sp:(hkid + 1) * Sp, :].astype(jnp.bfloat16)
        v = v_ref[0, hkid * Sp:(hkid + 1) * Sp, :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * qk_scale
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.where(mask, jnp.exp(s - m), 0.0)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jnp.dot(p.astype(jnp.bfloat16), v,
                      preferred_element_type=jnp.float32)
        acc = acc / jnp.where(l == 0.0, 1.0, l)
        if kv_scale is not None:
            acc = acc * kv_scale
        o_ref[0, :, h * dp:(h + 1) * dp] = acc.astype(o_ref.dtype)


def prefill_attention(q, k, v, *, causal: bool = True, q_offset=0,
                      kv_len=None, scale: Optional[float] = None,
                      kv_scale: Optional[float] = None,
                      interpret: bool = False):
    """Short-context prefill attention: q [b, sq, hq, d] (bshd), k/v
    [b, hk, sk, d] → [b, sq, hq, d].  Whole KV resident per grid step;
    caller guards sk (VMEM: hk*sk*d*2 carriers ~<= 8 MB)."""
    b, sq, hq, d = q.shape
    _, hk, sk, _ = k.shape
    assert hq % hk == 0
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if kv_len is None:
        kv_len = sk
    blk_q = min(512, _round_up(sq, 8))
    sqp = _round_up(sq, blk_q)
    Sp = _round_up(sk, 128)
    dp = _round_up(d, 128)

    q3 = jnp.pad(q, ((0, 0), (0, sqp - sq), (0, 0), (0, dp - d))) \
        .reshape(b, sqp, hq * dp)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - sk), (0, dp - d))) \
        .reshape(b, hk * Sp, dp)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - sk), (0, dp - d))) \
        .reshape(b, hk * Sp, dp)
    off = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32).reshape(-1), (b,))
    kvl = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32).reshape(-1), (b,))
    lens = jnp.stack([off, jnp.minimum(kvl, sk)], axis=1)

    kernel = functools.partial(_prefill_attn_kernel, scale=scale,
                               causal=causal, kv_scale=kv_scale, hq=hq,
                               hk=hk, Sp=Sp, dp=dp, blk_q=blk_q)
    out = pl.pallas_call(
        kernel,
        grid=(b, sqp // blk_q),
        in_specs=[
            pl.BlockSpec((b, 2), lambda bi, qb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk_q, hq * dp), lambda bi, qb: (bi, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hk * Sp, dp), lambda bi, qb: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hk * Sp, dp), lambda bi, qb: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, hq * dp), lambda bi, qb: (bi, qb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sqp, hq * dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * hq * sqp * Sp * dp),
            bytes_accessed=int(q3.size * 2 + kp.size + vp.size),
            transcendentals=int(b * hq * sqp * Sp),
        ),
        interpret=interpret,
    )(lens, q3, kp, vp)
    return out.reshape(b, sqp, hq, dp)[:, :sq, :, :d]


@functools.partial(jax.jit, static_argnames=("causal", "scale", "blk_q",
                                             "blk_k", "interpret", "kv_scale",
                                             "qo_layout"))
def flash_attention(q, k, v, *, causal: bool = True, q_offset=0, kv_len=None,
                    scale: Optional[float] = None, blk_q: int = 256,
                    blk_k: int = 512, kv_scale: Optional[float] = None,
                    interpret: bool = False, qo_layout: str = "bhsd"):
    """q: [b, hq, sq, d]; k/v: [b, hk, sk, d] (hq % hk == 0) → [b, hq, sq, d].

    q_offset (dynamic ok): positions in the KV prefix ahead of q (decode);
                           scalar, or [b] for per-row positions (continuous
                           batching: lanes decode at different depths).
    kv_len (dynamic ok): valid KV entries (static cache may be longer);
                         scalar or [b]; defaults to sk.
    kv_scale: per-tensor dequant scale when k/v are int8 carriers.
    qo_layout="bshd": q is [b, sq, hq, d] and the output is returned in the
        same activation layout — heads are flattened into the LANE axis
        ([b, sqp, hq*dp], free reshape) and each grid step's BlockSpec picks
        lane-block h%hq, so the head permute rides the DMA and the caller
        never materializes transposed q/out (those two [b,s,h,d] transposes
        measured 6.4 us x2 per 7B prefill layer, examples/ttft_profile.py).
    """
    bshd = qo_layout == "bshd"
    if bshd:
        b, sq, hq, d = q.shape
    else:
        b, hq, sq, d = q.shape
    _, hk, sk, _ = k.shape
    assert hq % hk == 0
    group = hq // hk
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if kv_len is None:
        kv_len = sk

    blk_q = min(blk_q, _round_up(sq, 8))
    blk_k = min(blk_k, _round_up(sk, 128))
    sqp, skp = _round_up(sq, blk_q), _round_up(sk, blk_k)
    dp = _round_up(d, 128)

    if bshd:
        q3 = jnp.pad(q, ((0, 0), (0, sqp - sq), (0, 0), (0, dp - d))) \
            .reshape(b, sqp, hq * dp)
    else:
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, sqp - sq), (0, dp - d)))
        q3 = qp.reshape(b * hq, sqp, dp)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, skp - sk), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skp - sk), (0, dp - d)))

    bh = b * hq
    k3 = kp.reshape(b * hk, skp, dp)
    v3 = vp.reshape(b * hk, skp, dp)
    off = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32).reshape(-1), (b,))
    kvl = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32).reshape(-1), (b,))
    lens = jnp.stack([off, jnp.minimum(kvl, sk)], axis=1)      # [b, 2]

    n_qb = sqp // blk_q
    n_kb = skp // blk_k
    grid = (bh, n_qb, n_kb)

    kernel = functools.partial(
        _attn_kernel, scale=scale, causal=causal, blk_k=blk_k, n_kb=n_kb,
        kv_scale=kv_scale, hq=hq)

    if bshd:
        q_spec = pl.BlockSpec((1, blk_q, dp),
                              lambda h, qb, kb, _h=hq: (h // _h, qb, h % _h),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((1, blk_q, dp),
                              lambda h, qb, kb, _h=hq: (h // _h, qb, h % _h),
                              memory_space=pltpu.VMEM)
        o_shape = jax.ShapeDtypeStruct((b, sqp, hq * dp), q.dtype)
    else:
        q_spec = pl.BlockSpec((1, blk_q, dp), lambda h, qb, kb: (h, qb, 0),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((1, blk_q, dp), lambda h, qb, kb: (h, qb, 0),
                              memory_space=pltpu.VMEM)
        o_shape = jax.ShapeDtypeStruct((bh, sqp, dp), q.dtype)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, 2), lambda h, qb, kb: (0, 0),
                         memory_space=pltpu.SMEM),
            q_spec,
            pl.BlockSpec((1, blk_k, dp), lambda h, qb, kb, _g=group: (h // _g, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, dp), lambda h, qb, kb, _g=group: (h // _g, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=o_spec,
        out_shape=o_shape,
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),    # running max m
            pltpu.VMEM((blk_q, 1), jnp.float32),    # running sum l
            pltpu.VMEM((blk_q, dp), jnp.float32),   # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * bh * sqp * skp * dp),
            bytes_accessed=int(q3.size * 4 + k3.size * 4 * group + v3.size * 4 * group),
            transcendentals=int(bh * sqp * skp),
        ),
        interpret=interpret,
    )(lens, q3, k3, v3)

    if bshd:
        return out.reshape(b, sqp, hq, dp)[:, :sq, :, :d]
    return out.reshape(b, hq, sqp, dp)[:, :, :sq, :d]
