"""Fused dequant-GEMM Pallas kernel: y = dequant(x_q) @ dequant(w_q) [+ bias]
with the requantize/cast epilogue in-register.

TPU-native analog of the reference's integer GEMM cores
(ref: shl_rvv_ncxhwx_gemm_4xpack2n_int8 + requantize_m4_s epilogue,
source/thead_rvv/int8/gemm_int8_packn.c:26-120; block-quant LLM matmul
shl_c920_matmul_a0b1_fp16_block_quant, source/c920_opt/fp16/matmul_fp16.c:304).

Key TPU facts this design exploits:
  * int8 values are exactly representable in bfloat16 (8-bit mantissa), so an
    int8×int8 product on the bf16 MXU with f32 accumulation is bit-exact —
    the MXU *is* the "vdot" unit, no separate integer pipe needed.
  * weight-only quant (int8/int4/Q8_0/Q4_0) is HBM-bandwidth-bound at decode;
    the kernel reads the narrow carriers from HBM and dequantizes in VMEM,
    so bytes-from-HBM ≈ bits/weight — the entire point of weight quant.
  * per-output-channel scales commute with the K-contraction → applied once in
    the epilogue; per-K-block scales (Q8_0/Q4_0, 32-elem blocks) do not → the
    scale is expanded across its 32-row block while dequantizing the W tile.

Scale modes:
  "none"    — w already float
  "channel" — scales[N] (per-out-channel symmetric, epilogue multiply)
  "block"   — scales[K/32, N] (llama.cpp Q8_0/Q4_0; in-loop dequant)

Zero-point handling for asymmetric activations is folded AOT:
(x - zpx) @ W = x @ W - zpx·colsum(W) — the second term goes into the bias at
prepack (ref: the fuse_zp_to_bias option in tests/validation_layer/testutil.h).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 32  # quant block size along K (llama.cpp-compatible)


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


# -- int4 nibble packing ------------------------------------------------------
# llama.cpp Q4_0 byte layout (ref: block_dequantize_q4, source/nn2/utils.c:2079
# — low nibble = element j, high nibble = element j+16 of the 32-block): byte
# row b*16+j of the packed [K/2, N] array holds K-rows b*32+j (lo) and
# b*32+16+j (hi).  Unpacking is two shifts + a contiguous per-block concat —
# no sublane interleave — so it runs on the VPU at full rate while HBM reads
# half the bytes.

def pack_int4(q):
    """[K, N] int8 values in [-8, 7] → [K/2, N] packed bytes (jnp or np)."""
    K = q.shape[0]
    assert K % BLOCK == 0, K
    q3 = jnp.asarray(q, jnp.int8).reshape(K // BLOCK, BLOCK, -1)
    lo = q3[:, :16, :].astype(jnp.int32) & 0xF
    hi = q3[:, 16:, :].astype(jnp.int32) & 0xF
    return (lo | (hi << 4)).astype(jnp.int8).reshape(K // 2, -1)


def unpack_int4(packed, K):
    """[K/2, N] packed bytes → [K, N] int8 values in [-8, 7]."""
    p = jnp.asarray(packed, jnp.int8).astype(jnp.int32) & 0xFF
    g = K // BLOCK
    p3 = p.reshape(g, 16, -1)
    lo = (p3 << 28) >> 28            # sign-extended low nibble
    hi = (p3 << 24) >> 28            # sign-extended high nibble
    return jnp.concatenate([lo, hi], axis=1).reshape(K, -1).astype(jnp.int8)


def _kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, *, scale_mode: str,
            n_k: int, out_dtype, epilogue_scale: Optional[float],
            packed_int4: bool = False, bk: int = 0, bn: int = 0):
    """One (BM, BN) output tile; grid = (M/BM, N/BN, K/BK), K innermost."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)

    def load_w():
        if not packed_int4:
            return w_ref[:].astype(jnp.bfloat16)
        # [BK/2, BN] packed bytes → [BK, BN] (llama.cpp nibble layout: per
        # 32-block, byte j = rows j (lo) | j+16 (hi) — contiguous concat)
        p = w_ref[:].astype(jnp.int32)
        p3 = p.reshape(bk // BLOCK, 16, bn)
        lo = (p3 << 28) >> 28
        hi = ((p3 & 0xFF) << 24) >> 28
        return jnp.concatenate([lo, hi], axis=1).reshape(bk, bn) \
                  .astype(jnp.bfloat16)

    if scale_mode == "block":
        # scales tile [BK//32, BN] f32
        w = load_w()
        s = s_ref[:].astype(jnp.bfloat16)
        # element-repeat each scale row across its 32-row block
        # (NB: pltpu.repeat tiles the whole array — wrong semantics here)
        s_full = jnp.repeat(s, BLOCK, axis=0)          # [BK, BN]
        w = w * s_full
    else:
        w = load_w()
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        acc = acc_ref[:]
        if scale_mode == "channel":
            acc = acc * s_ref[:].astype(jnp.float32)   # [1, BN] broadcast
        if epilogue_scale is not None:
            acc = acc * epilogue_scale
        out_ref[:] = acc.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale_mode", "out_dtype", "epilogue_scale", "bm", "bn",
                     "bk", "interpret", "packed_int4"),
)
def quant_matmul(x, w_q, scales=None, bias=None, *, scale_mode: str = "channel",
                 out_dtype=jnp.float32, epilogue_scale: Optional[float] = None,
                 bm: Optional[int] = None, bn: Optional[int] = None,
                 bk: Optional[int] = None,
                 interpret: bool = False, packed_int4: bool = False):
    """y[M,N] = (x[M,K] · dequant(w_q[K,N])) * epilogue_scale + bias.

    x: float (bf16/f32) or int8 carrier (converted exactly to bf16).
    w_q: [K, N] int8 carrier (int4 values occupy [-8,7]), or with
         packed_int4=True a [K/2, N] nibble-packed array (see pack_int4) —
         halves the HBM bytes per weight, the whole point of int4.
    scales: "channel" → [N]; "block" → [K//32, N] (f16/f32).
    epilogue_scale: scalar folded activation/output scale
                    (s_x / s_out or s_x·s_w — per requantize_float).
    bias: [N] f32 added after scaling (zp-corrections prefolded by caller).
    """
    M, K = x.shape
    if packed_int4:
        K2, N = 2 * w_q.shape[0], w_q.shape[1]
    else:
        K2, N = w_q.shape
    assert K == K2, (x.shape, w_q.shape, packed_int4)

    if bm is None or bn is None or bk is None:
        if M <= 16:
            # decode shapes are weight-read-bound: deep K tiles keep the DMA
            # engine streaming (measured on v5e at [1,4096]×[4096,11008]
            # q8_0: bk=2048/bn=256 is 3.3× bk=512, near HBM speed-of-light)
            bm = bm or 8
            bn = bn or 256
            bk = bk or 2048
        else:
            bm = bm or 256
            bn = bn or 256
            bk = bk or 512

    bm = min(bm, _round_up(M, 8))
    bn = min(bn, _round_up(N, 128))
    bk = min(bk, _round_up(K, 128))
    if packed_int4:
        assert K % BLOCK == 0 and bk % BLOCK == 0, (K, bk)
    Mp, Kp, Np = _round_up(M, bm), _round_up(K, bk), _round_up(N, bn)

    x = jnp.pad(x, ((0, Mp - M), (0, Kp - K))) if (Mp != M or Kp != K) else x
    if packed_int4:
        if Kp != K or Np != N:
            w_q = jnp.pad(w_q, ((0, (Kp - K) // 2), (0, Np - N)))
        w_spec = pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j),
                              memory_space=pltpu.VMEM)
    else:
        w_q = jnp.pad(w_q, ((0, Kp - K), (0, Np - N))) \
            if (Kp != K or Np != N) else w_q
        w_spec = pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                              memory_space=pltpu.VMEM)

    n_k = Kp // bk
    grid = (Mp // bm, Np // bn, n_k)

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
        w_spec,
    ]
    args = [x, w_q]
    if scale_mode == "channel":
        s = jnp.asarray(scales, jnp.float32).reshape(1, -1)
        s = jnp.pad(s, ((0, 0), (0, Np - N))) if Np != N else s
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(s)
    elif scale_mode == "block":
        s = jnp.asarray(scales, jnp.float32)
        assert s.shape == (K // BLOCK, N), (s.shape, (K // BLOCK, N))
        s = jnp.pad(s, ((0, Kp // BLOCK - s.shape[0]), (0, Np - N))) \
            if (Kp != K or Np != N) else s
        in_specs.append(pl.BlockSpec((bk // BLOCK, bn), lambda i, j, k: (k, j),
                                     memory_space=pltpu.VMEM))
        args.append(s)
    else:
        assert scale_mode == "none"
        in_specs.append(pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, 1), jnp.float32))

    flops = 2 * Mp * Np * Kp
    bytes_accessed = (x.size * x.dtype.itemsize + w_q.size * w_q.dtype.itemsize
                      + Mp * Np * jnp.dtype(out_dtype).itemsize)

    out = pl.pallas_call(
        functools.partial(_kernel, scale_mode=scale_mode, n_k=n_k,
                          out_dtype=out_dtype, epilogue_scale=epilogue_scale,
                          packed_int4=packed_int4, bk=bk, bn=bn),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(flops=int(flops), bytes_accessed=int(bytes_accessed),
                                      transcendentals=0),
        interpret=interpret,
    )(*args)

    out = out[:M, :N]
    if bias is not None:
        out = out + jnp.asarray(bias, out.dtype)
    return out


def quant_matmul_ref(x, w_q, scales=None, bias=None, *, scale_mode="channel",
                     out_dtype=jnp.float32, epilogue_scale=None,
                     packed_int4: bool = False):
    """Plain-XLA reference of the same contraction (for tests and CPU)."""
    x = jnp.asarray(x, jnp.float32)
    if packed_int4:
        w_q = unpack_int4(w_q, x.shape[-1])
    w = jnp.asarray(w_q, jnp.float32)
    if scale_mode == "block":
        s = jnp.asarray(scales, jnp.float32)
        w = (w.reshape(-1, BLOCK, w.shape[1]) * s[:, None, :]).reshape(w.shape)
        acc = x @ w
    elif scale_mode == "channel":
        acc = (x @ w) * jnp.asarray(scales, jnp.float32)
    else:
        acc = x @ w
    if epilogue_scale is not None:
        acc = acc * epilogue_scale
    if bias is not None:
        acc = acc + jnp.asarray(bias, jnp.float32)
    return acc.astype(out_dtype)
