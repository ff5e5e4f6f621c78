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


def _pick_tile(dim, target):
    """Largest multiple-of-128 divisor of `dim` that is <= target (dim is
    already 128-rounded, so 128 itself always qualifies).  A tile that does
    NOT divide the dim forces a jnp.pad of the whole weight INSIDE the jit —
    a full HBM copy per call (measured: the 7B w13 GEMM, N=22016, ran 2x
    slower than wqkv, N=12288, at the same tile config purely from the pad;
    examples/prefill_tile_tune.py)."""
    best = 128
    d = 128
    while d <= target:
        if dim % d == 0:
            best = d
        d += 128
    return best


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


def pack_int4_t(qt):
    """[N, K] int8 values in [-8, 7] → [N, K/2] packed bytes (transposed/
    rearranged weight layout; same per-32-block nibble grouping along K)."""
    N, K = qt.shape
    assert K % BLOCK == 0, K
    q3 = jnp.asarray(qt, jnp.int8).reshape(N, K // BLOCK, BLOCK)
    lo = q3[:, :, :16].astype(jnp.int32) & 0xF
    hi = q3[:, :, 16:].astype(jnp.int32) & 0xF
    return (lo | (hi << 4)).astype(jnp.int8).reshape(N, K // 2)


def unpack_int4(packed, K):
    """[K/2, N] packed bytes → [K, N] int8 values in [-8, 7]."""
    p = jnp.asarray(packed, jnp.int8).astype(jnp.int32) & 0xFF
    g = K // BLOCK
    p3 = p.reshape(g, 16, -1)
    lo = (p3 << 28) >> 28            # sign-extended low nibble
    hi = (p3 << 24) >> 28            # sign-extended high nibble
    return jnp.concatenate([lo, hi], axis=1).reshape(K, -1).astype(jnp.int8)


def unpack_int4_t(packed, K):
    """[N, K/2] packed bytes → [N, K] int8 values in [-8, 7]."""
    p = jnp.asarray(packed, jnp.int8).astype(jnp.int32) & 0xFF
    N = p.shape[0]
    p3 = p.reshape(N, K // BLOCK, 16)
    lo = (p3 << 28) >> 28
    hi = (p3 << 24) >> 28
    return jnp.concatenate([lo, hi], axis=2).reshape(N, K).astype(jnp.int8)


def _kernel(x_ref, w_ref, s_ref, b_ref, out_ref, acc_ref, *, scale_mode: str,
            n_k: int, out_dtype, epilogue_scale: Optional[float],
            packed_int4: bool = False, bk: int = 0, bn: int = 0,
            w_transposed: bool = False, int_dot: bool = False,
            has_bias: bool = False, out_zp: float = 0.0,
            qclip=None, deq: str = "repeat", split_x: bool = False,
            swiglu: bool = False, int_requant: bool = False):
    """One (BM, BN) output tile; grid = (M/BM, N/BN, K/BK), K innermost.

    w_transposed: the weight is prepacked [N, K] ("rearranged" layout, the
    analog of the reference's activation×rearranged-weight GEMMs,
    ref: gemm_a0nb1r, source/c920_opt/fp16/gemm_fp16_a0nb1.c) — at decode the
    kernel is HBM-bound on the weight stream, and an [N, K] tile reads bk
    CONTIGUOUS bytes per row instead of bn-byte strided bursts, which is the
    difference between partial and full DRAM burst efficiency.

    int_dot: s8×s8→s32 on the MXU integer pipe with an int32 accumulator —
    for quantized activations (prefill/FC), ~2× the bf16-carrier rate
    (ref: the reference's int8 GEMM cores,
    source/thead_rvv/int8/gemm_int8_packn.c:44).  Requires per-channel or
    no scales (per-K-block scales don't commute with the contraction).

    qclip=(qmin, qmax) + out_zp: fused integer requantize epilogue
    round→+zp→clip→cast entirely in-register before the single int8 store
    (ref: requantize_m4_s — vmulh/vssra/+zp/vnclip fused into the GEMM,
    source/thead_rvv/int8/gemm_int8_packn.c:26-41); a fully-quantized graph
    then never writes f32 intermediates to HBM between layers."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def _expand_scales(width, per):
        """s_full[n,c] = Σ_g s[n,g]·(c//per==g): one-hot MXU matmul — the
        lane-axis repeat is not lowerable on TPU (minor-dim reshape), and
        this kernel is HBM-bound so the extra MACs are free."""
        gid = jax.lax.broadcasted_iota(jnp.int32, (bk // BLOCK, width), 0)
        kid = jax.lax.broadcasted_iota(jnp.int32, (bk // BLOCK, width), 1)
        expand = (kid // per == gid).astype(jnp.float32)
        return jnp.dot(s_ref[:], expand, preferred_element_type=jnp.float32)

    def load_w(target):
        if not packed_int4:
            return w_ref[:].astype(target)
        assert not w_transposed  # transposed+packed handled by the split dot
        # [BK/2, BN] packed bytes → [BK, BN] (llama.cpp nibble layout: per
        # 32-block, byte j = rows j (lo) | j+16 (hi) — contiguous concat)
        p3 = w_ref[:].astype(jnp.int32).reshape(bk // BLOCK, 16, bn)
        lo = (p3 << 28) >> 28
        hi = ((p3 & 0xFF) << 24) >> 28
        return jnp.concatenate([lo, hi], axis=1).reshape(bk, bn) \
                  .astype(target)

    if w_transposed and packed_int4:
        # [BN, BK/2] packed bytes: byte g·16+j holds k=g·32+j (lo nibble) and
        # k=g·32+16+j (hi).  Unpacking to [BN, BK] needs a lane-merge reshape
        # Mosaic can't lower — instead split the contraction into the nibble
        # halves: y += x_lo·(s·w_lo)ᵀ + x_hi·(s·w_hi)ᵀ, with x pre-split
        # OUTSIDE the kernel (x_lo[m,g·16+j]=x[m,g·32+j]; see quant_matmul).
        xhi_ref = b_ref                                # arg order: see wrapper
        p = w_ref[:].astype(jnp.int32)                 # [bn, bk/2]
        lo = ((p << 28) >> 28).astype(jnp.bfloat16)
        hi = (((p & 0xFF) << 24) >> 28).astype(jnp.bfloat16)
        if scale_mode == "block":
            s_half = _expand_scales(bk // 2, 16).astype(jnp.bfloat16)
            lo = lo * s_half
            hi = hi * s_half
        xlo = x_ref[:].astype(jnp.bfloat16)            # [bm, bk/2]
        xhi = xhi_ref[:].astype(jnp.bfloat16)
        dot_t = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        acc_ref[:] += dot_t(xlo, lo) + dot_t(xhi, hi)
    elif packed_int4 and split_x:
        # Standard [K/2, N] packed layout, bias-free: split the contraction
        # into nibble planes instead of unpack+CONCAT (the concat is a
        # sublane data-movement pass over the whole weight tile — at q4_0
        # decode the kernel is VPU-bound on it, measured 83 tok/s = only
        # 45% of the int4 weight-read SOL while q8_0 reaches 74% of its).
        # hi = byte >> 4 is sign-correct in one op (top nibble is two's
        # complement); lo = (byte << 28) >> 28.  x comes pre-split
        # (x_lo rides the x slot, x_hi the bias slot — see quant_matmul).
        xhi_ref = b_ref
        p = w_ref[:].astype(jnp.int32)                 # [bk/2, bn]
        lo = ((p << 28) >> 28).astype(jnp.bfloat16)
        hi = (p >> 4).astype(jnp.bfloat16)
        if scale_mode == "block":
            s = s_ref[:].astype(jnp.bfloat16)          # [bk/32, bn]
            s_half = jnp.repeat(s, 16, axis=0)         # [bk/2, bn]
            lo = lo * s_half
            hi = hi * s_half
        xlo = x_ref[:].astype(jnp.bfloat16)            # [bm, bk/2]
        xhi = xhi_ref[:].astype(jnp.bfloat16)
        acc_ref[:] += (jnp.dot(xlo, lo, preferred_element_type=jnp.float32)
                       + jnp.dot(xhi, hi, preferred_element_type=jnp.float32))
    else:
        if int_dot:
            x = x_ref[:]                               # int8
            w = load_w(jnp.int8)
            acc_t = jnp.int32
        else:
            x = x_ref[:].astype(jnp.bfloat16)
            if scale_mode == "block":
                w = load_w(jnp.bfloat16)
                if w_transposed:
                    w = w * _expand_scales(bk, BLOCK).astype(jnp.bfloat16)
                elif deq == "bcast":
                    # broadcast each scale across its 32-row block via a
                    # major-dims reshape: [BK,BN]→[BK/32,32,BN] * s[:,None,:]
                    s = s_ref[:].astype(jnp.bfloat16)
                    w3 = w.reshape(bk // BLOCK, BLOCK, bn)
                    w = (w3 * s[:, None, :]).reshape(bk, bn)
                else:
                    # element-repeat each scale across its 32-row block —
                    # sublane-axis repeat lowers fine (NB: pltpu.repeat tiles
                    # the whole array — wrong semantics here).  Measured
                    # FASTER than the reshape-broadcast variant on v5e
                    # (examples/prefill_gemm_sweep.py)
                    s = s_ref[:].astype(jnp.bfloat16)
                    w = w * jnp.repeat(s, BLOCK, axis=0)   # s [BK//32, BN]
            else:
                w = load_w(jnp.bfloat16)
            acc_t = jnp.float32
        if w_transposed:
            acc_ref[:] += jax.lax.dot_general(
                x, w, (((1,), (1,)), ((), ())), preferred_element_type=acc_t)
        else:
            acc_ref[:] += jnp.dot(x, w, preferred_element_type=acc_t)

    @pl.when(k == n_k - 1)
    def _():
        if int_requant:
            # bit-exact fixed-point epilogue on the int32 accumulator
            # (ref: requantize_m4_s fused into the GEMM,
            # source/thead_rvv/int8/gemm_int8_packn.c:26-41).  mult/shift
            # ride the scales slot as an int32 [2, N] pair; int32 bias is
            # added BEFORE the requantize, as the reference does.
            from csinn2_tpu.kernels.requant import requant_int
            a = acc_ref[:]
            if has_bias:
                a = a + b_ref[:]
            y = requant_int(a, s_ref[0:1, :], s_ref[1:2, :], out_zp,
                            int(qclip[0]), int(qclip[1]))
            out_ref[:] = y.astype(out_dtype)
            return
        acc = acc_ref[:].astype(jnp.float32)
        if scale_mode == "channel":
            acc = acc * s_ref[:].astype(jnp.float32)   # [1, BN] broadcast
        if epilogue_scale is not None:
            acc = acc * epilogue_scale
        if has_bias:
            acc = acc + b_ref[:].astype(jnp.float32)
        if qclip is not None:
            acc = jnp.clip(jnp.round(acc) + out_zp, qclip[0], qclip[1])
        if swiglu:
            # 128-lane pair-interleaved fused w1|w3 (llm.model swiglu128):
            # even lane-groups hold h1, odd hold h3 — silu(h1)*h3 in-register
            bm_ = acc.shape[0]
            a = acc.reshape(bm_, bn // 256, 2, 128)
            h1 = a[:, :, 0, :]
            h3 = a[:, :, 1, :]
            acc = (h1 * jax.lax.logistic(h1) * h3).reshape(bm_, bn // 2)
        out_ref[:] = acc.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale_mode", "out_dtype", "epilogue_scale", "bm", "bn",
                     "bk", "interpret", "packed_int4", "w_transposed",
                     "out_zp", "deq", "swiglu"),
)
def quant_matmul(x, w_q, scales=None, bias=None, *, scale_mode: str = "channel",
                 out_dtype=jnp.float32, epilogue_scale: Optional[float] = None,
                 bm: Optional[int] = None, bn: Optional[int] = None,
                 bk: Optional[int] = None,
                 interpret: bool = False, packed_int4: bool = False,
                 w_transposed: bool = False, out_zp: float = 0.0,
                 deq: str = "repeat", swiglu: bool = False,
                 rq_mult=None, rq_shift=None):
    """y[M,N] = (x[M,K] · dequant(w_q)) * epilogue_scale + bias.

    x: float (bf16/f32) or int8 carrier (converted exactly to bf16).
    w_q: [K, N] int8 carrier (int4 values occupy [-8,7]), or with
         packed_int4=True a [K/2, N] nibble-packed array (see pack_int4) —
         halves the HBM bytes per weight, the whole point of int4.
         With w_transposed=True the carrier is prepacked [N, K] (packed:
         [N, K/2], see pack_int4_t) — the rearranged layout whose HBM reads
         are contiguous along the K stream (ref: the reference's rearranged-
         weight GEMMs, source/c920_opt/fp16/gemm_fp16_rearrange.c).
    scales: "channel" → [N]; "block" → [K//32, N] ([N, K//32] if transposed).
    epilogue_scale: scalar folded activation/output scale
                    (s_x / s_out or s_x·s_w — per requantize_float).
    bias: [N] f32, fused into the epilogue before any integer rounding
          (zp-corrections prefolded by caller).
    out_dtype=int8/uint8/int32 + out_zp: fused requantize epilogue —
          round(acc·scales)+zp, clipped to the dtype range, stored as the
          integer directly (no f32 intermediate in HBM).
    Integer MXU: when x is an int8 carrier and scales are per-channel/none,
          the dot runs s8×s8→s32 on the integer pipe (bit-exact, ~2× bf16).
    """
    M, K = x.shape
    native4 = w_q.dtype == jnp.dtype("int4")
    if w_transposed:
        N = w_q.shape[0]
        K2 = 2 * w_q.shape[1] if packed_int4 else w_q.shape[1]
    elif packed_int4:
        K2, N = 2 * w_q.shape[0], w_q.shape[1]
    else:
        K2, N = w_q.shape
    assert K == K2, (x.shape, w_q.shape, packed_int4, w_transposed)

    if native4 and (bm is None or bn is None or bk is None) and M <= 16 \
            and not w_transposed and not packed_int4:
        # int4-native decode tiles, measured on v5e at the 7B/13B decode
        # shapes (examples/int4_tile_tune.py / int4_dequant_probe.py):
        # Mosaic's hardware sub-byte unpack makes the S4 [K, N] carrier the
        # fastest dequant pipeline (77-88% of the int4 weight-read SOL vs
        # 51-58% for every manual nibble form — split-dot, AND-mask planes,
        # W4A8 block-diag int-MXU all bottleneck on per-value VPU work).
        # Winning tiles keep the bf16 compute plane (2*bk*bn B) at 4-6.5 MiB:
        #   small weights (<=~8.5 MiB packed): full-N, bk ~512
        #   else deep-K (bk 1024) with bn ~2-3k; if N's divisors are sparse
        #   (22016-style), wide-N shallow-K (bk 256) wins instead.
        # ONE M-tile for decode batches: with bm=8 a bs16 decode ran the
        # (i, j, k) grid at i=2 and the weight stream was fetched TWICE —
        # the whole decode step is weight-read-bound, so bs16 measured 35%
        # of its batched SOL (BENCH r5 first capture) purely from re-reads
        bm = bm or _round_up(M, 8)
        Nr, Kr = _round_up(N, 128), _round_up(K, 128)
        if Kr * Nr <= 17 * 2**20:
            bn = bn or Nr
            bk = bk or _pick_tile(
                Kr, max(256, (11 * 2**20) // (4 * Nr) // 128 * 128))
        else:
            bk = bk or _pick_tile(Kr, 1024)
            if bn is None:
                bn = _pick_tile(Nr, max(2048, (13 * 2**20) // (4 * bk)))
                if bn < 2048:
                    bk = _pick_tile(Kr, 256)
                    bn = _pick_tile(Nr, (13 * 2**20) // (4 * bk))
    if bm is None or bn is None or bk is None:
        if M <= 16:
            # decode shapes are weight-read-bound: WIDE-N tiles make every
            # DMA row a long contiguous burst of the row-major [K, N] weight
            # (measured on v5e at [1,4096]×[4096,11008] q8_0: bn=5504/bk=1024
            # hits 890 GiB/s effective — full HBM speed-of-light — vs
            # 483 GiB/s for the narrow bn=256/bk=2048 tiling); cap the tile
            # at ~6 MiB so the double-buffered pipeline fits VMEM
            bm = bm or _round_up(M, 8)   # one M-tile (see int4 branch note)
            # bk must DIVIDE the rounded K or the whole weight gets jnp.pad'ed
            # inside the jit (w2's K=11008 with bk=1024 -> Kp=11264 was a
            # 45 MB HBM copy per decode call); see _pick_tile.  bk target 512
            # beat 1024 at every 7B decode shape that admits it (wqkv 87.4%
            # vs 81.2% of the weight-read SOL, w13 88.7% vs 85.4%;
            # examples/decode_tile_tune.py)
            bk = bk or _pick_tile(_round_up(K, 128), 512)
            if bn is None:
                Nr, Kr = _round_up(N, 128), _round_up(K, 128)
                bn = Nr
                # VMEM cap uses the COMPUTE footprint, not storage: a packed
                # int4 tile unpacks to bf16 nibble planes in-kernel (2 B per
                # element — 4x the 0.5 B storage; the storage-based cap let
                # Mosaic's scoped vmem overflow at wqkv N=12288)
                wbytes = 2.0 if packed_int4 else 1.0
                while bn * bk * wbytes > 6 * 2**20 and (bn > 512 or bk > 128):
                    cand = _pick_tile(Nr, bn // 2) if bn > 512 else 128
                    if packed_int4 and bk > 256:
                        # int4 decode: the weight-byte stream is halved, so
                        # wide-N rows matter even more — shrink bk first
                        # (floor 256: the split-dot x block is bk/2 lanes,
                        # and Pallas needs >= 128)
                        bk = _pick_tile(Kr, bk // 2)
                    elif bn > 512 and (cand >= 512 or bk <= 128):
                        bn = cand                  # keep bn | Nr (no pad)
                    else:
                        # sparse divisor structure (e.g. Nr = 128·prime):
                        # halving bn would cliff to a narrow tile (~half HBM
                        # bandwidth measured, see comment above) — shrink bk
                        # instead and keep the row-burst-friendly wide bn
                        bk = _pick_tile(Kr, bk // 2)
        else:
            # prefill/FC shapes: WIDE-N divisor-aware tiles.  Measured on v5e
            # at the 7B prefill shapes (M=128, examples/prefill_tile_tune.py):
            # the old 256/512 defaults ran at 57 TFLOPS; wide-N tiles
            # (bn 3200-5504, bk 256-512) reach 147-158 TFLOPS (75-80% of the
            # max(FLOP,HBM) SOL) — same pattern as the M<=16 decode tiles,
            # where wide N makes every weight DMA row a long contiguous
            # burst.  Tiles must divide the 128-rounded dims (see _pick_tile)
            # and the double-buffered working set must fit ~16 MiB VMEM.
            bm = bm or min(256, _round_up(M, 8))
            # compute footprint (see above): sub-byte carriers expand to bf16
            wbytes = 2.0 if (packed_int4 or native4) else 1.0
            Nr, Kr = _round_up(N, 128), _round_up(K, 128)
            bn_auto = bn is None
            if bn is None:
                bn = _pick_tile(Nr, 5504)
            if bk is None:
                # cap bk so the x-tile double buffer (bm·bk·2B·2) + w tile +
                # acc fit the 15.5 MiB VMEM budget even at small bn (where
                # the 3 MiB//bn target alone could blow past it and the
                # bn-shrink guard below never fires)
                bk_cap = int((15.5 * 2**20 - bm * bn * 12)
                             // max(2 * bn * wbytes + 4 * bm, 1))
                bk = _pick_tile(Kr, max(256, min((3 * 2**20) // bn, bk_cap)))
            while bn_auto and bn > 512 and (
                    bn * bk * wbytes * 2 + bm * bk * 2 * 2
                    + bm * bn * 4 * 3) > 15.5 * 2**20:
                bn = _pick_tile(Nr, bn // 2)

    bm = min(bm, _round_up(M, 8))
    bn = min(bn, _round_up(N, 128))
    bk = min(bk, _round_up(K, 128))
    if packed_int4:
        assert K % BLOCK == 0 and bk % BLOCK == 0, (K, bk)
    if swiglu:
        # pair-interleaved fused w1|w3 (swiglu128): every output tile must
        # hold whole 256-lane pairs, and the halved out tile stays 128-mult
        assert N % 256 == 0, N
        if bn % 256:
            Nr = _round_up(N, 256)
            cands = [d for d in range(256, Nr + 1, 256) if Nr % d == 0]
            fit = [d for d in cands if d <= bn]
            bn = max(fit) if fit else Nr
        # the silu(h1)*h3 epilogue holds several [bm, bn]-sized f32
        # intermediates on the Mosaic stack on top of the GEMM pipeline —
        # cap the tile area (2816x512 at 7B prefill still ran out of VMEM;
        # 2816x256 / 2048x512 compile and run)
        Kr = _round_up(K, 128)
        while bn * bk > 2**20 and bk > 256:
            bk = _pick_tile(Kr, bk // 2)
    if w_transposed and scale_mode == "block":
        # the [bn, bk/32] scales block must itself be lowerable: its last dim
        # needs to be a multiple of 128 or cover the whole K/32 axis
        if (bk // BLOCK) % 128 != 0 and bk < K:
            bk = min(_round_up(K, 128), 128 * BLOCK)
    elif scale_mode == "block" and (bk // BLOCK) % 8:
        # same for the [bk/32, bn] scales block's SUBLANE dim: multiple of 8,
        # or cover the whole K/32 axis (hit at small-model K, e.g. K=768
        # picked bk=384 -> 12 sublanes, not lowerable)
        Kr = _round_up(K, 128)
        cands = [d for d in range(256, Kr + 1, 256) if Kr % d == 0]
        fit = [d for d in cands if d <= bk]
        bk = max(fit) if fit else Kr
    Mp, Kp, Np = _round_up(M, bm), _round_up(K, bk), _round_up(N, bn)

    x = jnp.pad(x, ((0, Mp - M), (0, Kp - K))) if (Mp != M or Kp != K) else x
    if w_transposed:
        kdim = (Kp // 2, bk // 2) if packed_int4 else (Kp, bk)
        if w_q.shape != (Np, kdim[0]):
            w_q = jnp.pad(w_q, ((0, Np - N), (0, kdim[0] - w_q.shape[1])))
        w_spec = pl.BlockSpec((bn, kdim[1]), lambda i, j, k: (j, k),
                              memory_space=pltpu.VMEM)
    elif packed_int4:
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

    # integer MXU path: exact and ~2× the bf16 rate; valid when scales factor
    # out of the K-contraction (per-channel/none, not per-K-block)
    int_dot = (x.dtype == jnp.int8 and w_q.dtype == jnp.int8
               and scale_mode in ("channel", "none")
               and not (packed_int4 and w_transposed))

    xhi = None
    split_x = False
    if packed_int4 and (w_transposed or (bias is None and not int_dot)):
        # pre-split x into nibble-halves (see _kernel): XLA does the reorder
        # once on the (tiny at decode) activation.  xlo rides the x slot,
        # xhi rides the bias slot (bias unsupported in these modes).  Used
        # by the transposed layout (lane-merge reshape not lowerable) AND by
        # the standard packed layout (split-dot beats unpack+concat).
        assert bias is None, "bias not supported with packed-int4 split dots"
        split_x = not w_transposed
        x3 = x.reshape(Mp, Kp // BLOCK, BLOCK)
        xhi = x3[:, :, 16:].reshape(Mp, Kp // 2)
        x = x3[:, :, :16].reshape(Mp, Kp // 2)
        x_spec = pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                              memory_space=pltpu.VMEM)

    int_requant = rq_mult is not None
    in_specs = [x_spec, w_spec]
    args = [x, w_q]
    if int_requant:
        # bit-exact integer requantize epilogue (kernels/requant.py):
        # per-channel (multiplier, shift) ride the scales slot as int32 [2, N]
        assert scale_mode == "none", "fold scales into rq_mult/rq_shift"
        rm = jnp.broadcast_to(jnp.asarray(rq_mult, jnp.int32).reshape(-1), (N,))
        rs = jnp.broadcast_to(jnp.asarray(rq_shift, jnp.int32).reshape(-1), (N,))
        rq = jnp.stack([rm, rs])                                   # [2, N]
        rq = jnp.pad(rq, ((0, 0), (0, Np - N))) if Np != N else rq
        in_specs.append(pl.BlockSpec((2, bn), lambda i, j, k: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(rq)
    elif scale_mode == "channel":
        s = jnp.asarray(scales, jnp.float32).reshape(1, -1)
        s = jnp.pad(s, ((0, 0), (0, Np - N))) if Np != N else s
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(s)
    elif scale_mode == "block":
        s = jnp.asarray(scales, jnp.float32)
        if w_transposed:
            assert s.shape == (N, K // BLOCK), (s.shape, (N, K // BLOCK))
            s = jnp.pad(s, ((0, Np - N), (0, Kp // BLOCK - s.shape[1]))) \
                if (Kp != K or Np != N) else s
            in_specs.append(pl.BlockSpec((bn, bk // BLOCK),
                                         lambda i, j, k: (j, k),
                                         memory_space=pltpu.VMEM))
        else:
            assert s.shape == (K // BLOCK, N), (s.shape, (K // BLOCK, N))
            s = jnp.pad(s, ((0, Kp // BLOCK - s.shape[0]), (0, Np - N))) \
                if (Kp != K or Np != N) else s
            in_specs.append(pl.BlockSpec((bk // BLOCK, bn),
                                         lambda i, j, k: (k, j),
                                         memory_space=pltpu.VMEM))
        args.append(s)
    else:
        assert scale_mode == "none"
        in_specs.append(pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, 1), jnp.float32))

    has_bias = bias is not None
    if int_requant and has_bias:
        b = jnp.asarray(bias, jnp.int32).reshape(1, -1)
        b = jnp.pad(b, ((0, 0), (0, Np - N))) if Np != N else b
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(b)
    elif xhi is not None:
        # packed int4 split dots: the high-nibble activation half rides the
        # bias input slot
        in_specs.append(pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                                     memory_space=pltpu.VMEM))
        args.append(xhi)
    elif has_bias:
        b = jnp.asarray(bias, jnp.float32).reshape(1, -1)
        b = jnp.pad(b, ((0, 0), (0, Np - N))) if Np != N else b
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(b)
    else:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, 1), jnp.float32))

    odt = jnp.dtype(out_dtype)
    qclip = None
    if jnp.issubdtype(odt, jnp.integer) and odt != jnp.int32:
        info = jnp.iinfo(odt)
        qclip = (float(info.min), float(info.max))
    assert not (swiglu and qclip is not None), \
        "swiglu epilogue is float-only (no integer requantize output)"
    if int_requant:
        # exactness requires the int32 MXU accumulator (a f32 accumulator
        # from bf16 carriers is only integer-exact below 2^24)
        assert int_dot, "rq_mult requires int8 x and unpacked int8 w"
        assert qclip is not None, "integer out_dtype required with rq_mult"

    flops = 2 * Mp * Np * Kp
    w_bytes = w_q.size // 2 if native4 else w_q.size * w_q.dtype.itemsize
    bytes_accessed = (x.size * x.dtype.itemsize + w_bytes
                      + Mp * Np * jnp.dtype(out_dtype).itemsize)

    out = pl.pallas_call(
        functools.partial(_kernel, scale_mode=scale_mode, n_k=n_k,
                          out_dtype=out_dtype, epilogue_scale=epilogue_scale,
                          packed_int4=packed_int4, bk=bk, bn=bn,
                          w_transposed=w_transposed, int_dot=int_dot,
                          has_bias=has_bias, out_zp=out_zp, qclip=qclip,
                          deq=deq, split_x=split_x, swiglu=swiglu,
                          int_requant=int_requant),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn // 2) if swiglu else (bm, bn),
                               lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (Mp, Np // 2) if swiglu else (Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn),
                                   jnp.int32 if int_dot else jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(flops=int(flops), bytes_accessed=int(bytes_accessed),
                                      transcendentals=0),
        interpret=interpret,
    )(*args)

    if swiglu:
        return out[:M, :N // 2]
    return out[:M, :N]


def quant_matmul_ref(x, w_q, scales=None, bias=None, *, scale_mode="channel",
                     out_dtype=jnp.float32, epilogue_scale=None,
                     packed_int4: bool = False, w_transposed: bool = False,
                     out_zp: float = 0.0, swiglu: bool = False):
    """Plain-XLA reference of the same contraction (for tests and CPU)."""
    x = jnp.asarray(x, jnp.float32)
    if w_transposed:
        # normalize to the [K, N] view (scales [N, K/32] → [K/32, N])
        if packed_int4:
            w_q = unpack_int4_t(w_q, x.shape[-1])
        w_q = jnp.asarray(w_q).T
        if scale_mode == "block":
            scales = jnp.asarray(scales).T
        return quant_matmul_ref(x, w_q, scales, bias, scale_mode=scale_mode,
                                out_dtype=out_dtype,
                                epilogue_scale=epilogue_scale, out_zp=out_zp,
                                swiglu=swiglu)
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
    if swiglu:
        M, N = acc.shape
        a = acc.reshape(M, N // 256, 2, 128)
        acc = (jax.nn.silu(a[:, :, 0, :]) * a[:, :, 1, :]).reshape(M, N // 2)
    odt = jnp.dtype(out_dtype)
    if jnp.issubdtype(odt, jnp.integer) and odt != jnp.int32:
        info = jnp.iinfo(odt)
        acc = jnp.clip(jnp.round(acc) + out_zp, info.min, info.max)
    return acc.astype(out_dtype)
