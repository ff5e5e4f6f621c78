"""Bit-exact integer requantize epilogue, lowerable inside Pallas kernels.

The reference's quantized GEMM output path is fixed-point exact: multiplier+
shift requantize fused into the GEMM epilogue (ref: requantize_m4_s —
vmulh / vssra / +zp / vnclip, source/thead_rvv/int8/gemm_int8_packn.c:26-41).
The TPU analog must reproduce the gemmlowp/TFLite chain

    h = SRDHM(acc << max(shift,0), multiplier)        # (a*b+nudge)/2^31, trunc
    y = clip(RoundingDivideByPOT(h, max(-shift,0)) + zp, qmin, qmax)

bit-for-bit — but the VPU has no 64-bit lanes, so the 62-bit product is
computed in 12-bit limbs with int32 carries:

  * work on |acc| and re-apply the sign (SRDHM's trunc-toward-zero becomes a
    plain floor on the magnitude, with the negative nudge's -1 folded into
    the lowest limb);
  * split |acc| (31 bits) and multiplier (31 bits) into 12/12/7-bit limbs —
    all 9 partial products are < 2^24, bucket sums < 2^26, so every
    intermediate fits a signed int32 lane;
  * carry-normalize base-2^12 and read Q = floor((P + nudge)/2^31) from the
    limbs above bit 31;
  * the rounding POT divide collapses to (Q + 2^(r-1)) >> r on the magnitude
    (equal to the signed remainder/threshold formulation for both signs).

Everything is int32 adds/mults/shifts/compares — Mosaic-lowerable (narrow-int
shifts are not, which rules the int16 forms out).  ~30 lane-ops per output
element, epilogue-only (once per output tile, amortized over the K loop);
measured cost vs the float epilogue is recorded in PARITY.md.

Exactness oracle: core.quant.requantize_int (host numpy, same chain on
int64) — tests/test_requant.py proves bit-identity across the int8/uint8/
int16 matrix, on-device when a TPU is attached.
"""

from __future__ import annotations

import jax.numpy as jnp


def requant_int(acc, mult, shift, out_zp, qmin: int, qmax: int):
    """Exact integer requantize of an int32 accumulator (traceable; usable
    inside Pallas kernels and in plain XLA).

    acc: int32 array.  mult: int32 (normalized to [2^30, 2^31) by
    core.quant.quantize_multiplier; 0 allowed).  shift: int32.  mult/shift/
    out_zp broadcast against acc (e.g. [1, N] rows for per-channel).
    Returns int32 in [qmin, qmax] (caller casts to the storage dtype).
    """
    acc = acc.astype(jnp.int32)
    mult = jnp.asarray(mult, jnp.int32)
    shift = jnp.asarray(shift, jnp.int32)
    left = jnp.maximum(shift, 0)
    right = jnp.maximum(-shift, 0)

    neg = acc < 0
    mag = jnp.abs(acc)
    # pre-shift saturation (oracle clips the int64 to [-2^31, 2^31-1]; the
    # negative rail saturates at magnitude 2^31, unrepresentable in int32 —
    # handled by the `sat_neg` override below: floor((2^31*m + 2^30-1)/2^31)
    # is exactly m)
    lim = jnp.int32(2**31 - 1) >> left
    over = mag > lim
    sat_neg = over & neg
    mag = jnp.where(over, jnp.int32(2**31 - 1), mag << left)

    # 12-bit limbs of |acc| (31 bits) and multiplier (31 bits)
    a0 = mag & 0xFFF
    a1 = (mag >> 12) & 0xFFF
    a2 = mag >> 24                                    # < 2^7
    m0 = mult & 0xFFF
    m1 = (mult >> 12) & 0xFFF
    m2 = mult >> 24                                   # < 2^7

    # bucket sums of the 9 partials (each < 2^24, sums < 2^26) with the
    # SRDHM nudge folded in: +2^30 = 64 * 2^24 into bucket 2, and the
    # negative branch's (1 - 2^30) nudge = the same minus 1 in bucket 0
    b0 = a0 * m0 - neg.astype(jnp.int32)
    b1 = a0 * m1 + a1 * m0
    b2 = a0 * m2 + a1 * m1 + a2 * m0 + 64
    b3 = a1 * m2 + a2 * m1
    b4 = a2 * m2

    # base-2^12 carry propagation (arithmetic >> keeps negative-carry floor
    # semantics consistent: x = (x >> 12)*2^12 + (x & 0xFFF) for all ints)
    b1 = b1 + (b0 >> 12)
    b2 = b2 + (b1 >> 12)
    b3 = b3 + (b2 >> 12)
    b4 = b4 + (b3 >> 12)

    # Q = floor((P + nudge) / 2^31): bits >= 31 of the limb number
    q = ((b2 & 0xFFF) >> 7) + ((b3 & 0xFFF) << 5) + (b4 << 17)
    q = jnp.where(sat_neg, mult, q)

    # rounding divide by 2^right, half away from zero == half-up on |.|
    half = (jnp.int32(1) << right) >> 1
    y = (q + half) >> right
    y = jnp.where(neg, -y, y) + jnp.asarray(out_zp, jnp.int32)
    return jnp.clip(y, qmin, qmax)
