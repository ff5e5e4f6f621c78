"""Quantization math: per-tensor / per-channel affine, multiplier folding, block quant.

TPU-native re-expression of the reference's quant utilities
(ref: source/nn2/utils.c — csinn_tensor_data_convert :2206, shl_quantize_multiplier
:185-210, block_(de)quantize_q4/q8 :2079-2180).

Two requantize paths exist, mirroring the reference's split between the float
reference backend (dequant→f32→requant, source/reference/utils.c:609-650) and
the integer kernels (vmulh+vssra+zp+vnclip epilogue,
source/thead_rvv/int8/gemm_int8_packn.c:26-41):

  * float path  — `requantize_float`: acc_i32 * (s_in*s_w/s_out) + zp, round,
    clip.  This is what the Pallas epilogue fuses (fp32 multiply on the VPU is
    speed-of-light on TPU; there is no win from integer fixed-point there).
  * integer path — `requantize_int`: 31-bit fixed-point multiplier+shift
    (TFLite-style SRDHM + rounding POT), for bit-exactness studies.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from csinn2_tpu.core.dtypes import Dtype, QuantScheme

ArrayLike = Union[np.ndarray, jnp.ndarray, float]

BLOCK_SIZE = 32  # llama.cpp-compatible block quant granularity (ref: utils.c:2089)


@dataclasses.dataclass
class QuantInfo:
    """Per-tensor or per-channel affine quantization parameters.

    (ref: struct csinn_quant_info, csinn_data_structure.h:494-503 — scale,
    zero_point, min, max, multiplier, shift; replicated per channel when
    quant_channel > 1.)

    scale/zero_point are scalars (per-tensor) or 1-D arrays of length C
    (per-channel along `axis`).
    """

    scale: ArrayLike = 1.0
    zero_point: ArrayLike = 0
    dtype: Dtype = Dtype.FLOAT32
    axis: Optional[int] = None  # channel axis for per-channel quant; None = per-tensor
    scheme: QuantScheme = QuantScheme.UNSET

    @property
    def per_channel(self) -> bool:
        return self.axis is not None and np.ndim(self.scale) > 0

    def multiplier_shift(self, out_scale: ArrayLike, w_scale: ArrayLike = 1.0):
        """Fold (in_scale * w_scale / out_scale) into int multiplier+shift arrays."""
        eff = np.asarray(self.scale, np.float64) * np.asarray(w_scale, np.float64)
        eff = eff / np.asarray(out_scale, np.float64)
        return quantize_multiplier(eff)

    def broadcast_shape(self, rank: int) -> Tuple[int, ...]:
        """Shape to reshape scale/zp to for broadcasting against a rank-`rank` array."""
        if not self.per_channel:
            return ()
        shape = [1] * rank
        shape[self.axis] = -1
        return tuple(shape)


def from_minmax(minv: ArrayLike, maxv: ArrayLike, dtype: Dtype,
                symmetric: bool = False, axis: Optional[int] = None) -> QuantInfo:
    """Derive scale/zero-point from observed min/max.

    (ref: quantize-from-range logic used by the test harness,
    tests/validation_layer/testutil.h get_quant_info.)
    """
    if dtype.is_float:  # float "qinfo" is a plain cast: identity scale
        return QuantInfo(scale=1.0, zero_point=0, dtype=dtype, axis=None)
    minv = np.minimum(np.asarray(minv, np.float64), 0.0)
    maxv = np.maximum(np.asarray(maxv, np.float64), 0.0)
    qmin, qmax = dtype.qmin, dtype.qmax
    if symmetric:
        amax = np.maximum(np.abs(minv), np.abs(maxv))
        # symmetric uses ±half-range: int8 → ±127 about zp=0; unsigned dtypes
        # (u8) center on the midpoint code instead (zp=128, ±127) — "u8 with
        # zp fixed at 128", the standard symmetric-weight form for u8 storage
        # (kills the asymmetric-weight window-sum correction in the int
        # kernels, cf. kernels/qconv.py)
        if qmin == 0:
            mid = (qmax + 1) // 2
            scale = np.where(amax == 0, 1.0, amax / (qmax - mid))
            zp = np.full_like(scale, mid, dtype=np.int32)
        else:
            scale = np.where(amax == 0, 1.0, amax / qmax)
            zp = np.zeros_like(scale, dtype=np.int32)
    else:
        scale = np.where(maxv - minv == 0, 1.0, (maxv - minv) / (qmax - qmin))
        zp = np.clip(np.round(qmin - minv / scale), qmin, qmax).astype(np.int32)
    scale = scale.astype(np.float32)
    if axis is None:
        scale = float(scale)
        zp = int(zp)
    return QuantInfo(scale=scale, zero_point=zp, dtype=dtype, axis=axis)


def observe(x: np.ndarray, dtype: Dtype, symmetric: bool = False,
            axis: Optional[int] = None) -> QuantInfo:
    """Calibrate a QuantInfo from data (per-tensor or per-channel along axis)."""
    if axis is None:
        return from_minmax(x.min(), x.max(), dtype, symmetric, None)
    reduce_axes = tuple(i for i in range(x.ndim) if i != axis)
    return from_minmax(x.min(axis=reduce_axes), x.max(axis=reduce_axes),
                       dtype, symmetric, axis)


def quantize(x, qinfo: QuantInfo):
    """f32 → quantized int carrier: round(x/scale)+zp, clip to dtype range.

    (ref: csinn_tensor_data_convert float→int path, source/nn2/utils.c.)
    """
    if qinfo.dtype.is_float:
        return jnp.asarray(x, qinfo.dtype.jnp)
    shp = qinfo.broadcast_shape(jnp.ndim(x))
    scale = jnp.reshape(jnp.asarray(qinfo.scale, jnp.float32), shp)
    zp = jnp.reshape(jnp.asarray(qinfo.zero_point, jnp.float32), shp)
    q = jnp.round(jnp.asarray(x, jnp.float32) / scale) + zp
    q = jnp.clip(q, qinfo.dtype.qmin, qinfo.dtype.qmax)
    return q.astype(qinfo.dtype.jnp)


def dequantize(q, qinfo: QuantInfo):
    """quantized int carrier → f32: (q - zp) * scale.

    The widening hop int8→int32→f32 avoids a v5e XLA miscompile when a
    direct narrow-int→float convert fuses into a grouped convolution
    (see kernels/qconv.py)."""
    if qinfo.dtype.is_float:
        return jnp.asarray(q, jnp.float32)
    shp = qinfo.broadcast_shape(jnp.ndim(q))
    scale = jnp.reshape(jnp.asarray(qinfo.scale, jnp.float32), shp)
    zp = jnp.reshape(jnp.asarray(qinfo.zero_point, jnp.float32), shp)
    q = jnp.asarray(q)
    if q.dtype in (jnp.int8, jnp.uint8):
        q = q.astype(jnp.int32)
    return (q.astype(jnp.float32) - zp) * scale


def quantize_multiplier(double_multiplier: ArrayLike) -> Tuple[np.ndarray, np.ndarray]:
    """real multiplier → (int32 fixed-point multiplier, shift), TFLite semantics.

    q_fixed = round(m * 2^31) with m normalized to [0.5, 1); value represented
    is q * 2^(shift-31).  (ref: shl_quantize_multiplier, source/nn2/utils.c:185-210.)
    """
    m = np.atleast_1d(np.asarray(double_multiplier, np.float64))
    q_out = np.zeros(m.shape, np.int32)
    s_out = np.zeros(m.shape, np.int32)
    for i, v in np.ndenumerate(m):
        if v == 0.0:
            continue
        frac, exp = math.frexp(v)
        q = round(frac * (1 << 31))
        if q == (1 << 31):
            q //= 2
            exp += 1
        if exp < -31:
            q, exp = 0, 0
        q_out[i], s_out[i] = q, exp
    return q_out, s_out


def requantize_int(acc_i32, multiplier, shift, out_zp, out_dtype: Dtype):
    """Exact integer requantize of an int32 accumulator — host-side (numpy)
    bit-exactness oracle.

    Mirrors the integer epilogue chain (ref: requantize_m4_s,
    source/thead_rvv/int8/gemm_int8_packn.c:26-41: mulh → rounding sra → +zp →
    saturating narrow) in its TFLite fixed-point formulation
    (SRDHM + rounding-divide-by-POT).  multiplier/shift from
    `quantize_multiplier`.  The production TPU epilogue is
    `requantize_float`, fused into the Pallas GEMM; this function exists to
    quantify the float-vs-fixed-point Δ (≤1 LSB, see tests/test_quant.py).
    """
    x = np.asarray(acc_i32, np.int64)
    m = np.asarray(multiplier, np.int64)
    s = np.asarray(shift, np.int64)
    left = np.maximum(s, 0)
    right = np.maximum(-s, 0)
    x = np.clip(x << left, -(2**31), 2**31 - 1)
    # saturating rounding doubling high mul: (a*b + nudge) / 2^31 with C
    # TRUNCATING division (gemmlowp SRDHM; an arithmetic >> here would
    # floor, biasing every negative product one LSB low — fixed in r5, the
    # in-kernel integer epilogue kernels/requant.py matches this exactly)
    prod = x * m
    nudge = np.where(prod >= 0, 1 << 30, 1 - (1 << 30))
    q = prod + nudge
    x = np.where(q >= 0, q >> 31, -((-q) >> 31))
    x = np.clip(x, -(2**31), 2**31 - 1)
    # rounding arithmetic right shift
    mask = (np.int64(1) << right) - 1
    remainder = x & mask
    threshold = (mask >> 1) + np.where(x < 0, 1, 0)
    x = (x >> right) + np.where(remainder > threshold, 1, 0)
    x = np.clip(x + np.asarray(out_zp, np.int64), out_dtype.qmin, out_dtype.qmax)
    return x.astype(out_dtype.np)


def requantize_float(acc_i32, eff_scale, out_zp, out_dtype: Dtype):
    """Float-path requantize: round(acc * eff_scale) + zp, clip.

    eff_scale = in_scale * w_scale / out_scale (scalar or per-channel, already
    broadcast to acc's trailing dims by the caller).  This is the epilogue the
    Pallas GEMM fuses.
    """
    x = jnp.round(acc_i32.astype(jnp.float32) * jnp.asarray(eff_scale, jnp.float32))
    x = x + jnp.asarray(out_zp, jnp.float32)
    x = jnp.clip(x, out_dtype.qmin, out_dtype.qmax)
    return x.astype(out_dtype.jnp)


# ---------------------------------------------------------------------------
# Block quantization (llama.cpp-compatible Q8_0 / Q4_0)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class BlockQuant:
    """Block-quantized weight: int values + one fp16 scale per 32-elem block.

    (ref: shl_block_quantize / block_quantize_q4/q8, source/llm/llama2_quantize.c:25-115
    and source/nn2/utils.c:2079-2180.)  Stored unpacked (int8 carrier for Q4_0
    values in [-8,7]) — TPU-idiomatic; the serializer packs nibbles on disk.

    values: int8 array, original shape.
    scales: fp16 array, shape = original with last dim / 32.
    """

    values: ArrayLike
    scales: ArrayLike
    scheme: QuantScheme

    @property
    def shape(self):
        return self.values.shape


def block_quantize(x: np.ndarray, scheme: QuantScheme) -> BlockQuant:
    """f32 → Q8_0/Q4_0: per-32-block absmax scale (fp16), round to int8/int4."""
    assert x.shape[-1] % BLOCK_SIZE == 0, f"last dim {x.shape[-1]} % {BLOCK_SIZE} != 0"
    xb = np.asarray(x, np.float32).reshape(*x.shape[:-1], -1, BLOCK_SIZE)
    amax = np.abs(xb).max(axis=-1, keepdims=True)
    if scheme == QuantScheme.BLOCK_Q8_0:
        d = amax / 127.0
    elif scheme == QuantScheme.BLOCK_Q4_0:
        d = amax / 7.0
    else:
        raise ValueError(f"unsupported block scheme {scheme}")
    d16 = d.astype(np.float16)  # scale is stored (and applied) as fp16, ref: utils.c:2097
    dd = d16.astype(np.float32)
    q = np.where(dd == 0, 0.0, np.round(xb / np.where(dd == 0, 1.0, dd)))
    if scheme == QuantScheme.BLOCK_Q8_0:
        q = np.clip(q, -127, 127)
    else:
        q = np.clip(q, -8, 7)
    values = q.astype(np.int8).reshape(x.shape)
    scales = d16.squeeze(-1)
    return BlockQuant(values=values, scales=scales, scheme=scheme)


def block_dequantize(bq: BlockQuant):
    """Q8_0/Q4_0 → f32 (jnp). (ref: block_dequantize_q4/q8, utils.c:2079-2130.)"""
    v = jnp.asarray(bq.values, jnp.float32)
    vb = v.reshape(*v.shape[:-1], -1, BLOCK_SIZE)
    s = jnp.asarray(bq.scales, jnp.float32)[..., None]
    return (vb * s).reshape(v.shape)
