"""Quantization math tests (mirrors reference semantics:
shl_quantize_multiplier source/nn2/utils.c:185, requantize chain
gemm_int8_packn.c:26-41, block quant utils.c:2079-2180)."""

import numpy as np
import jax.numpy as jnp
import pytest

from csinn2_tpu.core.dtypes import Dtype, QuantScheme
from csinn2_tpu.core.quant import (
    BLOCK_SIZE, QuantInfo, block_dequantize, block_quantize, dequantize,
    from_minmax, observe, quantize, quantize_multiplier, requantize_float,
    requantize_int,
)


def test_quantize_roundtrip_int8_sym(rng):
    x = rng.standard_normal((64, 32)).astype(np.float32) * 3
    qi = observe(x, Dtype.INT8, symmetric=True)
    q = quantize(x, qi)
    assert np.asarray(q).dtype == np.int8
    x2 = np.asarray(dequantize(q, qi))
    assert np.abs(x2 - x).max() <= qi.scale * 0.51


def test_quantize_roundtrip_uint8_asym(rng):
    x = (rng.random((100,)) * 10 - 2).astype(np.float32)
    qi = observe(x, Dtype.UINT8, symmetric=False)
    q = np.asarray(quantize(x, qi))
    assert q.dtype == np.uint8
    x2 = np.asarray(dequantize(q, qi))
    assert np.abs(x2 - x).max() <= qi.scale * 0.51


def test_per_channel_quant(rng):
    x = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
    x[3] *= 50  # channel with big range
    qi = observe(x, Dtype.INT8, symmetric=True, axis=0)
    assert qi.per_channel and len(qi.scale) == 8
    q = quantize(x, qi)
    x2 = np.asarray(dequantize(q, qi))
    for c in range(8):
        assert np.abs(x2[c] - x[c]).max() <= qi.scale[c] * 0.51


def test_quantize_multiplier_exact():
    m, s = quantize_multiplier(1.0)
    assert m[0] == 1 << 30 and s[0] == 1
    m, s = quantize_multiplier(0.5)
    assert m[0] == 1 << 30 and s[0] == 0
    m, s = quantize_multiplier(0.0)
    assert m[0] == 0 and s[0] == 0
    # representable value check: q * 2^(s-31) ≈ input
    for v in [0.0003, 0.37, 1.7, 123.456]:
        m, s = quantize_multiplier(v)
        approx = float(m[0]) * 2.0 ** (int(s[0]) - 31)
        assert abs(approx - v) / v < 1e-8


def test_requantize_int_matches_float(rng):
    """Integer fixed-point requant must agree with float requant within 1 LSB."""
    acc = jnp.asarray(rng.integers(-(2**20), 2**20, size=(256,)), jnp.int32)
    eff = 0.00137
    mult, shift = quantize_multiplier(eff)
    out_i = np.asarray(requantize_int(acc, mult[0], shift[0], out_zp=5, out_dtype=Dtype.INT8))
    out_f = np.asarray(requantize_float(acc, eff, out_zp=5, out_dtype=Dtype.INT8))
    assert np.abs(out_i.astype(np.int32) - out_f.astype(np.int32)).max() <= 1


def test_block_quant_q8_roundtrip(rng):
    x = rng.standard_normal((4, 128)).astype(np.float32)
    bq = block_quantize(x, QuantScheme.BLOCK_Q8_0)
    assert bq.values.shape == x.shape and bq.scales.shape == (4, 128 // BLOCK_SIZE)
    x2 = np.asarray(block_dequantize(bq))
    # q8_0: 127-level per-block, error <= scale/2
    scales = bq.scales.astype(np.float32).repeat(BLOCK_SIZE, axis=-1)
    assert np.all(np.abs(x2 - x) <= scales * 0.51 + 1e-6)


def test_block_quant_q4_roundtrip(rng):
    x = rng.standard_normal((2, 64)).astype(np.float32)
    bq = block_quantize(x, QuantScheme.BLOCK_Q4_0)
    assert bq.values.min() >= -8 and bq.values.max() <= 7
    x2 = np.asarray(block_dequantize(bq))
    scales = bq.scales.astype(np.float32).repeat(BLOCK_SIZE, axis=-1)
    assert np.all(np.abs(x2 - x) <= scales * 0.51 + 1e-6)


def test_from_minmax_zero_range():
    qi = from_minmax(0.0, 0.0, Dtype.INT8)
    assert qi.scale == 1.0
