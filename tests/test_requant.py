"""Bit-exact integer requantize epilogue (kernels/requant.py) vs the host
oracle (core.quant.requantize_int) — the TFLite/gemmlowp SRDHM + rounding-POT
chain of the reference's fused GEMM epilogue (ref: requantize_m4_s,
source/thead_rvv/int8/gemm_int8_packn.c:26-41; SURVEY hard-part (a)).

Run on a TPU backend these execute the real Mosaic lowering (the limb
arithmetic is int32-only precisely because narrow-int shifts don't
legalize); under the CPU test rig the Pallas case uses interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from csinn2_tpu.core.dtypes import Dtype
from csinn2_tpu.core.quant import quantize_multiplier, requantize_int
from csinn2_tpu.kernels.qmatmul import quant_matmul
from csinn2_tpu.kernels.requant import requant_int


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("dt", [Dtype.INT8, Dtype.UINT8, Dtype.INT16])
def test_requant_int_matches_oracle(rng, dt):
    """Elementwise chain: random int32 accs x multipliers spanning
    eff in [1e-6, 4] (left and right shifts) x zero-points — exact."""
    n = 384
    acc = rng.integers(-2**30, 2**30, (96, n)).astype(np.int32)
    acc[0, :4] = [-2**31 + 1, 2**31 - 1, 0, -1]       # rails
    eff = np.exp(rng.uniform(np.log(1e-6), np.log(4.0), n))
    eff[:2] = [0.0, 1.0]
    mult, shift = quantize_multiplier(eff)
    zp = int(rng.integers(-64, 64)) if dt != Dtype.UINT8 else 128
    gold = requantize_int(acc, mult[None, :], shift[None, :], zp, dt)
    got = np.asarray(jax.jit(
        lambda a: requant_int(a, jnp.asarray(mult)[None, :],
                              jnp.asarray(shift)[None, :], zp,
                              dt.qmin, dt.qmax).astype(dt.jnp))(acc))
    np.testing.assert_array_equal(got, gold)


@pytest.mark.parametrize("dt", [Dtype.INT8, Dtype.UINT8, Dtype.INT16])
def test_qmatmul_int_requant_epilogue_bit_exact(rng, dt):
    """Full kernel: s8 x s8 -> s32 MXU dot + in-kernel SRDHM epilogue ==
    numpy int dot + host oracle, bit for bit (incl. int32 bias added before
    the requantize, per the reference)."""
    M, K, N = 16, 256, 128
    x = rng.integers(-127, 128, (M, K)).astype(np.int8)
    w = rng.integers(-127, 128, (K, N)).astype(np.int8)
    bias = rng.integers(-2**18, 2**18, (N,)).astype(np.int32)
    eff = np.exp(rng.uniform(np.log(1e-5), np.log(0.5), N))
    mult, shift = quantize_multiplier(eff)
    zp = 10 if dt != Dtype.UINT8 else 140

    acc = x.astype(np.int64) @ w.astype(np.int64) + bias[None, :]
    gold = requantize_int(acc.astype(np.int32), mult[None, :],
                          shift[None, :], zp, dt)

    interp = jax.default_backend() != "tpu"
    out = np.asarray(quant_matmul(
        jnp.asarray(x), jnp.asarray(w), bias=jnp.asarray(bias),
        scale_mode="none", out_dtype=dt.jnp, out_zp=float(zp),
        rq_mult=jnp.asarray(mult), rq_shift=jnp.asarray(shift),
        bm=8, bn=128, bk=128, interpret=interp))
    np.testing.assert_array_equal(out, gold)


def test_requant_oracle_gemmlowp_unit_vectors():
    """The oracle's SRDHM uses C-truncation (gemmlowp), not floor: exact
    negative multiples and sub-half negatives must not bias one LSB low."""
    # eff = 0.5 -> mult = 2^30, shift = 0: acc * 0.5 with SRDHM rounding
    mult, shift = quantize_multiplier(0.5)
    cases = [(-2, -1), (-1, 0), (-3, -1), (2, 1), (3, 2), (-4, -2)]
    for acc, want in cases:
        got = int(requantize_int(np.int32(acc), mult[0], shift[0], 0,
                                 Dtype.INT8))
        assert got == want, (acc, got, want)
