"""Pallas kernel unit tests (interpret mode on CPU) — the analog of
tests/unit_test/ (direct kernel calls below the dispatch layer,
ref: tests/unit_test/gemm.c, conv2d_1x1s1_gemm.c)."""

import numpy as np
import jax.numpy as jnp
import pytest

from csinn2_tpu.core.quant import BLOCK_SIZE, block_quantize
from csinn2_tpu.core.dtypes import QuantScheme
from csinn2_tpu.kernels.qmatmul import quant_matmul, quant_matmul_ref
from csinn2_tpu.utils.verify import verify


@pytest.mark.parametrize("shape", [(16, 64, 32), (8, 256, 128), (33, 96, 72)])
def test_qmatmul_channel_int8(rng, shape):
    M, K, N = shape
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
    scales = (rng.random((N,)).astype(np.float32) + 0.5) * 0.01
    bias = rng.standard_normal((N,)).astype(np.float32)
    golden = np.asarray(quant_matmul_ref(x, w, scales, bias, scale_mode="channel"))
    out = np.asarray(quant_matmul(x, w, scales, bias, scale_mode="channel",
                                  bm=8, bn=128, bk=128, interpret=True))
    r = verify(out, golden, tol=5e-2, min_cosine=0.9999)
    assert r.cosine_sim > 0.9999, r


def test_qmatmul_block_q8(rng):
    M, K, N = 4, 128, 64
    x = rng.standard_normal((M, K)).astype(np.float32)
    wf = rng.standard_normal((N, K)).astype(np.float32) * 0.1
    bq = block_quantize(wf, QuantScheme.BLOCK_Q8_0)   # [N, K] + scales [N, K/32]
    w_kn = np.ascontiguousarray(bq.values.T)          # [K, N]
    s_kn = np.ascontiguousarray(bq.scales.astype(np.float32).T)  # [K/32, N]
    golden = np.asarray(quant_matmul_ref(x, w_kn, s_kn, scale_mode="block"))
    out = np.asarray(quant_matmul(x, w_kn, s_kn, scale_mode="block",
                                  bm=8, bn=64, bk=128, interpret=True))
    r = verify(out, golden, tol=5e-2, min_cosine=0.999)
    assert r.cosine_sim > 0.999, r
    # also vs the true float matmul (quantization Δ only)
    r2 = verify(out, x @ wf.T, tol=0.5, min_cosine=0.99)
    assert r2.cosine_sim > 0.99, r2


def test_qmatmul_int8_act_exact(rng):
    """int8 act × int8 weight via bf16 MXU must be integer-exact for small K."""
    M, K, N = 8, 64, 32
    xq = rng.integers(-127, 128, size=(M, K)).astype(np.int8)
    wq = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
    ones = np.ones((N,), np.float32)
    out = np.asarray(quant_matmul(jnp.asarray(xq), jnp.asarray(wq), ones,
                                  scale_mode="channel", bm=8, bn=32, bk=64,
                                  interpret=True))
    golden = xq.astype(np.int64) @ wq.astype(np.int64)
    assert np.array_equal(out.astype(np.int64), golden)


def test_qmatmul_epilogue_scale(rng):
    M, K, N = 8, 32, 32
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.integers(-8, 8, size=(K, N)).astype(np.int8)  # int4 range
    s = np.full((N,), 0.02, np.float32)
    out = np.asarray(quant_matmul(x, w, s, scale_mode="channel",
                                  epilogue_scale=0.5, bm=8, bn=32, bk=32,
                                  interpret=True))
    golden = (x @ (w.astype(np.float32))) * 0.02 * 0.5
    assert verify(out, golden, tol=1e-2).passed


def test_qconv_int8_asym_zp_exact(rng):
    """Integer-MXU conv path (s8×s8→s32) with a nonzero activation
    zero-point: the zp-pad + zp·Σw correction must be EXACT integer math,
    including windows overlapping the padding."""
    import torch
    import torch.nn.functional as F
    from csinn2_tpu import ops
    from csinn2_tpu.core.dtypes import Dtype, Layout, QuantScheme
    from csinn2_tpu.core.quant import QuantInfo
    from csinn2_tpu.core.tensor import Tensor

    for group, stride in [(1, 1), (1, 2), (8, 1)]:
        n, cin, h, w_, cout, k = 1, 8, 9, 9, (8 if group == 8 else 12), 3
        xq = rng.integers(-128, 128, (n, cin, h, w_)).astype(np.int8)
        wq = rng.integers(-127, 128, (cout, cin // group, k, k)).astype(np.int8)
        sx, zx = 0.037, 7
        sw = (rng.random(cout) * 0.02 + 0.01).astype(np.float32)
        x_qi = QuantInfo(scale=sx, zero_point=zx, dtype=Dtype.INT8,
                         scheme=QuantScheme.INT8_ASYM)
        w_qi = QuantInfo(scale=sw, zero_point=np.zeros(cout, np.int32),
                         dtype=Dtype.INT8, axis=0, scheme=QuantScheme.INT8_ASYM)

        params = ops.Conv2dParams(stride=(stride, stride), pad=(1, 1, 1, 1),
                                  group=group, layout=Layout.NCHW)
        out = ops.conv2d(Tensor(xq, qinfo=x_qi), Tensor(wq, qinfo=w_qi),
                         None, params)

        # float64 conv of exact integers == integer conv (cast BEFORE the
        # subtraction — int8 - zp would wrap around)
        acc = F.conv2d(torch.tensor(xq.astype(np.float64) - zx),
                       torch.tensor(wq.astype(np.float64)), stride=stride,
                       padding=1, groups=group).numpy()
        golden = acc * (sx * sw.reshape(1, -1, 1, 1))
        np.testing.assert_allclose(np.asarray(out.data, np.float64), golden,
                                   rtol=1e-5, atol=1e-4)


def test_int4_pack_roundtrip(rng):
    from csinn2_tpu.kernels.qmatmul import pack_int4, unpack_int4
    q = rng.integers(-8, 8, size=(128, 24)).astype(np.int8)
    packed = np.asarray(pack_int4(q))
    assert packed.shape == (64, 24)
    back = np.asarray(unpack_int4(packed, 128))
    np.testing.assert_array_equal(back, q)


def test_qmatmul_packed_int4_block(rng):
    """Packed-nibble Q4_0 Pallas path == unpacked reference (exact)."""
    from csinn2_tpu.kernels.qmatmul import pack_int4
    M, K, N = 4, 128, 64
    x = rng.standard_normal((M, K)).astype(np.float32)
    q = rng.integers(-7, 8, size=(K, N)).astype(np.int8)
    s = (rng.random((K // 32, N)).astype(np.float32) * 0.02 + 0.005)
    golden = np.asarray(quant_matmul_ref(x, q, s, scale_mode="block"))
    packed = pack_int4(q)
    out = np.asarray(quant_matmul(x, packed, s, scale_mode="block",
                                  bm=8, bn=64, bk=64, interpret=True,
                                  packed_int4=True))
    r = verify(out, golden, tol=5e-2, min_cosine=0.9999)
    assert r.cosine_sim > 0.9999, r
    # ref path with packed input agrees too
    ref_packed = np.asarray(quant_matmul_ref(x, packed, s, scale_mode="block",
                                             packed_int4=True))
    np.testing.assert_allclose(ref_packed, golden, rtol=1e-6)


def test_qmatmul_packed_int4_channel(rng):
    from csinn2_tpu.kernels.qmatmul import pack_int4
    M, K, N = 8, 64, 32
    x = rng.standard_normal((M, K)).astype(np.float32)
    q = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    s = (rng.random((N,)).astype(np.float32) * 0.02 + 0.005)
    golden = np.asarray(quant_matmul_ref(x, q, s, scale_mode="channel"))
    out = np.asarray(quant_matmul(x, pack_int4(q), s, scale_mode="channel",
                                  bm=8, bn=32, bk=64, interpret=True,
                                  packed_int4=True))
    r = verify(out, golden, tol=5e-2, min_cosine=0.9999)
    assert r.cosine_sim > 0.9999, r
