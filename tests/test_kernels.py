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


def test_qmatmul_native_int4_block(rng):
    """jnp.int4-carrier Pallas path (Mosaic hardware sub-byte unpack — the
    shipping TPU q4_0 decode form, 73-88%% of int4 weight-read SOL on v5e vs
    51-58%% for every manual nibble pipeline; examples/int4_dequant_probe.py)
    == unpacked int8 reference."""
    import jax
    M, K, N = 4, 128, 64
    x = rng.standard_normal((M, K)).astype(np.float32)
    q = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    s = (rng.random((K // 32, N)).astype(np.float32) * 0.02 + 0.005)
    golden = np.asarray(quant_matmul_ref(x, q, s, scale_mode="block"))

    def run(xx, qq):
        # S4 arrays cannot cross jit boundaries on the tunnel backend —
        # convert in-jit, exactly like llm.model.native4_params
        return quant_matmul(xx, qq.astype(jnp.int4), s, scale_mode="block",
                            bm=8, bn=64, bk=128, interpret=True)

    out = np.asarray(jax.jit(run)(x, jnp.asarray(q)))
    r = verify(out, golden, tol=5e-2, min_cosine=0.9999)
    assert r.cosine_sim > 0.9999, r


def test_native4_params_conversion(rng):
    """native4_params: packed QWeight -> S4 [K, N] with K padded to the tile
    multiple; linear() pads the activation and matches the packed path."""
    import jax
    from csinn2_tpu.llm.model import linear, native4_params, quantize_weight
    K, N = 3040, 96    # K > 2048, K % 1024 != 0, pad 32/3040 ~ 1% -> 3072
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)
    qw = quantize_weight(w, "q4_0")
    assert qw.packed
    y_pk = np.asarray(linear(x, qw, use_pallas=False))

    def run(a, q):
        qn = native4_params(q)
        assert qn.values.dtype == jnp.dtype("int4")
        assert qn.values.shape == (3072, N)
        assert qn.scales.shape == (3072 // 32, N)
        return linear(a, qn, use_pallas=False)

    y_n4 = np.asarray(jax.jit(run)(x, qw))
    np.testing.assert_allclose(y_n4, y_pk, rtol=1e-5, atol=1e-5)


def test_qmatmul_swiglu_epilogue(rng):
    """swiglu=True: silu(h1)*h3 over 128-lane pair-interleaved columns ==
    the unfused reference (opt-in path; measured negative at 7B prefill but
    kept correct — see llm/model.fuse_layer_weights)."""
    M, K, N = 8, 128, 512          # N = 2F, pairs of 128 lanes
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
    s = (rng.random((K // 32, N)).astype(np.float32) * 0.02 + 0.005)
    out = np.asarray(quant_matmul(x, w, s, scale_mode="block", swiglu=True,
                                  bm=8, bn=512, bk=128, interpret=True))
    gold = np.asarray(quant_matmul_ref(x, w, s, scale_mode="block",
                                       swiglu=True))
    assert out.shape == (M, N // 2)
    r = verify(out, gold, tol=5e-2, min_cosine=0.999)
    assert r.cosine_sim > 0.999, r


def test_swiglu_fused_weights_match_unfused(rng):
    """qweight_concat_swiglu + linear(swiglu=True) == silu(x@w1)*(x@w3),
    including the F->Fp zero-padding and the matching w2 K-pad."""
    from csinn2_tpu.llm.model import (linear, qweight_concat_swiglu,
                                      _pad_rows_qw, quantize_weight)
    K, F = 128, 384                # F % 512 != 0 -> pads to 512
    w1 = rng.standard_normal((K, F)).astype(np.float32) * 0.05
    w3 = rng.standard_normal((K, F)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)
    q1, q3 = quantize_weight(w1, "q8_0"), quantize_weight(w3, "q8_0")
    w13 = qweight_concat_swiglu(q1, q3)
    assert w13.layout == "swiglu128" and w13.shape[-1] == 1024
    h = np.asarray(linear(x, w13, use_pallas=False, swiglu=True))
    h1 = np.asarray(linear(x, q1, use_pallas=False))
    h3 = np.asarray(linear(x, q3, use_pallas=False))
    gold = (h1 / (1 + np.exp(-h1))) * h3
    np.testing.assert_allclose(h[:, :F], gold, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(h[:, F:], 0.0, atol=1e-6)   # padded tail
    # w2 K-pad: padded rows contribute nothing
    w2 = quantize_weight(rng.standard_normal((F, 64)).astype(np.float32) * 0.05,
                         "q8_0")
    w2p = _pad_rows_qw(w2, 512)
    y = np.asarray(linear(jnp.asarray(h), w2p, use_pallas=False))
    y0 = np.asarray(linear(jnp.asarray(h[:, :F]), w2, use_pallas=False))
    np.testing.assert_allclose(y, y0, rtol=1e-5, atol=1e-5)


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


# -- transposed (rearranged) weight layout -------------------------------------

def test_qmatmul_transposed_block_q8(rng):
    """[N,K] rearranged weight + [N,K/32] scales must match the [K,N] path."""
    M, K, N = 4, 128, 64
    x = rng.standard_normal((M, K)).astype(np.float32)
    wf = rng.standard_normal((N, K)).astype(np.float32) * 0.1
    bq = block_quantize(wf, QuantScheme.BLOCK_Q8_0)   # values [N,K], scales [N,K/32]
    golden = np.asarray(quant_matmul_ref(x, np.ascontiguousarray(bq.values.T),
                                         np.ascontiguousarray(
                                             bq.scales.astype(np.float32).T),
                                         scale_mode="block"))
    out = np.asarray(quant_matmul(x, jnp.asarray(bq.values),
                                  jnp.asarray(bq.scales, jnp.float32),
                                  scale_mode="block", w_transposed=True,
                                  bm=8, bn=64, bk=64, interpret=True))
    np.testing.assert_allclose(out, golden, rtol=2e-2, atol=2e-2)


def test_qmatmul_transposed_packed_int4(rng):
    from csinn2_tpu.kernels.qmatmul import pack_int4_t, unpack_int4_t
    M, K, N = 4, 128, 64
    q = rng.integers(-8, 8, size=(N, K)).astype(np.int8)
    packed = np.asarray(pack_int4_t(q))
    assert packed.shape == (N, K // 2)
    np.testing.assert_array_equal(np.asarray(unpack_int4_t(packed, K)), q)
    x = rng.standard_normal((M, K)).astype(np.float32)
    s = (rng.random((N, K // 32)) * 0.05 + 0.01).astype(np.float32)
    golden = np.asarray(quant_matmul_ref(x, q, s, scale_mode="block",
                                         w_transposed=True))
    out = np.asarray(quant_matmul(x, jnp.asarray(packed), jnp.asarray(s),
                                  scale_mode="block", w_transposed=True,
                                  packed_int4=True, bm=8, bn=64, bk=64,
                                  interpret=True))
    np.testing.assert_allclose(out, golden, rtol=2e-2, atol=2e-2)


def test_qmatmul_transposed_channel(rng):
    M, K, N = 8, 96, 48
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.integers(-127, 128, size=(N, K)).astype(np.int8)
    s = (rng.random((N,)) * 0.01 + 0.001).astype(np.float32)
    golden = np.asarray(quant_matmul_ref(x, w, s, scale_mode="channel",
                                         w_transposed=True))
    out = np.asarray(quant_matmul(x, jnp.asarray(w), jnp.asarray(s),
                                  scale_mode="channel", w_transposed=True,
                                  bm=8, bn=48, bk=96, interpret=True))
    r = verify(out, golden, tol=5e-2, min_cosine=0.9999)
    assert r.cosine_sim > 0.9999, r


# -- integer MXU path + fused requantize epilogue ------------------------------

def test_qmatmul_int_dot_bit_exact(rng):
    """s8×s8→s32 integer-pipe path: bit-exact vs int64 numpy."""
    M, K, N = 16, 128, 64
    xq = rng.integers(-127, 128, size=(M, K)).astype(np.int8)
    wq = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
    s = (rng.random((N,)) * 0.01 + 0.001).astype(np.float32)
    out = np.asarray(quant_matmul(jnp.asarray(xq), jnp.asarray(wq), s,
                                  scale_mode="channel", bm=8, bn=64, bk=128,
                                  interpret=True))
    golden = (xq.astype(np.int64) @ wq.astype(np.int64)).astype(np.float64) \
        * s.astype(np.float64)
    np.testing.assert_allclose(out, golden.astype(np.float32), rtol=1e-6)


def test_qmatmul_fused_int8_out_epilogue(rng):
    """round→+zp→clip→int8 store fused in the kernel must match the reference
    requant semantics (ref: requantize_m4_s, gemm_int8_packn.c:26-41)."""
    M, K, N = 8, 64, 32
    xq = rng.integers(-127, 128, size=(M, K)).astype(np.int8)
    wq = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
    s = (rng.random((N,)) * 0.001 + 0.0005).astype(np.float32)
    bias = rng.standard_normal((N,)).astype(np.float32)
    kw = dict(scale_mode="channel", out_dtype=jnp.int8, epilogue_scale=0.37,
              out_zp=3.0)
    out = np.asarray(quant_matmul(jnp.asarray(xq), jnp.asarray(wq), s, bias,
                                  bm=8, bn=32, bk=64, interpret=True, **kw))
    golden = np.asarray(quant_matmul_ref(xq.astype(np.float32), wq, s, bias,
                                         **kw))
    assert out.dtype == np.int8
    # ties at .5 after the float epilogue may round either way across backends
    assert np.mean(out.astype(np.int32) != golden.astype(np.int32)) < 0.01
    np.testing.assert_allclose(out.astype(np.int32), golden.astype(np.int32),
                               atol=1)


def test_qmatmul_fused_uint8_out_epilogue(rng):
    M, K, N = 8, 64, 32
    x = rng.standard_normal((M, K)).astype(np.float32)
    wq = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
    s = (rng.random((N,)) * 0.001 + 0.0005).astype(np.float32)
    kw = dict(scale_mode="channel", out_dtype=jnp.uint8, epilogue_scale=2.0,
              out_zp=128.0)
    out = np.asarray(quant_matmul(x, jnp.asarray(wq), s, bm=8, bn=32, bk=64,
                                  interpret=True, **kw))
    golden = np.asarray(quant_matmul_ref(x, wq, s, **kw))
    assert out.dtype == np.uint8
    assert out.min() >= 0 and out.max() <= 255
    np.testing.assert_allclose(out.astype(np.int32), golden.astype(np.int32),
                               atol=1)


def test_qconv_uint8_asym_weights_exact(rng):
    """u8 direct path: both activation AND weight zero-points nonzero must be
    exact integer math (shift-by-128 + window-sum correction), incl. depthwise
    groups and padded border windows (ref: the reference's u8 kernels +
    fuse_zp_to_bias, tests/validation_layer/testutil.h)."""
    import torch
    import torch.nn.functional as F
    from csinn2_tpu import ops
    from csinn2_tpu.core.dtypes import Dtype, Layout, QuantScheme
    from csinn2_tpu.core.quant import QuantInfo
    from csinn2_tpu.core.tensor import Tensor

    for group, stride in [(1, 1), (1, 2), (8, 1)]:
        n, cin, h, w_, cout, k = 1, 8, 9, 9, (8 if group == 8 else 12), 3
        xq = rng.integers(0, 256, (n, cin, h, w_)).astype(np.uint8)
        wq = rng.integers(0, 256, (cout, cin // group, k, k)).astype(np.uint8)
        sx, zx = 0.031, 131
        sw = (rng.random(cout) * 0.02 + 0.01).astype(np.float32)
        zw = rng.integers(100, 160, (cout,)).astype(np.int32)
        x_qi = QuantInfo(scale=sx, zero_point=zx, dtype=Dtype.UINT8,
                         scheme=QuantScheme.UINT8_ASYM)
        w_qi = QuantInfo(scale=sw, zero_point=zw, dtype=Dtype.UINT8, axis=0,
                         scheme=QuantScheme.UINT8_ASYM)
        params = ops.Conv2dParams(stride=(stride, stride), pad=(1, 1, 1, 1),
                                  group=group, layout=Layout.NCHW)
        out = ops.conv2d(Tensor(xq, qinfo=x_qi), Tensor(wq, qinfo=w_qi),
                         None, params)
        acc = F.conv2d(torch.tensor(xq.astype(np.float64) - zx),
                       torch.tensor(wq.astype(np.float64)
                                    - zw.reshape(-1, 1, 1, 1)),
                       stride=stride, padding=1, groups=group).numpy()
        golden = acc * (sx * sw.reshape(1, -1, 1, 1))
        np.testing.assert_allclose(np.asarray(out.data, np.float64), golden,
                                   rtol=1e-5, atol=1e-4)


def test_qfc_uint8_asym_weights_exact(rng):
    from csinn2_tpu import ops
    from csinn2_tpu.core.dtypes import Dtype, QuantScheme
    from csinn2_tpu.core.quant import QuantInfo
    from csinn2_tpu.core.tensor import Tensor
    M, K, units = 5, 64, 24
    xq = rng.integers(0, 256, (M, K)).astype(np.uint8)
    wq = rng.integers(0, 256, (units, K)).astype(np.uint8)
    sx, zx = 0.02, 117
    sw = (rng.random(units) * 0.02 + 0.01).astype(np.float32)
    zw = rng.integers(90, 170, (units,)).astype(np.int32)
    x_qi = QuantInfo(scale=sx, zero_point=zx, dtype=Dtype.UINT8,
                     scheme=QuantScheme.UINT8_ASYM)
    w_qi = QuantInfo(scale=sw, zero_point=zw, dtype=Dtype.UINT8, axis=0,
                     scheme=QuantScheme.UINT8_ASYM)
    out = ops.fullyconnected(Tensor(xq, qinfo=x_qi), Tensor(wq, qinfo=w_qi),
                             None, ops.FCParams(units=units))
    golden = ((xq.astype(np.float64) - zx)
              @ (wq.astype(np.float64) - zw.reshape(-1, 1)).T) \
        * (sx * sw.astype(np.float64))
    np.testing.assert_allclose(np.asarray(out.data, np.float64), golden,
                               rtol=1e-5, atol=1e-4)


def test_int16_conv_fc_bit_exact(rng):
    """INT16_SYM conv/FC must ride the s16×s16→s32 integer path and match an
    int64-exact accumulation BIT-FOR-BIT after the f32 epilogue (the f32-
    carrier fallback cannot: s16 products exceed the 24-bit f32 mantissa and
    each accumulation step rounds).  Ref: the reference's int16 GEMM core
    accumulates in int32 the same way (source/c908_opt/gemm_int16_ncxhwx.S);
    README.md:8-16 headlines 16-bit support."""
    import torch
    import torch.nn.functional as F
    from csinn2_tpu import ops
    from csinn2_tpu.core.dtypes import Dtype
    from csinn2_tpu.core.quant import QuantInfo
    from csinn2_tpu.core.tensor import Tensor

    sx, sw = 3.1e-4, 2.7e-4
    qi = lambda s: QuantInfo(scale=s, zero_point=0, dtype=Dtype.INT16,
                             scheme=QuantScheme.INT16_SYM)

    # FC at K=1024: partial sums reach ~1e9 — exact in int32, NOT in f32
    xq = rng.integers(-5000, 5000, (4, 1024)).astype(np.int16)
    wq = rng.integers(-5000, 5000, (32, 1024)).astype(np.int16)
    out = ops.fullyconnected(Tensor(xq, qinfo=qi(sx)), Tensor(wq, qinfo=qi(sw)),
                             None, ops.FCParams(units=32))
    acc = xq.astype(np.int64) @ wq.astype(np.int64).T
    assert np.abs(acc).max() < 2**31          # inside the int32 accumulator
    expected = acc.astype(np.int32).astype(np.float32) \
        * (np.float32(sx) * np.float32(sw))
    np.testing.assert_array_equal(np.asarray(out.data, np.float32), expected)

    # conv2d 3x3, cin=8 (72 taps)
    xq = rng.integers(-5000, 5000, (1, 8, 10, 10)).astype(np.int16)
    wq = rng.integers(-5000, 5000, (16, 8, 3, 3)).astype(np.int16)
    params = ops.Conv2dParams(stride=(1, 1), pad=(1, 1, 1, 1))
    out = ops.conv2d(Tensor(xq, qinfo=qi(sx)), Tensor(wq, qinfo=qi(sw)),
                     None, params)
    acc = F.conv2d(torch.tensor(xq, dtype=torch.float64),
                   torch.tensor(wq, dtype=torch.float64),
                   padding=1).numpy()        # f64 conv is exact at ~1e9
    assert np.abs(acc).max() < 2**31
    expected = acc.astype(np.int64).astype(np.int32).astype(np.float32) \
        * (np.float32(sx) * np.float32(sw))
    np.testing.assert_array_equal(np.asarray(out.data, np.float32), expected)
