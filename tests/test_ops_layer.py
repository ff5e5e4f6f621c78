"""Per-op layer-mode tests against numpy/torch goldens — the analog of
tests/validation_layer/ (ref: convolution.cpp:21-151, testutil.h).

Each test builds the op in eager (LAYER) mode, quantizes inputs where the
scheme demands, runs, dequantizes and compares against a float golden with the
reference's metrics (max-err + cosine >= 0.99, tests/utils/test_utils.c:157)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from csinn2_tpu import ops
from csinn2_tpu.core.dtypes import Dtype, Layout
from csinn2_tpu.core.quant import observe
from csinn2_tpu.core.tensor import Tensor, from_float
from csinn2_tpu.utils.verify import verify


def q8(x, sym=True, axis=None):
    return from_float(x, observe(x, Dtype.INT8, symmetric=sym, axis=axis))


def u8(x, axis=None):
    return from_float(x, observe(x, Dtype.UINT8, symmetric=False, axis=axis))


# ---------------------------------------------------------------------------
# conv2d family vs torch goldens (the python_ref analog)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cfg", [
    # (n, cin, h, w, cout, k, stride, pad, group, dilation)
    (1, 8, 14, 14, 16, 3, 1, 1, 1, 1),      # 3x3 s1 (winograd class)
    (1, 16, 7, 9, 8, 1, 1, 0, 1, 1),        # 1x1 GEMM class
    (2, 8, 10, 10, 16, 3, 2, 1, 1, 1),      # strided im2col class
    (1, 16, 8, 8, 16, 3, 1, 1, 16, 1),      # depthwise
    (1, 8, 9, 9, 12, 3, 1, 2, 2, 2),        # grouped + dilated
])
def test_conv2d_f32_vs_torch(rng, cfg):
    n, cin, h, w, cout, k, s, p, g, d = cfg
    x = rng.standard_normal((n, cin, h, w)).astype(np.float32)
    wgt = rng.standard_normal((cout, cin // g, k, k)).astype(np.float32) * 0.2
    b = rng.standard_normal((cout,)).astype(np.float32)
    golden = F.conv2d(torch.tensor(x), torch.tensor(wgt), torch.tensor(b),
                      stride=s, padding=p, dilation=d, groups=g).numpy()
    params = ops.Conv2dParams(stride=(s, s), pad=(p, p, p, p), dilation=(d, d),
                              group=g, layout=Layout.NCHW)
    out = ops.conv2d(Tensor(x), Tensor(wgt), Tensor(b), params)
    r = verify(out.numpy(), golden, tol=1e-3)
    assert r.passed, r


def test_conv2d_nhwc(rng):
    x = rng.standard_normal((1, 4, 12, 12)).astype(np.float32)
    wgt = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
    golden = F.conv2d(torch.tensor(x), torch.tensor(wgt), padding=1).numpy()
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    params = ops.Conv2dParams(stride=(1, 1), pad=(1, 1, 1, 1), layout=Layout.NHWC)
    out = ops.conv2d(Tensor(x_nhwc, layout=Layout.NHWC), Tensor(wgt), None, params)
    r = verify(np.transpose(out.numpy(), (0, 3, 1, 2)), golden, tol=1e-3)
    assert r.passed, r


def test_conv2d_int8_quant(rng):
    """Quantized conv must match float within the quantization Δ
    (ref gate: 0.99 cosine, tests/autotest/conftest.py:34)."""
    x = rng.standard_normal((1, 8, 14, 14)).astype(np.float32)
    wgt = rng.standard_normal((16, 8, 3, 3)).astype(np.float32) * 0.3
    b = rng.standard_normal((16,)).astype(np.float32)
    golden = F.conv2d(torch.tensor(x), torch.tensor(wgt), torch.tensor(b), padding=1).numpy()
    params = ops.Conv2dParams(stride=(1, 1), pad=(1, 1, 1, 1))
    out_qi = observe(golden, Dtype.INT8, symmetric=True)
    out = ops.conv2d(q8(x), q8(wgt, axis=0), Tensor(b), params, out_qinfo=out_qi)
    assert out.dtype == Dtype.INT8
    # strict elementwise gate: bound = a few output LSBs (accumulated input/
    # weight quant noise over K=72 taps + 0.5 LSB requant rounding)
    tol = float(6 * np.max(out_qi.scale))
    r = verify(np.asarray(out.astype_f32()), golden, tol=tol, min_cosine=0.99)
    assert r.passed and r.cosine_sim > 0.99, r


def test_deconv2d_vs_torch(rng):
    x = rng.standard_normal((1, 4, 7, 7)).astype(np.float32)
    wgt = rng.standard_normal((4, 6, 3, 3)).astype(np.float32)
    golden = F.conv_transpose2d(torch.tensor(x), torch.tensor(wgt), stride=2,
                                padding=1, output_padding=1).numpy()
    params = ops.Deconv2dParams(stride=(2, 2), pad=(1, 1, 1, 1), out_pad=(1, 1))
    out = ops.deconv2d(Tensor(x), Tensor(wgt), None, params)
    r = verify(out.numpy(), golden, tol=1e-3)
    assert r.passed, r


def test_conv1d_vs_torch(rng):
    x = rng.standard_normal((2, 4, 20)).astype(np.float32)
    wgt = rng.standard_normal((8, 4, 5)).astype(np.float32)
    golden = F.conv1d(torch.tensor(x), torch.tensor(wgt), padding=2).numpy()
    params = ops.Conv1dParams(pad=(2, 2))
    out = ops.conv1d(Tensor(x), Tensor(wgt), None, params)
    assert verify(out.numpy(), golden, tol=1e-3).passed


# ---------------------------------------------------------------------------
# linear / pooling / activations
# ---------------------------------------------------------------------------

def test_fullyconnected_int8(rng):
    x = rng.standard_normal((4, 64)).astype(np.float32)
    wgt = rng.standard_normal((32, 64)).astype(np.float32) * 0.2
    b = rng.standard_normal((32,)).astype(np.float32)
    golden = x @ wgt.T + b
    out_qi = observe(golden, Dtype.INT8, symmetric=True)
    out = ops.fullyconnected(q8(x), q8(wgt, axis=0), Tensor(b), ops.FCParams(units=32),
                             out_qinfo=out_qi)
    r = verify(np.asarray(out.astype_f32()), golden, tol=0.2, min_cosine=0.99)
    assert r.passed, r


def test_matmul_transposes(rng):
    a = rng.standard_normal((2, 5, 8)).astype(np.float32)
    b = rng.standard_normal((2, 7, 8)).astype(np.float32)
    golden = a @ np.swapaxes(b, -1, -2)
    out = ops.matmul(Tensor(a), Tensor(b), ops.MatmulParams(trans_b=True))
    assert verify(out.numpy(), golden, tol=1e-4).passed


@pytest.mark.parametrize("mode", ["max", "avg_inc", "avg_exc", "global_avg", "global_max"])
def test_pooling_vs_torch(rng, mode):
    x = rng.standard_normal((1, 4, 11, 11)).astype(np.float32)
    t = torch.tensor(x)
    if mode == "max":
        golden = F.max_pool2d(t, 3, 2, 1).numpy()
        out = ops.maxpool2d(Tensor(x), ops.PoolParams(kernel=(3, 3), stride=(2, 2), pad=(1, 1, 1, 1)))
    elif mode == "avg_inc":
        golden = F.avg_pool2d(t, 2, 2, 0, count_include_pad=True).numpy()
        out = ops.avgpool2d(Tensor(x), ops.PoolParams(kernel=(2, 2), stride=(2, 2), pad=(0, 0, 0, 0),
                                                      count_include_pad=True))
    elif mode == "avg_exc":
        golden = F.avg_pool2d(t, 3, 2, 1, count_include_pad=False).numpy()
        out = ops.avgpool2d(Tensor(x), ops.PoolParams(kernel=(3, 3), stride=(2, 2), pad=(1, 1, 1, 1)))
    elif mode == "global_avg":
        golden = t.mean(dim=(2, 3), keepdim=True).numpy()
        out = ops.global_avgpool2d(Tensor(x))
    else:
        golden = t.amax(dim=(2, 3), keepdim=True).numpy()
        out = ops.global_maxpool2d(Tensor(x))
    assert verify(out.numpy(), golden, tol=1e-4).passed


@pytest.mark.parametrize("name,tfn", [
    ("relu", torch.relu),
    ("relu6", lambda t: torch.clamp(t, 0, 6)),
    ("sigmoid", torch.sigmoid),
    ("silu", F.silu),
    ("erf", torch.erf),
    ("tanh", torch.tanh),
    ("softplus", F.softplus),
    ("gelu", F.gelu),
    ("elu", F.elu),
    ("abs", torch.abs),
    ("exp", torch.exp),
    ("sqrt", lambda t: torch.sqrt(torch.abs(t) + 1)),
])
def test_unary_vs_torch(rng, name, tfn):
    x = rng.standard_normal((3, 17)).astype(np.float32)
    if name == "sqrt":
        golden = tfn(torch.tensor(x)).numpy()
        out = getattr(ops, name)(Tensor(np.abs(x) + 1))
    else:
        golden = tfn(torch.tensor(x)).numpy()
        out = getattr(ops, name)(Tensor(x))
    assert verify(out.numpy(), golden, tol=1e-3).passed


def test_softmax_axis(rng):
    x = rng.standard_normal((4, 10)).astype(np.float32)
    golden = F.softmax(torch.tensor(x), dim=1).numpy()
    out = ops.softmax(Tensor(x), ops.SoftmaxParams(axis=1))
    assert verify(out.numpy(), golden, tol=1e-5).passed


def test_uint8_asym_relu(rng):
    """asymmetric u8 activation path (ref: UINT8_ASYM scheme)."""
    x = rng.standard_normal((64,)).astype(np.float32) * 2
    golden = np.maximum(x, 0)
    xq = u8(x)
    out_qi = observe(golden, Dtype.UINT8)
    out = ops.relu(xq, out_qinfo=out_qi)
    r = verify(np.asarray(out.astype_f32()), golden, tol=0.05, min_cosine=0.99)
    assert r.passed, r


# ---------------------------------------------------------------------------
# norms / reductions / shape ops
# ---------------------------------------------------------------------------

def test_batch_norm_vs_torch(rng):
    x = rng.standard_normal((2, 6, 5, 5)).astype(np.float32)
    mean = rng.standard_normal((6,)).astype(np.float32)
    var = rng.random((6,)).astype(np.float32) + 0.5
    gamma = rng.standard_normal((6,)).astype(np.float32)
    beta = rng.standard_normal((6,)).astype(np.float32)
    golden = F.batch_norm(torch.tensor(x), torch.tensor(mean), torch.tensor(var),
                          torch.tensor(gamma), torch.tensor(beta), eps=1e-5).numpy()
    out = ops.batch_norm(Tensor(x), Tensor(mean), Tensor(var), Tensor(gamma), Tensor(beta),
                         ops.BatchNormParams())
    assert verify(out.numpy(), golden, tol=1e-3).passed


def test_layer_norm_vs_torch(rng):
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    g = rng.standard_normal((16,)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)
    golden = F.layer_norm(torch.tensor(x), (16,), torch.tensor(g), torch.tensor(b)).numpy()
    out = ops.layer_norm(Tensor(x), Tensor(g), Tensor(b), ops.NormParams(axis=-1))
    assert verify(out.numpy(), golden, tol=1e-3).passed


def test_rms_norm_vs_torch(rng):
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    g = rng.standard_normal((16,)).astype(np.float32)
    t = torch.tensor(x)
    golden = (t * torch.rsqrt(t.pow(2).mean(-1, keepdim=True) + 1e-6) * torch.tensor(g)).numpy()
    out = ops.rms_norm(Tensor(x), Tensor(g), ops.NormParams(axis=-1, epsilon=1e-6))
    assert verify(out.numpy(), golden, tol=1e-3).passed


def test_lrn_vs_torch(rng):
    x = rng.standard_normal((1, 8, 4, 4)).astype(np.float32)
    golden = F.local_response_norm(torch.tensor(x), 5, alpha=1e-4, beta=0.75, k=1.0).numpy()
    out = ops.lrn(Tensor(x), ops.LRNParams(range=5, alpha=1e-4 / 5, beta=0.75, bias=1.0))
    assert verify(out.numpy(), golden, tol=1e-3).passed


def test_reduce_ops(rng):
    x = rng.standard_normal((3, 4, 5)).astype(np.float32)
    out = ops.reduce_sum(Tensor(x), ops.ReduceParams(axis=(1,), keepdims=True))
    assert verify(out.numpy(), x.sum(1, keepdims=True), tol=1e-4).passed
    out = ops.reduce_mean(Tensor(x), ops.ReduceParams(axis=(0, 2)))
    assert verify(out.numpy(), x.mean((0, 2)), tol=1e-4).passed
    out = ops.argmax(Tensor(x), ops.ArgParams(axis=2))
    assert (out.numpy() == x.argmax(2)).all()


def test_shape_ops(rng):
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    assert ops.reshape(Tensor(x), ops.ReshapeParams(shape=(6, 4))).shape == (6, 4)
    assert ops.transpose(Tensor(x), ops.TransposeParams(permute=(2, 0, 1))).shape == (4, 2, 3)
    y = ops.concat([Tensor(x), Tensor(x)], ops.ConcatParams(axis=1))
    assert y.shape == (2, 6, 4)
    parts = ops.split(Tensor(x), ops.SplitParams(axis=1, split_index=(1,)))
    assert parts[0].shape == (2, 1, 4) and parts[1].shape == (2, 2, 4)
    s = ops.strided_slice(Tensor(x), ops.StridedSliceParams(begin=(0, 0, 0), end=(2, 3, 4),
                                                            stride=(1, 2, 2)))
    assert s.shape == (2, 2, 2)
    p = ops.pad(Tensor(x), ops.PadParams(pad_before=(0, 1, 0), pad_after=(0, 1, 1)))
    assert p.shape == (2, 5, 5)
    g = ops.gather(Tensor(x), Tensor(np.array([0, 2], np.int32)), ops.GatherParams(axis=2))
    assert g.shape == (2, 3, 2)


def test_depth_space_roundtrip(rng):
    x = rng.standard_normal((1, 16, 4, 4)).astype(np.float32)
    # torch pixel_shuffle == CRD ordering; DCR is the ONNX default
    y = ops.depth_to_space(Tensor(x), ops.DepthToSpaceParams(block_size=2, mode="CRD"))
    golden = F.pixel_shuffle(torch.tensor(x), 2).numpy()
    assert verify(y.numpy(), golden, tol=1e-5).passed
    z = ops.space_to_depth(y, ops.Space2DepthParams(block_size=2))
    assert z.shape == x.shape


def test_resize_bilinear(rng):
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    golden = F.interpolate(torch.tensor(x), size=(16, 16), mode="bilinear",
                           align_corners=False).numpy()
    out = ops.resize(Tensor(x), ops.ResizeParams(mode="bilinear", target_size=(16, 16)))
    assert verify(out.numpy(), golden, tol=1e-2).passed


def test_prelu_vs_torch(rng):
    x = rng.standard_normal((1, 4, 5, 5)).astype(np.float32)
    a = rng.random((4,)).astype(np.float32)
    golden = F.prelu(torch.tensor(x), torch.tensor(a)).numpy()
    out = ops.prelu(Tensor(x), Tensor(a), ops.PReluParams(axis=1))
    assert verify(out.numpy(), golden, tol=1e-5).passed
