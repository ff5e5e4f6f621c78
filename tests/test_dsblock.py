"""Fused depthwise-separable block (kernels/dsblock.py + graph/fuse.py).

Gates:
  * the Pallas kernel (interpret mode) matches the XLA two-op composition
    bit-for-bit for stride 1 and 2, odd sizes, relu/relu6 variants;
  * a MobileNet-ish int8 session with fusion enabled produces EXACTLY the
    same int8 outputs as with fusion disabled (the pass may not change
    numerics — same contract as the reference's fused-activation op variants,
    ref: CSINN_OP_CONV2D_RELU, csinn_data_structure.h:134-337);
  * the pass fuses the expected number of pairs and skips ineligible ones.
"""

import os

import numpy as np
import pytest

from csinn2_tpu.core.dtypes import Dtype, Layout, QuantScheme
from csinn2_tpu.core.quant import QuantInfo
from csinn2_tpu.core.tensor import TensorMeta
from csinn2_tpu.kernels.dsblock import ds_block_xla, fused_dsconv
from csinn2_tpu.ops.params import Conv2dParams


def _mk_case(rng, H, W, C, O, k=3, per_channel=True):
    x = rng.integers(-128, 128, (2, H, W, C), np.int8)
    w1 = rng.integers(-127, 128, (C, 1, k, k), np.int8)
    w2 = rng.integers(-127, 128, (O, C, 1, 1), np.int8)
    b1 = rng.normal(size=(C,)).astype(np.float32)
    b2 = rng.normal(size=(O,)).astype(np.float32)
    sx = 0.021
    sw1 = (rng.uniform(0.001, 0.01, (C,)).astype(np.float32)
           if per_channel else np.float32(0.004))
    sw2 = rng.uniform(0.001, 0.01, (O,)).astype(np.float32)
    qx = QuantInfo(scale=sx, zero_point=0, dtype=Dtype.INT8,
                   scheme=QuantScheme.INT8_SYM)
    qw1 = QuantInfo(scale=sw1, zero_point=0, dtype=Dtype.INT8, axis=0,
                    scheme=QuantScheme.INT8_SYM)
    qw2 = QuantInfo(scale=sw2, zero_point=0, dtype=Dtype.INT8, axis=0,
                    scheme=QuantScheme.INT8_SYM)
    return x, w1, b1, w2, b2, qx, qw1, qw2, sx, sw1, sw2


@pytest.mark.parametrize("H,W,C,O,stride,k", [
    (16, 16, 8, 16, 1, 3),
    (14, 14, 16, 8, 1, 3),     # W not a multiple of 8 → flatten pad path
    (7, 7, 16, 16, 1, 3),
    (16, 16, 8, 16, 2, 3),
    (14, 14, 8, 8, 2, 3),      # odd-ish W phase split
    (12, 12, 8, 8, 1, 5),      # 5x5 depthwise (MobileNetV3 shape)
    (12, 12, 8, 8, 2, 5),
])
def test_kernel_matches_xla_composition(H, W, C, O, stride, k):
    rng = np.random.default_rng(0)
    x, w1, b1, w2, b2, qx, qw1, qw2, sx, sw1, sw2 = _mk_case(rng, H, W, C, O, k)
    if stride == 1:
        pads = (k // 2,) * 4
    else:
        total = max(k - stride, 0) if H % stride == 0 else max(k - H % stride, 0)
        pads = (total // 2, total - total // 2) * 2
    mid_scale = 6.0 / 255.0
    out_scale, out_zp = 0.04, 0.0

    params = Conv2dParams(stride=(stride, stride), pad=pads, group=C,
                          layout=Layout.NHWC)
    metas = [
        TensorMeta(shape=x.shape, dtype=Dtype.INT8, layout=Layout.NHWC, qinfo=qx),
        TensorMeta(shape=w1.shape, dtype=Dtype.INT8, layout=Layout.OIHW, qinfo=qw1),
        TensorMeta(shape=b1.shape, dtype=Dtype.FLOAT32),
        TensorMeta(shape=w2.shape, dtype=Dtype.INT8, layout=Layout.OIHW, qinfo=qw2),
        TensorMeta(shape=b2.shape, dtype=Dtype.FLOAT32),
    ]
    out_qi = QuantInfo(scale=out_scale, zero_point=out_zp, dtype=Dtype.INT8,
                       scheme=QuantScheme.INT8_SYM)

    golden = np.asarray(ds_block_xla(
        [x, w1, b1, w2, b2], metas, params, out_qi, k=k,
        mid_scale=mid_scale, mid_relu=False, mid_relu6=True,
        pw_relu=False, pw_relu6=True))

    got = np.asarray(fused_dsconv(
        x, np.transpose(w1.reshape(C, k * k)), sx * sw1, b1,
        np.transpose(w2.reshape(O, C)), mid_scale * sw2, b2,
        k=k, stride=stride, pads=tuple(pads), mid_scale=mid_scale,
        mid_relu=False, mid_relu6=True, out_relu=False, out_relu6=True,
        out_scale=out_scale, out_zp=out_zp, out_dtype=np.int8,
        interpret=True))

    assert got.shape == golden.shape
    np.testing.assert_array_equal(got, golden)


def _tiny_model(size=32):
    from csinn2_tpu.models.mobilenet import MobileNetV1
    return MobileNetV1(alpha=0.25, input_size=size)


def test_session_fusion_bit_exact_and_counts(monkeypatch):
    model = _tiny_model()
    rng = np.random.default_rng(1)
    x = rng.random(model.input_shape(2)).astype(np.float32)
    model.calibrate(x)

    # fusion is opt-in (slower than XLA's conv pair on v5e; see fuse.py);
    # isolate from a developer's exported CSINN2_FUSE_DS
    monkeypatch.delenv("CSINN2_FUSE_DS", raising=False)
    monkeypatch.delenv("CSINN2_NO_FUSE_DS", raising=False)
    s_ref = model.build_session(QuantScheme.INT8_SYM, batch=2)
    assert not any(n.op == "ds_block" for n in s_ref.graph.nodes)
    xin = model.prepare_input(x, s_ref)
    ref = np.asarray(s_ref.run(xin))

    model2 = _tiny_model()
    model2.calibrate(x)
    monkeypatch.setenv("CSINN2_FUSE_DS", "1")
    s_fused = model2.build_session(QuantScheme.INT8_SYM, batch=2)
    monkeypatch.delenv("CSINN2_FUSE_DS")
    n_ds = sum(1 for n in s_fused.graph.nodes if n.op == "ds_block")
    assert n_ds == 13, n_ds                     # all 13 separable blocks
    got = np.asarray(s_fused.run(model2.prepare_input(x, s_fused)))
    np.testing.assert_array_equal(got, ref)


def test_fusion_skips_float_and_multiuse():
    """Float graphs and dw outputs with >1 consumer must not fuse."""
    model = _tiny_model()
    s = model._float_session(batch=1)
    assert not any(n.op == "ds_block" for n in s.graph.nodes)


def test_fused_model_save_load_roundtrip(tmp_path, monkeypatch):
    """save_model on a set-up (fused) session replays ds_block through
    call_op on load (ref: csinn_import_binary_model, source/nn2/format.c:1304)."""
    from csinn2_tpu.runtime.export import load_model, save_model
    model = _tiny_model()
    rng = np.random.default_rng(2)
    x = rng.random(model.input_shape(1)).astype(np.float32)
    model.calibrate(x)
    monkeypatch.delenv("CSINN2_NO_FUSE_DS", raising=False)
    monkeypatch.setenv("CSINN2_FUSE_DS", "1")
    sess = model.build_session(QuantScheme.INT8_SYM, batch=1)
    monkeypatch.delenv("CSINN2_FUSE_DS")
    assert any(n.op == "ds_block" for n in sess.graph.nodes)
    xin = model.prepare_input(x, sess)
    ref = np.asarray(sess.run(xin))

    path = str(tmp_path / "mnv1_fused")
    save_model(sess, path)
    loaded = load_model(path)
    got = np.asarray(loaded.run(xin))
    np.testing.assert_array_equal(got, ref)
