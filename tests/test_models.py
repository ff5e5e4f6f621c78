"""End-to-end CNN model tests: float graph vs eager golden, and INT8/u8
quantized models vs float within the reference accuracy gate (cosine>=0.99)
— the analog of the mobilenet example + validation_graph tests."""

import numpy as np
import pytest

from csinn2_tpu.core.dtypes import Layout, QuantScheme
from csinn2_tpu.core.quant import dequantize
from csinn2_tpu.models.mobilenet import MobileNetV1, MobileNetV2, MobileNetV3
from csinn2_tpu.models.resnet import ResNet50
from csinn2_tpu.utils.verify import verify


def _run_quantized(model, scheme, tol_cos=0.99, batch=1):
    rng = np.random.default_rng(7)
    x = rng.random(model.input_shape(batch)).astype(np.float32) * 2 - 1
    golden = model.forward_f32(x)
    model.calibrate(x)
    sess = model.build_session(scheme, batch=batch)
    out = sess.run(model.prepare_input(x, sess))
    out_np = np.asarray(out)
    if not str(out_np.dtype).startswith("float"):
        # the session's ACTUAL output qinfo (u8 schemes carry internal
        # activations as shifted-s8 — models/common._out_qinfo)
        qi = sess.graph.outputs[0].meta.qinfo \
            or model.recorder.qinfo("fc", scheme)
        out_np = np.asarray(dequantize(out_np, qi))
    r = verify(np.asarray(out_np, np.float32), golden, tol=0.5, min_cosine=tol_cos)
    assert r.cosine_sim >= tol_cos, r
    return sess


def test_mobilenet_v1_f32_graph_matches_eager():
    model = MobileNetV1(input_size=64)   # small spatial for CPU test speed
    rng = np.random.default_rng(3)
    x = rng.random(model.input_shape(1)).astype(np.float32)
    golden = model.forward_f32(x)
    sess = model.build_session(QuantScheme.FLOAT32)
    out = np.asarray(sess.run(x))
    assert verify(out, golden, tol=1e-4).passed
    # 1 conv + 13*(dw+pw) + pool + flatten? + fc (+fused relu6) — sanity on node count
    assert len(sess.graph.nodes) >= 29


def test_mobilenet_v1_int8():
    model = MobileNetV1(input_size=64)
    _run_quantized(model, QuantScheme.INT8_SYM)


def test_mobilenet_v1_bf16():
    model = MobileNetV1(input_size=64)
    rng = np.random.default_rng(7)
    x = rng.random(model.input_shape(1)).astype(np.float32)
    golden = model.forward_f32(x)
    model.calibrate(x)
    sess = model.build_session(QuantScheme.BFLOAT16)
    out = np.asarray(sess.run(x), np.float32)
    r = verify(out, golden, tol=0.5, min_cosine=0.99)
    assert r.cosine_sim >= 0.99, r


def test_mobilenet_v2_uint8_asym():
    model = MobileNetV2(input_size=64)
    _run_quantized(model, QuantScheme.UINT8_ASYM, tol_cos=0.98)


def test_mobilenet_v3_int8():
    model = MobileNetV3(input_size=64)
    _run_quantized(model, QuantScheme.INT8_ASYM_W_SYM, tol_cos=0.98)


@pytest.mark.parametrize("layout", [Layout.NHWC, Layout.NCHW])
def test_resnet50_int8_both_layouts(layout):
    model = ResNet50(input_size=32, layout=layout)
    _run_quantized(model, QuantScheme.INT8_SYM, tol_cos=0.99)


def test_resnet50_layout_parity():
    """NCHW and NHWC must agree (BASELINE config 2 parity requirement)."""
    m1 = ResNet50(input_size=32, layout=Layout.NHWC, seed=5)
    m2 = ResNet50(input_size=32, layout=Layout.NCHW, seed=5)
    rng = np.random.default_rng(11)
    x_nhwc = rng.random((1, 32, 32, 3)).astype(np.float32)
    x_nchw = np.transpose(x_nhwc, (0, 3, 1, 2))
    o1 = m1.forward_f32(x_nhwc)
    o2 = m2.forward_f32(x_nchw)
    assert verify(o1, o2, tol=1e-3).passed
