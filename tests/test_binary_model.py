"""Native CTBM binary-model serializer tests (the .bm analog,
ref: source/nn2/format.c + graph_ref/setup.c:929-977)."""

import numpy as np
import pytest

from csinn2_tpu.runtime.bm import BinaryModel, load_bm, save_bm, _load_lib


pytestmark = pytest.mark.skipif(_load_lib() is None,
                                reason="native toolchain unavailable")


def test_roundtrip(tmp_path, rng):
    tensors = {
        "w1": rng.standard_normal((64, 32)).astype(np.float32),
        "q8": rng.integers(-128, 128, (1000,)).astype(np.int8),
        "scales": rng.random((5, 7)).astype(np.float16),
        "ids": np.arange(17, dtype=np.int64),
    }
    p = str(tmp_path / "model.ctbm")
    save_bm(p, tensors)
    back = load_bm(p)
    assert set(back) == set(tensors)
    for k in tensors:
        assert back[k].dtype == tensors[k].dtype
        assert back[k].shape == tensors[k].shape
        np.testing.assert_array_equal(back[k], tensors[k])


def test_sections_aligned(tmp_path, rng):
    p = str(tmp_path / "a.ctbm")
    save_bm(p, {"a": np.ones(3, np.float32), "b": np.zeros(5, np.int8)})
    raw = open(p, "rb").read()
    assert raw[:10] == b"CTBM.TPUv1"
    with BinaryModel(p) as bm:
        t = bm.tensors()
        assert t["a"].shape == (3,) and t["b"].shape == (5,)
        # zero-copy views are read-only
        with pytest.raises(ValueError):
            t["a"][0] = 9


def test_bad_file_rejected(tmp_path):
    p = str(tmp_path / "junk.ctbm")
    with open(p, "wb") as f:
        f.write(b"not a model" * 1000)
    with pytest.raises(IOError):
        BinaryModel(p)


def test_llm_save_load_roundtrip(tmp_path):
    from csinn2_tpu.llm.config import LlamaConfig
    from csinn2_tpu.llm.json_io import load_llm, save_llm
    from csinn2_tpu.llm.model import FLOAT, Q8_0, init_params, quantize_params
    import jax.numpy as jnp

    cfg = LlamaConfig.tiny()
    params = quantize_params(init_params(cfg, FLOAT, seed=3), Q8_0)
    path = str(tmp_path / "llm")
    save_llm(path, cfg, params)
    cfg2, params2 = load_llm(path)
    assert cfg2 == cfg
    assert len(params2["layers"]) == cfg.n_layers
    assert params2["layers"][0]["wq"].mode == Q8_0
    np.testing.assert_array_equal(np.asarray(params2["layers"][0]["wq"].values),
                                  np.asarray(params["layers"][0]["wq"].values))
    # bf16 embedding survives
    assert params2["tok_embedding"].dtype == jnp.bfloat16


# -- load_model: the deployment half (csinn_import_binary_model analog) --------

def _build_float_session(rng):
    from csinn2_tpu import ops
    from csinn2_tpu.core.dtypes import Dtype, RunMode
    from csinn2_tpu.core.tensor import Tensor, TensorMeta
    from csinn2_tpu.runtime.session import Session
    w1 = rng.standard_normal((8, 4, 3, 3)).astype(np.float32) * 0.3
    w2 = rng.standard_normal((4, 8, 1, 1)).astype(np.float32) * 0.3
    sess = Session(run_mode=RunMode.GRAPH)
    with sess.build():
        x = sess.input(TensorMeta(shape=(1, 4, 8, 8), dtype=Dtype.FLOAT32))
        h = ops.conv2d(x, Tensor(w1), None,
                       ops.Conv2dParams(pad=(1, 1, 1, 1), name="c1"))
        h = ops.relu(h)
        y = ops.conv2d(h, Tensor(w2), None, ops.Conv2dParams(name="c2"))
        sess.set_output(y)
    sess.setup()
    return sess


def test_load_model_float_roundtrip(tmp_path, rng):
    """save_model → load_model must reconstruct a runnable Session whose
    outputs match the original (ref: csinn_import_binary_model,
    source/nn2/format.c:1304 → shl_gref_load_binary_model)."""
    from csinn2_tpu.runtime.export import load_model, save_model
    sess = _build_float_session(rng)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    want = np.asarray(sess.run(x))
    path = str(tmp_path / "model")
    save_model(sess, path)
    sess2 = load_model(path)
    got = np.asarray(sess2.run(x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert len(sess2.graph.nodes) == len(sess.graph.nodes)


def test_load_model_aot_skips_retrace(tmp_path, rng):
    """With compiled.bin present, load_model attaches the AOT executable."""
    from csinn2_tpu.runtime.export import load_model, save_model
    sess = _build_float_session(rng)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    want = np.asarray(sess.run(x))
    path = str(tmp_path / "model_aot")
    save_model(sess, path, aot=True)
    import os
    assert os.path.exists(os.path.join(path, "compiled.bin"))
    sess2 = load_model(path)
    got = np.asarray(sess2.run(x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_load_model_quantized_graph(tmp_path, rng):
    """Quantized graph (int8 carriers between nodes, per-channel weight quant)
    must round-trip through the manifest: full scale arrays, out_qinfo,
    mem_type."""
    from csinn2_tpu import ops
    from csinn2_tpu.core.dtypes import Dtype, RunMode
    from csinn2_tpu.core.quant import observe, quantize
    from csinn2_tpu.core.tensor import Tensor, TensorMeta, from_float
    from csinn2_tpu.runtime.export import load_model, save_model
    from csinn2_tpu.runtime.session import Session

    x_np = rng.standard_normal((1, 4, 6, 6)).astype(np.float32)
    w_np = rng.standard_normal((8, 4, 3, 3)).astype(np.float32) * 0.2
    x_qi = observe(x_np, Dtype.INT8, symmetric=True)
    w_t = from_float(w_np, observe(w_np, Dtype.INT8, symmetric=True, axis=0))
    g = ops.conv2d(Tensor(x_np), Tensor(w_np), None,
                   ops.Conv2dParams(pad=(1, 1, 1, 1)))
    out_qi = observe(ops.relu(g).numpy(), Dtype.INT8, symmetric=True)

    sess = Session(run_mode=RunMode.GRAPH)
    with sess.build():
        x = sess.input(TensorMeta(shape=(1, 4, 6, 6), dtype=Dtype.INT8,
                                  qinfo=x_qi))
        h = ops.conv2d(x, w_t, None, ops.Conv2dParams(pad=(1, 1, 1, 1)),
                       out_qinfo=out_qi)
        y = ops.relu(h, out_qinfo=out_qi)
        sess.set_output(y)
    sess.setup()
    xq = np.asarray(quantize(x_np, x_qi))
    want = np.asarray(sess.run(xq))

    path = str(tmp_path / "qmodel")
    save_model(sess, path)
    sess2 = load_model(path)
    got = np.asarray(sess2.run(xq))
    assert got.dtype == np.int8
    np.testing.assert_array_equal(got, want)


def test_load_model_mobilenet(tmp_path, rng):
    """End-to-end: quantized MobileNetV1 (small) survives save→load→run."""
    from csinn2_tpu.core.dtypes import QuantScheme
    from csinn2_tpu.models.mobilenet import MobileNetV1
    from csinn2_tpu.runtime.export import load_model, save_model
    model = MobileNetV1(input_size=32)
    x = rng.random(model.input_shape(1)).astype(np.float32)
    model.calibrate(x)
    sess = model.build_session(QuantScheme.INT8_SYM, batch=1)
    xq = model.prepare_input(x, sess)
    want = np.asarray(sess.run(xq))
    path = str(tmp_path / "mbn")
    save_model(sess, path)
    sess2 = load_model(path)
    got = np.asarray(sess2.run(xq))
    np.testing.assert_array_equal(got, want)
