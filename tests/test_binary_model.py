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
