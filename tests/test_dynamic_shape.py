"""Dynamic-shape sessions: the reference re-infers shapes per run
(sess->dynamic_shape, session_dynamic_infer_shape,
source/graph_ref/setup.c:1007-1121).  The TPU-native equivalent is
per-shape executable caching: the recorded graph is shape-polymorphic and
jax.jit specializes+caches one executable per concrete input shape, while
the LLM engine buckets sequence lengths to bound recompiles
(csinn2_tpu/llm/engine.py _bucket)."""

import numpy as np
import jax.numpy as jnp

from csinn2_tpu.core.dtypes import Dtype, Layout, RunMode
from csinn2_tpu.core.tensor import TensorMeta
from csinn2_tpu.ops import api as ops
from csinn2_tpu.ops import params as P
from csinn2_tpu.runtime.session import Session


def _build_cnn_session():
    sess = Session(run_mode=RunMode.GRAPH, name="dyn")
    with sess.build():
        x = sess.input(TensorMeta(shape=(1, 3, 8, 8), dtype=Dtype.FLOAT32,
                                  layout=Layout.NCHW))
        w = np.ones((4, 3, 3, 3), np.float32) * 0.1
        y = ops.conv2d(x, w, None, P.Conv2dParams(pad=(1, 1, 1, 1)))
        y = ops.relu(y)
        sess.set_output(y)
    return sess.setup()


def test_session_runs_other_shapes(rng):
    """Same executable graph, different batch and spatial dims per run."""
    sess = _build_cnn_session()
    for shape in [(1, 3, 8, 8), (2, 3, 8, 8), (1, 3, 16, 16), (3, 3, 12, 20)]:
        x = rng.standard_normal(shape).astype(np.float32)
        out = np.asarray(sess.run(x))
        assert out.shape == (shape[0], 4, shape[2], shape[3])
        want = np.maximum(
            sum(np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))[
                :, c:c + 1, i:i + shape[2], j:j + shape[3]] * 0.1
                for c in range(3) for i in range(3) for j in range(3)).sum(
                    axis=1, keepdims=True).repeat(4, axis=1), 0.0)
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_llm_bucket_rounding():
    from csinn2_tpu.llm.engine import _bucket
    assert _bucket(1) == 32
    assert _bucket(32) == 32
    assert _bucket(33) == 64
    assert _bucket(2048) == 2048
    assert _bucket(99999) == 2048


def test_prefill_bucket_compile_count():
    """Bucketed prompt lengths must share executables: prompts in the same
    bucket hit the jit cache (≤1 compile per bucket) — the retrace-free
    analog of session_dynamic_infer_shape (ref: source/graph_ref/
    setup.c:1007-1121, re-run per run; here re-compile happens only when the
    bucket changes)."""
    from csinn2_tpu.llm.config import LlamaConfig
    from csinn2_tpu.llm.engine import InferenceEngine
    from csinn2_tpu.llm.model import FLOAT, init_params

    cfg = LlamaConfig.tiny()
    eng = InferenceEngine(cfg, init_params(cfg, FLOAT, seed=0), batch=1,
                          use_pallas=False)
    eng.prefill(0, [1, 2, 3])
    n0 = eng._prefill_fn._cache_size()
    assert n0 == 1, n0
    eng.prefill(0, [4, 5, 6, 7, 8])          # same 32-bucket → cache hit
    eng.prefill(0, list(range(1, 30)))       # still the 32-bucket
    assert eng._prefill_fn._cache_size() == 1
    eng.prefill(0, list(range(1, 40)))       # 64-bucket → one new compile
    assert eng._prefill_fn._cache_size() == 2


def test_decode_scan_bucket_compile_count():
    """decode_steps recompiles only when the kv_bound bucket grows."""
    from csinn2_tpu.llm.config import LlamaConfig
    from csinn2_tpu.llm.engine import InferenceEngine
    from csinn2_tpu.llm.model import FLOAT, init_params

    cfg = LlamaConfig.tiny(max_seq=512)
    eng = InferenceEngine(cfg, init_params(cfg, FLOAT, seed=0), batch=1,
                          use_pallas=False)
    eng.prefill(0, [1, 2, 3])
    eng.decode_steps({0: 1}, n_steps=2)
    assert eng._decode_scan_fn._cache_size() == 1
    eng.decode_steps({0: 2}, n_steps=2)      # same bound bucket → cache hit
    assert eng._decode_scan_fn._cache_size() == 1
