"""Profiler-level tests: TIMER (per-layer benchmark), DUMP (per-layer tensor
files), TRACE (chrome JSON) — the four levels of the reference's
sess->profiler_level (ref: csinn_data_structure.h:466-475;
tests/profiler/test_trace.c analog)."""

import json
import os

import numpy as np

from csinn2_tpu.core.dtypes import Dtype, Layout, ProfilerLevel, RunMode
from csinn2_tpu.core.tensor import TensorMeta
from csinn2_tpu.ops import api as ops
from csinn2_tpu.ops import params as P
from csinn2_tpu.runtime.session import Session


def _session(profiler_level=ProfilerLevel.UNSET):
    sess = Session(run_mode=RunMode.GRAPH, profiler_level=profiler_level,
                   name="prof")
    with sess.build():
        x = sess.input(TensorMeta(shape=(1, 4, 8, 8), dtype=Dtype.FLOAT32,
                                  layout=Layout.NCHW))
        w = np.random.default_rng(0).standard_normal((8, 4, 3, 3)).astype(np.float32) * 0.2
        y = ops.conv2d(x, w, None, P.Conv2dParams(pad=(1, 1, 1, 1)))
        y = ops.relu(y)
        y = ops.softmax(y, P.SoftmaxParams(axis=1))
        sess.set_output(y)
    return sess.setup()


def test_layer_benchmark_timer(rng):
    sess = _session()
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    results = sess.run_layer_benchmark(x, iters=2)
    assert len(results) == 3                   # conv, relu, softmax
    assert all(ms >= 0 for ms in results.values())
    assert sess.layer_times == results


def test_dump_outputs(tmp_path, rng):
    sess = _session()
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    written = sess.dump_outputs(x, out_dir=str(tmp_path))
    assert len(written) == 3
    for fname, shape in written.items():
        arr = np.load(os.path.join(str(tmp_path), fname))
        assert tuple(arr.shape) == shape
    # last dump equals the session output
    got = np.asarray(sess.run(x))
    last = sorted(written)[-1]
    np.testing.assert_allclose(np.load(os.path.join(str(tmp_path), last)),
                               got, rtol=1e-5, atol=1e-6)


def test_trace_level_writes_chrome_json(tmp_path, rng):
    sess = _session(ProfilerLevel.TRACE)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    sess.run(x)
    path = sess.trace.save(str(tmp_path / "trace.json"))
    doc = json.load(open(path))
    events = doc["traceEvents"] if isinstance(doc, dict) else doc
    assert any(e.get("name") == "session_run" for e in events)
