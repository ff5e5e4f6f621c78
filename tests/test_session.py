"""Graph-mode session tests — the analog of tests/validation_graph/
(build graph via op API interception, setup=jit, run)."""

import numpy as np
import jax.numpy as jnp

from csinn2_tpu import ops
from csinn2_tpu.core.dtypes import Dtype, Layout, RunMode
from csinn2_tpu.core.quant import observe
from csinn2_tpu.core.tensor import Tensor, TensorMeta, from_float
from csinn2_tpu.runtime.session import Session
from csinn2_tpu.utils.verify import verify


def test_session_two_layer_graph(rng):
    x_np = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
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
    out = sess.run(x_np)

    # golden: eager layer mode
    g = ops.conv2d(Tensor(x_np), Tensor(w1), None, ops.Conv2dParams(pad=(1, 1, 1, 1)))
    g = ops.relu(g)
    g = ops.conv2d(g, Tensor(w2), None, ops.Conv2dParams())
    assert verify(np.asarray(out), g.numpy(), tol=1e-5).passed
    assert len(sess.graph.nodes) == 3


def test_session_multi_output(rng):
    x_np = rng.standard_normal((2, 6)).astype(np.float32)
    sess = Session(run_mode=RunMode.GRAPH)
    with sess.build():
        x = sess.input(TensorMeta(shape=(2, 6), dtype=Dtype.FLOAT32))
        a = ops.relu(x)
        b = ops.sigmoid(x)
        sess.set_output(a, b)
    sess.setup()
    oa, ob = sess.run(x_np, unwrap=False)
    assert np.allclose(np.asarray(oa), np.maximum(x_np, 0))
    assert np.allclose(np.asarray(ob), 1 / (1 + np.exp(-x_np)), atol=1e-5)


def test_session_quantized_graph(rng):
    """int8 graph: quantized tensors flow between nodes as int carriers."""
    x_np = rng.standard_normal((1, 4, 6, 6)).astype(np.float32)
    w_np = rng.standard_normal((8, 4, 3, 3)).astype(np.float32) * 0.2

    x_qi = observe(x_np, Dtype.INT8, symmetric=True)
    w_t = from_float(w_np, observe(w_np, Dtype.INT8, symmetric=True, axis=0))

    # golden float
    g = ops.conv2d(Tensor(x_np), Tensor(w_np), None, ops.Conv2dParams(pad=(1, 1, 1, 1)))
    g = ops.relu(g).numpy()
    out_qi = observe(g, Dtype.INT8, symmetric=True)

    sess = Session(run_mode=RunMode.GRAPH)
    with sess.build():
        x = sess.input(TensorMeta(shape=(1, 4, 6, 6), dtype=Dtype.INT8, qinfo=x_qi))
        h = ops.conv2d(x, w_t, None, ops.Conv2dParams(pad=(1, 1, 1, 1)), out_qinfo=out_qi)
        y = ops.relu(h, out_qinfo=out_qi)
        sess.set_output(y)
    sess.setup()
    from csinn2_tpu.core.quant import quantize, dequantize
    out = sess.run(np.asarray(quantize(x_np, x_qi)))
    assert np.asarray(out).dtype == np.int8
    r = verify(np.asarray(dequantize(out, out_qi)), g, tol=0.1, min_cosine=0.99)
    assert r.passed, r


def test_session_update_const(rng):
    x_np = rng.standard_normal((2, 4)).astype(np.float32)
    w = rng.standard_normal((3, 4)).astype(np.float32)
    wt = Tensor(w)
    sess = Session(run_mode=RunMode.GRAPH)
    with sess.build():
        x = sess.input(TensorMeta(shape=(2, 4), dtype=Dtype.FLOAT32))
        y = ops.fullyconnected(x, wt, None, ops.FCParams(units=3))
        sess.set_output(y)
    sess.setup()
    out1 = np.asarray(sess.run(x_np))
    assert np.allclose(out1, x_np @ w.T, atol=1e-5)
    w2 = rng.standard_normal((3, 4)).astype(np.float32)
    sess.update_const(wt, w2)  # no retrace
    out2 = np.asarray(sess.run(x_np))
    assert np.allclose(out2, x_np @ w2.T, atol=1e-5)


def test_session_export_json(rng):
    import json
    sess = Session(run_mode=RunMode.GRAPH)
    with sess.build():
        x = sess.input(TensorMeta(shape=(1, 8), dtype=Dtype.FLOAT32))
        y = ops.relu(x)
        sess.set_output(y)
    sess.setup()
    doc = json.loads(sess.export_json())
    assert doc["format"] == "csinn2_tpu-graph-v1"
    assert len(doc["nodes"]) == 1 and doc["nodes"][0]["op"] == "relu"


def test_tracer_chrome_json(tmp_path):
    from csinn2_tpu.runtime.profiler import Tracer
    import json
    tr = Tracer("t")
    with tr.event("session_run", cat="runtime"):
        pass
    tr.instant("marker")
    tr.counter("mem", 123.0)
    p = tr.save(str(tmp_path / "trace.json"))
    doc = json.load(open(p))
    phases = {e["ph"] for e in doc["traceEvents"]}
    assert {"X", "i", "C"} <= phases


def test_run_benchmark_device(rng):
    """Device-loop benchmark executes the graph and returns a sane positive
    marginal time (host-loop timing is dispatch-rate only on async runtimes)."""
    from csinn2_tpu import ops
    from csinn2_tpu.core.dtypes import Dtype, RunMode
    from csinn2_tpu.core.tensor import TensorMeta
    from csinn2_tpu.runtime.session import Session

    sess = Session(run_mode=RunMode.GRAPH, name="bench_dev")
    w = rng.standard_normal((64, 64)).astype(np.float32)
    with sess.build():
        x = sess.input(TensorMeta(shape=(8, 64), dtype=Dtype.FLOAT32, name="x"))
        y = ops.fullyconnected(x, Tensor(w), None, ops.FCParams(units=64))
        y = ops.relu(y)
        sess.set_output(y)
    sess.setup()
    xin = rng.standard_normal((8, 64)).astype(np.float32)
    dt = sess.run_benchmark_device(xin, iters=16, reps=2)
    assert 0 < dt < 1.0


def test_topo_check_rejects_misordered_graph(rng):
    """A consumer recorded before its producer must fail setup() with a
    diagnosable error (not a KeyError deep inside jit)."""
    import pytest
    sess = Session(run_mode=RunMode.GRAPH)
    with sess.build():
        x = sess.input(TensorMeta(shape=(2, 4), dtype=Dtype.FLOAT32))
        a = ops.relu(x)
        b = ops.relu(a)
        sess.set_output(b)
    # swap the two nodes: b's producer now runs after b consumes a
    sess.graph.nodes.reverse()
    with pytest.raises(ValueError, match="topologically"):
        sess.setup()


def test_topo_check_rejects_unbound_tensor():
    import pytest
    from csinn2_tpu.graph.ir import Graph, Node
    g = Graph()
    x = Tensor(meta=TensorMeta(shape=(2, 2), dtype=Dtype.FLOAT32, name="in0"))
    g.inputs.append(x)
    phantom = Tensor(meta=TensorMeta(shape=(2, 2), dtype=Dtype.FLOAT32,
                                     name="phantom"))
    out = Tensor(meta=TensorMeta(shape=(2, 2), dtype=Dtype.FLOAT32))
    g.add_node(Node(op="add", inputs=[x, phantom], params=None,
                    exec_fn=lambda args: args[0] + args[1], outputs=[out]))
    g.outputs.append(out)
    with pytest.raises(ValueError, match="unbound"):
        g.topo_check()
