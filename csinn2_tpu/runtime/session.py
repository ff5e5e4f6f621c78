"""Session: the user-facing runtime object.

TPU-native re-expression of the csinn session API
(ref: include/csinn/csinn_runtime.h:165-340 — csinn_alloc_session,
csinn_session_init/setup/run/deinit, csinn_set_input/output,
csinn_update_input, csinn_get_output; impl source/nn2/setup.c:153-560).

Lifecycle matches the reference:

    sess = Session(run_mode=RunMode.GRAPH)
    with sess.build():                      # ≈ csinn_session_init + est hooks
        x = sess.input(TensorMeta(...))
        y = ops.conv2d(x, w, b, params)
        sess.set_output(y)
    sess.setup()                            # ≈ csinn_session_setup (jit compile)
    out = sess.run(x_data)                  # ≈ csinn_update_input + session_run

`setup()` replaces GREF's per-node init + ref-count memory planning
(source/graph_ref/setup.c:688-800) with one jax.jit trace: XLA does buffer
assignment, fusion and scheduling.  `run()` replaces the interpreted topo loop
(setup.c:1305) with a single executable launch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from csinn2_tpu.core.dtypes import Api, Dtype, ProfilerLevel, RunMode
from csinn2_tpu.core.tensor import Tensor, TensorMeta
from csinn2_tpu.graph.ir import Graph, Node
from csinn2_tpu.utils import logging as log

_session_stack: List["Session"] = []


def current_session() -> Optional["Session"]:
    return _session_stack[-1] if _session_stack else None


class Session:
    def __init__(self, run_mode: RunMode = RunMode.GRAPH, api: Api = Api.AUTO,
                 compute_dtype=jnp.float32,
                 profiler_level: ProfilerLevel = ProfilerLevel.UNSET,
                 name: str = "sess"):
        self.run_mode = run_mode
        self.api = api
        self.compute_dtype = compute_dtype
        self.profiler_level = profiler_level
        self.name = name
        self.graph = Graph()
        self._compiled = None
        self._consts: Dict[str, Any] = {}
        self._setup_done = False
        self.trace = None           # runtime/profiler.py Tracer when TRACE level
        self.layer_times: Dict[str, float] = {}   # per-layer benchmark (TIMER)
        self._hybrid = None         # graph/partition.py HybridExecutor (HYBRID)
        self._current_device = "accel"   # stamp for recorded nodes
        if profiler_level in (ProfilerLevel.TRACE, ProfilerLevel.ALL):
            from csinn2_tpu.runtime.profiler import Tracer
            self.trace = Tracer(session_name=name)

    # -- build phase ---------------------------------------------------------

    @contextlib.contextmanager
    def build(self):
        """Graph-recording scope: op API calls inside are intercepted
        (the `est` hook analog, ref: csinn_data_structure.h:560)."""
        _session_stack.append(self)
        try:
            yield self
        finally:
            _session_stack.pop()

    def input(self, meta: TensorMeta) -> Tensor:
        """(ref: csinn_set_input / csinn_set_tensor_entry, setup.c:524)."""
        t = Tensor(meta=dataclasses_replace_none(meta), producer=None)
        self.graph.inputs.append(t)
        return t

    def set_output(self, *tensors: Tensor):
        """(ref: csinn_set_output)."""
        self.graph.outputs.extend(tensors)

    @contextlib.contextmanager
    def device_scope(self, device: str):
        """Place ops recorded inside on `device` ("accel" | "host") — the
        per-node device tag driving HYBRID partitioning (ref: node-device
        assignment consumed by shl_subgraph_get_device, subgraph.c:791)."""
        prev, self._current_device = self._current_device, device
        try:
            yield
        finally:
            self._current_device = prev

    def record(self, node: Node):
        node.device = self._current_device
        self.graph.add_node(node)

    @property
    def recording(self) -> bool:
        return self.run_mode in (RunMode.GRAPH, RunMode.HYBRID) and not self._setup_done

    # -- setup / compile -----------------------------------------------------

    def setup(self, donate_inputs: bool = False, sharding=None):
        """Compile the recorded graph into one XLA executable
        (ref: csinn_session_setup → shl_gref_session_setup, setup.c:688)."""
        t0 = time.perf_counter()
        if self.run_mode == RunMode.GRAPH:
            # conv-pair fusion XLA can't do itself (ref: the partitioner-level
            # fusion shl_subgraph_fvisit_fuse, source/graph_ref/subgraph.c:956)
            from csinn2_tpu.graph.fuse import fuse_ds_blocks
            n_fused = fuse_ds_blocks(self.graph)
            if n_fused:
                log.info("%s: fused %d depthwise→pointwise pairs", self.name,
                         n_fused)
        self.graph.topo_check()
        self._consts = self.graph.collect_consts()

        if self.run_mode == RunMode.HYBRID:
            # host/TPU partitioned execution (ref: CSINN_RM_CPU_BASE_HYBRID
            # + shl_subgraph_establish, source/graph_ref/subgraph.c:44)
            from csinn2_tpu.graph.partition import HybridExecutor
            self._hybrid = HybridExecutor(self.graph, self._consts)
            self._compiled = lambda consts, *inputs: self._hybrid.run(inputs)
            self._setup_done = True
            log.info("%s: hybrid setup, %d subgraphs", self.name,
                     len(self._hybrid.subgraphs))
            return self

        trace_hook = None

        def fn(consts, *inputs):
            return self.graph.execute(inputs, consts, trace_hook=trace_hook)

        self._compiled = jax.jit(fn)
        self._setup_done = True
        log.info("%s: setup recorded %d nodes in %.1f ms", self.name,
                 len(self.graph.nodes), (time.perf_counter() - t0) * 1e3)
        return self

    # -- run -----------------------------------------------------------------

    def run(self, *input_arrays, unwrap: bool = True):
        """(ref: csinn_session_run, setup.c:493)."""
        assert self._setup_done, "call setup() first"
        arrays = [a.data if isinstance(a, Tensor) else jnp.asarray(a)
                  for a in input_arrays]
        if self.trace is not None:
            with self.trace.event("session_run", cat="runtime"):
                out = self._compiled(self._consts, *arrays)
                out = jax.block_until_ready(out)
        else:
            out = self._compiled(self._consts, *arrays)
        if unwrap and len(out) == 1:
            return out[0]
        return out

    def run_benchmark(self, *input_arrays, iters: int = 10, warmup: int = 3):
        """Host-loop dispatch-rate timing (ref: session-verb wall-clock,
        setup.c:471-507).  Returns seconds/iter.

        CAUTION: on remote/tunneled accelerators block_until_ready may return
        before the device finishes, so this measures dispatch throughput, not
        execution — use run_benchmark_device for honest device time."""
        arrays = [jax.device_put(a.data if isinstance(a, Tensor) else jnp.asarray(a))
                  for a in input_arrays]
        arrays = jax.block_until_ready(arrays)
        for _ in range(warmup):
            jax.block_until_ready(self._compiled(self._consts, *arrays))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = self._compiled(self._consts, *arrays)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    def run_benchmark_device(self, *input_arrays, iters: int = 50,
                             reps: int = 3) -> float:
        """TRUE per-run device time: execute the graph `iters` times inside
        ONE executable (lax.fori_loop) and force completion by fetching a
        scalar to the host.  Reported as the marginal cost between a long and
        a short loop, so per-dispatch overhead and the final transfer cancel.

        Each input is staged twice and the body indexes the pair by i%2, so
        the body is iteration-dependent and cannot be hoisted out of the loop
        (a +0-style data dependence folds away for integer dtypes — XLA then
        LICMs the whole graph and the loop measures nothing).
        This replaces the reference's warm-up+timer loop (setup.c:1333-1357),
        which assumes synchronous execution — untrue on an async/remote
        accelerator, where a host-side timing loop measures only dispatch."""
        assert self._setup_done, "call setup() first"
        if self._hybrid is not None:     # host subgraphs can't run in-loop
            return self.run_benchmark(*input_arrays, iters=iters)
        arrays = [jax.device_put(jnp.stack([d, d]))
                  for d in (a.data if isinstance(a, Tensor) else jnp.asarray(a)
                            for a in input_arrays)]
        arrays = jax.block_until_ready(arrays)
        consts = self._consts

        def looped(n, consts, *staged):
            def body(i, acc):
                ins = [jax.lax.dynamic_index_in_dim(s, i % 2, 0, keepdims=False)
                       for s in staged]
                outs = self.graph.execute(tuple(ins), consts)
                upd = sum(jnp.sum(o.reshape(-1)[:8].astype(jnp.float32))
                          for o in outs)
                return acc + upd
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        # n is a TRACED argument: one compile serves both loop lengths.  The
        # fori_loop wrapper compiles 50-100x slower than the bare graph on
        # the remote-compile runtime (measured: MobileNetV1-f32 bs128 4.8 s
        # bare vs ~247 s per loop variant), so a static n would double a
        # multi-minute compile for nothing.
        jfn = jax.jit(looped)
        base = max(iters // 16, 1)

        def fetch(n):
            t0 = time.perf_counter()
            float(np.asarray(jfn(jnp.int32(n), consts, *arrays)))
            return time.perf_counter() - t0

        fetch(base)            # compile (shared by both lengths)
        t_short = min(fetch(base) for _ in range(reps))
        t_long = min(fetch(base + iters) for _ in range(reps))
        return max(t_long - t_short, 1e-12) / iters

    def dump_outputs(self, *input_arrays, out_dir: str = "/tmp/csinn2_tpu_dump"):
        """Per-layer output dump — the DUMP profiler level (ref:
        shl_dump_output_tensor invoked per node under
        CSINN_PROFILER_LEVEL_DUMP, source/graph_ref/setup.c:1358-1372).
        Writes one .npy per node output; returns {filename: shape}."""
        import os
        import numpy as np
        os.makedirs(out_dir, exist_ok=True)
        arrays = [jnp.asarray(a.data if isinstance(a, Tensor) else a)
                  for a in input_arrays]

        taps = [(f"{i:03d}_{n.name}_out{j}", t)
                for i, n in enumerate(self.graph.nodes)
                for j, t in enumerate(n.outputs)]

        # tap every node output by running the graph once with all outputs
        saved_outputs = list(self.graph.outputs)
        self.graph.outputs = [t for _, t in taps]
        try:
            vals = jax.jit(lambda c, *i: self.graph.execute(i, c))(
                self._consts or self.graph.collect_consts(), *arrays)
        finally:
            self.graph.outputs = saved_outputs
        written = {}
        for (name, _), v in zip(taps, vals):
            path = os.path.join(out_dir, name + ".npy")
            np.save(path, np.asarray(v))
            written[name + ".npy"] = tuple(np.asarray(v).shape)
        return written

    def run_layer_benchmark(self, *input_arrays, iters: int = 5):
        """Per-layer timing report (ref: SHL_LAYER_BENCHMARK timer loop,
        source/graph_ref/setup.c:1333-1357)."""
        from csinn2_tpu.runtime.profiler import LayerBenchmark
        results = LayerBenchmark(self).run(*input_arrays, iters=iters)
        self.layer_times = results
        return results

    def update_const(self, tensor: Tensor, new_data):
        """Swap a weight without recompiling (ref: csinn_update_input re-points
        data, source/graph_ref/setup.c:51-56).

        Also refreshes any AOT '__zp_wsum__' per-channel weight-sum const
        (appended by ops/api._zp_sumw_tensor for integer convs with nonzero
        activation zero-point) in nodes consuming this tensor as a weight —
        otherwise the zp correction would silently keep the OLD weight's sums."""
        from csinn2_tpu.graph.ir import _const_key
        key = _const_key(tensor)
        assert key in self._consts, "tensor is not a bound constant"
        self._consts[key] = jnp.asarray(new_data)
        self._refresh_zp_wsum(tensor, new_data)

    def _refresh_zp_wsum(self, tensor: Tensor, new_data):
        import numpy as np
        from csinn2_tpu.graph.ir import _const_key
        from csinn2_tpu.kernels.qconv import precompute_zp_wsum
        from csinn2_tpu.ops.api import _w_layout
        for node in self.graph.nodes:
            if not node.inputs or len(node.inputs) < 2:
                continue
            last = node.inputs[-1]
            if not isinstance(last, Tensor) or \
                    getattr(last.meta, "name", "") != "__zp_wsum__":
                continue
            if any(t is tensor for t in node.inputs[:-1]):
                wsum = precompute_zp_wsum(np.asarray(new_data),
                                          w_layout=_w_layout(node.inputs[1]))
                skey = _const_key(last)
                if skey in self._consts:
                    self._consts[skey] = jnp.asarray(wsum)

    # -- introspection -------------------------------------------------------

    def export_json(self) -> str:
        """(ref: shl_export_model_json, source/utils/export.c:24)."""
        from csinn2_tpu.runtime.export import graph_to_json
        return graph_to_json(self.graph)


def dataclasses_replace_none(meta: TensorMeta) -> TensorMeta:
    return meta
