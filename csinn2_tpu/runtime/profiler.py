"""Chrome trace-event profiler + per-layer benchmark.

TPU-native re-expression of the reference's trace subsystem
(ref: include/shl_profiler.h:42-70 — event phases B/E/X/i/C, categories
runtime/op/memory/kernel; writer source/utils/shl_profiler.c:283,374 emitting
`model_csinn.trace.<ts>.json`; per-layer timing source/graph_ref/setup.c:1333
with printer source/utils/debug.c:1037-1052).

Two layers here:
  * Tracer — host-side chrome://tracing JSON events around session verbs and
    layers (same file format as the reference, so the same tooling opens it);
  * jax.profiler integration — device-side XPlane traces with per-kernel
    attribution (Pallas kernel names appear directly), the TPU analog of the
    reference's `perf` callback kernel-name attribution (setup.c:1269-1290).
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
from typing import Any, Dict, List, Optional


class TraceEvent:
    __slots__ = ("name", "cat", "ph", "ts", "dur", "args")

    def __init__(self, name, cat, ph, ts, dur=None, args=None):
        self.name, self.cat, self.ph, self.ts, self.dur, self.args = \
            name, cat, ph, ts, dur, args

    def to_dict(self, pid, tid):
        d = {"name": self.name, "cat": self.cat, "ph": self.ph,
             "ts": self.ts, "pid": pid, "tid": tid}
        if self.dur is not None:
            d["dur"] = self.dur
        if self.args:
            d["args"] = self.args
        return d


class Tracer:
    """Collects chrome trace events (phases: X complete, B/E duration,
    i instant, C counter — ref: shl_profiler.h:54-70)."""

    CATEGORIES = ("runtime", "op", "memory", "kernel")  # ref: shl_profiler.h:42-51

    def __init__(self, session_name: str = "model"):
        self.session_name = session_name
        self.events: List[TraceEvent] = []
        self._t0 = time.perf_counter_ns()
        self._lock = threading.Lock()

    def _now_us(self) -> float:
        return (time.perf_counter_ns() - self._t0) / 1e3

    @contextlib.contextmanager
    def event(self, name: str, cat: str = "op", args: Optional[Dict[str, Any]] = None):
        start = self._now_us()
        try:
            yield
        finally:
            dur = self._now_us() - start
            with self._lock:
                self.events.append(TraceEvent(name, cat, "X", start, dur, args))

    def instant(self, name: str, cat: str = "runtime", args=None):
        with self._lock:
            self.events.append(TraceEvent(name, cat, "i", self._now_us(), None, args))

    def counter(self, name: str, value: float, cat: str = "memory"):
        with self._lock:
            self.events.append(TraceEvent(name, cat, "C", self._now_us(), None,
                                          {"value": value}))

    def save(self, path: Optional[str] = None) -> str:
        """Write `model_csinn.trace.<ts>.json` (ref: shl_profiler.c:283)."""
        if path is None:
            path = f"model_csinn.trace.{int(time.time())}.json"
        doc = {
            "traceEvents": [e.to_dict(pid=os.getpid(), tid=0) for e in self.events],
            "displayTimeUnit": "ms",
            "otherData": {"session": self.session_name, "framework": "csinn2_tpu"},
        }
        with open(path, "w") as f:
            json.dump(doc, f)
        return path


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/csinn2_tpu_trace"):
    """Device-side profiling via jax.profiler: XPlane traces with per-kernel
    (incl. Pallas) attribution — open with TensorBoard or xprof."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class LayerBenchmark:
    """Per-layer timing — the device-honest analog of the reference's
    per-node timer loop (SHL_LAYER_BENCHMARK, setup.c:1333-1357).

    Each node is timed STANDALONE: its concrete inputs are captured from one
    eager graph replay, then the node's kernel runs inside a device-side
    fori_loop whose trip count is a TRACED argument (one small compile per
    node — O(N) node-sized compiles, replacing the r3 prefix scheme whose
    k-th compile re-lowered k nodes: O(N²) node-compiles and minutes of
    wall-clock at ResNet-50 scale).  Time is the long-minus-short loop
    marginal with completion forced by a scalar fetch, so async dispatch and
    transfer cancel — host wall-clock over a tunneled runtime measures RPC
    rate, not device time (see Session.run_benchmark_device).

    Standalone per-node cost ignores cross-layer XLA fusion, so the sum can
    exceed the fused whole-graph time — but it attributes time to ops
    honestly (same methodology as examples/mobilenet_profile.py, where it
    located the r3 MobileNetV2-u8 regression).
    """

    def __init__(self, session):
        self.session = session

    @staticmethod
    def _device_time(fn, args, iters: int, reps: int) -> float:
        """Marginal device seconds/call of fn(*args) via a traced-count
        fori_loop (checksum over the FULL output so XLA cannot DCE it)."""
        import numpy as np
        import jax
        import jax.numpy as jnp

        staged = jax.block_until_ready(
            [jax.device_put(jnp.stack([a, a])) for a in args])

        @jax.jit
        def jfn(n, *st):
            def body(i, acc):
                ins = [jax.lax.dynamic_index_in_dim(s, i % 2, 0,
                                                    keepdims=False)
                       for s in st]
                out = fn(*ins)
                if isinstance(out, (tuple, list)):
                    out = out[0]
                return acc + jnp.sum(jnp.asarray(out).astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        base = 3

        def fetch(n):
            t0 = time.perf_counter()
            float(np.asarray(jfn(jnp.int32(n), *staged)))
            return time.perf_counter() - t0

        fetch(base)                     # one compile serves both lengths
        t_s = min(fetch(base) for _ in range(reps))
        t_l = min(fetch(base + iters) for _ in range(reps))
        return max(t_l - t_s, 1e-12) / iters

    def run(self, *input_arrays, iters: int = 48, reps: int = 3,
            min_us: float = 0.0) -> Dict[str, float]:
        """Returns {"<idx> <name>": milliseconds} per node.  min_us skips
        reporting nodes cheaper than the threshold (still measured)."""
        import jax.numpy as jnp
        from csinn2_tpu.graph.ir import _const_key
        graph = self.session.graph
        consts = self.session._consts or graph.collect_consts()
        arrays = [jnp.asarray(a) for a in input_arrays]

        # one eager replay collects every node's concrete inputs
        env: Dict[int, Any] = {}
        for t, arr in zip(graph.inputs, arrays):
            env[id(t)] = arr
        node_inputs = []
        for node in graph.nodes:
            args = [env.get(id(t), None) if id(t) in env
                    else jnp.asarray(consts.get(_const_key(t), t.data))
                    for t in node.inputs]
            # loop the first graph-produced (non-const) input; const-only
            # nodes get act_idx -1 and are timed with all inputs closed over
            act_idx = next((i for i, t in enumerate(node.inputs)
                            if id(t) in env), -1)
            node_inputs.append((args, act_idx))
            res = node.exec_fn(args)
            if not isinstance(res, (tuple, list)):
                res = (res,)
            for t, r in zip(node.outputs, res):
                env[id(t)] = r

        results: Dict[str, float] = {}
        for k, (node, (args, ai)) in enumerate(zip(graph.nodes, node_inputs)):
            if ai < 0:                      # const-only node: nothing to loop
                dt = self._device_time(
                    lambda a, _n=node, _a=args: _n.exec_fn(list(_a)),
                    [jnp.zeros((1,), jnp.float32)], iters=iters, reps=reps)
            else:                           # loop the activation; close over
                rest = args[:ai] + args[ai + 1:]   # weights (stay on device)
                dt = self._device_time(
                    lambda a, _n=node, _r=rest, _i=ai:
                        _n.exec_fn(list(_r[:_i]) + [a] + list(_r[_i:])),
                    [args[ai]], iters=iters, reps=reps)
            if dt * 1e6 >= min_us:
                results[f"{k:3d} {node.name}"] = dt * 1e3
        return results

    def print_report(self, results: Dict[str, float]):
        """(ref: shl_benchmark_layer printer, source/utils/debug.c:1037-1052)."""
        total = sum(results.values())
        print(f"{'layer':<40} {'ms':>10} {'%':>6}")
        for name, ms in sorted(results.items(), key=lambda kv: -kv[1]):
            pct = 100.0 * ms / total if total else 0.0
            print(f"{name:<40} {ms:>10.4f} {pct:>5.1f}%")
        print(f"{'TOTAL (standalone sum)':<40} {total:>10.4f}")
