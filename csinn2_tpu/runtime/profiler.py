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
    """Per-layer timing by running each graph prefix — the jit analog of the
    reference's per-node timer loop (SHL_LAYER_BENCHMARK, setup.c:1333-1357).

    Because XLA fuses the whole graph, true per-layer wall-clock inside one
    executable doesn't exist; this reports (a) cumulative prefix times and
    derived per-layer deltas, which is what the reference's printout shows.
    """

    def __init__(self, session):
        self.session = session

    def run(self, *input_arrays, iters: int = 5) -> Dict[str, float]:
        import jax
        import jax.numpy as jnp
        graph = self.session.graph
        consts = self.session._consts or graph.collect_consts()
        arrays = [jnp.asarray(a) for a in input_arrays]
        results: Dict[str, float] = {}
        prev = 0.0
        for k in range(1, len(graph.nodes) + 1):
            sub_nodes = graph.nodes[:k]
            last = sub_nodes[-1]

            def fn(consts, *inputs, _n=k):
                env = {}
                for t, arr in zip(graph.inputs, inputs):
                    env[id(t)] = arr
                out = None
                from csinn2_tpu.graph.ir import _const_key
                for node in graph.nodes[:_n]:
                    args = []
                    for t in node.inputs:
                        if id(t) in env:
                            args.append(env[id(t)])
                        else:
                            key = _const_key(t)
                            args.append(consts.get(key, t.data))
                    res = node.exec_fn(args)
                    if not isinstance(res, (tuple, list)):
                        res = (res,)
                    for t, r in zip(node.outputs, res):
                        env[id(t)] = r
                    out = res
                return out

            jfn = jax.jit(fn)
            jax.block_until_ready(jfn(consts, *arrays))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = jfn(consts, *arrays)
            jax.block_until_ready(out)
            cum = (time.perf_counter() - t0) / iters * 1e3
            results[f"{k:3d} {last.name}"] = max(cum - prev, 0.0)
            prev = cum
        return results

    def print_report(self, results: Dict[str, float]):
        """(ref: shl_benchmark_layer printer, source/utils/debug.c:1037-1052)."""
        total = sum(results.values())
        print(f"{'layer':<40} {'ms':>10} {'%':>6}")
        for name, ms in results.items():
            pct = 100.0 * ms / total if total else 0.0
            print(f"{name:<40} {ms:>10.4f} {pct:>5.1f}%")
        print(f"{'TOTAL':<40} {total:>10.4f}")
