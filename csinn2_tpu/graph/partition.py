"""Heterogeneous subgraph partitioner + hybrid executor.

TPU-native re-expression of the reference's CPU↔NPU subgraph offload
(ref: source/graph_ref/subgraph.c — shl_subgraph_establish :44-110,
shl_subgraph_fvisit_fuse :956, shl_subgraph_generate :1252,
shl_subgraph_topology_sort :1332, shl_subgraph_rebuild :1346; run mode
CSINN_RM_CPU_BASE_HYBRID, csinn_data_structure.h:122).

The reference DFS-fuses adjacent same-device nodes into CSINN_SUBGRAPH nodes,
then runs NPU subgraphs through their own per-target sessions with the CPU
graph as the hybrid base.  Here the two devices are the TPU ("accel") and the
host CPU ("host"); each fused subgraph compiles to its own jax.jit executable
pinned to its device, and the hybrid executor walks the subgraph DAG in
topological order, transferring only the cut-edge tensors between devices.

Fusion criterion (acyclicity): walking nodes in topological record order, a
node may join the *latest* subgraph of its device iff none of its producers
live in a later subgraph — otherwise it opens a new subgraph.  This keeps
plain list order a valid subgraph topological order (the reference re-sorts
explicitly in shl_subgraph_topology_sort; our record order already is one).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from csinn2_tpu.core.tensor import Tensor
from csinn2_tpu.graph.ir import Graph, Node, _const_key
from csinn2_tpu.utils import logging as log

# Ops that default to host placement when the session doesn't say otherwise —
# data-dependent control flow / effectively-scalar work that XLA-TPU executes
# but a host core runs with far less overhead (the analog of ops an NPU
# rejects via `caps`, falling back to the CPU base graph).
DEFAULT_HOST_OPS = frozenset({"non_max_suppression", "proposal", "shape"})


@dataclasses.dataclass
class Subgraph:
    """One fused same-device region (ref: CSINN_SUBGRAPH node, subgraph.c:44)."""

    device: str
    nodes: List[Node] = dataclasses.field(default_factory=list)
    # resolved at finalize():
    ext_inputs: List[Tensor] = dataclasses.field(default_factory=list)
    outputs: List[Tensor] = dataclasses.field(default_factory=list)
    const_keys: List[str] = dataclasses.field(default_factory=list)
    compiled: Optional[Callable] = None

    def __repr__(self):
        return (f"Subgraph({self.device}, {len(self.nodes)} nodes, "
                f"{len(self.ext_inputs)}→{len(self.outputs)})")


def partition(graph: Graph, device_of: Optional[Callable[[Node], str]] = None
              ) -> List[Subgraph]:
    """Fuse same-device node runs into subgraphs (ref: shl_subgraph_establish).

    Returns subgraphs in a valid topological execution order.
    """
    if device_of is None:
        def device_of(n: Node) -> str:
            if n.device and n.device != "accel":
                return n.device
            return "host" if n.op in DEFAULT_HOST_OPS else "accel"

    subgraphs: List[Subgraph] = []
    producer_sub: Dict[int, int] = {}   # id(tensor) -> producing subgraph index

    for node in graph.nodes:
        dev = device_of(node)
        latest_same = next((i for i in range(len(subgraphs) - 1, -1, -1)
                            if subgraphs[i].device == dev), None)
        max_producer = max((producer_sub[id(t)] for t in node.inputs
                            if isinstance(t, Tensor) and id(t) in producer_sub),
                           default=-1)
        if latest_same is not None and latest_same >= max_producer:
            si = latest_same
        else:
            subgraphs.append(Subgraph(device=dev))
            si = len(subgraphs) - 1
        subgraphs[si].nodes.append(node)
        for t in node.outputs:
            producer_sub[id(t)] = si

    _finalize(graph, subgraphs, producer_sub)
    return subgraphs


def _finalize(graph: Graph, subgraphs: List[Subgraph],
              producer_sub: Dict[int, int]):
    """Resolve each subgraph's cut edges (ext inputs / exported outputs) and
    constant keys (ref: subgraph input/output rewiring, shl_subgraph_rebuild)."""
    input_ids = {id(t) for t in graph.inputs}
    output_ids = {id(t) for t in graph.outputs}

    for si, sg in enumerate(subgraphs):
        local_produced = {id(t) for n in sg.nodes for t in n.outputs}
        seen_in: Dict[int, Tensor] = {}
        const_keys: List[str] = []
        for node in sg.nodes:
            for t in node.inputs:
                if not isinstance(t, Tensor) or id(t) in local_produced:
                    continue
                if id(t) in input_ids or id(t) in producer_sub:
                    seen_in.setdefault(id(t), t)
                elif t.data is not None:
                    key = _const_key(t)
                    if key not in const_keys:
                        const_keys.append(key)
        sg.ext_inputs = list(seen_in.values())
        sg.const_keys = const_keys

        # outputs: produced here and consumed by a later subgraph or the graph
        consumed_later = {id(t)
                          for sj in range(len(subgraphs)) if sj != si
                          for n in subgraphs[sj].nodes
                          for t in n.inputs if isinstance(t, Tensor)}
        sg.outputs = [t for n in sg.nodes for t in n.outputs
                      if id(t) in consumed_later or id(t) in output_ids]


class HybridExecutor:
    """Compile + run a partitioned graph (ref: hybrid base-graph execution,
    CSINN_RM_CPU_BASE_HYBRID; per-NPU-subgraph sessions in shl_subgraph_setup).

    Each subgraph is one jax.jit executable pinned to its device; cut-edge
    arrays are device_put across the boundary (the PCIe-transfer analog)."""

    def __init__(self, graph: Graph, consts: Dict[str, Any],
                 device_of: Optional[Callable[[Node], str]] = None):
        self.graph = graph
        self.consts = consts
        self.subgraphs = partition(graph, device_of)
        self._devices = _resolve_devices()
        for sg in self.subgraphs:
            sg.compiled = self._compile(sg)
        log.info("hybrid: %d subgraphs: %s", len(self.subgraphs),
                 ", ".join(repr(s) for s in self.subgraphs))

    def _compile(self, sg: Subgraph) -> Callable:
        dev = self._devices[sg.device]

        def fn(const_arrays, *ext_arrays):
            env: Dict[int, Any] = {id(t): a for t, a in zip(sg.ext_inputs, ext_arrays)}

            def lookup(t: Tensor):
                if id(t) in env:
                    return env[id(t)]
                key = _const_key(t)
                if key in const_arrays:
                    return const_arrays[key]
                if t.data is not None:
                    return t.data
                raise KeyError(f"unbound tensor {t} in {sg!r}")

            for node in sg.nodes:
                args = [lookup(t) if isinstance(t, Tensor) else t for t in node.inputs]
                result = node.exec_fn(args)
                if not isinstance(result, (tuple, list)):
                    result = (result,)
                for t, r in zip(node.outputs, result):
                    env[id(t)] = r
            return tuple(env[id(t)] for t in sg.outputs)

        with jax.default_device(dev):
            return jax.jit(fn)

    def run(self, input_arrays: Sequence) -> tuple:
        env: Dict[int, Any] = {}
        for t, arr in zip(self.graph.inputs, input_arrays):
            env[id(t)] = jnp.asarray(arr)
        for sg in self.subgraphs:
            dev = self._devices[sg.device]
            consts = {k: self.consts[k] for k in sg.const_keys}
            ext = [jax.device_put(env[id(t)], dev) for t in sg.ext_inputs]
            outs = sg.compiled(consts, *ext)
            for t, o in zip(sg.outputs, outs):
                env[id(t)] = o
        return tuple(env[id(t)] for t in self.graph.outputs)


def _resolve_devices() -> Dict[str, Any]:
    """Map the two logical devices to jax devices.  On a CPU-only host both
    resolve to cpu:0 — the partition/transfer logic still runs (the qemu-style
    CI analog)."""
    host = jax.devices("cpu")[0] if _has_backend("cpu") else jax.devices()[0]
    accel = jax.devices()[0]
    return {"host": host, "accel": accel}


def _has_backend(name: str) -> bool:
    try:
        return bool(jax.devices(name))
    except RuntimeError:
        return False
