"""Graph IR: node list + topological executor.

TPU-native re-expression of GREF (ref: include/graph/shl_node.h:22-36 —
shl_node{type, in, out, data}; include/shl_utils.h:43-51 — shl_ref_graph
{input, output, layer_index}; executor shl_gref_session_run,
source/graph_ref/setup.c:1305-1417).

The decisive design change: the reference interprets the node list per run with
per-node malloc/exec/free and ref-count buffer planning
(op_run_init/op_run/op_run_deinit, setup.c:1125-1154).  Here the node list is
*replayed once inside jax.jit* — XLA's buffer assignment replaces the
ref-count memory plan, operator fusion replaces the per-node dispatch, and the
whole graph becomes a single TPU executable.  Shape inference = jax tracing
(no per-op infer_shape table needed).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from csinn2_tpu.core.tensor import Tensor, TensorMeta


@dataclasses.dataclass
class Node:
    """One graph op (ref: struct shl_node, shl_node.h:22-36)."""

    op: str
    inputs: List[Tensor]            # graph edges (symbolic) or constants
    params: Any
    exec_fn: Callable               # (list_of_arrays) -> array or tuple of arrays
    outputs: List[Tensor] = dataclasses.field(default_factory=list)
    name: str = ""
    cb_name: str = ""               # resolved kernel name, for trace attribution
    device: str = "accel"           # placement for HYBRID partitioning
                                    # (ref: per-node device/api in subgraph.c
                                    #  shl_subgraph_get_device :791)
    # replay info for the binary-model load path (runtime/export.load_model —
    # the csinn_import_binary_model analog, ref: source/nn2/format.c:1304):
    # how call_op's positional args map onto the flat `inputs` list, plus the
    # extra kwargs and output quant target of the original call
    structure: Any = None           # sequence of "T" | "N" | ("L", n)
    extra: Any = None               # jsonable kwargs forwarded to the kernel
    out_qinfo: Any = None

    def __repr__(self):
        return f"Node({self.op}:{self.name or id(self) % 9973})"


class Graph:
    """Recorded op graph (ref: struct shl_ref_graph)."""

    def __init__(self):
        self.nodes: List[Node] = []
        self.inputs: List[Tensor] = []
        self.outputs: List[Tensor] = []
        self.consts: Dict[int, jnp.ndarray] = {}   # id(tensor) -> array payloads

    def add_node(self, node: Node):
        self.nodes.append(node)

    # -- execution -----------------------------------------------------------

    def execute(self, input_arrays: Sequence, const_arrays: Dict[str, Any],
                trace_hook: Optional[Callable] = None):
        """Replay the node list (called under jax.jit by the session).

        input_arrays align with self.inputs; const_arrays maps const-tensor key
        → array (weights are jit *arguments*, not baked constants, so the
        executable is reusable across weight updates / donation).
        """
        env: Dict[int, Any] = {}
        for t, arr in zip(self.inputs, input_arrays):
            env[id(t)] = arr

        def lookup(t: Tensor):
            if id(t) in env:
                return env[id(t)]
            key = _const_key(t)
            if key in const_arrays:
                return const_arrays[key]
            if t.data is not None:
                return t.data
            raise KeyError(f"unbound tensor {t}")

        for node in self.nodes:
            args = [lookup(t) if isinstance(t, Tensor) else t for t in node.inputs]
            result = node.exec_fn(args)
            if trace_hook is not None:
                trace_hook(node, result)
            if not isinstance(result, (tuple, list)):
                result = (result,)
            for t, r in zip(node.outputs, result):
                env[id(t)] = r
        return tuple(env[id(t)] for t in self.outputs)

    def collect_consts(self) -> Dict[str, Any]:
        """Gather all constant (data-bearing, non-input) tensors referenced by
        nodes — these become the jitted function's parameter pytree."""
        consts: Dict[str, Any] = {}
        input_ids = {id(t) for t in self.inputs}
        produced = {id(t) for n in self.nodes for t in n.outputs}
        for node in self.nodes:
            for t in node.inputs:
                if isinstance(t, Tensor) and id(t) not in input_ids \
                        and id(t) not in produced and t.data is not None:
                    consts[_const_key(t)] = t.data
        return consts

    def topo_check(self):
        """Validate producer-before-consumer order (the reference topo-sorts in
        shl_subgraph_topology_sort, source/graph_ref/subgraph.c:1332; record
        order here must already be topological — this check turns a mis-ordered
        record into a diagnosable setup error instead of a KeyError deep in
        jit).  Raises ValueError naming the offending node and tensor."""
        produced = {id(t) for n in self.nodes for t in n.outputs}
        seen = {id(t) for t in self.inputs}
        for node in self.nodes:
            for t in node.inputs:
                if not isinstance(t, Tensor) or id(t) in seen:
                    continue
                if id(t) in produced:
                    # an edge produced by a LATER node → use-before-def/cycle
                    raise ValueError(
                        f"graph not topologically ordered: {node} consumes "
                        f"tensor {t.meta.name or id(t)} before its producer runs")
                if t.data is None:
                    raise ValueError(
                        f"{node} consumes unbound tensor "
                        f"{t.meta.name or id(t)} (no producer, no data)")
                # data-bearing constant: fine
            for t in node.outputs:
                seen.add(id(t))
        return True

    def __repr__(self):
        return f"Graph({len(self.nodes)} nodes, {len(self.inputs)} in, {len(self.outputs)} out)"


def _const_key(t: Tensor) -> str:
    # const_key is stamped by the binary-model loader so a reloaded graph's
    # consts pytree keys match the original save (and its AOT executable)
    return t.meta.const_key or f"c{id(t)}"
