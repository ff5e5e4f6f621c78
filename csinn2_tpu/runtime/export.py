"""Model export: JSON graph dump + serialized deployable model.

(ref: shl_export_model_json, source/utils/export.c:24 +
export_json_wrapper.cpp — graph→JSON with enum names; and the binary-model
serializer, source/nn2/format.c + shl_gref_session_setup dump,
source/graph_ref/setup.c:735.)

The TPU-native ".bm" analog is `save_model` / `load_model`: a directory with
  manifest.json   — graph structure, op params, quant info (this module)
  weights.npz     — prepacked constant arrays
  compiled.bin    — optional AOT-serialized XLA executable (jax.export)
"""

from __future__ import annotations

import dataclasses
import enum
import json
import os
from typing import Any, Dict

import numpy as np


def _jsonable(obj: Any):
    if isinstance(obj, enum.Enum):
        return obj.value
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist() if obj.size <= 16 else f"<array {obj.shape} {obj.dtype}>"
    if hasattr(obj, "shape") and hasattr(obj, "dtype"):
        return f"<array {tuple(obj.shape)} {obj.dtype}>"
    return obj


def graph_to_json(graph) -> str:
    """(ref: shl_export_model_json)."""
    tensors = {}
    nodes = []

    def tname(t):
        key = f"t{id(t)}"
        if key not in tensors:
            tensors[key] = {
                "name": t.meta.name or key,
                "shape": list(t.shape),
                "dtype": t.dtype.value,
                "layout": t.layout.value,
                "quant": _jsonable(t.qinfo) if t.qinfo else None,
            }
        return key

    for node in graph.nodes:
        nodes.append({
            "op": node.op,
            "name": node.name,
            "kernel": node.cb_name,
            "inputs": [tname(t) for t in node.inputs if hasattr(t, "meta")],
            "outputs": [tname(t) for t in node.outputs],
            "params": _jsonable(node.params) if node.params is not None else None,
        })
    doc = {
        "format": "csinn2_tpu-graph-v1",
        "inputs": [tname(t) for t in graph.inputs],
        "outputs": [tname(t) for t in graph.outputs],
        "nodes": nodes,
        "tensors": tensors,
    }
    return json.dumps(doc, indent=1)


def save_model(session, path: str):
    """Serialize graph manifest + weights (the .bm analog,
    ref: csinn binary model format.c:23-1333)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        f.write(graph_to_json(session.graph))
    consts = session._consts or session.graph.collect_consts()
    flat: Dict[str, np.ndarray] = {}
    for k, v in consts.items():
        if isinstance(v, tuple):  # block-quant (values, scales)
            flat[k + ".values"] = np.asarray(v[0])
            flat[k + ".scales"] = np.asarray(v[1])
        else:
            flat[k] = np.asarray(v)
    np.savez(os.path.join(path, "weights.npz"), **flat)
    return path


def export_aot(fn, args, path: str):
    """AOT-compile and serialize an executable (the binary-model run-path
    analog: load without re-tracing).  Uses jax.export."""
    from jax import export as jexport
    import jax
    exported = jexport.export(jax.jit(fn))(*args)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_aot(path: str):
    from jax import export as jexport
    with open(path, "rb") as f:
        blob = f.read()
    return jexport.deserialize(blob)
