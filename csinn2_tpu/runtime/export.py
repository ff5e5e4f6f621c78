"""Model export: JSON graph dump + serialized deployable model (save & LOAD).

(ref: shl_export_model_json, source/utils/export.c:24 +
export_json_wrapper.cpp — graph→JSON with enum names; and the binary-model
serializer/loader, source/nn2/format.c:23-1333 — csinn_import_binary_model
:1304-1331 → shl_gref_load_binary_model, source/graph_ref/setup.c:929-977,
which reconstructs a runnable session in a fresh process.)

The TPU-native ".bm" analog is `save_model` / `load_model`: a directory with
  manifest.json   — graph structure, op params, quant info (this module)
  weights.npz     — prepacked constant arrays
  compiled.bin    — optional AOT-serialized XLA executable (jax.export);
                    when present, load_model attaches it so run() skips
                    re-tracing (the reference analog: binary_model_op_init
                    skips the weight reorder, thead_rvv/int8/convolution.c:65)
"""

from __future__ import annotations

import dataclasses
import enum
import json
import os
import typing
from typing import Any, Dict, Optional

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


def _qinfo_json(q) -> Optional[dict]:
    """Round-trippable QuantInfo serialization — unlike _jsonable, per-channel
    scale/zero-point arrays are written in full (they must reload exactly)."""
    if q is None:
        return None

    def arr(v):
        a = np.asarray(v)
        return a.tolist() if a.ndim else a.item()

    return {"scale": arr(q.scale), "zero_point": arr(q.zero_point),
            "dtype": q.dtype.value, "axis": q.axis, "scheme": q.scheme.value}


def _qinfo_from_json(d: Optional[dict]):
    if d is None:
        return None
    from csinn2_tpu.core.dtypes import Dtype, QuantScheme
    from csinn2_tpu.core.quant import QuantInfo

    def arr(v, dt):
        return np.asarray(v, dt) if isinstance(v, list) else v

    return QuantInfo(scale=arr(d["scale"], np.float32),
                     zero_point=arr(d["zero_point"], np.int32),
                     dtype=Dtype(d["dtype"]), axis=d["axis"],
                     scheme=QuantScheme(d["scheme"]))


def _extra_json(extra: Optional[dict]) -> Optional[dict]:
    """Serialize call_op's **extra kwargs with explicit enum tags so values
    like w_layout=Layout.OIHW survive the round trip as enums, not strings."""
    if not extra:
        return None

    def enc(v):
        if isinstance(v, enum.Enum):
            return {"__enum__": type(v).__name__, "value": v.value}
        if isinstance(v, (list, tuple)):
            return [enc(x) for x in v]
        return _jsonable(v)

    return {k: enc(v) for k, v in extra.items()}


def _extra_from_json(d: Optional[dict]) -> dict:
    if not d:
        return {}
    from csinn2_tpu.core import dtypes as D

    def dec(v):
        if isinstance(v, dict) and "__enum__" in v:
            return getattr(D, v["__enum__"])(v["value"])
        if isinstance(v, list):
            return [dec(x) for x in v]
        return v

    return {k: dec(v) for k, v in d.items()}


def _params_from_json(type_name: Optional[str], d: Optional[dict]):
    if type_name is None or d is None:
        return None
    from csinn2_tpu.ops import params as P
    cls = getattr(P, type_name)
    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        t = hints.get(f.name)
        if isinstance(t, type) and issubclass(t, enum.Enum) and v is not None:
            v = t(v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def graph_to_json(graph) -> str:
    """(ref: shl_export_model_json).  Carries everything load_model needs to
    rebuild a runnable graph: per-node op/params(+type)/arg-structure/extra
    kwargs/output qinfo, per-tensor meta incl. mem_type and full quant info."""
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
                "mem_type": t.meta.mem_type.value,
                "quant": _qinfo_json(t.qinfo),
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
            "params_type": type(node.params).__name__ if node.params is not None else None,
            "structure": _jsonable(node.structure) if node.structure else None,
            "extra": _extra_json(node.extra),
            "out_qinfo": _qinfo_json(node.out_qinfo),
        })
    doc = {
        "format": "csinn2_tpu-graph-v1",
        "inputs": [tname(t) for t in graph.inputs],
        "outputs": [tname(t) for t in graph.outputs],
        "nodes": nodes,
        "tensors": tensors,
    }
    return json.dumps(doc, indent=1)


def save_model(session, path: str, aot: bool = False):
    """Serialize graph manifest + weights (the .bm analog,
    ref: csinn binary model format.c:23-1333).  aot=True additionally
    AOT-compiles and serializes the executable (compiled.bin) so load_model
    can run without re-tracing."""
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
    if aot:
        import jax
        args = [jax.ShapeDtypeStruct(t.shape, t.dtype.jnp)
                for t in session.graph.inputs]
        fn = lambda consts, *inputs: session.graph.execute(inputs, consts)
        export_aot(fn, (consts, *args), os.path.join(path, "compiled.bin"))
    return path


def load_model(path: str):
    """Rebuild a runnable Session from a save_model directory in a fresh
    process — the deployment half of the binary model
    (ref: csinn_import_binary_model, source/nn2/format.c:1304-1331 →
    shl_gref_load_binary_model, source/graph_ref/setup.c:929-977).

    Replays each manifest node through the op API (call_op) inside a new
    recording session, binding weights.npz arrays as constants under their
    ORIGINAL keys (TensorMeta.const_key), then setup()s.  If compiled.bin
    exists, the AOT executable is attached so run() skips re-tracing."""
    import jax.numpy as jnp
    from csinn2_tpu.core.dtypes import Dtype, Layout, MemType, RunMode
    from csinn2_tpu.core.tensor import Tensor, TensorMeta
    from csinn2_tpu.ops.api import call_op
    from csinn2_tpu.runtime.session import Session

    with open(os.path.join(path, "manifest.json")) as f:
        doc = json.load(f)
    assert doc.get("format") == "csinn2_tpu-graph-v1", doc.get("format")
    weights = dict(np.load(os.path.join(path, "weights.npz")))

    def meta_from(key, const_key=None):
        td = doc["tensors"][key]
        return TensorMeta(shape=tuple(td["shape"]), dtype=Dtype(td["dtype"]),
                          layout=Layout(td["layout"]),
                          qinfo=_qinfo_from_json(td.get("quant")),
                          name=td.get("name", ""),
                          mem_type=MemType(td.get("mem_type", MemType.DEFAULT.value)),
                          const_key=const_key)

    sess = Session(run_mode=RunMode.GRAPH)
    tmap: Dict[str, Tensor] = {}

    def get_tensor(key):
        if key in tmap:
            return tmap[key]
        ck = "c" + key[1:]            # weights were saved under _const_key(t)
        if ck + ".values" in weights:
            data = (jnp.asarray(weights[ck + ".values"]),
                    jnp.asarray(weights[ck + ".scales"]))
        elif ck in weights:
            data = jnp.asarray(weights[ck])
        else:
            raise KeyError(f"weight {ck} missing from weights.npz")
        t = Tensor(data=data, meta=meta_from(key, const_key=ck))
        tmap[key] = t
        return t

    with sess.build():
        for key in doc["inputs"]:
            tmap[key] = sess.input(meta_from(key))
        for nd in doc["nodes"]:
            params = _params_from_json(nd.get("params_type"), nd.get("params"))
            keys = iter(nd["inputs"])
            structure = nd.get("structure") or ["T"] * len(nd["inputs"])
            tensors = []
            for s in structure:
                if s == "N":
                    tensors.append(None)
                elif s == "T":
                    tensors.append(get_tensor(next(keys)))
                else:                     # ["L", n]
                    tensors.append([get_tensor(next(keys)) for _ in range(s[1])])
            out = call_op(nd["op"], tensors, params,
                          out_qinfo=_qinfo_from_json(nd.get("out_qinfo")),
                          **_extra_from_json(nd.get("extra")))
            outs = out if isinstance(out, tuple) else (out,)
            for k, t in zip(nd["outputs"], outs):
                tmap[k] = t
        sess.set_output(*[tmap[k] for k in doc["outputs"]])
    sess.setup()

    aot_path = os.path.join(path, "compiled.bin")
    if os.path.exists(aot_path):
        exported = load_aot(aot_path)
        sess._compiled = lambda consts, *inputs: exported.call(consts, *inputs)
    return sess


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
