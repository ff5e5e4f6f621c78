"""LLM weight persistence: JSON index + CTBM binary blob.

(ref: shl_llm_load_json / shl_llm_save_json, include/llm/shl_llm_json.h:9-10,
source/llm/llm_json.cpp:38-57 — mmap'd weight blob + JSON metadata.)

save_llm(path, cfg, params) writes
  <path>/config.json   — LlamaConfig + per-weight quant mode
  <path>/weights.ctbm  — all arrays via the native 4096-aligned serializer
load_llm(path) reconstructs (cfg, params); int carriers load zero-copy from
the mmap before device transfer.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Tuple

import numpy as np

from csinn2_tpu.llm.config import LlamaConfig
from csinn2_tpu.llm.model import FLOAT, QWeight
from csinn2_tpu.runtime.bm import BinaryModel, save_bm


def _flatten(params) -> Tuple[Dict[str, np.ndarray], Dict[str, str]]:
    arrays: Dict[str, np.ndarray] = {}
    modes: Dict[str, str] = {}

    def put(key, val):
        if isinstance(val, QWeight):
            arrays[key + ".values"] = np.asarray(val.values)
            if val.scales is not None:
                arrays[key + ".scales"] = np.asarray(val.scales)
            modes[key] = f"{val.mode}:packed" if val.packed else val.mode
        else:
            arrays[key] = np.asarray(val)

    put("tok_embedding", params["tok_embedding"])
    put("norm", params["norm"])
    put("output", params["output"])
    for i, lp in enumerate(params["layers"]):
        for k, v in lp.items():
            put(f"layers.{i}.{k}", v)
    return arrays, modes


def save_llm(path: str, cfg: LlamaConfig, params) -> str:
    os.makedirs(path, exist_ok=True)
    arrays, modes = _flatten(params)
    save_bm(os.path.join(path, "weights.ctbm"), arrays)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"config": dataclasses.asdict(cfg), "quant_modes": modes,
                   "format": "csinn2_tpu-llm-v1"}, f, indent=1)
    return path


def load_llm(path: str) -> Tuple[LlamaConfig, dict]:
    import jax.numpy as jnp
    with open(os.path.join(path, "config.json")) as f:
        doc = json.load(f)
    cfg = LlamaConfig(**doc["config"])
    modes = doc["quant_modes"]
    bm = BinaryModel(os.path.join(path, "weights.ctbm"))
    arrays = bm.tensors()   # zero-copy mmap views

    def get(key):
        # np.array copies out of the mmap: jnp.asarray on CPU may alias the
        # buffer zero-copy, which dies when the file is munmap'd below.
        if key in modes:
            mode, _, flag = modes[key].partition(":")
            vals = jnp.asarray(np.array(arrays[key + ".values"]))
            scales = (jnp.asarray(np.array(arrays[key + ".scales"]))
                      if key + ".scales" in arrays else None)
            return QWeight(values=vals, scales=scales, mode=mode,
                           packed=flag == "packed")
        return jnp.asarray(np.array(arrays[key]))

    params = {
        "tok_embedding": get("tok_embedding"),
        "norm": get("norm"),
        "output": get("output"),
        "layers": [],
    }
    # derive each layer's key set from what was actually saved (MoE gate,
    # stacked expert weights, fused wqkv/w13 all round-trip — nothing is
    # dropped by a fixed key list)
    layer_keys: Dict[int, set] = {}
    for name in set(arrays) | set(modes):
        if not name.startswith("layers."):
            continue
        _, idx, key = name.split(".")[:3]
        layer_keys.setdefault(int(idx), set()).add(key)
    for i in sorted(layer_keys):
        params["layers"].append({k: get(f"layers.{i}.{k}")
                                 for k in sorted(layer_keys[i])})
    bm.close()
    return cfg, params
