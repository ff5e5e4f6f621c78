#!/usr/bin/env python
"""Per-layer MobileNetV1-INT8 profile on the real chip (VERDICT item 6).

Each graph node is timed STANDALONE with the same device-loop marginal
methodology as bench.py (lax.fori_loop inside one executable, long-minus-
short).  Standalone per-layer cost ignores cross-layer XLA fusion, so the
sum can exceed the fused whole-graph time — but it attributes time to ops
honestly and exposes which layers sit at the HBM roofline.

Output: a table sorted by cost with achieved GB/s (activation+weight bytes
/ time) and achieved int8 TOPS per layer, plus totals.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from csinn2_tpu.core.dtypes import QuantScheme

BATCH = 128
HBM_GBPS = 819.0   # v5e HBM: 763 GiB/s = 819 GB/s
INT8_TOPS = 394.0


def build_model(name: str):
    """v1|v2|v3|resnet50 → (model, default scheme)."""
    from csinn2_tpu.models.mobilenet import (MobileNetV1, MobileNetV2,
                                             MobileNetV3)
    from csinn2_tpu.models.resnet import ResNet50
    return {
        "v1": (MobileNetV1, QuantScheme.INT8_SYM),
        "v2": (MobileNetV2, QuantScheme.UINT8_ASYM),
        "v3": (MobileNetV3, QuantScheme.INT8_SYM),
        "resnet50": (ResNet50, QuantScheme.INT8_SYM),
    }[name]


def device_time(fn, args, iters=96, reps=4):
    """Marginal device seconds/call of fn(*args) via fori_loop delta.
    Checksum is the FULL-output sum (a [:8] slice checksum lets XLA DCE
    whole output channels — see examples/llm_profile.py); the loop count is
    a traced argument so one compile serves both lengths."""
    staged = [jax.device_put(jnp.stack([a, a])) for a in args]
    staged = jax.block_until_ready(staged)

    @jax.jit
    def jfn(n, *st):
        def body(i, acc):
            ins = [jax.lax.dynamic_index_in_dim(s, i % 2, 0, keepdims=False)
                   for s in st]
            out = fn(*ins)
            if isinstance(out, (tuple, list)):
                out = out[0]
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    base = 3

    def fetch(n):
        t0 = time.perf_counter()
        float(np.asarray(jfn(jnp.int32(n), *staged)))
        return time.perf_counter() - t0

    fetch(base); fetch(base + iters)
    t_s = min(fetch(base) for _ in range(reps))
    t_l = min(fetch(base + iters) for _ in range(reps))
    return max(t_l - t_s, 1e-12) / iters


def node_macs(node):
    """Conv/FC MAC count from shapes (0 for memory ops)."""
    op = node.name.split(":")[0] if ":" in node.name else node.name
    try:
        out = node.outputs[0].meta.shape
        if "conv" in node.name or "fc" in node.name or "pw" in node.name \
                or "dw" in node.name:
            w = node.inputs[1].meta.shape
            if len(w) == 4:               # [O, I/g, kh, kw]
                return int(np.prod(out)) * int(np.prod(w[1:]))
            if len(w) == 2:               # [O, I]
                return int(np.prod(out)) * w[1]
    except Exception:
        pass
    return 0


def node_bytes(node):
    n = 0
    for t in list(node.inputs) + list(node.outputs):
        try:
            n += int(np.prod(t.meta.shape)) * t.meta.dtype.bytes
        except Exception:
            pass
    return n


def main():
    import argparse
    global BATCH
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="v1",
                    choices=["v1", "v2", "v3", "resnet50"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--scheme", default=None,
                    help="override quant scheme (e.g. int8_sym, uint8_asym)")
    args = ap.parse_args()
    BATCH = args.batch
    cls, scheme = build_model(args.model)
    if args.scheme:
        scheme = QuantScheme(args.scheme)
    print(f"# backend: {jax.default_backend()}  model={args.model} "
          f"scheme={scheme.value} bs={BATCH}", file=sys.stderr)
    model = cls(input_size=224)
    rng = np.random.default_rng(0)
    x1 = rng.random(model.input_shape(1)).astype(np.float32)
    xb = rng.random(model.input_shape(BATCH)).astype(np.float32)
    model.calibrate(x1)
    sess = model.build_session(scheme, batch=BATCH)
    xin = model.prepare_input(xb, sess)
    y = sess.run(xin)
    whole = device_time(lambda x: sess.graph.execute((x,), sess._consts)[0],
                        [jnp.asarray(xin)], iters=32)
    print(f"# whole graph: {whole*1e3:.3f} ms -> {BATCH/whole:.0f} img/s",
          file=sys.stderr)

    from csinn2_tpu.graph.ir import _const_key
    graph = sess.graph
    consts = sess._consts

    # run once to collect every node's concrete inputs
    env = {}
    for t, arr in zip(graph.inputs, [jnp.asarray(xin)]):
        env[id(t)] = arr
    node_inputs = []
    for node in graph.nodes:
        args = []
        for t in node.inputs:
            if id(t) in env:
                args.append(env[id(t)])
            else:
                args.append(jnp.asarray(consts.get(_const_key(t), t.data)))
        node_inputs.append(args)
        res = node.exec_fn(args)
        if not isinstance(res, (tuple, list)):
            res = (res,)
        for t, r in zip(node.outputs, res):
            env[id(t)] = r

    rows = []
    for node, args in zip(graph.nodes, node_inputs):
        t0 = time.perf_counter()
        # close over weights (consts); loop only over the activation input
        act = args[0]
        rest = args[1:]
        dt = device_time(lambda a, _n=node, _r=rest: _n.exec_fn([a] + list(_r)),
                         [act])
        rows.append((node.name, dt, node_bytes(node), node_macs(node)))
        print(f"#   {node.name:32s} {dt*1e6:9.1f} us  "
              f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)

    total = sum(r[1] for r in rows)
    print(f"\n{'layer':32s} {'us':>9s} {'%':>6s} {'GB/s':>6s} {'TOPS':>6s} bound")
    for name, dt, nb, mc in sorted(rows, key=lambda r: -r[1]):
        bw = nb / dt / 1e9
        tops = 2 * mc / dt / 1e12
        bound = "BW" if bw / HBM_GBPS > tops / INT8_TOPS else "MAC"
        frac = max(bw / HBM_GBPS, tops / INT8_TOPS)
        print(f"{name:32s} {dt*1e6:9.1f} {dt/total*100:6.1f} {bw:6.0f} "
              f"{tops:6.1f} {bound} ({frac*100:.0f}% of peak)")
    print(f"\nsum(standalone) {total*1e3:.3f} ms | whole-graph {whole*1e3:.3f} ms"
          f" -> {BATCH/whole:.0f} img/s bs{BATCH}")


if __name__ == "__main__":
    main()
