#!/usr/bin/env python
"""Driver benchmark: CNN configs (MobileNetV1-INT8, ResNet-50-INT8pc,
MobileNetV2-u8) + Llama-2 7B (q8_0, q4_0) and 13B (q4_0) on one TPU chip.

Prints one JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no absolute numbers (BASELINE.md), so vs_baseline is
a measured ratio on the same chip in the same run:
  - mobilenet v1:   speedup over the float32 XLA graph of the same model
  - CNN roofline:   fraction of the graph's analytic HBM/MXU speed-of-light
  - llama decode:   fraction of the HBM weight-read speed-of-light
                    (decode is weight-bound: tok/s ≈ BW / bytes(weights))
  - llama TTFT:     fraction of max(bf16 FLOP bound, weight-read bound)
  - llama batch=8:  decode tokens/s scaling vs batch=1 (continuous batching)

Timing methodology: device-side loops only (lax.fori_loop / lax.scan inside
ONE executable, completion forced by fetching a scalar, long-minus-short
marginal).  Host-side timing is NOT valid on this runtime: dispatch is
asynchronous end-to-end and the tunnel adds a ~23 ms RPC round-trip floor
(measured: a trivial jit dispatch+fetch takes the same 23 ms as a 4k×4k
matmul), so host loops measure RPC rate, not device time.  r2's TTFT of
84.8 ms was host-measured and thus included that RPC floor; from r3 TTFT
uses InferenceEngine.benchmark_prefill_device (the full prefill step —
forward + cache scatter — in a device loop).

Env switches: BENCH_SKIP_LLM=1, BENCH_SKIP_CNN=1, BENCH_SKIP_13B=1 to skip
sections.
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

BATCH = 128  # CNN throughput batch

HBM_GIBPS = 763.0    # v5e spec HBM bandwidth (GiB/s)
BF16_TFLOPS = 197.0  # v5e peak bf16 MXU


def emit(metric, value, unit, vs_baseline):
    print(json.dumps({"metric": metric, "value": round(float(value), 3),
                      "unit": unit, "vs_baseline": round(float(vs_baseline), 3)}))


def _cnn_accuracy_gate(model, sess, scheme, x1):
    """Refuse to report a number for a wrong result (cosine >= 0.99)."""
    import numpy as np
    from csinn2_tpu.core.quant import dequantize
    from csinn2_tpu.utils.verify import cosine_similarity
    golden = model.forward_f32(x1)
    s1 = model.build_session(scheme, batch=1)
    out = np.asarray(s1.run(model.prepare_input(x1, s1)), np.float32)
    if sess is not None and not str(out.dtype).startswith("float"):
        out = out.astype(np.float32)
    qi = model.recorder.qinfo("fc", scheme)
    cs = cosine_similarity(np.asarray(dequantize(out, qi), np.float32), golden)
    print(f"# cosine vs f32: {cs:.5f}", file=sys.stderr)
    assert cs >= 0.99, f"accuracy gate failed: {cs}"
    return s1


def bench_cnn(model, label, scheme, f32_baseline=False):
    """Quantized CNN throughput at bs128 + bs1 latency + roofline fraction.
    (ref: the reference's model mains, example/c906_mobilenetv1_f16.c:1958;
    BASELINE configs 1-3.)"""
    import numpy as np

    rng = np.random.default_rng(0)
    x1 = rng.random(model.input_shape(1)).astype(np.float32)
    xb = rng.random(model.input_shape(BATCH)).astype(np.float32)

    f32_dt = None
    if f32_baseline:
        t0 = time.time()
        fs = model._float_session(batch=BATCH)
        fs.run(xb)  # compile
        f32_dt = fs.run_benchmark_device(xb, iters=32)
        print(f"# {label} f32 bs{BATCH}: {f32_dt/BATCH*1e3:.4f} ms/img "
              f"({BATCH/f32_dt:.0f} img/s) ({time.time()-t0:.0f}s incl "
              f"compile)", file=sys.stderr)

    t0 = time.time()
    model.calibrate(x1)
    sess = model.build_session(scheme, batch=BATCH)
    xin = model.prepare_input(xb, sess)
    sess.run(xin)  # compile
    q_dt = sess.run_benchmark_device(xin, iters=32)
    print(f"# {label} bs{BATCH}: {q_dt/BATCH*1e3:.4f} ms/img "
          f"({BATCH/q_dt:.0f} img/s) ({time.time()-t0:.0f}s incl compile)",
          file=sys.stderr)

    s1 = _cnn_accuracy_gate(model, sess, scheme, x1)
    x1q = model.prepare_input(x1, s1)
    s1.run(x1q)
    lat1 = s1.run_benchmark_device(x1q, iters=32)
    print(f"# {label} bs1 latency: {lat1*1e3:.3f} ms", file=sys.stderr)

    # roofline placement (runtime/roofline.py): these models at bs128 are
    # predominantly HBM-bound, so fraction-of-SOL is the honest anchor
    from csinn2_tpu.runtime.roofline import analyze
    rep = analyze(sess)
    frac = rep.fused_sol_s / q_dt
    n_hbm = sum(1 for c in rep.costs if not c.fusable
                and c.bound(rep.peak_tops, rep.hbm_gbps) == "hbm")
    n_mat = sum(1 for c in rep.costs if not c.fusable)
    print(f"# {label} roofline: fused SOL {rep.fused_sol_s*1e3:.3f} ms vs "
          f"measured {q_dt*1e3:.3f} ms -> {100*frac:.0f}% of SOL "
          f"({n_hbm}/{n_mat} matrix nodes HBM-bound; "
          f"{rep.total_flops/1e9:.0f} GFLOP/batch)", file=sys.stderr)

    emit(f"{label}_224_bs{BATCH}_imgs_per_s", BATCH / q_dt, "img/s",
         (f32_dt / q_dt) if f32_dt else frac)
    emit(f"{label}_bs{BATCH}_roofline_fraction", frac,
         "fraction_of_hbm_sol", frac)


def bench_cnns():
    from csinn2_tpu.core.dtypes import QuantScheme
    from csinn2_tpu.models.mobilenet import MobileNetV1, MobileNetV2
    from csinn2_tpu.models.resnet import ResNet50

    bench_cnn(MobileNetV1(input_size=224), "mobilenet_v1_int8",
              QuantScheme.INT8_SYM, f32_baseline=True)
    gc.collect()
    # BASELINE config 2: INT8 symmetric per-channel weights (NetBuilder
    # quantizes weights per-out-channel; NCHW parity is asserted in
    # tests/test_models.py::test_resnet50_layout_parity)
    bench_cnn(ResNet50(input_size=224), "resnet50_int8",
              QuantScheme.INT8_SYM)
    gc.collect()
    # BASELINE config 3: asymmetric u8 activations
    bench_cnn(MobileNetV2(input_size=224), "mobilenet_v2_u8",
              QuantScheme.UINT8_ASYM)
    gc.collect()


def _weight_bytes(params):
    import numpy as np
    import jax
    total = sum(l.nbytes for l in jax.tree_util.tree_leaves(params))
    n_int8 = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
                 if l.dtype == np.int8)
    return total, n_int8


def bench_llama(cfg, tag, mode, ttft=False, bs8=False, max_seq=None):
    """Llama decode (+ optional TTFT / batch-8) for one (size, quant) config
    (BASELINE configs 4-5 single-chip; ref quantizer:
    source/llm/llama2_quantize.c:25-115)."""
    import dataclasses
    import numpy as np
    import jax
    from csinn2_tpu.llm.engine import InferenceEngine
    from csinn2_tpu.llm.model import init_params_device

    if max_seq:
        cfg = dataclasses.replace(cfg, max_seq_len=max_seq)
    t0 = time.time()
    params = jax.block_until_ready(init_params_device(cfg, mode=mode, seed=0))
    print(f"# {tag} {mode} device init+quant: {time.time()-t0:.0f}s",
          file=sys.stderr)
    tot_bytes, n_int8 = _weight_bytes(params)
    n_params = sum(int(np.prod(l.shape)) * (2 if str(l.dtype) == "int8" and
                                            mode in ("int4", "q4_0") else 1)
                   for l in jax.tree_util.tree_leaves(params)
                   if l.dtype == np.int8)

    eng = InferenceEngine(cfg, params, batch=1, quantized_kv=True)

    if ttft:
        # device-side TTFT (see module docstring: host timing includes the
        # ~23 ms tunnel RPC floor and is invalid for a <20 ms prefill)
        t0 = time.time()
        ttft_s = eng.benchmark_prefill_device(n_prompt=128, iters=8)
        flop_bound = 2.0 * n_params * 128 / (BF16_TFLOPS * 1e12)
        read_bound = tot_bytes / (HBM_GIBPS * 2**30)
        sol = max(flop_bound, read_bound)
        print(f"# {tag} TTFT (device, prompt 128): {ttft_s*1e3:.1f} ms "
              f"(bound {sol*1e3:.1f} ms; bf16-FLOP {flop_bound*1e3:.1f} / "
              f"weight-read {read_bound*1e3:.1f}) "
              f"({time.time()-t0:.0f}s incl compile)", file=sys.stderr)
        emit(f"{tag}_{mode}_ttft_p50_prompt128_ms", ttft_s * 1e3, "ms",
             sol / max(ttft_s, 1e-9))

    tps1 = eng.benchmark_decode_device(iters=128)
    sol = HBM_GIBPS * 2**30 / tot_bytes
    print(f"# {tag} decode bs1: {tps1:.1f} tok/s "
          f"(weight-read SOL {sol:.0f} tok/s → {100*tps1/sol:.0f}%)",
          file=sys.stderr)
    emit(f"{tag}_{mode}_decode_tok_s", tps1, "tok/s", tps1 / sol)

    if bs8:
        # batch-8 continuous batching in one fused scan; cap the KV horizon
        # so 8 lanes of KV fit HBM next to the weights (decode reads the
        # kv_bound-limited window either way)
        import dataclasses as dc
        del eng
        gc.collect()
        cfg8 = dc.replace(cfg, max_seq_len=1024)
        eng8 = InferenceEngine(cfg8, params, batch=8, quantized_kv=True)
        tps8 = eng8.benchmark_decode_device(iters=128)
        print(f"# {tag} decode bs8: {tps8:.1f} tok/s "
              f"({tps8/max(tps1,1e-9):.2f}x bs1)", file=sys.stderr)
        emit(f"{tag}_{mode}_decode_bs8_tok_s", tps8, "tok/s",
             tps8 / max(tps1, 1e-9))
        del eng8
    else:
        del eng
    del params
    gc.collect()


def bench_llms():
    from csinn2_tpu.llm.config import LlamaConfig
    # config 4: 7B weight-only INT8 (q8_0) — TTFT + bs1 + bs8
    bench_llama(LlamaConfig.llama2_7b(), "llama2_7b", "q8_0",
                ttft=True, bs8=True)
    # config 4b: 7B q4_0 — int4 weight-read SOL is ~2× q8_0's
    bench_llama(LlamaConfig.llama2_7b(), "llama2_7b", "q4_0")
    # config 5 (single-chip half): 13B fits HBM only at q4_0 (~8 GB)
    if not os.environ.get("BENCH_SKIP_13B"):
        bench_llama(LlamaConfig.llama2_13b(), "llama2_13b", "q4_0",
                    max_seq=1024)


def main():
    from csinn2_tpu.utils.platform import backend_summary, honor_env_platform
    honor_env_platform()
    print(f"# backend: {backend_summary()}", file=sys.stderr)
    if not os.environ.get("BENCH_SKIP_CNN"):
        bench_cnns()
    if not os.environ.get("BENCH_SKIP_LLM"):
        bench_llms()


if __name__ == "__main__":
    main()
