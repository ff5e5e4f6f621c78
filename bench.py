#!/usr/bin/env python
"""Driver benchmark: MobileNetV1-INT8 + Llama-2-7B on one TPU chip.

Prints one JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no absolute numbers (BASELINE.md), so vs_baseline is
a measured ratio on the same chip in the same run:
  - mobilenet:      speedup over the float32 XLA graph of the same model
  - llama decode:   fraction of the HBM weight-read speed-of-light
                    (decode is weight-bound: tok/s ≈ BW / bytes(weights))
  - llama TTFT:     fraction of the bf16-MXU prefill FLOP bound
  - llama batch=8:  decode tokens/s scaling vs batch=1 (continuous batching)

Timing methodology: device-side loops only (lax.fori_loop / lax.scan inside
ONE executable, completion forced by fetching a scalar, long-minus-short
marginal).  Host-side timing loops are NOT valid on this runtime: dispatch is
asynchronous end-to-end (block_until_ready returns early through the tunnel),
so host loops measure RPC rate, not device time.  Verified by roofline
calibration: device-loop measurements reproduce 97% of v5e peak bf16 FLOPs
and ~80% of spec HBM bandwidth, while host loops report physically impossible
numbers (>30 TB/s "bandwidth").

Set BENCH_SKIP_LLM=1 / BENCH_SKIP_CNN=1 to run a subset.
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

BATCH = 128  # throughput batch: compute-bound, stable; bs=1 reported too

HBM_GIBPS = 763.0    # v5e spec HBM bandwidth (GiB/s)
BF16_TFLOPS = 197.0  # v5e peak bf16 MXU


def emit(metric, value, unit, vs_baseline):
    print(json.dumps({"metric": metric, "value": round(float(value), 3),
                      "unit": unit, "vs_baseline": round(float(vs_baseline), 3)}))


def bench_mobilenet():
    import numpy as np
    from csinn2_tpu.core.dtypes import QuantScheme
    from csinn2_tpu.models.mobilenet import MobileNetV1

    model = MobileNetV1(input_size=224)
    rng = np.random.default_rng(0)
    x1 = rng.random(model.input_shape(1)).astype(np.float32)
    xb = rng.random(model.input_shape(BATCH)).astype(np.float32)

    # float32 baseline (same graph executor, no quantization)
    t0 = time.time()
    fs = model._float_session(batch=BATCH)
    fs.run(xb)  # compile
    f32_dt = fs.run_benchmark_device(xb, iters=32)
    print(f"# f32 bs{BATCH}: {f32_dt/BATCH*1e3:.4f} ms/img "
          f"({BATCH/f32_dt:.0f} img/s) ({time.time()-t0:.0f}s incl compile)",
          file=sys.stderr)

    # int8 path
    t0 = time.time()
    model.calibrate(x1)
    sess = model.build_session(QuantScheme.INT8_SYM, batch=BATCH)
    xin = model.prepare_input(xb, sess)
    sess.run(xin)  # compile
    int8_dt = sess.run_benchmark_device(xin, iters=32)
    print(f"# int8 bs{BATCH}: {int8_dt/BATCH*1e3:.4f} ms/img "
          f"({BATCH/int8_dt:.0f} img/s) ({time.time()-t0:.0f}s incl compile)",
          file=sys.stderr)

    # bs=1 latency (both paths), for the record
    s1 = model.build_session(QuantScheme.INT8_SYM, batch=1)
    x1q = model.prepare_input(x1, s1)
    s1.run(x1q)
    lat1 = s1.run_benchmark_device(x1q, iters=32)
    print(f"# int8 bs1 latency: {lat1*1e3:.3f} ms", file=sys.stderr)

    # accuracy gate — refuse to report a number for a wrong result
    from csinn2_tpu.core.quant import dequantize
    from csinn2_tpu.utils.verify import cosine_similarity
    golden = model.forward_f32(x1)
    out = np.asarray(s1.run(x1q), np.float32)
    qi = model.recorder.qinfo("fc", QuantScheme.INT8_SYM)
    cs = cosine_similarity(np.asarray(dequantize(out, qi)), golden)
    print(f"# cosine vs f32: {cs:.5f}", file=sys.stderr)
    assert cs >= 0.99, f"accuracy gate failed: {cs}"

    emit(f"mobilenet_v1_int8_224_bs{BATCH}_imgs_per_s", BATCH / int8_dt,
         "img/s", f32_dt / int8_dt)

    # roofline placement: MobileNet at bs128 is predominantly HBM-bound
    # (~3/4 of matrix nodes; a handful of pointwise convs are MXU-bound —
    # static model runtime/roofline.py, validated in tests/test_roofline.py),
    # so report fraction-of-SOL rather than MFU (MFU cap ≈ 22% at these shapes)
    from csinn2_tpu.runtime.roofline import analyze
    rep = analyze(sess)
    frac = rep.fused_sol_s / int8_dt
    n_hbm = sum(1 for c in rep.costs if not c.fusable
                and c.bound(rep.peak_tops, rep.hbm_gbps) == "hbm")
    n_mat = sum(1 for c in rep.costs if not c.fusable)
    print(f"# roofline: fused SOL {rep.fused_sol_s*1e3:.3f} ms vs measured "
          f"{int8_dt*1e3:.3f} ms -> {100*frac:.0f}% of bandwidth SOL "
          f"({n_hbm}/{n_mat} matrix nodes HBM-bound; "
          f"{rep.total_flops/1e9:.0f} GFLOP/batch)", file=sys.stderr)
    emit(f"mobilenet_v1_int8_bs{BATCH}_roofline_fraction", frac,
         "fraction_of_hbm_sol", frac)


def bench_llama7b(mode="q8_0"):
    """Llama-2-7B weight-only quant, quantized KV (BASELINE config 4) +
    batch-8 continuous-batching decode scaling (config 5, single chip).
    Weights are random, generated+quantized on device (init_params_device) —
    the arithmetic is identical to real weights; correctness is gated
    separately (tests/test_llm.py, examples/llama_generate.py)."""
    import jax
    import numpy as np
    from csinn2_tpu.llm.config import LlamaConfig
    from csinn2_tpu.llm.engine import InferenceEngine
    from csinn2_tpu.llm.model import init_params_device

    cfg = LlamaConfig.llama2_7b()
    t0 = time.time()
    params = jax.block_until_ready(init_params_device(cfg, mode=mode, seed=0))
    print(f"# llama7b {mode} device init+quant: {time.time()-t0:.0f}s",
          file=sys.stderr)
    wbytes = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
                 if l.dtype == np.int8)
    sbytes = sum(l.nbytes for l in jax.tree_util.tree_leaves(params)) - wbytes
    tot_bytes = wbytes + sbytes
    n_params = sum(int(np.prod(l.shape)) * (2 if str(l.dtype) == "int8" and
                                            mode in ("int4", "q4_0") else 1)
                   for l in jax.tree_util.tree_leaves(params)
                   if l.dtype == np.int8)

    eng = InferenceEngine(cfg, params, batch=1, quantized_kv=True)
    prompt = list(np.random.default_rng(0).integers(1, cfg.vocab_size, 128))

    # p50 TTFT, prompt 128 (host wall-clock: TTFT is a user-visible latency,
    # and a single prefill is long enough to dominate tunnel RPC noise)
    eng.generate(prompt, max_new_tokens=1)        # compile
    ttfts = []
    for _ in range(5):
        t0 = time.perf_counter()
        eng.prefill(0, prompt)
        jax.block_until_ready(eng.cache.k)
        ttfts.append(time.perf_counter() - t0)
    ttft = float(np.median(ttfts))
    prefill_flops = 2.0 * n_params * len(prompt)
    ttft_sol = prefill_flops / (BF16_TFLOPS * 1e12)
    print(f"# llama7b TTFT p50: {ttft*1e3:.1f} ms (bf16 FLOP bound "
          f"{ttft_sol*1e3:.1f} ms)", file=sys.stderr)
    emit(f"llama2_7b_{mode}_ttft_p50_prompt128_ms", ttft * 1e3, "ms",
         ttft_sol / max(ttft, 1e-9))

    # decode tokens/s, batch 1 (fused scan, device-marginal)
    tps1 = eng.benchmark_decode_device(iters=128)
    sol = HBM_GIBPS * 2**30 / tot_bytes
    print(f"# llama7b decode bs1: {tps1:.1f} tok/s "
          f"(weight-read SOL {sol:.0f} tok/s → {100*tps1/sol:.0f}%)",
          file=sys.stderr)
    emit(f"llama2_7b_{mode}_decode_tok_s", tps1, "tok/s", tps1 / sol)

    # batch-8 continuous batching: all lanes decode in one fused scan.
    # Cap the KV horizon at 1k for the batch test: 8 lanes × 4096 × int8 KV
    # is 8.4 GB which together with the 7 GB of weights exceeds v5e HBM
    # (measured RESOURCE_EXHAUSTED); 8×1024 is 2.1 GB and decode reads the
    # same kv_bound-limited window either way.
    import dataclasses
    del eng
    cfg8 = dataclasses.replace(cfg, max_seq_len=1024)
    eng8 = InferenceEngine(cfg8, params, batch=8, quantized_kv=True)
    tps8 = eng8.benchmark_decode_device(iters=128)
    print(f"# llama7b decode bs8: {tps8:.1f} tok/s "
          f"({tps8/max(tps1,1e-9):.2f}x bs1)", file=sys.stderr)
    emit(f"llama2_7b_{mode}_decode_bs8_tok_s", tps8, "tok/s",
         tps8 / max(tps1, 1e-9))


def main():
    from csinn2_tpu.utils.platform import backend_summary, honor_env_platform
    honor_env_platform()
    print(f"# backend: {backend_summary()}", file=sys.stderr)
    if not os.environ.get("BENCH_SKIP_CNN"):
        bench_mobilenet()
    if not os.environ.get("BENCH_SKIP_LLM"):
        bench_llama7b()


if __name__ == "__main__":
    main()
