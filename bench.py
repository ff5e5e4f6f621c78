#!/usr/bin/env python
"""Driver benchmark: MobileNetV1-INT8 inference on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = speedup over the float32 XLA graph of the same model measured
in the same run (the reference publishes no absolute numbers — BASELINE.md —
so the f32 path is the measured baseline).

Timing methodology: run_benchmark_device — the whole graph executes `iters`
times inside ONE device executable (lax.fori_loop) and completion is forced
by fetching a scalar.  A host-side timing loop is NOT valid on this runtime:
dispatch is asynchronous end-to-end (block_until_ready returns early through
the tunnel), so host loops measure RPC rate, not device time.  Verified by
roofline calibration: device-loop measurements reproduce 97% of v5e peak
bf16 FLOPs and ~80% of spec HBM bandwidth, while host loops report
physically impossible numbers (>30 TB/s "bandwidth").
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

BATCH = 128  # throughput batch: compute-bound, stable; bs=1 reported too


def main():
    import numpy as np
    from csinn2_tpu.core.dtypes import QuantScheme
    from csinn2_tpu.models.mobilenet import MobileNetV1
    from csinn2_tpu.utils.platform import backend_summary, honor_env_platform
    honor_env_platform()
    print(f"# backend: {backend_summary()}", file=sys.stderr)

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

    print(json.dumps({
        "metric": f"mobilenet_v1_int8_224_bs{BATCH}_imgs_per_s",
        "value": round(BATCH / int8_dt, 2),
        "unit": "img/s",
        "vs_baseline": round(f32_dt / int8_dt, 3),
    }))


if __name__ == "__main__":
    main()
