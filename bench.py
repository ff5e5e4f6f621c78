#!/usr/bin/env python
"""Driver benchmark: MobileNetV1-INT8 single-image inference on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = speedup over the float32 XLA graph of the same model measured
in the same run (the reference publishes no absolute numbers — BASELINE.md —
so the f32 path is the measured baseline).
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main():
    import numpy as np
    from csinn2_tpu.core.dtypes import QuantScheme
    from csinn2_tpu.models.mobilenet import MobileNetV1
    from csinn2_tpu.utils.platform import backend_summary, honor_env_platform
    honor_env_platform()
    print(f"# backend: {backend_summary()}", file=sys.stderr)

    size = 224
    model = MobileNetV1(input_size=size)
    rng = np.random.default_rng(0)
    x = rng.random(model.input_shape(1)).astype(np.float32)

    # float32 baseline (same graph executor, no quantization).
    # The axon tunnel's RPC latency varies across sessions — take the best of
    # several measurement reps so the number reflects the hardware, not
    # transient tunnel congestion.
    t0 = time.time()
    fs = model._float_session(batch=1)
    fs.run(x)  # compile
    f32_dt = min(fs.run_benchmark(x, iters=20, warmup=3) for _ in range(3))
    print(f"# f32: {f32_dt*1e3:.3f} ms/img ({time.time()-t0:.0f}s incl compile)",
          file=sys.stderr)

    # int8 path
    t0 = time.time()
    model.calibrate(x)
    sess = model.build_session(QuantScheme.INT8_SYM)
    xin = model.prepare_input(x, sess)
    sess.run(xin)  # compile
    int8_dt = min(sess.run_benchmark(xin, iters=50, warmup=5) for _ in range(3))
    print(f"# int8: {int8_dt*1e3:.3f} ms/img ({time.time()-t0:.0f}s incl compile)",
          file=sys.stderr)

    # accuracy gate — refuse to report a number for a wrong result
    from csinn2_tpu.core.quant import dequantize
    from csinn2_tpu.utils.verify import cosine_similarity
    golden = model.forward_f32(x)
    out = np.asarray(sess.run(xin), np.float32)
    qi = model.recorder.qinfo("fc", QuantScheme.INT8_SYM)
    cs = cosine_similarity(np.asarray(dequantize(out, qi)), golden)
    print(f"# cosine vs f32: {cs:.5f}", file=sys.stderr)
    assert cs >= 0.99, f"accuracy gate failed: {cs}"

    print(json.dumps({
        "metric": "mobilenet_v1_int8_224_bs1_imgs_per_s",
        "value": round(1.0 / int8_dt, 2),
        "unit": "img/s",
        "vs_baseline": round(f32_dt / int8_dt, 3),
    }))


if __name__ == "__main__":
    main()
