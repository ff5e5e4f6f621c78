#!/usr/bin/env python
"""MobileNetV1 INT8 end-to-end demo — the analog of the reference's
example/c906_mobilenetv1_f16.c: build, calibrate, quantize, run, report top-5.

Usage:  python examples/mobilenet_int8.py [--size 224] [--scheme int8_sym]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from csinn2_tpu.core.dtypes import QuantScheme
from csinn2_tpu.models.mobilenet import MobileNetV1
from csinn2_tpu.utils.verify import cosine_similarity


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--scheme", default="int8_sym",
                    choices=[s.value for s in QuantScheme])
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from csinn2_tpu.utils.platform import backend_summary, honor_env_platform
    honor_env_platform()
    scheme = QuantScheme(args.scheme)
    print(f"== MobileNetV1 {scheme.value} @ {args.size}x{args.size} "
          f"on {backend_summary()} ==")

    model = MobileNetV1(input_size=args.size)
    rng = np.random.default_rng(0)
    x = rng.random(model.input_shape(1)).astype(np.float32)

    t0 = time.perf_counter()
    golden = model.forward_f32(x)
    print(f"float forward: {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    model.calibrate(x)
    print(f"calibration:   {time.perf_counter()-t0:.2f}s ({len(model.recorder.ranges)} layers observed)")

    t0 = time.perf_counter()
    sess = model.build_session(scheme)
    print(f"session setup: {time.perf_counter()-t0:.2f}s ({len(sess.graph.nodes)} graph nodes)")

    xin = model.prepare_input(x, sess)
    t0 = time.perf_counter()
    out = sess.run(xin)
    print(f"first run (compile): {time.perf_counter()-t0:.2f}s")

    dt = sess.run_benchmark_device(xin, iters=max(args.iters, 16))
    print(f"steady-state (device loop): {dt*1e3:.2f} ms/img  ({1.0/dt:.1f} img/s)")

    raw = np.asarray(out)
    print(f"raw output: dtype={raw.dtype} min={raw.min()} max={raw.max()}")
    out_np = np.asarray(out, np.float32)
    if not scheme.act_dtype.is_float:
        from csinn2_tpu.core.quant import dequantize
        out_np = np.asarray(dequantize(out_np, model.recorder.qinfo("fc", scheme)))
    cs = cosine_similarity(out_np, golden)
    top5_q = np.argsort(out_np[0])[::-1][:5]
    top5_f = np.argsort(golden[0])[::-1][:5]
    print(f"cosine vs float: {cs:.5f}")
    print(f"top5 quant: {top5_q.tolist()}")
    print(f"top5 float: {top5_f.tolist()}")
    ok = cs >= 0.99
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
