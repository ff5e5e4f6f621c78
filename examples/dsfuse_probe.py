#!/usr/bin/env python
"""Real-chip probe: MobileNetV1-INT8 bs128 with/without dw→pw fusion."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, sys.path[0] + "/..")

from csinn2_tpu.core.dtypes import QuantScheme
from csinn2_tpu.models.mobilenet import MobileNetV1

BATCH = int(os.environ.get("B", "128"))

model = MobileNetV1(input_size=224)
rng = np.random.default_rng(0)
x1 = rng.random(model.input_shape(1)).astype(np.float32)
xb = rng.random(model.input_shape(BATCH)).astype(np.float32)
model.calibrate(x1)

results = {}
for tag, env in [("fused", "1"), ("unfused", None)]:
    if env:
        os.environ["CSINN2_FUSE_DS"] = env
    else:
        os.environ.pop("CSINN2_FUSE_DS", None)
    t0 = time.time()
    sess = model.build_session(QuantScheme.INT8_SYM, batch=BATCH)
    n_ds = sum(1 for n in sess.graph.nodes if n.op == "ds_block")
    xin = model.prepare_input(xb, sess)
    sess.run(xin)
    dt = sess.run_benchmark_device(xin, iters=32)
    results[tag] = dt
    print(f"{tag}: {n_ds} ds_blocks, {dt*1e3:.3f} ms/batch -> "
          f"{BATCH/dt:.0f} img/s  ({time.time()-t0:.0f}s incl compile)",
          flush=True)

    # correctness on the chip
    s1 = model.build_session(QuantScheme.INT8_SYM, batch=1)
    out = np.asarray(s1.run(model.prepare_input(x1, s1)), np.float32)
    from csinn2_tpu.core.quant import dequantize
    from csinn2_tpu.utils.verify import cosine_similarity
    golden = model.forward_f32(x1)
    qi = model.recorder.qinfo("fc", QuantScheme.INT8_SYM)
    cs = cosine_similarity(np.asarray(dequantize(out, qi)), golden)
    print(f"{tag}: cosine vs f32 = {cs:.5f}", flush=True)

print(f"speedup fused vs unfused: {results['unfused']/results['fused']:.3f}x")
