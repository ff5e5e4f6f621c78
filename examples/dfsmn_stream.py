#!/usr/bin/env python
"""Streaming ASR demo — the analog of the reference's C906 streaming path
(cache_matmul/cache_conv1d/fsmn ring-buffer ops driven per frame from an
HHB-emitted main).  Here a DFSMN acoustic model runs chunked functional
streaming: one jitted step carries FIR/skip caches as explicit tensors.

Checks streamed logits equal the offline (whole-utterance) forward on every
interior frame, and reports streaming throughput (frames/s) and per-chunk
latency.

Usage:  python examples/dfsmn_stream.py [--chunk 8] [--frames 256]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from csinn2_tpu.models.dfsmn_asr import DFSMNASR, DFSMNConfig
from csinn2_tpu.utils.verify import cosine_similarity


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--proj", type=int, default=256)
    args = ap.parse_args()

    from csinn2_tpu.utils.platform import backend_summary, honor_env_platform
    honor_env_platform()

    cfg = DFSMNConfig(feat_dim=80, hidden=args.hidden, proj=args.proj,
                      blocks=args.blocks, l_order=10, r_order=2, classes=218)
    model = DFSMNASR(cfg, seed=0)
    print(f"== DFSMN blocks={cfg.blocks} hidden={cfg.hidden} proj={cfg.proj} "
          f"delay={cfg.total_delay}f chunk={args.chunk} on {backend_summary()} ==")

    T, C = args.frames, args.chunk
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, T, cfg.feat_dim)).astype(np.float32)

    t0 = time.perf_counter()
    offline = np.asarray(model.offline_session(1, T).run(x))
    print(f"offline [1,{T},80] (incl compile): {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    st = model.stream(batch=1, chunk=C)
    outs = [st.step(x[:, i:i + C]) for i in range(0, T, C)]
    streamed = np.concatenate(outs + [st.flush()], axis=1)
    print(f"streamed {T} frames (incl compile): {time.perf_counter()-t0:.2f}s")

    # interior equality (boundaries differ by padding convention; docstring
    # of models/dfsmn_asr.py)
    lo, hi = cfg.blocks * cfg.l_span, T - cfg.blocks * cfg.r_span
    got = streamed[:, st.delay + lo:st.delay + hi]
    want = offline[:, lo:hi]
    cs = cosine_similarity(got, want)
    err = float(np.max(np.abs(got - want)))
    print(f"stream vs offline: cosine={cs:.6f} max_abs_err={err:.2e}")

    # steady-state chunk latency: device-loop timing (host step loops only
    # measure dispatch rate on the async tunnel)
    st2 = model.stream(batch=1, chunk=C)
    dt = st2.sess.run_benchmark_device(x[:, :C], *st2.state, iters=32)
    print(f"steady-state: {dt*1e3:.3f} ms/chunk ({C/dt:,.0f} frames/s, "
          f"{C/dt/100:,.0f}x realtime @10ms frames)")

    ok = cs > 0.9999 and err < 1e-3
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
