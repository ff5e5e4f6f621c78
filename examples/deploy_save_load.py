#!/usr/bin/env python
"""Deployment flow: quantize a model, save the binary-model directory, then
reload it in a FRESH process and serve — the csinn binary-model path
(ref: save in shl_gref_session_setup, source/graph_ref/setup.c:735;
load via csinn_import_binary_model, source/nn2/format.c:1304-1331).

Usage:  python examples/deploy_save_load.py [--size 32] [--aot]
"""

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def build_and_save(path: str, size: int, aot: bool) -> np.ndarray:
    from csinn2_tpu.core.dtypes import QuantScheme
    from csinn2_tpu.models.mobilenet import MobileNetV1
    from csinn2_tpu.runtime.export import save_model

    model = MobileNetV1(input_size=size)
    x = np.random.default_rng(0).random(model.input_shape(1)).astype(np.float32)
    model.calibrate(x)
    sess = model.build_session(QuantScheme.INT8_SYM, batch=1)
    xq = model.prepare_input(x, sess)
    out = np.asarray(sess.run(xq))
    save_model(sess, path, aot=aot)
    np.save(os.path.join(path, "example_input.npy"), np.asarray(xq))
    np.save(os.path.join(path, "expected_output.npy"), out)
    n = sum(os.path.getsize(os.path.join(path, f)) for f in os.listdir(path))
    print(f"saved model → {path} ({n/2**20:.1f} MiB)", flush=True)
    return out


def load_and_serve(path: str):
    """Run in a fresh interpreter: reload and check against the saved output."""
    code = f"""
import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import numpy as np
from csinn2_tpu.utils.platform import honor_env_platform
honor_env_platform()
from csinn2_tpu.runtime.export import load_model
sess = load_model({path!r})
x = np.load({os.path.join(path, 'example_input.npy')!r})
want = np.load({os.path.join(path, 'expected_output.npy')!r})
got = np.asarray(sess.run(x))
ok = np.array_equal(got, want)
print("fresh-process reload:", "outputs match" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
"""
    return subprocess.run([sys.executable, "-c", code],
                          env={**os.environ}).returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--aot", action="store_true",
                    help="also serialize the AOT executable (compiled.bin)")
    args = ap.parse_args()

    from csinn2_tpu.utils.platform import backend_summary, honor_env_platform
    honor_env_platform()
    print(f"== deploy/save/load on {backend_summary()} ==", flush=True)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "model")
        build_and_save(path, args.size, args.aot)
        rc = load_and_serve(path)
    print("PASS" if rc == 0 else "FAIL")
    sys.exit(rc)


if __name__ == "__main__":
    main()
