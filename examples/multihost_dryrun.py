#!/usr/bin/env python
"""Multi-host (multi-process) TP×DP dryrun on CPU — BASELINE config 5's
DCN×ICI shape, executed for real with 2 controller processes.

Validates the actual multi-controller code path (net-new vs the
single-process reference, SURVEY.md §2 parallelism note):
  * `init_distributed(coordinator, 2, rank)` — jax.distributed bring-up
    (Gloo collectives back the CPU cross-process psum/all_gather)
  * `make_multihost_mesh(tp=4)` — the (dp=2 over DCN) × (tp=4 over ICI)
    hybrid mesh, tp kept inside a "host" so per-layer psums stay on ICI
  * one TP×DP prefill + one fused decode-scan chunk of the engine over that
    mesh, logits compared bit-level against the single-process virtual-mesh
    run of the identical model.

Each process exposes 4 virtual CPU devices (xla_force_host_platform_
device_count), so the global mesh is 2 hosts × 4 chips — the same shape the
driver's single-process dryrun uses, now crossing a real process boundary.

Usage:
  python examples/multihost_dryrun.py            # orchestrates everything
  python examples/multihost_dryrun.py --role {golden,worker} ...  # internal
"""

import argparse
import os
import subprocess
import sys
import tempfile

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

TP, NPROC, LOCAL = 4, 2, 4


def _build_and_run(mesh):
    """Deterministic tiny model + one engine step over `mesh`; returns
    (prefill_logits, decode_tokens) as numpy arrays.  Runs IDENTICALLY in
    the single-process and multi-controller cases — only the mesh differs."""
    import numpy as np
    import jax
    from csinn2_tpu.llm.config import LlamaConfig
    from csinn2_tpu.llm.engine import InferenceEngine
    from csinn2_tpu.llm.model import FLOAT, INT8_CHANNEL, init_params, quantize_params

    dp = int(mesh.shape["dp"])
    cfg = LlamaConfig(dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
                      ffn_dim=128, vocab_size=256 * TP, max_seq_len=64)
    params = quantize_params(init_params(cfg, mode=FLOAT, seed=0), INT8_CHANNEL)
    eng = InferenceEngine(cfg, params, batch=dp, use_pallas=False, mesh=mesh)
    logits = eng.prefill(0, [3, 1, 4, 1, 5])
    toks = eng.decode_steps({0: int(np.argmax(logits))}, n_steps=4)[0]
    return np.asarray(logits, np.float32), np.asarray(toks, np.int32)


def run_golden(out_path: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={NPROC * LOCAL}")
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from csinn2_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(tp=TP, dp=NPROC * LOCAL // TP)
    logits, toks = _build_and_run(mesh)
    np.savez(out_path, logits=logits, toks=toks)
    print(f"golden: devices={jax.device_count()} mesh={dict(mesh.shape)}")


def run_worker(rank: int, port: int, out_path: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={LOCAL}")
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from csinn2_tpu.parallel.mesh import init_distributed, make_multihost_mesh
    nproc = init_distributed(f"localhost:{port}", NPROC, rank)
    assert nproc == NPROC, nproc
    assert jax.process_count() == NPROC and jax.device_count() == NPROC * LOCAL
    mesh = make_multihost_mesh(tp=TP)
    assert dict(mesh.shape) == {"dp": NPROC * LOCAL // TP, "tp": TP}, mesh
    logits, toks = _build_and_run(mesh)
    if rank == 0:
        np.savez(out_path, logits=logits, toks=toks)
    print(f"worker {rank}: processes={jax.process_count()} "
          f"global_devices={jax.device_count()} mesh={dict(mesh.shape)}")


def main():
    import numpy as np
    port = 12731
    with tempfile.TemporaryDirectory() as td:
        gold_p = os.path.join(td, "gold.npz")
        mh_p = os.path.join(td, "mh.npz")
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
        base = [sys.executable, os.path.abspath(__file__)]

        def spawn(args):
            return subprocess.Popen(base + args, env=env, cwd=REPO,
                                    stdout=subprocess.PIPE,
                                    stderr=subprocess.STDOUT, text=True)

        procs = [spawn(["--role", "golden", "--out", gold_p]),
                 spawn(["--role", "worker", "--rank", "0", "--port", str(port),
                        "--out", mh_p]),
                 spawn(["--role", "worker", "--rank", "1", "--port", str(port),
                        "--out", mh_p])]
        for p in procs:
            out, _ = p.communicate(timeout=600)
            tail = "\n".join(out.strip().splitlines()[-3:])
            print(tail)
            assert p.returncode == 0, f"subprocess failed:\n{out[-2000:]}"

        gold = np.load(gold_p)
        mh = np.load(mh_p)
        np.testing.assert_array_equal(gold["toks"], mh["toks"])
        err = float(np.abs(gold["logits"] - mh["logits"]).max())
        assert err < 1e-5, f"multihost logits diverge: max abs err {err}"
        print(f"multihost({NPROC}x{LOCAL}) PASS: tokens identical, "
              f"logits max|Δ|={err:.2e} vs single-process mesh")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", choices=["golden", "worker"], default=None)
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--port", type=int, default=12731)
    ap.add_argument("--out", default="/tmp/mh_out.npz")
    a = ap.parse_args()
    if a.role == "golden":
        run_golden(a.out)
    elif a.role == "worker":
        run_worker(a.rank, a.port, a.out)
    else:
        main()
