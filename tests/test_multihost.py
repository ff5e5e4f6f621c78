"""Multi-host (2-process jax.distributed) dryrun — BASELINE config 5's
DCN×ICI shape executed with real controller processes and Gloo-backed CPU
collectives (net-new vs the single-process reference, SURVEY.md §2).

Runs examples/multihost_dryrun.py as subprocesses (the orchestrator spawns a
single-process golden + two distributed workers and compares bit-level)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_tp_dp_engine_matches_single_process():
    script = os.path.join(REPO, "examples", "multihost_dryrun.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    r = subprocess.run([sys.executable, script], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (r.stdout + r.stderr)[-3000:]
    assert "PASS" in r.stdout, r.stdout[-2000:]
