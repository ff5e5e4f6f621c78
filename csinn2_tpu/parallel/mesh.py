"""Device mesh construction.

The reference has no multi-device execution (SURVEY.md §2, parallelism
accounting: OpenMP only).  Distribution here is the BASELINE-mandated
net-new capability: a jax.sharding.Mesh over TPU chips, with axes
  dp — data/batch parallel (slot batches)
  tp — tensor parallel (heads / ffn / vocab)
laid out so tp rides the faster (inner) ICI dimension.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(tp: Optional[int] = None, dp: Optional[int] = None,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None and dp is None:
        tp, dp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp})*tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: jax.distributed.initialize (idempotent).

    With no arguments, cluster-environment autodetection applies (TPU pod
    metadata / SLURM / env vars) — the standard JAX multi-controller model:
    one process per host, each seeing its local chips, jax.devices() global.
    Returns process_count.  (Net-new vs the single-process reference —
    SURVEY.md §2 parallelism accounting; mandated by BASELINE config 5.)

    NB: must run before anything touches the XLA backend — so the
    already-initialized check inspects the distributed client directly
    instead of calling jax.process_count() (which would itself initialize
    the backend and make the subsequent initialize() raise)."""
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return jax.process_count()          # already initialized
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except (ValueError, RuntimeError):
        # single-process run (no coordinator/env): stay local
        if num_processes not in (None, 1):
            raise
    return jax.process_count()


def make_multihost_mesh(tp: Optional[int] = None,
                        dp: Optional[int] = None) -> Mesh:
    """(dp, tp) mesh over a multi-host slice: tp stays INSIDE a host so its
    per-layer psums ride ICI; dp spans hosts so only the (infrequent)
    batch-axis collectives cross DCN — the scaling-book placement rule.
    Falls back to make_mesh on a single process."""
    nproc = jax.process_count()
    local = jax.local_device_count()
    if nproc == 1:
        return make_mesh(tp=tp, dp=dp)
    tp = tp or local
    assert tp <= local and local % tp == 0, \
        f"tp={tp} must divide the {local} per-host chips (ICI domain)"
    dp_local = local // tp
    want_dp = nproc * dp_local
    assert dp in (None, want_dp), f"dp={dp} != processes×(local/tp)={want_dp}"
    from jax.experimental import mesh_utils
    try:
        # TPU pods: granule = slice (ICI domain) from device metadata
        devs = mesh_utils.create_hybrid_device_mesh(
            (dp_local, tp), (nproc, 1))     # ici shape × dcn shape
    except ValueError:
        # CPU multi-process (no slice metadata): granule = process
        devs = mesh_utils.create_hybrid_device_mesh(
            (dp_local, tp), (nproc, 1), process_is_granule=True)
    return Mesh(devs, axis_names=("dp", "tp"))
