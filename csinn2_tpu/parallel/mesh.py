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
