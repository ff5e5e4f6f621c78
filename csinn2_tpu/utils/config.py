"""Runtime configuration & op gating.

TPU-native re-expression of the reference's three config tiers
(ref: SURVEY.md §5 — (1) Kconfig per-op source gating, 111 options in
source/thead_rvv/Kconfig consumed as `#ifndef CONFIG_..._DISABLED` in
setup.c; (2) CMake target flags; (3) runtime session fields).

Here: one process-wide Config with env-var initialization.  Op gating
disables specific registered implementations — `disable("conv2d@int8_sym")`
is the analog of CONFIG_THEAD_RVV_CONV2D_INT8_DISABLED, and forces dispatch
down the fallback chain (fast path → generic), which is also how A/B
correctness triage works.

Env vars:
  CSINN_TPU_DISABLE_OPS   comma list of op or op@scheme keys to gate off
  CSINN_TPU_USE_PALLAS    0/1 force the Pallas kernels on or off
  CSINN_TPU_DEBUG         DEBUG|INFO|WARNING|ERROR|FATAL (logging level)
"""

from __future__ import annotations

import os
from typing import Optional, Set


class Config:
    def __init__(self):
        self.disabled_ops: Set[str] = set(
            s.strip() for s in os.environ.get("CSINN_TPU_DISABLE_OPS", "").split(",")
            if s.strip())
        up = os.environ.get("CSINN_TPU_USE_PALLAS")
        self.use_pallas: Optional[bool] = None if up is None else up == "1"

    def disable(self, key: str):
        """Gate off an op ('conv2d') or op@scheme ('conv2d@int8_sym')."""
        self.disabled_ops.add(key)

    def enable(self, key: str):
        self.disabled_ops.discard(key)

    def is_disabled(self, op: str, scheme_value: Optional[str] = None) -> bool:
        if op in self.disabled_ops:
            return True
        return scheme_value is not None and f"{op}@{scheme_value}" in self.disabled_ops


config = Config()
