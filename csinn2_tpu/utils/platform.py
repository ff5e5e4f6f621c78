"""Platform selection helper.

The hosting environment's sitecustomize may force jax_platforms to the TPU
plugin after jax reads the env var, silently overriding JAX_PLATFORMS=cpu.
Call honor_env_platform() early (examples/benchmarks do) to re-assert the
user's env choice; without JAX_PLATFORMS set, the ambient TPU default stands.
"""

from __future__ import annotations

import os


def honor_env_platform():
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def backend_summary() -> str:
    import jax
    d = jax.devices()[0]
    return f"{jax.default_backend()}:{d.device_kind} x{len(jax.devices())}"
