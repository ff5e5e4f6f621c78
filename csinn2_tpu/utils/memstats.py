"""Memory observability: live-buffer accounting + device memory stats.

TPU-native analog of the reference's debug allocator map
(ref: source/utils/memory.c:25-64 — shl_mem_map tracking total/leaked bytes,
guard-byte overwrite checks :75-85).  On TPU there is no manual allocator on
the compute path (XLA buffer assignment owns it — SURVEY.md §7), so the
equivalents are:

  * live_buffer_report() — per-device byte totals over jax.live_arrays(),
    the leak-map analog (call before/after to detect buffer leaks);
  * device_memory_stats() — the runtime allocator's own counters
    (bytes_in_use, peak_bytes_in_use, ...) where the backend exposes them;
  * MemoryWatermark — context manager asserting no net live-buffer growth,
    the guard-byte "did anything escape" check for tests.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax


def live_buffer_report() -> Dict[str, Dict[str, float]]:
    """Sum live jax array bytes per device: {device: {count, bytes}}."""
    per: Dict[str, Dict[str, float]] = {}
    for arr in jax.live_arrays():
        try:
            nbytes = arr.nbytes
            devs = list(arr.devices())
        except Exception:       # deleted/donated concurrently
            continue
        for d in devs:
            e = per.setdefault(str(d), {"count": 0, "bytes": 0})
            e["count"] += 1
            e["bytes"] += nbytes / max(len(devs), 1)
    return per


def total_live_bytes() -> int:
    return int(sum(e["bytes"] for e in live_buffer_report().values()))


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """Backend allocator counters (TPU/GPU expose bytes_in_use,
    peak_bytes_in_use, num_allocs, ...); None where unsupported (CPU)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    return dict(stats) if stats else None


@dataclasses.dataclass
class MemoryWatermark:
    """Assert no net live-buffer growth across a region (leak check analog of
    the reference's shl_mem_map leak report)::

        with MemoryWatermark(tolerance_bytes=1 << 20):
            run_inference()
    """

    tolerance_bytes: int = 1 << 20
    _before: int = 0

    def __enter__(self):
        self._before = total_live_bytes()
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None:
            return False
        grown = total_live_bytes() - self._before
        if grown > self.tolerance_bytes:
            raise AssertionError(
                f"live device buffers grew by {grown} bytes "
                f"(> tolerance {self.tolerance_bytes})")
        return False
